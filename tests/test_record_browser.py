"""Record-browser (TUI analog) paging + layout tests.

Drives tools/record_browser.RecordBrowser over a real QueryEngine
result, mirroring the navigation the reference TUI exercises
(/root/reference/src/tui/record_table.rs: page scrolls, selection,
clamped edges, error log)."""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from chapterhouseqe_spark import ConnectionRegistry, QueryEngine
from tools.record_browser import RecordBrowser


@pytest.fixture(scope="module")
def engine(spark, sf_dir, tmp_path_factory):
    reg = ConnectionRegistry(default_base=sf_dir)
    return QueryEngine(
        spark,
        results_root=str(tmp_path_factory.mktemp("browser_results")),
        registry=reg,
    )


@pytest.fixture(scope="module")
def qid(engine):
    return engine.run_query_sync(
        "select n_nationkey, n_name, n_regionkey from "
        "read_files('nation.parquet')",
        mode="spark",
    )


def test_first_page_and_layout(engine, qid):
    br = RecordBrowser(engine, qid, page_size=10)
    out = br.render()
    assert "n_nationkey" in out and "n_name" in out
    assert br.top_offset == 0 and len(br.rows) == 10
    # first data row is selected and marked
    assert out.splitlines()[2].startswith(" > ")
    assert "rows 0-9 of 25" in out


def test_page_forward_backward_clamped(engine, qid):
    br = RecordBrowser(engine, qid, page_size=10)
    assert br.page_forward() and br.top_offset == 10
    assert br.page_forward() and br.top_offset == 20
    assert len(br.rows) == 5  # tail page is short
    assert not br.page_forward()  # clamped at the end
    assert br.page_backward() and br.top_offset == 10
    assert br.page_backward() and br.top_offset == 0
    assert not br.page_backward()  # clamped at the start


def test_goto_and_selection(engine, qid):
    br = RecordBrowser(engine, qid, page_size=5)
    br.goto(12)
    assert br.top_offset == 12 and len(br.rows) == 5
    br.select(3)
    assert br.render().splitlines()[2 + 3].startswith(" > ")
    br.select(99)  # out of range -> error log, selection unchanged
    assert br.selected == 3
    assert any("out of range" in e for e in br.errors)
    assert "! select out of range: 99" in br.render()


def test_cell_truncation(engine, qid):
    br = RecordBrowser(engine, qid, page_size=5, max_cell_width=6)
    out = br.render()
    # every data cell fits the cap; long names carry the ellipsis
    for line in out.splitlines()[2:7]:
        cells = [c.rstrip() for c in line[3:].split(" | ")]
        assert all(len(c) <= 6 for c in cells)
    assert "…" in out


def test_error_surface_not_crash(engine):
    br = RecordBrowser(engine, "no-such-query", page_size=5)
    assert br.rows == []
    assert br.errors and "no-such-query" in br.errors[0]
    assert "(empty result)" in br.render()


def test_failed_forward_load_reports_false(engine, qid):
    """page_forward must not report success when the fetch failed —
    'while br.page_forward()' loops have to terminate."""
    br = RecordBrowser(engine, qid, page_size=10)

    class _Broken:
        def fetch(self, *a, **k):
            raise RuntimeError("result files gone")

        def num_rows(self, qid):
            return 25

    br.engine = _Broken()
    assert br.page_forward() is False
    assert any("result files gone" in e for e in br.errors)


def test_browser_over_http_client(spark, sf_dir, engine, qid):
    """The HTTP QueryServiceClient is adapted automatically."""
    from chapterhouseqe_spark import QueryService, QueryServiceClient

    with QueryService(engine) as svc:
        client = QueryServiceClient(svc.address)
        br = RecordBrowser(client, qid, page_size=10)
        assert len(br.rows) == 10
        assert "rows 0-9 of 25" in br.render()
        assert br.page_forward() and br.top_offset == 10
