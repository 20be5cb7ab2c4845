"""Terminal record-table browser over a completed query's result pages.

Parity analog of the reference's TUI record browser
(/root/reference/src/tui/record_table.rs): `RecordTableState` holds the
current page + cursor/selection + error log and computes a column
layout from the visible records (record_table.rs:42-106,191-289);
`set_record` ingests a fetched page, `select` moves the highlight, and
paging walks offsets forward/backward with the reverse page re-anchored
so the screen stays full at the result's edges
(record_table.rs:147-163 min/max visible offsets). The reference
renders through ratatui; here the grid renders to a plain string (no
TTY dependency — drive it from tests or pipe it). The data source is
anything with the QueryEngine paging surface (``fetch(query_id,
offset, limit, forward)`` + ``num_rows``); an HTTP
``QueryServiceClient`` (whose verbs are ``get_query_data`` /
``get_query_status``) is adapted automatically via
:class:`_ClientSource`.

Usage (interactive):
    PYTHONPATH=/root/repo python tools/record_browser.py "<sql>" \
        [--base /root/testdata/sf0.001] [--page 10]
    commands: n(ext) p(rev) g <row> q(uit)
"""

from __future__ import annotations

from dataclasses import dataclass, field


def _cell_str(v) -> str:
    if v is None:
        return "NULL"
    return str(v)


class _ClientSource:
    """Adapt a QueryServiceClient (four-verb HTTP client) to the
    engine paging surface the browser consumes."""

    def __init__(self, client):
        self.client = client

    def fetch(self, query_id, offset, limit, forward=True):
        rows, _ = self.client.get_query_data(query_id, offset, limit, forward)
        return rows

    def num_rows(self, query_id):
        return self.client.get_query_status(query_id).get("num_rows", 0)


@dataclass
class RecordBrowser:
    """Stateful pager + fixed-width grid renderer for one query result.

    Mirrors RecordTableState: `rows` is the visible page, `top_offset`
    the absolute row-id of its first row, `selected` an index into the
    page, `errors` an append-only log rendered under the grid
    (record_table.rs:169-171,503-508).
    """

    engine: object
    query_id: str
    page_size: int = 10
    max_cell_width: int = 24
    rows: list[dict] = field(default_factory=list)
    top_offset: int = 0
    selected: int | None = None
    errors: list[str] = field(default_factory=list)

    def __post_init__(self):
        if not hasattr(self.engine, "fetch") and hasattr(
            self.engine, "get_query_data"
        ):
            self.engine = _ClientSource(self.engine)
        self._load(0)

    # ------------------------------------------------------------ paging

    def _load(self, offset: int) -> bool:
        """Fetch one page; returns True only if the view actually moved
        (a failed or empty fetch leaves the current page in place, so
        `while br.page_forward()` loops terminate)."""
        try:
            page = self.engine.fetch(
                self.query_id, offset, self.page_size, forward=True
            )
        except Exception as e:  # surface, don't crash the browser loop
            self.errors.append(str(e))
            return False
        if page or offset == 0:
            self.rows = page
            self.top_offset = offset
            self.selected = 0 if page else None
            return bool(page) or offset == 0
        return False

    def page_forward(self) -> bool:
        """Advance one page; keeps the last full page at the end
        (reference: get_max_visible_offset gates the down-scroll)."""
        if not self.rows:
            return False
        nxt = self.top_offset + len(self.rows)
        total = self._num_rows_or_none()
        if total is not None and nxt >= total:
            return False
        # no known total: attempt the load — an empty page stops here
        return self._load(nxt)

    def page_backward(self) -> bool:
        """Back one page; clamps at row 0 so the first page never
        renders short (the reverse-paging allow_overflow semantics)."""
        if self.top_offset == 0:
            return False
        return self._load(max(0, self.top_offset - self.page_size))

    def goto(self, offset: int) -> None:
        self._load(max(0, min(offset, max(0, self._num_rows() - 1))))

    def select(self, idx: int | None) -> None:
        if idx is not None and not (0 <= idx < len(self.rows)):
            self.errors.append(f"select out of range: {idx}")
            return
        self.selected = idx

    def _num_rows_or_none(self) -> int | None:
        n = getattr(self.engine, "num_rows", None)
        if callable(n):
            try:
                return n(self.query_id)
            except Exception as e:
                self.errors.append(str(e))
        return None

    def _num_rows(self) -> int:
        # for display: fall back to the current extent — never a
        # fabricated total (forward paging uses _num_rows_or_none and
        # the empty-page stop instead)
        total = self._num_rows_or_none()
        return total if total is not None else self.top_offset + len(self.rows)

    # --------------------------------------------------------- rendering

    def _layout(self) -> tuple[list[str], list[int]]:
        """Column names + widths: widest of header/visible cells, capped
        (record_table.rs:191-289 computes the same max-width vector from
        the visible records)."""
        cols = list(self.rows[0].keys()) if self.rows else []
        widths = []
        for c in cols:
            w = max(
                [len(c)] + [len(_cell_str(r[c])) for r in self.rows]
            )
            widths.append(min(w, self.max_cell_width))
        return cols, widths

    def _clip(self, s: str, w: int) -> str:
        return s if len(s) <= w else s[: w - 1] + "…"

    def render(self) -> str:
        cols, widths = self._layout()
        if not cols:
            return "(empty result)\n" + "\n".join(
                f"! {e}" for e in self.errors
            )
        lines = []
        head = " | ".join(c.ljust(w) for c, w in zip(cols, widths))
        lines.append("   " + head)
        lines.append("   " + "-+-".join("-" * w for w in widths))
        for i, r in enumerate(self.rows):
            mark = " > " if i == self.selected else "   "
            lines.append(
                mark
                + " | ".join(
                    self._clip(_cell_str(r[c]), w).ljust(w)
                    for c, w in zip(cols, widths)
                )
            )
        last = self.top_offset + max(len(self.rows) - 1, 0)
        lines.append(
            f"rows {self.top_offset}-{last} of {self._num_rows()}"
        )
        for e in self.errors[-3:]:
            lines.append(f"! {e}")
        return "\n".join(lines)


def main(argv: list[str] | None = None) -> int:
    import argparse
    import sys

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("sql")
    ap.add_argument("--base", default="/root/testdata/sf0.001")
    ap.add_argument("--page", type=int, default=10)
    ap.add_argument("--mode", default="spark", choices=("spark", "reference"))
    args = ap.parse_args(argv)

    from chapterhouseqe_spark import ConnectionRegistry, QueryEngine, get_spark

    spark = get_spark("record_browser", shuffle_partitions=8)
    eng = QueryEngine(
        spark,
        results_root="/tmp/record_browser_results",
        registry=ConnectionRegistry(default_base=args.base),
    )
    qid = eng.run_query_sync(args.sql, mode=args.mode)
    br = RecordBrowser(eng, qid, page_size=args.page)
    print(br.render())
    for line in sys.stdin:
        cmd = line.strip().split()
        if not cmd or cmd[0] == "q":
            break
        if cmd[0] == "n":
            br.page_forward()
        elif cmd[0] == "p":
            br.page_backward()
        elif cmd[0] == "g" and len(cmd) > 1:
            br.goto(int(cmd[1]))
        print(br.render())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
