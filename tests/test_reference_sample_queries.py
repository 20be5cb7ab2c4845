"""Run the reference's own sample_queries/simple.sql VERBATIM.

The five queries (reference: sample_queries/simple.sql) execute
unchanged through the engine's reference mode against sample data with
the reference's exact shapes (tools/create_sample_data.py) — the
strongest drop-in-compatibility demonstration: a reference user's
query files work as-is.
"""

from __future__ import annotations

import pytest

from chapterhouseqe_spark.connections import ConnectionRegistry
from chapterhouseqe_spark.engine import QueryEngine, QueryStatus

# sample_queries/simple.sql, byte-for-byte — including the line
# comments, which the statement splitter strips like the reference's
# sqlparser does
SIMPLE_SQL = """-- query 1
select * from read_files('sample_data/simple/*.parquet')
  where id < 25;

-- query 2
select * from read_files('sample_data/simple_wide_string/*.parquet')
  where id > 25;

-- query 3
select id, value2 from read_files('sample_data/simple/*.parquet')
  where id < 75;

-- query 4
select
  id,
  value1,
  id + 10.0 as id_plus_10,
  (value2 + 10) / 100 as value2,
  1.0 / id as value3,
  1.0 / (id * id) as value4,
  id * id as value5
from read_files('sample_data/simple/*.parquet')
  where id > 25 + 0.0;

-- query 5
select * from read_files('sample_data/simple/*.parquet')
  where id % 2 = 0;
"""


@pytest.fixture(scope="module")
def sample_engine(spark, tmp_path_factory):
    from tools.create_sample_data import DATASETS, simple_data

    base = str(tmp_path_factory.mktemp("refdata"))
    for name in ("simple", "simple_wide_string"):
        rows, ssize, per_file = DATASETS[name]
        simple_data(f"{base}/sample_data/{name}", rows, ssize, per_file)
    return QueryEngine(
        spark,
        results_root=f"{base}/results",
        registry=ConnectionRegistry(default_base=base),
    )


def test_reference_simple_sql_runs_verbatim(sample_engine):
    qids = sample_engine.run_script(SIMPLE_SQL, mode="reference")
    assert len(qids) == 5
    for qid in qids:
        assert sample_engine.status(qid) is QueryStatus.COMPLETE, sample_engine.error(qid)
    # q1: id < 25 → 25 rows; q2: id > 25 on wide strings → 74 rows
    assert sample_engine.num_rows(qids[0]) == 25
    assert sample_engine.num_rows(qids[1]) == 74
    # q3: projection, 75 rows
    assert sample_engine.num_rows(qids[2]) == 75
    rows3 = sample_engine.fetch(qids[2], 0, 1)
    assert set(rows3[0]) == {"id", "value2"}
    # q4: flagship — 74 rows, reference arithmetic semantics
    assert sample_engine.num_rows(qids[3]) == 74
    r4 = sample_engine.fetch(qids[3], 0, 3)
    for row in r4:
        assert row["id_plus_10"] == pytest.approx(row["id"] + 10.0)
        assert row["value5"] == row["id"] * row["id"]
        # (value2 + 10) / 100 in float32 — stays fractional (not int div)
        assert 0.0 <= row["value2"] < 2.0
    # q5: id % 2 = 0 → half the rows (reference's huge_simple benchmark shape)
    assert sample_engine.num_rows(qids[4]) == 50
