"""Query lifecycle tests: run → status → fetch, mirroring the reference's
client-visible API (async_query_client.rs:40-154,
query_handler_state.rs:28-44, query_data_handler.rs:183-571).
"""

from __future__ import annotations

import pytest

from chapterhouseqe_spark.connections import ConnectionRegistry
from chapterhouseqe_spark.engine import QueryEngine, QueryStatus, with_row_ids


@pytest.fixture
def engine(spark, sf_dir, tmp_path):
    registry = ConnectionRegistry(default_base=sf_dir)
    return QueryEngine(spark, results_root=str(tmp_path / "results"), registry=registry)


def test_lifecycle_complete(engine, sf_dir):
    qid = engine.run_query_sync(
        f"select * from read_files('{sf_dir}/region.parquet') where r_regionkey >= 0",
        mode="reference",
    )
    assert engine.status(qid) is QueryStatus.COMPLETE
    assert engine.num_rows(qid) == 5
    rows = engine.fetch(qid, offset=0, limit=10)
    assert len(rows) == 5
    assert {"r_regionkey", "r_name"} <= set(rows[0])


def test_fetch_forward_and_reverse_paging(engine, sf_dir):
    qid = engine.run_query_sync(
        f"select n_nationkey from read_files('{sf_dir}/nation.parquet')",
        mode="reference",
    )
    assert engine.num_rows(qid) == 25
    first = engine.fetch(qid, offset=0, limit=10)
    second = engine.fetch(qid, offset=10, limit=10)
    assert len(first) == 10 and len(second) == 10
    assert first != second
    # reverse: the 10 rows ENDING at offset 9 inclusive == forward page 1
    rev = engine.fetch(qid, offset=9, limit=10, forward=False)
    assert rev == first
    # reverse near the start clamps at 0 (query_data_handler.rs:425-463)
    rev_short = engine.fetch(qid, offset=4, limit=10, forward=False)
    assert rev_short == first[:5]


def test_empty_result_completes(engine, sf_dir):
    # ADVICE r1 high: empty results must COMPLETE, not ERROR
    # (empty batches flow through, filter_record.rs:17-39)
    qid = engine.run_query_sync(
        f"select * from read_files('{sf_dir}/region.parquet') where r_regionkey < 0",
        mode="reference",
    )
    assert engine.status(qid) is QueryStatus.COMPLETE, engine.error(qid)
    assert engine.num_rows(qid) == 0
    assert engine.fetch(qid, 0, 10) == []


def test_error_status(engine):
    qid = engine.run_query_sync("select * from read_files('/nope/*.parquet')")
    assert engine.status(qid) is QueryStatus.ERROR
    assert engine.error(qid)


def test_unknown_query_id(engine):
    with pytest.raises(KeyError):
        engine.status("no-such-id")


def test_spark_mode_full_sql(engine, sf_dir):
    qid = engine.run_query_sync(
        f"""
        select n.n_name, count(*) as cnt
        from read_files('{sf_dir}/nation.parquet') n
        join read_files('{sf_dir}/region.parquet') r
          on n.n_regionkey = r.r_regionkey
        group by n.n_name order by n.n_name limit 3
        """
    )
    assert engine.status(qid) is QueryStatus.COMPLETE, engine.error(qid)
    assert engine.num_rows(qid) == 3


def test_reference_mode_flagship(engine, sf_dir):
    # shape of sample_queries/simple.sql q4 (SURVEY §7.2)
    qid = engine.run_query_sync(
        f"""
        select n_nationkey, n_nationkey + 10.0 as key_plus_10,
               (n_regionkey + 10) / 100 as rk, 1.0 / (n_nationkey + 1) as inv
        from read_files('{sf_dir}/nation.parquet') where n_nationkey > 2 + 0.0
        """,
        mode="reference",
    )
    assert engine.status(qid) is QueryStatus.COMPLETE, engine.error(qid)
    assert engine.num_rows(qid) == 22
    row = engine.fetch(qid, 0, 1)[0]
    assert row["rk"] == 0  # integer division semantics


def test_run_script_multi_statement(engine, sf_dir):
    qids = engine.run_script(
        f"select * from read_files('{sf_dir}/region.parquet');"
        f"select * from read_files('{sf_dir}/nation.parquet') where n_name != 'a;b';"
    )
    assert len(qids) == 2
    assert engine.status(qids[0]) is QueryStatus.COMPLETE
    assert engine.status(qids[1]) is QueryStatus.COMPLETE
    assert engine.num_rows(qids[1]) == 25


def test_with_row_ids_dense_and_ordered(spark):
    df = spark.range(0, 1000).repartition(7)
    ided = with_row_ids(df)
    ids = [r["__row_id"] for r in ided.select("__row_id").collect()]
    assert sorted(ids) == list(range(1000))
    assert ided._chqe_total_rows == 1000


def test_with_row_ids_empty(spark):
    df = spark.range(0, 10).filter("id < 0")
    ided = with_row_ids(df)
    assert ided.count() == 0
    assert ided._chqe_total_rows == 0


def test_fetch_allow_overflow(engine, sf_dir):
    # query_data_handler.rs:425-463: a reverse page that hits row 0
    # short of `limit` overflows FORWARD to fill the page
    qid = engine.run_query_sync(
        f"select n_nationkey from read_files('{sf_dir}/nation.parquet')",
        mode="reference",
    )
    short = engine.fetch(qid, offset=4, limit=10, forward=False)
    assert len(short) == 5  # clamped without the flag
    full = engine.fetch(qid, offset=4, limit=10, forward=False, allow_overflow=True)
    assert len(full) == 10
    assert full[:5] == short  # same leading rows, window extended forward
    # near the end the overflow cannot exceed the result size
    tail = engine.fetch(qid, offset=23, limit=30, forward=False, allow_overflow=True)
    assert len(tail) == 25


def test_multi_from_bag_union(engine, sf_dir):
    # the reference wires multiple FROM relations into the same stage —
    # a bag union of their batches (logical_planner.rs:277-283)
    qid = engine.run_query_sync(
        f"select r_regionkey from read_files('{sf_dir}/region.parquet'), "
        f"read_files('{sf_dir}/region.parquet') where r_regionkey >= 0",
        mode="reference",
    )
    assert engine.status(qid) is QueryStatus.COMPLETE, engine.error(qid)
    assert engine.num_rows(qid) == 10  # 5 + 5, not 25 (no cross join)


def test_query_client_facade(engine, sf_dir):
    # AsyncQueryClient-shaped API (async_query_client.rs:40-154)
    from chapterhouseqe_spark.client import QueryClient

    client = QueryClient(engine)
    handle = client.run_query(
        f"select r_regionkey from read_files('{sf_dir}/region.parquet')",
        mode="reference",
    )
    assert client.wait_for_query(handle) is QueryStatus.COMPLETE
    assert client.get_query_status(handle) is QueryStatus.COMPLETE
    page = client.get_query_data(handle, 0, 3)
    assert len(page) == 3
    assert len(list(client.iter_query_data(handle, page_size=2))) == 5


def test_concurrent_queries(engine, sf_dir):
    # multi-query sessions: the reference's query handler tracks many
    # in-flight queries (query_handler_state.rs:104-117)
    qids = [
        engine.run_query(
            f"select n_nationkey from read_files('{sf_dir}/nation.parquet') "
            f"where n_nationkey % {k} = 0",
            mode="reference",
        )
        for k in (2, 3, 5, 7)
    ]
    for qid in qids:
        assert engine.wait(qid, timeout=120) is QueryStatus.COMPLETE, engine.error(qid)
    counts = [engine.num_rows(q) for q in qids]
    assert counts == [13, 9, 5, 4]  # multiples of k in 0..24


def test_fetch_before_complete_raises(engine, sf_dir):
    qid = engine.run_query_sync("select * from read_files('/nope/*.parquet')")
    with pytest.raises(RuntimeError):
        engine.fetch(qid, 0, 10)


def test_reference_mode_order_by_limit(engine, sf_dir):
    # the reference's own TODOs, implemented in its dialect
    qid = engine.run_query_sync(
        f"select n_nationkey, n_name from read_files('{sf_dir}/nation.parquet') "
        "where n_nationkey > 2 order by n_nationkey desc limit 4",
        mode="reference",
    )
    assert engine.status(qid) is QueryStatus.COMPLETE, engine.error(qid)
    rows = engine.fetch(qid, 0, 10)
    assert [r["n_nationkey"] for r in rows] == [24, 23, 22, 21]
    # multi-key ordering with expression
    qid2 = engine.run_query_sync(
        f"select n_regionkey, n_nationkey from read_files('{sf_dir}/nation.parquet') "
        "order by n_regionkey asc, n_nationkey desc limit 3",
        mode="reference",
    )
    rows2 = engine.fetch(qid2, 0, 10)
    assert [(r["n_regionkey"], r["n_nationkey"]) for r in rows2] == [
        (0, 20), (0, 15), (0, 10)
    ]


def test_materialize_partitioned(engine, sf_dir, tmp_path):
    out = str(tmp_path / "mat")
    n = engine.materialize(
        f"select o_orderstatus, o_orderkey, o_totalprice "
        f"from read_files('{sf_dir}/orders.parquet')",
        out,
        partition_by=["o_orderstatus"],
    )
    spark = engine.spark
    assert n == spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    # hive-style partition dirs exist and partition pruning applies
    import os

    dirs = [d for d in os.listdir(out) if d.startswith("o_orderstatus=")]
    assert len(dirs) >= 2
    pruned = spark.read.parquet(out).filter("o_orderstatus = 'F'")
    plan = pruned._sc._jvm.PythonSQLUtils.explainString(
        pruned._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan
