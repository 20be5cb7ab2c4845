"""Scale-utility tests: salted joins, schema drift, compaction, iterators."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from chapterhouseqe_spark.connections import ConnectionRegistry
from chapterhouseqe_spark.engine import QueryEngine, QueryStatus
from chapterhouseqe_spark.operators.util import salted_join


def test_salted_join_equals_plain_join(spark):
    # heavily skewed large side: 90% of rows share key 1
    large = spark.createDataFrame(
        [(1 if i % 10 else i, i) for i in range(1000)], "k int, payload int"
    )
    small = spark.createDataFrame([(i, f"dim{i}") for i in range(10)], "k int, name string")
    plain = large.join(small, "k").select("k", "payload", "name")
    salted = salted_join(large, small, ["k"]).select("k", "payload", "name")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_left_join(spark):
    large = spark.createDataFrame([(1, 1), (2, 2), (99, 3)], "k int, payload int")
    small = spark.createDataFrame([(1, "a"), (2, "b")], "k int, name string")
    out = salted_join(large, small, ["k"], how="left").select("k", "payload", "name")
    rows = {(r["k"], r["payload"]): r["name"] for r in out.collect()}
    assert rows[(99, 3)] is None  # unmatched left row survives
    assert rows[(1, 1)] == "a"


def test_merge_schema_drift(spark, tmp_path):
    # the reference's open TODO: schema differences across files
    d = str(tmp_path / "drift")
    spark.createDataFrame([(1, "a")], "id long, s string").write.parquet(d + "/f1.parquet")
    spark.createDataFrame([(2, "b", 9.5)], "id long, s string, extra double").write.parquet(
        d + "/f2.parquet"
    )
    eng = QueryEngine(spark, registry=ConnectionRegistry(default_base=d))
    qid = eng.run_query_sync(
        f"select * from read_files('{d}/f*.parquet', merge_schema=>'true')",
        mode="reference",
    )
    assert eng.status(qid) is QueryStatus.COMPLETE, eng.error(qid)
    rows = eng.fetch(qid, 0, 10)
    assert len(rows) == 2
    assert "extra" in rows[0]
    by_id = {r["id"]: r for r in rows}
    assert by_id[1]["extra"] is None and by_id[2]["extra"] == 9.5


def test_result_compaction(spark, sf_dir, tmp_path):
    eng = QueryEngine(
        spark,
        results_root=str(tmp_path / "res"),
        registry=ConnectionRegistry(default_base=sf_dir),
    )
    eng.max_records_per_file = 10
    qid = eng.run_query_sync(
        f"select n_nationkey from read_files('{sf_dir}/nation.parquet')",
        mode="reference",
    )
    state_path = f"{tmp_path}/res/{qid}"
    files = glob.glob(f"{state_path}/*.parquet")
    # 25 rows at ≤10 rows/file → at least 3 files
    assert len(files) >= 3
    assert eng.num_rows(qid) == 25


def test_iter_results(spark, sf_dir, tmp_path):
    eng = QueryEngine(
        spark,
        results_root=str(tmp_path / "res"),
        registry=ConnectionRegistry(default_base=sf_dir),
    )
    qid = eng.run_query_sync(
        f"select n_nationkey from read_files('{sf_dir}/nation.parquet')",
        mode="reference",
    )
    seen = [r["n_nationkey"] for r in eng.iter_results(qid, page_size=7)]
    assert len(seen) == 25
    assert sorted(seen) == list(range(25))


def test_targeted_salted_join_equals_plain_join_under_skew(spark):
    from chapterhouseqe_spark.operators.util import targeted_salted_join

    # one pathologically hot key (90% of rows) + a uniform tail
    hot = [(7, i) for i in range(9000)]
    tail = [(k, k * 10) for k in range(1000)]
    large = spark.createDataFrame(hot + tail, "k int, payload int")
    small = spark.createDataFrame(
        [(k, f"n{k}") for k in range(1000)], "k int, name string"
    )
    got = targeted_salted_join(
        large, small, ["k"],
        hot_row_threshold=1000, sample_fraction=0.1,
    ).select("k", "payload", "name")
    want = large.join(small, "k").select("k", "payload", "name")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_targeted_salted_join_no_skew_converges_to_plain(spark):
    from chapterhouseqe_spark.operators.util import targeted_salted_join

    large = spark.createDataFrame(
        [(k % 100, k) for k in range(5000)], "k int, payload int"
    )
    small = spark.createDataFrame(
        [(k, f"n{k}") for k in range(100)], "k int, name string"
    )
    got = targeted_salted_join(large, small, ["k"], hot_row_threshold=10**9)
    want = large.join(small, "k")
    assert got.count() == want.count() == 5000


def test_freq_items_sketch_finds_hot_key(spark):
    # the approximate (fixed-state) alternative to heavy_hitters_freq's
    # exact keyed count: freqItems must surface a 60%-frequency key
    rows = [(7,)] * 6000 + [(k,) for k in range(4000)]
    df = spark.createDataFrame(rows, "k int")
    found = df.freqItems(["k"], support=0.3).collect()[0]["k_freqItems"]
    assert 7 in found


def test_salted_join_salt_stable_under_recomputation(spark):
    # The salt must be a pure function of row content — identical across
    # independent recomputations and any input partitioning — or task
    # retry re-salts recomputed rows into different buckets and the join
    # silently duplicates/drops them (SPARK-23207 class).
    large = spark.createDataFrame(
        [(i % 5, f"p{i}") for i in range(200)], "k long, payload string"
    )
    small = spark.createDataFrame([(i, f"n{i}") for i in range(5)], "k long, name string")

    out = salted_join(large, small, ["k"]).select("k", "payload", "name")
    runs = [sorted(map(tuple, out.collect())) for _ in range(2)]
    assert runs[0] == runs[1]

    # same rows, different physical partitioning -> same join result
    # (an id-derived salt would differ here; a content salt cannot)
    re = salted_join(large.repartition(13), small, ["k"]).select(
        "k", "payload", "name"
    )
    assert sorted(map(tuple, re.collect())) == runs[0]

    # and the per-row salt value itself is partitioning-invariant
    from pyspark.sql import functions as F

    salt = F.pmod(F.xxhash64("k", "payload"), F.lit(16)).alias("s")
    a = sorted(map(tuple, large.select("payload", salt).collect()))
    b = sorted(map(tuple, large.repartition(7).select("payload", salt).collect()))
    assert a == b
