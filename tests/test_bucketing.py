"""Bucketed co-located joins: pre-shuffled tables join without an
exchange — the 100 TB pattern for repeated joins on the same key
(prompt: 'repartition()/bucketing for co-located joins')."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    import shutil

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    # a fresh Derby metastore per session doesn't know about last run's
    # tables, but their warehouse directories persist — clear them or
    # saveAsTable fails with LOCATION_ALREADY_EXISTS
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for name in ("b_orders", "b_customer"):
        shutil.rmtree(f"{warehouse}/{name}", ignore_errors=True)
    (
        o.write.mode("overwrite")
        .bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .saveAsTable("b_orders")
    )
    (
        c.write.mode("overwrite")
        .bucketBy(8, "c_custkey")
        .sortBy("c_custkey")
        .saveAsTable("b_customer")
    )
    return "b_orders", "b_customer"


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    ot, ct = bucketed_tables
    # disable broadcast so the join must pick a shuffle or bucket strategy
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(ot).join(
            spark.table(ct), F.col("o_custkey") == F.col("c_custkey")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # bucket-aligned SortMergeJoin: zero shuffle exchanges
        assert "Exchange" not in plan, plan[:2000]
        assert joined.count() == spark.table(ot).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_correct(spark, bucketed_tables, sf_dir):
    ot, ct = bucketed_tables
    bucketed = (
        spark.table(ot)
        .join(spark.table(ct), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .count()
    )
    plain = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .join(
            spark.read.parquet(f"{sf_dir}/customer.parquet"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_mktsegment")
        .count()
    )
    assert sorted(map(tuple, bucketed.collect())) == sorted(map(tuple, plain.collect()))


def test_colocated_join_module_has_no_exchange(spark, sf_dir):
    from chapterhouseqe_spark.operators.bucketing import colocated_join

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(
            spark, sf_dir, "orders", "customer", "o_custkey", "c_custkey",
            num_buckets=8,
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:2000]
        assert joined.count() == spark.read.parquet(
            f"{sf_dir}/orders.parquet"
        ).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_tables_idempotent(spark, sf_dir):
    from chapterhouseqe_spark.operators.bucketing import bucketed_tables

    first = bucketed_tables(spark, sf_dir, {"nation": ["n_nationkey"]}, num_buckets=4)
    second = bucketed_tables(spark, sf_dir, {"nation": ["n_nationkey"]}, num_buckets=4)
    assert first == second
    assert spark.table(first["nation"]).count() == spark.read.parquet(
        f"{sf_dir}/nation.parquet"
    ).count()


def test_bucket_pruning_point_lookup(spark, sf_dir):
    # a point lookup on the bucket key reads ONE bucket, not the table.
    # autoBucketedScan normally disables bucketed scans when no
    # join/agg consumes the distribution — turn it off so the pruned
    # scan (and its SelectedBucketsCount) is observable.
    import re

    from pyspark.sql import functions as F

    from chapterhouseqe_spark.operators.bucketing import bucketed_tables

    prev = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        tables = bucketed_tables(
            spark, sf_dir, {"customer": ["c_custkey"]}, num_buckets=8
        )
        df = spark.table(tables["customer"]).filter(F.col("c_custkey") == 5)
        plan = df._jdf.queryExecution().executedPlan().toString()
        m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
        assert m and m.group(1) == "1" and m.group(2) == "8", plan[:1500]
        assert df.count() == 1
    finally:
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", prev
        )
