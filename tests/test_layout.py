"""cluster_write produces a skippable layout; file_key_ranges proves it
from parquet footers instead of assuming it."""

from __future__ import annotations

from chapterhouseqe_spark.operators.layout import cluster_write, file_key_ranges


def test_cluster_write_files_are_disjoint_in_key_space(spark, sf_dir, tmp_path):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    out = str(tmp_path / "clustered")
    cluster_write(orders, out, ["o_custkey"], num_files=8)

    ranges = file_key_ranges(out, "o_custkey")
    assert len(ranges) >= 2, "expected multiple output files"
    # range partitioner keeps equal keys together → strictly disjoint
    for (_, _, hi), (_, lo_next, _) in zip(ranges, ranges[1:]):
        assert hi < lo_next, f"overlapping file key ranges: {hi} !< {lo_next}"

    # total coverage: nothing lost by the re-layout
    assert (
        spark.read.parquet(out).count() == orders.count()
    ), "cluster_write changed row count"

    # a point predicate on the cluster key reaches the scan as a pushed
    # filter (row-group skipping consumes it against the narrow stats)
    probe = spark.read.parquet(out).filter("o_custkey = 7")
    plan = probe._sc._jvm.PythonSQLUtils.explainString(
        probe._jdf.queryExecution(), "formatted"
    )
    assert "PushedFilters" in plan and "o_custkey" in plan.split("PushedFilters")[1][:200]


def test_unclustered_write_overlaps_by_contrast(spark, sf_dir, tmp_path):
    """Round-robin layout puts every key range in every file — the
    baseline cluster_write exists to beat."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    out = str(tmp_path / "roundrobin")
    orders.repartition(8).write.parquet(out)

    ranges = file_key_ranges(out, "o_custkey")
    assert len(ranges) >= 2
    overlaps = sum(
        1 for (_, _, hi), (_, lo, _) in zip(ranges, ranges[1:]) if hi >= lo
    )
    assert overlaps > 0, "random layout unexpectedly produced disjoint files"
