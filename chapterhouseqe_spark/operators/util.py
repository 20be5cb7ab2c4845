"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Repartition when the scan under-partitions the cluster.

    Small inputs (e.g. one parquet file) arrive as one partition, which
    single-threads every narrow-but-expensive stage downstream. At real
    scale the input split count already exceeds core count and this is a
    no-op — the repartition only fires when partitions < half the
    default parallelism, so it never adds a shuffle to a well-split
    100 TB scan.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, target // 2):
        return df.repartition(target)
    return df
