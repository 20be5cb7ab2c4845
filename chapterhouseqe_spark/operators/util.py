"""Shared operator utilities: parallelism repair and skew-resistant joins."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-resistant equi-join: salt the large side, replicate the small.

    A hot key on the large side lands in ``salt_buckets`` different
    shuffle partitions instead of one straggler task; the small side is
    replicated ``salt_buckets``× (explode) so every salted key still
    finds its match. Use when AQE's skew-join splitting isn't enough —
    e.g. a single key holding >10% of a 100 TB fact table. The salt is
    derived per-row from xxhash64(monotonically_increasing_id), so it is
    uniform and needs no extra column from the caller.

    ``how`` must keep large-side rows unique per match (inner / left).
    """
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets))
    left = large.withColumn("__salt_l", salt.cast("int"))
    right = small.withColumn(
        "__salt_r", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    cond = [left[c] == right[c] for c in on] + [
        left["__salt_l"] == right["__salt_r"]
    ]
    joined = left.join(right, cond, how)
    # drop the salt and the duplicated right-side key columns
    for c in on:
        joined = joined.drop(right[c])
    return joined.drop("__salt_l", "__salt_r")


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
