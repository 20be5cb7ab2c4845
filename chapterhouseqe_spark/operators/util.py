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


def targeted_salted_join(
    large: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    salt_buckets: int = 16,
    hot_row_threshold: int = 1_000_000,
    sample_fraction: float = 0.001,
    seed: int = 42,
) -> DataFrame:
    """Production skew join: salt ONLY detected hot keys.

    Unconditional salting (:func:`salted_join`) replicates the whole
    small side ``salt_buckets``× — the right tool when the caller KNOWS
    the key is skewed, but a ~10× tax when it isn't. This variant pays a
    seeded sample + tiny aggregation to estimate per-key row counts,
    splits the large side into hot (estimated > ``hot_row_threshold``
    rows) and cold partitions, salts only the hot slice (small side
    restricted to hot keys before replication), and unions with a plain
    join for the rest. With no skew the hot set is empty and the cost
    converges to the plain join. Result equals the unsalted join for
    inner/left (each large row joins the same matches either way).

    At 100 TB: the sample scan piggybacks on the main scan's I/O path,
    the hot-key set is by construction tiny (keys holding >threshold
    rows), and the union's two branches shuffle-partition independently
    so a single pathological key no longer defines the straggler task.
    """
    est = (
        large.sample(fraction=sample_fraction, seed=seed)
        .groupBy(*on)
        .count()
        .filter(F.col("count") * (1.0 / sample_fraction) > hot_row_threshold)
        .select(*on)
    )
    hot_keys = F.broadcast(est)
    large_hot = large.join(hot_keys, on, "left_semi")
    large_cold = large.join(hot_keys, on, "left_anti")
    small_hot = small.join(hot_keys, on, "left_semi")
    cold = large_cold.join(small, on, how)
    hot = salted_join(large_hot, small_hot, on, how, salt_buckets)
    return cold.unionByName(hot)


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
