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
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Skew-resistant equi-join: salt the large side, replicate the small.

    A hot key on the large side lands in ``salt_buckets`` different
    shuffle partitions instead of one straggler task; the small side is
    replicated ``salt_buckets``× (explode) so every salted key still
    finds its match. Use when AQE's skew-join splitting isn't enough —
    e.g. a single key holding >10% of a 100 TB fact table.

    RETRY SAFETY: the salt is derived from row CONTENT —
    ``xxhash64(salt_cols or all columns)`` — never from
    ``monotonically_increasing_id``/``rand``, which are nondeterministic
    under task retry: a lost shuffle block would re-salt recomputed rows
    into different buckets and silently duplicate/drop them (the
    SPARK-23207 failure class). A content salt recomputes identically on
    every replay of the same input split. Pass ``salt_cols`` (ideally a
    high-cardinality stable id) to cheapen the hash; default hashes the
    whole row, which is still deterministic but wider.

    ``how`` must keep large-side rows unique per match (inner / left).
    """
    salt_src = [large[c] for c in (salt_cols or large.columns)]
    salt = F.pmod(F.xxhash64(*salt_src), F.lit(salt_buckets))
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
    salt_cols: list[str] | None = None,
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
    hot = salted_join(large_hot, small_hot, on, how, salt_buckets, salt_cols)
    return cold.unionByName(hot)


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Repartition when the scan under-partitions the cluster.

    Small inputs (e.g. one parquet file) arrive as one partition, which
    single-threads every narrow-but-expensive stage downstream. At real
    scale the input split count already exceeds core count and this is a
    no-op — the repartition only fires when the estimated split count is
    below half the default parallelism, so it never adds a shuffle to a
    well-split 100 TB scan.

    The estimate is ``len(df.inputFiles())`` — a metadata-only catalog
    probe (file listing is already cached by the scan relation). The old
    ``df.rdd.getNumPartitions()`` probe forced a full logical-plan →
    RDD conversion per call, which stacked a plan-analysis tax under
    every dedup/similarity operator; inputFiles() touches no executor
    and never converts the plan. A file-backed frame with ≥ target/2
    files has ≥ that many splits (maxPartitionBytes only splits further,
    never merges below file count), so the no-op direction is safe; for
    non-file frames (in-memory ranges, streaming) inputFiles() is empty
    and we conservatively repartition — those frames are small by
    construction in this engine.
    """
    if df.isStreaming:
        # inputFiles() is illegal on a streaming frame (and split
        # sizing is the source's job there: maxFilesPerTrigger /
        # batch_rows govern per-micro-batch parallelism) — the
        # operator-side repartition is a batch-only concern.
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    if len(df.inputFiles()) < max(2, target // 2):
        return df.repartition(target)
    return df
