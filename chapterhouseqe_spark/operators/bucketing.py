"""Bucketed tables — shuffle-free co-located joins.

At 100 TB the dominant cost of a fact-fact join (lineitem ⋈ orders on
the order key) is the pairwise shuffle: both inputs are hash-exchanged
in full before the join can run. Pre-bucketing both tables on the join
key with the SAME bucket count removes that exchange entirely — Spark's
scan emits one partition per bucket, the join sees compatible
``HashPartitioning`` on both sides, and the plan is a zero-``Exchange``
SortMergeJoin (with ``sortBy`` on the bucket key even the sort is
pre-paid at write time). This is the Spark analog of the reference's
hash-exchange operator (SURVEY §2.11, exchange/record_router) — except
the partitioning is persisted with the data, so EVERY subsequent join
or aggregation on that key across queries reuses it for free.

Scale posture: bucket count is chosen at write time to bound per-bucket
bytes at the target scale (100 TB / 4096 buckets ≈ 25 GB per bucket,
split further by file); bucket pruning (``spark.sql.sources.
bucketing.enabled``, on by default) also turns point lookups on the
bucket key into single-bucket scans.
"""

from __future__ import annotations

import hashlib
from typing import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_cols: Sequence[str],
    num_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Materialize ``df`` as a bucketed (+ optionally sorted) parquet table.

    ``sort_cols`` defaulting to the bucket key pre-pays the sort half of
    every future SortMergeJoin on that key.
    """
    writer = df.write.format("parquet").mode(mode).bucketBy(
        num_buckets, *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_tables(
    spark: SparkSession,
    sf_dir: str,
    specs: Mapping[str, Sequence[str]],
    *,
    num_buckets: int = 32,
) -> dict[str, str]:
    """Idempotently materialize bucketed copies of raw parquet tables.

    ``specs`` maps table name → bucket-key columns. Returns table name →
    catalog table. The catalog name is keyed on (sf_dir, bucket count)
    so distinct scale factors coexist; the source dirs are read-only
    test fixtures, so an existing table is always current.
    """
    out: dict[str, str] = {}
    for name, keys in specs.items():
        # the cache key MUST include the bucket-key columns: the same
        # table bucketed on a different key is a different physical
        # layout, and silently reusing it would reintroduce the very
        # Exchange this module exists to eliminate.
        tag = hashlib.md5(
            f"{sf_dir}:{num_buckets}:{','.join(keys)}".encode()
        ).hexdigest()[:8]
        table = f"chqe_bkt{num_buckets}_{tag}_{name}"
        if not spark.catalog.tableExists(table):
            # a fresh metastore can coexist with a stale warehouse dir
            # from an earlier process — clear the location or saveAsTable
            # fails with LOCATION_ALREADY_EXISTS
            import shutil

            warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix(
                "file:"
            )
            shutil.rmtree(f"{warehouse}/{table}", ignore_errors=True)
            df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
            write_bucketed(
                df,
                table,
                bucket_cols=keys,
                sort_cols=keys,
                num_buckets=num_buckets,
            )
        out[name] = table
    return out


def colocated_join(
    spark: SparkSession,
    sf_dir: str,
    left: str,
    right: str,
    left_key: str,
    right_key: str,
    *,
    num_buckets: int = 32,
) -> DataFrame:
    """Join two tables through same-count bucketed copies — no exchange.

    Both sides are bucketed on their join key with the same count, so
    the SortMergeJoin consumes the scans directly: zero ``Exchange``
    nodes on either input (asserted by
    ``tests/test_bucketing.py::test_colocated_join_has_no_exchange``).
    """
    tables = bucketed_tables(
        spark,
        sf_dir,
        {left: [left_key], right: [right_key]},
        num_buckets=num_buckets,
    )
    l = spark.table(tables[left])
    r = spark.table(tables[right])
    # hint("merge") keeps the demo honest even when one side is small
    # enough that AQE would broadcast it (broadcasting would ALSO avoid
    # the shuffle, but then the plan proves nothing about bucketing).
    return l.hint("merge").join(r, l[left_key] == r[right_key])
