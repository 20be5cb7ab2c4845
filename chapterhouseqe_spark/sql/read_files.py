"""``read_files`` table-function resolution for full Spark SQL.

The reference exposes exactly one table function,
``read_files('<glob>' [, connection=>'<name>'])``
(reference: read_files_task.rs:45-105 for the syntax validator + arg
parsing). The engine's "spark" mode accepts ANY Spark SQL and supports
the same table function by rewriting each call site into a registered
temp view backed by ``spark.read.parquet``/``csv``/``json`` — after which
Catalyst owns predicate pushdown, column pruning, and partition planning
(the reference lists all three as TODOs; SURVEY.md §4.1).

Format is inferred from the glob suffix: ``.parquet`` (reference parity),
plus ``.csv`` / ``.json`` which the reference declares but never built
(README "Supported SQL" unchecked boxes).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from chapterhouseqe_spark.connections import ConnectionRegistry

_READ_FILES_RE = re.compile(
    r"""read_files\s*\(\s*
        '(?P<path>(?:[^']|'')+)'\s*
        (?:,\s*connection\s*=>\s*'(?P<conn>[^']+)'\s*)?
        \)""",
    re.IGNORECASE | re.VERBOSE,
)


def load_glob(
    spark: SparkSession,
    path_glob: str,
    connection: str = "default",
    registry: ConnectionRegistry | None = None,
) -> DataFrame:
    """Resolve a connection-relative glob and load it as a DataFrame."""
    registry = registry or ConnectionRegistry()
    resolved = registry.get(connection).resolve(path_glob)
    lower = resolved.lower()
    if lower.endswith(".csv"):
        return spark.read.option("header", "true").option("inferSchema", "true").csv(resolved)
    if lower.endswith((".json", ".jsonl", ".ndjson")):
        return spark.read.json(resolved)
    return spark.read.parquet(resolved)


def rewrite_read_files(
    spark: SparkSession,
    sql: str,
    registry: ConnectionRegistry | None = None,
) -> str:
    """Replace each ``read_files(...)`` call with a temp-view name.

    Returns SQL that Spark's parser accepts; any trailing alias in the
    original text keeps working because ``FROM <view> <alias>`` is valid.
    View names are deterministic per (path, connection) so repeated use
    in one statement resolves to one scan (Catalyst reuses the exchange).
    """
    registry = registry or ConnectionRegistry()

    def _sub(m: re.Match) -> str:
        path = m.group("path").replace("''", "'")
        conn = m.group("conn") or "default"
        view = "read_files_" + re.sub(r"[^A-Za-z0-9]", "_", f"{conn}_{path}")
        df = load_glob(spark, path, conn, registry)
        df.createOrReplaceTempView(view)
        return view

    return _READ_FILES_RE.sub(_sub, sql)
