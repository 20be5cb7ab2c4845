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

import hashlib
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
    View names are deterministic per (connection, path) — a short hash of
    the raw pair is appended so distinct sources can never collide after
    sanitization (e.g. ``a/b.parquet`` vs ``a_b.parquet`` — ADVICE r1) —
    so repeated use in one statement resolves to one scan (Catalyst
    reuses the exchange).

    Occurrences inside single-quoted SQL string literals are left alone:
    a match is a genuine call site iff an even number of quote characters
    precedes it (SQL escapes a quote by doubling it, which preserves that
    parity invariant).
    """
    registry = registry or ConnectionRegistry()

    out: list[str] = []
    last = 0
    for m in _READ_FILES_RE.finditer(sql):
        if sql.count("'", 0, m.start()) % 2 == 1:
            continue  # inside a string literal — not a call site
        path = m.group("path").replace("''", "'")
        conn = m.group("conn") or "default"
        digest = hashlib.md5(f"{conn}\x00{path}".encode()).hexdigest()[:10]
        view = (
            "read_files_"
            + re.sub(r"[^A-Za-z0-9]", "_", f"{conn}_{path}")[:64]
            + "_"
            + digest
        )
        df = load_glob(spark, path, conn, registry)
        df.createOrReplaceTempView(view)
        out.append(sql[last : m.start()])
        out.append(view)
        last = m.end()
    out.append(sql[last:])
    return "".join(out)
