"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference's
sample_queries/simple.sql q4 shape — SURVEY.md §7.2) through the
engine's reference-semantics mode on sf0.001. ``queries()`` /
``oracle_sql()`` expose the full registry from
:mod:`chapterhouseqe_spark.queries` — one entry per implemented
operator from SURVEY.md §2 plus the pipeline/streaming extensions.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from chapterhouseqe_spark.connections import ConnectionRegistry
    from chapterhouseqe_spark.engine import QueryEngine

    engine = QueryEngine(
        spark, registry=ConnectionRegistry(default_base="/root/testdata/sf0.001")
    )
    # reference flagship shape (sample_queries/simple.sql q4): projection
    # with arithmetic, float literals, integer division, WHERE with
    # constant folding — through the reference-semantics compiler.
    return engine.dataframe_for(
        "select l_orderkey, l_quantity, l_quantity + 10.0 as qty_plus_10, "
        "(l_linenumber + 10) / 100 as lnum_div, l_orderkey * l_orderkey as key_sq "
        "from read_files('lineitem.parquet') where l_quantity > 25 + 0.0",
        mode="reference",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Each callable takes (spark, sf_dir) and returns a DataFrame.
    Every computed column is aliased identically to ``oracle_sql``.
    """
    from chapterhouseqe_spark.queries.registry import get_queries

    return get_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query — ALL registered queries
    carry one (even the seeded ANN tiers, whose fixed seeds make them
    pure functions the oracle replays end-to-end)."""
    from chapterhouseqe_spark.queries.registry import get_oracles

    return get_oracles()
