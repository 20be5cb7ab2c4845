"""Query registry: every implemented operator as (Spark build, DuckDB oracle)."""

from chapterhouseqe_spark.queries.registry import QUERIES, Query, get_queries, get_oracles

__all__ = ["QUERIES", "Query", "get_queries", "get_oracles"]
