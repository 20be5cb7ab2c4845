"""chapterhouseqe_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query & data-processing capabilities of
alekLukanen/ChapterhouseQE (reference: a Rust/Arrow distributed SQL engine),
re-expressed Spark-first: the DataFrame/SQL API declares logical plans,
Catalyst + Tungsten own optimization and physical execution, and the
reference's actor/exchange runtime (~80% of its LoC) is deliberately NOT
rebuilt — Spark's shuffle, scheduler, and task-retry provide it natively
(see SURVEY.md §2.11, §4).

Public surface:
    - :class:`~chapterhouseqe_spark.engine.QueryEngine` — run_query /
      status / fetch lifecycle mirroring the reference's query handler
      (reference: src/handlers/query_handler/query_handler.rs).
    - :class:`~chapterhouseqe_spark.connections.ConnectionRegistry` —
      named storage connections (reference: src/handlers/connection_registry.rs).
    - :mod:`~chapterhouseqe_spark.sql` — the ``read_files`` table-function
      front-end + reference-semantics expression compiler.
    - :mod:`~chapterhouseqe_spark.operators` — dedup / similarity / text /
      multimodal operators for large-scale data pipelines.
    - :mod:`~chapterhouseqe_spark.streaming` — Structured Streaming ops.
"""

from chapterhouseqe_spark.client import QueryClient, QueryHandle
from chapterhouseqe_spark.connections import ConnectionRegistry
from chapterhouseqe_spark.engine import QueryEngine, QueryStatus
from chapterhouseqe_spark.service import (
    QueryDataIterator,
    QueryService,
    QueryServiceClient,
)
from chapterhouseqe_spark.session import get_spark

__all__ = [
    "ConnectionRegistry",
    "QueryClient",
    "QueryDataIterator",
    "QueryEngine",
    "QueryHandle",
    "QueryService",
    "QueryServiceClient",
    "QueryStatus",
    "get_spark",
]

__version__ = "0.1.0"
