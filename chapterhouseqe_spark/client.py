"""Client facade mirroring the reference's AsyncQueryClient surface.

The reference client speaks TCP to a worker
(reference: src/client/async_query_client.rs:40-154 — ``run_query`` →
``RunQueryResp::Created{query_id}``, ``get_query_status`` polling,
``get_query_data`` cursor pages) and wraps iteration in
``QueryDataIterator`` (client/query_data_iterator.rs:58-142). Here the
"server" is the in-process :class:`~chapterhouseqe_spark.engine.QueryEngine`
— same call shapes, same lifecycle, no network hop. The reference's
``(file_idx, row_group_idx, row_idx)`` cursor collapses to a flat row
offset: results carry a dense ``__row_id``, which is the same total
order the reference's file walker produces, addressed directly.
"""

from __future__ import annotations

from dataclasses import dataclass

from chapterhouseqe_spark.engine import QueryEngine, QueryStatus


@dataclass
class QueryHandle:
    """RunQueryResp::Created analog (query_handler.rs:445-450)."""

    query_id: str


class QueryClient:
    """Synchronous client over a QueryEngine.

    Method names and semantics follow async_query_client.rs; ``poll_
    interval`` stands in for the reference client's retry loop
    (async_query_client.rs:62-114).
    """

    def __init__(self, engine: QueryEngine):
        self.engine = engine

    def run_query(self, sql: str, mode: str = "spark") -> QueryHandle:
        return QueryHandle(self.engine.run_query(sql, mode))

    def get_query_status(self, handle: QueryHandle | str) -> QueryStatus:
        qid = handle.query_id if isinstance(handle, QueryHandle) else handle
        return self.engine.status(qid)

    def wait_for_query(
        self, handle: QueryHandle | str, timeout: float | None = None
    ) -> QueryStatus:
        qid = handle.query_id if isinstance(handle, QueryHandle) else handle
        return self.engine.wait(qid, timeout)

    def get_query_data(
        self,
        handle: QueryHandle | str,
        offset: int = 0,
        limit: int = 1000,
        forward: bool = True,
        allow_overflow: bool = False,
    ) -> list[dict]:
        qid = handle.query_id if isinstance(handle, QueryHandle) else handle
        return self.engine.fetch(qid, offset, limit, forward, allow_overflow)

    def iter_query_data(self, handle: QueryHandle | str, page_size: int = 1000):
        """QueryDataIterator analog — forward-only row iterator."""
        qid = handle.query_id if isinstance(handle, QueryHandle) else handle
        return self.engine.iter_results(qid, page_size)
