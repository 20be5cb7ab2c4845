"""Session windows + a custom stateful operator.

Two layers, matching how you'd build this at 100 TB:

- :func:`sessionize` uses Spark's native ``session_window`` — the
  built-in operator handles gap-merging incrementally in streaming with
  watermark-bounded state. Prefer this; it's pure JVM.
- :func:`stateful_user_stats` is the CUSTOM stateful path
  (``applyInPandasWithState``) for semantics the built-ins can't
  express — shown here as a per-user running aggregate with idle
  timeout. State is per-key and Arrow-batched; at scale the shuffle is
  keyed by user and state-store size is O(active keys).

Session semantics (both layers, and the DuckDB oracle): an event starts
a new session when it is ≥ gap after the previous event of the same
user — i.e. Spark's half-open ``[first, last+gap)`` merge rule.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from chapterhouseqe_spark.queries.registry import ts_str


def sessionize(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Per-user session aggregation via the native session_window.

    Works identically on a batch or streaming DataFrame (streaming needs
    a watermark upstream for state cleanup).
    """
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            ts_str(F.col("w.start")).alias("session_start"),
            "n_events",
        )
    )


_STATE_SCHEMA = T.StructType(
    [T.StructField("n", T.LongType()), T.StructField("total", T.DoubleType())]
)
_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)


def _update_user_stats(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Running (count, sum) per user with idle-timeout state eviction —
    the applyInPandasWithState contract: called once per key per
    micro-batch with the key's Arrow batches and its persisted state."""
    if state.hasTimedOut:
        n, total = state.get
        state.remove()
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "sum_value": [total]})
        return
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    state.setTimeoutDuration(60_000)
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "sum_value": [total]})


def stateful_user_stats(events: DataFrame) -> DataFrame:
    """Custom stateful streaming op: per-user running stats via
    applyInPandasWithState (update mode)."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update_user_stats,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
