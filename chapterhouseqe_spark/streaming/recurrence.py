"""Streaming EWMA: the batch recurrence family
(``operators/temporal.ewma_series``) as an incremental stateful
operator — per-key level carried ACROSS micro-batches, so a replayed
or tailed stream produces exactly the rows the batch fold produces.

Per-key state is ONE double (the current level) plus the count of
points folded — O(|series|) total, the natural floor for any
recurrence; no timeout/eviction is needed because the series key
space (event types, sensor ids) IS the state space, unlike debounce
whose key space grows with users.

Exactness contract (same as debounce.py): rows fold in (ts, event_id)
order within each micro-batch, so the stream equals the batch fold
when delivery is in order across batches (a replayed log, time-ordered
files). Out-of-order delivery needs watermark buffering upstream.
``tests/test_streaming.py`` pins cross-batch equality against the
pure-Python fold with the state surviving a micro-batch boundary.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_STATE = T.StructType(
    [
        T.StructField("level", T.DoubleType()),
        T.StructField("n_seen", T.LongType()),
    ]
)
_OUT = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("ewma", T.DoubleType()),
    ]
)


def _make_update(alpha: float):
    a = float(alpha)
    b = 1.0 - a

    def update(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        s, n = state.get if state.exists else (None, 0)
        batch = pd.concat(list(pdfs))
        if batch.empty:
            return
        batch = batch.sort_values(["ts", "event_id"])
        out = []
        # identical scalar-IEEE fold to operators/temporal.ewma_series
        for x in batch["value"].tolist():
            s = x if s is None else a * x + b * s
            n += 1
            out.append(s)
        state.update((float(s), int(n)))
        batch = batch.assign(ewma=out)
        yield batch[["event_type", "ts", "event_id", "value", "ewma"]]

    return update


def streaming_ewma(events: DataFrame, alpha: float = 0.25) -> DataFrame:
    """EWMA per event_type over a stream of (event_type, ts, event_id,
    value) rows; emits every input row with its running ``ewma``."""
    return events.groupBy("event_type").applyInPandasWithState(
        _make_update(alpha),
        outputStructType=_OUT,
        stateStructType=_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
