"""True debounce (previous-KEPT-event semantics) as a custom stateful
streaming operator.

The registry's ``events_debounce`` is the lag-based THROTTLE: an event
survives if >= gap since the previous RAW event. True debounce compares
against the previous KEPT event — a sequential fold that no window
function (Spark or DuckDB) can express, which makes it exactly the
shape ``applyInPandasWithState`` exists for: per-key state is one
timestamp (the last kept event), updated left-to-right.

The two differ whenever a burst outlasts the gap: for events at
t=0s,30s,70s with gap 60s the throttle keeps only t=0 (every
consecutive gap < 60) while debounce keeps t=0 and t=70 (70s since the
last KEPT event) — ``tests/test_streaming.py`` pins that divergence.

Exactness contract: per micro-batch the key's rows are processed in
(ts, event_id) order, so the fold is exact when delivery is in order
ACROSS batches (a replayed log, a file stream written in time order).
Out-of-order streams need watermark buffering upstream — same contract
as every sequential stateful op.

100 TB posture: the stream shuffles once on (user, type); state is ONE
int64 per active key, and the event-time timeout retires a key as soon
as the watermark passes last_kept + gap — from then on ANY later event
is >= gap after the last kept one and would be kept regardless, so the
state is provably no longer needed. State size is O(keys active within
one gap of the watermark), not O(keys ever seen).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_STATE = T.StructType([T.StructField("last_kept_us", T.LongType())])
_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_id", T.LongType()),
    ]
)


def _make_update(gap_us: int):
    def update(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # watermark passed last_kept + gap: every future event of
            # this key clears the gap by construction — state retired.
            state.remove()
            return
        (last,) = state.get if state.exists else (None,)
        batch = pd.concat(list(pdfs))
        if batch.empty:
            return
        batch = batch.sort_values(["ts", "event_id"])
        ts_us = batch["ts"].astype("int64") // 1000
        keep = []
        for us in ts_us:
            ok = last is None or us - last >= gap_us
            keep.append(ok)
            if ok:
                last = int(us)
        state.update((int(last),))
        # retire once the watermark passes last_kept + gap
        state.setTimeoutTimestamp((last + gap_us) // 1000 + 1)
        kept = batch[pd.Series(keep, index=batch.index)]
        if len(kept):
            yield kept[["user_id", "event_type", "ts", "event_id"]]

    return update


def debounce_kept(events: DataFrame, gap_seconds: int = 60) -> DataFrame:
    """Keep events >= ``gap_seconds`` after the previous KEPT event of
    the same (user, type). ``events`` needs a watermark upstream for
    state retirement (and may be a batch frame in tests via
    foreachBatch-style drivers)."""
    return events.groupBy("user_id", "event_type").applyInPandasWithState(
        _make_update(gap_seconds * 1_000_000),
        outputStructType=_OUT,
        stateStructType=_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
