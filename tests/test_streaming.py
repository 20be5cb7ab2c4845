"""Structured Streaming tests: AvailableNow runs must equal the batch
equivalents (the oracle-checked queries in streaming_queries.py)."""

from __future__ import annotations

from chapterhouseqe_spark.queries.streaming_queries import (
    events_tumbling_window,
    events_user_activity,
)
from chapterhouseqe_spark.streaming import (
    read_events_stream,
    run_stream_to_memory,
    stream_user_rollup,
    stream_window_counts,
)


def _as_sorted_rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_stream_window_counts_equals_batch(spark, sf_dir):
    ev = read_events_stream(spark, sf_dir)
    assert ev.isStreaming
    result = run_stream_to_memory(
        stream_window_counts(ev), "t_stream_windows", "complete"
    )
    batch = events_tumbling_window(spark, sf_dir)
    cols = ["window_start", "event_type", "cnt", "sum_value"]
    assert _as_sorted_rows(result, cols) == _as_sorted_rows(batch, cols)


def test_stream_user_rollup_equals_batch(spark, sf_dir):
    ev = read_events_stream(spark, sf_dir)
    result = run_stream_to_memory(stream_user_rollup(ev), "t_stream_users", "complete")
    batch = events_user_activity(spark, sf_dir)
    cols = ["user_id", "n_events", "first_seen", "last_seen"]
    assert _as_sorted_rows(result, cols) == _as_sorted_rows(batch, cols)


def test_stream_bounded_micro_batches(spark, sf_dir):
    # maxFilesPerTrigger bounds each micro-batch (scale knob)
    ev = read_events_stream(spark, sf_dir, max_files_per_trigger=1)
    result = run_stream_to_memory(
        stream_window_counts(ev), "t_stream_bounded", "complete"
    )
    assert result.count() > 0
