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


def test_streaming_sessionize_equals_batch(spark, sf_dir):
    from chapterhouseqe_spark.streaming.sessions import sessionize
    from chapterhouseqe_spark.queries.streaming_queries import events_sessionization

    ev = read_events_stream(spark, sf_dir).withWatermark("ts", "2 hours")
    result = run_stream_to_memory(sessionize(ev), "t_stream_sessions", "complete")
    batch = events_sessionization(spark, sf_dir)
    cols = ["user_id", "session_start", "n_events"]
    assert _as_sorted_rows(result, cols) == _as_sorted_rows(batch, cols)


def test_stateful_user_stats_custom_op(spark, sf_dir):
    # applyInPandasWithState: running per-user (count, sum) must match
    # the plain batch aggregate after one AvailableNow pass
    from chapterhouseqe_spark.streaming.sessions import stateful_user_stats
    from pyspark.sql import functions as F

    ev = read_events_stream(spark, sf_dir)
    result = run_stream_to_memory(stateful_user_stats(ev), "t_stateful_users", "update")
    expect = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    got = {r["user_id"]: r["n_events"] for r in result.collect()}
    want = {r["user_id"]: r["n_events"] for r in expect.collect()}
    assert got == want


def test_stream_dedup_first_occurrence(spark, sf_dir):
    from chapterhouseqe_spark.streaming.windows import stream_dedup

    ev = read_events_stream(spark, sf_dir)
    result = run_stream_to_memory(
        stream_dedup(ev, ["user_id", "event_type"]), "t_stream_dedup", "append"
    )
    batch = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", "event_type")
        .distinct()
    )
    assert result.count() == batch.count()
    got = {(r["user_id"], r["event_type"]) for r in result.select("user_id", "event_type").collect()}
    want = {(r["user_id"], r["event_type"]) for r in batch.collect()}
    assert got == want
