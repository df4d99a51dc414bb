"""Structured Streaming analogs of the batch event-window operators
(SURVEY.md §2.6 Streaming row, §7 Phase 5).

The reference's serving model — pre-materialized batches replayed through
a fresh IPC writer per request (get_simple server.py:94-144) — maps onto
micro-batches: each ``foreachBatch`` invocation serves one batch of
results through the same egress used for static DataFrames.

These builders take any streaming DataFrame with the events schema
(ts timestamp, user_id long, event_type string, value double), so tests
can drive them from a rate source or ``spark.readStream.format("parquet")``
over the testdata directory.  The transformations are IDENTICAL to the
batch operators in operators/events.py — that is the point: one logical
plan, two execution modes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame,
    window: str = "15 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Tumbling-window count/sum with late-data drop via watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select("w.start", "w.end", "event_type", "n_events", "sum_value")
    )


def sliding_counts(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("w.start", "w.end", "n_events")
    )


def session_counts(
    events: DataFrame,
    gap: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Session windows (gap-based) per user — stateful streaming aggregation."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("w.start", "w.end", "user_id", "n_events")
    )


def dedup_within_watermark(
    events: DataFrame,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Stateful streaming dedup: first event per (user_id, event_type)
    within the watermark horizon (dropDuplicatesWithinWatermark)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )


def run_to_memory_sink(stream_df: DataFrame, query_name: str, timeout_sec: int = 60):
    """Drive a streaming DataFrame into an in-memory table (complete or
    append mode chosen automatically) and block until idle.  Returns the
    StreamingQuery; results land in ``spark.table(query_name)``."""
    has_agg = stream_df.isStreaming and bool(stream_df.schema)
    mode = "complete" if _has_aggregation(stream_df) else "append"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    return q


def _has_aggregation(df: DataFrame) -> bool:
    plan = df._jdf.queryExecution().analyzed().toString()
    return "Aggregate" in plan
