"""Streaming windowed aggregation with event-time watermarks
(SURVEY §2.7 — the reference has no windows; these are the north-star
streaming-analytics operators built on Structured Streaming semantics).

* tumbling window counts/sums with a late-data watermark (append mode:
  a window emits exactly once, when the watermark passes its end);
* stream-side session windows via ``session_window`` (gap-based);
* late rows beyond the watermark are dropped — the CDC feed's analog is
  transactions that stay open indefinitely, which the *assembly* op
  keeps stateful instead (NoTimeout) — two deliberate, different
  lateness policies.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def windowed_event_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling event-time window per event_type: count + exact-decimal
    sum. Works on both batch and streaming DataFrames (batch parity =
    analytics.events_hourly)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def session_windows(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Gap-based session windows per user (streaming analog of
    analytics.events_sessionize)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("session_window.start")).alias("start_us"),
            F.unix_micros(F.col("session_window.end")).alias("end_us"),
            "n_events",
        )
    )
