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


def dedup_redelivered(changes: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Exactly-once ingest under at-least-once redelivery: a restarted
    miner re-reads from the restart SCN (G9) and re-emits records it
    already delivered; the reference relies on Kafka keying + sink
    idempotence to absorb them.  Structured-Streaming restatement:
    `dropDuplicatesWithinWatermark` on the redo record identity
    (xid, scn, ssn) — state for a key is dropped once the watermark
    passes it, so dedup state is BOUNDED by the redelivery horizon
    instead of growing with the feed (the property a plain
    dropDuplicates would lose at 100 TB).

    Event time derives from the SCN (`timestamp_micros`) — monotone with
    redo order, so the watermark horizon maps directly onto an SCN
    window.  Works on batch frames too (plain dropDuplicates) for
    parity testing."""
    # +1s base: a record at scn=0 would sit exactly on the initial
    # watermark (epoch 0) and be classed late before any data arrived
    src = changes.withColumn(
        "event_ts", F.timestamp_micros(F.col("scn") + F.lit(1_000_000))
    )
    if src.isStreaming:
        return (
            src.withWatermark("event_ts", watermark)
            .dropDuplicatesWithinWatermark(["xid", "scn", "ssn"])
            .drop("event_ts")
        )
    return src.dropDuplicates(["xid", "scn", "ssn"]).drop("event_ts")


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


def interval_join(
    purchases: DataFrame,
    clicks: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Stream-stream interval join: every purchase paired with the same
    user's clicks in the preceding `window`.

    In streaming mode both sides carry a watermark and the join
    condition bounds the click's event time relative to the purchase's —
    which is exactly what lets Spark EVICT buffered state: a click older
    than (watermark + window) can never match a future purchase, so the
    state store stays bounded by the lateness horizon instead of growing
    with the stream (the 100 TB requirement).  Batch mode runs the same
    equality-plus-range join as a sort-merge on user_id — the parity
    oracle for the streaming result.

    Output: (purchase_id, user_id, purchase_ts, click_id, click_ts)."""
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
    )
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("click_ts"),
    )
    if p.isStreaming:
        p = p.withWatermark("purchase_ts", watermark)
        c = c.withWatermark("click_ts", watermark)
    cond = (
        (p["p_user_id"] == c["c_user_id"])
        & (c["click_ts"] >= p["purchase_ts"] - F.expr(f"INTERVAL {window}"))
        & (c["click_ts"] <= p["purchase_ts"])
    )
    return p.join(c, cond).select(
        "purchase_id",
        F.col("p_user_id").alias("user_id"),
        "purchase_ts",
        "click_id",
        "click_ts",
    )
