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


# ---------------------------------------------------------------------------
# Micro-batch folds (batch-equivalence mirrors of the streaming operators)
# ---------------------------------------------------------------------------
# These are the foreachBatch forms of interval_join / session_windows: a
# bounded per-trigger computation against a small persisted state, such
# that after any stream prefix the union of emissions (interval join) or
# the final state (sessions) equals the batch operator over the rows seen
# so far.  They exist so the operators' semantics are checkable by the
# driver's DuckDB oracle the same way streaming_dedup_gate is — the
# native Structured Streaming paths above stay covered by
# tests/test_streaming_windows.py.


def _read_state(spark, path: str, schema: str) -> DataFrame:
    import os

    if os.path.exists(path):
        return spark.read.parquet(path)
    return spark.createDataFrame([], schema)


def interval_join_fold_batch(
    spark,
    new_purchases: DataFrame,
    new_clicks: DataFrame,
    state_dir: str,
    window: str = "10 minutes",
    horizon: str | None = None,
) -> DataFrame:
    """One trigger of the stream-stream interval join as a micro-batch
    fold: emit exactly the NEW pairs this batch completes, then fold the
    batch rows into the buffered state.

    A pair (p, c) is new iff at least one side arrived this batch, so
    the emission is ``new_p ⋈ (state_c ∪ new_c)  ∪  state_p ⋈ new_c`` —
    each pair is emitted exactly once, at the batch where its LATER side
    arrives (the same once-per-match contract as Spark's append-mode
    stream-stream inner join).  After any prefix of batches the union of
    emissions equals the batch :func:`interval_join` of all rows seen.

    ``horizon`` is the watermark delay.  When set, state rows that can
    no longer match any future arrival are evicted after the trigger —
    a purchase once ``wm > purchase_ts`` (all its candidate clicks have
    ``click_ts <= purchase_ts``), a click once ``wm > click_ts +
    window`` (any matching purchase has ``purchase_ts <= click_ts +
    window``), with ``wm = max event time seen − horizon`` — so the
    buffered state is bounded by the lateness horizon exactly like the
    streaming state store, instead of growing with the stream.  When
    ``None`` (the driver-query equivalence fold over a bounded input),
    nothing is evicted and the fold is exact.

    Scale shape: every join/union here is keyed on user_id and sized by
    the batch × the horizon-bounded state — never the full stream; the
    watermark is a 1-row aggregate.  The single-file `_swap_write` state
    is the sandbox stand-in: at 100 TB the buffers live in a table
    bucketed by hash(user_id) so the per-trigger joins co-partition with
    stored state, eviction is a partition-predicate delete, and the swap
    is a transactional commit (Delta/Iceberg) — the layout Spark's own
    stream-stream join state store uses per key-group.

    Returns the emitted pairs (localCheckpoint-severed from the state,
    which this call rewrites)."""
    from oracdc_spark.streaming.sketches import _swap_write

    p_cols = ["purchase_id", "user_id", "purchase_ts"]
    c_cols = ["click_id", "user_id", "click_ts"]
    new_p = new_purchases.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    new_c = new_clicks.select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    state_p = _read_state(
        spark, f"{state_dir}/purchases",
        "purchase_id bigint, user_id bigint, purchase_ts timestamp",
    )
    state_c = _read_state(
        spark, f"{state_dir}/clicks",
        "click_id bigint, user_id bigint, click_ts timestamp",
    )

    def _pairs(p: DataFrame, c: DataFrame) -> DataFrame:
        cond = (
            (p["user_id"] == c["user_id"])
            & (c["click_ts"] >= p["purchase_ts"] - F.expr(f"INTERVAL {window}"))
            & (c["click_ts"] <= p["purchase_ts"])
        )
        return p.join(c, cond).select(
            p["purchase_id"], p["user_id"], p["purchase_ts"],
            c["click_id"], c["click_ts"],
        )

    emitted = (
        _pairs(new_p, state_c.unionAll(new_c))
        .unionAll(_pairs(state_p, new_c))
        .localCheckpoint(eager=True)
    )
    all_p = state_p.unionAll(new_p)
    all_c = state_c.unionAll(new_c)
    if horizon is not None:
        # the watermark is a 1-row aggregate over horizon-bounded state +
        # batch; it must be RESOLVED (collected) before the state swap
        # below, because a lazy plan would re-read the purchases files
        # the first _swap_write has already renamed away.  Same bounded-
        # scalar class as the CC convergence statistics.
        mx = (
            all_p.select(F.col("purchase_ts").alias("ts"))
            .unionAll(all_c.select(F.col("click_ts").alias("ts")))
            .agg(F.max("ts"))
            .collect()[0][0]
        )
        if mx is not None:
            hi = F.expr(f"INTERVAL {horizon}")
            win = F.expr(f"INTERVAL {window}")
            wm = F.lit(mx).cast("timestamp") - hi
            all_p = all_p.filter(F.col("purchase_ts") >= wm).select(p_cols)
            all_c = all_c.filter(F.col("click_ts") + win >= wm).select(c_cols)
    _swap_write(all_p, f"{state_dir}/purchases")
    _swap_write(all_c, f"{state_dir}/clicks")
    return emitted


def session_fold_batch(
    spark,
    batch_events: DataFrame,
    state_path: str,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """One trigger of gap-based sessionization as a micro-batch fold:
    sessionize the batch alone (:func:`session_windows` in batch mode),
    union with the stored session fragments, and merge fragments whose
    half-open intervals [start_us, end_us) overlap — the new state.

    Why fragment-merging is exact: a session is a connected union of
    per-event CLOSED intervals [ts, ts+gap], and every fragment's
    interval IS the contiguous union of its member events' intervals
    (consecutive in-session events are ≤ gap apart), so touch-or-
    overlap connectivity of fragments equals connectivity of the
    underlying events.  Two fragments merge iff ``later.start <=
    earlier.end`` (NON-STRICT — an event exactly `gap` after the
    previous one MERGES into its session; ``F.session_window``'s
    observed semantics, pinned by a unit test).  After any stream
    prefix the state equals session_windows over all rows seen.

    The merge is one user_id exchange: a running-max-of-end window
    ordered by start detects island starts, a prefix-sum numbers the
    islands, and the (user_id, island) groupBy is subset-satisfied by
    the same hash(user_id) partitioning — no second shuffle.  State is
    sessions-sized, not events-sized; in production the fold would also
    EMIT fragments whose end precedes the watermark (closed sessions,
    append mode) and keep only open ones — the returned state is the
    open+closed union so the equivalence fold can be oracle-checked.
    At 100 TB the state table is bucketed by hash(user_id) (the merge
    window re-uses the bucketing, closed-session emission is a
    partition-predicate split), so per-trigger cost is O(batch + open
    sessions of touched users), never O(history).

    Returns the merged state (localCheckpoint-severed; also written to
    ``state_path``)."""
    from pyspark.sql import Window

    from oracdc_spark.streaming.sketches import _swap_write

    batch_sessions = session_windows(batch_events, gap=gap, watermark=watermark)
    state = _read_state(
        spark, state_path,
        "user_id bigint, start_us bigint, end_us bigint, n_events bigint",
    )
    frags = state.unionAll(batch_sessions.select(state.columns))
    w = Window.partitionBy("user_id").orderBy("start_us", "end_us")
    prev_end = F.max("end_us").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    islanded = frags.select(
        "*",
        F.when(prev_end.isNull() | (F.col("start_us") > prev_end), 1)
        .otherwise(0)
        .alias("is_start"),
    ).select(
        "*",
        F.sum("is_start")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("island"),
    )
    merged = (
        islanded.groupBy("user_id", "island")
        .agg(
            F.min("start_us").alias("start_us"),
            F.max("end_us").alias("end_us"),
            F.sum("n_events").alias("n_events"),
        )
        .select("user_id", "start_us", "end_us", "n_events")
        .localCheckpoint(eager=True)
    )
    _swap_write(merged, state_path)
    return merged
