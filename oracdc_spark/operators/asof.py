"""AS-OF join — "latest right-side row at or before each left-side time".

The classic time-series lookup (point-in-time price, last-known dimension
state, most-recent order per user event).  Spark has no native ASOF JOIN
(DuckDB and kdb+ do), and the naive theta-join
``L JOIN R ON key AND r.ts <= l.ts`` explodes to O(|L|·|R|) pairs per key
before aggregating the max — fatal when one key has millions of right rows.

Scale-first restatement: UNION both sides, ONE shuffle on the join key,
ONE window sort by (ts, side, tiebreak), and a running ``max`` over a
zero-padded sortable string that encodes (right_ts, right_key).  Each left
row then reads its as-of match from the running max — total cost is a
single exchange + sort of |L|+|R| rows, no pair blow-up, no skew
amplification (a hot key costs |L_k|+|R_k| log, not |L_k|·|R_k|).

The sortable-string trick (lpad to fixed width, lexicographic max ==
numeric max) is evaluated identically by Spark and DuckDB, so the oracle
mirrors this exact plan; ties on right_ts break by the larger right key —
fully deterministic.

Reference scope note: oracdc itself has no as-of operator; this belongs to
the training-data/analytics surface this engine adds (SURVEY §2.6 family).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

# 19 digits fits any non-negative int64 (max 9223372036854775807)
_PAD = 19


def _sortable(ts_micros, key):
    """Zero-padded '<epoch_micros>|<key>' — lexicographic order equals
    (ts, key) numeric order for non-negative values."""
    return F.concat_ws(
        "|",
        F.lpad(ts_micros.cast("string"), _PAD, "0"),
        F.lpad(key.cast("string"), _PAD, "0"),
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_key: str,
) -> DataFrame:
    """Left as-of join: every `left` row + the (`right_key`, `right_ts`)
    of the latest `right` row with the same `on` key and
    ``right_ts <= left_ts`` (NULLs when no such row).

    Output columns: all of `left` + `asof_<right_key>`, `asof_<right_ts>`.
    """
    # parquet NTZ timestamps cast losslessly under the pinned-UTC session
    lt = F.col(left_ts).cast("timestamp")
    rt = F.col(right_ts).cast("timestamp")
    l_side = left.select(
        F.col(on).alias("_k"),
        F.unix_micros(lt).alias("_t"),
        F.lit(1).alias("_is_left"),
        F.lit(None).cast("string").alias("_mark"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_payload"),
    )
    r_side = right.select(
        F.col(on).alias("_k"),
        F.unix_micros(rt).alias("_t"),
        F.lit(0).alias("_is_left"),
        _sortable(F.unix_micros(rt), F.col(right_key)).alias("_mark"),
        F.lit(None)
        .cast(l_side.schema["_payload"].dataType)
        .alias("_payload"),
    )
    # right rows (_is_left=0) sort before left rows at the same timestamp,
    # so "at or before" (<=) semantics fall out of the frame boundary
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_is_left", "_mark")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = l_side.unionByName(r_side).withColumn("_best", F.max("_mark").over(w))
    return u.filter(F.col("_is_left") == 1).select(
        "_payload.*",
        F.substring("_best", 1, _PAD).cast("bigint").alias(f"asof_{right_ts}_micros"),
        F.substring("_best", _PAD + 2, _PAD).cast("bigint").alias(f"asof_{right_key}"),
    )


def events_asof_orders(events: DataFrame, orders: DataFrame) -> DataFrame:
    """Headline as-of query: each event joined to the user's most recent
    order placed at or before the event time.  Returns
    (event_id, user_id, ts, asof_orderkey, asof_orderdate)."""
    j = asof_join(
        events.select("event_id", "user_id", "ts"),
        orders.withColumnRenamed("o_custkey", "user_id"),
        on="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
        right_key="o_orderkey",
    )
    return j.select(
        "event_id",
        "user_id",
        "ts",
        F.col("asof_o_orderkey").alias("asof_orderkey"),
        F.timestamp_micros(F.col("asof_o_orderdate_micros")).alias("asof_orderdate"),
    )


_BIG = 1 << 62  # negation base for the forward direction (fits _PAD digits)


def asof_join_directional(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_key: str,
    direction: str = "backward",
    tolerance_micros: int | None = None,
) -> DataFrame:
    """As-of join with the pandas ``merge_asof`` knob set: ``direction``
    in backward (latest right at-or-before), forward (earliest right
    at-or-after), nearest (closer of the two, ties to backward) and an
    optional ``tolerance_micros`` beyond which a match is discarded
    (NULLs, preserving the left row — left-outer semantics).

    Same single-exchange shape as :func:`asof_join`: both directions
    ride ONE shuffle on the join key — backward is the running max of
    the (ts, key) sortable mark in ascending time order, forward the
    running max of the (2^62 - ts, key) mark in DESCENDING time order
    (negation turns "earliest after" into the same running-max trick).
    Two window sorts share the one exchange; nearest decodes both and
    picks per row.  Right rows order before left rows at equal
    timestamps in both directions, so both bounds are inclusive.

    Output: all of `left` + ``asof_<right_ts>_micros`` +
    ``asof_<right_key>`` (NULL where no in-tolerance match)."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    lt = F.col(left_ts).cast("timestamp")
    rt = F.col(right_ts).cast("timestamp")
    need_b = direction in ("backward", "nearest")
    need_f = direction in ("forward", "nearest")
    l_side = left.select(
        F.col(on).alias("_k"),
        F.unix_micros(lt).alias("_t"),
        F.lit(1).alias("_is_left"),
        F.lit(None).cast("string").alias("_mark_b"),
        F.lit(None).cast("string").alias("_mark_f"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_payload"),
    )
    r_t = F.unix_micros(rt)
    r_side = right.select(
        F.col(on).alias("_k"),
        r_t.alias("_t"),
        F.lit(0).alias("_is_left"),
        _sortable(r_t, F.col(right_key)).alias("_mark_b"),
        _sortable(F.lit(_BIG) - r_t, F.col(right_key)).alias("_mark_f"),
        F.lit(None)
        .cast(l_side.schema["_payload"].dataType)
        .alias("_payload"),
    )
    u = l_side.unionByName(r_side)
    if need_b:
        w_b = (
            Window.partitionBy("_k")
            .orderBy("_t", "_is_left", "_mark_b")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        u = u.withColumn("_best_b", F.max("_mark_b").over(w_b))
    if need_f:
        w_f = (
            Window.partitionBy("_k")
            .orderBy(F.desc("_t"), "_is_left", "_mark_f")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        u = u.withColumn("_best_f", F.max("_mark_f").over(w_f))
    out = u.filter(F.col("_is_left") == 1)
    ts_b = F.substring("_best_b", 1, _PAD).cast("bigint")
    key_b = F.substring("_best_b", _PAD + 2, _PAD).cast("bigint")
    ts_f = F.lit(_BIG) - F.substring("_best_f", 1, _PAD).cast("bigint")
    key_f = F.substring("_best_f", _PAD + 2, _PAD).cast("bigint")
    tol = F.lit(tolerance_micros) if tolerance_micros is not None else None
    if need_b:
        vb = F.col("_best_b").isNotNull()
        if tol is not None:
            vb = vb & ((F.col("_t") - ts_b) <= tol)
    if need_f:
        vf = F.col("_best_f").isNotNull()
        if tol is not None:
            vf = vf & ((ts_f - F.col("_t")) <= tol)
    if direction == "backward":
        sel_ts = F.when(vb, ts_b)
        sel_key = F.when(vb, key_b)
    elif direction == "forward":
        sel_ts = F.when(vf, ts_f)
        sel_key = F.when(vf, key_f)
    else:
        gap_b = F.col("_t") - ts_b
        gap_f = ts_f - F.col("_t")
        take_b = vb & (~vf | (gap_b <= gap_f))
        sel_ts = F.when(take_b, ts_b).when(vf, ts_f)
        sel_key = F.when(take_b, key_b).when(vf, key_f)
    return out.select(
        "_payload.*",
        sel_ts.alias(f"asof_{right_ts}_micros"),
        sel_key.alias(f"asof_{right_key}"),
    )


def events_asof_tolerance(events: DataFrame, orders: DataFrame) -> DataFrame:
    """Backward as-of with a tolerance cut: each event's most recent
    order at-or-before the event, discarded (NULL) when the gap exceeds
    ~23.8 years — the merge_asof tolerance semantics on the same
    event/order pairing as events_asof_join (the synthetic corpora sit
    decades apart, so the cut actually bites)."""
    j = asof_join_directional(
        events.select("event_id", "user_id", "ts"),
        orders.withColumnRenamed("o_custkey", "user_id"),
        on="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
        right_key="o_orderkey",
        direction="backward",
        tolerance_micros=750_000_000_000_000,
    )
    return j.select(
        "event_id",
        "user_id",
        "ts",
        F.col("asof_o_orderkey").alias("asof_orderkey"),
        F.col("asof_o_orderdate_micros").alias("asof_orderdate_micros"),
    )


def events_asof_nearest(events: DataFrame) -> DataFrame:
    """Nearest-direction as-of within one table: each click event joined
    to the user's nearest purchase event in time (backward OR forward,
    ties backward), within a 2-day tolerance — both directions exercised
    on a time range where they genuinely compete."""
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id"), F.col("ts").alias("p_ts"), F.col("event_id").alias("p_id")
    )
    j = asof_join_directional(
        clicks,
        purchases,
        on="user_id",
        left_ts="ts",
        right_ts="p_ts",
        right_key="p_id",
        direction="nearest",
        tolerance_micros=2 * 86_400_000_000,
    )
    return j.select(
        "event_id",
        "user_id",
        "ts",
        F.col("asof_p_id").alias("nearest_purchase_id"),
        F.col("asof_p_ts_micros").alias("nearest_purchase_ts_micros"),
    )
