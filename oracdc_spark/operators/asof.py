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
