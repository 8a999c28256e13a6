"""CDC dataflow operators — the engine core (SURVEY §2.3/§2.5/§2.2).

Each function is a declarative DataFrame transform over the structured
change feed (``oracdc_spark.feed``); Catalyst chooses physical plans.
Scale notes are inline: the feed shuffles at most once on ``xid`` (the
transaction key) and once on ``pk`` (the merge key) — the two shuffles any
CDC engine fundamentally needs; everything else is narrow.

Reference semantics ported (file:line into /root/reference):

* G1 transaction assembly       OraCdcLogMinerWorkerThread.java:345-530
* G2 commit/rollback resolution OraCdcLogMinerWorkerThread.java:347-393
* G3 commit-ordered emission    KafkaSourceLogMinerTask.java:291-427
* G4 partial-rollback pairing   OraCdcTransaction.java:351-419,592-667
* G9 restart-SCN watermark      OraCdcLogMinerWorkerThread.java:108,354-359
* F2 operation-code predicate   KafkaSourceLogMinerTask.java:140-255
* F4 SCN window predicate       OraDictSqlTexts.java:538-547
* F5 commit-SCN replay filter   KafkaSourceLogMinerTask.java:320-354
* F6 rolled-back suppression    OraCdcLogMinerWorkerThread.java:371-393
* F9 update-without-change      Parameters.java:747
* K2/K3 idempotent upsert/delete JdbcSinkTable.java:398-623
* K6 batch PK dedup             JdbcSinkTable.java:829-858
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from oracdc_spark.feed import OP_COMMIT, OP_DELETE, OP_INSERT, OP_ROLLBACK, OP_UPDATE

DML_OPS = (OP_INSERT, OP_DELETE, OP_UPDATE)


def op_filter(feed: DataFrame, ops: Sequence[int] = DML_OPS) -> DataFrame:
    """F2 — keep selected operation codes. A plain `isin` so Catalyst
    pushes it into the parquet scan (PushedFilters: In(op, ...))."""
    return feed.filter(F.col("op").isin(list(ops)))


def scn_window(feed: DataFrame, lo: int, hi: int) -> DataFrame:
    """F4 — bounded SCN window (the LogMiner STARTSCN..ENDSCN session
    bound). Pushed to the scan; at scale this is partition pruning when the
    feed is written SCN-partitioned."""
    return feed.filter(F.col("scn").between(lo, hi))


def partial_rollback_filter(feed: DataFrame) -> DataFrame:
    """G4 — cancel partial-rollback pairs, greedy LIFO per pair key.

    A change record flagged ``rollback=true`` cancels the latest unmatched
    original that *precedes* it in redo order: the reference scans
    backwards from the marker's position and takes the first unpaired
    rowid match (OraCdcTransactionArrayList.java:82-107); a marker with no
    preceding match — including a marker that arrives *before* its
    original — cancels NOTHING and only flags the transaction suspicious
    (OraCdcTransaction.java:598-608).  Pair key is (xid, row_id, scn);
    within a key, redo order is ssn.

    Closed form of the greedy backward pairing (bracket matching): order
    the key's events by ssn and let D = running count of (markers −
    originals).  An original o is cancelled iff some later event t has
    D(t) ≥ D(o) + 1 — i.e. the suffix (o, t] holds more markers than
    interleaved originals, so the backward scans reach o.  Marker rows are
    always dropped.

    One window partition key starting with xid → co-partitions with the
    transaction-assembly shuffle; both frames (running sum, suffix max)
    share a single sort, so the whole filter costs one exchange.
    """
    key = ["xid", "row_id", "scn"]
    # markers sort after an equal-ssn original (rollback asc) so they can
    # still cancel it; feed ssns are unique within a key, this is a
    # determinism guard only
    w = Window.partitionBy(*key).orderBy(F.col("ssn"), F.col("rollback"))
    d = F.sum(F.when(F.col("rollback"), 1).otherwise(-1)).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_d = feed.withColumn("_rb_d", d)
    suffix_max = F.max("_rb_d").over(
        w.rowsBetween(1, Window.unboundedFollowing)
    )
    return (
        with_d.withColumn("_rb_mx", suffix_max)
        .filter(
            ~F.col("rollback")
            & (F.col("_rb_mx").isNull() | (F.col("_rb_mx") <= F.col("_rb_d")))
        )
        .drop("_rb_d", "_rb_mx")
    )


def committed_changes(feed: DataFrame) -> DataFrame:
    """G2 + F6 + G4 — DML records of committed transactions only.

    Whole rolled-back transactions (op=36 control record) and open
    transactions (no control record yet) are dropped via a semi-join with
    the commit set; partial-rollback pairs are cancelled.  The commit set
    is one row per transaction — at 100 TB that is billions of rows, so no
    broadcast hint: the join key is xid, the key the pipeline already
    shuffles on, so Catalyst/AQE co-partitions it (and still broadcasts
    when the set is genuinely small at runtime).
    """
    commit_xids = feed.filter(F.col("op") == OP_COMMIT).select("xid")
    dml = feed.filter(F.col("op").isin(list(DML_OPS)))
    dml = partial_rollback_filter(dml)
    return dml.join(commit_xids, "xid", "semi")


def commit_stamped(feed: DataFrame) -> DataFrame:
    """Committed DML stamped with commit_scn — *unordered*.  Downstream
    operators (PK dedup window, MERGE, envelopes) impose their own
    per-key ordering; skipping the global sort here saves a full
    exchange for every consumer (SURVEY §7: global order is a sink
    contract, not a pipeline invariant). The commit map grows with the
    feed (one row per txn) → co-partitioned join on xid, no broadcast
    hint (AQE still broadcasts small maps at runtime)."""
    commit_map = feed.filter(F.col("op") == OP_COMMIT).select(
        "xid", F.col("scn").alias("commit_scn")
    )
    dml = committed_changes(feed)
    return dml.join(commit_map, "xid")


def commit_ordered(feed: DataFrame) -> DataFrame:
    """G3 — committed DML in total emission order (commit_scn, scn, ssn):
    transactions drain FIFO by commit order, statements within a
    transaction by (SCN, RBA, SSN). The ordered form is the declared
    emission contract; use :func:`commit_stamped` when feeding further
    operators."""
    return commit_stamped(feed).orderBy("commit_scn", "scn", "ssn")


def replay_filter(
    stamped: DataFrame, last_commit_scn: int, last_scn: int, last_ssn: int
) -> DataFrame:
    """F5 — exactly-once restart: drop everything at or before the stored
    offset (commit_scn, scn, ssn); rewinds *within* a partially-emitted
    transaction to the exact statement coordinates
    (KafkaSourceTaskBase.java:267-281,460-485)."""
    c, s, n = F.col("commit_scn"), F.col("scn"), F.col("ssn")
    return stamped.filter(
        (c > last_commit_scn)
        | ((c == last_commit_scn) & (s > last_scn))
        | ((c == last_commit_scn) & (s == last_scn) & (n > last_ssn))
    )


def txn_stats(feed: DataFrame, salt_buckets: int | None = None) -> DataFrame:
    """G1 — per-transaction assembly summary: statement count, SCN span,
    distinct rows touched.  Map-side partial aggregation makes this one
    efficient shuffle on xid.

    ``salt_buckets`` wires the G11 large-transaction path: a mega-xid
    (millions of statements — the reference's
    ``a2.transaction.implementation`` spill scenario) aggregates in two
    phases via :func:`oracdc_spark.plans.skew.salted_agg`, and the
    distinct-row count decomposes through a (xid, row_id) pre-distinct
    whose composite key spreads the hot xid across reducers.  Results
    are identical to the unsalted form (tested)."""
    dml = feed.filter(F.col("op").isin(list(DML_OPS)) & ~F.col("rollback"))
    if salt_buckets:
        from oracdc_spark.plans.skew import salted_agg

        base = salted_agg(
            dml,
            ["xid"],
            {
                "n_stmts": F.count(F.lit(1)),
                "first_scn": F.min("scn"),
                "last_scn": F.max("scn"),
            },
            salt_buckets=salt_buckets,
        )
        n_rows = (
            dml.select("xid", "row_id")
            .distinct()
            .groupBy("xid")
            .agg(F.count(F.lit(1)).alias("n_rows"))
        )
        return base.join(n_rows, "xid")
    return dml.groupBy("xid").agg(
        F.count(F.lit(1)).alias("n_stmts"),
        F.min("scn").alias("first_scn"),
        F.max("scn").alias("last_scn"),
        F.countDistinct("row_id").alias("n_rows"),
    )


def open_transactions(feed: DataFrame) -> DataFrame:
    """Transactions with no commit/rollback control record yet (late/open
    per SURVEY §2.7 — state kept indefinitely)."""
    ctl = feed.filter(F.col("op").isin([OP_COMMIT, OP_ROLLBACK])).select("xid")
    dml = feed.filter(F.col("op").isin(list(DML_OPS)))
    return dml.join(ctl, "xid", "anti")


def restart_scn(feed: DataFrame) -> DataFrame:
    """G9 — the safe restart watermark: min(first SCN) across open
    transactions (the reference's TreeMap sortedByFirstScn,
    OraCdcLogMinerWorkerThread.java:108)."""
    return open_transactions(feed).agg(F.min("scn").alias("restart_scn"))


def batch_pk_dedup(
    stamped: DataFrame, pk_cols: Sequence[str] = ("owner", "table_name", "pk")
) -> DataFrame:
    """K6 — last-write-wins per PK inside an emission batch.

    The reference flushes a JDBC batch when it detects a duplicate PK to
    preserve ordering (JdbcSinkTable.java:829-858); in Spark the idiomatic
    equivalent keeps only the newest change per key before MERGE:
    row_number over (partition by pk order by commit_scn desc, scn desc,
    ssn desc) = 1.  One shuffle on pk — the merge key, reused by the sink.
    """
    w = Window.partitionBy(*[F.col(c) for c in pk_cols]).orderBy(
        F.col("commit_scn").desc(), F.col("scn").desc(), F.col("ssn").desc()
    )
    return (
        stamped.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def batch_net_effect(
    stamped: DataFrame, pk_cols: Sequence[str] = ("owner", "table_name", "pk")
) -> DataFrame:
    """Net-effect batch collapse — the stronger form of K6's
    last-write-wins: fold EVERY change a key saw inside the batch into
    the single statement the sink actually needs (the "reduction" mode
    of Kafka-Connect JDBC sinks; Debezium calls it event reduction):

    * first=INSERT, last=DELETE  → emit NOTHING (the key never existed
      outside the batch — last-write-wins would wrongly issue a DELETE
      for a row the target does not have);
    * first=INSERT, last=I/U     → one INSERT carrying the final image;
    * first=U/D,    last=DELETE  → one DELETE;
    * otherwise                  → one UPDATE with the final image.

    One window over the batch's pk shuffle computes first-op, last-op,
    and the final image together — same single exchange as
    batch_pk_dedup, so net-effect is free where K6 already runs.
    Output: the collapsed batch with ``net_op`` replacing ``op``."""
    w = Window.partitionBy(*[F.col(c) for c in pk_cols]).orderBy(
        "commit_scn", "scn", "ssn"
    )
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    marked = (
        stamped.withColumn("rn_desc", F.row_number().over(
            Window.partitionBy(*[F.col(c) for c in pk_cols]).orderBy(
                F.col("commit_scn").desc(), F.col("scn").desc(), F.col("ssn").desc()
            )
        ))
        .withColumn("first_op", F.first("op").over(wfull))
        .withColumn("last_op", F.last("op").over(wfull))
    )
    latest = marked.filter(F.col("rn_desc") == 1)
    net = (
        F.when(
            (F.col("first_op") == OP_INSERT) & (F.col("last_op") == OP_DELETE),
            F.lit(None).cast("int"),
        )
        .when(F.col("first_op") == OP_INSERT, F.lit(OP_INSERT))
        .when(F.col("last_op") == OP_DELETE, F.lit(OP_DELETE))
        .otherwise(F.lit(OP_UPDATE))
    )
    return (
        latest.withColumn("net_op", net)
        .filter(F.col("net_op").isNotNull())
        .drop("rn_desc", "first_op", "last_op", "op")
    )


def apply_changes(feed: DataFrame) -> DataFrame:
    """K2/K3 — materialize the replica: apply committed changes
    last-write-wins per PK and drop rows whose latest change is a DELETE.

    This is the batch-parity form of ``MERGE INTO replica USING batch ON
    pk WHEN MATCHED AND op='d' THEN DELETE WHEN MATCHED THEN UPDATE WHEN
    NOT MATCHED THEN INSERT`` (TargetDbSqlUtils.java:380-560).
    """
    latest = batch_pk_dedup(commit_stamped(feed))
    return latest.filter(F.col("op") != OP_DELETE).select(
        "owner", "table_name", "pk", "totalprice", "status"
    )


def replica_as_of_relative(feed: DataFrame, fraction: float = 0.5) -> DataFrame:
    """`replica_as_of` with the cut derived in-plan: threshold = min +
    fraction*(max-min) of commit_scn, attached as a broadcast scalar —
    ONE job, no driver round-trip (the feed is still scanned twice: once
    for the extremes, once for the replay — unavoidable without a
    materialized feed)."""
    stamped = commit_stamped(feed)
    bounds = stamped.agg(
        F.min("commit_scn").alias("_mn"), F.max("commit_scn").alias("_mx")
    )
    cut = F.floor(F.col("_mn") + F.lit(fraction) * (F.col("_mx") - F.col("_mn")))
    latest = batch_pk_dedup(
        stamped.crossJoin(F.broadcast(bounds)).filter(F.col("commit_scn") <= cut)
    )
    return latest.filter(F.col("op") != OP_DELETE).select(
        "owner", "table_name", "pk", "totalprice", "status"
    )


def replica_as_of(feed: DataFrame, scn: int) -> DataFrame:
    """Point-in-time replica — Oracle Flashback `AS OF SCN` semantics
    reconstructed from the change stream: the replica state as it stood
    when ``scn`` committed = apply_changes over the commits with
    commit_scn <= scn.

    The reference has no flashback (it forwards current changes); a
    replica engine gets it for free because the change log IS the
    history.  Same plan as apply_changes plus one pushed-down filter —
    at scale the commit-scn predicate prunes partitions when the feed is
    ingested scn-partitioned."""
    latest = batch_pk_dedup(commit_stamped(feed).filter(F.col("commit_scn") <= scn))
    return latest.filter(F.col("op") != OP_DELETE).select(
        "owner", "table_name", "pk", "totalprice", "status"
    )


def scd2_history(feed: DataFrame) -> DataFrame:
    """Type-2 slowly-changing-dimension history materialized from the
    committed change stream — the standard warehouse consumer of a CDC
    feed (the reference emits the stream and leaves this to the sink
    side; a replica engine can materialize it directly because the log
    IS the history, same argument as :func:`replica_as_of`).

    Every committed DML becomes one version row; validity is the
    half-open SCN interval [commit_scn of this change, commit_scn of the
    pk's next change); the latest non-delete version is current.  One
    window over the pk — the same single (owner, table, pk) shuffle
    every other per-key CDC operator pays, so at scale SCD2 is free if
    materialized alongside the MERGE sink.

    Output: (owner, table_name, pk, version, valid_from_scn,
    valid_to_scn, is_deleted, is_current, totalprice, status)."""
    st = commit_stamped(feed)
    w = Window.partitionBy("owner", "table_name", "pk").orderBy(
        "commit_scn", "scn", "ssn"
    )
    nxt = F.lead("commit_scn").over(w)
    return st.select(
        "owner",
        "table_name",
        "pk",
        F.row_number().over(w).cast("bigint").alias("version"),
        F.col("commit_scn").alias("valid_from_scn"),
        nxt.alias("valid_to_scn"),
        (F.col("op") == OP_DELETE).cast("int").alias("is_deleted"),
        (nxt.isNull() & (F.col("op") != OP_DELETE)).cast("int").alias("is_current"),
        "totalprice",
        "status",
    )


def scd2_as_of_relative(feed: DataFrame, fraction: float = 0.5) -> DataFrame:
    """Point-in-time snapshot served FROM the SCD2 interval table —
    Flashback ``AS OF SCN`` answered by an interval lookup instead of a
    log replay: the version valid at s is the one with
    ``valid_from_scn <= s < coalesce(valid_to_scn, ∞)`` and not a
    delete.  Same-commit rewrites collapse naturally because their
    intervals are empty ([c, c) matches nothing), so no dedup window is
    needed at query time — that is the point of materializing SCD2: at
    100 TB the history table answers ANY as-of query with one
    partition-prunable filter, while :func:`replica_as_of` re-replays
    the log per query.  Output-identical to
    :func:`replica_as_of_relative` at the same cut (pinned in tests and
    by the driver oracle).

    The cut is derived in-plan exactly like replica_as_of_relative:
    min + fraction·(max−min) over valid_from_scn, one broadcast
    scalar."""
    hist = scd2_history(feed)
    bounds = hist.agg(
        F.min("valid_from_scn").alias("_mn"), F.max("valid_from_scn").alias("_mx")
    )
    cut = F.floor(F.col("_mn") + F.lit(fraction) * (F.col("_mx") - F.col("_mn")))
    return (
        hist.crossJoin(F.broadcast(bounds))
        .filter(
            (F.col("valid_from_scn") <= cut)
            & (F.col("valid_to_scn").isNull() | (F.col("valid_to_scn") > cut))
            & (F.col("is_deleted") == 0)
        )
        .select("owner", "table_name", "pk", "totalprice", "status")
    )


def replica_reconcile(replica: DataFrame, source: DataFrame) -> DataFrame:
    """Replica↔source consistency reconciliation — the validation tool a
    CDC operator runs after (re)sync: full-outer join on the key,
    classify every key as match / value_mismatch / missing_in_replica /
    extra_in_replica, and report one summary row per class with the key
    range (min/max pk anchor the hash so a silent class swap cannot
    slip through).

    Both inputs are (pk, totalprice, status).  Null-safe value compare
    (eqNullSafe — a NULL column value must not read as a mismatch of
    itself).  One co-partitioned full-outer shuffle on pk + a 4-row
    aggregate; at scale this is the same exchange the MERGE sink
    already paid, so reconciliation piggybacks on the apply partitioning
    (run it table-bucketed, and the join is shuffle-free)."""
    r = replica.select(
        F.col("pk").alias("r_pk"),
        F.col("totalprice").alias("r_tp"),
        F.col("status").alias("r_st"),
    )
    s = source.select(
        F.col("pk").alias("s_pk"),
        F.col("totalprice").alias("s_tp"),
        F.col("status").alias("s_st"),
    )
    j = r.join(s, r["r_pk"] == s["s_pk"], "full_outer")
    cls = (
        F.when(F.col("s_pk").isNull(), F.lit("extra_in_replica"))
        .when(F.col("r_pk").isNull(), F.lit("missing_in_replica"))
        .when(
            F.col("r_tp").eqNullSafe(F.col("s_tp"))
            & F.col("r_st").eqNullSafe(F.col("s_st")),
            F.lit("match"),
        )
        .otherwise(F.lit("value_mismatch"))
    )
    pk = F.coalesce(F.col("r_pk"), F.col("s_pk"))
    return (
        j.select(cls.alias("diff_class"), pk.alias("pk"))
        .groupBy("diff_class")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            F.min("pk").cast("bigint").alias("min_pk"),
            F.max("pk").cast("bigint").alias("max_pk"),
        )
    )


def suppress_unchanged_updates(feed: DataFrame) -> DataFrame:
    """F9 — drop UPDATE records whose after-image equals the before-image
    (``a2.process.all.update.statements=false`` behavior). Null-safe struct
    equality via `eqNullSafe`."""
    unchanged = (
        (F.col("op") == OP_UPDATE)
        & ~F.col("rollback")
        & F.col("totalprice").eqNullSafe(F.col("before_totalprice"))
        & F.col("status").eqNullSafe(F.col("before_status"))
    )
    return feed.filter(~unchanged)
