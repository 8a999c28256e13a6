"""Envelope binding — the three output schema modes (SURVEY §1.2, K1).

Reference: KafkaStructDataBinder.java:189-204 (debezium envelope),
:317-361 (kafka_std key/value + tombstone + op header),
KafkaStructSingleDataBinder.java:44 (single mode),
KafkaWrappedSchemas.java:60-176 (wrapped tri-state {V: value} structs).

For hash-checkability the flattened variants keep scalar columns; the
struct-building variants are used by the streaming sink path.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from oracdc_spark.feed import OP_DELETE, OP_INSERT, OP_UPDATE
from oracdc_spark.operators.cdc import commit_stamped

def _op_char():
    return (
        F.when(F.col("op") == OP_INSERT, F.lit("c"))
        .when(F.col("op") == OP_UPDATE, F.lit("u"))
        .when(F.col("op") == OP_DELETE, F.lit("d"))
    )


def debezium_flat(feed: DataFrame) -> DataFrame:
    """Debezium-style envelope, flattened: before_*/after_* columns,
    op ∈ {c,u,d}, source coordinates (owner, table, scn, xid, commit_scn).
    KafkaStructDataBinder.java:189-204,289-303."""
    stamped = commit_stamped(feed)
    return stamped.select(
        _op_char().alias("op_char"),
        "owner",
        "table_name",
        "pk",
        F.col("before_totalprice").alias("before_totalprice"),
        F.col("before_status").alias("before_status"),
        F.when(F.col("op") != OP_DELETE, F.col("totalprice")).alias("after_totalprice"),
        F.when(F.col("op") != OP_DELETE, F.col("status")).alias("after_status"),
        "scn",
        "xid",
        "commit_scn",
    )


def debezium_envelope(feed: DataFrame) -> DataFrame:
    """Struct form used by the streaming writer: before/after/source
    structs + op + ts_ms, mirroring the reference envelope field-for-field."""
    stamped = commit_stamped(feed)
    return stamped.select(
        F.when(
            F.col("op") != OP_INSERT,
            F.struct(
                F.col("pk").alias("pk"),
                F.col("before_totalprice").alias("totalprice"),
                F.col("before_status").alias("status"),
            ),
        ).alias("before"),
        F.when(
            F.col("op") != OP_DELETE,
            F.struct(
                F.col("pk").alias("pk"),
                F.col("totalprice").alias("totalprice"),
                F.col("status").alias("status"),
            ),
        ).alias("after"),
        F.struct(
            F.col("owner").alias("owner"),
            F.col("table_name").alias("table"),
            F.col("scn").alias("scn"),
            F.col("xid").alias("xid"),
            F.col("commit_scn").alias("commit_scn"),
            F.col("row_id").alias("row_id"),
        ).alias("source"),
        _op_char().alias("op"),
        (F.col("commit_scn")).alias("ts_ms"),
    )


def kafka_tombstones(feed: DataFrame) -> DataFrame:
    """kafka (std) mode on DELETE: key columns survive, value columns are
    NULL (the tombstone), op travels as a header
    (KafkaStructDataBinder.java:334-361)."""
    stamped = commit_stamped(feed)
    return stamped.filter(F.col("op") == OP_DELETE).select(
        "owner",
        "table_name",
        F.col("pk").alias("key_pk"),
        F.lit(None).cast("double").alias("value_totalprice"),
        F.lit(None).cast("string").alias("value_status"),
        F.lit("d").alias("header_op"),
        "commit_scn",
        "scn",
    )


def single_mode(feed: DataFrame) -> DataFrame:
    """single mode: one flat schema for all fields, value-only, op as a
    pseudo-column (KafkaStructSingleDataBinder.java:44 +
    KafkaPseudoColumnsProcessor.java:88-241)."""
    stamped = commit_stamped(feed)
    return stamped.select(
        "pk",
        "totalprice",
        "status",
        _op_char().alias("ora_op"),
        F.col("scn").alias("ora_row_scn"),
        F.col("commit_scn").alias("ora_commit_scn"),
        F.col("xid").alias("ora_xid"),
        "owner",
        "table_name",
    )


def col_present(col_name: str):
    """Tri-state presence of a wrapped column: INSERTs carry every
    column; UPDATEs carry only the statement's changed-column set
    (``changed_cols``, supplemental logging < ALL COLUMNS); DELETEs
    carry none (KafkaWrappedSchemas.java:60-176)."""
    return (F.col("op") == OP_INSERT) | (
        (F.col("op") == OP_UPDATE)
        & F.col("changed_cols").contains(col_name.upper())
    )


def wrapped_tristate(feed: DataFrame) -> DataFrame:
    """Wrapped tri-state mode (supplemental logging ≠ ALL COLUMNS): each
    value field becomes a nullable struct {V: value} so "column absent from
    this change" (struct null) is distinct from "column set to NULL"
    (struct present, V null). KafkaWrappedSchemas.java:98-176.

    Presence comes from the statement's changed-column set — partial
    UPDATEs genuinely omit columns (struct null), they don't carry a
    NULL value.
    """
    stamped = commit_stamped(feed)
    return stamped.select(
        "owner",
        "table_name",
        "pk",
        F.when(
            col_present("totalprice"), F.struct(F.col("totalprice").alias("V"))
        ).alias("totalprice_w"),
        F.when(col_present("status"), F.struct(F.col("status").alias("V"))).alias(
            "status_w"
        ),
        _op_char().alias("op_char"),
        "commit_scn",
        "scn",
    )


def wrapped_apply(feed: DataFrame) -> DataFrame:
    """K5 batch-applied: reconstruct the replica from wrapped tri-state
    changes — per column, the newest PRESENT value wins; a key's row
    survives iff its newest change isn't a DELETE.  Absent ≠ NULL: a
    partial UPDATE leaves the other columns at their prior value
    (WrappedDataTable.java:72-90).

    Invariant (tested): equals :func:`oracdc_spark.operators.cdc.
    apply_changes` because the flat feed's unchanged columns carry their
    prior value.  Plan: ONE groupBy on pk — "newest present value" per
    column is a struct-max over (version, value) with absent rows nulled
    out of the aggregate (lexicographic struct ordering = version
    ordering; max skips nulls).  Map-side partial aggregation, a single
    shuffle, no window, no self-joins — the feed is derived once.
    """
    stamped = commit_stamped(feed)
    version = [F.col("commit_scn"), F.col("scn"), F.col("ssn")]

    def newest(col: str):
        return F.max(
            F.when(col_present(col), F.struct(*version, F.col(col).alias("v")))
        )["v"].alias(col)

    agg = stamped.groupBy("owner", "table_name", "pk").agg(
        F.max(F.struct(*version, F.col("op").alias("op")))["op"].alias("_last_op"),
        newest("totalprice"),
        newest("status"),
    )
    return agg.filter(F.col("_last_op") != OP_DELETE).select(
        "owner", "table_name", "pk", "totalprice", "status"
    )
