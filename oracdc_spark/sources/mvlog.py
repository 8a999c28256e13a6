"""Materialized-view-log source (S6-S8, SURVEY §2.1 / §3.3).

Reference: KafkaSnapshotLogTable.java:208-367 builds three statements per
table — (1) the MLOG$ scan ``SELECT <pk-or-M_ROW$$>, CASE DMLTYPE$$ WHEN
'I' THEN 'c' WHEN 'U' THEN 'u' ELSE 'd' END, ... [WHERE SEQUENCE$$ >
:last] ORDER BY SEQUENCE$$`` batched (:369-460 pollMVLog), (2) the master
lookup by ROWID/PK (:228-342), (3) the consumed-log delete (:224-226).

Spark restatement: the log scan is an incremental batch read bounded by
(last_seq, batch_size]; the master lookup is a stream-static LEFT join
(broadcast when the log batch is small — the common case); offset =
max(seq) of the batch; log-row deletion becomes offset commit.

The simulated MLOG$ derives deterministically from ``orders`` (arithmetic
only, mirrored in ANSI SQL for the oracle): seq = o_orderkey, DMLTYPE$$ =
D when k%5=0, U when k%3=0, else I.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from oracdc_spark.catalog import load_table


def simulated_mvlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLOG$_ORDERS stand-in: (seq, pk, row_id, dmltype)."""
    o = load_table(spark, sf_dir, "orders")
    dml = (
        F.when(F.col("o_orderkey") % 5 == 0, F.lit("D"))
        .when(F.col("o_orderkey") % 3 == 0, F.lit("U"))
        .otherwise(F.lit("I"))
    )
    return o.select(
        F.col("o_orderkey").cast("bigint").alias("seq"),
        F.col("o_orderkey").cast("bigint").alias("pk"),
        F.concat(F.lit("R"), F.col("o_orderkey")).alias("row_id"),
        dml.alias("dmltype"),
    )


def poll_mvlog(
    log: DataFrame, last_seq: int, batch_size: int
) -> DataFrame:
    """One poll: WHERE seq > last ORDER BY seq LIMIT batch  (offset is
    max(seq) of the returned batch). orderBy+limit compiles to
    TakeOrdered — per-partition top-k, no global sort at scale."""
    return log.filter(F.col("seq") > last_seq).orderBy("seq").limit(batch_size)


def with_master_lookup(
    batch: DataFrame, master: DataFrame, master_pk: str = "o_orderkey"
) -> DataFrame:
    """S7 — fetch the current master row per log entry.  LEFT join: a
    DELETE's master row is already gone → null master side (the
    reference emits key + null value, :442-458).  The batch side is
    bounded by batch_size → broadcast it, master never shuffles."""
    m = master.select(
        F.col(master_pk).alias("pk"),
        F.col("o_totalprice").alias("m_totalprice"),
        F.col("o_orderstatus").alias("m_status"),
    )
    op = (
        F.when(F.col("dmltype") == "I", F.lit("c"))
        .when(F.col("dmltype") == "U", F.lit("u"))
        .otherwise(F.lit("d"))
    )
    joined = F.broadcast(batch).join(m, "pk", "left")
    return joined.select(
        "seq",
        "pk",
        "row_id",
        op.alias("op"),
        F.when(F.col("dmltype") != "D", F.col("m_totalprice")).alias("totalprice"),
        F.when(F.col("dmltype") != "D", F.col("m_status")).alias("status"),
    )


def mvlog_batch(
    spark: SparkSession, sf_dir: str, last_seq: int = 1000, batch_size: int = 500
) -> DataFrame:
    """One full poll cycle: scan → lookup join → emission rows."""
    log = simulated_mvlog(spark, sf_dir)
    batch = poll_mvlog(log, last_seq, batch_size)
    master = load_table(spark, sf_dir, "orders")
    return with_master_lookup(batch, master)


def mvlog_consumption(
    spark: SparkSession, sf_dir: str, last_seq: int = 1000, batch_size: int = 500
) -> DataFrame:
    """S8 — consumed-log delete as offset-commit semantics
    (KafkaSnapshotLogTable.java:224-226 ``DELETE FROM MLOG$ WHERE
    SEQUENCE$$ <= :committed``): after a poll commits offset =
    max(seq) of the batch, the observable log state is every row ABOVE
    the committed offset.  The offset is a lazy 1-row aggregate
    broadcast into the filter — at scale this is one metadata-sized
    scalar against a pruned scan, never a mutation pass.
    Output: (seq, pk, dmltype, commit_seq)."""
    log = simulated_mvlog(spark, sf_dir)
    batch = poll_mvlog(log, last_seq, batch_size)
    committed = batch.agg(F.max("seq").alias("commit_seq"))
    return (
        log.crossJoin(F.broadcast(committed))
        .filter(F.col("seq") > F.col("commit_seq"))
        .select("seq", "pk", "dmltype", "commit_seq")
    )


MVLOG_CONSUMPTION_SQL = """
WITH mvlog AS (
  SELECT CAST(o_orderkey AS BIGINT) AS seq,
         CAST(o_orderkey AS BIGINT) AS pk,
         CASE WHEN o_orderkey % 5 = 0 THEN 'D'
              WHEN o_orderkey % 3 = 0 THEN 'U' ELSE 'I' END AS dmltype
  FROM orders
),
batch AS (
  SELECT * FROM mvlog WHERE seq > {last_seq} ORDER BY seq LIMIT {batch_size}
),
committed AS (SELECT MAX(seq) AS commit_seq FROM batch)
SELECT l.seq, l.pk, l.dmltype, c.commit_seq
FROM mvlog l CROSS JOIN committed c
WHERE l.seq > c.commit_seq
"""


MVLOG_BATCH_SQL = """
WITH mvlog AS (
  SELECT CAST(o_orderkey AS BIGINT) AS seq,
         CAST(o_orderkey AS BIGINT) AS pk,
         'R' || CAST(o_orderkey AS VARCHAR) AS row_id,
         CASE WHEN o_orderkey % 5 = 0 THEN 'D'
              WHEN o_orderkey % 3 = 0 THEN 'U' ELSE 'I' END AS dmltype
  FROM orders
),
batch AS (
  SELECT * FROM mvlog WHERE seq > {last_seq} ORDER BY seq LIMIT {batch_size}
),
m AS (
  SELECT CAST(o_orderkey AS BIGINT) AS pk,
         CAST(o_totalprice AS DOUBLE) AS m_totalprice,
         o_orderstatus AS m_status
  FROM orders
)
SELECT b.seq, b.pk, b.row_id,
       CASE b.dmltype WHEN 'I' THEN 'c' WHEN 'U' THEN 'u' ELSE 'd' END AS op,
       CASE WHEN b.dmltype <> 'D' THEN m.m_totalprice END AS totalprice,
       CASE WHEN b.dmltype <> 'D' THEN m.m_status END AS status
FROM batch b LEFT JOIN m ON b.pk = m.pk
"""
