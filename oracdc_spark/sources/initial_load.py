"""Initial bulk load + stream handoff (S9, SURVEY §2.1).

Reference: KafkaInitialLoadTable.java:168-208 — ``SELECT <cols>[,ROWID]
FROM owner.table [WHERE ORA_ROWSCN < :scn]`` snapshots the table at a
consistency cut, then the change stream takes over from that SCN; the
union must be exactly-once per key (stream events override snapshot rows
they supersede).

Spark restatement: a partitioned snapshot read (jdbc partitionColumn /
parquet) unioned with the committed stream filtered to ``scn >= cut``;
per-key conflict resolved last-write-wins (snapshot rows carry the cut
SCN as their version — any stream change at/after the cut wins).

At 100 TB: the snapshot is a one-time parallel scan (no shuffle); the
union is narrow; the per-key resolution shuffles once on pk — the same
key the MERGE sink needs anyway.

The simulated setup derives from ``customer`` (the AP.CUSTOMER feed of
feed.py): snapshot = rows whose insert-SCN precedes the cut; stream =
the customer change feed at/after the cut.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from oracdc_spark.catalog import load_table
from oracdc_spark.feed import SPEC, customer_feed

# consistency cut inside the customer SCN range (base + 750*10)
DEFAULT_CUT = SPEC.cust_scn_base + 7_500


def snapshot_at_cut(spark: SparkSession, sf_dir: str, cut_scn: int = DEFAULT_CUT) -> DataFrame:
    """The bulk-load half: rows whose row-SCN precedes the cut
    (WHERE ORA_ROWSCN < :scn)."""
    c = load_table(spark, sf_dir, "customer")
    row_scn = F.lit(SPEC.cust_scn_base) + F.col("c_custkey") * 10
    return c.filter(row_scn < cut_scn).select(
        F.col("c_custkey").cast("bigint").alias("pk"),
        F.col("c_acctbal").cast("double").alias("totalprice"),
        F.col("c_mktsegment").cast("string").alias("status"),
        row_scn.cast("bigint").alias("scn"),
        F.lit("load").alias("src"),
    )


def stream_after_cut(spark: SparkSession, sf_dir: str, cut_scn: int = DEFAULT_CUT) -> DataFrame:
    """The streaming half: committed changes at/after the cut."""
    f = customer_feed(spark, sf_dir)
    return f.filter(F.col("scn") >= cut_scn).select(
        "pk", "totalprice", "status", "scn", F.lit("stream").alias("src")
    )


def initial_load_union(
    spark: SparkSession, sf_dir: str, cut_scn: int = DEFAULT_CUT
) -> DataFrame:
    """Snapshot ∪ stream with per-key last-write-wins (stream ≥ cut wins
    over snapshot; ties impossible because snapshot rows are < cut)."""
    snap = snapshot_at_cut(spark, sf_dir, cut_scn)
    stream = stream_after_cut(spark, sf_dir, cut_scn)
    both = snap.unionByName(stream)
    w = Window.partitionBy("pk").orderBy(F.col("scn").desc())
    return (
        both.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


INITIAL_LOAD_SQL = """
WITH snap AS (
  SELECT CAST(c_custkey AS BIGINT) AS pk,
         CAST(c_acctbal AS DOUBLE) AS totalprice,
         CAST(c_mktsegment AS VARCHAR) AS status,
         CAST({base} + c_custkey*10 AS BIGINT) AS scn,
         'load' AS src
  FROM customer
  WHERE {base} + c_custkey*10 < {cut}
),
strm AS (
  SELECT CAST(c_custkey AS BIGINT) AS pk,
         CAST(c_acctbal AS DOUBLE) AS totalprice,
         CAST(c_mktsegment AS VARCHAR) AS status,
         CAST({base} + c_custkey*10 AS BIGINT) AS scn,
         'stream' AS src
  FROM customer
  WHERE {base} + c_custkey*10 >= {cut}
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY pk ORDER BY scn DESC) AS rn
  FROM (SELECT * FROM snap UNION ALL SELECT * FROM strm)
)
SELECT pk, totalprice, status, scn, src FROM ranked WHERE rn = 1
"""
