"""G5 row-change fusion and G6 multi-row expansion (SURVEY §2.5).

Reference:

* G5 — a single logical row change can arrive as several redo vectors
  (URP+IRP chained-row updates, 11.6 ORP overwrites, CFA fragments);
  OraCdcTransaction.java:669-1122 collects fragments per (obj, rowid)
  and fuses them into one row event (RowChangeHolder.add/processRowChange).
  Spark restatement: fragments share (xid, row_id, scn); fusion is a
  groupBy with per-column "first non-null" resolution ordered by
  fragment sequence — one shuffle on the transaction key.

* G6 — QMI/QMD (array insert/delete) records describe N rows at once;
  OraCdcTransaction.java:987-1073 emitMultiRowChange expands them.
  Spark restatement: `explode` of the carried row array, sub-sequence
  numbers assigned by position.

Both fixture feeds derive deterministically from ``orders`` (mirrored in
ANSI SQL for the oracle).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from oracdc_spark.catalog import load_table

# ---------------------------------------------------------------------------
# G5 — fragment fusion
# ---------------------------------------------------------------------------


def fragment_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simulated split row-changes: every 17th order's update arrives as
    two fragments of one logical change — fragment 0 carries the price
    column, fragment 1 the status column."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 17 == 0)
    base = o.select(
        (F.col("o_orderkey") * 10).cast("bigint").alias("scn"),
        F.concat(F.lit("XID"), F.lpad((F.col("o_orderkey") % 101).cast("string"), 3, "0")).alias("xid"),
        F.concat(F.lit("R"), F.col("o_orderkey")).alias("row_id"),
        F.col("o_orderkey").cast("bigint").alias("pk"),
        F.col("o_totalprice"),
        F.col("o_orderstatus"),
    )
    frag0 = base.select(
        "scn", "xid", "row_id", "pk",
        F.lit(0).cast("bigint").alias("frag"),
        (F.col("o_totalprice") + 500.0).cast("double").alias("totalprice"),
        F.lit(None).cast("string").alias("status"),
    )
    frag1 = base.select(
        "scn", "xid", "row_id", "pk",
        F.lit(1).cast("bigint").alias("frag"),
        F.lit(None).cast("double").alias("totalprice"),
        F.lit("F2").alias("status"),
    )
    return frag0.unionAll(frag1)


def fuse_fragments(frags: DataFrame) -> DataFrame:
    """Fuse fragments of one logical change: first non-null value per
    column in fragment order; fragment count kept for audit.

    max_by/min_by would need null-skipping — the portable order-safe form
    aggregates (frag, value) structs and picks the first non-null after
    sorting, expressed here with min(struct) over non-null rows (null
    values sort last via a sentinel)."""
    def first_nonnull(col: str):
        # min over (frag) restricted to non-null values of `col`
        return F.min(F.when(F.col(col).isNotNull(), F.struct("frag", col)))[col]

    return frags.groupBy("xid", "row_id", "scn", "pk").agg(
        first_nonnull("totalprice").alias("totalprice"),
        first_nonnull("status").alias("status"),
        F.count(F.lit(1)).alias("n_fragments"),
    )


def row_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fuse_fragments(fragment_feed(spark, sf_dir))


ROW_FUSION_SQL = """
WITH base AS (
  SELECT CAST(o_orderkey*10 AS BIGINT) AS scn,
         'XID' || LPAD(CAST(o_orderkey % 101 AS VARCHAR), 3, '0') AS xid,
         'R' || CAST(o_orderkey AS VARCHAR) AS row_id,
         CAST(o_orderkey AS BIGINT) AS pk,
         o_totalprice, o_orderstatus
  FROM orders WHERE o_orderkey % 17 = 0
),
frags AS (
  SELECT scn, xid, row_id, pk, CAST(0 AS BIGINT) AS frag,
         CAST(o_totalprice + 500.0 AS DOUBLE) AS totalprice,
         CAST(NULL AS VARCHAR) AS status
  FROM base
  UNION ALL
  SELECT scn, xid, row_id, pk, CAST(1 AS BIGINT), CAST(NULL AS DOUBLE), 'F2'
  FROM base
)
SELECT xid, row_id, scn, pk,
       MAX(totalprice) AS totalprice,   -- exactly one non-null per group
       MAX(status) AS status,
       CAST(COUNT(*) AS BIGINT) AS n_fragments
FROM frags GROUP BY xid, row_id, scn, pk
"""

# ---------------------------------------------------------------------------
# G6 — multi-row expansion
# ---------------------------------------------------------------------------

MULTIROW_FAN = 3


def multirow_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simulated QMI records: every 11th order inserts an array of
    MULTIROW_FAN rows in one redo record (rows derived arithmetically)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 11 == 0)
    rows = F.transform(
        F.sequence(F.lit(0), F.lit(MULTIROW_FAN - 1)),
        lambda i: F.struct(
            (F.col("o_orderkey") * 100 + i).cast("bigint").alias("pk"),
            (F.col("o_totalprice") + i.cast("double")).cast("double").alias("totalprice"),
        ),
    )
    return o.select(
        (F.col("o_orderkey") * 10).cast("bigint").alias("scn"),
        F.concat(F.lit("XID"), F.lpad((F.col("o_orderkey") % 101).cast("string"), 3, "0")).alias("xid"),
        F.lit(11).alias("qm_op"),  # 11.11 QMI multi-insert
        rows.alias("rows"),
    )


def expand_multirow(qmi: DataFrame) -> DataFrame:
    """Explode one QMI record into N row events; ssn = array position
    (emitMultiRowChange assigns per-row sub-sequence)."""
    return qmi.select(
        "scn",
        "xid",
        F.posexplode("rows").alias("ssn", "r"),
    ).select(
        "scn",
        "xid",
        F.col("ssn").cast("bigint").alias("ssn"),
        F.lit(1).cast("int").alias("op"),
        F.col("r.pk").alias("pk"),
        F.col("r.totalprice").alias("totalprice"),
    )


def multirow_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    return expand_multirow(multirow_feed(spark, sf_dir))


MULTIROW_SQL = f"""
SELECT CAST(o_orderkey*10 AS BIGINT) AS scn,
       'XID' || LPAD(CAST(o_orderkey % 101 AS VARCHAR), 3, '0') AS xid,
       CAST(i AS BIGINT) AS ssn,
       1 AS op,
       CAST(o_orderkey*100 + i AS BIGINT) AS pk,
       CAST(o_totalprice + i AS DOUBLE) AS totalprice
FROM orders, UNNEST(generate_series(0, {MULTIROW_FAN - 1})) AS t(i)
WHERE o_orderkey % 11 = 0
"""

# ---------------------------------------------------------------------------
# G7 — direct-path load decode (19.1 KCBLCOLB block dumps)
# ---------------------------------------------------------------------------

DIRECT_ROWS_PER_BLOCK = 2


def direct_load_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simulated 19.1 COLB direct-load records (OraCdcChangeColb.java:63-100,
    Op19_1_Test.java): a direct-path INSERT writes whole data blocks; the
    redo carries the block image, not per-row vectors.  Every 19th order
    contributes one block (bdba = orderkey) holding DIRECT_ROWS_PER_BLOCK
    complete rows; every 5th such block ALSO appears once more at a lower
    SCN with a stale image — direct load rewrites blocks in place, so only
    the final image may be applied (the property G6's QMI explode does not
    have, which is why G7 is not an alias of it)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 19 == 0)

    def block(scn_off, price_off):
        rows = F.transform(
            F.sequence(F.lit(0), F.lit(DIRECT_ROWS_PER_BLOCK - 1)),
            lambda i: F.struct(
                (F.col("o_orderkey") * 1000 + i).cast("bigint").alias("pk"),
                (F.col("o_totalprice") + i.cast("double") + price_off)
                .cast("double")
                .alias("totalprice"),
            ),
        )
        return o.select(
            (F.col("o_orderkey") * 10 + scn_off).cast("bigint").alias("scn"),
            F.concat(
                F.lit("XID"),
                F.lpad((F.col("o_orderkey") % 101).cast("string"), 3, "0"),
            ).alias("xid"),
            F.col("o_orderkey").cast("bigint").alias("bdba"),
            rows.alias("rows"),
        )

    final = block(3, 0.0)
    stale = block(1, -1000.0).filter(F.col("bdba") % 5 == 0)
    return final.unionAll(stale)


def decode_direct_load(blocks: DataFrame) -> DataFrame:
    """G7 — apply direct-load block dumps: keep only the FINAL image per
    block (bdba, highest scn — in-place block rewrite), then extract rows
    in row-directory slot order (ssn = slot).  One shuffle on bdba; the
    explode is narrow."""
    from pyspark.sql import Window

    w = Window.partitionBy("bdba").orderBy(F.col("scn").desc())
    latest = (
        blocks.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    return latest.select(
        "scn", "xid", "bdba", F.posexplode("rows").alias("ssn", "r")
    ).select(
        "scn",
        "xid",
        "bdba",
        F.col("ssn").cast("bigint").alias("ssn"),
        F.lit(1).cast("int").alias("op"),
        F.col("r.pk").alias("pk"),
        F.col("r.totalprice").alias("totalprice"),
    )


def direct_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    return decode_direct_load(direct_load_feed(spark, sf_dir))


DIRECT_LOAD_SQL = f"""
WITH blocks AS (
  SELECT CAST(o_orderkey*10+3 AS BIGINT) AS scn,
         'XID' || LPAD(CAST(o_orderkey % 101 AS VARCHAR), 3, '0') AS xid,
         CAST(o_orderkey AS BIGINT) AS bdba,
         o_totalprice, CAST(0.0 AS DOUBLE) AS price_off
  FROM orders WHERE o_orderkey % 19 = 0
  UNION ALL
  SELECT CAST(o_orderkey*10+1 AS BIGINT),
         'XID' || LPAD(CAST(o_orderkey % 101 AS VARCHAR), 3, '0'),
         CAST(o_orderkey AS BIGINT), o_totalprice, CAST(-1000.0 AS DOUBLE)
  FROM orders WHERE o_orderkey % 19 = 0 AND o_orderkey % 5 = 0
),
latest AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY bdba ORDER BY scn DESC) AS rn
    FROM blocks) t
  WHERE rn = 1
)
SELECT scn, xid, bdba, CAST(i AS BIGINT) AS ssn, 1 AS op,
       CAST(bdba*1000 + i AS BIGINT) AS pk,
       CAST(o_totalprice + i + price_off AS DOUBLE) AS totalprice
FROM latest, UNNEST(generate_series(0, {DIRECT_ROWS_PER_BLOCK - 1})) AS t(i)
"""
