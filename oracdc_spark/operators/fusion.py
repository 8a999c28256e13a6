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
# G5b — chained-row piece fusion (full opcode matrix)
# ---------------------------------------------------------------------------
#
# The two-fragment model above covers the common case; real chained /
# migrated rows need the full matrix the reference implements in
# RowChangeHolder (OraCdcTransaction.java:669-875) + completeRow
# (:1288-1380) + createRowChangeHolder (:1122-1286):
#
# * a logical row change arrives as N *pieces*, each a redo record with
#   an 11.x opcode — 11.2 IRP (insert row piece), 11.3 DRP (delete row
#   piece), 11.5 URP (update row piece), 11.6 ORP (overwrite row piece)
#   — and a flag byte with K (head), F (first), L (last) bits;
# * the logical operation is derived from the piece mix: any DRP =>
#   DELETE; all IRP => INSERT; URP / ORP / URP+IRP mix (a migrated-row
#   update writes the new tail piece as an IRP) => UPDATE — including
#   the INSERT->UPDATE upgrade when an ORP joins IRP pieces
#   (completeRow: `lmOp == INSERT && operation == _11_6_ORP`);
# * a change may only be emitted when COMPLETE: first+last flags seen
#   (head also required for INSERT/DELETE); incomplete holders stay in
#   `halfDone` — restated here as a completeness HAVING, with the
#   held-back groups exposed by `chained_incomplete` for audit;
# * ORP pieces OVERWRITE: their column image replaces whatever an
#   earlier piece supplied; otherwise the first piece (in piece order)
#   carrying a column wins.
#
# Spark restatement: ONE groupBy on (xid, row_id, scn) — bool_or over
# flag bits, opcode-mix CASE for lm_op, and per-column min over
# (overwrite-priority, part_no) structs restricted to non-null values.
# No window, no self-join; scale = one shuffle on the transaction key.

OP_IRP, OP_DRP, OP_URP, OP_ORP = 2, 3, 5, 6
FB_LAST, FB_FIRST, FB_HEAD = 1, 2, 4


def piece_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic chained-row piece feed from ``orders``: every 13th
    order contributes one logical change whose shape cycles with the key.

    kind 0 (UPDATE, heterogeneous URP+IRP): head URP carries the price,
    a middle URP carries the status, the migrated tail arrives as an IRP
    carrying the clerk; even keys add an ORP that overwrites the price.
    kind 1 (INSERT, 2 IRP pieces)  kind 2 (DELETE, 1 DRP piece).
    Keys divisible by 7 lose their L-flagged non-DRP piece => incomplete.
    """
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 13 == 0)
    base = o.select(
        (F.col("o_orderkey") * 10).cast("bigint").alias("scn"),
        F.concat(F.lit("XID"), F.lpad((F.col("o_orderkey") % 101).cast("string"), 3, "0")).alias("xid"),
        F.concat(F.lit("R"), F.col("o_orderkey")).alias("row_id"),
        F.col("o_orderkey").cast("bigint").alias("pk"),
        (F.col("o_orderkey") % 3).alias("kind"),
        F.col("o_totalprice"),
        F.col("o_orderpriority"),
    )

    def piece(df, op, fb, part, price=None, status=None, clerk=None):
        return df.select(
            "scn", "xid", "row_id", "pk",
            F.lit(op).cast("int").alias("op"),
            F.lit(fb).cast("int").alias("fb"),
            F.lit(part).cast("bigint").alias("part_no"),
            (price if price is not None else F.lit(None)).cast("double").alias("totalprice"),
            (status if status is not None else F.lit(None)).cast("string").alias("status"),
            (clerk if clerk is not None else F.lit(None)).cast("string").alias("clerk"),
        )

    upd = base.filter(F.col("kind") == 0)
    ins = base.filter(F.col("kind") == 1)
    dele = base.filter(F.col("kind") == 2)
    pieces = [
        piece(upd, OP_URP, FB_HEAD | FB_FIRST, 0, price=F.col("o_totalprice") + 100.0),
        piece(upd, OP_URP, 0, 1, status=F.lit("C2")),
        piece(upd, OP_IRP, FB_LAST, 2, clerk=F.col("o_orderpriority")),
        piece(
            upd.filter(F.col("pk") % 2 == 0),
            OP_ORP, 0, 3, price=F.col("o_totalprice") + 999.0,
        ),
        piece(ins, OP_IRP, FB_HEAD | FB_FIRST, 0,
              price=F.col("o_totalprice"), status=F.lit("N")),
        piece(ins, OP_IRP, FB_LAST, 1, clerk=F.col("o_orderpriority")),
        piece(dele, OP_DRP, FB_HEAD | FB_FIRST | FB_LAST, 0),
    ]
    feed = pieces[0]
    for p in pieces[1:]:
        feed = feed.unionAll(p)
    # drop the closing piece for keys % 7 == 0 (still-open chains)
    return feed.filter(
        ~((F.col("pk") % 7 == 0)
          & (F.col("fb").bitwiseAND(FB_LAST) != 0)
          & (F.col("op") != OP_DRP))
    )


def fuse_pieces(pieces: DataFrame, complete_only: bool = True) -> DataFrame:
    """Fuse row pieces into logical row changes (matrix above)."""
    def resolve(col: str):
        # first non-null in piece order; ORP pieces take precedence
        prio = F.when(F.col("op") == OP_ORP, F.lit(0)).otherwise(F.lit(1))
        return F.min(
            F.when(F.col(col).isNotNull(), F.struct(prio.alias("p"), "part_no", col))
        )[col]

    flag = lambda bit: F.max((F.col("fb").bitwiseAND(bit) != 0).cast("int"))
    fused = (
        pieces.groupBy("xid", "row_id", "scn", "pk")
        .agg(
            flag(FB_HEAD).alias("has_head"),
            flag(FB_FIRST).alias("has_first"),
            flag(FB_LAST).alias("has_last"),
            F.max((F.col("op") == OP_DRP).cast("int")).alias("any_drp"),
            F.min((F.col("op") == OP_IRP).cast("int")).alias("all_irp"),
            resolve("totalprice").alias("totalprice"),
            resolve("status").alias("status"),
            resolve("clerk").alias("clerk"),
            F.count(F.lit(1)).alias("n_pieces"),
        )
        .withColumn(
            "lm_op",
            F.when(F.col("any_drp") == 1, F.lit(3))
            .when(F.col("all_irp") == 1, F.lit(1))
            .otherwise(F.lit(2)),
        )
        .withColumn(
            "complete",
            (F.col("has_first") == 1) & (F.col("has_last") == 1)
            & ((F.col("lm_op") == 2) | (F.col("has_head") == 1)),
        )
    )
    if complete_only:
        fused = fused.filter(F.col("complete"))
    return fused.select(
        "xid", "row_id", "scn", "pk", "lm_op",
        "totalprice", "status", "clerk", "n_pieces",
    ) if complete_only else fused


def chained_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fuse_pieces(piece_feed(spark, sf_dir))


def chained_incomplete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-back (halfDone) chains: groups that may NOT be emitted yet."""
    fused = fuse_pieces(piece_feed(spark, sf_dir), complete_only=False)
    return fused.filter(~F.col("complete")).select(
        "xid", "row_id", "scn", "pk", "lm_op", "n_pieces"
    )


_PIECE_FEED_SQL = f"""
  WITH base AS (
    SELECT CAST(o_orderkey*10 AS BIGINT) AS scn,
           'XID' || LPAD(CAST(o_orderkey % 101 AS VARCHAR), 3, '0') AS xid,
           'R' || CAST(o_orderkey AS VARCHAR) AS row_id,
           CAST(o_orderkey AS BIGINT) AS pk,
           o_orderkey % 3 AS kind, o_totalprice, o_orderpriority
    FROM orders WHERE o_orderkey % 13 = 0
  ),
  pieces AS (
    SELECT scn, xid, row_id, pk, {OP_URP} AS op, {FB_HEAD | FB_FIRST} AS fb,
           CAST(0 AS BIGINT) AS part_no,
           CAST(o_totalprice + 100.0 AS DOUBLE) AS totalprice,
           CAST(NULL AS VARCHAR) AS status, CAST(NULL AS VARCHAR) AS clerk
    FROM base WHERE kind = 0
    UNION ALL
    SELECT scn, xid, row_id, pk, {OP_URP}, 0, 1, NULL, 'C2', NULL
    FROM base WHERE kind = 0
    UNION ALL
    SELECT scn, xid, row_id, pk, {OP_IRP}, {FB_LAST}, 2, NULL, NULL, o_orderpriority
    FROM base WHERE kind = 0
    UNION ALL
    SELECT scn, xid, row_id, pk, {OP_ORP}, 0, 3,
           CAST(o_totalprice + 999.0 AS DOUBLE), NULL, NULL
    FROM base WHERE kind = 0 AND pk % 2 = 0
    UNION ALL
    SELECT scn, xid, row_id, pk, {OP_IRP}, {FB_HEAD | FB_FIRST}, 0,
           CAST(o_totalprice AS DOUBLE), 'N', NULL
    FROM base WHERE kind = 1
    UNION ALL
    SELECT scn, xid, row_id, pk, {OP_IRP}, {FB_LAST}, 1, NULL, NULL, o_orderpriority
    FROM base WHERE kind = 1
    UNION ALL
    SELECT scn, xid, row_id, pk, {OP_DRP}, {FB_HEAD | FB_FIRST | FB_LAST}, 0,
           NULL, NULL, NULL
    FROM base WHERE kind = 2
  ),
  feed AS (
    SELECT * FROM pieces
    WHERE NOT (pk % 7 = 0 AND (fb & {FB_LAST}) <> 0 AND op <> {OP_DRP})
  ),
  fused AS (
    SELECT xid, row_id, scn, pk,
           MAX(CASE WHEN (fb & {FB_HEAD}) <> 0 THEN 1 ELSE 0 END) AS has_head,
           MAX(CASE WHEN (fb & {FB_FIRST}) <> 0 THEN 1 ELSE 0 END) AS has_first,
           MAX(CASE WHEN (fb & {FB_LAST}) <> 0 THEN 1 ELSE 0 END) AS has_last,
           MAX(CASE WHEN op = {OP_DRP} THEN 1 ELSE 0 END) AS any_drp,
           MIN(CASE WHEN op = {OP_IRP} THEN 1 ELSE 0 END) AS all_irp,
           MIN_BY(totalprice, (CASE WHEN op = {OP_ORP} THEN 0 ELSE 1 END)*1000 + part_no)
             FILTER (WHERE totalprice IS NOT NULL) AS totalprice,
           MIN_BY(status, (CASE WHEN op = {OP_ORP} THEN 0 ELSE 1 END)*1000 + part_no)
             FILTER (WHERE status IS NOT NULL) AS status,
           MIN_BY(clerk, (CASE WHEN op = {OP_ORP} THEN 0 ELSE 1 END)*1000 + part_no)
             FILTER (WHERE clerk IS NOT NULL) AS clerk,
           CAST(COUNT(*) AS BIGINT) AS n_pieces
    FROM feed GROUP BY xid, row_id, scn, pk
  ),
  typed AS (
    SELECT *,
           CASE WHEN any_drp = 1 THEN 3 WHEN all_irp = 1 THEN 1 ELSE 2 END AS lm_op
    FROM fused
  )
"""

CHAINED_FUSION_SQL = _PIECE_FEED_SQL + f"""
SELECT xid, row_id, scn, pk, lm_op, totalprice, status, clerk, n_pieces
FROM typed
WHERE has_first = 1 AND has_last = 1 AND (lm_op = 2 OR has_head = 1)
"""

CHAINED_INCOMPLETE_SQL = _PIECE_FEED_SQL + f"""
SELECT xid, row_id, scn, pk, lm_op, n_pieces
FROM typed
WHERE NOT (has_first = 1 AND has_last = 1 AND (lm_op = 2 OR has_head = 1))
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
