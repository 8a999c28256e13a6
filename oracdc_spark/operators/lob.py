"""LOB chunk reassembly (P7, SURVEY §2.4).

Reference: out-of-row LOBs arrive as per-transaction chunk streams keyed
by (xid, lob_id) and are reassembled before the row event is emitted
(OraCdcTransaction.java:2053-2260 writeLobChunk/getLob,
OraCdcLargeObjectWorker.java:50).

Spark restatement: chunks are rows (lob_id, chunk_idx, chunk); reassembly
is a groupBy(lob_id) with an order-preserving aggregation — shuffled once
on lob_id (co-partitioned with the xid shuffle upstream in the real
pipeline since lob_id groups nest inside transactions).  State-store
spill replaces the reference's per-transaction temp files (G10).

The test/oracle feed derives chunks by splitting ``documents.text`` into
fixed-size slices — reassembly must reproduce the original byte-exact.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from oracdc_spark.catalog import load_table

CHUNK = 100


def lob_chunks(docs: DataFrame, chunk_size: int = CHUNK) -> DataFrame:
    """Split each document into ordered chunks: (lob_id, chunk_idx, chunk)."""
    n_chunks = F.ceil(F.length("text").cast("double") / chunk_size).cast("int")
    idx = F.explode(F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0))))
    return docs.select(
        F.col("doc_id").alias("lob_id"),
        idx.alias("chunk_idx"),
        "text",
    ).select(
        "lob_id",
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        F.substring(F.col("text"), F.col("chunk_idx") * chunk_size + 1, chunk_size).alias("chunk"),
    )


def reassemble_lobs(chunks: DataFrame) -> DataFrame:
    """(lob_id, value): chunks concatenated in chunk_idx order.
    collect_list order is non-deterministic → sort the (idx, chunk)
    structs before joining (the only order-safe aggregation pattern)."""
    return chunks.groupBy("lob_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("chunk_idx", "chunk"))),
                lambda s: s["chunk"],
            ),
            "",
        ).alias("value")
    )


def lob_roundtrip(spark: SparkSession, sf_dir: str, chunk_size: int = CHUNK) -> DataFrame:
    """Chunk → reassemble → verify against the original (md5 compare).
    Output: (lob_id, n_chunks, digest, match)."""
    docs = load_table(spark, sf_dir, "documents")
    chunks = lob_chunks(docs, chunk_size)
    n = chunks.groupBy("lob_id").agg(F.count(F.lit(1)).alias("n_chunks"))
    re = reassemble_lobs(chunks)
    orig = docs.select(F.col("doc_id").alias("lob_id"), F.md5("text").alias("orig_digest"))
    return (
        re.join(n, "lob_id")
        .join(orig, "lob_id")
        .select(
            "lob_id",
            "n_chunks",
            F.md5("value").alias("digest"),
            (F.md5("value") == F.col("orig_digest")).alias("match"),
        )
    )


def lob_inflate_roundtrip(spark: SparkSession, sf_dir: str, chunk_size: int = CHUNK) -> DataFrame:
    """P13 composed with P7: SecureFile-style compressed LOB chunks are
    inflated per-chunk BEFORE reassembly (OraCdcTransaction.java:2204-2226
    getLob loop).  Compression mode cycles per lob: doc_id%3 = 0 raw /
    1 zlib (dataCompressed) / 2 gzip (GzipUtil payloads); the mode column
    is re-DETECTED from the payload magic bytes JVM-side (is_gzip/is_zlib
    — the fixture label never leaks into the result).
    Output: (lob_id, mode, n_chunks, digest, match)."""
    from oracdc_spark.functions.compress import (
        gzip_compress, inflate_text, is_gzip, is_zlib, zlib_compress,
    )

    docs = load_table(spark, sf_dir, "documents")
    chunks = lob_chunks(docs, chunk_size)
    mode = F.col("lob_id") % 3
    payload = (
        F.when(mode == 1, zlib_compress("chunk"))
        .when(mode == 2, gzip_compress("chunk"))
        .otherwise(F.encode("chunk", "utf-8"))
    )
    compressed = chunks.select("lob_id", "chunk_idx", payload.alias("payload"))
    inflated = compressed.select(
        "lob_id",
        "chunk_idx",
        # detection is JVM-side codegen over the magic bytes
        F.when(is_gzip("payload"), F.lit("gzip"))
        .when(is_zlib("payload"), F.lit("zlib"))
        .otherwise(F.lit("raw"))
        .alias("detected"),
        inflate_text("payload").alias("chunk"),
    )
    re = reassemble_lobs(inflated.select("lob_id", "chunk_idx", "chunk"))
    stats = inflated.groupBy("lob_id").agg(
        F.max("detected").alias("mode"),  # uniform per lob by construction
        F.count(F.lit(1)).alias("n_chunks"),
    )
    orig = docs.select(F.col("doc_id").alias("lob_id"), F.md5("text").alias("orig_digest"))
    return (
        re.join(stats, "lob_id")
        .join(orig, "lob_id")
        .select(
            "lob_id",
            "mode",
            "n_chunks",
            F.md5("value").alias("digest"),
            (F.md5("value") == F.col("orig_digest")).alias("match"),
        )
    )


LOB_INFLATE_SQL = """
WITH chunks AS (
  SELECT doc_id AS lob_id,
         GREATEST(CAST(ceil(CAST(length(text) AS DOUBLE)/{chunk}) AS INT), 1) AS n_chunks
  FROM documents
)
SELECT c.lob_id,
       CASE c.lob_id % 3 WHEN 1 THEN 'zlib' WHEN 2 THEN 'gzip' ELSE 'raw' END AS mode,
       CAST(c.n_chunks AS BIGINT) AS n_chunks,
       md5(d.text) AS digest,
       TRUE AS match
FROM chunks c JOIN documents d ON c.lob_id = d.doc_id
"""


LOB_ROUNDTRIP_SQL = """
WITH chunks AS (
  SELECT doc_id AS lob_id, CAST(i AS BIGINT) AS chunk_idx,
         substr(text, i*{chunk} + 1, {chunk}) AS chunk
  FROM documents,
       UNNEST(generate_series(0, GREATEST(CAST(ceil(CAST(length(text) AS DOUBLE)/{chunk}) AS INT) - 1, 0))) AS t(i)
),
re AS (
  SELECT lob_id, string_agg(chunk, '' ORDER BY chunk_idx) AS value,
         CAST(COUNT(*) AS BIGINT) AS n_chunks
  FROM chunks GROUP BY lob_id
)
SELECT r.lob_id, r.n_chunks, md5(r.value) AS digest,
       (md5(r.value) = md5(d.text)) AS match
FROM re r JOIN documents d ON r.lob_id = d.doc_id
"""
