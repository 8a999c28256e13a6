"""Incremental sketch maintenance over a document stream.

The point of mergeable sketches (CMS by cell-sum, HLL by register-max —
`operators/textops.py`) is that they update INCREMENTALLY: each
micro-batch sketches only its own rows and folds into the running state,
so the cost per trigger is O(batch), never O(corpus), and the state is
fixed-size (≤ DEPTH×WIDTH + M rows).  This module wires that into
Structured Streaming via foreachBatch: read current state → union with
the batch sketch → re-aggregate → atomic swap.  After any prefix of the
stream, the maintained sketch equals the batch sketch of the rows seen
so far (asserted in tests/test_streaming_sketches.py).

At 100 TB the same fold runs per partition/day: sketch files are a few
KB regardless of data volume, and a fleet of daily sketches merges into
monthly/global ones without rescanning anything.
"""

from __future__ import annotations

import os
import shutil

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from oracdc_spark.operators.textops import cms_sketch, hll_registers, _gram_hash, _tokens


def _swap_write(df: DataFrame, path: str) -> None:
    tmp = path + "._staged"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    old = path + "._old"
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)


def merge_cms_batch(spark: SparkSession, batch: DataFrame, state_path: str) -> None:
    """Fold one micro-batch's CMS into the state (cells merge by SUM)."""
    delta = cms_sketch(batch)
    if os.path.exists(state_path):
        current = spark.read.parquet(state_path)
        delta = (
            current.unionAll(delta)
            .groupBy("d", "bucket")
            .agg(F.sum("cnt").alias("cnt"))
        )
    _swap_write(delta, state_path)


def merge_hll_batch(spark: SparkSession, batch: DataFrame, state_path: str) -> None:
    """Fold one micro-batch's HLL registers (merge by MAX)."""
    hashes = batch.select(F.explode(_tokens()).alias("tok")).select(
        _gram_hash(F.lower("tok")).alias("h")
    )
    delta = hll_registers(hashes)
    if os.path.exists(state_path):
        current = spark.read.parquet(state_path)
        delta = (
            current.unionAll(delta).groupBy("bucket").agg(F.max("m_j").alias("m_j"))
        )
    _swap_write(delta, state_path)


def run_sketch_pipeline(
    spark: SparkSession,
    docs_dir: str,
    cms_path: str,
    hll_path: str,
    checkpoint_dir: str,
    schema: str = "doc_id long, text string",
    max_files_per_trigger: int = 1,
):
    """Stream documents → maintain both sketches incrementally."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
    )

    def sink(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        merge_cms_batch(batch.sparkSession, batch, cms_path)
        merge_hll_batch(batch.sparkSession, batch, hll_path)

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def dedup_gate_batch(
    spark: SparkSession, batch: DataFrame, state_path: str
) -> DataFrame:
    """Streaming exact-dedup gate: emit only documents whose md5(text)
    digest has not been seen in ANY earlier micro-batch, then fold the
    batch's new digests into the state — the streaming form of
    ``dedup.exact_dedup_keep`` for a continuously-arriving crawl
    (each trigger pays O(batch) + one anti-join against the digest
    state, never a corpus rescan).

    In-batch duplicates also collapse (keep lowest doc_id), so after
    any stream prefix the emitted set equals the batch operator over
    the concatenation (asserted in tests).  The digest state is one
    narrow column; at 100 TB the same gate keys the state table by
    digest-bucket so the anti-join co-partitions with stored state
    (Delta/Iceberg MERGE by digest does exactly this), and the
    atomic-swap write generalizes to a transactional append of only
    the NEW digests.

    Returns the emitted (surviving) rows; writes the updated state."""
    digested = batch.withColumn("digest", F.md5(F.col("text")))
    w_first = (
        digested.groupBy("digest")
        .agg(F.min("doc_id").alias("doc_id"))
        .join(digested, ["digest", "doc_id"])
    )
    if os.path.exists(state_path):
        seen = spark.read.parquet(state_path)
        fresh = w_first.join(seen, "digest", "anti")
    else:
        seen = None
        fresh = w_first
    # localCheckpoint, NOT persist: the state swap below rewrites
    # state_path, so any lineage recompute (lost cached partition,
    # consumer action racing the rename) would anti-join against the
    # UPDATED state and silently drop every emitted row; an eager
    # local checkpoint severs the lineage so the emitted rows can
    # never be recomputed through the new state
    fresh = fresh.localCheckpoint(eager=True)
    out = fresh.select(batch.columns)
    new_digests = fresh.select("digest").distinct()
    all_digests = (
        new_digests if seen is None
        else seen.unionAll(new_digests).distinct()
    )
    _swap_write(all_digests, state_path)
    return out
