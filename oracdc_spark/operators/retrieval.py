"""Hybrid retrieval: lexical + semantic candidate fusion via
Reciprocal Rank Fusion (Cormack, Clarke & Buettcher, SIGIR 2009 —
"Reciprocal rank fusion outperforms Condorcet and individual rank
learning methods").

The training-data-mining composition a curation pipeline runs to find
documents relevant to a topic seed: a LEXICAL ranking (shared word
n-gram shingles — the sparse/BM25-family signal) and a SEMANTIC ranking
(embedding cosine top-k — the dense signal) are fused per query with

    score(d) = Σ_sources 1 / (rrf_k + rank_source(d))

RRF is parameter-light and scale-free: only RANKS cross the fusion
boundary, so the incomparable raw scores (shingle counts vs quantized
cosine) never need calibration — and integer ranks make the fused score
bit-deterministic across engines (fixed expression shape
``coalesce(1/(k+r), 0) + coalesce(1/(k+r), 0)``, same IEEE sequence in
Spark and DuckDB).

Scale shape (100 TB): both sources follow the bounded-query-batch input
contract of ``similarity.brute_force_topk`` — the query side is an
external batch (topic seeds, eval set), broadcast into corpus-sized
joins; per-source candidate lists are top-k-bounded BEFORE fusion, so
the fusion join touches |Q|·(k_sem + k_lex) rows, never the corpus.
The lexical source joins on the shingle key (already partitioned by the
dedup family's plans); the semantic source is the audited ANN ladder —
swap ``brute_force_topk`` for ``pq.ivfpq_topk`` at billion-vector scale
(same output contract).

Reference parity: the reference ships no retrieval operator — this is
part of the LLM-data-pipeline surface (SURVEY.md "beyond the
reference"), composing two already-driver-verified sources.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from oracdc_spark.operators.dedup import shingles
from oracdc_spark.operators.similarity import brute_force_topk

RRF_K = 60  # the SIGIR-2009 constant; dampens low-rank dominance


def lexical_topk(
    docs: DataFrame, query_mod: int = 100, k: int = 20, n: int = 5
) -> DataFrame:
    """Per-query lexical candidates ranked by shared distinct word
    n-gram shingles (count desc, neighbor_id tie-break).  The shingle
    self-join is keyed on the shingle — the same skew-safe shape as
    ``dedup.jaccard_pairs`` — with the bounded query side broadcast.
    Output: (query_id, neighbor_id, rank)."""
    sh = shingles(docs, n)
    q = sh.filter(F.col("doc_id") % query_mod == 0).select(
        F.col("doc_id").alias("query_id"), "shingle"
    )
    common = (
        F.broadcast(q)
        .join(sh, "shingle")
        .filter(F.col("query_id") != F.col("doc_id"))
        .groupBy("query_id", F.col("doc_id").alias("neighbor_id"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("common").desc(), F.col("neighbor_id")
    )
    return (
        common.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("bigint").alias("rank"))
    )


def hybrid_rrf_topk(
    docs: DataFrame,
    vecs: DataFrame,
    query_mod: int = 100,
    k: int = 10,
    k_sem: int = 20,
    k_lex: int = 20,
    rrf_k: int = RRF_K,
) -> DataFrame:
    """Fused top-k: RRF over the semantic and lexical candidate lists.
    A document found by only one source still scores (the other term is
    0) — the union-of-candidates property that makes hybrid retrieval
    strictly more robust than either source alone.
    Output: (query_id, neighbor_id, sem_rank, lex_rank, score, rank)."""
    sem = brute_force_topk(vecs, query_mod, k_sem).withColumnRenamed(
        "rank", "sem_rank"
    )
    lex = lexical_topk(docs, query_mod, k_lex).withColumnRenamed("rank", "lex_rank")
    fused = sem.join(lex, ["query_id", "neighbor_id"], "full")
    score = F.coalesce(
        F.lit(1.0) / (F.lit(rrf_k) + F.col("sem_rank")), F.lit(0.0)
    ) + F.coalesce(F.lit(1.0) / (F.lit(rrf_k) + F.col("lex_rank")), F.lit(0.0))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        fused.select("query_id", "neighbor_id", "sem_rank", "lex_rank", score.alias("score"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "sem_rank",
            "lex_rank",
            F.round("score", 6).alias("score"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    )
