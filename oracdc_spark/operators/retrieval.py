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


def mmr_rerank(
    vecs: DataFrame,
    query_mod: int = 100,
    n_candidates: int = 20,
    k: int = 3,
) -> DataFrame:
    """Maximal Marginal Relevance re-rank (Carbonell & Goldstein, SIGIR
    1998): greedily pick k results maximizing

        0.7 * rel(q, d)  -  0.3 * max_{s in selected} sim(d, s)

    — relevance traded against redundancy, the standard diversified
    final stage of a RAG/search serving stack (and of diverse few-shot
    exemplar selection in training-data pipelines).

    Determinism: rel and sim are the engine's quantized-cosine doubles;
    the MMR combine is a fixed expression over identical doubles with
    the literal constants 0.7/0.3, so both engines compute the same
    value; every argmax ties to the lower doc id.  The greedy loop is
    inherently sequential — it unrolls as k-1 DataFrame iterations
    (k is a small serving constant, never data-sized).

    Scale shape: candidates are top-``n_candidates``-bounded per query
    BEFORE any pairwise work (the bounded-query-batch contract);
    pairwise sims compute only for candidate pairs CO-OCCURRING in some
    query's list (<= |Q|*N^2 pairs, deduplicated across queries before
    the d-dim dot); each greedy step is a join + one per-query window
    over <= |Q|*N rows.  Swap the exact relevance source for
    pq.ivfpq_topk at billion-vector scale, contract unchanged.

    Output: (query_id, doc_id, position) with position in 1..k."""
    from oracdc_spark.operators.similarity import cosine_scores, qcos_score, quantized

    queries = vecs.filter(F.col("vec_id") % query_mod == 0)
    wq = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    cand = (
        cosine_scores(queries, vecs)
        .withColumn("rk", F.row_number().over(wq))
        .filter(F.col("rk") <= n_candidates)
        .select("query_id", "neighbor_id", "score")
    )
    # candidate-candidate sims, deduplicated across queries
    cp = (
        cand.alias("a")
        .join(cand.alias("b"), "query_id")
        .filter(F.col("a.neighbor_id") != F.col("b.neighbor_id"))
        .select(
            F.col("a.neighbor_id").alias("da"),
            F.col("b.neighbor_id").alias("db"),
        )
        .distinct()
    )
    comps = quantized(vecs)
    ca = comps.select(F.col("vec_id").alias("da"), "i", F.col("q").alias("qa"))
    cb = comps.select(F.col("vec_id").alias("db"), "i", F.col("q").alias("qb"))
    nn = comps.groupBy("vec_id").agg(F.sum(F.col("q") * F.col("q")).alias("n2"))
    pdots = (
        cp.join(ca, "da")
        .join(cb, ["db", "i"])
        .groupBy("da", "db")
        .agg(F.sum(F.col("qa") * F.col("qb")).alias("dot"))
    )
    psim = (
        pdots.join(nn.select(F.col("vec_id").alias("da"), F.col("n2").alias("qn")), "da")
        .join(nn.select(F.col("vec_id").alias("db"), F.col("n2").alias("cn")), "db")
        .select("da", "db", qcos_score().alias("sim"))
    )
    picked = (
        cand.withColumn("rk", F.row_number().over(wq))
        .filter(F.col("rk") == 1)
        .select("query_id", "neighbor_id", F.lit(1).cast("bigint").alias("position"))
    )
    remaining = cand.join(
        picked.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"], "left_anti"
    )
    for pos in range(2, k + 1):
        pen = (
            remaining.join(
                picked.select("query_id", F.col("neighbor_id").alias("db")),
                "query_id",
            )
            .join(
                psim.select(F.col("da").alias("neighbor_id"), "db", "sim"),
                ["neighbor_id", "db"],
            )
            .groupBy("query_id", "neighbor_id")
            .agg(F.max("sim").alias("pen"))
        )
        mmr = remaining.join(pen, ["query_id", "neighbor_id"]).withColumn(
            "mmr", F.lit(0.7) * F.col("score") - F.lit(0.3) * F.col("pen")
        )
        wm = Window.partitionBy("query_id").orderBy(
            F.col("mmr").desc(), F.col("neighbor_id")
        )
        nxt = (
            mmr.withColumn("rk", F.row_number().over(wm))
            .filter(F.col("rk") == 1)
            .select(
                "query_id",
                "neighbor_id",
                F.lit(pos).cast("bigint").alias("position"),
            )
        )
        picked = picked.unionByName(nxt)
        remaining = remaining.join(
            nxt.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"], "left_anti"
        )
    return picked.select(
        "query_id", F.col("neighbor_id").alias("doc_id"), "position"
    )
