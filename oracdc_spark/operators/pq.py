"""Product quantization (PQ) ANN: interleaved-subspace codebooks,
corpus codes, asymmetric-distance (ADC) top-k, and a recall audit.

Role in the engine: completes the ANN ladder in
``operators/similarity.py`` — brute force (exact baseline), IVF /
IVF-multiprobe (coarse pruning), SQ8 (4x storage compression) — with
the standard FAISS-style scale path for billion-vector corpora: PQ
compresses each vector to ``m`` one-byte codes (here m=16 over 64 dims:
16x compression vs float32) and query scoring never touches the
original vectors, only a per-query lookup table of size m*k.

Decomposition: dimension ``i`` (0-based) belongs to subspace
``i % m`` — INTERLEAVED grouping rather than contiguous blocks, so the
subspace split needs no knowledge of the vector length (the operator
works on ragged/unknown-d corpora, and the SQL oracle mirrors it as
``(i-1) % m`` over DuckDB's 1-based UNNEST index).

Training is per-subspace Lloyd k-means reusing the exact-integer
recipe of ``operators/clustering.py`` (quantized bigint components,
floor-mean centroids, integer squared distances, argmin ties on the
lower cluster id, ``vec_id % k`` seeding — no RNG to synchronize), run
for a fixed ``iters`` so the whole loop is a deterministic, bounded
DataFrame plan.  Codes are the final assignment; the codebook is the
refit over the final codes.

ADC scoring (the PQ trick): for each query precompute
``lut[sub, cluster] = <query_sub, centroid>`` — an m*k-row table per
query, built by ONE broadcast join of the (tiny) codebook against the
(bounded, see brute_force_topk's input contract) query batch.  A
neighbor's approximate dot product is then ``sum_sub lut[sub,
code[neighbor, sub]]`` — the corpus is touched once, at m rows per
vector, with no per-pair dimension loop.  Scores use the engine's
sign(dot)*dot^2/(qn*cn) quantized-cosine form with the DECODED corpus
norm (sum of centroid norms per code), mirroring SQ8's
decoded-components-re-enter-scoring convention.

Scale shape (100 TB): training touches the corpus 2x per iteration
(same as clustering.py — k*m*d centroid rows, always broadcastable);
encoding is one more assignment pass; the serving-path state is codes
(m bigints per vector, stored once) plus the k*d codebook.  The ADC
join is corpus-codes x broadcast-LUT keyed on (sub, cluster) — 16
distinct key values per sub at k=16, so the groupBy(query, neighbor)
partial-aggregates map-side; nothing quadratic in the corpus, no
per-pair d-dim work.

Reference parity: the reference ships no ANN operator — this is part
of the LLM-data-pipeline surface the task brief adds on top of the
oracdc operator set (SURVEY.md "beyond the reference").
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from oracdc_spark.operators.similarity import brute_force_topk, quantized

PQ_M = 16       # subspaces (interleaved by i % m): 4-dim sub-vectors at
                # d=64 — 16 one-byte codes = 16x compression vs float32.
                # Fewer, wider subspaces compress harder but collapse
                # recall on unclustered data (m=4 ~0.08, m=8 ~0.3,
                # m=16 ~0.4 on the synthetic corpus vs exact top-5).
PQ_K = 16       # centroids per subspace (one-byte codes up to k=256)
PQ_ITERS = 2    # fixed Lloyd iterations (bounded, deterministic plan)


def pq_components(vecs: DataFrame, m: int = PQ_M) -> DataFrame:
    """Unnested exact-integer components tagged with their subspace:
    (vec_id, sub, i, q)."""
    return quantized(vecs).withColumn("sub", (F.col("i") % m).cast("bigint"))


def _codebook(comps: DataFrame, assign: DataFrame) -> DataFrame:
    """Refit step: floor-mean centroid components per (sub, cluster, i).
    Result is at most k*d rows — always broadcastable."""
    return (
        comps.join(assign, ["vec_id", "sub"])
        .groupBy("sub", "cluster", "i")
        .agg(
            F.floor(F.sum("q").cast("double") / F.count(F.lit(1)))
            .cast("bigint")
            .alias("cq")
        )
    )


def _assign(comps: DataFrame, cb: DataFrame, k: int = PQ_K) -> DataFrame:
    """Assignment step: exact integer squared distance per (vec, sub,
    cluster), argmin with (dist2, cluster) tie-break.

    Vectorized form (r6): instead of exploding comps ×k through a
    (sub, i) join and resolving the argmin with a row_number window
    over n·m·k rows, the codebook pivots into per-(sub, i) arrays of k
    centroid components (broadcast, NULL where a cluster is empty for
    the sub), each component row computes its k cross-products in one
    JVM `transform`, and the groupBy(vec_id, sub) aggregates k
    elementwise sums — one shuffle of n·m rows, no window.  The argmin
    uses dist²_c = Σq² − 2·Σq·cq_c + Σcq_c² (all exact bigints) with
    empty clusters coalesced to a +∞ sentinel; `array_position` of the
    min returns the FIRST (= lowest cluster id) occurrence, matching
    the old (dist2 asc, cluster asc) tie-break exactly."""
    sent = F.lit((1 << 62) - 1)
    cb_arr = (
        cb.groupBy("sub", "i")
        .agg(
            *[
                F.max(F.when(F.col("cluster") == c, F.col("cq"))).alias(f"c{c}")
                for c in range(k)
            ]
        )
        .select("sub", "i", F.array(*[F.col(f"c{c}") for c in range(k)]).alias("cqs"))
    )
    cc2 = cb.groupBy("sub", "cluster").agg(
        F.sum(F.col("cq") * F.col("cq")).alias("cc2")
    )
    cc2_arr = cc2.groupBy("sub").agg(
        *[
            F.max(F.when(F.col("cluster") == c, F.col("cc2"))).alias(f"n{c}")
            for c in range(k)
        ]
    ).select("sub", F.array(*[F.col(f"n{c}") for c in range(k)]).alias("cc2s"))
    prods = comps.join(F.broadcast(cb_arr), ["sub", "i"]).select(
        "vec_id",
        "sub",
        (F.col("q") * F.col("q")).alias("q2"),
        F.transform("cqs", lambda cq: cq * F.col("q")).alias("px"),
    )
    dots = prods.groupBy("vec_id", "sub").agg(
        F.sum("q2").alias("qs2"),
        *[F.sum(F.col("px")[c]).alias(f"d{c}") for c in range(k)],
    )
    dists = F.array(
        *[
            F.coalesce(
                F.col("qs2") - 2 * F.col(f"d{c}") + F.col("cc2s")[c], sent
            )
            for c in range(k)
        ]
    )
    return (
        dots.join(F.broadcast(cc2_arr), "sub")
        .select(
            "vec_id",
            "sub",
            (F.array_position(dists, F.array_min(dists)) - 1)
            .cast("bigint")
            .alias("cluster"),
        )
    )


# Trained (codes, codebook) pairs cached per (corpus plan, m, k, iters)
# within a session — at production scale PQ training is a once-per-corpus
# step with stored codes; the serving queries (pq_topk / pq_recall /
# ivfpq_topk) must not each retrain the identical codebook.  Keyed by the
# corpus DataFrame's semantic hash; values are persisted DataFrames
# (materialized lazily by the first action, reused byte-identically by
# every later query in the family).
_TRAIN_CACHE: dict[tuple, tuple[DataFrame, DataFrame]] = {}


def pq_train_encode(
    vecs: DataFrame, m: int = PQ_M, k: int = PQ_K, iters: int = PQ_ITERS
) -> tuple[DataFrame, DataFrame]:
    """Train per-subspace codebooks and encode the corpus.

    Returns (codes, codebook): codes = (vec_id, sub, cluster) — m rows
    per vector, the stored index; codebook = (sub, cluster, i, cq) —
    the final refit over the codes (k*d rows).
    """
    try:
        key = (vecs.semanticHash(), m, k, iters)
    except Exception:
        key = None
    if key is not None and key in _TRAIN_CACHE:
        return _TRAIN_CACHE[key]
    comps = pq_components(vecs, m)
    assign = vecs.select(
        "vec_id",
        F.explode(F.array(*[F.lit(s) for s in range(m)])).alias("sub"),
    ).select(
        "vec_id",
        F.col("sub").cast("bigint").alias("sub"),
        (F.col("vec_id") % k).cast("bigint").alias("cluster"),
    )
    for _ in range(iters):
        assign = _assign(comps, _codebook(comps, assign), k)
    codes, cb = assign, _codebook(comps, assign)
    if key is not None:
        codes, cb = codes.persist(), cb.persist()
        _TRAIN_CACHE[key] = (codes, cb)
    return codes, cb


def pq_topk(
    vecs: DataFrame,
    query_mod: int = 100,
    k_neighbors: int = 5,
    m: int = PQ_M,
    k: int = PQ_K,
    iters: int = PQ_ITERS,
) -> DataFrame:
    """ADC top-k: PQ-coded corpus scored against full-precision queries
    through the per-query (sub, cluster) dot-product LUT.  Output:
    (query_id, neighbor_id, rank).

    Same bounded-query-batch input contract as brute_force_topk; the
    %-derived subset is the sandbox stand-in for an external batch."""
    codes, cb = pq_train_encode(vecs, m, k, iters)
    qq = pq_components(vecs.filter(F.col("vec_id") % query_mod == 0), m).withColumnRenamed(
        "vec_id", "query_id"
    )
    lut = (
        qq.join(F.broadcast(cb), ["sub", "i"])
        .groupBy("query_id", "sub", "cluster")
        .agg(F.sum(F.col("q") * F.col("cq")).alias("pdot"))
    )
    nn = cb.groupBy("sub", "cluster").agg(
        F.sum(F.col("cq") * F.col("cq")).alias("nn")
    )
    qn = qq.groupBy("query_id").agg(F.sum(F.col("q") * F.col("q")).alias("qn"))
    agg = (
        codes.withColumnRenamed("vec_id", "neighbor_id")
        .join(F.broadcast(lut), ["sub", "cluster"])
        .join(F.broadcast(nn), ["sub", "cluster"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("pdot").alias("dot"), F.sum("nn").alias("cn"))
    )
    score = (
        F.signum(F.col("dot").cast("double"))
        * (F.col("dot").cast("double") * F.col("dot").cast("double"))
        / (F.col("qn").cast("double") * F.col("cn").cast("double"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        agg.join(F.broadcast(qn), "query_id")
        .select("query_id", "neighbor_id", score.alias("score"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k_neighbors)
        .select("query_id", "neighbor_id", F.col("rank").cast("bigint").alias("rank"))
    )


def ivfpq_topk(
    vecs: DataFrame,
    query_mod: int = 100,
    k_neighbors: int = 5,
    n_probe: int = 2,
    m: int = PQ_M,
    k: int = PQ_K,
    iters: int = PQ_ITERS,
) -> DataFrame:
    """IVF-PQ: the standard billion-scale index layout — coarse-cell
    pruning composed with PQ-ADC scoring.

    Each query ranks the coarse cells (the precomputed ``label``
    assignment, integer centroids at the quantized scale — the
    ivf_multiprobe_topk recipe) and probes its ``n_probe`` nearest;
    only the CODES of vectors in probed cells are scored, through the
    same per-query (sub, cluster) LUT as pq_topk.  Candidate work is
    n_probe/C of the corpus at m rows per vector — the multiplicative
    composition of IVF's pruning and PQ's compression, with no
    full-precision corpus access on the serving path.

    Scale shape: corpus codes bucketed by cell id make the probe join
    co-located; the LUT/centroid/codebook tables are all broadcast
    constants (bounded query batch x m x k).  Output: (query_id,
    neighbor_id, rank).
    """
    codes, cb = pq_train_encode(vecs, m, k, iters)
    q = quantized(vecs)
    lab = vecs.select("vec_id", F.col("label").alias("cell"))
    cents = (
        q.join(F.broadcast(lab), "vec_id")
        .groupBy("cell", "i")
        .agg(
            F.round(F.sum("q").cast("double") / F.count(F.lit(1)), 0)
            .cast("bigint")
            .alias("ccq")
        )
    )
    qq = pq_components(vecs.filter(F.col("vec_id") % query_mod == 0), m).withColumnRenamed(
        "vec_id", "query_id"
    )
    cdiff = F.col("q") - F.col("ccq")
    dist = (
        qq.join(F.broadcast(cents), "i")
        .groupBy("query_id", "cell")
        .agg(F.sum(cdiff * cdiff).alias("d2"))
    )
    wp = Window.partitionBy("query_id").orderBy("d2", "cell")
    probe = (
        dist.withColumn("rk", F.row_number().over(wp))
        .filter(F.col("rk") <= n_probe)
        .select("query_id", "cell")
    )
    lut = (
        qq.join(F.broadcast(cb), ["sub", "i"])
        .groupBy("query_id", "sub", "cluster")
        .agg(F.sum(F.col("q") * F.col("cq")).alias("pdot"))
    )
    nn = cb.groupBy("sub", "cluster").agg(
        F.sum(F.col("cq") * F.col("cq")).alias("nn")
    )
    qn = qq.groupBy("query_id").agg(F.sum(F.col("q") * F.col("q")).alias("qn"))
    agg = (
        codes.withColumnRenamed("vec_id", "neighbor_id")
        .join(lab.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id")
        .join(F.broadcast(probe), "cell")
        .join(F.broadcast(lut), ["query_id", "sub", "cluster"])
        .join(F.broadcast(nn), ["sub", "cluster"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("pdot").alias("dot"), F.sum("nn").alias("cn"))
    )
    score = (
        F.signum(F.col("dot").cast("double"))
        * (F.col("dot").cast("double") * F.col("dot").cast("double"))
        / (F.col("qn").cast("double") * F.col("cn").cast("double"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        agg.join(F.broadcast(qn), "query_id")
        .select("query_id", "neighbor_id", score.alias("score"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k_neighbors)
        .select("query_id", "neighbor_id", F.col("rank").cast("bigint").alias("rank"))
    )


def pq_recall(vecs: DataFrame, query_mod: int = 100, k_neighbors: int = 5) -> DataFrame:
    """Quantization quality audit: per-query overlap between PQ-ADC
    top-k and exact top-k.  Output: (query_id, n_matches, recall)."""
    approx = pq_topk(vecs, query_mod, k_neighbors)
    exact = brute_force_topk(vecs, query_mod, k_neighbors)
    hits = (
        approx.select("query_id", "neighbor_id")
        .join(exact.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_matches"))
    )
    return (
        exact.select("query_id")
        .distinct()
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("n_matches"), F.lit(0)).cast("bigint").alias("n_matches"),
            F.round(
                F.coalesce(F.col("n_matches"), F.lit(0)).cast("double") / k_neighbors, 6
            ).alias("recall"),
        )
    )


def ivfpq_refine_topk(
    vecs: DataFrame,
    query_mod: int = 100,
    k_neighbors: int = 5,
    n_probe: int = 2,
    r_factor: int = 4,
    m: int = PQ_M,
    k: int = PQ_K,
    iters: int = PQ_ITERS,
) -> DataFrame:
    """FAISS-style refine stage over the IVF-PQ serving path: the ADC
    scan nominates ``k_neighbors * r_factor`` candidates per query
    (cheap, code-only), then ONLY those pairs are re-scored against the
    full-precision vectors and re-ranked to the final top-k — the
    standard IndexRefineFlat recipe that buys back most of PQ's recall
    loss for a bounded |Q|·R re-scoring cost.

    Scale shape: the candidate list is |Q|·R rows (broadcastable by the
    bounded-query-batch contract of brute_force_topk); the corpus
    component table is touched ONCE, pruned by the broadcast candidate
    join before any d-dim work, so full-precision access is R vectors
    per query instead of the whole corpus.  Output: (query_id,
    neighbor_id, rank)."""
    cand = ivfpq_topk(
        vecs, query_mod, k_neighbors * r_factor, n_probe, m, k, iters
    ).select("query_id", "neighbor_id")
    comp = quantized(vecs)
    qq = comp.filter(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("query_id"), "i", F.col("q").alias("qa")
    )
    nb = comp.select(
        F.col("vec_id").alias("neighbor_id"), "i", F.col("q").alias("qb")
    )
    dots = (
        nb.join(F.broadcast(cand), "neighbor_id")
        .join(F.broadcast(qq), ["query_id", "i"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum(F.col("qa") * F.col("qb")).alias("dot"))
    )
    qn = qq.groupBy("query_id").agg(F.sum(F.col("qa") * F.col("qa")).alias("qn"))
    cn = (
        nb.join(F.broadcast(cand.select("neighbor_id").distinct()), "neighbor_id")
        .groupBy("neighbor_id")
        .agg(F.sum(F.col("qb") * F.col("qb")).alias("cn"))
    )
    score = (
        F.signum(F.col("dot").cast("double"))
        * (F.col("dot").cast("double") * F.col("dot").cast("double"))
        / (F.col("qn").cast("double") * F.col("cn").cast("double"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), "neighbor_id")
    return (
        dots.join(F.broadcast(qn), "query_id")
        .join(F.broadcast(cn), "neighbor_id")
        .select("query_id", "neighbor_id", score.alias("score"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k_neighbors)
        .select(
            "query_id", "neighbor_id", F.col("rank").cast("bigint").alias("rank")
        )
    )
