"""Similarity search over embedding columns (array<float>).

North-star operators (BASELINE.json): brute-force cosine top-k as the
correctness baseline, and an IVF-style bucketed variant as the scale path
(search only the probe's coarse cell — here the precomputed `label`
assignment plays the centroid-assignment role; a real deployment would
k-means its own centroids and broadcast them).

Determinism design: floating-point summation order differs between
engines, so scores use **quantized integer arithmetic** — each float is
scaled to a bigint (round(x*1000)), dot products and norms are exact
integer sums (order-independent), and the final score is one double
division of identical integers — bit-identical in Spark and DuckDB.

Scale notes: the unnested (id, i, q) layout makes the dot product a
sum over a pair join on dimension index — for 100 TB the query side is
tiny and broadcast; the corpus side stays columnar until the explode,
which AQE pipelines with the partial aggregation.  Brute force is
O(|Q|·|C|·d); the IVF variant divides |C| by the cell count.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

SCALE = 1000


def _parallel(df: DataFrame) -> DataFrame:
    """Single-file corpora read as one partition — spread the explode/
    multiply work across cores; identity when splits >= cores
    (plans.parallel)."""
    from oracdc_spark.plans.parallel import ensure_parallelism

    return ensure_parallelism(df)


def quantized(vecs: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Unnest embeddings to exact integer components: (id, i, q)."""
    return _parallel(vecs).select(
        F.col(id_col),
        F.posexplode(vec_col).alias("i", "x"),
    ).select(
        id_col,
        "i",
        F.round(F.col("x").cast("double") * SCALE, 0).cast("bigint").alias("q"),
    )


def _norms(q: DataFrame, id_col: str) -> DataFrame:
    return q.groupBy(id_col).agg(F.sum(F.col("q") * F.col("q")).alias("norm2"))


def qcos_score(dot: str = "dot", qn: str = "qn", cn: str = "cn"):
    """The engine's quantized-cosine score expression —
    sign(dot)·dot²/(qn·cn) over exact-integer columns, one IEEE
    division — shared so every consumer (similarity, PQ, time-series
    profiles) computes the bit-identical contract the oracles mirror.

    Zero-norm inputs (an all-zero vector/profile has no direction)
    score NULL, not an error: under Spark 4's ANSI mode even a DOUBLE
    division by zero raises DIVIDE_BY_ZERO, while DuckDB — and
    therefore every oracle, which computes this same expression —
    returns NULL there.  The conditional makes both engines agree:
    NULL scores sort last under the family's (score DESC, id) windows
    in BOTH engines (each defaults to NULLS LAST on DESC) and drop out
    of >= threshold filters.  Found by the user-similarity replay
    property on a two-user all-zero-value corpus (a crash the sf
    corpora, which have no zero-norm rows, could never surface).

    Contract note (r10, ADVICE item 2): sorting last does NOT exclude
    NULL-scored neighbors from top-k consumers — when a query has
    fewer than k non-NULL candidates, row_number still assigns the
    trailing ranks to zero-norm rows, so they MAY appear as trailing
    top-k entries.  This is deliberate: every DuckDB oracle replays the
    same (score DESC, id) ROW_NUMBER window and serves the identical
    trailing rows, so filtering them on one side only would break
    parity, and filtering on both would change k's meaning from
    "k window slots" to "k scoreable neighbors" for every consumer.
    tests/test_similarity_properties.py::test_null_score_topk_parity
    pins the cross-engine agreement on exactly this edge (no sf corpus
    has zero-norm rows, so only a synthetic corpus exercises it)."""
    denom = F.col(qn).cast("double") * F.col(cn).cast("double")
    return F.when(
        denom != 0,
        F.signum(F.col(dot).cast("double"))
        * (F.col(dot).cast("double") * F.col(dot).cast("double"))
        / denom,
    )


def cosine_scores(
    queries: DataFrame, corpus: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """All-pairs quantized-cosine scores.

    score = sign(dot) * dot² / (|a|²·|b|²) — monotonic in cosine, exact
    integers until one final double division. Output: (query_id,
    neighbor_id, score).
    """
    qq = quantized(queries, id_col, vec_col).withColumnRenamed(id_col, "query_id")
    cq = quantized(corpus, id_col, vec_col).withColumnRenamed(id_col, "neighbor_id")
    dots = (
        F.broadcast(qq)
        .join(cq, "i")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum(qq["q"] * cq["q"]).alias("dot"))
    )
    qn = _norms(qq, "query_id").withColumnRenamed("norm2", "qn")
    cn = _norms(cq, "neighbor_id").withColumnRenamed("norm2", "cn")
    score = qcos_score()
    return (
        dots.join(F.broadcast(qn), "query_id")
        .join(cn, "neighbor_id")
        .select("query_id", "neighbor_id", score.alias("score"))
    )


# Exact top-k results cached per (corpus plan, query_mod, k) within a
# session — every ANN recall/purity audit (pq_recall x4 splits,
# opq_learned_audit's legs, ann_label_purity, sq8/ivf recalls) shares
# the SAME ground truth; recomputing the O(|Q|*|C|*d) scan per audit
# is pure waste.  Same convention as pq._TRAIN_CACHE.
_EXACT_CACHE: dict[tuple, DataFrame] = {}


def brute_force_topk(
    vecs: DataFrame, query_mod: int = 100, k: int = 5, cache: bool = False
) -> DataFrame:
    """Top-k cosine neighbors for the query subset (vec_id % query_mod == 0)
    against the full corpus. Output: (query_id, neighbor_id, rank).

    Input contract at scale: the query side must be a BOUNDED batch
    (user queries, an eval set — ~1e3..1e5 rows); the %-derived subset
    is the sandbox stand-in for that external batch.  Brute force is
    O(|Q|·|C|·d) with the queries broadcast — if the query load itself
    is corpus-sized, this operator is the wrong tool (use
    embedding_near_dups' banded self-join instead).

    ``cache=True`` persists the result under a (corpus plan, query_mod,
    k) key so every ANN recall/purity AUDIT shares one ground-truth
    computation — callers that consume the result exactly once (the
    serving-path query, the bench) leave it False: persisting a
    single-use result is pure materialization overhead (r8 — the r7
    unconditional persist showed up as a ~1 s bruteforce bench
    regression with no reuse to pay for it)."""
    try:
        key = (vecs.semanticHash(), query_mod, k)
    except Exception:
        key = None
    if key is not None and key in _EXACT_CACHE:
        return _EXACT_CACHE[key]
    queries = vecs.filter(F.col("vec_id") % query_mod == 0)
    scores = cosine_scores(queries, vecs)
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    out = (
        scores.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("bigint").alias("rank"))
    )
    if cache and key is not None:
        out = out.persist()
        _EXACT_CACHE[key] = out
    return out


def ivf_topk(vecs: DataFrame, query_mod: int = 100, k: int = 3) -> DataFrame:
    """IVF-bucketed ANN: search only the query's coarse cell (`label`).

    At scale: corpus pre-partitioned (bucketed) by cell id → the candidate
    join is co-located, no corpus shuffle per query batch.  Same bounded
    query-batch input contract as brute_force_topk — the broadcast hint
    assumes |Q| is an external batch, not a corpus fraction; the
    %-derived subset here is the sandbox stand-in.
    """
    queries = vecs.filter(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("cell"), F.col("embedding").alias("qe")
    )
    cand = _parallel(vecs).select(
        F.col("vec_id").alias("neighbor_id"), F.col("label").alias("cell"), "embedding"
    )
    pairs = F.broadcast(queries).join(cand, "cell").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    qq = pairs.select(
        "query_id", "neighbor_id",
        F.posexplode(F.zip_with("qe", "embedding", lambda a, b: F.struct(a.alias("a"), b.alias("b")))).alias("i", "p"),
    ).select(
        "query_id", "neighbor_id",
        F.round(F.col("p.a").cast("double") * SCALE, 0).cast("bigint").alias("qa"),
        F.round(F.col("p.b").cast("double") * SCALE, 0).cast("bigint").alias("qb"),
    )
    agg = qq.groupBy("query_id", "neighbor_id").agg(
        F.sum(F.col("qa") * F.col("qb")).alias("dot"),
        F.sum(F.col("qa") * F.col("qa")).alias("qn"),
        F.sum(F.col("qb") * F.col("qb")).alias("cn"),
    )
    score = qcos_score()
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        agg.select("query_id", "neighbor_id", score.alias("score"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("bigint").alias("rank"))
    )


def ivf_multiprobe_topk(
    vecs: DataFrame, query_mod: int = 100, k: int = 3, n_probe: int = 2
) -> DataFrame:
    """Multi-probe IVF: each query searches its `n_probe` NEAREST cells
    by centroid distance instead of only its own cell — the standard
    recall/cost knob of an IVF index (FAISS nprobe).  Probing 2 of C
    cells multiplies candidate work by 2/C of the corpus, not 2x, and
    recovers the neighbors that fell just across a cell boundary
    (test_similarity asserts recall(multiprobe) >= recall(single)).

    Determinism: centroids are rounded to integers at the quantized
    scale, so cell distances are exact integer sums — the probe-set
    ranking can never fork engines; the rescoring reuses the quantized
    cosine contract.

    Scale shape: the centroid table is (C x d) rows — a true broadcast
    constant; cell ranking is one narrow aggregate over query dims; the
    candidate join stays cell-bucketed (co-located when the corpus is
    bucketed by cell id)."""
    q = quantized(vecs)
    lab = vecs.select("vec_id", F.col("label").alias("cell"))
    # integer centroids at the quantized scale: one division + round of
    # identical doubles — engine-exact
    cents = (
        q.join(F.broadcast(lab), "vec_id")
        .groupBy("cell", "i")
        .agg(
            F.round(F.sum("q").cast("double") / F.count(F.lit(1)), 0)
            .cast("bigint")
            .alias("cq")
        )
    )
    qd = q.filter(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("query_id"), "i", "q"
    )
    diff = F.col("q") - F.col("cq")
    dist = (
        qd.join(F.broadcast(cents), "i")
        .groupBy("query_id", "cell")
        .agg(F.sum(diff * diff).alias("d2"))
    )
    wp = Window.partitionBy("query_id").orderBy("d2", "cell")
    probe = (
        dist.withColumn("rk", F.row_number().over(wp))
        .filter(F.col("rk") <= n_probe)
        .select("query_id", "cell")
    )
    cand = _parallel(vecs).select(
        F.col("vec_id").alias("neighbor_id"), F.col("label").alias("cell"), "embedding"
    )
    queries = vecs.filter(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    pairs = (
        F.broadcast(probe)
        .join(cand, "cell")
        .join(F.broadcast(queries), "query_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    qq = pairs.select(
        "query_id", "neighbor_id",
        F.posexplode(F.zip_with("qe", "embedding", lambda a, b: F.struct(a.alias("a"), b.alias("b")))).alias("i", "p"),
    ).select(
        "query_id", "neighbor_id",
        F.round(F.col("p.a").cast("double") * SCALE, 0).cast("bigint").alias("qa"),
        F.round(F.col("p.b").cast("double") * SCALE, 0).cast("bigint").alias("qb"),
    )
    agg = qq.groupBy("query_id", "neighbor_id").agg(
        F.sum(F.col("qa") * F.col("qb")).alias("dot"),
        F.sum(F.col("qa") * F.col("qa")).alias("qn"),
        F.sum(F.col("qb") * F.col("qb")).alias("cn"),
    )
    score = qcos_score()
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        agg.select("query_id", "neighbor_id", score.alias("score"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("bigint").alias("rank"))
    )


def cell_centroids(vecs: DataFrame) -> DataFrame:
    """IVF cell centroids: exact per-dimension mean over each coarse
    cell — the (re)training step of the IVF index.  Quantized-integer
    sums → double division keeps it engine-deterministic; output is the
    unnested (cell, i, centroid) form, the layout the assignment join
    consumes at scale (no array rebuild shuffle)."""
    q = quantized(vecs)
    lab = vecs.select(F.col("vec_id"), F.col("label").alias("cell"))
    return (
        q.join(F.broadcast(lab), "vec_id")
        .groupBy("cell", "i")
        .agg(
            (F.sum("q").cast("double") / F.count(F.lit(1)) / SCALE).alias("centroid"),
            F.count(F.lit(1)).alias("n_vectors"),
        )
        .select(
            "cell",
            # 1-based dimension index in the output (posexplode is 0-based)
            (F.col("i") + 1).cast("bigint").alias("i"),
            "centroid",
            "n_vectors",
        )
    )


CELL_CENTROIDS_SQL = """
WITH qv AS (
  SELECT vec_id, label AS cell, i,
         CAST(round(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT) AS q
  FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS t(i)
)
SELECT cell, CAST(i AS BIGINT) AS i,
       CAST(SUM(q) AS DOUBLE) / COUNT(*) / 1000 AS centroid,
       CAST(COUNT(*) AS BIGINT) AS n_vectors
FROM qv GROUP BY cell, i
"""


# Random-hyperplane LSH inside cells (round-2 verdict item 7).  The
# hyperplanes are *arithmetic* pseudo-random vectors — component (b, i)
# is ((1009·b + 9173·i) mod 2003) − 1001 over the 0-based dimension
# index — exact integers, so Spark and the DuckDB oracle compute
# IDENTICAL signatures (no RNG to synchronize).
LSH_TOTAL_BITS = 8
LSH_BANDS = 2          # bits split into 2 bands of 4; candidates agree
LSH_BITS_PER_BAND = LSH_TOTAL_BITS // LSH_BANDS  # on >= 1 full band


def _hyperplane(b: int):
    """Integer hyperplane component for bit b at 0-based dimension i."""
    return ((F.lit(1009 * b) + F.lit(9173) * F.col("i")) % 2003) - 1001


def lsh_signatures(q: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """Per-vector band values from sign(v·r_b): (id, band0, band1).
    One groupBy on the id — the shuffle the pipeline already needs."""
    sums = q.groupBy(id_col).agg(
        *[
            F.sum(F.col("q") * _hyperplane(b)).alias(f"s{b}")
            for b in range(LSH_TOTAL_BITS)
        ]
    )
    bands = []
    for k in range(LSH_BANDS):
        expr = F.lit(0)
        for j in range(LSH_BITS_PER_BAND):
            bit = (F.col(f"s{k * LSH_BITS_PER_BAND + j}") >= 0).cast("int")
            expr = expr + (bit * (1 << j))
        bands.append(expr.alias(f"band{k}"))
    return sums.select(id_col, *bands)


def embedding_near_dups(vecs: DataFrame, threshold_score: float = 0.16) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-bucketed inside cells.

    Candidate generation is NOT all-pairs-per-cell (quadratic in cell
    size — a hot cell explodes the stage, round-1 verdict wrong-item 4):
    each vector gets an 8-bit hyperplane signature split into 2 bands,
    and only pairs sharing (cell, band value) are scored.  Pair count is
    bounded by Σ_buckets |bucket|² where every cell splits into ≤ 2^4
    buckets per band — a hot cell of n vectors costs ≤ 2·(n/16)²·16 =
    n²/8 comparisons in the uniform case and degrades gracefully under
    AQE skew splitting, vs n² before.  Recall is the standard LSH
    trade-off: pairs must agree on at least one band.

    threshold_score is in quantized-score space (cos² with sign), i.e.
    0.16 ≈ |cos| ≥ 0.4.  Output: (v1, v2, score), v1 < v2, score exact
    (candidates are re-scored with the full quantized cosine).
    """
    # r12 (guide §2.4): the component table feeds the signature
    # aggregate AND both rescoring sides (3 corpus explodes), and the
    # signature relation feeds both sides of every band bucket join
    # (2·bands references) — materialized once each; A/B at sf0.1
    # (min of 3 warm probes) 3.9 → 2.2 s for similarity_near_dups.
    q = quantized(vecs).localCheckpoint(eager=False)
    lab = vecs.select("vec_id", F.col("label").alias("cell"))
    sig = lsh_signatures(q).join(lab, "vec_id").localCheckpoint(eager=False)

    cands = None
    for k in range(LSH_BANDS):
        a = sig.select(
            F.col("vec_id").alias("v1"), "cell", F.col(f"band{k}").alias("bv")
        )
        b = sig.select(
            F.col("vec_id").alias("v2"), "cell", F.col(f"band{k}").alias("bv")
        )
        c = a.join(b, ["cell", "bv"]).filter(F.col("v1") < F.col("v2")).select("v1", "v2")
        cands = c if cands is None else cands.unionAll(c)
    cands = cands.distinct()

    qa = q.select(F.col("vec_id").alias("v1"), "i", F.col("q").alias("qa"))
    qb = q.select(F.col("vec_id").alias("v2"), "i", F.col("q").alias("qb"))
    comps = cands.join(qa, "v1").join(qb, ["v2", "i"])
    agg = comps.groupBy("v1", "v2").agg(
        F.sum(F.col("qa") * F.col("qb")).alias("dot"),
        F.sum(F.col("qa") * F.col("qa")).alias("n1"),
        F.sum(F.col("qb") * F.col("qb")).alias("n2"),
    )
    score = qcos_score(qn="n1", cn="n2")
    return agg.select("v1", "v2", score.alias("score")).filter(
        F.col("score") >= threshold_score
    )


# ---------------------------------------------------------------------------
# SQ8 scalar quantization — the embedding STORAGE scale path
# ---------------------------------------------------------------------------
#
# At 100 TB the dominant embedding cost is storage + scan bandwidth:
# float32 vectors at billions of rows. Scalar quantization (SQ8) stores
# one byte per dimension (4× reduction; the standard FAISS SQ8 scheme):
# per-dimension affine codes c = round((x - mn) * 255 / (mx - mn)) from
# corpus min/max, search decodes codes back (asymmetric distance
# computation: full-precision query vs decoded corpus) and rescoring
# recovers accuracy.  Training = ONE aggregation over the corpus (per-dim
# min/max, d rows — broadcastable); encode/decode are narrow maps.
#
# Determinism: codes are exact integers; decoded values re-enter the
# quantized-integer dot-product framework (round(x*SCALE) bigints), so
# scores stay engine-exact and the DuckDB oracle matches bit-for-bit.

SQ8_LEVELS = 255


def sq8_components(vecs: DataFrame) -> DataFrame:
    """(vec_id, i, x): unnested double components (0-based i)."""
    return _parallel(vecs).select(
        "vec_id", F.posexplode("embedding").alias("i", "x")
    ).select("vec_id", "i", F.col("x").cast("double").alias("x"))


def sq8_train(comps: DataFrame) -> DataFrame:
    """Per-dimension codebook: (i, mn, mx) — one corpus aggregation."""
    return comps.groupBy("i").agg(F.min("x").alias("mn"), F.max("x").alias("mx"))


def sq8_encode(comps: DataFrame, stats: DataFrame) -> DataFrame:
    """(vec_id, i, c): one-byte affine codes. The codebook is d rows —
    always broadcast."""
    c = F.when(
        F.col("mx") > F.col("mn"),
        F.round((F.col("x") - F.col("mn")) * SQ8_LEVELS / (F.col("mx") - F.col("mn")), 0),
    ).otherwise(F.lit(0.0))
    return comps.join(F.broadcast(stats), "i").select(
        "vec_id", "i", c.cast("int").alias("c")
    )


def sq8_decoded(codes: DataFrame, stats: DataFrame) -> DataFrame:
    """Decode codes to quantized-integer components (vec_id, i, q):
    q = round((mn + c*(mx-mn)/255) * SCALE) — same integer domain as
    `quantized`, so the scoring machinery is shared."""
    dec = (F.col("mn") + F.col("c") * (F.col("mx") - F.col("mn")) / SQ8_LEVELS) * SCALE
    return codes.join(F.broadcast(stats), "i").select(
        "vec_id", "i", F.round(dec, 0).cast("bigint").alias("q")
    )


def sq8_topk(vecs: DataFrame, query_mod: int = 100, k: int = 5) -> DataFrame:
    """ADC top-k: full-precision (quantized-integer) queries against the
    SQ8-decoded corpus. Same plan shape as brute force — the decode adds
    one broadcast join, no extra shuffle."""
    comps = sq8_components(vecs)
    stats = sq8_train(comps)
    corpus_q = sq8_decoded(sq8_encode(comps, stats), stats).withColumnRenamed(
        "vec_id", "neighbor_id"
    )
    qq = quantized(vecs.filter(F.col("vec_id") % query_mod == 0)).withColumnRenamed(
        "vec_id", "query_id"
    )
    dots = (
        F.broadcast(qq)
        .join(corpus_q, "i")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum(qq["q"] * corpus_q["q"]).alias("dot"))
    )
    qn = _norms(qq, "query_id").withColumnRenamed("norm2", "qn")
    cn = _norms(corpus_q, "neighbor_id").withColumnRenamed("norm2", "cn")
    score = qcos_score()
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        dots.join(F.broadcast(qn), "query_id")
        .join(cn, "neighbor_id")
        .select("query_id", "neighbor_id", score.alias("score"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("bigint").alias("rank"))
    )


def sq8_recall(vecs: DataFrame, query_mod: int = 100, k: int = 5) -> DataFrame:
    """Quantization quality audit: per-query overlap between SQ8 top-k
    and exact top-k. Output: (query_id, n_matches, recall)."""
    approx = sq8_topk(vecs, query_mod, k)
    exact = brute_force_topk(vecs, query_mod, k, cache=True)
    hits = (
        approx.join(exact.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_matches"))
    )
    all_q = exact.select("query_id").distinct()
    return all_q.join(hits, "query_id", "left").select(
        "query_id",
        F.coalesce("n_matches", F.lit(0)).cast("bigint").alias("n_matches"),
        F.round(F.coalesce("n_matches", F.lit(0)).cast("double") / k, 6).alias("recall"),
    )


def hard_negatives(
    vecs: DataFrame, query_mod: int = 100, k: int = 5
) -> DataFrame:
    """Hard-negative mining for contrastive training: per query, the
    top-k most-similar vectors with a DIFFERENT label — the negatives
    that sit closest to the decision boundary, the standard
    dense-retriever / embedding-finetune training-set builder (cf. DPR,
    sentence-transformers' mine_hard_negatives).

    Same bounded-query-batch contract and quantized-cosine scoring as
    brute_force_topk; the label-mismatch predicate pushes into the
    broadcast join (codegen filter before the score aggregate).  At
    corpus scale swap the exact scan for the IVF/PQ candidates exactly
    as ivfpq_refine_topk does — the ranking contract is unchanged.

    Output: (query_id, negative_id, rank)."""
    labeled = vecs.select("vec_id", "label")
    queries = vecs.filter(F.col("vec_id") % query_mod == 0)
    scores = (
        cosine_scores(queries, vecs)
        .join(
            F.broadcast(
                labeled.select(
                    F.col("vec_id").alias("query_id"),
                    F.col("label").alias("qlabel"),
                )
            ),
            "query_id",
        )
        .join(
            labeled.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("label").alias("nlabel"),
            ),
            "neighbor_id",
        )
        .filter(F.col("qlabel") != F.col("nlabel"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("neighbor_id").alias("negative_id"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


def norm_outliers(
    vecs: DataFrame, pct: int = 1, bin_div: int = 100_000
) -> DataFrame:
    """Embedding QC: flag the bottom and top ``pct`` percent of vectors
    by exact norm² — near-zero norms are broken/padded embeddings,
    extreme norms are encoder blowups; both poison cosine ANN and
    SemDeDup decisions, so real pipelines trim them before indexing.

    Rank-based trim (no value thresholds, so ties are unambiguous):
    the exact global rank over (norm2 asc, vec_id asc) decomposes over
    a coarse norm2 // bin_div histogram exactly like
    textops.perplexity_buckets — (vectors in strictly-lower bins) +
    (rank within own bin) — so there is NO global sort: the bin
    histogram is metadata-sized, the rank window partitions by bin.
    Outlier predicates compare in pure integers: low iff
    100*rn <= pct*n, high iff 100*rn > (100-pct)*n.

    Output: (vec_id, norm2, rn, side) for flagged vectors only.

    Scale shape: one corpus norm aggregate, one bin-partitioned rank
    window, broadcast 1-row/tiny histogram aggregates; degenerate
    norm concentration re-spreads with a smaller bin_div (the knob is
    the contract)."""
    norms = quantized(vecs).groupBy("vec_id").agg(
        F.sum(F.col("q") * F.col("q")).alias("norm2")
    )
    binned = norms.withColumn("bin", (F.col("norm2") / bin_div).cast("bigint"))
    hist = binned.groupBy("bin").agg(F.count(F.lit(1)).alias("bn"))
    wb = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, -1)
    lower = hist.select(
        "bin",
        F.coalesce(F.sum("bn").over(wb), F.lit(0)).cast("bigint").alias("lower_total"),
    )
    total = norms.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    wi = Window.partitionBy("bin").orderBy("norm2", "vec_id")
    ranked = (
        binned.join(F.broadcast(lower), "bin")
        .withColumn("rn", (F.col("lower_total") + F.row_number().over(wi)).cast("bigint"))
        .crossJoin(F.broadcast(total))
    )
    low = 100 * F.col("rn") <= pct * F.col("n")
    high = 100 * F.col("rn") > (100 - pct) * F.col("n")
    return (
        ranked.filter(low | high)
        .select(
            "vec_id",
            "norm2",
            "rn",
            F.when(low, F.lit("low")).otherwise(F.lit("high")).alias("side"),
        )
    )


def matryoshka_recall(
    vecs: DataFrame,
    query_mod: int = 100,
    k: int = 5,
    dims: tuple = (32, 16, 8),
) -> DataFrame:
    """Matryoshka prefix-truncation recall audit (Kusupati et al.,
    "Matryoshka Representation Learning", NeurIPS 2022): recall@k of
    the exact search restricted to the FIRST ``d`` vector components
    against the full-dimension exact top-k, one row per (dims, query).
    The production question it answers: how far can stored vectors be
    truncated for the cheap first-stage scan before recall collapses —
    MRL's adaptive-retrieval deployment nominates with a d/4 prefix and
    re-ranks survivors at full width (ivfpq_refine_topk's recipe with
    truncation playing PQ's role).

    Honest scale note: F.slice on an array column cuts COMPUTE per
    comparison but not parquet bytes (array elements are not
    column-pruned); a real MRL deployment stores the prefix as its own
    column so the narrow scan also reads d/dim of the bytes.  The
    ranking contract — quantize, integer dots, one IEEE division — is
    unchanged, so truncated and full scores share the oracle
    convention, and truncating commutes with quantizing (both are
    per-component).

    Output: (dims, query_id, n_matches, recall)."""
    exact = brute_force_topk(vecs, query_mod, k, cache=True)
    qids = exact.select("query_id").distinct()
    out = None
    for d in dims:
        trunc = vecs.select(
            "vec_id", F.slice("embedding", 1, int(d)).alias("embedding")
        )
        approx = brute_force_topk(trunc, query_mod, k)
        hits = (
            approx.select("query_id", "neighbor_id")
            .join(
                exact.select("query_id", "neighbor_id"),
                ["query_id", "neighbor_id"],
            )
            .groupBy("query_id")
            .agg(F.count(F.lit(1)).alias("n_matches"))
        )
        row = qids.join(hits, "query_id", "left").select(
            F.lit(int(d)).cast("bigint").alias("dims"),
            "query_id",
            F.coalesce("n_matches", F.lit(0)).cast("bigint").alias("n_matches"),
            F.round(
                F.coalesce("n_matches", F.lit(0)).cast("double") / k, 6
            ).alias("recall"),
        )
        out = row if out is None else out.unionAll(row)
    return out


def decontamination_screen(
    vecs: DataFrame, eval_mod: int = 100, threshold_score: float = 0.16
) -> DataFrame:
    """Embedding-space eval-contamination screen: every TRAIN vector
    whose quantized-cosine score against its nearest EVAL vector clears
    the threshold is reported with that eval item — the semantic
    complement of the n-gram ``text_contamination`` gate (n-gram
    overlap after Brown et al. 2020 catches verbatim leakage; the
    embedding screen catches paraphrased leakage the lexical gate
    misses).  The ``vec_id % eval_mod == 0`` subset stands in for the
    held-out benchmark batch, same bounded-batch contract as
    brute_force_topk's query set.

    Scale shape: identical to the brute-force serving path — the
    bounded eval batch broadcasts, the train corpus streams through ONE
    component join and one per-train-vector aggregate; no corpus×corpus
    work.  At 100 TB with a large benchmark suite, swap the exact scan
    for IVF/PQ candidates exactly as ivfpq_refine_topk does.

    Output: (vec_id, eval_id, score) — one row per contaminated train
    vector, its nearest eval item (ties break on lower eval_id), score
    rounded to 6."""
    evalset = vecs.filter(F.col("vec_id") % eval_mod == 0)
    train = vecs.filter(F.col("vec_id") % eval_mod != 0)
    scores = cosine_scores(evalset, train)
    w = Window.partitionBy("neighbor_id").orderBy(
        F.col("score").desc(), F.col("query_id")
    )
    return (
        scores.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("score") >= threshold_score))
        .select(
            F.col("neighbor_id").alias("vec_id"),
            F.col("query_id").alias("eval_id"),
            F.round(F.col("score"), 6).alias("score"),
        )
    )


def ivf_nprobe_curve(
    vecs: DataFrame,
    query_mod: int = 100,
    k: int = 5,
    n_probes: tuple = (1, 2, 3, 4),
) -> DataFrame:
    """The IVF tuning curve: recall@k of :func:`ivf_multiprobe_topk`
    against the exact top-k for each ``n_probe`` value — the FAISS
    nprobe sweep every deployment runs before pinning its serving
    config (candidate work scales with n_probe/C while recall
    saturates; the knee of this curve IS the operating point).  Same
    audit-the-approximation discipline as sq8/pq/hyperplane recall,
    following the family convention that structures with a tunable
    capture knob ship the CURVE, not one point.

    Output: (n_probe, n_queries, n_matches, recall) — one row per
    sweep value; recall = n_matches / (k · n_queries), rounded 6."""
    exact = brute_force_topk(vecs, query_mod, k, cache=True)
    nq = exact.agg(
        F.countDistinct("query_id").cast("bigint").alias("n_queries")
    )
    out = None
    for p in n_probes:
        approx = ivf_multiprobe_topk(vecs, query_mod, k, n_probe=int(p))
        m = (
            approx.select("query_id", "neighbor_id")
            .join(
                exact.select("query_id", "neighbor_id"),
                ["query_id", "neighbor_id"],
            )
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_matches"))
        )
        # empty-corpus PRECONDITION, stated plainly in-plan (the uniform
        # r10 rule for the planted/training audits, pq.train's
        # ValueError precedent translated to lazy builders: recall of
        # zero queries is undefined, and the unguarded division would
        # surface as a deep ANSI DIVIDE_BY_ZERO instead of the cause)
        row = m.crossJoin(F.broadcast(nq)).select(
            F.lit(int(p)).cast("bigint").alias("n_probe"),
            "n_queries",
            "n_matches",
            F.when(
                F.col("n_queries") == 0,
                F.raise_error(
                    F.lit(
                        "ivf_nprobe_curve: no query vectors selected — "
                        "vec_id % query_mod == 0 matched zero rows (empty "
                        "or too-sparse embeddings table; audit precondition)"
                    )
                ).cast("double"),
            )
            .otherwise(
                F.round(
                    F.col("n_matches").cast("double")
                    / (k * F.col("n_queries").cast("double")),
                    6,
                )
            )
            .alias("recall"),
        )
        out = row if out is None else out.unionAll(row)
    return out
