"""Product quantization (PQ) ANN: interleaved-subspace codebooks,
corpus codes, asymmetric-distance (ADC) top-k, and a recall audit.

Role in the engine: completes the ANN ladder in
``operators/similarity.py`` — brute force (exact baseline), IVF /
IVF-multiprobe (coarse pruning), SQ8 (4x storage compression) — with
the standard FAISS-style scale path for billion-vector corpora: PQ
compresses each vector to ``m`` one-byte codes (here m=16 over 64 dims:
16x compression vs float32) and query scoring never touches the
original vectors, only a per-query lookup table of size m*k.

Decomposition (the ``split`` knob, four members):
- "interleave" (default): dimension ``i`` (0-based) belongs to subspace
  ``i % m`` — needs no knowledge of the vector length (works on
  ragged/unknown-d corpora; the SQL oracle mirrors it as ``(i-1) % m``
  over DuckDB's 1-based UNNEST index).
- "wht": fixed Walsh-Hadamard pre-rotation (opq_components) ahead of
  the interleaved split — the structured stand-in for OPQ's learned
  rotation, energy-spreading across subspaces.
- "balanced": variance-balanced dimension permutation
  (_balanced_alloc) — OPQ-P eigenvalue allocation reduced to its
  exact-integer diagonal form, trained on the same bounded sample as
  the codebooks and pinned as a d-row broadcast.
- "learned": full OPQ-NP alternating minimization (_opq_learn_rotation)
  — driver-side numpy fit, int64-quantized rotation; rows-only (SVD has
  no SQL oracle), shipped through opq_learned_audit's MSE-vs-recall
  curve.

Training is per-subspace Lloyd k-means with the exact-integer recipe
of ``operators/clustering.py`` (quantized bigint components,
floor-mean centroids, integer squared distances, argmin ties on the
lower cluster id — no RNG to synchronize), run for a fixed ``iters``
DRIVER-SIDE over a bounded ``vec_id % sample_mod == 0`` sample (the
FAISS practice — k-means needs ~hundreds of points per centroid, not
the corpus).  The codebook is the refit over the sample's final
assignment; codes are one distributed encode pass of the whole corpus
against the literal codebook.

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

Scale shape (100 TB): training touches only the bounded sample (one
collect of sample components, then driver numpy); encoding is ONE
corpus pass against the broadcast codebook; the serving-path state is
codes (m bigints per vector, stored once) plus the k*d codebook.  The ADC
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

from oracdc_spark.operators.similarity import brute_force_topk, qcos_score, quantized
from oracdc_spark.plans.literal import local_df

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


OPQ_D = 64          # OPQ pre-rotation operates on the true vector length
                    # (H is d x d); unlike the interleaved raw split it
                    # cannot be ragged-agnostic.  d MUST be a power of 2:
                    # the unnormalized Walsh-Hadamard transform scales
                    # every dot/norm by exactly d, and a power-of-two
                    # scale is a pure exponent shift in IEEE doubles, so
                    # quantized-cosine scores in rotated space are
                    # BIT-IDENTICAL to raw space (exact top-k ground
                    # truth carries over unchanged).


def opq_components(vecs: DataFrame, m: int = PQ_M, d: int = OPQ_D) -> DataFrame:
    """OPQ-style pre-rotation (Ge et al., CVPR 2013, simplified to a
    FIXED public orthogonal transform — no trained rotation, no RNG):
    unnormalized Walsh-Hadamard matvec over the exact-integer
    components, ``y[o] = sum_j (-1)^popcount(o & j) * q[j]``, then the
    same interleaved ``o % m`` subspace split as ``pq_components``.

    Why: PQ quantizes each subspace independently, so recall suffers
    when variance concentrates in a few raw dimensions (their subspaces
    carry all the signal, the rest quantize noise).  H mixes every
    input dimension into every output dimension, spreading energy
    evenly across subspaces — the cheap structured stand-in for OPQ's
    learned rotation (the FAISS ``OPQ`` pre-transform family).

    Exactness: H entries are +-1, so ``y`` stays an exact int64
    (|y| <= d * max|q|); H·Hᵀ = d·I means rotated dots/norms are
    exactly ``d *`` their raw values, and with d a power of 2 the
    quantized-cosine score is bit-for-bit UNCHANGED — the brute-force
    ground truth needs no rotation.  Missing trailing components (short
    vectors) contribute zero terms, i.e. implicit zero-padding to d.

    Scale shape: the H table is a d*d literal broadcast (4,096 rows at
    d=64); the matvec is one broadcast join + one (vec_id, o) partial
    aggregate — a single corpus shuffle, same as the encode pass it
    feeds.  Output: (vec_id, i, q, sub) like pq_components."""
    return _rotate_components(quantized(vecs), m, d)


def _rotate_components(comps: DataFrame, m: int = PQ_M, d: int = OPQ_D) -> DataFrame:
    """The WHT matvec on an existing exact-integer component table
    (vec_id, i, q) — split out so audits can inject synthetic
    components (planted twins) ahead of the rotation.

    Ragged / d != 64 contract: ``d`` MUST be a power of two (validated
    here — the bit-identity of rotated scores rests on the uniform
    power-of-2 dot scaling) and MUST be >= the longest vector: the H
    join is inner on j in [0, d), so components at i >= d would drop
    SILENTLY from the rotated space.  A caller with 48-dim vectors
    passes d=64 (pad-to-pow2 — the missing components contribute zero
    terms, exactly the implicit zero-padding short vectors already
    get); a caller with 100-dim vectors must pass d=128, never 64."""
    if d < 1 or (d & (d - 1)) != 0:
        raise ValueError(f"rotation width d must be a power of two, got {d}")
    spark = comps.sparkSession
    h_rows = [
        (o, j, 1 if bin(o & j).count("1") % 2 == 0 else -1)
        for o in range(d)
        for j in range(d)
    ]
    H = local_df(spark, h_rows, "io long, j long, sgn long")
    return (
        comps.withColumnRenamed("i", "j")
        .join(F.broadcast(H), "j")
        .groupBy("vec_id", "io")
        .agg(F.sum(F.col("sgn") * F.col("q")).alias("q"))
        .select(
            "vec_id",
            F.col("io").alias("i"),
            "q",
            (F.col("io") % m).cast("bigint").alias("sub"),
        )
    )


def _balanced_alloc(raw_rows, m: int = PQ_M) -> dict:
    """OPQ eigenvalue allocation (Ge et al., CVPR 2013 §4, the
    parametric OPQ-P solution) reduced to its DIAGONAL / permutation
    form: instead of a learned dense rotation, re-ALLOCATE raw
    dimensions to subspaces so per-subspace variance balances.  OPQ-P
    allocates principal directions to buckets balancing the product of
    eigenvalues; without PCA the diagonal approximation ranks raw
    dimensions by variance and deals them into subspaces in snake
    (boustrophedon) order — rank r goes to subspace ``r % m`` on even
    passes and ``m-1-(r % m)`` on odd passes, the closed-form stand-in
    for greedy balanced bin-packing (greedy is inherently sequential;
    snake is rank arithmetic, so the SQL oracle can mirror it with one
    window function).

    Exact-integer: the ranking key is the variance NUMERATOR
    ``n*sum(q^2) - sum(q)^2`` per dimension (int64 — no float mean),
    ties to the lower dimension id, computed over the SAME bounded
    training sample the Lloyd loop collects (FAISS practice: transform
    statistics train on the sample, not the corpus).  The permutation
    is orthogonal, so quantized-cosine scores are bit-identical to raw
    space and the exact ground truth needs no re-mapping.  Dimensions
    never seen in the sample get no allocation (their rows drop from
    the inner alloc join — they would quantize against untrained
    codebooks anyway); ragged vectors contribute rows only for present
    components, both mirrored by the oracle.

    Input: collected raw component rows (vec_id, i, q).  Returns
    {i: sub} — d entries of metadata, pinned as a literal broadcast."""
    stats: dict = {}
    for r in raw_rows:
        n, s, s2 = stats.get(r["i"], (0, 0, 0))
        q = r["q"]
        stats[r["i"]] = (n + 1, s + q, s2 + q * q)
    ranked = sorted(
        stats.items(), key=lambda kv: (-(kv[1][0] * kv[1][2] - kv[1][1] ** 2), kv[0])
    )
    alloc = {}
    for r0, (i, _) in enumerate(ranked):
        rnd, pos = divmod(r0, m)
        alloc[i] = pos if rnd % 2 == 0 else m - 1 - pos
    return alloc


OPQ_NP_ITERS = 4    # alternating codebook/rotation refits for the
                    # learned (OPQ-NP) rotation — fixed and bounded,
                    # like PQ_ITERS


def _opq_learn_rotation(raw_rows, m: int, k: int, lloyd_iters: int,
                        sample_mod: int, opq_iters: int = OPQ_NP_ITERS):
    """Non-parametric OPQ (Ge et al., CVPR 2013 §3, OPQ-NP): learn an
    orthogonal rotation R by alternating (a) PQ codebook training in
    the rotated space with (b) the orthogonal-Procrustes refit
    R = U·Vᵀ from SVD(Xᵀ·X̂) against the reconstruction X̂ — all
    driver-side numpy over the SAME bounded training sample the
    codebooks use (metadata-scale; the corpus is never touched).

    Float by necessity (SVD has no exact-integer form), so the learned
    split is the family's one rows-only member: the DuckDB oracle
    cannot replay an SVD, and the audit's evidence is the recall value
    itself (pytest pins learned >= interleave on the fixture).  The
    per-subspace Lloyd inside the alternation mirrors the engine
    recipe: (vec_id // sample_mod) % k seeding, argmin ties to the
    lowest cluster id, empty clusters dropped.

    The returned rotation is QUANTIZED to integers, ``R_int =
    round_half_away(R * OPQ_R_SCALE)`` — after the driver-side float
    fit, every downstream value (sample components, corpus encode,
    ADC scores) is exact int64 again, so the encode pass is
    bit-deterministic across runs and shuffle orders (a float matvec
    would round differently per partial-aggregation order).  The
    1/(2*OPQ_R_SCALE) per-entry deviation from orthogonality is far
    below quantization noise; the recall audit measures the net effect
    against the raw exact ground truth, which never needs R.

    Returns (R_int, d, mse): the d x d int64 rotation table, the width
    d = 1 + max component index seen in the sample, and the final
    sample reconstruction error ||X·R − X̂||² (the OPQ objective — at
    opq_iters=0 the init rotation is evaluated but never refit, so the
    row doubles as the fixed-rotation baseline)."""
    import numpy as np

    ids, X, d = _sample_matrix(raw_rows)
    ids_arr = np.array(ids, dtype=np.int64)
    sub_dims = [[o for o in range(d) if o % m == s] for s in range(m)]
    # init: the orthonormal Walsh-Hadamard rotation when d is a power
    # of two (start from the energy-spreading fixed rotation the WHT
    # split already proves out — on isotropic corpora an identity init
    # leaves the Procrustes step nothing to grab and the fit stalls at
    # the interleave baseline), identity otherwise
    if d >= 1 and (d & (d - 1)) == 0:
        js = np.arange(d)
        pop = np.zeros((d, d), dtype=np.int64)
        for o in range(d):
            pop[o] = np.vectorize(lambda j, o=o: bin(o & j).count("1") % 2)(js)
        R = np.where(pop == 0, 1.0, -1.0) / np.sqrt(d)
    else:
        R = np.eye(d)
    # warm-start: codebook assignments persist across the alternation
    # (only the first pass uses the deterministic id seed) — the
    # standard OPQ-NP schedule, so both halves make monotone progress
    assigns = [(ids_arr // sample_mod) % k for _ in range(m)]
    mse = 0.0
    for t in range(max(opq_iters, 1)):
        Y = X @ R
        Yhat = np.empty_like(Y)
        for s, dims in enumerate(sub_dims):
            S = Y[:, dims]
            assign = assigns[s]
            for _ in range(lloyd_iters + 1):
                clusters = np.unique(assign)
                C = np.stack([S[assign == c].mean(axis=0) for c in clusters])
                d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
                assign = clusters[np.argmin(d2, axis=1)]
            assigns[s] = assign
            clusters = np.unique(assign)
            C = np.stack([S[assign == c].mean(axis=0) for c in clusters])
            pos = np.searchsorted(clusters, assign)
            Yhat[:, dims] = C[pos]
        if t < opq_iters:
            U, _, Vt = np.linalg.svd(X.T @ Yhat)
            R = U @ Vt
            mse = float(((X @ R - Yhat) ** 2).sum())
        else:  # opq_iters == 0: evaluate the init, never refit
            mse = float(((Y - Yhat) ** 2).sum())
    return _round_half_away(R * OPQ_R_SCALE).astype(np.int64), d, mse


OPQ_R_SCALE = 1024  # learned-rotation quantization: R_int = round(R * 2^10).
                    # Rotated components bound |y| <= d * OPQ_R_SCALE *
                    # max|q| (~6.6e7 at d=64, |q|<=1000), keeping every
                    # downstream square/dot far inside int64 — the same
                    # magnitude contract as the WHT path's d* scaling.


def _collect_raw(vecs: DataFrame, sample_mod: int):
    """Collect the bounded ``vec_id % sample_mod == 0`` training sample
    as RAW ARRAY rows and quantize driver-side — the same (vec_id, i,
    q) dicts ``quantized(...).collect()`` produced, at 1/d the rows
    over the wire (r8: the exploded collect was 2.8 s of the 3.5 s
    training cost at sf0.1 — 64k Row objects for 1k vectors; arrays
    collect in ~0.2 s and expand in one numpy op).  Bit-identity with
    the executor-side ``quantized()``: float32 → float64 cast, ×
    SCALE in float64, then round half away from zero
    (:func:`_round_half_away` — Spark's F.round semantics)."""
    import numpy as np

    rows = (
        vecs.filter(F.col("vec_id") % sample_mod == 0)
        .select("vec_id", "embedding")
        .collect()
    )
    out = []
    for r in rows:
        if r["embedding"] is None:
            continue
        q = _round_half_away(
            np.asarray(r["embedding"], dtype=np.float64) * 1000.0
        ).astype("int64")
        vid = r["vec_id"]
        out.extend(
            {"vec_id": vid, "i": i, "q": int(q[i])} for i in range(len(q))
        )
    return out


def _wht_rows(raw_rows, m: int, d: int):
    """Driver-side mirror of :func:`opq_components` for the collected
    sample: the ±1 Walsh-Hadamard matvec in exact int64, then the
    o % m subspace tag — bit-identical to the executor path (H entries
    are integers; numpy int64 matmul is exact)."""
    import numpy as np

    ids, X, d_in = _sample_matrix(raw_rows)
    if d_in > d:
        raise ValueError(f"rotation width d={d} < vector length {d_in}")
    Xi = np.zeros((len(ids), d), dtype=np.int64)
    Xi[:, :d_in] = X.astype(np.int64)
    o = np.arange(d)
    H = np.empty((d, d), dtype=np.int64)
    for j in range(d):
        # H[j, o] = (-1)^popcount(o & j)
        H[j] = 1 - 2 * (np.vectorize(lambda v: bin(v).count("1"))(o & j) % 2)
    Y = Xi @ H
    return [
        {"vec_id": v, "i": oo, "q": int(Y[n, oo]), "sub": oo % m}
        for n, v in enumerate(ids)
        for oo in range(d)
    ]


def _sample_matrix(raw_rows):
    """Dense (ids, X, d) view of collected component rows — zero-filled
    for missing components (the module's ragged contract)."""
    import numpy as np

    if not raw_rows:
        # precondition, stated plainly instead of a bare max()-on-empty:
        # codebooks cannot train on zero sampled vectors (empty corpus
        # or a sample_mod coarser than the corpus)
        raise ValueError(
            "PQ training sample is empty — the embeddings table has no "
            "rows matching the sample filter; cannot train codebooks"
        )
    ids = sorted({r["vec_id"] for r in raw_rows})
    d = 1 + max(r["i"] for r in raw_rows)
    idx = {v: n for n, v in enumerate(ids)}
    X = np.zeros((len(ids), d), dtype=np.float64)
    for r in raw_rows:
        X[idx[r["vec_id"]], r["i"]] = r["q"]
    return ids, X, d


def _round_half_away(y):
    """Round half away from zero — Spark's F.round semantics, pinned on
    both the driver (sample) and executor (encode) sides so a sampled
    vector's components agree bit-for-bit between the two paths."""
    import numpy as np

    return np.sign(y) * np.floor(np.abs(y) + 0.5)


PQ_SAMPLE_MOD = 2   # training-sample stride: the codebook is trained on
                    # vectors with vec_id % PQ_SAMPLE_MOD == 0 (FAISS
                    # practice: k-means needs ~hundreds of points per
                    # centroid, not the corpus — the caller sets the
                    # stride per corpus exactly like brute_force_topk's
                    # bounded-query-batch contract)


def _lloyd_train(sample_rows, k: int, iters: int, sample_mod: int):
    """Exact-integer per-subspace Lloyd k-means on the COLLECTED sample
    components — driver-side numpy over index METADATA-scale input (the
    bounded training sample), the FAISS shape: codebooks train host-side
    on a sample, then pin as broadcast constants for the one distributed
    encode pass.

    Bit-for-bit the engine recipe (mirrored in the DuckDB oracle):
    seed cluster ``(vec_id // sample_mod) % k`` (the division keeps the
    sampled ids contiguous so the seed spreads over ALL k clusters —
    ``vec_id % k`` over a strided sample would only ever hit
    gcd-multiples), refit ``floor(double(sum)/count)``, integer squared
    distances, argmin ties to the lowest cluster id, empty clusters
    dropped from the codebook.  Returns the FINAL codebook rows
    [(sub, cluster, i, cq)] — the refit over the sample's last
    assignment (<= k*d rows)."""
    import numpy as np

    by_sub: dict = {}
    for r in sample_rows:
        by_sub.setdefault(r["sub"], {}).setdefault(r["vec_id"], {})[r["i"]] = r["q"]
    cb_rows = []
    for sub in sorted(by_sub):
        vecs_d = by_sub[sub]
        vec_ids = sorted(vecs_d)
        i_list = sorted({i for v in vecs_d.values() for i in v})
        # ragged corpora: a vector missing component i reads as 0 —
        # EXACTLY the distributed encode pass's semantics (_assigned
        # sums only present rows, and the full centroid norm cc2 makes
        # an absent component contribute (0 - cq)^2), so the module's
        # ragged/unknown-d contract survives the driver-side training
        X = np.array(
            [[vecs_d[v].get(i, 0) for i in i_list] for v in vec_ids],
            dtype=np.int64,
        )
        ids = np.array(vec_ids, dtype=np.int64)
        assign = (ids // sample_mod) % k

        def refit(assign):
            clusters = sorted(set(assign.tolist()))
            C = np.empty((len(clusters), X.shape[1]), dtype=np.int64)
            for ci, c in enumerate(clusters):
                rows = X[assign == c]
                C[ci] = np.floor(
                    rows.sum(axis=0).astype(np.float64) / rows.shape[0]
                ).astype(np.int64)
            return np.array(clusters, dtype=np.int64), C

        for _ in range(iters):
            clusters, C = refit(assign)
            d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            # np.argmin returns the FIRST min; clusters[] is ascending,
            # so ties break to the lowest cluster id
            assign = clusters[np.argmin(d2, axis=1)]
        clusters, C = refit(assign)
        for ci, c in enumerate(clusters):
            for col, i in enumerate(i_list):
                cb_rows.append((int(sub), int(c), int(i), int(C[ci, col])))
    return cb_rows


def _literal_assign_tables(spark, cb_rows, k: int):
    """Pivot codebook rows (sub, cluster, i, cq) into the two broadcast
    tables the encode pass needs, as LITERAL DataFrames built on the
    driver — no corpus lineage, no aggregation stages.  NULL slots
    where a cluster is empty for a sub feed the assignment's +inf
    sentinel:

    - cb_arr:  (sub, i)  -> array of the k clusters' centroid component
    - cc2_arr: (sub)     -> array of the k clusters' squared norms
    """
    by_si: dict = {}
    cc2: dict = {}
    for sub, cluster, i, cq in cb_rows:
        by_si.setdefault((sub, i), [None] * k)[cluster] = cq
        cc2[(sub, cluster)] = cc2.get((sub, cluster), 0) + cq * cq
    cb_arr = local_df(
        spark,
        [(s, i, v) for (s, i), v in sorted(by_si.items())],
        "sub long, i long, cqs array<long>",
    )
    subs = sorted({s for (s, _) in by_si})
    cc2_arr = local_df(
        spark,
        [(s, [cc2.get((s, c)) for c in range(k)]) for s in subs],
        "sub long, cc2s array<long>",
    )
    return cb_arr, cc2_arr


def _assigned(
    comps: DataFrame, cb_arr: DataFrame, cc2_arr: DataFrame, k: int = PQ_K
) -> DataFrame:
    """Distributed encode pass: nearest codebook centroid per (vec_id,
    sub) against the literal broadcast codebook tables — ONE corpus
    shuffle.

    Per component row, the k cross-products compute in one JVM
    ``transform`` over the broadcast (sub, i) centroid array; the
    groupBy(vec_id, sub) aggregates the k elementwise dot sums.  The
    argmin uses dist2_c = sum_q2 - 2*dot_c + cc2_c (all exact bigints)
    with empty clusters coalesced to a +inf sentinel;
    ``array_position`` of the min returns the FIRST (= lowest cluster
    id) occurrence — the (dist2 asc, cluster asc) tie-break.

    Output: (vec_id, sub, cluster)."""
    sent = F.lit((1 << 62) - 1)
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


# Trained (codes, codebook) pairs cached per (corpus plan, m, k, iters,
# sample_mod) within a session — at production scale PQ training is a
# once-per-corpus step with stored codes; the serving queries (pq_topk /
# pq_recall / ivfpq_topk) must not each retrain the identical codebook.
# Keyed by the corpus DataFrame's semantic hash; codes is the persisted
# encode pass, cb a literal DataFrame — both reused byte-identically by
# every later query in the family.
_TRAIN_CACHE: dict[tuple, tuple] = {}


_SPLIT_MODES = ("interleave", "wht", "balanced", "learned")


def _split_mode(rotate: bool, split: str | None) -> str:
    """Normalize the (rotate, split) knobs to one mode string.  The
    ``rotate`` bool predates the three-way split family and is kept as
    sugar for split="wht"; passing both inconsistently is an error, not
    a silent precedence."""
    if split is None:
        return "wht" if rotate else "interleave"
    if split not in _SPLIT_MODES:
        raise ValueError(f"split must be one of {_SPLIT_MODES}, got {split!r}")
    if rotate and split != "wht":
        raise ValueError(f"rotate=True conflicts with split={split!r}")
    return split


def _train_encode(
    vecs: DataFrame,
    m: int = PQ_M,
    k: int = PQ_K,
    iters: int = PQ_ITERS,
    sample_mod: int = PQ_SAMPLE_MOD,
    mode: str = "interleave",
    opq_iters: int = OPQ_NP_ITERS,
):
    """Shared trainer behind pq_train_encode/pq_topk: returns
    (codes, codebook, comp_fn) where comp_fn maps a vector DataFrame to
    its (vec_id, i, q, sub) components under this training's subspace
    split — the query side of ADC must decompose queries with the SAME
    split the codebook trained under (for ``balanced`` that split is
    data-dependent, so only the trainer can hand it out)."""
    try:
        key = (vecs.semanticHash(), m, k, iters, sample_mod, mode,
               opq_iters if mode == "learned" else None)
    except Exception:
        key = None
    if key is not None and key in _TRAIN_CACHE:
        return _TRAIN_CACHE[key]
    spark = vecs.sparkSession
    if mode == "balanced":
        raw = _collect_raw(vecs, sample_mod)
        alloc = _balanced_alloc(raw, m)
        sample_rows = [
            {"vec_id": r["vec_id"], "i": r["i"], "q": r["q"], "sub": alloc[r["i"]]}
            for r in raw
        ]
        alloc_df = local_df(
            spark, sorted(alloc.items()), "i long, sub long"
        )

        def comp_fn(v: DataFrame, m: int = m) -> DataFrame:
            return (
                quantized(v)
                .join(F.broadcast(alloc_df), "i")
                .select("vec_id", "i", "q", "sub")
            )

    elif mode == "learned":
        raw = _collect_raw(vecs, sample_mod)
        R_int, d, _ = _opq_learn_rotation(raw, m, k, iters, sample_mod, opq_iters)
        ids, X, _ = _sample_matrix(raw)
        Y = X.astype("int64") @ R_int  # exact: both operands integral
        sample_rows = [
            {"vec_id": v, "i": o, "q": int(Y[n, o]), "sub": o % m}
            for n, v in enumerate(ids)
            for o in range(d)
        ]
        r_df = local_df(
            spark,
            [
                (j, o, int(R_int[j, o]))
                for j in range(d)
                for o in range(d)
                if R_int[j, o] != 0
            ],
            "j long, io long, rv long",
        )

        def comp_fn(v: DataFrame, m: int = m) -> DataFrame:
            return (
                quantized(v)
                .withColumnRenamed("i", "j")
                .join(F.broadcast(r_df), "j")
                .groupBy("vec_id", "io")
                .agg(F.sum(F.col("rv") * F.col("q")).alias("q"))
                .select(
                    "vec_id",
                    F.col("io").alias("i"),
                    "q",
                    (F.col("io") % m).cast("bigint").alias("sub"),
                )
            )

    else:
        comp_fn = opq_components if mode == "wht" else pq_components
        raw = _collect_raw(vecs, sample_mod)
        if mode == "wht":
            sample_rows = _wht_rows(raw, m, OPQ_D)
        else:
            sample_rows = [dict(r, sub=r["i"] % m) for r in raw]
    cb_rows = _lloyd_train(sample_rows, k, iters, sample_mod)
    cb_arr, cc2_arr = _literal_assign_tables(spark, cb_rows, k)
    codes = _assigned(comp_fn(vecs, m), cb_arr, cc2_arr, k)
    cb = local_df(
        spark, sorted(cb_rows), "sub long, cluster long, i long, cq long"
    )
    if key is not None:
        codes = codes.persist()
        _TRAIN_CACHE[key] = (codes, cb, comp_fn)
    return codes, cb, comp_fn


def pq_train_encode(
    vecs: DataFrame,
    m: int = PQ_M,
    k: int = PQ_K,
    iters: int = PQ_ITERS,
    sample_mod: int = PQ_SAMPLE_MOD,
    rotate: bool = False,
    split: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Train per-subspace codebooks on a bounded sample and encode the
    corpus.

    Returns (codes, codebook): codes = (vec_id, sub, cluster) — m rows
    per vector, the stored index; codebook = (sub, cluster, i, cq) —
    the trained centroids (k*d rows), a LITERAL DataFrame.

    r7 restructure to the FAISS production shape: the codebook trains
    DRIVER-SIDE on the collected ``vec_id % sample_mod == 0`` sample
    (k-means needs ~hundreds of points per centroid, never the corpus;
    the stride is the caller's bounded-sample contract, like
    brute_force_topk's query batch), then pins as literal broadcast
    tables for ONE distributed encode pass.  The pre-r7 loop trained
    distributed over the full corpus — at sandbox scale that was ~26
    AQE query stages (~5 s of pure scheduling on <=128k rows), and at
    100 TB it would be the wrong shape anyway (6 corpus passes to
    compute 1,024 metadata rows).  One bounded collect (sample
    components — the lazy-builder gate's justified exception), zero
    corpus-scale driver transfers, one corpus shuffle total.

    ``split`` picks the subspace decomposition: "interleave" (default,
    i % m), "wht" (= rotate=True, fixed Walsh-Hadamard pre-rotation,
    see opq_components), or "balanced" (data-dependent variance-
    balanced dimension permutation, see _balanced_alloc).
    """
    codes, cb, _ = _train_encode(
        vecs, m, k, iters, sample_mod, _split_mode(rotate, split)
    )
    return codes, cb


def pq_topk(
    vecs: DataFrame,
    query_mod: int = 100,
    k_neighbors: int = 5,
    m: int = PQ_M,
    k: int = PQ_K,
    iters: int = PQ_ITERS,
    rotate: bool = False,
    split: str | None = None,
    opq_iters: int = OPQ_NP_ITERS,
) -> DataFrame:
    """ADC top-k: PQ-coded corpus scored against full-precision queries
    through the per-query (sub, cluster) dot-product LUT.  Output:
    (query_id, neighbor_id, rank).

    ``rotate=True`` (= split="wht") runs the whole pipeline (training
    sample, encode, query LUT) in the opq_components Walsh-Hadamard
    space — scores stay bit-identical to raw-space scoring of the
    rotated codebook, see opq_components.  ``split="balanced"`` uses
    the variance-balanced dimension permutation (_balanced_alloc); the
    query side decomposes under the trainer's own data-dependent split.

    Same bounded-query-batch input contract as brute_force_topk; the
    %-derived subset is the sandbox stand-in for an external batch."""
    codes, cb, comp_fn = _train_encode(
        vecs, m, k, iters, mode=_split_mode(rotate, split), opq_iters=opq_iters
    )
    qq = comp_fn(vecs.filter(F.col("vec_id") % query_mod == 0), m).withColumnRenamed(
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
    score = qcos_score()
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
    score = qcos_score()
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        agg.join(F.broadcast(qn), "query_id")
        .select("query_id", "neighbor_id", score.alias("score"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k_neighbors)
        .select("query_id", "neighbor_id", F.col("rank").cast("bigint").alias("rank"))
    )


def pq_recall(
    vecs: DataFrame,
    query_mod: int = 100,
    k_neighbors: int = 5,
    rotate: bool = False,
    split: str | None = None,
    opq_iters: int = OPQ_NP_ITERS,
) -> DataFrame:
    """Quantization quality audit: per-query overlap between PQ-ADC
    top-k and exact top-k.  Output: (query_id, n_matches, recall).

    With ``rotate=True`` (= split="wht") the ADC side runs in the
    Walsh-Hadamard space (opq_components) while the exact side stays
    raw — valid because the rotation leaves quantized-cosine scores
    bit-identical (power-of-2 uniform scaling), so the raw exact top-k
    IS the rotated exact top-k.  ``split="balanced"`` likewise needs no
    ground-truth re-mapping (a permutation is orthogonal and leaves
    dots/norms literally unchanged).  Comparing the three split rows
    quantifies each decomposition's lift."""
    approx = pq_topk(
        vecs, query_mod, k_neighbors, rotate=rotate, split=split,
        opq_iters=opq_iters,
    )
    exact = brute_force_topk(vecs, query_mod, k_neighbors, cache=True)
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
    # r12 (guide §2.4): the candidate list is consumed twice below (the
    # pair prune + its distinct-neighbor projection), and its producer
    # is the FULL ivfpq_topk plan — the lineage form executed that plan
    # twice (120-exchange physical plan).  One |Q|·R-row checkpoint
    # runs it once; A/B at sf0.1 (min of 3 warm probes) 4.7 → 2.9 s.
    cand = ivfpq_topk(
        vecs, query_mod, k_neighbors * r_factor, n_probe, m, k, iters
    ).select("query_id", "neighbor_id").localCheckpoint(eager=False)
    comp = quantized(vecs)
    qq = comp.filter(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("query_id"), "i", F.col("q").alias("qa")
    )
    nb = comp.select(
        F.col("vec_id").alias("neighbor_id"), "i", F.col("q").alias("qb")
    )
    # guide §2.3 (aggregate before you shuffle / fewer passes): the
    # pair join on (query_id, i) sees every component of both vectors
    # exactly once — both sides are dense posexplode output over the
    # same 0..d-1 index domain — so the pair's own norms are exact
    # per-group sums of qa²/qb² in the SAME aggregation that computes
    # the dot product.  The r11 plan derived qn/cn as two extra
    # corpus-explode subtrees and re-attached them with two joins; this
    # form touches the component table once and drops both joins
    # (plan: 35 → ~20 Exchanges).  Integer sums are identical, so the
    # declared scores cannot move.
    dots = (
        nb.join(F.broadcast(cand), "neighbor_id")
        .join(F.broadcast(qq), ["query_id", "i"])
        .groupBy("query_id", "neighbor_id")
        .agg(
            F.sum(F.col("qa") * F.col("qb")).alias("dot"),
            F.sum(F.col("qa") * F.col("qa")).alias("qn"),
            F.sum(F.col("qb") * F.col("qb")).alias("cn"),
        )
    )
    score = qcos_score()
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), "neighbor_id")
    return (
        dots.select("query_id", "neighbor_id", score.alias("score"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k_neighbors)
        .select(
            "query_id", "neighbor_id", F.col("rank").cast("bigint").alias("rank")
        )
    )


def hyperplane_lsh_buckets(
    vecs: DataFrame, n_bits: int = 8, n_tables: int = 8, d: int = OPQ_D
) -> DataFrame:
    """Random-hyperplane LSH for cosine similarity (Charikar, STOC
    2002) with the fixed Walsh-Hadamard rows as the hyperplane normals:
    bit b of table t = [ <h_{t*n_bits+b}, x> > 0 ] where h_o is the
    o-th WHT output (opq_components already computes every <h_o, x> as
    an exact int64).  n_tables * n_bits <= d distinct hyperplanes; each
    table keys a bucket on its own n_bits-bit sign pattern.

    P[bit collision] = 1 - theta/pi for angle theta, so an n_bits
    bucket match implies high cosine similarity; n_tables independent
    tables trade candidate volume for recall exactly like MinHash
    bands.  This is the embedding-side analogue of the text SimHash
    dedup: near-duplicate EMBEDDINGS (semantic near-dups) bucket
    together without any pairwise work.

    Scale shape: one rotation pass (broadcast H join + one partial
    aggregate), then a per-vector map to (table, bucket) — candidates
    later come from bucket-equality self-joins, never all-pairs.
    Output: (vec_id, tbl, bucket)."""
    if n_tables * n_bits > d:
        raise ValueError(f"n_tables*n_bits must be <= d, got {n_tables}*{n_bits} > {d}")
    rot = opq_components(vecs, d=d).select("vec_id", "i", "q")
    return _buckets_from_rot(rot, n_bits, n_tables)


def _buckets_from_rot(rot: DataFrame, n_bits: int, n_tables: int) -> DataFrame:
    """Sign-bucket fold over rotated components (vec_id, i, q) — shared
    by the index and its planted audit so both measure the SAME bucket
    encoding.  Output: (vec_id, tbl, bucket)."""
    return (
        rot.filter(F.col("i") < n_tables * n_bits)
        .select(
            "vec_id",
            F.floor(F.col("i") / n_bits).cast("bigint").alias("tbl"),
            (F.col("i") % n_bits).alias("b"),
            (F.col("q") > 0).cast("bigint").alias("bit"),
        )
        .groupBy("vec_id", "tbl")
        .agg(
            F.sum(F.expr("shiftleft(bit, CAST(b AS INT))"))
            .cast("bigint")
            .alias("bucket")
        )
    )


def hyperplane_lsh_candidates(
    vecs: DataFrame, n_bits: int = 8, n_tables: int = 8
) -> DataFrame:
    """Embedding-cosine near-duplicate candidate pairs: vectors sharing
    ANY table's sign-pattern bucket (union over tables, deduplicated on
    the pair).  The scale contract matches minhash_lsh_candidates /
    simhash_candidates: the self-join runs per (tbl, bucket) — bounded
    bucket fan-out, never quadratic in the corpus.  Output: (d1, d2,
    n_tables_hit)."""
    b = hyperplane_lsh_buckets(vecs, n_bits, n_tables)
    a2, b2 = b.alias("a"), b.alias("b")
    return (
        a2.join(
            b2,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .groupBy(
            F.col("a.vec_id").alias("d1"), F.col("b.vec_id").alias("d2")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_tables_hit"))
    )


def opq_learned_audit(
    vecs: DataFrame,
    query_mod: int = 100,
    k_neighbors: int = 5,
    iters_grid: tuple = (0, 1, 4),
    m: int = PQ_M,
    k: int = PQ_K,
    iters: int = PQ_ITERS,
    sample_mod: int = PQ_SAMPLE_MOD,
) -> DataFrame:
    """Learned-rotation (OPQ-NP) audit: one row per alternation count —
    (opq_iters, sample_mse, avg_recall, n_queries) — pairing the fit's
    own objective (sample reconstruction error, computed driver-side
    during the fit) with the corpus-level recall vs the raw exact
    ground truth.

    The PAIRING is the point: OPQ-NP provably drives sample MSE down
    every alternation (Procrustes + Lloyd are both descent steps), but
    on a corpus with no low-rank structure the rotation overfits the
    sample's arbitrary Voronoi cells and corpus recall FALLS while MSE
    falls — on the synthetic fixture: iters 0/1/4 → recall ~0.48/0.44/
    0.24 with monotone-decreasing MSE.  A single learned-recall number
    would misread as a broken operator; the curve shows a correct fit
    whose objective diverges from retrieval quality on unstructured
    data (same honesty convention as the hyperplane/SAX capture
    curves).  The iters=0 row doubles as the quantized fixed-WHT
    baseline (the init is the orthonormal WHT; it is evaluated, never
    refit).

    Rows-only driver check by necessity: the fit is an SVD — no DuckDB
    oracle can replay it.  pytest pins the MSE monotonicity and the
    fixed-row contract instead.

    Scale shape: the fit collects the bounded training sample once per
    leg (driver numpy, metadata-scale — the same justified exception
    as pq_train_encode); each leg's recall is the benched pq_recall
    plan.  |iters_grid| bounds the leg count."""
    legs = []
    raw = quantized(vecs.filter(F.col("vec_id") % sample_mod == 0)).collect()
    for oi in iters_grid:
        _, _, mse = _opq_learn_rotation(raw, m, k, iters, sample_mod, oi)
        rec = pq_recall(
            vecs, query_mod, k_neighbors, split="learned", opq_iters=oi
        )
        legs.append(
            rec.agg(
                F.round(F.avg("recall"), 6).alias("avg_recall"),
                F.count(F.lit(1)).cast("bigint").alias("n_queries"),
            ).select(
                F.lit(oi).cast("bigint").alias("opq_iters"),
                F.lit(round(mse, 3)).alias("sample_mse"),
                "avg_recall",
                "n_queries",
            )
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out.orderBy("opq_iters")


def hyperplane_recall_audit(
    vecs: DataFrame,
    query_mod: int = 100,
    n_bits: int = 8,
    n_tables: int = 8,
) -> DataFrame:
    """LSH quality audit (the discipline every approximate structure
    here ships) as a CAPTURE-vs-SIMILARITY CURVE: every exact pair of a
    bounded query batch (cosine_scores' broadcast-query contract) is
    banded by its quantized-cosine score (0.05-wide bands,
    floor(score*20)), and each band reports how many of its pairs the
    hyperplane buckets surface as candidates.

    Why a curve and not one number: sign-LSH capture is a function of
    the pair angle (P[bit agree] = 1 - theta/pi), so a single recall
    number conflates corpus geometry with index quality.  The banded
    rows show the physics directly — near-orthogonal bands capture ~0
    while high-cosine bands (the near-duplicate regime this index
    exists for: cos >= 0.9 gives ~93% capture at 8x8 from the per-bit
    bound) capture nearly everything.  On a corpus with no true
    near-dups the top bands are simply absent, which is itself the
    honest answer.

    Determinism: scores are the engine's exact-integer quantized
    cosine; banding floors a double both engines derive from identical
    int64s, so band ids match bit-for-bit.  Output: (band, n_pairs,
    n_hits, capture), one row per occupied band."""
    from oracdc_spark.operators.similarity import cosine_scores

    queries = vecs.filter(F.col("vec_id") % query_mod == 0)
    pairs = (
        cosine_scores(queries, vecs)
        .select(
            F.least("query_id", "neighbor_id").alias("d1"),
            F.greatest("query_id", "neighbor_id").alias("d2"),
            "score",
        )
        .groupBy("d1", "d2")
        .agg(F.max("score").alias("score"))
    )
    cand = hyperplane_lsh_candidates(vecs, n_bits, n_tables).select(
        "d1", "d2", F.lit(1).alias("hit")
    )
    return (
        pairs.join(cand, ["d1", "d2"], "left")
        .groupBy(F.floor(F.col("score") * 20).cast("bigint").alias("band"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("bigint").alias("n_hits"),
        )
        .select(
            "band",
            "n_pairs",
            "n_hits",
            F.round(
                F.col("n_hits").cast("double") / F.col("n_pairs").cast("double"), 6
            ).alias("capture"),
        )
    )


def ann_label_purity(
    vecs: DataFrame, query_mod: int = 100, k_neighbors: int = 5
) -> DataFrame:
    """Semantic-quality audit across the ANN ladder: for each method
    (exact brute force, PQ-ADC, IVF-PQ) the mean fraction of top-k
    neighbors sharing the query's ``label`` — the retrieval-quality
    measure recall@k cannot see (an index can miss the exact top-k yet
    still return same-cluster vectors, which is what a semantic-dedup
    or retrieval user actually needs).

    Exact integer counts aggregated to one row per method:
    (method, n_queries, n_pairs, n_same_label, purity).  purity =
    round(n_same_label / n_pairs, 6) — both engines derive it from the
    same integers.  Methods reuse the audited top-k operators (and the
    session PQ code cache), so the added cost is three label joins on
    |Q|*k rows.

    Reading the row set: ivfpq purity ABOVE exact is expected when the
    coarse cells are the label assignment itself — probing constrains
    candidates to the query's own cluster, so what the index loses in
    exact-top-k recall it gains in label agreement.  A large
    exact-vs-approx purity gap in the OTHER direction is the signal
    that quantization is destroying semantic structure."""
    lab = vecs.select("vec_id", "label")
    qlab = lab.withColumnRenamed("vec_id", "query_id").withColumnRenamed(
        "label", "q_label"
    )
    nlab = lab.withColumnRenamed("vec_id", "neighbor_id").withColumnRenamed(
        "label", "n_label"
    )
    methods = [
        ("exact", brute_force_topk(vecs, query_mod, k_neighbors, cache=True)),
        ("pq", pq_topk(vecs, query_mod, k_neighbors)),
        ("ivfpq", ivfpq_topk(vecs, query_mod, k_neighbors)),
    ]
    out = None
    for name, topk in methods:
        row = (
            topk.join(F.broadcast(qlab), "query_id")
            .join(F.broadcast(nlab), "neighbor_id")
            .agg(
                F.countDistinct("query_id").cast("bigint").alias("n_queries"),
                F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
                F.sum((F.col("q_label") == F.col("n_label")).cast("bigint"))
                .cast("bigint")
                .alias("n_same_label"),
            )
            .select(
                F.lit(name).alias("method"),
                "n_queries",
                "n_pairs",
                F.col("n_same_label"),
                F.round(
                    F.col("n_same_label").cast("double")
                    / F.col("n_pairs").cast("double"),
                    6,
                ).alias("purity"),
            )
        )
        out = row if out is None else out.unionAll(row)
    return out


PLANT_OFFSET = 1_000_000  # twin vec_id = original + PLANT_OFFSET


def hyperplane_planted_audit(
    vecs: DataFrame, n_bits: int = 8, n_tables: int = 8
) -> DataFrame:
    """Planted-positive audit for the hyperplane index: the natural
    corpus has no true near-duplicates (its capture curve tops out in
    the weak-cosine bands), so this audit PLANTS them — every vector
    gets a twin perturbed by exactly +1 integer unit on one component
    (component index = vec_id % 64; cosine ~ 1 - 1e-7) — and reports
    how many (original, twin) pairs share a bucket in at least one
    table.  This is the near-dup regime the index exists for; by the
    sign-stability argument a twin flips a bit only where the rotated
    component sits within 1 unit of zero, so capture should be ~1.
    The complement of the banded curve: curve = behavior on the
    corpus's real geometry, planted = behavior at the operating point.

    One row: (n_planted, n_hits, capture) — exact integer counts.
    The id-space split requires every real vec_id < PLANT_OFFSET —
    enforced with a runtime raise folded into the n_planted aggregate
    (a violated corpus would otherwise silently misclassify originals
    as twins)."""
    comps = quantized(vecs)
    twins = comps.select(
        (F.col("vec_id") + PLANT_OFFSET).alias("vec_id"),
        "i",
        (
            F.col("q")
            + ((F.col("i") == (F.col("vec_id") % 64)).cast("bigint"))
        ).alias("q"),
    )
    bkts = _buckets_from_rot(
        _rotate_components(comps.unionByName(twins)), n_bits, n_tables
    )
    orig = bkts.filter(F.col("vec_id") < PLANT_OFFSET)
    twin = bkts.filter(F.col("vec_id") >= PLANT_OFFSET).select(
        (F.col("vec_id") - PLANT_OFFSET).alias("vec_id"),
        "tbl",
        F.col("bucket").alias("t_bucket"),
    )
    hits = (
        orig.join(twin, ["vec_id", "tbl"])
        .filter(F.col("bucket") == F.col("t_bucket"))
        .select("vec_id")
        .distinct()
    )
    n_planted = (
        vecs.agg(
            F.count_distinct("vec_id").alias("_n"),
            F.max("vec_id").alias("_mx"),
        )
        .select(
            F.when(
                F.col("_mx") >= PLANT_OFFSET,
                F.raise_error(
                    F.lit(
                        "hyperplane_planted_audit: vec_id >= PLANT_OFFSET — "
                        "the planted id space would collide with real ids"
                    )
                ).cast("bigint"),
            )
            .otherwise(F.col("_n"))
            .cast("bigint")
            .alias("n_planted")
        )
    )
    n_hits = hits.agg(F.count(F.lit(1)).cast("bigint").alias("n_hits"))
    # empty-corpus PRECONDITION, stated plainly in-plan (the uniform
    # r10 rule for the planted/training audits, pq.train's ValueError
    # precedent translated to lazy builders — same raise_error shape
    # as the PLANT_OFFSET guard above)
    return n_planted.crossJoin(n_hits).select(
        "n_planted",
        "n_hits",
        F.when(
            F.col("n_planted") == 0,
            F.raise_error(
                F.lit(
                    "hyperplane_planted_audit: nothing planted — zero "
                    "distinct vec_ids in the embeddings table "
                    "(audit precondition)"
                )
            ).cast("double"),
        )
        .otherwise(
            F.round(
                F.col("n_hits").cast("double") / F.col("n_planted").cast("double"),
                6,
            )
        )
        .alias("capture"),
    )
