"""Product quantization (operators/pq.py) invariants."""

import pytest

import pyspark.sql.functions as F

from oracdc_spark.catalog import load_table
from oracdc_spark.operators import pq

SF = "/root/testdata/sf0.001"


def test_codes_cover_corpus_and_stay_in_range(spark):
    """Every vector gets exactly m codes, one per subspace, each a valid
    cluster id in [0, k)."""
    vecs = load_table(spark, SF, "embeddings")
    n = vecs.count()
    codes, cb = pq.pq_train_encode(vecs, m=4, k=16, iters=2)
    per_vec = codes.groupBy("vec_id").agg(
        F.count(F.lit(1)).alias("n"), F.countDistinct("sub").alias("nsub")
    )
    bad = per_vec.filter((F.col("n") != 4) | (F.col("nsub") != 4)).count()
    assert bad == 0
    assert per_vec.count() == n
    mm = codes.agg(F.min("cluster"), F.max("cluster")).first()
    assert mm[0] >= 0 and mm[1] < 16


def test_codebook_shape_and_subspace_partition(spark):
    """Codebook centroids exist only for dimensions of their own
    subspace (interleaved i % m grouping) and stay <= k per subspace."""
    vecs = load_table(spark, SF, "embeddings")
    _, cb = pq.pq_train_encode(vecs, m=4, k=16, iters=2)
    mismatched = cb.filter(F.col("i") % 4 != F.col("sub")).count()
    assert mismatched == 0
    per_sub = cb.select("sub", "cluster").distinct().groupBy("sub").count()
    assert per_sub.filter(F.col("count") > 16).count() == 0


def test_adc_recall_sane(spark):
    """PQ-ADC search must recover a meaningful share of the exact
    top-k (the synthetic corpus is unclustered — the hardest case for
    PQ — so the bar is below SQ8's, but far above the ~k/|corpus|
    random-order floor)."""
    vecs = load_table(spark, SF, "embeddings")
    rec = pq.pq_recall(vecs, 100, 5).agg(F.avg("recall")).first()[0]
    assert rec >= 0.3


def test_lloyd_iterations_do_not_increase_distortion(spark):
    """Per-subspace within-cluster squared distance must not grow from
    the seed assignment to the trained assignment (Lloyd monotonicity,
    measured against each step's own refit centroids)."""
    vecs = load_table(spark, SF, "embeddings")
    comps = pq.pq_components(vecs, 4)

    def distortion(assign):
        # refit centroids for the given assignment (floor-mean, the
        # engine's exact-integer recipe — inlined since r7 fused the
        # training-loop refit into the assignment pass)
        cbk = (
            comps.join(assign, ["vec_id", "sub"])
            .groupBy("sub", "cluster", "i")
            .agg(
                F.floor(F.sum("q").cast("double") / F.count(F.lit(1)))
                .cast("bigint")
                .alias("cq")
            )
        )
        d = (
            comps.join(assign, ["vec_id", "sub"])
            .join(cbk, ["sub", "cluster", "i"])
            .select(((F.col("q") - F.col("cq")) ** 2).alias("d2"))
            .agg(F.sum("d2"))
            .first()[0]
        )
        return d

    seed = vecs.select(
        "vec_id",
        F.explode(F.array(*[F.lit(s) for s in range(4)])).alias("sub"),
    ).select(
        "vec_id",
        F.col("sub").cast("bigint").alias("sub"),
        (F.col("vec_id") % 16).cast("bigint").alias("cluster"),
    )
    trained, _ = pq.pq_train_encode(vecs, m=4, k=16, iters=2)
    assert distortion(trained) <= distortion(seed)


@pytest.mark.slow
def test_ivfpq_neighbors_come_from_probed_cells(spark):
    """Every IVF-PQ result must lie in one of its query's n_probe
    nearest coarse cells — the pruning contract of the composed index."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from oracdc_spark.operators.similarity import quantized

    vecs = load_table(spark, SF, "embeddings")
    out = pq.ivfpq_topk(vecs, 100, 5, 2)
    # recompute the probe sets the operator's way
    q = quantized(vecs)
    lab = vecs.select("vec_id", F.col("label").alias("cell"))
    cents = (
        q.join(lab, "vec_id")
        .groupBy("cell", "i")
        .agg(F.round(F.sum("q").cast("double") / F.count(F.lit(1)), 0).cast("bigint").alias("ccq"))
    )
    qd = q.filter(F.col("vec_id") % 100 == 0).withColumnRenamed("vec_id", "query_id")
    dist = (
        qd.join(cents, "i")
        .groupBy("query_id", "cell")
        .agg(F.sum((F.col("q") - F.col("ccq")) * (F.col("q") - F.col("ccq"))).alias("d2"))
    )
    wp = Window.partitionBy("query_id").orderBy("d2", "cell")
    probe = dist.withColumn("rk", F.row_number().over(wp)).filter(F.col("rk") <= 2).select("query_id", "cell")
    stray = (
        out.join(lab.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id")
        .join(probe, ["query_id", "cell"], "left_anti")
        .count()
    )
    assert stray == 0
    assert out.count() > 0


@pytest.mark.slow
def test_refine_recall_at_least_adc_recall(spark):
    """The refine stage re-scores ADC candidates with full-precision
    vectors: its top-5 must overlap the exact top-5 at least as much as
    the raw IVF-PQ top-5 does (FAISS IndexRefineFlat property)."""
    from oracdc_spark.operators.pq import ivfpq_refine_topk, ivfpq_topk
    from oracdc_spark.operators.similarity import brute_force_topk

    vecs = load_table(spark, SF, "embeddings")
    exact = {(r.query_id, r.neighbor_id) for r in brute_force_topk(vecs, 50, 5).collect()}
    adc = {(r.query_id, r.neighbor_id) for r in ivfpq_topk(vecs, 50, 5, 2).collect()}
    ref = {(r.query_id, r.neighbor_id) for r in ivfpq_refine_topk(vecs, 50, 5, 2, 4).collect()}
    assert len(ref & exact) >= len(adc & exact)
    # refined output is a strict re-rank of the wider candidate list
    cand = {(r.query_id, r.neighbor_id) for r in ivfpq_topk(vecs, 50, 20, 2).collect()}
    assert ref <= cand


def test_opq_rotation_scales_dots_by_exactly_d(spark):
    """H·Hᵀ = d·I on exact integers: for every vector pair the rotated
    dot product must equal d * raw dot product — the property that
    makes raw-space exact top-k valid ground truth for the rotated
    pipeline."""
    vecs = load_table(spark, SF, "embeddings").limit(6)
    raw = pq.pq_components(vecs).select("vec_id", "i", "q")
    rot = pq.opq_components(vecs).select("vec_id", "i", "q")

    def dots(comp):
        a = comp.select(F.col("vec_id").alias("a"), "i", F.col("q").alias("qa"))
        b = comp.select(F.col("vec_id").alias("b"), "i", F.col("q").alias("qb"))
        return (
            a.join(b, "i")
            .filter(F.col("a") <= F.col("b"))
            .groupBy("a", "b")
            .agg(F.sum(F.col("qa") * F.col("qb")).alias("dot"))
        )

    raw_d = {(r.a, r.b): r.dot for r in dots(raw).collect()}
    rot_d = {(r.a, r.b): r.dot for r in dots(rot).collect()}
    assert set(raw_d) == set(rot_d) and len(raw_d) > 0
    for pair, d in raw_d.items():
        assert rot_d[pair] == 64 * d, pair


def test_opq_components_one_row_per_output_dim(spark):
    vecs = load_table(spark, SF, "embeddings").limit(4)
    rows = pq.opq_components(vecs).collect()
    by_vec: dict = {}
    for r in rows:
        by_vec.setdefault(r.vec_id, set()).add((r.i, r.sub))
    for v, dims in by_vec.items():
        assert dims == {(i, i % pq.PQ_M) for i in range(64)}, v


def test_opq_recall_audit_shares_exact_ground_truth(spark):
    """The rotate=True audit must report recall over the SAME query set
    as the raw audit (exact side is raw-space by the scale-invariance
    argument), with every recall in [0, 1]."""
    vecs = load_table(spark, SF, "embeddings")
    raw = {r.query_id: r.recall for r in pq.pq_recall(vecs, 100, 5).collect()}
    rot = {
        r.query_id: r.recall
        for r in pq.pq_recall(vecs, 100, 5, rotate=True).collect()
    }
    assert set(raw) == set(rot) and len(rot) > 0
    assert all(0.0 <= v <= 1.0 for v in rot.values())


def test_balanced_alloc_is_snake_balanced_and_deterministic():
    """_balanced_alloc must deal variance-ranked dims into subspaces in
    snake order: equal bucket sizes when d % m == 0, the top-m variance
    dims in m DISTINCT subspaces, ties broken to the lower dim id."""
    # dim i has variance numerator decreasing in i (n=3 samples each):
    # values {0, +v, -v} give vnum = 3*2v^2 exactly, v = 100 - i
    rows = []
    for i in range(8):
        v = 100 - i
        for vid, q in ((0, 0), (2, v), (4, -v)):
            rows.append({"vec_id": vid, "i": i, "q": q})
    alloc = pq._balanced_alloc(rows, m=4)
    # snake over ranks 0..7 at m=4: pass 0 -> subs 0,1,2,3; pass 1
    # (odd) -> subs 3,2,1,0 — dims ranked by DESC variance = dim order
    assert alloc == {0: 0, 1: 1, 2: 2, 3: 3, 4: 3, 5: 2, 6: 1, 7: 0}
    # bucket sizes balance
    sizes = {}
    for s in alloc.values():
        sizes[s] = sizes.get(s, 0) + 1
    assert set(sizes.values()) == {2}
    # tie-break: equal variances rank by lower dim id first
    tied = [
        {"vec_id": vid, "i": i, "q": q}
        for i in range(4)
        for vid, q in ((0, 0), (2, 7), (4, -7))
    ]
    assert pq._balanced_alloc(tied, m=2) == {0: 0, 1: 1, 2: 1, 3: 0}


def test_rotation_width_validation_and_pad_to_pow2(spark):
    """d must be a power of two (score bit-identity needs the uniform
    power-of-2 scaling); short vectors zero-pad to d — the pad-to-pow2
    contract for d != 64 corpora.  At d=8 over 5-dim vectors the
    rotated pairwise dots must equal exactly 8x the raw dots
    (H·Hᵀ = d·I with implicit zero-padding)."""
    import itertools
    import pytest as _pytest

    rows = [(0, [1.0, 2.0, -1.0, 0.5, 3.0]), (1, [2.0, -1.0, 1.0, 1.5, 0.0]),
            (2, [0.25, 0.5, 0.75, -0.5, 1.0])]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    with _pytest.raises(ValueError):
        pq.opq_components(vecs, m=2, d=5).collect()
    with _pytest.raises(ValueError):
        pq.opq_components(vecs, m=2, d=48).collect()
    raw = {(r.vec_id, r.i): r.q for r in pq.pq_components(vecs, m=2).collect()}
    rot = {(r.vec_id, r.i): r.q for r in pq.opq_components(vecs, m=2, d=8).collect()}
    ids = [0, 1, 2]
    for a, b in itertools.combinations(ids, 2):
        raw_dot = sum(raw[(a, i)] * raw[(b, i)] for i in range(5))
        rot_dot = sum(rot[(a, o)] * rot[(b, o)] for o in range(8))
        assert rot_dot == 8 * raw_dot, (a, b)


def test_split_mode_validation():
    import pytest as _pytest

    assert pq._split_mode(False, None) == "interleave"
    assert pq._split_mode(True, None) == "wht"
    assert pq._split_mode(False, "balanced") == "balanced"
    assert pq._split_mode(True, "wht") == "wht"
    with _pytest.raises(ValueError):
        pq._split_mode(True, "balanced")
    with _pytest.raises(ValueError):
        pq._split_mode(False, "pca")


@pytest.mark.slow
def test_balanced_split_codes_partition_by_alloc(spark):
    """Under split='balanced' every vector still gets exactly m codes
    (one per subspace) and the recall audit shares the raw exact ground
    truth (a permutation leaves dots/norms unchanged)."""
    vecs = load_table(spark, SF, "embeddings")
    n = vecs.count()
    codes, cb = pq.pq_train_encode(vecs, split="balanced")
    per_vec = codes.groupBy("vec_id").agg(
        F.count(F.lit(1)).alias("n"), F.countDistinct("sub").alias("nsub")
    )
    assert per_vec.filter(
        (F.col("n") != pq.PQ_M) | (F.col("nsub") != pq.PQ_M)
    ).count() == 0
    assert per_vec.count() == n
    # the codebook's dim->sub map must be a function (each dim in ONE sub)
    multi = (
        cb.select("i", "sub").distinct().groupBy("i").count()
        .filter(F.col("count") > 1).count()
    )
    assert multi == 0
    raw = {r.query_id: r.recall for r in pq.pq_recall(vecs, 100, 5).collect()}
    bal = {
        r.query_id: r.recall
        for r in pq.pq_recall(vecs, 100, 5, split="balanced").collect()
    }
    assert set(raw) == set(bal) and len(bal) > 0
    assert all(0.0 <= v <= 1.0 for v in bal.values())


@pytest.mark.slow
def test_opq_learned_audit_curve_contract(spark):
    """The learned-rotation audit must emit exactly one row per
    alternation count, with sample MSE monotone NON-INCREASING in
    opq_iters (Lloyd + Procrustes are both descent steps on the OPQ
    objective) and every recall in [0, 1] over the same query count.
    Recall itself is free to fall — the audit exists to expose the
    MSE-down/recall-down divergence on unstructured corpora."""
    vecs = load_table(spark, SF, "embeddings")
    rows = pq.opq_learned_audit(vecs, 100, 5, iters_grid=(0, 2)).collect()
    assert [r.opq_iters for r in rows] == [0, 2]
    assert rows[0].sample_mse >= rows[1].sample_mse > 0
    nq = {r.n_queries for r in rows}
    assert len(nq) == 1 and nq.pop() > 0
    assert all(0.0 <= r.avg_recall <= 1.0 for r in rows)


def test_learned_rotation_quantized_and_orthogonal_ish():
    """The learned R_int must be the OPQ_R_SCALE quantization of a
    near-orthogonal matrix: R_intᵀ·R_int / SCALE² ~ I within the
    1/(2*SCALE) per-entry rounding budget."""
    import numpy as np

    rows = [
        {"vec_id": v, "i": i, "q": ((v * 7 + i * 13) % 29) - 14}
        for v in range(0, 40, 2)
        for i in range(8)
    ]
    R_int, d, mse = pq._opq_learn_rotation(rows, m=4, k=4, lloyd_iters=2,
                                           sample_mod=2, opq_iters=2)
    assert d == 8 and R_int.shape == (8, 8) and mse > 0
    G = (R_int.astype(np.float64) / pq.OPQ_R_SCALE)
    err = np.abs(G.T @ G - np.eye(8)).max()
    assert err < 8 * (1.0 / pq.OPQ_R_SCALE), err


def test_hyperplane_buckets_in_range_and_cover(spark):
    vecs = load_table(spark, SF, "embeddings")
    n = vecs.count()
    b = pq.hyperplane_lsh_buckets(vecs, n_bits=8, n_tables=8)
    rows = b.collect()
    # one bucket per (vector, table); bucket fits in n_bits
    assert len(rows) == n * 8
    assert all(0 <= r.bucket < 256 for r in rows)
    assert all(0 <= r.tbl < 8 for r in rows)


def test_hyperplane_candidates_ordered_and_bounded(spark):
    import pytest as _pytest

    vecs = load_table(spark, SF, "embeddings")
    cand = pq.hyperplane_lsh_candidates(vecs).collect()
    assert all(r.d1 < r.d2 for r in cand)
    assert all(1 <= r.n_tables_hit <= 8 for r in cand)
    with _pytest.raises(ValueError):
        pq.hyperplane_lsh_buckets(vecs, n_bits=16, n_tables=8).collect()


@pytest.mark.slow
def test_hyperplane_audit_counts_consistent(spark):
    vecs = load_table(spark, SF, "embeddings")
    rows = pq.hyperplane_recall_audit(vecs, 100).collect()
    assert len(rows) > 0
    for r in rows:
        assert 0 <= r.n_hits <= r.n_pairs
        assert abs(r.capture - r.n_hits / r.n_pairs) < 1e-6


@pytest.mark.slow
def test_ann_label_purity_rows_and_bounds(spark):
    vecs = load_table(spark, SF, "embeddings")
    rows = {r.method: r for r in pq.ann_label_purity(vecs, 100, 5).collect()}
    assert set(rows) == {"exact", "pq", "ivfpq"}
    for r in rows.values():
        assert r.n_pairs == r.n_queries * 5
        assert 0 <= r.n_same_label <= r.n_pairs
        assert abs(r.purity - r.n_same_label / r.n_pairs) < 1e-6


def test_planted_twins_fully_captured(spark):
    vecs = load_table(spark, SF, "embeddings")
    r = pq.hyperplane_planted_audit(vecs).collect()[0]
    assert r.n_planted == vecs.count()
    assert r.n_hits == r.n_planted
    assert r.capture == 1.0


def test_ragged_corpus_trains_and_encodes(spark):
    """Vectors of different lengths must train (missing components read
    as 0, matching the encode pass) — the module's ragged contract."""
    vecs = load_table(spark, SF, "embeddings").limit(8)
    ragged = vecs.withColumn(
        "embedding",
        F.when(F.col("vec_id") % 2 == 0, F.slice("embedding", 1, 32)).otherwise(
            F.col("embedding")
        ),
    )
    codes, cb = pq.pq_train_encode(ragged)
    rows = codes.collect()
    assert len(rows) == 8 * pq.PQ_M
    assert all(0 <= r.cluster < pq.PQ_K for r in rows)


def test_planted_audit_rejects_colliding_ids(spark):
    import pytest as _pytest

    vecs = load_table(spark, SF, "embeddings").limit(3).withColumn(
        "vec_id", F.col("vec_id") + pq.PLANT_OFFSET
    )
    with _pytest.raises(Exception, match="PLANT_OFFSET"):
        pq.hyperplane_planted_audit(vecs).collect()


def test_hard_negatives_cross_label_only(spark):
    """Every mined negative must carry a label different from its
    query's, ranks are 1..k dense per query, and the top negative is
    the best cross-label neighbor from the exact score table."""
    from oracdc_spark.operators.similarity import cosine_scores, hard_negatives

    vecs = load_table(spark, SF, "embeddings")
    labels = {r.vec_id: r.label for r in vecs.select("vec_id", "label").collect()}
    out = hard_negatives(vecs, 100, 5).collect()
    assert out
    by_q: dict = {}
    for r in out:
        assert labels[r.query_id] != labels[r.negative_id]
        by_q.setdefault(r.query_id, []).append(r.rank)
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in by_q.values())
    # cross-check rank 1 against the raw score table
    queries = vecs.filter(F.col("vec_id") % 100 == 0)
    scores = cosine_scores(queries, vecs).collect()
    for qid, ranks in by_q.items():
        best = max(
            (s for s in scores
             if s.query_id == qid and labels[s.neighbor_id] != labels[qid]),
            key=lambda s: (s.score, -s.neighbor_id),
        )
        got1 = [r.negative_id for r in out if r.query_id == qid and r.rank == 1]
        assert got1 == [best.neighbor_id]


@pytest.mark.slow
def test_mmr_rerank_diversity_and_contract(spark):
    """On a handcrafted corpus where the two most relevant docs are
    near-identical, MMR must pick the diverse third doc at position 2
    (pure relevance would pick the redundant twin); positions are
    1..k distinct docs drawn from the candidate pool."""
    from oracdc_spark.operators.retrieval import mmr_rerank

    # query 0 sits between two orthogonal directions; docs 1/2 are
    # near-identical twins on one axis, doc 3 equally relevant on the
    # other: relevance alone ranks (1, 2, 3) but MMR's redundancy
    # penalty (sim(2,1) ~ 1, sim(3,1) ~ 0) must promote 3 to position 2
    rows = [
        (0, [1.0, 1.0, 0.0, 0.0], "a"),
        (1, [1.0, 0.01, 0.0, 0.0], "a"),
        (2, [1.0, 0.009, 0.0, 0.0], "a"),
        (3, [0.01, 1.0, 0.0, 0.0], "b"),
        (5, [0.0, 0.0, 0.0, 1.0], "b"),
    ]
    vecs = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    )
    out = {r.position: r.doc_id for r in
           mmr_rerank(vecs, query_mod=100, n_candidates=4, k=3).collect()}
    # only vec 0 is a query (0 % 100 == 0)
    assert len(out) == 3 and len(set(out.values())) == 3
    assert out[1] == 1          # most relevant
    assert out[2] == 3          # diverse beats the redundant twin (2)
    assert out[3] == 2


def test_norm_outliers_rank_trim_exact(spark):
    """The decomposed rank must equal the literal global sort's: flags
    exactly floor(pct*n/100) low + matching high rows, every low rn <=
    every kept rn <= every high rn, side derived from rank."""
    from oracdc_spark.operators.similarity import norm_outliers, quantized

    vecs = load_table(spark, SF, "embeddings")
    n = vecs.count()
    out = norm_outliers(vecs, pct=2).collect()
    lows = [r for r in out if r.side == "low"]
    highs = [r for r in out if r.side == "high"]
    assert len(lows) == (2 * n) // 100
    assert len(highs) == n - (98 * n) // 100
    # ranks are the global (norm2, vec_id) order
    norms = sorted(
        (r.norm2, r.vec_id)
        for r in quantized(vecs)
        .groupBy("vec_id")
        .agg(F.sum(F.col("q") * F.col("q")).alias("norm2"))
        .select("vec_id", "norm2")
        .collect()
    )
    pos = {v: i + 1 for i, (nm, v) in enumerate(norms)}
    for r in out:
        assert r.rn == pos[r.vec_id]
    assert max((r.rn for r in lows), default=0) <= min(
        (r.rn for r in highs), default=n + 1
    )


def test_empty_training_sample_raises_plainly():
    """Training on an empty corpus is a PRECONDITION violation — a
    stated ValueError, not a bare max()-on-empty-sequence (r9
    empty-corpus probe)."""
    import pytest as _pytest

    from oracdc_spark.operators.pq import _sample_matrix

    with _pytest.raises(ValueError, match="training sample is empty"):
        _sample_matrix([])
