"""Property: the exact cosine serving path equals scalar models.

`cosine_scores` / `brute_force_topk` are the GROUND TRUTH every ANN
recall/purity audit in the engine measures against (pq/opq/sq8/ivf/
hyperplane/matryoshka/nprobe) — an error here would silently re-grade
every approximate structure.  Scalar replays on random corpora pin:

* the quantized-cosine contract itself — q = HALF_UP(x*1000), exact
  integer dots/norms, sign(dot)*dot^2/(qn*cn) in one IEEE division,
  bit-for-bit;
* the (score desc, neighbor_id asc) top-k tie-break;
* `decontamination_screen`'s per-train argmax over the eval batch
  (ties to the LOWER eval id) and its raw-score threshold applied
  before the 6-place display rounding.
"""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from oracdc_spark.operators.similarity import (
    brute_force_topk,
    cosine_scores,
    decontamination_screen,
)

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_GRID = [-1.0, -0.5, -0.25, 0.0, 0.25, 0.5, 1.0]
_NONZERO = [-0.5, -0.25, 0.25, 1.0]
_D = 3

# all-zero vectors INCLUDED: zero-norm rows must score NULL (sort last,
# fail thresholds) rather than crash — the ANSI divide-by-zero defect
_VEC = st.one_of(
    st.just([0.0] * _D),
    st.tuples(
        st.sampled_from(_NONZERO), *(st.sampled_from(_GRID) for _ in range(_D - 1))
    ).map(list),
)
_CORPUS = st.lists(_VEC, min_size=2, max_size=8)


def _df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def _q(v):
    return [int(round(x * 1000)) for x in v]


def _score(a, b):
    qa, qb = _q(a), _q(b)
    qn = sum(x * x for x in qa)
    cn = sum(x * x for x in qb)
    if qn == 0 or cn == 0:
        return None  # qcos_score: NULL on zero norms
    dot = sum(x * y for x, y in zip(qa, qb))
    if dot == 0:
        return 0.0
    s = float(dot) * float(dot) / (float(qn) * float(cn))
    return s if dot > 0 else -s


def _key(score):
    return -float("inf") if score is None else score


@given(vecs=_CORPUS)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_cosine_scores_match_scalar_model(spark, vecs):
    df = _df(spark, vecs)
    queries = df.filter("vec_id % 2 = 0")
    got = {
        (r.query_id, r.neighbor_id, r.score)
        for r in cosine_scores(queries, df).collect()
    }
    expect = {
        (i, j, _score(vecs[i], vecs[j]))
        for i in range(0, len(vecs), 2)
        for j in range(len(vecs))
        if i != j
    }
    assert got == expect


@given(vecs=_CORPUS)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_brute_force_topk_matches_ranked_model(spark, vecs):
    k = 3
    got = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in brute_force_topk(_df(spark, vecs), query_mod=2, k=k).collect()
    }
    expect = set()
    for i in range(0, len(vecs), 2):
        scored = sorted(
            ((-_key(_score(vecs[i], vecs[j])), j) for j in range(len(vecs)) if j != i)
        )
        for rank, (_, j) in enumerate(scored[:k], start=1):
            expect.add((i, j, rank))
    assert got == expect


@given(vecs=_CORPUS)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_decontamination_screen_matches_argmax_model(spark, vecs):
    from decimal import ROUND_HALF_UP, Decimal

    thr = 0.16
    got = {
        (r.vec_id, r.eval_id, r.score)
        for r in decontamination_screen(
            _df(spark, vecs), eval_mod=2, threshold_score=thr
        ).collect()
    }
    evals = [i for i in range(len(vecs)) if i % 2 == 0]
    expect = set()
    for t in range(len(vecs)):
        if t % 2 == 0:
            continue
        best = min(((-_key(_score(vecs[e], vecs[t])), e) for e in evals))
        score = -best[0]
        if score != -float("inf") and score >= thr:
            r6 = float(
                Decimal(repr(score)).quantize(
                    Decimal("0.000001"), rounding=ROUND_HALF_UP
                )
            )
            expect.add((t, best[1], r6))
    assert got == expect


@given(vecs=_CORPUS, labels=st.lists(st.integers(0, 2), min_size=8, max_size=8))
@settings(**_SETTINGS)
@pytest.mark.slow
def test_hard_negatives_match_label_filtered_ranking(spark, vecs, labels):
    from oracdc_spark.operators.similarity import hard_negatives

    k = 3
    lab = {i: labels[i % len(labels)] for i in range(len(vecs))}
    df = spark.createDataFrame(
        [(i, [float(x) for x in v], lab[i]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>, label int",
    )
    got = {
        (r.query_id, r.negative_id, r.rank)
        for r in hard_negatives(df, query_mod=2, k=k).collect()
    }
    expect = set()
    for q in range(0, len(vecs), 2):
        scored = sorted(
            (-_key(_score(vecs[q], vecs[j])), j)
            for j in range(len(vecs))
            if j != q and lab[j] != lab[q]
        )
        for rank, (_, j) in enumerate(scored[:k], start=1):
            expect.add((q, j, rank))
    assert got == expect


@given(vecs=_CORPUS)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_norm_outliers_match_global_rank_model(spark, vecs):
    """norm_outliers' bin-decomposed global rank equals a literal
    (norm2, vec_id) sort: low iff 100*rn <= pct*n, high iff
    100*rn > (100-pct)*n — integer-cleared, no value thresholds."""
    from oracdc_spark.operators.similarity import norm_outliers

    pct = 30
    got = {
        (r.vec_id, r.norm2, r.rn, r.side)
        for r in norm_outliers(_df(spark, vecs), pct=pct).collect()
    }
    norms = sorted(
        (sum(x * x for x in _q(v)), i) for i, v in enumerate(vecs)
    )
    n = len(norms)
    expect = set()
    for rn, (n2, i) in enumerate(norms, start=1):
        if 100 * rn <= pct * n:
            expect.add((i, n2, rn, "low"))
        elif 100 * rn > (100 - pct) * n:
            expect.add((i, n2, rn, "high"))
    assert got == expect


def test_null_score_topk_parity(spark):
    """r10 (ADVICE item 2): NULL-scored (zero-norm) neighbors MAY occupy
    trailing top-k slots when a query has fewer than k non-NULL
    candidates — deliberately, because every DuckDB oracle replays the
    same (score DESC, neighbor_id) ROW_NUMBER window.  This pins the
    cross-engine agreement on exactly that edge: a 1-query corpus with
    2 scoreable neighbors, 2 zero-norm neighbors, and k=5 must serve
    the zero-norm rows in the SAME trailing rank order in both engines
    (no sf corpus has zero-norm rows, so only this synthetic corpus
    exercises the contract)."""
    import duckdb

    vecs = [
        (0, [1.0, 0.0, 0.0, 0.0]),   # the query (vec_id % 100 == 0)
        (1, [1.0, 1.0, 0.0, 0.0]),
        (2, [0.0, 0.0, 0.0, 0.0]),   # zero-norm
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [0.0, 0.0, 0.0, 0.0]),   # zero-norm
    ]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs],
        "vec_id long, embedding array<float>",
    )
    got = sorted(
        (r.query_id, r.neighbor_id, r.rank)
        for r in brute_force_topk(df, query_mod=100, k=5).collect()
    )
    # zero-norm neighbors (2, 4) trail the scoreable ones (1, 3) in the
    # rank order; `got` is sorted by neighbor_id for the comparison
    assert got == [(0, 1, 1), (0, 2, 3), (0, 3, 2), (0, 4, 4)]

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE v AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, {v!r}::DOUBLE[])" for i, v in vecs)
        + ") t(vec_id, embedding)"
    )
    duck = con.execute(
        """
        WITH q AS (
          SELECT vec_id, CAST(u.i AS BIGINT) AS i,
                 CAST(round(embedding[u.i + 1] * 1000, 0) AS BIGINT) AS qv
          FROM v, UNNEST(range(0, len(embedding))) u(i)
        ),
        n AS (SELECT vec_id, SUM(qv * qv) AS norm2 FROM q GROUP BY vec_id),
        d AS (
          SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                 SUM(a.qv * b.qv) AS dot
          FROM q a JOIN q b USING (i)
          WHERE a.vec_id % 100 = 0 AND a.vec_id <> b.vec_id
          GROUP BY 1, 2
        ),
        s AS (
          SELECT query_id, neighbor_id,
                 CASE WHEN qn.norm2 * cn.norm2 <> 0
                      THEN sign(dot) * (CAST(dot AS DOUBLE) * dot)
                           / (CAST(qn.norm2 AS DOUBLE) * cn.norm2)
                 END AS score
          FROM d JOIN n qn ON qn.vec_id = d.query_id
                 JOIN n cn ON cn.vec_id = d.neighbor_id
        )
        SELECT query_id, neighbor_id,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY score DESC, neighbor_id) AS INT) AS rank
        FROM s QUALIFY rank <= 5 ORDER BY 1, 3
        """
    ).fetchall()
    assert sorted(duck) == got


def _half_up(v):
    from decimal import ROUND_HALF_UP, Decimal

    return int(Decimal(repr(float(v))).quantize(Decimal("1"), rounding=ROUND_HALF_UP))


@given(vecs=_CORPUS)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_sq8_topk_matches_scalar_codec_model(spark, vecs):
    """r10 (oracle-authorship audit): the full SQ8 serving chain —
    per-dim min/max train, HALF_UP affine byte codes (flat dim -> 0),
    decode back to the quantized-integer domain, exact-integer ADC
    scoring, (score DESC NULLS LAST, neighbor_id) top-k excluding self —
    equals a scalar replay in plain Python floats/Decimals.  Pins the
    codec+scoring chain itself, not just recall against brute force."""
    from oracdc_spark.operators.similarity import sq8_topk

    k = 3
    n, d = len(vecs), len(vecs[0])
    xs = [[float(np_x) for np_x in v] for v in vecs]
    mn = [min(x[i] for x in xs) for i in range(d)]
    mx = [max(x[i] for x in xs) for i in range(d)]
    codes = [
        [
            _half_up((x[i] - mn[i]) * 255 / (mx[i] - mn[i])) if mx[i] > mn[i] else 0
            for i in range(d)
        ]
        for x in xs
    ]
    dec = [
        [_half_up((mn[i] + c[i] * (mx[i] - mn[i]) / 255) * 1000) for i in range(d)]
        for c in codes
    ]
    qv = {j: _q(xs[j]) for j in range(0, n, 2)}
    expect = set()
    for qid, q in qv.items():
        scored = []
        for nb in range(n):
            if nb == qid:
                continue
            dot = sum(a * b for a, b in zip(q, dec[nb]))
            qn = sum(a * a for a in q)
            cn = sum(b * b for b in dec[nb])
            s = None
            if qn * cn != 0:
                s = (1 if dot > 0 else -1 if dot < 0 else 0) * float(dot) * dot / (
                    float(qn) * cn
                )
            scored.append((-_key(s), nb))
        for rank, (_, nb) in enumerate(sorted(scored)[:k], start=1):
            expect.add((qid, nb, rank))
    got = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in sq8_topk(_df(spark, vecs), query_mod=2, k=k).collect()
    }
    assert got == expect


@given(
    vecs=_CORPUS,
    labels=st.lists(st.integers(0, 2), min_size=8, max_size=8),
)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_ivf_topk_matches_cell_restricted_model(spark, vecs, labels):
    """r10 (oracle-authorship audit): single-cell IVF serving equals
    the scalar model — candidates are exactly the OTHER members of the
    query's own label cell, scored by the quantized-cosine contract,
    (score DESC NULLS LAST, neighbor_id) top-k."""
    from oracdc_spark.operators.similarity import ivf_topk

    k = 2
    lab = {i: labels[i % len(labels)] for i in range(len(vecs))}
    df = spark.createDataFrame(
        [(i, [float(x) for x in v], lab[i]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>, label int",
    )
    expect = set()
    for qid in range(0, len(vecs), 2):
        scored = sorted(
            (-_key(_score(vecs[qid], vecs[nb])), nb)
            for nb in range(len(vecs))
            if nb != qid and lab[nb] == lab[qid]
        )
        for rank, (_, nb) in enumerate(scored[:k], start=1):
            expect.add((qid, nb, rank))
    got = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in ivf_topk(df, query_mod=2, k=k).collect()
    }
    assert got == expect


@given(
    vecs=_CORPUS,
    labels=st.lists(st.integers(0, 1), min_size=8, max_size=8),
)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_near_dups_match_scalar_banded_model(spark, vecs, labels):
    """r10 (oracle-authorship audit): `embedding_near_dups` equals a
    fully independent scalar replay — hyperplane r_b[i] =
    ((1009·b + 9173·i) mod 2003) − 1001, bit = (Σ q_i·r_b[i] >= 0),
    two 4-bit band values, candidate iff the pair shares (cell, band
    value) on >= 1 band, exact quantized-cosine rescore, emit iff
    score >= threshold with v1 < v2.  Pins the banding arithmetic, the
    bucket-join pairing, and the rescore gate in one theorem (the LSH
    recall trade-off is the documented contract: band-disagreeing true
    pairs are ABSENT on both sides)."""
    from oracdc_spark.operators.similarity import embedding_near_dups

    thr = 0.16
    lab = {i: labels[i % len(labels)] for i in range(len(vecs))}
    df = spark.createDataFrame(
        [(i, [float(x) for x in v], lab[i]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>, label int",
    )
    got = {
        (r.v1, r.v2): r.score for r in embedding_near_dups(df, thr).collect()
    }

    def bands(v):
        q = _q(v)
        out = []
        for k in range(2):
            val = 0
            for j in range(4):
                b = k * 4 + j
                s = sum(
                    qi * (((1009 * b + 9173 * i) % 2003) - 1001)
                    for i, qi in enumerate(q)
                )
                val += (1 if s >= 0 else 0) << j
            out.append(val)
        return out

    sig = [bands(v) for v in vecs]
    expect = {}
    for i in range(len(vecs)):
        for j in range(i + 1, len(vecs)):
            if lab[i] != lab[j]:
                continue
            if not any(sig[i][k] == sig[j][k] for k in range(2)):
                continue
            s = _score(vecs[i], vecs[j])
            if s is not None and s >= thr:
                expect[(i, j)] = s
    assert got == expect


@given(vecs=_CORPUS)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_matryoshka_recall_matches_truncated_ranking_model(spark, vecs):
    """r10 (oracle-authorship audit): the MRL prefix-truncation audit
    equals the scalar model — for each prefix width d, rank neighbors
    by the quantized cosine over the FIRST d components only, count the
    overlap with the full-width top-k, one row per (dims, query) with
    recall = overlap / k (queries with no truncated matches keep their
    row at 0)."""
    from oracdc_spark.operators.similarity import matryoshka_recall

    k, dims = 2, (2, 1)

    def topk(qid, width):
        scored = sorted(
            (-_key(_score(vecs[qid][:width], vecs[nb][:width])), nb)
            for nb in range(len(vecs))
            if nb != qid
        )
        return {nb for _, nb in scored[:k]}

    expect = {}
    full_w = len(vecs[0])
    for qid in range(0, len(vecs), 2):
        full = topk(qid, full_w)
        for d in dims:
            n = len(topk(qid, d) & full)
            expect[(d, qid)] = (n, round(n / k, 6))
    got = {
        (r.dims, r.query_id): (r.n_matches, r.recall)
        for r in matryoshka_recall(_df(spark, vecs), query_mod=2, k=k, dims=dims).collect()
    }
    assert got == expect


@given(
    vecs=_CORPUS,
    labels=st.lists(st.integers(0, 2), min_size=8, max_size=8),
)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_ivf_multiprobe_matches_scalar_model(spark, vecs, labels):
    """r10 (oracle-authorship audit): multi-probe IVF equals the scalar
    replay — integer centroids round-HALF-UP(sum/count) per occupied
    cell, probe set = the n_probe nearest cells by exact integer
    squared distance (ties to the lower cell id), candidates = members
    of probed cells minus self, quantized-cosine rescore,
    (score DESC NULLS LAST, neighbor_id) top-k.  Covers the knob the
    nprobe-curve audit sweeps."""
    from oracdc_spark.operators.similarity import ivf_multiprobe_topk

    k, n_probe = 2, 2
    lab = {i: labels[i % len(labels)] for i in range(len(vecs))}
    df = spark.createDataFrame(
        [(i, [float(x) for x in v], lab[i]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>, label int",
    )
    got = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in ivf_multiprobe_topk(df, query_mod=2, k=k, n_probe=n_probe).collect()
    }

    d = len(vecs[0])
    cells = sorted({lab[i] for i in range(len(vecs))})
    cents = {}
    for c in cells:
        members = [i for i in range(len(vecs)) if lab[i] == c]
        cents[c] = [
            _half_up(sum(_q(vecs[i])[j] for i in members) / len(members))
            for j in range(d)
        ]
    expect = set()
    for qid in range(0, len(vecs), 2):
        q = _q(vecs[qid])
        dists = sorted(
            (sum((q[j] - cents[c][j]) ** 2 for j in range(d)), c) for c in cells
        )
        probed = {c for _, c in dists[:n_probe]}
        scored = sorted(
            (-_key(_score(vecs[qid], vecs[nb])), nb)
            for nb in range(len(vecs))
            if nb != qid and lab[nb] in probed
        )
        for rank, (_, nb) in enumerate(scored[:k], start=1):
            expect.add((qid, nb, rank))
    assert got == expect
