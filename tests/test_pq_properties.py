"""Property-based theorems for the PQ / ANN serving family.

The PQ stack's 100 TB story is "train once on a bounded sample, then
ONE distributed encode pass and LUT-only serving" — which is only
sound if the distributed passes compute exactly what the algorithm
says.  Three theorems, each against a literal scalar model on random
corpora (the trained codebook is taken as GIVEN — training quality is
the recall audits' job; these pin that the distributed encode and
serve are exact functions of that codebook):

* ENCODE: `pq_train_encode`'s (vec_id, sub, cluster) equals a scalar
  per-subspace argmin over the collected codebook — dist2 = |q|^2 -
  2*dot + |c|^2 in exact ints, empty clusters +inf, ties to the lowest
  cluster id (the `_assigned` contract, replayed independently);
* ADC SERVE: `pq_topk`'s full ranked output equals a scalar model that
  scores each query against the RECONSTRUCTED neighbors (sum of
  per-subspace LUT dots = dot with the assigned centroids) under the
  engine's qcos score and (score desc, neighbor_id asc) tie-break,
  including Spark's NaN-sorts-greatest rule;
* LSH BUCKETS: `hyperplane_lsh_buckets` equals the literal Charikar
  sign-pattern model over the unnormalized Walsh-Hadamard rotation
  y[o] = sum_j (-1)^popcount(o&j) * q[j].

Reference anchor: the serving shape mirrors FAISS's IndexPQ/ADC layout
(Jegou et al., TPAMI 2011); the reference repo has no ANN surface —
this family is the LLM-pipeline extension mandated by the build spec.
"""

from __future__ import annotations

import pytest

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from oracdc_spark.operators.pq import (
    hyperplane_lsh_buckets,
    pq_topk,
    pq_train_encode,
)

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# Exact-in-float grid (multiples of 1/4): quantization q = round(x*1000)
# has no rounding ambiguity, so the scalar model shares the engine's
# integers bit-for-bit.  Component 0 is forced nonzero so |q|^2 > 0 and
# the qcos denominator never hits 0/0 on the query side.
_GRID = [-1.0, -0.5, -0.25, 0.0, 0.25, 0.5, 1.0]
_NONZERO = [-0.5, -0.25, 0.25, 1.0]
_D = 4
_M = 2
_K = 2

_VEC = st.tuples(
    st.sampled_from(_NONZERO),
    *(st.sampled_from(_GRID) for _ in range(_D - 1)),
).map(list)
_CORPUS = st.lists(_VEC, min_size=2, max_size=8)


def _df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def _quant(v):
    return [int(round(x * 1000)) for x in v]


def _model_codes(vecs, cb_rows, m=_M, k=_K):
    """Scalar replay of the `_assigned` contract: per (vec, sub),
    argmin_c |q|^2 - 2*q.c + |c|^2 over the codebook, empty clusters
    +inf, first (lowest cluster id) minimum wins."""
    cent = {}  # (sub, cluster) -> {i: cq}
    for sub, cluster, i, cq in cb_rows:
        cent.setdefault((sub, cluster), {})[i] = cq
    out = set()
    for vid, v in enumerate(vecs):
        q = _quant(v)
        for sub in range(m):
            comps = {i: q[i] for i in range(len(q)) if i % m == sub}
            dists = []
            for c in range(k):
                cc = cent.get((sub, c))
                if cc is None:
                    dists.append((1 << 62) - 1)
                    continue
                qs2 = sum(qi * qi for i, qi in comps.items() if i in cc)
                dot = sum(qi * cc[i] for i, qi in comps.items() if i in cc)
                cc2 = sum(x * x for x in cc.values())
                dists.append(qs2 - 2 * dot + cc2)
            out.add((vid, sub, dists.index(min(dists))))
    return out


@given(vecs=_CORPUS)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_pq_encode_equals_argmin_model(spark, vecs):
    codes, cb = pq_train_encode(_df(spark, vecs), m=_M, k=_K, iters=1, sample_mod=1)
    cb_rows = [(r["sub"], r["cluster"], r["i"], r["cq"]) for r in cb.collect()]
    got = {(r["vec_id"], r["sub"], r["cluster"]) for r in codes.collect()}
    assert got == _model_codes(vecs, cb_rows)


@given(vecs=_CORPUS)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_pq_topk_equals_scalar_adc_model(spark, vecs):
    k_nb = 3
    got = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in pq_topk(
            _df(spark, vecs), query_mod=2, k_neighbors=k_nb, m=_M, k=_K, iters=1
        ).collect()
    }

    # Rebuild the model from the SAME trained codebook (cached per
    # corpus plan, so this retrains nothing) and the engine's codes.
    codes, cb = pq_train_encode(_df(spark, vecs), m=_M, k=_K, iters=1)
    cb_rows = [(r["sub"], r["cluster"], r["i"], r["cq"]) for r in cb.collect()]
    assigned = {
        (r["vec_id"], r["sub"]): r["cluster"] for r in codes.collect()
    }
    cent = {}
    for sub, cluster, i, cq in cb_rows:
        cent.setdefault((sub, cluster), {})[i] = cq

    expect = set()
    for qid, qv in enumerate(vecs):
        if qid % 2 != 0:
            continue
        q = _quant(qv)
        qn = sum(x * x for x in q)
        scored = []
        for nid in range(len(vecs)):
            if nid == qid:
                continue
            dot = 0
            cn = 0
            for sub in range(_M):
                cc = cent[(sub, assigned[(nid, sub)])]
                dot += sum(q[i] * cq for i, cq in cc.items() if i < len(q))
                cn += sum(cq * cq for cq in cc.values())
            denom = float(qn) * float(cn)
            if denom == 0.0:
                # zero-norm: qcos_score yields NULL, which sorts LAST
                # under the (score desc, id) window in both engines
                key = -math.inf
            else:
                key = math.copysign(1.0, dot) * (float(dot) * float(dot)) / denom
                if dot == 0:
                    key = 0.0
            scored.append((-key, nid))
        scored.sort()
        for rank, (_, nid) in enumerate(scored[:k_nb], start=1):
            expect.add((qid, nid, rank))
    assert got == expect


@given(vecs=_CORPUS)
@settings(**_SETTINGS)
def test_hyperplane_buckets_equal_sign_pattern_model(spark, vecs):
    n_bits, n_tables = 2, 2
    got = {
        (r["vec_id"], r["tbl"], r["bucket"])
        for r in hyperplane_lsh_buckets(
            _df(spark, vecs), n_bits=n_bits, n_tables=n_tables, d=_D
        ).collect()
    }
    expect = set()
    for vid, v in enumerate(vecs):
        q = _quant(v)
        y = [
            sum(
                (1 if bin(o & j).count("1") % 2 == 0 else -1) * q[j]
                for j in range(_D)
            )
            for o in range(_D)
        ]
        for t in range(n_tables):
            bucket = sum(
                (1 << b) for b in range(n_bits) if y[t * n_bits + b] > 0
            )
            expect.add((vid, t, bucket))
    assert got == expect
