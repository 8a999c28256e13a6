"""Property: distributed Lloyd k-means equals a scalar integer model.

`clustering.kmeans_assignments` is the IVF cell trainer
(similarity_kmeans_cells): `iters` Lloyd steps from the ``vec_id % k``
seed over quantized integer components, centroids floor(sum/count),
exact integer squared distances, argmin ties to the LOWEST cluster id,
empty clusters coalesced to a +inf sentinel.  Its DuckDB oracle replays
the same chain, so — like BPE before r9 — a defect in the chain itself
would be invisible to the driver gate.  This scalar model (plain Python
ints, an independent formulation: per-vector loops instead of the
engine's pivoted array algebra) pins every contract above on random
corpora wider than the fixtures: ragged cluster sizes, emptied
clusters, argmin ties, negative components.

r10: written for the oracle-authorship audit (r9 verdict item 2) —
`similarity_kmeans_cells` / `similarity_cell_centroids` were the last
replay-only ANN family without an independent model property.
"""

from __future__ import annotations

import pytest

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from oracdc_spark.operators.clustering import kmeans_assignments, kmeans_profile

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# grid values whose *1000 quantization is exact in float32 and double —
# the property targets the Lloyd chain, not rounding edges (those are
# pinned by the similarity quantization properties)
_GRID = [-1.0, -0.5, -0.25, 0.0, 0.25, 0.5, 1.0]
_D = 3
_VEC = st.tuples(*(st.sampled_from(_GRID) for _ in range(_D))).map(list)
_CORPUS = st.lists(_VEC, min_size=2, max_size=10)

_SENTINEL = (1 << 62) - 1


def _model(vecs, k, iters):
    """Scalar Lloyd replay: {vec_id: (cluster, dist2)} after `iters`."""
    q = {i: [int(round(x * 1000)) for x in v] for i, v in enumerate(vecs)}
    assign = {i: i % k for i in q}
    dist2 = {}
    for _ in range(iters):
        # refit: floor(sum/count) per (cluster, component)
        cents = {}
        for c in range(k):
            members = [i for i, a in assign.items() if a == c]
            if members:
                cents[c] = [
                    math.floor(sum(q[i][j] for i in members) / len(members))
                    for j in range(_D)
                ]
        # reassign: exact integer d2, empty cluster = sentinel,
        # argmin ties to the lowest cluster id
        new = {}
        for i in q:
            dists = [
                sum((q[i][j] - cents[c][j]) ** 2 for j in range(_D))
                if c in cents
                else _SENTINEL
                for c in range(k)
            ]
            best = min(range(k), key=lambda c: (dists[c], c))
            new[i] = best
            dist2[i] = dists[best]
        assign = new
    return {i: (assign[i], dist2[i]) for i in q}


def _df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


@given(vecs=_CORPUS)
@settings(**_SETTINGS)
def test_kmeans_assignments_match_scalar_lloyd_model(spark, vecs):
    k, iters = 3, 2
    got = {
        r.vec_id: (r.cluster, r.dist2)
        for r in kmeans_assignments(_df(spark, vecs), k=k, iters=iters).collect()
    }
    assert got == _model(vecs, k, iters)


@given(vecs=_CORPUS)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_kmeans_profile_matches_model_aggregate(spark, vecs):
    k, iters = 3, 2
    model = _model(vecs, k, iters)
    expect = {}
    for c, d2 in model.values():
        n, wss = expect.get(c, (0, 0))
        expect[c] = (n + 1, wss + d2)
    got = {
        r.cluster: (r.n, r.wss)
        for r in kmeans_profile(_df(spark, vecs), k=k, iters=iters).collect()
    }
    assert got == expect
