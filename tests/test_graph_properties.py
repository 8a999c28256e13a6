"""Property-based invariants for the graph family on arbitrary small
graphs (hypothesis-generated edge sets) — the theorems the fixed
trade-graph fixtures instantiate:

* a CONVERGED k-core peel (every row is_core=1) outputs exactly the
  maximal subgraph of minimum degree ≥ k (Seidman's definition): every
  member keeps ≥ k surviving neighbors, and no peeled node could
  re-enter (its degree among survivors is < k);
* pagerank conserves total mass in exact integer micro-units up to the
  documented floor-division loss: sum(pr) ≤ N·(BASE + 0.85·ONE) with
  every node present exactly once;
* the degree-oriented triangle count equals the brute-force count.
"""

from __future__ import annotations

import pytest

import itertools

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from oracdc_spark.operators import graph

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# undirected simple graphs on ≤ 8 nodes as sets of (u < v) pairs
_EDGES = st.sets(
    st.tuples(
        st.integers(min_value=0, max_value=7), st.integers(min_value=0, max_value=7)
    ).map(lambda t: (min(t), max(t))).filter(lambda t: t[0] != t[1]),
    min_size=1,
    max_size=16,
)


def _sym_df(spark, pairs):
    rows = [(u, v) for u, v in pairs] + [(v, u) for u, v in pairs]
    return spark.createDataFrame(rows, "src bigint, dst bigint")


@given(pairs=_EDGES, k=st.integers(min_value=1, max_value=3))
@settings(**_SETTINGS)
def test_kcore_converged_is_exact_core(spark, pairs, k):
    out = graph.kcore_members(_sym_df(spark, pairs), k=k, rounds=8).collect()
    # 8 rounds on ≤8 nodes always converges (each non-identity round
    # removes ≥1 node)
    assert all(r.is_core == 1 for r in out)
    members = {r.node for r in out}
    # exact reference: iteratively strip low-degree nodes to fixpoint
    adj = {}
    for u, v in pairs:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    alive = set(adj)
    while True:
        drop = {u for u in alive if len(adj[u] & alive) < k}
        if not drop:
            break
        alive -= drop
    assert members == alive
    for r in out:
        assert r.core_deg >= k


@given(pairs=_EDGES)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_pagerank_mass_bounded_and_total(spark, pairs):
    df = _sym_df(spark, pairs)
    out = graph.pagerank(df, iters=2).collect()
    nodes = {u for e in pairs for u in e}
    assert {r.node for r in out} == nodes
    assert len(out) == len(nodes)
    # integer mass: base + damped share, floor losses only ever shrink
    total = sum(r.pr for r in out)
    upper = len(nodes) * (graph.PR_BASE + 85 * graph.PR_ONE // 100)
    assert 0 < total <= upper


@given(pairs=_EDGES)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_triangle_census_matches_bruteforce(spark, pairs):
    nodes = sorted({u for e in pairs for u in e})
    eset = set(pairs)
    expected = sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if (a, b) in eset and (b, c) in eset and (a, c) in eset
    )
    pair_df = spark.createDataFrame(sorted(pairs), "u bigint, v bigint")
    [row] = graph.triangle_census(pair_df).collect()
    assert row.n_triangles == expected
    assert row.n_edges == len(pairs)
    assert row.n_nodes == len(nodes)
    # wedges: sum over nodes of C(deg, 2)
    deg = {}
    for u, v in pairs:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    assert row.n_wedges == sum(d * (d - 1) // 2 for d in deg.values())


@given(pairs=_EDGES, iters=st.integers(min_value=1, max_value=3))
@settings(**_SETTINGS)
@pytest.mark.slow
def test_pagerank_matches_integer_model(spark, pairs, iters):
    """Value-exact equivalence (stronger than the mass bound above):
    the distributed iteration equals a literal Python power iteration
    in the same integer micro-units — pr/deg and the 85% damping both
    floor-divide, contributions flow along every edge row, nodes are
    the out-degree key set."""
    out = {r.node: r.pr for r in graph.pagerank(_sym_df(spark, pairs), iters=iters).collect()}
    edges = [(u, v) for u, v in pairs] + [(v, u) for u, v in pairs]
    deg = {}
    for s, _d in edges:
        deg[s] = deg.get(s, 0) + 1
    pr = {n: graph.PR_ONE for n in deg}
    for _ in range(iters):
        inbound = {}
        for s, d in edges:
            inbound[d] = inbound.get(d, 0) + pr[s] // deg[s]
        pr = {
            n: graph.PR_BASE + 85 * inbound.get(n, 0) // 100 for n in deg
        }
    assert out == pr
