"""PageRank over the trade graph (operators/graph.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from tests.conftest import SF_SMOKE


def test_pagerank_node_set_equals_src_distinct(spark):
    """The node set derived from the out-degree aggregate must equal
    the distinct src key set (the r6 plan optimization relies on it)."""
    from oracdc_spark.catalog import load_table
    from oracdc_spark.operators import graph

    edges = graph.trade_edges(
        load_table(spark, SF_SMOKE, "orders"),
        load_table(spark, SF_SMOKE, "lineitem"),
    )
    ranked = graph.pagerank(edges, iters=1)
    nodes = {r.node for r in ranked.select("node").collect()}
    srcs = {r.src for r in edges.select("src").distinct().collect()}
    assert nodes == srcs


def test_pagerank_mass_and_determinism(spark):
    """Exact-integer PR: damped base is constant, inbound contributions
    are integer div sums — two runs produce identical micro-unit
    values, and every pr >= the damped base."""
    from oracdc_spark.catalog import load_table
    from oracdc_spark.operators import graph

    o = load_table(spark, SF_SMOKE, "orders")
    l = load_table(spark, SF_SMOKE, "lineitem")
    a = graph.pagerank_top(o, l, iters=3, k=20).collect()
    b = graph.pagerank_top(o, l, iters=3, k=20).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert len(a) == 20
    assert all(r.pr >= graph.PR_BASE for r in a)
    assert [r.rank for r in a] == list(range(1, 21))


def test_triangle_count_k4_plus_isolated_edge(spark, tmp_path):
    """K4 (one 4-item order) has exactly 4 triangles and clustering 1.0
    even with an isolated edge attached elsewhere."""
    rows = [(1, p) for p in (1, 2, 3, 4)] + [(2, 5), (2, 6)]
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    sf = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{sf}/lineitem.parquet")
    from oracdc_spark.operators.graph import copurchase_triangles

    [r] = copurchase_triangles(spark, sf).collect()
    assert r.n_nodes == 6 and r.n_edges == 7
    assert r.n_triangles == 4
    # wedges: K4 nodes have degree 3 -> 4*3 = 12; edge nodes degree 1 -> 0
    assert r.n_wedges == 12  # the isolated edge adds none; 5-6 deg1
    assert r.clustering_coeff == 1.0


def test_triangle_orientation_counts_once(spark, tmp_path):
    """A single triangle sharing orders: counted exactly once however
    the degrees tie (all degree 2 — ties break by id)."""
    rows = [(1, 10), (1, 20), (2, 20), (2, 30), (3, 10), (3, 30)]
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    sf = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{sf}/lineitem.parquet")
    from oracdc_spark.operators.graph import copurchase_triangles

    [r] = copurchase_triangles(spark, sf).collect()
    assert r.n_triangles == 1 and r.n_edges == 3 and r.n_nodes == 3


def test_triangle_free_graph_counts_zero(spark, tmp_path):
    """A path graph (no triangles): the inner adjacency join drops every
    edge row, and the count must still be 0, not null."""
    rows = [(1, 10), (1, 20), (2, 20), (2, 30)]
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    sf = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{sf}/lineitem.parquet")
    from oracdc_spark.operators.graph import copurchase_triangles

    [r] = copurchase_triangles(spark, sf).collect()
    assert r.n_triangles == 0 and r.n_edges == 2 and r.n_wedges == 1
    assert r.clustering_coeff == 0.0


def test_wedge_free_graph_null_coefficient(spark):
    """A perfect matching (every degree 1) has zero wedges: the global
    clustering coefficient 3T/W is undefined — NULL, never a
    divide-by-zero error under ANSI mode."""
    from oracdc_spark.operators.graph import triangle_census

    edges = spark.createDataFrame([(1, 2), (3, 4)], "u bigint, v bigint")
    [r] = triangle_census(edges).collect()
    assert r.n_wedges == 0 and r.n_triangles == 0
    assert r.clustering_coeff is None


def _sym_edges(spark, pairs):
    df = spark.createDataFrame(pairs, "src string, dst string")
    return df.unionAll(df.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def test_kcore_cascade_peels_to_empty(spark):
    """Path a-b-c-d, k=2: round 1 removes the deg-1 endpoints, which
    drops b,c to degree 1; round 2 removes them — the cascade the
    simultaneous peel must follow."""
    from oracdc_spark.operators.graph import kcore_members

    e = _sym_edges(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    assert kcore_members(e, k=2, rounds=2).count() == 0
    # one round is NOT enough: survivors exist but are flagged non-core
    one = kcore_members(e, k=2, rounds=1).collect()
    assert {r.node for r in one} == {"b", "c"}
    assert all(r.is_core == 0 for r in one)


def test_kcore_triangle_with_tail_converges(spark):
    """Triangle abc + tail d: the tail peels, the triangle's degrees
    stay >= 2 — all survivors flagged core (converged)."""
    from oracdc_spark.operators.graph import kcore_members

    e = _sym_edges(
        spark, [("a", "b"), ("b", "c"), ("a", "c"), ("a", "d")]
    )
    out = kcore_members(e, k=2, rounds=3).collect()
    assert {r.node for r in out} == {"a", "b", "c"}
    assert all(r.is_core == 1 and r.core_deg == 2 for r in out)
