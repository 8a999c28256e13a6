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
