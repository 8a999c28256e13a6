"""Physical-plan anti-pattern gate over every declared query.

The scale conventions the per-operator docstrings promise — no
cartesian products, no row-at-a-time Python UDFs (Arrow-batched
`pandas_udf`/`mapInPandas` only) — were until now enforced by review.
This gate asserts them mechanically on the ANALYZED physical plan of
every `queries()` entry, so a regression (a dropped broadcast hint
turning a 1-row crossJoin into a real cartesian, a plain `F.udf` in a
hot path) fails the suite instead of waiting for a plan audit.

`BroadcastNestedLoopJoin` is deliberately allowed: it is exactly what a
`crossJoin(F.broadcast(one_row_aggregate))` plans to, and the 1-row
bound is the builder convention the laziness gate's docstring records.
`CartesianProduct` (a non-broadcast cross) and `BatchEvalPython` (a
row-at-a-time Python UDF; Arrow paths plan as ArrowEvalPython /
MapInPandas / FlatMapGroupsInPandas) are never acceptable.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE

BANNED = ("CartesianProduct", "BatchEvalPython")


@pytest.mark.slow
def test_declared_query_plans_have_no_antipatterns(spark):
    import __spark_entry__ as e

    violations = {}
    for name, fn in e.queries().items():
        df = fn(spark, SF_SMOKE)
        # executedPlan before any action = the planned physical tree
        # (under AQE the initial plan; re-optimization only ever swaps
        # sort-merge -> broadcast, never introduces the banned nodes)
        plan = df._jdf.queryExecution().executedPlan().toString()
        hits = [b for b in BANNED if b in plan]
        if hits:
            violations[name] = hits
    assert not violations, (
        "declared queries plan scale anti-patterns "
        f"(cartesian product / row-at-a-time Python UDF): {violations}"
    )


def _lineitem_scans(df):
    plan = df._jdf.queryExecution().executedPlan().toString()
    return [
        ln for ln in plan.splitlines()
        if "FileScan parquet" in ln and "l_" in ln
    ]


@pytest.mark.slow
def test_q6_scan_prunes_columns_and_pushes_filters(spark):
    """Column pruning + scan-level filtering on the flagship shapes —
    the two properties SCALING.md's Scans section promises.  q6 must
    read exactly its 4 lineitem columns (16 exist) with the shipdate
    range ON the scan node; q1 reads its 7 with the date bound on the
    scan.  A refactor that materializes an intermediate or casts before
    filtering would silently turn these into full-width scans — this
    pins them."""
    import __spark_entry__ as e

    qs = e.queries()
    [scan6] = _lineitem_scans(qs["q6_forecast_revenue"](spark, SF_SMOKE))
    cols6 = {
        c.split("#")[0]
        for c in scan6.split("[", 1)[1].split("]", 1)[0].split(",")
    }
    assert cols6 == {"l_quantity", "l_extendedprice", "l_discount", "l_shipdate"}
    assert "isnotnull(l_shipdate" in scan6 and "l_shipdate" in scan6

    [scan1] = _lineitem_scans(qs["q1_pricing_summary"](spark, SF_SMOKE))
    cols1 = {
        c.split("#")[0]
        for c in scan1.split("[", 1)[1].split("]", 1)[0].split(",")
    }
    assert cols1 == {
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate",
    }
    assert "isnotnull(l_shipdate" in scan1
