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


def test_scn_window_pushes_to_parquet_scan(spark, tmp_path):
    """F4's 100 TB claim (r9 verdict item 5): when the change feed is a
    materialized parquet table with a real `scn` column — the
    production layout; the sandbox feed only derives scn from the TPC-H
    keys — `cdc.scn_window` must reach the parquet reader as
    PushedFilters on scn (and prunes SCN-partitioned files).  A
    refactor that casts or wraps scn before filtering would silently
    demote the prune to a post-scan filter; this pins it."""
    import pyspark.sql.functions as F

    from oracdc_spark.operators import cdc

    path = str(tmp_path / "feed")
    spark.range(0, 1000).select(
        F.col("id").alias("scn"), (F.col("id") % 7).alias("op")
    ).write.mode("overwrite").parquet(path)
    df = cdc.scn_window(spark.read.parquet(path), 100, 200)
    [scan] = [
        ln
        for ln in df._jdf.queryExecution().executedPlan().toString().splitlines()
        if "FileScan parquet" in ln
    ]
    assert "GreaterThanOrEqual(scn,100)" in scan
    assert "LessThanOrEqual(scn,200)" in scan


def test_cdc_feed_scans_carry_window_constraints(spark):
    """The sandbox form of the same claim: `cdc_scn_window`'s
    synthesized feed derives scn from the TPC-H keys, and Catalyst must
    still fold the window into scan-node DataFilters on those keys
    (evaluated in the reader, before anything downstream).  If the
    derivation ever becomes opaque to the optimizer (a UDF, a
    non-deterministic wrapper), these constraints vanish from the scan
    lines and this fails."""
    import __spark_entry__ as e

    df = e.queries()["cdc_scn_window"](spark, SF_SMOKE)
    scans = [
        ln
        for ln in df._jdf.queryExecution().executedPlan().toString().splitlines()
        if "FileScan parquet" in ln
    ]
    assert scans, "no parquet scans in cdc_scn_window plan"
    # the scn derivation's affine form must appear as a scan DataFilter
    # on at least one base-table scan (customer keys: c_custkey*10+1e9)
    assert any("1000000000" in ln and "DataFilters: [" in ln for ln in scans)


def test_mvlog_scan_pushes_sequence_filter(spark):
    """S6's scan claim: the mview-log poll (last_seq watermark) must
    reach the parquet reader as a pushed range predicate — at 100 TB
    this is the difference between reading the new log tail and
    re-reading the whole log every poll."""
    import __spark_entry__ as e

    df = e.queries()["mvlog_batch"](spark, SF_SMOKE)
    scans = [
        ln
        for ln in df._jdf.queryExecution().executedPlan().toString().splitlines()
        if "FileScan parquet" in ln
    ]
    assert any("GreaterThan(o_orderkey,1000)" in ln for ln in scans), scans
