"""Declared relational operators (SURVEY §2.6): sort/limit/agg/window/
set-op/join coverage over the testdata star schema, plus event-stream
analytics (tumbling windows, sessionization, running totals) in their
batch-parity form.

Determinism contract with the DuckDB oracle: monetary aggregates are
summed as DECIMAL (exact, order-independent) and only cast to double at
the end; averages are derived as sum/count double division; running sums
follow a total per-partition order so the fp addition sequence is
identical in both engines.

Scale notes inline — joins declare broadcast for dimension tables, aggs
are partial-aggregated map-side by Catalyst, windows partition on the
natural key (never a global sort except the declared top-k).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from oracdc_spark.catalog import load_table

DEC = "decimal(18,2)"


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary over lineitem (filter → groupBy →
    6 aggregates). Filter pushes to parquet; aggregation is one shuffle
    with map-side partials."""
    l = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast(DEC)
    price = F.col("l_extendedprice").cast(DEC)
    disc = F.col("l_discount").cast(DEC)
    tax = F.col("l_tax").cast(DEC)
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * (F.lit(1).cast(DEC) - disc)).cast("double").alias("sum_disc_price"),
            F.sum(price * (F.lit(1).cast(DEC) - disc) * (F.lit(1).cast(DEC) + tax))
            .cast("double")
            .alias("sum_charge"),
            (F.sum(qty).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join customer⨝orders⨝lineitem with selective filters + top-10 by
    revenue.  orders and customer grow with scale factor — no broadcast
    hints: lineitem⨝orders shuffles on orderkey and AQE promotes a side
    to broadcast only when its post-filter size is genuinely small."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1997-01-01"))
    l = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice").cast(DEC) * (F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC))
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
            "revenue",
        )
    )


def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five-way star join (region→nation→customer→orders→lineitem) +
    revenue per nation.  region/nation are true fixed-size dimensions
    (25 rows) and get explicit broadcasts; orders/customer are fact-sized
    and shuffle on their keys, with AQE free to broadcast at runtime."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice").cast(DEC) * (F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC))
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


def top_orders(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    """Global top-k (sort+limit). Spark executes as TakeOrderedAndProject —
    per-partition top-k then driver merge, no full sort at scale."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(k)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


def customer_order_rank(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """Window function: top-k orders per customer by totalprice
    (rank over partitioned window; one shuffle on o_custkey)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("o_custkey", "o_orderkey", "o_totalprice", F.col("rk").cast("bigint").alias("rk"))
    )


def customers_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operators: customers with open ('O') orders EXCEPT customers
    with finished ('F') orders, UNION ALL marker for INTERSECT of P/O.
    Declares except/intersect/union in one checkable result."""
    o = load_table(spark, sf_dir, "orders")
    open_c = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    fin_c = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    part_c = o.filter(F.col("o_orderstatus") == "P").select("o_custkey")
    only_open = open_c.subtract(fin_c).withColumn("tag", F.lit("open_only"))
    both = part_c.intersect(open_c).withColumn("tag", F.lit("partial_and_open"))
    return only_open.unionAll(both).select("o_custkey", "tag")


def orders_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregation (status × priority hierarchy + subtotals +
    grand total) — the grouping-sets operator family."""
    o = load_table(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("sum_price"),
    )


def orders_rank_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-statistic window breadth: percent_rank, cume_dist, and
    NTILE(4) over order value within each status — the §2.6 window
    functions the TPC-H shapes don't otherwise exercise.  All three
    share ONE (o_orderstatus)-partitioned sort; percent_rank's
    (rank−1)/(n−1) and cume_dist's peers/n are single IEEE divisions of
    exact integers, identical in any engine.  Top-5 rows per status by
    the sort key keep the output bounded."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    ranked = o.select(
        "o_orderstatus",
        "o_orderkey",
        "o_totalprice",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.row_number().over(w).alias("rn"),
    )
    return ranked.filter(F.col("rn") <= 5).drop("rn")


def orders_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with mixed, non-hierarchical sets —
    (status × priority), (status × year), grand total — plus
    ``GROUPING()`` markers distinguishing NULL-as-aggregate from
    NULL-as-value, completing the grouping-sets family next to ROLLUP
    and CUBE.  One Expand + one aggregate exchange: at scale the Expand
    factor equals the set count (3), same plan class as the CUBE
    datasheet."""
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        "o_orderstatus",
        "o_orderpriority",
        F.year("o_orderdate").cast("bigint").alias("yr"),
        "o_totalprice",
    )
    base.createOrReplaceTempView("_gs_orders")
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority, yr,
               CAST(GROUPING(o_orderstatus) AS INT) AS g_st,
               CAST(GROUPING(o_orderpriority) AS INT) AS g_pr,
               CAST(GROUPING(yr) AS INT) AS g_yr,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS {DEC})) AS DOUBLE) AS sum_price
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus, yr), ())
        """
    )


def conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-style conditional aggregation: priority-class counts per
    order status (CASE inside SUM — no extra scan per class)."""
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return o.groupBy("o_orderstatus").agg(
        F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
        F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
    )


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join: customers that never ordered (NOT EXISTS). Broadcast
    anti join — the orders key set is the small side after distinct."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return c.join(o, "c_custkey", "anti").select("c_custkey", "c_name", "c_mktsegment")


def promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-style: LIKE-filtered revenue share (promo part revenue /
    total revenue). Ratio = one double division of exact decimal sums.
    part is fact-sized (grows with SF) — the join shuffles on partkey
    unless AQE measures the scan small enough to broadcast."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice").cast(DEC) * (F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC))).cast(
        "decimal(18,4)"
    )
    j = l.join(p, F.col("l_partkey") == F.col("p_partkey"))
    return j.agg(
        (
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0).cast("decimal(18,4)"))).cast("double")
            / F.sum(rev).cast("double")
        ).alias("promo_revenue_pct")
    )


def orders_above_cust_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery pattern: orders exceeding their customer's
    average order value.  Decorrelated to a *window* aggregate rather
    than aggregate+self-join: one shuffle on o_custkey, no join, and no
    broadcast of a per-customer (fact-sized) aggregate.  avg derived as
    exact-decimal sum / count → engine-deterministic double."""
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    avg_price = (
        F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double")
        / F.count(F.lit(1)).over(w)
    )
    return (
        o.withColumn("avg_price", avg_price)
        .filter(F.col("o_totalprice") > F.col("avg_price"))
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


def orders_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-dimension aggregation: orders per year × status with exact
    decimal revenue (year extraction pushes into the scan's projection)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").cast("bigint").alias("yr"),
            "o_orderstatus",
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("revenue"),
        )
    )


def orders_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all grouping-set combinations."""
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: highly selective scan + single aggregate — the
    filter-pushdown showcase (every predicate reaches the parquet
    reader; the whole query is one map-side-combined scan, no join, one
    1-row exchange)."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast(DEC) * F.col("l_discount").cast(DEC)
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n_lineitems"),
        )
    )


def orders_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: status rows × priority columns (explicit value list — at
    scale the value list must be declared, not inferred, to keep the
    plan a single pass; Spark's inferring pivot adds a distinct scan).
    Compiles to one groupBy with conditional aggregates — same cost as
    conditional_agg, just a different output shape."""
    o = load_table(spark, sf_dir, "orders")
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    piv = (
        o.groupBy("o_orderstatus")
        .pivot("o_orderpriority", prios)
        .agg(F.count(F.lit(1)))
    )
    cols = {p: f"p{p[0]}" for p in prios}  # stable ANSI-friendly names
    return piv.select(
        "o_orderstatus",
        *[F.coalesce(F.col(f"`{p}`"), F.lit(0)).cast("bigint").alias(cols[p]) for p in prios],
    )


def lineitem_distinct_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple exact COUNT(DISTINCT) per group (expand-based plan)."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


def supplier_min_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 pattern: min-per-group subquery joined back (suppliers
    holding their nation's minimum account balance).  The broadcast side
    is one row per nation — ≤25 rows at any scale factor — so the hint
    is scale-safe."""
    s = load_table(spark, sf_dir, "supplier")
    m = s.groupBy("s_nationkey").agg(F.min("s_acctbal").alias("min_bal"))
    return (
        s.join(F.broadcast(m), "s_nationkey")
        .filter(F.col("s_acctbal") == F.col("min_bal"))
        .select("s_nationkey", "s_suppkey", "s_name", "s_acctbal")
    )


def events_topk_per_type(spark: SparkSession, sf_dir: str, k: int = 5) -> DataFrame:
    """Per-group top-k (window rank): highest-value events per type."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.col("value").desc(), F.col("event_id"))
    return (
        e.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("event_type", "event_id", F.round("value", 6).alias("value"), F.col("rk").cast("bigint").alias("rk"))
    )


def big_orders_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 pattern: groups filtered by an aggregate (HAVING)."""
    l = load_table(spark, sf_dir, "lineitem")
    qty = F.sum(F.col("l_quantity").cast(DEC)).cast("double")
    return (
        l.groupBy("l_orderkey")
        .agg(qty.alias("total_qty"), F.count(F.lit(1)).alias("n_lines"))
        .filter(F.col("total_qty") > 150.0)
    )


def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation (batch parity of the streaming windowed
    agg): events per hour × type, sum(value) as exact-decimal."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
    )


def events_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running total ordered by (ts, event_id) — the batch form
    of a stateful running aggregate. Identical fp addition order in both
    engines → exact match (still rounded defensively)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        F.round(F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double"), 6).alias(
            "running_value"
        ),
    )


def events_sessionize(spark: SparkSession, sf_dir: str, gap_minutes: int = 30) -> DataFrame:
    """Sessionization: a new session starts when the gap to the previous
    event of the same user exceeds `gap_minutes` (batch parity of a
    session-window stateful op). Output: per-session stats."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = gap_minutes * 60 * 1_000_000
    prev_ts = F.lag(F.unix_micros(F.col("ts"))).over(w)
    new_sess = (
        F.when(prev_ts.isNull(), F.lit(1))
        .when(F.unix_micros(F.col("ts")) - prev_ts > gap_us, F.lit(1))
        .otherwise(F.lit(0))
    )
    sess = e.withColumn("new_sess", new_sess).withColumn(
        "session_id", F.sum("new_sess").over(w)
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(F.unix_micros("ts")).alias("start_us"),
        F.max(F.unix_micros("ts")).alias("end_us"),
    )


def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase event credits its value to
    the user's most recent PRECEDING non-purchase event type — the
    standard marketing-attribution consumer of a clickstream (credit
    flows to the channel that closed the conversion).

    One exchange: the carry-forward is ``last(..., ignorenulls)`` over
    the per-user (ts, event_id) window ending 1 row before current —
    no self-join, same single-shuffle shape as sessionize.  Purchases
    with no prior touch land in the '(none)' bucket.  Values are
    quantized to integer thousandths before the sum (exact,
    order-independent), one final IEEE division.

    Output: (touch_type, n_attributed, credited_value)."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    purchases = (
        e.withColumn("touch_type", F.coalesce(touch, F.lit("(none)")))
        .filter(F.col("event_type") == "purchase")
        .select(
            "touch_type",
            F.round(F.col("value") * 1000).cast("bigint").alias("qv"),
        )
    )
    return purchases.groupBy("touch_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_attributed"),
        F.round(F.sum("qv").cast("double") / 1000, 3).alias("credited_value"),
    )


def events_zscore_outliers(
    spark: SparkSession, sf_dir: str, z_threshold: float = 3.0
) -> DataFrame:
    """Per-type z-score outlier detection — the metric-QC gate that
    flags instrumentation bugs and value-scale drift in an event feed
    (and, on a training corpus, feature-value anomalies).

    Two-pass-free: mean and variance come from ONE grouped aggregate of
    exact integer sums (n, Σqv, Σqv² over milli-quantized values — the
    engine's quantize-before-aggregate convention, so the sums are
    order-independent), broadcast back onto the stream as a 5-row
    lookup; the z computation and threshold are pure codegen — one
    shuffle total, no window.  Types with zero variance are excluded
    (z undefined).  z is computed in a fixed IEEE order:
    (qv − S/n) / sqrt(Q/n − (S/n)²), rounded to 4.

    Output: (event_id, event_type, value, z) for |z| ≥ z_threshold."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        "value",
        F.round(F.col("value") * 1000).cast("bigint").alias("qv"),
    )
    st = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("qv").cast("bigint").alias("s"),
        F.sum(F.col("qv") * F.col("qv")).cast("bigint").alias("q"),
    )
    mean = F.col("s").cast("double") / F.col("n")
    var = F.col("q").cast("double") / F.col("n") - mean * mean
    z = (F.col("qv").cast("double") - mean) / F.sqrt(var)
    return (
        e.join(F.broadcast(st), "event_type")
        .filter(var > 0)
        .withColumn("z", F.round(z, 4))
        .filter(F.abs(F.col("z")) >= z_threshold)
        .select("event_id", "event_type", "value", "z")
    )


def events_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-histogram quantile estimation audited against the
    exact rank — the quantile member of the sketch-audit family (CMS /
    HLL / Bloom / WAU-HLL follow the same convention: the approximate
    structure ships WITH an exact-oracle error measurement).

    The sketch is a 101-bin unit histogram over milli-quantized values
    (``bin = qv div 1000``) — bin counts are trivially mergeable across
    partitions/days, the 100 TB serving shape.  The EXACT p-quantile is
    computed with no global sort via the value-histogram decomposition
    (the perplexity-buckets machinery): qv has a bounded value domain,
    so one (qv → count) aggregate plus a domain-sized cumulative window
    yields the k-th smallest value exactly, k = ceil(p·n).

    Output: one row per p in {0.5, 0.9, 0.99} — (p, n, exact_q, est_q,
    abs_err), values back in original units."""
    e = load_table(spark, sf_dir, "events").select(
        F.round(F.col("value") * 1000).cast("bigint").alias("qv")
    )
    vh = e.groupBy("qv").agg(F.count(F.lit(1)).alias("cnt"))
    wv = Window.orderBy("qv").rowsBetween(Window.unboundedPreceding, 0)
    cum = vh.select(
        "qv", F.sum("cnt").over(wv).alias("cum")
    ).crossJoin(F.broadcast(vh.agg(F.sum("cnt").cast("bigint").alias("n"))))
    bh = (
        e.select((F.col("qv") - (F.col("qv") % 1000)).alias("bin_lo"))
        .groupBy("bin_lo")
        .agg(F.count(F.lit(1)).alias("bcnt"))
    )
    wb = Window.orderBy("bin_lo").rowsBetween(Window.unboundedPreceding, 0)
    bcum = bh.select("bin_lo", F.sum("bcnt").over(wb).alias("bcum"))
    ps = F.explode(F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99))).alias("p")
    want = cum.select("n", ps).distinct().withColumn(
        "k", F.ceil(F.col("p") * F.col("n")).cast("bigint")
    )
    exact = (
        want.join(cum.select("qv", "cum"), F.col("cum") >= F.col("k"))
        .groupBy("p", "n", "k")
        .agg(F.min("qv").alias("exact_qv"))
    )
    est = (
        want.join(bcum, F.col("bcum") >= F.col("k"))
        .groupBy("p")
        .agg(F.min("bin_lo").alias("est_lo"))
    )
    out = exact.join(est, "p").select(
        "p",
        "n",
        F.round(F.col("exact_qv").cast("double") / 1000, 3).alias("exact_q"),
        F.round((F.col("est_lo") + 500).cast("double") / 1000, 3).alias("est_q"),
        F.round(
            F.abs((F.col("est_lo") + 500) - F.col("exact_qv")).cast("double") / 1000,
            3,
        ).alias("abs_err"),
    )
    return out


def events_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curve: cumulative purchase value per first-seen-day
    cohort by day offset — the revenue companion to the retention
    matrix (product analytics reads both off the same cohort axis).

    Same single-corpus-exchange discipline as events_retention_cohorts:
    one user_id repartition serves the cohort-MIN window; purchase
    values are milli-quantized integers so the per-(cohort, offset)
    sums are exact, and the cumulative sum runs over the aggregated
    (cohort × offset) rows — metadata-sized, one window, no self-join.
    cum_value_per_user divides by the cohort's offset-0 active count
    (every member is active on their first day).

    Output: (cohort, day_offset, day_value, cum_value, cohort_size,
    cum_per_user)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    ud = (
        e.select(
            "user_id",
            F.to_date("ts").alias("day"),
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value") * 1000).cast("bigint"),
            )
            .otherwise(F.lit(0))
            .alias("qv"),
        )
        .repartition("user_id")
        .withColumn("cohort", F.min("day").over(w))
    )
    agg = ud.groupBy(
        "cohort", F.datediff("day", "cohort").cast("bigint").alias("day_offset")
    ).agg(
        F.sum("qv").alias("qsum"),
        F.countDistinct("user_id").cast("bigint").alias("n_active"),
    )
    wc = (
        Window.partitionBy("cohort")
        .orderBy("day_offset")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    size = F.first("n_active").over(
        Window.partitionBy("cohort").orderBy("day_offset")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    cum = F.sum("qsum").over(wc)
    return agg.select(
        F.date_format("cohort", "yyyy-MM-dd").alias("cohort_day"),
        "day_offset",
        F.round(F.col("qsum").cast("double") / 1000, 3).alias("day_value"),
        F.round(cum.cast("double") / 1000, 3).alias("cum_value"),
        size.cast("bigint").alias("cohort_size"),
        F.round((cum.cast("double") / 1000) / size, 6).alias("cum_per_user"),
    )


def events_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel-latency distribution: per user, the delay from FIRST
    signup to the first purchase at-or-after it; report the exact
    p25/p50/p75/p90 of the delay in whole seconds — the time-to-convert
    companion of the step-count funnel (product analytics reads both).

    Exactness without a global sort: the same value-histogram
    decomposition as the quantile sketch — delays are floored to whole
    seconds (a bounded, user-count-sized value domain), one (delay →
    count) aggregate + a domain-sized cumulative window yields the
    k-th smallest delay exactly, k = ceil(p·n).  Two min-aggregates +
    one user-keyed join are the only corpus-sized work.

    Output: (p, n_converted, delay_s)."""
    e = load_table(spark, sf_dir, "events")
    s1 = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(F.unix_micros("ts")).alias("s_us"))
    )
    p1 = (
        e.filter(F.col("event_type") == "purchase")
        .select("user_id", F.unix_micros("ts").alias("p_us"))
        .join(s1, "user_id")
        .filter(F.col("p_us") >= F.col("s_us"))
        .groupBy("user_id")
        .agg(F.min(F.col("p_us") - F.col("s_us")).alias("delay_us"))
    )
    delays = p1.select(F.expr("delay_us div 1000000").alias("d"))
    vh = delays.groupBy("d").agg(F.count(F.lit(1)).alias("cnt"))
    wv = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    cum = vh.select("d", F.sum("cnt").over(wv).alias("cum")).crossJoin(
        F.broadcast(vh.agg(F.sum("cnt").cast("bigint").alias("n")))
    )
    ps = F.explode(
        F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75), F.lit(0.9))
    ).alias("p")
    want = cum.select("n", ps).distinct().withColumn(
        "k", F.ceil(F.col("p") * F.col("n")).cast("bigint")
    )
    return (
        want.join(cum.select("d", "cum"), F.col("cum") >= F.col("k"))
        .groupBy("p", "n")
        .agg(F.min("d").alias("delay_s"))
        .select("p", F.col("n").alias("n_converted"), "delay_s")
    )


def events_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users + event counts per type; json extraction from props
    (get_json_object — the OraJson/OSON query path, SURVEY §1.2)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.withColumn("k", F.get_json_object(F.col("props"), "$.k").cast("bigint"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum("k").alias("sum_k"),
        )
    )


def events_range_join(
    spark: SparkSession, sf_dir: str, window_minutes: int = 10
) -> DataFrame:
    """Range (interval) join — for each purchase, count the same user's
    clicks in the preceding ``window_minutes``.  Spark has no native
    range-join optimization (a raw `t1.ts BETWEEN t2.ts - w AND t2.ts`
    theta join degenerates to per-key cross products); the scale pattern
    is TIME BINNING: bucket both sides into window-sized bins, equi-join
    on (user_id, bin) with the click side exploded into (bin, bin+1) so
    every candidate pair lands in exactly one bucket pair, then apply the
    exact BETWEEN as a cheap post-filter.  Candidate count is bounded by
    per-(user, 2-bin) density instead of per-user totals.
    Output: (event_id, user_id, n_prior_clicks)."""
    e = load_table(spark, sf_dir, "events")
    w_us = window_minutes * 60 * 1_000_000
    us = F.unix_micros(F.col("ts"))
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", us.alias("p_us"), (us / w_us).cast("bigint").alias("bin")
    )
    clicks = (
        e.filter(F.col("event_type") == "click")
        .select("user_id", us.alias("c_us"), (us / w_us).cast("bigint").alias("cbin"))
        .select(
            "user_id", "c_us",
            F.explode(F.array(F.col("cbin"), F.col("cbin") + 1)).alias("bin"),
        )
    )
    hits = (
        purchases.join(clicks, ["user_id", "bin"])
        .filter(
            (F.col("c_us") >= F.col("p_us") - w_us) & (F.col("c_us") < F.col("p_us"))
        )
        .groupBy("event_id")
        .agg(F.count(F.lit(1)).alias("n_prior_clicks"))
    )
    return purchases.select("event_id", "user_id").join(hits, "event_id", "left").select(
        "event_id",
        "user_id",
        F.coalesce("n_prior_clicks", F.lit(0)).cast("bigint").alias("n_prior_clicks"),
    )


def events_moving_avg(spark: SparkSession, sf_dir: str, window_rows: int = 5) -> DataFrame:
    """Per-user moving average over the trailing ``window_rows`` events —
    a ROWS-frame window aggregate (the running-total family's bounded
    cousin). One user_id exchange; exact-decimal sums inside the frame
    keep the division deterministic across engines."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(window_rows - 1), 0)
    )
    dec_sum = F.sum(F.col("value").cast("decimal(18,6)")).over(w)
    n = F.count(F.lit(1)).over(w)
    return e.select(
        "event_id",
        "user_id",
        F.round((dec_sum.cast("double") / n), 6).alias("moving_avg"),
    )


def events_value_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution profiling per event type: exact interpolated
    percentiles (Spark `percentile` == DuckDB `quantile_cont`, both
    linear interpolation — bit-identical on the same doubles) + exact
    distinct users. One groupBy; percentile is a sort-based aggregate
    within each (small) group."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.percentile("value", 0.5).alias("p50"),
        F.percentile("value", 0.95).alias("p95"),
        F.percentile("value", 0.99).alias("p99"),
    )


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered 3-step funnel (signup → click → purchase): how many users
    complete each step IN ORDER, earliest-occurrence semantics (first
    signup, first click strictly after it, first purchase strictly after
    that).  The sequence constraint is what distinguishes a funnel from
    three independent counts.

    Scale shape: three per-user MIN aggregates (map-side combinable) +
    two equi-joins on user_id — all three aggregations shuffle on the
    same key, so AQE/co-partitioning collapses them into one exchange
    lineage; no windows, no per-user event sorting.
    Output: one row (n_signup, n_click_after, n_purchase_after,
    conversion_pct)."""
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s1 = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        e.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        s1.agg(F.count(F.lit(1)).alias("n_signup"))
        .crossJoin(s2.agg(F.count(F.lit(1)).alias("n_click_after")))
        .crossJoin(s3.agg(F.count(F.lit(1)).alias("n_purchase_after")))
        .select(
            F.col("n_signup").cast("bigint").alias("n_signup"),
            F.col("n_click_after").cast("bigint").alias("n_click_after"),
            F.col("n_purchase_after").cast("bigint").alias("n_purchase_after"),
            # zero signups: conversion is undefined — NULL, not an ANSI
            # divide-by-zero (found by the r9 funnel replay property;
            # the fixture stream always has signups so no driver row
            # could hit it — same class as the wedge-free census)
            F.when(
                F.col("n_signup") > 0,
                F.round(
                    F.col("n_purchase_after").cast("double")
                    / F.col("n_signup") * 100,
                    4,
                ),
            ).alias("conversion_pct"),
        )
    )


def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention-cohort triangle: users grouped by FIRST-SEEN day
    (their cohort), then counted as active per day offset from that
    cohort — the classic product-analytics retention matrix
    (cohort_day x day_offset -> n_active, cohort_size, retention_pct).

    Scale shape: ONE corpus exchange — an explicit user_id repartition
    that simultaneously satisfies the (user_id, day) distinct (subset
    clustering) and the cohort-MIN window's partitionBy(user_id); the
    (cohort, offset) aggregate then shuffles only distinct user-days.
    cohort_size needs no second pass over the activity relation:
    every cohort member is by construction active at offset 0, so the
    offset-0 row IS the cohort size, lifted onto its siblings by a
    cohort-keyed window over the aggregated (metadata-sized) rows —
    single lineage, no join, no duplicated subtree.  No per-user event
    ordering, no self-join over the raw events.
    retention_pct is int/int division — correctly rounded,
    engine-portable.

    Reference parity: beyond-reference analytics (SURVEY.md §2.6
    window/agg family) — the reference ships no cohort operator."""
    e = load_table(spark, sf_dir, "events")
    ud = (
        e.select("user_id", F.to_date("ts").alias("day"))
        .repartition("user_id")
        .distinct()
    )
    w = Window.partitionBy("user_id")
    udc = ud.withColumn("cohort", F.min("day").over(w))
    act = udc.groupBy(
        "cohort", F.datediff("day", "cohort").cast("bigint").alias("day_offset")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_active"))
    wc = Window.partitionBy("cohort")
    return (
        act.withColumn(
            "cohort_size",
            F.max(F.when(F.col("day_offset") == 0, F.col("n_active"))).over(wc),
        )
        .select(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_day"),
            "day_offset",
            "n_active",
            F.col("cohort_size").cast("bigint").alias("cohort_size"),
            F.round(
                F.col("n_active").cast("double") / F.col("cohort_size") * 100, 4
            ).alias("retention_pct"),
        )
    )


def events_active_users(
    spark: SparkSession, sf_dir: str, window_days: int = 7
) -> DataFrame:
    """Exact sliding-window distinct users: per observed activity day,
    DAU (distinct users that day) and WAU (distinct users in the
    trailing ``window_days`` incl. the day) + stickiness = DAU/WAU —
    the engagement report next to the HLL sketch path
    (text_hll_distinct), which is the approximate answer to the same
    question at extreme scale.

    Sliding DISTINCT cannot map-side combine directly (a user active
    twice in one window must count once), so the exact decomposition
    CONTRIBUTES each distinct (user, day) row to the <= window_days
    target days it can count toward (bounded explode), then
    re-distincts per (target_day, user): the expansion factor is the
    window length, never the corpus, and every aggregate partial-
    combines.  Days with no activity are not reported (observed-days
    contract — join back to the DAU relation).

    Output: (day, n_dau, n_wau, stickiness_pct)."""
    e = load_table(spark, sf_dir, "events")
    ud = (
        e.select("user_id", F.to_date("ts").alias("day"))
        .repartition("user_id")
        .distinct()
    )
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).cast("bigint").alias("n_dau"))
    wau = (
        ud.select(
            "user_id",
            F.explode(
                F.sequence(
                    F.col("day"),
                    F.date_add("day", window_days - 1),
                    F.expr("interval 1 day"),
                )
            ).alias("day"),
        )
        .distinct()
        .groupBy("day")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_wau"))
    )
    return (
        dau.join(wau, "day")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_dau",
            "n_wau",
            F.round(F.col("n_dau").cast("double") / F.col("n_wau") * 100, 4).alias(
                "stickiness_pct"
            ),
        )
    )


def events_wau_hll_audit(
    spark: SparkSession, sf_dir: str, window_days: int = 7
) -> DataFrame:
    """The SCALE PATH for sliding-window distinct users, with its audit:
    per observed activity day, exact trailing-7-day WAU (the
    events_active_users decomposition) next to the HLL-sketch estimate
    a 100 TB deployment would serve instead — per-day register tables
    merged across the window by register-max (HLL's mergeability is the
    whole point: one fixed 2^10-register sketch per day, window merges
    are max(), never a re-scan of the raw events).

    The merge reuses the exact path's bounded-explode shape: each
    (day, bucket, m_j) register row contributes to the <= window_days
    target days it can count toward, then groupBy(target_day, bucket)
    MAX — register tables are days x 1024 rows (metadata-sized), so the
    x7 expansion is nothing, and every aggregate partial-combines.
    Estimator identical to text_hll_distinct (alpha_m m^2/Z + linear
    counting), bit-mirrored in the oracle.

    Output: (day, n_wau_exact, n_wau_est, rel_err)."""
    from oracdc_spark.operators.textops import (
        HLL_M,
        _HLL_ALPHA,
        _gram_hash,
        hll_registers,
    )

    e = load_table(spark, sf_dir, "events")
    ud = (
        e.select("user_id", F.to_date("ts").alias("day"))
        .repartition("user_id")
        .distinct()
    )
    target_days = lambda: F.explode(
        F.sequence(
            F.col("day"),
            F.date_add("day", window_days - 1),
            F.expr("interval 1 day"),
        )
    ).alias("day")
    exact = (
        ud.select("user_id", target_days())
        .distinct()
        .groupBy("day")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_wau_exact"))
    )
    regs = hll_registers(
        ud.select("day", _gram_hash(F.col("user_id").cast("string")).alias("h")),
        keys=("day",),
    )
    merged = (
        regs.select(target_days(), "bucket", "m_j")
        .groupBy("day", "bucket")
        .agg(F.max("m_j").alias("m_j"))
    )
    agg = merged.groupBy("day").agg(
        F.sum(F.pow(F.lit(2.0), -F.col("m_j"))).alias("z_nonempty"),
        F.count(F.lit(1)).alias("n_buckets"),
    )
    z = F.col("z_nonempty") + (F.lit(HLL_M) - F.col("n_buckets"))
    raw = F.lit(_HLL_ALPHA * HLL_M * HLL_M) / z
    v = F.lit(HLL_M) - F.col("n_buckets")
    est = F.when(
        (raw <= 2.5 * HLL_M) & (v > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v),
    ).otherwise(raw)
    observed = ud.select("day").distinct()
    return (
        exact.join(agg.select("day", est.alias("e")), "day")
        .join(observed, "day")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_wau_exact",
            F.round(F.col("e"), 3).alias("n_wau_est"),
            F.round(
                F.abs(F.col("e") - F.col("n_wau_exact")) / F.col("n_wau_exact"), 4
            ).alias("rel_err"),
        )
    )


def bloom_pruned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime Bloom semi-join pruning on the star schema — the manual
    form of the runtime-filter pushdown engines apply at 100 TB:
    monthly revenue of BUILDING-segment customers' orders, where the
    fact side is pruned by a broadcast ≤8 KiB Bloom filter built over
    the qualifying dimension keys BEFORE the exact join pays its
    shuffle/broadcast (textops.bloom_build/bloom_prune — lossless by
    the no-false-negative guarantee; false positives are then removed
    by the exact broadcast semi-join, so the result is bit-identical
    to the plain semi-join the oracle runs).

    At sandbox scale the broadcast join alone is cheap; the point is
    the SHAPE — with a 100 TB fact table and a selective dim predicate,
    the Bloom prune drops ~4/5 of fact rows before any exchange, and
    the filter itself is fixed-size regardless of dim cardinality
    (unlike a broadcast IN-list).  Output: (month, n_orders, revenue)."""
    from oracdc_spark.operators.textops import bloom_build, bloom_prune

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    filt = bloom_build(c.select(F.col("c_custkey").cast("string").alias("tok")))
    pruned = bloom_prune(
        o.withColumn("_k", F.col("o_custkey").cast("string")), "_k", filt
    ).drop("_k")
    exact = pruned.join(
        F.broadcast(c.select("c_custkey")),
        pruned["o_custkey"] == F.col("c_custkey"),
        "semi",
    )
    return (
        exact.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("revenue"),
        )
    )


def copurchase_lift(
    spark: SparkSession, sf_dir: str, min_pairs: int = 5
) -> DataFrame:
    """Market-basket affinity: association LIFT between part brands
    co-occurring in one order — lift(a,b) = P(a,b) / (P(a)·P(b)), the
    basic association-rule mining report (>1 = bought together more
    than independence predicts).

    Scale shape: the per-order brand set is DISTINCT (orderkey, brand)
    — the pair self-join runs per order and is bounded by the square
    of the per-order basket size (TPC-H ~4 items), never the corpus;
    brand marginals and the order count are tiny/1-row broadcast
    aggregates; the brand dimension joins broadcast.  Lift computes as
    one double division of exact-integer products
    (n_ab·N / (n_a·n_b)), ties and ordering deterministic.

    Output: (brand_a, brand_b, n_ab, lift) for pairs with
    n_ab >= min_pairs; brand_a < brand_b."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), F.col("p_brand").alias("brand")
    )
    items = (
        li.join(F.broadcast(part), "l_partkey")
        .select("l_orderkey", "brand")
        .distinct()
    )
    n_orders = items.select("l_orderkey").distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders")
    )
    marg = items.groupBy("brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_b")
    )
    a, b = items.alias("a"), items.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.brand") < F.col("b.brand")),
        )
        .groupBy(
            F.col("a.brand").alias("brand_a"), F.col("b.brand").alias("brand_b")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ab"))
        .filter(F.col("n_ab") >= min_pairs)
    )
    return (
        pairs.join(
            F.broadcast(marg.select(F.col("brand").alias("brand_a"), F.col("n_b").alias("n_a"))),
            "brand_a",
        )
        .join(
            F.broadcast(marg.select(F.col("brand").alias("brand_b"), F.col("n_b").alias("n_bb"))),
            "brand_b",
        )
        .crossJoin(F.broadcast(n_orders))
        .select(
            "brand_a",
            "brand_b",
            "n_ab",
            F.round(
                (F.col("n_ab") * F.col("n_orders")).cast("double")
                / (F.col("n_a") * F.col("n_bb")).cast("double"),
                6,
            ).alias("lift"),
        )
    )


def _decomposed_rank(
    df: DataFrame,
    col: str,
    ascending: bool,
    bin_div: int,
    tie_col: str,
    out: str,
) -> DataFrame:
    """Exact global rank over (col asc/desc, tie_col asc) WITHOUT a
    global sort: coarse ``col // bin_div`` histogram (metadata-sized) +
    bin-partitioned rank window — the perplexity_buckets /
    norm_outliers decomposition, shared by rfm_segments'
    three metrics."""
    bn, lt = f"_{out}_bin", f"_{out}_lt"
    binned = df.withColumn(bn, (F.col(col) / bin_div).cast("bigint"))
    hist = binned.groupBy(bn).agg(F.count(F.lit(1)).alias("_bn"))
    order = F.col(bn).asc() if ascending else F.col(bn).desc()
    wb = Window.orderBy(order).rowsBetween(Window.unboundedPreceding, -1)
    lower = hist.select(
        bn, F.coalesce(F.sum("_bn").over(wb), F.lit(0)).cast("bigint").alias(lt)
    )
    inorder = F.col(col).asc() if ascending else F.col(col).desc()
    wi = Window.partitionBy(bn).orderBy(inorder, tie_col)
    return (
        binned.join(F.broadcast(lower), bn)
        .withColumn(out, (F.col(lt) + F.row_number().over(wi)).cast("bigint"))
        .drop(bn, lt)
    )


def _ntile4(rn, n):
    """Closed-form NTILE(4) from a global rank: with q, r = divmod(n, 4)
    the first r buckets hold q+1 rows — pure integer arithmetic, so the
    decomposed rank reproduces the window function exactly (the oracle
    runs the literal NTILE as proof)."""
    q = F.floor(n / 4)
    r = n % 4
    boundary = r * (q + 1)
    return (
        F.when(rn <= boundary, F.floor((rn - 1) / (q + 1)) + 1)
        .otherwise(r + F.floor((rn - 1 - boundary) / q) + 1)
        .cast("bigint")
    )


def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation over orders: per customer, Recency
    (days from last order to the corpus max date), Frequency (order
    count) and Monetary (exact-decimal spend), each scored into
    quartiles 1..4 — the classic CRM/marketing OLAP segmentation.

    Determinism AND scale in one shape: quartile = the closed-form
    NTILE(4) (_ntile4, pure integer arithmetic) applied to an exact
    global rank over (metric, custkey) computed by the histogram
    decomposition (_decomposed_rank) — so there is NO single-partition
    global sort anywhere, yet the result is bit-identical to the
    literal NTILE window the DuckDB oracle runs.  Monetary sums in
    decimal(18,2) (exact, order-independent).

    Scale shape: one custkey exchange for the per-customer aggregate
    (dimension-sized vs the fact table), then per metric a
    metadata-sized bin histogram + a bin-partitioned rank window;
    the reference date is a broadcast 1-row aggregate.

    Output: (custkey, recency_days, frequency, monetary, r, f, m,
    segment)."""
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max(F.to_date("o_orderdate")).alias("last_date"),
        F.count(F.lit(1)).cast("bigint").alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("mon"),
    )
    ref = o.agg(F.max(F.to_date("o_orderdate")).alias("ref_date"))
    base = per_cust.crossJoin(F.broadcast(ref)).select(
        "custkey",
        F.datediff("ref_date", "last_date").cast("bigint").alias("recency_days"),
        "frequency",
        "mon",
    )
    total = base.agg(F.count(F.lit(1)).cast("bigint").alias("_n"))
    ranked = _decomposed_rank(base, "recency_days", True, 16, "custkey", "_rr")
    ranked = _decomposed_rank(ranked, "frequency", False, 1, "custkey", "_rf")
    ranked = _decomposed_rank(ranked, "mon", False, 10_000, "custkey", "_rm")
    return (
        ranked.crossJoin(F.broadcast(total))
        .withColumn("r", _ntile4(F.col("_rr"), F.col("_n")))
        .withColumn("f", _ntile4(F.col("_rf"), F.col("_n")))
        .withColumn("m", _ntile4(F.col("_rm"), F.col("_n")))
        .select(
            "custkey",
            "recency_days",
            "frequency",
            F.col("mon").cast("double").alias("monetary"),
            "r",
            "f",
            "m",
            F.concat_ws("-", "r", "f", "m").alias("segment"),
        )
    )


def events_funnel_windowed(
    spark: SparkSession, sf_dir: str, window_hours: int = 24
) -> DataFrame:
    """Conversion-window funnel: the ordered signup → click → purchase
    funnel of events_funnel, but each step must land WITHIN
    ``window_hours`` of the previous step's first occurrence — the
    form product analytics actually reports ("converted within 24h"),
    and the one that distinguishes stalled journeys from converted
    ones.  Same earliest-occurrence semantics and plan shape as
    events_funnel (per-user MIN aggregates + user_id equi-joins, all
    sharing one exchange lineage); the window bound is a codegen
    predicate on the joined row.

    Output: one row (n_signup, n_click_24h, n_purchase_24h,
    conversion_pct)."""
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    bound = F.expr(f"INTERVAL {int(window_hours)} HOURS")
    s1 = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        e.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter((F.col("ts") > F.col("t1")) & (F.col("ts") <= F.col("t1") + bound))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter((F.col("ts") > F.col("t2")) & (F.col("ts") <= F.col("t2") + bound))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        s1.agg(F.count(F.lit(1)).alias("n_signup"))
        .crossJoin(s2.agg(F.count(F.lit(1)).alias("n_click_24h")))
        .crossJoin(s3.agg(F.count(F.lit(1)).alias("n_purchase_24h")))
        .select(
            F.col("n_signup").cast("bigint").alias("n_signup"),
            F.col("n_click_24h").cast("bigint").alias("n_click_24h"),
            F.col("n_purchase_24h").cast("bigint").alias("n_purchase_24h"),
            # zero signups: NULL, not an ANSI divide-by-zero (same
            # class and fix as events_funnel)
            F.when(
                F.col("n_signup") > 0,
                F.round(
                    F.col("n_purchase_24h").cast("double")
                    / F.col("n_signup") * 100,
                    4,
                ),
            ).alias("conversion_pct"),
        )
    )


def events_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-path transition matrix: counts of consecutive
    (prev_type -> event_type) steps within each user's timeline plus
    the row-normalized transition probability — the Markov-chain view
    behind user-journey/funnel-drop-off analysis.

    Scale shape: ONE user-keyed exchange for the lag window (ordered by
    ts, event_id — the engine's total order for ties), then a
    low-cardinality (|types|²) aggregate that partial-combines
    map-side; the probability divides two exact counts per row
    (correctly rounded, engine-portable).  First events per user have
    no predecessor and are excluded (lag NULL).

    Output: (prev_type, event_type, n_steps, p) sorted by the pair."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = (
        e.select(
            "user_id",
            "event_type",
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_steps"))
    )
    wp = Window.partitionBy("prev_type")
    return steps.select(
        "prev_type",
        "event_type",
        "n_steps",
        F.round(
            F.col("n_steps").cast("double")
            / F.sum("n_steps").over(wp).cast("double"),
            6,
        ).alias("p"),
    )


def events_value_histogram(
    spark: SparkSession, sf_dir: str, n_bins: int = 20, lo: float = 0.0, hi: float = 100.0
) -> DataFrame:
    """Fixed-bin equi-width histogram of event values per type — the
    mergeable DISTRIBUTION sketch next to CMS (frequency), HLL
    (cardinality) and Bloom (membership): fixed n_bins cells regardless
    of volume, merged across partitions/days by addition.  Bin edges are
    declared constants, so the assignment `floor((v-lo)/width)` is one
    exact double op — no data-dependent quantile state (the reason
    t-digest/KLL are NOT restated here: their merge is order-sensitive
    and would fork engines).  Out-of-range values clamp to the edge
    bins."""
    e = load_table(spark, sf_dir, "events")
    width = (hi - lo) / n_bins
    raw = F.floor((F.col("value") - F.lit(lo)) / F.lit(width))
    b = F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1))
    return (
        e.groupBy("event_type", b.cast("bigint").alias("bin"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def customers_with_orders_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS): customers having at least one urgent
    order — the declared semi-join operator next to the anti join.
    Spark plans the distinct-key build side as a broadcast semi join."""
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return c.join(o, "c_custkey", "semi").select("c_custkey", "c_name", "c_nationkey")


# ---------------------------------------------------------------------------
# TPC-H-style breadth block (r5): the classic query shapes adapted to the
# testdata's column subset (no partsupp table, no commit/receipt dates,
# no shipmode/phone/comment columns — each adaptation noted inline).
# Determinism contract unchanged: money/quantity aggregates sum as
# DECIMAL, doubles appear only in final single divisions or raw-column
# comparisons computed identically by both engines.
# ---------------------------------------------------------------------------


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style: orders with at least one late-shipped line
    (l_shipdate > o_orderdate stands in for the missing commit/receipt
    dates), counted per priority.  EXISTS compiles to a LEFT SEMI join
    with the non-equi residual as the join condition — no duplicate
    explosion, one orderkey exchange."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        l,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-style: bilateral shipping volume between two nations by
    year.  The nation dimension joins twice (supplier side, customer
    side) through renamed broadcast copies — fact joins shuffle on their
    keys, the OR pair predicate stays a post-join codegen filter."""
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin("NATION_1", "NATION_2"))
    n2 = n.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin("NATION_1", "NATION_2"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    rev = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC)
    )
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").cast("bigint").alias("l_year")
        )
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-style: one nation's share of PROMO-part revenue sold
    into ASIA, by order year.  share = two exact decimal sums, one
    double division — conditional aggregation instead of a self-join."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    nc = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk"))
    ns = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    l = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC)
    )
    df = (
        l.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(r), F.col("c_rk") == F.col("r_regionkey"))
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("s_nk"))
    )
    nation_rev = F.sum(
        F.when(F.col("supp_nation") == "NATION_5", rev).otherwise(F.lit(0).cast(DEC))
    )
    return (
        df.groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            (nation_rev.cast("double") / F.sum(rev).cast("double")).alias("mkt_share"),
            F.sum(rev).cast("double").alias("total_revenue"),
        )
    )


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-style: revenue on colored parts by supplier nation and
    order year (the testdata has no partsupp, so profit = discounted
    revenue without the supplycost term)."""
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").contains("red"))
        .select("p_partkey")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("nation")
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    l = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC)
    )
    return (
        l.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("s_nk"))
        .groupBy("nation", F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(F.sum(rev).cast("double").alias("sum_profit"))
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by revenue lost to returns in one
    quarter.  TakeOrdered top-k on the aggregated (small) result; the
    only wide exchanges are the fact joins on their keys."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), "n_name"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-04-01"))
    )
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    rev = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC)
    )
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("c_nk"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(rev).alias("rev_dec"))
        .orderBy(F.col("rev_dec").desc(), F.col("c_custkey"))
        .limit(20)
        .select(
            "c_custkey", "c_name", "c_acctbal", "n_name",
            F.col("rev_dec").cast("double").alias("revenue"),
        )
    )


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of orders-per-customer (including
    zero-order customers via the left join).  Two exact-integer
    aggregations; the second input is |customers| rows."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .select(F.col("c_count").cast("bigint").alias("c_count"), "custdist")
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) achieving the maximum revenue in a
    quarter.  The max is an exact DECIMAL scalar (1 row, broadcast
    cross join) so the equality can never fork engines — the classic
    view + subquery decorrelated into agg + scalar join."""
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    rev = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC)
    )
    per_supp = l.groupBy(F.col("l_suppkey").alias("s_suppkey")).agg(
        F.sum(rev).alias("rev_dec")
    )
    mx = per_supp.agg(F.max("rev_dec").alias("max_rev"))
    return (
        per_supp.crossJoin(F.broadcast(mx))
        .filter(F.col("rev_dec") == F.col("max_rev"))
        .join(s, "s_suppkey")
        .select(
            "s_suppkey", "s_name", F.col("rev_dec").cast("double").alias("total_revenue")
        )
    )


def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue impact of small-quantity orders for one brand
    — the correlated per-part average decorrelated into ONE window over
    the brand-filtered join (shared l_partkey exchange), with the
    average as exact-decimal-sum / count so the 0.2x threshold compares
    identically in both engines."""
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#3")
        .select("p_partkey")
    )
    l = load_table(spark, sf_dir, "lineitem")
    j = l.join(p, F.col("l_partkey") == F.col("p_partkey"))
    w = Window.partitionBy("l_partkey")
    avg_qty = (
        F.sum(F.col("l_quantity").cast(DEC)).over(w).cast("double")
        / F.count(F.lit(1)).over(w)
    )
    return (
        j.withColumn("avg_qty", avg_qty)
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast(DEC)).cast("double") / F.lit(7.0))
            .alias("avg_yearly")
        )
    )


def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: customers with orders above a total-quantity
    threshold.  The HAVING aggregate keeps only the (rare) big orders
    before the customer join — the probe side shrinks first."""
    l = load_table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("qty_dec"))
        .filter(F.col("qty_dec") > 250)
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
        .select(
            "c_custkey", "c_name", "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_totalprice",
            F.col("qty_dec").cast("double").alias("sum_qty"),
        )
    )


def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: OR-of-ANDs brand/quantity predicate bands over the
    part join (the container/size legs don't exist in the testdata
    schema).  One scalar decimal sum; the disjunction is pure codegen
    on the joined row."""
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    l = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC)
    )
    bands = (
        ((F.col("p_brand") == "Brand#1") & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("l_quantity").between(20, 30))
    )
    return (
        l.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .filter(bands)
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-style: wealthy customers (account balance above the
    positive-balance average) with no RECENT orders (every synthetic
    customer has some order, so the dormancy cutoff replaces Q22's
    no-orders-at-all leg; the phone-prefix leg doesn't exist in the
    testdata schema).  The scalar average is an exact decimal sum /
    count broadcast to a codegen filter; the dormancy leg is the anti
    join against the recent-orders key set."""
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01"))
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), "n_name"
    )
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast(DEC)).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_bal")
        )
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, "c_custkey", "left_anti")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("c_nk"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double").alias("totacctbal"),
        )
    )


def orders_lag_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG window: days between a customer's consecutive orders (NULL
    for the first).  One custkey exchange; the offset function rounds
    out the declared window surface (rank/row_number/moving-frame/
    running-sum already covered)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w))
        .cast("bigint")
        .alias("gap_days"),
    )


def events_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-interval window frame: per user, the sum of event values in
    the trailing hour (value-based frame, not row-count — peers at the
    same timestamp aggregate together, so the result is order-
    independent).  Values quantized to exact integers (round(v*1000))
    so the frame sums are engine-identical; one user_id exchange.
    The frame key is MILLISECONDS (unix_millis / epoch_ms) — an exact
    integer at full timestamp precision on both engines.  Seconds via
    unix_timestamp() diverge from the DuckDB oracle: Spark floors the
    fractional second while DuckDB's double→BIGINT cast rounds
    half-up, shifting frame membership at hour boundaries."""
    e = load_table(spark, sf_dir, "events")
    qv = F.round(F.col("value") * 1000, 0).cast("bigint")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_millis("ts"))
        .rangeBetween(-3600000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.sum(qv).over(w).alias("hour_sum_q"),
    )


# ---------------------------------------------------------------------------
# TPC-H completion block (r6): q2/q11/q16/q20 adapt over the OBSERVED
# (l_partkey, l_suppkey) supply relationships — the testdata schema has
# no partsupp table — and q12/q21 over ship-lag (no
# l_shipmode/l_commitdate/l_receiptdate).  The operator SHAPES are the
# point: correlated-subquery decorrelation into windows, conditional
# banded aggregation, distinct-count grouping, per-key-share
# semi-joins, and exists/not-exists double correlation.
# ---------------------------------------------------------------------------


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2: cheapest supplier per part within a region.  Supply
    cost stand-in = MIN observed line price of the (part, supplier)
    pair (exact decimal min — no partsupp table).  The classic
    correlated min-cost subquery is decorrelated into ONE p_partkey
    window sharing the aggregation exchange; dimension chain
    supplier→nation→region broadcasts (bounded).  TakeOrdered 100."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "LARGE")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    supply = (
        l.groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice").cast(DEC)).alias("cost"))
        .join(F.broadcast(p.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey"))
        .join(s.select("s_suppkey", "s_name", "s_acctbal", "s_nationkey"),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n.select("n_nationkey", "n_name", "n_regionkey")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r.select("r_regionkey")),
              F.col("n_regionkey") == F.col("r_regionkey"))
    )
    w = Window.partitionBy("p_partkey")
    best = supply.withColumn("min_cost", F.min("cost").over(w)).filter(
        F.col("cost") == F.col("min_cost")
    )
    return (
        best.select(
            F.col("s_acctbal").cast("double").alias("s_acctbal"),
            "s_name",
            "n_name",
            F.col("p_partkey").cast("bigint").alias("p_partkey"),
            F.col("cost").cast("double").alias("cost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11: parts whose supply value from one region's suppliers
    exceeds a fraction of the region's total (region-scoped so the tiny
    sf0.001 supplier sample still has in-scope rows).  Value stand-in =
    SUM(l_extendedprice) over the scoped lineitems per part (exact
    decimal).  The scalar total is a lazy 1-row aggregate broadcast
    into a CROSS-MULTIPLIED integer-exact compare (value * 10000 >
    total) — no float threshold."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    scoped = (
        l.join(
            s.select("s_suppkey", "s_nationkey"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(n.select("n_nationkey", "n_regionkey")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(r.select("r_regionkey")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
    )
    per_part = scoped.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast(DEC)).alias("value")
    )
    total = per_part.agg(F.sum("value").alias("total"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value") * 10000 > F.col("total"))
        .select(
            F.col("l_partkey").cast("bigint").alias("p_partkey"),
            F.col("value").cast("double").alias("value"),
        )
    )


def q12_shipping_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12: priority mix per shipping band.  Band stand-in =
    ship lag days (l_shipdate − o_orderdate; no l_shipmode column):
    FAST < 30 ≤ NORMAL < 90 ≤ SLOW.  The high/low priority split is
    Q12's conditional CASE-sum over the join; counts are exact ints."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    o = load_table(spark, sf_dir, "orders")
    lag = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    band = (
        F.when(lag < 30, "FAST").when(lag < 90, "NORMAL").otherwise("SLOW")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o.select("o_orderkey", "o_orderdate", "o_orderpriority"),
               F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(band.alias("ship_band"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("bigint").alias("low_line_count"),
        )
    )


def q16_parts_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16: distinct supplier counts per (brand, type, size) for
    non-excluded parts — supply relationships observed from lineitem
    (no partsupp).  COUNT(DISTINCT l_suppkey) per group is exact; the
    brand/type exclusions are pushed-down scan filters."""
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    l = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        l.join(
            F.broadcast(p.select("p_partkey", "p_brand", "p_type", "p_size")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
    )


def q20_excess_supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20: suppliers holding a dominant share of a part family's
    supply.  Share stand-in (no ps_availqty): a supplier qualifies if
    for SOME widget part they shipped MORE THAN HALF of that part's
    1997 quantity — the per-part total is a window over the
    (supplier, part) aggregate (decorrelated, shares the exchange),
    the compare is cross-multiplied exact decimal (qty·2 > total), and
    the supplier set semi-joins back to names.  Nation-scoped like the
    original."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").endswith("widget"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_13", "NATION_23")
    )
    sp = (
        l.join(F.broadcast(p.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("qty"))
    )
    w = Window.partitionBy("l_partkey")
    dominant = (
        sp.withColumn("part_total", F.sum("qty").over(w))
        .filter(F.col("qty") * 2 > F.col("part_total"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(dominant, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(n.select("n_nationkey")), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .select("s_name", F.col("s_acctbal").cast("double").alias("s_acctbal"))
    )


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21: suppliers who kept finished multi-supplier orders
    waiting.  Laggard stand-in (no l_receiptdate/l_commitdate): the
    UNIQUE supplier whose latest line ship date equals the order's max
    ship date, on 'F' orders with ≥ 2 distinct suppliers.  Q21's
    exists / not-exists double correlation decorrelates into per-order
    aggregates: per (order, supplier) max-ship, then per-order supplier
    count / max / at-max count — two exchanges total, no self-joins.
    TakeOrdered 100 by numwait desc."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l = load_table(spark, sf_dir, "lineitem")
    per_os = (
        l.join(o.select("o_orderkey"), F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("l_shipdate").alias("s_max"))
    )
    w = Window.partitionBy("l_orderkey")
    marked = (
        per_os.withColumn("n_supp", F.count(F.lit(1)).over(w))
        .withColumn("o_max", F.max("s_max").over(w))
        .withColumn(
            "n_at_max",
            F.sum(F.when(F.col("s_max") == F.col("o_max"), 1).otherwise(0)).over(w),
        )
    )
    waiting = marked.filter(
        (F.col("n_supp") >= 2)
        & (F.col("n_at_max") == 1)
        & (F.col("s_max") == F.col("o_max"))
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        waiting.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_name", "numwait")
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


def events_user_similarity(
    spark: SparkSession, sf_dir: str, query_mod: int = 50, k_neighbors: int = 5
) -> DataFrame:
    """Time-series similarity search over behavior profiles (the
    distributed top-k similarity-search shape of the streaming/
    trajectory literature, restated on this engine's quantized-cosine
    machinery): each user's event history folds to a 24-dim
    hour-of-day value profile — sum of round(value*1000) per hour, an
    exact-integer seasonal signature — and a bounded query batch
    (user_id % query_mod == 0, brute_force_topk's contract) retrieves
    its top-k most-similar users by quantized cosine.

    Scale shape: ONE (user, hour) aggregate builds all profiles; the
    dot-product join keys on the 24-value hour dimension with the
    query side broadcast (|Q|*24 rows), so corpus profiles are touched
    once — identical contract to similarity.cosine_scores.  Output:
    (query_user, neighbor_user, rank)."""
    from oracdc_spark.operators.tsindex import user_profile

    e = load_table(spark, sf_dir, "events")
    prof = user_profile(e)
    qq = prof.filter(F.col("user_id") % query_mod == 0).select(
        F.col("user_id").alias("query_user"), "h", F.col("q").alias("qa")
    )
    cc = prof.select(
        F.col("user_id").alias("neighbor_user"), "h", F.col("q").alias("qb")
    )
    dots = (
        F.broadcast(qq)
        .join(cc, "h")
        .filter(F.col("query_user") != F.col("neighbor_user"))
        .groupBy("query_user", "neighbor_user")
        .agg(F.sum(F.col("qa") * F.col("qb")).alias("dot"))
    )
    qn = qq.groupBy("query_user").agg(F.sum(F.col("qa") * F.col("qa")).alias("qn"))
    cn = cc.groupBy("neighbor_user").agg(F.sum(F.col("qb") * F.col("qb")).alias("cn"))
    from oracdc_spark.operators.similarity import qcos_score

    score = qcos_score()
    w = Window.partitionBy("query_user").orderBy(
        F.col("score").desc(), "neighbor_user"
    )
    return (
        dots.join(F.broadcast(qn), "query_user")
        .join(cn, "neighbor_user")
        .select("query_user", "neighbor_user", score.alias("score"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k_neighbors)
        .select(
            "query_user",
            "neighbor_user",
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


def events_mad_outliers(
    spark: SparkSession, sf_dir: str, threshold: float = 3.5
) -> DataFrame:
    """Per-type ROBUST outlier detection via the modified z-score
    0.6745·(x − median)/MAD (Iglewicz & Hoaglin 1993) — the companion
    to events_zscore_outliers for the regime where the mean/stddev gate
    fails: a handful of extreme values inflate the stddev enough to
    mask themselves (masking), while median and MAD have a 50%
    breakdown point and flag them anyway.

    Exact medians WITHOUT a global sort: milli-quantized values have a
    bounded domain, so a per-type (qv → count) histogram plus a
    domain-sized per-type cumulative window yields the k-th smallest
    exactly (k = ceil(n/2), the lower median — mirrored in the oracle);
    the same decomposition runs a second time over |qv − median| for
    the MAD.  Two corpus aggregates, two metadata-sized windows, one
    broadcast stats join back — the events_quantile_sketch machinery
    applied per group.  Types with MAD = 0 are excluded (the score is
    undefined; >half the type's values are identical).

    Output: (event_id, event_type, value, robust_z) for
    |robust_z| ≥ threshold, robust_z rounded to 4."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        "value",
        F.round(F.col("value") * 1000).cast("bigint").alias("qv"),
    )

    def _median_of(df: DataFrame, col: str) -> DataFrame:
        vh = df.groupBy("event_type", col).agg(F.count(F.lit(1)).alias("cnt"))
        wv = (
            Window.partitionBy("event_type")
            .orderBy(col)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        cum = vh.select("event_type", col, F.sum("cnt").over(wv).alias("cum"))
        n = df.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
        k = F.ceil(F.col("n").cast("double") / 2).cast("bigint")
        return (
            cum.join(F.broadcast(n.select("event_type", k.alias("k"))), "event_type")
            .filter(F.col("cum") >= F.col("k"))
            .groupBy("event_type")
            .agg(F.min(col).alias("med_" + col))
        )
    med = _median_of(e, "qv")
    dev = e.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("qv") - F.col("med_qv")).alias("ad")
    )
    mad = _median_of(dev, "ad").withColumnRenamed("med_ad", "mad")
    rz = F.round(
        F.lit(0.6745)
        * (F.col("qv") - F.col("med_qv")).cast("double")
        / F.col("mad").cast("double"),
        4,
    )
    return (
        e.join(F.broadcast(med), "event_type")
        .join(F.broadcast(mad), "event_type")
        .filter(F.col("mad") > 0)
        .withColumn("robust_z", rz)
        .filter(F.abs(F.col("robust_z")) >= threshold)
        .select("event_id", "event_type", "value", "robust_z")
    )


def orders_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration report: how much of total order revenue the
    top 1% / 10% / 20% of customers carry, plus the exact Gini
    coefficient — the whale-analysis companion to the RFM segments
    (concentration decides whether per-customer or per-segment
    treatments matter; on a training corpus the same statistic over
    per-source token counts measures mixture skew).

    Exactness: per-customer totals are DECIMAL sums (order-independent);
    the Gini uses the closed form over ascending-sorted totals,
    G = 2·Σ i·x_i / (n·Σx) − (n+1)/n, with Σ i·x_i an exact decimal
    aggregate and the two divisions the only IEEE steps (rounded 6).
    Ties sort by (total, custkey) — pinned in the oracle too.

    Scale note: the rank window sorts the per-CUSTOMER aggregate, not
    the orders table — customer-sized, 100-1000× smaller than the fact
    table.  At truly extreme customer counts the rank decomposes over
    a quantized-total histogram exactly like text_perplexity_buckets;
    the closed form is unchanged.

    Output: one row — (n_customers, total_revenue, top1_share,
    top10_share, top20_share, gini)."""
    o = load_table(spark, sf_dir, "orders")
    totals = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast(DEC)).alias("t")
    )
    w = Window.orderBy(F.col("t").asc(), F.col("o_custkey").asc())
    ranked = totals.withColumn("i", F.row_number().over(w))
    stats = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum("t").alias("total_t"),
        F.sum(F.col("i") * F.col("t")).alias("iwt"),
    )
    shares = None
    for pct, name in ((1, "top1_share"), (10, "top10_share"), (20, "top20_share")):
        leg = (
            ranked.crossJoin(F.broadcast(stats.select("n_customers")))
            .filter(
                F.col("i")
                > F.col("n_customers")
                - F.ceil(F.col("n_customers") * pct / 100).cast("bigint")
            )
            .agg(F.sum("t").alias(name))
        )
        shares = leg if shares is None else shares.crossJoin(F.broadcast(leg))
    gini = F.round(
        F.lit(2.0) * F.col("iwt").cast("double")
        / (F.col("n_customers").cast("double") * F.col("total_t").cast("double"))
        - (F.col("n_customers") + 1).cast("double") / F.col("n_customers").cast("double"),
        6,
    )
    return stats.crossJoin(F.broadcast(shares)).select(
        "n_customers",
        F.col("total_t").cast("double").alias("total_revenue"),
        F.round(F.col("top1_share").cast("double") / F.col("total_t").cast("double"), 6).alias("top1_share"),
        F.round(F.col("top10_share").cast("double") / F.col("total_t").cast("double"), 6).alias("top10_share"),
        F.round(F.col("top20_share").cast("double") / F.col("total_t").cast("double"), 6).alias("top20_share"),
        gini.alias("gini"),
    )
