"""Bucketed co-located joins: the table-format scale strategy must
actually remove the exchanges (plan-asserted, not just claimed)."""

import contextlib

import pytest

from oracdc_spark.catalog import load_table
from oracdc_spark.plans.bucketing import bucketed_join, exchange_count, write_bucketed

SF = "/root/testdata/sf0.001"


@contextlib.contextmanager
def no_broadcast(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


@pytest.fixture
def bucketed_tables(spark, tmp_path):
    orders = load_table(spark, SF, "orders")
    customer = load_table(spark, SF, "customer")
    write_bucketed(orders, "b_orders", "o_custkey", 8, str(tmp_path / "bo"))
    write_bucketed(
        customer.withColumnRenamed("c_custkey", "o_custkey"),
        "b_customer", "o_custkey", 8, str(tmp_path / "bc"),
    )
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    with no_broadcast(spark):
        joined = bucketed_join(spark, "b_orders", "b_customer", "o_custkey")
        n = joined.count()
        assert n > 0
        assert exchange_count(joined) == 0  # co-located: no shuffle either side
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan


def test_unbucketed_join_needs_exchanges(spark, bucketed_tables):
    """Control: the same join over plain parquet shuffles both sides."""
    with no_broadcast(spark):
        orders = load_table(spark, SF, "orders")
        customer = load_table(spark, SF, "customer").withColumnRenamed(
            "c_custkey", "o_custkey"
        )
        joined = orders.join(customer, "o_custkey")
        joined.count()
        assert exchange_count(joined) >= 2


def test_bucketed_join_matches_unbucketed_result(spark, bucketed_tables):
    a = bucketed_join(spark, "b_orders", "b_customer", "o_custkey").count()
    b = (
        load_table(spark, SF, "orders")
        .join(
            load_table(spark, SF, "customer").withColumnRenamed("c_custkey", "o_custkey"),
            "o_custkey",
        )
        .count()
    )
    assert a == b
