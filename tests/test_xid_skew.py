"""XID-prefix substitution + skew utilities."""

import pyspark.sql.functions as F

from oracdc_spark.plans.skew import salted_agg, salted_join
from oracdc_spark.streaming.assembly import normalize_xid


def test_normalize_xid_substitutes_suspicious(spark):
    rows = [
        # normal records of txn 0011002A00000005
        (10, "0011002A00000005", 1),
        # suspicious record: same undo-segment prefix, FFFFFFFF sequence
        (11, "0011002AFFFFFFFF", 3),
        # unrelated txn, no open prefix match → stays as-is
        (12, "00FF0001FFFFFFFF", 1),
    ]
    df = spark.createDataFrame(rows, "scn long, xid string, op int")
    out = {r.scn: r.xid for r in normalize_xid(df).collect()}
    assert out[10] == "0011002A00000005"
    assert out[11] == "0011002A00000005"  # substituted
    assert out[12] == "00FF0001FFFFFFFF"  # no canonical match


def test_salted_agg_matches_plain(spark):
    from oracdc_spark.catalog import load_table

    o = load_table(spark, "/root/testdata/sf0.001", "orders")
    plain = {
        (r.o_orderstatus,): (r.n, r.mx)
        for r in o.groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"), F.max("o_totalprice").alias("mx"))
        .collect()
    }
    salted = {
        (r.o_orderstatus,): (r.n, r.mx)
        for r in salted_agg(
            o,
            ["o_orderstatus"],
            {"n": F.count(F.lit(1)), "mx": F.max("o_totalprice")},
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark):
    from oracdc_spark.catalog import load_table

    o = load_table(spark, "/root/testdata/sf0.001", "orders")
    c = load_table(spark, "/root/testdata/sf0.001", "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    plain = o.join(c, "o_custkey").count()
    assert salted_join(o, c, "o_custkey").count() == plain
