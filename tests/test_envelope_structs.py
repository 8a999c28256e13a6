"""Struct-form envelopes (the streaming writer path): debezium
before/after/source and wrapped {V:...} tri-state."""

import pyspark.sql.functions as F

from oracdc_spark.feed import change_feed
from oracdc_spark.operators.envelope import debezium_envelope, wrapped_tristate

SF = "/root/testdata/sf0.001"


def test_debezium_envelope_struct_semantics(spark):
    env = debezium_envelope(change_feed(spark, SF))
    rows = env.collect()
    by_op = {}
    for r in rows:
        # skip the deliberate no-op updates (the F9 fixture class)
        if r.op == "u" and r.after and r.before and r.after.totalprice == r.before.totalprice:
            continue
        by_op.setdefault(r.op, r)
    c, u, d = by_op["c"], by_op["u"], by_op["d"]
    # insert: before null, after set
    assert c.before is None and c.after is not None and c.after.totalprice is not None
    # update: both sides set, before carries the prior image
    assert u.before is not None and u.after is not None
    assert u.before.totalprice != u.after.totalprice or u.before.status != u.after.status
    # delete: after null, before set
    assert d.after is None and d.before is not None
    # source block carries coordinates
    assert c.source.owner == "SCOTT" and c.source.table == "ORDERS"
    assert c.source.commit_scn >= c.source.scn
    assert c.ts_ms == c.source.commit_scn


def test_wrapped_tristate_struct_presence(spark):
    w = wrapped_tristate(change_feed(spark, SF))
    ins = w.filter(F.col("op_char") == "c").first()
    dele = w.filter(F.col("op_char") == "d").first()
    # present column → struct with V; absent (delete) → struct null
    assert ins.totalprice_w is not None and ins.totalprice_w.V is not None
    assert dele.totalprice_w is None and dele.status_w is None


def test_wrapped_tristate_partial_updates_omit_status(spark):
    """Partial UPDATEs (changed_cols = TOTALPRICE only) must surface as
    struct-null STATUS (absent), not a present-NULL — the tri-state
    distinction the wrapped mode exists for."""
    from oracdc_spark.feed import change_feed
    from oracdc_spark.operators.envelope import wrapped_tristate

    feed = change_feed(spark, "/root/testdata/sf0.001")
    w = wrapped_tristate(feed)
    partial = w.filter(
        (F.col("op_char") == "u") & F.col("status_w").isNull()
        & F.col("totalprice_w").isNotNull()
    )
    assert partial.count() > 0  # absent genuinely occurs in the feed


def test_wrapped_apply_matches_flat_apply(spark):
    """Reconstructing the replica from wrapped (absent-aware) changes
    must equal the flat apply: absent columns fall back to the prior
    value, never overwrite (WrappedDataTable.java:72-90)."""
    from oracdc_spark.feed import change_feed
    from oracdc_spark.operators.cdc import apply_changes
    from oracdc_spark.operators.envelope import wrapped_apply

    feed = change_feed(spark, "/root/testdata/sf0.001")
    flat = {
        (r.owner, r.table_name, r.pk, r.totalprice, r.status)
        for r in apply_changes(feed).collect()
    }
    wrapped = {
        (r.owner, r.table_name, r.pk, r.totalprice, r.status)
        for r in wrapped_apply(feed).collect()
    }
    assert wrapped == flat
