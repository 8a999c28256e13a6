"""K5 applied: wrapped partial-update MERGE — absent columns must keep
the replica's prior value; present columns update."""

import tempfile

import pyspark.sql.functions as F

from oracdc_spark.sinks.merge import merge_wrapped_batch, replica_state

SCHEMA = (
    "owner string, table_name string, pk bigint, commit_scn bigint, scn bigint, "
    "ssn bigint, op int, totalprice_present boolean, totalprice_v double, "
    "status_present boolean, status_v string"
)


def row(pk, commit_scn, scn, op, tp=None, tp_p=False, st=None, st_p=False, ssn=0):
    return ("SCOTT", "ORDERS", pk, commit_scn, scn, ssn, op, tp_p, tp, st_p, st)


def test_partial_update_keeps_absent_columns(spark):
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/replica"
        # batch 1: full insert
        b1 = spark.createDataFrame(
            [row(1, 100, 10, 1, tp=50.0, tp_p=True, st="A", st_p=True)], SCHEMA
        )
        merge_wrapped_batch(spark, b1, path)
        # batch 2: partial update — only totalprice present
        b2 = spark.createDataFrame(
            [row(1, 200, 20, 3, tp=75.0, tp_p=True, st=None, st_p=False)], SCHEMA
        )
        merge_wrapped_batch(spark, b2, path)
        r = replica_state(spark, path).collect()[0]
        assert r.totalprice == 75.0  # updated
        assert r.status == "A"       # kept (absent from the change)


def test_partial_update_sets_explicit_null(spark):
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/replica"
        b1 = spark.createDataFrame(
            [row(1, 100, 10, 1, tp=50.0, tp_p=True, st="A", st_p=True)], SCHEMA
        )
        merge_wrapped_batch(spark, b1, path)
        # present-with-null ≠ absent: status explicitly set to NULL
        b2 = spark.createDataFrame(
            [row(1, 200, 20, 3, tp=None, tp_p=False, st=None, st_p=True)], SCHEMA
        )
        merge_wrapped_batch(spark, b2, path)
        r = replica_state(spark, path).collect()[0]
        assert r.totalprice == 50.0
        assert r.status is None  # tri-state: explicit NULL applied


def test_wrapped_delete_removes_row(spark):
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/replica"
        b1 = spark.createDataFrame(
            [
                row(1, 100, 10, 1, tp=50.0, tp_p=True, st="A", st_p=True),
                row(2, 100, 11, 1, tp=60.0, tp_p=True, st="B", st_p=True),
            ],
            SCHEMA,
        )
        merge_wrapped_batch(spark, b1, path)
        b2 = spark.createDataFrame([row(2, 200, 20, 2)], SCHEMA)
        merge_wrapped_batch(spark, b2, path)
        rows = replica_state(spark, path).collect()
        assert [r.pk for r in rows] == [1]
