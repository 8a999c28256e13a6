"""G8 streaming: DDL events arriving across micro-batches evolve the
registry version-by-version; rollback-before-original pairing works
across micro-batch boundaries."""

import glob
import os
import shutil
import tempfile

import pytest
from pyspark.sql.types import LongType, StringType, StructField, StructType

from oracdc_spark.registry import SchemaRegistry, TableDef
from oracdc_spark.streaming.ddl import run_ddl_capture


def _write_one_file(df, out_dir, name):
    tmp = out_dir + f".stage_{name}"
    df.coalesce(1).write.parquet(tmp)
    os.makedirs(out_dir, exist_ok=True)
    shutil.move(glob.glob(f"{tmp}/part-*.parquet")[0], f"{out_dir}/{name}.parquet")
    shutil.rmtree(tmp)


DDL_SCHEMA = "scn bigint, op int, owner string, table_name string, ddl_text string"


def test_streaming_ddl_evolves_registry(spark):
    reg = SchemaRegistry()
    reg.register(
        TableDef(
            "SCOTT", "DEPT",
            StructType([StructField("DEPTNO", LongType(), False),
                        StructField("DNAME", StringType(), True)]),
            ("DEPTNO",),
        )
    )
    with tempfile.TemporaryDirectory() as d:
        feed = f"{d}/ddl"
        b1 = spark.createDataFrame(
            [(100, 5, "SCOTT", "DEPT", "ALTER TABLE SCOTT.DEPT ADD (LOC VARCHAR2(50))")],
            DDL_SCHEMA,
        )
        _write_one_file(b1, feed, "b1")
        stream = (
            spark.readStream.schema(DDL_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )
        q = run_ddl_capture(stream, reg, f"{d}/ck")
        q.processAllAvailable()
        assert reg.get("SCOTT", "DEPT").version == 2
        assert "LOC" in [f.name for f in reg.get("SCOTT", "DEPT").schema.fields]

        # second micro-batch: two DDLs, applied in SCN order
        b2 = spark.createDataFrame(
            [
                (300, 5, "SCOTT", "DEPT", "ALTER TABLE SCOTT.DEPT DROP COLUMN LOC"),
                (200, 5, "SCOTT", "DEPT", "ALTER TABLE SCOTT.DEPT ADD (BUDGET NUMBER(10,2))"),
            ],
            DDL_SCHEMA,
        )
        _write_one_file(b2, feed, "b2")
        q.processAllAvailable()
        q.stop()
        td = reg.get("SCOTT", "DEPT")
        assert td.version == 4
        names = [f.name for f in td.schema.fields]
        assert "BUDGET" in names and "LOC" not in names
        # history preserves SCN application order
        assert "BUDGET" in td.history[-2][1] and "DROP" in td.history[-1][1]


@pytest.mark.slow
def test_rollback_marker_before_original_across_batches(spark):
    """Suspicious-first-record case (OraCdcTransaction.java:351-369): the
    partial-rollback marker arrives in an EARLIER micro-batch than its
    original change; state must hold the marker and cancel later."""
    from oracdc_spark.streaming.assembly import assemble_transactions

    FEED = (
        "scn bigint, ssn bigint, rba string, xid string, op int, rollback boolean, "
        "owner string, table_name string, row_id string, pk bigint, "
        "totalprice double, status string, before_totalprice double, "
        "before_status string, changed_cols string"
    )

    def r(scn, ssn, xid, op, rollback, pk, tp):
        rid = f"R{pk}" if pk is not None else None
        return (scn, ssn, f"1.{scn}.{ssn}", xid, op, rollback, "S", "T", rid, pk,
                tp, None, None, None, "TOTALPRICE,STATUS")

    with tempfile.TemporaryDirectory() as d:
        feed = f"{d}/feed"
        # batch 1: the rollback marker FIRST (scn 14, pairs with future original)
        b1 = spark.createDataFrame([r(14, 1, "A", 3, True, 3, None)], FEED)
        _write_one_file(b1, feed, "b1")
        # batch 2: the original change + an insert + commit
        b2 = spark.createDataFrame(
            [
                r(13, 0, "A", 1, False, 7, 70.0),
                r(14, 0, "A", 3, False, 3, 80.0),  # cancelled by the earlier marker
                r(20, 0, "A", 7, False, None, None),
            ],
            FEED,
        )
        stream = (
            spark.readStream.schema(FEED).option("maxFilesPerTrigger", 1).parquet(feed)
        )
        q = (
            assemble_transactions(stream)
            .writeStream.format("memory")
            .queryName("rb_first")
            .option("checkpointLocation", f"{d}/ck")
            .outputMode("append")
            .start()
        )
        q.processAllAvailable()
        _write_one_file(b2, feed, "b2")
        q.processAllAvailable()
        q.stop()
        rows = spark.sql("SELECT * FROM rb_first").collect()
        # only the pk=7 insert survives; the pk=3 update was cancelled
        assert [(r2.pk, r2.scn) for r2 in rows] == [(7, 13)]
