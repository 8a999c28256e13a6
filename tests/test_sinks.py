"""Sink SQL generation (shape parity with TargetDbSqlUtils semantics —
JdbcSinkCreateTableTest/SqlInsertTest/SqlDeleteTest patterns) and the
parquet MERGE sink."""

import tempfile

import pytest
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from oracdc_spark.sinks.jdbc_sql import (
    CLICKHOUSE,
    DIALECTS,
    MSSQL,
    MYSQL,
    ORACLE,
    POSTGRESQL,
    SinkTable,
    create_table_sql,
    delete_sql,
    partial_update_sql,
    upsert_sql,
)

DEPT = SinkTable(
    name="DEPT",
    schema=StructType(
        [
            StructField("deptno", LongType(), False),
            StructField("dept_key", StringType(), False),
            StructField("dname", StringType(), True),
            StructField("loc", StringType(), True),
            StructField("budget", DoubleType(), True),
        ]
    ),
    pk_cols=("deptno", "dept_key"),
)


def test_create_table_pg():
    sql = create_table_sql(DEPT, POSTGRESQL)
    assert "deptno bigint NOT NULL" in sql
    assert "dept_key varchar(255) NOT NULL" in sql  # PK strings sized
    assert "dname text" in sql
    assert "PRIMARY KEY (deptno, dept_key)" in sql


def test_create_table_clickhouse_replacing():
    sql = create_table_sql(DEPT, CLICKHOUSE)
    assert "ENGINE = ReplacingMergeTree ORDER BY (deptno, dept_key)" in sql
    assert "budget Float64" in sql


def test_upsert_pg_on_conflict():
    sql = upsert_sql(DEPT, POSTGRESQL)
    assert sql.startswith("INSERT INTO DEPT (deptno, dept_key, dname, loc, budget)")
    assert "ON CONFLICT (deptno, dept_key) DO UPDATE SET" in sql
    assert "dname = EXCLUDED.dname" in sql
    assert "deptno = EXCLUDED" not in sql  # PK never updated


def test_upsert_mysql_on_duplicate():
    sql = upsert_sql(DEPT, MYSQL)
    assert "ON DUPLICATE KEY UPDATE" in sql and "dname = VALUES(dname)" in sql


def test_upsert_oracle_merge():
    sql = upsert_sql(DEPT, ORACLE)
    assert sql.startswith("MERGE INTO DEPT d USING (SELECT ? AS deptno")
    assert "FROM DUAL" in sql
    assert "ON (d.deptno = s.deptno AND d.dept_key = s.dept_key)" in sql
    assert "WHEN MATCHED THEN UPDATE SET d.dname = s.dname" in sql
    assert "WHEN NOT MATCHED THEN INSERT" in sql


def test_upsert_mssql_merge_terminated():
    sql = upsert_sql(DEPT, MSSQL)
    assert sql.endswith(";") and "FROM DUAL" not in sql


def test_delete_by_pk():
    assert delete_sql(DEPT, POSTGRESQL) == (
        "DELETE FROM DEPT WHERE deptno = ? AND dept_key = ?"
    )
    assert delete_sql(DEPT, CLICKHOUSE).startswith("ALTER TABLE DEPT DELETE WHERE")


def test_partial_update_only_present_columns():
    sql = partial_update_sql(DEPT, POSTGRESQL, ("deptno", "dept_key", "loc"))
    assert sql == "UPDATE DEPT SET loc = ? WHERE deptno = ? AND dept_key = ?"


@pytest.mark.parametrize("dialect", DIALECTS)
def test_all_dialects_generate(dialect):
    assert create_table_sql(DEPT, dialect)
    assert upsert_sql(DEPT, dialect)
    assert delete_sql(DEPT, dialect)


@pytest.mark.slow
def test_merge_sink_converges(spark):
    """MERGE semantics: apply a batch twice → identical replica
    (replay idempotence), deletes drop rows."""
    from oracdc_spark.feed import change_feed
    from oracdc_spark.operators.cdc import commit_ordered
    from oracdc_spark.sinks.merge import merge_batch, replica_state

    stamped = commit_ordered(change_feed(spark, "/root/testdata/sf0.001"))
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/replica"
        merge_batch(spark, stamped, path)
        first = {(r.pk, r.totalprice, r.status) for r in replica_state(spark, path).collect()}
        merge_batch(spark, stamped, path)  # replay the same batch
        second = {(r.pk, r.totalprice, r.status) for r in replica_state(spark, path).collect()}
        assert first == second
        # replica equals the declared apply_changes operator's output
        from oracdc_spark.operators.cdc import apply_changes

        expected = {
            (r.pk, r.totalprice, r.status)
            for r in apply_changes(change_feed(spark, "/root/testdata/sf0.001")).collect()
        }
        assert first == expected


@pytest.mark.slow
def test_merge_touches_only_affected_buckets(spark):
    """Bucket-pruned MERGE (round-2 verdict item 3): a batch rewrites
    ONLY the bucket directories containing its keys; every other
    bucket's files stay byte-identical."""
    import hashlib
    import os
    import tempfile

    from oracdc_spark.feed import change_feed
    from oracdc_spark.operators.cdc import commit_stamped
    from oracdc_spark.sinks.merge import _load_manifest, merge_batch, replica_state

    import pyspark.sql.functions as F

    def _files_digest(root):
        out = {}
        for dirpath, _, files in os.walk(root):
            for f in sorted(files):
                p = os.path.join(dirpath, f)
                with open(p, "rb") as fh:
                    out[os.path.relpath(p, root)] = hashlib.md5(fh.read()).hexdigest()
        return out

    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/replica"
        stamped = commit_stamped(change_feed(spark, "/root/testdata/sf0.001"))
        merge_batch(spark, stamped, path)

        before = _files_digest(path)
        man_before = _load_manifest(path)["buckets"]
        assert len(man_before) > 1  # layout is really bucketed

        # second batch: update a single pk → touches exactly one bucket
        one = stamped.filter(F.col("pk") == 3).withColumn(
            "commit_scn", F.col("commit_scn") + 1_000_000
        ).withColumn("totalprice", F.lit(9999.0))
        assert one.count() > 0
        merge_batch(spark, one, path)

        after = _files_digest(path)
        man_after = _load_manifest(path)["buckets"]
        from pyspark.sql.functions import hash as _hash, pmod, lit
        touched = {
            str(r[0])
            for r in one.select(
                pmod(_hash("owner", "table_name", "pk"), lit(16)).alias("b")
            ).distinct().collect()
        }
        for b_key, dirname in man_before.items():
            if b_key in touched:
                assert man_after[b_key] != dirname, f"bucket {b_key} should have advanced"
            else:
                # untouched: same directory, byte-identical files
                assert man_after[b_key] == dirname
                in_b_before = {k: v for k, v in before.items() if k.startswith(dirname)}
                in_b_after = {k: v for k, v in after.items() if k.startswith(dirname)}
                assert in_b_before and in_b_before == in_b_after, (
                    f"bucket {b_key} was touched unnecessarily"
                )

        # and the merge itself is correct
        r = {x.pk: x.totalprice for x in replica_state(spark, path).collect()}
        assert r[3] == 9999.0


def test_merge_adopts_legacy_hive_layout(spark):
    """A pre-manifest replica (hive-style pk_bucket=N directories) is
    adopted in place: readable through replica_state, and the next merge
    commits a manifest over it without losing untouched buckets."""
    import os
    import tempfile

    import pyspark.sql.functions as F

    from oracdc_spark.sinks.merge import (
        BUCKET_COL,
        _load_manifest,
        merge_batch,
        replica_state,
    )

    schema = (
        "owner string, table_name string, pk bigint, totalprice double, "
        "status string, commit_scn bigint, scn bigint, ssn bigint, op int"
    )
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/replica"
        legacy = spark.createDataFrame(
            [("S", "T", 1, 10.0, "A", 100, 10, 0, 1),
             ("S", "T", 2, 20.0, "B", 100, 11, 0, 1)],
            schema,
        ).withColumn(
            BUCKET_COL,
            F.pmod(F.hash("owner", "table_name", "pk"), F.lit(4)),
        )
        # old-style write: hive partition dirs, no manifest
        legacy.write.partitionBy(BUCKET_COL).parquet(path)
        os.remove(os.path.join(path, "_SUCCESS"))
        assert _load_manifest(path)["buckets"]  # adopted
        assert replica_state(spark, path).count() == 2

        # merge on top: update pk=1, leave pk=2's bucket untouched
        upd = spark.createDataFrame(
            [("S", "T", 1, 99.0, "A", 200, 20, 0, 3)], schema
        )
        merge_batch(spark, upd, path, n_buckets=4)
        r = {x.pk: x.totalprice for x in replica_state(spark, path).collect()}
        assert r == {1: 99.0, 2: 20.0}


@pytest.mark.slow
def test_merge_crash_before_manifest_commit_leaves_replica_intact(spark, monkeypatch):
    """Crash injection (round-3 ADVICE item 5): a merge that dies at any
    point BEFORE the atomic manifest replace must leave the replica
    readable at its previous state; retrying the merge then converges."""
    import tempfile

    import pyspark.sql.functions as F

    from oracdc_spark import sinks
    from oracdc_spark.feed import change_feed
    from oracdc_spark.operators.cdc import commit_stamped
    from oracdc_spark.sinks import merge as merge_mod
    from oracdc_spark.sinks.merge import merge_batch, replica_state

    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/replica"
        stamped = commit_stamped(change_feed(spark, "/root/testdata/sf0.001"))
        merge_batch(spark, stamped, path)
        state_before = {
            (r.pk, r.totalprice, r.status) for r in replica_state(spark, path).collect()
        }

        one = stamped.filter(F.col("pk") == 3).withColumn(
            "commit_scn", F.col("commit_scn") + 1_000_000
        ).withColumn("totalprice", F.lit(4242.0))

        # crash at the last pre-commit instant: staging written, new
        # generation directories already moved in, manifest NOT replaced
        real_commit = merge_mod._commit_manifest

        def _boom(*a, **k):
            raise OSError("injected crash before manifest commit")

        monkeypatch.setattr(merge_mod, "_commit_manifest", _boom)
        import pytest as _pytest

        with _pytest.raises(OSError, match="injected"):
            merge_batch(spark, one, path)

        # replica still readable at the PRE-merge state
        state_after_crash = {
            (r.pk, r.totalprice, r.status) for r in replica_state(spark, path).collect()
        }
        assert state_after_crash == state_before

        # retry with the real commit: converges, orphans reclaimed
        monkeypatch.setattr(merge_mod, "_commit_manifest", real_commit)
        merge_batch(spark, one, path)
        r = {x.pk: x.totalprice for x in replica_state(spark, path).collect()}
        assert r[3] == 4242.0


def test_merge_delete_empties_bucket(spark):
    """A bucket whose rows are all deleted is dropped, not left stale."""
    import os
    import tempfile

    from oracdc_spark.sinks.merge import merge_batch, replica_state

    schema = (
        "owner string, table_name string, pk bigint, totalprice double, "
        "status string, commit_scn bigint, scn bigint, ssn bigint, op int"
    )
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/replica"
        b1 = spark.createDataFrame(
            [("S", "T", 1, 10.0, "A", 100, 10, 0, 1)], schema
        )
        merge_batch(spark, b1, path, n_buckets=4)
        assert replica_state(spark, path).count() == 1
        b2 = spark.createDataFrame(
            [("S", "T", 1, None, None, 200, 20, 0, 2)], schema
        )
        merge_batch(spark, b2, path, n_buckets=4)
        from oracdc_spark.sinks.merge import _load_manifest

        assert _load_manifest(path)["buckets"] == {}


@pytest.mark.slow
def test_scd2_sink_converges_under_chunked_and_replayed_delivery(spark):
    """Incremental SCD2: chunked out-of-order delivery + a replayed
    chunk must converge to the batch scd2_history of the whole feed."""
    import pyspark.sql.functions as F

    from oracdc_spark.feed import change_feed
    from oracdc_spark.operators.cdc import commit_stamped, scd2_history
    from oracdc_spark.sinks.merge import scd2_merge_batch, scd2_state

    feed = change_feed(spark, "/root/testdata/sf0.001")
    stamped = commit_stamped(feed)

    def _key(df):
        return {
            (
                r.pk, r.version, r.valid_from_scn, r.valid_to_scn,
                r.is_deleted, r.is_current, r.totalprice, r.status,
            )
            for r in df.collect()
        }

    expected = _key(scd2_history(feed))
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/scd2"
        # arbitrary (non-chronological) 3-way chunking
        chunks = [stamped.filter(F.col("scn") % 3 == i) for i in (2, 0, 1)]
        for c in chunks:
            scd2_merge_batch(spark, c, path)
        scd2_merge_batch(spark, chunks[0], path)  # replay
        got = _key(scd2_state(spark, path))
    assert got == expected


class TestNestedAndKeylessCreate:
    """K4 edge behaviors from the reference sink tests."""

    def test_struct_field_unnests_to_leaf_columns(self):
        """JdbcSinkTransformNestedSchemaTest: a struct-typed value field
        (transformed LOB) contributes its LEAF columns, bare names."""
        from pyspark.sql.types import (
            LongType,
            StringType,
            StructField,
            StructType,
        )

        from oracdc_spark.sinks.jdbc_sql import SinkTable, create_table_sql

        t = SinkTable(
            "FND_LOBS",
            StructType(
                [
                    StructField("FILE_ID", LongType(), False),
                    StructField("FILE_NAME", StringType(), True),
                    StructField(
                        "FILE_DATA",
                        StructType([StructField("S3_URL", StringType(), True)]),
                        True,
                    ),
                ]
            ),
            ("FILE_ID",),
        )
        ora = create_table_sql(t, "oracle")
        pg = create_table_sql(t, "postgresql")
        assert "S3_URL VARCHAR2(4000)" in ora
        assert "S3_URL text" in pg
        assert "FILE_DATA" not in ora  # the struct itself is not a column

    def test_keyless_view_object_table_has_no_pk_clause(self):
        """JdbcSinkVOCreateTableTest: no key columns → no PRIMARY KEY."""
        from pyspark.sql.types import DoubleType, StructField, StructType

        from oracdc_spark.sinks.jdbc_sql import (
            DIALECTS,
            SinkTable,
            create_table_sql,
        )

        t = SinkTable(
            "SALGRADE",
            StructType(
                [
                    StructField("GRADE", DoubleType(), True),
                    StructField("LOSAL", DoubleType(), True),
                    StructField("HISAL", DoubleType(), True),
                ]
            ),
            (),
        )
        for d in DIALECTS:
            ddl = create_table_sql(t, d)
            assert "PRIMARY KEY" not in ddl
        assert "GRADE BINARY_DOUBLE" in create_table_sql(t, "oracle")
        assert "GRADE double precision" in create_table_sql(t, "postgresql")
        assert "GRADE double" in create_table_sql(t, "mysql")
        assert "GRADE float" in create_table_sql(t, "mssql")
        assert "ORDER BY tuple()" in create_table_sql(t, "clickhouse")


# ---------------------------------------------------------------------------
# Value-only (keyless) tables and wrapped-envelope DDL (r9)
# ---------------------------------------------------------------------------

from pyspark.sql.types import ByteType, TimestampType  # noqa: E402

from oracdc_spark.sinks.jdbc_sql import insert_sql  # noqa: E402

# the reference's SALGRADE fixture: three FLOAT64 value fields, NO key
# (JdbcSinkVOSqlInsertTest.java:50-107)
SALGRADE = SinkTable(
    name="SALGRADE",
    schema=StructType(
        [
            StructField("GRADE", DoubleType(), True),
            StructField("LOSAL", DoubleType(), True),
            StructField("HISAL", DoubleType(), True),
        ]
    ),
    pk_cols=(),
)


def test_value_only_insert_all_dialects():
    """TargetDbSqlUtils' pkColumns==0 branch emits a plain INSERT for
    every dialect — the upsert degrades to it, byte-identical."""
    for dialect in DIALECTS:
        sql = insert_sql(SALGRADE, dialect)
        assert sql == "INSERT INTO SALGRADE (GRADE, LOSAL, HISAL) VALUES (?, ?, ?)"
        assert upsert_sql(SALGRADE, dialect) == sql


def test_value_only_no_delete_or_partial_update():
    """The reference's value-only branch generates NO delete; asking for
    one must fail loudly rather than emit `DELETE ... WHERE ` (empty)."""
    for dialect in DIALECTS:
        with pytest.raises(ValueError, match="insert-only"):
            delete_sql(SALGRADE, dialect)
    with pytest.raises(ValueError, match="insert-only"):
        partial_update_sql(SALGRADE, POSTGRESQL, ("GRADE",))


def test_value_only_create_table_has_no_pk_clause():
    for dialect in DIALECTS:
        ddl = create_table_sql(SALGRADE, dialect)
        assert "PRIMARY KEY" not in ddl.upper() or "tuple()" in ddl
    # ClickHouse keyless ReplacingMergeTree orders by tuple()
    assert "tuple()" in create_table_sql(SALGRADE, CLICKHOUSE)


def test_wrapped_envelope_create_table_types():
    """WrappedDataJdbcSinkCreateTableTest.java:60-136: DDL generated
    from the WRAPPED value schema must type each column from the
    envelope's V field (INT8 -> NUMBER(3)/smallint/tinyint/tinyint) and
    key the table on the ORA_ROW_ID pseudo-key."""
    key_schema = StructType([StructField("ORA_ROW_ID", StringType(), False)])
    value_schema = StructType(
        [
            StructField(
                "DEPTNO",
                StructType([StructField("V", ByteType(), False)]),
                False,
            ),
            StructField(
                "DNAME",
                StructType([StructField("V", StringType(), True)]),
                True,
            ),
            StructField(
                "LOC",
                StructType([StructField("V", StringType(), True)]),
                True,
            ),
            StructField("LAST_UPDATE_DATE", TimestampType(), False),
        ]
    )
    t = SinkTable.from_wrapped("DEPT", key_schema, value_schema)
    assert t.pk_cols == ("ORA_ROW_ID",)
    assert [f.name for f in t.schema.fields] == [
        "ORA_ROW_ID", "DEPTNO", "DNAME", "LOC", "LAST_UPDATE_DATE",
    ]
    assert "DEPTNO NUMBER(3)" in create_table_sql(t, ORACLE)
    assert "DEPTNO smallint" in create_table_sql(t, POSTGRESQL)
    assert "DEPTNO tinyint" in create_table_sql(t, MYSQL)
    assert "DEPTNO tinyint" in create_table_sql(t, MSSQL)
    # the key came from the key schema, sized-string typed, PK clause present
    ddl = create_table_sql(t, ORACLE)
    assert "ORA_ROW_ID VARCHAR2(255)" in ddl and "PRIMARY KEY (ORA_ROW_ID)" in ddl
    # and the wrapped table upserts/deletes normally (it HAS a key)
    assert "MERGE INTO DEPT" in upsert_sql(t, ORACLE)
    assert delete_sql(t, POSTGRESQL) == "DELETE FROM DEPT WHERE ORA_ROW_ID = ?"
