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
