"""Per-dialect sink SQL generation (K2/K3/K4 — SURVEY §2.2).

Re-implements the *semantics* of the reference's sink SQL builder
(TargetDbSqlUtils.java:77-186 type maps, :203-334 createTableSql,
:380-560 upsert/delete generation; JdbcSinkTable.java:398-623 usage):
idempotent per-dialect upserts keyed on the PK, delete-by-PK, and
CREATE TABLE from a Spark schema.  The strings are standard public SQL
dialect syntax (PostgreSQL ON CONFLICT, MySQL ON DUPLICATE KEY, Oracle/
MSSQL MERGE, ClickHouse ReplacingMergeTree).

In the Spark pipeline these statements are executed from ``foreachBatch``
against the JDBC target; the batch is PK-deduped first (K6,
``operators.cdc.batch_pk_dedup``) so last-write-wins ordering survives
batched execution — the Spark-native equivalent of the reference's
flush-on-duplicate-PK behavior.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    ByteType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
    TimestampType,
)

POSTGRESQL = "postgresql"
MYSQL = "mysql"
ORACLE = "oracle"
MSSQL = "mssql"
CLICKHOUSE = "clickhouse"

DIALECTS = (POSTGRESQL, MYSQL, ORACLE, MSSQL, CLICKHOUSE)

# Spark type → dialect column type (reference type maps:
# TargetDbSqlUtils.java:77-186, incl. the ClickHouse map at :165)
_TYPE_MAP: dict[str, dict[type, str]] = {
    POSTGRESQL: {
        ByteType: "smallint", ShortType: "smallint", IntegerType: "integer",
        LongType: "bigint", FloatType: "real", DoubleType: "double precision",
        BooleanType: "boolean", StringType: "text", BinaryType: "bytea",
        DateType: "date", TimestampType: "timestamp", TimestampNTZType: "timestamp",
    },
    MYSQL: {
        ByteType: "tinyint", ShortType: "smallint", IntegerType: "int",
        LongType: "bigint", FloatType: "float", DoubleType: "double",
        BooleanType: "boolean", StringType: "text", BinaryType: "blob",
        DateType: "date", TimestampType: "datetime(6)", TimestampNTZType: "datetime(6)",
    },
    ORACLE: {
        ByteType: "NUMBER(3)", ShortType: "NUMBER(5)", IntegerType: "NUMBER(10)",
        LongType: "NUMBER(19)", FloatType: "BINARY_FLOAT", DoubleType: "BINARY_DOUBLE",
        BooleanType: "NUMBER(1)", StringType: "VARCHAR2(4000)", BinaryType: "BLOB",
        DateType: "DATE", TimestampType: "TIMESTAMP", TimestampNTZType: "TIMESTAMP",
    },
    MSSQL: {
        ByteType: "tinyint", ShortType: "smallint", IntegerType: "int",
        LongType: "bigint", FloatType: "real", DoubleType: "float",
        BooleanType: "bit", StringType: "nvarchar(max)", BinaryType: "varbinary(max)",
        DateType: "date", TimestampType: "datetime2", TimestampNTZType: "datetime2",
    },
    CLICKHOUSE: {
        ByteType: "Int8", ShortType: "Int16", IntegerType: "Int32",
        LongType: "Int64", FloatType: "Float32", DoubleType: "Float64",
        BooleanType: "Bool", StringType: "String", BinaryType: "String",
        DateType: "Date32", TimestampType: "DateTime64(6)", TimestampNTZType: "DateTime64(6)",
    },
}

# PK columns need a sized string type in some dialects
# (TargetDbSqlUtils pkStringLength behavior)
_PK_STRING: dict[str, str] = {
    POSTGRESQL: "varchar(255)",
    MYSQL: "varchar(255)",
    ORACLE: "VARCHAR2(255)",
    MSSQL: "nvarchar(255)",
    CLICKHOUSE: "String",
}


def _col_type(dialect: str, field, is_pk: bool) -> str:
    t = type(field.dataType)
    if t is DecimalType:
        d = field.dataType
        if dialect == CLICKHOUSE:
            return f"Decimal({d.precision}, {d.scale})"
        if dialect == ORACLE:
            return f"NUMBER({d.precision},{d.scale})"
        return f"decimal({d.precision},{d.scale})"
    if is_pk and t is StringType:
        return _PK_STRING[dialect]
    try:
        return _TYPE_MAP[dialect][t]
    except KeyError:
        raise ValueError(f"no {dialect} mapping for Spark type {field.dataType}") from None


@dataclass(frozen=True)
class SinkTable:
    name: str
    schema: StructType
    pk_cols: tuple[str, ...]

    @property
    def non_pk_cols(self) -> tuple[str, ...]:
        return tuple(f.name for f in self.schema.fields if f.name not in self.pk_cols)

    @property
    def all_cols(self) -> tuple[str, ...]:
        return tuple(f.name for f in self.schema.fields)

    @classmethod
    def from_wrapped(
        cls, name: str, key_schema: StructType, value_schema: StructType
    ) -> "SinkTable":
        """Build the sink table from a WRAPPED-envelope record: every
        value field of type ``struct<V: T, ...>`` (the
        envelope.wrapped_tristate / reference WRAPPED_*_SCHEMA shape)
        unwraps to a plain column of its V type; unwrapped fields (the
        reference's LAST_UPDATE_DATE Timestamp) pass through; key
        fields (e.g. the ORA_ROW_ID pseudo-key) become the PK.  Mirrors
        WrappedDataJdbcSinkCreateTableTest.java:60-136 — the created
        DDL must type DEPTNO from the wrapped INT8's V, not as a
        struct (NUMBER(3) / smallint / tinyint per dialect)."""
        fields = list(key_schema.fields)
        for f in value_schema.fields:
            if f.name in {k.name for k in key_schema.fields}:
                continue
            dt = f.dataType
            if isinstance(dt, StructType) and "V" in dt.fieldNames():
                inner = dt["V"]
                fields.append(
                    StructField(f.name, inner.dataType, inner.nullable)
                )
            else:
                fields.append(f)
        return cls(
            name, StructType(fields), tuple(k.name for k in key_schema.fields)
        )


def _leaf_fields(schema: StructType):
    """Struct-typed value fields (a transformed LOB column, e.g.
    FILE_DATA → {S3_URL}) unnest into their LEAF columns in the created
    table, bare leaf names — JdbcSinkTransformNestedSchemaTest asserts
    ``S3_URL VARCHAR2(4000)``, not a prefixed name."""
    for f in schema.fields:
        if isinstance(f.dataType, StructType):
            yield from _leaf_fields(f.dataType)
        else:
            yield f


def create_table_sql(t: SinkTable, dialect: str) -> str:
    """K4 — CREATE TABLE from the record schema (auto-create target).
    A keyless table (a view-object sink, JdbcSinkVOCreateTableTest /
    TargetDbSqlUtils.java:216-226 ``onlyValue``) omits the PRIMARY KEY
    clause entirely."""
    if dialect not in DIALECTS:
        raise ValueError(f"unknown dialect {dialect}")
    cols = []
    for f in _leaf_fields(t.schema):
        is_pk = f.name in t.pk_cols
        null = " NOT NULL" if (is_pk or not f.nullable) else ""
        cols.append(f"  {f.name} {_col_type(dialect, f, is_pk)}{null}")
    pk = ", ".join(t.pk_cols)
    if dialect == CLICKHOUSE:
        # idempotence via ReplacingMergeTree keyed on the PK; a keyless
        # table still needs an ORDER BY — empty tuple
        body = ",\n".join(cols)
        order = f"({pk})" if t.pk_cols else "tuple()"
        return (
            f"CREATE TABLE {t.name} (\n{body}\n) "
            f"ENGINE = ReplacingMergeTree ORDER BY {order}"
        )
    if t.pk_cols:
        cols.append(f"  PRIMARY KEY ({pk})")
    body = ",\n".join(cols)
    return f"CREATE TABLE {t.name} (\n{body}\n)"


def insert_sql(t: SinkTable, dialect: str) -> str:
    """Plain parameterized INSERT — the ONLY DML the reference
    generates for a keyless (value-only / view-object) table or in
    audit-trail mode (TargetDbSqlUtils.java:379-405: the
    ``pkColumns.size() == 0 || auditTrail`` branch emits INSERT and
    neither UPSERT nor DELETE; JdbcSinkVOSqlInsertTest asserts the
    SALGRADE form).  Dialect-independent by construction."""
    cols = ", ".join(t.all_cols)
    qs = ", ".join("?" for _ in t.all_cols)
    return f"INSERT INTO {t.name} ({cols}) VALUES ({qs})"


def upsert_sql(t: SinkTable, dialect: str) -> str:
    """K2 — idempotent upsert, ?-parameterized in column order.
    A keyless table degrades to the reference's value-only mode:
    plain INSERT (see :func:`insert_sql`).

    An ALL-PK table (a pure link/association table — every column in
    the key, nothing to update) also degrades to plain INSERT: the
    reference's ``onlyPkColumns`` branch omits the on-conflict / merge
    clause entirely in every dialect (TargetDbSqlUtils.java:376,
    452-455, 516-518, 599-610 — without this branch the generated
    ``DO UPDATE SET``/``WHEN MATCHED THEN UPDATE SET`` would carry an
    empty assignment list and be a syntax error, the defect the live
    DuckDB execution property caught here)."""
    if not t.pk_cols or not t.non_pk_cols:
        return insert_sql(t, dialect)
    cols = ", ".join(t.all_cols)
    qs = ", ".join("?" for _ in t.all_cols)
    if dialect == POSTGRESQL:
        sets = ", ".join(f"{c} = EXCLUDED.{c}" for c in t.non_pk_cols)
        pk = ", ".join(t.pk_cols)
        return (
            f"INSERT INTO {t.name} ({cols}) VALUES ({qs}) "
            f"ON CONFLICT ({pk}) DO UPDATE SET {sets}"
        )
    if dialect == MYSQL:
        sets = ", ".join(f"{c} = VALUES({c})" for c in t.non_pk_cols)
        return (
            f"INSERT INTO {t.name} ({cols}) VALUES ({qs}) "
            f"ON DUPLICATE KEY UPDATE {sets}"
        )
    if dialect in (ORACLE, MSSQL):
        sel = ", ".join(f"? AS {c}" for c in t.all_cols)
        src = f"(SELECT {sel} FROM DUAL)" if dialect == ORACLE else f"(SELECT {sel})"
        on = " AND ".join(f"d.{c} = s.{c}" for c in t.pk_cols)
        sets = ", ".join(f"d.{c} = s.{c}" for c in t.non_pk_cols)
        ins_cols = ", ".join(t.all_cols)
        ins_vals = ", ".join(f"s.{c}" for c in t.all_cols)
        stmt = (
            f"MERGE INTO {t.name} d USING {src} s ON ({on}) "
            f"WHEN MATCHED THEN UPDATE SET {sets} "
            f"WHEN NOT MATCHED THEN INSERT ({ins_cols}) VALUES ({ins_vals})"
        )
        return stmt + ";" if dialect == MSSQL else stmt
    if dialect == CLICKHOUSE:
        # ReplacingMergeTree: plain insert, last version wins on merge
        return f"INSERT INTO {t.name} ({cols}) VALUES ({qs})"
    raise ValueError(f"unknown dialect {dialect}")


def delete_sql(t: SinkTable, dialect: str) -> str:
    """K3 — delete-by-PK (tombstone / op='d' handling).  A keyless
    table has no delete path — the reference's value-only branch
    (TargetDbSqlUtils.java:379-405) generates no DELETE statement, so
    asking for one is a caller error, not silently-broken SQL."""
    if not t.pk_cols:
        raise ValueError(
            f"{t.name}: value-only (keyless) sink table is insert-only; "
            "no DELETE can be generated without a primary key"
        )
    where = " AND ".join(f"{c} = ?" for c in t.pk_cols)
    if dialect == CLICKHOUSE:
        return f"ALTER TABLE {t.name} DELETE WHERE {where}"
    return f"DELETE FROM {t.name} WHERE {where}"


def partial_update_sql(t: SinkTable, dialect: str, present_cols: tuple[str, ...]) -> str:
    """K5 — wrapped-data partial update: UPDATE containing only the
    columns present in this change (WrappedDataTable.java:72-90; the
    reference caches these per column-bitmap — callers should memoize on
    ``present_cols``)."""
    if not t.pk_cols:
        raise ValueError(
            f"{t.name}: partial update requires a primary key "
            "(keyless sinks are insert-only)"
        )
    sets = ", ".join(f"{c} = ?" for c in present_cols if c not in t.pk_cols)
    if not sets:
        # every present column is in the key: an empty SET list is a
        # syntax error in every dialect — caller error, like delete_sql
        # on a keyless table
        raise ValueError(
            f"{t.name}: partial update with no non-key columns present "
            "has nothing to update"
        )
    where = " AND ".join(f"{c} = ?" for c in t.pk_cols)
    return f"UPDATE {t.name} SET {sets} WHERE {where}"
