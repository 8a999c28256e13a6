"""Schema registry / DDL evolution (fixtures per FIXTURES.md §4.3 —
OraCdcAlterTablePreProcessorTest / OraCdcColumnFromTextTest /
OraCdcGuardUnusedColumnTest patterns)."""

import pytest
from pyspark.sql.types import (
    ByteType,
    DecimalType,
    DoubleType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

from oracdc_spark.registry import (
    KEY_ROWID_PSEUDO,
    KEY_UNIQUE_NOT_NULL,
    KEY_WELL_DEFINED_PK,
    SchemaRegistry,
    TableDef,
    choose_key,
    oracle_type_to_spark,
    strip_guard_columns,
)


class TestTypeMapping:
    @pytest.mark.parametrize(
        "ora,spark_t",
        [
            ("NUMBER(1,0)", ByteType()),
            ("NUMBER(2,0)", ByteType()),
            ("NUMBER(4,0)", ShortType()),
            ("NUMBER(9,0)", IntegerType()),
            ("NUMBER(18,0)", LongType()),
            ("NUMBER(19,0)", DecimalType(38, 0)),
            ("NUMBER(11,7)", DecimalType(11, 7)),
            ("NUMBER", DoubleType()),
            ("INTEGER", DecimalType(38, 0)),
            ("BINARY_DOUBLE", DoubleType()),
            ("VARCHAR2(200)", StringType()),
            ("DATE", TimestampNTZType()),
            ("TIMESTAMP(6)", TimestampNTZType()),
            ("ROWID", StringType()),
        ],
    )
    def test_number_tiering(self, ora, spark_t):
        assert oracle_type_to_spark(ora) == spark_t


class TestKeyPreference:
    def test_pk_wins(self):
        assert choose_key(("ID",), ("U1",)) == (("ID",), KEY_WELL_DEFINED_PK)

    def test_unique_fallback(self):
        assert choose_key((), ("U1", "U2")) == (("U1", "U2"), KEY_UNIQUE_NOT_NULL)

    def test_rowid_pseudo_key(self):
        assert choose_key((), ()) == (("ORA_ROW_ID",), KEY_ROWID_PSEUDO)


def _dept() -> TableDef:
    return TableDef(
        owner="SCOTT",
        name="DEPT",
        schema=StructType(
            [
                StructField("DEPTNO", LongType(), False),
                StructField("DNAME", StringType(), True),
                StructField("LOC", StringType(), True),
                StructField("SYS_NC00004$", StringType(), True),  # guard col
            ]
        ),
        key_cols=("DEPTNO",),
    )


class TestRegistry:
    def test_guard_columns_stripped_on_register(self):
        reg = SchemaRegistry()
        td = reg.register(_dept())
        assert [f.name for f in td.schema.fields] == ["DEPTNO", "DNAME", "LOC"]

    def test_add_column_bumps_version(self):
        reg = SchemaRegistry()
        reg.register(_dept())
        td = reg.apply_ddl(
            "SCOTT", "DEPT", "ALTER TABLE SCOTT.DEPT ADD (BUDGET NUMBER(10,2) DEFAULT 0 NOT NULL)"
        )
        assert td.version == 2
        f = td.schema["BUDGET"]
        assert f.dataType == DecimalType(10, 2) and not f.nullable

    def test_add_multiple_columns(self):
        reg = SchemaRegistry()
        reg.register(_dept())
        td = reg.apply_ddl(
            "SCOTT", "DEPT", "ALTER TABLE SCOTT.DEPT ADD (A NUMBER(5), B VARCHAR2(10))"
        )
        assert td.version == 2
        assert td.schema["A"].dataType == IntegerType()
        assert td.schema["B"].dataType == StringType()

    def test_drop_column(self):
        reg = SchemaRegistry()
        reg.register(_dept())
        td = reg.apply_ddl("SCOTT", "DEPT", "ALTER TABLE SCOTT.DEPT DROP COLUMN LOC")
        assert td.version == 2
        assert "LOC" not in [f.name for f in td.schema.fields]

    def test_drop_key_column_rejected(self):
        reg = SchemaRegistry()
        reg.register(_dept())
        with pytest.raises(ValueError, match="key column"):
            reg.apply_ddl("SCOTT", "DEPT", "ALTER TABLE SCOTT.DEPT DROP COLUMN DEPTNO")

    def test_modify_column_type(self):
        reg = SchemaRegistry()
        reg.register(_dept())
        td = reg.apply_ddl("SCOTT", "DEPT", "ALTER TABLE SCOTT.DEPT MODIFY DNAME VARCHAR2(200)")
        assert td.version == 2
        assert td.schema["DNAME"].dataType == StringType()

    def test_rename_column(self):
        reg = SchemaRegistry()
        reg.register(_dept())
        td = reg.apply_ddl(
            "SCOTT", "DEPT", "ALTER TABLE SCOTT.DEPT RENAME COLUMN LOC TO LOCATION"
        )
        assert td.version == 2
        assert "LOCATION" in [f.name for f in td.schema.fields]

    def test_set_unused(self):
        reg = SchemaRegistry()
        reg.register(_dept())
        td = reg.apply_ddl("SCOTT", "DEPT", "ALTER TABLE SCOTT.DEPT SET UNUSED COLUMN LOC")
        assert td.version == 2
        assert "LOC" not in [f.name for f in td.schema.fields]

    def test_noop_ddl_keeps_version(self):
        reg = SchemaRegistry()
        reg.register(_dept())
        td = reg.apply_ddl("SCOTT", "DEPT", "ALTER TABLE SCOTT.DEPT ENABLE ROW MOVEMENT")
        assert td.version == 1

    def test_history_tracks_ddl(self):
        reg = SchemaRegistry()
        reg.register(_dept())
        reg.apply_ddl("SCOTT", "DEPT", "ALTER TABLE SCOTT.DEPT ADD (X NUMBER(3))")
        reg.apply_ddl("SCOTT", "DEPT", "ALTER TABLE SCOTT.DEPT DROP COLUMN X")
        td = reg.get("SCOTT", "DEPT")
        assert td.version == 3 and len(td.history) == 2


def test_strip_unused_suffix():
    s = StructType(
        [
            StructField("A", LongType(), True),
            StructField("SYS_C00002_23010100:00:00$", StringType(), True),
        ]
    )
    out = strip_guard_columns(s)
    assert [f.name for f in out.fields] == ["A"]


class TestUnsupportedDdl:
    """The reference pre-processes and IGNORES non-column DDL
    (OraSqlUtils.alterTablePreProcessor returns null) — no phantom
    columns, no crash, version unchanged (round-2 advice item 2)."""

    DDLS = [
        "ALTER TABLE SCOTT.DEPT ADD CONSTRAINT dept_pk PRIMARY KEY (DEPTNO)",
        "ALTER TABLE SCOTT.DEPT ADD SUPPLEMENTAL LOG DATA (ALL) COLUMNS",
        "ALTER TABLE SCOTT.DEPT DROP CONSTRAINT dept_pk",
        "ALTER TABLE SCOTT.DEPT DROP PRIMARY KEY",
        "ALTER TABLE SCOTT.DEPT MODIFY CONSTRAINT dept_fk ENABLE",
        "ALTER TABLE SCOTT.DEPT RENAME CONSTRAINT a TO b",
        "ALTER TABLE SCOTT.DEPT SET UNUSED ONLINE",
    ]

    def test_non_column_ddl_is_noop(self):
        for ddl in self.DDLS:
            reg = SchemaRegistry()
            reg.register(_dept())
            td = reg.apply_ddl("SCOTT", "DEPT", ddl)
            assert td.version == 1, ddl
            assert [f.name for f in td.schema.fields] == ["DEPTNO", "DNAME", "LOC"], ddl

    def test_mixed_add_keeps_column_specs(self):
        reg = SchemaRegistry()
        reg.register(_dept())
        td = reg.apply_ddl(
            "SCOTT", "DEPT",
            "ALTER TABLE SCOTT.DEPT ADD (BUDGET NUMBER(10,2), "
            "CONSTRAINT dept_uq UNIQUE (DNAME))",
        )
        assert td.version == 2
        names = [f.name for f in td.schema.fields]
        assert "BUDGET" in names and "CONSTRAINT" not in names


def test_tstz_maps_to_instant_type():
    from pyspark.sql.types import TimestampNTZType, TimestampType

    from oracdc_spark.registry import oracle_type_to_spark

    assert oracle_type_to_spark("TIMESTAMP(6) WITH TIME ZONE") == TimestampType()
    assert oracle_type_to_spark("TIMESTAMP(9) WITH LOCAL TIME ZONE") == TimestampType()
    assert oracle_type_to_spark("TIMESTAMP(6)") == TimestampNTZType()


class TestPreProcessorFixtures:
    """The reference pre-processor's own edge cases
    (OraCdcAlterTablePreProcessorTest.java): spaces around the table-name
    dot, optional COLUMN keyword, multi-spec MODIFY."""

    def _reg(self):
        reg = SchemaRegistry()
        reg.register(_dept())
        return reg

    def test_spaces_around_dot(self):
        reg = self._reg()
        td = reg.apply_ddl(
            "SCOTT", "DEPT",
            "alter table scott . dept rename column DNAME to COMMENTARY",
        )
        assert td.version == 2
        assert "COMMENTARY" in [f.name for f in td.schema.fields]

    def test_add_column_keyword(self):
        reg = self._reg()
        td = reg.apply_ddl(
            "SCOTT", "DEPT",
            "alter table SCOTT . DEPT add column AMOUNT number(5,2) default 0",
        )
        assert td.version == 2
        assert td.schema["AMOUNT"].dataType == DecimalType(5, 2)

    def test_modify_column_keyword(self):
        reg = self._reg()
        td = reg.apply_ddl(
            "SCOTT", "DEPT",
            "alter table SCOTT.DEPT modify column DNAME varchar2(1000)",
        )
        assert td.version == 2

    def test_modify_multi_spec(self):
        reg = self._reg()
        reg.apply_ddl("SCOTT", "DEPT", "ALTER TABLE SCOTT.DEPT ADD (REF_NO NUMBER(9))")
        td = reg.apply_ddl(
            "SCOTT", "DEPT",
            "ALTER TABLE SCOTT . DEPT MODIFY (REF_NO number(12) default 0, "
            "DNAME varchar2(500) NOT NULL)",
        )
        assert td.version == 3
        from pyspark.sql.types import LongType as _Long
        assert td.schema["REF_NO"].dataType == _Long()
        assert not td.schema["DNAME"].nullable

    def test_lowercase_add_multi(self):
        reg = self._reg()
        td = reg.apply_ddl(
            "SCOTT", "DEPT",
            "ALTER TABLE SCOTT . DEPT ADD (jcol JSON, AMOUNT number(5,2) default -1)",
        )
        assert td.version == 2
        names = [f.name for f in td.schema.fields]
        assert "jcol" in names and "AMOUNT" in names

    def test_drop_paren_multi(self):
        reg = self._reg()
        reg.apply_ddl("SCOTT", "DEPT", "ALTER TABLE SCOTT.DEPT ADD (BONUS NUMBER(5))")
        td = reg.apply_ddl(
            "SCOTT", "DEPT", "alter table SCOTT.DEPT drop (DNAME, BONUS)"
        )
        names = [f.name for f in td.schema.fields]
        assert "DNAME" not in names and "BONUS" not in names

    def test_set_unused_multi(self):
        reg = self._reg()
        reg.apply_ddl("SCOTT", "DEPT", "ALTER TABLE SCOTT.DEPT ADD (BONUS NUMBER(5))")
        td = reg.apply_ddl(
            "SCOTT", "DEPT", "alter table SCOTT .DEPT set unused (BONUS, DNAME)"
        )
        names = [f.name for f in td.schema.fields]
        assert "DNAME" not in names and "BONUS" not in names

    def test_quoted_identifiers_add_rename_drop(self):
        """Quoted exact-case identifiers survive ADD / RENAME / DROP
        (the pre-processor's \"quoted\" forms)."""
        reg = self._reg()
        td = reg.apply_ddl(
            "SCOTT", "DEPT",
            'ALTER TABLE "SCOTT"."DEPT" ADD ("Mixed Case" varchar2(30))',
        )
        assert td.version == 2
        assert "Mixed Case" in [f.name for f in td.schema.fields]
        td = reg.apply_ddl(
            "SCOTT", "DEPT",
            'alter table SCOTT.DEPT rename column "Mixed Case" to "Renamed Col"',
        )
        assert "Renamed Col" in [f.name for f in td.schema.fields]
        td = reg.apply_ddl(
            "SCOTT", "DEPT", 'alter table SCOTT.DEPT drop column "Renamed Col"'
        )
        assert "Renamed Col" not in [f.name for f in td.schema.fields]

    def test_quoted_modify(self):
        reg = self._reg()
        reg.apply_ddl(
            "SCOTT", "DEPT", 'ALTER TABLE SCOTT.DEPT ADD ("qCol" NUMBER(5))'
        )
        td = reg.apply_ddl(
            "SCOTT", "DEPT", 'ALTER TABLE SCOTT.DEPT MODIFY ("qCol" NUMBER(12))'
        )
        from pyspark.sql.types import LongType as _Long

        assert td.schema["qCol"].dataType == _Long()


class TestCompoundAlter:
    """Compound multi-clause ALTER statements: Oracle allows several
    column clauses in one statement; the reference pre-processor is
    single-verb (OraSqlUtils.java:143-226), so this is a documented
    superset. One statement = one version bump."""

    def _reg(self):
        reg = SchemaRegistry()
        reg.register(_dept())
        return reg

    def test_add_modify_drop_in_one_statement(self):
        reg = self._reg()
        td = reg.apply_ddl(
            "SCOTT", "DEPT",
            "ALTER TABLE SCOTT.DEPT ADD (A NUMBER(9), B VARCHAR2(10)) "
            "MODIFY (DNAME VARCHAR2(200) NOT NULL) DROP (LOC)",
        )
        names = [f.name for f in td.schema.fields]
        assert td.version == 2  # single bump for the whole statement
        assert "A" in names and "B" in names and "LOC" not in names
        assert td.schema["DNAME"].nullable is False

    def test_modify_nullability_only_keeps_type(self):
        from pyspark.sql.types import StringType as _Str

        reg = self._reg()
        td = reg.apply_ddl(
            "SCOTT", "DEPT", "ALTER TABLE SCOTT.DEPT MODIFY (DNAME NOT NULL)"
        )
        assert td.schema["DNAME"].dataType == _Str()
        assert td.schema["DNAME"].nullable is False

    def test_compound_with_rename_and_set_unused(self):
        reg = self._reg()
        td = reg.apply_ddl(
            "SCOTT", "DEPT",
            'ALTER TABLE SCOTT.DEPT ADD ("Z one" NUMBER(9), Z2 VARCHAR2(50)) '
            'SET UNUSED (Z2) RENAME COLUMN "Z one" TO Z1',
        )
        names = [f.name for f in td.schema.fields]
        assert "Z1" in names and "Z2" not in names and "Z one" not in names
        assert td.version == 2

    def test_default_string_literal_does_not_split(self):
        reg = self._reg()
        td = reg.apply_ddl(
            "SCOTT", "DEPT",
            "ALTER TABLE SCOTT.DEPT ADD NOTE VARCHAR2(40) DEFAULT 'drop me add'",
        )
        names = [f.name for f in td.schema.fields]
        assert "NOTE" in names and len(names) == 4  # DEPTNO DNAME LOC NOTE
        assert td.version == 2

    def test_clauses_apply_in_order(self):
        # DROP of a column ADDed earlier in the same statement
        reg = self._reg()
        td = reg.apply_ddl(
            "SCOTT", "DEPT",
            "ALTER TABLE SCOTT.DEPT ADD (T1 NUMBER(9), T2 NUMBER(9)) DROP (T2)",
        )
        names = [f.name for f in td.schema.fields]
        assert "T1" in names and "T2" not in names

    def test_key_drop_in_compound_rejected(self):
        import pytest as _pytest

        reg = self._reg()
        with _pytest.raises(ValueError):
            reg.apply_ddl(
                "SCOTT", "DEPT",
                "ALTER TABLE SCOTT.DEPT ADD (OK1 NUMBER(9)) DROP (DEPTNO)",
            )


class TestDefaultValues:
    """P11 — DDL DEFAULT literals are retained as typed dictionary
    defaults (OraCdcColumn.java:123-194, KafkaConnectSchema.java:181-279)
    and follow the column through RENAME / DROP."""

    def _reg(self):
        reg = SchemaRegistry()
        reg.register(_dept())
        return reg

    def test_add_with_default_retains_typed_value(self):
        reg = self._reg()
        td = reg.apply_ddl(
            "SCOTT", "DEPT",
            "ALTER TABLE SCOTT.DEPT ADD (BUDGET BINARY_DOUBLE DEFAULT 0, "
            "TAG VARCHAR2(10) DEFAULT 'x y', CNT NUMBER(9) DEFAULT 42 NOT NULL)",
        )
        assert td.defaults["BUDGET"] == 0.0
        assert td.defaults["TAG"] == "x y"
        assert td.defaults["CNT"] == 42

    def test_default_null_and_non_literal_skipped(self):
        reg = self._reg()
        td = reg.apply_ddl(
            "SCOTT", "DEPT",
            "ALTER TABLE SCOTT.DEPT ADD (A VARCHAR2(5) DEFAULT NULL, "
            "B TIMESTAMP DEFAULT SYSDATE)",
        )
        assert "A" not in td.defaults and "B" not in td.defaults

    def test_default_follows_rename_and_drop(self):
        reg = self._reg()
        reg.apply_ddl(
            "SCOTT", "DEPT", "ALTER TABLE SCOTT.DEPT ADD (Q NUMBER(9) DEFAULT 7)"
        )
        td = reg.apply_ddl(
            "SCOTT", "DEPT", "ALTER TABLE SCOTT.DEPT RENAME COLUMN Q TO QQ"
        )
        assert td.defaults == {"QQ": 7}
        td = reg.apply_ddl("SCOTT", "DEPT", "ALTER TABLE SCOTT.DEPT DROP (QQ)")
        assert td.defaults == {}

    def test_modify_replaces_default(self):
        reg = self._reg()
        reg.apply_ddl(
            "SCOTT", "DEPT", "ALTER TABLE SCOTT.DEPT ADD (Q NUMBER(9) DEFAULT 7)"
        )
        td = reg.apply_ddl(
            "SCOTT", "DEPT", "ALTER TABLE SCOTT.DEPT MODIFY (Q NUMBER(9) DEFAULT 9)"
        )
        assert td.defaults["Q"] == 9

    def test_apply_default_values_binding(self, spark):
        from oracdc_spark.transforms import apply_default_values

        df = spark.createDataFrame(
            [(1, None, None), (2, 5.5, "A")], "pk int, price double, st string"
        )
        out = apply_default_values(df, {"PRICE": 0.0, "ST": "N"})
        rows = {r.pk: (r.price, r.st) for r in out.collect()}
        assert rows[1] == (0.0, "N") and rows[2] == (5.5, "A")


class TestNumberMap:
    """a2.map.number.* per-column NUMBER overrides — fixtures from
    OraCdcNumberMapTest.java (exact > prefix > suffix, PDB-qualified
    table entry before unqualified)."""

    _PROPS = {
        "a2.map.number.SCOTT.DEPT.DEPTNO": "SHORT",
        "a2.map.number.SCOTT.EMP.EMPNO": "LONG",
        "a2.map.number.SCOTT.EMP.%NO": "INT",
        "a2.map.number.KAFKA19.SCOTT.EMP.%ID": "SHORT",
        "a2.map.number.KAFKA19.SCOTT.EMP.SAL%": "DECIMAL(38,2)",
        "a2.map.number.AP.AP_INVOICES_ALL.%ID": "INTEGER",
        "a2.map.number.EBS122.AP.AP_INVOICES_ALL.INVOICE_ID": "LONG",
    }

    def _nm(self):
        from oracdc_spark.registry import NumberMap

        return NumberMap(self._PROPS)

    def test_reference_fixtures(self):
        from pyspark.sql.types import IntegerType, LongType, ShortType

        nm = self._nm()
        # OraCdcNumberMapTest assertions
        assert nm.resolve("SCOTT", "DEPT", "DEPTNO") == ShortType()  # SMALLINT
        assert (
            nm.resolve("AP", "AP_INVOICES_ALL", "INVOICE_ID", pdb="EBS122")
            == LongType()  # BIGINT: pdb-qualified exact beats %ID
        )
        assert (
            nm.resolve("AP", "AP_INVOICES_ALL", "LEGAL_ENTITY_ID", pdb="EBS122")
            == IntegerType()  # falls through to the unqualified %ID
        )

    def test_precedence_exact_prefix_suffix(self):
        from pyspark.sql.types import DecimalType, IntegerType, LongType, ShortType

        nm = self._nm()
        assert nm.resolve("SCOTT", "EMP", "EMPNO") == LongType()  # exact
        assert nm.resolve("SCOTT", "EMP", "DEPTNO") == IntegerType()  # %NO
        assert nm.resolve("SCOTT", "EMP", "SALARY", pdb="KAFKA19") == DecimalType(38, 2)
        assert nm.resolve("SCOTT", "EMP", "MGRID", pdb="KAFKA19") == ShortType()
        assert nm.resolve("SCOTT", "EMP", "ENAME") is None

    def test_connector_applies_override_to_number_only(self):
        from pyspark.sql.types import LongType, ShortType, StringType

        from oracdc_spark.connector import OraCdcConnector

        c = OraCdcConnector(dict(self._PROPS))
        assert c.column_type_for("SCOTT", "DEPT", "DEPTNO", "NUMBER(22)") == ShortType()
        # non-NUMBER column ignores the map
        assert c.column_type_for("SCOTT", "DEPT", "DEPTNO", "VARCHAR2(9)") == StringType()
        # unmapped NUMBER follows the tiering
        assert c.column_type_for("SCOTT", "DEPT", "OTHER", "NUMBER(10)") == LongType()


def test_trailing_null_marker_stripped_from_type():
    """OraCdcColumnFromTextTest: 'date null default SYSDATE' — the bare
    nullability marker is not part of the type text."""
    from pyspark.sql.types import StringType, TimestampNTZType

    from oracdc_spark.registry import oracle_type_to_spark

    assert oracle_type_to_spark("date null") == TimestampNTZType()
    assert oracle_type_to_spark("varchar2(100) null") == StringType()


def test_parse_col_spec_null_default_forms():
    """'varchar2(100) null default 'SALES'' parses name/type/nullable/
    default exactly like OraCdcColumnFromTextTest pins."""
    from pyspark.sql.types import StringType, TimestampNTZType

    from oracdc_spark.registry import _parse_col_spec, typed_default

    name, dtype, nullable, raw = _parse_col_spec(
        "DNAME varchar2(100) null default 'SALES'"
    )
    assert (name, dtype, nullable) == ("DNAME", StringType(), True)
    assert typed_default(dtype, raw) == "SALES"

    name, dtype, nullable, raw = _parse_col_spec(
        "DLOC varchar2(10) not null default 'NY'"
    )
    assert (name, dtype, nullable) == ("DLOC", StringType(), False)
    assert typed_default(dtype, raw) == "NY"

    name, dtype, nullable, raw = _parse_col_spec(
        "DEPT_FOUNDED date not null default SYSDATE"
    )
    assert (name, dtype, nullable) == ("DEPT_FOUNDED", TimestampNTZType(), False)
    assert typed_default(dtype, raw) is None


class TestCompoundAlterProperty:
    """Property: applying one compound statement equals applying its
    clauses as separate statements (except the version, which bumps once
    per statement)."""

    def test_random_compound_equivalence(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        types = ["NUMBER(9)", "VARCHAR2(40)", "BINARY_DOUBLE", "DATE"]

        @settings(max_examples=60, deadline=None)
        @given(
            st.lists(
                st.tuples(
                    st.sampled_from(["add", "modify", "rename", "drop", "unused"]),
                    st.integers(0, 5),
                    st.sampled_from(types),
                ),
                min_size=1,
                max_size=6,
            )
        )
        def check(ops):
            def fresh():
                reg = SchemaRegistry()
                reg.register(_dept())
                return reg

            clauses = []
            for verb, i, typ in ops:
                col = f"X{i}"
                if verb == "add":
                    clauses.append(f"ADD ({col} {typ})")
                elif verb == "modify":
                    clauses.append(f"MODIFY ({col} {typ})")
                elif verb == "rename":
                    clauses.append(f"RENAME COLUMN {col} TO {col}R")
                elif verb == "drop":
                    clauses.append(f"DROP COLUMN {col}")
                else:
                    clauses.append(f"SET UNUSED ({col})")

            # A clause may legitimately error (e.g. ORA-00957 when a
            # rename's target exists — hypothesis found [add X0,
            # rename X0->X0R, add X0, rename X0->X0R]).  The theorem
            # then is: both paths raise the SAME first error; the
            # compound statement is ATOMIC (schema untouched); and the
            # no-error case folds identically.
            compound = fresh()
            comp_err = None
            try:
                compound.apply_ddl(
                    "SCOTT", "DEPT", "ALTER TABLE SCOTT.DEPT " + " ".join(clauses)
                )
            except ValueError as e:
                comp_err = str(e)
            sequential = fresh()
            seq_err = None
            for cl in clauses:
                try:
                    sequential.apply_ddl(
                        "SCOTT", "DEPT", "ALTER TABLE SCOTT.DEPT " + cl
                    )
                except ValueError as e:
                    seq_err = str(e)
                    break

            def shape(reg):
                td = reg.get("SCOTT", "DEPT")
                return (
                    [(f.name, f.dataType, f.nullable) for f in td.schema.fields],
                    td.defaults,
                )

            assert (comp_err is None) == (seq_err is None)
            if comp_err is None:
                assert shape(compound) == shape(sequential)
            else:
                # identical prefix state => identical first failure
                assert comp_err == seq_err
                # compound atomicity: the failed statement changed nothing
                assert shape(compound) == shape(fresh())

        check()
