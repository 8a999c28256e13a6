"""SMT library tests (kafka/transforms/*Test.java patterns)."""

import pytest

from oracdc_spark.functions.decoders import encode_number
from oracdc_spark.transforms import (
    default_topic_mapper,
    flexible_topic_mapper,
    key_to_value,
    ora_number_convert,
    sanitize_avro_names,
    single_topic_mapper,
    to_lowercase_names,
)


def test_ora_number_convert_targets(spark):
    rows = [(encode_number("42"),), (encode_number("-7.5"),), (None,)]
    df = spark.createDataFrame(rows, "num binary")
    out = df.select(
        ora_number_convert("num", "double").alias("d"),
        ora_number_convert("num", "long").alias("l"),
        ora_number_convert("num", "decimal", scale=2).alias("dec"),
    ).collect()
    assert out[0].d == 42.0 and out[0].l == 42
    assert float(out[1].dec) == -7.5
    assert out[2].d is None


def test_ora_number_convert_unknown_target():
    with pytest.raises(ValueError, match="unknown NUMBER target"):
        ora_number_convert("x", "complex")


def test_to_lowercase_names(spark):
    df = spark.createDataFrame([(1, "a")], "DEPTNO long, DNAME string")
    assert to_lowercase_names(df).columns == ["deptno", "dname"]


def test_key_to_value_prefix(spark):
    df = spark.createDataFrame([(1, "x")], "pk long, v string")
    out = key_to_value(df, ["pk"], prefix="key_")
    assert "key_pk" in out.columns
    assert out.collect()[0].key_pk == 1


def test_sanitize_avro_names(spark):
    df = spark.createDataFrame([(1, 2, 3)], ["COL#1", "2COL", "OK_NAME"])
    assert sanitize_avro_names(df).columns == ["COL_1", "_2COL", "OK_NAME"]


class TestTopicMappers:
    def test_default(self):
        f = default_topic_mapper()
        assert f(None, "SCOTT", "DEPT") == "SCOTT_DEPT"
        assert f("PDB1", "SCOTT", "DEPT") == "PDB1_SCOTT_DEPT"
        assert default_topic_mapper("cdc")(None, "S", "T") == "cdc_S_T"

    def test_single(self):
        assert single_topic_mapper("all-changes")("P", "S", "T") == "all-changes"

    def test_flexible(self):
        f = flexible_topic_mapper("%OWNER%.%TABLE%.v1")
        assert f(None, "SCOTT", "DEPT") == "SCOTT.DEPT.v1"


def test_pseudo_columns(spark):
    from oracdc_spark.feed import change_feed
    from oracdc_spark.operators.cdc import commit_ordered
    from oracdc_spark.transforms import add_pseudo_columns

    stamped = commit_ordered(change_feed(spark, "/root/testdata/sf0.001"))
    out = add_pseudo_columns(stamped)
    row = out.filter("op = 1").first()
    assert row.ORA_ROW_SCN == row.scn
    assert row.ORA_COMMIT_SCN == row.commit_scn
    assert row.ORA_OP == "c"


def test_header_to_field_with_value_map(spark):
    """HeaderToFieldConverterTest: header=op, field=_oracdcp,
    map=c:I,u:U,d:D."""
    from oracdc_spark.transforms import header_to_field

    df = spark.createDataFrame(
        [(1, "20250308/001", "c"), (2, "20250308/002", "u"),
         (3, "20250308/003", "d"), (4, "20250308/004", "x")],
        "INVOICE_ID long, INVOICE_NUMBER string, op string",
    )
    out = header_to_field(df, "op", "_oracdcp", {"c": "I", "u": "U", "d": "D"})
    got = {r.INVOICE_ID: r._oracdcp for r in out.collect()}
    assert got == {1: "I", 2: "U", 3: "D", 4: "x"}
