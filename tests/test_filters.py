"""F1 include/exclude list parsing (fixtures from
OraCdcParseTableSchemaListTest.java:44-59, see FIXTURES.md §4.2)."""

from oracdc_spark.operators.filters import parse_table_list, table_list_sql


def test_single_exact_entry():
    assert parse_table_list("BEWWFR. EXAMPLE_TEST_ORA_CDC,") == [
        ("BEWWFR", "EXAMPLE_TEST_ORA_CDC")
    ]
    assert (
        table_list_sql("BEWWFR. EXAMPLE_TEST_ORA_CDC,")
        == "(owner = 'BEWWFR' AND table_name = 'EXAMPLE_TEST_ORA_CDC')"
    )


def test_schema_wildcard_and_prefix():
    assert parse_table_list("AP.% , SCOTT.TEST_IOT%") == [
        ("AP", "%"),
        ("SCOTT", "TEST_IOT%"),
    ]
    sql = table_list_sql("AP.% , SCOTT.TEST_IOT%")
    assert sql == "owner = 'AP' OR (owner = 'SCOTT' AND table_name LIKE 'TEST_IOT%')"


def test_star_wildcard_normalized():
    assert parse_table_list("SCOTT.DEPT*") == [("SCOTT", "DEPT%")]


def test_lowercase_upcased():
    assert parse_table_list("scott.emp") == [("SCOTT", "EMP")]


class TestCompleteness:
    """F7 reject/tolerate (KafkaStructDataBinder.java:258-287)."""

    def test_partial_updates_rejected(self, spark):
        from oracdc_spark.feed import change_feed
        from oracdc_spark.operators.filters import completeness_check

        feed = change_feed(spark, "/root/testdata/sf0.001")
        good, rejects = completeness_check(feed)
        r = rejects.select("op", "changed_cols").distinct().collect()
        assert r and all(x.op == 3 and x.changed_cols == "TOTALPRICE" for x in r)
        # deletes are exempt even though they carry no value columns
        assert good.filter("op = 2").count() == feed.filter("op = 2").count()
        # split is a partition: nothing lost
        assert good.count() + rejects.count() == feed.count()

    def test_strict_mode_raises(self, spark):
        from oracdc_spark.feed import change_feed
        from oracdc_spark.operators.filters import (
            IncompleteRowError,
            assert_complete,
            completeness_check,
        )

        import pytest as _pytest

        feed = change_feed(spark, "/root/testdata/sf0.001")
        _, rejects = completeness_check(feed, tolerate=False)
        with _pytest.raises(IncompleteRowError):
            assert_complete(rejects)

    def test_complete_feed_passes_strict(self, spark):
        from oracdc_spark.feed import change_feed
        from oracdc_spark.operators.filters import assert_complete, completeness_check

        feed = change_feed(spark, "/root/testdata/sf0.001").filter(
            "op <> 3"  # inserts/deletes/control only — all complete
        )
        _, rejects = completeness_check(feed)
        assert_complete(rejects)  # no raise


def test_plain_table_name_matches_any_schema():
    """A dot-less entry is a table name in ANY schema, verbatim case —
    the reference's third branch (OraSqlUtils.java:124-130 emits
    OBJECT_NAME='<entry>' with no owner predicate and no upper-casing).
    Fixed r9: previously mis-parsed as a whole-schema include."""
    assert parse_table_list("EMP") == [(None, "EMP")]
    assert table_list_sql("EMP") == "table_name = 'EMP'"
    # faithful to the reference: no upper-casing on this branch
    assert parse_table_list("emp") == [(None, "emp")]
    # mixes with dotted entries
    assert table_list_sql("SCOTT.DEPT, EMP") == (
        "(owner = 'SCOTT' AND table_name = 'DEPT') OR table_name = 'EMP'"
    )
