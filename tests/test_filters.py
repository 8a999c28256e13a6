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
