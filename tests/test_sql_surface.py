"""The SQL surface: decoders registered as SQL functions
(spark.udf.register — SURVEY §4: no Catalyst extension needed)."""

from oracdc_spark.functions import register_all


def test_decoders_callable_from_sql(spark):
    from oracdc_spark.session import ship_package

    ship_package(spark)
    register_all(spark)
    row = spark.sql(
        """
        SELECT ora_number_to_double('3f534966')  AS num,
               ora_binary_double('bffbb67ae8584caa') AS bd,
               ora_interval_ym(unhex('8000000341'))  AS ym
        """
    ).first()
    assert row.num == -0.1828
    assert abs(row.bd - 3 ** 0.5) < 1e-15
    assert row.ym == "+3-5"
