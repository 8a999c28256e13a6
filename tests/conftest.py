import os

import pytest

os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "8")

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from oracdc_spark.session import get_spark

    s = get_spark("oracdc-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    yield con
    con.close()
