"""Table catalog: loads the driver testdata parquet tables.

Mirrors the reference's dictionary bootstrap (OraCdcTableBase.java:183 —
schema discovered once per table and cached); here the "dictionary" is the
parquet footer, cached as temp views per SparkSession.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from oracdc_spark import TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# parquet footers read ONCE per path, on the driver, via pyarrow — Spark's
# own schema inference launches a 1-task job per spark.read.parquet call,
# which turns every query construction into an eager action.  With the
# explicit schema the read is plan-only (0 jobs until an action runs); at
# cluster scale this also skips a per-query footer fetch from the object
# store.  Keyed by absolute path; values are (spark_schema, ts_unit).
_SCHEMA_CACHE: dict[str, tuple] = {}


def _footer_schema(path: str):
    if path not in _SCHEMA_CACHE:
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema

        arrow = pq.read_schema(path)
        ts_unit = None
        if "ts" in arrow.names:
            t = arrow.field("ts").type
            ts_unit = getattr(t, "unit", None)
        if ts_unit == "ns":
            # TIMESTAMP(NANOS): no Spark timestamp type holds it — read
            # nanos-as-long and rebuild at micros (legacy conf path)
            import pyspark.sql.types as T

            fields = [
                T.StructField("ts", T.LongType(), f.nullable)
                if f.name == "ts"
                else from_arrow_schema(pq.schema([f]).remove_metadata()).fields[0]
                for f in [arrow.field(i) for i in range(len(arrow.names))]
            ]
            spark_schema = T.StructType(fields)
        else:
            # MICROS without a timezone would infer as TIMESTAMP_NTZ and
            # break unix_micros/window arithmetic downstream; reading it
            # as plain TIMESTAMP is value-preserving under the UTC-pinned
            # session zone (from_arrow_schema maps tz-less to TIMESTAMP)
            spark_schema = from_arrow_schema(arrow)
        _SCHEMA_CACHE[path] = (spark_schema, ts_unit)
    return _SCHEMA_CACHE[path]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table. Column pruning / predicate pushdown are
    Catalyst's job — callers select/filter declaratively.

    The schema comes from a driver-local pyarrow footer read (cached):
    constructing a query plan launches no Spark jobs, mirroring the
    reference's once-per-table dictionary bootstrap."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    # rendered timestamps (date_format/date_trunc) must not depend on the
    # caller's session timezone — Oracle DATE semantics are zone-less
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        schema, ts_unit = _footer_schema(path)
    except Exception:
        # multi-file layouts / exotic encodings: fall back to inference
        return spark.read.parquet(path)
    if name == "events" and ts_unit == "ns":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.schema(schema).parquet(path)
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return spark.read.schema(schema).parquet(path)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (idempotent)."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
