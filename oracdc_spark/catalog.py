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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table. Column pruning / predicate pushdown are
    Catalyst's job — callers select/filter declaratively.

    events.parquet has stored its `ts` column as TIMESTAMP(NANOS)
    (read nanos-as-long, rebuild at micros) and as TIMESTAMP(MICROS)
    without a timezone (Spark reads TIMESTAMP_NTZ, which breaks
    unix_micros/window arithmetic downstream). Normalize both encodings
    to a plain TIMESTAMP — the session zone is pinned UTC below, so the
    NTZ→TIMESTAMP cast is value-preserving."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    # rendered timestamps (date_format/date_trunc) must not depend on the
    # caller's session timezone — Oracle DATE semantics are zone-less
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (idempotent)."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
