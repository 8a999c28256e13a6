"""Literal (driver-built) DataFrames as LocalRelations.

``spark.createDataFrame(list_of_tuples, schema)`` takes the Python-RDD
path (``applySchemaToPythonRDD``): the literal becomes a ``Scan
ExistingRDD`` whose every materialization — in particular the
BroadcastExchange build that literal tables exist for — launches a
Python-worker stage.  Measured at bench scale: ~0.7-1.1 s per broadcast
build, plus a multi-second first-use penalty while the stage's workers
spin up (guide §4: every JVM↔Python crossing you can delete is free
speed, and a *literal* table has no reason to cross at all).

Routing the same rows through a pandas DataFrame instead hits the
Arrow ``createDataFrame`` path, which for driver-sized data produces a
**LocalRelation** — a pure plan literal.  Broadcasting a LocalRelation
is a driver-local hash-relation build: the same join measured ~0.3-0.5 s
and runs zero Python stages.

Values are preserved exactly: the literal tables this engine builds are
int64 scalars and arrays of (nullable) int64 — lossless through both
pandas object columns and Arrow.  The explicit schema string remains
mandatory so None-only columns and empty tables keep their types.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def local_df(spark: SparkSession, rows, schema: str) -> DataFrame:
    """Build a literal DataFrame as a LocalRelation (no Python-RDD scan).

    ``rows``: list of tuples, one per row, matching ``schema`` (a DDL
    string).  Falls back to the tuple path if pandas is unavailable —
    results are identical either way; only the physical scan differs.
    """
    try:
        import pandas as pd
    except ImportError:  # pragma: no cover - pandas ships with the env
        return spark.createDataFrame(rows, schema)
    cols = [f.split()[0] for f in schema.split(",")]
    # columns=... keeps the empty-rows case a typed empty frame
    pdf = pd.DataFrame(list(rows), columns=[c.strip() for c in cols])
    return spark.createDataFrame(pdf, schema)
