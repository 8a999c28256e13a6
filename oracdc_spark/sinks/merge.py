"""Parquet-backed MERGE sink — the Spark-native materialization path
(K2/K3 applied, used by the streaming pipeline's foreachBatch).

Semantics of ``MERGE INTO target USING batch ON pk
WHEN MATCHED AND op='d' THEN DELETE
WHEN MATCHED THEN UPDATE SET *
WHEN NOT MATCHED AND op<>'d' THEN INSERT *``
expressed as a read-union-dedup-overwrite cycle (this container has no
Delta Lake; on a real deployment this function body is one
``DeltaTable.merge`` call and the surrounding logic is identical).

Idempotence: the batch is PK-deduped (K6) and carries
(commit_scn, scn, ssn) version columns; replayed batches converge because
last-write-wins comparison includes the version — the reference's
replay-safety contract (F5 + K6).
"""

from __future__ import annotations

import os
from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from oracdc_spark.feed import OP_DELETE
from oracdc_spark.operators.cdc import batch_pk_dedup

VERSION_COLS = ("commit_scn", "scn", "ssn")


def merge_batch(
    spark: SparkSession,
    batch: DataFrame,
    target_path: str,
    pk_cols: Sequence[str] = ("owner", "table_name", "pk"),
    value_cols: Sequence[str] = ("totalprice", "status"),
) -> None:
    """Apply one commit-stamped change batch to the parquet replica."""
    deduped = batch_pk_dedup(batch, pk_cols)
    cols = [*pk_cols, *value_cols, *VERSION_COLS, "op"]
    incoming = deduped.select(*cols)

    if os.path.exists(target_path):
        current = spark.read.parquet(target_path)
        merged = current.unionByName(incoming, allowMissingColumns=False)
    else:
        merged = incoming

    w = Window.partitionBy(*[F.col(c) for c in pk_cols]).orderBy(
        *[F.col(c).desc() for c in VERSION_COLS]
    )
    latest = (
        merged.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
        .filter(F.col("op") != OP_DELETE)
    )
    # write-then-swap so the read above never races the overwrite
    tmp = target_path + ".staging"
    latest.write.mode("overwrite").parquet(tmp)
    final = spark.read.parquet(tmp)
    final.write.mode("overwrite").parquet(target_path + ".next")
    _swap(target_path)


def _swap(target_path: str) -> None:
    import shutil

    nxt = target_path + ".next"
    stg = target_path + ".staging"
    if os.path.exists(target_path):
        shutil.rmtree(target_path)
    os.rename(nxt, target_path)
    if os.path.exists(stg):
        shutil.rmtree(stg)


def replica_state(spark: SparkSession, target_path: str) -> DataFrame:
    return spark.read.parquet(target_path)


def merge_wrapped_batch(
    spark: SparkSession,
    batch: DataFrame,
    target_path: str,
    pk_cols: Sequence[str] = ("owner", "table_name", "pk"),
    wrapped_cols: Sequence[str] = ("totalprice", "status"),
) -> None:
    """K5 applied — partial-update MERGE for wrapped tri-state batches.

    The batch carries `<col>_present` + `<col>_v` pairs (envelope.
    wrapped_tristate flattened): a column updates ONLY when present;
    absent columns keep the replica's current value (WrappedDataTable.
    java:72-90 semantics, one statement per present-column set — here a
    single MERGE with per-column presence CASEs, which scales better
    than a statement cache).
    """
    deduped = batch_pk_dedup(batch, pk_cols)
    cols = [*pk_cols, *VERSION_COLS, "op"]
    pres = [c for col in wrapped_cols for c in (f"{col}_present", f"{col}_v")]
    incoming = deduped.select(*cols, *pres)

    if os.path.exists(target_path):
        current = spark.read.parquet(target_path)
        # current rows re-enter as "all columns present" at their stored version
        cur_as_batch = current.select(
            *pk_cols,
            *VERSION_COLS,
            F.lit(0).alias("op"),
            *[
                c
                for col in wrapped_cols
                for c in (F.lit(True).alias(f"{col}_present"), F.col(col).alias(f"{col}_v"))
            ],
        )
        merged = cur_as_batch.unionByName(incoming)
    else:
        merged = incoming

    w = Window.partitionBy(*[F.col(c) for c in pk_cols]).orderBy(
        *[F.col(c).desc() for c in VERSION_COLS]
    )
    # per-column resolution: newest PRESENT value wins (not newest row)
    resolved = merged.withColumn("rn", F.row_number().over(w))
    latest_meta = resolved.filter(F.col("rn") == 1).select(
        *pk_cols, *VERSION_COLS, "op"
    )
    value_cols = []
    for col in wrapped_cols:
        wv = Window.partitionBy(*[F.col(c) for c in pk_cols]).orderBy(
            *[F.col(c).desc() for c in VERSION_COLS]
        )
        firsts = (
            resolved.filter(F.col(f"{col}_present"))
            .withColumn("vrn", F.row_number().over(wv))
            .filter(F.col("vrn") == 1)
            .select(*pk_cols, F.col(f"{col}_v").alias(col))
        )
        value_cols.append(firsts)
    out = latest_meta
    for vc in value_cols:
        out = out.join(vc, list(pk_cols), "left")
    latest = out.filter(F.col("op") != OP_DELETE).drop("op")

    tmp = target_path + ".staging"
    latest.write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).write.mode("overwrite").parquet(target_path + ".next")
    _swap(target_path)
