"""Embedding clustering: fixed-iteration Lloyd k-means over the
quantized integer components.

Role in the engine: the IVF index (`operators/similarity.py`) takes its
coarse cells from a precomputed ``label`` column; a real deployment
trains those cells itself.  This module is that trainer — a bounded
number of Lloyd iterations expressed as pure DataFrame joins and
aggregations, so the whole loop stays JVM-side and oracle-checkable.

Determinism design (see similarity.py): components are quantized to
bigints (round(x*1000)); a centroid component is
``floor(sum(q)/count)`` — the sum and count are exact integers and the
one double division of two exact integers is IEEE-identical in Spark
and DuckDB; distances are exact integer sums of squared differences;
argmin ties break on the lower cluster id.  Seeding is ``vec_id % k``
(deterministic, no RNG).

Scale shape (100 TB): per iteration the corpus is touched exactly
twice — one groupBy(cluster, i) to refit centroids (k*d result rows,
tiny) and one broadcast-join of those k*d centroid components against
the unnested corpus followed by a groupBy(vec_id, cluster) partial
aggregation.  Nothing quadratic in the corpus; the only shuffles are
keyed on (cluster, i) and (vec_id) — both well distributed.  A
production run would persist the quantized components between
iterations (the lineage otherwise re-reads the corpus per iteration);
with a fixed small iteration count the re-read is the documented
trade-off for a checkpoint-free plan.

Reference parity: the reference ships no clustering operator — this is
part of the LLM-data-pipeline surface the task brief adds on top of the
oracdc operator set (SURVEY.md "beyond the reference").
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from oracdc_spark.operators.similarity import quantized


def _centroids(q: DataFrame, assign: DataFrame) -> DataFrame:
    """Refit step: mean (floor-quantized) of member components per
    (cluster, i).  Result is k*d rows — always broadcastable."""
    return (
        q.join(assign.select("vec_id", "cluster"), "vec_id")
        .groupBy("cluster", "i")
        .agg(
            F.floor(
                F.sum("q").cast("double") / F.count(F.lit(1))
            ).cast("bigint").alias("cq")
        )
    )


def _assign(q: DataFrame, cents: DataFrame) -> DataFrame:
    """Assignment step: exact integer squared distance to every
    centroid, argmin with (dist2, cluster) tie-break."""
    diff = F.col("q") - F.col("cq")
    d = (
        q.join(F.broadcast(cents), "i")
        .groupBy("vec_id", "cluster")
        .agg(F.sum(diff * diff).alias("dist2"))
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("dist2").asc(), F.col("cluster").asc()
    )
    return (
        d.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("vec_id", "cluster", "dist2")
    )


def kmeans_assignments(vecs: DataFrame, k: int = 8, iters: int = 2) -> DataFrame:
    """`iters` Lloyd iterations from the ``vec_id % k`` seed.

    Returns (vec_id, cluster, dist2) — the final assignment and the
    exact integer squared distance to the winning centroid."""
    q = quantized(vecs)
    assign = vecs.select(
        "vec_id", (F.col("vec_id") % k).cast("bigint").alias("cluster")
    )
    for _ in range(iters):
        assign = _assign(q, _centroids(q, assign))
    return assign


def kmeans_profile(vecs: DataFrame, k: int = 8, iters: int = 2) -> DataFrame:
    """Cluster-level summary of the final assignment: member count and
    within-cluster sum of squared (quantized) distances — the k-row
    output a training pipeline logs per refresh."""
    return (
        kmeans_assignments(vecs, k=k, iters=iters)
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("dist2").alias("wss"),
        )
    )
