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


def _assign(q: DataFrame, cents: DataFrame, k: int = 8) -> DataFrame:
    """Assignment step: exact integer squared distance to every
    centroid, argmin with (dist2, cluster) tie-break.

    Vectorized (r6, same shape as pq._assign): centroids pivot into
    broadcast per-i arrays of k components, each component row computes
    its k cross-products in one JVM `transform`, and groupBy(vec_id)
    aggregates k elementwise sums — one shuffle of n·d rows instead of
    exploding ×k and windowing over n·k rows.  dist²_c = Σq² − 2·Σq·cq_c
    + Σcq_c² (exact bigints, empty clusters → +∞ sentinel);
    `array_position` of the min keeps the lowest-cluster-id tie-break."""
    sent = F.lit((1 << 62) - 1)
    cb_arr = (
        cents.groupBy("i")
        .agg(
            *[
                F.max(F.when(F.col("cluster") == c, F.col("cq"))).alias(f"c{c}")
                for c in range(k)
            ]
        )
        .select("i", F.array(*[F.col(f"c{c}") for c in range(k)]).alias("cqs"))
    )
    cc2_arr = (
        cents.groupBy("cluster")
        .agg(F.sum(F.col("cq") * F.col("cq")).alias("cc2"))
        .groupBy()
        .agg(
            *[
                F.max(F.when(F.col("cluster") == c, F.col("cc2"))).alias(f"n{c}")
                for c in range(k)
            ]
        )
        .select(F.array(*[F.col(f"n{c}") for c in range(k)]).alias("cc2s"))
    )
    prods = q.join(F.broadcast(cb_arr), "i").select(
        "vec_id",
        (F.col("q") * F.col("q")).alias("q2"),
        F.transform("cqs", lambda cq: cq * F.col("q")).alias("px"),
    )
    dots = prods.groupBy("vec_id").agg(
        F.sum("q2").alias("qs2"),
        *[F.sum(F.col("px")[c]).alias(f"d{c}") for c in range(k)],
    )
    dists = F.array(
        *[
            F.coalesce(F.col("qs2") - 2 * F.col(f"d{c}") + F.col("cc2s")[c], sent)
            for c in range(k)
        ]
    )
    return dots.crossJoin(F.broadcast(cc2_arr)).select(
        "vec_id",
        (F.array_position(dists, F.array_min(dists)) - 1)
        .cast("bigint")
        .alias("cluster"),
        F.array_min(dists).alias("dist2"),
    )


def kmeans_assignments(vecs: DataFrame, k: int = 8, iters: int = 2) -> DataFrame:
    """`iters` Lloyd iterations from the ``vec_id % k`` seed.

    Returns (vec_id, cluster, dist2) — the final assignment and the
    exact integer squared distance to the winning centroid."""
    # r12 (guide §2.4): the component table feeds every refit AND every
    # assignment (4 references at iters=2) and the per-iteration
    # centroid relation feeds both broadcast pivots — the pure-lineage
    # plan re-scanned/re-exploded the corpus 13× (80 Exchanges at
    # sf0.1).  Materializing the components once and the (k·d)-row
    # centroid table per iteration collapses that to one explode; A/B
    # at sf0.1 (min of 3 warm probes) 3.6 → 2.1 s.  Production shape
    # per the module docstring: persist the quantized components
    # between iterations.
    q = quantized(vecs).localCheckpoint(eager=False)
    assign = vecs.select(
        "vec_id", (F.col("vec_id") % k).cast("bigint").alias("cluster")
    )
    for _ in range(iters):
        cents = _centroids(q, assign).localCheckpoint(eager=False)
        assign = _assign(q, cents, k)
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
