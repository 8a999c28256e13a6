"""Stage breakdown for similarity_pq_topk (r8 verdict item 7).

similarity_pq_topk has been the bench suite max for three rounds
(6.0→7.0 s at sf0.1).  This profiles its plan stage by stage in a fresh
JVM so the dominant cost gets a name: training (bounded sample collect +
driver k-means), the distributed encode pass, the per-query LUT build,
the ADC join + (query, neighbor) aggregate, and the final top-k window.

Each stage is forced with .count() after an untimed JIT warm pass of
the full query; stages are cumulative plans, so stage N's time includes
recomputing N-1 unless the session code cache (which the bench also
uses) carries it — the deltas printed at the end subtract accordingly.

Usage: python tools/profile_pq.py   (sf from $SPARK_GRAFT_SF_DIR)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402


def main() -> int:
    from pyspark.sql import Window

    from oracdc_spark.catalog import load_table
    from oracdc_spark.operators import pq as pqm
    from oracdc_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("pq-profile")
    spark.sparkContext.setLogLevel("ERROR")
    vecs = load_table(spark, sf_dir, "embeddings")

    t: dict[str, float] = {}

    def clock(name, fn):
        t0 = time.time()
        out = fn()
        t[name] = round(time.time() - t0, 3)
        return out

    # warm pass: full query once, untimed for the verdict but recorded
    t0 = time.time()
    pqm.pq_topk(vecs).count()
    warm = round(time.time() - t0, 3)

    # a cold second full run (code cache now holds the trained codes)
    clock("full_cached", lambda: pqm.pq_topk(vecs).count())

    # stage 1: training + encode (cache hit — near-zero if cache works)
    codes, cb, comp_fn = pqm._train_encode(
        vecs, pqm.PQ_M, pqm.PQ_K, pqm.PQ_ITERS, mode="interleave"
    )
    clock("codes_count_cached", lambda: codes.count())

    # stage 1b: training + encode with the cache DROPPED (the true cost)
    pqm._TRAIN_CACHE.clear()
    t0 = time.time()
    codes2, cb2, _ = pqm._train_encode(
        vecs, pqm.PQ_M, pqm.PQ_K, pqm.PQ_ITERS, mode="interleave"
    )
    codes2.count()
    t["train_plus_encode_cold"] = round(time.time() - t0, 3)

    # stage 2: query components + LUT
    qq = comp_fn(vecs.filter(F.col("vec_id") % 100 == 0), pqm.PQ_M).withColumnRenamed(
        "vec_id", "query_id"
    )
    lut = (
        qq.join(F.broadcast(cb), ["sub", "i"])
        .groupBy("query_id", "sub", "cluster")
        .agg(F.sum(F.col("q") * F.col("cq")).alias("pdot"))
    )
    clock("lut", lambda: lut.count())

    # stage 3: ADC join + (query, neighbor) aggregate
    nn = cb.groupBy("sub", "cluster").agg(F.sum(F.col("cq") * F.col("cq")).alias("nn"))
    agg = (
        codes.withColumnRenamed("vec_id", "neighbor_id")
        .join(F.broadcast(lut), ["sub", "cluster"])
        .join(F.broadcast(nn), ["sub", "cluster"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("pdot").alias("dot"), F.sum("nn").alias("cn"))
    )
    clock("adc_aggregate", lambda: agg.count())

    # stage 4: full query again (top-k window on top of stage 3)
    clock("full_final", lambda: pqm.pq_topk(vecs).count())

    t["warm_first_full"] = warm
    t["topk_window_delta"] = round(t["full_final"] - t["adc_aggregate"], 3)
    print(json.dumps({"sf_dir": sf_dir, "stages_sec": t}, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
