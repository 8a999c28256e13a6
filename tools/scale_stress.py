"""Supra-bench-scale stress probe: measured runtime growth vs data
growth for the heaviest operator families.

The catalog is parity-checked up to sf0.1 (the bench SF) and the 100 TB
arguments in SCALING.md are plan-shape arguments (bounded fan-out, no
wedge-sized shuffles, band-bucket joins).  This tool adds MEASUREMENT
above sf0.1: replicate the sf0.1 inputs K× (disjoint id spaces, so
graph copies/document variants don't collapse) and time the operator
core at K ∈ {1, 2, 4} — near-linear growth is the property the
100 TB extrapolation rests on; super-linear growth here would expose a
hidden all-pairs or skew blowup the plan lint cannot see.

Families probed (each via its composable core, inputs pre-materialized
to parquet so construction cost stays out of the timing):

* triangle_census — disjoint graph copies: triangles/wedges scale
  exactly K×, so should the census (Suri–Vassilvitskii bound is
  per-edge).
* minhash_lsh_candidates — documents with per-replica text suffixes
  (near-distinct corpus, the honest regime: banding fan-out grows with
  rows, not with duplicate density).
* brute_force_topk with |Q| held constant (query_mod scaled with K) —
  the serving scan is O(|Q|·|C|·d): corpus ×K at fixed queries must be
  ~K×.
* tfidf_cosine_pairs with df_max FIXED (r11 verdict item 4) — the
  operator's only superlinear stage is the per-term posting self-join,
  bounded by Σ_kept-terms df²; replication inflates every term's df
  ×K, so WITHOUT the cap the join would grow ~K².  With df_max held at
  its default the cap drops terms as their inflated df crosses it —
  measured wall staying ~K× (or below) IS the Bayardo lever doing its
  job at scale, which is exactly what SCALING.md's 100 TB argument for
  this family rests on.  (Replicas are near-identical text, the
  worst case for df inflation — honest for this probe's purpose.)
* pq_topk with |Q| held constant (query_mod scaled with K) — the
  unpruned ADC serving chain (train + encode + LUT scan) is
  corpus-linear at fixed |Q|, like brute force: corpus ×K must be ~K×.

Each (family, K) runs twice in one JVM; the SECOND timing is reported
(first-touch codegen/shuffle-service warm-up excluded, same JMH stance
as bench.py's isolated probe).  Results land in SCALING.md.

Usage: python tools/scale_stress.py [K ...]    (default 1 2 4)
       SPARK_GRAFT_STRESS_FAMILIES=tfidf_fixed_dfmax_sec,pq_topk_fixedQ_sec \
           python tools/scale_stress.py 1 4 16    (probe only those families)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OFFSET = 10_000_000


def main() -> int:
    import pyspark.sql.functions as F

    from oracdc_spark.catalog import load_table
    from oracdc_spark.feed import change_feed
    from oracdc_spark.operators.cdc import apply_changes
    from oracdc_spark.operators.dedup import (
        content_chunk_dedup_stats,
        minhash_lsh_candidates,
        tfidf_cosine_pairs,
    )
    from oracdc_spark.operators.pq import pq_topk
    from oracdc_spark.operators.graph import pagerank, triangle_census
    from oracdc_spark.operators.similarity import brute_force_topk
    from oracdc_spark.session import get_spark

    ks = [int(a) for a in sys.argv[1:]] or [1, 2, 4]
    spark = get_spark("scale-stress")
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="oracdc_stress_")

    def replicate(df, id_cols, k: int, text_col: str | None = None):
        """K disjoint copies: id columns offset per replica; text gets a
        per-replica suffix so documents stay near-distinct."""
        parts = []
        for i in range(k):
            p = df
            for c in id_cols:
                p = p.withColumn(c, F.col(c) + F.lit(i * OFFSET))
            if text_col and i:
                p = p.withColumn(
                    text_col, F.concat(F.col(text_col), F.lit(f" r{i}"))
                )
            parts.append(p)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def materialize(df, name: str):
        path = f"{tmp}/{name}"
        df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    # base inputs (built once)
    l = load_table(spark, SF_DIR, "lineitem")
    items = l.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    a, b = items.alias("a"), items.alias("b")
    base_edges = materialize(
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .select(F.col("a.p").alias("u"), F.col("b.p").alias("v"))
        .distinct(),
        "edges_base",
    )
    docs = load_table(spark, SF_DIR, "documents")
    vecs = load_table(spark, SF_DIR, "embeddings")
    base_feed = materialize(change_feed(spark, SF_DIR), "feed_base")

    def replicate_feed(k: int):
        """K disjoint CDC streams: scn/pk offset per replica keeps the
        per-replica commit order intact; xid gets a per-replica suffix
        so transactions never merge across replicas."""
        parts = []
        for i in range(k):
            parts.append(
                base_feed.withColumn("scn", F.col("scn") + F.lit(i * OFFSET))
                .withColumn("pk", F.col("pk") + F.lit(i * OFFSET))
                .withColumn(
                    "xid", F.concat(F.col("xid"), F.lit(f"_{i}"))
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def timed(fn):
        fn()  # warm (codegen + first-touch)
        t0 = time.time()
        fn()
        return round(time.time() - t0, 3)

    all_families = (
        "triangle_census_sec",
        "minhash_lsh_sec",
        "bruteforce_fixedQ_sec",
        "cdc_apply_sec",
        "tfidf_fixed_dfmax_sec",
        "pq_topk_fixedQ_sec",
        # r13 (r12 verdict item 6): the r12 localCheckpoint
        # materializations are O(edges)/O(chunks)-sized — these two
        # families measure that the post-checkpoint operators keep
        # wall growth ~K x instead of resting on sizing arguments.
        # (triangle_census_sec and tfidf_fixed_dfmax_sec already run
        # their post-checkpoint forms — the checkpoint lives inside
        # the operator core.)
        "pagerank_sec",
        "content_chunks_sec",
    )
    sel = os.environ.get("SPARK_GRAFT_STRESS_FAMILIES", "")
    families = [f.strip() for f in sel.split(",") if f.strip()] or list(all_families)
    unknown = [f for f in families if f not in all_families]
    if unknown:
        print(f"unknown families: {unknown} (known: {list(all_families)})",
              file=sys.stderr)
        return 2

    results: dict[str, dict] = {}
    for k in ks:
        # inputs materialized lazily — only for the selected families
        need_edges = {"triangle_census_sec", "pagerank_sec"} & set(families)
        need_docs = {
            "minhash_lsh_sec", "tfidf_fixed_dfmax_sec", "content_chunks_sec"
        } & set(families)
        need_vecs = {"bruteforce_fixedQ_sec", "pq_topk_fixedQ_sec"} & set(families)
        need_feed = "cdc_apply_sec" in families
        edges_k = (
            materialize(replicate(base_edges, ["u", "v"], k), f"edges_{k}")
            if need_edges else None
        )
        docs_k = (
            materialize(replicate(docs, ["doc_id"], k, text_col="text"), f"docs_{k}")
            if need_docs else None
        )
        vecs_k = (
            materialize(replicate(vecs, ["vec_id"], k), f"vecs_{k}")
            if need_vecs else None
        )
        feed_k = materialize(replicate_feed(k), f"feed_{k}") if need_feed else None
        probes = {
            "triangle_census_sec": lambda: triangle_census(edges_k).count(),
            "minhash_lsh_sec": lambda: minhash_lsh_candidates(
                docs_k, n=5, num_hashes=8, bands=4
            ).count(),
            # |Q| held constant: query_mod scales with K so the scan is
            # corpus-linear, the regime the serving path actually runs
            "bruteforce_fixedQ_sec": lambda: brute_force_topk(
                vecs_k, 100 * k, 5
            ).count(),
            # the CDC core: rollback/commit resolution + partial-rollback
            # pairing + PK dedup + delete-drop — all keyed shuffles
            "cdc_apply_sec": lambda: apply_changes(feed_k).count(),
            # df_max FIXED at the default while every term's df inflates
            # ×K — sub-quadratic wall growth is the cap working
            "tfidf_fixed_dfmax_sec": lambda: tfidf_cosine_pairs(docs_k).count(),
            # |Q| held constant (query_mod ×K): unpruned ADC is
            # corpus-linear like brute force
            "pq_topk_fixedQ_sec": lambda: pq_topk(vecs_k, 100 * k, 5).count(),
            # disjoint graph copies (OFFSET is even, so the even=customer
            # / odd=supplier id parity survives replication): the r12
            # checkpointed edge list is O(edges·K), each of the 3
            # iterations shuffles the O(nodes·K) rank table — wall must
            # stay ~K x
            "pagerank_sec": lambda: pagerank(
                edges_k.select("u", "v").toDF("src", "dst"), iters=3
            ).count(),
            # content-defined chunking over near-distinct replicas: the
            # r12 chunk-digest checkpoint is O(chunks·K)
            "content_chunks_sec": lambda: content_chunk_dedup_stats(
                docs_k
            ).count(),
        }
        row = {}
        if need_edges:
            row["edges"] = edges_k.count()
        if need_docs:
            row["docs"] = docs_k.count()
        if need_vecs:
            row["vecs"] = vecs_k.count()
        if need_feed:
            row["feed_rows"] = feed_k.count()
        for fam in families:
            row[fam] = timed(probes[fam])
        results[str(k)] = row
        print(json.dumps({"k": k, **row}), flush=True)

    base = results[str(ks[0])]
    summary = {
        fam: {
            str(k): round(
                results[str(k)][fam] / max(base[fam], 1e-9), 2
            )
            for k in ks
        }
        for fam in families
    }
    print(json.dumps({"growth_vs_k1": summary, "ks": ks}))
    shutil.rmtree(tmp, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
