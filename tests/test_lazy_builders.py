"""Plan-construction laziness contract: building a declared query must
not run Spark jobs.

Every `queries()` entry is a PLAN builder — eager driver-side actions at
build time (a `df.count()` to freeze a scalar into a literal, a stray
`collect()`) re-run corpus passes before the real plan even starts and
break the single-lazy-plan model (r5 verdict item 2).  Corpus scalars
belong in 1-row aggregates composed via `crossJoin(F.broadcast(...))`.

Allowed exceptions, each a bounded-by-metadata or convergence decision
the driver legitimately makes (never a corpus pass):

- ``registry_evolution`` / ``registry_key_guard`` — collect the 25-row
  nation dim as table identities for driver-side dictionary replay (the
  reference keeps the dictionary in connector memory; bounded by table
  count, not data size).
- ``dedup_clusters`` — label-propagation convergence loop; each
  iteration's `count()` is the stopping decision (bounded iterations).
- ``similarity_pq_*`` / ``similarity_ivfpq_*`` — PQ training collects
  the bounded ``vec_id % sample_mod == 0`` training sample's components
  and runs Lloyd driver-side (r7, the FAISS shape: codebooks train on a
  sample host-side, then pin as broadcast constants for one distributed
  encode pass; the r6 all-lazy full-corpus loop cost ~5 s of pure AQE
  stage-scheduling overhead).  The collect is bounded by the caller's
  sample contract (like brute_force_topk's query batch), never the
  corpus.  Trained once per (corpus, m, k, iters, sample_mod) per
  session; the family shares the cache, so only the first builder pays.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE

ALLOWED_BUILD_JOBS = {
    "registry_evolution": 2,   # one bounded dictionary collect (25 rows)
    "registry_key_guard": 2,
    "dedup_clusters": 40,      # convergence iterations, corpus-bounded
    # pointer-jumping variant: eager localCheckpoints + convergence
    # counts per round (O(log diameter) rounds)
    "dedup_clusters_fast": 40,
    # composes dedup_clusters' convergence loop + a window
    "dedup_canonical": 40,
    # same composition with the distinct-token quality key
    "dedup_canonical_quality": 40,
    # PQ codebook training: one bounded sample-components collect (see
    # module docstring), AQE may split it into several jobs; cache-hit = 0
    "similarity_pq_topk": 15,
    "similarity_ivfpq_topk": 15,
    "similarity_ivfpq_refine": 15,
    "similarity_pq_recall": 15,
    # rotated-space codebook trains on its own bounded sample (the
    # rotate=True cache key misses the raw-space entry by design)
    "similarity_opq_recall": 15,
    # composes pq_topk + ivfpq_topk: pays the training collect only if
    # the raw-space cache is cold (it is warm in window order)
    "similarity_ann_purity": 15,
    # balanced split trains on its own bounded sample (new cache key)
    "similarity_opq_balanced_recall": 15,
    # learned-OPQ audit: one raw-sample collect for the driver-side fit
    # plus one training collect per iters_grid leg (3 legs)
    "similarity_opq_learned_audit": 60,
    # k-core peeling: one eager localCheckpoint + one convergence count
    # per peel round (iterative-algorithm exception, same class as
    # dedup_clusters_fast; r8 added the output-identical early-exit
    # counts — cheap jobs on materialized lists)
    "graph_kcore": 18,
    # r12 optimization: pagerank/triangles materialize their shared
    # edge relations via localCheckpoint (guide §2.4 — the lineage
    # plans re-derived the orders⋈lineitem / co-purchase self-join
    # subtree 4×/~20×; A/B 5.0→2.1 s / 4.9→1.7 s at sf0.1).  Under AQE
    # even a LAZY localCheckpoint materializes the intermediate query
    # stages at build — same iterative/multi-consumer exception class
    # as graph_kcore/dedup_clusters_fast.
    "graph_pagerank": 25,
    "graph_triangles": 25,
    # r12 optimization: multi-consumer relations materialized via
    # localCheckpoint (guide §2.4) — pair-recall audit inputs, the
    # ivfpq refine candidate list (its producer is the full ivfpq
    # plan), k-means components/centroids, the bigram doc-pair
    # aggregate, and the winnow/gram tables.  Each checkpointed
    # relation is consumed 2-3× in the same plan; under AQE the lazy
    # checkpoint still materializes intermediate stages at build.
    "dedup_lsh_recall": 25,
    "dedup_simhash_recall": 40,   # one exact + two rotation-count cand legs
    "similarity_ivfpq_refine": 40,  # cand checkpoint runs the ivfpq plan
    "similarity_kmeans_cells": 30,  # components + per-iteration centroids
    "text_bigram_logprob": 15,
    "similarity_near_dups": 20,   # component + signature checkpoints
    "dedup_semantic": 20,         # composes embedding_near_dups
    "text_unigram_logprob": 15,   # token-stream checkpoint
    "text_perplexity_buckets": 20,  # token stream + per-doc score table
    # curation v4/v5 and the funnel compose perplexity_buckets' stages
    "pipeline_curation_v4": 25,
    "pipeline_curation_v5": 30,
    "pipeline_curation_funnel": 30,
    "text_winnow_candidates": 20,
    "text_dup_span_fraction": 15,
    "text_exact_substr_trim": 15,
    # r12 optimization: the simhash signature relation feeds every
    # rotation's bucket projection on both sides of the candidate
    # self-join (2*rotations consumers) — materialized once (plan: 38
    # Exchanges -> 4).  Same lazy-localCheckpoint-under-AQE class as
    # above; method_matrix composes the 3-rotation candidates.
    "dedup_simhash": 10,
    "dedup_method_matrix": 10,
    # r12 optimization: the content-defined chunk-digest relation feeds
    # the df-count aggregate AND the join-back — materialized once so
    # the window/reassembly chunker runs once (A/B idle-host warm min
    # 2.24 -> 1.90 s).  Same lazy-localCheckpoint-under-AQE class.
    "dedup_content_chunks": 10,
    # PMI topic clusters: eager edge/label localCheckpoints per
    # hook+shortcut round over the VOCAB-sized graph (iterative
    # exception; the corpus is scanned only by the PMI scorer)
    "text_topic_clusters": 80,  # 10 rounds x (hook agg + shortcut) checkpoints
    # streaming-gate batch-equivalence fold: 3 micro-batch state folds,
    # each a bounded localCheckpoint + state swap write (the trigger
    # loop of the streaming operator, not a corpus-sized driver action)
    "streaming_dedup_gate": 30,
    # r9 fold promotions, same trigger-loop class as the dedup gate:
    # per batch a state read + emission localCheckpoint + state swap
    # write(s) — bounded by batch COUNT (3), never by data size
    "streaming_interval_join": 30,
    "streaming_session_fold": 24,
}


@pytest.mark.slow
def test_query_builders_launch_no_jobs(spark):
    import __spark_entry__ as e

    sc = spark.sparkContext
    qs = e.queries()
    violations = {}
    for name, fn in qs.items():
        group = f"lazy-build-{name}"
        sc.setJobGroup(group, group, False)
        try:
            fn(spark, SF_SMOKE)
        finally:
            sc.setJobGroup("lazy-build-idle", "idle", False)
        n_jobs = len(sc.statusTracker().getJobIdsForGroup(group))
        if n_jobs > ALLOWED_BUILD_JOBS.get(name, 0):
            violations[name] = n_jobs
    assert not violations, (
        "query builders ran eager Spark jobs at plan-construction time "
        f"(use lazy 1-row broadcast aggregates instead): {violations}"
    )
