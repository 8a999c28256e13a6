"""Symbolic time-series index (SAX / iSAX family, Lin et al. 2003;
Shieh & Keogh 2008) over behavioral hour-of-day profiles — the
bucketed candidate index for time-series similarity search, completing
the events_user_similarity exact scorer with a scale path the same way
LSH/PQ complete the embedding scorers.

Pipeline (all exact integers, DuckDB-mirrorable):
1. dense 24-dim profile per user (one (user) aggregate with 24
   conditional sums of round(value*1000));
2. PAA: 6 segments of 4 hours — segment SUM (same ordering as the
   mean, no division);
3. alphabet: per-segment QUARTILE breakpoints trained on the bounded
   ``user_id % sample_mod == 0`` sample (the PQ training-sample
   contract) — computed lazily in-plan by a rank window over the
   sample (sample-bounded sort, 18 output rows) and broadcast back;
4. word: 6 two-bit symbols packed into one bigint — equal words =
   candidate bucket.

Scale shape: profiles/PAA are one corpus aggregate; the breakpoint
table is 18 rows; candidates come from per-word self-joins (4^6 = 4096
buckets bound the fan-out); the audit joins candidates against the
exact top-k of a bounded query batch.

Reference scope note: oracdc has no time-series index; this belongs to
the analytics surface this engine adds (SURVEY §2.6 family).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

N_HOURS = 24
N_SEG = 6
SEG_W = N_HOURS // N_SEG


def user_profile(events: DataFrame) -> DataFrame:
    """Sparse per-user hourly value profile: (user_id, h, q) with
    q = sum of round(value*1000) for hour-of-day h — the shared
    exact-integer signature the similarity scorer, the SAX audit, and
    the serving path all consume (ONE definition, one oracle form)."""
    qv = F.round(F.col("value") * 1000, 0).cast("bigint")
    return (
        events.select("user_id", F.hour("ts").cast("bigint").alias("h"), qv.alias("q"))
        .groupBy("user_id", "h")
        .agg(F.sum("q").alias("q"))
    )


def user_paa(events: DataFrame) -> DataFrame:
    """Dense per-user PAA segments: (user_id, s0..s5) — segment sums of
    the quantized hourly value profile, absent hours contributing 0."""
    qv = F.round(F.col("value") * 1000, 0).cast("bigint")
    h = F.hour("ts")
    aggs = [
        F.sum(
            F.when((h >= s * SEG_W) & (h < (s + 1) * SEG_W), qv).otherwise(0)
        )
        .cast("bigint")
        .alias(f"s{s}")
        for s in range(N_SEG)
    ]
    return events.groupBy("user_id").agg(*aggs)


def _breakpoints_from_long(longf: DataFrame, sample_mod: int = 2) -> DataFrame:
    """Per-segment quartile breakpoints from the bounded sample of the
    (already normalized) long-form segments: for segment s with sorted
    sample values v_1..v_n (1-based), breakpoint i = v_max(1, (n*i)
    div 4) for i in 1..3.  Output: (seg, b1, b2, b3) — 18 values
    total, a broadcast literal-sized table computed lazily (the rank
    window sorts only the sample)."""
    samp = longf.filter(F.col("user_id") % sample_mod == 0).select("seg", "v")
    w = Window.partitionBy("seg").orderBy("v")
    ranked = samp.withColumn("rk", F.row_number().over(w))
    n = samp.groupBy("seg").agg(F.count(F.lit(1)).alias("n"))
    j = ranked.join(n, "seg")
    bps = [
        j.filter(
            F.col("rk") == F.greatest(F.lit(1), F.expr(f"(n * {i}) div 4"))
        )
        .groupBy("seg")
        .agg(F.min("v").alias(f"b{i}"))
        for i in (1, 2, 3)
    ]
    out = bps[0]
    for b in bps[1:]:
        out = out.join(b, "seg")
    return out


def _normalized_long(paa: DataFrame) -> DataFrame:
    """Long-form L1-NORMALIZED segments: (user_id, seg, v) with
    v = floor(1e6 * segment_sum / Σ|segment_sum|) — scale-invariant,
    so the symbols align with the COSINE scorer the index serves
    (users with the same shape at different amplitudes must share a
    word; raw-value quartiles would split them).  floor over an
    exactly-representable double division — both engines agree;
    all-zero profiles map to v = 0."""
    longf = None
    for s in range(N_SEG):
        part = paa.select(
            "user_id",
            F.lit(s).cast("bigint").alias("seg"),
            F.col(f"s{s}").alias("raw"),
        )
        longf = part if longf is None else longf.unionAll(part)
    tot = longf.groupBy("user_id").agg(F.sum(F.abs("raw")).alias("l1"))
    return longf.join(tot, "user_id").select(
        "user_id",
        "seg",
        F.when(F.col("l1") > 0,
               F.floor(F.col("raw").cast("double") * 1_000_000 / F.col("l1")))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("v"),
    )


def sax_words(events: DataFrame, sample_mod: int = 2) -> DataFrame:
    """(user_id, word): six 2-bit symbols (L1-normalized segment value
    vs its three sample-trained breakpoints) packed little-endian into
    one bigint."""
    longf = _normalized_long(user_paa(events))
    bp = _breakpoints_from_long(longf, sample_mod)
    sym = (
        longf.join(F.broadcast(bp), "seg")
        .select(
            "user_id",
            "seg",
            (
                (F.col("v") >= F.col("b1")).cast("bigint")
                + (F.col("v") >= F.col("b2")).cast("bigint")
                + (F.col("v") >= F.col("b3")).cast("bigint")
            ).alias("sym"),
        )
    )
    return sym.groupBy("user_id").agg(
        F.sum(F.expr("shiftleft(sym, CAST(2 * seg AS INT))"))
        .cast("bigint")
        .alias("word")
    )


def sax_candidates(
    events: DataFrame, sample_mod: int = 2, prefix_segs: int = 4
) -> DataFrame:
    """Similar-behavior candidate pairs: users sharing the low
    ``prefix_segs``-segment SAX prefix — the iSAX coarsening knob (the
    full 6-segment word is the finest resolution; a shorter prefix
    trades candidate volume for recall exactly like SimHash prefix
    bits).  4^prefix_segs buckets bound the self-join fan-out.
    Output: (u1, u2, bucket), u1 < u2."""
    mask = (1 << (2 * prefix_segs)) - 1
    wds = sax_words(events, sample_mod).select(
        "user_id", F.col("word").bitwiseAND(F.lit(mask)).alias("bucket")
    )
    a, b = wds.alias("a"), wds.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.user_id") < F.col("b.user_id")),
        )
        .select(
            F.col("a.user_id").alias("u1"),
            F.col("b.user_id").alias("u2"),
            F.col("a.bucket").alias("bucket"),
        )
    )


def sax_recall_audit(spark, sf_dir: str, query_mod: int = 50) -> DataFrame:
    """Index-quality audit as a CAPTURE-vs-SIMILARITY CURVE (the same
    banded discipline as the hyperplane-LSH audit): every profile pair
    of a bounded query batch is banded by its quantized-cosine score
    (floor(score*20)) and each band reports how many of its pairs the
    SAX buckets surface.  Capture must rise with the band — and on a
    corpus whose cosine-nearest profiles are sparse random overlaps
    (no true behavioral clusters), the absent high bands ARE the
    honest answer, not a low flat number.

    Output: (band, n_pairs, n_hits, capture), one row per occupied
    band; exact-integer counts."""
    from oracdc_spark.catalog import load_table

    events = load_table(spark, sf_dir, "events")
    prof = user_profile(events)
    qq = prof.filter(F.col("user_id") % query_mod == 0).select(
        F.col("user_id").alias("qu"), "h", F.col("q").alias("qa")
    )
    cc = prof.select(F.col("user_id").alias("nu"), "h", F.col("q").alias("qb"))
    dots = (
        F.broadcast(qq)
        .join(cc, "h")
        .filter(F.col("qu") != F.col("nu"))
        .groupBy("qu", "nu")
        .agg(F.sum(F.col("qa") * F.col("qb")).alias("dot"))
    )
    from oracdc_spark.operators.similarity import qcos_score

    qn = qq.groupBy("qu").agg(F.sum(F.col("qa") * F.col("qa")).alias("qn"))
    cn = cc.groupBy("nu").agg(F.sum(F.col("qb") * F.col("qb")).alias("cn"))
    score = qcos_score()
    pairs = (
        dots.join(F.broadcast(qn), "qu")
        .join(cn, "nu")
        .select(
            F.least("qu", "nu").alias("u1"),
            F.greatest("qu", "nu").alias("u2"),
            score.alias("score"),
        )
        .groupBy("u1", "u2")
        .agg(F.max("score").alias("score"))
    )
    cand = sax_candidates(events).select("u1", "u2", F.lit(1).alias("hit"))
    return (
        pairs.join(cand, ["u1", "u2"], "left")
        .groupBy(F.floor(F.col("score") * 20).cast("bigint").alias("band"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("bigint").alias("n_hits"),
        )
        .select(
            "band",
            "n_pairs",
            "n_hits",
            F.round(
                F.col("n_hits").cast("double") / F.col("n_pairs").cast("double"), 6
            ).alias("capture"),
        )
    )


def sax_topk(
    spark,
    sf_dir: str,
    query_mod: int = 50,
    k_neighbors: int = 3,
    prefix_segs: int = 4,
) -> DataFrame:
    """The SAX index's SEARCH endpoint (the ivfpq_refine shape for time
    series): candidate users from the query's SAX prefix bucket, exact
    quantized-cosine re-scoring of ONLY those pairs, top-k per query.
    Queries whose bucket has no other member return no rows — the
    index serves "similar enough to share a bucket", and the banded
    audit quantifies what that misses.

    Scale shape: the candidate join is bucket-equality (bounded
    fan-out); the profile component table is touched once, pruned by
    the broadcast candidate pair list before any per-hour work.
    Output: (query_user, neighbor_user, rank)."""
    from oracdc_spark.catalog import load_table

    events = load_table(spark, sf_dir, "events")
    mask = (1 << (2 * prefix_segs)) - 1
    wds = sax_words(events).select(
        "user_id", F.col("word").bitwiseAND(F.lit(mask)).alias("bucket")
    )
    q = wds.filter(F.col("user_id") % query_mod == 0).select(
        F.col("user_id").alias("query_user"), "bucket"
    )
    cand = (
        F.broadcast(q)
        .join(wds.withColumnRenamed("user_id", "neighbor_user"), "bucket")
        .filter(F.col("query_user") != F.col("neighbor_user"))
        .select("query_user", "neighbor_user")
    )
    prof = user_profile(events)
    # query-side profiles are PRUNED to the bounded candidate query set
    # BEFORE the broadcast — broadcasting the raw corpus-sized profile
    # table would contradict the pruned-first contract (and OOM the
    # driver at scale); the qn/cn legs below already follow this shape
    pq_ = (
        prof.select(F.col("user_id").alias("query_user"), "h", F.col("q").alias("qa"))
        .join(F.broadcast(cand.select("query_user").distinct()), "query_user")
    )
    pn = prof.select(
        F.col("user_id").alias("neighbor_user"), "h", F.col("q").alias("qb")
    )
    dots = (
        pn.join(F.broadcast(cand), "neighbor_user")
        .join(F.broadcast(pq_), ["query_user", "h"])
        .groupBy("query_user", "neighbor_user")
        .agg(F.sum(F.col("qa") * F.col("qb")).alias("dot"))
    )
    qn = pq_.groupBy("query_user").agg(
        F.sum(F.col("qa") * F.col("qa")).alias("qn")
    )
    cn = (
        pn.join(F.broadcast(cand.select("neighbor_user").distinct()), "neighbor_user")
        .groupBy("neighbor_user")
        .agg(F.sum(F.col("qb") * F.col("qb")).alias("cn"))
    )
    from oracdc_spark.operators.similarity import qcos_score

    score = qcos_score()
    w = Window.partitionBy("query_user").orderBy(
        F.col("score").desc(), "neighbor_user"
    )
    return (
        dots.join(F.broadcast(qn), "query_user")
        .join(F.broadcast(cn), "neighbor_user")
        .select("query_user", "neighbor_user", score.alias("score"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k_neighbors)
        .select(
            "query_user",
            "neighbor_user",
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


PLANT_OFFSET = 1_000_000  # twin user_id = original + PLANT_OFFSET


def sax_planted_audit(events: DataFrame) -> DataFrame:
    """Planted-positive audit for the SAX index (the hyperplane
    pattern): every user gets a twin with an ALMOST-identical profile —
    the twin carries all the user's events plus ONE extra copy of the
    user's earliest event with value pinned to 0.001 (one quantized
    unit in one hour) — and the row reports how many (user, twin)
    pairs share a SAX prefix bucket.  Exact duplicates would collide
    trivially (scale-invariance is already unit-tested); the one-unit
    perturbation makes capture a real measurement of symbol stability
    at the operating point.  One row: (n_planted, n_hits, capture)."""
    w = Window.partitionBy("user_id").orderBy("event_id")
    first = (
        events.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .withColumn("value", F.lit(0.001))
    )
    twins = events.unionByName(first).withColumn(
        "user_id", F.col("user_id") + PLANT_OFFSET
    )
    both = events.unionByName(twins)
    mask = 255  # the shipped 4-segment prefix
    wds = sax_words(both).select(
        "user_id", F.col("word").bitwiseAND(F.lit(mask)).alias("bucket")
    )
    orig = wds.filter(F.col("user_id") < PLANT_OFFSET)
    twin = wds.filter(F.col("user_id") >= PLANT_OFFSET).select(
        (F.col("user_id") - PLANT_OFFSET).alias("user_id"),
        F.col("bucket").alias("t_bucket"),
    )
    hits = (
        orig.join(twin, "user_id")
        .filter(F.col("bucket") == F.col("t_bucket"))
        .select("user_id")
    )
    np_ = (
        events.agg(
            F.count_distinct("user_id").alias("_n"),
            F.max("user_id").alias("_mx"),
        )
        .select(
            F.when(
                F.col("_mx") >= PLANT_OFFSET,
                F.raise_error(
                    F.lit(
                        "sax_planted_audit: user_id >= PLANT_OFFSET — the "
                        "planted id space would collide with real ids"
                    )
                ).cast("bigint"),
            )
            .otherwise(F.col("_n"))
            .cast("bigint")
            .alias("n_planted")
        )
    )
    nh = hits.agg(F.count(F.lit(1)).cast("bigint").alias("n_hits"))
    # empty-corpus PRECONDITION, stated plainly in-plan (the uniform
    # r10 rule for the planted/training audits, pq.train's ValueError
    # precedent translated to lazy builders: you cannot plant twins
    # into zero rows, and an unguarded capture division would surface
    # as a deep ANSI DIVIDE_BY_ZERO instead of naming the cause)
    return np_.crossJoin(nh).select(
        "n_planted",
        "n_hits",
        F.when(
            F.col("n_planted") == 0,
            F.raise_error(
                F.lit(
                    "sax_planted_audit: nothing planted — zero distinct "
                    "user_ids in the events table (audit precondition)"
                )
            ).cast("double"),
        )
        .otherwise(
            F.round(
                F.col("n_hits").cast("double") / F.col("n_planted").cast("double"),
                6,
            )
        )
        .alias("capture"),
    )
