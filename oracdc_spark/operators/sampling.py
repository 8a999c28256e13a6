"""Deterministic sampling operators for training-data mix curation.

Real LLM pipelines rarely take a corpus as-is: they cap over-represented
groups (quota sampling) and re-balance languages/domains with temperature
sampling (q_l ∝ p_l^τ, the mBERT/XLM recipe) so low-resource slices are
not drowned out.  Both are restated here as *deterministic* operators —
membership is a pure function of (doc_id, group counts), never an RNG —
so runs are reproducible, resumable, and oracle-checkable.

Scale shapes:
- quota: one window over the group key (single shuffle); the md5 rank
  makes the kept set stable under re-runs and insertion order.
- temperature: one tiny per-group count aggregate (|groups| rows —
  genuinely broadcastable), then a map-side threshold filter; the corpus
  itself is never shuffled.  Thresholds compare in DECIMAL(38,0) integer
  arithmetic (hash·W·n_l < w_l·N·2^32) — no float boundary, so a 1-ulp
  engine difference can never flip membership.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

_DEC = "decimal(38,0)"


def _hash32(col):
    """First 32 bits of md5(col) as an integer — the uniform-[0,2^32)
    deterministic coin both engines agree on."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("bigint")


def quota_sample(docs: DataFrame, group_col: str = "lang", quota: int = 20) -> DataFrame:
    """Keep at most `quota` documents per group, chosen by md5 order of
    doc_id (stable, uniform, engine-portable).  Output: the kept docs
    with their in-group rank."""
    w = Window.partitionBy(group_col).orderBy(
        _hash32(F.col("doc_id")), F.col("doc_id")
    )
    return (
        docs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= quota)
        .select("doc_id", group_col, F.col("rk").cast("bigint").alias("rk"))
    )


def train_split(docs: DataFrame, val_pct: int = 5, test_pct: int = 5) -> DataFrame:
    """Deterministic train/val/test assignment: split = pure function of
    doc_id (md5 coin vs integer per-mille thresholds), so membership is
    stable across runs, shards, and engines — a doc can never leak from
    test into train when the corpus is re-processed (the property random
    splits lose the moment data is re-partitioned).

    Map-side only: no shuffle, no state.  Output: (doc_id, split)."""
    from oracdc_spark.plans.parallel import ensure_parallelism

    docs = ensure_parallelism(docs)  # map-side op: spread single-file inputs
    h = _hash32(F.col("doc_id"))
    # integer thresholds out of 2^32 — no float boundary
    test_lt = (2**32) * test_pct // 100
    val_lt = (2**32) * (test_pct + val_pct) // 100
    return docs.select(
        "doc_id",
        F.when(h < test_lt, F.lit("test"))
        .when(h < val_lt, F.lit("val"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )


def temperature_mix(docs: DataFrame, group_col: str = "lang") -> DataFrame:
    """Temperature-τ=0.5 group re-balancing: sample group l at rate
    min(1, q_l·N/n_l) with q_l = n_l^τ / Σ n_m^τ, so the kept corpus
    keeps its overall size budget while flattening the group skew.

    τ is fixed at 0.5 because sqrt is the one power IEEE 754 evaluates
    bit-identically everywhere (pow(x, τ) is libm-dependent); the weight
    is then quantized to an integer (round(sqrt(n)·1e6)) and membership
    reduces to an exact DECIMAL(38,0) cross-multiplication:
        hash32(doc) · W · n_l  <  w_l · N · 2^32
    Magnitudes stay under 10^38 up to n_l ≈ 10^12 docs — 100 TB-safe.

    Output: kept (doc_id, group, n_l) rows."""
    from oracdc_spark.plans.parallel import ensure_parallelism

    docs = ensure_parallelism(docs)  # the threshold filter is map-side
    counts = docs.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_l"))
    weights = counts.select(
        group_col,
        "n_l",
        F.round(F.sqrt(F.col("n_l").cast("double")) * 1e6).cast(_DEC).alias("w_l"),
    )
    totals = weights.agg(
        F.sum("w_l").cast(_DEC).alias("w_tot"),
        F.sum("n_l").cast(_DEC).alias("n_tot"),
    )
    # |groups| rows — a true constant-size broadcast
    j = docs.join(F.broadcast(weights), group_col).crossJoin(F.broadcast(totals))
    lhs = (
        _hash32(F.col("doc_id")).cast(_DEC)
        * F.col("w_tot")
        * F.col("n_l").cast(_DEC)
    )
    rhs = F.col("w_l") * F.col("n_tot") * F.lit(2**32).cast(_DEC)
    return j.filter(lhs < rhs).select("doc_id", group_col, F.col("n_l").cast("bigint").alias("n_l"))


def pack_sequences(
    docs: DataFrame, budget: int = 1024, n_shards: int = 64
) -> DataFrame:
    """Greedy contiguous sequence packing: assemble documents into
    fixed-token-budget training sequences (the T5/GPT data-loader
    packing step).  Deterministic and shard-local:

    * documents shard by ``doc_id % n_shards``;
    * within a shard, documents pack in doc_id order — each starts in
      the bin its token prefix-sum falls in (``prefix_before div
      budget``); an over-budget document overflows into the next bin
      (spillover packing, no document is split here — splitting is the
      tokenizer's job downstream);
    * output is per-sequence: how many documents and tokens each packed
      sequence holds, and its doc_id span (the loader's fetch range).

    Scale: ONE shuffle on the shard key; the prefix sum is a
    within-partition window (no global ordering, no driver state);
    ``n_shards`` scales with the cluster exactly like a distributed
    loader's worker count.  Token counts use the corpus whitespace
    tokenizer (textops._tokens) so packing agrees with token_stats."""
    from oracdc_spark.operators.textops import _parallel, _tokens

    nt = _parallel(docs).select(
        "doc_id",
        (F.col("doc_id") % n_shards).cast("bigint").alias("shard"),
        F.size(_tokens()).cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    binned = nt.withColumn(
        "prefix", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    ).withColumn("seq_id", F.expr(f"prefix div {budget}"))
    return binned.groupBy("shard", "seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("sum_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


def pack_efficiency_audit(
    docs: DataFrame, budget: int = 1024, n_shards: int = 64
) -> DataFrame:
    """Packing-quality audit for :func:`pack_sequences` (the audit
    discipline every approximate/greedy structure in the engine ships
    with): ONE row with the sequence count, token mass, padding waste
    of the greedy packing, and the ideal lower bound.

    * ``fill_ratio`` = sum_tokens / (n_seqs · budget) — the fraction of
      the training batch that is real tokens rather than padding;
    * ``ideal_seqs`` = ceil(total_tokens / budget) — the bin-count lower
      bound a perfect packer could reach; ``overhead_pct`` is how far
      the shard-local greedy packing is from it.

    Integer-exact throughout (cross-multiplied ceil, quantized ratios);
    composed as 1-row aggregates — no driver actions."""
    seqs = pack_sequences(docs, budget, n_shards)
    agg = seqs.agg(
        F.count(F.lit(1)).alias("n_seqs"),
        F.sum("sum_tokens").alias("total_tokens"),
    )
    ideal = F.expr(f"(total_tokens + {budget - 1}) div {budget}")
    return agg.select(
        F.col("n_seqs").cast("bigint").alias("n_seqs"),
        F.col("total_tokens").cast("bigint").alias("total_tokens"),
        F.round(
            F.col("total_tokens").cast("double") / (F.col("n_seqs") * budget), 6
        ).alias("fill_ratio"),
        ideal.cast("bigint").alias("ideal_seqs"),
        F.round(
            (F.col("n_seqs") - ideal).cast("double") / ideal * 100, 4
        ).alias("overhead_pct"),
    )


def chunk_documents(
    docs: DataFrame, size: int = 64, stride: int = 48
) -> DataFrame:
    """Token-window chunking — the RAG / context-window preprocessing
    step: split each document into overlapping chunks of ``size`` tokens
    starting every ``stride`` tokens (overlap = size − stride), the
    sliding-window recipe retrieval corpora are built with.  The final
    window may be short (no padding here — padding is the collator's
    job); documents with no tokens produce no chunks.

    Output: (doc_id, chunk_id, start_tok, n_chunk_tokens, chunk_text).

    Scale shape (100 TB): a pure NARROW map — tokenize, generate the
    start-offset sequence, posexplode, slice.  No shuffle anywhere; the
    per-row fan-out is bounded by n_tokens/stride and chunk rows stay on
    the partition that read the document, so the op composes with the
    scan's partitioning (and the downstream embed/dedup stages shuffle
    on their own keys).  Guard: ``F.sequence(0, n-1, step)`` with n=0
    would DESCEND (Spark sequence semantics) — the n_tokens > 0 filter
    runs before the sequence is built."""
    from oracdc_spark.operators.textops import _parallel, _tokens

    toks = (
        _parallel(docs)
        .select("doc_id", _tokens().alias("w"))
        .withColumn("n", F.size("w"))
        .filter(F.col("n") > 0)
    )
    starts = F.sequence(F.lit(0), F.col("n") - 1, F.lit(stride))
    return (
        toks.select("doc_id", "w", "n", F.posexplode(starts).alias("chunk_id", "start_tok"))
        .select(
            "doc_id",
            F.col("chunk_id").cast("bigint").alias("chunk_id"),
            F.col("start_tok").cast("bigint").alias("start_tok"),
            F.least(F.lit(size), F.col("n") - F.col("start_tok"))
            .cast("bigint")
            .alias("n_chunk_tokens"),
            F.concat_ws(" ", F.slice("w", F.col("start_tok") + 1, F.lit(size))).alias(
                "chunk_text"
            ),
        )
    )


def token_budget_select(
    docs: DataFrame, budget: int = 2000, n_shards: int = 8
) -> DataFrame:
    """Quality-ranked corpus selection under a per-shard token budget —
    the "fill a fixed training-token allowance with the best documents"
    curation step (the rank-then-cut recipe used when a target corpus
    size is fixed before mixing).

    Quality score = ``1_000_000 * n_distinct_tokens div n_tokens`` (an
    exact-integer lexical-diversity proxy; any audited scorer — Gopher,
    DSIR, BM25 — slots into the same rank key).  Documents shard by
    ``doc_id % n_shards``; within a shard they rank best-first (score
    desc, doc_id asc) and a document is selected iff the running token
    total INCLUDING it still fits the budget — a pure window prefix-sum
    cut, deterministic across engines.

    Output (selected docs only): (doc_id, shard, n_tokens, score,
    rank, cum_tokens).

    Scale shape: ONE shuffle on the shard key; ranking and the prefix
    sum are within-partition windows (no global sort — per-shard
    budgets are how a distributed loader enforces a corpus-size target
    anyway, exactly like pack_sequences' shards).  Token/distinct
    counts are per-row codegen array ops on the corpus scan."""
    from oracdc_spark.operators.textops import _parallel, _tokens

    toks = _tokens()
    nt = F.size(toks).cast("bigint")
    nd = F.size(F.array_distinct(toks)).cast("bigint")
    scored = _parallel(docs).select(
        "doc_id",
        (F.col("doc_id") % n_shards).cast("bigint").alias("shard"),
        nt.alias("n_tokens"),
        F.when(nt > 0, F.expr("1000000") * nd)
        .otherwise(F.lit(0))
        .alias("_num"),
    ).select(
        "doc_id",
        "shard",
        "n_tokens",
        F.when(F.col("n_tokens") > 0, F.expr("_num div n_tokens"))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("score"),
    )
    w = Window.partitionBy("shard").orderBy(F.col("score").desc(), "doc_id")
    ranked = scored.withColumn(
        "rank", F.row_number().over(w).cast("bigint")
    ).withColumn(
        "cum_tokens",
        F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return ranked.filter(F.col("cum_tokens") <= budget)

def token_budget_global(docs: DataFrame, budget: int = 20000) -> DataFrame:
    """GLOBAL quality-ranked token-budget cut — emits exactly the set
    the single global sort would (rank all docs by score desc, doc_id
    asc; keep while the running token total fits ``budget``), computed
    WITHOUT a global sort: the complement of ``token_budget_select``'s
    per-shard contract for when the corpus-size target is one number,
    not one per shard.

    Two-pass score-decomposition shape (the scale-safe restatement of
    "ORDER BY score DESC LIMIT <budget tokens>"):

    1. Histogram pass: aggregate total tokens per distinct score.  The
       lexical-diversity score is bounded in [0, 1_000_000], so this
       table is metadata-sized regardless of corpus size; one
       single-partition window over it (score desc) yields, per score,
       the token total of all strictly-higher-scored documents, hence
       the per-score remaining allowance
       ``allow(s) = budget - higher_total(s)``.
    2. Cut pass: broadcast-join the allowance back and keep a document
       iff its within-score prefix sum (ordered doc_id asc — the same
       tiebreak the global order uses) fits ``allow(s)``.  Because
       ``global_cum = higher_total(score) + within_score_cum``, the
       predicate is algebraically identical to ``global_cum <=
       budget`` — the oracle proves parity against the literal
       global-sort SQL.

    Scale shape: ONE shuffle of the corpus (the score-partitioned
    window); the histogram is a partial-aggregated exchange collapsing
    to <= 1M rows and its ordering window runs on that metadata-sized
    table only.  If one score value floods a partition (degenerate
    constant-score corpora), sub-salt the within-score window by
    doc_id range with a two-level prefix sum — the decomposition
    composes; not needed while the scorer has 1e6 distinct values.

    Output (selected docs only): (doc_id, n_tokens, score,
    cum_tokens) where cum_tokens is the GLOBAL running total, matching
    the global-sort oracle row for row."""
    from oracdc_spark.operators.textops import _parallel, _tokens

    toks = _tokens()
    nt = F.size(toks).cast("bigint")
    nd = F.size(F.array_distinct(toks)).cast("bigint")
    scored = _parallel(docs).select(
        "doc_id",
        nt.alias("n_tokens"),
        F.when(nt > 0, F.expr("1000000") * nd).otherwise(F.lit(0)).alias("_num"),
    ).select(
        "doc_id",
        "n_tokens",
        F.when(F.col("n_tokens") > 0, F.expr("_num div n_tokens"))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("score"),
    )
    hist = scored.groupBy("score").agg(F.sum("n_tokens").alias("score_tokens"))
    wh = Window.orderBy(F.col("score").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    allow = hist.select(
        "score",
        F.coalesce(F.sum("score_tokens").over(wh), F.lit(0))
        .cast("bigint")
        .alias("higher_total"),
    )
    wd = Window.partitionBy("score").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        scored.join(F.broadcast(allow), "score")
        .withColumn("_grp_cum", F.sum("n_tokens").over(wd))
        .filter(
            F.col("_grp_cum") <= F.lit(int(budget)) - F.col("higher_total")
        )
        .select(
            "doc_id",
            "n_tokens",
            "score",
            (F.col("higher_total") + F.col("_grp_cum"))
            .cast("bigint")
            .alias("cum_tokens"),
        )
    )


def weighted_sample(docs: DataFrame, k: int = 100) -> DataFrame:
    """Weight-proportional sample WITHOUT replacement of ``k`` documents
    — sequential Poisson / priority sampling (Ohlsson 1998; the
    Duffield–Lund–Thorup priority-sampling family): draw a uniform
    u_i per item, key it as u_i / w_i, and keep the k smallest keys.
    Inclusion probability is ≈ k·w_i/Σw (exactly πps as n→∞), which is
    how a corpus is subsampled token-proportionally: weighting by
    document length makes "pick k docs" statistically equivalent to a
    uniform sample over TOKENS, so long docs aren't under-represented.

    Determinism discipline (same as temperature_mix): the uniform is
    hash32(doc_id) and the key is the INTEGER ``(h << 20) div w`` —
    exact in both engines (h < 2^32, so h·2^20 < 2^52 fits BIGINT and
    integer division is floor everywhere), never a float ratio whose
    1-ulp libm differences could flip the k-th rank.  The 2^20 scale
    quantizes the ideal ratio; ties (possible after quantization)
    break by doc_id.  Weight = max(n_chars, 1).

    Scale shape: zero shuffles — ``ORDER BY key LIMIT k`` compiles to
    TakeOrderedAndProject (per-partition top-k heaps, then a k·P-row
    driver merge); the corpus is scanned once, map-side.

    Output: (doc_id, source, weight, skey) of the k selected docs."""
    from oracdc_spark.plans.parallel import ensure_parallelism

    docs = ensure_parallelism(docs)  # map-side key + per-partition top-k
    w = F.greatest(F.col("n_chars").cast("bigint"), F.lit(1))
    keyed = docs.select(
        "doc_id",
        "source",
        w.alias("weight"),
        (_hash32(F.col("doc_id")) * F.lit(1 << 20)).alias("_num"),
    ).select(
        "doc_id",
        "source",
        "weight",
        F.expr("_num div weight").cast("bigint").alias("skey"),
    )
    return keyed.orderBy("skey", "doc_id").limit(k)


def split_leakage_audit(
    docs: DataFrame,
    val_pct: int = 5,
    test_pct: int = 5,
    n: int = 5,
    num_hashes: int = 8,
    bands: int = 4,
) -> DataFrame:
    """Train/val/test NEAR-DUP leakage audit: joins the MinHash-LSH
    candidate pairs against the deterministic split assignment and
    counts pairs per (split_a, split_b) combination — the `leaked`
    rows (split_a != split_b) are near-duplicate documents straddling
    a split boundary, i.e. evaluation contamination the doc-level
    hash split cannot see (it guarantees a DOC never crosses splits,
    not that its near-copies don't).

    Composes two audited operators verbatim: dedup.minhash_lsh_candidates
    (bucket-bounded pair generation — never all-pairs) and train_split
    (md5 coin).  Output: (split_a, split_b, n_pairs, leaked), <= 6 rows.

    Scale shape: candidate pairs are the only corpus-derived rows and
    are web-bounded (near-dup density); the two split lookups join on
    d1/d2 unhinted — AQE broadcasts the pair side when it is small,
    shuffles otherwise; the final aggregate is 6 rows."""
    from oracdc_spark.operators.dedup import minhash_lsh_candidates

    pairs = minhash_lsh_candidates(docs, n, num_hashes, bands)
    sp = train_split(docs, val_pct, test_pct)
    j = (
        pairs.join(
            sp.select(F.col("doc_id").alias("d1"), F.col("split").alias("s1")),
            "d1",
        ).join(
            sp.select(F.col("doc_id").alias("d2"), F.col("split").alias("s2")),
            "d2",
        )
    )
    return (
        j.groupBy(
            F.least("s1", "s2").alias("split_a"),
            F.greatest("s1", "s2").alias("split_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
        .withColumn("leaked", F.col("split_a") != F.col("split_b"))
    )


def mixture_rebalance(
    docs: DataFrame,
    targets_ppm: dict | None = None,
    group_col: str = "lang",
) -> DataFrame:
    """Downsample-only mixture rebalancing: keep a deterministic subset
    of each group so the kept TOKEN shares land proportional to the
    target weights (the fixed-mixture recipe of Pile-style corpus
    assembly; contrast temperature_mix, which re-weights by a power of
    the observed shares rather than to an explicit spec).

    Method: with observed group token totals t_g and target weights
    w_g, keep fraction f_g = (w_g/t_g) / max_h(w_h/t_h) — the unique
    downsample-only solution with expected kept-token shares exactly
    proportional to w (the most over-target group keeps everything;
    every other group downsamples below it).  Membership is the md5
    coin vs an integer threshold, evaluated as pure cross-
    multiplication in DECIMAL(38,0):

        keep  <=>  hash32(doc_id) * t_g * w_h  <  2^32 * w_g * t_h

    — no division, no float boundary (same convention as
    temperature_mix).  h (the argmax) is picked by double-precision
    ratio with a group-name tie-break: correctly-rounded division maps
    equal rationals to identical doubles in BOTH engines, so the pick
    is engine-portable even when ratios tie.  Groups absent from
    ``targets_ppm`` are dropped (weight 0).

    Output: the kept docs (doc_id, <group_col>, n_tokens).

    Scale shape: one corpus token aggregate (|groups| rows), a
    metadata-sized ORDER BY .. LIMIT 1 for the argmax, the threshold
    table broadcast back onto one map-side filter pass — the corpus is
    never shuffled."""
    if targets_ppm is None:
        targets_ppm = {"en": 500000, "de": 200000, "es": 200000, "fr": 100000}
    spark = docs.sparkSession
    from oracdc_spark.plans.parallel import ensure_parallelism

    from oracdc_spark.plans.literal import local_df

    # driver-literal target table → LocalRelation (guide §4: the
    # Python-RDD createDataFrame path would launch a Python-worker
    # stage for every materialization of this |groups|-row constant)
    tgt = local_df(
        spark, sorted(targets_ppm.items()), f"{group_col} string, w long"
    )
    toks = F.filter(
        F.split(F.trim(F.col("text")), r"\s+"), lambda x: x != F.lit("")
    )
    base = ensure_parallelism(docs).select(
        "doc_id", group_col, F.size(toks).cast("bigint").alias("n_tokens")
    )
    gt = (
        base.groupBy(group_col)
        .agg(F.sum("n_tokens").alias("t"))
        .join(F.broadcast(tgt), group_col)
    )
    hstar = (
        gt.orderBy(
            (F.col("w").cast("double") / F.col("t")).desc(), group_col
        )
        .limit(1)
        .select(F.col("w").alias("wh"), F.col("t").alias("th"))
    )
    thr = gt.crossJoin(F.broadcast(hstar))
    keep = (
        _hash32(F.col("doc_id")).cast(_DEC)
        * F.col("t").cast(_DEC)
        * F.col("wh").cast(_DEC)
        < F.lit(2**32).cast(_DEC) * F.col("w").cast(_DEC) * F.col("th").cast(_DEC)
    )
    return (
        base.join(F.broadcast(thr), group_col)
        .filter(keep)
        .select("doc_id", group_col, "n_tokens")
    )


def ab_assign(
    docs: DataFrame,
    arms: tuple = ("control", "treatment"),
    weights: tuple = (1, 1),
    salt: str = "exp1",
) -> DataFrame:
    """Deterministic experiment bucketing with a sample-ratio-mismatch
    audit — the assignment layer under every data-pipeline A/B (ablate
    a filter on arm B, compare downstream loss): the unit's arm is a
    pure function of (salt, doc_id), so re-runs, late arrivals, and
    retries always land in the same arm (the md5-coin convention every
    sampler here shares), and no coordination or state is needed
    across 1000 executors.

    The audit is the standard SRM check (Fabijan et al., "Diagnosing
    Sample Ratio Mismatch", KDD 2019): per arm, observed count vs the
    weight-expected count and the Pearson χ² component
    (obs−exp)²/exp — a large Σχ² on a deterministic hash means the
    upstream corpus itself was filtered arm-dependently (the classic
    pipeline bug SRM exists to catch).

    One corpus scan, one |arms|-row aggregate; the arm boundary table
    is a broadcast literal.  Output: (arm, n_docs, expected_docs,
    chi2_component), one row per arm, expected/χ² rounded to 6."""
    if len(arms) != len(weights) or not arms:
        raise ValueError("arms and weights must be equal-length, non-empty")
    total_w = sum(weights)
    spark = docs.sparkSession
    bounds, acc = [], 0
    for arm, w in zip(arms, weights):
        bounds.append((arm, acc, acc + w, w))
        acc += w
    from oracdc_spark.plans.literal import local_df

    # |arms|-row literal boundary table → LocalRelation, not a
    # Python-RDD scan (guide §4; same as the PQ codebook literals)
    arm_df = local_df(spark, bounds, "arm string, lo long, hi long, w long")
    coin = _hash32(F.concat(F.lit(salt + "|"), F.col("doc_id").cast("string")))
    assigned = docs.select((coin % total_w).alias("bucket"))
    observed = (
        assigned.join(
            F.broadcast(arm_df),
            (F.col("bucket") >= F.col("lo")) & (F.col("bucket") < F.col("hi")),
        )
        .groupBy("arm")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_obs"))
    )
    # left join from the arm table: an arm that received ZERO units
    # must still report (that is the most extreme SRM, not a missing row)
    counts = arm_df.join(observed, "arm", "left").select(
        "arm", "w", F.coalesce("n_obs", F.lit(0)).cast("bigint").alias("n_docs")
    )
    total = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))
    exp = F.col("n_total").cast("double") * F.col("w") / total_w
    chi2 = (F.col("n_docs").cast("double") - exp) * (
        F.col("n_docs").cast("double") - exp
    ) / exp
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "arm",
            "n_docs",
            F.round(exp, 6).alias("expected_docs"),
            # χ² is undefined when the expected count is 0 (an EMPTY
            # corpus): NULL, not an ANSI divide-by-zero (r9 funnel class)
            F.when(exp > 0, F.round(chi2, 6)).alias("chi2_component"),
        )
    )
