"""Document deduplication operators for training-data pipelines.

Designed for 100 TB corpora:

* exact dedup — one hash-groupBy shuffle on a 128-bit digest;
* n-gram Jaccard — shingle explode → self-join on shingle → pair counts;
  the join key is the shingle, so hot shingles are the skew risk — AQE
  skew-join splitting plus the DISTINCT-per-doc shingle set bound the blow
  up (stopword-only shingles are the classic failure; word-n-grams with
  n≥5 keep group sizes small);
* MinHash + LSH banding — signatures via per-seed min of md5(seed|shingle)
  (md5 is deliberate: deterministic, identical in any engine, so the
  DuckDB oracle reproduces signatures bit-for-bit); candidate pairs come
  from a band-bucket self-join, i.e. the pair join never touches the full
  document set, only band buckets;
* SimHash — 60-bit majority-vote fingerprint over token hashes, Hamming
  buckets for candidates (declared rows-only: bit ops aren't portable SQL).

All operators return DataFrames keyed by doc_id and are shuffle-minimal:
shingling is narrow, signatures aggregate map-side, and only candidate
pairs (tiny) ever reach a wide join.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def exact_dedup_groups(docs: DataFrame) -> DataFrame:
    """Exact-duplicate groups: md5(text) digest → group size + keeper
    (min doc_id). One shuffle; at scale use this digest as the bucketing
    key of the corpus table so re-runs are shuffle-free."""
    return (
        docs.groupBy(F.md5(F.col("text")).alias("digest"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("keeper_doc_id"),
        )
    )


def exact_dedup_keep(docs: DataFrame) -> DataFrame:
    """Corpus with exact duplicates removed (keep lowest doc_id)."""
    keepers = exact_dedup_groups(docs).select(F.col("keeper_doc_id").alias("doc_id"))
    return docs.join(keepers, "doc_id", "semi")


def _tokens(col: str = "text"):
    return F.filter(
        F.split(F.trim(F.col(col)), r"\s+"), lambda x: x != F.lit("")
    )


def _parallel(df: DataFrame) -> DataFrame:
    """Spread CPU-heavy per-row work across all cores when (and only
    when) the input has fewer partitions than cores — at real scale the
    source has thousands of splits and this is the identity (no extra
    exchange; see plans.parallel)."""
    from oracdc_spark.plans.parallel import ensure_parallelism

    return ensure_parallelism(df)


def shingles(docs: DataFrame, n: int = 5) -> DataFrame:
    """Distinct word n-gram shingles per document: (doc_id, shingle).
    Narrow (per-row explode), no shuffle.

    r12 (guide §4.1/§2.3 — per-row work): the token array is projected
    into a COLUMN before the shingle transform.  Higher-order functions
    are not codegen'd, and a lambda body that references the raw
    ``split(trim(text))`` expression re-evaluates the tokenizer per
    produced element — O(n_tokens²) splits per document.  Materializing
    the array once per row makes the lambda reference an attribute
    (CollapseProject keeps the projection: the alias is non-cheap and
    multiply-referenced).  Same output, ~2× faster shingle stage at
    sf0.1; the chunk_documents operator already used this shape."""
    w = F.col("w")
    # guard: F.sequence(1, k) with k < 1 would produce a DESCENDING sequence
    sh = F.when(
        F.size(w) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - (n - 1)),
            lambda i: F.array_join(F.slice(w, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        _parallel(docs)
        .select("doc_id", _tokens().alias("w"))
        .select("doc_id", F.explode(sh).alias("shingle"))
        .distinct()
    )


def jaccard_pairs(docs: DataFrame, n: int = 5, threshold: float = 0.5) -> DataFrame:
    """Near-duplicate pairs by exact n-gram Jaccard ≥ threshold.

    jaccard = |A∩B| / (|A|+|B|-|A∩B|); intersection via shingle self-join,
    set sizes via a per-doc count joined back on d1/d2. Output: (d1, d2,
    common, jac) with d1 < d2.

    Scale note: the per-doc count table is one row per DOCUMENT — it grows
    with the corpus, so it must NOT be broadcast (at 10⁹ docs that OOMs
    every executor).  The pairs aggregate already hash-partitions on
    d1/d2; the count joins co-partition on those same keys, and AQE still
    broadcasts when the corpus is genuinely small at runtime.
    """
    # no cache: the two self-join branches share one shuffle via
    # ReusedExchange (cache materialization measured 4× slower at sf0.1)
    sh = shingles(docs, n)
    counts = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    pairs = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    c1 = counts.select(F.col("doc_id").alias("d1"), F.col("n_sh").alias("n1"))
    c2 = counts.select(F.col("doc_id").alias("d2"), F.col("n_sh").alias("n2"))
    jac = F.col("common").cast("double") / (F.col("n1") + F.col("n2") - F.col("common"))
    return (
        pairs.join(c1, "d1")
        .join(c2, "d2")
        .withColumn("jac", F.round(jac, 4))
        .filter(F.col("jac") >= threshold)
        .select("d1", "d2", "common", "jac")
    )


def minhash_signatures(docs: DataFrame, n: int = 5, num_hashes: int = 8) -> DataFrame:
    """Wide MinHash signature: (doc_id, mh0..mh{k-1}) where
    mh_i = min over shingles of md5('<i>|'<shingle>), compared as hex
    strings — engine-portable and deterministic.

    Layout rationale (100 TB): all k mins are computed as k aggregate
    expressions over ONE groupBy(doc_id) — map-side partial aggregation,
    a single shuffle, no k-fold row explosion.  (A seed-exploded layout
    measured 3× slower at sf0.1.)
    """
    sh = shingles(docs, n)
    aggs = [
        F.min(
            F.md5(F.concat(F.lit(f"{i}|"), F.col("shingle")))
        ).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def banded_signatures(
    docs: DataFrame, n: int = 5, num_hashes: int = 8, bands: int = 4
) -> DataFrame:
    """(doc_id, band, band_sig): the MinHash signature split into
    `bands` bands of num_hashes/bands rows — the LSH index relation."""
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(docs, n, num_hashes)
    band_cols = []
    for b in range(bands):
        members = [F.col(f"mh{i}") for i in range(b * rows_per_band, (b + 1) * rows_per_band)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.concat_ws("|", *members).alias("band_sig"))
        )
    return sig.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bs")
    ).select("doc_id", F.col("bs.band").alias("band"), F.col("bs.band_sig").alias("band_sig"))


def minhash_lsh_candidates(
    docs: DataFrame, n: int = 5, num_hashes: int = 8, bands: int = 4
) -> DataFrame:
    """LSH candidate pairs: docs sharing any band value become candidates.

    The final pair join runs per band-bucket — at 100 TB the bucket
    groupBy is the only wide op and buckets are tiny (collision = near-dup
    likelihood by design).  Output: (d1, d2, n_shared_bands).
    """
    banded = banded_signatures(docs, n, num_hashes, bands)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )


def minhash_lsh_incremental(
    new_docs: DataFrame,
    indexed_docs: DataFrame,
    n: int = 5,
    num_hashes: int = 8,
    bands: int = 4,
) -> DataFrame:
    """Incremental LSH index maintenance: screen a NEW document batch
    against the already-indexed corpus without any corpus self-join —
    the daily-crawl-increment shape of near-dup dedup.

    The new batch's banded signatures join the stored index relation on
    (band, band_sig); at 100 TB the index side is the persisted
    :func:`banded_signatures` output, bucketed by band_sig so each
    increment's join is co-located and touches only colliding buckets.
    Corpus growth therefore costs O(batch), never O(corpus²) — and the
    emitted signatures of accepted docs ARE the index delta to append.

    Output: (new_doc_id, indexed_doc_id, n_shared_bands)."""
    a = banded_signatures(new_docs, n, num_hashes, bands).alias("a")
    b = banded_signatures(indexed_docs, n, num_hashes, bands).alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig")),
        )
        .groupBy(
            F.col("a.doc_id").alias("new_doc_id"),
            F.col("b.doc_id").alias("indexed_doc_id"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )


def dedup_decisions(pairs: DataFrame) -> DataFrame:
    """Near-dup pair list → per-document keep/drop decision: within each
    pair the smaller doc_id is the keeper; a doc dropped by any pair is
    dropped. Output: (doc_id, keeper_doc_id) for dropped docs — the
    delete-list a curation pipeline applies.

    One aggregation on d2 (the dropped side); at corpus scale the pair
    list is tiny relative to the corpus so this never shuffles the
    documents themselves."""
    return (
        pairs.groupBy(F.col("d2").alias("doc_id"))
        .agg(F.min("d1").alias("keeper_doc_id"))
    )


def simhash(docs: DataFrame, bits: int = 60) -> DataFrame:
    """60-bit SimHash per document (oracle-checked: DuckDB mirrors the
    bit twiddling via CAST('0x…' AS BIGINT) and >>/&/<< operators).

    token hash = first 15 hex chars of md5 (60 bits, fits a signed long);
    fingerprint bit b = 1 iff the majority of token hashes set bit b.
    Everything stays in JVM expressions (conv/shiftright) — no Python.
    """
    toks = _parallel(docs).select("doc_id", F.explode(_tokens()).alias("tok"))
    h = F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10).cast("bigint")
    bit = F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("b")
    per_bit = (
        toks.select("doc_id", h.alias("h"))
        .select("doc_id", "h", bit)
        .select("doc_id", "b", F.expr("shiftright(h, CAST(b AS INT)) & 1").alias("is_set"))
        .groupBy("doc_id", "b")
        .agg(F.sum("is_set").alias("ones"), F.count(F.lit(1)).alias("n"))
        .withColumn("bit_val", (F.col("ones") * 2 > F.col("n")).cast("bigint"))
    )
    return per_bit.groupBy("doc_id").agg(
        F.sum(F.expr("shiftleft(bit_val, CAST(b AS INT))")).alias("simhash")
    )


def simhash_candidates(
    docs: DataFrame, prefix_bits: int = 12, rotations: int = 1
) -> DataFrame:
    """Near-dup candidates: documents sharing the top ``prefix_bits``
    of their SimHash under ANY of ``rotations`` bit rotations (the
    standard multi-table SimHash trick — a single prefix misses pairs
    whose differing bits fall inside it; each rotation by 60/rotations
    bits re-buckets on a different bit span, and the candidate set is
    the union).  rotations=1 is the original single-prefix bucket.

    The rotation is exact int64-safe arithmetic: the low ``60-s`` bits
    shift up and the high ``s`` bits wrap — masked BEFORE shifting so
    nothing overflows the signed long (the hash occupies 60 bits).
    Scale: candidate generation stays bucket-bounded per rotation (the
    rotations multiply the bucket-join count, never the pair space);
    output deduplicated on (d1, d2)."""
    if rotations < 1:
        raise ValueError(f"rotations must be >= 1, got {rotations}")
    # r12 (guide §2.4/§5): the signature relation feeds every rotation's
    # bucket projection on BOTH sides of the self-join (2*rotations
    # consumers), and its producer is the token-explode × 60-bit
    # majority aggregate — the candidate plan re-derived that lineage
    # per consumer.  One doc-count-sized materialization runs it once.
    sig = simhash(docs).localCheckpoint(eager=False)
    parts = []
    for r in range(rotations):
        s = (r * 60) // rotations
        if s == 0:
            rot = F.col("simhash")
        else:
            low_mask = (1 << (60 - s)) - 1
            rot = F.shiftleft(
                F.col("simhash").bitwiseAND(F.lit(low_mask)), s
            ).bitwiseOR(F.shiftright(F.col("simhash"), 60 - s))
        bucket = F.shiftright(rot, 60 - prefix_bits)
        b = sig.select(
            "doc_id", F.lit(r).cast("bigint").alias("rot"), bucket.alias("bucket")
        )
        parts.append(b)
    allb = parts[0]
    for p in parts[1:]:
        allb = allb.unionAll(p)
    a2, b2 = allb.alias("a"), allb.alias("b")
    return (
        a2.join(
            b2,
            (F.col("a.rot") == F.col("b.rot"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .agg(F.min(F.col("a.bucket")).alias("bucket"))
    )


def dedup_clusters(docs: DataFrame, n: int = 5, threshold: float = 0.5) -> DataFrame:
    """Connected components over the near-duplicate pair graph:
    (doc_id, cluster_id) where cluster_id = min doc_id in the component
    — the "keep one per duplicate CLUSTER" decision (transitive: A~B,
    B~C ⇒ A,B,C share a cluster even if A≁C directly).

    Min-label propagation to fixpoint: each iteration one join+groupBy
    on the (tiny) pair-graph edge set; iteration count = component
    diameter (near-dup clusters are shallow).  Documents with no dup
    pair are their own singleton cluster.  Deterministic: the component
    minimum is order-independent.
    """
    pairs = jaccard_pairs(docs, n=n, threshold=threshold).select("d1", "d2")
    edges = pairs.unionAll(
        pairs.select(F.col("d2").alias("d1"), F.col("d1").alias("d2"))
    ).cache()

    # Iterate ONLY over nodes that appear in the pair graph: the label
    # frontier is |dup nodes| (tiny — bounded by pair count), not the
    # corpus.  The round-1 form joined the full corpus label table every
    # iteration — a corpus-sized shuffle per hop that dominates at scale;
    # singletons need no propagation and are attached once at the end.
    labels = (
        edges.select(F.col("d1").alias("doc_id")).distinct()
        .withColumn("cluster_id", F.col("doc_id"))
        .cache()
    )
    while True:
        nb_min = (
            edges.join(labels, edges["d2"] == labels["doc_id"])
            .groupBy("d1")
            .agg(F.min("cluster_id").alias("nb_min"))
        )
        new_labels = (
            labels.join(nb_min, labels["doc_id"] == nb_min["d1"], "left")
            .select(
                "doc_id",
                F.least(
                    F.col("cluster_id"), F.coalesce(F.col("nb_min"), F.col("cluster_id"))
                ).alias("cluster_id"),
            )
            .cache()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.cluster_id") != F.col("o.cluster_id"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    # singletons (no dup pair) are their own cluster — one final join
    return docs.select("doc_id").join(labels, "doc_id", "left").select(
        "doc_id", F.coalesce("cluster_id", "doc_id").alias("cluster_id")
    )


def dedup_canonical(
    docs: DataFrame, n: int = 5, threshold: float = 0.5
) -> DataFrame:
    """Canonical-representative selection: ONE kept document per
    near-dup cluster — the step that turns dedup_clusters' labeling
    into an actual deduplicated corpus.  Keeps the LONGEST member
    (max n_chars, ties to the lowest doc_id) — the common web-curation
    heuristic (the longest variant usually subsumes its truncated
    copies); swap the ORDER BY for a quality score to keep the
    best-scored member instead, the plan is identical.

    Output: (doc_id, cluster_id, n_chars, n_members) — one row per
    cluster; singletons keep themselves with n_members = 1.

    Scale shape: dedup_clusters' label propagation (pair-graph-sized
    frontier) + one broadcastable join of the label table against the
    corpus metadata + one cluster-keyed window; both window functions
    (rank, member count) share a single exchange/sort."""
    clusters = dedup_clusters(docs, n=n, threshold=threshold)
    joined = clusters.join(docs.select("doc_id", "n_chars"), "doc_id")
    w = Window.partitionBy("cluster_id")
    wr = w.orderBy(F.col("n_chars").desc(), "doc_id")
    return (
        joined.withColumn("rk", F.row_number().over(wr))
        .withColumn("n_members", F.count(F.lit(1)).over(w).cast("bigint"))
        .filter(F.col("rk") == 1)
        .select(
            "doc_id",
            "cluster_id",
            F.col("n_chars").cast("bigint").alias("n_chars"),
            "n_members",
        )
    )


def sample_by_hash(docs: DataFrame, prefix_lt: str = "1a") -> DataFrame:
    """Deterministic corpus sampling for training-data curation: keep a
    document iff the md5 of (doc_id, text) is lexicographically below the
    given hex prefix — e.g. '1a' keeps ≈ 26/256 ≈ 10.2%.  Stable across
    runs, engines, partitionings; no RNG, no shuffle (narrow filter,
    pushes no state anywhere)."""
    digest = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|"), F.col("text")))
    return docs.filter(F.substring(digest, 1, len(prefix_lt)) < prefix_lt)


def lsh_recall_audit(
    docs: DataFrame, n: int = 5, threshold: float = 0.5,
    num_hashes: int = 8, bands: int = 4,
) -> DataFrame:
    """Index-quality audit for the banded MinHash-LSH index: what share
    of the exact n-gram-Jaccard near-dup pairs the candidate generation
    recovers (the dedup analog of sq8_recall / pq_recall — every
    approximate structure in the engine ships with its accuracy audit).

    Output is ONE row: (n_exact, n_candidates, n_hits, recall).  All
    three counts are exact-integer aggregates composed as 1-row cross
    joins — no driver-side collection; the expensive inputs (shingle
    self-join, band buckets) are the same plans the audited operators
    already run."""
    exact = jaccard_pairs(docs, n, threshold).select("d1", "d2")
    cand = minhash_lsh_candidates(docs, n, num_hashes, bands).select("d1", "d2")
    return _pair_recall_row(exact, cand)


def chunk_dedup_stats(docs: DataFrame, size: int = 16) -> DataFrame:
    """Cross-document repeated-passage statistics — the passage-level
    exact dedup signal (RefinedWeb, Penedo et al. 2023, arXiv:2306.01116
    §3.3: repeated spans are removed at sub-document granularity because
    boilerplate survives document-level dedup).  Documents split into
    NON-overlapping ``size``-token windows (stride = size); a window is
    DUPLICATED if its digest occurs in ≥ 2 distinct documents.

    Output: (doc_id, n_chunks, n_dup_chunks, dup_chunk_frac) — the
    per-document fraction a curation gate thresholds on.

    Scale shape (100 TB): chunking is a pure narrow map
    (:func:`oracdc_spark.operators.sampling.chunk_documents`); the digest
    table is ONE map-side-combined groupBy on the md5 key (uniformly
    distributed — no skew), joined back on the same key, then one doc_id
    aggregate.  Never a pair join, never all-pairs."""
    from oracdc_spark.operators.sampling import chunk_documents

    ch = chunk_documents(docs, size=size, stride=size).select(
        "doc_id", F.md5("chunk_text").alias("dig")
    )
    counts = ch.groupBy("dig").agg(F.countDistinct("doc_id").alias("nd"))
    per_doc = (
        ch.join(counts, "dig")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0))
            .cast("bigint")
            .alias("n_dup_chunks"),
        )
    )
    return per_doc.select(
        "doc_id",
        F.col("n_chunks").cast("bigint").alias("n_chunks"),
        "n_dup_chunks",
        F.round(
            F.col("n_dup_chunks").cast("double") / F.col("n_chunks"), 6
        ).alias("dup_chunk_frac"),
    )


def simhash_recall_audit(
    docs: DataFrame, n: int = 5, threshold: float = 0.5, prefix_bits: int = 12,
    rotation_counts: tuple[int, ...] = (1, 3),
) -> DataFrame:
    """Index-quality audit for the SimHash prefix-bucket candidate
    generator — the last approximate structure in the dedup family to
    get its accuracy row (same discipline as lsh_recall_audit /
    sq8_recall / pq_recall): what share of the exact n-gram-Jaccard
    near-dup pairs the single-rotation prefix buckets recover.

    Output is one row PER rotation count in ``rotation_counts``
    ((rotations, n_exact, n_candidates, n_hits, recall)) so the audit
    quantifies the multi-table lift directly.  All counts are
    exact-integer aggregates composed as 1-row cross joins, no
    driver-side collection; the expensive inputs are the same plans the
    audited operators already run."""
    exact = jaccard_pairs(docs, n, threshold).select("d1", "d2")
    rows = None
    for rc in rotation_counts:
        cand = simhash_candidates(docs, prefix_bits, rc).select("d1", "d2")
        row = _pair_recall_row(exact, cand).select(
            F.lit(rc).cast("bigint").alias("rotations"),
            "n_exact", "n_candidates", "n_hits", "recall",
        )
        rows = row if rows is None else rows.unionAll(row)
    return rows


def _pair_recall_row(exact: DataFrame, cand: DataFrame) -> DataFrame:
    """Shared audit-row shape: 1-row (n_exact, n_candidates, n_hits,
    recall) via broadcast-free 1-row crossJoins; recall defined as 1.0
    on a zero-exact-pair corpus.

    r12 (guide §2.4): both inputs are consumed twice (their own count +
    the hits join), and each producer is an expensive plan (the shingle
    self-join / the band-bucket self-join).  One pair-list-sized
    checkpoint per input halves the audit's heavy work; A/B for
    dedup_lsh_recall at sf0.1 (min of 3 warm probes) 3.5 → 2.2 s, plan
    88 → ~30 Exchanges."""
    exact = exact.localCheckpoint(eager=False)
    cand = cand.localCheckpoint(eager=False)
    ne = exact.agg(F.count(F.lit(1)).alias("n_exact"))
    nc = cand.agg(F.count(F.lit(1)).alias("n_candidates"))
    nh = exact.join(cand, ["d1", "d2"]).agg(F.count(F.lit(1)).alias("n_hits"))
    return (
        ne.crossJoin(nc)
        .crossJoin(nh)
        .select(
            "n_exact", "n_candidates", "n_hits",
            F.when(
                F.col("n_exact") > 0,
                F.round(F.col("n_hits").cast("double") / F.col("n_exact"), 6),
            ).otherwise(F.lit(1.0)).alias("recall"),
        )
    )


def minhash_estimate_audit(
    docs: DataFrame, n: int = 5, num_hashes: int = 8, bands: int = 4
) -> DataFrame:
    """MinHash accuracy audit: over the LSH candidate pairs, compare
    the signature-based Jaccard ESTIMATE (fraction of equal signature
    components — the statistic MinHash exists to provide) against the
    exact shingle Jaccard, as ppm-quantized integers so the error
    aggregates exactly (no float-summation order, the engine's
    standard determinism contract).

    One row: (n_pairs, mean_est_ppm, mean_exact_ppm, mean_abs_err_ppm,
    max_abs_err_ppm).  Expected |err| ~ sqrt(p(1-p)/k) ≈ 0.17 at k=8 —
    the audit makes the k-vs-accuracy trade measurable before anyone
    raises num_hashes corpus-wide.  Scale: candidates are the audited
    LSH family's bounded bucket joins; exact Jaccard is computed ONLY
    for candidate pairs via the shingle-keyed join (never all pairs)."""
    cand = minhash_lsh_candidates(docs, n, num_hashes, bands).select("d1", "d2")
    sig = minhash_signatures(docs, n, num_hashes)
    s1 = sig.select(
        F.col("doc_id").alias("d1"),
        *[F.col(f"mh{i}").alias(f"a{i}") for i in range(num_hashes)],
    )
    s2 = sig.select(
        F.col("doc_id").alias("d2"),
        *[F.col(f"mh{i}").alias(f"b{i}") for i in range(num_hashes)],
    )
    eq = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(num_hashes)
    )
    est = (
        cand.join(s1, "d1")
        .join(s2, "d2")
        .select(
            "d1",
            "d2",
            F.expr(f"CAST({1_000_000} AS BIGINT)").alias("_sc"),
            F.lit(num_hashes).alias("_k"),
            eq.cast("bigint").alias("n_eq"),
        )
        .select(
            "d1",
            "d2",
            F.expr("_sc * n_eq div _k").cast("bigint").alias("est_ppm"),
        )
    )
    sh = shingles(docs, n)
    a = sh.select(F.col("doc_id").alias("d1"), "shingle")
    b = sh.select(F.col("doc_id").alias("d2"), "shingle")
    inter = (
        a.join(cand, "d1")
        .join(b, ["d2", "shingle"])
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    counts = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    exact = (
        inter.join(counts.withColumnRenamed("doc_id", "d1"), "d1")
        .withColumnRenamed("n_sh", "c1")
        .join(counts.withColumnRenamed("doc_id", "d2"), "d2")
        .withColumnRenamed("n_sh", "c2")
        .select(
            "d1",
            "d2",
            F.expr("CAST(1000000 AS BIGINT) * n_inter div (c1 + c2 - n_inter)")
            .cast("bigint")
            .alias("exact_ppm"),
        )
    )
    per_pair = est.join(exact, ["d1", "d2"]).select(
        "est_ppm",
        "exact_ppm",
        F.abs(F.col("est_ppm") - F.col("exact_ppm")).alias("err_ppm"),
    )
    return per_pair.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.round(F.avg("est_ppm"), 1).alias("mean_est_ppm"),
        F.round(F.avg("exact_ppm"), 1).alias("mean_exact_ppm"),
        F.round(F.avg("err_ppm"), 1).alias("mean_abs_err_ppm"),
        F.max("err_ppm").cast("bigint").alias("max_abs_err_ppm"),
    )


def dedup_clusters_fast(
    docs: DataFrame, n: int = 5, threshold: float = 0.5, max_iters: int = 50
) -> DataFrame:
    """Connected components in O(log diameter) rounds: min-label
    propagation WITH POINTER-JUMPING SHORTCUTS (the Shiloach-Vishkin
    shortcut step; same round complexity as the large-star/small-star
    family, Kiveris et al. SoCC 2014) — the extreme-scale complement to
    :func:`dedup_clusters`, whose plain propagation needs O(diameter)
    rounds: a pathological million-doc boilerplate CHAIN finishes in
    ~20 rounds here instead of ~1e6.

    Each round: (1) hook — l(u) <- min(l(u), min over neighbors v of
    l(v)) (one edge join + groupBy, exactly the propagation step);
    (2) shortcut — l(u) <- l(l(u)) (one self-join of the label table:
    labels chase their parent's label, halving chain depth).  Labels
    only ever decrease and always name a node of the same component,
    so the fixpoint is the component minimum — IDENTICAL output to
    dedup_clusters (asserted in tests, including a deep chain).
    The per-round convergence aggregate (the monotone label SUM — see
    inline note) is the lazy-builder gate's bounded convergence-decision
    exception.

    Scale shape: both steps are pair-graph-sized (never corpus-sized)
    shuffles; the label table is |dup nodes| rows; singletons attach in
    one final left join."""
    pairs = jaccard_pairs(docs, n=n, threshold=threshold).select("d1", "d2")
    edges = pairs.unionAll(
        pairs.select(F.col("d2").alias("d1"), F.col("d1").alias("d2"))
    ).cache()
    labels = (
        edges.select(F.col("d1").alias("doc_id")).distinct()
        .withColumn("cluster_id", F.col("doc_id"))
        .localCheckpoint(eager=True)
    )
    # convergence statistic: labels only ever DECREASE, so the label
    # SUM is strictly monotone — an unchanged sum ⟺ no label moved.
    # One aggregate over the just-materialized table per round, vs the
    # old-vs-new join the previous form paid (one fewer shuffle/round).
    label_sum = labels.agg(F.sum("cluster_id")).collect()[0][0]
    for _ in range(max_iters):
        # (1) hook: min over own label and neighbors' labels
        nb_min = (
            edges.join(labels, edges["d2"] == labels["doc_id"])
            .groupBy("d1")
            .agg(F.min("cluster_id").alias("nb_min"))
        )
        hooked = (
            labels.join(nb_min, labels["doc_id"] == nb_min["d1"], "left")
            .select(
                "doc_id",
                F.least(
                    F.col("cluster_id"),
                    F.coalesce(F.col("nb_min"), F.col("cluster_id")),
                ).alias("cluster_id"),
            )
        )
        # (2) shortcut: chase the parent's label (halves chain depth)
        parent = hooked.select(
            F.col("doc_id").alias("p_id"), F.col("cluster_id").alias("p_label")
        )
        # localCheckpoint (not cache): the shortcut self-join references
        # the previous level TWICE, so without severing the lineage the
        # logical plan doubles every round (2^rounds analysis blow-up);
        # an eager local checkpoint truncates the plan each iteration
        new_labels = (
            hooked.join(parent, hooked["cluster_id"] == parent["p_id"], "left")
            .select(
                "doc_id",
                F.least(
                    F.col("cluster_id"),
                    F.coalesce(F.col("p_label"), F.col("cluster_id")),
                ).alias("cluster_id"),
            )
            .localCheckpoint(eager=True)
        )
        new_sum = new_labels.agg(F.sum("cluster_id")).collect()[0][0]
        labels = new_labels
        if new_sum == label_sum:
            break
        label_sum = new_sum
    edges.unpersist()
    return docs.select("doc_id").join(labels, "doc_id", "left").select(
        "doc_id", F.coalesce("cluster_id", "doc_id").alias("cluster_id")
    )


def content_chunk_dedup_stats(
    docs: DataFrame, gram: int = 3, modulus: int = 16
) -> DataFrame:
    """Passage-level dedup statistics over CONTENT-DEFINED chunks — the
    shift-resistant complement of :func:`chunk_dedup_stats`.  Fixed-
    stride windows miss a repeated passage whenever an insertion shifts
    its alignment by one token; content-defined chunking (the rsync /
    FastCDC boundary trick, here at token granularity) cuts after token
    ``i`` iff the hash of the ``gram``-token window ending at ``i``
    is ≡ 0 (mod ``modulus``), so chunk boundaries move WITH the
    content: an edit perturbs only the chunks it touches and identical
    passages elsewhere re-align to identical digests (mean chunk length
    ≈ ``modulus`` tokens; pure hash boundaries, no min/max clamp —
    documented simplification of FastCDC's normalized chunking).

    Output matches chunk_dedup_stats: (doc_id, n_chunks, n_dup_chunks,
    dup_chunk_frac) — a chunk is duplicated iff its digest occurs in
    ≥ 2 distinct documents.

    Scale shape (100 TB): ONE doc_id exchange carries the whole
    chunking stage — the rolling gram is a lag window, the running
    boundary count a prefix-sum window, and the (doc_id, chunk)
    reassembly groupBy is subset-satisfied by the same hash(doc_id)
    partitioning (no second exchange); then the digest table is one
    map-side-combined groupBy on the uniform md5 key joined back on
    itself, exactly the audited chunk_dedup_stats tail.  Never a pair
    join, never all-pairs."""
    from oracdc_spark.operators.textops import _gram_hash

    toks = _parallel(docs).select(
        "doc_id", F.posexplode(_tokens()).alias("pos", "tok")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    gram_text = F.concat_ws(
        " ", *[F.lag("tok", gram - 1 - j).over(w) for j in range(gram - 1)], F.col("tok")
    )
    marked = toks.withColumn(
        "mark",
        F.when(
            (F.col("pos") >= gram - 1) & (_gram_hash(gram_text) % modulus == 0), 1
        ).otherwise(0),
    )
    chunked = marked.withColumn(
        "chunk",
        F.coalesce(
            F.sum("mark").over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ),
    )
    ch = chunked.groupBy("doc_id", "chunk").agg(
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s["tok"],
                ),
                " ",
            )
        ).alias("dig")
    )
    # r12 (guide §2.4/§5): the chunk-digest relation feeds TWO consumers
    # — the df-count aggregate and the join-back — and its producer is
    # the full tokenize→posexplode→lag/prefix-sum windows→collect_list
    # reassembly chain; only the doc_id Exchange of that chain is
    # runtime-reused across the branches, so the window evaluation and
    # the reassembly aggregate ran twice.  One chunk-count-sized
    # materialization runs the chunker once (same multi-consumer
    # pattern as the wave-1 gram/posting tables).
    ch = ch.localCheckpoint(eager=False)
    counts = ch.groupBy("dig").agg(F.countDistinct("doc_id").alias("nd"))
    return (
        ch.join(counts, "dig")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
            F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0))
            .cast("bigint")
            .alias("n_dup_chunks"),
        )
        .select(
            "doc_id",
            "n_chunks",
            "n_dup_chunks",
            F.round(
                F.col("n_dup_chunks").cast("double") / F.col("n_chunks"), 6
            ).alias("dup_chunk_frac"),
        )
    )


# TF-IDF posting lists persisted once per (corpus plan, n, df bounds)
# within a session — shared by the three consumers inside ONE build and
# by repeat builds (same convention as similarity._EXACT_CACHE).
_POST_CACHE: dict[tuple, "DataFrame"] = {}


def tfidf_cosine_pairs(
    docs: DataFrame,
    n: int = 3,
    df_min: int = 2,
    df_max: int = 1000,
    threshold: float = 0.04,
) -> DataFrame:
    """Sparse TF-IDF cosine near-dup pairing via a df-bounded inverted
    index — the sparse-vector complement to the dense
    ``similarity.embedding_near_dups`` path (Bayardo, Ma & Srikant,
    "Scaling Up All Pairs Similarity Search", WWW 2007: bound the
    per-term posting list instead of comparing all pairs).

    Terms are word n-gram shingles WITH term frequency (unlike the
    set-semantics :func:`shingles`); per-doc-term weight is
    ``round(tf · ln(1 + N/df) · 1000)`` as BIGINT — the engine's
    quantize-before-aggregate determinism convention — so dot products
    and norms are exact integer sums and the only IEEE step is the one
    final division.  Score is the squared-cosine form of the shared
    quantized-cosine contract: ``dot² / (n1·n2)``, rounded to 6.

    Scale shape: the ONLY superlinear stage is the per-term posting
    self-join, bounded by Σ_kept-terms df² — the ``df_max`` cap is the
    operator's scale lever (a term in more than df_max docs is
    boilerplate with near-zero idf; dropping it is the blunt form of
    Bayardo's prefix filter).  df_min=2 drops unpairable singleton
    terms before the join.  Everything else: one (doc, term) tf
    aggregate, one vocab-sized df aggregate, a (d1, d2) pair aggregate,
    and doc-count-sized norm joins that co-partition with the pair keys
    (NOT broadcast — one row per document).  The corpus count N is a
    lazy 1-row broadcast aggregate.

    Output: (d1, d2, n_shared_terms, score) with d1 < d2,
    score ≥ threshold."""
    # token array projected to a column before the gram transform —
    # see shingles() (r12): lambda references to the raw split
    # expression re-tokenize per element, O(n_tokens²) per document
    w = F.col("w")
    sh = F.when(
        F.size(w) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - (n - 1)),
            lambda i: F.array_join(F.slice(w, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    tf = (
        _parallel(docs)
        .select("doc_id", _tokens().alias("w"))
        .select("doc_id", F.explode(sh).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    dfq = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("df"))
        .filter((F.col("df") >= df_min) & (F.col("df") <= df_max))
    )
    total = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    post = (
        tf.join(dfq, "term")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf")
                * F.log(F.lit(1.0) + F.col("n").cast("double") / F.col("df"))
                * 1000
            )
            .cast("bigint")
            .alias("w"),
        )
    )
    # The weighted posting list feeds THREE consumers (norms + both
    # self-join sides), each of which would otherwise recompute the
    # explode→tf→df→weight chain (AQE's runtime stage reuse does not
    # cover it — the branches shuffle on different keys).  A lazy
    # session-cached persist materializes it once: A/B at sf0.1,
    # 5.7-6.8 s → 4.1-5.1 s steady state.  Keyed like similarity's
    # _EXACT_CACHE; a production run would checkpoint the posting list
    # (it is the index artifact the serving path reuses anyway).
    try:
        pkey = (docs.semanticHash(), n, df_min, df_max)
    except Exception:
        pkey = None
    if pkey is not None:
        if pkey in _POST_CACHE:
            post = _POST_CACHE[pkey]
        else:
            post = post.persist()
            _POST_CACHE[pkey] = post
    norms = post.groupBy("doc_id").agg(F.sum(F.col("w") * F.col("w")).alias("n2"))
    a, b = post.alias("a"), post.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.term") == F.col("b.term"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shared_terms"),
            F.sum(F.col("a.w") * F.col("b.w")).alias("dot"),
        )
    )
    score = F.round(
        (F.col("dot").cast("double") * F.col("dot").cast("double"))
        / (F.col("na").cast("double") * F.col("nb").cast("double")),
        6,
    )
    return (
        pairs.join(norms.select(F.col("doc_id").alias("d1"), F.col("n2").alias("na")), "d1")
        .join(norms.select(F.col("doc_id").alias("d2"), F.col("n2").alias("nb")), "d2")
        .withColumn("score", score)
        .filter(F.col("score") >= threshold)
        .select("d1", "d2", "n_shared_terms", "score")
    )


def containment_pairs(
    docs: DataFrame, n: int = 5, threshold: float = 0.8
) -> DataFrame:
    """Asymmetric shingle containment (Broder 1997's *containment*
    companion to Jaccard *resemblance*): ``c(A→B) = |A∩B| / |A|``
    detects SUB-document duplication — a doc whose shingle set is
    mostly inside another's (quote farms, wrapper pages, excerpt spam)
    scores high here while symmetric Jaccard stays low because the
    union is dominated by the larger doc.

    Same shingle self-join + per-doc count joins as
    :func:`jaccard_pairs` (one candidate-pair aggregate, count joins
    co-partitioned on the pair keys, never broadcast); the only change
    is the denominator, so the operator inherits jaccard's scale
    bounds.  A pair is emitted when EITHER direction clears the
    threshold; both directions are reported.

    Output: (d1, d2, common, c1_in_2, c2_in_1) with d1 < d2, rounded
    to 4."""
    sh = shingles(docs, n)
    counts = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    c1 = counts.select(F.col("doc_id").alias("d1"), F.col("n_sh").alias("n1"))
    c2 = counts.select(F.col("doc_id").alias("d2"), F.col("n_sh").alias("n2"))
    c12 = F.round(F.col("common").cast("double") / F.col("n1"), 4)
    c21 = F.round(F.col("common").cast("double") / F.col("n2"), 4)
    return (
        pairs.join(c1, "d1")
        .join(c2, "d2")
        .withColumn("c1_in_2", c12)
        .withColumn("c2_in_1", c21)
        .filter(
            (F.col("c1_in_2") >= threshold) | (F.col("c2_in_1") >= threshold)
        )
        .select("d1", "d2", "common", "c1_in_2", "c2_in_1")
    )


PLANT_OFFSET = 1_000_000_000


def method_capture_matrix(docs: DataFrame) -> DataFrame:
    """Cross-method planted-twin capture matrix — one synthesis row per
    dedup method (the dedup-family analogue of the ANN label-purity
    audit): every 7th document gets a NEAR-duplicate twin (its last
    token dropped, id + PLANT_OFFSET), and each method's candidate/pair
    surface is scored on how many (original, twin) pairs it captures.

    What the matrix shows by construction: exact-digest capture ≈ 0
    (the twin is a near-dup, not a byte-dup — the honest baseline),
    the shingle/tfidf methods capture long docs (a dropped token
    perturbs one shingle window), and the probabilistic methods
    (MinHash-LSH bands, SimHash prefixes) land in between — their gap
    vs exact-Jaccard IS the banding recall the per-method audits
    measure, here on a common planted operating point.

    Methods and their declared operating points: exact digest;
    jaccard_pairs(n=5, t=0.5); minhash_lsh_candidates(8 hashes,
    4 bands); simhash_candidates(12-bit prefix, 3 rotations);
    tfidf_cosine_pairs(default); containment_pairs(default).

    Scale: each method keeps its own documented bounds; the planted
    relation is ≤ 8/7 of the corpus, and the capture join is
    planted-pair-sized.  The id-space guard raises if any real doc_id
    reaches PLANT_OFFSET.  Output: (method, n_planted, n_captured,
    capture) — 6 rows."""
    base = docs.select("doc_id", "text")
    src = base.filter(F.col("doc_id") % 7 == 0)
    twins = src.select(
        (F.col("doc_id") + PLANT_OFFSET).alias("doc_id"),
        F.regexp_replace(F.trim(F.col("text")), r"\s+\S+$", "").alias("text"),
    )
    pdocs = base.unionAll(twins)
    expected = src.select(
        F.col("doc_id").alias("a"),
        (F.col("doc_id") + PLANT_OFFSET).alias("b"),
    )
    n_planted = (
        base.agg(
            F.max("doc_id").alias("_mx"),
            F.sum((F.col("doc_id") % 7 == 0).cast("bigint")).alias("_n"),
        )
        .select(
            F.when(
                F.col("_mx") >= PLANT_OFFSET,
                F.raise_error(
                    F.lit(
                        "method_capture_matrix: doc_id >= PLANT_OFFSET — "
                        "planted ids would collide with real ids"
                    )
                ).cast("bigint"),
            )
            .otherwise(F.col("_n"))
            .alias("n_planted")
        )
    )
    dg = pdocs.select("doc_id", F.md5("text").alias("dg"))
    exact_pairs = (
        dg.alias("x")
        .join(
            dg.alias("y"),
            (F.col("x.dg") == F.col("y.dg"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("d1"), F.col("y.doc_id").alias("d2"))
    )
    methods = [
        ("exact", exact_pairs),
        ("jaccard", jaccard_pairs(pdocs, n=5, threshold=0.5)),
        ("minhash_lsh", minhash_lsh_candidates(pdocs, n=5, num_hashes=8, bands=4)),
        ("simhash", simhash_candidates(pdocs, prefix_bits=12, rotations=3)),
        ("tfidf_cosine", tfidf_cosine_pairs(pdocs)),
        ("containment", containment_pairs(pdocs)),
    ]
    out = None
    for name, pairs in methods:
        cap = (
            expected.join(
                pairs.select("d1", "d2"),
                (F.col("a") == F.col("d1")) & (F.col("b") == F.col("d2")),
                "semi",
            )
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_captured"))
        )
        row = (
            n_planted.crossJoin(F.broadcast(cap))
            .select(
                F.lit(name).alias("method"),
                "n_planted",
                "n_captured",
                F.round(
                    F.col("n_captured").cast("double") / F.col("n_planted"), 4
                ).alias("capture"),
            )
        )
        out = row if out is None else out.unionAll(row)
    return out


def dedup_canonical_quality(
    docs: DataFrame, n: int = 5, threshold: float = 0.5
) -> DataFrame:
    """Quality-ranked canonical selection — :func:`dedup_canonical`
    with the documented ORDER BY swap applied: keep the most lexically
    RICH member per near-dup cluster (max distinct tokens, then max
    chars, then lowest doc_id) instead of merely the longest.  Catches
    the case the length heuristic gets wrong: a spam variant padded
    with repeated boilerplate outlengths the clean original but cannot
    out-distinct it.

    Same plan as dedup_canonical: the label propagation + one metadata
    join + one cluster-keyed window; the quality key (distinct-token
    count) is exact integer codegen per row.

    Output: (doc_id, cluster_id, n_distinct, n_members)."""
    clusters = dedup_clusters(docs, n=n, threshold=threshold)
    stats = docs.select(
        "doc_id",
        F.size(F.array_distinct(_tokens())).cast("bigint").alias("n_distinct"),
        F.length("text").cast("bigint").alias("n_chars"),
    )
    joined = clusters.join(stats, "doc_id")
    w = Window.partitionBy("cluster_id")
    wr = w.orderBy(
        F.col("n_distinct").desc(), F.col("n_chars").desc(), "doc_id"
    )
    return (
        joined.withColumn("rk", F.row_number().over(wr))
        .withColumn("n_members", F.count(F.lit(1)).over(w).cast("bigint"))
        .filter(F.col("rk") == 1)
        .select("doc_id", "cluster_id", "n_distinct", "n_members")
    )
