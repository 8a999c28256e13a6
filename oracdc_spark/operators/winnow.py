"""Winnowing fingerprints — substring-overlap near-duplicate detection
(Schleimer, Wilkerson, Aiken: "Winnowing: Local Algorithms for Document
Fingerprinting", SIGMOD 2003 — the MOSS algorithm).

Where MinHash approximates whole-document Jaccard and SimHash hamming-
packs a token distribution, winnowing guarantees POSITIONAL coverage:
any shared substring of at least w+k-1 tokens between two documents
shares at least one selected fingerprint.  That makes it the detector
for *partial* overlap — boilerplate headers, quoted passages, copied
paragraphs — which whole-document sketches dilute away.

Deterministic restatement: k-token shingle hashes by position, then each
length-w window of consecutive positions contributes its MINIMUM hash
(plain window-min — the classic rightmost-tie rule only thins the
selection further; the distinct-minima set keeps the same coverage
guarantee and is order-free, hence engine-portable).  Selected
fingerprints are distinct per doc; candidate pairs join only within a
fingerprint bucket.

Scale shape: explode (narrow) → ONE doc_id window (same single shuffle
as any per-doc ranking) → distinct → bucket self-join.  Hot fingerprints
(boilerplate shared by thousands of docs) would square a bucket, so
`max_df` drops fingerprints seen in more than that many documents first
— the standard stop-gram guard, same rationale as the LSH hot-shingle
cap (SCALING.md).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from oracdc_spark.operators.textops import _gram_hash, _parallel, _tokens

WINNOW_K = 3  # tokens per shingle
WINNOW_W = 4  # window length in positions


def winnow_fingerprints(docs: DataFrame, k: int = WINNOW_K, w: int = WINNOW_W) -> DataFrame:
    """Distinct winnowing-selected fingerprints per document:
    (doc_id, fp).  Documents shorter than k tokens select nothing."""
    # token array projected to a column before the gram transform —
    # see dedup.shingles() (r12): lambda references to the raw split
    # expression re-tokenize per element, O(n_tokens²) per document
    toks = F.col("w")
    grams = F.when(
        F.size(toks) >= k,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (k - 1)),
            lambda i: F.lower(
                F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(k)])
            ),
        ),
    ).otherwise(F.array())
    pos = (
        _parallel(docs)
        .select("doc_id", _tokens().alias("w"))
        .select("doc_id", F.posexplode(grams).alias("pos", "gram"))
        .select("doc_id", "pos", _gram_hash(F.col("gram")).alias("h"))
    )
    win = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, w - 1)
    )
    # the last w-1 positions open truncated windows; dropping them keeps
    # the guarantee (every full window is represented) and matches the
    # paper's window count of m - k - w + 2
    sel = (
        pos.withColumn("n_pos", F.count(F.lit(1)).over(Window.partitionBy("doc_id")))
        .withColumn("win_min", F.min("h").over(win))
        .filter(F.col("pos") <= F.col("n_pos") - w)
        .select("doc_id", F.col("win_min").alias("fp"))
        .distinct()
    )
    return sel


def dup_span_fraction(docs: DataFrame, span: int = 8) -> DataFrame:
    """Per-document cross-document duplication: the fraction of a doc's
    `span`-token windows whose exact token sequence also occurs in at
    least one OTHER document — the curation metric behind exact-substring
    dedup (Lee et al. 2022, "Deduplicating Training Data Makes Language
    Models Better": docs dominated by cross-corpus duplicated spans get
    trimmed or dropped).

    Exact, not sketched: every span is hashed and counted; one gram
    groupBy (distinct-doc count) + one join back.  The gram table is
    corpus-positions-sized but narrow (doc_id, hash), and both shuffles
    key on the gram hash — uniform by construction.
    Output: (doc_id, n_spans, n_dup_spans, dup_fraction)."""
    # token array projected to a column first (see dedup.shingles, r12)
    toks = F.col("w")
    grams = F.when(
        F.size(toks) >= span,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (span - 1)),
            lambda i: F.lower(
                F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(span)])
            ),
        ),
    ).otherwise(F.array())
    # the gram table feeds the distinct-doc count AND the join back —
    # materialized once (guide §2.4); the narrow (doc_id, h) layout
    # keeps the checkpoint metadata-cheap relative to re-tokenizing
    g = (
        _parallel(docs)
        .select("doc_id", _tokens().alias("w"))
        .select("doc_id", F.explode(grams).alias("gram"))
        .select("doc_id", _gram_hash(F.col("gram")).alias("h"))
        .localCheckpoint(eager=False)
    )
    docs_per_gram = g.groupBy("h").agg(
        F.count_distinct("doc_id").alias("n_docs")
    )
    return (
        g.join(docs_per_gram, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_spans"),
            F.sum(F.when(F.col("n_docs") >= 2, 1).otherwise(0))
            .cast("bigint")
            .alias("n_dup_spans"),
            F.round(
                F.sum(F.when(F.col("n_docs") >= 2, 1).otherwise(0)).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("dup_fraction"),
        )
    )


def winnow_candidates(docs: DataFrame, max_df: int = 50) -> DataFrame:
    """Document pairs sharing winnowing fingerprints:
    (doc_a, doc_b, n_shared), n_shared >= 2.  Fingerprints present in
    more than `max_df` documents are dropped before the self-join (the
    stop-gram guard — they carry no discrimination and would square
    their bucket)."""
    # the fingerprint relation feeds the df guard AND the bucket join —
    # materialized once (guide §2.4; it is also the persisted index
    # artifact at production scale)
    fps = winnow_fingerprints(docs).localCheckpoint(eager=False)
    df_counts = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("df"))
    rare = fps.join(df_counts.filter(F.col("df") <= max_df), "fp").select("doc_id", "fp")
    a = rare.select(F.col("doc_id").alias("doc_a"), "fp")
    b = rare.select(F.col("doc_id").alias("doc_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
    )


def exact_substr_trim(docs: DataFrame, span: int = 8) -> DataFrame:
    """ExactSubstr REMOVAL (Lee et al. 2022 §4.1): cut every token
    covered by a cross-document duplicated ``span``-token window and
    reconstruct the cleaned text — the operator behind
    :func:`dup_span_fraction`'s metric (the paper removes the
    duplicated substring from all but one occurrence; this variant
    removes it everywhere, the stricter form used when memorized spans
    must not survive at all — boilerplate, licenses, chain letters).

    Pipeline: window hashes as in dup_span_fraction (lowercased grams,
    15-hex-digit md5 bigint), dup = hash in >= 2 distinct docs, covered
    token positions = union of p..p+span-1 over each doc's dup windows,
    cleaned = the doc's tokens with covered positions dropped, joined
    by single spaces (token-level reconstruction — original inter-token
    whitespace is not preserved, the Lee et al. tokenized-corpus
    convention).

    Scale shape: the gram table is corpus-positions-sized but narrow
    and keys uniformly on the hash (two hash-keyed shuffles: the
    distinct-doc count and the join back); the covered-position set
    rides the same partitions and folds to one per-doc array via
    collect_set, re-entering the corpus row as a broadcast-joined
    column.  The position filter is a per-row array expression —
    O(n_tokens * n_removed) worst case, bounded by document length,
    never corpus-sized.  Output: (doc_id, n_tokens, n_removed,
    cleaned_text)."""
    # token array projected to a column first (see dedup.shingles, r12);
    # the gram table feeds the dup-hash aggregate AND the covered-
    # position join — materialized once (guide §2.4)
    toks = F.col("w")
    grams = F.when(
        F.size(toks) >= span,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (span - 1)),
            lambda i: F.lower(
                F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(span)])
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    g = (
        _parallel(docs)
        .select("doc_id", _tokens().alias("w"))
        .select("doc_id", F.posexplode(grams).alias("p0", "gram"))
        .select(
            "doc_id",
            (F.col("p0") + 1).alias("p"),
            _gram_hash(F.col("gram")).alias("h"),
        )
        .localCheckpoint(eager=False)
    )
    dupg = (
        g.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
        .select("h")
    )
    covered = (
        g.join(dupg, "h")
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("p"), F.col("p") + (span - 1))
            ).alias("t"),
        )
        .distinct()
    )
    rem = covered.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_removed"),
        F.collect_set("t").alias("rl"),
    )
    base = _parallel(docs).select("doc_id", _tokens().alias("w"))
    keep_tok = F.filter(
        F.transform(
            F.sequence(F.lit(1), F.size("w")),
            lambda i: F.when(
                F.array_contains(F.coalesce(F.col("rl"), F.array().cast("array<int>")), i.cast("int")),
                F.lit(None).cast("string"),
            ).otherwise(F.element_at("w", i)),
        ),
        lambda x: x.isNotNull(),
    )
    return (
        base.join(rem, "doc_id", "left")
        .select(
            "doc_id",
            F.size("w").cast("bigint").alias("n_tokens"),
            F.coalesce(F.col("n_removed"), F.lit(0)).cast("bigint").alias("n_removed"),
            F.when(F.size("w") == 0, F.lit("")).otherwise(
                F.array_join(keep_tok, " ")
            ).alias("cleaned_text"),
        )
    )
