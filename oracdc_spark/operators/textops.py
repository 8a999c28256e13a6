"""Text analysis operators for training-data pipelines.

All JVM-side (built-in functions only — regexp, array lambdas, md5); no
Python in the hot path, so plans stay inside WholeStageCodegen and scale
linearly with the corpus.  Every op is expressible in ANSI SQL for the
DuckDB oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

# tiny per-language marker lexicons for the n-gram/stopword language-ID
# heuristic (language-ID over opaque text = count marker hits per language,
# pick argmax; ties break lexicographically — fully deterministic).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "is", "of"),
    "de": ("der", "und", "die", "das"),
    "es": ("el", "que", "los", "las"),
    "fr": ("le", "la", "et", "les"),
    "zh": ("de", "shi", "le", "zai"),
}


def _tokens(col: str = "text"):
    return F.filter(F.split(F.trim(F.col(col)), r"\s+"), lambda x: x != F.lit(""))


def _parallel(df: DataFrame) -> DataFrame:
    """Single-file corpora read as one partition — spread the regex/hash
    work across cores; identity when splits >= cores (plans.parallel)."""
    from oracdc_spark.plans.parallel import ensure_parallelism

    return ensure_parallelism(df)


def token_stats(docs: DataFrame) -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish proxy (4 chars ≈ 1
    token, the common LLM heuristic) + alpha-token count."""
    toks = _tokens()
    n_tokens = F.size(toks)
    n_nonspace = F.length(F.regexp_replace(F.col("text"), r"\s", ""))
    return _parallel(docs).select(
        "doc_id",
        n_tokens.cast("bigint").alias("n_tokens"),
        n_nonspace.cast("bigint").alias("n_nonspace_chars"),
        F.ceil(n_nonspace / 4).cast("bigint").alias("bpe_est_tokens"),
        F.size(F.filter(toks, lambda x: x.rlike("^[a-zA-Z]+$"))).cast("bigint").alias("n_alpha_tokens"),
    )


def quality_scores(docs: DataFrame, min_tokens: int = 20, max_stopword_ratio: float = 0.6) -> DataFrame:
    """Quality scoring: length, mean token length, stopword ratio,
    distinct-token ratio; keep flag from simple thresholds.

    Ratios are double divisions of exact integers → engine-deterministic.
    """
    toks = _tokens()
    n_tokens = F.size(toks).cast("bigint")
    n_stop = F.size(
        F.filter(toks, lambda x: F.array_contains(F.array(*[F.lit(s) for s in STOPWORDS]), x))
    ).cast("bigint")
    n_distinct = F.size(F.array_distinct(toks)).cast("bigint")
    n_chars = F.length(F.col("text")).cast("bigint")
    stop_ratio = n_stop.cast("double") / n_tokens
    distinct_ratio = n_distinct.cast("double") / n_tokens
    mean_tok_len = (
        F.length(F.regexp_replace(F.col("text"), r"\s", "")).cast("double") / n_tokens
    )
    keep = (n_tokens >= min_tokens) & (stop_ratio <= max_stopword_ratio)
    return _parallel(docs).select(
        "doc_id",
        n_chars.alias("n_chars_calc"),
        n_tokens.alias("n_tokens"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(distinct_ratio, 6).alias("distinct_ratio"),
        F.round(mean_tok_len, 6).alias("mean_token_len"),
        keep.alias("keep"),
    )


def language_id(docs: DataFrame) -> DataFrame:
    """Heuristic language-ID: marker-lexicon hit counts per language,
    argmax with lexicographic tie-break. Output: (doc_id, lang, pred_lang,
    match)."""
    toks = _tokens()

    def _hits(markers: tuple[str, ...]):
        marker_arr = F.array(*[F.lit(m) for m in markers])

        def pred(x):
            return F.array_contains(marker_arr, x)

        return F.size(F.filter(toks, pred))

    scores = [
        F.struct(_hits(markers).alias("hits"), F.lit(lang).alias("lang"))
        for lang, markers in sorted(LANG_MARKERS.items())
    ]
    # argmax: sort ascending by (hits, lang DESC is wrong) — build sortable
    # struct: max hits, tie → lexicographically smallest lang. array_max on
    # struct compares fieldwise: (hits, neg_rank) — use reverse lang rank.
    langs = sorted(LANG_MARKERS.items())
    scored = [
        F.struct(
            s["hits"].alias("hits"),
            F.lit(len(langs) - i).alias("tie"),
            s["lang"].alias("lang"),
        )
        for i, s in enumerate(scores)
    ]
    best = F.array_max(F.array(*scored))["lang"]
    return _parallel(docs).select(
        "doc_id",
        "lang",
        best.alias("pred_lang"),
        (F.col("lang") == best).alias("match"),
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """Document fingerprint: md5 over the sorted distinct lowercase token
    set (word-order/duplication insensitive — catches shuffled near-dups
    that exact hashing misses)."""
    toks = F.array_sort(F.array_distinct(_tokens()))
    norm = F.array_join(toks, " ")
    return _parallel(docs).select(
        "doc_id",
        F.md5(F.lower(norm)).alias("fingerprint"),
    )


def fingerprint_dup_groups(docs: DataFrame) -> DataFrame:
    """Groups of documents sharing a token-set fingerprint (size > 1)."""
    fp = fingerprint(docs)
    return (
        fp.groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keeper_doc_id"))
        .filter(F.col("n_docs") > 1)
    )


def top_ngrams(docs: DataFrame, n: int = 2, k: int = 20) -> DataFrame:
    """Corpus-level top-k token n-grams — the vocabulary/contamination
    screening primitive.  Explode is narrow; one partial-aggregated
    count shuffle; top-k via a single ordered limit (no global sort of
    the full n-gram table — TakeOrderedAndProject)."""
    w = _tokens()
    grams = F.when(
        F.size(w) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - (n - 1)),
            lambda i: F.lower(
                F.concat_ws(" ", *[F.element_at(w, i + j) for j in range(n)])
            ),
        ),
    ).otherwise(F.array())
    return (
        _parallel(docs)
        .select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col("ngram"))
        .limit(k)
    )


def contamination_check(
    docs: DataFrame, benchmark: DataFrame, n: int = 5
) -> DataFrame:
    """Benchmark-contamination screening: per document, the fraction of
    its distinct n-gram shingles that appear anywhere in the benchmark
    set.  Output: (doc_id, n_shingles, n_contaminated,
    contamination_ratio).

    Scale shape: the benchmark shingle set is a bounded dimension
    (benchmarks are small by definition) → broadcast left join against
    the corpus shingles; one groupBy on doc_id.  Documents shorter than
    n tokens have no shingles and no row (nothing to screen)."""
    from oracdc_spark.operators.dedup import shingles

    target = shingles(docs, n)
    bench = shingles(benchmark, n).select("shingle").distinct()
    joined = target.join(
        F.broadcast(bench.withColumn("_hit", F.lit(1))), "shingle", "left"
    )
    agg = joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum(F.when(F.col("_hit").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_contaminated"),
    )
    return agg.select(
        "doc_id",
        "n_shingles",
        "n_contaminated",
        F.round(
            F.col("n_contaminated").cast("double") / F.col("n_shingles"), 6
        ).alias("contamination_ratio"),
    )
