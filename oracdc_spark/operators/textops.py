"""Text analysis operators for training-data pipelines.

All JVM-side (built-in functions only — regexp, array lambdas, md5); no
Python in the hot path, so plans stay inside WholeStageCodegen and scale
linearly with the corpus.  Every op is expressible in ANSI SQL for the
DuckDB oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

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


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality(
    docs: DataFrame,
    min_words: int = 50,
    max_words: int = 100000,
    stopwords: tuple[str, ...] = GOPHER_STOPWORDS,
) -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021, public):
    word count in [min_words, max_words], mean word length in [3, 10],
    symbol-to-word ratio (# and ellipsis) <= 0.1, >= 80% of words with
    an alphabetic character, >= 2 stop words present (the paper's
    8-word list by default — the paper treats the lexicon as a
    natural-language proxy, so it is a parameter for corpora with a
    different function-word inventory), <= 90% of lines bullet-led and
    <= 30% ellipsis-terminated.

    Every gate is an EXACT INTEGER comparison (3*wc <= chars <= 10*wc,
    10*symbols <= wc, 5*alpha >= 4*wc, 10*bullets <= 9*lines,
    10*ellipsis_lines <= 3*lines) so `keep` is bit-deterministic across
    engines; the reported ratios are single double divisions of the
    same integers.  Pure codegen — no UDFs, no shuffle (a per-row map
    over the corpus scan).
    """
    words = _tokens()
    wc = F.size(words).cast("bigint")
    chars = F.length(F.regexp_replace(F.col("text"), r"\s", "")).cast("bigint")
    sym = (
        F.length(F.col("text"))
        - F.length(F.regexp_replace(F.col("text"), r"[#…]", ""))
    ).cast("bigint")
    alpha = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]"))).cast("bigint")
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(words), F.array(*[F.lit(s) for s in stopwords])
        )
    ).cast("bigint")
    lines = F.filter(F.split(F.col("text"), "\n"), lambda x: x != F.lit(""))
    n_lines = F.size(lines).cast("bigint")
    bullets = F.size(
        F.filter(lines, lambda x: x.startswith("•") | x.startswith("- "))
    ).cast("bigint")
    ellipses = F.size(
        F.filter(lines, lambda x: x.endswith("...") | x.endswith("…"))
    ).cast("bigint")
    keep = (
        (wc >= min_words)
        & (wc <= max_words)
        & (3 * wc <= chars)
        & (chars <= 10 * wc)
        & (10 * sym <= wc)
        & (5 * alpha >= 4 * wc)
        & (stop_hits >= 2)
        & (10 * bullets <= 9 * n_lines)
        & (10 * ellipses <= 3 * n_lines)
    )
    return _parallel(docs).select(
        "doc_id",
        wc.alias("n_words"),
        F.round(chars.cast("double") / wc, 6).alias("mean_word_len"),
        sym.alias("n_symbols"),
        alpha.alias("alpha_words"),
        stop_hits.alias("stop_hits"),
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
    # token array projected to a column before the gram transform —
    # see dedup.shingles() (r12): lambda references to the raw split
    # expression re-tokenize per element, O(n_tokens²) per document
    w = F.col("w")
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
        .select(_tokens().alias("w"))
        .select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col("ngram"))
        .limit(k)
    )


def repetition_scores(
    docs: DataFrame,
    max_dup_line_frac: float = 0.30,
    max_top_bigram_char_frac: float = 0.20,
) -> DataFrame:
    """Gopher-style repetition quality rules (Rae et al. 2021, §A1.1):
    duplicate-line fraction, duplicate-line CHARACTER fraction, and the
    fraction of characters covered by the most frequent token 2-gram.

    Scale shape: line metrics are pure per-row array expressions
    (WholeStageCodegen, no shuffle); the top-bigram needs a per-doc mode,
    done as explode → partial-aggregated count → one struct-max groupBy —
    two key-local shuffles on doc_id, no windows, no self-joins.
    Output: (doc_id, n_lines, dup_line_frac, dup_line_char_frac,
    top_bigram, top_bigram_n, top_bigram_char_frac, keep)."""
    lines = F.filter(F.split(F.col("text"), r"\n"), lambda x: F.trim(x) != F.lit(""))
    n_lines = F.size(lines).cast("bigint")
    n_distinct_lines = F.size(F.array_distinct(lines)).cast("bigint")
    line_chars = F.aggregate(
        F.transform(lines, F.length), F.lit(0), lambda a, x: a + x
    ).cast("bigint")
    distinct_line_chars = F.aggregate(
        F.transform(F.array_distinct(lines), F.length), F.lit(0), lambda a, x: a + x
    ).cast("bigint")
    base = _parallel(docs).select(
        "doc_id",
        n_lines.alias("n_lines"),
        F.round(
            (n_lines - n_distinct_lines).cast("double") / n_lines, 6
        ).alias("dup_line_frac"),
        F.round(
            (line_chars - distinct_line_chars).cast("double") / line_chars, 6
        ).alias("dup_line_char_frac"),
        F.length(F.regexp_replace(F.col("text"), r"\s", ""))
        .cast("bigint")
        .alias("_n_chars"),
        "text",
    )

    # token array projected to a column before the bigram transform —
    # see dedup.shingles() (r12): lambda references to the raw split
    # expression re-tokenize per element, O(n_tokens²) per document
    w = F.col("w")
    grams = F.when(
        F.size(w) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - 1),
            lambda i: F.lower(
                F.concat_ws(" ", F.element_at(w, i), F.element_at(w, i + 1))
            ),
        ),
    ).otherwise(F.array())
    per_gram = (
        base.select("doc_id", _tokens().alias("w"))
        .select("doc_id", F.explode(grams).alias("bigram"))
        .groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # per-doc mode with deterministic tie-break: max struct = highest n,
    # then lexicographically greatest bigram
    top = per_gram.groupBy("doc_id").agg(
        F.max(F.struct(F.col("n"), F.col("bigram"))).alias("t")
    ).select("doc_id", F.col("t.bigram").alias("top_bigram"), F.col("t.n").alias("top_bigram_n"))

    out = base.join(top, "doc_id", "left").select(
        "doc_id",
        "n_lines",
        "dup_line_frac",
        "dup_line_char_frac",
        "top_bigram",
        F.coalesce("top_bigram_n", F.lit(0)).cast("bigint").alias("top_bigram_n"),
        F.round(
            F.coalesce(
                F.col("top_bigram_n")
                * F.length(F.regexp_replace("top_bigram", r"\s", ""))
                / F.col("_n_chars"),
                F.lit(0.0),
            ),
            6,
        ).alias("top_bigram_char_frac"),
    )
    return out.withColumn(
        "keep",
        (F.col("dup_line_frac") <= max_dup_line_frac)
        & (F.col("top_bigram_char_frac") <= max_top_bigram_char_frac),
    )


def unigram_logprob(docs: DataFrame) -> DataFrame:
    """Language-model quality scoring without a model: mean unigram
    log-probability under the corpus's own empirical distribution (the
    KenLM-perplexity-filter analog used by CCNet/RedPajama — documents of
    rare/garbage tokens score low, fluent ones high).

    Two corpus-wide aggregations (token counts; corpus total), then the
    count table joins back on ``tok`` — with NO broadcast hint: on
    web-scale text the token vocabulary is effectively unbounded (typos,
    hashes, URLs), so forcing a broadcast OOMs at 100 TB; AQE still
    broadcasts when the vocabulary is genuinely small at runtime.  The
    one-row corpus total stays a broadcast.  Determinism: log-probs are
    quantized to integers (round(ln(p)*1e6) as bigint) before the
    per-doc sum, so the aggregation is an exact integer sum —
    float-summation order never matters (same contract as the cosine
    scoring).  Output: (doc_id, n_tokens, mean_logprob)."""
    # r12 (guide §2.4): the token stream feeds the vocabulary count AND
    # the score join-back — materialized once instead of re-exploding
    # the corpus per consumer
    toks = _parallel(docs).select("doc_id", F.explode(_tokens()).alias("tok")).select(
        "doc_id", F.lower("tok").alias("tok")
    ).localCheckpoint(eager=False)
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n_tok"))
    total = counts.agg(F.sum("n_tok").alias("n_total"))
    q_lp = F.round(
        F.log(F.col("n_tok").cast("double") / F.col("n_total")) * 1_000_000, 0
    ).cast("bigint")
    scored = (
        toks.join(counts, "tok")
        .crossJoin(F.broadcast(total))
        .select("doc_id", q_lp.alias("q_lp"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.round(
            (F.sum("q_lp").cast("double") / F.count(F.lit(1))) / 1_000_000, 6
        ).alias("mean_logprob"),
    )


def vocab_coverage(docs: DataFrame, pcts: tuple[int, ...] = (50, 90, 99)) -> DataFrame:
    """Tokenizer-sizing statistic: the smallest vocabulary (most-frequent
    tokens first) covering each target percentage of the corpus token
    mass.  The comparison is integer cross-multiplied
    (``cum·100 >= total·pct``) — no float boundary.

    No vocabulary-sized window at all (r7 rework — the pre-r7 form
    windowed over the vocab, defended as "sublinear"; at web scale the
    vocab is still billions):  tokens sharing a count are
    interchangeable for SIZING, so the answer needs only the
    COUNT-VALUE histogram — distinct count values are O(sqrt(corpus
    tokens)) (their sum is the corpus), genuinely metadata.  With
    thr = ceil(total·pct/100), mass_h/vocab_h the mass and vocab in
    strictly-higher counts, and n_b the boundary count value:
    vocab_size = vocab_h + ceil((thr − mass_h) / n_b) — pure integer
    arithmetic, bit-equal to the literal rank/cumsum the oracle runs.
    Output: (pct, vocab_size, n_total)."""
    toks = _parallel(docs).select(F.explode(_tokens()).alias("tok")).select(
        F.lower("tok").alias("tok")
    )
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    ch = counts.groupBy("n").agg(F.count(F.lit(1)).alias("v"))
    wb = Window.orderBy(F.col("n").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = ch.select(
        "n",
        "v",
        F.coalesce(F.sum(F.col("n") * F.col("v")).over(wb), F.lit(0)).alias("mass_h"),
        F.coalesce(F.sum("v").over(wb), F.lit(0)).alias("vocab_h"),
    ).crossJoin(F.broadcast(ch.agg(F.sum(F.col("n") * F.col("v")).alias("n_total"))))
    th = F.explode(F.array(*[F.lit(p) for p in pcts])).alias("pct")
    thr = F.floor((F.col("n_total") * F.col("pct") + 99) / 100)
    return (
        cum.select("n", "v", "mass_h", "vocab_h", "n_total", th)
        .withColumn("thr", thr)
        # the unique boundary row: higher counts fall short, this one covers
        .filter(
            (F.col("mass_h") < F.col("thr"))
            & (F.col("mass_h") + F.col("n") * F.col("v") >= F.col("thr"))
        )
        .select(
            F.col("pct").cast("int").alias("pct"),
            (
                F.col("vocab_h")
                + F.floor((F.col("thr") - F.col("mass_h") + F.col("n") - 1) / F.col("n"))
            )
            .cast("bigint")
            .alias("vocab_size"),
            F.col("n_total").cast("bigint").alias("n_total"),
        )
    )


def bigram_logprob(docs: DataFrame) -> DataFrame:
    """Interpolated bigram LM quality scoring (the step up from
    :func:`unigram_logprob`): mean log of
    ``0.75·p(w2|w1) + 0.25·p(w2)`` over each document's bigram
    positions, all probabilities empirical from the corpus itself.
    Captures local fluency (scrambled text keeps its unigram score but
    craters here).

    Determinism contract: the probability is built with a FIXED
    expression shape — ``0.75·(c_bi/c_ctx) + 0.25·(c_uni/N)`` — so both
    engines evaluate the identical IEEE operation sequence; the log is
    quantized to an integer before the per-doc sum (order-independent
    exact aggregation), same as the unigram scorer.

    Scale shape (r8 rework): the corpus-sized position stream is
    exploded ONCE and aggregated to (doc_id, w1, w2, cnt); every
    smaller table derives from that — pair counts re-aggregate it
    (vocab²-bounded), context counts re-aggregate those — and each
    DISTINCT pair is scored exactly once on the vocab²-bounded
    ``bic ⋈ ctx ⋈ uni ⋈ total`` table (metadata-sized joins).  The big
    relation then crosses ONE join (doc_pairs ⋈ pair_scores), with the
    per-doc mean weighted by cnt — vs the previous plan's THREE wide
    joins of the raw per-position stream (r7 verdict item 5).  The
    pair-score table is corpus-independent, which is also the 100 TB
    shape: score the LM once, join it to any stream.  No broadcast hint
    on the pair joins — the bigram table can be genuinely large on web
    text, AQE decides.  Docs with < 2 tokens have no bigram positions
    and are absent from the output (mirrored in the oracle).
    Output: (doc_id, n_bigrams, mean_logprob)."""
    # lowered token array projected to a column before the pair
    # transform — see dedup.shingles() (r12): a lambda referencing the
    # raw split/lower expressions re-evaluates them per element,
    # O(n_tokens²) per document
    low = F.col("w")
    pairs = F.when(
        F.size(low) >= 2,
        F.transform(
            F.sequence(F.lit(2), F.size(low)),
            lambda i: F.struct(
                F.element_at(low, i - 1).alias("w1"),
                F.element_at(low, i).alias("w2"),
            ),
        ),
    ).otherwise(F.array())
    bi = (
        _parallel(docs)
        .select("doc_id", F.transform(_tokens(), lambda x: F.lower(x)).alias("w"))
        .select("doc_id", F.explode(pairs).alias("b"))
        .select("doc_id", "b.w1", "b.w2")
    )
    toks = _parallel(docs).select(F.explode(_tokens()).alias("tok")).select(
        F.lower("tok").alias("w2")
    )
    uni = toks.groupBy("w2").agg(F.count(F.lit(1)).alias("c_uni"))
    total = uni.agg(F.sum("c_uni").alias("n_total"))
    # ONE wide shuffle of the position stream; everything below it is
    # vocab²-bounded or smaller.  The aggregate feeds the LM side
    # (bic→ctx) AND the per-doc scoring join — materialized once
    # (guide §2.4; the r11 lineage plan ran the explode+aggregate
    # twice, 38 Exchanges)
    doc_pairs = bi.groupBy("doc_id", "w1", "w2").agg(
        F.count(F.lit(1)).alias("cnt")
    ).localCheckpoint(eager=False)
    bic = doc_pairs.groupBy("w1", "w2").agg(F.sum("cnt").alias("c_bi"))
    ctx = bic.groupBy("w1").agg(F.sum("c_bi").alias("c_ctx"))
    p = F.lit(0.75) * (F.col("c_bi").cast("double") / F.col("c_ctx")) + F.lit(
        0.25
    ) * (F.col("c_uni").cast("double") / F.col("n_total"))
    q_lp = F.round(F.log(p) * 1_000_000, 0).cast("bigint")
    pair_scores = (
        bic.join(ctx, "w1")
        # uni is vocabulary-sized (unbounded on web text) — no hint
        .join(uni, "w2")
        .crossJoin(F.broadcast(total))
        .select("w1", "w2", q_lp.alias("q_lp"))
    )
    scored = doc_pairs.join(pair_scores, ["w1", "w2"]).select(
        "doc_id", "cnt", "q_lp"
    )
    return scored.groupBy("doc_id").agg(
        F.sum("cnt").cast("bigint").alias("n_bigrams"),
        F.round(
            (F.sum(F.col("q_lp") * F.col("cnt")).cast("double") / F.sum("cnt"))
            / 1_000_000,
            6,
        ).alias("mean_logprob"),
    )


PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_URL_RE = r"https?://[^\s]+"
PII_IP_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def pii_scrub(docs: DataFrame) -> DataFrame:
    """PII / URL scrubbing for training corpora: mask emails, URLs, and
    IPv4 literals with typed placeholders; count matches per category.

    Order matters: URLs first (an URL may contain '@'), then emails,
    then IPs.  All regexp_replace/regexp_count — JVM codegen, no shuffle,
    patterns restricted to RE2-compatible syntax so the DuckDB oracle
    matches byte-for-byte.
    Output: (doc_id, n_urls, n_emails, n_ips, clean_digest)."""
    t = F.col("text")
    n_urls = F.regexp_count(t, F.lit(PII_URL_RE)).cast("bigint")
    after_url = F.regexp_replace(t, PII_URL_RE, "<URL>")
    n_emails = F.regexp_count(after_url, F.lit(PII_EMAIL_RE)).cast("bigint")
    after_email = F.regexp_replace(after_url, PII_EMAIL_RE, "<EMAIL>")
    n_ips = F.regexp_count(after_email, F.lit(PII_IP_RE)).cast("bigint")
    clean = F.regexp_replace(after_email, PII_IP_RE, "<IP>")
    return _parallel(docs).select(
        "doc_id",
        n_urls.alias("n_urls"),
        n_emails.alias("n_emails"),
        n_ips.alias("n_ips"),
        F.md5(clean).alias("clean_digest"),
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


# ---------------------------------------------------------------------------
# Count-Min Sketch — sublinear frequency estimation at corpus scale
# ---------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 1024
_CMS_P = 2147483647  # Mersenne prime 2^31-1
_CMS_A = (1009, 2003, 4001, 8009)
_CMS_B = (9173, 5087, 3259, 1427)


def _gram_hash(col):
    """Deterministic 60-bit integer hash of a token/ngram (md5-prefix,
    same cross-engine trick the SimHash oracle uses)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def _cms_bucket(h, d: int):
    # reduce h mod P BEFORE the multiply: a * (h % P) stays < 2^44, so
    # the arithmetic never exceeds int64 on either engine (Spark would
    # silently wrap on overflow, DuckDB would error — both avoided)
    return ((_CMS_A[d] * (h % _CMS_P) + _CMS_B[d]) % _CMS_P) % CMS_WIDTH


def cms_sketch(docs: DataFrame, n: int = 2) -> DataFrame:
    """Build a CMS over token n-grams: (d, bucket, cnt) — DEPTH×WIDTH
    cells regardless of corpus size.  One explode (narrow) + one
    partial-aggregated groupBy on (d, bucket): the sketch is the
    mergeable, fixed-memory answer to "frequencies over 100 TB" — cells
    union across partitions/days by addition, no vocabulary state."""
    # token array projected to a column first (see dedup.shingles, r12)
    w = F.col("w")
    grams = F.when(
        F.size(w) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - (n - 1)),
            lambda i: F.lower(
                F.concat_ws(" ", *[F.element_at(w, i + j) for j in range(n)])
            ),
        ),
    ).otherwise(F.array())
    g = _parallel(docs).select(_tokens().alias("w")).select(
        F.explode(grams).alias("ngram")
    ).select(_gram_hash(F.col("ngram")).alias("h"))
    # ONE corpus pass: all DEPTH cells per gram from a single explode (a
    # per-depth union would re-derive the gram explode DEPTH times)
    cells = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(d).alias("d"), _cms_bucket(F.col("h"), d).alias("bucket")
                )
                for d in range(CMS_DEPTH)
            ]
        )
    )
    return (
        g.select(cells.alias("c"))
        .select("c.d", "c.bucket")
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate_topk(docs: DataFrame, n: int = 2, k: int = 20) -> DataFrame:
    """Audit the sketch against exact counts: for the exact top-k
    n-grams, the CMS point estimate (min over depths of the cell) must
    dominate the true count (one-sided error — the CMS guarantee).
    Output: (ngram, exact_n, est_n, overcount)."""
    sketch = cms_sketch(docs, n)
    top = top_ngrams(docs, n, k).withColumn("h", _gram_hash(F.col("ngram")))
    probes = None
    for d in range(CMS_DEPTH):
        p = top.select(
            "ngram", "n_occurrences",
            F.lit(d).alias("d"), _cms_bucket(F.col("h"), d).alias("bucket"),
        )
        probes = p if probes is None else probes.unionAll(p)
    est = (
        probes.join(F.broadcast(sketch), ["d", "bucket"])
        .groupBy("ngram", "n_occurrences")
        .agg(F.min("cnt").alias("est_n"))
    )
    return est.select(
        "ngram",
        F.col("n_occurrences").alias("exact_n"),
        F.col("est_n").cast("bigint").alias("est_n"),
        (F.col("est_n") - F.col("n_occurrences")).cast("bigint").alias("overcount"),
    )


# ---------------------------------------------------------------------------
# HyperLogLog — sublinear distinct counting (deterministic restatement)
# ---------------------------------------------------------------------------

HLL_B = 10               # 2^10 = 1024 registers
HLL_M = 1 << HLL_B
_HLL_REST_BITS = 60 - HLL_B
# alpha_m for m >= 128 (Flajolet et al. 2007)
_HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)


def hll_registers(values, keys: tuple[str, ...] = ()) -> DataFrame:
    """HLL register table from a column of 60-bit hashes: bucket = top
    HLL_B bits, register = max over items of (leading-zero count of the
    remaining bits + 1).  The bit-length comes from `length(bin(x))` —
    pure string ops that Spark and DuckDB evaluate identically, so the
    sketch (and therefore the estimate) is engine-exact.  One groupBy
    over at most 2^HLL_B groups per key; mergeable by max.  ``keys``
    builds one sketch per key group (e.g. per day) from a single pass."""
    h = values
    # integer bit ops only — double division would lose precision > 2^53
    bucket = F.shiftright(F.col("h"), _HLL_REST_BITS)
    rest = F.col("h") % (1 << _HLL_REST_BITS)
    rho = F.when(rest == 0, F.lit(_HLL_REST_BITS + 1)).otherwise(
        F.lit(_HLL_REST_BITS) - F.length(F.bin(rest)) + 1
    )
    return (
        h.select(*keys, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*keys, "bucket")
        .agg(F.max("rho").alias("m_j"))
    )


def hll_distinct_tokens(docs: DataFrame) -> DataFrame:
    """Estimate the distinct-token count of the corpus with HLL and
    audit against the exact count.  The raw estimate uses the standard
    alpha_m * m^2 / Z harmonic mean with the small-range (linear
    counting) correction.  Output: (n_exact, n_est, rel_err)."""
    toks = _parallel(docs).select(F.explode(_tokens()).alias("tok")).select(
        F.lower("tok").alias("tok")
    )
    hashes = toks.select(_gram_hash(F.col("tok")).alias("h"))
    regs = hll_registers(hashes)
    agg = regs.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("m_j"))).alias("z_nonempty"),
        F.count(F.lit(1)).alias("n_buckets"),
    )
    z = F.col("z_nonempty") + (F.lit(HLL_M) - F.col("n_buckets"))  # empty => 2^0
    raw = F.lit(_HLL_ALPHA * HLL_M * HLL_M) / z
    v = F.lit(HLL_M) - F.col("n_buckets")  # zero registers
    est = F.when(
        (raw <= 2.5 * HLL_M) & (v > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v),
    ).otherwise(raw)
    # exact count as a lazy 1-row aggregate (audit-only pass) — joined
    # into the estimate row instead of an eager driver-side action
    ex = toks.agg(F.count_distinct("tok").alias("n_exact"))
    return agg.crossJoin(F.broadcast(ex)).select(
        F.col("n_exact").cast("bigint").alias("n_exact"),
        F.round(est, 3).alias("n_est"),
        F.round(F.abs(est - F.col("n_exact")) / F.col("n_exact"), 4).alias("rel_err"),
    )


# ---------------------------------------------------------------------------
# Bloom filter — sublinear set membership (completes the sketch family:
# CMS = frequencies, HLL = cardinality, Bloom = membership)
# ---------------------------------------------------------------------------

BLOOM_M_BITS = 32768          # 2^15 bits
BLOOM_WORD_BITS = 32          # bits per stored word (masks stay < 2^32: no
BLOOM_N_WORDS = BLOOM_M_BITS // BLOOM_WORD_BITS  # sign-bit trouble either engine)
BLOOM_K = 3
_BLOOM_A = (1009, 2003, 4001)
_BLOOM_B = (9173, 5087, 3259)


def _bloom_pos(h, i: int):
    """i-th bit position of a hashed item (same universal-hash family as
    the CMS buckets — overflow-safe on both engines)."""
    return ((_BLOOM_A[i] * (h % _CMS_P) + _BLOOM_B[i]) % _CMS_P) % BLOOM_M_BITS


def bloom_build(items: DataFrame, col: str = "tok") -> DataFrame:
    """Build a Bloom filter over a column of strings: BLOOM_K positions
    per item, OR-aggregated into (word_idx, bits) rows — at most
    BLOOM_N_WORDS rows regardless of corpus size.

    One explode (K rows per item, K constant) + one partial-aggregated
    groupBy over ≤1024 groups: the fixed-memory, mergeable (bitwise-OR)
    answer to "does this token exist anywhere in 100 TB".  Word size is
    32 bits inside a BIGINT so `1 << bit` never touches the sign bit in
    either engine."""
    h = _gram_hash(F.col(col))
    cells = F.explode(
        F.array(*[F.struct(_bloom_pos(h, i).alias("pos")) for i in range(BLOOM_K)])
    )
    # 2^bit via double pow is exact (bit <= 31 < 2^53) and portable; the
    # variable shift amount rules out shiftleft (int-only numBits in the
    # DataFrame API)
    mask = F.pow(F.lit(2.0), (F.col("c.pos") % BLOOM_WORD_BITS)).cast("bigint")
    return (
        items.select(cells.alias("c"))
        .select(
            F.shiftright(F.col("c.pos"), 5).alias("word_idx"),
            mask.alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_prune(probe: DataFrame, col: str, filt: DataFrame) -> DataFrame:
    """Pre-join pruning with a Bloom filter: keep only `probe` rows whose
    `col` is bloom-positive in `filt` (a :func:`bloom_build` table).

    This is the deploy pattern at 100 TB: build the ≤8 KiB filter over
    the small/reference side's keys, broadcast it, and drop the bulk of
    a huge probe side BEFORE the real join pays its shuffle.  Lossless
    by the no-false-negative guarantee: ``probe.join(build)`` equals
    ``bloom_prune(probe).join(build)`` exactly (tested); false positives
    only cost wasted join work, never wrong results."""
    keep_cols = probe.columns
    h = _gram_hash(F.col(col))
    out = probe
    # one broadcast lookup per hash (BLOOM_K constant joins of a
    # ≤1024-row table) — preserves row identity, duplicates and all
    for i in range(BLOOM_K):
        out = out.withColumn(f"_pos{i}", _bloom_pos(h, i))
        f_i = filt.select(
            F.col("word_idx").alias(f"_w{i}"), F.col("bits").alias(f"_b{i}")
        )
        out = out.join(
            F.broadcast(f_i),
            F.shiftright(F.col(f"_pos{i}"), 5) == F.col(f"_w{i}"),
            "left",
        )
        mask = F.pow(F.lit(2.0), F.col(f"_pos{i}") % BLOOM_WORD_BITS).cast("bigint")
        out = out.filter(
            (F.coalesce(F.col(f"_b{i}"), F.lit(0)) % (mask * 2)) >= mask
        )
    return out.select(*keep_cols)


def bloom_membership_audit(docs: DataFrame) -> DataFrame:
    """Audit the filter's contract: build over the corpus vocabulary,
    probe (a) every vocabulary token — all present, and the Bloom
    guarantee of NO false negatives says every one must come back
    positive — and (b) one synthetic ``absent_<doc_id>`` token per
    document, guaranteed outside the vocabulary, where any positive is a
    false positive.  (The synthetic corpus shares one small vocabulary
    across languages, so a corpus-split probe would have zero absent
    tokens and no false-positive signal.)

    Output (one row): n_probe, n_present, n_bloom_pos, n_false_pos,
    fp_rate.  The filter table is ≤ BLOOM_N_WORDS rows — broadcast is a
    genuine constant, unlike the feed-derived sets de-broadcast in
    round 2."""
    toks = _parallel(docs).select(F.explode(_tokens()).alias("tok")).select(
        F.lower("tok").alias("tok")
    )
    build = toks.distinct()
    absent = docs.select(
        F.concat(F.lit("absent_"), F.col("doc_id").cast("string")).alias("tok")
    )
    probe = build.unionAll(absent).distinct()
    filt = bloom_build(build)
    h = _gram_hash(F.col("tok"))
    probes = probe.select(
        "tok",
        F.explode(
            F.array(*[F.struct(_bloom_pos(h, i).alias("pos")) for i in range(BLOOM_K)])
        ).alias("c"),
    ).select(
        "tok",
        F.shiftright(F.col("c.pos"), 5).alias("word_idx"),
        (F.col("c.pos") % BLOOM_WORD_BITS).alias("bit"),
    )
    # bit test without variable shifts: (bits % 2^(bit+1)) >= 2^bit —
    # pure integer arithmetic, identical in Spark and DuckDB
    mask = F.pow(F.lit(2.0), F.col("bit")).cast("bigint")
    hits = (
        probes.join(F.broadcast(filt), "word_idx", "left")
        .withColumn(
            "hit",
            F.when(
                (F.coalesce(F.col("bits"), F.lit(0)) % (mask * 2)) >= mask, 1
            ).otherwise(0),
        )
        .groupBy("tok")
        .agg((F.sum("hit") == BLOOM_K).cast("int").alias("bloom_pos"))
    )
    verdicts = hits.join(
        build.withColumn("present", F.lit(1)), "tok", "left"
    ).select("tok", "bloom_pos", F.coalesce("present", F.lit(0)).alias("present"))
    return verdicts.agg(
        F.count(F.lit(1)).alias("n_probe"),
        F.sum("present").cast("bigint").alias("n_present"),
        F.sum("bloom_pos").cast("bigint").alias("n_bloom_pos"),
        F.sum(F.when((F.col("bloom_pos") == 1) & (F.col("present") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("n_false_pos"),
        F.round(
            F.sum(F.when((F.col("bloom_pos") == 1) & (F.col("present") == 0), 1).otherwise(0))
            / F.sum(F.when(F.col("present") == 0, 1).otherwise(0)),
            6,
        ).alias("fp_rate"),
    )


def tfidf_top_terms(docs: DataFrame, k: int = 3) -> DataFrame:
    """TF-IDF characteristic terms per document: score = tf × idf with
    idf = ln((N+1)/(df+1)) + 1 (smoothed).  The idf is quantized to an
    integer (round(idf*1e6)) so tf×idf products and their ordering are
    exact across engines — the float only reappears in the final
    presentation division.

    Scale shape: df = one groupBy over doc-distinct tokens; the idf table
    is vocabulary-sized — unbounded on web text, so NO broadcast hint (it
    joins on ``term``, the key tf is already partitioned by; AQE
    broadcasts genuinely small vocabularies at runtime); per-doc top-k
    via one doc_id window.  Output: (doc_id, term, tf, score)."""
    toks = _parallel(docs).select("doc_id", F.explode(_tokens()).alias("term")).select(
        "doc_id", F.lower("term").alias("term")
    )
    # n_docs as a lazy 1-row aggregate (crossJoin-broadcast convention,
    # same as unigram_logprob's corpus total) — no eager driver action
    nd = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf_q = F.round(
        (F.log((F.col("n_docs") + 1).cast("double") / (F.col("df") + 1)) + 1)
        * 1_000_000,
        0,
    ).cast("bigint")
    scored = tf.join(
        df_.crossJoin(F.broadcast(nd)).select("term", idf_q.alias("idf_q")), "term"
    )
    score_q = (F.col("tf") * F.col("idf_q")).alias("score_q")
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.col("score_q").desc(), F.col("term"))
    return (
        scored.select("doc_id", "term", "tf", score_q)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            "doc_id", "term", "tf",
            F.round(F.col("score_q") / 1_000_000, 6).alias("score"),
        )
    )


def bm25_rank(
    docs: DataFrame,
    query_terms: tuple[str, ...] = ("merge", "window", "hash"),
    k: int = 10,
) -> DataFrame:
    """Okapi BM25 document ranking for a fixed query-term set
    (k1 = 1.2, b = 0.75) — the retrieval scorer a curation pipeline uses
    to mine topical documents.

    Determinism: with k1 = 6/5 and b = 3/4, multiplying the BM25
    numerator and denominator by ``10 * total_tokens`` clears every
    fraction::

        score = idf * (tf*(k1+1)) / (tf + k1*(1 - b + b*dl/avgdl))
              = idf_q/1e6 * (22*tf*total) / (10*tf*total + 3*total + 9*dl*N)

    where total = corpus token count and N = doc count (avgdl = total/N).
    Numerator and denominator are exact bigints, idf_q is the quantized
    Robertson idf round(ln(1 + (N-df+0.5)/(df+0.5)) * 1e6); the score is
    a division of identical exact integers → IEEE-identical in Spark and
    DuckDB, so ordering on it is stable (tie-break doc_id).  Bigint
    headroom: numerator < 2^63 up to ~1e8 corpus tokens; beyond that,
    rescale idf_q to 1e3.

    Scale shape: tf is one groupBy over the (already map-side filtered)
    query-term postings; df/dl/total are one token-stats pass; the
    per-term join is against a |query_terms|-row build side (broadcast).
    Top-k per term via a per-term window over the postings — bounded by
    the term's df, not the corpus."""
    terms = [t.lower() for t in query_terms]
    tk = _parallel(docs).select(
        "doc_id", F.explode(_tokens()).alias("tok")
    ).select("doc_id", F.lower("tok").alias("term"))
    dl = tk.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    # corpus scalars as LAZY 1-row aggregates broadcast into the plan
    # (module convention, unigram_logprob:349) — never eager driver
    # count() actions that would freeze literals and re-run the corpus
    # tokenize as separate jobs at plan-build time
    nd = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    tot = tk.agg(F.count(F.lit(1)).alias("total"))
    qtk = tk.filter(F.col("term").isin(terms))
    tf = qtk.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf_q = F.round(
        F.log(
            F.lit(1.0)
            + (F.col("n_docs").cast("double") - F.col("df") + 0.5)
            / (F.col("df") + 0.5)
        )
        * 1_000_000,
        0,
    ).cast("bigint")
    scored = (
        tf.join(
            F.broadcast(
                dfreq.crossJoin(F.broadcast(nd)).select(
                    "term", idf_q.alias("idf_q"), "n_docs"
                )
            ),
            "term",
        )
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(tot))
        .select(
            "term",
            "doc_id",
            "tf",
            (
                (F.col("idf_q") * 22 * F.col("tf") * F.col("total")).cast("double")
                / (
                    F.lit(10) * F.col("total") * F.col("tf")
                    + F.lit(3) * F.col("total")
                    + F.lit(9) * F.col("n_docs") * F.col("dl")
                ).cast("double")
                / 1_000_000.0
            ).alias("score"),
        )
    )
    w = Window.partitionBy("term").orderBy(F.col("score").desc(), F.col("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("term", "rank", "doc_id", "tf", F.round("score", 6).alias("score"))
    )


def dsir_weights(docs: DataFrame, target_lang: str = "en", buckets: int = 256, k: int = 50) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score raw documents
    by how target-like their hashed-unigram feature distribution is.

    w(d) = sum over tokens of [ log p_target(bucket(tok)) - log p_raw(bucket(tok)) ]

    with add-one-smoothed bucket probabilities over `buckets` hashed
    features; target = documents with lang == `target_lang`, raw = the
    whole corpus.  Each log-ratio is quantized to an integer
    (round(x*1e6)) so the per-document sum is order-independent and the
    ranking is exact; ln() of identical integer ratios is IEEE-identical
    across engines (established by unigram/bigram logprob parity).

    Scale shape: bucket counts are two token-pass groupBys into a
    `buckets`-row table (broadcast); the per-doc score is one map-side
    join + one groupBy(doc_id).  Returns the top-k most target-like
    docs (weight desc, doc_id asc) with their exact quantized weight."""
    tk = _parallel(docs).select(
        "doc_id", "lang", F.explode(_tokens()).alias("tok")
    ).select(
        "doc_id",
        "lang",
        (
            F.conv(F.substring(F.md5(F.lower(F.col("tok"))), 1, 6), 16, 10)
            .cast("bigint") % buckets
        ).alias("b"),
    )
    raw = tk.groupBy("b").agg(F.count(F.lit(1)).alias("raw_n"))
    tgt = (
        tk.filter(F.col("lang") == target_lang)
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("tgt_n"))
    )
    # both corpus totals in ONE lazy token pass (crossJoin-broadcast
    # convention) — the eager tk.count() pair previously re-ran the full
    # corpus tokenize twice before the real plan even started
    totals = tk.agg(
        F.count(F.lit(1)).alias("raw_total"),
        F.coalesce(
            F.sum(F.when(F.col("lang") == target_lang, 1).otherwise(0)), F.lit(0)
        ).cast("bigint").alias("tgt_total"),
    )
    ratios = (
        raw.join(tgt, "b", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "b",
            F.round(
                (
                    F.log(
                        (F.coalesce(F.col("tgt_n"), F.lit(0)) + 1).cast("double")
                        / (F.col("tgt_total") + buckets)
                    )
                    - F.log(
                        (F.col("raw_n") + 1).cast("double")
                        / (F.col("raw_total") + buckets)
                    )
                )
                * 1_000_000,
                0,
            ).cast("bigint").alias("lr_q"),
        )
    )
    weights = (
        tk.join(F.broadcast(ratios), "b")
        .groupBy("doc_id")
        .agg(F.sum("lr_q").alias("weight_q"))
    )
    top = weights.orderBy(F.col("weight_q").desc(), F.col("doc_id")).limit(k)
    w = Window.orderBy(F.col("weight_q").desc(), F.col("doc_id"))
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select(
            "rank",
            "doc_id",
            F.round(F.col("weight_q") / 1_000_000, 6).alias("weight"),
        )
    )


# ---------------------------------------------------------------------------
# URL / domain analysis — the C4-style provenance filtering signal
# ---------------------------------------------------------------------------

URL_RE = r"https?://([^/\s]+)"


def url_domain_stats(docs: DataFrame) -> DataFrame:
    """Per-domain URL inventory — the aggregation behind C4-style
    domain blocklists and provenance mixing weights (Raffel et al.
    2020, §2.2: badwords/domain filtering happens at the registrable-
    domain level, not the full host).

    Extracts every ``http(s)://host`` occurrence, keeps the full host
    and its registrable site (last two dot-labels), and aggregates
    (site, domain) → occurrence count + distinct-document count.
    Output: (site, domain, n_urls, n_docs).

    Scale shape: narrow regexp extract + explode (stays on the scan's
    partitions), ONE groupBy on (site, domain) — domain cardinality is
    web-scale-bounded (~10^8 sites ≪ corpus rows) and the two-level
    aggregate combines map-side.  No UDF: regexp_extract_all and the
    array ops are codegen expressions."""
    hosts = (
        _parallel(docs)
        .select(
            "doc_id",
            F.explode(F.regexp_extract_all("text", F.lit(URL_RE), F.lit(1))).alias(
                "domain"
            ),
        )
    )
    labeled = hosts.withColumn(
        "site", F.array_join(F.slice(F.split("domain", r"\."), -2, 2), ".")
    )
    return labeled.groupBy("site", "domain").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.countDistinct("doc_id").alias("n_docs"),
    )


def c4_line_filter(
    docs: DataFrame, min_kept_lines: int = 3, min_line_words: int = 5
) -> DataFrame:
    """C4 line-level cleaning (Raffel et al. 2020 §2.2, public recipe):
    keep only lines that end in a terminal punctuation mark, contain at
    least ``min_line_words`` words, and do not mention "javascript";
    then drop the whole page when fewer than ``min_kept_lines`` lines
    survive, or when the page contains "lorem ipsum" or a curly brace
    (the paper's source-code tell).

    Output: (doc_id, n_lines, n_kept, kept_chars, keep) — the kept-line
    inventory plus the page decision; ``kept_chars`` is the length of
    the newline-joined surviving lines (what a downstream rewriter
    would emit).

    Scale shape: every rule is a codegen expression over the split-line
    array (filter lambdas, exact string predicates) — a per-row map on
    the corpus scan, no UDF, no shuffle; ``keep`` is bit-deterministic
    across engines.  Reference parity: beyond the reference — part of
    the LLM-data-pipeline surface (SURVEY.md "beyond the reference").
    """
    lines = F.filter(
        F.split(F.col("text"), "\n"), lambda x: F.trim(x) != F.lit("")
    )

    def _line_words(x):
        return F.size(F.filter(F.split(x, " "), lambda w: w != F.lit("")))

    kept = F.filter(
        lines,
        lambda x: x.rlike('[.!?"]$')
        & (_line_words(x) >= min_line_words)
        & ~F.lower(x).contains("javascript"),
    )
    page_ok = (
        (F.size(kept) >= min_kept_lines)
        & ~F.lower(F.col("text")).contains("lorem ipsum")
        & ~F.col("text").contains("{")
    )
    return _parallel(docs).select(
        "doc_id",
        F.size(lines).cast("bigint").alias("n_lines"),
        F.size(kept).cast("bigint").alias("n_kept"),
        F.length(F.array_join(kept, "\n")).cast("bigint").alias("kept_chars"),
        page_ok.alias("keep"),
    )


def c4_badwords_filter(docs: DataFrame, word_hashes: list[str]) -> DataFrame:
    """C4 badwords page gate (Raffel et al. 2020 §2.2, completing the
    line-level rules in :func:`c4_line_filter`): C4 drops any page
    containing a word from the public "List of Dirty, Naughty, Obscene
    or Otherwise Bad Words".  The blocklist is supplied as MD5 HASHES
    of the lowercased words — the standard way to ship a profanity
    gate without shipping profanity (the repo embeds no list content;
    callers hash the published list themselves).

    A page is flagged when any lowercased whitespace token's md5 is in
    the set.  Output: (doc_id, n_tokens, n_bad, keep) with
    ``keep = n_bad == 0`` — the page decision plus the hit inventory.

    Scale shape: tokenize + per-token md5 + membership against the
    literal hash list are all expressions on the corpus scan — a
    narrow per-row map, no UDF, no shuffle.  The real C4 list is
    ~1.7k entries: still a constant folded into the plan (membership
    cost is bounded by the list size, independent of the corpus); for
    much larger lists the scale path is a broadcast join on the token
    hash instead.

    Reference parity: beyond the reference — part of the
    LLM-data-pipeline surface (SURVEY.md "beyond the reference")."""
    toks = F.filter(
        F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != F.lit("")
    )
    bad = F.filter(toks, lambda t: F.md5(t).isin(*word_hashes))
    return _parallel(docs).select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(bad).cast("bigint").alias("n_bad"),
        (F.size(bad) == 0).alias("keep"),
    )


FULL_URL_RE = r"(?i)https?://[^\s]+"


def canonical_url(url) -> "F.Column":
    """The canonicalization chain as a reusable Column expression —
    idempotent (canon(canon(u)) == canon(u), tested), pure codegen.

    The utm strip is anchored on the parameter separator (a bare
    ``utm_x=y&`` pattern would also fire mid-name, e.g. ``xutm_b=2``,
    corrupting the key): the separator is KEPT (``$1``) so consecutive
    utm params all match, then separator runs collapse and trailing
    separators strip — which also makes the chain idempotent."""
    u1 = F.regexp_replace(url, r"#.*$", "")
    auth = F.lower(F.regexp_extract(u1, r"^[^/]*//[^/?#]*", 0))
    rest = F.regexp_replace(u1, r"^[^/]*//[^/?#]*", "")
    u2 = F.concat(auth, rest)
    u3 = F.regexp_replace(u2, r"^(http://[^/?#:]*):80([/?#].*)?$", r"$1$2")
    u4 = F.regexp_replace(u3, r"^(https://[^/?#:]*):443([/?#].*)?$", r"$1$2")
    u5 = F.regexp_replace(u4, r"([?&])utm_[a-zA-Z]+=[^&#]*", r"$1")
    u6 = F.regexp_replace(u5, r"([?&])&+", r"$1")
    u7 = F.regexp_replace(u6, r"[?&]+$", "")
    return F.regexp_replace(u7, r"/$", "")



def url_canonical_dedup(docs: DataFrame) -> DataFrame:
    """URL canonicalization + URL-level dedup — the CommonCrawl/C4-style
    provenance dedup key (one kept fetch per canonical URL).

    Canonical form: strip the ``#fragment``; lowercase the scheme and
    authority (path/query case is significant and preserved); drop the
    scheme-default port (``:80`` http, ``:443`` https); remove
    ``utm_*`` tracking parameters, tidying the leftover ``?``/``&``;
    strip one trailing slash.  Output per canonical URL: occurrence
    count, distinct-document count, and ``keep_doc`` = min(doc_id) —
    the keep-first dedup decision.

    Scale shape: extraction + the regexp_replace chain are codegen
    expressions on the corpus scan (no UDF); ONE groupBy on the
    canonical URL — a web-bounded, near-uniform key (md5-distributed
    by Spark's hash partitioning), so no skew handling is needed; the
    aggregate combines map-side."""
    urls = _parallel(docs).select(
        "doc_id",
        F.explode(
            F.regexp_extract_all("text", F.lit(FULL_URL_RE), F.lit(0))
        ).alias("url"),
    )
    return (
        urls.select("doc_id", canonical_url(F.col("url")).alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("keep_doc"),
        )
    )


def perplexity_buckets(docs: DataFrame, bin_div: int = 10000) -> DataFrame:
    """CCNet-style head/middle/tail corpus split by LM quality score
    (Wenzek et al. 2020 §4.3: rank documents by perplexity, keep the
    best third as "head", next as "middle", drop or downweight the
    "tail") — restated over :func:`unigram_logprob`'s model-free
    quantized score and computed WITHOUT a global sort.

    The exact global rank (q_mean_lp desc, doc_id asc) decomposes over
    a COARSE score histogram: bin = floor(q_mean_lp / bin_div) bounds
    the histogram to the score range / bin_div (~2,000 bins for mean
    logprobs in [-20, 0] at 1e6 quantization), so the bin table is
    metadata-sized no matter the corpus; a document's global rank is
    then (docs in strictly-better bins) + (its rank within its own
    bin).  Tertile edges compare in exact integer arithmetic
    (3*rn <= n, 3*rn <= 2*n), so the oracle — the LITERAL global-sort
    ROW_NUMBER split — must agree row for row.

    Scale shape: ONE corpus shuffle for the per-doc score (token join
    is unigram_logprob's), one more for the bin-partitioned rank
    window; the bin histogram and doc-count are broadcast 1-row/tiny
    aggregates.  A pathological corpus concentrating in one bin
    degrades the bin window to the global sort's partition — shrink
    bin_div to re-spread (the knob is the contract, like
    pack_sequences' shards).

    Output: (doc_id, q_mean_lp, rn, bucket) for every doc with >= 1
    token; bucket in ('head', 'middle', 'tail')."""
    # r12 (guide §2.4): the token stream feeds the vocabulary count and
    # the score join; the per-doc score table feeds the bin histogram,
    # the doc count and the rank join — each materialized once
    toks = _parallel(docs).select(
        "doc_id", F.explode(_tokens()).alias("tok")
    ).select("doc_id", F.lower("tok").alias("tok")).localCheckpoint(eager=False)
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n_tok"))
    total = counts.agg(F.sum("n_tok").alias("n_total"))
    q_lp = F.round(
        F.log(F.col("n_tok").cast("double") / F.col("n_total")) * 1_000_000, 0
    ).cast("bigint")
    scored = (
        toks.join(counts, "tok")
        .crossJoin(F.broadcast(total))
        .select("doc_id", q_lp.alias("q_lp"))
        .groupBy("doc_id")
        .agg(
            F.floor(F.sum("q_lp").cast("double") / F.count(F.lit(1)))
            .cast("bigint")
            .alias("q_mean_lp")
        )
        .withColumn(
            "bin",
            F.floor(F.col("q_mean_lp").cast("double") / bin_div).cast("bigint"),
        )
        .localCheckpoint(eager=False)
    )
    hist = scored.groupBy("bin").agg(F.count(F.lit(1)).alias("bin_cnt"))
    wb = Window.orderBy(F.col("bin").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    better = hist.select(
        "bin",
        F.coalesce(F.sum("bin_cnt").over(wb), F.lit(0))
        .cast("bigint")
        .alias("higher_cnt"),
    )
    n_docs = scored.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    wd = Window.partitionBy("bin").orderBy(F.col("q_mean_lp").desc(), "doc_id")
    return (
        scored.join(F.broadcast(better), "bin")
        .withColumn("rn", (F.col("higher_cnt") + F.row_number().over(wd)).cast("bigint"))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "q_mean_lp",
            "rn",
            F.when(3 * F.col("rn") <= F.col("n_docs"), F.lit("head"))
            .when(3 * F.col("rn") <= 2 * F.col("n_docs"), F.lit("middle"))
            .otherwise(F.lit("tail"))
            .alias("bucket"),
        )
    )


def langid_confusion(docs: DataFrame) -> DataFrame:
    """Confusion matrix for the marker-lexicon language-ID heuristic
    against the stored ``lang`` label — the audit row set for
    :func:`language_id` (the discipline: every heuristic classifier
    ships the measurement of where it is wrong, per class, not one
    global accuracy).

    Output: (lang, pred_lang, n_docs, lang_total, recall) — one row
    per observed (actual, predicted) cell; recall = cell / actual-class
    total, exact integers until one final rounded division.  Scale:
    rides language_id's corpus scan + ONE (lang, pred_lang) aggregate
    (|langs|² cells at most) and a broadcast per-lang total."""
    li = language_id(docs)
    cells = li.groupBy("lang", "pred_lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    # class totals re-aggregate the |langs|^2 CELL table, not the
    # corpus — language_id's marker scan runs exactly once
    totals = cells.groupBy("lang").agg(
        F.sum("n_docs").cast("bigint").alias("lang_total")
    )
    return cells.join(F.broadcast(totals), "lang").select(
        "lang",
        "pred_lang",
        "n_docs",
        "lang_total",
        F.round(
            F.col("n_docs").cast("double") / F.col("lang_total").cast("double"), 6
        ).alias("recall"),
    )


def doc_length_quantiles(
    docs: DataFrame, pcts: tuple[int, ...] = (50, 90, 99)
) -> DataFrame:
    """Exact corpus length quantiles WITHOUT a global sort — the
    vocab_coverage shape applied to document token lengths: the
    length histogram (distinct lengths are bounded by the longest
    document, metadata-sized regardless of corpus row count) carries a
    cumulative count, and quantile p = the smallest length whose
    cumulative count covers p% of documents (integer cross-multiplied
    ``cum*100 >= n_docs*pct`` — no float boundary).

    Output: (pct, n_tokens, n_docs) — the p-th percentile document
    length and the corpus size it was computed over."""
    lengths = _parallel(docs).select(F.size(_tokens()).cast("bigint").alias("len"))
    hist = lengths.groupBy("len").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy("len")
    ranked = hist.select(
        "len",
        F.sum("cnt").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
    ).crossJoin(F.broadcast(lengths.agg(F.count(F.lit(1)).alias("n_docs"))))
    th = F.explode(F.array(*[F.lit(p) for p in pcts])).alias("pct")
    return (
        ranked.select("len", "cum", "n_docs", th)
        .filter(F.col("cum") * 100 >= F.col("n_docs") * F.col("pct"))
        .groupBy("pct")
        .agg(
            F.min("len").cast("bigint").alias("n_tokens"),
            F.max("n_docs").cast("bigint").alias("n_docs"),
        )
        .select(F.col("pct").cast("int").alias("pct"), "n_tokens", "n_docs")
    )


def split_divergence(docs: DataFrame, splits: DataFrame) -> DataFrame:
    """Distribution-shift audit between corpus splits: Jensen-Shannon
    divergence of the train vs val unigram distributions — the drift
    check a pipeline runs before trusting a held-out split (a skewed
    split silently biases every perplexity/quality measurement made on
    it).  JSD is symmetric and bounded in [0, ln 2]; 0 = identical
    distributions.

    Determinism contract (the unigram_logprob recipe): every per-term
    contribution p·ln(p/m) is computed in doubles FROM exact integer
    counts — identical on both engines — then quantized to round(·1e9)
    bigints so the vocabulary-sized SUM is exact integer arithmetic
    (no float summation order).  One final /1e9 division.

    Output: one row (n_train_tokens, n_val_tokens, shared_vocab,
    train_only_vocab, val_only_vocab, jsd).  Scale: two token-count
    aggregates + one full-outer join on the token key (web-bounded
    vocabulary), nothing corpus-quadratic."""
    toks = (
        _parallel(docs)
        .join(splits, "doc_id")
        .filter(F.col("split").isin("train", "val"))
        .select("split", F.explode(_tokens()).alias("tok"))
        .select("split", F.lower("tok").alias("tok"))
    )
    counts = toks.groupBy("tok").pivot("split", ["train", "val"]).count().na.fill(0)
    totals = counts.agg(
        F.sum("train").alias("nt"), F.sum("val").alias("nv")
    )
    j = counts.crossJoin(F.broadcast(totals))
    # an empty side (nt or nv = 0) makes the divergence undefined —
    # guard every division so the per-term column is 0 there and the
    # final jsd goes NULL instead of crashing (ANSI /0) or silently
    # reading 0.0 "identical" through a NaN cast
    p = F.when(F.col("nt") > 0, F.col("train").cast("double") / F.col("nt")).otherwise(F.lit(0.0))
    q = F.when(F.col("nv") > 0, F.col("val").cast("double") / F.col("nv")).otherwise(F.lit(0.0))
    m = (p + q) / 2
    contrib = (
        F.when((F.col("train") > 0) & (p > 0) & (m > 0), p * F.log(p / m)).otherwise(F.lit(0.0))
        + F.when((F.col("val") > 0) & (q > 0) & (m > 0), q * F.log(q / m)).otherwise(F.lit(0.0))
    ) / 2
    per_term = j.select(
        "train",
        "val",
        F.round(contrib * 1e9, 0).cast("bigint").alias("qc"),
    )
    return (
        per_term.crossJoin(F.broadcast(totals))
        .agg(
            F.max("nt").cast("bigint").alias("n_train_tokens"),
            F.max("nv").cast("bigint").alias("n_val_tokens"),
            F.sum(((F.col("train") > 0) & (F.col("val") > 0)).cast("bigint"))
            .cast("bigint")
            .alias("shared_vocab"),
            F.sum(((F.col("train") > 0) & (F.col("val") == 0)).cast("bigint"))
            .cast("bigint")
            .alias("train_only_vocab"),
            F.sum(((F.col("train") == 0) & (F.col("val") > 0)).cast("bigint"))
            .cast("bigint")
            .alias("val_only_vocab"),
            F.when(
                (F.max("nt") > 0) & (F.max("nv") > 0),
                F.round(F.sum("qc").cast("double") / 1e9, 6),
            ).alias("jsd"),
        )
    )


def corpus_datasheet(docs: DataFrame) -> DataFrame:
    """Data-mixing datasheet: doc/token/char totals per (lang, source)
    cell plus every rollup — per-lang, per-source, and the grand total
    — in ONE corpus pass via CUBE grouping sets (the "what is in my
    training mix" report every large-scale pipeline publishes, cf.
    datasheets-for-datasets / the Pile's per-component tables).

    Aggregated-out dimensions are marked '(all)' via GROUPING() —
    distinguishable from a genuine NULL value ('(null)') — so the
    report is self-describing and the DuckDB oracle's null-ordering
    never enters the hash compare.

    Scale shape: Catalyst's Expand replicates each row once per
    grouping set (4x here) before ONE partial-aggregated shuffle on
    low-cardinality keys — no second pass, no driver work; at 100 TB
    the expansion is map-side and the result is metadata-sized
    (|langs| x |sources| cells).  Token counts reuse token_stats'
    whitespace + BPE-proxy semantics."""
    toks = _tokens()
    n_nonspace = F.length(F.regexp_replace(F.col("text"), r"\s", ""))
    base = _parallel(docs).select(
        "lang",
        "source",
        F.size(toks).cast("bigint").alias("tok"),
        F.col("n_chars").cast("bigint").alias("nch"),
        F.ceil(n_nonspace / 4).cast("bigint").alias("bpe"),
    )
    agg = base.cube("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("tok").cast("bigint").alias("n_tokens"),
        F.sum("nch").cast("bigint").alias("n_chars"),
        F.sum("bpe").cast("bigint").alias("bpe_est_tokens"),
        F.grouping("lang").alias("_gl"),
        F.grouping("source").alias("_gs"),
    )
    mark = lambda c, g: F.when(F.col(g) == 1, F.lit("(all)")).otherwise(  # noqa: E731
        F.coalesce(F.col(c), F.lit("(null)"))
    )
    return agg.select(
        mark("lang", "_gl").alias("lang"),
        mark("source", "_gs").alias("source"),
        "n_docs",
        "n_tokens",
        "n_chars",
        "bpe_est_tokens",
    )


def boilerplate_strip(docs: DataFrame, min_docs: int = 3) -> DataFrame:
    """Cross-document boilerplate removal: a line occurring in at least
    ``min_docs`` DISTINCT documents of the same source is site
    furniture (nav bars, cookie banners, footers) and is stripped from
    every document of that source — the line-level cross-doc pass of
    RefinedWeb/CCNet-style web curation, complementing c4_line_filter
    (within-doc rules) and chunk_dedup_stats (passage-level stats).

    Exact semantics (oracle-mirrored): lines split on '\\n', compared
    byte-exact; the doc rebuilds as the '\\n'-join of its surviving
    lines in original order; docs reduced to nothing emit an empty
    string.  Output: (doc_id, cleaned_text, n_lines_removed).

    Scale shape: one (source, line) frequency aggregate — key
    cardinality is web-bounded (distinct lines per site), the
    distinct-doc count partial-aggregates; the join back is keyed the
    same; reassembly is a per-doc sort_array over positions already on
    the doc's partition (one doc_id exchange).  No pair joins, nothing
    corpus²."""
    lines = _parallel(docs).select(
        "doc_id",
        "source",
        F.posexplode(F.split(F.col("text"), "\n")).alias("pos", "line"),
    )
    boiler = (
        lines.groupBy("source", "line")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("source", "line", F.lit(True).alias("is_boiler"))
    )
    marked = lines.join(boiler, ["source", "line"], "left")
    return (
        marked.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("is_boiler").isNull(),
                                F.struct("pos", "line"),
                            )
                        )
                    ),
                    lambda s: s["line"],
                ),
                "\n",
            ).alias("cleaned_text"),
            F.sum(
                F.when(F.col("is_boiler").isNotNull(), 1).otherwise(0)
            ).cast("bigint").alias("n_lines_removed"),
        )
    )


def bpe_merges(docs: DataFrame, steps: int = 3) -> DataFrame:
    """BPE tokenizer training, the first ``steps`` merges (Sennrich et
    al. 2016's learn_bpe loop): word-frequency table -> adjacent
    symbol-pair counts -> merge the most frequent pair -> repeat.  The
    op a training-data pipeline runs to fit a corpus-specific tokenizer
    before token counting / packing.  No end-of-word marker (the
    minbpe-style simplification), lowercase alpha word types only.

    Scale shape: everything past the first aggregate is VOCAB-bounded —
    the word-TYPE table (~10M rows at web scale, with integer counts
    carrying the corpus weight), per-step pair counts (vocab x word
    length), and a 1-row TakeOrdered best-pair selection that stays
    lazy via broadcast crossJoin (no driver action, lazy-builder gate
    clean).  The corpus-sized explode happens once per plan; production
    would persist the word table between steps (metadata-sized) — here
    the lineage recomputes it, keeping the builder pure.

    Merge application is greedy LEFT-TO-RIGHT non-overlapping (the
    learn_bpe semantics: 'a a a a a' -> 'aa aa a'), implemented as one
    plain-replace pass over a doubled-space encoding: double every
    space (boundaries and edges become exactly 2 spaces), replace
    ' a  b ' -> ' ab ' (the pattern consumes ONE space from each side,
    so the leftover space both restores the 2-space invariant and lets
    the scan chain into an immediately adjacent occurrence — exactly
    the greedy skip-by-two), then collapse '  ' -> ' '.  The earlier
    padded double-replace was NOT greedy-left on odd runs >= 5
    (' a a a a a ' -> ' aa a aa '): found by the Sennrich-model
    property test, which pins this form.  Plain replace is
    left-to-right non-overlapping in both Spark and DuckDB, so the
    oracle replays it verbatim.  Ties break on the lexicographically
    smallest pair — ASCII-only symbols, so Spark and DuckDB collate
    identically.

    Output: one row per merge step — (step, pair, merged, freq), freq
    the exact integer occurrence count of the winning pair at that
    step."""
    _, best_rows = _bpe_chain(docs, steps)
    out = best_rows[0]
    for b in best_rows[1:]:
        out = out.unionByName(b)
    return out


def _bpe_chain(docs: DataFrame, steps: int):
    """Shared BPE merge chain: returns (seqs-after-all-steps, [one-row
    best-pair DataFrames per step]).  See bpe_merges for semantics."""
    toks = _parallel(docs).select(F.explode(_tokens()).alias("w")).select(
        F.lower("w").alias("w")
    )
    words = (
        toks.filter(F.col("w").rlike("^[a-z]+$"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("wcount"))
    )
    seqs = words.select(
        "wcount",
        F.concat(
            F.lit(" "), F.trim(F.regexp_replace("w", "(.)", "$1 ")), F.lit(" ")
        ).alias("seq"),
    )
    merged_of = lambda c: F.replace(c, F.lit(" "), F.lit(""))
    best_rows = []
    for step in range(1, steps + 1):
        t = F.split(F.trim(F.col("seq")), " ")
        pairs = F.when(
            F.size(t) >= 2,
            F.transform(
                F.sequence(F.lit(0), F.size(t) - 2),
                lambda i: F.concat(F.get(t, i), F.lit(" "), F.get(t, i + 1)),
            ),
        ).otherwise(F.array().cast("array<string>"))
        pc = (
            seqs.select("wcount", F.explode(pairs).alias("pair"))
            .groupBy("pair")
            .agg(F.sum("wcount").cast("bigint").alias("freq"))
        )
        best = pc.orderBy(F.col("freq").desc(), "pair").limit(1)
        best_rows.append(
            best.select(
                F.lit(step).cast("int").alias("step"),
                "pair",
                merged_of(F.col("pair")).alias("merged"),
                "freq",
            )
        )
        # greedy-left merge: double spaces, one replace pass (consumes
        # one space per side, chaining adjacent occurrences), collapse.
        # LEFT join on TRUE, not crossJoin: when a step finds no pairs
        # at all (a corpus of only single-letter word types) `best` is
        # empty and a cross join would EMPTY seqs — making
        # bpe_compression report n_word_types=0 / NULL symbols instead
        # of the intended before==after no-op.  With the 1-row
        # broadcast non-empty the two forms are identical; with it
        # empty the NULL-pair guard keeps every seq unchanged.
        # (bpe_merges is unaffected either way: an empty step-k argmax
        # means the corpus has no pairs, so steps k+1.. find none
        # regardless of whether seqs survived — the termination
        # property in tests/test_bpe_properties.py pins that.)
        pat = F.concat(
            F.lit(" "),
            F.replace(F.col("pair"), F.lit(" "), F.lit("  ")),
            F.lit(" "),
        )
        rep = F.concat(F.lit(" "), merged_of(F.col("pair")), F.lit(" "))
        seqs = seqs.join(F.broadcast(best), F.lit(True), "left").select(
            "wcount",
            F.when(F.col("pair").isNull(), F.col("seq"))
            .otherwise(
                F.replace(
                    F.replace(
                        F.replace(F.col("seq"), F.lit(" "), F.lit("  ")),
                        pat,
                        rep,
                    ),
                    F.lit("  "),
                    F.lit(" "),
                )
            )
            .alias("seq"),
        )
    return seqs, best_rows


def bpe_compression(docs: DataFrame, steps: int = 3) -> DataFrame:
    """Tokenizer-sizing audit over :func:`bpe_merges`: the corpus-level
    compression the first ``steps`` learned merges buy — symbol counts
    (corpus-weighted) before and after applying the merges, i.e. the
    curve a pipeline inspects to choose its vocab size (each merge's
    marginal gain is exactly the winning pair's freq, so
    symbols_before − symbols_after = Σ step freqs; the oracle recomputes
    both sides independently and the identity is hash-checked).

    Same scale shape as bpe_merges (the chain is shared); the outputs
    here are two 1-row integer aggregates over the vocab-bounded word
    table.  Output: one row — (n_word_types, n_words, symbols_before,
    symbols_after, compression)."""
    seqs, _ = _bpe_chain(docs, steps)
    base = seqs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_word_types"),
        F.sum("wcount").cast("bigint").alias("n_words"),
        # initial symbols = chars per word type (seq after `steps` merges
        # no longer equals the char count, so recompute from token size)
        F.sum(
            F.col("wcount") * F.size(F.split(F.trim(F.col("seq")), " "))
        ).cast("bigint").alias("symbols_after"),
    )
    toks0 = _parallel(docs).select(F.explode(_tokens()).alias("w")).select(
        F.lower("w").alias("w")
    )
    before = (
        toks0.filter(F.col("w").rlike("^[a-z]+$"))
        .agg(F.sum(F.length("w")).cast("bigint").alias("symbols_before"))
    )
    return (
        base.crossJoin(F.broadcast(before))
        .select(
            "n_word_types",
            "n_words",
            "symbols_before",
            "symbols_after",
            F.round(
                F.col("symbols_before").cast("double") / F.col("symbols_after"), 6
            ).alias("compression"),
        )
    )


def weak_stem(col) -> "F.Column":
    """Harman (1991) 'S-stemmer' — the weak, high-precision plural
    stemmer IR stacks run before indexing (the conservative cousin of
    Porter's step 1a).  Three ordered rules on lowercase words:
    ies->y unless (aies|eies); es->e unless (aes|ees|oes); s->'' unless
    (us|ss).  The rules are keyed to the LONGEST matching ending — a
    word ending 'ies' is rule 1's business only (an exception like
    'aies' stops there, it does not fall through to the 'es' rule).
    Pure regexp with explicit character classes (no lookarounds —
    portable to RE2, so the DuckDB oracle is literal)."""
    c = F.lower(col)
    return (
        F.when(c.rlike("[^ae]ies$"), F.regexp_replace(c, "ies$", "y"))
        .when(c.rlike("ies$"), c)
        .when(c.rlike("[^aeo]es$"), F.regexp_replace(c, "s$", ""))
        .when(c.rlike("es$"), c)
        .when(c.rlike("[^us]s$"), F.regexp_replace(c, "s$", ""))
        .otherwise(c)
    )


def stem_vocab_reduction(docs: DataFrame) -> DataFrame:
    """Lexical-normalization audit: how much vocabulary the weak
    stemmer folds away — the number an indexing pipeline checks before
    enabling stemming (too little: skip the pass; too much: the rules
    are over-firing on the corpus's morphology).

    Scale shape: one corpus token pass feeding two vocab-bounded
    DISTINCT aggregates fused into a single 1-row result (raw and
    stemmed vocab counted from the same explode — Catalyst expands the
    two count_distincts with one Expand, not two scans).  Output: one
    row — (n_tokens, vocab_raw, vocab_stemmed, reduction_frac)."""
    toks = _parallel(docs).select(F.explode(_tokens()).alias("tok")).select(
        F.lower("tok").alias("tok")
    )
    return toks.select("tok", weak_stem(F.col("tok")).alias("stem")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.count_distinct("tok").cast("bigint").alias("vocab_raw"),
        F.count_distinct("stem").cast("bigint").alias("vocab_stemmed"),
        # empty corpus: no vocabulary, reduction undefined — NULL, not
        # an ANSI divide-by-zero (r9 funnel class)
        F.when(
            F.count_distinct("tok") > 0,
            F.round(
                (F.count_distinct("tok") - F.count_distinct("stem")).cast("double")
                / F.count_distinct("tok"),
                6,
            ),
        ).alias("reduction_frac"),
    )


def typo_pairs(docs: DataFrame, min_len: int = 4) -> DataFrame:
    """Typo / OCR-noise vocabulary pairing via SymSpell-style
    deletion-neighborhood blocking: two vocabulary words are candidates
    iff they share a member of {word} ∪ {word minus one char} — that
    neighborhood provably covers every Levenshtein-distance-1 pair
    (substitution: delete the differing position from both; insertion/
    deletion: the shorter word IS a deletion variant of the longer) —
    then the exact `levenshtein() <= 1` filter makes the output exact.
    The text-normalization signal a corpus-cleaning pass uses to map
    rare misspellings onto their frequent canonical forms.

    Scale shape: the variant table is vocab x (len+1) rows —
    VOCAB-bounded, never corpus-sized; the self-join key is the
    deletion variant, whose bucket sizes stay small for alpha words of
    length >= ``min_len`` (shorter words saturate the neighborhood —
    excluded by contract); the exact distance check runs only on
    candidates.  Never all-pairs, no corpus shuffle past the vocab
    aggregate.  Output: (w1, w2, n1, n2) with w1 < w2 lexicographic,
    counts from the corpus."""
    toks = _parallel(docs).select(F.explode(_tokens()).alias("w")).select(
        F.lower("w").alias("w")
    )
    words = (
        toks.filter(F.col("w").rlike("^[a-z]+$") & (F.length("w") >= min_len))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    c = F.col("w")
    dels = F.transform(
        F.sequence(F.lit(1), F.length(c)),
        lambda i: F.concat(c.substr(F.lit(1), i - 1), c.substr(i + 1, F.length(c))),
    )
    variants = words.select(
        "w", "n", F.explode(F.concat(F.array(c), dels)).alias("v")
    )
    a, b = variants.alias("a"), variants.alias("b")
    cand = (
        a.join(b, (F.col("a.v") == F.col("b.v")) & (F.col("a.w") < F.col("b.w")))
        .select(
            F.col("a.w").alias("w1"),
            F.col("b.w").alias("w2"),
            F.col("a.n").alias("n1"),
            F.col("b.n").alias("n2"),
        )
        .distinct()
    )
    return cand.filter(F.levenshtein("w1", "w2") <= 1)


def _pmi_scored(docs: DataFrame, min_count: int) -> DataFrame:
    """Shared PMI scorer: (w1, w2, c_bi, q_pmi) over the min_count-
    filtered vocab²-bounded pair table (see pmi_collocations for the
    statistic and determinism contract)."""
    w = _tokens()
    low = F.transform(w, lambda x: F.lower(x))
    toked = _parallel(docs).select(low.alias("toks"))
    t = F.col("toks")
    prs = F.when(
        F.size(t) >= 2,
        F.arrays_zip(F.slice(t, 1, F.size(t) - 1), F.slice(t, 2, F.size(t) - 1)),
    ).otherwise(F.array())
    bic = (
        toked.select(F.explode(prs).alias("b"))
        .select(F.col("b.0").alias("w1"), F.col("b.1").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c_bi"))
    )
    n_bi = bic.agg(F.sum("c_bi").cast("bigint").alias("n_bi"))
    uni = (
        toked.select(F.explode(t).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c_uni"))
    )
    n_tok = uni.agg(F.sum("c_uni").cast("bigint").alias("n_tok"))
    pmi = F.log(
        (F.col("c_bi").cast("double") / F.col("n_bi"))
        / (
            (F.col("c1").cast("double") / F.col("n_tok"))
            * (F.col("c2").cast("double") / F.col("n_tok"))
        )
    )
    return (
        bic.filter(F.col("c_bi") >= min_count)
        .join(uni.select(F.col("tok").alias("w1"), F.col("c_uni").alias("c1")), "w1")
        .join(uni.select(F.col("tok").alias("w2"), F.col("c_uni").alias("c2")), "w2")
        .crossJoin(F.broadcast(n_bi))
        .crossJoin(F.broadcast(n_tok))
        .select(
            "w1",
            "w2",
            "c_bi",
            F.round(pmi * 1_000_000).cast("bigint").alias("q_pmi"),
        )
    )


def pmi_collocations(
    docs: DataFrame, min_count: int = 5, k: int = 15
) -> DataFrame:
    """Top-k collocations by pointwise mutual information (Church &
    Hanks 1990): pairs that co-occur far more than their unigram
    frequencies predict —
    ``pmi = ln( (c_bi / n_bi) / ((c_w1/n_tok)·(c_w2/n_tok)) )``, the
    classic phrase-mining signal (word2vec's phrase pass and spaCy's
    collocation scorers use the same statistic).

    Determinism contract: the PMI is quantized to an integer
    (``round(pmi·1e6)``) before ranking, and ties break on (w1, w2) —
    so the top-k cut is bit-stable in any engine.  ``min_count``
    suppresses the low-frequency pairs whose PMI is spuriously high
    (the standard Church-Hanks caveat).

    Scale shape: everything after the two token scans is vocab-bounded
    — one (w1,w2) bigram aggregate, one unigram aggregate, two 1-row
    lazy broadcast totals; the ranking window is single-partition but
    runs over the min_count-filtered VOCAB²-bounded pair table
    (metadata-sized at any corpus scale), never over corpus rows.
    Output: (rank, w1, w2, c_bi, q_pmi)."""
    scored = _pmi_scored(docs, min_count)
    ranked = scored.withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.col("q_pmi").desc(), "w1", "w2")
        ).cast("bigint"),
    )
    return ranked.filter(F.col("rank") <= k).select(
        "rank", "w1", "w2", "c_bi", "q_pmi"
    )


def zipf_hapax_audit(docs: DataFrame) -> DataFrame:
    """Corpus vocabulary-health audit: type/token counts, hapax and dis
    legomena, type-token ratio, and the fitted Zipf slope — the
    datasheet statistics that flag synthetic or template-heavy corpora
    (natural text fits ln(count) ≈ a + s·ln(rank) with s ≈ −1; a
    near-flat slope means boilerplate, a cliff means tiny vocab).

    Determinism: the least-squares slope over (ln rank, ln count) is
    computed from EXACT integer sums — both logs are quantized to
    integer milli-units per vocab row BEFORE summation, so the Σxy /
    Σx² accumulations are order-independent bigints (at 1e3 quantization
    a 1e8-type vocabulary stays far inside int64) and the only IEEE
    arithmetic is the final closed-form division.  Ranks break ties on
    the token string.

    Scale shape: one token scan → vocab-sized count table; the ranking
    window and the six-sum aggregate run over the VOCAB, never the
    corpus.  Output: 1 row (n_types, n_tokens, hapax, dis, ttr,
    zipf_slope)."""
    toks = _parallel(docs).select(F.explode(_tokens()).alias("tok")).select(
        F.lower("tok").alias("tok")
    )
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    ranked = vocab.withColumn(
        "rnk",
        F.row_number().over(Window.orderBy(F.col("cnt").desc(), "tok")).cast("bigint"),
    ).select(
        "cnt",
        F.round(F.log(F.col("rnk").cast("double")) * 1000).cast("bigint").alias("x"),
        F.round(F.log(F.col("cnt").cast("double")) * 1000).cast("bigint").alias("y"),
    )
    agg = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.sum("cnt").cast("bigint").alias("n_tokens"),
        F.sum((F.col("cnt") == 1).cast("bigint")).cast("bigint").alias("hapax"),
        F.sum((F.col("cnt") == 2).cast("bigint")).cast("bigint").alias("dis"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    slope = (
        F.col("n_types").cast("double") * F.col("sxy")
        - F.col("sx").cast("double") * F.col("sy")
    ) / (
        F.col("n_types").cast("double") * F.col("sxx")
        - F.col("sx").cast("double") * F.col("sx")
    )
    return agg.select(
        "n_types",
        "n_tokens",
        "hapax",
        "dis",
        F.round(F.col("n_types").cast("double") / F.col("n_tokens"), 6).alias("ttr"),
        F.round(slope, 6).alias("zipf_slope"),
    )


def stupid_backoff_logprob(
    docs: DataFrame, prune_min: int = 3, alpha: float = 0.4
) -> DataFrame:
    """Stupid-backoff bigram scoring (Brants et al., EMNLP 2007 — the
    web-scale LM recipe: no discounting, just a fixed ``alpha`` penalty
    when the higher-order count is missing) against a COUNT-PRUNED
    bigram table: pairs with ``c_bi < prune_min`` are dropped from the
    model (standard LM pruning — at web scale the pruned table is what
    actually ships), and positions whose pair was pruned back off to
    ``alpha · p(w2)``.  Self-scoring with an unpruned table would never
    back off (every observed pair has c ≥ 1); pruning makes the backoff
    path real and the per-doc backoff rate a quality signal —
    template-heavy docs reuse frequent pairs (low backoff), scrambled
    text backs off constantly.

    Same scale shape as the r8 bigram_logprob rework: ONE wide exchange
    of the position stream into (doc_id, w1, w2, cnt); the pruned
    score table is vocab²-bounded and corpus-independent; scores are
    1e6-quantized integers before the cnt-weighted per-doc sum.

    Output: (doc_id, n_bigrams, n_backoff, mean_logprob)."""
    w = _tokens()
    low = F.transform(w, lambda x: F.lower(x))
    toked = _parallel(docs).select("doc_id", low.alias("toks"))
    t = F.col("toks")
    prs = F.when(
        F.size(t) >= 2,
        F.arrays_zip(F.slice(t, 1, F.size(t) - 1), F.slice(t, 2, F.size(t) - 1)),
    ).otherwise(F.array())
    doc_pairs = (
        toked.select("doc_id", F.explode(prs).alias("b"))
        .select("doc_id", F.col("b.0").alias("w1"), F.col("b.1").alias("w2"))
        .groupBy("doc_id", "w1", "w2")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    pruned = (
        doc_pairs.groupBy("w1", "w2")
        .agg(F.sum("cnt").alias("c_bi"))
        .filter(F.col("c_bi") >= prune_min)
    )
    ctx = pruned.groupBy("w1").agg(F.sum("c_bi").alias("c_ctx"))
    q_bi = F.round(
        F.log(F.col("c_bi").cast("double") / F.col("c_ctx")) * 1_000_000
    ).cast("bigint")
    pair_scores = pruned.join(ctx, "w1").select("w1", "w2", q_bi.alias("q_bi"))
    uni = (
        toked.select(F.explode(t).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c_uni"))
    )
    n_tok = uni.agg(F.sum("c_uni").cast("bigint").alias("n_tok"))
    q_bo = F.round(
        F.log(
            F.lit(alpha) * (F.col("c_uni").cast("double") / F.col("n_tok"))
        )
        * 1_000_000
    ).cast("bigint")
    w2_scores = (
        uni.crossJoin(F.broadcast(n_tok))
        .select(F.col("tok").alias("w2"), q_bo.alias("q_bo"))
    )
    scored = (
        doc_pairs.join(pair_scores, ["w1", "w2"], "left")
        .join(w2_scores, "w2")
        .select(
            "doc_id",
            "cnt",
            F.coalesce(F.col("q_bi"), F.col("q_bo")).alias("q"),
            F.col("q_bi").isNull().cast("bigint").alias("bo"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.sum("cnt").cast("bigint").alias("n_bigrams"),
        F.sum(F.col("bo") * F.col("cnt")).cast("bigint").alias("n_backoff"),
        F.round(
            (F.sum(F.col("q") * F.col("cnt")).cast("double") / F.sum("cnt"))
            / 1_000_000,
            6,
        ).alias("mean_logprob"),
    )


def char_entropy(docs: DataFrame) -> DataFrame:
    """Per-document character-level Shannon entropy — the
    compression-ratio quality proxy (Shannon 1948; used as a junk gate
    in C4-descendant pipelines): binary blobs and base64 runs score
    near ln(alphabet), stuck-key/repetition junk scores near 0, natural
    text sits in a stable band.

    Determinism: H = ln(n) − (Σ cnt·ln cnt)/n with the per-character
    ln(cnt) quantized to an integer BEFORE the weighted sum, so the
    only order-dependent accumulation is over exact bigints; ln(n) and
    the final division are one fixed IEEE sequence per doc.  The
    empty-pattern split('') chars are byte-identical across engines
    (verified against DuckDB's regexp_split_to_array).

    Scale shape: one narrow char explode → one (doc_id, char) partial-
    aggregated exchange → one doc_id aggregate.  Output: (doc_id,
    n_chars, n_distinct, entropy)."""
    ch = _parallel(docs).select(
        "doc_id", F.explode(F.split(F.col("text"), "")).alias("c")
    )
    counts = ch.groupBy("doc_id", "c").agg(F.count(F.lit(1)).alias("cnt"))
    per = counts.select(
        "doc_id",
        "cnt",
        F.round(F.log(F.col("cnt").cast("double")) * 1_000_000)
        .cast("bigint")
        .alias("qln"),
    )
    agg = per.groupBy("doc_id").agg(
        F.sum("cnt").cast("bigint").alias("n_chars"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        F.sum(F.col("cnt") * F.col("qln")).cast("bigint").alias("s"),
    )
    h = F.log(F.col("n_chars").cast("double")) - (
        F.col("s").cast("double") / F.col("n_chars")
    ) / 1_000_000
    return agg.select(
        "doc_id", "n_chars", "n_distinct", F.round(h, 6).alias("entropy")
    )


def pmi_topic_clusters(
    docs: DataFrame,
    min_count: int = 5,
    q_pmi_min: int = 300_000,
    rounds: int = 10,
    int_labels: bool = False,
) -> DataFrame:
    """Topic word-clusters: connected components of the strong-PMI
    co-occurrence graph — words joined when their association clears
    ``q_pmi_min`` (0.3 nats at the 1e6 quantization) form phrase/topic
    groups, the word2vec-phrases / collocation-graph view of a corpus.

    The graph is VOCAB-bounded (nodes = words with ≥1 strong edge), so
    the component labeling is metadata-scale regardless of corpus size;
    the corpus is touched only by the shared PMI scorer's two token
    scans.  Labeling runs ``rounds`` hook+shortcut rounds (min-label
    propagation + pointer jumping — the dedup_clusters_fast scheme,
    converged for any component with diameter ≤ 2^rounds, i.e. always
    at vocabulary scale), with the tiny edge/label tables
    localCheckpoint-ed per round (iterative-algorithm exception).  The
    oracle is the exact recursive-CTE reachability closure — a hash
    match proves the fixed-round propagation converged.

    Output: (word, cluster_id) for every word on a strong edge,
    cluster_id = the component's lexicographically-least word.

    ``int_labels=True`` runs the hook+shortcut rounds over dense
    ORDER-PRESERVING integer word ids (row_number over the sorted
    vocab-bounded node set — a single-partition window, acceptable
    because the node table is metadata-scale by construction) and maps
    labels back to words once at the end: the graph_kcore/pagerank
    bigint-key treatment (8-byte shuffle keys instead of strings).
    Order preservation makes min-int ≡ min-lex-word, so the output is
    IDENTICAL (asserted in tests).  r9 A/B at sf0.1 in SCALING.md
    decides the default."""
    scored = _pmi_scored(docs, min_count)
    e1 = scored.filter(
        (F.col("q_pmi") >= q_pmi_min) & (F.col("w1") != F.col("w2"))
    ).select("w1", "w2")
    edges = (
        e1.unionAll(e1.select(F.col("w2").alias("w1"), F.col("w1").alias("w2")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    if int_labels:
        from pyspark.sql import Window as W

        word_ids = (
            edges.select(F.col("w1").alias("word"))
            .distinct()
            .withColumn(
                "wid", F.row_number().over(W.orderBy("word")).cast("bigint")
            )
            .localCheckpoint(eager=True)
        )
        iedges = (
            edges.join(word_ids.withColumnRenamed("w1", "word"), edges["w1"] == F.col("word"))
            .select(F.col("wid").alias("u"), "w2")
            .join(
                word_ids.select(F.col("word").alias("_w2"), F.col("wid").alias("v")),
                F.col("w2") == F.col("_w2"),
            )
            .select("u", "v")
            .localCheckpoint(eager=True)
        )
        labels = (
            iedges.select(F.col("u").alias("node")).distinct()
            .withColumn("cluster", F.col("node"))
            .localCheckpoint(eager=True)
        )
        for _ in range(rounds):
            nb_min = (
                iedges.join(labels, iedges["v"] == labels["node"])
                .groupBy("u")
                .agg(F.min("cluster").alias("nb_min"))
            )
            hooked = labels.join(
                nb_min, labels["node"] == nb_min["u"], "left"
            ).select(
                "node",
                F.least(
                    F.col("cluster"),
                    F.coalesce(F.col("nb_min"), F.col("cluster")),
                ).alias("cluster"),
            )
            parent = hooked.select(
                F.col("node").alias("p_node"), F.col("cluster").alias("p_label")
            )
            labels = (
                hooked.join(parent, hooked["cluster"] == parent["p_node"], "left")
                .select(
                    "node",
                    F.least(
                        F.col("cluster"),
                        F.coalesce(F.col("p_label"), F.col("cluster")),
                    ).alias("cluster"),
                )
                .localCheckpoint(eager=True)
            )
        return (
            labels.join(word_ids, labels["node"] == word_ids["wid"])
            .select("word", "cluster")
            .join(
                word_ids.select(
                    F.col("wid").alias("cluster"), F.col("word").alias("cluster_id")
                ),
                "cluster",
            )
            .select("word", "cluster_id")
        )
    labels = (
        edges.select(F.col("w1").alias("word"))
        .distinct()
        .withColumn("cluster_id", F.col("word"))
        .localCheckpoint(eager=True)
    )
    for _ in range(rounds):
        nb_min = (
            edges.join(labels, edges["w2"] == labels["word"])
            .groupBy("w1")
            .agg(F.min("cluster_id").alias("nb_min"))
        )
        hooked = (
            labels.join(nb_min, labels["word"] == nb_min["w1"], "left")
            .select(
                "word",
                F.least(
                    F.col("cluster_id"),
                    F.coalesce(F.col("nb_min"), F.col("cluster_id")),
                ).alias("cluster_id"),
            )
        )
        parent = hooked.select(
            F.col("word").alias("p_word"), F.col("cluster_id").alias("p_label")
        )
        labels = (
            hooked.join(parent, hooked["cluster_id"] == parent["p_word"], "left")
            .select(
                "word",
                F.least(
                    F.col("cluster_id"),
                    F.coalesce(F.col("p_label"), F.col("cluster_id")),
                ).alias("cluster_id"),
            )
            .localCheckpoint(eager=True)
        )
    return labels.select("word", "cluster_id")


def ngram_novelty(docs: DataFrame, n: int = 3) -> DataFrame:
    """Per-document n-gram novelty: the fraction of a document's
    DISTINCT word n-grams that occur in NO other document (corpus
    df = 1) — the memorization/derivativeness axis of web-corpus QC
    (RefinedWeb and the memorization literature report "novel n-gram"
    fractions; a low-novelty doc is assembled from text that exists
    elsewhere even when no single pair crosses a dedup threshold).
    Complements dup_span_fraction (which localizes WHICH spans repeat)
    with a corpus-wide scalar per doc.

    Scale shape: one distinct (doc, ngram) explode, one vocab-keyed df
    aggregate, one join back keyed the same, one doc aggregate — the
    winnow/shingle pipeline's exact plan class, nothing pairwise.
    Docs with fewer than n words have no n-grams: novelty NULL.

    Output: (doc_id, n_ngrams, n_novel, novelty) rounded 6."""
    # token array projected to a column first (see dedup.shingles, r12)
    w = F.col("w")
    grams = F.when(
        F.size(w) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - (n - 1)),
            lambda i: F.array_join(F.slice(w, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    dg = (
        _parallel(docs)
        .select("doc_id", _tokens().alias("w"))
        .select("doc_id", F.explode(grams).alias("g"))
        .distinct()
    )
    dfreq = dg.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    per_doc = (
        dg.join(dfreq, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_ngrams"),
            F.sum((F.col("df") == 1).cast("bigint")).cast("bigint").alias("n_novel"),
        )
    )
    return docs.select("doc_id").join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_ngrams", F.lit(0)).cast("bigint").alias("n_ngrams"),
        F.coalesce("n_novel", F.lit(0)).cast("bigint").alias("n_novel"),
        F.when(
            F.col("n_ngrams").isNotNull(),
            F.round(F.col("n_novel").cast("double") / F.col("n_ngrams"), 6),
        ).alias("novelty"),
    )


def dedup_rate_by_source(docs: DataFrame) -> DataFrame:
    """Per-source duplication dashboard: how much of each provenance
    bucket is exact-duplicated (md5 of the raw text seen on >1 doc
    CORPUS-WIDE) or token-set-duplicated (the order-insensitive
    fingerprint) — the per-source companion every curation report
    pairs with corpus_datasheet when deciding which source to
    re-crawl or down-weight (cross-source duplication charges BOTH
    sources: a doc is a duplicate wherever its content also lives).

    One digest projection, two vocab-of-digests aggregates, one
    source-keyed rollup — no pair joins.  Output: (source, n_docs,
    n_exact_dup, n_fp_dup, exact_rate, fp_rate), rates rounded 6."""
    toks = F.array_sort(F.array_distinct(_tokens()))
    digests = _parallel(docs).select(
        "doc_id",
        "source",
        F.md5("text").alias("h_exact"),
        F.md5(F.lower(F.array_join(toks, " "))).alias("h_fp"),
    )
    ex = digests.groupBy("h_exact").agg(F.count(F.lit(1)).alias("n_ex"))
    fp = digests.groupBy("h_fp").agg(F.count(F.lit(1)).alias("n_fp"))
    marked = (
        digests.join(ex, "h_exact")
        .join(fp, "h_fp")
        .select(
            "source",
            (F.col("n_ex") > 1).cast("bigint").alias("is_ex"),
            (F.col("n_fp") > 1).cast("bigint").alias("is_fp"),
        )
    )
    return (
        marked.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("is_ex").cast("bigint").alias("n_exact_dup"),
            F.sum("is_fp").cast("bigint").alias("n_fp_dup"),
        )
        .select(
            "source",
            "n_docs",
            "n_exact_dup",
            "n_fp_dup",
            F.round(F.col("n_exact_dup").cast("double") / F.col("n_docs"), 6).alias("exact_rate"),
            F.round(F.col("n_fp_dup").cast("double") / F.col("n_docs"), 6).alias("fp_rate"),
        )
    )
