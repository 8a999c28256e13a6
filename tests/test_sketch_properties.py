"""Property-based theorems for the sketch family (CMS / HLL / Bloom).

At 100 TB these structures are only useful because of three theorems —
each asserted here on arbitrary random corpora, not fixtures:

* CMS is ONE-SIDED (estimate >= true count for EVERY n-gram, not just
  the audited top-k) and MERGEABLE (sketch of a union = cellwise sum of
  the parts — the per-partition/per-day combine the operator's 100 TB
  story depends on);
* HLL registers are MERGEABLE by per-bucket max (union sketch = max of
  part sketches) — the property that lets daily sketches roll up into
  monthly cardinalities without re-reading data;
* Bloom has NO FALSE NEGATIVES (every inserted item probes positive),
  is mergeable by bitwise OR, and therefore `bloom_prune` is LOSSLESS:
  pruning a probe side against a build side never drops a row that
  would have joined.
"""

from __future__ import annotations

import pytest

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import pyspark.sql.functions as F

from oracdc_spark.operators.textops import (
    bloom_build,
    bloom_prune,
    cms_estimate_topk,
    cms_sketch,
    hll_registers,
    _gram_hash,
)

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_DOC = st.lists(
    st.sampled_from(["a", "b", "c", "dd", "ee"]), min_size=0, max_size=12
).map(" ".join)
_CORPUS = st.lists(_DOC, min_size=1, max_size=10)


def _df(spark, docs):
    return spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")


def _bigram_counts(docs):
    c = Counter()
    for doc in docs:
        toks = doc.split()
        for i in range(len(toks) - 1):
            c[" ".join(toks[i : i + 2]).lower()] += 1
    return c


@given(docs=_CORPUS)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_cms_one_sided_for_every_ngram(spark, docs):
    exact = _bigram_counts(docs)
    if not exact:
        return
    rows = cms_estimate_topk(_df(spark, docs), n=2, k=10_000).collect()
    got = {r.ngram: (r.exact_n, r.est_n) for r in rows}
    assert set(got) == set(exact)  # k >> distinct: the audit covers all
    for ngram, true_n in exact.items():
        ex, est = got[ngram]
        assert ex == true_n  # the exact leg equals the Python count
        assert est >= true_n  # the one-sided CMS guarantee


@given(docs_a=_CORPUS, docs_b=_CORPUS)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_cms_merges_by_cellwise_sum(spark, docs_a, docs_b):
    def cells(docs):
        return {
            (r.d, r.bucket): r.cnt
            for r in cms_sketch(_df(spark, docs), n=2).collect()
        }

    a, b = cells(docs_a), cells(docs_b)
    merged = Counter()
    for part in (a, b):
        for k, v in part.items():
            merged[k] += v
    assert cells(docs_a + docs_b) == {k: v for k, v in merged.items() if v}


@given(docs_a=_CORPUS, docs_b=_CORPUS)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_hll_merges_by_bucket_max(spark, docs_a, docs_b):
    def regs(docs):
        toks = (
            _df(spark, docs)
            .select(F.explode(F.split(F.trim("text"), r"\s+")).alias("tok"))
            .filter(F.col("tok") != "")
            .select(_gram_hash(F.lower("tok")).alias("h"))
        )
        return {r.bucket: r.m_j for r in hll_registers(toks).collect()}

    a, b = regs(docs_a), regs(docs_b)
    merged = {k: max(a.get(k, 0), b.get(k, 0)) for k in set(a) | set(b)}
    assert regs(docs_a + docs_b) == merged


@given(docs=_CORPUS, probes=_CORPUS)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_bloom_no_false_negatives_and_lossless_prune(spark, docs, probes):
    toks = (
        _df(spark, docs)
        .select(F.explode(F.split(F.trim("text"), r"\s+")).alias("tok"))
        .filter(F.col("tok") != "")
    )
    filt = bloom_build(toks)
    inserted = {t for d in docs for t in d.split()}
    probe = spark.createDataFrame(
        [(i, t) for i, d in enumerate(probes) for t in d.split()]
        or [(0, "__none__")],
        "row_id long, tok string",
    )
    kept = {(r.row_id, r.tok) for r in bloom_prune(probe, "tok", filt).collect()}
    for r in probe.collect():
        if r.tok in inserted:  # no false negative, row identity intact
            assert (r.row_id, r.tok) in kept


def _h60(s):
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


@given(docs=_CORPUS)
@settings(**_SETTINGS)
def test_cms_cells_match_exact_sketch_replay(spark, docs):
    """Beyond one-sidedness: the CMS cell table IS a pure function of
    the corpus — every (d, bucket, cnt) cell equals a scalar replay of
    the md5-prefix hash and the mod-P pairwise-independent bucket
    family (reduce-before-multiply order included).

    The replay uses LITERAL hash-family constants, not the module's —
    r12 mutation audit: with ``from textops import _CMS_A, _CMS_B`` a
    consistent corruption of the family (9173 → 9172 in row 0) passed
    every sketch property (the one-sided bound holds for ANY hash
    family, and a shared-constant replay is bias-blind — the same
    two-leg-anchoring channel as the r11 NUMBER-bias finding).  The
    driver's DuckDB oracle for ``text_cms_topk`` hard-codes the same
    literals, so pytest and the oracle now pin the family from two
    independent directions; the companion assertion makes a DELIBERATE
    family change update this test consciously."""
    from oracdc_spark.operators.textops import (
        CMS_DEPTH,
        CMS_WIDTH,
        _CMS_A,
        _CMS_B,
        _CMS_P,
        cms_sketch,
    )

    # the published family, frozen as literals (mirrors the DuckDB
    # oracle text in __spark_entry__ — see text_cms_topk's SQL)
    P, W, DEPTH = 2147483647, 1024, 4
    A = (1009, 2003, 4001, 8009)
    B = (9173, 5087, 3259, 1427)
    assert (CMS_DEPTH, CMS_WIDTH, _CMS_P) == (DEPTH, W, P)
    assert (tuple(_CMS_A), tuple(_CMS_B)) == (A, B), (
        "CMS hash family changed — update these literals AND the DuckDB "
        "oracle in __spark_entry__ in the same commit"
    )

    got = {(r.d, r.bucket, r.cnt) for r in cms_sketch(_df(spark, docs), n=2).collect()}
    cells: dict[tuple, int] = {}
    for ngram, times in _bigram_counts(docs).items():
        h = _h60(ngram)
        for d in range(DEPTH):
            b = ((A[d] * (h % P) + B[d]) % P) % W
            cells[(d, b)] = cells.get((d, b), 0) + times
    assert got == {(d, b, c) for (d, b), c in cells.items()}


@given(docs=_CORPUS)
@settings(**_SETTINGS)
def test_hll_registers_match_exact_sketch_replay(spark, docs):
    """The HLL register table equals a scalar replay: bucket = top 10
    hash bits, register = max rho over DISTINCT lowercase tokens with
    rho = leading zeros of the low 50 bits + 1 (all-zero rest = 51).

    The replay uses the LITERAL 10/50 split, not the module's
    ``_HLL_REST_BITS`` — r12 mutation audit: with the constant imported,
    a consistent layout shift (60→59 total bits) passed both HLL
    properties (the replay moved with the engine — same shared-constant
    channel as the CMS family finding in this file).  The DuckDB oracle
    for ``text_hll_distinct`` hard-codes the same literals, so the two
    legs are now independent."""
    from oracdc_spark.operators.textops import (
        _HLL_REST_BITS,
        _gram_hash,
        hll_registers,
    )
    import pyspark.sql.functions as F

    REST = 50  # 60-bit md5-prefix hash split as 10 bucket + 50 rho bits
    assert _HLL_REST_BITS == REST, (
        "HLL layout changed — update this literal AND the DuckDB oracle "
        "in __spark_entry__ in the same commit"
    )

    toks = (
        _df(spark, docs)
        .select(F.explode(F.split(F.trim("text"), r"\s+")).alias("tok"))
        .filter("tok <> ''")
        .select(F.lower("tok").alias("tok"))
    )
    got = {
        (r.bucket, r.m_j)
        for r in hll_registers(
            toks.select(_gram_hash(F.col("tok")).alias("h"))
        ).collect()
    }
    regs: dict[int, int] = {}
    for tok in {w.lower() for doc in docs for w in doc.split()}:
        h = _h60(tok)
        bucket = h >> REST
        rest = h % (1 << REST)
        rho = REST + 1 if rest == 0 else REST - rest.bit_length() + 1
        regs[bucket] = max(regs.get(bucket, 0), rho)
    # the engine hashes tokens WITH multiplicity; registers are maxes,
    # so multiplicity is immaterial — the distinct replay must match
    assert got == set(regs.items())


@given(docs=_CORPUS)
@settings(**_SETTINGS)
def test_bloom_bits_match_exact_literal_replay(spark, docs):
    """The Bloom word table IS a pure function of the corpus under the
    PUBLISHED hash family — every (word_idx, bits) row equals a scalar
    replay with LITERAL constants (r12 mutation audit: the only prior
    Bloom test was no-false-negatives + lossless prune, which ANY
    consistent hash family satisfies, so a family corruption
    (9173 → 9172) was invisible to pytest; the DuckDB oracle for
    ``text_bloom_membership`` hard-codes these literals, and now so
    does a pytest leg)."""
    from oracdc_spark.operators.textops import (
        BLOOM_K,
        BLOOM_M_BITS,
        _BLOOM_A,
        _BLOOM_B,
        bloom_build,
    )

    P, M, K = 2147483647, 32768, 3
    A, B = (1009, 2003, 4001), (9173, 5087, 3259)
    assert (BLOOM_M_BITS, BLOOM_K) == (M, K)
    assert (tuple(_BLOOM_A), tuple(_BLOOM_B)) == (A, B), (
        "Bloom hash family changed — update these literals AND the "
        "DuckDB oracle in __spark_entry__ in the same commit"
    )

    toks = (
        _df(spark, docs)
        .select(F.explode(F.split(F.trim("text"), r"\s+")).alias("tok"))
        .filter(F.col("tok") != "")
    )
    got = {(r.word_idx, r.bits) for r in bloom_build(toks).collect()}
    words: dict[int, int] = {}
    for tok in {t for d in docs for t in d.split()}:
        h = _h60(tok)
        for i in range(K):
            pos = ((A[i] * (h % P) + B[i]) % P) % M
            words[pos >> 5] = words.get(pos >> 5, 0) | (1 << (pos % 32))
    assert got == set(words.items())
