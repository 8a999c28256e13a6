"""Property: the bigram LM scorers equal scalar models.

`bigram_logprob` (interpolated 0.75/0.25 empirical bigram) and
`stupid_backoff_logprob` (Brants et al. 2007 count-pruned backoff)
both went through the r8 one-wide-exchange rework — the position
stream aggregates once and every probability derives from vocab²
tables.  The scalar replays pin what the rework must have preserved:
corpus-level pair/context/unigram counts, the FIXED IEEE expression
shapes (0.75*(c_bi/c_ctx) + 0.25*(c_uni/N); log(alpha*(c_uni/N))),
1e6 HALF_UP score quantization before the cnt-weighted per-doc mean,
the pruning threshold's backoff routing, and the absence of <2-token
documents.
"""

from __future__ import annotations

import pytest

import math
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from oracdc_spark.operators.textops import bigram_logprob, stupid_backoff_logprob

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_DOC = st.lists(
    st.sampled_from(["a", "b", "C", "dd"]), min_size=0, max_size=10
).map(" ".join)
_CORPUS = st.lists(_DOC, min_size=1, max_size=8)


def _df(spark, docs):
    return spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")


def _qi(x):
    return int(Decimal(repr(x)).quantize(Decimal("1"), rounding=ROUND_HALF_UP))


def _r6(x):
    return float(
        Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
    )


def _counts(docs):
    toks = [[t.lower() for t in d.split()] for d in docs]
    uni = Counter(t for ts in toks for t in ts)
    doc_pairs = [
        Counter(zip(ts, ts[1:])) for ts in toks
    ]
    bi = Counter()
    for dp in doc_pairs:
        bi.update(dp)
    return toks, uni, doc_pairs, bi


@given(docs=_CORPUS)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_bigram_logprob_matches_scalar_model(spark, docs):
    got = {
        (r.doc_id, r.n_bigrams, r.mean_logprob)
        for r in bigram_logprob(_df(spark, docs)).collect()
    }
    _toks, uni, doc_pairs, bi = _counts(docs)
    n_total = sum(uni.values())
    ctx = Counter()
    for (w1, _w2), c in bi.items():
        ctx[w1] += c
    expect = set()
    for d, dp in enumerate(doc_pairs):
        if not dp:
            continue
        n = sum(dp.values())
        qsum = 0
        for (w1, w2), cnt in dp.items():
            p = 0.75 * (bi[(w1, w2)] / ctx[w1]) + 0.25 * (uni[w2] / n_total)
            qsum += _qi(math.log(p) * 1_000_000) * cnt
        expect.add((d, n, _r6((qsum / n) / 1_000_000)))
    assert got == expect


@given(docs=_CORPUS)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_stupid_backoff_matches_scalar_model(spark, docs):
    prune_min, alpha = 2, 0.4
    got = {
        (r.doc_id, r.n_bigrams, r.n_backoff, r.mean_logprob)
        for r in stupid_backoff_logprob(
            _df(spark, docs), prune_min=prune_min, alpha=alpha
        ).collect()
    }
    _toks, uni, doc_pairs, bi = _counts(docs)
    n_tok = sum(uni.values())
    pruned = {pr: c for pr, c in bi.items() if c >= prune_min}
    ctx = Counter()
    for (w1, _w2), c in pruned.items():
        ctx[w1] += c
    expect = set()
    for d, dp in enumerate(doc_pairs):
        if not dp:
            continue
        n = sum(dp.values())
        qsum = n_bo = 0
        for (w1, w2), cnt in dp.items():
            if (w1, w2) in pruned:
                q = _qi(math.log(pruned[(w1, w2)] / ctx[w1]) * 1_000_000)
            else:
                q = _qi(math.log(alpha * (uni[w2] / n_tok)) * 1_000_000)
                n_bo += cnt
            qsum += q * cnt
        expect.add((d, n, n_bo, _r6((qsum / n) / 1_000_000)))
    assert got == expect


def _unigram_counts(docs):
    toks = [[t.lower() for t in d.split()] for d in docs]
    uni = Counter(t for ts in toks for t in ts)
    return toks, uni, sum(uni.values())


@given(docs=_CORPUS)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_unigram_logprob_matches_scalar_model(spark, docs):
    from oracdc_spark.operators.textops import unigram_logprob

    got = {
        (r.doc_id, r.n_tokens, r.mean_logprob)
        for r in unigram_logprob(_df(spark, docs)).collect()
    }
    toks, uni, n_total = _unigram_counts(docs)
    expect = set()
    for d, ts in enumerate(toks):
        if not ts:
            continue
        qsum = sum(_qi(math.log(uni[t] / n_total) * 1_000_000) for t in ts)
        expect.add((d, len(ts), _r6((qsum / len(ts)) / 1_000_000)))
    assert got == expect


@given(docs=_CORPUS)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_perplexity_buckets_match_global_sort_replay(spark, docs):
    """The histogram-decomposed CCNet tertile split equals the literal
    global sort: floor-mean quantized scores, (score desc, doc_id)
    ranks, integer-cleared head/middle/tail edges."""
    from oracdc_spark.operators.textops import perplexity_buckets

    got = {
        (r.doc_id, r.q_mean_lp, r.rn, r.bucket)
        for r in perplexity_buckets(_df(spark, docs)).collect()
    }
    toks, uni, n_total = _unigram_counts(docs)
    scores = {}
    for d, ts in enumerate(toks):
        if not ts:
            continue
        qsum = sum(_qi(math.log(uni[t] / n_total) * 1_000_000) for t in ts)
        scores[d] = math.floor(qsum / len(ts))
    n = len(scores)
    expect = set()
    for rn, d in enumerate(
        sorted(scores, key=lambda d: (-scores[d], d)), start=1
    ):
        bucket = (
            "head" if 3 * rn <= n else ("middle" if 3 * rn <= 2 * n else "tail")
        )
        expect.add((d, scores[d], rn, bucket))
    assert got == expect


@given(docs=_CORPUS)
@settings(**_SETTINGS)
def test_vocab_coverage_matches_literal_cumsum(spark, docs):
    """The count-histogram closed form equals the literal rank/cumsum:
    smallest most-frequent-first vocabulary whose mass reaches
    ceil(total*pct/100)."""
    from oracdc_spark.operators.textops import vocab_coverage

    _toks, uni, n_total = _unigram_counts(docs)
    if n_total == 0:
        return  # no tokens: no coverage rows to compare
    got = {
        (r.pct, r.vocab_size, r.n_total)
        for r in vocab_coverage(_df(spark, docs)).collect()
    }
    ordered = sorted(uni.values(), reverse=True)
    expect = set()
    for pct in (50, 90, 99):
        thr = (n_total * pct + 99) // 100
        cum = k = 0
        while cum < thr:
            cum += ordered[k]
            k += 1
        expect.add((pct, k, n_total))
    assert got == expect
