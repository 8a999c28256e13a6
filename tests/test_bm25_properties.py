"""Property: distributed BM25 equals a literal scalar Okapi model.

`bm25_rank` documents an exact integer form (k1=6/5, b=3/4, fractions
cleared by 10·total) so the score is one IEEE division of exact
bigints; this replays the same arithmetic in plain Python on random
corpora — tf, Robertson idf quantization, the cleared-fraction
denominator, ranking and ties (equal scores break on doc_id) — and
requires the full ranked output to match.
"""

from __future__ import annotations

import pytest

import math
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from oracdc_spark.operators.textops import bm25_rank

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_TERMS = ("a", "b")
_DOC = st.lists(
    st.sampled_from(["a", "b", "c", "dd"]), min_size=0, max_size=10
).map(" ".join)
_CORPUS = st.lists(_DOC, min_size=1, max_size=10)


def _model(docs, terms, k):
    toks = [d.split() for d in docs]
    n_docs = len(docs)
    total = sum(len(t) for t in toks)
    dl = {i: len(t) for i, t in enumerate(toks) if t}
    out = {}
    for term in terms:
        tf = {i: t.count(term) for i, t in enumerate(toks) if term in t}
        if not tf:
            continue
        df = len(tf)
        idf_q = round(
            math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5)) * 1_000_000
        )
        scored = []
        for d, f in tf.items():
            num = float(idf_q * 22 * f * total)
            den = float(10 * total * f + 3 * total + 9 * n_docs * dl[d])
            scored.append((d, f, num / den / 1_000_000.0))
        scored.sort(key=lambda r: (-r[2], r[0]))
        # Spark F.round on double = BigDecimal(Double.toString) HALF_UP,
        # which is Decimal(repr(x)) HALF_UP — NOT Python's banker's round
        out[term] = [
            (
                rank + 1,
                d,
                f,
                float(
                    Decimal(repr(s)).quantize(
                        Decimal("0.000001"), rounding=ROUND_HALF_UP
                    )
                ),
            )
            for rank, (d, f, s) in enumerate(scored[:k])
        ]
    return out


@given(docs=_CORPUS)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_bm25_matches_scalar_model(spark, docs):
    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    got = {}
    for r in bm25_rank(df, query_terms=_TERMS, k=5).collect():
        got.setdefault(r.term, []).append((r.rank, r.doc_id, r.tf, r.score))
    for term in got:
        got[term].sort()
    want = _model(docs, _TERMS, 5)
    assert set(got) == set(want)
    for term in want:
        assert len(got[term]) == len(want[term])
        for (gr, gd, gf, gs), (wr, wd, wf, ws) in zip(got[term], want[term]):
            assert (gr, gd, gf) == (wr, wd, wf), f"{term}: {got[term]} vs {want[term]}"
            assert abs(gs - ws) < 1e-9


# ---------------------------------------------------------------------------
# DSIR importance weights vs a literal hashed-bucket model
# ---------------------------------------------------------------------------

import hashlib  # noqa: E402

from oracdc_spark.operators.textops import dsir_weights  # noqa: E402

_LANG_DOC = st.tuples(
    st.sampled_from(["en", "de"]),
    st.lists(st.sampled_from(["a", "b", "c", "dd"]), min_size=0, max_size=8).map(" ".join),
)
_LANG_CORPUS = st.lists(_LANG_DOC, min_size=1, max_size=10)


def _bucket(tok, buckets):
    return int(hashlib.md5(tok.lower().encode()).hexdigest()[:6], 16) % buckets


def _half_up(x):
    return int(Decimal(repr(x)).quantize(Decimal("1"), rounding=ROUND_HALF_UP))


def _model_dsir(docs, buckets, k, target="en"):
    toks = [(i, lang, t) for i, (lang, text) in enumerate(docs) for t in text.split()]
    if not toks:
        return []
    raw_n, tgt_n = {}, {}
    for _i, lang, t in toks:
        b = _bucket(t, buckets)
        raw_n[b] = raw_n.get(b, 0) + 1
        if lang == target:
            tgt_n[b] = tgt_n.get(b, 0) + 1
    raw_total = len(toks)
    tgt_total = sum(1 for _i, lang, _t in toks if lang == target)
    lr_q = {
        b: _half_up(
            (
                math.log((tgt_n.get(b, 0) + 1) / (tgt_total + buckets))
                - math.log((n + 1) / (raw_total + buckets))
            )
            * 1_000_000
        )
        for b, n in raw_n.items()
    }
    weight_q = {}
    for i, _lang, t in toks:
        weight_q[i] = weight_q.get(i, 0) + lr_q[_bucket(t, buckets)]
    ranked = sorted(weight_q.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [
        (
            rank + 1,
            d,
            float(
                Decimal(repr(wq / 1_000_000)).quantize(
                    Decimal("0.000001"), rounding=ROUND_HALF_UP
                )
            ),
        )
        for rank, (d, wq) in enumerate(ranked)
    ]


@given(docs=_LANG_CORPUS)
@settings(**_SETTINGS)
def test_dsir_matches_hashed_bucket_model(spark, docs):
    df = spark.createDataFrame(
        [(i, lang, text) for i, (lang, text) in enumerate(docs)],
        "doc_id long, lang string, text string",
    )
    got = [
        (r.rank, r.doc_id, r.weight)
        for r in dsir_weights(df, target_lang="en", buckets=16, k=5).collect()
    ]
    assert sorted(got) == _model_dsir(docs, 16, 5)
