"""Property-based invariants for ExactSubstr removal (Lee et al. 2022).

Random small corpora over a tiny alphabet force heavy window
collisions; the structural theorems must hold on all of them:

* cleaned tokens are a SUBSEQUENCE of the original tokens (removal
  never reorders or invents);
* n_tokens - n_removed = len(cleaned tokens), n_removed ∈ [0, n_tokens];
* a corpus of all-distinct documents with no shared span removes
  nothing;
* duplicating an entire document wipes both copies completely when the
  doc is at least one span long (every window is now cross-doc).
"""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from oracdc_spark.operators.winnow import exact_substr_trim

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_DOC = st.lists(
    st.sampled_from(["a", "b", "c", "dd"]), min_size=0, max_size=12
).map(" ".join)
_CORPUS = st.lists(_DOC, min_size=1, max_size=6)

SPAN = 3


def _df(spark, docs):
    return spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )


def _is_subsequence(small, big):
    it = iter(big)
    return all(tok in it for tok in small)


@given(docs=_CORPUS)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_trim_output_is_subsequence_with_consistent_counts(spark, docs):
    out = {r.doc_id: r for r in exact_substr_trim(_df(spark, docs), span=SPAN).collect()}
    assert set(out) == set(range(len(docs)))
    for i, text in enumerate(docs):
        orig = text.split()
        cleaned = out[i].cleaned_text.split() if out[i].cleaned_text else []
        assert _is_subsequence(cleaned, orig)
        assert out[i].n_tokens == len(orig)
        assert 0 <= out[i].n_removed <= len(orig)
        assert len(cleaned) == out[i].n_tokens - out[i].n_removed


@given(doc=_DOC.filter(lambda t: len(t.split()) >= SPAN))
@settings(**_SETTINGS)
@pytest.mark.slow
def test_whole_doc_duplicate_wipes_both_copies(spark, doc):
    out = exact_substr_trim(_df(spark, [doc, doc]), span=SPAN).collect()
    for r in out:
        assert r.n_removed == r.n_tokens
        assert (r.cleaned_text or "") == ""


# ---------------------------------------------------------------------------
# Winnowing fingerprint selection (Schleimer et al., SIGMOD 2003)
# ---------------------------------------------------------------------------

import hashlib  # noqa: E402

from oracdc_spark.operators.winnow import (  # noqa: E402
    WINNOW_K,
    WINNOW_W,
    winnow_fingerprints,
)


def _model_fps(doc, k=WINNOW_K, w=WINNOW_W):
    toks = doc.split()
    grams = [
        " ".join(toks[i : i + k]).lower() for i in range(len(toks) - k + 1)
    ]
    hs = [int(hashlib.md5(g.encode()).hexdigest()[:15], 16) for g in grams]
    return {min(hs[p : p + w]) for p in range(len(hs) - w + 1)}


@given(docs=_CORPUS)
@settings(**_SETTINGS)
def test_winnow_fingerprints_match_model(spark, docs):
    """The window-min selection equals a literal Python winnow (same
    md5-prefix hash) on every corpus: full windows only, paper window
    count m-k-w+2, short docs select nothing."""
    rows = winnow_fingerprints(_df(spark, docs)).collect()
    got = {}
    for r in rows:
        got.setdefault(r.doc_id, set()).add(r.fp)
    want = {d: _model_fps(doc) for d, doc in enumerate(docs) if _model_fps(doc)}
    assert got == want


@given(
    pre=st.lists(st.sampled_from(["x", "y"]), max_size=4).map(" ".join),
    run=st.lists(
        st.sampled_from(["a", "b", "c", "dd"]),
        min_size=WINNOW_W + WINNOW_K - 1,
        max_size=WINNOW_W + WINNOW_K + 3,
    ).map(" ".join),
    suf=st.lists(st.sampled_from(["z", "w"]), max_size=4).map(" ".join),
)
@settings(**_SETTINGS)
def test_winnow_guarantee_shared_run_shares_fingerprint(spark, pre, run, suf):
    """The winnowing GUARANTEE: two documents sharing a token run of at
    least w+k-1 tokens share at least one selected fingerprint — the
    property that makes the candidate join complete at the configured
    match length."""
    doc_a = run
    doc_b = " ".join(x for x in (pre, run, suf) if x)
    rows = winnow_fingerprints(_df(spark, [doc_a, doc_b])).collect()
    fps = {}
    for r in rows:
        fps.setdefault(r.doc_id, set()).add(r.fp)
    assert fps.get(0) and fps.get(1) and fps[0] & fps[1]


def _span_model(docs, span=SPAN):
    """Scalar gram/coverage model shared by the full-replay theorems:
    per doc, the 1-based positions of its span-grams, each gram's
    distinct-doc count, and the covered-position union of cross-doc
    duplicated windows."""
    grams_of = {}
    for i, t in enumerate(docs):
        toks = [w.lower() for w in t.split()]
        grams_of[i] = [
            " ".join(toks[p : p + span]) for p in range(len(toks) - span + 1)
        ]
    df = {}
    for i, gs in grams_of.items():
        for g in set(gs):
            df[g] = df.get(g, 0) + 1
    covered = {}
    for i, gs in grams_of.items():
        cov = set()
        for p0, g in enumerate(gs):
            if df[g] >= 2:
                cov.update(range(p0 + 1, p0 + span + 1))
        covered[i] = cov
    return grams_of, df, covered


@given(docs=_CORPUS)
@settings(**_SETTINGS)
def test_dup_span_fraction_matches_full_replay(spark, docs):
    from decimal import ROUND_HALF_UP, Decimal

    from oracdc_spark.operators.winnow import dup_span_fraction

    got = {
        (r.doc_id, r.n_spans, r.n_dup_spans, r.dup_fraction)
        for r in dup_span_fraction(_df(spark, docs), span=SPAN).collect()
    }
    grams_of, df, _cov = _span_model(docs)
    expect = set()
    for i, gs in grams_of.items():
        if not gs:
            continue  # short docs have no span row
        n_dup = sum(1 for g in gs if df[g] >= 2)
        frac = float(
            Decimal(repr(n_dup / len(gs))).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP
            )
        )
        expect.add((i, len(gs), n_dup, frac))
    assert got == expect


@given(docs=_CORPUS)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_exact_substr_trim_matches_full_replay(spark, docs):
    got = {
        (r.doc_id, r.n_tokens, r.n_removed, r.cleaned_text)
        for r in exact_substr_trim(_df(spark, docs), span=SPAN).collect()
    }
    _grams, _df_, covered = _span_model(docs)
    expect = set()
    for i, t in enumerate(docs):
        toks = t.split()
        cov = covered[i]
        cleaned = " ".join(
            w for p, w in enumerate(toks, start=1) if p not in cov
        )
        expect.add((i, len(toks), len(cov), cleaned))
    assert got == expect
