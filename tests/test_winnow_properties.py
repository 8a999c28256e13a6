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
def test_whole_doc_duplicate_wipes_both_copies(spark, doc):
    out = exact_substr_trim(_df(spark, [doc, doc]), span=SPAN).collect()
    for r in out:
        assert r.n_removed == r.n_tokens
        assert (r.cleaned_text or "") == ""
