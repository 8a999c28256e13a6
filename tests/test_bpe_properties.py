"""Property: distributed BPE training equals a scalar Sennrich model.

`bpe_merges` is the engine's most algorithmically entangled text
operator — per-step pair counts feed a tie-broken argmax that rewrites
every sequence before the next count, and the merge application is the
doubled-space single-pass greedy-left encoding (double every space,
one plain-replace pass that consumes one space per side so the scan
chains skip-by-two, collapse) — plain replace being left-to-right
non-overlapping in both Spark and DuckDB.  A scalar learn_bpe replay
(Sennrich et al.
2016, simplified to the engine's no-end-marker contract) on random
corpora pins all of it: the word-TYPE weighting (types counted once,
weighted by corpus frequency), overlapping pair multiplicity
('aaa' counts 'a a' twice per occurrence), (freq desc, pair asc)
tie-break, greedy-left merge semantics, and the chain's termination
when a step finds no pairs.
"""

from __future__ import annotations

import pytest

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from oracdc_spark.operators.textops import bpe_compression, bpe_merges

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# Tiny symbol domain forces deep merge interactions and freq ties;
# '7x' and 'A1' exercise the [a-z]+ type filter post-lowercase.
_WORD = st.sampled_from(
    ["a", "b", "ab", "aab", "abab", "aaa", "aaaa", "aaaaa", "bb", "7x", "A1"]
)
_DOC = st.lists(_WORD, min_size=0, max_size=8).map(" ".join)
_CORPUS = st.lists(_DOC, min_size=1, max_size=8)


def _greedy_merge(sym, a, b):
    out, i = [], 0
    while i < len(sym):
        if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return out


def _model(docs, steps):
    words = Counter()
    for doc in docs:
        for w in doc.split():
            w = w.lower()
            if w and all("a" <= c <= "z" for c in w):
                words[w] += 1
    seqs = {w: list(w) for w in words}
    out = []
    for step in range(1, steps + 1):
        pairs = Counter()
        for w, sym in seqs.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += words[w]
        if not pairs:
            break
        best = min(pairs, key=lambda p: (-pairs[p], f"{p[0]} {p[1]}"))
        out.append((step, f"{best[0]} {best[1]}", best[0] + best[1], pairs[best]))
        seqs = {w: _greedy_merge(sym, *best) for w, sym in seqs.items()}
    return out


@given(docs=_CORPUS)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_bpe_merges_equal_scalar_sennrich_model(spark, docs):
    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    got = sorted(
        (r.step, r.pair, r.merged, r.freq) for r in bpe_merges(df, steps=3).collect()
    )
    assert got == _model(docs, 3)

# --- bpe_compression: the sizing audit over the same chain ------------
#
# r10 (ADVICE item 1): the audit's seqs aggregate used to be emptied by
# a crossJoin against an EMPTY per-step argmax (a corpus of only
# single-letter word types has no pairs), reporting n_word_types=0 and
# NULL symbols instead of before==after.  The chain now left-joins the
# 1-row argmax on TRUE with a NULL-pair guard; this model pins the
# intended behavior — a pairless step is a no-op and compression is
# exactly symbols_before / symbols_after over the surviving merges.

# Biased toward pairless corpora: single-letter types plus the
# filter-rejected tokens, with the multi-letter types mixed in at low
# weight so both branches of the guard are exercised.
_PAIRLESS_WORD = st.sampled_from(["a", "b", "7x", "A1"])
_MIXED_WORD = st.one_of(_PAIRLESS_WORD, _WORD)
_MIXED_DOC = st.lists(_MIXED_WORD, min_size=0, max_size=8).map(" ".join)
_MIXED_CORPUS = st.lists(_MIXED_DOC, min_size=1, max_size=8)


def _compression_model(docs, steps):
    words = Counter()
    for doc in docs:
        for w in doc.split():
            w = w.lower()
            if w and all("a" <= c <= "z" for c in w):
                words[w] += 1
    if not words:
        return (0, None, None, None, None)
    seqs = {w: list(w) for w in words}
    for _ in range(steps):
        pairs = Counter()
        for w, sym in seqs.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += words[w]
        if not pairs:
            break  # pairless step: seqs survive unchanged
        best = min(pairs, key=lambda p: (-pairs[p], f"{p[0]} {p[1]}"))
        seqs = {w: _greedy_merge(sym, *best) for w, sym in seqs.items()}
    n_words = sum(words.values())
    before = sum(c * len(w) for w, c in words.items())
    after = sum(c * len(seqs[w]) for w, c in words.items())
    return (len(words), n_words, before, after, round(before / after, 6))


@given(docs=_MIXED_CORPUS)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_bpe_compression_equals_scalar_model(spark, docs):
    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    [r] = bpe_compression(df, steps=3).collect()
    got = (r.n_word_types, r.n_words, r.symbols_before, r.symbols_after, r.compression)
    assert got == _compression_model(docs, 3)


def test_bpe_compression_pairless_corpus_is_noop(spark):
    # the exact ADVICE reproducer: only single-letter word types
    df = spark.createDataFrame(
        [(0, "a b a"), (1, "b 7x A1")], "doc_id long, text string"
    )
    [r] = bpe_compression(df, steps=3).collect()
    assert r.n_word_types == 2
    assert r.symbols_before == r.symbols_after == 4
    assert r.compression == 1.0
