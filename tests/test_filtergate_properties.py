"""Property: the per-document filter gates equal scalar models.

quality_scores / gopher_quality / c4_line_filter / language_id are
pure per-row expression maps — but each packs a half-dozen interacting
sub-rules (line splits vs whitespace tokenization, trimmed vs exact
empty-line filters, search-anchored regexes, integer-cleared ratio
gates, marker argmax ties) that a fixed corpus exercises only at one
operating point.  Scalar replays on generated multi-line documents pin
every sub-rule, including the deliberately different line conventions
(gopher keeps whitespace-only lines, C4 trims them) and the exact
cross-multiplied gate inequalities.
"""

from __future__ import annotations

import pytest

import re
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from oracdc_spark.operators.textops import (
    GOPHER_STOPWORDS,
    LANG_MARKERS,
    STOPWORDS,
    c4_line_filter,
    gopher_quality,
    language_id,
    quality_scores,
)

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_WORDS = [
    "the", "and", "der", "und", "le", "aaaa", "b#", "…", "x{",
    "javascript", "lorem", "ipsum", "Abc", "123",
]
_ENDINGS = ["", ".", "!", '?"', "...", "…"]
_LINE = st.tuples(
    st.sampled_from(["", "• ", "- ", " "]),
    st.lists(st.sampled_from(_WORDS), min_size=0, max_size=6),
    st.sampled_from(_ENDINGS),
).map(lambda t: t[0] + " ".join(t[1]) + t[2])
_DOC = st.lists(_LINE, min_size=1, max_size=5).map("\n".join).filter(
    lambda t: t.split()  # keep >= 1 token: ratio denominators stay defined
)
_CORPUS = st.lists(st.tuples(_DOC, st.sampled_from(sorted(LANG_MARKERS))),
                   min_size=1, max_size=8)


def _df(spark, corpus):
    return spark.createDataFrame(
        [(i, t, lang) for i, (t, lang) in enumerate(corpus)],
        "doc_id long, text string, lang string",
    )


def _r6(x):
    return float(
        Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
    )


@given(corpus=_CORPUS)
@settings(**_SETTINGS)
def test_quality_scores_match_scalar_model(spark, corpus):
    got = {
        (
            r.doc_id, r.n_chars_calc, r.n_tokens, r.stopword_ratio,
            r.distinct_ratio, r.mean_token_len, r.keep,
        )
        for r in quality_scores(_df(spark, corpus), min_tokens=3).collect()
    }
    expect = set()
    for i, (t, _lang) in enumerate(corpus):
        toks = t.split()
        n = len(toks)
        n_stop = sum(1 for w in toks if w in STOPWORDS)
        nonws = len(re.sub(r"\s", "", t))
        expect.add(
            (
                i, len(t), n, _r6(n_stop / n), _r6(len(set(toks)) / n),
                _r6(nonws / n), n >= 3 and n_stop / n <= 0.6,
            )
        )
    assert got == expect


@given(corpus=_CORPUS)
@settings(**_SETTINGS)
def test_gopher_quality_matches_scalar_model(spark, corpus):
    min_w, max_w = 2, 100
    got = {
        (
            r.doc_id, r.n_words, r.mean_word_len, r.n_symbols,
            r.alpha_words, r.stop_hits, r.keep,
        )
        for r in gopher_quality(
            _df(spark, corpus), min_words=min_w, max_words=max_w
        ).collect()
    }
    expect = set()
    for i, (t, _lang) in enumerate(corpus):
        toks = t.split()
        wc = len(toks)
        chars = len(re.sub(r"\s", "", t))
        sym = t.count("#") + t.count("…")
        alpha = sum(1 for w in toks if re.search("[A-Za-z]", w))
        stop_hits = len(set(toks) & set(GOPHER_STOPWORDS))
        lines = [l for l in t.split("\n") if l != ""]  # gopher keeps " "
        bullets = sum(1 for l in lines if l.startswith("•") or l.startswith("- "))
        ellipses = sum(1 for l in lines if l.endswith("...") or l.endswith("…"))
        keep = (
            min_w <= wc <= max_w
            and 3 * wc <= chars <= 10 * wc
            and 10 * sym <= wc
            and 5 * alpha >= 4 * wc
            and stop_hits >= 2
            and 10 * bullets <= 9 * len(lines)
            and 10 * ellipses <= 3 * len(lines)
        )
        expect.add((i, wc, _r6(chars / wc), sym, alpha, stop_hits, keep))
    assert got == expect


@given(corpus=_CORPUS)
@settings(**_SETTINGS)
def test_c4_line_filter_matches_scalar_model(spark, corpus):
    min_kept, min_words = 1, 2
    got = {
        (r.doc_id, r.n_lines, r.n_kept, r.kept_chars, r.keep)
        for r in c4_line_filter(
            _df(spark, corpus), min_kept_lines=min_kept, min_line_words=min_words
        ).collect()
    }
    expect = set()
    for i, (t, _lang) in enumerate(corpus):
        lines = [l for l in t.split("\n") if l.strip() != ""]  # C4 trims
        kept = [
            l
            for l in lines
            if re.search(r'[.!?"]$', l)
            and len([w for w in l.split(" ") if w]) >= min_words
            and "javascript" not in l.lower()
        ]
        keep = (
            len(kept) >= min_kept
            and "lorem ipsum" not in t.lower()
            and "{" not in t
        )
        expect.add((i, len(lines), len(kept), len("\n".join(kept)), keep))
    assert got == expect


@given(corpus=_CORPUS)
@settings(**_SETTINGS)
def test_language_id_matches_argmax_model(spark, corpus):
    got = {
        (r.doc_id, r.lang, r.pred_lang, r.match)
        for r in language_id(_df(spark, corpus)).collect()
    }
    expect = set()
    for i, (t, lang) in enumerate(corpus):
        toks = t.split()
        hits = {
            lg: sum(1 for w in toks if w in markers)
            for lg, markers in LANG_MARKERS.items()
        }
        pred = min(sorted(hits), key=lambda lg: (-hits[lg], lg))
        expect.add((i, lang, pred, lang == pred))
    assert got == expect


# --- cross-document boilerplate strip (r10 oracle-authorship audit:
# upgrade the directed-unit evidence to a scalar-model property) -------

_BP_LINE = st.sampled_from(
    ["cookie banner", "nav", "real content", "more text", "", "  ", "footer 2024"]
)
_BP_DOC = st.lists(_BP_LINE, min_size=0, max_size=6).map("\n".join)


@given(
    docs=st.lists(
        st.tuples(_BP_DOC, st.sampled_from(["siteA", "siteB"])),
        min_size=1,
        max_size=10,
    )
)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_boilerplate_strip_matches_scalar_model(spark, docs):
    """`boilerplate_strip` equals the literal two-pass scalar model: a
    byte-exact line occurring in >= min_docs DISTINCT documents of the
    SAME source is stripped from every document of that source; docs
    rebuild as the newline-join of surviving lines in original order
    (reduced-to-nothing docs emit '')."""
    from oracdc_spark.operators.textops import boilerplate_strip

    min_docs = 2
    df = spark.createDataFrame(
        [(i, t, s) for i, (t, s) in enumerate(docs)],
        "doc_id long, text string, source string",
    )
    got = {
        r.doc_id: (r.cleaned_text, r.n_lines_removed)
        for r in boilerplate_strip(df, min_docs=min_docs).collect()
    }
    seen: dict[tuple, set] = {}
    for i, (t, s) in enumerate(docs):
        for line in t.split("\n"):
            seen.setdefault((s, line), set()).add(i)
    expect = {}
    for i, (t, s) in enumerate(docs):
        kept = [ln for ln in t.split("\n") if len(seen[(s, ln)]) < min_docs]
        removed = sum(1 for ln in t.split("\n") if len(seen[(s, ln)]) >= min_docs)
        expect[i] = ("\n".join(kept), removed)
    assert got == expect


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["alpha", "BETA", "gamma", "x1", ""]),
            min_size=0,
            max_size=8,
        ).map(" ".join),
        min_size=1,
        max_size=10,
    ),
    badwords=st.sets(st.sampled_from(["alpha", "beta", "zzz"]), max_size=3),
)
@settings(**_SETTINGS)
def test_c4_badwords_matches_hashlib_model(spark, docs, badwords):
    """r10 (oracle-authorship audit): the C4 badwords page gate equals
    the scalar hashlib replay — lowercase whitespace tokens, flag each
    whose md5 is in the supplied hash set, keep iff zero hits."""
    import hashlib

    from oracdc_spark.operators.textops import c4_badwords_filter

    hashes = [hashlib.md5(w.encode()).hexdigest() for w in sorted(badwords)] or [
        hashlib.md5(b"__none__").hexdigest()
    ]
    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.n_bad, r.keep)
        for r in c4_badwords_filter(df, hashes).collect()
    }
    expect = {}
    for i, d in enumerate(docs):
        toks = [t for t in d.lower().split() if t]
        nb = sum(1 for t in toks if hashlib.md5(t.encode()).hexdigest() in hashes)
        expect[i] = (len(toks), nb, nb == 0)
    assert got == expect


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["en", "de", None]),
            st.sampled_from(["web", "books"]),
            st.lists(st.sampled_from(["ab", "c", "dd ee"]), max_size=4).map(" ".join),
        ),
        min_size=1,
        max_size=12,
    )
)
@settings(**_SETTINGS)
def test_corpus_datasheet_matches_scalar_cube_model(spark, rows):
    """r10 (oracle-authorship audit): the CUBE datasheet equals the
    scalar replay of all four grouping sets — per (lang, source) cell,
    per-lang, per-source, and grand total — with aggregated-out
    dimensions marked '(all)' and genuine NULL values '(null)', token
    count = whitespace tokens, bpe proxy = ceil(non-space chars / 4)."""
    import math

    from oracdc_spark.operators.textops import corpus_datasheet

    df = spark.createDataFrame(
        [(i, lg, src, t, len(t)) for i, (lg, src, t) in enumerate(rows)],
        "doc_id long, lang string, source string, text string, n_chars long",
    )
    got = {
        (r.lang, r.source): (r.n_docs, r.n_tokens, r.n_chars, r.bpe_est_tokens)
        for r in corpus_datasheet(df).collect()
    }
    expect = {}
    for keep_lang, keep_src in ((1, 1), (1, 0), (0, 1), (0, 0)):
        cells = {}
        for lg, src, t in rows:
            key = (
                (lg if lg is not None else "(null)") if keep_lang else "(all)",
                src if keep_src else "(all)",
            )
            tok = len(t.split())
            nch = len(t)
            bpe = math.ceil(len(t.replace(" ", "")) / 4)
            n, tk, ch, bp = cells.get(key, (0, 0, 0, 0))
            cells[key] = (n + 1, tk + tok, ch + nch, bp + bpe)
        expect.update(cells)
    assert got == expect
