"""Winnowing fingerprint properties: the positional coverage guarantee
(shared substring of >= w+k-1 tokens => shared fingerprint), short-doc
behavior, and the stop-gram guard."""

import pyspark.sql.functions as F

from oracdc_spark.operators.winnow import (
    WINNOW_K,
    WINNOW_W,
    winnow_candidates,
    winnow_fingerprints,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_shared_passage_shares_fingerprint(spark):
    """Two documents embedding the same w+k-1-token passage in unrelated
    text must share at least one selected fingerprint (the paper's
    guarantee)."""
    passage = " ".join(f"p{i}" for i in range(WINNOW_W + WINNOW_K - 1 + 4))
    docs = _docs(
        spark,
        [
            "alpha beta gamma " + passage + " delta epsilon zeta eta",
            "one two three four " + passage + " five six seven eight",
            "totally unrelated text with nothing in common at all here",
        ],
    )
    fps = winnow_fingerprints(docs)
    a = {r.fp for r in fps.filter("doc_id = 0").collect()}
    b = {r.fp for r in fps.filter("doc_id = 1").collect()}
    c = {r.fp for r in fps.filter("doc_id = 2").collect()}
    assert a & b, "shared passage must produce a shared fingerprint"
    assert not (a & c) and not (b & c)


def test_candidates_find_the_overlapping_pair(spark):
    passage = " ".join(f"p{i}" for i in range(12))
    docs = _docs(
        spark,
        [
            "alpha beta gamma " + passage + " delta epsilon zeta eta",
            "one two three four " + passage + " five six seven eight",
            "totally unrelated text with nothing in common at all here",
        ],
    )
    pairs = {(r.doc_a, r.doc_b) for r in winnow_candidates(docs).collect()}
    assert pairs == {(0, 1)}


def test_short_docs_select_nothing(spark):
    docs = _docs(spark, ["a b", "a b c d e"])  # < k and < k+w-1 tokens
    got = winnow_fingerprints(docs).groupBy("doc_id").count().collect()
    assert all(r.doc_id != 0 for r in got)  # 2 tokens: no shingle at all


def test_stop_gram_guard_drops_ubiquitous_fingerprints(spark):
    """A passage present in EVERY document is boilerplate: with max_df
    below the doc count the pairs it induces must disappear."""
    passage = " ".join(f"b{i}" for i in range(12))
    docs = _docs(spark, [f"doc{i} unique{i} " + passage for i in range(6)])
    loose = winnow_candidates(docs, max_df=50)
    strict = winnow_candidates(docs, max_df=3)
    assert loose.count() == 15  # all C(6,2) pairs via the boilerplate
    assert strict.count() == 0


class TestDupSpans:
    def test_exact_copy_fully_duplicated(self, spark):
        from oracdc_spark.operators.winnow import dup_span_fraction

        text = " ".join(f"w{i}" for i in range(20))
        docs = _docs(spark, [text, text, "completely different words " * 5])
        got = {r.doc_id: r for r in dup_span_fraction(docs).collect()}
        assert got[0].dup_fraction == 1.0
        assert got[1].dup_fraction == 1.0
        # doc 2's spans (even its internal repeats) occur in no OTHER doc
        assert got[2].dup_fraction == 0.0

    def test_partial_overlap_fraction(self, spark):
        from oracdc_spark.operators.winnow import dup_span_fraction

        shared = " ".join(f"s{i}" for i in range(8))  # exactly one 8-span
        docs = _docs(
            spark,
            [
                shared + " " + " ".join(f"a{i}" for i in range(8)),
                shared + " " + " ".join(f"b{i}" for i in range(8)),
            ],
        )
        got = {r.doc_id: r for r in dup_span_fraction(docs).collect()}
        # 16 tokens -> 9 spans; only the span at position 1 (pure shared
        # prefix) exists in both docs
        assert got[0].n_spans == 9
        assert got[0].n_dup_spans == 1
        assert got[1].n_dup_spans == 1


class TestExactSubstrTrim:
    def test_shared_span_removed_from_both(self, spark):
        from oracdc_spark.operators.winnow import exact_substr_trim

        shared = "a b c d e f g h"  # exactly one 8-token window
        docs = spark.createDataFrame(
            [
                (1, f"intro one two {shared} tail1 x"),
                (2, f"{shared} closing words here"),
                (3, "totally different content with no duplicated spans at all"),
            ],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in exact_substr_trim(docs).collect()}
        assert out[1].n_removed == 8
        assert out[1].cleaned_text == "intro one two tail1 x"
        assert out[2].n_removed == 8
        assert out[2].cleaned_text == "closing words here"
        assert out[3].n_removed == 0
        assert out[3].cleaned_text == out[3].cleaned_text.strip()

    def test_fully_duplicated_doc_empties(self, spark):
        from oracdc_spark.operators.winnow import exact_substr_trim

        t = "p q r s t u v w"
        docs = spark.createDataFrame(
            [(1, t), (2, t)], "doc_id long, text string"
        )
        out = {r.doc_id: r for r in exact_substr_trim(docs).collect()}
        for r in out.values():
            assert r.n_tokens == 8 and r.n_removed == 8
            assert r.cleaned_text == ""

    def test_case_insensitive_match_preserves_case(self, spark):
        from oracdc_spark.operators.winnow import exact_substr_trim

        docs = spark.createDataFrame(
            [
                (1, "Alpha Beta Gamma Delta Epsilon Zeta Eta Theta KEEP1"),
                (2, "alpha beta gamma delta epsilon zeta eta theta keep2"),
            ],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in exact_substr_trim(docs).collect()}
        assert out[1].cleaned_text == "KEEP1"
        assert out[2].cleaned_text == "keep2"

    def test_short_docs_untouched(self, spark):
        from oracdc_spark.operators.winnow import exact_substr_trim

        docs = spark.createDataFrame(
            [(1, "one two three"), (2, "one two three")],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in exact_substr_trim(docs).collect()}
        for r in out.values():
            assert r.n_removed == 0 and r.cleaned_text == "one two three"
