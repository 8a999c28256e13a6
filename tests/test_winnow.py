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
