"""Sparse TF-IDF cosine pairing (dedup.tfidf_cosine_pairs) unit pins.

Parity proves engine == oracle; these pin both == the intended
semantics: identical docs score exactly 1.0, unrelated docs fall below
threshold, df-singleton terms never pair, and the df_max cap actually
prunes boilerplate terms out of the join.
"""

import pyspark.sql.functions as F

from oracdc_spark.operators.dedup import tfidf_cosine_pairs


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


BASE = "alpha beta gamma delta epsilon zeta eta theta"
OTHER = "one two three four five six seven eight nine ten"


def test_identical_docs_score_one(spark):
    docs = _docs(spark, [(1, BASE), (2, BASE), (3, OTHER), (4, OTHER)])
    out = {
        (r.d1, r.d2): r.score
        for r in tfidf_cosine_pairs(docs, threshold=0.04).collect()
    }
    assert out[(1, 2)] == 1.0
    assert out[(3, 4)] == 1.0
    assert (1, 3) not in out and (1, 4) not in out


def test_unrelated_docs_below_threshold(spark):
    docs = _docs(spark, [(1, BASE), (2, BASE), (3, OTHER)])
    pairs = tfidf_cosine_pairs(docs, threshold=0.04).collect()
    assert {(r.d1, r.d2) for r in pairs} == {(1, 2)}


def test_singleton_terms_cannot_pair(spark):
    # every shingle is unique to its doc -> df = 1 everywhere -> no pairs
    docs = _docs(spark, [(1, BASE), (2, OTHER)])
    assert tfidf_cosine_pairs(docs, threshold=0.0).count() == 0


def test_df_max_prunes_boilerplate(spark):
    # the shared boilerplate prefix appears in EVERY doc; with
    # df_max below the corpus size those shingles leave the index and
    # the docs no longer pair on boilerplate alone
    rows = [(i, BASE + f" tail{i} wing{i} fin{i}") for i in range(1, 6)]
    docs = _docs(spark, rows)
    with_cap = tfidf_cosine_pairs(docs, df_max=4, threshold=0.0)
    assert with_cap.count() == 0
    without_cap = tfidf_cosine_pairs(docs, df_max=1000, threshold=0.0)
    assert without_cap.count() == 10  # all C(5,2) pairs share boilerplate


def test_partial_overlap_scores_between(spark):
    half = "alpha beta gamma delta " + OTHER
    docs = _docs(spark, [(1, BASE), (2, BASE), (3, half), (4, half)])
    out = {
        (r.d1, r.d2): r.score
        for r in tfidf_cosine_pairs(docs, threshold=0.0).collect()
    }
    assert out[(1, 2)] == 1.0 and out[(3, 4)] == 1.0
    assert 0.0 < out[(1, 3)] < 1.0


def test_no_python_udfs_in_plan(spark):
    docs = _docs(spark, [(1, BASE), (2, BASE)])
    plan = tfidf_cosine_pairs(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
