"""SAX time-series index (operators/tsindex.py) invariants."""

import pytest

import pyspark.sql.functions as F

from oracdc_spark.catalog import load_table
from oracdc_spark.operators import tsindex

SF = "/root/testdata/sf0.001"


def test_words_in_range_one_per_user(spark):
    ev = load_table(spark, SF, "events")
    rows = tsindex.sax_words(ev).collect()
    users = ev.select("user_id").distinct().count()
    assert len(rows) == users
    assert all(0 <= r.word < 4096 for r in rows)


@pytest.mark.slow
def test_candidates_are_bucket_pairs(spark):
    ev = load_table(spark, SF, "events")
    words = {r.user_id: r.word for r in tsindex.sax_words(ev).collect()}
    cand = tsindex.sax_candidates(ev).collect()
    for r in cand:
        assert r.u1 < r.u2
        assert (words[r.u1] & 255) == (words[r.u2] & 255) == r.bucket


@pytest.mark.slow
def test_words_scale_invariant(spark):
    """L1 normalization makes the symbols amplitude-blind: scaling every
    value by an exact constant must leave every SAX word unchanged
    (the property that aligns the index with the cosine scorer)."""
    ev = load_table(spark, SF, "events").select("user_id", "ts", "value")
    base = {r.user_id: r.word for r in tsindex.sax_words(ev).collect()}
    scaled = ev.withColumn("value", F.col("value") * 4)
    got = {r.user_id: r.word for r in tsindex.sax_words(scaled).collect()}
    assert base == got


@pytest.mark.slow
def test_audit_counts_consistent(spark):
    rows = tsindex.sax_recall_audit(spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        assert 0 <= r.n_hits <= r.n_pairs
        assert abs(r.capture - r.n_hits / r.n_pairs) < 1e-6


@pytest.mark.slow
def test_sax_topk_serves_in_bucket_neighbors(spark):
    rows = tsindex.sax_topk(spark, SF).collect()
    ev = load_table(spark, SF, "events")
    words = {r.user_id: r.word & 255 for r in tsindex.sax_words(ev).collect()}
    by_q: dict = {}
    for r in rows:
        # neighbors share the query's SAX prefix bucket
        assert words[r.query_user] == words[r.neighbor_user]
        by_q.setdefault(r.query_user, []).append(r.rank)
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), q


@pytest.mark.slow
def test_planted_twins_mostly_captured(spark):
    """One-unit twins share the bucket unless a symbol sits exactly on
    a quartile breakpoint; at this 15-user smoke scale a couple of
    boundary flips are expected (sf0.01/sf0.1 both measure 1.0), so
    assert a strong majority, not perfection."""
    ev = load_table(spark, SF, "events")
    r = tsindex.sax_planted_audit(ev).collect()[0]
    assert r.n_planted == ev.select("user_id").distinct().count()
    assert 0 < r.n_hits <= r.n_planted
    assert r.capture >= 0.6
    assert abs(r.capture - r.n_hits / r.n_planted) < 1e-6
