"""Unit pins for the round-8 operators.

Parity proves engine == oracle; these prove both == the intended
semantics on crafted inputs (the suite's standing convention — a
mirrored mistake passes parity but not these).
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )


class TestZipfHapax:
    def test_exact_zipfian_counts(self, spark):
        from oracdc_spark.operators.textops import zipf_hapax_audit

        # counts 8,4,2,1,1: hapax=2, dis=1(count-2 types: one), ttr=5/16
        words = (
            ["a"] * 8 + ["b"] * 4 + ["c"] * 2 + ["d"] + ["e"]
        )
        [r] = zipf_hapax_audit(_docs(spark, [" ".join(words)])).collect()
        assert r.n_types == 5 and r.n_tokens == 16
        assert r.hapax == 2 and r.dis == 1
        assert r.ttr == round(5 / 16, 6)
        # slope must be negative (frequency falls with rank)
        assert r.zipf_slope < 0

    def test_uniform_vocab_slope_zero(self, spark):
        from oracdc_spark.operators.textops import zipf_hapax_audit

        [r] = zipf_hapax_audit(_docs(spark, ["a b c d a b c d"])).collect()
        # all counts equal -> ln(count) constant -> slope exactly 0
        assert r.zipf_slope == 0.0


class TestCharEntropy:
    def test_single_char_entropy_zero(self, spark):
        from oracdc_spark.operators.textops import char_entropy

        [r] = char_entropy(_docs(spark, ["aaaa"])).collect()
        assert r.entropy == 0.0 and r.n_distinct == 1

    def test_uniform_alphabet_entropy_ln_k(self, spark):
        from oracdc_spark.operators.textops import char_entropy

        [r] = char_entropy(_docs(spark, ["abcd" * 4])).collect()
        assert abs(r.entropy - round(math.log(4), 6)) < 1e-5


class TestAttribution:
    def test_last_touch_and_none_bucket(self, spark):
        from oracdc_spark.operators.analytics import events_attribution

        rows = [
            # user 1: view -> click -> purchase(10)  => click credited
            (1, "2024-01-01 00:00:00", 1, "view", 0.0),
            (2, "2024-01-01 00:01:00", 1, "click", 0.0),
            (3, "2024-01-01 00:02:00", 1, "purchase", 10.0),
            # user 2: purchase with no prior touch => (none)
            (4, "2024-01-01 00:00:30", 2, "purchase", 5.0),
            # user 1 second purchase: click still the last non-purchase
            (5, "2024-01-01 00:03:00", 1, "purchase", 2.5),
        ]
        df = spark.createDataFrame(
            rows, "event_id bigint, ts string, user_id bigint, event_type string, value double"
        ).withColumn("ts", F.to_timestamp("ts"))
        import oracdc_spark.operators.analytics as an

        orig = an.load_table
        an.load_table = lambda s, d, t: df
        try:
            out = {r.touch_type: (r.n_attributed, r.credited_value)
                   for r in an.events_attribution(spark, "x").collect()}
        finally:
            an.load_table = orig
        assert out["click"] == (2, 12.5)
        assert out["(none)"] == (1, 5.0)
        assert "view" not in out


class TestQuantileSketch:
    def test_exact_quantiles_on_known_values(self, spark):
        from oracdc_spark.operators.analytics import events_quantile_sketch
        import oracdc_spark.operators.analytics as an

        df = spark.createDataFrame(
            [(float(i),) for i in range(1, 101)], "value double"
        )
        orig = an.load_table
        an.load_table = lambda s, d, t: df
        try:
            out = {r.p: r for r in an.events_quantile_sketch(spark, "x").collect()}
        finally:
            an.load_table = orig
        # k = ceil(p*100): p50 -> 50th smallest = 50.0, p99 -> 99.0
        assert out[0.5].exact_q == 50.0
        assert out[0.99].exact_q == 99.0
        # unit-bin estimate is within half a bin of exact
        assert all(r.abs_err <= 0.5 for r in out.values())


class TestReconcile:
    def test_all_four_classes(self, spark):
        from oracdc_spark.operators.cdc import replica_reconcile

        rep = spark.createDataFrame(
            [(1, 10.0, "O"), (2, 20.0, "F"), (4, 40.0, "X")],
            "pk bigint, totalprice double, status string",
        )
        src = spark.createDataFrame(
            [(1, 10.0, "O"), (2, 99.0, "F"), (3, 30.0, "P")],
            "pk bigint, totalprice double, status string",
        )
        out = {r.diff_class: r.n_keys for r in replica_reconcile(rep, src).collect()}
        assert out == {
            "match": 1,
            "value_mismatch": 1,
            "missing_in_replica": 1,
            "extra_in_replica": 1,
        }

    def test_null_values_match_nullsafe(self, spark):
        from oracdc_spark.operators.cdc import replica_reconcile

        rep = spark.createDataFrame(
            [(1, None, "O")], "pk bigint, totalprice double, status string"
        )
        src = spark.createDataFrame(
            [(1, None, "O")], "pk bigint, totalprice double, status string"
        )
        [r] = replica_reconcile(rep, src).collect()
        assert r.diff_class == "match"


class TestContainment:
    def test_subdocument_detected_jaccard_misses(self, spark):
        from oracdc_spark.operators.dedup import containment_pairs, jaccard_pairs

        small = "one two three four five six"
        big = small + " " + " ".join(f"w{i}" for i in range(40))
        docs = _docs(spark, [small, big])
        cont = containment_pairs(docs, n=5, threshold=0.8).collect()
        assert len(cont) == 1 and cont[0].c1_in_2 == 1.0
        # symmetric jaccard stays far below its 0.5 bar on the same pair
        assert jaccard_pairs(docs, n=5, threshold=0.5).count() == 0


class TestMethodMatrix:
    @pytest.mark.slow
    def test_id_collision_guard_raises(self, spark):
        from oracdc_spark.operators.dedup import PLANT_OFFSET, method_capture_matrix

        bad = spark.createDataFrame(
            [(PLANT_OFFSET + 1, "a b c")], "doc_id bigint, text string"
        )
        with pytest.raises(Exception, match="PLANT_OFFSET"):
            method_capture_matrix(bad).collect()


class TestStupidBackoff:
    def test_backoff_positions_counted(self, spark):
        from oracdc_spark.operators.textops import stupid_backoff_logprob

        # "x y" occurs once -> pruned at min 3 -> that position backs off
        docs = _docs(spark, ["a b a b a b x y"])
        [r] = stupid_backoff_logprob(docs).collect()
        # positions: ab,ba,ab,ba,ab,bx,xy -> 7 bigrams; ab kept (3),
        # ba kept? ba occurs 2 -> pruned; bx 1 pruned; xy 1 pruned
        assert r.n_bigrams == 7
        assert r.n_backoff == 4  # ba x2, bx, xy


class TestCohortLtv:
    def test_cumulative_and_per_user(self, spark):
        import oracdc_spark.operators.analytics as an

        rows = [
            (1, "2024-01-01 10:00:00", 1, "purchase", 10.0),
            (2, "2024-01-02 10:00:00", 1, "purchase", 5.0),
            (3, "2024-01-01 11:00:00", 2, "view", 99.0),  # not a purchase
        ]
        df = spark.createDataFrame(
            rows, "event_id bigint, ts string, user_id bigint, event_type string, value double"
        ).withColumn("ts", F.to_timestamp("ts"))
        orig = an.load_table
        an.load_table = lambda s, d, t: df
        try:
            out = {(r.cohort_day, r.day_offset): r
                   for r in an.events_cohort_ltv(spark, "x").collect()}
        finally:
            an.load_table = orig
        d0 = out[("2024-01-01", 0)]
        d1 = out[("2024-01-01", 1)]
        assert d0.day_value == 10.0 and d0.cum_value == 10.0
        assert d1.cum_value == 15.0
        assert d0.cohort_size == 2  # both users first seen on day 0
        assert d1.cum_per_user == round(15.0 / 2, 6)


class TestCanonicalQuality:
    @pytest.mark.slow
    def test_richness_beats_length(self, spark):
        from oracdc_spark.operators.dedup import dedup_canonical_quality

        # Two near-dup docs: doc 1 is LONGER but padded with repeated
        # boilerplate (fewer distinct tokens); doc 0 is richer.  The
        # quality key must pick doc 0 where the length key would pick 1.
        base = "the quick brown fox jumps over the lazy dog " * 4
        rich = base + "and then vanished beyond distant violet hills"
        padded = base + "buy now buy now buy now buy now buy now buy now"
        assert len(padded) > len(rich)
        out = dedup_canonical_quality(
            _docs(spark, [rich, padded]), threshold=0.3
        ).collect()
        assert len(out) == 1
        r = out[0]
        assert r.doc_id == 0 and r.n_members == 2
        assert r.n_distinct > 9  # base has 8 distinct + the rich tail

    def test_singletons_survive(self, spark):
        from oracdc_spark.operators.dedup import dedup_canonical_quality

        out = dedup_canonical_quality(
            _docs(spark, ["alpha beta gamma", "totally unrelated words here"]),
            threshold=0.9,
        ).collect()
        assert len(out) == 2 and all(r.n_members == 1 for r in out)


def _vecs(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )


class TestMatryoshkaRecall:
    def test_full_width_is_identity(self, spark):
        from oracdc_spark.operators.similarity import matryoshka_recall

        rows = [
            (i, [float(i == j) for j in range(4)], 0) for i in range(4)
        ] + [(4, [1.0, 0.1, 0.0, 0.0], 0)]
        out = matryoshka_recall(
            _vecs(spark, rows), query_mod=4, k=2, dims=(4,)
        ).collect()
        # truncating at the full width IS the exact search
        assert out and all(r.recall == 1.0 for r in out)

    @pytest.mark.slow
    def test_misleading_prefix_drops_recall(self, spark):
        from oracdc_spark.operators.similarity import matryoshka_recall

        # query 0 = [1,0,0,0]; neighbor 1 shares ONLY the tail dims,
        # neighbor 2 shares only dim 0.  Full-width top-1 is 2 (dot 1 >
        # 0); the 1-dim prefix sees neighbor 1 as orthogonal junk but
        # still ranks 2 first — craft so the prefix INVERTS the order:
        # q=[1,2], a=[2,1] (dot 4), b=[1,-2] (dot -3) at full width ->
        # top1 = a; prefix d=1: a dot 2, b dot 1 -> still a.  Use sign:
        # q=[1,2], a=[-1,2] (dot 3), b=[2,-0.5] (dot 1) full -> a;
        # d=1: a dot -1 (score<0), b dot 2 -> b.  recall@1 = 0.
        rows = [
            (0, [1.0, 2.0], 0),
            (1, [-1.0, 2.0], 0),
            (2, [2.0, -0.5], 0),
        ]
        out = {
            r.dims: r.recall
            for r in matryoshka_recall(
                _vecs(spark, rows), query_mod=3, k=1, dims=(2, 1)
            ).collect()
        }
        assert out[2] == 1.0 and out[1] == 0.0


class TestDecontamination:
    def test_duplicate_flagged_orthogonal_not(self, spark):
        from oracdc_spark.operators.similarity import decontamination_screen

        rows = [
            (0, [1.0, 0.0], 0),   # eval (0 % 100 == 0)
            (1, [1.0, 0.0], 0),   # train, identical -> flagged
            (2, [0.0, 1.0], 0),   # train, orthogonal -> clean
        ]
        out = decontamination_screen(
            _vecs(spark, rows), eval_mod=100, threshold_score=0.5
        ).collect()
        assert len(out) == 1
        r = out[0]
        assert r.vec_id == 1 and r.eval_id == 0 and r.score == 1.0

    def test_nearest_eval_tie_breaks_low_id(self, spark):
        from oracdc_spark.operators.similarity import decontamination_screen

        # two eval items equally similar to the train vector: the
        # reported eval_id must be the LOWER one (window tie contract)
        rows = [
            (0, [1.0, 0.0], 0),
            (100, [1.0, 0.0], 0),
            (7, [1.0, 0.0], 0),
        ]
        [r] = decontamination_screen(
            _vecs(spark, rows), eval_mod=100, threshold_score=0.5
        ).collect()
        assert r.vec_id == 7 and r.eval_id == 0


class TestAbAssign:
    def test_deterministic_and_complete(self, spark):
        from oracdc_spark.operators.sampling import ab_assign

        df = _docs(spark, [f"doc {i}" for i in range(200)])
        a = sorted(tuple(r) for r in ab_assign(df).collect())
        b = sorted(tuple(r) for r in ab_assign(df).collect())
        assert a == b  # pure function of (salt, doc_id)
        assert sum(r[1] for r in a) == 200  # every doc in exactly one arm

    def test_zero_unit_arm_still_reports(self, spark):
        from oracdc_spark.operators.sampling import ab_assign

        # a single doc cannot fill 3 arms: the empty arms must appear
        # with n_docs=0 and chi2 = expected (the (0-e)^2/e = e identity)
        df = _docs(spark, ["one doc"])
        rows = {r.arm: r for r in ab_assign(
            df, arms=("a", "b", "c"), weights=(1, 1, 1)).collect()}
        assert set(rows) == {"a", "b", "c"}
        empty = [r for r in rows.values() if r.n_docs == 0]
        assert len(empty) == 2
        for r in empty:
            assert r.chi2_component == r.expected_docs

    def test_salt_changes_assignment(self, spark):
        from oracdc_spark.operators.sampling import ab_assign

        df = _docs(spark, [f"doc {i}" for i in range(500)])
        a = {r.arm: r.n_docs for r in ab_assign(df, salt="exp1").collect()}
        b = {r.arm: r.n_docs for r in ab_assign(df, salt="exp2").collect()}
        assert a != b  # different experiment, different coin

    def test_bad_args_raise(self, spark):
        import pytest as _pt

        from oracdc_spark.operators.sampling import ab_assign

        df = _docs(spark, ["x"])
        with _pt.raises(ValueError):
            ab_assign(df, arms=("a",), weights=(1, 2))


class TestNprobeCurve:
    @pytest.mark.slow
    def test_full_probe_is_exact(self, spark):
        from oracdc_spark.operators.similarity import ivf_nprobe_curve

        # 2 cells; probing both IS the exact scan -> recall 1.0; the
        # 1-probe leg misses cross-cell neighbors and must not exceed it
        rows = [
            (0, [1.0, 0.0, 0.0], 0),
            (1, [0.9, 0.1, 0.0], 1),   # nearest to 0 but in the OTHER cell
            (2, [0.0, 1.0, 0.0], 0),
            (3, [0.0, 0.0, 1.0], 1),
        ]
        out = {
            r.n_probe: r.recall
            for r in ivf_nprobe_curve(
                _vecs(spark, rows), query_mod=4, k=2, n_probes=(1, 2)
            ).collect()
        }
        assert out[2] == 1.0
        assert out[1] <= out[2]


class TestNgramNovelty:
    def test_unique_vs_copied(self, spark):
        from oracdc_spark.operators.textops import ngram_novelty

        # doc0 and doc1 are identical -> every 3-gram has df=2, novelty 0;
        # doc2 is unique -> novelty 1; doc3 too short -> NULL
        out = {r.doc_id: r for r in ngram_novelty(_docs(spark, [
            "a b c d e", "a b c d e", "x y z w", "q r",
        ])).collect()}
        assert out[0].novelty == 0.0 and out[1].novelty == 0.0
        assert out[2].novelty == 1.0 and out[2].n_ngrams == 2
        assert out[3].n_ngrams == 0 and out[3].novelty is None

    def test_partial_overlap_counts(self, spark):
        from oracdc_spark.operators.textops import ngram_novelty

        # doc1 shares the "a b c" gram with doc0 but adds a novel tail
        out = {r.doc_id: r for r in ngram_novelty(_docs(spark, [
            "a b c", "a b c z",
        ])).collect()}
        assert out[0].novelty == 0.0
        assert out[1].n_ngrams == 2 and out[1].n_novel == 1
        assert out[1].novelty == 0.5


class TestDedupRateBySource:
    def test_cross_source_dup_charges_both(self, spark):
        from oracdc_spark.operators.textops import dedup_rate_by_source

        rows = [
            (0, "same text here", "en", "web", 14),
            (1, "same text here", "en", "books", 14),   # exact dup of 0
            (2, "here text same", "en", "books", 14),   # fp dup of both
            (3, "completely different", "en", "web", 20),
        ]
        df = spark.createDataFrame(
            rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
        )
        out = {r.source: r for r in dedup_rate_by_source(df).collect()}
        assert out["web"].n_exact_dup == 1 and out["web"].n_fp_dup == 1
        assert out["books"].n_exact_dup == 1 and out["books"].n_fp_dup == 2
        assert out["books"].fp_rate == 1.0


class TestMadOutliers:
    def test_masking_case_zscore_misses_mad_catches(self, spark):
        """Five extremes among 15 small values: the extremes inflate
        the stddev enough that every |z| < 3 (masking — the gate the
        extremes hide from), while median/MAD ignore them and the
        robust score flags all five.  Also: a constant type (MAD = 0)
        is excluded entirely, never divided by zero."""
        import oracdc_spark.operators.analytics as an

        rows = (
            [(i, "2024-01-01 10:00:00", 1, "view", float(i + 1))
             for i in range(15)]                      # 1..15
            + [(15 + i, "2024-01-01 10:00:00", 1, "view", 10000.0)
               for i in range(5)]                     # five wild values
            + [(30 + i, "2024-01-01 10:00:00", 1, "click", 7.0)
               for i in range(6)]                     # constant -> MAD 0
        )
        df = spark.createDataFrame(
            rows, "event_id bigint, ts string, user_id bigint, event_type string, value double"
        ).withColumn("ts", F.to_timestamp("ts"))
        orig = an.load_table
        an.load_table = lambda s, d, t: df
        try:
            mad = an.events_mad_outliers(spark, "x").collect()
            z = an.events_zscore_outliers(spark, "x").collect()
        finally:
            an.load_table = orig
        # stddev gate: masked — nothing in the view type crosses |z|>=3
        assert not [r for r in z if r.event_type == "view"]
        # robust gate: exactly the five extremes
        flagged = sorted(r.event_id for r in mad if r.event_type == "view")
        assert flagged == [15, 16, 17, 18, 19]
        assert all(r.event_type != "click" for r in mad)  # MAD=0 excluded

    def test_extremes_flagged_when_mad_positive(self, spark):
        import oracdc_spark.operators.analytics as an

        # values 1..9 (median 5, MAD 2) + one wild 1000: robust_z =
        # 0.6745*(1000-5)*1000/(2*1000) huge -> flagged; z-score with
        # n=10 also flags, but the MAD gate must report exactly the one
        rows = [(i, "2024-01-01 10:00:00", 1, "view", float(i + 1))
                for i in range(9)] + [(9, "2024-01-01 10:00:00", 1, "view", 1000.0)]
        df = spark.createDataFrame(
            rows, "event_id bigint, ts string, user_id bigint, event_type string, value double"
        ).withColumn("ts", F.to_timestamp("ts"))
        orig = an.load_table
        an.load_table = lambda s, d, t: df
        try:
            out = an.events_mad_outliers(spark, "x").collect()
        finally:
            an.load_table = orig
        assert len(out) == 1 and out[0].event_id == 9
        assert out[0].robust_z > 100


class TestOrdersPareto:
    def test_uniform_and_extreme(self, spark):
        import oracdc_spark.operators.analytics as an

        # 10 customers, one order each: 9 customers at 1.0, one at 91.0
        # -> total 100; top-10% (1 whale) share 0.91; Gini is high
        rows = [(i, i, 1.0) for i in range(9)] + [(9, 9, 91.0)]
        df = spark.createDataFrame(
            rows, "o_orderkey bigint, o_custkey bigint, o_totalprice double"
        )
        orig = an.load_table
        an.load_table = lambda s, d, t: df
        try:
            [r] = an.orders_pareto(spark, "x").collect()
        finally:
            an.load_table = orig
        assert r.n_customers == 10 and r.total_revenue == 100.0
        assert r.top1_share == 0.91  # ceil(10*1/100)=1 customer
        assert r.top10_share == 0.91
        assert r.top20_share == 0.92
        # closed form: 2*(sum i*x)/(n*sum x) - (n+1)/n with x asc
        # x = [1]*9 + [91]; sum i*x = 45 + 10*91 = 955
        assert r.gini == round(2 * 955 / (10 * 100) - 11 / 10, 6)

    def test_perfect_equality_gini_zero(self, spark):
        import oracdc_spark.operators.analytics as an

        rows = [(i, i, 5.0) for i in range(8)]
        df = spark.createDataFrame(
            rows, "o_orderkey bigint, o_custkey bigint, o_totalprice double"
        )
        orig = an.load_table
        an.load_table = lambda s, d, t: df
        try:
            [r] = an.orders_pareto(spark, "x").collect()
        finally:
            an.load_table = orig
        assert r.gini == 0.0 and r.top20_share == round(2 / 8, 6)


class TestEmptyCorpusDefinedness:
    """r9 empty-corpus probe class: summary-row operators over a
    VALID-but-empty corpus return their counts with NULL for the
    undefined ratio components — never an ANSI divide-by-zero (the
    funnel/census defect class)."""

    def test_ab_assign_empty_corpus_null_chi2(self, spark):
        from oracdc_spark.operators.sampling import ab_assign

        df = spark.createDataFrame([], "doc_id long, text string")
        rows = {r.arm: r for r in ab_assign(df).collect()}
        assert set(rows) == {"control", "treatment"}
        for r in rows.values():
            assert r.n_docs == 0 and r.expected_docs == 0.0
            assert r.chi2_component is None

    def test_stem_reduction_empty_corpus_null_fraction(self, spark):
        from oracdc_spark.operators.textops import stem_vocab_reduction

        df = spark.createDataFrame([], "doc_id long, text string")
        [r] = stem_vocab_reduction(df).collect()
        assert (r.n_tokens, r.vocab_raw, r.vocab_stemmed) == (0, 0, 0)
        assert r.reduction_frac is None


class TestEmptyCorpusPreconditions:
    """r10 (r9 verdict item 3): the planted/training audits cannot run
    on zero rows — that is a PRECONDITION, not a definedness gap — and
    each now states it explicitly instead of deep-crashing.  The eager
    trainer (pq.train, via every pq/opq consumer) raises a plain
    ValueError at build; the three lazy audits raise the same message
    shape in-plan via F.raise_error folded into the recall/capture
    expression (zero extra jobs at build, nothing for the lazy-builder
    gate to see, and the guard branch is dead code on any non-empty
    corpus).  similarity_opq_recall / similarity_opq_learned_audit
    inherit pq.train's ValueError (pinned in test_pq.py)."""

    def _empty_embeddings(self, spark):
        return spark.createDataFrame(
            [], "vec_id long, embedding array<float>, label int"
        )

    def test_nprobe_curve_empty_corpus_precondition(self, spark):
        import pytest as _pytest

        from oracdc_spark.operators.similarity import ivf_nprobe_curve

        with _pytest.raises(Exception, match="audit precondition"):
            ivf_nprobe_curve(
                self._empty_embeddings(spark), 100, 5, n_probes=(1, 2)
            ).collect()

    def test_hyperplane_planted_empty_corpus_precondition(self, spark):
        import pytest as _pytest

        from oracdc_spark.operators.pq import hyperplane_planted_audit

        with _pytest.raises(Exception, match="audit precondition"):
            hyperplane_planted_audit(self._empty_embeddings(spark)).collect()

    @pytest.mark.slow
    def test_sax_planted_empty_corpus_precondition(self, spark):
        import pytest as _pytest

        from oracdc_spark.operators.tsindex import sax_planted_audit

        ev = spark.createDataFrame(
            [],
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string",
        )
        with _pytest.raises(Exception, match="audit precondition"):
            sax_planted_audit(ev).collect()
