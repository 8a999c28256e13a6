"""Deterministic training-mix sampling: quota caps, temperature
re-balancing, and reproducibility (no RNG anywhere)."""

import pyspark.sql.functions as F

from oracdc_spark.operators.sampling import quota_sample, temperature_mix


def _docs(spark, sizes: dict[str, int]):
    rows, i = [], 0
    for g, n in sizes.items():
        for _ in range(n):
            rows.append((i, g))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_quota_caps_every_group(spark):
    docs = _docs(spark, {"en": 100, "de": 30, "zh": 5})
    out = quota_sample(docs, quota=20)
    per = {r.lang: r.cnt for r in out.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    assert per == {"en": 20, "de": 20, "zh": 5}  # small groups untouched


def test_quota_is_deterministic(spark):
    docs = _docs(spark, {"en": 50, "de": 50})
    a = sorted(r.doc_id for r in quota_sample(docs, quota=10).collect())
    b = sorted(r.doc_id for r in quota_sample(docs, quota=10).collect())
    assert a == b


def test_temperature_flattens_skew(spark):
    """τ=0.5 must downsample the majority group at a lower keep-rate
    than the minority group, while keeping ~the corpus size budget."""
    docs = _docs(spark, {"en": 900, "zh": 100})
    kept = temperature_mix(docs)
    per = {r.lang: r.cnt for r in kept.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    rate_en = per.get("en", 0) / 900
    rate_zh = per.get("zh", 0) / 100
    assert rate_zh > rate_en
    # q_zh*N/n_zh = (sqrt(100)/ (sqrt(900)+sqrt(100))) * 1000/100 = 2.5 -> capped at 1
    assert per["zh"] == 100
    # expected en keep-rate = 0.75*1000/900 = 0.833; md5 is uniform, wide tolerance
    assert 0.70 < rate_en < 0.95


def test_temperature_uniform_groups_keep_everything(spark):
    """Equal-size groups: rate = 1 for all — the operator is a no-op."""
    docs = _docs(spark, {"a": 40, "b": 40})
    assert temperature_mix(docs).count() == 80


def test_train_split_deterministic_and_proportional(spark):
    from oracdc_spark.operators.sampling import train_split

    docs = spark.createDataFrame([(i,) for i in range(5000)], "doc_id long")
    a = {r.doc_id: r.split for r in train_split(docs).collect()}
    b = {r.doc_id: r.split for r in train_split(docs).collect()}
    assert a == b
    from collections import Counter

    c = Counter(a.values())
    assert c["train"] + c["val"] + c["test"] == 5000
    # md5 uniformity: 5% +/- 1.5% absolute
    assert 0.035 < c["val"] / 5000 < 0.065
    assert 0.035 < c["test"] / 5000 < 0.065


def test_temperature_mix_never_shuffles_the_corpus(spark):
    """The corpus side must reach the filter via broadcast joins only —
    an Exchange over the docs would be a full-corpus shuffle at 100 TB."""
    from oracdc_spark.operators.sampling import temperature_mix

    docs = _docs(spark, {"en": 400, "zh": 100})
    plan = temperature_mix(docs)._jdf.queryExecution().executedPlan().toString()
    # the only hash exchanges allowed are the per-group COUNT partials
    # (|groups| rows after map-side combine), keyed on the group column —
    # never a repartition of doc rows
    import re

    hash_ex = [
        ln.strip() for ln in plan.splitlines() if re.search(r"\bExchange hash", ln)
    ]
    assert hash_ex and all("hashpartitioning(lang" in ln for ln in hash_ex), hash_ex
    # (a RoundRobin spread may appear on single-file inputs via the
    # gated ensure_parallelism — that's the round-2 fix, not a shuffle
    # of keyed data)
    assert "rangepartitioning" not in plan


def test_quota_sample_single_exchange(spark):
    from oracdc_spark.operators.sampling import quota_sample

    docs = _docs(spark, {"en": 200, "de": 100})
    plan = quota_sample(docs)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


class TestPackSequences:
    """Greedy contiguous packing invariants."""

    def _packed(self, spark):
        from oracdc_spark.operators.sampling import pack_sequences

        from tests.conftest import SF_SMOKE
        from oracdc_spark.catalog import load_table

        docs = load_table(spark, SF_SMOKE, "documents")
        return docs, pack_sequences(docs, budget=256, n_shards=8)

    def test_all_docs_packed_once(self, spark):
        docs, packed = self._packed(spark)
        import pyspark.sql.functions as F

        assert packed.agg(F.sum("n_docs")).first()[0] == docs.count()

    def test_seq_ids_contiguous_per_shard(self, spark):
        _, packed = self._packed(spark)
        for row in packed.groupBy("shard").agg(
            {"seq_id": "max", "*": "count"}
        ).collect():
            assert row["max(seq_id)"] == row["count(1)"] - 1

    def test_start_offsets_stay_in_bin(self, spark):
        """Every doc STARTS inside its bin: the span of start offsets in
        one sequence is < budget (the last doc may overflow past it)."""
        from oracdc_spark.operators.sampling import pack_sequences
        import pyspark.sql.functions as F
        from pyspark.sql import Window
        from oracdc_spark.catalog import load_table
        from oracdc_spark.operators.textops import _tokens

        from tests.conftest import SF_SMOKE

        budget = 256
        docs = load_table(spark, SF_SMOKE, "documents")
        nt = docs.select(
            "doc_id",
            (F.col("doc_id") % 8).alias("shard"),
            F.size(_tokens()).cast("bigint").alias("n_tokens"),
        )
        w = (
            Window.partitionBy("shard")
            .orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        binned = nt.withColumn(
            "prefix", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
        ).withColumn("seq_id", F.expr(f"prefix div {budget}"))
        spans = binned.groupBy("shard", "seq_id").agg(
            (F.max("prefix") - F.min("prefix")).alias("span")
        )
        assert spans.filter(F.col("span") >= budget).count() == 0


class TestChunkDocuments:
    def test_chunk_invariants(self, spark):
        import pyspark.sql.functions as F

        from oracdc_spark.catalog import load_table
        from oracdc_spark.operators.sampling import chunk_documents
        from oracdc_spark.operators.textops import _tokens

        from tests.conftest import SF_SMOKE

        size, stride = 64, 48
        docs = load_table(spark, SF_SMOKE, "documents")
        chunks = chunk_documents(docs, size=size, stride=stride).cache()
        rows = chunks.collect()
        assert rows
        # starts advance by exactly stride; chunk_id is the start index
        for r in rows:
            assert r.start_tok == r.chunk_id * stride
            assert 1 <= r.n_chunk_tokens <= size
            assert len(r.chunk_text.split(" ")) == r.n_chunk_tokens
        # every token position is covered: last chunk reaches n_tokens
        nt = docs.select("doc_id", F.size(_tokens()).alias("n"))
        last = chunks.groupBy("doc_id").agg(
            F.max(F.col("start_tok") + F.col("n_chunk_tokens")).alias("covered")
        )
        bad = last.join(nt, "doc_id").filter(F.col("covered") != F.col("n"))
        assert bad.count() == 0
        # overlap: consecutive chunks share size - stride tokens (when full)
        chunks.unpersist()

    def test_empty_doc_produces_no_chunks(self, spark):
        from oracdc_spark.operators.sampling import chunk_documents

        docs = spark.createDataFrame(
            [(1, "a b c"), (2, "   "), (3, "")], "doc_id long, text string"
        )
        got = chunk_documents(docs, size=2, stride=1).collect()
        assert sorted(set(r.doc_id for r in got)) == [1]
        # doc 1: 3 tokens, stride 1 -> starts 0,1,2
        assert [(r.chunk_id, r.n_chunk_tokens) for r in sorted(got, key=lambda r: r.chunk_id)] == [
            (0, 2), (1, 2), (2, 1),
        ]


class TestChunkDedupStats:
    def test_cross_doc_duplicate_detection(self, spark):
        from oracdc_spark.operators.dedup import chunk_dedup_stats

        shared = " ".join(f"w{i}" for i in range(16))
        uniq_a = " ".join(f"a{i}" for i in range(16))
        uniq_b = " ".join(f"b{i}" for i in range(16))
        docs = spark.createDataFrame(
            [
                (1, shared + " " + uniq_a),   # chunk0 shared, chunk1 unique
                (2, shared + " " + uniq_b),   # chunk0 shared, chunk1 unique
                (3, uniq_a),                   # duplicated vs doc 1's chunk1
            ],
            "doc_id long, text string",
        )
        got = {r.doc_id: r for r in chunk_dedup_stats(docs, size=16).collect()}
        assert got[1].n_chunks == 2 and got[1].n_dup_chunks == 2
        assert got[2].n_chunks == 2 and got[2].n_dup_chunks == 1
        assert got[3].n_chunks == 1 and got[3].n_dup_chunks == 1
        assert got[2].dup_chunk_frac == 0.5


class TestTokenBudgetSelect:
    def test_budget_cut_is_rank_ordered(self, spark):
        from oracdc_spark.operators.sampling import token_budget_select

        # one shard (n_shards=1): scores rank c > a > b; budget fits c+a
        docs = spark.createDataFrame(
            [
                (1, "red blue red blue red blue red blue"),  # 8 toks, 2 distinct
                (2, "one one one one one one one one one one"),  # 10 toks, 1 distinct
                (3, "all words here are fully distinct tokens"),  # 7 toks, 7 distinct
            ],
            "doc_id long, text string",
        )
        out = {
            r.doc_id: r
            for r in token_budget_select(docs, budget=15, n_shards=1).collect()
        }
        assert set(out) == {3, 1}  # doc 2 (rank 3) would blow the budget
        assert out[3].rank == 1 and out[3].cum_tokens == 7
        assert out[1].rank == 2 and out[1].cum_tokens == 15
        assert out[3].score == 1_000_000
        assert out[1].score == 250_000

    def test_sharding_isolates_budgets(self, spark):
        from oracdc_spark.operators.sampling import token_budget_select

        docs = spark.createDataFrame(
            [(i, "tok" + str(i) + " word other thing") for i in range(8)],
            "doc_id long, text string",
        )
        out = token_budget_select(docs, budget=4, n_shards=4).collect()
        # every shard independently fits exactly its first pick
        assert len(out) == 4
        assert {r.shard for r in out} == {0, 1, 2, 3}


class TestTokenBudgetGlobal:
    def test_decomposition_equals_global_sort(self, spark):
        from pyspark.sql import Window
        import pyspark.sql.functions as F
        from oracdc_spark.operators.sampling import token_budget_global

        # mixed scores INCLUDING ties (docs 10/11/12 share a score) so the
        # within-score leg of the decomposition is actually exercised
        rows = []
        for i in range(30):
            if i % 3 == 0:
                rows.append((i, "a b c d e f g h"))            # 8/8 distinct
            elif i % 3 == 1:
                rows.append((i, "x x y y z z"))                # 6 toks 3 distinct
            else:
                rows.append((i, "w w w w"))                    # 4 toks 1 distinct
        docs = spark.createDataFrame(rows, "doc_id long, text string")

        got = {
            (r.doc_id, r.n_tokens, r.score, r.cum_tokens)
            for r in token_budget_global(docs, budget=50).collect()
        }

        # brute-force oracle: literal global sort + prefix-sum cut
        toks = F.filter(F.split(F.trim("text"), r"\s+"), lambda x: x != "")
        nt = F.size(toks).cast("bigint")
        nd = F.size(F.array_distinct(toks)).cast("bigint")
        scored = docs.select(
            "doc_id",
            nt.alias("n_tokens"),
            F.when(nt > 0, (F.lit(1000000) * nd) / nt)
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("score"),
        )
        w = Window.orderBy(F.col("score").desc(), "doc_id").rowsBetween(
            Window.unboundedPreceding, 0
        )
        want = {
            (r.doc_id, r.n_tokens, r.score, r.cum_tokens)
            for r in scored.withColumn(
                "cum_tokens", F.sum("n_tokens").over(w).cast("bigint")
            )
            .filter(F.col("cum_tokens") <= 50)
            .collect()
        }
        assert got == want and len(got) > 0

    def test_boundary_doc_excluded(self, spark):
        from oracdc_spark.operators.sampling import token_budget_global

        docs = spark.createDataFrame(
            [
                (1, "p q r s t"),     # 5 toks all distinct -> best score
                (2, "a a b b"),       # 4 toks 2 distinct
                (3, "z z z z z z"),   # 6 toks 1 distinct
            ],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in token_budget_global(docs, budget=9).collect()}
        # doc1 (5) + doc2 (4) fill the budget exactly; doc3 would overflow
        assert set(out) == {1, 2}
        assert out[2].cum_tokens == 9

    def test_zero_budget_selects_nothing(self, spark):
        from oracdc_spark.operators.sampling import token_budget_global

        docs = spark.createDataFrame(
            [(1, "a b"), (2, "c d")], "doc_id long, text string"
        )
        assert token_budget_global(docs, budget=0).count() == 0


def test_curation_v4_invariants(spark):
    """The v4 chain's output must respect every stage's contract:
    budget cap, no badword docs, no perplexity-tail docs, no shadowed
    exact dups."""
    import __spark_entry__ as e

    sf = "/root/testdata/sf0.001"
    rows = e._q_pipeline_curation_v4(spark, sf).collect()
    assert len(rows) > 0
    assert max(r.cum_tokens for r in rows) <= 8000
    ids = {r.doc_id for r in rows}
    # no doc with an injected badword marker survives
    assert not any(i % 7 == 0 or i % 11 == 3 for i in ids)
    # no tail-bucket doc survives
    from oracdc_spark.catalog import load_table
    from oracdc_spark.operators.textops import perplexity_buckets

    tail = {
        r.doc_id
        for r in perplexity_buckets(load_table(spark, sf, "documents"))
        .filter("bucket = 'tail'")
        .collect()
    }
    assert not (ids & tail)


class TestSplitLeakage:
    def test_counts_consistent_with_components(self, spark):
        """The audit's total pair count must equal the LSH candidate
        count, and each (split_a, split_b) cell must match a manual
        join of the two composed operators."""
        from oracdc_spark.catalog import load_table
        from oracdc_spark.operators.dedup import minhash_lsh_candidates
        from oracdc_spark.operators.sampling import (
            split_leakage_audit,
            train_split,
        )

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        rows = split_leakage_audit(docs).collect()
        assert sum(r.n_pairs for r in rows) == minhash_lsh_candidates(docs).count()
        # leaked flag is derived, split_a <= split_b normalized
        for r in rows:
            assert r.split_a <= r.split_b
            assert r.leaked == (r.split_a != r.split_b)
        sp = {r.doc_id: r.split for r in train_split(docs).collect()}
        manual: dict = {}
        for p in minhash_lsh_candidates(docs).collect():
            key = tuple(sorted((sp[p.d1], sp[p.d2])))
            manual[key] = manual.get(key, 0) + 1
        assert {(r.split_a, r.split_b): r.n_pairs for r in rows} == manual


class TestMixtureRebalance:
    def _docs(self, spark):
        # skewed synthetic corpus: en 10 docs x 10 tokens, fr 2 x 10
        rows = [(i, " ".join(["tok"] * 10), "en" if i < 10 else "fr")
                for i in range(12)]
        return spark.createDataFrame(rows, "doc_id long, text string, lang string")

    def test_most_under_target_group_keeps_everything(self, spark):
        from oracdc_spark.operators.sampling import mixture_rebalance

        kept = mixture_rebalance(
            self._docs(spark), {"en": 500000, "fr": 500000}
        ).collect()
        by_lang: dict = {}
        for r in kept:
            by_lang.setdefault(r.lang, []).append(r.doc_id)
        # fr is most under target (share 1/6 vs 1/2): keeps all 2 docs
        assert sorted(by_lang["fr"]) == [10, 11]
        # en downsamples toward f_en = (0.5/ (5/6)) / (0.5/(1/6)) = 1/5
        assert 0 < len(by_lang["en"]) < 10
        assert all(r.n_tokens == 10 for r in kept)

    def test_absent_groups_drop_and_determinism(self, spark):
        from oracdc_spark.operators.sampling import mixture_rebalance

        docs = self._docs(spark)
        kept1 = sorted(r.doc_id for r in mixture_rebalance(docs, {"en": 1000000}).collect())
        # fr has no target -> dropped entirely; en keeps everything
        # (it is the argmax group)
        assert kept1 == list(range(10))
        kept2 = sorted(r.doc_id for r in mixture_rebalance(docs, {"en": 1000000}).collect())
        assert kept1 == kept2


class TestContentChunkDedupStats:
    def test_shift_resistance_vs_fixed_stride(self, spark):
        """The op's reason to exist: prepending ONE token re-aligns
        every fixed-stride window (fixed chunking finds zero dups) but
        content-defined boundaries move with the content, so the
        shared tail still produces duplicated chunks."""
        from oracdc_spark.operators.dedup import (
            chunk_dedup_stats,
            content_chunk_dedup_stats,
        )

        body = " ".join(f"tok{i} filler{i}" for i in range(100))  # 200 tokens
        docs = spark.createDataFrame(
            [(1, body), (2, "shifted " + body)],
            "doc_id long, text string",
        )
        fixed = {r.doc_id: r for r in chunk_dedup_stats(docs, size=16).collect()}
        cdc = {r.doc_id: r for r in content_chunk_dedup_stats(docs).collect()}
        # fixed-stride: the 1-token shift misaligns every window
        assert fixed[1].n_dup_chunks == 0 and fixed[2].n_dup_chunks == 0
        # content-defined: boundaries re-sync after the edit point
        assert cdc[1].n_dup_chunks > 0 and cdc[2].n_dup_chunks > 0

    def test_identical_docs_fully_duplicated(self, spark):
        from oracdc_spark.operators.dedup import content_chunk_dedup_stats

        body = " ".join(f"x{i}" for i in range(64))
        docs = spark.createDataFrame(
            [(1, body), (2, body)], "doc_id long, text string"
        )
        got = {r.doc_id: r for r in content_chunk_dedup_stats(docs).collect()}
        assert got[1].dup_chunk_frac == 1.0 and got[2].dup_chunk_frac == 1.0
        assert got[1].n_chunks == got[2].n_chunks

    def test_short_doc_single_chunk(self, spark):
        """Fewer tokens than the gram: no boundary candidates at all —
        the whole doc is one chunk."""
        from oracdc_spark.operators.dedup import content_chunk_dedup_stats

        docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        [r] = content_chunk_dedup_stats(docs).collect()
        assert r.n_chunks == 1 and r.n_dup_chunks == 0


class TestWeightedSample:
    def test_inclusion_tracks_weight(self, spark):
        """Sequential Poisson: with weights 10_000 vs 1, the heavy half
        dominates a half-size sample (the key h<<20 div w is ~2^20x
        smaller for heavy docs)."""
        from oracdc_spark.operators.sampling import weighted_sample

        rows = [(i, "s", 10_000 if i < 50 else 1) for i in range(100)]
        docs = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
        out = weighted_sample(docs, k=50).collect()
        heavy = sum(1 for r in out if r.doc_id < 50)
        assert len(out) == 50 and heavy == 50

    def test_exactly_k_and_deterministic(self, spark):
        from oracdc_spark.operators.sampling import weighted_sample

        rows = [(i, "s", 1 + i % 7) for i in range(200)]
        docs = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
        a = sorted(r.doc_id for r in weighted_sample(docs, k=25).collect())
        b = sorted(r.doc_id for r in weighted_sample(docs, k=25).collect())
        assert len(a) == 25 and a == b

    def test_zero_weight_guarded(self, spark):
        """n_chars = 0 must not divide by zero — the weight floor is 1."""
        from oracdc_spark.operators.sampling import weighted_sample

        docs = spark.createDataFrame(
            [(1, "s", 0), (2, "s", 5)], "doc_id long, source string, n_chars long"
        )
        out = weighted_sample(docs, k=2).collect()
        assert {r.doc_id for r in out} == {1, 2}
        assert min(r.weight for r in out) == 1

    def test_plan_is_take_ordered(self, spark):
        """The global top-k must compile to TakeOrderedAndProject, not a
        full Sort exchange."""
        from oracdc_spark.operators.sampling import weighted_sample

        docs = spark.createDataFrame(
            [(i, "s", i + 1) for i in range(10)],
            "doc_id long, source string, n_chars long",
        )
        plan = weighted_sample(docs, k=3)._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan
