"""Unit tests for repetition-quality rules and PII scrubbing (the
line-level rules can't be exercised by the synthetic corpus, which has
no newlines — handcrafted docs here)."""

import pytest

import pyspark.sql.functions as F

from oracdc_spark.operators import textops


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


class TestRepetition:
    def test_duplicate_lines_counted(self, spark):
        doc = "alpha beta\nalpha beta\ngamma delta\n\n  \n"
        [r] = textops.repetition_scores(_docs(spark, [doc])).collect()
        # 3 non-empty lines, one duplicated
        assert r.n_lines == 3
        assert abs(r.dup_line_frac - 1 / 3) < 1e-6
        # 10 chars duplicated out of 31 line chars
        assert abs(r.dup_line_char_frac - 10 / 31) < 1e-6

    def test_top_bigram_fraction(self, spark):
        doc = "spam ham spam ham spam ham eggs"
        [r] = textops.repetition_scores(_docs(spark, [doc])).collect()
        # bigrams: spam ham x3, ham spam x2, ham eggs x1
        assert r.top_bigram == "spam ham"
        assert r.top_bigram_n == 3
        # 3 * 7 non-space chars / 25 non-space chars total
        assert abs(r.top_bigram_char_frac - 21 / 25) < 1e-6
        assert not r.keep  # 0.84 > 0.20 threshold

    def test_clean_doc_kept(self, spark):
        doc = "every token here is used exactly once with no repeats at all"
        [r] = textops.repetition_scores(_docs(spark, [doc])).collect()
        assert r.dup_line_frac == 0.0 and r.keep

    def test_single_token_doc_has_no_bigram(self, spark):
        [r] = textops.repetition_scores(_docs(spark, ["solo"])).collect()
        assert r.top_bigram is None and r.top_bigram_n == 0
        assert r.top_bigram_char_frac == 0.0


class TestPiiScrub:
    def test_masks_and_counts(self, spark):
        doc = (
            "mail a.b-c_d@test.org or visit https://x.test/path?q=1 "
            "from 192.168.0.1 twice: other@ex.io"
        )
        out = textops.pii_scrub(_docs(spark, [doc]))
        [r] = out.collect()
        assert (r.n_urls, r.n_emails, r.n_ips) == (1, 2, 1)

    def test_url_with_embedded_email_not_double_counted(self, spark):
        # the URL is masked first; its '@' never reaches the email pass
        doc = "see https://u:p@host.test/x ok"
        [r] = textops.pii_scrub(_docs(spark, [doc])).collect()
        assert (r.n_urls, r.n_emails) == (1, 0)

    def test_clean_text_digest_stable(self, spark):
        df = _docs(spark, ["no pii here at all"])
        a = textops.pii_scrub(df).collect()[0].clean_digest
        expected = df.select(F.md5("text").alias("d")).collect()[0].d
        assert a == expected  # untouched text hashes identically


class TestCountMin:
    def test_one_sided_error_and_bounded_size(self, spark):
        from oracdc_spark.catalog import load_table
        from oracdc_spark.operators.textops import (
            CMS_DEPTH, CMS_WIDTH, cms_estimate_topk, cms_sketch,
        )

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        est = cms_estimate_topk(docs).collect()
        assert len(est) == 20
        # CMS guarantee: never underestimates
        assert all(r.overcount >= 0 for r in est)
        assert all(r.est_n >= r.exact_n for r in est)
        # sketch is fixed-size regardless of corpus
        assert cms_sketch(docs).count() <= CMS_DEPTH * CMS_WIDTH


class TestHll:
    def test_estimate_close_and_registers_bounded(self, spark):
        from oracdc_spark.catalog import load_table
        from oracdc_spark.operators.textops import (
            HLL_M, _gram_hash, hll_distinct_tokens, hll_registers,
        )

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        [r] = hll_distinct_tokens(docs).collect()
        assert r.rel_err <= 0.05  # 1024 registers => ~3% typical error
        # register table bounded by m, rho within bit budget
        toks = _docs_hashes(spark, docs)
        regs = hll_registers(toks).collect()
        assert len(regs) <= HLL_M
        assert all(1 <= x.m_j <= 51 for x in regs)


def _docs_hashes(spark, docs):
    import pyspark.sql.functions as F

    from oracdc_spark.operators.textops import _gram_hash, _tokens

    return docs.select(F.explode(_tokens()).alias("tok")).select(
        _gram_hash(F.lower("tok")).alias("h")
    )


class TestSketchMergeability:
    """The 100 TB property: sketch(A ∪ B) == merge(sketch(A), sketch(B))
    — partitions/days sketch independently and merge without rescans."""

    def test_hll_registers_merge_by_max(self, spark):
        import pyspark.sql.functions as F

        from oracdc_spark.catalog import load_table
        from oracdc_spark.operators.textops import hll_registers

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        ha = _docs_hashes(spark, docs.filter("doc_id % 2 = 0"))
        hb = _docs_hashes(spark, docs.filter("doc_id % 2 = 1"))
        merged = (
            hll_registers(ha).unionAll(hll_registers(hb))
            .groupBy("bucket").agg(F.max("m_j").alias("m_j"))
        )
        whole = hll_registers(_docs_hashes(spark, docs))
        assert merged.exceptAll(whole).count() == 0
        assert whole.exceptAll(merged).count() == 0

    def test_cms_cells_merge_by_sum(self, spark):
        import pyspark.sql.functions as F

        from oracdc_spark.catalog import load_table
        from oracdc_spark.operators.textops import cms_sketch

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        merged = (
            cms_sketch(docs.filter("doc_id % 2 = 0"))
            .unionAll(cms_sketch(docs.filter("doc_id % 2 = 1")))
            .groupBy("d", "bucket").agg(F.sum("cnt").alias("cnt"))
        )
        whole = cms_sketch(docs)
        assert merged.exceptAll(whole).count() == 0
        assert whole.exceptAll(merged).count() == 0


class TestTfIdf:
    def test_rare_term_outranks_ubiquitous(self, spark):
        """At equal in-doc frequency, a corpus-rare term must outscore a
        term that appears in every document."""
        from oracdc_spark.operators.textops import tfidf_top_terms

        docs = _docs(spark, [
            "common rare common rare",  # doc 0: tf(common)=tf(rare)=2
            "common filler filler",
            "common filler other",
        ])
        top = tfidf_top_terms(docs, k=3).where("doc_id = 0").collect()
        scores = {r.term: r.score for r in top}
        # equal tf: rare (df=1) must beat common (df=3)
        assert scores["rare"] > scores["common"]
        assert top[0].term == "rare"


class TestBloom:
    def test_no_false_negatives(self, spark):
        """The Bloom contract: every token that went into the filter
        must probe positive."""
        from oracdc_spark.catalog import load_table
        from oracdc_spark.operators.textops import bloom_membership_audit

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        row = bloom_membership_audit(docs).collect()[0]
        # all present probes positive (positives >= present, and every
        # false positive is an absent probe)
        assert row.n_bloom_pos - row.n_false_pos == row.n_present
        assert row.n_probe > row.n_present  # absent probes exist
        assert 0.0 <= row.fp_rate < 0.5

    def test_filter_is_bounded(self, spark):
        from oracdc_spark.operators.textops import (
            BLOOM_N_WORDS,
            bloom_build,
        )

        items = spark.createDataFrame(
            [(f"tok{i}",) for i in range(5000)], "tok string"
        )
        filt = bloom_build(items).collect()
        assert len(filt) <= BLOOM_N_WORDS
        # 32-bit words inside bigints: no sign-bit surprises
        assert all(0 <= r.bits < 2**32 for r in filt)

    def test_merge_by_bit_or(self, spark):
        """Two half-corpus filters OR-merged == the whole-corpus filter
        (the property that makes the sketch distributable)."""
        from oracdc_spark.operators.textops import bloom_build

        items = spark.createDataFrame(
            [(f"tok{i}",) for i in range(200)], "tok string"
        )
        merged = (
            bloom_build(items.filter("substring(tok, 4) % 2 = 0"))
            .unionAll(bloom_build(items.filter("substring(tok, 4) % 2 = 1")))
            .groupBy("word_idx").agg(F.bit_or("bits").alias("bits"))
        )
        whole = bloom_build(items)
        assert merged.exceptAll(whole).count() == 0
        assert whole.exceptAll(merged).count() == 0


class TestBigramLm:
    def test_scrambled_text_scores_lower(self, spark):
        """A document whose bigrams never repeat in the corpus must score
        below documents made of the corpus's common bigrams — the local
        fluency signal a unigram model can't see."""
        from oracdc_spark.operators.textops import bigram_logprob

        fluent = "the quick fox jumps over the lazy dog"
        docs = _docs(spark, [fluent, fluent, fluent, "dog the over fox quick jumps lazy the"])
        scores = {r.doc_id: r.mean_logprob for r in bigram_logprob(docs).collect()}
        assert scores[3] < scores[0]

    def test_short_docs_have_no_bigrams(self, spark):
        from oracdc_spark.operators.textops import bigram_logprob

        docs = _docs(spark, ["single", "two tokens"])
        rows = {r.doc_id: r.n_bigrams for r in bigram_logprob(docs).collect()}
        assert 0 not in rows  # one token -> no bigram positions
        assert rows[1] == 1


class TestBloomPrune:
    @pytest.mark.slow
    def test_prune_is_lossless_for_joins(self, spark):
        """join(pruned probe, build) == join(full probe, build): the
        no-false-negative guarantee makes pruning safe."""
        from oracdc_spark.operators.textops import bloom_build, bloom_prune

        build = spark.createDataFrame(
            [(f"key{i}",) for i in range(0, 300, 3)], "tok string"
        )
        probe = spark.createDataFrame(
            [(i, f"key{i % 400}") for i in range(2000)], "row_id long, tok string"
        )
        filt = bloom_build(build)
        pruned = bloom_prune(probe, "tok", filt)
        full_join = probe.join(build, "tok")
        pruned_join = pruned.join(build, "tok")
        assert full_join.exceptAll(pruned_join).count() == 0
        assert pruned_join.exceptAll(full_join).count() == 0
        # and it actually prunes: most non-members dropped
        assert pruned.count() < probe.count()

    def test_prune_keeps_duplicate_rows(self, spark):
        from oracdc_spark.operators.textops import bloom_build, bloom_prune

        build = spark.createDataFrame([("a",)], "tok string")
        probe = spark.createDataFrame([("a",), ("a",), ("zzz",)], "tok string")
        pruned = bloom_prune(probe, "tok", bloom_build(build))
        assert pruned.filter("tok = 'a'").count() == 2


class TestVocabCoverage:
    def test_known_distribution(self, spark):
        """10 'a' + 5 'b' + 5 'c': 50% needs {a}; 90% needs 3 tokens."""
        from oracdc_spark.operators.textops import vocab_coverage

        docs = _docs(spark, [" ".join(["a"] * 10 + ["b"] * 5 + ["c"] * 5)])
        got = {r.pct: r.vocab_size for r in vocab_coverage(docs).collect()}
        assert got[50] == 1
        assert got[90] == 3
        assert got[99] == 3

    def test_monotone_in_pct(self, spark):
        from oracdc_spark.catalog import load_table
        from oracdc_spark.operators.textops import vocab_coverage

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        rows = sorted(vocab_coverage(docs).collect(), key=lambda r: r.pct)
        sizes = [r.vocab_size for r in rows]
        assert sizes == sorted(sizes)


class TestBm25AndDsir:
    """Retrieval scorer + DSIR importance weights invariants (exact
    parity vs DuckDB is covered by run_parity)."""

    def test_bm25_ranks_contiguous_and_ordered(self, spark):
        import pyspark.sql.functions as F

        from oracdc_spark.catalog import load_table
        from oracdc_spark.operators.textops import bm25_rank
        from tests.conftest import SF_SMOKE

        out = bm25_rank(load_table(spark, SF_SMOKE, "documents"), k=5)
        rows = out.collect()
        assert rows, "bm25 returned nothing"
        by_term = {}
        for r in rows:
            by_term.setdefault(r.term, []).append(r)
        for term, rs in by_term.items():
            rs.sort(key=lambda r: r.rank)
            assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
            scores = [r.score for r in rs]
            assert scores == sorted(scores, reverse=True)
            assert all(r.tf > 0 for r in rs)

    def test_dsir_targets_rank_higher(self, spark):
        """Top DSIR docs should skew toward the target language."""
        from oracdc_spark.catalog import load_table
        from oracdc_spark.operators.textops import dsir_weights
        from tests.conftest import SF_SMOKE

        docs = load_table(spark, SF_SMOKE, "documents")
        top = dsir_weights(docs, target_lang="en", k=20)
        joined = top.join(docs.select("doc_id", "lang"), "doc_id")
        langs = [r.lang for r in joined.collect()]
        assert len(langs) == 20
        en_share_top = sum(1 for l in langs if l == "en") / len(langs)
        total = docs.count()
        en_share_corpus = docs.filter("lang = 'en'").count() / total
        assert en_share_top >= en_share_corpus


class TestGopherQuality:
    def _run(self, spark, rows):
        from oracdc_spark.operators.textops import gopher_quality

        docs = spark.createDataFrame(rows, "doc_id bigint, text string")
        return {r.doc_id: r for r in gopher_quality(docs, min_words=5).collect()}

    def test_rules(self, spark):
        good = "the quick brown fox and that dog have run with the pack again"
        out = self._run(
            spark,
            [
                (1, good),
                (2, "tiny doc"),  # below min word count
                (3, "the of and " + "# " * 40 + "that have with more words here"),  # symbol ratio
                (4, "12 34 56 78 90 11 22 33 44 55 the of"),  # alpha fraction
                (5, "nothing matching stop list here at all friends"),  # stop hits < 2
                (6, "\n".join(["• the of and that item"] * 10)),  # all bullet lines
            ],
        )
        assert out[1].keep
        assert not out[2].keep
        assert not out[3].keep
        assert not out[4].keep
        assert not out[5].keep
        assert not out[6].keep
        assert out[1].stop_hits >= 4
        assert out[3].n_symbols == 40

    def test_ellipsis_lines(self, spark):
        bad = "\n".join(["the of and that words trail off …"] * 10)
        mostly_ok = "\n".join(
            ["the of and that fine line here"] * 8
            + ["the of and that words trail off …"] * 2
        )
        out = self._run(spark, [(1, bad), (2, mostly_ok)])
        assert not out[1].keep
        assert out[2].keep


class TestUrlDomainStats:
    def test_counts_by_site(self, spark):
        from oracdc_spark.operators.textops import url_domain_stats

        docs = spark.createDataFrame(
            [
                (1, "see https://cdn1.media.example.org/a and http://www.example-news.com/p"),
                (2, "again https://cdn1.media.example.org/b twice https://cdn1.media.example.org/c"),
                (3, "no urls here"),
                (4, "other http://cdn2.media.example.org/z"),
            ],
            "doc_id long, text string",
        )
        got = {
            (r.site, r.domain): (r.n_urls, r.n_docs)
            for r in url_domain_stats(docs).collect()
        }
        assert got == {
            ("example.org", "cdn1.media.example.org"): (3, 2),
            ("example.org", "cdn2.media.example.org"): (1, 1),
            ("example-news.com", "www.example-news.com"): (1, 1),
        }


class TestC4Badwords:
    def test_hash_gate(self, spark):
        """Pages drop iff a lowercased token's md5 is blocklisted;
        counts are exact and matching is whole-token (substrings and
        case variants of a listed word don't fire unless the token
        itself hashes into the set)."""
        import hashlib

        from oracdc_spark.operators.textops import c4_badwords_filter

        hashes = [hashlib.md5(b"verboten").hexdigest()]
        docs = spark.createDataFrame(
            [
                (1, "a clean page of text"),
                (2, "this page says VERBOTEN twice verboten"),
                (3, "averbotenb is not the word verbotenx either"),
                (4, "verboten"),
            ],
            "doc_id long, text string",
        )
        got = {r.doc_id: r for r in c4_badwords_filter(docs, hashes).collect()}
        assert got[1].keep and got[1].n_bad == 0
        # lowercasing makes VERBOTEN hit too -> 2 bad tokens
        assert not got[2].keep and got[2].n_bad == 2
        assert got[3].keep and got[3].n_bad == 0
        assert not got[4].keep and got[4].n_tokens == 1


class TestC4LineFilter:
    def test_rules(self, spark):
        from oracdc_spark.operators.textops import c4_line_filter

        good = "\n".join(
            [
                "this line ends with terminal punctuation mark.",  # kept
                "short line.",  # dropped: < 5 words
                "no terminal punctuation on this line at all",  # dropped
                "enable JavaScript to view this page properly.",  # dropped
                "another perfectly fine sentence right here!",  # kept
                "and a third quality sentence to pass the page gate?",  # kept
            ]
        )
        brace = good + "\nvar x = { a: 1 }"
        lorem = good + "\nLorem Ipsum dolor sit amet."
        thin = "only one good line survives the filter here.\nshort."
        docs = spark.createDataFrame(
            [(1, good), (2, brace), (3, lorem), (4, thin)],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in c4_line_filter(docs).collect()}
        assert (out[1].n_lines, out[1].n_kept, out[1].keep) == (6, 3, True)
        # page poisons: kept-line inventory unchanged, page dropped
        assert out[2].n_kept == 3 and not out[2].keep
        assert out[3].n_kept == 4 and not out[3].keep  # lorem line itself passes line rules
        assert (out[4].n_kept, out[4].keep) == (1, False)
        # kept_chars = length of the newline-joined survivors
        kept_lines = [
            "this line ends with terminal punctuation mark.",
            "another perfectly fine sentence right here!",
            "and a third quality sentence to pass the page gate?",
        ]
        assert out[1].kept_chars == len("\n".join(kept_lines))


class TestUrlCanonicalDedup:
    def test_canonicalization_classes(self, spark):
        from oracdc_spark.operators.textops import url_canonical_dedup

        docs = spark.createDataFrame(
            [
                (1, "a HTTPS://WWW.Example.COM/Path/?utm_source=x&id=1#frag b"),
                (2, "c https://www.example.com:443/Path/?id=1 d"),
                (3, "e http://host.example.org:80/p/ f"),
                (4, "g http://host.example.org/p h"),
                (5, "no urls"),
                (6, "two https://a.example.com/?utm_source=s same https://a.example.com/ again"),
            ],
            "doc_id long, text string",
        )
        got = {
            r.canonical_url: (r.n_urls, r.n_docs, r.keep_doc)
            for r in url_canonical_dedup(docs).collect()
        }
        # case, default port, fragment, utm all collapse; keep-first wins
        assert got["https://www.example.com/Path/?id=1"] == (2, 2, 1)
        # :80 + trailing slash == bare
        assert got["http://host.example.org/p"] == (2, 2, 3)
        # lone utm param strips back to the bare URL (and its '?')
        assert got["https://a.example.com"] == (2, 1, 6)
        assert len(got) == 3

    def test_utm_strip_anchored_on_separator(self, spark):
        """A param whose NAME merely contains 'utm_' (xutm_b) is not a
        tracking param and must survive; consecutive utm params must
        all strip without merging adjacent params."""
        import pyspark.sql.functions as F

        from oracdc_spark.operators.textops import canonical_url

        cases = {
            "https://e.example.com/?a=1&xutm_b=2&c=3":
                "https://e.example.com/?a=1&xutm_b=2&c=3",
            "https://e.example.com/?utm_a=1&utm_b=2&utm_c=3&d=4":
                "https://e.example.com/?d=4",
            "https://e.example.com/?utm_a=1&utm_b=2&utm_c=3":
                "https://e.example.com",
            "https://e.example.com/?a=1&utm_b=2":
                "https://e.example.com/?a=1",
        }
        df = spark.createDataFrame([(u,) for u in cases], "url string")
        out = {r.url: r.canon for r in df.select(
            "url", canonical_url(F.col("url")).alias("canon")).collect()}
        assert out == cases


def test_canonical_url_idempotent(spark):
    """canon(canon(u)) == canon(u) over a messy URL variety — re-running
    dedup over an already-canonicalized corpus must be a no-op."""
    import pyspark.sql.functions as F

    from oracdc_spark.operators.textops import canonical_url

    urls = [
        "HTTPS://WWW.Example.COM:443/Path/?utm_source=x&utm_campaign=c2&id=2#frag",
        "http://News.example.org:80/a/7/",
        "https://a.example.com/?utm_source=s",
        "http://plain.example.net/p?x=1&utm_medium=m",
        "https://b.example.io/deep/path/",
        "http://c.example.co:80",
        "https://d.example.de:443/?utm_a=1&utm_b=2&keep=3",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    out = df.select(
        canonical_url(F.col("url")).alias("once"),
    ).select("once", canonical_url(F.col("once")).alias("twice"))
    assert all(r.once == r.twice for r in out.collect())


class TestPerplexityBuckets:
    def test_tertile_sizes_and_order(self, spark):
        from oracdc_spark.operators.textops import perplexity_buckets

        docs = spark.createDataFrame(
            [(i, f"common common common rare{i % 9}") for i in range(9)],
            "doc_id long, text string",
        )
        rows = perplexity_buckets(docs).collect()
        assert len(rows) == 9
        by_bucket: dict = {}
        for r in rows:
            by_bucket.setdefault(r.bucket, []).append(r)
        assert {b: len(v) for b, v in by_bucket.items()} == {
            "head": 3, "middle": 3, "tail": 3
        }
        # ranks are a permutation of 1..n and head ranks < middle < tail
        assert sorted(r.rn for r in rows) == list(range(1, 10))
        assert max(r.rn for r in by_bucket["head"]) < min(
            r.rn for r in by_bucket["middle"]
        )
        assert max(r.rn for r in by_bucket["middle"]) < min(
            r.rn for r in by_bucket["tail"]
        )

    def test_decomposition_matches_global_sort_across_bins(self, spark):
        """Force multiple coarse bins (tiny bin_div) and check the ranks
        still equal the literal global sort."""
        from pyspark.sql import Window
        import pyspark.sql.functions as F
        from oracdc_spark.operators.textops import perplexity_buckets

        docs = spark.createDataFrame(
            [(i, " ".join(f"w{(i * 7 + k) % 23}" for k in range(5 + i % 11)))
             for i in range(40)],
            "doc_id long, text string",
        )
        got = {r.doc_id: (r.q_mean_lp, r.rn, r.bucket)
               for r in perplexity_buckets(docs, bin_div=100).collect()}
        base = perplexity_buckets(docs, bin_div=1 << 40)  # single bin ⇒ global window
        want = {r.doc_id: (r.q_mean_lp, r.rn, r.bucket) for r in base.collect()}
        assert got == want and len(got) == 40

    def test_empty_docs_excluded(self, spark):
        from oracdc_spark.operators.textops import perplexity_buckets

        docs = spark.createDataFrame(
            [(1, "a b c"), (2, "   "), (3, "a a a")],
            "doc_id long, text string",
        )
        rows = perplexity_buckets(docs).collect()
        assert {r.doc_id for r in rows} == {1, 3}


class TestLangidConfusionAndQuantiles:
    def test_confusion_cells_sum_to_totals(self, spark):
        from oracdc_spark.catalog import load_table
        from oracdc_spark.operators.textops import langid_confusion

        rows = langid_confusion(
            load_table(spark, "/root/testdata/sf0.001", "documents")
        ).collect()
        assert len(rows) > 0
        by_lang: dict = {}
        for r in rows:
            by_lang.setdefault(r.lang, []).append(r)
        for lang, cells in by_lang.items():
            total = cells[0].lang_total
            assert sum(c.n_docs for c in cells) == total
            assert abs(sum(c.recall for c in cells) - 1.0) < 1e-4

    def test_quantiles_monotone_and_exact(self, spark):
        import pyspark.sql.functions as F
        from oracdc_spark.operators.textops import doc_length_quantiles, _tokens

        docs = spark.createDataFrame(
            [(i, " ".join(["w"] * (i + 1))) for i in range(100)],
            "doc_id long, text string",
        )
        q = {r.pct: r.n_tokens for r in doc_length_quantiles(docs).collect()}
        # lengths are exactly 1..100 -> pct-th percentile = pct
        assert q == {50: 50, 90: 90, 99: 99}


def test_minhash_estimate_audit_bounds(spark):
    from oracdc_spark.catalog import load_table
    from oracdc_spark.operators.dedup import minhash_estimate_audit

    r = minhash_estimate_audit(
        load_table(spark, "/root/testdata/sf0.001", "documents")
    ).collect()[0]
    assert r.n_pairs > 0
    assert 0 <= r.mean_est_ppm <= 1_000_000
    assert 0 <= r.mean_exact_ppm <= 1_000_000
    assert 0 <= r.mean_abs_err_ppm <= r.max_abs_err_ppm <= 1_000_000


class TestSplitDivergence:
    def test_identical_distributions_give_zero(self, spark):
        from oracdc_spark.operators.textops import split_divergence

        docs = spark.createDataFrame(
            [(i, "same tokens every time") for i in range(40)],
            "doc_id long, text string",
        )
        splits = spark.createDataFrame(
            [(i, "train" if i % 2 == 0 else "val") for i in range(40)],
            "doc_id long, split string",
        )
        r = split_divergence(docs, splits).collect()[0]
        assert r.jsd == 0.0
        assert r.train_only_vocab == 0 and r.val_only_vocab == 0

    def test_disjoint_vocab_gives_ln2(self, spark):
        import math

        from oracdc_spark.operators.textops import split_divergence

        docs = spark.createDataFrame(
            [(1, "aaa bbb ccc"), (2, "xxx yyy zzz")],
            "doc_id long, text string",
        )
        splits = spark.createDataFrame(
            [(1, "train"), (2, "val")], "doc_id long, split string"
        )
        r = split_divergence(docs, splits).collect()[0]
        assert abs(r.jsd - math.log(2)) < 1e-6
        assert r.shared_vocab == 0
        assert r.train_only_vocab == 3 and r.val_only_vocab == 3

    def test_bounds_on_real_corpus(self, spark):
        import math

        from oracdc_spark.catalog import load_table
        from oracdc_spark.operators.sampling import train_split
        from oracdc_spark.operators.textops import split_divergence

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        r = split_divergence(docs, train_split(docs)).collect()[0]
        assert 0.0 <= r.jsd <= math.log(2) + 1e-9
        assert r.n_train_tokens > r.n_val_tokens > 0


class TestCorpusDatasheet:
    def _ds(self, spark):
        rows = [
            (1, "a b c", "en", "s1", 5),
            (2, "d e", "en", "s2", 3),
            (3, "f", "fr", "s1", 1),
            (4, "g h i j", None, "s1", 7),
        ]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )
        return {
            (r.lang, r.source): r
            for r in textops.corpus_datasheet(docs).collect()
        }

    def test_rollups_consistent_and_null_marked(self, spark):
        ds = self._ds(spark)
        # grand total row aggregates everything
        g = ds[("(all)", "(all)")]
        assert g.n_docs == 4 and g.n_tokens == 3 + 2 + 1 + 4
        # per-lang rollup sums its (lang, source) cells
        en = ds[("en", "(all)")]
        assert en.n_docs == 2 and en.n_tokens == 5
        assert ds[("en", "s1")].n_docs == 1 and ds[("en", "s2")].n_docs == 1
        # genuine NULL lang is distinguishable from the rollup marker
        assert ds[("(null)", "s1")].n_docs == 1
        assert ("(null)", "(all)") in ds
        # 4 grouping sets: cells + lang rollups + source rollups + total
        langs, sources = {"en", "fr", "(null)"}, {"s1", "s2"}
        assert len(ds) == 4 + len(langs) + len(sources) + 1

    def test_single_pass_plan(self, spark):
        docs = spark.createDataFrame(
            [(1, "a", "en", "s1", 1)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        plan = textops.corpus_datasheet(docs)._jdf.queryExecution().executedPlan().toString()
        # CUBE compiles to one Expand + one aggregation — not a union of scans
        assert plan.count("Expand") == 1
        assert "Union" not in plan


class TestBoilerplateStrip:
    def test_cross_doc_lines_stripped_in_order(self, spark):
        """A line in >= min_docs distinct docs of the SAME source is
        stripped everywhere; same line under another source survives;
        order is preserved; fully-stripped docs emit ''."""
        nav = "HOME | ABOUT | CONTACT"
        rows = [
            (1, f"{nav}\nalpha body\ncookie notice", "s1"),
            (2, f"{nav}\nbeta body\ncookie notice", "s1"),
            (3, f"cookie notice\n{nav}\ngamma body", "s1"),
            (4, nav, "s1"),                       # nothing survives
            (5, f"{nav}\ndelta body", "s2"),      # other source: kept
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
        out = {r.doc_id: r for r in textops.boilerplate_strip(docs, min_docs=3).collect()}
        assert out[1].cleaned_text == "alpha body"
        assert out[1].n_lines_removed == 2
        assert out[2].cleaned_text == "beta body"
        assert out[3].cleaned_text == "gamma body"
        assert out[4].cleaned_text == "" and out[4].n_lines_removed == 1
        # s2 has only one doc: its nav line is below min_docs there
        assert out[5].cleaned_text == f"{nav}\ndelta body"
        assert out[5].n_lines_removed == 0

    def test_order_preserved_across_many_lines(self, spark):
        body = "\n".join(f"line {i}" for i in range(20))
        rows = [(i, f"AD\n{body}\nAD", "s") for i in range(3)]
        docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
        out = textops.boilerplate_strip(docs, min_docs=3).collect()
        # every body line also repeats across the 3 docs -> stripped too;
        # with min_docs=4 nothing is stripped and order survives intact
        assert all(r.cleaned_text == "" for r in out)
        out2 = textops.boilerplate_strip(docs, min_docs=4).collect()
        assert all(r.cleaned_text == f"AD\n{body}\nAD" for r in out2)
        assert all(r.n_lines_removed == 0 for r in out2)


class TestDedupCanonical:
    @pytest.mark.slow
    def test_one_representative_per_cluster_longest_wins(self, spark):
        from oracdc_spark.catalog import load_table
        from oracdc_spark.operators.dedup import dedup_canonical, dedup_clusters

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        n_docs = docs.count()
        reps = dedup_canonical(docs).collect()
        cl = dedup_clusters(docs).collect()
        by_cluster: dict = {}
        for r in cl:
            by_cluster.setdefault(r.cluster_id, []).append(r.doc_id)
        # exactly one representative per cluster, members fully counted
        assert {r.cluster_id for r in reps} == set(by_cluster)
        assert sum(r.n_members for r in reps) == n_docs
        chars = {r.doc_id: r.n_chars for r in docs.select("doc_id", "n_chars").collect()}
        for r in reps:
            members = by_cluster[r.cluster_id]
            assert r.n_members == len(members)
            best = min(members, key=lambda d: (-chars[d], d))
            assert r.doc_id == best and r.n_chars == chars[best]


class TestBpeMerges:
    """BPE merge learning: planted corpora pin the pair-count argmax,
    the greedy-left merge apply (padded double-replace identity), and
    tie-breaking.  Exact parity vs DuckDB is covered by run_parity."""

    def test_classic_sennrich_corpus(self, spark):
        """'low'*5 + 'lowest'*2: step1 merges (l,o) 7x; the merged 'lo'
        then pairs with 'w' 7x at step2; then (low, e) 2x at step3 ties
        with (es, t)... pin the first two exactly."""
        from oracdc_spark.operators.textops import bpe_merges

        docs = _docs(spark, ["low " * 5 + "lowest " * 2])
        rows = {r.step: (r.pair, r.merged, r.freq) for r in bpe_merges(docs).collect()}
        assert rows[1] == ("l o", "lo", 7)
        assert rows[2] == ("lo w", "low", 7)

    def test_greedy_left_overlap(self, spark):
        """'aaaa' (one word, count 3): pairs (a,a) x3 -> merge 'aa';
        greedy-left turns 'a a a a' into 'aa aa', so step2 sees pair
        (aa,aa) once per word, freq 3."""
        from oracdc_spark.operators.textops import bpe_merges

        docs = _docs(spark, ["aaaa aaaa aaaa"])
        rows = {r.step: (r.pair, r.freq) for r in bpe_merges(docs, steps=2).collect()}
        assert rows[1] == ("a a", 9)  # 3 word occurrences x 3 adjacent pairs
        assert rows[2] == ("aa aa", 3)

    def test_alternating_occurrences_all_merged(self, spark):
        """'ababab': the double-replace must catch the occurrence whose
        leading space the first pass consumed — 'a b a b a b' must end
        as 'ab ab ab', giving step2 pair (ab,ab) freq 2."""
        from oracdc_spark.operators.textops import bpe_merges

        docs = _docs(spark, ["ababab"])
        rows = {r.step: (r.pair, r.freq) for r in bpe_merges(docs, steps=2).collect()}
        assert rows[1] == ("a b", 3)
        assert rows[2] == ("ab ab", 2)

    def test_tie_breaks_lexicographic(self, spark):
        """'ba' and 'dc' each once: pairs (b,a) and (d,c) tie at 1;
        the lexicographically smaller 'b a' must win."""
        from oracdc_spark.operators.textops import bpe_merges

        docs = _docs(spark, ["ba dc"])
        rows = {r.step: r.pair for r in bpe_merges(docs, steps=1).collect()}
        assert rows[1] == "b a"

    def test_single_char_words_no_pairs(self, spark):
        """All 1-char words -> no pairs anywhere -> empty result."""
        from oracdc_spark.operators.textops import bpe_merges

        docs = _docs(spark, ["a b c a b"])
        assert bpe_merges(docs, steps=2).count() == 0

    def test_compression_marginal_gain_identity(self, spark):
        """symbols_before - symbols_after == sum of winning pair freqs
        (each merge collapses exactly freq pair occurrences into one
        symbol each) — the Sennrich marginal-gain identity."""
        from oracdc_spark.operators.textops import bpe_compression, bpe_merges

        docs = _docs(spark, ["low " * 5 + "lowest " * 2 + "newer " * 3])
        merges = bpe_merges(docs).collect()
        [c] = bpe_compression(docs).collect()
        assert c.symbols_before - c.symbols_after == sum(r.freq for r in merges)
        assert c.compression > 1.0
        assert c.n_words == 10 and c.n_word_types == 3


class TestWeakStem:
    def test_harman_rules(self, spark):
        """Pin each rule and each exception from Harman (1991)."""
        from oracdc_spark.operators.textops import weak_stem

        cases = {
            "parties": "party",    # ies -> y
            "eies": "eies",        # exception
            "aies": "aies",        # exception
            "classes": "classe",   # es -> e (drop only the s)
            "shoes": "shoes",      # oes exception
            "sees": "sees",        # ees exception
            "cats": "cat",         # s -> ''
            "corpus": "corpus",    # us exception
            "glass": "glass",      # ss exception
            "dog": "dog",          # no rule
        }
        df = spark.createDataFrame([(w,) for w in cases], "tok string")
        got = {r.tok: r.stem for r in df.select("tok", weak_stem(F.col("tok")).alias("stem")).collect()}
        assert got == cases

    def test_vocab_reduction_counts(self, spark):
        from oracdc_spark.operators.textops import stem_vocab_reduction

        docs = _docs(spark, ["cats cat dogs dog corpus glass"])
        [r] = stem_vocab_reduction(docs).collect()
        # {cats,cat}->cat, {dogs,dog}->dog, corpus, glass: 6 raw -> 4 stems
        assert r.n_tokens == 6 and r.vocab_raw == 6 and r.vocab_stemmed == 4
        assert abs(r.reduction_frac - round(2 / 6, 6)) < 1e-9


class TestTypoPairs:
    def test_substitution_deletion_found_distance2_rejected(self, spark):
        from oracdc_spark.operators.textops import typo_pairs

        docs = _docs(spark, [
            "spark spark spark spbrk",    # substitution (dist 1)
            "table tble",                  # deletion (dist 1)
            "merge mxrgx",                 # dist 2 — blocked candidate must be filtered
            "cat bat",                     # len < 4 — excluded by contract
        ])
        got = {(r.w1, r.w2): (r.n1, r.n2) for r in typo_pairs(docs).collect()}
        assert ("spark", "spbrk") in got and got[("spark", "spbrk")] == (3, 1)
        assert ("table", "tble") in got
        assert not any("mxrgx" in p for pair in got for p in pair)
        assert not any(w in ("cat", "bat") for pair in got for w in pair)

    def test_insertion_direction_covered(self, spark):
        """b = a plus one inserted char: a IS a deletion variant of b."""
        from oracdc_spark.operators.textops import typo_pairs

        docs = _docs(spark, ["filter fillter"])
        got = [(r.w1, r.w2) for r in typo_pairs(docs).collect()]
        assert got == [("fillter", "filter")] or got == [("filter", "fillter")]


class TestPmiCollocations:
    def test_planted_collocation_ranks_first(self, spark):
        from oracdc_spark.operators.textops import pmi_collocations

        # "neural network" always co-occurs; filler words pair randomly
        filler = "the a of to in on at by is was " * 3
        docs = _docs(spark, ["neural network " + filler] * 6)
        out = pmi_collocations(docs, min_count=5, k=5).collect()
        assert out[0].w1 == "neural" and out[0].w2 == "network"
        assert out[0].rank == 1
        # ranks are contiguous and ties deterministic
        assert [r.rank for r in out] == list(range(1, len(out) + 1))

    def test_min_count_suppresses_rare_pairs(self, spark):
        from oracdc_spark.operators.textops import pmi_collocations

        docs = _docs(spark, ["rare pair " + "x y " * 10])
        out = pmi_collocations(docs, min_count=5, k=10).collect()
        assert not any(r.w1 == "rare" for r in out)


class TestTopicClusterIntLabels:
    @pytest.mark.slow
    def test_int_labels_identical_output(self, spark):
        """The bigint-key CC rounds (order-preserving word ids) must
        produce byte-identical (word, cluster_id) rows to the string
        rounds — min-int ≡ min-lex-word under the sorted-rank mapping."""
        from oracdc_spark.catalog import load_table
        from oracdc_spark.operators.textops import pmi_topic_clusters

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        a = sorted(map(tuple, pmi_topic_clusters(docs).collect()))
        b = sorted(map(tuple, pmi_topic_clusters(docs, int_labels=True).collect()))
        assert a == b and a

    @pytest.mark.slow
    def test_int_labels_chain_component(self, spark):
        """A chain a-b-c-d (diameter 3) must collapse to one cluster
        labeled by the lexicographic minimum under both label kinds."""
        from oracdc_spark.operators.textops import pmi_topic_clusters

        # 6 docs pairing consecutive words tightly so PMI clears the bar
        texts = ["alpha bravo"] * 6 + ["bravo charlie"] * 6 + ["charlie delta"] * 6
        docs = _docs(spark, texts)
        for kw in ({}, {"int_labels": True}):
            got = {r.word: r.cluster_id for r in
                   pmi_topic_clusters(docs, min_count=3, **kw).collect()}
            assert got == {w: "alpha" for w in ("alpha", "bravo", "charlie", "delta")}
