"""Property-based invariants for the sampling family.

The 100 TB claim behind every md5-deterministic sampler is that the
result is a pure function of the DATA — independent of physical
partitioning, row order, and cluster size.  On a 1000-executor cluster
the same corpus arrives in whatever partition layout the scan produces;
a sampler whose output moved with partitioning would be unreproducible
and would break split/leakage audits downstream.  Hypothesis varies the
corpus; the tests vary the layout.
"""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from oracdc_spark.operators import sampling

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_DOCS = st.lists(
    st.tuples(
        st.text(alphabet="abcdef ", min_size=0, max_size=20),
        st.sampled_from(["en", "de", "fr"]),
    ),
    min_size=1,
    max_size=30,
)


def _df(spark, docs, n_parts):
    rows = [
        (i, t or "x", lang, "web", len(t)) for i, (t, lang) in enumerate(docs)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).repartition(n_parts)


@given(docs=_DOCS)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_train_split_partitions_corpus_and_is_layout_invariant(spark, docs):
    """Every doc lands in exactly one split, and the assignment is
    identical under different physical partitionings."""
    outs = []
    for n_parts in (1, 7):
        out = sampling.train_split(_df(spark, docs, n_parts))
        rows = sorted((r.doc_id, r.split) for r in out.collect())
        assert len(rows) == len(docs)  # a partition of the corpus
        assert len({d for d, _ in rows}) == len(docs)
        outs.append(rows)
    assert outs[0] == outs[1]


@given(docs=_DOCS)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_quota_sample_layout_invariant_and_within_quota(spark, docs):
    quota = 3
    outs = []
    for n_parts in (1, 5):
        out = sampling.quota_sample(_df(spark, docs, n_parts), quota=quota)
        rows = sorted((r.doc_id, r.lang) for r in out.collect())
        per_lang = {}
        for _, lang in rows:
            per_lang[lang] = per_lang.get(lang, 0) + 1
        assert all(v <= quota for v in per_lang.values())
        outs.append(rows)
    assert outs[0] == outs[1]


@given(docs=_DOCS)
@settings(**_SETTINGS)
def test_weighted_sample_size_and_membership(spark, docs):
    k = 5
    out = sampling.weighted_sample(_df(spark, docs, 3), k=k).collect()
    ids = [r.doc_id for r in out]
    assert len(ids) == min(k, len(docs))
    assert len(set(ids)) == len(ids)
    assert set(ids) <= set(range(len(docs)))


@given(docs=_DOCS)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_ab_assign_audit_total_and_layout_invariant(spark, docs):
    """The SRM audit (one row per arm) is a pure function of the data:
    identical under different layouts, counts sum to the corpus, and
    zero-unit arms still report (the most extreme SRM)."""
    outs = []
    for n_parts in (1, 4):
        out = sampling.ab_assign(_df(spark, docs, n_parts))
        rows = sorted(map(tuple, out.collect()))
        assert {r[0] for r in rows} == {"control", "treatment"}
        assert sum(r[1] for r in rows) == len(docs)
        outs.append(rows)
    assert outs[0] == outs[1]


def _model_pack(docs, budget, n_shards):
    """Scalar literal of pack_sequences: shard = doc_id % n_shards,
    doc_id-ordered prefix sums of whitespace token counts, seq =
    prefix_before div budget, per-(shard, seq) aggregates."""
    shards: dict[int, list[tuple[int, int]]] = {}
    for i, (t, _lang) in enumerate(docs):
        shards.setdefault(i % n_shards, []).append((i, len((t or "x").split())))
    out = {}
    for shard, rows in shards.items():
        prefix = 0
        for doc_id, n_tokens in sorted(rows):
            seq = prefix // budget
            key = (shard, seq)
            n_docs, sum_t, first, last = out.get(key, (0, 0, doc_id, doc_id))
            out[key] = (n_docs + 1, sum_t + n_tokens, min(first, doc_id), max(last, doc_id))
            prefix += n_tokens
    return {
        (shard, seq, n, s, f, l) for (shard, seq), (n, s, f, l) in out.items()
    }


@given(docs=_DOCS)
@settings(**_SETTINGS)
def test_pack_sequences_equals_scalar_first_fit_model(spark, docs):
    budget, n_shards = 4, 2
    got = {
        (r.shard, r.seq_id, r.n_docs, r.sum_tokens, r.first_doc, r.last_doc)
        for r in sampling.pack_sequences(
            _df(spark, docs, 3), budget=budget, n_shards=n_shards
        ).collect()
    }
    assert got == _model_pack(docs, budget, n_shards)


def test_pack_sequences_conserves_tokens_and_bounds_overflow(spark):
    """Packing invariants on a fixed mixed corpus: every document lands
    in exactly one sequence (token conservation), sequences are
    doc_id-contiguous per shard, and any sequence except possibly the
    one holding an over-budget document stays within budget + the
    largest single document (greedy spillover bound)."""
    docs = [("w " * n).strip() for n in (1, 3, 9, 2, 2, 5, 1, 1)]
    df = _df(spark, [(t, "en") for t in docs], 2)
    seqs = sampling.pack_sequences(df, budget=4, n_shards=2).collect()
    assert sum(r.sum_tokens for r in seqs) == sum(len(t.split()) for t in docs)
    for r in seqs:
        assert r.n_docs >= 1 and r.first_doc <= r.last_doc


@given(docs=_DOCS)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_temperature_mix_equals_cross_multiplied_model(spark, docs):
    """temperature_mix membership is the exact DECIMAL inequality
    hash32(doc) * W_tot * n_l < w_l * N_tot * 2^32 with w_l =
    HALF_UP(sqrt(n_l) * 1e6) — replayed with Python bigints and the
    same md5-prefix coin."""
    import hashlib
    import math
    from decimal import ROUND_HALF_UP, Decimal

    got = {
        (r.doc_id, r.lang, r.n_l)
        for r in sampling.temperature_mix(_df(spark, docs, 3)).collect()
    }
    n_by_lang: dict[str, int] = {}
    for _t, lang in docs:
        n_by_lang[lang] = n_by_lang.get(lang, 0) + 1
    w = {
        lang: int(
            Decimal(repr(math.sqrt(n) * 1e6)).quantize(
                Decimal("1"), rounding=ROUND_HALF_UP
            )
        )
        for lang, n in n_by_lang.items()
    }
    w_tot, n_tot = sum(w.values()), sum(n_by_lang.values())
    expect = set()
    for i, (_t, lang) in enumerate(docs):
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
        if h * w_tot * n_by_lang[lang] < w[lang] * n_tot * (1 << 32):
            expect.add((i, lang, n_by_lang[lang]))
    assert got == expect


def _h32(x):
    import hashlib

    return int(hashlib.md5(str(x).encode()).hexdigest()[:8], 16)


@given(docs=_DOCS)
@settings(**_SETTINGS)
def test_quota_sample_equals_md5_rank_model(spark, docs):
    """Beyond layout-invariance/within-quota: the kept set and in-group
    ranks equal the scalar (hash32(doc_id), doc_id) order replay."""
    quota = 2
    got = {
        (r.doc_id, r.lang, r.rk)
        for r in sampling.quota_sample(_df(spark, docs, 3), quota=quota).collect()
    }
    groups: dict[str, list[int]] = {}
    for i, (_t, lang) in enumerate(docs):
        groups.setdefault(lang, []).append(i)
    expect = set()
    for lang, ids in groups.items():
        for rk, i in enumerate(
            sorted(ids, key=lambda i: (_h32(i), i))[:quota], start=1
        ):
            expect.add((i, lang, rk))
    assert got == expect


@given(docs=_DOCS)
@settings(**_SETTINGS)
def test_train_split_equals_integer_threshold_model(spark, docs):
    got = {
        (r.doc_id, r.split)
        for r in sampling.train_split(_df(spark, docs, 3)).collect()
    }
    test_lt = (2**32) * 5 // 100
    val_lt = (2**32) * 10 // 100
    expect = set()
    for i in range(len(docs)):
        h = _h32(i)
        split = "test" if h < test_lt else ("val" if h < val_lt else "train")
        expect.add((i, split))
    assert got == expect


@given(docs=_DOCS)
@settings(**_SETTINGS)
def test_weighted_sample_equals_priority_key_model(spark, docs):
    """weighted_sample equals the scalar priority-sampling replay: key
    = (hash32 << 20) div max(n_chars, 1) in exact ints, k smallest by
    (key, doc_id)."""
    k = 3
    got = [
        (r.doc_id, r.weight, r.skey)
        for r in sampling.weighted_sample(_df(spark, docs, 3), k=k).collect()
    ]
    keyed = []
    for i, (t, _lang) in enumerate(docs):
        w = max(len(t), 1)  # _df writes n_chars = len(text)
        keyed.append(((_h32(i) << 20) // w, i, w))
    keyed.sort()
    expect = [(i, w, key) for key, i, w in keyed[:k]]
    assert sorted(got) == sorted(expect)


@given(docs=_DOCS)
@settings(**_SETTINGS)
def test_chunk_documents_equals_sliding_window_model(spark, docs):
    """chunk_documents equals the literal sliding-window replay: starts
    at 0, stride, ... while < n_tokens; final chunk may be short;
    tokenless docs produce no chunks."""
    size, stride = 3, 2
    got = {
        (r.doc_id, r.chunk_id, r.start_tok, r.n_chunk_tokens, r.chunk_text)
        for r in sampling.chunk_documents(
            _df(spark, docs, 3), size=size, stride=stride
        ).collect()
    }
    expect = set()
    for i, (t, _lang) in enumerate(docs):
        toks = (t or "x").split()
        n = len(toks)
        for cid, start in enumerate(range(0, n, stride)):
            chunk = toks[start : start + size]
            expect.add((i, cid, start, len(chunk), " ".join(chunk)))
    assert got == expect
