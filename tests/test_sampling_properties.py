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
