"""Property-based checks for the global-cut decomposition operators:
whatever corpus hypothesis constructs, the scale-safe decomposition must
equal the literal global computation (the same theorem the DuckDB
oracles pin at fixed corpora, here exercised over adversarial shapes —
ties everywhere, empty docs, constant scores)."""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window

DOC = st.lists(
    st.sampled_from(["a", "b", "c", "dd", "ee", "fff"]), min_size=0, max_size=12
).map(" ".join)
CORPUS = st.lists(DOC, min_size=1, max_size=25)

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(docs=CORPUS, budget=st.integers(min_value=0, max_value=120))
@settings(**_SETTINGS)
@pytest.mark.slow
def test_token_budget_global_equals_global_sort(spark, docs, budget):
    from oracdc_spark.operators.sampling import token_budget_global

    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    got = {
        (r.doc_id, r.n_tokens, r.score, r.cum_tokens)
        for r in token_budget_global(df, budget=budget).collect()
    }
    toks = F.filter(F.split(F.trim("text"), r"\s+"), lambda x: x != "")
    nt = F.size(toks).cast("bigint")
    nd = F.size(F.array_distinct(toks)).cast("bigint")
    scored = df.select(
        "doc_id",
        nt.alias("n_tokens"),
        F.when(nt > 0, F.expr(f"CAST(1000000 AS BIGINT)") * nd)
        .otherwise(F.lit(0))
        .alias("_num"),
    ).select(
        "doc_id",
        "n_tokens",
        F.when(F.col("n_tokens") > 0, F.expr("_num div n_tokens"))
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
        .filter(F.col("cum_tokens") <= budget)
        .collect()
    }
    assert got == want


@given(docs=CORPUS)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_perplexity_bucket_ranks_are_bin_div_invariant(spark, docs):
    from oracdc_spark.operators.textops import perplexity_buckets

    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    fine = {
        r.doc_id: (r.q_mean_lp, r.rn, r.bucket)
        for r in perplexity_buckets(df, bin_div=7).collect()
    }
    single_bin = {
        r.doc_id: (r.q_mean_lp, r.rn, r.bucket)
        for r in perplexity_buckets(df, bin_div=1 << 40).collect()
    }
    assert fine == single_bin


@given(docs=CORPUS)
@settings(**_SETTINGS)
def test_length_quantiles_match_rank_definition(spark, docs):
    from oracdc_spark.operators.textops import doc_length_quantiles

    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    lens = sorted(len([t for t in d.split() if t]) for d in docs)
    got = {r.pct: r.n_tokens for r in doc_length_quantiles(df).collect()}
    n = len(lens)
    for pct, val in got.items():
        # smallest length whose cumulative count covers pct% of docs
        want = next(
            l for i, l in enumerate(lens) if (i + 1) * 100 >= n * pct
        )
        assert val == want, (pct, lens)
