"""Property: the retrieval fusion/rerank stack equals scalar replays.

`hybrid_rrf_topk` and `mmr_rerank` are multi-stage compositions
(rank fusion across a full-outer candidate union; a greedy
relevance-vs-redundancy loop over pairwise sims) — the shapes where a
distributed unrolling can silently diverge from the algorithm.  Scalar
replays on random (text, embedding) corpora pin:

* lexical candidates = distinct-shingle intersection counts with the
  (common desc, neighbor asc) tie-break, zero-overlap pairs absent;
* RRF fusion = coalesce(1/(k+sem), 0) + coalesce(1/(k+lex), 0) over
  the UNION of candidate lists (one-source documents still score);
* MMR = the literal Carbonell-Goldstein greedy: position 1 is the
  relevance argmax, each next pick maximizes 0.7*rel - 0.3*max-sim
  against everything already picked, ties to the lower doc id,
  stopping early when candidates run out.
"""

from __future__ import annotations

import pytest

from decimal import ROUND_HALF_UP, Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from oracdc_spark.operators.retrieval import hybrid_rrf_topk, lexical_topk, mmr_rerank

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_GRID = [-1.0, -0.5, -0.25, 0.0, 0.25, 0.5, 1.0]
_NONZERO = [-0.5, -0.25, 0.25, 1.0]
_DOC = st.lists(
    st.sampled_from(["a", "b", "c", "dd"]), min_size=0, max_size=9
).map(" ".join)
_VEC = st.tuples(
    st.sampled_from(_NONZERO),
    st.sampled_from(_GRID),
    st.sampled_from(_GRID),
).map(list)
_CORPUS = st.lists(st.tuples(_DOC, _VEC), min_size=2, max_size=8)


def _docs_df(spark, corpus):
    return spark.createDataFrame(
        [(i, t) for i, (t, _v) in enumerate(corpus)], "doc_id long, text string"
    )


def _vecs_df(spark, corpus):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, (_t, v) in enumerate(corpus)],
        "vec_id long, embedding array<float>",
    )


def _score(a, b):
    qa = [int(round(x * 1000)) for x in a]
    qb = [int(round(x * 1000)) for x in b]
    dot = sum(x * y for x, y in zip(qa, qb))
    if dot == 0:
        return 0.0
    s = (
        float(dot)
        * float(dot)
        / (float(sum(x * x for x in qa)) * float(sum(x * x for x in qb)))
    )
    return s if dot > 0 else -s


def _sem_ranks(corpus, qid, k):
    scored = sorted(
        (-_score(corpus[qid][1], corpus[j][1]), j)
        for j in range(len(corpus))
        if j != qid
    )
    return {j: r for r, (_, j) in enumerate(scored[:k], start=1)}


def _lex_ranks(corpus, qid, k, n=2):
    def sh(text):
        toks = text.split()
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    qs = sh(corpus[qid][0])
    commons = []
    for j in range(len(corpus)):
        if j == qid:
            continue
        c = len(qs & sh(corpus[j][0]))
        if c:
            commons.append((-c, j))
    commons.sort()
    return {j: r for r, (_, j) in enumerate(commons[:k], start=1)}


@given(corpus=_CORPUS)
@settings(**_SETTINGS)
def test_lexical_topk_matches_intersection_model(spark, corpus):
    got = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in lexical_topk(
            _docs_df(spark, corpus), query_mod=2, k=3, n=2
        ).collect()
    }
    expect = {
        (q, j, r)
        for q in range(0, len(corpus), 2)
        for j, r in _lex_ranks(corpus, q, 3).items()
    }
    assert got == expect


@given(corpus=_CORPUS)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_hybrid_rrf_matches_fusion_model(spark, corpus):
    k, k_sem, k_lex, rrf_k = 4, 3, 3, 60
    got = {
        (r.query_id, r.neighbor_id, r.sem_rank, r.lex_rank, r.score, r.rank)
        for r in hybrid_rrf_topk(
            _docs_df(spark, corpus),
            _vecs_df(spark, corpus),
            query_mod=2,
            k=k,
            k_sem=k_sem,
            k_lex=k_lex,
            rrf_k=rrf_k,
        ).collect()
    }
    expect = set()
    for q in range(0, len(corpus), 2):
        sem = _sem_ranks(corpus, q, k_sem)
        lex = _lex_ranks(corpus, q, k_lex, n=5)  # hybrid uses lexical_topk's default n=5
        fused = []
        for j in set(sem) | set(lex):
            score = (1.0 / (rrf_k + sem[j]) if j in sem else 0.0) + (
                1.0 / (rrf_k + lex[j]) if j in lex else 0.0
            )
            fused.append((-score, j, score))
        fused.sort(key=lambda t: (t[0], t[1]))
        for rank, (_, j, score) in enumerate(fused[:k], start=1):
            r6 = float(
                Decimal(repr(score)).quantize(
                    Decimal("0.000001"), rounding=ROUND_HALF_UP
                )
            )
            expect.add((q, j, sem.get(j), lex.get(j), r6, rank))
    assert got == expect


@given(corpus=_CORPUS)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_mmr_matches_greedy_scalar_replay(spark, corpus):
    n_cand, k = 4, 3
    got = {
        (r.query_id, r.doc_id, r.position)
        for r in mmr_rerank(
            _vecs_df(spark, corpus), query_mod=2, n_candidates=n_cand, k=k
        ).collect()
    }
    expect = set()
    for q in range(0, len(corpus), 2):
        cand_rel = _sem_ranks(corpus, q, n_cand)  # rank -> implies order
        # re-derive the relevance scores for the candidate set
        rel = {j: _score(corpus[q][1], corpus[j][1]) for j in cand_rel}
        remaining = sorted(cand_rel)
        if not remaining:
            continue
        first = min(remaining, key=lambda j: (-rel[j], j))
        picked = [first]
        expect.add((q, first, 1))
        remaining.remove(first)
        for pos in range(2, k + 1):
            if not remaining:
                break
            best = min(
                remaining,
                key=lambda j: (
                    -(
                        0.7 * rel[j]
                        - 0.3
                        * max(_score(corpus[j][1], corpus[s][1]) for s in picked)
                    ),
                    j,
                ),
            )
            picked.append(best)
            expect.add((q, best, pos))
            remaining.remove(best)
    assert got == expect
