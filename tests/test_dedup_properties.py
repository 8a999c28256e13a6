"""Property-based invariants for the dedup family: whatever corpus
hypothesis constructs (repeats, empty docs, shared prefixes), the
structural relationships between the operators must hold — the
cross-operator theorems the fixed-corpus oracles cannot exercise."""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

# small alphabet + short docs force collisions: duplicate shingles,
# whole-doc repeats, sub-document containment
DOC = st.lists(
    st.sampled_from(["a", "b", "c", "dd", "ee"]), min_size=0, max_size=14
).map(" ".join)
CORPUS = st.lists(DOC, min_size=1, max_size=14)

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, docs):
    return spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )


@given(docs=CORPUS)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_clusters_fast_equals_plain_propagation(spark, docs):
    """Pointer-jumping min-label CC must be output-identical to the
    plain O(diameter) propagation on every graph the pair stage can
    produce (the equality the bench-slot swap in r8 relies on)."""
    from oracdc_spark.operators.dedup import dedup_clusters, dedup_clusters_fast

    df = _df(spark, docs)
    plain = {(r.doc_id, r.cluster_id)
             for r in dedup_clusters(df, n=2, threshold=0.3).collect()}
    fast = {(r.doc_id, r.cluster_id)
            for r in dedup_clusters_fast(df, n=2, threshold=0.3).collect()}
    assert fast == plain


@given(docs=CORPUS)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_containment_dominates_jaccard(spark, docs):
    """For every pair, max-containment ≥ Jaccard (|A∩B|/min ≥ |A∩B|/|A∪B|):
    any pair the symmetric operator surfaces at threshold t must appear
    in the containment relation at the same t (sub-document detection
    is strictly more permissive)."""
    import pyspark.sql.functions as F

    from oracdc_spark.operators.dedup import containment_pairs, jaccard_pairs

    df = _df(spark, docs)
    jac = {(r.d1, r.d2) for r in jaccard_pairs(df, n=2, threshold=0.5).collect()}
    cont = {
        (min(r.d1, r.d2), max(r.d1, r.d2))
        for r in containment_pairs(df, n=2, threshold=0.5).collect()
    }
    assert jac <= cont


@given(docs=CORPUS)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_canonical_quality_partitions_the_corpus(spark, docs):
    """Canonical selection is a partition: every doc belongs to exactly
    one cluster, exactly one canonical row per cluster, member counts
    sum to the corpus size, and the winner has the cluster-max distinct
    count."""
    from oracdc_spark.operators.dedup import dedup_canonical_quality, dedup_clusters

    df = _df(spark, docs)
    rows = dedup_canonical_quality(df, n=2, threshold=0.3).collect()
    assert len({r.cluster_id for r in rows}) == len(rows)
    assert sum(r.n_members for r in rows) == len(docs)
    members = {}
    for r in dedup_clusters(df, n=2, threshold=0.3).collect():
        members.setdefault(r.cluster_id, []).append(r.doc_id)
    singles = set(range(len(docs))) - {
        d for v in members.values() for d in v
    }
    assert {r.cluster_id for r in rows} == set(members) | singles


def _model_shingles(doc, n=2):
    toks = doc.split()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


@given(docs=CORPUS)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_jaccard_pairs_match_bruteforce(spark, docs):
    """The shingle-self-join Jaccard must equal a literal all-pairs
    set computation (the quadratic form the distributed plan exists to
    avoid) on every random corpus — values included, not just pair
    membership."""
    from oracdc_spark.operators.dedup import jaccard_pairs

    got = {
        (r.d1, r.d2): (r.common, r.jac)
        for r in jaccard_pairs(_df(spark, docs), n=2, threshold=0.3).collect()
    }
    sets = [_model_shingles(d) for d in docs]
    want = {}
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            common = len(sets[i] & sets[j])
            union = len(sets[i] | sets[j])
            if not common:
                continue
            jac = round(common / union, 4)
            if jac >= 0.3:
                want[(i, j)] = (common, jac)
    assert set(got) == set(want)
    for k, (common, jac) in want.items():
        assert got[k][0] == common and abs(got[k][1] - jac) < 1e-9


@given(docs=CORPUS)
@settings(**_SETTINGS)
def test_minhash_signature_matches_hashlib_model(spark, docs):
    """The one-shuffle wide-aggregate MinHash signature equals an
    independent hashlib computation: mh_i = min over the doc's distinct
    shingles of md5('<i>|<shingle>') hex — validating tokenization,
    shingling, seed framing and the string-min in one theorem.  A doc
    with fewer than n tokens has no shingles and no signature row."""
    import hashlib

    from oracdc_spark.operators.dedup import minhash_signatures

    k = 4
    rows = minhash_signatures(_df(spark, docs), n=2, num_hashes=k).collect()
    got = {r.doc_id: tuple(r[f"mh{i}"] for i in range(k)) for r in rows}
    want = {}
    for d, doc in enumerate(docs):
        sh = _model_shingles(doc)
        if not sh:
            continue
        want[d] = tuple(
            min(hashlib.md5(f"{i}|{s}".encode()).hexdigest() for s in sh)
            for i in range(k)
        )
    assert got == want


def _r4(x):
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(x)).quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP))


@given(docs=CORPUS)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_containment_pairs_match_bruteforce(spark, docs):
    """containment_pairs equals the literal Broder containment on
    brute-force shingle sets: common = |A∩B|, c(A→B) = common/|A|
    rounded HALF_UP to 4, pair emitted iff either direction clears the
    threshold (zero-intersection pairs never appear)."""
    from oracdc_spark.operators.dedup import containment_pairs

    n, thr = 2, 0.5
    got = {
        (r.d1, r.d2, r.common, r.c1_in_2, r.c2_in_1)
        for r in containment_pairs(_df(spark, docs), n=n, threshold=thr).collect()
    }
    sets = {i: _model_shingles(t, n) for i, t in enumerate(docs)}
    expect = set()
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            common = len(sets[i] & sets[j])
            if not common:
                continue
            c12, c21 = _r4(common / len(sets[i])), _r4(common / len(sets[j]))
            if c12 >= thr or c21 >= thr:
                expect.add((i, j, common, c12, c21))
    assert got == expect


def _model_simhash(text, bits=60):
    import hashlib

    toks = text.split()
    if not toks:
        return None
    hs = [int(hashlib.md5(t.encode()).hexdigest()[:15], 16) for t in toks]
    out = 0
    for b in range(bits):
        ones = sum((h >> b) & 1 for h in hs)
        if ones * 2 > len(hs):
            out |= 1 << b
    return out


@given(docs=CORPUS)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_simhash_matches_scalar_majority_model(spark, docs):
    """simhash equals the scalar per-bit token-majority model (token
    multiplicity counted, strict majority, md5 15-hex-char hashes);
    tokenless documents emit no fingerprint row."""
    from oracdc_spark.operators.dedup import simhash

    got = {r.doc_id: r.simhash for r in simhash(_df(spark, docs)).collect()}
    expect = {
        i: _model_simhash(t) for i, t in enumerate(docs) if _model_simhash(t) is not None
    }
    assert got == expect


@given(docs=CORPUS)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_simhash_candidates_match_rotation_model(spark, docs):
    """simhash_candidates equals the scalar rotate-and-prefix model:
    d1 < d2 pairs sharing the top prefix_bits of the 60-bit fingerprint
    under ANY of the per-rotation left-rotates by (r*60)//rotations."""
    from oracdc_spark.operators.dedup import simhash_candidates

    prefix_bits, rotations = 4, 3
    got = {
        (r.d1, r.d2)
        for r in simhash_candidates(
            _df(spark, docs), prefix_bits=prefix_bits, rotations=rotations
        ).collect()
    }
    sigs = {
        i: _model_simhash(t)
        for i, t in enumerate(docs)
        if _model_simhash(t) is not None
    }
    expect = set()
    ids = sorted(sigs)
    for r in range(rotations):
        s = (r * 60) // rotations
        rot = {
            i: ((v << s) & ((1 << 60) - 1)) | (v >> (60 - s)) if s else v
            for i, v in sigs.items()
        }
        for ai in range(len(ids)):
            for bi in range(ai + 1, len(ids)):
                i, j = ids[ai], ids[bi]
                if rot[i] >> (60 - prefix_bits) == rot[j] >> (60 - prefix_bits):
                    expect.add((i, j))
    assert got == expect


@given(docs=CORPUS)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_tfidf_cosine_pairs_match_bruteforce(spark, docs):
    """tfidf_cosine_pairs equals the literal sparse model: n-gram terms
    WITH multiplicity, df-window [df_min, df_max] keeps the term, weight
    = HALF_UP(tf * ln(1 + N/df) * 1000) as an exact int, score =
    round(dot^2/(n1*n2), 6) over kept terms only — including the df_max
    boilerplate cut dropping terms from the dot AND the norms."""
    import math

    from oracdc_spark.operators.dedup import tfidf_cosine_pairs

    n, df_min, df_max, thr = 2, 2, 3, 0.01
    got = {
        (r.d1, r.d2, r.n_shared_terms, r.score)
        for r in tfidf_cosine_pairs(
            _df(spark, docs), n=n, df_min=df_min, df_max=df_max, threshold=thr
        ).collect()
    }
    N = len(docs)
    tf: dict[int, dict[str, int]] = {}
    for i, t in enumerate(docs):
        toks = t.split()
        terms: dict[str, int] = {}
        for j in range(len(toks) - n + 1):
            g = " ".join(toks[j : j + n])
            terms[g] = terms.get(g, 0) + 1
        tf[i] = terms
    df_of: dict[str, int] = {}
    for terms in tf.values():
        for g in terms:
            df_of[g] = df_of.get(g, 0) + 1
    kept = {g for g, d in df_of.items() if df_min <= d <= df_max}
    w = {
        (i, g): int(
            __import__("decimal").Decimal(
                repr(c * math.log(1.0 + N / df_of[g]) * 1000)
            ).quantize(
                __import__("decimal").Decimal("1"),
                rounding=__import__("decimal").ROUND_HALF_UP,
            )
        )
        for i, terms in tf.items()
        for g, c in terms.items()
        if g in kept
    }
    n2 = {}
    for (i, _g), wv in w.items():
        n2[i] = n2.get(i, 0) + wv * wv
    expect = set()
    for i in range(N):
        for j in range(i + 1, N):
            shared = [g for g in kept if (i, g) in w and (j, g) in w]
            if not shared:
                continue
            dot = sum(w[(i, g)] * w[(j, g)] for g in shared)
            score = _r6(float(dot) * float(dot) / (float(n2[i]) * float(n2[j])))
            if score >= thr:
                expect.add((i, j, len(shared), score))
    assert got == expect


def _r6(x):
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP))


@given(docs=CORPUS)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_lsh_candidates_match_banding_model(spark, docs):
    """minhash_lsh_candidates equals the scalar banding model on top of
    the (already theorem-pinned) hashlib signatures: band_sig is the
    '|'-joined run of rows_per_band mins, a pair is a candidate iff ANY
    band matches, n_shared_bands counts the matching bands."""
    import hashlib

    from oracdc_spark.operators.dedup import minhash_lsh_candidates

    k, bands = 4, 2
    got = {
        (r.d1, r.d2, r.n_shared_bands)
        for r in minhash_lsh_candidates(
            _df(spark, docs), n=2, num_hashes=k, bands=bands
        ).collect()
    }
    sigs = {}
    for d, doc in enumerate(docs):
        sh = _model_shingles(doc)
        if not sh:
            continue
        mhs = [
            min(hashlib.md5(f"{i}|{s}".encode()).hexdigest() for s in sh)
            for i in range(k)
        ]
        rpb = k // bands
        sigs[d] = ["|".join(mhs[b * rpb : (b + 1) * rpb]) for b in range(bands)]
    expect = set()
    ids = sorted(sigs)
    for ai, i in enumerate(ids):
        for j in ids[ai + 1 :]:
            shared = sum(1 for b in range(bands) if sigs[i][b] == sigs[j][b])
            if shared:
                expect.add((i, j, shared))
    assert got == expect


@given(docs=CORPUS)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_clusters_match_union_find_model(spark, docs):
    """r10 (oracle-authorship audit): `dedup_clusters`' min-label
    propagation — and, via test_clusters_fast_equals_plain_propagation,
    the pointer-jumping variant — equals an INDEPENDENT scalar
    union-find over the literal pair relation.  The driver oracle and
    the fast==plain property both compare implementations that share
    the propagation idea; this is the from-first-principles leg
    (disjoint-set forest, nothing iterative in common with the plan):
    components of the jaccard>=t graph, cluster_id = component min,
    singletons as their own cluster, every doc exactly once."""
    from oracdc_spark.operators.dedup import dedup_clusters

    got = {
        (r.doc_id, r.cluster_id)
        for r in dedup_clusters(_df(spark, docs), n=2, threshold=0.3).collect()
    }
    sets = [_model_shingles(d) for d in docs]
    parent = list(range(len(docs)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            common = len(sets[i] & sets[j])
            if not common:
                continue
            union = len(sets[i] | sets[j])
            if round(common / union, 4) >= 0.3:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
    comp_min = {}
    for i in range(len(docs)):
        r = find(i)
        comp_min[r] = min(comp_min.get(r, i), i)
    expect = {(i, comp_min[find(i)]) for i in range(len(docs))}
    assert got == expect


@given(docs=CORPUS, bench=st.lists(DOC, min_size=0, max_size=5))
@settings(**_SETTINGS)
@pytest.mark.slow
def test_contamination_check_matches_scalar_set_model(spark, docs, bench):
    """r10 (oracle-authorship audit): `textops.contamination_check`'s
    broadcast shingle screen equals the literal per-document set
    computation — fraction of a doc's DISTINCT n-gram shingles present
    anywhere in the benchmark's shingle set; docs with <n tokens emit
    no row.  The DuckDB oracle replays the same join shape, so this
    scalar model is the family's independent leg."""
    from oracdc_spark.operators.textops import contamination_check

    df = _df(spark, docs)
    bdf = spark.createDataFrame(
        [(1000 + i, b) for i, b in enumerate(bench)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_shingles, r.n_contaminated, r.contamination_ratio)
        for r in contamination_check(df, bdf, n=2).collect()
    }
    bset = set().union(*[_model_shingles(b) for b in bench]) if bench else set()
    expect = {}
    for i, d in enumerate(docs):
        sh = _model_shingles(d)
        if not sh:
            continue
        hit = len(sh & bset)
        expect[i] = (len(sh), hit, round(hit / len(sh), 6))
    assert got == expect


@given(docs=CORPUS)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_content_chunks_match_scalar_cdc_model(spark, docs):
    """r10 (oracle-authorship audit): `content_chunk_dedup_stats`'
    window-function chunking equals a literal scalar replay of the
    content-defined rule — cut AFTER token i iff md5-hash(gram-token
    window ending at i) % modulus == 0 (only for i >= gram-1), chunk =
    running count of prior cuts, a chunk is duplicated iff its token
    text occurs in >= 2 distinct documents.  The DuckDB oracle replays
    the same prefix-sum form; this is the independent per-document
    loop."""
    import hashlib

    from oracdc_spark.operators.dedup import content_chunk_dedup_stats

    gram, modulus = 3, 4  # modulus 4 cuts often enough on short docs

    def gh(text):
        return int(hashlib.md5(text.encode()).hexdigest()[:15], 16)

    expect = {}
    chunk_docs = {}  # chunk text -> set of doc ids
    chunks_of = {}
    for i, d in enumerate(docs):
        toks = d.split()
        if not toks:
            continue
        cuts = [
            pos >= gram - 1 and gh(" ".join(toks[pos - gram + 1 : pos + 1])) % modulus == 0
            for pos in range(len(toks))
        ]
        chunks, cur = [], []
        for pos, t in enumerate(toks):
            cur.append(t)
            if cuts[pos]:
                chunks.append(" ".join(cur))
                cur = []
        if cur:
            chunks.append(" ".join(cur))
        chunks_of[i] = chunks
        for c in chunks:
            chunk_docs.setdefault(c, set()).add(i)
    for i, chunks in chunks_of.items():
        dup = sum(1 for c in chunks if len(chunk_docs[c]) >= 2)
        expect[i] = (len(chunks), dup, round(dup / len(chunks), 6))

    got = {
        r.doc_id: (r.n_chunks, r.n_dup_chunks, r.dup_chunk_frac)
        for r in content_chunk_dedup_stats(
            _df(spark, docs), gram=gram, modulus=modulus
        ).collect()
    }
    assert got == expect


@given(docs=CORPUS)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_doc_fingerprint_matches_hashlib_model(spark, docs):
    """r10 (oracle-authorship audit): `textops.fingerprint`'s token-set
    digest equals a literal hashlib replay — md5 over the
    space-joined, sorted, distinct, lowercased token set — and the dup
    groups are exactly the >1-sized fingerprint classes with min-id
    keeper.  The DuckDB oracle replays the same md5 expression; this is
    the independent scalar leg."""
    import hashlib

    from oracdc_spark.operators.textops import fingerprint, fingerprint_dup_groups

    def fp(doc):
        return hashlib.md5(
            " ".join(sorted(set(doc.split()))).lower().encode()
        ).hexdigest()

    df = _df(spark, docs)
    got = {r.doc_id: r.fingerprint for r in fingerprint(df).collect()}
    assert got == {i: fp(d) for i, d in enumerate(docs)}

    groups = {}
    for i, d in enumerate(docs):
        groups.setdefault(fp(d), []).append(i)
    expect = {
        f: (len(ids), min(ids)) for f, ids in groups.items() if len(ids) > 1
    }
    got_g = {
        r.fingerprint: (r.n_docs, r.keeper_doc_id)
        for r in fingerprint_dup_groups(df).collect()
    }
    assert got_g == expect


@given(docs=CORPUS)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_ngram_novelty_matches_scalar_model(spark, docs):
    """r10 (oracle-authorship audit): `textops.ngram_novelty` equals
    the literal per-document set computation — fraction of a doc's
    DISTINCT n-grams with corpus document-frequency exactly 1; docs
    with <n tokens keep their row with (0, 0, NULL novelty)."""
    from oracdc_spark.operators.textops import ngram_novelty

    n = 2
    sets = [_model_shingles(d, n) for d in docs]
    expect = {}
    for i, sh in enumerate(sets):
        if not sh:
            expect[i] = (0, 0, None)
            continue
        novel = sum(
            1 for g in sh if not any(g in s for j, s in enumerate(sets) if j != i)
        )
        expect[i] = (len(sh), novel, round(novel / len(sh), 6))
    got = {
        r.doc_id: (r.n_ngrams, r.n_novel, r.novelty)
        for r in ngram_novelty(_df(spark, docs), n=n).collect()
    }
    assert got == expect


@given(docs=CORPUS)
# BOUNDARY example (r11 mutation audit: relaxing the coin to <= survived
# the random draws — a digest prefix landing EXACTLY on '1a' is a 1/256
# event): md5("0|w120") = 1a5e..., which '<' must EXCLUDE
@example(docs=["w120"])
@settings(**_SETTINGS)
def test_sample_by_hash_matches_hashlib_coin(spark, docs):
    """r10 (oracle-authorship audit): `dedup.sample_by_hash`'s
    deterministic md5 coin equals the literal hashlib replay — keep iff
    md5(f"{doc_id}|{text}") hex prefix < '1a'."""
    import hashlib

    from oracdc_spark.operators.dedup import sample_by_hash

    got = {r.doc_id for r in sample_by_hash(_df(spark, docs)).collect()}
    expect = {
        i
        for i, d in enumerate(docs)
        if hashlib.md5(f"{i}|{d}".encode()).hexdigest()[:2] < "1a"
    }
    assert got == expect


def _uf_components(docs, threshold=0.3):
    """Scalar union-find over the jaccard>=threshold pair graph —
    shared by the cluster/canonical model properties."""
    sets = [_model_shingles(d) for d in docs]
    parent = list(range(len(docs)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            common = len(sets[i] & sets[j])
            if not common:
                continue
            union = len(sets[i] | sets[j])
            if round(common / union, 4) >= threshold:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
    comps: dict[int, list[int]] = {}
    for i in range(len(docs)):
        comps.setdefault(find(i), []).append(i)
    return {min(m): sorted(m) for m in comps.values()}


@given(docs=CORPUS)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_canonical_matches_argmax_model(spark, docs):
    """r10 (oracle-authorship audit): `dedup_canonical`'s window
    selection equals the scalar argmax over union-find components —
    keep the member with (max n_chars, min doc_id), n_members = the
    component size, singletons keep themselves."""
    from oracdc_spark.operators.dedup import dedup_canonical

    df = spark.createDataFrame(
        [(i, d, len(d)) for i, d in enumerate(docs)],
        "doc_id long, text string, n_chars long",
    )
    got = {
        r.cluster_id: (r.doc_id, r.n_chars, r.n_members)
        for r in dedup_canonical(df, n=2, threshold=0.3).collect()
    }
    expect = {}
    for cid, members in _uf_components(docs).items():
        best = min(members, key=lambda i: (-len(docs[i]), i))
        expect[cid] = (best, len(docs[best]), len(members))
    assert got == expect


@given(docs=CORPUS)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_canonical_quality_matches_argmax_model(spark, docs):
    """Same theorem for the quality-ranked variant: argmax on
    (distinct whitespace tokens, then chars, then lowest id)."""
    from oracdc_spark.operators.dedup import dedup_canonical_quality

    got = {
        r.cluster_id: (r.doc_id, r.n_distinct, r.n_members)
        for r in dedup_canonical_quality(_df(spark, docs), n=2, threshold=0.3).collect()
    }
    expect = {}
    for cid, members in _uf_components(docs).items():
        best = min(
            members,
            key=lambda i: (-len(set(docs[i].split())), -len(docs[i]), i),
        )
        expect[cid] = (best, len(set(docs[best].split())), len(members))
    assert got == expect


@given(docs=CORPUS)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_decisions_match_min_keeper_model(spark, docs):
    """r10 (oracle-authorship audit): the keep/drop delete-list equals
    the scalar rule over the brute-force pair relation — a doc appears
    iff it is the larger id of at least one >=threshold pair, and its
    keeper is the smallest partner below it."""
    from oracdc_spark.operators.dedup import dedup_decisions, jaccard_pairs

    got = {
        (r.doc_id, r.keeper_doc_id)
        for r in dedup_decisions(
            jaccard_pairs(_df(spark, docs), n=2, threshold=0.3)
        ).collect()
    }
    sets = [_model_shingles(d) for d in docs]
    keeper = {}
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            common = len(sets[i] & sets[j])
            if not common:
                continue
            if round(common / len(sets[i] | sets[j]), 4) >= 0.3:
                keeper[j] = min(keeper.get(j, i), i)
    assert got == set(keeper.items())
