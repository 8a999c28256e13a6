"""Property-based invariants for LOB chunk reassembly (P7).

The reference's getLob loop receives chunks in REDO order, which for a
SecureFile write bears no relation to byte order across executors; the
reassembly's only correctness anchor is the chunk index.  So the
theorem: for ANY text, ANY chunk size, and ANY arrival permutation /
partition layout of the chunks, reassemble_lobs reproduces the exact
original value.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from oracdc_spark.operators.lob import reassemble_lobs

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_TEXTS = st.lists(
    st.text(alphabet="abcXYZ 01é中", min_size=0, max_size=60),
    min_size=1,
    max_size=5,
)


@given(texts=_TEXTS, chunk_size=st.integers(min_value=1, max_value=7), data=st.data())
@settings(**_SETTINGS)
def test_reassembly_invariant_under_arrival_order(spark, texts, chunk_size, data):
    rows = []
    for lob_id, text in enumerate(texts):
        chunks = [
            (lob_id, i, text[o : o + chunk_size])
            for i, o in enumerate(range(0, len(text), chunk_size))
        ]
        rows.extend(chunks)
    # arbitrary arrival permutation + arbitrary physical layout
    perm = data.draw(st.permutations(rows))
    df = spark.createDataFrame(
        perm, "lob_id bigint, chunk_idx bigint, chunk string"
    ).repartition(3)
    got = {r.lob_id: r.value for r in reassemble_lobs(df).collect()}
    want = {i: t for i, t in enumerate(texts) if t}  # empty text -> no chunks
    for i, t in enumerate(texts):
        if t:
            assert got[i] == t
        else:
            assert i not in got  # zero chunks: no LOB row, matching the loop
