"""Property-based invariants for G5/G6 row-piece fusion.

The reference pins RowChangeHolder (OraCdcTransaction.java:669-1380)
with fixed opcode scenarios (Ops_* tests over captured redo); here
hypothesis generates arbitrary piece sets and asserts the THEOREMS the
matrix encodes directly against a literal Python model of the rules:

* logical op derivation — any DRP => DELETE, all IRP => INSERT,
  otherwise UPDATE (including the INSERT->UPDATE upgrade when an ORP
  joins IRP pieces, completeRow:1288-1380);
* completeness — FIRST+LAST flags seen, HEAD also required unless the
  mix resolves to UPDATE (halfDone holders stay unemitted);
* column resolution — ORP pieces overwrite (take precedence over any
  non-ORP piece regardless of position), otherwise the first piece in
  piece order carrying the column wins;
* the fused result is a pure function of the piece SET — invariant
  under row order and partition layout (the distributed contract the
  single-threaded reference never had to state).
"""

from __future__ import annotations

import pytest

import random

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from oracdc_spark.operators import fusion
from oracdc_spark.operators.fusion import (
    FB_FIRST,
    FB_HEAD,
    FB_LAST,
    OP_DRP,
    OP_IRP,
    OP_ORP,
    OP_URP,
    expand_multirow,
    fuse_pieces,
)

PIECE_SCHEMA = (
    "scn bigint, xid string, row_id string, pk bigint, op int, fb int, "
    "part_no bigint, totalprice double, status string, clerk string"
)

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# one piece: (op, fb, totalprice?, status?, clerk?) — part_no assigned
# by list position so it is unique within the group (real chained-row
# pieces carry distinct piece numbers)
_PIECE = st.tuples(
    st.sampled_from([OP_IRP, OP_DRP, OP_URP, OP_ORP]),
    st.integers(min_value=0, max_value=7),
    st.one_of(st.none(), st.integers(min_value=0, max_value=9)),
    st.one_of(st.none(), st.sampled_from(["A", "B"])),
    st.one_of(st.none(), st.sampled_from(["x", "y"])),
)
_GROUPS = st.lists(st.lists(_PIECE, min_size=1, max_size=6), min_size=1, max_size=3)


def _rows(groups):
    rows = []
    for g, pieces in enumerate(groups):
        for part_no, (op, fb, price, status, clerk) in enumerate(pieces):
            rows.append(
                (100 + g, chr(ord("A") + g), f"R{g}", g, op, fb, part_no,
                 float(price) if price is not None else None, status, clerk)
            )
    return rows


def _model_fuse(pieces):
    """Literal restatement of the RowChangeHolder rules over one group."""
    has = lambda bit: any(fb & bit for (_, fb, *_rest) in pieces)
    any_drp = any(op == OP_DRP for (op, *_rest) in pieces)
    all_irp = all(op == OP_IRP for (op, *_rest) in pieces)
    lm_op = 3 if any_drp else (1 if all_irp else 2)

    def resolve(idx):
        cand = [
            (0 if op == OP_ORP else 1, part_no, vals[idx])
            for part_no, (op, fb, *vals) in enumerate(pieces)
            if vals[idx] is not None
        ]
        if not cand:
            return None
        return min(cand)[2]

    price = resolve(0)
    return {
        "lm_op": lm_op,
        "totalprice": float(price) if price is not None else None,
        "status": resolve(1),
        "clerk": resolve(2),
        "n_pieces": len(pieces),
        "complete": has(FB_FIRST) and has(FB_LAST) and (lm_op == 2 or has(FB_HEAD)),
    }


@given(groups=_GROUPS)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_fuse_pieces_matches_reference_model(spark, groups):
    df = spark.createDataFrame(_rows(groups), PIECE_SCHEMA)
    got = {
        r.pk: r
        for r in fuse_pieces(df, complete_only=False)
        .select("pk", "lm_op", "totalprice", "status", "clerk", "n_pieces", "complete")
        .collect()
    }
    assert set(got) == set(range(len(groups)))
    for g, pieces in enumerate(groups):
        want = _model_fuse(pieces)
        r = got[g]
        assert (
            r.lm_op, r.totalprice, r.status, r.clerk, r.n_pieces, r.complete
        ) == (
            want["lm_op"], want["totalprice"], want["status"],
            want["clerk"], want["n_pieces"], want["complete"],
        ), f"group {g}: pieces={pieces}"


@given(groups=_GROUPS, seed=st.integers(min_value=0, max_value=2**31))
@settings(**_SETTINGS)
@pytest.mark.slow
def test_fuse_pieces_layout_invariant(spark, groups, seed):
    """Fusion is a pure function of the piece SET: shuffling arrival
    order and forcing a different partition layout cannot change any
    fused value (min-over-struct aggregation is order-free — the
    distributed restatement of the reference's in-order add())."""
    rows = _rows(groups)
    shuffled = list(rows)
    random.Random(seed).shuffle(shuffled)
    base = spark.createDataFrame(rows, PIECE_SCHEMA)
    other = spark.createDataFrame(shuffled, PIECE_SCHEMA).repartition(7)
    a = sorted(map(tuple, fuse_pieces(base, complete_only=False).collect()))
    b = sorted(map(tuple, fuse_pieces(other, complete_only=False).collect()))
    assert a == b


_QMI = st.lists(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=99),
                  st.integers(min_value=0, max_value=9)),
        min_size=1,
        max_size=5,
    ),
    min_size=1,
    max_size=3,
)


@given(records=_QMI)
@settings(**_SETTINGS)
def test_expand_multirow_positions_and_conservation(spark, records):
    """QMI expansion (emitMultiRowChange, OraCdcTransaction.java:987-1073):
    every carried row becomes exactly one INSERT event, ssn = its array
    position — total rows out = sum of array lengths, values intact."""
    rows = [
        (100 + i, chr(ord("A") + i), 11, [(pk, float(v)) for pk, v in rec])
        for i, rec in enumerate(records)
    ]
    df = spark.createDataFrame(
        rows,
        "scn bigint, xid string, qm_op int, "
        "rows array<struct<pk:bigint, totalprice:double>>",
    )
    got = sorted(
        (r.scn, r.xid, r.ssn, r.op, r.pk, r.totalprice)
        for r in expand_multirow(df).collect()
    )
    want = sorted(
        (100 + i, chr(ord("A") + i), ssn, 1, pk, float(v))
        for i, rec in enumerate(records)
        for ssn, (pk, v) in enumerate(rec)
    )
    assert got == want
