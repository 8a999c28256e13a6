"""r11 authorship upgrades (r10 verdict item 2): hypothesis-grade model
properties for the replay entries whose citations were directed units.

Each test pins an engine family against a model written FROM the public
semantics (Debezium event-reduction truth table, the reference's
sequential sink-apply contract, first-occurrence streaming dedup, the
documented Oracle VECTOR/BINARY_FLOAT on-disk layout) — never by
transcribing the Spark plan — so a shared wrong assumption between the
engine and its DuckDB oracle cannot survive (the BPE lesson,
tests/oracle_authorship.py).
"""

from __future__ import annotations

import pytest

import hashlib
import math
import struct

from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

from oracdc_spark.operators import cdc

from tests.test_cdc_properties import _FEED, _SETTINGS, SCHEMA, _rows

# ---------------------------------------------------------------------------
# cdc_net_effect: batch_net_effect vs the public event-reduction rule
# ---------------------------------------------------------------------------


@given(txns=_FEED)
# the four truth-table branches EXPLICITLY (random draws at
# max_examples=6 can miss a branch — mutation-checked: flipping the
# insert-then-delete branch to emit a DELETE survived the random
# examples until these were added):
@example(txns=[([(1, 1), (2, 1)], 7)])           # I..D  -> nothing
@example(txns=[([(1, 1), (3, 1)], 7)])           # I..U  -> INSERT
@example(txns=[([(3, 1), (2, 1)], 7)])           # U..D  -> DELETE
@example(txns=[([(3, 1), (3, 1)], 7)])           # U..U  -> UPDATE
@example(txns=[([(1, 1)], 7), ([(2, 1)], 7)])    # I..D across txns
@settings(**_SETTINGS)
@pytest.mark.slow
def test_net_effect_matches_scalar_reduction_rule(spark, txns):
    """batch_net_effect must equal a pure-Python application of the
    public event-reduction truth table (Debezium's "event reduction" /
    Kafka-Connect JDBC sink batch reduction):

        first=INSERT, last=DELETE -> emit nothing
        first=INSERT, last=I/U    -> INSERT with the final image
        first=U/D,    last=DELETE -> DELETE
        otherwise                 -> UPDATE with the final image

    computed per key over the COMMITTED changes ordered by
    (commit_scn, scn, ssn), for every interleaving of ops across
    overlapping keys and commit/rollback/open outcomes.  The model
    recomputes commit order, first/last ops and the final image from
    the raw transaction list — it never consults the engine."""
    rows = _rows(txns)
    # replicate _rows' scn counter to recover each event's scn and each
    # committed txn's commit scn (test plumbing, not engine semantics)
    scn = 100
    dml = []  # (txn_idx, op, pk, event_scn)
    for t, (events, _control) in enumerate(txns):
        for op, pk in events:
            dml.append((t, op, pk, scn))
            scn += 1
    commit_scn = {}
    for t, (_events, control) in enumerate(txns):
        if control is not None:
            if control == 7:
                commit_scn[t] = scn
            scn += 1
    per_key: dict[int, list] = {}
    for t, op, pk, escn in dml:
        if t in commit_scn:
            per_key.setdefault(pk, []).append((commit_scn[t], escn, op))
    want = set()
    for pk, evs in per_key.items():
        evs.sort()
        first_op = evs[0][2]
        last_cscn, last_scn, last_op = evs[-1]
        if first_op == 1 and last_op == 2:
            continue  # key never existed outside the batch
        net = 1 if first_op == 1 else (2 if last_op == 2 else 3)
        # final image = the newest change's carried values (_rows sets
        # totalprice=float(event scn), status="S" on every DML row)
        want.add(("SCOTT", "ORDERS", pk, float(last_scn), "S", net))
    stamped = cdc.commit_stamped(spark.createDataFrame(rows, SCHEMA))
    got = {
        (r.owner, r.table_name, r.pk, r.totalprice, r.status, r.net_op)
        for r in cdc.batch_net_effect(stamped)
        .select("owner", "table_name", "pk", "totalprice", "status", "net_op")
        .collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# K5 wrapped envelope: presence rule + batch collapse vs sequential replay
# ---------------------------------------------------------------------------

_WRAPPED_SCHEMA = SCHEMA + ", changed_cols string"

# a wrapped txn: (slots, control); each slot is (pk, action_coin, mask).
# The op is DERIVED from key existence when the feed is materialized
# (see _wrapped_rows) so every generated history is a VALID redo
# sequence — Oracle cannot log an UPDATE or DELETE for a row that does
# not exist, and it is exactly that constraint (an INSERT always
# re-carries every column) that makes the newest-present-per-column
# batch collapse equal the sequential sink replay.
_WSLOT = st.tuples(
    st.integers(min_value=1, max_value=3),
    st.integers(min_value=0, max_value=1),
    st.sampled_from(["TOTALPRICE", "STATUS", "TOTALPRICE,STATUS"]),
)
_WTXN = st.tuples(
    st.lists(_WSLOT, min_size=0, max_size=5),
    st.sampled_from([7, 36, None]),
)
_WFEED = st.lists(_WTXN, min_size=1, max_size=3)

_GARBAGE_PRICE = -987654.0
_GARBAGE_STATUS = "GARBAGE"


def _wrapped_rows(txns):
    """Materialize a VALID wrapped feed: txns execute serially in index
    order (controls are stamped after all DML, so commit order = index
    order); ops derive from per-key existence; UPDATE rows carry REAL
    values only in their changed-column mask and plant garbage in the
    absent cells — the engine must never read them."""
    rows, scn = [], 100
    state: dict[int, bool] = {}  # committed existence per pk
    model: dict[int, list] = {}  # committed image per pk
    for t, (slots, control) in enumerate(txns):
        xid = chr(ord("A") + t)
        pending_state = dict(state)
        pending_model = {k: list(v) for k, v in model.items()}
        for pk, coin, mask in slots:
            if not pending_state.get(pk):
                op, cols = 1, "TOTALPRICE,STATUS"  # INSERT carries all
                price, status = float(scn), f"S{scn}"
                pending_state[pk] = True
                pending_model[pk] = [price, status]
            elif coin == 0:
                op, cols = 3, mask  # partial UPDATE
                price = float(scn) if "TOTALPRICE" in mask else _GARBAGE_PRICE
                status = f"S{scn}" if "STATUS" in mask else _GARBAGE_STATUS
                row_img = pending_model[pk]
                if "TOTALPRICE" in mask:
                    row_img[0] = price
                if "STATUS" in mask:
                    row_img[1] = status
            else:
                op, cols = 2, ""  # DELETE carries no columns
                price, status = _GARBAGE_PRICE, _GARBAGE_STATUS
                pending_state[pk] = False
                pending_model.pop(pk, None)
            rows.append(
                (scn, 0, f"1.{scn}.0", xid, op, False, "SCOTT", "ORDERS",
                 f"R{pk}", pk, price, status, None, None, cols)
            )
            scn += 1
        if control == 7:
            state, model = pending_state, pending_model
    controls = []
    for t, (_slots, control) in enumerate(txns):
        if control is not None:
            controls.append(
                (scn, 0, f"1.{scn}.0", chr(ord("A") + t), control, False,
                 "SCOTT", "ORDERS", None, None, None, None, None, None, None)
            )
            scn += 1
    return rows + controls, model


# directed coverage both wrapped properties need (random draws at
# max_examples=6 can miss the partial-UPDATE masks entirely —
# mutation-checked: dropping the changed_cols test from col_present
# survived the random examples of the PRESENCE property until these
# were added): insert → partial update of each column; insert →
# delete → re-insert; partial updates split across two committed
# txns; a rolled-back txn shadowed by a committed one.
_WEXAMPLES = [
    [([(1, 0, "TOTALPRICE"), (1, 0, "STATUS"), (1, 0, "TOTALPRICE")], 7)],
    [([(1, 0, "TOTALPRICE,STATUS"), (1, 1, "TOTALPRICE"), (1, 0, "STATUS")], 7)],
    [([(2, 0, "STATUS")], 7), ([(2, 0, "TOTALPRICE")], 7)],
    [([(3, 0, "TOTALPRICE")], 36), ([(3, 0, "STATUS")], 7)],
]


@given(txns=_WFEED)
@example(txns=_WEXAMPLES[0])
@example(txns=_WEXAMPLES[1])
@example(txns=_WEXAMPLES[2])
@example(txns=_WEXAMPLES[3])
@settings(**_SETTINGS)
@pytest.mark.slow
def test_wrapped_apply_matches_sequential_sink_replay(spark, txns):
    """The wrapped batch collapse (newest PRESENT value per column, row
    survives iff newest change isn't DELETE — envelope.wrapped_apply)
    must equal a literal one-event-at-a-time sink replay that applies
    only each statement's changed-column set (the reference's partial
    UPDATE contract: WrappedDataTable.java:473-484 dispatches each
    record to a per-changed-column-set UpdateStatement, whose SET list
    is built from exactly the record's present columns and applied at
    WrappedDataTable.java:616-698), over every valid
    interleaving — with GARBAGE planted in every absent cell, so a plan
    that reads an absent column's value cannot pass."""
    from oracdc_spark.operators.envelope import wrapped_apply

    rows, model = _wrapped_rows(txns)
    want = sorted(
        ("SCOTT", "ORDERS", pk, img[0], img[1]) for pk, img in model.items()
    )
    feed = spark.createDataFrame(rows, _WRAPPED_SCHEMA)
    got = sorted(map(tuple, wrapped_apply(feed).collect()))
    assert got == want


@given(txns=_WFEED)
@example(txns=_WEXAMPLES[0])
@example(txns=_WEXAMPLES[1])
@example(txns=_WEXAMPLES[2])
@example(txns=_WEXAMPLES[3])
@settings(**_SETTINGS)
@pytest.mark.slow
def test_wrapped_flat_presence_matches_statement_mask(spark, txns):
    """The tri-state flattening's presence bits (cdc_wrapped_flat /
    envelope.col_present) must equal the public wrapped-envelope rule
    applied per statement: INSERT carries every column, UPDATE exactly
    its changed-column set, DELETE none
    (KafkaWrappedSchemas.java:60-176) — for every committed statement in
    every generated history."""
    from oracdc_spark.operators.envelope import col_present

    rows, _model = _wrapped_rows(txns)
    feed = spark.createDataFrame(rows, _WRAPPED_SCHEMA)
    got = {
        (r.scn): (bool(r.tp_p), bool(r.st_p))
        for r in cdc.commit_stamped(feed)
        .select(
            "scn",
            col_present("totalprice").alias("tp_p"),
            col_present("status").alias("st_p"),
        )
        .collect()
    }
    committed = {t for t, (_s, c) in enumerate(txns) if c == 7}
    # the op and mask are feed FACTS; the property under test is the
    # presence RULE applied to them, so the model reads them straight
    # off the materialized rows
    want = {}
    for row in rows:
        r_scn, _ssn, _rba, xid, op, _rb = row[0], row[1], row[2], row[3], row[4], row[5]
        cols = row[14]
        if op not in (1, 2, 3) or (ord(xid[0]) - ord("A")) not in committed:
            continue
        if op == 1:
            want[r_scn] = (True, True)
        elif op == 3:
            want[r_scn] = ("TOTALPRICE" in cols, "STATUS" in cols)
        else:
            want[r_scn] = (False, False)
    assert got == want


# ---------------------------------------------------------------------------
# streaming_dedup_gate: micro-batch fold vs scalar first-occurrence model
# ---------------------------------------------------------------------------


@given(
    texts=st.lists(
        st.sampled_from(["alpha", "beta", "gamma", "delta"]),
        min_size=1,
        max_size=8,
    ),
    cut=st.integers(min_value=0, max_value=6),
)
@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@pytest.mark.slow
def test_dedup_gate_fold_matches_scalar_first_occurrence(spark, texts, cut):
    """The streaming exact-dedup gate folded over an arbitrary
    micro-batch split must emit exactly the scalar first-occurrence
    model: per digest (hashlib md5, computed independently), the FIRST
    batch containing it wins and contributes its lowest doc_id; later
    occurrences are silent.  Pins streaming_dedup_gate's oracle (a
    ROW_NUMBER replay) against a model that never sees the plan."""
    import tempfile

    from oracdc_spark.streaming.sketches import dedup_gate_batch

    docs = [(i, t) for i, t in enumerate(texts)]
    k = min(cut, len(docs))
    batches = [b for b in (docs[:k], docs[k:]) if b]
    seen: set[str] = set()
    want: dict[int, str] = {}
    for batch in batches:
        firsts: dict[str, tuple[int, str]] = {}
        for doc_id, text in batch:
            d = hashlib.md5(text.encode()).hexdigest()
            if d not in firsts or doc_id < firsts[d][0]:
                firsts[d] = (doc_id, text)
        for d, (doc_id, text) in firsts.items():
            if d not in seen:
                seen.add(d)
                want[doc_id] = text
    with tempfile.TemporaryDirectory() as tmp:
        state = f"{tmp}/digests"
        got: dict[int, str] = {}
        for batch in batches:
            out = dedup_gate_batch(
                spark,
                spark.createDataFrame(batch, "doc_id long, text string"),
                state,
            )
            got.update({r.doc_id: r.text for r in out.collect()})
            out.unpersist()
    assert got == want


# ---------------------------------------------------------------------------
# lob_plugin_transform: registry routing vs a scalar column map
# ---------------------------------------------------------------------------


@given(
    docs=st.lists(
        st.text(
            alphabet="abc XYZ0", min_size=0, max_size=12
        ),
        min_size=1,
        max_size=6,
    ),
    register_doc=st.booleans(),
    register_missing=st.booleans(),
)
@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_lob_transform_routing_matches_scalar_map(
    spark, docs, register_doc, register_missing
):
    """apply_lob_transforms must equal the scalar model — registered AND
    present columns are mapped through the plugin, everything else
    passes through byte-identical — for arbitrary cell values and
    registry shapes (the md5 externalize-as-digest plugin is the
    reference's OraCdcLobTransformationsIntf default use case)."""
    import pyspark.sql.functions as F

    from oracdc_spark.transforms import apply_lob_transforms

    rows = [(i, d, f"other{i}") for i, d in enumerate(docs)]
    df = spark.createDataFrame(rows, "pk long, doc string, other string")
    registry = {}
    if register_doc:
        registry["doc"] = lambda c: F.md5(c)
    if register_missing:
        registry["absent_col"] = lambda c: F.lit("never")
    got = {
        r.pk: (r.doc, r.other)
        for r in apply_lob_transforms(df, registry).collect()
    }
    want = {
        i: (
            hashlib.md5(d.encode("utf-8")).hexdigest() if register_doc else d,
            f"other{i}",
        )
        for i, d in enumerate(docs)
    }
    assert got == want


# ---------------------------------------------------------------------------
# ora_vector_decode: independent encoder roundtrip (public layout)
# ---------------------------------------------------------------------------


def _enc_ora_float(x: float, fmt: str) -> bytes:
    """Oracle BINARY_FLOAT/BINARY_DOUBLE on-disk encoding, written from
    the PUBLIC rule (sortable transform of IEEE-754 big-endian: set the
    sign bit for non-negatives, flip every bit for negatives) — NOT by
    importing the repo's decoder helpers."""
    raw = struct.pack(fmt, x)
    if raw[0] & 0x80:
        return bytes(b ^ 0xFF for b in raw)
    return bytes([raw[0] | 0x80]) + raw[1:]


def _enc_vector_blob(
    values: list, elem_type: int, prefix: bytes
) -> bytes:
    """Independent VECTOR blob encoder from the documented layout
    (oracdc_spark/functions/vector.py module docstring; format
    reverse-engineered from the reference's public golden fixtures):
    ... locator ... | DB 00 00 <flags> <elem_type> <count:i32 BE>
    <l2_norm: BINARY_DOUBLE> <elements>."""
    if elem_type == 2:
        payload = b"".join(_enc_ora_float(float(v), ">f") for v in values)
        f32 = [struct.unpack(">f", struct.pack(">f", float(v)))[0] for v in values]
        norm = math.sqrt(sum(v * v for v in f32))
    elif elem_type == 3:
        payload = b"".join(_enc_ora_float(float(v), ">d") for v in values)
        norm = math.sqrt(sum(float(v) * float(v) for v in values))
    else:  # INT8
        payload = b"".join(struct.pack("b", int(v)) for v in values)
        norm = math.sqrt(sum(float(v) * float(v) for v in values))
    return (
        prefix
        + bytes([0xDB, 0x00, 0x00, 0x01, elem_type])
        + struct.pack(">I", len(values))
        + _enc_ora_float(norm, ">d")
        + payload
    )


@given(
    elem_type=st.sampled_from([2, 3, 4]),
    raw=st.lists(
        st.floats(
            min_value=-100.0,
            max_value=100.0,
            allow_nan=False,
            allow_infinity=False,
        ),
        min_size=1,
        max_size=12,
    ),
    prefix_len=st.integers(min_value=0, max_value=9),
)
@settings(max_examples=50, deadline=None)
def test_vector_decode_roundtrip_independent_encoder(
    elem_type, raw, prefix_len
):
    """decode_vector must invert an INDEPENDENTLY written encoder built
    from the documented public layout, for random float32/float64/int8
    vectors behind random locator prefixes — upgrading the golden-only
    citation: a misread of the header offsets, the count field, the
    norm encoding or the element transform cannot survive a randomized
    inversion, where a finite golden table only pins the sampled
    points."""
    from oracdc_spark.functions.vector import decode_vector, decode_vector_struct

    if elem_type == 4:
        values = [max(-128, min(127, int(v))) for v in raw]
        expect = [float(int(v)) for v in values]
    elif elem_type == 2:
        values = raw
        expect = [struct.unpack(">f", struct.pack(">f", v))[0] for v in raw]
    else:
        values = raw
        expect = list(raw)
    # locator prefix bytes stay below 0x80 so they can't fake the magic
    prefix = bytes((7 * i + 3) % 0x7F for i in range(prefix_len))
    blob = _enc_vector_blob(values, elem_type, prefix)
    d = decode_vector(blob)
    assert d["type"] == elem_type
    assert d["count"] == len(values)
    assert d["values"] == expect
    want_norm = math.sqrt(sum(v * v for v in expect))
    assert abs(d["norm"] - want_norm) <= 1e-9 * max(1.0, want_norm)
    slot = {2: "F", 3: "D", 4: "I"}[elem_type]
    s = decode_vector_struct(blob)
    assert s[slot] == expect
    assert all(v is None for k, v in s.items() if k != slot)
