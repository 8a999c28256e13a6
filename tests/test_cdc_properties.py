"""Property-based invariants for the CDC core (G2/G3/G4/K2 semantics).

The reference pins these with ~2k LoC of hand-written scenarios
(PartialRollback_Test.java, OraCdcRollback*Test); here hypothesis
generates arbitrary transaction interleavings and the THEOREMS the
scenarios instantiate are asserted directly:

* at-least-once redelivery is absorbed by the idempotent apply
  (re-emitting any subset of the feed cannot change the replica);
* a partial-rollback pair (original + its marker) annihilates —
  injecting one anywhere leaves the committed stream unchanged
  (OraCdcTransactionArrayList.java:82-107 backward pairing);
* an unpaired marker — including marker-before-original — cancels
  NOTHING (OraCdcTransaction.java:598-608);
* commit_ordered is commit_stamped totally ordered by
  (commit_scn, scn, ssn), same multiset.
"""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from oracdc_spark.operators import cdc

SCHEMA = (
    "scn bigint, ssn bigint, rba string, xid string, op int, rollback boolean, "
    "owner string, table_name string, row_id string, pk bigint, "
    "totalprice double, status string, before_totalprice double, before_status string"
)

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# a transaction: (events, control) — events are (op, pk) pairs;
# control: 7=commit, 36=rollback, None=still open
_TXN = st.tuples(
    st.lists(
        st.tuples(st.sampled_from([1, 2, 3]), st.integers(min_value=1, max_value=3)),
        min_size=0,
        max_size=5,
    ),
    st.sampled_from([7, 36, None]),
)
_FEED = st.lists(_TXN, min_size=1, max_size=3)


def _rows(txns):
    """Materialize a feed: one global scn counter, per-event unique scn,
    controls stamped after every DML (commit SCN > change SCNs)."""
    rows, scn = [], 100
    for t, (events, control) in enumerate(txns):
        xid = chr(ord("A") + t)
        for op, pk in events:
            rows.append(
                (scn, 0, f"1.{scn}.0", xid, op, False, "SCOTT", "ORDERS",
                 f"R{pk}", pk, float(scn), "S", None, None)
            )
            scn += 1
    for t, (events, control) in enumerate(txns):
        if control is not None:
            rows.append(
                (scn, 0, f"1.{scn}.0", chr(ord("A") + t), control, False,
                 "SCOTT", "ORDERS", None, None, None, None, None, None)
            )
            scn += 1
    return rows


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _replica(spark, rows):
    return sorted(map(tuple, cdc.apply_changes(_df(spark, rows)).collect()))


def _committed(spark, rows):
    return sorted(
        map(tuple, cdc.committed_changes(_df(spark, rows)).collect())
    )


@given(txns=_FEED, redeliver=st.data())
@settings(**_SETTINGS)
@pytest.mark.slow
def test_redelivery_idempotent_apply(spark, txns, redeliver):
    """Re-emitting ANY subset of the feed (a restarted miner re-reading
    from the restart SCN, G9's at-least-once contract) must leave the
    materialized replica unchanged — the K2 apply is idempotent."""
    rows = _rows(txns)
    subset = redeliver.draw(st.lists(st.sampled_from(rows), max_size=len(rows))) if rows else []
    assert _replica(spark, rows + subset) == _replica(spark, rows)


@given(txns=_FEED)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_partial_rollback_pair_annihilates(spark, txns):
    """Appending an original + its rollback marker (same pair key,
    marker after original) to any transaction leaves committed_changes
    unchanged: the backward scan pairs them and drops both."""
    rows = _rows(txns)
    base = _committed(spark, rows)
    xid = "A"  # always exists (min_size=1)
    scn = 10_000
    injected = rows + [
        (scn, 0, f"1.{scn}.0", xid, 3, False, "SCOTT", "ORDERS",
         "R9", 9, 999.0, "S", None, None),
        (scn, 1, f"1.{scn}.1", xid, 3, True, "SCOTT", "ORDERS",
         "R9", 9, None, None, None, None),
    ]
    assert _committed(spark, injected) == base


@given(txns=_FEED)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_unpaired_marker_cancels_nothing(spark, txns):
    """A marker with no preceding original in its pair key — including
    marker-BEFORE-original within the key — drops itself and nothing
    else (the reference only flags the transaction suspicious)."""
    rows = _rows(txns)
    base = _committed(spark, rows)
    scn = 20_000
    lone = rows + [
        (scn, 0, f"1.{scn}.0", "A", 3, True, "SCOTT", "ORDERS",
         "R8", 8, None, None, None, None),
    ]
    assert _committed(spark, lone) == base
    # marker first, original after: original SURVIVES, marker drops
    pair_scn = 30_000
    reversed_pair = rows + [
        (pair_scn, 0, f"1.{pair_scn}.0", "A", 3, True, "SCOTT", "ORDERS",
         "R7", 7, None, None, None, None),
        (pair_scn, 1, f"1.{pair_scn}.1", "A", 1, False, "SCOTT", "ORDERS",
         "R7", 7, 777.0, "S", None, None),
    ]
    out = cdc.committed_changes(_df(spark, reversed_pair))
    survivors_r7 = out.filter("row_id = 'R7'").collect()
    others = sorted(map(tuple, out.filter(
        "row_id IS NULL OR row_id <> 'R7'").collect()))
    if txns[0][1] == 7:  # txn A committed: the original survives alone
        assert len(survivors_r7) == 1 and not survivors_r7[0].rollback
    else:  # A rolled back / open: nothing from the injected key emits
        assert survivors_r7 == []
    assert others == base


@given(txns=_FEED)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_commit_ordered_is_sorted_same_multiset(spark, txns):
    rows = _rows(txns)
    ordered = cdc.commit_ordered(_df(spark, rows)).collect()
    keys = [(r.commit_scn, r.scn, r.ssn) for r in ordered]
    assert keys == sorted(keys)
    stamped = cdc.commit_stamped(_df(spark, rows)).collect()
    assert sorted(map(tuple, ordered)) == sorted(map(tuple, stamped))


@given(
    seq=st.lists(st.booleans(), min_size=0, max_size=10),  # True = marker
)
@settings(**_SETTINGS)
def test_partial_rollback_closed_form_equals_backward_scan(spark, seq):
    """The window-function closed form of G4 must equal the reference's
    literal algorithm (OraCdcTransactionArrayList.java:82-107) on EVERY
    original/marker interleaving: for each marker in order, scan
    backwards for the latest not-yet-paired preceding original; pair
    and drop both; unpaired markers drop alone."""
    # one pair key (xid=A, row_id=R1, scn=500); ssn = position
    rows = [
        (500, i, f"1.500.{i}", "A", 3, is_marker, "SCOTT", "ORDERS",
         "R1", 1, float(i), "S", None, None)
        for i, is_marker in enumerate(seq)
    ]
    # literal backward scan over positions
    paired = set()
    for i, is_marker in enumerate(seq):
        if not is_marker:
            continue
        for j in range(i - 1, -1, -1):
            if not seq[j] and j not in paired:
                paired.add(j)
                break
    survivors = {
        i for i, is_marker in enumerate(seq) if not is_marker and i not in paired
    }
    got = {
        r.ssn
        for r in cdc.partial_rollback_filter(_df(spark, rows)).collect()
    }
    assert got == survivors


@given(txns=_FEED)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_replica_equals_sequential_replay(spark, txns):
    """End-to-end theorem for the replica path (G2 commit resolution +
    G3 commit order + K6 last-write-wins dedup + K2/K3 apply): the
    batch shortcut — latest committed change per PK, deletes dropped —
    must equal a LITERAL one-event-at-a-time replay of the committed
    transactions in commit order against a Python dict, for every
    interleaving of inserts/updates/deletes across overlapping keys
    and commit/rollback/open outcomes."""
    state = {}
    scn = 100  # mirrors _rows' counter so values line up exactly
    staged = []
    for events, control in txns:
        evs = []
        for op, pk in events:
            evs.append((op, pk, float(scn)))
            scn += 1
        staged.append((evs, control))
    # controls are stamped after all DML in txn index order, so commit
    # order among committed txns IS txn index order
    for evs, control in staged:
        if control != 7:
            continue  # rolled back or still open: contributes nothing
        for op, pk, price in evs:
            # LogMiner opcodes: 1=INSERT, 2=DELETE, 3=UPDATE (feed.py;
            # the first draft of this model had 2/3 swapped and the
            # property immediately caught it against the real plan —
            # an UPDATE with no prior INSERT upserts, per the MERGE's
            # unconditional WHEN NOT MATCHED THEN INSERT)
            if op == cdc.OP_DELETE:
                state.pop(pk, None)
            else:
                state[pk] = price
    want = sorted(("SCOTT", "ORDERS", pk, price, "S") for pk, price in state.items())
    assert _replica(spark, _rows(txns)) == want


@given(txns=_FEED)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_scd2_history_chains_correctly(spark, txns):
    """SCD2 structural theorem on every committed stream: per key the
    versions are numbered 1..n contiguously in commit order, each
    version's valid_to equals the next version's valid_from (half-open
    intervals tile with no gap or overlap), only the last version is
    open-ended, and is_current marks exactly the open non-delete
    version."""
    rows = _rows(txns)
    hist = {}
    for r in cdc.scd2_history(_df(spark, rows)).collect():
        hist.setdefault((r.owner, r.table_name, r.pk), []).append(r)
    for key, versions in hist.items():
        versions.sort(key=lambda r: r.version)
        assert [r.version for r in versions] == list(range(1, len(versions) + 1))
        for prev, nxt in zip(versions, versions[1:]):
            assert prev.valid_to_scn == nxt.valid_from_scn
        *closed, last = versions
        assert all(r.valid_to_scn is not None for r in closed)
        assert last.valid_to_scn is None
        currents = [r for r in versions if r.is_current == 1]
        if last.is_deleted:
            assert currents == []
        else:
            assert currents == [last]


@given(txns=_FEED, fraction=st.sampled_from([0.0, 0.3, 0.7, 1.0]))
@settings(**_SETTINGS)
@pytest.mark.slow
def test_scd2_as_of_equals_log_replay_at_any_cut(spark, txns, fraction):
    """Serving a point-in-time snapshot FROM the SCD2 interval table
    must equal re-replaying the log to the same cut — at every cut
    fraction, not just the driver row's 0.5 (empty intervals from
    same-commit rewrites collapse, deletes hide the key)."""
    df = _df(spark, _rows(txns))
    via_intervals = sorted(
        map(tuple, cdc.scd2_as_of_relative(df, fraction).collect())
    )
    via_replay = sorted(
        map(tuple, cdc.replica_as_of_relative(df, fraction).collect())
    )
    assert via_intervals == via_replay


_TRIPLE = st.tuples(
    st.integers(0, 3), st.integers(0, 3), st.integers(0, 3)
)


@given(
    rows=st.lists(_TRIPLE, min_size=0, max_size=20),
    offset=_TRIPLE,
)
@settings(**_SETTINGS)
def test_replay_filter_is_exact_lexicographic_cut(spark, rows, offset):
    """F5's exactly-once restart (r10 oracle-authorship audit upgrade):
    the three-clause SQL predicate must equal the scalar lexicographic
    comparison (commit_scn, scn, ssn) > offset on every triple — in
    particular no event is both replayed and skipped at any offset, and
    the cut rewinds INSIDE a partially-emitted transaction (equal
    commit_scn and scn, ssn deciding) exactly as
    KafkaSourceTaskBase.java:267-281 documents.  The tiny 0..3 domain
    forces every equality/inequality interaction of the three keys."""
    df = spark.createDataFrame(
        [(i, c, s, n) for i, (c, s, n) in enumerate(rows)],
        "i long, commit_scn long, scn long, ssn long",
    )
    lc, ls, ln = offset
    got = {r.i for r in cdc.replay_filter(df, lc, ls, ln).collect()}
    expect = {i for i, t in enumerate(rows) if t > offset}
    assert got == expect


@given(
    rows=st.lists(
        st.tuples(
            st.integers(1, 3),                        # op
            st.booleans(),                            # rollback
            st.one_of(st.none(), st.floats(0, 2, allow_nan=False)),  # totalprice
            st.one_of(st.none(), st.floats(0, 2, allow_nan=False)),  # before_totalprice
            st.one_of(st.none(), st.sampled_from(["O", "F"])),       # status
            st.one_of(st.none(), st.sampled_from(["O", "F"])),       # before_status
        ),
        min_size=0,
        max_size=24,
    )
)
@settings(**_SETTINGS)
def test_suppress_unchanged_matches_nullsafe_scalar_model(spark, rows):
    """F9's update-without-change suppression (r10 authorship upgrade):
    the eqNullSafe struct equality equals the scalar rule — drop iff
    op=UPDATE, not a rollback marker, and BOTH value columns equal
    their before-images under null-safe comparison (None==None keeps
    suppressing; None vs value does not).  Ops other than UPDATE and
    rollback markers always survive, whatever the images say."""
    df = spark.createDataFrame(
        [(i, *r) for i, r in enumerate(rows)],
        "i long, op int, rollback boolean, totalprice double, "
        "before_totalprice double, status string, before_status string",
    )
    got = {r.i for r in cdc.suppress_unchanged_updates(df).collect()}
    expect = {
        i
        for i, (op, rb, tp, btp, stt, bst) in enumerate(rows)
        if not (op == cdc.OP_UPDATE and not rb and tp == btp and stt == bst)
    }
    assert got == expect


@given(
    txns=st.lists(
        st.tuples(
            st.integers(0, 5),      # xid
            st.integers(1, 3),      # dml op
            st.integers(0, 50),     # scn
        ),
        min_size=0,
        max_size=24,
    ),
    controls=st.dictionaries(st.integers(0, 5), st.sampled_from([7, 36]), max_size=6),
)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_restart_scn_matches_min_open_scalar_model(spark, txns, controls):
    """G9's safe restart watermark (r10 authorship upgrade): equals the
    scalar min(scn) over DML of transactions with NO control record —
    the reference's sortedByFirstScn TreeMap head
    (OraCdcLogMinerWorkerThread.java:108).  NULL when nothing is open."""
    rows = [(x, op, s, False) for x, op, s in txns]
    rows += [(x, c, 1_000, False) for x, c in controls.items()]
    df = spark.createDataFrame(
        rows, "xid long, op int, scn long, rollback boolean"
    )
    [r] = cdc.restart_scn(df).collect()
    open_scns = [s for x, op, s in txns if x not in controls]
    assert r.restart_scn == (min(open_scns) if open_scns else None)


@given(
    rows=st.lists(
        st.tuples(
            st.integers(1, 3),    # op
            st.booleans(),        # rollback
            st.sets(st.sampled_from(["TOTALPRICE", "STATUS"])),  # changed cols
        ),
        min_size=0,
        max_size=24,
    )
)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_completeness_split_matches_scalar_rule(spark, rows):
    """F7's completeness split (r10 authorship upgrade): equals the
    scalar rule — a row is REJECTED iff it is a non-rollback
    INSERT/UPDATE whose changed-column list misses ANY mandatory
    column; DELETEs and rollback markers are exempt (key suffices,
    reference OraCdcLogMinerWorkerThread:281-287).  The two sides
    partition the feed exactly."""
    from oracdc_spark.operators.filters import completeness_check

    df = spark.createDataFrame(
        [(i, op, rb, ",".join(sorted(cols))) for i, (op, rb, cols) in enumerate(rows)],
        "i long, op int, rollback boolean, changed_cols string",
    )
    ok, rej = completeness_check(df)
    got_ok = {r.i for r in ok.collect()}
    got_rej = {r.i for r in rej.collect()}
    expect_rej = {
        i
        for i, (op, rb, cols) in enumerate(rows)
        if op in (1, 3) and not rb and not {"TOTALPRICE", "STATUS"} <= cols
    }
    assert got_rej == expect_rej
    assert got_ok == set(range(len(rows))) - expect_rej


_OWNERS = ["ap", "SCOTT", "a2"]
_TABLES = ["test", "TEST", "test%", "t*t", "%", ""]
_ENTRY = st.one_of(
    st.sampled_from(["orders", "ORDERS", "nation"]),          # dot-less
    st.tuples(st.sampled_from(_OWNERS), st.sampled_from(_TABLES)).map(
        lambda t: f"{t[0]}.{t[1]}"
    ),
)
_ROW = st.tuples(
    st.sampled_from(["AP", "SCOTT", "A2", "OE"]),
    st.sampled_from(["TEST", "TEST2", "ORDERS", "orders", "TXT", "NATION"]),
)


@given(
    entries=st.lists(_ENTRY, min_size=1, max_size=4),
    rows=st.lists(_ROW, min_size=0, max_size=20),
)
@settings(**_SETTINGS)
def test_table_include_matches_scalar_grammar(spark, entries, rows):
    """F1's include-list grammar (r10 authorship upgrade; the r9
    dot-less change's hypothesis leg): `table_list_column` equals a
    scalar matcher implementing the documented rule — a dot-less entry
    matches its exact table name in ANY schema with NO case folding
    (OraSqlUtils.java:124-130); OWNER.TABLE upper-cases both sides,
    maps * to %, treats an empty/% table as whole-schema, and LIKEs
    only when a % remains; entries OR together."""
    import re as _re

    from oracdc_spark.operators.filters import table_list_column

    list_str = " , ".join(entries)
    df = spark.createDataFrame(
        [(i, o, t) for i, (o, t) in enumerate(rows)],
        "i long, owner string, table_name string",
    )
    got = {r.i for r in df.filter(table_list_column(list_str)).collect()}

    def entry_matches(entry, owner, table):
        if "." not in entry:
            return table == entry
        eo, et = entry.split(".", 1)
        eo, et = eo.strip().upper(), (et.strip() or "%").replace("*", "%").upper()
        if owner != eo:
            return False
        if et == "%":
            return True
        if "%" in et:
            return _re.fullmatch(et.replace("%", ".*"), table) is not None
        return table == et

    expect = {
        i
        for i, (o, t) in enumerate(rows)
        if any(entry_matches(e, o, t) for e in entries)
    }
    assert got == expect


@given(
    rows=st.lists(
        st.tuples(
            st.integers(1, 3),                                   # op
            st.integers(0, 5),                                   # pk
            st.one_of(st.none(), st.sampled_from([0.5, 2.0])),   # totalprice
            st.one_of(st.none(), st.sampled_from(["O", "F"])),   # status
            st.sampled_from([0.25, 4.0]),                        # before_totalprice
            st.sampled_from(["O", "F"]),                         # before_status
        ),
        min_size=0,
        max_size=16,
    ),
    delete_all=st.booleans(),
)
@settings(**_SETTINGS)
def test_kafka_binding_matches_scalar_model(spark, rows, delete_all):
    """K1's record binding (r10 authorship upgrade): topic/key/value/
    headers equal the scalar rule — topic = owner_table, key = the pk
    json, DELETE value = tombstone NULL (or the full before-image under
    FLG_ALL_COLS_ON_DELETE), headers carry the Debezium op char and the
    commit_scn string.  JSON via the same null-dropping, field-ordered
    form Spark's to_json emits."""
    import json as _json

    from oracdc_spark.sinks.kafka import bind_kafka_records

    df = spark.createDataFrame(
        [
            (i, op, "OWNER", "T1", str(pk), tp, stt, btp, bst, 100 + i, 500 + i, False)
            for i, (op, pk, tp, stt, btp, bst) in enumerate(rows)
        ],
        "i long, op int, owner string, table_name string, pk string, "
        "totalprice double, status string, before_totalprice double, "
        "before_status string, scn long, commit_scn long, rollback boolean",
    )
    got = sorted(
        [
            (
                r.topic,
                bytes(r.key).decode(),
                bytes(r.value).decode() if r.value is not None else None,
                [(h.key, bytes(h.value).decode()) for h in r.headers],
            )
            for r in bind_kafka_records(df, delete_all_columns=delete_all).collect()
        ],
        key=repr,
    )

    def js(d):
        return _json.dumps(
            {k: v for k, v in d.items() if v is not None}, separators=(",", ":")
        )

    expect = []
    for i, (op, pk, tp, stt, btp, bst) in enumerate(rows):
        opc = {1: "c", 3: "u", 2: "d"}[op]
        if op != 2:
            value = js(
                {"pk": str(pk), "totalprice": tp, "status": stt,
                 "__scn": 100 + i, "__commit_scn": 500 + i}
            )
        elif delete_all:
            value = js(
                {"pk": str(pk), "totalprice": btp, "status": bst,
                 "__scn": 100 + i, "__commit_scn": 500 + i}
            )
        else:
            value = None
        expect.append(
            (
                "OWNER_T1",
                js({"pk": str(pk)}),
                value,
                [("op", opc), ("commit_scn", str(500 + i))],
            )
        )
    assert got == sorted(expect, key=repr)
