"""Live-execution properties for the K2/K3/K4/K5 generated SQL.

The sink-SQL unit tests assert strings; these EXECUTE the generated
PostgreSQL-dialect DDL and DML against DuckDB (which speaks the same
``CREATE TABLE``/``INSERT .. ON CONFLICT .. DO UPDATE SET c =
EXCLUDED.c``/``DELETE .. WHERE`` grammar) and assert the sink CONVERGES:
for a random table shape and a random upsert/delete stream, the final
table state equals a literal replay into a Python dict — the same
one-event-at-a-time model the Spark-side apply property uses, now
proving the emitted wire SQL implements it on a real engine.

This layer is what caught the all-PK defect: a pure link table (every
column in the key) used to generate ``DO UPDATE SET`` with an empty
assignment list — a syntax error in 4 of 5 dialects — where the
reference's ``onlyPkColumns`` branch (TargetDbSqlUtils.java:376 ff)
degrades to plain INSERT.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from oracdc_spark.sinks.jdbc_sql import (
    DIALECTS,
    SinkTable,
    create_table_sql,
    delete_sql,
    insert_sql,
    partial_update_sql,
    upsert_sql,
)

_SETTINGS = dict(max_examples=15, deadline=None)

_VAL_TYPES = [LongType(), DoubleType(), StringType(), BooleanType()]


def _value_for(dtype, seed):
    if isinstance(dtype, LongType):
        return seed
    if isinstance(dtype, DoubleType):
        return float(seed) / 2.0
    if isinstance(dtype, BooleanType):
        return seed % 2 == 0
    return f"v{seed}"


def _key_for(dtype, k):
    return k if isinstance(dtype, LongType) else f"k{k}"


# table shape: pk col types (1-2), value col types (0-3; 0 = all-PK)
_SHAPE = st.tuples(
    st.lists(st.sampled_from([LongType(), StringType()]), min_size=1, max_size=2),
    st.lists(st.sampled_from(_VAL_TYPES), min_size=0, max_size=3),
)
# op stream: (is_delete, key id in a small space, value seed)
_OPS = st.lists(
    st.tuples(st.booleans(), st.integers(min_value=0, max_value=3),
              st.integers(min_value=0, max_value=99)),
    max_size=12,
)


def _table(shape):
    pk_types, val_types = shape
    fields = [StructField(f"k{i}", t, False) for i, t in enumerate(pk_types)]
    fields += [StructField(f"c{i}", t, True) for i, t in enumerate(val_types)]
    return SinkTable("sink_t", StructType(fields), tuple(f"k{i}" for i in range(len(pk_types))))


@given(shape=_SHAPE, ops=_OPS)
@settings(**_SETTINGS)
def test_pg_dialect_converges_on_duckdb(shape, ops):
    t = _table(shape)
    pk_types, val_types = shape
    all_pk = not val_types
    con = duckdb.connect()
    con.execute(create_table_sql(t, "postgresql"))
    up, dl = upsert_sql(t, "postgresql"), delete_sql(t, "postgresql")
    state = {}
    for is_delete, kid, seed in ops:
        key = tuple(_key_for(tt, kid) for tt in pk_types)
        if is_delete:
            con.execute(dl, list(key))
            state.pop(key, None)
        else:
            if all_pk and key in state:
                # reference onlyPkColumns semantics: plain INSERT — a
                # duplicate key RAISES (pinned below), so the feed
                # never re-inserts a live key
                continue
            vals = tuple(_value_for(tt, seed + i) for i, tt in enumerate(val_types))
            con.execute(up, list(key) + list(vals))
            state[key] = vals
    got = sorted(map(tuple, con.execute(f"SELECT * FROM {t.name}").fetchall()))
    want = sorted(k + v for k, v in state.items())
    assert got == want


@given(
    shape=st.tuples(
        st.lists(st.sampled_from([LongType(), StringType()]), min_size=1, max_size=2),
        st.lists(st.sampled_from(_VAL_TYPES), min_size=1, max_size=3),
    ),
    updates=st.lists(
        st.tuples(st.integers(min_value=0, max_value=2),
                  st.sets(st.integers(min_value=0, max_value=2)),
                  st.integers(min_value=0, max_value=99)),
        max_size=8,
    ),
)
@settings(**_SETTINGS)
def test_partial_update_executes_on_duckdb(shape, updates):
    """K5 wrapped partial updates: only the present columns change, the
    rest keep their values, and updates to absent keys are no-ops —
    executed live against DuckDB and replayed into a dict."""
    t = _table(shape)
    pk_types, val_types = shape
    con = duckdb.connect()
    con.execute(create_table_sql(t, "postgresql"))
    up = upsert_sql(t, "postgresql")
    state = {}
    for kid in range(2):  # seed keys 0 and 1; key 2 stays absent
        key = tuple(_key_for(tt, kid) for tt in pk_types)
        vals = [_value_for(tt, 10 + i) for i, tt in enumerate(val_types)]
        con.execute(up, list(key) + vals)
        state[key] = vals
    for kid, col_ids, seed in updates:
        present = tuple(
            f"c{i}" for i in sorted(col_ids) if i < len(val_types)
        )
        if not present:
            with pytest.raises(ValueError, match="nothing to update"):
                partial_update_sql(t, "postgresql", t.pk_cols)
            continue
        sql = partial_update_sql(t, "postgresql", present)
        key = tuple(_key_for(tt, kid) for tt in pk_types)
        vals = [_value_for(val_types[int(c[1:])], seed + int(c[1:])) for c in present]
        con.execute(sql, vals + list(key))
        if key in state:
            for c, v in zip(present, vals):
                state[key][int(c[1:])] = v
    got = sorted(map(tuple, con.execute(f"SELECT * FROM {t.name}").fetchall()))
    want = sorted(k + tuple(v) for k, v in state.items())
    assert got == want


def test_all_pk_table_degrades_to_plain_insert_every_dialect():
    """onlyPkColumns branch parity (TargetDbSqlUtils.java:376 ff): every
    dialect emits a plain INSERT for an all-PK table; a duplicate key
    then raises on the engine (the reference's behavior — there is
    nothing to update)."""
    t = _table(([LongType(), LongType()], []))
    for d in DIALECTS:
        assert upsert_sql(t, d) == insert_sql(t, d)
    con = duckdb.connect()
    con.execute(create_table_sql(t, "postgresql"))
    con.execute(upsert_sql(t, "postgresql"), [1, 2])
    with pytest.raises(duckdb.ConstraintException):
        con.execute(upsert_sql(t, "postgresql"), [1, 2])
