"""Property-based invariants for DDL schema evolution (G8).

Random ADD/DROP/RENAME sequences rendered as ALTER TABLE statements
must fold to exactly the schema a dictionary model computes — the
theorem behind OraCdcAlterTablePreProcessorTest's fixed scenarios.
Also pinned: version bumps once per effective statement, a no-op
statement (dropping an absent column) does NOT bump, and key-column
drops are rejected without corrupting the def.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql.types import StringType, StructField, StructType

from oracdc_spark.registry import SchemaRegistry, TableDef

_SETTINGS = dict(max_examples=40, deadline=None)

_POOL = ["C1", "C2", "C3", "C4"]

# ops: ("add", col) | ("drop", col) | ("rename", old, new)
_OP = st.one_of(
    st.tuples(st.just("add"), st.sampled_from(_POOL)),
    st.tuples(st.just("drop"), st.sampled_from(_POOL)),
    st.tuples(st.just("rename"), st.sampled_from(_POOL), st.sampled_from(_POOL)),
)
_OPS = st.lists(_OP, min_size=0, max_size=8)


def _fresh_registry():
    reg = SchemaRegistry()
    td = TableDef(
        owner="SCOTT",
        name="T1",
        schema=StructType(
            [
                StructField("ID", StringType(), False),
                StructField("C1", StringType(), True),
            ]
        ),
        key_cols=("ID",),
    )
    reg.register(td)
    return reg


def _model_apply(cols, op):
    """Dictionary model over an ordered column list (ID always first)."""
    kind = op[0]
    if kind == "add":
        c = op[1]
        if c in cols:
            return cols, False
        return cols + [c], True
    if kind == "drop":
        c = op[1]
        if c in cols and c != "ID":
            return [x for x in cols if x != c], True
        return cols, False
    old, new = op[1], op[2]
    if old not in cols or old == "ID" or new in cols or new == "ID":
        return cols, False
    return [new if x == old else x for x in cols], True


def _render(op):
    if op[0] == "add":
        return f"ALTER TABLE SCOTT.T1 ADD ({op[1]} VARCHAR2(10))"
    if op[0] == "drop":
        return f"ALTER TABLE SCOTT.T1 DROP COLUMN {op[1]}"
    return f"ALTER TABLE SCOTT.T1 RENAME COLUMN {op[1]} TO {op[2]}"


@given(ops=_OPS)
@settings(**_SETTINGS)
def test_ddl_fold_matches_dictionary_model(ops):
    reg = _fresh_registry()
    cols, version, effective = ["ID", "C1"], 1, 0
    for op in ops:
        model_cols, model_changed = _model_apply(cols, op)
        try:
            td = reg.apply_ddl("SCOTT", "T1", _render(op))
        except ValueError:
            # the registry may reject what the model calls a no-op
            # (e.g. renaming onto an existing name); state must be intact
            td = reg.get("SCOTT", "T1")
            assert [f.name for f in td.schema.fields] == cols
            continue
        if model_changed:
            effective += 1
            cols = model_cols
        assert [f.name for f in td.schema.fields] == cols
        assert td.version == version + effective


@given(ops=_OPS)
@settings(**_SETTINGS)
def test_key_column_drop_always_rejected(ops):
    reg = _fresh_registry()
    for op in ops:
        try:
            reg.apply_ddl("SCOTT", "T1", _render(op))
        except ValueError:
            pass
    with pytest.raises(ValueError):
        reg.apply_ddl("SCOTT", "T1", "ALTER TABLE SCOTT.T1 DROP COLUMN ID")
    td = reg.get("SCOTT", "T1")
    assert "ID" in [f.name for f in td.schema.fields]
