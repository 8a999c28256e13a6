"""Roundtrip property for the SQL_REDO text parser (P1).

Render LogMiner-shaped INSERT/UPDATE/DELETE statements from arbitrary
column maps — values with embedded quotes (doubled, the Oracle
convention), commas, parens, the word ``and``, NULLs, and HEXTORAW
blobs — and require parse_sql_redo to recover the exact maps.  This is
the theorem behind OraCdcLogMinerTable's char-wise scanner; the
``'rock and roll'`` predicate case found and fixed a real split bug in
_parse_predicates during r9.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from oracdc_spark.functions.sql_redo import parse_sql_redo

_SETTINGS = dict(max_examples=60, deadline=None)

_COL = st.sampled_from(["C1", "C_2", "LAST UPD", "UPPER"])
# printable values exercising every quoting hazard
_STR = st.text(
    alphabet="ab,() 'x=AND and\n0", min_size=0, max_size=12
)
_HEX = st.text(alphabet="0123456789abcdef", min_size=2, max_size=8).filter(
    lambda s: len(s) % 2 == 0
)
_VAL = st.one_of(st.none(), _STR, _HEX.map(lambda h: ("HEX", h)))
_COLMAP = st.dictionaries(_COL, _VAL, min_size=1, max_size=4)


def _render(v):
    if v is None:
        return "NULL"
    if isinstance(v, tuple):
        return f"HEXTORAW('{v[1]}')"
    return "'" + v.replace("'", "''") + "'"


def _pred(col, v):
    if v is None:
        return f'"{col}" IS NULL'
    return f'"{col}" = {_render(v)}'


def _expect(m):
    return {c: (v[1] if isinstance(v, tuple) else v) for c, v in m.items()}


@given(after=_COLMAP)
@settings(**_SETTINGS)
def test_insert_roundtrip(after):
    cols = ", ".join(f'"{c}"' for c in after)
    vals = ", ".join(_render(v) for v in after.values())
    sql = f'insert into "SCOTT"."T1"({cols}) values ({vals});'
    r = parse_sql_redo(sql)
    assert r["op"] == 1 and r["owner"] == "SCOTT" and r["table"] == "T1"
    assert r["after"] == _expect(after) and r["before"] == {}


@given(before=_COLMAP)
@settings(**_SETTINGS)
def test_delete_roundtrip(before):
    where = " and ".join(_pred(c, v) for c, v in before.items())
    sql = f'delete from "SCOTT"."T1" where {where};'
    r = parse_sql_redo(sql)
    assert r["op"] == 2
    assert r["before"] == _expect(before) and r["after"] == {}


@given(sets=_COLMAP, before=_COLMAP)
@settings(**_SETTINGS)
def test_update_roundtrip(sets, before):
    set_clause = ", ".join(f'"{c}" = {_render(v)}' for c, v in sets.items())
    where = " and ".join(_pred(c, v) for c, v in before.items())
    sql = f'update "SCOTT"."T1" set {set_clause} where {where}'
    r = parse_sql_redo(sql)
    assert r["op"] == 3
    assert r["after"] == _expect(sets)
    assert r["before"] == _expect(before)
