"""SQL_REDO text parsing (P1, SURVEY §2.4).

Reference: OraCdcLogMinerTable.java:66-74,155-400 splits LogMiner's
SQL_REDO text — ``insert into "OWNER"."T"("C1","C2") values ('v1',
HEXTORAW('…'))``, ``delete from … where "C1" = 'v' and …``, ``update …
set "C1" = 'v' where …`` — into (column → value) pairs; the
``HEXTORAW('…')`` wrapper is squeezed during fetch
(OraCdcLogMinerWorkerThread.java:92).

Only needed when the feed carries SQL text instead of structured images;
the structured feed (feed.py) bypasses it.  Values come back as raw
strings ('NULL' → None, HEXTORAW unwrapped to bare hex) ready for the
type decoders.
"""

from __future__ import annotations

import re

_IDENT = r'"([^"]+)"'
_INSERT_RE = re.compile(
    r'insert\s+into\s+"(?P<owner>[^"]+)"\."(?P<table>[^"]+)"\s*\((?P<cols>.*?)\)\s*'
    r"values\s*\((?P<vals>.*)\)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DELETE_RE = re.compile(
    r'delete\s+from\s+"(?P<owner>[^"]+)"\."(?P<table>[^"]+)"\s+where\s+(?P<where>.*?);?\s*$',
    re.IGNORECASE | re.DOTALL,
)
_UPDATE_RE = re.compile(
    r'update\s+"(?P<owner>[^"]+)"\."(?P<table>[^"]+)"\s+set\s+(?P<set>.*?)'
    r"\s+where\s+(?P<where>.*?);?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_HEXTORAW_RE = re.compile(r"HEXTORAW\('([0-9a-fA-F]*)'\)")


def _split_top_level(s: str, sep: str = ",") -> list[str]:
    """Split on `sep` outside quotes/parens."""
    parts, depth, in_q, cur = [], 0, False, []
    i = 0
    while i < len(s):
        ch = s[i]
        if in_q:
            if ch == "'":
                if i + 1 < len(s) and s[i + 1] == "'":
                    cur.append("''")
                    i += 2
                    continue
                in_q = False
            cur.append(ch)
        else:
            if ch == "'":
                in_q = True
                cur.append(ch)
            elif ch == "(":
                depth += 1
                cur.append(ch)
            elif ch == ")":
                depth -= 1
                cur.append(ch)
            elif ch == sep and depth == 0:
                parts.append("".join(cur).strip())
                cur = []
            else:
                cur.append(ch)
        i += 1
    if cur:
        parts.append("".join(cur).strip())
    return parts


def _norm_value(v: str) -> str | None:
    v = v.strip()
    if v.upper() == "NULL":
        return None
    m = _HEXTORAW_RE.fullmatch(v)
    if m:
        return m.group(1)  # the squeeze: bare hex
    if v.startswith("'") and v.endswith("'"):
        return v[1:-1].replace("''", "'")
    return v


def _split_conditions(where: str) -> list[str]:
    """Split a where-clause on AND *outside quotes/parens* — a value
    like ``'rock and roll'`` must not split (the reference parser walks
    the text char-wise and never splits inside a literal,
    OraCdcLogMinerTable.java:155-400; found by the r9 roundtrip
    property test)."""
    parts, depth, in_q, cur, i = [], 0, False, [], 0
    n = len(where)
    while i < n:
        ch = where[i]
        if in_q:
            cur.append(ch)
            if ch == "'":
                if i + 1 < n and where[i + 1] == "'":
                    cur.append("'")
                    i += 1
                else:
                    in_q = False
        elif ch == "'":
            in_q = True
            cur.append(ch)
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif (
            depth == 0
            and ch in " \t\n"
            and where[i + 1 : i + 4].lower() == "and"
            and (i + 4 >= n or where[i + 4] in " \t\n")
        ):
            parts.append("".join(cur))
            cur = []
            i += 4
        else:
            cur.append(ch)
        i += 1
    parts.append("".join(cur))
    return parts


def _parse_predicates(where: str) -> dict[str, str | None]:
    out: dict[str, str | None] = {}
    for cond in _split_conditions(where):
        cond = cond.strip()
        m = re.match(rf"{_IDENT}\s+IS\s+NULL\s*$", cond, re.IGNORECASE)
        if m:
            out[m.group(1)] = None
            continue
        m = re.match(rf"{_IDENT}\s*=\s*(.+)$", cond, re.IGNORECASE | re.DOTALL)
        if m:
            out[m.group(1)] = _norm_value(m.group(2))
    return out


def parse_sql_redo(sql: str) -> dict:
    """SQL_REDO → {op, owner, table, before: {col: val}, after: {col: val}}.

    op codes follow the feed convention: 1=INSERT, 2=DELETE, 3=UPDATE.
    """
    sql = sql.strip()
    m = _INSERT_RE.match(sql)
    if m:
        cols = [c.strip().strip('"') for c in _split_top_level(m.group("cols"))]
        vals = [_norm_value(v) for v in _split_top_level(m.group("vals"))]
        if len(cols) != len(vals):
            raise ValueError("insert column/value count mismatch")
        return {
            "op": 1,
            "owner": m.group("owner"),
            "table": m.group("table"),
            "before": {},
            "after": dict(zip(cols, vals)),
        }
    m = _UPDATE_RE.match(sql)
    if m:
        sets = {}
        for part in _split_top_level(m.group("set")):
            mm = re.match(rf"{_IDENT}\s*=\s*(.+)$", part, re.DOTALL)
            if mm:
                sets[mm.group(1)] = _norm_value(mm.group(2))
        return {
            "op": 3,
            "owner": m.group("owner"),
            "table": m.group("table"),
            "before": _parse_predicates(m.group("where")),
            "after": sets,
        }
    m = _DELETE_RE.match(sql)
    if m:
        return {
            "op": 2,
            "owner": m.group("owner"),
            "table": m.group("table"),
            "before": _parse_predicates(m.group("where")),
            "after": {},
        }
    raise ValueError(f"unrecognized SQL_REDO statement: {sql[:80]!r}")


def redo_after_value(col_name: str):
    """Arrow-vectorized extraction of one after-image column from
    SQL_REDO text — the DataFrame surface of the parser (used when a
    feed carries SQL text instead of structured images)."""
    import pandas as pd  # noqa: F401 — needed for the annotation below
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    def _fn(s):
        return s.map(
            lambda t: None if t is None else parse_sql_redo(t)["after"].get(col_name)
        )

    return pandas_udf(_fn, returnType=StringType())
