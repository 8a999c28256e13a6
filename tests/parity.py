"""Local replica of the driver's DuckDB-oracle comparison.

Runs a queries() entry in Spark and its oracle_sql() in DuckDB over the
same sf dir, then compares row count, column names, and order-insensitive
values (normalized string form).
"""

from __future__ import annotations

import math
from typing import Any

import duckdb

from oracdc_spark import TABLES


def register_duck_views(con: duckdb.DuckDBPyConnection, sf_dir: str) -> None:
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )


def _norm_cell(v: Any) -> str:
    if v is None:
        return "<null>"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    return str(v)


def _norm_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


# DuckDB result types the driver's hash normalization renders identically
# to the matching Spark type.  Anything outside this set (HUGEINT from a
# widened window SUM, DECIMAL from unfenced arithmetic, ...) may hash
# differently on the driver even when every value is equal under str() —
# exactly the events_range_frame r6/r7 red-row class.  The local gate must
# therefore flag such columns even though _norm_cell() would hide them.
_SAFE_DUCK_TYPES = {
    "BIGINT", "INTEGER", "SMALLINT", "TINYINT", "UBIGINT", "UINTEGER",
    "DOUBLE", "FLOAT", "VARCHAR", "BOOLEAN", "DATE", "TIMESTAMP",
    "TIMESTAMP WITH TIME ZONE",
}


def _unsafe_duck_cols(con, sql: str, sdf) -> list[tuple[str, str]]:
    """(col, duckdb_type) pairs whose oracle result type the driver's hash
    normalization does not render 1:1 — unless the Spark column is itself
    decimal (then DECIMAL-vs-DECIMAL is a deliberate, matched choice)."""
    rel = con.sql(sql)
    spark_types = {f.name.lower(): f.dataType.typeName() for f in sdf.schema.fields}
    bad = []
    for name, typ in zip(rel.columns, rel.types):
        t = str(typ).upper()
        base = t.split("(")[0].strip()
        if base in _SAFE_DUCK_TYPES:
            continue
        if base == "DECIMAL" and spark_types.get(name.lower(), "").startswith("decimal"):
            continue
        bad.append((name, t))
    return bad


def compare(spark, con, query_fn, sql: str, sf_dir: str) -> dict:
    sdf = query_fn(spark, sf_dir)
    s_cols = [c.lower() for c in sdf.columns]
    s_rows = [tuple(r) for r in sdf.collect()]
    res = con.execute(sql)
    d_cols = [c[0].lower() for c in res.description]
    d_rows = res.fetchall()
    out = {
        "spark_rows": len(s_rows),
        "duck_rows": len(d_rows),
        "cols_match": sorted(s_cols) == sorted(d_cols),
        "spark_cols": s_cols,
        "duck_cols": d_cols,
        "unsafe_duck_types": _unsafe_duck_cols(con, sql, sdf),
    }
    if not out["cols_match"] or len(s_rows) != len(d_rows):
        out["values_match"] = False
        return out
    sn = _norm_rows(s_cols, s_rows)
    dn = _norm_rows(d_cols, d_rows)
    out["values_match"] = sn == dn and not out["unsafe_duck_types"]
    if not out["values_match"]:
        diffs = [(a, b) for a, b in zip(sn, dn) if a != b]
        out["first_diffs"] = diffs[:3]
        only_s = set(sn) - set(dn)
        only_d = set(dn) - set(sn)
        out["only_spark"] = list(only_s)[:3]
        out["only_duck"] = list(only_d)[:3]
    return out
