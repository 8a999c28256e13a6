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
    }
    if not out["cols_match"] or len(s_rows) != len(d_rows):
        out["values_match"] = False
        return out
    sn = _norm_rows(s_cols, s_rows)
    dn = _norm_rows(d_cols, d_rows)
    out["values_match"] = sn == dn
    if not out["values_match"]:
        diffs = [(a, b) for a, b in zip(sn, dn) if a != b]
        out["first_diffs"] = diffs[:3]
        only_s = set(sn) - set(dn)
        only_d = set(dn) - set(sn)
        out["only_spark"] = list(only_s)[:3]
        out["only_duck"] = list(only_d)[:3]
    return out
