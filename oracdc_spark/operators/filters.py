"""F1 — table include/exclude lists (SCHEMA.TABLE patterns).

Port of the semantics of OraSqlUtils.parseTableSchemaList
(/root/reference/src/main/java/solutions/a2/cdc/oracle/utils/OraSqlUtils.java:62-140):
a comma-separated list of ``OWNER.TABLE`` entries where TABLE may use
``%``/``*`` wildcards; ``OWNER.%`` matches the whole schema; entries may be
``"quoted"`` for exact case.  Produces both a Spark Column predicate and an
equivalent ANSI-SQL predicate string (for the DuckDB oracle and for JDBC
dictionary pushdown, mirroring the reference's generated
``OWNER='…' AND OBJECT_NAME LIKE '…'`` fragments).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def _parse_entry(entry: str) -> tuple[str | None, str]:
    """One list entry → (owner | None, table-pattern).

    A dot-less entry is a PLAIN TABLE NAME matched in ANY schema —
    the reference's third branch (OraSqlUtils.java:124-130 appends
    ``OBJECT_NAME='<entry>'`` with no owner predicate and, faithfully
    mirrored, no upper-casing); owner=None encodes it.  Wildcard scope
    is a documented superset: the reference LIKEs only TRAILING %/*
    (:107-121), this port LIKEs any pattern containing % after */%
    normalization — identical on every reference-legal input, and a
    mid-pattern % additionally works instead of being an exact literal."""
    entry = entry.strip()
    if not entry:
        raise ValueError("empty table-list entry")
    if "." not in entry:
        return None, entry
    owner, table = entry.split(".", 1)
    owner = owner.strip().strip('"')
    table = table.strip().strip('"')
    if not table:
        table = "%"
    table = table.replace("*", "%")
    return owner.upper() if '"' not in entry else owner, table.upper() if '"' not in entry else table


def parse_table_list(list_str: str) -> list[tuple[str, str]]:
    """'AP.% , SCOTT.TEST_IOT%' → [('AP','%'), ('SCOTT','TEST_IOT%')]."""
    return [_parse_entry(e) for e in list_str.split(",") if e.strip()]


def table_list_column(
    list_str: str, owner_col: str = "owner", table_col: str = "table_name"
) -> Column:
    """Spark predicate for an include list; negate for exclude."""
    pred: Column | None = None
    for owner, table in parse_table_list(list_str):
        if owner is None:  # plain table name, any schema
            c = F.col(table_col) == table
        else:
            c = F.col(owner_col) == owner
            if table != "%":
                c = c & (
                    F.col(table_col).like(table)
                    if "%" in table
                    else (F.col(table_col) == table)
                )
        pred = c if pred is None else (pred | c)
    if pred is None:
        raise ValueError("empty table list")
    return pred


def table_list_sql(
    list_str: str, owner_col: str = "owner", table_col: str = "table_name"
) -> str:
    """ANSI-SQL predicate equivalent to :func:`table_list_column` —
    same shape the reference generates for its dictionary queries."""
    parts = []
    for owner, table in parse_table_list(list_str):
        if owner is None:
            parts.append(f"{table_col} = '{table}'")
        elif table == "%":
            parts.append(f"{owner_col} = '{owner}'")
        elif "%" in table:
            parts.append(f"({owner_col} = '{owner}' AND {table_col} LIKE '{table}')")
        else:
            parts.append(f"({owner_col} = '{owner}' AND {table_col} = '{table}')")
    return " OR ".join(parts)


# ---------------------------------------------------------------------------
# F7 — supplemental completeness check (KafkaStructDataBinder.java:258-287)
# ---------------------------------------------------------------------------


class IncompleteRowError(ValueError):
    """Strict-mode F7 failure (the reference's OraCdcDataException)."""


def incomplete_rows_predicate(mandatory: tuple[str, ...] = ("TOTALPRICE", "STATUS")) -> Column:
    """True for non-DELETE DML whose changed-column set misses a
    mandatory column under supplemental-log-ALL expectations
    (``mandatoryColumnsProcessed < mandatoryColumnsCount``).  DELETEs are
    exempt — the key suffices (reference :281-287)."""
    complete: Column | None = None
    for c in mandatory:
        has = F.col("changed_cols").contains(c.upper())
        complete = has if complete is None else (complete & has)
    return F.col("op").isin([1, 3]) & ~F.col("rollback") & ~complete


def completeness_check(
    feed,
    mandatory: tuple[str, ...] = ("TOTALPRICE", "STATUS"),
    tolerate: bool = True,
):
    """F7 — split the feed into (complete, rejects).

    tolerate=True (FLG_TOLERATE_INCOMPLETE_ROW): incomplete rows are
    skipped from the main flow and surfaced on the reject side-output —
    Spark's declarative equivalent of the reference's log-and-return-null
    path.  tolerate=False: the caller must drain ``rejects`` and raise
    (see :func:`assert_complete`) — the reference throws
    OraCdcDataException on first incomplete row.
    """
    bad = incomplete_rows_predicate(mandatory)
    return feed.filter(~bad), feed.filter(bad)


def assert_complete(rejects) -> None:
    """Strict-mode gate: raise IncompleteRowError if any row was
    rejected.  One count() action over the (tiny) reject side."""
    n = rejects.count()
    if n:
        raise IncompleteRowError(f"{n} incomplete redo record(s)")
