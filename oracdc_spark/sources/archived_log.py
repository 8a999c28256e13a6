"""S4 — archived-log discovery scan, re-expressed over the structured
change feed.

The reference asks V$ARCHIVED_LOG for the ordered list of log sequences
whose SCN span overlaps the mining window (``FIRST_CHANGE# <= :hi AND
NEXT_CHANGE# > :lo ORDER BY SEQUENCE#`` — OraDictSqlTexts.java:425-478,
consumed by OraCdcV$ArchivedLogImpl.java:53 and the distributed variant
OraCdcDistributedV$ArchivedLogImpl.java:69; one row per redo THREAD# in
RAC/standby topologies).  The structured feed has no separate catalog
table, but each record carries its redo thread (the RBA prefix) and
SCN, so the catalog row IS an aggregate: a log "sequence" is a fixed
SCN span per thread, its FIRST_CHANGE#/NEXT_CHANGE# the min/max+1 over
its records.

Scale shape: ONE map-side-combining groupBy on (thread, sequence) —
cardinality = number of log files, microscopic next to the feed scan —
followed by a codegen overlap filter; ordering is part of the declared
output contract (the reference consumes sequences in order).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def discover_sequences(
    feed: DataFrame, first_scn: int, next_scn: int, seq_span: int = 1_000_000
) -> DataFrame:
    """Ordered (thread, sequence) catalog covering [first_scn, next_scn).

    Output: (thread, sequence, first_change, next_change, n_records) —
    exactly the V$ARCHIVED_LOG projection the reference's discovery
    loop consumes, with NEXT_CHANGE# defined as max(scn)+1 (Oracle's
    convention: the first SCN of the successor log)."""
    thread = F.split(F.col("rba"), r"\.").getItem(0).cast("bigint")
    seq = F.expr(f"scn div {seq_span}")
    cat = (
        feed.select(
            thread.alias("thread"),
            seq.cast("bigint").alias("sequence"),
            F.col("scn"),
        )
        .groupBy("thread", "sequence")
        .agg(
            F.min("scn").alias("first_change"),
            (F.max("scn") + 1).alias("next_change"),
            F.count(F.lit(1)).alias("n_records"),
        )
    )
    return cat.filter(
        (F.col("first_change") < F.lit(next_scn))
        & (F.col("next_change") > F.lit(first_scn))
    ).orderBy("thread", "sequence")
