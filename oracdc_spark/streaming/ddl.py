"""Streaming DDL capture → schema evolution (G8's streaming half).

Reference: DDL records (op=5) travel inside the redo stream; the worker
pre-processes the ALTER TABLE text and applies it to the cached table
definition, bumping the value-schema version mid-stream
(OraCdcLogMinerWorkerThread.java:490-535 → OraCdcTableBase.java:404-530).

Spark restatement: DDL events are rows (scn, owner, table_name,
ddl_text); inside ``foreachBatch`` they are applied — in SCN order — to
the driver-side ``SchemaRegistry`` before the batch's DML is decoded, so
statements after the DDL see the new version.  The registry is tiny
driver state; its (table → version) map is what the decode step
broadcasts.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from oracdc_spark.registry import SchemaRegistry

DDL_OP = 5


def apply_ddl_batch(registry: SchemaRegistry, batch: DataFrame) -> list[tuple[str, int]]:
    """Apply one micro-batch's DDL rows in SCN order; returns
    [(fqn, new_version), ...] for observability."""
    rows = (
        batch.filter(F.col("op") == DDL_OP)
        .select("scn", "owner", "table_name", "ddl_text")
        .orderBy("scn")
        .collect()  # DDL rows are rare (schema changes) — driver-side by design
    )
    out = []
    for r in rows:
        td = registry.apply_ddl(r.owner, r.table_name, r.ddl_text)
        out.append((td.fqn, td.version))
    return out


def run_ddl_capture(
    ddl_stream: DataFrame, registry: SchemaRegistry, checkpoint_dir: str
) -> StreamingQuery:
    """Wire a DDL event stream into the registry via foreachBatch."""

    def sink(batch: DataFrame, batch_id: int) -> None:
        apply_ddl_batch(registry, batch)

    return (
        ddl_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )
