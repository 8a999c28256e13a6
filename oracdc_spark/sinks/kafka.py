"""Kafka sink binding (K1 — the writer half).

Reference: KafkaStructDataBinder.java:252-365 binds key/value structs,
maps table → topic, pins partitions, and sets the ``op`` header.

Spark restatement: ``df.writeStream.format("kafka")`` consumes columns
named ``topic``, ``key``, ``value`` (binary/string) and ``headers``
(array<struct<key:string,value:binary>>).  :func:`bind_kafka_records`
produces exactly that shape from a commit-stamped change DataFrame —
unit-testable without a broker; :func:`write_kafka` attaches the writer.

Ordering: Kafka guarantees order per (topic, partition); keying by PK
hash preserves per-row order — the same guarantee the reference relies
on (tombstone compaction needs key-partitioned order).
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from oracdc_spark.feed import OP_DELETE, OP_INSERT, OP_UPDATE


def bind_kafka_records(
    stamped: DataFrame,
    topic_mapper: Callable[[str | None, str, str], str] | None = None,
    delete_all_columns: bool = False,
    partition: int | None = None,
) -> DataFrame:
    """Commit-stamped changes → Kafka writer columns
    (topic, key, value, headers). Delete → tombstone (null value), or —
    with ``delete_all_columns`` (FLG_ALL_COLS_ON_DELETE,
    OraCdcTableBase.java:93, KafkaStructDataBinder.java:318-344) — the
    full before-image as the value.  ``partition`` pins every record to
    one topic partition (``a2.topic.partition``,
    KafkaSourceConnectorConfig.java:90,1027) — emitted as the int
    ``partition`` column Spark's Kafka writer honors."""
    if topic_mapper is None:
        topic = F.concat_ws("_", F.col("owner"), F.col("table_name"))
        df = stamped
    else:
        # custom mapper: resolve driver-side over the (tiny) distinct
        # table set, broadcast-join back — no per-row Python
        pairs = stamped.select("owner", "table_name").distinct().collect()
        spark = stamped.sparkSession
        mapping = spark.createDataFrame(
            [(p.owner, p.table_name, topic_mapper(None, p.owner, p.table_name)) for p in pairs],
            "owner string, table_name string, _topic string",
        )
        df = stamped.join(F.broadcast(mapping), ["owner", "table_name"])
        topic = F.col("_topic")
    op_char = (
        F.when(F.col("op") == OP_INSERT, "c")
        .when(F.col("op") == OP_UPDATE, "u")
        .when(F.col("op") == OP_DELETE, "d")
    )
    key = F.to_json(F.struct(F.col("pk").alias("pk")))
    value = F.when(
        F.col("op") != OP_DELETE,
        F.to_json(
            F.struct(
                F.col("pk").alias("pk"),
                F.col("totalprice").alias("totalprice"),
                F.col("status").alias("status"),
                F.col("scn").alias("__scn"),
                F.col("commit_scn").alias("__commit_scn"),
            )
        ),
    )
    if delete_all_columns:
        value = F.coalesce(
            value,
            F.to_json(
                F.struct(
                    F.col("pk").alias("pk"),
                    F.col("before_totalprice").alias("totalprice"),
                    F.col("before_status").alias("status"),
                    F.col("scn").alias("__scn"),
                    F.col("commit_scn").alias("__commit_scn"),
                )
            ),
        )
    headers = F.array(
        F.struct(F.lit("op").alias("key"), F.encode(op_char, "utf-8").alias("value")),
        F.struct(
            F.lit("commit_scn").alias("key"),
            F.encode(F.col("commit_scn").cast("string"), "utf-8").alias("value"),
        ),
    )
    cols = [
        topic.alias("topic"),
        key.cast("binary").alias("key"),
        value.cast("binary").alias("value"),
        headers.alias("headers"),
    ]
    if partition is not None:
        cols.append(F.lit(int(partition)).cast("int").alias("partition"))
    return df.select(*cols)


def write_kafka(
    bound: DataFrame, bootstrap_servers: str, checkpoint_dir: str
):
    """Attach the Kafka writer (requires a broker + the spark-sql-kafka
    package at runtime; the binding above is broker-free testable)."""
    return (
        bound.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("includeHeaders", "true")
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
