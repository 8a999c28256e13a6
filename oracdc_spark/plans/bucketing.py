"""Table-format bucketing: co-located joins without a shuffle.

At 100 TB the dominant CDC-sink cost is the repeated join between change
batches and reference/replica tables on the same key.  Spark's native
bucketing (`bucketBy` + `sortBy` at write time) records the hash
partitioning in the table catalog, so a join between two tables bucketed
on the join key with compatible bucket counts needs NO Exchange on
either side — the SortMergeJoin reads buckets pairwise.  This is the
table-format analog of the replica sink's `pk_bucket=N` directory scheme
(`sinks/merge.py`) and the strategy SCALING.md prescribes for the
1000-executor deployment: land both fact and dimension bucketed on the
join key once, and every subsequent join is exchange-free.

`tests/test_bucketing.py` asserts the property from the physical plan
(no Exchange over the bucketed scans; `Bucketed: true` on the FileScan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key: str,
    n_buckets: int = 32,
    path: str | None = None,
) -> None:
    """Persist ``df`` bucketed+sorted by ``key`` (external when ``path``
    given). Bucket metadata lives in the session catalog — readers get
    the output partitioning for free."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, key).sortBy(key)
    if path is not None:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key."""
    return spark.table(left_table).join(spark.table(right_table), key)


def exchange_count(df: DataFrame) -> int:
    """Number of Exchange nodes in the executed plan (plan evidence)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(1 for line in plan.splitlines() if "Exchange" in line)
