"""Z-order (Morton) clustering for multi-dimensional data skipping.

At 100 TB, scans filtered on TWO dimensions (e.g. `user_id` range AND a
time range) prune poorly when the table is partitioned/sorted on only
one of them.  Z-ordering interleaves the bits of both keys so rows close
in EITHER dimension land in the same files; partitioning (or sorting) by
a Z-bucket makes parquet row-group stats and partition pruning effective
for range predicates on both dimensions at once — the technique Delta's
`OPTIMIZE ZORDER BY` applies, restated here as plain Column expressions
(JVM bit ops inside codegen, no UDF).

`tests/test_zorder.py` proves the skipping: a 2-D range filter over the
z-bucket-partitioned copy reads a strict subset of partitions
(pushed partition filters), and yields the same rows as the plain copy.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def zorder_key(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton interleave of two non-negative ints (low `bits` of each):
    result bit 2i = bit i of a, bit 2i+1 = bit i of b.  Built-in shift/
    and/or expressions only — whole-stage codegen, no UDF."""
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(a.cast("bigint"), i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(b.cast("bigint"), i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def zbucket(a: Column, b: Column, bits: int = 16, n_buckets: int = 64) -> Column:
    """Coarse Z-bucket for partitioning: top bits of the Morton key —
    each bucket covers a contiguous Z-curve segment (a 2-D tile)."""
    total = 2 * bits
    shift = max(total - (n_buckets - 1).bit_length(), 0)
    return F.shiftright(zorder_key(a, b, bits), shift)


def write_zordered(
    df: DataFrame, path: str, a: str, b: str, bits: int = 16, n_buckets: int = 64
) -> None:
    """Write partitioned by z-bucket (dir-level pruning) with rows
    z-sorted inside each partition (row-group-stat pruning)."""
    (
        df.withColumn("zb", zbucket(F.col(a), F.col(b), bits, n_buckets))
        .withColumn("_z", zorder_key(F.col(a), F.col(b), bits))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .partitionBy("zb")
        .parquet(path)
    )
