"""Skew-handling plan utilities (SURVEY "Optimize for scale": salting +
AQE notes).

AQE's skew-join splitting (enabled in session.py) covers sort-merge
joins automatically; these helpers cover the two cases AQE does not:

* skewed *aggregation* keys (one xid with millions of statements — the
  reference's large-transaction problem, G11): two-phase salted
  aggregation;
* skewed join keys against a non-broadcastable build side: explicit
  salt-and-replicate join.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, Column],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed keys: phase 1 aggregates on
    (key, salt) — hot keys split across `salt_buckets` reducers — phase 2
    merges partials on the key alone.

    `aggs` maps output column name → *phase-1* aggregate expression; the
    merge phase re-aggregates with the matching combinator (sum→sum,
    count→sum, min→min, max→max), so only decomposable aggregates are
    accepted."""
    salted = df.withColumn("_salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    phase1 = salted.groupBy(*keys, "_salt").agg(
        *[expr.alias(f"_p1_{name}") for name, expr in aggs.items()]
    )
    merged = []
    for name, expr in aggs.items():
        fn = expr._jc.toString().split("(")[0].lower()
        p1 = F.col(f"_p1_{name}")
        if fn.startswith("count") or fn.startswith("sum"):
            merged.append(F.sum(p1).alias(name))
        elif fn.startswith("min"):
            merged.append(F.min(p1).alias(name))
        elif fn.startswith("max"):
            merged.append(F.max(p1).alias(name))
        else:
            raise ValueError(f"non-decomposable aggregate for salted_agg: {fn}")
    return phase1.groupBy(*keys).agg(*merged)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skewed-key join without broadcast: salt the big side, replicate
    the small side across all salt values, join on (key, salt).

    Replication factor = salt_buckets on the small side only; the big
    side's hot keys spread across `salt_buckets` tasks."""
    big_s = big.withColumn("_salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    small_r = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = big_s.join(small_r, [on, "_salt"], how)
    return out.drop("_salt")
