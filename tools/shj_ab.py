"""Shuffled-hash-join config A/B at a LOW core count (r12 verdict item 7).

r12 tested ``spark.sql.join.preferSortMergeJoin=false`` +
``spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold=64m`` (guide
§3.1: allow SHJ where the per-partition build side fits) on local[32]
and correctly did NOT ship it on a losing measurement.  The verdict
queues a re-probe at the driver's 8-core configuration — a
memory-bounded-ish proxy where fewer, larger partitions give SHJ's
no-sort advantage a chance to show.

Both flags are runtime SQL confs, so the A/B interleaves sides in ONE
JVM (identical JIT/host conditions for both): fresh JVM at
local[$SPARK_GRAFT_CPUS], one untimed warm pass per side, then R
rounds visiting (query x side) round-robin; per-(query, side) min and
median reported.

Usage: SPARK_GRAFT_CPUS=8 python tools/shj_ab.py [query ...]
       (defaults to the r12 join-heavy subset)

r13 outcome (why the sides now alternate): the first protocol ran
base-then-shj back to back per query and read shj "winning" -14% at 8
cores and -19% at 32.  Checking the *executed* adaptive plans showed
them bit-identical under both configs (every declared join broadcasts
at bench scale; the lone SortMergeJoin is not AQE-rewritten), which an
honest win cannot survive — and a null test (both sides = base config,
same loop) reproduced the same -12% "win" for whichever side ran
second.  The measured quantity was pair position, not the conf.
Lesson encoded here: interleave AND alternate, and always cross-check
a conf A/B against the executed plan before believing it.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_SET = [
    "q5_region_revenue",
    "q7_volume_shipping",
    "q9_product_profit",
    "q18_large_volume_customers",
    "cdc_apply_changes",
    "hybrid_retrieval",
]

ROUNDS = 3

SHJ_CONF = {
    "spark.sql.join.preferSortMergeJoin": "false",
    "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "64m",
}
BASE_CONF = {
    "spark.sql.join.preferSortMergeJoin": "true",
    "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "0",
}


def main() -> int:
    import __spark_entry__ as e
    from oracdc_spark.session import get_spark

    names = sys.argv[1:] or DEFAULT_SET
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("shj-ab")
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()

    def set_side(conf: dict) -> None:
        for k, v in conf.items():
            spark.conf.set(k, v)

    def run(name: str) -> float:
        t0 = time.time()
        qs[name](spark, sf_dir).count()
        return time.time() - t0

    for side, conf in (("base", BASE_CONF), ("shj", SHJ_CONF)):
        set_side(conf)
        for n in names:
            run(n)  # untimed warm per side (JIT + codegen per plan variant)

    timings: dict[tuple, list[float]] = {
        (n, s): [] for n in names for s in ("base", "shj")
    }
    for r in range(ROUNDS):
        # Alternate which side runs first each round: the r13 null test
        # (both sides identical config) measured a systematic ~12%
        # advantage for whichever run of a query comes SECOND in a
        # back-to-back pair (page cache / JIT / shuffle-file locality).
        # A fixed base-then-shj order converts that bias into a fake
        # "shj wins" result; alternating cancels it across rounds.
        sides = [("base", BASE_CONF), ("shj", SHJ_CONF)]
        if r % 2:
            sides.reverse()
        for n in names:
            for side, conf in sides:
                set_side(conf)
                timings[(n, side)].append(run(n))
    out = {}
    for n in names:
        b, s = timings[(n, "base")], timings[(n, "shj")]
        out[n] = {
            "base_min": round(min(b), 3),
            "shj_min": round(min(s), 3),
            "base_med": round(statistics.median(b), 3),
            "shj_med": round(statistics.median(s), 3),
        }
    total_b = sum(v["base_min"] for v in out.values())
    total_s = sum(v["shj_min"] for v in out.values())
    print(json.dumps({
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "*"),
        "rounds": ROUNDS,
        "per_query": out,
        "subset_base_min_total": round(total_b, 3),
        "subset_shj_min_total": round(total_s, 3),
    }, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
