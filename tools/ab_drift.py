"""Interleaved steady-state timing for suite-position drifters.

r8 verdict item 3: several bench queries oscillate between rounds with
UNCHANGED code (similarity_sq8_recall 0.59→2.42 s, text_cms_topk,
text_unigram_logprob, similarity_ivfpq_topk, text_repetition,
text_contamination).  The in-suite number depends on where the query
lands relative to JIT warm-up, GC pressure from earlier queries, and
executor-thread contention — so per-query regressions must be judged
from an interleaved steady-state run in a fresh JVM, not from two
suite positions.

Protocol (the bench isolated-metric protocol, applied per query):
fresh JVM, sf from $SPARK_GRAFT_SF_DIR (default sf0.1),
local[$SPARK_GRAFT_CPUS], ONE untimed warm pass of every query (JIT +
shuffle-service warm-up), then R timed rounds visiting the queries
ROUND-ROBIN (so slow drift in host load hits every query equally),
reporting per-query median and spread.  Numbers land in SCALING.md.

Usage: python tools/ab_drift.py [query ...]    (defaults to the r8 set)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_SET = [
    "similarity_sq8_recall",
    "text_cms_topk",
    "text_unigram_logprob",
    "similarity_ivfpq_topk",
    "text_repetition",
    "text_contamination",
]

ROUNDS = 4


def main() -> int:
    import __spark_entry__ as e
    from oracdc_spark.session import get_spark

    names = sys.argv[1:] or DEFAULT_SET
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-drift")
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()

    def run(name: str) -> float:
        t0 = time.time()
        qs[name](spark, sf_dir).count()
        return time.time() - t0

    warm = {n: run(n) for n in names}  # untimed-for-verdict warm pass
    timings: dict[str, list[float]] = {n: [] for n in names}
    for r in range(ROUNDS):
        for n in names:
            timings[n].append(run(n))
    out = {
        n: {
            "warm_first": round(warm[n], 3),
            "runs": [round(t, 3) for t in timings[n]],
            "median": round(statistics.median(timings[n]), 3),
            "min": round(min(timings[n]), 3),
            "max": round(max(timings[n]), 3),
        }
        for n in names
    }
    print(json.dumps({"sf_dir": sf_dir, "rounds": ROUNDS, "queries": out}, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
