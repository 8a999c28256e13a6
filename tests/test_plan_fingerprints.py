"""In-suite presence for the plan-fingerprint gate: a SAMPLE of cheap
plan-build-only queries is checked against the committed registry on
every pytest run, so an engine edit that changes a declared plan trips
here within seconds instead of waiting for the 10-minute full tool
(`tools/plan_fingerprints.py` — still the round gate over all 261).

The sample spans the engine's main plan families: a TPC-H aggregate, a
window query, a dedup groupBy, a text scorer, and an ANN serving scan.
None executes a job — building the DataFrame is enough to fingerprint
the analyzed plan.  CDC queries are EXCLUDED from the sample: their
plans read the change feed either derived-from-orders or from the
session's materialized parquet snapshot depending on conftest state
(`feed._FEED_CACHE`), so their fingerprints are only stable in the
fresh-session tool run — the full `tools/plan_fingerprints.py` gate
covers them.
"""

import json
from pathlib import Path

import pytest

import __spark_entry__ as entry_mod

REPO = Path(__file__).resolve().parent.parent
SF = "/root/testdata/sf0.001"

SAMPLE = [
    "q1_pricing_summary",
    "dedup_exact_groups",
    "customer_order_rank",
    "text_quality",
    "similarity_bruteforce_topk",
]


@pytest.fixture(scope="module")
def registry():
    path = REPO / "PLAN_FINGERPRINTS.json"
    if not path.exists():
        pytest.skip("no PLAN_FINGERPRINTS.json (run tools/plan_fingerprints.py --write)")
    return json.loads(path.read_text())


@pytest.mark.parametrize("name", SAMPLE)
def test_sample_fingerprint_matches_registry(spark, registry, name):
    import sys

    sys.path.insert(0, str(REPO / "tools"))
    from plan_fingerprints import _fingerprint

    got = _fingerprint(entry_mod.queries()[name](spark, SF))
    window = list(entry_mod.queries())[:50]
    assert got == registry[name] or name in window, (
        f"{name}: analyzed plan changed but the query is NOT in the current "
        "driver window — either revert the plan change or re-enter the row "
        "and refresh the registry (tools/plan_fingerprints.py --write) in "
        "the same commit"
    )
