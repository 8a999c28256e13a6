"""Longitudinal per-query drift comparator over BENCH_DETAIL artifacts
(r11 verdict item 7): with a committed full-suite detail file per round,
the by-hand tail-diff that adjudicated r9/r10/r11 drift becomes a tool.

Usage:
    python tools/bench_drift.py BENCH_DETAIL_r11.json BENCH_DETAIL_r12.json
    python tools/bench_drift.py old.json new.json --threshold 1.4

Protocol (mirrors the SCALING.md drift rules):

* CONTAMINATION GATE FIRST: if either artifact's
  ``insuite_isolated_ratio`` exceeds the clean band (<= 2.0; idle
  measurements read 1.2-1.5x) the comparison is refused — per-query
  walls from a contended host are noise, not drift (the r11 319 s
  driver artifact would have produced 60 phantom movers).  Artifacts
  predating the ratio stamp pass the gate with a warning.
* A mover is a query whose wall changed by more than ``--threshold``
  (default 1.4x, the SCALING.md host-variance envelope) in EITHER
  direction AND by more than 0.5 s absolute — sub-second rows flap
  with scheduler jitter at any threshold.
* Exit non-zero iff there are unexplained slow movers, so the round
  checklist can gate on it; fast movers are listed FYI (they usually
  mean a fixture got warmer, which is worth knowing, not a failure).
"""

from __future__ import annotations

import json
import sys

CLEAN_RATIO_MAX = 2.0
ABS_FLOOR_SEC = 0.5


def _load(path: str) -> dict:
    with open(path) as fh:
        art = json.load(fh)
    if "queries" not in art:
        raise SystemExit(f"{path}: not a BENCH_DETAIL artifact (no 'queries')")
    return art


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    threshold = 1.4
    if "--threshold" in sys.argv:
        threshold = float(sys.argv[sys.argv.index("--threshold") + 1])
        args = [a for a in args if a != str(threshold)]
    if len(args) != 2:
        print(__doc__)
        return 2
    old, new = _load(args[0]), _load(args[1])

    for path, art in ((args[0], old), (args[1], new)):
        ratio = art.get("insuite_isolated_ratio")
        if ratio is None:
            print(f"WARN {path}: no insuite_isolated_ratio stamp "
                  "(pre-r12 artifact or subset run) — contamination unknowable")
        elif ratio > CLEAN_RATIO_MAX:
            print(f"REFUSED: {path} is contention-contaminated "
                  f"(insuite_isolated_ratio {ratio} > {CLEAN_RATIO_MAX}; "
                  f"loadavg {art.get('loadavg_before')}→{art.get('loadavg_after')}) "
                  "— re-run the bench on an idle host before comparing")
            return 3
        if art.get("only"):
            print(f"WARN {path}: partial artifact (only={art['only']}) — "
                  "missing queries are skipped, totals not comparable")

    qo, qn = old["queries"], new["queries"]
    common = [k for k in qn if k in qo]
    slow, fast = [], []
    for k in common:
        a, b = qo[k], qn[k]
        if min(a, b) <= 0 or abs(b - a) < ABS_FLOOR_SEC:
            continue
        if b > a * threshold:
            slow.append((b / a, k, a, b))
        elif a > b * threshold:
            fast.append((a / b, k, a, b))
    for tag, movers in (("SLOWER", sorted(slow, reverse=True)),
                        ("faster", sorted(fast, reverse=True))):
        for r, k, a, b in movers:
            print(f"{tag} {r:5.2f}x  {k}: {a:.3f} -> {b:.3f} s")
    print(f"\n{len(common)} compared "
          f"({len(qn) - len(common)} new, {len(qo) - len(common)} dropped), "
          f"{len(slow)} slower / {len(fast)} faster beyond {threshold}x "
          f"(+{ABS_FLOOR_SEC}s floor); "
          f"suite {old.get('suite_total_sec')} -> {new.get('suite_total_sec')} s")
    return 1 if slow else 0


if __name__ == "__main__":
    sys.exit(main())
