#!/usr/bin/env python3
"""Run `bench.py` for a query list and report wall AND process-tree CPU
seconds (user+sys of the bench child and every descendant it reaped).

CPU seconds are robust to external host contention (a noisy neighbor
inflates wall but not this process tree's CPU), so A/B decisions during
the optimization round use this when the host is noisy.

Usage: python tools/cpu_probe.py [--warm] q1,q2,...
"""

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    args = sys.argv[1:]
    warm = "--warm" in args
    args = [a for a in args if not a.startswith("--")]
    only = args[0] if args else "r1"
    env = dict(os.environ, SPARK_GRAFT_BENCH_ONLY=only)
    if warm:
        env["SPARK_GRAFT_BENCH_WARM"] = "1"
    t0 = time.time()
    pid = os.fork()
    if pid == 0:
        out = open("/tmp/cpu_probe_out.txt", "w")
        dn = open("/dev/null", "w")
        os.dup2(out.fileno(), 1)
        os.dup2(dn.fileno(), 2)
        os.execv(sys.executable, [sys.executable, os.path.join(REPO, "bench.py")])
    _, status, ru = os.wait4(pid, 0)
    wall = time.time() - t0
    print(
        f"rc={os.waitstatus_to_exitcode(status)} wall={wall:.1f}s "
        f"cpu={ru.ru_utime + ru.ru_stime:.1f}s (u={ru.ru_utime:.1f} s={ru.ru_stime:.1f})"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
