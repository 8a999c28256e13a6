#!/usr/bin/env python3
"""Dump .explain("formatted") for named queries to plans/r13/<q>_<tag>.txt.

Usage: python tools/dump_plans_r13.py before q1 q2 ...
       python tools/dump_plans_r13.py after q1 q2 ...
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    tag = sys.argv[1]
    names = sys.argv[2:]
    import __spark_entry__ as e
    from oracdc_spark.session import get_spark

    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    out_dir = os.path.join(REPO, "plans", "r13")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qs[name](spark, SF_DIR)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        n_ex = txt.count("Exchange")
        n_py = txt.count("EvalPython") + txt.count("MapInPandas") + txt.count("ArrowEval")
        print(f"{name}: {len(txt)} chars, Exchange={n_ex}, PyNodes={n_py} -> {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
