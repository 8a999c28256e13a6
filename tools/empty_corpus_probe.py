#!/usr/bin/env python3
"""Empty-corpus definedness probe over every declared query.

Runs all `queries()` entries against a VALID-but-empty dataset (all
ten tables at zero rows, schemas copied from sf0.001) and classifies
the outcome:

* clean — returns its empty/zero-row shape (NULL for undefined
  ratios, never an ANSI divide-by-zero);
* precondition — raises the named audit/training precondition (the
  five planted/training audits: you cannot train codebooks on, or
  plant twins into, zero rows — COVERAGE.md r10 disposition);
* OTHER — anything else, which is a defect of the r9 funnel/census
  class and should be fixed.

Expected steady state (r10): 256 clean / 5 preconditions / 0 other.

Usage: python tools/empty_corpus_probe.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> int:
    import duckdb

    import __spark_entry__ as e
    from oracdc_spark.session import get_spark

    src = os.environ.get("SPARK_GRAFT_SCHEMA_SF", "/root/testdata/sf0.001")
    with tempfile.TemporaryDirectory(prefix="oracdc_empty_") as d:
        con = duckdb.connect()
        for t in TABLES:
            con.sql(
                f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet') LIMIT 0)"
                f" TO '{d}/{t}.parquet' (FORMAT PARQUET)"
            )
        spark = get_spark("emptyprobe", shuffle_partitions=4)
        spark.sparkContext.setLogLevel("ERROR")
        clean, precond, other = [], [], []
        for name, fn in e.queries().items():
            try:
                fn(spark, d).collect()
                clean.append(name)
            except Exception as ex:  # noqa: BLE001 — classifying outcomes
                msg = str(ex)
                if "precondition" in msg or "training sample is empty" in msg:
                    precond.append(name)
                else:
                    other.append((name, type(ex).__name__, msg.splitlines()[0][:160]))
        print(f"CLEAN {len(clean)}")
        print(f"PRECOND {len(precond)} {precond}")
        print(f"OTHER {len(other)}")
        for o in other:
            print("  ", o)
        return 1 if other else 0


if __name__ == "__main__":
    sys.exit(main())
