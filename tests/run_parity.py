"""Ad-hoc runner: python tests/run_parity.py [sf_dir] [query ...]"""

import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

from tests.parity import compare, register_duck_views


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    import __spark_entry__ as e
    from oracdc_spark.session import get_spark

    spark = get_spark("parity", shuffle_partitions=8)
    con = duckdb.connect()
    register_duck_views(con, sf_dir)
    qs = e.queries()
    oracles = e.oracle_sql()
    names = sys.argv[2:] or list(qs)
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        fn = qs[name]
        t0 = time.time()
        try:
            if name not in oracles:
                cnt = fn(spark, sf_dir).count()
                print(f"ROWS-ONLY {name}: {cnt} rows ({time.time()-t0:.1f}s)")
                n_rowsonly += 1
                continue
            r = compare(spark, con, fn, oracles[name], sf_dir)
            ok = r["values_match"]
            if ok:
                n_pass += 1
                print(f"PASS {name}: {r['spark_rows']} rows ({time.time()-t0:.1f}s)")
            else:
                n_fail += 1
                print(f"FAIL {name}: {r}")
        except Exception as ex:
            n_fail += 1
            print(f"ERROR {name}: {type(ex).__name__}: {str(ex)[:500]}")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
