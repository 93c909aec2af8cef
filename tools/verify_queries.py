#!/usr/bin/env python
"""Oracle-verify a subset of declared queries on a VANILLA session (the
grading driver's flow), at one or more scale factors.

Usage: python tools/verify_queries.py [-sf 0.01,0.1] query [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    sfs = ["0.01"]
    if args and args[0] == "-sf":
        sfs = args[1].split(",")
        args = args[2:]
    from pyspark.sql import SparkSession

    import __spark_entry__ as mod
    from tests.oracle_utils import compare

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .appName("verify_queries")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs, oracles = mod.queries(), mod.oracle_sql()
    fails = []
    for sf in sfs:
        sf_dir = f"/root/testdata/sf{sf}"
        for name in args:
            d = qs[name](spark, sf_dir)
            if name in oracles:
                ok, msg = compare(d, oracles[name], sf_dir)
                print(f"sf{sf} {name}: {'OK' if ok else 'FAIL ' + str(msg)}")
                if not ok:
                    fails.append((sf, name, msg))
            else:
                n = d.count()
                print(f"sf{sf} {name}: no oracle, count={n}")
    print("FAILURES:", fails or "none")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
