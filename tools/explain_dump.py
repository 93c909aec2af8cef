#!/usr/bin/env python
"""Dump `.explain("formatted")` for named registry queries to files.

Usage: python tools/explain_dump.py <outdir> <suffix> [query ...]

Writes <outdir>/<query>_<suffix>.txt for each named query (all queries
when none are named). Used to record the round-12 optimization
before/after plan evidence under plans/r12/.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eventlog_spark.queries import REGISTRY, _ensure_loaded
from eventlog_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    _ensure_loaded()
    if not names:
        names = list(REGISTRY)
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app_name="eventlog_spark_explain")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        spec = REGISTRY[name]
        df = spec.fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}_{suffix}.txt ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
