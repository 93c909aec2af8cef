#!/usr/bin/env python
"""Time a subset of registry queries with the bench methodology (noop
sink), N passes in one session, printing per-pass seconds. For
optimization A/B work where the full-suite run is too noisy/slow.

Usage: python tools/mini_bench.py [-n PASSES] query [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eventlog_spark.queries import REGISTRY, _ensure_loaded
from eventlog_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    args = sys.argv[1:]
    passes = 2
    if args and args[0] == "-n":
        passes = int(args[1])
        args = args[2:]
    _ensure_loaded()
    spark = get_spark(app_name="eventlog_spark_minibench")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(SF_DIR, "nation.parquet")).count()
    results: dict[str, list[float]] = {q: [] for q in args}
    for p in range(passes):
        for name in args:
            spec = REGISTRY[name]
            spark.sparkContext.setJobDescription(f"{name} pass{p}")
            t0 = time.monotonic()
            df = spec.fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            results[name].append(round(time.monotonic() - t0, 3))
            spark.sparkContext.setJobDescription(None)
    for name, ts in results.items():
        print(f"{name}: {ts}")


if __name__ == "__main__":
    main()
