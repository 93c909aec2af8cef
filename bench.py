#!/usr/bin/env python
"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Execution is forced with the noop sink (full materialization, no driver
collect). First run of each query includes JVM/codegen warmup; a tiny
warmup query runs first so session startup isn't billed to q1.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from eventlog_spark.queries import REGISTRY, _ensure_loaded
from eventlog_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def sf_of(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> None:
    _ensure_loaded()
    spark = get_spark(app_name="eventlog_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: session + codegen + parquet footer caches
    spark.read.parquet(os.path.join(SF_DIR, "nation.parquet")).count()

    timings: dict[str, float] = {}
    for name, spec in sorted(REGISTRY.items()):
        t0 = time.monotonic()
        df = spec.fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.monotonic() - t0, 3)

    total = round(sum(timings.values()), 3)
    doc = {
        "metric": "query_suite_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_of(SF_DIR),
        "n_queries": len(timings),
    }
    line = json.dumps(doc)
    # full per-query record also lands on disk — the driver's stdout
    # `tail` capture truncated 20 queries out of BENCH_r01
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_local.json"), "w") as f:
        f.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
