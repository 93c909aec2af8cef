#!/usr/bin/env python
"""ANN artifact lifecycle probe: split TRAIN / OPEN / STEADY cost.

Round-10 verdict ("What's wrong" #2): ann_ivf_pq's warm first-run cost
drifted 6.6 -> 9.4 s across rounds at sf0.1 — reproducibly, in a fresh
session with a WARM artifact warehouse — and the attribution (persisted
artifact open + first-query codegen, not training and not suite noise)
was adjudicated by hand each round. This probe makes the attribution a
measurement:

  TRAIN  = first call in a fresh session with an EMPTY artifact dir —
           pays codebook/bucket training + persist + the query.
  OPEN   = first call in a NEW session with the WARM artifact dir —
           pays artifact table open + plan codegen + the query. This
           is exactly the number the per-round driver bench reports
           for artifact-bearing rows (each bench run is one fresh
           session over the standing `.artifacts/` warehouse).
  STEADY = second call in that same warm session — the serving cost.

Each phase runs in its own subprocess (a session cannot be un-warmed
in-process). One JSON line per run:
  {"probe": "ann_artifact", "sf": ..., "queries": {name:
      {"train": s, "open": s, "steady": s}}, "budget_sec": B,
   "over_budget": [names]}

``--budget SECONDS`` (default 12, ~1.8x the r10 observation) flags any
OPEN phase exceeding it — the drift alarm the verdict asked to pin:
two more rounds of the 6.6 -> 9.4 s direction would cross 2x the r9
record and this probe catches it before the bench diff does.

Run: python tools/ann_artifact_probe.py [sf_dir] [--budget S] [name ...]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# the artifact-bearing rows the round-over-round bench diffs flag
DEFAULT = ["ann_ivf_pq", "ann_ivf_pq_residual", "ann_lsh_bucketed"]

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, sys.argv[1])
sf_dir, name = sys.argv[2], sys.argv[3]
from pyspark.sql import SparkSession
spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
from eventlog_spark.queries import REGISTRY, _ensure_loaded
_ensure_loaded()
fn = REGISTRY[name].fn
t0 = time.monotonic()
fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
t1 = time.monotonic()
fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
t2 = time.monotonic()
print("RESULT:" + json.dumps({"first": t1 - t0, "second": t2 - t1}))
"""


def _run_child(sf_dir: str, name: str, artifacts: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_ARTIFACTS=artifacts)
    out = subprocess.run(
        [sys.executable, "-c", _CHILD, REPO, sf_dir, name],
        capture_output=True,
        text=True,
        env=env,
        timeout=900,
    )
    if out.returncode != 0:
        raise RuntimeError(f"{name} child failed:\n{out.stderr[-2000:]}")
    (line,) = [l for l in out.stdout.splitlines() if l.startswith("RESULT:")]
    return json.loads(line[len("RESULT:"):])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument("--budget", type=float, default=12.0)
    ap.add_argument("names", nargs="*", default=None)
    args = ap.parse_args()
    names = args.names or DEFAULT

    results: dict = {}
    over: list[str] = []
    for name in names:
        art = tempfile.mkdtemp(prefix="annprobe-")
        try:
            # fresh dir: first call trains + persists (+ queries)
            cold = _run_child(args.sf_dir, name, art)
            # NEW session, same dir: first call = artifact OPEN cost
            warm = _run_child(args.sf_dir, name, art)
            results[name] = {
                "train": round(cold["first"], 2),
                "open": round(warm["first"], 2),
                "steady": round(warm["second"], 2),
            }
            if warm["first"] > args.budget:
                over.append(name)
            print(f"# {name}: {results[name]}", file=sys.stderr)
        finally:
            shutil.rmtree(art, ignore_errors=True)
    print(
        json.dumps(
            {
                "probe": "ann_artifact",
                "sf_dir": args.sf_dir,
                "queries": results,
                "budget_sec": args.budget,
                "over_budget": over,
            }
        )
    )
    if over:
        sys.exit(1)


if __name__ == "__main__":
    main()
