#!/usr/bin/env python
"""ANN artifact lifecycle probe: split TRAIN / OPEN / STEADY cost.

Round-10 verdict ("What's wrong" #2): ann_ivf_pq's warm first-run cost
drifted 6.6 -> 9.4 s across rounds at sf0.1 — reproducibly, in a fresh
session with a WARM artifact warehouse — and the attribution (persisted
artifact open + first-query codegen, not training and not suite noise)
was adjudicated by hand each round. This probe makes the attribution a
measurement, reproducing the driver-bench condition exactly:

  TRAIN  = first call per query in a fresh session over an EMPTY
           shared artifact dir, queries in bench (alphabetical) order —
           pays codebook/bucket training + persist + the query. Later
           queries reuse earlier bundles exactly as the suite does.
  OPEN   = first call per query in a NEW warmed session over that now
           WARM artifact dir — pays the marginal artifact table open +
           plan codegen + the query. This is the number the per-round
           driver bench reports for artifact-bearing rows (each bench
           run is one fresh session over the standing `.artifacts/`).
  STEADY = second call in the warm session — the serving cost.

Both phases run in their own subprocess (a session cannot be un-warmed
in-process) using the same tuned session + warmup as bench.py. One
JSON line per run:
  {"probe": "ann_artifact", "queries": {name:
      {"train": s, "open": s, "steady": s}}, "budget_sec": B,
   "over_budget": [names]}

``--budget SECONDS`` (default 15) flags any OPEN exceeding it — the
drift alarm the verdict asked to pin. Calibration (2026-08-16,
uncontended local[32]): opens measured 11.5 / 8.0 / 1.4 s for
ivf_pq / residual / lsh, tracking the r10 driver's 9.4 / 7.7 s with
~+2 s of probe-session overhead; 15 s is the probe-side equivalent of
2x the r9 driver record (6.6 s) — the line the verdict said the drift
must not cross unnoticed.

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

# the artifact-bearing rows the round-over-round bench diffs flag, in
# bench (alphabetical) order so bundle reuse matches the suite
DEFAULT = ["ann_ivf_pq", "ann_ivf_pq_residual", "ann_lsh_bucketed"]

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, sys.argv[1])
sf_dir = sys.argv[2]
names = sys.argv[3].split(",")
from eventlog_spark.queries import REGISTRY, _ensure_loaded
from eventlog_spark.session import get_spark
_ensure_loaded()
spark = get_spark(app_name="ann_artifact_probe")
spark.sparkContext.setLogLevel("ERROR")
# bench.py's warmup: session + codegen + parquet footer caches, so the
# first timed query is not billed session bootstrap
spark.read.parquet(os.path.join(sf_dir, "nation.parquet")).count()
out = {}
for name in names:
    fn = REGISTRY[name].fn
    t0 = time.monotonic()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    t1 = time.monotonic()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    t2 = time.monotonic()
    out[name] = {"first": t1 - t0, "second": t2 - t1}
print("RESULT:" + json.dumps(out))
"""


def _run_child(sf_dir: str, names: list[str], artifacts: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_ARTIFACTS=artifacts)
    out = subprocess.run(
        [sys.executable, "-c", _CHILD, REPO, sf_dir, ",".join(names)],
        capture_output=True,
        text=True,
        env=env,
        timeout=1800,
    )
    if out.returncode != 0:
        raise RuntimeError(f"probe child failed:\n{out.stderr[-2000:]}")
    (line,) = [l for l in out.stdout.splitlines() if l.startswith("RESULT:")]
    return json.loads(line[len("RESULT:"):])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument("--budget", type=float, default=15.0)
    ap.add_argument("names", nargs="*", default=None)
    args = ap.parse_args()
    names = args.names or DEFAULT

    art = tempfile.mkdtemp(prefix="annprobe-")
    try:
        cold = _run_child(args.sf_dir, names, art)  # trains + persists
        warm = _run_child(args.sf_dir, names, art)  # marginal opens
    finally:
        shutil.rmtree(art, ignore_errors=True)

    results = {
        n: {
            "train": round(cold[n]["first"], 2),
            "open": round(warm[n]["first"], 2),
            "steady": round(warm[n]["second"], 2),
        }
        for n in names
    }
    over = [n for n in names if results[n]["open"] > args.budget]
    for n in names:
        print(f"# {n}: {results[n]}", file=sys.stderr)
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
