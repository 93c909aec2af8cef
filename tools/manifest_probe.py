"""Manifest-scale probe: per-commit cost and page-scan latency vs
fragment count (the round-8 verdict's done-criterion for the
log-structured manifest).

Drives REAL interactive appends (minor compaction disabled so every
commit leaves its fragment — the adversarial shape) to 1k / 10k / 100k
fragments and records, at each decade:

* per-commit latency percentiles over the last window (the commit now
  publishes ONE delta record + a pointer — O(1) — plus an amortized
  paged checkpoint every K commits),
* what the round-7 design would have paid at the same file count
  (measured: serializing the full N-entry file list per commit),
* scan_rows 1000-event page latency, warm (live mirror) and cold
  (fresh open: pointer → checkpoint page metas → only overlapped pages
  load),
* cold-open positioning cost and pointer size.

No Spark session: the probe exercises exactly the driver-side commit
and serving paths (pyarrow fragment write, manifest chain, pointer,
footer-free page pruning). Usage:

    python tools/manifest_probe.py [--frags 100000] [--out BASELINE_row]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eventlog_spark.log import EventLog  # noqa: E402


# The interactive commit/serving paths never touch Spark (driver-side
# pyarrow writes, manifest chain, footer pruning), so the probe opens
# the engine with spark=None and measures exactly those paths.


def _pcts(xs: list[float]) -> dict:
    xs = sorted(xs)
    return {
        "p50_ms": round(1e3 * xs[len(xs) // 2], 3),
        "p99_ms": round(1e3 * xs[int(len(xs) * 0.99)], 3),
        "max_ms": round(1e3 * xs[-1], 3),
    }


def probe(total_frags: int) -> list[dict]:
    root = tempfile.mkdtemp(prefix="manifest_probe_")
    path = os.path.join(root, "log")
    results: list[dict] = []
    try:
        log = EventLog.create(None, path)
        log.MINOR_COMPACT_FRAGMENTS = 0  # keep every fragment — worst case
        decades = [d for d in (1_000, 10_000, 100_000) if d <= total_frags]
        window: list[float] = []
        done = 0
        for target in decades:
            window.clear()
            while done < target:
                t0 = time.perf_counter()
                log.append(f"probe-{done}", f'{{"i":{done}}}')
                window.append(time.perf_counter() - t0)
                done += 1
            head = log.version()

            # what round 7 paid per commit at this file count: one full
            # file-list JSON serialize + atomic rename
            names = log._manifest_files()
            t0 = time.perf_counter()
            tmp = os.path.join(root, "legacy_state.json")
            with open(tmp, "w") as f:
                json.dump({"latest_version": head, "files": names}, f)
            legacy_ms = 1e3 * (time.perf_counter() - t0)

            # warm page scan: head page and a middle page
            t0 = time.perf_counter()
            rows = log.scan_rows(version=head, reverse=True, limit=1000)
            warm_head_ms = 1e3 * (time.perf_counter() - t0)
            assert len(rows) == min(1000, head)
            t0 = time.perf_counter()
            rows = log.scan_rows(version=head // 2, limit=1000)
            warm_mid_ms = 1e3 * (time.perf_counter() - t0)
            assert len(rows) == min(1000, head - head // 2 + 1)

            # cold: a fresh open (pointer → checkpoint metas; pages lazy)
            t0 = time.perf_counter()
            cold = EventLog.open(None, path)
            cold_open_ms = 1e3 * (time.perf_counter() - t0)
            t0 = time.perf_counter()
            rows = cold.scan_rows(version=head, reverse=True, limit=1000)
            cold_head_ms = 1e3 * (time.perf_counter() - t0)
            assert len(rows) == min(1000, head)
            pages_touched = len(cold._manifest._page_cache)

            results.append(
                {
                    "fragments": done,
                    "commit": _pcts(window[-1000:]),
                    "legacy_full_list_publish_ms": round(legacy_ms, 3),
                    "scan_rows_1000_warm_head_ms": round(warm_head_ms, 2),
                    "scan_rows_1000_warm_mid_ms": round(warm_mid_ms, 2),
                    "cold_open_ms": round(cold_open_ms, 2),
                    "scan_rows_1000_cold_head_ms": round(cold_head_ms, 2),
                    "cold_pages_touched": pages_touched,
                    "pointer_bytes": os.path.getsize(
                        os.path.join(path, "_state.json")
                    ),
                }
            )
            print(json.dumps(results[-1]), flush=True)
        return results
    finally:
        shutil.rmtree(root, ignore_errors=True)


def probe_labels(total_frags: int, n_labels: int) -> dict:
    """Label data-skipping probe (round 8): round-robin single-label
    commits, then measure how many fragments a label scan would open
    (``label_candidate_files`` — the exact pruning ``scan(label=...)``
    applies) and what the candidate computation costs. Expected: each
    label's candidates == total/n_labels (bounds+bloom are exact for
    interactive commits), an absent label prunes to 0."""
    root = tempfile.mkdtemp(prefix="manifest_lbl_probe_")
    path = os.path.join(root, "log")
    try:
        log = EventLog.create(None, path)
        log.MINOR_COMPACT_FRAGMENTS = 0
        for i in range(total_frags):
            log.append(f"label-{i % n_labels}", f'{{"i":{i}}}')
        t0 = time.perf_counter()
        cands = log.label_candidate_files(f"label-0")
        cand_ms = 1e3 * (time.perf_counter() - t0)
        t0 = time.perf_counter()
        absent = log.label_candidate_files("label-absent")
        absent_ms = 1e3 * (time.perf_counter() - t0)
        # serving path: a 1000-row label page driver-side (scan_rows
        # with label pruning — no Spark), and the absent-label page
        # (zero fragments opened)
        t0 = time.perf_counter()
        page = log.scan_rows(label="label-0", limit=1000)
        page_ms = 1e3 * (time.perf_counter() - t0)
        assert len(page) == min(1000, total_frags // n_labels)
        assert all(r.label == "label-0" for r in page)
        t0 = time.perf_counter()
        assert log.scan_rows(label="label-absent") == []
        absent_page_ms = 1e3 * (time.perf_counter() - t0)
        row = {
            "probe": "label_skipping",
            "fragments": total_frags,
            "labels": n_labels,
            "candidates_one_label": len(cands),
            "candidates_absent_label": len(absent),
            "prune_ratio": round(len(cands) / total_frags, 4),
            "candidate_calc_ms": round(cand_ms, 2),
            "absent_calc_ms": round(absent_ms, 2),
            "scan_rows_label_page_1000_ms": round(page_ms, 2),
            "scan_rows_absent_label_ms": round(absent_page_ms, 2),
        }
        print(json.dumps(row), flush=True)
        return row
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--frags", type=int, default=100_000)
    ap.add_argument("--labels", type=int, default=0,
                    help="run the label data-skipping probe with this many labels")
    args = ap.parse_args()
    if args.labels:
        probe_labels(args.frags, args.labels)
    else:
        rows = probe(args.frags)
        print(json.dumps({"probe": "manifest_scale", "rows": rows}))
