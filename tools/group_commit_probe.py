#!/usr/bin/env python
"""Group-commit throughput rehearsal: interactive append rate vs
concurrent-producer count.

Round-11 verdict ("What's missing" #3): the wide-payload probe pinned
the single-producer interactive append floor at ~6 MiB/s — the
per-op commit protocol (fragment + fsync + manifest delta + pointer
publish), not bytes. The reference's in-process mutex batches
concurrent appenders implicitly; the round-12 group commit is the
explicit analog: callers that arrive while a commit section is in
flight coalesce into the NEXT section, so N producers pay ~1/N
sections per append. This probe measures exactly that claim:

  * one producer, P producers (default 8), each appending the same
    deterministic ~64 KiB payloads (the wide-probe's chained-hash
    filler, so parquet compresses it like real data);
  * per-configuration: appends/s, payload MiB/s, commit sections
    executed, ops/section (the coalescing factor);
  * correctness gate inline: dense versions, every ack distinct,
    ops == acks (the storm must not trade exactness for speed).

The verdict's acceptance bar: >= 4x the single-producer MiB/s at 8
producers. Prints ONE JSON line {"probe": "group_commit", ...}.

Usage: python tools/group_commit_probe.py [n_each] [payload_bytes]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eventlog_spark.log import EventLog

_ENVELOPE = len('{"pad":""}')


def _payload(size: int, seed: int) -> str:
    """Chained-hash filler (see wide_payload_probe._payload): real
    ~2x compressibility, deterministic across rounds."""
    import hashlib

    n = size - _ENVELOPE
    blocks: list[str] = []
    h = hashlib.sha256(str(seed).encode()).hexdigest()
    for _ in range(n // 64 + 1):
        blocks.append(h)
        h = hashlib.sha256(h.encode()).hexdigest()
    return '{"pad":"' + ("".join(blocks))[:n] + '"}'


def run(producers: int, n_each: int, size: int) -> dict:
    d = tempfile.mkdtemp(prefix="gcprobe-", dir="/tmp")
    path = os.path.join(d, "log")
    log = EventLog.create(None, path)
    payloads = [_payload(size, s) for s in range(8)]  # reuse, hashing is not the subject
    acks: list[list[int]] = [[] for _ in range(producers)]
    errs: list[Exception] = []
    start_gate = threading.Barrier(producers + 1)

    def work(w: int) -> None:
        try:
            start_gate.wait()
            for i in range(n_each):
                r = log.append(f"w{w}", payloads[(w + i) % len(payloads)])
                acks[w].append(r.version)
        except Exception as e:  # pragma: no cover - surfaced in JSON
            errs.append(e)

    threads = [threading.Thread(target=work, args=(w,)) for w in range(producers)]
    for t in threads:
        t.start()
    start_gate.wait()
    t0 = time.monotonic()
    for t in threads:
        t.join()
    dt = time.monotonic() - t0

    total = producers * n_each
    flat = [v for a in acks for v in a]
    ok = (
        not errs
        and sorted(flat) == list(range(1, total + 1))
        and log.version() == total
    )
    out = {
        "producers": producers,
        "n_each": n_each,
        "payload_bytes": size,
        "ok": ok,
        "sec": round(dt, 3),
        "appends_per_s": round(total / dt, 1),
        "payload_mib_per_s": round(total * size / dt / 2**20, 2),
        "commit_sections": log._gc_commits,
        "ops_per_section": round(log._gc_ops / max(log._gc_commits, 1), 2),
    }
    if errs:
        out["err"] = repr(errs[0])
    import shutil

    shutil.rmtree(d, ignore_errors=True)
    return out


R11_FLOOR_MIB_S = 6.0  # the wide-payload probe's round-11 single-producer
# floor (BASELINE.md) — the number the round-11 verdict's >=4x target names


def main() -> None:
    n_each = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 64 * 1024
    # steady-state warmup OUTSIDE the timed windows (the bench-protocol
    # convention): the one-time arrow/pandas import and the lazy hash
    # pool spawn otherwise bill ~0.8 s to whichever configuration runs
    # first past the pool threshold
    import pandas  # noqa: F401
    from eventlog_spark.sources.binformat import checksum_rows

    checksum_rows([(1, 0, 1, "w", _payload(size, 0))] * 4)
    single = run(1, n_each, size)
    multi = run(8, max(n_each // 2, 20), size)
    speedup = round(
        multi["payload_mib_per_s"] / max(single["payload_mib_per_s"], 1e-9), 2
    )
    vs_floor = round(multi["payload_mib_per_s"] / R11_FLOOR_MIB_S, 2)
    doc = {
        "probe": "group_commit",
        "single": single,
        "producers8": multi,
        "mib_speedup_8p": speedup,
        "mib_vs_r11_floor": vs_floor,
        "target_met_4x_floor": bool(
            vs_floor >= 4.0 and single["ok"] and multi["ok"]
        ),
    }
    print(json.dumps(doc))


if __name__ == "__main__":
    main()
