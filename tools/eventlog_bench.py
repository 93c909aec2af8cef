#!/usr/bin/env python
"""Reference-harness parity bench: run the SAME workload shapes as the
reference's benchmark suite against OUR engine and print measured
throughput (the reference publishes no numbers — BASELINE.md §1 records
its harness definitions only, so these are the numbers the acceptance
bar "match-or-beat single-node throughput" is judged against).

Mirrored harnesses (source: /root/reference/bench/bench_test.go and
/root/reference/internal/{hex,jsonminify}):

1. HTTP append, single event  — the reference's ~128 B JSON payload +
   14 B label ("BenchmarkEvent"), one HTTP POST per append over a
   loopback server (`bench_test.go:78-101`).
2. HTTP OCC append (`AppendCheck`) — assumed-version chained from the
   previous ack, exactly the reference loop (`bench_test.go:103-136`).
3. HTTP full scan of 1000 events — client-side pagination included,
   count verified == 1000 per iteration (`bench_test.go:138-183`,
   scan batch cap 1000 like the reference server default).
4. hex uint64 encode/decode — `py_version_to_hex`/`py_hex_to_version`
   vs the stdlib formatting they wrap (`internal/hex/bench_test.go`).
5. JSON minify tiny/small/1MB — `validation.minify_json` on
   deterministic fixtures shaped like the reference's golden files
   (`internal/jsonminify/jsonminify_test.go:51-80`).

Durability note (apples-to-apples caveat, stated rather than hidden):
the reference benches its file engine with fsync PER APPEND; our
engine's interactive append is crash-consistent via atomic rename
(dot-prefixed landing file + rename, never a torn read) but does not
fsync each commit — the equivalent of the reference's non-synced mode.
Both sides do one full HTTP round-trip per op.

Usage: python tools/eventlog_bench.py [n_appends]
Prints ONE JSON line {"metric": "eventlog_bench", ...}.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the reference's exact bench payload and label (bench_test.go:81-89)
LABEL = "BenchmarkEvent"
PAYLOAD = """{
\t\t"example": "benchmark",
\t\t"foo": null,
\t\t"bar": 52.7775,
\t\t"baz": false,
\t\t"fazz": "4ff21935-b005-4bd3-936e-10d4692a8843"
\t}"""


def _rate(n: int, secs: float) -> dict:
    return {"ops": n, "sec": round(secs, 3), "ops_per_sec": round(n / secs, 1)}


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000

    from eventlog_spark.client import Client
    from eventlog_spark.functions.versioning import (
        py_hex_to_version,
        py_version_to_hex,
    )
    from eventlog_spark.log import EventLog
    from eventlog_spark.serving import serve
    from eventlog_spark.session import get_spark
    from eventlog_spark.validation import minify_json

    spark = get_spark(app_name="eventlog_bench")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"metric": "eventlog_bench", "n": n}

    with tempfile.TemporaryDirectory(prefix="elbench-") as tmp:
        log = EventLog.create(spark, os.path.join(tmp, "log"))
        srv = serve(log, port=0)
        clt = Client("127.0.0.1", srv.server_address[1])

        # 1. single-event append (one HTTP POST per op)
        t0 = time.monotonic()
        for _ in range(n):
            clt.append(LABEL, PAYLOAD)
        out["http_append"] = _rate(n, time.monotonic() - t0)

        # 2. OCC append chained on the previous ack's version
        ack = clt.append(LABEL, PAYLOAD)
        v = ack.version
        t0 = time.monotonic()
        for _ in range(n):
            v = clt.append_check(v, LABEL, PAYLOAD).version
        out["http_append_check"] = _rate(n, time.monotonic() - t0)

        # 2b. CONCURRENT append — 8 clients, each its own connection,
        # hammering the same server. The serving handlers run in
        # ThreadingHTTPServer threads, so their appends coalesce
        # through the round-12 group commit: sections/s stays flat as
        # client count grows, ops/section scales. (The reference's
        # bench suite has no concurrent-producer harness — its mutex
        # batches implicitly; this measures our explicit analog
        # through the full HTTP round-trip.)
        import threading

        n_cli = 8
        per = max(1, n // n_cli)
        gc0_commits, gc0_ops = log._gc_commits, log._gc_ops
        errs: list = []

        def hammer() -> None:
            try:
                c = Client("127.0.0.1", srv.server_address[1])
                for _ in range(per):
                    c.append(LABEL, PAYLOAD)
            except Exception as e:  # pragma: no cover - surfaced below
                errs.append(e)

        threads = [threading.Thread(target=hammer) for _ in range(n_cli)]
        t0 = time.monotonic()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        dt = time.monotonic() - t0
        if errs:
            raise AssertionError(errs)
        r = _rate(n_cli * per, dt)
        ops = log._gc_ops - gc0_ops
        commits = max(1, log._gc_commits - gc0_commits)
        r["clients"] = n_cli
        r["ops_per_section"] = round(ops / commits, 2)
        out["http_append_concurrent8"] = r

    with tempfile.TemporaryDirectory(prefix="elbench-") as tmp:
        # 3. scan 1000 events from a fresh log, paginated, count-checked
        log = EventLog.create(spark, os.path.join(tmp, "log"))
        srv = serve(log, port=0)
        clt = Client("127.0.0.1", srv.server_address[1])
        # genuinely 1000 single-append fragments: auto minor compaction
        # is disabled for this log so the fragmented rows below measure
        # the state they claim (the append bench above keeps it on —
        # that's the production path, folds amortized in)
        log.MINOR_COMPACT_FRAGMENTS = 0
        first = clt.append(LABEL, PAYLOAD).version
        for _ in range(999):
            clt.append(LABEL, PAYLOAD)

        def scan_bench(iters: int) -> dict:
            t0 = time.monotonic()
            for _ in range(iters):
                count = sum(1 for _ in clt.scan(first))
                if count != 1000:
                    raise AssertionError(f"unexpected number of events: {count}")
            dt = time.monotonic() - t0
            return {
                "iters": iters,
                "sec": round(dt, 3),
                "scans_per_sec": round(iters / dt, 2),
                "events_per_sec": round(iters * 1000 / dt, 1),
            }

        # three states of the same log: 1000 single-append fragments
        # cold (first page pays the footer-stat probe per fragment),
        # the same warm (fragment range + hot-tail row caches), and
        # after compact() (the maintained steady state: one fragment)
        out["http_scan_1k_fragmented_cold"] = scan_bench(1)
        out["http_scan_1k_fragmented_warm"] = scan_bench(max(2, n // 100))
        log.compact(target_partitions=1)
        out["http_scan_1k_compacted"] = scan_bench(max(2, n // 100))

    # 4. hex codec (the wire version encoding used on every route)
    m = 200_000
    t0 = time.monotonic()
    for i in range(m):
        py_version_to_hex(i)
    out["hex_encode"] = _rate(m, time.monotonic() - t0)
    hexes = [py_version_to_hex(i) for i in range(m)]
    t0 = time.monotonic()
    for h in hexes:
        py_hex_to_version(h)
    out["hex_decode"] = _rate(m, time.monotonic() - t0)

    # 5. JSON minify on reference-shaped fixtures (tiny / small / 1 MB)
    tiny = PAYLOAD
    small = json.dumps(
        {
            "users": [
                {"id": i, "name": f"user {i}", "tags": ["a", "b"], "ok": i % 2 == 0}
                for i in range(40)
            ]
        },
        indent=2,
    )
    row = {"k": "v" * 40, "n": 123456, "arr": list(range(20))}
    big = json.dumps({"rows": [row] * 4200}, indent=1)
    assert len(big) >= 1_000_000
    for name, doc, iters in (("tiny", tiny, 50_000), ("small", small, 5_000), ("1mb", big, 20)):
        t0 = time.monotonic()
        for _ in range(iters):
            minify_json(doc)
        dt = time.monotonic() - t0
        out[f"minify_{name}"] = {
            "iters": iters,
            "bytes": len(doc),
            "sec": round(dt, 3),
            "mb_per_sec": round(len(doc) * iters / dt / 1e6, 1),
        }

    print(json.dumps(out))


if __name__ == "__main__":
    main()
