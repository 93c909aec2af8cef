"""Subscription fan-out stress (r7 verdict item 4): many concurrent
REAL subscribers — RFC 6455 websockets + HTTP long-polls — against an
append burst.

The reference's design point for its broadcast hub (broadcast.go:19-56)
is many listeners with drop-if-slow; through round 7 the hub and ws
server were tested with a handful. This drives the real serving stack
(ThreadingHTTPServer, one thread per connection; wsclient.py sockets)
with N subscribers, fires a burst of commits, and measures:

* convergence — EVERY subscriber's last observed head == the final
  head (latest-wins conflation may skip intermediates, never the end),
* fan-out latency — burst-end → last subscriber converged,
* leak check — file descriptors and threads return to baseline after
  teardown, and the hub's subscriber map drains to zero.

Usage:  python tools/fanout_stress.py [--ws 600] [--poll 400] [--appends 100]
Library: run_stress(...) — the pytest twin calls this
(tests/test_serving.py::test_fanout_1k_subscribers).
"""

from __future__ import annotations

import http.client
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eventlog_spark.log import EventLog  # noqa: E402
from eventlog_spark.serving import serve  # noqa: E402
from eventlog_spark.wsclient import WSSubscription  # noqa: E402


def _fd_count() -> int:
    try:
        return len(os.listdir("/proc/self/fd"))
    except FileNotFoundError:  # pragma: no cover - non-Linux
        return 0


def run_stress(
    log_dir: str, n_ws: int = 600, n_poll: int = 400, n_appends: int = 100
) -> dict:
    log = EventLog.create(None, log_dir)
    log.append("seed", '{"seed":1}')  # non-empty so scans are legal
    srv = serve(log, port=0)
    host, port = srv.server_address
    final = 1 + n_appends

    results: dict[int, int] = {}  # subscriber id -> last head observed
    converge_at: dict[int, float] = {}
    errors: list[str] = []
    ready = threading.Barrier(n_ws + n_poll + 1, timeout=180)
    lock = threading.Lock()

    def ws_sub(i: int) -> None:
        try:
            with WSSubscription(host, port, timeout=120.0) as sub:
                head = sub.recv_version()  # greeting: current head
                ready.wait()
                while head is not None and head < final:
                    head = sub.recv_version()
                with lock:
                    results[i] = head if head is not None else -1
                    converge_at[i] = time.monotonic()
        except Exception as e:  # noqa: BLE001 — the test's subject
            with lock:
                errors.append(f"ws{i}: {e!r}")
            try:
                ready.wait()
            except Exception:
                pass

    def poll_sub(i: int) -> None:
        try:
            conn = http.client.HTTPConnection(host, port, timeout=120)
            known = 1
            first = True
            while known < final:
                conn.request(
                    "GET", f"/subscription?known={known:x}&timeout=60"
                )
                if first:
                    # the long-poll is parked server-side now
                    first = False
                    ready.wait()
                resp = conn.getresponse()
                body = resp.read()
                if resp.status == 200:
                    known = int(body.decode(), 16)
                elif resp.status != 204:
                    raise ConnectionError(f"status {resp.status}")
            conn.close()
            with lock:
                results[n_ws + i] = known
                converge_at[n_ws + i] = time.monotonic()
        except Exception as e:  # noqa: BLE001
            with lock:
                errors.append(f"poll{i}: {e!r}")
            try:
                ready.wait()
            except Exception:
                pass

    threads = [
        threading.Thread(target=ws_sub, args=(i,), daemon=True)
        for i in range(n_ws)
    ] + [
        threading.Thread(target=poll_sub, args=(i,), daemon=True)
        for i in range(n_poll)
    ]
    # staggered start: ThreadingHTTPServer's accept backlog is small,
    # a 1000-connection instant is not the shape being tested
    for i, t in enumerate(threads):
        t.start()
        if i % 64 == 63:
            time.sleep(0.05)
    ready.wait()  # every subscriber is connected and parked

    t0 = time.monotonic()
    for k in range(n_appends):
        log.append(f"burst{k}", json.dumps({"k": k}))
    burst_end = time.monotonic()

    for t in threads:
        t.join(timeout=120)
    alive = [t for t in threads if t.is_alive()]

    latency = (
        max(converge_at.values()) - burst_end if converge_at else float("nan")
    )
    # server-side reap is asynchronous (ws handlers notice the client's
    # close frame on their next 0.25 s poll tick): give the hub a
    # bounded drain window before reading the leak counter
    drain_deadline = time.monotonic() + 10
    while log._hub._subs and time.monotonic() < drain_deadline:
        time.sleep(0.05)
    out = {
        "subscribers": n_ws + n_poll,
        "appends": n_appends,
        "converged": sum(1 for v in results.values() if v == final),
        "errors": errors[:10],
        "n_errors": len(errors),
        "still_alive_threads": len(alive),
        "burst_wall_s": round(burst_end - t0, 3),
        "fanout_latency_after_burst_s": round(latency, 3),
        "hub_subscribers_left": len(log._hub._subs),
    }
    srv.shutdown()
    srv.server_close()
    return out


if __name__ == "__main__":
    import argparse
    import tempfile

    ap = argparse.ArgumentParser()
    ap.add_argument("--ws", type=int, default=600)
    ap.add_argument("--poll", type=int, default=400)
    ap.add_argument("--appends", type=int, default=100)
    args = ap.parse_args()
    fd0, th0 = _fd_count(), threading.active_count()
    with tempfile.TemporaryDirectory() as td:
        r = run_stress(
            os.path.join(td, "log"), args.ws, args.poll, args.appends
        )
    time.sleep(1.0)  # teardown drain
    r["fd_delta_after"] = _fd_count() - fd0
    r["thread_delta_after"] = threading.active_count() - th0
    print(json.dumps(r))
