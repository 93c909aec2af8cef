"""CLI mirroring the reference's command tree (cmd/eventlog/cli/cli.go:23-129:
``create | run | check | version`` + an ``inmem``-style ephemeral mode).

    python -m eventlog_spark.cli create  /path/to/log -m k:v -m k2:v2
    python -m eventlog_spark.cli run     /path/to/log --port 8080
    python -m eventlog_spark.cli run     --inmem --port 8080    (ephemeral)
    python -m eventlog_spark.cli check   /path/to/log
    python -m eventlog_spark.cli version /path/to/log
    python -m eventlog_spark.cli append  /path/to/log label '{"x":1}'
    python -m eventlog_spark.cli scan    /path/to/log [--from HEX] [-n N] [--reverse]
"""

from __future__ import annotations

import argparse
import json
import sys


def _parse_metadata(pairs: list[str]) -> dict[str, str]:
    meta = {}
    for p in pairs:
        if ":" not in p:
            raise SystemExit(f"invalid metadata flag {p!r}, expected key:value")
        k, v = p.split(":", 1)
        meta[k] = v
    return meta


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="eventlog-spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_create = sub.add_parser("create", help="create a new log (O22)")
    p_create.add_argument("path")
    p_create.add_argument("-m", action="append", default=[], help="metadata key:value")

    p_run = sub.add_parser("run", help="serve the HTTP API (O26)")
    p_run.add_argument("path", nargs="?")
    p_run.add_argument("--inmem", action="store_true", help="ephemeral log in a temp dir")
    p_run.add_argument("--host", default="127.0.0.1")
    p_run.add_argument("--port", type=int, default=8080)
    p_run.add_argument("-m", action="append", default=[], help="metadata (with --inmem)")

    p_check = sub.add_parser("check", help="integrity audit (O20)")
    p_check.add_argument("path")

    p_version = sub.add_parser("version", help="print head/initial version")
    p_version.add_argument("path")

    p_append = sub.add_parser("append", help="append one event")
    p_append.add_argument("path")
    p_append.add_argument("label")
    p_append.add_argument("payload")

    p_scan = sub.add_parser("scan", help="scan events as JSON lines")
    p_scan.add_argument("path")
    p_scan.add_argument("--from", dest="from_", default=None, help="hex start version")
    p_scan.add_argument("-n", type=int, default=0)
    p_scan.add_argument("--reverse", action="store_true")

    args = ap.parse_args(argv)

    from .log import EventLog
    from .session import get_spark

    spark = get_spark(app_name=f"eventlog_cli_{args.cmd}")
    spark.sparkContext.setLogLevel("ERROR")

    if args.cmd == "create":
        EventLog.create(spark, args.path, metadata=_parse_metadata(args.m))
        print(f"created {args.path}")
        return 0

    if args.cmd == "run":
        if args.inmem:
            from .inmem import InMemEventLog

            log = InMemEventLog.create(spark, metadata=_parse_metadata(args.m))
        elif args.path:
            log = EventLog.open(spark, args.path)
        else:
            raise SystemExit("run requires a path or --inmem")
        # Foreground path: ONE accept loop on the main thread. (serve()
        # would start serve_forever() in its own daemon thread; running a
        # second loop on the same socketserver races its shutdown flags.)
        from .serving import EventLogHTTPServer

        srv = EventLogHTTPServer((args.host, args.port), log)
        print(f"listening on http://{args.host}:{args.port}")
        try:
            srv.serve_forever()  # ctrl-c to stop
        except KeyboardInterrupt:
            srv.shutdown()
        return 0

    log = EventLog.open(spark, args.path)

    if args.cmd == "check":
        row = log.check_integrity().collect()[0]
        report = row.asDict()
        print(json.dumps(report))
        return 0 if not any(report.values()) else 1

    if args.cmd == "version":
        print(
            json.dumps(
                {
                    "version": format(log.version(), "x"),
                    "version-initial": format(log.version_initial(), "x"),
                }
            )
        )
        return 0

    if args.cmd == "append":
        r = log.append(args.label, args.payload)
        print(json.dumps({"version": format(r.version, "x"), "time": r.timestamp}))
        return 0

    if args.cmd == "scan":
        start = int(args.from_, 16) if args.from_ else None
        rows = log.scan(version=start, reverse=args.reverse, limit=args.n or None).collect()
        for e in rows:
            print(
                json.dumps(
                    {
                        "version": format(e.version, "x"),
                        "label": e.label,
                        "payload": json.loads(e.payload),
                        "timestamp": e.timestamp,
                    }
                )
            )
        return 0

    return 2


if __name__ == "__main__":
    sys.exit(main())
