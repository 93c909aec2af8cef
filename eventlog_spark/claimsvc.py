"""Socket-served claim arbiter — the ClaimStore contract as a service.

Why this exists (round-10 verdict, "Object-store fencing is in-process
only"): the CAS commit arbiter was proven against two substrates — the
POSIX link store across real OS processes, and the in-memory
object-store fake within one process — but the cross-OS-process storms
(4 writers, SIGKILL mid-storm, pointer chaos) could only run over
POSIX link, because a dict cannot span processes. This module closes
that gap: a tiny stateful service holding the claim objects, reachable
over a unix-domain socket, so INDEPENDENT OS processes exercise the
exact 5-method object-store contract (atomic whole-object PUT,
conditional PUT, strong read-after-write GET, DELETE, LIST) with no
rename, no hard link, and no flock anywhere in the commit path.

Why a service rather than an ``O_CREAT|O_EXCL`` file store: on a real
object store, a conditional PUT is ATOMIC SERVER-SIDE — the object's
name and bytes become visible together or not at all, whatever happens
to the client. A filesystem emulation that claims with an exclusive
create has an unfixable divergence: a writer SIGKILLed between the
exclusive ``open`` and the payload ``write`` leaves a torn, empty
claim that blocks the seq forever — a wedge the modeled substrate
cannot exhibit, which would make the kill-storm tests prove (or
flake on) the wrong thing. Here the mutation happens under the
server's lock in one step, so a client killed at ANY instruction
boundary either committed its claim wholly or not at all — exactly
the semantics of ``If-None-Match: *`` / ``x-goog-if-generation-match:
0``. This is also the shape of the production fallback for stores
without conditional PUT (a DynamoDB-style lock/claim service beside
the bucket): the arbiter state is tiny (one record per commit, rolled
up by checkpoints), so a single small service — or the store's own
conditional PUT — carries a 1000-executor deployment's commit rate.

Wire protocol: length-prefixed JSON frames over a persistent
connection; one request/response at a time per connection. Payload
bytes ride hex-encoded (claim records are ~100-byte JSON; framing
simplicity beats encoding efficiency here).

Reference parity note: the reference engine has no multi-process story
at all (its commit mutex is an in-process RWMutex,
eventlog/file/file.go:57); this module exists for the 100 TB
multi-host mandate, not reference parity.
"""

from __future__ import annotations

import json
import os
import socket
import socketserver
import struct
import threading


def _read_exact(rfile, n: int) -> bytes | None:
    buf = b""
    while len(buf) < n:
        chunk = rfile.read(n - len(buf))
        if not chunk:
            return None
        buf += chunk
    return buf


class _Handler(socketserver.StreamRequestHandler):
    def handle(self) -> None:  # one connection, many frames
        srv = self.server
        while True:
            hdr = _read_exact(self.rfile, 4)
            if hdr is None:
                return  # client gone (close or SIGKILL) — nothing torn
            (n,) = struct.unpack(">I", hdr)
            body = _read_exact(self.rfile, n)
            if body is None:
                return  # killed mid-frame: request never reached the store
            req = json.loads(body)
            op, name = req["op"], req.get("name")
            data = bytes.fromhex(req["data"]) if "data" in req else None
            # THE atomicity point: every mutation is one step under the
            # server's lock — the object-store server-side guarantee
            with srv.store_lock:
                if op == "put":
                    srv.objects[name] = data
                    resp: dict = {"ok": True}
                elif op == "put_if_absent":
                    if name in srv.objects:
                        resp = {"ok": False}
                    else:
                        srv.objects[name] = data
                        resp = {"ok": True}
                elif op == "get":
                    d = srv.objects.get(name)
                    resp = {"data": d.hex()} if d is not None else {}
                elif op == "delete":
                    resp = {"ok": srv.objects.pop(name, None) is not None}
                elif op == "names":
                    resp = {"names": list(srv.objects)}
                else:
                    resp = {"error": f"unknown op {op!r}"}
            out = json.dumps(resp).encode()
            self.wfile.write(struct.pack(">I", len(out)) + out)
            self.wfile.flush()


class ClaimServer:
    """Hosts the claim objects behind a unix socket. Start it in the
    coordinating process (a test, or an ops sidecar); writers in any
    process connect with :class:`SocketClaimStore` by path."""

    def __init__(self, socket_path: str):
        class _Srv(socketserver.ThreadingUnixStreamServer):
            daemon_threads = True
            allow_reuse_address = True

        self.socket_path = socket_path
        self._srv = _Srv(socket_path, _Handler)
        self._srv.objects = {}  # type: ignore[attr-defined]
        self._srv.store_lock = threading.Lock()  # type: ignore[attr-defined]
        self._thread = threading.Thread(
            target=self._srv.serve_forever, name="claimsvc", daemon=True
        )

    def start(self) -> "ClaimServer":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._srv.shutdown()
        self._srv.server_close()
        try:
            os.unlink(self.socket_path)
        except OSError:
            pass

    def names(self) -> list[str]:
        """Server-side listing (test assertions on the claim set)."""
        with self._srv.store_lock:  # type: ignore[attr-defined]
            return list(self._srv.objects)  # type: ignore[attr-defined]


class SocketClaimStore:
    """Client half of the served contract — drop-in for
    :class:`~eventlog_spark.manifest.PosixClaimStore` /
    ``MemoryClaimStore`` (the same 5 methods). One persistent
    connection per instance, serialized by a lock; instances are
    per-EventLog, so concurrent writers map to concurrent
    connections."""

    def __init__(self, socket_path: str):
        self._path = socket_path
        self._sock: socket.socket | None = None
        self._lock = threading.Lock()

    def _rpc(self, req: dict) -> dict:
        """One request/response. On ANY transport error the connection
        is dropped and the error RAISED — never silently retried: a
        blind re-send of a put_if_absent whose first copy applied
        would come back ok=False and report a FALSE claim loss (the
        exact data-loss shape the manifest layer's content
        disambiguation exists to prevent; it needs the exception to
        know the outcome is ambiguous). The next call reconnects
        fresh, which is what lets that disambiguating GET succeed
        after a mid-claim drop."""
        body = json.dumps(req).encode()
        with self._lock:
            try:
                if self._sock is None:
                    self._sock = socket.socket(
                        socket.AF_UNIX, socket.SOCK_STREAM
                    )
                    self._sock.connect(self._path)
                f = self._sock.makefile("rwb")
                f.write(struct.pack(">I", len(body)) + body)
                f.flush()
                hdr = _read_exact(f, 4)
                if hdr is None:
                    raise ConnectionError("claim service closed the connection")
                (n,) = struct.unpack(">I", hdr)
                resp = _read_exact(f, n)
                if resp is None:
                    raise ConnectionError("claim service closed mid-response")
                return json.loads(resp)
            except (OSError, ConnectionError):
                try:
                    self._sock.close()
                except Exception:
                    pass
                self._sock = None  # next call reconnects fresh
                raise

    def put(self, name: str, data: bytes) -> None:
        self._rpc({"op": "put", "name": name, "data": bytes(data).hex()})

    def put_if_absent(self, name: str, data: bytes) -> bool:
        return bool(
            self._rpc(
                {"op": "put_if_absent", "name": name, "data": bytes(data).hex()}
            )["ok"]
        )

    def get(self, name: str) -> bytes | None:
        resp = self._rpc({"op": "get", "name": name})
        return bytes.fromhex(resp["data"]) if "data" in resp else None

    def delete(self, name: str) -> bool:
        return bool(self._rpc({"op": "delete", "name": name})["ok"])

    def names(self) -> list[str]:
        return list(self._rpc({"op": "names"})["names"])
