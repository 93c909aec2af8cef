"""HTTP client library — the user-facing twin of the reference client
(client/client.go, client/http.go): transparent scan pagination, OCC
append with CAS retry, and websocket head subscription, over the
7-route facade in serving.py. Stdlib-only (http.client + wsclient.py).

Parity map (behavior, not code):

* ``scan()``            — client/http.go:342-429: re-request from the
  last event's ``version-next`` (``version-previous`` when reverse)
  until the sentinel ``"0"``, yielding events as one seamless iterator
  no matter how small the server's read batch is clamped.
* ``append*``           — client/http.go:216-336: binary wire body
  (wire.py, O24), hex version in the path for the OCC variant.
* ``try_append*``       — client/client.go:150-246: call
  ``transaction()``, attempt ``append_check``; on
  ``MismatchingVersions`` call ``sync()`` for a fresh assumed version
  and repeat until committed or ``max_attempts`` exhausted.
* ``listen`` / ``subscribe`` — client/http.go:507-585: websocket
  ``/subscription``, one callback per pushed head (latest-wins
  conflation happens server-side).
* error mapping         — client/client.go:249-260: the server's 400
  bodies (``ErrMismatchingVersions`` …) raise the same exception
  taxonomy the engine itself uses (errors.py).

One deliberate deviation, documented: the reference sends
``skip_first`` on EVERY page request while resuming from
``version-next`` — the next UNREAD event — which drops one event per
page once the server clamps batches. Here ``skip_first`` applies to
the first page only, which preserves the flag's meaning ("start after
``version``") across pagination.
"""

from __future__ import annotations

import http.client
import json
import socket
import threading
import weakref
import time as _time
from collections.abc import Callable, Iterator
from dataclasses import dataclass

from .errors import (
    EventLogError,
    InvalidPayload,
    InvalidVersion,
    MismatchingVersions,
    PayloadSizeLimitExceeded,
)
from .wire import encode
from .wsclient import WSSubscription

_ERR_MAP = {
    "ErrMismatchingVersions": MismatchingVersions,
    "ErrInvalidPayload": InvalidPayload,
    "ErrInvalidVersion": InvalidVersion,
    "ErrMalformedVersion": InvalidVersion,
    "ErrPayloadSizeLimitExceeded": PayloadSizeLimitExceeded,
}


@dataclass(frozen=True)
class ClientEvent:
    """One scanned event; versions are ints (hex on the wire), payload
    is the raw JSON string exactly as the log stores it."""

    version: int
    version_prev: int
    version_next: int
    time: str
    label: str
    payload: str


@dataclass(frozen=True)
class AppendAck:
    """Server acknowledgement of an append."""

    version: int
    version_previous: int
    version_first: int
    time: str


class Client:
    """Drop-in client for an ``EventLogHTTPServer`` (serving.py) — or
    any server speaking the reference's HTTP API."""

    def __init__(
        self,
        host: str = "127.0.0.1",
        port: int = 8080,
        timeout: float = 30.0,
        strict_reference_pagination: bool = False,
    ):
        self.host = host
        self.port = port
        self.timeout = timeout
        self._local = threading.local()  # one keep-alive conn per thread
        # WeakSet: close() reaches every LIVE conn, while a conn whose
        # owning thread exited (its threading.local ref died) stays
        # GC-able — a strong set would pin one open socket per dead
        # thread for the life of the process
        self._conns: "weakref.WeakSet" = weakref.WeakSet()
        self._conns_lock = threading.Lock()
        # Compat mode (round-5 verdict item 7): the reference client
        # resends ``skip_first`` on EVERY pagination request while
        # resuming from ``version-next`` — the next UNREAD event — so
        # one event is dropped per page once the server clamps batches
        # (client/http.go:342-429). True reproduces that behavior
        # byte-for-byte for parity testing; the default keeps the
        # documented fix (skip_first applies to the first page only).
        self.strict_reference_pagination = strict_reference_pagination

    # -- transport ---------------------------------------------------------

    def _request(self, method: str, path: str, body: bytes | None = None) -> tuple[int, bytes]:
        # Persistent keep-alive connection per thread (the server speaks
        # HTTP/1.1 with Content-Length): the reference client reuses
        # connections too (fasthttp). Retry policy preserves the log's
        # at-most-once append semantics: a REUSED socket that fails
        # while SENDING gets one transparent reconnect (the server
        # closed it idle — the request was never processed), and
        # idempotent GETs retry on any transport failure; but a POST
        # whose response was lost AFTER the send completed is NOT
        # retried — the append may have committed, and re-sending would
        # duplicate it (the caller sees the error and can inspect
        # version()/scan to disambiguate, same as the reference client).
        local = self._local
        for attempt in (0, 1):
            conn = getattr(local, "conn", None)
            fresh = conn is None
            if fresh:
                conn = local.conn = http.client.HTTPConnection(
                    self.host, self.port, timeout=self.timeout
                )
                # auto_open=0: a conn closed under us (close() from
                # another thread, a Connection: close response) must
                # surface as NotConnected on the next request — caught
                # below and replaced by a properly-configured fresh
                # conn — instead of http.client silently reconnecting
                # WITHOUT the TCP_NODELAY setup or close() tracking
                conn.auto_open = 0
                # disable Nagle: headers and body go out in separate
                # writes, and on a reused connection Nagle + delayed ACK
                # turns every request into a ~40 ms stall
                conn.connect()
                conn.sock.setsockopt(
                    socket.IPPROTO_TCP, socket.TCP_NODELAY, 1
                )
                with self._conns_lock:
                    self._conns.add(conn)
            try:
                conn.request(method, path, body=body)
            except (http.client.HTTPException, ConnectionError, OSError):
                self._drop(conn)
                if attempt == 0 and not fresh:
                    continue  # stale keep-alive, never reached the server
                raise
            try:
                resp = conn.getresponse()
                return resp.status, resp.read()
            except (http.client.HTTPException, ConnectionError, OSError):
                self._drop(conn)
                if attempt == 0 and method in ("GET", "HEAD"):
                    continue  # idempotent: safe to re-ask
                raise
        raise AssertionError("unreachable")

    def _drop(self, conn) -> None:
        self._local.conn = None
        with self._conns_lock:
            self._conns.discard(conn)
        conn.close()

    def close(self) -> None:
        """Close every live keep-alive connection this client has
        opened (across all threads). Safe to call repeatedly; the next
        request on any thread transparently reconnects."""
        with self._conns_lock:
            conns = list(self._conns)
            self._conns = weakref.WeakSet()
        self._local.conn = None
        for c in conns:
            c.close()

    def _checked(self, method: str, path: str, body: bytes | None = None) -> bytes:
        status, data = self._request(method, path, body)
        if status == 400:
            text = data.decode("utf-8", "replace")
            raise _ERR_MAP.get(text, EventLogError)(text)
        if status != 200:
            raise EventLogError(f"unexpected status {status}: {data[:200]!r}")
        return data

    # -- append family (O1-O4 over the wire) --------------------------------

    @staticmethod
    def _parse_ack(data: bytes) -> AppendAck:
        doc = json.loads(data)
        version = int(doc["version"], 16)
        return AppendAck(
            version=version,
            version_previous=int(doc["version-previous"], 16),
            version_first=int(doc.get("version-first", doc["version"]), 16),
            time=doc["time"],
        )

    def append(self, label: str, payload: str) -> AppendAck:
        return self._parse_ack(self._checked("POST", "/log/", encode([(label, payload)])))

    def append_multi(self, events: list[tuple[str, str]]) -> AppendAck:
        return self._parse_ack(self._checked("POST", "/log/", encode(events)))

    def append_check(self, assumed_version: int, label: str, payload: str) -> AppendAck:
        return self.append_check_multi(assumed_version, [(label, payload)])

    def append_check_multi(
        self, assumed_version: int, events: list[tuple[str, str]]
    ) -> AppendAck:
        path = "/log/" + format(assumed_version, "x")
        return self._parse_ack(self._checked("POST", path, encode(events)))

    def try_append(
        self,
        transaction: Callable[[], tuple[str, str]],
        sync: Callable[[], int] | None = None,
        assumed_version: int | None = None,
        max_attempts: int = 0,
    ) -> AppendAck:
        """CAS retry loop (client/client.go:150-199): run
        ``transaction()`` to produce the event, attempt the OCC append;
        when another writer won the race, re-``sync()`` the assumed
        version and re-run the transaction (it may need to re-derive
        its event from fresh state). ``sync`` defaults to asking the
        server for its head version. ``max_attempts=0`` retries
        forever, like the reference's ctx-less loop."""
        return self.try_append_multi(
            lambda: [transaction()], sync, assumed_version, max_attempts
        )

    def try_append_multi(
        self,
        transaction: Callable[[], list[tuple[str, str]]],
        sync: Callable[[], int] | None = None,
        assumed_version: int | None = None,
        max_attempts: int = 0,
    ) -> AppendAck:
        sync = sync or self.version
        assumed = self.version() if assumed_version is None else assumed_version
        attempt = 0
        while True:
            attempt += 1
            try:
                return self.append_check_multi(assumed, transaction())
            except MismatchingVersions:
                if max_attempts and attempt >= max_attempts:
                    raise
                assumed = sync()

    # -- scan with transparent pagination (O5-O9) ---------------------------

    def scan(
        self,
        version: int | None = None,
        reverse: bool = False,
        skip_first: bool = False,
        batch_hint: int = 0,
        label: str | None = None,
    ) -> Iterator[ClientEvent]:
        """Iterate events from ``version`` (default: initial version
        forward / head version reverse), re-requesting from each page's
        last ``version-next``/``version-previous`` until the ``"0"``
        sentinel — the server's batch clamp is invisible to the caller
        (client/http.go:342-429). ``batch_hint`` caps the per-request
        ``n`` (the server clamps it further). ``label`` (extension)
        restricts the scan server-side to one label — resuming from a
        match's chain link stays correct because the next page's scan
        re-applies the filter from that version on, and an empty page
        means no matches remain."""
        if version is None:
            version = self.version() if reverse else self.version_initial()
        while True:
            q = []
            if batch_hint:
                q.append(f"n={batch_hint}")
            if reverse:
                q.append("reverse")
            if skip_first:
                q.append("skip_first")
                if not self.strict_reference_pagination:
                    skip_first = False  # first page only — see module docstring
            if label is not None:
                from urllib.parse import quote

                q.append("label=" + quote(label, safe=""))
            path = "/log/" + format(version, "x") + ("?" + "&".join(q) if q else "")
            page = json.loads(self._checked("GET", path))
            if not page:
                return
            for doc in page:
                ev = ClientEvent(
                    version=int(doc["version"], 16),
                    version_prev=int(doc["version-previous"], 16),
                    version_next=int(doc["version-next"], 16),
                    time=doc["time"],
                    label=doc["label"],
                    # re-minify exactly as validation.minify stored it
                    # (ensure_ascii=False: the log keeps unicode raw)
                    payload=json.dumps(
                        doc["payload"], separators=(",", ":"), ensure_ascii=False
                    )
                    if not isinstance(doc["payload"], str)
                    else doc["payload"],
                )
                yield ev
                if (not reverse and ev.version_next == 0) or (
                    reverse and ev.version_prev == 0
                ):
                    return
            version = ev.version_next if not reverse else ev.version_prev

    # -- metadata / versions (O10-O12) --------------------------------------

    def version(self) -> int:
        return int(json.loads(self._checked("GET", "/version"))["version"], 16)

    def version_initial(self) -> int:
        return int(
            json.loads(self._checked("GET", "/version/initial"))["version-initial"], 16
        )

    def metadata(self) -> dict:
        return json.loads(self._checked("GET", "/meta"))

    # -- subscription (O13) --------------------------------------------------

    def subscribe(self) -> WSSubscription:
        """Raw websocket subscription; iterate ``recv_version()``."""
        return WSSubscription(self.host, self.port, timeout=self.timeout)

    def listen(
        self,
        on_update: Callable[[int], bool | None],
        timeout: float | None = None,
    ) -> None:
        """Blocking push loop (client/http.go:507-585): call
        ``on_update(head)`` for the current head and then every pushed
        head, until the server closes, ``on_update`` returns False, or
        ``timeout`` seconds elapse."""
        deadline = None if timeout is None else _time.monotonic() + timeout
        with self.subscribe() as sub:
            while deadline is None or _time.monotonic() < deadline:
                try:
                    if deadline is not None:
                        # clamp the socket timeout to the remaining
                        # deadline — recv_version blocks on the socket's
                        # full timeout otherwise, overshooting by up to
                        # self.timeout seconds (round-5 advice)
                        sub.set_timeout(
                            max(1e-3, min(self.timeout, deadline - _time.monotonic()))
                        )
                    head = sub.recv_version()
                except TimeoutError:  # socket timeout — re-check deadline
                    continue
                if head is None:
                    return
                if on_update(head) is False:
                    return

    def follow(
        self,
        version: int | None = None,
        timeout: float | None = None,
        batch_hint: int = 0,
        label: str | None = None,
    ) -> Iterator[ClientEvent]:
        """The reference's canonical consumer pattern (SURVEY §3.3,
        client/http.go:507-585): one iterator yielding every event with
        version > ``version`` (default: the head at call time), in
        order, exactly once, as they are appended — ``listen`` + a
        catch-up ``scan`` composed.

        Protocol: subscribe FIRST (so no push can slip between catch-up
        and subscription), then on entry and after every pushed head —
        or every socket-timeout wakeup — scan forward from the last
        yielded version with ``skip_first``. Resuming from last-seen
        makes push delivery a LIVENESS hint only: a dropped or
        latest-wins-conflated frame never loses an event, the next
        wakeup's catch-up scan reads it from the log. Ends when
        ``timeout`` elapses or the server closes the subscription.

        ``label`` (extension): yield only matching events — the
        topic-consumer shape, served by label-pruned scans. The resume
        cursor advances to the pre-scan head even when a scan yields no
        match, so a label that goes quiet never causes re-scans of an
        ever-growing suffix (each catch-up covers at least up to the
        head observed before it started; exactly-once is unaffected
        because no unexamined version is ever skipped)."""
        last = self.version() if version is None else version
        deadline = None if timeout is None else _time.monotonic() + timeout
        with self.subscribe() as sub:
            while deadline is None or _time.monotonic() < deadline:
                head = self.version()
                if head > last:
                    it = (
                        self.scan(batch_hint=batch_hint, label=label)
                        if last == 0
                        else self.scan(
                            version=last,
                            skip_first=True,
                            batch_hint=batch_hint,
                            label=label,
                        )
                    )
                    for ev in it:
                        last = ev.version
                        yield ev
                    # the scan examined everything up to (at least) the
                    # pre-scan head; a filtered scan's last MATCH may
                    # trail it, so advance the cursor explicitly
                    last = max(last, head)
                try:
                    if deadline is not None:
                        sub.set_timeout(
                            max(1e-3, min(self.timeout, deadline - _time.monotonic()))
                        )
                    head = sub.recv_version()
                except TimeoutError:  # wakeup — re-check deadline + head
                    continue
                if head is None:
                    return


class LocalClient:
    """The reference's SECOND client implementation (client/inmem.go):
    the same client surface bound directly to an in-process log engine
    (either engine — parquet ``EventLog`` or ``InMemEventLog``), no HTTP
    in between. Gives embedded users the identical programming model the
    HTTP client offers remote users: AppendAck results, paginated
    ``scan``, the ``try_append`` CAS loop, ``listen`` push delivery."""

    def __init__(self, log):
        self._log = log

    # -- append family -------------------------------------------------------

    @staticmethod
    def _ack(r) -> AppendAck:
        from datetime import datetime, timezone

        t = (
            datetime.fromtimestamp(r.timestamp, tz=timezone.utc)
            .isoformat(timespec="seconds")
            .replace("+00:00", "Z")
        )
        return AppendAck(
            version=r.version,
            version_previous=r.version_previous,
            version_first=r.version_first,
            time=t,
        )

    def append(self, label: str, payload: str) -> AppendAck:
        return self._ack(self._log.append(label, payload))

    def append_multi(self, events: list[tuple[str, str]]) -> AppendAck:
        return self._ack(self._log.append_multi(events))

    def append_check(self, assumed_version: int, label: str, payload: str) -> AppendAck:
        return self._ack(self._log.append_check(assumed_version, label, payload))

    def append_check_multi(
        self, assumed_version: int, events: list[tuple[str, str]]
    ) -> AppendAck:
        return self._ack(self._log.append_check_multi(assumed_version, events))

    try_append = Client.try_append
    try_append_multi = Client.try_append_multi

    # -- scan ----------------------------------------------------------------

    def scan(
        self,
        version: int | None = None,
        reverse: bool = False,
        skip_first: bool = False,
        batch_hint: int = 1000,
        label: str | None = None,
    ) -> Iterator[ClientEvent]:
        """Same pagination contract as the HTTP client (resume from
        version-next/-previous until the 0 sentinel), batched through
        the engine's ``scan`` so no page ever materializes more than
        ``batch_hint`` rows on the driver."""
        if version is None:
            version = self.version() if reverse else self.version_initial()
        while True:
            rows = self._log.scan(
                version=version,
                reverse=reverse,
                limit=batch_hint,
                skip_first=skip_first,
                label=label,
            ).collect()
            skip_first = False
            if not rows:
                return
            for r in rows:
                ev = ClientEvent(
                    version=r.version,
                    version_prev=r.version_prev,
                    version_next=r.version_next,
                    time=str(r.timestamp),
                    label=r.label,
                    payload=r.payload,
                )
                yield ev
                if (not reverse and ev.version_next == 0) or (
                    reverse and ev.version_prev == 0
                ):
                    return
            version = ev.version_next if not reverse else ev.version_prev

    # -- metadata / versions -------------------------------------------------

    def version(self) -> int:
        return self._log.version()

    def version_initial(self) -> int:
        return self._log.version_initial()

    def metadata(self) -> dict:
        return self._log.metadata()

    # -- subscription --------------------------------------------------------

    def listen(
        self,
        on_update: Callable[[int], bool | None],
        timeout: float | None = None,
    ) -> None:
        """client/inmem.go:177-196 semantics: deliver the current head
        immediately, then every pushed head from the log's latest-wins
        hub, until ``on_update`` returns False or ``timeout`` elapses."""
        import queue as _queue

        deadline = None if timeout is None else _time.monotonic() + timeout
        q, close = self._log.subscribe()
        try:
            if on_update(self._log.version()) is False:
                return
            while deadline is None or _time.monotonic() < deadline:
                remaining = None if deadline is None else deadline - _time.monotonic()
                wait = 0.25 if remaining is None else max(0.01, min(0.25, remaining))
                try:
                    head = q.get(timeout=wait)
                except _queue.Empty:
                    continue
                if on_update(head) is False:
                    return
        finally:
            close()

    def follow(
        self,
        version: int | None = None,
        timeout: float | None = None,
        batch_hint: int = 1000,
        label: str | None = None,
    ) -> Iterator[ClientEvent]:
        """Same contract as ``Client.follow`` (exactly-once ordered
        iterator over events after ``version``), bound to the in-process
        hub: subscribe first, catch-up scan from the last yielded
        version on entry and after every pushed head or poll wakeup —
        latest-wins conflation in the hub never loses an event.
        ``label`` filters to one label with the same quiet-label cursor
        advance as ``Client.follow``."""
        import queue as _queue

        last = self.version() if version is None else version
        deadline = None if timeout is None else _time.monotonic() + timeout
        q, close = self._log.subscribe()
        try:
            while deadline is None or _time.monotonic() < deadline:
                head = self.version()
                if head > last:
                    it = (
                        self.scan(batch_hint=batch_hint, label=label)
                        if last == 0
                        else self.scan(
                            version=last,
                            skip_first=True,
                            batch_hint=batch_hint,
                            label=label,
                        )
                    )
                    for ev in it:
                        last = ev.version
                        yield ev
                    last = max(last, head)
                remaining = None if deadline is None else deadline - _time.monotonic()
                wait = 0.25 if remaining is None else max(0.01, min(0.25, remaining))
                try:
                    q.get(timeout=wait)
                except _queue.Empty:
                    continue
        finally:
            close()
