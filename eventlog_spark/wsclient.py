"""Minimal WebSocket subscription client — the drop-in twin of the
reference client's ws path (client/http.go:507-585): connect to
``GET /subscription`` with an Upgrade handshake, then read hex head
versions as text frames. Stdlib-only (RFC 6455 client side: masked
frames out, unmasked frames in)."""

from __future__ import annotations

import base64
import hashlib
import os
import socket
import struct

_WS_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"


class WSSubscription:
    """Iterate head versions (ints) pushed by the server; ``close()``
    sends a close frame and tears down the socket."""

    def __init__(self, host: str, port: int, timeout: float = 30.0):
        self._sock = socket.create_connection((host, port), timeout=timeout)
        key = base64.b64encode(os.urandom(16)).decode()
        req = (
            f"GET /subscription HTTP/1.1\r\n"
            f"Host: {host}:{port}\r\n"
            f"Upgrade: websocket\r\n"
            f"Connection: Upgrade\r\n"
            f"Sec-WebSocket-Key: {key}\r\n"
            f"Sec-WebSocket-Version: 13\r\n\r\n"
        )
        self._sock.sendall(req.encode())
        resp = b""
        while b"\r\n\r\n" not in resp:
            chunk = self._sock.recv(4096)
            if not chunk:
                raise ConnectionError("server closed during ws handshake")
            resp += chunk
        head, _, rest = resp.partition(b"\r\n\r\n")
        if b"101" not in head.split(b"\r\n", 1)[0]:
            raise ConnectionError(f"ws upgrade refused: {head[:100]!r}")
        expect = base64.b64encode(
            hashlib.sha1((key + _WS_GUID).encode()).digest()
        ).decode()
        if expect.encode() not in head:
            raise ConnectionError("bad Sec-WebSocket-Accept")
        self._buf = rest

    def set_timeout(self, timeout: float | None) -> None:
        """Adjust the socket timeout mid-subscription — ``listen``
        clamps it to the remaining deadline each iteration so a blocking
        ``recv_version`` can't overshoot the caller's deadline by a full
        socket timeout."""
        self._sock.settimeout(timeout)

    def _recv_exact(self, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = self._sock.recv(4096)
            if not chunk:
                raise ConnectionError("server closed ws stream")
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def recv_version(self) -> int | None:
        """Next pushed head version; None when the server closes."""
        while True:
            b1, b2 = self._recv_exact(2)
            opcode = b1 & 0x0F
            length = b2 & 0x7F
            if length == 126:
                length = struct.unpack("!H", self._recv_exact(2))[0]
            elif length == 127:
                length = struct.unpack("!Q", self._recv_exact(8))[0]
            payload = self._recv_exact(length) if length else b""
            if opcode == 0x8:
                return None
            if opcode == 0x1:
                return int(payload.decode(), 16)
            # ignore pong/continuation

    def close(self) -> None:
        try:
            mask = os.urandom(4)
            self._sock.sendall(struct.pack("!BB", 0x88, 0x80) + mask)
            self._sock.close()
        except OSError:
            pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
