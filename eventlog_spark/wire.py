"""O24 wire codec — the reference's binary push format.

Format (little-endian), one or more events per body
(internal/msgcodec/msgcodec.go:14-56,100-141; README.md:21-28):

    [labelLength u16][payloadLength u32][label utf-8][payload utf-8]*

This is an ingestion-edge adapter (plain Python struct parsing feeding
the engine), not a Spark operator — exactly as in the reference, where
the codec lives outside the storage engines.
"""

from __future__ import annotations

import struct

_HEADER = struct.Struct("<HI")  # labelLen u16, payloadLen u32, little-endian


class WireCodecError(ValueError):
    pass


def encode(events: list[tuple[str, str]]) -> bytes:
    out = bytearray()
    for label, payload in events:
        lb = label.encode("utf-8")
        pb = payload.encode("utf-8")
        if len(lb) > 0xFFFF:
            raise WireCodecError("label too long for wire format")
        out += _HEADER.pack(len(lb), len(pb))
        out += lb
        out += pb
    return bytes(out)


def decode(body: bytes) -> list[tuple[str, str]]:
    events: list[tuple[str, str]] = []
    off = 0
    n = len(body)
    while off < n:
        if n - off < _HEADER.size:
            raise WireCodecError(f"truncated header at offset {off}")
        label_len, payload_len = _HEADER.unpack_from(body, off)
        off += _HEADER.size
        if payload_len == 0:
            raise WireCodecError(f"zero-length payload at offset {off}")
        if n - off < label_len + payload_len:
            raise WireCodecError(f"truncated body at offset {off}")
        label = body[off : off + label_len].decode("utf-8")
        off += label_len
        payload = body[off : off + payload_len].decode("utf-8")
        off += payload_len
        events.append((label, payload))
    if not events:
        raise WireCodecError("empty message")
    return events
