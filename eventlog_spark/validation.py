"""Append-time validation + canonicalization.

Behavioral parity targets (see SURVEY.md §2.1 O15-O18):

* Label: charset ``[0-9A-Za-z_\\-.~%]``, may be empty, max length 256.
  Reference: eventlog/validate_label.go:5-22 allows up to 65535 but the
  file format only sizes buffers for 256 (file.go:42); we resolve the
  reference's inconsistency strictly (SURVEY §7) and enforce 256.
* Payload: must parse as JSON and be a non-empty JSON *object* —
  ``{}``, arrays, scalars and malformed input are rejected.
  Reference: eventlog/validate_payload_json.go:10-66; truth table in
  eventlog/eventlog_test.go:520-538.
* Payload size: 7 bytes (``{"x":0}``) .. 1 MiB by default.
  Reference: eventlog/file/file.go:33-39.
* Minification: whitespace outside strings is stripped before storage —
  key order and number formatting are preserved (unlike a parse/
  re-serialize round trip). Reference: internal/jsonminify/jsonminify.go:3-25.

Two implementations of each rule are provided:

* Python functions — used on the driver-side append path, where batches
  arrive as Python objects and per-event validation is cheap.
* Column expressions (``*_expr``) — pure JVM-side ``pyspark.sql.functions``
  compositions for validating *DataFrames* of events at scale (bulk
  ingest of billions of rows never touches Python).
"""

from __future__ import annotations

import json
import re

from pyspark.sql import Column
from pyspark.sql import functions as F

MAX_LABEL_LEN = 256
MIN_PAYLOAD_LEN = 7  # len('{"x":0}'), reference file.go:33-36
DEFAULT_MAX_PAYLOAD_LEN = 1024 * 1024

# \A..\Z, not ^..$ — both Python's and Java's $ match BEFORE a trailing
# newline, so "x\n" (or just "\n") would pass a ^..$ charset check.
_LABEL_RE = re.compile(r"\A[0-9A-Za-z_\-.~%]*\Z")

_WS_RE = re.compile(r"[ \t\n\r]")  # minify fast path: no match = identity
# Same charset, Java regex dialect (\z is Java's absolute end-of-input).
_LABEL_RE_JAVA = "\\A[0-9A-Za-z_.~%-]*\\z"


def validate_label(label: str) -> None:
    from .errors import InvalidLabel

    if len(label) > MAX_LABEL_LEN:
        raise InvalidLabel(f"label length {len(label)} exceeds {MAX_LABEL_LEN}")
    if not _LABEL_RE.match(label):
        raise InvalidLabel(f"label contains illegal characters: {label!r}")


def validate_payload(payload: str, max_len: int = DEFAULT_MAX_PAYLOAD_LEN) -> None:
    from .errors import InvalidPayload, PayloadSizeLimitExceeded

    raw = payload.encode("utf-8")
    if len(raw) > max_len:
        raise PayloadSizeLimitExceeded(f"payload length {len(raw)} exceeds {max_len}")
    # same minimum the bulk path (payload_valid_expr) and check_integrity
    # enforce — without it a 6-byte '{"":0}' would be accepted here and
    # then flagged as a payload_violation by the engine's own audit
    # (reference: msgcodec minLen, file.go:33-36)
    if len(raw) < MIN_PAYLOAD_LEN:
        raise InvalidPayload(
            f"payload length {len(raw)} below minimum {MIN_PAYLOAD_LEN}"
        )
    try:
        obj = json.loads(payload)
    except (ValueError, TypeError) as exc:
        raise InvalidPayload(f"malformed JSON: {exc}") from exc
    if not isinstance(obj, dict):
        raise InvalidPayload("payload must be a JSON object")
    if not obj:
        raise InvalidPayload("payload must be a non-empty JSON object")


def minify_json(payload: str) -> str:
    """Strip whitespace outside string literals; preserve key order and
    number formatting (the reference's minifier, jsonminify.go:3-25, is
    whitespace-only; ``json.dumps(json.loads(x))`` would NOT be parity —
    it reformats numbers). Handles ``\\"`` escapes correctly, which the
    reference's minifier is known to mishandle (SURVEY §7: documented
    divergence, we do not replicate the bug).

    Fast path: a payload with no whitespace ANYWHERE minifies to
    itself (whitespace inside string literals is preserved by the slow
    path too, so identity is exact) — one C-level regex scan instead
    of a per-character Python loop, which matters on the interactive
    append path at wide payloads (64 KiB: 4.7 ms -> 0.03 ms; clients
    re-appending already-minified JSON hit this every time)."""
    if _WS_RE.search(payload) is None:
        return payload
    out: list[str] = []
    in_string = False
    escaped = False
    for ch in payload:
        if in_string:
            out.append(ch)
            if escaped:
                escaped = False
            elif ch == "\\":
                escaped = True
            elif ch == '"':
                in_string = False
        else:
            if ch == '"':
                in_string = True
                out.append(ch)
            elif ch not in " \t\n\r":
                out.append(ch)
    return "".join(out)


# --- JVM-side column expressions (bulk-ingest path) ---------------------


def label_valid_expr(label: Column) -> Column:
    """Vectorized O15: charset + length check, whole-stage-codegen friendly."""
    return label.rlike(_LABEL_RE_JAVA) & (F.length(label) <= MAX_LABEL_LEN)


def payload_valid_expr(payload: Column, max_len: int = DEFAULT_MAX_PAYLOAD_LEN) -> Column:
    """Vectorized O16+O17: parses as JSON, is an object, is non-empty,
    within size bounds. ``from_json`` to a map yields null for non-objects
    and malformed input; ``{}`` parses to an empty map → size 0."""
    parsed = F.from_json(payload, "map<string,string>")
    return (
        parsed.isNotNull()
        & (F.size(F.map_keys(parsed)) > 0)
        & (F.octet_length(payload) <= max_len)
        & (F.octet_length(payload) >= MIN_PAYLOAD_LEN)
    )
