"""Error contract mirroring the reference's exported errors.

Reference: /root/reference/eventlog/eventlog.go:40-66 defines
ErrMismatchingVersions, ErrInvalidPayload, ErrInvalidLabel,
ErrInvalidVersion, ErrPayloadSizeLimitExceeded. We keep the same
taxonomy so client code can translate 1:1.
"""

from __future__ import annotations


class EventLogError(Exception):
    """Base class for all eventlog_spark errors."""


class MismatchingVersions(EventLogError):
    """OCC check failed: assumed version != latest version.

    Reference: eventlog/eventlog.go:43 (ErrMismatchingVersions),
    raised from file.go:495-499 / inmem.go:234-238.
    """


class InvalidPayload(EventLogError):
    """Payload is not a non-empty JSON object.

    Reference: eventlog/validate_payload_json.go:10-66.
    """


class InvalidLabel(EventLogError):
    """Label violates charset or length constraints.

    Reference: eventlog/validate_label.go:5-22.
    """


class InvalidVersion(EventLogError):
    """Scan offset out of bounds, or integrity checksum mismatch.

    Reference: eventlog/eventlog.go:52 (ErrInvalidVersion),
    file.go:221-228 (bounds), read_event.go:136-139 (checksum).
    """


class PayloadSizeLimitExceeded(EventLogError):
    """Payload exceeds the configured size cap (default 1 MiB).

    Reference: eventlog/file/file.go:33-39, inmem.go:52-57.
    """
