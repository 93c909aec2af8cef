"""Claim-service unit behaviors (round-12): durable journal replay,
torn-tail tolerance, protocol-error surfacing, stale-socket recovery.
The cross-process storms and the server-SIGKILL chaos test live in
test_fencing.py; this file proves the service's own contract edges."""

import json
import os
import socket
import tempfile

import pytest

from eventlog_spark.claimsvc import (
    ClaimServer,
    ClaimServiceError,
    SocketClaimStore,
)


@pytest.fixture
def svc_dir():
    # AF_UNIX paths are length-limited (~108 bytes) — keep them short
    d = tempfile.mkdtemp(prefix="csvc-", dir="/tmp")
    yield d
    import shutil

    shutil.rmtree(d, ignore_errors=True)


def test_journal_replay_restores_acked_claims(svc_dir):
    sock, jr = os.path.join(svc_dir, "s"), os.path.join(svc_dir, "j")
    srv = ClaimServer(sock, jr).start()
    st = SocketClaimStore(sock)
    assert st.put_if_absent("a", b"1") is True
    assert st.put_if_absent("a", b"2") is False  # rejected → not journaled
    st.put("b", b"3")
    assert st.delete("b") is True
    srv.stop()

    srv2 = ClaimServer(sock, jr).start()
    st2 = SocketClaimStore(sock)
    try:
        assert st2.get("a") == b"1"
        assert st2.get("b") is None  # the delete replayed too
        assert st2.names() == ["a"]
    finally:
        srv2.stop()


def test_journal_torn_tail_dropped_mid_file_corruption_raises(svc_dir):
    jr = os.path.join(svc_dir, "j")
    rec = json.dumps({"op": "put", "name": "a", "data": b"1".hex()})
    # torn tail: fsync-before-ack means only the LAST record can be
    # partial — it was never acknowledged, so dropping it is correct
    with open(jr, "w") as f:
        f.write(rec + "\n" + rec[: len(rec) // 2])
    objects = ClaimServer._replay(jr)
    assert objects == {"a": b"1"}
    # garbage MID-file is corruption, not a torn write — refuse to
    # resume from a half claim set (it would re-issue owned seqs)
    with open(jr, "w") as f:
        f.write(rec[: len(rec) // 2] + "\n" + rec + "\n")
    with pytest.raises(ValueError, match="corrupt"):
        ClaimServer._replay(jr)


def test_error_frame_raises_claim_service_error_connection_survives(svc_dir):
    sock = os.path.join(svc_dir, "s")
    srv = ClaimServer(sock).start()
    st = SocketClaimStore(sock)
    try:
        st.put("a", b"1")
        with pytest.raises(ClaimServiceError, match="unknown op"):
            st._rpc({"op": "bogus"})
        # the frame was well-formed transport-wise: the connection is
        # healthy and MUST be kept (a drop would force a reconnect and
        # turn the next ambiguous-failure disambiguation into a miss)
        assert st.get("a") == b"1"
    finally:
        srv.stop()


def test_malformed_response_key_raises_claim_service_error():
    with pytest.raises(ClaimServiceError, match="missing 'ok'"):
        SocketClaimStore._expect({"unexpected": 1}, "ok")


def test_stale_socket_file_reclaimed_live_server_refused(svc_dir):
    sock = os.path.join(svc_dir, "s")
    # a crashed/killed predecessor leaves the socket FILE with no
    # listener; allow_reuse_address is a no-op for AF_UNIX, so without
    # the probe-and-unlink the configured path would be wedged
    sk = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    sk.bind(sock)
    sk.close()
    srv = ClaimServer(sock).start()
    st = SocketClaimStore(sock)
    try:
        assert st.put_if_absent("x", b"1") is True
        # ...but a LIVE server is never usurped
        with pytest.raises(OSError, match="already live"):
            ClaimServer(sock)
        assert st.get("x") == b"1"  # the live one kept serving
    finally:
        srv.stop()
