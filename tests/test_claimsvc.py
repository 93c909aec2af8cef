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


def test_journal_checkpoint_rolls_at_threshold(svc_dir):
    """A long-lived sidecar's journal must track the LIVE claim set,
    not total history: with a tiny roll floor, sustained put/delete
    churn keeps the file bounded, and a restart resumes the exact
    claim set from the rolled snapshot."""
    sock, jr = os.path.join(svc_dir, "s"), os.path.join(svc_dir, "j")
    srv = ClaimServer(sock, jr, roll_bytes=2048).start()
    st = SocketClaimStore(sock)
    try:
        for i in range(300):  # ~60 B/record → ~18 KiB of raw history
            assert st.put_if_absent(f"c{i}", b"x" * 8) is True
            if i >= 3:  # keep a 4-claim live window
                assert st.delete(f"c{i - 3}") is True
        live = sorted(st.names())
    finally:
        srv.stop()
    # bounded: max(roll floor, 4x live set) + one churn cycle, far
    # below the ~18 KiB an unrolled journal would hold
    assert os.path.getsize(jr) < 4096, os.path.getsize(jr)
    srv2 = ClaimServer(sock, jr).start()
    try:
        assert sorted(SocketClaimStore(sock).names()) == live == [
            "c297",
            "c298",
            "c299",
        ]
    finally:
        srv2.stop()


def test_startup_compacts_history_heavy_journal(svc_dir):
    """Restart-replay cost must not compound across restarts: a
    journal whose history dwarfs its live set (claims created then
    vacuumed) is rolled to a snapshot once on startup."""
    sock, jr = os.path.join(svc_dir, "s"), os.path.join(svc_dir, "j")
    # roll_bytes high enough that the churn below never rolls inline
    srv = ClaimServer(sock, jr, roll_bytes=1 << 20).start()
    st = SocketClaimStore(sock)
    try:
        for i in range(200):
            st.put(f"h{i}", b"y" * 8)
            if i >= 2:
                st.delete(f"h{i - 2}")
    finally:
        srv.stop()
    heavy = os.path.getsize(jr)
    assert heavy > 10_000  # genuinely history-heavy
    srv2 = ClaimServer(sock, jr, roll_bytes=2048).start()
    try:
        assert sorted(SocketClaimStore(sock).names()) == ["h198", "h199"]
    finally:
        srv2.stop()
    assert os.path.getsize(jr) < 1024, os.path.getsize(jr)


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
