"""Capture-loop conformance against the in-process fake server:
exactly-once appends under at-least-once delivery, and the
reconnecting drain. (The live twin runs in test_live_pg.py against a
real walsender; these tests pin the crash-window semantics the live
server can't produce deterministically.)"""

from __future__ import annotations

import struct

from test_replication import FakeServer, _be, _txn_payloads, _xlogdata

from pgsink_spark.streaming.datasource import read_capture
from pgsink_spark.streaming.decoder import Insert, decode_message
from pgsink_spark.streaming.live import capture_to_file, capture_with_retry
from pgsink_spark.streaming.replication import ReplicationClient


def _client(server: FakeServer) -> ReplicationClient:
    c = ReplicationClient(
        server.client_sock, database="db", user="u", password=None
    )
    c.connect()
    return c


def _captured_ids(path: str) -> list[bytes]:
    out = []
    for buf in read_capture(path):
        d = decode_message(buf)
        if isinstance(d, Insert):
            out.append(d.new[0])
    return out


def test_capture_replay_is_skipped_exactly_once(tmp_path):
    """At-least-once delivery: a restart resends transactions whose
    confirm never reached the server (crash in the append→confirm
    window). The capture file's highest commit LSN is the cursor —
    resent transactions are re-confirmed but NOT re-appended."""
    cap = str(tmp_path / "wal.capture")
    wal1 = _txn_payloads(100, 7, (1, "a")) + _txn_payloads(200, 8, (2, "b"))
    r1 = capture_to_file(
        _client(FakeServer(wal1)), "slot", "pub", cap
    )
    assert r1.transactions == 2
    assert _captured_ids(cap) == [b"1", b"2"]

    # the "restarted server" resends BOTH old transactions, then new C
    wal2 = wal1 + _txn_payloads(300, 9, (3, "c"))
    r2 = capture_to_file(
        _client(FakeServer(wal2)), "slot", "pub", cap
    )
    assert r2.transactions == 1  # only C counted
    assert r2.last_commit_lsn == 300
    assert _captured_ids(cap) == [b"1", b"2", b"3"]  # no duplicates


class _DroppingServer(FakeServer):
    """Streams its WAL then drops the socket with NO CopyDone — the
    mid-stream connection loss a killed walsender produces."""

    def _copy_both(self) -> None:
        self._send(_be("W", b"\x00" + struct.pack(">h", 0)))
        lsn = 0
        for payload in self.wal:
            lsn += 16
            self._send(_xlogdata(lsn, payload))
        self._sock.close()  # mid-stream death


def test_capture_with_retry_survives_connection_drop(tmp_path):
    """The reconnecting drain: attempt 1 dies mid-stream after txn A
    was appended+confirmed; attempt 2 (fresh connection, server resends
    from the confirmed point) completes. Totals aggregate across
    attempts; the file stays duplicate-free."""
    cap = str(tmp_path / "wal.capture")
    wal_a = _txn_payloads(100, 7, (1, "a"))
    wal_b = _txn_payloads(100, 7, (1, "a")) + _txn_payloads(200, 8, (2, "b"))
    servers = [
        _DroppingServer(wal_a),  # dies after streaming A
        FakeServer(wal_b),  # resume: resends A (skipped), delivers B
    ]

    def connect():
        return _client(servers.pop(0))

    report = capture_with_retry(connect, "slot", "pub", cap)
    assert report.transactions == 2  # A (attempt 1) + B (attempt 2)
    assert _captured_ids(cap) == [b"1", b"2"]


def test_capture_with_retry_gives_up_after_max_reconnects(tmp_path):
    import pytest

    from pgsink_spark.streaming.replication import ReplicationError

    cap = str(tmp_path / "wal.capture")

    def connect():
        return _client(_DroppingServer(_txn_payloads(100, 7, (1, "a"))))

    with pytest.raises((ReplicationError, OSError)):
        capture_with_retry(
            connect, "slot", "pub", cap, max_reconnects=2, backoff_s=0.01
        )
