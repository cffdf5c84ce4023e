"""Replication-protocol client tests against an in-process fake server.

Mirrors the reference's subscription tests
(pkg/subscription/subscription_test.go:65-307): schema + modification
delivery over a live socket, keepalive/standby-status handling, and the
no-redelivery-after-confirm property — here driven through a fake
Postgres speaking the v3 replication subset, since the container has no
live database.
"""

from __future__ import annotations

import datetime
import socket
import struct
import threading
from datetime import timezone

import pytest

from pgsink_spark.streaming.decoder import (
    Relation,
    RelationColumn,
    encode_begin,
    encode_commit,
    encode_insert,
    encode_relation,
)
from pgsink_spark.streaming.offsets import OffsetStore
from pgsink_spark.streaming.replication import (
    Keepalive,
    ReplicationClient,
    ReplicationError,
    XLogData,
    live_wire,
    lsn_to_str,
    parse_lsn,
    pg_clock_us,
)
from pgsink_spark.streaming.subscription import Subscription

TS = datetime.datetime(2024, 3, 1, 12, 0, 0, tzinfo=timezone.utc)

REL = Relation(
    oid=16384,
    namespace="public",
    name="example",
    replica_identity=0,
    columns=(
        RelationColumn(key=True, name="id", type_oid=20, modifier=0xFFFFFFFF),
        RelationColumn(key=False, name="v", type_oid=25, modifier=0xFFFFFFFF),
    ),
)


def _txn_payloads(lsn: int, xid: int, *rows) -> list[bytes]:
    return [
        encode_begin(lsn, TS, xid),
        encode_relation(REL),
        *[encode_insert(REL.oid, row) for row in rows],
        encode_commit(0, lsn, lsn + 1, TS),
    ]


def _be(kind: str, payload: bytes) -> bytes:
    """One framed backend message."""
    return kind.encode() + struct.pack(">i", len(payload) + 4) + payload


def _xlogdata(lsn: int, payload: bytes) -> bytes:
    body = b"w" + struct.pack(">QQq", lsn, lsn, 0) + payload
    return _be("d", body)


def _keepalive(lsn: int, reply: bool) -> bytes:
    body = b"k" + struct.pack(">Qqb", lsn, 0, 1 if reply else 0)
    return _be("d", body)


class FakeServer:
    """Scripted replication server on one end of a socketpair."""

    def __init__(self, wal: list[bytes], require_password: str | None = None):
        self.wal = wal
        self.require_password = require_password
        self.client_sock, self._sock = socket.socketpair()
        self.standby_updates: list[tuple[int, int, int, bool]] = []
        self.startup_params: dict[str, str] = {}
        self._buf = b""
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    # -- protocol plumbing ----------------------------------------------

    def _read_exact(self, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = self._sock.recv(65536)
            if not chunk:
                raise ConnectionError("client closed")
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def _read_startup(self) -> None:
        (length,) = struct.unpack(">i", self._read_exact(4))
        payload = self._read_exact(length - 4)
        assert struct.unpack(">i", payload[:4])[0] == 196608
        parts = payload[4:].rstrip(b"\x00").split(b"\x00")
        self.startup_params = {
            parts[i].decode(): parts[i + 1].decode()
            for i in range(0, len(parts) - 1, 2)
        }

    def _read_frontend(self) -> tuple[str, bytes]:
        head = self._read_exact(5)
        (length,) = struct.unpack(">i", head[1:5])
        return chr(head[0]), self._read_exact(length - 4)

    def _send(self, data: bytes) -> None:
        self._sock.sendall(data)

    def _ready(self) -> None:
        self._send(_be("Z", b"I"))

    # -- the script ------------------------------------------------------

    def _run(self) -> None:
        try:
            self._read_startup()
            if self.require_password is not None:
                self._send(_be("R", struct.pack(">i", 3)))
                kind, payload = self._read_frontend()
                assert kind == "p"
                if payload.rstrip(b"\x00").decode() != self.require_password:
                    self._send(_be("E", b"SFATAL\x00Mbad password\x00\x00"))
                    return
            self._send(_be("R", struct.pack(">i", 0)))  # AuthenticationOk
            self._send(
                _be("S", b"server_version\x0016.0\x00")
            )  # ParameterStatus
            self._ready()

            while True:
                kind, payload = self._read_frontend()
                if kind != "Q":
                    continue
                sql = payload.rstrip(b"\x00").decode()
                if sql == "IDENTIFY_SYSTEM":
                    self._identify_system()
                elif sql.startswith("START_REPLICATION"):
                    self._copy_both()
                    return
                else:
                    self._send(_be("E", b"MFunknown command\x00\x00"))
                    self._ready()
        except (ConnectionError, OSError, AssertionError):
            pass
        finally:
            self._sock.close()

    def _identify_system(self) -> None:
        cols = [b"systemid", b"timeline", b"xlogpos", b"dbname"]
        desc = struct.pack(">h", len(cols))
        for c in cols:
            desc += c + b"\x00" + struct.pack(">ihihih", 0, 0, 25, -1, -1, 0)
        self._send(_be("T", desc))
        vals = [b"7001", b"1", b"0/5000", b"testdb"]
        row = struct.pack(">h", len(vals))
        for v in vals:
            row += struct.pack(">i", len(v)) + v
        self._send(_be("D", row))
        self._send(_be("C", b"IDENTIFY_SYSTEM\x00"))
        self._ready()

    def _copy_both(self) -> None:
        self._send(_be("W", b"\x00" + struct.pack(">h", 0)))
        lsn = 0
        for payload in self.wal:
            lsn += 16
            self._send(_xlogdata(lsn, payload))
        # demand a status update, then drain every update the client
        # has queued (interval heartbeats + the reply) before CopyDone
        self._send(_keepalive(lsn, True))
        self._sock.settimeout(0.3)
        try:
            while True:
                kind, payload = self._read_frontend()
                if kind == "d" and payload[:1] == b"r":
                    write, flush, apply_, _clock, reply = struct.unpack(
                        ">QQQqb", payload[1:34]
                    )
                    self.standby_updates.append(
                        (write, flush, apply_, bool(reply))
                    )
        except (TimeoutError, socket.timeout):
            pass
        self._sock.settimeout(None)
        self._send(_be("c", b""))  # CopyDone

    def join(self, timeout: float = 5.0) -> None:
        self._thread.join(timeout)


# -- unit: helpers ------------------------------------------------------

def test_lsn_text_roundtrip():
    for lsn in (0, 1, 0x16B3748, (7 << 32) | 0xDEADBEEF):
        assert parse_lsn(lsn_to_str(lsn)) == lsn
    assert lsn_to_str(0x100000000) == "1/0"


def test_pg_clock_epoch():
    # 2000-01-01T00:00:00Z is zero on the Postgres clock
    assert pg_clock_us(946_684_800.0) == 0


# -- protocol: session setup -------------------------------------------

def _connect(server: FakeServer, password: str | None = None):
    client = ReplicationClient(
        server.client_sock, "testdb", "repl", password=password
    )
    client.connect()
    return client


def test_startup_requests_logical_replication():
    server = FakeServer([])
    _connect(server)
    assert server.startup_params["replication"] == "database"
    assert server.startup_params["database"] == "testdb"


def test_identify_system():
    server = FakeServer([])
    client = _connect(server)
    info = client.identify_system()
    assert info["systemid"] == "7001"
    assert parse_lsn(info["xlogpos"]) == 0x5000


def test_cleartext_auth():
    server = FakeServer([], require_password="sekrit")
    client = _connect(server, password="sekrit")
    assert client.identify_system()["dbname"] == "testdb"


def test_wrong_password_is_an_error():
    server = FakeServer([], require_password="sekrit")
    client = ReplicationClient(
        server.client_sock, "testdb", "repl", password="nope"
    )
    with pytest.raises(ReplicationError):
        client.connect()
        client.identify_system()


# -- protocol: CopyBoth loop -------------------------------------------

def test_receive_loop_demuxes_and_replies():
    wal = _txn_payloads(100, 7, (1, "a"), (2, "b"))
    server = FakeServer(wal)
    client = _connect(server)
    client.start_replication("slot1", "pub1", 0)
    client.flush_lsn = 42
    got = list(client.messages())
    xlog = [m for m in got if isinstance(m, XLogData)]
    kas = [m for m in got if isinstance(m, Keepalive)]
    assert [m.payload for m in xlog] == wal
    assert len(kas) == 1 and kas[0].reply_requested
    server.join()
    # the reply carried our flush watermark
    assert server.standby_updates == [(42, 42, 42, False)]


def test_live_wire_feeds_subscription(tmp_path):
    """e2e: socket → decode → sequence → marshal → confirm → standby
    status; then a replayed session delivers nothing below the
    confirmed LSN (reference subscription_test.go:205-262)."""
    wal = _txn_payloads(100, 7, (1, "a")) + _txn_payloads(200, 8, (2, "b"))
    offsets = OffsetStore(str(tmp_path / "offsets.json"))

    server = FakeServer(wal)
    client = _connect(server)
    client.start_replication("slot1", "pub1", 0)
    sub = Subscription(offsets)
    mods = list(sub.stream(live_wire(client)))
    assert [(m.lsn, m.after["id"]) for m in mods] == [(100, 1), (200, 2)]

    # ack everything flushed; the keepalive reply already went out with
    # the pre-confirm watermark, so push one explicit update after
    sub.confirm(200)
    client.flush_lsn = offsets.confirmed_lsn
    server.join()
    assert server.standby_updates[0][3] is False

    # "restart": new session replays the slot from the beginning —
    # everything at or below confirmed_flush_lsn must be dropped
    server2 = FakeServer(wal)
    client2 = _connect(server2)
    client2.start_replication("slot1", "pub1", offsets.confirmed_lsn)
    sub2 = Subscription(OffsetStore(str(tmp_path / "offsets.json")))
    mods2 = list(sub2.stream(live_wire(client2)))
    assert mods2 == []


def test_heartbeat_on_interval():
    """Status updates flow even without reply-requested keepalives."""
    wal = _txn_payloads(100, 7, (1, "a"))
    server = FakeServer(wal)
    fake_now = [0.0]

    client = ReplicationClient(
        server.client_sock,
        "testdb",
        "repl",
        heartbeat_interval_s=30.0,
        clock=lambda: fake_now[0],
    )
    client.connect()
    client.start_replication("slot1", "pub1", 0)
    # advance past the heartbeat interval mid-stream
    fake_now[0] = 31.0
    list(client.messages())
    server.join()
    # one interval heartbeat + one keepalive reply
    assert client.status_updates_sent >= 2
