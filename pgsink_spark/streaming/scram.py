"""SCRAM-SHA-256 client authentication (RFC 5802 / RFC 7677).

Modern Postgres defaults to ``password_encryption = scram-sha-256``,
so the replication client must speak SCRAM to connect to any stock
PG 14+ or managed instance — the reference inherits this from its
driver (pkg/subscription/subscription.go:80-111 via pgx); here it is
implemented directly from the public RFCs on ``hashlib``/``hmac``.

Pure, side-effect-free state machine: ``ScramClient`` produces the
client-first / client-final messages and verifies the server
signature; the socket layer (streaming/replication.py) moves the bytes
inside the Postgres SASL envelope (AuthenticationSASL /
SASLInitialResponse / SASLContinue / SASLFinal). Channel binding is
not offered (gs2 header ``n,,``) — the standard posture for
SCRAM-SHA-256 without ``-PLUS``.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import secrets

MECHANISM = "SCRAM-SHA-256"
_GS2 = "n,,"  # no channel binding
_GS2_B64 = base64.b64encode(_GS2.encode()).decode()  # "biws"


class ScramError(ValueError):
    pass


def _h(data: bytes) -> bytes:
    return hashlib.sha256(data).digest()


def _hmac(key: bytes, msg: bytes) -> bytes:
    return hmac.new(key, msg, hashlib.sha256).digest()


def _xor(a: bytes, b: bytes) -> bytes:
    return bytes(x ^ y for x, y in zip(a, b))


def salted_password(password: str, salt: bytes, iterations: int) -> bytes:
    """Hi() from RFC 5802 == PBKDF2-HMAC-SHA256 (RFC 7677 §3)."""
    # SASLprep (RFC 4013) reduces to identity for ASCII; reject the
    # cases we don't normalize rather than silently mis-hashing.
    if any(ord(c) < 0x20 for c in password):
        raise ScramError("control characters in password")
    return hashlib.pbkdf2_hmac(
        "sha256", password.encode("utf-8"), salt, iterations
    )


def _parse_attrs(msg: str) -> dict[str, str]:
    out = {}
    for part in msg.split(","):
        if len(part) >= 2 and part[1] == "=":
            out[part[0]] = part[2:]
    return out


class ScramClient:
    """One SCRAM-SHA-256 exchange.

    >>> c = ScramClient('secret')
    >>> first = c.client_first()          # → SASLInitialResponse data
    >>> final = c.client_final(server_first)   # → SASLResponse data
    >>> c.verify_server_final(server_final)    # raises on bad server sig
    """

    def __init__(
        self, password: str, nonce: str | None = None, username: str = ""
    ):
        # Postgres ignores the SCRAM n= username (the startup packet
        # already named the role), so it defaults empty; the RFC 7677
        # test vector sets it explicitly.
        self.password = password
        self.nonce = nonce or base64.b64encode(secrets.token_bytes(18)).decode()
        if "," in self.nonce:
            raise ScramError("nonce must not contain ','")
        self._client_first_bare = f"n={username},r={self.nonce}"
        self._auth_message: bytes | None = None
        self._salted: bytes | None = None

    def client_first(self) -> bytes:
        return (_GS2 + self._client_first_bare).encode()

    def client_final(self, server_first: bytes) -> bytes:
        sf = server_first.decode()
        attrs = _parse_attrs(sf)
        try:
            full_nonce = attrs["r"]
            salt = base64.b64decode(attrs["s"])
            iterations = int(attrs["i"])
        except (KeyError, ValueError) as e:
            raise ScramError(f"malformed server-first: {sf!r}") from e
        if not full_nonce.startswith(self.nonce):
            raise ScramError("server nonce does not extend client nonce")
        if len(full_nonce) <= len(self.nonce):
            raise ScramError("server added no nonce entropy")
        if iterations < 1:
            raise ScramError(f"bad iteration count {iterations}")

        self._salted = salted_password(self.password, salt, iterations)
        client_key = _hmac(self._salted, b"Client Key")
        stored_key = _h(client_key)
        without_proof = f"c={_GS2_B64},r={full_nonce}"
        self._auth_message = ",".join(
            [self._client_first_bare, sf, without_proof]
        ).encode()
        client_sig = _hmac(stored_key, self._auth_message)
        proof = base64.b64encode(_xor(client_key, client_sig)).decode()
        return f"{without_proof},p={proof}".encode()

    def verify_server_final(self, server_final: bytes) -> None:
        """Mutual auth: the server proves it holds the ServerKey."""
        if self._auth_message is None or self._salted is None:
            raise ScramError("client_final must run before verification")
        attrs = _parse_attrs(server_final.decode())
        if "e" in attrs:
            raise ScramError(f"server rejected auth: {attrs['e']}")
        if "v" not in attrs:
            raise ScramError("server-final carries no verifier")
        server_key = _hmac(self._salted, b"Server Key")
        want = _hmac(server_key, self._auth_message)
        if not hmac.compare_digest(base64.b64decode(attrs["v"]), want):
            raise ScramError("server signature mismatch (MITM or bad server)")
