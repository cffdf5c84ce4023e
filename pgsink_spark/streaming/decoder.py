"""pgoutput binary message decoder (pure Python, pure functions).

Parses PostgreSQL's logical streaming replication output plugin
messages — the public wire format documented in the PostgreSQL manual
("Protocol → Logical Streaming Replication → Message Formats"). The
reference decodes the same format in Go (pkg/logical/decoder.go:17-132);
this is an independent implementation from the public spec.

Message kinds (first byte): B=Begin C=Commit O=Origin R=Relation Y=Type
I=Insert U=Update D=Delete T=Truncate. Tuple data elements are
'n' (null), 'u' (unchanged TOAST), 't' (text value, int32 length).

Timestamps on the wire are microseconds since the Postgres epoch
2000-01-01 (decoder parity: pkg/logical/decoder.go:178-182).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass
from datetime import datetime, timedelta, timezone

PG_EPOCH = datetime(2000, 1, 1, tzinfo=timezone.utc)


def pg_timestamp(micros: int) -> datetime:
    """Microseconds since 2000-01-01 → aware datetime (UTC).

    A wire value outside datetime's year range (corrupt frame, junk
    bytes) must surface as the decoder's controlled error class, not
    an OverflowError leaking from datetime arithmetic — found by the
    junk-bytes hypothesis property."""
    try:
        return PG_EPOCH + timedelta(microseconds=micros)
    except OverflowError as e:
        raise ValueError(
            f"pgoutput timestamp out of range: {micros} µs since 2000-01-01"
        ) from e


@dataclass(frozen=True)
class Begin:
    final_lsn: int
    commit_time: datetime
    xid: int


@dataclass(frozen=True)
class Commit:
    flags: int
    commit_lsn: int
    end_lsn: int
    commit_time: datetime


@dataclass(frozen=True)
class Origin:
    commit_lsn: int
    name: str


@dataclass(frozen=True)
class RelationColumn:
    key: bool
    name: str
    type_oid: int
    modifier: int


@dataclass(frozen=True)
class Relation:
    oid: int
    namespace: str
    name: str
    replica_identity: int
    columns: tuple[RelationColumn, ...]


@dataclass(frozen=True)
class TypeMessage:
    oid: int
    namespace: str
    name: str


# Tuple elements: None for 'n' (SQL NULL), UNCHANGED sentinel for 'u'
# (TOAST value not sent), bytes for 't'.
UNCHANGED = object()


@dataclass(frozen=True)
class Insert:
    relation_oid: int
    new: tuple


@dataclass(frozen=True)
class Update:
    relation_oid: int
    old: tuple | None  # present only with REPLICA IDENTITY FULL / key change
    key: tuple | None
    new: tuple


@dataclass(frozen=True)
class Delete:
    relation_oid: int
    old: tuple | None
    key: tuple | None


@dataclass(frozen=True)
class Truncate:
    options: int
    relation_oids: tuple[int, ...]


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def u8(self) -> int:
        v = self.buf[self.pos]
        self.pos += 1
        return v

    def i16(self) -> int:
        (v,) = struct.unpack_from(">h", self.buf, self.pos)
        self.pos += 2
        return v

    def i32(self) -> int:
        (v,) = struct.unpack_from(">i", self.buf, self.pos)
        self.pos += 4
        return v

    def u32(self) -> int:
        (v,) = struct.unpack_from(">I", self.buf, self.pos)
        self.pos += 4
        return v

    def i64(self) -> int:
        (v,) = struct.unpack_from(">q", self.buf, self.pos)
        self.pos += 8
        return v

    def u64(self) -> int:
        (v,) = struct.unpack_from(">Q", self.buf, self.pos)
        self.pos += 8
        return v

    def cstring(self) -> str:
        end = self.buf.index(b"\x00", self.pos)
        s = self.buf[self.pos : end].decode("utf-8")
        self.pos = end + 1
        return s

    def take(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        self.pos += n
        return b


_I16_AT = struct.Struct(">h").unpack_from
_U32_AT = struct.Struct(">I").unpack_from


def _tuple_data(r: _Reader) -> tuple:
    # hot path: one call per DML column in the stream — inline the
    # cursor arithmetic on locals (measured ~2× over per-field reader
    # method calls; this loop dominates wire-decode CPU)
    buf = r.buf
    pos = r.pos
    (n,) = _I16_AT(buf, pos)
    pos += 2
    out = []
    append = out.append
    for _ in range(n):
        kind = buf[pos]
        pos += 1
        if kind == 0x74:  # 't' — text datum, u32 length prefix
            (ln,) = _U32_AT(buf, pos)
            pos += 4
            append(buf[pos : pos + ln])
            pos += ln
        elif kind == 0x6E:  # 'n' — NULL
            append(None)
        elif kind == 0x75:  # 'u' — unchanged TOAST
            append(UNCHANGED)
        else:
            raise ValueError(f"unknown tuple element kind {chr(kind)!r}")
    r.pos = pos
    return tuple(out)


def decode_message(buf: bytes):
    """Decode one pgoutput message; raises ValueError on unknown kinds.

    Dispatch compares the raw kind byte (no chr()) ordered by stream
    frequency — DML first, then txn framing — since this runs once per
    wire message on the decode hot path.
    """
    r = _Reader(buf)
    k = buf[0]
    r.pos = 1
    if k == 0x49:  # 'I'
        oid = r.u32()
        tag = chr(r.u8())
        if tag != "N":
            raise ValueError(f"insert expects 'N' tuple, got {tag!r}")
        return Insert(oid, _tuple_data(r))
    if k == 0x55:  # 'U'
        oid = r.u32()
        old = key = None
        tag = chr(r.u8())
        if tag == "K":
            key = _tuple_data(r)
            tag = chr(r.u8())
        elif tag == "O":
            old = _tuple_data(r)
            tag = chr(r.u8())
        if tag != "N":
            raise ValueError(f"update expects 'N' tuple, got {tag!r}")
        return Update(oid, old, key, _tuple_data(r))
    if k == 0x44:  # 'D'
        oid = r.u32()
        tag = chr(r.u8())
        if tag == "K":
            return Delete(oid, None, _tuple_data(r))
        if tag == "O":
            return Delete(oid, _tuple_data(r), None)
        raise ValueError(f"delete expects 'K'/'O' tuple, got {tag!r}")
    kind = chr(k)
    if kind == "B":
        return Begin(r.u64(), pg_timestamp(r.i64()), r.u32())
    if kind == "C":
        return Commit(r.u8(), r.u64(), r.u64(), pg_timestamp(r.i64()))
    if kind == "O":
        return Origin(r.u64(), r.cstring())
    if kind == "R":
        oid = r.u32()
        ns = r.cstring()
        name = r.cstring()
        ident = r.u8()
        ncols = r.i16()
        cols = tuple(
            RelationColumn(
                key=bool(r.u8() & 1),
                name=r.cstring(),
                type_oid=r.u32(),
                modifier=r.u32(),
            )
            for _ in range(ncols)
        )
        return Relation(oid, ns, name, ident, cols)
    if kind == "Y":
        return TypeMessage(r.u32(), r.cstring(), r.cstring())
    if kind == "T":
        n = r.i32()
        options = r.u8()
        return Truncate(options, tuple(r.u32() for _ in range(n)))
    raise ValueError(f"unknown pgoutput message kind {kind!r}")


# ---------------------------------------------------------------------------
# Encoders (test/replay harness — lets the decoder be exercised without a
# live Postgres, the way the reference's decoder tests feed fixed bytes).

def _enc_cstring(s: str) -> bytes:
    return s.encode("utf-8") + b"\x00"


def _enc_tuple(values: tuple) -> bytes:
    out = struct.pack(">h", len(values))
    for v in values:
        if v is None:
            out += b"n"
        elif v is UNCHANGED:
            out += b"u"
        else:
            b = v if isinstance(v, bytes) else str(v).encode("utf-8")
            out += b"t" + struct.pack(">I", len(b)) + b
    return out


def _pg_micros(commit_time: datetime) -> int:
    """Integer µs since the PG epoch. timedelta.total_seconds() is a
    float and silently drops microseconds once the delta exceeds ~2^53
    µs (decades) — use exact integer fields instead."""
    d = commit_time - PG_EPOCH
    return (d.days * 86_400 + d.seconds) * 1_000_000 + d.microseconds


def encode_begin(final_lsn: int, commit_time: datetime, xid: int) -> bytes:
    return b"B" + struct.pack(">QqI", final_lsn, _pg_micros(commit_time), xid)


def encode_commit(flags: int, commit_lsn: int, end_lsn: int, commit_time: datetime) -> bytes:
    return b"C" + struct.pack(
        ">BQQq", flags, commit_lsn, end_lsn, _pg_micros(commit_time)
    )


def encode_relation(rel: Relation) -> bytes:
    out = b"R" + struct.pack(">I", rel.oid)
    out += _enc_cstring(rel.namespace) + _enc_cstring(rel.name)
    out += struct.pack(">Bh", rel.replica_identity, len(rel.columns))
    for c in rel.columns:
        out += struct.pack(">B", 1 if c.key else 0)
        out += _enc_cstring(c.name)
        # mask: atttypmod -1 rides the unsigned wire as 0xFFFFFFFF
        out += struct.pack(">II", c.type_oid & 0xFFFFFFFF, c.modifier & 0xFFFFFFFF)
    return out


def encode_insert(relation_oid: int, new: tuple) -> bytes:
    return b"I" + struct.pack(">I", relation_oid) + b"N" + _enc_tuple(new)


def encode_update(
    relation_oid: int, new: tuple, old: tuple | None = None, key: tuple | None = None
) -> bytes:
    out = b"U" + struct.pack(">I", relation_oid)
    if key is not None:
        out += b"K" + _enc_tuple(key)
    elif old is not None:
        out += b"O" + _enc_tuple(old)
    return out + b"N" + _enc_tuple(new)


def encode_delete(relation_oid: int, old: tuple | None = None, key: tuple | None = None) -> bytes:
    out = b"D" + struct.pack(">I", relation_oid)
    if key is not None:
        return out + b"K" + _enc_tuple(key)
    return out + b"O" + _enc_tuple(old or ())
