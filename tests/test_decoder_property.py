"""Property-based decoder tests (hypothesis): encode → decode is
identity over the full value space the wire format admits — the fuzzing
complement to the fixed-byte unit tests, mirroring how the reference
hardens its decoder with table-driven cases
(pkg/logical/decoder_test.go)."""

from __future__ import annotations

import datetime

from hypothesis import given, settings
from hypothesis import strategies as st

from pgsink_spark.streaming.decoder import (
    Relation,
    RelationColumn,
    decode_message,
    encode_begin,
    encode_commit,
    encode_delete,
    encode_insert,
    encode_relation,
    encode_update,
)

# wire-legal scalar ranges
u32 = st.integers(min_value=0, max_value=2**32 - 1)
u64 = st.integers(min_value=0, max_value=2**64 - 1)
# pg epoch microseconds: keep within years ~2000-2200 so the datetime
# round-trip stays in range
ts = st.datetimes(
    min_value=datetime.datetime(2000, 1, 2),
    max_value=datetime.datetime(2200, 1, 1),
    timezones=st.just(datetime.timezone.utc),
)
# identifier-ish strings: any non-NUL text (cstrings can't carry NUL)
ident = st.text(
    alphabet=st.characters(
        blacklist_characters="\x00", blacklist_categories=("Cs",)
    ),
    min_size=1,
    max_size=24,
)
# a column value on the wire: bytes, absent (None), or unchanged-TOAST
# (exercised separately because UNCHANGED is a sentinel, not a value)
cell = st.one_of(st.none(), st.binary(max_size=40))
row = st.tuples(*[cell] * 3) | st.tuples(*[cell] * 1) | st.tuples(*[cell] * 5)


@settings(max_examples=200, deadline=None)
@given(lsn=u64, t=ts, xid=u32)
def test_begin_roundtrip(lsn, t, xid):
    m = decode_message(encode_begin(lsn, t, xid))
    assert (m.final_lsn, m.commit_time, m.xid) == (lsn, t, xid)


@settings(max_examples=200, deadline=None)
@given(flags=st.integers(0, 255), c=u64, e=u64, t=ts)
def test_commit_roundtrip(flags, c, e, t):
    m = decode_message(encode_commit(flags, c, e, t))
    assert (m.flags, m.commit_lsn, m.end_lsn, m.commit_time) == (
        flags,
        c,
        e,
        t,
    )


@settings(max_examples=200, deadline=None)
@given(
    oid=u32,
    ns=ident,
    name=ident,
    ncols=st.integers(1, 8),
    data=st.data(),
)
def test_relation_roundtrip(oid, ns, name, ncols, data):
    cols = tuple(
        RelationColumn(
            key=data.draw(st.booleans()),
            name=data.draw(ident),
            type_oid=data.draw(u32),
            modifier=data.draw(u32),
        )
        for _ in range(ncols)
    )
    rel = Relation(oid, ns, name, 0, cols)
    m = decode_message(encode_relation(rel))
    assert m == rel


def _norm(tup):
    """Decoded cells come back as bytes/None; encoded input is the same."""
    return tuple(tup)


@settings(max_examples=200, deadline=None)
@given(oid=u32, new=row)
def test_insert_roundtrip(oid, new):
    m = decode_message(encode_insert(oid, new))
    assert m.relation_oid == oid and _norm(m.new) == new


@settings(max_examples=200, deadline=None)
@given(oid=u32, new=row, old=st.none() | row)
def test_update_roundtrip(oid, new, old):
    m = decode_message(encode_update(oid, new, old=old))
    assert m.relation_oid == oid and _norm(m.new) == new
    assert (m.old is None and old is None) or _norm(m.old) == old


@settings(max_examples=200, deadline=None)
@given(oid=u32, old=row)
def test_delete_roundtrip(oid, old):
    m = decode_message(encode_delete(oid, old=old))
    assert m.relation_oid == oid and _norm(m.old) == old


@settings(max_examples=100, deadline=None)
@given(junk=st.binary(min_size=1, max_size=64))
def test_junk_never_crashes_uncontrolled(junk):
    """Arbitrary bytes either decode to a message or raise a controlled
    error (ValueError from the decoder, struct.error from a short read)
    — never an unrelated exception type."""
    import struct as _struct

    try:
        decode_message(junk)
    except (ValueError, _struct.error, IndexError, UnicodeDecodeError):
        pass


@settings(max_examples=150, deadline=None)
@given(s=st.text(max_size=40))
def test_text_parsers_junk_is_controlled(s):
    """Every registered OID parser either parses arbitrary text or
    raises a controlled error (ValueError family / KeyError /
    IndexError) — never a type callers catching parse errors would
    miss (decimal.InvalidOperation is the one this caught)."""
    from pgsink_spark.changelog.types import _BY_OID
    from pgsink_spark.streaming.marshal import text_parser_for

    for oid in _BY_OID:
        try:
            text_parser_for(oid)(s)
        except (ValueError, KeyError, IndexError, OverflowError):
            pass


@settings(max_examples=100, deadline=None)
@given(junk=st.binary(max_size=200), cut=st.integers(min_value=0, max_value=200))
def test_capture_readers_tolerate_truncation(junk, cut, tmp_path_factory):
    """A capture file truncated mid-frame (crash during append) must
    read cleanly up to the last whole frame — both readers return,
    never raise, and agree with each other."""
    import os

    from pgsink_spark.streaming.datasource import (
        append_capture,
        iter_capture_from,
        read_capture,
    )

    d = tmp_path_factory.mktemp("cap")
    path = os.path.join(str(d), "c.capture")
    frames = [b"B" + junk, b"C" + junk[:10], b"I"]
    append_capture(path, frames)
    size = os.path.getsize(path)
    keep = min(cut, size)
    with open(path, "rb") as f:
        data = f.read(keep)
    with open(path, "wb") as f:
        f.write(data)
    a = read_capture(path)
    b = [buf for _, buf in iter_capture_from(path)]
    # whole frames only, in order, readers agree EXACTLY
    assert a == b
    for i, buf in enumerate(b):
        assert buf == frames[i]
