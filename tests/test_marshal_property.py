"""Property-based tests for the tuple text parsers (streaming/marshal):
render values the way Postgres' text output format does, parse them
back, and require identity. Complements the fixed-case unit tests the
same way decoder fuzzing does for the wire layer."""

from __future__ import annotations

import datetime

from hypothesis import given, settings
from hypothesis import strategies as st

from pgsink_spark.streaming.marshal import text_parser_for

# OIDs: 16 bool, 17 bytea, 20 int8, 25 text, 701 float8, 1114 timestamp,
# 1009 _text (text[]), 1016 _int8 (int8[])


@settings(max_examples=300, deadline=None)
@given(v=st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_int8_roundtrip(v):
    assert text_parser_for(20)(str(v)) == v


@settings(max_examples=200, deadline=None)
@given(v=st.booleans())
def test_bool_roundtrip(v):
    assert text_parser_for(16)("t" if v else "f") is v


@settings(max_examples=200, deadline=None)
@given(v=st.binary(max_size=64))
def test_bytea_roundtrip(v):
    assert text_parser_for(17)("\\x" + v.hex()) == v


@settings(max_examples=200, deadline=None)
@given(
    v=st.floats(allow_nan=False, allow_infinity=False, width=64),
)
def test_float8_roundtrip(v):
    assert text_parser_for(701)(repr(v)) == v


@settings(max_examples=200, deadline=None)
@given(
    v=st.datetimes(
        min_value=datetime.datetime(1900, 1, 1),
        max_value=datetime.datetime(2200, 1, 1),
    )
)
def test_timestamp_roundtrip(v):
    # PG renders 'YYYY-MM-DD HH:MM:SS[.ffffff]'
    assert text_parser_for(1114)(v.isoformat(sep=" ")) == v


def _pg_array_literal(items: list[str | None]) -> str:
    """Render a text[] the way Postgres does: NULL unquoted for nulls;
    quote any element containing specials, spelling NULL, or empty."""
    out = []
    for it in items:
        if it is None:
            out.append("NULL")
            continue
        needs_quote = (
            it == ""
            or it.upper() == "NULL"
            or any(c in it for c in '{},"\\ \t\n')
        )
        if needs_quote:
            out.append('"' + it.replace("\\", "\\\\").replace('"', '\\"') + '"')
        else:
            out.append(it)
    return "{" + ",".join(out) + "}"


text_elem = st.one_of(
    st.none(),
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)),
        max_size=20,
    ),
)


@settings(max_examples=300, deadline=None)
@given(items=st.lists(text_elem, max_size=8))
def test_text_array_roundtrip(items):
    got = text_parser_for(1009)(_pg_array_literal(items))
    assert got == items


@settings(max_examples=200, deadline=None)
@given(
    items=st.lists(
        st.one_of(st.none(), st.integers(-(2**63), 2**63 - 1)), max_size=8
    )
)
def test_int8_array_roundtrip(items):
    lit = "{" + ",".join("NULL" if v is None else str(v) for v in items) + "}"
    assert text_parser_for(1016)(lit) == items


def test_quoted_null_string_is_a_value_not_null():
    """PG quotes a *string* spelling NULL; only the bare token is null."""
    assert text_parser_for(1009)('{NULL,"NULL"}') == [None, "NULL"]
