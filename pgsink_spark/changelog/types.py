"""Postgres → Spark type registry.

Re-expresses the reference's code-generated OID→Go mapping table
(reference pkg/decode/gen/mappings/mappings.go:19-209) as a Postgres
type-name/OID → Spark ``DataType`` registry, with the same explicit
*unsupported* surface: unknown types raise ``UnregisteredType`` on
sight (reference pkg/decode/decode.go:32-40) rather than silently
degrading.

Deliberate deviations, flagged in SURVEY.md §1.3/§7:

- ``numeric`` maps to ``DecimalType(38, 18)`` by default; the
  reference's lossy float64 behavior (mappings.go:200-204) is available
  as ``numeric_as_double=True`` for bug-compat.
- unsigned 32-bit catalog types (oid/xid/cid) widen to LongType.
- ``date`` stays DateType (the reference collapses all temporal types
  to time.Time).
"""

from __future__ import annotations

from pyspark.sql import types as T


class UnregisteredType(ValueError):
    """Raised for Postgres types the engine refuses to guess at."""

    def __init__(self, pg_type: str | int):
        super().__init__(
            f"unsupported postgres type {pg_type!r}: no registered Spark "
            "mapping (reference parity: decode.UnregisteredType)"
        )
        self.pg_type = pg_type


def _decimal() -> T.DataType:
    return T.DecimalType(38, 18)


# name → (OID, Spark type factory)
_SCALARS: dict[str, tuple[int, T.DataType]] = {
    "bool": (16, T.BooleanType()),
    "bytea": (17, T.BinaryType()),
    "name": (19, T.StringType()),
    "int8": (20, T.LongType()),
    "int2": (21, T.ShortType()),
    "int4": (23, T.IntegerType()),
    "text": (25, T.StringType()),
    "oid": (26, T.LongType()),
    "xid": (28, T.LongType()),
    "cid": (29, T.LongType()),
    "json": (114, T.StringType()),
    "float4": (700, T.FloatType()),
    "float8": (701, T.DoubleType()),
    "varchar": (1043, T.StringType()),
    "date": (1082, T.DateType()),
    "time": (1083, T.StringType()),  # time-of-day has no Spark type
    "timestamp": (1114, T.TimestampNTZType()),
    "timestamptz": (1184, T.TimestampType()),
    "numeric": (1700, _decimal()),
    "jsonb": (3802, T.StringType()),
}

# array type name → (OID, element type name). Matches the reference's
# supported _-prefixed array OIDs (mappings.go:97-145, 158-198).
_ARRAYS: dict[str, tuple[int, str]] = {
    "_bool": (1000, "bool"),
    "_int2": (1005, "int2"),
    "_int4": (1007, "int4"),
    "_text": (1009, "text"),
    "_varchar": (1015, "varchar"),
    "_int8": (1016, "int8"),
    "_float4": (1021, "float4"),
    "_float8": (1022, "float8"),
    "_timestamp": (1115, "timestamp"),
    "_date": (1182, "date"),
    "_timestamptz": (1185, "timestamptz"),
    "_numeric": (1231, "numeric"),
}

# Types the reference explicitly rejects (mappings.go:214-345): keep the
# same refusal so behavior matches — geometric, network, uuid, interval,
# bit, ranges, bpchar, _jsonb ...
UNSUPPORTED: frozenset[str] = frozenset(
    {
        "point", "lseg", "path", "box", "polygon", "line", "circle",
        "cidr", "inet", "macaddr", "macaddr8", "uuid", "interval",
        "bit", "varbit", "bpchar", "money", "tsvector", "tsquery",
        "int4range", "int8range", "numrange", "tsrange", "tstzrange",
        "daterange", "_jsonb",
    }
)

_BY_OID: dict[int, str] = {oid: name for name, (oid, _) in _SCALARS.items()}
_BY_OID.update({oid: name for name, (oid, _) in _ARRAYS.items()})

# Extended tier: types the reference REJECTS (mappings.go Unsupported —
# "can't parse them into a sensibly common Golang type") but Spark can
# carry losslessly in their Postgres text form. Opt-in via
# ``extended=True`` so the default contract stays reject-on-sight
# parity; a pipeline that needs uuid/interval/inet columns flips the
# flag instead of forking the registry.
_EXTENDED_SCALARS: dict[str, tuple[int, T.DataType]] = {
    "uuid": (2950, T.StringType()),
    "interval": (1186, T.StringType()),
    "inet": (869, T.StringType()),
    "macaddr": (829, T.StringType()),
    "bpchar": (1042, T.StringType()),
    "bit": (1560, T.StringType()),
    "varbit": (1562, T.StringType()),
    "int4range": (3904, T.StringType()),
    "int8range": (3926, T.StringType()),
    "numrange": (3906, T.StringType()),
    "tsrange": (3908, T.StringType()),
    "tstzrange": (3910, T.StringType()),
    "daterange": (3912, T.StringType()),
}
_EXTENDED_ARRAYS: dict[str, tuple[int, str]] = {
    "_uuid": (2951, "uuid"),
    "_bpchar": (1014, "bpchar"),
    "_jsonb": (3807, "jsonb"),
    "_bytea": (1001, "bytea"),
}
_EXT_BY_OID: dict[int, str] = {
    oid: name for name, (oid, _) in _EXTENDED_SCALARS.items()
}
_EXT_BY_OID.update({oid: name for name, (oid, _) in _EXTENDED_ARRAYS.items()})


def spark_type_for(
    pg_type: str | int,
    numeric_as_double: bool = False,
    extended: bool = False,
) -> T.DataType:
    """Spark DataType for a Postgres type name or OID.

    Raises ``UnregisteredType`` for anything outside the registry — the
    same contract as the reference's decoder. ``extended=True``
    additionally accepts the reference's Unsupported list as lossless
    text/binary columns (see _EXTENDED_SCALARS).
    """
    name = _BY_OID.get(pg_type) if isinstance(pg_type, int) else pg_type
    if name is None and extended and isinstance(pg_type, int):
        name = _EXT_BY_OID.get(pg_type)
    if name is None:
        raise UnregisteredType(pg_type)
    if name in _SCALARS:
        dt = _SCALARS[name][1]
        if name == "numeric" and numeric_as_double:
            return T.DoubleType()
        return dt
    if name in _ARRAYS:
        elem = spark_type_for(_ARRAYS[name][1], numeric_as_double)
        return T.ArrayType(elem, containsNull=True)
    if extended:
        if name in _EXTENDED_SCALARS:
            return _EXTENDED_SCALARS[name][1]
        if name in _EXTENDED_ARRAYS:
            elem = spark_type_for(
                _EXTENDED_ARRAYS[name][1], numeric_as_double, extended=True
            )
            return T.ArrayType(elem, containsNull=True)
    raise UnregisteredType(name)


def supported_type_names() -> list[str]:
    return sorted(_SCALARS) + sorted(_ARRAYS)
