"""M0: envelope, operation derivation, type registry, fingerprints.

Mirrors the reference's decode test discipline (pkg/decode/decode_test.go:
every registered type round-trips a value AND a NULL) against the Spark
type registry, plus the modification semantics tests.
"""

from __future__ import annotations

import datetime
from decimal import Decimal

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pgsink_spark.changelog import (
    SchemaEntry,
    UnregisteredType,
    after_or_before,
    operation,
    schema_fingerprint,
    spark_type_for,
    table_diff,
    table_includes,
    to_envelope,
)
from pgsink_spark.changelog.envelope import with_operation
from pgsink_spark.changelog.types import UNSUPPORTED, supported_type_names

# One non-NULL example per registered scalar type (NULL case is applied
# to every type automatically below).
_EXAMPLES = {
    "bool": True,
    "bytea": b"\x01\x02",
    "name": "nm",
    "int8": 2**40,
    "int2": 12,
    "int4": 2**20,
    "text": "hello",
    "oid": 2**31 + 5,  # > int32: must widen, not wrap
    "xid": 2**31 + 6,
    "cid": 2**31 + 7,
    "json": '{"a":1}',
    "float4": 1.5,
    "float8": 2.25,
    "varchar": "vc",
    "date": datetime.date(2024, 1, 2),
    "time": "12:34:56",
    "timestamp": datetime.datetime(2024, 1, 2, 3, 4, 5),
    "timestamptz": datetime.datetime(2024, 1, 2, 3, 4, 5),
    "numeric": Decimal("1234.5678"),
    "jsonb": '{"b":2}',
}


@pytest.mark.parametrize("pg_type", sorted(_EXAMPLES))
def test_scalar_type_roundtrip(spark, pg_type):
    dt = spark_type_for(pg_type)
    schema = T.StructType([T.StructField("field", dt, True)])
    # mandatory NULL case + a real value, like decode_test.go requires
    df = spark.createDataFrame([(None,), (_EXAMPLES[pg_type],)], schema)
    got = [r["field"] for r in df.orderBy(F.col("field").asc_nulls_first()).collect()]
    assert got[0] is None
    assert got[1] is not None


def test_array_types_roundtrip(spark):
    dt = spark_type_for("_int4")
    assert dt == T.ArrayType(T.IntegerType(), True)
    schema = T.StructType([T.StructField("field", dt, True)])
    df = spark.createDataFrame([(None,), ([1, None, 3],)], schema)
    got = sorted((r["field"] for r in df.collect()), key=lambda v: v is not None)
    assert got[0] is None
    assert list(got[1]) == [1, None, 3]


def test_oid_lookup_matches_name_lookup():
    assert spark_type_for(23) == spark_type_for("int4")
    assert spark_type_for(1231) == spark_type_for("_numeric")


def test_numeric_bug_compat_flag():
    assert spark_type_for("numeric") == T.DecimalType(38, 18)
    assert spark_type_for("numeric", numeric_as_double=True) == T.DoubleType()


@pytest.mark.parametrize("bad", sorted(UNSUPPORTED) + ["no_such_type", 99999])
def test_unsupported_types_raise(bad):
    with pytest.raises(UnregisteredType):
        spark_type_for(bad)


def test_registry_is_complete():
    # 20 scalars + 12 arrays, mirroring mappings.go's supported set
    assert len(supported_type_names()) == 32


def test_operation_derivation(spark):
    rows = [
        # (lsn, before, after) → op
        (None, None, {"v": 1}, "IMPORT"),
        (10, None, {"v": 1}, "INSERT"),
        (11, {"v": 1}, None, "DELETE"),
        (12, {"v": 1}, {"v": 2}, "UPDATE"),
    ]
    payload = T.StructType([T.StructField("v", T.LongType())])
    schema = T.StructType(
        [
            T.StructField("lsn", T.LongType(), True),
            T.StructField("before", payload, True),
            T.StructField("after", payload, True),
            T.StructField("expect", T.StringType(), False),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    got = df.select(
        "expect", operation().alias("op"), after_or_before().alias("img")
    ).collect()
    for r in got:
        assert r["op"] == r["expect"]
    # delete keeps the before image; others keep after
    by_op = {r["op"]: r["img"] for r in got}
    assert by_op["DELETE"]["v"] == 1
    assert by_op["UPDATE"]["v"] == 2


def test_to_envelope_import_rows(spark, sf_dir):
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    env = with_operation(to_envelope(nation, "public", "nation"))
    rows = env.collect()
    assert len(rows) == nation.count()
    assert all(r["operation"] == "IMPORT" for r in rows)
    assert all(r["lsn"] is None and r["before"] is None for r in rows)
    assert {r["after"]["n_name"] for r in rows} == {
        r["n_name"] for r in nation.collect()
    }


def test_schema_fingerprint_stability_and_sensitivity():
    p1 = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
    )
    p2 = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.LongType())]
    )
    assert schema_fingerprint(p1, ["id"]) == schema_fingerprint(p1, ["id"])
    assert schema_fingerprint(p1, ["id"]) != schema_fingerprint(p2, ["id"])
    # key flag participates, like the reference's (key,name,type) tuple
    assert schema_fingerprint(p1, ["id"]) != schema_fingerprint(p1, [])

    e = SchemaEntry("public", "t", p1, ["id"], lsn=5)
    row = e.to_row()
    back = SchemaEntry.from_row(row)
    assert back.payload == p1
    assert back.fingerprint == e.fingerprint


def test_table_diff_and_includes(spark):
    a = spark.createDataFrame(
        [("public", "a"), ("public", "b"), ("other", "c")],
        ["namespace", "name"],
    )
    b = spark.createDataFrame([("public", "b")], ["namespace", "name"])
    diff = {(r[0], r[1]) for r in table_diff(a, b).collect()}
    incl = {(r[0], r[1]) for r in table_includes(a, b).collect()}
    assert diff == {("public", "a"), ("other", "c")}
    assert incl == {("public", "b")}


def test_extended_type_tier_opt_in():
    """Default contract: reject-on-sight parity with the reference's
    Unsupported list. extended=True carries those types as lossless
    text/binary instead."""
    import pytest
    from pyspark.sql import types as T

    from pgsink_spark.changelog.types import UnregisteredType, spark_type_for

    for t in ("uuid", "interval", "inet", "int8range"):
        with pytest.raises(UnregisteredType):
            spark_type_for(t)
        assert spark_type_for(t, extended=True) == T.StringType()
    # OID lookups too (2950 = uuid), and extended arrays keep elements
    with pytest.raises(UnregisteredType):
        spark_type_for(2950)
    assert spark_type_for(2950, extended=True) == T.StringType()
    assert spark_type_for("_uuid", extended=True) == T.ArrayType(
        T.StringType(), True
    )
    assert spark_type_for("_bytea", extended=True) == T.ArrayType(
        T.BinaryType(), True
    )
    # geometry stays rejected even extended (no lossless scalar form)
    with pytest.raises(UnregisteredType):
        spark_type_for("point", extended=True)


def test_cast_envelope_strict_vs_lenient(spark):
    """Schema-cast posture: strict (default) fail-stops on a malformed
    datum under ANSI mode — the reference's decode-error contract —
    while strict=False quarantines it as NULL and the batch survives."""
    import pytest
    from pyspark.sql import types as T

    from pgsink_spark.changelog.envelope import cast_envelope
    from pgsink_spark.streaming.datasource import GENERIC_ENVELOPE

    payload = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
    )
    import datetime

    rows = [
        (datetime.datetime(2024, 1, 1), "public", "kv", 10, 1,
         None, {"id": "1", "v": "a"}),
        (datetime.datetime(2024, 1, 1), "public", "kv", 20, 1,
         None, {"id": "oops", "v": "b"}),  # malformed bigint
    ]
    env = spark.createDataFrame(rows, GENERIC_ENVELOPE)

    with pytest.raises(Exception, match="CAST_INVALID_INPUT"):
        cast_envelope(env, payload).collect()

    got = {r["lsn"]: r["after"]["id"]
           for r in cast_envelope(env, payload, strict=False).collect()}
    assert got == {10: 1, 20: None}  # quarantined as NULL, batch survives
    # absent map keys are NULL in both modes
    env2 = spark.createDataFrame(
        [(datetime.datetime(2024, 1, 1), "public", "kv", 30, 1,
          None, {"id": "3"})], GENERIC_ENVELOPE)
    row = cast_envelope(env2, payload).collect()[0]
    assert row["after"]["id"] == 3 and row["after"]["v"] is None


def test_envelope_avro_schema():
    """Serializer-plane parity (pkg/changelog/serialize): the Avro
    record for a typed envelope — valid per Avro's own rules (single
    named payload record, referenced by name on reuse; nullable unions
    defaulting null)."""
    import json as _json

    from pyspark.sql import types as T

    from pgsink_spark.changelog import SchemaEntry
    from pgsink_spark.changelog.avro import avro_type_of, envelope_avro_schema

    payload = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("price", T.DecimalType(12, 2)),
        T.StructField("tags", T.ArrayType(T.StringType())),
        T.StructField("ts", T.TimestampType()),
    ])
    schema = envelope_avro_schema(SchemaEntry("public", "orders", payload, ["id"]))
    _json.dumps(schema)  # serializable end-to-end

    fields = {f["name"]: f for f in schema["fields"]}
    assert fields["lsn"]["type"] == ["null", "long"]
    before_t = fields["before"]["type"][1]
    assert before_t["type"] == "record"
    by_name = {f["name"]: f for f in before_t["fields"]}
    assert by_name["price"]["type"][1]["logicalType"] == "decimal"
    assert by_name["tags"]["type"][1]["items"] == "string"
    assert by_name["ts"]["type"][1]["logicalType"] == "timestamp-micros"
    # after references the payload record BY NAME (no redefinition)
    assert fields["after"]["type"][1] == before_t["name"]

    import pytest

    with pytest.raises(ValueError):
        avro_type_of(T.MapType(T.LongType(), T.StringType()))
