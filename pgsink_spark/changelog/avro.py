"""Avro schema generation for changelog envelopes.

The reference's serializer plane is an interface with a JSON default
(pkg/changelog/serialize/serialize.go:10-14, json.go); warehouse/Kafka
interop conventionally wants the AVRO shape of the same envelope. This
module emits the Avro record schema for a table's typed envelope —
pure schema generation (no avro runtime needed; the dict IS the
``.avsc`` document), so downstream systems can register it in a schema
registry and decode the NDJSON/parquet envelopes consistently.

Nullability follows the envelope contract: payload images and
lsn/sequence are nullable unions; timestamp/namespace/name are not.
"""

from __future__ import annotations

from pyspark.sql import types as T

from pgsink_spark.changelog.registry import SchemaEntry

_PRIMITIVES: list[tuple[type, object]] = [
    (T.LongType, "long"),
    (T.IntegerType, "int"),
    (T.ShortType, "int"),
    (T.DoubleType, "double"),
    (T.FloatType, "float"),
    (T.BooleanType, "boolean"),
    (T.StringType, "string"),
    (T.BinaryType, "bytes"),
    (T.DateType, {"type": "int", "logicalType": "date"}),
    (T.TimestampType, {"type": "long", "logicalType": "timestamp-micros"}),
    (T.TimestampNTZType, {"type": "long", "logicalType": "local-timestamp-micros"}),
]


def avro_type_of(dt: T.DataType, name_hint: str = "field") -> object:
    """Avro type for a Spark DataType (raises on unsupported)."""
    if isinstance(dt, T.DecimalType):
        return {
            "type": "bytes",
            "logicalType": "decimal",
            "precision": dt.precision,
            "scale": dt.scale,
        }
    if isinstance(dt, T.ArrayType):
        return {
            "type": "array",
            "items": avro_type_of(dt.elementType, name_hint),
        }
    if isinstance(dt, T.MapType):
        if not isinstance(dt.keyType, T.StringType):
            raise ValueError("avro maps require string keys")
        return {"type": "map", "values": avro_type_of(dt.valueType, name_hint)}
    if isinstance(dt, T.StructType):
        return {
            "type": "record",
            "name": name_hint,
            "fields": [
                {
                    "name": f.name,
                    "type": ["null", avro_type_of(f.dataType, f"{name_hint}_{f.name}")],
                    "default": None,
                }
                for f in dt.fields
            ],
        }
    for spark_t, avro_t in _PRIMITIVES:
        if isinstance(dt, spark_t):
            return avro_t
    raise ValueError(f"no avro mapping for {dt.simpleString()}")


def envelope_avro_schema(entry: SchemaEntry) -> dict:
    """The ``.avsc`` record for a table's typed envelope."""
    payload = avro_type_of(entry.payload, f"{entry.namespace}_{entry.name}_payload")
    return {
        "type": "record",
        "name": f"{entry.namespace}_{entry.name}_envelope",
        "namespace": "pgsink.changelog",
        "fields": [
            {
                "name": "timestamp",
                "type": {"type": "long", "logicalType": "timestamp-micros"},
            },
            {"name": "namespace", "type": "string"},
            {"name": "name", "type": "string"},
            {"name": "lsn", "type": ["null", "long"], "default": None},
            {"name": "sequence", "type": ["null", "long"], "default": None},
            {"name": "operation", "type": "string"},
            {"name": "before", "type": ["null", payload], "default": None},
            # one named record, referenced by name the second time
            # (Avro forbids redefinition within a schema)
            {
                "name": "after",
                "type": ["null", payload["name"]],
                "default": None,
            },
        ],
    }
