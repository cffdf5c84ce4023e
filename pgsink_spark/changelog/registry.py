"""Schema registry: Schema entries, fingerprints, and the registry table.

The reference's ``Schema`` entry carries a column spec with per-column
key flags (pkg/changelog/schema.go:17-31, 47-55) and is deduplicated by
an md5 fingerprint over each column's ``(key, name, type, modifier)``
(pkg/changelog/schema.go:61-67). Here a Schema entry is a plain record
holding a Spark ``StructType`` payload plus the primary-key column list;
the fingerprint is md5 over the same canonical tuple stream, so
identical schemas — however discovered — collapse to one registry row.

The registry itself is an append-only table (parquet/Delta); the current
schema for a table is the row with the max timestamp, read via the same
most-recent-row pattern the sinks use.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field
from datetime import datetime, timezone

from pyspark.sql import types as T


def schema_fingerprint(payload: T.StructType, key_columns: list[str]) -> str:
    """md5 over canonical (key, name, type) per column, order-stable."""
    h = hashlib.md5()
    for f in payload.fields:
        h.update(
            json.dumps(
                [f.name in key_columns, f.name, f.dataType.simpleString()],
                separators=(",", ":"),
            ).encode()
        )
    return h.hexdigest()


@dataclass
class SchemaEntry:
    """One schema announcement on the changelog."""

    namespace: str
    name: str
    payload: T.StructType
    key_columns: list[str]
    lsn: int | None = None
    timestamp: datetime = field(
        default_factory=lambda: datetime.now(timezone.utc)
    )

    @property
    def fingerprint(self) -> str:
        return schema_fingerprint(self.payload, self.key_columns)

    def to_row(self) -> dict:
        """Registry-table row (schema serialized as StructType JSON)."""
        return {
            "timestamp": self.timestamp,
            "namespace": self.namespace,
            "name": self.name,
            "lsn": self.lsn,
            "fingerprint": self.fingerprint,
            "key_columns": list(self.key_columns),
            "spec_json": self.payload.json(),
        }

    @staticmethod
    def from_row(row) -> "SchemaEntry":
        e = SchemaEntry(
            namespace=row["namespace"],
            name=row["name"],
            payload=T.StructType.fromJson(json.loads(row["spec_json"])),
            key_columns=list(row["key_columns"]),
            lsn=row["lsn"],
        )
        e.timestamp = row["timestamp"]
        return e


REGISTRY_SCHEMA = T.StructType(
    [
        T.StructField("timestamp", T.TimestampType(), False),
        T.StructField("namespace", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("lsn", T.LongType(), True),
        T.StructField("fingerprint", T.StringType(), False),
        T.StructField("key_columns", T.ArrayType(T.StringType()), False),
        T.StructField("spec_json", T.StringType(), False),
    ]
)


def entry_from_relation(rel) -> SchemaEntry:
    """A7 schema-from-relation: the typed SchemaEntry a pgoutput
    Relation message announces (column names + type OIDs + key flags —
    reference pkg/logical/decoder.go Relation / pkg/changelog schema
    marshaling). ``rel`` is duck-typed (namespace, name, columns with
    .name/.type_oid/.key) so the changelog layer never imports the wire
    decoder."""
    from pgsink_spark.changelog.types import spark_type_for

    payload = T.StructType(
        [
            T.StructField(c.name, spark_type_for(c.type_oid), True)
            for c in rel.columns
        ]
    )
    keys = [c.name for c in rel.columns if c.key]
    return SchemaEntry(rel.namespace, rel.name, payload, keys)
