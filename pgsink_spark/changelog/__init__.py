"""Changelog data model: the envelope every pipeline plane speaks.

Reference semantics (see SURVEY.md §1): pgsink's changelog is an ordered
stream of ``Schema | Modification`` entries
(reference pkg/changelog/entry.go:6-22). Spark's fixed-schema model makes
the idiomatic equivalent a *modifications* DataFrame in a fixed envelope
StructType plus a *schema registry* side table — implemented here.
"""

from pgsink_spark.changelog.envelope import (
    OP_DELETE,
    OP_IMPORT,
    OP_INSERT,
    OP_UPDATE,
    after_or_before,
    envelope_schema,
    operation,
    cast_envelope,
    to_envelope,
)
from pgsink_spark.changelog.registry import (
    SchemaEntry,
    schema_fingerprint,
)
from pgsink_spark.changelog.tables import table_diff, table_includes
from pgsink_spark.changelog.types import (
    UnregisteredType,
    spark_type_for,
)

__all__ = [
    "OP_DELETE",
    "OP_IMPORT",
    "OP_INSERT",
    "OP_UPDATE",
    "SchemaEntry",
    "UnregisteredType",
    "after_or_before",
    "envelope_schema",
    "operation",
    "schema_fingerprint",
    "spark_type_for",
    "table_diff",
    "table_includes",
    "cast_envelope",
    "to_envelope",
]
