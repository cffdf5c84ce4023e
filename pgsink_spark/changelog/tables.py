"""Table identity set operations.

The reference models a table as ``(schema, table_name)`` with ``Diff``
and ``Includes`` set ops used by every reconciliation loop
(pkg/changelog/table.go:6-36). On DataFrames of ``(namespace, name)``
those are exactly anti- and semi-joins — Catalyst broadcasts the small
side automatically, so reconciliation over a million-table catalog is
one broadcast-hash-join, no full shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

KEYS = ["namespace", "name"]


def table_diff(a: DataFrame, b: DataFrame) -> DataFrame:
    """Tables in ``a`` not in ``b`` (reference Tables.Diff)."""
    return a.join(b, KEYS, "left_anti")


def table_includes(a: DataFrame, b: DataFrame) -> DataFrame:
    """Tables in ``a`` that are also in ``b`` (reference Tables.Includes)."""
    return a.join(b, KEYS, "left_semi")
