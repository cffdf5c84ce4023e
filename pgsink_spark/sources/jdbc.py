"""JDBC source: live-Postgres reads (imports + catalog discovery).

The reference reads Postgres directly: keyset import scans
(pkg/imports/import.go:209-223), primary-key discovery from
pg_index/pg_attribute (pkg/imports/import.go:235-270), and table
discovery from the catalog (pkg/subscription/manager.go:120-147).

Spark-first mapping: ``spark.read.jdbc`` with
``partitionColumn/lowerBound/upperBound/numPartitions`` (N parallel
range scans — the distributed analogue of the reference's cursor loop),
plus ``pushDownPredicate`` so keyset cursors reach the remote index.
Option construction is pure (testable offline); ``.load()`` needs a
JDBC driver jar on the classpath and a reachable database.

This container has neither — the module is the deployment surface, the
offline tests cover the option builders, and `imports/keyset.py` covers
the identical scan semantics against parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

def sql_literal(v) -> str:
    """Render a cursor value as a safe SQL literal.

    Cursor values come from the *data* (the previous batch's max pk), so
    a string pk containing a quote must not break — or inject into —
    the generated subquery. Postgres string literals double embedded
    single quotes; E-string escapes are avoided by rejecting control
    characters outright.
    """
    if v is None:
        raise ValueError("cursor literal cannot be NULL")
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        if v != v or v in (float("inf"), float("-inf")):
            raise ValueError(f"non-finite cursor: {v}")
        return repr(v)
    s = str(v)
    if any(ord(c) < 0x20 for c in s):
        raise ValueError("control character in cursor value")
    return "'" + s.replace("'", "''") + "'"


def quote_ident(name: str) -> str:
    """Quote a table/column identifier (Postgres double-quote rules)."""
    if "\x00" in name:
        raise ValueError("NUL in identifier")
    return '"' + name.replace('"', '""') + '"'


def quote_qualified(name: str) -> str:
    """Quote a possibly schema-qualified name part by part."""
    return ".".join(quote_ident(p) for p in name.split("."))


PK_QUERY = """
(SELECT a.attname
 FROM pg_index i
 JOIN pg_attribute a ON a.attrelid = i.indrelid AND a.attnum = ANY(i.indkey)
 WHERE i.indrelid = '{qualified}'::regclass AND i.indisprimary
 ORDER BY array_position(i.indkey, a.attnum)) AS pk
"""

TABLES_QUERY = """
(SELECT table_schema AS namespace, table_name AS name
 FROM information_schema.tables
 WHERE table_type = 'BASE TABLE' AND table_schema IN ({schemas})) AS tables
"""


def snapshot_options(
    url: str,
    table: str,
    pk: str,
    lower: int,
    upper: int,
    num_partitions: int = 32,
    fetchsize: int = 5000,
    user: str | None = None,
    password: str | None = None,
) -> dict[str, str]:
    """Options for a range-partitioned parallel snapshot read.

    Each of ``num_partitions`` tasks reads one pk range — Spark's
    built-in equivalent of the reference's keyset pagination, N-way
    parallel. ``fetchsize`` mirrors the reference's 5000-row batch
    (pkg/imports/importer.go:33).
    """
    opts = {
        "url": url,
        "dbtable": table,
        "partitionColumn": pk,
        "lowerBound": str(lower),
        "upperBound": str(upper),
        "numPartitions": str(num_partitions),
        "fetchsize": str(fetchsize),
        "pushDownPredicate": "true",
    }
    if user:
        opts["user"] = user
    if password:
        opts["password"] = password
    return opts


def keyset_where_order(pk, cursor) -> tuple[str, str]:
    """(WHERE clause or '', ORDER BY column list) for a keyset page.

    ``pk`` may be one column name or a list (composite key). Composite
    cursors render as Postgres row-value comparison
    ``("k1", "k2") > (v1, v2)`` — native lexicographic semantics, and
    the planner turns it into an index range scan on the pk index.
    """
    pks = [pk] if isinstance(pk, str) else list(pk)
    qpks = [quote_ident(c) for c in pks]
    order = ", ".join(qpks)
    if cursor is None:
        return "", order
    cur = list(cursor) if isinstance(cursor, (list, tuple)) else [cursor]
    if len(cur) != len(pks):
        raise ValueError(f"cursor arity {len(cur)} != pk arity {len(pks)}")
    if len(pks) == 1:
        return f"WHERE {qpks[0]} > {sql_literal(cur[0])}", order
    lhs = "(" + ", ".join(qpks) + ")"
    rhs = "(" + ", ".join(sql_literal(v) for v in cur) + ")"
    return f"WHERE {lhs} > {rhs}", order


def keyset_batch_options(
    url: str,
    table: str,
    pk,
    cursor,
    limit: int = 5000,
    **auth,
) -> dict[str, str]:
    """Options for one bounded keyset batch (resumable import loop).

    The dbtable subquery keeps the scan indexed and bounded server-side,
    exactly the reference's import statement shape (single- OR
    composite-key; the latter via row-value comparison, which the
    reference refuses — import.go:235-270). Cursor values are
    SQL-escaped (they originate from table data) and identifiers are
    quoted — Python ``repr`` is not SQL quoting."""
    qtable = quote_qualified(table)
    where, order = keyset_where_order(pk, cursor)
    sub = (
        f"(SELECT * FROM {qtable} {where} "
        f"ORDER BY {order} LIMIT {int(limit)}) AS batch"
    )
    return {"url": url, "dbtable": sub, **{k: str(v) for k, v in auth.items()}}


def read_snapshot(spark: SparkSession, **kwargs) -> DataFrame:
    """Parallel snapshot read (see snapshot_options)."""
    return spark.read.format("jdbc").options(**snapshot_options(**kwargs)).load()


def discover_tables(spark: SparkSession, url: str, schemas: list[str], **auth) -> DataFrame:
    """(namespace, name) catalog listing for reconciliation."""
    inlist = ", ".join(sql_literal(s) for s in schemas)
    return (
        spark.read.format("jdbc")
        .options(
            url=url,
            dbtable=TABLES_QUERY.format(schemas=inlist),
            **{k: str(v) for k, v in auth.items()},
        )
        .load()
    )


def discover_primary_key(
    spark: SparkSession, url: str, namespace: str, name: str, **auth
) -> list[str]:
    """Primary-key column(s) in index order.

    The reference rejects composite keys outright
    (pkg/imports/import.go:235-270 errors on >1 column); this engine
    extends the contract — the keyset path paginates composite keys
    with row-value cursors (keyset_where_order), so discovery returns
    the full ordered list and only a keyless table is an error (no
    cursor is possible without a key)."""
    df = (
        spark.read.format("jdbc")
        .options(
            url=url,
            dbtable=PK_QUERY.format(qualified=f"{namespace}.{name}"),
            **{k: str(v) for k, v in auth.items()},
        )
        .load()
    )
    cols = [r["attname"] for r in df.collect()]
    if not cols:
        raise ValueError(
            f"table {namespace}.{name} has no primary key — keyset "
            "import needs one"
        )
    return cols
