"""Live snapshot import over the walsender's simple-query channel.

The reference backfills published tables with a keyset-paginated
snapshot read through a database driver (pkg/imports/importer.go —
build query :96-141, cursor advance :143-160; pk discovery
pkg/imports/manager.go catalog queries). This container has no JDBC
jar, but it doesn't need one: a logical-replication connection accepts
plain SQL, results arrive in text format, and the repo already owns a
text parser per Postgres OID (streaming/marshal.text_parser_for — the
same parsers the CDC tuple decode uses). So the import path can run
end to end against a REAL server over the existing socket client:

- ``discover_primary_key`` / ``table_columns``: pg_index/pg_attribute
  catalog queries (the exact discovery the reference runs);
- ``keyset_batches``: ``WHERE pk > cursor ORDER BY pk LIMIT n`` pages
  — resumable, index-ordered, bounded server-side (importer.go:96-141
  semantics), each row parsed OID-faithfully into typed Python values;
- ``import_table``: drives the batches into typed Spark envelope rows
  (operation IMPORT, lsn NULL — pre-stream rows belong to every as-of
  state) and hands them to the caller's sink callback.

One caveat vs JDBC: pages arrive serially over one connection (the
JDBC path fans out range partitions across executors). For the
control-plane-sized backfills this container can host that is fine;
a deployment with a driver jar uses sources/jdbc.py instead and
everything downstream is identical.

Exercised against a real ephemeral Postgres in tests/test_live_pg.py.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import types as T

from pgsink_spark.changelog.types import spark_type_for
from pgsink_spark.sources.jdbc import quote_ident, sql_literal
from pgsink_spark.streaming.marshal import text_parser_for
from pgsink_spark.streaming.replication import ReplicationClient


@dataclass(frozen=True)
class LiveColumn:
    name: str
    type_oid: int


def table_columns(
    client: ReplicationClient, namespace: str, table: str
) -> list[LiveColumn]:
    """Ordered column list with type OIDs from pg_attribute."""
    rows, _ = client._simple_query(
        "SELECT a.attname, a.atttypid FROM pg_attribute a "
        "JOIN pg_class c ON c.oid = a.attrelid "
        "JOIN pg_namespace n ON n.oid = c.relnamespace "
        f"WHERE n.nspname = {sql_literal(namespace)} "
        f"AND c.relname = {sql_literal(table)} "
        "AND a.attnum > 0 AND NOT a.attisdropped ORDER BY a.attnum"
    )
    return [LiveColumn(r[0], int(r[1])) for r in rows]


def discover_primary_key(
    client: ReplicationClient, namespace: str, table: str
) -> list[str]:
    """Primary-key column names in index order (pg_index.indkey)."""
    rows, _ = client._simple_query(
        "SELECT a.attname FROM pg_index i "
        "JOIN pg_class c ON c.oid = i.indrelid "
        "JOIN pg_namespace n ON n.oid = c.relnamespace "
        "JOIN pg_attribute a ON a.attrelid = c.oid "
        "  AND a.attnum = ANY(i.indkey) "
        f"WHERE n.nspname = {sql_literal(namespace)} "
        f"AND c.relname = {sql_literal(table)} "
        "AND i.indisprimary "
        "ORDER BY array_position(i.indkey, a.attnum)"
    )
    return [r[0] for r in rows]


def payload_schema(columns: list[LiveColumn]) -> T.StructType:
    return T.StructType(
        [
            T.StructField(c.name, spark_type_for(c.type_oid), True)
            for c in columns
        ]
    )


def keyset_batches(
    client: ReplicationClient,
    namespace: str,
    table: str,
    pk,
    columns: list[LiveColumn],
    limit: int = 1000,
    cursor=None,
):
    """Yield lists of typed row dicts, keyset-paginated on ``pk`` (one
    column name or a list — composite keys page with Postgres row-value
    comparison ``("k1","k2") > (v1,v2)``).

    Every batch is bounded server-side and strictly ordered, so the
    loop is resumable from the last row's key — the reference's import
    cursor contract (importer.go:143-160). Values parse through the
    OID registry (the CDC path's parsers), so an unregistered type
    fails loudly instead of importing garbage. Identifiers are
    double-quoted and cursor values SQL-escaped: both originate outside
    this code (catalog names, replicated user data), so a quote in
    either must not break — or inject into — the generated statement.
    """
    pks = [pk] if isinstance(pk, str) else list(pk)
    parsers = {c.name: text_parser_for(c.type_oid) for c in columns}
    col_list = ", ".join(quote_ident(c.name) for c in columns)
    qtable = f"{quote_ident(namespace)}.{quote_ident(table)}"
    qpks = [quote_ident(c) for c in pks]
    order = ", ".join(qpks)
    while True:
        if cursor is None:
            where = ""
        else:
            cur = (
                list(cursor)
                if isinstance(cursor, (list, tuple))
                else [cursor]
            )
            if len(qpks) == 1:
                where = f"WHERE {qpks[0]} > {sql_literal(cur[0])} "
            else:
                lhs = "(" + ", ".join(qpks) + ")"
                rhs = "(" + ", ".join(sql_literal(v) for v in cur) + ")"
                where = f"WHERE {lhs} > {rhs} "
        rows, cols = client._simple_query(
            f"SELECT {col_list} FROM {qtable} {where}"
            f"ORDER BY {order} LIMIT {int(limit)}"
        )
        if not rows:
            return
        batch = []
        for r in rows:
            d = {}
            for name, raw in zip(cols, r):
                d[name] = None if raw is None else parsers[name](raw)
            batch.append(d)
        last = rows[-1]
        vals = tuple(last[cols.index(c)] for c in pks)
        cursor = vals[0] if len(pks) == 1 else vals
        yield batch


@dataclass(frozen=True)
class LiveImportResult:
    rows: int
    batches: int
    pk: str  # comma-joined for composite keys


def import_table(
    spark,
    client: ReplicationClient,
    namespace: str,
    table: str,
    on_batch,
    limit: int = 1000,
    import_time=None,
) -> LiveImportResult:
    """Full live backfill: discover pk + schema, page the table, and
    hand each batch to ``on_batch(env_df, payload_schema, pk_cols)`` as
    typed IMPORT envelopes (timestamp = import time, lsn NULL —
    snapshot rows predate the stream, exactly like the file-sink
    import path). Composite primary keys paginate via row-value
    cursors; a keyless table is the only refusal (the reference also
    refuses >1 column, import.go:235-270 — this engine does not).

    Sequence numbers run CONTINUOUSLY across batches: IMPORT rows share
    a NULL lsn, so (lsn, sequence) stays a total order over the whole
    import — a per-batch restart at 0 would collide keys across
    batches and break the envelope ordering contract.
    """
    import datetime as _dt

    from pgsink_spark.changelog import envelope_schema

    cols = table_columns(client, namespace, table)
    pk_cols = discover_primary_key(client, namespace, table)
    if not pk_cols:
        raise ValueError(
            f"{namespace}.{table}: keyset pagination needs a primary key"
        )
    pk = pk_cols[0] if len(pk_cols) == 1 else pk_cols
    payload = payload_schema(cols)
    ts = import_time or _dt.datetime.now(_dt.timezone.utc)
    n_rows = 0
    n_batches = 0
    for batch in keyset_batches(
        client, namespace, table, pk, cols, limit=limit
    ):
        env_rows = [
            (ts, namespace, table, None, n_rows + i, None, row)
            for i, row in enumerate(batch)
        ]
        env = spark.createDataFrame(env_rows, envelope_schema(payload))
        on_batch(env, payload, pk_cols)
        n_rows += len(batch)
        n_batches += 1
    return LiveImportResult(n_rows, n_batches, ",".join(pk_cols))
