"""JDBC warehouse sink: envelope appends into a remote SQL warehouse.

The reference's flagship sink is a warehouse connector: it creates a
``<table>_raw`` append table in the warehouse, streams envelope batches
into it, and installs a most-recent-row compaction view over it
(pkg/sinks/bigquery/sink.go:41-81, table.go:28-63,
schema_builders.go:28-161). ``sinks/warehouse.py`` ports those
*semantics* to parquet; this module is the *connector* twin — the same
raw-table + view contract spoken over Spark's JDBC writer to any
ANSI-SQL warehouse (Postgres, Redshift, DuckDB, ...).

Spark-first mapping:

- The envelope batch is flattened to a wide row (meta columns prefixed
  ``_`` + the payload's own columns, typed) and written with
  ``df.write.format("jdbc").mode("append")`` — N executors stream N
  parallel COPY-ish inserts, batched by ``batchsize``; no driver-side
  row loop.
- DDL (raw table, compaction view) is plain ANSI SQL built here and
  executed through an injected ``execute`` callable — a live deployment
  backs it with a JDBC connection; tests back it with DuckDB, which
  doubles as a dialect oracle: every statement this module emits is
  *executed* against a real SQL engine in tests/test_jdbc_sink.py.

This container has no JDBC driver jar, so the ``.save()`` path is
env-gated exactly like sources/jdbc.py; everything else runs offline.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pgsink_spark.changelog.envelope import after_or_before, operation
from pgsink_spark.changelog.registry import SchemaEntry
from pgsink_spark.sinks.generic import InsertResult, SchemaHandler
from pgsink_spark.sources.jdbc import quote_ident

META_COLUMNS = ["_timestamp", "_lsn", "_sequence", "_operation"]

_SQL_TYPES: list[tuple[type, str]] = [
    (T.LongType, "BIGINT"),
    (T.IntegerType, "INTEGER"),
    (T.ShortType, "SMALLINT"),
    (T.DoubleType, "DOUBLE PRECISION"),
    (T.FloatType, "REAL"),
    (T.BooleanType, "BOOLEAN"),
    (T.DateType, "DATE"),
    (T.TimestampType, "TIMESTAMP"),
    # plain Postgres `timestamp` (OID 1114) maps to TimestampNTZ in the
    # type registry — without this row it fell through to TEXT and a
    # real JDBC append of a timestamp payload column broke
    (T.TimestampNTZType, "TIMESTAMP"),
    (T.BinaryType, "BYTEA"),
    (T.StringType, "TEXT"),
]


def sql_type_of(dt: T.DataType) -> str:
    """Portable ANSI type for a payload column (BQ schema_builders.go:28-97
    does the same Postgres-OID→warehouse-type walk)."""
    if isinstance(dt, T.DecimalType):
        return f"DECIMAL({dt.precision},{dt.scale})"
    for spark_t, sql_t in _SQL_TYPES:
        if isinstance(dt, spark_t):
            return sql_t
    # arrays/maps/structs travel as their JSON text form
    return "TEXT"


def raw_table_name(namespace: str, name: str) -> str:
    return f"{namespace}_{name}_raw"


def migration_ddl(
    old: SchemaEntry | None, new: SchemaEntry, table: str
) -> list[str]:
    """ALTER statements evolving an EXISTING warehouse table from the
    ``old`` payload shape to ``new`` (CREATE IF NOT EXISTS cannot):

    - added column  → ``ADD COLUMN IF NOT EXISTS`` (nullable; old rows
      read NULL — the reference's idempotent-sync add-column outcome,
      pkg/sinks/generic/schema_handler.go:61-105);
    - type change   → ``ALTER COLUMN ... SET DATA TYPE`` (the widening
      path int→bigint / float→double; both Postgres and DuckDB run
      this syntax verbatim);
    - dropped column → NO DDL: the column stays as a tombstone and new
      rows leave it NULL, so history remains queryable and a re-added
      column finds its slot (warehouse semantics — upstream drops must
      never destroy sink history).
    """
    if old is None:
        return []
    old_types = {f.name: f.dataType for f in old.payload.fields}
    out: list[str] = []
    for f in new.payload.fields:
        if f.name not in old_types:
            out.append(
                f"ALTER TABLE {quote_ident(table)} ADD COLUMN IF NOT EXISTS "
                f"{quote_ident(f.name)} {sql_type_of(f.dataType)}"
            )
        elif old_types[f.name] != f.dataType:
            out.append(
                f"ALTER TABLE {quote_ident(table)} ALTER COLUMN "
                f"{quote_ident(f.name)} SET DATA TYPE {sql_type_of(f.dataType)}"
            )
    return out


def raw_table_ddl(entry: SchemaEntry) -> str:
    """CREATE TABLE IF NOT EXISTS for the raw envelope table.

    Meta columns carry the envelope (timestamp/lsn/sequence/operation);
    payload columns land typed under their own names — the flattened
    analogue of BigQuery's ``payload RECORD`` (schema_builders.go:99-113),
    chosen because flat columns are what SQL warehouses index and prune.
    """
    cols = [
        '"_timestamp" TIMESTAMP NOT NULL',
        '"_lsn" BIGINT',
        '"_sequence" BIGINT',
        '"_operation" TEXT NOT NULL',
    ]
    for f in entry.payload.fields:
        cols.append(f"{quote_ident(f.name)} {sql_type_of(f.dataType)}")
    table = quote_ident(raw_table_name(entry.namespace, entry.name))
    return f"CREATE TABLE IF NOT EXISTS {table} (\n  " + ",\n  ".join(cols) + "\n)"


def compaction_view_ddl(entry: SchemaEntry) -> str:
    """Most-recent-row view over the raw table — the connector-dialect
    twin of warehouse.compaction_view_sql (schema_builders.go:115-161):
    rank per pk by (timestamp, lsn, sequence) desc, keep row 1, drop
    DELETEs, project only payload columns."""
    raw = quote_ident(raw_table_name(entry.namespace, entry.name))
    view = quote_ident(f"{entry.namespace}_{entry.name}")
    pk = ", ".join(quote_ident(c) for c in entry.key_columns)
    payload = ", ".join(quote_ident(f.name) for f in entry.payload.fields)
    return (
        f"CREATE OR REPLACE VIEW {view} AS\n"
        f"SELECT {payload}\n"
        f"FROM (\n"
        f"  SELECT {payload}, \"_operation\",\n"
        f"         ROW_NUMBER() OVER (\n"
        f"           PARTITION BY {pk}\n"
        f"           ORDER BY \"_timestamp\" DESC, \"_lsn\" DESC NULLS LAST,\n"
        f"                    \"_sequence\" DESC NULLS LAST\n"
        f"         ) AS row_number\n"
        f"  FROM {raw}\n"
        f") ranked\n"
        f"WHERE row_number = 1 AND \"_operation\" != 'DELETE'"
    )


def flatten_envelope(env: DataFrame) -> DataFrame:
    """Typed envelope → the wide JDBC row (meta + payload columns).

    Pure column expressions; the payload image is ``after`` unless the
    row is a DELETE (then ``before`` — the last known image, same as the
    reference's modification marshaling). Runs in codegen, and the JDBC
    writer streams it straight out of the executors.
    """
    img = after_or_before()
    out = env.select(
        F.col("timestamp").alias("_timestamp"),
        F.col("lsn").alias("_lsn"),
        F.col("sequence").alias("_sequence"),
        operation().alias("_operation"),
        img.alias("__img"),
    )
    payload_t = env.schema["after"].dataType
    cols = [F.col(c) for c in META_COLUMNS]
    for f in payload_t.fields:
        c = F.col("__img").getField(f.name)
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType)):
            c = F.to_json(c)
        cols.append(c.alias(f.name))
    return out.select(*cols)


@dataclass(frozen=True)
class JdbcSinkOptions:
    """Connection + write tuning (the Options struct of sink.go:17-39;
    buffer-size maps to JDBC ``batchsize``)."""

    url: str
    user: str | None = None
    password: str | None = None
    driver: str = "org.postgresql.Driver"
    batchsize: int = 250
    isolation_level: str = "READ_COMMITTED"

    def writer_options(self, table: str) -> dict[str, str]:
        opts = {
            "url": self.url,
            "dbtable": table,
            "driver": self.driver,
            "batchsize": str(self.batchsize),
            "isolationLevel": self.isolation_level,
        }
        if self.user is not None:
            opts["user"] = self.user
        if self.password is not None:
            opts["password"] = self.password
        return opts


class JdbcWarehouseSink:
    """Raw-append + view lifecycle over an ``execute``/Spark-JDBC pair.

    ``execute(sql)`` runs DDL on the warehouse (injected: JDBC
    connection live, DuckDB in tests). Row traffic never goes through
    it — batches flow executor-side via the Spark JDBC writer, or
    through an injected ``write_batch`` for engines Spark has no jar
    for here.
    """

    def __init__(self, options: JdbcSinkOptions, execute, write_batch=None):
        self.options = options
        self.execute = execute
        self._write_batch = write_batch
        self._schema_handler = SchemaHandler(self._sync)
        self._entries: dict[tuple[str, str], SchemaEntry] = {}

    def _sync(self, entry: SchemaEntry) -> None:
        """Idempotent DDL sync, fingerprint-cached by SchemaHandler —
        CREATE TABLE for a new table, ALTER migration for an evolved
        one, then the view (re)install, exactly the reference's
        schema-handler contract (add-column / widen flow through;
        drop-column leaves a tombstone)."""
        key = (entry.namespace, entry.name)
        old = self._entries.get(key)
        self.execute(raw_table_ddl(entry))
        for sql in migration_ddl(
            old, entry, raw_table_name(entry.namespace, entry.name)
        ):
            self.execute(sql)
        self.execute(compaction_view_ddl(entry))
        # commit the cache entry only once every DDL statement landed:
        # a failed migration must leave `old` in place so the retry
        # regenerates (and re-issues) the same ALTERs instead of
        # diffing new-vs-new into a silent no-op
        self._entries[key] = entry

    def handle_schema(self, entry: SchemaEntry) -> str:
        return self._schema_handler.handle(entry)

    def insert(self, env: DataFrame, namespace: str, name: str) -> InsertResult:
        from pyspark.sql import Observation

        table = raw_table_name(namespace, name)
        flat = flatten_envelope(env)
        obs = Observation()
        observed = flat.observe(
            obs, F.count(F.lit(1)).alias("n"), F.max("_lsn").alias("max_lsn")
        )
        if self._write_batch is not None:
            self._write_batch(observed, table)
        else:
            (
                observed.write.format("jdbc")
                .options(**self.options.writer_options(table))
                .mode("append")
                .save()
            )
        got = obs.get
        return InsertResult(got["n"], got["max_lsn"])


def staging_table_name(namespace: str, name: str) -> str:
    return f"{namespace}_{name}_staging"


def staging_table_ddl(entry: SchemaEntry) -> str:
    """Staging table: same shape as the raw table, truncated per batch."""
    ddl = raw_table_ddl(entry)
    return ddl.replace(
        quote_ident(raw_table_name(entry.namespace, entry.name)),
        quote_ident(staging_table_name(entry.namespace, entry.name)),
        1,
    )


def compacted_table_ddl(entry: SchemaEntry) -> str:
    """Materialized latest-rows table keyed on the pk (the remote twin
    of sinks/compactor.py's KeyedCompactedTable)."""
    cols = [
        f"{quote_ident(f.name)} {sql_type_of(f.dataType)}"
        for f in entry.payload.fields
    ]
    cols += ['"_timestamp" TIMESTAMP', '"_lsn" BIGINT', '"_sequence" BIGINT']
    pk = ", ".join(quote_ident(c) for c in entry.key_columns)
    table = quote_ident(f"{entry.namespace}_{entry.name}_compacted")
    return (
        f"CREATE TABLE IF NOT EXISTS {table} (\n  "
        + ",\n  ".join(cols)
        + f",\n  PRIMARY KEY ({pk})\n)"
    )


def upsert_from_staging_sql(entry: SchemaEntry) -> list[str]:
    """Fold one staged envelope batch into the compacted table.

    Three ANSI-ish statements (every one executed against DuckDB in
    tests; Postgres runs them verbatim — ON CONFLICT is common to
    both):

    1. upsert each staged key's MOST RECENT non-DELETE image, electing
       by (timestamp, lsn, sequence) inside the staging batch, and
       applying it only if newer than the stored row (the same
       monotonic guard the reference's view election encodes — replays
       and out-of-order batches cannot regress a row);
    2. delete keys whose newest staged image is a DELETE and is newer
       than the stored row;
    3. truncate staging for the next batch.
    """
    ns, name = entry.namespace, entry.name
    staging = quote_ident(staging_table_name(ns, name))
    compacted = quote_ident(f"{ns}_{name}_compacted")
    pk_cols = [quote_ident(c) for c in entry.key_columns]
    pk = ", ".join(pk_cols)
    payload = [quote_ident(f.name) for f in entry.payload.fields]
    all_cols = payload + ['"_timestamp"', '"_lsn"', '"_sequence"']
    sets = ", ".join(f"{c} = excluded.{c}" for c in all_cols if c not in pk_cols)
    newer = (
        '(excluded."_timestamp", coalesce(excluded."_lsn", -1),'
        ' coalesce(excluded."_sequence", -1))'
        f' > ({compacted}."_timestamp", coalesce({compacted}."_lsn", -1),'
        f' coalesce({compacted}."_sequence", -1))'
    )
    elect = (
        f"SELECT {', '.join(all_cols)} FROM (\n"
        f"  SELECT {', '.join(all_cols)}, \"_operation\",\n"
        f"         ROW_NUMBER() OVER (PARTITION BY {pk}\n"
        f"           ORDER BY \"_timestamp\" DESC, \"_lsn\" DESC NULLS LAST,\n"
        f"                    \"_sequence\" DESC NULLS LAST) AS rn\n"
        f"  FROM {staging}\n"
        f") t WHERE rn = 1 AND \"_operation\" != 'DELETE'"
    )
    upsert = (
        f"INSERT INTO {compacted} ({', '.join(all_cols)})\n{elect}\n"
        f"ON CONFLICT ({pk}) DO UPDATE SET {sets}\n"
        f"WHERE {newer}"
    )
    pk_eq = " AND ".join(f"c.{c} = t.{c}" for c in pk_cols)
    delete = (
        f"DELETE FROM {compacted} c WHERE EXISTS (\n"
        f"  SELECT 1 FROM (\n"
        f"    SELECT {pk}, \"_operation\", \"_timestamp\", \"_lsn\", \"_sequence\",\n"
        f"           ROW_NUMBER() OVER (PARTITION BY {pk}\n"
        f"             ORDER BY \"_timestamp\" DESC, \"_lsn\" DESC NULLS LAST,\n"
        f"                      \"_sequence\" DESC NULLS LAST) AS rn\n"
        f"    FROM {staging}\n"
        f"  ) t WHERE rn = 1 AND t.\"_operation\" = 'DELETE' AND {pk_eq}\n"
        f"    AND (t.\"_timestamp\", coalesce(t.\"_lsn\", -1),"
        f" coalesce(t.\"_sequence\", -1))\n"
        f"      > (c.\"_timestamp\", coalesce(c.\"_lsn\", -1),"
        f" coalesce(c.\"_sequence\", -1))\n"
        f")"
    )
    return [upsert, delete, f"DELETE FROM {staging}"]


def epoch_table_ddl(namespace: str, name: str) -> str:
    table = quote_ident(f"{namespace}_{name}_epochs")
    return f"CREATE TABLE IF NOT EXISTS {table} (epoch BIGINT PRIMARY KEY)"


class JdbcCompactedSink(JdbcWarehouseSink):
    """JDBC sink variant maintaining a MATERIALIZED compacted table
    remotely (the connector twin of sinks/compactor.py): each batch
    stages executor-side, then one merge transaction folds it in.
    Readers hit an indexed primary-key table instead of a view over
    raw history; replays and out-of-order batches are absorbed by the
    merge's monotonic newer-than guard.

    ``fetch(sql) -> rows`` (optional) unlocks remote EXACTLY-ONCE:
    committed epoch ids live in a ``<table>_epochs`` warehouse table
    written in the same ``execute`` stream as the merge, so a replayed
    foreachBatch epoch is skipped before it stages. Staging is cleared
    at the START of each insert — a crash that left a half-staged
    batch behind can never leak into the next batch's merge.
    """

    def __init__(self, options, execute, write_batch=None, fetch=None):
        super().__init__(options, execute, write_batch=write_batch)
        self.fetch = fetch

    def _sync(self, entry: SchemaEntry) -> None:
        key = (entry.namespace, entry.name)
        old = self._entries.get(key)
        self.execute(staging_table_ddl(entry))
        self.execute(compacted_table_ddl(entry))
        self.execute(epoch_table_ddl(entry.namespace, entry.name))
        # schema drift flows through BOTH halves of the merge pair
        for table in (
            staging_table_name(entry.namespace, entry.name),
            f"{entry.namespace}_{entry.name}_compacted",
        ):
            for sql in migration_ddl(old, entry, table):
                self.execute(sql)
        # cache only after all DDL succeeded (see JdbcWarehouseSink._sync)
        self._entries[key] = entry

    def insert(
        self,
        env: DataFrame,
        namespace: str,
        name: str,
        epoch: int | None = None,
    ) -> InsertResult:
        from pyspark.sql import Observation

        entry = self._entries[(namespace, name)]
        staging = staging_table_name(namespace, name)
        epochs = quote_ident(f"{namespace}_{name}_epochs")
        if epoch is not None and self.fetch is not None:
            seen = self.fetch(
                f"SELECT count(*) FROM {epochs} WHERE epoch = {int(epoch)}"
            )
            if seen and seen[0][0]:
                return InsertResult(0, None)
        # clean slate: a crashed pre-merge batch's staging rows must
        # not pollute this batch's election
        self.execute(f"DELETE FROM {quote_ident(staging)}")
        flat = flatten_envelope(env)
        obs = Observation()
        observed = flat.observe(
            obs, F.count(F.lit(1)).alias("n"), F.max("_lsn").alias("max_lsn")
        )
        if self._write_batch is not None:
            self._write_batch(observed, staging)
        else:
            (
                observed.write.format("jdbc")
                .options(**self.options.writer_options(staging))
                .mode("append")
                .save()
            )
        for sql in upsert_from_staging_sql(entry):
            self.execute(sql)
        if epoch is not None:
            # conflict-tolerant: a crash-replayed epoch (or running
            # without `fetch`) re-runs the idempotent merge and must
            # not wedge the stream on an epoch-PK violation
            self.execute(
                f"INSERT INTO {epochs} VALUES ({int(epoch)}) "
                f"ON CONFLICT (epoch) DO NOTHING"
            )
        got = obs.get
        return InsertResult(got["n"], got["max_lsn"])
