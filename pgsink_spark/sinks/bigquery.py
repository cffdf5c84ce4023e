"""BigQuery sink over the PUBLIC REST API (stdlib HTTP, no SDK).

Parity: pkg/sinks/bigquery — sink.go:40-79 (dataset ensure + sink
wiring), schema_handler.go:32-80 (raw-table/view sync, fingerprint
cached), schema_builders.go:60-174 (payload RECORD schema, clustering,
time partitioning, most-recent-row view template), table.go:28-62
(row marshaling + Inserter().Put). The google-cloud SDK isn't
available here, so the transport is the documented BigQuery v2 REST
surface itself (cloud.google.com/bigquery/docs/reference/rest):
``datasets``/``tables`` resources, ``tabledata.insertAll`` for
streaming writes, and multipart media-upload ``jobs.insert`` load jobs
(NEWLINE_DELIMITED_JSON) for bulk backfill. Tests run the full sink
against an in-process fake implementing those endpoints
(tests/bq_fake.py); pointing ``api_base`` at
``https://bigquery.googleapis.com`` with a real OAuth token (e.g.
``gcloud auth print-access-token``) is the production wiring — token
ACQUISITION (ADC refresh flows) is intentionally out of scope.

Scale shape: row traffic never touches the driver. ``insert`` flattens
the typed envelope with pure column expressions, then each PARTITION
posts its own ``insertAll`` batches (capped rows/request per the public
quota) or uploads one NDJSON load job — executor-side HTTP, exactly how
the reference's buffered inserters fan out. Schema sync is
control-plane: one ``tables.get``/``insert``/``patch`` per novel
fingerprint (SchemaHandler), with BigQuery's public evolution rules
(additive NULLABLE fields only) enforced client-side so an incompatible
CDC schema change fails loudly at the sink boundary instead of
poisoning a stream of 400s.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pgsink_spark.changelog.registry import SchemaEntry
from pgsink_spark.sinks.generic import InsertResult, SchemaHandler


class BigQueryError(RuntimeError):
    """Non-2xx API response or row-level insert errors."""


# --- type mapping (decoder.go parity: PG->BQ there, Spark->BQ here) ----------

_TYPE_MAP: list[tuple[type, str]] = [
    (T.LongType, "INT64"),
    (T.IntegerType, "INT64"),
    (T.ShortType, "INT64"),
    (T.ByteType, "INT64"),
    (T.DoubleType, "FLOAT64"),
    (T.FloatType, "FLOAT64"),
    (T.BooleanType, "BOOL"),
    (T.TimestampType, "TIMESTAMP"),
    (T.TimestampNTZType, "TIMESTAMP"),
    (T.DateType, "DATE"),
    (T.BinaryType, "BYTES"),
    (T.DecimalType, "NUMERIC"),
    (T.StringType, "STRING"),
]


def bq_type_of(dt: T.DataType) -> tuple[str, str]:
    """(type, mode) for a Spark type; arrays become REPEATED leaves."""
    if isinstance(dt, T.ArrayType):
        inner, _ = bq_type_of(dt.elementType)
        return inner, "REPEATED"
    for cls, name in _TYPE_MAP:
        if isinstance(dt, cls):
            return name, "NULLABLE"
    # maps/structs inside the payload serialize as JSON text (same
    # decision as the JDBC twin's flatten)
    return "STRING", "NULLABLE"


def bq_schema_of(entry: SchemaEntry) -> list[dict]:
    """Envelope schema: meta fields + payload RECORD
    (schema_builders.go:60-88 — the reference keeps row images nested
    so meta names can never collide with payload columns)."""
    payload_fields = []
    for f in entry.payload.fields:
        t, mode = bq_type_of(f.dataType)
        payload_fields.append({"name": f.name, "type": t, "mode": mode})
    return [
        {"name": "timestamp", "type": "TIMESTAMP", "mode": "REQUIRED"},
        {"name": "lsn", "type": "INT64", "mode": "NULLABLE"},
        {"name": "sequence", "type": "INT64", "mode": "NULLABLE"},
        {"name": "operation", "type": "STRING", "mode": "REQUIRED"},
        {
            "name": "payload",
            "type": "RECORD",
            "mode": "NULLABLE",
            "fields": payload_fields,
        },
    ]


def view_query(project: str, dataset: str, raw_table: str, keys: list[str]) -> str:
    """Most-recent-row view (viewQueryTemplate parity,
    schema_builders.go:146-174), extended to composite keys — the
    reference's template carries a "TODO: Support composite primary
    keys"; the partition list here is the full key tuple."""
    pk = ", ".join(f"payload.{k}" for k in keys)
    return (
        "select payload.* from (\n"
        "  select *, row_number() over (\n"
        f"    partition by {pk}\n"
        "    order by timestamp desc, lsn desc, sequence desc\n"
        "  ) as row_number\n"
        f"  from `{project}.{dataset}.{raw_table}`\n"
        ")\n"
        "where row_number = 1\n"
        "and operation != 'DELETE'"
    )


# --- REST client --------------------------------------------------------------


@dataclass
class BigQueryRestClient:
    """Minimal typed client for the BigQuery v2 REST resources the sink
    needs. stdlib-only so it is constructible INSIDE executor
    partitions (no driver-side connection objects cross the closure)."""

    api_base: str
    project: str
    token: str | None = None
    timeout_s: float = 30.0

    def _request(
        self,
        method: str,
        path: str,
        body: bytes | None = None,
        content_type: str = "application/json",
        upload: bool = False,
    ) -> dict:
        base = self.api_base.rstrip("/")
        prefix = "/upload/bigquery/v2" if upload else "/bigquery/v2"
        req = urllib.request.Request(
            f"{base}{prefix}{path}", data=body, method=method
        )
        req.add_header("Content-Type", content_type)
        if self.token:
            req.add_header("Authorization", f"Bearer {self.token}")
        try:
            with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
                raw = resp.read()
        except urllib.error.HTTPError as e:  # surface the API error body
            detail = e.read().decode("utf-8", "replace")
            if e.code == 404:
                raise _NotFound(detail) from e
            raise BigQueryError(f"{method} {path}: HTTP {e.code}: {detail}") from e
        return json.loads(raw) if raw else {}

    def _json(self, method: str, path: str, payload: dict | None = None) -> dict:
        body = json.dumps(payload).encode() if payload is not None else None
        return self._request(method, path, body)

    # datasets (sink.go:46-66)
    def get_dataset(self, dataset: str) -> dict | None:
        try:
            return self._json("GET", f"/projects/{self.project}/datasets/{dataset}")
        except _NotFound:
            return None

    def create_dataset(self, dataset: str, location: str, description: str) -> dict:
        return self._json(
            "POST",
            f"/projects/{self.project}/datasets",
            {
                "datasetReference": {
                    "projectId": self.project,
                    "datasetId": dataset,
                },
                "location": location,
                "description": description,
            },
        )

    # tables (schema_handler.go createOrUpdateTable)
    def get_table(self, dataset: str, table: str) -> dict | None:
        try:
            return self._json(
                "GET",
                f"/projects/{self.project}/datasets/{dataset}/tables/{table}",
            )
        except _NotFound:
            return None

    def create_table(self, dataset: str, metadata: dict) -> dict:
        return self._json(
            "POST", f"/projects/{self.project}/datasets/{dataset}/tables", metadata
        )

    def patch_table(self, dataset: str, table: str, patch: dict) -> dict:
        return self._json(
            "PATCH",
            f"/projects/{self.project}/datasets/{dataset}/tables/{table}",
            patch,
        )

    # streaming writes (table.go:62 Inserter().Put -> tabledata.insertAll)
    def insert_all(
        self, dataset: str, table: str, rows: list[dict], insert_ids: list[str]
    ) -> None:
        payload = {
            "kind": "bigquery#tableDataInsertAllRequest",
            "rows": [
                {"insertId": iid, "json": row}
                for iid, row in zip(insert_ids, rows)
            ],
        }
        out = self._json(
            "POST",
            f"/projects/{self.project}/datasets/{dataset}/tables/{table}/insertAll",
            payload,
        )
        errs = out.get("insertErrors")
        if errs:
            raise BigQueryError(f"insertAll returned row errors: {errs[:3]}")

    # bulk loads: multipart media upload jobs.insert + poll
    def load_ndjson(
        self, dataset: str, table: str, ndjson: bytes, poll_s: float = 0.2
    ) -> dict:
        job_config = {
            "configuration": {
                "load": {
                    "destinationTable": {
                        "projectId": self.project,
                        "datasetId": dataset,
                        "tableId": table,
                    },
                    "sourceFormat": "NEWLINE_DELIMITED_JSON",
                    "writeDisposition": "WRITE_APPEND",
                }
            }
        }
        boundary = "pgsink_bq_boundary"
        body = (
            f"--{boundary}\r\nContent-Type: application/json\r\n\r\n".encode()
            + json.dumps(job_config).encode()
            + f"\r\n--{boundary}\r\nContent-Type: application/octet-stream\r\n\r\n".encode()
            + ndjson
            + f"\r\n--{boundary}--\r\n".encode()
        )
        job = self._request(
            "POST",
            f"/projects/{self.project}/jobs?uploadType=multipart",
            body,
            content_type=f"multipart/related; boundary={boundary}",
            upload=True,
        )
        job_id = job["jobReference"]["jobId"]
        while job.get("status", {}).get("state") != "DONE":
            time.sleep(poll_s)
            job = self._json("GET", f"/projects/{self.project}/jobs/{job_id}")
        err = job["status"].get("errorResult")
        if err:
            raise BigQueryError(f"load job {job_id} failed: {err}")
        return job


class _NotFound(Exception):
    """404 — mapped to None by getters (allowNotFound, sink.go:81-87)."""


# --- schema handler + sink ----------------------------------------------------

INSERT_ALL_BATCH = 500  # rows/request, under the public 10 MB request cap


@dataclass
class BigQuerySinkOptions:
    """Options struct parity (sink.go:17-38)."""

    api_base: str
    project: str
    dataset: str
    location: str = "EU"
    token: str | None = None
    use_load_jobs: bool = False
    insert_batch: int = INSERT_ALL_BATCH


class BigQuerySink:
    """generic.Sink shape: ``handle_schema`` syncs dataset/raw/view,
    ``insert`` streams one envelope batch and returns the
    (count, max_lsn) ack watermark — same contract as WarehouseSink and
    JdbcWarehouseSink, so the router/pipeline wiring is shared."""

    def __init__(self, options: BigQuerySinkOptions):
        self.options = options
        self.client = BigQueryRestClient(
            options.api_base, options.project, options.token
        )
        self._schema_handler = SchemaHandler(self._sync)
        self._entries: dict[tuple[str, str], SchemaEntry] = {}

    # -- naming (schema_handler.go:36-39: raw table + view per source table)
    @staticmethod
    def raw_table_id(namespace: str, name: str) -> str:
        return f"{namespace}_{name}_raw"

    @staticmethod
    def view_table_id(namespace: str, name: str) -> str:
        return f"{namespace}_{name}"

    def _ensure_dataset(self) -> None:
        o = self.options
        if self.client.get_dataset(o.dataset) is None:
            self.client.create_dataset(
                o.dataset, o.location, "Dataset created by pgsink"
            )

    def _sync(self, entry: SchemaEntry) -> None:
        """Create-or-evolve the raw table, then create-or-update the
        view (schema_handler.go Handle). Evolution follows BigQuery's
        public rules: NEW payload fields append as NULLABLE via
        tables.patch; anything else (drop, retype) raises — additive
        evolution is exactly what the CDC relation-cache guarantees
        for in-stream ALTERs, and a violation must fail the batch, not
        silently corrupt (the round-4 advice contract: the fingerprint
        is cached only after DDL succeeds)."""
        o = self.options
        self._ensure_dataset()
        raw_id = self.raw_table_id(entry.namespace, entry.name)
        want_schema = bq_schema_of(entry)

        existing = self.client.get_table(o.dataset, raw_id)
        if existing is None:
            self.client.create_table(
                o.dataset,
                {
                    "tableReference": {
                        "projectId": o.project,
                        "datasetId": o.dataset,
                        "tableId": raw_id,
                    },
                    "schema": {"fields": want_schema},
                    "labels": {"origin": "pgsink"},
                    # clustering by pk + day partitioning by timestamp
                    # (schema_builders.go:99-107); keys live inside the
                    # payload RECORD so the paths are dotted
                    "clustering": {
                        "fields": [f"payload.{k}" for k in entry.key_columns]
                    },
                    "timePartitioning": {"type": "DAY", "field": "timestamp"},
                },
            )
        else:
            merged = _merge_schema(
                existing.get("schema", {}).get("fields", []), want_schema
            )
            if merged is not None:
                self.client.patch_table(
                    o.dataset, raw_id, {"schema": {"fields": merged}}
                )

        view_id = self.view_table_id(entry.namespace, entry.name)
        if not entry.key_columns:
            raise BigQueryError(
                f"table {view_id} has no detected primary key columns"
            )
        vq = view_query(o.project, o.dataset, raw_id, entry.key_columns)
        view_md = {
            "tableReference": {
                "projectId": o.project,
                "datasetId": o.dataset,
                "tableId": view_id,
            },
            "view": {"query": vq, "useLegacySql": False},
        }
        if self.client.get_table(o.dataset, view_id) is None:
            self.client.create_table(o.dataset, view_md)
        else:
            self.client.patch_table(
                o.dataset, view_id, {"view": {"query": vq, "useLegacySql": False}}
            )

    def handle_schema(self, entry: SchemaEntry) -> str:
        outcome = self._schema_handler.handle(entry)
        self._entries[(entry.namespace, entry.name)] = entry
        return outcome

    def insert(self, env: DataFrame, namespace: str, name: str) -> InsertResult:
        """Stream one envelope batch. Each executor partition owns its
        HTTP session: insertAll in capped batches with
        ``{lsn}-{sequence}`` insert ids (BigQuery's best-effort replay
        dedup — the at-least-once CDC source can resend a batch after
        a crash), or one NDJSON load job per partition when
        ``use_load_jobs`` (the backfill path: load jobs are atomic per
        job, the right tool for imports). ONE Spark job: the same
        mapPartitions pass that posts the rows returns each
        partition's (count, max lsn), folded driver-side into the ack
        watermark. (An Observation can't do this — observations fire
        only on DataFrame actions, and partition-wise HTTP needs the
        RDD path, where an Observation.get would block forever.)"""
        o = self.options
        raw_id = self.raw_table_id(namespace, name)
        serialized = _serialize_rows(env)

        api_base, project, dataset, token = (
            o.api_base,
            o.project,
            o.dataset,
            o.token,
        )
        batch, use_load = o.insert_batch, o.use_load_jobs

        def send_partition(it):
            client = BigQueryRestClient(api_base, project, token)
            buf_rows: list[dict] = []
            buf_ids: list[str] = []
            nd: list[bytes] = []
            n = 0
            max_lsn = None
            for r in it:
                n += 1
                if r["lsn"] is not None and (max_lsn is None or r["lsn"] > max_lsn):
                    max_lsn = r["lsn"]
                if use_load:
                    nd.append(r["j"].encode())
                else:
                    buf_rows.append(json.loads(r["j"]))
                    buf_ids.append(r["iid"])
                    if len(buf_rows) >= batch:
                        client.insert_all(dataset, raw_id, buf_rows, buf_ids)
                        buf_rows, buf_ids = [], []
            if buf_rows:
                client.insert_all(dataset, raw_id, buf_rows, buf_ids)
            if nd:
                client.load_ndjson(dataset, raw_id, b"\n".join(nd))
            yield (n, max_lsn)

        stats = serialized.rdd.mapPartitions(send_partition).collect()
        result = InsertResult(0, None)
        for n, mx in stats:
            result = result.fold(InsertResult(n, mx))
        return result


def _merge_schema(existing: list[dict], want: list[dict]) -> list[dict] | None:
    """Additive merge of the payload RECORD. Returns the patched field
    list, or None when nothing changed. Raises on a non-additive
    change (BigQuery would reject the patch; failing here keeps the
    error at the schema boundary with a readable message)."""
    by_name = {f["name"]: f for f in existing}
    w_payload = next(f for f in want if f["name"] == "payload")
    e_payload = by_name.get("payload", {"fields": []})
    e_fields = {f["name"]: f for f in e_payload.get("fields", [])}
    merged_payload = list(e_payload.get("fields", []))
    changed = False
    for f in w_payload["fields"]:
        have = e_fields.get(f["name"])
        if have is None:
            nf = dict(f)
            nf["mode"] = "NULLABLE"  # additions must be NULLABLE
            merged_payload.append(nf)
            changed = True
        elif have["type"] != f["type"]:
            raise BigQueryError(
                f"incompatible evolution for payload.{f['name']}: "
                f"{have['type']} -> {f['type']} (BigQuery allows additive"
                " NULLABLE fields only)"
            )
    if not changed:
        return None
    out = []
    for f in existing:
        if f["name"] == "payload":
            nf = dict(f)
            nf["fields"] = merged_payload
            out.append(nf)
        else:
            out.append(f)
    return out


def _operation_expr(env: DataFrame):
    from pgsink_spark.changelog.envelope import operation

    return operation()


def _image_expr(env: DataFrame):
    from pgsink_spark.changelog.envelope import after_or_before

    return after_or_before()


def _serialize_rows(env: DataFrame) -> DataFrame:
    """Envelope -> (j: JSON row for the API, iid: insertId). Pure
    column expressions; to_json runs in codegen on the executors."""
    return env.select(
        F.to_json(
            F.struct(
                F.date_format(
                    F.col("timestamp"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
                ).alias("timestamp"),
                F.col("lsn").alias("lsn"),
                F.col("sequence").alias("sequence"),
                _operation_expr(env).alias("operation"),
                _image_expr(env).alias("payload"),
            )
        ).alias("j"),
        F.concat_ws(
            "-",
            F.coalesce(F.col("lsn").cast("string"), F.lit("import")),
            F.coalesce(F.col("sequence").cast("string"), F.lit("0")),
        ).alias("iid"),
        F.col("lsn").alias("lsn"),
    )
