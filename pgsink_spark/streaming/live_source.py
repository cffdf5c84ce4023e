"""Live Structured-Streaming source: ``format("pgoutput-live")``.

Composes the two proven halves into one continuously-running Spark
stream against a real Postgres:

- the LIVE half (streaming/live.py): every ``latestOffset`` poll runs
  one reconnecting, exactly-once-append drain of the walsender into a
  local spool capture file (the drain is availableNow — it catches up
  to the server's WAL position and returns, so a poll is bounded);
- the FILE half (streaming/datasource.py): offsets, partition
  planning, decode, and checkpoint commit run unchanged over the
  spool — Spark's checkpoint still owns exactly-once delivery into
  sinks, and ``commit`` keeps advancing the ``.confirmed`` watermark.

This is the reference's long-running subscription loop
(pkg/subscription/stream.go) re-expressed in Spark's execution model:
the driver-side poll does the socket work (control-plane sized — raw
WAL bytes land in the spool, not in driver memory), executors decode
in parallel from the spool, and a crashed query restarts from its
checkpoint + the slot's confirmed LSN without loss or duplication.

Connection posture: one dial per poll (the drain closes its
connection when caught up). That keeps the reader stateless and
pickle-safe for executor shipping; a deployment chasing lower latency
per poll raises the trigger interval or runs the capture CLI as a
sidecar appending to the same spool — the file half is identical
either way.

Options (all strings, DataSource API):
  pghost/pgport/pgdb/pguser/pgpassword/pgssl — server + auth
  slot, publication      — replication identity (created if missing)
  tables                 — optional "ns.t1,ns.t2" publication sync list
  path                   — spool capture file (required)
  maxcommitspertrigger / maxpartitions / drainid — file-half options
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource
from pyspark.sql.types import StructType

from pgsink_spark.streaming.datasource import (
    GENERIC_ENVELOPE,
    PgoutputStreamReader,
)


def _connect_from_options(opts: dict):
    import os
    import socket as _socket

    from pgsink_spark.streaming.replication import ReplicationClient, start_tls

    host = opts["pghost"]
    port = int(opts.get("pgport", "5432"))
    ssl_mode = opts.get("pgssl", "prefer")
    sock = _socket.create_connection((host, port), timeout=10)
    if ssl_mode != "disable":
        import ssl as _ssl

        ctx = _ssl.create_default_context()
        if os.environ.get("PGSINK_TEST_PG_SSL_NOVERIFY"):
            ctx.check_hostname = False
            ctx.verify_mode = _ssl.CERT_NONE
        sock = start_tls(
            sock, context=ctx, server_hostname=host,
            required=(ssl_mode == "require"),
        )
    client = ReplicationClient(
        sock,
        database=opts.get("pgdb", "postgres"),
        user=opts.get("pguser", "postgres"),
        password=opts.get("pgpassword"),
        heartbeat_interval_s=5.0,
    )
    client.connect()
    return client


class PgoutputLiveStreamReader(PgoutputStreamReader):
    """File-half reader whose ``latestOffset`` first drains live WAL."""

    def __init__(self, options: dict):
        super().__init__(options)
        self._opts = dict(options)
        self._provisioned = False

    def _dbg(self, msg: str) -> None:
        import os

        path = os.environ.get("PGSINK_LIVE_SOURCE_DEBUG")
        if path:
            with open(path, "a") as f:
                f.write(f"pid={os.getpid()} {msg}\n")

    def _drain(self) -> None:
        self._dbg("drain start")
        from pgsink_spark.streaming.live import (
            capture_with_retry,
            ensure_publication,
            ensure_slot,
            sync_publication_tables,
        )

        slot = self._opts["slot"]
        publication = self._opts["publication"]
        if not self._provisioned:
            client = _connect_from_options(self._opts)
            try:
                ensure_publication(client, publication)
                tables = self._opts.get("tables")
                if tables:
                    desired = {
                        tuple(t.split(".", 1))
                        for t in tables.split(",")
                        if t
                    }
                    sync_publication_tables(client, publication, desired)
                ensure_slot(client, slot)
                from pgsink_spark.streaming.live import publication_tables

                self._dbg(
                    f"provisioned pub={publication} "
                    f"members={publication_tables(client, publication)}"
                )
            finally:
                client.close()
            self._provisioned = True
        report = capture_with_retry(
            lambda: _connect_from_options(self._opts),
            slot,
            publication,
            self.path,
            max_reconnects=3,
        )
        self._dbg(f"drain done: {report}")

    def initialOffset(self) -> dict:
        self._drain()  # the spool may not exist before the first drain
        return super().initialOffset()

    def latestOffset(self) -> dict:
        self._drain()
        return super().latestOffset()


class PgoutputLiveDataSource(DataSource):
    """``spark.readStream.format("pgoutput-live")`` — live CDC stream."""

    @classmethod
    def name(cls) -> str:
        return "pgoutput-live"

    def schema(self) -> StructType:
        return GENERIC_ENVELOPE

    def streamReader(self, schema: StructType) -> PgoutputLiveStreamReader:
        return PgoutputLiveStreamReader(self.options)


def register_live(spark) -> None:
    spark.dataSource.register(PgoutputLiveDataSource)
