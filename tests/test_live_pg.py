"""Live-Postgres integration harness (skip-gated).

This container ships neither a Postgres server nor a JDBC driver jar,
so every test here skips by default. Pointed at a real database they
exercise the paths the offline suite can only simulate with parquet
fixtures and fake servers: catalog discovery, the parallel JDBC
snapshot, the keyset import loop against a live index, and the
replication-protocol client consuming a real pgoutput stream
(reference integration strategy: pkg/imports/integration,
pkg/subscription/integration — dockerised PG in CI).

Environment:

  PGSINK_TEST_PG_HOST / _PORT / _DB / _USER / _PASSWORD
      Replication-capable Postgres (wal_level=logical, user has
      REPLICATION + CREATE). Enables the socket-client tests — no
      Python driver needed; plain SQL rides the logical-walsender
      connection (supported since PG 10).
  PGSINK_TEST_JDBC_URL   jdbc:postgresql://host:port/db?user=...
  PGSINK_TEST_JDBC_JAR   path to postgresql-*.jar

Run this file in its OWN pytest invocation so the JDBC jar can be
attached to a fresh JVM (a session created by other test modules
cannot gain jars after the fact):

    PGSINK_TEST_JDBC_URL=... PGSINK_TEST_JDBC_JAR=... \
        python -m pytest tests/test_live_pg.py -v
"""

from __future__ import annotations

import os
import socket
import uuid

import pytest

from pgsink_spark.sources import jdbc
from pgsink_spark.streaming.decoder import (
    Begin,
    Commit,
    Insert,
    Relation,
    decode_message,
)
from pgsink_spark.streaming.replication import ReplicationClient

PG_HOST = os.environ.get("PGSINK_TEST_PG_HOST")
JDBC_URL = os.environ.get("PGSINK_TEST_JDBC_URL")
JDBC_JAR = os.environ.get("PGSINK_TEST_JDBC_JAR")

needs_pg = pytest.mark.skipif(
    PG_HOST is None, reason="PGSINK_TEST_PG_HOST not set (no live Postgres)"
)
needs_jdbc = pytest.mark.skipif(
    JDBC_URL is None or JDBC_JAR is None,
    reason="PGSINK_TEST_JDBC_URL / _JAR not set (no JDBC driver in container)",
)


def _connect_replication() -> ReplicationClient:
    sock = socket.create_connection(
        (PG_HOST, int(os.environ.get("PGSINK_TEST_PG_PORT", "5432"))),
        timeout=10,
    )
    # sslmode=prefer semantics: negotiate TLS when the server offers
    # it, fall back to plaintext otherwise (PGSINK_TEST_PG_SSL=require
    # makes refusal an error). SCRAM-SHA-256 is handled inside
    # connect() — a stock PG 14+ with scram auth works out of the box.
    import ssl

    from pgsink_spark.streaming.replication import start_tls

    mode = os.environ.get("PGSINK_TEST_PG_SSL", "prefer")
    if mode != "disable":
        ctx = ssl.create_default_context()
        if os.environ.get("PGSINK_TEST_PG_SSL_NOVERIFY"):
            ctx.check_hostname = False
            ctx.verify_mode = ssl.CERT_NONE
        sock = start_tls(
            sock, context=ctx, server_hostname=PG_HOST,
            required=(mode == "require"),
        )
    client = ReplicationClient(
        sock,
        database=os.environ.get("PGSINK_TEST_PG_DB", "postgres"),
        user=os.environ.get("PGSINK_TEST_PG_USER", "postgres"),
        password=os.environ.get("PGSINK_TEST_PG_PASSWORD"),
        heartbeat_interval_s=5.0,
    )
    client.connect()
    return client


@needs_pg
class TestLiveReplication:
    def test_identify_system(self):
        client = _connect_replication()
        info = client.identify_system()
        assert "xlogpos" in info and "systemid" in info

    def test_pgoutput_roundtrip(self):
        """Create table + publication + temp slot, insert, and decode
        the resulting pgoutput stream with the repo's decoder — the
        live twin of tests/test_replication.py's fake-server loop."""
        run = uuid.uuid4().hex[:8]
        table, pub, slot = (
            f"pgsink_it_{run}",
            f"pgsink_it_pub_{run}",
            f"pgsink_it_slot_{run}",
        )
        client = _connect_replication()
        try:
            client._simple_query(
                f"CREATE TABLE {table} (id int primary key, msg text)"
            )
            client._simple_query(
                f"CREATE PUBLICATION {pub} FOR TABLE {table}"
            )
            # TEMPORARY ⇒ the slot dies with this connection: no cleanup
            # debt even on test failure (ref uses the same trick:
            # pkg/subscription/integration setup).
            client._simple_query(
                f'CREATE_REPLICATION_SLOT "{slot}" TEMPORARY LOGICAL pgoutput'
            )
            client._simple_query(
                f"INSERT INTO {table} VALUES (1, 'hello'), (2, 'world')"
            )
            client.start_replication(slot, pub, proto_version=1)

            inserts, relations, committed = [], {}, False
            for msg in client.messages():
                if not hasattr(msg, "payload"):
                    continue  # keepalive
                decoded = decode_message(msg.payload)
                if isinstance(decoded, Relation):
                    relations[decoded.oid] = decoded
                elif isinstance(decoded, Insert):
                    inserts.append(decoded)
                elif isinstance(decoded, Commit):
                    client.flush_lsn = msg.wal_end
                    client.send_standby_status()
                    committed = True
                    break
                elif isinstance(decoded, Begin):
                    pass
            assert committed
            assert len(inserts) == 2
            rel = relations[inserts[0].relation_oid]
            assert rel.name == table
            assert [c.name for c in rel.columns] == ["id", "msg"]
        finally:
            try:
                client._simple_query(f"DROP PUBLICATION IF EXISTS {pub}")
                client._simple_query(f"DROP TABLE IF EXISTS {table}")
            except Exception:
                pass


@needs_jdbc
class TestLiveJdbc:
    @pytest.fixture(scope="class")
    def jdbc_spark(self):
        from pyspark.sql import SparkSession

        active = SparkSession.getActiveSession()
        if active is not None and JDBC_JAR not in (
            active.conf.get("spark.jars", "")
        ):
            pytest.skip(
                "a SparkSession without the JDBC jar already exists; "
                "run tests/test_live_pg.py in its own pytest invocation"
            )
        s = (
            SparkSession.builder.master("local[4]")
            .appName("pgsink-live-jdbc")
            .config("spark.jars", JDBC_JAR)
            .config("spark.sql.shuffle.partitions", "8")
            .getOrCreate()
        )
        yield s
        s.stop()

    @pytest.fixture(scope="class")
    def seeded_table(self, jdbc_spark):
        """Seed a 1000-row table through the walsender SQL channel so
        the JDBC tests have known content, independent of any driver."""
        run = uuid.uuid4().hex[:8]
        table = f"pgsink_it_jdbc_{run}"
        client = _connect_replication()
        client._simple_query(
            f"CREATE TABLE {table} (id int primary key, val text)"
        )
        client._simple_query(
            f"INSERT INTO {table} "
            f"SELECT g, 'v' || g FROM generate_series(1, 1000) g"
        )
        yield table
        client._simple_query(f"DROP TABLE IF EXISTS {table}")

    def test_discover_tables_and_pk(self, jdbc_spark, seeded_table):
        tables = jdbc.discover_tables(jdbc_spark, JDBC_URL, ["public"])
        names = {r["name"] for r in tables.collect()}
        assert seeded_table in names
        pk = jdbc.discover_primary_key(
            jdbc_spark, JDBC_URL, "public", seeded_table
        )
        assert pk == ["id"]

    def test_parallel_snapshot(self, jdbc_spark, seeded_table):
        df = jdbc.read_snapshot(
            jdbc_spark,
            url=JDBC_URL,
            table=seeded_table,
            pk="id",
            lower=1,
            upper=1000,
            num_partitions=4,
        )
        assert df.rdd.getNumPartitions() == 4
        assert df.count() == 1000

    def test_keyset_batch_loop(self, jdbc_spark, seeded_table):
        """The resumable import loop against a live index: every batch
        bounded server-side, cursor advances past each batch's max pk,
        union of batches is exactly the table."""
        seen, cursor = 0, None
        for _ in range(100):
            opts = jdbc.keyset_batch_options(
                JDBC_URL, seeded_table, "id", cursor, limit=128
            )
            batch = (
                jdbc_spark.read.format("jdbc").options(**opts).load()
            ).collect()
            if not batch:
                break
            ids = [r["id"] for r in batch]
            assert ids == sorted(ids)
            if cursor is not None:
                assert ids[0] > cursor
            cursor = ids[-1]
            seen += len(ids)
        assert seen == 1000
