"""Streaming DataSource tests: pgoutput capture → Spark stream → commit.

The driver contract under test is the reference's
no-redelivery-after-confirm property (subscription_test.go:205-262),
re-expressed as Spark streaming-offset semantics: the checkpoint owns
the LSN offset, `commit` advances the confirmed watermark, and a
restarted query resumes past it.
"""

from __future__ import annotations

import datetime
from datetime import timezone

from pgsink_spark.streaming.datasource import (
    PgoutputStreamReader,
    append_capture,
    read_capture,
    register,
)
from pgsink_spark.streaming.decoder import (
    Relation,
    RelationColumn,
    encode_begin,
    encode_commit,
    encode_insert,
    encode_relation,
)
from pgsink_spark.streaming.offsets import OffsetStore

TS = datetime.datetime(2024, 3, 1, 12, 0, 0, tzinfo=timezone.utc)

REL = Relation(
    oid=16384,
    namespace="public",
    name="example",
    replica_identity=0,
    columns=(
        RelationColumn(key=True, name="id", type_oid=20, modifier=0xFFFFFFFF),
        RelationColumn(key=False, name="v", type_oid=25, modifier=0xFFFFFFFF),
    ),
)


def _txn(lsn, xid, *rows):
    return [
        encode_begin(lsn, TS, xid),
        encode_relation(REL),
        *[encode_insert(REL.oid, r) for r in rows],
        encode_commit(0, lsn, lsn + 1, TS),
    ]


def test_capture_roundtrip(tmp_path):
    path = str(tmp_path / "wal.capture")
    msgs = _txn(100, 7, (1, "a"), (2, "b"))
    append_capture(path, msgs)
    append_capture(path, _txn(200, 8, (3, "c")))
    assert read_capture(path) == msgs + _txn(200, 8, (3, "c"))


def test_reader_offsets_and_range_reads(tmp_path):
    path = str(tmp_path / "wal.capture")
    append_capture(path, _txn(100, 7, (1, "a")) + _txn(200, 8, (2, "b")))
    reader = PgoutputStreamReader({"path": path})
    assert reader.initialOffset() == {"lsn": 0}
    assert reader.latestOffset() == {"lsn": 200}

    (part,) = reader.partitions({"lsn": 0}, {"lsn": 200})
    rows = list(reader.read(part))
    assert [(r[3], r[6]["id"]) for r in rows] == [(100, "1"), (200, "2")]

    # half-open range: a second batch starting at 100 excludes txn 100
    (part2,) = reader.partitions({"lsn": 100}, {"lsn": 200})
    rows2 = list(reader.read(part2))
    assert [(r[3], r[6]["id"]) for r in rows2] == [(200, "2")]


def test_commit_advances_confirmed_watermark(tmp_path):
    path = str(tmp_path / "wal.capture")
    append_capture(path, _txn(100, 7, (1, "a")))
    reader = PgoutputStreamReader({"path": path})
    reader.commit({"lsn": 100})
    assert OffsetStore(path + ".confirmed").confirmed_lsn == 100
    # monotonic: late/duplicate commits never regress the watermark
    reader.commit({"lsn": 50})
    assert OffsetStore(path + ".confirmed").confirmed_lsn == 100


def test_streaming_source_e2e_with_restart(spark, tmp_path):
    """Live stream: rows land per micro-batch; `commit` advances the
    confirmed watermark one batch behind (Spark acks batch N when batch
    N+1 plans — the same next-heartbeat WAL-release lag the reference
    has); a restart from the checkpoint redelivers nothing."""
    import time

    path = str(tmp_path / "wal.capture")
    ckpt = str(tmp_path / "ckpt")

    register(spark)

    def start(batch_rows):
        def sink(df, _bid):
            batch_rows.extend(df.collect())

        return (
            spark.readStream.format("pgoutput")
            .option("path", path)
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="300 milliseconds")
            .start()
        )

    def wait_for(cond, timeout_s=60.0):
        deadline = time.time() + timeout_s
        while time.time() < deadline:
            if cond():
                return True
            time.sleep(0.2)
        return False

    def confirmed():
        import os

        if not os.path.exists(path + ".confirmed"):
            return 0
        return OffsetStore(path + ".confirmed").confirmed_lsn or 0

    rows: list = []
    append_capture(path, _txn(100, 7, (1, "a")) + _txn(200, 8, (2, "b")))
    q = start(rows)
    try:
        assert wait_for(lambda: len(rows) == 2)
        assert [(r["lsn"], r["after"]["id"]) for r in rows] == [
            (100, "1"),
            (200, "2"),
        ]
        # next transaction arrives → batch 1 delivers it AND acks batch 0
        append_capture(path, _txn(300, 9, (3, "c")))
        assert wait_for(lambda: len(rows) == 3 and confirmed() >= 200)
        assert (rows[2]["lsn"], rows[2]["after"]["id"]) == (300, "3")
    finally:
        q.stop()
        q.awaitTermination()

    # restart from the checkpoint: nothing redelivered; the next new
    # transaction is the only thing that flows, and its arrival acks
    # everything before it
    rows2: list = []
    q2 = start(rows2)
    try:
        append_capture(path, _txn(400, 10, (4, "d")))
        assert wait_for(lambda: len(rows2) >= 1 and confirmed() >= 300)
        assert [(r["lsn"], r["after"]["id"]) for r in rows2] == [(400, "4")]
    finally:
        q2.stop()
        q2.awaitTermination()
