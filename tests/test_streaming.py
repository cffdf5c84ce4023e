"""M4: pgoutput decode, sequencing, marshal, subscription semantics,
and the Structured Streaming envelope path.

Mirrors the reference's test tiers: fixed-bytes decoder tests
(pkg/logical/decoder tests), sequencing (pkg/subscription/sequence),
marshal with relation cache (pkg/subscription/changelog), and the
subscription contract — no redelivery after confirm, replay otherwise
(pkg/subscription/subscription_test.go:205-262).
"""

from __future__ import annotations

import datetime
from datetime import timezone
from decimal import Decimal

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pgsink_spark.changelog.envelope import with_operation
from pgsink_spark.streaming import (
    Begin,
    Commit,
    Delete,
    Insert,
    OffsetStore,
    Relation,
    RelationCache,
    RelationColumn,
    Sequencer,
    Update,
    decode_message,
    marshal,
)
from pgsink_spark.streaming.decoder import (
    UNCHANGED,
    encode_begin,
    encode_commit,
    encode_delete,
    encode_insert,
    encode_relation,
    encode_update,
    pg_timestamp,
)
from pgsink_spark.streaming.marshal import text_parser_for
from pgsink_spark.changelog import envelope_schema
from pgsink_spark.streaming.stream import (
    envelope_file_stream,
    modifications_df,
    run_to_sink,
    session_window_agg,
    stream_dedup,
    tumbling_window_agg,
)
from pgsink_spark.streaming.subscription import Subscription

TS = datetime.datetime(2024, 3, 1, 12, 0, 0, tzinfo=timezone.utc)

REL = Relation(
    oid=16384,
    namespace="public",
    name="example",
    replica_identity=0,
    columns=(
        RelationColumn(key=True, name="id", type_oid=20, modifier=0xFFFFFFFF),
        RelationColumn(key=False, name="msg", type_oid=25, modifier=0xFFFFFFFF),
        RelationColumn(key=False, name="score", type_oid=1700, modifier=0xFFFFFFFF),
    ),
)


def _txn(lsn, xid, *dml):
    """Wire bytes for one transaction containing the given DML bytes."""
    return [
        encode_begin(lsn, TS, xid),
        *dml,
        encode_commit(0, lsn, lsn + 1, TS),
    ]


# -- decoder ------------------------------------------------------------

def test_decode_begin_commit_roundtrip():
    b = decode_message(encode_begin(1000, TS, 77))
    assert b == Begin(1000, TS, 77)
    c = decode_message(encode_commit(0, 1000, 1001, TS))
    assert c == Commit(0, 1000, 1001, TS)


def test_decode_unsigned_xid_and_oid():
    """XIDs/OIDs past 2^31 must decode as the positive uint32 the wire
    carries (reference pkg/logical/decoder.go reads Uint32), not as
    negative int32 — a negative type_oid would miss the type registry."""
    big_xid = 2**31 + 5
    assert decode_message(encode_begin(1, TS, big_xid)).xid == big_xid
    big_oid = 2**32 - 10
    rel = Relation(
        oid=big_oid,
        namespace="s",
        name="t",
        replica_identity=0,
        columns=(
            RelationColumn(
                key=True, name="id", type_oid=big_oid, modifier=0xFFFFFFFF
            ),
        ),
    )
    back = decode_message(encode_relation(rel))
    assert back.oid == big_oid
    assert back.columns[0].type_oid == big_oid
    assert back.columns[0].modifier == 0xFFFFFFFF


def test_pg_epoch_micros():
    # microseconds since 2000-01-01 (reference decoder.go:178-182)
    assert pg_timestamp(0) == datetime.datetime(2000, 1, 1, tzinfo=timezone.utc)
    assert pg_timestamp(86_400_000_000) == datetime.datetime(
        2000, 1, 2, tzinfo=timezone.utc
    )


def test_decode_relation_roundtrip():
    r = decode_message(encode_relation(REL))
    assert r == REL
    assert r.columns[0].key and not r.columns[1].key


def test_decode_insert_update_delete():
    ins = decode_message(encode_insert(REL.oid, (b"1", b"hello", b"1.5")))
    assert ins == Insert(REL.oid, (b"1", b"hello", b"1.5"))

    # update with TOAST-unchanged element and no old tuple
    upd = decode_message(encode_update(REL.oid, (b"1", UNCHANGED, b"2.5")))
    assert isinstance(upd, Update)
    assert upd.new[1] is UNCHANGED and upd.old is None and upd.key is None

    # update with key tuple (REPLICA IDENTITY via key change)
    updk = decode_message(
        encode_update(REL.oid, (b"2", b"x", b"0"), key=(b"1", None, None))
    )
    assert updk.key == (b"1", None, None)

    d = decode_message(encode_delete(REL.oid, key=(b"1", None, None)))
    assert d == Delete(REL.oid, None, (b"1", None, None))


def test_decode_unknown_kind_raises():
    with pytest.raises(ValueError, match="unknown pgoutput message"):
        decode_message(b"Zjunk")


# -- text parsers -------------------------------------------------------

def test_text_parsers_cover_registry():
    assert text_parser_for(16)("t") is True
    assert text_parser_for(20)("9000000000") == 9000000000
    assert text_parser_for(1700)("12.34") == Decimal("12.34")
    assert text_parser_for(17)("\\x0102") == b"\x01\x02"
    assert text_parser_for(1082)("2024-01-02") == datetime.date(2024, 1, 2)
    got = text_parser_for(1184)("2024-01-02 03:04:05+00")
    assert got == datetime.datetime(2024, 1, 2, 3, 4, 5, tzinfo=timezone.utc)
    assert text_parser_for(1007)("{1,2,NULL}") == [1, 2, None]
    assert text_parser_for(1009)('{a,"b,c",NULL}') == ["a", "b,c", None]
    with pytest.raises(Exception, match="unsupported postgres type"):
        text_parser_for(2950)  # uuid — explicitly unsupported


# -- sequencing ---------------------------------------------------------

def test_sequencer_wraps_and_counts():
    seq = Sequencer()
    assert seq.feed(decode_message(encode_begin(500, TS, 9))) is None
    s1 = seq.feed(decode_message(encode_insert(REL.oid, (b"1", b"a", b"0"))))
    s2 = seq.feed(decode_message(encode_insert(REL.oid, (b"2", b"b", b"0"))))
    assert (s1.lsn, s1.sequence) == (500, 1)
    assert (s2.lsn, s2.sequence) == (500, 2)
    assert s1.xid == 9 and s1.commit_time == TS
    assert seq.feed(decode_message(encode_commit(0, 500, 501, TS))) is None
    # DML outside a txn is a protocol error
    with pytest.raises(ValueError, match="outside a transaction"):
        seq.feed(decode_message(encode_insert(REL.oid, (b"3", b"c", b"0"))))


# -- marshal ------------------------------------------------------------

def test_marshal_typed_rows_and_toast_fallback():
    cache = RelationCache()
    seq = Sequencer()
    mods = []
    wire = _txn(
        600,
        10,
        encode_relation(REL),
        encode_insert(REL.oid, (b"1", b"hello", b"1.25")),
        encode_update(
            REL.oid, (b"1", UNCHANGED, b"2.50"), old=(b"1", b"hello", b"1.25")
        ),
        encode_delete(REL.oid, old=(b"1", b"hello", b"2.50")),
    )
    for buf in wire:
        sm = seq.feed(decode_message(buf))
        if sm is None:
            continue
        m = marshal(cache, sm)
        if m is not None:
            mods.append(m)

    ins, upd, dele = mods
    assert ins.after == {"id": 1, "msg": "hello", "score": Decimal("1.25")}
    assert ins.before is None and ins.sequence == 2  # Relation took seq 1
    # unchanged TOAST column keeps the old value
    assert upd.after["msg"] == "hello" and upd.after["score"] == Decimal("2.50")
    assert dele.after is None and dele.before["id"] == 1
    assert [m.lsn for m in mods] == [600, 600, 600]


def test_marshal_unknown_relation_errors():
    cache = RelationCache()
    seq = Sequencer()
    seq.feed(decode_message(encode_begin(1, TS, 1)))
    sm = seq.feed(decode_message(encode_insert(999, (b"1",))))
    with pytest.raises(ValueError, match="before its Relation"):
        marshal(cache, sm)


# -- subscription: confirm / replay contract ----------------------------

def test_subscription_no_redelivery_after_confirm(tmp_path):
    wire = [
        *_txn(100, 1, encode_relation(REL), encode_insert(REL.oid, (b"1", b"a", b"0"))),
        *_txn(200, 2, encode_insert(REL.oid, (b"2", b"b", b"0"))),
        *_txn(300, 3, encode_insert(REL.oid, (b"3", b"c", b"0"))),
    ]
    offsets = OffsetStore(str(tmp_path / "offsets.json"))
    sub = Subscription(offsets)
    got = [m.after["id"] for m in sub.stream(wire)]
    assert got == [1, 2, 3]

    # flush through LSN 200, restart (fresh store from same file)
    sub.confirm(200)
    sub2 = Subscription(OffsetStore(str(tmp_path / "offsets.json")))
    got2 = [m.after["id"] for m in sub2.stream(wire)]
    assert got2 == [3]  # ≤200 not redelivered; 300 replays

    with pytest.raises(ValueError, match="regression"):
        sub2.confirm(100)


# -- Structured Streaming path ------------------------------------------

PAYLOAD = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("msg", T.StringType()),
    ]
)


def test_envelope_stream_foreachbatch(spark, tmp_path):
    """File-stream envelope source → foreachBatch sink, availableNow."""
    src = str(tmp_path / "envelopes")
    naive = TS.replace(tzinfo=None)
    df = spark.createDataFrame(
        [
            (naive, "public", "example", 10, 0, None,
             {"id": 1, "msg": "a"}),
            (naive, "public", "example", 11, 1, {"id": 1, "msg": "a"}, None),
        ],
        schema=envelope_schema(PAYLOAD),
    )
    df.write.parquet(src)

    captured = []

    def insert(batch, batch_id):
        rows = with_operation(batch).collect()
        captured.extend(rows)

    stream = envelope_file_stream(spark, src, PAYLOAD)
    assert stream.isStreaming
    run_to_sink(stream, insert, str(tmp_path / "ckpt"))

    ops = sorted(r["operation"] for r in captured)
    assert ops == ["DELETE", "INSERT"]

    # restart with same checkpoint: no files re-processed (exactly-once
    # file tracking — the confirmed-LSN analogue)
    captured.clear()
    run_to_sink(envelope_file_stream(spark, src, PAYLOAD), insert,
                str(tmp_path / "ckpt"))
    assert captured == []


def test_streaming_windows_and_dedup(spark, sf_dir, tmp_path):
    """Streaming windows/dedup over events, checked against batch."""
    from pgsink_spark.sources.fixtures import load_table

    # watermarks require TIMESTAMP (not NTZ); session tz is UTC so the
    # cast is deterministic
    events = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    src = str(tmp_path / "events_stream")
    events.write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)

    results = {}

    def capture(name):
        def fn(batch, _bid):
            results.setdefault(name, []).extend(batch.collect())
        return fn

    for name, sdf in {
        "tumbling": tumbling_window_agg(stream),
        "session": session_window_agg(stream, gap="30 minutes"),
        "dedup": stream_dedup(stream),
    }.items():
        q = (
            sdf.writeStream.foreachBatch(capture(name))
            .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
            .outputMode("append" if name == "dedup" else "complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # batch equivalents
    batch_tumbling = (
        events.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .count()
    )
    assert len(results["tumbling"]) == batch_tumbling
    assert len(results["dedup"]) == events.select("event_id").distinct().count()
    assert len(results["session"]) > 0


def test_stream_stream_interval_join(spark, sf_dir, tmp_path):
    """Interval join of the events stream with itself, checked against
    the identical batch join."""
    from pgsink_spark.sources.fixtures import load_table
    from pgsink_spark.streaming.stream import stream_stream_interval_join

    events = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    src = str(tmp_path / "events_stream")
    events.write.parquet(src)

    left = spark.readStream.schema(events.schema).parquet(src)
    right = spark.readStream.schema(events.schema).parquet(src)
    joined = stream_stream_interval_join(left, right, horizon="15 minutes")

    rows = []
    q = (
        joined.writeStream.foreachBatch(lambda b, _i: rows.extend(b.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt_ssj"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    l, r = events.alias("l"), events.alias("r")
    batch = l.join(
        r,
        (F.col("l.user_id") == F.col("r.user_id"))
        & (F.col("l.event_id") != F.col("r.event_id"))
        & (F.col("r.ts") > F.col("l.ts"))
        & (F.col("r.ts") <= F.col("l.ts") + F.expr("interval 15 minutes")),
    )
    assert len(rows) == batch.count() > 0


def test_stream_interval_join_matches_batch(spark, sf_dir):
    """The registered stream-stream interval join (a REAL watermarked
    streaming run) equals the batch range join over the same events."""
    from pgsink_spark.operators import streaming_q  # noqa: F401 — registers
    from pgsink_spark.operators.relational import QUERIES
    from pgsink_spark.sources.fixtures import load_table
    from pyspark.sql import functions as F

    got = QUERIES["stream_interval_join"](spark, sf_dir).collect()

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"),
        "user_id", "event_type",
    )
    c = ev.where(F.col("event_type") == "click").alias("c")
    p = ev.where(F.col("event_type") == "purchase").alias("p")
    want = (
        c.join(
            p,
            (F.col("c.user_id") == F.col("p.user_id"))
            & (F.col("p.ts") > F.col("c.ts"))
            & (F.col("p.ts") <= F.col("c.ts") + F.expr("interval 10 minutes")),
        )
        .select(
            F.col("c.user_id").alias("user_id"),
            F.col("c.event_id").alias("click_id"),
            F.col("p.event_id").alias("purchase_id"),
        )
        .orderBy("user_id", "click_id", "purchase_id")
        .collect()
    )
    assert [(r["user_id"], r["click_id"], r["purchase_id"]) for r in got] == [
        (r["user_id"], r["click_id"], r["purchase_id"]) for r in want
    ]


def test_stream_shuffle_partitions_volume_rule():
    """r11 scale rule: streaming shuffle/state partitions derive from
    staged bytes (~64 MB advisory), floor 1, cap 200k; Python-stateful
    queries floor at the session's parallelism instead."""
    from pgsink_spark.operators.streaming_q import (
        _STREAM_MAX_PARTITIONS,
        _STREAM_TARGET_PARTITION_BYTES,
        _stream_shuffle_partitions,
    )

    t = _STREAM_TARGET_PARTITION_BYTES
    assert _stream_shuffle_partitions(0) == 1
    assert _stream_shuffle_partitions(2 * 1024**2) == 1
    assert _stream_shuffle_partitions(t) == 1
    assert _stream_shuffle_partitions(t + 1) == 2
    assert _stream_shuffle_partitions(10 * t) == 10
    assert (
        _stream_shuffle_partitions(10**15) == _STREAM_MAX_PARTITIONS
    )
    # compute floor for applyInPandasWithState queries
    assert _stream_shuffle_partitions(2 * 1024**2, compute_floor=32) == 32
    assert _stream_shuffle_partitions(100 * t, compute_floor=32) == 100
