"""Incremental keyed compaction (sinks/compactor.py): merge-per-batch
semantics, tombstone retention, bucket-level write pruning, and
equivalence with the read-time compaction view."""

from __future__ import annotations

import pytest
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from pgsink_spark.changelog.envelope import envelope_schema
from pgsink_spark.sinks.compactor import KeyedCompactedTable

PAYLOAD = T.StructType(
    [
        T.StructField("id", T.LongType(), True),
        T.StructField("v", T.StringType(), True),
    ]
)


def _batch(spark, rows):
    """rows: (ts_seconds, lsn, seq, before, after) tuples."""
    data = [
        (
            __import__("datetime").datetime(2024, 1, 1, 0, 0, ts),
            "public",
            "t",
            lsn,
            seq,
            before,
            after,
        )
        for ts, lsn, seq, before, after in rows
    ]
    return spark.createDataFrame(data, envelope_schema(PAYLOAD))


@pytest.mark.slow
def test_incremental_merge_upsert_delete_latearrival(spark, tmp_path):
    tbl = KeyedCompactedTable(
        spark, str(tmp_path / "compacted"), ["id"], n_buckets=8
    )

    # batch 1: insert k1..k3, then update k2 in the same batch
    tbl.apply_batch(
        _batch(
            spark,
            [
                (1, 10, 0, None, (1, "a1")),
                (1, 10, 1, None, (2, "b1")),
                (1, 10, 2, None, (3, "c1")),
                (2, 11, 0, (2, "b1"), (2, "b2")),
            ],
        )
    )
    got = {r["id"]: r["v"] for r in tbl.read().collect()}
    assert got == {1: "a1", 2: "b2", 3: "c1"}

    # batch 2: delete k3, update k1, insert k4
    tbl.apply_batch(
        _batch(
            spark,
            [
                (3, 12, 0, (3, "c1"), None),
                (3, 12, 1, (1, "a1"), (1, "a2")),
                (4, 13, 0, None, (4, "d1")),
            ],
        )
    )
    got = {r["id"]: r["v"] for r in tbl.read().collect()}
    assert got == {1: "a2", 2: "b2", 4: "d1"}

    # tombstone is physically retained (filtered at read time)
    raw = spark.read.parquet(tbl.path)
    assert raw.where(F.col("operation") == "DELETE").count() == 1

    # late arrival: an OLDER image of deleted k3 must not resurrect it
    tbl.apply_batch(_batch(spark, [(2, 11, 5, (3, "c0"), (3, "c-old"))]))
    got = {r["id"]: r["v"] for r in tbl.read().collect()}
    assert 3 not in got

    # point lookup prunes to one bucket and agrees with read()
    assert [r["v"] for r in tbl.read_key(id=1).collect()] == ["a2"]


def test_only_affected_buckets_rewritten(spark, tmp_path):
    tbl = KeyedCompactedTable(
        spark, str(tmp_path / "compacted"), ["id"], n_buckets=8
    )
    # spread 32 keys over the 8 buckets
    tbl.apply_batch(
        _batch(
            spark,
            [(1, 10, i, None, (i, f"v{i}")) for i in range(32)],
        )
    )
    listing_before = {}
    for d in os.listdir(tbl.path):
        if d.startswith("bucket="):
            p = os.path.join(tbl.path, d)
            listing_before[d] = sorted(
                (f, os.path.getmtime(os.path.join(p, f)))
                for f in os.listdir(p)
                if f.endswith(".parquet")
            )
    assert len(listing_before) == 8

    # single-key update touches exactly one bucket
    affected = tbl.apply_batch(_batch(spark, [(2, 11, 0, (7, "v7"), (7, "x"))]))
    assert len(affected) == 1

    untouched = [d for d in listing_before if d != f"bucket={affected[0]}"]
    assert untouched
    for d in untouched:
        p = os.path.join(tbl.path, d)
        now = sorted(
            (f, os.path.getmtime(os.path.join(p, f)))
            for f in os.listdir(p)
            if f.endswith(".parquet")
        )
        assert now == listing_before[d], f"{d} was rewritten"

    got = {r["id"]: r["v"] for r in tbl.read().collect()}
    assert got[7] == "x" and len(got) == 32


def test_matches_readtime_compaction_view(spark, tmp_path):
    """The materialized table equals the view's answer on the same
    envelope stream (same ordering clause — switching readers between
    the two is invisible)."""
    from pgsink_spark.sinks.warehouse import compaction_view_sql

    rows = [
        (1, 10, 0, None, (1, "a1")),
        (2, 11, 0, (1, "a1"), (1, "a2")),
        (2, 11, 1, (1, "a2"), (1, "a3")),  # same ts+lsn: sequence decides
        (3, 12, 0, None, (2, "b1")),
        (4, 13, 0, (2, "b1"), None),  # delete k2
    ]
    env = _batch(spark, rows)

    tbl = KeyedCompactedTable(spark, str(tmp_path / "c2"), ["id"], n_buckets=4)
    tbl.apply_batch(env)

    env.select(
        "timestamp",
        "lsn",
        "sequence",
        F.when(F.col("after").isNull(), "DELETE").otherwise("X").alias(
            "operation"
        ),
        F.coalesce("after", "before").alias("payload"),
    ).createOrReplaceTempView("cmp_raw")
    spark.sql(compaction_view_sql("cmp_view", "cmp_raw", ["id"]))
    want = {r["id"]: r["v"] for r in spark.table("cmp_view").collect()}
    got = {r["id"]: r["v"] for r in tbl.read().collect()}
    assert got == want == {1: "a3"}


def test_gc_tombstones_drops_old_keeps_recent(spark, tmp_path):
    tbl = KeyedCompactedTable(
        spark, str(tmp_path / "c3"), ["id"], n_buckets=4
    )
    tbl.apply_batch(
        _batch(
            spark,
            [
                (1, 10, 0, None, (1, "a")),
                (2, 11, 0, None, (2, "b")),
                (3, 12, 0, (1, "a"), None),  # old delete (lsn 12)
                (4, 20, 0, (2, "b"), None),  # recent delete (lsn 20)
            ],
        )
    )
    raw = spark.read.parquet(tbl.path)
    assert raw.where(F.col("operation") == "DELETE").count() == 2

    rewritten = tbl.gc_tombstones(up_to_lsn=15)
    assert rewritten  # at least one bucket rewritten
    raw = spark.read.parquet(tbl.path)
    tombs = {
        r["lsn"] for r in raw.where(F.col("operation") == "DELETE").collect()
    }
    assert tombs == {20}  # old tombstone gone, recent one survives
    # live view unchanged (both keys deleted either way)
    assert tbl.read().count() == 0
    # second GC with the same horizon is a no-op
    assert tbl.gc_tombstones(up_to_lsn=15) == []


def test_composite_key_merge(spark, tmp_path):
    """Multi-column primary keys: bucket hash, merge window, and point
    lookup all key on the full composite."""
    import datetime

    payload2 = T.StructType(
        [
            T.StructField("ns", T.StringType(), True),
            T.StructField("id", T.LongType(), True),
            T.StructField("v", T.StringType(), True),
        ]
    )
    rows = [
        (datetime.datetime(2024, 1, 1), "public", "t", 10, 0, None,
         {"ns": "a", "id": 1, "v": "x"}),
        (datetime.datetime(2024, 1, 1), "public", "t", 10, 1, None,
         {"ns": "b", "id": 1, "v": "y"}),  # same id, different ns
        (datetime.datetime(2024, 1, 2), "public", "t", 11, 0,
         {"ns": "a", "id": 1, "v": "x"}, {"ns": "a", "id": 1, "v": "x2"}),
    ]
    env = spark.createDataFrame(rows, envelope_schema(payload2))
    tbl = KeyedCompactedTable(
        spark, str(tmp_path / "ck"), ["ns", "id"], n_buckets=4
    )
    tbl.apply_batch(env)
    got = {(r["ns"], r["id"]): r["v"] for r in tbl.read().collect()}
    # (a,1) updated; (b,1) untouched — composite key keeps them apart
    assert got == {("a", 1): "x2", ("b", 1): "y"}
    assert [r["v"] for r in tbl.read_key(ns="a", id=1).collect()] == ["x2"]
    assert [r["v"] for r in tbl.read_key(ns="b", id=1).collect()] == ["y"]
