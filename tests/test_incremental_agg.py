"""Incremental aggregate maintenance (sinks/incremental_agg.py):
delta merges equal recompute-from-scratch through inserts, updates,
deletes, and group disappearance."""

from __future__ import annotations

import pytest
import datetime

from pyspark.sql import functions as F
from pyspark.sql import types as T

from pgsink_spark.changelog.envelope import envelope_schema
from pgsink_spark.sinks.incremental_agg import IncrementalAgg

PAYLOAD = T.StructType(
    [
        T.StructField("k", T.StringType(), True),
        T.StructField("amount", T.LongType(), True),
    ]
)


def _batch(spark, rows):
    """rows: (lsn, before, after)."""
    data = [
        (datetime.datetime(2024, 1, 1), "public", "t", lsn, 0, before, after)
        for lsn, before, after in rows
    ]
    return spark.createDataFrame(data, envelope_schema(PAYLOAD))


def _state(agg):
    return {
        r["k"]: (r["agg_sum"], r["agg_cnt"], r["agg_avg"])
        for r in agg.read().collect()
    }


def test_insert_update_delete_deltas(spark, tmp_path):
    agg = IncrementalAgg(spark, str(tmp_path / "agg"), ["k"], "amount")

    # batch 1: inserts across two groups
    agg.apply_batch(
        _batch(
            spark,
            [
                (10, None, ("a", 5)),
                (11, None, ("a", 7)),
                (12, None, ("b", 10)),
            ],
        )
    )
    assert _state(agg) == {"a": (12, 2, 6.0), "b": (10, 1, 10.0)}

    # batch 2: value update within a group, group-moving update, delete
    agg.apply_batch(
        _batch(
            spark,
            [
                (13, ("a", 5), ("a", 8)),     # a: 12 -> 15
                (14, ("b", 10), ("a", 10)),   # b loses row, a gains
                (15, ("a", 7), None),         # delete: a loses 7
            ],
        )
    )
    # a: rows {8, 10} → sum 18 cnt 2; b: gone entirely
    assert _state(agg) == {"a": (18, 2, 9.0)}

    # batch 3: resurrect b
    agg.apply_batch(_batch(spark, [(16, None, ("b", 3))]))
    assert _state(agg) == {"a": (18, 2, 9.0), "b": (3, 1, 3.0)}


def test_matches_full_recompute(spark, tmp_path):
    """Random-ish stream of ops: incremental state == aggregate of the
    final row set."""
    agg = IncrementalAgg(spark, str(tmp_path / "agg2"), ["k"], "amount")
    live = {}  # row_id -> (k, amount)
    lsn = 100
    batches = [
        [("ins", 1, ("x", 4)), ("ins", 2, ("y", 6)), ("ins", 3, ("x", 1))],
        [("upd", 1, ("x", 9)), ("ins", 4, ("z", 2)), ("del", 2, None)],
        [("upd", 3, ("y", 5)), ("del", 4, None), ("ins", 5, ("y", 8))],
    ]
    for b in batches:
        rows = []
        for op, rid, img in b:
            if op == "ins":
                rows.append((lsn, None, img))
                live[rid] = img
            elif op == "upd":
                rows.append((lsn, live[rid], img))
                live[rid] = img
            else:
                rows.append((lsn, live.pop(rid), None))
            lsn += 1
        agg.apply_batch(_batch(spark, rows))

    want = {}
    for k, amount in live.values():
        s, c = want.get(k, (0, 0))
        want[k] = (s + amount, c + 1)
    got = {k: (s, c) for k, (s, c, _a) in _state(agg).items()}
    assert got == want


def test_replayed_epoch_is_skipped(spark, tmp_path):
    agg = IncrementalAgg(spark, str(tmp_path / "agg_replay"), ["k"], "amount")
    env = _batch(spark, [(10, None, ("a", 5))])
    assert agg.apply_batch(env, 3) == 1
    assert _state(agg) == {"a": (5, 1, 5.0)}
    # re-delivery of epoch 3 and a stale epoch are both skipped
    assert agg.apply_batch(env, 3) == 0
    assert agg.apply_batch(env, 1) == 0
    assert _state(agg) == {"a": (5, 1, 5.0)}
    # the next epoch applies
    assert agg.apply_batch(env, 4) == 1
    assert _state(agg) == {"a": (10, 2, 5.0)}


def test_foreachbatch_availablenow_stream(spark, tmp_path):
    """The aggregate maintains itself under a REAL Structured Streaming
    foreachBatch (availableNow file source), with Spark's batch ids as
    the exactly-once epochs; a checkpointed re-run reprocesses nothing."""
    from pgsink_spark.streaming.stream import envelope_file_stream, run_to_sink

    src = str(tmp_path / "env_in")
    agg = IncrementalAgg(spark, str(tmp_path / "agg_stream"), ["k"], "amount")

    _batch(spark, [(10, None, ("a", 5)), (11, None, ("b", 7))]).write.mode(
        "overwrite"
    ).parquet(src)
    run = lambda: run_to_sink(  # noqa: E731
        envelope_file_stream(spark, src, PAYLOAD),
        lambda df, eid: agg.apply_batch(df, eid),
        str(tmp_path / "ckpt"),
    )
    run()
    assert _state(agg) == {"a": (5, 1, 5.0), "b": (7, 1, 7.0)}

    # restart with the same checkpoint and no new files: no re-apply
    run()
    assert _state(agg) == {"a": (5, 1, 5.0), "b": (7, 1, 7.0)}

    # new file lands (update a, delete b) → next epoch folds it in
    _batch(
        spark,
        [(20, ("a", 5), ("a", 9)), (21, ("b", 7), None)],
    ).write.mode("append").parquet(src)
    run()
    assert _state(agg) == {"a": (9, 1, 9.0)}


@pytest.mark.slow
def test_minmax_hybrid_maintenance(spark, tmp_path):
    """MIN/MAX maintenance: inserts fold in monotonically with NO base
    read; only a retraction that ties a stored extremum triggers a
    recompute, and only for that group."""
    from pgsink_spark.sinks.incremental_agg import IncrementalMinMax

    base: dict = {}  # pk -> (k, amount): the logical table state
    calls = {"n": 0}

    def base_rows():
        calls["n"] += 1
        return spark.createDataFrame(
            list(base.values()), "k string, amount long"
        )

    mm = IncrementalMinMax(
        spark, str(tmp_path / "mm"), ["k"], "amount", base_rows
    )

    def step(rows, expect):
        # rows: (pk, before, after); keep the logical table in sync
        # (base_rows serves the POST-batch state, the compacted table)
        for pk, before, after in rows:
            if after is not None:
                base[pk] = after
            elif pk in base:
                del base[pk]
        mm.apply_batch(
            _batch(spark, [(i, b, a) for i, (_, b, a) in enumerate(rows)])
        )
        got = {
            r["k"]: (r["agg_min"], r["agg_max"]) for r in mm.read().collect()
        }
        assert got == expect, got

    # inserts only — never reads the base table
    step(
        [("a1", None, ("a", 5)), ("a2", None, ("a", 9)),
         ("b1", None, ("b", 3))],
        {"a": (5, 9), "b": (3, 3)},
    )
    step([("a3", None, ("a", 11))], {"a": (5, 11), "b": (3, 3)})
    assert calls["n"] == 0 and mm.recomputes == 0

    # delete a NON-extremal row (a=9): still no base read
    step([("a2", ("a", 9), None)], {"a": (5, 11), "b": (3, 3)})
    assert calls["n"] == 0 and mm.recomputes == 0

    # delete the max (a=11): dirty -> recompute THAT group only
    step([("a3", ("a", 11), None)], {"a": (5, 5), "b": (3, 3)})
    assert calls["n"] == 1 and mm.recomputes == 1

    # update through both extrema of b (3 -> 7): dirty -> recompute
    step([("b1", ("b", 3), ("b", 7))], {"a": (5, 5), "b": (7, 7)})
    assert calls["n"] == 2 and mm.recomputes == 2

    # replayed epoch is skipped (manifest shared with IncrementalAgg)
    env = _batch(spark, [(99, None, ("a", 100))])
    assert mm.apply_batch(env, 77) > 0
    assert mm.apply_batch(env, 77) == 0
    got = {r["k"]: r["agg_max"] for r in mm.read().collect()}
    assert got["a"] == 100


def test_minmax_bootstrap_with_before_images(spark, tmp_path):
    """A FIRST batch that already carries before-images (in-batch
    insert+delete / update chains) must not fold retracted rows into
    the bootstrap extrema: removal-touched groups recompute from the
    base table, exactly like the steady-state dirty-group rule."""
    from pgsink_spark.sinks.incremental_agg import IncrementalMinMax

    base: dict = {}

    def base_rows():
        return spark.createDataFrame(
            list(base.values()) or [], "k string, amount long"
        )

    mm = IncrementalMinMax(
        spark, str(tmp_path / "mm_boot"), ["k"], "amount", base_rows
    )

    # one batch, no prior state:
    #   a: insert 5, insert 9, then delete the 9  -> true extrema (5, 5)
    #   b: insert 3, update 3 -> 7                -> true extrema (7, 7)
    #   c: insert 2, delete 2 (group vanishes)    -> absent
    #   d: plain insert, no removals              -> (4, 4), no recompute
    base.update({"a1": ("a", 5), "b1": ("b", 7), "d1": ("d", 4)})
    mm.apply_batch(
        _batch(
            spark,
            [
                (1, None, ("a", 5)),
                (2, None, ("a", 9)),
                (3, ("a", 9), None),
                (4, None, ("b", 3)),
                (5, ("b", 3), ("b", 7)),
                (6, None, ("c", 2)),
                (7, ("c", 2), None),
                (8, None, ("d", 4)),
            ],
        )
    )
    got = {r["k"]: (r["agg_min"], r["agg_max"]) for r in mm.read().collect()}
    assert got == {"a": (5, 5), "b": (7, 7), "d": (4, 4)}
    assert mm.recomputes == 3  # a, b, c — d stayed on the no-read path


def test_apply_batches_matches_sequential_apply_batch(spark, tmp_path):
    """apply_batches (concurrent delta jobs, sequential merges) must
    leave state identical to the same history replayed one
    apply_batch at a time — including an empty middle batch and a
    final update/delete batch that prunes a group."""
    history = [
        [(10, None, ("a", 5)), (11, None, ("a", 7)), (12, None, ("b", 10))],
        [],
        [
            (20, ("a", 5), ("a", 9)),       # in-group update
            (21, ("b", 10), None),          # delete prunes group b
            (22, None, ("c", 3)),           # new group
        ],
    ]
    seq = IncrementalAgg(spark, str(tmp_path / "seq"), ["k"], "amount")
    for rows in history:
        seq.apply_batch(_batch(spark, rows))
    par = IncrementalAgg(spark, str(tmp_path / "par"), ["k"], "amount")
    touched = par.apply_batches([_batch(spark, rows) for rows in history])
    assert _state(par) == _state(seq) == {"a": (16, 2, 8.0), "c": (3, 1, 3.0)}
    # the empty batch reports zero touched groups and publishes no epoch
    assert touched[1] == 0
