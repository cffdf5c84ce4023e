"""Incremental join-view maintenance (sinks/incremental_join.py):
after every batch the maintained view equals the from-scratch inner
join of the two tables' current states — through inserts, updates,
deletes, FK repointing, delta×delta interaction, and one-sided
batches."""

from __future__ import annotations

import pytest
import datetime

from pyspark.sql import types as T

from pgsink_spark.changelog.envelope import envelope_schema
from pgsink_spark.sinks.incremental_join import IncrementalJoinView

ORDERS = T.StructType(
    [
        T.StructField("order_id", T.LongType(), True),
        T.StructField("cust_id", T.LongType(), True),
        T.StructField("total", T.LongType(), True),
    ]
)
CUSTOMERS = T.StructType(
    [
        T.StructField("cust_id", T.LongType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("total", T.LongType(), True),  # name-collision column
    ]
)


def _batch(spark, schema, rows):
    data = [
        (datetime.datetime(2024, 1, 1), "public", "t", lsn, 0, before, after)
        for lsn, before, after in rows
    ]
    return spark.createDataFrame(data, envelope_schema(schema))


def _apply_table(state: dict, rows):
    for _, before, after in rows:
        if before is not None:
            del state[before[0]]
        if after is not None:
            state[after[0]] = after
    return state


def _expected(orders: dict, custs: dict):
    out = set()
    for (oid, cid, tot) in orders.values():
        if cid in custs:
            _, name, ctot = custs[cid]
            out.add((oid, cid, tot, name, ctot))
    return out


def _got(view):
    return {
        (r.order_id, r.cust_id, r.total, r.name, r.b_total)
        for r in view.read().collect()
    }


@pytest.mark.slow
def test_view_tracks_recompute(spark, tmp_path):
    view = IncrementalJoinView(
        spark, str(tmp_path / "ivm"), ORDERS, CUSTOMERS, "cust_id"
    )
    orders: dict = {}
    custs: dict = {}

    def step(order_rows, cust_rows):
        ea = _batch(spark, ORDERS, order_rows) if order_rows else None
        eb = _batch(spark, CUSTOMERS, cust_rows) if cust_rows else None
        view.apply_batch(ea, eb)
        _apply_table(orders, order_rows or [])
        _apply_table(custs, cust_rows or [])
        assert _got(view) == _expected(orders, custs)

    # 1: initial inserts on both sides (exercises ΔA⋈ΔB — customer and
    # its orders arrive in the same batch)
    step(
        [
            (10, None, (1, 100, 50)),
            (11, None, (2, 100, 70)),
            (12, None, (3, 200, 10)),
            (13, None, (4, 999, 5)),  # dangling FK — no match
        ],
        [
            (10, None, (100, "ada", 1)),
            (11, None, (200, "bob", 2)),
        ],
    )

    # 2: order-only batch (one-sided): new order + value update + delete
    step(
        [
            (20, None, (5, 200, 99)),
            (21, (1, 100, 50), (1, 100, 55)),
            (22, (3, 200, 10), None),
        ],
        None,
    )

    # 3: customer-only batch: rename (update through the join), plus
    # the late parent for the dangling order
    step(
        None,
        [
            (30, (100, "ada", 1), (100, "ada lovelace", 1)),
            (31, None, (999, "zoe", 9)),
        ],
    )

    # 4: FK repoint — order 2 moves from customer 100 to 200 — and a
    # customer delete that orphans order 5 in the same batch
    step(
        [(40, (2, 100, 70), (2, 200, 70))],
        [(41, (200, "bob", 2), None)],
    )

    # 5: in-batch chain (insert then update then delete collapses to
    # nothing) + reinsert of the deleted customer
    step(
        [
            (50, None, (6, 999, 1)),
            (51, (6, 999, 1), (6, 999, 2)),
            (52, (6, 999, 2), None),
        ],
        [(53, None, (200, "bob II", 3))],
    )


@pytest.mark.slow
def test_empty_batches_noop(spark, tmp_path):
    view = IncrementalJoinView(
        spark, str(tmp_path / "ivm2"), ORDERS, CUSTOMERS, "cust_id"
    )
    view.apply_batch(
        _batch(spark, ORDERS, [(1, None, (1, 100, 5))]),
        _batch(spark, CUSTOMERS, [(1, None, (100, "a", 1))]),
    )
    before = _got(view)
    assert view.apply_batch(None, None) == 0
    assert _got(view) == before


@pytest.mark.slow
def test_replayed_epoch_is_skipped(spark, tmp_path):
    """foreachBatch is at-least-once: re-delivering a committed epoch
    must not double-apply the Z-set deltas (exactly-once via the
    epoch-versioned manifest)."""
    view = IncrementalJoinView(
        spark, str(tmp_path / "ivm3"), ORDERS, CUSTOMERS, "cust_id"
    )
    ea = _batch(spark, ORDERS, [(1, None, (1, 100, 5))])
    eb = _batch(spark, CUSTOMERS, [(1, None, (100, "a", 1))])
    assert view.apply_batch(ea, eb, 7) > 0
    snap = _got(view)
    # same epoch re-delivered → skipped, state unchanged
    assert view.apply_batch(ea, eb, 7) == 0
    assert _got(view) == snap
    # stale epoch (below the watermark) also skipped
    assert view.apply_batch(ea, eb, 3) == 0
    assert _got(view) == snap
    # a NEW epoch still applies
    assert view.apply_batch(
        _batch(spark, ORDERS, [(2, None, (2, 100, 9))]), None, 8
    ) > 0
    assert len(_got(view)) == 2


@pytest.mark.slow
def test_independent_per_side_streams(spark, tmp_path):
    """The two sides may be fed by two INDEPENDENT streaming queries,
    each with its own batch-id sequence starting at 0. Per-channel
    replay watermarks mean the B-query's epoch 0/1 must not be skipped
    just because the A-query already committed epochs 0/1 — while a
    genuine replay WITHIN a channel still is."""
    view = IncrementalJoinView(
        spark, str(tmp_path / "ivm5"), ORDERS, CUSTOMERS, "cust_id"
    )
    # A-side query: epochs 0, 1
    assert view.apply_batch(
        _batch(spark, ORDERS, [(1, None, (1, 100, 5))]), None, 0
    ) >= 0
    assert view.apply_batch(
        _batch(spark, ORDERS, [(2, None, (2, 200, 9))]), None, 1
    ) >= 0
    # B-side query starts at ITS epoch 0 — must apply, not be skipped
    assert view.apply_batch(
        None, _batch(spark, CUSTOMERS, [(3, None, (100, "a", 1))]), 0
    ) > 0
    assert _got(view) == {(1, 100, 5, "a", 1)}
    eb1 = _batch(spark, CUSTOMERS, [(4, None, (200, "b", 2))])
    assert view.apply_batch(None, eb1, 1) > 0
    assert _got(view) == {(1, 100, 5, "a", 1), (2, 200, 9, "b", 2)}
    # replay within the B channel: skipped, state unchanged
    assert view.apply_batch(None, eb1, 1) == 0
    assert _got(view) == {(1, 100, 5, "a", 1), (2, 200, 9, "b", 2)}
    # A channel continues from its own sequence
    assert view.apply_batch(
        _batch(spark, ORDERS, [(5, (1, 100, 5), None)]), None, 2
    ) > 0
    assert _got(view) == {(2, 200, 9, "b", 2)}


@pytest.mark.slow
def test_state_dirs_are_garbage_collected(spark, tmp_path):
    import os

    root = tmp_path / "ivm4"
    view = IncrementalJoinView(spark, str(root), ORDERS, CUSTOMERS, "cust_id")
    for e in range(3):
        view.apply_batch(
            _batch(spark, ORDERS, [(e, None, (e, 100, e))]),
            _batch(spark, CUSTOMERS, [(e, None, (100, "a", 1))]) if e == 0 else None,
            e,
        )
    dirs = [d for d in os.listdir(root) if os.path.isdir(root / d)]
    # only the current epoch's triple survives
    assert sorted(dirs) == ["a_state_2", "b_state_2", "view_2"]
