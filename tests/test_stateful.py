"""Custom stateful operator (applyInPandasWithState) under availableNow."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pgsink_spark.sources.fixtures import load_table
from pgsink_spark.streaming.stateful import SESSION_GAP_S, session_tracker


def test_session_tracker_closed_sessions_match_batch(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    src = str(tmp_path / "events_stream")
    events.write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)

    captured = []

    def capture(batch, _bid):
        captured.extend(batch.collect())

    q = (
        session_tracker(stream.select("user_id", "ts"))
        .writeStream.foreachBatch(capture)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # batch truth: sessions per user via lag+cumsum; closed sessions are
    # all but each user's last (the tracker holds the open one in state)
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts")
    batch_sessions = (
        events.select("user_id", "ts")
        .withColumn(
            "is_new",
            (
                F.coalesce(
                    F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w)),
                    F.lit(SESSION_GAP_S + 1),
                )
                > SESSION_GAP_S
            ).cast("int"),
        )
        .withColumn(
            "session_no",
            F.sum("is_new").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
        )
        .groupBy("user_id", "session_no")
        .agg(F.count(F.lit(1)).alias("n"), F.max("ts").alias("end"))
    )
    last_per_user = batch_sessions.groupBy("user_id").agg(
        F.max("session_no").alias("last_no")
    )
    closed_expected = (
        batch_sessions.join(last_per_user, "user_id")
        .where(F.col("session_no") < F.col("last_no"))
        .count()
    )

    got_closed = [r for r in captured if r["closed"]]
    assert len(got_closed) == closed_expected
    assert all(r["n_events"] >= 1 for r in got_closed)
    # spot-check one user's closed-session count against batch truth
    if got_closed:
        uid = got_closed[0]["user_id"]
        batch_u = (
            batch_sessions.join(last_per_user, "user_id")
            .where((F.col("user_id") == uid) & (F.col("session_no") < F.col("last_no")))
            .count()
        )
        assert sum(1 for r in got_closed if r["user_id"] == uid) == batch_u


def test_anomaly_detector_flags_spike_not_baseline(spark, tmp_path):
    """A flat series with one spike: only the spike is emitted, and the
    judgment uses the PRE-update baseline (the spike can't hide by
    inflating the variance it is judged against). State carries across
    micro-batches: the spike arrives in batch 2."""
    import datetime

    from pgsink_spark.streaming.stateful import anomaly_detector

    base = datetime.datetime(2024, 1, 1)
    flat1 = [(1, base + datetime.timedelta(seconds=i), 10.0 + 0.1 * (i % 3))
             for i in range(10)]
    batch2 = [(1, base + datetime.timedelta(seconds=20), 10.1),
              (1, base + datetime.timedelta(seconds=21), 100.0),  # spike
              (1, base + datetime.timedelta(seconds=22), 10.2)]

    src = str(tmp_path / "in")
    schema = "user_id long, ts timestamp, value double"
    out = str(tmp_path / "out")

    def run_stream():
        q = (
            spark.readStream.schema(schema)
            .parquet(src)
            .transform(anomaly_detector)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # batch 1 lands, stream drains it; batch 2 files arrive later and
    # the second availableNow run picks up only the new files
    spark.createDataFrame(flat1, schema).write.mode("append").parquet(src)
    run_stream()
    spark.createDataFrame(batch2, schema).write.mode("append").parquet(src)
    run_stream()

    got = spark.read.parquet(out).collect()
    assert len(got) == 1
    row = got[0]
    assert row["value"] == 100.0 and abs(row["zscore"]) >= 3.0
    assert abs(row["ewma"] - 10.0) < 1.0  # judged against the flat baseline


def test_stream_attribution_equals_batch_twin(spark, sf_dir):
    """attribution_tracker (one timestamp of keyed state) must equal
    d71_attribution (running window MAX) row-for-row — flags AND lags."""
    from pgsink_spark.operators.relational import QUERIES
    from pgsink_spark.operators.streaming_q import stream_attribution

    batch = [
        (r["event_id"], r["user_id"], r["attributed"], r["lag_s"])
        for r in QUERIES["d71_attribution"](spark, sf_dir).collect()
    ]
    stream = [
        (r["event_id"], r["user_id"], r["attributed"], r["lag_s"])
        for r in stream_attribution(spark, sf_dir).collect()
    ]
    assert stream == batch


def test_stream_rolling_zscore_equals_batch_twin(spark, sf_dir):
    """rolling_zscore_detector (ring-buffer state) must equal
    d69_rolling_zscore (trailing window frame) row-for-row."""
    from pgsink_spark.operators.relational import QUERIES
    from pgsink_spark.operators.streaming_q import stream_rolling_zscore

    batch = [
        (r["event_id"], r["user_id"], r["z"])
        for r in QUERIES["d69_rolling_zscore"](spark, sf_dir).collect()
    ]
    stream = [
        (r["event_id"], r["user_id"], r["z"])
        for r in stream_rolling_zscore(spark, sf_dir).collect()
    ]
    assert stream == batch


def test_stream_cusum_equals_batch_twin(spark, sf_dir):
    """cusum_detector (one scalar of keyed state) must equal
    d74_cusum_changepoints (applyInPandas batch fold) row-for-row."""
    from pgsink_spark.operators.relational import QUERIES
    from pgsink_spark.operators.streaming_q import stream_cusum

    batch = [
        (r["user_id"], r["event_id"], r["s"])
        for r in QUERIES["d74_cusum_changepoints"](spark, sf_dir).collect()
    ]
    stream = [
        (r["user_id"], r["event_id"], r["s"])
        for r in stream_cusum(spark, sf_dir).collect()
    ]
    assert stream == batch


def test_stream_scd2_equals_batch_history(spark, sf_dir):
    """scd2_tracker's closed versions must equal the batch
    a19_scd2_history filtered to valid_to IS NOT NULL, row-for-row."""
    from pgsink_spark.operators.relational import QUERIES
    from pgsink_spark.operators.streaming_q import stream_scd2

    cols = ["user_id", "event_type", "event_id", "value", "valid_from", "valid_to"]
    batch_df = QUERIES["a19_scd2_history"](spark, sf_dir).where(
        F.col("valid_to").isNotNull()
    )
    batch = [tuple(r[c] for c in cols) for r in batch_df.collect()]
    stream = [tuple(r[c] for c in cols) for r in stream_scd2(spark, sf_dir).collect()]
    assert stream == batch


@pytest.mark.slow
def test_scd2_tracker_carries_open_version_across_batches(spark, tmp_path):
    """The open version must survive a micro-batch boundary: an event in
    batch 2 closes a version opened in batch 1 (interval spans batches)."""
    import datetime

    import pandas as pd

    from pgsink_spark.streaming.stateful import scd2_tracker

    src = tmp_path / "src"
    src.mkdir()
    schema = (
        "event_id bigint, user_id bigint, event_type string,"
        " ts timestamp, value double"
    )
    t1 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    t2 = datetime.datetime(2024, 1, 1, 1, 0, 0)
    b1 = spark.createDataFrame([(1, 7, "login", t1, 1.0)], schema)
    b2 = spark.createDataFrame([(2, 7, "login", t2, 2.0)], schema)
    b1.write.parquet(str(src / "b1"))

    captured = []

    def capture(batch, _bid):
        captured.extend(batch.collect())

    def run_once():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src) + "/*")
        )
        q = (
            scd2_tracker(stream)
            .writeStream.foreachBatch(capture)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()          # batch 1: opens version (event 1), emits nothing
    assert captured == []
    b2.write.parquet(str(src / "b2"))
    run_once()          # batch 2: event 2 closes event 1's version
    assert len(captured) == 1
    row = captured[0]
    assert (row["event_id"], row["value"]) == (1, 1.0)
    assert row["valid_from"] == pd.Timestamp("2024-01-01 00:00:00")
    assert row["valid_to"] == pd.Timestamp("2024-01-01 01:00:00")


@pytest.mark.slow
def test_reservoir_evictions_across_batches(spark, tmp_path):
    """A doc inside the frontier after batch 1 must be emitted later if
    batch 2 displaces it, and the union of emissions across batches
    must equal the batch-mode rejects of the full data."""
    import hashlib as hl

    from pgsink_spark.streaming.stateful import RESERVOIR_K, reservoir_evictions

    src = tmp_path / "src"
    src.mkdir()
    schema = "source string, doc_id bigint"
    # 60 docs in batch 1 (10 rejects), then 40 more in batch 2
    b1 = spark.createDataFrame([("s", i) for i in range(60)], schema)
    b2 = spark.createDataFrame([("s", i) for i in range(60, 100)], schema)
    b1.write.parquet(str(src / "b1"))

    captured = []

    def capture(batch, _bid):
        captured.extend((r["source"], r["doc_id"]) for r in batch.collect())

    def run_once():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src) + "/*")
        )
        q = (
            reservoir_evictions(stream)
            .writeStream.foreachBatch(capture)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    assert len(captured) == 60 - RESERVOIR_K
    b2.write.parquet(str(src / "b2"))
    run_once()
    assert len(captured) == 100 - RESERVOIR_K
    expected = sorted(
        range(100), key=lambda d: (hl.md5(str(d).encode()).hexdigest(), d)
    )[RESERVOIR_K:]
    assert sorted(d for _, d in captured) == sorted(expected)


@pytest.mark.slow
def test_funnel_tracker_cursor_survives_batches(spark, tmp_path):
    """signup in batch 1, view in batch 2, purchase in batch 3 — the
    cursor crosses two micro-batch boundaries and emits exactly once;
    a later second purchase emits nothing (terminal stage)."""
    import datetime

    from pgsink_spark.streaming.stateful import funnel_tracker

    src = tmp_path / "src"
    src.mkdir()
    schema = "event_id bigint, ts timestamp, user_id bigint, event_type string"
    t = lambda m: datetime.datetime(2024, 1, 1, 0, m, 0)  # noqa: E731

    captured = []

    def capture(batch, _bid):
        captured.extend(batch.collect())

    def run_once():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src) + "/*")
        )
        q = (
            funnel_tracker(stream)
            .writeStream.foreachBatch(capture)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    spark.createDataFrame(
        [(1, t(0), 7, "signup"), (2, t(1), 7, "purchase")], schema
    ).coalesce(1).write.parquet(str(src / "b1"))
    run_once()
    assert captured == []  # purchase before view does not complete

    spark.createDataFrame([(3, t(2), 7, "view")], schema).write.parquet(
        str(src / "b2")
    )
    run_once()
    assert captured == []  # still awaiting the purchase

    spark.createDataFrame(
        [(4, t(5), 7, "purchase"), (5, t(6), 7, "purchase")], schema
    ).coalesce(1).write.parquet(str(src / "b3"))  # one file — one batch
    run_once()
    assert len(captured) == 1
    row = captured[0]
    assert (row.signup_id, row.view_id, row.purchase_id) == (1, 3, 4)
    assert row.funnel_s == 300


@pytest.mark.slow
def test_band_prober_running_min_across_batches(spark, tmp_path):
    """A batch-2 doc sharing a band with a batch-1 doc must report the
    batch-1 doc as dup_of — the index state survives the boundary."""
    from pgsink_spark.streaming.stateful import band_neardup_prober

    src = tmp_path / "src"
    src.mkdir()
    schema = "doc_id bigint, ck bigint"

    captured = []

    def capture(batch, _bid):
        captured.extend(batch.collect())

    def run_once():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src) + "/*")
        )
        q = (
            band_neardup_prober(stream)
            .writeStream.foreachBatch(capture)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    spark.createDataFrame([(10, 1), (11, 2)], schema).write.parquet(
        str(src / "b1")
    )
    run_once()
    assert {(r.doc_id, r.dup_of) for r in captured} == {(10, None), (11, None)}

    captured.clear()
    spark.createDataFrame([(12, 1), (5, 2)], schema).write.parquet(
        str(src / "b2")
    )
    run_once()
    # doc 12 hits bucket 1's min (10); doc 5 is SMALLER than bucket 2's
    # min so it reports no dup and becomes the new min
    assert {(r.doc_id, r.dup_of) for r in captured} == {(12, 10), (5, None)}


@pytest.mark.slow
def test_window_topk_state_carries_and_emits_once(spark, tmp_path):
    """Day-1 events split across two micro-batches: the K-slot state
    must carry batch 1's leaders into batch 2, emit the day-1 ranking
    exactly once when day 2 opens, and keep day 2 unemitted (open)."""
    import datetime

    from pgsink_spark.streaming.stateful import window_topk_tracker

    src = tmp_path / "src"
    src.mkdir()
    schema = "event_id bigint, ts timestamp, event_type string, value double"
    d1 = lambda h: datetime.datetime(2024, 1, 1, h, 0, 0)  # noqa: E731

    captured = []

    def capture(batch, _bid):
        captured.extend(batch.collect())

    # batch 1: three day-1 clicks (values 10, 50, 20)
    spark.createDataFrame(
        [(1, d1(1), "click", 10.0), (2, d1(2), "click", 50.0),
         (3, d1(3), "click", 20.0)],
        schema,
    ).coalesce(1).write.parquet(str(src / "b1"))
    # batch 2: a better day-1 click (60) + the day-2 opener
    spark.createDataFrame(
        [(4, d1(4), "click", 60.0),
         (5, datetime.datetime(2024, 1, 2, 1, 0, 0), "click", 5.0)],
        schema,
    ).coalesce(1).write.parquet(str(src / "b2"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.parquet")
        .parquet(str(src))
    )
    q = (
        window_topk_tracker(stream)
        .writeStream.foreachBatch(capture)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    assert len(captured) == 3, captured  # one ranking, exactly once
    got = sorted((r.rank, r.event_id, r.value) for r in captured)
    assert got == [(1, 4, 60.0), (2, 2, 50.0), (3, 3, 20.0)]
    assert all(
        r.window_start == datetime.datetime(2024, 1, 1) for r in captured
    )


@pytest.mark.slow
def test_window_topk_late_row_for_closed_window_is_dropped(
    spark, tmp_path
):
    """Multi-batch OUT-OF-ORDER delivery: once a window's ranking is
    emitted (closed by a later window's first event), a late row for
    that window — even one that would have won rank 1 — is DROPPED,
    exactly as a watermark would do. This pins the contract boundary
    the single-batch driver harness never exercises: the emitted
    ranking is final; the late arrival neither re-emits nor mutates
    the open-window state."""
    import datetime

    from pgsink_spark.streaming.stateful import window_topk_tracker

    src = tmp_path / "src"
    src.mkdir()
    schema = "event_id bigint, ts timestamp, event_type string, value double"
    d1 = lambda h: datetime.datetime(2024, 1, 1, h, 0, 0)  # noqa: E731
    d2 = lambda h: datetime.datetime(2024, 1, 2, h, 0, 0)  # noqa: E731

    captured = []

    def capture(batch, _bid):
        captured.extend(batch.collect())

    # batch 1: two day-1 clicks, then the day-2 opener closes day 1
    spark.createDataFrame(
        [(1, d1(1), "click", 10.0), (2, d1(2), "click", 50.0),
         (3, d2(1), "click", 5.0)],
        schema,
    ).coalesce(1).write.parquet(str(src / "b1"))
    # batch 2: a LATE day-1 row with the best value (would be rank 1),
    # plus a fresh day-2 row that must land in the open day-2 state
    spark.createDataFrame(
        [(4, d1(3), "click", 99.0), (5, d2(2), "click", 7.0)],
        schema,
    ).coalesce(1).write.parquet(str(src / "b2"))
    # batch 3: day-3 opener closes day 2 so we can see its final state
    spark.createDataFrame(
        [(6, datetime.datetime(2024, 1, 3, 1, 0, 0), "click", 1.0)],
        schema,
    ).coalesce(1).write.parquet(str(src / "b3"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.parquet")
        .parquet(str(src))
    )
    q = (
        window_topk_tracker(stream)
        .writeStream.foreachBatch(capture)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    day1 = sorted(
        (r.rank, r.event_id, r.value)
        for r in captured
        if r.window_start == datetime.datetime(2024, 1, 1)
    )
    day2 = sorted(
        (r.rank, r.event_id, r.value)
        for r in captured
        if r.window_start == datetime.datetime(2024, 1, 2)
    )
    # late event 4 (value 99) is absent everywhere; day-1 ranking is
    # the one emitted at close and only that one
    assert day1 == [(1, 2, 50.0), (2, 1, 10.0)], captured
    assert day2 == [(1, 5, 7.0), (2, 3, 5.0)], captured
    assert not [r for r in captured if r.event_id == 4]


def test_session_window_exact_gap_boundary(spark):
    """Pins Spark's session_window merge rule AT the gap boundary: an
    event arriving exactly gap-after-last EXTENDS the session
    (inclusive merge), so the stream_session_window oracle's new-session
    predicate must be strictly `> 1800000000` micros, never `>=`.
    Guards the latent oracle/engine divergence flagged in round-5
    ADVICE (streaming_q.py session oracle)."""
    import datetime

    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        # user 1: second event at EXACTLY +30 min → same session
        (1, base),
        (1, base + datetime.timedelta(minutes=30)),
        # user 2: second event at +30 min 1 s → new session
        (2, base),
        (2, base + datetime.timedelta(minutes=30, seconds=1)),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp")
    out = (
        df.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    by_user = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r.cnt)
    assert sorted(by_user[1]) == [2], out   # merged: one 2-row session
    assert sorted(by_user[2]) == [1, 1], out  # split: two sessions

    # and the oracle predicate agrees: strict > keeps user 1 together
    import duckdb
    import pandas as pd

    events_pd = pd.DataFrame(rows, columns=["user_id", "ts"])
    con = duckdb.connect()
    got = con.execute(
        """
        WITH flagged AS (
          SELECT user_id, ts,
                 CASE WHEN LAG(ts) OVER w IS NULL
                      OR epoch_us(ts) - epoch_us(LAG(ts) OVER w)
                         > 1800000000 THEN 1 ELSE 0 END AS is_new
          FROM events_pd WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        )
        SELECT user_id, CAST(SUM(is_new) AS BIGINT) AS sessions
        FROM flagged GROUP BY user_id ORDER BY user_id
        """
    ).fetchall()
    con.close()
    assert got == [(1, 1), (2, 2)], got


def test_hopping_window_replication_and_eviction(spark, sf_dir):
    """stream_hopping_window: every emitted (window, type) group
    equals the batch recomputation over the two covering windows per
    event; each event contributes to exactly 2 windows (size/slide);
    no emitted window end exceeds the watermark."""
    from collections import defaultdict
    from datetime import timedelta
    from decimal import Decimal

    from pgsink_spark.operators.streaming_q import stream_hopping_window
    from pgsink_spark.sources.fixtures import load_table

    rows = (
        load_table(spark, sf_dir, "events")
        .select("ts", "event_type", "value")
        .collect()
    )
    mx = max(r["ts"] for r in rows).replace(microsecond=0) + timedelta(
        milliseconds=max(r["ts"] for r in rows).microsecond // 1000
    )
    watermark = mx - timedelta(minutes=10)
    agg = defaultdict(lambda: [0, Decimal(0)])
    for r in rows:
        ts = r["ts"]
        grid = ts.replace(
            minute=(ts.minute // 30) * 30, second=0, microsecond=0
        )
        for start in (grid, grid - timedelta(minutes=30)):
            if start + timedelta(hours=1) <= watermark:
                k = (start, r["event_type"])
                agg[k][0] += 1
                agg[k][1] += Decimal(str(r["value"])).quantize(
                    Decimal("0.0001")
                )
    expect = {
        k: (c, float(round(s, 2))) for k, (c, s) in agg.items()
    }
    got = {
        (r["w"], r["event_type"]): (r["cnt"], r["sum_value"])
        for r in stream_hopping_window(spark, sf_dir).collect()
    }
    assert got == expect
    # replication factor: total emitted events across windows is 2x
    # the events fully covered by two emitted windows — cheaper exact
    # invariant: every event counted at most twice
    assert sum(c for c, _ in got.values()) <= 2 * len(rows)


def test_complete_totals_equal_batch_aggregate(spark, sf_dir):
    """stream_complete_totals' snapshot equals the batch aggregate
    exactly (complete mode replaces, never accumulates: a doubled
    count would flag append-style accumulation in the memory sink)."""
    from decimal import Decimal

    from pgsink_spark.operators.streaming_q import stream_complete_totals
    from pgsink_spark.sources.fixtures import load_table

    rows = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "value")
        .collect()
    )
    from collections import defaultdict

    agg = defaultdict(lambda: [0, Decimal(0)])
    for r in rows:
        agg[r["event_type"]][0] += 1
        agg[r["event_type"]][1] += Decimal(str(r["value"])).quantize(
            Decimal("0.0001")
        )
    expect = {
        k: (c, float(round(s, 2))) for k, (c, s) in agg.items()
    }
    got = {
        r["event_type"]: (r["cnt"], r["sum_value"])
        for r in stream_complete_totals(spark, sf_dir).collect()
    }
    assert got == expect
