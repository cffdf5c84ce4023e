"""M1: keyset scans, job queue claim/backoff, importer resumability.

Mirrors the reference's import tests: batch/cursor behavior
(pkg/imports/importer_test.go), worker claim + exponential backoff
(worker_test.go), manager reconcile, against an in-memory sink capture.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pgsink_spark.imports import (
    ImportJobStore,
    Importer,
    keyset_batch,
    partitioned_snapshot,
)
from pgsink_spark.sinks.generic import batch_result


@pytest.fixture()
def store(tmp_path):
    return ImportJobStore(str(tmp_path / "jobs.json"), retry_interval_s=5.0)


def test_keyset_batch_pagination(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    total = orders.count()
    seen = 0
    cursor = None
    last_max = None
    for _ in range(10_000):
        batch, cursor, done = keyset_batch(orders, "o_orderkey", cursor, 1000)
        if cursor is None:
            break
        keys = [r["o_orderkey"] for r in batch.select("o_orderkey").collect()]
        assert keys == sorted(keys)
        if last_max is not None:
            assert min(keys) > last_max  # strictly beyond the cursor
        last_max = max(keys)
        seen += len(keys)
        if done:
            break
    assert seen == total


def test_keyset_batch_pushes_filter_down(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    batch, _, _ = keyset_batch(orders, "o_orderkey", 500, 100, materialize=False)
    plan = batch._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThan(o_orderkey,500)" in plan


def test_partitioned_snapshot_ranges(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    parts = partitioned_snapshot(orders, "o_orderkey", 8)
    # contiguous pk ranges per partition: max of part i < min of part i+1
    bounds = (
        parts.select("o_orderkey", F.spark_partition_id().alias("p"))
        .groupBy("p")
        .agg(F.min("o_orderkey").alias("lo"), F.max("o_orderkey").alias("hi"))
        .orderBy("p")
        .collect()
    )
    assert parts.count() == orders.count()
    for a, b in zip(bounds, bounds[1:]):
        assert a["hi"] < b["lo"]


def test_job_claim_order_and_backoff(store):
    j1 = store.enqueue("sub", "public", "t1")
    j2 = store.enqueue("sub", "public", "t2")
    store.record_error(j1.id, "boom")

    # never-errored job claims first, errored one is backing off
    c = store.claim(now=0)
    assert c is not None and c.id == j2.id
    # j2 claimed → nothing else claimable while backoff holds
    assert store.claim(now=0) is None
    # after the backoff deadline (5 * 3^1 = 15s), the errored job returns
    now = store.get(j1.id).last_error_at + store.backoff_s(1) + 0.1
    c2 = store.claim(now=now)
    assert c2 is not None and c2.id == j1.id
    assert store.backoff_s(0) == 5.0
    assert store.backoff_s(3) == 135.0
    assert store.backoff_s(100) == 3600.0  # capped


def test_job_complete_expire_persistence(store, tmp_path):
    j = store.enqueue("sub", "public", "t")
    store.update_progress(j.id, "123", 1000)
    store.complete(j.id)
    j2 = store.enqueue("sub", "public", "u")
    assert store.expire("public", "u") == 1
    # reload from disk: same state
    reloaded = ImportJobStore(str(tmp_path / "jobs.json"))
    assert reloaded.get(j.id).rows_processed_total == 1000
    assert reloaded.get(j.id).completed_at is not None
    assert reloaded.get(j2.id).expired_at is not None
    assert reloaded.claim() is None


class _CaptureSink:
    def __init__(self):
        self.batches = []

    def insert(self, env, namespace, name):
        res = batch_result(env)
        self.batches.append((namespace, name, res.count))
        return res


def test_importer_end_to_end(spark, sf_dir, store):
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    sink = _CaptureSink()
    job = store.enqueue("sub", "public", "nation")
    imp = Importer(store, sink.insert, batch_limit=10)
    res = imp.run(store.claim(), nation, "n_nationkey")
    assert res.done and res.rows == nation.count()
    assert store.get(job.id).completed_at is not None
    assert store.get(job.id).rows_processed_total == nation.count()
    assert all(n <= 10 for _, _, n in sink.batches)


def test_importer_resumes_from_cursor(spark, sf_dir, store):
    """Stop after 2 batches (snapshot-timeout analogue), resume, finish."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").limit(95).cache()
    total = orders.count()
    sink = _CaptureSink()
    store.enqueue("sub", "public", "orders")
    imp = Importer(store, sink.insert, batch_limit=20)

    job = store.claim()
    r1 = imp.run(job, orders, "o_orderkey", max_batches=2)
    assert not r1.done and r1.rows == 40
    j = store.get(job.id)
    assert j.cursor is not None and j.completed_at is None

    # resume: claim again, continue strictly after the cursor
    job2 = store.claim()
    assert job2 is not None and job2.id == job.id
    r2 = imp.run(job2, orders, "o_orderkey")
    assert r2.done
    assert r1.rows + r2.rows == total
    assert store.get(job.id).rows_processed_total == total


def test_importer_records_error(spark, sf_dir, store):
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")

    def boom(env, namespace, name):
        raise RuntimeError("sink unavailable")

    job = store.enqueue("sub", "public", "nation")
    imp = Importer(store, boom, batch_limit=10)
    res = imp.run(store.claim(), nation, "n_nationkey")
    assert not res.done
    j = store.get(job.id)
    assert j.error_count == 1 and "sink unavailable" in j.error
    # job not claimable until backoff passes
    assert store.claim(now=j.last_error_at + 1) is None


def test_importer_with_instrumented_insert(spark, sf_dir, store):
    """A13 composition on the import path: importer → instrumented →
    capture sink; per-batch durations and row totals are recorded
    (reference importer histograms, pkg/imports/importer.go:57-81)."""
    from pgsink_spark.sinks import InstrumentedInserter

    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    sink = _CaptureSink()
    ins = InstrumentedInserter(sink.insert)
    store.enqueue("sub", "public", "nation")
    imp = Importer(store, ins, batch_limit=10)
    res = imp.run(store.claim(), nation, "n_nationkey")
    assert res.done
    m = ins.metrics
    assert m.rows_total["public.nation"] == nation.count()
    assert m.batches_total["public.nation"] == len(sink.batches)
    assert m.insert_duration["public.nation"].n == len(sink.batches)


def test_two_drivers_never_double_claim(tmp_path):
    import time

    """Multi-driver SKIP LOCKED semantics (reference
    pkg/imports/worker.go:165-187): two stores over ONE queue path —
    distinct owners, like two driver processes — claim concurrently;
    no job is handed out twice, every claimable job is handed out
    exactly once, and never-errored-first ordering holds per claimer."""
    path = str(tmp_path / "jobs.json")
    a = ImportJobStore(path, owner="driver-a")
    for i in range(10):
        a.enqueue("sub", "public", f"t{i}")
    # one errored job: must sort after the fresh ones for both claimers
    a.record_error(1, "boom")
    b = ImportJobStore(path, owner="driver-b")

    now = time.time() + 10_000  # past any backoff
    seen_a, seen_b = [], []
    while True:
        ja = a.claim(now=now)
        jb = b.claim(now=now)
        if ja is None and jb is None:
            break
        if ja is not None:
            seen_a.append(ja.id)
        if jb is not None:
            seen_b.append(jb.id)
    assert not (set(seen_a) & set(seen_b)), "double-claim across drivers"
    assert sorted(seen_a + seen_b) == list(range(1, 11))
    # backoff ordering: the errored job is the LAST claim overall
    all_claims = []
    for i in range(max(len(seen_a), len(seen_b))):
        if i < len(seen_a):
            all_claims.append(seen_a[i])
        if i < len(seen_b):
            all_claims.append(seen_b[i])
    assert all_claims[-1] == 1


def test_two_drivers_threaded_claims_are_disjoint(tmp_path):
    """Thread-level race: two claimers hammer one queue concurrently;
    the lease's O_EXCL arbitration keeps the claim sets disjoint."""
    import threading

    path = str(tmp_path / "jobs.json")
    seed = ImportJobStore(path, owner="seed")
    for i in range(40):
        seed.enqueue("sub", "public", f"t{i}")

    results: dict[str, list[int]] = {"a": [], "b": []}

    def worker(key: str):
        store = ImportJobStore(path, owner=f"driver-{key}")
        while (j := store.claim()) is not None:
            results[key].append(j.id)

    ta = threading.Thread(target=worker, args=("a",))
    tb = threading.Thread(target=worker, args=("b",))
    ta.start(); tb.start(); ta.join(); tb.join()
    assert not (set(results["a"]) & set(results["b"]))
    assert sorted(results["a"] + results["b"]) == list(range(1, 41))


def test_stale_lease_is_stolen_after_ttl(tmp_path):
    import time

    """A crashed claimant's lease (never released) is taken over once
    it ages past lease_ttl_s — and not a moment before."""
    path = str(tmp_path / "jobs.json")
    crashed = ImportJobStore(path, owner="crashed", lease_ttl_s=3600)
    crashed.enqueue("sub", "public", "t")
    now = time.time()
    assert crashed.claim(now=now) is not None
    # simulated crash: no release. A fresh driver can't take the lease
    successor = ImportJobStore(path, owner="successor", lease_ttl_s=3600)
    assert successor.claim(now=now + 10) is None
    # ...until the ttl passes
    assert successor.claim(now=now + 3601).id == 1
