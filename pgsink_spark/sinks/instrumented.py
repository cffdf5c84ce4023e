"""Instrumented inserter: insert metrics without a second scan (A13).

Reference parity: the reference wraps every inserter with duration and
batch-size Prometheus histograms (pkg/sinks/generic/instrumented_inserter.go:13-30,
observe at :40-74; buckets 0.125s doubling to 512s) and times import
queries/flushes (pkg/imports/importer.go:57-81).

Spark-first shape: batch facts (row count, max LSN) come from
``DataFrame.observe`` + ``Observation`` — collected *during the write
job itself*, so accounting costs zero extra scans (the un-instrumented
``write_batch`` pays a second aggregation pass). Durations are wall
clock around the write action, same as the reference's timer.
"""

from __future__ import annotations

import time
from bisect import bisect_left
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from pgsink_spark.sinks.generic import InsertResult

# 0.125 → 512 doubling — instrumented_inserter.go:18
DURATION_BUCKETS = tuple(0.125 * 2**i for i in range(13))
# 1 → 65536 doubling — batch-size histogram, instrumented_inserter.go:25
SIZE_BUCKETS = tuple(float(2**i) for i in range(17))


@dataclass
class Histogram:
    """Fixed-bucket cumulative histogram (Prometheus semantics)."""

    buckets: tuple[float, ...]
    counts: list[int] = field(default_factory=list)
    total: float = 0.0
    n: int = 0

    def __post_init__(self):
        if not self.counts:
            self.counts = [0] * (len(self.buckets) + 1)  # +Inf bucket

    def observe(self, v: float) -> None:
        self.counts[bisect_left(self.buckets, v)] += 1
        self.total += v
        self.n += 1

    def cumulative(self) -> list[int]:
        out, acc = [], 0
        for c in self.counts:
            acc += c
            out.append(acc)
        return out


@dataclass
class SinkMetrics:
    """Per-sink metric registry (labels collapse to per-table dicts)."""

    insert_duration: dict[str, Histogram] = field(default_factory=dict)
    batch_size: dict[str, Histogram] = field(default_factory=dict)
    rows_total: dict[str, int] = field(default_factory=dict)
    batches_total: dict[str, int] = field(default_factory=dict)
    last_max_lsn: dict[str, int | None] = field(default_factory=dict)

    def record(
        self, table: str, duration_s: float, result: InsertResult
    ) -> None:
        self.insert_duration.setdefault(
            table, Histogram(DURATION_BUCKETS)
        ).observe(duration_s)
        self.batch_size.setdefault(table, Histogram(SIZE_BUCKETS)).observe(
            float(result.count)
        )
        self.rows_total[table] = self.rows_total.get(table, 0) + result.count
        self.batches_total[table] = self.batches_total.get(table, 0) + 1
        if result.max_lsn is not None:
            prev = self.last_max_lsn.get(table)
            self.last_max_lsn[table] = (
                result.max_lsn if prev is None else max(prev, result.max_lsn)
            )


def observed_write(
    env: DataFrame, writer: Callable[[DataFrame], None]
) -> InsertResult:
    """Write a batch and return (count, max lsn) from the same job.

    The ``Observation`` aggregates ride the write's own execution —
    map-side, no extra action — replacing ``batch_result``'s second
    scan. At 100 TB this halves sink-side read volume.
    """
    obs = Observation()
    observed = env.observe(
        obs, F.count(F.lit(1)).alias("n"), F.max("lsn").alias("max_lsn")
    )
    writer(observed)
    got = obs.get
    return InsertResult(got["n"], got["max_lsn"])


class InstrumentedInserter:
    """Wrap an inserter with duration/batch-size metrics.

    ``inner`` is any ``(env, namespace, name) -> InsertResult`` —
    composition order matches the reference's middleware stack
    (instrumented(buffered(async(concrete)))).
    """

    def __init__(
        self,
        inner: Callable[[DataFrame, str, str], InsertResult],
        metrics: SinkMetrics | None = None,
        clock: Callable[[], float] = time.perf_counter,
    ):
        self.inner = inner
        self.metrics = metrics if metrics is not None else SinkMetrics()
        self._clock = clock

    def __call__(
        self, env: DataFrame, namespace: str, name: str
    ) -> InsertResult:
        t0 = self._clock()
        result = self.inner(env, namespace, name)
        self.metrics.record(
            f"{namespace}.{name}", self._clock() - t0, result
        )
        return result
