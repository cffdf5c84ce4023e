"""Streaming-plane observability: per-micro-batch progress metrics.

Reference parity: the reference exports Prometheus counters/histograms
for everything that moves (pkg/sinks/generic/instrumented_inserter.go,
pkg/imports/importer.go:57-81) and logs subscription progress. The
batch plane mirrors that in sinks/instrumented.py; this module is the
STREAMING half — Structured Streaming already computes per-batch
progress (input rows, batch duration, state-store stats), so the
idiomatic move is to harvest it with a ``StreamingQueryListener``
instead of re-measuring anything.

``StreamMetrics.attach(spark)`` registers the listener once; every
micro-batch of every query in the session lands in the same histogram
shapes the batch plane uses (duration buckets 0.125→512 s, size
buckets 1→65536 rows), so the two planes export one format.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql.streaming import StreamingQueryListener

from pgsink_spark.sinks.instrumented import (
    DURATION_BUCKETS,
    SIZE_BUCKETS,
    Histogram,
)


@dataclass
class QueryStats:
    batches: int = 0
    rows: int = 0
    batch_duration: Histogram = field(
        default_factory=lambda: Histogram(DURATION_BUCKETS)
    )
    batch_rows: Histogram = field(
        default_factory=lambda: Histogram(SIZE_BUCKETS)
    )


class StreamMetrics(StreamingQueryListener):
    """Session-wide micro-batch metrics, keyed by query name (or id
    when unnamed)."""

    def __init__(self):
        self.stats: dict[str, QueryStats] = {}

    # -- listener hooks -------------------------------------------------

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802 (Spark API)
        p = event.progress
        key = p.name or p.id
        st = self.stats.setdefault(str(key), QueryStats())
        st.batches += 1
        st.rows += p.numInputRows
        st.batch_rows.observe(float(p.numInputRows))
        dur_ms = (p.durationMs or {}).get("triggerExecution")
        if dur_ms is not None:
            st.batch_duration.observe(dur_ms / 1000.0)

    def onQueryIdle(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    # -- lifecycle ------------------------------------------------------

    def attach(self, spark) -> "StreamMetrics":
        spark.streams.addListener(self)
        return self

    def detach(self, spark) -> None:
        spark.streams.removeListener(self)
