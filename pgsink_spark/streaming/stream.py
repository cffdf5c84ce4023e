"""Structured Streaming glue: envelope streams, sink writing, windows.

The reference's pipeline topology (receive → decode → sequence →
marshal → route → flush → ack, SURVEY §3.1) collapses in Spark to:
a source producing envelope micro-batches → ``writeStream.foreachBatch``
(route + append via a sink) → checkpoint commit = confirmed-LSN ack.

Also here: the streaming analytics surface the north star adds on the
``events`` stream — tumbling/sliding/session windows with watermarks and
stateful dedup — all built-ins, declared with watermarks so state stays
bounded at 100 TB (SURVEY §2.F).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pgsink_spark.changelog.envelope import envelope_schema
from pgsink_spark.streaming.marshal import Modification


def modifications_to_rows(mods: list[Modification]) -> list[tuple]:
    """Modification records → envelope rows (typed payload dicts)."""
    return [
        (m.timestamp, m.namespace, m.name, m.lsn, m.sequence, m.before, m.after)
        for m in mods
    ]


def modifications_df(
    spark: SparkSession, mods: list[Modification], payload: T.StructType
) -> DataFrame:
    """Build a typed envelope DataFrame from marshaled modifications."""
    return spark.createDataFrame(
        modifications_to_rows(mods), envelope_schema(payload)
    )


def envelope_file_stream(
    spark: SparkSession, path: str, payload: T.StructType
) -> DataFrame:
    """File-based envelope stream (micro-batch source over a directory).

    This is the bridge shape: any producer (the pgoutput subscription,
    an import worker) appends envelope parquet files; Spark streams them
    with exactly-once file tracking in the checkpoint.
    """
    return spark.readStream.schema(envelope_schema(payload)).parquet(path)


def run_to_sink(
    stream: DataFrame,
    insert: Callable[[DataFrame, int], None],
    checkpoint: str,
    available_now: bool = True,
):
    """foreachBatch writer: per-micro-batch sink insert + checkpoint ack.

    ``insert(batch_df, batch_id)`` is the sink callback (at-least-once:
    a batch may be retried; sinks stay append-only and compaction views
    restore read-time correctness — the reference's exact contract).
    """
    writer = (
        stream.writeStream.foreachBatch(insert)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    if available_now:
        q.awaitTermination()
    return q


# -- streaming analytics over `events` (north-star §2.F) ----------------

def tumbling_window_agg(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling-window counts/sums with a watermark bounding state."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("value").alias("sum_value"),
        )
        .select("w.start", "w.end", "event_type", "cnt", "sum_value")
    )


def sliding_window_agg(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select("w.start", "w.end", "event_type", "cnt")
    )


def session_window_agg(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Session windows per user: gap-based, watermark-bounded state."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select("w.start", "w.end", "user_id", "cnt")
    )


def stream_dedup(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Stateful dedup on event_id within the watermark horizon."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    watermark: str = "10 minutes",
    horizon: str = "15 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream interval join: for every left event, the right
    events by the same user in ``(l.ts, l.ts + horizon]`` — the
    "what happened next" correlation (click→purchase, error→retry).

    Both sides carry watermarks and the join predicate bounds the time
    range in BOTH directions, which is what lets Spark expire join
    state: a buffered left row can be dropped once the right watermark
    passes ``l.ts + horizon``, and vice versa — state stays
    O(rate × horizon) regardless of stream length. Equality on
    ``user_id`` makes it a shuffled hash join on a high-cardinality
    key, so it scales out like any keyed join. ``how='leftOuter'``
    emits unmatched left rows after the horizon expires (supported by
    Spark for watermarked interval joins).
    """
    l = left.withWatermark("ts", watermark).alias("l")
    r = right.withWatermark("ts", watermark).alias("r")
    cond = (
        (F.col("l.user_id") == F.col("r.user_id"))
        & (F.col("l.event_id") != F.col("r.event_id"))
        & (F.col("r.ts") > F.col("l.ts"))
        & (F.col("r.ts") <= F.col("l.ts") + F.expr(f"interval {horizon}"))
    )
    return l.join(r, cond, how).select(
        F.col("l.user_id").alias("user_id"),
        F.col("l.event_id").alias("event_id"),
        F.col("l.event_type").alias("event_type"),
        F.col("l.ts").alias("ts"),
        F.col("r.event_id").alias("next_event_id"),
        F.col("r.event_type").alias("next_event_type"),
        F.col("r.ts").alias("next_ts"),
    )
