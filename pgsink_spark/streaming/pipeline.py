"""The assembled CDC pipeline: wire → decode → batch → sink → ack.

This is SURVEY §3.1's end-to-end flow as one function: a Subscription
(decode/sequence/marshal/offset-filter) drives micro-batches into a
sink, confirming the max flushed LSN after each batch lands — the
reference's flush-then-ack contract (pkg/sinks/generic/sink.go:160-194 →
stream.Confirm). A crash between flush and confirm replays the batch;
the sink's append-only + compaction-view contract absorbs it.
"""

from __future__ import annotations

from collections.abc import Iterable
from dataclasses import dataclass

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from pgsink_spark.sinks.generic import EMPTY_RESULT, InsertResult
from pgsink_spark.streaming.marshal import Modification
from pgsink_spark.streaming.stream import modifications_df
from pgsink_spark.streaming.subscription import Subscription


@dataclass
class PipelineReport:
    batches: int
    result: InsertResult


def run_replay_pipeline(
    spark: SparkSession,
    sub: Subscription,
    wire: Iterable[bytes],
    insert,  # (env_df, namespace, name) -> InsertResult
    payloads: dict[tuple[str, str], T.StructType],
    batch_size: int = 5000,
    confirm_each_batch: bool = True,
) -> PipelineReport:
    """Consume a wire stream to completion in bounded micro-batches.

    Batches are per-table (typed envelopes); LSN confirmation happens
    only after the batch's insert returns. ``payloads`` maps
    (namespace, name) → payload StructType (from the schema registry).
    """
    total = EMPTY_RESULT
    batches = 0
    buf: dict[tuple[str, str], list[Modification]] = {}

    def flush(key: tuple[str, str]) -> InsertResult:
        nonlocal batches
        mods = buf.pop(key, [])
        if not mods:
            return EMPTY_RESULT
        env = modifications_df(spark, mods, payloads[key])
        res = insert(env, key[0], key[1])
        batches += 1
        return res

    def flush_all() -> InsertResult:
        """Router-wide flush barrier: the ack LSN must cover every
        route's buffered work, never just one table's (the reference
        folds ALL pending InsertResults before confirming,
        pkg/sinks/generic/sink.go:179-194)."""
        res = EMPTY_RESULT
        for key in sorted(buf):
            res = res.fold(flush(key))
        return res

    # Highest LSN whose transaction is fully delivered: a transaction's
    # mods share its commit LSN and arrive contiguously, so seeing a
    # higher LSN proves every earlier one is complete.
    last_complete_lsn: int | None = None
    prev_lsn: int | None = None

    for mod in sub.stream(wire):
        if prev_lsn is not None and mod.lsn > prev_lsn:
            last_complete_lsn = prev_lsn
        prev_lsn = mod.lsn
        key = (mod.namespace, mod.name)
        # envelope timestamps are naive UTC (TimestampType in UTC session)
        if mod.timestamp.tzinfo is not None:
            object.__setattr__(
                mod, "timestamp", mod.timestamp.replace(tzinfo=None)
            )
        buf.setdefault(key, []).append(mod)
        if len(buf[key]) >= batch_size:
            res = flush_all()
            total = total.fold(res)
            # A batch boundary can split a transaction (same commit LSN
            # continuing after the cut); confirming the cut LSN would
            # skip that transaction's tail on replay. Ack only the last
            # LSN proven complete.
            if confirm_each_batch and last_complete_lsn is not None:
                sub.confirm(last_complete_lsn)

    res = flush_all()
    total = total.fold(res)
    if total.max_lsn is not None:
        sub.confirm(total.max_lsn)
    return PipelineReport(batches, total)
