"""Sorted shard export: write a frame as N parquet shards that are
globally sorted — each shard internally sorted, shard key-ranges
disjoint, shard file order = global order.

This is the standard layout for outputs consumed sequentially at scale
(training shards streamed in curriculum order, time-ordered archive
exports, merge-join-ready extracts): a reader gets global order by
concatenating shards by id, and a range predicate prunes whole shards
via parquet min/max footers without any index.

Spark-first: ``repartitionByRange`` samples the key distribution
(reservoir sample per partition — one extra lightweight pass) and
builds equi-depth range bounds, so shards are balanced even under
skewed keys; ``sortWithinPartitions`` then sorts each shard without
any global sort materialization. Total cost: ONE range shuffle + a
per-shard sort — the same price as any shuffle write, and each task
spills independently at 100 TB. Equal keys land in one shard, so
ranges never interleave.

Reference parity: pgsink's BigQuery sink relies on the warehouse to
cluster (pkg/sinks/bigquery/schema_builders.go clustering fields);
this is that layout produced engine-side as plain parquet, the export
twin of the Z-order writer (operators/zorder.py) for ONE sort
dimension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_sorted_shards(
    df: DataFrame, path: str, sort_cols: list[str], n_shards: int
) -> None:
    """Write ``df`` as ``n_shards`` globally-sorted parquet shards."""
    (
        df.repartitionByRange(n_shards, *[F.col(c) for c in sort_cols])
        .sortWithinPartitions(*sort_cols)
        .write.mode("overwrite")
        .parquet(path)
    )


class StreamingShardExport:
    """foreachBatch shard appender: each micro-batch lands as
    range-sharded, internally-sorted parquet under its own ``epoch=N``
    partition, exactly-once via the same ledger/dynamic-overwrite
    pattern as the warehouse raw tables.

    The resulting layout is the streaming curriculum shape: shards are
    globally sorted WITHIN an epoch and epochs concatenate in arrival
    order — exactly what a trainer consuming a growing corpus wants
    (new data appends at the end; every epoch's shards still prune by
    parquet min/max). A replayed epoch overwrites only its own
    partition, so at-least-once delivery cannot duplicate shards.
    """

    def __init__(
        self,
        spark,
        path: str,
        sort_cols: list[str],
        shards_per_batch: int = 8,
        stream_id: str = "default",
    ):
        self.spark = spark
        self.path = path
        self.sort_cols = sort_cols
        self.shards_per_batch = shards_per_batch
        # ledger identity (Delta txnAppId pattern): pass the streaming
        # query's checkpoint-scoped id so a rebuilt checkpoint (batch
        # ids restarting at 0) gets a fresh high-water mark instead of
        # silently skipping every batch against the old one
        self.stream_id = stream_id

    def _ledger(self) -> str:
        import os

        return os.path.join(self.path, "_epochs.json")

    def committed_epoch(self) -> int | None:
        import json

        try:
            with open(self._ledger()) as f:
                data = json.load(f)
        except (OSError, ValueError):
            return None
        if "streams" in data:
            return data["streams"].get(self.stream_id)
        return data.get("epoch") if self.stream_id == "default" else None

    def apply_batch(self, df: DataFrame, epoch: int) -> int:
        import json
        import os

        done = self.committed_epoch()
        if done is not None and epoch == done:
            return 0
        if done is not None and epoch < done:
            raise RuntimeError(
                f"epoch regression for export at {self.path} stream "
                f"{self.stream_id!r}: got {epoch}, committed {done}. "
                f"A rebuilt checkpoint must use a new stream_id."
            )
        (
            df.repartitionByRange(
                self.shards_per_batch, *[F.col(c) for c in self.sort_cols]
            )
            .sortWithinPartitions(*self.sort_cols)
            .withColumn("epoch", F.lit(int(epoch)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(self.path)
        )
        try:
            with open(self._ledger()) as f:
                data = json.load(f)
        except (OSError, ValueError):
            data = {}
        streams = data.get("streams", {})
        if "epoch" in data and "default" not in streams:  # legacy upgrade
            streams["default"] = data["epoch"]
        streams[self.stream_id] = int(epoch)
        tmp = self._ledger() + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"streams": streams}, f)
        os.replace(tmp, self._ledger())
        return 1

    def read(self) -> DataFrame:
        """Epoch-ordered read (global curriculum order: epoch, key)."""
        return (
            self.spark.read.parquet(self.path)
            .orderBy("epoch", *self.sort_cols)
        )
