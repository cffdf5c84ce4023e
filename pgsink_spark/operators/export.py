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
