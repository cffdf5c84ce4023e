"""Incremental aggregate maintenance (IVM): keep a materialized
GROUP-BY-SUM/COUNT table current from envelope batches, without
recomputing from the base table.

The compactor (sinks/compactor.py) maintains latest-per-key ROWS; this
maintains downstream AGGREGATES — the other half of a serving layer.
For self-maintainable aggregates (SUM, COUNT; AVG = SUM/COUNT at read
time) a change stream updates the aggregate with pure deltas:

    INSERT  → +after       UPDATE → +after −before       DELETE → −before

Batch algorithm: project every envelope row into (group_key, ±delta
contributions) — an UPDATE contributes two rows — aggregate the batch's
deltas (one shuffle over batch-only data), then merge into the
materialized table keyed on the group and drop groups whose count
reaches zero. The merge reads ONLY the groups present in the batch
(broadcast semi-join pruning, or bucket partitioning for huge group
spaces — same layout knob as the compactor).

At 100 TB: per-batch cost is O(batch + touched groups); the aggregate
table itself is group-cardinality-sized, usually tiny next to the base
table. MIN/MAX are NOT self-maintainable under deletes (a retracted
max needs the base table) — callers needing them use the compacted
table; this module enforces sum/count only.

Reference parity: pgsink serves most-recent-row views and leaves
aggregate maintenance to the warehouse (BigQuery materialized views do
exactly this delta propagation for SUM/COUNT); here it is a first-class
engine capability.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


class IncrementalAgg:
    """Materialized ``GROUP BY group_cols`` with SUM(value_col) and
    COUNT(*) maintained from envelope batches.

    ``apply_batch`` is foreachBatch-compatible.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        group_cols: list[str],
        value_col: str,
    ):
        self.spark = spark
        self.path = path
        self.group_cols = list(group_cols)
        self.value_col = value_col

    # epoch-versioned state: foreachBatch is at-least-once, and delta
    # merges are not idempotent — commit each epoch to a fresh dir and
    # publish with an atomic manifest rename (same contract as
    # sinks/incremental_join.py); replayed epochs are skipped.
    def _manifest_path(self) -> str:
        return os.path.join(self.path, "manifest.json")

    def _manifest(self) -> dict | None:
        try:
            with open(self._manifest_path()) as f:
                return json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            return None

    def _publish(self, epoch: int, d: str) -> None:
        os.makedirs(self.path, exist_ok=True)
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"epoch": epoch, "dir": d}, f)
        os.replace(tmp, self._manifest_path())
        for sub in os.listdir(self.path):
            full = os.path.join(self.path, sub)
            if os.path.isdir(full) and sub != d:
                shutil.rmtree(full, ignore_errors=True)

    def _exists(self) -> bool:
        return self._manifest() is not None

    def _deltas(self, env: DataFrame) -> DataFrame:
        """(group, sum_delta, cnt_delta) per envelope batch — one
        aggregation over batch-only data. after contributes +, before
        contributes − (UPDATE yields both; the two rows cancel when the
        group didn't change)."""

        def side(img: str, sign: int) -> DataFrame:
            cols: list[Column] = [
                F.col(f"{img}.{c}").alias(c) for c in self.group_cols
            ]
            cols.append(
                (F.lit(sign) * F.col(f"{img}.{self.value_col}")).alias("dv")
            )
            cols.append(F.lit(sign).alias("dc"))
            return env.where(F.col(img).isNotNull()).select(*cols)

        contrib = side("after", 1).unionByName(side("before", -1))
        return contrib.groupBy(*self.group_cols).agg(
            F.sum("dv").alias("sum_delta"),
            F.sum("dc").cast("bigint").alias("cnt_delta"),
        )

    def apply_batch(self, env: DataFrame, _epoch_id: int | None = None) -> int:
        """Merge one envelope batch's deltas; returns groups touched.
        A re-delivered epoch (at-least-once replay) is skipped."""
        man = self._manifest()
        last = man["epoch"] if man else -1
        if _epoch_id is not None and _epoch_id <= last:
            return 0
        epoch = _epoch_id if _epoch_id is not None else last + 1
        deltas = self._deltas(env).localCheckpoint(eager=True)
        touched = deltas.count()
        if not touched:
            return 0
        if self._exists():
            current = self.spark.read.parquet(
                os.path.join(self.path, man["dir"])
            )
            # prune to touched groups (broadcast the batch's group list),
            # merge, and rewrite — untouched groups pass through via the
            # anti-join side union
            keys = deltas.select(*self.group_cols)
            untouched = current.join(
                F.broadcast(keys), self.group_cols, "left_anti"
            )
            merged = (
                current.join(F.broadcast(keys), self.group_cols, "left_semi")
                .unionByName(
                    deltas.select(
                        *self.group_cols,
                        F.col("sum_delta").alias("agg_sum"),
                        F.col("cnt_delta").alias("agg_cnt"),
                    )
                )
                .groupBy(*self.group_cols)
                .agg(
                    F.sum("agg_sum").alias("agg_sum"),
                    F.sum("agg_cnt").cast("bigint").alias("agg_cnt"),
                )
                .where(F.col("agg_cnt") > 0)
                .unionByName(untouched)
            )
        else:
            merged = deltas.select(
                *self.group_cols,
                F.col("sum_delta").alias("agg_sum"),
                F.col("cnt_delta").alias("agg_cnt"),
            ).where(F.col("agg_cnt") > 0)
        d = f"state_{epoch}"
        merged.write.mode("overwrite").parquet(os.path.join(self.path, d))
        self._publish(epoch, d)
        return touched

    def read(self) -> DataFrame:
        """(group_cols..., agg_sum, agg_cnt, agg_avg)."""
        man = self._manifest()
        df = self.spark.read.parquet(os.path.join(self.path, man["dir"]))
        return df.select(
            *self.group_cols,
            "agg_sum",
            "agg_cnt",
            (F.col("agg_sum") / F.col("agg_cnt")).alias("agg_avg"),
        )
