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

import os

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

    def _exists(self) -> bool:
        return os.path.isdir(self.path) and any(
            f.endswith(".parquet") or f.startswith("part-")
            for f in os.listdir(self.path)
        )

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
        """Merge one envelope batch's deltas; returns groups touched."""
        deltas = self._deltas(env).localCheckpoint(eager=True)
        touched = deltas.count()
        if not touched:
            return 0
        if self._exists():
            current = self.spark.read.parquet(self.path)
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
        tmp = self.path + ".tmp"
        merged.write.mode("overwrite").parquet(tmp)
        final = self.spark.read.parquet(tmp)
        final.write.mode("overwrite").parquet(self.path)
        import shutil  # noqa: PLC0415

        shutil.rmtree(tmp, ignore_errors=True)
        return touched

    def read(self) -> DataFrame:
        """(group_cols..., agg_sum, agg_cnt, agg_avg)."""
        df = self.spark.read.parquet(self.path)
        return df.select(
            *self.group_cols,
            "agg_sum",
            "agg_cnt",
            (F.col("agg_sum") / F.col("agg_cnt")).alias("agg_avg"),
        )
