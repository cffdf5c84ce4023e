"""Deterministic scalable global ranks: ordered buckets + prefix offsets.

The naive global rank (a single-partition window) dies at scale; the
scalable recipe is range-partition → per-partition counts → broadcast
prefix offsets → partition-local row numbers. But Spark's
``repartitionByRange`` SAMPLES its boundaries with a per-job seed, so
the offsets job and the consuming job can land different boundaries —
the offsets then belong to partitions that no longer exist, silently
corrupting every rank (observed as a d79 CDF mismatch at sf0.1).

This module replaces the sampled range partitioner with DETERMINISTIC
ordered buckets: bucket(k) = floor((k − min) / width) from a one-row
min/max aggregate — a pure function of the data, identical in every
job. Bucket subtotals are a tiny groupBy; offsets broadcast back; the
per-bucket window is partition-local. Equi-width buckets can skew on
pathological key distributions — at production scale feed ``n_buckets``
equi-depth boundaries from approx quantiles instead (the determinism
argument is the same once the boundaries are pinned).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ordered_bucket(df: DataFrame, key: Column, n_buckets: int) -> Column:
    """A deterministic ordered bucket id for ``key``: equal-width bins
    over the observed [min, max], as a column expression usable in any
    number of jobs over the same data."""
    stats = df.agg(
        F.min(key).cast("double").alias("mn"),
        F.max(key).cast("double").alias("mx"),
    ).collect()[0]
    mn, mx = float(stats["mn"]), float(stats["mx"])
    if mx <= mn:
        return F.lit(0)
    width = (mx - mn) / n_buckets
    return F.least(
        F.floor((key.cast("double") - F.lit(mn)) / F.lit(width)),
        F.lit(n_buckets - 1),
    ).cast("int")


def multi_ordered_buckets(
    df: DataFrame, keys: list[Column], n_buckets: int
) -> list[Column]:
    """``ordered_bucket`` for SEVERAL keys with ONE min/max job
    (r10 optimization: the multi-signal rank consumers — Borda fusion,
    RFM — previously paid one driver round-trip per signal). The
    per-key boundary arithmetic is bit-identical to ordered_bucket, so
    the produced bucket ids (and every downstream rank) are unchanged."""
    aggs = []
    for i, k in enumerate(keys):
        aggs.append(F.min(k).cast("double").alias(f"mn{i}"))
        aggs.append(F.max(k).cast("double").alias(f"mx{i}"))
    stats = df.agg(*aggs).collect()[0]
    cols: list[Column] = []
    for i, k in enumerate(keys):
        mn, mx = float(stats[f"mn{i}"]), float(stats[f"mx{i}"])
        if mx <= mn:
            cols.append(F.lit(0))
            continue
        width = (mx - mn) / n_buckets
        cols.append(
            F.least(
                F.floor((k.cast("double") - F.lit(mn)) / F.lit(width)),
                F.lit(n_buckets - 1),
            ).cast("int")
        )
    return cols


def multi_bucket_counts(
    df: DataFrame, bucket_cols: list[Column]
) -> list[dict[int, int]]:
    """Per-bucket counts for SEVERAL bucket columns in ONE job: each
    row contributes one (signal, bucket) struct per column via a
    row-local explode, and a single (signal, bucket)-keyed partial agg
    collects all census maps at once. Identical counts to running
    groupBy('bucket') per column."""
    ex = F.explode(
        F.array(
            *[
                F.struct(F.lit(i).alias("sig"), b.alias("bucket"))
                for i, b in enumerate(bucket_cols)
            ]
        )
    ).alias("sb")
    rows = (
        df.select(ex)
        .select("sb.sig", "sb.bucket")
        .groupBy("sig", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    out: list[dict[int, int]] = [{} for _ in bucket_cols]
    for r in rows:
        out[r["sig"]][r["bucket"]] = r["cnt"]
    return out


def bucket_offsets(
    bucketed: DataFrame, counts: dict[int, int]
) -> tuple[Column, int]:
    """Prefix-offset map column for a frame carrying a ``bucket``
    column, given per-bucket counts; returns (offset_col, total)."""
    offsets, acc = {}, 0
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]
    off = F.element_at(
        F.create_map(*[F.lit(x) for kv in sorted(offsets.items()) for x in kv]),
        F.col("bucket"),
    )
    return off, acc
