"""Keyset-paginated snapshot reads.

The reference's import scan is
``SELECT NOW(), cols FROM t [WHERE pk > $cursor] ORDER BY pk LIMIT n``
with the resume cursor = last pk read (pkg/imports/import.go:209-223) —
keyset pagination over the PK index, never OFFSET (README.md:31-33).

Two Spark shapes, used together:

- ``keyset_batch`` — the *resumable driver loop* step: one bounded batch
  per call. Catalyst pushes ``pk > cursor`` into the source scan
  (JDBC pushdown / parquet min-max skipping), so each batch reads only
  the tail it needs, exactly like the reference's index traversal. This
  is the shape that keeps source transactions short (snapshot-timeout
  semantics) and survives restarts.
- ``partitioned_snapshot`` — the *parallel bulk* step: Spark's native
  range-partitioned read (JDBC ``partitionColumn/lowerBound/upperBound/
  numPartitions``) for the initial fill, when resumability matters less
  than throughput. At 1000 executors this is N concurrent range scans,
  no driver bottleneck.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _pk_list(pk) -> list[str]:
    return [pk] if isinstance(pk, str) else list(pk)


def row_value_gt(pk_cols: list[str], cursor) -> Column:
    """Lexicographic row-value comparison ``(k1, k2, …) > (c1, c2, …)``
    as a Spark predicate — the composite-key keyset cursor the
    reference lacks (pkg/imports/import.go:235-270 refuses >1 pk
    column; real tables hit that constantly, so this engine extends
    the contract). Expanded form
    ``k1 > c1 OR (k1 = c1 AND (k2 > c2 OR …))`` so each leading-column
    equality chain stays sargable for pushdown."""
    cur = list(cursor) if isinstance(cursor, (list, tuple)) else [cursor]
    if len(cur) != len(pk_cols):
        raise ValueError(
            f"cursor arity {len(cur)} != pk arity {len(pk_cols)}"
        )
    pred = F.col(pk_cols[-1]) > F.lit(cur[-1])
    for name, val in zip(reversed(pk_cols[:-1]), reversed(cur[:-1])):
        pred = (F.col(name) > F.lit(val)) | (
            (F.col(name) == F.lit(val)) & pred
        )
    return pred


def keyset_batch(
    source: DataFrame,
    pk,
    cursor=None,
    limit: int = 5000,
    materialize: bool = True,
) -> tuple[DataFrame, object | None, bool]:
    """One keyset batch: (rows, next_cursor, done).

    ``pk`` is a column name or a LIST of names (composite key —
    lexicographic row-value pagination). ``rows`` is ordered by pk and
    bounded by ``limit``; ``next_cursor`` is the max pk in the batch
    (None when the batch is empty; a tuple for composite keys);
    ``done`` marks a batch smaller than ``limit`` — the scan tail.

    With ``materialize`` (the default) the batch is pinned with an eager
    ``localCheckpoint`` before anything reads it, so the cursor/count agg
    and the caller's sink write see the *same* rows. Against a live
    source, two separate executions of the lazy
    ``orderBy(pk).limit(n)`` can observe different snapshots — a
    concurrent insert with pk <= cursor can displace a row out of the
    second run's LIMIT window, silently skipping it. The reference
    derives rows and cursor from a single query
    (pkg/imports/import.go:209-223); materializing restores that
    contract (and saves the double scan). Pass ``materialize=False``
    only for plan inspection of the pre-pinned scan.
    """
    pks = _pk_list(pk)
    scan = source
    if cursor is not None:
        scan = scan.where(row_value_gt(pks, cursor))
    batch = scan.orderBy(*pks).limit(limit)
    if materialize:
        # pk > cursor still reaches the scan (pushdown happens during
        # this one materializing execution); the checkpoint truncates
        # lineage so later readers reuse the stored blocks.
        batch = batch.localCheckpoint(eager=True)
    # struct max orders lexicographically — one agg yields the
    # composite cursor without a second ordered scan
    row = batch.agg(
        F.max(F.struct(*pks)).alias("mx"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    if row["mx"] is None:
        next_cursor = None
    elif len(pks) == 1:
        next_cursor = row["mx"][0]
    else:
        next_cursor = tuple(row["mx"])
    done = row["n"] < limit
    return batch, next_cursor, done


def partitioned_snapshot(
    source: DataFrame, pk, num_partitions: int = 32
) -> DataFrame:
    """Range-partitioned parallel snapshot (initial-fill path).

    ``repartitionByRange`` on the pk (full column list for composite
    keys) mirrors the JDBC partitioned read: each output partition is a
    contiguous pk range, so a downstream per-partition writer produces
    the same chunking the reference's cursor loop would, but N-way
    parallel.
    """
    return source.repartitionByRange(
        num_partitions, *[F.col(c) for c in _pk_list(pk)]
    )
