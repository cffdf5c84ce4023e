"""Z-order (Morton) clustering: multi-dimensional data skipping for
plain parquet.

The reference clusters its warehouse tables by primary key
(pkg/sinks/bigquery/schema_builders.go:99-106) — a single-dimension
sort. A sort key serves ONE dimension: a table sorted by ``user_id``
skips nothing for a time-only predicate. Interleaving the bits of two
(or more) scaled columns into one Morton key and sorting by THAT gives
every interleaved dimension partial locality, so parquet min/max stats
prune files/row-groups for filters on either column — the Z-ORDER of
Delta/Iceberg, here as a pure Catalyst expression (shiftleft/or over
fixed bit positions, fully codegen'd, no UDF).

Scale shape: the z-key is row-local; clustering cost is the same
``repartitionByRange + sortWithinPartitions`` shuffle the pk-sorted
writer already pays — you choose the key, not a new mechanism. Bits
per dimension trade locality granularity against key width; 16+16
bits ≈ 65k cells per dimension, plenty for file-level skipping.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZBITS = 16


def scale_to_bits(c: Column, lo: Column | int, hi: Column | int, bits: int = ZBITS) -> Column:
    """Affinely map a numeric column from [lo, hi] onto [0, 2^bits)."""
    lo_c = F.lit(lo) if not isinstance(lo, Column) else lo
    hi_c = F.lit(hi) if not isinstance(hi, Column) else hi
    span = (hi_c - lo_c).cast("double")
    frac = (c.cast("double") - lo_c.cast("double")) / span
    cells = F.lit((1 << bits) - 1)
    return F.least(
        F.greatest(F.round(frac * cells).cast("bigint"), F.lit(0)), cells
    )


def morton_key(a: Column, b: Column, bits: int = ZBITS) -> Column:
    """Interleave the low ``bits`` bits of two non-negative bigint
    columns: a's bit i lands at position 2i+1, b's at 2i. Pure
    shiftleft/bitwise-and/or expression tree (2·bits terms) — stays
    inside whole-stage codegen."""
    key = F.lit(0).cast("bigint")
    for i in range(bits):
        abit = F.shiftleft(
            F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
        bbit = F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i)
        key = key.bitwiseOR(abit).bitwiseOR(bbit)
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    a: Column,
    b: Column,
    files: int = 16,
    bits: int = ZBITS,
) -> None:
    """Cluster ``df`` by the Morton key of (a, b) and write parquet:
    range-partition so files cover disjoint z-ranges, sort within each
    so row-group stats are tight on BOTH source columns."""
    keyed = df.withColumn("_z", morton_key(a, b, bits))
    (
        keyed.repartitionByRange(files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
