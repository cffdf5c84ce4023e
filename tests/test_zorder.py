"""Z-order clustering (operators/zorder.py): Morton-key correctness and
two-dimensional file skipping on real parquet stats."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from pgsink_spark.operators.zorder import morton_key, scale_to_bits, write_zordered
from pgsink_spark.sources.fixtures import load_table

SF = "/root/testdata/sf0.001"


def _morton_py(a: int, b: int, bits: int = 16) -> int:
    k = 0
    for i in range(bits):
        k |= ((a >> i) & 1) << (2 * i + 1)
        k |= ((b >> i) & 1) << (2 * i)
    return k


def test_morton_key_matches_reference_bits(spark):
    rows = [(3, 5), (0, 0), (65535, 65535), (1, 0), (0, 1), (1234, 4321)]
    df = spark.createDataFrame(rows, "a long, b long").select(
        "a", "b", morton_key(F.col("a"), F.col("b")).alias("z")
    )
    for r in df.collect():
        assert r["z"] == _morton_py(r["a"], r["b"])


def test_scale_to_bits_bounds(spark):
    df = spark.range(0, 1000).select(
        scale_to_bits(F.col("id"), 0, 999, 8).alias("s")
    )
    lo, hi = df.agg(F.min("s"), F.max("s")).first()
    assert lo == 0 and hi == 255


def _file_ranges(path: str, column: str) -> list[tuple]:
    out = []
    for f in glob.glob(f"{path}/*.parquet"):
        col = pq.read_table(f, columns=[column]).column(0).to_pylist()
        if col:
            out.append((min(col), max(col)))
    return out


def test_zorder_write_skips_on_both_dimensions(spark, tmp_path):
    """After z-ordering events on (user_id, value), BOTH columns show
    sub-global per-file ranges — a single-column sort can only give
    that for its own column."""
    ev = load_table(spark, SF, "events").select("user_id", "value", "event_id")
    n_users = 150  # fixture cardinality
    path = str(tmp_path / "z")
    write_zordered(
        ev,
        path,
        scale_to_bits(F.col("user_id"), 0, n_users, 8),
        scale_to_bits(F.col("value"), 0.0, 1000.0, 8),
        files=8,
        bits=8,
    )

    def skipping(ranges, glo, ghi):
        """Fraction of files a mid-range point predicate can skip."""
        mid = (glo + ghi) / 2
        return sum(1 for lo, hi in ranges if not (lo <= mid <= hi)) / len(
            ranges
        )

    ur = _file_ranges(path, "user_id")
    vr = _file_ranges(path, "value")
    assert len(ur) > 2
    # both dimensions prune: a point predicate in the middle of either
    # domain skips at least a third of the files outright
    assert skipping(ur, 0, n_users) >= 1 / 3, ur
    assert skipping(vr, 0.0, 1000.0) >= 1 / 3, vr
