"""Sorted shard export (operators/export.py): shards are internally
sorted, ranges are disjoint, and file order == global order."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq

from pgsink_spark.operators.export import write_sorted_shards
from pgsink_spark.sources.fixtures import load_table


def test_sorted_shards_globally_ordered(spark, sf_dir, tmp_path):
    path = str(tmp_path / "shards")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    write_sorted_shards(orders, path, ["o_totalprice"], 8)

    files = sorted(glob.glob(os.path.join(path, "part-*")))
    assert len(files) > 1, "want multiple shards"
    total = 0
    prev_max = None
    for f in files:
        vals = pq.read_table(f, columns=["o_totalprice"])["o_totalprice"]
        vals = vals.to_pylist()
        total += len(vals)
        assert vals == sorted(vals), f"{f} not internally sorted"
        if vals:
            if prev_max is not None:
                # disjoint, ordered ranges: concatenation by file name
                # is the global sort (equal keys co-locate, so strictly
                # greater-or-equal with no interleave)
                assert vals[0] >= prev_max
            prev_max = vals[-1]
    assert total == orders.count()


def test_sorted_shards_prune_on_range_predicate(spark, sf_dir, tmp_path):
    """Parquet min/max footers let a range predicate skip whole
    shards: a narrow band touches a subset of files."""
    path = str(tmp_path / "shards2")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    write_sorted_shards(orders, path, ["o_totalprice"], 8)
    files = glob.glob(os.path.join(path, "part-*"))
    lo = orders.approxQuantile("o_totalprice", [0.45, 0.55], 0.01)
    touching = 0
    for f in files:
        md = pq.read_metadata(f)
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(1)
            st = col.statistics
            if st.min <= lo[1] and st.max >= lo[0]:
                touching += 1
    assert 0 < touching < len(files)
