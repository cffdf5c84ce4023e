"""Corpus-level curation operators (operators/corpus.py).

Oracle parity for the three queries is covered by the parametrized
test_oracle_corpus suite; these tests pin the operator-specific
invariants the oracle alone doesn't show.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pgsink_spark.operators import corpus
from pgsink_spark.sources.fixtures import load_table


def test_segments_partition_text_exactly(spark, sf_dir):
    """Segments reconstruct the original text: no word lost, none
    duplicated by the windowing."""
    docs = load_table(spark, sf_dir, "documents").limit(50)
    bad = (
        docs.select(
            "doc_id",
            F.array_join(corpus._segments("text"), " ").alias("rejoined"),
            "text",
        )
        .where(F.col("rejoined") != F.col("text"))
        .count()
    )
    assert bad == 0


def test_dedup_paragraph_kept_bounds(spark, sf_dir):
    out = corpus.dedup_paragraph(spark, sf_dir).collect()
    assert len(out) > 0
    for row in out:
        assert 0 <= row["n_kept"] <= row["n_segs"]
    # the election keeps each distinct segment exactly once corpus-wide
    segs = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(corpus._segments("text")).alias("seg"))
    )
    distinct_segs = segs.distinct().count()
    assert sum(r["n_kept"] for r in out) == distinct_segs


def test_domain_mix_cap_enforced(spark, sf_dir):
    out = corpus.domain_mix_sample(spark, sf_dir)
    per_source = out.groupBy("source").count().collect()
    assert all(r["count"] <= corpus.DOMAIN_CAP for r in per_source)


def test_ngram_topk_counts_are_positive_desc(spark, sf_dir):
    rows = corpus.text_ngram_topk(spark, sf_dir).collect()
    counts = [r["cnt"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(c > 0 for c in counts)
