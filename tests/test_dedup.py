"""Exact n-gram Jaccard dedup: the stop-shingle cap
(operators/dedup.py::_pair_jaccard) — hot-key candidate bound without
similarity distortion.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pgsink_spark.operators.dedup import (
    MAX_SHINGLE_FREQ,
    _pair_jaccard,
    doc_shingle_sets,
)


def _sets(spark, rows):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return doc_shingle_sets(docs, 3)


def test_hot_shingle_candidates_are_bounded(spark):
    """One ultra-frequent boilerplate shingle shared by every doc:
    uncapped candidate generation is O(n²); the capped path drops the
    hot key and emits only the pairs that share a COLD shingle."""
    n = 40
    # every doc ends with the same boilerplate 3-gram; docs 0/1 also
    # share a rare prefix shingle
    rows = [
        (
            i,
            ("alpha beta gamma " if i < 2 else f"uniq{i} u{i}x u{i}y ")
            + "terms of service",
        )
        for i in range(n)
    ]
    sets = _sets(spark, rows)

    uncapped = _pair_jaccard(sets).count()
    capped = _pair_jaccard(sets, max_shingle_freq=10)
    capped_pairs = capped.count()
    assert uncapped == n * (n - 1) // 2  # the hot key exploded
    assert capped_pairs == 1             # only the cold-shingle pair
    d1, d2 = capped.first()["d1"], capped.first()["d2"]
    assert (d1, d2) == (0, 1)


def test_capped_jaccard_values_are_exact(spark):
    """The cap prunes candidates, never similarities: every pair the
    capped path reports carries the same Jaccard as the uncapped
    path computes for it (full-array intersection, hot shingles
    INCLUDED in the numerator/denominator)."""
    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "the quick brown fox jumps over the lazy cat today"),
        (3, "a completely different document with other words here"),
        (4, "a completely different document with other words there"),
    ]
    sets = _sets(spark, rows)
    want = {
        (r["d1"], r["d2"]): r["jac"]
        for r in _pair_jaccard(sets).collect()
    }
    got = {
        (r["d1"], r["d2"]): r["jac"]
        for r in _pair_jaccard(sets, max_shingle_freq=100).collect()
    }
    assert got == want  # no hot shingles at this cap → identical output
    # lower the cap so some shingles go hot: surviving pairs still
    # carry byte-identical jaccard values
    got_capped = {
        (r["d1"], r["d2"]): r["jac"]
        for r in _pair_jaccard(sets, max_shingle_freq=1).collect()
    }
    for pair, jac in got_capped.items():
        assert jac == want[pair]


def test_registered_cap_is_transparent_on_fixtures(spark, sf_dir):
    """At MAX_SHINGLE_FREQ the fixtures have no hot shingles, so the
    capped registered path returns exactly the uncapped result — the
    oracle stays unchanged."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sets = doc_shingle_sets(docs, 3).persist()
    try:
        base = set(
            map(
                tuple,
                _pair_jaccard(sets)
                .where(F.col("jac") >= 0.8)
                .select("d1", "d2")
                .collect(),
            )
        )
        capped = set(
            map(
                tuple,
                _pair_jaccard(sets, max_shingle_freq=MAX_SHINGLE_FREQ)
                .where(F.col("jac") >= 0.8)
                .select("d1", "d2")
                .collect(),
            )
        )
        assert capped == base
    finally:
        sets.unpersist()


def test_bloom_decontaminate_is_superset_of_exact(spark, sf_dir):
    """Bloom triage admits false positives only: every corpus doc the
    exact Jaccard scan flags must be in the Bloom-flagged set."""
    from pgsink_spark.operators.dedup import (
        bloom_decontaminate,
        contamination_check,
    )

    flagged = {
        r["doc_id"] for r in bloom_decontaminate(spark, sf_dir).collect()
    }
    exact = {
        r["corpus_id"] for r in contamination_check(spark, sf_dir).collect()
    }
    assert exact <= flagged
    # and it actually triages: a meaningful share of the corpus skips
    # the exact verifier
    from pgsink_spark.operators.dedup import EVAL_SPLIT_ID
    from pgsink_spark.sources.fixtures import load_table

    n_corpus = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") >= EVAL_SPLIT_ID)
        .count()
    )
    assert len(flagged) < n_corpus
