"""Retrieval operators: BM25 search, TF-IDF terms, duplicated-ngram
fraction — property + plan pins (value equality is the DuckDB oracle's
job, exercised by tools/selfcheck.py and the driver gate)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pgsink_spark.operators.dedup import dedup_dupfrac_ngram
from pgsink_spark.operators.retrieval import (
    BM25_TERMS,
    bm25_search,
    tfidf_top_terms,
)


def test_bm25_topk_ranked_and_deterministic(spark, sf_dir):
    rows = bm25_search(spark, sf_dir).collect()
    assert len(rows) == 10
    scores = [r["bm25"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)
    # deterministic across runs (rounded-score ordering, doc_id tiebreak)
    assert [r["doc_id"] for r in rows] == [
        r["doc_id"] for r in bm25_search(spark, sf_dir).collect()
    ]


def test_bm25_hit_docs_contain_a_query_term(spark, sf_dir):
    from pgsink_spark.sources.fixtures import load_table

    top = bm25_search(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    joined = top.join(docs, "doc_id").select("doc_id", "text").collect()
    for r in joined:
        toks = set(r["text"].lower().split(" "))
        assert toks & set(BM25_TERMS)


def test_bm25_plan_has_no_unbounded_cartesian(spark, sf_dir):
    # the only cross join allowed is the 1-row broadcast stats frame
    plan = bm25_search(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row stats broadcast


def test_tfidf_top3_per_doc(spark, sf_dir):
    df = tfidf_top_terms(spark, sf_dir)
    per_doc = df.groupBy("doc_id").count().agg(F.max("count")).collect()[0][0]
    assert per_doc <= 3
    # scores non-increasing within each doc (ranked on the rounded value)
    bad = (
        df.withColumn(
            "prev",
            F.lag("tfidf").over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window
                .partitionBy("doc_id")
                .orderBy(F.desc("tfidf"), "tok")
            ),
        )
        .where(F.col("prev").isNotNull() & (F.col("tfidf") > F.col("prev")))
        .count()
    )
    assert bad == 0


def test_dupfrac_bounded_and_covers_all_docs(spark, sf_dir):
    from pgsink_spark.sources.fixtures import load_table

    df = dedup_dupfrac_ngram(spark, sf_dir)
    n_docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.size(F.split(F.lower("text"), " ")) >= 5)
        .count()
    )
    rows = df.collect()
    assert len(rows) == n_docs
    assert all(0.0 <= r["dup_frac"] <= 1.0 for r in rows)
