"""Heuristic/model evaluation operators — the metrics layer a curation
pipeline runs over its own classifiers before trusting them at scale:
confusion-derived precision/recall for the language-ID heuristic
(against the fixture's ground-truth ``lang`` column) and a rank-based
ROC-AUC for the quality score as a document-length discriminator.

Both are exact: integer confusion counts, and AUC via the Mann-Whitney
U statistic on average ranks (tie-robust — no dependence on tie
order). Reference parity: the reference engine has no evaluation
plane; this is part of the beyond-reference surface the brief mandates
for an LLM training-data pipeline.

Scale notes (100 TB): the confusion matrix is one class-keyed agg over
a row-local prediction join (predictions and truth live in the same
row — no shuffle joins anywhere); AUC is one global sort-equivalent
(two window passes over the score axis) plus a 1-row fold. At corpus
scale the exact AUC sort swaps for a fixed-width score-histogram
approximation (trapezoid over bins) without changing the contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from pgsink_spark.operators.relational import query
from pgsink_spark.operators.text import text_lang_id, text_quality_score
from pgsink_spark.sources.fixtures import load_table

_LANGID_PRED = """
      CASE WHEN CAST((len(concat(' ', lower(text), ' '))
                 - len(replace(concat(' ', lower(text), ' '), ' le ', '')))
                 / 4 AS BIGINT)
              > CAST((len(concat(' ', lower(text), ' '))
                 - len(replace(concat(' ', lower(text), ' '), ' the ', '')))
                 / 5 AS BIGINT) THEN 'fr'
           WHEN CAST((len(concat(' ', lower(text), ' '))
                 - len(replace(concat(' ', lower(text), ' '), ' der ', '')))
                 / 5 AS BIGINT)
              > CAST((len(concat(' ', lower(text), ' '))
                 - len(replace(concat(' ', lower(text), ' '), ' the ', '')))
                 / 5 AS BIGINT) THEN 'de'
           WHEN CAST((len(concat(' ', lower(text), ' '))
                 - len(replace(concat(' ', lower(text), ' '), ' el ', '')))
                 / 4 AS BIGINT)
              > CAST((len(concat(' ', lower(text), ' '))
                 - len(replace(concat(' ', lower(text), ' '), ' the ', '')))
                 / 5 AS BIGINT) THEN 'es'
           ELSE 'en' END
"""


@query(
    "eval_langid_metrics",
    f"""
    WITH p AS (
      SELECT lang AS true_lang, {_LANGID_PRED} AS pred_lang
      FROM documents
    ),
    classes AS (
      SELECT DISTINCT true_lang AS class FROM p
      UNION SELECT DISTINCT pred_lang FROM p
    ),
    m AS (
      SELECT c.class,
             CAST(SUM(CASE WHEN p.true_lang = c.class
                            AND p.pred_lang = c.class
                           THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             CAST(SUM(CASE WHEN p.true_lang <> c.class
                            AND p.pred_lang = c.class
                           THEN 1 ELSE 0 END) AS BIGINT) AS fp,
             CAST(SUM(CASE WHEN p.true_lang = c.class
                            AND p.pred_lang <> c.class
                           THEN 1 ELSE 0 END) AS BIGINT) AS fn
      FROM classes c CROSS JOIN p
      GROUP BY c.class
    )
    SELECT class, tp, fp, fn,
           CASE WHEN tp + fp > 0
                THEN CAST(tp AS DOUBLE) / (tp + fp) END AS prec,
           CASE WHEN tp + fn > 0
                THEN CAST(tp AS DOUBLE) / (tp + fn) END AS rec
    FROM m ORDER BY class
    """,
)
def eval_langid_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class precision/recall of the marker-frequency language-ID
    heuristic against the corpus's ground-truth ``lang`` column — the
    eval table a pipeline owner reads before letting the heuristic
    gate a 100 TB crawl.

    Prediction and truth live in the same row, so the whole confusion
    matrix is ONE class-keyed aggregation over a row-local projection
    (the tiny class list broadcasts; at k classes the fan-out is k
    rows per doc, collapsed map-side). No NULL-guard asymmetry: both
    engines emit NULL precision for never-predicted classes.
    """
    docs = load_table(spark, sf_dir, "documents")
    preds = text_lang_id(spark, sf_dir)
    p = docs.select("doc_id", F.col("lang").alias("true_lang")).join(
        preds.withColumnRenamed("pred_lang", "pred_lang"), "doc_id"
    )
    classes = (
        p.select(F.col("true_lang").alias("class"))
        .union(p.select("pred_lang"))
        .distinct()
    )
    m = (
        F.broadcast(classes)
        .crossJoin(p)
        .groupBy("class")
        .agg(
            F.sum(
                (
                    (F.col("true_lang") == F.col("class"))
                    & (F.col("pred_lang") == F.col("class"))
                ).cast("long")
            ).alias("tp"),
            F.sum(
                (
                    (F.col("true_lang") != F.col("class"))
                    & (F.col("pred_lang") == F.col("class"))
                ).cast("long")
            ).alias("fp"),
            F.sum(
                (
                    (F.col("true_lang") == F.col("class"))
                    & (F.col("pred_lang") != F.col("class"))
                ).cast("long")
            ).alias("fn"),
        )
    )
    return m.select(
        "class",
        "tp",
        "fp",
        "fn",
        F.when(
            F.col("tp") + F.col("fp") > 0,
            F.col("tp").cast("double") / (F.col("tp") + F.col("fp")),
        ).alias("prec"),
        F.when(
            F.col("tp") + F.col("fn") > 0,
            F.col("tp").cast("double") / (F.col("tp") + F.col("fn")),
        ).alias("rec"),
    ).orderBy("class")


AUC_LABEL_CHARS = 400


@query(
    "eval_score_auc",
    f"""
    WITH scored AS (
      SELECT doc_id,
             LEAST(len(string_split(lower(text), ' ')) / 100.0, 1.0) * 0.5
             + (1.0 - LEAST(
                 CAST((len(concat(' ', lower(text), ' '))
                   - len(replace(concat(' ', lower(text), ' '), ' the ', '')))
                   / 5 AS BIGINT)
                 * 1.0 / len(string_split(lower(text), ' ')) * 5.0, 1.0))
               * 0.3
             + LEAST((len(lower(text))
                      - (len(string_split(lower(text), ' ')) - 1))
                     * 1.0 / len(string_split(lower(text), ' ')) / 8.0,
                     1.0) * 0.2 AS score,
             (n_chars >= {AUC_LABEL_CHARS}) AS label
      FROM documents
    ),
    ranked AS (
      SELECT label,
             RANK() OVER (ORDER BY score)
               + (COUNT(*) OVER (PARTITION BY score) - 1) / 2.0 AS avg_rank
      FROM scored
    ),
    agg AS (
      SELECT CAST(SUM(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS np,
             CAST(SUM(CASE WHEN label THEN 0 ELSE 1 END) AS BIGINT) AS nn,
             SUM(CASE WHEN label THEN avg_rank ELSE 0 END) AS rank_sum
      FROM ranked
    )
    SELECT np AS n_pos, nn AS n_neg,
           CAST(ROUND(CAST((rank_sum - np * (np + 1) / 2.0) / (np * nn)
                AS DECIMAL(18,8)), 6) AS DOUBLE) AS auc
    FROM agg
    """,
)
def eval_score_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC-AUC of the composite quality score as a discriminator for
    long documents (label: n_chars ≥ 400), computed exactly via the
    Mann-Whitney U statistic on AVERAGE ranks — tie-robust, so the
    result is independent of tie ordering and reproducible across
    engines.

    Plan: one global rank over the score axis (a single range
    exchange at any scale — ranking is the sort-bound step), one
    tie-group window sharing that sort, and a 1-row fold. At 100 TB
    exact global ranking gives way to a fixed-bin score histogram and
    trapezoidal AUC; the fixture-scale operator keeps the exact form
    the approximation is validated against.
    """
    q = text_quality_score(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", (F.col("n_chars") >= AUC_LABEL_CHARS).alias("label")
    )
    scored = q.select("doc_id", F.col("quality").alias("score")).join(
        docs, "doc_id"
    )
    ranked = scored.select(
        "label",
        (
            F.rank().over(W.orderBy("score"))
            + (F.count(F.lit(1)).over(W.partitionBy("score")) - 1) / 2.0
        ).alias("avg_rank"),
    )
    agg = ranked.agg(
        F.sum(F.col("label").cast("long")).alias("np"),
        F.sum((~F.col("label")).cast("long")).alias("nn"),
        F.sum(F.when(F.col("label"), F.col("avg_rank")).otherwise(0.0)).alias(
            "rank_sum"
        ),
    )
    return agg.select(
        F.col("np").alias("n_pos"),
        F.col("nn").alias("n_neg"),
        F.round(
            (
                (F.col("rank_sum") - F.col("np") * (F.col("np") + 1) / 2.0)
                / (F.col("np") * F.col("nn"))
            ).cast("decimal(18,8)"),
            6,
        )
        .cast("double")
        .alias("auc"),
    )
