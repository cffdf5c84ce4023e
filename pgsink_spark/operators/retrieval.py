"""Text retrieval scoring: BM25 search and per-document TF-IDF terms.

A training-data pipeline uses these constantly — keyword search over a
corpus for curation/debugging, and TF-IDF term extraction for topic
profiling and near-duplicate triage. Both are pure relational plans:

- one whitespace-tokenize + explode (row-local, codegen),
- partial-aggregated (doc, term) counts — the map-side combine collapses
  each partition's postings before the shuffle,
- corpus statistics (N, avgdl) as a 1-row broadcast cross join, never a
  driver-side collect,
- document-frequency joins keyed on the term — the only shuffles.

At 100 TB the plan is the standard distributed inverted-index build:
everything is keyed by term or doc_id, no all-pairs stage anywhere, and
the query-term filter lands BEFORE the tf aggregation so the scored
postings are |query terms| columns wide, not |vocabulary|.

Scores are rounded to 6 decimals inside a DECIMAL cast on both engines
(the repo's cross-engine float discipline), and every ORDER BY ranks the
*rounded* score with a doc_id tiebreak so the top-k cut is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgsink_spark.operators.relational import query
from pgsink_spark.sources.fixtures import load_table

# BM25 free parameters (the universal Robertson/Sparck-Jones defaults)
K1 = 1.2
B = 0.75

BM25_TERMS = ["hash", "join", "scan"]


def _tokens(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("tok")
    )


def _round6(c: F.Column) -> F.Column:
    return F.round(c.cast("decimal(18,8)"), 6).cast("double")


def bm25_score(docs: DataFrame, terms: list[str], k: int = 10) -> DataFrame:
    """Top-k documents by BM25 against a bag of query terms.

    idf uses the +1-smoothed log form (Lucene's variant):
    ``ln(1 + (N - df + 0.5) / (df + 0.5))`` — strictly positive, so a
    term present in every document still contributes.

    Plan: with a small KNOWN query-term list there is no reason to
    build an inverted index — per-document term frequencies and length
    are row-local array expressions (``size(filter(tokens, …))``), so
    the whole query is ONE scan + one single-row stats aggregate
    (N, avgdl, per-term df — broadcast back) + a TakeOrdered top-k.
    No (doc, term) shuffle, no doc-keyed join anywhere; at 100 TB the
    cost is the scan. (The inverted-index build lives on in
    tfidf_top_terms, where every term in the vocabulary is scored.)
    """
    # let-idiom: bind the token array as a lambda variable so projection
    # collapse cannot inline the split() into every per-term filter
    # (3 query terms would otherwise re-tokenize the text 4× per row)
    for t in terms:
        if "'" in t or "\\" in t:
            raise ValueError(f"query term needs escaping: {t!r}")
    fields = ", ".join(
        f"size(filter(w, x -> x = '{t}')) as tf_{i}"
        for i, t in enumerate(terms)
    )
    per_doc = docs.select(
        "doc_id",
        F.expr(
            "transform(array(split(lower(text), ' ')),"
            f" w -> struct(size(w) as dl, {fields}))[0]"
        ).alias("s"),
    ).select(
        "doc_id",
        F.col("s.dl").cast("double").alias("dl"),
        *[
            F.col(f"s.tf_{i}").cast("double").alias(f"tf_{i}")
            for i in range(len(terms))
        ],
    )
    stats = per_doc.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("double")).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )

    def term_score(i: int) -> F.Column:
        tf, df = F.col(f"tf_{i}"), F.col(f"df_{i}")
        idf = F.log(
            F.lit(1.0) + (F.col("n_docs") - df + 0.5) / (df + 0.5)
        )
        norm = tf * (K1 + 1) / (
            tf + K1 * (1 - B + B * F.col("dl") / F.col("avgdl"))
        )
        return F.when(tf > 0, idf * norm).otherwise(F.lit(0.0))

    scored = (
        per_doc.crossJoin(F.broadcast(stats))
        # absent-terms-only docs are not hits (oracle: inner join on tf)
        .where(
            sum((F.col(f"tf_{i}") > 0).cast("int") for i in range(len(terms)))
            > 0
        )
        .select(
            "doc_id",
            _round6(
                sum(term_score(i) for i in range(len(terms)))
            ).alias("bm25"),
        )
    )
    return scored.orderBy(F.desc("bm25"), "doc_id").limit(k)


@query(
    "bm25_search",
    """
    WITH toks AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
      FROM documents
    ),
    dl AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl
           FROM toks GROUP BY doc_id),
    stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl
              FROM dl),
    tf AS (SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS tf
           FROM toks WHERE tok IN ('hash', 'join', 'scan')
           GROUP BY doc_id, tok),
    dfreq AS (SELECT tok, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY tok)
    SELECT doc_id,
           CAST(ROUND(CAST(SUM(
             ln(1 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
             * tf.tf * (1.2 + 1)
               / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))
           ) AS DECIMAL(18,8)), 6) AS DOUBLE) AS bm25
    FROM tf
    JOIN dfreq USING (tok)
    JOIN dl USING (doc_id)
    CROSS JOIN stats
    GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id
    LIMIT 10
    """,
)
def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword search over the documents corpus (top 10)."""
    return bm25_score(load_table(spark, sf_dir, "documents"), BM25_TERMS)


@query(
    "tfidf_top_terms",
    """
    WITH toks AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
      FROM documents
    ),
    tf AS (SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS tf
           FROM toks GROUP BY doc_id, tok),
    dfreq AS (SELECT tok, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
              FROM toks GROUP BY tok),
    n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.tok,
             CAST(ROUND(CAST(
               tf.tf * ln((1 + n.n_docs) / (1 + dfreq.df))
             AS DECIMAL(18,8)), 6) AS DOUBLE) AS tfidf
      FROM tf JOIN dfreq USING (tok) CROSS JOIN n
    )
    SELECT doc_id, tok, tfidf FROM (
      SELECT scored.*,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, tok) AS rk
      FROM scored
    ) WHERE rk <= 3
    ORDER BY doc_id, tfidf DESC, tok
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (smoothed idf).

    The rank window is keyed by doc_id — no global window anywhere —
    and ranks the ROUNDED score so the per-doc cut can't flip on
    cross-engine float noise.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens(docs)
    tf = toks.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )
    # document frequency FROM the tf aggregate: tf rows are unique per
    # (doc, term), so df is a plain count — this reuses the postings
    # shuffle instead of running a second countDistinct pass over the
    # raw exploded tokens (at 100 TB that pass is a full extra shuffle)
    dfreq = tf.groupBy("tok").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    )
    n = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    scored = (
        tf.join(dfreq, "tok")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "tok",
            _round6(
                F.col("tf")
                * F.log((1 + F.col("n_docs")) / (1 + F.col("df")))
            ).alias("tfidf"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "tok")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .drop("rk")
        .orderBy("doc_id", F.desc("tfidf"), "tok")
    )
