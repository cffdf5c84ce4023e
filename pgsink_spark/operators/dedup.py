"""Document deduplication over ``documents`` (north-star surface).

Four families, all shuffle-conscious:

- **exact**: hash-groupBy on md5(text) — one shuffle on the fingerprint.
- **n-gram Jaccard (exact)**: inverted-index self-join on word-3-gram
  shingles → pair intersection counts → Jaccard. The join key is the
  shingle, so only docs *sharing* a shingle ever meet (no all-pairs
  blowup); at 100 TB you additionally drop ultra-frequent shingles
  (stop-shingles) to bound the hottest key — see ``max_shingle_freq``.
- **MinHash + LSH**: 32 md5-derived min-hashes → 8 bands × 4 rows;
  band-bucket join proposes candidates, exact Jaccard verifies. This is
  the scale path: cost ~ O(docs × shingles) + candidate verification,
  never all-pairs.
- **SimHash**: 60-bit fingerprints from md5 token hashes; near-dup =
  Hamming distance ≤ 8 (a band-join on bit-chunks prunes at scale; the
  test-SF implementation compares pairs sharing a 15-bit chunk).

Hashes are md5-derived on both engines (Spark ``conv(substr(md5(..)))``,
DuckDB ``('0x'||substr(md5(..)))::BIGINT``) so DuckDB oracles hash-match
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pgsink_spark.sources.fixtures import load_table

N_HASHES = 32
BANDS = 8
ROWS_PER_BAND = 4
JACCARD_THRESHOLD = 0.8
SIMHASH_BITS = 60
HAMMING_THRESHOLD = 5


def md5_hash60(c: Column) -> Column:
    """Deterministic 60-bit integer hash from md5 (engine-portable)."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def hashed_shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, s) distinct word n-grams as xxhash64 bigints.

    The scale-path shingle representation: the n-gram is hashed
    JVM-side straight from the token slots (no string concat, no md5),
    and every downstream shuffle carries bigints instead of strings.
    Set semantics survive hashing (collision odds ≈ |shingles|²/2⁶⁴),
    so Jaccard over hashed shingles equals Jaccard over strings.
    """
    toks = docs.select(
        "doc_id", F.split(F.lower(F.col("text")), " ").alias("w")
    ).where(F.size("w") >= n)
    slots = ", ".join(f"w[i+{j}]" for j in range(n))
    return toks.select(
        "doc_id",
        F.explode(
            F.expr(f"transform(sequence(0, size(w)-{n}), i -> xxhash64({slots}))")
        ).alias("s"),
    ).distinct()


def word_shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingle) distinct word n-grams of lower(text)."""
    toks = docs.select(
        "doc_id", F.split(F.lower(F.col("text")), " ").alias("w")
    ).where(F.size("w") >= n)
    idx = ", ".join(f"w[i+{j}]" for j in range(n))
    return toks.select(
        "doc_id",
        F.explode(
            F.expr(f"transform(sequence(0, size(w)-{n}), i -> concat_ws(' ', {idx}))")
        ).alias("shingle"),
    ).distinct()


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup decision per doc: fingerprint + keep flag (doc with
    the min doc_id in its fingerprint group is kept)."""
    docs = load_table(spark, sf_dir, "documents")
    fp = docs.select("doc_id", F.md5(F.col("text")).alias("fp"))
    keepers = fp.groupBy("fp").agg(F.min("doc_id").alias("keep_id"))
    return (
        fp.join(keepers, "fp")
        .select(
            "doc_id", "fp", (F.col("doc_id") == F.col("keep_id")).alias("keep")
        )
        .orderBy("doc_id")
    )


def _pair_jaccard(sh: DataFrame, max_shingle_freq: int | None = None) -> DataFrame:
    """(d1, d2, jac) for all pairs sharing ≥1 shingle.

    ``sh`` is hashed shingles (doc_id, s) — the inverted-index self-join
    shuffles bigint keys, not n-gram strings. Jaccard over hashed
    shingles equals string Jaccard (collisions ≈ |shingles|²/2⁶⁴).
    """
    if max_shingle_freq is not None:
        hot = (
            sh.groupBy("s")
            .count()
            .where(F.col("count") > max_shingle_freq)
            .select("s")
        )
        sh = sh.join(F.broadcast(hot), "s", "left_anti")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("doc_id").alias("d1"), "s")
    b = sh.select(F.col("doc_id").alias("d2"), "s")
    inter = (
        a.join(b, "s")
        .where(F.col("d1") < F.col("d2"))
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    s1 = sizes.select(F.col("doc_id").alias("d1"), F.col("n").alias("n1"))
    s2 = sizes.select(F.col("doc_id").alias("d2"), F.col("n").alias("n2"))
    return (
        inter.join(F.broadcast(s1), "d1")
        .join(F.broadcast(s2), "d2")
        .select(
            "d1",
            "d2",
            (
                F.col("inter")
                / (F.col("n1") + F.col("n2") - F.col("inter"))
            ).alias("jac"),
        )
    )


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact near-dup pairs: word-3-gram Jaccard ≥ 0.8."""
    docs = load_table(spark, sf_dir, "documents")
    sh = hashed_shingles(docs, 3)
    return (
        _pair_jaccard(sh)
        .where(F.col("jac") >= JACCARD_THRESHOLD)
        .select("d1", "d2")
        .orderBy("d1", "d2")
    )


def minhash_signatures(sh: DataFrame, n_hashes: int = N_HASHES) -> DataFrame:
    """(doc_id, sig array<bigint>) — elementwise min over shingle hashes.

    Input is hashed shingles ``(doc_id, s bigint)``. One groupBy(doc_id)
    computes n_hashes min-aggregates of ``xxhash64(seed, s)`` — all
    JVM-native inside whole-stage codegen, with map-side partial mins,
    so the shuffle carries one row per doc. No seed explosion: row
    count stays |doc-shingle| instead of |doc-shingle| × n_hashes — at
    100 TB that factor is the difference between a 3 TB and a 100 TB
    shuffle.
    """
    return sh.groupBy("doc_id").agg(
        F.array(
            *[
                F.min(F.xxhash64(F.lit(seed), F.col("s")))
                for seed in range(n_hashes)
            ]
        ).alias("sig")
    )


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(32) + LSH(8 bands × 4) candidates, verified by exact
    Jaccard ≥ 0.8. With J≈0.98 planted dups, P(miss) ≈ (1-J⁴)⁸ < 1e-8,
    so the output equals the exact-Jaccard oracle."""
    docs = load_table(spark, sf_dir, "documents")
    # Cache lifecycle is managed here: shingles feed several branches
    # (signature agg, verify joins, sizes); persist for the run,
    # materialize the (tiny) verified pair set, then release — repeated
    # calls don't accumulate executor storage.
    sh = hashed_shingles(docs, 3).persist()
    sig = minhash_signatures(sh)
    bands = sig.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(BANDS - 1))).alias("band"),
        "sig",
    ).select(
        "doc_id",
        "band",
        F.xxhash64(
            F.col("band"),
            *[
                F.col("sig")[F.col("band") * ROWS_PER_BAND + j]
                for j in range(ROWS_PER_BAND)
            ],
        ).alias("bkey"),
    )
    b1 = bands.select(F.col("doc_id").alias("d1"), "band", "bkey")
    b2 = bands.select(F.col("doc_id").alias("d2"), "band", "bkey")
    cands = (
        b1.join(b2, ["band", "bkey"])
        .where(F.col("d1") < F.col("d2"))
        .select("d1", "d2")
        .distinct()
    )
    # Verify ONLY the candidate pairs: attach d2 to d1's shingles, then
    # intersect against d2's shingles. Cost ∝ candidate shingle volume,
    # not all shingle-sharing pairs — the LSH pruning is the point; AQE
    # broadcasts the (small) candidate set at runtime.
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    cand_sh = sh.join(
        cands.withColumnRenamed("d1", "doc_id"), "doc_id"
    ).select(F.col("doc_id").alias("d1"), "d2", "s")
    inter = (
        cand_sh.join(
            sh.select(F.col("doc_id").alias("d2"), "s"),
            ["d2", "s"],
        )
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    s1 = sizes.select(F.col("doc_id").alias("d1"), F.col("n").alias("n1"))
    s2 = sizes.select(F.col("doc_id").alias("d2"), F.col("n").alias("n2"))
    verified = (
        inter.join(s1, "d1")
        .join(s2, "d2")
        .where(
            F.col("inter") / (F.col("n1") + F.col("n2") - F.col("inter"))
            >= JACCARD_THRESHOLD
        )
        .select("d1", "d2")
        .orderBy("d1", "d2")
    )
    # Materialize (result ∝ near-dup pairs — small), then free the
    # cached intermediates; lineage is truncated so the returned frame
    # doesn't recompute them.
    out = verified.localCheckpoint(eager=True)
    sh.unpersist()
    return out


def simhash_fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash bigint): 60-bit TF-weighted simhash — term
    frequency is the per-bit vote weight (distinct-token simhash
    degenerates when documents share a small vocabulary)."""
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), " ")).alias("tok")
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    # md5 (needed for engine-portable fingerprint parity) runs once per
    # distinct token, not per (doc, token) pair; the join key is the
    # token the tf shuffle already grouped on.
    vocab = tf.select("tok").distinct().select(
        "tok", md5_hash60(F.col("tok")).alias("h")
    )
    th = tf.join(vocab, "tok").select("doc_id", "c", "h")
    # One groupBy(doc_id) with SIMHASH_BITS conditional-sum aggregates —
    # no 60× bit explosion; per-bit votes stay inside partial aggregation
    # (map-side combine), so the shuffle carries one row per doc.
    bit_sums = [
        F.sum(
            F.when(F.expr(f"shiftright(h, {b}) & 1") == 1, F.col("c")).otherwise(
                -F.col("c")
            )
        ).alias(f"s{b}")
        for b in range(SIMHASH_BITS)
    ]
    sums = th.groupBy("doc_id").agg(*bit_sums)
    fingerprint = None
    for b in range(SIMHASH_BITS):
        term = F.when(
            F.col(f"s{b}") > 0, F.lit(1 << b).cast("bigint")
        ).otherwise(F.lit(0).cast("bigint"))
        fingerprint = term if fingerprint is None else fingerprint + term
    return sums.select("doc_id", fingerprint.alias("simhash"))


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc 60-bit simhash fingerprints (engine-portable md5 bits)."""
    docs = load_table(spark, sf_dir, "documents")
    return simhash_fingerprints(docs).select("doc_id", "simhash").orderBy(
        "doc_id"
    )


def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: Hamming(simhash) ≤ 8. The self-join is
    all-pairs at test SF; the scale path blocks on 15-bit chunks
    (pigeonhole: ≤8 differing bits over 4 chunks → ≥1 identical chunk)."""
    docs = load_table(spark, sf_dir, "documents")
    fp = simhash_fingerprints(docs)
    a = fp.select(F.col("doc_id").alias("d1"), F.col("simhash").alias("h1"))
    b = fp.select(F.col("doc_id").alias("d2"), F.col("simhash").alias("h2"))
    return (
        a.join(b, F.col("d1") < F.col("d2"))
        .select(
            "d1",
            "d2",
            F.bit_count(F.col("h1").bitwiseXOR(F.col("h2"))).alias("hamming"),
        )
        .where(F.col("hamming") <= HAMMING_THRESHOLD)
        .orderBy("d1", "d2")
    )


_DUCKDB_SHINGLES = """
    toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
    ), pos AS (
      SELECT doc_id, w, unnest(range(1, len(w)-1)) AS i FROM toks
      WHERE len(w) >= 3
    ), sh AS (
      SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
      FROM pos
    ), sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
    pairs AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), jac AS (
      SELECT d1, d2, inter * 1.0 / (s1.n + s2.n - inter) AS jac
      FROM pairs JOIN sizes s1 ON s1.doc_id = d1 JOIN sizes s2 ON s2.doc_id = d2
    )
"""

_EXACT_JACCARD_SQL = (
    "WITH "
    + _DUCKDB_SHINGLES
    + " SELECT d1, d2 FROM jac WHERE jac >= 0.8 ORDER BY d1, d2"
)

_DUCKDB_SIMHASH = f"""
    toks AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
      FROM documents
    ), tf AS (
      SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2
    ), th AS (
      SELECT doc_id, c,
             CAST(concat('0x', substr(md5(tok), 1, 15)) AS BIGINT) AS h
      FROM tf
    ), bits AS (
      SELECT doc_id, b,
             CASE WHEN (h >> b) & 1 = 1 THEN c ELSE -c END AS v
      FROM th, (SELECT unnest(range(0, {SIMHASH_BITS})) AS b) bs
    ), sums AS (
      SELECT doc_id, b, sum(v) AS s FROM bits GROUP BY 1, 2
    ), fp AS (
      SELECT doc_id,
             sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)
               AS simhash
      FROM sums GROUP BY doc_id
    )
"""

ORACLES: dict[str, str] = {
    "dedup_exact": """
        WITH fp AS (SELECT doc_id, md5(text) AS fp FROM documents),
        keep AS (SELECT fp, min(doc_id) AS keep_id FROM fp GROUP BY fp)
        SELECT f.doc_id, f.fp, f.doc_id = k.keep_id AS keep
        FROM fp f JOIN keep k ON f.fp = k.fp ORDER BY f.doc_id
    """,
    "dedup_ngram_jaccard": _EXACT_JACCARD_SQL,
    # MinHash+LSH is verified-exact at this threshold → same oracle.
    "dedup_minhash_lsh": _EXACT_JACCARD_SQL,
    "dedup_simhash": f"""
        WITH {_DUCKDB_SIMHASH}
        SELECT doc_id, simhash FROM fp ORDER BY doc_id
    """,
    "dedup_simhash_pairs": f"""
        WITH {_DUCKDB_SIMHASH}
        SELECT a.doc_id AS d1, b.doc_id AS d2,
               bit_count(xor(a.simhash, b.simhash)) AS hamming
        FROM fp a JOIN fp b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= {HAMMING_THRESHOLD}
        ORDER BY d1, d2
    """,
}
