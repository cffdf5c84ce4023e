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


def test_rrf_fuses_both_rankings(spark, sf_dir):
    """RRF sanity: every fused score is the sum of its reciprocal-rank
    contributions, a doc present in BOTH top lists outranks one with a
    comparable single-list rank, and scores are in (0, 2/61]."""
    from pgsink_spark.operators.retrieval import retrieval_rrf

    rows = retrieval_rrf(spark, sf_dir).collect()
    assert len(rows) == 10
    scores = [r["rrf"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(0 < s <= round(2 / 61, 6) + 1e-9 for s in scores)


def test_rrf_deterministic(spark, sf_dir):
    from pgsink_spark.operators.retrieval import retrieval_rrf

    a = [tuple(r) for r in retrieval_rrf(spark, sf_dir).collect()]
    b = [tuple(r) for r in retrieval_rrf(spark, sf_dir).collect()]
    assert a == b


def test_kn_bigram_probabilities_well_formed(spark, sf_dir):
    """Kneser-Ney output: counts descend, every probability is in
    (0, 1], and the discounted term never exceeds the raw MLE."""
    from pgsink_spark.operators.retrieval import text_kn_bigram

    rows = text_kn_bigram(spark, sf_dir).collect()
    assert len(rows) == 20
    cnts = [r["cnt"] for r in rows]
    assert cnts == sorted(cnts, reverse=True)
    assert all(0 < r["p_kn"] <= 1 for r in rows)


def test_dsir_importance_favors_target_language(spark, sf_dir):
    """The DSIR point: documents in the target language (en) must
    average a higher importance log-weight than the rest."""
    from pgsink_spark.operators.corpus import dsir_importance
    from pgsink_spark.sources.fixtures import load_table

    w = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_importance(spark, sf_dir).collect()
    }
    langs = {
        r["doc_id"]: r["lang"]
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "lang")
        .collect()
    }
    en = [w[d] for d, lg in langs.items() if lg == "en"]
    rest = [w[d] for d, lg in langs.items() if lg != "en"]
    assert sum(en) / len(en) > sum(rest) / len(rest)


def test_gaps_islands_matches_python_recompute(spark, sf_dir):
    """Cross-check the island arithmetic against a direct Python
    recomputation for every user."""
    import datetime

    from pgsink_spark.operators.relational import d64_gaps_islands
    from pgsink_spark.sources.fixtures import load_table
    from pyspark.sql import functions as F

    got = {
        r["user_id"]: (r["n_streaks"], r["longest_streak"])
        for r in d64_gaps_islands(spark, sf_dir).collect()
    }
    days_rows = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.col("ts").cast("date").alias("day"))
        .distinct()
        .collect()
    )
    per_user: dict[int, list[datetime.date]] = {}
    for r in days_rows:
        per_user.setdefault(r["user_id"], []).append(r["day"])
    for uid, days in per_user.items():
        days.sort()
        streaks, cur = [], 1
        for a, b in zip(days, days[1:]):
            if (b - a).days == 1:
                cur += 1
            else:
                streaks.append(cur)
                cur = 1
        streaks.append(cur)
        assert got[uid] == (len(streaks), max(streaks)), uid


def test_mrr_matches_python_replay(spark, sf_dir):
    """retrieval_mrr equals a plain-Python BM25 replay: per term, rank
    by rounded score (doc_id ties), find the first doc with tf >= 2 in
    the top-10, and fold integer reciprocal micro-ranks."""
    import math

    from pgsink_spark.operators.retrieval import (
        B,
        K1,
        MRR_K,
        MRR_REL_TF,
        MRR_TERMS,
        retrieval_mrr,
    )
    from pgsink_spark.sources.fixtures import load_table

    docs = [
        (r.doc_id, r.text.lower().split(" "))
        for r in load_table(spark, sf_dir, "documents").collect()
    ]
    n = float(len(docs))
    avgdl = sum(len(w) for _, w in docs) / n
    total = 0
    hits = 0
    for t in MRR_TERMS:
        tfs = {d: w.count(t) for d, w in docs if t in w}
        df = float(len(tfs))
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        dls = {d: len(w) for d, w in docs}
        scored = sorted(
            (
                (
                    -round(
                        idf
                        * tf
                        * (K1 + 1)
                        / (tf + K1 * (1 - B + B * dls[d] / avgdl)),
                        6,
                    ),
                    d,
                    tf,
                )
                for d, tf in tfs.items()
            ),
        )[:MRR_K]
        for rank, (_, _, tf) in enumerate(scored, start=1):
            if tf >= MRR_REL_TF:
                total += 1_000_000 // rank
                hits += 1
                break
    expect = (len(MRR_TERMS), hits, total // len(MRR_TERMS))
    row = retrieval_mrr(spark, sf_dir).collect()[0]
    assert (row.n_queries, row.n_hit, row.mrr_ppm) == expect


def test_fuzzy_match_matches_python_replay(spark, sf_dir):
    """retrieval_fuzzy_match equals a pure-Python edit-distance
    expansion + token count; every typo'd term matches at least its
    intended word."""
    from collections import Counter, defaultdict

    from pgsink_spark.operators.retrieval import (
        FUZZY_MAX_DIST,
        FUZZY_TERMS,
        FUZZY_TOPK,
        retrieval_fuzzy_match,
    )
    from pgsink_spark.sources.fixtures import load_table

    def lev(a: str, b: str) -> int:
        if abs(len(a) - len(b)) > FUZZY_MAX_DIST:
            return FUZZY_MAX_DIST + 1
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(
                        prev[j] + 1,
                        cur[j - 1] + 1,
                        prev[j - 1] + (ca != cb),
                    )
                )
            prev = cur
        return prev[-1]

    rows = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    )
    tok_count = defaultdict(Counter)  # doc -> word -> count
    vocab = set()
    for r in rows:
        ws = r["text"].lower().split(" ")
        vocab.update(ws)
        tok_count[r["doc_id"]].update(ws)
    expect = {}
    for term in FUZZY_TERMS:
        matched = {w for w in vocab if lev(term, w) <= FUZZY_MAX_DIST}
        assert matched, term
        hits = [
            (d, sum(c[w] for w in matched))
            for d, c in tok_count.items()
            if any(c[w] for w in matched)
        ]
        hits.sort(key=lambda t: (-t[1], t[0]))
        expect[term] = hits[:FUZZY_TOPK]
    got = defaultdict(list)
    for r in retrieval_fuzzy_match(spark, sf_dir).collect():
        got[r["term"]].append((r["doc_id"], r["n_hits"]))
    assert dict(got) == expect


def test_snippet_extract_matches_python_replay(spark, sf_dir):
    """retrieval_snippet_extract equals a pure-Python first-occurrence
    window extraction with the same clamping."""
    from pgsink_spark.operators.retrieval import (
        SNIPPET_LIMIT,
        SNIPPET_RADIUS,
        SNIPPET_TERM,
        retrieval_snippet_extract,
    )
    from pgsink_spark.sources.fixtures import load_table

    rows = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    )
    expect = []
    for r in sorted(rows, key=lambda x: x["doc_id"]):
        ws = r["text"].lower().split(" ")
        if SNIPPET_TERM in ws:
            p = ws.index(SNIPPET_TERM) + 1  # 1-based
            lo = max(p - SNIPPET_RADIUS, 1)
            snippet = " ".join(ws[lo - 1 : p + SNIPPET_RADIUS])
            expect.append((r["doc_id"], p, snippet))
        if len(expect) == SNIPPET_LIMIT:
            break
    got = [
        (r["doc_id"], r["first_pos"], r["snippet"])
        for r in retrieval_snippet_extract(spark, sf_dir).collect()
    ]
    assert got == expect
    assert got, "query term must occur in the fixture"


def test_term_proximity_matches_python_replay(spark, sf_dir):
    """retrieval_term_proximity equals a brute-force min-pair-distance
    scan in pure Python (all occurrence pairs — no shortcut)."""
    from pgsink_spark.operators.retrieval import (
        PROX_LIMIT,
        PROX_TERM_A,
        PROX_TERM_B,
        retrieval_term_proximity,
    )
    from pgsink_spark.sources.fixtures import load_table

    rows = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    )
    cand = []
    for r in rows:
        ws = r["text"].lower().split(" ")
        pa = [i + 1 for i, w in enumerate(ws) if w == PROX_TERM_A]
        pb = [i + 1 for i, w in enumerate(ws) if w == PROX_TERM_B]
        if pa and pb:
            md = min(abs(a - b) for a in pa for b in pb)
            cand.append((md, r["doc_id"], len(pa), len(pb)))
    cand.sort()
    expect = [
        (d, na, nb, md) for md, d, na, nb in cand[:PROX_LIMIT]
    ]
    got = [
        (r["doc_id"], r["n_a"], r["n_b"], r["min_dist"])
        for r in retrieval_term_proximity(spark, sf_dir).collect()
    ]
    assert got == expect
    assert got, "both terms must co-occur in the fixture"
