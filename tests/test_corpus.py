"""Corpus-level curation operators (operators/corpus.py).

Oracle parity for the three queries is covered by the parametrized
test_oracle_corpus suite; these tests pin the operator-specific
invariants the oracle alone doesn't show.
"""

from __future__ import annotations

import pytest
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


def test_k_anonymity_invariants(spark, sf_dir):
    """Every released (non-suppressed) quasi-class has >= k members;
    every suppressed row has ALL quasi-identifiers nulled; class sizes
    are consistent with the suppression flag."""
    from pgsink_spark.operators.privacy import K_ANON, privacy_k_anonymity

    rows = privacy_k_anonymity(spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r["suppressed"]:
            assert r["grp_n"] < K_ANON
            assert r["nation"] is None
            assert r["segment"] is None
            assert r["bal_band"] is None
        else:
            assert r["grp_n"] >= K_ANON
            assert r["nation"] is not None
            assert r["segment"] is not None
            assert r["bal_band"] is not None
    from collections import Counter

    released = Counter(
        (r["nation"], r["segment"], r["bal_band"])
        for r in rows
        if not r["suppressed"]
    )
    assert all(n >= K_ANON for n in released.values())


def test_mixture_reweight_identities(spark, sf_dir):
    """Weights move the mixture to uniform: tokens_s * weight_s ~= T/k
    for every source (exact up to the two floor divisions), and the
    ppm shares sum to 1e6 within k floors."""
    from pgsink_spark.operators.corpus import (
        MIX_SCALE,
        corpus_mixture_reweight,
    )

    rows = corpus_mixture_reweight(spark, sf_dir).collect()
    assert rows
    total = sum(r["tokens"] for r in rows)
    k = len(rows)
    assert total - k <= sum(r["share_ppm"] for r in rows) * total / MIX_SCALE
    for r in rows:
        reweighted = r["tokens"] * r["weight_scaled"] / MIX_SCALE
        target = total / k
        # floor error bound: one unit of the scaled weight is
        # tokens / MIX_SCALE tokens
        assert abs(reweighted - target) <= r["tokens"] / MIX_SCALE + 1


def test_bpe_pairs_match_bruteforce(spark, sf_dir):
    """text_bpe_pairs equals a plain-Python recount over the collected
    corpus (top-20 with the same tie order)."""
    from collections import Counter

    from pgsink_spark.operators.text import text_bpe_pairs
    from pgsink_spark.sources.fixtures import load_table

    texts = [
        r["text"]
        for r in load_table(spark, sf_dir, "documents").collect()
    ]
    counts = Counter()
    for t in texts:
        for w in t.lower().split(" "):
            if len(w) >= 2:
                for i in range(len(w) - 1):
                    counts[w[i : i + 2]] += 1
    expected = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [
        (r["pair"], r["cnt"]) for r in text_bpe_pairs(spark, sf_dir).collect()
    ]
    assert got == expected


def test_subword_encode_bounds_and_greedy_parity(spark, sf_dir):
    """Per-doc token counts sit between word count (every word 1 token
    floor) and character count (char-by-char ceiling); and the UDF's
    greedy loop agrees with a direct Python reimplementation on every
    distinct word."""
    from pgsink_spark.operators.text import text_subword_encode
    from pgsink_spark.sources.fixtures import load_table
    from pyspark.sql import functions as F

    rows = text_subword_encode(spark, sf_dir).collect()
    assert rows
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    for r in rows:
        words = [w for w in docs[r["doc_id"]].lower().split(" ") if w]
        assert r["n_words"] == len(words)
        assert r["n_words"] <= r["n_tokens"] <= sum(len(w) for w in words)


def test_dp_counts_noise_bounded_and_reproducible(spark, sf_dir):
    """Released counts differ from true counts by at most DP_MAX_MAG,
    never go negative, and the seeded mechanism is reproducible."""
    from pgsink_spark.operators.privacy import DP_MAX_MAG, privacy_dp_counts
    from pgsink_spark.sources.fixtures import load_table
    from pyspark.sql import functions as F

    released = {
        (r["nation"], r["segment"]): r["noisy_count"]
        for r in privacy_dp_counts(spark, sf_dir).collect()
    }
    again = {
        (r["nation"], r["segment"]): r["noisy_count"]
        for r in privacy_dp_counts(spark, sf_dir).collect()
    }
    assert released == again
    true = {
        (r["c_nationkey"], r["c_mktsegment"]): r["n"]
        for r in load_table(spark, sf_dir, "customer")
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(released) == set(true)
    assert any(released[k] != true[k] for k in true)  # noise actually fires
    for k, v in released.items():
        assert v >= 0
        assert abs(v - true[k]) <= DP_MAX_MAG


def test_cusum_resets_and_thresholds(spark, sf_dir):
    """Every emitted CUSUM alarm strictly exceeds the decision
    threshold, and replaying each user's stream in Python reproduces
    the flagged event ids exactly."""
    from pgsink_spark.operators.relational import (
        CUSUM_H,
        CUSUM_K,
        QUERIES,
    )
    from pgsink_spark.sources.fixtures import load_table

    rows = QUERIES["d74_cusum_changepoints"](spark, sf_dir).collect()
    assert rows
    assert all(r["s"] > CUSUM_H for r in rows)

    ev = sorted(
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "value")
        .collect(),
        key=lambda r: (r["user_id"], r["ts"], r["event_id"]),
    )
    expected = []
    state = {}
    for r in ev:
        s = state.get(r["user_id"], 0.0)
        s = max(0.0, s + r["value"] - CUSUM_K)
        if s > CUSUM_H:
            expected.append((r["user_id"], r["event_id"]))
            s = 0.0
        state[r["user_id"]] = s
    got = [(r["user_id"], r["event_id"]) for r in rows]
    assert sorted(got) == sorted(expected)


def test_zipf_audit_recovers_power_law(spark):
    """A corpus built with an exact freq = floor(600/rank) power law
    must regress to slope ~ -1 with near-perfect fit; a flat
    (templated) corpus must regress flatter. Falsifies the estimator,
    not just its plumbing."""
    import pgsink_spark.operators.text as text_ops

    words = []
    for rank in range(1, 41):
        words += [f"tok{rank:03d}"] * (600 // rank)
    docs = [(1, " ".join(words), "en", "s", 0)]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    )
    orig = text_ops.load_table
    try:
        text_ops.load_table = lambda s, d, t: df
        row = text_ops.text_zipf_audit(spark, "unused").collect()[0]
        flat_df = spark.createDataFrame(
            [(1, " ".join([f"tok{i:03d}" for i in range(40)] * 10), "en", "s", 0)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        text_ops.load_table = lambda s, d, t: flat_df
        flat = text_ops.text_zipf_audit(spark, "unused").collect()[0]
    finally:
        text_ops.load_table = orig
    assert row.n_terms == 40
    assert -1.1 < row.zipf_slope < -0.9
    assert row.r2 > 0.98
    assert flat.zipf_slope > -0.05  # uniform corpus: no decay


def test_domain_cap_bounds_and_determinism(spark, sf_dir):
    from pgsink_spark.operators.sampling import DOMAIN_HARD_CAP, sample_domain_cap

    out = sample_domain_cap(spark, sf_dir)
    rows = out.collect()
    per = {}
    for r in rows:
        per[r.source] = per.get(r.source, 0) + 1
        assert 1 <= r.rk <= DOMAIN_HARD_CAP
    assert all(c <= DOMAIN_HARD_CAP for c in per.values())
    # deterministic: identical selection on re-run
    assert sorted((r.doc_id, r.source) for r in rows) == sorted(
        (r.doc_id, r.source) for r in sample_domain_cap(spark, sf_dir).collect()
    )
    # the md5 order must NOT be the trivial doc_id order (no
    # first-N-encountered bias): at least one source keeps a doc that a
    # plain doc_id-ascending cut would have dropped
    import duckdb

    trivial = set(
        (d, s)
        for d, s in duckdb.sql(
            f"""
            SELECT doc_id, source FROM (
              SELECT doc_id, source, row_number() OVER (
                PARTITION BY source ORDER BY doc_id) AS rk
              FROM '{sf_dir}/documents.parquet') WHERE rk <= {DOMAIN_HARD_CAP}
            """
        ).fetchall()
    )
    assert set((r.doc_id, r.source) for r in rows) != trivial


def test_t_closeness_closed_form(spark):
    """One QI class mirrors the global distribution exactly (tvd 0);
    another is fully concentrated on one band — tvd must equal
    1 - p_global(band), which also proves absent bands contribute."""
    import pgsink_spark.operators.privacy as priv

    # global: band 0 x30, band 1 x30, band 2 x40  (per mirrored class);
    # class (2, 'C') is 20 rows all band 0.
    rows = []
    k = 0
    for nation, seg in ((0, "A"), (1, "B")):
        for band, n in ((0, 30), (1, 30), (2, 40)):
            for _ in range(n):
                rows.append((k, nation, seg, band * 1000.0))
                k += 1
    for _ in range(20):
        rows.append((k, 2, "C", 0.0))
        k += 1
    df = spark.createDataFrame(
        rows, "c_custkey long, c_nationkey int, c_mktsegment string, c_acctbal double"
    )
    orig = priv.load_table
    try:
        priv.load_table = lambda s, d, t: df
        out = {
            (r.nation, r.segment): r
            for r in priv.privacy_t_closeness(spark, "unused").collect()
        }
    finally:
        priv.load_table = orig
    n = 220.0
    p0, p1, p2 = 80 / n, 60 / n, 80 / n
    # mirrored classes: |30/100-p0|+|30/100-p1|+|40/100-p2| over 2
    exp_mirror = round((abs(0.3 - p0) + abs(0.3 - p1) + abs(0.4 - p2)) / 2, 6)
    assert abs(out[(0, "A")].tvd - exp_mirror) < 1e-9
    # concentrated class: (|1-p0| + p1 + p2)/2 — the p1+p2 terms exist
    # only because absent bands are counted
    exp_conc = round((abs(1.0 - p0) + p1 + p2) / 2, 6)
    assert abs(out[(2, "C")].tvd - exp_conc) < 1e-9
    assert not out[(2, "C")].close


def test_quantile_filter_is_source_relative(spark):
    """A mediocre doc in a weak source survives while a better doc
    drowning in a strong source is cut — the property an absolute
    threshold cannot have."""
    import pgsink_spark.operators.curation as cur

    long_doc = "the quick brown fox jumps over the lazy dog " * 30
    rows = []
    # strong source: 10 long, high-quality docs
    for i in range(10):
        rows.append((i, long_doc + f"suffix{i}", "en", "strong", 0))
    # weak source: 9 tiny docs + 1 medium doc (id 19)
    for i in range(10, 19):
        rows.append((i, f"x{i}", "en", "weak", 0))
    rows.append((19, "a modest but real sentence with several words", "en", "weak", 0))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    orig = cur.load_table
    try:
        cur.load_table = lambda s, d, t: df
        out = {r.doc_id: r for r in cur.curation_quantile_filter(spark, "unused").collect()}
    finally:
        cur.load_table = orig
    assert out[19].kept  # best of the weak source
    strong = [out[i] for i in range(10)]
    cut = [r for r in strong if not r.kept]
    assert cut  # bottom of the strong source is cut
    assert all(r.q > out[19].q for r in cut)  # despite higher absolute quality


def test_asof_tolerance_matches_bruteforce(spark, sf_dir):
    """d80 equals a per-purchase brute-force nearest-click scan with
    the same tie ladder (backward beats forward at equal distance,
    same-ts ties to max backward / min forward id)."""
    from pgsink_spark.operators.relational import ASOF_TOL_US, QUERIES
    from pgsink_spark.sources.fixtures import load_table

    ev = load_table(spark, sf_dir, "events").collect()
    clicks = {}
    purchases = []
    for r in ev:
        us = int(r.ts.timestamp() * 1_000_000)
        if r.event_type == "click":
            clicks.setdefault(r.user_id, []).append((us, r.event_id))
        elif r.event_type == "purchase":
            purchases.append((r.event_id, r.user_id, us))
    expected = {}
    for pid, uid, pus in purchases:
        before = [(us, cid) for us, cid in clicks.get(uid, []) if us <= pus]
        after = [(us, cid) for us, cid in clicks.get(uid, []) if us > pus]
        b = max(before) if before else None  # max (us, cid)
        a = min(after) if after else None  # min (us, cid)
        b_ok = b is not None and pus - b[0] <= ASOF_TOL_US
        a_ok = a is not None and a[0] - pus <= ASOF_TOL_US
        if b_ok and (not a_ok or pus - b[0] <= a[0] - pus):
            expected[pid] = (b[1], pus - b[0])
        elif a_ok:
            expected[pid] = (a[1], -(a[0] - pus))
        else:
            expected[pid] = (None, None)
    got = {
        r.purchase_id: (r.click_id, r.diff_us)
        for r in QUERIES["d80_asof_tolerance"](spark, sf_dir).collect()
    }
    assert got == expected
    assert any(v[0] is not None for v in got.values())
    assert any(v[0] is None for v in got.values()) or len(got) < 50


def test_cms_never_underestimates_synthetic(spark):
    """CMS property on an adversarial synthetic: every estimate >= the
    true count even with forced bucket collisions (width 2048, 500
    distinct keys), and the fixture gate booleans hold."""
    import pgsink_spark.operators.relational as rel

    rows = [(k,) for k in range(500) for _ in range(1 + k % 7)]
    df = spark.createDataFrame(rows, "o_custkey long")
    orig = rel.load_table
    try:
        rel.load_table = lambda s, d, t: df
        out = rel.QUERIES["d81_cms_heavy_hitters"](spark, "unused").collect()[0]
    finally:
        rel.load_table = orig
    n_total = sum(1 + k % 7 for k in range(500))
    thresh = 0.001 * n_total
    assert out.n_heavy == sum(1 for k in range(500) if 1 + k % 7 > thresh)
    assert out.no_underestimate and out.within_bound


def test_bpe_learn_matches_bruteforce(spark, sf_dir):
    """The 3 learned merges equal a plain-Python textbook-BPE replay
    (freq-weighted pair census, lexicographic ties, left-to-right
    greedy re-symbolization) over the collected corpus."""
    from collections import Counter

    from pgsink_spark.operators.text import BPE_LEARN_ROUNDS, text_bpe_learn
    from pgsink_spark.sources.fixtures import load_table

    freqs = Counter()
    for r in load_table(spark, sf_dir, "documents").collect():
        for w in r["text"].lower().split(" "):
            if w:
                freqs[w] += 1
    reps = {w: list(w) for w in freqs}

    expected = []
    for k in range(BPE_LEARN_ROUNDS):
        pairs = Counter()
        for w, rep in reps.items():
            for a, b in zip(rep, rep[1:]):
                pairs[(a, b)] += freqs[w]
        (x, y), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        expected.append((k, x, y, cnt))
        for w, rep in reps.items():
            out = []
            for s in rep:
                if out and out[-1] == x and s == y:
                    out[-1] = x + y
                else:
                    out.append(s)
            reps[w] = out

    got = [
        (r["rank"], r["left_sym"], r["right_sym"], r["cnt"])
        for r in text_bpe_learn(spark, sf_dir).collect()
    ]
    assert got == expected


def test_kcenter_matches_bruteforce_and_radii_decrease(spark, sf_dir):
    """Greedy farthest-point replay in plain Python (same strict
    left-fold float64 arithmetic) picks the same centers, and the
    coverage radius at selection is non-increasing."""
    from pgsink_spark.operators.similarity import KCENTER_K, diversity_kcenter
    from pgsink_spark.sources.fixtures import load_table

    vecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }

    def dist2(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + (x - y) * (x - y)
        return acc

    seed = min(vecs)
    picks = [seed]
    md = {i: dist2(v, vecs[seed]) for i, v in vecs.items()}
    radii = [0.0]
    for _ in range(1, KCENTER_K):
        nxt = min(md, key=lambda i: (-md[i], i))
        radii.append(md[nxt])
        picks.append(nxt)
        for i, v in vecs.items():
            d = dist2(v, vecs[nxt])
            if d < md[i]:
                md[i] = d

    rows = diversity_kcenter(spark, sf_dir).collect()
    assert [r["vec_id"] for r in rows] == picks
    got_d2 = [r["d2"] for r in rows]
    assert all(got_d2[i] >= got_d2[i + 1] for i in range(1, len(got_d2) - 1))
    for mine, ref in zip(got_d2[1:], radii[1:]):
        assert abs(mine - ref) < 1e-5


def test_corr_matrix_matches_builtin_corr(spark, sf_dir):
    """d82's closed-form from exact decimal sums equals Spark's own
    F.corr (double accumulation) to 6 decimals on every pair."""
    from pyspark.sql import functions as F

    from pgsink_spark.operators import relational as rel
    from pgsink_spark.sources.fixtures import load_table

    out = {
        (r.var_x, r.var_y): r.corr
        for r in rel.QUERIES["d82_corr_matrix"](spark, sf_dir).collect()
    }
    assert len(out) == 6
    li = load_table(spark, sf_dir, "lineitem")
    for (a, b), got in out.items():
        ref = li.agg(F.corr(a, b)).collect()[0][0]
        assert abs(got - ref) < 1e-6, (a, b, got, ref)
        assert -1.0 <= got <= 1.0


def test_seq_match_against_python_re(spark, sf_dir):
    """d83 per-user match counts equal a plain-Python re.findall over
    the same (ts, event_id)-sorted event-letter sequences."""
    import re

    from pgsink_spark.operators import relational as rel
    from pgsink_spark.sources.fixtures import load_table

    got = {
        r.user_id: (r.seq_len, r.n_matches, r.first_match)
        for r in rel.QUERIES["d83_seq_match"](spark, sf_dir).collect()
    }
    rows = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    ).collect()
    seqs: dict = {}
    for r in sorted(rows, key=lambda r: (r.ts, r.event_id)):
        seqs.setdefault(r.user_id, []).append(r.event_type[0])
    pat = re.compile(rel._SEQ_PATTERN)
    for uid, chars in seqs.items():
        s = "".join(chars)
        m = pat.findall(s)
        if m:
            first = pat.search(s).group(0)
            assert got[uid] == (len(s), len(m), first), uid
        else:
            assert uid not in got
    assert set(got) == {u for u, c in seqs.items() if pat.search("".join(c))}


def test_kmv_estimates_and_mergeability(spark, sf_dir):
    """d84: the sketch estimates stay within the pinned 15% band of
    the exact censuses (the gate booleans are real, not vacuous), the
    union sketch is exactly the k smallest of the merged sketches, and
    n_both ≤ min(|sketch_a|, |sketch_b|)."""
    from pgsink_spark.operators import relational as rel

    out = rel.QUERIES["d84_kmv_setops"](spark, sf_dir).collect()[0]
    assert out.within_bound_a and out.within_bound_b and out.within_bound_union
    for est, exact in (
        (out.est_a, out.exact_a),
        (out.est_b, out.exact_b),
        (out.est_union, out.exact_union),
    ):
        assert abs(est / exact - 1.0) <= 0.15, (est, exact)
    assert 0 <= out.n_both <= rel.KMV_K
    # exact-regime check: below k the estimator IS the exact count
    if out.exact_a < rel.KMV_K:
        assert out.est_a == float(out.exact_a)


def test_bloom_join_reduce_filters_without_false_negatives(spark, sf_dir):
    """d85's Bloom pre-filter must admit EVERY true-match order (no
    false negatives — superset check) while actually reducing the fact
    scan (selectivity close to the dimension fraction plus a small FP
    margin)."""
    from pyspark.sql import functions as F

    from pgsink_spark.operators import relational as rel
    from pgsink_spark.sources.fixtures import load_table

    cust = load_table(spark, sf_dir, "customer")
    seg_keys = {
        r.c_custkey
        for r in cust.where(F.col("c_mktsegment") == rel.BLOOM_SEG)
        .select("c_custkey")
        .collect()
    }
    orders = load_table(spark, sf_dir, "orders")
    n_total = orders.count()
    n_true = orders.where(F.col("o_custkey").isin(seg_keys)).count()

    n_seg = len(seg_keys)
    n_cust = cust.count()
    out = rel.QUERIES["d85_bloom_join_reduce"](spark, sf_dir)
    got = {r.month: (r.n_orders, r.revenue) for r in out.collect()}
    exact = (
        orders.where(F.col("o_custkey").isin(seg_keys))
        .groupBy(F.date_trunc("month", "o_orderdate").alias("month"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert {r.month: r.n for r in exact} == {
        m: n for m, (n, _) in got.items()
    }, "bloom pre-filter changed the join result"
    assert n_true <= n_total * (n_seg / n_cust + 0.1) + 50

    # evaluate the probe predicate DIRECTLY: a degraded (all-ones)
    # bitset would pass the exact-join check above but fail here —
    # the filtered scan must admit every true match (no false
    # negatives) yet stay within a small false-positive margin of the
    # true count, i.e. genuinely reduce the fact scan
    filtered, _ = rel.bloom_prefiltered_orders(spark, sf_dir)
    filtered_count = filtered.count()
    fp_margin = int((n_total - n_true) * 0.05) + 10
    assert n_true <= filtered_count <= n_true + fp_margin, (
        filtered_count,
        n_true,
        fp_margin,
    )
    assert filtered_count < n_total


def test_holt_forecast_matches_python_replay_exactly(spark, sf_dir):
    """d86's fold must equal a plain-Python Holt replay BIT-EXACTLY
    (before the display rounding) — the dyadic-rational argument says
    no engine may round anywhere in the recurrence."""
    from pyspark.sql import functions as F

    from pgsink_spark.operators import relational as rel
    from pgsink_spark.sources.fixtures import load_table

    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("ts") < F.lit(rel.HOLT_CUT).cast("timestamp"))
        .select("event_type", "ts", "value")
        .collect()
    )
    daily: dict = {}
    for r in ev:
        key = (r.event_type, r.ts.date())
        daily[key] = daily.get(key, 0) + int(round(r.value * 100))
    series: dict = {}
    for (t, d), c in daily.items():
        series.setdefault(t, []).append((d, c))
    expect = {}
    for t, xs in series.items():
        xs.sort()
        l, b = float(xs[0][1]), 0.0
        for _, c in xs[1:]:
            l_new = (float(c) + l + b) / 2
            b = (l_new - l + b) / 2
            l = l_new
        expect[t] = (
            len(xs),
            round(l / 100, 4),
            round(b / 100, 4),
            round((l + 3 * b) / 100, 4),
        )
    got = {
        r.event_type: (r.n_days, r.level, r.trend, r.fc_3)
        for r in rel.QUERIES["d86_holt_forecast"](spark, sf_dir).collect()
    }
    for t, (n, lvl, tr, fc3) in expect.items():
        gn, gl, gt, gf = got[t]
        assert gn == n
        assert abs(gl - lvl) < 5e-5 and abs(gt - tr) < 5e-5
        assert abs(gf - fc3) < 5e-5


def test_rolling_distinct_matches_python_replay(spark, sf_dir):
    """d87 equals a brute-force per-(type, day) union of the trailing
    7 calendar days' user sets, including sparse-day gaps."""
    from pyspark.sql import functions as F

    from pgsink_spark.operators import relational as rel
    from pgsink_spark.sources.fixtures import load_table

    rows = (
        load_table(spark, sf_dir, "events")
        .select("event_type", F.date_trunc("day", "ts").alias("day"),
                "user_id")
        .collect()
    )
    sets: dict = {}
    for r in rows:
        sets.setdefault((r.event_type, r.day.date()), set()).add(r.user_id)
    import datetime

    expect = {}
    for (t, d), _ in sets.items():
        u: set = set()
        for back in range(7):
            u |= sets.get((t, d - datetime.timedelta(days=back)), set())
        expect[(t, d)] = len(u)
    got = {
        (r.event_type, r.day.date()): r.users_7d
        for r in rel.QUERIES["d87_rolling_distinct"](spark, sf_dir).collect()
    }
    assert got == expect


def test_kmv_reach_pane_merge_is_lossless(spark, sf_dir):
    """d88's pane-merge claim, tested directly: for every (type, day),
    the k smallest hashes of the 7-day pane UNION equal the k smallest
    hashes computed from the raw 7-day user union (merging k-min panes
    loses nothing), and every gate boolean is genuinely TRUE."""
    import hashlib

    from pyspark.sql import functions as F

    from pgsink_spark.operators import relational as rel
    from pgsink_spark.sources.fixtures import load_table

    out = rel.QUERIES["d88_kmv_reach"](spark, sf_dir).collect()
    assert all(r.within_bound for r in out)

    rows = (
        load_table(spark, sf_dir, "events")
        .select("event_type", F.date_trunc("day", "ts").alias("day"),
                "user_id")
        .collect()
    )
    import datetime

    sets: dict = {}
    for r in rows:
        sets.setdefault((r.event_type, r.day.date()), set()).add(r.user_id)

    def h(u: int) -> int:
        return int(hashlib.md5(str(u).encode()).hexdigest()[:13], 16)

    for r in out:
        t, d = r.event_type, r.day.date()
        users: set = set()
        for back in range(7):
            users |= sets.get((t, d - datetime.timedelta(days=back)), set())
        assert r.exact_7d == len(users)
        hs = sorted(h(u) for u in users)[: rel.KMV_REACH_K]
        if len(hs) < rel.KMV_REACH_K:
            assert r.est_7d == float(len(hs))
        else:
            expect = round((rel.KMV_REACH_K - 1) * float(1 << 52) / hs[-1], 4)
            assert abs(r.est_7d - expect) < 1e-3, (t, d)


def test_trend_robust_matches_python_replay(spark, sf_dir):
    """d89's Mann–Kendall S must match a brute-force pairwise replay
    EXACTLY (integer statistic), and the Theil–Sen lower-median slope
    to rounding; the Sen slope must also be insensitive to one
    injected wild value where the replayed OLS slope is not."""
    from pyspark.sql import functions as F

    from pgsink_spark.operators import relational as rel
    from pgsink_spark.sources.fixtures import load_table

    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_type", F.date_trunc("day", "ts").alias("day"),
                "value")
        .collect()
    )
    daily: dict = {}
    for r in ev:
        key = (r.event_type, r.day.toordinal())
        daily[key] = daily.get(key, 0) + int(round(r.value * 100))
    series: dict = {}
    for (t, o), c in daily.items():
        series.setdefault(t, []).append((o, c))
    got = {
        r.event_type: (r.n_pairs, r.mk_s, r.sen_slope)
        for r in rel.QUERIES["d89_trend_robust"](spark, sf_dir).collect()
    }
    for t, xs in series.items():
        xs.sort()
        slopes, s = [], 0
        for i in range(len(xs)):
            for j in range(i + 1, len(xs)):
                dc = xs[j][1] - xs[i][1]
                s += (dc > 0) - (dc < 0)
                slopes.append(dc / (xs[j][0] - xs[i][0]))
        slopes.sort()
        sen = slopes[(len(slopes) + 1) // 2 - 1] / 100
        n, mk, gsen = got[t]
        assert n == len(slopes) and mk == s, t
        assert abs(gsen - round(sen, 6)) < 2e-6, (t, gsen, sen)


def test_temperature_sample_flattens_and_replays(spark, sf_dir):
    """corpus_temperature_sample: kept counts equal a Python replay of
    the md5-threshold rule; the smallest language keeps everything;
    and the kept mix is FLATTER than the raw mix (max/min ratio
    strictly shrinks for a non-uniform census)."""
    import hashlib

    from pgsink_spark.operators import corpus as C
    from pgsink_spark.sources.fixtures import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang"
    ).collect()
    counts: dict = {}
    for r in docs:
        counts[r.lang] = counts.get(r.lang, 0) + 1
    n_min = min(counts.values())
    import math

    kept: dict = {}
    for r in docs:
        p = min(1.0, math.sqrt(n_min / counts[r.lang]))
        u = int(
            hashlib.md5(str(r.doc_id).encode()).hexdigest()[:13], 16
        ) / float(1 << 52)
        if u < p:
            kept[r.lang] = kept.get(r.lang, 0) + 1
    got = {
        r.lang: (r.n_docs, r.n_kept, r.keep_prob)
        for r in C.corpus_temperature_sample(spark, sf_dir).collect()
    }
    for lang, n in counts.items():
        gn, gk, gp = got[lang]
        assert gn == n and gk == kept.get(lang, 0), lang
        if n == n_min:
            assert gp == 1.0 and gk == n, "smallest language must keep all"
    raw_ratio = max(counts.values()) / min(counts.values())
    kept_ratio = max(kept.values()) / min(kept.values())
    if raw_ratio > 1.2:
        assert kept_ratio < raw_ratio, (raw_ratio, kept_ratio)


def test_skyline_matches_bruteforce_dominance(spark, sf_dir):
    """d90's two-phase distributed scan must equal the O(n²)
    brute-force dominance definition exactly — an INDEPENDENT replay,
    not the DuckDB oracle — and every excluded doc must have a
    skyline witness that dominates it."""
    from pyspark.sql import functions as F

    from pgsink_spark.operators import relational as rel
    from pgsink_spark.sources.fixtures import load_table

    docs = load_table(spark, sf_dir, "documents")
    w = F.split(F.lower("text"), " ")
    dims = docs.select(
        "doc_id",
        F.col("n_chars").alias("d_len"),
        F.size(F.array_distinct(w)).cast("long").alias("d_vocab"),
        F.size(
            F.filter(
                F.array_distinct(w),
                lambda x: F.size(F.filter(w, lambda y: y == x)) == 1,
            )
        )
        .cast("long")
        .alias("d_hapax"),
    ).collect()
    pts = {r.doc_id: (r.d_len, r.d_vocab, r.d_hapax) for r in dims}

    def dominates(a, b):
        return all(x >= y for x, y in zip(a, b)) and a != b

    expect = {
        i
        for i, p in pts.items()
        if not any(dominates(q, p) for q in pts.values())
    }
    got = {
        r.doc_id
        for r in rel.QUERIES["d90_skyline_pareto"](spark, sf_dir).collect()
    }
    assert got == expect
    for i, p in pts.items():
        if i not in got:
            assert any(dominates(pts[s], p) for s in got), i


def test_blocking_audit_counts_match_generator(spark, sf_dir):
    """The audit's closed-form candidate counts must equal the ACTUAL
    generator output — on the fixtures (no hot blocks) and on a
    synthetic corpus with one hot block (cap engaged)."""
    from pgsink_spark.operators.dedup import (
        _blocked_head_candidates,
        dedup_blocking_audit,
        LINKAGE_BLOCK_CAP,
    )
    from pgsink_spark.sources.fixtures import load_table

    row = dedup_blocking_audit(spark, sf_dir).collect()[0]
    actual = _blocked_head_candidates(
        load_table(spark, sf_dir, "documents")
    ).count()
    assert row.cand_small + row.cand_window == actual
    assert row.n_hot_blocks == 0  # fixture blocks all under the cap
    assert row.cand_window == 0

    n = LINKAGE_BLOCK_CAP * 3
    hot = [(i, f"shared prefix tok{i:04d}") for i in range(n)]
    cold = [(1000 + i, f"unique{i} key{i} tail") for i in range(5)]
    docs = spark.createDataFrame(
        hot + cold, "doc_id long, text string"
    ).withColumn("n_chars", F.length("text"))
    cand = _blocked_head_candidates(docs).count()
    w = 16
    expect_hot = (n - w) * w + w * (w - 1) // 2
    assert cand == expect_hot  # cold blocks are singletons: 0 pairs


def test_ngram_novelty_matches_python_replay(spark):
    """corpus_ngram_novelty equals a plain-Python first-seen replay
    (independent of both engines), and bucket 0 is 100% novel."""
    from pgsink_spark.operators.dedup import (
        NGO_N,
        NOVELTY_BUCKET,
        corpus_ngram_novelty,
    )
    from pgsink_spark.sources.fixtures import load_table

    sf = "/root/testdata/sf0.01"  # 10 buckets (sf0.001 has only one)
    docs = load_table(spark, sf, "documents").select("doc_id", "text").collect()
    per_bucket: dict[int, set] = {}
    for r in docs:
        w = r["text"].lower().split(" ")
        if len(w) < NGO_N:
            continue
        b = r["doc_id"] // NOVELTY_BUCKET
        grams = {
            " ".join(w[i : i + NGO_N]) for i in range(len(w) - NGO_N + 1)
        }
        per_bucket.setdefault(b, set()).update(grams)
    seen: set = set()
    expect = {}
    for b in sorted(per_bucket):
        grams = per_bucket[b]
        new = grams - seen
        seen |= grams
        expect[b] = (
            len(grams),
            len(new),
            1_000_000 * len(new) // len(grams),
        )
    rows = corpus_ngram_novelty(spark, sf).collect()
    got = {r["bucket"]: (r["n_grams"], r["n_new"], r["novelty_ppm"]) for r in rows}
    assert got == expect
    assert got[0][2] == 1_000_000  # the first bucket is all-new
    assert len(got) == 10


def test_borda_fusion_matches_python_replay(spark):
    """quality_borda_fusion equals an independent Python rank fusion
    (full sort per signal, desc with doc_id tiebreak)."""
    from pgsink_spark.operators.corpus import BORDA_K, quality_borda_fusion
    from pgsink_spark.sources.fixtures import load_table

    sf = "/root/testdata/sf0.01"
    docs = load_table(spark, sf, "documents").select(
        "doc_id", "text", "n_chars"
    ).collect()
    dims = []
    for r in docs:
        w = r["text"].lower().split(" ")
        from collections import Counter

        c = Counter(w)
        dims.append(
            (
                r["doc_id"],
                r["n_chars"],
                len(set(w)),
                sum(1 for v in c.values() if v == 1),
            )
        )
    ranks: dict[int, list[int]] = {d[0]: [] for d in dims}
    for axis in (1, 2, 3):
        for rank, row in enumerate(
            sorted(dims, key=lambda d: (-d[axis], d[0])), start=1
        ):
            ranks[row[0]].append(rank)
    fused = sorted(
        ((sum(v), k, *v) for k, v in ranks.items())
    )[:BORDA_K]
    expect = [
        (k, r1, r2, r3, b) for (b, k, r1, r2, r3) in fused
    ]
    got = [
        (r["doc_id"], r["r_len"], r["r_vocab"], r["r_hapax"], r["borda"])
        for r in quality_borda_fusion(spark, sf).collect()
    ]
    assert got == expect


def test_reservoir_hash_matches_python_replay(spark, sf_dir):
    """sample_reservoir_hash is exactly the k smallest md5-ranked ids."""
    import hashlib

    from pgsink_spark.operators.sampling import (
        RESERVOIR_K,
        sample_reservoir_hash,
    )
    from pgsink_spark.sources.fixtures import load_table

    ids = [
        r["doc_id"]
        for r in load_table(spark, sf_dir, "documents").select("doc_id").collect()
    ]
    ranked = sorted(
        (int(hashlib.md5(str(i).encode()).hexdigest()[:13], 16), i)
        for i in ids
    )
    expect = [(i, h) for h, i in ranked[: min(RESERVOIR_K, len(ids))]]
    got = [
        (r["doc_id"], r["rank_hash"])
        for r in sample_reservoir_hash(spark, sf_dir).collect()
    ]
    assert got == expect


def test_phrase_and_boolean_retrieval_match_python_replay(spark, sf_dir):
    from pgsink_spark.operators.retrieval import (
        BOOL_MUST,
        BOOL_NOT,
        PHRASE_K,
        PHRASE_W1,
        PHRASE_W2,
        retrieval_boolean_query,
        retrieval_phrase_search,
    )
    from pgsink_spark.sources.fixtures import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    phrase_expect = []
    bool_expect = []
    for r in docs:
        w = r["text"].lower().split(" ")
        n = sum(
            1
            for i in range(len(w) - 1)
            if w[i] == PHRASE_W1 and w[i + 1] == PHRASE_W2
        )
        if n > 0:
            phrase_expect.append((r["doc_id"], n))
        if (
            BOOL_MUST[0] in w
            and BOOL_MUST[1] in w
            and BOOL_NOT not in w
        ):
            bool_expect.append(
                (r["doc_id"], w.count(BOOL_MUST[0]), w.count(BOOL_MUST[1]))
            )
    phrase_expect.sort(key=lambda t: (-t[1], t[0]))
    assert phrase_expect, "fixture must contain the phrase"
    got = [
        (r["doc_id"], r["n_occurrences"])
        for r in retrieval_phrase_search(spark, sf_dir).collect()
    ]
    assert got == phrase_expect[:PHRASE_K]

    assert bool_expect, "fixture must contain boolean matches"
    gotb = [
        (r["doc_id"], r["n_hash"], r["n_scan"])
        for r in retrieval_boolean_query(spark, sf_dir).collect()
    ]
    assert gotb == sorted(bool_expect)


def test_session_bounce_matches_python_replay(spark, sf_dir):
    from collections import defaultdict

    from pgsink_spark.operators.relational import QUERIES
    from pgsink_spark.sources.fixtures import load_table

    events = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id")
        .collect()
    )
    by_user = defaultdict(list)
    for r in events:
        by_user[r["user_id"]].append((r["ts"], r["event_id"]))
    per_day = defaultdict(lambda: [0, 0])  # day -> [sessions, bounces]
    for _u, evs in by_user.items():
        evs.sort()
        cur = []
        sessions = []
        for ts, eid in evs:
            if cur and (ts - cur[-1][0]).total_seconds() > 1800:
                sessions.append(cur)
                cur = []
            cur.append((ts, eid))
        sessions.append(cur)
        for s in sessions:
            day = s[0][0].replace(hour=0, minute=0, second=0, microsecond=0)
            per_day[day][0] += 1
            if len(s) == 1:
                per_day[day][1] += 1
    expect = {
        d: (v[0], v[1], 1_000_000 * v[1] // v[0])
        for d, v in per_day.items()
    }
    got = {
        r["day"]: (r["n_sessions"], r["n_bounce"], r["bounce_ppm"])
        for r in QUERIES["d91_session_bounce"](spark, sf_dir).collect()
    }
    assert got == expect


def test_term_burstiness_matches_python_replay(spark):
    from collections import Counter, defaultdict

    from pgsink_spark.operators.corpus import (
        BURST_BUCKET,
        BURST_TOPK,
        corpus_term_burstiness,
    )
    from pgsink_spark.sources.fixtures import load_table

    sf = "/root/testdata/sf0.01"  # multiple buckets
    docs = load_table(spark, sf, "documents").select("doc_id", "text").collect()
    per_bucket = defaultdict(Counter)
    for r in docs:
        per_bucket[r["doc_id"] // BURST_BUCKET].update(
            r["text"].lower().split(" ")
        )
    totals, maxes, nb = Counter(), Counter(), Counter()
    for _b, c in per_bucket.items():
        for t, n in c.items():
            totals[t] += n
            maxes[t] = max(maxes[t], n)
            nb[t] += 1
    top = sorted(totals, key=lambda t: (-totals[t], t))[:BURST_TOPK]
    expect = [
        (
            t,
            totals[t],
            nb[t],
            maxes[t],
            1_000_000 * maxes[t] * nb[t] // totals[t],
        )
        for t in top
    ]
    got = [
        (r["tok"], r["total"], r["n_buckets"], r["max_bucket"], r["burst_ppm"])
        for r in corpus_term_burstiness(spark, sf).collect()
    ]
    assert got == expect


def test_rfm_segments_match_python_replay(spark, sf_dir):
    from pgsink_spark.operators.relational import QUERIES
    from pgsink_spark.sources.fixtures import load_table

    import collections
    import decimal

    orders = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderdate", "o_totalprice")
        .collect()
    )
    agg = {}
    for r in orders:
        rec, freq, mon = agg.get(
            r["o_custkey"], (None, 0, decimal.Decimal(0))
        )
        tp = decimal.Decimal(str(round(r["o_totalprice"], 2)))
        agg[r["o_custkey"]] = (
            max(rec, r["o_orderdate"]) if rec else r["o_orderdate"],
            freq + 1,
            mon + tp,
        )
    n = len(agg)

    def ranks(axis):
        order = sorted(agg, key=lambda c: (axis(c), c))
        return {c: i + 1 for i, c in enumerate(order)}

    rr = ranks(lambda c: (-agg[c][0].toordinal(),))
    rf = ranks(lambda c: (-agg[c][1],))
    rm = ranks(lambda c: (-agg[c][2],))
    seg = collections.Counter()
    for c in agg:
        q = lambda r: 1 + 4 * (r - 1) // n  # noqa: E731
        seg[q(rr[c]) * 100 + q(rf[c]) * 10 + q(rm[c])] += 1
    got = {
        r["segment"]: r["n_customers"]
        for r in QUERIES["d92_rfm_segments"](spark, sf_dir).collect()
    }
    assert got == dict(seg)


def test_manifest_checksums_match_python_replay(spark, sf_dir):
    import hashlib as H

    from pgsink_spark.operators.export import (
        MANIFEST_CHECK_MOD,
        MANIFEST_SHARD_DOCS,
        export_manifest_checksums,
    )
    from pgsink_spark.sources.fixtures import load_table

    ids = [
        r["doc_id"]
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .collect()
    ]
    shards = {}
    for i in ids:
        s = shards.setdefault(i // MANIFEST_SHARD_DOCS, [0, None, None, 0])
        s[0] += 1
        s[1] = i if s[1] is None else min(s[1], i)
        s[2] = i if s[2] is None else max(s[2], i)
        s[3] += (
            int(H.md5(str(i).encode()).hexdigest()[:13], 16)
            % MANIFEST_CHECK_MOD
        )
    got = {
        r["shard_id"]: [r["n_rows"], r["min_doc"], r["max_doc"], r["checksum"]]
        for r in export_manifest_checksums(spark, sf_dir).collect()
    }
    assert got == shards


def test_ivm_topk_consistent_with_maintained_state(spark, sf_dir):
    """The served top-k must be exactly the top-k of the full
    maintained agg state (same keys, same fold) — the leaderboard is
    a cut of state, not a separate computation."""
    from pgsink_spark.operators.ivm import IVM_TOPK, ivm_topk_view

    rows = ivm_topk_view(spark, sf_dir).collect()
    assert len(rows) == IVM_TOPK
    key = [(-r["n_orders"], -r["revenue"], r["o_custkey"]) for r in rows]
    assert key == sorted(key)
    assert all(r["n_orders"] >= 1 for r in rows)


def test_funnel_lag_matches_python_replay(spark, sf_dir):
    from collections import defaultdict

    from pgsink_spark.operators.relational import QUERIES
    from pgsink_spark.sources.fixtures import load_table

    events = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type", "ts")
        .collect()
    )
    first_view, first_purch = {}, {}
    for r in events:
        if r["event_type"] == "view":
            u = r["user_id"]
            if u not in first_view or r["ts"] < first_view[u]:
                first_view[u] = r["ts"]
    for r in events:
        if r["event_type"] == "purchase" and r["user_id"] in first_view:
            u = r["user_id"]
            if r["ts"] > first_view[u] and (
                u not in first_purch or r["ts"] < first_purch[u]
            ):
                first_purch[u] = r["ts"]
    per_day = defaultdict(list)
    for u, tp in first_purch.items():
        tv = first_view[u]
        day = tv.replace(hour=0, minute=0, second=0, microsecond=0)
        per_day[day].append(int((tp - tv).total_seconds()))
    expect = {
        d: (len(v), min(v), max(v), sum(v) // len(v))
        for d, v in per_day.items()
    }
    got = {
        r["day"]: (
            r["n_conversions"],
            r["min_lag_s"],
            r["max_lag_s"],
            r["mean_lag_s"],
        )
        for r in QUERIES["d93_funnel_conversion_lag"](spark, sf_dir).collect()
    }
    assert got == expect


def test_simpson_diversity_matches_python_replay(spark, sf_dir):
    from collections import Counter, defaultdict

    from pgsink_spark.operators.corpus import corpus_simpson_diversity
    from pgsink_spark.sources.fixtures import load_table

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("source", "text")
        .collect()
    )
    per_src = defaultdict(Counter)
    for r in docs:
        per_src[r["source"]].update(r["text"].lower().split(" "))
    expect = {}
    for s, c in per_src.items():
        n = sum(c.values())
        coll = sum(v * (v - 1) for v in c.values())
        expect[s] = (n, len(c), 1_000_000 * coll // (n * (n - 1)))
    got = {
        r["source"]: (r["n_tokens"], r["n_types"], r["simpson_ppm"])
        for r in corpus_simpson_diversity(spark, sf_dir).collect()
    }
    assert got == expect


def test_join_skew_audit_matches_python_replay(spark, sf_dir):
    from collections import Counter

    from pgsink_spark.operators.relational import QUERIES
    from pgsink_spark.sources.fixtures import load_table

    counts = Counter(
        r["user_id"]
        for r in load_table(spark, sf_dir, "events")
        .select("user_id")
        .collect()
    )
    n_keys, total = len(counts), sum(counts.values())
    max_cnt = max(counts.values())
    top_key = min(k for k, v in counts.items() if v == max_cnt)
    (row,) = QUERIES["d94_join_skew_audit"](spark, sf_dir).collect()
    assert (
        row["n_keys"],
        row["total"],
        row["max_cnt"],
        row["top_key"],
        row["top_share_ppm"],
        row["skew_ppm"],
    ) == (
        n_keys,
        total,
        max_cnt,
        top_key,
        1_000_000 * max_cnt // total,
        1_000_000 * max_cnt * n_keys // total,
    )


def test_cdc_gap_audit_matches_python_replay(spark, sf_dir):
    from pgsink_spark.operators.relational import GAP_TOPK, QUERIES
    from pgsink_spark.sources.fixtures import load_table

    keys = sorted(
        r["o_orderkey"]
        for r in load_table(spark, sf_dir, "orders")
        .select("o_orderkey")
        .distinct()
        .collect()
        if (r["o_orderkey"] // 100) % 7 != 3
    )
    gaps = [
        (p + 1, c - 1, c - p - 1)
        for p, c in zip(keys, keys[1:])
        if c - p > 1
    ]
    gaps.sort(key=lambda g: (-g[2], g[0]))
    got = [
        (r["gap_start"], r["gap_end"], r["n_missing"])
        for r in QUERIES["cdc_slot_gap_audit"](spark, sf_dir).collect()
    ]
    assert got == gaps[:GAP_TOPK]
    assert got, "synthetic holes must produce gaps"


@pytest.mark.slow
def test_ivf_probe_curve_hits_are_really_monotone(spark, sf_dir):
    """Recompute the per-nprobe hit counts independently and check the
    gate's booleans against them (the gate must not be vacuous)."""
    from pgsink_spark.operators.similarity import (
        IVF_CURVE_FLOOR,
        IVF_CURVE_PROBES,
        _exact_top5,
        ann_ivf_probe_curve,
        ann_ivf_topk,
    )

    exact = {
        (r["q_id"], r["vec_id"])
        for r in _exact_top5(spark, sf_dir).collect()
    }
    hits = []
    for p in IVF_CURVE_PROBES:
        got = {
            (r["q_id"], r["vec_id"])
            for r in ann_ivf_topk(spark, sf_dir, k=5, nprobe=p).collect()
        }
        hits.append(len(exact & got))
    assert hits == sorted(hits), "IVF hits must be monotone in nprobe"
    assert hits[-1] >= IVF_CURVE_FLOOR
    rows = ann_ivf_probe_curve(spark, sf_dir).collect()
    assert [r["nprobe"] for r in rows] == list(IVF_CURVE_PROBES)
    assert all(r["monotone_ok"] and r["floor_ok"] for r in rows)


def test_market_basket_matches_python_replay(spark, sf_dir):
    from collections import defaultdict

    from pgsink_spark.operators.relational import BASKET_MIN_SESS, QUERIES
    from pgsink_spark.sources.fixtures import load_table

    events = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    by_user = defaultdict(list)
    for r in events:
        by_user[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    sessions = []
    for _u, evs in by_user.items():
        evs.sort(key=lambda e: (e[0], e[1]))
        cur = set()
        prev = None
        for ts, _eid, et in evs:
            if prev is not None and (ts - prev).total_seconds() > 1800:
                sessions.append(cur)
                cur = set()
            cur.add(et)
            prev = ts
        sessions.append(cur)
    n = len(sessions)
    sup = defaultdict(int)
    both = defaultdict(int)
    for s in sessions:
        for t in s:
            sup[t] += 1
        items = sorted(s)
        for i, a in enumerate(items):
            for b in items[i + 1 :]:
                both[(a, b)] += 1
    expect = {}
    for (a, b), nb in both.items():
        if nb < BASKET_MIN_SESS:
            continue
        conf_ab = 1_000_000 * nb // sup[a]
        expect[(a, b)] = (
            nb,
            1_000_000 * nb // n,
            conf_ab,
            1_000_000 * nb // sup[b],
            conf_ab * n // sup[b],
        )
    got = {
        (r["item_a"], r["item_b"]): (
            r["n_both"],
            r["support_ppm"],
            r["conf_a_to_b_ppm"],
            r["conf_b_to_a_ppm"],
            r["lift_ppm"],
        )
        for r in QUERIES["d95_market_basket"](spark, sf_dir).collect()
    }
    assert got == expect


def test_stratified_quota_exact_budget_and_membership(spark, sf_dir):
    """The sample is EXACTLY the budget in size (or the corpus when
    smaller), per-stratum counts follow Hamilton apportionment, and
    members are each stratum's smallest-md5-rank docs."""
    import hashlib as H
    from collections import Counter

    from pgsink_spark.operators.sampling import (
        STRATA_BUDGET,
        sample_stratified_quota,
    )
    from pgsink_spark.sources.fixtures import load_table

    docs = [
        (r["source"], r["doc_id"])
        for r in load_table(spark, sf_dir, "documents")
        .select("source", "doc_id")
        .collect()
    ]
    ns = Counter(s for s, _ in docs)
    total = sum(ns.values())
    base = {s: STRATA_BUDGET * c // total for s, c in ns.items()}
    leftover = STRATA_BUDGET - sum(base.values())
    order = sorted(ns, key=lambda s: (-((STRATA_BUDGET * ns[s]) % total), s))
    quota = dict(base)
    for s in order[:leftover]:
        quota[s] += 1
    rows = sample_stratified_quota(spark, sf_dir).collect()
    assert len(rows) == min(STRATA_BUDGET, total)
    got_per = Counter(r["source"] for r in rows)
    assert got_per == Counter({s: q for s, q in quota.items() if q})
    # membership: per stratum, exactly the smallest md5 ranks
    per_src = {}
    for s, d in docs:
        per_src.setdefault(s, []).append(
            (int(H.md5(str(d).encode()).hexdigest()[:13], 16), d)
        )
    for s, q in quota.items():
        expect_ids = {d for _h, d in sorted(per_src[s])[:q]}
        got_ids = {r["doc_id"] for r in rows if r["source"] == s}
        assert got_ids == expect_ids


def test_sequence_pairs_match_python_replay(spark, sf_dir):
    from collections import defaultdict

    from pgsink_spark.operators.relational import QUERIES
    from pgsink_spark.sources.fixtures import load_table

    events = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    by_user = defaultdict(list)
    for r in events:
        by_user[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    sessions = []
    for _u, evs in by_user.items():
        evs.sort(key=lambda e: (e[0], e[1]))
        cur = []
        prev = None
        for ts, _eid, et in evs:
            if prev is not None and (ts - prev).total_seconds() > 1800:
                sessions.append(cur)
                cur = []
            cur.append((ts, et))
            prev = ts
        sessions.append(cur)
    pat = defaultdict(int)
    for s in sessions:
        first, last = {}, {}
        for ts, et in s:
            if et not in first or ts < first[et]:
                first[et] = ts
            if et not in last or ts > last[et]:
                last[et] = ts
        for a in first:
            for b in last:
                if a != b and first[a] < last[b]:
                    pat[(a, b)] += 1
    n = len(sessions)
    expect = {
        k: (v, 1_000_000 * v // n) for k, v in pat.items()
    }
    got = {
        (r["ant"], r["cons"]): (r["n_sessions"], r["support_ppm"])
        for r in QUERIES["d96_sequence_pairs"](spark, sf_dir).collect()
    }
    assert got == expect


def test_pseudonymize_ri_gate_holds_and_detects(spark, sf_dir):
    """ri_preserved must be TRUE on the fixtures, and the gate's two
    equalities must be the real ones (counts recomputed in Python)."""
    from pgsink_spark.operators.privacy import privacy_pseudonymize_ri
    from pgsink_spark.sources.fixtures import load_table

    (row,) = privacy_pseudonymize_ri(spark, sf_dir).collect()
    assert row["ri_preserved"]
    custkeys = {
        r["c_custkey"]
        for r in load_table(spark, sf_dir, "customer")
        .select("c_custkey")
        .collect()
    }
    orders = [
        r["o_custkey"]
        for r in load_table(spark, sf_dir, "orders")
        .select("o_custkey")
        .collect()
    ]
    joined = [k for k in orders if k in custkeys]
    assert row["n_orders_direct"] == row["n_orders_joined"] == len(joined)
    assert row["n_real_keys"] == row["n_pseudo_keys"] == len(set(joined))


def test_audio_resample_matches_sample_replay(spark, sf_dir):
    import numpy as np

    from pgsink_spark.functions import codecs
    from pgsink_spark.operators.multimodal import (
        mm_audio_resample,
        synthesize_media,
    )

    media = {
        r["media_id"]: bytes(r["content"])
        for r in synthesize_media(spark, sf_dir)
        .where("media_type = 'audio'")
        .collect()
    }
    got = {
        r["media_id"]: (r["n_out"], r["rate_out"], r["mean_amp"], r["rms"])
        for r in mm_audio_resample(spark, sf_dir).collect()
    }
    assert set(got) == set(media)
    for mid, content in media.items():
        samples, rate = codecs.decode_wav(content)
        out = samples[::2].astype(np.float64)
        assert got[mid] == (
            out.size,
            rate // 2,
            out.mean(),
            float(np.sqrt((out * out).mean())),
        )


def test_seasonal_decompose_matches_python_replay(spark, sf_dir):
    """d97_seasonal_decompose equals a pure-Python decomposition in
    integer cents: exact per-day totals, floor dow means, and exact
    residuals that sum to ~0 within each dow group (floor remainder)."""
    from collections import defaultdict
    from decimal import Decimal

    from pgsink_spark.operators.relational import QUERIES
    from pgsink_spark.sources.fixtures import load_table

    rows = (
        load_table(spark, sf_dir, "events").select("ts", "value").collect()
    )
    daily = defaultdict(int)
    for r in rows:
        d = r["ts"].date()
        cents = int(
            Decimal(str(r["value"])).quantize(Decimal("0.0001")) * 10000
        )
        daily[d] += cents
    by_dow = defaultdict(list)
    for d, tot in daily.items():
        # python weekday(): Mon=0..Sun=6 ; operator dow: Sun=0..Sat=6
        dow = (d.weekday() + 1) % 7
        by_dow[dow].append((d, tot))
    expect = {}
    for dow, days in by_dow.items():
        seasonal = sum(t for _, t in days) // len(days)
        for d, tot in days:
            expect[d] = (dow, tot, seasonal, tot - seasonal)
    got = {
        r["day"]: (
            r["dow"],
            r["total_cents"],
            r["seasonal_cents"],
            r["residual_cents"],
        )
        for r in QUERIES["d97_seasonal_decompose"](spark, sf_dir).collect()
    }
    assert got == expect
    # residuals within a dow group sum to the floor remainder: 0 <= rem < n
    for dow, days in by_dow.items():
        rem = sum(got[d][3] for d, _ in days)
        assert 0 <= rem < len(days)


def test_window_funnel_matches_python_replay(spark, sf_dir):
    """d98_window_funnel equals a brute-force per-user chain search
    (NO greedy shortcut: all (signup, view, purchase) triples tried),
    proving the operator's greedy-earliest reduction exact; depth
    counts partition the user base."""
    from collections import defaultdict

    from pgsink_spark.operators.relational import FUNNEL_WINDOW_US, QUERIES
    from pgsink_spark.sources.fixtures import load_table

    rows = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type", "ts")
        .collect()
    )
    by_user = defaultdict(lambda: defaultdict(list))
    for r in rows:
        us = int(r["ts"].timestamp() * 1_000_000)
        by_user[r["user_id"]][r["event_type"]].append(us)
    depth_count = defaultdict(int)
    for _u, evs in by_user.items():
        s, v, p = evs.get("signup", []), evs.get("view", []), evs.get(
            "purchase", []
        )
        depth = 0
        if s:
            depth = 1
        if any(
            ts < tv <= ts + FUNNEL_WINDOW_US for ts in s for tv in v
        ):
            depth = 2
        if any(
            ts < tv < tp <= ts + FUNNEL_WINDOW_US
            for ts in s
            for tv in v
            for tp in p
        ):
            depth = 3
        depth_count[depth] += 1
    got = {
        r["depth"]: r["n_users"]
        for r in QUERIES["d98_window_funnel"](spark, sf_dir).collect()
    }
    assert got == dict(depth_count)
    assert sum(got.values()) == len(by_user)


def test_hapax_and_stopword_match_python_replay(spark, sf_dir):
    """text_hapax_ratio and text_stopword_profile equal pure-Python
    censuses over the same whitespace tokenization, including exact
    ppm floors."""
    from collections import Counter, defaultdict

    from pgsink_spark.operators.relational import QUERIES
    from pgsink_spark.operators.text import _STOPWORD_PANEL
    from pgsink_spark.sources.fixtures import load_table

    rows = (
        load_table(spark, sf_dir, "documents")
        .select("source", "text")
        .collect()
    )
    per_src = defaultdict(Counter)
    for r in rows:
        per_src[r["source"]].update(r["text"].lower().split(" "))
    expect_h = {}
    expect_s = {}
    for src, wc in per_src.items():
        n_tok = sum(wc.values())
        n_typ = len(wc)
        n_hap = sum(1 for c in wc.values() if c == 1)
        expect_h[src] = (
            n_tok,
            n_typ,
            n_hap,
            1_000_000 * n_typ // n_tok,
            1_000_000 * n_hap // n_typ,
        )
        for sw in _STOPWORD_PANEL:
            if wc[sw]:
                expect_s[(src, sw)] = (wc[sw], 1_000_000 * wc[sw] // n_tok)
    got_h = {
        r["source"]: (
            r["n_tokens"],
            r["n_types"],
            r["n_hapax"],
            r["ttr_ppm"],
            r["hapax_ppm"],
        )
        for r in QUERIES["text_hapax_ratio"](spark, sf_dir).collect()
    }
    assert got_h == expect_h
    got_s = {
        (r["source"], r["stopword"]): (r["n"], r["ppm"])
        for r in QUERIES["text_stopword_profile"](spark, sf_dir).collect()
    }
    assert got_s == expect_s
    assert len(got_s) > 5, "panel must hit multiple sources"


def test_range_search_gate_and_exact_count(spark, sf_dir):
    """ann_range_search's exact pair count equals a pure-Python
    brute-force cosine census at the same threshold, and the LSH
    verification gate holds."""
    import math

    from pgsink_spark.operators.relational import QUERIES
    from pgsink_spark.operators.similarity import RANGE_TAU
    from pgsink_spark.sources.fixtures import load_table

    vecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb)

    expect = sum(
        1
        for q in range(5)
        for v, emb in vecs.items()
        if v != q and cos(vecs[q], emb) >= RANGE_TAU
    )
    (row,) = QUERIES["ann_range_search"](spark, sf_dir).collect()
    assert row["n_queries"] == 5
    assert row["n_pairs"] == expect
    assert row["lsh_hits_ok"] is True


def test_schema_merge_nulls_only_in_old_generation(spark, sf_dir):
    """src_parquet_schema_merge: every even doc_id (gen1, written
    without the column) reads back NULL source; every odd doc_id
    carries its true source; row count covers the whole table."""
    from pgsink_spark.operators.formats import src_parquet_schema_merge
    from pgsink_spark.sources.fixtures import load_table

    got = src_parquet_schema_merge(spark, sf_dir).collect()
    truth = {
        r["doc_id"]: r["source"]
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    assert len(got) == len(truth)
    for r in got:
        if r["doc_id"] % 2 == 0:
            assert r["source"] is None
        else:
            assert r["source"] == truth[r["doc_id"]]


def test_dup_rate_by_source_matches_python_replay(spark, sf_dir):
    """corpus_dup_rate_by_source equals a pure-Python per-source
    distinct-text census with exact ppm floors; n_docs partitions the
    corpus."""
    from collections import defaultdict

    from pgsink_spark.operators.relational import QUERIES
    from pgsink_spark.sources.fixtures import load_table

    texts = defaultdict(list)
    for r in (
        load_table(spark, sf_dir, "documents")
        .select("source", "text")
        .collect()
    ):
        texts[r["source"]].append(r["text"])
    expect = {}
    for src, ts in texts.items():
        nd = len(set(ts))
        expect[src] = (
            len(ts),
            nd,
            len(ts) - nd,
            1_000_000 * (len(ts) - nd) // len(ts),
        )
    got = {
        r["source"]: (r["n_docs"], r["n_distinct"], r["dup_docs"], r["dup_ppm"])
        for r in QUERIES["corpus_dup_rate_by_source"](spark, sf_dir).collect()
    }
    assert got == expect
    assert sum(v[0] for v in got.values()) == sum(
        len(ts) for ts in texts.values()
    )


def test_winsorized_stats_matches_python_replay(spark, sf_dir):
    """d99_winsorized_stats equals a pure-Python order-statistic
    winsorization in integer cents; the winsorized sum never exceeds
    the raw-sum bound given by clamping."""
    from collections import defaultdict
    from decimal import Decimal

    from pgsink_spark.operators.relational import QUERIES
    from pgsink_spark.sources.fixtures import load_table

    rows = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "event_id", "value")
        .collect()
    )
    per = defaultdict(list)
    for r in rows:
        cents = int(
            Decimal(str(r["value"])).quantize(Decimal("0.0001")) * 10000
        )
        per[r["event_type"]].append((cents, r["event_id"]))
    expect = {}
    for et, vals in per.items():
        vals.sort()
        n = len(vals)
        lo = vals[(n - 1) // 10][0]
        hi = vals[((n - 1) * 9) // 10][0]
        raw = sum(c for c, _ in vals)
        wins = sum(min(max(c, lo), hi) for c, _ in vals)
        expect[et] = (n, lo, hi, raw, wins)
    got = {
        r["event_type"]: (
            r["n"],
            r["lo_cents"],
            r["hi_cents"],
            r["raw_sum_cents"],
            r["wins_sum_cents"],
        )
        for r in QUERIES["d99_winsorized_stats"](spark, sf_dir).collect()
    }
    assert got == expect
    for et, (n, lo, hi, raw, wins) in got.items():
        assert n * lo <= wins <= n * hi


def test_interarrival_histogram_matches_python_replay(spark, sf_dir):
    """d100_interarrival_histogram equals a pure-Python per-(user,
    type) gap census with digit-count bucketing; bucket counts cover
    every consecutive same-type pair."""
    from collections import defaultdict

    from pgsink_spark.operators.relational import QUERIES
    from pgsink_spark.sources.fixtures import load_table

    rows = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type", "ts", "event_id")
        .collect()
    )
    per = defaultdict(list)
    for r in rows:
        us = int(r["ts"].timestamp() * 1_000_000)
        per[(r["user_id"], r["event_type"])].append((us, r["event_id"]))
    hist = defaultdict(int)
    n_gaps = 0
    for (_u, et), evs in per.items():
        evs.sort()
        for (a, _), (b, _) in zip(evs, evs[1:]):
            gap_s = (b - a) // 1_000_000
            hist[(et, len(str(gap_s)))] += 1
            n_gaps += 1
    got = {
        (r["event_type"], r["gap_digits"]): r["n"]
        for r in QUERIES["d100_interarrival_histogram"](
            spark, sf_dir
        ).collect()
    }
    assert got == dict(hist)
    assert sum(got.values()) == n_gaps


def test_source_purity_and_risk_histogram_match_python_replay(spark, sf_dir):
    """corpus_source_purity and privacy_risk_histogram equal pure-
    Python censuses with exact ppm floors."""
    import math
    from collections import Counter, defaultdict

    from pgsink_spark.operators.privacy import privacy_risk_histogram  # noqa: F401 — registers
    from pgsink_spark.operators.relational import QUERIES
    from pgsink_spark.sources.fixtures import load_table

    langs = defaultdict(Counter)
    for r in (
        load_table(spark, sf_dir, "documents")
        .select("source", "lang")
        .collect()
    ):
        langs[r["source"]][r["lang"]] += 1
    expect_p = {}
    for src, c in langs.items():
        maj, n = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        tot = sum(c.values())
        expect_p[src] = (
            maj,
            n,
            tot,
            1_000_000 * n // tot,
            1_000_000 * (tot - n) // tot,
        )
    got_p = {
        r["source"]: (
            r["majority_lang"],
            r["n_majority"],
            r["n_docs"],
            r["purity_ppm"],
            r["minority_ppm"],
        )
        for r in QUERIES["corpus_source_purity"](spark, sf_dir).collect()
    }
    assert got_p == expect_p

    classes = Counter()
    for r in (
        load_table(spark, sf_dir, "customer")
        .select("c_nationkey", "c_mktsegment", "c_acctbal")
        .collect()
    ):
        classes[
            (r["c_nationkey"], r["c_mktsegment"], math.floor(r["c_acctbal"] / 1000))
        ] += 1
    n_tot = sum(classes.values())
    by_k = Counter(classes.values())
    expect_h = {
        k: (nc, k * nc, 1_000_000 * k * nc // n_tot)
        for k, nc in by_k.items()
    }
    got_h = {
        r["class_size"]: (r["n_classes"], r["n_records"], r["record_ppm"])
        for r in QUERIES["privacy_risk_histogram"](spark, sf_dir).collect()
    }
    assert got_h == expect_h
    assert sum(v[1] for v in got_h.values()) == n_tot


def test_survival_curve_matches_python_replay(spark, sf_dir):
    """d101_survival_curve equals a pure-Python first-event →
    first-purchase lag census; the cumulative is monotone and bounded
    by the user count."""
    from collections import Counter, defaultdict

    from pgsink_spark.operators.relational import QUERIES
    from pgsink_spark.sources.fixtures import load_table

    rows = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type", "ts")
        .collect()
    )
    first = {}
    purch = defaultdict(list)
    for r in rows:
        u = r["user_id"]
        first[u] = min(first.get(u, r["ts"]), r["ts"])
        if r["event_type"] == "purchase":
            purch[u].append(r["ts"])
    hist = Counter()
    for u, t0 in first.items():
        ps = [t for t in purch.get(u, []) if t >= t0]
        if ps:
            us0 = int(t0.timestamp() * 1_000_000)
            usp = int(min(ps).timestamp() * 1_000_000)
            hist[(usp - us0) // 86_400_000_000] += 1
    n_users = len(first)
    cum = 0
    expect = {}
    for d in sorted(hist):
        cum += hist[d]
        expect[d] = (hist[d], cum, 1_000_000 * cum // n_users)
    got = {
        r["days"]: (r["n_converted"], r["cum_converted"], r["cum_ppm"])
        for r in QUERIES["d101_survival_curve"](spark, sf_dir).collect()
    }
    assert got == expect
    assert cum <= n_users


def test_oov_rate_matches_python_replay(spark, sf_dir):
    """text_oov_rate equals a pure-Python top-K vocabulary cut and
    per-source OOV census with exact ppm floors."""
    from collections import Counter, defaultdict

    from pgsink_spark.operators.text import OOV_VOCAB_K, text_oov_rate
    from pgsink_spark.sources.fixtures import load_table

    rows = (
        load_table(spark, sf_dir, "documents")
        .select("source", "text")
        .collect()
    )
    global_c = Counter()
    per_src = defaultdict(list)
    for r in rows:
        ws = r["text"].lower().split(" ")
        global_c.update(ws)
        per_src[r["source"]].extend(ws)
    vocab = {
        w
        for w, _ in sorted(global_c.items(), key=lambda kv: (-kv[1], kv[0]))[
            :OOV_VOCAB_K
        ]
    }
    expect = {}
    for src, ws in per_src.items():
        oov = sum(1 for w in ws if w not in vocab)
        expect[src] = (len(ws), oov, 1_000_000 * oov // len(ws))
    got = {
        r["source"]: (r["n_tokens"], r["n_oov"], r["oov_ppm"])
        for r in text_oov_rate(spark, sf_dir).collect()
    }
    assert got == expect


def test_mcnemar_matches_python_replay(spark, sf_dir):
    """eval_mcnemar equals the textbook 2x2 paired table and chi2 in
    pure Python over the same deterministic raters; the table
    partitions the corpus."""
    from pgsink_spark.operators.evaluation import eval_mcnemar
    from pgsink_spark.sources.fixtures import load_table
    from tests.test_graph import _py_raters

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang"
    ).collect()
    br = oa = ob = bw = 0
    for r in docs:
        a, b = _py_raters(r["doc_id"], r["lang"])
        ra, rb = a == r["lang"], b == r["lang"]
        if ra and rb:
            br += 1
        elif ra:
            oa += 1
        elif rb:
            ob += 1
        else:
            bw += 1
    chi2 = (
        1_000_000 * (oa - ob) * (oa - ob) // (oa + ob) if oa + ob else 0
    )
    (row,) = eval_mcnemar(spark, sf_dir).collect()
    assert (
        row["both_right"],
        row["only_a"],
        row["only_b"],
        row["both_wrong"],
    ) == (br, oa, ob, bw)
    assert row["chi2_micro"] == chi2
    assert br + oa + ob + bw == len(docs)


def test_rolling_slope_matches_python_replay(spark, sf_dir):
    """d102_rolling_slope equals a pure-Python OLS over each full
    trailing window of the daily series, exact rationals included."""
    from collections import defaultdict
    from decimal import Decimal

    from pgsink_spark.operators.relational import QUERIES, ROLLSLOPE_W
    from pgsink_spark.sources.fixtures import load_table

    rows = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "ts", "value")
        .collect()
    )
    daily = defaultdict(int)
    for r in rows:
        cents = int(
            Decimal(str(r["value"])).quantize(Decimal("0.0001")) * 10000
        )
        daily[(r["event_type"], r["ts"].date())] += cents
    day0 = min(d for _, d in daily)
    series = defaultdict(list)
    for (et, d), y in daily.items():
        series[et].append(((d - day0).days, d, y))
    expect = {}
    for et, pts in series.items():
        pts.sort()
        for i in range(ROLLSLOPE_W - 1, len(pts)):
            w = pts[i - ROLLSLOPE_W + 1 : i + 1]
            n = ROLLSLOPE_W
            sx = sum(x for x, _, _ in w)
            sy = sum(y for _, _, y in w)
            sxx = sum(x * x for x, _, _ in w)
            sxy = sum(x * y for x, _, y in w)
            num = n * sxy - sx * sy
            den = n * sxx - sx * sx
            milli = (
                1000 * num // den if num >= 0 else -(1000 * -num // den)
            )
            expect[(et, pts[i][1])] = (num, den, milli)
    got = {
        (r["event_type"], r["day"]): (
            r["slope_num"],
            r["slope_den"],
            r["slope_milli"],
        )
        for r in QUERIES["d102_rolling_slope"](spark, sf_dir).collect()
    }
    assert got == expect


def test_bag_set_ops_matches_python_replay(spark, sf_dir):
    """d103_bag_set_ops equals pure-Python multiset arithmetic AND
    Python's own Counter intersection/difference semantics."""
    from collections import Counter

    from pgsink_spark.operators.relational import QUERIES
    from pgsink_spark.sources.fixtures import load_table

    ca = Counter(
        r["c_nationkey"]
        for r in load_table(spark, sf_dir, "customer")
        .select("c_nationkey")
        .collect()
    )
    cb = Counter(
        r["s_nationkey"]
        for r in load_table(spark, sf_dir, "supplier")
        .select("s_nationkey")
        .collect()
    )
    inter = ca & cb
    diff = ca - cb
    expect = {
        k: (ca.get(k, 0), cb.get(k, 0), inter.get(k, 0), diff.get(k, 0))
        for k in set(ca) | set(cb)
    }
    got = {
        r["k"]: (
            r["n_cust"],
            r["n_supp"],
            r["intersect_all_n"],
            r["except_all_n"],
        )
        for r in QUERIES["d103_bag_set_ops"](spark, sf_dir).collect()
    }
    assert got == expect


def test_filter_impact_matches_python_replay(spark, sf_dir):
    """curation_filter_impact equals a pure-Python two-policy census;
    policy B survivors are always a subset of policy A's."""
    from collections import defaultdict

    from pgsink_spark.operators.curation import (
        FILTER_A_MIN_CHARS,
        FILTER_B_MIN_CHARS,
        curation_filter_impact,
    )
    from pgsink_spark.sources.fixtures import load_table

    per = defaultdict(lambda: [0, 0, 0, 0, 0])
    for r in (
        load_table(spark, sf_dir, "documents")
        .select("source", "n_chars")
        .collect()
    ):
        s = per[r["source"]]
        s[0] += 1
        if r["n_chars"] >= FILTER_A_MIN_CHARS:
            s[1] += 1
            s[3] += r["n_chars"]
        if r["n_chars"] >= FILTER_B_MIN_CHARS:
            s[2] += 1
            s[4] += r["n_chars"]
    expect = {}
    for src, (n, ka, kb, cha, chb) in per.items():
        loss = 1_000_000 * (ka - kb) // ka if ka else 0
        expect[src] = (n, ka, kb, cha, chb, loss)
    got = {
        r["source"]: (
            r["n_docs"],
            r["kept_a"],
            r["kept_b"],
            r["chars_a"],
            r["chars_b"],
            r["tighten_loss_ppm"],
        )
        for r in curation_filter_impact(spark, sf_dir).collect()
    }
    assert got == expect
    for n, ka, kb, *_ in got.values():
        assert kb <= ka <= n


def test_stage_metrics_match_pipeline_and_sql_views_identity(spark, sf_dir):
    """pipeline_stage_metrics' observed counters equal direct
    recomputation from the pipeline frame; d104's Spark result comes
    from the SAME SQL text its oracle uses (identity pinned here, not
    just equivalence)."""
    from pgsink_spark.operators.curation import (
        QUALITY_KEEP,
        pipeline_curation,
        pipeline_stage_metrics,
    )
    from pgsink_spark.operators.relational import D104_SQL, ORACLES

    rows = pipeline_curation(spark, sf_dir).collect()
    n = len(rows)
    qp = sum(1 for r in rows if r["quality"] >= QUALITY_KEEP)
    canon = sum(1 for r in rows if r["doc_id"] == r["canonical_id"])
    kept = sum(1 for r in rows if r["kept"])
    (m,) = pipeline_stage_metrics(spark, sf_dir).collect()
    assert (
        m["n_docs"],
        m["n_quality_pass"],
        m["n_canonical"],
        m["n_kept"],
        m["kept_ppm"],
    ) == (n, qp, canon, kept, 1_000_000 * kept // n)
    assert 0 < kept <= canon <= n

    assert ORACLES["d104_sql_api_views"] == D104_SQL


def test_bootstrap_replicates_match_python_replay(spark, sf_dir):
    """eval_bootstrap_replicates equals a pure-Python hash-Poisson
    draw; replicate means vary (the draw is real) but each n_eff stays
    within 20% of n (Poisson(1) mass conservation)."""
    import hashlib
    from collections import defaultdict

    from pgsink_spark.operators.evaluation import (
        _BOOT_CDF,
        BOOT_REPLICATES,
        BOOT_SALT,
        eval_bootstrap_replicates,
    )
    from pgsink_spark.sources.fixtures import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars"
    ).collect()

    def weight(doc_id, rep):
        b = (
            int(
                hashlib.md5(
                    str(doc_id + rep * BOOT_SALT).encode()
                ).hexdigest()[:8],
                16,
            )
            % 1000
        )
        for k, c in enumerate(_BOOT_CDF):
            if b < c:
                return k
        return 5

    expect = {}
    for rep in range(BOOT_REPLICATES):
        n_eff = sum(weight(r["doc_id"], rep) for r in docs)
        s = sum(weight(r["doc_id"], rep) * r["n_chars"] for r in docs)
        expect[rep] = (n_eff, s, 1000 * s // n_eff)
    got = {
        r["rep"]: (r["n_eff"], r["sum_chars"], r["mean_chars_milli"])
        for r in eval_bootstrap_replicates(spark, sf_dir).collect()
    }
    assert got == expect
    n = len(docs)
    for n_eff, _, _ in got.values():
        assert 0.8 * n <= n_eff <= 1.2 * n
    assert len({m for _, _, m in got.values()}) > 1, "replicates must vary"


def test_quarantine_and_feature_hashing_match_python_replay(spark, sf_dir):
    """src_csv_malformed_quarantine: quarantined rows are exactly the
    orderkey%10==3 set and good rows carry true values;
    text_feature_hashing equals a pure-Python md5-bucket count."""
    import hashlib
    from collections import Counter

    from pgsink_spark.operators.formats import src_csv_malformed_quarantine
    from pgsink_spark.operators.text import (
        FEATHASH_DIM,
        FEATHASH_DOCS,
        text_feature_hashing,
    )
    from pgsink_spark.sources.fixtures import load_table

    truth = {
        r["o_orderkey"]: (r["o_custkey"], r["o_orderstatus"])
        for r in load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus")
        .collect()
    }
    got = src_csv_malformed_quarantine(spark, sf_dir).collect()
    assert len(got) == len(truth)
    for r in got:
        bad = r["o_orderkey"] % 10 == 3
        assert r["quarantined"] == bad
        if bad:
            assert r["o_custkey"] is None and r["o_orderstatus"] is None
        else:
            assert (r["o_custkey"], r["o_orderstatus"]) == truth[
                r["o_orderkey"]
            ]

    docs = (
        load_table(spark, sf_dir, "documents")
        .where(f"doc_id < {FEATHASH_DOCS}")
        .select("doc_id", "text")
        .collect()
    )
    expect = Counter()
    for r in docs:
        for wd in r["text"].lower().split(" "):
            b = int(hashlib.md5(wd.encode()).hexdigest()[:8], 16) % FEATHASH_DIM
            expect[(r["doc_id"], b)] += 1
    got_fh = {
        (r["doc_id"], r["bucket"]): r["cnt"]
        for r in text_feature_hashing(spark, sf_dir).collect()
    }
    assert got_fh == dict(expect)


def test_token_coverage_matches_python_replay(spark, sf_dir):
    """corpus_token_coverage equals a pure-Python Zipf-integral; the
    curve is monotone in k and the top-1000 coverage dominates."""
    from collections import Counter

    from pgsink_spark.operators.corpus import (
        COVERAGE_KS,
        corpus_token_coverage,
    )
    from pgsink_spark.sources.fixtures import load_table

    c = Counter()
    for r in (
        load_table(spark, sf_dir, "documents").select("text").collect()
    ):
        c.update(r["text"].lower().split(" "))
    ordered = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(c.values())
    expect = {}
    for k in COVERAGE_KS:
        cov = sum(cnt for _, cnt in ordered[:k])
        expect[k] = (cov, total, 1_000_000 * cov // total)
    got = {
        r["k"]: (r["covered_tokens"], r["total_tokens"], r["coverage_ppm"])
        for r in corpus_token_coverage(spark, sf_dir).collect()
    }
    assert got == expect
    covs = [got[k][2] for k in sorted(got)]
    assert covs == sorted(covs)


def test_cross_table_snapshot_and_kish_match_python_replay(spark, sf_dir):
    """cdc_cross_table_snapshot equals a pure-Python two-ledger as-of
    replay (orphans computed, not assumed zero); sample_kish_neff
    equals the textbook (sum w)^2 / sum w^2 and satisfies
    1 <= n_eff <= n."""
    from pgsink_spark.operators.relational import QUERIES
    from pgsink_spark.sources.fixtures import load_table

    mk = max(
        r["o_orderkey"]
        for r in load_table(spark, sf_dir, "orders")
        .select("o_orderkey")
        .collect()
    )
    okeys = [
        r["o_orderkey"]
        for r in load_table(spark, sf_dir, "orders")
        .select("o_orderkey")
        .collect()
    ]
    lkeys = [
        r["l_orderkey"]
        for r in load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey")
        .collect()
    ]
    deleted = {
        k for k in okeys if k % 17 == 0 and 2 * k + 1 <= mk
    }
    ords = [k for k in okeys if k not in deleted]
    lis = [k for k in lkeys if k not in deleted]
    orphans = sum(1 for k in lis if k in deleted)
    (row,) = QUERIES["cdc_cross_table_snapshot"](spark, sf_dir).collect()
    assert (row["n_orders"], row["n_lineitems"], row["n_orphans"]) == (
        len(ords),
        len(lis),
        orphans,
    )
    assert row["n_orphans"] == 0

    from pgsink_spark.operators.sampling import sample_kish_neff  # noqa: F401 — registers

    ws = [
        r["n_chars"]
        for r in load_table(spark, sf_dir, "documents")
        .select("n_chars")
        .collect()
    ]
    sw, sw2 = sum(ws), sum(w * w for w in ws)
    (kr,) = QUERIES["sample_kish_neff"](spark, sf_dir).collect()
    assert (kr["sum_w"], kr["sum_w2"], kr["n"]) == (sw, sw2, len(ws))
    assert kr["neff_milli"] == 1000 * sw * sw // sw2
    assert 1000 <= kr["neff_milli"] <= 1000 * len(ws)


def test_length_gini_matches_python_replay(spark, sf_dir):
    """corpus_length_gini equals the textbook rank-formula Gini in
    pure Python; 0 <= G < 1 for positive weights."""
    from collections import defaultdict

    from pgsink_spark.operators.corpus import corpus_length_gini
    from pgsink_spark.sources.fixtures import load_table

    per = defaultdict(list)
    for r in (
        load_table(spark, sf_dir, "documents")
        .select("source", "doc_id", "n_chars")
        .collect()
    ):
        per[r["source"]].append((r["n_chars"], r["doc_id"]))
    expect = {}
    for src, ws in per.items():
        ws.sort()
        n = len(ws)
        tot = sum(w for w, _ in ws)
        s = sum((i + 1) * w for i, (w, _) in enumerate(ws))
        num = 2 * s - (n + 1) * tot
        den = n * tot
        g = 1000 * num // den if num >= 0 else -(1000 * -num // den)
        expect[src] = (n, tot, g)
    got = {
        r["source"]: (r["n_docs"], r["total_chars"], r["gini_milli"])
        for r in corpus_length_gini(spark, sf_dir).collect()
    }
    assert got == expect
    for _, _, g in got.values():
        assert 0 <= g < 1000


def test_token_coverage_k_past_vocabulary(spark, sf_dir):
    """A k larger than the vocabulary covers the whole token stream —
    the census join has no boundary row there and the operator must
    fall back to total mass (the coalesce path), not drop the k."""
    from collections import Counter

    from pgsink_spark.operators import corpus as C
    from pgsink_spark.sources.fixtures import load_table

    c = Counter()
    for r in (
        load_table(spark, sf_dir, "documents").select("text").collect()
    ):
        c.update(r["text"].lower().split(" "))
    total = sum(c.values())
    assert len(c) < 10**9  # the probe k really is past the vocabulary

    orig = C.COVERAGE_KS
    try:
        C.COVERAGE_KS = (10, 10**9)
        rows = {
            r["k"]: (r["covered_tokens"], r["total_tokens"], r["coverage_ppm"])
            for r in C.corpus_token_coverage(spark, sf_dir).collect()
        }
    finally:
        C.COVERAGE_KS = orig
    assert rows[10**9] == (total, total, 1_000_000)
    ordered = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
    cov10 = sum(cnt for _, cnt in ordered[:10])
    assert rows[10] == (cov10, total, 1_000_000 * cov10 // total)


# ---------------------------------------------------------------------------
# r10 optimization internals: the single-fold vocab/hapax kernel and the
# mapInPandas CUSUM fold must be value-identical to the formulations they
# replaced.


def test_sorted_vocab_hapax_matches_naive_neighbor_form(spark, sf_dir):
    """sorted_vocab_hapax (one linear aggregate) equals the old
    neighbor-lambda formulation — filter(sw, (x,i) -> x != sw[i-1] &&
    x != sw[i+1]) over the sorted array plus size(array_distinct) —
    on edge cases (single word, all-equal, all-distinct, empty-string
    tokens) and on a fixture sample."""
    from pgsink_spark.operators.relational import sorted_vocab_hapax

    edge = spark.createDataFrame(
        [
            (1, "one"),
            (2, "a a a a"),
            (3, "a b c d"),
            (4, "b a b a c"),
            (5, ""),  # split('') -> ['']: one empty-string token
            (6, "  x  "),  # empty tokens around x
        ],
        "doc_id long, text string",
    )
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .limit(200)
        .unionByName(edge)
    )
    w = F.split(F.lower("text"), " ")
    sw = F.array_sort(w)
    naive_hapax = F.size(
        F.filter(
            sw,
            lambda x, i: ~x.eqNullSafe(F.get(sw, i - 1))
            & ~x.eqNullSafe(F.get(sw, i + 1)),
        )
    )
    vh = sorted_vocab_hapax(F.array_sort(w))
    rows = docs.select(
        "doc_id",
        F.size(F.array_distinct(w)).cast("long").alias("v0"),
        naive_hapax.cast("long").alias("h0"),
        vh["vocab"].cast("long").alias("v1"),
        vh["hapax"].cast("long").alias("h1"),
    ).collect()
    assert rows
    for r in rows:
        assert (r.v0, r.h0) == (r.v1, r.h1), r


def test_cusum_mapinpandas_fold_matches_pergroup_replay(spark, sf_dir):
    """d74_cusum_changepoints (one mapInPandas pass with carried
    per-user state) is float-bit-identical to the per-group
    applyInPandas fold it replaced, replayed here in pure pandas."""
    from decimal import ROUND_HALF_UP, Decimal

    from pgsink_spark.operators.relational import (
        CUSUM_H,
        CUSUM_K,
        QUERIES,
    )

    got = [
        (r.user_id, r.event_id, r.s)
        for r in QUERIES["d74_cusum_changepoints"](spark, sf_dir).collect()
    ]

    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_id", "ts", "value")
        .toPandas()
    )
    expect = []
    for uid, g in ev.groupby("user_id"):
        order = g.sort_values(["ts", "event_id"])
        s = 0.0
        for eid, v in zip(order["event_id"], order["value"]):
            s = max(0.0, s + float(v) - CUSUM_K)
            if s > CUSUM_H:
                d = Decimal(repr(s)).quantize(
                    Decimal("0.000001"), rounding=ROUND_HALF_UP
                ).quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP)
                expect.append((int(uid), int(eid), float(d)))
                s = 0.0
    expect.sort()
    assert got == expect  # exact float equality, not approx
