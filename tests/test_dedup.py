"""Exact n-gram Jaccard dedup: the stop-shingle cap
(operators/dedup.py::_pair_jaccard) — hot-key candidate bound without
similarity distortion.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pgsink_spark.operators.dedup import (
    MAX_SHINGLE_FREQ,
    _pair_jaccard,
    doc_shingle_sets,
)


def _sets(spark, rows):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return doc_shingle_sets(docs, 3)


@pytest.mark.slow
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


def test_duplicate_spans_closed_form(spark, tmp_path):
    """A constructed corpus with one known shared 10-token substring:
    the island merge must emit exactly that span in both documents —
    start/end token positions and length from the closed form."""
    import pyspark.sql.functions as F

    from pgsink_spark.operators.dedup import dedup_duplicate_spans

    shared = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    d0 = f"unique0 prefix0 {shared} suffix0 tail0"
    d1 = f"other1 words1 here1 {shared} closing1"
    d2 = "totally different text with no overlap at all whatsoever"
    df = spark.createDataFrame(
        [(0, d0, "en", "s", len(d0)), (1, d1, "en", "s", len(d1)),
         (2, d2, "en", "s", len(d2))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out_dir = str(tmp_path / "docs")
    df.write.parquet(f"{out_dir}/documents.parquet")
    got = {
        (r["doc_id"], r["start_tok"], r["end_tok"], r["n_tokens"])
        for r in dedup_duplicate_spans(spark, out_dir).collect()
    }
    # d0: shared starts at token 2 (0-based) → span [2, 11], 10 tokens
    # d1: shared starts at token 3 → span [3, 12], 10 tokens
    assert got == {(0, 2, 11, 10), (1, 3, 12, 10)}


def test_lexical_pairs_integer_threshold_exact(spark, tmp_path):
    """The 25·dot² ≥ 16·na·nb integer predicate is exercised at a
    constructed boundary: two docs sharing enough vocabulary to sit
    just above cosine 0.8 match; a third just below does not."""
    from pgsink_spark.operators.dedup import dedup_lexical_pairs

    # docs 0/1: identical 5-term vectors → cos = 1 (≥ 0.8)
    # doc 2 shares 3 of 5 terms with doc 0 → cos = 3/5 = 0.6 (< 0.8)
    # every term appears in ≥2 docs so the df≥2 vocab keeps them;
    # filler terms are df=1 and fall out of the vocabulary
    t = ["red", "green", "blue", "cyan", "teal"]
    d0 = " ".join(t)
    d1 = " ".join(t) + " fillerx"
    d2 = " ".join(t[:3]) + " solo1 solo2"
    df = spark.createDataFrame(
        [(0, d0, "en", "s", 1), (1, d1, "en", "s", 1),
         (2, d2, "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out_dir = str(tmp_path / "docs")
    df.write.parquet(f"{out_dir}/documents.parquet")
    got = {
        (r["d1"], r["d2"], r["dot"])
        for r in dedup_lexical_pairs(spark, out_dir).collect()
    }
    # only (0,1): dot=5, na=nb=5 → 25·25 ≥ 16·25 true;
    # (0,2): dot=3, na=5, nb=3 → 25·9=225 < 16·15=240 false
    assert got == {(0, 1, 5)}


def test_stream_dedup_replay_equals_distinct(spark, sf_dir):
    """The availableNow replay-dedup stream equals batch DISTINCT on
    the single fixture copy (exactly-once from at-least-once)."""
    from pgsink_spark.operators.streaming_q import stream_dedup_replay

    got = stream_dedup_replay(spark, sf_dir)
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    assert got.count() == events.count()
    assert got.select("event_id").distinct().count() == events.count()


def test_cdc_chunking_resynchronizes_after_insertion(spark, tmp_path):
    """The CDC property fixed-size blocks lack: prepending text shifts
    every byte offset, yet most chunk hashes survive because cut
    points depend on content, not position — so the shifted document
    shares most of its chunks with the original (n_dup high for both),
    while an unrelated document shares none."""
    from pgsink_spark.operators.packing import chunk_cdc_rolling

    base = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "green turtles carry umbrellas across a windy bridge and the "
        "harbor lights flicker in patterns only the old keeper can "
        "read aloud to the patient gulls waiting near the rusted "
        "bollards for scraps of yesterday's catch under a pale moon"
    ) * 2
    shifted = "INSERTED PREFIX >>> " + base
    other = (
        "completely different content with no overlap whatsoever in "
        "any of its windows or chunks because every single token here "
        "differs from the originals in both vocabulary and order "
    ) * 3
    df = spark.createDataFrame(
        [(0, base, "en", "s", 1), (1, shifted, "en", "s", 1),
         (2, other, "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out_dir = str(tmp_path / "docs")
    df.write.parquet(f"{out_dir}/documents.parquet")
    got = {
        r["doc_id"]: (r["n_chunks"], r["n_dup"])
        for r in chunk_cdc_rolling(spark, out_dir).collect()
    }
    n0, d0 = got[0]
    n1, d1 = got[1]
    n2, d2 = got[2]
    assert n0 >= 4  # the text actually chunks
    # re-synchronization: a majority of the original's chunks survive
    # the prefix insertion verbatim
    assert d0 >= n0 / 2, got
    assert d1 >= d0  # shifted doc shares those same chunks
    assert d2 == 0  # unrelated content shares nothing


def test_incremental_probe_matches_full_lsh_cross_pairs(spark, sf_dir):
    """The batch-vs-index probe must find exactly the cross-half subset
    of what the full self-join LSH pass finds: same bands, same verify
    threshold, so (old, new) pairs agree pair-for-pair. This pins the
    incremental path's equivalence to the bootstrap path — the property
    that makes running it per-batch sound."""
    from pgsink_spark.operators.dedup import (
        dedup_incremental_probe,
        dedup_minhash_lsh,
    )

    full = {
        (r["d1"], r["d2"])
        for r in dedup_minhash_lsh(spark, sf_dir).collect()
    }
    cross = {
        (d1, d2)
        for d1, d2 in full
        if (d1 % 10 == 0) != (d2 % 10 == 0)
    }
    probe = {
        (min(r["new_id"], r["dup_of"]), max(r["new_id"], r["dup_of"]))
        for r in dedup_incremental_probe(spark, sf_dir).collect()
    }
    assert probe == cross


# ---------------------------------------------------------------------------
# Jaro-Winkler record linkage (dedup_jaro_winkler)
# ---------------------------------------------------------------------------


def test_jaro_winkler_kernel_matches_duckdb(sf_dir):
    """The Python kernel must be bit-identical to DuckDB's
    jaro_winkler_similarity (the oracle) on every fixture block pair —
    any drift in window/transposition/prefix semantics shows here
    before it shows at the gate."""
    import duckdb

    from pgsink_spark.operators.dedup import _jaro_winkler_py

    rows = duckdb.sql(
        f"""
        WITH d AS (SELECT doc_id, substr(lower(text),1,40) AS h,
                          string_split(lower(text),' ') AS w
                   FROM '{sf_dir}/documents.parquet'),
        k AS (SELECT doc_id, h, w[1] || ' ' || w[2] AS blk
              FROM d WHERE len(w) >= 2)
        SELECT a.h, b.h, jaro_winkler_similarity(a.h, b.h)
        FROM k a JOIN k b ON a.blk = b.blk AND a.doc_id < b.doc_id
        """
    ).fetchall()
    assert rows, "fixture produced no block pairs"
    for h1, h2, ref in rows:
        assert abs(_jaro_winkler_py(h1, h2) - ref) < 1e-12


def test_jaro_winkler_kernel_properties():
    from pgsink_spark.operators.dedup import _jaro_winkler_py as jw

    assert jw("martha", "martha") == 1.0
    assert jw("", "abc") == 0.0
    assert jw("ab", "ba") == 0.0  # window 0: no matches possible
    # textbook reference values
    assert abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-12
    assert abs(jw("dwayne", "duane") - 0.8400000000000001) < 1e-12
    # symmetry and bounds on a small grid
    words = ["crate", "trace", "carat", "cart", "create", "x"]
    for a in words:
        for b in words:
            v = jw(a, b)
            assert 0.0 <= v <= 1.0
            assert v == jw(b, a)
    # prefix bonus applies only above the 0.7 boost threshold
    assert jw("abcdxy", "abqrst") == 0.5555555555555555


def test_survivorship_matches_python_union_find(spark, sf_dir):
    """mdm_survivorship equals an independent union-find + rule replay:
    same clusters (from the same JW-blocked pairs), same golden doc
    (longest, tie min id), same dominant source (tie alphabetical)."""
    from collections import Counter

    from pgsink_spark.operators import dedup as D
    from pgsink_spark.sources.fixtures import load_table

    docs = {
        r.doc_id: (r.text, r.source, r.n_chars)
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    blocks: dict = {}
    for did, (text, _, _) in docs.items():
        w = text.lower().split(" ")
        if len(w) >= 2:
            blocks.setdefault((w[0], w[1]), []).append(
                (did, text.lower()[:40])
            )
    parent = {d: d for d in docs}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for _, ms in blocks.items():
        ms.sort()
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                if round(D._jaro_winkler_py(ms[i][1], ms[j][1]), 4) >= 0.92:
                    ra, rb = find(ms[i][0]), find(ms[j][0])
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
    clusters: dict = {}
    for d in docs:
        clusters.setdefault(find(d), []).append(d)
    expect = {}
    for _, ms in clusters.items():
        if len(ms) < 2:
            continue
        cid = min(ms)
        golden = min(ms, key=lambda d: (-docs[d][2], d))
        srcs = Counter(docs[d][1] for d in ms)
        top = min(srcs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        expect[cid] = (
            len(ms),
            golden,
            max(docs[d][2] for d in ms),
            sum(docs[d][2] for d in ms),
            top,
        )
    got = {
        r.cluster_id: (
            r.n_members, r.golden_doc, r.golden_chars, r.total_chars,
            r.top_source,
        )
        for r in D.mdm_survivorship(spark, sf_dir).collect()
    }
    assert got == expect


def test_linkage_hot_block_cap_bounds_candidates(spark):
    """One 100-member hot block (shared two-token prefix) must produce
    rank-window candidates — |block|×W, not |block|²/2 — and the Spark
    generator must agree pair-for-pair with the DuckDB oracle fragment
    (both encode the sorted-neighborhood rule, so driver hashes stay
    green even on data that trips the cap). Guards the quadratic knee
    the 100× scale probe measured (a 1400-member block → 165M pairs)."""
    import duckdb
    import pandas as pd

    from pgsink_spark.operators.dedup import (
        _BLOCKED_CAND_SQL,
        _blocked_head_candidates,
        LINKAGE_BLOCK_CAP,
        LINKAGE_SNM_WINDOW,
    )

    n = 100
    assert n > LINKAGE_BLOCK_CAP
    rows = [(i, f"common head words tail{i:03d}") for i in range(n)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cand = _blocked_head_candidates(docs)
    got = sorted((r.d1, r.d2) for r in cand.collect())

    w = LINKAGE_SNM_WINDOW
    expect_n = (n - w) * w + w * (w - 1) // 2
    assert len(got) == expect_n, (len(got), expect_n)
    assert len(got) < n * (n - 1) // 2  # strictly below all-pairs

    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    con = duckdb.connect()
    con.register("documents", pdf)
    oracle = con.execute(
        f"WITH {_BLOCKED_CAND_SQL} SELECT d1, d2 FROM cand ORDER BY d1, d2"
    ).fetchall()
    con.close()
    assert got == [(a, b) for a, b in oracle]


def test_ngram_overlap_matches_python_replay(spark, sf_dir):
    """decontaminate_ngram_overlap equals a plain-Python set replay:
    distinct eval 4-grams probed against the union of all train
    4-grams, integer ppm, 20% verdict."""
    from pgsink_spark.operators.dedup import (
        EVAL_SPLIT_ID,
        NGO_N,
        NGO_THRESHOLD_PPM,
        decontaminate_ngram_overlap,
    )
    from pgsink_spark.sources.fixtures import load_table

    docs = [
        (r.doc_id, r.text.lower().split(" "))
        for r in load_table(spark, sf_dir, "documents").collect()
    ]

    def grams(w):
        return {
            " ".join(w[i : i + NGO_N]) for i in range(len(w) - NGO_N + 1)
        }

    train = set()
    for d, w in docs:
        if d >= EVAL_SPLIT_ID and len(w) >= NGO_N:
            train |= grams(w)
    expect = {}
    for d, w in docs:
        if d < EVAL_SPLIT_ID and len(w) >= NGO_N:
            g = grams(w)
            hit = len(g & train)
            ppm = 1_000_000 * hit // len(g)
            expect[d] = (len(g), hit, ppm, ppm >= NGO_THRESHOLD_PPM)

    got = {
        r.doc_id: (r.n_grams, r.n_hit, r.overlap_ppm, r.contaminated)
        for r in decontaminate_ngram_overlap(spark, sf_dir).collect()
    }
    assert got == expect


def test_source_overlap_matches_python_replay(spark, sf_dir):
    """corpus_source_overlap equals a plain-Python per-source gram-set
    replay (sizes, intersections, integer-ppm Jaccard), and the matrix
    is symmetric by construction (only src_a < src_b pairs emitted)."""
    from pgsink_spark.operators.dedup import NGO_N, corpus_source_overlap
    from pgsink_spark.sources.fixtures import load_table

    by_src: dict = {}
    for r in load_table(spark, sf_dir, "documents").collect():
        w = r.text.lower().split(" ")
        if len(w) < NGO_N:
            continue
        g = by_src.setdefault(r.source, set())
        g |= {" ".join(w[i : i + NGO_N]) for i in range(len(w) - NGO_N + 1)}

    expect = {}
    srcs = sorted(by_src)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            shared = len(by_src[a] & by_src[b])
            if shared:
                na, nb = len(by_src[a]), len(by_src[b])
                expect[(a, b)] = (
                    na,
                    nb,
                    shared,
                    1_000_000 * shared // (na + nb - shared),
                )

    got = {
        (r.src_a, r.src_b): (r.n_a, r.n_b, r.n_shared, r.jaccard_ppm)
        for r in corpus_source_overlap(spark, sf_dir).collect()
    }
    assert got == expect
    assert all(a < b for a, b in got)


def test_bounded_broadcast_guard_on_decontamination_shape(spark):
    """The generic broadcast guard (r6 verdict item 5): passes small
    frames through with identical content, fails fast over the cap."""
    import pytest

    from pgsink_spark.operators.evaluation import bounded_broadcast

    small = spark.range(7).selectExpr("id AS doc_id", "'a b c d' AS s")
    out = bounded_broadcast(small, 10, "eval shingles")
    assert sorted(r.doc_id for r in out.collect()) == list(range(7))

    big = spark.range(100).selectExpr("id AS doc_id")
    with pytest.raises(ValueError, match="refusing to broadcast"):
        bounded_broadcast(big, 10, "eval shingles")


def test_lsh_band_curve_matches_python_replay(spark, sf_dir):
    """dedup_lsh_band_curve: the candidate-superset chain holds and
    each config's verified hits (recomputed in pure Python from the
    same xxhash64 signatures pulled off Spark) meet the floors; the
    exact pair count matches the postings-join truth."""
    from pgsink_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        LSH_CURVE_CONFIGS,
        LSH_CURVE_FLOORS_PPM,
        MAX_SHINGLE_FREQ,
        N_HASHES,
        _pair_jaccard,
        dedup_lsh_band_curve,
        doc_shingle_sets,
        minhash_signatures,
    )
    from pgsink_spark.sources.fixtures import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    sets = doc_shingle_sets(docs, 3)
    exact = {
        (r["d1"], r["d2"])
        for r in _pair_jaccard(sets, max_shingle_freq=MAX_SHINGLE_FREQ)
        .where(F.col("jac") >= JACCARD_THRESHOLD)
        .select("d1", "d2")
        .collect()
    }
    # pull signatures once; replay banding + candidate generation in
    # pure Python (xxhash64 itself is Spark-computed — the replay
    # targets the BANDING/monotonicity logic, the oracle pins counts)
    sig_rows = minhash_signatures(sets).collect()
    sigs = {r["doc_id"]: list(r["sig"]) for r in sig_rows}
    import collections

    prev = None
    expect_rows = []
    for b, r in LSH_CURVE_CONFIGS:
        buckets = collections.defaultdict(list)
        for d, sig in sigs.items():
            for band in range(b):
                key = (band, tuple(sig[band * r : band * r + r]))
                buckets[key].append(d)
        cand = set()
        for ds in buckets.values():
            ds.sort()
            for i in range(len(ds)):
                for j in range(i + 1, len(ds)):
                    cand.add((ds[i], ds[j]))
        if prev is not None:
            assert prev <= cand, "aligned bands must nest candidates"
        prev = cand
        hits = len(exact & cand)
        floor_ok = (
            not exact
            or 1_000_000 * hits // len(exact) >= LSH_CURVE_FLOORS_PPM[b]
        )
        expect_rows.append((b, r, len(exact), True, floor_ok))
        assert floor_ok
    got = [
        (
            x["bands"],
            x["rows_per_band"],
            x["n_exact_pairs"],
            x["monotone_ok"],
            x["recall_floor_ok"],
        )
        for x in dedup_lsh_band_curve(spark, sf_dir).collect()
    ]
    assert got == expect_rows
    assert sum(b * r for b, r in LSH_CURVE_CONFIGS) == 4 * N_HASHES


def test_lsh_hot_bucket_cap_headroom_and_equivalence(spark, sf_dir):
    """(a) No fixture band bucket reaches LSH_BUCKET_CAP — so the
    capped clustering provably equals the uncapped one where the
    driver hash pins it; (b) forcing the cap to bind (cap=2, all
    buckets ≥ 3 switch to chain+dual-star) leaves the CLUSTERING unchanged
    on real dup structure — connectivity and canonical mins survive
    candidate sparsification because every emitted edge is still
    exact-verified and dup clusters chain."""
    from pyspark.sql import functions as F

    from pgsink_spark.operators.dedup import (
        LSH_BUCKET_CAP,
        dedup_cluster,
        doc_shingle_sets,
        minhash_band_keys,
        _lsh_verified_pairs,
    )
    from pgsink_spark.sources.fixtures import load_table

    docs = load_table(spark, sf_dir, "documents")
    bands = minhash_band_keys(doc_shingle_sets(docs, 3))
    (mx,) = bands.groupBy("bkey").count().agg(F.max("count")).first()
    assert mx < LSH_BUCKET_CAP

    base = {
        (r["doc_id"], r["canonical_id"], r["is_canonical"])
        for r in dedup_cluster(spark, sf_dir).collect()
    }

    sets = doc_shingle_sets(docs, 3)
    from pgsink_spark.operators.dedup import connected_components

    capped_pairs = _lsh_verified_pairs(sets, bucket_cap=2)
    comp = connected_components(capped_pairs)
    capped = {
        (r["doc_id"], r["canonical_id"], r["is_canonical"])
        for r in docs.select("doc_id")
        .join(comp, docs["doc_id"] == comp["node"], "left")
        .select(
            "doc_id",
            F.coalesce(F.col("component"), F.col("doc_id")).alias(
                "canonical_id"
            ),
        )
        .withColumn("is_canonical", F.col("doc_id") == F.col("canonical_id"))
        .collect()
    }
    assert capped == base
    # Verified-pair parity: with chain+dual-star the capped candidate
    # SET equals all-pairs on every bucket of size <= 4 (the fixture
    # max), so the verified outputs must be IDENTICAL — equality, not
    # <=, is the strongest fixture-level check here. Strict candidate
    # reduction is asserted on a synthetic size-8 bucket in
    # test_band_candidates_cap_rewires_generation, where the cap
    # demonstrably binds.
    all_pairs = {
        (r["d1"], r["d2"]) for r in _lsh_verified_pairs(sets).collect()
    }
    cap_pairs = {(r["d1"], r["d2"]) for r in capped_pairs.collect()}
    assert cap_pairs == all_pairs


def test_band_candidates_cap_rewires_generation(spark):
    """Direct candidate-set check (ADVICE r8): on a synthetic size-8
    bucket with cap=2, _band_candidates must emit EXACTLY the
    chain + star(m[0]) + star(m[1]) set (3n-6 = 18 pairs), strictly
    smaller than the 28 all-pairs — a regression where bucket_cap is
    silently ignored flips this to the full 28 and fails."""
    from pgsink_spark.operators.dedup import _band_candidates

    members = list(range(1, 9))
    bands = spark.createDataFrame(
        [(d, 7777) for d in members], "doc_id long, bkey long"
    )
    got = {
        (r["d1"], r["d2"])
        for r in _band_candidates(bands, bucket_cap=2).collect()
    }
    chain = {(a, a + 1) for a in range(1, 8)}
    star = {(1, y) for y in range(3, 9)}
    star2 = {(2, y) for y in range(4, 9)}
    expected = chain | star | star2
    assert got == expected
    assert len(expected) == 3 * len(members) - 6
    n_all_pairs = len(members) * (len(members) - 1) // 2
    assert len(got) < n_all_pairs
    # and below the cap it is exact all-pairs
    got_uncapped = {
        (r["d1"], r["d2"])
        for r in _band_candidates(bands, bucket_cap=8).collect()
    }
    assert got_uncapped == {
        (a, b) for a in members for b in members if a < b
    }


def test_cdc_chunk_kernel_matches_sequential_recurrence(spark, sf_dir):
    """_cdc_chunk_stream's vectorized sliding-window hash must produce
    exactly the cuts/chunk-hashes of the sequential add/remove
    recurrence it replaced (H_i = (c_i + 31·H_{i-1} − c_{i-8}·28417)
    mod 2^16, cut when size(win) ≥ 7 and H % 64 == 0), replayed here
    per document in pure Python."""
    import hashlib

    import pandas as pd

    from pgsink_spark.operators.packing import _cdc_chunk_stream
    from pgsink_spark.sources.fixtures import load_table

    docs = [
        (r.doc_id, r.text)
        for r in load_table(spark, sf_dir, "documents")
        .where(F.length("text") >= 8)
        .select("doc_id", "text")
        .limit(300)
        .collect()
    ]
    assert docs

    def replay(text: str) -> list[str]:
        win: list[int] = []
        h = 0
        start = 1
        out: list[str] = []
        for i, ch in enumerate(text, start=1):
            c = ord(ch)
            removal = win[0] * 28417 if len(win) == 8 else 0
            boundary_ok = len(win) >= 7
            if len(win) == 8:
                win = win[1:] + [c]
            else:
                win = win + [c]
            h = (c + 31 * h - removal) % 65536
            if boundary_ok and h % 64 == 0:
                out.append(
                    hashlib.md5(
                        text[start - 1 : i].encode("utf-8")
                    ).hexdigest()
                )
                start = i + 1
        if start <= len(text):
            out.append(
                hashlib.md5(text[start - 1 :].encode("utf-8")).hexdigest()
            )
        return out

    pdf = pd.DataFrame(docs, columns=["doc_id", "text"])
    got: dict[int, list[str]] = {}
    for out in _cdc_chunk_stream(iter([pdf])):
        for doc_id, hh in zip(out["doc_id"], out["h"]):
            got.setdefault(int(doc_id), []).append(hh)
    for doc_id, text in docs:
        assert got.get(doc_id, []) == replay(text), doc_id


@pytest.mark.slow
def test_lsh_band_curve_fused_hits_match_candidate_joins(spark, sf_dir):
    """dedup_lsh_band_curve's one-aggregate hit fold must equal the
    pre-r10 shape — per-config bucket-key self-join candidates
    semi-joined against the exact pair set."""
    from pgsink_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        LSH_CURVE_CONFIGS,
        LSH_CURVE_FLOORS_PPM,
        MAX_SHINGLE_FREQ,
        _pair_jaccard,
        dedup_lsh_band_curve,
        doc_shingle_sets,
        minhash_signatures,
    )
    from pgsink_spark.sources.fixtures import load_table

    docs = load_table(spark, sf_dir, "documents")
    sets = doc_shingle_sets(docs, 3)
    exact = (
        _pair_jaccard(sets, max_shingle_freq=MAX_SHINGLE_FREQ)
        .where(F.col("jac") >= JACCARD_THRESHOLD)
        .select("d1", "d2")
        .localCheckpoint(eager=True)
    )
    sigs = minhash_signatures(sets).localCheckpoint(eager=True)
    n_exact = exact.count()
    old_hits = []
    for b, r in LSH_CURVE_CONFIGS:
        keys = sigs.select(
            "doc_id",
            F.explode(
                F.array(
                    *[
                        F.xxhash64(
                            F.lit(band),
                            *[F.col("sig")[band * r + j] for j in range(r)],
                        )
                        for band in range(b)
                    ]
                )
            ).alias("bkey"),
        )
        a = keys.select(F.col("doc_id").alias("d1"), "bkey")
        bb = keys.select(F.col("doc_id").alias("d2"), "bkey")
        cand = (
            a.join(bb, "bkey")
            .where(F.col("d1") < F.col("d2"))
            .select("d1", "d2")
            .distinct()
        )
        old_hits.append(exact.join(cand, ["d1", "d2"], "left_semi").count())

    got = {
        r_["bands"]: (
            r_["n_exact_pairs"],
            r_["monotone_ok"],
            r_["recall_floor_ok"],
        )
        for r_ in dedup_lsh_band_curve(spark, sf_dir).collect()
    }
    prev = -1
    mono = True
    for (b, r), h in zip(LSH_CURVE_CONFIGS, old_hits):
        mono = mono and h >= prev
        prev = h
        assert got[b] == (
            n_exact,
            mono,
            n_exact == 0
            or 1_000_000 * h // n_exact >= LSH_CURVE_FLOORS_PPM[b],
        ), (b, h, got[b])


@pytest.mark.slow
def test_pair_jaccard_local_kernel_matches_joins(spark, sf_dir):
    """The r10 size-gated single-task pair kernel must emit exactly
    what the exploded self-join plan emits — capped and uncapped, on
    both the synthetic hot-shingle corpus and the real fixture."""
    import pgsink_spark.operators.dedup as D

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    synth = _sets(
        spark,
        [
            (
                i,
                ("alpha beta gamma " if i < 2 else f"u{i}a u{i}b u{i}c ")
                + "terms of service apply",
            )
            for i in range(30)
        ],
    )
    cases = [
        # (sets, cap, pairs_must_exist) — at cap=1 every shared
        # shingle in the synth corpus is hot, so empty IS the right
        # answer on both paths
        (doc_shingle_sets(docs, 3), MAX_SHINGLE_FREQ, True),
        (doc_shingle_sets(docs, 3), None, True),
        (synth, 10, True),
        (synth, 1, False),
        (synth, None, True),
    ]
    orig = D.PAIR_LOCAL_POSTINGS_CAP
    try:
        for sets, cap, must_exist in cases:
            sets = sets.persist()
            D.PAIR_LOCAL_POSTINGS_CAP = 10**12  # kernel
            kern = {
                (r["d1"], r["d2"]): (r["inter"], r["n1"], r["n2"], r["jac"])
                for r in _pair_jaccard(sets, max_shingle_freq=cap).collect()
            }
            D.PAIR_LOCAL_POSTINGS_CAP = -1  # distributed
            dist = {
                (r["d1"], r["d2"]): (r["inter"], r["n1"], r["n2"], r["jac"])
                for r in _pair_jaccard(sets, max_shingle_freq=cap).collect()
            }
            assert kern == dist
            assert kern or not must_exist
            sets.unpersist()
    finally:
        D.PAIR_LOCAL_POSTINGS_CAP = orig


def test_pair_kernel_emit_filter_matches_consumer_predicate(spark, sf_dir):
    """The r11 kernel_emit push-down must emit exactly the rows the
    consumer's own Spark-side filter would keep from the unfiltered
    kernel output — for both the jac and the (directional) containment
    cut."""
    import pgsink_spark.operators.dedup as D

    sets = doc_shingle_sets(
        spark.read.parquet(f"{sf_dir}/documents.parquet"), 3
    ).persist()
    orig = D.PAIR_LOCAL_POSTINGS_CAP
    try:
        D.PAIR_LOCAL_POSTINGS_CAP = 10**12  # kernel branch
        full = _pair_jaccard(sets, max_shingle_freq=MAX_SHINGLE_FREQ)
        rows = full.collect()
        jac_want = sorted(
            tuple(r) for r in rows if r["jac"] >= D.JACCARD_THRESHOLD
        )
        ct_want = sorted(
            tuple(r)
            for r in rows
            if r["inter"] / r["n1"] >= D.CONTAINMENT_THRESHOLD
            or r["inter"] / r["n2"] >= D.CONTAINMENT_THRESHOLD
        )
        jac_got = sorted(
            tuple(r)
            for r in _pair_jaccard(
                sets,
                max_shingle_freq=MAX_SHINGLE_FREQ,
                kernel_emit=("jac", D.JACCARD_THRESHOLD),
            ).collect()
        )
        ct_got = sorted(
            tuple(r)
            for r in _pair_jaccard(
                sets,
                max_shingle_freq=MAX_SHINGLE_FREQ,
                kernel_emit=("containment", D.CONTAINMENT_THRESHOLD),
            ).collect()
        )
        assert jac_got == jac_want and jac_want
        assert ct_got == ct_want and ct_want
    finally:
        D.PAIR_LOCAL_POSTINGS_CAP = orig
        sets.unpersist()


@pytest.mark.slow
def test_cc_local_kernel_matches_distributed_loop(spark, sf_dir):
    """The r10 size-gated union-find kernel must emit exactly the
    min-label fixpoint the distributed propagation loop emits — on the
    real fixture pair graph and on a synthetic chain+forest whose
    diameter forces several propagation rounds."""
    import pgsink_spark.operators.dedup as D

    fixture = (
        D._lsh_verified_pairs(
            D.doc_shingle_sets(
                spark.read.parquet(f"{sf_dir}/documents.parquet"), 3
            ),
            bucket_cap=D.LSH_BUCKET_CAP,
        )
        .select("d1", "d2")
        .localCheckpoint(eager=True)
    )
    # chain 0-1-...-9 (diameter 9), triangle {20,21,22}, isolated edge
    synth = spark.createDataFrame(
        [(i, i + 1) for i in range(9)]
        + [(20, 21), (21, 22), (20, 22), (30, 31)],
        "d1 long, d2 long",
    ).localCheckpoint(eager=True)
    orig = D.CC_LOCAL_EDGE_CAP
    try:
        for edges in (fixture, synth):
            D.CC_LOCAL_EDGE_CAP = 10**12  # kernel
            kern = {
                (r["node"], r["component"])
                for r in D.connected_components(edges).collect()
            }
            D.CC_LOCAL_EDGE_CAP = -1  # distributed loop
            dist = {
                (r["node"], r["component"])
                for r in D.connected_components(edges).collect()
            }
            assert kern == dist and kern
    finally:
        D.CC_LOCAL_EDGE_CAP = orig


@pytest.mark.slow
def test_cc_distributed_loop_raises_on_round_budget_exhaustion(spark):
    """ADVICE r10: the distributed min-label loop must never silently
    return non-converged labels — a graph deeper than max_iters hops
    raises, and with an adequate budget both branches agree on the
    fixpoint."""
    import pytest

    import pgsink_spark.operators.dedup as D

    # chain 0-1-...-99: diameter 99. With pointer jumping (r11) the
    # reach roughly doubles per round, so 2 rounds cover ≲ 8 hops
    # (still raises) while 10 rounds cover ~2¹⁰ (converges).
    deep = spark.createDataFrame(
        [(i, i + 1) for i in range(99)], "d1 long, d2 long"
    ).localCheckpoint(eager=True)
    orig = D.CC_LOCAL_EDGE_CAP
    try:
        D.CC_LOCAL_EDGE_CAP = -1  # force the distributed loop
        with pytest.raises(RuntimeError, match="did not"):
            D.connected_components(deep, max_iters=2).collect()
        dist = {
            (r["node"], r["component"])
            for r in D.connected_components(deep, max_iters=10).collect()
        }
        D.CC_LOCAL_EDGE_CAP = 10**12  # kernel
        kern = {
            (r["node"], r["component"])
            for r in D.connected_components(deep).collect()
        }
        assert dist == kern == {(i, 0) for i in range(100)}
    finally:
        D.CC_LOCAL_EDGE_CAP = orig
