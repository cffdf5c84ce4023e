"""Graph-operator invariants beyond the oracle hash: structural
properties that would survive an oracle/implementation bug made in
tandem (both sides computing the same wrong thing)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pgsink_spark.operators.graph import (
    RA_SCALE,
    graph_linkpred,
    graph_pagerank,
)
from pgsink_spark.sources.fixtures import load_table


def _edge_set(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    edges = set()
    for (d,) in docs.collect():
        for dst in ((d * d * 7 + 1) % n, (d * 13 + 3) % n,
                    (d + 50) % n, (d + 100) % n):
            if dst != d:
                edges.add((min(d, dst), max(d, dst)))
    return edges, n


def test_linkpred_never_predicts_existing_edges(spark, sf_dir):
    edges, n = _edge_set(spark, sf_dir)
    rows = graph_linkpred(spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        assert (r["src"], r["dst"]) not in edges
        assert r["src"] < r["dst"]
        assert 1 <= r["cn"]
        # each common neighbor contributes at most RA_SCALE // 2
        # (min undirected degree of any node on this graph is 2)
        assert r["ra_scaled"] <= r["cn"] * (RA_SCALE // 2)
        assert r["ra_scaled"] >= r["cn"]  # deg <= n so each term >= 1


def test_pagerank_mass_is_conserved_up_to_flooring(spark, sf_dir):
    """Total scaled rank stays within the flooring loss bound of n *
    PR_SCALE: each iteration floors at most 1 unit per node per term."""
    from pgsink_spark.operators.graph import PR_ITERS, PR_SCALE

    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    top = graph_pagerank(spark, sf_dir).collect()
    assert len(top) == 20
    assert all(r["rank_scaled"] > 0 for r in top)
    # the top-ranked node must beat the dangling floor 0.15 * PR_SCALE
    assert top[0]["rank_scaled"] >= 15 * PR_SCALE // 100


def test_rolling_zscore_flags_are_extreme(spark, sf_dir):
    from pgsink_spark.operators.relational import QUERIES

    rows = QUERIES["d69_rolling_zscore"](spark, sf_dir).collect()
    assert rows
    assert all(abs(r["z"]) >= 3 for r in rows)


def test_ohlc_bars_are_consistent(spark, sf_dir):
    from pgsink_spark.operators.relational import QUERIES

    rows = QUERIES["d70_ohlc_resample"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["low"] <= r["open"] <= r["high"]
        assert r["low"] <= r["close"] <= r["high"]
        assert r["n"] >= 3


def test_attribution_lags_bounded(spark, sf_dir):
    from pgsink_spark.operators.relational import QUERIES

    rows = QUERIES["d71_attribution"](spark, sf_dir).collect()
    assert rows
    attributed = [r for r in rows if r["attributed"]]
    assert attributed
    for r in rows:
        if r["attributed"]:
            assert r["lag_s"] is not None and 0 <= r["lag_s"] <= 86400
        else:
            assert r["lag_s"] is None


def test_eval_metrics_sanity(spark, sf_dir):
    """Lang-id metrics: counts partition the corpus; quality-score AUC
    discriminates long docs well above chance."""
    from pgsink_spark.operators.evaluation import (
        eval_langid_metrics,
        eval_score_auc,
    )
    from pgsink_spark.sources.fixtures import load_table

    n_docs = load_table(spark, sf_dir, "documents").count()
    rows = eval_langid_metrics(spark, sf_dir).collect()
    assert sum(r["tp"] for r in rows) + sum(r["fn"] for r in rows) == n_docs
    assert sum(r["tp"] for r in rows) + sum(r["fp"] for r in rows) == n_docs
    for r in rows:
        if r["prec"] is not None:
            assert 0.0 <= r["prec"] <= 1.0
        if r["rec"] is not None:
            assert 0.0 <= r["rec"] <= 1.0

    (auc_row,) = eval_score_auc(spark, sf_dir).collect()
    assert auc_row["n_pos"] > 0 and auc_row["n_neg"] > 0
    assert 0.6 <= auc_row["auc"] <= 1.0


def test_kcore_matches_python_peel_and_converges(spark, sf_dir):
    """graph_kcore equals an independent pure-Python peel to fixpoint
    (not just the unrolled-8 oracle): same membership, same final
    degrees, fixpoint genuinely reached inside the 8-round budget, and
    the core is non-vacuous (strictly between empty and everything)."""
    from collections import defaultdict

    from pgsink_spark.operators import graph as g
    from pgsink_spark.operators.relational import QUERIES
    from pgsink_spark.sources.fixtures import load_table

    got = {
        r.doc_id: r.deg
        for r in QUERIES["graph_kcore"](spark, sf_dir).collect()
    }
    ids = [
        r.doc_id
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .collect()
    ]
    n = len(ids)
    edges = set()
    for d in ids:
        for dst in [(d * d * 7 + 1) % n, (d * 13 + 3) % n]:
            if dst != d:
                edges.add((min(d, dst), max(d, dst)))
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    alive = set(adj)
    rounds = 0
    while True:
        deg = {v: sum(1 for z in adj[v] if z in alive) for v in alive}
        nxt = {v for v, dg in deg.items() if dg >= g.KCORE_K}
        rounds += 1
        if nxt == alive:
            break
        alive = nxt
    assert rounds <= g.KCORE_ITERS, "fixture must converge in budget"
    assert 0 < len(alive) < n, "core must be non-vacuous"
    final = {v: sum(1 for z in adj[v] if z in alive) for v in alive}
    assert got == final


def test_bounded_class_list_guard(spark):
    """The confusion-matrix class broadcast must fail fast on a
    high-cardinality class column (r5 verdict item 6): the
    distinct→broadcast→crossJoin pattern is only valid for enum-like
    labels, and the guard makes that contract explicit."""
    import pytest

    from pgsink_spark.operators.evaluation import bounded_class_list

    small = spark.range(5).selectExpr("CAST(id AS STRING) AS class")
    out = bounded_class_list(small, max_card=10)
    # the guard returns the checkpointed bounded frame (one shared
    # computation for guard + broadcast) with the full class list
    assert sorted(r["class"] for r in out.collect()) == sorted(
        r["class"] for r in small.collect()
    )

    big = spark.range(50).selectExpr("CAST(id AS STRING) AS class")
    with pytest.raises(ValueError, match="distinct values"):
        bounded_class_list(big, max_card=10)


def test_label_propagation_matches_python_replay(spark, sf_dir):
    """graph_label_propagation equals an independent plain-Python
    replay of the 4 synchronous rounds (most-frequent neighbor label,
    min-label tie-break) — not the DuckDB oracle, a third
    implementation — and community sizes sum to the node census."""
    from collections import Counter, defaultdict

    from pgsink_spark.operators.graph import (
        LPA_ITERS,
        graph_label_propagation,
    )
    from pgsink_spark.sources.fixtures import load_table

    ids = [
        r.doc_id
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .collect()
    ]
    n = len(ids)
    nbrs = defaultdict(set)
    for i in ids:
        for d in ((i * i * 7 + 1) % n, (i * 13 + 3) % n):
            if d != i:
                nbrs[i].add(d)
                nbrs[d].add(i)
    lbl = {v: v for v in nbrs}
    for _ in range(LPA_ITERS):
        new = {}
        for v, zs in nbrs.items():
            votes = Counter(lbl[z] for z in zs)
            best = min(votes.items(), key=lambda kv: (-kv[1], kv[0]))
            new[v] = best[0]
        lbl = new
    sizes = Counter(lbl.values())
    expect = sorted(sizes.items(), key=lambda kv: (-kv[1], kv[0]))[:20]

    got = [
        (r.community, r.n_members)
        for r in graph_label_propagation(spark, sf_dir).collect()
    ]
    assert got == expect
    assert sum(sizes.values()) == len(nbrs)


def test_edge_generator_doc_id_range_guard(spark, sf_dir):
    """7·doc_id² must stay in int64 (DuckDB errors on overflow, Spark
    silently wraps — a cross-engine divergence). _EDGE_DOC_ID_MAX pins
    the documented bound; the fixtures must sit far inside it."""
    from pgsink_spark.operators.graph import _EDGE_DOC_ID_MAX

    assert 7 * _EDGE_DOC_ID_MAX * _EDGE_DOC_ID_MAX + 1 < 2**63
    max_id = (
        load_table(spark, sf_dir, "documents")
        .agg(F.max("doc_id"))
        .collect()[0][0]
    )
    assert max_id < _EDGE_DOC_ID_MAX


def test_bfs_distance_matches_python_replay(spark, sf_dir):
    """graph_bfs_distance equals an independent plain-Python BFS over
    the same sparse edge set (seeds ≡ 0 mod 97, 4 rounds)."""
    from collections import defaultdict

    from pgsink_spark.operators.graph import (
        BFS_ROUNDS,
        BFS_SEED_MOD,
        graph_bfs_distance,
    )
    from pgsink_spark.sources.fixtures import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id").collect()
    n = len(docs)
    nbr = defaultdict(set)
    for (d,) in docs:
        for dst in ((d * d * 7 + 1) % n, (d * 13 + 3) % n):
            if dst != d:
                nbr[d].add(dst)
                nbr[dst].add(d)
    frontier = {v for v in nbr if v % BFS_SEED_MOD == 0}
    visited = set(frontier)
    levels = {0: set(frontier)}
    for k in range(1, BFS_ROUNDS + 1):
        nxt = set()
        for v in frontier:
            nxt |= nbr[v]
        frontier = nxt - visited
        visited |= frontier
        levels[k] = set(frontier)
    expect = {
        k: (len(s), min(s), max(s)) for k, s in levels.items() if s
    }
    rows = graph_bfs_distance(spark, sf_dir).collect()
    got = {
        r["dist"]: (r["n_nodes"], r["min_node"], r["max_node"]) for r in rows
    }
    assert got == expect
    # level sets are disjoint and level 0 is exactly the seed set
    assert got[0][0] == len({v for v in nbr if v % BFS_SEED_MOD == 0})


def test_modularity_matches_python_replay(spark, sf_dir):
    """graph_modularity equals an independent Python computation of
    Newman Q (integer form) over the python-replayed LPA labels."""
    from collections import defaultdict

    from pgsink_spark.operators.graph import (
        LPA_ITERS,
        graph_modularity,
    )
    from pgsink_spark.sources.fixtures import load_table

    ids = [
        r.doc_id
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .collect()
    ]
    n = len(ids)
    nbrs = defaultdict(set)
    for i in ids:
        for d in ((i * i * 7 + 1) % n, (i * 13 + 3) % n):
            if d != i:
                nbrs[i].add(d)
                nbrs[d].add(i)
    lbl = {v: v for v in nbrs}
    for _ in range(LPA_ITERS):
        new = {}
        for v, zs in nbrs.items():
            votes = defaultdict(int)
            for z in zs:
                votes[lbl[z]] += 1
            new[v] = min(votes, key=lambda c: (-votes[c], c))
        lbl = new
    m2 = sum(len(zs) for zs in nbrs.values())
    d_c = defaultdict(int)
    e2_c = defaultdict(int)
    for v, zs in nbrs.items():
        d_c[lbl[v]] += len(zs)
        for z in zs:
            if lbl[z] == lbl[v]:
                e2_c[lbl[v]] += 1
    q_num = sum(m2 * e2_c[c] - d_c[c] * d_c[c] for c in d_c)
    (row,) = graph_modularity(spark, sf_dir).collect()
    assert row["n_communities"] == len(d_c)
    assert row["m_edges"] == m2 // 2
    assert row["q_num"] == q_num
    assert row["q_den"] == m2 * m2
    # Q is bounded: -1/2 <= Q <= 1 (tiny fixtures can go negative)
    assert -row["q_den"] <= 2 * row["q_num"] <= 2 * row["q_den"]


def _py_raters(doc_id: int, lang: str) -> tuple[str, str]:
    """Independent replay of the two deterministic noisy labelers."""
    import hashlib

    from pgsink_spark.operators.evaluation import (
        KAPPA_B_CORRUPT_PCT,
        KAPPA_B_SALT,
        KAPPA_CORRUPT_PCT,
    )

    def bucket(x: int) -> int:
        return int(hashlib.md5(str(x).encode()).hexdigest()[:8], 16) % 100

    rot = {"en": "fr", "fr": "es", "es": "de", "de": "zh", "zh": "en"}
    a = "en" if bucket(doc_id) < KAPPA_CORRUPT_PCT else lang
    b = (
        rot[lang]
        if bucket(doc_id + KAPPA_B_SALT) < KAPPA_B_CORRUPT_PCT
        else lang
    )
    return a, b


def test_confusion_matrix_matches_python_replay(spark, sf_dir):
    """eval_confusion_matrix equals a pure-Python confusion census:
    same cells, same counts, exact floor row_ppm, the cell counts
    partition the corpus, and the matrix is non-degenerate (has
    off-diagonal mass)."""
    from collections import Counter

    from pgsink_spark.operators.relational import QUERIES
    from pgsink_spark.sources.fixtures import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang"
    ).collect()
    cells = Counter(
        (r["lang"], _py_raters(r["doc_id"], r["lang"])[0]) for r in docs
    )
    row_tot = Counter()
    for (t, _), n in cells.items():
        row_tot[t] += n
    expect = {
        (t, pd): (n, 1_000_000 * n // row_tot[t])
        for (t, pd), n in cells.items()
    }
    got = {
        (r["true_lang"], r["pred_lang"]): (r["n"], r["row_ppm"])
        for r in QUERIES["eval_confusion_matrix"](spark, sf_dir).collect()
    }
    assert got == expect
    assert sum(n for n, _ in got.values()) == len(docs)
    assert any(t != p for t, p in got), "matrix must have error cells"
    assert any(t == p for t, p in got), "matrix must have diagonal mass"


def test_cohens_kappa_matches_python_replay(spark, sf_dir):
    """eval_cohens_kappa equals the textbook computation done in pure
    Python over the same deterministic raters, including the exact
    integer ppm floors; the fixture regime is agreement well beyond
    chance but below perfect."""
    from collections import Counter

    from pgsink_spark.operators.relational import QUERIES
    from pgsink_spark.sources.fixtures import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang"
    ).collect()
    pairs = [_py_raters(r["doc_id"], r["lang"]) for r in docs]
    n = len(pairs)
    agree = sum(1 for a, b in pairs if a == b)
    ma = Counter(a for a, _ in pairs)
    mb = Counter(b for _, b in pairs)
    pe_num = sum(ma[c] * mb[c] for c in set(ma) | set(mb))
    num = agree * n - pe_num
    den = n * n - pe_num
    kappa = 1_000_000 * num // den if num >= 0 else -(1_000_000 * -num // den)
    (row,) = QUERIES["eval_cohens_kappa"](spark, sf_dir).collect()
    assert row["n"] == n and row["agree"] == agree
    assert row["po_ppm"] == 1_000_000 * agree // n
    assert row["pe_ppm"] == 1_000_000 * pe_num // (n * n)
    assert row["kappa_ppm"] == kappa
    assert 300_000 < row["kappa_ppm"] < 990_000


def test_jaccard_edges_matches_python_replay(spark, sf_dir):
    """graph_jaccard_edges equals a pure-Python neighbor-set Jaccard
    over the same densified edge generator, including exact ppm
    floors; every output row is a real edge with >=1 common
    neighbor."""
    from collections import defaultdict

    from pgsink_spark.operators.relational import QUERIES
    from pgsink_spark.sources.fixtures import load_table

    ids = [
        r["doc_id"]
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .collect()
    ]
    n = len(ids)
    edges = set()
    for d in ids:
        for dst in (
            (d * d * 7 + 1) % n,
            (d * 13 + 3) % n,
            (d + 50) % n,
            (d + 100) % n,
        ):
            if dst != d:
                edges.add((min(d, dst), max(d, dst)))
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    expect = {}
    for a, b in edges:
        common = len(adj[a] & adj[b])
        if common:
            union = len(adj[a] | adj[b])
            expect[(a, b)] = (common, union, 1_000_000 * common // union)
    got = {
        (r["a"], r["b"]): (r["n_common"], r["n_union"], r["jaccard_ppm"])
        for r in QUERIES["graph_jaccard_edges"](spark, sf_dir).collect()
    }
    assert got == expect
    assert got, "densified graph must have embedded edges"


def test_assortativity_matches_python_replay(spark, sf_dir):
    """graph_assortativity equals the textbook symmetric-moments
    computation over the same densified edge generator, including the
    exact rational and sign-safe ppm truncation; r is within [-1, 1]
    as a rational."""
    from collections import defaultdict

    from pgsink_spark.operators.graph import graph_assortativity
    from pgsink_spark.sources.fixtures import load_table

    ids = [
        r["doc_id"]
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .collect()
    ]
    n = len(ids)
    edges = set()
    for d in ids:
        for dst in (
            (d * d * 7 + 1) % n,
            (d * 13 + 3) % n,
            (d + 50) % n,
            (d + 100) % n,
        ):
            if dst != d:
                edges.add((min(d, dst), max(d, dst)))
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    deg = {v: len(zs) for v, zs in adj.items()}
    ends = [(deg[v], deg[w]) for v, zs in adj.items() for w in zs]
    m2 = len(ends)
    s1 = sum(x for x, _ in ends)
    s2 = sum(x * x for x, _ in ends)
    sxy = sum(x * y for x, y in ends)
    num = m2 * sxy - s1 * s1
    den = m2 * s2 - s1 * s1
    ppm = 1_000_000 * num // den if num >= 0 else -(1_000_000 * -num // den)
    (row,) = graph_assortativity(spark, sf_dir).collect()
    assert (row["m2"], row["s1"], row["s2"], row["sxy"]) == (m2, s1, s2, sxy)
    assert row["assortativity_ppm"] == ppm
    assert -den <= num <= den  # |r| <= 1


def test_transitivity_matches_python_replay(spark, sf_dir):
    """graph_transitivity equals the textbook 3·triangles/wedges over
    the same densified generator; 0 <= transitivity <= 1 as a
    rational."""
    from collections import defaultdict

    from pgsink_spark.operators.graph import graph_transitivity
    from pgsink_spark.sources.fixtures import load_table

    ids = [
        r["doc_id"]
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .collect()
    ]
    n = len(ids)
    edges = set()
    for d in ids:
        for dst in (
            (d * d * 7 + 1) % n,
            (d * 13 + 3) % n,
            (d + 50) % n,
            (d + 100) % n,
        ):
            if dst != d:
                edges.add((min(d, dst), max(d, dst)))
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    tri = 0
    for a, b in edges:
        tri += len(adj[a] & adj[b])
    tri //= 3  # each triangle counted once per edge
    wedges2 = sum(len(zs) * (len(zs) - 1) for zs in adj.values())
    ppm = 1_000_000 * 6 * tri // wedges2 if wedges2 else 0
    (row,) = graph_transitivity(spark, sf_dir).collect()
    assert row["n_tri"] == tri
    assert row["n_wedges"] == wedges2 // 2
    assert row["transitivity_ppm"] == ppm
    assert 0 <= row["transitivity_ppm"] <= 1_000_000


def test_local_bridges_matches_python_replay(spark, sf_dir):
    """graph_local_bridges equals a pure-Python structural-hole census
    and is the exact complement of the jaccard-edges support."""
    from collections import defaultdict

    from pgsink_spark.operators.graph import graph_local_bridges
    from pgsink_spark.sources.fixtures import load_table

    ids = [
        r["doc_id"]
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .collect()
    ]
    n = len(ids)
    edges = set()
    for d in ids:
        for dst in (
            (d * d * 7 + 1) % n,
            (d * 13 + 3) % n,
            (d + 50) % n,
            (d + 100) % n,
        ):
            if dst != d:
                edges.add((min(d, dst), max(d, dst)))
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    bridges = sum(1 for a, b in edges if not (adj[a] & adj[b]))
    (row,) = graph_local_bridges(spark, sf_dir).collect()
    assert row["n_edges"] == len(edges)
    assert row["n_local_bridges"] == bridges
    assert row["bridge_ppm"] == 1_000_000 * bridges // len(edges)


def test_hub_cap_audit_and_fixture_headroom(spark, sf_dir):
    """The audit census matches a python degree replay, and the
    fixture graph sits entirely under GRAPH_HUB_CAP — so the capped
    wedge rule provably cannot change fixture results (the driver
    hashes pin the UNcapped semantics there)."""
    from collections import defaultdict

    from pgsink_spark.operators.graph import (
        GRAPH_HUB_CAP,
        graph_hub_cap_audit,
    )

    edges, _n = _edge_set(spark, sf_dir)
    deg = defaultdict(int)
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    (row,) = graph_hub_cap_audit(spark, sf_dir).collect()
    assert row["n_nodes"] == len(deg)
    assert row["n_edges"] == len(edges)
    assert row["max_degree"] == max(deg.values())
    assert row["max_degree"] < GRAPH_HUB_CAP
    assert row["n_capped_hubs"] == 0
    assert row["dropped_adj_rows"] == 0


def test_hub_cap_active_both_engines_agree(spark, sf_dir):
    """Force the cap to bind (cap=2 ≪ fixture max degree) and check
    the SPARK wedge result still equals the ORACLE with the same cap
    — the rule is encoded in both engines, not just documented."""
    import duckdb
    import pytest

    from pgsink_spark.operators import graph as G
    from pgsink_spark.operators.relational import ORACLES

    orig = G.GRAPH_HUB_CAP
    sql = ORACLES["graph_jaccard_edges"]
    needle = f"r <= {orig}"
    assert needle in sql  # the baked oracle carries the cap rule
    try:
        G.GRAPH_HUB_CAP = 2
        got = {
            (r["a"], r["b"]): (r["n_common"], r["n_union"], r["jaccard_ppm"])
            for r in G.graph_jaccard_edges(spark, sf_dir).collect()
        }
    finally:
        G.GRAPH_HUB_CAP = orig

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    want = {
        (a, b): (c, u, j)
        for a, b, c, u, j in con.execute(
            sql.replace(needle, "r <= 2")
        ).fetchall()
    }
    con.close()
    assert got == want
    # sanity: the low cap actually changed the answer vs the shipped cap
    shipped = G.graph_jaccard_edges(spark, sf_dir).collect()
    assert {(r["a"], r["b"]): r["n_common"] for r in shipped} != {
        k: v[0] for k, v in want.items()
    }


@pytest.mark.slow
def test_local_graph_kernels_match_distributed_loops(spark, sf_dir):
    """The r10 size-gated single-task kernels (kcore peel, LPA rounds,
    BFS levels) must emit exactly what the per-round checkpointed
    loops emit on the same edge set — forcing the gate OFF replays the
    distributed path, and the row sets must be identical."""
    import pgsink_spark.operators.graph as G

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    orig = G.GRAPH_LOCAL_NBR_CAP
    try:
        G.GRAPH_LOCAL_NBR_CAP = 10**9  # kernel path
        kcore_k = rows(G.graph_kcore(spark, sf_dir))
        lpa_k = rows(G.graph_label_propagation(spark, sf_dir))
        bfs_k = rows(G.graph_bfs_distance(spark, sf_dir))
        mod_k = rows(G.graph_modularity(spark, sf_dir))
        lp_k = rows(G.graph_linkpred(spark, sf_dir))
        G.GRAPH_LOCAL_NBR_CAP = -1  # distributed path
        assert kcore_k == rows(G.graph_kcore(spark, sf_dir))
        assert lpa_k == rows(G.graph_label_propagation(spark, sf_dir))
        assert bfs_k == rows(G.graph_bfs_distance(spark, sf_dir))
        assert mod_k == rows(G.graph_modularity(spark, sf_dir))
        assert lp_k == rows(G.graph_linkpred(spark, sf_dir))
    finally:
        G.GRAPH_LOCAL_NBR_CAP = orig
    assert kcore_k and lpa_k and bfs_k and mod_k and lp_k
