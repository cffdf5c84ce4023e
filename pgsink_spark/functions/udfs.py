"""Pandas UDF surface (Arrow-batched; SURVEY §2.G / O-D19).

No ``from __future__ import annotations`` here: pandas_udf resolves the
type hints at definition time.
"""

import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("long")
def str_len(s: pd.Series) -> pd.Series:
    """Vectorized UTF-8 character count (parity with built-in LENGTH)."""
    return s.str.len().astype("int64")


def make_cosine_scorer(query_vec):
    """Factory: Arrow-batched NumPy cosine scorer against a fixed query
    vector (the wide-batch alternative to the zip_with/aggregate fold)."""
    import numpy as np

    qv = np.asarray(query_vec, dtype="float64")
    qn = np.sqrt((qv * qv).sum())

    @pandas_udf("double")
    def score(col: pd.Series) -> pd.Series:
        mat = np.stack(col.to_numpy()).astype("float64")
        dots = mat @ qv
        norms = np.sqrt((mat**2).sum(axis=1))
        return pd.Series(dots / (norms * qn))

    return score


def make_linear_scorer(weights):
    """Factory: Arrow-batched linear-model forward pass with softsign
    squashing — the batch-inference kernel for model-based quality
    scoring (operators/text.py quality_model_score). Weights ride the
    closure (broadcast once per executor); NumPy/pandas evaluate one
    Arrow batch at a time."""
    w0, w1, w2, w3 = weights

    @pandas_udf("double")
    def forward(nw: pd.Series, ratio: pd.Series, mwl: pd.Series) -> pd.Series:
        z = w0 + w1 * nw + w2 * ratio + w3 * mwl
        return z / (1.0 + z.abs())

    return forward


def make_subword_encoder(vocab, max_len):
    """Factory: Arrow-batched greedy longest-prefix-match subword
    encoder over a broadcast-closure vocabulary (text_subword_encode's
    per-distinct-word segmentation loop). Deterministic: each
    candidate length matches at most one string, so longest-first
    needs no tie-break."""
    vocab = frozenset(vocab)

    @pandas_udf("long")
    def seg_len(words: pd.Series) -> pd.Series:
        def encode(w):
            pos, n = 0, 0
            while pos < len(w):
                for length in range(min(max_len, len(w) - pos), 0, -1):
                    if w[pos : pos + length] in vocab:
                        pos += length
                        n += 1
                        break
                else:  # unmatchable char — cannot happen (char floor)
                    pos += 1
                    n += 1
            return n

        return words.map(encode).astype("int64")

    return seg_len
