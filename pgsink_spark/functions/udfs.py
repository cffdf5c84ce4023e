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
