"""Shared DuckDB-oracle comparison utilities (mirrors the driver's
correctness gate: row count + column names + order-insensitive values).
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import duckdb

from pgsink_spark.sources.fixtures import TABLES


def norm_value(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else round(v, 9)
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm_value(x) for x in v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return v


def _sort_key(row: tuple):
    """NULL-safe mixed-type sort key (None sorts first, like the
    driver's pandas canonicalizer)."""
    return tuple((v is not None, str(type(v)), v) for v in row)


def canon(rows, cols):
    """Column-name-sorted, row-sorted canonical form of a result set."""
    order = sorted(range(len(cols)), key=lambda i: cols[i].lower())
    return sorted(
        (tuple(norm_value(r[i]) for i in order) for r in rows),
        key=_sort_key,
    )


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def compare_frames(sdf, con: duckdb.DuckDBPyConnection, sql: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    scols = [c.lower() for c in sdf.columns]
    srows = [tuple(r) for r in sdf.collect()]
    rel = con.sql(sql)
    dcols = [c.lower() for c in rel.columns]
    drows = rel.fetchall()
    problems: list[str] = []
    if sorted(scols) != sorted(dcols):
        problems.append(f"columns: spark={scols} duckdb={dcols}")
        return problems
    if len(srows) != len(drows):
        problems.append(f"row count: spark={len(srows)} duckdb={len(drows)}")
        return problems
    sc, dc = canon(srows, scols), canon(drows, dcols)
    if sc != dc:
        diffs = [(a, b) for a, b in zip(sc, dc) if a != b][:3]
        problems.append(f"values differ, first diffs: {diffs}")
    return problems
