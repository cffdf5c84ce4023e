"""JDBC option builders (offline — no database in this container)."""

from __future__ import annotations

import pytest

from pgsink_spark.sources.jdbc import (
    PK_QUERY,
    TABLES_QUERY,
    keyset_batch_options,
    snapshot_options,
)


def test_snapshot_options_shape():
    o = snapshot_options(
        "jdbc:postgresql://db/x", "public.orders", "o_orderkey",
        lower=1, upper=1_000_000, num_partitions=64, user="u", password="p",
    )
    assert o["partitionColumn"] == "o_orderkey"
    assert o["numPartitions"] == "64"
    assert o["fetchsize"] == "5000"  # reference batch size
    assert o["pushDownPredicate"] == "true"
    assert o["lowerBound"] == "1" and o["upperBound"] == "1000000"


def test_keyset_batch_options_cursor():
    o = keyset_batch_options(
        "jdbc:postgresql://db/x", "public.orders", "o_orderkey", 500, 100
    )
    assert 'WHERE "o_orderkey" > 500' in o["dbtable"]
    assert 'ORDER BY "o_orderkey" LIMIT 100' in o["dbtable"]
    assert '"public"."orders"' in o["dbtable"]
    # first batch: no cursor predicate
    o0 = keyset_batch_options(
        "jdbc:postgresql://db/x", "public.orders", "o_orderkey", None
    )
    assert "WHERE" not in o0["dbtable"]


def test_keyset_batch_options_escapes_string_cursor():
    # a cursor value containing a quote comes straight from table data;
    # it must be SQL-escaped, not Python repr'd
    o = keyset_batch_options(
        "jdbc:postgresql://db/x", "public.t", "name", "O'Brien", 10
    )
    assert "'O''Brien'" in o["dbtable"]
    import pytest

    from pgsink_spark.sources.jdbc import sql_literal

    with pytest.raises(ValueError):
        sql_literal("bad\x00cursor")
    assert sql_literal(True) == "TRUE"
    assert sql_literal(3) == "3"


def test_catalog_queries_are_subqueries():
    assert TABLES_QUERY.strip().startswith("(")
    assert PK_QUERY.strip().startswith("(")
    assert "indisprimary" in PK_QUERY


def test_keyset_batch_options_composite_row_value():
    """Composite keys render as Postgres row-value comparison with
    quoted identifiers and escaped literals (reference refuses >1 pk
    column — import.go:235-270; this engine pages them)."""
    from pgsink_spark.sources.jdbc import keyset_batch_options

    o = keyset_batch_options(
        "jdbc:postgresql://db/x",
        "public.orders",
        ["o_custkey", "o_orderkey"],
        (7, "O'Brien"),
        50,
    )
    sub = o["dbtable"]
    assert '("o_custkey", "o_orderkey") > (7, \'O\'\'Brien\')' in sub
    assert 'ORDER BY "o_custkey", "o_orderkey" LIMIT 50' in sub


def test_keyset_where_order_arity_mismatch():
    import pytest

    from pgsink_spark.sources.jdbc import keyset_where_order

    with pytest.raises(ValueError, match="arity"):
        keyset_where_order(["a", "b"], (1,))
