"""Bucketed tables: shuffle-free co-located joins (SURVEY §2 scale
surface; the pre-partitioning story for repeated fact-fact joins).

The reference clusters its warehouse tables by primary key so the
serving engine can join/merge without re-sorting
(pkg/sinks/bigquery/schema_builders.go:99-106 — clustering spec). The
Spark-native equivalent for *join locality* is bucketing: write both
fact tables bucketed (and sorted) by the join key, and every later
equi-join on that key runs with ZERO Exchange — each task reads
matching bucket files from both sides. At 100 TB this turns the
nightly lineitem⋈orders shuffle (the single biggest exchange in the
TPC-H suite) into a scan-side merge, paid once at write time and
amortized over every downstream query.

Local caveat baked into the design: Spark's bucketed-read path
(``spark.sql.sources.bucketing.enabled``) keys on the session catalog,
so bucketed tables live under ``spark.sql.warehouse.dir`` via
``saveAsTable`` — there is no path-only bucketed read. The writer here
is idempotent per (warehouse, key, buckets) and the join asserts its
own no-shuffle property in tests/test_plans.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgsink_spark.sources.fixtures import load_table

BUCKETS = 16


def _clear_stale(spark: SparkSession, table: str) -> None:
    """The in-memory catalog is per-session but the warehouse dir is
    not: drop the catalog entry AND an orphaned location left by an
    earlier session, or saveAsTable refuses it
    (LOCATION_ALREADY_EXISTS)."""
    import shutil  # noqa: PLC0415

    spark.sql(f"DROP TABLE IF EXISTS `{table}`")
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    loc = os.path.join(wh, table.lower())
    if os.path.exists(loc):
        shutil.rmtree(loc)


def write_bucketed(
    df: DataFrame, table: str, key: str, buckets: int = BUCKETS
) -> None:
    """Bucket + in-bucket sort on the join key. sortBy makes the later
    join a streaming merge per bucket pair (no in-task sort)."""
    _clear_stale(df.sparkSession, table)
    (
        df.write.bucketBy(buckets, key)
        .sortBy(key)
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table)
    )


def ensure_bucketed_facts(
    spark: SparkSession, sf_dir: str, buckets: int = BUCKETS
) -> None:
    """Idempotent: (re)write orders/lineitem bucketed by orderkey only
    if the catalog doesn't already hold this shape."""
    marker = f"pgsink_bucket_meta_{buckets}"
    if spark.catalog.tableExists("orders_bck") and spark.catalog.tableExists(
        marker
    ):
        return
    write_bucketed(
        load_table(spark, sf_dir, "orders"), "orders_bck", "o_orderkey", buckets
    )
    write_bucketed(
        load_table(spark, sf_dir, "lineitem"),
        "lineitem_bck",
        "l_orderkey",
        buckets,
    )
    _clear_stale(spark, marker)
    spark.createDataFrame([(buckets,)], "buckets int").write.mode(
        "overwrite"
    ).saveAsTable(marker)


def bucketed_order_revenue(spark: SparkSession) -> DataFrame:
    """Per-order revenue over the bucketed pair.

    Plan property (pinned in tests/test_plans.py): SortMergeJoin with
    no Exchange and no Sort on either side — both inputs arrive
    bucket-aligned and pre-sorted from disk — and the groupBy on the
    same key reuses the bucket partitioning, so the whole query runs
    shuffle-free.
    """
    o = spark.table("orders_bck")
    li = spark.table("lineitem_bck")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderkey")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,4)")
                * (1 - F.col("l_discount").cast("decimal(18,4)"))
            ).alias("revenue"),
            F.first("o_orderdate").alias("o_orderdate"),
        )
    )
