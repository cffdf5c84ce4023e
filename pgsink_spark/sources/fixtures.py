"""Fixture loaders for the driver's synthetic tables (TESTDATA.md).

Design notes for scale: each table is a plain ``spark.read.parquet`` —
Catalyst handles predicate pushdown / column pruning / partition pruning
against these scans, so every downstream operator composes with a
prunable source. Nothing here collects to the driver.

The one quirk handled here: ``events.parquet`` stores its ``ts`` column
as parquet TIMESTAMP(NANOS, isAdjustedToUTC=false), which Spark's
vectorized reader rejects (PARQUET_TYPE_ILLEGAL). We read nanos as a
raw long (``spark.sql.legacy.parquet.nanosAsLong``) and rebuild a
TIMESTAMP_NTZ with pure interval arithmetic — no session-timezone
dependence, so results compare bit-for-bit with DuckDB's reading of the
same file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

_EVENTS_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table as a DataFrame (lazy parquet scan)."""
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        # Nanos-as-long workaround; runtime-settable SQL conf.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes)["ts"] == "bigint":
            df = df.withColumn(
                "ts",
                F.expr(
                    "timestampadd(MICROSECOND, ts div 1000,"
                    " timestamp_ntz'1970-01-01 00:00:00')"
                ),
            )
        return df.select(*_EVENTS_COLS)
    return spark.read.parquet(path)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL API."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
