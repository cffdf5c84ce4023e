"""SparkSession builder tuned for this engine.

Local-mode defaults chosen for the driver's test environment (local[N],
single JVM); on a real cluster only the master/memory settings change —
the SQL-level settings (AQE, shuffle partitions sized to cores, Arrow)
are the ones that matter at 100 TB and they hold there too.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "pgsink_spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        # Split files finer than the 128m default so a ~100 MB fixture
        # table still fans out across all local cores; on a real
        # cluster the same setting trades a few extra tasks for
        # schedulable parallelism — both directions are safe because
        # AQE re-coalesces small partitions after shuffles.
        .config("spark.sql.files.maxPartitionBytes", "8m")
        .config("spark.sql.files.openCostInBytes", "1m")
        # events.parquet stores TIMESTAMP(NANOS); Spark reads it as long
        # and sources/fixtures.py rebuilds a TIMESTAMP_NTZ column.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # bucketed tables (operators/bucketing.py) go through the
        # session catalog; keep their files out of the repo tree
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/pgsink_warehouse"),
        )
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
