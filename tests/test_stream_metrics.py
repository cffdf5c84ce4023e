"""Streaming metrics listener (streaming/metrics.py): micro-batch
progress lands in the same histogram shapes as the batch plane."""

from __future__ import annotations

import time

from pgsink_spark.sources.fixtures import load_table
from pgsink_spark.streaming.metrics import StreamMetrics

SF = "/root/testdata/sf0.001"


def test_listener_captures_batches_and_rows(spark, tmp_path):
    docs = load_table(spark, SF, "documents").limit(80)
    src = str(tmp_path / "in")
    docs.write.mode("overwrite").parquet(src)

    metrics = StreamMetrics().attach(spark)
    try:
        q = (
            spark.readStream.schema(docs.schema)
            .parquet(src)
            .writeStream.queryName("metrics_probe")
            .format("noop")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.awaitTermination(120)
        # listener events are delivered asynchronously
        deadline = time.time() + 30
        while time.time() < deadline:
            st = metrics.stats.get("metrics_probe")
            if st and st.rows >= 80:
                break
            time.sleep(0.5)
        st = metrics.stats.get("metrics_probe")
        assert st is not None, metrics.stats
        assert st.batches >= 1
        assert st.rows == 80
        assert st.batch_rows.n == st.batches
        # durations observed and positive
        assert st.batch_duration.n >= 1 and st.batch_duration.total > 0
    finally:
        metrics.detach(spark)
