"""Prometheus exposition: format, cumulativity, and the /metrics route.

Reference parity target: pkg/sinks/generic/instrumented_inserter.go:13-30
(duration + batch-size histograms) scraped from the process /metrics
endpoint (docker-compose.yml:25-60)."""

from __future__ import annotations

import urllib.request

from pgsink_spark.control.metrics_export import render_prometheus
from pgsink_spark.sinks.generic import InsertResult
from pgsink_spark.sinks.instrumented import (
    DURATION_BUCKETS,
    SinkMetrics,
)


def _sample_metrics() -> SinkMetrics:
    m = SinkMetrics()
    m.record("public.kv", 0.1, InsertResult(3, 100))
    m.record("public.kv", 0.3, InsertResult(5, 200))
    m.record("public.kv", 700.0, InsertResult(1, 150))  # +Inf bucket
    m.record("public.other", 0.2, InsertResult(2, None))
    return m


def _series(text: str, prefix: str) -> dict[str, float]:
    out = {}
    for line in text.splitlines():
        if line.startswith(prefix) and not line.startswith("#"):
            key, val = line.rsplit(" ", 1)
            out[key] = float(val)
    return out


def test_histogram_buckets_are_cumulative_and_end_at_inf():
    text = render_prometheus(_sample_metrics())
    buckets = _series(text, "pgsink_sink_insert_duration_seconds_bucket")
    kv = [
        (k, v) for k, v in buckets.items() if 'table="public.kv"' in k
    ]
    # ladder order is emission order; counts must be non-decreasing
    vals = [v for _, v in kv]
    assert vals == sorted(vals)
    # +Inf bucket equals the observation count
    inf = [v for k, v in kv if 'le="+Inf"' in k]
    assert inf == [3.0]
    counts = _series(text, "pgsink_sink_insert_duration_seconds_count")
    assert counts['pgsink_sink_insert_duration_seconds_count{table="public.kv"}'] == 3.0
    # 0.125-bucket holds only the 0.1s observation; 700s is above the
    # last finite bound (512) so every finite bucket misses it
    first = [v for k, v in kv if f'le="{DURATION_BUCKETS[0]:g}"' in k]
    assert first == [1.0]
    finite_max = [v for k, v in kv if f'le="{DURATION_BUCKETS[-1]:g}"' in k]
    assert finite_max == [2.0]


def test_counters_and_gauges_render():
    text = render_prometheus(_sample_metrics())
    rows = _series(text, "pgsink_sink_rows_total")
    assert rows['pgsink_sink_rows_total{table="public.kv"}'] == 9.0
    lsn = _series(text, "pgsink_sink_last_lsn")
    assert lsn['pgsink_sink_last_lsn{table="public.kv"}'] == 200.0
    # a table with no confirmed LSN renders no last_lsn sample
    assert not any('public.other' in k for k in lsn)
    # TYPE headers present for every family
    for family, kind in [
        ("pgsink_sink_insert_duration_seconds", "histogram"),
        ("pgsink_sink_batch_size_rows", "histogram"),
        ("pgsink_sink_rows_total", "counter"),
        ("pgsink_sink_batches_total", "counter"),
        ("pgsink_sink_last_lsn", "gauge"),
    ]:
        assert f"# TYPE {family} {kind}" in text


def test_control_server_serves_metrics(tmp_path):
    from pgsink_spark.cli import fixture_catalog, make_api
    from pgsink_spark.control.server import ControlServer

    api = make_api(str(tmp_path))
    text = render_prometheus(_sample_metrics())
    server = ControlServer(
        api, lambda: [], metrics_text=lambda: text
    ).start()
    try:
        with urllib.request.urlopen(
            server.address + "/metrics", timeout=10
        ) as r:
            assert r.status == 200
            assert "text/plain" in r.headers["Content-Type"]
            body = r.read().decode()
        assert body == text
    finally:
        server.stop()


def test_cli_run_writes_exposition(tmp_path, spark, sf_dir, capsys):
    """The one-tick `run` lifecycle publishes its import metrics as a
    scrape-parseable exposition file."""
    import os

    from pgsink_spark.cli import main

    root = str(tmp_path / "state")
    assert (
        main(
            ["--root", root, "run", "--source", sf_dir,
             "--include", "public.region"]
        )
        == 0
    )
    prom = os.path.join(root, "metrics.prom")
    with open(prom) as f:
        text = f.read()
    assert "# TYPE pgsink_sink_insert_duration_seconds histogram" in text
    # the region import produced at least one observed batch
    assert 'pgsink_sink_batches_total{table="public.region"}' in text
