"""Prometheus text exposition for the sink metrics registry.

Reference parity: the reference exposes real Prometheus histograms for
insert duration and batch size (pkg/sinks/generic/
instrumented_inserter.go:13-30) and importer timings
(pkg/imports/importer.go:57-81), scraped off the process's /metrics
endpoint (docker-compose.yml:25-60 wires Prometheus + Grafana).

This module renders the in-process ``SinkMetrics`` registry
(sinks/instrumented.py) in the text exposition format (version 0.0.4)
so the control server can serve ``GET /metrics`` to a stock Prometheus
scraper — no client library needed; the format is a stable public
contract and the registry already keeps Prometheus histogram
semantics (fixed buckets + cumulative counts + sum + count).
"""

from __future__ import annotations

from pgsink_spark.sinks.instrumented import Histogram, SinkMetrics


def _esc(label: str) -> str:
    return (
        label.replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n")
    )


def _fmt(v: float) -> str:
    """Float → exposition text (no exponent for the bucket ladder)."""
    return format(v, "g")


def _histogram_lines(
    name: str, help_text: str, series: dict[str, Histogram]
) -> list[str]:
    out = [f"# HELP {name} {help_text}", f"# TYPE {name} histogram"]
    for table in sorted(series):
        h = series[table]
        lbl = f'table="{_esc(table)}"'
        cum = h.cumulative()
        for bound, c in zip(h.buckets, cum):
            out.append(
                f'{name}_bucket{{{lbl},le="{_fmt(bound)}"}} {c}'
            )
        out.append(f'{name}_bucket{{{lbl},le="+Inf"}} {cum[-1]}')
        out.append(f"{name}_sum{{{lbl}}} {_fmt(h.total)}")
        out.append(f"{name}_count{{{lbl}}} {h.n}")
    return out


def _scalar_lines(
    name: str, help_text: str, kind: str, series: dict[str, int]
) -> list[str]:
    out = [f"# HELP {name} {help_text}", f"# TYPE {name} {kind}"]
    for table in sorted(series):
        v = series[table]
        if v is None:
            continue
        out.append(f'{name}{{table="{_esc(table)}"}} {v}')
    return out


def render_prometheus(metrics: SinkMetrics, prefix: str = "pgsink") -> str:
    """SinkMetrics → one scrape-parseable exposition document."""
    lines: list[str] = []
    lines += _histogram_lines(
        f"{prefix}_sink_insert_duration_seconds",
        "Wall-clock duration of one sink insert batch.",
        metrics.insert_duration,
    )
    lines += _histogram_lines(
        f"{prefix}_sink_batch_size_rows",
        "Rows per sink insert batch.",
        metrics.batch_size,
    )
    lines += _scalar_lines(
        f"{prefix}_sink_rows_total",
        "Total rows inserted per table.",
        "counter",
        metrics.rows_total,
    )
    lines += _scalar_lines(
        f"{prefix}_sink_batches_total",
        "Total insert batches per table.",
        "counter",
        metrics.batches_total,
    )
    lines += _scalar_lines(
        f"{prefix}_sink_last_lsn",
        "Highest confirmed LSN per table.",
        "gauge",
        metrics.last_max_lsn,
    )
    return "\n".join(lines) + "\n"
