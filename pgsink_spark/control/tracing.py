"""OpenTelemetry-compatible spans for the sink/import lifecycle.

Reference parity: the reference wraps inserters and import queries in
OTel spans exported to Jaeger (pkg/sinks/generic/
instrumented_inserter.go:40-74 — `tracer.Start(ctx, "...")` around
every insert; docker-compose.yml:25-60 ships the collector). This repo
keeps the span MODEL and wire shape (OTLP JSON field names, W3C
trace/span id formats, unix-nano timestamps) but not the SDK — the
container has no opentelemetry package, and a ~150-line stdlib
implementation keeps the dependency surface honest while remaining
drop-in replaceable: swap ``Tracer`` for ``opentelemetry.trace`` and
the call sites don't change shape.

Usage::

    exporter = InMemorySpanExporter()
    tracer = Tracer(exporter)
    with tracer.span("pgsink.run") as root:
        with tracer.span("sink.insert", table="public.t") as s:
            ...
            s.set_attribute("rows", 100)

Nesting is tracked per-thread: a span started inside another becomes
its child (same trace_id, parent_span_id set). ``to_otlp_json``
renders finished spans as an OTLP ``resourceSpans`` document any
OTel collector file-receiver can ingest.
"""

from __future__ import annotations

import json
import os
import threading
import time
from contextlib import contextmanager
from dataclasses import dataclass, field


@dataclass
class SpanEvent:
    name: str
    time_ns: int
    attributes: dict = field(default_factory=dict)


@dataclass
class Span:
    name: str
    trace_id: str  # 32 hex chars (W3C)
    span_id: str  # 16 hex chars
    parent_span_id: str | None
    start_ns: int
    end_ns: int | None = None
    attributes: dict = field(default_factory=dict)
    events: list[SpanEvent] = field(default_factory=list)
    status: str = "OK"  # OK | ERROR

    @property
    def duration_s(self) -> float:
        if self.end_ns is None:
            raise ValueError(f"span {self.name!r} not ended")
        return (self.end_ns - self.start_ns) / 1e9

    def set_attribute(self, key: str, value) -> None:
        self.attributes[key] = value

    def add_event(self, name: str, **attributes) -> None:
        self.events.append(SpanEvent(name, time.time_ns(), attributes))


class InMemorySpanExporter:
    """Collects finished spans (the OTel SDK's test exporter shape)."""

    def __init__(self):
        self.spans: list[Span] = []

    def export(self, span: Span) -> None:
        self.spans.append(span)

    def by_name(self, name: str) -> list[Span]:
        return [s for s in self.spans if s.name == name]


class Tracer:
    """Minimal tracer: per-thread span stack, exporter on end."""

    def __init__(self, exporter: InMemorySpanExporter | None = None):
        self.exporter = exporter or InMemorySpanExporter()
        self._local = threading.local()

    def _stack(self) -> list[Span]:
        if not hasattr(self._local, "stack"):
            self._local.stack = []
        return self._local.stack

    def current(self) -> Span | None:
        stack = self._stack()
        return stack[-1] if stack else None

    @contextmanager
    def span(self, name: str, **attributes):
        parent = self.current()
        s = Span(
            name=name,
            trace_id=parent.trace_id if parent else os.urandom(16).hex(),
            span_id=os.urandom(8).hex(),
            parent_span_id=parent.span_id if parent else None,
            start_ns=time.time_ns(),
            attributes=dict(attributes),
        )
        self._stack().append(s)
        try:
            yield s
        except BaseException as e:
            s.status = "ERROR"
            s.set_attribute("exception.type", type(e).__name__)
            s.set_attribute("exception.message", str(e))
            raise
        finally:
            s.end_ns = time.time_ns()
            self._stack().pop()
            self.exporter.export(s)


def _otlp_value(v) -> dict:
    if isinstance(v, bool):
        return {"boolValue": v}
    if isinstance(v, int):
        return {"intValue": str(v)}
    if isinstance(v, float):
        return {"doubleValue": v}
    return {"stringValue": str(v)}


def _otlp_attrs(attrs: dict) -> list[dict]:
    return [{"key": k, "value": _otlp_value(v)} for k, v in attrs.items()]


def to_otlp_json(
    spans: list[Span], service_name: str = "pgsink-spark"
) -> str:
    """OTLP/JSON ``resourceSpans`` document (what an OTel collector's
    file receiver / ``otlp_json`` ingests; field names per the OTLP
    proto JSON mapping)."""
    out = {
        "resourceSpans": [
            {
                "resource": {
                    "attributes": _otlp_attrs(
                        {"service.name": service_name}
                    )
                },
                "scopeSpans": [
                    {
                        "scope": {"name": "pgsink_spark"},
                        "spans": [
                            {
                                "traceId": s.trace_id,
                                "spanId": s.span_id,
                                **(
                                    {"parentSpanId": s.parent_span_id}
                                    if s.parent_span_id
                                    else {}
                                ),
                                "name": s.name,
                                "kind": 1,  # SPAN_KIND_INTERNAL
                                "startTimeUnixNano": str(s.start_ns),
                                "endTimeUnixNano": str(s.end_ns),
                                "attributes": _otlp_attrs(s.attributes),
                                "events": [
                                    {
                                        "name": e.name,
                                        "timeUnixNano": str(e.time_ns),
                                        "attributes": _otlp_attrs(
                                            e.attributes
                                        ),
                                    }
                                    for e in s.events
                                ],
                                "status": {
                                    "code": 1 if s.status == "OK" else 2
                                },
                            }
                            for s in spans
                        ],
                    }
                ],
            }
        ]
    }
    return json.dumps(out, indent=2)


class TracedInserter:
    """Span middleware for the inserter stack — one ``sink.insert``
    span per batch with table/rows/lsn attributes (the reference's
    instrumented-inserter span, instrumented_inserter.go:40-74).
    Composes with InstrumentedInserter: traced(instrumented(inner)).
    """

    def __init__(self, inner, tracer: Tracer):
        self.inner = inner
        self.tracer = tracer

    def __call__(self, env, namespace: str, name: str):
        with self.tracer.span(
            "sink.insert", **{"db.table": f"{namespace}.{name}"}
        ) as s:
            result = self.inner(env, namespace, name)
            s.set_attribute("pgsink.rows", int(result.count))
            if result.max_lsn is not None:
                s.set_attribute("pgsink.max_lsn", int(result.max_lsn))
            return result
