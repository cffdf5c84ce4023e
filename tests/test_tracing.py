"""OTel-compatible span model: nesting, error status, OTLP rendering.

Reference parity: pkg/sinks/generic/instrumented_inserter.go:40-74
(tracer.Start around every insert) and the Jaeger export wiring in
docker-compose.yml:25-60.
"""

from __future__ import annotations

import json

import pytest

from pgsink_spark.control.tracing import (
    InMemorySpanExporter,
    Span,
    TracedInserter,
    Tracer,
    to_otlp_json,
)


def test_span_nesting_and_trace_propagation():
    t = Tracer()
    with t.span("root") as root:
        with t.span("child-a") as a:
            assert a.trace_id == root.trace_id
            assert a.parent_span_id == root.span_id
            with t.span("grandchild") as g:
                assert g.trace_id == root.trace_id
                assert g.parent_span_id == a.span_id
        with t.span("child-b") as b:
            assert b.parent_span_id == root.span_id
    # exported in end order: deepest first, root last
    names = [s.name for s in t.exporter.spans]
    assert names == ["grandchild", "child-a", "child-b", "root"]
    for s in t.exporter.spans:
        assert s.end_ns is not None and s.duration_s >= 0.0


def test_sibling_traces_are_distinct():
    t = Tracer()
    with t.span("one"):
        pass
    with t.span("two"):
        pass
    a, b = t.exporter.spans
    assert a.trace_id != b.trace_id
    assert a.parent_span_id is None and b.parent_span_id is None


def test_error_status_and_attributes():
    t = Tracer()
    with pytest.raises(RuntimeError):
        with t.span("boom", table="public.t"):
            raise RuntimeError("sink down")
    (s,) = t.exporter.spans
    assert s.status == "ERROR"
    assert s.attributes["exception.type"] == "RuntimeError"
    assert s.attributes["exception.message"] == "sink down"
    assert s.attributes["table"] == "public.t"
    assert s.end_ns is not None  # ended despite the raise


def test_events_carry_timestamps():
    t = Tracer()
    with t.span("flush") as s:
        s.add_event("ack", lsn=12345)
    (done,) = t.exporter.spans
    (e,) = done.events
    assert e.name == "ack" and e.attributes == {"lsn": 12345}
    assert done.start_ns <= e.time_ns <= done.end_ns


def test_otlp_json_shape():
    t = Tracer()
    with t.span("root", n=3, ratio=0.5, label="x", flag=True) as s:
        s.add_event("tick")
    doc = json.loads(to_otlp_json(t.exporter.spans, service_name="svc"))
    rs = doc["resourceSpans"][0]
    res_attrs = {
        a["key"]: a["value"] for a in rs["resource"]["attributes"]
    }
    assert res_attrs["service.name"] == {"stringValue": "svc"}
    (span,) = rs["scopeSpans"][0]["spans"]
    assert len(span["traceId"]) == 32 and len(span["spanId"]) == 16
    attrs = {a["key"]: a["value"] for a in span["attributes"]}
    # OTLP typed values: int as string, double as number, bool native
    assert attrs["n"] == {"intValue": "3"}
    assert attrs["ratio"] == {"doubleValue": 0.5}
    assert attrs["label"] == {"stringValue": "x"}
    assert attrs["flag"] == {"boolValue": True}
    assert span["status"] == {"code": 1}
    assert span["events"][0]["name"] == "tick"


def test_traced_inserter_spans_rows_and_lsn():
    from pgsink_spark.sinks.generic import InsertResult

    t = Tracer()

    def inner(env, ns, name):
        return InsertResult(42, 999)

    traced = TracedInserter(inner, t)
    res = traced(None, "public", "kv")
    assert res.count == 42
    (s,) = t.exporter.spans
    assert s.name == "sink.insert"
    assert s.attributes["db.table"] == "public.kv"
    assert s.attributes["pgsink.rows"] == 42
    assert s.attributes["pgsink.max_lsn"] == 999


def test_unended_span_duration_raises():
    s = Span("x", "0" * 32, "0" * 16, None, start_ns=0)
    with pytest.raises(ValueError, match="not ended"):
        _ = s.duration_s
