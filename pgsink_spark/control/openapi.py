"""OpenAPI 3.0 spec generated from the typed client surface.

Reference parity: the reference's control API is goa-designed
(api/design/api.go:60-129) and goa emits machine-readable OpenAPI
documents (api/gen/http/openapi3.json) that operators feed to codegen
and API gateways. Here the single source of truth is the dataclass
surface in control/client.py (TableStatus / Subscription /
PublishedTable / Import) — the spec is DERIVED from those classes via
``dataclasses.fields`` + resolved type hints, so a field added to the
client shows up in the spec without a second edit (the goa design →
gen flow, inverted but with the same no-drift property). Served at
``GET /api/openapi.json`` by control/server.py and round-tripped
against the live routes in tests/test_control_transport.py.
"""

from __future__ import annotations

import dataclasses
import types
import typing

from pgsink_spark.control.client import (
    Import,
    PublishedTable,
    Subscription,
    TableStatus,
)

_PRIMITIVES = {
    str: {"type": "string"},
    int: {"type": "integer", "format": "int64"},
    float: {"type": "number", "format": "double"},
    bool: {"type": "boolean"},
}


def _type_schema(tp, refs: dict) -> dict:
    """JSON-schema fragment for a resolved annotation; dataclasses
    become ``$ref`` entries collected into ``refs``."""
    origin = typing.get_origin(tp)
    if origin in (typing.Union, types.UnionType):
        args = [a for a in typing.get_args(tp) if a is not type(None)]
        if len(args) != 1:
            raise TypeError(f"unsupported union {tp!r}")
        inner = _type_schema(args[0], refs)
        return {**inner, "nullable": True}
    if origin in (tuple, list):
        args = [a for a in typing.get_args(tp) if a is not Ellipsis]
        if len(args) != 1:
            raise TypeError(f"unsupported sequence {tp!r}")
        return {"type": "array", "items": _type_schema(args[0], refs)}
    if dataclasses.is_dataclass(tp):
        name = tp.__name__
        if name not in refs:
            refs[name] = None  # reserve against recursion
            refs[name] = dataclass_schema(tp, refs)
        return {"$ref": f"#/components/schemas/{name}"}
    if tp in _PRIMITIVES:
        return dict(_PRIMITIVES[tp])
    raise TypeError(f"unsupported annotation {tp!r}")


def dataclass_schema(cls, refs: dict | None = None) -> dict:
    """Object schema for a dataclass: every field typed from its
    resolved annotation, all fields required (the wire always carries
    them — nullable fields carry ``null``, they are not omitted)."""
    refs = refs if refs is not None else {}
    hints = typing.get_type_hints(cls)
    props = {
        f.name: _type_schema(hints[f.name], refs)
        for f in dataclasses.fields(cls)
    }
    return {
        "type": "object",
        "properties": props,
        "required": [f.name for f in dataclasses.fields(cls)],
    }


def _ref(name: str) -> dict:
    return {"$ref": f"#/components/schemas/{name}"}


def _json_response(code: str, description: str, schema: dict) -> dict:
    return {
        code: {
            "description": description,
            "content": {"application/json": {"schema": schema}},
        }
    }


_TABLE_ACTION_BODY = {
    "required": True,
    "content": {
        "application/json": {
            "schema": {
                "type": "object",
                "properties": {
                    "schema": {"type": "string"},
                    "name": {"type": "string"},
                },
                "required": ["schema", "name"],
            }
        }
    },
}


def build_spec() -> dict:
    """The control API as an OpenAPI 3.0.3 document (routes =
    control/server.py's handler table; schemas = the client
    dataclasses; the goa status-code quirks — 201 on Subscriptions.Get
    and AddTable, 202 on StopTable — are preserved verbatim,
    api/design/api.go:137-172)."""
    refs: dict = {}
    for cls in (PublishedTable, Subscription, TableStatus, Import):
        refs[cls.__name__] = dataclass_schema(cls, refs)
    paths = {
        "/api/health": {
            "get": {
                "operationId": "health",
                "responses": _json_response(
                    "200",
                    "liveness",
                    {
                        "type": "object",
                        "properties": {"status": {"type": "string"}},
                    },
                ),
            }
        },
        "/api/tables": {
            "get": {
                "operationId": "listTables",
                "responses": _json_response(
                    "200",
                    "catalog join job status",
                    {
                        "type": "object",
                        "properties": {
                            "tables": {
                                "type": "array",
                                "items": _ref("TableStatus"),
                            }
                        },
                    },
                ),
            }
        },
        "/api/subscriptions/current": {
            "get": {
                "operationId": "getSubscription",
                # goa Response(StatusCreated) quirk preserved
                "responses": _json_response(
                    "201", "the subscription", _ref("Subscription")
                ),
            }
        },
        "/api/subscriptions/current/actions/add-table": {
            "post": {
                "operationId": "addTable",
                "requestBody": _TABLE_ACTION_BODY,
                "responses": _json_response(
                    "201", "published + backfill enqueued",
                    _ref("Subscription"),
                ),
            }
        },
        "/api/subscriptions/current/actions/stop-table": {
            "post": {
                "operationId": "stopTable",
                "requestBody": _TABLE_ACTION_BODY,
                "responses": _json_response(
                    "202", "unpublished + imports expired",
                    _ref("Subscription"),
                ),
            }
        },
        "/api/imports": {
            "get": {
                "operationId": "listImports",
                "responses": _json_response(
                    "200",
                    "import job rows",
                    {"type": "array", "items": _ref("Import")},
                ),
            }
        },
        "/metrics": {
            "get": {
                "operationId": "metrics",
                "responses": {
                    "200": {
                        "description": "Prometheus text exposition",
                        "content": {
                            "text/plain; version=0.0.4": {
                                "schema": {"type": "string"}
                            }
                        },
                    }
                },
            }
        },
    }
    return {
        "openapi": "3.0.3",
        "info": {
            "title": "pgsink-spark control API",
            "version": "1.0.0",
            "description": (
                "Control plane for publication/import management "
                "(parity: the goa design in api/design/api.go)."
            ),
        },
        "paths": paths,
        "components": {"schemas": refs},
    }
