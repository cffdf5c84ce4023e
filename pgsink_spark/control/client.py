"""Typed HTTP client for the control-plane API.

Reference parity: the reference ships a generated goa client
(api/client.go wrapping api/gen/http/*/client) so operators script
against typed resources instead of raw JSON. This is the hand-written
twin over the stdlib: one dataclass per resource (mirroring the goa
types in api/design/api.go — Table :84-129, Subscription :176-199,
Import :218-270) and one method per endpoint, speaking exactly the
routes control/server.py serves.

Zero dependencies (urllib) so the client runs anywhere the engine
does; every method round-trips through the real HTTP surface in
tests/test_control_transport.py.
"""

from __future__ import annotations

import json
import urllib.request
from dataclasses import dataclass


@dataclass(frozen=True)
class TableStatus:
    """GET /api/tables row (goa Table type, api/design/api.go:84-129)."""

    namespace: str
    name: str
    publication_status: str
    import_status: str
    import_rows_processed_total: int


@dataclass(frozen=True)
class PublishedTable:
    """goa SubscriptionPublishedTable (api/design/api.go:189-199)."""

    schema: str
    name: str


@dataclass(frozen=True)
class Subscription:
    """goa Subscription (api/design/api.go:176-187)."""

    id: str
    published_tables: tuple[PublishedTable, ...]


@dataclass(frozen=True)
class Import:
    """goa Import (api/design/api.go:218-270); timestamps are ISO
    strings or None, exactly as the wire carries them."""

    id: int
    subscription_id: str
    schema: str
    table_name: str
    created_at: str | None
    updated_at: str | None
    completed_at: str | None
    expired_at: str | None
    error: str | None
    error_count: int
    last_error_at: str | None
    rows_processed_total: int


class ControlClient:
    """Typed wrapper over the control server's HTTP surface."""

    def __init__(self, base_url: str, timeout_s: float = 10.0):
        self.base_url = base_url.rstrip("/")
        self.timeout_s = timeout_s

    # -- transport ------------------------------------------------------
    def _get(self, path: str):
        with urllib.request.urlopen(
            self.base_url + path, timeout=self.timeout_s
        ) as r:
            return json.loads(r.read())

    def _post(self, path: str, body: dict):
        req = urllib.request.Request(
            self.base_url + path,
            data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=self.timeout_s) as r:
            return json.loads(r.read())

    # -- resources ------------------------------------------------------
    def health(self) -> bool:
        return self._get("/api/health").get("status") == "healthy"

    def list_tables(self) -> list[TableStatus]:
        return [
            TableStatus(**row) for row in self._get("/api/tables")["tables"]
        ]

    def _subscription(self, raw: dict) -> Subscription:
        return Subscription(
            id=raw["id"],
            published_tables=tuple(
                PublishedTable(**t) for t in raw["published_tables"]
            ),
        )

    def get_subscription(self) -> Subscription:
        return self._subscription(self._get("/api/subscriptions/current"))

    def add_table(self, schema: str, name: str) -> Subscription:
        """Subscriptions.AddTable — publish + enqueue the backfill."""
        return self._subscription(
            self._post(
                "/api/subscriptions/current/actions/add-table",
                {"schema": schema, "name": name},
            )
        )

    def stop_table(self, schema: str, name: str) -> Subscription:
        """Subscriptions.StopTable — unpublish + expire open imports."""
        return self._subscription(
            self._post(
                "/api/subscriptions/current/actions/stop-table",
                {"schema": schema, "name": name},
            )
        )

    def list_imports(self) -> list[Import]:
        return [Import(**row) for row in self._get("/api/imports")]

    def metrics_text(self) -> str:
        """Raw Prometheus exposition (GET /metrics)."""
        with urllib.request.urlopen(
            self.base_url + "/metrics", timeout=self.timeout_s
        ) as r:
            return r.read().decode()

    def openapi(self) -> dict:
        """The served OpenAPI 3.0 document (GET /api/openapi.json)."""
        return self._get("/api/openapi.json")
