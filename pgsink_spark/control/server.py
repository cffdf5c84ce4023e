"""HTTP transport for the control plane (stdlib, dependency-free).

Reference parity: the reference serves its control plane over HTTP via
goa-generated transport (api/design/api.go:60-129; wiring
cmd/pgsink/cmd/app.go:409-478):

- ``GET  /api/health``                → liveness check (design/api.go:30-40)
- ``GET  /api/tables``                → catalog ⋈ jobs status rows
  (api/tables.go:29-103)
- ``POST /api/tables/add``            → publish + enqueue import
  (api/subscriptions.go:51-126 AddTable action)
- ``POST /api/tables/stop``           → expire jobs + unpublish
  (api/subscriptions.go:128-153 StopTable action)
- ``GET  /api/subscriptions/current`` → Subscription resource
  (design/api.go:137-145; the goa 201-on-Get quirk is preserved)
- ``POST /api/subscriptions/current/actions/add-table``  → 201 + Subscription
- ``POST /api/subscriptions/current/actions/stop-table`` → 202 + Subscription
  (design/api.go:147-172; payload field names schema/name)
- ``GET  /api/imports``               → Import job rows, ISO datetimes
  (design/api.go:201-270)
- ``GET  /metrics``                   → Prometheus text exposition

Spark-first note: the handlers only touch driver-side control state
(publication set + job store) — no Spark job runs per request, so the
server is safe to run beside a streaming driver. Implemented on
``http.server`` (this container has no web framework; the surface is
four JSON endpoints, a framework would be padding).
"""

from __future__ import annotations

import json
import threading
from dataclasses import asdict
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable

from pgsink_spark.control.tables_api import TablesAPI


def _make_handler(
    api: TablesAPI,
    catalog: Callable[[], list[tuple[str, str]]],
    metrics_text: Callable[[], str] | None = None,
):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _json(self, code: int, body) -> None:
            data = json.dumps(body).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def _body(self) -> dict:
            n = int(self.headers.get("Content-Length", "0"))
            return json.loads(self.rfile.read(n) or b"{}")

        def do_GET(self):
            if self.path in ("/", "/ui", "/ui/"):
                # read-only status page — the reference web SPA analog
                # (web/src/components/Tables.tsx; see control/ui.py)
                from pgsink_spark.control.ui import render_status_page

                data = render_status_page(api, catalog()).encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)
            elif self.path == "/api/health":
                self._json(200, {"status": "healthy"})
            elif self.path == "/api/openapi.json":
                # machine-readable spec derived from the dataclass
                # surface (parity: goa's api/gen/http/openapi3.json)
                from pgsink_spark.control.openapi import build_spec

                self._json(200, build_spec())
            elif self.path == "/metrics":
                # Prometheus text exposition (reference scrapes the
                # process's /metrics — docker-compose.yml:25-60)
                if metrics_text is None:
                    self._json(404, {"error": "metrics not wired"})
                    return
                data = metrics_text().encode()
                self.send_response(200)
                self.send_header(
                    "Content-Type", "text/plain; version=0.0.4"
                )
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)
            elif self.path == "/api/subscriptions/current":
                # goa quirk preserved: Subscriptions.Get responds 201
                # (api/design/api.go:137-145, Response(StatusCreated))
                self._json(201, api.subscription())
            elif self.path in ("/api/imports", "/api/imports/"):
                self._json(200, api.list_imports())
            elif self.path.startswith("/api/tables"):
                rows = [asdict(t) for t in api.list_tables(catalog())]
                self._json(200, {"tables": rows})
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            try:
                body = self._body()
                # subscription routes speak the goa payload field names
                # (schema/name, SubscriptionPublishedTable); the legacy
                # tables routes keep namespace/name
                ns = body.get("namespace", body.get("schema"))
                name = body["name"]
                if ns is None:
                    raise KeyError("namespace")
            except (KeyError, json.JSONDecodeError):
                self._json(400, {"error": "namespace and name required"})
                return
            if self.path == "/api/subscriptions/current/actions/add-table":
                api.add_table(ns, name)
                self._json(201, api.subscription())
            elif self.path == "/api/subscriptions/current/actions/stop-table":
                api.stop_table(ns, name)
                self._json(202, api.subscription())
            elif self.path == "/api/tables/add":
                job = api.add_table(ns, name)
                self._json(
                    201,
                    {
                        "namespace": ns,
                        "name": name,
                        "job_id": None if job is None else job.id,
                    },
                )
            elif self.path == "/api/tables/stop":
                expired = api.stop_table(ns, name)
                self._json(
                    200, {"namespace": ns, "name": name, "expired": expired}
                )
            else:
                self._json(404, {"error": "not found"})

    return Handler


class ControlServer:
    """Threaded control-plane HTTP server (start/stop lifecycle)."""

    def __init__(
        self,
        api: TablesAPI,
        catalog: Callable[[], list[tuple[str, str]]],
        host: str = "127.0.0.1",
        port: int = 0,
        metrics_text: Callable[[], str] | None = None,
    ):
        self._httpd = ThreadingHTTPServer(
            (host, port), _make_handler(api, catalog, metrics_text)
        )
        self._thread: threading.Thread | None = None

    @property
    def address(self) -> str:
        host, port = self._httpd.server_address[:2]
        return f"http://{host}:{port}"

    def start(self) -> "ControlServer":
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread:
            self._thread.join(timeout=5)
