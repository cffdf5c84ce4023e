"""In-process fake of the BigQuery v2 REST surface the sink uses.

Implements the documented request/response shapes for datasets, tables
(create/get/patch), ``tabledata.insertAll`` (with per-row validation
against the table schema — unknown payload fields produce
``insertErrors`` exactly like the real service's strict mode), and
multipart media-upload NDJSON load jobs. State is in-memory dicts, so
tests can assert on stored rows and metadata directly.
"""

from __future__ import annotations

import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class BQState:
    def __init__(self):
        self.datasets: dict[str, dict] = {}
        self.tables: dict[tuple[str, str], dict] = {}
        self.rows: dict[tuple[str, str], list[dict]] = {}
        self.jobs: dict[str, dict] = {}
        self.requests: list[tuple[str, str, str | None]] = []  # method, path, auth
        self._job_seq = 0
        self.lock = threading.Lock()

    def next_job_id(self) -> str:
        self._job_seq += 1
        return f"job_{self._job_seq}"


def _payload_field_names(table_md: dict) -> set[str]:
    for f in table_md.get("schema", {}).get("fields", []):
        if f["name"] == "payload":
            return {pf["name"] for pf in f.get("fields", [])}
    return set()


class _Handler(BaseHTTPRequestHandler):
    state: BQState  # set by make_server

    def log_message(self, *a):  # silence
        pass

    def _reply(self, code: int, body: dict | None = None):
        data = json.dumps(body or {}).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def _body(self) -> bytes:
        n = int(self.headers.get("Content-Length", 0))
        return self.rfile.read(n) if n else b""

    def _record(self):
        self.state.requests.append(
            (self.command, self.path, self.headers.get("Authorization"))
        )

    # --- routing ---------------------------------------------------------
    def do_GET(self):
        self._record()
        st = self.state
        with st.lock:
            m = re.fullmatch(r"/bigquery/v2/projects/[^/]+/datasets/([^/]+)", self.path)
            if m:
                ds = st.datasets.get(m.group(1))
                return self._reply(200, ds) if ds else self._notfound()
            m = re.fullmatch(
                r"/bigquery/v2/projects/[^/]+/datasets/([^/]+)/tables/([^/]+)",
                self.path,
            )
            if m:
                t = st.tables.get((m.group(1), m.group(2)))
                return self._reply(200, t) if t else self._notfound()
            m = re.fullmatch(r"/bigquery/v2/projects/[^/]+/jobs/([^/?]+)", self.path)
            if m:
                j = st.jobs.get(m.group(1))
                return self._reply(200, j) if j else self._notfound()
        self._notfound()

    def do_POST(self):
        self._record()
        st = self.state
        body = self._body()
        with st.lock:
            if re.fullmatch(r"/bigquery/v2/projects/[^/]+/datasets", self.path):
                md = json.loads(body)
                ds_id = md["datasetReference"]["datasetId"]
                st.datasets[ds_id] = md
                return self._reply(200, md)
            m = re.fullmatch(
                r"/bigquery/v2/projects/[^/]+/datasets/([^/]+)/tables", self.path
            )
            if m:
                md = json.loads(body)
                t_id = md["tableReference"]["tableId"]
                st.tables[(m.group(1), t_id)] = md
                st.rows.setdefault((m.group(1), t_id), [])
                return self._reply(200, md)
            m = re.fullmatch(
                r"/bigquery/v2/projects/[^/]+/datasets/([^/]+)/tables/([^/]+)/insertAll",
                self.path,
            )
            if m:
                return self._insert_all(m.group(1), m.group(2), json.loads(body))
            m = re.fullmatch(
                r"/upload/bigquery/v2/projects/[^/]+/jobs\?uploadType=multipart",
                self.path,
            )
            if m:
                return self._load_job(body)
        self._notfound()

    def do_PATCH(self):
        self._record()
        st = self.state
        body = self._body()
        with st.lock:
            m = re.fullmatch(
                r"/bigquery/v2/projects/[^/]+/datasets/([^/]+)/tables/([^/]+)",
                self.path,
            )
            if m:
                key = (m.group(1), m.group(2))
                t = st.tables.get(key)
                if not t:
                    return self._notfound()
                t.update(json.loads(body))
                return self._reply(200, t)
        self._notfound()

    # --- behaviors -------------------------------------------------------
    def _insert_all(self, dataset: str, table: str, payload: dict):
        st = self.state
        key = (dataset, table)
        md = st.tables.get(key)
        if md is None:
            return self._notfound()
        allowed = _payload_field_names(md)
        errors = []
        accepted = []
        for i, r in enumerate(payload.get("rows", [])):
            row = r["json"]
            unknown = set((row.get("payload") or {})) - allowed
            if unknown:
                errors.append(
                    {
                        "index": i,
                        "errors": [
                            {
                                "reason": "invalid",
                                "message": f"no such field: {sorted(unknown)[0]}",
                            }
                        ],
                    }
                )
            else:
                accepted.append({"insertId": r.get("insertId"), **row})
        # real service semantics: valid rows are inserted, invalid rows
        # are reported per-index in insertErrors
        st.rows[key].extend(accepted)
        if errors:
            return self._reply(200, {"insertErrors": errors})
        return self._reply(200, {"kind": "bigquery#tableDataInsertAllResponse"})

    def _load_job(self, body: bytes):
        st = self.state
        ctype = self.headers.get("Content-Type", "")
        m = re.search(r'boundary=([^\s;]+)', ctype)
        if not m:
            return self._reply(400, {"error": {"message": "no boundary"}})
        boundary = ("--" + m.group(1)).encode()
        parts = [p for p in body.split(boundary) if p.strip() not in (b"", b"--")]
        meta_part, media_part = parts[0], parts[1]

        def strip_headers(part: bytes) -> bytes:
            return part.split(b"\r\n\r\n", 1)[1].rstrip(b"\r\n")

        cfg = json.loads(strip_headers(meta_part))
        ndjson = strip_headers(media_part)
        load = cfg["configuration"]["load"]
        key = (load["destinationTable"]["datasetId"], load["destinationTable"]["tableId"])
        job_id = st.next_job_id()
        status: dict = {"state": "DONE"}
        if key not in st.tables:
            status["errorResult"] = {"reason": "notFound", "message": "no table"}
        elif load.get("sourceFormat") != "NEWLINE_DELIMITED_JSON":
            status["errorResult"] = {"reason": "invalid", "message": "bad format"}
        else:
            rows = [json.loads(line) for line in ndjson.split(b"\n") if line.strip()]
            allowed = _payload_field_names(st.tables[key])
            bad = [
                r for r in rows if set((r.get("payload") or {})) - allowed
            ]
            if bad:
                status["errorResult"] = {
                    "reason": "invalid",
                    "message": "unknown payload field",
                }
            else:
                st.rows[key].extend(rows)
        job = {"jobReference": {"jobId": job_id}, "status": status}
        st.jobs[job_id] = job
        return self._reply(200, job)

    def _notfound(self):
        self._reply(404, {"error": {"code": 404, "message": "notFound"}})


def make_server() -> tuple[ThreadingHTTPServer, BQState, str]:
    """Start the fake on an ephemeral port; returns (server, state,
    base_url). Caller must ``server.shutdown()``."""
    state = BQState()
    handler = type("BoundHandler", (_Handler,), {"state": state})
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, state, f"http://127.0.0.1:{srv.server_address[1]}"
