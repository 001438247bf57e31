"""HTTP API over the engine's Parquet outputs — the reference's FastAPI
surface (api/main.py:22-344) on the standard library (no FastAPI in this
environment; ``http.server.ThreadingHTTPServer`` + a regex router).

Route parity (pages-entity analog of the reference's player endpoints):

    GET  /health                                  (main.py:22-24, open)
    POST /mapping/run                             (main.py:27-30, open)
    GET  /ues/entity/{ues_id}                     (main.py:55-61)
    GET  /lookup/entity/by-url?url=               (main.py:63-85)
    GET  /ues/entity/{ues_id}/lineage             (main.py:87-98)
    GET  /validation/reviews?status=&limit=       (main.py:112-158)
    GET  /validation/reviews/{id}                 (main.py:160-169)
    POST /validation/reviews/{id}/approve         (main.py:189-192)
    POST /validation/reviews/{id}/reject          (main.py:194-197)
    GET  /monitoring/summary?run_id=              (main.py:244-334)
    GET  /monitoring/gates?run_id=                (main.py:337-344)
    GET  /openapi.json

Auth: intentionally STRICTER than the reference — the reference guards only
its /validation/* and /monitoring/* routes with the internal key
(main.py:33-43; its /ues/* and /lookup/* routes are open), while this
server additionally protects /ues/ and /lookup/. Same mechanism: the
``X-Internal-API-Key`` header must equal ``$UES_INTERNAL_API_KEY``; 500
when the env var is unset, 401 on mismatch. Clients ported from the
reference must send the key on lookup routes too (or trim
``_PROTECTED_PREFIXES`` for route-for-route parity).
"""

from __future__ import annotations

import json
import os
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

INTERNAL_KEY_ENV = "UES_INTERNAL_API_KEY"

_PROTECTED_PREFIXES = ("/ues/", "/lookup/", "/validation/", "/monitoring/")

_ROUTES = [
    ("GET", "/health"),
    ("POST", "/mapping/run"),
    ("GET", "/ues/entity/{ues_id}"),
    ("GET", "/lookup/entity/by-url"),
    ("GET", "/ues/entity/{ues_id}/lineage"),
    ("GET", "/validation/reviews"),
    ("GET", "/validation/reviews/{review_id}"),
    ("POST", "/validation/reviews/{review_id}/approve"),
    ("POST", "/validation/reviews/{review_id}/reject"),
    ("GET", "/monitoring/summary"),
    ("GET", "/monitoring/gates"),
]


def openapi_schema() -> dict:
    """Minimal OpenAPI 3 document for the served routes (the reference's
    contract test asserts title + path/method/200-response presence,
    tests/test_api_contract.py:7-30)."""
    paths: dict = {}
    for method, path in _ROUTES:
        paths.setdefault(path, {})[method.lower()] = {
            "responses": {"200": {"description": "OK"}}
        }
    return {
        "openapi": "3.0.0",
        "info": {"title": "Unified Entity Store API", "version": "1.0.0"},
        "paths": paths,
    }


class UESApiServer:
    """Serves one pipeline output directory. ``pages_path`` (optional)
    enables POST /mapping/run to (re)run the flagship pipeline."""

    def __init__(self, out_dir: str, pages_path: str | None = None, port: int = 0):
        self.out_dir = out_dir
        self.pages_path = pages_path
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # silence request logging
                pass

            def _send(self, code: int, payload) -> None:
                body = json.dumps(payload, default=str).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _auth(self) -> bool:
                expected = os.getenv(INTERNAL_KEY_ENV)
                if not expected:
                    self._send(500, {"detail": "Internal API key not configured"})
                    return False
                if self.headers.get("X-Internal-API-Key") != expected:
                    self._send(401, {"detail": "Unauthorized"})
                    return False
                return True

            def _route(self, method: str) -> None:
                url = urlparse(self.path)
                path, q = url.path, parse_qs(url.query)
                try:
                    outer._dispatch(self, method, path, q)
                except KeyError as exc:
                    self._send(404, {"detail": str(exc)})
                except Exception as exc:  # surface handler faults as 500s
                    self._send(500, {"detail": repr(exc)})

            def do_GET(self):
                self._route("GET")

            def do_POST(self):
                self._route("POST")

        self._server = ThreadingHTTPServer(("127.0.0.1", port), Handler)
        self._thread: threading.Thread | None = None

    # ---------------------------------------------------------------- routing

    def _dispatch(self, h, method: str, path: str, q: dict) -> None:
        from entity_resolution_engine_ray.state.lookups import (
            ReviewQueue,
            entity_by_id,
            entity_by_url,
            lineage_of_entity,
        )

        if method == "GET" and path == "/health":
            return h._send(200, {"status": "ok"})
        if method == "GET" and path == "/openapi.json":
            return h._send(200, openapi_schema())
        if method == "POST" and path == "/mapping/run":
            if not self.pages_path:
                return h._send(400, {"detail": "no pages input configured"})
            from entity_resolution_engine_ray.pipelines.pages_er import run_pages_er

            res = run_pages_er(self.pages_path, self.out_dir)
            return h._send(200, {"status": "mapping_complete", "run_id": res["run_id"]})

        if path.startswith(_PROTECTED_PREFIXES) and not h._auth():
            return None

        m = re.fullmatch(r"/ues/entity/([^/]+)", path)
        if method == "GET" and m:
            row = entity_by_id(self.out_dir, m.group(1))
            if row is None:
                return h._send(404, {"detail": "entity not found"})
            return h._send(200, row)
        m = re.fullmatch(r"/ues/entity/([^/]+)/lineage", path)
        if method == "GET" and m:
            return h._send(200, lineage_of_entity(self.out_dir, m.group(1)))
        if method == "GET" and path == "/lookup/entity/by-url":
            url_param = (q.get("url") or [None])[0]
            if not url_param:
                return h._send(400, {"detail": "url query parameter required"})
            row = entity_by_url(self.out_dir, url_param)
            if row is None:
                return h._send(404, {"detail": "entity not found"})
            return h._send(200, row)

        rq = ReviewQueue(self.out_dir)
        if method == "GET" and path == "/validation/reviews":
            status = (q.get("status") or [None])[0]
            limit = int((q.get("limit") or ["50"])[0])
            return h._send(200, rq.list(status=status)[:limit])
        m = re.fullmatch(r"/validation/reviews/([^/]+)", path)
        if method == "GET" and m:
            items = [i for i in rq.list() if str(i["id"]) == m.group(1)]
            if not items:
                return h._send(404, {"detail": "review not found"})
            return h._send(200, items[0])
        m = re.fullmatch(r"/validation/reviews/([^/]+)/(approve|reject)", path)
        if method == "POST" and m:
            rid, action = m.group(1), m.group(2)
            getattr(rq, action)(rid)  # KeyError → 404 via dispatcher
            return h._send(200, {"id": rid, "status": action.upper() + ("D" if action == "approve" else "ED")})

        if method == "GET" and path == "/monitoring/summary":
            from entity_resolution_engine_ray.state.metrics import (
                MetricsStore,
                monitoring_summary,
            )

            run_id = (q.get("run_id") or [None])[0]
            store = MetricsStore(os.path.join(self.out_dir, "history"))
            metrics = store.run_metrics()
            rows = (
                metrics[metrics["run_id"] == run_id].to_dict("records")
                if not metrics.empty and run_id
                else metrics.to_dict("records")
            )
            summary = monitoring_summary(rows, rq.list())
            summary["run_id"] = run_id
            return h._send(200, summary)
        if method == "GET" and path == "/monitoring/gates":
            run_id = (q.get("run_id") or [None])[0]
            gates_dir = os.path.join(self.out_dir, "history", "quality_gates")
            if run_id and os.path.exists(os.path.join(gates_dir, f"{run_id}.json")):
                with open(os.path.join(gates_dir, f"{run_id}.json")) as f:
                    return h._send(200, json.load(f))
            results = []
            if os.path.isdir(gates_dir):
                for name in sorted(os.listdir(gates_dir)):
                    with open(os.path.join(gates_dir, name)) as f:
                        results.append(json.load(f))
            return h._send(200, results)

        return h._send(404, {"detail": f"no route {method} {path}"})

    # ---------------------------------------------------------------- lifecycle

    @property
    def port(self) -> int:
        return self._server.server_address[1]

    def start(self) -> "UESApiServer":
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
        if self._thread:
            self._thread.join(timeout=5)
