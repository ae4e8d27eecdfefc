"""Minimal HTTP serving process for the two reference REST endpoints.

The reference is a Spring service exposing ``PUT /api/anonymization``
(JSON-LD) and ``PUT /api/anonymization/flatjson`` (flat JSON)
(``AnonymizationRestController.java:35-70``, 202 Accepted on success, error
bodies from ``GlobalExceptionHandler``). This engine implements both as
library functions (``api.handle_jsonld_request`` / ``handle_flat_request``)
with byte-exact bodies; this module wraps them in a stdlib
``ThreadingHTTPServer`` so the reference's own end-to-end pytest corpus
(``/pytest/test_flat_json.py``: PUT each input, compare the response JSON to
the golden) runs against a live local server. Configuration fetching uses
the live ``http_fetcher`` by default and stays injectable for tests.

Status mapping mirrors the reference controller: a handler result carrying a
``status`` field is an error body and is returned with that HTTP status
(400 validation / 404 ontology / 500 output-shape); anything else is the
success body with 202 Accepted.

Deliberately a REQUEST surface, not a data-plane: corpus-scale work goes
through ``python -m anonymization_ray`` / ``ray job submit``. The server
threads share the driver's Ray session (request-scale payloads run the
java-compat in-process path, so a plain ``serve`` needs no Ray at all).
"""

from __future__ import annotations

import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from .api import (
    FLAT_INSTANCE,
    JSONLD_INSTANCE,
    handle_flat_request,
    handle_jsonld_request,
    http_fetcher,
)

_ROUTES = {
    JSONLD_INSTANCE: handle_jsonld_request,
    FLAT_INSTANCE: handle_flat_request,
}


def _status_of(body: dict) -> int:
    s = body.get("status") if isinstance(body, dict) else None
    return int(s) if isinstance(s, int) else 202


def make_server(
    host: str = "127.0.0.1", port: int = 8081, *, fetch=None
) -> ThreadingHTTPServer:
    """Build (not start) the server; ``fetch`` defaults to the live
    ``http_fetcher`` and is injectable for tests (vendored configs)."""
    fetcher = fetch if fetch is not None else http_fetcher()

    class Handler(BaseHTTPRequestHandler):
        server_version = "anonymization-ray"

        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _reply(self, status: int, body: dict) -> None:
            data = json.dumps(body).encode("utf-8")
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_PUT(self) -> None:  # noqa: N802 — BaseHTTPRequestHandler API
            route = _ROUTES.get(self.path.rstrip("/") or "/")
            if route is None:
                self._reply(
                    404,
                    {
                        "type": "about:blank",
                        "title": "Not Found",
                        "status": 404,
                        "detail": f"No endpoint {self.path}",
                        "instance": self.path,
                    },
                )
                return
            try:
                n = int(self.headers.get("Content-Length") or 0)
                payload = json.loads(self.rfile.read(n).decode("utf-8"))
                if not isinstance(payload, dict):
                    raise ValueError("request body must be a JSON object")
            except (ValueError, UnicodeDecodeError) as e:
                # malformed JSON surfaces like Jackson's handleMessageNotReadable
                self._reply(
                    400,
                    {
                        "status": 400,
                        "error": "Validation failed",
                        "messages": {"body": f"unreadable request body: {e}"},
                    },
                )
                return
            body = route(payload, fetch=fetcher)
            self._reply(_status_of(body), body)

    return ThreadingHTTPServer((host, port), Handler)


def serve(host: str = "127.0.0.1", port: int = 8081, *, fetch=None) -> None:
    """Blocking serve loop (the ``--mode serve`` CLI entry)."""
    srv = make_server(host, port, fetch=fetch)
    print(f"serving PUT {JSONLD_INSTANCE} and PUT {FLAT_INSTANCE} on {host}:{port}")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.server_close()
