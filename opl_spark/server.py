"""HTTP serving layer over :class:`opl_spark.api.OlapApi` — the
boundary every real consumer of the reference hits.

The reference engine is consumed over HTTP (api-library-olap/
README.md:3-13 — routes ``/olap/fact_tables`` and
``/olap/<fact>/dimensions|measures|aggregate``; the Data Studio
connector, DataStudio-connector/Codice.gs:42,20-26, fetches them with
plain GETs).  This module is the thin transport over the
transport-free ``OlapApi.handle``: stdlib ``http.server`` only, no
framework dependency.

Scale shape: the server is a DRIVER-side component.  Each request
delegates to ``CubeEngine.aggregate`` (distributed; the response is
the dimension-cardinality-sized OUTPUT of a cube aggregation, never a
raw fact scan), so the HTTP layer only ever serializes
report-sized payloads.  ``ThreadingHTTPServer`` handles concurrent
clients; Spark actions are thread-safe on one SparkSession and the
scheduler interleaves the jobs.
"""

from __future__ import annotations

import json
import threading
from datetime import date, datetime
from decimal import Decimal
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any
from urllib.parse import parse_qs, urlsplit

from opl_spark.api import OlapApi


def json_default(obj: Any) -> Any:
    """JSON fallbacks for the value types cube rows carry: ISO dates
    (the connector parses YYYY-MM-DD, Codice.gs:361-373) and exact
    decimals as doubles."""
    if isinstance(obj, (date, datetime)):
        return obj.isoformat()
    if isinstance(obj, Decimal):
        return float(obj)
    raise TypeError(f"not JSON serializable: {type(obj).__name__}")


def encode_response(payload: Any) -> bytes:
    """The canonical wire encoding — shared by the server and by tests
    asserting byte-identity with direct ``OlapApi.handle`` calls."""
    return json.dumps(payload, default=json_default).encode("utf-8")


class OlapHttpServer:
    """Serve an ``OlapApi`` over HTTP.

    >>> srv = OlapHttpServer(api)          # port=0 → ephemeral
    >>> srv.start()
    >>> requests.get(f"http://127.0.0.1:{srv.port}/olap/fact_tables")
    >>> srv.stop()

    Context-manager form closes the socket on exit.  Unknown routes
    (``OlapApi.handle`` raises KeyError) map to 404; malformed requests
    (ValueError — bad cut grammar, unknown having column, …) map to
    400; anything else is an ENGINE failure and maps to 500 — always
    with the exception text, errors are reported, never swallowed into
    empty 200s.  The 400/500 split matters operationally: a client
    must not retry a 400 (the request is wrong) but may retry a 500 (a
    transient task failure — e.g. an allocation retry under GC
    pressure — served mid-soak is a retryable condition, r12)."""

    def __init__(self, api: OlapApi, host: str = "127.0.0.1", port: int = 0):
        outer_api = api

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self) -> None:  # noqa: N802 (http.server API)
                url = urlsplit(self.path)
                params = {k: v[0] for k, v in parse_qs(url.query).items()}
                try:
                    payload = outer_api.handle(url.path, params)
                except KeyError as exc:
                    self._reply(404, {"error": str(exc)})
                except ValueError as exc:
                    self._reply(400, {"error": f"{type(exc).__name__}: {exc}"})
                except Exception as exc:  # noqa: BLE001 — boundary layer
                    self._reply(500, {"error": f"{type(exc).__name__}: {exc}"})
                else:
                    self._reply(200, payload)

            def _reply(self, code: int, payload: Any) -> None:
                body = encode_response(payload)
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *args: Any) -> None:
                pass  # quiet: the engine logs; per-request lines are noise

        self._server = ThreadingHTTPServer((host, port), Handler)
        self._thread: threading.Thread | None = None

    @property
    def port(self) -> int:
        return self._server.server_address[1]

    def start(self) -> "OlapHttpServer":
        self._thread = threading.Thread(
            target=self._server.serve_forever, name="olap-http", daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
        if self._thread is not None:
            self._thread.join(timeout=10)
            self._thread = None

    def serve_forever(self) -> None:
        """Foreground serving for the CLI ``serve`` command."""
        self._server.serve_forever()

    def __enter__(self) -> "OlapHttpServer":
        return self.start()

    def __exit__(self, *exc: Any) -> None:
        self.stop()
