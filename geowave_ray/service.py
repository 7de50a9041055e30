"""Minimal JSON-over-HTTP service surface over the DataStore facade.

The reference exposes its operations through a services layer
(``services/api/.../TypeService.java`` / ``IngestService.java`` /
``StatService.java`` / ``StoreService.java`` / ``IndexService.java``,
served by ``services/rest/.../ApiRestletApplication.java`` and a gRPC
mirror). This module plays that role with the standard library only:
a threading HTTP server dispatching JSON verbs straight onto
:class:`geowave_ray.datastore.DataStore` — one store root per server,
one handler per verb, no framework.

Verbs (all JSON in/out):

========  =====================  ===========================================
method    path                   body / query
========  =====================  ===========================================
GET       /v0/types              -> {"types": [...]}                (TypeService)
POST      /v0/type               {"type_name", opts...}            (addType)
DELETE    /v0/type               {"type_name"}                     (removeType)
POST      /v0/index              {"type_name", "column", "kind"}   (IndexService)
POST      /v0/ingest             {"type_name", "input_path", ...}  (IngestService)
POST      /v0/query              {"gwql", "limit"?} -> rows        (VectorQuery)
POST      /v0/explain            {"gwql"} -> route + evidence      (explain)
GET       /v0/stat               ?type=..&stat=..                  (StatService)
POST      /v0/delete             {"gwql"} -> {"deleted": n}        (delete)
========  =====================  ===========================================

Query results are paged: the server materializes at most
``row_cap`` rows per response (the REST layer's pagination role) —
bulk exports belong to the engine's parquet sinks, not this surface.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from .datastore import DataStore

ROW_CAP = 10_000


def _json_default(v):
    import datetime

    import numpy as np

    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        return float(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    raise TypeError(f"not JSON-serializable: {type(v)}")


class _Handler(BaseHTTPRequestHandler):
    store: DataStore  # set by serve()
    row_cap: int = ROW_CAP

    # silence the default stderr access log
    def log_message(self, fmt, *args):  # noqa: D102
        pass

    def _reply(self, code: int, payload: dict) -> None:
        body = json.dumps(payload, default=_json_default).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _body(self) -> dict:
        n = int(self.headers.get("Content-Length") or 0)
        if not n:
            return {}
        return json.loads(self.rfile.read(n) or b"{}")

    def _dispatch(self) -> None:
        u = urlparse(self.path)
        verb = (self.command, u.path)
        try:
            if verb == ("GET", "/v0/types"):
                return self._reply(200, {"types": self.store.get_types()})
            if verb == ("POST", "/v0/type"):
                b = self._body()
                name = b.pop("type_name")
                self.store.add_type(name, **b)
                return self._reply(200, {"ok": True, "type": name})
            if verb == ("DELETE", "/v0/type"):
                self.store.remove_type(self._body()["type_name"])
                return self._reply(200, {"ok": True})
            if verb == ("POST", "/v0/index"):
                b = self._body()
                self.store.add_index(
                    b["type_name"], b["column"], kind=b.get("kind", "attribute"),
                    terms=b.get("terms"),
                )
                return self._reply(200, {"ok": True})
            if verb == ("POST", "/v0/ingest"):
                b = self._body()
                res = self.store.ingest(
                    b["type_name"], b["input_path"],
                    columns=b.get("columns"), geotag=bool(b.get("geotag")),
                )
                return self._reply(200, res)
            if verb == ("POST", "/v0/query"):
                b = self._body()
                limit = min(int(b.get("limit", self.row_cap)), self.row_cap)
                ds = self.store.query(b["gwql"])
                rows = ds.take(limit)
                return self._reply(
                    200, {"rows": rows, "row_cap": self.row_cap}
                )
            if verb == ("POST", "/v0/explain"):
                return self._reply(200, self.store.explain(self._body()["gwql"]))
            if verb == ("GET", "/v0/stat"):
                q = parse_qs(u.query)
                val = self.store.get_statistic_value(
                    q["type"][0], q.get("stat", ["count"])[0]
                )
                return self._reply(200, {"value": val})
            if verb == ("POST", "/v0/delete"):
                b = self._body()
                n = self.store.delete(b["type_name"], b["where_gwql"])
                return self._reply(200, {"deleted": n})
            return self._reply(404, {"error": f"no route {verb}"})
        except KeyError as e:
            return self._reply(400, {"error": f"missing field {e}"})
        except Exception as e:  # facade errors -> 400 with message
            return self._reply(400, {"error": f"{type(e).__name__}: {e}"})

    do_GET = do_POST = do_DELETE = _dispatch


def serve(store_root: str, host: str = "127.0.0.1", port: int = 0):
    """Start the service on a loopback port; returns (server, port).
    Call ``server.shutdown()`` to stop. The caller owns the Ray
    session (library rule: the service never calls ray.init)."""
    handler = type("Handler", (_Handler,), {"store": DataStore(store_root)})
    srv = ThreadingHTTPServer((host, port), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, srv.server_address[1]
