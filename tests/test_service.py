"""Loopback test of the JSON-over-HTTP service surface
(services/api TypeService / IngestService / StatService / vector
query roles): drives addType -> ingest -> add_index -> query ->
explain -> stat -> delete -> removeType end-to-end through real HTTP
requests against a threading server."""

import json
import urllib.request

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _call(port, method, path, body=None):
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=data, method=method,
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.fixture()
def service(tmp_path, ray_session):
    from geowave_ray.service import serve

    srv, port = serve(str(tmp_path / "svc_store"))
    yield port
    srv.shutdown()


def test_service_end_to_end(service, tmp_path):
    port = service
    rng = np.random.default_rng(11)
    n = 2000
    t = pa.table(
        {
            "pid": pa.array(np.arange(n), pa.int64()),
            "lon": pa.array(rng.uniform(-170, 170, n), pa.float64()),
            "lat": pa.array(rng.uniform(-80, 80, n), pa.float64()),
            "kind": pa.array([["a", "b", "c"][i % 3] for i in range(n)]),
        }
    )
    src = tmp_path / "svc_in"
    src.mkdir()
    pq.write_table(t, src / "pts.parquet")

    code, types = _call(port, "GET", "/v0/types")
    assert code == 200 and types == {"types": []}

    code, _ = _call(port, "POST", "/v0/type", {"type_name": "pts"})
    assert code == 200
    code, res = _call(
        port, "POST", "/v0/ingest", {"type_name": "pts", "input_path": str(src)}
    )
    assert code == 200 and res["rows"] == n

    code, _ = _call(
        port, "POST", "/v0/index",
        {"type_name": "pts", "column": "kind", "kind": "enum"},
    )
    assert code == 200

    q = "SELECT pid, kind FROM pts WHERE kind = 'b'"
    code, plan = _call(port, "POST", "/v0/explain", {"gwql": q})
    assert code == 200 and plan["index"] == "enum"
    code, out = _call(port, "POST", "/v0/query", {"gwql": q})
    assert code == 200
    want = sorted(i for i in range(n) if i % 3 == 1)
    assert sorted(r["pid"] for r in out["rows"]) == want

    code, stat = _call(port, "GET", "/v0/stat?type=pts&stat=count")
    assert code == 200 and stat["value"] == n

    code, d = _call(
        port, "POST", "/v0/delete",
        {"type_name": "pts", "where_gwql": "kind = 'c'"},
    )
    assert code == 200 and d["deleted"] == len([i for i in range(n) if i % 3 == 2])

    code, stat = _call(port, "GET", "/v0/stat?type=pts&stat=count")
    assert code == 200 and stat["value"] == n - d["deleted"]

    # the delete rewrote groups: the enum index must have been rebuilt
    code, out = _call(
        port, "POST", "/v0/query",
        {"gwql": "SELECT pid FROM pts WHERE kind = 'c'"},
    )
    assert code == 200 and out["rows"] == []
    code, out = _call(port, "POST", "/v0/query", {"gwql": q})
    assert code == 200 and sorted(r["pid"] for r in out["rows"]) == want

    # error surfaces as 400 + message, not a hung socket
    code, err = _call(port, "POST", "/v0/query", {"gwql": "SELECT FROM nope"})
    assert code == 400 and "error" in err
    code, err = _call(port, "POST", "/v0/type", {})
    assert code == 400

    code, _ = _call(port, "DELETE", "/v0/type", {"type_name": "pts"})
    assert code == 200
    code, types = _call(port, "GET", "/v0/types")
    assert types == {"types": []}
