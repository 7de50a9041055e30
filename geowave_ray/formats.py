"""Vector format codecs — WKB / WKT / GeoJSON — the engine's stand-in
for the reference's GeoTools vector format plugins
(``extensions/formats/geotools-vector/.../GeoToolsVectorDataStoreIngestPlugin.java``):
no GeoTools/JTS in this environment, so the standard formats are
implemented directly (pure numpy/stdlib, no external geo libs).

Supported geometry types (both WKB byte orders): Point, LineString,
Polygon (multi-ring), MultiPoint, MultiLineString, MultiPolygon.

Internal geometry representation (numpy-first):
  ("Point", (2,) array) | ("LineString", (N,2)) |
  ("Polygon", [rings (N,2)]) | ("MultiPoint", (N,2)) |
  ("MultiLineString", [(N,2)]) | ("MultiPolygon", [[rings]])

Batch entry points are map_batches-shaped (whole-column in/out); the
per-geometry struct walk is I/O-shaped work, and the fixed-width POINT
column fast path is fully vectorized.
"""

from __future__ import annotations

import json
import struct

import numpy as np
import pyarrow as pa

_WKB_TYPES = {
    1: "Point",
    2: "LineString",
    3: "Polygon",
    4: "MultiPoint",
    5: "MultiLineString",
    6: "MultiPolygon",
}
_WKB_CODES = {v: k for k, v in _WKB_TYPES.items()}


# ---------------------------------------------------------------------------
# WKB
# ---------------------------------------------------------------------------


def wkb_decode(buf: bytes):
    """Decode one WKB blob -> (type_name, coords). Handles both byte
    orders and nested multi-geometries."""
    geom, off = _decode_at(buf, 0)
    if off != len(buf):
        # trailing bytes tolerated (some writers pad) but must parse
        pass
    return geom


def _decode_at(buf: bytes, off: int):
    bo = "<" if buf[off] == 1 else ">"
    (code,) = struct.unpack_from(bo + "I", buf, off + 1)
    t = _WKB_TYPES.get(code & 0xFF)
    if t is None:
        raise ValueError(f"unsupported WKB geometry code {code}")
    off += 5
    if t == "Point":
        x, y = struct.unpack_from(bo + "dd", buf, off)
        return ("Point", np.array([x, y])), off + 16
    if t == "LineString":
        (n,) = struct.unpack_from(bo + "I", buf, off)
        pts = np.frombuffer(buf, dtype=bo + "f8", count=2 * n, offset=off + 4)
        return ("LineString", pts.reshape(-1, 2).copy()), off + 4 + 16 * n
    if t == "Polygon":
        (nr,) = struct.unpack_from(bo + "I", buf, off)
        off += 4
        rings = []
        for _ in range(nr):
            (n,) = struct.unpack_from(bo + "I", buf, off)
            pts = np.frombuffer(buf, dtype=bo + "f8", count=2 * n, offset=off + 4)
            rings.append(pts.reshape(-1, 2).copy())
            off += 4 + 16 * n
        return ("Polygon", rings), off
    # multi-geometries: count + nested full WKB per part
    (np_, ) = struct.unpack_from(bo + "I", buf, off)
    off += 4
    parts = []
    for _ in range(np_):
        (g, c), off = _decode_at(buf, off)
        parts.append(c)
    if t == "MultiPoint":
        return ("MultiPoint", np.array([p for p in parts])), off
    if t == "MultiLineString":
        return ("MultiLineString", parts), off
    return ("MultiPolygon", parts), off


def wkb_encode(geom) -> bytes:
    """Encode (type_name, coords) -> little-endian WKB."""
    t, c = geom
    head = struct.pack("<BI", 1, _WKB_CODES[t])
    if t == "Point":
        return head + struct.pack("<dd", float(c[0]), float(c[1]))
    if t == "LineString":
        arr = np.asarray(c, dtype="<f8")
        return head + struct.pack("<I", len(arr)) + arr.tobytes()
    if t == "Polygon":
        out = [head, struct.pack("<I", len(c))]
        for ring in c:
            arr = np.asarray(ring, dtype="<f8")
            out.append(struct.pack("<I", len(arr)))
            out.append(arr.tobytes())
        return b"".join(out)
    if t == "MultiPoint":
        arr = np.asarray(c, dtype=np.float64)
        return (
            head
            + struct.pack("<I", len(arr))
            + b"".join(wkb_encode(("Point", p)) for p in arr)
        )
    if t == "MultiLineString":
        return (
            head
            + struct.pack("<I", len(c))
            + b"".join(wkb_encode(("LineString", p)) for p in c)
        )
    if t == "MultiPolygon":
        return (
            head
            + struct.pack("<I", len(c))
            + b"".join(wkb_encode(("Polygon", p)) for p in c)
        )
    raise ValueError(t)


def decode_point_column(col: pa.Array | pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized fast path for a column of little-endian POINT WKB
    (fixed 21-byte payloads): one numpy view, no per-row Python."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if not pa.types.is_large_binary(col.type):
        col = col.cast(pa.large_binary())
    offsets = np.frombuffer(col.buffers()[1], dtype=np.int64)[
        col.offset : col.offset + len(col) + 1
    ]
    lens = np.diff(offsets)
    if not np.all(lens == 21):
        raise ValueError("not a fixed-width WKB point column")
    data = np.frombuffer(col.buffers()[2], dtype=np.uint8)[
        offsets[0] : offsets[-1]
    ].reshape(-1, 21)
    if not np.all(data[:, 0] == 1):
        raise ValueError("big-endian points in fast path")
    xy = data[:, 5:21].copy().view("<f8").reshape(-1, 2)
    return xy[:, 0], xy[:, 1]


def encode_point_column(lon: np.ndarray, lat: np.ndarray) -> pa.Array:
    """Vectorized inverse of :func:`decode_point_column`: lon/lat
    float64 arrays -> a large_binary column of 21-byte little-endian
    WKB points, built as one contiguous numpy buffer (no per-row
    Python)."""
    lon = np.ascontiguousarray(lon, dtype="<f8")
    lat = np.ascontiguousarray(lat, dtype="<f8")
    n = len(lon)
    buf = np.empty((n, 21), dtype=np.uint8)
    buf[:, 0] = 1  # little-endian
    buf[:, 1:5] = np.frombuffer(struct.pack("<I", 1), dtype=np.uint8)
    buf[:, 5:13] = lon.reshape(-1, 1).view(np.uint8)
    buf[:, 13:21] = lat.reshape(-1, 1).view(np.uint8)
    offsets = np.arange(0, 21 * (n + 1), 21, dtype=np.int64)
    return pa.LargeBinaryArray.from_buffers(
        pa.large_binary(),
        n,
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(buf.tobytes())],
    )


def wkt_point_column(lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
    """Vectorized WKT for a point column: ``POINT (x y)`` with %.10g
    coordinate formatting (C printf semantics on both sides of the
    oracle — verified identical to DuckDB's printf('%.10g'))."""
    xs = np.char.mod("%.10g", np.asarray(lon, dtype=np.float64))
    ys = np.char.mod("%.10g", np.asarray(lat, dtype=np.float64))
    return np.char.add(
        np.char.add(np.char.add("POINT (", xs), np.char.add(" ", ys)), ")"
    )


# ---------------------------------------------------------------------------
# WKT
# ---------------------------------------------------------------------------


def wkt_encode(geom) -> str:
    t, c = geom

    def ring(r):
        return "(" + ", ".join(f"{x:.10g} {y:.10g}" for x, y in np.asarray(r)) + ")"

    if t == "Point":
        return f"POINT ({c[0]:.10g} {c[1]:.10g})"
    if t == "LineString":
        return "LINESTRING " + ring(c)
    if t == "Polygon":
        return "POLYGON (" + ", ".join(ring(r) for r in c) + ")"
    if t == "MultiPoint":
        return "MULTIPOINT " + ring(c)
    if t == "MultiLineString":
        return "MULTILINESTRING (" + ", ".join(ring(p) for p in c) + ")"
    if t == "MultiPolygon":
        return (
            "MULTIPOLYGON ("
            + ", ".join("(" + ", ".join(ring(r) for r in p) + ")" for p in c)
            + ")"
        )
    raise ValueError(t)


def wkt_decode(s: str):
    s = s.strip()
    kind = s.split("(", 1)[0].strip().upper()
    body = s[s.index("(") :]

    def parse_ring(txt: str) -> np.ndarray:
        pts = [p.strip() for p in txt.split(",")]
        return np.array([[float(a) for a in p.split()] for p in pts])

    def split_groups(txt: str) -> list[str]:
        """Split 'a), (b), (c' style nesting at depth 0 commas."""
        groups, depth, start = [], 0, 0
        for i, ch in enumerate(txt):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 0:
                groups.append(txt[start:i])
                start = i + 1
        groups.append(txt[start:])

        def strip1(g: str) -> str:
            g = g.strip()
            # strip exactly one balanced paren layer (not all leading parens:
            # a MultiPolygon group is itself a '((ring), (ring))' nest)
            if g.startswith("(") and g.endswith(")"):
                return g[1:-1]
            return g

        return [strip1(g) for g in groups]

    inner = body.strip()[1:-1]
    if kind == "POINT":
        return ("Point", parse_ring(inner)[0])
    if kind == "LINESTRING":
        return ("LineString", parse_ring(inner))
    if kind == "POLYGON":
        return ("Polygon", [parse_ring(g) for g in split_groups(inner)])
    if kind == "MULTIPOINT":
        return ("MultiPoint", parse_ring(inner.replace("(", "").replace(")", "")))
    if kind == "MULTILINESTRING":
        return ("MultiLineString", [parse_ring(g) for g in split_groups(inner)])
    if kind == "MULTIPOLYGON":
        polys = []
        for g in split_groups(inner):
            polys.append([parse_ring(r) for r in split_groups(g)])
        return ("MultiPolygon", polys)
    raise ValueError(kind)


# ---------------------------------------------------------------------------
# GeoJSON
# ---------------------------------------------------------------------------


def geojson_to_geom(g: dict):
    t = g["type"]
    c = g["coordinates"]
    if t == "Point":
        return ("Point", np.asarray(c, dtype=np.float64))
    if t in ("LineString", "MultiPoint"):
        return (t, np.asarray(c, dtype=np.float64))
    if t in ("Polygon", "MultiLineString"):
        return (t, [np.asarray(r, dtype=np.float64) for r in c])
    if t == "MultiPolygon":
        return (t, [[np.asarray(r, dtype=np.float64) for r in p] for p in c])
    raise ValueError(t)


def geom_to_geojson(geom) -> dict:
    t, c = geom
    if t in ("Point", "LineString", "MultiPoint"):
        return {"type": t, "coordinates": np.asarray(c).tolist()}
    if t in ("Polygon", "MultiLineString"):
        return {"type": t, "coordinates": [np.asarray(r).tolist() for r in c]}
    return {
        "type": t,
        "coordinates": [[np.asarray(r).tolist() for r in p] for p in c],
    }


def _parse_geojson_file(path: str) -> pa.Table:
    """One GeoJSON FeatureCollection file (or NDJSON of Features) ->
    (properties..., geometry_wkb) Arrow table. Runs INSIDE read tasks —
    never on the driver for multi-file ingest."""
    with open(path) as f:
        head = f.read(64)
        f.seek(0)
        if head.lstrip().startswith("{") and '"FeatureCollection"' in f.read():
            f.seek(0)
            feats = json.load(f)["features"]
        else:
            f.seek(0)
            feats = [json.loads(line) for line in f if line.strip()]
    rows: dict[str, list] = {}
    wkbs = []
    for ft in feats:
        wkbs.append(wkb_encode(geojson_to_geom(ft["geometry"])))
        for k, v in (ft.get("properties") or {}).items():
            rows.setdefault(k, [None] * (len(wkbs) - 1)).append(v)
        for k in rows:
            if len(rows[k]) < len(wkbs):
                rows[k].append(None)
    return pa.table({**rows, "geometry_wkb": pa.array(wkbs, pa.binary())})


def read_geojson(path: str, parallelism: int = -1):
    """GeoJSON FeatureCollection (or NDJSON of features) -> Dataset of
    (properties..., geometry_wkb). Single-file format ingest: the parse
    happens once; downstream stages operate on the WKB column."""
    import ray.data

    ds = ray.data.from_arrow(_parse_geojson_file(path))
    return ds if parallelism < 0 else ds.repartition(parallelism)


# ---------------------------------------------------------------------------
# batch stats (decode-verification shape)
# ---------------------------------------------------------------------------


def wkb_stats_batch(batch: pa.Table, col: str = "geometry_wkb") -> pa.Table:
    """Per-geometry vertex count + exact envelope from the decoded
    coordinates (min/max are float-exact and order-free, so this is
    oracle-comparable against an edge-table rebuild)."""
    out_n, out_xmin, out_ymin, out_xmax, out_ymax = [], [], [], [], []
    for v in batch.column(col):
        t, c = wkb_decode(v.as_py())
        if t == "Point":
            pts = np.asarray(c).reshape(1, 2)
        elif t in ("LineString", "MultiPoint"):
            pts = np.asarray(c)
        elif t in ("Polygon", "MultiLineString"):
            pts = np.vstack(c)
        else:
            pts = np.vstack([r for p in c for r in p])
        out_n.append(len(pts))
        out_xmin.append(pts[:, 0].min())
        out_ymin.append(pts[:, 1].min())
        out_xmax.append(pts[:, 0].max())
        out_ymax.append(pts[:, 1].max())
    keep = [n for n in batch.column_names if n != col]
    t = batch.select(keep)
    for name, vals, typ in (
        ("n_points", out_n, pa.int64()),
        ("gxmin", out_xmin, pa.float64()),
        ("gymin", out_ymin, pa.float64()),
        ("gxmax", out_xmax, pa.float64()),
        ("gymax", out_ymax, pa.float64()),
    ):
        t = t.append_column(name, pa.array(vals, typ))
    return t


def geojson_feature_lines(
    batch: pa.Table, wkb_col: str = "geometry_wkb"
) -> list[str]:
    """One NDJSON GeoJSON Feature string per row (properties = every
    non-geometry column). Export boundary: the output is row-formatted
    text by definition, so this is the one deliberate per-row loop —
    everything upstream stays columnar."""
    props_cols = [n for n in batch.column_names if n != wkb_col]
    props = batch.select(props_cols).to_pylist() if props_cols else [{}] * len(batch)
    out = []
    for i, v in enumerate(batch.column(wkb_col)):
        ft = {
            "type": "Feature",
            "geometry": geom_to_geojson(wkb_decode(v.as_py())),
            "properties": props[i],
        }
        out.append(json.dumps(ft, separators=(",", ":"), default=str))
    return out


def write_geojson(ds, out_dir: str, wkb_col: str = "geometry_wkb") -> None:
    """Distributed GeoJSON export sink (VectorLocalExportCommand role,
    ``extensions/cli/.../VectorLocalExportCommand.java``, GeoJSON
    format): each block writes ONE newline-delimited-feature file
    under ``out_dir`` (partitioned, resumable layout — never a single
    giant file). Readable back by :func:`read_geojson`."""
    import os
    import uuid

    os.makedirs(out_dir, exist_ok=True)

    def sink(batch: pa.Table) -> pa.Table:
        if len(batch):
            name = f"part-{uuid.uuid4().hex}.geojsonl"
            tmp = os.path.join(out_dir, "." + name)
            with open(tmp, "w") as f:
                f.write("\n".join(geojson_feature_lines(batch, wkb_col)) + "\n")
            os.replace(tmp, os.path.join(out_dir, name))
        return pa.table({"n": pa.array([len(batch)], pa.int64())})

    ds.map_batches(sink, batch_format="pyarrow", batch_size=None).count()


def read_geojson_dir(path: str, parallelism: int = -1):
    """Read a directory of ``.geojsonl`` files (the write_geojson
    layout) or a single file. Distributed: the file list fans out as a
    Dataset and each read task parses its files — the driver never
    touches feature text, so the reader scales with file count."""
    import os

    if os.path.isdir(path):
        import ray.data

        files = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".geojsonl") or f.endswith(".json")
        )
        if not files:
            raise FileNotFoundError(f"no geojson files under {path}")

        def parse(batch: pa.Table) -> pa.Table:
            return pa.concat_tables(
                [_parse_geojson_file(p.as_py()) for p in batch.column("path")],
                promote_options="default",
            )

        ds = ray.data.from_arrow(pa.table({"path": pa.array(files)})).map_batches(
            parse, batch_format="pyarrow", batch_size=1
        )
        return ds if parallelism < 0 else ds.repartition(parallelism)
    return read_geojson(path, parallelism)


def wkb_measures_batch(batch: pa.Table, col: str = "geometry_wkb") -> pa.Table:
    """Scalar geometry measures per row (ST_Area / ST_Centroid /
    perimeter UDF roles): quantized-integer shoelace relative to the
    row's declared (xmin, ymin) origin so every value is exactly
    reproducible by an order-free SQL aggregate over the edge table —
    see :func:`geowave_ray.geom.ring_measures_q`."""
    from .geom import ring_measures_q

    x0s = batch.column("xmin").to_numpy()
    y0s = batch.column("ymin").to_numpy()
    areas, perims, cxs, cys = [], [], [], []
    for i, v in enumerate(batch.column(col)):
        t, c = wkb_decode(v.as_py())
        if t == "Polygon":
            rings = c
        elif t == "MultiPolygon":
            rings = [r for p in c for r in p]
        else:
            raise ValueError(f"measures need polygonal WKB, got {t}")
        a2, cxn, cyn, perim_u = ring_measures_q(rings, float(x0s[i]), float(y0s[i]))
        areas.append(a2 / 200000000.0)
        perims.append(perim_u / 1000000.0)
        if a2 == 0:  # degenerate ring: centroid undefined
            cxs.append(float("nan"))
            cys.append(float("nan"))
        else:
            cxs.append(float(x0s[i]) + (cxn / (3.0 * a2)) / 10000.0)
            cys.append(float(y0s[i]) + (cyn / (3.0 * a2)) / 10000.0)
    keep = [n for n in batch.column_names if n not in (col, "xmin", "ymin")]
    t = batch.select(keep)
    for name, vals in (
        ("area", areas),
        ("perimeter", perims),
        ("centroid_x", cxs),
        ("centroid_y", cys),
    ):
        t = t.append_column(name, pa.array(vals, pa.float64()))
    return t
