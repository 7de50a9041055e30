"""Deterministic synthetic fixtures per FIXTURES.md (seed=42, pure
function of row index — no external data, no RNG state).

Tables generated under ``/tmp/geowave_fixtures/<sf_name>/``:

- ``pages``         — the north-rule input shape (url, warc_ts, html,
                      text, lang) + ``row_id`` and the ORACLE-ONLY
                      derived ``lon``/``lat`` columns (engine pipelines
                      re-derive lon/lat from url/lang and never read the
                      stored ones; tests assert both agree bit-for-bit).
- ``regions``       — convex CCW polygons (WKB + bbox columns) for the
                      PIP join (plays the role of the reference's
                      tornado_tracks/filter shapes,
                      ``AbstractGeoWaveBasicVectorIT.java:100-128``).
- ``region_edges``  — exploded directed CCW edges (x1,y1,x2,y2) so the
                      DuckDB oracle can do the exact half-plane PIP test.
- ``queries``       — golden bbox/polygon (± temporal) query shapes.
- ``knn_queries``   — kNN probe points with k ∈ {1,5,20}.
- ``raster_chunks`` — overlapping raster chunks with closed-form pixel
                      values ((i+p) % 97) for tile-merge oracles
                      (``GeoWaveBasicRasterIT.java:573-640`` analogue).

Scale is keyed off the testdata sf directory name:
sf0.001 → 10k pages, sf0.01 → 100k, sf0.1 → 1M.
"""

from __future__ import annotations

import hashlib
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .geom import polygon_wkb
from .geotag import derive_lonlat

FIXTURE_VERSION = "v3"
FIXTURE_ROOT = "/tmp/geowave_fixtures"

LANGS = ["en", "de", "fr", "es", "zh", "ru", "pt", "ja"]
LANG_CUM = np.cumsum([40, 10, 10, 10, 10, 8, 7, 5])

SCALES = {
    "sf0.001": dict(pages=10_000, regions=512, chunks=128),
    "sf0.01": dict(pages=100_000, regions=1024, chunks=256, codec=32),
    "sf0.1": dict(pages=1_000_000, regions=2048, chunks=512, codec=96),
    # scaling-proof fixture: large enough that the headline join is
    # compute-bound (~100s CPU), so N vs 4N parallelism separates.
    # ``docs`` is the scaled synthetic corpus for the docs-pipeline
    # scaling proof (minhash-LSH + two-pass exact dedup at N vs 4N).
    "sf_scaling": dict(pages=8_000_000, regions=2048, chunks=512, docs=4_000_000),
    # sf1 scale-stress (VERDICT r4 #1): 10x sf0.1 across pages, the
    # TPC-H-shaped tables and the per-query documents table, plus
    # wire-codec volume fixtures; the FULL bench plan runs here with
    # GRAFT_SF_DIR=/tmp/geowave_fixtures/sf1
    "sf1": dict(pages=10_000_000, regions=4096, chunks=1024,
                docs=1_000_000, tpch=10, codec=256),
    # scaling-ladder variant at sf1 volume (10M pages / 16M docs)
    "sf_scaling1": dict(pages=10_000_000, regions=2048, chunks=512,
                        docs=16_000_000),
}
ROWS_PER_FILE = 50_000


def fixture_dir(sf_dir: str) -> str:
    name = os.path.basename(os.path.normpath(sf_dir))
    if name not in SCALES:
        name = "sf0.01"
    return os.path.join(FIXTURE_ROOT, name)


def _h(s: str) -> bytes:
    return hashlib.sha256(s.encode()).digest()


def _u(tag: str, lo: float, hi: float) -> float:
    """Deterministic uniform in [lo, hi) from a string tag."""
    v = int.from_bytes(_h(tag)[:8], "big") / 2**64
    return lo + v * (hi - lo)


# ---------------------------------------------------------------------------
# pages
# ---------------------------------------------------------------------------


def gen_pages(n_rows: int) -> pa.Table:
    return gen_pages_slice(0, n_rows, n_rows)


# ---------------------------------------------------------------------------
# regions (convex CCW polygons)
# ---------------------------------------------------------------------------

from .geotag import CLUSTER_CENTERS


def _region_ring(j: int) -> np.ndarray:
    k = 4 + j % 5
    radius = 0.1 + (j % 20) * 0.25
    if j % 16 == 0:
        cx, cy = CLUSTER_CENTERS[(j // 16) % 4]
    else:
        cx = _u(f"regioncx{j}", -170.0, 170.0)
        cy = _u(f"regioncy{j}", -80.0, 80.0)
    angles = sorted(_u(f"regionang{j}.{m}", 0.0, 2 * np.pi) for m in range(k))
    xs = cx + radius * np.cos(angles)
    ys = cy + radius * np.sin(angles)
    return np.column_stack([xs, ys])  # sorted angles about center => CCW convex


def _concave_ring(j: int) -> np.ndarray:
    """Deterministic simple CONCAVE star ring (2k vertices, alternating
    outer/inner radius, angles strictly increasing => CCW, no
    self-intersection). Exercises the ray-cast join path."""
    k = 5 + j % 4
    r_out = 0.3 + (j % 10) * 0.3
    r_in = r_out * (0.35 + 0.1 * (j % 3))
    if j % 4 == 0:
        cx, cy = CLUSTER_CENTERS[(j // 4) % 4]
    else:
        cx = _u(f"concx{j}", -160.0, 160.0)
        cy = _u(f"concy{j}", -75.0, 75.0)
    ang0 = _u(f"conang{j}", 0.0, 2 * np.pi)
    angles = ang0 + np.arange(2 * k) * (np.pi / k)
    rad = np.where(np.arange(2 * k) % 2 == 0, r_out, r_in)
    xs = cx + rad * np.cos(angles)
    ys = cy + rad * np.sin(angles)
    return np.column_stack([xs, ys])


def gen_concave_regions(n_regions: int) -> tuple[pa.Table, pa.Table]:
    """Concave (star) region set + directed edge table for the even-odd
    crossing-parity SQL oracle."""
    rids, wkbs, xmins, ymins, xmaxs, ymaxs = [], [], [], [], [], []
    e_rid, e_x1, e_y1, e_x2, e_y2 = [], [], [], [], []
    for j in range(n_regions):
        ring = _concave_ring(j)
        rid = f"c{j:06d}"
        rids.append(rid)
        wkbs.append(polygon_wkb(ring))
        xmins.append(ring[:, 0].min())
        ymins.append(ring[:, 1].min())
        xmaxs.append(ring[:, 0].max())
        ymaxs.append(ring[:, 1].max())
        n = len(ring)
        for m in range(n):
            x1, y1 = ring[m]
            x2, y2 = ring[(m + 1) % n]
            e_rid.append(rid)
            e_x1.append(x1)
            e_y1.append(y1)
            e_x2.append(x2)
            e_y2.append(y2)
    regions = pa.table(
        {
            "region_id": pa.array(rids),
            "geometry_wkb": pa.array(wkbs, pa.binary()),
            "xmin": pa.array(xmins, pa.float64()),
            "ymin": pa.array(ymins, pa.float64()),
            "xmax": pa.array(xmaxs, pa.float64()),
            "ymax": pa.array(ymaxs, pa.float64()),
        }
    )
    edges = pa.table(
        {
            "region_id": pa.array(e_rid),
            "x1": pa.array(e_x1, pa.float64()),
            "y1": pa.array(e_y1, pa.float64()),
            "x2": pa.array(e_x2, pa.float64()),
            "y2": pa.array(e_y2, pa.float64()),
        }
    )
    return regions, edges


def gen_regions(n_regions: int) -> tuple[pa.Table, pa.Table]:
    rids, wkbs, cats, xmins, ymins, xmaxs, ymaxs, vfrom, vto = [], [], [], [], [], [], [], [], []
    e_rid, e_x1, e_y1, e_x2, e_y2 = [], [], [], [], []
    month_us = 31 * 24 * 3600 * 1_000_000
    t0 = 1704067200 * 1_000_000
    for j in range(n_regions):
        ring = _region_ring(j)
        rid = f"r{j:06d}"
        rids.append(rid)
        wkbs.append(polygon_wkb(ring))
        cats.append(f"cat{j % 8}")
        xmins.append(ring[:, 0].min())
        ymins.append(ring[:, 1].min())
        xmaxs.append(ring[:, 0].max())
        ymaxs.append(ring[:, 1].max())
        w = j % 12
        vfrom.append(t0 + w * month_us)
        vto.append(t0 + (w + 1) * month_us)
        n = len(ring)
        for m in range(n):
            x1, y1 = ring[m]
            x2, y2 = ring[(m + 1) % n]
            e_rid.append(rid)
            e_x1.append(x1)
            e_y1.append(y1)
            e_x2.append(x2)
            e_y2.append(y2)
    regions = pa.table(
        {
            "region_id": pa.array(rids),
            "geometry_wkb": pa.array(wkbs, pa.binary()),
            "category": pa.array(cats),
            "xmin": pa.array(xmins, pa.float64()),
            "ymin": pa.array(ymins, pa.float64()),
            "xmax": pa.array(xmaxs, pa.float64()),
            "ymax": pa.array(ymaxs, pa.float64()),
            "valid_from": pa.array(vfrom, pa.timestamp("us")),
            "valid_to": pa.array(vto, pa.timestamp("us")),
        }
    )
    edges = pa.table(
        {
            "region_id": pa.array(e_rid),
            "x1": pa.array(e_x1, pa.float64()),
            "y1": pa.array(e_y1, pa.float64()),
            "x2": pa.array(e_x2, pa.float64()),
            "y2": pa.array(e_y2, pa.float64()),
        }
    )
    return regions, edges


# ---------------------------------------------------------------------------
# query shapes + knn probes
# ---------------------------------------------------------------------------


def gen_queries() -> pa.Table:
    qid, kind, xmin, ymin, xmax, ymax, wkbs, ts, te = [], [], [], [], [], [], [], [], []
    t0 = 1704067200 * 1_000_000
    for q in range(20):
        size = 0.5 + (q % 10) * 3.0
        if q < 2:  # near-antimeridian edge cases
            cx = 179.5 if q == 0 else -179.5
            cy = _u(f"qcy{q}", -60.0, 60.0)
        elif q < 4:  # hot clusters
            cx, cy = CLUSTER_CENTERS[q - 2]
        else:
            cx = _u(f"qcx{q}", -150.0, 150.0)
            cy = _u(f"qcy{q}", -70.0, 70.0)
        x0, x1 = max(-180.0, cx - size / 2), min(180.0, cx + size / 2)
        y0, y1 = max(-90.0, cy - size / 2), min(90.0, cy + size / 2)
        qid.append(f"q{q:03d}")
        kind.append("bbox")
        xmin.append(x0)
        ymin.append(y0)
        xmax.append(x1)
        ymax.append(y1)
        wkbs.append(None)
        has_t = q % 3 == 0
        ts.append(t0 + q * 10 * 86400 * 1_000_000 if has_t else None)
        te.append(t0 + (q * 10 + 120) * 86400 * 1_000_000 if has_t else None)
    for q in range(20):
        size = 0.5 + (q % 10) * 3.0
        if q < 2:
            cx, cy = CLUSTER_CENTERS[q + 2]
        else:
            cx = _u(f"qpx{q}", -150.0, 150.0)
            cy = _u(f"qpy{q}", -70.0, 70.0)
        k = 5 + q % 4
        angles = sorted(_u(f"qpang{q}.{m}", 0.0, 2 * np.pi) for m in range(k))
        ring = np.column_stack(
            [cx + size / 2 * np.cos(angles), cy + size / 2 * np.sin(angles)]
        )
        qid.append(f"p{q:03d}")
        kind.append("polygon")
        xmin.append(ring[:, 0].min())
        ymin.append(ring[:, 1].min())
        xmax.append(ring[:, 0].max())
        ymax.append(ring[:, 1].max())
        wkbs.append(polygon_wkb(ring))
        ts.append(None)
        te.append(None)
    return pa.table(
        {
            "query_id": pa.array(qid),
            "kind": pa.array(kind),
            "xmin": pa.array(xmin, pa.float64()),
            "ymin": pa.array(ymin, pa.float64()),
            "xmax": pa.array(xmax, pa.float64()),
            "ymax": pa.array(ymax, pa.float64()),
            "geometry_wkb": pa.array(wkbs, pa.binary()),
            "t_start": pa.array(ts, pa.timestamp("us")),
            "t_end": pa.array(te, pa.timestamp("us")),
        }
    )


def queries_to_edges(queries: pa.Table) -> pa.Table:
    """Explode polygon query shapes to directed CCW edges (SQL oracle)."""
    from .geom import parse_wkb_polygon

    qid, x1, y1, x2, y2 = [], [], [], [], []
    for i in range(queries.num_rows):
        if queries["kind"][i].as_py() != "polygon":
            continue
        ring = parse_wkb_polygon(queries["geometry_wkb"][i].as_py())[:-1]
        n = len(ring)
        for m in range(n):
            qid.append(queries["query_id"][i].as_py())
            x1.append(ring[m][0])
            y1.append(ring[m][1])
            x2.append(ring[(m + 1) % n][0])
            y2.append(ring[(m + 1) % n][1])
    return pa.table(
        {
            "query_id": pa.array(qid),
            "x1": pa.array(x1, pa.float64()),
            "y1": pa.array(y1, pa.float64()),
            "x2": pa.array(x2, pa.float64()),
            "y2": pa.array(y2, pa.float64()),
        }
    )


def gen_knn_queries(n: int = 200) -> pa.Table:
    qids, lons, lats, ks = [], [], [], []
    for q in range(n):
        if q < 50:
            cx, cy = CLUSTER_CENTERS[q % 4]
            lon = cx + _u(f"knnlon{q}", -0.05, 0.05)
            lat = cy + _u(f"knnlat{q}", -0.05, 0.05)
        else:
            lon = _u(f"knnlon{q}", -180.0, 180.0)
            lat = _u(f"knnlat{q}", -90.0, 90.0)
        qids.append(f"k{q:04d}")
        lons.append(lon)
        lats.append(lat)
        ks.append([1, 5, 20][q % 3])
    return pa.table(
        {
            "query_id": pa.array(qids),
            "lon": pa.array(lons, pa.float64()),
            "lat": pa.array(lats, pa.float64()),
            "k": pa.array(ks, pa.int32()),
        }
    )


# ---------------------------------------------------------------------------
# raster chunks
# ---------------------------------------------------------------------------


def gen_raster_chunks(n_chunks: int) -> pa.Table:
    cid, xmins, ymins, xmaxs, ymaxs, w, h, pix = [], [], [], [], [], [], [], []
    for i in range(n_chunks):
        if i % 2 == 1:  # overlap pair: shift previous box by half its width
            base = i - 1
            bw = 1.0 + (base % 4)
            cx = _u(f"chunkx{base}", -170.0, 166.0) + bw / 2
            cy = _u(f"chunky{base}", -80.0, 76.0)
        else:
            bw = 1.0 + (i % 4)
            cx = _u(f"chunkx{i}", -170.0, 166.0)
            cy = _u(f"chunky{i}", -80.0, 76.0)
        cid.append(f"c{i:05d}")
        xmins.append(cx)
        ymins.append(cy)
        xmaxs.append(cx + bw)
        ymaxs.append(cy + bw)
        w.append(64)
        h.append(64)
        p = (np.int64(i) + np.arange(64 * 64, dtype=np.int64)) % 97
        pix.append(p.astype(np.float64))
    return pa.table(
        {
            "chunk_id": pa.array(cid),
            "xmin": pa.array(xmins, pa.float64()),
            "ymin": pa.array(ymins, pa.float64()),
            "xmax": pa.array(xmaxs, pa.float64()),
            "ymax": pa.array(ymaxs, pa.float64()),
            "width": pa.array(w, pa.int32()),
            "height": pa.array(h, pa.int32()),
            "pixels": pa.array(pix, pa.list_(pa.float64())),
        }
    )


def gen_holed_regions(n_regions: int) -> tuple[pa.Table, pa.Table]:
    """Polygon-with-hole regions: convex outer ring + concentric inner
    hole ring. The edge table carries BOTH rings so the even-odd
    crossing-parity SQL oracle is exact for holes too."""
    rids, xmins, ymins, xmaxs, ymaxs = [], [], [], [], []
    ring_id, e_rid, e_x1, e_y1, e_x2, e_y2 = [], [], [], [], [], []
    verts_out, verts_in = [], []
    for j in range(n_regions):
        k = 6 + j % 3
        r_out = 0.5 + (j % 8) * 0.4
        r_in = r_out * (0.3 + 0.08 * (j % 4))
        cx = _u(f"holx{j}", -160.0, 160.0)
        cy = _u(f"holy{j}", -75.0, 75.0)
        ang0 = _u(f"holang{j}", 0.0, 2 * np.pi)
        angles = ang0 + np.arange(k) * (2 * np.pi / k)
        outer = np.column_stack(
            [cx + r_out * np.cos(angles), cy + r_out * np.sin(angles)]
        )
        hole = np.column_stack(
            [cx + r_in * np.cos(angles), cy + r_in * np.sin(angles)]
        )
        rid = f"h{j:06d}"
        rids.append(rid)
        xmins.append(outer[:, 0].min())
        ymins.append(outer[:, 1].min())
        xmaxs.append(outer[:, 0].max())
        ymaxs.append(outer[:, 1].max())
        verts_out.append(outer.ravel())
        verts_in.append(hole.ravel())
        for ring_no, ring in ((0, outer), (1, hole)):
            n = len(ring)
            for m in range(n):
                e_rid.append(rid)
                ring_id.append(ring_no)
                e_x1.append(ring[m][0])
                e_y1.append(ring[m][1])
                e_x2.append(ring[(m + 1) % n][0])
                e_y2.append(ring[(m + 1) % n][1])
    regions = pa.table(
        {
            "region_id": pa.array(rids),
            "outer_xy": pa.array(verts_out, pa.list_(pa.float64())),
            "hole_xy": pa.array(verts_in, pa.list_(pa.float64())),
            "xmin": pa.array(xmins, pa.float64()),
            "ymin": pa.array(ymins, pa.float64()),
            "xmax": pa.array(xmaxs, pa.float64()),
            "ymax": pa.array(ymaxs, pa.float64()),
        }
    )
    edges = pa.table(
        {
            "region_id": pa.array(e_rid),
            "ring": pa.array(ring_id, pa.int32()),
            "x1": pa.array(e_x1, pa.float64()),
            "y1": pa.array(e_y1, pa.float64()),
            "x2": pa.array(e_x2, pa.float64()),
            "y2": pa.array(e_y2, pa.float64()),
        }
    )
    return regions, edges


def gen_tracks(n_tracks: int) -> tuple[pa.Table, pa.Table]:
    """Polyline (LineString) tracks: deterministic random walks of 7
    segments. Returns (tracks with vertex lists + bbox, flat segment
    table for the SQL segment-crossing oracle)."""
    tids, xs_l, ys_l, xmins, ymins, xmaxs, ymaxs = [], [], [], [], [], [], []
    s_tid, s_x1, s_y1, s_x2, s_y2 = [], [], [], [], []
    for j in range(n_tracks):
        n_seg = 7
        x = _u(f"trkx{j}", -165.0, 165.0)
        y = _u(f"trky{j}", -78.0, 78.0)
        xs = [x]
        ys = [y]
        for m in range(n_seg):
            x = x + _u(f"trkdx{j}.{m}", -1.5, 1.5)
            y = y + _u(f"trkdy{j}.{m}", -1.5, 1.5)
            xs.append(x)
            ys.append(y)
        xs = np.asarray(xs)
        ys = np.asarray(ys)
        tid = f"t{j:06d}"
        tids.append(tid)
        xs_l.append(xs)
        ys_l.append(ys)
        xmins.append(xs.min())
        ymins.append(ys.min())
        xmaxs.append(xs.max())
        ymaxs.append(ys.max())
        for m in range(n_seg):
            s_tid.append(tid)
            s_x1.append(xs[m])
            s_y1.append(ys[m])
            s_x2.append(xs[m + 1])
            s_y2.append(ys[m + 1])
    tracks = pa.table(
        {
            "track_id": pa.array(tids),
            "xs": pa.array(xs_l, pa.list_(pa.float64())),
            "ys": pa.array(ys_l, pa.list_(pa.float64())),
            "xmin": pa.array(xmins, pa.float64()),
            "ymin": pa.array(ymins, pa.float64()),
            "xmax": pa.array(xmaxs, pa.float64()),
            "ymax": pa.array(ymaxs, pa.float64()),
        }
    )
    segments = pa.table(
        {
            "track_id": pa.array(s_tid),
            "x1": pa.array(s_x1, pa.float64()),
            "y1": pa.array(s_y1, pa.float64()),
            "x2": pa.array(s_x2, pa.float64()),
            "y2": pa.array(s_y2, pa.float64()),
        }
    )
    return tracks, segments


def gen_grid_rects(n: int) -> pa.Table:
    """Axis-aligned rectangles on an exact 0.5-degree lattice, two
    sides ``a`` and ``b``, for the boundary-exact DE-9IM predicate
    joins (the GeomEquals / GeomTouches / GeomDisjoint / GeomCovers
    UDF roles — ``analytics/spark/sparksql/udf/GeomFunction.java:17-35``).

    ``b[j]`` is derived from ``a[j]`` by ``mode = j % 6``:
    0 equals, 1 edge-touch (shares the right edge), 2 corner-touch,
    3 overlap, 4 strictly-inside, 5 far-disjoint.  All coordinates are
    integer-or-half lattice units × 0.5°, i.e. exact binary doubles,
    so shared edges/corners compare float-exact in both the engine and
    the DuckDB bbox oracle.
    """
    sides, rids, wkbs, xmins, ymins, xmaxs, ymaxs = [], [], [], [], [], [], []

    def emit(side: str, j: int, x0: float, y0: float, x1: float, y1: float):
        lon0, lat0 = x0 * 0.5 - 60.0, y0 * 0.5 - 40.0
        lon1, lat1 = x1 * 0.5 - 60.0, y1 * 0.5 - 40.0
        ring = np.array(
            [[lon0, lat0], [lon1, lat0], [lon1, lat1], [lon0, lat1]],
            dtype=np.float64,
        )
        sides.append(side)
        rids.append(f"{side}{j:05d}")
        wkbs.append(polygon_wkb(ring))
        xmins.append(lon0)
        ymins.append(lat0)
        xmaxs.append(lon1)
        ymaxs.append(lat1)

    for j in range(n):
        gx, gy = j % 16, (j // 16) % 16
        w = 2.0 + (j % 2)
        h = 2.0
        x0, y0 = 4.0 * gx, 4.0 * gy
        x1, y1 = x0 + w, y0 + h
        emit("a", j, x0, y0, x1, y1)
        mode = j % 6
        if mode == 0:
            emit("b", j, x0, y0, x1, y1)
        elif mode == 1:
            emit("b", j, x1, y0, x1 + w, y1)
        elif mode == 2:
            emit("b", j, x1, y1, x1 + w, y1 + h)
        elif mode == 3:
            emit("b", j, x0 + 1.0, y0 + 1.0, x1 + 1.0, y1 + 1.0)
        elif mode == 4:
            emit("b", j, x0 + 0.5, y0 + 0.5, x0 + 1.5, y0 + 1.5)
        else:
            emit("b", j, x0 + 100.0, y0, x1 + 100.0, y1)

    return pa.table(
        {
            "side": pa.array(sides),
            "rect_id": pa.array(rids),
            "geometry_wkb": pa.array(wkbs, pa.binary()),
            "xmin": pa.array(xmins, pa.float64()),
            "ymin": pa.array(ymins, pa.float64()),
            "xmax": pa.array(xmaxs, pa.float64()),
            "ymax": pa.array(ymaxs, pa.float64()),
        }
    )


def gen_para_docs(n_docs: int) -> pa.Table:
    """Multi-paragraph documents for paragraph-level dedup (the CCNet
    paragraph-hash dedup fixture).  Mix of: unique paragraphs,
    boilerplate paragraphs shared across MANY docs (cookie banner,
    newsletter plea), pairwise-shared paragraphs, empty lines, and a
    handful of all-boilerplate docs.  Texts are deterministic; the
    oracle recomputes keep-first-occurrence dedup from the raw text in
    SQL, so there is no truth column to leak engine logic into."""
    boiler = [
        "accept all cookies to continue reading this site",
        "subscribe to our newsletter for weekly updates",
        "copyright 2024 example media all rights reserved",
        "share this article on your favorite social network",
    ]
    words = [
        "river", "stone", "market", "signal", "harbor", "lantern",
        "meadow", "copper", "saddle", "winter", "orchard", "beacon",
    ]
    ids, texts = [], []
    for d in range(n_docs):
        paras = []
        # leading boilerplate on ~2/3 of docs
        if d % 3 != 2:
            paras.append(boiler[d % len(boiler)])
        n_body = 2 + (d * 7) % 4
        for p in range(n_body):
            if d % 11 == 5 and p == 1 and d >= 11:
                # pairwise share: repeat a body paragraph of doc d-11
                src = d - 11
                paras.append(
                    " ".join(
                        words[(src * 5 + p * 3 + k) % len(words)]
                        for k in range(9)
                    )
                    + f" body {src} {p}"
                )
            else:
                paras.append(
                    " ".join(
                        words[(d * 5 + p * 3 + k) % len(words)]
                        for k in range(9)
                    )
                    + f" body {d} {p}"
                )
        if d % 5 == 1:
            paras.insert(1 + d % 2, "")  # blank line survives dedup
        if d % 7 == 3:
            paras.append(boiler[(d + 1) % len(boiler)])
        if d % 23 == 9:
            paras = [boiler[d % len(boiler)], boiler[(d + 2) % len(boiler)]]
        ids.append(d)
        texts.append("\n".join(paras))
    return pa.table(
        {
            "doc_id": pa.array(np.asarray(ids, dtype=np.int64), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )


def gen_messy_urls(n_clusters: int) -> pa.Table:
    """Messy URL fixture for canonicalization + canonical dedup:
    each cluster is ONE canonical URL rendered through several messy
    variants (scheme/host case, default port, tracking params,
    shuffled param order, fragments, trailing slashes).  The truth
    column ``canon_truth`` is COMPOSED from the clean components the
    generator already holds — it never runs the engine's parser, so
    engine and oracle are independent."""
    hosts = ["Example.COM", "news.site.org", "Blog.Example.net", "data.archive.io"]
    schemes = ["http", "https"]
    tracking = [
        "utm_source=feed", "utm_medium=mail", "fbclid=abc123", "gclid=9z",
        "ref=home", "mc_cid=77", "msclkid=q1", "utm_campaign=x",
    ]
    real_pools = [[], ["id=3"], ["q=hello", "page=2"], ["sort=asc", "id=12", "v=2"]]
    uids, urls, canons = [], [], []
    uid = 0
    for c in range(n_clusters):
        scheme = schemes[c % 2]
        host = hosts[c % len(hosts)]
        port = "8080" if c % 11 == 6 else ""
        seg = f"/p{c}" + ("/sub" if c % 3 == 0 else "")
        path = "" if c % 7 == 5 else seg
        real = real_pools[c % len(real_pools)]
        canon = (
            f"{scheme}://{host.lower()}"
            + (f":{port}" if port else "")
            + (path if path else "/")
            + (("?" + "&".join(sorted(real))) if real else "")
        )
        n_var = 2 + c % 3
        for v in range(n_var):
            s = scheme.upper() if v % 2 else scheme
            h = host if v % 2 == 0 else host.lower()
            p = port or ("80" if scheme == "http" else "443")
            pp = f":{p}" if (v % 3 == 0 or port) else ""
            params = list(real)
            if v % 2:
                params = params[::-1]
            params = params + [tracking[(c + v) % len(tracking)]]
            if v % 3 == 2:
                params.insert(0, tracking[(c + v + 3) % len(tracking)])
            qs = "?" + "&".join(params) if params else ""
            frag = f"#sec{v}" if v % 2 else ""
            trail = "/" if (v % 3 == 1 and path) else ""
            pad = "  " if v % 5 == 4 else ""
            uids.append(uid)
            urls.append(f"{pad}{s}://{h}{pp}{path}{trail}{qs}{frag}{pad}")
            canons.append(canon)
            uid += 1
        if c % 13 == 4:  # non-URL garbage passes through trimmed
            uids.append(uid)
            urls.append(f"  not a url {c}  ")
            canons.append(f"not a url {c}")
            uid += 1
    return pa.table(
        {
            "uid": pa.array(np.asarray(uids, dtype=np.int64), pa.int64()),
            "url": pa.array(urls, pa.string()),
            "canon_truth": pa.array(canons, pa.string()),
        }
    )


def gen_gpx_files(n_files: int) -> tuple[pa.Table, pa.Table]:
    """GPX XML documents + flat ground-truth points (the
    format-plugin parse fixture, ``extensions/formats/gpx/`` role).

    Coordinates are written with ``%.6f`` and the truth table stores
    ``float(printed_text)``, so the parser's ``float()`` of the same
    text is bit-identical by construction.
    """
    f_id, f_xml = [], []
    g_tid, g_seq, g_lon, g_lat, g_ele, g_ts = [], [], [], [], [], []
    t0 = np.datetime64("2024-03-01T00:00:00", "s")
    for j in range(n_files):
        tid = f"trk{j:05d}"
        lon0 = float(((j * 37) % 340) - 170) + 0.5
        lat0 = float(((j * 17) % 160) - 80) + 0.5
        pts = []
        for i in range(20):
            lon_s = f"{lon0 + 0.001 * i + 0.000017 * ((i * (j + 1)) % 13):.6f}"
            lat_s = f"{lat0 + 0.0007 * i + 0.000011 * ((i * (j + 3)) % 7):.6f}"
            ele_s = f"{(100 + ((7 * i + 3 * j) % 50)) / 2.0:.1f}"
            ts = t0 + np.timedelta64(j * 3600 + i * 15, "s")
            ts_s = np.datetime_as_string(ts, unit="s") + "Z"
            pts.append(
                f'<trkpt lat="{lat_s}" lon="{lon_s}">'
                f"<ele>{ele_s}</ele><time>{ts_s}</time></trkpt>"
            )
            g_tid.append(tid)
            g_seq.append(i)
            g_lon.append(float(lon_s))
            g_lat.append(float(lat_s))
            g_ele.append(float(ele_s))
            g_ts.append(ts.astype("datetime64[us]"))
        f_id.append(f"file{j:05d}.gpx")
        f_xml.append(
            '<gpx version="1.1"><trk><name>' + tid + "</name><trkseg>"
            + "".join(pts)
            + "</trkseg></trk></gpx>"
        )
    files = pa.table({"file_id": pa.array(f_id), "xml": pa.array(f_xml)})
    points = pa.table(
        {
            "track_id": pa.array(g_tid, pa.string()),
            "seq": pa.array(np.asarray(g_seq, dtype=np.int64), pa.int64()),
            "lon": pa.array(np.asarray(g_lon, dtype=np.float64), pa.float64()),
            "lat": pa.array(np.asarray(g_lat, dtype=np.float64), pa.float64()),
            "ele": pa.array(np.asarray(g_ele, dtype=np.float64), pa.float64()),
            "ts": pa.array(
                np.asarray(g_ts, dtype="datetime64[us]"), pa.timestamp("us")
            ),
        }
    )
    return files, points


def gen_shapefiles(n_files: int) -> tuple[pa.Table, pa.Table]:
    """Synthetic ESRI shapefiles (shp+dbf bytes built by the module's
    own spec writer) + a flat ground-truth table — the
    geotools-vector ingest-plugin fixture (VERDICT r3 #7). Each file
    carries one record of every supported shape plus a Null shape and
    a DBF-deleted row (excluded from the truth). Truth stores the
    FIRST parsed vertex and total vertex count, which round-trip
    bit-identically through the IEEE-double wire format."""
    from .sources.shapefile import write_dbf, write_shp

    f_id, f_shp, f_dbf = [], [], []
    t_fid, t_rec, t_type, t_np, t_x0, t_y0 = [], [], [], [], [], []
    t_name, t_val, t_score = [], [], []
    fields = [
        ("name", "C", 12, 0), ("val", "N", 8, 0), ("score", "N", 10, 3),
    ]
    for j in range(n_files):
        ox = float(((j * 53) % 300) - 150) + 0.125
        oy = float(((j * 29) % 140) - 70) + 0.25
        sq = np.array(
            [[ox, oy], [ox + 4, oy], [ox + 4, oy + 4], [ox, oy + 4], [ox, oy]]
        )
        hole = np.array(
            [[ox + 1, oy + 1], [ox + 2, oy + 1], [ox + 2, oy + 2],
             [ox + 1, oy + 2], [ox + 1, oy + 1]]
        )
        far = np.array(
            [[ox + 10, oy + 10], [ox + 12, oy + 10], [ox + 12, oy + 12],
             [ox + 10, oy + 12], [ox + 10, oy + 10]]
        )
        inner = np.array(
            [[ox + 10.5, oy + 10.5], [ox + 11, oy + 10.5],
             [ox + 11, oy + 11], [ox + 10.5, oy + 11],
             [ox + 10.5, oy + 10.5]]
        )
        geoms = [
            ("Point", np.array([ox + 0.5, oy - 0.5])),
            ("LineString", np.array([[ox, oy], [ox + 1, oy + 1],
                                     [ox + 2, oy + 0.5]])),
            ("Polygon", [sq, hole]),
            ("MultiPoint", np.array([[ox + 5, oy + 5], [ox + 6, oy + 7],
                                     [ox + 8, oy + 2]])),
            None,
            ("MultiPolygon", [[sq.copy()], [far, inner]]),
            ("Point", np.array([ox - 3.0, oy - 3.0])),  # deleted row
        ]
        rows = [
            {"name": f"rec{j}_{i}", "val": (j * 7 + i) % 1000 - 50,
             "score": float(f"{(j * 13 + i * 5) % 97 / 8.0:.3f}")}
            for i in range(len(geoms))
        ]
        shp = write_shp(geoms)
        dbf = write_dbf(rows, fields, deleted=(6,))
        f_id.append(f"file{j:05d}")
        f_shp.append(shp)
        f_dbf.append(dbf)
        counts = {0: 1, 1: 3, 2: 10, 3: 3, 4: 0, 5: 15}
        firsts = {
            0: geoms[0][1], 1: geoms[1][1][0], 2: sq[0],
            3: geoms[3][1][0], 4: (None, None), 5: sq[0],
        }
        types = ["Point", "LineString", "Polygon", "MultiPoint", "Null",
                 "MultiPolygon"]
        for i in range(6):  # record 7 (deleted) excluded
            t_fid.append(f"file{j:05d}")
            t_rec.append(i + 1)
            t_type.append(types[i])
            t_np.append(counts[i])
            fx_, fy_ = firsts[i]
            t_x0.append(None if fx_ is None else float(fx_))
            t_y0.append(None if fy_ is None else float(fy_))
            t_name.append(rows[i]["name"])
            t_val.append(rows[i]["val"])
            t_score.append(rows[i]["score"])
    files = pa.table(
        {
            "file_id": pa.array(f_id, pa.string()),
            "shp": pa.array(f_shp, pa.binary()),
            "dbf": pa.array(f_dbf, pa.binary()),
        }
    )
    truth = pa.table(
        {
            "file_id": pa.array(t_fid, pa.string()),
            "rec_no": pa.array(t_rec, pa.int64()),
            "shape_type": pa.array(t_type, pa.string()),
            "n_points": pa.array(t_np, pa.int64()),
            "x0": pa.array(t_x0, pa.float64()),
            "y0": pa.array(t_y0, pa.float64()),
            "name": pa.array(t_name, pa.string()),
            "val": pa.array(t_val, pa.int64()),
            "score": pa.array(t_score, pa.float64()),
        }
    )
    return files, truth


def gen_images(n_images: int) -> pa.Table:
    """PNG image fixtures for the multimodal decode stage: pixels are
    the closed form ``(7*img_id + idx) % 251`` over the row-major
    (h, w, c) sample index, so a SQL oracle reproduces per-image pixel
    sums analytically via generate_series — a green oracle proves the
    DECODER (sources/png.py), not just the plumbing. Colour types
    cycle grey/RGB/RGBA and the encoder cycles all five spec filters
    per row."""
    from .sources.png import encode

    ids, urls, blobs, ws, hs, cs = [], [], [], [], [], []
    for i in range(n_images):
        w = 24 + 8 * (i % 3)
        h = 16 + 8 * (i % 2)
        c = [1, 3, 4][i % 3]
        n = h * w * c
        px = ((7 * np.int64(i) + np.arange(n, dtype=np.int64)) % 251).astype(
            np.uint8
        )
        img = px.reshape(h, w, c)
        blobs.append(encode(img, filter_type="cycle"))
        ids.append(i)
        urls.append(f"img://{i:06d}.png")
        ws.append(w)
        hs.append(h)
        cs.append(c)
    return pa.table(
        {
            "img_id": pa.array(ids, pa.int64()),
            "url": pa.array(urls, pa.string()),
            "png": pa.array(blobs, pa.binary()),
            "width": pa.array(ws, pa.int64()),
            "height": pa.array(hs, pa.int64()),
            "channels": pa.array(cs, pa.int64()),
        }
    )


def gen_web_images(n_images: int) -> pa.Table:
    """Mixed-container web-image fixtures (GIF plain/interlaced,
    BMP 8-bit bottom-up, BMP 24-bit top-down) for the format-sniffing
    multimodal decode stage. Pixels are closed-form so a SQL oracle
    reproduces decoded sums analytically: palette formats carry
    indices ``(5*img_id + k) % 256`` through the palette
    ``[j, (2j)%256, (5j)%256]``; the 24-bit BMP carries samples
    ``(7*img_id + k) % 253`` over the row-major (h, w, rgb) index.
    A green oracle proves the DECODERS (sources/gif.py LZW +
    interlace, sources/bmp.py padding + BGR/row order), not just the
    plumbing."""
    from .sources.bmp import encode as bmp_encode
    from .sources.gif import encode as gif_encode

    pal = np.zeros((256, 3), dtype=np.uint8)
    j = np.arange(256, dtype=np.int64)
    pal[:, 0] = j
    pal[:, 1] = (2 * j) % 256
    pal[:, 2] = (5 * j) % 256
    fmts = ["gif", "gif_i", "bmp8", "bmp24"]
    ids, urls, blobs, fs, ws, hs = [], [], [], [], [], []
    for i in range(n_images):
        w = 20 + 4 * (i % 5)
        h = 12 + 4 * (i % 3)
        fmt = fmts[i % 4]
        if fmt == "bmp24":
            n = h * w * 3
            px = ((7 * np.int64(i) + np.arange(n, dtype=np.int64)) % 253)
            blob = bmp_encode(px.astype(np.uint8).reshape(h, w, 3),
                              top_down=bool(i % 2))
        else:
            n = h * w
            idx = ((5 * np.int64(i) + np.arange(n, dtype=np.int64)) % 256)
            idx = idx.astype(np.uint8).reshape(h, w)
            if fmt == "bmp8":
                blob = bmp_encode(idx, palette=pal)
            else:
                blob = gif_encode(idx, pal, interlace=(fmt == "gif_i"),
                                  transparent=(3 if i % 5 == 0 else None))
        ids.append(i)
        urls.append(f"img://{i:06d}.{fmt.split('_')[0]}")
        blobs.append(blob)
        fs.append(fmt)
        ws.append(w)
        hs.append(h)
    return pa.table(
        {
            "img_id": pa.array(ids, pa.int64()),
            "url": pa.array(urls, pa.string()),
            "fmt": pa.array(fs, pa.string()),
            "payload": pa.array(blobs, pa.binary()),
            "width": pa.array(ws, pa.int64()),
            "height": pa.array(hs, pa.int64()),
        }
    )


def gen_jpeg_images(n_images: int) -> pa.Table:
    """Baseline-JPEG fixtures for the multimodal decode stage:
    grayscale / YCbCr 4:2:0 / 4:4:4, each built from FLAT 8x8 blocks
    whose values are the closed form ``(3*img_id + b) % 256`` over the
    raster block index ``b`` (colour images use neutral chroma, i.e.
    R=G=B=Y). With the encoder's DC quantizer of 8, flat blocks
    survive DCT -> quantize -> IDCT bit-exactly, so a SQL oracle
    reproduces decoded pixel sums/extremes analytically — a green
    oracle proves the FULL entropy-decode + dequant + IDCT + colour
    pipeline (sources/jpeg.py), not just the plumbing."""
    from .sources.jpeg import encode as jpeg_encode

    fmts = ["jpeg_gray", "jpeg_420", "jpeg_444"]
    ids, urls, blobs, fs, ws, hs = [], [], [], [], [], []
    for i in range(n_images):
        w = 32 + 16 * (i % 3)
        h = 16 + 16 * (i % 2)
        fmt = fmts[i % 3]
        nb = (h // 8) * (w // 8)
        v = ((3 * np.int64(i) + np.arange(nb, dtype=np.int64)) % 256)
        plane = v.astype(np.uint8).reshape(h // 8, w // 8)
        plane = plane.repeat(8, axis=0).repeat(8, axis=1)
        if fmt == "jpeg_gray":
            blob = jpeg_encode(plane)
        else:
            rgb = np.stack([plane, plane, plane], axis=2)
            blob = jpeg_encode(
                rgb, subsampling="4:2:0" if fmt == "jpeg_420" else "4:4:4"
            )
        ids.append(i)
        urls.append(f"img://{i:06d}.jpg")
        blobs.append(blob)
        fs.append(fmt)
        ws.append(w)
        hs.append(h)
    return pa.table(
        {
            "img_id": pa.array(ids, pa.int64()),
            "url": pa.array(urls, pa.string()),
            "fmt": pa.array(fs, pa.string()),
            "payload": pa.array(blobs, pa.binary()),
            "width": pa.array(ws, pa.int64()),
            "height": pa.array(hs, pa.int64()),
        }
    )


def gen_videos(n_videos: int) -> pa.Table:
    """AVI/MJPEG clip fixtures for the frame-sampling stage: greyscale
    frames made of FLAT 8x8 blocks with values
    ``(3*vid_id + 5*frame + b) % 256`` over the raster block index —
    bit-exact through the JPEG pipeline (DC quantizer 8), so a SQL
    oracle reproduces every sampled frame's pixel sum/extremes
    analytically via a two-level series (frames x blocks)."""
    from .sources.avi import encode as avi_encode

    ids, urls, blobs, ws, hs, nfs = [], [], [], [], [], []
    for i in range(n_videos):
        w = 32 + 16 * (i % 2)
        h = 16 + 8 * (i % 3)
        nf = 3 + (i % 4)
        frames = []
        nb = (h // 8) * (w // 8)
        for f in range(nf):
            v = ((3 * np.int64(i) + 5 * np.int64(f)
                  + np.arange(nb, dtype=np.int64)) % 256)
            plane = v.astype(np.uint8).reshape(h // 8, w // 8)
            frames.append(plane.repeat(8, axis=0).repeat(8, axis=1))
        blobs.append(avi_encode(frames, fps=5))
        ids.append(i)
        urls.append(f"vid://{i:06d}.avi")
        ws.append(w)
        hs.append(h)
        nfs.append(nf)
    return pa.table(
        {
            "vid_id": pa.array(ids, pa.int64()),
            "url": pa.array(urls, pa.string()),
            "payload": pa.array(blobs, pa.binary()),
            "width": pa.array(ws, pa.int64()),
            "height": pa.array(hs, pa.int64()),
            "n_frames": pa.array(nfs, pa.int64()),
        }
    )


def gen_warc_files(n_files: int) -> tuple[pa.Table, pa.Table]:
    """Synthetic WARC files (bytes built by the module's own ISO-28500
    writer; plain and per-record-gzip layouts alternate) + a flat
    ground-truth table. Each file carries a warcinfo and a request
    record (both skipped by the parser, like real crawl pipelines)
    plus 2-4 response records with deterministic HTTP bodies."""
    import datetime as _dt

    from .sources.warc import http_response, write_warc

    f_id, f_warc = [], []
    t_fid, t_rec, t_url, t_ts, t_status, t_nb = [], [], [], [], [], []
    for j in range(n_files):
        fid = f"warc{j:05d}"
        recs = [
            {"type": "warcinfo", "payload": b"software: geowave_ray\r\n"},
            {"type": "request", "uri": f"https://w{j}.example/0",
             "payload": b"GET / HTTP/1.1\r\n\r\n"},
        ]
        n_resp = 2 + (j % 3)
        for r in range(n_resp):
            body = (
                f"<html><body>page {j}-{r} " + "x" * ((j * 7 + r * 13) % 200)
                + "</body></html>"
            ).encode()
            status = 200 if (j + r) % 5 else 301
            sec = (j * 61 + r * 7) % 86_400
            date = (f"2024-03-{1 + j % 28:02d}T{sec // 3600:02d}:"
                    f"{(sec // 60) % 60:02d}:{sec % 60:02d}Z")
            url = f"https://w{j}.example/p/{r}"
            recs.append({
                "type": "response", "uri": url, "date": date,
                "payload": http_response(body, status=status),
                "content_type": "application/http; msgtype=response",
            })
            t_fid.append(fid)
            t_rec.append(r)
            t_url.append(url)
            t_ts.append(_dt.datetime(
                2024, 3, 1 + j % 28, sec // 3600, (sec // 60) % 60,
                sec % 60))
            t_status.append(status)
            t_nb.append(len(body))
        f_id.append(fid)
        f_warc.append(write_warc(recs, gzip_per_record=bool(j % 2)))
    files = pa.table({
        "file_id": pa.array(f_id, pa.string()),
        "warc": pa.array(f_warc, pa.binary()),
    })
    truth = pa.table({
        "file_id": pa.array(t_fid, pa.string()),
        "rec_no": pa.array(t_rec, pa.int64()),
        "url": pa.array(t_url, pa.string()),
        "warc_ts": pa.array(t_ts, pa.timestamp("us")),
        "http_status": pa.array(t_status, pa.int64()),
        "n_bytes": pa.array(t_nb, pa.int64()),
    })
    return files, truth


def gen_html_docs(n_docs: int) -> pa.Table:
    """Rich HTML fixtures for the text-extraction stage: scripts,
    styles, comments, block tags, entities, line breaks — every
    feature the published HTML_EXTRACT_STEPS chain handles. The
    oracle reruns the SAME step table through DuckDB regexp_replace,
    so no closed form is needed; two independent RE2 engines must
    produce byte-identical text."""
    ids, htmls = [], []
    for i in range(n_docs):
        pad = " ".join(f"w{(i * 7 + k) % 97}" for k in range(i % 13))
        html = (
            f"<html><head><title>T{i}</title>"
            f"<style>body {{color: #{i % 10}}}</style>"
            f"<script>var x = {i}; if (x < 10) {{ y(); }}</script></head>\n"
            f"<body><h1>Doc {i}</h1><!-- hidden {i} -->"
            f"<p>Paragraph one of doc {i} with &amp; and &lt;tags&gt;.</p>"
            f"<div>Div text {i}<br>line two&nbsp;spaced {pad}</div>"
            f"<ul><li>item a {i}</li><li>item b</li></ul>"
            f"<blockquote>quote &quot;q{i}&quot; it&#39;s</blockquote>"
            f"</body></html>"
        )
        ids.append(i)
        htmls.append(html.encode("utf-8"))
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "html": pa.array(htmls, pa.binary()),
        }
    )


def gen_audio(n_clips: int) -> pa.Table:
    """WAV PCM clip fixtures for the multimodal audio decode: samples
    are closed-form in the clip id and frame index, so a SQL oracle
    reproduces decoded sums/extremes analytically. Widths cycle
    8/16/24-bit, channels cycle mono/stereo."""
    from .sources.wav import encode

    ids, urls, blobs, widths, chans, frames = [], [], [], [], [], []
    for i in range(n_clips):
        width = [1, 2, 3][i % 3]
        ch = 1 + (i % 2)
        n = 400 + 100 * (i % 3)
        idx = np.arange(n * ch, dtype=np.int64)
        if width == 1:
            # stored unsigned; decoder re-centres to value-128
            s = ((11 * np.int64(i) + idx) % 256).astype(np.int64)
        else:
            s = (((11 * np.int64(i) + idx) % 20001) - 10000).astype(np.int64)
        blobs.append(encode(s.reshape(n, ch), rate=16000, sample_width=width))
        ids.append(i)
        urls.append(f"audio://{i:06d}.wav")
        widths.append(width)
        chans.append(ch)
        frames.append(n)
    return pa.table(
        {
            "clip_id": pa.array(ids, pa.int64()),
            "url": pa.array(urls, pa.string()),
            "wav": pa.array(blobs, pa.binary()),
            "width": pa.array(widths, pa.int64()),
            "channels": pa.array(chans, pa.int64()),
            "n_frames": pa.array(frames, pa.int64()),
        }
    )


def gen_avro_files(n_files: int) -> tuple[pa.Table, pa.Table]:
    """Avro object-container fixtures (bytes built by the module's own
    spec codec — ``sources/avro_io.py``; truth computed from the SOURCE
    values, so the oracle checks the reader through real wire bytes).
    Cycles codec (null/deflate), block size, nullable fields and
    array-typed fields."""
    from .sources.avro_io import write_container

    schema = {
        "type": "record",
        "name": "Feature",
        "fields": [
            {"name": "fid", "type": "long"},
            {"name": "name", "type": ["null", "string"]},
            {"name": "lon", "type": "double"},
            {"name": "lat", "type": "double"},
            {"name": "weight", "type": ["null", "double"]},
            {"name": "tags", "type": {"type": "array", "items": "string"}},
        ],
    }
    f_id, f_avro = [], []
    t: dict[str, list] = {k: [] for k in (
        "file_id", "fid", "name", "lon", "lat", "weight", "tags_csv",
    )}
    for j in range(n_files):
        codec = "deflate" if j % 2 else "null"
        n_rec = 3 + j % 20
        recs = []
        for i in range(n_rec):
            name = None if (i + j) % 5 == 0 else f"feat-{j}-{i}"
            lon = _u(f"avx{j}:{i}", -180.0, 180.0)
            lat = _u(f"avy{j}:{i}", -90.0, 90.0)
            weight = None if i % 4 == 2 else round(0.25 * ((i * 7 + j) % 40), 2)
            tags = [f"t{(i + k) % 7}" for k in range(i % 4)]
            recs.append(
                {"fid": j * 1000 + i, "name": name, "lon": lon,
                 "lat": lat, "weight": weight, "tags": tags}
            )
            fid = f"avro{j:05d}"
            t["file_id"].append(fid)
            t["fid"].append(j * 1000 + i)
            t["name"].append(name)
            t["lon"].append(lon)
            t["lat"].append(lat)
            t["weight"].append(weight)
            t["tags_csv"].append(",".join(tags))
        f_id.append(f"avro{j:05d}")
        f_avro.append(
            write_container(recs, schema, codec=codec,
                            rows_per_block=4 if j % 3 else 4096)
        )
    files = pa.table(
        {
            "file_id": pa.array(f_id, pa.string()),
            "avro": pa.array(f_avro, pa.binary()),
        }
    )
    truth = pa.table(
        {
            "file_id": pa.array(t["file_id"], pa.string()),
            "fid": pa.array(t["fid"], pa.int64()),
            "name": pa.array(t["name"], pa.string()),
            "lon": pa.array(t["lon"], pa.float64()),
            "lat": pa.array(t["lat"], pa.float64()),
            "weight": pa.array(t["weight"], pa.float64()),
            "tags_csv": pa.array(t["tags_csv"], pa.string()),
        }
    )
    return files, truth


def gen_geotiffs(n_files: int) -> tuple[pa.Table, pa.Table]:
    """Synthetic GeoTIFFs (bytes built by the module's own spec writer,
    truth computed from the SOURCE arrays — so the oracle checks the
    reader, not the writer, roundtripping through real wire bytes).

    Cycles every axis the reader supports: dtype (u1/u2/i2/i4/f8),
    compression (none/deflate/packbits/lzw), predictor on compressed
    integer files, strip height, band count (1-3), geographic AND
    projected CRS codes, optional nodata. Truth bbox replicates the
    reader's tag arithmetic (xmax = xmin + w * ((xmax-xmin)/w), the
    IEEE round-trip through the ModelPixelScale double)."""
    import numpy as _np

    from .sources.geotiff import write_geotiff

    f_id, f_tif = [], []
    t: dict[str, list] = {k: [] for k in (
        "file_id", "chunk_id", "xmin", "ymin", "xmax", "ymax", "width",
        "height", "bands", "nodata", "epsg", "pixel_sum", "pixel_dot",
    )}
    dtypes = [_np.uint8, _np.uint16, _np.int16, _np.int32, _np.float64]
    comps = ["none", "deflate", "packbits", "lzw"]
    epsgs = [4326, 3857, 32633, 4269]
    for j in range(n_files):
        dt = dtypes[j % 5]
        comp = comps[j % 4]
        bands = 1 + j % 3
        w = 16 + (j % 5) * 8
        h = 12 + (j % 7) * 4
        rps = None if j % 3 == 0 else 4 + j % 9
        pred = comp != "none" and dt not in (_np.float32, _np.float64)
        epsg = epsgs[j % len(epsgs)]
        nodata = -9999.0 if j % 3 == 1 else None
        bw = 0.5 + (j % 6) * 0.7
        xmin = _u(f"tifx{j}", -179.0, 179.0 - bw)
        ymin = _u(f"tify{j}", -89.0, 89.0 - bw)
        idx = _np.arange(bands * h * w, dtype=_np.int64)
        px = ((13 * _np.int64(j) + 5 * (idx // (h * w)) + idx) % 251).astype(dt)
        tif = write_geotiff(
            px.reshape(bands, h, w), (xmin, ymin, xmin + bw, ymin + bw),
            epsg=epsg, nodata=nodata, compression=comp,
            rows_per_strip=rps, predictor=pred,
        )
        fid = f"tif{j:05d}"
        f_id.append(fid)
        f_tif.append(tif)
        flat = px.astype(_np.float64).reshape(-1)
        # replicate the writer's scale arithmetic bit-for-bit:
        # sx = (xmax - xmin) / w with xmax formed as xmin + bw
        sx = ((xmin + bw) - xmin) / w
        sy = ((ymin + bw) - ymin) / h
        t["file_id"].append(fid)
        t["chunk_id"].append(f"{fid}#0")
        t["xmin"].append(xmin)
        t["ymax"].append(ymin + bw)
        t["xmax"].append(xmin + w * sx)
        t["ymin"].append((ymin + bw) - h * sy)
        t["width"].append(w)
        t["height"].append(h)
        t["bands"].append(bands)
        t["nodata"].append(nodata)
        t["epsg"].append(epsg)
        t["pixel_sum"].append(float(_np.sum(flat)))
        t["pixel_dot"].append(float(_np.sum(flat * ((idx % 97) + 1))))
    files = pa.table(
        {
            "file_id": pa.array(f_id, pa.string()),
            "tif": pa.array(f_tif, pa.binary()),
        }
    )
    truth = pa.table(
        {
            "file_id": pa.array(t["file_id"], pa.string()),
            "chunk_id": pa.array(t["chunk_id"], pa.string()),
            "xmin": pa.array(t["xmin"], pa.float64()),
            "ymin": pa.array(t["ymin"], pa.float64()),
            "xmax": pa.array(t["xmax"], pa.float64()),
            "ymax": pa.array(t["ymax"], pa.float64()),
            "width": pa.array(t["width"], pa.int32()),
            "height": pa.array(t["height"], pa.int32()),
            "bands": pa.array(t["bands"], pa.int32()),
            "nodata": pa.array(t["nodata"], pa.float64()),
            "epsg": pa.array(t["epsg"], pa.int32()),
            "pixel_sum": pa.array(t["pixel_sum"], pa.float64()),
            "pixel_dot": pa.array(t["pixel_dot"], pa.float64()),
        }
    )
    return files, truth


def gen_stanag_files(n_files: int) -> tuple[pa.Table, pa.Table]:
    """STANAG 4676 TrackMessage XML documents + flat ground-truth
    points (``extensions/formats/stanag4676/`` role; element names per
    ``NATO4676Decoder.java:266-420``). Two tracks per message; every
    track mixes TrackPoint items with one non-point item
    (TrackIdentityInformation) the parser must skip. Numeric text is
    printed then ``float()``-ed into the truth table, so parse output
    is bit-identical by construction."""
    XSI = "http://www.w3.org/2001/XMLSchema-instance"
    f_id, f_xml = [], []
    g_tn, g_tu, g_pu, g_ts, g_lon, g_lat, g_ele, g_spd, g_crs, g_pt = (
        [] for _ in range(10)
    )
    t0 = np.datetime64("2024-06-01T00:00:00", "s")
    types = ["MEASURED", "ESTIMATED", "PREDICTED"]
    for j in range(n_files):
        tracks_xml = []
        for tr in range(2):
            number = f"TN{j:05d}_{tr}"
            uuid = f"uuid-{j:05d}-{tr}"
            lon0 = float(((j * 53 + tr * 7) % 340) - 170) + 0.25
            lat0 = float(((j * 29 + tr * 11) % 160) - 80) + 0.25
            items = [
                f'<items xmlns:xsi="{XSI}" xsi:type="TrackIdentityInformation">'
                "<identity>FRIEND</identity></items>"
            ]
            for i in range(12):
                lon_s = f"{lon0 + 0.002 * i + 0.000013 * ((i * (j + 2)) % 11):.6f}"
                lat_s = f"{lat0 + 0.0011 * i + 0.000019 * ((i * (j + 5)) % 5):.6f}"
                ele_s = f"{(500 + ((13 * i + 5 * j) % 900)) / 4.0:.2f}"
                spd_s = f"{((3 * i + j) % 70) / 2.0:.1f}"
                crs_s = f"{(i * 31 + j * 7) % 360}.0"
                ts = t0 + np.timedelta64(j * 7200 + tr * 1800 + i * 30, "s")
                ts_s = np.datetime_as_string(ts, unit="s") + "Z"
                ptype = types[(i + j) % 3]
                puid = f"pt-{j:05d}-{tr}-{i:03d}"
                items.append(
                    f'<items xmlns:xsi="{XSI}" xsi:type="TrackPoint">'
                    f"<trackItemUUID>{puid}</trackItemUUID>"
                    f"<trackItemTime>{ts_s}</trackItemTime>"
                    "<trackPointPosition>"
                    f"<latitude>{lat_s}</latitude>"
                    f"<longitude>{lon_s}</longitude>"
                    f"<elevation>{ele_s}</elevation>"
                    "</trackPointPosition>"
                    f"<trackPointSpeed>{spd_s}</trackPointSpeed>"
                    f"<trackPointCourse>{crs_s}</trackPointCourse>"
                    f"<trackPointType>{ptype}</trackPointType>"
                    "</items>"
                )
                g_tn.append(number)
                g_tu.append(uuid)
                g_pu.append(puid)
                g_ts.append(ts.astype("datetime64[us]"))
                g_lon.append(float(lon_s))
                g_lat.append(float(lat_s))
                g_ele.append(float(ele_s))
                g_spd.append(float(spd_s))
                g_crs.append(float(crs_s))
                g_pt.append(ptype)
            tracks_xml.append(
                f"<tracks><trackNumber>{number}</trackNumber>"
                f"<trackUUID>{uuid}</trackUUID>"
                "<status>CURRENT</status>" + "".join(items) + "</tracks>"
            )
        f_id.append(f"msg{j:05d}.xml")
        f_xml.append(
            "<TrackMessage><formatVersion>B</formatVersion>"
            + "".join(tracks_xml)
            + "</TrackMessage>"
        )
    files = pa.table({"file_id": pa.array(f_id), "xml": pa.array(f_xml)})
    points = pa.table(
        {
            "track_number": pa.array(g_tn, pa.string()),
            "track_uuid": pa.array(g_tu, pa.string()),
            "point_uuid": pa.array(g_pu, pa.string()),
            "ts": pa.array(
                np.asarray(g_ts, dtype="datetime64[us]"), pa.timestamp("us")
            ),
            "lon": pa.array(np.asarray(g_lon, np.float64), pa.float64()),
            "lat": pa.array(np.asarray(g_lat, np.float64), pa.float64()),
            "elevation": pa.array(np.asarray(g_ele, np.float64), pa.float64()),
            "speed": pa.array(np.asarray(g_spd, np.float64), pa.float64()),
            "course": pa.array(np.asarray(g_crs, np.float64), pa.float64()),
            "point_type": pa.array(g_pt, pa.string()),
        }
    )
    return files, points


def gen_tdrive_files(n_files: int) -> tuple[pa.Table, pa.Table]:
    """T-Drive CSV files + flat ground truth (format-plugin fixture,
    ``extensions/formats/tdrive/`` role).  Each file holds 24 valid
    ``taxiid,ts,lon,lat`` lines, one wrong-field-count line (must be
    skipped) and one bad-timestamp line (kept, timestamp -> epoch 0
    per ``TdriveIngestPlugin.java:100-105``).  Coordinates print with
    %.5f and the truth stores ``float(printed)`` so the parse is
    bit-identical by construction."""
    f_id, f_txt = [], []
    g_tid, g_pi, g_ts, g_lon, g_lat = [], [], [], [], []
    t0 = np.datetime64("2008-02-02T13:30:00", "s")
    for j in range(n_files):
        taxi = 9000 + j
        lines = []
        pi = 0
        for i in range(26):
            if i == 7:
                lines.append(f"{taxi},broken-line")  # 2 fields: skipped
                continue
            lon_s = f"{116.0 + 0.01 * ((i * (j + 1)) % 40):.5f}"
            lat_s = f"{39.5 + 0.01 * ((i * (j + 3)) % 30):.5f}"
            if i == 13:
                ts_s = "not-a-time"  # kept, ts -> epoch 0
                ts_v = np.datetime64(0, "us")
            else:
                ts = t0 + np.timedelta64(j * 7200 + i * 300, "s")
                ts_s = str(ts).replace("T", " ")
                ts_v = ts.astype("datetime64[us]")
            lines.append(f"{taxi},{ts_s},{lon_s},{lat_s}")
            g_tid.append(float(taxi))
            g_pi.append(pi)
            g_ts.append(ts_v)
            g_lon.append(float(lon_s))
            g_lat.append(float(lat_s))
            pi += 1
        f_id.append(f"{taxi}.txt")
        f_txt.append("\n".join(lines) + "\n")
    files = pa.table({"file_id": pa.array(f_id), "content": pa.array(f_txt)})
    points = pa.table(
        {
            "taxiid": pa.array(np.asarray(g_tid, dtype=np.float64), pa.float64()),
            "pointinstance": pa.array(np.asarray(g_pi, dtype=np.int64), pa.int64()),
            "ts": pa.array(
                np.asarray(g_ts, dtype="datetime64[us]"), pa.timestamp("us")
            ),
            "lon": pa.array(np.asarray(g_lon, dtype=np.float64), pa.float64()),
            "lat": pa.array(np.asarray(g_lat, dtype=np.float64), pa.float64()),
        }
    )
    return files, points


def gen_geolife_files(n_files: int) -> tuple[pa.Table, pa.Table, pa.Table]:
    """GeoLife ``.plt`` files + flat truth points + per-file track
    summaries (``extensions/formats/geolife/`` role).  Real 6-line
    header (self-skipped by the 7-field rule); altitude ``-777`` ->
    null elevation."""
    header = (
        "Geolife trajectory\nWGS 84\nAltitude is in Feet\nReserved 3\n"
        "0,2,255,My Track,0,0,2,8421376\n0\n"
    )
    f_id, f_txt = [], []
    g_tid, g_pi, g_ts, g_lat, g_lon, g_ele = [], [], [], [], [], []
    k_tid, k_st, k_et, k_dur, k_n = [], [], [], [], []
    t0 = np.datetime64("2008-10-23T02:53:04", "s")
    for j in range(n_files):
        name = f"200810{23 + (j % 7):02d}{j:06d}.plt"
        lines = [header.rstrip("\n")]
        first_ts = last_ts = None
        for i in range(20):
            lat_s = f"{39.9 + 0.001 * ((i * (j + 2)) % 50):.6f}"
            lon_s = f"{116.3 + 0.001 * ((i * (j + 5)) % 60):.6f}"
            alt = -777 if (i + j) % 9 == 4 else 400 + (3 * i + j) % 200
            ts = t0 + np.timedelta64(j * 3600 + i * 5, "s")
            d = np.datetime_as_string(ts, unit="s")
            date_s, time_s = d.split("T")
            days_s = f"{39744.0 + j + i / 17280.0:.10f}"
            lines.append(f"{lat_s},{lon_s},0,{alt},{days_s},{date_s},{time_s}")
            tsu = ts.astype("datetime64[us]")
            g_tid.append(name)
            g_pi.append(i)
            g_ts.append(tsu)
            g_lat.append(float(lat_s))
            g_lon.append(float(lon_s))
            g_ele.append(None if alt == -777 else float(alt))
            if first_ts is None:
                first_ts = tsu
            last_ts = tsu
        f_id.append(name)
        f_txt.append("\n".join(lines) + "\n")
        k_tid.append(name)
        k_st.append(first_ts)
        k_et.append(last_ts)
        k_dur.append(int((last_ts - first_ts) / np.timedelta64(1, "ms")))
        k_n.append(20)
    files = pa.table({"file_id": pa.array(f_id), "content": pa.array(f_txt)})
    points = pa.table(
        {
            "trackid": pa.array(g_tid, pa.string()),
            "pointinstance": pa.array(np.asarray(g_pi, dtype=np.int64), pa.int64()),
            "ts": pa.array(
                np.asarray(g_ts, dtype="datetime64[us]"), pa.timestamp("us")
            ),
            "lat": pa.array(np.asarray(g_lat, dtype=np.float64), pa.float64()),
            "lon": pa.array(np.asarray(g_lon, dtype=np.float64), pa.float64()),
            "elevation": pa.array(g_ele, pa.float64()),
        }
    )
    tracks = pa.table(
        {
            "trackid": pa.array(k_tid, pa.string()),
            "start_ts": pa.array(
                np.asarray(k_st, dtype="datetime64[us]"), pa.timestamp("us")
            ),
            "end_ts": pa.array(
                np.asarray(k_et, dtype="datetime64[us]"), pa.timestamp("us")
            ),
            "duration_ms": pa.array(np.asarray(k_dur, dtype=np.int64), pa.int64()),
            "n_points": pa.array(np.asarray(k_n, dtype=np.int64), pa.int64()),
        }
    )
    return files, points, tracks


def gen_gdelt_files(n_files: int, lines_per_file: int = 200) -> tuple[pa.Table, pa.Table]:
    """GDELT daily-export files (57/58 tab columns) + flat truth
    (``extensions/formats/gdelt/`` role).  Exercises every reference
    filter: geo-type-0 rows, empty-lat rows, 57-column legacy layout
    (no sourceUrl), empty optional strings -> null."""
    actors = ["POLICE", "GOVERNMENT", "", "PROTESTER", "ARMY", ""]
    ccs = ["US", "CN", "FR", "", "BR"]
    f_id, f_txt = [], []
    t_eid, t_ts, t_lat, t_lon = [], [], [], []
    t_a1, t_a2, t_cc, t_url = [], [], [], []
    t_a1c, t_a2c, t_nm, t_ns, t_na, t_tone = [], [], [], [], [], []
    eid = 300000000
    for j in range(n_files):
        day = f"201304{j % 28 + 1:02d}"
        lines = []
        for i in range(lines_per_file):
            ncols = 57 if (i % 13) == 5 else 58
            vals = [f"c{k}" for k in range(ncols)]
            eid += 1
            vals[0] = str(eid)
            vals[1] = day
            a1 = actors[(i + j) % len(actors)]
            a2 = actors[(i + 2 * j + 3) % len(actors)]
            cc = ccs[(i * 7 + j) % len(ccs)]
            vals[6], vals[16], vals[51] = a1, a2, cc
            vals[31] = str(1 + (i % 12))
            vals[32] = str(1 + (i % 5))
            vals[33] = str(1 + (i % 9))
            tone = f"{((i * 37 + j * 11) % 200 - 100) / 10.0:.2f}"
            vals[34] = tone
            vals[37] = ccs[(i + 1) % len(ccs)]
            vals[44] = ccs[(i + 3) % len(ccs)]
            if i % 17 == 2:
                vals[49] = "0"  # no geo: dropped
                vals[53], vals[54] = "1.0", "2.0"
                lines.append("\t".join(vals))
                continue
            vals[49] = str(1 + (i % 4))
            if i % 19 == 7:
                vals[53], vals[54] = "", "3.0"  # empty lat: dropped
                lines.append("\t".join(vals))
                continue
            lat_s = f"{((i * 13 + j * 5) % 1600) / 10.0 - 80.0:.4f}"
            lon_s = f"{((i * 29 + j * 3) % 3400) / 10.0 - 170.0:.4f}"
            vals[53], vals[54] = lat_s, lon_s
            url = "" if i % 23 == 11 else f"http://news.example/{eid}"
            if ncols == 58:
                vals[57] = url
            lines.append("\t".join(vals))
            t_eid.append(eid)
            t_ts.append(np.datetime64(f"{day[:4]}-{day[4:6]}-{day[6:]}", "us"))
            t_lat.append(float(lat_s))
            t_lon.append(float(lon_s))
            t_a1.append(a1 or None)
            t_a2.append(a2 or None)
            t_cc.append(cc or None)
            t_url.append(url if (ncols == 58 and url) else None)
            t_a1c.append(ccs[(i + 1) % len(ccs)] or None)
            t_a2c.append(ccs[(i + 3) % len(ccs)] or None)
            t_nm.append(1 + (i % 12))
            t_ns.append(1 + (i % 5))
            t_na.append(1 + (i % 9))
            t_tone.append(float(tone))
        f_id.append(f"{day}.export.CSV")
        f_txt.append("\n".join(lines) + "\n")
    files = pa.table({"file_id": pa.array(f_id), "content": pa.array(f_txt)})
    events = pa.table(
        {
            "eventid": pa.array(np.asarray(t_eid, dtype=np.int64), pa.int64()),
            "ts": pa.array(
                np.asarray(t_ts, dtype="datetime64[us]"), pa.timestamp("us")
            ),
            "lat": pa.array(np.asarray(t_lat, dtype=np.float64), pa.float64()),
            "lon": pa.array(np.asarray(t_lon, dtype=np.float64), pa.float64()),
            "actor1Name": pa.array(t_a1, pa.string()),
            "actor2Name": pa.array(t_a2, pa.string()),
            "countryCode": pa.array(t_cc, pa.string()),
            "sourceUrl": pa.array(t_url, pa.string()),
            "actor1CountryCode": pa.array(t_a1c, pa.string()),
            "actor2CountryCode": pa.array(t_a2c, pa.string()),
            "numMentions": pa.array(np.asarray(t_nm, dtype=np.int64), pa.int64()),
            "numSources": pa.array(np.asarray(t_ns, dtype=np.int64), pa.int64()),
            "numArticles": pa.array(np.asarray(t_na, dtype=np.int64), pa.int64()),
            "avgTone": pa.array(np.asarray(t_tone, dtype=np.float64), pa.float64()),
        }
    )
    return files, events


def gen_twitter_files(n_files: int, tweets_per_file: int = 40) -> tuple[pa.Table, pa.Table]:
    """Tweet-dump JSON-lines files + flat truth
    (``extensions/formats/twitter/`` role).  Exercises every reference
    skip rule: null/missing coordinates, bad ``created_at``, missing
    ``retweet_count``, malformed JSON lines (whole-buffer fallback),
    null optional fields -> empty string."""
    import datetime as _dt
    import json as _json

    f_id, f_txt = [], []
    t_tid, t_uid, t_un, t_tx, t_ru, t_rs = [], [], [], [], [], []
    t_rc, t_lg, t_dtg, t_lon, t_lat = [], [], [], [], []
    base = _dt.datetime(2013, 4, 1, 13, 30, 0)
    for j in range(n_files):
        lines = []
        for i in range(tweets_per_file):
            ts = base + _dt.timedelta(hours=j, seconds=17 * i)
            tid = f"{300000 + j * 1000 + i}"
            lon = -170.0 + ((i * 29 + j * 13) % 3400) / 10.0
            lat = -80.0 + ((i * 7 + j * 3) % 1600) / 10.0
            tw = {
                "id_str": tid,
                "created_at": ts.strftime("%a %b %d %H:%M:%S +0000 %Y"),
                "coordinates": {"type": "Point", "coordinates": [lon, lat]},
                "user": {"id_str": f"u{(i * 3 + j) % 50}", "name": f"user {(i * 3 + j) % 50}"},
                "text": f"tweet {tid} says hello number {i}",
                "in_reply_to_user_id_str": f"u{(i + 1) % 50}" if i % 4 == 1 else None,
                "in_reply_to_status_id_str": f"{300000 + i - 1}" if i % 5 == 2 else None,
                "retweet_count": (i * j) % 7,
                "lang": None if i % 9 == 4 else ["en", "de", "fr"][i % 3],
            }
            if i % 10 == 3:
                tw["coordinates"] = None  # dropped (plugin:176-194)
            elif i % 10 == 6:
                del tw["coordinates"]  # dropped
            elif i % 13 == 7:
                tw["created_at"] = "yesterday-ish"  # dropped (plugin:199-210)
            elif i % 17 == 9:
                del tw["retweet_count"]  # dropped (catch-all continue)
            elif i % 19 == 11:
                lines.append('{"id_str": "broken')  # malformed line
                continue
            lines.append(_json.dumps(tw))
            if i % 10 in (3, 6) or (i % 13 == 7) or (i % 17 == 9):
                continue
            t_tid.append(tid)
            t_uid.append(f"u{(i * 3 + j) % 50}")
            t_un.append(f"user {(i * 3 + j) % 50}")
            t_tx.append(f"tweet {tid} says hello number {i}")
            t_ru.append(f"u{(i + 1) % 50}" if i % 4 == 1 else "")
            t_rs.append(f"{300000 + i - 1}" if i % 5 == 2 else "")
            t_rc.append((i * j) % 7)
            t_lg.append("" if i % 9 == 4 else ["en", "de", "fr"][i % 3])
            t_dtg.append(np.datetime64(ts, "us"))
            t_lon.append(lon)
            t_lat.append(lat)
        f_id.append(f"201304{(j % 28) + 1:02d}-{130000 + j:06d}.txt.gz")
        f_txt.append("\n".join(lines) + "\n")
    files = pa.table({"file_id": pa.array(f_id), "content": pa.array(f_txt)})
    tweets = pa.table(
        {
            "tweet_id": pa.array(t_tid, pa.string()),
            "user_id": pa.array(t_uid, pa.string()),
            "user_name": pa.array(t_un, pa.string()),
            "text": pa.array(t_tx, pa.string()),
            "in_reply_to_user_id": pa.array(t_ru, pa.string()),
            "in_reply_to_status_id": pa.array(t_rs, pa.string()),
            "retweet_count": pa.array(np.asarray(t_rc, dtype=np.int64), pa.int64()),
            "lang": pa.array(t_lg, pa.string()),
            "dtg": pa.array(np.asarray(t_dtg, dtype="datetime64[us]"), pa.timestamp("us")),
            "lon": pa.array(np.asarray(t_lon, dtype=np.float64), pa.float64()),
            "lat": pa.array(np.asarray(t_lat, dtype=np.float64), pa.float64()),
        }
    )
    return files, tweets


def gen_raster_chunks_mb(n_chunks: int, bands: int = 2) -> pa.Table:
    """Multi-band chunks with nodata holes and a merge sequence — the
    NoDataMergeStrategy fixture (latest-wins, fill holes from earlier;
    ``extensions/adapters/raster/.../nodata/NoDataMergeStrategy.java``).

    Pixels are band-major (band, row, col), value ``(7i + 3b + idx) % 97``
    with deterministic nodata holes where ``(idx*31 + i) % 11 == 0``.
    """
    nodata = -9999.0
    w = h = 32
    cid, xmins, ymins, xmaxs, ymaxs, ws, hs, pix, seqs = (
        [], [], [], [], [], [], [], [], [],
    )
    for i in range(n_chunks):
        if i % 2 == 1:  # overlap pair (same placement rule as raster_chunks)
            base = i - 1
            bw = 1.0 + (base % 4)
            cx = _u(f"mbx{base}", -170.0, 166.0) + bw / 2
            cy = _u(f"mby{base}", -80.0, 76.0)
        else:
            bw = 1.0 + (i % 4)
            cx = _u(f"mbx{i}", -170.0, 166.0)
            cy = _u(f"mby{i}", -80.0, 76.0)
        cid.append(f"m{i:05d}")
        seqs.append(i)
        xmins.append(cx)
        ymins.append(cy)
        xmaxs.append(cx + bw)
        ymaxs.append(cy + bw)
        ws.append(w)
        hs.append(h)
        idx = np.arange(bands * h * w, dtype=np.int64)
        p = ((7 * np.int64(i) + 3 * (idx // (h * w)) + idx) % 97).astype(np.float64)
        p[(idx * 31 + i) % 11 == 0] = nodata
        pix.append(p)
    return pa.table(
        {
            "chunk_id": pa.array(cid),
            "seq": pa.array(seqs, pa.int64()),
            "xmin": pa.array(xmins, pa.float64()),
            "ymin": pa.array(ymins, pa.float64()),
            "xmax": pa.array(xmaxs, pa.float64()),
            "ymax": pa.array(ymaxs, pa.float64()),
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
            "bands": pa.array([bands] * n_chunks, pa.int32()),
            "nodata": pa.array([nodata] * n_chunks, pa.float64()),
            "pixels": pa.array(pix, pa.list_(pa.float64())),
        }
    )


# ---------------------------------------------------------------------------
# orchestration
# ---------------------------------------------------------------------------


_DOC_VOCAB = [
    "the", "table", "row", "scan", "fast", "slow", "value", "key", "hash",
    "part", "agg", "join", "small", "big", "line", "customer", "query",
    "data", "column", "order", "group", "sort", "window", "batch", "stream",
    "merge", "filter", "spark", "a", "index", "cache", "disk", "block",
    "shard", "node", "byte", "page", "token", "graph", "model",
]


def _doc_mix(x: np.ndarray) -> np.ndarray:
    """splitmix64-style avalanche (local copy; fixtures stay hashing-
    library-independent so golden texts never drift)."""
    with np.errstate(over="ignore"):
        x = x.astype(np.uint64, copy=True)
        x ^= x >> np.uint64(33)
        x *= np.uint64(0xFF51AFD7ED558CCD)
        x ^= x >> np.uint64(33)
        x *= np.uint64(0xC4CEB9FE1A85EC53)
        x ^= x >> np.uint64(33)
    return x


def gen_docs_slice(start: int, stop: int, n_total: int) -> pa.Table:
    """Rows [start, stop) of the synthetic scaled docs corpus, matching
    the testdata ``documents`` schema (doc_id, text, lang, source,
    n_chars) with a controlled duplicate structure:

    - docs with ``i % 7 == 3`` are BYTE-IDENTICAL copies of doc i-3
      (~14% exact-dup rate — web-corpus-ish);
    - docs with ``i % 11 == 5`` (and not exact dups) are NEAR
      duplicates: the base text of doc i-5 plus one extra token
      (high-Jaccard LSH candidates);
    - everything is a pure function of the row index (seedless,
      deterministic across slicings)."""
    i = np.arange(start, stop, dtype=np.int64)
    is_copy = i % 7 == 3
    is_near = (i % 11 == 5) & ~is_copy
    base = np.where(is_copy, np.maximum(i - 3, 0), i)
    base = np.where(is_near, np.maximum(i - 5, 0), base)
    n_tok = 20 + (_doc_mix(base.astype(np.uint64)) % np.uint64(80)).astype(np.int64)
    offsets = np.concatenate([[0], np.cumsum(n_tok)])
    flat_doc = np.repeat(np.arange(len(i)), n_tok)
    flat_pos = np.arange(offsets[-1]) - offsets[flat_doc]
    tok_ids = (
        _doc_mix((base[flat_doc].astype(np.uint64) << np.uint64(20)) | flat_pos.astype(np.uint64))
        % np.uint64(len(_DOC_VOCAB))
    ).astype(np.int64)
    vocab = np.array(_DOC_VOCAB, dtype=object)
    words = vocab[tok_ids]
    texts = [
        " ".join(words[offsets[d] : offsets[d + 1]]) for d in range(len(i))
    ]
    for d in np.nonzero(is_near)[0]:
        texts[d] = texts[d] + " epsilon"
    lang_idx = (_doc_mix((i + np.int64(7919)).astype(np.uint64)) % np.uint64(100)).astype(np.int64)
    lang_pos = np.searchsorted(LANG_CUM, lang_idx, side="right")
    langs = [LANGS[p] for p in lang_pos]
    sources = [f"src{k % 37}" for k in i]
    return pa.table(
        {
            "doc_id": pa.array(i, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def _gen_docs_files(n_total: int, out_dir: str) -> None:
    """Parallel (when Ray is up) generation of the docs corpus, one
    parquet file per ROWS_PER_FILE slice."""
    os.makedirs(out_dir, exist_ok=True)
    slices = [
        (s, min(s + ROWS_PER_FILE, n_total)) for s in range(0, n_total, ROWS_PER_FILE)
    ]

    def write_one(start: int, stop: int) -> None:
        pq.write_table(
            gen_docs_slice(start, stop, n_total),
            os.path.join(out_dir, f"part-{start:09d}.parquet"),
        )

    use_ray = False
    try:
        import ray

        use_ray = ray.is_initialized() and len(slices) > 4
    except Exception:
        pass
    if not use_ray:
        for start, stop in slices:
            write_one(start, stop)
        return

    import ray

    @ray.remote
    def gen_task(start: int, stop: int) -> None:
        write_one(start, stop)

    ray.get([gen_task.remote(s, e) for s, e in slices])


def _fill_new_tables(out: str, cfg: dict) -> None:
    """Write tables added after v3 caches were built (idempotent)."""
    mb = os.path.join(out, "raster_chunks_mb.parquet")
    if not os.path.exists(mb):
        pq.write_table(gen_raster_chunks_mb(cfg["chunks"]), mb)
    hol = os.path.join(out, "holed_regions.parquet")
    if not os.path.exists(hol):
        regions, edges = gen_holed_regions(max(64, cfg["regions"] // 8))
        pq.write_table(regions, hol)
        pq.write_table(edges, os.path.join(out, "holed_edges.parquet"))
    trk = os.path.join(out, "tracks.parquet")
    if not os.path.exists(trk):
        tracks, segments = gen_tracks(cfg["regions"])
        pq.write_table(tracks, trk)
        pq.write_table(segments, os.path.join(out, "track_segments.parquet"))
    gr = os.path.join(out, "grid_rects.parquet")
    if not os.path.exists(gr):
        pq.write_table(gen_grid_rects(max(64, cfg["regions"] // 8)), gr)
    gx = os.path.join(out, "gpx_files.parquet")
    if not os.path.exists(gx):
        files, points = gen_gpx_files(max(64, cfg["regions"] // 8))
        pq.write_table(files, gx)
        pq.write_table(points, os.path.join(out, "gpx_points.parquet"))
    shpf = os.path.join(out, "shapefiles.parquet")
    if not os.path.exists(shpf):
        files, truth = gen_shapefiles(max(32, cfg["regions"] // 16))
        pq.write_table(files, shpf)
        pq.write_table(truth, os.path.join(out, "shapefile_truth.parquet"))
    gtf = os.path.join(out, "geotiffs.parquet")
    if not os.path.exists(gtf):
        files, truth = gen_geotiffs(max(40, cfg["regions"] // 16))
        pq.write_table(files, gtf)
        pq.write_table(truth, os.path.join(out, "geotiff_truth.parquet"))
    imf = os.path.join(out, "images.parquet")
    if not os.path.exists(imf):
        pq.write_table(gen_images(max(48, cfg["regions"] // 16)), imf)
    auf = os.path.join(out, "audio.parquet")
    if not os.path.exists(auf):
        pq.write_table(gen_audio(max(48, cfg["regions"] // 16)), auf)
    wim = os.path.join(out, "web_images.parquet")
    if not os.path.exists(wim):
        pq.write_table(gen_web_images(max(48, cfg["regions"] // 16)), wim)
    jim = os.path.join(out, "jpeg_images.parquet")
    if not os.path.exists(jim):
        pq.write_table(gen_jpeg_images(max(48, cfg["regions"] // 16)), jim)
    vid = os.path.join(out, "videos.parquet")
    if not os.path.exists(vid):
        pq.write_table(gen_videos(max(32, cfg["regions"] // 32)), vid)
    hd = os.path.join(out, "html_docs.parquet")
    if not os.path.exists(hd):
        pq.write_table(gen_html_docs(max(200, cfg["regions"] // 4)), hd)
    wf = os.path.join(out, "warc_files.parquet")
    if not os.path.exists(wf):
        files, truth = gen_warc_files(max(40, cfg["regions"] // 16))
        pq.write_table(files, wf)
        pq.write_table(truth, os.path.join(out, "warc_truth.parquet"))
    avf = os.path.join(out, "avro_files.parquet")
    if not os.path.exists(avf):
        files, truth = gen_avro_files(max(40, cfg["regions"] // 16))
        pq.write_table(files, avf)
        pq.write_table(truth, os.path.join(out, "avro_truth.parquet"))
        # whole-file staging container: the first 8 GPX XML fixtures
        # wrapped as WholeFile records (AbstractStageWholeFileToAvro
        # role) — read back through the normal gpx format plugin
        from .sources.avro_io import stage_whole_files

        gpx = pq.read_table(os.path.join(out, "gpx_files.parquet"))
        staged = stage_whole_files(
            [
                (gpx.column("file_id")[i].as_py(),
                 gpx.column("xml")[i].as_py().encode("utf-8"))
                for i in range(min(8, gpx.num_rows))
            ]
        )
        pq.write_table(
            pa.table({"staged": pa.array([staged], pa.binary())}),
            os.path.join(out, "avro_staged_gpx.parquet"),
        )
    sg = os.path.join(out, "stanag_files.parquet")
    if not os.path.exists(sg):
        files, points = gen_stanag_files(max(32, cfg["regions"] // 16))
        pq.write_table(files, sg)
        pq.write_table(points, os.path.join(out, "stanag_points.parquet"))
    td = os.path.join(out, "tdrive_files.parquet")
    if not os.path.exists(td):
        files, points = gen_tdrive_files(max(48, cfg["regions"] // 8))
        pq.write_table(files, td)
        pq.write_table(points, os.path.join(out, "tdrive_points.parquet"))
    gl = os.path.join(out, "geolife_files.parquet")
    if not os.path.exists(gl):
        files, points, tracks = gen_geolife_files(max(48, cfg["regions"] // 8))
        pq.write_table(files, gl)
        pq.write_table(points, os.path.join(out, "geolife_points.parquet"))
        pq.write_table(tracks, os.path.join(out, "geolife_tracks.parquet"))
    gd = os.path.join(out, "gdelt_files.parquet")
    if not os.path.exists(gd):
        files, events = gen_gdelt_files(max(4, cfg["regions"] // 512))
        pq.write_table(files, gd)
        pq.write_table(events, os.path.join(out, "gdelt_events.parquet"))
    pd_ = os.path.join(out, "para_docs.parquet")
    if not os.path.exists(pd_):
        pq.write_table(gen_para_docs(max(400, cfg["regions"])), pd_)
    mu = os.path.join(out, "messy_urls.parquet")
    if not os.path.exists(mu):
        pq.write_table(gen_messy_urls(max(200, cfg["regions"] // 4)), mu)
    tw = os.path.join(out, "twitter_files.parquet")
    if not os.path.exists(tw):
        files, tweets = gen_twitter_files(max(24, cfg["regions"] // 16))
        pq.write_table(files, tw)
        pq.write_table(tweets, os.path.join(out, "twitter_tweets.parquet"))
    # marker lives BESIDE the docs dir (a non-parquet file inside
    # would break read_parquet over the directory)
    if (cfg.get("docs") and not cfg.get("tpch")
            and not os.path.exists(os.path.join(out, "docs_DONE"))):
        _gen_docs_files(cfg["docs"], os.path.join(out, "docs"))
        with open(os.path.join(out, "docs_DONE"), "w") as f:
            f.write("ok\n")
    if cfg.get("tpch"):
        _fill_sf1_tables(out, cfg)
    if cfg.get("codec"):
        _gen_codec_volume(out, cfg["codec"])


def ensure_fixtures(sf_dir: str) -> str:
    """Generate (once, cached) the fixture tables for this sf; return dir."""
    out = fixture_dir(sf_dir)
    marker = os.path.join(out, f"_DONE_{FIXTURE_VERSION}")
    name = os.path.basename(os.path.normpath(out))
    cfg = SCALES[name]
    if os.path.exists(marker):
        # tables added after a cache was built are filled in lazily so
        # the (expensive) pages fixture never regenerates
        _fill_new_tables(out, cfg)
        return out
    tmp = out + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(os.path.join(tmp, "pages"), exist_ok=True)
    n = cfg["pages"]
    slices = [
        (start, min(start + ROWS_PER_FILE, n)) for start in range(0, n, ROWS_PER_FILE)
    ]
    _gen_pages_files(slices, n, os.path.join(tmp, "pages"))
    regions, edges = gen_regions(cfg["regions"])
    pq.write_table(regions, os.path.join(tmp, "regions.parquet"))
    pq.write_table(edges, os.path.join(tmp, "region_edges.parquet"))
    cregions, cedges = gen_concave_regions(max(32, cfg["regions"] // 8))
    pq.write_table(cregions, os.path.join(tmp, "concave_regions.parquet"))
    pq.write_table(cedges, os.path.join(tmp, "concave_edges.parquet"))
    queries = gen_queries()
    pq.write_table(queries, os.path.join(tmp, "queries.parquet"))
    pq.write_table(queries_to_edges(queries), os.path.join(tmp, "query_edges.parquet"))
    pq.write_table(gen_knn_queries(), os.path.join(tmp, "knn_queries.parquet"))
    pq.write_table(gen_raster_chunks(cfg["chunks"]), os.path.join(tmp, "raster_chunks.parquet"))
    _fill_new_tables(tmp, cfg)
    os.replace(tmp, out)
    with open(marker, "w") as f:
        f.write("ok\n")
    return out


def _gen_pages_files(slices, n_total: int, out_dir: str) -> None:
    """Write one parquet file per slice — fanned out over Ray tasks
    when a Ray session exists (generation is a pure function of the
    slice, so parallel generation is deterministic), else serially."""

    def write_one(start: int, stop: int) -> None:
        t = gen_pages_slice(start, stop, n_total)
        pq.write_table(t, os.path.join(out_dir, f"part-{start:09d}.parquet"))

    use_ray = False
    try:
        import ray

        use_ray = ray.is_initialized() and len(slices) > 4
    except Exception:
        pass
    if not use_ray:
        for start, stop in slices:
            write_one(start, stop)
        return

    import ray

    @ray.remote
    def gen_task(start: int, stop: int) -> None:
        write_one(start, stop)

    ray.get([gen_task.remote(s, e) for s, e in slices])


def gen_pages_slice(start: int, stop: int, n_total: int) -> pa.Table:
    """Rows [start, stop) of the pages table of total size n_total
    (url depends on n_hosts which depends on n_total)."""
    n_hosts = max(16, n_total // 1000)
    i = np.arange(start, stop, dtype=np.int64)
    urls = [f"https://site{k % n_hosts}.example/{k:012d}" for k in range(start, stop)]
    warc_ts = (np.int64(1704067200) + (i * 1337) % 31_536_000) * 1_000_000
    html = [
        (f"<html><body>doc {k} " + "x" * (k % 512) + "</body></html>").encode()
        for k in range(start, stop)
    ]
    url_digests = [hashlib.sha256(u.encode()).digest() for u in urls]
    texts = [
        f"doc {k} body {url_digests[k - start][:8].hex()}" for k in range(start, stop)
    ]
    lang_idx = np.array([d[0] % 100 for d in url_digests], dtype=np.int64)
    lang_pos = np.searchsorted(LANG_CUM, lang_idx, side="right")
    langs = [LANGS[p] for p in lang_pos]
    lon, lat = derive_lonlat(urls, langs, i)
    return pa.table(
        {
            "row_id": pa.array(i, pa.int64()),
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(warc_ts, pa.timestamp("us")),
            "html": pa.array(html, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "lon": pa.array(lon, pa.float64()),
            "lat": pa.array(lat, pa.float64()),
        }
    )


def pages_path(sf_dir: str) -> str:
    return os.path.join(ensure_fixtures(sf_dir), "pages")


def table_path(sf_dir: str, name: str) -> str:
    base = ensure_fixtures(sf_dir)
    return os.path.join(base, "pages") if name == "pages" else os.path.join(base, f"{name}.parquet")


# ---------------------------------------------------------------------------
# sf1 scale-stress tables (VERDICT r4 #1): testdata-SHAPED synthetic
# TPC-H tables + a documents.parquet directory at 10x sf0.1 volume, so
# the FULL bench plan (docs + relational queries included) runs at sf1
# with GRAFT_SF_DIR=/tmp/geowave_fixtures/sf1. Bench-only — oracle
# correctness stays pinned to the driver's real testdata at sf0.01.
# ---------------------------------------------------------------------------

def gen_orders_slice(start: int, stop: int, n_cust: int) -> pa.Table:
    i = np.arange(start, stop, dtype=np.int64)
    u = _doc_mix(i.astype(np.uint64))
    status = np.array(["O", "F", "P"], dtype=object)
    prio = np.array(
        ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
        dtype=object,
    )
    ts = (np.int64(694224000) + (i * 86131) % (8 * 31_536_000)) * 1_000_000
    return pa.table({
        "o_orderkey": pa.array(i + 1, pa.int64()),
        "o_custkey": pa.array((u % np.uint64(n_cust)).astype(np.int64) + 1,
                              pa.int64()),
        "o_orderstatus": pa.array(status[(i % 3)]),
        "o_totalprice": pa.array(
            900.0 + (u % np.uint64(50_000_000)).astype(np.float64) / 100.0,
            pa.float64()),
        "o_orderdate": pa.array(ts, pa.timestamp("us")),
        "o_orderpriority": pa.array(prio[(i % 5)]),
    })


def gen_lineitem_slice(start: int, stop: int, n_orders: int,
                       n_parts: int, n_supp: int) -> pa.Table:
    """~4 lineitems per order: row i belongs to order i//4 + 1."""
    i = np.arange(start, stop, dtype=np.int64)
    u = _doc_mix(i.astype(np.uint64))
    ok = np.minimum(i // 4 + 1, n_orders)
    rf = np.array(["A", "N", "R"], dtype=object)
    ls = np.array(["O", "F"], dtype=object)
    ts = (np.int64(694224000) + (i * 53777) % (8 * 31_536_000)) * 1_000_000
    return pa.table({
        "l_orderkey": pa.array(ok, pa.int64()),
        "l_partkey": pa.array((u % np.uint64(n_parts)).astype(np.int64) + 1,
                              pa.int64()),
        "l_suppkey": pa.array(
            ((u >> np.uint64(17)) % np.uint64(n_supp)).astype(np.int64) + 1,
            pa.int64()),
        "l_linenumber": pa.array((i % 4 + 1).astype(np.int32), pa.int32()),
        "l_quantity": pa.array((u % np.uint64(50)).astype(np.float64) + 1.0,
                               pa.float64()),
        "l_extendedprice": pa.array(
            901.0 + ((u >> np.uint64(7)) % np.uint64(10_000_000)
                     ).astype(np.float64) / 100.0, pa.float64()),
        "l_discount": pa.array(
            ((u >> np.uint64(33)) % np.uint64(11)).astype(np.float64) / 100.0,
            pa.float64()),
        "l_tax": pa.array(
            ((u >> np.uint64(41)) % np.uint64(9)).astype(np.float64) / 100.0,
            pa.float64()),
        "l_returnflag": pa.array(rf[(i % 3)]),
        "l_linestatus": pa.array(ls[(i % 2)]),
        "l_shipdate": pa.array(ts, pa.timestamp("us")),
    })


def gen_customer(n_cust: int) -> pa.Table:
    i = np.arange(n_cust, dtype=np.int64)
    u = _doc_mix(i.astype(np.uint64))
    seg = np.array(["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
                    "MACHINERY"], dtype=object)
    return pa.table({
        "c_custkey": pa.array(i + 1, pa.int64()),
        "c_name": pa.array([f"Customer#{k + 1:09d}" for k in i]),
        "c_nationkey": pa.array((u % np.uint64(25)).astype(np.int32),
                                pa.int32()),
        "c_acctbal": pa.array(
            -999.0 + (u % np.uint64(1_100_000)).astype(np.float64) / 100.0,
            pa.float64()),
        "c_mktsegment": pa.array(seg[(i % 5)]),
    })


_TPCH_NATIONS = [
    "ALGERIA", "ARGENTINA", "BRAZIL", "CANADA", "EGYPT", "ETHIOPIA",
    "FRANCE", "GERMANY", "INDIA", "INDONESIA", "IRAN", "IRAQ", "JAPAN",
    "JORDAN", "KENYA", "MOROCCO", "MOZAMBIQUE", "PERU", "CHINA",
    "ROMANIA", "SAUDI ARABIA", "VIETNAM", "RUSSIA", "UNITED KINGDOM",
    "UNITED STATES",
]


def gen_nation() -> pa.Table:
    i = np.arange(25, dtype=np.int32)
    return pa.table({
        "n_nationkey": pa.array(i, pa.int32()),
        "n_name": pa.array(_TPCH_NATIONS),
        "n_regionkey": pa.array((i % 5).astype(np.int32), pa.int32()),
    })


def _gen_sliced_table(gen, n_total: int, out_dir: str, **kw) -> None:
    """Write one parquet file per ROWS_PER_FILE slice of gen(start,
    stop, **kw) — Ray-parallel when a session exists."""
    os.makedirs(out_dir, exist_ok=True)
    slices = [(s, min(s + ROWS_PER_FILE, n_total))
              for s in range(0, n_total, ROWS_PER_FILE)]

    def write_one(start: int, stop: int) -> None:
        pq.write_table(gen(start, stop, **kw),
                       os.path.join(out_dir, f"part-{start:09d}.parquet"))

    use_ray = False
    try:
        import ray

        use_ray = ray.is_initialized() and len(slices) > 4
    except Exception:
        pass
    if not use_ray:
        for s, e in slices:
            write_one(s, e)
        return
    import ray

    @ray.remote
    def gen_task(start: int, stop: int) -> None:
        write_one(start, stop)

    ray.get([gen_task.remote(s, e) for s, e in slices])


def gen_codec_geotiff(j: int) -> bytes:
    """One VOLUME GeoTIFF (256x256, 1-2 bands) cycling dtype and
    compression — the timed wire-decode bench unit."""
    from .sources.geotiff import write_geotiff

    dt = [np.uint8, np.uint16, np.int32][j % 3]
    comp = ["lzw", "deflate", "packbits", "none"][j % 4]
    bands = 1 + j % 2
    px = (
        (np.arange(bands * 256 * 256, dtype=np.int64) * (31 + j) + j)
        % 97
    ).reshape(bands, 256, 256).astype(dt)
    return write_geotiff(
        px, (float(j % 360 - 180), 0.0, float(j % 360 - 179), 1.0),
        epsg=4326, compression=comp, predictor=(comp != "none"),
    )


def gen_codec_avro(j: int, n_rec: int = 40_000) -> bytes:
    """One VOLUME Avro container (Feature-schema records, deflate on
    odd files) — the timed container-parse bench unit."""
    from .sources.avro_io import write_container

    schema = {
        "type": "record",
        "name": "Feature",
        "fields": [
            {"name": "fid", "type": "long"},
            {"name": "lon", "type": "double"},
            {"name": "lat", "type": "double"},
            {"name": "weight", "type": ["null", "double"]},
        ],
    }
    recs = [
        {
            "fid": j * n_rec + i,
            "lon": ((j * n_rec + i) * 0.00137) % 360.0 - 180.0,
            "lat": ((j * n_rec + i) * 0.00089) % 180.0 - 90.0,
            "weight": None if i % 5 == 2 else float((i * 7 + j) % 1000) / 8.0,
        }
        for i in range(n_rec)
    ]
    return write_container(recs, schema, codec="deflate" if j % 2 else "null")


def gen_codec_png(j: int, side: int = 256) -> bytes:
    """256x256 RGB PNG with cycling row filters — the png codec's
    volume fixture (~196 KB of samples per file)."""
    from .sources.png import encode

    n = side * side * 3
    px = ((7 * np.int64(j) + np.arange(n, dtype=np.int64)) % 251).astype(
        np.uint8
    )
    return encode(px.reshape(side, side, 3), filter_type="cycle")


def gen_codec_jpeg(j: int, side: int = 256) -> bytes:
    """256x256 RGB 4:2:0 JPEG with textured content (sinusoid + hash
    noise -> real AC coefficient work) — the jpeg codec's volume
    fixture (~196 KB of decoded samples per file)."""
    from .sources.jpeg import encode

    xs = np.linspace(0, 8 * np.pi, side)
    base = 127.0 + 80.0 * np.sin(xs + j)[None, :] * np.cos(xs * 0.6)[:, None]
    noise = ((np.arange(side * side, dtype=np.int64) * 2654435761
              + j) % 64).reshape(side, side) - 32
    plane = np.clip(base + noise, 0, 255).astype(np.uint8)
    rgb = np.stack([plane, plane[::-1], plane.T], axis=2)
    return encode(np.ascontiguousarray(rgb), subsampling="4:2:0")


def gen_codec_gif(j: int, side: int = 512) -> bytes:
    """512x512 palette GIF (interlaced on odd files) with pseudo-random
    indices — the gif codec's LZW volume fixture (~262 KB of pixels)."""
    from .sources.gif import encode

    idx = ((np.arange(side * side, dtype=np.int64) * 2654435761 + 17 * j)
           % 256).astype(np.uint8).reshape(side, side)
    pal = np.stack([np.arange(256), (np.arange(256) * 2) % 256,
                    (np.arange(256) * 5) % 256], axis=1).astype(np.uint8)
    return encode(idx, pal, interlace=bool(j % 2))


def gen_codec_wav(j: int, n_frames: int = 60_000) -> bytes:
    """Stereo 16-bit PCM clip (~240 KB) — the wav codec's volume
    fixture."""
    from .sources.wav import encode

    idx = np.arange(n_frames * 2, dtype=np.int64)
    s = ((11 * np.int64(j) + idx) % 20001) - 10000
    return encode(s.reshape(n_frames, 2), rate=16000, sample_width=2)


def _gen_codec_volume(out: str, n_files: int) -> None:
    """codec_geotiffs.parquet + codec_avro.parquet volume fixtures
    (one row per file; bytes column) — Ray-parallel generation."""
    import ray

    use_ray = ray.is_initialized() and n_files > 8

    def build(gen, ids):
        if use_ray:
            @ray.remote
            def one(j):
                return gen(j)

            return ray.get([one.remote(j) for j in ids])
        return [gen(j) for j in ids]

    def write_dir(path, name_fmt, col, gen, ids, per_file):
        # a DIRECTORY of small parquet files so the timed decode fans
        # out over blocks without a row-group splitter
        tmp = path + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        payload = build(gen, ids)
        for s in range(0, len(ids), per_file):
            grp = ids[s:s + per_file]
            pq.write_table(
                pa.table({
                    "file_id": pa.array([name_fmt.format(j) for j in grp]),
                    col: pa.array(payload[s:s + per_file], pa.binary()),
                }),
                os.path.join(tmp, f"part-{s:06d}.parquet"),
            )
        os.replace(tmp, path)

    gt = os.path.join(out, "codec_geotiffs.parquet")
    if not os.path.isdir(gt):
        write_dir(gt, "ct{:05d}.tif", "tif", gen_codec_geotiff,
                  list(range(n_files)), per_file=4)
    av = os.path.join(out, "codec_avro.parquet")
    if not os.path.isdir(av):
        write_dir(av, "ca{:05d}.avro", "avro", gen_codec_avro,
                  list(range(max(16, n_files // 2))), per_file=2)
    pg = os.path.join(out, "codec_pngs.parquet")
    if not os.path.isdir(pg):
        write_dir(pg, "cp{:05d}.png", "png", gen_codec_png,
                  list(range(n_files)), per_file=4)
    wv = os.path.join(out, "codec_wavs.parquet")
    if not os.path.isdir(wv):
        write_dir(wv, "cw{:05d}.wav", "wav", gen_codec_wav,
                  list(range(n_files)), per_file=4)
    jp = os.path.join(out, "codec_jpegs.parquet")
    if not os.path.isdir(jp):
        write_dir(jp, "cj{:05d}.jpg", "jpg", gen_codec_jpeg,
                  list(range(n_files)), per_file=4)
    gf = os.path.join(out, "codec_gifs.parquet")
    if not os.path.isdir(gf):
        write_dir(gf, "cg{:05d}.gif", "gif", gen_codec_gif,
                  list(range(n_files)), per_file=4)


def _fill_sf1_tables(out: str, cfg: dict) -> None:
    """sf1-only: TPC-H-shaped tables + documents.parquet DIRECTORY so
    _read_testdata-backed bench queries resolve against the fixture
    root itself (GRAFT_SF_DIR points here)."""
    scale = cfg["tpch"]  # 10 = 10x the sf0.1 testdata row counts
    n_orders = 150_000 * scale
    n_li = 600_000 * scale
    n_cust = 15_000 * scale
    li = os.path.join(out, "lineitem.parquet")
    if not os.path.isdir(li):
        _gen_sliced_table(gen_lineitem_slice, n_li, li + ".tmp",
                          n_orders=n_orders, n_parts=20_000 * scale,
                          n_supp=1_000 * scale)
        os.replace(li + ".tmp", li)
    od = os.path.join(out, "orders.parquet")
    if not os.path.isdir(od):
        _gen_sliced_table(gen_orders_slice, n_orders, od + ".tmp",
                          n_cust=n_cust)
        os.replace(od + ".tmp", od)
    cu = os.path.join(out, "customer.parquet")
    if not os.path.exists(cu):
        pq.write_table(gen_customer(n_cust), cu)
    na = os.path.join(out, "nation.parquet")
    if not os.path.exists(na):
        pq.write_table(gen_nation(), na)
    docs = os.path.join(out, "documents.parquet")
    if cfg.get("docs") and not os.path.isdir(docs):
        _gen_docs_files(cfg["docs"], docs + ".tmp")
        os.replace(docs + ".tmp", docs)
