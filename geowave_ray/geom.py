"""Geometry kernels (pure numpy — no shapely/JTS in this environment).

Capability parity with the reference's geometry layer:

- WKB encode/decode for Point / Polygon (subset of
  ``core/geotime/.../util/GeometryUtils.java`` — WKB at full precision).
- Vectorized point-in-polygon: generic even-odd ray casting plus an
  exact convex half-plane test (the fine filter of
  ``core/geotime/.../store/query/filter/SpatialQueryFilter.java``).
- A bucketed spatial grid index (``GridIndex``) standing in for
  JTS STRtree as the broadcast probe-side structure of the PIP join
  (north-rule actor-pool state; reference keeps prepared geometries
  per worker, ``SpatialQueryFilter.java:38``).
- Haversine + planar distances for kNN
  (``analytics/api/.../distance/``).

The convex half-plane test uses the exact expression
``(x2-x1)*(py-y1) - (y2-y1)*(px-x1) >= 0`` per edge so the DuckDB
oracle SQL can reproduce it bit-for-bit on the same float64 inputs.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# WKB (little-endian; Point=1, Polygon=3)
# ---------------------------------------------------------------------------


def point_wkb(lon: float, lat: float) -> bytes:
    return struct.pack("<BIdd", 1, 1, lon, lat)


def polygon_wkb(coords: np.ndarray) -> bytes:
    """Exterior-ring-only polygon WKB from an (N, 2) array.

    The ring is closed automatically if the last vertex != first.
    """
    coords = np.asarray(coords, dtype=np.float64)
    if not np.array_equal(coords[0], coords[-1]):
        coords = np.vstack([coords, coords[:1]])
    header = struct.pack("<BIII", 1, 3, 1, len(coords))
    return header + coords.astype("<f8").tobytes()


def parse_wkb_polygon(wkb: bytes) -> np.ndarray:
    """Parse a (multi-ring ignored: exterior only) polygon WKB -> (N, 2)."""
    byte_order = wkb[0]
    fmt = "<" if byte_order == 1 else ">"
    geom_type = struct.unpack_from(fmt + "I", wkb, 1)[0]
    if geom_type != 3:
        raise ValueError(f"not a polygon WKB (type={geom_type})")
    n_pts = struct.unpack_from(fmt + "I", wkb, 9)[0]
    arr = np.frombuffer(wkb, dtype=fmt + "f8", count=2 * n_pts, offset=13)
    return arr.reshape(-1, 2).copy()


def parse_wkb_point(wkb: bytes) -> tuple[float, float]:
    fmt = "<" if wkb[0] == 1 else ">"
    x, y = struct.unpack_from(fmt + "dd", wkb, 5)
    return x, y


# ---------------------------------------------------------------------------
# point-in-polygon
# ---------------------------------------------------------------------------


def pip_convex(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Exact convex containment: all edge cross products >= 0.

    ``ring`` is (N, 2), CCW, closed or open. Boundary points count as
    inside (cross == 0 passes). The per-edge expression matches the
    oracle SQL term-for-term so float results agree bit-exactly.
    """
    r = np.asarray(ring, dtype=np.float64)
    if np.array_equal(r[0], r[-1]):
        r = r[:-1]
    inside = np.ones(len(px), dtype=bool)
    n = len(r)
    for i in range(n):
        x1, y1 = r[i]
        x2, y2 = r[(i + 1) % n]
        cross = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
        inside &= cross >= 0.0
    return inside


def pip_raycast(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Generic even-odd ray casting (handles concave rings).

    Points exactly on a vertex/edge may land either way (standard
    even-odd caveat); use :func:`pip_convex` when exact boundary
    semantics are required against the SQL oracle.
    """
    r = np.asarray(ring, dtype=np.float64)
    if np.array_equal(r[0], r[-1]):
        r = r[:-1]
    n = len(r)
    inside = np.zeros(len(px), dtype=bool)
    x1, y1 = r[-1]
    for i in range(n):
        x2, y2 = r[i]
        cond = (y1 > py) != (y2 > py)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = (x2 - x1) * (py - y1) / (y2 - y1) + x1
        inside ^= cond & (px < xint)
        x1, y1 = x2, y2
    return inside


def pip_rings(px: np.ndarray, py: np.ndarray, rings: list[np.ndarray]) -> np.ndarray:
    """Even-odd PIP over a MULTI-RING polygon (exterior + holes, or a
    multipolygon): crossing parity accumulated over every ring's edges,
    so a point inside a hole toggles back to outside — the reference's
    JTS Polygon-with-interior-rings semantics
    (``core/geotime/.../store/query/filter/SpatialQueryFilter.java``
    delegating to JTS ``Polygon.contains``)."""
    inside = np.zeros(len(px), dtype=bool)
    for ring in rings:
        inside ^= pip_raycast(px, py, ring)
    return inside


def segments_cross(
    ax1, ay1, ax2, ay2, bx1, by1, bx2, by2
) -> np.ndarray:
    """Vectorized segment-pair intersection (inclusive of touching):
    AB and CD intersect iff C,D straddle line AB and A,B straddle line
    CD (orientation cross-product tests). All inputs broadcastable."""
    d1 = (ax2 - ax1) * (by1 - ay1) - (ay2 - ay1) * (bx1 - ax1)
    d2 = (ax2 - ax1) * (by2 - ay1) - (ay2 - ay1) * (bx2 - ax1)
    d3 = (bx2 - bx1) * (ay1 - by1) - (by2 - by1) * (ax1 - bx1)
    d4 = (bx2 - bx1) * (ay2 - by1) - (by2 - by1) * (ax2 - bx1)
    return (d1 * d2 <= 0) & (d3 * d4 <= 0)


def polyline_intersects_rings(
    xs: np.ndarray, ys: np.ndarray, rings: list[np.ndarray]
) -> bool:
    """LineString x polygon INTERSECTS: any vertex inside (even-odd
    over all rings) OR any line segment crossing any ring edge — the
    JTS ``Geometry.intersects`` decomposition for line/area
    (``analytics/spark/sparksql/udf/GeomIntersects.java`` role)."""
    if pip_rings(xs, ys, rings).any():
        return True
    sx1, sy1 = xs[:-1], ys[:-1]
    sx2, sy2 = xs[1:], ys[1:]
    for ring in rings:
        r = np.asarray(ring, dtype=np.float64)
        if np.array_equal(r[0], r[-1]):
            r = r[:-1]
        ex1, ey1 = r[:, 0], r[:, 1]
        ex2, ey2 = np.roll(r[:, 0], -1), np.roll(r[:, 1], -1)
        # (n_seg, n_edge) broadcast
        if segments_cross(
            sx1[:, None], sy1[:, None], sx2[:, None], sy2[:, None],
            ex1[None, :], ey1[None, :], ex2[None, :], ey2[None, :],
        ).any():
            return True
    return False


def ring_bbox(ring: np.ndarray) -> tuple[float, float, float, float]:
    r = np.asarray(ring, dtype=np.float64)
    return float(r[:, 0].min()), float(r[:, 1].min()), float(r[:, 0].max()), float(r[:, 1].max())


# ---------------------------------------------------------------------------
# distances
# ---------------------------------------------------------------------------

EARTH_RADIUS_M = 6_371_008.8


def haversine_m(lon1, lat1, lon2, lat2) -> np.ndarray:
    """Great-circle distance in meters (vectorized, broadcasts)."""
    rlon1, rlat1, rlon2, rlat2 = map(np.radians, (lon1, lat1, lon2, lat2))
    dlon = rlon2 - rlon1
    dlat = rlat2 - rlat1
    a = np.sin(dlat / 2.0) ** 2 + np.cos(rlat1) * np.cos(rlat2) * np.sin(dlon / 2.0) ** 2
    return 2.0 * EARTH_RADIUS_M * np.arcsin(np.sqrt(a))


def planar_sqdist(lon1, lat1, lon2, lat2) -> np.ndarray:
    """Squared planar distance in degrees^2 — uses only * - + so the SQL
    oracle reproduces it exactly (kNN ordering oracle)."""
    dx = lon2 - lon1
    dy = lat2 - lat1
    return dx * dx + dy * dy


# ---------------------------------------------------------------------------
# GridIndex — broadcast probe-side spatial index (STRtree stand-in)
# ---------------------------------------------------------------------------


class GridIndex:
    """Uniform-grid spatial index over a set of polygons.

    Built once (driver side or in an actor-pool ``__init__`` from a
    ``ray.put`` object ref) and probed per batch with
    :meth:`query_points`. Cells at ``tier`` bits/dim; each cell holds
    the ids of polygons whose bbox overlaps it.

    This plays the role the north rule assigns to "stateful actor pools
    hold R-tree/STRtree polygon indexes": build cost O(P * cells_per_poly),
    probe cost O(1) cell lookup + candidate PIP tests, fully vectorized
    per candidate polygon.
    """

    def __init__(self, rings: list[np.ndarray], tier: int = 7, convex: bool = True):
        from .sfc import grid_coords

        self.rings = [np.asarray(r, dtype=np.float64) for r in rings]
        self.tier = tier
        self.convex = convex
        # group rings by vertex count for pair-vectorized PIP: per k we
        # store stacked vertex arrays so the probe tests ALL candidate
        # (point, polygon) pairs of that k in one numpy expression
        # (no per-polygon python loop in the hot path)
        opened = []
        for r in self.rings:
            rr = r[:-1] if np.array_equal(r[0], r[-1]) else r
            opened.append(rr)
        self._k_of = np.array([len(rr) for rr in opened], dtype=np.int64)
        self._kidx = np.zeros(len(opened), dtype=np.int64)
        self._by_k: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        for k in np.unique(self._k_of):
            sel = np.nonzero(self._k_of == k)[0]
            self._kidx[sel] = np.arange(len(sel))
            rx = np.stack([opened[i][:, 0] for i in sel])
            ry = np.stack([opened[i][:, 1] for i in sel])
            self._by_k[int(k)] = (rx, ry)
        n = 1 << tier
        self.n = n
        buckets: dict[int, list[int]] = {}
        bboxes = np.array([ring_bbox(r) for r in self.rings], dtype=np.float64).reshape(-1, 4)
        self.bboxes = bboxes
        for pid in range(len(self.rings)):
            xmin, ymin, xmax, ymax = bboxes[pid]
            x0, y0 = grid_coords(np.array([xmin]), np.array([ymin]), tier)
            x1, y1 = grid_coords(np.array([xmax]), np.array([ymax]), tier)
            for cx in range(int(x0[0]), int(x1[0]) + 1):
                for cy in range(int(y0[0]), int(y1[0]) + 1):
                    buckets.setdefault(cx * n + cy, []).append(pid)
        # freeze to arrays for cheap serialization + lookup
        self._bucket_keys = np.array(sorted(buckets.keys()), dtype=np.int64)
        self._bucket_off = np.zeros(len(buckets) + 1, dtype=np.int64)
        vals = []
        for i, k in enumerate(self._bucket_keys):
            v = buckets[int(k)]
            vals.extend(v)
            self._bucket_off[i + 1] = len(vals)
        self._bucket_vals = np.array(vals, dtype=np.int64)

    def candidates(self, px: np.ndarray, py: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(point_idx, poly_id) candidate pairs from bucket lookup."""
        from .sfc import grid_coords

        cx, cy = grid_coords(px, py, self.tier)
        keys = cx * self.n + cy
        pos = np.searchsorted(self._bucket_keys, keys)
        pos = np.clip(pos, 0, len(self._bucket_keys) - 1)
        hit = self._bucket_keys[pos] == keys
        pt_idx = np.nonzero(hit)[0]
        if len(pt_idx) == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        starts = self._bucket_off[pos[pt_idx]]
        ends = self._bucket_off[pos[pt_idx] + 1]
        counts = ends - starts
        rep_pts = np.repeat(pt_idx, counts)
        # gather candidate poly ids
        idx = _ranges_concat(starts, ends)
        polys = self._bucket_vals[idx]
        return rep_pts, polys

    def query_points(self, px: np.ndarray, py: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """All (point_idx, poly_id) pairs where polygon contains point.

        Vectorized per candidate polygon: bbox prefilter then exact PIP.
        """
        rep_pts, polys = self.candidates(px, py)
        if len(rep_pts) == 0:
            return rep_pts, polys
        # bbox prefilter
        bb = self.bboxes[polys]
        m = (
            (px[rep_pts] >= bb[:, 0])
            & (px[rep_pts] <= bb[:, 2])
            & (py[rep_pts] >= bb[:, 1])
            & (py[rep_pts] <= bb[:, 3])
        )
        rep_pts, polys = rep_pts[m], polys[m]
        if len(rep_pts) == 0:
            return rep_pts, polys
        if not self.convex:
            # generic path: per-polygon ray casting
            out_mask = np.zeros(len(rep_pts), dtype=bool)
            order = np.argsort(polys, kind="stable")
            rep_pts_s, polys_s = rep_pts[order], polys[order]
            bounds = np.nonzero(np.diff(polys_s))[0] + 1
            starts = np.concatenate(([0], bounds))
            ends = np.concatenate((bounds, [len(polys_s)]))
            mask_s = np.zeros(len(rep_pts_s), dtype=bool)
            for s, e in zip(starts, ends):
                pid = int(polys_s[s])
                sel = slice(s, e)
                mask_s[sel] = pip_raycast(
                    px[rep_pts_s[sel]], py[rep_pts_s[sel]], self.rings[pid]
                )
            out_mask[order] = mask_s
            return rep_pts[out_mask], polys[out_mask]
        # convex path, pair-vectorized per vertex-count group: one edge
        # loop of length k over (npairs, ) arrays — identical per-edge
        # float expression as pip_convex, so results are bit-equal
        out_mask = np.zeros(len(rep_pts), dtype=bool)
        kk = self._k_of[polys]
        ppx = px[rep_pts]
        ppy = py[rep_pts]
        for k, (rx, ry) in self._by_k.items():
            gm = kk == k
            if not gm.any():
                continue
            li = self._kidx[polys[gm]]
            gx = ppx[gm]
            gy = ppy[gm]
            inside = np.ones(len(li), dtype=bool)
            for e in range(k):
                x1 = rx[li, e]
                y1 = ry[li, e]
                x2 = rx[li, (e + 1) % k]
                y2 = ry[li, (e + 1) % k]
                cross = (x2 - x1) * (gy - y1) - (y2 - y1) * (gx - x1)
                inside &= cross >= 0.0
            out_mask[np.nonzero(gm)[0]] = inside
        return rep_pts[out_mask], polys[out_mask]


def _ranges_concat(starts: np.ndarray, ends: np.ndarray) -> np.ndarray:
    """Concatenate np.arange(s, e) for each pair — vectorized.
    Empty ranges are dropped (they would silently corrupt the offset
    arithmetic below)."""
    counts = ends - starts
    nz = counts > 0
    starts, counts = starts[nz], counts[nz]
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    out = np.ones(total, dtype=np.int64)
    offs = np.concatenate(([0], np.cumsum(counts)[:-1]))
    out[offs] = starts
    out[offs[1:]] -= starts[:-1] + counts[:-1] - 1
    return np.cumsum(out)


# ---------------------------------------------------------------------------
# CRS transforms (pure math — the reference reprojects via GeoTools,
# FeatureDataAdapter.java:114-116; we support the EPSG:3857 web-mercator
# pair, which is closed-form)
# ---------------------------------------------------------------------------

_WEB_MERCATOR_R = 6_378_137.0


def to_web_mercator(lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """EPSG:4326 -> EPSG:3857 (meters). Latitudes clamped to the
    mercator-valid +-85.05112878 deg."""
    lat = np.clip(lat, -85.05112878, 85.05112878)
    x = np.radians(lon) * _WEB_MERCATOR_R
    y = np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0)) * _WEB_MERCATOR_R
    return x, y


def from_web_mercator(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    lon = np.degrees(x / _WEB_MERCATOR_R)
    lat = np.degrees(2.0 * np.arctan(np.exp(y / _WEB_MERCATOR_R)) - np.pi / 2.0)
    return lon, lat


# ---------------------------------------------------------------------------
# convex polygon-polygon intersection (SAT) — the areal-feature join
# predicate (GeomIntersects UDF, analytics/spark/sparksql/udf/)
# ---------------------------------------------------------------------------


def convex_intersects(a: np.ndarray, b: np.ndarray) -> bool:
    """Separating-axis test for two convex CCW rings (open or closed).

    Returns True iff the polygons intersect (touching counts)."""
    for ring, other in ((a, b), (b, a)):
        r = ring[:-1] if np.array_equal(ring[0], ring[-1]) else ring
        o = other[:-1] if np.array_equal(other[0], other[-1]) else other
        n = len(r)
        for i in range(n):
            ex = r[(i + 1) % n][0] - r[i][0]
            ey = r[(i + 1) % n][1] - r[i][1]
            # outward normal of a CCW edge is (ey, -ex)
            ax = r[:, 0] * ey - r[:, 1] * ex
            bx = o[:, 0] * ey - o[:, 1] * ex
            if bx.min() > ax.max() or ax.min() > bx.max():
                return False
    return True


def _open_ring(r: np.ndarray) -> np.ndarray:
    r = np.asarray(r, dtype=np.float64)
    return r[:-1] if np.array_equal(r[0], r[-1]) else r


def ring_area(ring: np.ndarray) -> float:
    """Signed shoelace area (positive for CCW)."""
    r = _open_ring(ring)
    if len(r) < 3:
        return 0.0
    x, y = r[:, 0], r[:, 1]
    return 0.5 * float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def convex_clip(subject: np.ndarray, clip: np.ndarray) -> np.ndarray:
    """Sutherland–Hodgman: clip ``subject`` by CONVEX CCW ``clip``.
    Returns the (possibly empty) intersection ring vertices."""
    out = [tuple(p) for p in _open_ring(subject)]
    c = _open_ring(clip)
    n = len(c)
    for i in range(n):
        if not out:
            return np.empty((0, 2))
        cx1, cy1 = c[i]
        cx2, cy2 = c[(i + 1) % n]
        ex, ey = cx2 - cx1, cy2 - cy1
        inp = out
        out = []
        sx, sy = inp[-1]
        cs = ex * (sy - cy1) - ey * (sx - cx1)
        for (px_, py_) in inp:
            cp = ex * (py_ - cy1) - ey * (px_ - cx1)
            if (cp >= 0.0) != (cs >= 0.0):
                t = cs / (cs - cp) if cs != cp else 0.0
                out.append((sx + t * (px_ - sx), sy + t * (py_ - sy)))
            if cp >= 0.0:
                out.append((px_, py_))
            sx, sy, cs = px_, py_, cp
    return np.array(out, dtype=np.float64).reshape(-1, 2)


_AREA_EPS = 1e-12


def convex_predicate(a: np.ndarray, b: np.ndarray, predicate: str) -> bool:
    """DE-9IM-style predicate matrix for two convex CCW polygons
    (boundary-inclusive containment; the GeomFunction UDF family,
    ``analytics/spark/sparksql/udf/GeomFunction.java:17-35``):

    intersects / disjoint / within / contains / covers / covered_by /
    equals / touches / overlaps / crosses (always False for area-area
    per DE-9IM).
    Interior-intersection is decided by the clipped-intersection AREA
    (zero => boundary-only contact)."""
    ao = _open_ring(a)
    bo = _open_ring(b)
    if predicate == "crosses":
        return False  # undefined (False) for area/area in DE-9IM
    inter = convex_intersects(ao, bo)
    if predicate == "intersects":
        return inter
    if predicate == "disjoint":
        return not inter
    within = bool(pip_convex(ao[:, 0], ao[:, 1], bo).all())
    contains = bool(pip_convex(bo[:, 0], bo[:, 1], ao).all())
    if predicate in ("within", "covered_by"):
        return within
    if predicate in ("contains", "covers"):
        return contains
    if predicate == "equals":
        return within and contains
    scale = max(abs(ring_area(ao)), abs(ring_area(bo)), 1.0)
    interior = (
        inter and abs(ring_area(convex_clip(ao, bo))) > _AREA_EPS * scale
    )
    if predicate == "touches":
        return inter and not interior
    if predicate == "overlaps":
        return interior and not within and not contains
    raise ValueError(f"unknown predicate {predicate!r}")


# ---------------------------------------------------------------------------
# general (concave / holed) polygon x polygon predicates
# ---------------------------------------------------------------------------


def _edges_arr(rings: list[np.ndarray]) -> np.ndarray:
    """(n_edges, 4) stacked directed edges (x1,y1,x2,y2) over all rings."""
    rows = []
    for ring in rings:
        r = _open_ring(ring)
        rows.append(
            np.column_stack([r[:, 0], r[:, 1], np.roll(r[:, 0], -1), np.roll(r[:, 1], -1)])
        )
    return np.concatenate(rows, axis=0)


def _seg_inter_masks(A: np.ndarray, B: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Inclusive and PROPER (strict-crossing) intersection masks for
    every edge pair — (nA, nB) booleans.

    The orientation-product test is exact for every configuration
    except all-four-cross-products-zero (collinear lines), which is
    resolved by 1-D bbox overlap on both axes."""
    ax1, ay1, ax2, ay2 = (A[:, k][:, None] for k in range(4))
    bx1, by1, bx2, by2 = (B[:, k][None, :] for k in range(4))
    d1 = (ax2 - ax1) * (by1 - ay1) - (ay2 - ay1) * (bx1 - ax1)
    d2 = (ax2 - ax1) * (by2 - ay1) - (ay2 - ay1) * (bx2 - ax1)
    d3 = (bx2 - bx1) * (ay1 - by1) - (by2 - by1) * (ax1 - bx1)
    d4 = (bx2 - bx1) * (ay2 - by1) - (by2 - by1) * (ax2 - bx1)
    proper = (d1 * d2 < 0) & (d3 * d4 < 0)
    incl = (d1 * d2 <= 0) & (d3 * d4 <= 0)
    collinear = (d1 == 0) & (d2 == 0) & (d3 == 0) & (d4 == 0)
    if collinear.any():
        ovl = (
            (np.maximum(ax1, ax2) >= np.minimum(bx1, bx2))
            & (np.minimum(ax1, ax2) <= np.maximum(bx1, bx2))
            & (np.maximum(ay1, ay2) >= np.minimum(by1, by2))
            & (np.minimum(ay1, ay2) <= np.maximum(by1, by2))
        )
        incl = np.where(collinear, ovl, incl)
    return incl, proper


def _points_on_edges(px: np.ndarray, py: np.ndarray, E: np.ndarray) -> np.ndarray:
    """True per point when it lies ON any edge of ``E`` (exact zero
    cross product + within the edge's bbox)."""
    x1, y1, x2, y2 = (E[:, k][None, :] for k in range(4))
    qx, qy = px[:, None], py[:, None]
    cross = (x2 - x1) * (qy - y1) - (y2 - y1) * (qx - x1)
    inbb = (
        (qx >= np.minimum(x1, x2)) & (qx <= np.maximum(x1, x2))
        & (qy >= np.minimum(y1, y2)) & (qy <= np.maximum(y1, y2))
    )
    return ((cross == 0) & inbb).any(axis=1)


def _ring_points_mids(rings: list[np.ndarray]) -> tuple[np.ndarray, np.ndarray]:
    """All vertices + edge midpoints of every ring (the probe set for
    strict-interior tests — midpoints catch boundary segments passing
    through the other polygon's interior between two on-boundary
    vertices)."""
    xs, ys = [], []
    for ring in rings:
        r = _open_ring(ring)
        xs.append(r[:, 0])
        ys.append(r[:, 1])
        xs.append((r[:, 0] + np.roll(r[:, 0], -1)) * 0.5)
        ys.append((r[:, 1] + np.roll(r[:, 1], -1)) * 0.5)
    return np.concatenate(xs), np.concatenate(ys)


def interior_point(rings: list[np.ndarray]) -> tuple[float, float]:
    """A point STRICTLY inside a polygon-with-holes: try ear centroids
    of the exterior ring (one must be interior for a simple polygon
    unless a hole covers it), then midpoints of vertex pairs, then a
    coarse bbox grid. Raises if nothing qualifies (degenerate input)."""
    ext = _open_ring(rings[0])
    E = _edges_arr(rings)
    n = len(ext)

    def ok(x: float, y: float) -> bool:
        px, py = np.array([x]), np.array([y])
        return bool(
            pip_rings(px, py, rings)[0] and not _points_on_edges(px, py, E)[0]
        )

    for i in range(n):
        cx = (ext[i - 1, 0] + ext[i, 0] + ext[(i + 1) % n, 0]) / 3.0
        cy = (ext[i - 1, 1] + ext[i, 1] + ext[(i + 1) % n, 1]) / 3.0
        if ok(cx, cy):
            return cx, cy
    for i in range(n):
        for j in range(i + 2, n):
            mx = (ext[i, 0] + ext[j, 0]) * 0.5
            my = (ext[i, 1] + ext[j, 1]) * 0.5
            if ok(mx, my):
                return mx, my
    x0, y0, x1, y1 = ring_bbox(ext)
    for gx in np.linspace(x0, x1, 23)[1:-1]:
        for gy in np.linspace(y0, y1, 23)[1:-1]:
            if ok(float(gx), float(gy)):
                return float(gx), float(gy)
    raise ValueError("no interior point found (degenerate polygon)")


def general_predicate(
    a_rings: list[np.ndarray] | np.ndarray,
    b_rings: list[np.ndarray] | np.ndarray,
    predicate: str,
) -> bool:
    """DE-9IM-style predicate matrix for ARBITRARY simple polygons —
    concave rings and interior holes included (ring[0] = exterior,
    ring[1:] = holes; a bare (N,2) array is treated as one exterior
    ring). The reference's JTS-backed GeomFunction family
    (``analytics/spark/sparksql/udf/GeomFunction.java:17-35``,
    ``core/geotime/.../filter/SpatialQueryFilter.java:37-158``).

    Same semantics as :func:`convex_predicate` (boundary-inclusive
    containment; within == covered_by, contains == covers;
    crosses == False for area/area):

    - boundary intersection: exact vectorized segment-pair tests
      (inclusive + proper-crossing variants, collinear overlap exact);
    - containment A ⊆ B: no proper crossing, every A vertex AND edge
      midpoint inside-or-on B, no B vertex/midpoint strictly inside A
      (guards B's hole ring passing through A's interior), and a
      representative interior point of A strictly inside B (guards A
      sitting inside a hole of B);
    - interiors-intersect: any proper crossing, any vertex/midpoint of
      one strictly inside the other, or either containment.

    Exactness caveat: points lying ON a boundary are detected by exact
    zero cross products — exact for coordinates where the products are
    representable (lattice/test fixtures), best-effort for arbitrary
    floats; a tangential graze whose contact set contains no vertex or
    edge midpoint of either polygon can misclassify touches vs
    overlaps (measure-zero configurations; JTS uses exact arithmetic
    here)."""
    if isinstance(a_rings, np.ndarray):
        a_rings = [a_rings]
    if isinstance(b_rings, np.ndarray):
        b_rings = [b_rings]
    if predicate == "crosses":
        return False  # undefined (False) for area/area in DE-9IM
    A = _edges_arr(a_rings)
    B = _edges_arr(b_rings)
    incl, proper = _seg_inter_masks(A, B)
    boundary = bool(incl.any())
    proper_any = bool(proper.any())

    apx, apy = _ring_points_mids(a_rings)
    bpx, bpy = _ring_points_mids(b_rings)
    a_par = pip_rings(apx, apy, b_rings)
    b_par = pip_rings(bpx, bpy, a_rings)
    a_on = _points_on_edges(apx, apy, B)
    b_on = _points_on_edges(bpx, bpy, A)
    a_strict = a_par & ~a_on
    b_strict = b_par & ~b_on

    inter = boundary or bool(a_strict.any()) or bool(b_strict.any())
    if predicate == "intersects":
        return inter
    if predicate == "disjoint":
        return not inter

    def contained(
        p_par: np.ndarray, p_on: np.ndarray, q_strict: np.ndarray,
        inner: list[np.ndarray], outer: list[np.ndarray],
    ) -> bool:
        if proper_any or not np.all(p_par | p_on) or q_strict.any():
            return False
        sx, sy = interior_point(inner)
        px, py = np.array([sx]), np.array([sy])
        return bool(pip_rings(px, py, outer)[0])

    within = contained(a_par, a_on, b_strict, a_rings, b_rings)
    contains = contained(b_par, b_on, a_strict, b_rings, a_rings)
    if predicate in ("within", "covered_by"):
        return within
    if predicate in ("contains", "covers"):
        return contains
    if predicate == "equals":
        return within and contains
    interiors = (
        proper_any or bool(a_strict.any()) or bool(b_strict.any())
        or within or contains
    )
    if predicate == "touches":
        return inter and not interiors
    if predicate == "overlaps":
        return interiors and not within and not contains
    raise ValueError(f"unknown predicate {predicate!r}")


def clamp_precision(ring: np.ndarray, decimals: int = 6) -> np.ndarray:
    """TWKB-style coordinate precision clamp
    (``core/geotime/.../util/TWKBWriter.java`` /
    ``GeometryUtils.java:408-414``): round to a fixed decimal
    precision so geometry compare/hash is normalization-stable (the
    reference's test oracle hashes centroids after a TWKB round trip,
    ``TestUtils.java:544-550``)."""
    return np.round(np.asarray(ring, dtype=np.float64), decimals)


def ring_measures_q(
    rings: list[np.ndarray], x0: float, y0: float, scale: float = 1e4
) -> tuple[int, int, int, int]:
    """Quantized-integer shoelace measures over a ring set (exterior
    CCW, holes CW subtract via the signed sum) — the scalar half of the
    reference's GeomFunction UDF family (ST_Area / ST_Centroid /
    perimeter roles, ``analytics/spark/sparksql/udf/GeomFunction.java``
    + ``GeometryUtils.java``). Coordinates snap to ``1/scale`` relative
    to the declared origin ``(x0, y0)``, then everything is EXACT int64
    arithmetic — sums are order-independent, so a SQL oracle over the
    unordered edge table reproduces each value bit-for-bit (the same
    fixed-precision model as the TWKB codec).

    Returns (area2, cx_num, cy_num, perim_u):
      area  = area2 / (2*scale^2)
      cx    = x0 + cx_num / (3*area2) / scale   (same for cy)
      perim = perim_u / 1e6  (per-edge sqrt rounded to integer
              micro-units BEFORE the sum, keeping the sum order-free)
    """
    area2 = 0
    cxn = 0
    cyn = 0
    perim = 0
    for ring in rings:
        r = np.asarray(ring, dtype=np.float64)
        if len(r) < 3:
            continue
        nxt = np.roll(r, -1, axis=0)
        qx1 = np.floor((r[:, 0] - x0) * scale + 0.5).astype(np.int64)
        qy1 = np.floor((r[:, 1] - y0) * scale + 0.5).astype(np.int64)
        qx2 = np.roll(qx1, -1)
        qy2 = np.roll(qy1, -1)
        cross = qx1 * qy2 - qx2 * qy1
        area2 += int(cross.sum())
        cxn += int(((qx1 + qx2) * cross).sum())
        cyn += int(((qy1 + qy2) * cross).sum())
        dx = nxt[:, 0] - r[:, 0]
        dy = nxt[:, 1] - r[:, 1]
        perim += int(
            np.floor(np.sqrt(dx * dx + dy * dy) * 1e6 + 0.5).astype(np.int64).sum()
        )
    return area2, cxn, cyn, perim


# ---------------------------------------------------------------------------
# buffer (BufferOperation role)
# ---------------------------------------------------------------------------

# CCW regular-octagon unit offsets starting at angle 0. Built from
# sqrt(0.5) only (sqrt is IEEE correctly-rounded, unlike sin/cos), so
# a SQL oracle computing `sqrt(0.5)` reproduces every vertex float
# bit-for-bit.
_OCT_S = float(np.sqrt(0.5))
OCTAGON_OFFSETS = (
    (1.0, 0.0), (_OCT_S, _OCT_S), (0.0, 1.0), (-_OCT_S, _OCT_S),
    (-1.0, 0.0), (-_OCT_S, -_OCT_S), (0.0, -1.0), (_OCT_S, -_OCT_S),
)


def buffer_points_octagon(
    lon: np.ndarray, lat: np.ndarray, radius: float
) -> np.ndarray:
    """Octagonal point buffer (``analytics/spark/sparksql/udf/
    BufferOperation.java`` / JTS ``Geometry.buffer`` with
    quadrantSegments=2): returns (n, 8, 2) CCW rings. The octagon is
    INSCRIBED in the radius circle (vertices exactly at distance
    ``radius``), matching JTS's vertex placement."""
    lon = np.asarray(lon, np.float64)
    lat = np.asarray(lat, np.float64)
    out = np.empty((len(lon), 8, 2), np.float64)
    for k, (ox, oy) in enumerate(OCTAGON_OFFSETS):
        out[:, k, 0] = lon + radius * ox
        out[:, k, 1] = lat + radius * oy
    return out


def buffer_convex_ring(ring: np.ndarray, radius: float) -> np.ndarray:
    """Minkowski sum of a CONVEX CCW ring with the CCW octagon — the
    exact octagonal buffer of a convex polygon (concave inputs raise;
    the reference delegates those to JTS's full arc machinery, out of
    scope here). Standard convex Minkowski: merge the two edge
    sequences by polar angle; O(n + 8) vertices."""
    r = _open_ring(np.asarray(ring, np.float64))
    e = np.roll(r, -1, axis=0) - r
    ang = np.arctan2(e[:, 1], e[:, 0])
    if len(r) >= 3:
        cross = np.cross(e, np.roll(e, -1, axis=0))
        if (cross < 0).any():
            raise ValueError("buffer_convex_ring requires a convex CCW ring")
    oct_pts = np.array(OCTAGON_OFFSETS) * radius
    oe = np.roll(oct_pts, -1, axis=0) - oct_pts
    oang = np.arctan2(oe[:, 1], oe[:, 0])
    # start both sequences at their lowest-angle edge, then merge
    i0 = int(np.argmin(ang))
    j0 = int(np.argmin(oang))
    pi, pj = i0, j0
    # starting vertex: polygon's start vertex + octagon vertex whose
    # OUTGOING edge is the first octagon edge in the merge
    verts = []
    cur = r[i0] + oct_pts[j0]
    n, m = len(r), 8
    ti, tj = 0, 0
    while ti < n or tj < m:
        # each rotated sequence has increasing absolute angles, so a
        # plain two-pointer merge on angle interleaves the edges
        ai = ang[pi % n] if ti < n else np.inf
        aj = oang[pj % m] if tj < m else np.inf
        verts.append(cur.copy())
        if ai <= aj:
            cur = cur + e[pi % n]
            pi += 1
            ti += 1
        else:
            cur = cur + oe[pj % m]
            pj += 1
            tj += 1
    return np.asarray(verts)
