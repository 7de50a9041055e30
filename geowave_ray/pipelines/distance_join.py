"""Within-distance join (the reference's GeomWithinDistance predicate,
``analytics/spark/sparksql/udf/GeomWithinDistance.java:13-43`` — used
by GeoWaveSparkSpatialJoinIT with radius 0.01).

Shape: broadcast the (small) probe point set with each probe's cell
cover EXPANDED by the radius (the buffer-expansion of
``GeoWaveIndexedRDD.getIndexedGeometryRDD``), filter pages to
candidate cells, exact vectorized distance test. Planar degrees for
the SQL-checked path; haversine meters available.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..geom import haversine_m, planar_sqdist
from ..sfc import grid_coords


def within_distance_join(
    pages: ray.data.Dataset,
    probes: pa.Table,
    radius_deg: float,
    metric: str = "planar",
    probe_id_col: str = "query_id",
    keep_col: str = "url",
    tier: int | None = None,
) -> ray.data.Dataset:
    """-> (probe_id, url) for every page within radius of a probe.

    ``radius_deg`` is in degrees for the planar metric (matches the
    reference IT's degree-radius joins), meters for haversine.
    """
    qids = np.asarray(probes[probe_id_col].to_pylist(), dtype=object)
    qlon = probes["lon"].to_numpy()
    qlat = probes["lat"].to_numpy()
    if tier is None:
        # finest tier whose cell is wider than the radius, so the 3x3
        # ring around a probe's cell covers its disk
        tier = max(1, int(np.floor(np.log2(360.0 / max(radius_deg, 1e-9)))) )
        tier = min(tier, 14)
    n = 1 << tier
    state_ref = ray.put({"qids": qids, "qlon": qlon, "qlat": qlat})

    # candidate cells = cells overlapping each probe's bbox (radius pad)
    wanted = set()
    for i in range(len(qlon)):
        x0, y0 = grid_coords(
            np.array([qlon[i] - radius_deg]), np.array([qlat[i] - radius_deg]), tier
        )
        x1, y1 = grid_coords(
            np.array([qlon[i] + radius_deg]), np.array([qlat[i] + radius_deg]), tier
        )
        for cx in range(int(x0[0]), int(x1[0]) + 1):
            for cy in range(int(y0[0]), int(y1[0]) + 1):
                wanted.add(cx * n + cy)
    wanted_ref = ray.put(np.array(sorted(wanted), dtype=np.int64))

    from ..util import cached_state

    key = ("wdist", state_ref.hex(), radius_deg, metric, tier)

    def probe_batch(batch: pa.Table) -> pa.Table:
        st = cached_state(key + ("s",), state_ref)
        w = cached_state(key + ("w",), wanted_ref)
        lon = batch.column("lon").to_numpy()
        lat = batch.column("lat").to_numpy()
        cx, cy = grid_coords(lon, lat, tier)
        cells = cx * n + cy
        pos = np.searchsorted(w, cells)
        pos = np.clip(pos, 0, max(0, len(w) - 1))
        m = (w[pos] == cells) if len(w) else np.zeros(len(lon), bool)
        if not m.any():
            return pa.table(
                {
                    probe_id_col: pa.array([], pa.string()),
                    keep_col: pa.array([], pa.string()),
                }
            )
        lon_m, lat_m = lon[m], lat[m]
        keep_vals = batch.column(keep_col).filter(pa.array(m))
        if metric == "haversine":
            d = haversine_m(
                lon_m[None, :], lat_m[None, :], st["qlon"][:, None], st["qlat"][:, None]
            )
            hit = d <= radius_deg  # radius in meters for this metric
        else:
            d = planar_sqdist(
                st["qlon"][:, None], st["qlat"][:, None], lon_m[None, :], lat_m[None, :]
            )
            hit = d <= radius_deg * radius_deg
        qi, pi = np.nonzero(hit)
        return pa.table(
            {
                probe_id_col: pa.array(st["qids"][qi].tolist(), pa.string()),
                keep_col: keep_vals.take(pa.array(pi)),
            }
        )

    return pages.map_batches(probe_batch, batch_format="pyarrow", batch_size=4096)


def sample_weighted(
    ds: ray.data.Dataset,
    weight_col: str,
    n: int,
    seed: int = 42,
    id_col: str = "url",
) -> ray.data.Dataset:
    """Deterministic weighted sampling without replacement
    (Efraimidis–Spirakis A-Res with a hash-derived uniform — the
    reference's sampling fns ``analytics/api/.../sample/``): key =
    u^(1/w) with u = hash(id, seed); global top-n by key.

    Shuffle-free: per-batch partial top-n then a two-level merge.
    """
    from ..agg import grouped_topk
    from ..hashing import hash_utf8, mix64

    def keyed(batch: pa.Table) -> pa.Table:
        w = batch.column(weight_col).to_numpy().astype(np.float64)
        # deterministic per-id uniform: vectorized column hash mixed
        # with the seed (replaces the per-row blake2b loop)
        h = mix64(hash_utf8(batch.column(id_col)) ^ mix64(np.uint64(seed)))
        u = h.astype(np.float64) / 2.0**64
        with np.errstate(divide="ignore"):
            k = np.where(w > 0, u ** (1.0 / np.maximum(w, 1e-300)), -1.0)
        t = batch.append_column("_skey", pa.array(-k, pa.float64()))
        # keep only the local top-n (smallest -k)
        if t.num_rows > n:
            neg = -k
            thr = np.partition(neg, n - 1)[n - 1]
            t = t.filter(pa.array(neg <= thr))
        return t.append_column("_g", pa.array(np.zeros(t.num_rows, np.int8)))

    partials = ds.map_batches(keyed, batch_format="pyarrow", batch_size=None)
    out = grouped_topk(
        partials,
        group_col="_g",
        sort_cols=["_skey", id_col],
        ascending=[True, True],
        k_of=lambda g: n,
        out_cols=[id_col, weight_col],
    )
    return out.select_columns([id_col, weight_col, "rank"])


def boundary_distance_join(
    points: ray.data.Dataset,
    regions: pa.Table,
    point_id_col: str = "query_id",
) -> ray.data.Dataset:
    """Nearest region under TRUE polygon distance (GeomDistance UDF
    role, ``analytics/spark/sparksql/udf/GeomDistance.java`` / JTS
    ``Geometry.distance``): 0 when the point is inside, else the min
    point-to-segment distance over the boundary. Ties break to the
    smallest region_id.

    Exactness contract: every per-pair value is one fixed IEEE
    expression tree (identical in the SQL oracle), and the only
    reductions are min/argmin — order-free — so results hash-match
    without rounding.

    Scale shape: the region side is the small side (same assumption as
    the broadcast PIP join); its edge arrays ship once via ``ray.put``
    and every point batch does pure vectorized P x E work, segment-
    reduced per region with ``np.minimum.reduceat`` — no Python loop
    over points, regions, or edges.
    """
    from ..formats import wkb_decode

    rids = regions["region_id"].to_pylist()
    order = np.argsort(np.asarray(rids, dtype=object), kind="stable")
    rids = [rids[i] for i in order]
    ax_l, ay_l, bx_l, by_l, seg_starts = [], [], [], [], [0]
    bxmin, bymin, bxmax, bymax = [], [], [], []
    n_edges = 0
    for i in order:
        t, rings = wkb_decode(regions["geometry_wkb"][int(i)].as_py())
        if t != "Polygon":
            raise ValueError(f"boundary_distance_join needs polygons, got {t}")
        ring = np.asarray(rings[0], dtype=np.float64)  # closed (first == last)
        ax_l.append(ring[:-1, 0])
        ay_l.append(ring[:-1, 1])
        bx_l.append(ring[1:, 0])
        by_l.append(ring[1:, 1])
        n_edges += len(ring) - 1
        seg_starts.append(n_edges)
        bxmin.append(ring[:, 0].min())
        bymin.append(ring[:, 1].min())
        bxmax.append(ring[:, 0].max())
        bymax.append(ring[:, 1].max())
    state = ray.put(
        {
            "ax": np.concatenate(ax_l),
            "ay": np.concatenate(ay_l),
            "bx": np.concatenate(bx_l),
            "by": np.concatenate(by_l),
            "starts": np.asarray(seg_starts[:-1], dtype=np.int64),
            "rids": np.asarray(rids, dtype=object),
            "bxmin": np.asarray(bxmin),
            "bymin": np.asarray(bymin),
            "bxmax": np.asarray(bxmax),
            "bymax": np.asarray(bymax),
        }
    )

    def fn(batch: pa.Table) -> pa.Table:
        s = ray.get(state)
        ax, ay, bx, by = s["ax"], s["ay"], s["bx"], s["by"]
        starts = s["starts"]
        px = batch.column("lon").to_numpy()[:, None]
        py = batch.column("lat").to_numpy()[:, None]
        dxe = bx - ax
        dye = by - ay
        L2 = dxe * dxe + dye * dye
        t = ((px - ax) * dxe + (py - ay) * dye) / L2
        tc = np.clip(t, 0.0, 1.0)
        cx = ax + tc * dxe
        cy = ay + tc * dye
        d = np.sqrt((px - cx) * (px - cx) + (py - cy) * (py - cy))  # P x E
        # per-(point, region) min over that region's edge span
        dreg = np.minimum.reduceat(d, starts, axis=1)  # P x R
        # inside test (convex fixture rings are CCW): bool_and of edge
        # cross signs over the span, bbox-gated exactly like the oracle
        cross = dxe * (py - ay) - dye * (px - ax)
        inside = np.logical_and.reduceat(cross >= 0.0, starts, axis=1)
        inbox = (
            (px >= s["bxmin"]) & (px <= s["bxmax"])
            & (py >= s["bymin"]) & (py <= s["bymax"])
        )
        dist = np.where(inside & inbox, 0.0, dreg)
        j = np.argmin(dist, axis=1)  # first min = smallest region_id
        rows = np.arange(len(j))
        return pa.table(
            {
                point_id_col: batch.column(point_id_col),
                "nearest_region": pa.array(s["rids"][j]),
                "dist": pa.array(dist[rows, j], pa.float64()),
            }
        )

    return points.map_batches(fn, batch_format="pyarrow", batch_size=None)
