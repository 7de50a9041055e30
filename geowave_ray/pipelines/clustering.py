"""Clustering analytics: KMeans and DBSCAN over point Datasets.

Reference analogues:
- KMeans: ``analytics/spark/kmeans/KMeansRunner.java:107-230`` (load →
  feature vectors → KMeans → centroids + hulls). Ray-Data shape:
  Lloyd's iterations where each step is one ``map_batches`` pass
  emitting per-centroid partial sums (combiner) merged on the driver —
  centroids are tiny, the data streams. Deterministic seeded init so
  N-CPU and 4N-CPU runs agree.
- DBSCAN: ``analytics/mapreduce/dbscan/DBScanMapReduce.java`` (NN
  partitioning + per-partition cluster merge). Ray-Data shape:
  neighbor-ring cell duplication → per-cell density core detection →
  driver union-find over the (bounded) core-cell adjacency.
- Verification model: ``GeoWaveSparkKMeansIT.java:107-168`` asserts
  every point's assigned centroid is the true nearest — our pytest
  does the same.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..sfc import grid_coords


def _init_centroids(k: int, seed: int = 42) -> np.ndarray:
    """Deterministic spread-out init: seeded hash points on the globe."""
    import hashlib

    pts = []
    for i in range(k):
        h = hashlib.sha256(f"centroid{seed}.{i}".encode()).digest()
        lon = (int.from_bytes(h[0:8], "big") / 2**64) * 360 - 180
        lat = (int.from_bytes(h[8:16], "big") / 2**64) * 180 - 90
        pts.append((lon, lat))
    return np.array(pts, dtype=np.float64)


def kmeans(
    points: ray.data.Dataset,
    k: int = 8,
    n_iter: int = 8,
    seed: int = 42,
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> tuple[np.ndarray, ray.data.Dataset]:
    """Lloyd's KMeans; returns (centroids (k,2), assignment Dataset).

    Each iteration is ONE streaming pass: per batch, assign points to
    the nearest centroid (vectorized (k, n) distance) and emit k rows
    of (sum_lon, sum_lat, count) partials; driver merges and updates.
    Shuffle-free — the reduction payload is k rows per batch.
    """
    centroids = _init_centroids(k, seed)

    for _ in range(n_iter):
        cref = ray.put(centroids)

        def partial(batch: pa.Table) -> pa.Table:
            c = ray.get(cref)
            lon = batch.column(lon_col).to_numpy()
            lat = batch.column(lat_col).to_numpy()
            d = (lon[None, :] - c[:, 0:1]) ** 2 + (lat[None, :] - c[:, 1:2]) ** 2
            a = np.argmin(d, axis=0)
            sums_lon = np.zeros(len(c))
            sums_lat = np.zeros(len(c))
            counts = np.zeros(len(c), dtype=np.int64)
            np.add.at(sums_lon, a, lon)
            np.add.at(sums_lat, a, lat)
            np.add.at(counts, a, 1)
            return pa.table(
                {
                    "cid": pa.array(np.arange(len(c)), pa.int64()),
                    "slon": pa.array(sums_lon, pa.float64()),
                    "slat": pa.array(sums_lat, pa.float64()),
                    "n": pa.array(counts, pa.int64()),
                }
            )

        parts = points.map_batches(
            partial, batch_format="pyarrow", batch_size=None
        ).to_pandas()
        agg = parts.groupby("cid").sum()
        new = centroids.copy()
        for cid, row in agg.iterrows():
            if row["n"] > 0:
                new[int(cid)] = (row["slon"] / row["n"], row["slat"] / row["n"])
        if np.allclose(new, centroids, atol=1e-12):
            centroids = new
            break
        centroids = new

    cref = ray.put(centroids)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        lon = batch.column(lon_col).to_numpy()
        lat = batch.column(lat_col).to_numpy()
        d = (lon[None, :] - c[:, 0:1]) ** 2 + (lat[None, :] - c[:, 1:2]) ** 2
        a = np.argmin(d, axis=0)
        return batch.append_column("cluster", pa.array(a.astype(np.int64), pa.int64()))

    return centroids, points.map_batches(
        assign, batch_format="pyarrow", batch_size=None
    )


def convex_hulls(assigned: ray.data.Dataset, lon_col="lon", lat_col="lat") -> dict[int, np.ndarray]:
    """Per-cluster convex hull (KMeansHullGenerator analogue):
    per-batch partial hulls (monotone chain), merged on the driver."""

    def partial(batch: pa.Table) -> pa.Table:
        lon = batch.column(lon_col).to_numpy()
        lat = batch.column(lat_col).to_numpy()
        cl = batch.column("cluster").to_numpy()
        out_c, out_x, out_y = [], [], []
        for c in np.unique(cl):
            m = cl == c
            hull = _hull(np.column_stack([lon[m], lat[m]]))
            out_c.extend([int(c)] * len(hull))
            out_x.extend(hull[:, 0].tolist())
            out_y.extend(hull[:, 1].tolist())
        return pa.table(
            {
                "cluster": pa.array(out_c, pa.int64()),
                "x": pa.array(out_x, pa.float64()),
                "y": pa.array(out_y, pa.float64()),
            }
        )

    parts = assigned.map_batches(partial, batch_format="pyarrow", batch_size=None).to_pandas()
    hulls = {}
    for c, sub in parts.groupby("cluster"):
        hulls[int(c)] = _hull(sub[["x", "y"]].to_numpy())
    return hulls


def _hull(pts: np.ndarray) -> np.ndarray:
    """Andrew's monotone chain convex hull (CCW)."""
    pts = np.unique(pts, axis=0)
    if len(pts) <= 2:
        return pts
    order = np.lexsort((pts[:, 1], pts[:, 0]))
    pts = pts[order]

    def half(points):
        out = []
        for p in points:
            while len(out) >= 2 and np.cross(out[-1] - out[-2], p - out[-2]) <= 0:
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    return np.array(lower[:-1] + upper[:-1])


def dbscan(
    points: ray.data.Dataset,
    eps: float = 0.05,
    min_pts: int = 10,
    lon_col: str = "lon",
    lat_col: str = "lat",
    id_col: str = "url",
) -> ray.data.Dataset:
    """Grid DBSCAN: cells of size eps; a point's neighbors live in its
    3x3 cell ring. Per-cell counts find core CELLS (dense grid cells);
    adjacent core cells union into clusters (driver union-find over
    the bounded core-cell set); member points inherit the cluster of
    any core cell in their ring, else -1 (noise).

    This is the density-grid approximation of DBSCAN (neighborhoods
    quantized to cells) — deterministic and shuffle-light: one
    aggregate pass + one assignment pass.
    """
    from ..agg import tree_aggregate
    from ..sfc import LON_MAX, LON_MIN

    tier = int(np.floor(np.log2((LON_MAX - LON_MIN) / eps)))
    n = 1 << tier

    def cells(batch: pa.Table) -> pa.Table:
        cx, cy = grid_coords(
            batch.column(lon_col).to_numpy(), batch.column(lat_col).to_numpy(), tier
        )
        key = cx * np.int64(n) + cy
        ks, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {"cell": pa.array(ks, pa.int64()), "n": pa.array(cnt.astype(np.int64), pa.int64())}
        )

    hist = tree_aggregate(
        points.map_batches(cells, batch_format="pyarrow", batch_size=None),
        ["cell"],
        {"n": "sum"},
    ).to_pandas()
    cells_arr = hist["cell"].to_numpy()
    order = np.argsort(cells_arr)
    cells_arr = cells_arr[order]
    n_arr = hist["n"].to_numpy()[order]

    # core cells: 3x3 ring density >= min_pts (vectorized ring sum via
    # searchsorted over the sorted cell histogram)
    hx, hy = cells_arr // n, cells_arr % n
    ring = np.zeros(len(cells_arr), dtype=np.int64)
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            # grid edges do not wrap: an offset leaving [0, n) must not
            # alias a cell on the opposite edge of the adjacent column
            valid = (hx + dx >= 0) & (hx + dx < n) & (hy + dy >= 0) & (hy + dy < n)
            key = (hx + dx) * np.int64(n) + (hy + dy)
            pos = np.searchsorted(cells_arr, key)
            pos = np.clip(pos, 0, len(cells_arr) - 1)
            hit = (cells_arr[pos] == key) & valid
            ring += np.where(hit, n_arr[pos], 0)
    core = cells_arr[ring >= min_pts].tolist()
    # union-find over adjacent core cells
    parent = {c: c for c in core}

    def find(c):
        while parent[c] != c:
            parent[c] = parent[parent[c]]
            c = parent[c]
        return c

    core_set = set(core)
    for cell in core:
        cx, cy = cell // n, cell % n
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if not (0 <= cx + dx < n and 0 <= cy + dy < n):
                    continue
                nb = (cx + dx) * n + (cy + dy)
                if nb in core_set and nb != cell:
                    ra, rb = find(cell), find(nb)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
    core_sorted = np.array(sorted(core), dtype=np.int64)
    core_labels = np.array([find(c) for c in core_sorted], dtype=np.int64)
    lref = ray.put((core_sorted, core_labels, tier, n))

    def assign(batch: pa.Table) -> pa.Table:
        cells_arr, labels_arr, t, nn = ray.get(lref)
        cx, cy = grid_coords(
            batch.column(lon_col).to_numpy(), batch.column(lat_col).to_numpy(), t
        )
        lab = np.full(len(cx), np.iinfo(np.int64).max, dtype=np.int64)
        # vectorized 3x3 ring lookup via searchsorted on the sorted
        # core-cell array; min label over matching neighbor cells
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if len(cells_arr) == 0:
                    continue
                valid = (cx + dx >= 0) & (cx + dx < nn) & (cy + dy >= 0) & (cy + dy < nn)
                key = (cx + dx) * np.int64(nn) + (cy + dy)
                pos = np.searchsorted(cells_arr, key)
                pos = np.clip(pos, 0, len(cells_arr) - 1)
                hit = (cells_arr[pos] == key) & valid
                lab[hit] = np.minimum(lab[hit], labels_arr[pos[hit]])
        lab[lab == np.iinfo(np.int64).max] = -1
        return pa.table(
            {
                id_col: batch.column(id_col),
                "cluster": pa.array(lab, pa.int64()),
            }
        )

    return points.map_batches(assign, batch_format="pyarrow", batch_size=None)
