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


def kmeans_parallel_init(
    points: ray.data.Dataset,
    k: int,
    rounds: int = 3,
    oversample: float = 2.0,
    seed: int = 42,
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> np.ndarray:
    """k-means|| initialization (Bahman et al., "Scalable k-means++",
    VLDB 2012) — the reference's weighted sampling init
    (``analytics/api/.../sample/BahmanEtAlSampleProbabilityFn.java:21-26``:
    p(x) = sampleSize * d^2(x,C) / phi, driven by
    ``KSamplerMapReduce``/``KMeansParallelInitialize``).

    Each round is one streaming pass: points sample themselves into
    the candidate set with probability l*d^2(x,C)/phi using a
    DETERMINISTIC per-point hash draw (splitmix of lon/lat bits x
    round), so any parallelism yields the same candidates. Candidates
    (O(l*rounds), tiny) are then weighted by a nearest-candidate count
    pass and reduced to k centroids with weighted k-means++ on the
    driver.
    """
    from ..hashing import mix64

    ell = max(int(oversample * k), 1)
    # first center: deterministic hash point (same rule as _init_centroids)
    centers = _init_centroids(1, seed)

    def dist2_min(lon, lat, c):
        return ((lon[None, :] - c[:, 0:1]) ** 2 + (lat[None, :] - c[:, 1:2]) ** 2).min(
            axis=0
        )

    def draw(lon, lat, rnd):
        """Per-point uniform [0,1) from coordinate bits (deterministic)."""
        salt = np.uint64((rnd * 0x9E3779B97F4A7C15) % (1 << 64))
        bits = lon.view(np.uint64) ^ mix64(lat.view(np.uint64) + salt)
        return mix64(bits).astype(np.float64) / 2.0**64

    for rnd in range(rounds):
        cref = ray.put(centers)

        def phi_pass(batch: pa.Table) -> pa.Table:
            c = ray.get(cref)
            lon = batch.column(lon_col).to_numpy()
            lat = batch.column(lat_col).to_numpy()
            return pa.table({"phi": pa.array([float(dist2_min(lon, lat, c).sum())])})

        phi = (
            points.map_batches(phi_pass, batch_format="pyarrow", batch_size=None)
            .sum("phi")
        )
        if phi <= 0:
            break

        def sample_pass(batch: pa.Table, rnd=rnd, phi=phi) -> pa.Table:
            c = ray.get(cref)
            lon = batch.column(lon_col).to_numpy()
            lat = batch.column(lat_col).to_numpy()
            p = ell * dist2_min(lon, lat, c) / phi
            sel = draw(lon, lat, rnd) < p
            return pa.table(
                {"clon": pa.array(lon[sel]), "clat": pa.array(lat[sel])}
            )

        new = points.map_batches(
            sample_pass, batch_format="pyarrow", batch_size=None
        ).to_pandas()
        if len(new):
            cand = new[["clon", "clat"]].to_numpy()
            # canonical order: the collect arrives in block order, which
            # depends on parallelism — sort so results are identical at
            # any block count
            cand = cand[np.lexsort((cand[:, 1], cand[:, 0]))]
            centers = np.vstack([centers, cand])

    # weight candidates by nearest-point counts (one pass, k-bounded)
    cref = ray.put(centers)

    def weight_pass(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        lon = batch.column(lon_col).to_numpy()
        lat = batch.column(lat_col).to_numpy()
        d = (lon[None, :] - c[:, 0:1]) ** 2 + (lat[None, :] - c[:, 1:2]) ** 2
        a = np.argmin(d, axis=0)
        w = np.zeros(len(c), np.int64)
        np.add.at(w, a, 1)
        return pa.table(
            {"cid": pa.array(np.arange(len(c)), pa.int64()), "w": pa.array(w)}
        )

    wdf = (
        points.map_batches(weight_pass, batch_format="pyarrow", batch_size=None)
        .groupby("cid")
        .sum("w")
        .to_pandas()
        .sort_values("cid")
    )
    weights = wdf["sum(w)"].to_numpy().astype(np.float64)

    # weighted k-means++ over the candidate set (driver; candidates are
    # O(oversample * k * rounds))
    if len(centers) <= k:
        return centers
    chosen = [int(np.argmax(weights))]
    d2 = ((centers - centers[chosen[0]]) ** 2).sum(axis=1)
    for i in range(1, k):
        score = weights * d2
        tot = score.sum()
        if tot <= 0:
            nxt = int(np.argmin(d2 > -1))  # all coincide: take first
        else:
            # deterministic "sample": splitmix draw over cumulative mass
            u = (mix64(np.array([seed * 1000 + i], np.uint64))[0] / 2.0**64) * tot
            nxt = int(np.searchsorted(np.cumsum(score), u))
            nxt = min(nxt, len(centers) - 1)
        chosen.append(nxt)
        d2 = np.minimum(d2, ((centers - centers[nxt]) ** 2).sum(axis=1))
    return centers[chosen]


def kmeans(
    points: ray.data.Dataset,
    k: int = 8,
    n_iter: int = 8,
    seed: int = 42,
    lon_col: str = "lon",
    lat_col: str = "lat",
    init: str = "hash",
) -> tuple[np.ndarray, ray.data.Dataset]:
    """Lloyd's KMeans; returns (centroids (k,2), assignment Dataset).

    Each iteration is ONE streaming pass: per batch, assign points to
    the nearest centroid (vectorized (k, n) distance) and emit k rows
    of (sum_lon, sum_lat, count) partials; driver merges and updates.
    Shuffle-free — the reduction payload is k rows per batch.

    ``init``: "hash" (spread-out deterministic, can seed empty
    clusters) or "kmeans||" (Bahman weighted init, the reference's
    KSampler path — better seeding on clustered data).
    """
    if init == "kmeans||":
        centroids = kmeans_parallel_init(
            points, k, seed=seed, lon_col=lon_col, lat_col=lat_col
        )
    else:
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


def kmeans_lloyd_exact(
    points: ray.data.Dataset,
    init_centroids: np.ndarray,
    n_iter: int = 6,
    lon_col: str = "lon",
    lat_col: str = "lat",
    id_col: str = "url",
    scale: float = 1e6,
) -> ray.data.Dataset:
    """Bit-reproducible Lloyd's over integer-quantized coordinates.

    The standard :func:`kmeans` accumulates float partial sums whose
    rounding depends on batch boundaries; this variant quantizes to
    ``floor(coord * scale)`` int64 so per-cluster sums are EXACT and
    order-independent — the run is bit-identical at any parallelism,
    and (unique among iterative ops here) admits an exact SQL oracle
    (unrolled per-iteration CTEs). Same streaming shape: one
    map_batches partial pass per iteration, k-row payload per batch,
    fixed ``n_iter`` (no early-stop, for oracle parity).

    Returns the final (id_col, cluster) assignment Dataset.
    """
    c = np.asarray(init_centroids, dtype=np.float64).copy()
    k = len(c)

    def quant(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        lon = np.floor(batch.column(lon_col).to_numpy() * scale).astype(np.int64)
        lat = np.floor(batch.column(lat_col).to_numpy() * scale).astype(np.int64)
        return lon, lat

    for _ in range(n_iter):
        cref = ray.put(c)

        def partial(batch: pa.Table) -> pa.Table:
            cc = ray.get(cref)
            x, y = quant(batch)
            d = (x[None, :] - cc[:, 0:1]) ** 2 + (y[None, :] - cc[:, 1:2]) ** 2
            a = np.argmin(d, axis=0)
            sx = np.zeros(len(cc), dtype=np.int64)
            sy = np.zeros(len(cc), dtype=np.int64)
            n = np.zeros(len(cc), dtype=np.int64)
            np.add.at(sx, a, x)
            np.add.at(sy, a, y)
            np.add.at(n, a, 1)
            return pa.table(
                {
                    "cid": pa.array(np.arange(len(cc)), pa.int64()),
                    "sx": pa.array(sx, pa.int64()),
                    "sy": pa.array(sy, pa.int64()),
                    "n": pa.array(n, pa.int64()),
                }
            )

        parts = points.map_batches(
            partial, batch_format="pyarrow", batch_size=None
        ).to_pandas()
        agg = parts.groupby("cid", sort=True).sum()  # int64: exact, order-free
        for cid in range(k):
            if cid not in agg.index:
                continue
            row = agg.loc[cid]
            if row["n"] > 0:
                c[cid] = (
                    float(row["sx"]) / float(row["n"]),
                    float(row["sy"]) / float(row["n"]),
                )

    cref = ray.put(c)

    def assign(batch: pa.Table) -> pa.Table:
        cc = ray.get(cref)
        x, y = quant(batch)
        d = (x[None, :] - cc[:, 0:1]) ** 2 + (y[None, :] - cc[:, 1:2]) ** 2
        a = np.argmin(d, axis=0)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "cluster": pa.array(a.astype(np.int64), pa.int64()),
            }
        )

    return points.map_batches(assign, batch_format="pyarrow", batch_size=None)


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


def _segments(keys_sorted: np.ndarray):
    """Yield (start, end) index ranges of equal-key runs."""
    if len(keys_sorted) == 0:
        return
    bounds = np.flatnonzero(np.diff(keys_sorted)) + 1
    starts = np.concatenate([[0], bounds])
    ends = np.concatenate([bounds, [len(keys_sorted)]])
    yield from zip(starts, ends)


# ---------------------------------------------------------------------------
# point-exact DBSCAN
# ---------------------------------------------------------------------------

_DENSE_CELL = 512  # cell population above which the subcell path kicks in
_PAIR_CHUNK = 2048  # row-chunk for pairwise distance blocks


def _tile_local_dbscan(
    x: np.ndarray,
    y: np.ndarray,
    pid: np.ndarray,
    role: np.ndarray,  # 0 home, 1 halo<=1 cell, 2 halo<=2 cells
    eps: float,
    min_pts: int,
):
    """Exact DBSCAN inside one tile (+2-cell halo).

    Points with role<=1 have their full eps-neighborhood present
    (halo-2 supplies their candidates), so their core flags are exact.
    Returns (claims, border_adj, noise): claims = (pid, root, is_home)
    for every core participant; border_adj = (border_pid, core_root);
    noise = home non-core pids with no core neighbor.

    Dense cells (> _DENSE_CELL points) switch to a subcell grid of
    width eps/3: subcell pairs whose max corner distance <= eps are
    wholly connected (hub edges / bulk counts, no point pairs), pairs
    whose min distance > eps are skipped, and only the uncertain band
    pays point-level distance tests — so a million-point blob costs
    O(m) instead of O(m^2).
    """
    m = len(x)
    # global eps-cell keys (consistent across tiles)
    ny_cells = int(np.ceil(180.0 / eps)) + 4
    cx = np.floor((x + 180.0) / eps).astype(np.int64)
    cy = np.floor((y + 90.0) / eps).astype(np.int64)
    key = cx * np.int64(ny_cells) + cy
    order = np.argsort(key, kind="mergesort")
    x, y, pid, role, key = x[order], y[order], pid[order], role[order], key[order]
    cx, cy = cx[order], cy[order]

    ucells = key[np.concatenate([[True], key[1:] != key[:-1]])] if m else key
    seg = list(_segments(key))
    cell_start = np.array([s for s, _ in seg], dtype=np.int64)
    cell_end = np.array([e for _, e in seg], dtype=np.int64)

    def ring_candidates(ci: int) -> np.ndarray:
        """Positions of all points in the 3x3 cell ring of ucells[ci]."""
        c = ucells[ci]
        ccx, ccy = c // ny_cells, c % ny_cells
        out = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                k = (ccx + dx) * np.int64(ny_cells) + (ccy + dy)
                j = np.searchsorted(ucells, k)
                if j < len(ucells) and ucells[j] == k:
                    out.append(np.arange(cell_start[j], cell_end[j]))
        return np.concatenate(out) if out else np.empty(0, np.int64)

    counts = np.zeros(m, dtype=np.int64)
    eps2 = eps * eps

    # subcell machinery (width eps/3; offsets classified once)
    w = eps / 3.0
    sub_ny = int(np.ceil(180.0 / w)) + 8
    certain_off, uncertain_off = [], []
    for du in range(-4, 5):
        for dv in range(-4, 5):
            mn = (max(abs(du) - 1, 0) ** 2 + max(abs(dv) - 1, 0) ** 2) * w * w
            mx = ((abs(du) + 1) ** 2 + (abs(dv) + 1) ** 2) * w * w
            if mn > eps2:
                continue
            (certain_off if mx <= eps2 else uncertain_off).append((du, dv))

    # ---- pass A: exact neighbor counts for role<=1 points --------------
    for ci in range(len(ucells)):
        s, e = cell_start[ci], cell_end[ci]
        need = role[s:e] <= 1
        if not need.any():
            continue
        cand = ring_candidates(ci)
        hpos = np.arange(s, e)[need]
        if (e - s) <= _DENSE_CELL and len(cand) * len(hpos) <= 4_000_000:
            for cs in range(0, len(hpos), _PAIR_CHUNK):
                hc = hpos[cs:cs + _PAIR_CHUNK]
                d = (x[hc, None] - x[cand][None, :]) ** 2 + (
                    y[hc, None] - y[cand][None, :]
                ) ** 2
                counts[hc] = (d <= eps2).sum(axis=1)
        else:
            # dense: aggregate candidate subcell populations
            su = np.floor((x[cand] + 180.0) / w).astype(np.int64)
            sv = np.floor((y[cand] + 90.0) / w).astype(np.int64)
            skey = su * np.int64(sub_ny) + sv
            sorder = np.argsort(skey, kind="mergesort")
            cand_s = cand[sorder]
            skey_s = skey[sorder]
            sx, sy_ = x[cand_s], y[cand_s]
            uskey = skey_s[np.concatenate([[True], skey_s[1:] != skey_s[:-1]])]
            sseg = list(_segments(skey_s))
            sstart = np.array([a for a, _ in sseg], np.int64)
            send = np.array([b for _, b in sseg], np.int64)
            spop = send - sstart
            hsu = np.floor((x[hpos] + 180.0) / w).astype(np.int64)
            hsv = np.floor((y[hpos] + 90.0) / w).astype(np.int64)
            cnt = np.zeros(len(hpos), np.int64)
            for du, dv in certain_off:
                k = (hsu + du) * np.int64(sub_ny) + (hsv + dv)
                j = np.clip(np.searchsorted(uskey, k), 0, len(uskey) - 1)
                hit = uskey[j] == k
                cnt[hit] += spop[j[hit]]
            for du, dv in uncertain_off:
                k = (hsu + du) * np.int64(sub_ny) + (hsv + dv)
                j = np.clip(np.searchsorted(uskey, k), 0, len(uskey) - 1)
                hit = np.flatnonzero(uskey[j] == k)
                for hi in hit:  # per-point small pairwise block
                    a, b = sstart[j[hi]], send[j[hi]]
                    p = hpos[hi]
                    cnt[hi] += int(
                        ((x[p] - sx[a:b]) ** 2 + (y[p] - sy_[a:b]) ** 2 <= eps2).sum()
                    )
            counts[hpos] = cnt
        # role-2 halo points keep count 0 (flags never used)

    core = (counts >= min_pts) & (role <= 1)

    # ---- pass B: core-core edges, border adjacency, noise --------------
    e_i, e_j = [], []  # positions
    adj_b, adj_c = [], []  # border pid, core position
    noise_ids = []
    for ci in range(len(ucells)):
        s, e = cell_start[ci], cell_end[ci]
        mem = np.arange(s, e)
        hcore = mem[core[s:e]]
        hbord = mem[(role[s:e] == 0) & ~core[s:e]]
        if len(hcore) == 0 and len(hbord) == 0:
            continue
        cand = ring_candidates(ci)
        ccand = cand[core[cand]]
        dense = (e - s) > _DENSE_CELL or len(cand) * max(len(hcore), len(hbord)) > 4_000_000
        if not dense:
            if len(hcore) and len(ccand):
                for cs in range(0, len(hcore), _PAIR_CHUNK):
                    hc = hcore[cs:cs + _PAIR_CHUNK]
                    d = (x[hc, None] - x[ccand][None, :]) ** 2 + (
                        y[hc, None] - y[ccand][None, :]
                    ) ** 2
                    ii, jj = np.nonzero(d <= eps2)
                    e_i.append(hc[ii])
                    e_j.append(ccand[jj])
            if len(hbord) and len(ccand):
                for cs in range(0, len(hbord), _PAIR_CHUNK):
                    hb = hbord[cs:cs + _PAIR_CHUNK]
                    d = (x[hb, None] - x[ccand][None, :]) ** 2 + (
                        y[hb, None] - y[ccand][None, :]
                    ) ** 2
                    within = d <= eps2
                    ii, jj = np.nonzero(within)
                    adj_b.append(pid[hb][ii])
                    adj_c.append(ccand[jj])
                    lone = hb[~within.any(axis=1)]
                    noise_ids.append(pid[lone])
            elif len(hbord):
                noise_ids.append(pid[hbord])
            continue
        # ---- dense cell: subcell hubs ----------------------------------
        su_all = np.floor((x + 180.0) / w).astype(np.int64)
        sv_all = np.floor((y + 90.0) / w).astype(np.int64)
        ckey = su_all[ccand] * np.int64(sub_ny) + sv_all[ccand]
        corder = np.argsort(ckey, kind="mergesort")
        ccand_s = ckey_s = None
        ccand_s = ccand[corder]
        ckey_s = ckey[corder]
        uck = ckey_s[np.concatenate([[True], ckey_s[1:] != ckey_s[:-1]])] if len(ckey_s) else ckey_s
        cseg = list(_segments(ckey_s))
        cstart = np.array([a for a, _ in cseg], np.int64)
        cend = np.array([b for _, b in cseg], np.int64)
        # star-chain all core points inside one subcell to its hub
        for a, b in zip(cstart, cend):
            if b - a > 1:
                e_i.append(np.full(b - a - 1, ccand_s[a]))
                e_j.append(ccand_s[a + 1:b])

        def link(points_pos, emit_adj: bool):
            """Connect each position in points_pos to core subcells:
            certain -> hub edge / adjacency; uncertain -> point tests."""
            psu = su_all[points_pos]
            psv = sv_all[points_pos]
            for du, dv in certain_off:
                k = (psu + du) * np.int64(sub_ny) + (psv + dv)
                j = np.clip(np.searchsorted(uck, k), 0, len(uck) - 1) if len(uck) else None
                if j is None:
                    return
                hit = np.flatnonzero(uck[j] == k)
                if len(hit):
                    hubs = ccand_s[cstart[j[hit]]]
                    if emit_adj:
                        adj_b.append(pid[points_pos[hit]])
                        adj_c.append(hubs)
                    else:
                        e_i.append(points_pos[hit])
                        e_j.append(hubs)
            for du, dv in uncertain_off:
                k = (psu + du) * np.int64(sub_ny) + (psv + dv)
                j = np.clip(np.searchsorted(uck, k), 0, len(uck) - 1)
                hit = np.flatnonzero(uck[j] == k)
                for hi in hit:
                    a, b = cstart[j[hi]], cend[j[hi]]
                    p = points_pos[hi]
                    sel = (x[p] - x[ccand_s[a:b]]) ** 2 + (
                        y[p] - y[ccand_s[a:b]]
                    ) ** 2 <= eps2
                    tgts = ccand_s[a:b][sel]
                    if len(tgts):
                        if emit_adj:
                            adj_b.append(np.full(len(tgts), pid[p]))
                            adj_c.append(tgts)
                        else:
                            e_i.append(np.full(len(tgts), p))
                            e_j.append(tgts)

        if len(hcore) and len(uck):
            link(hcore, emit_adj=False)
        if len(hbord):
            if len(uck):
                before = sum(len(a) for a in adj_b)
                link(hbord, emit_adj=True)
                # noise: borders that emitted nothing
                got = np.zeros(len(hbord), bool)
                # recompute which borders have any core neighbor (cheap:
                # count via certain/uncertain membership)
                has = np.zeros(len(hbord), bool)
                psu = su_all[hbord]
                psv = sv_all[hbord]
                for du, dv in certain_off + uncertain_off:
                    k = (psu + du) * np.int64(sub_ny) + (psv + dv)
                    j = np.clip(np.searchsorted(uck, k), 0, len(uck) - 1)
                    cand_hit = np.flatnonzero((uck[j] == k) & ~has)
                    for hi in cand_hit:
                        a, b = cstart[j[hi]], cend[j[hi]]
                        p = hbord[hi]
                        if (
                            (x[p] - x[ccand_s[a:b]]) ** 2
                            + (y[p] - y[ccand_s[a:b]]) ** 2
                            <= eps2
                        ).any():
                            has[hi] = True
                noise_ids.append(pid[hbord[~has]])
                del got, before
            else:
                noise_ids.append(pid[hbord])

    # ---- local union-find over core positions (min-pid labels) ---------
    core_pos = np.flatnonzero(core)
    labels = pid.astype(np.int64).copy()
    if len(e_i):
        ei = np.concatenate(e_i)
        ej = np.concatenate(e_j)
        pid_sorted_idx = np.argsort(pid, kind="mergesort")
        pid_sorted = pid[pid_sorted_idx]
        for _ in range(64):  # log2 diameter with pointer jumping
            before = labels[core_pos].copy() if len(core_pos) else labels
            np.minimum.at(labels, ei, labels[ej])
            np.minimum.at(labels, ej, labels[ei])
            # pointer jump: label <- label[label] (labels are pids)
            lpos = pid_sorted_idx[
                np.clip(np.searchsorted(pid_sorted, labels[core_pos]), 0, m - 1)
            ]
            labels[core_pos] = np.minimum(labels[core_pos], labels[lpos])
            if np.array_equal(labels[core_pos], before):
                break

    claims = (
        pid[core_pos],
        labels[core_pos],
        role[core_pos] == 0,
    )
    if adj_b:
        border_adj = (np.concatenate(adj_b), labels[np.concatenate(adj_c)])
    else:
        border_adj = (np.empty(0, np.int64), np.empty(0, np.int64))
    noise = np.concatenate(noise_ids) if noise_ids else np.empty(0, np.int64)
    return claims, border_adj, noise


def dbscan_exact(
    points: ray.data.Dataset,
    eps: float = 1.0,
    min_pts: int = 5,
    lon_col: str = "lon",
    lat_col: str = "lat",
    id_col: str = "row_id",
    tile_cells: int = 64,
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """POINT-EXACT distributed DBSCAN (planar metric), the reference's
    partition/local-cluster/merge architecture
    (``analytics/mapreduce/dbscan/DBScanMapReduce.java:59-87``,
    partitioning ``analytics/api/.../partitioner/AbstractPartitioner.java``)
    re-expressed as ONE Ray Data exchange plus a tiny merge:

    1. each point is assigned to its tile (``tile_cells`` eps-cells
       square) and duplicated into adjacent tiles when within 2
       eps-cells of the boundary (~(T+4)^2/T^2 duplication, ~13% at
       T=64) — NOT the 9x duplication of naive cell rings;
    2. per tile (one ``groupby().map_groups``): exact core flags,
       core-core edges, vectorized local union-find with pointer
       jumping -> tile-local min-pid roots (`_tile_local_dbscan`);
    3. points in >1 tile carry their roots to a bucketed claims
       exchange; conflicting roots become merge edges — a graph
       bounded by clusters that CROSS tile boundaries — resolved by
       driver union-find (the reference's reducer merge role) and
       broadcast back with ``ray.put``;
    4. border points take min(cluster of eps-core-neighbors); noise
       is decided inside the tile pass.

    Output: (pid, cluster) per input point; cluster = min core pid of
    the density-connected component, -1 noise — identical at any
    parallelism and matching sequential DBSCAN up to DBSCAN's
    well-known border-tie choice, which we fix deterministically to
    the min cluster label.
    """
    from ..hashing import mix64

    tile_w = eps * tile_cells
    ny_t = int(np.ceil(180.0 / tile_w)) + 2

    def tile_rows(batch: pa.Table) -> pa.Table:
        lon = batch.column(lon_col).to_numpy()
        lat = batch.column(lat_col).to_numpy()
        ids = batch.column(id_col).to_numpy()
        tx = np.floor((lon + 180.0) / tile_w).astype(np.int64)
        ty = np.floor((lat + 90.0) / tile_w).astype(np.int64)
        # offset within tile in eps cells
        ox = (lon + 180.0) / eps - tx * tile_cells
        oy = (lat + 90.0) / eps - ty * tile_cells
        out_key, out_idx, out_role = [], [], []
        base = np.arange(len(lon))
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if dx == 0 and dy == 0:
                    sel = base
                    role = np.zeros(len(lon), np.int8)
                else:
                    # within 2 eps-cells of that neighbor tile?
                    dist_x = np.where(dx == 0, 0.0, np.where(dx < 0, ox, tile_cells - ox))
                    dist_y = np.where(dy == 0, 0.0, np.where(dy < 0, oy, tile_cells - oy))
                    d = np.maximum(dist_x, dist_y)
                    sel = base[(d <= 2.0)]
                    if len(sel) == 0:
                        continue
                    d1 = np.maximum(dist_x, dist_y)[sel]
                    role = np.where(d1 <= 1.0, 1, 2).astype(np.int8)
                    # the world does not wrap: drop out-of-range target
                    # tiles (ty+dy=-1 would alias (tx-1, ny_t-1))
                    inb = (ty[sel] + dy >= 0) & (ty[sel] + dy < ny_t)
                    sel = sel[inb]
                    role = role[inb]
                    if len(sel) == 0:
                        continue
                key = (tx[sel] + dx) * np.int64(ny_t) + (ty[sel] + dy)
                out_key.append(key)
                out_idx.append(sel)
                out_role.append(role)
        key = np.concatenate(out_key)
        idx = np.concatenate(out_idx)
        t = pa.table(
            {
                "tile": pa.array(key, pa.int64()),
                "pid": pa.array(ids[idx].astype(np.int64), pa.int64()),
                "x": pa.array(lon[idx], pa.float64()),
                "y": pa.array(lat[idx], pa.float64()),
                "role": pa.array(np.concatenate(out_role), pa.int8()),
            }
        )
        bk = mix64(key.astype(np.uint64)) % np.uint64(n_buckets)
        return t.append_column("bucket", pa.array(bk.astype(np.int64), pa.int64()))

    def local(g: pa.Table) -> pa.Table:
        tiles = g.column("tile").to_numpy()
        order = np.argsort(tiles, kind="mergesort")
        tiles = tiles[order]
        x = g.column("x").to_numpy()[order]
        y = g.column("y").to_numpy()[order]
        pid = g.column("pid").to_numpy()[order]
        role = g.column("role").to_numpy()[order]
        out_a, out_b, out_kind = [], [], []
        for s, e in _segments(tiles):
            (cpid, croot, chome), (bpid, broot), noise = _tile_local_dbscan(
                x[s:e], y[s:e], pid[s:e], role[s:e], eps, min_pts
            )
            # kind 0: claim (all core participants); kind 3: home core
            out_a.append(cpid)
            out_b.append(croot)
            out_kind.append(np.zeros(len(cpid), np.int8))
            out_a.append(cpid[chome])
            out_b.append(croot[chome])
            out_kind.append(np.full(int(chome.sum()), 3, np.int8))
            out_a.append(bpid)
            out_b.append(broot)
            out_kind.append(np.ones(len(bpid), np.int8))
            out_a.append(noise)
            out_b.append(np.full(len(noise), -1, np.int64))
            out_kind.append(np.full(len(noise), 2, np.int8))
        if not out_a:
            return pa.table(
                {
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "kind": pa.array([], pa.int8()),
                }
            )
        return pa.table(
            {
                "a": pa.array(np.concatenate(out_a).astype(np.int64), pa.int64()),
                "b": pa.array(np.concatenate(out_b).astype(np.int64), pa.int64()),
                "kind": pa.array(np.concatenate(out_kind), pa.int8()),
            }
        )

    tagged = (
        points.map_batches(tile_rows, batch_format="pyarrow", batch_size=None)
        .repartition(n_buckets // 4)
        .groupby("bucket")
        .map_groups(local, batch_format="pyarrow")
        .materialize()
    )

    # ---- cross-tile root merge (bounded by boundary-crossing clusters) -
    def claim_buckets(b: pa.Table) -> pa.Table:
        bk = mix64(b.column("a").to_numpy().astype(np.uint64)) % np.uint64(n_buckets)
        return b.append_column("cbk", pa.array(bk.astype(np.int64), pa.int64()))

    def merge_edges(g: pa.Table) -> pa.Table:
        ids = g.column("a").to_numpy()
        roots = g.column("b").to_numpy()
        order = np.lexsort((roots, ids))
        ids, roots = ids[order], roots[order]
        # per pid: pair its min root with every other distinct root
        first = np.ones(len(ids), bool)
        first[1:] = ids[1:] != ids[:-1]
        seg_min = roots[np.flatnonzero(first)]
        seg_idx = np.cumsum(first) - 1
        other = roots != seg_min[seg_idx]
        ra, rb = seg_min[seg_idx[other]], roots[other]
        uniq = np.unique(np.stack([ra, rb], axis=1), axis=0) if len(ra) else np.empty((0, 2), np.int64)
        return pa.table(
            {
                "ra": pa.array(uniq[:, 0].astype(np.int64), pa.int64()),
                "rb": pa.array(uniq[:, 1].astype(np.int64), pa.int64()),
            }
        )

    pairs = (
        tagged.filter(expr="kind == 0")
        .map_batches(claim_buckets, batch_format="pyarrow", batch_size=None)
        .groupby("cbk")
        .map_groups(merge_edges, batch_format="pyarrow")
        .to_pandas()
    )
    if "ra" not in pairs.columns:  # no cross-tile clusters anywhere
        pairs = pd.DataFrame({"ra": np.empty(0, np.int64), "rb": np.empty(0, np.int64)})
    # driver union-find over the (small) root graph — the reference's
    # reducer-side cluster merge (DBScanMapReduce.java:59-87)
    parent: dict[int, int] = {}

    def find(r: int) -> int:
        while parent.get(r, r) != r:
            parent[r] = parent.get(parent[r], parent[r])
            r = parent[r]
        return r

    for ra, rb in zip(pairs["ra"].to_numpy(), pairs["rb"].to_numpy()):
        a, b = find(int(ra)), find(int(rb))
        if a != b:
            parent[max(a, b)] = min(a, b)
    remap = {r: find(r) for r in list(parent)}
    if remap:
        rk = np.array(sorted(remap), dtype=np.int64)
        rv = np.array([remap[k] for k in rk], dtype=np.int64)
    else:
        rk = np.empty(0, np.int64)
        rv = np.empty(0, np.int64)
    rref = ray.put((rk, rv))

    def map_roots(b: pa.Table, col: str) -> pa.Table:
        rk_, rv_ = ray.get(rref)
        v = b.column(col).to_numpy().copy()
        if len(rk_):
            j = np.clip(np.searchsorted(rk_, v), 0, len(rk_) - 1)
            hit = rk_[j] == v
            v[hit] = rv_[j[hit]]
        return pa.table({"pid": b.column("a"), "cluster": pa.array(v, pa.int64())})

    core_final = tagged.filter(expr="kind == 3").map_batches(
        lambda b: map_roots(b, "b"), batch_format="pyarrow", batch_size=None
    )
    from ..agg import tree_aggregate

    border_mapped = tagged.filter(expr="kind == 1").map_batches(
        lambda b: map_roots(b, "b"), batch_format="pyarrow", batch_size=None
    )
    border_final = tree_aggregate(border_mapped, ["pid"], {"cluster": "min"})
    noise_final = tagged.filter(expr="kind == 2").map_batches(
        lambda b: pa.table(
            {
                "pid": b.column("a"),
                "cluster": pa.array(np.full(len(b), -1, np.int64), pa.int64()),
            }
        ),
        batch_format="pyarrow",
        batch_size=None,
    )
    return core_final.union(border_final).union(noise_final)


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


def kmeans_jump(
    points: ray.data.Dataset,
    init_pool: np.ndarray,
    k_range: tuple[int, ...] = (2, 3, 4, 5, 6),
    n_iter: int = 3,
    lon_col: str = "lon",
    lat_col: str = "lat",
    scale: float = 1e6,
) -> pa.Table:
    """KMeans clustering using the Jump Method (``geowave analytic
    kmeansjump``): run Lloyd's for every k in ``k_range``, compute the
    transformed distortion d_k = ((SSE/n)/D)^(-D/2) per Sugar & James
    (``KMeansDistortionMapReduce.java:87-217``), and select the k with
    the largest jump d_k - d_{k-1} with d_{kmin-1}=0
    (``DistortionGroupManagement.java:273-292``: earliest max wins).

    Exactness contract: coordinates are integer-quantized (same rule
    as :func:`kmeans_lloyd_exact`), so every per-cluster sum is an
    exact integer; SSE numerators use the identity
    n*sum((v-mean)^2) = n*sum(v^2) - sum(v)^2 evaluated in unbounded
    Python ints (engine) / HUGEINT (SQL oracle); every float after
    that is one fixed IEEE expression tree shared with the oracle,
    and the k-term SSE sum is added in ascending-cid order on both
    sides — results hash-match bit-for-bit with no rounding.

    Scale shape: like the reference (one full MR job per k and
    iteration), each k costs ``n_iter + 1`` streaming passes; every
    pass is a ``map_batches`` partial with a k-row payload per block
    (sum of int64 hi/lo-split squares, so no int64 overflow at any
    block size) and a driver-side merge over k rows — no shuffle.

    Returns one row per k: (k, n, sse, distortion, jump, best).
    """
    init_pool = np.asarray(init_pool, dtype=np.float64)
    ks = sorted(int(k) for k in k_range)
    if max(ks) > len(init_pool):
        raise ValueError("init_pool smaller than max k")

    def quant(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        x = np.floor(batch.column(lon_col).to_numpy() * scale).astype(np.int64)
        y = np.floor(batch.column(lat_col).to_numpy() * scale).astype(np.int64)
        return x, y

    rows = []
    prev_d = 0.0
    for k in ks:
        c = init_pool[:k].copy()
        for _ in range(n_iter):
            cref = ray.put(c)

            def partial(batch: pa.Table) -> pa.Table:
                cc = ray.get(cref)
                x, y = quant(batch)
                d = (x[None, :] - cc[:, 0:1]) ** 2 + (y[None, :] - cc[:, 1:2]) ** 2
                a = np.argmin(d, axis=0)
                sx = np.zeros(len(cc), dtype=np.int64)
                sy = np.zeros(len(cc), dtype=np.int64)
                n = np.zeros(len(cc), dtype=np.int64)
                np.add.at(sx, a, x)
                np.add.at(sy, a, y)
                np.add.at(n, a, 1)
                return pa.table(
                    {
                        "cid": pa.array(np.arange(len(cc)), pa.int64()),
                        "sx": pa.array(sx, pa.int64()),
                        "sy": pa.array(sy, pa.int64()),
                        "n": pa.array(n, pa.int64()),
                    }
                )

            parts = points.map_batches(
                partial, batch_format="pyarrow", batch_size=None
            ).to_pandas()
            agg = parts.groupby("cid", sort=True).sum()
            for cid in range(k):
                if cid in agg.index and agg.loc[cid, "n"] > 0:
                    c[cid] = (
                        float(agg.loc[cid, "sx"]) / float(agg.loc[cid, "n"]),
                        float(agg.loc[cid, "sy"]) / float(agg.loc[cid, "n"]),
                    )

        # final assignment + exact integer SSE partials; x*x fits
        # int64 (|x| <= 1.8e8) but block sums would overflow, so each
        # square is split hi/lo 32-bit and summed separately
        cref = ray.put(c)

        def stats(batch: pa.Table) -> pa.Table:
            cc = ray.get(cref)
            x, y = quant(batch)
            d = (x[None, :] - cc[:, 0:1]) ** 2 + (y[None, :] - cc[:, 1:2]) ** 2
            a = np.argmin(d, axis=0)
            xx = x * x
            yy = y * y
            mask = np.int64(0xFFFFFFFF)
            out = {}
            for name, v in (
                ("n", np.ones(len(x), dtype=np.int64)),
                ("sx", x),
                ("sy", y),
                ("xxhi", xx >> np.int64(32)),
                ("xxlo", xx & mask),
                ("yyhi", yy >> np.int64(32)),
                ("yylo", yy & mask),
            ):
                acc = np.zeros(len(cc), dtype=np.int64)
                np.add.at(acc, a, v)
                out[name] = pa.array(acc, pa.int64())
            out["cid"] = pa.array(np.arange(len(cc)), pa.int64())
            return pa.table(out)

        st = (
            points.map_batches(stats, batch_format="pyarrow", batch_size=None)
            .to_pandas()
            .groupby("cid", sort=True)
            .sum()
        )
        n_total = int(st["n"].sum())
        sse = 0.0
        for cid in range(k):
            if cid in st.index and int(st.loc[cid, "n"]) > 0:
                r = st.loc[cid]
                nc = int(r["n"])
                sxx = (int(r["xxhi"]) << 32) + int(r["xxlo"])
                syy = (int(r["yyhi"]) << 32) + int(r["yylo"])
                numer = (nc * sxx - int(r["sx"]) ** 2) + (
                    nc * syy - int(r["sy"]) ** 2
                )
                sse += float(numer) / float(nc)
            else:
                sse += 0.0
        mse = (sse / float(n_total)) / 2.0  # per-point, per-dimension
        dk = 1.0 / mse  # (mse)^(-D/2) with D=2
        rows.append((k, n_total, sse, dk, dk - prev_d))
        prev_d = dk

    best_i = max(range(len(rows)), key=lambda i: rows[i][4])
    return pa.table(
        {
            "k": pa.array([r[0] for r in rows], pa.int64()),
            "n": pa.array([r[1] for r in rows], pa.int64()),
            "sse": pa.array([r[2] for r in rows], pa.float64()),
            "distortion": pa.array([r[3] for r in rows], pa.float64()),
            "jump": pa.array([r[4] for r in rows], pa.float64()),
            "best": pa.array(
                [1 if i == best_i else 0 for i in range(len(rows))], pa.int64()
            ),
        }
    )
