"""Point-exact DBSCAN vs a brute-force sequential reference
(reference architecture: analytics/mapreduce/dbscan/DBScanMapReduce.java)."""

import numpy as np
import pandas as pd
import pytest


def brute_dbscan(x, y, pid, eps, min_pts):
    """O(n^2) reference with the engine's deterministic label rule:
    cluster = min core pid of the component; border = min over
    neighbor core clusters; noise -1."""
    n = len(x)
    d2 = (x[:, None] - x[None, :]) ** 2 + (y[:, None] - y[None, :]) ** 2
    within = d2 <= eps * eps
    core = within.sum(axis=1) >= min_pts
    # union-find over core-core edges
    parent = np.arange(n)

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    ci, cj = np.nonzero(within & core[:, None] & core[None, :])
    for a, b in zip(ci, cj):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    cluster = np.full(n, -1, dtype=np.int64)
    # core labels: min pid in component
    comp = {}
    for i in np.flatnonzero(core):
        r = find(i)
        comp.setdefault(r, []).append(i)
    for r, members in comp.items():
        lab = pid[members].min()
        cluster[members] = lab
    # borders
    for i in np.flatnonzero(~core):
        nb = np.flatnonzero(within[i] & core)
        if len(nb):
            cluster[i] = cluster[nb].min()
    return cluster


def _scenario():
    rng = np.random.default_rng(11)
    pts = []
    # chain crossing tile boundaries (tile = 64 eps-cells; eps=0.5 ->
    # tile width 32 deg; chain spans lon -40..40 = 3 tiles)
    chain = np.column_stack(
        [np.linspace(-40, 40, 300), np.zeros(300) + 0.1 * rng.standard_normal(300)]
    )
    pts.append(chain)
    # dense blob: 1500 points inside one eps-cell (exercises the
    # subcell certain/uncertain path; > _DENSE_CELL=512)
    blob = np.column_stack(
        [60 + 0.2 * rng.standard_normal(1500), 10 + 0.2 * rng.standard_normal(1500)]
    )
    pts.append(blob)
    # sparse noise
    noise = np.column_stack(
        [rng.uniform(-80, 80, 400), rng.uniform(-50, 50, 400)]
    )
    pts.append(noise)
    # small cluster straddling a tile corner (multiple of 32 deg from
    # the -180/-90 origin -> corner at lon=-20+... use (12, -26)?
    # tile edges at lon = -180 + 32k -> {-20, 12}; lat = -90 + 32k ->
    # {-26, 6}. Straddle (12, 6).
    corner = np.column_stack(
        [12 + 0.8 * rng.standard_normal(60), 6 + 0.8 * rng.standard_normal(60)]
    )
    pts.append(corner)
    all_pts = np.vstack(pts)
    pid = rng.permutation(len(all_pts)).astype(np.int64) * 7 + 3
    return all_pts[:, 0], all_pts[:, 1], pid


@pytest.mark.parametrize("eps,min_pts", [(0.5, 4), (1.0, 8)])
def test_dbscan_exact_vs_bruteforce(ray_session, eps, min_pts):
    import ray.data
    import pyarrow as pa

    from geowave_ray.pipelines.clustering import dbscan_exact

    x, y, pid = _scenario()
    want = brute_dbscan(x, y, pid, eps, min_pts)
    ds = ray.data.from_arrow(
        pa.table({"row_id": pa.array(pid), "lon": pa.array(x), "lat": pa.array(y)})
    ).repartition(5)
    got = (
        dbscan_exact(ds, eps=eps, min_pts=min_pts)
        .to_pandas()
        .sort_values("pid")
        .reset_index(drop=True)
    )
    assert len(got) == len(pid)
    wdf = (
        pd.DataFrame({"pid": pid, "cluster": want})
        .sort_values("pid")
        .reset_index(drop=True)
    )
    mism = (got["cluster"].to_numpy() != wdf["cluster"].to_numpy()).sum()
    assert mism == 0, f"{mism} label mismatches"


def test_dbscan_exact_parallelism_invariant(ray_session):
    import ray.data
    import pyarrow as pa

    from geowave_ray.pipelines.clustering import dbscan_exact

    x, y, pid = _scenario()
    t = pa.table({"row_id": pa.array(pid), "lon": pa.array(x), "lat": pa.array(y)})
    outs = []
    for nblocks in (1, 7):
        ds = ray.data.from_arrow(t).repartition(nblocks)
        outs.append(
            dbscan_exact(ds, eps=0.7, min_pts=5)
            .to_pandas()
            .sort_values("pid")
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])
