"""Tests for clustering / distance-join / sampling analytics."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from geowave_ray import fixtures


@pytest.fixture(scope="module")
def pages(ray_session):
    return fixtures.gen_pages_slice(0, 3000, 3000)


def test_kmeans_every_point_nearest_centroid(pages):
    """The GeoWaveSparkKMeansIT check: each point's assigned centroid
    is the true nearest (GeoWaveSparkKMeansIT.java:107-168)."""
    from geowave_ray.pipelines.clustering import kmeans

    ds = ray.data.from_arrow(pages)
    centroids, assigned = kmeans(ds, k=6, n_iter=5)
    df = assigned.to_pandas()
    lon = df["lon"].to_numpy()
    lat = df["lat"].to_numpy()
    d = (lon[None, :] - centroids[:, 0:1]) ** 2 + (lat[None, :] - centroids[:, 1:2]) ** 2
    nearest = np.argmin(d, axis=0)
    assert np.array_equal(nearest, df["cluster"].to_numpy())
    # deterministic across runs
    c2, _ = kmeans(ray.data.from_arrow(pages), k=6, n_iter=5)
    assert np.array_equal(centroids, c2)


def test_kmeans_lloyd_exact_parallelism_invariant(pages):
    """kmeans_lloyd_exact's integer partial sums are exact, so the
    assignment must be BIT-identical at any block split (the property
    its SQL oracle relies on)."""
    from geowave_ray.pipelines.clustering import kmeans_lloyd_exact

    init = np.array([(-90e6, -45e6), (90e6, 45e6), (0.0, 0.0)])
    outs = []
    for blocks in (1, 7):
        ds = ray.data.from_arrow(pages).repartition(blocks)
        df = (
            kmeans_lloyd_exact(ds, init, n_iter=4)
            .to_pandas()
            .sort_values("url")
            .reset_index(drop=True)
        )
        outs.append(df)
    assert outs[0].equals(outs[1])
    assert outs[0]["cluster"].nunique() > 1


def test_kmeans_hulls_contain_centroids(pages):
    from geowave_ray.geom import pip_convex
    from geowave_ray.pipelines.clustering import convex_hulls, kmeans

    ds = ray.data.from_arrow(pages)
    centroids, assigned = kmeans(ds, k=4, n_iter=5)
    hulls = convex_hulls(assigned)
    df = assigned.to_pandas()
    for c, hull in hulls.items():
        if len(hull) < 3:
            continue
        # hull contains that cluster's centroid-of-members
        members = df[df.cluster == c]
        mx, my = members["lon"].mean(), members["lat"].mean()
        assert pip_convex(np.array([mx]), np.array([my]), hull)[0]


def test_dbscan_finds_hot_clusters(pages):
    """Hot url clusters (0.02-deg blobs holding 30% of rows) must come
    out as dense clusters; isolated random points are noise."""
    from geowave_ray.pipelines.clustering import dbscan

    ds = ray.data.from_arrow(pages)
    out = dbscan(ds, eps=0.05, min_pts=20).to_pandas()
    df = pages.to_pandas()
    merged = out.merge(df[["url", "row_id"]], on="url")
    hot = merged[merged.row_id % 10 < 3]
    cold = merged[merged.row_id % 10 >= 3]
    # every hot point is clustered
    assert (hot["cluster"] >= 0).all()
    # clusters are at least the 4 dense blobs (some random points may
    # cluster too, but noise dominates the cold set)
    assert hot["cluster"].nunique() >= 4
    assert (cold["cluster"] == -1).mean() > 0.95


def test_within_distance_join_matches_bruteforce(pages):
    from geowave_ray.geom import planar_sqdist
    from geowave_ray.pipelines.distance_join import within_distance_join

    probes = fixtures.gen_knn_queries(40)
    ds = ray.data.from_arrow(pages)
    r = 0.5
    got = within_distance_join(ds, probes, radius_deg=r).to_pandas()
    got_set = set(zip(got["query_id"], got["url"]))
    lon = pages["lon"].to_numpy()
    lat = pages["lat"].to_numpy()
    urls = np.asarray(pages["url"].to_pylist(), object)
    expect = set()
    for i in range(probes.num_rows):
        d = planar_sqdist(probes["lon"][i].as_py(), probes["lat"][i].as_py(), lon, lat)
        for j in np.nonzero(d <= r * r)[0]:
            expect.add((probes["query_id"][i].as_py(), urls[j]))
    assert got_set == expect


def test_sample_weighted_deterministic_and_biased(ray_session):
    from geowave_ray.pipelines.distance_join import sample_weighted

    n = 2000
    t = pa.table(
        {
            "url": [f"u{i:05d}" for i in range(n)],
            "w": pa.array([10.0 if i < 200 else 0.1 for i in range(n)], pa.float64()),
        }
    )
    ds = ray.data.from_arrow(t)
    s1 = sample_weighted(ds, "w", 100).to_pandas()
    s2 = sample_weighted(ray.data.from_arrow(t), "w", 100).to_pandas()
    assert len(s1) == 100
    assert sorted(s1["url"]) == sorted(s2["url"])  # deterministic
    # heavy-weight items (10% of rows, 100x weight) dominate the sample
    heavy = (s1["url"].str.slice(1).astype(int) < 200).mean()
    assert heavy > 0.5


def test_lag_per_key_and_sliding(ray_session):
    import pyarrow as pa

    from geowave_ray.pipelines.window import lag_per_key, sliding_window_counts

    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "user_id": pa.array([7, 7, 8, 7, 8], pa.int64()),
            "ts": pa.array(
                np.array([100, 200, 150, 300, 400], dtype="datetime64[s]").astype(
                    "datetime64[us]"
                ),
                pa.timestamp("us"),
            ),
        }
    )
    out = lag_per_key(ray.data.from_arrow(t), "user_id", "ts", "event_id").to_pandas()
    got = dict(zip(out["event_id"], out["prev_event_id"]))
    assert got == {1: -1, 2: 1, 4: 2, 3: -1, 5: 3}
    # sliding: window 200s slide 100s
    sw = sliding_window_counts(
        ray.data.from_arrow(t.append_column("k", pa.array(["a"] * 5))),
        ts_col="ts", key_col="k",
        window_us=200_000_000, slide_us=100_000_000,
    ).to_pandas()
    # events at t=100..400: window starting 0 covers 100,150; window 1
    # covers 100..299 -> ids ts 100,150,200; etc. verify total multiplicity
    assert sw["n"].sum() == 10  # each event in exactly 2 windows


def test_kmeans_parallel_init(ray_session):
    """k-means|| init (BahmanEtAlSampleProbabilityFn role): beats the
    hash init on clustered data and is parallelism-invariant."""
    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data

    from geowave_ray.pipelines.clustering import kmeans

    rng = np.random.default_rng(5)
    blobs = []
    for cx, cy in [(-50, 20), (30, -10), (100, 40), (0, 60)]:
        blobs.append(
            np.column_stack(
                [cx + rng.standard_normal(800), cy + rng.standard_normal(800)]
            )
        )
    pts = np.vstack(blobs)
    t = pa.table({"lon": pa.array(pts[:, 0]), "lat": pa.array(pts[:, 1])})

    def inertia(c):
        d = ((pts[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        return d.min(axis=1).sum()

    ds = ray.data.from_arrow(t)
    c_hash, _ = kmeans(ds, k=4, n_iter=6, init="hash")
    c_pp, _ = kmeans(ds, k=4, n_iter=6, init="kmeans||")
    assert inertia(c_pp) <= inertia(c_hash) * 1.01
    # each blob center recovered within 1 deg
    for cx, cy in [(-50, 20), (30, -10), (100, 40), (0, 60)]:
        assert (((c_pp - (cx, cy)) ** 2).sum(axis=1) ** 0.5).min() < 1.0
    c_pp2, _ = kmeans(ds.repartition(9), k=4, n_iter=6, init="kmeans||")
    assert np.allclose(c_pp, c_pp2)


def test_kmeans_jump_recovers_true_k(ray_session):
    """Jump method (Sugar-James) picks the true blob count on
    well-separated clusters, and the distortion column is monotone
    increasing in k (more centroids never raise SSE here)."""
    from geowave_ray.pipelines.clustering import kmeans_jump

    rng = np.random.default_rng(11)
    centers = np.array([(-60.0, -30.0), (-60.0, 30.0), (60.0, -30.0), (60.0, 30.0)])
    pts = np.concatenate(
        [c + rng.normal(0, 1.5, size=(300, 2)) for c in centers]
    )
    tbl = pa.table(
        {
            "url": pa.array([f"u{i}" for i in range(len(pts))]),
            "lon": pa.array(pts[:, 0], pa.float64()),
            "lat": pa.array(pts[:, 1], pa.float64()),
        }
    )
    init = np.array(
        [(-90e6, -45e6), (-90e6, 45e6), (90e6, -45e6), (90e6, 45e6), (0.0, 0.0), (-150e6, 0.0)]
    )
    out = kmeans_jump(
        ray.data.from_arrow(tbl), init, k_range=(2, 3, 4, 5, 6), n_iter=4
    ).to_pandas()
    assert list(out["k"]) == [2, 3, 4, 5, 6]
    best = out.loc[out["best"] == 1, "k"].iloc[0]
    assert best == 4
    # distortion never decreases with k (extra centroids may stay
    # empty on separated blobs, so the tail can plateau)
    d = out["distortion"].to_numpy()
    assert (np.diff(d) >= 0).all()
    # determinism at different parallelism
    out2 = kmeans_jump(
        ray.data.from_arrow(tbl).repartition(7), init, k_range=(2, 3, 4, 5, 6), n_iter=4
    ).to_pandas()
    assert np.array_equal(out["sse"].to_numpy(), out2["sse"].to_numpy())
