import hashlib

import numpy as np
import pyarrow.parquet as pq

from geowave_ray import fixtures
from geowave_ray.geom import parse_wkb_polygon, pip_convex
from geowave_ray.geotag import derive_lonlat


def test_pages_deterministic_and_invariant():
    t1 = fixtures.gen_pages_slice(0, 100, 10_000)
    t2 = fixtures.gen_pages_slice(0, 100, 10_000)
    assert t1.equals(t2)
    # text is a pure function of url (byte-identical invariant)
    for url, text in zip(t1["url"].to_pylist(), t1["text"].to_pylist()):
        i = int(url.rsplit("/", 1)[1])
        d = hashlib.sha256(url.encode()).digest()[:8].hex()
        assert text == f"doc {i} body {d}"


def test_pages_lonlat_matches_engine_derivation():
    t = fixtures.gen_pages_slice(500, 700, 10_000)
    lon, lat = derive_lonlat(
        t["url"].to_pylist(), t["lang"].to_pylist(), t["row_id"].to_numpy()
    )
    assert np.array_equal(lon, t["lon"].to_numpy())
    assert np.array_equal(lat, t["lat"].to_numpy())
    assert np.all(np.abs(lon) <= 180) and np.all(np.abs(lat) <= 90)


def test_hot_cluster_skew():
    t = fixtures.gen_pages_slice(0, 10_000, 10_000)
    lon = t["lon"].to_numpy()
    lat = t["lat"].to_numpy()
    i = t["row_id"].to_numpy()
    hot = (i % 10) < 3
    # hot rows are within 0.011 deg of one of the 4 centers
    from geowave_ray.geotag import CLUSTER_CENTERS

    centers = np.array(CLUSTER_CENTERS)
    d = np.min(
        np.abs(lon[hot, None] - centers[None, :, 0])
        + np.abs(lat[hot, None] - centers[None, :, 1]),
        axis=1,
    )
    assert d.max() < 0.03
    assert hot.mean() == 0.3


def test_regions_convex_ccw_and_edges_match():
    regions, edges = fixtures.gen_regions(64)
    ew = edges.to_pandas()
    for j in range(64):
        wkb = regions["geometry_wkb"][j].as_py()
        ring = parse_wkb_polygon(wkb)[:-1]
        # CCW convex: every vertex is inside (boundary-inclusive half-planes)
        assert pip_convex(ring[:, 0], ring[:, 1], ring).all()
        # shoelace positive => CCW
        x, y = ring[:, 0], ring[:, 1]
        area2 = np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)
        assert area2 > 0
        sub = ew[ew.region_id == f"r{j:06d}"]
        assert len(sub) == len(ring)


def test_ensure_fixtures_caches(tmp_path, monkeypatch):
    monkeypatch.setattr(fixtures, "FIXTURE_ROOT", str(tmp_path))
    monkeypatch.setitem(
        fixtures.SCALES, "sf0.001", dict(pages=500, regions=16, chunks=8)
    )
    d1 = fixtures.ensure_fixtures("/root/testdata/sf0.001")
    d2 = fixtures.ensure_fixtures("/root/testdata/sf0.001")
    assert d1 == d2
    pages = pq.read_table(f"{d1}/pages")
    assert pages.num_rows == 500
    for name in ["regions", "region_edges", "queries", "knn_queries", "raster_chunks"]:
        assert pq.read_table(f"{d1}/{name}.parquet").num_rows > 0
