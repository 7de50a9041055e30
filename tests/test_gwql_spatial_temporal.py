"""GWQL spatial/temporal extension surface (gwql.py round 4 —
GWQLSpatialTemporalExtensions.java:27-77, SpatialPredicates.java,
TemporalPredicates.java, TemporalOperators.java). Brute-force numpy
oracles over a small synthetic point table."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from geowave_ray import gwql


@pytest.fixture(scope="module")
def pts(ray_session):
    rng = np.random.default_rng(7)
    n = 400
    lon = rng.uniform(-10, 10, n)
    lat = rng.uniform(-10, 10, n)
    # plant exact boundary points for TOUCHES
    lon[:3] = [0.0, 2.0, 4.0]
    lat[:3] = [0.0, 0.0, 2.0]
    ts = pd.to_datetime("2020-01-01") + pd.to_timedelta(
        rng.integers(0, 90, n), unit="D"
    )
    t = pa.table(
        {
            "pid": pa.array(np.arange(n), pa.int64()),
            "lon": pa.array(lon, pa.float64()),
            "lat": pa.array(lat, pa.float64()),
            "start": pa.array(ts, pa.timestamp("us")),
        }
    )
    return ray.data.from_arrow(t), t


SQUARE = "POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))"


def _run(sql, ds):
    df = gwql.execute(sql, {"type": ds}).to_pandas()
    return df.sort_values("pid") if len(df) else df


def test_bbox_predicate(pts):
    ds, t = pts
    out = _run("SELECT pid FROM type WHERE BBOX(geometry, -5, -5, 5, 5)", ds)
    lon = t.column("lon").to_numpy()
    lat = t.column("lat").to_numpy()
    want = np.nonzero((lon >= -5) & (lon <= 5) & (lat >= -5) & (lat <= 5))[0]
    assert out["pid"].to_numpy().tolist() == want.tolist()


def test_bbox_with_crs_literal(pts):
    ds, t = pts
    # the same envelope declared in web-mercator meters
    from geowave_ray.crs import to_web_mercator

    (x0, x1), (y0, y1) = to_web_mercator(
        np.array([-5.0, 5.0]), np.array([-5.0, 5.0])
    )[0], to_web_mercator(np.array([-5.0, 5.0]), np.array([-5.0, 5.0]))[1]
    out = _run(
        f"SELECT pid FROM type WHERE BBOX(geometry, {x0}, {y0}, {x1}, {y1},"
        f" 'EPSG:3857')",
        ds,
    )
    ref = _run("SELECT pid FROM type WHERE BBOX(geometry, -5, -5, 5, 5)", ds)
    assert out["pid"].tolist() == ref["pid"].tolist()


def test_intersects_within_disjoint(pts):
    ds, t = pts
    lon = t.column("lon").to_numpy()
    lat = t.column("lat").to_numpy()
    inside = (lon >= 0) & (lon <= 4) & (lat >= 0) & (lat <= 4)  # convex square
    got = _run(
        f"SELECT pid FROM type WHERE INTERSECTS(geometry, '{SQUARE}')", ds
    )["pid"].to_numpy()
    assert np.array_equal(got, np.nonzero(inside)[0])
    got_w = _run(
        f"SELECT pid FROM type WHERE WITHIN(geometry, '{SQUARE}')", ds
    )["pid"].to_numpy()
    assert np.array_equal(got_w, np.nonzero(inside)[0])
    got_d = _run(
        f"SELECT pid FROM type WHERE DISJOINT(geometry, '{SQUARE}')", ds
    )["pid"].to_numpy()
    assert np.array_equal(got_d, np.nonzero(~inside)[0])


def test_loose_variants_use_envelope(pts):
    ds, t = pts
    tri = "POLYGON((0 0, 4 0, 0 4, 0 0))"
    lon = t.column("lon").to_numpy()
    lat = t.column("lat").to_numpy()
    env = (lon >= 0) & (lon <= 4) & (lat >= 0) & (lat <= 4)
    got = _run(
        f"SELECT pid FROM type WHERE INTERSECTSLOOSE(geometry, '{tri}')", ds
    )["pid"].to_numpy()
    assert np.array_equal(got, np.nonzero(env)[0])
    got_d = _run(
        f"SELECT pid FROM type WHERE DISJOINTLOOSE(geometry, '{tri}')", ds
    )["pid"].to_numpy()
    assert np.array_equal(got_d, np.nonzero(~env)[0])


def test_touches_crosses_overlaps_point_semantics(pts):
    ds, t = pts
    got = _run(
        f"SELECT pid FROM type WHERE TOUCHES(geometry, '{SQUARE}')", ds
    )["pid"].to_numpy()
    # the three planted boundary points (corner, edge, edge) touch;
    # random uniform draws hit the boundary with probability 0
    assert got.tolist() == [0, 1, 2]
    assert _run(
        f"SELECT pid FROM type WHERE CROSSES(geometry, '{SQUARE}')", ds
    ).empty
    assert _run(
        f"SELECT pid FROM type WHERE OVERLAPS(geometry, '{SQUARE}')", ds
    ).empty


def test_intersects_point_literal(pts):
    ds, t = pts
    x = float(t.column("lon")[5].as_py())
    y = float(t.column("lat")[5].as_py())
    got = _run(
        f"SELECT pid FROM type WHERE INTERSECTS(geometry, 'POINT({x} {y})')",
        ds,
    )["pid"].to_numpy()
    assert 5 in got.tolist()


def test_temporal_operators(pts):
    ds, t = pts
    s = pd.Series(t.column("start").to_pandas())
    cut = pd.Timestamp("2020-02-01")
    lo, hi = pd.Timestamp("2020-01-15"), pd.Timestamp("2020-02-15")
    cases = {
        "start BEFORE '2020-02-01'": s <= cut,  # end(v) <= start: instant end = +1us
        "start AFTER '2020-02-01'": s > cut,
        "start DURING '2020-01-15/2020-02-15'": (s >= lo) & (s < hi),
        "start BEFORE_OR_DURING '2020-01-15/2020-02-15'": s < hi,
        "start DURING_OR_AFTER '2020-01-15/2020-02-15'": s >= lo,
    }
    for sql_pred, mask in cases.items():
        got = _run(f"SELECT pid FROM type WHERE {sql_pred}", ds)["pid"]
        want = np.nonzero(mask.to_numpy())[0]
        # instant-width (+1us) and inclusive-end subtleties: compare via
        # the reference semantics directly
        if sql_pred.split()[1] == "BEFORE":
            want = np.nonzero((s + pd.Timedelta(microseconds=1) <= cut).to_numpy())[0]
        assert got.tolist() == want.tolist(), sql_pred


def test_temporal_predicates(pts):
    ds, t = pts
    s = pd.Series(t.column("start").to_pandas())
    lo, hi = pd.Timestamp("2020-01-15"), pd.Timestamp("2020-02-15")
    got = _run(
        "SELECT pid FROM type WHERE TOVERLAPS(start, '2020-01-15/2020-02-15')",
        ds,
    )["pid"]
    # instant [s, s+1us) overlaps [lo, hi) iff s+1us > lo and s < hi
    mask = ((s + pd.Timedelta(microseconds=1)) > lo) & (s < hi)
    assert got.tolist() == np.nonzero(mask.to_numpy())[0].tolist()
    got_c = _run(
        "SELECT pid FROM type WHERE TCONTAINS(start, '2020-02-01')", ds
    )["pid"]
    # field instant interval contains the literal instant interval only
    # when they coincide
    mask_c = s == pd.Timestamp("2020-02-01")
    assert got_c.tolist() == np.nonzero(mask_c.to_numpy())[0].tolist()
