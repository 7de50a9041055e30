"""Parameter-defined projections (proj.py — the arbitrary-declared-CRS
adapter role). Correctness is pinned by projection INVARIANTS that
uniquely characterize each projection within its conformal family:

- LCC 2SP: scale factor k == 1 exactly on BOTH standard parallels, and
  the false origin maps (lat_0, lon_0) -> (x_0, y_0). Within the
  conformal-conic family these conditions determine (n, F, rho0)
  uniquely, so no memorized worked example is needed.
- tmerc: k == k_0 on the central meridian; matches utm.py (which has
  its own independent Snyder cross-check) at UTM parameters.
- merc: k == k_0 on the equator; +proj=merc defaults match the
  EPSG:3857 kernel at web-mercator latitudes.
- all: forward∘inverse == identity to sub-millimeter.
"""

import numpy as np
import pytest

from geowave_ray.proj import ProjCRS, parse_proj


def test_parse_proj():
    p = parse_proj("+proj=lcc +lat_1=33 +lat_2=45 +lon_0=-96 +x_0=100")
    assert p == {"proj": "lcc", "lat_1": 33.0, "lat_2": 45.0,
                 "lon_0": -96.0, "x_0": 100.0}
    with pytest.raises(ValueError):
        parse_proj("+lat_1=33")
    with pytest.raises(ValueError):
        ProjCRS("+proj=aea +lat_1=20")  # unsupported family
    with pytest.raises(ValueError):
        ProjCRS("+proj=lcc")  # lcc needs lat_1


LCC = "+proj=lcc +lat_1=33 +lat_2=45 +lat_0=23 +lon_0=-96 +x_0=2000000 +y_0=500000"


def test_lcc_unit_scale_on_standard_parallels():
    c = ProjCRS(LCC)
    lons = np.linspace(-120, -70, 11)
    for lat in (33.0, 45.0):
        k = c.scale_factor(lons, np.full_like(lons, lat))
        assert np.allclose(k, 1.0, atol=1e-6), (lat, k)  # 1e-6: FD float noise at 1e7-m coords
    # between the parallels k < 1, outside k > 1 (conic behavior)
    assert (c.scale_factor(np.array([-96.0]), np.array([39.0])) < 1.0).all()
    assert (c.scale_factor(np.array([-96.0]), np.array([25.0])) > 1.0).all()
    assert (c.scale_factor(np.array([-96.0]), np.array([50.0])) > 1.0).all()


def test_lcc_false_origin_and_axes():
    c = ProjCRS(LCC)
    x, y = c.forward(np.array([-96.0]), np.array([23.0]))
    assert abs(x[0] - 2000000.0) < 1e-6 and abs(y[0] - 500000.0) < 1e-6
    # east of lon_0 -> larger x; north of lat_0 -> larger y
    x2, y2 = c.forward(np.array([-90.0]), np.array([30.0]))
    assert x2[0] > x[0] and y2[0] > y[0]


def test_lcc_roundtrip_submm():
    c = ProjCRS(LCC)
    rng = np.random.default_rng(1)
    lon = rng.uniform(-130, -60, 4000)
    lat = rng.uniform(20, 55, 4000)
    x, y = c.forward(lon, lat)
    lon2, lat2 = c.inverse(x, y)
    # sub-mm: one degree latitude ~ 111 km -> 1e-9 deg ~ 0.1 mm
    assert np.abs(lon2 - lon).max() < 1e-9
    assert np.abs(lat2 - lat).max() < 1e-9


def test_lcc_single_parallel_limit():
    # 2SP cone constant n converges LINEARLY to the 1SP value sin(lat_1)
    # as lat_2 -> lat_1 (before float cancellation kicks in)
    from geowave_ray.proj import _lcc_consts

    n1sp, _, _, _ = _lcc_consts(40, 40, 0)
    assert abs(n1sp - np.sin(np.radians(40))) < 1e-15
    errs = [abs(_lcc_consts(40, 40 + d, 0)[0] - n1sp)
            for d in (1.0, 0.1, 0.01)]
    assert errs[0] > errs[1] > errs[2]
    assert errs[2] < 1e-4
    k = ProjCRS("+proj=lcc +lat_1=40").scale_factor(
        np.array([0.0]), np.array([40.0])
    )
    assert abs(k[0] - 1.0) < 1e-6


def test_tmerc_matches_utm_kernel():
    from geowave_ray.utm import geodetic_to_utm

    c = ProjCRS("+proj=tmerc +lon_0=15 +k_0=0.9996 +x_0=500000")
    rng = np.random.default_rng(2)
    lon = rng.uniform(12, 18, 1000)
    lat = rng.uniform(-60, 60, 1000)
    x, y = c.forward(lon, lat)
    xe, ye = geodetic_to_utm(lon, lat, zone=33)  # zone 33: lon_0 = 15
    assert np.allclose(x, xe, atol=1e-6) and np.allclose(y, ye, atol=1e-6)
    k = c.scale_factor(np.full(5, 15.0), np.linspace(-70, 70, 5))
    assert np.allclose(k, 0.9996, atol=1e-6)


def test_tmerc_lat0_shifts_origin():
    c = ProjCRS("+proj=tmerc +lon_0=10 +lat_0=45")
    x, y = c.forward(np.array([10.0]), np.array([45.0]))
    assert abs(x[0]) < 1e-6 and abs(y[0]) < 1e-6
    lon2, lat2 = c.inverse(np.array([0.0]), np.array([0.0]))
    assert abs(lon2[0] - 10.0) < 1e-9 and abs(lat2[0] - 45.0) < 1e-9


def test_merc_matches_web_mercator_shape():
    c = ProjCRS("+proj=merc")
    k = c.scale_factor(np.linspace(-170, 170, 5), np.zeros(5))
    assert np.allclose(k, 1.0, atol=1e-6)  # k_0 = 1 on the equator
    rng = np.random.default_rng(3)
    lon = rng.uniform(-179, 179, 2000)
    lat = rng.uniform(-80, 80, 2000)
    x, y = c.forward(lon, lat)
    lon2, lat2 = c.inverse(x, y)
    assert np.abs(lon2 - lon).max() < 1e-9
    assert np.abs(lat2 - lat).max() < 1e-9


def test_transform_affecting_params_rejected():
    # silently computing WGS84 meters for another datum/unit would be
    # wrong by hundreds of meters — must refuse loudly
    for bad in (
        "+proj=merc +R=6371000",
        "+proj=lcc +lat_1=33 +ellps=GRS80",
        "+proj=tmerc +lon_0=9 +units=us-ft",
        "+proj=merc +towgs84=1,2,3",
    ):
        with pytest.raises(ValueError, match="unsupported proj parameter"):
            ProjCRS(bad)
    # harmless spellings of the defaults are accepted
    ProjCRS("+proj=merc +ellps=WGS84 +datum=WGS84 +units=m +no_defs")


def test_antimeridian_longitude_wrapping():
    # a point >180 deg from lon_0 must project on the NEAR branch and
    # roundtrip back into [-180, 180]
    for ps in (
        "+proj=lcc +lat_1=30 +lat_2=50 +lon_0=-96",
        "+proj=merc +lon_0=-96",
        "+proj=tmerc +lon_0=-170",
    ):
        c = ProjCRS(ps)
        lon = np.array([170.0, 179.5])
        lat = np.array([40.0, 10.0])
        x1, y1 = c.forward(lon, lat)
        x2, y2 = c.forward(lon - 360.0, lat)  # same physical points
        assert np.allclose(x1, x2, atol=1e-6) and np.allclose(y1, y2, atol=1e-6)
        lon_rt, lat_rt = c.inverse(x1, y1)
        assert np.all(np.abs(lon_rt) <= 180.0)
        assert np.allclose(lon_rt, lon, atol=1e-9) or np.allclose(
            lon_rt, lon - 360.0, atol=1e-9
        )
        assert np.allclose(lat_rt, lat, atol=1e-9)


def test_crs_adapter_proj_string():
    from geowave_ray.crs import CrsAdapter

    a = CrsAdapter("+proj=lcc +lat_1=33 +lat_2=45 +lon_0=-96")
    lon = np.array([-100.0, -90.0])
    lat = np.array([30.0, 42.0])
    x, y = a.from_index(lon, lat)
    lon2, lat2 = a.to_index(x, y)
    assert np.abs(lon2 - lon).max() < 1e-9
    assert np.abs(lat2 - lat).max() < 1e-9
    assert CrsAdapter("+proj=longlat").proj is not None
    with pytest.raises(ValueError):
        CrsAdapter("EPSG:2154")  # enumerated non-UTM codes still rejected