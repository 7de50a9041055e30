"""Closed-form UTM transforms (utm.py, VERDICT r3 #8): the 4th-order
Krüger series is validated against an INDEPENDENT implementation of
the Snyder/Redfearn expansion (two separately-published derivations —
a transcription slip in either cannot agree to sub-mm), plus exact
round-trip and known anchor points."""

import numpy as np
import pytest

from geowave_ray.utm import (
    _snyder_forward,
    geodetic_to_utm,
    utm_to_geodetic,
    utm_zone,
    zone_central_meridian,
)


def test_kruger_matches_independent_snyder():
    rng = np.random.default_rng(1)
    lon = rng.uniform(12.01, 17.99, 5000)
    lat = rng.uniform(-79.9, 83.9, 5000)
    e1, n1 = geodetic_to_utm(lon, lat, 33)
    e2, n2 = _snyder_forward(lon, lat, 33)
    # Snyder's own truncation is ~mm at high latitude
    assert np.abs(e1 - e2).max() < 2e-3
    assert np.abs(n1 - n2).max() < 2e-3


def test_roundtrip_exact():
    rng = np.random.default_rng(2)
    lon = rng.uniform(12.01, 17.99, 5000)
    lat = rng.uniform(-79.9, 83.9, 5000)
    e, n = geodetic_to_utm(lon, lat, 33)
    lon2, lat2 = utm_to_geodetic(e, n, 33)
    assert np.abs(lon2 - lon).max() < 1e-10
    assert np.abs(lat2 - lat).max() < 1e-10


def test_anchor_points():
    # equator on the central meridian -> exactly (500000, 0)
    e, n = geodetic_to_utm(np.array([15.0]), np.array([0.0]), 33)
    assert abs(e[0] - 500_000.0) < 1e-6 and abs(n[0]) < 1e-6
    # southern hemisphere false northing
    es, ns = geodetic_to_utm(np.array([15.0]), np.array([-1.0]), 33, south=True)
    en_, nn_ = geodetic_to_utm(np.array([15.0]), np.array([-1.0]), 33)
    assert abs((ns[0] - 10_000_000.0) - nn_[0]) < 1e-9
    lo, la = utm_to_geodetic(es, ns, 33, south=True)
    assert abs(lo[0] - 15.0) < 1e-10 and abs(la[0] + 1.0) < 1e-10
    # meridian scale factor: 1 UTM meter along the CM = k0 ellipsoid
    # meters, so northing(1 deg at equator on CM) ~ k0 * meridian arc
    e1, n1 = geodetic_to_utm(np.array([15.0]), np.array([1.0]), 33)
    assert abs(n1[0] - 0.9996 * 110574.389) < 1.0  # published arc length


def test_zone_helpers():
    assert utm_zone(15.0) == 33
    assert utm_zone(-180.0) == 1
    assert utm_zone(179.99) == 60
    assert zone_central_meridian(33) == 15.0
    assert zone_central_meridian(1) == -177.0


def test_crs_adapter_utm_codes():
    from geowave_ray.crs import CrsAdapter

    a = CrsAdapter("EPSG:32633")
    lon, lat = np.array([13.5]), np.array([47.25])
    x, y = a.from_index(lon, lat)
    lo, la = a.to_index(x, y)
    assert abs(lo[0] - 13.5) < 1e-10 and abs(la[0] - 47.25) < 1e-10
    s = CrsAdapter("EPSG:32733")
    assert s.utm_south and s.utm_zone == 33
    with pytest.raises(ValueError):
        CrsAdapter("EPSG:32699")
    with pytest.raises(ValueError):
        CrsAdapter("EPSG:9999")
