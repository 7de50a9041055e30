"""Closed-form UTM / transverse-Mercator transforms (WGS84) — the
arbitrary-declared-CRS adapter gap (VERDICT r3 #8; reference runs
custom-CRS stores end-to-end,
``test/.../basic/GeoWaveCustomCRSSpatialVectorIT.java:85-175``, via
GeoTools reprojection at the adapter,
``extensions/adapters/vector/.../FeatureDataAdapter.java:114-116``).

Implemented from the published Krüger flattening series in the
exponential form given by Karney, "Transverse Mercator with an
accuracy of a few nanometers" (J. Geod. 85, 2011) — the same series
printed on the public reference pages for the projection — with
4th-order coefficients in ``n`` (sub-millimeter inside a UTM zone).
The test suite cross-checks against an INDEPENDENT implementation of
the classic Snyder/Redfearn expansion (USGS Professional Paper 1395,
pp. 60-64), so a transcription slip in either series cannot pass.

Everything is vectorized numpy over coordinate arrays — these run
inside ``map_batches`` on the ingest/query paths.
"""

from __future__ import annotations

import numpy as np

# WGS84
_A = 6378137.0
_F = 1.0 / 298.257223563
_K0 = 0.9996
_E0 = 500_000.0
_N0_SOUTH = 10_000_000.0

_n = _F / (2.0 - _F)
_n2, _n3, _n4 = _n * _n, _n ** 3, _n ** 4
# rectifying radius
_AA = _A / (1.0 + _n) * (1.0 + _n2 / 4.0 + _n4 / 64.0)

# Krüger series coefficients (4th order in n)
_ALPHA = np.array(
    [
        _n / 2.0 - 2.0 * _n2 / 3.0 + 5.0 * _n3 / 16.0 + 41.0 * _n4 / 180.0,
        13.0 * _n2 / 48.0 - 3.0 * _n3 / 5.0 + 557.0 * _n4 / 1440.0,
        61.0 * _n3 / 240.0 - 103.0 * _n4 / 140.0,
        49561.0 * _n4 / 161280.0,
    ]
)
_BETA = np.array(
    [
        _n / 2.0 - 2.0 * _n2 / 3.0 + 37.0 * _n3 / 96.0 - _n4 / 360.0,
        _n2 / 48.0 + _n3 / 15.0 - 437.0 * _n4 / 1440.0,
        17.0 * _n3 / 480.0 - 37.0 * _n4 / 840.0,
        4397.0 * _n4 / 161280.0,
    ]
)
_DELTA = np.array(
    [
        2.0 * _n - 2.0 * _n2 / 3.0 - 2.0 * _n3 + 116.0 * _n4 / 45.0,
        7.0 * _n2 / 3.0 - 8.0 * _n3 / 5.0 - 227.0 * _n4 / 45.0,
        56.0 * _n3 / 15.0 - 136.0 * _n4 / 35.0,
        4279.0 * _n4 / 630.0,
    ]
)
_ES = 2.0 * np.sqrt(_n) / (1.0 + _n)  # 2*sqrt(n)/(1+n)


def utm_zone(lon: float) -> int:
    return int(np.floor((lon + 180.0) / 6.0)) % 60 + 1


def zone_central_meridian(zone: int) -> float:
    return zone * 6.0 - 183.0


def geodetic_to_utm(
    lon: np.ndarray, lat: np.ndarray, zone: int, south: bool = False
):
    """(lon, lat) degrees -> (easting, northing) meters in the zone."""
    lam0 = np.radians(zone_central_meridian(zone))
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    dlam = np.radians(np.asarray(lon, dtype=np.float64)) - lam0
    s = np.sin(phi)
    # conformal latitude via the exponential (Karney) form
    t = np.sinh(np.arctanh(s) - _ES * np.arctanh(_ES * s))
    xi_p = np.arctan2(t, np.cos(dlam))
    eta_p = np.arcsinh(np.sin(dlam) / np.hypot(t, np.cos(dlam)))
    xi = xi_p.copy()
    eta = eta_p.copy()
    for j in range(4):
        k = 2.0 * (j + 1)
        xi += _ALPHA[j] * np.sin(k * xi_p) * np.cosh(k * eta_p)
        eta += _ALPHA[j] * np.cos(k * xi_p) * np.sinh(k * eta_p)
    e = _E0 + _K0 * _AA * eta
    nth = _K0 * _AA * xi
    if south:
        nth = nth + _N0_SOUTH
    return e, nth


def utm_to_geodetic(
    e: np.ndarray, nth: np.ndarray, zone: int, south: bool = False
):
    """(easting, northing) meters -> (lon, lat) degrees."""
    lam0 = np.radians(zone_central_meridian(zone))
    nn = np.asarray(nth, dtype=np.float64)
    if south:
        nn = nn - _N0_SOUTH
    xi = nn / (_K0 * _AA)
    eta = (np.asarray(e, dtype=np.float64) - _E0) / (_K0 * _AA)
    xi_p = xi.copy()
    eta_p = eta.copy()
    for j in range(4):
        k = 2.0 * (j + 1)
        xi_p -= _BETA[j] * np.sin(k * xi) * np.cosh(k * eta)
        eta_p -= _BETA[j] * np.cos(k * xi) * np.sinh(k * eta)
    chi = np.arcsin(np.sin(xi_p) / np.cosh(eta_p))
    phi = chi.copy()
    for j in range(4):
        k = 2.0 * (j + 1)
        phi += _DELTA[j] * np.sin(k * chi)
    lam = lam0 + np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    return np.degrees(lam), np.degrees(phi)


# ---------------------------------------------------------------------------
# independent cross-check: classic Snyder/Redfearn expansion
# (USGS PP 1395 eq. 8-9..8-13) — used ONLY by the test suite
# ---------------------------------------------------------------------------

_E2 = _F * (2.0 - _F)
_EP2 = _E2 / (1.0 - _E2)


def _snyder_forward(lon, lat, zone, south=False):
    lam0 = np.radians(zone_central_meridian(zone))
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64))
    sp, cp, tp = np.sin(phi), np.cos(phi), np.tan(phi)
    nu = _A / np.sqrt(1.0 - _E2 * sp * sp)
    T = tp * tp
    C = _EP2 * cp * cp
    Aa = (lam - lam0) * cp
    e2, e4, e6 = _E2, _E2 * _E2, _E2 ** 3
    M = _A * (
        (1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * phi
        - (3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * np.sin(2 * phi)
        + (15 * e4 / 256 + 45 * e6 / 1024) * np.sin(4 * phi)
        - (35 * e6 / 3072) * np.sin(6 * phi)
    )
    east = _E0 + _K0 * nu * (
        Aa
        + (1 - T + C) * Aa ** 3 / 6
        + (5 - 18 * T + T * T + 72 * C - 58 * _EP2) * Aa ** 5 / 120
    )
    north = _K0 * (
        M
        + nu * tp * (
            Aa * Aa / 2
            + (5 - T + 9 * C + 4 * C * C) * Aa ** 4 / 24
            + (61 - 58 * T + T * T + 600 * C - 330 * _EP2) * Aa ** 6 / 720
        )
    )
    if south:
        north = north + _N0_SOUTH
    return east, north
