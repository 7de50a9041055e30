"""Parameter-defined map projections (a tiny proj-string subset) —
the generalization of the declared-CRS adapter beyond enumerated EPSG
codes. The reference accepts ANY CRS the GeoTools referencing engine
can define from projection parameters
(``extensions/adapters/vector/.../FeatureDataAdapter.java:114-116``;
custom-CRS stores end-to-end in
``test/.../basic/GeoWaveCustomCRSSpatialVectorIT.java:85-175``); this
module covers the parameter-defined core of that capability without
geo libs:

    +proj=longlat
    +proj=merc  [+lon_0 +k_0 +x_0 +y_0]
    +proj=tmerc [+lon_0 +lat_0 +k_0 +x_0 +y_0]      (Krüger series)
    +proj=lcc   +lat_1 [+lat_2] [+lat_0 +lon_0 +x_0 +y_0]

All on the WGS84 ellipsoid (the only datum the engine stores), all
closed-form and vectorized (these run inside ``map_batches``).

Sources are the published derivations: Snyder, *Map Projections — A
Working Manual* (USGS PP 1395): Mercator eqs. 7-7/7-8, Lambert
Conformal Conic eqs. 14-1..15-11; transverse Mercator via the Karney
exponential Krüger series already in ``utm.py``. Correctness is pinned
by projection INVARIANTS in the test suite (scale factor k == 1 on the
standard parallels / central meridian by construction, numeric k from
finite differences, spherical-limit agreement against independently
derived spherical formulas, sub-mm roundtrips) rather than memorized
worked examples.
"""

from __future__ import annotations

import numpy as np

from .utm import _AA, _ALPHA, _BETA, _DELTA, _ES

_A = 6378137.0
_F = 1.0 / 298.257223563
_E2 = _F * (2.0 - _F)
_E = np.sqrt(_E2)


def _wrap_rad(dlam: np.ndarray) -> np.ndarray:
    """Wrap a longitude difference to (-pi, pi] — points more than 180
    degrees from the central meridian must project on the NEAR branch
    (proj behavior), not a phantom far cone/cylinder branch."""
    return dlam - 2.0 * np.pi * np.round(dlam / (2.0 * np.pi))


def _wrap_deg(lon: np.ndarray) -> np.ndarray:
    return lon - 360.0 * np.round(np.asarray(lon) / 360.0)


def parse_proj(s: str) -> dict:
    """'+proj=lcc +lat_1=33 +lat_2=45 ...' -> {'proj': 'lcc', ...}."""
    out: dict = {}
    for tok in s.split():
        if not tok.startswith("+"):
            raise ValueError(f"bad proj token {tok!r}")
        body = tok[1:]
        if "=" in body:
            k, v = body.split("=", 1)
            try:
                out[k] = float(v)
            except ValueError:
                out[k] = v
        else:
            out[body] = True
    if "proj" not in out:
        raise ValueError("proj string needs +proj=")
    return out


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _merc_fwd(lon, lat, lon0: float, k0: float, x0: float, y0: float):
    """Ellipsoidal Mercator (PP 1395 eq. 7-7): x = a k0 (λ-λ0),
    y = a k0 ln[tan(π/4+φ/2) ((1-e sinφ)/(1+e sinφ))^(e/2)]."""
    lam = _wrap_rad(np.radians(np.asarray(lon, np.float64)) - np.radians(lon0))
    phi = np.radians(np.asarray(lat, np.float64))
    s = np.sin(phi)
    y = np.log(np.tan(np.pi / 4 + phi / 2)) - _E / 2 * np.log(
        (1 + _E * s) / (1 - _E * s)
    )
    return _A * k0 * lam + x0, _A * k0 * y + y0


def _merc_inv(x, y, lon0: float, k0: float, x0: float, y0: float):
    lam = (np.asarray(x, np.float64) - x0) / (_A * k0)
    psi = (np.asarray(y, np.float64) - y0) / (_A * k0)
    t = np.exp(-psi)
    phi = np.pi / 2 - 2 * np.arctan(t)
    for _ in range(8):  # PP 1395 eq. 7-9 fixed point
        s = np.sin(phi)
        phi = np.pi / 2 - 2 * np.arctan(
            t * ((1 - _E * s) / (1 + _E * s)) ** (_E / 2)
        )
    return _wrap_deg(np.degrees(lam) + lon0), np.degrees(phi)


def _tmerc_fwd(lon, lat, lon0: float, lat0: float, k0: float,
               x0: float, y0: float):
    """General transverse Mercator: the utm.py Krüger kernel with free
    (lon0, lat0, k0, false origin)."""
    lam0 = np.radians(lon0)
    phi = np.radians(np.asarray(lat, np.float64))
    dlam = _wrap_rad(np.radians(np.asarray(lon, np.float64)) - lam0)
    s = np.sin(phi)
    t = np.sinh(np.arctanh(s) - _ES * np.arctanh(_ES * s))
    xi_p = np.arctan2(t, np.cos(dlam))
    eta_p = np.arcsinh(np.sin(dlam) / np.hypot(t, np.cos(dlam)))
    xi = xi_p.copy()
    eta = eta_p.copy()
    for j in range(4):
        k = 2.0 * (j + 1)
        xi += _ALPHA[j] * np.sin(k * xi_p) * np.cosh(k * eta_p)
        eta += _ALPHA[j] * np.cos(k * xi_p) * np.sinh(k * eta_p)
    y_origin = 0.0
    if lat0:
        y_origin = _merid_xi(np.radians(lat0)) * _AA
    return (
        x0 + k0 * _AA * eta,
        y0 + k0 * (_AA * xi - y_origin),
    )


def _merid_xi(phi0: float) -> float:
    """Rectifying latitude of a single φ (for tmerc +lat_0)."""
    s = np.sin(phi0)
    t = np.sinh(np.arctanh(s) - _ES * np.arctanh(_ES * s))
    xi_p = np.arctan2(t, np.cos(0.0))
    xi = xi_p
    for j in range(4):
        k = 2.0 * (j + 1)
        xi += _ALPHA[j] * np.sin(k * xi_p)
    return float(xi)


def _tmerc_inv(x, y, lon0: float, lat0: float, k0: float,
               x0: float, y0: float):
    lam0 = np.radians(lon0)
    y_origin = _merid_xi(np.radians(lat0)) * _AA if lat0 else 0.0
    xi = (np.asarray(y, np.float64) - y0 + k0 * y_origin) / (k0 * _AA)
    eta = (np.asarray(x, np.float64) - x0) / (k0 * _AA)
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
    return _wrap_deg(np.degrees(lam)), np.degrees(phi)


def _lcc_consts(lat1: float, lat2: float, lat0: float):
    """PP 1395 eqs. 14-15 (m), 15-9 (t), 15-8 (n), 15-10 (F)."""

    def m(phi):
        s = np.sin(phi)
        return np.cos(phi) / np.sqrt(1.0 - _E2 * s * s)

    def tfun(phi):
        s = np.sin(phi)
        return np.tan(np.pi / 4 - phi / 2) / (
            (1 - _E * s) / (1 + _E * s)
        ) ** (_E / 2)

    p1, p2, p0 = np.radians(lat1), np.radians(lat2), np.radians(lat0)
    m1, t1 = m(p1), tfun(p1)
    if abs(lat2 - lat1) < 1e-12:
        n = float(np.sin(p1))  # 1SP limit (PP 1395 p. 105)
    else:
        m2, t2 = m(p2), tfun(p2)
        n = float((np.log(m1) - np.log(m2)) / (np.log(t1) - np.log(t2)))
    F = float(m1 / (n * t1 ** n))
    rho0 = float(_A * F * tfun(p0) ** n)
    return n, F, rho0, tfun


def _lcc_fwd(lon, lat, lat1, lat2, lat0, lon0, x0, y0):
    n, F, rho0, tfun = _lcc_consts(lat1, lat2, lat0)
    phi = np.radians(np.asarray(lat, np.float64))
    theta = n * _wrap_rad(
        np.radians(np.asarray(lon, np.float64)) - np.radians(lon0)
    )
    rho = _A * F * tfun(phi) ** n
    return (
        x0 + rho * np.sin(theta),
        y0 + rho0 - rho * np.cos(theta),
    )


def _lcc_inv(x, y, lat1, lat2, lat0, lon0, x0, y0):
    n, F, rho0, _tfun = _lcc_consts(lat1, lat2, lat0)
    xp = np.asarray(x, np.float64) - x0
    yp = rho0 - (np.asarray(y, np.float64) - y0)
    rho = np.sign(n) * np.hypot(xp, yp)
    theta = np.arctan2(np.sign(n) * xp, np.sign(n) * yp)
    t = (rho / (_A * F)) ** (1.0 / n)
    phi = np.pi / 2 - 2 * np.arctan(t)
    for _ in range(8):  # PP 1395 eq. 7-9
        s = np.sin(phi)
        phi = np.pi / 2 - 2 * np.arctan(
            t * ((1 - _E * s) / (1 + _E * s)) ** (_E / 2)
        )
    lam = theta / n + np.radians(lon0)
    return _wrap_deg(np.degrees(lam)), np.degrees(phi)


# ---------------------------------------------------------------------------
# public transform pair
# ---------------------------------------------------------------------------


class ProjCRS:
    """Forward/inverse transform pair for one parsed proj string —
    plugs into ``crs.CrsAdapter`` as the param-defined branch."""

    # parameters this module can honor; anything else that would CHANGE
    # the transform (+ellps/+a/+b/+R/+units/+to_meter/+pm/+towgs84/...)
    # must be REJECTED, not silently computed on WGS84 meters
    _KNOWN = {
        "proj", "lat_0", "lat_1", "lat_2", "lon_0", "k_0", "x_0", "y_0",
        "no_defs", "type", "wktext",
    }
    _HARMLESS = {("ellps", "WGS84"), ("datum", "WGS84"), ("units", "m")}

    def __init__(self, proj_string: str) -> None:
        self.params = parse_proj(proj_string)
        self.proj = self.params["proj"]
        if self.proj not in ("longlat", "merc", "tmerc", "lcc"):
            raise ValueError(f"unsupported +proj={self.proj}")
        if self.proj == "lcc" and "lat_1" not in self.params:
            raise ValueError("lcc needs +lat_1")
        unknown = [
            k for k, v in self.params.items()
            if k not in self._KNOWN and (k, v) not in self._HARMLESS
        ]
        if unknown:
            raise ValueError(
                f"unsupported proj parameter(s) {unknown} — this engine "
                f"computes WGS84 meters only (supported: "
                f"{sorted(self._KNOWN)})"
            )
        self.proj_string = proj_string

    def _p(self, key: str, default: float = 0.0) -> float:
        return float(self.params.get(key, default))

    def forward(self, lon: np.ndarray, lat: np.ndarray):
        """(lon, lat) degrees -> projected (x, y) meters."""
        if self.proj == "longlat":
            return np.asarray(lon, np.float64), np.asarray(lat, np.float64)
        x0, y0 = self._p("x_0"), self._p("y_0")
        lon0 = self._p("lon_0")
        if self.proj == "merc":
            return _merc_fwd(lon, lat, lon0, self._p("k_0", 1.0), x0, y0)
        if self.proj == "tmerc":
            return _tmerc_fwd(
                lon, lat, lon0, self._p("lat_0"), self._p("k_0", 1.0), x0, y0
            )
        return _lcc_fwd(
            lon, lat, self._p("lat_1"),
            self._p("lat_2", self._p("lat_1")), self._p("lat_0"),
            lon0, x0, y0,
        )

    def inverse(self, x: np.ndarray, y: np.ndarray):
        """projected (x, y) meters -> (lon, lat) degrees."""
        if self.proj == "longlat":
            return np.asarray(x, np.float64), np.asarray(y, np.float64)
        x0, y0 = self._p("x_0"), self._p("y_0")
        lon0 = self._p("lon_0")
        if self.proj == "merc":
            return _merc_inv(x, y, lon0, self._p("k_0", 1.0), x0, y0)
        if self.proj == "tmerc":
            return _tmerc_inv(
                x, y, lon0, self._p("lat_0"), self._p("k_0", 1.0), x0, y0
            )
        return _lcc_inv(
            x, y, self._p("lat_1"),
            self._p("lat_2", self._p("lat_1")), self._p("lat_0"),
            lon0, x0, y0,
        )

    def scale_factor(self, lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
        """Numeric point scale k from finite differences along a
        meridian (conformal ⇒ isotropic): the test-suite invariant
        hook (k == 1 on standard parallels / scaled central meridian)."""
        h = 1e-7  # degrees
        x1, y1 = self.forward(lon, np.asarray(lat) - h / 2)
        x2, y2 = self.forward(lon, np.asarray(lat) + h / 2)
        ground = _meridian_radius(np.radians(np.asarray(lat))) * np.radians(h)
        return np.hypot(x2 - x1, y2 - y1) / ground


def _meridian_radius(phi: np.ndarray) -> np.ndarray:
    s2 = np.sin(phi) ** 2
    return _A * (1.0 - _E2) / (1.0 - _E2 * s2) ** 1.5
