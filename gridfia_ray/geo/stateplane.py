"""Per-state projected-CRS family (M18 → full): Lambert Conformal Conic
(2SP), Transverse Mercator, and Hotine Oblique Mercator (variant B),
closed-form from public formulas, plus the reference's 50-state lookup.

The reference selects a per-state target CRS for bbox conversion
(``gridfia/utils/location_config.py:320-379`` — the ``STATE_PLANE_CRS``
table, applied via ``transform_bounds`` at ``location_config.py:301-318``).
Its table mixes true State Plane NAD83 zones (EPSG:26929+, LCC or TM),
NAD83 UTM zones (EPSG:26910–26919, TM with k0=0.9996), and two
foot-based zones (EPSG:2256 international ft, EPSG:2264 US survey ft).
All are reproduced here with their EPSG-registry parameters.

Formulas (public domain / openly published):
* TM: Snyder, *Map Projections — A Working Manual* (USGS PP 1395),
  eqs. 8-9..8-17 (forward) and 8-18..8-25 (inverse); accurate to <1 mm
  within a UTM-width zone.
* LCC 2SP: Snyder eqs. 15-1..15-11 / EPSG Guidance Note 7-2 §3.1.1.
* HOM variant B: EPSG Guidance Note 7-2 §3.1.4 (Snyder eqs. 9-1..9-8
  with the variant-B center offset) — Alaska zone 1.

NAD83 geographic coordinates are treated as numerically identical to
WGS84 (they differ by ~1 m, far below tile-bbox fidelity; the reference
makes the same conflation by feeding EPSG:4326 bounds into NAD83 state
plane codes).

Everything is vectorized numpy; anchors are validated in
``tests/test_stateplane.py`` against EPSG Guidance Note 7-2 published
test vectors plus defining-property checks (unit scale on standard
parallels, k0 on the central meridian, conformality, round-trips).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

# ellipsoids (a, 1/f) — public geodetic constants
GRS80 = (6378137.0, 298.257222101)
CLARKE_1866 = (6378206.4, 294.978698214)  # e2 = 0.00676866
AIRY_1830 = (6377563.396, 299.3249646)
EVEREST_1967 = (6377298.556, 300.8017)

FT_INT = 0.3048  # international foot, exact
FT_US = 1200.0 / 3937.0  # US survey foot, exact


def _ell(ell):
    a, invf = ell
    f = 1.0 / invf
    e2 = f * (2.0 - f)
    return a, e2, np.sqrt(e2)


def _t_conf(phi, e):
    """Isometric-latitude kernel t (Snyder 15-9)."""
    es = e * np.sin(phi)
    return np.tan(np.pi / 4.0 - phi / 2.0) / ((1.0 - es) / (1.0 + es)) ** (e / 2.0)


def _phi_from_t(t, e, max_iter=15, tol=1e-13):
    """Invert t(phi) by fixed-point iteration (Snyder 7-9/15-3)."""
    phi = np.pi / 2.0 - 2.0 * np.arctan(t)
    for _ in range(max_iter):
        es = e * np.sin(phi)
        new = np.pi / 2.0 - 2.0 * np.arctan(t * ((1.0 - es) / (1.0 + es)) ** (e / 2.0))
        if np.max(np.abs(new - phi)) < tol:
            phi = new
            break
        phi = new
    return phi


# -- Transverse Mercator (Snyder 8-9..8-25) ----------------------------------


@dataclass(frozen=True)
class TM:
    lat0: float
    lon0: float
    k0: float
    fe: float
    fn: float
    ellipsoid: tuple[float, float] = GRS80

    def _m(self, phi):
        a, e2, _ = _ell(self.ellipsoid)
        e4, e6 = e2 * e2, e2 * e2 * e2
        return a * (
            (1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * phi
            - (3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * np.sin(2 * phi)
            + (15 * e4 / 256 + 45 * e6 / 1024) * np.sin(4 * phi)
            - (35 * e6 / 3072) * np.sin(6 * phi)
        )

    def forward(self, lon, lat):
        a, e2, _ = _ell(self.ellipsoid)
        ep2 = e2 / (1.0 - e2)
        phi = np.radians(np.asarray(lat, np.float64))
        lam = np.radians(np.asarray(lon, np.float64) - self.lon0)
        sin_p, cos_p = np.sin(phi), np.cos(phi)
        N = a / np.sqrt(1 - e2 * sin_p * sin_p)
        T = (sin_p / cos_p) ** 2
        C = ep2 * cos_p * cos_p
        A = lam * cos_p
        M = self._m(phi)
        M0 = self._m(np.radians(self.lat0))
        A2, A3 = A * A, A * A * A
        x = self.k0 * N * (
            A + (1 - T + C) * A3 / 6 + (5 - 18 * T + T * T + 72 * C - 58 * ep2) * A3 * A2 / 120
        ) + self.fe
        y = self.k0 * (
            M - M0
            + N * (sin_p / cos_p) * (
                A2 / 2
                + (5 - T + 9 * C + 4 * C * C) * A2 * A2 / 24
                + (61 - 58 * T + T * T + 600 * C - 330 * ep2) * A2 * A2 * A2 / 720
            )
        ) + self.fn
        return x, y

    def inverse(self, x, y):
        a, e2, _ = _ell(self.ellipsoid)
        ep2 = e2 / (1.0 - e2)
        x = np.asarray(x, np.float64) - self.fe
        y = np.asarray(y, np.float64) - self.fn
        M = self._m(np.radians(self.lat0)) + y / self.k0
        e1 = (1 - np.sqrt(1 - e2)) / (1 + np.sqrt(1 - e2))
        mu = M / (a * (1 - e2 / 4 - 3 * e2 * e2 / 64 - 5 * e2**3 / 256))
        phi1 = (
            mu
            + (3 * e1 / 2 - 27 * e1**3 / 32) * np.sin(2 * mu)
            + (21 * e1**2 / 16 - 55 * e1**4 / 32) * np.sin(4 * mu)
            + (151 * e1**3 / 96) * np.sin(6 * mu)
            + (1097 * e1**4 / 512) * np.sin(8 * mu)
        )
        sin1, cos1 = np.sin(phi1), np.cos(phi1)
        C1 = ep2 * cos1 * cos1
        T1 = (sin1 / cos1) ** 2
        N1 = a / np.sqrt(1 - e2 * sin1 * sin1)
        R1 = a * (1 - e2) / (1 - e2 * sin1 * sin1) ** 1.5
        D = x / (N1 * self.k0)
        D2 = D * D
        phi = phi1 - (N1 * sin1 / cos1 / R1) * (
            D2 / 2
            - (5 + 3 * T1 + 10 * C1 - 4 * C1 * C1 - 9 * ep2) * D2 * D2 / 24
            + (61 + 90 * T1 + 298 * C1 + 45 * T1 * T1 - 252 * ep2 - 3 * C1 * C1)
            * D2 * D2 * D2 / 720
        )
        lam = (
            D
            - (1 + 2 * T1 + C1) * D * D2 / 6
            + (5 - 2 * C1 + 28 * T1 - 3 * C1 * C1 + 8 * ep2 + 24 * T1 * T1) * D * D2 * D2 / 120
        ) / cos1
        return self.lon0 + np.degrees(lam), np.degrees(phi)


# -- Lambert Conformal Conic 2SP (Snyder 15-1..15-11) ------------------------


@dataclass(frozen=True)
class LCC:
    lat1: float
    lat2: float
    lat0: float
    lon0: float
    fe: float
    fn: float
    ellipsoid: tuple[float, float] = GRS80

    def _consts(self):
        a, e2, e = _ell(self.ellipsoid)
        p1, p2, p0 = (np.radians(v) for v in (self.lat1, self.lat2, self.lat0))

        def m(phi):
            s = np.sin(phi)
            return np.cos(phi) / np.sqrt(1 - e2 * s * s)

        m1, m2 = m(p1), m(p2)
        t1, t2, t0 = _t_conf(p1, e), _t_conf(p2, e), _t_conf(p0, e)
        if abs(self.lat1 - self.lat2) < 1e-12:
            n = np.sin(p1)
        else:
            n = (np.log(m1) - np.log(m2)) / (np.log(t1) - np.log(t2))
        F = m1 / (n * t1**n)
        rho0 = a * F * t0**n
        return a, e, n, F, rho0

    def forward(self, lon, lat):
        a, e, n, F, rho0 = self._consts()
        phi = np.radians(np.asarray(lat, np.float64))
        t = _t_conf(phi, e)
        rho = a * F * t**n
        theta = n * np.radians(np.asarray(lon, np.float64) - self.lon0)
        return rho * np.sin(theta) + self.fe, rho0 - rho * np.cos(theta) + self.fn

    def inverse(self, x, y):
        a, e, n, F, rho0 = self._consts()
        xp = np.asarray(x, np.float64) - self.fe
        yp = rho0 - (np.asarray(y, np.float64) - self.fn)
        rho = np.sign(n) * np.sqrt(xp * xp + yp * yp)
        theta = np.arctan2(np.sign(n) * xp, np.sign(n) * yp)
        t = (rho / (a * F)) ** (1.0 / n)
        lon = self.lon0 + np.degrees(theta / n)
        return lon, np.degrees(_phi_from_t(t, e))


# -- Hotine Oblique Mercator, variant B (EPSG GN7-2 §3.1.4) ------------------


@dataclass(frozen=True)
class HOM:
    latc: float
    lonc: float
    azimuth: float  # of the initial line at the projection center
    gamma_c: float  # rectified grid angle
    k0: float
    ec: float  # easting at projection center (variant B)
    nc: float  # northing at projection center (variant B)
    ellipsoid: tuple[float, float] = GRS80

    def _consts(self):
        a, e2, e = _ell(self.ellipsoid)
        pc = np.radians(self.latc)
        alc = np.radians(self.azimuth)
        cos_pc, sin_pc = np.cos(pc), np.sin(pc)
        B = np.sqrt(1 + e2 * cos_pc**4 / (1 - e2))
        A = a * B * self.k0 * np.sqrt(1 - e2) / (1 - e2 * sin_pc * sin_pc)
        t0 = _t_conf(pc, e)
        D = B * np.sqrt(1 - e2) / (cos_pc * np.sqrt(1 - e2 * sin_pc * sin_pc))
        D2 = max(D * D, 1.0)
        F = D + np.sqrt(D2 - 1.0) * np.sign(pc)
        H = F * t0**B
        G = (F - 1.0 / F) / 2.0
        gamma0 = np.arcsin(np.sin(alc) / D)
        lam0 = np.radians(self.lonc) - np.arcsin(G * np.tan(gamma0)) / B
        uc = (A / B) * np.arctan2(np.sqrt(D2 - 1.0), np.cos(alc)) * np.sign(pc)
        return a, e, A, B, H, gamma0, lam0, uc

    def forward(self, lon, lat):
        _, e, A, B, H, gamma0, lam0, uc = self._consts()
        phi = np.radians(np.asarray(lat, np.float64))
        lam = np.radians(np.asarray(lon, np.float64))
        t = _t_conf(phi, e)
        Q = H / t**B
        S = (Q - 1.0 / Q) / 2.0
        Tq = (Q + 1.0 / Q) / 2.0
        V = np.sin(B * (lam - lam0))
        U = (-V * np.cos(gamma0) + S * np.sin(gamma0)) / Tq
        v = A * np.log((1.0 - U) / (1.0 + U)) / (2.0 * B)
        u = A * np.arctan2(S * np.cos(gamma0) + V * np.sin(gamma0), np.cos(B * (lam - lam0))) / B
        u = u - np.abs(uc) * np.sign(self.latc)
        gc = np.radians(self.gamma_c)
        x = v * np.cos(gc) + u * np.sin(gc) + self.ec
        y = u * np.cos(gc) - v * np.sin(gc) + self.nc
        return x, y

    def inverse(self, x, y):
        _, e, A, B, H, gamma0, lam0, uc = self._consts()
        gc = np.radians(self.gamma_c)
        xp = np.asarray(x, np.float64) - self.ec
        yp = np.asarray(y, np.float64) - self.nc
        v = xp * np.cos(gc) - yp * np.sin(gc)
        u = yp * np.cos(gc) + xp * np.sin(gc) + np.abs(uc) * np.sign(self.latc)
        Qp = np.exp(-B * v / A)
        Sp = (Qp - 1.0 / Qp) / 2.0
        Tp = (Qp + 1.0 / Qp) / 2.0
        Vp = np.sin(B * u / A)
        Up = (Vp * np.cos(gamma0) + Sp * np.sin(gamma0)) / Tp
        t = (H / np.sqrt((1.0 + Up) / (1.0 - Up))) ** (1.0 / B)
        phi = _phi_from_t(t, e)
        lam = lam0 - np.arctan2(Sp * np.cos(gamma0) - Vp * np.sin(gamma0), np.cos(B * u / A)) / B
        return np.degrees(lam), np.degrees(phi)


# -- zone registry -----------------------------------------------------------


@dataclass(frozen=True)
class Zone:
    proj: TM | LCC | HOM
    unit_m: float = 1.0  # meters per coordinate unit (ft zones: 0.3048…)


def _utm(zone: int) -> Zone:
    return Zone(TM(lat0=0.0, lon0=zone * 6.0 - 183.0, k0=0.9996, fe=500000.0, fn=0.0))


_D = lambda d, m=0.0, s=0.0: d + m / 60.0 + s / 3600.0  # noqa: E731

# EPSG-registry parameters for every code in the reference's state table
# (location_config.py:320-379). NAD83/GRS80 throughout.
ZONES: dict[str, Zone] = {
    # NAD83 UTM zones used by the reference table
    "EPSG:26910": _utm(10),
    "EPSG:26912": _utm(12),
    "EPSG:26913": _utm(13),
    "EPSG:26914": _utm(14),
    "EPSG:26916": _utm(16),
    "EPSG:26917": _utm(17),
    "EPSG:26918": _utm(18),
    "EPSG:26919": _utm(19),
    # State Plane NAD83, meters
    "EPSG:26929": Zone(TM(30.5, -_D(85, 50), 0.99996, 200000.0, 0.0)),  # AL East
    "EPSG:26931": Zone(  # AK zone 1 — HOM variant B; azimuth arctan(-3/4)
        HOM(57.0, -_D(133, 40), 360.0 - np.degrees(np.arctan(0.75)),
            360.0 - np.degrees(np.arctan(0.75)), 0.9999, 5000000.0, -5000000.0)
    ),
    "EPSG:26948": Zone(TM(31.0, -_D(111, 55), 0.9999, 213360.0, 0.0)),  # AZ Central
    "EPSG:26951": Zone(LCC(_D(36, 14), _D(34, 56), _D(34, 20), -92.0, 400000.0, 0.0)),  # AR N
    "EPSG:26943": Zone(LCC(_D(38, 26), _D(37, 4), 36.5, -120.5, 2000000.0, 500000.0)),  # CA III
    "EPSG:26953": Zone(  # CO Central
        LCC(_D(39, 45), _D(38, 27), _D(37, 50), -_D(105, 30), 914401.8289, 304800.6096)
    ),
    "EPSG:26956": Zone(  # CT
        LCC(_D(41, 52), _D(41, 12), _D(40, 50), -_D(72, 45), 304800.6096, 152400.3048)
    ),
    "EPSG:26957": Zone(TM(38.0, -_D(75, 25), 0.999995, 200000.0, 0.0)),  # DE
    "EPSG:26958": Zone(TM(_D(24, 20), -81.0, 1.0 - 1.0 / 17000.0, 200000.0, 0.0)),  # FL East
    "EPSG:26966": Zone(TM(30.0, -_D(82, 10), 0.9999, 200000.0, 0.0)),  # GA East
    "EPSG:26961": Zone(TM(_D(18, 50), -_D(155, 30), 1.0 - 1.0 / 30000.0, 500000.0, 0.0)),  # HI 1
    "EPSG:26968": Zone(TM(_D(41, 40), -114.0, 1.0 - 1.0 / 19000.0, 500000.0, 0.0)),  # ID Central
    "EPSG:26971": Zone(TM(_D(36, 40), -_D(88, 20), 0.999975, 300000.0, 0.0)),  # IL East
    "EPSG:26973": Zone(TM(37.5, -_D(85, 40), 1.0 - 1.0 / 30000.0, 100000.0, 250000.0)),  # IN E
    "EPSG:26975": Zone(  # IA North
        LCC(_D(43, 16), _D(42, 4), 41.5, -_D(93, 30), 1500000.0, 1000000.0)
    ),
    "EPSG:26977": Zone(LCC(_D(39, 47), _D(38, 43), _D(38, 20), -98.0, 400000.0, 0.0)),  # KS N
    "EPSG:26979": Zone(  # KY North
        LCC(_D(37, 58), _D(38, 58), 37.5, -_D(84, 15), 500000.0, 0.0)
    ),
    "EPSG:26981": Zone(LCC(_D(31, 10), _D(32, 40), 30.5, -_D(92, 30), 1000000.0, 0.0)),  # LA N
    "EPSG:26983": Zone(TM(_D(43, 40), -_D(68, 30), 0.9999, 300000.0, 0.0)),  # ME East
    "EPSG:26985": Zone(  # MD
        LCC(_D(39, 27), _D(38, 18), _D(37, 40), -77.0, 400000.0, 0.0)
    ),
    "EPSG:26986": Zone(  # MA Mainland
        LCC(_D(42, 41), _D(41, 43), 41.0, -71.5, 200000.0, 750000.0)
    ),
    "EPSG:26988": Zone(  # MI Central
        LCC(_D(45, 42), _D(44, 11), _D(43, 19), -_D(84, 22), 6000000.0, 0.0)
    ),
    "EPSG:26991": Zone(  # MN Central
        LCC(_D(47, 3), _D(45, 37), 45.0, -_D(94, 15), 800000.0, 100000.0)
    ),
    "EPSG:26994": Zone(TM(29.5, -_D(88, 50), 0.99995, 300000.0, 0.0)),  # MS East
    "EPSG:26996": Zone(TM(_D(35, 50), -_D(92, 30), 1.0 - 1.0 / 15000.0, 500000.0, 0.0)),  # MO C
    "EPSG:2256": Zone(  # MT, international feet
        LCC(49.0, 45.0, _D(44, 15), -_D(109, 30), 600000.0, 0.0), unit_m=FT_INT
    ),
    "EPSG:26992": Zone(LCC(43.0, 40.0, _D(39, 50), -100.0, 500000.0, 0.0)),  # NE
    "EPSG:26997": Zone(TM(_D(34, 45), -_D(116, 40), 0.9999, 500000.0, 6000000.0)),  # NV C
    "EPSG:26955": Zone(TM(42.5, -_D(71, 40), 1.0 - 1.0 / 30000.0, 300000.0, 0.0)),  # NH
    "EPSG:26954": Zone(TM(_D(38, 50), -74.5, 0.9999, 150000.0, 0.0)),  # NJ
    "EPSG:2264": Zone(  # NC, US survey feet
        LCC(_D(36, 10), _D(34, 20), _D(33, 45), -79.0, 609601.22, 0.0), unit_m=FT_US
    ),
    "EPSG:2265": Zone(  # ND North, international feet
        LCC(_D(48, 44), _D(47, 26), 47.0, -_D(100, 30), 600000.0, 0.0), unit_m=FT_INT
    ),
}

# The reference's state→CRS table, verbatim semantics
# (location_config.py:320-379; unknown state → EPSG:3857 fallback,
# location_config.py:381-385).
STATE_PLANE_CRS: dict[str, str] = {
    "AL": "EPSG:26929", "AK": "EPSG:26931", "AZ": "EPSG:26948", "AR": "EPSG:26951",
    "CA": "EPSG:26943", "CO": "EPSG:26953", "CT": "EPSG:26956", "DE": "EPSG:26957",
    "FL": "EPSG:26958", "GA": "EPSG:26966", "HI": "EPSG:26961", "ID": "EPSG:26968",
    "IL": "EPSG:26971", "IN": "EPSG:26973", "IA": "EPSG:26975", "KS": "EPSG:26977",
    "KY": "EPSG:26979", "LA": "EPSG:26981", "ME": "EPSG:26983", "MD": "EPSG:26985",
    "MA": "EPSG:26986", "MI": "EPSG:26988", "MN": "EPSG:26991", "MS": "EPSG:26994",
    "MO": "EPSG:26996", "MT": "EPSG:2256", "NE": "EPSG:26992", "NV": "EPSG:26997",
    "NH": "EPSG:26955", "NJ": "EPSG:26954", "NM": "EPSG:26913", "NY": "EPSG:26918",
    "NC": "EPSG:2264", "ND": "EPSG:2265", "OH": "EPSG:26917", "OK": "EPSG:26914",
    "OR": "EPSG:26910", "PA": "EPSG:26918", "RI": "EPSG:26919", "SC": "EPSG:26919",
    "SD": "EPSG:26914", "TN": "EPSG:26916", "TX": "EPSG:26914", "UT": "EPSG:26912",
    "VT": "EPSG:26919", "VA": "EPSG:26918", "WA": "EPSG:26910", "WV": "EPSG:26917",
    "WI": "EPSG:26916", "WY": "EPSG:26913",
}


def state_plane_epsg(state_abbr: str) -> str:
    """Per-state target CRS, mirroring the reference's fallback to Web
    Mercator for unknown states (location_config.py:381-385)."""
    return STATE_PLANE_CRS.get(state_abbr.upper(), "EPSG:3857")


def sp_forward(code: str, lon, lat):
    """Geographic (NAD83≈WGS84) → zone coordinates in the zone's unit."""
    z = ZONES[code.upper()]
    x, y = z.proj.forward(lon, lat)
    return x / z.unit_m, y / z.unit_m


def sp_inverse(code: str, x, y):
    z = ZONES[code.upper()]
    return z.proj.inverse(np.asarray(x, np.float64) * z.unit_m, np.asarray(y, np.float64) * z.unit_m)


def supported(code: str) -> bool:
    return code.upper() in ZONES
