"""State Plane / UTM / HOM CRS family (M18 full).

Anchors are the published worked examples from EPSG Guidance Note 7-2
(public test vectors, one per projection family), plus the defining
properties of each projection for the NAD83 zones: unit scale on both
standard parallels (LCC), k0 on the central meridian (TM), conformality
(local scale isotropy), exact (FE, FN) at the projection origin, and
tight round-trips. A conformal conic with unit scale on its two given
parallels IS the LCC-2SP of those parallels — the property set pins the
implementation as strongly as external coordinates would.
"""

import numpy as np
import pytest

from gridfia_ray.geo import crs
from gridfia_ray.geo import stateplane as sp


def dms(d, m=0.0, s=0.0):
    sign = -1.0 if d < 0 else 1.0
    return sign * (abs(d) + m / 60.0 + s / 3600.0)


class TestPublishedAnchors:
    def test_tm_osgb_gn7(self):
        """EPSG GN7-2 TM example: OSGB36 / British National Grid,
        Airy 1830; 50°30'N 00°30'E -> E 577274.99, N 69740.50."""
        tm = sp.TM(lat0=49.0, lon0=-2.0, k0=0.9996012717, fe=400000.0,
                   fn=-100000.0, ellipsoid=sp.AIRY_1830)
        x, y = tm.forward(dms(0, 30), dms(50, 30))
        assert abs(x - 577274.99) < 0.02
        assert abs(y - 69740.50) < 0.02
        lon, lat = tm.inverse(577274.99, 69740.50)
        assert abs(lon - dms(0, 30)) < 1e-7
        assert abs(lat - dms(50, 30)) < 1e-7

    def test_lcc_texas_gn7(self):
        """EPSG GN7-2 LCC-2SP example: NAD27 / Texas South Central,
        Clarke 1866, US survey feet; 28°30'N 96°W ->
        E 2963503.91 ftUS, N 254759.80 ftUS."""
        ftus = sp.FT_US
        lcc = sp.LCC(lat1=dms(28, 23), lat2=dms(30, 17), lat0=dms(27, 50),
                     lon0=-99.0, fe=2000000.0 * ftus, fn=0.0,
                     ellipsoid=sp.CLARKE_1866)
        x, y = lcc.forward(-96.0, 28.5)
        assert abs(x / ftus - 2963503.91) < 0.05
        assert abs(y / ftus - 254759.80) < 0.05
        lon, lat = lcc.inverse(2963503.91 * ftus, 254759.80 * ftus)
        assert abs(lon - (-96.0)) < 1e-7
        assert abs(lat - 28.5) < 1e-7

    def test_hom_borneo_gn7(self):
        """EPSG GN7-2 HOM variant B example: Timbalai 1948 / RSO Borneo,
        Everest 1830 (1967); 5°23'14.1129"N 115°48'19.8196"E ->
        E 679245.73, N 596562.78."""
        hom = sp.HOM(latc=4.0, lonc=115.0, azimuth=dms(53, 18, 56.9537),
                     gamma_c=dms(53, 7, 48.3685), k0=0.99984,
                     ec=590476.87, nc=442857.65, ellipsoid=sp.EVEREST_1967)
        x, y = hom.forward(dms(115, 48, 19.8196), dms(5, 23, 14.1129))
        assert abs(x - 679245.73) < 0.05
        assert abs(y - 596562.78) < 0.05
        lon, lat = hom.inverse(679245.73, 596562.78)
        assert abs(lon - dms(115, 48, 19.8196)) < 1e-6
        assert abs(lat - dms(5, 23, 14.1129)) < 1e-6


def _geodetic_scale(proj, lon, lat, dlon_m=True):
    """Local projected/true scale along a parallel (dlon) or meridian."""
    a, e2, _ = sp._ell(proj.ellipsoid)
    phi = np.radians(lat)
    if dlon_m:
        true_r = a * np.cos(phi) / np.sqrt(1 - e2 * np.sin(phi) ** 2)
        d = 1e-6  # degrees
        x1, y1 = proj.forward(lon - d / 2, lat)
        x2, y2 = proj.forward(lon + d / 2, lat)
        true = true_r * np.radians(d)
    else:
        true_r = a * (1 - e2) / (1 - e2 * np.sin(phi) ** 2) ** 1.5
        d = 1e-6
        x1, y1 = proj.forward(lon, lat - d / 2)
        x2, y2 = proj.forward(lon, lat + d / 2)
        true = true_r * np.radians(d)
    return float(np.hypot(x2 - x1, y2 - y1) / true)


class TestDefiningProperties:
    @pytest.mark.parametrize("code", ["EPSG:26943", "EPSG:26977", "EPSG:2264"])
    def test_lcc_unit_scale_on_standard_parallels(self, code):
        z = sp.ZONES[code]
        for lat in (z.proj.lat1, z.proj.lat2):
            k = _geodetic_scale(z.proj, z.proj.lon0 + 1.0, lat)
            assert abs(k - 1.0) < 1e-7, (code, lat, k)

    @pytest.mark.parametrize("code", ["EPSG:26929", "EPSG:26958", "EPSG:26918"])
    def test_tm_k0_on_central_meridian(self, code):
        z = sp.ZONES[code]
        for lat in (z.proj.lat0 + 1.0, z.proj.lat0 + 3.0):
            k = _geodetic_scale(z.proj, z.proj.lon0, lat, dlon_m=False)
            assert abs(k - z.proj.k0) < 1e-7, (code, lat, k)

    @pytest.mark.parametrize("code", ["EPSG:26943", "EPSG:26929", "EPSG:26931"])
    def test_conformality(self, code):
        """Scale along parallel == scale along meridian (isotropy)."""
        z = sp.ZONES[code]
        p = z.proj
        lon0 = p.lon0 if hasattr(p, "lon0") else p.lonc
        lat0 = p.lat0 if hasattr(p, "lat0") else p.latc
        for dlon, dlat in [(0.5, 0.7), (-1.0, 1.5), (1.5, -0.5)]:
            kp = _geodetic_scale(p, lon0 + dlon, lat0 + dlat, True)
            km = _geodetic_scale(p, lon0 + dlon, lat0 + dlat, False)
            assert abs(kp / km - 1.0) < 1e-7, (code, dlon, dlat, kp, km)

    def test_origin_maps_to_false_origin(self):
        for code, z in sp.ZONES.items():
            p = z.proj
            if isinstance(p, sp.HOM):
                x, y = p.forward(p.lonc, p.latc)
                assert abs(x - p.ec) < 1e-5 and abs(y - p.nc) < 1e-5, code
            else:
                x, y = p.forward(p.lon0, p.lat0)
                assert abs(x - p.fe) < 1e-5 and abs(y - p.fn) < 1e-5, code

    def test_hom_k0_at_center(self):
        z = sp.ZONES["EPSG:26931"]
        kp = _geodetic_scale(z.proj, z.proj.lonc, z.proj.latc, True)
        assert abs(kp - z.proj.k0) < 1e-7

    def test_roundtrip_every_zone(self):
        rng = np.random.default_rng(7)
        for code, z in sp.ZONES.items():
            p = z.proj
            lon0 = p.lon0 if hasattr(p, "lon0") else p.lonc
            lat0 = p.lat0 if hasattr(p, "lat0") else p.latc
            lons = lon0 + rng.uniform(-1.5, 1.5, 8)
            lats = np.clip(lat0 + rng.uniform(-1.0, 2.5, 8), -80, 80)
            x, y = sp.sp_forward(code, lons, lats)
            lon2, lat2 = sp.sp_inverse(code, x, y)
            np.testing.assert_allclose(lon2, lons, atol=1e-8, err_msg=code)
            np.testing.assert_allclose(lat2, lats, atol=1e-8, err_msg=code)


class TestIntegration:
    def test_reference_state_table_complete(self):
        """All 50 states of the reference's table resolve to an
        implemented zone (location_config.py:320-379)."""
        assert len(sp.STATE_PLANE_CRS) == 50
        for st, code in sp.STATE_PLANE_CRS.items():
            assert sp.supported(code), (st, code)
        assert sp.state_plane_epsg("nc") == "EPSG:2264"
        assert sp.state_plane_epsg("PR") == "EPSG:3857"  # fallback

    def test_transform_points_routes_stateplane(self):
        # Raleigh NC in NC state plane (ftUS): x ~ 2.1M ft, y ~ 740k ft
        x, y = crs.transform_points(-78.6382, 35.7796, "EPSG:4326", "EPSG:2264")
        assert 1.9e6 < float(x) < 2.3e6
        assert 6.0e5 < float(y) < 8.5e5
        lon, lat = crs.transform_points(x, y, "EPSG:2264", "EPSG:4326")
        assert abs(float(lon) + 78.6382) < 1e-8
        assert abs(float(lat) - 35.7796) < 1e-8

    def test_transform_points_sp_to_webmercator(self):
        """State plane → Web Mercator routes through WGS84, mirroring the
        reference's transform_bounds chain."""
        x, y = crs.transform_points(500000.0, 200000.0, "EPSG:26918", "EPSG:3857")
        lon, lat = crs.transform_points(500000.0, 200000.0, "EPSG:26918", "EPSG:4326")
        x2, y2 = crs.transform_points(lon, lat, "EPSG:4326", "EPSG:3857")
        assert abs(float(x) - float(x2)) < 1e-6
        assert abs(float(y) - float(y2)) < 1e-6

    def test_transform_bbox_roundtrip(self):
        bbox = (-79.2, 35.2, -78.2, 36.0)  # around Raleigh
        spb = crs.transform_bbox(bbox, "EPSG:4326", "EPSG:2264")
        back = crs.transform_bbox(spb, "EPSG:2264", "EPSG:4326")
        # densified bbox-of-bbox grows slightly; must contain original
        assert back[0] <= bbox[0] + 1e-6 and back[1] <= bbox[1] + 1e-6
        assert back[2] >= bbox[2] - 1e-6 and back[3] >= bbox[3] - 1e-6
        assert abs(back[0] - bbox[0]) < 0.01 and abs(back[2] - bbox[2]) < 0.01

    def test_alaska_hom_bbox(self):
        bbox = (-134.5, 56.0, -132.0, 58.5)  # SE Alaska panhandle
        akb = crs.transform_bbox(bbox, "EPSG:4326", "EPSG:26931")
        back = crs.transform_bbox(akb, "EPSG:26931", "EPSG:4326")
        assert back[0] <= bbox[0] + 1e-6 and back[2] >= bbox[2] - 1e-6
        assert abs(back[1] - bbox[1]) < 0.05

    def test_api_resolve_location_bboxes(self):
        from gridfia_ray.api import GridFIARay

        out = GridFIARay.resolve_location_bboxes((-79.2, 35.2, -78.2, 36.0), "NC")
        assert out["crs_target"] == "EPSG:2264"
        spb = out["state_plane"]
        back = crs.transform_bbox(spb, "EPSG:2264", "EPSG:4326")
        assert back[0] <= -79.2 + 1e-6 and back[2] >= -78.2 - 1e-6
        # unknown state falls back to web mercator (location_config.py:381-385)
        out2 = GridFIARay.resolve_location_bboxes((-79.2, 35.2, -78.2, 36.0), "GU")
        assert out2["crs_target"] == "EPSG:3857" and "state_plane" not in out2
