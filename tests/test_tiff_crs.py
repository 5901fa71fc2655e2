"""TIFF codec round-trips, GeoTIFF result writer, nodata clamp (M20),
and closed-form CRS transforms (M18)."""

import os
import struct

import numpy as np
import pytest

from gridfia_ray.codecs import tiff as T
from gridfia_ray.geo import crs as C


class TestTiffCodec:
    def test_roundtrip_f32(self):
        rng = np.random.RandomState(0)
        a = (rng.rand(37, 53) * 500 - 10).astype(np.float32)
        buf = T.encode_tiff_f32(a)
        out, meta = T.decode_tiff(buf)
        assert out.dtype == np.dtype("<f4") and out.shape == a.shape
        assert (out == a).all()  # bit-exact, uncompressed
        assert meta == {}

    def test_roundtrip_geotags(self):
        a = np.arange(12, dtype=np.float32).reshape(3, 4)
        tf = [-2000000.0, 30.0, 0.0, 1000000.0, 0.0, -30.0]
        buf = T.encode_tiff_f32(a, transform=tf, crs="ESRI:102039")
        out, meta = T.decode_tiff(buf)
        assert (out == a).all()
        assert meta["transform"] == pytest.approx(tf)
        assert meta["crs"] == "ESRI:102039"

    def test_inline_payload_0x40_collision(self):
        """Regression: dimensions like 64 produce inline IFD payloads
        starting with byte 0x40, which must not be mistaken for the
        encoder's out-of-line marker (caught by a verification probe)."""
        for n in (64, 256, 320, 1024):
            a = np.random.RandomState(n).rand(n, 64).astype(np.float32)
            out, _ = T.decode_tiff(T.encode_tiff_f32(a))
            assert (out == a).all()
        tf = [0.0, 64.0, 0.0, 64.0, 0.0, -64.0]
        _, meta = T.decode_tiff(
            T.encode_tiff_f32(np.zeros((64, 64), np.float32), transform=tf, crs="EPSG:5070")
        )
        assert meta["transform"] == pytest.approx(tf) and meta["crs"] == "EPSG:5070"

    def test_epsg_crs_in_geokeys(self):
        buf = T.encode_tiff_f32(np.zeros((2, 2), np.float32), crs="EPSG:5070")
        _, meta = T.decode_tiff(buf)
        assert meta["crs"] == "EPSG:5070"

    def test_registry_dispatch(self):
        from gridfia_ray.codecs.registry import decode_tile, encode_tile

        a = np.full((8, 8), 3.5, np.float32)
        buf, extra = encode_tile(a, "tiff")
        assert extra == {}
        out = decode_tile(buf, "tiff", 8, 8)
        assert (out == a).all()
        with pytest.raises(ValueError, match="shape"):
            decode_tile(buf, "tiff", 4, 4)

    def test_hand_built_multistrip_and_bigendian(self):
        """Reader handles layouts our writer doesn't emit: 2 strips of a
        u16 image, big-endian byte order."""
        h, w = 4, 3
        data = np.arange(h * w, dtype=">u2").reshape(h, w)
        s1, s2 = data[:2].tobytes(), data[2:].tobytes()
        entries = [
            (256, 3, 1, struct.pack(">H", w) + b"\0\0"),
            (257, 3, 1, struct.pack(">H", h) + b"\0\0"),
            (258, 3, 1, struct.pack(">H", 16) + b"\0\0"),
            (259, 3, 1, struct.pack(">H", 1) + b"\0\0"),
            (273, 4, 2, None),  # offsets array (out of line)
            (278, 3, 1, struct.pack(">H", 2) + b"\0\0"),
            (279, 4, 2, None),  # byte counts array (out of line)
        ]
        header = struct.pack(">2sHI", b"MM", 42, 8)
        ifd_off = 8
        ifd_size = 2 + 12 * len(entries) + 4
        off_tbl = ifd_off + ifd_size
        cnt_tbl = off_tbl + 8
        strips = cnt_tbl + 8
        buf = header
        buf += struct.pack(">H", len(entries))
        for tag, typ, count, payload in entries:
            if tag == 273:
                payload = struct.pack(">I", off_tbl)
            elif tag == 279:
                payload = struct.pack(">I", cnt_tbl)
            buf += struct.pack(">HHI", tag, typ, count) + payload
        buf += struct.pack(">I", 0)
        buf += struct.pack(">II", strips, strips + len(s1))
        buf += struct.pack(">II", len(s1), len(s2))
        buf += s1 + s2
        out, _ = T.decode_tiff(buf)
        assert (out.astype(np.uint16) == data.astype(np.uint16)).all()

    def test_rejects_garbage_and_compression(self):
        with pytest.raises(ValueError, match="byte-order"):
            T.decode_tiff(b"PK\x03\x04junk")
        a = np.zeros((2, 2), np.float32)
        buf = bytearray(T.encode_tiff_f32(a))
        # flip the Compression tag value to 5 (LZW)
        i = buf.find(struct.pack("<HHI", 259, 3, 1))
        buf[i + 8 : i + 10] = struct.pack("<H", 5)
        with pytest.raises(ValueError, match="compression"):
            T.decode_tiff(bytes(buf))


class TestGeotiffWriter:
    def test_write_geotiff_roundtrip(self, ray_session, t1_tiles, t1_catalog, t1_meta, tmp_path):
        from gridfia_ray.kernels.registry import registry
        from gridfia_ray.pipelines import metrics as M
        from gridfia_ray.pipelines.common import GridSpec
        from gridfia_ray.pipelines.reassemble import write_geotiff

        spec = GridSpec.from_fixture_meta(t1_meta)
        res = M.run_metrics(
            t1_tiles, registry.from_configs([{"name": "total_biomass"}]), spec, t1_catalog
        )
        path = str(tmp_path / "total.tif")
        tf = t1_meta["transform"]
        info = write_geotiff(
            res, "total_biomass", path, grid=t1_meta["grid"], tile=t1_meta["tile"],
            crs=t1_meta["crs"], transform=tf,
        )
        assert info["n_tiles"] == t1_meta["grid"] ** 2
        with open(path, "rb") as f:
            arr, meta = T.decode_tiff(f.read())
        n = t1_meta["grid"] * t1_meta["tile"]
        assert arr.shape == (n, n)
        assert meta["crs"] == t1_meta["crs"]
        assert meta["transform"] == pytest.approx(tf)
        # pixel parity vs the cube's species sum
        from gridfia_ray import fixtures

        cube, catalog = fixtures.build_cube(fixtures.SCALES["t1"])
        want = cube[1:].sum(axis=0)  # row 0 is the stored total layer
        assert np.allclose(arr, want, atol=1e-3)


class TestClampNegative:
    def test_decode_clamps_sentinels(self, ray_session):
        import json

        import pyarrow as pa

        from gridfia_ray.pipelines.common import GridSpec, decoded_tiles, read_tiles

        a = np.array([[-5.0, 2.0], [-0.25, 7.0]], np.float32)
        cap = json.dumps(
            {"species_code": "0010", "tile_row": 0, "tile_col": 0,
             "transform": [0.0, 1.0, 0.0, 0.0, 0.0, -1.0]}
        )
        t = pa.table(
            {"image_id": ["0010/0000/0000"], "bytes": [a.tobytes()], "w": [2], "h": [2],
             "fmt": ["raw-f32"], "caption": [cap], "phash": [0]}
        )
        spec = GridSpec(origin_x=0.0, origin_y=0.0, px=1.0, tile=2)
        dec = decoded_tiles(
            read_tiles(t), spec, include_total=True, clamp_negative=True
        ).take_all()
        out = np.frombuffer(dec[0]["pix"], np.float32).reshape(2, 2)
        assert (out == np.array([[0.0, 2.0], [0.0, 7.0]], np.float32)).all()
        dec2 = decoded_tiles(read_tiles(t), spec, include_total=True).take_all()
        out2 = np.frombuffer(dec2[0]["pix"], np.float32).reshape(2, 2)
        assert out2[0, 0] == -5.0  # default: sentinel preserved


class TestCrs:
    def test_webmercator_anchors(self):
        x, y = C.lonlat_to_webmercator(np.array([0.0, 180.0]), np.array([0.0, 0.0]))
        assert x[0] == 0.0 and y[0] == 0.0
        assert x[1] == pytest.approx(20037508.342789244)
        # top of the valid square is (anti)symmetric with the right edge
        _, ytop = C.lonlat_to_webmercator(0.0, 85.051128779806604)
        assert float(ytop) == pytest.approx(20037508.342789244, rel=1e-9)

    def test_webmercator_roundtrip(self):
        rng = np.random.RandomState(1)
        lon = rng.uniform(-179, 179, 200)
        lat = rng.uniform(-84, 84, 200)
        lon2, lat2 = C.webmercator_to_lonlat(*C.lonlat_to_webmercator(lon, lat))
        assert np.allclose(lon, lon2, atol=1e-9) and np.allclose(lat, lat2, atol=1e-9)

    def test_albers_origin_and_orientation(self):
        x, y = C.lonlat_to_albers(C.ALBERS_LON0, C.ALBERS_LAT0)
        assert abs(float(x)) < 1e-6 and abs(float(y)) < 1e-6
        xw, _ = C.lonlat_to_albers(-120.0, 40.0)
        xe, _ = C.lonlat_to_albers(-75.0, 40.0)
        assert float(xw) < 0 < float(xe)
        _, ys = C.lonlat_to_albers(-96.0, 25.0)
        _, yn = C.lonlat_to_albers(-96.0, 45.0)
        assert float(ys) < float(yn)

    def test_albers_true_scale_at_standard_parallel(self):
        """At φ₁ = 29.5° the cone touches the ellipsoid: projected
        distance along the parallel equals the ellipsoidal arc."""
        lat = C.ALBERS_LAT1
        dlam = 0.01
        x1, y1 = C.lonlat_to_albers(-96.0, lat)
        x2, y2 = C.lonlat_to_albers(-96.0 + dlam, lat)
        proj = np.hypot(float(x2) - float(x1), float(y2) - float(y1))
        sin = np.sin(np.radians(lat))
        arc = (
            C.GRS80_A * np.cos(np.radians(lat)) / np.sqrt(1 - C.GRS80_E2 * sin * sin)
        ) * np.radians(dlam)
        assert proj == pytest.approx(arc, rel=1e-7)

    def test_albers_roundtrip_conus(self):
        rng = np.random.RandomState(2)
        lon = rng.uniform(-125, -66, 300)
        lat = rng.uniform(24, 50, 300)
        lon2, lat2 = C.albers_to_lonlat(*C.lonlat_to_albers(lon, lat))
        assert np.allclose(lon, lon2, atol=1e-9) and np.allclose(lat, lat2, atol=1e-9)

    def test_bbox_densified_edges(self):
        """Under Albers (apex to the north) a parallel arcs downward at
        mid-edge: the south edge's minimum y is at its midpoint, not a
        corner — transform_bbox must catch mid-edge extrema."""
        bbox = (-110.0, 30.0, -80.0, 45.0)
        xmin, ymin, xmax, ymax = C.transform_bbox(bbox, "EPSG:4326", "ESRI:102039")
        _, y_c1 = C.lonlat_to_albers(-110.0, 30.0)
        _, y_c2 = C.lonlat_to_albers(-80.0, 30.0)
        _, y_mid = C.lonlat_to_albers(-95.0, 30.0)
        assert float(y_mid) < min(float(y_c1), float(y_c2))
        assert ymin <= float(y_mid)

    def test_transform_points_routes_via_wgs84(self):
        x, y = C.transform_points(-2000000.0, 800000.0, "ESRI:102039", "EPSG:3857")
        lon, lat = C.albers_to_lonlat(-2000000.0, 800000.0)
        x2, y2 = C.lonlat_to_webmercator(lon, lat)
        assert float(x) == pytest.approx(float(x2)) and float(y) == pytest.approx(float(y2))

    def test_unsupported_pair_raises(self):
        with pytest.raises(ValueError, match="unsupported CRS pair"):
            C.transform_points(0, 0, "EPSG:3857", "ESRI:102039_BAD")
