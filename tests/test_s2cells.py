"""S2-scheme spherical cell index: round-trip, hierarchy, locality,
face coverage, and the map_batches stage."""

import numpy as np
import pytest

from gridfia_ray.geo.s2cells import (
    MAX_LEVEL,
    s2_cell_center,
    s2_cell_id,
    s2_parent,
    with_s2_cells,
)


@pytest.fixture(scope="module")
def points():
    rng = np.random.RandomState(42)
    lat = np.degrees(np.arcsin(rng.uniform(-1, 1, 5000)))  # uniform on sphere
    lng = rng.uniform(-180, 180, 5000)
    return lat, lng


def _haversine_deg(lat1, lng1, lat2, lng2):
    p1, p2 = np.radians(lat1), np.radians(lat2)
    dl = np.radians(lng2 - lng1)
    a = np.sin((p2 - p1) / 2) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dl / 2) ** 2
    return np.degrees(2 * np.arcsin(np.sqrt(np.clip(a, 0, 1))))


class TestRoundTrip:
    def test_center_close_to_point(self, points):
        """Decoded cell center lies within one cell diagonal of the
        encoded point, at several levels."""
        lat, lng = points
        for level in (8, 16, 24):
            cells = s2_cell_id(lat, lng, level)
            clat, clng = s2_cell_center(cells, level)
            # cell edge ≈ 90° / 2^level on a face; diagonal ×√2, and the
            # quadratic projection distorts ≤ ~1.5×
            tol = 90.0 / (1 << level) * 2.5
            d = _haversine_deg(lat, lng, clat, clng)
            assert d.max() < tol, (level, d.max(), tol)

    def test_reencode_center_is_same_cell(self, points):
        lat, lng = points
        cells = s2_cell_id(lat, lng, 16)
        clat, clng = s2_cell_center(cells, 16)
        assert np.array_equal(s2_cell_id(clat, clng, 16), cells)


class TestHierarchy:
    def test_parent_is_bit_shift_consistent(self, points):
        """Encoding at a coarse level equals the bit-shift parent of the
        fine-level encoding (Hilbert prefix recursion)."""
        lat, lng = points
        fine = s2_cell_id(lat, lng, 20)
        for plevel in (19, 16, 10, 4):
            coarse = s2_cell_id(lat, lng, plevel)
            assert np.array_equal(s2_parent(fine, 20, plevel), coarse), plevel

    def test_level_bounds(self):
        with pytest.raises(ValueError):
            s2_cell_id(0.0, 0.0, 0)
        with pytest.raises(ValueError):
            s2_cell_id(0.0, 0.0, MAX_LEVEL + 1)
        with pytest.raises(ValueError):
            s2_parent(np.asarray([0]), 4, 5)


class TestLocality:
    def test_hilbert_adjacency_within_face(self):
        """Consecutive cell ids along the curve are edge-adjacent cells
        (the Hilbert locality property) — checked via centers: distance
        between consecutive ids ≈ one cell edge, never a face jump."""
        level = 10
        # one face's worth of consecutive positions
        base = np.int64(2) << np.int64(2 * level)  # face 1
        pos = base + np.arange(4**6, dtype=np.int64)
        lat, lng = s2_cell_center(pos, level)
        d = _haversine_deg(lat[:-1], lng[:-1], lat[1:], lng[1:])
        edge = 90.0 / (1 << level)
        assert d.max() < edge * 2.0  # adjacent, allowing projection stretch

    def test_nearby_points_share_coarse_cell(self):
        lat0, lng0 = 45.0, 7.0
        eps = 1e-4
        a = s2_cell_id(lat0, lng0, 12)
        b = s2_cell_id(lat0 + eps, lng0 + eps, 12)
        assert s2_parent(a, 12, 8) == s2_parent(b, 12, 8)


class TestFaces:
    def test_all_faces_reachable_and_disjoint(self, points):
        lat, lng = points
        cells = s2_cell_id(lat, lng, 10)
        faces = np.unique(cells >> np.int64(20))
        assert set(faces.tolist()) == {0, 1, 2, 3, 4, 5}

    def test_poles_and_antimeridian(self):
        cells = s2_cell_id(
            np.array([90.0, -90.0, 0.0, 0.0]), np.array([0.0, 0.0, 180.0, -180.0]), 10
        )
        faces = (cells >> np.int64(20)).tolist()
        assert faces[0] == 2 and faces[1] == 5  # ±z faces
        assert faces[2] == faces[3]  # antimeridian is one location


class TestStage:
    def test_map_batches_stage(self, ray_session, points):
        import pandas as pd
        import ray.data as rd

        lat, lng = points
        df = pd.DataFrame({"lat": lat[:500], "lng": lng[:500]})
        out = (
            rd.from_pandas(df)
            .map_batches(with_s2_cells(level=12), batch_format="pyarrow")
            .to_pandas()
        )
        expect = s2_cell_id(df["lat"].to_numpy(), df["lng"].to_numpy(), 12)
        assert np.array_equal(out["s2_cell"].to_numpy(), expect)
