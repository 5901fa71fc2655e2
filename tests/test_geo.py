import numpy as np
import pytest

from gridfia_ray.geo import cells, wkb
from gridfia_ray.geo.affine import pixel_centers, tile_bounds, tile_transform
from gridfia_ray.geo.pip import PreparedPolygon


class TestWkb:
    def test_polygon_roundtrip(self):
        poly = wkb.box(-10.5, 2.25, 33.0, 40.0)
        back = wkb.decode(wkb.encode_polygon(poly))
        assert len(back) == 1
        assert np.allclose(back[0][0], poly[0])

    def test_multipolygon_roundtrip(self):
        polys = [wkb.box(0, 0, 1, 1), wkb.box(5, 5, 7, 9)]
        back = wkb.decode(wkb.encode_multipolygon(polys))
        assert len(back) == 2
        assert wkb.bounds(back) == (0.0, 0.0, 7.0, 9.0)

    def test_holes_roundtrip(self):
        shell = wkb.box(0, 0, 10, 10)[0]
        hole = wkb.box(4, 4, 6, 6)[0]
        back = wkb.decode(wkb.encode_polygon([shell, hole]))
        assert len(back[0]) == 2

    def test_ring_closure_enforced(self):
        open_ring = np.array([[0, 0], [1, 0], [1, 1]], dtype=float)
        back = wkb.decode(wkb.encode_polygon([open_ring]))
        assert np.array_equal(back[0][0][0], back[0][0][-1])

    def test_bad_type_rejected(self):
        import struct

        buf = struct.pack("<BI", 1, 2)  # LineString
        with pytest.raises(ValueError):
            wkb.decode(buf)


class TestMorton:
    def test_roundtrip(self):
        rng = np.random.RandomState(0)
        cx = rng.randint(0, 2**20, 1000)
        cy = rng.randint(0, 2**20, 1000)
        code = cells.morton_encode(cx, cy)
        dx, dy = cells.morton_decode(code)
        assert (dx == cx).all() and (dy == cy).all()

    def test_unique(self):
        xs, ys = np.meshgrid(np.arange(64), np.arange(64))
        code = cells.morton_encode(xs.ravel(), ys.ravel())
        assert len(np.unique(code)) == 64 * 64

    def test_parent_hierarchy(self):
        cx = np.arange(128)
        cy = np.arange(128)[::-1]
        code = cells.morton_encode(cx, cy)
        assert (cells.parent(code, 1) == cells.morton_encode(cx // 2, cy // 2)).all()
        assert (cells.parent(code, 3) == cells.morton_encode(cx // 8, cy // 8)).all()


class TestCellGrid:
    def test_cell_id_alignment(self):
        g = cells.CellGrid(0.0, 1000.0, 100.0)
        # point in cell (row 1, col 2)
        assert g.cell_id(np.array([250.0]), np.array([850.0]))[0] == cells.morton_encode(
            np.array([2]), np.array([1])
        )

    def test_cover_bbox(self):
        g = cells.CellGrid(0.0, 1000.0, 100.0)
        ids = g.cover_bbox(50, 750, 250, 950)
        assert len(ids) == 9  # 3x3 cells
        ids2 = g.cover_bbox(0, 900, 100, 1000)  # exactly one cell
        assert len(ids2) == 1

    def test_ring(self):
        g = cells.CellGrid(0.0, 1000.0, 100.0)
        center = cells.morton_encode(np.array([5]), np.array([5]))[0]
        assert len(g.ring(center, 0)) == 1
        assert len(g.ring(center, 1)) == 8
        assert len(g.ring(center, 2)) == 16
        corner = cells.morton_encode(np.array([0]), np.array([0]))[0]
        assert len(g.ring(corner, 1)) == 3  # clipped at domain edge


class TestAffine:
    def test_tile_transform_and_bounds(self):
        base = (-2_000_000.0, 30.0, 0.0, -900_000.0, 0.0, -30.0)
        tf = tile_transform(base, tile_row=2, tile_col=3, th=64, tw=64)
        assert tf[0] == -2_000_000.0 + 3 * 64 * 30.0
        assert tf[3] == -900_000.0 - 2 * 64 * 30.0
        b = tile_bounds(tf, 64, 64)
        assert b[2] - b[0] == pytest.approx(64 * 30.0)

    def test_pixel_centers(self):
        tf = (0.0, 1.0, 0.0, 10.0, 0.0, -1.0)
        cx, cy = pixel_centers(tf, 2, 3)
        assert cx[0, 0] == 0.5 and cx[0, 2] == 2.5
        assert cy[0, 0] == 9.5 and cy[1, 0] == 8.5


class TestPip:
    def test_concave_polygon(self):
        # L-shape: big square minus top-right quadrant
        ring = np.array(
            [[0, 0], [10, 0], [10, 5], [5, 5], [5, 10], [0, 10], [0, 0]], dtype=float
        )
        pp = PreparedPolygon([[ring]])
        px = np.array([2.0, 7.0, 7.0, 2.0, 11.0])
        py = np.array([2.0, 2.0, 7.0, 7.0, 2.0])
        assert pp.contains(px, py).tolist() == [True, True, False, True, False]

    def test_hole(self):
        from gridfia_ray.geo import wkb as W

        pp = PreparedPolygon([[W.box(0, 0, 10, 10)[0], W.box(4, 4, 6, 6)[0]]])
        assert pp.contains(np.array([5.0]), np.array([5.0]))[0] == False  # noqa: E712
        assert pp.contains(np.array([2.0]), np.array([2.0]))[0] == True  # noqa: E712

    def test_matches_independent_zone_masks(self, t1_dir, t1_meta):
        """Engine ray-casting vs the fixture's rectangle/half-plane logic."""
        import pyarrow.parquet as pq

        from gridfia_ray import fixtures

        zones = pq.read_table(f"{t1_dir}/zones.parquet").to_pylist()
        pz = pq.read_table(f"{t1_dir}/pixel_zones.parquet").to_pandas()
        n = t1_meta["grid"] * t1_meta["tile"]
        xs = fixtures.ORIGIN_X + (np.arange(n) + 0.5) * fixtures.PX
        ys = fixtures.ORIGIN_Y - (np.arange(n) + 0.5) * fixtures.PX
        cx = np.broadcast_to(xs[None, :], (n, n)).ravel()
        cy = np.broadcast_to(ys[:, None], (n, n)).ravel()
        for z in zones:
            pp = PreparedPolygon.from_wkb(z["geometry_wkb"])
            mask = pp.contains(cx, cy).reshape(n, n)
            expect = np.zeros((n, n), dtype=bool)
            sub = pz[pz.zone_id == z["zone_id"]]
            expect[sub.y.to_numpy(), sub.x.to_numpy()] = True
            assert (mask == expect).all(), z["zone_id"]
