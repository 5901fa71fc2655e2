"""Bounded-radius viewshed: LOS kernel properties, full-grid equality
through the halo exchange, edge observers, partition invariance."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from gridfia_ray.pipelines.viewshed import (
    _ring_offsets,
    los_visible,
    viewshed_tiles,
)


def _raster(rng, tiles_y=3, tiles_x=3, h=12, w=12, scale=50.0):
    rows = []
    g = np.zeros((tiles_y * h, tiles_x * w))
    for tr in range(tiles_y):
        for tc in range(tiles_x):
            arr = (rng.rand(h, w) * scale).astype(np.float64)
            g[tr * h:(tr + 1) * h, tc * w:(tc + 1) * w] = arr
            rows.append(
                {"metric": "total_biomass", "tile_row": tr, "tile_col": tc,
                 "h": h, "w": w, "pix": arr.tobytes(), "dtype": "float64"}
            )
    return pd.DataFrame(rows), g


def _brute_counts(g, observers, radius, eye_u):
    E = np.floor(g * 1_000_000 + 0.5).astype(np.int64).astype(np.float64)
    count = np.zeros(g.shape, dtype=np.int64)
    for oy, ox in observers:
        count += los_visible(E, int(oy), int(ox), radius, eye_u)
    return count


class TestRingOffsets:
    def test_covers_disk_exactly_once(self):
        seen = set()
        for n in range(1, 5):
            for dy, dx in _ring_offsets(n):
                assert max(abs(dy), abs(dx)) == n
                assert (dy, dx) not in seen
                seen.add((int(dy), int(dx)))
        assert len(seen) == 9 * 9 - 1  # all offsets in [-4,4]² minus origin


class TestLosKernel:
    def test_flat_terrain_full_disk_visible(self):
        E = np.zeros((40, 40))
        vis = los_visible(E, 20, 20, 6, 1.0)
        yy, xx = np.mgrid[0:40, 0:40]
        in_disk = (yy - 20) ** 2 + (xx - 20) ** 2 <= 36
        assert (vis == in_disk).all()

    def test_wall_shadows_cells_behind(self):
        E = np.zeros((30, 30))
        E[15, 18] = 100.0  # wall east of the observer
        vis = los_visible(E, 15, 15, 10, 1.0)
        assert vis[15, 18]          # the wall itself is visible
        assert not vis[15, 20]      # directly behind it: blocked
        assert not vis[15, 24]
        assert vis[15, 10]          # opposite direction unaffected
        assert vis[10, 15]

    def test_observer_on_hill_sees_over(self):
        E = np.zeros((30, 30))
        E[15, 18] = 5.0
        vis = los_visible(E, 15, 15, 10, 1000.0)  # tall eye height
        assert vis[15, 24]

    def test_observer_cell_always_visible(self):
        E = np.full((10, 10), 7.0)
        assert los_visible(E, 0, 0, 3, 0.5)[0, 0]


class TestViewshedTiles:
    def test_matches_sequential_full_grid(self, ray_session):
        rng = np.random.RandomState(5)
        df, g = _raster(rng)
        obs = np.array([[6, 6], [17, 20], [30, 33], [1, 1], [34, 35]])
        got = viewshed_tiles(
            rd.from_pandas(df).repartition(5), obs, radius=8,
            eye_add_u=20_000_000.0, n_buckets=8,
        ).to_pandas()
        want = _brute_counts(g, obs, 8, 20_000_000.0)
        assert len(got) == g.size
        m = got.set_index(["y", "x"])["n_vis"]
        for y in range(g.shape[0]):
            for x in range(g.shape[1]):
                assert m[(y, x)] == want[y, x], (y, x)

    def test_partition_invariance(self, ray_session):
        rng = np.random.RandomState(8)
        df, g = _raster(rng, tiles_y=2, tiles_x=2)
        obs = np.array([[5, 5], [12, 18]])
        a = (
            viewshed_tiles(rd.from_pandas(df), obs, 6, 1e6)
            .to_pandas().sort_values(["y", "x"], ignore_index=True)
        )
        b = (
            viewshed_tiles(rd.from_pandas(df).repartition(7), obs, 6, 1e6,
                           n_buckets=3)
            .to_pandas().sort_values(["y", "x"], ignore_index=True)
        )
        assert a.equals(b)

    def test_overlapping_observers_accumulate(self, ray_session):
        df, g = _raster(np.random.RandomState(3), tiles_y=1, tiles_x=1,
                        scale=0.0)  # flat
        obs = np.array([[5, 5], [5, 7]])  # overlapping disks
        got = viewshed_tiles(rd.from_pandas(df), obs, 4, 1.0).to_pandas()
        m = got.set_index(["y", "x"])["n_vis"]
        assert m[(5, 6)] == 2
        assert m[(5, 1)] == 1   # only the first disk
        assert m[(0, 0)] == 0   # outside both

    def test_radius_exceeding_tile_raises(self, ray_session):
        df, _ = _raster(np.random.RandomState(1), h=6, w=6)
        with pytest.raises(Exception, match="radius|lag|strip|tile"):
            viewshed_tiles(
                rd.from_pandas(df), np.array([[3, 3]]), 7, 1.0
            ).materialize()
