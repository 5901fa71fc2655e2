"""Local spatial autocorrelation (LISA local Moran's I, Getis-Ord Gi*):
brute-force float oracles over a stitched multi-tile raster, quadrant
labels, partition invariance, degenerate-input guards."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from gridfia_ray.pipelines.local_stats import (
    exact_value_scalars,
    getis_gstar_tiles,
    local_moran_tiles,
)


def _raster(rng, tiles_y=3, tiles_x=2, h=8, w=8):
    rows, grids = [], {}
    for tr in range(tiles_y):
        for tc in range(tiles_x):
            arr = (rng.rand(h, w) * 50).astype(np.float64)
            grids[(tr, tc)] = arr
            rows.append(
                {"metric": "total_biomass", "tile_row": tr, "tile_col": tc,
                 "h": h, "w": w, "pix": arr.tobytes(), "dtype": "float64"}
            )
    g = np.zeros((tiles_y * h, tiles_x * w))
    for (tr, tc), arr in grids.items():
        g[tr * h:(tr + 1) * h, tc * w:(tc + 1) * w] = arr
    return pd.DataFrame(rows), g


def _nbr_sums(u):
    """(S_excl, c_excl, S_incl, W_incl) per pixel, brute force."""
    H, W = u.shape
    S = np.zeros((H, W)); C = np.zeros((H, W))
    for y in range(H):
        for x in range(W):
            ys = slice(max(y - 1, 0), min(y + 2, H))
            xs = slice(max(x - 1, 0), min(x + 2, W))
            S[y, x] = u[ys, xs].sum()
            C[y, x] = u[ys, xs].size
    return S - u, C - 1, S, C


class TestScalars:
    def test_exact_scalar_pass(self, ray_session):
        rng = np.random.RandomState(0)
        df, g = _raster(rng, tiles_y=2, tiles_x=2, h=4, w=4)
        got = exact_value_scalars(rd.from_pandas(df).repartition(3))
        u = np.floor(g * 1e6 + 0.5).astype(np.int64)
        n, s, ssq = got["total_biomass"]
        assert n == g.size
        assert s == int(u.sum())
        assert ssq == sum(int(v) * int(v) for v in u.ravel())


class TestLocalMoran:
    def test_matches_brute_force(self, ray_session):
        rng = np.random.RandomState(1)
        df, g = _raster(rng)
        got = (local_moran_tiles(rd.from_pandas(df).repartition(4), n_buckets=8)
               .to_pandas().set_index(["y", "x"]))
        u = np.floor(g * 1e6 + 0.5).astype(np.int64).astype(np.float64)
        S, c, _, _ = _nbr_sums(u)
        mean = u.mean()
        m2 = ((u - mean) ** 2).mean()
        want = (u - mean) * (S - c * mean) / c / m2
        assert len(got) == g.size
        for y in range(g.shape[0]):
            for x in range(g.shape[1]):
                assert got.loc[(y, x), "i_local"] == pytest.approx(
                    want[y, x], rel=1e-9
                ), (y, x)

    def test_quadrant_labels(self, ray_session):
        # 2 tiles: left all-low (1.0), right all-high (9.0) -> interior
        # left pixels are LL (3), interior right are HH (1); the column
        # adjacent to the seam mixes
        lo = np.full((4, 4), 1.0); hi = np.full((4, 4), 9.0)
        df = pd.DataFrame([
            {"metric": "m", "tile_row": 0, "tile_col": 0, "h": 4, "w": 4,
             "pix": lo.tobytes(), "dtype": "float64"},
            {"metric": "m", "tile_row": 0, "tile_col": 1, "h": 4, "w": 4,
             "pix": hi.tobytes(), "dtype": "float64"},
        ])
        got = local_moran_tiles(rd.from_pandas(df)).to_pandas().set_index(["y", "x"])
        assert (got.loc[[(1, 0), (2, 1)], "quad"] == 3).all()  # LL
        assert (got.loc[[(1, 7), (2, 6)], "quad"] == 1).all()  # HH
        # seam: the low pixel's neighbor mean (5 low + 3 high) is still
        # below the global mean -> LL; the high pixel's (3 low + 5 high)
        # is above it -> HH
        assert got.loc[(1, 3), "quad"] == 3
        assert got.loc[(1, 4), "quad"] == 1

    def test_outlier_quadrants(self, ray_session):
        # one spike in a flat-low field: the spike is High-Low (4), its
        # 8 neighbors are Low-High (2), far pixels are LL (3)
        arr = np.full((8, 8), 1.0); arr[3, 3] = 100.0
        df = pd.DataFrame([{"metric": "m", "tile_row": 0, "tile_col": 0,
                            "h": 8, "w": 8, "pix": arr.tobytes(),
                            "dtype": "float64"}])
        got = local_moran_tiles(rd.from_pandas(df)).to_pandas().set_index(["y", "x"])
        assert got.loc[(3, 3), "quad"] == 4  # HL
        assert got.loc[(2, 2), "quad"] == 2  # LH
        assert got.loc[(7, 7), "quad"] == 3  # LL
        assert got.loc[(3, 3), "i_local"] < 0  # outlier: negative I

    def test_partition_invariant_bitwise(self, ray_session):
        rng = np.random.RandomState(2)
        df, _ = _raster(rng, tiles_y=2, tiles_x=3, h=4, w=4)
        a = (local_moran_tiles(rd.from_pandas(df).repartition(2), n_buckets=4)
             .to_pandas().sort_values(["y", "x"]).reset_index(drop=True))
        b = (local_moran_tiles(rd.from_pandas(df).repartition(6), n_buckets=16)
             .to_pandas().sort_values(["y", "x"]).reset_index(drop=True))
        # float columns must be BIT-identical (exact-int contract)
        assert (a["i_local"].to_numpy() == b["i_local"].to_numpy()).all()
        pd.testing.assert_frame_equal(a, b)

    def test_constant_raster_rejected(self, ray_session):
        arr = np.full((4, 4), 2.5)
        df = pd.DataFrame([{"metric": "m", "tile_row": 0, "tile_col": 0,
                            "h": 4, "w": 4, "pix": arr.tobytes(),
                            "dtype": "float64"}])
        with pytest.raises(Exception, match="constant"):
            local_moran_tiles(rd.from_pandas(df)).to_pandas()


class TestGetisGstar:
    def test_matches_brute_force(self, ray_session):
        rng = np.random.RandomState(3)
        df, g = _raster(rng, tiles_y=2, tiles_x=2, h=6, w=6)
        got = (getis_gstar_tiles(rd.from_pandas(df).repartition(3), n_buckets=4)
               .to_pandas().set_index(["y", "x"]))
        u = np.floor(g * 1e6 + 0.5).astype(np.int64).astype(np.float64)
        _, _, S_star, W = _nbr_sums(u)
        n = u.size
        mean = u.mean()
        sd = np.sqrt((u * u).mean() - mean * mean)
        want = (S_star - W * mean) / (sd * np.sqrt((n * W - W * W) / (n - 1)))
        assert len(got) == g.size
        for y in range(g.shape[0]):
            for x in range(g.shape[1]):
                assert got.loc[(y, x), "gi_star"] == pytest.approx(
                    want[y, x], rel=1e-9
                ), (y, x)

    def test_hot_spot_sign(self, ray_session):
        # single tile, one bright 3x3 block -> its center is the
        # maximum Gi* (hot spot); far corner is negative (cold)
        arr = np.zeros((8, 8)); arr[1:4, 1:4] = 10.0
        df = pd.DataFrame([{"metric": "m", "tile_row": 0, "tile_col": 0,
                            "h": 8, "w": 8, "pix": arr.tobytes(),
                            "dtype": "float64"}])
        got = getis_gstar_tiles(rd.from_pandas(df)).to_pandas().set_index(["y", "x"])
        assert got["gi_star"].idxmax() == (2, 2)
        assert got.loc[(7, 7), "gi_star"] < 0
