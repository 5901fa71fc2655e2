"""Axis-aligned semivariogram via the two-direction strip exchange vs a
brute-force full-raster shifted-difference oracle (cross-tile pairs
included), plus partition invariance and the int64 hi/lo decomposition."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from gridfia_ray.pipelines.variogram import (
    semivariogram_tiles,
    semivariogram_values,
)


def _raster(rng, tiles_y=3, tiles_x=2, h=8, w=8):
    rows = []
    g = np.zeros((tiles_y * h, tiles_x * w))
    for tr in range(tiles_y):
        for tc in range(tiles_x):
            arr = (rng.rand(h, w) * 50).astype(np.float64)
            g[tr * h:(tr + 1) * h, tc * w:(tc + 1) * w] = arr
            rows.append(
                {"metric": "total_biomass", "tile_row": tr, "tile_col": tc,
                 "h": h, "w": w, "pix": arr.tobytes(), "dtype": "float64"}
            )
    return pd.DataFrame(rows), g


def _brute(g, lags):
    u = np.floor(g * 1_000_000 + 0.5).astype(np.int64)
    out = {}
    for lag in lags:
        de = (u[:, lag:] - u[:, :-lag]).ravel()
        ds = (u[lag:, :] - u[:-lag, :]).ravel()
        for direction, d in (("e", de), ("s", ds)):
            d2 = d * d
            out[(direction, lag)] = (
                d.size,
                int((d2 >> 32).sum()),
                int((d2 & 0xFFFFFFFF).sum()),
                int(d2.sum()),
            )
    return out


LAGS = [1, 2, 5]


class TestSemivariogram:
    def test_matches_brute_force(self, ray_session):
        rng = np.random.RandomState(0)
        df, g = _raster(rng)
        got = semivariogram_tiles(
            rd.from_pandas(df).repartition(4), LAGS, n_buckets=8
        ).to_pandas()
        want = _brute(g, LAGS)
        assert len(got) == 2 * len(LAGS)
        for _, r in got.iterrows():
            n, hi, lo, total = want[(r["direction"], int(r["lag"]))]
            assert (int(r["n_pairs"]), int(r["ss_hi"]), int(r["ss_lo"])) == (
                n, hi, lo,
            ), (r["direction"], r["lag"])
            assert int(r["ss_hi"]) * 4294967296 + int(r["ss_lo"]) == total

    def test_partition_invariance(self, ray_session):
        rng = np.random.RandomState(1)
        df, _ = _raster(rng, tiles_y=2, tiles_x=3, h=6, w=6)
        a = (
            semivariogram_tiles(rd.from_pandas(df).repartition(1), [1, 3], n_buckets=4)
            .to_pandas().sort_values(["direction", "lag"]).reset_index(drop=True)
        )
        b = (
            semivariogram_tiles(rd.from_pandas(df).repartition(6), [1, 3], n_buckets=16)
            .to_pandas().sort_values(["direction", "lag"]).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            a[["direction", "lag", "n_pairs", "ss_hi", "ss_lo"]],
            b[["direction", "lag", "n_pairs", "ss_hi", "ss_lo"]],
        )

    def test_gamma_values(self, ray_session):
        rng = np.random.RandomState(2)
        df, g = _raster(rng, tiles_y=2, tiles_x=2, h=6, w=6)
        got = semivariogram_tiles(rd.from_pandas(df), [1], n_buckets=4).to_pandas()
        vals = semivariogram_values(got).set_index("direction")
        u = np.floor(g * 1_000_000 + 0.5).astype(np.int64) / 1e6
        de = u[:, 1:] - u[:, :-1]
        expect_e = float((de * de).sum()) / (2.0 * de.size)
        assert vals.loc["e", "gamma"] == pytest.approx(expect_e, rel=1e-9)

    def test_lag_exceeds_tile_raises(self, ray_session):
        rng = np.random.RandomState(3)
        df, _ = _raster(rng, tiles_y=1, tiles_x=2, h=4, w=4)
        with pytest.raises(Exception, match="max lag"):
            semivariogram_tiles(rd.from_pandas(df), [8], n_buckets=2).to_pandas()
