"""Global histogram equalization: brute integer replay, flat raster,
partition invariance."""

import numpy as np
import pandas as pd
import ray.data as rd

from gridfia_ray.pipelines.histeq import equalize_result


def _tiles_from_grid(g: np.ndarray, th: int, tw: int) -> pd.DataFrame:
    H, W = g.shape
    rows = []
    for tr in range(H // th):
        for tc in range(W // tw):
            arr = g[tr * th : (tr + 1) * th, tc * tw : (tc + 1) * tw]
            rows.append(
                {
                    "metric": "total_biomass",
                    "tile_row": tr,
                    "tile_col": tc,
                    "h": th,
                    "w": tw,
                    "pix": np.ascontiguousarray(arr, dtype=np.float64).tobytes(),
                    "dtype": "float64",
                }
            )
    return pd.DataFrame(rows)


def brute_histeq(g: np.ndarray, bins: int = 256) -> np.ndarray:
    u = np.floor(g * 1_000_000 + 0.5).astype(np.int64)
    lo, hi, n = int(u.min()), int(u.max()), u.size
    width = hi - lo + 1
    b = (u - lo) * bins // width
    full = np.bincount(b.ravel(), minlength=bins)
    cdf = np.cumsum(full)
    cdf_min = int(cdf[np.flatnonzero(full)[0]])
    if n == cdf_min:
        return np.zeros_like(u)
    lut = np.maximum((cdf - cdf_min) * (bins - 1) // (n - cdf_min), 0)
    return lut[b]


def _run(g: np.ndarray, th: int, tw: int, n_parts: int = 4) -> np.ndarray:
    ds = rd.from_pandas(_tiles_from_grid(g, th, tw)).repartition(n_parts)
    out = equalize_result(ds).to_pandas()
    return out.pivot(index="y", columns="x", values="eq").to_numpy()


class TestHistEq:
    def test_matches_brute_force(self, ray_session):
        rng = np.random.RandomState(3)
        g = rng.rand(16, 16) * 500
        np.testing.assert_array_equal(_run(g, 4, 4), brute_histeq(g))

    def test_skewed_distribution_stretches(self, ray_session):
        # heavily skewed input: equalized output should span the range
        rng = np.random.RandomState(5)
        g = rng.rand(16, 16) ** 6 * 100
        eq = _run(g, 8, 8)
        np.testing.assert_array_equal(eq, brute_histeq(g))
        assert eq.max() == 255 and eq.min() == 0

    def test_flat_raster_maps_to_zero(self, ray_session):
        g = np.full((8, 8), 42.5)
        assert (_run(g, 4, 4) == 0).all()

    def test_partition_invariance(self, ray_session):
        rng = np.random.RandomState(9)
        g = rng.rand(16, 16) * 90
        np.testing.assert_array_equal(
            _run(g, 4, 4, n_parts=2), _run(g, 8, 8, n_parts=7)
        )
