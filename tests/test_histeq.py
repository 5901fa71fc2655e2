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


class TestHistMatch:
    def _brute(self, src: np.ndarray, ref: np.ndarray, bins=256) -> np.ndarray:
        """Sequential integer replay of match_result over µ-grids."""
        s = np.floor(src.astype(np.float64) * 1_000_000 + 0.5).astype(np.int64)
        r = np.floor(ref.astype(np.float64) * 1_000_000 + 0.5).astype(np.int64)
        lo_s, w_s = int(s.min()), int(s.max()) - int(s.min()) + 1
        lo_r, w_r = int(r.min()), int(r.max()) - int(r.min()) + 1
        bs = (s - lo_s) * bins // w_s
        br = (r - lo_r) * bins // w_r
        cs = np.cumsum(np.bincount(bs.ravel(), minlength=bins))
        cr = np.cumsum(np.bincount(br.ravel(), minlength=bins))
        n_s, n_r = int(s.size), int(r.size)
        lut = np.empty(bins, dtype=np.int64)
        j = 0
        for b in range(bins):
            while j < bins - 1 and int(cr[j]) * n_s < int(cs[b]) * n_r:
                j += 1
            lut[b] = j
        return lut[bs]

    def _run(self, src, ref, parts=3):
        from gridfia_ray.pipelines.histeq import match_result

        ds_s = rd.from_pandas(_tiles_from_grid(src, 8, 8)).repartition(parts)
        ds_r = rd.from_pandas(_tiles_from_grid(ref, 8, 8)).repartition(parts)
        out = match_result(ds_s, ds_r).to_pandas().sort_values(["y", "x"])
        H, W = src.shape
        return out["m"].to_numpy(np.int64).reshape(H, W)

    def test_matches_brute_force(self, ray_session):
        rng = np.random.RandomState(9)
        src = rng.gamma(2.0, 20.0, (32, 32))  # skewed
        ref = rng.uniform(0, 300, (32, 32))  # flat-ish
        np.testing.assert_array_equal(self._run(src, ref), self._brute(src, ref))

    def test_self_match_is_monotone_identityish(self, ray_session):
        # matching a raster onto itself keeps pixel ORDER (monotone in
        # the source bins) and lands each pixel in its own bin
        rng = np.random.RandomState(3)
        g = rng.uniform(0, 100, (16, 16))
        m = self._run(g, g)
        s = np.floor(g * 1_000_000 + 0.5).astype(np.int64)
        bins = (s - s.min()) * 256 // (int(s.max() - s.min()) + 1)
        np.testing.assert_array_equal(m, bins)

    def test_flat_reference_collapses(self, ray_session):
        rng = np.random.RandomState(4)
        src = rng.uniform(0, 50, (16, 16))
        ref = np.full((16, 16), 7.5)
        m = self._run(src, ref)
        assert set(np.unique(m)) <= {0}

    def test_partition_invariance(self, ray_session):
        rng = np.random.RandomState(5)
        src = rng.uniform(0, 90, (24, 24))
        ref = rng.gamma(3.0, 5.0, (24, 24))
        np.testing.assert_array_equal(
            self._run(src, ref, parts=1), self._run(src, ref, parts=9)
        )
