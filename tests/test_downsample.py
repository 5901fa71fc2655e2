"""Overview-pyramid downsample: block-sum exactness, multi-level
composition, factor validation."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from gridfia_ray.stages.assemble import downsample_result_tiles


def _tiles(rng, n=4, h=16, w=16):
    rows = []
    for i in range(n):
        arr = (rng.rand(h, w) * 100).astype(np.float64)
        rows.append(
            {
                "metric": "total_biomass",
                "tile_row": i // 2,
                "tile_col": i % 2,
                "h": h,
                "w": w,
                "pix": arr.tobytes(),
                "dtype": "float64",
            }
        )
    return pd.DataFrame(rows)


def _grid(df):
    """Unpack result tiles into one (metric fixed) global grid dict."""
    out = {}
    for _, r in df.iterrows():
        arr = np.frombuffer(r["pix"], dtype=np.dtype(r["dtype"])).reshape(r["h"], r["w"])
        out[(int(r["tile_row"]), int(r["tile_col"]))] = arr
    return out


class TestDownsample:
    def test_block_sum_scaled_int(self, ray_session):
        rng = np.random.RandomState(0)
        df = _tiles(rng)
        got = downsample_result_tiles(rd.from_pandas(df), 2).to_pandas()
        src, dst = _grid(df), _grid(got)
        for key, arr in src.items():
            u = np.floor(arr * 1_000_000 + 0.5).astype(np.int64)
            want = u.reshape(8, 2, 8, 2).sum(axis=(1, 3))
            assert (dst[key] == want).all()
            assert dst[key].dtype == np.int64
        # mass conservation: per-tile sums unchanged
        for key, arr in src.items():
            assert dst[key].sum() == np.floor(arr * 1e6 + 0.5).astype(np.int64).sum()

    def test_two_levels_compose(self, ray_session):
        rng = np.random.RandomState(1)
        df = _tiles(rng, n=1)
        lvl1 = downsample_result_tiles(rd.from_pandas(df), 2)
        lvl2 = downsample_result_tiles(lvl1, 2, scaled_int=False).to_pandas()
        # integer input tiles stay in int64 so chained levels compose
        # bit-exactly even past 2**53
        arr = _grid(df)[(0, 0)]
        u = np.floor(arr * 1e6 + 0.5).astype(np.int64)
        want = u.reshape(4, 4, 4, 4).sum(axis=(1, 3))
        got = _grid(lvl2)[(0, 0)]
        assert got.dtype == np.int64
        assert (got == want).all()

    def test_float_mode(self, ray_session):
        rng = np.random.RandomState(2)
        df = _tiles(rng, n=1, h=4, w=4)
        got = downsample_result_tiles(rd.from_pandas(df), 2, scaled_int=False).to_pandas()
        arr = _grid(df)[(0, 0)]
        want = arr.reshape(2, 2, 2, 2).sum(axis=(1, 3))
        assert np.allclose(_grid(got)[(0, 0)], want)

    def test_bad_factor(self, ray_session):
        df = _tiles(np.random.RandomState(3), n=1, h=6, w=6)
        with pytest.raises(ValueError, match="factor must be"):
            downsample_result_tiles(rd.from_pandas(df), 1)
        with pytest.raises(Exception, match="does not divide"):
            downsample_result_tiles(rd.from_pandas(df), 4).to_pandas()


class TestDoubleScaleGuard:
    def test_default_relevel_raises(self, ray_session):
        rng = np.random.RandomState(9)
        df = _tiles(rng, n=1)
        lvl1 = downsample_result_tiles(rd.from_pandas(df), 2)
        with pytest.raises(Exception, match="already in the scaled domain"):
            downsample_result_tiles(lvl1, 2).to_pandas()


class TestMosaic:
    @staticmethod
    def _tiles(vals, keys, h=4, dtype=np.int64):
        import ray.data as rd

        rows = []
        for (tr, tc), v in zip(keys, vals):
            arr = np.full((h, h), v, dtype=dtype)
            rows.append(
                {"metric": "m", "tile_row": tr, "tile_col": tc, "h": h, "w": h,
                 "pix": arr.tobytes(), "dtype": np.dtype(dtype).name}
            )
        return rd.from_pandas(pd.DataFrame(rows))

    def _first_px(self, out):
        return {
            (int(r["tile_row"]), int(r["tile_col"])): int(
                np.frombuffer(r["pix"], np.int64)[0]
            )
            for _, r in out.iterrows()
        }

    def test_policies(self, ray_session):
        from gridfia_ray.stages.assemble import mosaic_result_tiles

        A = self._tiles([1, 2, 3], [(0, 0), (0, 1), (1, 0)])
        B = self._tiles([10, 20], [(0, 1), (1, 1)])
        cases = {
            "last": {(0, 0): 1, (0, 1): 10, (1, 0): 3, (1, 1): 20},
            "sum": {(0, 0): 1, (0, 1): 12, (1, 0): 3, (1, 1): 20},
            "max": {(0, 0): 1, (0, 1): 10, (1, 0): 3, (1, 1): 20},
        }
        for policy, expect in cases.items():
            got = self._first_px(
                mosaic_result_tiles([A, B], policy=policy).to_pandas()
            )
            assert got == expect, policy

    def test_three_sources_and_source_order_wins(self, ray_session):
        from gridfia_ray.stages.assemble import mosaic_result_tiles

        A = self._tiles([1], [(0, 0)])
        B = self._tiles([2], [(0, 0)])
        C = self._tiles([3], [(0, 0)])
        got = self._first_px(
            mosaic_result_tiles([A, B, C], policy="last").to_pandas()
        )
        assert got == {(0, 0): 3}  # source INDEX, not arrival order

    def test_shape_mismatch_rejected(self, ray_session):
        import pytest as _pytest

        from gridfia_ray.stages.assemble import mosaic_result_tiles

        A = self._tiles([1], [(0, 0)], h=4)
        B = self._tiles([2], [(0, 0)], h=8)
        with _pytest.raises(Exception, match="disagree"):
            mosaic_result_tiles([A, B], policy="sum").to_pandas()
        # 'last' never touches pixels: mismatched shapes are fine
        got = mosaic_result_tiles([A, B], policy="last").to_pandas()
        assert int(got["h"].iloc[0]) == 8

    def test_bad_inputs(self, ray_session):
        import pytest as _pytest

        from gridfia_ray.stages.assemble import mosaic_result_tiles

        A = self._tiles([1], [(0, 0)])
        with _pytest.raises(ValueError, match="policy"):
            mosaic_result_tiles([A, A], policy="mean")
        with _pytest.raises(ValueError, match="two sources"):
            mosaic_result_tiles([A])


class TestDownsampleMajority:
    def _tiles(self, g):
        import pandas as pd

        return pd.DataFrame(
            [{"metric": "m", "tile_row": 0, "tile_col": 0,
              "h": g.shape[0], "w": g.shape[1],
              "pix": np.ascontiguousarray(g, dtype=np.int64).tobytes(),
              "dtype": "int64"}]
        )

    def test_mode_and_tie_break(self, ray_session):
        from gridfia_ray.stages.assemble import downsample_majority_tiles

        g = np.array(
            [[3, 3, 7, 5],
             [1, 2, 5, 7],   # block A: {3,3,1,2} -> 3; block B: {7,5,5,7} tie -> 5
             [9, 9, 0, 0],
             [9, 4, 0, 8]],  # block C: {9,9,9,4} -> 9; block D: {0,0,0,8} -> 0
            dtype=np.int64,
        )
        out = downsample_majority_tiles(
            rd.from_pandas(self._tiles(g)), 2
        ).to_pandas()
        got = np.frombuffer(out.iloc[0]["pix"], dtype=np.int64).reshape(2, 2)
        np.testing.assert_array_equal(got, [[3, 5], [9, 0]])
        assert out.iloc[0]["h"] == 2 and out.iloc[0]["dtype"] == "int64"

    def test_factor_must_divide(self, ray_session):
        import pytest as _pt

        from gridfia_ray.stages.assemble import downsample_majority_tiles

        g = np.zeros((6, 6), dtype=np.int64)
        with _pt.raises(Exception, match="does not divide"):
            downsample_majority_tiles(rd.from_pandas(self._tiles(g)), 4).to_pandas()
