"""Temporal trend over dated tile stacks: brute-force per-pixel OLS
oracle, synthetic-stack determinism, duplicate/missing-year guards,
partition invariance."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from gridfia_ray.pipelines.temporal import make_yearly_stack, temporal_trend_tiles


def _result(rng, tiles_y=2, tiles_x=2, h=5, w=5):
    rows = []
    g = np.zeros((tiles_y * h, tiles_x * w))
    for tr in range(tiles_y):
        for tc in range(tiles_x):
            arr = (rng.rand(h, w) * 100).astype(np.float64)
            g[tr * h:(tr + 1) * h, tc * w:(tc + 1) * w] = arr
            rows.append(
                {"metric": "total_biomass", "tile_row": tr, "tile_col": tc,
                 "h": h, "w": w, "pix": arr.tobytes(), "dtype": "float64"}
            )
    return pd.DataFrame(rows), g


def _brute_stack(g, n_years):
    u = np.floor(g * 1e6 + 0.5).astype(np.int64)
    H, W = g.shape
    yy, xx = np.meshgrid(np.arange(H, dtype=np.int64),
                         np.arange(W, dtype=np.int64), indexing="ij")
    coef = (yy * 2654435761 + xx * 40503) % 1_000_000 - 500_000
    return np.stack(
        [u + t * coef + (t * 31 + xx + yy) % 7_000 for t in range(n_years)]
    )


class TestTemporalTrend:
    def test_matches_brute_force_ols(self, ray_session):
        rng = np.random.RandomState(0)
        df, g = _result(rng)
        K = 5
        stack = make_yearly_stack(rd.from_pandas(df).repartition(3), K)
        got = (temporal_trend_tiles(stack, n_buckets=4)
               .to_pandas().set_index(["y", "x"]))
        cube = _brute_stack(g, K).astype(np.float64)
        t = np.arange(K, dtype=np.float64)
        tbar = t.mean()
        slope = ((cube - cube.mean(0)) * (t - tbar)[:, None, None]).sum(0) / (
            ((t - tbar) ** 2).sum()
        )
        delta = cube[-1] - cube[0]
        assert len(got) == g.size
        for y in range(g.shape[0]):
            for x in range(g.shape[1]):
                assert got.loc[(y, x), "slope"] == pytest.approx(
                    slope[y, x], rel=1e-12
                ), (y, x)
                assert got.loc[(y, x), "delta"] == int(delta[y, x])

    def test_pure_linear_series_is_exact(self, ray_session):
        # hand stack: v(t) = 7 + 3t per pixel -> slope exactly 3
        rows = []
        for t in range(4):
            arr = np.full((3, 3), 7 + 3 * t, dtype=np.int64)
            rows.append({"metric": "m", "year": t, "tile_row": 0,
                         "tile_col": 0, "h": 3, "w": 3,
                         "pix": arr.tobytes(), "dtype": "int64"})
        got = temporal_trend_tiles(rd.from_pandas(pd.DataFrame(rows))).to_pandas()
        assert (got["slope"] == 3.0).all()
        assert (got["delta"] == 9).all()

    def test_partition_invariant(self, ray_session):
        rng = np.random.RandomState(1)
        df, _ = _result(rng, tiles_y=1, tiles_x=3, h=4, w=4)
        stack = make_yearly_stack(rd.from_pandas(df), 3)
        a = (temporal_trend_tiles(stack.repartition(2), n_buckets=4)
             .to_pandas().sort_values(["y", "x"]).reset_index(drop=True))
        b = (temporal_trend_tiles(stack.repartition(7), n_buckets=16)
             .to_pandas().sort_values(["y", "x"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b)

    def test_single_year_rejected(self, ray_session):
        arr = np.ones((2, 2), dtype=np.int64)
        df = pd.DataFrame([{"metric": "m", "year": 0, "tile_row": 0,
                            "tile_col": 0, "h": 2, "w": 2,
                            "pix": arr.tobytes(), "dtype": "int64"}])
        with pytest.raises(Exception, match="distinct years"):
            temporal_trend_tiles(rd.from_pandas(df)).to_pandas()

    def test_duplicate_year_rejected(self, ray_session):
        arr = np.ones((2, 2), dtype=np.int64)
        rows = [{"metric": "m", "year": t, "tile_row": 0, "tile_col": 0,
                 "h": 2, "w": 2, "pix": arr.tobytes(), "dtype": "int64"}
                for t in (0, 1, 1)]
        with pytest.raises(Exception, match="distinct years"):
            temporal_trend_tiles(rd.from_pandas(pd.DataFrame(rows))).to_pandas()


class TestTemporalComposite:
    def test_median_min_max_brute(self, ray_session):
        import pandas as pd

        from gridfia_ray.pipelines.temporal import (
            make_yearly_stack,
            temporal_composite_tiles,
        )

        rng = np.random.RandomState(41)
        g = rng.rand(8, 8) * 100
        rows = []
        for tr in range(2):
            for tc in range(2):
                arr = g[tr * 4 : (tr + 1) * 4, tc * 4 : (tc + 1) * 4]
                rows.append(
                    {"metric": "total_biomass", "tile_row": tr, "tile_col": tc,
                     "h": 4, "w": 4,
                     "pix": np.ascontiguousarray(arr, dtype=np.float64).tobytes(),
                     "dtype": "float64"}
                )
        stack = make_yearly_stack(rd.from_pandas(pd.DataFrame(rows)), 5)
        out = (
            temporal_composite_tiles(stack, n_buckets=4)
            .to_pandas()
            .set_index(["y", "x"])
        )
        u = np.floor(g * 1_000_000 + 0.5).astype(np.int64)
        for y in range(8):
            for x in range(8):
                coef = (y * 2654435761 + x * 40503) % 1_000_000 - 500_000
                vals = np.array(
                    [u[y, x] + t * coef + (t * 31 + x + y) % 7000 for t in range(5)]
                )
                s = np.sort(vals)
                assert out.loc[(y, x), "med_u"] == s[2]
                assert out.loc[(y, x), "min_u"] == s[0]
                assert out.loc[(y, x), "max_u"] == s[4]

    def test_even_k_takes_lower_middle(self, ray_session):
        import pandas as pd

        from gridfia_ray.pipelines.temporal import (
            make_yearly_stack,
            temporal_composite_tiles,
        )

        rows = [{"metric": "m", "tile_row": 0, "tile_col": 0, "h": 2, "w": 2,
                 "pix": np.full((2, 2), 10.0).tobytes(), "dtype": "float64"}]
        stack = make_yearly_stack(rd.from_pandas(pd.DataFrame(rows)), 4)
        out = temporal_composite_tiles(stack, n_buckets=2).to_pandas()
        u0 = 10_000_000
        for _, r in out.iterrows():
            y, x = int(r["y"]), int(r["x"])
            coef = (y * 2654435761 + x * 40503) % 1_000_000 - 500_000
            vals = np.sort(
                [u0 + t * coef + (t * 31 + x + y) % 7000 for t in range(4)]
            )
            assert int(r["med_u"]) == vals[1]  # k=ceil(4/2)=2 -> 2nd smallest


class TestTemporalDelta:
    def test_delta_matches_brute(self, ray_session):
        import pandas as pd

        from gridfia_ray.pipelines.temporal import (
            make_yearly_stack,
            temporal_delta_tiles,
        )

        rng = np.random.RandomState(43)
        df, g = _result(rng)
        stack = make_yearly_stack(rd.from_pandas(df).repartition(3), 3)
        out = temporal_delta_tiles(stack, n_buckets=4).to_pandas()
        cube = _brute_stack(g, 3)
        want = cube[-1] - cube[0]
        for _, r in out.iterrows():
            tr, tc = int(r["tile_row"]), int(r["tile_col"])
            d = np.frombuffer(r["pix"], dtype=np.int64).reshape(5, 5)
            np.testing.assert_array_equal(
                d, want[tr * 5 : (tr + 1) * 5, tc * 5 : (tc + 1) * 5]
            )
            assert r["dtype"] == "int64"

    def test_absolute_mode(self, ray_session):
        import pandas as pd

        from gridfia_ray.pipelines.temporal import (
            make_yearly_stack,
            temporal_delta_tiles,
        )

        rng = np.random.RandomState(47)
        df, g = _result(rng, tiles_y=1, tiles_x=1)
        stack = make_yearly_stack(rd.from_pandas(df), 2)
        out = temporal_delta_tiles(stack, absolute=True, n_buckets=2).to_pandas()
        cube = _brute_stack(g, 2)
        d = np.frombuffer(out.iloc[0]["pix"], dtype=np.int64).reshape(5, 5)
        np.testing.assert_array_equal(d, np.abs(cube[1] - cube[0]))

    def test_single_year_raises(self, ray_session):
        import pandas as pd
        import pytest as _pt

        from gridfia_ray.pipelines.temporal import (
            make_yearly_stack,
            temporal_delta_tiles,
        )

        rng = np.random.RandomState(53)
        df, _ = _result(rng, tiles_y=1, tiles_x=1)
        stack = make_yearly_stack(rd.from_pandas(df), 1)
        with _pt.raises(Exception, match="distinct years"):
            temporal_delta_tiles(stack, n_buckets=2).to_pandas()
