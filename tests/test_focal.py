"""Focal 3x3 window aggregation with halo exchange: brute-force oracle
over a multi-tile raster, boundary counts, shape validation."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from gridfia_ray.pipelines.focal import focal_sum_tiles


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
    # stitch the global grid for the brute-force oracle
    g = np.zeros((tiles_y * h, tiles_x * w))
    for (tr, tc), arr in grids.items():
        g[tr * h:(tr + 1) * h, tc * w:(tc + 1) * w] = arr
    return pd.DataFrame(rows), g


def _brute(g):
    u = np.floor(g * 1_000_000 + 0.5).astype(np.int64)
    H, W = g.shape
    out = {}
    for y in range(H):
        for x in range(W):
            ys = slice(max(y - 1, 0), min(y + 2, H))
            xs = slice(max(x - 1, 0), min(x + 2, W))
            out[(y, x)] = (int(u[ys, xs].sum()), int(u[ys, xs].size))
    return out


class TestFocalSum:
    def test_matches_brute_force(self, ray_session):
        rng = np.random.RandomState(0)
        df, g = _raster(rng)
        got = focal_sum_tiles(rd.from_pandas(df).repartition(4), n_buckets=8).to_pandas()
        want = _brute(g)
        assert len(got) == g.size
        for _, r in got.iterrows():
            s, n = want[(int(r["y"]), int(r["x"]))]
            assert (r["sum_u"], r["n_nbrs"]) == (s, n), (r["y"], r["x"])

    def test_boundary_counts(self, ray_session):
        rng = np.random.RandomState(1)
        df, g = _raster(rng, tiles_y=2, tiles_x=2, h=4, w=4)
        got = focal_sum_tiles(rd.from_pandas(df)).to_pandas()
        n = got.set_index(["y", "x"])["n_nbrs"]
        assert n[(0, 0)] == 4 and n[(0, 7)] == 4  # corners
        assert n[(0, 3)] == 6 and n[(3, 0)] == 6  # edges
        assert n[(4, 4)] == 9  # interior (crosses tile borders)

    def test_partition_invariant(self, ray_session):
        rng = np.random.RandomState(2)
        df, _ = _raster(rng, tiles_y=2, tiles_x=3, h=4, w=4)
        a = (focal_sum_tiles(rd.from_pandas(df).repartition(2), n_buckets=4)
             .to_pandas().sort_values(["y", "x"]).reset_index(drop=True))
        b = (focal_sum_tiles(rd.from_pandas(df).repartition(6), n_buckets=16)
             .to_pandas().sort_values(["y", "x"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b)

    def test_mixed_shapes_rejected(self, ray_session):
        rng = np.random.RandomState(3)
        df, _ = _raster(rng, tiles_y=1, tiles_x=2, h=4, w=4)
        small = (rng.rand(2, 2)).astype(np.float64)
        df = pd.concat([df, pd.DataFrame([{
            "metric": "total_biomass", "tile_row": 0, "tile_col": 2,
            "h": 2, "w": 2, "pix": small.tobytes(), "dtype": "float64"}])],
            ignore_index=True)
        with pytest.raises(Exception, match="mixed tile shapes"):
            focal_sum_tiles(rd.from_pandas(df)).to_pandas()


class TestFocalGradient:
    def test_matches_horn_brute_force(self, ray_session):
        from gridfia_ray.pipelines.focal import focal_gradient_tiles

        rng = np.random.RandomState(4)
        df, g = _raster(rng, tiles_y=2, tiles_x=2, h=6, w=6)
        got = focal_gradient_tiles(rd.from_pandas(df).repartition(3),
                                   n_buckets=4).to_pandas()
        u = np.floor(g * 1_000_000 + 0.5).astype(np.int64)
        H, W = g.shape
        # interior only
        assert len(got) == (H - 2) * (W - 2)
        idx = got.set_index(["y", "x"])
        for y in range(1, H - 1):
            for x in range(1, W - 1):
                wdw = u[y - 1:y + 2, x - 1:x + 2]
                ddx = int((wdw[0, 2] + 2 * wdw[1, 2] + wdw[2, 2])
                          - (wdw[0, 0] + 2 * wdw[1, 0] + wdw[2, 0]))
                ddy = int((wdw[2, 0] + 2 * wdw[2, 1] + wdw[2, 2])
                          - (wdw[0, 0] + 2 * wdw[0, 1] + wdw[0, 2]))
                row = idx.loc[(y, x)]
                assert (int(row["ddx_u"]), int(row["ddy_u"])) == (ddx, ddy), (y, x)

    def test_constant_raster_zero_gradient(self, ray_session):
        from gridfia_ray.pipelines.focal import focal_gradient_tiles

        arr = np.full((4, 4), 3.25)
        df = pd.DataFrame([{
            "metric": "m", "tile_row": 0, "tile_col": 0, "h": 4, "w": 4,
            "pix": arr.tobytes(), "dtype": "float64"}])
        got = focal_gradient_tiles(rd.from_pandas(df)).to_pandas()
        assert (got["ddx_u"] == 0).all() and (got["ddy_u"] == 0).all()
        assert len(got) == 4  # 2x2 interior


class TestHillshade:
    def test_esri_worked_example(self):
        """The shading leaf must reproduce ESRI's published hillshade
        worked example (azimuth 315, altitude 45, cellsize 5): the
        3x3 elevation window's center shades to 154."""
        from gridfia_ray.pipelines.focal import hillshade_from_gradient

        win = np.array(
            [[2450, 2461, 2483], [2452, 2461, 2483], [2447, 2455, 2477]],
            dtype=np.float64,
        )
        a, b, c, d, f, g, h, i = (
            win[0, 0], win[0, 1], win[0, 2], win[1, 0], win[1, 2],
            win[2, 0], win[2, 1], win[2, 2],
        )
        # micro-scaled int components as the gradient pipeline emits
        ddx_u = ((c + 2 * f + i) - (a + 2 * d + g)) * 1e6
        ddy_u = ((g + 2 * h + i) - (a + 2 * b + c)) * 1e6
        out = hillshade_from_gradient(
            np.array([ddx_u]), np.array([ddy_u]), 5.0,
            azimuth_deg=315.0, altitude_deg=45.0,
        )
        assert out.tolist() == [154]

    def test_flat_and_orientation(self):
        from gridfia_ray.pipelines.focal import hillshade_from_gradient

        flat = hillshade_from_gradient(np.zeros(2), np.zeros(2), 30.0)
        assert (flat == 180).all()  # round(255*cos(45 deg))
        mag = 0.5 * 8 * 30 * 1e6  # dz/dx = dz/dy = 0.5
        # dz/dx>0, dz/dy>0 -> descends toward NW -> faces the 315 light
        facing = hillshade_from_gradient(np.array([mag]), np.array([mag]), 30.0)
        away = hillshade_from_gradient(np.array([-mag]), np.array([-mag]), 30.0)
        assert facing[0] > 180 > away[0] >= 0

    def test_pipeline_matches_pinned_oracle(self, ray_session):
        """Distributed halo-exchange hillshade == the numpy-shift
        replay over the fixture generator's independent pixel table."""
        import pyarrow.parquet as pq

        from gridfia_ray import oracle_pins
        from gridfia_ray.contract import q_hillshade

        got = q_hillshade("unused")
        exp = (
            pq.read_table(oracle_pins.ensure_hspin()["expected"])
            .to_pandas()
            .sort_values(["y", "x"])
            .reset_index(drop=True)
        )
        assert len(got) == len(exp) == 510 * 510
        assert (got["shade"].to_numpy() == exp["shade"].to_numpy()).all()


class TestFocalTpi:
    def test_hand_computed_small_grid(self, ray_session):
        """3x3 tiles of a known ramp: interior TPI9 = 9c - window sum."""
        import pandas as pd
        import ray.data as rd

        from gridfia_ray.pipelines.focal import focal_tpi_tiles

        t = 4
        G = (np.arange(8 * 8, dtype=np.int64) ** 2).reshape(8, 8)
        rows = []
        for tr in range(2):
            for tc in range(2):
                block = G[tr * t:(tr + 1) * t, tc * t:(tc + 1) * t]
                rows.append(
                    {"metric": "m", "tile_row": tr, "tile_col": tc, "h": t,
                     "w": t, "pix": block.astype("<f8").tobytes(),
                     "dtype": "float64"}
                )
        out = (
            focal_tpi_tiles(rd.from_pandas(pd.DataFrame(rows)), n_buckets=2)
            .to_pandas()
            .set_index(["y", "x"])["tpi9_u"]
        )
        assert len(out) == 36  # (8-2)^2 interior pixels
        for y in range(1, 7):
            for x in range(1, 7):
                S = int(G[y - 1:y + 2, x - 1:x + 2].sum())
                # integer tiles scale exactly: s6(v) = v * 1e6
                want = (9 * int(G[y, x]) - S) * 1_000_000
                assert out.loc[(y, x)] == want, (y, x)


class TestAspectOctants:
    def test_cardinal_and_diagonal_directions(self):
        from gridfia_ray.pipelines.focal import aspect_octants

        # (ddx, ddy) -> expected sector start (N=0 ... NW=7), -1 flat
        cases = [
            (0, 10, 0), (-10, 10, 1), (-10, 0, 2), (-10, -10, 3),
            (0, -10, 4), (10, -10, 5), (10, 0, 6), (10, 10, 7), (0, 0, -1),
        ]
        for ddx, ddy, want in cases:
            got = aspect_octants(np.array([ddx]), np.array([ddy]))[0]
            assert got == want, (ddx, ddy, got, want)

    def test_matches_atan2_partition_exhaustively(self):
        """Integer sector rules == the float atan2 sector for every
        gradient pair (and every pair maps to exactly one class)."""
        from gridfia_ray.pipelines.focal import aspect_octants

        gx, gy = np.meshgrid(np.arange(-50, 51), np.arange(-50, 51))
        dd = np.stack([gx.ravel(), gy.ravel()], axis=1).astype(np.int64)
        o = aspect_octants(dd[:, 0], dd[:, 1])
        u = -dd[:, 0].astype(float)
        v = dd[:, 1].astype(float)
        theta = (np.degrees(np.arctan2(u, v)) + 360) % 360
        want = np.where(
            (u == 0) & (v == 0), -1, np.floor(theta / 45).astype(int) % 8
        )
        assert (o == want).all()


class TestFocalMedian:
    def test_matches_brute_force(self, ray_session):
        from gridfia_ray.pipelines.focal import focal_median_tiles

        rng = np.random.RandomState(23)
        df, g = _raster(rng)
        got = focal_median_tiles(
            rd.from_pandas(df).repartition(4), n_buckets=8
        ).to_pandas()
        u = np.floor(g * 1_000_000 + 0.5).astype(np.int64)
        H, W = g.shape
        assert len(got) == (H - 2) * (W - 2)  # interior only
        for _, r in got.iterrows():
            y, x = int(r["y"]), int(r["x"])
            win = np.sort(u[y - 1 : y + 2, x - 1 : x + 2].ravel())
            assert int(r["med_u"]) == int(win[4]), (y, x)

    def test_salt_noise_removed(self, ray_session):
        from gridfia_ray.pipelines.focal import focal_median_tiles

        # constant field with one hot speck: the median erases it
        df_rows = []
        g = np.full((16, 16), 10.0)
        g[7, 9] = 9999.0
        for tr in range(2):
            for tc in range(2):
                arr = g[tr * 8 : (tr + 1) * 8, tc * 8 : (tc + 1) * 8]
                df_rows.append(
                    {"metric": "total_biomass", "tile_row": tr, "tile_col": tc,
                     "h": 8, "w": 8,
                     "pix": np.ascontiguousarray(arr).tobytes(),
                     "dtype": "float64"}
                )
        out = focal_median_tiles(
            rd.from_pandas(pd.DataFrame(df_rows)), n_buckets=4
        ).to_pandas()
        assert (out["med_u"] == 10_000_000).all()


class TestFocalMajority:
    def _int_tiles(self, g: np.ndarray, th: int, tw: int) -> pd.DataFrame:
        rows = []
        for tr in range(g.shape[0] // th):
            for tc in range(g.shape[1] // tw):
                arr = g[tr * th : (tr + 1) * th, tc * tw : (tc + 1) * tw]
                rows.append(
                    {"metric": "dominant_species", "tile_row": tr, "tile_col": tc,
                     "h": th, "w": tw,
                     "pix": np.ascontiguousarray(arr, dtype=np.int64).tobytes(),
                     "dtype": "int64"}
                )
        return pd.DataFrame(rows)

    def test_matches_brute_mode(self, ray_session):
        from collections import Counter

        from gridfia_ray.pipelines.focal import focal_majority_tiles

        rng = np.random.RandomState(31)
        g = rng.randint(0, 4, size=(16, 16)).astype(np.int64)
        out = focal_majority_tiles(
            rd.from_pandas(self._int_tiles(g, 4, 4)).repartition(3), n_buckets=8
        ).to_pandas()
        assert len(out) == 14 * 14
        for _, r in out.iterrows():
            y, x = int(r["y"]), int(r["x"])
            win = g[y - 1 : y + 2, x - 1 : x + 2].ravel()
            cnt = Counter(win.tolist())
            best = max(cnt.values())
            want = min(v for v, c in cnt.items() if c == best)  # tie -> min
            assert int(r["maj"]) == want, (y, x)

    def test_integer_tiles_pass_unscaled(self, ray_session):
        from gridfia_ray.pipelines.focal import focal_majority_tiles

        g = np.full((8, 8), 3, dtype=np.int64)
        out = focal_majority_tiles(
            rd.from_pandas(self._int_tiles(g, 4, 4)), n_buckets=4
        ).to_pandas()
        assert (out["maj"] == 3).all()  # not 3,000,000


class TestFocalCurvature:
    def test_matches_brute_force(self, ray_session):
        from gridfia_ray.pipelines.focal import focal_curvature_tiles

        rng = np.random.RandomState(21)
        df, g = _raster(rng, tiles_y=2, tiles_x=2, h=6, w=6)
        got = (focal_curvature_tiles(rd.from_pandas(df).repartition(3), n_buckets=8)
               .to_pandas().set_index(["y", "x"])["lap4_u"])
        u = np.floor(g * 1_000_000 + 0.5).astype(np.int64)
        H, W = g.shape
        assert len(got) == (H - 2) * (W - 2)  # interior only
        for y in range(1, H - 1):
            for x in range(1, W - 1):
                want = u[y - 1, x] + u[y + 1, x] + u[y, x - 1] + u[y, x + 1] - 4 * u[y, x]
                assert got.loc[(y, x)] == want, (y, x)

    def test_flat_surface_zero(self, ray_session):
        from gridfia_ray.pipelines.focal import focal_curvature_tiles

        arr = np.full((6, 6), 7.25)
        df = pd.DataFrame([{ "metric": "m", "tile_row": 0, "tile_col": 0,
                             "h": 6, "w": 6, "pix": arr.tobytes(),
                             "dtype": "float64"}])
        got = focal_curvature_tiles(rd.from_pandas(df)).to_pandas()
        assert (got["lap4_u"] == 0).all()


class TestGlcm:
    def test_matches_brute_force(self, ray_session):
        from gridfia_ray.pipelines.focal import glcm_counts_tiles

        rng = np.random.RandomState(22)
        df, g = _raster(rng, tiles_y=2, tiles_x=2, h=5, w=5)
        got = (glcm_counts_tiles(rd.from_pandas(df).repartition(3),
                                 n_levels=4, level_width_u=15_000_000,
                                 n_buckets=8)
               .to_pandas().set_index(["direction", "la", "lb"])["n_pairs"])
        u = np.floor(g * 1_000_000 + 0.5).astype(np.int64)
        lev = np.minimum(u // 15_000_000, 3)
        want = {}
        H, W = g.shape
        for name, dy, dx in (("e", 0, 1), ("s", 1, 0)):
            for y in range(H - dy):
                for x in range(W - dx):
                    k = (name, lev[y, x], lev[y + dy, x + dx])
                    want[k] = want.get(k, 0) + 1
        assert got.to_dict() == want
        # totals: every interior adjacency counted exactly once
        assert got.loc["e"].sum() == H * (W - 1)
        assert got.loc["s"].sum() == (H - 1) * W

    def test_partition_invariant(self, ray_session):
        from gridfia_ray.pipelines.focal import glcm_counts_tiles

        rng = np.random.RandomState(23)
        df, _ = _raster(rng, tiles_y=2, tiles_x=3, h=4, w=4)
        a = (glcm_counts_tiles(rd.from_pandas(df).repartition(2), n_buckets=4)
             .to_pandas().sort_values(["direction", "la", "lb"]).reset_index(drop=True))
        b = (glcm_counts_tiles(rd.from_pandas(df).repartition(6), n_buckets=16)
             .to_pandas().sort_values(["direction", "la", "lb"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b)


class TestFocalStatsNxN:
    def test_matches_brute_force_5x5(self, ray_session):
        from gridfia_ray.pipelines.focal import focal_stats_tiles

        rng = np.random.RandomState(7)
        df, g = _raster(rng, tiles_y=3, tiles_x=3, h=6, w=6)
        got = focal_stats_tiles(
            rd.from_pandas(df).repartition(5), radius=2, n_buckets=8
        ).to_pandas()
        u = np.floor(g * 1_000_000 + 0.5).astype(np.int64)
        H, W = g.shape
        assert len(got) == g.size
        for _, r in got.iterrows():
            y, x = int(r["y"]), int(r["x"])
            win = u[max(y - 2, 0):min(y + 3, H), max(x - 2, 0):min(x + 3, W)]
            assert int(r["sum_u"]) == int(win.sum()), (y, x)
            assert int(r["n_nbrs"]) == win.size, (y, x)
            assert int(r["min_u"]) == int(win.min()), (y, x)
            assert int(r["max_u"]) == int(win.max()), (y, x)

    def test_radius_exceeds_tile_raises(self, ray_session):
        from gridfia_ray.pipelines.focal import focal_stats_tiles

        rng = np.random.RandomState(8)
        df, _ = _raster(rng, tiles_y=1, tiles_x=2, h=4, w=4)
        with pytest.raises(Exception, match="radius"):
            focal_stats_tiles(rd.from_pandas(df), radius=5).to_pandas()


class TestUnsharp:
    def test_matches_brute_force(self, ray_session):
        from gridfia_ray.pipelines.focal import focal_unsharp_tiles

        rng = np.random.RandomState(9)
        df, g = _raster(rng, tiles_y=2, tiles_x=2, h=6, w=6)
        got = focal_unsharp_tiles(
            rd.from_pandas(df).repartition(3), n_buckets=2
        ).to_pandas()
        u = np.floor(g * 1_000_000 + 0.5).astype(np.int64)
        H, W = g.shape
        m = got.set_index(["y", "x"])["sharp_u"]
        for y in range(H):
            for x in range(W):
                ys = slice(max(y - 1, 0), min(y + 2, H))
                xs = slice(max(x - 1, 0), min(x + 2, W))
                s = int(u[ys, xs].sum())
                n = int(u[ys, xs].size)
                v = int(u[y, x])
                want = v + (3 * (n * v - s)) // (2 * n)
                assert m[(y, x)] == want, (y, x)

    def test_flat_raster_unchanged(self, ray_session):
        from gridfia_ray.pipelines.focal import focal_unsharp_tiles

        df, _ = _raster(np.random.RandomState(1), tiles_y=1, tiles_x=1)
        df["pix"] = [np.full((8, 8), 4.0).tobytes()]
        got = focal_unsharp_tiles(rd.from_pandas(df)).to_pandas()
        assert (got["sharp_u"] == 4_000_000).all()
