"""Distributed raster warp: identity round-trip, brute-force
reprojection oracle, out-of-extent NaN handling."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from gridfia_ray.geo.crs import transform_points
from gridfia_ray.pipelines.common import GridSpec
from gridfia_ray.pipelines.warp import warp_tiles

SRC = GridSpec(origin_x=-2_000_000.0, origin_y=-900_000.0, px=30.0, tile=16)


def _tiles(rng, grid=3, tile=16):
    rows, grids = [], {}
    for tr in range(grid):
        for tc in range(grid):
            arr = (rng.rand(tile, tile) * 100).astype(np.float64)
            grids[(tr, tc)] = arr
            rows.append(
                {"metric": "total_biomass", "tile_row": tr, "tile_col": tc,
                 "h": tile, "w": tile, "pix": arr.tobytes(), "dtype": "float64"}
            )
    return pd.DataFrame(rows), grids


def _unpack(df):
    return {
        (int(r["tile_row"]), int(r["tile_col"])): np.frombuffer(
            r["pix"], np.float64
        ).reshape(int(r["h"]), int(r["w"]))
        for _, r in df.iterrows()
    }


class TestWarp:
    def test_identity_grid_roundtrip(self, ray_session):
        rng = np.random.RandomState(0)
        df, grids = _tiles(rng)
        out = warp_tiles(
            rd.from_pandas(df).repartition(3), SRC, "ESRI:102039", SRC, "ESRI:102039",
            n_buckets=4,
        ).to_pandas()
        got = _unpack(out)
        for key, arr in grids.items():
            assert key in got
            assert (got[key] == arr).all(), key

    def test_matches_brute_force_webmercator(self, ray_session):
        rng = np.random.RandomState(1)
        df, grids = _tiles(rng)
        # destination grid sized to land on the transformed footprint
        from gridfia_ray.geo.crs import transform_bbox

        ext = SRC.tile * SRC.px * 3
        bbox = transform_bbox(
            (SRC.origin_x, SRC.origin_y - ext, SRC.origin_x + ext, SRC.origin_y),
            "ESRI:102039", "EPSG:3857",
        )
        dst = GridSpec(origin_x=bbox[0], origin_y=bbox[3], px=40.0, tile=16)
        out = warp_tiles(
            rd.from_pandas(df).repartition(4), SRC, "ESRI:102039", dst, "EPSG:3857",
            n_buckets=8,
        ).to_pandas()
        got = _unpack(out)
        assert got  # something materialized
        # stitched source grid for the oracle
        G = np.full((SRC.tile * 3, SRC.tile * 3), np.nan)
        for (tr, tc), arr in grids.items():
            G[tr * SRC.tile:(tr + 1) * SRC.tile, tc * SRC.tile:(tc + 1) * SRC.tile] = arr
        n_checked = n_valid = 0
        for (tr, tc), warped in got.items():
            xs = dst.origin_x + (tc * dst.tile + np.arange(dst.tile) + 0.5) * dst.px
            ys = dst.origin_y - (tr * dst.tile + np.arange(dst.tile) + 0.5) * dst.px
            gx = np.broadcast_to(xs[None, :], (dst.tile, dst.tile)).ravel()
            gy = np.broadcast_to(ys[:, None], (dst.tile, dst.tile)).ravel()
            sx, sy = transform_points(gx, gy, "EPSG:3857", "ESRI:102039")
            px_x = np.floor((sx - SRC.origin_x) / SRC.px).astype(np.int64)
            px_y = np.floor((SRC.origin_y - sy) / SRC.px).astype(np.int64)
            want = np.full(px_x.size, np.nan)
            ok = (px_x >= 0) & (px_y >= 0) & (px_x < G.shape[1]) & (px_y < G.shape[0])
            want[ok] = G[px_y[ok], px_x[ok]]
            w = warped.ravel()
            same = (w == want) | (np.isnan(w) & np.isnan(want))
            assert same.all(), (tr, tc)
            n_checked += w.size
            n_valid += int(np.isfinite(w).sum())
        assert n_valid > 0.3 * n_checked  # warp actually carried data

    def test_partition_invariant(self, ray_session):
        rng = np.random.RandomState(2)
        df, _ = _tiles(rng, grid=2)
        dst = GridSpec(origin_x=SRC.origin_x - 100, origin_y=SRC.origin_y + 100,
                       px=25.0, tile=16)
        a = warp_tiles(rd.from_pandas(df).repartition(1), SRC, "ESRI:102039",
                       dst, "ESRI:102039", n_buckets=2).to_pandas()
        b = warp_tiles(rd.from_pandas(df).repartition(5), SRC, "ESRI:102039",
                       dst, "ESRI:102039", n_buckets=16).to_pandas()
        ka, kb = _unpack(a), _unpack(b)
        assert set(ka) == set(kb)
        for k in ka:
            same = (ka[k] == kb[k]) | (np.isnan(ka[k]) & np.isnan(kb[k]))
            assert same.all()

    def test_wrong_tile_size_rejected(self, ray_session):
        df = pd.DataFrame([{
            "metric": "m", "tile_row": 0, "tile_col": 0, "h": 8, "w": 8,
            "pix": np.zeros((8, 8)).tobytes(), "dtype": "float64"}])
        with pytest.raises(Exception, match="expected"):
            warp_tiles(rd.from_pandas(df), SRC, "ESRI:102039", SRC,
                       "ESRI:102039").to_pandas()


class TestWarpBilinear:
    def test_identity_grid_is_exact_copy(self, ray_session):
        """Aligned grids: all blend weights are exactly 0, so bilinear
        reproduces the source bit-for-bit (like nearest)."""
        rng = np.random.RandomState(7)
        df, grids = _tiles(rng)
        out = warp_tiles(
            rd.from_pandas(df).repartition(3), SRC, "ESRI:102039", SRC,
            "ESRI:102039", n_buckets=4, resampling="bilinear",
        ).to_pandas()
        got = _unpack(out)
        for key, arr in grids.items():
            assert (got[key] == arr).all(), key

    def test_matches_brute_force_blend(self, ray_session):
        """Distributed bilinear == single-process replay via the SAME
        bilinear_blend leaf over the stitched grid, incl. the nearest
        fallback ring where the 2x2 neighborhood leaves the extent."""
        from gridfia_ray.geo.crs import transform_bbox
        from gridfia_ray.pipelines.warp import bilinear_blend

        rng = np.random.RandomState(8)
        df, grids = _tiles(rng)
        ext = SRC.tile * SRC.px * 3
        bbox = transform_bbox(
            (SRC.origin_x, SRC.origin_y - ext, SRC.origin_x + ext, SRC.origin_y),
            "ESRI:102039", "EPSG:3857",
        )
        dst = GridSpec(origin_x=bbox[0], origin_y=bbox[3], px=40.0, tile=16)
        out = warp_tiles(
            rd.from_pandas(df).repartition(4), SRC, "ESRI:102039", dst,
            "EPSG:3857", n_buckets=8, resampling="bilinear",
        ).to_pandas()
        got = _unpack(out)
        assert got
        G = np.full((SRC.tile * 3, SRC.tile * 3), np.nan)
        for (tr, tc), arr in grids.items():
            G[tr * SRC.tile:(tr + 1) * SRC.tile, tc * SRC.tile:(tc + 1) * SRC.tile] = arr

        def sample(px_x, px_y):
            v = np.full(px_x.size, np.nan)
            ok = (px_x >= 0) & (px_y >= 0) & (px_x < G.shape[1]) & (px_y < G.shape[0])
            v[ok] = G[px_y[ok], px_x[ok]]
            return v

        n_blend = 0
        for (tr, tc), warped in got.items():
            xs = dst.origin_x + (tc * dst.tile + np.arange(dst.tile) + 0.5) * dst.px
            ys = dst.origin_y - (tr * dst.tile + np.arange(dst.tile) + 0.5) * dst.px
            gx = np.broadcast_to(xs[None, :], (dst.tile, dst.tile)).ravel()
            gy = np.broadcast_to(ys[:, None], (dst.tile, dst.tile)).ravel()
            sx, sy = transform_points(gx, gy, "EPSG:3857", "ESRI:102039")
            nx = np.floor((sx - SRC.origin_x) / SRC.px).astype(np.int64)
            ny = np.floor((SRC.origin_y - sy) / SRC.px).astype(np.int64)
            want = sample(nx, ny)  # nearest fallback baseline
            fx = (sx - SRC.origin_x) / SRC.px - 0.5
            fy = (SRC.origin_y - sy) / SRC.px - 0.5
            x0 = np.floor(fx).astype(np.int64)
            y0 = np.floor(fy).astype(np.int64)
            v00, v10 = sample(x0, y0), sample(x0 + 1, y0)
            v01, v11 = sample(x0, y0 + 1), sample(x0 + 1, y0 + 1)
            full = (
                np.isfinite(v00) & np.isfinite(v10)
                & np.isfinite(v01) & np.isfinite(v11)
            )
            blend = bilinear_blend(v00, v10, v01, v11, fx - x0, fy - y0)
            want = np.where(full, blend, want)
            w = warped.ravel()
            same = (w == want) | (np.isnan(w) & np.isnan(want))
            assert same.all(), (tr, tc, int((~same).sum()))
            n_blend += int(full.sum())
        assert n_blend > 0  # the blended interior actually exercised

    def test_bad_resampling_rejected(self, ray_session):
        df, _ = _tiles(np.random.RandomState(0), grid=1)
        with pytest.raises(ValueError, match="resampling"):
            warp_tiles(rd.from_pandas(df), SRC, "ESRI:102039", SRC,
                       "ESRI:102039", resampling="cubic")
