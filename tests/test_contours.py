"""Marching-squares contour extraction: brute-force sequential replay
over a stitched multi-tile raster (cases AND interpolated segment
endpoints), saddle convention, tile-border cells, partition invariance."""

import numpy as np
import pandas as pd
import ray.data as rd

from gridfia_ray.pipelines.focal import (
    _MS_SEGMENTS,
    contour_cells_tiles,
    contour_segments_tiles,
)


def _raster(rng, tiles_y=2, tiles_x=3, h=6, w=5):
    rows, grids = [], {}
    for tr in range(tiles_y):
        for tc in range(tiles_x):
            arr = (rng.rand(h, w) * 100).astype(np.float64)
            grids[(tr, tc)] = arr
            rows.append(
                {"metric": "total_biomass", "tile_row": tr, "tile_col": tc,
                 "h": h, "w": w, "pix": arr.tobytes(), "dtype": "float64"}
            )
    g = np.zeros((tiles_y * h, tiles_x * w))
    for (tr, tc), arr in grids.items():
        g[tr * h:(tr + 1) * h, tc * w:(tc + 1) * w] = arr
    return pd.DataFrame(rows), g


def _brute(g, level):
    """Sequential marching squares over the stitched raster — same
    micro-int thresholding and interpolation, independent scan order."""
    u = np.floor(g * 1_000_000 + 0.5).astype(np.int64)
    lvl = int(np.floor(level * 1_000_000 + 0.5))
    H, W = g.shape
    cells, segs = {}, {}
    for y in range(H - 1):
        for x in range(W - 1):
            tl, tr, bl, br = u[y, x], u[y, x + 1], u[y + 1, x], u[y + 1, x + 1]
            case = (
                8 * (tl >= lvl) + 4 * (tr >= lvl) + 2 * (br >= lvl) + 1 * (bl >= lvl)
            )
            if case in (0, 15):
                continue
            cells[(y, x)] = (case, 2 if case in (5, 10) else 1)
            L = float(lvl)
            pts = {
                0: ((L - tl) / (tr - tl), 0.0),
                1: (1.0, (L - tr) / (br - tr)),
                2: ((L - bl) / (br - bl), 1.0),
                3: (0.0, (L - tl) / (bl - tl)),
            }
            out = []
            for e0, e1 in _MS_SEGMENTS[case]:
                out.append(pts[e0] + pts[e1])
            segs[(y, x)] = out
    return cells, segs


class TestContourCells:
    def test_matches_brute_force(self, ray_session):
        rng = np.random.RandomState(3)
        df, g = _raster(rng)
        got = contour_cells_tiles(
            rd.from_pandas(df).repartition(4), 50.0, n_buckets=8
        ).to_pandas()
        cells, _ = _brute(g, 50.0)
        assert len(got) == len(cells)
        for _, r in got.iterrows():
            assert cells[(int(r["y"]), int(r["x"]))] == (
                int(r["ms_case"]), int(r["n_seg"])
            )

    def test_no_cells_at_global_edge(self, ray_session):
        rng = np.random.RandomState(4)
        df, g = _raster(rng, tiles_y=1, tiles_x=1, h=4, w=4)
        got = contour_cells_tiles(rd.from_pandas(df), 50.0).to_pandas()
        assert (got["y"] < 3).all() and (got["x"] < 3).all()

    def test_flat_raster_empty(self, ray_session):
        df, _ = _raster(np.random.RandomState(5), 1, 1, 4, 4)
        flat = np.full((4, 4), 7.0)
        df["pix"] = [flat.tobytes()]
        got = contour_cells_tiles(rd.from_pandas(df), 50.0).to_pandas()
        assert len(got) == 0

    def test_partition_invariant(self, ray_session):
        rng = np.random.RandomState(6)
        df, _ = _raster(rng, tiles_y=3, tiles_x=3, h=4, w=4)
        a = (contour_cells_tiles(rd.from_pandas(df).repartition(2), 40.0, n_buckets=4)
             .to_pandas().sort_values(["y", "x"], ignore_index=True))
        b = (contour_cells_tiles(rd.from_pandas(df).repartition(9), 40.0, n_buckets=16)
             .to_pandas().sort_values(["y", "x"], ignore_index=True))
        pd.testing.assert_frame_equal(a, b)


class TestContourSegments:
    def test_endpoints_match_brute_force(self, ray_session):
        rng = np.random.RandomState(7)
        df, g = _raster(rng)
        got = contour_segments_tiles(
            rd.from_pandas(df).repartition(5), 50.0, n_buckets=8
        ).to_pandas()
        _, segs = _brute(g, 50.0)
        assert len(got) == len(segs)
        for _, r in got.iterrows():
            want = segs[(int(r["y"]), int(r["x"]))]
            got_segs = [tuple(r[c] for c in ("x0", "y0", "x1", "y1"))]
            if len(want) == 2:
                got_segs.append(tuple(r[c] for c in ("x2", "y2", "x3", "y3")))
            else:
                assert np.isnan(r["x2"])
            for gs, ws in zip(got_segs, want):
                np.testing.assert_allclose(gs, ws, rtol=0, atol=0)  # bit-identical

    def test_endpoints_lie_on_level(self, ray_session):
        # every endpoint, linearly interpolated back on its edge, must
        # reproduce the level exactly in the micro domain
        rng = np.random.RandomState(8)
        df, g = _raster(rng, 1, 1, 8, 8)
        level = 50.0
        got = contour_segments_tiles(rd.from_pandas(df), level).to_pandas()
        u = np.floor(g * 1_000_000 + 0.5)
        for _, r in got.iterrows():
            y, x = int(r["y"]), int(r["x"])
            for xc, yc in ((r["x0"], r["y0"]), (r["x1"], r["y1"])):
                # endpoint is on a cell edge: one coord is 0 or 1
                gx, gy = x + xc, y + yc
                x0, x1 = int(np.floor(gx)), int(np.ceil(gx))
                y0, y1 = int(np.floor(gy)), int(np.ceil(gy))
                v0 = u[y0, x0]
                v1 = u[y1, x1] if (x1, y1) != (x0, y0) else v0
                t = (gx - x0) + (gy - y0)  # exactly one is fractional
                interp = v0 + t * (v1 - v0)
                assert abs(interp - 50_000_000.0) < 1e-3

    def test_saddle_emits_two_segments(self, ray_session):
        # checkerboard 2x2: TL,BR high / TR,BL low -> case 10
        arr = np.array([[90.0, 10.0], [10.0, 90.0]])
        df = pd.DataFrame(
            [{"metric": "m", "tile_row": 0, "tile_col": 0, "h": 2, "w": 2,
              "pix": arr.tobytes(), "dtype": "float64"}]
        )
        got = contour_segments_tiles(rd.from_pandas(df), 50.0).to_pandas()
        assert len(got) == 1
        r = got.iloc[0]
        assert int(r["ms_case"]) == 10
        assert not np.isnan(r["x2"])
