"""CLAHE: sequential scalar-blend equality, flat-tile behavior, clip
effect, partition invariance."""

import numpy as np
import pytest
import ray.data as rd

from gridfia_ray.pipelines.clahe import clahe_result, tile_lut
from tests.test_fill import _tiles


def sequential_clahe(g, T, bins=32, levels=256, clip=(2, 1)):
    E = np.floor(g * 1_000_000 + 0.5).astype(np.int64)
    n1, n2 = E.shape
    nty, ntx = n1 // T, n2 // T
    lo, hi = int(E.min()), int(E.max())
    width = hi - lo + 1
    luts = {
        (tr, tc): tile_lut(
            E[tr * T:(tr + 1) * T, tc * T:(tc + 1) * T],
            lo, width, bins, clip[0], clip[1], levels,
        )
        for tr in range(nty)
        for tc in range(ntx)
    }
    out = np.zeros(E.shape, np.int64)
    for y in range(n1):
        t0r, py = divmod(y - T // 2, T)
        for x in range(n2):
            t0c, px = divmod(x - T // 2, T)
            b = ((int(E[y, x]) - lo) * bins) // width
            s = 0
            for oy, wy in ((t0r, T - py), (t0r + 1, py)):
                ty = min(max(oy, 0), nty - 1)
                for ox, wx in ((t0c, T - px), (t0c + 1, px)):
                    tx = min(max(ox, 0), ntx - 1)
                    s += wy * wx * int(luts[(ty, tx)][b])
            out[y, x] = s // (T * T)
    return out


class TestClahe:
    def test_matches_sequential(self, ray_session):
        rng = np.random.RandomState(21)
        g = (rng.rand(32, 32) * 80).astype(np.float64)
        got = clahe_result(
            rd.from_pandas(_tiles(g, 8, 8)).repartition(5),
            bins=32, n_buckets=4,
        ).to_pandas()
        want = sequential_clahe(g, 8, bins=32)
        m = got.set_index(["y", "x"])["level"]
        for y in range(32):
            for x in range(32):
                assert m[(y, x)] == want[y, x], (y, x)

    def test_flat_raster_maps_to_zero(self, ray_session):
        g = np.full((16, 16), 5.0)
        got = clahe_result(rd.from_pandas(_tiles(g, 8, 8)), bins=16).to_pandas()
        assert (got["level"] == 0).all()

    def test_clip_limits_contrast_stretch(self):
        # one dominant bin: unclipped equalization would jump the CDF;
        # clipping redistributes and flattens the transfer
        u = np.zeros((8, 8), np.int64)
        u[0, 0] = 63  # 63 px in bin 0, 1 px in the top bin
        unclipped = tile_lut(u, 0, 64, 16, 1000, 1, 256)
        clipped = tile_lut(u, 0, 64, 16, 2, 1, 256)
        # unclipped: the dominant bin swallows the whole CDF — every
        # intermediate level collapses to 0 and the top bin jumps to
        # 255. Clipping redistributes the excess into a near-linear
        # ramp through the empty mid-range.
        assert (unclipped[1:-1] == 0).all()
        assert (clipped[1:-1] > 0).all()
        assert (np.diff(clipped) > 0).all()
        assert clipped[-1] == unclipped[-1] == 255

    def test_partition_invariance(self, ray_session):
        rng = np.random.RandomState(2)
        g = (rng.rand(24, 16) * 40).astype(np.float64)
        a = clahe_result(
            rd.from_pandas(_tiles(g, 8, 8)), bins=32
        ).to_pandas().sort_values(["y", "x"], ignore_index=True)
        b = clahe_result(
            rd.from_pandas(_tiles(g, 8, 8)).repartition(6), bins=32,
            n_buckets=3,
        ).to_pandas().sort_values(["y", "x"], ignore_index=True)
        assert a.equals(b)

    def test_levels_in_range(self, ray_session):
        rng = np.random.RandomState(8)
        g = (rng.rand(16, 16) * 200).astype(np.float64)
        got = clahe_result(rd.from_pandas(_tiles(g, 8, 8)), bins=32,
                           out_levels=64).to_pandas()
        assert got["level"].between(0, 63).all()
