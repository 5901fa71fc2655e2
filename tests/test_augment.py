"""Geometric augmentation + patch extraction: brute-force equivalence
on stitched grids, composition laws, validation."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from gridfia_ray.stages.augment import augment_result_tiles, patchify_result_tiles
from tests.test_flow import _tiles_from_grid


def _stitch(ds, gr, gc, th, tw):
    full = np.full((gr * th, gc * tw), np.nan)
    for _, r in ds.to_pandas().iterrows():
        arr = np.frombuffer(r["pix"], np.dtype(r["dtype"])).reshape(r["h"], r["w"])
        full[
            r.tile_row * th : (r.tile_row + 1) * th,
            r.tile_col * tw : (r.tile_col + 1) * tw,
        ] = arr
    assert not np.isnan(full).any()
    return full


GLOBAL = {
    "rot90cw": lambda g: np.rot90(g, k=-1),
    "rot90ccw": lambda g: np.rot90(g, k=1),
    "rot180": lambda g: g[::-1, ::-1],
    "fliplr": lambda g: g[:, ::-1],
    "flipud": lambda g: g[::-1, :],
    "transpose": lambda g: g.T,
}


class TestAugment:
    @pytest.mark.parametrize("op", sorted(GLOBAL))
    def test_matches_global_transform(self, ray_session, op):
        rng = np.random.RandomState(11)
        g = rng.rand(12, 12) * 40
        ds = rd.from_pandas(_tiles_from_grid(g, 4, 4)).repartition(3)
        out = augment_result_tiles(ds, op, 3, 3)
        got = _stitch(out, 3, 3, 4, 4)
        np.testing.assert_array_equal(got, GLOBAL[op](g))

    def test_rot90cw_four_times_is_identity(self, ray_session):
        rng = np.random.RandomState(2)
        g = rng.rand(8, 8)
        ds = rd.from_pandas(_tiles_from_grid(g, 4, 4))
        for _ in range(4):
            ds = augment_result_tiles(ds, "rot90cw", 2, 2)
        np.testing.assert_array_equal(_stitch(ds, 2, 2, 4, 4), g)

    def test_rectangular_rotation_rejected(self, ray_session):
        g = np.zeros((4, 8))
        ds = rd.from_pandas(_tiles_from_grid(g, 2, 4))
        with pytest.raises(Exception, match="square tiles"):
            augment_result_tiles(ds, "rot90cw", 2, 2).materialize()

    def test_unknown_op(self):
        with pytest.raises(ValueError, match="unknown augmentation"):
            augment_result_tiles(None, "zoom", 1, 1)


class TestPatchify:
    def test_matches_brute_blocks(self, ray_session):
        rng = np.random.RandomState(9)
        g = rng.rand(16, 16) * 90
        ds = rd.from_pandas(_tiles_from_grid(g, 8, 8)).repartition(2)
        out = patchify_result_tiles(ds, 4).to_pandas()
        u = np.floor(g * 1_000_000 + 0.5).astype(np.int64)
        assert len(out) == 16
        for _, r in out.iterrows():
            blk = u[
                r.patch_row * 4 : (r.patch_row + 1) * 4,
                r.patch_col * 4 : (r.patch_col + 1) * 4,
            ]
            assert r["n_px"] == 16
            assert r["sum_u"] == blk.sum()
            assert r["min_u"] == blk.min()
            assert r["max_u"] == blk.max()

    def test_partition_invariance(self, ray_session):
        rng = np.random.RandomState(4)
        g = rng.rand(16, 16) * 5
        a = (
            patchify_result_tiles(
                rd.from_pandas(_tiles_from_grid(g, 4, 4)).repartition(7), 2
            )
            .to_pandas()
            .sort_values(["patch_row", "patch_col"])
            .reset_index(drop=True)
        )
        b = (
            patchify_result_tiles(
                rd.from_pandas(_tiles_from_grid(g, 8, 8)).repartition(2), 2
            )
            .to_pandas()
            .sort_values(["patch_row", "patch_col"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)

    def test_indivisible_patch_rejected(self, ray_session):
        g = np.zeros((8, 8))
        ds = rd.from_pandas(_tiles_from_grid(g, 4, 4))
        with pytest.raises(Exception, match="does not divide"):
            patchify_result_tiles(ds, 3).materialize()
