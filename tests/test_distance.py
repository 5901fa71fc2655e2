"""L1 (Manhattan) distance transform: brute-force oracle over a
stitched multi-tile raster, no-feature guard, partition invariance,
sparse-store rejection."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from gridfia_ray.pipelines.distance import distance_transform_tiles


def _raster(rng, tiles_y=3, tiles_x=2, h=6, w=6, p_feature=0.06):
    rows = []
    g = np.zeros((tiles_y * h, tiles_x * w))
    for tr in range(tiles_y):
        for tc in range(tiles_x):
            arr = np.where(rng.rand(h, w) < p_feature, 80.0, 1.0) + rng.rand(h, w)
            g[tr * h:(tr + 1) * h, tc * w:(tc + 1) * w] = arr
            rows.append(
                {"metric": "total_biomass", "tile_row": tr, "tile_col": tc,
                 "h": h, "w": w, "pix": arr.tobytes(), "dtype": "float64"}
            )
    return pd.DataFrame(rows), g


def _brute(g, threshold):
    u = np.floor(g * 1e6 + 0.5).astype(np.int64)
    thr_u = int(np.floor(threshold * 1e6 + 0.5))
    fy, fx = np.nonzero(u > thr_u)
    H, W = g.shape
    out = np.zeros((H, W), dtype=np.int64)
    for y in range(H):
        for x in range(W):
            out[y, x] = np.min(np.abs(fy - y) + np.abs(fx - x))
    return out


class TestDistanceTransform:
    def test_matches_brute_force(self, ray_session):
        rng = np.random.RandomState(0)
        df, g = _raster(rng)
        got = (distance_transform_tiles(rd.from_pandas(df).repartition(4),
                                        threshold=50.0, n_buckets=8)
               .to_pandas().set_index(["y", "x"])["dist"])
        want = _brute(g, 50.0)
        assert len(got) == g.size
        for y in range(g.shape[0]):
            for x in range(g.shape[1]):
                assert got.loc[(y, x)] == want[y, x], (y, x)

    def test_feature_pixels_are_zero(self, ray_session):
        rng = np.random.RandomState(1)
        df, g = _raster(rng, tiles_y=2, tiles_x=2, h=4, w=4, p_feature=0.2)
        got = (distance_transform_tiles(rd.from_pandas(df), threshold=50.0)
               .to_pandas())
        u = np.floor(g * 1e6 + 0.5).astype(np.int64)
        feats = got.apply(
            lambda r: u[int(r["y"]), int(r["x"])] > 50_000_000, axis=1
        )
        assert (got.loc[feats, "dist"] == 0).all()
        assert (got.loc[~feats, "dist"] > 0).all()

    def test_partition_invariant(self, ray_session):
        rng = np.random.RandomState(2)
        df, _ = _raster(rng, tiles_y=2, tiles_x=3, h=4, w=4)
        a = (distance_transform_tiles(rd.from_pandas(df).repartition(2),
                                      threshold=50.0, n_buckets=4)
             .to_pandas().sort_values(["y", "x"]).reset_index(drop=True))
        b = (distance_transform_tiles(rd.from_pandas(df).repartition(6),
                                      threshold=50.0, n_buckets=16)
             .to_pandas().sort_values(["y", "x"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b)

    def test_no_features_raises(self, ray_session):
        arr = np.ones((4, 4))
        df = pd.DataFrame([{"metric": "m", "tile_row": 0, "tile_col": 0,
                            "h": 4, "w": 4, "pix": arr.tobytes(),
                            "dtype": "float64"}])
        with pytest.raises(Exception, match="no feature pixel"):
            distance_transform_tiles(rd.from_pandas(df), threshold=50.0).to_pandas()

    def test_sparse_store_rejected(self, ray_session):
        # tile (0,0) and (0,2) present, (0,1) missing -> the horizontal
        # band has a gap the scan must refuse to paper over
        arr = np.full((4, 4), 80.0)
        rows = [
            {"metric": "m", "tile_row": 0, "tile_col": c, "h": 4, "w": 4,
             "pix": arr.tobytes(), "dtype": "float64"} for c in (0, 2)
        ]
        with pytest.raises(Exception, match="non-contiguous"):
            distance_transform_tiles(
                rd.from_pandas(pd.DataFrame(rows)), threshold=50.0
            ).to_pandas()


class TestDistanceTransformL2:
    def _brute2(self, g, threshold):
        u = np.floor(g * 1e6 + 0.5).astype(np.int64)
        thr_u = int(np.floor(threshold * 1e6 + 0.5))
        fy, fx = np.nonzero(u > thr_u)
        H, W = g.shape
        out = np.zeros((H, W), dtype=np.int64)
        for y in range(H):
            for x in range(W):
                out[y, x] = np.min((fy - y) ** 2 + (fx - x) ** 2)
        return out

    def test_matches_brute_force(self, ray_session):
        from gridfia_ray.pipelines.distance import distance_transform_l2_tiles

        rng = np.random.RandomState(2)
        df, g = _raster(rng)
        got = (
            distance_transform_l2_tiles(
                rd.from_pandas(df).repartition(4), threshold=50.0, n_buckets=8
            )
            .to_pandas().set_index(["y", "x"])["dist2"]
        )
        want = self._brute2(g, 50.0)
        assert len(got) == g.size
        for y in range(g.shape[0]):
            for x in range(g.shape[1]):
                assert got.loc[(y, x)] == want[y, x], (y, x)

    def test_small_block_size_identical(self, ray_session):
        # the blocked envelope must be block-size invariant
        from gridfia_ray.pipelines.distance import distance_transform_l2_tiles

        rng = np.random.RandomState(3)
        df, g = _raster(rng)
        a = (distance_transform_l2_tiles(rd.from_pandas(df), 50.0, block=3)
             .to_pandas().sort_values(["y", "x"]).reset_index(drop=True))
        b = (distance_transform_l2_tiles(rd.from_pandas(df), 50.0, block=64)
             .to_pandas().sort_values(["y", "x"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b)

    def test_no_features_raises(self, ray_session):
        from gridfia_ray.pipelines.distance import distance_transform_l2_tiles

        rng = np.random.RandomState(4)
        df, _ = _raster(rng, p_feature=0.0)
        with pytest.raises(Exception, match="no feature"):
            distance_transform_l2_tiles(rd.from_pandas(df), 50.0).to_pandas()


class TestEuclideanAllocation:
    @staticmethod
    def _brute_alloc(g, threshold):
        u = np.floor(g * 1e6 + 0.5).astype(np.int64)
        thr_u = int(np.floor(threshold * 1e6 + 0.5))
        fy, fx = np.nonzero(u > thr_u)
        H, W = g.shape
        out = {}
        for y in range(H):
            for x in range(W):
                d2 = (fy - y) ** 2 + (fx - x) ** 2
                # lexicographic (d2, seed_y, seed_x) — np.lexsort keys
                # are last-key-primary
                k = np.lexsort((fx, fy, d2))[0]
                out[(y, x)] = (int(fy[k]), int(fx[k]), int(d2[k]))
        return out

    def test_matches_brute_force(self, ray_session):
        from gridfia_ray.pipelines.distance import euclidean_allocation_tiles

        rng = np.random.RandomState(5)
        df, g = _raster(rng, tiles_y=2, tiles_x=2, h=5, w=5, p_feature=0.1)
        got = (
            euclidean_allocation_tiles(
                rd.from_pandas(df).repartition(3), threshold=50.0, n_buckets=8
            )
            .to_pandas()
            .set_index(["y", "x"])
        )
        want = self._brute_alloc(g, 50.0)
        assert len(got) == g.size
        for (y, x), (sy, sx, d2) in want.items():
            r = got.loc[(y, x)]
            assert (r["seed_y"], r["seed_x"], r["dist2"]) == (sy, sx, d2), (y, x)

    def test_tie_breaks_lexicographic(self, ray_session):
        from gridfia_ray.pipelines.distance import euclidean_allocation_tiles

        # two seeds equidistant from the center pixel: (0,2) and (4,2)
        # from (2,2) -> both d2=4; the smaller seed_y must win
        arr = np.ones((5, 5))
        arr[0, 2] = arr[4, 2] = 99.0
        df = pd.DataFrame([{ "metric": "m", "tile_row": 0, "tile_col": 0,
                             "h": 5, "w": 5, "pix": arr.tobytes(),
                             "dtype": "float64"}])
        got = (euclidean_allocation_tiles(rd.from_pandas(df), threshold=50.0)
               .to_pandas().set_index(["y", "x"]))
        r = got.loc[(2, 2)]
        assert (r["seed_y"], r["seed_x"], r["dist2"]) == (0, 2, 4)
        # left/right tie inside one row: seeds (2,0) and (2,4) from (2,2)
        arr2 = np.ones((5, 5))
        arr2[2, 0] = arr2[2, 4] = 99.0
        df2 = pd.DataFrame([{ "metric": "m", "tile_row": 0, "tile_col": 0,
                              "h": 5, "w": 5, "pix": arr2.tobytes(),
                              "dtype": "float64"}])
        got2 = (euclidean_allocation_tiles(rd.from_pandas(df2), threshold=50.0)
                .to_pandas().set_index(["y", "x"]))
        r2 = got2.loc[(2, 2)]
        assert (r2["seed_y"], r2["seed_x"], r2["dist2"]) == (2, 0, 4)

    def test_seed_pixels_allocate_to_themselves(self, ray_session):
        from gridfia_ray.pipelines.distance import euclidean_allocation_tiles

        rng = np.random.RandomState(6)
        df, g = _raster(rng, tiles_y=2, tiles_x=2, h=4, w=4, p_feature=0.25)
        got = (euclidean_allocation_tiles(rd.from_pandas(df), threshold=50.0)
               .to_pandas())
        u = np.floor(g * 1e6 + 0.5).astype(np.int64)
        feats = got.apply(lambda r: u[int(r["y"]), int(r["x"])] > 50_000_000, axis=1)
        sub = got.loc[feats]
        assert (sub["dist2"] == 0).all()
        assert (sub["seed_y"] == sub["y"]).all()
        assert (sub["seed_x"] == sub["x"]).all()

    def test_partition_invariant(self, ray_session):
        from gridfia_ray.pipelines.distance import euclidean_allocation_tiles

        rng = np.random.RandomState(7)
        df, _ = _raster(rng, tiles_y=2, tiles_x=3, h=4, w=4)
        a = (euclidean_allocation_tiles(rd.from_pandas(df).repartition(2),
                                        threshold=50.0, n_buckets=4)
             .to_pandas().sort_values(["y", "x"]).reset_index(drop=True))
        b = (euclidean_allocation_tiles(rd.from_pandas(df).repartition(6),
                                        threshold=50.0, n_buckets=16)
             .to_pandas().sort_values(["y", "x"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b)

    def test_no_features_raises(self, ray_session):
        from gridfia_ray.pipelines.distance import euclidean_allocation_tiles

        arr = np.ones((4, 4))
        df = pd.DataFrame([{ "metric": "m", "tile_row": 0, "tile_col": 0,
                             "h": 4, "w": 4, "pix": arr.tobytes(),
                             "dtype": "float64"}])
        with pytest.raises(Exception, match="no feature pixel"):
            euclidean_allocation_tiles(rd.from_pandas(df), threshold=50.0).to_pandas()
