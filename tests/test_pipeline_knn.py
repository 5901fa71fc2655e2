"""Exact-kNN interpolation vs brute force (and vs a crowded plot set)."""

import os

import numpy as np
import pytest

from gridfia_ray.pipelines import knn as K
from gridfia_ray.pipelines.common import GridSpec


@pytest.fixture(scope="module")
def spec(t1_meta):
    return GridSpec.from_fixture_meta(t1_meta)


def brute_idw(plots, qx, qy, k=4, power=2.0):
    d2 = (plots["x"] - qx) ** 2 + (plots["y"] - qy) ** 2
    sel = np.argsort(d2)[:k]
    d = np.sqrt(d2[sel])
    if np.any(d == 0):
        return float(plots["value"][sel][d == 0][0])
    w = 1.0 / d**power
    return float(np.sum(w * plots["value"][sel]) / np.sum(w))


class TestKnn:
    def test_matches_brute_force(self, ray_session, t1_tiles, t1_dir, spec):
        plots = K.load_plots(os.path.join(t1_dir, "plots.parquet"))
        got = K.knn_interpolate(t1_tiles, plots, spec).to_pandas()
        assert len(got) == 16  # one row per tile position
        for _, r in got.iterrows():
            assert r.knn_value == pytest.approx(brute_idw(plots, r.cx, r.cy), abs=1e-9)
            assert r.k_used == 4

    def test_dense_plots_ring_expansion(self, ray_session, t1_tiles, spec):
        """Many plots per cell + far clusters: the ring expansion must
        still return the exact k nearest."""
        rng = np.random.RandomState(3)
        n = 500
        ext = 4 * 64 * 30.0
        plots = {
            "plot_id": np.array([f"Q{i}" for i in range(n)]),
            "x": -2_000_000.0 + rng.rand(n) * ext * 1.5 - 0.2 * ext,
            "y": -900_000.0 - rng.rand(n) * ext * 1.5 + 0.2 * ext,
            "value": rng.rand(n) * 10,
        }
        got = K.knn_interpolate(t1_tiles, plots, spec, k=7).to_pandas()
        for _, r in got.iterrows():
            assert r.knn_value == pytest.approx(brute_idw(plots, r.cx, r.cy, k=7), abs=1e-9)

    def test_fewer_plots_than_k(self, ray_session, t1_tiles, spec):
        plots = {
            "plot_id": np.array(["A", "B"]),
            "x": np.array([-1_999_000.0, -1_995_000.0]),
            "y": np.array([-901_000.0, -905_000.0]),
            "value": np.array([1.0, 3.0]),
        }
        got = K.knn_interpolate(t1_tiles, plots, spec, k=4).to_pandas()
        assert (got.k_used == 2).all()
