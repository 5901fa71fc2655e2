"""Moran's I / Geary's C via the cell-ring neighbor join vs naive numpy oracles."""

import numpy as np
import pytest

from gridfia_ray import fixtures
from gridfia_ray.pipelines.common import GridSpec
from gridfia_ray.pipelines.moran import geary_c, morans_i


def naive_morans_i(vals: np.ndarray) -> tuple[float, int]:
    g = vals.shape[0]
    m = vals.mean()
    dev = vals - m
    cross = 0.0
    w = 0
    for r in range(g):
        for c in range(g):
            for dr in (-1, 0, 1):
                for dc in (-1, 0, 1):
                    if dr == dc == 0:
                        continue
                    nr, nc = r + dr, c + dc
                    if 0 <= nr < g and 0 <= nc < g:
                        cross += dev[r, c] * dev[nr, nc]
                        w += 1
    return float(vals.size / w * cross / (dev**2).sum()), w


class TestMoran:
    def test_matches_naive(self, ray_session, t1_dir, t1_meta):
        spec = GridSpec.from_fixture_meta(t1_meta)
        r = morans_i(f"{t1_dir}/tiles", spec)
        cube, _ = fixtures.build_cube(fixtures.SCALES["t1"])
        t, g = t1_meta["tile"], t1_meta["grid"]
        vals = (
            cube[0]
            .astype(np.float64)
            .reshape(g, t, g, t)
            .mean(axis=(1, 3))
        )
        expect, w = naive_morans_i(vals)
        assert r["w_pairs"] == w
        assert r["n_tiles"] == g * g
        assert r["morans_i"] == pytest.approx(expect, abs=1e-9)
        assert -1.1 < r["morans_i"] < 1.1


def naive_geary_c(vals: np.ndarray) -> tuple[float, int]:
    g = vals.shape[0]
    m = vals.mean()
    num = 0.0
    w = 0
    for r in range(g):
        for c in range(g):
            for dr in (-1, 0, 1):
                for dc in (-1, 0, 1):
                    if dr == dc == 0:
                        continue
                    nr, nc = r + dr, c + dc
                    if 0 <= nr < g and 0 <= nc < g:
                        num += (vals[r, c] - vals[nr, nc]) ** 2
                        w += 1
    den = ((vals - m) ** 2).sum()
    return float((vals.size - 1) / (2.0 * w) * num / den), w


class TestGeary:
    def test_matches_naive(self, ray_session, t1_dir, t1_meta):
        spec = GridSpec.from_fixture_meta(t1_meta)
        r = geary_c(f"{t1_dir}/tiles", spec)
        cube, _ = fixtures.build_cube(fixtures.SCALES["t1"])
        t, g = t1_meta["tile"], t1_meta["grid"]
        vals = (
            cube[0]
            .astype(np.float64)
            .reshape(g, t, g, t)
            .mean(axis=(1, 3))
        )
        expect, w = naive_geary_c(vals)
        assert r["w_pairs"] == w
        assert r["n_tiles"] == g * g
        assert r["geary_c"] == pytest.approx(expect, abs=1e-9)
        assert 0.0 <= r["geary_c"] < 2.5
