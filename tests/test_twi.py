"""Topographic wetness index composition: distributed fill→route→drop→
TWI vs an independent sequential replay on a small multi-tile raster."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from gridfia_ray.oracle_pins import TWI_TANB_FLOOR, twi_values
from gridfia_ray.pipelines.flow import D8_OFFSETS
from tests.test_fill import _tiles, priority_flood


def sequential_twi(g):
    W = priority_flood(g, eps=1)
    n1, n2 = W.shape
    pad = np.zeros((n1 + 2, n2 + 2), np.int64)
    pad[1:-1, 1:-1] = W
    pres = np.zeros((n1 + 2, n2 + 2), np.int64)
    pres[1:-1, 1:-1] = 1
    best = np.zeros(W.shape, np.int64)
    d8 = np.full(W.shape, -1, np.int64)
    for code, (dy, dx) in enumerate(D8_OFFSETS):
        nz = pad[1 + dy:1 + dy + n1, 1 + dx:1 + dx + n2]
        np_ = pres[1 + dy:1 + dy + n1, 1 + dx:1 + dx + n2]
        drop = W - nz
        better = (np_ == 1) & (drop > 0) & (drop > best)
        best[better] = drop[better]
        d8[better] = code
    acc = [0] * (n1 * n2)
    d8f = d8.ravel().tolist()
    for lin in np.argsort(-W.ravel(), kind="stable").tolist():
        code = d8f[lin]
        if code < 0:
            continue
        dy, dx = D8_OFFSETS[code]
        y, x = divmod(lin, n2)
        acc[(y + dy) * n2 + (x + dx)] += acc[lin] + 1
    dropg = np.zeros(W.shape, np.int64)
    diagg = np.zeros(W.shape, np.int64)
    for code, (dy, dx) in enumerate(D8_OFFSETS):
        m = d8 == code
        nz = pad[1 + dy:1 + dy + n1, 1 + dx:1 + dx + n2]
        dropg[m] = W[m] - nz[m]
        diagg[m] = code % 2
    twi = twi_values(
        np.asarray(acc, np.int64), dropg.ravel(), diagg.ravel()
    )
    return np.floor(twi * 1_000_000 + 0.5).astype(np.int64).reshape(W.shape)


class TestTwi:
    def test_public_api_matches_sequential(self, ray_session):
        from gridfia_ray.pipelines.flow import wetness_index_tiles

        rng = np.random.RandomState(12)
        g = (rng.rand(32, 32) * 120).astype(np.float64)
        got = wetness_index_tiles(
            rd.from_pandas(_tiles(g, 8, 8)), n_buckets=4, fill_coarsen=2
        ).to_pandas()
        assert list(got.columns) == ["y", "x", "twi_u", "spi_u"]
        want = sequential_twi(g)
        m = got.set_index(["y", "x"])["twi_u"]
        for y in range(32):
            for x in range(32):
                assert m[(y, x)] == want[y, x], (y, x)
        # SPI: 0 exactly at pits (zero drop), positive elsewhere
        s = got.set_index(["y", "x"])["spi_u"]
        assert (s >= 0).all()

    def test_formula_properties(self):
        # pits (drop 0) use the tanβ floor; steeper ⇒ drier; more
        # accumulation ⇒ wetter
        flat = twi_values(np.array([0]), np.array([0]), np.array([0]))[0]
        assert flat == pytest.approx(np.log(1.0 / TWI_TANB_FLOOR))
        steep = twi_values(np.array([10]), np.array([500_000]), np.array([0]))[0]
        gentle = twi_values(np.array([10]), np.array([5_000]), np.array([0]))[0]
        assert steep < gentle
        wet = twi_values(np.array([100]), np.array([5_000]), np.array([0]))[0]
        assert wet > gentle
        # diagonal distance √2 lowers tanβ vs the same orthogonal drop
        orth = twi_values(np.array([5]), np.array([100_000]), np.array([0]))[0]
        diag = twi_values(np.array([5]), np.array([100_000]), np.array([1]))[0]
        assert diag > orth
