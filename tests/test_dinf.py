"""D-infinity flow: facet geometry on analytic slopes, proportional
splits, distributed-vs-sequential equality, fixed-point properties."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from gridfia_ray.pipelines.flow import (
    D8_OFFSETS,
    DINF_SCALE,
    DINF_W_ONE,
    dinf_accumulate,
    dinf_directions,
    dinf_packed,
)
from tests.test_fill import _tiles


def _pad(g):
    n1, n2 = g.shape
    pad = np.zeros((n1 + 2, n2 + 2), np.int64)
    pad[1:-1, 1:-1] = g
    pres = np.zeros((n1 + 2, n2 + 2), np.int64)
    pres[1:-1, 1:-1] = 1
    return pad, pres


def sequential_dinf(g):
    n1, n2 = g.shape
    pad, pres = _pad(g)
    d1, d2, w1, ang = dinf_directions(pad, pres, n1, n2)
    acc = [DINF_SCALE] * (n1 * n2)
    d1f, d2f, w1f = d1.ravel().tolist(), d2.ravel().tolist(), w1.ravel().tolist()
    for lin in np.argsort(-g.ravel(), kind="stable").tolist():
        a = acc[lin]
        y, x = divmod(lin, n2)
        for code, wgt in ((d1f[lin], w1f[lin]), (d2f[lin], DINF_W_ONE - w1f[lin])):
            if code < 0 or wgt <= 0:
                continue
            push = (wgt * a) >> 16
            if push <= 0:
                continue
            dy, dx = D8_OFFSETS[code]
            acc[(y + dy) * n2 + (x + dx)] += push
    return ang, np.asarray(acc, np.int64).reshape(n1, n2)


class TestDinfDirections:
    def test_planar_east_slope_pure_cardinal(self):
        yy, xx = np.mgrid[0:10, 0:10]
        g = ((9 - xx) * 1_000_000).astype(np.int64)  # falls due east
        d1, d2, w1, ang = dinf_directions(*_pad(g), 10, 10)
        inner = np.s_[1:-1, 1:-1]
        assert (d1[inner] == 0).all()       # E
        assert (d2[inner] == -1).all()      # no diagonal share
        assert (w1[inner] == DINF_W_ONE).all()
        assert (ang[inner] == 0).all()

    def test_diagonal_slope_pure_diagonal(self):
        yy, xx = np.mgrid[0:10, 0:10]
        g = ((20 - xx - yy) * 1_000_000).astype(np.int64)  # falls to SE
        d1, d2, w1, ang = dinf_directions(*_pad(g), 10, 10)
        inner = np.s_[1:-1, 1:-1]
        assert (w1[inner] == 0).all()
        assert (d2[inner] == 1).all()       # SE
        want = int(np.floor((2 * np.pi - np.pi / 4) * 1_000_000 + 0.5))
        assert (ang[inner] == want).all()

    def test_intermediate_angle_splits_proportionally(self):
        yy, xx = np.mgrid[0:12, 0:12]
        g = ((60 - 2 * xx - yy) * 1_000_000).astype(np.int64)
        d1, d2, w1, ang = dinf_directions(*_pad(g), 12, 12)
        inner = np.s_[1:-1, 1:-1]
        r = np.arctan2(1.0, 2.0)  # facet-internal angle
        wc = int(np.floor((1.0 - r / (np.pi / 4)) * DINF_W_ONE + 0.5))
        assert (d1[inner] == 0).all()       # E cardinal
        assert (d2[inner] == 1).all()       # SE diagonal
        assert (w1[inner] == wc).all()
        assert 0 < wc < DINF_W_ONE

    def test_pit_has_no_direction(self):
        g = np.full((5, 5), 7_000_000, np.int64)
        g[2, 2] = 0
        d1, d2, w1, ang = dinf_directions(*_pad(g), 5, 5)
        assert d1[2, 2] == -1 and ang[2, 2] == -1


class TestDinfAccumulate:
    def test_matches_sequential(self, ray_session):
        rng = np.random.RandomState(17)
        g = (rng.rand(32, 32) * 150).astype(np.float64)
        got = (
            dinf_accumulate(
                dinf_packed(
                    rd.from_pandas(_tiles(g, 8, 8)).repartition(5),
                    n_buckets=4,
                )
            )
            .to_pandas()
            .sort_values(["y", "x"], ignore_index=True)
        )
        gu = np.floor(g * 1_000_000 + 0.5).astype(np.int64)
        ang, acc = sequential_dinf(gu)
        assert (got["angle_u"].to_numpy() == ang.ravel()).all()
        assert (got["acc_fp"].to_numpy() == acc.ravel()).all()

    def test_partition_invariance(self, ray_session):
        rng = np.random.RandomState(23)
        g = (rng.rand(16, 24) * 90).astype(np.float64)
        a = (
            dinf_accumulate(dinf_packed(rd.from_pandas(_tiles(g, 8, 8))))
            .to_pandas().sort_values(["y", "x"], ignore_index=True)
        )
        b = (
            dinf_accumulate(
                dinf_packed(rd.from_pandas(_tiles(g, 8, 8)).repartition(6),
                            n_buckets=3)
            ).to_pandas().sort_values(["y", "x"], ignore_index=True)
        )
        assert a.equals(b)

    def test_every_cell_carries_itself(self, ray_session):
        rng = np.random.RandomState(4)
        g = (rng.rand(16, 16) * 50).astype(np.float64)
        got = dinf_accumulate(
            dinf_packed(rd.from_pandas(_tiles(g, 8, 8)))
        ).to_pandas()
        assert (got["acc_fp"] >= DINF_SCALE).all()

    def test_planar_slope_column_growth(self, ray_session):
        # due-east planar slope: row acc grows ~linearly along x
        yy, xx = np.mgrid[0:16, 0:16]
        g = ((16 - xx) * 2.0).astype(np.float64)
        got = dinf_accumulate(
            dinf_packed(rd.from_pandas(_tiles(g, 8, 8)))
        ).to_pandas()
        m = got.set_index(["y", "x"])["acc_fp"]
        assert m[(5, 0)] == DINF_SCALE
        assert m[(5, 10)] == 11 * DINF_SCALE  # whole row upstream
