"""Upstream flow length: sequential equality, analytic slopes,
partition invariance."""

import numpy as np
import pytest
import ray.data as rd

from gridfia_ray.pipelines.flow import (
    D8_OFFSETS,
    FLOWLEN_DIAG,
    FLOWLEN_ORTH,
    flow_direction_packed,
    flow_length_upstream,
)
from tests.test_fill import _tiles


def sequential_flowlen(g):
    gu = np.floor(g * 1_000_000 + 0.5).astype(np.int64)
    n1, n2 = gu.shape
    pad = np.zeros((n1 + 2, n2 + 2), np.int64)
    pad[1:-1, 1:-1] = gu
    pres = np.zeros((n1 + 2, n2 + 2), np.int64)
    pres[1:-1, 1:-1] = 1
    best = np.zeros(gu.shape, np.int64)
    d8 = np.full(gu.shape, -1, np.int64)
    for code, (dy, dx) in enumerate(D8_OFFSETS):
        nz = pad[1 + dy:1 + dy + n1, 1 + dx:1 + dx + n2]
        np_ = pres[1 + dy:1 + dy + n1, 1 + dx:1 + dx + n2]
        drop = gu - nz
        better = (np_ == 1) & (drop > 0) & (drop > best)
        best[better] = drop[better]
        d8[better] = code
    ln = [0] * (n1 * n2)
    d8f = d8.ravel().tolist()
    for lin in np.argsort(-gu.ravel(), kind="stable").tolist():
        code = d8f[lin]
        if code < 0:
            continue
        step = FLOWLEN_DIAG if code % 2 == 1 else FLOWLEN_ORTH
        dy, dx = D8_OFFSETS[code]
        y, x = divmod(lin, n2)
        c = (y + dy) * n2 + (x + dx)
        cand = ln[lin] + step
        if cand > ln[c]:
            ln[c] = cand
    return np.asarray(ln, np.int64).reshape(gu.shape)


class TestFlowLength:
    def test_matches_sequential(self, ray_session):
        rng = np.random.RandomState(19)
        g = (rng.rand(32, 24) * 130).astype(np.float64)
        got = (
            flow_length_upstream(
                flow_direction_packed(
                    rd.from_pandas(_tiles(g, 8, 8)).repartition(4),
                    n_buckets=4,
                )
            )
            .to_pandas().sort_values(["y", "x"], ignore_index=True)
        )
        want = sequential_flowlen(g)
        assert (got["flen_u"].to_numpy() == want.ravel()).all()

    def test_planar_east_slope(self, ray_session):
        yy, xx = np.mgrid[0:16, 0:16]
        g = ((16 - xx) * 2.0).astype(np.float64)
        got = flow_length_upstream(
            flow_direction_packed(rd.from_pandas(_tiles(g, 8, 8)))
        ).to_pandas()
        m = got.set_index(["y", "x"])["flen_u"]
        assert m[(3, 0)] == 0  # ridge: nothing upstream
        assert m[(3, 10)] == 10 * FLOWLEN_ORTH
        assert m[(3, 15)] == 15 * FLOWLEN_ORTH

    def test_diagonal_steps_use_sqrt2(self, ray_session):
        yy, xx = np.mgrid[0:16, 0:16]
        g = ((40.0 - xx - yy)).astype(np.float64)  # falls to SE
        got = flow_length_upstream(
            flow_direction_packed(rd.from_pandas(_tiles(g, 8, 8)))
        ).to_pandas()
        m = got.set_index(["y", "x"])["flen_u"]
        assert m[(5, 5)] == 5 * FLOWLEN_DIAG
        assert m[(0, 0)] == 0

    def test_partition_invariance(self, ray_session):
        rng = np.random.RandomState(3)
        g = (rng.rand(16, 16) * 70).astype(np.float64)
        a = flow_length_upstream(
            flow_direction_packed(rd.from_pandas(_tiles(g, 8, 8)))
        ).to_pandas().sort_values(["y", "x"], ignore_index=True)
        b = flow_length_upstream(
            flow_direction_packed(
                rd.from_pandas(_tiles(g, 8, 8)).repartition(7), n_buckets=2
            )
        ).to_pandas().sort_values(["y", "x"], ignore_index=True)
        assert a.equals(b)
