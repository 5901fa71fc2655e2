"""Depression filling: priority-flood brute-force equality, bowl/flat
semantics, coarsening invariance, checkpoint resume."""

import heapq

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from gridfia_ray.pipelines.fill import fill_sinks_tiles


def _tiles(g, h, w, metric="m"):
    ty, tx = g.shape[0] // h, g.shape[1] // w
    rows = []
    for tr in range(ty):
        for tc in range(tx):
            rows.append(
                {"metric": metric, "tile_row": tr, "tile_col": tc,
                 "h": h, "w": w,
                 "pix": np.ascontiguousarray(
                     g[tr * h:(tr + 1) * h, tc * w:(tc + 1) * w]
                 ).tobytes(),
                 "dtype": "float64"}
            )
    return pd.DataFrame(rows)


def priority_flood(g, eps=0):
    """Independent sequential Priority-Flood(-ε) on the µ-scaled grid."""
    E = np.floor(g * 1_000_000 + 0.5).astype(np.int64)
    n1, n2 = E.shape
    INF = 1 << 60
    W = np.full(E.shape, INF, np.int64)
    vis = np.zeros(E.shape, bool)
    heap = []
    for y in range(n1):
        for x in (0, n2 - 1):
            W[y, x] = E[y, x]
            heap.append((int(E[y, x]), y, x))
    for x in range(1, n2 - 1):
        for y in (0, n1 - 1):
            W[y, x] = E[y, x]
            heap.append((int(E[y, x]), y, x))
    heapq.heapify(heap)
    while heap:
        wl, y, x = heapq.heappop(heap)
        if vis[y, x]:
            continue
        vis[y, x] = True
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                ny, nx = y + dy, x + dx
                if (dy or dx) and 0 <= ny < n1 and 0 <= nx < n2 \
                        and not vis[ny, nx]:
                    c = max(int(E[ny, nx]), wl + eps)
                    if c < W[ny, nx]:
                        W[ny, nx] = c
                        heapq.heappush(heap, (c, ny, nx))
    return W


def _check(got, W):
    m = got.set_index(["y", "x"])
    for y in range(W.shape[0]):
        for x in range(W.shape[1]):
            assert m["fill_u"][(y, x)] == W[y, x], (y, x)


class TestFillSinks:
    @pytest.mark.parametrize("coarsen", [1, 2])
    def test_matches_priority_flood(self, ray_session, coarsen):
        rng = np.random.RandomState(4)
        g = (rng.rand(48, 32) * 200).astype(np.float64)
        got = fill_sinks_tiles(
            rd.from_pandas(_tiles(g, 12, 8)).repartition(5),
            n_buckets=8, coarsen=coarsen,
        ).to_pandas()
        assert len(got) == g.size
        _check(got, priority_flood(g))

    def test_ragged_coarsen_emits_correct_coords(self, ray_session):
        # 3×3 tile grid with coarsen=2 → edge super-tiles are RAGGED
        # (y0 != tile_row * H); pixel coords must come from the carried
        # y0/x0, not tile_row * h (r4 ADVICE regression)
        rng = np.random.RandomState(11)
        g = (rng.rand(36, 24) * 120).astype(np.float64)
        got = fill_sinks_tiles(
            rd.from_pandas(_tiles(g, 12, 8)).repartition(3),
            n_buckets=4, coarsen=2,
        ).to_pandas()
        assert len(got) == g.size
        assert sorted(map(tuple, got[["y", "x"]].values.tolist())) == [
            (y, x) for y in range(36) for x in range(24)
        ]
        _check(got, priority_flood(g))

    def test_ragged_coarsen_as_result_tiles_raises(self, ray_session):
        rng = np.random.RandomState(12)
        g = (rng.rand(36, 24) * 120).astype(np.float64)
        with pytest.raises(Exception, match="ragged|divide"):
            fill_sinks_tiles(
                rd.from_pandas(_tiles(g, 12, 8)),
                n_buckets=4, coarsen=2, as_result_tiles=True,
            ).to_pandas()

    def test_flat_raster_unchanged(self, ray_session):
        g = np.full((16, 16), 3.5)
        got = fill_sinks_tiles(
            rd.from_pandas(_tiles(g, 8, 8)), coarsen=1
        ).to_pandas()
        assert (got["depth_u"] == 0).all()
        assert (got["fill_u"] == 3_500_000).all()

    def test_bowl_fills_to_rim(self, ray_session):
        g = np.full((16, 16), 10.0)
        g[6:10, 6:10] = 1.0  # interior pit, rim at 10
        got = fill_sinks_tiles(
            rd.from_pandas(_tiles(g, 8, 8)), coarsen=1
        ).to_pandas()
        m = got.set_index(["y", "x"])
        assert m["fill_u"][(7, 7)] == 10_000_000
        assert m["depth_u"][(7, 7)] == 9_000_000
        assert m["depth_u"][(0, 0)] == 0

    def test_breached_bowl_drains(self, ray_session):
        g = np.full((16, 16), 10.0)
        g[6:10, 6:10] = 1.0
        g[7, 10:] = 2.0  # outlet channel at 2.0 to the east edge
        got = fill_sinks_tiles(
            rd.from_pandas(_tiles(g, 8, 8)), coarsen=1
        ).to_pandas()
        m = got.set_index(["y", "x"])
        assert m["fill_u"][(7, 7)] == 2_000_000  # drains through the channel

    def test_eps_gradient_matches_priority_flood_eps(self, ray_session):
        rng = np.random.RandomState(6)
        g = (rng.rand(32, 32) * 150).astype(np.float64)
        got = fill_sinks_tiles(
            rd.from_pandas(_tiles(g, 8, 8)), coarsen=2, eps_u=1
        ).to_pandas()
        _check(got, priority_flood(g, eps=1))
        # ε=1 leaves no interior flats: every off-border cell has a
        # strictly lower 8-neighbor on the filled surface
        W = got.pivot(index="y", columns="x", values="fill_u").to_numpy()
        pad = np.full((34, 34), np.iinfo(np.int64).max, np.int64)
        pad[1:-1, 1:-1] = W
        mins = np.min(
            [pad[1 + dy:33 + dy, 1 + dx:33 + dx]
             for dy in (-1, 0, 1) for dx in (-1, 0, 1) if dy or dx],
            axis=0,
        )
        assert (mins[1:-1, 1:-1] < W[1:-1, 1:-1]).all()

    def test_as_result_tiles_roundtrip(self, ray_session):
        rng = np.random.RandomState(7)
        g = (rng.rand(24, 24) * 80).astype(np.float64)
        tiles = fill_sinks_tiles(
            rd.from_pandas(_tiles(g, 8, 8)), coarsen=1, as_result_tiles=True
        ).to_pandas()
        W = priority_flood(g)
        for _, r in tiles.iterrows():
            arr = np.frombuffer(r["pix"], np.float64).reshape(r["h"], r["w"])
            u = np.floor(arr * 1_000_000 + 0.5).astype(np.int64)
            tr, tc = int(r["tile_row"]), int(r["tile_col"])
            h, w = int(r["h"]), int(r["w"])
            assert (u == W[tr * h:(tr + 1) * h, tc * w:(tc + 1) * w]).all()

    def test_checkpoint_resume_returns_converged(self, ray_session, tmp_path):
        rng = np.random.RandomState(9)
        g = (rng.rand(24, 24) * 100).astype(np.float64)
        ck = str(tmp_path / "fillck")
        a = fill_sinks_tiles(
            rd.from_pandas(_tiles(g, 8, 8)), coarsen=1, checkpoint_dir=ck
        ).to_pandas().sort_values(["y", "x"], ignore_index=True)
        # rerun with the recorded state: must return the identical fill
        b = fill_sinks_tiles(
            rd.from_pandas(_tiles(g, 8, 8)), coarsen=1, checkpoint_dir=ck
        ).to_pandas().sort_values(["y", "x"], ignore_index=True)
        assert a.equals(b)
        _check(a.set_index(["y", "x"]).reset_index(), priority_flood(g))

    def test_no_convergence_raises(self, ray_session):
        rng = np.random.RandomState(2)
        g = (rng.rand(32, 32) * 500).astype(np.float64)
        with pytest.raises(RuntimeError, match="no convergence"):
            fill_sinks_tiles(
                rd.from_pandas(_tiles(g, 8, 8)), coarsen=1, max_rounds=1
            ).to_pandas()
