"""Chamfer-3/4 cost distance (pipelines/costdist) vs a brute-force
Dijkstra oracle, plus coarsening equivalence, partition invariance and
the guard rails."""

import heapq

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from gridfia_ray.pipelines.costdist import cost_distance_tiles


def _raster(rng, tiles_y=2, tiles_x=3, h=5, w=5, p_source=0.05):
    rows = []
    g = np.zeros((tiles_y * h, tiles_x * w))
    for tr in range(tiles_y):
        for tc in range(tiles_x):
            arr = np.where(rng.rand(h, w) < p_source, 80.0, 0.0) + 3.0 * rng.rand(h, w)
            g[tr * h:(tr + 1) * h, tc * w:(tc + 1) * w] = arr
            rows.append(
                {"metric": "total_biomass", "tile_row": tr, "tile_col": tc,
                 "h": h, "w": w, "pix": arr.tobytes(), "dtype": "float64"}
            )
    return pd.DataFrame(rows), g


def _brute(g, threshold):
    u = np.floor(g * 1e6 + 0.5).astype(np.int64)
    thr_u = int(np.floor(threshold * 1e6 + 0.5))
    H, W = g.shape
    c = u.ravel().tolist()
    INF = 1 << 62
    dist = [INF] * (H * W)
    heap = [(0, int(lin)) for lin in np.nonzero(u.ravel() > thr_u)[0]]
    for _, lin in heap:
        dist[lin] = 0
    heapq.heapify(heap)
    nbrs = [(-1, -1, 4), (-1, 0, 3), (-1, 1, 4), (0, -1, 3),
            (0, 1, 3), (1, -1, 4), (1, 0, 3), (1, 1, 4)]
    while heap:
        dd, lin = heapq.heappop(heap)
        if dd > dist[lin]:
            continue
        y, x = divmod(lin, W)
        for dy, dx, wgt in nbrs:
            ny, nx = y + dy, x + dx
            if 0 <= ny < H and 0 <= nx < W:
                nl = ny * W + nx
                nd = dd + wgt * (c[lin] + c[nl])
                if nd < dist[nl]:
                    dist[nl] = nd
                    heapq.heappush(heap, (nd, nl))
    return np.asarray(dist, np.int64).reshape(H, W)


def _run(df, threshold=50.0, **kw):
    return (
        cost_distance_tiles(rd.from_pandas(df), threshold, **kw)
        .to_pandas()
        .sort_values(["y", "x"])
        .reset_index(drop=True)
    )


class TestCostDistance:
    def test_matches_dijkstra(self, ray_session):
        rng = np.random.RandomState(11)
        df, g = _raster(rng)
        got = _run(df, n_buckets=8)
        want = _brute(g, 50.0)
        assert len(got) == g.size
        grid = np.full(g.shape, -1, np.int64)
        grid[got["y"], got["x"]] = got["cdist"]
        np.testing.assert_array_equal(grid, want)

    def test_sources_are_zero_and_costs_positive(self, ray_session):
        rng = np.random.RandomState(12)
        df, g = _raster(rng, p_source=0.15)
        got = _run(df)
        u = np.floor(g * 1e6 + 0.5).astype(np.int64)
        src = got.apply(lambda r: u[int(r["y"]), int(r["x"])] > 50_000_000, axis=1)
        assert (got.loc[src, "cdist"] == 0).all()
        assert (got.loc[~src, "cdist"] > 0).all()

    def test_coarsen_equivalent(self, ray_session):
        rng = np.random.RandomState(13)
        df, _ = _raster(rng, tiles_y=4, tiles_x=4, h=4, w=4)
        a = _run(df, coarsen=1, n_buckets=8)
        b = _run(df, coarsen=2, n_buckets=8)
        c = _run(df, coarsen=4, n_buckets=4)
        pd.testing.assert_frame_equal(a, b)
        pd.testing.assert_frame_equal(a, c)

    def test_partition_invariant(self, ray_session):
        rng = np.random.RandomState(14)
        df, _ = _raster(rng, tiles_y=3, tiles_x=2, h=4, w=4)
        a = (cost_distance_tiles(rd.from_pandas(df).repartition(2), 50.0, n_buckets=3)
             .to_pandas().sort_values(["y", "x"]).reset_index(drop=True))
        b = (cost_distance_tiles(rd.from_pandas(df).repartition(6), 50.0, n_buckets=5)
             .to_pandas().sort_values(["y", "x"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b)

    def test_zero_cost_corridor(self, ray_session):
        # a free corridor must carry distance 0 along it from the source
        arr = np.full((4, 8), 5.0)
        arr[2, :] = 0.0
        arr[2, 0] = 99.0  # source sits on the corridor
        df = pd.DataFrame([{ "metric": "m", "tile_row": 0, "tile_col": 0,
                             "h": 4, "w": 8, "pix": arr.tobytes(),
                             "dtype": "float64"}])
        got = _run(df).set_index(["y", "x"])
        # stepping from the expensive source pixel into the corridor
        # costs 3·(99e6 + 0); every further corridor step costs 0
        assert got.loc[(2, 1), "cdist"] == 3 * 99_000_000
        assert got.loc[(2, 7), "cdist"] == 3 * 99_000_000

    def test_no_sources_raises(self, ray_session):
        arr = np.ones((4, 4))
        df = pd.DataFrame([{ "metric": "m", "tile_row": 0, "tile_col": 0,
                             "h": 4, "w": 4, "pix": arr.tobytes(),
                             "dtype": "float64"}])
        with pytest.raises(Exception, match="no source pixel"):
            cost_distance_tiles(rd.from_pandas(df), 50.0).to_pandas()

    def test_negative_cost_raises(self, ray_session):
        arr = np.ones((4, 4))
        arr[1, 1] = -2.0
        arr[0, 0] = 99.0
        df = pd.DataFrame([{ "metric": "m", "tile_row": 0, "tile_col": 0,
                             "h": 4, "w": 4, "pix": arr.tobytes(),
                             "dtype": "float64"}])
        with pytest.raises(Exception, match="negative traversal cost"):
            cost_distance_tiles(rd.from_pandas(df), 50.0).to_pandas()


class TestCostBacklink:
    def test_backlink_paths_reach_sources_at_exact_cost(self, ray_session):
        from gridfia_ray.pipelines.costdist import cost_backlink_tiles
        from gridfia_ray.pipelines.flow import D8_OFFSETS

        rng = np.random.RandomState(15)
        df, g = _raster(rng, tiles_y=2, tiles_x=2, h=5, w=5, p_source=0.08)
        dist = _brute(g, 50.0)
        bl = (cost_backlink_tiles(rd.from_pandas(df), 50.0, n_buckets=4)
              .to_pandas().set_index(["y", "x"])["backlink"])
        u = np.floor(g * 1e6 + 0.5).astype(np.int64)
        H, W = g.shape
        assert len(bl) == g.size
        for y in range(H):
            for x in range(W):
                if dist[y, x] == 0:
                    assert bl.loc[(y, x)] == -1
                    continue
                # walk the backlink chain: costs must telescope to 0
                cy, cx, acc, steps = y, x, 0, 0
                while dist[cy, cx] > 0:
                    k = int(bl.loc[(cy, cx)])
                    assert k >= 0, (cy, cx)
                    dy, dx = D8_OFFSETS[k]
                    wgt = 3 if dy == 0 or dx == 0 else 4
                    ny, nx = cy + dy, cx + dx
                    acc += wgt * (u[cy, cx] + u[ny, nx])
                    cy, cx = ny, nx
                    steps += 1
                    assert steps <= H * W
                assert acc == dist[y, x], (y, x)

    def test_backlink_coarsen_and_partition_invariant(self, ray_session):
        from gridfia_ray.pipelines.costdist import cost_backlink_tiles

        rng = np.random.RandomState(16)
        df, _ = _raster(rng, tiles_y=2, tiles_x=2, h=4, w=4)
        a = (cost_backlink_tiles(rd.from_pandas(df).repartition(2), 50.0, n_buckets=3)
             .to_pandas().sort_values(["y", "x"]).reset_index(drop=True))
        b = (cost_backlink_tiles(rd.from_pandas(df).repartition(4), 50.0,
                                 n_buckets=5, coarsen=2)
             .to_pandas().sort_values(["y", "x"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b)


class TestCostAllocation:
    @staticmethod
    def _brute_alloc(g, threshold):
        from gridfia_ray.pipelines.flow import D8_OFFSETS

        dist = _brute(g, threshold)
        u = np.floor(g * 1e6 + 0.5).astype(np.int64)
        H, W = g.shape
        INF = 1 << 62
        Dp = np.full((H + 2, W + 2), INF, np.int64)
        Cp = np.zeros((H + 2, W + 2), np.int64)
        Dp[1:-1, 1:-1] = dist
        Cp[1:-1, 1:-1] = u
        best = np.full((H, W), INF, np.int64)
        code = np.full((H, W), -1, np.int64)
        for k, (dy, dx) in enumerate(D8_OFFSETS):
            wgt = 3 if dy == 0 or dx == 0 else 4
            cand = (Dp[1 + dy:1 + dy + H, 1 + dx:1 + dx + W]
                    + wgt * (Cp[1 + dy:1 + dy + H, 1 + dx:1 + dx + W] + u))
            better = cand < best
            best[better] = cand[better]
            code[better] = k
        code[dist == 0] = -1
        alloc = np.full(H * W, -1, np.int64)
        codef = code.ravel().tolist()
        for lin in np.argsort(dist.ravel(), kind="stable").tolist():
            k = codef[lin]
            y, x = divmod(lin, W)
            if k < 0:
                alloc[lin] = lin
            else:
                dy, dx = D8_OFFSETS[k]
                alloc[lin] = alloc[(y + dy) * W + (x + dx)]
        return alloc.reshape(H, W)

    def test_matches_chain_replay(self, ray_session):
        from gridfia_ray.pipelines.costdist import cost_allocation_tiles

        rng = np.random.RandomState(17)
        df, g = _raster(rng, tiles_y=2, tiles_x=2, h=5, w=5, p_source=0.08)
        g = g + 1.0  # strictly positive costs (allocation precondition)
        df["pix"] = [
            (np.frombuffer(p, np.float64) + 1.0).tobytes() for p in df["pix"]
        ]
        W = g.shape[1]
        got = (cost_allocation_tiles(rd.from_pandas(df), 51.0, width=W,
                                     n_buckets=4)
               .to_pandas().sort_values(["y", "x"]).reset_index(drop=True))
        want = self._brute_alloc(g, 51.0)
        grid = np.full(g.shape, -2, np.int64)
        grid[got["y"], got["x"]] = got["alloc"]
        np.testing.assert_array_equal(grid, want)
        # every allocation target is a source pixel
        u = np.floor(g * 1e6 + 0.5).astype(np.int64)
        for pid in np.unique(got["alloc"]):
            assert u[pid // W, pid % W] > 51_000_000

    def test_coarsen_invariant(self, ray_session):
        from gridfia_ray.pipelines.costdist import cost_allocation_tiles

        rng = np.random.RandomState(18)
        df, g = _raster(rng, tiles_y=2, tiles_x=2, h=4, w=4)
        df["pix"] = [
            (np.frombuffer(p, np.float64) + 1.0).tobytes() for p in df["pix"]
        ]
        W = g.shape[1]
        a = (cost_allocation_tiles(rd.from_pandas(df), 51.0, width=W, n_buckets=3)
             .to_pandas().sort_values(["y", "x"]).reset_index(drop=True))
        b = (cost_allocation_tiles(rd.from_pandas(df), 51.0, width=W,
                                   n_buckets=5, coarsen=2)
             .to_pandas().sort_values(["y", "x"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b)

    def test_zero_cost_raises(self, ray_session):
        from gridfia_ray.pipelines.costdist import cost_allocation_tiles

        arr = np.ones((4, 4))
        arr[1, 1] = 0.0
        arr[0, 0] = 99.0
        df = pd.DataFrame([{ "metric": "m", "tile_row": 0, "tile_col": 0,
                             "h": 4, "w": 4, "pix": arr.tobytes(),
                             "dtype": "float64"}])
        with pytest.raises(Exception, match="strictly"):
            cost_allocation_tiles(rd.from_pandas(df), 50.0, width=4).to_pandas()


class TestCostPaths:
    def test_paths_match_sequential_walk(self, ray_session):
        from gridfia_ray.pipelines.costdist import cost_paths_tiles
        from gridfia_ray.pipelines.flow import D8_OFFSETS

        rng = np.random.RandomState(19)
        df, g = _raster(rng, tiles_y=2, tiles_x=2, h=5, w=5, p_source=0.08)
        df["pix"] = [
            (np.frombuffer(p, np.float64) + 1.0).tobytes() for p in df["pix"]
        ]
        g = g + 1.0
        H, W = g.shape
        dests = [(0, 0, 0), (1, H - 1, W - 1), (2, H // 2, W // 2)]
        got = cost_paths_tiles(rd.from_pandas(df), 51.0, dests, n_buckets=3)
        # sequential replay over the brute backlink field
        dist = _brute(g, 51.0)
        u = np.floor(g * 1e6 + 0.5).astype(np.int64)
        INF = 1 << 62
        Dp = np.full((H + 2, W + 2), INF, np.int64)
        Cp = np.zeros((H + 2, W + 2), np.int64)
        Dp[1:-1, 1:-1] = dist
        Cp[1:-1, 1:-1] = u
        best = np.full((H, W), INF, np.int64)
        bl = np.full((H, W), -1, np.int64)
        for k, (dy, dx) in enumerate(D8_OFFSETS):
            wgt = 3 if dy == 0 or dx == 0 else 4
            cand = (Dp[1 + dy:1 + dy + H, 1 + dx:1 + dx + W]
                    + wgt * (Cp[1 + dy:1 + dy + H, 1 + dx:1 + dx + W] + u))
            better = cand < best
            best[better] = cand[better]
            bl[better] = k
        bl[dist == 0] = -1
        want_rows = []
        for dest_id, y, x in dests:
            step = 0
            while True:
                want_rows.append((dest_id, step, y, x))
                k = bl[y, x]
                if k < 0:
                    break
                dy, dx = D8_OFFSETS[k]
                y, x, step = y + dy, x + dx, step + 1
        want = pd.DataFrame(
            want_rows, columns=["dest_id", "step", "y", "x"]
        ).astype(np.int64).sort_values(["dest_id", "step"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got.reset_index(drop=True), want)
        # every path ends on a source
        for did, grp in got.groupby("dest_id"):
            last = grp.sort_values("step").iloc[-1]
            assert dist[int(last["y"]), int(last["x"])] == 0


class TestCostCheckpoint:
    @staticmethod
    def _corner_source_raster(tiles_y=2, tiles_x=3, h=4, w=4):
        rows = []
        for tr in range(tiles_y):
            for tc in range(tiles_x):
                arr = np.ones((h, w))
                if tr == 0 and tc == 0:
                    arr[0, 0] = 99.0
                rows.append(
                    {"metric": "m", "tile_row": tr, "tile_col": tc,
                     "h": h, "w": w, "pix": arr.tobytes(),
                     "dtype": "float64"}
                )
        return pd.DataFrame(rows)

    def test_interrupt_then_resume_is_bit_identical(self, ray_session, tmp_path):
        from gridfia_ray.pipelines.costdist import cost_distance_tiles

        df = self._corner_source_raster()
        full = (cost_distance_tiles(rd.from_pandas(df), 50.0, n_buckets=3)
                .to_pandas().sort_values(["y", "x"]).reset_index(drop=True))
        ck = str(tmp_path / "ck")
        # a single-corner source across a 3-tile-wide grid needs >1
        # superstep: max_rounds=1 dies mid-run, leaving round_0 recorded
        with pytest.raises(RuntimeError, match="no convergence"):
            cost_distance_tiles(
                rd.from_pandas(df), 50.0, n_buckets=3,
                max_rounds=1, checkpoint_dir=ck,
            ).to_pandas()
        import os
        assert os.path.exists(os.path.join(ck, "manifest.json"))
        resumed = (cost_distance_tiles(rd.from_pandas(df), 50.0, n_buckets=3,
                                       checkpoint_dir=ck)
                   .to_pandas().sort_values(["y", "x"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(resumed, full)
        # a further rerun takes the recorded-converged fast path
        again = (cost_distance_tiles(rd.from_pandas(df), 50.0, n_buckets=3,
                                     checkpoint_dir=ck)
                 .to_pandas().sort_values(["y", "x"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(again, full)
        # only the latest round's shard remains on disk
        import json
        m = json.load(open(os.path.join(ck, "manifest.json")))
        rounds = sorted(k for k in m["partitions"] if k.startswith("round_"))
        dirs = [d for d in os.listdir(ck) if d.startswith("part=round_")]
        assert len(dirs) == 1


class TestDecoupledSources:
    def test_separate_source_raster_matches_dijkstra(self, ray_session):
        from gridfia_ray.pipelines.costdist import cost_distance_tiles

        rng = np.random.RandomState(20)
        df, g = _raster(rng, tiles_y=2, tiles_x=2, h=5, w=5, p_source=0.0)
        # independent source layer: a handful of marked pixels
        src_g = np.zeros_like(g)
        src_g[1, 1] = src_g[8, 7] = 1.0
        src_rows = []
        h = w = 5
        for tr in range(2):
            for tc in range(2):
                src_rows.append(
                    {"metric": "src", "tile_row": tr, "tile_col": tc,
                     "h": h, "w": w,
                     "pix": src_g[tr*h:(tr+1)*h, tc*w:(tc+1)*w].tobytes(),
                     "dtype": "float64"}
                )
        got = (cost_distance_tiles(
                   rd.from_pandas(df), 0.5,
                   sources=rd.from_pandas(pd.DataFrame(src_rows)),
                   n_buckets=3)
               .to_pandas().sort_values(["y", "x"]).reset_index(drop=True))
        # brute Dijkstra with the same decoupled sources
        import heapq
        u = np.floor(g * 1e6 + 0.5).astype(np.int64)
        H, W = g.shape
        c = u.ravel().tolist()
        INF = 1 << 62
        dist = [INF] * (H * W)
        heap = []
        for (sy, sx) in ((1, 1), (8, 7)):
            dist[sy * W + sx] = 0
            heap.append((0, sy * W + sx))
        heapq.heapify(heap)
        nbrs = [(-1, -1, 4), (-1, 0, 3), (-1, 1, 4), (0, -1, 3),
                (0, 1, 3), (1, -1, 4), (1, 0, 3), (1, 1, 4)]
        while heap:
            dd, lin = heapq.heappop(heap)
            if dd > dist[lin]:
                continue
            y, x = divmod(lin, W)
            for dy, dx, wgt in nbrs:
                ny, nx = y + dy, x + dx
                if 0 <= ny < H and 0 <= nx < W:
                    nl = ny * W + nx
                    nd = dd + wgt * (c[lin] + c[nl])
                    if nd < dist[nl]:
                        dist[nl] = nd
                        heapq.heappush(heap, (nd, nl))
        want = np.asarray(dist, np.int64).reshape(H, W)
        grid = np.full(g.shape, -1, np.int64)
        grid[got["y"], got["x"]] = got["cdist"]
        np.testing.assert_array_equal(grid, want)

    def test_no_sources_in_layer_raises(self, ray_session):
        from gridfia_ray.pipelines.costdist import cost_distance_tiles

        rng = np.random.RandomState(21)
        df, _ = _raster(rng, tiles_y=1, tiles_x=1, h=4, w=4, p_source=0.0)
        src = df.copy()
        src["metric"] = "src"
        src["pix"] = [np.zeros((4, 4)).tobytes()]
        with pytest.raises(Exception, match="no source pixel"):
            cost_distance_tiles(
                rd.from_pandas(df), 0.5, sources=rd.from_pandas(src)
            ).to_pandas()
