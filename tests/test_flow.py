"""D8 flow direction + accumulation: closed forms, tie-break, brute
force over multi-tile rasters, cross-tile settling, partition
invariance."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from gridfia_ray.pipelines.flow import (
    D8_OFFSETS,
    d8_directions,
    flow_accumulate,
    flow_direction_packed,
    watershed,
)


def _tiles_from_grid(g: np.ndarray, th: int, tw: int) -> pd.DataFrame:
    """Result-tile rows (float64 pix; the explode stage µ-scales)."""
    H, W = g.shape
    assert H % th == 0 and W % tw == 0
    rows = []
    for tr in range(H // th):
        for tc in range(W // tw):
            arr = g[tr * th : (tr + 1) * th, tc * tw : (tc + 1) * tw]
            rows.append(
                {
                    "metric": "total_biomass",
                    "tile_row": tr,
                    "tile_col": tc,
                    "h": th,
                    "w": tw,
                    "pix": np.ascontiguousarray(arr, dtype=np.float64).tobytes(),
                    "dtype": "float64",
                }
            )
    return pd.DataFrame(rows)


def brute_flow(g: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Independent single-process replay: directions via per-pixel scan
    in priority order, accumulation by global descending-z pushes."""
    u = np.floor(g * 1_000_000 + 0.5).astype(np.int64)
    H, W = u.shape
    d8 = np.full((H, W), -1, dtype=np.int64)
    for y in range(H):
        for x in range(W):
            best = 0
            for code, (dy, dx) in enumerate(D8_OFFSETS):
                ny, nx = y + dy, x + dx
                if 0 <= ny < H and 0 <= nx < W:
                    drop = u[y, x] - u[ny, nx]
                    if drop > best:
                        best = drop
                        d8[y, x] = code
    acc = np.zeros((H, W), dtype=np.int64)
    order = np.argsort(-u.ravel(), kind="stable")
    for lin in order.tolist():
        y, x = divmod(lin, W)
        code = d8[y, x]
        if code < 0:
            continue
        dy, dx = D8_OFFSETS[code]
        acc[y + dy, x + dx] += acc[y, x] + 1
    return d8, acc


def _run(g: np.ndarray, th: int, tw: int, n_parts: int = 4) -> pd.DataFrame:
    df = _tiles_from_grid(g, th, tw)
    packed = flow_direction_packed(
        rd.from_pandas(df).repartition(n_parts), n_buckets=8
    )
    out = flow_accumulate(packed).to_pandas()
    return out.sort_values(["y", "x"]).reset_index(drop=True)


class TestDirections:
    def test_east_slope_all_flow_east(self):
        # z decreases with x: every pixel's steepest in-grid drop is E,
        # except the last column (E off-grid; SE/NE also off-grid) = pit
        h, w = 4, 5
        vals = np.zeros((h + 2, w + 2), dtype=np.int64)
        pres = np.zeros((h + 2, w + 2), dtype=np.int64)
        vals[1 : h + 1, 1 : w + 1] = (10 - np.arange(w)) * 100
        pres[1 : h + 1, 1 : w + 1] = 1
        d8 = d8_directions(vals, pres, h, w)
        assert (d8[:, :-1] == 0).all()  # E
        assert (d8[:, -1] == -1).all()  # edge pit

    def test_priority_tie_break(self):
        # equal drops E and S → E wins (priority order)
        vals = np.zeros((3 + 2, 3 + 2), dtype=np.int64)
        pres = np.zeros((3 + 2, 3 + 2), dtype=np.int64)
        z = np.array([[9, 9, 9], [9, 9, 5], [9, 5, 9]], dtype=np.int64)
        vals[1:4, 1:4] = z
        pres[1:4, 1:4] = 1
        d8 = d8_directions(vals, pres, 3, 3)
        assert d8[1, 1] == 0  # E beats S despite equal drop 4

    def test_flat_is_pit(self):
        vals = np.full((5, 5), 7, dtype=np.int64)
        pres = np.ones((5, 5), dtype=np.int64)
        d8 = d8_directions(vals, pres, 3, 3)
        assert (d8 == -1).all()


class TestDrops:
    def test_pit_diag_is_zero(self, ray_session):
        # pits carry dir = -1; the diag column must be 0 there (the
        # pinned replay's convention), not (-1) % 2 == 1 (r4 ADVICE)
        from gridfia_ray.pipelines.flow import d8_drops_tiles

        g = np.full((8, 8), 5.0)
        g[1:4, 1:4] = 9.0  # a bump draining outward; flats stay pits
        out = d8_drops_tiles(
            rd.from_pandas(_tiles_from_grid(g, 4, 4)), n_buckets=4
        ).to_pandas()
        pits = out[out["dir"] < 0]
        assert len(pits) > 0
        assert (pits["diag"] == 0).all()
        flowing = out[out["dir"] >= 0]
        np.testing.assert_array_equal(
            flowing["diag"].to_numpy(), flowing["dir"].to_numpy() % 2
        )


class TestCoarsenPacked:
    def test_coarsened_accumulation_bit_matches(self, ray_session):
        from gridfia_ray.pipelines.flow import (
            coarsen_packed_tiles,
            grid_divisor_factor,
        )

        rng = np.random.RandomState(21)
        g = rng.rand(16, 16) * 90
        packed = flow_direction_packed(
            rd.from_pandas(_tiles_from_grid(g, 4, 4)).repartition(3),
            n_buckets=8,
        ).materialize()
        base = (
            flow_accumulate(packed)
            .to_pandas()
            .sort_values(["y", "x"])
            .reset_index(drop=True)
        )
        f = grid_divisor_factor(packed, 4)
        assert f == 4
        coarse = (
            flow_accumulate(coarsen_packed_tiles(packed, f))
            .to_pandas()
            .sort_values(["y", "x"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(base, coarse)

    def test_grid_divisor_clamps(self, ray_session):
        from gridfia_ray.pipelines.flow import (
            coarsen_packed_tiles,
            grid_divisor_factor,
        )

        g = np.tile((30.0 - np.arange(12)), (12, 1))
        packed = flow_direction_packed(
            rd.from_pandas(_tiles_from_grid(g, 4, 4)), n_buckets=4
        ).materialize()
        # 3×3 tile grid: 4 doesn't divide, 3 does
        assert grid_divisor_factor(packed, 4) == 3
        out = flow_accumulate(
            coarsen_packed_tiles(packed, 3)
        ).to_pandas()
        assert len(out) == g.size

    def test_incomplete_block_raises(self, ray_session):
        from gridfia_ray.pipelines.flow import coarsen_packed_tiles

        g = np.tile((30.0 - np.arange(8)), (8, 1))
        df = _tiles_from_grid(g, 4, 4)
        df = df[~((df["tile_row"] == 1) & (df["tile_col"] == 1))]
        packed = flow_direction_packed(
            rd.from_pandas(df), n_buckets=4
        ).materialize()
        with pytest.raises(Exception, match="incomplete"):
            coarsen_packed_tiles(packed, 2).materialize()


class TestAccumulation:
    def test_east_plane_closed_form(self, ray_session):
        # single row flow: acc(y, x) = x (cells strictly west, same row)
        g = np.tile((20.0 - np.arange(8)) * 3.0, (8, 1))
        out = _run(g, 4, 4)
        a = out.set_index(["y", "x"])
        for y in range(8):
            for x in range(8):
                assert a.loc[(y, x), "acc"] == x, (y, x)
        # direction column: E everywhere except last column pits
        assert (out[out["x"] < 7]["dir"] == 0).all()
        assert (out[out["x"] == 7]["dir"] == -1).all()

    def test_matches_brute_force_random(self, ray_session):
        rng = np.random.RandomState(7)
        g = rng.rand(12, 12) * 90
        want_dir, want_acc = brute_flow(g)
        out = _run(g, 4, 4, n_parts=3)
        got_dir = out.pivot(index="y", columns="x", values="dir").to_numpy()
        got_acc = out.pivot(index="y", columns="x", values="acc").to_numpy()
        np.testing.assert_array_equal(got_dir, want_dir)
        np.testing.assert_array_equal(got_acc, want_acc)

    def test_cross_tile_zigzag_settles(self, ray_session):
        # a single descending path snaking between two tile columns:
        # forces several cross-boundary settling rounds
        H, W = 8, 8
        g = np.zeros((H, W))
        path = []
        for y in range(H):
            xs = range(W) if y % 2 == 0 else range(W - 1, -1, -1)
            path.extend((y, x) for x in xs)
        for i, (y, x) in enumerate(path):
            g[y, x] = 1000.0 - i  # strictly decreasing along the snake
        want_dir, want_acc = brute_flow(g)
        out = _run(g, 4, 4)
        got_acc = out.pivot(index="y", columns="x", values="acc").to_numpy()
        np.testing.assert_array_equal(got_acc, want_acc)
        # the snake's last cell accumulates every other cell
        assert got_acc[path[-1][0], path[-1][1]] == H * W - 1

    def test_partition_invariance(self, ray_session):
        rng = np.random.RandomState(21)
        g = rng.rand(16, 16) * 50
        a = _run(g, 4, 4, n_parts=2)
        b = _run(g, 8, 8, n_parts=5)
        pd.testing.assert_frame_equal(a, b)

    def test_nonconvergence_guard(self, ray_session):
        g = np.tile((20.0 - np.arange(8)) * 3.0, (8, 1))
        df = _tiles_from_grid(g, 4, 4)
        packed = flow_direction_packed(rd.from_pandas(df), n_buckets=4)
        with pytest.raises(RuntimeError, match="did not settle"):
            flow_accumulate(packed, max_rounds=1)


def brute_basin(g: np.ndarray) -> np.ndarray:
    """Independent replay: basin = pit at the end of each cell's path,
    resolved ascending-z (downstream first)."""
    d8, _ = brute_flow(g)
    u = np.floor(g * 1_000_000 + 0.5).astype(np.int64)
    H, W = u.shape
    basin = np.zeros(H * W, dtype=np.int64)
    order = np.argsort(-u.ravel(), kind="stable")
    for lin in order.tolist()[::-1]:
        y, x = divmod(lin, W)
        code = d8[y, x]
        if code < 0:
            basin[lin] = lin
        else:
            dy, dx = D8_OFFSETS[code]
            basin[lin] = basin[(y + dy) * W + (x + dx)]
    return basin.reshape(H, W)


def _run_basin(g: np.ndarray, th: int, tw: int, n_parts: int = 4) -> pd.DataFrame:
    df = _tiles_from_grid(g, th, tw)
    packed = flow_direction_packed(
        rd.from_pandas(df).repartition(n_parts), n_buckets=8
    )
    out = watershed(packed, width=g.shape[1]).to_pandas()
    return out.sort_values(["y", "x"]).reset_index(drop=True)


class TestWatershed:
    def test_east_plane_one_basin_per_row(self, ray_session):
        # every row drains east to its last-column pit
        g = np.tile((20.0 - np.arange(8)) * 3.0, (8, 1))
        out = _run_basin(g, 4, 4)
        b = out.pivot(index="y", columns="x", values="basin").to_numpy()
        for y in range(8):
            assert (b[y, :] == y * 8 + 7).all()

    def test_snake_single_basin(self, ray_session):
        # one strictly descending path through every cell: the global
        # minimum is the only pit, so ALL cells share its basin — the
        # forwarding chains cross many tile borders
        H, W = 8, 8
        g = np.zeros((H, W))
        path = []
        for y in range(H):
            xs = range(W) if y % 2 == 0 else range(W - 1, -1, -1)
            path.extend((y, x) for x in xs)
        for i, (y, x) in enumerate(path):
            g[y, x] = 1000.0 - i
        out = _run_basin(g, 4, 4)
        py, px = path[-1]
        assert (out["basin"] == py * W + px).all()

    def test_matches_brute_force_random(self, ray_session):
        rng = np.random.RandomState(13)
        g = rng.rand(12, 12) * 90
        want = brute_basin(g)
        got = (
            _run_basin(g, 4, 4, n_parts=3)
            .pivot(index="y", columns="x", values="basin")
            .to_numpy()
        )
        np.testing.assert_array_equal(got, want)

    def test_partition_invariance(self, ray_session):
        rng = np.random.RandomState(29)
        g = rng.rand(16, 16) * 50
        a = _run_basin(g, 4, 4, n_parts=2)
        b = _run_basin(g, 8, 8, n_parts=5)
        pd.testing.assert_frame_equal(a, b)

    def test_pits_label_themselves(self, ray_session):
        rng = np.random.RandomState(31)
        g = rng.rand(8, 8) * 50
        out = _run_basin(g, 4, 4)
        d = out.set_index(["y", "x"])
        # watershed output has no dir column; recompute pits from brute
        d8, _ = brute_flow(g)
        for y in range(8):
            for x in range(8):
                if d8[y, x] < 0:
                    assert d.loc[(y, x), "basin"] == y * 8 + x


def brute_strahler(g: np.ndarray) -> np.ndarray:
    """Global descending-z Strahler replay over the brute D8 forest."""
    d8, _ = brute_flow(g)
    u = np.floor(g * 1_000_000 + 0.5).astype(np.int64)
    H, W = u.shape
    inmax = np.zeros(H * W, np.int64)
    incnt = np.zeros(H * W, np.int64)
    st = np.zeros(H * W, np.int64)
    order = np.argsort(-u.ravel(), kind="stable")
    for lin in order.tolist():
        y, x = divmod(lin, W)
        o = 1 if inmax[lin] == 0 else inmax[lin] + (1 if incnt[lin] >= 2 else 0)
        st[lin] = o
        code = d8[y, x]
        if code < 0:
            continue
        dy, dx = D8_OFFSETS[code]
        c = (y + dy) * W + (x + dx)
        if o > inmax[c]:
            inmax[c] = o
            incnt[c] = 1
        elif o == inmax[c]:
            incnt[c] += 1
    return st.reshape(H, W)


class TestStrahler:
    def _run(self, g, th, tw, n_parts=4):
        from gridfia_ray.pipelines.flow import strahler_order

        df = _tiles_from_grid(g, th, tw)
        packed = flow_direction_packed(
            rd.from_pandas(df).repartition(n_parts), n_buckets=8
        )
        out = strahler_order(packed).to_pandas()
        return out.sort_values(["y", "x"]).reset_index(drop=True)

    def test_east_plane_all_order_one_then_growth(self, ray_session):
        # z decreases with x only: each row is one chain; a chain never
        # has two inputs, so every cell is order 1
        H = W = 12
        g = (np.arange(W)[::-1] * 10.0)[None, :].repeat(H, axis=0)
        out = self._run(g, 4, 4)
        assert (out["strahler"] == 1).all()

    def test_matches_brute_force_random(self, ray_session):
        rng = np.random.RandomState(3)
        g = rng.rand(16, 16) * 100
        out = self._run(g, 4, 4)
        want = brute_strahler(g)
        got = out.set_index(["y", "x"])["strahler"]
        for y in range(16):
            for x in range(16):
                assert got[(y, x)] == want[y, x], (y, x)

    def test_confluence_bumps_order(self, ray_session):
        # a V: two order-1 chains meet at a pit -> the pit is order 2
        g = np.array(
            [
                [9.0, 1.0, 9.0, 9.0],
                [8.0, 0.5, 8.0, 9.0],
                [7.0, 0.2, 7.0, 9.0],
                [9.0, 0.0, 9.0, 9.0],
            ]
        )
        out = self._run(g, 2, 2, n_parts=2)
        got = out.set_index(["y", "x"])["strahler"]
        want = brute_strahler(g)
        for y in range(4):
            for x in range(4):
                assert got[(y, x)] == want[y, x], (y, x)
        assert want.max() >= 2

    def test_partition_invariance(self, ray_session):
        rng = np.random.RandomState(4)
        g = rng.rand(12, 12) * 50
        a = self._run(g, 4, 4, n_parts=1)
        b = self._run(g, 6, 6, n_parts=5)
        pd.testing.assert_frame_equal(a, b)
