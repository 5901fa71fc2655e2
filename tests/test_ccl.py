"""Distributed connected-component labeling vs a brute-force flood fill."""

from collections import deque

import numpy as np
import pyarrow as pa
import pytest

from gridfia_ray.pipelines.ccl import connected_components, label_tile


def brute_label(mask: np.ndarray) -> tuple[np.ndarray, int]:
    """Single-process BFS flood fill, labels compact in scan order —
    deliberately NOT the engine's run-based union-find."""
    h, w = mask.shape
    out = np.full((h, w), -1, np.int64)
    k = 0
    for y in range(h):
        for x in range(w):
            if mask[y, x] and out[y, x] < 0:
                dq = deque([(y, x)])
                out[y, x] = k
                while dq:
                    cy, cx = dq.popleft()
                    for ny, nx in ((cy - 1, cx), (cy + 1, cx), (cy, cx - 1), (cy, cx + 1)):
                        if 0 <= ny < h and 0 <= nx < w and mask[ny, nx] and out[ny, nx] < 0:
                            out[ny, nx] = k
                            dq.append((ny, nx))
                k += 1
    return out, k


def brute_anchors(mask: np.ndarray) -> np.ndarray:
    """Canonical form: per-pixel min linear index of its component."""
    lab, k = brute_label(mask)
    out = np.full(mask.shape, -1, np.int64).ravel()
    flat = lab.ravel()
    for c in range(k):
        idx = np.nonzero(flat == c)[0]
        out[idx] = idx.min()
    return out.reshape(mask.shape)


class TestLabelTile:
    @pytest.mark.parametrize("p", [0.05, 0.3, 0.5, 0.7, 0.95])
    def test_matches_flood_fill(self, p):
        rng = np.random.RandomState(int(p * 100))
        m = rng.rand(41, 37) < p
        a, ka = label_tile(m)
        b, kb = brute_label(m)
        assert ka == kb
        assert (a == b).all()  # identical scan-order compaction

    def test_empty_and_full(self):
        a, k = label_tile(np.zeros((8, 8), bool))
        assert k == 0 and (a == -1).all()
        a, k = label_tile(np.ones((8, 8), bool))
        assert k == 1 and (a == 0).all()

    def test_diagonal_is_not_connected(self):
        m = np.array([[1, 0], [0, 1]], bool)
        a, k = label_tile(m)
        assert k == 2  # 4-connectivity: corners touch, don't connect


def _tiles_from_grid(grid: np.ndarray, G: int, T: int):
    import ray.data as rd

    rows = []
    for tr in range(G):
        for tc in range(G):
            sub = np.ascontiguousarray(grid[tr * T:(tr + 1) * T, tc * T:(tc + 1) * T])
            rows.append(
                {
                    "metric": "total",
                    "tile_row": tr,
                    "tile_col": tc,
                    "h": T,
                    "w": T,
                    "pix": sub.tobytes(),
                    "dtype": str(sub.dtype),
                }
            )
    return rd.from_arrow(pa.table({k: [r[k] for r in rows] for k in rows[0]}))


def _reassemble(labeled, G: int, T: int) -> np.ndarray:
    N = G * T
    full = np.full((N, N), -1, np.int64)
    for _, r in labeled.to_pandas().iterrows():
        full[
            r.tile_row * T:(r.tile_row + 1) * T, r.tile_col * T:(r.tile_col + 1) * T
        ] = np.frombuffer(r["pix"], np.int64).reshape(T, T)
    return full


class TestDistributedCCL:
    def test_matches_flood_fill_end_to_end(self, ray_session):
        """Pixel labels, component set and sizes all equal the brute
        fill's — including components spanning many tiles."""
        G, T = 4, 32
        N = G * T
        rng = np.random.RandomState(7)
        grid = (rng.rand(N, N) * 100).astype(np.float64)
        thr = 45.0
        labeled, comps = connected_components(
            _tiles_from_grid(grid, G, T), G, threshold=thr, n_buckets=8
        )
        # the engine thresholds in the micro-scaled int domain — mirror it
        mask = np.floor(grid * 1_000_000 + 0.5).astype(np.int64) > int(thr * 1_000_000)
        exp = brute_anchors(mask)
        assert (_reassemble(labeled, G, T) == exp).all()
        cdf = comps.to_pandas().sort_values("component").reset_index(drop=True)
        flat = exp.ravel()
        import pandas as pd

        sizes = pd.Series(flat[flat >= 0]).value_counts().sort_index()
        assert (cdf["component"].to_numpy() == sizes.index.to_numpy()).all()
        assert (cdf["n_pixels"].to_numpy() == sizes.to_numpy()).all()

    def test_single_component_spanning_all_tiles(self, ray_session):
        G, T = 3, 16
        grid = np.ones((G * T, G * T), np.float64)
        labeled, comps = connected_components(
            _tiles_from_grid(grid, G, T), G, threshold=0.5, n_buckets=4
        )
        full = _reassemble(labeled, G, T)
        assert (full == 0).all()  # anchor = pixel (0, 0)
        cdf = comps.to_pandas()
        assert len(cdf) == 1
        assert int(cdf["n_pixels"].iloc[0]) == (G * T) ** 2

    def test_empty_mask(self, ray_session):
        G, T = 2, 16
        grid = np.zeros((G * T, G * T), np.float64)
        labeled, comps = connected_components(
            _tiles_from_grid(grid, G, T), G, threshold=0.5, n_buckets=4
        )
        assert (_reassemble(labeled, G, T) == -1).all()
        assert comps.count() == 0

    def test_partition_invariance(self, ray_session):
        """Same raster, different tiling → identical canonical labels
        (the anchor-pixel form is a pure function of the components)."""
        N = 96
        rng = np.random.RandomState(11)
        grid = (rng.rand(N, N) * 10).astype(np.float64)
        outs = []
        for G, T in ((2, 48), (6, 16)):
            labeled, _ = connected_components(
                _tiles_from_grid(grid, G, T), G, threshold=5.0, n_buckets=4
            )
            outs.append(_reassemble(labeled, G, T))
        assert (outs[0] == outs[1]).all()


class TestSieve:
    def _run(self, rng, min_size, **kw):
        from gridfia_ray.pipelines.ccl import sieve_components

        G, T = 3, 8
        grid = (rng.rand(G * T, G * T) < 0.35).astype(np.int64) * 100
        tiles = _tiles_from_grid(grid, G, T)
        labeled, comps = connected_components(tiles, G, threshold=0.0)
        sieved = sieve_components(labeled, comps, min_size, **kw)
        got = _reassemble(sieved, G, T)
        # brute: anchors, erase components under min_size
        want = brute_anchors(grid > 0)
        flat = want.ravel()
        keep_ids = [
            c for c in np.unique(flat[flat >= 0])
            if (flat == c).sum() >= min_size
        ]
        want2 = np.where(np.isin(want, keep_ids), want, -1)
        return got, want2

    def test_matches_brute_broadcast_path(self, ray_session):
        got, want = self._run(np.random.RandomState(3), min_size=4)
        np.testing.assert_array_equal(got, want)

    def test_matches_brute_exchange_path(self, ray_session):
        # max_broadcast_ids=0 forces the co-bucketed probe + rewrite route
        got, want = self._run(
            np.random.RandomState(3), min_size=4, max_broadcast_ids=0
        )
        np.testing.assert_array_equal(got, want)

    def test_min_size_one_is_identity(self, ray_session):
        from gridfia_ray.pipelines.ccl import sieve_components

        G, T = 2, 6
        rng = np.random.RandomState(5)
        grid = (rng.rand(G * T, G * T) < 0.3).astype(np.int64) * 7
        tiles = _tiles_from_grid(grid, G, T)
        labeled, comps = connected_components(tiles, G, threshold=0.0)
        a = _reassemble(labeled, G, T)
        b = _reassemble(sieve_components(labeled, comps, 1), G, T)
        np.testing.assert_array_equal(a, b)


class TestComponentProps:
    def test_matches_brute_regionprops(self, ray_session):
        import pandas as pd

        from gridfia_ray.pipelines.ccl import component_props

        G, T = 4, 16
        N = G * T
        rng = np.random.RandomState(19)
        grid = (rng.rand(N, N) * 100).astype(np.float64)
        thr = 55.0
        labeled, _ = connected_components(
            _tiles_from_grid(grid, G, T), G, threshold=thr, n_buckets=8
        )
        got = (
            component_props(labeled)
            .to_pandas()
            .sort_values("component")
            .reset_index(drop=True)
        )
        mask = np.floor(grid * 1_000_000 + 0.5).astype(np.int64) > int(
            thr * 1_000_000
        )
        exp = brute_anchors(mask)
        ys, xs = np.nonzero(exp >= 0)
        df = pd.DataFrame({"c": exp[ys, xs], "y": ys, "x": xs})
        want = (
            df.groupby("c")
            .agg(
                n_pixels=("y", "size"),
                min_y=("y", "min"), max_y=("y", "max"),
                min_x=("x", "min"), max_x=("x", "max"),
                sum_y=("y", "sum"), sum_x=("x", "sum"),
            )
            .reset_index()
            .rename(columns={"c": "component"})
        )
        pd.testing.assert_frame_equal(
            got.astype(np.int64), want.astype(np.int64)
        )
