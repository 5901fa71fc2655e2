"""PageRank: hand-computed integer fixpoints, mass conservation,
asymmetric-graph ordering, validation raises, partition invariance."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from gridfia_ray.pipelines.graph import degree_table, pagerank

SCALE = 10**12


def _edges(pairs, parts=2):
    df = pd.DataFrame(pairs, columns=["src", "dst"]).astype(np.int64)
    return rd.from_pandas(df).repartition(parts)


def _replay(pairs, n_iters, damping=85, scale=SCALE):
    """Sequential integer PageRank — same floor divisions, plain dicts."""
    deg = {}
    for s, _ in pairs:
        deg[s] = deg.get(s, 0) + 1
    n = len(deg)
    tele = ((100 - damping) * scale) // (100 * n)
    r = {v: scale // n for v in deg}
    for _ in range(n_iters):
        nxt = {}
        for s, d in pairs:
            nxt[d] = nxt.get(d, 0) + (damping * r[s]) // (100 * deg[s])
        r = {v: c + tele for v, c in nxt.items()}
    return r


class TestDegree:
    def test_degree(self, ray_session):
        got = degree_table(_edges([(0, 1), (0, 2), (2, 0)])).to_pandas()
        assert dict(zip(got["src"], got["deg"])) == {0: 2, 2: 1}


class TestPageRank:
    def test_two_cycle_hand_computed(self, ray_session):
        pairs = [(0, 1), (1, 0)]
        got = pagerank(_edges(pairs), n_iters=3).to_pandas()
        want = _replay(pairs, 3)
        assert dict(zip(got["node"], got["rank_c"])) == want
        # symmetric graph -> equal ranks summing to ~scale
        assert got["rank_c"].nunique() == 1
        assert abs(int(got["rank_c"].sum()) - SCALE) < 10

    def test_hub_outranks_leaves(self, ray_session):
        # star: hub 0 <-> leaves 1..4 (mirrored)
        pairs = [(0, i) for i in range(1, 5)] + [(i, 0) for i in range(1, 5)]
        got = pagerank(_edges(pairs), n_iters=4).to_pandas().set_index("node")
        want = _replay(pairs, 4)
        assert dict(got["rank_c"]) == want
        assert got.loc[0, "rank_c"] > got.loc[1, "rank_c"]
        leaves = got.loc[[1, 2, 3, 4], "rank_c"]
        assert leaves.nunique() == 1

    def test_matches_replay_on_random_graph(self, ray_session):
        rng = np.random.RandomState(13)
        pairs = set()
        while len(pairs) < 60:
            a, b = rng.randint(0, 12, 2)
            if a != b:
                pairs.add((int(a), int(b)))
                pairs.add((int(b), int(a)))  # mirrored
        pairs = sorted(pairs)
        got = pagerank(_edges(pairs, parts=5), n_iters=3).to_pandas()
        assert dict(zip(got["node"], got["rank_c"])) == _replay(pairs, 3)

    def test_partition_invariant(self, ray_session):
        pairs = [(i, (i + 1) % 9) for i in range(9)] + [
            ((i + 1) % 9, i) for i in range(9)
        ]
        a = pagerank(_edges(pairs, parts=1), n_iters=3, n_buckets=4).to_pandas()
        b = pagerank(_edges(pairs, parts=7), n_iters=3, n_buckets=16).to_pandas()
        pd.testing.assert_frame_equal(
            a.sort_values("node", ignore_index=True),
            b.sort_values("node", ignore_index=True),
        )

    def test_dangling_mass_raises(self, ray_session):
        # 0 -> 1 and 1 has no out-edge: mass sent to a sink
        with pytest.raises(Exception, match="no\\s+.*out-edges|mirror"):
            pagerank(_edges([(0, 1), (0, 2), (2, 0)]), n_iters=2).to_pandas()

    def test_source_only_node_raises(self, ray_session):
        # 2 -> 0 but nothing points at 2: its rank row vanishes
        with pytest.raises(Exception, match="in-edge|mirror"):
            pagerank(_edges([(0, 1), (1, 0), (2, 0)]), n_iters=2).to_pandas()

    def test_bad_damping_rejected(self, ray_session):
        with pytest.raises(ValueError, match="damping"):
            pagerank(_edges([(0, 1), (1, 0)]), damping_pct=100)

    def test_dangling_raises_even_in_shared_bucket(self, ray_session):
        # n_buckets=1 forces the dangling node's messages into a bucket
        # that ALSO holds edge rows — the per-bucket subset check must
        # still fire (a len(e)==0-only guard would silently drop mass)
        with pytest.raises(Exception, match="out-edges|mirror"):
            pagerank(
                _edges([(0, 1), (0, 2), (2, 0)]), n_iters=2, n_buckets=1
            ).to_pandas()


class TestBfs:
    def _bfs(self, pairs, source, parts=3, **kw):
        from gridfia_ray.pipelines.graph import bfs_distances

        return (
            bfs_distances(_edges(pairs, parts=parts), source, **kw)
            .to_pandas().sort_values("node", ignore_index=True)
        )

    def test_path_graph(self, ray_session):
        # 0 -> 1 -> 2 -> 3 (directed chain)
        got = self._bfs([(0, 1), (1, 2), (2, 3), (3, 3)], 0)
        assert dict(zip(got["node"], got["dist"])) == {0: 0, 1: 1, 2: 2, 3: 3}

    def test_shortest_wins_over_longer_path(self, ray_session):
        # 0->1->2->4 and 0->3->4: node 4 must settle at dist 2, not 3
        pairs = [(0, 1), (1, 2), (2, 4), (0, 3), (3, 4), (4, 4)]
        got = self._bfs(pairs, 0)
        assert dict(zip(got["node"], got["dist"]))[4] == 2

    def test_unreachable_nodes_absent(self, ray_session):
        got = self._bfs([(0, 1), (1, 0), (5, 6), (6, 5)], 0)
        assert set(got["node"]) == {0, 1}

    def test_cycle_terminates(self, ray_session):
        got = self._bfs([(0, 1), (1, 2), (2, 0)], 0)
        assert dict(zip(got["node"], got["dist"])) == {0: 0, 1: 1, 2: 2}

    def test_max_depth_bounds_neighborhood(self, ray_session):
        pairs = [(i, i + 1) for i in range(6)] + [(6, 6)]
        got = self._bfs(pairs, 0, max_depth=2)
        assert dict(zip(got["node"], got["dist"])) == {0: 0, 1: 1, 2: 2}

    def test_partition_invariant(self, ray_session):
        rng = np.random.RandomState(17)
        pairs = set()
        while len(pairs) < 40:
            a, b = rng.randint(0, 15, 2)
            pairs.add((int(a), int(b)))
        pairs = sorted(pairs)
        a = self._bfs(pairs, 0, parts=1, n_buckets=4)
        b = self._bfs(pairs, 0, parts=9, n_buckets=16)
        pd.testing.assert_frame_equal(a, b)


class TestTriangles:
    def _tri(self, pairs, parts=3, **kw):
        from gridfia_ray.pipelines.graph import triangle_count

        return triangle_count(_edges(pairs, parts=parts), u="src", v="dst", **kw)

    def test_single_triangle(self, ray_session):
        assert self._tri([(0, 1), (0, 2), (1, 2)]) == 1

    def test_square_no_diagonal(self, ray_session):
        assert self._tri([(0, 1), (1, 2), (2, 3), (0, 3)]) == 0

    def test_complete_graphs(self, ray_session):
        import itertools
        import math

        for n in (4, 7):
            pairs = list(itertools.combinations(range(n), 2))
            assert self._tri(pairs) == math.comb(n, 3)

    def test_hub_skew(self, ray_session):
        # star + one rim edge: hub 0 with 30 leaves, leaves 1-2 joined
        pairs = [(0, i) for i in range(1, 31)] + [(1, 2)]
        assert self._tri(pairs) == 1

    def test_partition_invariant_random(self, ray_session):
        import itertools

        rng = np.random.RandomState(23)
        pairs = [p for p in itertools.combinations(range(14), 2)
                 if rng.rand() < 0.45]
        a = self._tri(pairs, parts=1, n_buckets=4)
        b = self._tri(pairs, parts=7, n_buckets=16)
        assert a == b
        # independent brute force
        es = set(pairs)
        brute = sum(
            1 for x, y, z in itertools.combinations(range(14), 3)
            if (x, y) in es and (y, z) in es and (x, z) in es
        )
        assert a == brute

    def test_non_canonical_rejected(self, ray_session):
        with pytest.raises(Exception, match="canonical"):
            self._tri([(1, 0), (0, 2), (1, 2)])  # (1, 0) not u < v


class TestConnectedComponents:
    def _cc(self, pairs, parts=3, **kw):
        from gridfia_ray.pipelines.graph import connected_components

        kw.setdefault("n_buckets", 4)  # toy graphs: exchange overhead, not data
        out = connected_components(_edges(pairs, parts), **kw).to_pandas()
        return dict(
            zip(out["node"].astype(np.int64), out["component"].astype(np.int64))
        )

    def test_two_components_min_label(self, ray_session):
        got = self._cc([(5, 3), (3, 9), (10, 20), (20, 30)])
        assert got == {3: 3, 5: 3, 9: 3, 10: 10, 20: 10, 30: 10}

    def test_direction_ignored(self, ray_session):
        # a chain pointing "backwards" still forms one component
        got = self._cc([(4, 3), (3, 2), (2, 1)])
        assert set(got.values()) == {1}

    def test_matches_union_find_on_random_graph(self, ray_session):
        rng = np.random.RandomState(7)
        pairs = [
            (int(a), int(b))
            for a, b in rng.randint(0, 60, size=(80, 2))
            if a != b
        ]
        got = self._cc(pairs, parts=5)

        parent = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                lo, hi = sorted((ra, rb))
                parent[hi] = lo
        want = {n: find(n) for n in parent}
        assert got == want

    def test_partition_invariant(self, ray_session):
        pairs = [(0, 1), (1, 2), (7, 8), (8, 9), (9, 7), (42, 43)]
        assert self._cc(pairs, parts=1) == self._cc(pairs, parts=7)


class TestPregelExchangeParity:
    """The shard-actor superstep path must bit-match the Ray-Data
    exchange path (kept as the reference implementation)."""

    def _pairs(self):
        rng = __import__("numpy").random.RandomState(5)
        es = set()
        while len(es) < 60:
            u, v = rng.randint(0, 40, 2)
            if u != v:
                es.add((min(u, v), max(u, v)))
        return sorted(es)

    def test_pagerank_parity(self, ray_session):
        from gridfia_ray.pipelines.graph import pagerank, pagerank_exchange

        # pagerank requires a mirrored graph (every node needs an out-
        # AND in-edge) — same contract on both paths
        mirrored = self._pairs() + [(v, u) for u, v in self._pairs()]
        e = _edges(mirrored, parts=3)
        a = pagerank(e, n_iters=4, n_buckets=5).to_pandas() \
            .sort_values("node", ignore_index=True)
        b = pagerank_exchange(e, n_iters=4, n_buckets=5).to_pandas() \
            .sort_values("node", ignore_index=True)
        pd.testing.assert_frame_equal(a.astype("int64"), b.astype("int64"))

    def test_bfs_parity(self, ray_session):
        from gridfia_ray.pipelines.graph import (
            bfs_distances,
            bfs_distances_exchange,
        )

        e = _edges(self._pairs(), parts=3)
        a = bfs_distances(e, source=0, max_depth=4).to_pandas() \
            .sort_values("node", ignore_index=True)
        b = bfs_distances_exchange(e, source=0, max_depth=4).to_pandas() \
            .sort_values("node", ignore_index=True)
        pd.testing.assert_frame_equal(a.astype("int64"), b.astype("int64"))
