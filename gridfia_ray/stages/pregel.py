"""Static-graph supersteps on shard actors (Pregel-style).

Ray Data's ``groupby`` re-shuffles its whole input EVERY round, but in
an iterative graph loop the edge table is STATIC — only messages should
move. This module keeps each edge shard resident in an actor for the
lifetime of the loop:

* **partition once**: every edge block is split into per-bucket
  sub-tables by the owner hash of ``src`` (one parallel task per block,
  ``stages.dedup_util.bucket_of`` — THE routing hash, so co-partition
  assumptions match every other bucketed stage); shard actor *b* pulls
  exactly its column of the ref matrix — total movement O(E), once.
* **rounds move refs, not rows**: each superstep, the driver hands
  actor *b* the refs of message tables addressed to it and receives
  K refs of outgoing message tables plus one scalar — the driver
  routes an O(K²) ref matrix and folds K scalars; no data ever lands
  on the driver.
* **results stream out**: the final per-node state is returned as a
  ``ray.data`` Dataset built from the actors' output refs, so a
  billion-node result is written, not collected.

Partitioning assumption (documented per the custom-operator rule): a
shard's edges + node state must fit one actor's heap — size
``n_buckets`` to the graph, not to the CPU count, for big graphs.

Round complexity: BFS settles in ``depth`` rounds, hash-min components
in ``diameter`` rounds — the same as the dataset machinery — but a
round costs two small RPC fan-outs instead of two full-table shuffles
(measured ~10× on the contract trade graphs).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from gridfia_ray.stages.dedup_util import bucket_of

_EMPTY_MSG = pa.table(
    {"node": pa.array([], pa.int64()), "val": pa.array([], pa.int64())}
)


def _bucket_ids(ids: np.ndarray, n_buckets: int) -> np.ndarray:
    return bucket_of(pd.DataFrame({"k": ids.astype(np.int64)}), ["k"], n_buckets)


@ray.remote
def _split_block(block: pa.Table, n_buckets: int, src: str, dst: str):
    """One edge block → K per-owner sub-tables (owner = src bucket).
    Invoked with ``options(num_returns=n_buckets)`` so each sub-table
    is its own driver-owned ref — the driver routes refs only; edge
    data never lands on it."""
    if isinstance(block, pd.DataFrame):
        # to_arrow_refs hands back pandas blocks unconverted when the
        # upstream stage ran batch_format="pandas"
        block = (
            pa.Table.from_pandas(block, preserve_index=False)
            if len(block)
            else pa.table({})
        )
    if block.num_rows == 0 or src not in block.column_names:
        # zero-row blocks from pandas stages arrive COLUMNLESS (the
        # known empty-block schema drop) — nothing to split
        z = np.zeros(0, np.int64)
        empty = (pa.table({"src": pa.array(z), "dst": pa.array(z)}), z)
        return [empty] * n_buckets if n_buckets > 1 else empty
    s = block[src].to_numpy(zero_copy_only=False).astype(np.int64)
    d = block[dst].to_numpy(zero_copy_only=False).astype(np.int64)
    if (s < 0).any() or (d < 0).any():
        raise ValueError("pregel: node ids must be non-negative int64")
    b = _bucket_ids(s, n_buckets)
    # a dst that never appears as a src (a SINK on a directed graph)
    # still needs an owner for its state: register every dst with its
    # hash-owner bucket alongside the src-partitioned edges
    du = np.unique(d)
    db = _bucket_ids(du, n_buckets)
    out = []
    for k in range(n_buckets):
        m = b == k
        out.append(
            (pa.table({"src": pa.array(s[m]), "dst": pa.array(d[m])}),
             du[db == k])
        )
    return out if n_buckets > 1 else out[0]


@ray.remote
class _GraphShard:
    """One bucket's edges + owned-node state, resident for the loop."""

    def __init__(self, edge_refs: list, n_buckets: int, bucket: int):
        parts = ray.get(list(edge_refs))
        tables = [t for t, _ in parts if t.num_rows]
        regs = [r for _, r in parts if r.size]
        if tables:
            src = np.concatenate(
                [t["src"].to_numpy(zero_copy_only=False) for t in tables]
            ).astype(np.int64)
            dst = np.concatenate(
                [t["dst"].to_numpy(zero_copy_only=False) for t in tables]
            ).astype(np.int64)
        else:
            src = np.zeros(0, np.int64)
            dst = np.zeros(0, np.int64)
        order = np.argsort(src, kind="stable")
        self.src = src[order]
        self.dst = dst[order]
        # owned = sources partitioned here (bucket(src) == bucket) plus
        # hash-owned sink registrations (dsts with no out-edges land on
        # their id's hash bucket so their state lives somewhere)
        self.nodes = np.unique(
            np.concatenate([self.src] + regs)
            if regs
            else self.src
        )
        self.n_buckets = n_buckets
        self.bucket = bucket
        self.state: np.ndarray | None = None

    # -- shared helpers ---------------------------------------------------

    def _out_edges_of(self, ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(srcs, dsts) of every out-edge whose src is in ``ids``."""
        lo = np.searchsorted(self.src, ids, side="left")
        hi = np.searchsorted(self.src, ids, side="right")
        counts = hi - lo
        total = int(counts.sum())
        if total == 0:
            return np.zeros(0, np.int64), np.zeros(0, np.int64)
        idx = np.repeat(lo, counts) + (
            np.arange(total) - np.repeat(np.cumsum(counts) - counts, counts)
        )
        return self.src[idx], self.dst[idx]

    def _route(self, nodes: np.ndarray, vals: np.ndarray) -> list:
        """Group (node, val) messages by target-owner bucket → K refs
        (None for empty targets, so idle shards cost nothing)."""
        out: list = [None] * self.n_buckets
        if nodes.size:
            tb = _bucket_ids(nodes, self.n_buckets)
            for k in np.unique(tb).tolist():
                m = tb == k
                out[k] = ray.put(
                    pa.table(
                        {"node": pa.array(nodes[m]), "val": pa.array(vals[m])}
                    )
                )
        return out

    @staticmethod
    def _fold_min(msg_refs: list) -> pd.DataFrame:
        tables = [t for t in ray.get([r for r in msg_refs if r is not None])]
        tables = [t for t in tables if t.num_rows]
        if not tables:
            return pd.DataFrame({"node": np.zeros(0, np.int64), "val": np.zeros(0, np.int64)})
        df = pa.concat_tables(tables).to_pandas()
        return df.groupby("node", as_index=False)["val"].min()

    # -- hash-min connected components ------------------------------------

    def cc_init(self) -> list:
        """labels ← min(node, out-neighbors); announce along edges."""
        if self.nodes.size == 0:
            self.state = np.zeros(0, np.int64)
            return [None] * self.n_buckets
        # labels start at the node id; sources additionally take their
        # min out-neighbor (aligned by position — owned nodes may
        # include hash-registered sinks with no out-edges)
        self.state = self.nodes.copy()
        if self.src.size:
            init = pd.DataFrame({"node": self.src, "val": self.dst}).groupby(
                "node", as_index=False
            )["val"].min()
            pos = np.searchsorted(self.nodes, init["node"].to_numpy(np.int64))
            self.state[pos] = np.minimum(
                self.state[pos], init["val"].to_numpy(np.int64)
            )
        srcs, dsts = self._out_edges_of(self.nodes)
        pos = np.searchsorted(self.nodes, srcs)
        return self._route(dsts, self.state[pos])

    def cc_step(self, msg_refs: list) -> tuple[int, list]:
        """min-merge incoming labels; announce only CHANGED nodes'
        labels along their out-edges. Returns (changed, routed refs)."""
        inc = self._fold_min(msg_refs)
        if not len(inc):
            return 0, [None] * self.n_buckets
        pos = np.searchsorted(self.nodes, inc["node"].to_numpy(np.int64))
        # every message targets an edge endpoint → owned here (mirrored
        # edges make every endpoint a src); a miss is a routing bug
        if (pos >= self.nodes.size).any() or (
            self.nodes[pos] != inc["node"].to_numpy(np.int64)
        ).any():
            raise AssertionError("pregel cc: message for a non-owned node")
        new = inc["val"].to_numpy(np.int64)
        improved = new < self.state[pos]
        if not improved.any():
            return 0, [None] * self.n_buckets
        upd_pos = pos[improved]
        self.state[upd_pos] = new[improved]
        changed_ids = self.nodes[upd_pos]
        srcs, dsts = self._out_edges_of(changed_ids)
        spos = np.searchsorted(self.nodes, srcs)
        return int(improved.sum()), self._route(dsts, self.state[spos])

    def cc_result(self) -> pa.Table:
        # returned by VALUE: a method return object is owned by the
        # caller (driver), so it survives the post-loop ray.kill — a
        # ray.put here would die with the actor
        return pa.table(
            {
                "node": pa.array(self.nodes),
                "component": pa.array(
                    self.state
                    if self.state is not None
                    else np.zeros(0, np.int64)
                ),
            }
        )

    # -- single-source BFS -------------------------------------------------

    def bfs_init(self, source: int) -> list:
        self.state = np.full(self.nodes.size, np.iinfo(np.int64).max, np.int64)
        pos = np.searchsorted(self.nodes, source)
        if pos < self.nodes.size and self.nodes[pos] == source:
            self.state[pos] = 0
            srcs, dsts = self._out_edges_of(np.asarray([source], np.int64))
            return self._route(dsts, np.ones(dsts.size, np.int64))
        return [None] * self.n_buckets

    def bfs_step(self, msg_refs: list, depth_cap: int | None) -> tuple[int, list]:
        inc = self._fold_min(msg_refs)
        if not len(inc):
            return 0, [None] * self.n_buckets
        node = inc["node"].to_numpy(np.int64)
        pos = np.searchsorted(self.nodes, node)
        owned = (pos < self.nodes.size) & (
            self.nodes[np.minimum(pos, self.nodes.size - 1)] == node
        )
        # a dst with no out-edge of its own is reachable but not owned
        # by any shard's src set ONLY on non-mirrored graphs; the
        # contract graphs are mirrored so every endpoint is owned —
        # non-owned sinks are collected nowhere and must not occur
        if not owned.all():
            raise AssertionError("pregel bfs: message for a non-owned node")
        new = inc["val"].to_numpy(np.int64)
        improved = new < self.state[pos]
        if not improved.any():
            return 0, [None] * self.n_buckets
        upd_pos = pos[improved]
        self.state[upd_pos] = new[improved]
        frontier = self.nodes[upd_pos]
        fr_dist = self.state[upd_pos]
        if depth_cap is not None:
            keep = fr_dist < depth_cap
            frontier, fr_dist = frontier[keep], fr_dist[keep]
        srcs, dsts = self._out_edges_of(frontier)
        spos = np.searchsorted(frontier, srcs)
        return int(improved.sum()), self._route(dsts, fr_dist[spos] + 1)

    # -- integer-exact PageRank --------------------------------------------

    def pr_init(self) -> int:
        """Per-owned-node out-degree; returns the local node count for
        the driver's global N fold."""
        lo = np.searchsorted(self.src, self.nodes, side="left")
        hi = np.searchsorted(self.src, self.nodes, side="right")
        self.deg = hi - lo
        return int(self.nodes.size)

    def _pr_route(self, ranks: np.ndarray, damping_pct: int) -> list:
        """Per-edge contribution (d·r_src)//(100·deg_src), pre-summed
        per dst locally before routing (the combiner: shard-to-shard
        volume is bounded by distinct dsts, not edges)."""
        pos = np.searchsorted(self.nodes, self.src)
        c = (damping_pct * ranks[pos]) // (100 * self.deg[pos])
        df = pd.DataFrame({"node": self.dst, "val": c}).groupby(
            "node", as_index=False
        )["val"].sum()
        return self._route(
            df["node"].to_numpy(np.int64), df["val"].to_numpy(np.int64)
        )

    def pr_first(self, init_r: int, damping_pct: int) -> list:
        if self.nodes.size == 0:
            return [None] * self.n_buckets
        ranks = np.full(self.nodes.size, np.int64(init_r))
        return self._pr_route(ranks, damping_pct)

    def _pr_fold(self, msg_refs: list) -> np.ndarray:
        tables = [t for t in ray.get([r for r in msg_refs if r is not None])
                  if t.num_rows]
        if tables:
            df = pa.concat_tables(tables).to_pandas().groupby(
                "node", as_index=False
            )["val"].sum()
            node = df["node"].to_numpy(np.int64)
            if self.nodes.size == 0:
                raise ValueError(
                    "pagerank: rank mass addressed to node(s) with no "
                    f"out-edges (e.g. {int(node[0])})"
                    " — mirror the graph or drop dangling nodes"
                )
            pos = np.searchsorted(self.nodes, node)
            pos_c = np.minimum(pos, self.nodes.size - 1)
            # dangling = mass sent to a node with no out-edges: either
            # unowned entirely, or a hash-registered SINK (deg == 0)
            dangling = (
                (pos >= self.nodes.size)
                | (self.nodes[pos_c] != node)
                | (self.deg[pos_c] == 0)
            )
            if dangling.any():
                raise ValueError(
                    "pagerank: rank mass addressed to node(s) with no "
                    f"out-edges (e.g. {int(node[dangling][0])})"
                    " — mirror the graph or drop dangling nodes"
                )
            sums = np.zeros(self.nodes.size, np.int64)
            sums[pos] = df["val"].to_numpy(np.int64)
            got = np.zeros(self.nodes.size, bool)
            got[pos] = True
        else:
            sums = np.zeros(self.nodes.size, np.int64)
            got = np.zeros(self.nodes.size, bool)
        if self.nodes.size and not got.all():
            raise ValueError(
                "pagerank: edge source received no rank mass — every "
                "node needs an in-edge (mirror the graph)"
            )
        return sums

    def pr_step(self, msg_refs: list, tele: int, damping_pct: int
                ) -> tuple[int, list]:
        sums = self._pr_fold(msg_refs)
        if self.nodes.size == 0:
            return 0, [None] * self.n_buckets
        return 1, self._pr_route(sums + np.int64(tele), damping_pct)

    def pr_result(self, msg_refs: list, tele: int) -> pa.Table:
        sums = self._pr_fold(msg_refs)
        return pa.table(
            {
                "node": pa.array(self.nodes),
                "rank_c": pa.array(sums + np.int64(tele)),
            }
        )

    def bfs_result(self) -> pa.Table:
        inf = np.iinfo(np.int64).max
        m = (
            self.state < inf
            if self.state is not None
            else np.zeros(0, bool)
        )
        return pa.table(
            {
                "node": pa.array(self.nodes[m]),
                "dist": pa.array(
                    self.state[m] if self.state is not None else []
                ),
            }
        )


class PregelGraph:
    """Shard-actor session over a static edge table (see module doc)."""

    def __init__(self, edges: rd.Dataset, n_buckets: int = 8,
                 src: str = "src", dst: str = "dst"):
        blocks = edges.materialize().to_arrow_refs()
        k = max(1, n_buckets)
        # num_returns=k → a REF matrix [block][bucket]; the driver only
        # routes refs, edge data moves worker→worker
        rows = [
            _split_block.options(num_returns=k if k > 1 else 1).remote(
                b, k, src, dst
            )
            for b in blocks
        ]
        if k == 1:
            rows = [[r] for r in rows]
        self.n_buckets = k
        self.actors = [
            _GraphShard.remote([row[b] for row in rows], k, b)
            for b in range(k)
        ]

    def close(self) -> None:
        for a in self.actors:
            ray.kill(a)
        self.actors = []

    def _loop(self, inits: list, step_name: str, max_iters: int,
              step_args: tuple = ()) -> None:
        # transpose: mailbox[target][sender]
        mail = [[row[b] for row in inits] for b in range(self.n_buckets)]
        for _ in range(max_iters):
            outs = ray.get(
                [
                    getattr(a, step_name).remote(mail[b], *step_args)
                    for b, a in enumerate(self.actors)
                ]
            )
            changed = sum(c for c, _ in outs)
            if changed == 0:
                return
            mail = [[outs[s][1][b] for s in range(self.n_buckets)]
                    for b in range(self.n_buckets)]
        raise RuntimeError(
            f"pregel: {step_name} did not settle in {max_iters} rounds"
        )

    def components(self, max_iters: int = 50) -> rd.Dataset:
        """(node, component) for every node with an edge (mirror edges
        for undirected semantics — same contract as
        ``dedup.docs.dup_clusters_distributed``)."""
        inits = ray.get([a.cc_init.remote() for a in self.actors])
        self._loop(inits, "cc_step", max_iters)
        refs = [a.cc_result.remote() for a in self.actors]
        ray.wait(refs, num_returns=len(refs))
        return rd.from_arrow_refs(refs)

    def pagerank(self, n_iters: int = 3, damping_pct: int = 85,
                 scale: int = 10**12) -> rd.Dataset:
        """Integer-exact PageRank, bit-matching the exchange
        implementation (pipelines/graph.pagerank) and its unrolled SQL
        oracle: r₀ = scale//N; message = (d·r)//(100·deg); rank =
        Σmessages + ((100−d)·scale)//(100·N). Requires every node to
        have both an out- and in-edge (mirror undirected graphs) — the
        dangling / no-mass validations raise identically."""
        if not (0 < damping_pct < 100):
            raise ValueError("pagerank: damping_pct must be in (0, 100)")
        if n_iters < 1:
            raise ValueError("pagerank: n_iters must be >= 1")
        counts = ray.get([a.pr_init.remote() for a in self.actors])
        n_nodes = sum(counts)
        if n_nodes == 0:
            raise ValueError("pagerank: empty edge table")
        init_r = scale // n_nodes
        tele = ((100 - damping_pct) * scale) // (100 * n_nodes)
        outs = ray.get(
            [a.pr_first.remote(init_r, damping_pct) for a in self.actors]
        )
        for _ in range(n_iters - 1):
            mail = [[row[b] for row in outs] for b in range(self.n_buckets)]
            stepped = ray.get(
                [
                    a.pr_step.remote(mail[b], tele, damping_pct)
                    for b, a in enumerate(self.actors)
                ]
            )
            outs = [s[1] for s in stepped]
        mail = [[row[b] for row in outs] for b in range(self.n_buckets)]
        refs = [
            a.pr_result.remote(mail[b], tele)
            for b, a in enumerate(self.actors)
        ]
        ray.wait(refs, num_returns=len(refs))
        return rd.from_arrow_refs(refs)

    def bfs(self, source: int, max_depth: int | None = None,
            max_iters: int = 10_000) -> rd.Dataset:
        """(node, dist) for reachable nodes (source at 0), optionally
        bounded to the ``max_depth``-hop neighborhood."""
        inits = ray.get([a.bfs_init.remote(int(source)) for a in self.actors])
        cap = None if max_depth is None else int(max_depth)
        if cap == 0:
            # the 0-hop neighborhood is just the source; init's dist-1
            # announcements must not be delivered
            inits = [[None] * self.n_buckets for _ in inits]
        self._loop(inits, "bfs_step", max_iters, (cap,))
        refs = [a.bfs_result.remote() for a in self.actors]
        ray.wait(refs, num_returns=len(refs))
        return rd.from_arrow_refs(refs)
