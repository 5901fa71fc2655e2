"""Iterative graph analytics over edge tables — PageRank (Brin & Page
1998) as the canonical "model state is itself a distributed table"
operator. The reference has no graph surface; this extends the engine's
relational family with the iterative-computation shape (frontier
exchanges, Pregel supersteps) that e.g. web-graph dedup weighting and
citation scoring need at corpus scale.

Exactness contract: ranks live in integer mass units (``scale`` total
mass, default 10^12). Every per-iteration contribution is
``(damping_pct · r) // (100 · outdeg)`` — int64 floor division — and
the teleport term ``((100 − damping_pct) · scale) // (100 · N)`` is a
constant integer, so each iteration is order-free int64 arithmetic:
bit-exact across partitionings and reproducible by an unrolled ANSI-SQL
oracle doing the identical divisions. (Floor division leaks ≤ 1 mass
unit per edge per iteration — at scale=10^12 a relative error ≤ 1e-6·E,
the price of a partition-order-proof fixpoint.)

Scale shape (10^9 nodes / 10^11 edges) — the Pregel superstep fused to
ONE exchange per iteration:

  * setup: one exchange buckets the edge table by src and computes each
    src's out-degree LOCALLY (all of a src's edges share its bucket);
    the result materializes once and is re-unioned into every
    superstep. N is the only scalar on the driver.
  * superstep i: the previous round's contribution rows (node, c) are
    co-bucketed with the edge rows on node == src; inside the bucket
    the rank r = teleport + Σc is summed, attached to the bucket's own
    edges, and the NEXT round's contribution rows (dst, c') are
    emitted — rank attach, edge join and message send in one shuffle.
    Round 1 needs no exchange at all (r₀ is a constant: a pure map
    over the edge table emits the first messages).
  * K iterations ⇒ K exchanges total (K−1 supersteps + one final
    per-node sum), vs 2K for the naive attach-then-aggregate schedule.
  * skew: a hot dst is one key in one bucket; contribution partials
    combine per batch before each exchange, so fan-in is O(blocks),
    not O(in-degree).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def degree_table(edges: rd.Dataset, src: str = "src") -> rd.Dataset:
    """(src, deg) — out-degree per node, one bucketed keyed sum."""
    from gridfia_ray.stages.agg_util import bucketed_agg

    def partial(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                src: batch[src],
                "one": pa.array(np.ones(batch.num_rows, np.int64)),
            }
        )

    return bucketed_agg(
        edges.map_batches(partial, batch_format="pyarrow"),
        [src],
        {"deg": ("one", "sum")},
        n_buckets=16,
    )


_ED_SCHEMA = pa.schema(
    [
        ("key", pa.int64()),   # src for edge rows; receiving node for msgs
        ("dst", pa.int64()),
        ("deg", pa.int64()),
        ("c", pa.int64()),     # message mass (msg rows only)
        ("first", pa.int64()),  # 1 on one edge row per src (node counting)
        ("__side", pa.string()),
    ]
)


def pagerank(
    edges: rd.Dataset,
    n_iters: int = 3,
    damping_pct: int = 85,
    scale: int = 10**12,
    src: str = "src",
    dst: str = "dst",
    n_buckets: int = 16,
) -> rd.Dataset:
    """Integer-exact PageRank on the shard-actor superstep path
    (stages/pregel): the edge table is partitioned once onto resident
    actors and each round exchanges only per-dst pre-summed
    contribution refs. Bit-identical to
    :func:`pagerank_exchange` (the dataset-machinery reference, kept
    and parity-tested) and to the unrolled SQL oracle — the per-edge
    floor divisions and int64 sums are the same expressions, and
    integer addition is order-independent. Same validation contract:
    every node needs an out- AND in-edge (mirror undirected graphs);
    dangling mass or massless sources raise."""
    from gridfia_ray.stages.pregel import PregelGraph

    if not (0 < damping_pct < 100):
        raise ValueError("pagerank: damping_pct must be in (0, 100)")
    if n_iters < 1:
        raise ValueError("pagerank: n_iters must be >= 1")
    g = PregelGraph(edges, n_buckets=min(n_buckets, 8), src=src, dst=dst)
    try:
        return g.pagerank(
            n_iters=n_iters, damping_pct=damping_pct, scale=scale
        ).materialize()
    finally:
        g.close()


def pagerank_exchange(
    edges: rd.Dataset,
    n_iters: int = 3,
    damping_pct: int = 85,
    scale: int = 10**12,
    src: str = "src",
    dst: str = "dst",
    n_buckets: int = 16,
) -> rd.Dataset:
    """Integer-exact PageRank over a distinct directed edge table.

    Every participating node must have both an out-edge and an in-edge
    (mirror the edges for an undirected graph): a dangling node would
    silently drop its mass and a source-only node would lose its rank
    row between supersteps — both raise inside the superstep instead of
    corrupting the fixpoint. (With ``n_iters=1`` no superstep runs, so
    neither validation fires — the single-round result is still exact
    for conforming graphs.) Returns (node, rank_c)."""
    from gridfia_ray.stages.agg_util import bucketed_agg, bucketed_bucket_map

    if not (0 < damping_pct < 100):
        raise ValueError("pagerank: damping_pct must be in (0, 100)")
    if n_iters < 1:
        raise ValueError("pagerank: n_iters must be >= 1")

    def edge_rows(batch: pa.Table) -> pa.Table:
        # integer sentinels, NOT nulls, for the other side's columns: a
        # nullable int64 column round-trips arrow→pandas as float64 in
        # the bucket consumer, silently corrupting ids/values ≥ 2^53
        n = batch.num_rows
        zeros = pa.array(np.zeros(n, np.int64))
        return pa.table(
            {
                "key": batch[src],
                "dst": batch[dst],
                "deg": zeros,
                "c": zeros,
                "first": zeros,
                "__side": pa.array(["e"] * n, pa.string()),
            },
            schema=_ED_SCHEMA,
        )

    def bucket_deg(g: pd.DataFrame) -> pd.DataFrame:
        # all edges of a src share its bucket: out-degree is local
        out = g[["key", "dst"]].copy()
        out["deg"] = g.groupby("key")["key"].transform("size").astype(np.int64)
        out["c"] = np.int64(0)
        out["first"] = (~g["key"].duplicated()).astype(np.int64)
        out["__side"] = "e"
        return out[["key", "dst", "deg", "c", "first", "__side"]]

    ed = bucketed_bucket_map(
        edges.map_batches(edge_rows, batch_format="pyarrow"),
        ["key"],
        bucket_deg,
        n_buckets=n_buckets,
        out_schema=_ED_SCHEMA,
    ).materialize()  # one setup exchange; re-unioned into every superstep

    n_nodes = int(ed.sum("first") or 0)
    if n_nodes == 0:
        raise ValueError("pagerank: empty edge table")
    init_r = scale // n_nodes
    tele = ((100 - damping_pct) * scale) // (100 * n_nodes)

    def first_msgs(batch: pa.Table) -> pa.Table:
        # r0 is the constant scale//N: superstep 1 is a pure map
        deg = batch["deg"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = (damping_pct * np.int64(init_r)) // (100 * deg)
        df = pd.DataFrame(
            {"key": batch["dst"].to_numpy(zero_copy_only=False), "c": c}
        ).groupby("key", as_index=False)["c"].sum()
        return pa.table(
            {
                "key": pa.array(df["key"].to_numpy(np.int64)),
                "c": pa.array(df["c"].to_numpy(np.int64)),
            }
        )

    msgs = ed.map_batches(first_msgs, batch_format="pyarrow")

    def superstep(g: pd.DataFrame) -> pd.DataFrame:
        m = g[g["__side"] == "m"]
        e = g[g["__side"] == "e"]
        # a node's messages AND its out-edges share its bucket, so this
        # per-bucket subset check is exact: ANY message key without an
        # edge row is a dangling node, whether or not the bucket holds
        # other nodes' edges (a len(e)==0-only guard misses collisions)
        if len(m) > 0:
            dangling = ~m["key"].isin(e["key"])
            if dangling.any():
                raise ValueError(
                    "pagerank: rank mass addressed to node(s) with no "
                    f"out-edges (e.g. {int(m.loc[dangling, 'key'].iloc[0])})"
                    " — mirror the graph or drop dangling nodes"
                )
        if len(e) == 0:
            return pd.DataFrame(
                {"key": pd.Series(dtype=np.int64), "c": pd.Series(dtype=np.int64)}
            )
        r = m.groupby("key")["c"].sum().astype(np.int64) + tele
        rr = r.reindex(e["key"])
        if rr.isna().any():
            raise ValueError(
                "pagerank: edge source received no rank mass — every "
                "node needs an in-edge (mirror the graph)"
            )
        c = (damping_pct * rr.to_numpy(np.int64)) // (
            100 * e["deg"].to_numpy(np.int64)
        )
        out = pd.DataFrame({"key": e["dst"].to_numpy(np.int64), "c": c})
        return out.groupby("key", as_index=False)["c"].sum()

    msg_schema = pa.schema([("key", pa.int64()), ("c", pa.int64())])

    def tag_msgs(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        zeros = pa.array(np.zeros(n, np.int64))
        return pa.table(
            {
                "key": batch["key"],
                "dst": zeros,
                "deg": zeros,
                "c": batch["c"],
                "first": zeros,
                "__side": pa.array(["m"] * n, pa.string()),
            },
            schema=_ED_SCHEMA,
        )

    for _ in range(n_iters - 1):
        tagged = msgs.map_batches(tag_msgs, batch_format="pyarrow").union(ed)
        msgs = bucketed_bucket_map(
            tagged, ["key"], superstep, n_buckets=n_buckets, out_schema=msg_schema
        )

    # final per-node sum (messages from the last superstep) + teleport
    final = bucketed_agg(msgs, ["key"], {"c": ("c", "sum")}, n_buckets=n_buckets)

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": batch["key"],
                "rank_c": pa.array(
                    batch["c"].to_numpy(zero_copy_only=False).astype(np.int64)
                    + tele,
                    pa.int64(),
                ),
            }
        )

    return final.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Single-source BFS (shortest hop counts) — the frontier-superstep twin
# of PageRank's fixed-iteration shape: iterations are DATA-DEPENDENT
# (until the frontier drains), with the driver holding only the loop
# counter and the frontier count (the classic k-means/Lloyd control
# shape: distributed state, scalar driver decisions).
# ---------------------------------------------------------------------------

_BFS_EDGE_SCHEMA = pa.schema(
    [
        ("key", pa.int64()),   # src for edge rows / node for frontier rows
        ("dst", pa.int64()),
        ("dist", pa.int64()),
        ("__side", pa.string()),  # 'e' edge | 'f' frontier
    ]
)

_BFS_STATE_SCHEMA = pa.schema(
    [
        ("key", pa.int64()),
        ("dist", pa.int64()),
        ("__side", pa.string()),  # 'p' proposal | 'k' known
    ]
)


def bfs_distances(
    edges: rd.Dataset,
    source: int,
    src: str = "src",
    dst: str = "dst",
    n_buckets: int = 16,
    max_iters: int = 10_000,
    max_depth: int | None = None,
) -> rd.Dataset:
    """Hop distances from ``source`` — the shard-actor superstep path
    (stages/pregel): edges are partitioned ONCE onto resident actors
    and each round moves only frontier-message refs, vs the exchange
    path's two full-table shuffles per round (~10× on the contract
    trade graph). Requires every reachable node to appear as a ``src``
    (mirror the edges for undirected semantics — the same contract as
    :func:`bfs_distances_exchange`, which is kept as the
    shuffle-machinery reference implementation and parity-tested)."""
    from gridfia_ray.stages.pregel import PregelGraph

    g = PregelGraph(edges, n_buckets=min(n_buckets, 8), src=src, dst=dst)
    try:
        return g.bfs(source, max_depth=max_depth, max_iters=max_iters).materialize()
    finally:
        g.close()


def bfs_distances_exchange(
    edges: rd.Dataset,
    source: int,
    src: str = "src",
    dst: str = "dst",
    n_buckets: int = 16,
    max_iters: int = 10_000,
    max_depth: int | None = None,
) -> rd.Dataset:
    """Hop distances from ``source`` over a directed edge table —
    (node, dist) for every REACHABLE node (the source itself at 0), or
    for the ``max_depth``-hop neighborhood when a depth bound is given
    (the graph-feature-engineering shape: each bounded round still
    proves the frontier machinery, without paying diameter rounds).

    Two exchanges per round. EXPAND: the frontier co-buckets with the
    edge rows on node == src and proposes every out-neighbor at
    dist+1 (per-bucket min dedup — a bucket holds ALL of its frontier
    nodes' out-edges). SETTLE: proposals co-bucket with the known set
    on the proposed node; per bucket, the minimum proposal per node
    survives and anything already known is dropped — the bucket holds
    ALL known rows for its nodes, so the anti-join is exact (a
    single-exchange variant that filtered against only the expand
    bucket's local known set would re-admit nodes discovered in other
    buckets with inflated distances). The round's output is exactly
    the next frontier; the driver sees one scalar per round (its
    count) and stops at zero. The known set is an accumulating union —
    no exchange ever rewrites it."""
    from gridfia_ray.stages.agg_util import bucketed_bucket_map

    if max_iters < 1:
        raise ValueError("bfs_distances: max_iters must be >= 1")

    def edge_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "key": batch[src],
                "dst": batch[dst],
                # sentinel, not null: nullable int64 degrades to
                # float64 in the pandas bucket consumer (bad ≥ 2^53)
                "dist": pa.array(np.full(n, -1, np.int64)),
                "__side": pa.array(["e"] * n, pa.string()),
            },
            schema=_BFS_EDGE_SCHEMA,
        )

    ed = edges.map_batches(edge_rows, batch_format="pyarrow").materialize()

    def as_state(ds: rd.Dataset, side: str, schema: pa.Schema) -> rd.Dataset:
        def fn(batch: pa.Table) -> pa.Table:
            cols = {
                "key": batch["node"],
                "dist": batch["dist"],
                "__side": pa.array([side] * batch.num_rows, pa.string()),
            }
            if "dst" in schema.names:
                cols = {
                    "key": batch["node"],
                    "dst": pa.array(np.full(batch.num_rows, -1, np.int64)),
                    "dist": batch["dist"],
                    "__side": cols["__side"],
                }
            return pa.table(cols, schema=schema)

        return ds.map_batches(fn, batch_format="pyarrow")

    nd_schema = pa.schema([("node", pa.int64()), ("dist", pa.int64())])

    def expand(g: pd.DataFrame) -> pd.DataFrame:
        e = g[g["__side"] == "e"]
        f = g[g["__side"] == "f"]
        if len(f) == 0 or len(e) == 0:
            return pd.DataFrame(
                {"node": pd.Series(dtype=np.int64), "dist": pd.Series(dtype=np.int64)}
            )
        fd = dict(zip(f["key"].to_numpy(np.int64), f["dist"].to_numpy(np.int64)))
        hit = e[e["key"].isin(fd)]
        prop = pd.DataFrame(
            {
                "node": hit["dst"].to_numpy(np.int64),
                "dist": hit["key"].map(fd).to_numpy(np.int64) + 1,
            }
        )
        return prop.groupby("node", as_index=False)["dist"].min()

    def settle(g: pd.DataFrame) -> pd.DataFrame:
        p = g[g["__side"] == "p"]
        if len(p) == 0:
            return pd.DataFrame(
                {"node": pd.Series(dtype=np.int64), "dist": pd.Series(dtype=np.int64)}
            )
        known = set(g.loc[g["__side"] == "k", "key"].to_numpy(np.int64))
        m = p.groupby("key", as_index=False)["dist"].min()
        m = m[~m["key"].isin(known)]
        return pd.DataFrame(
            {"node": m["key"].to_numpy(np.int64), "dist": m["dist"].to_numpy(np.int64)}
        )

    seed = rd.from_arrow(
        pa.table(
            {"node": pa.array([int(source)], pa.int64()),
             "dist": pa.array([0], pa.int64())}
        )
    )
    frontier = seed
    known = seed  # accumulating union of (node, dist) datasets
    parts: list[rd.Dataset] = [seed]

    depth = 0
    for _ in range(max_iters):
        if max_depth is not None and depth >= max_depth:
            break
        tagged = as_state(frontier, "f", _BFS_EDGE_SCHEMA).union(ed)
        proposals = bucketed_bucket_map(
            tagged, ["key"], expand, n_buckets=n_buckets, out_schema=nd_schema
        )
        nxt = bucketed_bucket_map(
            as_state(proposals, "p", _BFS_STATE_SCHEMA).union(
                as_state(known, "k", _BFS_STATE_SCHEMA)
            ),
            ["key"],
            settle,
            n_buckets=n_buckets,
            out_schema=nd_schema,
        ).materialize()
        if int(nxt.count()) == 0:
            break
        frontier = nxt
        known = known.union(nxt)
        parts.append(nxt)
        depth += 1
    else:
        raise ValueError("bfs_distances: max_iters exceeded before convergence")

    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


# ---------------------------------------------------------------------------
# Triangle counting — degree-oriented node-iterator (Schank & Wagner
# 2005; the MapReduce form is Suri & Vassilvitskii 2011). Orientation by
# (degree, id) is THE skew defense: every edge points from the
# lower-degree endpoint to the higher, so a hub's Θ(deg²) wedge
# explosion becomes Σ outdeg² with outdeg = O(√m) on any graph — the
# canonical example of handling power-law skew by restructuring the
# computation instead of salting it.
# ---------------------------------------------------------------------------


def triangle_count(
    edges: rd.Dataset, u: str = "u", v: str = "v", n_buckets: int = 16
) -> int:
    """Exact global triangle count over a DISTINCT canonical undirected
    edge table (u < v per row). Five keyed exchanges, all
    Arrow/pandas-vectorized per bucket:

      1. degree: endpoints explode, one bucketed sum.
      2. attach: exploded edge rows co-bucket with degree rows on the
         endpoint; each row picks up its endpoint's degree.
      3. orient: rows co-bucket on the (u, v) pair; each edge re-joins
         its two degree-carrying halves and points from the smaller
         (deg, id) endpoint to the larger, KEEPING both degrees.
      4. wedges: oriented edges co-bucket on src; every out-neighbor
         pair becomes a wedge keyed in the CLOSING edge's own
         orientation (degrees carried from step 3 — the bucket never
         needs remote state).
      5. close: wedges co-bucket with oriented edges on (src, dst);
         matches count per bucket, one scalar sum to the driver.
    """
    from gridfia_ray.stages.agg_util import bucketed_agg, bucketed_bucket_map

    def explode(batch: pa.Table) -> pa.Table:
        uu = batch[u].to_numpy(zero_copy_only=False).astype(np.int64)
        vv = batch[v].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "node": pa.array(np.concatenate([uu, vv])),
                "one": pa.array(np.ones(2 * len(uu), np.int64)),
            }
        )

    deg = bucketed_agg(
        edges.map_batches(explode, batch_format="pyarrow"),
        ["node"],
        {"deg": ("one", "sum")},
        n_buckets=n_buckets,
    )

    half_schema = pa.schema(
        [("key", pa.int64()), ("eu", pa.int64()), ("ev", pa.int64()),
         ("deg", pa.int64()), ("__side", pa.string())]
    )

    def halves(batch: pa.Table) -> pa.Table:
        uu = batch[u].to_numpy(zero_copy_only=False).astype(np.int64)
        vv = batch[v].to_numpy(zero_copy_only=False).astype(np.int64)
        if (uu >= vv).any():
            # canonical u < v is load-bearing: a mirrored duplicate
            # (v, u) would orient to the same directed edge and double-
            # count every triangle through it, silently
            raise ValueError(
                "triangle_count: edge table is not distinct canonical "
                "(needs u < v per row)"
            )
        n = len(uu)
        return pa.table(
            {
                "key": pa.array(np.concatenate([uu, vv])),
                "eu": pa.array(np.concatenate([uu, uu])),
                "ev": pa.array(np.concatenate([vv, vv])),
                "deg": pa.array(np.full(2 * n, -1, np.int64)),
                "__side": pa.array(["h"] * (2 * n), pa.string()),
            },
            schema=half_schema,
        )

    def deg_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "key": batch["node"],
                "eu": pa.array(np.full(n, -1, np.int64)),
                "ev": pa.array(np.full(n, -1, np.int64)),
                "deg": batch["deg"],
                "__side": pa.array(["d"] * n, pa.string()),
            },
            schema=half_schema,
        )

    def attach_deg(g: pd.DataFrame) -> pd.DataFrame:
        h = g[g["__side"] == "h"]
        d = g[g["__side"] == "d"]
        if len(h) == 0:
            return pd.DataFrame(
                {c: pd.Series(dtype=np.int64) for c in ("eu", "ev", "key", "deg")}
            )
        lut = pd.Series(
            d["deg"].to_numpy(np.int64), index=d["key"].to_numpy(np.int64)
        )
        degs = lut.reindex(h["key"].to_numpy(np.int64))
        if degs.isna().any():
            raise ValueError(
                "triangle_count: endpoint missing from the degree table "
                "(edge and degree exchanges disagree)"
            )
        return pd.DataFrame(
            {
                "eu": h["eu"].to_numpy(np.int64),
                "ev": h["ev"].to_numpy(np.int64),
                "key": h["key"].to_numpy(np.int64),
                "deg": degs.to_numpy(np.int64),
            }
        )

    half_out = pa.schema(
        [("eu", pa.int64()), ("ev", pa.int64()), ("key", pa.int64()), ("deg", pa.int64())]
    )
    with_deg = bucketed_bucket_map(
        edges.map_batches(halves, batch_format="pyarrow").union(
            deg.map_batches(deg_rows, batch_format="pyarrow")
        ),
        ["key"],
        attach_deg,
        n_buckets=n_buckets,
        out_schema=half_out,
    )

    def orient(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {c: pd.Series(dtype=np.int64)
                 for c in ("src", "dst", "deg_src", "deg_dst")}
            )
        # each edge re-joins its two degree-carrying halves positionally
        gg = g.sort_values(["eu", "ev", "key"], kind="mergesort")
        eu = gg["eu"].to_numpy(np.int64)[::2]
        ev = gg["ev"].to_numpy(np.int64)[::2]
        k0 = gg["key"].to_numpy(np.int64)
        d0 = gg["deg"].to_numpy(np.int64)
        if len(gg) % 2 or not (
            ((k0[::2] == eu) & (k0[1::2] == ev))
            | ((k0[::2] == ev) & (k0[1::2] == eu))
        ).all():
            raise ValueError("triangle_count: edge table is not distinct canonical")
        du = np.where(k0[::2] == eu, d0[::2], d0[1::2])
        dv = np.where(k0[1::2] == ev, d0[1::2], d0[::2])
        u_first = (du < dv) | ((du == dv) & (eu < ev))
        return pd.DataFrame(
            {
                "src": np.where(u_first, eu, ev),
                "dst": np.where(u_first, ev, eu),
                "deg_src": np.where(u_first, du, dv),
                "deg_dst": np.where(u_first, dv, du),
            }
        )

    or_schema = pa.schema(
        [("src", pa.int64()), ("dst", pa.int64()),
         ("deg_src", pa.int64()), ("deg_dst", pa.int64())]
    )
    oriented = bucketed_bucket_map(
        with_deg, ["eu", "ev"], orient, n_buckets=n_buckets, out_schema=or_schema
    ).materialize()

    wedge_schema = pa.schema(
        [("src", pa.int64()), ("dst", pa.int64()), ("n", pa.int64()),
         ("__side", pa.string())]
    )

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, grp in g.groupby("src", sort=False):
            nb = grp[["dst", "deg_dst"]].to_numpy()
            if len(nb) < 2:
                continue
            # order out-neighbors by the closing edge's own orientation
            order = np.lexsort((nb[:, 0], nb[:, 1]))
            nb = nb[order]
            ii, jj = np.triu_indices(len(nb), k=1)
            outs.append(
                pd.DataFrame(
                    {"src": nb[ii, 0].astype(np.int64),
                     "dst": nb[jj, 0].astype(np.int64)}
                )
            )
        if not outs:
            return pd.DataFrame(
                {"src": pd.Series(dtype=np.int64), "dst": pd.Series(dtype=np.int64),
                 "n": pd.Series(dtype=np.int64), "__side": pd.Series(dtype=str)}
            )
        out = pd.concat(outs, ignore_index=True)
        out = out.groupby(["src", "dst"], as_index=False).size().rename(
            columns={"size": "n"}
        )
        out["n"] = out["n"].astype(np.int64)
        out["__side"] = "w"
        return out

    wedge_rows = bucketed_bucket_map(
        oriented, ["src"], wedges, n_buckets=n_buckets, out_schema=wedge_schema
    )

    def edge_tag(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "src": batch["src"],
                "dst": batch["dst"],
                "n": pa.array(np.zeros(n, np.int64)),
                "__side": pa.array(["e"] * n, pa.string()),
            },
            schema=wedge_schema,
        )

    def close(g: pd.DataFrame) -> pd.DataFrame:
        w = g[g["__side"] == "w"]
        e = g[g["__side"] == "e"]
        if len(w) == 0 or len(e) == 0:
            return pd.DataFrame({"n_tri": pd.Series(dtype=np.int64)})
        eset = e[["src", "dst"]].merge(w, on=["src", "dst"])
        return pd.DataFrame({"n_tri": [np.int64(eset["n"].sum())]})

    counts = bucketed_bucket_map(
        wedge_rows.union(oriented.map_batches(edge_tag, batch_format="pyarrow")),
        ["src", "dst"],
        close,
        n_buckets=n_buckets,
        out_schema=pa.schema([("n_tri", pa.int64())]),
    )
    return int(counts.sum("n_tri") or 0)


def connected_components(
    edges: rd.Dataset,
    src: str = "src",
    dst: str = "dst",
    n_buckets: int = 64,
    max_iters: int = 50,
) -> rd.Dataset:
    """Weakly connected components over an edge table — (node,
    component) for every node with at least one edge, component = the
    minimum node id of its component.

    Runs the shard-actor hash-min superstep (stages/pregel): the
    mirrored edge table is partitioned ONCE onto resident actors and
    each round moves only changed-label message refs — vs two
    full-table shuffles per round on the exchange path
    (:func:`gridfia_ray.dedup.docs.dup_clusters_distributed`, which
    remains the dataset-machinery implementation used by the document
    dedup surface and as the parity reference). Edge direction is
    ignored (edges are mirrored here); node ids must be non-negative
    int64. Raises rather than returning unconverged labels when the
    graph diameter exceeds ``max_iters``."""
    from gridfia_ray.stages.pregel import PregelGraph

    mirrored = edges.map_batches(
        lambda b, s=src, d=dst: pd.DataFrame(
            {
                "src": np.concatenate(
                    [b[s].to_numpy(np.int64), b[d].to_numpy(np.int64)]
                ),
                "dst": np.concatenate(
                    [b[d].to_numpy(np.int64), b[s].to_numpy(np.int64)]
                ),
            }
        ),
        batch_format="pandas",
    )
    g = PregelGraph(mirrored, n_buckets=min(n_buckets, 8))
    try:
        return g.components(max_iters=max_iters).materialize()
    finally:
        g.close()
