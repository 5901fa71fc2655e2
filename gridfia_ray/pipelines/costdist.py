"""Cost distance (ArcGIS CostDistance / GRASS r.cost analogue): per
pixel the minimum ACCUMULATED traversal cost to reach any source pixel
over the 8-connected grid, where stepping between adjacent pixels a→b
costs ``3·(c(a)+c(b))`` orthogonally and ``4·(c(a)+c(b))`` diagonally —
the classic Borgefors chamfer-3/4 integer weighting (≈ the Euclidean
·(c(a)+c(b))/2 link cost scaled by 6), kept entirely in int64 so a
sequential Dijkstra replay matches bit for bit.

Distributed shape — the BFS/flow-accumulation superstep family:

* state = one row per tile carrying the int64 cost and best-dist
  buffers; sources (µ-value > threshold) start at 0, everything else
  at ``_INF``.
* each superstep is ONE keyed exchange: every tile's 1-px border
  strips (dist + cost) ship to its 8 neighbors, tiles co-bucket with
  their incoming strips, and a vectorized tile-local solve relaxes to
  the tile's fixpoint given the frozen halo:
    - vertical/diagonal propagation row-by-row (vectorized across the
      row), and the within-row weighted propagation as an exact
      min-plus scan: d_LR = P + min.accumulate(d − P) with P the
      prefix sum of step weights — the scan unrolls to
      min_{x'≤x}(d[x'] + P[x] − P[x']), the true sequential recursion;
    - forward/backward sweeps alternate until the tile is stable.
  Halo cells are READ-ONLY sources: their values are restored after
  every row update, so no path is ever cached THROUGH a halo cell
  (paths that exit and re-enter a tile are discovered over successive
  supersteps instead — asynchronous Bellman-Ford, monotone and exact
  at the fixpoint).
* the driver holds one integer per round (the changed-tile count);
  convergence in O(tile-graph diameter) rounds, the same bound as the
  flow/BFS supersteps.

Scale note: state is O(raster), strips are O(perimeter), and every
round is one bucketed exchange — no broadcast, no driver fold. Skewed
cost fields only affect round COUNT (long geodesics), not exchange
volume.

No counterpart in the GridFIA reference; this is the standard raster-
engine companion to the proximity family (SURVEY §2.4), and the
weighted generalization of ``pipelines/distance``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

#: unreachable sentinel. Real accumulated costs stay far below:
#: path ≤ 2·10⁶ steps × weight ≤ 8·(10⁹+10⁹) < 2⁵⁴.
_INF = np.int64(1) << 60

_W_ORTH = np.int64(3)
_W_DIAG = np.int64(4)

_STATE = pa.schema(
    [
        ("metric", pa.string()),
        ("tile_row", pa.int64()),
        ("tile_col", pa.int64()),
        ("h", pa.int64()),
        ("w", pa.int64()),
        ("y0", pa.int64()),  # global pixel offset of the tile's origin
        ("x0", pa.int64()),
        ("kind", pa.int64()),  # 0 = tile, 1 = border strip
        ("side", pa.int64()),  # strip placement (receiver view), -1 for tiles
        ("cost", pa.binary()),
        ("dist", pa.binary()),
        ("changed", pa.int64()),
    ]
)

_OUT = pa.schema(
    [("metric", pa.string()), ("y", pa.int64()), ("x", pa.int64()),
     ("cdist", pa.int64())]
)


def _minplus_row(d: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Exact left-to-right weighted relaxation along one row: step into
    x from x−1 costs 3·(c[x−1]+c[x])."""
    s = np.zeros_like(c)
    s[1:] = _W_ORTH * (c[:-1] + c[1:])
    P = np.cumsum(s)
    return np.minimum(d, P + np.minimum.accumulate(d - P))


def _local_solve(dist_p: np.ndarray, cost_p: np.ndarray) -> None:
    """Relax the PADDED dist array in place to the tile-local fixpoint.
    Interior rows/cols are 1..h, 1..w; the halo ring is read-only."""
    H, W = dist_p.shape
    halo_l = dist_p[:, 0].copy()
    halo_r = dist_p[:, -1].copy()

    def sweep(rows, off) -> bool:
        changed = False
        for y in rows:
            prev_d, prev_c = dist_p[y + off], cost_p[y + off]
            row_c = cost_p[y]
            cand = prev_d + _W_ORTH * (prev_c + row_c)
            diag = np.full(W, _INF, np.int64)
            diag[1:] = prev_d[:-1] + _W_DIAG * (prev_c[:-1] + row_c[1:])
            np.minimum(cand, diag, out=cand)
            diag[:] = _INF
            diag[:-1] = prev_d[1:] + _W_DIAG * (prev_c[1:] + row_c[:-1])
            np.minimum(cand, diag, out=cand)
            new = np.minimum(dist_p[y], cand)
            new = _minplus_row(new, row_c)
            new = _minplus_row(new[::-1], row_c[::-1])[::-1]
            # halo columns are read-only sources, never caches
            new[0] = halo_l[y]
            new[-1] = halo_r[y]
            if not changed and (new < dist_p[y]).any():
                changed = True
            dist_p[y] = new
        return changed

    limit = 4 * (H + W) + 16
    for _ in range(limit):
        ch = sweep(range(1, H - 1), -1)
        ch |= sweep(range(H - 2, 0, -1), +1)
        if not ch:
            return
    raise RuntimeError("cost_distance: tile-local solve did not converge")


def _strip_rows(r: pd.Series) -> list[dict]:
    h, w = int(r["h"]), int(r["w"])
    dist = np.frombuffer(r["dist"], np.int64).reshape(h, w)
    cost = np.frombuffer(r["cost"], np.int64).reshape(h, w)
    out = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            dtr, dtc = int(r["tile_row"]) + dy, int(r["tile_col"]) + dx
            if dtr < 0 or dtc < 0:
                continue
            ys = {-1: slice(0, 1), 0: slice(0, h), 1: slice(h - 1, h)}[dy]
            xs = {-1: slice(0, 1), 0: slice(0, w), 1: slice(w - 1, w)}[dx]
            out.append(
                {
                    "metric": r["metric"],
                    "tile_row": dtr,
                    "tile_col": dtc,
                    "h": 0,
                    "w": 0,
                    "y0": 0,
                    "x0": 0,
                    "kind": 1,
                    # placement from the receiver's perspective
                    "side": (-dy + 1) * 3 + (-dx + 1),
                    "cost": cost[ys, xs].tobytes(),
                    "dist": dist[ys, xs].tobytes(),
                    "changed": 0,
                }
            )
    return out


def _place(pad: np.ndarray, side: int, vals: np.ndarray) -> None:
    h, w = pad.shape[0] - 2, pad.shape[1] - 2
    dy, dx = side // 3 - 1, side % 3 - 1
    yy = {-1: slice(0, 1), 0: slice(1, h + 1), 1: slice(h + 1, h + 2)}[dy]
    xx = {-1: slice(0, 1), 0: slice(1, w + 1), 1: slice(w + 1, w + 2)}[dx]
    ny = 1 if dy else h
    nx = 1 if dx else w
    pad[yy, xx] = vals.reshape(ny, nx)


def _padded_from_group(group: pd.DataFrame):
    """(tile_row_series, h, w, dist_p, cost_p) for a (tile + strips)
    group, or None when no tile lives at these coordinates."""
    tiles = group[group["kind"] == 0]
    if len(tiles) == 0:  # strips aimed past the raster edge
        return None
    r = tiles.iloc[0]
    h, w = int(r["h"]), int(r["w"])
    dist = np.frombuffer(r["dist"], np.int64).reshape(h, w)
    cost = np.frombuffer(r["cost"], np.int64).reshape(h, w)
    dist_p = np.full((h + 2, w + 2), _INF, np.int64)
    cost_p = np.zeros((h + 2, w + 2), np.int64)
    dist_p[1:-1, 1:-1] = dist
    cost_p[1:-1, 1:-1] = cost
    for _, s in group[group["kind"] == 1].iterrows():
        _place(dist_p, int(s["side"]), np.frombuffer(s["dist"], np.int64))
        _place(cost_p, int(s["side"]), np.frombuffer(s["cost"], np.int64))
    return r, h, w, dist, dist_p, cost_p


def _solve_group(group: pd.DataFrame) -> pd.DataFrame:
    padded = _padded_from_group(group)
    if padded is None:
        return pd.DataFrame({f.name: [] for f in _STATE})
    r, h, w, dist, dist_p, cost_p = padded
    _local_solve(dist_p, cost_p)
    new = dist_p[1:-1, 1:-1]
    return pd.DataFrame(
        [
            {
                "metric": r["metric"],
                "tile_row": int(r["tile_row"]),
                "tile_col": int(r["tile_col"]),
                "h": h,
                "w": w,
                "y0": int(r["y0"]),
                "x0": int(r["x0"]),
                "kind": 0,
                "side": -1,
                "cost": r["cost"],
                "dist": new.tobytes(),
                "changed": int((new != dist).any()),
            }
        ]
    )


def _coarsen_state(state: rd.Dataset, factor: int, n_buckets: int) -> rd.Dataset:
    """Merge ``factor``×``factor`` tile blocks into super-tiles (ONE
    keyed exchange). Convergence rounds scale with the TILE-graph
    diameter, so coarsening divides the round count by ``factor`` at
    the price of ``factor``²-larger per-task solves — the knob that
    trades superstep latency against task memory/parallelism."""
    from gridfia_ray.stages.agg_util import bucketed_group_map

    def key(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["__sr"] = batch["tile_row"] // factor
        batch["__sc"] = batch["tile_col"] // factor
        return batch

    def assemble(group: pd.DataFrame) -> pd.DataFrame:
        y0 = int(group["y0"].min())
        x0 = int(group["x0"].min())
        H = int((group["y0"] - y0 + group["h"]).max())
        W = int((group["x0"] - x0 + group["w"]).max())
        cost = np.zeros((H, W), np.int64)
        dist = np.full((H, W), _INF, np.int64)
        covered = np.zeros((H, W), bool)
        for _, r in group.iterrows():
            oy, ox = int(r["y0"]) - y0, int(r["x0"]) - x0
            h, w = int(r["h"]), int(r["w"])
            cost[oy:oy + h, ox:ox + w] = np.frombuffer(r["cost"], np.int64).reshape(h, w)
            dist[oy:oy + h, ox:ox + w] = np.frombuffer(r["dist"], np.int64).reshape(h, w)
            covered[oy:oy + h, ox:ox + w] = True
        if not covered.all():
            raise ValueError(
                "cost_distance: coarsen block is not a full rectangle "
                "(sparse or non-contiguous tile set)"
            )
        return pd.DataFrame(
            [
                {
                    "metric": group["metric"].iloc[0],
                    "tile_row": int(group["__sr"].iloc[0]),
                    "tile_col": int(group["__sc"].iloc[0]),
                    "h": H,
                    "w": W,
                    "y0": y0,
                    "x0": x0,
                    "kind": 0,
                    "side": -1,
                    "cost": cost.tobytes(),
                    "dist": dist.tobytes(),
                    "changed": int(group["changed"].sum()),
                }
            ]
        )

    return bucketed_group_map(
        state.map_batches(key, batch_format="pandas"),
        ["metric", "__sr", "__sc"],
        assemble,
        n_buckets=n_buckets,
        out_schema=_STATE,
    )


def _converged_cost_state(
    result: rd.Dataset,
    source_threshold: float,
    n_buckets: int,
    max_rounds: int,
    coarsen: int,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 1,
    sources: rd.Dataset | None = None,
) -> rd.Dataset:
    """Run the superstep relaxation to the global fixpoint; returns the
    converged tile-state dataset (shared by the distance and backlink
    surfaces).

    With ``checkpoint_dir`` the loop is RESUMABLE (north rule): every
    ``checkpoint_every``-th round's state writes atomically through
    ``state.manifest.RunManifest`` (per-round lineage: round number +
    changed-tile count), older round shards are pruned, and a rerun
    picks up from the latest recorded round — or returns immediately
    when the recorded state already converged. The relaxation is
    monotone and deterministic, so resumed and uninterrupted runs are
    bit-identical."""
    from gridfia_ray.stages.agg_util import bucketed_group_map

    thr_u = int(np.floor(source_threshold * 1_000_000 + 0.5))

    def _u_arr(r: pd.Series) -> np.ndarray:
        h, w = int(r["h"]), int(r["w"])
        arr = np.frombuffer(r["pix"], np.dtype(r["dtype"])).reshape(h, w)
        return np.floor(arr.astype(np.float64) * 1_000_000 + 0.5).astype(np.int64)

    def _state_row(r: pd.Series, u: np.ndarray, src: np.ndarray) -> dict:
        h, w = int(r["h"]), int(r["w"])
        if (u < 0).any():
            raise ValueError(
                "cost_distance: negative traversal cost in tile "
                f"({r['tile_row']}, {r['tile_col']})"
            )
        dist = np.where(src, np.int64(0), _INF)
        return {
            "metric": r["metric"],
            "tile_row": int(r["tile_row"]),
            "tile_col": int(r["tile_col"]),
            "h": h,
            "w": w,
            "y0": int(r["tile_row"]) * h,
            "x0": int(r["tile_col"]) * w,
            "kind": 0,
            "side": -1,
            "cost": u.tobytes(),
            "dist": dist.tobytes(),
            "changed": int(src.sum()),
        }

    from gridfia_ray.stages.agg_util import bucketed_group_map as _bgm
    from gridfia_ray.stages.agg_util import to_arrow

    if sources is None:
        # sources = cost pixels above the threshold (the coupled form)
        def init(batch: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                [
                    _state_row(r, u, u > thr_u)
                    for _, r in batch.iterrows()
                    for u in (_u_arr(r),)
                ]
            )

        state = result.map_batches(
            lambda b: to_arrow(init(b), _STATE), batch_format="pandas"
        ).materialize()
    else:
        # decoupled SOURCE raster (the ArcGIS form): cost tiles co-key
        # with source tiles on the tile address in one exchange; a tile
        # with no source row simply has no zero-dist seeds. Source
        # pixels are those whose µ-value exceeds the threshold.
        def tag(side: str):
            def fn(batch: pd.DataFrame) -> pd.DataFrame:
                batch = batch.copy()
                batch["__side"] = side
                return batch[
                    ["metric", "tile_row", "tile_col", "h", "w", "pix",
                     "dtype", "__side"]
                ]

            return fn

        def init_pair(group: pd.DataFrame) -> pd.DataFrame:
            cost_rows = group[group["__side"] == "c"]
            if len(cost_rows) == 0:
                return pd.DataFrame({f.name: [] for f in _STATE})
            if len(cost_rows) > 1:
                raise ValueError(
                    "cost_distance: duplicate cost tile at "
                    f"({group['tile_row'].iloc[0]}, "
                    f"{group['tile_col'].iloc[0]})"
                )
            r = cost_rows.iloc[0]
            u = _u_arr(r)
            src = np.zeros(u.shape, bool)
            for _, sr in group[group["__side"] == "s"].iterrows():
                if (int(sr["h"]), int(sr["w"])) != u.shape:
                    raise ValueError(
                        "cost_distance: source tile shape mismatches "
                        "the cost tile"
                    )
                src |= _u_arr(sr) > thr_u
            return pd.DataFrame([_state_row(r, u, src)])

        both = result.map_batches(
            tag("c"), batch_format="pandas"
        ).union(sources.map_batches(tag("s"), batch_format="pandas"))
        state = _bgm(
            both,
            ["tile_row", "tile_col"],
            init_pair,
            n_buckets=n_buckets,
            out_schema=_STATE,
        ).materialize()
    if int(state.sum("changed") or 0) == 0:
        raise ValueError("cost_distance: no source pixel above threshold")
    if coarsen > 1:
        # buckets ≈ super-tile count: surplus empty sort partitions emit
        # schema-less blocks that churn the executor's schema cache
        cb = max(1, min(n_buckets, state.count() // (coarsen * coarsen)))
        state = _coarsen_state(state, coarsen, cb).materialize()
    # fewer buckets than live tiles: empty sort partitions emit
    # schema-less blocks that churn the executor's schema tracking
    loop_buckets = max(1, min(n_buckets, state.count() // 2 or 1))

    manifest = None
    start_round = 0
    if checkpoint_dir is not None:
        import shutil

        from gridfia_ray.io import read_parquet_clean
        from gridfia_ray.state.manifest import RunManifest

        manifest = RunManifest(checkpoint_dir)
        done = sorted(
            (int(k.split("_")[1]) for k in manifest.completed()
             if k.startswith("round_")),
        )
        if done:
            latest = done[-1]
            entry = manifest.partitions[f"round_{latest}"]
            state = read_parquet_clean(
                manifest.shard_dir(f"round_{latest}")
            ).materialize()
            if int(entry.get("changed", 1)) == 0:
                return state  # recorded state already converged
            start_round = latest + 1

    def _checkpoint(rnd: int, st: rd.Dataset, changed: int) -> None:
        manifest.write_shard(
            f"round_{rnd}", st, extra={"round": rnd, "changed": changed}
        )
        for k in list(manifest.completed()):
            if k.startswith("round_") and int(k.split("_")[1]) < rnd:
                shutil.rmtree(manifest.shard_dir(k), ignore_errors=True)

    def strips(batch: pd.DataFrame) -> pa.Table:
        rows: list[dict] = []
        for _, r in batch.iterrows():
            rows.extend(_strip_rows(r))
        return to_arrow(pd.DataFrame(rows, columns=[f.name for f in _STATE]), _STATE)

    for rnd in range(start_round, max_rounds):
        merged = state.union(
            state.map_batches(strips, batch_format="pandas")
        )
        state = bucketed_group_map(
            merged,
            ["metric", "tile_row", "tile_col"],
            _solve_group,
            n_buckets=loop_buckets,
            out_schema=_STATE,
        ).materialize()
        changed = int(state.sum("changed") or 0)
        if manifest is not None and (
            rnd % checkpoint_every == 0 or changed == 0
        ):
            _checkpoint(rnd, state, changed)
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"cost_distance: no convergence in {max_rounds} supersteps"
        )
    return state


def cost_distance_tiles(
    result: rd.Dataset,
    source_threshold: float,
    n_buckets: int = 64,
    max_rounds: int = 256,
    coarsen: int = 1,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 1,
    sources: rd.Dataset | None = None,
) -> rd.Dataset:
    """Chamfer-3/4 integer cost distance over a result-tile dataset →
    rows (metric, y, x, cdist). Sources are pixels whose micro-scaled
    value exceeds ``floor(threshold·1e6 + 0.5)``; the traversal cost of
    a pixel is its micro-scaled value itself (must be ≥ 0). Raises if
    no source pixel exists anywhere."""
    from gridfia_ray.stages.agg_util import to_arrow

    state = _converged_cost_state(
        result, source_threshold, n_buckets, max_rounds, coarsen,
        checkpoint_dir=checkpoint_dir, checkpoint_every=checkpoint_every,
        sources=sources,
    )

    def explode(tbl: pa.Table) -> pa.Table:
        batch = tbl.to_pandas() if tbl.num_rows else None
        frames = []
        if batch is not None:
            for _, r in batch.iterrows():
                h, w = int(r["h"]), int(r["w"])
                dist = np.frombuffer(r["dist"], np.int64).reshape(h, w)
                if (dist >= _INF).any():
                    raise ValueError(
                        "cost_distance: unreachable pixels after convergence"
                    )
                yy, xx = np.meshgrid(
                    np.arange(h, dtype=np.int64), np.arange(w, dtype=np.int64),
                    indexing="ij",
                )
                frames.append(
                    pd.DataFrame(
                        {
                            "metric": r["metric"],
                            "y": (yy + int(r["y0"])).ravel(),
                            "x": (xx + int(r["x0"])).ravel(),
                            "cdist": dist.ravel(),
                        }
                    )
                )
        if not frames:
            return to_arrow(pd.DataFrame(columns=[f.name for f in _OUT]), _OUT)
        return to_arrow(pd.concat(frames, ignore_index=True), _OUT)

    return state.map_batches(explode, batch_format="pyarrow")


_BL_OUT = pa.schema(
    [("metric", pa.string()), ("y", pa.int64()), ("x", pa.int64()),
     ("backlink", pa.int64())]
)


def cost_backlink_tiles(
    result: rd.Dataset,
    source_threshold: float,
    n_buckets: int = 64,
    max_rounds: int = 256,
    coarsen: int = 1,
) -> rd.Dataset:
    """Cost back-link raster (ArcGIS CostBackLink): for every
    non-source pixel the D8 code (``pipelines/flow.D8_OFFSETS`` order)
    of the neighbor n minimizing ``dist(n) + w·(c(n)+c(p))`` — the
    first step of the least-cost path back to the nearest source; −1
    at sources. Ties break first-min-wins in D8 order (strict <), so
    the surface is bit-deterministic and the Dijkstra pin reproduces
    it from its own distance grid. At the fixpoint that minimum EQUALS
    dist(p) — asserted, which doubles as a convergence audit. One
    extra strip exchange over the converged state."""
    from gridfia_ray.pipelines.flow import D8_OFFSETS
    from gridfia_ray.stages.agg_util import bucketed_group_map, to_arrow

    state = _converged_cost_state(
        result, source_threshold, n_buckets, max_rounds, coarsen
    )
    n_tiles = state.count()
    loop_buckets = max(1, min(n_buckets, n_tiles // 2 or 1))

    def strips(batch: pd.DataFrame) -> pa.Table:
        rows: list[dict] = []
        for _, r in batch.iterrows():
            rows.extend(_strip_rows(r))
        return to_arrow(
            pd.DataFrame(rows, columns=[f.name for f in _STATE]), _STATE
        )

    def backlink_group(group: pd.DataFrame) -> pd.DataFrame:
        padded = _padded_from_group(group)
        if padded is None:
            return pd.DataFrame({f.name: [] for f in _BL_OUT})
        r, h, w, dist, dist_p, cost_p = padded
        c = cost_p[1:-1, 1:-1]
        best = np.full((h, w), _INF, np.int64)
        code = np.full((h, w), -1, np.int64)
        for k, (dy, dx) in enumerate(D8_OFFSETS):
            wgt = _W_ORTH if dy == 0 or dx == 0 else _W_DIAG
            nd = dist_p[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]
            nc = cost_p[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]
            cand = nd + wgt * (nc + c)
            better = cand < best
            best[better] = cand[better]
            code[better] = k
        src = dist == 0
        code[src] = -1
        if ((~src) & (best != dist)).any():
            raise RuntimeError(
                "cost_backlink: state is not at the cost-distance "
                "fixpoint (best neighbor relaxation != dist)"
            )
        yy, xx = np.meshgrid(
            np.arange(h, dtype=np.int64), np.arange(w, dtype=np.int64),
            indexing="ij",
        )
        return pd.DataFrame(
            {
                "metric": r["metric"],
                "y": (yy + int(r["y0"])).ravel(),
                "x": (xx + int(r["x0"])).ravel(),
                "backlink": code.ravel(),
            }
        )

    merged = state.union(state.map_batches(strips, batch_format="pandas"))
    return bucketed_group_map(
        merged,
        ["metric", "tile_row", "tile_col"],
        backlink_group,
        n_buckets=loop_buckets,
        out_schema=_BL_OUT,
    )


def cost_allocation_tiles(
    result: rd.Dataset,
    source_threshold: float,
    width: int,
    n_buckets: int = 64,
    max_rounds: int = 256,
    coarsen: int = 1,
) -> rd.Dataset:
    """Cost ALLOCATION (ArcGIS CostAllocation): for every pixel the
    global linear pid (y·width + x) of the source its least-cost path
    terminates at — the weighted generalization of Euclidean
    allocation. Returns rows (y, x, alloc).

    Requires strictly POSITIVE traversal costs: a zero-cost adjacent
    pair makes the backlink field tie-cyclic (dist does not strictly
    decrease along links), so any zero/negative cost raises. With
    positive costs every backlink strictly decreases the converged
    distance, which is exactly the invariant the watershed
    border-resolution machinery needs — the backlink raster packs as
    (z = dist, dir = backlink) tiles and ``pipelines/flow.watershed``
    labels every chain: one border exchange, a bounded driver
    path-compression fold, one broadcast labeling pass."""
    packed = _backlink_packed(
        result, source_threshold, n_buckets, max_rounds, coarsen
    )
    from gridfia_ray.pipelines.flow import watershed

    out = watershed(packed, width)

    def rename(b: pa.Table) -> pa.Table:
        return b.rename_columns(["y", "x", "alloc"])

    return out.map_batches(rename, batch_format="pyarrow")


def _backlink_packed(
    result: rd.Dataset,
    source_threshold: float,
    n_buckets: int,
    max_rounds: int,
    coarsen: int,
) -> rd.Dataset:
    """Converged (z = dist, dir = backlink) packed tiles — the shared
    input of cost allocation (watershed labeling) and cost paths
    (backlink walking). Enforces strictly positive costs (strict
    descent along links)."""
    from gridfia_ray.pipelines.flow import D8_OFFSETS
    from gridfia_ray.stages.agg_util import bucketed_group_map, to_arrow

    state = _converged_cost_state(
        result, source_threshold, n_buckets, max_rounds, coarsen
    )
    n_tiles = state.count()
    loop_buckets = max(1, min(n_buckets, n_tiles // 2 or 1))

    packed_schema = pa.schema(
        [("metric", pa.string()), ("tile_row", pa.int64()),
         ("tile_col", pa.int64()), ("h", pa.int64()), ("w", pa.int64()),
         ("z", pa.binary()), ("dir", pa.binary())]
    )

    def strips(batch: pd.DataFrame) -> pa.Table:
        rows: list[dict] = []
        for _, r in batch.iterrows():
            rows.extend(_strip_rows(r))
        return to_arrow(
            pd.DataFrame(rows, columns=[f.name for f in _STATE]), _STATE
        )

    def pack_group(group: pd.DataFrame) -> pd.DataFrame:
        padded = _padded_from_group(group)
        if padded is None:
            return pd.DataFrame({f.name: [] for f in packed_schema})
        r, h, w, dist, dist_p, cost_p = padded
        if int(r["y0"]) != int(r["tile_row"]) * h or (
            int(r["x0"]) != int(r["tile_col"]) * w
        ):
            raise ValueError(
                "cost_allocation: coarsen factor must divide the tile "
                "grid (watershed labeling derives offsets from tile "
                "coordinates)"
            )
        cost = cost_p[1:-1, 1:-1]
        if (cost <= 0).any():
            raise ValueError(
                "cost_allocation: traversal costs must be strictly "
                "positive (zero-cost plateaus make backlinks cyclic)"
            )
        c = cost
        best = np.full((h, w), _INF, np.int64)
        code = np.full((h, w), -1, np.int8)
        for k, (dy, dx) in enumerate(D8_OFFSETS):
            wgt = _W_ORTH if dy == 0 or dx == 0 else _W_DIAG
            nd = dist_p[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]
            nc = cost_p[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]
            cand = nd + wgt * (nc + c)
            better = cand < best
            best[better] = cand[better]
            code[better] = k
        src = dist == 0
        code[src] = -1
        if ((~src) & (best != dist)).any():
            raise RuntimeError(
                "cost_allocation: state is not at the cost-distance "
                "fixpoint (best neighbor relaxation != dist)"
            )
        return pd.DataFrame(
            [
                {
                    "metric": r["metric"],
                    "tile_row": int(r["tile_row"]),
                    "tile_col": int(r["tile_col"]),
                    "h": h,
                    "w": w,
                    "z": dist.tobytes(),
                    "dir": code.tobytes(),
                }
            ]
        )

    merged = state.union(state.map_batches(strips, batch_format="pandas"))
    return bucketed_group_map(
        merged,
        ["metric", "tile_row", "tile_col"],
        pack_group,
        n_buckets=loop_buckets,
        out_schema=packed_schema,
    )


def cost_paths_tiles(
    result: rd.Dataset,
    source_threshold: float,
    destinations: list[tuple[int, int, int]],
    n_buckets: int = 64,
    max_rounds: int = 256,
    coarsen: int = 1,
) -> pd.DataFrame:
    """Least-cost PATHS (ArcGIS CostPath): for each destination pixel
    the full route of its least-cost path back to the nearest source,
    following the converged backlink field. ``destinations`` is a list
    of (dest_id, y, x); returns rows (dest_id, step, y, x) with step 0
    at the destination and the last step on a source pixel.

    The walk is a batched iterative GATHER: frontier points co-bucket
    with the packed backlink tiles they currently sit in, each point
    walks WITHIN its tile until it exits or reaches a source (so a
    round costs one exchange and advances every point a whole tile),
    and exited points re-enter the next round addressed to their new
    tile. Rounds = tiles crossed by the longest path; the driver holds
    only the emitted path rows — bounded by Σ path lengths, which IS
    the operator's output. Strictly positive costs required (strict
    descent ⇒ the walk terminates; inherited from the backlink
    precondition)."""
    from gridfia_ray.pipelines.flow import D8_OFFSETS

    packed = _backlink_packed(
        result, source_threshold, n_buckets, max_rounds, coarsen
    ).materialize()

    first = packed.take(1)
    if not first:
        raise ValueError("cost_paths: empty backlink raster")
    th, tw = int(first[0]["h"]), int(first[0]["w"])

    # frontier: (dest_id, step, y, x) — tiny by definition (k dests)
    frontier = pd.DataFrame(
        {
            "dest_id": np.asarray([d[0] for d in destinations], np.int64),
            "step": np.zeros(len(destinations), np.int64),
            "y": np.asarray([d[1] for d in destinations], np.int64),
            "x": np.asarray([d[2] for d in destinations], np.int64),
        }
    )
    if frontier["dest_id"].duplicated().any():
        raise ValueError("cost_paths: duplicate dest_id")
    out_rows: list[pd.DataFrame] = []

    import ray

    for _ in range(max_rounds):
        if len(frontier) == 0:
            break
        frontier = frontier.assign(
            __tr=frontier["y"] // th, __tc=frontier["x"] // tw
        )
        want = set(zip(frontier["__tr"], frontier["__tc"]))
        fref = ray.put(frontier)

        def walk(batch: pd.DataFrame) -> pd.DataFrame:
            pts = ray.get(fref)
            outs = []
            for _, r in batch.iterrows():
                tr, tc = int(r["tile_row"]), int(r["tile_col"])
                mine = pts[(pts["__tr"] == tr) & (pts["__tc"] == tc)]
                if len(mine) == 0:
                    continue
                h, w = int(r["h"]), int(r["w"])
                code = np.frombuffer(r["dir"], np.int8).reshape(h, w)
                for p in mine.itertuples():
                    y, x, step = int(p.y), int(p.x), int(p.step)
                    rows = []
                    while True:
                        rows.append((p.dest_id, step, y, x))
                        k = int(code[y - tr * h, x - tc * w])
                        if k < 0:  # source reached: path complete
                            done = True
                            break
                        dy, dx = D8_OFFSETS[k]
                        y, x, step = y + dy, x + dx, step + 1
                        if y // h != tr or x // w != tc:
                            done = False  # exits: re-enter next round
                            break
                    df = pd.DataFrame(
                        rows, columns=["dest_id", "step", "y", "x"]
                    ).astype(np.int64)
                    df["done"] = np.int64(1)
                    if not done:
                        cont = pd.DataFrame(
                            [[p.dest_id, step, y, x, 0]],
                            columns=["dest_id", "step", "y", "x", "done"],
                        ).astype(np.int64)
                        df = pd.concat([df, cont], ignore_index=True)
                    outs.append(df)
            if not outs:
                return pd.DataFrame(
                    {c: pd.Series(dtype=np.int64)
                     for c in ("dest_id", "step", "y", "x", "done")}
                )
            return pd.concat(outs, ignore_index=True)

        # only tiles holding a frontier point do any work; the rest
        # stream through the cheap membership test
        res = packed.map_batches(walk, batch_format="pandas").to_pandas()
        emitted = res[res["done"] == 1][["dest_id", "step", "y", "x"]]
        out_rows.append(emitted)
        frontier = res[res["done"] == 0][["dest_id", "step", "y", "x"]]
        _ = want  # documented: membership prune happens inside walk
    else:
        if len(frontier):
            raise RuntimeError(
                f"cost_paths: walk not finished in {max_rounds} rounds"
            )
    out = pd.concat(out_rows, ignore_index=True)
    return out.sort_values(["dest_id", "step"]).reset_index(drop=True)
