"""D8 flow routing over result-tile rasters: direction + accumulation.

Flow DIRECTION (per pixel): the 8-neighbor with the maximum strictly
positive drop ``z - z_n`` (unweighted max-drop D8; ties broken by the
fixed octant priority E, SE, S, SW, W, NW, N, NE — first max wins).
Pixels with no strictly lower in-raster neighbor — pits, flats, and
edge pixels whose lower side is off-grid — get ``dir = -1``. Computed
with the focal halo exchange (ONE keyed co-location of each tile with
its 8 border strips), emitted as PACKED per-tile arrays so the
accumulation supersteps below never reshuffle pixels.

Flow ACCUMULATION: ``acc(v)`` = number of cells ``u != v`` whose flow
path passes through ``v`` — the classic hydrology upstream-area count.
Flow is strictly downhill, so the flow graph is a functional forest
(no cycles) and descending-z order is a valid topological order.
Distributed as tile-local topological solves + cross-tile superstep
settling (the Barnes-style decomposition):

* each round, every tile re-runs its LOCAL solve — cells in strictly
  descending-z order, seeded with the currently known external inflows
  at its border — and emits its boundary-CROSSING flows only;
* the driver folds the tiny cross-flow table (bounded by
  4 · tile_edge · n_tiles rows — O(perimeter), never O(area)) and
  broadcasts it back via ``ray.put``;
* cross-flows are monotone nondecreasing round over round and reach a
  fixed point after D rounds, where D = the max number of tile-boundary
  crossings on any flow path (a tile-graph diameter, NOT the pixel path
  length); an unchanged cross-flow total is therefore an exact stopping
  rule, and ``max_rounds`` guards non-convergence loudly.

Scale note: the packed (z, dir) tile dataset is materialized once and
re-mapped every superstep — the working set is the decoded raster at
9 B/px in the object store, never the driver. The per-round driver fold
is the cross-flow table only; at cluster scale the same loop runs with
the cross-flow table as a broadcast object per round (it stays
O(perimeter · occupied tiles)).

Reference parallel: gridfia has no hydrology operators; this extends
the focal/warp halo family (SURVEY.md §2.2 mapping notes) with the
standard DEM flow-routing pair.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from gridfia_ray.pipelines.focal import _halo_explode, strips_to_padded

# octant priority order: E, SE, S, SW, W, NW, N, NE (dy, dx)
D8_OFFSETS = ((0, 1), (1, 1), (1, 0), (1, -1), (0, -1), (-1, -1), (-1, 0), (-1, 1))


def d8_directions(vals: np.ndarray, pres: np.ndarray, h: int, w: int) -> np.ndarray:
    """h×w int8 D8 codes from padded (h+2, w+2) value/presence arrays.
    Code k = index into D8_OFFSETS; -1 = pit/flat/edge-low. Iterating
    candidates in priority order with a strict > test makes the first
    max win — the documented tie-break, bit-reproducible in any order
    of evaluation."""
    center = vals[1 : h + 1, 1 : w + 1]
    best_drop = np.zeros((h, w), dtype=np.int64)
    best_dir = np.full((h, w), -1, dtype=np.int8)
    for code, (dy, dx) in enumerate(D8_OFFSETS):
        nz = vals[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]
        np_ = pres[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]
        drop = center - nz
        better = (np_ == 1) & (drop > 0) & (drop > best_drop)
        best_drop[better] = drop[better]
        best_dir[better] = code
    return best_dir


def flow_direction_packed(result: rd.Dataset, n_buckets: int = 64) -> rd.Dataset:
    """One halo exchange → packed per-tile rows
    (metric, tile_row, tile_col, h, w, z: int64 bytes, dir: int8 bytes).
    The packed layout keeps the superstep loop shuffle-free."""
    out_schema = pa.schema(
        [
            ("metric", pa.string()),
            ("tile_row", pa.int64()),
            ("tile_col", pa.int64()),
            ("h", pa.int64()),
            ("w", pa.int64()),
            ("z", pa.binary()),
            ("dir", pa.binary()),
        ]
    )
    empty = pa.table(
        {f.name: pa.array([], f.type) for f in out_schema}, schema=out_schema
    )

    def assemble(group: pd.DataFrame) -> pa.Table:
        padded = strips_to_padded(group, "flow_direction")
        if padded is None:
            return empty.to_pandas()
        vals, pres, h, w = padded
        d8 = d8_directions(vals, pres, h, w)
        return pd.DataFrame(
            {
                "metric": [group["metric"].iloc[0]],
                "tile_row": [int(group["tile_row"].iloc[0])],
                "tile_col": [int(group["tile_col"].iloc[0])],
                "h": [h],
                "w": [w],
                "z": [vals[1 : h + 1, 1 : w + 1].tobytes()],
                "dir": [d8.tobytes()],
            }
        )

    from gridfia_ray.stages.agg_util import bucketed_group_map

    return bucketed_group_map(
        _halo_explode(result, "flow_direction"),
        ["metric", "tile_row", "tile_col"],
        assemble,
        n_buckets=n_buckets,
        out_schema=out_schema,
    )


def _local_solve(
    z: np.ndarray,
    d8: np.ndarray,
    ext: dict,
    tr: int,
    tc: int,
    emit_pixels: bool,
):
    """Tile-local topological accumulation. ``ext`` maps local (y, x)
    → external inflow count (upstream cells outside this tile whose
    path enters here). Returns (acc h×w int64 | None, out_rows) where
    out_rows are boundary-crossing flows
    [(target_tile_row, target_tile_col, target_y_local, target_x_local,
    count)] — count = number of upstream cells (incl. the sender path's
    own cells) arriving at the target pixel."""
    h, w = z.shape
    n = h * w
    dirs = d8.ravel().astype(np.int64)
    routed = dirs >= 0
    # vectorized downstream precomputation: down[u] = downstream linear
    # index inside the tile; -1 = pit/flat; -2 = boundary crossing
    # (target key looked up in cross_key)
    dy_all = np.array([o[0] for o in D8_OFFSETS], dtype=np.int64)
    dx_all = np.array([o[1] for o in D8_OFFSETS], dtype=np.int64)
    uy, ux = np.divmod(np.arange(n, dtype=np.int64), w)
    vy = np.where(routed, uy + dy_all[np.where(routed, dirs, 0)], 0)
    vx = np.where(routed, ux + dx_all[np.where(routed, dirs, 0)], 0)
    inside = routed & (vy >= 0) & (vy < h) & (vx >= 0) & (vx < w)
    down = np.full(n, -1, dtype=np.int64)
    down[inside] = vy[inside] * w + vx[inside]
    crossing = routed & ~inside
    down[crossing] = -2
    cross_key: dict[int, tuple[int, int, int, int]] = {}
    for u in np.nonzero(crossing)[0].tolist():
        cvy, cvx = int(vy[u]), int(vx[u])
        ntr = tr + (1 if cvy >= h else (-1 if cvy < 0 else 0))
        ntc = tc + (1 if cvx >= w else (-1 if cvx < 0 else 0))
        cross_key[u] = (ntr, ntc, cvy % h, cvx % w)
    acc = [0] * n
    for (ly, lx), k in ext.items():
        acc[ly * w + lx] = int(k)
    order = np.argsort(-z.ravel(), kind="stable")
    out: dict[tuple[int, int, int, int], int] = {}
    down_l = down.tolist()
    for u in order.tolist():
        c = down_l[u]
        if c >= 0:
            acc[c] += acc[u] + 1  # +1: the cell itself
        elif c == -2:
            key = cross_key[u]
            out[key] = out.get(key, 0) + acc[u] + 1
        # c == -1: pit/flat — flow terminates here
    rows = [(a, b, c, d, m) for (a, b, c, d), m in out.items()]
    if not emit_pixels:
        return None, rows
    return np.asarray(acc, dtype=np.int64).reshape(h, w), rows


def _round_map(inflow_ref, emit_pixels: bool):
    """map_batches fn over packed tiles for one superstep. ``inflow_ref``
    is a ray.put of {(tile_row, tile_col): {(ly, lx): count}}."""

    def fn(batch: pa.Table) -> pa.Table:
        inflow = ray.get(inflow_ref)
        trs, tcs, tys, txs, cnt = [], [], [], [], []
        pys, pxs, pdir, pacc = [], [], [], []
        for i in range(batch.num_rows):
            h = int(batch["h"][i].as_py())
            w = int(batch["w"][i].as_py())
            tr = int(batch["tile_row"][i].as_py())
            tc = int(batch["tile_col"][i].as_py())
            z = np.frombuffer(batch["z"][i].as_py(), dtype=np.int64).reshape(h, w)
            d8 = np.frombuffer(batch["dir"][i].as_py(), dtype=np.int8).reshape(h, w)
            ext = inflow.get((tr, tc), {})
            acc, rows = _local_solve(z, d8, ext, tr, tc, emit_pixels)
            for a, b, c, d, m in rows:
                trs.append(a)
                tcs.append(b)
                tys.append(c)
                txs.append(d)
                cnt.append(m)
            if emit_pixels:
                yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
                pys.append((yy + tr * h).ravel())
                pxs.append((xx + tc * w).ravel())
                pdir.append(d8.ravel().astype(np.int64))
                pacc.append(acc.ravel())
        if emit_pixels:
            return pa.table(
                {
                    "y": pa.array(np.concatenate(pys) if pys else [], pa.int64()),
                    "x": pa.array(np.concatenate(pxs) if pxs else [], pa.int64()),
                    "dir": pa.array(np.concatenate(pdir) if pdir else [], pa.int64()),
                    "acc": pa.array(np.concatenate(pacc) if pacc else [], pa.int64()),
                }
            )
        return pa.table(
            {
                "tile_row": pa.array(trs, pa.int64()),
                "tile_col": pa.array(tcs, pa.int64()),
                "ty": pa.array(tys, pa.int64()),
                "tx": pa.array(txs, pa.int64()),
                "count": pa.array(cnt, pa.int64()),
            }
        )

    return fn


def flow_accumulate(packed: rd.Dataset, max_rounds: int = 64) -> rd.Dataset:
    """Superstep loop to the exact fixed point, then one final pass
    emitting per-pixel (y, x, dir, acc). The cross-flow fold is the
    only driver-side data: O(4 · tile_edge · occupied tiles) rows,
    monotone per edge, settled ⇔ total unchanged."""
    packed = packed.materialize()
    inflow: dict = {}
    prev_total = -1
    for rnd in range(max_rounds):
        flows = packed.map_batches(
            _round_map(ray.put(inflow), emit_pixels=False), batch_format="pyarrow"
        ).to_pandas()
        total = int(flows["count"].sum()) if len(flows) else 0
        if total == prev_total:
            break
        prev_total = total
        agg = flows.groupby(
            ["tile_row", "tile_col", "ty", "tx"], as_index=False
        )["count"].sum()
        nxt: dict = {}
        for r in agg.itertuples(index=False):
            nxt.setdefault((int(r.tile_row), int(r.tile_col)), {})[
                (int(r.ty), int(r.tx))
            ] = int(r.count)
        inflow = nxt
    else:
        raise RuntimeError(
            f"flow_accumulate: cross-tile flows did not settle within "
            f"{max_rounds} rounds — raise max_rounds (settling rounds = "
            f"max tile-boundary crossings on any flow path)"
        )
    return packed.map_batches(
        _round_map(ray.put(inflow), emit_pixels=True), batch_format="pyarrow"
    )
