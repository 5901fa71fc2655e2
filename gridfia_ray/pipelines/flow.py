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


def d8_receiver_drops(
    vals: np.ndarray, pres: np.ndarray, h: int, w: int, d8: np.ndarray
) -> np.ndarray:
    """µ-elevation fall to each pixel's D8 receiver (0 at pits) from the
    padded window — the slope term of TWI/SPI, computed where the halo
    is already in hand (diagonal flag = dir code parity)."""
    center = vals[1 : h + 1, 1 : w + 1]
    drop = np.zeros((h, w), np.int64)
    for code, (dy, dx) in enumerate(D8_OFFSETS):
        m = d8 == code
        if not m.any():
            continue
        nz = vals[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]
        drop[m] = center[m] - nz[m]
    return drop


def flow_direction_packed(result: rd.Dataset, n_buckets: int = 64) -> rd.Dataset:
    """One halo exchange → packed per-tile rows
    (metric, tile_row, tile_col, h, w, z: int64 bytes, dir: int8 bytes,
    drop: int64 bytes — the receiver fall, carried so TWI/SPI never
    need a second exchange). The packed layout keeps the superstep
    loop shuffle-free."""
    out_schema = pa.schema(
        [
            ("metric", pa.string()),
            ("tile_row", pa.int64()),
            ("tile_col", pa.int64()),
            ("h", pa.int64()),
            ("w", pa.int64()),
            ("z", pa.binary()),
            ("dir", pa.binary()),
            ("drop", pa.binary()),
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
        drop = d8_receiver_drops(vals, pres, h, w, d8)
        return pd.DataFrame(
            {
                "metric": [group["metric"].iloc[0]],
                "tile_row": [int(group["tile_row"].iloc[0])],
                "tile_col": [int(group["tile_col"].iloc[0])],
                "h": [h],
                "w": [w],
                "z": [vals[1 : h + 1, 1 : w + 1].tobytes()],
                "dir": [d8.tobytes()],
                "drop": [drop.tobytes()],
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


def _downstream(
    z: np.ndarray, d8: np.ndarray, tr: int, tc: int
) -> tuple[np.ndarray, dict[int, tuple[int, int, int, int]]]:
    """Vectorized downstream precomputation shared by accumulation and
    watershed: ``down[u]`` = downstream linear index inside the tile;
    -1 = pit/flat; -2 = boundary crossing, target key in ``cross_key``
    as (neighbor_tile_row, neighbor_tile_col, local_y, local_x)."""
    h, w = z.shape
    n = h * w
    dirs = d8.ravel().astype(np.int64)
    routed = dirs >= 0
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
    return down, cross_key


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
    down, cross_key = _downstream(z, d8, tr, tc)
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


def coarsen_packed_tiles(
    packed: rd.Dataset, factor: int, n_buckets: int = 16
) -> rd.Dataset:
    """Merge ``factor``×``factor`` packed flow tiles into super-tiles in
    ONE keyed exchange before the settle loop.

    Settle rounds scale with the max number of TILE-boundary crossings
    on any flow path — on a hydrologically-conditioned (ε-filled)
    surface drainage paths wind to the border, so crossings ≈ path
    length / tile size and coarsening divides the round count by
    ``factor`` at the price of ``factor``²-larger local solves (the
    same deal as fill's ``_coarsen_state``; memory: superstep-round-
    count lesson). Per-pixel D8 codes, z and drop buffers are
    position-independent, so merging is pure placement — results are
    bit-identical (accumulation is an exact topological fold at any
    tiling; partition-invariance tests pin this).

    Requires uniform (h, w) and every super-group to be a COMPLETE
    ``factor``×``factor`` block (the emit step computes global coords
    as tile_row·H, so a ragged edge super-tile would shift its pixels
    — the exact bug fixed in fill's long-row emit): callers clamp
    ``factor`` to a divisor of the tile grid, and assemble raises on
    incomplete blocks rather than corrupt coordinates."""
    if factor <= 1:
        return packed
    from gridfia_ray.stages.agg_util import bucketed_group_map

    out_schema = pa.schema(
        [
            ("metric", pa.string()),
            ("tile_row", pa.int64()),
            ("tile_col", pa.int64()),
            ("h", pa.int64()),
            ("w", pa.int64()),
            ("z", pa.binary()),
            ("dir", pa.binary()),
            ("drop", pa.binary()),
        ]
    )

    def key(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["__sr"] = batch["tile_row"] // factor
        batch["__sc"] = batch["tile_col"] // factor
        return batch

    def assemble(group: pd.DataFrame) -> pd.DataFrame:
        h = int(group["h"].iloc[0])
        w = int(group["w"].iloc[0])
        if (group["h"] != h).any() or (group["w"] != w).any():
            raise ValueError("coarsen_packed_tiles: non-uniform tile dims")
        if len(group) != factor * factor:
            raise ValueError(
                "coarsen_packed_tiles: incomplete super-tile block "
                f"({len(group)} of {factor * factor} tiles) — the factor "
                "must divide the occupied tile grid"
            )
        H, W = factor * h, factor * w
        z = np.empty((H, W), np.int64)
        d8 = np.empty((H, W), np.int8)
        drop = np.empty((H, W), np.int64)
        for _, r in group.iterrows():
            oy = (int(r["tile_row"]) % factor) * h
            ox = (int(r["tile_col"]) % factor) * w
            z[oy:oy + h, ox:ox + w] = np.frombuffer(r["z"], np.int64).reshape(h, w)
            d8[oy:oy + h, ox:ox + w] = np.frombuffer(r["dir"], np.int8).reshape(h, w)
            drop[oy:oy + h, ox:ox + w] = np.frombuffer(r["drop"], np.int64).reshape(h, w)
        return pd.DataFrame(
            {
                "metric": [group["metric"].iloc[0]],
                "tile_row": [int(group["__sr"].iloc[0])],
                "tile_col": [int(group["__sc"].iloc[0])],
                "h": [H],
                "w": [W],
                "z": [z.tobytes()],
                "dir": [d8.tobytes()],
                "drop": [drop.tobytes()],
            }
        )

    return bucketed_group_map(
        packed.map_batches(key, batch_format="pandas"),
        ["metric", "__sr", "__sc"],
        assemble,
        n_buckets=n_buckets,
        out_schema=out_schema,
    )


def grid_divisor_factor(packed: rd.Dataset, want: int) -> int:
    """Largest factor ≤ ``want`` dividing BOTH occupied tile-grid dims
    (two cheap max aggregates) — the safe coarsening clamp."""
    nty = int(packed.max("tile_row") or 0) + 1
    ntx = int(packed.max("tile_col") or 0) + 1
    return max(
        f for f in range(1, max(1, want) + 1)
        if nty % f == 0 and ntx % f == 0
    )


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
        if len(flows) == 0:
            # zero crossings (e.g. fully coarsened single tile): Ray's
            # to_pandas() drops the columns of an empty result, so the
            # groupby below would KeyError — there is nothing to fold
            inflow = {}
            continue
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


def _strahler_solve(
    z: np.ndarray,
    d8: np.ndarray,
    ext: dict,
    tr: int,
    tc: int,
    emit_pixels: bool,
):
    """Tile-local Strahler pass. ``ext`` maps local (y, x) → (M, k):
    the max external incoming order and how many external edges carry
    it. Returns (strahler h×w int64 | None, out_rows) where out_rows
    are the boundary-crossing edges [(target_tile_row, target_tile_col,
    target_y, target_x, order)] — one row per crossing source cell."""
    h, w = z.shape
    n = h * w
    down, cross_key = _downstream(z, d8, tr, tc)
    inmax = [0] * n
    incnt = [0] * n
    for (ly, lx), (m, k) in ext.items():
        inmax[ly * w + lx] = int(m)
        incnt[ly * w + lx] = int(k)
    order = np.argsort(-z.ravel(), kind="stable")
    out: list[tuple[int, int, int, int, int]] = []
    down_l = down.tolist()
    strahler = [0] * n
    for u in order.tolist():
        o = 1 if inmax[u] == 0 else inmax[u] + (1 if incnt[u] >= 2 else 0)
        strahler[u] = o
        c = down_l[u]
        if c >= 0:
            if o > inmax[c]:
                inmax[c] = o
                incnt[c] = 1
            elif o == inmax[c]:
                incnt[c] += 1
        elif c == -2:
            a, b, cy, cx = cross_key[u]
            out.append((a, b, cy, cx, o))
    if not emit_pixels:
        return None, out
    return np.asarray(strahler, dtype=np.int64).reshape(h, w), out


def _strahler_round_map(inorder_ref, emit_pixels: bool):
    """One Strahler superstep over packed tiles. ``inorder_ref`` is a
    ray.put of {(tile_row, tile_col): {(ly, lx): (M, k)}}."""

    def fn(batch: pa.Table) -> pa.Table:
        inorder = ray.get(inorder_ref)
        trs, tcs, tys, txs, orders = [], [], [], [], []
        pys, pxs, pstr = [], [], []
        for i in range(batch.num_rows):
            h = int(batch["h"][i].as_py())
            w = int(batch["w"][i].as_py())
            tr = int(batch["tile_row"][i].as_py())
            tc = int(batch["tile_col"][i].as_py())
            z = np.frombuffer(batch["z"][i].as_py(), dtype=np.int64).reshape(h, w)
            d8 = np.frombuffer(batch["dir"][i].as_py(), dtype=np.int8).reshape(h, w)
            ext = inorder.get((tr, tc), {})
            st, rows = _strahler_solve(z, d8, ext, tr, tc, emit_pixels)
            for a, b, c, d, o in rows:
                trs.append(a)
                tcs.append(b)
                tys.append(c)
                txs.append(d)
                orders.append(o)
            if emit_pixels:
                yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
                pys.append((yy + tr * h).ravel())
                pxs.append((xx + tc * w).ravel())
                pstr.append(st.ravel())
        if emit_pixels:
            return pa.table(
                {
                    "y": pa.array(np.concatenate(pys) if pys else [], pa.int64()),
                    "x": pa.array(np.concatenate(pxs) if pxs else [], pa.int64()),
                    "strahler": pa.array(
                        np.concatenate(pstr) if pstr else [], pa.int64()
                    ),
                }
            )
        return pa.table(
            {
                "tile_row": pa.array(trs, pa.int64()),
                "tile_col": pa.array(tcs, pa.int64()),
                "ty": pa.array(tys, pa.int64()),
                "tx": pa.array(txs, pa.int64()),
                "ord": pa.array(orders, pa.int64()),
            }
        )

    return fn


def strahler_order(packed: rd.Dataset, max_rounds: int = 64) -> rd.Dataset:
    """Strahler stream order over the D8 flow forest (Strahler 1957;
    the ArcGIS Stream Order tool's default method, applied to every
    cell of the forest): headwater cells are order 1; a cell fed by
    k ≥ 2 inflows of its maximum incoming order M gets M+1, else M.

    Same superstep decomposition as :func:`flow_accumulate`: each round
    re-runs the tile-local descending-z pass seeded with the known
    external border in-orders and emits its boundary-crossing edge
    orders (one row per crossing cell — a STATIC O(perimeter) set).
    Edge orders are monotone nondecreasing round over round (raising an
    input never lowers a Strahler value), so an unchanged edge-order
    total is an exact stopping rule. Emits per-pixel (y, x, strahler)."""
    packed = packed.materialize()
    inorder: dict = {}
    prev_total = -1
    for _ in range(max_rounds):
        edges = packed.map_batches(
            _strahler_round_map(ray.put(inorder), emit_pixels=False),
            batch_format="pyarrow",
        ).to_pandas()
        total = int(edges["ord"].sum()) if len(edges) else 0
        if total == prev_total:
            break
        prev_total = total
        nxt: dict = {}
        if len(edges):
            g = edges.groupby(["tile_row", "tile_col", "ty", "tx"])["ord"]
            mx = g.max()
            cnt = edges.groupby(
                ["tile_row", "tile_col", "ty", "tx", "ord"]
            ).size()
            for (a, b, cy, cx), m in mx.items():
                k = int(cnt.loc[(a, b, cy, cx, m)])
                nxt.setdefault((int(a), int(b)), {})[(int(cy), int(cx))] = (
                    int(m),
                    k,
                )
        inorder = nxt
    else:
        raise RuntimeError(
            f"strahler_order: cross-tile edge orders did not settle within "
            f"{max_rounds} rounds — raise max_rounds"
        )
    return packed.map_batches(
        _strahler_round_map(ray.put(inorder), emit_pixels=True),
        batch_format="pyarrow",
    )


def _basin_solve(
    z: np.ndarray, d8: np.ndarray, tr: int, tc: int, width: int
) -> tuple[np.ndarray, list[tuple[int, int, int, int]]]:
    """Within-tile terminal of every cell's flow path, one pass in
    ascending-z (downstream-first) order — valid because ``down`` is
    strictly lower-z. ``term[u] >= 0``: the path ends at a pit INSIDE
    the tile; value = the pit's global basin id (gy·width + gx).
    ``term[u] == -(j+1)``: the path leaves the tile via ``exits[j]``
    (a border-ring pixel of a NEIGHBOR tile)."""
    h, w = z.shape
    down, cross_key = _downstream(z, d8, tr, tc)
    term = np.empty(h * w, dtype=np.int64)
    exits: list[tuple[int, int, int, int]] = []
    exit_idx: dict[tuple[int, int, int, int], int] = {}
    order = np.argsort(-z.ravel(), kind="stable")
    down_l = down.tolist()
    gy0, gx0 = tr * h, tc * w
    for u in order.tolist()[::-1]:  # ascending z: downstream settled first
        c = down_l[u]
        if c >= 0:
            term[u] = term[c]
        elif c == -1:
            term[u] = (gy0 + u // w) * width + (gx0 + u % w)
        else:
            key = cross_key[u]
            j = exit_idx.get(key)
            if j is None:
                j = len(exits)
                exit_idx[key] = j
                exits.append(key)
            term[u] = -(j + 1)
    return term, exits


def _iter_packed(batch: pa.Table):
    for i in range(batch.num_rows):
        h = int(batch["h"][i].as_py())
        w = int(batch["w"][i].as_py())
        tr = int(batch["tile_row"][i].as_py())
        tc = int(batch["tile_col"][i].as_py())
        z = np.frombuffer(batch["z"][i].as_py(), dtype=np.int64).reshape(h, w)
        d8 = np.frombuffer(batch["dir"][i].as_py(), dtype=np.int8).reshape(h, w)
        yield tr, tc, h, w, z, d8


_BORDER_SCHEMA = pa.schema(
    [(c, pa.int64()) for c in
     ("kind", "tr", "tc", "ly", "lx", "final", "ntr", "ntc", "nly", "nlx")]
)


def _border_map(width: int):
    """Per-tile border-resolution rows. kind=0: this tile's border-ring
    pixel (tr,tc,ly,lx) resolves to ``final`` (>=0, a pit basin id) or
    forwards to neighbor-ring pixel (ntr,ntc,nly,nlx) when final=-1.
    kind=1: a DEMANDED exit key — a neighbor-ring pixel some cell of
    this tile drains into (the final labeling pass will look it up)."""

    def fn(batch: pa.Table) -> pa.Table:
        cols: dict[str, list[np.ndarray]] = {f.name: [] for f in _BORDER_SCHEMA}
        for tr, tc, h, w, z, d8 in _iter_packed(batch):
            term, exits = _basin_solve(z, d8, tr, tc, width)
            yy, xx = np.divmod(np.arange(h * w, dtype=np.int64), w)
            ridx = np.nonzero(
                (yy == 0) | (yy == h - 1) | (xx == 0) | (xx == w - 1)
            )[0]
            t = term[ridx]
            neg = t < 0
            ea = np.asarray(exits or [(0, 0, 0, 0)], dtype=np.int64)
            j = np.where(neg, -t - 1, 0)
            r = len(ridx)
            cols["kind"].append(np.zeros(r, dtype=np.int64))
            cols["tr"].append(np.full(r, tr, dtype=np.int64))
            cols["tc"].append(np.full(r, tc, dtype=np.int64))
            cols["ly"].append(yy[ridx])
            cols["lx"].append(xx[ridx])
            cols["final"].append(np.where(neg, -1, t))
            cols["ntr"].append(np.where(neg, ea[j, 0], 0))
            cols["ntc"].append(np.where(neg, ea[j, 1], 0))
            cols["nly"].append(np.where(neg, ea[j, 2], 0))
            cols["nlx"].append(np.where(neg, ea[j, 3], 0))
            if exits:
                e = np.asarray(exits, dtype=np.int64)
                k = len(exits)
                cols["kind"].append(np.ones(k, dtype=np.int64))
                cols["tr"].append(e[:, 0])
                cols["tc"].append(e[:, 1])
                cols["ly"].append(e[:, 2])
                cols["lx"].append(e[:, 3])
                z4 = np.zeros(k, dtype=np.int64)
                for c in ("final", "ntr", "ntc", "nly", "nlx"):
                    cols[c].append(z4)
        return pa.table(
            {
                f.name: pa.array(
                    np.concatenate(cols[f.name])
                    if cols[f.name]
                    else np.empty(0, dtype=np.int64),
                    pa.int64(),
                )
                for f in _BORDER_SCHEMA
            },
            schema=_BORDER_SCHEMA,
        )

    return fn


def _resolve_borders(border: pd.DataFrame) -> dict:
    """Driver path-compression fold: resolve every DEMANDED exit key to
    its final basin id by following the static per-tile forwarding
    chains. Chains are acyclic (flow is strictly downhill, so every
    hop strictly decreases z) and every hop lands on an emitted ring
    pixel; a break or a cycle raises loudly."""
    res: dict[tuple, int] = {}
    fwd: dict[tuple, tuple] = {}
    ring = border[border["kind"] == 0]
    fin = ring["final"].to_numpy()
    keys = list(
        zip(
            ring["tr"].tolist(), ring["tc"].tolist(),
            ring["ly"].tolist(), ring["lx"].tolist(),
        )
    )
    tgts = list(
        zip(
            ring["ntr"].tolist(), ring["ntc"].tolist(),
            ring["nly"].tolist(), ring["nlx"].tolist(),
        )
    )
    for i, key in enumerate(keys):
        if fin[i] >= 0:
            res[key] = int(fin[i])
        else:
            fwd[key] = tgts[i]
    dem = border[border["kind"] == 1]
    demanded = set(
        zip(
            dem["tr"].tolist(), dem["tc"].tolist(),
            dem["ly"].tolist(), dem["lx"].tolist(),
        )
    )
    out: dict[tuple, int] = {}
    for key in demanded:
        stack: list[tuple] = []
        k = key
        while k not in res:
            stack.append(k)
            if len(stack) > len(fwd):
                raise RuntimeError(
                    "watershed: forwarding chain cycled — the D8 graph "
                    "must be strictly downhill (corrupt packed tiles?)"
                )
            if k not in fwd:
                raise RuntimeError(
                    f"watershed: chain reached un-emitted ring pixel {k} "
                    "— packed tiles are missing a neighbor"
                )
            k = fwd[k]
        b = res[k]
        for s in stack:
            res[s] = b
        out[key] = b
    return out


def _label_map(resolved_ref, width: int):
    def fn(batch: pa.Table) -> pa.Table:
        resolved = ray.get(resolved_ref)
        pys, pxs, pb = [], [], []
        for tr, tc, h, w, z, d8 in _iter_packed(batch):
            term, exits = _basin_solve(z, d8, tr, tc, width)
            basin = term.copy()
            neg = term < 0
            if neg.any():
                eb = np.asarray([resolved[k] for k in exits], dtype=np.int64)
                basin[neg] = eb[-term[neg] - 1]
            yy, xx = np.divmod(np.arange(h * w, dtype=np.int64), w)
            pys.append(yy + tr * h)
            pxs.append(xx + tc * w)
            pb.append(basin)
        return pa.table(
            {
                "y": pa.array(np.concatenate(pys) if pys else [], pa.int64()),
                "x": pa.array(np.concatenate(pxs) if pxs else [], pa.int64()),
                "basin": pa.array(np.concatenate(pb) if pb else [], pa.int64()),
            }
        )

    return fn


def watershed(packed: rd.Dataset, width: int) -> rd.Dataset:
    """Watershed basin delineation over the packed D8 tiles:
    ``basin(v)`` = global linear index (y·width + x) of the pit v's
    flow path terminates at; a pit is its own basin. Unlike
    accumulation this needs NO supersteps — each tile's border-ring
    resolution (pit-or-forward) is STATIC, so ONE exchange emitting the
    O(4·tile_edge) ring rows per tile plus the demanded exit keys, a
    driver path-compression fold over that O(perimeter · occupied
    tiles) table (same smallness bound as ``flow_accumulate``'s
    cross-flow fold), and one broadcast labeling pass settle every
    chain exactly. At cluster scale the driver fold swaps for
    distributed pointer jumping (log D rounds) without touching the
    tile passes.

    Reference parallel: gridfia has no hydrology operators; standard
    DEM basin labeling (companion of flow_accumulate above)."""
    packed = packed.materialize()
    border = packed.map_batches(
        _border_map(width), batch_format="pyarrow"
    ).to_pandas()
    resolved = _resolve_borders(border)
    return packed.map_batches(
        _label_map(ray.put(resolved), width), batch_format="pyarrow"
    )


def drops_from_packed(packed: rd.Dataset) -> rd.Dataset:
    """Unpack the drop geometry carried on the packed direction tiles →
    per-pixel ``(metric, y, x, dir, drop_u, diag)`` rows (diag = D8
    code parity). A pure map — the exchange already happened in
    :func:`flow_direction_packed`."""

    def unpack(batch: pa.Table) -> pa.Table:
        mets, pys, pxs, pdir, pdrop, pdiag = [], [], [], [], [], []
        for i in range(batch.num_rows):
            h = int(batch["h"][i].as_py())
            w = int(batch["w"][i].as_py())
            tr = int(batch["tile_row"][i].as_py())
            tc = int(batch["tile_col"][i].as_py())
            d8 = np.frombuffer(batch["dir"][i].as_py(), np.int8).reshape(h, w)
            drop = np.frombuffer(
                batch["drop"][i].as_py(), np.int64
            ).reshape(h, w)
            yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
            n = h * w
            mets.append(
                np.full(n, batch["metric"][i].as_py(), dtype=object)
            )
            pys.append((yy + tr * h).ravel())
            pxs.append((xx + tc * w).ravel())
            pdir.append(d8.ravel().astype(np.int64))
            pdrop.append(drop.ravel())
            # pits (dir < 0) have no outflow edge: diag is 0 by the
            # pinned replay's convention, not (-1) % 2 == 1
            d8f = d8.ravel().astype(np.int64)
            pdiag.append(np.where(d8f >= 0, d8f % 2, 0))
        if not pys:
            return pa.table(
                {
                    "metric": pa.array([], pa.string()),
                    "y": pa.array([], pa.int64()),
                    "x": pa.array([], pa.int64()),
                    "dir": pa.array([], pa.int64()),
                    "drop_u": pa.array([], pa.int64()),
                    "diag": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "metric": pa.array(np.concatenate(mets), pa.string()),
                "y": pa.array(np.concatenate(pys), pa.int64()),
                "x": pa.array(np.concatenate(pxs), pa.int64()),
                "dir": pa.array(np.concatenate(pdir), pa.int64()),
                "drop_u": pa.array(np.concatenate(pdrop), pa.int64()),
                "diag": pa.array(np.concatenate(pdiag), pa.int64()),
            }
        )

    return packed.map_batches(unpack, batch_format="pyarrow")


def d8_drops_tiles(result: rd.Dataset, n_buckets: int = 64) -> rd.Dataset:
    """Per-pixel D8 receiver geometry ``(metric, y, x, dir, drop_u,
    diag)`` — one halo exchange (via the fused
    :func:`flow_direction_packed`, whose tiles carry the drop buffer)
    then a pure unpack map."""
    return drops_from_packed(flow_direction_packed(result, n_buckets))


def wetness_index_tiles(
    result: rd.Dataset,
    n_buckets: int = 64,
    fill_coarsen: int = 4,
    checkpoint_dir: str | None = None,
    prefilled: rd.Dataset | None = None,
    flow_coarsen: int = 4,
    prepacked: rd.Dataset | None = None,
    preacc: rd.Dataset | None = None,
) -> rd.Dataset:
    """Topographic wetness index ln((acc+1)/max(tanβ, 10⁻³)) — the
    full terrain composition as one call: ε=1 depression fill
    (hydrologic conditioning) → D8 accumulation (superstep settling)
    ∥ D8 drop geometry (one halo exchange) → pixel-keyed co-bucketed
    attach → elementwise TWI (``oracle_pins.twi_values``, the formula
    shared with the sequential replay). Returns ``(y, x, twi_u,
    spi_u)`` — TWI plus the stream power index a·tanβ (erosion
    potential; unclamped, 0 at pits) — in µ-scaled pixel units (tanβ =
    µ-drop per unit D8 distance).

    ``checkpoint_dir`` forwards to the fill superstep loop (the only
    iterative stage) for mid-pipeline resume.

    ``prefilled`` accepts an already ε=1-conditioned surface
    (``fill_sinks_tiles(..., as_result_tiles=True, eps_u=1)``) so a
    caller computing both routed flow AND wetness can pay the fill
    superstep loop once; when given, ``result`` is ignored.
    ``prepacked`` goes one further: an already packed (and optionally
    coarsened) direction exchange shared with a flow_accumulate
    caller — when given, both ``result`` and ``prefilled`` are
    ignored. ``preacc`` (requires ``prepacked``) additionally reuses a
    settled ``flow_accumulate(prepacked)`` result so the superstep
    loop itself runs once across routed-flow + wetness consumers."""
    from gridfia_ray.pipelines.fill import fill_sinks_tiles
    from gridfia_ray.stages.agg_util import bucketed_left_attach, to_arrow

    filled = (
        prefilled
        if prefilled is not None
        else fill_sinks_tiles(
            result,
            n_buckets=n_buckets,
            coarsen=fill_coarsen,
            as_result_tiles=True,
            eps_u=1,
            checkpoint_dir=checkpoint_dir,
        ).materialize()
    )
    # ONE direction exchange feeds both the superstep routing and the
    # TWI slope term (the packed tiles carry the drop buffer); coarsen
    # before the settle loop — the filled surface drains to the border,
    # so rounds ≈ winding path length / tile size (clamped to a grid
    # divisor; 1 = no-op on grids coarsening can't tile exactly)
    if preacc is not None and prepacked is None:
        raise ValueError("wetness_index_tiles: preacc requires prepacked")
    if prepacked is not None:
        packed = prepacked
    else:
        packed = flow_direction_packed(filled, n_buckets=n_buckets).materialize()
        packed = coarsen_packed_tiles(
            packed, grid_divisor_factor(packed, flow_coarsen)
        ).materialize()
    acc = preacc if preacc is not None else flow_accumulate(packed)
    drops = drops_from_packed(packed).map_batches(
        lambda b: b.select(["y", "x", "drop_u", "diag"]),
        batch_format="pyarrow",
    )
    left_schema = pa.schema(
        [("y", pa.int64()), ("x", pa.int64()), ("dir", pa.int64()),
         ("acc", pa.int64())]
    )
    right_schema = pa.schema(
        [("y", pa.int64()), ("x", pa.int64()), ("drop_u", pa.int64()),
         ("diag", pa.int64())]
    )
    j = bucketed_left_attach(
        acc, drops, on=["y", "x"],
        left_schema=left_schema, right_schema=right_schema,
        n_buckets=min(n_buckets, 32),
    )
    out_schema = pa.schema(
        [("y", pa.int64()), ("x", pa.int64()), ("twi_u", pa.int64()),
         ("spi_u", pa.int64())]
    )

    def twi_map(b: pd.DataFrame) -> pa.Table:
        from gridfia_ray.oracle_pins import spi_values, twi_values

        if b["drop_u"].isna().any():
            raise ValueError("wetness_index: acc pixel missing its drop row")
        acc = b["acc"].to_numpy(np.float64)
        drop = b["drop_u"].to_numpy(np.float64)
        diag = b["diag"].to_numpy(np.float64)
        twi = twi_values(acc, drop, diag)
        spi = spi_values(acc, drop, diag)
        return to_arrow(
            pd.DataFrame(
                {
                    "y": b["y"].to_numpy(np.int64),
                    "x": b["x"].to_numpy(np.int64),
                    "twi_u": np.floor(twi * 1_000_000 + 0.5).astype(np.int64),
                    "spi_u": np.floor(spi * 1_000_000 + 0.5).astype(np.int64),
                }
            ),
            out_schema,
        )

    return j.map_batches(twi_map, batch_format="pandas")


# --- D-infinity (Tarboton 1997) --------------------------------------------

#: fixed-point denominators: flow-split weights in 2^16ths, catchment
#: area in 2^20ths of a cell. floor((w·A)>>16) keeps every push exact
#: int64 and order-independent (A is final before it is pushed), so the
#: distributed settling bit-matches the sequential replay.
DINF_W_ONE = 1 << 16
DINF_SCALE = 1 << 20

# facet table: (cardinal D8 code, diagonal D8 code, base octant ac,
# angle sign af) with global angle = ac·(π/2) + af·r, r ∈ [0, π/4]
# measured from the cardinal edge toward the diagonal.
# D8 codes: E=0, SE=1, S=2, SW=3, W=4, NW=5, N=6, NE=7.
_DINF_FACETS = (
    (0, 7, 0, 1),   # E  → NE
    (6, 7, 1, -1),  # N  → NE
    (6, 5, 1, 1),   # N  → NW
    (4, 5, 2, -1),  # W  → NW
    (4, 3, 2, 1),   # W  → SW
    (2, 3, 3, -1),  # S  → SW
    (2, 1, 3, 1),   # S  → SE
    (0, 1, 4, -1),  # E  → SE
)


def dinf_directions(vals: np.ndarray, pres: np.ndarray, h: int, w: int):
    """Tarboton D∞ over padded (h+2, w+2) µ-value/presence arrays →
    ``(dir1, dir2, w1, angle_u)`` h×w arrays: the cardinal/diagonal D8
    receiver pair of the steepest facet, the cardinal share ``w1`` in
    2^16ths (w2 = 2^16 − w1; dir2 = −1 when the flow is purely
    cardinal), and the flow angle in µ-radians (−1 at pits). Facets
    need BOTH neighbors present; ties take the first facet in table
    order (strict > — the D8 tie-break convention). Every operation is
    elementwise, so the bits are identical between the tile-halo and
    full-grid (replay) callers."""
    z0 = vals[1 : h + 1, 1 : w + 1].astype(np.float64)
    qtr = np.pi / 4.0
    best_s = np.zeros((h, w), np.float64)
    best_r = np.zeros((h, w), np.float64)
    best_k = np.full((h, w), -1, np.int64)
    for k, (c_code, d_code, _ac, _af) in enumerate(_DINF_FACETS):
        cdy, cdx = D8_OFFSETS[c_code]
        ddy, ddx = D8_OFFSETS[d_code]
        zc = vals[1 + cdy : 1 + cdy + h, 1 + cdx : 1 + cdx + w].astype(np.float64)
        zd = vals[1 + ddy : 1 + ddy + h, 1 + ddx : 1 + ddx + w].astype(np.float64)
        ok = (
            pres[1 + cdy : 1 + cdy + h, 1 + cdx : 1 + cdx + w] == 1
        ) & (pres[1 + ddy : 1 + ddy + h, 1 + ddx : 1 + ddx + w] == 1)
        s1 = z0 - zc
        s2 = zc - zd
        r = np.arctan2(s2, s1)
        s = np.hypot(s1, s2)
        low = r < 0.0
        r = np.where(low, 0.0, r)
        s = np.where(low, s1, s)
        high = r > qtr
        r = np.where(high, qtr, r)
        s = np.where(high, (z0 - zd) / np.sqrt(2.0), s)
        better = ok & (s > 0.0) & (s > best_s)
        best_s = np.where(better, s, best_s)
        best_r = np.where(better, r, best_r)
        best_k = np.where(better, k, best_k)
    dir1 = np.full((h, w), -1, np.int64)
    dir2 = np.full((h, w), -1, np.int64)
    w1 = np.zeros((h, w), np.int64)
    angle_u = np.full((h, w), -1, np.int64)
    for k, (c_code, d_code, ac, af) in enumerate(_DINF_FACETS):
        m = best_k == k
        if not m.any():
            continue
        wc = np.floor((1.0 - best_r[m] / qtr) * DINF_W_ONE + 0.5).astype(
            np.int64
        )
        wc = np.clip(wc, 0, DINF_W_ONE)
        dir1[m] = c_code
        w1[m] = wc
        # diagonal receiver only where it actually gets flow
        dir2[m] = np.where(wc < DINF_W_ONE, d_code, -1)
        ang = ac * (np.pi / 2.0) + af * best_r[m]
        # facet 8 (E→SE) with r = 0 lands on exactly 2π — normalize to
        # [0, 2π) so due-east flow has ONE encoding on every row
        ang = np.where(ang >= 2.0 * np.pi, ang - 2.0 * np.pi, ang)
        angle_u[m] = np.floor(ang * 1_000_000 + 0.5).astype(np.int64)
    return dir1, dir2, w1, angle_u


def dinf_packed(result: rd.Dataset, n_buckets: int = 64) -> rd.Dataset:
    """One halo exchange → packed per-tile D∞ rows (z, dir1, dir2, w1,
    angle) — the D∞ twin of :func:`flow_direction_packed`."""
    out_schema = pa.schema(
        [
            ("metric", pa.string()),
            ("tile_row", pa.int64()),
            ("tile_col", pa.int64()),
            ("h", pa.int64()),
            ("w", pa.int64()),
            ("z", pa.binary()),
            ("dir1", pa.binary()),
            ("dir2", pa.binary()),
            ("w1", pa.binary()),
            ("angle", pa.binary()),
        ]
    )
    empty = pa.table(
        {f.name: pa.array([], f.type) for f in out_schema}, schema=out_schema
    )

    def assemble(group: pd.DataFrame) -> pd.DataFrame:
        padded = strips_to_padded(group, "dinf_direction")
        if padded is None:
            return empty.to_pandas()
        vals, pres, h, w = padded
        d1, d2, w1, ang = dinf_directions(vals, pres, h, w)
        return pd.DataFrame(
            {
                "metric": [group["metric"].iloc[0]],
                "tile_row": [int(group["tile_row"].iloc[0])],
                "tile_col": [int(group["tile_col"].iloc[0])],
                "h": [h],
                "w": [w],
                "z": [vals[1 : h + 1, 1 : w + 1].tobytes()],
                "dir1": [d1.astype(np.int8).tobytes()],
                "dir2": [d2.astype(np.int8).tobytes()],
                "w1": [w1.astype(np.int32).tobytes()],
                "angle": [ang.tobytes()],
            }
        )

    from gridfia_ray.stages.agg_util import bucketed_group_map

    return bucketed_group_map(
        _halo_explode(result, "dinf_direction"),
        ["metric", "tile_row", "tile_col"],
        assemble,
        n_buckets=n_buckets,
        out_schema=out_schema,
    )


def _dinf_local_solve(z, dir1, dir2, w1, ext, tr, tc, emit_pixels):
    """Tile-local D∞ accumulation: descending-z push of fixed-point
    catchment (A in 2^20ths of a cell, incl. the cell itself); each
    receiver gets floor(w·A / 2^16). ``ext``: local (y, x) → external
    int inflow. Returns (A h×w | None, crossing rows)."""
    h, w = z.shape
    n = h * w
    down1, cross1 = _downstream(z, dir1, tr, tc)
    down2, cross2 = _downstream(z, dir2, tr, tc)
    acc = [DINF_SCALE] * n
    for (ly, lx), k in ext.items():
        acc[ly * w + lx] += int(k)
    w1f = w1.ravel().tolist()
    d1l, d2l = down1.tolist(), down2.tolist()
    out: dict[tuple[int, int, int, int], int] = {}
    order = np.argsort(-z.ravel(), kind="stable")
    for u in order.tolist():
        a = acc[u]
        wc = w1f[u]
        for dn, cross, wgt in ((d1l[u], cross1, wc), (d2l[u], cross2, DINF_W_ONE - wc)):
            if wgt <= 0:
                continue
            push = (wgt * a) >> 16
            if push <= 0:
                continue
            if dn >= 0:
                acc[dn] += push
            elif dn == -2:
                key = cross1[u] if cross is cross1 else cross2[u]
                out[key] = out.get(key, 0) + push
    rows = [(a, b, c, d, m) for (a, b, c, d), m in out.items()]
    if not emit_pixels:
        return None, rows
    return np.asarray(acc, dtype=np.int64).reshape(h, w), rows


def _dinf_round_map(inflow_ref, emit_pixels: bool):
    def fn(batch: pa.Table) -> pa.Table:
        inflow = ray.get(inflow_ref)
        trs, tcs, tys, txs, cnt = [], [], [], [], []
        pys, pxs, pang, pacc = [], [], [], []
        for i in range(batch.num_rows):
            h = int(batch["h"][i].as_py())
            w = int(batch["w"][i].as_py())
            tr = int(batch["tile_row"][i].as_py())
            tc = int(batch["tile_col"][i].as_py())
            z = np.frombuffer(batch["z"][i].as_py(), np.int64).reshape(h, w)
            d1 = np.frombuffer(batch["dir1"][i].as_py(), np.int8).reshape(h, w)
            d2 = np.frombuffer(batch["dir2"][i].as_py(), np.int8).reshape(h, w)
            w1 = np.frombuffer(batch["w1"][i].as_py(), np.int32).reshape(h, w)
            ang = np.frombuffer(batch["angle"][i].as_py(), np.int64).reshape(h, w)
            ext = inflow.get((tr, tc), {})
            acc, rows = _dinf_local_solve(
                z, d1, d2, w1, ext, tr, tc, emit_pixels
            )
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
                pang.append(ang.ravel())
                pacc.append(acc.ravel())
        if emit_pixels:
            return pa.table(
                {
                    "y": pa.array(np.concatenate(pys) if pys else [], pa.int64()),
                    "x": pa.array(np.concatenate(pxs) if pxs else [], pa.int64()),
                    "angle_u": pa.array(
                        np.concatenate(pang) if pang else [], pa.int64()
                    ),
                    "acc_fp": pa.array(
                        np.concatenate(pacc) if pacc else [], pa.int64()
                    ),
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


def dinf_accumulate(packed: rd.Dataset, max_rounds: int = 64) -> rd.Dataset:
    """D∞ superstep loop to the exact fixed point (same cross-flow
    fold protocol as :func:`flow_accumulate` — inflow totals are
    monotone, settled ⇔ unchanged) → per-pixel ``(y, x, angle_u,
    acc_fp)`` with ``acc_fp`` the total catchment including the cell
    itself in 2^20ths of a cell (floor-rounded at every split, so mass
    is conserved up to the documented floor loss)."""
    packed = packed.materialize()
    inflow: dict = {}
    prev_total = -1
    for _rnd in range(max_rounds):
        flows = packed.map_batches(
            _dinf_round_map(ray.put(inflow), emit_pixels=False),
            batch_format="pyarrow",
        ).to_pandas()
        total = int(flows["count"].sum()) if len(flows) else 0
        if total == prev_total:
            break
        prev_total = total
        if len(flows) == 0:
            # zero crossings (e.g. fully coarsened single tile): Ray's
            # to_pandas() drops the columns of an empty result, so the
            # groupby below would KeyError — there is nothing to fold
            inflow = {}
            continue
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
            f"dinf_accumulate: cross-tile flows did not settle within "
            f"{max_rounds} rounds"
        )
    return packed.map_batches(
        _dinf_round_map(ray.put(inflow), emit_pixels=True),
        batch_format="pyarrow",
    )


# --- flow length (ArcGIS FlowLength, upstream) ------------------------------

#: exact integer step lengths in µ-cells (both sides share the
#: constants; no float path lengths anywhere)
FLOWLEN_ORTH = 1_000_000
FLOWLEN_DIAG = 1_414_214  # round(√2 · 10⁶)


def _flowlen_local_solve(z, d8, ext, tr, tc, emit_pixels):
    """Tile-local longest-upstream-path: descending-z max-plus push
    L[rcv] = max(L[rcv], L[u] + step(u)). ``ext``: local (y, x) →
    incoming max from outside the tile."""
    h, w = z.shape
    n = h * w
    down, cross_key = _downstream(z, d8, tr, tc)
    ln = [0] * n
    for (ly, lx), k in ext.items():
        i = ly * w + lx
        if int(k) > ln[i]:
            ln[i] = int(k)
    d8f = d8.ravel().tolist()
    down_l = down.tolist()
    out: dict[tuple[int, int, int, int], int] = {}
    for u in np.argsort(-z.ravel(), kind="stable").tolist():
        c = down_l[u]
        if c == -1:
            continue
        step = FLOWLEN_DIAG if d8f[u] % 2 == 1 else FLOWLEN_ORTH
        cand = ln[u] + step
        if c >= 0:
            if cand > ln[c]:
                ln[c] = cand
        else:  # boundary crossing
            key = cross_key[u]
            if cand > out.get(key, 0):
                out[key] = cand
    rows = [(a, b, c, d, m) for (a, b, c, d), m in out.items()]
    if not emit_pixels:
        return None, rows
    return np.asarray(ln, dtype=np.int64).reshape(h, w), rows


def _flowlen_round_map(inflow_ref, emit_pixels: bool):
    def fn(batch: pa.Table) -> pa.Table:
        inflow = ray.get(inflow_ref)
        trs, tcs, tys, txs, cnt = [], [], [], [], []
        pys, pxs, plen = [], [], []
        for i in range(batch.num_rows):
            h = int(batch["h"][i].as_py())
            w = int(batch["w"][i].as_py())
            tr = int(batch["tile_row"][i].as_py())
            tc = int(batch["tile_col"][i].as_py())
            z = np.frombuffer(batch["z"][i].as_py(), np.int64).reshape(h, w)
            d8 = np.frombuffer(batch["dir"][i].as_py(), np.int8).reshape(h, w)
            ext = inflow.get((tr, tc), {})
            ln, rows = _flowlen_local_solve(z, d8, ext, tr, tc, emit_pixels)
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
                plen.append(ln.ravel())
        if emit_pixels:
            return pa.table(
                {
                    "y": pa.array(np.concatenate(pys) if pys else [], pa.int64()),
                    "x": pa.array(np.concatenate(pxs) if pxs else [], pa.int64()),
                    "flen_u": pa.array(
                        np.concatenate(plen) if plen else [], pa.int64()
                    ),
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


def flow_length_upstream(packed: rd.Dataset, max_rounds: int = 64) -> rd.Dataset:
    """Longest upstream D8 flow-path length per pixel in exact integer
    µ-cells (ortho 10⁶, diag 1414214) — ArcGIS FlowLength (UPSTREAM)
    over :func:`flow_direction_packed`'s tiles. Same superstep protocol
    as accumulation; per-(target) cross maxima are monotone
    non-decreasing, settled ⇔ the fold total is unchanged."""
    packed = packed.materialize()
    inflow: dict = {}
    prev_total = -1
    for _rnd in range(max_rounds):
        flows = packed.map_batches(
            _flowlen_round_map(ray.put(inflow), emit_pixels=False),
            batch_format="pyarrow",
        ).to_pandas()
        total = int(flows["count"].sum()) if len(flows) else 0
        if total == prev_total:
            break
        prev_total = total
        if len(flows) == 0:
            # zero crossings (e.g. fully coarsened single tile): Ray's
            # to_pandas() drops the columns of an empty result, so the
            # groupby below would KeyError — there is nothing to fold
            inflow = {}
            continue
        agg = flows.groupby(
            ["tile_row", "tile_col", "ty", "tx"], as_index=False
        )["count"].max()
        nxt: dict = {}
        for r in agg.itertuples(index=False):
            nxt.setdefault((int(r.tile_row), int(r.tile_col)), {})[
                (int(r.ty), int(r.tx))
            ] = int(r.count)
        inflow = nxt
    else:
        raise RuntimeError(
            f"flow_length_upstream: cross maxima did not settle within "
            f"{max_rounds} rounds"
        )
    return packed.map_batches(
        _flowlen_round_map(ray.put(inflow), emit_pixels=True),
        batch_format="pyarrow",
    )
