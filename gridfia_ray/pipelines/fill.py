"""Depression filling (sink removal) — the hydrology-conditioning step
before flow routing: raise every pixel to the lowest level from which
water can still reach the raster edge,

    W = the least fixpoint of  W(c) = max(E(c), min_{n ∈ 8-nbrs} W(n))
    with W = E on the global border,

i.e. Planchon & Darboux (2001) with ε = 0 (flats preserved), equal to
Barnes et al. (2014) Priority-Flood — which is exactly what the pinned
sequential replay runs (an INDEPENDENT heap algorithm, not a re-run of
this relaxation; integer arithmetic makes the two agree bit-for-bit).

Distributed shape — the cost-distance superstep family
(``pipelines/costdist.py``, whose tile-state schema and strip protocol
this module reuses verbatim with cost→elevation, dist→water level):

* state = one row per tile (µ-int64 elevation + water buffers); water
  starts at E on global-border pixels, +INF elsewhere (a missing halo
  side therefore needs no special case: border pixels are already at
  their floor).
* each superstep is ONE keyed exchange — 1-px water/elevation border
  strips to the 8 neighbors — then a vectorized tile-local relaxation
  to the tile's fixpoint against the frozen read-only halo:
  alternating directional passes (down pass folds the three upper
  neighbors row-vectorized, up pass the three lower, left/right passes
  column-vectorized), each ``W ← max(E, min(W, neighbor W))``; the
  four passes cover all 8 neighbors, and W is monotone non-increasing
  from +INF so the loop converges in O(tile diameter) passes.
* the driver holds one integer per round (changed-tile count);
  convergence in O(tile-graph diameter) exchanges. Optional
  ``checkpoint_dir`` makes the loop resumable through
  ``state.manifest.RunManifest`` exactly like cost distance.

No counterpart in the GridFIA reference (its map algebra is per-pixel);
this is the standard companion to the flow-accumulation / watershed
family already in ``pipelines/flow.py``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from gridfia_ray.pipelines.costdist import (
    _INF,
    _STATE,
    _padded_from_group,
    _strip_rows,
)

_TILE_SCHEMA = pa.schema(
    [
        ("metric", pa.string()),
        ("tile_row", pa.int64()),
        ("tile_col", pa.int64()),
        ("h", pa.int64()),
        ("w", pa.int64()),
        ("pix", pa.binary()),
        ("dtype", pa.string()),
    ]
)

_OUT = pa.schema(
    [
        ("metric", pa.string()),
        ("y", pa.int64()),
        ("x", pa.int64()),
        ("fill_u", pa.int64()),
        ("depth_u", pa.int64()),
    ]
)


def _fill_local(W_p: np.ndarray, E_p: np.ndarray, eps: int = 0) -> None:
    """Relax the PADDED water array in place to the tile-local least
    fixpoint of ``W = max(E, min_nbr (W + eps))``; halo ring is
    read-only. ``eps`` = 0 preserves flats (pure Planchon-Darboux);
    ``eps`` = 1 µ-unit imposes the standard drainage gradient so D8 has
    a strict descent everywhere off the border (Priority-Flood-ε)."""
    H, Wd = W_p.shape
    eps = np.int64(eps)

    def _upd(y_sl, x_sl, cand) -> bool:
        new = np.maximum(
            E_p[y_sl, x_sl], np.minimum(W_p[y_sl, x_sl], cand + eps)
        )
        ch = bool((new != W_p[y_sl, x_sl]).any())
        W_p[y_sl, x_sl] = new
        return ch

    limit = 4 * (H + Wd) + 16
    for _ in range(limit):
        changed = False
        for y in range(1, H - 1):  # down: up-left, up, up-right
            up = W_p[y - 1]
            cand = np.minimum(np.minimum(up[1:-1], up[:-2]), up[2:])
            changed |= _upd(y, slice(1, -1), cand)
        for y in range(H - 2, 0, -1):  # up: down-left, down, down-right
            dn = W_p[y + 1]
            cand = np.minimum(np.minimum(dn[1:-1], dn[:-2]), dn[2:])
            changed |= _upd(y, slice(1, -1), cand)
        for x in range(1, Wd - 1):  # right: left neighbor
            changed |= _upd(slice(1, -1), x, W_p[1:-1, x - 1])
        for x in range(Wd - 2, 0, -1):  # left: right neighbor
            changed |= _upd(slice(1, -1), x, W_p[1:-1, x + 1])
        if not changed:
            return
    raise RuntimeError("fill_sinks: tile-local relaxation did not converge")


def _solve_group(group: pd.DataFrame, eps: int = 0) -> pd.DataFrame:
    padded = _padded_from_group(group)
    if padded is None:
        return pd.DataFrame({f.name: [] for f in _STATE})
    r, h, w, water, water_p, elev_p = padded
    _fill_local(water_p, elev_p, eps)
    new = water_p[1:-1, 1:-1]
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
                "changed": int((new != water).any()),
            }
        ]
    )


def fill_sinks_tiles(
    result: rd.Dataset,
    n_buckets: int = 64,
    max_rounds: int = 512,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 1,
    coarsen: int = 4,
    as_result_tiles: bool = False,
    eps_u: int = 0,
) -> rd.Dataset:
    """Depression-fill a result-tile dataset (``run_metrics`` schema) →
    long rows ``(metric, y, x, fill_u, depth_u)`` with ``fill_u`` the
    filled µ-elevation and ``depth_u = fill_u − elev_u`` the standing
    water depth (0 outside depressions).

    ``coarsen`` merges ``coarsen``×``coarsen`` tile blocks into
    super-tiles before the loop (costdist's ``_coarsen_state``, shared
    schema): round count is bounded by how often the WINDING drainage
    path of the deepest nested depression crosses tile borders — O(path
    length / tile size), much worse than the tile-graph diameter — so
    trading per-round local-solve work for rounds is the right deal
    (the local solve is alternating directional sweeps, one spiral turn
    per sweep, all vectorized).

    ``as_result_tiles`` returns the FILLED surface in the result-tile
    schema instead of long pixel rows — the hydrology-conditioning
    hand-off (fill → D8 routing): depressions break D8 directions, so
    flow pipelines should consume ``fill_sinks_tiles(...,
    as_result_tiles=True)`` rather than the raw DEM. Note the emitted
    tiles keep the COARSENED super-tile dims."""
    from gridfia_ray.stages.agg_util import (
        bucketed_group_map,
        to_arrow,
    )

    # raster extent → which pixels sit on the global border
    nty = int(result.max("tile_row") or 0) + 1
    ntx = int(result.max("tile_col") or 0) + 1

    def init(batch: pd.DataFrame) -> pa.Table:
        rows = []
        for _, r in batch.iterrows():
            h, w = int(r["h"]), int(r["w"])
            arr = np.frombuffer(r["pix"], np.dtype(r["dtype"])).reshape(h, w)
            e = np.floor(
                arr.astype(np.float64) * 1_000_000 + 0.5
            ).astype(np.int64)
            if (e >= _INF).any():
                raise ValueError("fill_sinks: elevation overflows the domain")
            tr, tc = int(r["tile_row"]), int(r["tile_col"])
            water = np.full((h, w), _INF, np.int64)
            if tr == 0:
                water[0, :] = e[0, :]
            if tr == nty - 1:
                water[-1, :] = e[-1, :]
            if tc == 0:
                water[:, 0] = e[:, 0]
            if tc == ntx - 1:
                water[:, -1] = e[:, -1]
            rows.append(
                {
                    "metric": r["metric"],
                    "tile_row": tr,
                    "tile_col": tc,
                    "h": h,
                    "w": w,
                    "y0": tr * h,
                    "x0": tc * w,
                    "kind": 0,
                    "side": -1,
                    "cost": e.tobytes(),
                    "dist": water.tobytes(),
                    "changed": 1,
                }
            )
        return to_arrow(
            pd.DataFrame(rows, columns=[f.name for f in _STATE]), _STATE
        )

    state = result.map_batches(init, batch_format="pandas").materialize()
    if coarsen > 1:
        from gridfia_ray.pipelines.costdist import _coarsen_state

        # buckets ≈ super-tile count: surplus empty sort partitions emit
        # schema-less blocks that churn the executor's schema cache
        cb = max(1, min(n_buckets, state.count() // (coarsen * coarsen)))
        state = _coarsen_state(state, coarsen, cb).materialize()
    # ~4 groups per bucket: sparser bucketing leaves empty sort
    # partitions (schema-less pandas blocks churning the executor)
    loop_buckets = max(1, min(n_buckets, state.count() // 4))

    manifest = None
    start_round = 0
    converged = False
    if checkpoint_dir is not None:
        from gridfia_ray.io import read_parquet_clean
        from gridfia_ray.state.manifest import RunManifest

        manifest = RunManifest(checkpoint_dir)
        done = sorted(
            int(k.split("_")[1])
            for k in manifest.completed()
            if k.startswith("round_")
        )
        if done:
            latest = done[-1]
            entry = manifest.partitions[f"round_{latest}"]
            state = read_parquet_clean(
                manifest.shard_dir(f"round_{latest}")
            ).materialize()
            start_round = latest + 1
            if int(entry.get("changed", 1)) == 0:
                converged = True  # recorded state already converged
    # `converged` is NOT derived from start_round >= max_rounds:
    # resuming a non-converged checkpoint past the round budget must
    # still hit the no-convergence raise below, not silently emit a
    # partial fill

    def strips(batch: pd.DataFrame) -> pa.Table:
        rows: list[dict] = []
        for _, r in batch.iterrows():
            rows.extend(_strip_rows(r))
        return to_arrow(
            pd.DataFrame(rows, columns=[f.name for f in _STATE]), _STATE
        )

    for rnd in range(start_round, max_rounds):
        if converged:
            break
        merged = state.union(state.map_batches(strips, batch_format="pandas"))
        state = bucketed_group_map(
            merged,
            ["metric", "tile_row", "tile_col"],
            lambda g: _solve_group(g, eps_u),
            n_buckets=loop_buckets,
            out_schema=_STATE,
        ).materialize()
        changed = int(state.sum("changed") or 0)
        import os as _os

        if _os.environ.get("GRIDFIA_FILL_DEBUG"):
            import sys as _sys

            print(f"fill round {rnd}: changed={changed}", file=_sys.stderr)
        if manifest is not None and (
            rnd % checkpoint_every == 0 or changed == 0
        ):
            manifest.write_shard(
                f"round_{rnd}", state, extra={"round": rnd, "changed": changed}
            )
            import shutil

            for k in list(manifest.completed()):
                if k.startswith("round_") and int(k.split("_")[1]) < rnd:
                    shutil.rmtree(manifest.shard_dir(k), ignore_errors=True)
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"fill_sinks: no convergence in {max_rounds} supersteps"
        )

    def emit_tiles(batch: pd.DataFrame) -> pa.Table:
        rows = []
        for _, r in batch.iterrows():
            h, w = int(r["h"]), int(r["w"])
            if int(r["y0"]) != int(r["tile_row"]) * h or int(r["x0"]) != int(r["tile_col"]) * w:
                # downstream result-tile consumers (flow routing) compute
                # global coords as tile_row*h — a ragged edge super-tile
                # (tile grid not divisible by ``coarsen``) would silently
                # shift its pixels; refuse like cost_allocation does
                raise ValueError(
                    "fill_sinks: as_result_tiles requires the coarsen "
                    "factor to divide the tile grid (ragged super-tile "
                    f"at ({int(r['tile_row'])}, {int(r['tile_col'])}))"
                )
            wl = np.frombuffer(r["dist"], np.int64).reshape(h, w)
            if wl.max() >= (1 << 51):
                # beyond ~2^51 the float64 transit (·1e-6 then
                # floor(·1e6+0.5)) is off by ±1 µ-unit — refuse rather
                # than silently corrupt the fill→D8 composition
                raise ValueError(
                    "fill_sinks: filled µ-elevation exceeds the exact "
                    "float64 round-trip domain (2^51); rescale the DEM"
                )
            rows.append(
                {
                    "metric": r["metric"],
                    "tile_row": int(r["tile_row"]),
                    "tile_col": int(r["tile_col"]),
                    "h": h,
                    "w": w,
                    # µ int → float64 units; |x·10⁶ − fill_u| < 10⁻⁷ at
                    # the domain bound, so downstream µ re-scaling
                    # (floor(x·10⁶+0.5)) recovers fill_u exactly
                    "pix": (wl.astype(np.float64) * 1e-6).tobytes(),
                    "dtype": "float64",
                }
            )
        return to_arrow(pd.DataFrame(rows, columns=list(_TILE_SCHEMA.names)),
                        _TILE_SCHEMA)

    if as_result_tiles:
        return state.map_batches(emit_tiles, batch_format="pandas")

    def emit(batch: pd.DataFrame) -> pa.Table:
        frames = []
        for _, r in batch.iterrows():
            h, w = int(r["h"]), int(r["w"])
            e = np.frombuffer(r["cost"], np.int64).reshape(h, w)
            wl = np.frombuffer(r["dist"], np.int64).reshape(h, w)
            yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
            # global coords from the carried y0/x0, NOT tile_row*h: edge
            # super-tiles are ragged when coarsen doesn't divide the
            # tile grid, and tile_row*h would shift their pixels
            frames.append(
                pd.DataFrame(
                    {
                        "metric": r["metric"],
                        "y": (yy + int(r["y0"])).ravel(),
                        "x": (xx + int(r["x0"])).ravel(),
                        "fill_u": wl.ravel(),
                        "depth_u": (wl - e).ravel(),
                    }
                )
            )
        out = (
            pd.concat(frames, ignore_index=True)
            if frames
            else pd.DataFrame({f.name: [] for f in _OUT})
        )
        return to_arrow(out, _OUT)

    return state.map_batches(emit, batch_format="pandas")
