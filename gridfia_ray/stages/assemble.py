"""Species-stack assembly + kernel execution (the keyed shuffle).

The tabular replacement for the reference's sequential chunk loop
(``gridfia/core/processors/forest_metrics.py:316-438``): species rows of
one tile position are co-located by ``cell_id`` and the kernel chain runs
once per assembled ``(S, h, w)`` stack.

Scale design (SURVEY.md §7.4): cells are NOT the groupby key — with 10^12
tiles that would be billions of tiny groups. Instead cells hash into
``n_buckets`` salted buckets (avalanched cell_id modulo B, so Z-order
stripes don't skew buckets), the shuffle runs per bucket, and the group
function assembles the many cells inside one bucket with vectorized
pandas/numpy. One bucket ≈ a few hundred MB decoded; every cell's rows
land in exactly one bucket, so results are partition-invariant.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from gridfia_ray.kernels.base import Kernel, KernelContext

_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)


def salted_bucket(cell_id: np.ndarray, n_buckets: int) -> np.ndarray:
    """Avalanche-hash cell ids then fold modulo B (balanced buckets even
    for spatially-clustered Z-order keys)."""
    x = np.asarray(cell_id, dtype=np.int64).view(np.uint64)
    with np.errstate(over="ignore"):
        x = (x ^ (x >> np.uint64(33))) * _P2
        x = (x ^ (x >> np.uint64(29))) * _P3
        x = x ^ (x >> np.uint64(32))
    return (x % np.uint64(n_buckets)).astype(np.int32)


def add_bucket_column(n_buckets: int):
    def fn(batch: pa.Table) -> pa.Table:
        b = salted_bucket(batch["cell_id"].to_numpy(), n_buckets)
        return batch.append_column("bucket", pa.array(b, pa.int32()))

    return fn


RESULT_COLUMNS = [
    "cell_id",
    "tile_row",
    "tile_col",
    "metric",
    "units",
    "dtype",
    "h",
    "w",
    "pix",
    "status",
]


def _catalog_rank(codes: pd.Series, catalog: list[str]) -> np.ndarray:
    pos = {c: i for i, c in enumerate(catalog)}
    return codes.map(lambda c: pos.get(c, len(pos))).to_numpy()


def make_kernel_group_fn(kernels: list[Kernel], ctx: KernelContext):
    """Group function for ``groupby('bucket').map_groups`` — assembles
    each cell's species stack and runs every kernel on it (operator
    fusion: one shuffle feeds all metrics, like the reference's single
    chunk loop feeding all calculations)."""
    catalog = ctx.catalog
    math_dtype = (
        np.float64
        if any(np.dtype(k.output_dtype) == np.float64 for k in kernels)
        else np.float32
    )

    def run(group: pd.DataFrame) -> pd.DataFrame:
        group = group[group["status"] == "ok"]
        out: dict[str, list] = {c: [] for c in RESULT_COLUMNS}
        if len(group) == 0:
            return pd.DataFrame(out)
        order = np.lexsort(
            (_catalog_rank(group["species_code"], catalog), group["cell_id"].to_numpy())
        )
        group = group.iloc[order]
        cell_ids = group["cell_id"].to_numpy()
        bounds = np.flatnonzero(np.r_[True, cell_ids[1:] != cell_ids[:-1], True])
        pix = group["pix"].to_numpy()
        codes_all = group["species_code"].to_numpy()
        hs = group["h"].to_numpy()
        ws = group["w"].to_numpy()
        trs = group["tile_row"].to_numpy()
        tcs = group["tile_col"].to_numpy()
        for s, e in zip(bounds[:-1], bounds[1:]):
            h, w = int(hs[s]), int(ws[s])
            codes = codes_all[s:e]
            stack = np.empty((e - s, h, w), dtype=math_dtype)
            for j in range(s, e):
                stack[j - s] = np.frombuffer(pix[j], dtype="<f4").reshape(h, w)
            for k in kernels:
                try:
                    res = k.calculate(stack, codes, ctx)
                    res = np.ascontiguousarray(res, dtype=np.dtype(k.output_dtype))
                    status = "ok"
                except Exception as exc:  # NaN/sentinel protocol
                    res = np.full((h, w), k.fill_value(), dtype=np.dtype(k.output_dtype))
                    status = f"failed:{type(exc).__name__}"
                out["cell_id"].append(int(cell_ids[s]))
                out["tile_row"].append(int(trs[s]))
                out["tile_col"].append(int(tcs[s]))
                out["metric"].append(k.name)
                out["units"].append(k.units)
                out["dtype"].append(res.dtype.str)
                out["h"].append(h)
                out["w"].append(w)
                out["pix"].append(res.tobytes())
                out["status"].append(status)
        return pd.DataFrame(out)

    return run


def downsample_result_tiles(result, factor: int = 2, scaled_int: bool = True):
    """Overview-pyramid level over result tiles: ``factor``×``factor``
    block-SUM pooling — the mass-conserving reducer for quantity rasters
    (total biomass at a coarser cell IS the sum of its children), and
    the standard overview construction coarsened one level per call.

    Pure ``map_batches`` — a block never crosses its tile, so there is
    NO shuffle at any corpus size; tile keys (tile_row, tile_col) are
    unchanged, only h/w shrink. ``scaled_int=True`` pools in the
    micro-scaled integer domain (floor(v·1e6+0.5) per source pixel,
    int64 sums): bit-exact, partition/order-invariant, directly
    comparable to a SQL oracle. ``scaled_int=False`` pools float64 sums
    (last-ulp order sensitivity inherent to float addition).

    ``factor`` must divide every tile's h and w — raises otherwise
    (partial edge blocks would silently mix pyramid semantics).
    """
    if factor < 2:
        raise ValueError(f"factor must be >= 2, got {factor}")

    def pool(batch: pa.Table) -> pa.Table:
        metrics, trs, tcs, hs, ws, pixs, dts = [], [], [], [], [], [], []
        for i in range(batch.num_rows):
            h = int(batch["h"][i].as_py())
            w = int(batch["w"][i].as_py())
            if h % factor or w % factor:
                raise ValueError(
                    f"downsample factor {factor} does not divide tile "
                    f"{h}x{w} — partial edge blocks are not supported"
                )
            src_dtype = np.dtype(batch["dtype"][i].as_py())
            arr = np.frombuffer(batch["pix"][i].as_py(), dtype=src_dtype).reshape(h, w)
            if scaled_int:
                if np.issubdtype(src_dtype, np.integer):
                    raise ValueError(
                        "downsample_result_tiles(scaled_int=True) on an "
                        "integer tile — the input is already in the scaled "
                        "domain and re-scaling would inflate values 1e6×; "
                        "pass scaled_int=False to pool further levels"
                    )
                u = np.floor(arr.astype(np.float64) * 1_000_000 + 0.5).astype(np.int64)
                pooled = u.reshape(h // factor, factor, w // factor, factor).sum(
                    axis=(1, 3)
                )
                dts.append("int64")
            elif np.issubdtype(src_dtype, np.integer):
                # Integer tiles (e.g. level-1 scaled-int pyramids) stay in
                # int64 so chained levels compose bit-exactly even past
                # 2**53, where a float64 accumulator would round.
                pooled = (
                    arr.astype(np.int64)
                    .reshape(h // factor, factor, w // factor, factor)
                    .sum(axis=(1, 3))
                )
                dts.append("int64")
            else:
                pooled = (
                    arr.astype(np.float64)
                    .reshape(h // factor, factor, w // factor, factor)
                    .sum(axis=(1, 3))
                )
                dts.append("float64")
            metrics.append(batch["metric"][i].as_py())
            trs.append(int(batch["tile_row"][i].as_py()))
            tcs.append(int(batch["tile_col"][i].as_py()))
            hs.append(h // factor)
            ws.append(w // factor)
            pixs.append(pooled.tobytes())
        return pa.table(
            {
                "metric": pa.array(metrics, pa.string()),
                "tile_row": pa.array(trs, pa.int64()),
                "tile_col": pa.array(tcs, pa.int64()),
                "h": pa.array(hs, pa.int64()),
                "w": pa.array(ws, pa.int64()),
                "pix": pa.array(pixs, pa.binary()),
                "dtype": pa.array(dts, pa.string()),
            }
        )

    return result.map_batches(pool, batch_format="pyarrow")


def explode_result_pixels(batch: pa.Table) -> pa.Table:
    """Result tiles → long (metric, y, x, value float64) rows.

    Small-scale oracle/reporting helper — at data scale results stay
    tiled; this is the raster→table unpivot for keyed comparisons.
    """
    metrics, ys, xs, vals = [], [], [], []
    for i in range(batch.num_rows):
        h = int(batch["h"][i].as_py())
        w = int(batch["w"][i].as_py())
        arr = np.frombuffer(
            batch["pix"][i].as_py(), dtype=np.dtype(batch["dtype"][i].as_py())
        ).reshape(h, w)
        gy = int(batch["tile_row"][i].as_py()) * h
        gx = int(batch["tile_col"][i].as_py()) * w
        yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        metrics.append(np.repeat(np.array([batch["metric"][i].as_py()]), h * w))
        ys.append((yy + gy).ravel().astype(np.int32))
        xs.append((xx + gx).ravel().astype(np.int32))
        vals.append(arr.astype(np.float64).ravel())
    if not metrics:
        return pa.table(
            {
                "metric": pa.array([], pa.string()),
                "y": pa.array([], pa.int32()),
                "x": pa.array([], pa.int32()),
                "value": pa.array([], pa.float64()),
            }
        )
    return pa.table(
        {
            "metric": pa.array(np.concatenate(metrics), pa.string()),
            "y": pa.array(np.concatenate(ys), pa.int32()),
            "x": pa.array(np.concatenate(xs), pa.int32()),
            "value": pa.array(np.concatenate(vals), pa.float64()),
        }
    )


def mosaic_result_tiles(
    sources: list, policy: str = "last", n_buckets: int = 64
):
    """Mosaic N result-tile datasets onto one grid (the gdal_merge /
    mosaicking operation): tiles sharing a (metric, tile_row, tile_col)
    key combine per ``policy`` —

      * ``"last"``  — the highest-indexed source that has the tile wins
                      (the standard later-acquisition-overrides rule);
      * ``"sum"``   — elementwise sum (mass accumulates);
      * ``"max"``   — elementwise max (best-observation composite).

    One keyed exchange on the tile key; non-overlapping tiles pass
    through untouched. ``sum``/``max`` require every overlapping tile
    pair to share (h, w, dtype) and — for exactness — the scaled-int
    domain; ``last`` never touches pixels at all. All policies are
    deterministic and partition-invariant (source index, not arrival
    order, breaks ties)."""
    import ray.data as rd

    from gridfia_ray.stages.agg_util import bucketed_group_map

    if policy not in ("last", "sum", "max"):
        raise ValueError(f"unknown mosaic policy {policy!r}")
    if len(sources) < 2:
        raise ValueError("mosaic needs at least two sources")

    def tag(idx: int):
        def add(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "__src", pa.array(np.full(batch.num_rows, idx, np.int32))
            )

        return add

    tagged = sources[0].map_batches(tag(0), batch_format="pyarrow")
    for i, s in enumerate(sources[1:], start=1):
        tagged = tagged.union(s.map_batches(tag(i), batch_format="pyarrow"))

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("__src", kind="mergesort")
        if g["__src"].duplicated().any():
            raise ValueError(
                "mosaic: duplicate tile within one source at "
                f"{(g['metric'].iloc[0], int(g['tile_row'].iloc[0]), int(g['tile_col'].iloc[0]))}"
                " — 'last' would be nondeterministic and 'sum' would "
                "double-count; dedup the source first"
            )
        if policy == "last" or len(g) == 1:
            out = g.iloc[[-1]]
            return out.drop(columns=["__src"])
        h0, w0, dt0 = int(g["h"].iloc[0]), int(g["w"].iloc[0]), g["dtype"].iloc[0]
        if not ((g["h"] == h0).all() and (g["w"] == w0).all() and (g["dtype"] == dt0).all()):
            raise ValueError(
                f"mosaic {policy}: overlapping tiles disagree on shape/dtype "
                f"at {(g['metric'].iloc[0], int(g['tile_row'].iloc[0]), int(g['tile_col'].iloc[0]))}"
            )
        arrs = [np.frombuffer(b, dtype=np.dtype(dt0)) for b in g["pix"]]
        acc = arrs[0].copy()
        for a in arrs[1:]:
            acc = acc + a if policy == "sum" else np.maximum(acc, a)
        out = g.iloc[[0]].drop(columns=["__src"]).copy()
        out["pix"] = [acc.tobytes()]
        return out

    out_schema = pa.schema(
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
    return bucketed_group_map(
        tagged,
        ["metric", "tile_row", "tile_col"],
        combine,
        n_buckets=n_buckets,
        out_schema=out_schema,
    )


def downsample_majority_tiles(result, factor: int = 2):
    """Overview level for CATEGORICAL rasters (labels, dominant-species
    indices): ``factor``×``factor`` block MODE pooling, ties toward the
    SMALLEST value — GDAL's ``mode`` resampling. Pure ``map_batches``
    like the sum pyramid (a block never crosses its tile, NO shuffle at
    any corpus size); integer tiles pass through unscaled, float tiles
    µ-scale first (mode is scale-invariant, so the µ hop only matters
    for the emitted dtype). Vectorized mode: sort the f² block values,
    run-length by cumulative equality, first maximal run's end =
    smallest modal value."""
    if factor < 2:
        raise ValueError(f"factor must be >= 2, got {factor}")

    def pool(batch: pa.Table) -> pa.Table:
        metrics, trs, tcs, hs, ws, pixs, dts = [], [], [], [], [], [], []
        for i in range(batch.num_rows):
            h = int(batch["h"][i].as_py())
            w = int(batch["w"][i].as_py())
            if h % factor or w % factor:
                raise ValueError(
                    f"downsample factor {factor} does not divide tile "
                    f"{h}x{w} — partial edge blocks are not supported"
                )
            src_dtype = np.dtype(batch["dtype"][i].as_py())
            arr = np.frombuffer(
                batch["pix"][i].as_py(), dtype=src_dtype
            ).reshape(h, w)
            if np.issubdtype(src_dtype, np.integer):
                u = arr.astype(np.int64)
            else:
                u = np.floor(
                    arr.astype(np.float64) * 1_000_000 + 0.5
                ).astype(np.int64)
            f2 = factor * factor
            blocks = (
                u.reshape(h // factor, factor, w // factor, factor)
                .transpose(0, 2, 1, 3)
                .reshape(h // factor, w // factor, f2)
            )
            s = np.sort(blocks, axis=2)
            run = np.ones_like(s)
            for kk in range(1, f2):
                run[:, :, kk] = np.where(
                    s[:, :, kk] == s[:, :, kk - 1], run[:, :, kk - 1] + 1, 1
                )
            first_max = np.argmax(run, axis=2)  # first max = smallest mode
            maj = np.take_along_axis(s, first_max[:, :, None], axis=2)[:, :, 0]
            metrics.append(batch["metric"][i].as_py())
            trs.append(int(batch["tile_row"][i].as_py()))
            tcs.append(int(batch["tile_col"][i].as_py()))
            hs.append(h // factor)
            ws.append(w // factor)
            pixs.append(np.ascontiguousarray(maj).tobytes())
            dts.append("int64")
        return pa.table(
            {
                "metric": pa.array(metrics, pa.string()),
                "tile_row": pa.array(trs, pa.int64()),
                "tile_col": pa.array(tcs, pa.int64()),
                "h": pa.array(hs, pa.int64()),
                "w": pa.array(ws, pa.int64()),
                "pix": pa.array(pixs, pa.binary()),
                "dtype": pa.array(dts, pa.string()),
            }
        )

    return result.map_batches(pool, batch_format="pyarrow")
