"""Distributed raster warp (reprojection) — nearest-neighbor resampling
of a tiled raster from one CRS/grid to another, as a keyed GATHER:

1. every source tile computes the destination-grid tiles its footprint
   covers (``transform_bbox`` with densified edges, ± one destination
   PIXEL of margin for forward/inverse asymmetry) and emits one copy per covered
   destination tile — fan-out ≈ area ratio, O(1–4) for comparable
   resolutions;
2. one exchange keyed on (metric, dst tile) co-locates everything a
   destination tile could sample from;
3. per destination tile: transform its pixel CENTERS back to the source
   CRS (vectorized closed-form math, ``geo/crs.py``), nearest-neighbor
   index into the gathered source tiles, NaN where no source pixel
   exists (outside the source extent).

Destination tiles whose footprint meets no source tile never
materialize — the output is sparse over the destination grid, like the
input. The transforms are pure math, so the warp is deterministic and
partition-invariant.

Reference parallel: the reference reprojects in its download path with
rasterio/pyproj (``location_config.py:301-318``); this is the
processing-side equivalent over the tile table, built on the engine's
own closed-form CRS kernels (no GDAL in this environment).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from gridfia_ray.geo.crs import transform_bbox, transform_points
from gridfia_ray.pipelines.common import GridSpec


def bilinear_blend(v00, v10, v01, v11, wx, wy):
    """The shared bilinear kernel — pipeline, pinned oracle and tests
    must run the IDENTICAL expression so f64 results are bit-equal."""
    return (
        v00 * (1.0 - wx) * (1.0 - wy)
        + v10 * wx * (1.0 - wy)
        + v01 * (1.0 - wx) * wy
        + v11 * wx * wy
    )


def warp_tiles(
    result: rd.Dataset,
    src_spec: GridSpec,
    src_crs: str,
    dst_spec: GridSpec,
    dst_crs: str,
    n_buckets: int = 64,
    resampling: str = "nearest",
) -> rd.Dataset:
    """Warp a result-tile dataset (metric, tile_row, tile_col, h, w,
    pix, dtype) onto ``dst_spec``'s grid in ``dst_crs``. Returns float64
    destination tiles in the same schema (NaN = no source coverage).
    Source tiles must match ``src_spec.tile``.

    ``resampling``: ``"nearest"`` (value copy — categorical-safe) or
    ``"bilinear"`` (4-corner weighted blend in source pixel-center
    space via :func:`bilinear_blend`; destination pixels whose 2×2
    neighborhood is not fully inside source coverage fall back to the
    nearest source pixel, so coverage equals the nearest-neighbor
    warp's). The gather pad grows by one SOURCE pixel for bilinear —
    corner pixels can live one source pixel beyond the footprint."""
    if resampling not in ("nearest", "bilinear"):
        raise ValueError(f"unknown resampling {resampling!r}")

    def cover(batch: pa.Table) -> pa.Table:
        mets, trs, tcs, strs, stcs, bufs = [], [], [], [], [], []
        cell = dst_spec.cell_size
        status = batch["status"].to_pylist() if "status" in batch.column_names else None
        for i in range(batch.num_rows):
            h = int(batch["h"][i].as_py())
            w = int(batch["w"][i].as_py())
            tr = int(batch["tile_row"][i].as_py())
            tc = int(batch["tile_col"][i].as_py())
            if status is not None and status[i] != "ok":
                raise ValueError(
                    f"warp_tiles: tile ({tr}, {tc}) has status "
                    f"{status[i]!r} — a failed tile would warp into "
                    f"silent no-coverage NaN; fix or filter it first"
                )
            if h != src_spec.tile or w != src_spec.tile:
                raise ValueError(
                    f"warp_tiles: tile ({tr}, {tc}) is {h}x{w}, expected "
                    f"{src_spec.tile}² per src_spec"
                )
            arr = np.frombuffer(
                batch["pix"][i].as_py(), dtype=np.dtype(batch["dtype"][i].as_py())
            ).astype(np.float64)
            # source tile extent (y decreases with row index)
            x0 = src_spec.origin_x + tc * src_spec.cell_size
            y1 = src_spec.origin_y - tr * src_spec.cell_size
            bbox = (x0, y1 - src_spec.cell_size, x0 + src_spec.cell_size, y1)
            dx0, dy0, dx1, dy1 = transform_bbox(bbox, src_crs, dst_crs)
            # forward/inverse asymmetry is sub-pixel for smooth
            # projections — pad by ONE destination pixel, not a tile
            # (a tile-sized margin fans every source tile out ~4x and
            # materializes all-NaN ring tiles)
            pad = dst_spec.px
            if resampling == "bilinear":
                # corners reach one SOURCE pixel past the sample point;
                # a source pixel in dst units ≈ transformed width / w
                pad += max((dx1 - dx0) / w, (dy1 - dy0) / h)
            c0 = int(np.floor((dx0 - pad - dst_spec.origin_x) / cell))
            c1 = int(np.floor((dx1 + pad - dst_spec.origin_x) / cell))
            r0 = int(np.floor((dst_spec.origin_y - (dy1 + pad)) / cell))
            r1 = int(np.floor((dst_spec.origin_y - (dy0 - pad)) / cell))
            met = batch["metric"][i].as_py()
            payload = arr.tobytes()
            for rr in range(max(r0, 0), r1 + 1):
                for cc in range(max(c0, 0), c1 + 1):
                    mets.append(met)
                    trs.append(rr)
                    tcs.append(cc)
                    strs.append(tr)
                    stcs.append(tc)
                    bufs.append(payload)
        return pa.table(
            {
                "metric": pa.array(mets, pa.string()),
                "tile_row": pa.array(trs, pa.int64()),
                "tile_col": pa.array(tcs, pa.int64()),
                "src_row": pa.array(strs, pa.int64()),
                "src_col": pa.array(stcs, pa.int64()),
                "pix": pa.array(bufs, pa.binary()),
            }
        )

    T = src_spec.tile
    D = dst_spec.tile

    def resample(group: pd.DataFrame) -> pd.DataFrame:
        srcs = {
            (int(r["src_row"]), int(r["src_col"])): np.frombuffer(
                r["pix"], dtype=np.float64
            ).reshape(T, T)
            for _, r in group.iterrows()
        }
        tr = int(group["tile_row"].iloc[0])
        tc = int(group["tile_col"].iloc[0])
        # destination pixel centers in dst CRS
        xs = dst_spec.origin_x + (tc * D + np.arange(D) + 0.5) * dst_spec.px
        ys = dst_spec.origin_y - (tr * D + np.arange(D) + 0.5) * dst_spec.px
        gx = np.broadcast_to(xs[None, :], (D, D)).ravel()
        gy = np.broadcast_to(ys[:, None], (D, D)).ravel()
        sx, sy = transform_points(gx, gy, dst_crs, src_crs)

        def gather_vals(px_x: np.ndarray, px_y: np.ndarray) -> np.ndarray:
            """Source-pixel values at global indices; NaN where the
            index is negative or its tile wasn't gathered. Lookups are
            grouped by source tile (few distinct tiles per dst tile)."""
            vals = np.full(px_x.size, np.nan)
            inb = (px_x >= 0) & (px_y >= 0)
            s_tr = px_y // T
            s_tc = px_x // T
            wy = px_y % T
            wx = px_x % T
            key = s_tr * (1 << 32) + s_tc
            for k in np.unique(key[inb]):
                stile = srcs.get((int(k >> 32), int(k & 0xFFFFFFFF)))
                if stile is None:
                    continue  # outside the source extent → stays NaN
                m = inb & (key == k)
                vals[m] = stile[wy[m], wx[m]]
            return vals

        # nearest source pixel (global indices; y grows downward)
        near_x = np.floor((sx - src_spec.origin_x) / src_spec.px).astype(np.int64)
        near_y = np.floor((src_spec.origin_y - sy) / src_spec.px).astype(np.int64)
        out = gather_vals(near_x, near_y)
        if resampling == "bilinear":
            # pixel-CENTER coordinates: fx = i means exactly on the
            # center of source column i (aligned grids blend to a copy)
            fx = (sx - src_spec.origin_x) / src_spec.px - 0.5
            fy = (src_spec.origin_y - sy) / src_spec.px - 0.5
            x0 = np.floor(fx).astype(np.int64)
            y0 = np.floor(fy).astype(np.int64)
            bwx = fx - x0
            bwy = fy - y0
            v00 = gather_vals(x0, y0)
            v10 = gather_vals(x0 + 1, y0)
            v01 = gather_vals(x0, y0 + 1)
            v11 = gather_vals(x0 + 1, y0 + 1)
            blend = bilinear_blend(v00, v10, v01, v11, bwx, bwy)
            # incomplete 2x2 neighborhood (extent edge / missing tile)
            # falls back to the nearest value already in `out`
            full = np.isfinite(v00) & np.isfinite(v10) & np.isfinite(v01) & np.isfinite(v11)
            out = np.where(full, blend, out)
        if not np.isfinite(out).any():
            # footprint overlapped a source bbox but no pixel actually
            # landed in source coverage — per contract, such destination
            # tiles do not materialize
            return pd.DataFrame(
                {"metric": pd.Series(dtype=str),
                 "tile_row": pd.Series(dtype=np.int64),
                 "tile_col": pd.Series(dtype=np.int64),
                 "h": pd.Series(dtype=np.int64), "w": pd.Series(dtype=np.int64),
                 "pix": pd.Series(dtype=object), "dtype": pd.Series(dtype=str)}
            )
        return pd.DataFrame(
            {
                "metric": [group["metric"].iloc[0]],
                "tile_row": np.int64(tr),
                "tile_col": np.int64(tc),
                "h": np.int64(D),
                "w": np.int64(D),
                "pix": [out.tobytes()],
                "dtype": ["float64"],
            }
        )

    from gridfia_ray.stages.agg_util import bucketed_group_map

    # pinned output schema: a bucket whose destination tiles all have no
    # finite coverage emits ONLY the empty template, whose object-dtype
    # pix column would otherwise infer Arrow null (vs binary elsewhere)
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
        result.map_batches(cover, batch_format="pyarrow"),
        ["metric", "tile_row", "tile_col"],
        resample,
        n_buckets=n_buckets,
        out_schema=out_schema,
    )
