"""CLAHE — contrast-limited ADAPTIVE histogram equalization
(Zuiderveld 1994), the local sibling of ``pipelines/histeq``'s global
remap, and an algorithm that is tile-native by construction: each tile
builds its own clipped histogram LUT, and every pixel blends the LUTs
of the four surrounding TILE CENTERS bilinearly.

Exact in integers end to end:

* global (lo, hi, n) via the existing O(1)-per-batch combiner
  (``histeq._global_minmax_n``);
* per tile: a ``bins``-bucket histogram of the µ-values, clipped at
  ``clip_limit = max(1, clip_num·npx // (clip_den·bins))`` with the
  excess redistributed deterministically (floor share to every bin,
  remainder to the lowest ``excess % bins`` bins), then the standard
  cdf transfer ``lut(b) = max(0, (cdf(b) − cdf_min)·(L−1) //
  (npx − cdf_min))`` (flat tile → 0);
* blending: with tile dims (h, w) and pixel offsets ``py ∈ [0, h)``,
  ``px ∈ [0, w)`` from the upper-left surrounding center,
  ``out = ((h−py)(w−px)·L00 + (h−py)px·L01 + py(w−px)·L10 + py·px·L11)
  // (h·w)`` — pure int64, no floats anywhere. The pinned sequential
  replay (``oracle_pins.ensure_clahepin``) shares the per-tile LUT
  kernel (the shared-primitive convention) and reimplements the blend
  with scalar loops — what the pin verifies is the LUT exchange and
  the neighbor routing, and the agreement is bit-exact.

Scale shape: ONE tiny keyed exchange — each tile ships its O(bins) LUT
row to itself and its 8 neighbors (the four surrounding centers of any
pixel in tile (tr, tc) live in tiles (tr±1, tc±1), clamped at the
raster edge), co-keyed with the value tiles; pixels never move.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from gridfia_ray.pipelines.histeq import _global_minmax_n, _mu_tiles

_UNION = pa.schema(
    [
        ("metric", pa.string()),
        ("tile_row", pa.int64()),
        ("tile_col", pa.int64()),
        ("kind", pa.int64()),  # 0 = value tile, 1 = LUT row
        ("src_dr", pa.int64()),  # LUT source offset (receiver view)
        ("src_dc", pa.int64()),
        ("h", pa.int64()),
        ("w", pa.int64()),
        ("pix", pa.binary()),
        ("dtype", pa.string()),
        ("lut", pa.binary()),
    ]
)

_OUT = pa.schema(
    [
        ("metric", pa.string()),
        ("y", pa.int64()),
        ("x", pa.int64()),
        ("level", pa.int64()),
    ]
)


def tile_lut(
    u: np.ndarray, lo: int, width: int, bins: int,
    clip_num: int, clip_den: int, out_levels: int,
) -> np.ndarray:
    """One tile's clipped-histogram transfer LUT (bins → [0, L−1])."""
    npx = int(u.size)
    b = ((u.reshape(-1).astype(np.int64) - lo) * bins) // width
    hist = np.bincount(b, minlength=bins).astype(np.int64)
    limit = max(1, (clip_num * npx) // (clip_den * bins))
    excess = int(np.maximum(hist - limit, 0).sum())
    hist = np.minimum(hist, limit)
    hist += excess // bins
    rem = excess % bins
    if rem:
        hist[:rem] += 1
    cdf = np.cumsum(hist)
    nz = np.nonzero(hist)[0]
    cdf_min = int(cdf[nz[0]]) if nz.size else 0
    total = int(cdf[-1])
    denom = total - cdf_min
    if denom <= 0:
        return np.zeros(bins, np.int64)
    return np.maximum(
        0, ((cdf - cdf_min) * (out_levels - 1)) // denom
    ).astype(np.int64)


def clahe_result(
    result: rd.Dataset,
    *,
    bins: int = 64,
    clip_num: int = 2,
    clip_den: int = 1,
    out_levels: int = 256,
    n_buckets: int = 64,
) -> rd.Dataset:
    """CLAHE over a result-tile dataset → long rows
    ``(metric, y, x, level)`` with ``level ∈ [0, out_levels)``."""
    from gridfia_ray.stages.agg_util import bucketed_group_map, to_arrow

    lo, hi, n = _global_minmax_n(result)
    if n == 0:
        raise ValueError("clahe: empty raster")
    width = hi - lo + 1
    nty = int(result.max("tile_row") or 0) + 1
    ntx = int(result.max("tile_col") or 0) + 1

    def emit(batch: pa.Table) -> pa.Table:
        rows = []
        mets = batch["metric"].to_pylist()
        dts = batch["dtype"].to_pylist()
        pixs = batch["pix"].to_pylist()
        for i, (tr, tc, h, w, u) in enumerate(_mu_tiles(batch)):
            rows.append(
                {
                    "metric": mets[i], "tile_row": tr, "tile_col": tc,
                    "kind": 0, "src_dr": 0, "src_dc": 0, "h": h, "w": w,
                    "pix": pixs[i], "dtype": dts[i], "lut": b"",
                }
            )
            lut = tile_lut(u, lo, width, bins, clip_num, clip_den,
                           out_levels).tobytes()
            for dr in (-1, 0, 1):
                for dc in (-1, 0, 1):
                    rtr, rtc = tr + dr, tc + dc
                    if 0 <= rtr < nty and 0 <= rtc < ntx:
                        rows.append(
                            {
                                "metric": mets[i], "tile_row": rtr,
                                "tile_col": rtc, "kind": 1,
                                # receiver view: source sits at −(dr,dc)
                                "src_dr": -dr, "src_dc": -dc,
                                "h": h, "w": w, "pix": b"",
                                "dtype": "", "lut": lut,
                            }
                        )
        return to_arrow(
            pd.DataFrame(rows, columns=[f.name for f in _UNION]), _UNION
        )

    def blend(group: pd.DataFrame) -> pd.DataFrame:
        own = group[group["kind"] == 0]
        if len(own) == 0:
            return pd.DataFrame({f.name: [] for f in _OUT})
        if len(own) > 1:
            raise ValueError("clahe: duplicate value tile at one address")
        r = own.iloc[0]
        h, w = int(r["h"]), int(r["w"])
        tr, tc = int(r["tile_row"]), int(r["tile_col"])
        vals = np.frombuffer(
            r["pix"], dtype=np.dtype(r["dtype"])
        ).reshape(h, w)
        if vals.dtype.kind == "f":
            u = np.floor(
                vals.astype(np.float64) * 1_000_000 + 0.5
            ).astype(np.int64)
        else:
            u = vals.astype(np.int64)
        luts: dict[tuple[int, int], np.ndarray] = {}
        for _, s in group[group["kind"] == 1].iterrows():
            luts[(int(s["src_dr"]), int(s["src_dc"]))] = np.frombuffer(
                s["lut"], np.int64
            )
        bidx = ((u - lo) * bins) // width
        gy = tr * h + np.arange(h)[:, None] + np.zeros((1, w), np.int64)
        gx = tc * w + np.arange(w)[None, :] + np.zeros((h, 1), np.int64)
        ay = gy - h // 2
        ax = gx - w // 2
        t0r = np.floor_divide(ay, h)
        t0c = np.floor_divide(ax, w)
        py = ay - t0r * h
        px = ax - t0c * w
        out = np.zeros((h, w), np.int64)
        # four surrounding centers, clamped at the raster edge; the
        # relative source offsets seen from THIS tile are in [-1, 1]
        for oy, wy in ((t0r, h - py), (t0r + 1, py)):
            ty = np.clip(oy, 0, nty - 1)
            for ox, wx in ((t0c, w - px), (t0c + 1, px)):
                tx = np.clip(ox, 0, ntx - 1)
                acc = np.zeros((h, w), np.int64)
                for dr in (-1, 0, 1):
                    for dc in (-1, 0, 1):
                        m = (ty == tr + dr) & (tx == tc + dc)
                        if not m.any():
                            continue
                        lut = luts.get((dr, dc))
                        if lut is None:
                            raise ValueError(
                                f"clahe: missing LUT ({dr},{dc}) at "
                                f"tile ({tr},{tc})"
                            )
                        acc[m] = lut[bidx[m]]
                out += wy * wx * acc
        out //= h * w
        yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        return pd.DataFrame(
            {
                "metric": r["metric"],
                "y": (yy + tr * h).ravel(),
                "x": (xx + tc * w).ravel(),
                "level": out.ravel(),
            }
        )

    return bucketed_group_map(
        result.map_batches(emit, batch_format="pyarrow"),
        ["metric", "tile_row", "tile_col"],
        blend,
        n_buckets=n_buckets,
        out_schema=_OUT,
    )
