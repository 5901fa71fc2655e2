"""Global histogram equalization over result-tile rasters.

The classic image-contrast transfer, exact in integers end to end:
tiles µ-scale to int64 (the same policy as the focal / CCL ops), the
global (min, max, n) and the ``bins``-bucket histogram fold in two tiny
combiner exchanges, the driver builds the bins-entry CDF LUT, and one
broadcast pass remaps every pixel —

    bin(v) = (v − lo) · bins // (hi − lo + 1)
    eq(b)  = (cdf(b) − cdf_min) · (bins−1) // (n − cdf_min)

with ``cdf_min`` = the first nonempty bin's cumulative count (the
standard transfer; a flat raster, n == cdf_min, maps to 0). Histogram
equalization over more than 2⁵³ µ-distinct levels would need wider
bins, not more driver state: every fold here is O(bins), never
O(pixels).

Reference parallel: gridfia's viz path normalizes with percentile
clipping only (mapper.py); equalization extends the same normalize
family (SURVEY.md §2.2 M16) with the standard global-contrast remap.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd


def _mu_tiles(batch: pa.Table):
    """Yield (tile_row, tile_col, h, w, u) with ``u`` the µ-scaled
    int64 pixel array — floats floor(v·10⁶ + 0.5), ints as-is."""
    for i in range(batch.num_rows):
        h = int(batch["h"][i].as_py())
        w = int(batch["w"][i].as_py())
        vals = np.frombuffer(
            batch["pix"][i].as_py(), dtype=np.dtype(batch["dtype"][i].as_py())
        ).reshape(h, w)
        if vals.dtype.kind == "f":
            u = np.floor(vals.astype(np.float64) * 1_000_000 + 0.5).astype(
                np.int64
            )
        else:
            u = vals.astype(np.int64)
        yield (
            int(batch["tile_row"][i].as_py()),
            int(batch["tile_col"][i].as_py()),
            h,
            w,
            u,
        )


def equalize_result(result: rd.Dataset, *, bins: int = 256) -> rd.Dataset:
    """Equalize a single-metric result-tile dataset; returns per-pixel
    ``(y, x, eq)`` rows with ``eq`` in ``[0, bins−1]``."""
    from ray.data.aggregate import Max, Min, Sum

    from gridfia_ray.stages.agg_util import bucketed_agg

    result = result.materialize()  # consumed by 3 passes

    def minmax_partial(batch: pa.Table) -> pa.Table:
        los, his, ns = [], [], []
        for _, _, _, _, u in _mu_tiles(batch):
            los.append(int(u.min()))
            his.append(int(u.max()))
            ns.append(u.size)
        return pa.table(
            {
                "lo": pa.array(los, pa.int64()),
                "hi": pa.array(his, pa.int64()),
                "n": pa.array(ns, pa.int64()),
            }
        )

    mm = (
        result.map_batches(minmax_partial, batch_format="pyarrow")
        .aggregate(Min("lo"), Max("hi"), Sum("n"))
    )
    lo, hi, n = int(mm["min(lo)"]), int(mm["max(hi)"]), int(mm["sum(n)"])
    width = hi - lo + 1

    def hist_partial(batch: pa.Table) -> pa.Table:
        counts = np.zeros(bins, dtype=np.int64)
        for _, _, _, _, u in _mu_tiles(batch):
            b = (u.ravel() - lo) * bins // width
            counts += np.bincount(b, minlength=bins)
        nz = np.flatnonzero(counts)
        return pa.table(
            {
                "bin": pa.array(nz.astype(np.int64), pa.int64()),
                "c": pa.array(counts[nz], pa.int64()),
            }
        )

    hist = bucketed_agg(
        result.map_batches(hist_partial, batch_format="pyarrow"),
        ["bin"],
        {"c": ("c", "sum")},
        n_buckets=4,
    ).to_pandas()  # ≤ bins rows by construction
    full = np.zeros(bins, dtype=np.int64)
    full[hist["bin"].to_numpy(np.int64)] = hist["c"].to_numpy(np.int64)
    cdf = np.cumsum(full)
    cdf_min = int(cdf[np.flatnonzero(full)[0]]) if full.any() else 0
    if n == cdf_min:  # flat raster: everything lands in one level
        lut = np.zeros(bins, dtype=np.int64)
    else:
        lut = (cdf - cdf_min) * (bins - 1) // (n - cdf_min)
        lut = np.maximum(lut, 0)  # bins before the first nonempty one
    lut_ref = ray.put(lut)

    def remap(batch: pa.Table) -> pa.Table:
        table = ray.get(lut_ref)
        ys, xs, eqs = [], [], []
        for tr, tc, h, w, u in _mu_tiles(batch):
            b = (u.ravel() - lo) * bins // width
            yy, xx = np.divmod(np.arange(h * w, dtype=np.int64), w)
            ys.append(yy + tr * h)
            xs.append(xx + tc * w)
            eqs.append(table[b])
        return pa.table(
            {
                "y": pa.array(np.concatenate(ys) if ys else [], pa.int64()),
                "x": pa.array(np.concatenate(xs) if xs else [], pa.int64()),
                "eq": pa.array(np.concatenate(eqs) if eqs else [], pa.int64()),
            }
        )

    return result.map_batches(remap, batch_format="pyarrow")
