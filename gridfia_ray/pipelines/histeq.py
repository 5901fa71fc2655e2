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


def _global_minmax_n(result: rd.Dataset) -> tuple[int, int, int]:
    """(lo, hi, n) over every µ-pixel — one combiner exchange."""
    from ray.data.aggregate import Max, Min, Sum

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
    return int(mm["min(lo)"]), int(mm["max(hi)"]), int(mm["sum(n)"])


def _global_hist(result: rd.Dataset, lo: int, width: int, bins: int) -> np.ndarray:
    """Dense ``bins``-entry global histogram — per-batch bincount
    partials, one tiny bucketed exchange (≤ bins rows)."""
    from gridfia_ray.stages.agg_util import bucketed_agg

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
    return full


def equalize_result(result: rd.Dataset, *, bins: int = 256) -> rd.Dataset:
    """Equalize a single-metric result-tile dataset; returns per-pixel
    ``(y, x, eq)`` rows with ``eq`` in ``[0, bins−1]``."""
    result = result.materialize()  # consumed by 3 passes
    lo, hi, n = _global_minmax_n(result)
    width = hi - lo + 1
    full = _global_hist(result, lo, width, bins)
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


def match_result(
    src: rd.Dataset, ref: rd.Dataset, *, bins: int = 256
) -> rd.Dataset:
    """Histogram MATCHING (radiometric normalization): remap ``src``'s
    pixel distribution onto ``ref``'s — the standard cross-epoch /
    cross-sensor normalization step before change detection. Exact in
    integers end to end: both rasters take the same µ-scale → global
    (lo, hi, n) → dense ``bins`` histogram folds as ``equalize_result``
    (two tiny combiner exchanges per side), then the transfer

        m(b) = min { j : cdf_ref(j) · n_src ≥ cdf_src(b) · n_ref }

    is built on the driver with PYTHON-int cross-multiplication (the
    products overflow int64 beyond ~2³¹ pixels per side — arbitrary
    precision here, HUGEINT in the SQL oracle) and broadcast for one
    remap pass. Every fold is O(bins); rows out: (y, x, m) with m in
    [0, bins−1] ref-bin space.
    """
    src = src.materialize()  # consumed by 3 passes
    lo_s, hi_s, n_s = _global_minmax_n(src)
    lo_r, hi_r, n_r = _global_minmax_n(ref)
    if n_s == 0 or n_r == 0:
        return rd.from_arrow(
            pa.table(
                {"y": pa.array([], pa.int64()), "x": pa.array([], pa.int64()),
                 "m": pa.array([], pa.int64())}
            )
        )
    width_s = hi_s - lo_s + 1
    cdf_s = np.cumsum(_global_hist(src, lo_s, width_s, bins))
    cdf_r = np.cumsum(_global_hist(ref, lo_r, hi_r - lo_r + 1, bins))

    # monotone two-pointer in arbitrary-precision ints
    lut = np.empty(bins, dtype=np.int64)
    cr = [int(c) * n_s for c in cdf_r]
    j = 0
    for b in range(bins):
        target = int(cdf_s[b]) * n_r
        while j < bins - 1 and cr[j] < target:
            j += 1
        lut[b] = j
    lut_ref = ray.put(lut)

    def remap(batch: pa.Table) -> pa.Table:
        table = ray.get(lut_ref)
        ys, xs, ms = [], [], []
        for tr, tc, h, w, u in _mu_tiles(batch):
            b = (u.ravel() - lo_s) * bins // width_s
            yy, xx = np.divmod(np.arange(h * w, dtype=np.int64), w)
            ys.append(yy + tr * h)
            xs.append(xx + tc * w)
            ms.append(table[b])
        return pa.table(
            {
                "y": pa.array(np.concatenate(ys) if ys else [], pa.int64()),
                "x": pa.array(np.concatenate(xs) if xs else [], pa.int64()),
                "m": pa.array(np.concatenate(ms) if ms else [], pa.int64()),
            }
        )

    return src.map_batches(remap, batch_format="pyarrow")
