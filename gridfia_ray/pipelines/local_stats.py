"""Local spatial autocorrelation — per-pixel LISA (Anselin local
Moran's I) and Getis-Ord Gi* hot-spot statistics over result-tile
rasters, on the focal halo exchange.

Shape: TWO streaming passes over the result tiles.

  1. an exact global-scalar pass: per-metric pixel count ``n``, value
     sum ``s`` and value sum-of-squares ``ssq`` in the micro-scaled
     int64 domain (``u = floor(v·1e6 + 0.5)``, the same quantization
     the halo explode applies). ``ssq`` would overflow int64 globally,
     so per-batch partials carry it as (hi, lo) = divmod(u², 2³¹)
     sums and the driver folds the handful of partial rows with
     arbitrary-precision Python ints — exact and partition-invariant.
  2. the standard 1-pixel halo exchange (``focal._halo_pipeline``):
     each tile computes its 3×3 neighbor sums/counts and the closed
     form below from the broadcast scalars.

Exact-integer contract (what makes these SQL-oracle-able bit-for-bit):
every per-pixel building block is an int64 —

  dev_i    = n·u_i − s                    (n·(x_i − x̄) in n·µ units)
  nbrdev_i = n·S_i − c_i·s                (S_i = Σ_{j∈N8(i)} u_j)

and the only float steps are the final divisions, written as the
identical IEEE-754 expression tree on both sides:

  local Moran I_i  = (dev·nbrdev·n) / (c·ΣD²),  ΣD² = n²·ssq − n·s²
  Gi*_i            = (n·S*_i − W_i·s) /
                     ( √(n·ssq − s²) · √((n·W_i − W_i²) / (n−1)) )

(the Gi* form is Ord & Getis 1995 / the ArcGIS hot-spot z-score with
binary weights, where Σw² = Σw = W, self-inclusive: S* includes u_i,
W_i = c_i + 1). Integer products are range-guarded; the int64-exact contract
holds for rasters up to 2²⁸ pixels per metric (n·9·|u|max < 2⁶³ with
the 3e9 µ-unit value bound) — beyond that the same
formulas run in float64 (documented scale path; SQL bit-parity is a
test-scale property, not a cluster-scale requirement).

Reference parallel: gridfia's statistical_analysis.py delegates global
Moran's I to esda (see pipelines/moran.py); it has no LOCAL
autocorrelation operator — this is the standard hot-spot/LISA
extension every raster analytics stack pairs with it (SURVEY §2.5).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from gridfia_ray.pipelines.focal import _halo_pipeline, _window_sums

#: |u| bound so u² fits int64 (3e9 µ-units = raw values up to ~3034).
_U_ABS_MAX = 3_000_000_000
#: raster-size bound for the exact-int64 contract (see module doc):
#: n·9·|u|max must stay below 2⁶³ for the n·S neighbor-sum product.
_N_EXACT_MAX = 2**28


def exact_value_scalars(result: rd.Dataset) -> dict[str, tuple[int, int, int]]:
    """Per-metric exact (n, s, ssq) over the micro-scaled int64 pixel
    values of a result-tile dataset. Streaming combiner: one partial
    row per (batch, metric), folded on the driver with Python ints."""

    def partials(batch: pa.Table) -> pa.Table:
        mets: dict[str, list[int]] = {}
        for i in range(batch.num_rows):
            h = int(batch["h"][i].as_py())
            w = int(batch["w"][i].as_py())
            arr = np.frombuffer(
                batch["pix"][i].as_py(), dtype=np.dtype(batch["dtype"][i].as_py())
            ).reshape(h, w)
            if np.isnan(arr).any():
                raise ValueError("local_stats: NaN pixel in scalar pass")
            u = np.floor(arr.astype(np.float64) * 1_000_000 + 0.5).astype(np.int64)
            if np.abs(u).max(initial=0) >= _U_ABS_MAX:
                raise ValueError(
                    "local_stats: |value| too large for the exact u² domain "
                    f"(bound {_U_ABS_MAX} µ-units)"
                )
            uu = u.ravel()
            hi, lo = np.divmod(uu * uu, np.int64(2) ** 31)
            m = batch["metric"][i].as_py()
            acc = mets.setdefault(m, [0, 0, 0, 0])
            acc[0] += uu.size
            acc[1] += int(uu.sum())
            acc[2] += int(hi.sum())
            acc[3] += int(lo.sum())
        keys = sorted(mets)
        return pa.table(
            {
                "metric": pa.array(keys, pa.string()),
                "n": pa.array([mets[k][0] for k in keys], pa.int64()),
                "s": pa.array([mets[k][1] for k in keys], pa.int64()),
                "ssq_hi": pa.array([mets[k][2] for k in keys], pa.int64()),
                "ssq_lo": pa.array([mets[k][3] for k in keys], pa.int64()),
            }
        )

    rows = result.map_batches(partials, batch_format="pyarrow").to_pandas()
    out: dict[str, tuple[int, int, int]] = {}
    for m, g in rows.groupby("metric"):
        ssq = (int(g["ssq_hi"].sum()) << 31) + int(g["ssq_lo"].sum())
        out[m] = (int(g["n"].sum()), int(g["s"].sum()), ssq)
    return out


def _check_scalars(scalars: dict, op: str) -> None:
    for m, (n, s, ssq) in scalars.items():
        if n < 2:
            raise ValueError(f"{op}: metric {m!r} has {n} pixel(s); need ≥ 2")
        if n * n * ssq == n * s * s:
            raise ValueError(
                f"{op}: metric {m!r} is constant (zero variance) — the "
                "statistic is undefined"
            )


def local_moran_tiles(result: rd.Dataset, n_buckets: int = 64) -> rd.Dataset:
    """Anselin local Moran's I (row-standardized 8-neighbor weights)
    per pixel → rows (metric, y, x, i_local: float64, quad: int64).

    ``quad`` is the LISA cluster quadrant from the exact integer
    deviations: 1=HH, 2=LH, 3=LL, 4=HL, 0 when either deviation is 0.
    """
    scalars = exact_value_scalars(result)
    _check_scalars(scalars, "local_moran_tiles")
    empty = pd.DataFrame(
        {"metric": pd.Series(dtype=str),
         "y": pd.Series(dtype=np.int64), "x": pd.Series(dtype=np.int64),
         "i_local": pd.Series(dtype=np.float64),
         "quad": pd.Series(dtype=np.int64)}
    )

    def window(P, pres, h, w, metric):
        n, s, ssq = scalars[metric]
        v = P[1 : h + 1, 1 : w + 1]
        S = _window_sums(P) - v
        c = _window_sums(pres) - 1
        if n < _N_EXACT_MAX:
            ssd = n * n * ssq - n * s * s  # Python int, exact
            dev = n * v - s
            nbrdev = n * S - c * s
            i_local = (dev.astype(np.float64) * nbrdev.astype(np.float64) * float(n)) / (
                c.astype(np.float64) * float(ssd)
            )
        else:  # float64 scale path (no int64-exact SQL contract)
            mean = s / n
            m2 = ssq / n - mean * mean
            dev = v - mean
            nbrdev = S - c * mean
            i_local = dev * nbrdev / (c * m2)
            dev = np.sign(dev)
            nbrdev = np.sign(nbrdev)
        quad = np.zeros(v.shape, dtype=np.int64)
        quad[(dev > 0) & (nbrdev > 0)] = 1
        quad[(dev < 0) & (nbrdev > 0)] = 2
        quad[(dev < 0) & (nbrdev < 0)] = 3
        quad[(dev > 0) & (nbrdev < 0)] = 4
        return {"i_local": i_local, "quad": quad}, None

    return _halo_pipeline(result, "local_moran_tiles", window, empty, n_buckets)


def getis_gstar_tiles(result: rd.Dataset, n_buckets: int = 64) -> rd.Dataset:
    """Getis-Ord Gi* (binary 8-neighbor weights, self-inclusive) per
    pixel → rows (metric, y, x, gi_star: float64). Positive values are
    hot spots (high-value clusters), negative cold spots; the value is
    a z-score under the randomization null."""
    scalars = exact_value_scalars(result)
    _check_scalars(scalars, "getis_gstar_tiles")
    empty = pd.DataFrame(
        {"metric": pd.Series(dtype=str),
         "y": pd.Series(dtype=np.int64), "x": pd.Series(dtype=np.int64),
         "gi_star": pd.Series(dtype=np.float64)}
    )

    def window(P, pres, h, w, metric):
        n, s, ssq = scalars[metric]
        s_star = _window_sums(P)  # includes self
        W = _window_sums(pres)
        if n < _N_EXACT_MAX:
            a = n * ssq - s * s  # Python int, exact
            num = n * s_star - W * s
            bn = n * W - W * W
            gi = num.astype(np.float64) / (
                np.sqrt(float(a)) * np.sqrt(bn.astype(np.float64) / float(n - 1))
            )
        else:
            mean = s / n
            sd = np.sqrt(ssq / n - mean * mean)
            Wf = W.astype(np.float64)
            gi = (s_star - Wf * mean) / (
                sd * np.sqrt((n * Wf - Wf * Wf) / (n - 1))
            )
        return {"gi_star": gi}, None

    return _halo_pipeline(result, "getis_gstar_tiles", window, empty, n_buckets)
