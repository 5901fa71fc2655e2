"""Temporal raster stacks: per-pixel trend (OLS slope) and change
detection across a multi-date stack of result tiles — the raster
time-series companion to the per-date metric kernels (forest biomass
change/trend is the reference's core longitudinal question; gridfia
itself only ever analyzes one date at a time).

A stack is a dataset of dated result tiles: (metric, year, tile_row,
tile_col, h, w, pix, dtype) with pix an int64 µ-value buffer. Real use
reads K dated stores and unions them; :func:`make_yearly_stack`
synthesizes a deterministic K-year stack from a single result raster
with integer closed forms (per-pixel slope field + small seasonal
noise), so correctness oracles can re-derive the identical stack in
SQL from the pixel side table.

:func:`temporal_trend_tiles` co-locates the K dated copies of each
tile with ONE bucketed exchange and computes, per pixel, fully
vectorized and integer-exact:

  num   = K·Σ(t·v) − Σt·Σv          (OLS slope numerator, int64)
  den   = K·Σt² − (Σt)²             (scalar int)
  slope = num / den                 (the single float step)
  delta = v(t_max) − v(t_min)       (int64)

Partitioning: the exchange key is the tile key, so skew is bounded by
K rows per key; memory per group is K tile buffers.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

#: integer mixing constants for the synthetic slope/noise fields
#: (Knuth multiplicative hash; any SQL engine reproduces them exactly)
_SLOPE_MULT_Y = 2654435761
_SLOPE_MULT_X = 40503
_SLOPE_MOD = 1_000_000  # ±0.5 µ-units/year slope field
_NOISE_MOD = 7_000      # < 0.007 units of seasonal noise


def make_yearly_stack(result: rd.Dataset, n_years: int) -> rd.Dataset:
    """Derive a deterministic ``n_years``-date stack from one result
    raster: v_u(y, x, t) = u + t·coef(y, x) + noise(t, y, x) with

      coef  = ((y·2654435761 + x·40503) mod 1e6) − 5e5
      noise = (t·31 + x + y) mod 7000

    all in the micro-scaled int64 domain (u = floor(v·1e6 + 0.5))."""

    def explode(batch: pa.Table) -> pa.Table:
        mets, yrs, trs, tcs, hs, ws, bufs = [], [], [], [], [], [], []
        for i in range(batch.num_rows):
            h = int(batch["h"][i].as_py())
            w = int(batch["w"][i].as_py())
            tr = int(batch["tile_row"][i].as_py())
            tc = int(batch["tile_col"][i].as_py())
            arr = np.frombuffer(
                batch["pix"][i].as_py(), dtype=np.dtype(batch["dtype"][i].as_py())
            ).reshape(h, w)
            u = np.floor(arr.astype(np.float64) * 1_000_000 + 0.5).astype(np.int64)
            yy, xx = np.meshgrid(
                np.arange(h, dtype=np.int64) + tr * h,
                np.arange(w, dtype=np.int64) + tc * w,
                indexing="ij",
            )
            coef = (yy * _SLOPE_MULT_Y + xx * _SLOPE_MULT_X) % _SLOPE_MOD - (
                _SLOPE_MOD // 2
            )
            for t in range(n_years):
                noise = (t * 31 + xx + yy) % _NOISE_MOD
                v = u + t * coef + noise
                mets.append(batch["metric"][i].as_py())
                yrs.append(t)
                trs.append(tr)
                tcs.append(tc)
                hs.append(h)
                ws.append(w)
                bufs.append(v.tobytes())
        return pa.table(
            {
                "metric": pa.array(mets, pa.string()),
                "year": pa.array(yrs, pa.int64()),
                "tile_row": pa.array(trs, pa.int64()),
                "tile_col": pa.array(tcs, pa.int64()),
                "h": pa.array(hs, pa.int64()),
                "w": pa.array(ws, pa.int64()),
                "pix": pa.array(bufs, pa.binary()),
                "dtype": pa.array(["int64"] * len(bufs), pa.string()),
            }
        )

    return result.map_batches(explode, batch_format="pyarrow")


def temporal_composite_tiles(stack: rd.Dataset, n_buckets: int = 64) -> rd.Dataset:
    """Per-pixel MEDIAN / MIN / MAX composite over a dated tile stack —
    the classic remote-sensing cloud-free compositing reducer (median
    across epochs rejects transient outliers). Same ONE bucketed
    exchange as the trend fold; the median is the quantile_disc order
    statistic (k = ceil(K/2)-th smallest), exact in int64 for any K.
    Rows out: (metric, y, x, med_u, min_u, max_u)."""
    from gridfia_ray.stages.agg_util import bucketed_group_map

    def fold(group: pd.DataFrame) -> pd.DataFrame:
        yrs = group["year"].to_numpy()
        if len(yrs) < 1 or len(np.unique(yrs)) != len(yrs):
            raise ValueError(
                "temporal_composite: need distinct years per tile, got "
                f"{yrs.tolist()} at tile ({group['tile_row'].iloc[0]}, "
                f"{group['tile_col'].iloc[0]})"
            )
        h = int(group["h"].iloc[0])
        w = int(group["w"].iloc[0])
        cube = np.stack(
            [
                np.frombuffer(r["pix"], dtype=np.dtype(r["dtype"])).reshape(h, w)
                for _, r in group.iterrows()
            ]
        ).astype(np.int64)
        k = cube.shape[0]
        rank = int(np.ceil(k / 2)) - 1  # quantile_disc(0.5) order statistic
        med = np.partition(cube, rank, axis=0)[rank]
        tr = int(group["tile_row"].iloc[0])
        tc = int(group["tile_col"].iloc[0])
        yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        return pd.DataFrame(
            {
                "metric": group["metric"].iloc[0],
                "y": (yy + tr * h).ravel().astype(np.int64),
                "x": (xx + tc * w).ravel().astype(np.int64),
                "med_u": med.ravel(),
                "min_u": cube.min(axis=0).ravel(),
                "max_u": cube.max(axis=0).ravel(),
            }
        )

    out_schema = pa.schema(
        [("metric", pa.string()), ("y", pa.int64()), ("x", pa.int64()),
         ("med_u", pa.int64()), ("min_u", pa.int64()), ("max_u", pa.int64())]
    )
    return bucketed_group_map(
        stack, ["metric", "tile_row", "tile_col"], fold,
        n_buckets=n_buckets, out_schema=out_schema,
    )


def temporal_delta_tiles(
    stack: rd.Dataset, *, absolute: bool = False, n_buckets: int = 64
) -> rd.Dataset:
    """Two-epoch (or first→last) raster differencing: per tile the
    int64 µ-delta ``v(t_max) − v(t_min)`` (``absolute=True`` emits
    |delta| — the change-magnitude raster that feeds thresholding /
    CCL change-patch detection). One keyed exchange co-locating each
    tile's epochs; output is composable int64 result tiles."""
    from gridfia_ray.stages.agg_util import bucketed_group_map

    out_schema = pa.schema(
        [("metric", pa.string()), ("tile_row", pa.int64()),
         ("tile_col", pa.int64()), ("h", pa.int64()), ("w", pa.int64()),
         ("pix", pa.binary()), ("dtype", pa.string())]
    )

    def fold(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values("year")
        yrs = group["year"].to_numpy()
        if len(yrs) < 2 or len(np.unique(yrs)) != len(yrs):
            raise ValueError(
                "temporal_delta: need ≥2 distinct years per tile, got "
                f"{yrs.tolist()} at tile ({group['tile_row'].iloc[0]}, "
                f"{group['tile_col'].iloc[0]})"
            )
        h = int(group["h"].iloc[0])
        w = int(group["w"].iloc[0])
        first = np.frombuffer(
            group.iloc[0]["pix"], dtype=np.dtype(group.iloc[0]["dtype"])
        ).astype(np.int64)
        last = np.frombuffer(
            group.iloc[-1]["pix"], dtype=np.dtype(group.iloc[-1]["dtype"])
        ).astype(np.int64)
        d = last - first
        if absolute:
            d = np.abs(d)
        return pd.DataFrame(
            {
                "metric": [group["metric"].iloc[0]],
                "tile_row": [int(group["tile_row"].iloc[0])],
                "tile_col": [int(group["tile_col"].iloc[0])],
                "h": [h],
                "w": [w],
                "pix": [d.tobytes()],
                "dtype": ["int64"],
            }
        )

    return bucketed_group_map(
        stack, ["metric", "tile_row", "tile_col"], fold,
        n_buckets=n_buckets, out_schema=out_schema,
    )


def temporal_trend_tiles(stack: rd.Dataset, n_buckets: int = 64) -> rd.Dataset:
    """Per-pixel OLS trend over a dated tile stack → rows (metric, y,
    x, slope: float64, delta: int64). Every group must hold one tile
    per distinct year (≥ 2 years); int64-exact sums, one float
    division (num/den) mirrored by the SQL oracle."""
    from gridfia_ray.stages.agg_util import bucketed_group_map

    def fold(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values("year")
        yrs = group["year"].to_numpy()
        if len(yrs) < 2 or len(np.unique(yrs)) != len(yrs):
            raise ValueError(
                "temporal_trend: need ≥2 distinct years per tile, got "
                f"{yrs.tolist()} at tile ({group['tile_row'].iloc[0]}, "
                f"{group['tile_col'].iloc[0]})"
            )
        h = int(group["h"].iloc[0])
        w = int(group["w"].iloc[0])
        cube = np.stack(
            [
                np.frombuffer(r["pix"], dtype=np.dtype(r["dtype"])).reshape(h, w)
                for _, r in group.iterrows()
            ]
        ).astype(np.int64)
        k = len(yrs)
        st = int(yrs.sum())
        st2 = int((yrs * yrs).sum())
        sv = cube.sum(axis=0)
        stv = (cube * yrs[:, None, None]).sum(axis=0)
        num = k * stv - st * sv
        den = k * st2 - st * st
        slope = num.astype(np.float64) / float(den)
        delta = cube[-1] - cube[0]
        tr = int(group["tile_row"].iloc[0])
        tc = int(group["tile_col"].iloc[0])
        yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        return pd.DataFrame(
            {
                "metric": group["metric"].iloc[0],
                "y": (yy + tr * h).ravel().astype(np.int64),
                "x": (xx + tc * w).ravel().astype(np.int64),
                "slope": slope.ravel(),
                "delta": delta.ravel(),
            }
        )

    out_schema = pa.schema(
        [("metric", pa.string()), ("y", pa.int64()), ("x", pa.int64()),
         ("slope", pa.float64()), ("delta", pa.int64())]
    )
    return bucketed_group_map(
        stack, ["metric", "tile_row", "tile_col"], fold,
        n_buckets=n_buckets, out_schema=out_schema,
    )
