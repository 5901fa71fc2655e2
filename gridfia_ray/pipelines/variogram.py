"""Empirical semivariogram over a tiled raster — the geostatistics
primitive under kriging / spatial-structure diagnostics (Matheron 1963):

    γ(h) = Σ_{pairs at lag h} (z(p) − z(p+h))² / (2·N_h)

computed at pixel lags ``h ∈ lags`` along the two grid axes (east and
south — the standard axis-aligned experimental variogram). The
reference delegates spatial statistics to esda/libpysal
(``gridfia/core/analysis/statistical_analysis.py``), which has no
variogram; this is the same family built raster-native.

Scale shape (one keyed exchange): a pixel's lag-``h`` partner crosses a
tile border only eastward or southward, so every tile ships exactly two
O(perimeter·L) strips — its first ``L = max(lags)`` COLUMNS to its west
neighbor and its first ``L`` ROWS to its north neighbor — plus itself
to itself. Each tile then folds to ``2·len(lags)`` partial rows
(direction × lag) and one tiny keyed sum merges them. No pair ever
exists as a row: pairs are evaluated as vectorized shifted-array
differences inside the tile.

Exactness contract: values are micro-scaled to int64 (the
``_halo_explode`` policy), each pair's squared difference ``d²`` is an
exact int64 (guarded: |d| < 3·10⁹), and per-tile sums are carried as
the int64 pair ``(ss_hi, ss_lo) = (Σ d²>>32, Σ d² & 0xFFFFFFFF)`` so no
accumulator overflows and the total ``Σ d² = 2³²·ss_hi + ss_lo`` is
order- and partition-invariant — reproducible bit-exactly by a SQL
self-join oracle summing the identical integer decomposition. Callers
derive ``γ(h) = (2³²·ss_hi + ss_lo) / (2·n_pairs·10¹²)``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

_PART_SCHEMA = pa.schema(
    [
        ("metric", pa.string()),
        ("direction", pa.string()),
        ("lag", pa.int64()),
        ("n_pairs", pa.int64()),
        ("ss_hi", pa.int64()),
        ("ss_lo", pa.int64()),
    ]
)


def _strip_explode(result: rd.Dataset, max_lag: int) -> rd.Dataset:
    """Per result tile: (kind='self', own full tile) to itself, the
    first ``max_lag`` columns to the west neighbor (kind='e' — the
    receiver's eastward extension), and the first ``max_lag`` rows to
    the north neighbor (kind='s'). µ-scaled int64 payloads."""

    def explode(batch: pa.Table) -> pa.Table:
        mets, trs_o, tcs_o, kinds, hs, ws, bufs = [], [], [], [], [], [], []
        status = (
            batch["status"].to_pylist() if "status" in batch.column_names else None
        )
        for i in range(batch.num_rows):
            h = int(batch["h"][i].as_py())
            w = int(batch["w"][i].as_py())
            met = batch["metric"][i].as_py()
            tr = int(batch["tile_row"][i].as_py())
            tc = int(batch["tile_col"][i].as_py())
            if status is not None and status[i] != "ok":
                raise ValueError(
                    f"semivariogram: tile ({tr}, {tc}) of {met!r} has "
                    f"status {status[i]!r} — a failed tile would poison "
                    f"its own and two neighbors' lag pairs"
                )
            if max_lag > h or max_lag > w:
                raise ValueError(
                    f"semivariogram: max lag {max_lag} exceeds the "
                    f"{h}×{w} tile — the one-hop strip protocol needs "
                    "lag <= tile size (re-tile or drop the long lags)"
                )
            src_dtype = np.dtype(batch["dtype"][i].as_py())
            arr = np.frombuffer(batch["pix"][i].as_py(), dtype=src_dtype).reshape(h, w)
            if np.issubdtype(src_dtype, np.integer):
                raise ValueError(
                    "semivariogram on an integer tile — the input is "
                    "already scaled; feed float metric tiles"
                )
            if np.isnan(arr).any():
                raise ValueError(
                    f"semivariogram: tile ({tr}, {tc}) of {met!r} "
                    "contains NaN — mask or fill first"
                )
            u = np.floor(arr.astype(np.float64) * 1_000_000 + 0.5).astype(np.int64)
            emits = [(tr, tc, "self", u)]
            if tc > 0:
                emits.append((tr, tc - 1, "e", u[:, :max_lag]))
            if tr > 0:
                emits.append((tr - 1, tc, "s", u[:max_lag, :]))
            for etr, etc, kind, payload in emits:
                mets.append(met)
                trs_o.append(etr)
                tcs_o.append(etc)
                kinds.append(kind)
                hs.append(h)
                ws.append(w)
                bufs.append(np.ascontiguousarray(payload).tobytes())
        return pa.table(
            {
                "metric": pa.array(mets, pa.string()),
                "tile_row": pa.array(trs_o, pa.int64()),
                "tile_col": pa.array(tcs_o, pa.int64()),
                "kind": pa.array(kinds, pa.string()),
                "h": pa.array(hs, pa.int64()),
                "w": pa.array(ws, pa.int64()),
                "strip": pa.array(bufs, pa.binary()),
            }
        )

    return result.map_batches(explode, batch_format="pyarrow")


def _pair_partials(
    u: np.ndarray, lag: int, axis: int, ext: "np.ndarray | None"
) -> tuple[int, int, int]:
    """Exact (n_pairs, ss_hi, ss_lo) for one direction × lag over one
    tile: in-tile shifted difference plus the cross-border strip
    difference when the neighbor's extension is present."""
    h, w = u.shape
    if axis == 1:
        d_in = u[:, lag:] - u[:, : w - lag]
        d_x = None if ext is None else ext[:, :lag] - u[:, w - lag :]
    else:
        d_in = u[lag:, :] - u[: h - lag, :]
        d_x = None if ext is None else ext[:lag, :] - u[h - lag :, :]
    parts = [d_in] if d_x is None else [d_in, d_x]
    n = 0
    hi = 0
    lo = 0
    for d in parts:
        if d.size == 0:
            continue
        a = np.abs(d)
        if a.max(initial=0) >= 3_000_000_000:
            raise ValueError(
                "semivariogram: |µ-diff| ≥ 3e9 would overflow int64 when "
                "squared — rescale the metric first"
            )
        d2 = d.ravel() * d.ravel()
        n += d.size
        hi += int((d2 >> 32).sum())
        lo += int((d2 & 0xFFFFFFFF).sum())
    return n, hi, lo


def semivariogram_tiles(
    result: rd.Dataset, lags: list[int], n_buckets: int = 64
) -> rd.Dataset:
    """Axis-aligned experimental semivariogram over a result-tile
    dataset (the ``run_metrics`` output schema) → one row per
    (metric, direction, lag): ``(n_pairs, ss_hi, ss_lo)`` with
    ``Σ (µ-diff)² = 2³²·ss_hi + ss_lo`` exact. Directions: 'e' (pixel
    pairs ``(y, x) ↔ (y, x+lag)``) and 's' (``(y, x) ↔ (y+lag, x)``)."""
    lags = sorted(set(int(v) for v in lags))
    if not lags or lags[0] < 1:
        raise ValueError("semivariogram: lags must be positive integers")
    max_lag = lags[-1]

    empty = pa.table(
        {f.name: pa.array([], f.type) for f in _PART_SCHEMA}, schema=_PART_SCHEMA
    ).to_pandas()

    def assemble(group: pd.DataFrame) -> pd.DataFrame:
        own = group[group["kind"] == "self"]
        if len(own) == 0:
            return empty  # strips addressed past the raster edge
        if len(own) > 1:
            raise ValueError(
                f"semivariogram: duplicate tile "
                f"({group['tile_row'].iloc[0]}, {group['tile_col'].iloc[0]})"
            )
        hs, ws = group["h"].unique(), group["w"].unique()
        if len(hs) != 1 or len(ws) != 1:
            raise ValueError(
                f"semivariogram: mixed tile shapes {sorted(hs)}×{sorted(ws)}"
            )
        h, w = int(hs[0]), int(ws[0])
        u = np.frombuffer(own["strip"].iloc[0], dtype=np.int64).reshape(h, w)
        exts: dict[str, np.ndarray] = {}
        for _, r in group[group["kind"] != "self"].iterrows():
            k = r["kind"]
            shape = (h, max_lag) if k == "e" else (max_lag, w)
            exts[k] = np.frombuffer(r["strip"], dtype=np.int64).reshape(shape)
        rows = []
        met = group["metric"].iloc[0]
        for direction, axis in (("e", 1), ("s", 0)):
            ext = exts.get(direction)
            for lag in lags:
                n, hi, lo = _pair_partials(u, lag, axis, ext)
                rows.append((met, direction, lag, n, hi, lo))
        return pd.DataFrame(
            rows, columns=["metric", "direction", "lag", "n_pairs", "ss_hi", "ss_lo"]
        )

    from gridfia_ray.stages.agg_util import bucketed_agg, bucketed_group_map

    parts = bucketed_group_map(
        _strip_explode(result, max_lag),
        ["metric", "tile_row", "tile_col"],
        assemble,
        n_buckets=n_buckets,
        out_schema=_PART_SCHEMA,
    )
    return bucketed_agg(
        parts,
        ["metric", "direction", "lag"],
        {"n_pairs": ("n_pairs", "sum"), "ss_hi": ("ss_hi", "sum"),
         "ss_lo": ("ss_lo", "sum")},
        n_buckets=8,
    )


def semivariogram_values(df: pd.DataFrame) -> pd.DataFrame:
    """Decode the exact integer partials into float γ(h) (original
    units²): γ = (2³²·ss_hi + ss_lo) / (2·n_pairs·10¹²)."""
    out = df.copy()
    ss = out["ss_hi"].astype(object) * 4294967296 + out["ss_lo"].astype(object)
    out["gamma"] = [
        float(s) / (2.0 * n * 1e12) if n else float("nan")
        for s, n in zip(ss, out["n_pairs"])
    ]
    return out
