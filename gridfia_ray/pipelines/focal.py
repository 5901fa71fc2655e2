"""Focal (neighborhood) map algebra with HALO EXCHANGE — the classic
distributed-raster pattern the tile model needs for any window kernel
(focal mean/sum, slope/aspect, convolution): a pixel's 3×3 window
crosses tile borders, so every tile ships its border strips to its 8
neighbors and each tile is then processed independently with a 1-pixel
halo.

Shape: ONE keyed exchange. Every result tile emits 9 rows — itself
keyed to its own (tile_row, tile_col), plus 8 border strips keyed to
each neighbor (O(perimeter) bytes each, so the exchange is corpus +
~8·perimeter, not 9× the corpus) — then ``groupby(tile key)`` assembles
a padded (h+2, w+2) grid and computes the window sums in one pass of
vectorized 2-D cumulative sums. Tiles at the global boundary simply
receive fewer strips; the presence mask makes the window count honest
(edge pixels average over the neighbors that exist — the same semantics
as a SQL self-join on BETWEEN ranges).

Exactness: values are micro-scaled to int64 BEFORE summing (same policy
as the overview pyramid), so window sums are bit-exact and partition /
order invariant; consumers divide sum_u by n_nbrs for the focal mean.

Reference parallel: gridfia has no focal/neighborhood operator (its map
algebra is strictly per-pixel, ``forest_metrics.py``); this is the
standard raster-engine extension of SURVEY §2.4's kernel family.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def _window_sums(padded: np.ndarray, k: int = 3) -> np.ndarray:
    """k×k window sums over the interior of a ``(h+k−1, w+k−1)``-padded
    2-D array via summed-area table — O(h·w), no Python loops."""
    c = np.zeros((padded.shape[0] + 1, padded.shape[1] + 1), dtype=padded.dtype)
    np.cumsum(padded, axis=0, out=c[1:, 1:])
    np.cumsum(c[1:, 1:], axis=1, out=c[1:, 1:])
    h, w = padded.shape[0] - (k - 1), padded.shape[1] - (k - 1)
    # sum of padded[i..i+k-1, j..j+k-1] for interior pixel (i, j)
    return c[k : k + h, k : k + w] - c[k : k + h, : w] - c[:h, k : k + w] + c[:h, :w]


def _halo_explode(
    result: rd.Dataset, op: str, allow_integer: bool = False, radius: int = 1
) -> rd.Dataset:
    """Shared halo-exchange emit stage: every result tile → itself plus
    8 border strips of width ``radius``, micro-scaled int64, keyed to
    the receiving tile (the exchange stays corpus + O(perimeter·radius)
    bytes — a one-hop protocol, so ``radius`` must be ≤ the tile dims).
    ``allow_integer`` passes integer tiles through UNSCALED (categorical
    rasters — labels, dominant indices — where µ-scaling is meaningless
    and the arithmetic kernels' inflate-guard doesn't apply)."""

    def explode(batch: pa.Table) -> pa.Table:
        mets, trs, tcs, dys, dxs, hs, ws, bufs = [], [], [], [], [], [], [], []
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
                    f"{op}: tile ({tr}, {tc}) of {met!r} has "
                    f"status {status[i]!r} — a NaN-filled failed tile would "
                    f"poison its own and all 8 neighbors' windows"
                )
            if radius > h or radius > w:
                raise ValueError(
                    f"{op}: halo radius {radius} exceeds the {h}×{w} tile — "
                    "the one-hop strip protocol needs radius <= tile size"
                )
            src_dtype = np.dtype(batch["dtype"][i].as_py())
            if np.issubdtype(src_dtype, np.integer):
                if not allow_integer:
                    raise ValueError(
                        f"{op} on an integer tile — the input is "
                        "already in the scaled domain and re-scaling would "
                        "inflate sums 1e6×; feed float metric tiles"
                    )
                arr = np.frombuffer(
                    batch["pix"][i].as_py(), dtype=src_dtype
                ).reshape(h, w)
                u = arr.astype(np.int64)  # categorical: no µ-scale
            else:
                arr = np.frombuffer(
                    batch["pix"][i].as_py(), dtype=src_dtype
                ).reshape(h, w)
                if np.isnan(arr).any():
                    raise ValueError(
                        f"{op}: tile ({tr}, {tc}) of {met!r} contains "
                        f"NaN — floor(NaN·1e6) is int64 garbage; mask or fill first"
                    )
                u = np.floor(
                    arr.astype(np.float64) * 1_000_000 + 0.5
                ).astype(np.int64)
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    nr, nc = tr + dy, tc + dx
                    if nr < 0 or nc < 0:
                        continue  # no tiles at negative indices
                    rows = u if dy == 0 else (u[:radius] if dy == -1 else u[-radius:])
                    strip = (
                        rows
                        if dx == 0
                        else (rows[:, :radius] if dx == -1 else rows[:, -radius:])
                    )
                    mets.append(met)
                    trs.append(nr)
                    tcs.append(nc)
                    dys.append(dy)
                    dxs.append(dx)
                    hs.append(h)
                    ws.append(w)
                    bufs.append(np.ascontiguousarray(strip).tobytes())
        return pa.table(
            {
                "metric": pa.array(mets, pa.string()),
                "tile_row": pa.array(trs, pa.int64()),
                "tile_col": pa.array(tcs, pa.int64()),
                "dy": pa.array(dys, pa.int8()),
                "dx": pa.array(dxs, pa.int8()),
                "h": pa.array(hs, pa.int64()),
                "w": pa.array(ws, pa.int64()),
                "strip": pa.array(bufs, pa.binary()),
            }
        )

    return result.map_batches(explode, batch_format="pyarrow")


def strips_to_padded(
    group: pd.DataFrame, op: str, radius: int = 1
) -> "tuple[np.ndarray, np.ndarray, int, int] | None":
    """Assemble one tile's strip group into padded ``(h+2r, w+2r)``
    int64 value + presence arrays. Returns None when no center tile
    lives at this address (strips addressed past the raster edge).
    Shared by the per-pixel halo pipeline below and the packed
    flow-routing stage (pipelines/flow.py)."""
    center = (group["dy"] == 0) & (group["dx"] == 0)
    if not center.any():
        return None
    if int(center.sum()) > 1:
        raise ValueError(
            f"{op}: duplicate tile "
            f"({group['tile_row'].iloc[0]}, {group['tile_col'].iloc[0]}) "
            f"for metric {group['metric'].iloc[0]!r} — strips would "
            f"overwrite nondeterministically"
        )
    hs, ws = group["h"].unique(), group["w"].unique()
    if len(hs) != 1 or len(ws) != 1:
        raise ValueError(
            f"{op}: mixed tile shapes {sorted(hs)}×{sorted(ws)} "
            f"meet at tile ({group['tile_row'].iloc[0]}, "
            f"{group['tile_col'].iloc[0]}) — the halo protocol needs one"
        )
    h, w = int(hs[0]), int(ws[0])
    rad = int(radius)
    vals = np.zeros((h + 2 * rad, w + 2 * rad), dtype=np.int64)
    pres = np.zeros((h + 2 * rad, w + 2 * rad), dtype=np.int64)
    for _, r in group.iterrows():
        dy, dx = int(r["dy"]), int(r["dx"])
        # the strip came FROM tile (target - (dy,dx)); it fills the
        # halo band on the side the source sits on
        rs = (
            slice(rad, h + rad)
            if dy == 0
            else (slice(h + rad, h + 2 * rad) if dy == -1 else slice(0, rad))
        )
        cs = (
            slice(rad, w + rad)
            if dx == 0
            else (slice(w + rad, w + 2 * rad) if dx == -1 else slice(0, rad))
        )
        n_r = h if dy == 0 else rad
        n_c = w if dx == 0 else rad
        strip = np.frombuffer(r["strip"], dtype=np.int64).reshape(n_r, n_c)
        vals[rs, cs] = strip
        pres[rs, cs] = 1
    return vals, pres, h, w


def _halo_pipeline(result: rd.Dataset, op: str, window_fn, empty: pd.DataFrame,
                   n_buckets: int, allow_integer: bool = False,
                   radius: int = 1) -> rd.Dataset:
    """Shared halo-exchange pipeline: explode → one keyed exchange →
    per-tile padded assembly → ``window_fn(vals, pres, h, w) ->
    (cols, keep)`` where ``cols`` is a dict of h×w output arrays
    (emitted alongside the standard metric/y/x columns) and ``keep`` is
    an h×w boolean emission mask, or None to emit every pixel.

    A ``window_fn`` that also declares a ``metric`` parameter receives
    the tile's metric name — needed by kernels whose math depends on
    per-metric global scalars (local autocorrelation)."""
    import inspect

    wants_metric = "metric" in inspect.signature(window_fn).parameters

    def assemble(group: pd.DataFrame) -> pd.DataFrame:
        padded = strips_to_padded(group, op, radius=radius)
        if padded is None:
            # strips addressed past the raster edge: no tile lives here
            return empty
        vals, pres, h, w = padded
        if wants_metric:
            cols, keep = window_fn(vals, pres, h, w, metric=group["metric"].iloc[0])
        else:
            cols, keep = window_fn(vals, pres, h, w)
        tr = int(group["tile_row"].iloc[0])
        tc = int(group["tile_col"].iloc[0])
        yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        out = {
            "metric": group["metric"].iloc[0],
            "y": (yy + tr * h).ravel().astype(np.int64),
            "x": (xx + tc * w).ravel().astype(np.int64),
        }
        out.update({k: v.ravel() for k, v in cols.items()})
        df = pd.DataFrame(out)
        return df if keep is None else df.loc[keep.ravel()]

    from gridfia_ray.stages.agg_util import bucketed_group_map

    # pin the output Arrow schema explicitly — an all-empty bucket must
    # emit the same schema as a full one (inference from an empty object
    # column would yield Arrow null and churn the executor); numeric
    # dtypes come from the ``empty`` frame so float kernels (local
    # autocorrelation) pin float64 instead of int64
    out_schema = pa.schema(
        [("metric", pa.string())]
        + [
            (c, pa.from_numpy_dtype(empty[c].dtype))
            for c in empty.columns
            if c != "metric"
        ]
    )
    return bucketed_group_map(
        _halo_explode(result, op, allow_integer=allow_integer, radius=radius),
        ["metric", "tile_row", "tile_col"],
        assemble,
        n_buckets=n_buckets,
        out_schema=out_schema,
    )


def focal_sum_tiles(result: rd.Dataset, n_buckets: int = 64) -> rd.Dataset:
    """3×3 focal sum+count over a result-tile dataset (the
    ``run_metrics`` output schema: metric, tile_row, tile_col, h, w,
    pix, dtype) → long rows (metric, y, x, sum_u, n_nbrs).

    All tiles must share one (h, w) — the halo protocol's strip dims are
    implied by it; a mismatched tile raises. Window sums are over the
    micro-scaled int64 domain (exact). Edge pixels count only the
    neighbors that exist (n_nbrs)."""
    empty = pd.DataFrame(
        {"metric": pd.Series(dtype=str),
         "y": pd.Series(dtype=np.int64), "x": pd.Series(dtype=np.int64),
         "sum_u": pd.Series(dtype=np.int64), "n_nbrs": pd.Series(dtype=np.int64)}
    )

    def window(vals, pres, h, w):
        return {"sum_u": _window_sums(vals), "n_nbrs": _window_sums(pres)}, None

    return _halo_pipeline(result, "focal_sum_tiles", window, empty, n_buckets)


def focal_stats_tiles(
    result: rd.Dataset, radius: int = 2, n_buckets: int = 64
) -> rd.Dataset:
    """ArcGIS-style Focal Statistics with an arbitrary square
    ``(2r+1)×(2r+1)`` window — the generalization of the 3×3 family,
    exercising the width-``r`` halo strips: per pixel the exact window
    SUM (µ-scaled int64 via summed-area table), neighbor COUNT, MIN and
    MAX over the neighbors that exist. Edge pixels aggregate over their
    present neighbors only (the focal_sum edge policy; min/max mask
    absent halo cells with ±int64 sentinels). One keyed exchange of
    corpus + O(perimeter·r) bytes; r must be ≤ the tile dims (the
    one-hop protocol — deeper windows at fixed tile size re-tile
    first)."""
    rad = int(radius)
    if rad < 1:
        raise ValueError("focal_stats_tiles: radius must be >= 1")
    k = 2 * rad + 1
    empty = pd.DataFrame(
        {"metric": pd.Series(dtype=str),
         "y": pd.Series(dtype=np.int64), "x": pd.Series(dtype=np.int64),
         "sum_u": pd.Series(dtype=np.int64), "n_nbrs": pd.Series(dtype=np.int64),
         "min_u": pd.Series(dtype=np.int64), "max_u": pd.Series(dtype=np.int64)}
    )

    def window(P, pres, h, w):
        sums = _window_sums(P, k)
        nbrs = _window_sums(pres, k)
        lo = np.where(pres == 1, P, np.iinfo(np.int64).max)
        hi = np.where(pres == 1, P, np.iinfo(np.int64).min)
        mn = lo[:h, :w].copy()
        mx = hi[:h, :w].copy()
        for dy in range(k):
            for dx in range(k):
                if dy == 0 and dx == 0:
                    continue
                np.minimum(mn, lo[dy : dy + h, dx : dx + w], out=mn)
                np.maximum(mx, hi[dy : dy + h, dx : dx + w], out=mx)
        return {"sum_u": sums, "n_nbrs": nbrs, "min_u": mn, "max_u": mx}, None

    return _halo_pipeline(
        result, "focal_stats_tiles", window, empty, n_buckets, radius=rad
    )


def focal_median_tiles(result: rd.Dataset, n_buckets: int = 64) -> rd.Dataset:
    """3×3 median (despeckle) filter over a result-tile raster via the
    same halo exchange: per interior pixel the 5th smallest of its 9
    µ-scaled int64 window values (exact — the median of 9 integers is
    an order statistic, no interpolation). Only INTERIOR pixels (all 9
    neighbors present) are emitted, matching the gradient's edge
    policy. The classic salt-and-pepper scrub of the image-filter
    family."""
    empty = pd.DataFrame(
        {"metric": pd.Series(dtype=str),
         "y": pd.Series(dtype=np.int64), "x": pd.Series(dtype=np.int64),
         "med_u": pd.Series(dtype=np.int64)}
    )

    def window(P, pres, h, w):
        stack = np.stack(
            [P[dy : dy + h, dx : dx + w] for dy in range(3) for dx in range(3)]
        )
        med = np.partition(stack, 4, axis=0)[4]
        nbrs = np.stack(
            [pres[dy : dy + h, dx : dx + w] for dy in range(3) for dx in range(3)]
        ).sum(axis=0)
        return {"med_u": med}, nbrs == 9

    return _halo_pipeline(result, "focal_median_tiles", window, empty, n_buckets)


def focal_majority_tiles(result: rd.Dataset, n_buckets: int = 64) -> rd.Dataset:
    """3×3 MAJORITY (modal) filter — the ArcGIS Majority Filter for
    categorical rasters (labels, dominant-species indices): per
    interior pixel the most frequent of its 9 window values, ties
    broken toward the SMALLEST value. Vectorized mode: sort the shifted
    stack along the window axis, run-length by cumulative equality, and
    take the first maximal run's end (ascending order makes "first" ≡
    "smallest modal value"). Same halo exchange and interior-only edge
    policy as the median/gradient kernels."""
    empty = pd.DataFrame(
        {"metric": pd.Series(dtype=str),
         "y": pd.Series(dtype=np.int64), "x": pd.Series(dtype=np.int64),
         "maj": pd.Series(dtype=np.int64)}
    )

    def window(P, pres, h, w):
        stack = np.stack(
            [P[dy : dy + h, dx : dx + w] for dy in range(3) for dx in range(3)]
        )
        s = np.sort(stack, axis=0)
        run = np.ones_like(s)
        for kk in range(1, 9):
            run[kk] = np.where(s[kk] == s[kk - 1], run[kk - 1] + 1, 1)
        first_max = np.argmax(run, axis=0)  # first max = smallest modal value
        maj = np.take_along_axis(s, first_max[None], axis=0)[0]
        nbrs = np.stack(
            [pres[dy : dy + h, dx : dx + w] for dy in range(3) for dx in range(3)]
        ).sum(axis=0)
        return {"maj": maj}, nbrs == 9

    return _halo_pipeline(
        result, "focal_majority_tiles", window, empty, n_buckets,
        allow_integer=True,
    )


def focal_gradient_tiles(result: rd.Dataset, n_buckets: int = 64) -> rd.Dataset:
    """Horn (1981) 3×3 gradient components over a result-tile raster —
    the slope/aspect building block of DEM-style map algebra — via the
    same halo exchange as :func:`focal_sum_tiles`.

    For window  a b c          ddx_u = (c + 2f + i) - (a + 2d + g)
                d e f          ddy_u = (g + 2h + i) - (a + 2b + c)
                g h i
    computed in the micro-scaled int64 domain (exact integer weighted
    sums; divide by 8·pixel_size·1e6 for the physical gradient). Only
    INTERIOR pixels (all 9 neighbors present) are emitted — boundary
    gradients would silently mix in zero padding."""
    empty = pd.DataFrame(
        {"metric": pd.Series(dtype=str),
         "y": pd.Series(dtype=np.int64), "x": pd.Series(dtype=np.int64),
         "ddx_u": pd.Series(dtype=np.int64), "ddy_u": pd.Series(dtype=np.int64)}
    )

    def window(P, pres, h, w):
        a = P[0:h, 0:w]; b = P[0:h, 1:w + 1]; c = P[0:h, 2:w + 2]
        d = P[1:h + 1, 0:w]; f = P[1:h + 1, 2:w + 2]
        g = P[2:h + 2, 0:w]; hh = P[2:h + 2, 1:w + 1]; i = P[2:h + 2, 2:w + 2]
        ddx = (c + 2 * f + i) - (a + 2 * d + g)
        ddy = (g + 2 * hh + i) - (a + 2 * b + c)
        interior = _window_sums(pres) == 9
        return {"ddx_u": ddx, "ddy_u": ddy}, interior

    return _halo_pipeline(result, "focal_gradient_tiles", window, empty, n_buckets)


def hillshade_from_gradient(
    ddx_u: np.ndarray,
    ddy_u: np.ndarray,
    pixel_size: float,
    azimuth_deg: float = 315.0,
    altitude_deg: float = 45.0,
    z_factor: float = 1.0,
) -> np.ndarray:
    """Lambertian hillshade from micro-scaled Horn components (the
    public Horn/ESRI formula): slope = atan(z·|∇|), aspect =
    atan2(dz/dy, -dz/dx), shade = 255·(cos z̄·cos s + sin z̄·sin s·
    cos(ā − aspect)) with z̄ = 90° − altitude and ā the math-convention
    azimuth. Returns int64 0..255 (negatives clip to 0). A pure leaf —
    the pinned oracle replays it on independently derived gradients."""
    denom = 8.0 * pixel_size * 1e6
    dzdx = np.asarray(ddx_u, np.float64) / denom * z_factor
    dzdy = np.asarray(ddy_u, np.float64) / denom * z_factor
    zen = np.deg2rad(90.0 - altitude_deg)
    az = np.deg2rad(360.0 - azimuth_deg + 90.0)
    slope = np.arctan(np.hypot(dzdx, dzdy))
    aspect = np.arctan2(dzdy, -dzdx)
    shade = 255.0 * (
        np.cos(zen) * np.cos(slope)
        + np.sin(zen) * np.sin(slope) * np.cos(az - aspect)
    )
    return np.clip(np.floor(shade + 0.5), 0, 255).astype(np.int64)


def hillshade_tiles(
    result: rd.Dataset,
    pixel_size: float,
    azimuth_deg: float = 315.0,
    altitude_deg: float = 45.0,
    z_factor: float = 1.0,
    n_buckets: int = 64,
) -> rd.Dataset:
    """DEM-style hillshade over a result-tile raster: the Horn gradient
    halo exchange (:func:`focal_gradient_tiles`) followed by a pure
    vectorized shading map — no additional shuffle. Interior pixels
    only (the gradient contract). Emits (metric, y, x, shade)."""
    import pyarrow as pa

    grad = focal_gradient_tiles(result, n_buckets=n_buckets)

    def shade(batch: pa.Table) -> pa.Table:
        s = hillshade_from_gradient(
            batch["ddx_u"].to_numpy(zero_copy_only=False),
            batch["ddy_u"].to_numpy(zero_copy_only=False),
            pixel_size,
            azimuth_deg=azimuth_deg,
            altitude_deg=altitude_deg,
            z_factor=z_factor,
        )
        return pa.table(
            {
                "metric": batch["metric"],
                "y": batch["y"],
                "x": batch["x"],
                "shade": pa.array(s, pa.int64()),
            }
        )

    return grad.map_batches(shade, batch_format="pyarrow")


def focal_tpi_tiles(result: rd.Dataset, n_buckets: int = 64) -> rd.Dataset:
    """Topographic Position Index (Weiss 2001): center minus the mean
    of its 8 neighbors, the standard DEM landform classifier — via the
    same halo exchange. Emitted as the EXACT integer ``tpi9_u = 9*c -
    window_sum`` in the micro-scaled domain (equal to 8 * TPI * 1e6 —
    integer-exact, no division), interior pixels only (an edge pixel's
    partial neighborhood would bias the mean)."""
    empty = pd.DataFrame(
        {"metric": pd.Series(dtype=str),
         "y": pd.Series(dtype=np.int64), "x": pd.Series(dtype=np.int64),
         "tpi9_u": pd.Series(dtype=np.int64)}
    )

    def window(P, pres, h, w):
        center = P[1 : h + 1, 1 : w + 1]
        tpi9 = 9 * center - _window_sums(P)
        interior = _window_sums(pres) == 9
        return {"tpi9_u": tpi9}, interior

    return _halo_pipeline(result, "focal_tpi_tiles", window, empty, n_buckets)


def focal_curvature_tiles(result: rd.Dataset, n_buckets: int = 64) -> rd.Dataset:
    """Zevenbergen & Thorne (1987) GENERAL curvature over a result-tile
    dataset — ArcGIS Curvature's −2(D+E) core, kept exact as the
    4-neighbor integer Laplacian in the micro-scaled domain:
    ``lap4_u = N + S + E + W − 4·center`` (= −2·L²·curvature·10⁶ up to
    the cell-size constant), via the same halo exchange as TPI.
    Interior pixels only; completes the slope/aspect/hillshade/TPI
    surface family."""
    empty = pd.DataFrame(
        {"metric": pd.Series(dtype=str),
         "y": pd.Series(dtype=np.int64), "x": pd.Series(dtype=np.int64),
         "lap4_u": pd.Series(dtype=np.int64)}
    )

    def window(P, pres, h, w):
        c = P[1 : h + 1, 1 : w + 1]
        lap4 = (
            P[0:h, 1 : w + 1]          # N
            + P[2 : h + 2, 1 : w + 1]  # S
            + P[1 : h + 1, 0:w]        # W
            + P[1 : h + 1, 2 : w + 2]  # E
            - 4 * c
        )
        interior = _window_sums(pres) == 9
        return {"lap4_u": lap4}, interior

    return _halo_pipeline(result, "focal_curvature_tiles", window, empty, n_buckets)


def aspect_octants(ddx_u: np.ndarray, ddy_u: np.ndarray) -> np.ndarray:
    """8-way compass aspect (direction of steepest DESCENT) from Horn
    components — the exact-integer discretization of the classic aspect
    product: sector k covers [k*45°, (k+1)*45°) clockwise from north,
    decided purely by sign/magnitude comparisons on the scaled-int
    gradients (no trig, so a SQL CASE oracle reproduces it exactly).
    Returns int64: 0..7 = N, NE, E, SE, S, SW, W, NW start sectors;
    -1 = flat (zero gradient). The ESRI 22.5°-centered convention needs
    tan(22.5°) and is inherently float; this is the deterministic
    discrete form."""
    u = -np.asarray(ddx_u, np.int64)  # descent east component
    v = np.asarray(ddy_u, np.int64)  # descent north component
    conds = [
        (u == 0) & (v == 0),
        (u >= 0) & (v > 0) & (u < v),    # [0, 45)
        (u > 0) & (v > 0) & (u >= v),    # [45, 90)
        (u > 0) & (v <= 0) & (u > -v),   # [90, 135)
        (u > 0) & (v < 0) & (u <= -v),   # [135, 180)
        (u <= 0) & (v < 0) & (-u < -v),  # [180, 225)
        (u < 0) & (v < 0) & (-u >= -v),  # [225, 270)
        ((u < 0) & (v == 0)) | ((u < 0) & (v > 0) & (-u > v)),  # [270, 315)
        (u < 0) & (v > 0) & (-u <= v),   # [315, 360)
    ]
    return np.select(conds, [-1, 0, 1, 2, 3, 4, 5, 6, 7]).astype(np.int64)


def focal_aspect_tiles(result: rd.Dataset, n_buckets: int = 64) -> rd.Dataset:
    """Aspect-octant raster over a result-tile dataset: the Horn halo
    exchange feeding the integer sector classifier — no extra shuffle.
    Emits (metric, y, x, octant)."""
    import pyarrow as pa

    grad = focal_gradient_tiles(result, n_buckets=n_buckets)

    def classify(batch: pa.Table) -> pa.Table:
        o = aspect_octants(
            batch["ddx_u"].to_numpy(zero_copy_only=False),
            batch["ddy_u"].to_numpy(zero_copy_only=False),
        )
        return pa.table(
            {
                "metric": batch["metric"],
                "y": batch["y"],
                "x": batch["x"],
                "octant": pa.array(o, pa.int64()),
            }
        )

    return grad.map_batches(classify, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Marching-squares contour extraction (raster → vector isolines) — the
# gdal_contour analogue, completing the raster↔vector family alongside
# rasterize (vector → raster) and connected components. Public algorithm
# (Lorensen & Cline's 2-D case tables). Each 2×2 pixel cell belongs to
# the tile owning its top-left pixel; the cell's other three corners come
# from the SAME 3×3 halo exchange the focal kernels use, so tile-border
# cells are exact and no cell is emitted twice.
# ---------------------------------------------------------------------------

# corner bits: TL=8, TR=4, BR=2, BL=1 (inside ⇔ value ≥ level).
# edges: T=0 R=1 B=2 L=3. Saddles (5, 10) pair each inside corner with
# its own two adjacent edges (no center disambiguation — documented,
# deterministic, and mirrored by the test replay).
_MS_SEGMENTS: dict[int, list[tuple[int, int]]] = {
    1: [(3, 2)], 2: [(2, 1)], 3: [(3, 1)], 4: [(0, 1)],
    5: [(0, 1), (2, 3)], 6: [(0, 2)], 7: [(0, 3)], 8: [(0, 3)],
    9: [(0, 2)], 10: [(0, 3), (2, 1)],
    11: [(0, 1)], 12: [(3, 1)], 13: [(2, 1)], 14: [(3, 2)],
}


def _ms_case(tl, tr, br, bl, level_u):
    return (
        8 * (tl >= level_u).astype(np.int64)
        + 4 * (tr >= level_u).astype(np.int64)
        + 2 * (br >= level_u).astype(np.int64)
        + 1 * (bl >= level_u).astype(np.int64)
    )


def contour_cells_tiles(
    result: rd.Dataset, level: float, n_buckets: int = 64
) -> rd.Dataset:
    """Integer marching-squares classification: one row per 2×2 cell the
    ``level`` isoline crosses — (metric, y, x, ms_case, n_seg) with
    (y, x) the cell's top-left pixel. Thresholding happens in the
    micro-scaled int64 domain (corner ≥ level ⇔ floor(v·1e6+0.5) ≥
    floor(level·1e6+0.5)), so the output is bit-exact vs a SQL
    four-way self-join oracle. Cells needing absent pixels (global
    raster edge) are not emitted."""
    level_u = int(np.floor(level * 1_000_000 + 0.5))
    empty = pd.DataFrame(
        {"metric": pd.Series(dtype=str),
         "y": pd.Series(dtype=np.int64), "x": pd.Series(dtype=np.int64),
         "ms_case": pd.Series(dtype=np.int64), "n_seg": pd.Series(dtype=np.int64)}
    )

    def window(P, pres, h, w):
        tl = P[1:h + 1, 1:w + 1]; tr = P[1:h + 1, 2:w + 2]
        bl = P[2:h + 2, 1:w + 1]; br = P[2:h + 2, 2:w + 2]
        have = (
            pres[1:h + 1, 1:w + 1] & pres[1:h + 1, 2:w + 2]
            & pres[2:h + 2, 1:w + 1] & pres[2:h + 2, 2:w + 2]
        ) == 1
        case = _ms_case(tl, tr, br, bl, level_u)
        keep = have & (case > 0) & (case < 15)
        n_seg = np.where((case == 5) | (case == 10), 2, 1).astype(np.int64)
        return {"ms_case": case, "n_seg": n_seg}, keep

    return _halo_pipeline(result, "contour_cells_tiles", window, empty, n_buckets)


def contour_segments_tiles(
    result: rd.Dataset, level: float, n_buckets: int = 64
) -> rd.Dataset:
    """Full contour GEOMETRY: per crossed cell, the isoline segment
    endpoints in CELL-LOCAL pixel coordinates ∈ [0, 1] via linear
    interpolation along the crossed edges (float64; up to two segments
    per cell — the second is NaN except at saddles). Global
    coordinates are (x + xi, y + yi) — the integer (y, x) columns
    carry the cell's top-left pixel (the assembler can't thread the
    tile offset into float columns). Interpolation runs in the
    micro-int domain, t = (level_u − v_a) / (v_b − v_a), identical on
    every partitioning. Segment chaining into polylines is a driver-
    side concern at the caller's scale; the segment table itself is
    the distributed product (one row per cell)."""
    level_u = int(np.floor(level * 1_000_000 + 0.5))
    seg_cols = ["x0", "y0", "x1", "y1", "x2", "y2", "x3", "y3"]
    empty = pd.DataFrame(
        {"metric": pd.Series(dtype=str),
         "y": pd.Series(dtype=np.int64), "x": pd.Series(dtype=np.int64),
         "ms_case": pd.Series(dtype=np.int64),
         **{c: pd.Series(dtype=np.float64) for c in seg_cols}}
    )

    def window(P, pres, h, w):
        tl = P[1:h + 1, 1:w + 1].astype(np.float64)
        tr = P[1:h + 1, 2:w + 2].astype(np.float64)
        bl = P[2:h + 2, 1:w + 1].astype(np.float64)
        br = P[2:h + 2, 2:w + 2].astype(np.float64)
        have = (
            pres[1:h + 1, 1:w + 1] & pres[1:h + 1, 2:w + 2]
            & pres[2:h + 2, 1:w + 1] & pres[2:h + 2, 2:w + 2]
        ) == 1
        case = _ms_case(
            P[1:h + 1, 1:w + 1], P[1:h + 1, 2:w + 2],
            P[2:h + 2, 2:w + 2], P[2:h + 2, 1:w + 1], level_u
        )
        keep = have & (case > 0) & (case < 15)

        L = float(level_u)
        with np.errstate(divide="ignore", invalid="ignore"):
            t_top = (L - tl) / (tr - tl)
            t_right = (L - tr) / (br - tr)
            t_bottom = (L - bl) / (br - bl)
            t_left = (L - tl) / (bl - tl)
        # edge -> (x_offset, y_offset) in cell-local pixel units
        ex = [t_top, np.ones_like(t_top), t_bottom, np.zeros_like(t_top)]
        ey = [np.zeros_like(t_top), t_right, np.ones_like(t_top), t_left]

        out = {c: np.full((h, w), np.nan) for c in seg_cols}
        for cs, segs in _MS_SEGMENTS.items():
            m = keep & (case == cs)
            if not m.any():
                continue
            for si, (e0, e1) in enumerate(segs):
                base = 4 * si
                out[seg_cols[base + 0]][m] = ex[e0][m]
                out[seg_cols[base + 1]][m] = ey[e0][m]
                out[seg_cols[base + 2]][m] = ex[e1][m]
                out[seg_cols[base + 3]][m] = ey[e1][m]
        return {"ms_case": case.astype(np.int64), **out}, keep

    return _halo_pipeline(result, "contour_segments_tiles", window, empty, n_buckets)


def glcm_counts_tiles(
    result: rd.Dataset,
    n_levels: int = 16,
    level_width_u: int = 20_000_000,
    n_buckets: int = 64,
) -> rd.Dataset:
    """Gray-Level Co-occurrence Matrix (Haralick texture analysis, the
    remote-sensing staple): quantize the µ-scaled raster into
    ``n_levels`` gray levels (``level = min(v_u // level_width_u,
    n_levels−1)``) and count ordered adjacent-pixel level pairs for the
    east (dy=0,dx=1) and south (dy=1,dx=0) offsets — the raw integer
    GLCM from which contrast/homogeneity/energy derive. Cross-tile
    adjacencies come through the same halo exchange as the focal
    kernels; each tile folds to at most ``2·n_levels²`` partial rows
    and one tiny keyed merge sums them. Returns rows
    (metric, direction, la, lb, n_pairs) with direction 'e'/'s'."""
    from gridfia_ray.stages.agg_util import bucketed_agg, bucketed_group_map

    part_schema = pa.schema(
        [("metric", pa.string()), ("direction", pa.string()),
         ("la", pa.int64()), ("lb", pa.int64()), ("n_pairs", pa.int64())]
    )
    empty = pa.table(
        {f.name: pa.array([], f.type) for f in part_schema}, schema=part_schema
    ).to_pandas()

    def assemble(group: pd.DataFrame) -> pd.DataFrame:
        padded = strips_to_padded(group, "glcm_counts_tiles")
        if padded is None:
            return empty
        vals, pres, h, w = padded
        lev = np.minimum(vals // np.int64(level_width_u), n_levels - 1)
        c = lev[1 : h + 1, 1 : w + 1]
        cp = pres[1 : h + 1, 1 : w + 1]
        frames = []
        for name, dy, dx in (("e", 0, 1), ("s", 1, 0)):
            nb = lev[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]
            nbp = pres[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]
            m = (cp == 1) & (nbp == 1)
            if not m.any():
                continue
            key = c[m] * np.int64(n_levels) + nb[m]
            uniq, cnt = np.unique(key, return_counts=True)
            frames.append(
                pd.DataFrame(
                    {
                        "metric": group["metric"].iloc[0],
                        "direction": name,
                        "la": uniq // n_levels,
                        "lb": uniq % n_levels,
                        "n_pairs": cnt.astype(np.int64),
                    }
                )
            )
        if not frames:
            return empty
        return pd.concat(frames, ignore_index=True)

    parts = bucketed_group_map(
        _halo_explode(result, "glcm_counts_tiles"),
        ["metric", "tile_row", "tile_col"],
        assemble,
        n_buckets=n_buckets,
        out_schema=part_schema,
    )
    return bucketed_agg(
        parts,
        ["metric", "direction", "la", "lb"],
        {"n_pairs": ("n_pairs", "sum")},
        n_buckets=16,
    )


def focal_unsharp_tiles(
    result: rd.Dataset, k_num: int = 3, k_den: int = 2, n_buckets: int = 64
) -> rd.Dataset:
    """Unsharp masking (edge-boost sharpening): ``sharp = v +
    k·(v − focal_mean)`` over the 3×3 window, folded into ONE exact
    integer expression ``v + (k_num·(n·v − Σ)) // (k_den·n)`` so the
    floor matches the SQL oracle's FLOOR on the (exactly-representable)
    double quotient. Same single halo exchange as focal_sum."""
    empty = pd.DataFrame(
        {
            "metric": pd.Series(dtype=str),
            "y": pd.Series(dtype=np.int64),
            "x": pd.Series(dtype=np.int64),
            "sharp_u": pd.Series(dtype=np.int64),
        }
    )

    def window(vals, pres, h, w):
        s = _window_sums(vals * pres)
        n = _window_sums(pres)
        v = vals[1 : h + 1, 1 : w + 1]
        sharp = v + (k_num * (n * v - s)) // (k_den * n)
        return {"sharp_u": sharp}, None

    return _halo_pipeline(result, "focal_unsharp", window, empty, n_buckets)
