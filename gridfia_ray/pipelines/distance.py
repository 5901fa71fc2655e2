"""Distance transform (gdal_proximity semantics, L1 metric): for every
pixel, the Manhattan distance in pixel steps to the nearest FEATURE
pixel (micro-scaled value strictly above a threshold).

The L1 metric is exactly separable:

  min_{(y',x')∈F} |y−y'| + |x−x'|
    = min_{x'} ( |x−x'| + d1(y, x') ),   d1(y, x') = min_{y': (y',x')∈F} |y−y'|

so the transform is TWO banded passes, each one keyed co-location
exchange plus a fully vectorized scan — no Python loop over pixels:

  pass A (vertical):   group tiles by (metric, tile_col); stack the
      column band (H × tile_w); nearest-feature-above is
      ``maximum.accumulate`` over feature row indices, below is the
      flipped twin; d1 = min of both.
  pass B (horizontal):  group pass-A tiles by (metric, tile_row);
      stack the row band (tile_h × W); the 1-D L1 envelope
      f(x) = min_{x'} (d1[x'] + |x−x'|) is
      ``x + minimum.accumulate(d1 − x)`` forward plus the flipped
      twin — the classic two-scan distance propagation.

Results are exact int64 pixel distances, so the SQL oracle is a plain
``MIN(ABS(Δy) + ABS(Δx))`` over the feature set — no float tolerance
anywhere.

Partitioning assumption (documented, same family as the warp gather):
one group materializes one column band (O(grid_height × tile_w) int64)
or one row band (O(tile_h × grid_width)). For planetary single-metric
rasters beyond ~10⁹-pixel bands, the scan must be chunked with
boundary-vector propagation between tiles (a sequential dependency per
band); the band form is the right trade at fleet scale because bands
across metrics/columns parallelize freely.

Reference parallel: gridfia has no proximity operator; this is the
standard raster-engine companion to the focal family (SURVEY §2.4).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

#: sentinel "no feature in this column" — far above any real raster
#: dimension yet small enough that INF + grid_width never overflows.
_INF = np.int64(1) << 40


def _nearest_1d(mask: np.ndarray) -> np.ndarray:
    """Per-element distance (along axis 0) to the nearest True in its
    column; _INF where the column has none. Fully vectorized."""
    H = mask.shape[0]
    idx = np.arange(H, dtype=np.int64)[:, None]
    # last feature index at-or-above each row (−1−INF where none yet)
    above = np.maximum.accumulate(np.where(mask, idx, np.int64(-1) - _INF), axis=0)
    d_above = idx - above
    # the below twin is the above scan on the flipped mask
    rev = np.maximum.accumulate(np.where(mask[::-1], idx, np.int64(-1) - _INF), axis=0)
    d_below = (idx - rev)[::-1]
    return np.minimum(np.minimum(d_above, d_below), _INF)


def _envelope_1d(d1: np.ndarray) -> np.ndarray:
    """f(x) = min_{x'} (d1[..., x'] + |x − x'|) along the LAST axis via
    the forward/backward minimum-accumulate scans."""
    x = np.arange(d1.shape[-1], dtype=np.int64)
    fwd = np.minimum.accumulate(d1 - x, axis=-1) + x
    rev = (np.minimum.accumulate((d1 + x)[..., ::-1], axis=-1))[..., ::-1] - x
    return np.minimum(fwd, rev)


def _u_of(batch_row_pix: bytes, dtype: str, h: int, w: int) -> np.ndarray:
    arr = np.frombuffer(batch_row_pix, dtype=np.dtype(dtype)).reshape(h, w)
    return np.floor(arr.astype(np.float64) * 1_000_000 + 0.5).astype(np.int64)


def _assemble_band(group: pd.DataFrame, axis: str):
    """Stack a band's tiles along ``axis`` in key order; raise on
    gaps (a sparse store would silently read as feature-free)."""
    key = "tile_row" if axis == "v" else "tile_col"
    group = group.sort_values(key)
    ks = group[key].to_numpy()
    if not (ks == np.arange(len(ks))).all():
        raise ValueError(
            f"distance_transform: non-contiguous {key} set "
            f"{ks.tolist()} — sparse stores are not supported"
        )
    hs, ws = group["h"].unique(), group["w"].unique()
    if len(hs) != 1 or len(ws) != 1:
        raise ValueError("distance_transform: mixed tile shapes in a band")
    return group, int(hs[0]), int(ws[0])


def _vertical_d1_tiles(result: rd.Dataset, thr_u: int, n_buckets: int) -> rd.Dataset:
    """Shared pass A: per column band the vertical distance to the
    nearest feature pixel, re-tiled as int64 ``d1`` buffers."""
    from gridfia_ray.stages.agg_util import bucketed_group_map

    def pass_a(group: pd.DataFrame) -> pd.DataFrame:
        group, h, w = _assemble_band(group, "v")
        band = np.vstack(
            [
                _u_of(r["pix"], r["dtype"], h, w) > thr_u
                for _, r in group.iterrows()
            ]
        )
        d1 = _nearest_1d(band)
        out = []
        for i, (_, r) in enumerate(group.iterrows()):
            out.append(
                {
                    "metric": r["metric"],
                    "tile_row": int(r["tile_row"]),
                    "tile_col": int(r["tile_col"]),
                    "h": h,
                    "w": w,
                    "d1": d1[i * h : (i + 1) * h].tobytes(),
                }
            )
        return pd.DataFrame(out)

    empty_a = pa.schema(
        [("metric", pa.string()), ("tile_row", pa.int64()),
         ("tile_col", pa.int64()), ("h", pa.int64()), ("w", pa.int64()),
         ("d1", pa.binary())]
    )
    return bucketed_group_map(
        result, ["metric", "tile_col"], pass_a,
        n_buckets=n_buckets, out_schema=empty_a,
    )


def distance_transform_tiles(
    result: rd.Dataset, threshold: float, n_buckets: int = 64
) -> rd.Dataset:
    """L1 distance-to-nearest-feature per pixel over a result-tile
    dataset → rows (metric, y, x, dist). Features are pixels whose
    micro-scaled value exceeds ``floor(threshold·1e6 + 0.5)`` — the
    same integer predicate the SQL oracle applies. Raises if a metric
    has no feature pixel anywhere (the transform is undefined)."""
    from gridfia_ray.stages.agg_util import bucketed_group_map

    thr_u = int(np.floor(threshold * 1_000_000 + 0.5))
    tiles_d1 = _vertical_d1_tiles(result, thr_u, n_buckets)

    def pass_b(group: pd.DataFrame) -> pd.DataFrame:
        group, h, w = _assemble_band(group, "h")
        band = np.hstack(
            [
                np.frombuffer(r["d1"], dtype=np.int64).reshape(h, w)
                for _, r in group.iterrows()
            ]
        )
        dist = _envelope_1d(band)
        if dist.min() >= _INF // 2:
            raise ValueError(
                "distance_transform: no feature pixel in the raster for "
                f"metric {group['metric'].iloc[0]!r} at threshold"
            )
        tr = int(group["tile_row"].iloc[0])
        W = band.shape[1]
        yy, xx = np.meshgrid(
            np.arange(h, dtype=np.int64), np.arange(W, dtype=np.int64),
            indexing="ij",
        )
        return pd.DataFrame(
            {
                "metric": group["metric"].iloc[0],
                "y": (yy + tr * h).ravel(),
                "x": xx.ravel(),
                "dist": dist.ravel(),
            }
        )

    empty_b = pa.schema(
        [("metric", pa.string()), ("y", pa.int64()), ("x", pa.int64()),
         ("dist", pa.int64())]
    )
    return bucketed_group_map(
        tiles_d1, ["metric", "tile_row"], pass_b,
        n_buckets=n_buckets, out_schema=empty_b,
    )


def distance_transform_l2_tiles(
    result: rd.Dataset,
    threshold: float,
    n_buckets: int = 64,
    block: int = 64,
) -> rd.Dataset:
    """EXACT squared-EUCLIDEAN distance transform: per pixel the
    minimum (Δy)² + (Δx)² to any feature pixel — the image-processing
    standard (Felzenszwalb-Huttenlocher semantics) kept in integers so
    the ``MIN((Δy)² + (Δx)²)`` cross-join oracle matches bit for bit.

    Same two banded passes as the L1 transform (pass A is SHARED): the
    L2² column reduction is D(y, x) = min_{x'} (d1(y, x')² + (x − x')²)
    computed per row band as a blocked vectorized min over x' — exact,
    O(h·W²/…) flops per band. Scale note: beyond ~10⁴-pixel band widths
    swap the blocked min for the FH lower-envelope hull per row (O(W)
    sequential); the banded partitioning and pass A are unchanged."""
    from gridfia_ray.stages.agg_util import bucketed_group_map

    thr_u = int(np.floor(threshold * 1_000_000 + 0.5))
    tiles_d1 = _vertical_d1_tiles(result, thr_u, n_buckets)

    def pass_b(group: pd.DataFrame) -> pd.DataFrame:
        group, h, w = _assemble_band(group, "h")
        d1 = np.hstack(
            [
                np.frombuffer(r["d1"], dtype=np.int64).reshape(h, w)
                for _, r in group.iterrows()
            ]
        )
        W = d1.shape[1]
        # no-feature columns carry d1 = _INF whose square overflows
        # int64 — swap in a 2⁶² sentinel instead of squaring. Legit
        # squared distances stay < 2⁶⁰ for any raster under 2³⁰ pixels
        # a side, and sentinel + (x−x')² < 2⁶³, so the sentinel can
        # never shadow or fake a reachable minimum
        _BIG = np.int64(1) << 62
        nf = d1 >= _INF
        d2 = np.where(nf, np.int64(0), d1)
        d2 = d2 * d2
        d2[nf] = _BIG
        x = np.arange(W, dtype=np.int64)
        dist = np.full((h, W), _BIG, dtype=np.int64)
        for b0 in range(0, W, block):
            blk = slice(b0, min(b0 + block, W))
            off = (x[None, :] - x[blk][:, None]) ** 2  # (B, W)
            cand = (d2[:, blk][:, :, None] + off[None, :, :]).min(axis=1)
            np.minimum(dist, cand, out=dist)
        if dist.min() >= _BIG:
            raise ValueError(
                "distance_transform_l2: no feature pixel in the raster "
                f"for metric {group['metric'].iloc[0]!r} at threshold"
            )
        tr = int(group["tile_row"].iloc[0])
        yy, xx = np.meshgrid(
            np.arange(h, dtype=np.int64), x, indexing="ij"
        )
        return pd.DataFrame(
            {
                "metric": group["metric"].iloc[0],
                "y": (yy + tr * h).ravel(),
                "x": xx.ravel(),
                "dist2": dist.ravel(),
            }
        )

    empty_b = pa.schema(
        [("metric", pa.string()), ("y", pa.int64()), ("x", pa.int64()),
         ("dist2", pa.int64())]
    )
    return bucketed_group_map(
        tiles_d1, ["metric", "tile_row"], pass_b,
        n_buckets=n_buckets, out_schema=empty_b,
    )


def _vertical_d1sy_tiles(result: rd.Dataset, thr_u: int, n_buckets: int) -> rd.Dataset:
    """Pass-A twin carrying the seed IDENTITY: per column the vertical
    distance to the nearest feature pixel AND the global row index of
    that seed (ties — equidistant above/below — resolve to the ABOVE
    seed, i.e. the smaller y, matching the (dist, y, x) lexicographic
    rule the allocation oracle orders by). ``sy = −1`` marks a
    feature-free column."""
    from gridfia_ray.stages.agg_util import bucketed_group_map

    def pass_a(group: pd.DataFrame) -> pd.DataFrame:
        group, h, w = _assemble_band(group, "v")
        band = np.vstack(
            [
                _u_of(r["pix"], r["dtype"], h, w) > thr_u
                for _, r in group.iterrows()
            ]
        )
        H = band.shape[0]
        idx = np.arange(H, dtype=np.int64)[:, None]
        above = np.maximum.accumulate(
            np.where(band, idx, np.int64(-1) - _INF), axis=0
        )
        d_above = idx - above
        rev = np.maximum.accumulate(
            np.where(band[::-1], idx, np.int64(-1) - _INF), axis=0
        )
        d_below = (idx - rev)[::-1]
        below = (np.int64(H - 1) - rev)[::-1]
        d1 = np.minimum(np.minimum(d_above, d_below), _INF)
        sy = np.where(d_above <= d_below, above, below)
        sy = np.where(d1 >= _INF, np.int64(-1), sy)
        out = []
        for i, (_, r) in enumerate(group.iterrows()):
            sl = slice(i * h, (i + 1) * h)
            out.append(
                {
                    "metric": r["metric"],
                    "tile_row": int(r["tile_row"]),
                    "tile_col": int(r["tile_col"]),
                    "h": h,
                    "w": w,
                    "d1": d1[sl].tobytes(),
                    "sy": sy[sl].tobytes(),
                }
            )
        return pd.DataFrame(out)

    empty_a = pa.schema(
        [("metric", pa.string()), ("tile_row", pa.int64()),
         ("tile_col", pa.int64()), ("h", pa.int64()), ("w", pa.int64()),
         ("d1", pa.binary()), ("sy", pa.binary())]
    )
    return bucketed_group_map(
        result, ["metric", "tile_col"], pass_a,
        n_buckets=n_buckets, out_schema=empty_a,
    )


def euclidean_allocation_tiles(
    result: rd.Dataset,
    threshold: float,
    n_buckets: int = 64,
    block: int = 64,
) -> rd.Dataset:
    """Euclidean ALLOCATION (the ArcGIS companion to the distance
    transform): per pixel the IDENTITY (seed_y, seed_x) of the nearest
    feature pixel plus its exact squared distance. Ties break
    lexicographically on (dist², seed_y, seed_x) — the deterministic
    rule ``ROW_NUMBER() OVER (ORDER BY d2, feat.y, feat.x)`` replays in
    SQL, so the whole raster hash-matches.

    Same banded shape as the L2 transform: the shared vertical pass
    additionally carries each column's seed row (min-y on up/down
    ties); the horizontal pass finds the exact minimum cost per pixel,
    then a second blocked sweep selects, among the cost-achieving
    columns, the minimum packed (seed_y · W + seed_x) — packed argmin ≡
    lexicographic argmin because both coordinates are < 2³¹ (guarded).
    """
    from gridfia_ray.stages.agg_util import bucketed_group_map

    thr_u = int(np.floor(threshold * 1_000_000 + 0.5))
    tiles = _vertical_d1sy_tiles(result, thr_u, n_buckets)

    def pass_b(group: pd.DataFrame) -> pd.DataFrame:
        group, h, w = _assemble_band(group, "h")
        d1 = np.hstack(
            [
                np.frombuffer(r["d1"], dtype=np.int64).reshape(h, w)
                for _, r in group.iterrows()
            ]
        )
        sy = np.hstack(
            [
                np.frombuffer(r["sy"], dtype=np.int64).reshape(h, w)
                for _, r in group.iterrows()
            ]
        )
        W = d1.shape[1]
        if W >= (1 << 31) or sy.max() >= (1 << 31):
            raise ValueError(
                "euclidean_allocation: raster side beyond 2^31 pixels "
                "overflows the packed (seed_y, seed_x) argmin key"
            )
        _BIG = np.int64(1) << 62
        nf = d1 >= _INF
        d2 = np.where(nf, np.int64(0), d1)
        d2 = d2 * d2
        d2[nf] = _BIG
        x = np.arange(W, dtype=np.int64)
        dist = np.full((h, W), _BIG, dtype=np.int64)
        for b0 in range(0, W, block):
            blk = slice(b0, min(b0 + block, W))
            off = (x[None, :] - x[blk][:, None]) ** 2  # (B, W)
            cand = (d2[:, blk][:, :, None] + off[None, :, :]).min(axis=1)
            np.minimum(dist, cand, out=dist)
        if dist.min() >= _BIG:
            raise ValueError(
                "euclidean_allocation: no feature pixel in the raster "
                f"for metric {group['metric'].iloc[0]!r} at threshold"
            )
        # sweep 2: among cost-achieving source columns take the minimum
        # packed seed id — exact lexicographic (seed_y, seed_x)
        comp = sy * np.int64(W) + x[None, :]  # (h, W) seed id per column
        comp = np.where(nf, _BIG, comp)
        best = np.full((h, W), _BIG, dtype=np.int64)
        for b0 in range(0, W, block):
            blk = slice(b0, min(b0 + block, W))
            off = (x[None, :] - x[blk][:, None]) ** 2
            cost = d2[:, blk][:, :, None] + off[None, :, :]  # (h, B, W)
            cid = np.where(
                cost == dist[:, None, :], comp[:, blk][:, :, None], _BIG
            )
            np.minimum(best, cid.min(axis=1), out=best)
        tr = int(group["tile_row"].iloc[0])
        yy, xx = np.meshgrid(
            np.arange(h, dtype=np.int64), x, indexing="ij"
        )
        return pd.DataFrame(
            {
                "metric": group["metric"].iloc[0],
                "y": (yy + tr * h).ravel(),
                "x": xx.ravel(),
                "seed_y": (best // W).ravel(),
                "seed_x": (best % W).ravel(),
                "dist2": dist.ravel(),
            }
        )

    empty_b = pa.schema(
        [("metric", pa.string()), ("y", pa.int64()), ("x", pa.int64()),
         ("seed_y", pa.int64()), ("seed_x", pa.int64()),
         ("dist2", pa.int64())]
    )
    return bucketed_group_map(
        tiles, ["metric", "tile_row"], pass_b,
        n_buckets=n_buckets, out_schema=empty_b,
    )
