"""Bounded-radius viewshed over the tiled raster — per pixel, how many
of a (small, broadcast) observer set have unobstructed line of sight to
it, the GIS `viewshed` / `observer points` operator (GDAL
`gdal_viewshed`, R3 line-of-sight sampling per Franklin & Ray 1994).

The reference's analytics are strictly per-pixel map algebra
(``gridfia/core/processors/forest_metrics.py``); viewshed is the
standard terrain-analysis extension of that kernel family and the
hardest focal shape the halo protocol carries: a radius-R NEIGHBORHOOD
kernel whose per-target cost is itself O(R) (the sight line), not O(1).

Scale shape: ONE keyed exchange, identical to the focal family —
``_halo_explode(radius=R)`` ships each tile plus width-R strips to its
8 neighbors (one-hop ⇒ R ≤ tile dims), then every tile assembles its
padded (h+2R, w+2R) window independently. Any observer whose cell lies
in the padded window can see core pixels, and every cell on a sight
line between an observer and a core target lies inside the window
(coordinates along the segment are bounded by its endpoints), so the
tile-local computation is EXACT, not approximate. The observer list is
the tiny side — a plain broadcast; cost per tile is
O(observers_nearby · R³) vectorized per Chebyshev ring.

Determinism: all LOS geometry is computed in OFFSET space (sample
position relative to the observer) so the float bits are independent
of absolute pixel coordinates — the pinned sequential replay
(oracle_pins.ensure_viewpin) runs the SAME :func:`los_visible` kernel
on the full raster and must agree bit-for-bit on every visibility
boolean; what the pin verifies is the exchange (strip routing, padding,
observer-to-tile assignment), which is re-implemented nowhere else.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from gridfia_ray.pipelines.focal import _halo_explode, strips_to_padded


def _ring_offsets(n: int) -> np.ndarray:
    """(m, 2) int offsets at Chebyshev distance exactly n."""
    side = np.arange(-n, n + 1)
    top = np.stack([np.full(2 * n + 1, -n), side], axis=1)
    bot = np.stack([np.full(2 * n + 1, n), side], axis=1)
    mid = np.arange(-n + 1, n)
    lef = np.stack([mid, np.full(2 * n - 1, -n)], axis=1)
    rig = np.stack([mid, np.full(2 * n - 1, n)], axis=1)
    return np.concatenate([top, bot, lef, rig]).astype(np.int64)


def los_visible(
    E: np.ndarray, oy: int, ox: int, radius: int, eye_add: float
) -> np.ndarray:
    """Boolean visibility mask of one observer over elevation ``E``
    (float64): True where the cell center is within EUCLIDEAN distance
    ``radius`` of the observer cell (exact integer d² ≤ R² test) and no
    bilinear-interpolated sample along the sight line subtends a slope
    ≥ the target's. The observer's own cell is visible. R3 sampling:
    one sample per Chebyshev step, vectorized per ring; every float op
    uses observer-relative offsets so bits don't depend on (oy, ox)."""
    H, W = E.shape
    R = int(radius)
    z_eye = float(E[oy, ox]) + float(eye_add)
    vis = np.zeros((H, W), dtype=bool)
    vis[oy, ox] = True
    r2 = R * R
    for n in range(1, R + 1):
        offs = _ring_offsets(n)
        d2 = offs[:, 0] * offs[:, 0] + offs[:, 1] * offs[:, 1]
        ty = oy + offs[:, 0]
        tx = ox + offs[:, 1]
        ok = (d2 <= r2) & (ty >= 0) & (ty < H) & (tx >= 0) & (tx < W)
        if not ok.any():
            continue
        offs, ty, tx, d2 = offs[ok], ty[ok], tx[ok], d2[ok]
        d = np.sqrt(d2.astype(np.float64))
        slope_t = (E[ty, tx] - z_eye) / d
        if n == 1:
            vis[ty, tx] = True  # adjacent cells: no intermediate sample
            continue
        frac = np.arange(1, n, dtype=np.float64) / np.float64(n)  # (n-1,)
        py = offs[:, 0:1].astype(np.float64) * frac[None, :]  # (m, n-1)
        px = offs[:, 1:2].astype(np.float64) * frac[None, :]
        iy = np.floor(py)
        ix = np.floor(px)
        ry = py - iy
        rx = px - ix
        ay = oy + iy.astype(np.int64)
        ax = ox + ix.astype(np.int64)
        # the +1 support row/col only carries weight when ry/rx > 0, in
        # which case it's provably interior; clamp so the zero-weight
        # gather at an exact-integer sample on the last row/col stays
        # in bounds (the 0-weight makes the clamped value irrelevant)
        ay1 = np.minimum(ay + 1, H - 1)
        ax1 = np.minimum(ax + 1, W - 1)
        z = (
            E[ay, ax] * (1.0 - ry) * (1.0 - rx)
            + E[ay, ax1] * (1.0 - ry) * rx
            + E[ay1, ax] * ry * (1.0 - rx)
            + E[ay1, ax1] * ry * rx
        )
        ds = d[:, None] * frac[None, :]
        blocked = ((z - z_eye) / ds >= slope_t[:, None]).any(axis=1)
        vis[ty, tx] = ~blocked
    return vis


def viewshed_tiles(
    result: rd.Dataset,
    observers: np.ndarray,
    radius: int,
    eye_add_u: float,
    n_buckets: int = 64,
) -> rd.Dataset:
    """Per-pixel observer-visibility count over a result-tile dataset
    (``run_metrics`` schema) → long rows ``(metric, y, x, n_vis)``.

    ``observers`` is an (m, 2) int array of GLOBAL (y, x) pixel cells —
    the small broadcast side; ``eye_add_u`` is the observer eye height
    in the µ-scaled elevation domain. ``radius`` must be ≤ the tile
    dims (one-hop halo protocol; ``_halo_explode`` raises otherwise)."""
    obs = np.asarray(observers, dtype=np.int64).reshape(-1, 2)
    R = int(radius)
    empty = pd.DataFrame(
        {
            "metric": pd.Series(dtype=str),
            "y": pd.Series(dtype=np.int64),
            "x": pd.Series(dtype=np.int64),
            "n_vis": pd.Series(dtype=np.int64),
        }
    )

    def assemble(group: pd.DataFrame) -> pd.DataFrame:
        padded = strips_to_padded(group, "viewshed", radius=R)
        if padded is None:
            return empty
        vals, pres, h, w = padded
        tr = int(group["tile_row"].iloc[0])
        tc = int(group["tile_col"].iloc[0])
        y0 = tr * h - R  # global coords of padded[0, 0]
        x0 = tc * w - R
        E = vals.astype(np.float64)
        count = np.zeros((h, w), dtype=np.int64)
        ly = obs[:, 0] - y0
        lx = obs[:, 1] - x0
        inwin = (
            (ly >= 0) & (ly < h + 2 * R) & (lx >= 0) & (lx < w + 2 * R)
        )
        for j in np.nonzero(inwin)[0]:
            oy, ox = int(ly[j]), int(lx[j])
            if pres[oy, ox] == 0:
                continue  # beyond the global raster edge
            vis = los_visible(E, oy, ox, R, eye_add_u)
            count += vis[R : R + h, R : R + w]
        yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        return pd.DataFrame(
            {
                "metric": group["metric"].iloc[0],
                "y": (yy + tr * h).ravel().astype(np.int64),
                "x": (xx + tc * w).ravel().astype(np.int64),
                "n_vis": count.ravel(),
            }
        )

    from gridfia_ray.stages.agg_util import bucketed_group_map

    out_schema = pa.schema(
        [
            ("metric", pa.string()),
            ("y", pa.int64()),
            ("x", pa.int64()),
            ("n_vis", pa.int64()),
        ]
    )
    return bucketed_group_map(
        _halo_explode(result, "viewshed", radius=R),
        ["metric", "tile_row", "tile_col"],
        assemble,
        n_buckets=n_buckets,
        out_schema=out_schema,
    )
