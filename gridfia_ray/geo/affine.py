"""Affine-transform helpers for the tile grid.

The reference stores a 6-element GDAL-style affine per store
(``gridfia/utils/zarr_utils.py:964-969``): ``[x0, px_w, 0, y0, 0, px_h]``
with ``px_h`` negative (north-up). Here every tile row is self-describing
(its caption carries its own transform), and these helpers convert between
pixel indices and world coordinates — all vectorized numpy.
"""

from __future__ import annotations

import numpy as np

Affine = tuple  # (x0, px_w, rot0, y0, rot1, px_h) — rot terms always 0 here


def tile_transform(base: Affine, tile_row: int, tile_col: int, th: int, tw: int) -> list:
    """Transform of tile (tile_row, tile_col) in a grid rooted at ``base``."""
    x0, pw, _, y0, _, ph = base
    return [x0 + tile_col * tw * pw, pw, 0.0, y0 + tile_row * th * ph, 0.0, ph]


def pixel_centers(transform: Affine, h: int, w: int):
    """World coordinates of all pixel centers of an (h, w) tile.

    Returns (cx, cy): two (h, w) float64 arrays. GDAL convention: the
    transform maps the *outer corner* of pixel (0, 0); the center of
    pixel (r, c) is at offset (c + 0.5, r + 0.5).
    """
    x0, pw, _, y0, _, ph = transform
    cx = x0 + (np.arange(w, dtype=np.float64) + 0.5) * pw
    cy = y0 + (np.arange(h, dtype=np.float64) + 0.5) * ph
    return np.broadcast_to(cx[None, :], (h, w)), np.broadcast_to(cy[:, None], (h, w))


def tile_bounds(transform: Affine, h: int, w: int) -> tuple[float, float, float, float]:
    """(minx, miny, maxx, maxy) of the tile extent (outer edges)."""
    x0, pw, _, y0, _, ph = transform
    xs = sorted((x0, x0 + w * pw))
    ys = sorted((y0, y0 + h * ph))
    return (xs[0], ys[0], xs[1], ys[1])
