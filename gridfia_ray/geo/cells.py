"""Z-order (Morton) hierarchical cell index — the engine's shuffle key.

Role of H3/S2 in the design (SURVEY.md §2.4 J1, §4.3): every tile gets a
``cell_id: int64`` computed from its world position; that single key drives
species-stack assembly, the spatial hash join with polygon covers, dedup
partitioning and kNN neighbor rings. Neither the ``h3`` nor ``s2`` library
is available in this environment, so we use the textbook equivalent for a
regular grid: interleaved-bit Morton codes over (col, row) of a fixed cell
grid, which gives the same three properties the design needs:

  * hierarchical coarsening  — ``parent(cell, k) == cell >> 2k``;
  * locality                 — Z-order keeps near cells numerically near,
                               so range partitioning ~= spatial partitioning;
  * ring neighborhoods       — decode, offset, re-encode (vectorized).

All functions are vectorized numpy over int64; 31 bits per axis → grids up
to 2^31 × 2^31 cells (≫ 10^12 tiles).

For corpora keyed by geographic lat/lng (multi-projection stores, WGS84
points), ``geo/s2cells.py`` provides the spherical counterpart: an
S2-scheme quad-sphere cell id (cube face + quadratic correction +
Hilbert curve) with the same hierarchy/locality/ring properties.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

_B = np.uint64


def _part1by1(v: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of each value to even bit positions."""
    v = v.astype(np.uint64)
    v = (v | (v << _B(16))) & _B(0x0000FFFF0000FFFF)
    v = (v | (v << _B(8))) & _B(0x00FF00FF00FF00FF)
    v = (v | (v << _B(4))) & _B(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << _B(2))) & _B(0x3333333333333333)
    v = (v | (v << _B(1))) & _B(0x5555555555555555)
    return v


def _compact1by1(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.uint64) & _B(0x5555555555555555)
    v = (v | (v >> _B(1))) & _B(0x3333333333333333)
    v = (v | (v >> _B(2))) & _B(0x0F0F0F0F0F0F0F0F)
    v = (v | (v >> _B(4))) & _B(0x00FF00FF00FF00FF)
    v = (v | (v >> _B(8))) & _B(0x0000FFFF0000FFFF)
    v = (v | (v >> _B(16))) & _B(0x00000000FFFFFFFF)
    return v


def morton_encode(cx: np.ndarray, cy: np.ndarray) -> np.ndarray:
    """Interleave col/row indices into int64 Morton codes (col=even bits)."""
    code = _part1by1(np.asarray(cx)) | (_part1by1(np.asarray(cy)) << _B(1))
    return code.astype(np.int64)


def morton_decode(code: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    c = np.asarray(code).astype(np.uint64)
    return (
        _compact1by1(c).astype(np.int64),
        _compact1by1(c >> _B(1)).astype(np.int64),
    )


def parent(code: np.ndarray, levels: int = 1) -> np.ndarray:
    """Coarsen ``levels`` times (each level = 2×2 children per parent)."""
    return (np.asarray(code).astype(np.uint64) >> _B(2 * levels)).astype(np.int64)


@dataclass(frozen=True)
class CellGrid:
    """A fixed world-aligned cell grid (origin at top-left, north-up).

    ``cell_size`` is the cell edge in world units — chosen at ingest so one
    tile maps to exactly one base cell (SURVEY.md §7.2 step 3).
    """

    origin_x: float
    origin_y: float  # top edge (max y)
    cell_size: float

    def cell_xy(self, x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        cx = np.floor((np.asarray(x, dtype=np.float64) - self.origin_x) / self.cell_size)
        cy = np.floor((self.origin_y - np.asarray(y, dtype=np.float64)) / self.cell_size)
        return cx.astype(np.int64), cy.astype(np.int64)

    def cell_id(self, x: np.ndarray, y: np.ndarray) -> np.ndarray:
        """Cell id of world points. Points left/above the origin are clamped
        to the first row/col (callers filter out-of-domain data upstream)."""
        cx, cy = self.cell_xy(x, y)
        return morton_encode(np.maximum(cx, 0), np.maximum(cy, 0))

    def cell_id_rc(self, row: np.ndarray, col: np.ndarray) -> np.ndarray:
        """Cell id straight from grid (row, col) indices."""
        return morton_encode(np.asarray(col, dtype=np.int64), np.asarray(row, dtype=np.int64))

    def cover_bbox(self, minx: float, miny: float, maxx: float, maxy: float) -> np.ndarray:
        """All cell ids whose square intersects the bbox (the polygon-cover
        primitive for the spatial hash join, SURVEY.md §2.4 J1)."""
        c0 = int(np.floor((minx - self.origin_x) / self.cell_size))
        c1 = int(np.floor((maxx - self.origin_x) / self.cell_size))
        r0 = int(np.floor((self.origin_y - maxy) / self.cell_size))
        r1 = int(np.floor((self.origin_y - miny) / self.cell_size))
        # shrink a touching-only edge (bbox max lying exactly on a cell edge)
        if maxx == self.origin_x + c1 * self.cell_size and c1 > c0:
            c1 -= 1
        if miny == self.origin_y - r1 * self.cell_size and r1 > r0:
            r1 -= 1
        c0, r0 = max(c0, 0), max(r0, 0)
        cols, rows = np.meshgrid(np.arange(c0, c1 + 1), np.arange(r0, r1 + 1))
        return morton_encode(cols.ravel(), rows.ravel())

    def ring(self, code: int, radius: int) -> np.ndarray:
        """Cell ids of the square ring at Chebyshev distance ``radius``
        (radius 0 = the cell itself) — kNN candidate expansion."""
        cx, cy = morton_decode(np.asarray([code]))
        cx, cy = int(cx[0]), int(cy[0])
        if radius == 0:
            return np.asarray([code], dtype=np.int64)
        xs, ys = [], []
        for dx in range(-radius, radius + 1):
            for dy in (-radius, radius):
                xs.append(cx + dx)
                ys.append(cy + dy)
        for dy in range(-radius + 1, radius):
            for dx in (-radius, radius):
                xs.append(cx + dx)
                ys.append(cy + dy)
        xs = np.asarray(xs, dtype=np.int64)
        ys = np.asarray(ys, dtype=np.int64)
        keep = (xs >= 0) & (ys >= 0)
        return morton_encode(xs[keep], ys[keep])
