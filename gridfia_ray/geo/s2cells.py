"""S2-scheme spherical cell index — quad-sphere face + Hilbert curve,
pure vectorized numpy.

``geo/cells.py`` provides the engine's planar Morton cell key (tiles
live on a projected, world-aligned grid). For corpora keyed by
geographic lat/lng — multi-region stores spanning projections, or
points arriving in WGS84 (see ``geo/crs.py``) — this module provides
the spherical counterpart following the public S2 geometry scheme
(s2geometry.io: cube-face projection, quadratic s↔t correction,
Hilbert-curve ordering within a face):

  * ``s2_cell_id(lat, lng, level)`` — int64 cell key:
    ``face(3 bits) · 2^(2·level) + hilbert_position``;
  * hierarchy — ``s2_parent(cell, level, parent_level)`` is a pure
    bit shift (the Hilbert index is prefix-recursive);
  * locality — consecutive ids are adjacent cells (Hilbert property),
    so range-partitioning a sorted cell column ≈ spatial partitioning
    with no seams at face edges inside a face;
  * ``s2_cell_center(cell, level)`` — inverse mapping (cell center
    lat/lng), enabling approximate distance math on keys alone.

NOT bit-compatible with Google's s2geometry cell ids (which use a
particular generator-table orientation convention); the environment has
no ``s2`` library to cross-check against, so this implements the
published construction with the textbook Hilbert rotation rules and
pins semantics via round-trip/hierarchy/adjacency property tests
(tests/test_s2cells.py). All operations vectorize over numpy arrays —
usable directly inside ``map_batches`` to key 10^12 rows.
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 29  # 3 face bits + 2·29 position bits = 61 bits < int64


def _latlng_to_xyz(lat: np.ndarray, lng: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lng, dtype=np.float64))
    cp = np.cos(phi)
    return cp * np.cos(lam), cp * np.sin(lam), np.sin(phi)


def _xyz_to_face_uv(x, y, z) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Cube-face projection: face 0..5 = +x,+y,+z,-x,-y,-z (S2's face
    order), (u, v) ∈ [-1, 1] on the face plane."""
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(
        (ax >= ay) & (ax >= az), np.where(x >= 0, 0, 3),
        np.where(ay >= az, np.where(y >= 0, 1, 4), np.where(z >= 0, 2, 5)),
    ).astype(np.int64)
    u = np.empty_like(x)
    v = np.empty_like(x)
    for f, (den, uu, vv) in enumerate(
        [(x, y, z), (y, -x, z), (z, -x, -y), (-x, -z, -y), (-y, -z, x), (-z, y, x)]
    ):
        m = face == f
        u[m] = uu[m] / den[m]
        v[m] = vv[m] / den[m]
    return face, u, v


def _face_uv_to_xyz(face, u, v) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    x = np.empty_like(u)
    y = np.empty_like(u)
    z = np.empty_like(u)
    one = np.ones_like(u)
    for f, (fx, fy, fz) in enumerate(
        [
            (one, u, v),      # +x: u=y/x, v=z/x
            (-u, one, v),     # +y: u=-x/y, v=z/y
            (-u, -v, one),    # +z: u=-x/z, v=-y/z
            (-one, -v, -u),   # -x: u=-z/-x → x=-1, z=-u? see below
            (v, -one, -u),    # -y
            (v, u, -one),     # -z
        ]
    ):
        m = face == f
        x[m], y[m], z[m] = fx[m], fy[m], fz[m]
    n = np.sqrt(x * x + y * y + z * z)
    return x / n, y / n, z / n


def _uv_to_st(u: np.ndarray) -> np.ndarray:
    """S2's quadratic projection correction (published formula): makes
    cell areas near-uniform across a face."""
    return np.where(
        u >= 0, 0.5 * np.sqrt(1.0 + 3.0 * u), 1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u)
    )


def _st_to_uv(s: np.ndarray) -> np.ndarray:
    return np.where(
        s >= 0.5, (1.0 / 3.0) * (4.0 * s * s - 1.0), (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) ** 2)
    )


def _hilbert_xy_to_d(level: int, i: np.ndarray, j: np.ndarray) -> np.ndarray:
    """Vectorized Hilbert curve (x, y) → distance (textbook xy2d with
    the standard rotation rules), ``level`` iterations of O(n) numpy
    ops. NB the reflection constant is n-1 (grid size) here but s-1 in
    the inverse — that asymmetry is part of the published algorithm."""
    x = i.astype(np.int64).copy()
    y = j.astype(np.int64).copy()
    d = np.zeros_like(x)
    n = np.int64(1) << np.int64(level)
    s = n >> 1
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate quadrant (reflection about the FULL grid, n-1)
        swap = ry == 0
        flip = swap & (rx == 1)
        x[flip] = n - 1 - x[flip]
        y[flip] = n - 1 - y[flip]
        tmp = x[swap].copy()
        x[swap] = y[swap]
        y[swap] = tmp
        s >>= 1
    return d


def _hilbert_d_to_xy(level: int, d: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    t = d.astype(np.int64).copy()
    x = np.zeros_like(t)
    y = np.zeros_like(t)
    s = np.int64(1)
    top = np.int64(1) << np.int64(level)
    while s < top:
        rx = 1 & (t // 2)
        ry = 1 & (t ^ rx)
        # rotate
        swap = ry == 0
        flip = swap & (rx == 1)
        x[flip], y[flip] = s - 1 - x[flip], s - 1 - y[flip]
        xt = x[swap].copy()
        x[swap] = y[swap]
        y[swap] = xt
        x += s * rx
        y += s * ry
        t //= 4
        s <<= 1
    return x, y


def s2_cell_id(lat, lng, level: int = MAX_LEVEL) -> np.ndarray:
    """Spherical cell key: ``face << (2·level) | hilbert(i, j)``.
    Vectorized over arrays; scalar inputs return a 0-d-safe array."""
    if not 1 <= level <= MAX_LEVEL:
        raise ValueError(f"level must be in [1, {MAX_LEVEL}]")
    x, y, z = _latlng_to_xyz(np.atleast_1d(lat), np.atleast_1d(lng))
    face, u, v = _xyz_to_face_uv(x, y, z)
    n = np.int64(1) << np.int64(level)
    i = np.clip((_uv_to_st(u) * n).astype(np.int64), 0, n - 1)
    j = np.clip((_uv_to_st(v) * n).astype(np.int64), 0, n - 1)
    pos = _hilbert_xy_to_d(level, i, j)
    return (face << np.int64(2 * level)) | pos


def s2_parent(cell: np.ndarray, level: int, parent_level: int) -> np.ndarray:
    """Containing cell at a coarser level — a pure bit shift (the
    Hilbert index is prefix-recursive, so the high bits of a child's
    position ARE the parent's position)."""
    if parent_level > level:
        raise ValueError("parent_level must be <= level")
    return np.asarray(cell, dtype=np.int64) >> np.int64(2 * (level - parent_level))


def s2_cell_center(cell, level: int = MAX_LEVEL) -> tuple[np.ndarray, np.ndarray]:
    """(lat, lng) of the cell center — the inverse mapping."""
    c = np.atleast_1d(np.asarray(cell, dtype=np.int64))
    face = c >> np.int64(2 * level)
    pos = c & ((np.int64(1) << np.int64(2 * level)) - 1)
    i, j = _hilbert_d_to_xy(level, pos)
    n = float(1 << level)
    u = _st_to_uv((i.astype(np.float64) + 0.5) / n)
    v = _st_to_uv((j.astype(np.float64) + 0.5) / n)
    x, y, z = _face_uv_to_xyz(face, u, v)
    lat = np.degrees(np.arcsin(np.clip(z, -1.0, 1.0)))
    lng = np.degrees(np.arctan2(y, x))
    return lat, lng


def with_s2_cells(lat_col: str = "lat", lng_col: str = "lng", level: int = 16,
                  out_col: str = "s2_cell"):
    """Batch transform factory: adds an ``s2_cell`` int64 column — drop
    into ``Dataset.map_batches(..., batch_format="pyarrow")`` to key a
    lat/lng corpus for groupbys / range partitioning."""
    import pyarrow as pa

    def add(batch: pa.Table) -> pa.Table:
        cells = s2_cell_id(
            batch[lat_col].to_numpy(zero_copy_only=False),
            batch[lng_col].to_numpy(zero_copy_only=False),
            level,
        )
        return batch.append_column(out_col, pa.array(cells, pa.int64()))

    return add
