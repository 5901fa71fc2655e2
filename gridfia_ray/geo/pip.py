"""Vectorized point-in-polygon (ray casting) with prepared geometries.

The reference's only true spatial predicate is GeoPandas/GEOS
``sjoin(..., predicate='intersects')`` (``gridfia/utils/
parallel_processing.py:69-108``). GEOS is unavailable here, so the refine
step of the spatial hash join is the classic even–odd crossing-number test
(public algorithm; cf. Franklin's PNPOLY), vectorized with numpy over
(points × edges) and wrapped in a *prepared* form — edge arrays + bbox
built once per polygon — mirroring Shapely ``prepared`` usage (the T3
stateful pattern, SURVEY.md §2.3): built in an actor's ``__init__``,
reused per batch.

Even–odd handles holes and concave rings for free as long as all rings
are passed. Points exactly on an edge are boundary-undefined (same as any
crossing-number implementation); fixture polygons are placed off the pixel
center lattice so the tests never probe that set.
"""

from __future__ import annotations

import numpy as np

from gridfia_ray.geo import wkb

# max points×edges elements evaluated per broadcast chunk (memory guard)
_CHUNK_ELEMS = 4_000_000


class PreparedPolygon:
    """A (multi)polygon compiled to flat edge arrays for batch PIP tests."""

    __slots__ = ("x1", "y1", "x2", "y2", "bbox")

    def __init__(self, polys: wkb.MultiPolygon):
        e_x1, e_y1, e_x2, e_y2 = [], [], [], []
        for rings in polys:
            for ring in rings:
                r = np.asarray(ring, dtype=np.float64)
                e_x1.append(r[:-1, 0])
                e_y1.append(r[:-1, 1])
                e_x2.append(r[1:, 0])
                e_y2.append(r[1:, 1])
        self.x1 = np.concatenate(e_x1)
        self.y1 = np.concatenate(e_y1)
        self.x2 = np.concatenate(e_x2)
        self.y2 = np.concatenate(e_y2)
        self.bbox = wkb.bounds(polys)

    @classmethod
    def from_wkb(cls, buf: bytes) -> "PreparedPolygon":
        return cls(wkb.decode(buf))

    def bbox_intersects(self, minx: float, miny: float, maxx: float, maxy: float) -> bool:
        bx0, by0, bx1, by1 = self.bbox
        return minx < bx1 and maxx > bx0 and miny < by1 and maxy > by0

    def crosses_boxes(
        self, bx0: np.ndarray, by0: np.ndarray, bx1: np.ndarray, by1: np.ndarray
    ) -> np.ndarray:
        """Per box: does ANY polygon edge intersect the box? (vectorized
        over boxes, loop over the few edges). Used to classify grid cells
        as boundary (edge crosses) vs uniform (fully inside/outside, one
        center test decides) — the O(perimeter) zonal optimization."""
        bx0 = np.asarray(bx0, dtype=np.float64)
        by0 = np.asarray(by0, dtype=np.float64)
        bx1 = np.asarray(bx1, dtype=np.float64)
        by1 = np.asarray(by1, dtype=np.float64)
        out = np.zeros(bx0.shape, dtype=bool)
        for x1, y1, x2, y2 in zip(self.x1, self.y1, self.x2, self.y2):
            # bbox reject
            ex0, ex1 = (x1, x2) if x1 <= x2 else (x2, x1)
            ey0, ey1 = (y1, y2) if y1 <= y2 else (y2, y1)
            cand = (bx0 <= ex1) & (bx1 >= ex0) & (by0 <= ey1) & (by1 >= ey0)
            if not cand.any():
                continue
            # corners straddle the segment's line?
            dx, dy = x2 - x1, y2 - y1
            s00 = dx * (by0 - y1) - dy * (bx0 - x1)
            s01 = dx * (by1 - y1) - dy * (bx0 - x1)
            s10 = dx * (by0 - y1) - dy * (bx1 - x1)
            s11 = dx * (by1 - y1) - dy * (bx1 - x1)
            straddles = ~(
                ((s00 > 0) & (s01 > 0) & (s10 > 0) & (s11 > 0))
                | ((s00 < 0) & (s01 < 0) & (s10 < 0) & (s11 < 0))
            )
            out |= cand & straddles
            if out.all():
                break
        return out

    def contains(self, px: np.ndarray, py: np.ndarray) -> np.ndarray:
        """Even–odd containment for point arrays of any (equal) shape."""
        px = np.asarray(px, dtype=np.float64).ravel()
        py = np.asarray(py, dtype=np.float64).ravel()
        n, e = px.size, self.x1.size
        out = np.zeros(n, dtype=bool)
        # cheap bbox reject first
        bx0, by0, bx1, by1 = self.bbox
        cand = (px >= bx0) & (px <= bx1) & (py >= by0) & (py <= by1)
        idx = np.nonzero(cand)[0]
        if idx.size == 0:
            return out
        step = max(1, _CHUNK_ELEMS // max(e, 1))
        for s in range(0, idx.size, step):
            sl = idx[s : s + step]
            qx = px[sl][:, None]
            qy = py[sl][:, None]
            y1, y2 = self.y1[None, :], self.y2[None, :]
            x1, x2 = self.x1[None, :], self.x2[None, :]
            straddle = (y1 > qy) != (y2 > qy)
            with np.errstate(divide="ignore", invalid="ignore"):
                xint = x1 + (qy - y1) * (x2 - x1) / (y2 - y1)
            crossings = np.sum(straddle & (qx < xint), axis=1)
            out[sl] = (crossings % 2) == 1
        return out
