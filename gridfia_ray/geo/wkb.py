"""Minimal WKB (well-known binary) polygon encode/decode.

The zone side table carries geometry as WKB (``geometry_wkb: binary``),
the portable interchange the reference gets for free from GeoPandas
(``gridfia/utils/boundaries.py:69-151`` caches GeoPackage layers). No GEOS
is available in this environment, so we implement the tiny subset of the
OGC WKB spec the engine needs: 2-D ``Polygon`` (type 3) and
``MultiPolygon`` (type 6), little- or big-endian.

A polygon is represented in Python as a list of rings, each ring a
float64 ndarray of shape (n, 2), first ring = exterior shell, rest =
holes. A multipolygon is a list of polygons. Rings are stored closed
(first point == last point), per the spec.
"""

from __future__ import annotations

import struct

import numpy as np

_WKB_POLYGON = 3
_WKB_MULTIPOLYGON = 6

Ring = np.ndarray  # (n, 2) float64, closed
Polygon = list  # list[Ring]
MultiPolygon = list  # list[Polygon]


def encode_polygon(rings: Polygon) -> bytes:
    """Encode one polygon (list of (n,2) rings) as little-endian WKB."""
    out = [struct.pack("<BI", 1, _WKB_POLYGON), struct.pack("<I", len(rings))]
    for ring in rings:
        ring = _close_ring(np.asarray(ring, dtype=np.float64))
        out.append(struct.pack("<I", ring.shape[0]))
        out.append(ring.astype("<f8").tobytes())
    return b"".join(out)


def encode_multipolygon(polys: MultiPolygon) -> bytes:
    out = [struct.pack("<BI", 1, _WKB_MULTIPOLYGON), struct.pack("<I", len(polys))]
    for rings in polys:
        out.append(encode_polygon(rings))
    return b"".join(out)


def decode(buf: bytes) -> MultiPolygon:
    """Decode WKB Polygon/MultiPolygon into a list of polygons.

    Always returns the multipolygon shape (``[[ring, ...], ...]``) so
    callers handle one case.
    """
    polys, _ = _decode_geom(memoryview(buf), 0)
    return polys


def _decode_geom(mv: memoryview, off: int):
    byte_order = mv[off]
    off += 1
    endian = "<" if byte_order == 1 else ">"
    (gtype,) = struct.unpack_from(endian + "I", mv, off)
    off += 4
    gtype &= 0xFF  # strip any SRID/dimension flags in the high bytes
    if gtype == _WKB_POLYGON:
        rings, off = _decode_rings(mv, off, endian)
        return [rings], off
    if gtype == _WKB_MULTIPOLYGON:
        (n,) = struct.unpack_from(endian + "I", mv, off)
        off += 4
        polys = []
        for _ in range(n):
            sub, off = _decode_geom(mv, off)
            polys.extend(sub)
        return polys, off
    raise ValueError(f"unsupported WKB geometry type {gtype}")


def _decode_rings(mv: memoryview, off: int, endian: str):
    (nrings,) = struct.unpack_from(endian + "I", mv, off)
    off += 4
    rings = []
    for _ in range(nrings):
        (npts,) = struct.unpack_from(endian + "I", mv, off)
        off += 4
        pts = np.frombuffer(mv, dtype=endian + "f8", count=npts * 2, offset=off)
        off += npts * 16
        rings.append(pts.reshape(npts, 2).copy())
    return rings, off


def _close_ring(ring: np.ndarray) -> np.ndarray:
    if ring.shape[0] < 3:
        raise ValueError("ring needs >= 3 points")
    if not np.array_equal(ring[0], ring[-1]):
        ring = np.vstack([ring, ring[0]])
    return ring


def bounds(polys: MultiPolygon) -> tuple[float, float, float, float]:
    """(minx, miny, maxx, maxy) over all rings of all polygons."""
    pts = np.vstack([r for rings in polys for r in rings])
    return (
        float(pts[:, 0].min()),
        float(pts[:, 1].min()),
        float(pts[:, 0].max()),
        float(pts[:, 1].max()),
    )


def box(minx: float, miny: float, maxx: float, maxy: float) -> Polygon:
    """Axis-aligned rectangle polygon (CCW shell)."""
    return [
        np.array(
            [
                [minx, miny],
                [maxx, miny],
                [maxx, maxy],
                [minx, maxy],
                [minx, miny],
            ],
            dtype=np.float64,
        )
    ]
