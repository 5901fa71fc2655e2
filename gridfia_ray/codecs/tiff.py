"""Minimal pure-numpy (Geo)TIFF codec — no GDAL/rasterio in this
environment, but TIFF is the reference's native tile format
(``gridfia/external/fia_client.py:525-536`` downloads F32 GeoTIFF;
``gridfia/core/processors/forest_metrics.py:547-567`` writes results
with rasterio: driver GTiff, count 1, crs ESRI:102039, affine
transform). This module makes the codec registry honest about that
format with a spec-subset implementation:

* ``encode_tiff_f32``  — single-band little-endian TIFF, one strip,
  uncompressed, SampleFormat=IEEE-float, with the GeoTIFF tags rasterio
  writes for a north-up raster: ModelPixelScaleTag (33550),
  ModelTiepointTag (33922), GeoKeyDirectoryTag (34735) (+ GeoAsciiParams
  for non-EPSG CRS strings like ESRI:102039).
* ``decode_tiff``      — baseline TIFF 6.0 reader subset: II/MM byte
  order, single IFD, uncompressed strips (any strip layout), 1 sample
  per pixel, u8/u16/i16/u32/i32/f32/f64 samples. Returns the array and
  a meta dict with (transform, crs) when GeoTIFF tags are present.

Public spec: Adobe TIFF 6.0 + OGC GeoTIFF 1.1. Everything here is
byte-level struct packing over numpy buffers; no external codecs.
"""

from __future__ import annotations

import struct

import numpy as np

# TIFF tag ids (TIFF 6.0 baseline + GeoTIFF)
T_WIDTH = 256
T_LENGTH = 257
T_BITS = 258
T_COMPRESSION = 259
T_PHOTOMETRIC = 262
T_STRIP_OFFSETS = 273
T_SAMPLES_PER_PX = 277
T_ROWS_PER_STRIP = 278
T_STRIP_BYTES = 279
T_SAMPLE_FORMAT = 339
T_MODEL_PIXEL_SCALE = 33550
T_MODEL_TIEPOINT = 33922
T_GEO_KEYS = 34735
T_GEO_ASCII_PARAMS = 34737

TYPE_SHORT = 3
TYPE_LONG = 4
TYPE_DOUBLE = 12
TYPE_ASCII = 2

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8, 11: 4, 12: 8}


def build_ifd(
    h: int,
    w: int,
    ifd_off: int,
    strip_off: int = 8,
    transform: list | tuple | None = None,
    crs: str = "",
) -> bytes:
    """IFD + out-of-line tag data for a single uncompressed f32 strip at
    ``strip_off``, to be placed at ``ifd_off``. Built without touching
    pixel data so streaming writers (memmapped strip, footer appended)
    never allocate the raster."""
    # (tag, type, count, inline-payload-or-None, extra-blob-index-or-None)
    entries: list[tuple[int, int, int, bytes | None, int | None]] = []
    extra: list[bytes] = []  # out-of-line data blobs appended after the IFD

    def val4(fmt: str, *vals) -> bytes:
        return struct.pack("<" + fmt, *vals).ljust(4, b"\0")

    def add_inline(tag: int, typ: int, count: int, packed: bytes) -> None:
        entries.append((tag, typ, count, packed, None))

    def add_outline(tag: int, typ: int, count: int, blob: bytes) -> None:
        entries.append((tag, typ, count, None, len(extra)))
        extra.append(blob)

    add_inline(T_WIDTH, TYPE_LONG, 1, val4("I", w))
    add_inline(T_LENGTH, TYPE_LONG, 1, val4("I", h))
    add_inline(T_BITS, TYPE_SHORT, 1, val4("H", 32))
    add_inline(T_COMPRESSION, TYPE_SHORT, 1, val4("H", 1))
    add_inline(T_PHOTOMETRIC, TYPE_SHORT, 1, val4("H", 1))
    add_inline(T_STRIP_OFFSETS, TYPE_LONG, 1, val4("I", strip_off))
    add_inline(T_SAMPLES_PER_PX, TYPE_SHORT, 1, val4("H", 1))
    add_inline(T_ROWS_PER_STRIP, TYPE_LONG, 1, val4("I", h))
    add_inline(T_STRIP_BYTES, TYPE_LONG, 1, val4("I", h * w * 4))
    add_inline(T_SAMPLE_FORMAT, TYPE_SHORT, 1, val4("H", 3))

    if transform is not None:
        x0, px, _, y0, _, nyp = transform
        add_outline(
            T_MODEL_PIXEL_SCALE, TYPE_DOUBLE, 3, struct.pack("<3d", px, abs(nyp), 0.0)
        )
        add_outline(
            T_MODEL_TIEPOINT, TYPE_DOUBLE, 6,
            struct.pack("<6d", 0.0, 0.0, 0.0, x0, y0, 0.0),
        )
    if crs:
        # GeoKeyDirectory: version 1.1.0; keys sorted by id
        epsg = 0
        if crs.upper().startswith("EPSG:"):
            try:
                epsg = int(crs.split(":")[1])
            except ValueError:
                epsg = 0
        ascii_params = (crs + "|").encode("ascii", "replace")
        keys = [
            (1024, 0, 1, 1),  # GTModelTypeGeoKey = projected
            (1025, 0, 1, 1),  # GTRasterTypeGeoKey = PixelIsArea
            (1026, T_GEO_ASCII_PARAMS, len(ascii_params), 0),  # citation
            (3072, 0, 1, epsg if epsg else 32767),  # ProjectedCSTypeGeoKey
        ]
        head = (1, 1, 0, len(keys))
        gk = struct.pack(f"<{4 + 4 * len(keys)}H", *head, *[v for k in keys for v in k])
        add_outline(T_GEO_KEYS, TYPE_SHORT, 4 + 4 * len(keys), gk)
        add_outline(T_GEO_ASCII_PARAMS, TYPE_ASCII, len(ascii_params), ascii_params)

    entries.sort(key=lambda e: e[0])
    ifd_size = 2 + 12 * len(entries) + 4
    # resolve out-of-line offsets
    pos = ifd_off + ifd_size
    offsets = []
    for blob in extra:
        offsets.append(pos)
        pos += len(blob) + (len(blob) % 2)

    ifd = [struct.pack("<H", len(entries))]
    for tag, typ, count, payload, extra_idx in entries:
        if extra_idx is not None:
            payload = struct.pack("<I", offsets[extra_idx])
        ifd.append(struct.pack("<HHI", tag, typ, count) + payload)
    ifd.append(struct.pack("<I", 0))  # no next IFD
    for blob in extra:
        ifd.append(blob + (b"\0" if len(blob) % 2 else b""))
    return b"".join(ifd)


def encode_tiff_f32(
    arr: np.ndarray,
    transform: list | tuple | None = None,
    crs: str = "",
) -> bytes:
    """float32 2-D array → single-strip uncompressed little-endian
    GeoTIFF bytes. ``transform`` is the 6-element affine
    (x0, px, 0, y0, 0, -py) used throughout the engine's captions."""
    a = np.ascontiguousarray(np.asarray(arr, dtype="<f4"))
    if a.ndim != 2:
        raise ValueError("encode_tiff_f32 expects a 2-D array")
    h, w = a.shape
    data = a.tobytes()
    ifd_off = 8 + len(data)
    footer = build_ifd(h, w, ifd_off, strip_off=8, transform=transform, crs=crs)
    return struct.pack("<2sHI", b"II", 42, ifd_off) + data + footer


def _read_values(buf: bytes, bo: str, typ: int, count: int, payload: bytes):
    size = _TYPE_SIZE.get(typ)
    if size is None:
        return None
    total = size * count
    if total <= 4:
        raw = payload[:total]
    else:
        (off,) = struct.unpack(bo + "I", payload)
        raw = buf[off : off + total]
    if typ == TYPE_ASCII:
        return raw.rstrip(b"\0").decode("ascii", "replace")
    fmt = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i", 11: "f", 12: "d"}.get(typ)
    if fmt is None:
        return None
    return list(struct.unpack(f"{bo}{count}{fmt}", raw))


def decode_tiff(buf: bytes) -> tuple[np.ndarray, dict]:
    """Parse a baseline single-band TIFF (uncompressed strips) →
    (2-D array, meta with optional 'transform' [x0,px,0,y0,0,-py] and
    'crs')."""
    if buf[:2] == b"II":
        bo = "<"
    elif buf[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF: bad byte-order mark")
    magic, ifd_off = struct.unpack(bo + "HI", buf[2:8])
    if magic != 42:
        raise ValueError("not a TIFF: bad magic")
    (n_entries,) = struct.unpack(bo + "H", buf[ifd_off : ifd_off + 2])
    tags: dict[int, list] = {}
    for i in range(n_entries):
        e = ifd_off + 2 + 12 * i
        tag, typ, count = struct.unpack(bo + "HHI", buf[e : e + 8])
        vals = _read_values(buf, bo, typ, count, buf[e + 8 : e + 12])
        if vals is not None:
            tags[tag] = vals

    w = int(tags[T_WIDTH][0])
    h = int(tags[T_LENGTH][0])
    comp = int(tags.get(T_COMPRESSION, [1])[0])
    if comp != 1:
        raise ValueError(f"unsupported TIFF compression {comp} (only uncompressed)")
    spp = int(tags.get(T_SAMPLES_PER_PX, [1])[0])
    if spp != 1:
        raise ValueError(f"unsupported SamplesPerPixel {spp} (single-band only)")
    bits = int(tags.get(T_BITS, [1])[0])
    fmt = int(tags.get(T_SAMPLE_FORMAT, [1])[0])
    dtype = {
        (1, 8): "u1", (1, 16): "u2", (1, 32): "u4",
        (2, 8): "i1", (2, 16): "i2", (2, 32): "i4",
        (3, 32): "f4", (3, 64): "f8",
    }.get((fmt, bits))
    if dtype is None:
        raise ValueError(f"unsupported sample format/bits: {fmt}/{bits}")
    dt = np.dtype(bo + dtype)

    offs = tags[T_STRIP_OFFSETS]
    byts = tags.get(T_STRIP_BYTES)
    if byts is None:  # single full strip fallback
        byts = [h * w * dt.itemsize]
    raw = b"".join(bytes(buf[int(o) : int(o) + int(b)]) for o, b in zip(offs, byts))
    arr = np.frombuffer(raw, dtype=dt, count=h * w).reshape(h, w)

    meta: dict = {}
    if T_MODEL_PIXEL_SCALE in tags and T_MODEL_TIEPOINT in tags:
        sx, sy = tags[T_MODEL_PIXEL_SCALE][0], tags[T_MODEL_PIXEL_SCALE][1]
        tp = tags[T_MODEL_TIEPOINT]
        # tiepoint: raster (i,j,k) -> model (x,y,z); assume north-up
        x0 = tp[3] - tp[0] * sx
        y0 = tp[4] + tp[1] * sy
        meta["transform"] = [x0, sx, 0.0, y0, 0.0, -sy]
    if T_GEO_ASCII_PARAMS in tags:
        meta["crs"] = str(tags[T_GEO_ASCII_PARAMS]).split("|")[0]
    elif T_GEO_KEYS in tags:
        gk = tags[T_GEO_KEYS]
        for i in range(4, len(gk), 4):
            if gk[i] == 3072 and gk[i + 1] == 0 and gk[i + 3] != 32767:
                meta["crs"] = f"EPSG:{gk[i + 3]}"
    return arr, meta


def decode_tiff_f32(buf: bytes, h: int, w: int, meta: dict | None = None) -> np.ndarray:
    """Registry adapter: decode and validate shape, return float32."""
    arr, _ = decode_tiff(buf)
    if arr.shape != (h, w):
        raise ValueError(f"TIFF shape {arr.shape} != expected {(h, w)}")
    return np.asarray(arr, dtype=np.float32)
