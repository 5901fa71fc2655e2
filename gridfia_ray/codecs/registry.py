"""Format dispatch for tile payloads (the ``fmt`` column).

Mirrors the reference's decode boundary (rasterio ``MemoryFile`` in
``gridfia/external/fia_client.py:560-562``) as plain functions used by the
``DecoderActor`` stage. ``meta`` is the parsed caption dict — lossy formats
read their dequantization scale from it and write it on encode.
"""

from __future__ import annotations

import numpy as np

from gridfia_ray.codecs import png16, raw

FORMATS = ("raw-f32", "zlib-f32", "png", "tiff", "bmp", "jpeg", "webp")


def decode_tile(buf: bytes, fmt: str, h: int, w: int, meta: dict | None = None) -> np.ndarray:
    if fmt == "raw-f32":
        return raw.decode_raw_f32(buf, h, w)
    if fmt == "zlib-f32":
        return raw.decode_zlib_f32(buf, h, w)
    if fmt == "png":
        meta = meta or {}
        return png16.decode_png16(buf, meta.get("scale_vmin", 0.0), meta.get("scale_vmax", 0.0))
    if fmt == "tiff":
        from gridfia_ray.codecs import tiff

        return tiff.decode_tiff_f32(buf, h, w, meta)
    if fmt == "bmp":
        from gridfia_ray.codecs import bmp

        meta = meta or {}
        return bmp.decode_bmp8(buf, meta.get("scale_vmin", 0.0), meta.get("scale_vmax", 0.0))
    if fmt == "jpeg":
        from gridfia_ray.codecs import jpeg

        meta = meta or {}
        return jpeg.decode_jpeg_gray(
            buf, meta.get("scale_vmin", 0.0), meta.get("scale_vmax", 0.0)
        )
    if fmt == "webp":
        from gridfia_ray.codecs import webp

        meta = meta or {}
        return webp.decode_webp_tile(
            buf, meta.get("scale_vmin", 0.0), meta.get("scale_vmax", 0.0)
        )
    raise ValueError(f"unknown tile format {fmt!r}")


def encode_tile(arr: np.ndarray, fmt: str) -> tuple[bytes, dict]:
    """Returns (payload, caption_meta_updates)."""
    if fmt == "raw-f32":
        return raw.encode_raw_f32(arr), {}
    if fmt == "zlib-f32":
        return raw.encode_zlib_f32(arr), {}
    if fmt == "png":
        buf, vmin, vmax = png16.encode_png16(arr)
        return buf, {"scale_vmin": vmin, "scale_vmax": vmax}
    if fmt == "tiff":
        from gridfia_ray.codecs import tiff

        return tiff.encode_tiff_f32(arr), {}
    if fmt == "bmp":
        from gridfia_ray.codecs import bmp

        buf, vmin, vmax = bmp.encode_bmp8(arr)
        return buf, {"scale_vmin": vmin, "scale_vmax": vmax}
    if fmt == "jpeg":
        from gridfia_ray.codecs import jpeg

        buf, vmin, vmax = jpeg.encode_jpeg_gray(arr)
        return buf, {"scale_vmin": vmin, "scale_vmax": vmax}
    if fmt == "webp":
        from gridfia_ray.codecs import webp

        buf, vmin, vmax = webp.encode_webp_tile(arr)
        return buf, {"scale_vmin": vmin, "scale_vmax": vmax}
    raise ValueError(f"unknown tile format {fmt!r}")
