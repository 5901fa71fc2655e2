"""Raw float32 tile codecs (bit-exact path).

``raw-f32``  — little-endian float32, row-major, h*w*4 bytes.
``zlib-f32`` — the same stream zlib-compressed (lossless; stands in for
the reference's blosc-lz4/zstd chunk compression,
``gridfia/utils/zarr_utils.py:935-938``).
"""

from __future__ import annotations

import zlib

import numpy as np


def encode_raw_f32(arr: np.ndarray) -> bytes:
    return np.ascontiguousarray(arr, dtype="<f4").tobytes()


def decode_raw_f32(buf: bytes, h: int, w: int) -> np.ndarray:
    arr = np.frombuffer(buf, dtype="<f4", count=h * w)
    return arr.reshape(h, w)


def encode_zlib_f32(arr: np.ndarray, level: int = 5) -> bytes:
    return zlib.compress(encode_raw_f32(arr), level)


def decode_zlib_f32(buf: bytes, h: int, w: int) -> np.ndarray:
    return decode_raw_f32(zlib.decompress(buf), h, w)


def quantize_u8(arr: np.ndarray) -> tuple[np.ndarray, float, float]:
    """The engine's shared 8-bit caption-scale quantization (bmp8/webp
    rule): linear [vmin, vmax] -> 0..255 with +0.5 rounding, NaN/Inf
    encodes as vmin. Returns (uint8 array, vmin, vmax)."""
    a = np.asarray(arr, dtype=np.float64)
    finite = a[np.isfinite(a)]
    vmin = float(finite.min()) if finite.size else 0.0
    vmax = float(finite.max()) if finite.size else 0.0
    if vmax > vmin:
        q = np.clip((a - vmin) / (vmax - vmin) * 255.0 + 0.5, 0, 255)
    else:
        q = np.zeros_like(a)
    return np.nan_to_num(q, nan=0.0).astype(np.uint8), vmin, vmax
