"""Pure-numpy BMP (Windows bitmap) codec — 8-bit grayscale, palette
format, uncompressed (BI_RGB).

A REAL standard image format the multimodal decode path can exercise
without external libraries (the jpeg/webp stubs stay stubs — those need
entropy coders). Like the png16 codec, BMP is a quantized lossy format
for f32 tiles: encode scales [vmin, vmax] → uint8 (PSNR ≈ 59 dB for
full-range signals, comfortably over the ≥40 dB gate), decode
dequantizes from the caption's ``scale_vmin``/``scale_vmax``.

Layout (public BMP spec): 14-byte BITMAPFILEHEADER ('BM', file size,
pixel-data offset) + 40-byte BITMAPINFOHEADER (size, w, h, planes=1,
bpp=8, BI_RGB) + 256×4 BGRA grayscale palette + rows bottom-up, each
padded to a 4-byte boundary.
"""

from __future__ import annotations

import struct

import numpy as np

_FILE_HDR = struct.Struct("<2sIHHI")
_INFO_HDR = struct.Struct("<IiiHHIIiiII")
_HDR_SIZE = 14 + 40 + 256 * 4


def encode_bmp8(arr: np.ndarray) -> tuple[bytes, float, float]:
    """f32 array → (bmp bytes, vmin, vmax). NaN encodes as vmin."""
    from gridfia_ray.codecs.raw import quantize_u8

    h, w = np.asarray(arr).shape
    q, vmin, vmax = quantize_u8(arr)

    stride = (w + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :w] = q
    pix = rows[::-1].tobytes()  # bottom-up row order

    gray = np.arange(256, dtype=np.uint8)
    palette = np.zeros((256, 4), dtype=np.uint8)
    palette[:, 0] = palette[:, 1] = palette[:, 2] = gray  # B, G, R
    head = _FILE_HDR.pack(b"BM", _HDR_SIZE + len(pix), 0, 0, _HDR_SIZE)
    info = _INFO_HDR.pack(40, w, h, 1, 8, 0, len(pix), 2835, 2835, 256, 0)
    return head + info + palette.tobytes() + pix, vmin, vmax


def decode_bmp8(buf: bytes, vmin: float, vmax: float) -> np.ndarray:
    """BMP bytes → f32 array dequantized to [vmin, vmax]."""
    if len(buf) < 14 + 40 or buf[:2] != b"BM":
        raise ValueError("not a BMP payload")
    _, _, _, _, offset = _FILE_HDR.unpack_from(buf, 0)
    (hdr_sz, w, h, planes, bpp, comp, _, _, _, clr_used, _) = _INFO_HDR.unpack_from(buf, 14)
    if hdr_sz < 40 or planes != 1 or bpp != 8 or comp != 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, compression={comp})")
    # the decoder treats the pixel index as the gray level, which is only
    # valid when the palette is the identity grayscale ramp (what
    # encode_bmp8 writes). An externally produced BMP with a real palette
    # must be rejected, not silently mis-decoded.
    n_pal = clr_used or 256
    pal = np.frombuffer(
        buf, dtype=np.uint8, count=n_pal * 4, offset=14 + hdr_sz
    ).reshape(n_pal, 4)
    ramp = np.arange(n_pal, dtype=np.uint8)
    if not ((pal[:, 0] == ramp).all() and (pal[:, 1] == ramp).all()
            and (pal[:, 2] == ramp).all()):
        raise ValueError(
            "unsupported BMP variant (non-identity-grayscale palette)"
        )
    bottom_up = h > 0
    h = abs(h)
    stride = (w + 3) & ~3
    rows = np.frombuffer(buf, dtype=np.uint8, count=h * stride, offset=offset).reshape(
        h, stride
    )
    q = rows[::-1, :w] if bottom_up else rows[:, :w]
    if vmax > vmin:
        return (q.astype(np.float32) / np.float32(255.0)) * np.float32(vmax - vmin) + np.float32(vmin)
    return np.full((h, w), np.float32(vmin), dtype=np.float32)
