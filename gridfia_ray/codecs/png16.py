"""Minimal 16-bit grayscale PNG codec (the lossy tile format).

Implements just enough of the public PNG spec (RFC 2083) for the engine's
image-payload path: one IHDR (bit depth 16, color type 0 grayscale), one
zlib IDAT, IEND. The encoder always writes scanline filter 0; the decoder
additionally un-applies filters 1 (Sub) and 2 (Up) so it can read any
conforming grayscale-16 stream that uses those.

Float tiles are quantized linearly into uint16 against a per-tile
``(vmin, vmax)`` carried in the tile caption; 16-bit quantization keeps
PSNR far above the 40 dB gate (BASELINE.json ``input_hint``).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png16(arr: np.ndarray) -> tuple[bytes, float, float]:
    """Quantize a float32 tile to 16-bit grayscale PNG.

    Returns (png_bytes, vmin, vmax) — the scale must travel with the tile
    (stored in caption JSON) for dequantization.
    """
    a = np.asarray(arr, dtype=np.float64)
    h, w = a.shape
    vmin = float(np.nanmin(a)) if a.size else 0.0
    vmax = float(np.nanmax(a)) if a.size else 0.0
    if vmax > vmin:
        q = np.rint((a - vmin) / (vmax - vmin) * 65535.0)
    else:
        q = np.zeros_like(a)
    q = np.clip(q, 0, 65535).astype(">u2")
    raw = np.zeros((h, 1 + w * 2), dtype=np.uint8)
    raw[:, 1:] = q.view(np.uint8).reshape(h, w * 2)  # filter byte 0 per row
    ihdr = struct.pack(">IIBBBBB", w, h, 16, 0, 0, 0, 0)
    png = (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw.tobytes(), 6))
        + _chunk(b"IEND", b"")
    )
    return png, vmin, vmax


def decode_png16(buf: bytes, vmin: float, vmax: float) -> np.ndarray:
    """Decode grayscale-16 PNG and dequantize back to float32."""
    if bytes(buf[:8]) != _SIG:
        raise ValueError("not a PNG stream")
    off, w = 8, None
    idat = []
    while off < len(buf):
        (ln,) = struct.unpack_from(">I", buf, off)
        tag = bytes(buf[off + 4 : off + 8])
        payload = buf[off + 8 : off + 8 + ln]
        off += 12 + ln
        if tag == b"IHDR":
            w, h, depth, ctype, _, _, interlace = struct.unpack(">IIBBBBB", payload)
            if depth != 16 or ctype != 0 or interlace != 0:
                raise ValueError("only non-interlaced grayscale-16 supported")
        elif tag == b"IDAT":
            idat.append(bytes(payload))
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("missing IHDR")
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    stride = 1 + w * 2
    raw = raw.reshape(h, stride)
    filters = raw[:, 0]
    rows = raw[:, 1:].copy()
    if np.any(filters):  # un-filter Sub (1) / Up (2); encoder itself emits 0
        for r in range(h):
            f = filters[r]
            if f == 0:
                continue
            if f == 1:
                for c in range(2, rows.shape[1]):
                    rows[r, c] = (int(rows[r, c]) + int(rows[r, c - 2])) & 0xFF
            elif f == 2:
                if r > 0:
                    rows[r] = (rows[r].astype(np.int32) + rows[r - 1]) & 0xFF
            else:
                raise ValueError(f"unsupported PNG filter {f}")
    q = rows.reshape(h, w, 2).copy().view(">u2").reshape(h, w).astype(np.float64)
    if vmax > vmin:
        a = q / 65535.0 * (vmax - vmin) + vmin
    else:
        a = np.full((h, w), vmin, dtype=np.float64)
    return a.astype(np.float32)


def psnr(ref: np.ndarray, got: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB (the input_hint quality gate)."""
    ref = np.asarray(ref, dtype=np.float64)
    got = np.asarray(got, dtype=np.float64)
    mse = float(np.mean((ref - got) ** 2))
    if mse == 0.0:
        return float("inf")
    peak = float(np.max(np.abs(ref))) or 1.0
    return 10.0 * np.log10(peak * peak / mse)
