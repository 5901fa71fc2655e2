"""Content hashes for tile payloads (dedup keys, SURVEY.md §2.7).

* ``content_hash64``  — vectorized 64-bit mix hash over the exact byte
  payload (xxhash-style multiply/shift avalanche over 8-byte lanes with
  position-dependent mixing; public construction). The *exact*-dup key
  next to ``image_id``. Deterministic, order-sensitive, numpy-vectorized
  so hashing 16 KB tiles costs microseconds, not a Python byte loop.
* ``average_phash64`` — 8×8 block-mean average hash of the decoded pixels
  (public aHash scheme): Hamming-near tiles bucket together, the
  *near*-dup key. Returned as signed int64 to match the ``phash`` column.
"""

from __future__ import annotations

import numpy as np

_P1 = np.uint64(0x9E3779B185EBCA87)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)


def _avalanche(x: np.ndarray | np.uint64) -> np.ndarray | np.uint64:
    x = x ^ (x >> np.uint64(33))
    x = x * _P2
    x = x ^ (x >> np.uint64(29))
    x = x * _P3
    return x ^ (x >> np.uint64(32))


def content_hash64(buf: bytes) -> int:
    """Signed-int64 content hash of a byte string (vectorized)."""
    a = np.frombuffer(buf, dtype=np.uint8)
    n = a.size
    pad = (-n) % 8
    if pad:
        a = np.concatenate([a, np.zeros(pad, dtype=np.uint8)])
    lanes = a.view("<u8")
    idx = np.arange(lanes.size, dtype=np.uint64)
    with np.errstate(over="ignore"):
        mixed = _avalanche((lanes ^ (idx * _P1)) * _P2)
        h = np.bitwise_xor.reduce(mixed) if mixed.size else np.uint64(0)
        h = _avalanche(h ^ (np.uint64(n) * _P1))
    v = int(h)
    return v - (1 << 64) if v >= 1 << 63 else v


def average_phash64(arr: np.ndarray) -> int:
    """8×8 average hash of a 2-D tile (any dtype), as signed int64."""
    a = np.asarray(arr, dtype=np.float64)
    h, w = a.shape
    th, tw = (h // 8) * 8, (w // 8) * 8
    if th == 0 or tw == 0:  # degenerate tiny tile: pad with zeros
        block = np.zeros((8, 8))
        block[: min(h, 8), : min(w, 8)] = a[: min(h, 8), : min(w, 8)]
    else:
        block = a[:th, :tw].reshape(8, th // 8, 8, tw // 8).mean(axis=(1, 3))
    bits = (block > block.mean()).ravel()
    v = int(np.packbits(bits).view(">u8")[0])
    return v - (1 << 64) if v >= 1 << 63 else v


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized Hamming distance between signed-int64 hash arrays."""
    x = np.asarray(a, dtype=np.int64).view(np.uint64) ^ np.asarray(b, dtype=np.int64).view(
        np.uint64
    )
    # SWAR popcount (public bit-twiddling identity)
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + ((x >> np.uint64(2)) & np.uint64(0x3333333333333333))
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    with np.errstate(over="ignore"):
        return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(np.int64)
