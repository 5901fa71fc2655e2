"""Content-defined chunking (CDC) — gear rolling hash with min/avg/max
size discipline (the FastCDC family; public spec: Xia et al., USENIX ATC
2016). The dedup property fixed-size chunking lacks: an insertion or
deletion shifts every later fixed-size chunk, but CDC boundaries depend
only on a 64-byte content window, so all chunks past the edit's
neighborhood keep their identity — sub-document dedup across corpus
revisions (the ``chunk_documents`` fixed-size splitter in text/ops.py
stays the right tool for token-budget packing).

Vectorization: the gear recurrence ``h = (h << 1) + G[b]`` over bytes
looks sequential, but the window is 64 bytes (older bytes shift out of
the uint64), so ``h[i] = Σ_{k<64} G[b[i-k]] << k`` — computed for ALL
positions as 64 shifted vector adds, O(64·n) numpy ops, no Python
byte loop. Candidate boundaries (``h & mask == 0``) are therefore
chunking-state-free; the min/max discipline is a cheap greedy walk over
the sparse candidate list (~n/avg entries), not the bytes.

Determinism: the gear table derives from a fixed seed; boundaries and
chunk fingerprints are pure functions of the bytes, reproducible by the
byte-at-a-time reference replay in oracle_pins (independent evaluation
strategy, same spec).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_GEAR_SEED = 0x9E3779B97F4A7C15


def gear_table(seed: int = _GEAR_SEED) -> np.ndarray:
    """256 deterministic uint64 gear values (splitmix64 stream)."""
    out = np.empty(256, np.uint64)
    x = seed & 0xFFFFFFFFFFFFFFFF
    for i in range(256):
        x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        z = x
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        out[i] = z ^ (z >> 31)
    return out


_GEAR = gear_table()


def _gear_hashes(data: np.ndarray) -> np.ndarray:
    """h[i] for every position i (hash of bytes ≤ i): 64 shifted adds,
    no per-byte Python. data is a uint8 array."""
    g = _GEAR[data]  # (n,) uint64
    h = g.copy()
    for k in range(1, 64):
        if k >= len(g):
            break
        h[k:] += g[:-k] << np.uint64(k)
    return h


def cdc_boundaries(
    data: bytes, min_size: int, avg_size: int, max_size: int
) -> np.ndarray:
    """Chunk END offsets (exclusive, ascending, last == len(data)).
    A boundary is the first position ≥ min_size into the current chunk
    where ``h & (avg_size-1) == 0``, clamped at max_size."""
    if not (0 < min_size <= avg_size <= max_size):
        raise ValueError(
            f"need 0 < min_size <= avg_size <= max_size, got "
            f"({min_size}, {avg_size}, {max_size})"
        )
    if avg_size & (avg_size - 1):
        raise ValueError(f"avg_size must be a power of two, got {avg_size}")
    n = len(data)
    if n == 0:
        return np.empty(0, np.int64)
    arr = np.frombuffer(data, np.uint8)
    cand = np.flatnonzero(
        (_gear_hashes(arr) & np.uint64(avg_size - 1)) == 0
    ).astype(np.int64) + 1  # cut AFTER the matching byte
    ends: list[int] = []
    start = 0
    while start < n:
        if n - start <= min_size:
            cut = n  # tail below the minimum: one final short chunk
        else:
            lo, hi = start + min_size, min(start + max_size, n)
            ci = int(np.searchsorted(cand, lo, side="left"))
            cut = int(cand[ci]) if ci < len(cand) and cand[ci] <= hi else hi
        ends.append(cut)
        start = cut
    return np.asarray(ends, np.int64)


def _md5_64(data: bytes) -> np.int64:
    """First 8 bytes of md5, reinterpreted int64 — C-speed per chunk
    (an FNV byte loop here would be a Python hot path)."""
    import hashlib

    h = int.from_bytes(hashlib.md5(data).digest()[:8], "big")
    return np.int64(h - (1 << 64) if h >= 1 << 63 else h)


def cdc_chunk_batch(
    batch: pd.DataFrame,
    min_size: int = 32,
    avg_size: int = 64,
    max_size: int = 256,
) -> pd.DataFrame:
    """map_batches stage: (doc_id, chunk_id, start, length, chunk_hash)
    rows per content-defined chunk of the UTF-8 text. chunk_hash is the
    md5-64 of the chunk bytes (reinterpreted int64) — the identity used
    for sub-document dedup."""
    ids, cks, sts, lns, hs = [], [], [], [], []
    for doc_id, text in zip(batch["doc_id"], batch["text"].fillna("")):
        data = text.encode("utf-8")
        ends = cdc_boundaries(data, min_size, avg_size, max_size)
        start = 0
        for ck, end in enumerate(ends):
            ids.append(doc_id)
            cks.append(ck)
            sts.append(start)
            lns.append(end - start)
            hs.append(_md5_64(data[start:end]))
            start = int(end)
    return pd.DataFrame(
        {
            "doc_id": pd.Series(ids, dtype=np.int64),
            "chunk_id": pd.Series(cks, dtype=np.int64),
            "start": pd.Series(sts, dtype=np.int64),
            "length": pd.Series(lns, dtype=np.int64),
            "chunk_hash": pd.Series(hs, dtype=np.int64),
        }
    )
