"""HyperLogLog distinct-count sketch (Flajolet et al. 2007) — the
approximate COUNT(DISTINCT) every large-scale pipeline needs when the
exact bucketed-distinct pass (O(distinct) shuffle) is too expensive.

Ray-Data shape: ONE streaming ``map_batches`` pass emits one 2^p-byte
register row per block (a pure combiner — register arrays merge by
elementwise max, associative + commutative + idempotent), a bounded
fan-in stage folds those rows, and the driver folds the survivors.
Nothing about the estimate depends on partitioning or execution order:
registers are a pure function of the input VALUE SET, so the result is
bit-deterministic across cluster sizes (pinned in tests).

Error: ~1.04/√(2^p) relative standard error (p=12 → 1.6 %, 4 KB per
block; p=14 → 0.8 %, 16 KB per block). Small cardinalities use linear
counting over empty registers (the classic correction); the 2^64-range
correction is irrelevant at uint64 hash width and omitted.

Hashing: values are reduced to uint64 either by the caller (pass
``hashes=...`` — e.g. the engine's vectorized token hashes from
``text/hashing.token_hashes64``) or by the same md5-of-joined-strings
rank function the sampling/dedup family uses (exact cross-language
semantics, row-rate cost acceptable off the pixel path).

No analog in the reference; brief-driven data-engine operator.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def hll_registers(hashes: np.ndarray, p: int) -> np.ndarray:
    """Fold uint64 hashes into a 2^p uint8 register array, vectorized:
    register index = top p bits, rank = leading-zero count of the
    remaining (64-p)-bit suffix + 1."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if hashes.size == 0:
        return regs
    h = np.ascontiguousarray(hashes, dtype=np.uint64)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h << np.uint64(p)  # suffix shifted to the top; zeros fill from right
    # rank = position of the first 1-bit from the MSB of w, in 1..64-p+1.
    # bit_length via float log2 is unsafe near 2^53; use a bit scan:
    rank = np.full(h.size, 64 - p + 1, dtype=np.uint8)  # all-zero suffix
    nz = w != 0
    if nz.any():
        wn = w[nz]
        # count leading zeros of a uint64 via 6-step binary descent
        lz = np.zeros(wn.size, dtype=np.uint8)
        for shift in (32, 16, 8, 4, 2, 1):
            mask = wn < (np.uint64(1) << np.uint64(64 - shift))
            lz[mask] += np.uint8(shift)
            wn = np.where(mask, wn << np.uint64(shift), wn)
        rank_nz = lz + 1
        r = rank.copy()
        r[nz] = rank_nz
        rank = r
    np.maximum.at(regs, idx, rank)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Bias-corrected HLL estimate with small-range linear counting."""
    m = regs.size
    est = _alpha(m) * m * m / float(np.sum(np.exp2(-regs.astype(np.float64))))
    if est <= 2.5 * m:
        zeros = int(np.count_nonzero(regs == 0))
        if zeros:
            est = m * np.log(m / zeros)
    return float(est)


def _hash_columns(batch: pd.DataFrame, cols: list[str]) -> np.ndarray:
    """md5-of-'|'-joined-strings → uint64 (first 16 hex chars), the same
    derivation family as sampling.md5_rank so semantics are documented
    once."""
    from gridfia_ray.pipelines.sampling import md5_rank

    hx = md5_rank([batch[c] for c in cols])
    return np.array([int(s[:16], 16) for s in hx], dtype=np.uint64)


def hll_distinct(
    ds: rd.Dataset,
    cols: list[str],
    *,
    p: int = 12,
    hash_fn=None,
    fan_in: int = 16,
) -> float:
    """Approximate COUNT(DISTINCT cols) over a Dataset.

    ``hash_fn(batch) -> uint64 array`` overrides the default md5 row
    hash (use the vectorized token hashes for text workloads). The
    per-block register rows are folded through ``fan_in`` partitions
    before the driver sees them, so driver intake is fan_in × 2^p bytes
    regardless of block count."""
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")
    m = 1 << p
    hasher = hash_fn or (lambda b: _hash_columns(b, cols))

    def block_regs(batch: pd.DataFrame) -> pd.DataFrame:
        regs = hll_registers(np.asarray(hasher(batch), dtype=np.uint64), p)
        return pd.DataFrame({"regs": [regs.tobytes()]})

    def merge_block(batch: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros(m, dtype=np.uint8)
        for buf in batch["regs"]:
            np.maximum(acc, np.frombuffer(buf, dtype=np.uint8), out=acc)
        return pd.DataFrame({"regs": [acc.tobytes()]})

    rows = (
        ds.map_batches(block_regs, batch_format="pandas")
        .repartition(fan_in)
        .map_batches(merge_block, batch_format="pandas", batch_size=None)
        .to_pandas()
    )
    acc = np.zeros(m, dtype=np.uint8)
    for buf in rows["regs"]:
        np.maximum(acc, np.frombuffer(buf, dtype=np.uint8), out=acc)
    return hll_estimate(acc)
