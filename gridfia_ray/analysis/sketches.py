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


def grouped_hll_distinct(
    ds: rd.Dataset,
    group_cols: list[str],
    value_cols: list[str],
    *,
    p: int = 12,
    hash_fn=None,
    n_buckets: int = 32,
) -> rd.Dataset:
    """Approximate per-group COUNT(DISTINCT value_cols) — the scale
    path for "distinct users per day" when the exact bucketed-distinct
    pass (one shuffled row per distinct member, O(distinct) exchange)
    is too expensive. One streaming pass emits a 2^p-byte register row
    per (block, group); one bucketed exchange max-merges registers per
    group. Shuffle volume is O(groups_per_block × blocks × 2^p) —
    independent of member cardinality — and, like the global sketch,
    the merged registers are a pure function of each group's value SET,
    so results are bit-deterministic across partitionings and cluster
    sizes (pinned + invariance-tested).

    Returns a Dataset of ``group_cols + [approx_distinct: float64]``.
    ``hash_fn(sub_batch) -> uint64`` overrides the default md5 row hash
    of ``value_cols``.
    """
    from gridfia_ray.stages.agg_util import bucketed_bucket_map

    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")
    m = 1 << p
    hasher = hash_fn or (lambda b: _hash_columns(b, value_cols))

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        rows: list[dict] = []
        for key, sub in batch.groupby(group_cols, sort=False):
            if not isinstance(key, tuple):
                key = (key,)
            regs = hll_registers(np.asarray(hasher(sub), dtype=np.uint64), p)
            rows.append(dict(zip(group_cols, key)) | {"regs": regs.tobytes()})
        out = pd.DataFrame(rows, columns=[*group_cols, "regs"])
        return out

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        outs: list[dict] = []
        for key, sub in g.groupby(group_cols, sort=False):
            if not isinstance(key, tuple):
                key = (key,)
            acc = np.zeros(m, dtype=np.uint8)
            for buf in sub["regs"]:
                np.maximum(acc, np.frombuffer(buf, dtype=np.uint8), out=acc)
            outs.append(
                dict(zip(group_cols, key)) | {"approx_distinct": hll_estimate(acc)}
            )
        return pd.DataFrame(outs, columns=[*group_cols, "approx_distinct"])

    # pin the output Arrow schema (group dtypes from the input) so an
    # all-empty bucket emits typed columns, not executor-churning nulls
    import pyarrow as pa

    sch = ds.schema()
    tmap = dict(zip(sch.names, sch.types))

    def _pa_type(t):
        if isinstance(t, pa.DataType):
            return t
        try:  # pandas-backed datasets report numpy dtypes / python types
            return pa.from_numpy_dtype(np.dtype(t))
        except (TypeError, pa.ArrowNotImplementedError):
            return pa.string()

    out_schema = pa.schema(
        [(c, _pa_type(tmap[c])) for c in group_cols]
        + [("approx_distinct", pa.float64())]
    )
    partials = ds.map_batches(partial, batch_format="pandas")
    return bucketed_bucket_map(
        partials,
        group_cols,
        merge_bucket,
        n_buckets=n_buckets,
        coalesce=True,
        out_schema=out_schema,
    )


# ---------------------------------------------------------------------------
# Count-Min sketch + exact heavy hitters
# ---------------------------------------------------------------------------

_CMS_SALTS = np.uint64([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9,
                        0x27D4EB2F165667C5, 0x85EBCA77C2B2AE63])


def _cms_rows(hashes: np.ndarray, d: int, w: int) -> tuple[np.ndarray, np.ndarray]:
    """(row_offsets, column indices) of each hash in a d×w sketch —
    d independent salted-multiply hash rows."""
    if not 1 <= d <= len(_CMS_SALTS):
        raise ValueError(
            f"d must be in [1, {len(_CMS_SALTS)}] — rows beyond the salt set "
            f"would reuse salts and add no independence"
        )
    h = np.ascontiguousarray(hashes, dtype=np.uint64)
    cols = np.empty((d, h.size), dtype=np.int64)
    for r in range(d):
        z = h * _CMS_SALTS[r] + np.uint64(r)
        z ^= z >> np.uint64(31)
        cols[r] = (z % np.uint64(w)).astype(np.int64)
    return np.arange(d, dtype=np.int64)[:, None] * w, cols


def cms_from_hashes(hashes: np.ndarray, counts: np.ndarray, d: int, w: int) -> np.ndarray:
    """Fold (hash, count) pairs into a flat d·w int64 Count-Min sketch.
    Mergeable by elementwise ADDITION (a linear sketch) — the same
    combiner shape as the HLL registers but summed, so per-block
    sketches stream through one bounded fold."""
    sk = np.zeros(d * w, dtype=np.int64)
    if hashes.size == 0:
        return sk
    offs, cols = _cms_rows(hashes, d, w)
    for r in range(d):
        np.add.at(sk, offs[r, 0] + cols[r], counts)
    return sk


def cms_estimate(sk: np.ndarray, hashes: np.ndarray, d: int, w: int) -> np.ndarray:
    """Point estimates (upper bounds: CMS never undercounts) for each
    hash — min over the d rows."""
    if hashes.size == 0:
        return np.empty(0, np.int64)
    offs, cols = _cms_rows(hashes, d, w)
    est = np.full(hashes.size, np.iinfo(np.int64).max, dtype=np.int64)
    for r in range(d):
        np.minimum(est, sk[offs[r, 0] + cols[r]], out=est)
    return est


def heavy_hitters_exact(
    ds: "rd.Dataset",
    items_fn,
    threshold: int,
    *,
    d: int = 4,
    w: int = 1 << 16,
    fan_in: int = 16,
    n_buckets: int = 32,
    hashes_fn=None,
) -> pd.DataFrame:
    """EXACT heavy hitters (items with global count ≥ ``threshold``)
    via sketch-prefilter-then-verify: build a global Count-Min sketch
    (one streaming pass, per-block linear-sketch combiners), then a
    second pass keeps only items whose CMS upper bound reaches the
    threshold — a superset of the true heavy hitters, since CMS never
    undercounts — and exact-counts just that candidate set through one
    bucketed keyed sum. Only candidate items ever shuffle; the full
    item universe never does (vs a full wordcount's distinct-item
    exchange).

    ``items_fn(batch) -> (items ndarray, hashes uint64 ndarray)``
    defines the item domain (e.g. tokens + their vectorized hashes).
    ``hashes_fn(batch) -> uint64 ndarray``, if given, feeds the SKETCH
    pass alone — it never needs the item strings, so a vectorized
    hash-only extractor avoids materializing one Python object per
    corpus item on the first pass. Returns a DataFrame (item, n) with
    n ≥ threshold, exact: the verify pass counts by ITEM, so hash
    collisions can only over-admit candidates, never merge counts.
    """
    import ray

    from gridfia_ray.stages.agg_util import bucketed_agg

    if threshold < 1:
        raise ValueError(f"threshold must be >= 1, got {threshold}")
    if not 1 <= d <= len(_CMS_SALTS):
        raise ValueError(
            f"d must be in [1, {len(_CMS_SALTS)}] — rows beyond the salt set "
            f"would reuse salts and add no independence"
        )
    if w < 2:
        raise ValueError(f"w must be >= 2, got {w}")

    def block_sketch(batch: pd.DataFrame) -> pd.DataFrame:
        hashes = hashes_fn(batch) if hashes_fn is not None else items_fn(batch)[1]
        # pre-aggregate within the block: unique hashes + counts
        uh, inv = np.unique(np.asarray(hashes, np.uint64), return_inverse=True)
        cnt = np.bincount(inv).astype(np.int64)
        sk = cms_from_hashes(uh, cnt, d, w)
        return pd.DataFrame({"sk": [sk.tobytes()]})

    def merge_block(batch: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros(d * w, dtype=np.int64)
        for buf in batch["sk"]:
            acc += np.frombuffer(buf, dtype=np.int64)
        return pd.DataFrame({"sk": [acc.tobytes()]})

    rows = (
        ds.map_batches(block_sketch, batch_format="pandas")
        .repartition(fan_in)
        .map_batches(merge_block, batch_format="pandas", batch_size=None)
        .to_pandas()
    )
    sk = np.zeros(d * w, dtype=np.int64)
    for buf in rows["sk"]:
        sk += np.frombuffer(buf, dtype=np.int64)
    sk_ref = ray.put(sk)

    def candidates(batch: pd.DataFrame) -> pd.DataFrame:
        sketch = ray.get(sk_ref)
        items, hashes = items_fn(batch)
        items = np.asarray(items)
        hashes = np.asarray(hashes, np.uint64)
        # block-local pre-count keyed by the ITEM, not its hash: a hash
        # collision between two distinct items must only over-admit
        # candidates (CMS merges them upward), never merge their exact
        # counts or drop one from the output
        ui, idx, inv = np.unique(items, return_index=True, return_inverse=True)
        cnt = np.bincount(inv).astype(np.int64)
        keep = cms_estimate(sketch, hashes[idx], d, w) >= threshold
        return pd.DataFrame({"item": ui[keep], "n": cnt[keep]})

    exact = bucketed_agg(
        ds.map_batches(candidates, batch_format="pandas"),
        ["item"],
        {"n": ("n", "sum")},
        n_buckets=n_buckets,
    ).to_pandas()
    out = exact[exact["n"] >= threshold].copy()
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values("item").reset_index(drop=True)


# ---------------------------------------------------------------------------
# DDSketch quantiles (Masson, Lee & Rim, VLDB 2019)
# ---------------------------------------------------------------------------
# Relative-error quantile sketch with FIXED geometric buckets: bucket(x)
# = ceil(log_gamma(x)) for x > 0, gamma = (1 + alpha) / (1 - alpha).
# Because the bucket boundaries are a pure function of alpha (no
# data-dependent collapsing), per-block sketches merge by plain count
# addition — associative, commutative, order-free — so, like the HLL
# registers above, results are bit-deterministic across partitionings
# and cluster sizes. Negative values mirror into their own bucket bank;
# zeros (|x| below the subnormal cutoff) count separately.


def _dd_gamma(alpha: float) -> float:
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    return (1.0 + alpha) / (1.0 - alpha)


_DD_MIN = 1e-9  # |x| <= cutoff counts as zero (bounds the key range)


_DD_BANK = 1 << 40  # separates the positive / zero / negative key banks


def dd_bucket_keys(values: np.ndarray, alpha: float) -> np.ndarray:
    """Vectorized bucket key per value, encoded so that int64 key order
    equals VALUE order across signs: positives -> BANK + k, ~zero -> 0,
    negatives -> -BANK - k (k = ceil(ln|x| / ln gamma), which is
    negative for |x| < 1 — the banks keep the two sign ranges and the
    zero bucket disjoint for every k)."""
    v = np.asarray(values, dtype=np.float64)
    if not np.isfinite(v).all():
        raise ValueError("ddsketch: non-finite values")
    lg = np.log(_dd_gamma(alpha))
    keys = np.zeros(v.size, dtype=np.int64)
    mag = np.abs(v)
    nz = mag > _DD_MIN
    k = np.ceil(np.log(mag[nz]) / lg).astype(np.int64)
    if nz.any() and int(np.abs(k).max()) >= _DD_BANK // 2:
        raise ValueError("ddsketch: alpha too small for the value range")
    keys[nz] = np.where(v[nz] > 0, _DD_BANK + k, -_DD_BANK - k)
    return keys


def dd_quantiles_from_counts(
    keys: np.ndarray, counts: np.ndarray, qs: list[float], alpha: float
) -> np.ndarray:
    """Quantiles from a merged (key -> count) table. Bucket value =
    2*gamma^k/(gamma+1) (the relative-error midpoint); zero bucket = 0;
    negative keys mirror."""
    gamma = _dd_gamma(alpha)
    order = np.argsort(keys, kind="stable")
    k_sorted = keys[order]
    c_sorted = counts[order].astype(np.int64)
    # key order == value order under the banked encoding: negatives
    # (-BANK - k: bigger magnitude -> bigger k -> smaller key) < 0-key
    # < positives (BANK + k ascending with value).
    total = int(c_sorted.sum())
    if total == 0:
        raise ValueError("ddsketch: empty sketch")
    cum = np.cumsum(c_sorted)
    out = []
    for q in qs:
        if not 0.0 <= q <= 100.0:
            raise ValueError(f"quantile must be in [0, 100], got {q}")
        rank = int(np.ceil(q / 100.0 * total))
        rank = max(1, min(rank, total))
        i = int(np.searchsorted(cum, rank))
        key = int(k_sorted[i])
        if key == 0:
            out.append(0.0)
        elif key > 0:
            out.append(2.0 * gamma ** (key - _DD_BANK) / (gamma + 1.0))
        else:
            out.append(-2.0 * gamma ** (-key - _DD_BANK) / (gamma + 1.0))
    return np.asarray(out, dtype=np.float64)


def grouped_dd_quantiles(
    ds: rd.Dataset,
    group_cols: list[str],
    value_col: str,
    qs: list[float],
    *,
    alpha: float = 0.01,
    n_buckets: int = 32,
) -> rd.Dataset:
    """Approximate per-group quantiles in ONE streaming pass — the
    scale path next to ``percentiles.grouped_percentiles_exact`` (which
    is exact but needs multiple refinement passes over the data). Each
    block emits (group, bucket_key, count) rows; one bucketed exchange
    sums counts per (group, key); quantiles come off the merged table
    with the DDSketch relative-error guarantee: every returned value is
    within relative error ``alpha`` of an exact quantile (sign-split
    geometric buckets, VLDB'19). Deterministic and partition-invariant
    by construction (pure count addition).

    Returns ``group_cols + [q_<spec>: float64 ...]`` with one column
    per requested quantile.
    """
    from gridfia_ray.stages.agg_util import bucketed_bucket_map

    _dd_gamma(alpha)  # validate on the driver, before any task launches
    for q in qs:
        if not 0.0 <= q <= 100.0:
            raise ValueError(f"quantile must be in [0, 100], got {q}")
    qcols = [f"q{('%g' % q).replace('.', '_')}" for q in qs]
    if len(set(qcols)) != len(qcols):
        raise ValueError(f"quantile specs collide after column naming: {qs}")

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for key, sub in batch.groupby(group_cols, sort=False):
            if not isinstance(key, tuple):
                key = (key,)
            ks = dd_bucket_keys(sub[value_col].to_numpy(), alpha)
            uk, cnt = np.unique(ks, return_counts=True)
            f = pd.DataFrame({"__ddkey": uk, "__ddcount": cnt.astype(np.int64)})
            for c, v in zip(group_cols, key):
                f[c] = v
            frames.append(f)
        if not frames:
            return pd.DataFrame(
                {"__ddkey": pd.Series([], dtype=np.int64),
                 "__ddcount": pd.Series([], dtype=np.int64)}
                | {c: pd.Series([], dtype=batch[c].dtype) for c in group_cols}
            )
        return pd.concat(frames, ignore_index=True)

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for key, sub in g.groupby(group_cols, sort=False):
            if not isinstance(key, tuple):
                key = (key,)
            agg = sub.groupby("__ddkey", as_index=False)["__ddcount"].sum()
            vals = dd_quantiles_from_counts(
                agg["__ddkey"].to_numpy(),
                agg["__ddcount"].to_numpy(),
                qs,
                alpha,
            )
            outs.append(dict(zip(group_cols, key)) | dict(zip(qcols, vals)))
        return pd.DataFrame(outs, columns=[*group_cols, *qcols])

    import pyarrow as pa

    sch = ds.schema()
    tmap = dict(zip(sch.names, sch.types))

    def _pa_type(t):
        if isinstance(t, pa.DataType):
            return t
        try:
            return pa.from_numpy_dtype(np.dtype(t))
        except (TypeError, pa.ArrowNotImplementedError):
            return pa.string()

    out_schema = pa.schema(
        [(c, _pa_type(tmap[c])) for c in group_cols]
        + [(c, pa.float64()) for c in qcols]
    )
    partials = ds.map_batches(partial, batch_format="pandas")
    return bucketed_bucket_map(
        partials,
        group_cols,
        merge_bucket,
        n_buckets=n_buckets,
        coalesce=True,
        out_schema=out_schema,
    )
