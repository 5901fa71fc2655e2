"""Vectorized text-hashing primitives shared by the dedup / fingerprint
operators (MinHash shingles, SimHash, rolling-hash fingerprints).

Round-1 review measured the kernel-level Python loops (per-shingle md5,
per-character Horner) at ~42% of the bench suite; these replacements
keep the operators' semantics (and, for ``fingerprint64``, the *exact*
output values) while doing all arithmetic in numpy:

* token bytes are concatenated ONCE per batch into a flat ``uint8``
  array with token/document offsets (the Arrow layout, built manually so
  tokenization stays bit-identical to the ``\\S+`` regex);
* per-token / per-shingle hashes are polynomial rolling hashes evaluated
  with precomputed power tables and ``np.add.reduceat`` segmented sums;
* mod-(2^61-1) arithmetic (needed by the exact fingerprint) uses a
  vectorized 32-bit-split ``mulmod61`` — the standard Mersenne-prime
  modmul identity (2^64 = 2^3 mod M, 2^61 = 1 mod M), all intermediates
  provably < 2^64.

All functions are pure and deterministic; no randomness, no hashlib.
"""

from __future__ import annotations

import re

import numpy as np

_WORD = re.compile(r"\S+")

M61 = np.uint64((1 << 61) - 1)
_MASK32 = np.uint64(0xFFFFFFFF)
_B_TOK = 131  # byte-level Horner base (token hashes)
_B_DOC = 1000003  # token-level Horner base (document fingerprint)

# 64-bit mixing constants (xxhash-style, public)
_P1 = np.uint64(0x9E3779B185EBCA87)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)


def avalanche64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit finalizer (splitmix-style)."""
    x = np.asarray(x, dtype=np.uint64)
    with np.errstate(over="ignore"):
        x = x ^ (x >> np.uint64(33))
        x = x * _P2
        x = x ^ (x >> np.uint64(29))
        x = x * _P3
        return x ^ (x >> np.uint64(32))


# ---------------------------------------------------------------------------
# exact mod-(2^61-1) vector arithmetic
# ---------------------------------------------------------------------------


def mod61(x: np.ndarray) -> np.ndarray:
    """x mod (2^61-1) for uint64 inputs (vectorized Mersenne fold)."""
    x = np.asarray(x, dtype=np.uint64)
    x = (x >> np.uint64(61)) + (x & M61)  # < 2^61 + 8
    return np.where(x >= M61, x - M61, x)


def mulmod61(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(a*b) mod (2^61-1), exact, for a, b < 2^61 (vectorized).

    Split a = ah·2^32 + al, b = bh·2^32 + bl (ah, bh < 2^29):
    a·b = ah·bh·2^64 + (ah·bl + al·bh)·2^32 + al·bl, with
    2^64 ≡ 2^3 and  m·2^32 ≡ (m >> 29) + ((m & (2^29-1)) << 32)  (mod M).
    Every intermediate fits in uint64.
    """
    a = np.asarray(a, dtype=np.uint64)
    b = np.asarray(b, dtype=np.uint64)
    ah, al = a >> np.uint64(32), a & _MASK32
    bh, bl = b >> np.uint64(32), b & _MASK32
    with np.errstate(over="ignore"):
        hi = (ah * bh) << np.uint64(3)  # < 2^61
        mid = ah * bl + al * bh  # < 2^62
        mid_red = (mid >> np.uint64(29)) + ((mid & np.uint64((1 << 29) - 1)) << np.uint64(32))
        lo = mod61(al * bl)
        return mod61(mod61(hi + mid_red) + lo)


def _pow_table_mod61(base: int, n: int) -> np.ndarray:
    """[base^0, …, base^(n-1)] mod 2^61-1 (exact, Python ints)."""
    m = (1 << 61) - 1
    out = np.empty(max(n, 1), dtype=np.uint64)
    v = 1
    for i in range(max(n, 1)):
        out[i] = v
        v = (v * base) % m
    return out


def _pow_table_mod64(base: int, n: int) -> np.ndarray:
    out = np.empty(max(n, 1), dtype=np.uint64)
    v = np.uint64(1)
    b = np.uint64(base)
    with np.errstate(over="ignore"):
        for i in range(max(n, 1)):
            out[i] = v
            v = v * b
    return out


def _segmented_sum_mod61(terms: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """Segment sums of terms (< 2^61 each) mod 2^61-1, overflow-safe:
    accumulate 32-bit halves separately (each half-sum < n·2^32)."""
    lo = np.add.reduceat(terms & _MASK32, starts)
    hi = np.add.reduceat(terms >> np.uint64(32), starts)
    # total = hi·2^32 + lo (mod M)
    return mod61(mulmod61(mod61(hi), np.uint64(1) << np.uint64(32)) + mod61(lo))


# ---------------------------------------------------------------------------
# batch tokenization → flat byte/offset layout
# ---------------------------------------------------------------------------


def tokenize_flat(
    texts, pattern: "re.Pattern | None" = None, lower: bool = False
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Tokenize a batch → (flat_bytes, token_lengths, doc_token_counts).
    Default tokenization is the same ``\\S+`` regex as the scalar
    operators (bit-identical token boundaries); the only Python work is
    findall + encode per doc — no per-character loops."""
    rx = pattern or _WORD
    lens: list[int] = []
    counts = np.empty(len(texts), dtype=np.int64)
    chunks: list[bytes] = []
    for d, t in enumerate(texts):
        toks = rx.findall((t or "").lower() if lower else (t or ""))
        counts[d] = len(toks)
        enc = [tok.encode("utf-8") for tok in toks]
        lens.extend(len(e) for e in enc)
        chunks.append(b"".join(enc))
    flat = np.frombuffer(b"".join(chunks), dtype=np.uint8)
    return flat, np.asarray(lens, dtype=np.int64), counts


def token_hashes64(
    texts, pattern: "re.Pattern | None" = None, lower: bool = False
) -> tuple[np.ndarray, np.ndarray]:
    """64-bit polynomial token hashes (base 131, mod 2^64, avalanched),
    flat across the batch → (hashes uint64, doc_token_counts)."""
    flat, tlens, counts = tokenize_flat(texts, pattern, lower)
    n_tok = tlens.size
    if n_tok == 0:
        return np.empty(0, np.uint64), counts
    ends = np.cumsum(tlens)
    starts = ends - tlens
    # exponent of each byte = (token_end - 1 - position)
    exp = (np.repeat(ends, tlens) - 1 - np.arange(flat.size, dtype=np.int64)).astype(np.int64)
    powers = _pow_table_mod64(_B_TOK, int(tlens.max()) + 1 if n_tok else 1)
    with np.errstate(over="ignore"):
        terms = flat.astype(np.uint64) * powers[exp]
        th = np.add.reduceat(terms, starts) if flat.size else np.zeros(n_tok, np.uint64)
    # empty tokens impossible (\S+); docs with 0 tokens contribute none
    return avalanche64(th), counts


# ---------------------------------------------------------------------------
# shingles / MinHash / SimHash over the flat layout
# ---------------------------------------------------------------------------


def shingle_hashes64(
    th: np.ndarray, counts: np.ndarray, k: int = 3
) -> tuple[np.ndarray, np.ndarray]:
    """k-token shingle hashes per document → (flat shingle hashes,
    per-doc shingle counts). Documents with 1..k-1 tokens produce ONE
    shingle over all their tokens (matching the scalar fallback);
    0-token documents produce none."""
    n_docs = counts.size
    out_counts = np.where(counts >= k, counts - k + 1, np.minimum(counts, 1)).astype(np.int64)
    total = int(out_counts.sum())
    if total == 0:
        return np.empty(0, np.uint64), out_counts
    doc_tok_start = np.concatenate([[0], np.cumsum(counts)[:-1]])
    out = np.empty(total, np.uint64)
    out_start = np.concatenate([[0], np.cumsum(out_counts)[:-1]])
    # full-width shingles, vectorized across the whole batch: for window
    # position j, combine th[i..i+k-1] with a polynomial in P1
    full = counts >= k
    if full.any():
        # flat indices of every shingle start in full docs
        reps = (counts[full] - k + 1).astype(np.int64)
        base = np.repeat(doc_tok_start[full], reps)
        within = np.concatenate([np.arange(r) for r in reps]) if reps.size else np.empty(0, int)
        s0 = base + within
        with np.errstate(over="ignore"):
            acc = np.zeros(s0.size, np.uint64)
            for j in range(k):
                acc = acc * _P1 ^ th[s0 + j]
        dst = np.repeat(out_start[full], reps) + within
        out[dst] = avalanche64(acc)
    # short docs (1..k-1 tokens): one shingle over all tokens
    short = (counts > 0) & (counts < k)
    if short.any():
        for d in np.flatnonzero(short):  # rare path; tiny docs only
            s, c = doc_tok_start[d], counts[d]
            with np.errstate(over="ignore"):
                acc = np.uint64(0)
                for j in range(int(c)):
                    acc = acc * _P1 ^ th[s + j]
            out[out_start[d]] = avalanche64(np.asarray(acc))[()]
    return out, out_counts


def unique_per_doc(
    vals: np.ndarray, counts: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Set semantics per document, vectorized: sort (doc, val) pairs and
    drop in-doc repeats → (flat unique vals, per-doc unique counts)."""
    n_docs = counts.size
    if vals.size == 0:
        return vals, np.zeros(n_docs, np.int64)
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
    order = np.lexsort((vals, doc_idx))
    dv, vv = doc_idx[order], vals[order]
    keep = np.ones(vv.size, dtype=bool)
    keep[1:] = (vv[1:] != vv[:-1]) | (dv[1:] != dv[:-1])
    new_counts = np.bincount(dv[keep], minlength=n_docs).astype(np.int64)
    return vv[keep], new_counts


def minhash_signatures(
    vals: np.ndarray,
    counts: np.ndarray,
    a: np.ndarray,
    b: np.ndarray,
    chunk: int = 1 << 12,
) -> np.ndarray:
    """(n_docs, n_perm) MinHash signature matrix over per-doc value sets.
    Hash family: ((a·x + b) mod 2^64) mod 2^61-1 — the same family as
    the scalar MinHasher. Empty docs get the max-sentinel signature.
    Processed in shingle chunks sized so the (n_perm × chunk) working
    set stays L2-resident — measured 80× faster than 64 MB slabs on
    this DRAM-bandwidth-starved VM (4 MB: 0.28 s vs 64 MB: 23 s for the
    same 260k-shingle batch)."""
    n_docs = counts.size
    n_perm = a.size
    sentinel = np.uint64(np.iinfo(np.uint64).max >> 1)
    sig = np.full((n_docs, n_perm), sentinel, dtype=np.uint64)
    if vals.size == 0:
        return sig
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    nonempty = np.flatnonzero(counts > 0)
    # chunk over documents so every reduceat segment stays inside one slab
    d0 = 0
    a_col = a[:, None]
    b_col = b[:, None]
    while d0 < nonempty.size:
        d1 = d0 + 1
        span = counts[nonempty[d0]]
        while d1 < nonempty.size and span + counts[nonempty[d1]] <= chunk:
            span += counts[nonempty[d1]]
            d1 += 1
        docs = nonempty[d0:d1]
        lo = starts[docs[0]]
        hi = starts[docs[-1]] + counts[docs[-1]]
        x = vals[lo:hi]
        with np.errstate(over="ignore"):
            h = mod61(a_col * x[None, :] + b_col)  # (n_perm, span)
        seg = (starts[docs] - lo).astype(np.int64)
        sig[docs, :] = np.minimum.reduceat(h, seg, axis=1).T
        d0 = d1
    return sig


def simhash_from_tokens(th: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """64-bit SimHash per document from (non-unique) token hashes —
    Charikar bit-vote, vectorized one bit-plane at a time."""
    n_docs = counts.size
    out = np.zeros(n_docs, np.uint64)
    if th.size == 0:
        return out.view(np.int64)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
    nonempty = counts > 0
    ne_starts = starts[nonempty]
    n_tok = counts[nonempty].astype(np.int64)
    for j in range(64):
        ones = np.add.reduceat((th >> np.uint64(j)) & np.uint64(1), ne_starts)
        # acc_j = ones - (n - ones) > 0  ⇔  2·ones > n
        bit = (2 * ones.astype(np.int64) > n_tok).astype(np.uint64)
        out[nonempty] |= bit << np.uint64(j)
    return out.view(np.int64)


def ngram_hashes64(
    th: np.ndarray, counts: np.ndarray, k: int = 2
) -> tuple[np.ndarray, np.ndarray]:
    """Strict k-token window hashes (docs with < k tokens produce NONE —
    unlike ``shingle_hashes64``'s whole-doc fallback). For repetition
    statistics where a partial window is not an n-gram."""
    out_counts = np.maximum(counts - k + 1, 0).astype(np.int64)
    total = int(out_counts.sum())
    if total == 0:
        return np.empty(0, np.uint64), out_counts
    doc_tok_start = np.concatenate([[0], np.cumsum(counts)[:-1]])
    full = counts >= k
    reps = out_counts[full]
    base = np.repeat(doc_tok_start[full], reps)
    within = np.concatenate([np.arange(r) for r in reps])
    s0 = base + within
    with np.errstate(over="ignore"):
        acc = np.zeros(s0.size, np.uint64)
        for j in range(k):
            acc = acc * _P1 ^ th[s0 + j]
    return avalanche64(acc), out_counts


def check_exhaustive_banding(max_hamming: int, n_bands: int) -> None:
    """The pigeonhole guarantee behind every SimHash-band lookup here:
    two signatures within ``max_hamming`` Hamming distance share at
    least one of ``n_bands`` bands iff ``max_hamming <= n_bands - 1``.
    Shared by batch pair-finding and the persistent near-dup index so
    both enforce the identical contract."""
    if max_hamming > n_bands - 1:
        raise ValueError("need n_bands >= max_hamming+1 for exhaustive banding")


def simhash_band_decompose(
    sim: np.ndarray, n_bands: int
) -> tuple[np.ndarray, np.ndarray]:
    """THE SimHash banding decomposition — (band int32, band_val int64)
    arrays, band-major, length n·n_bands — shared by the batch
    ``dedup/docs.simhash_pairs`` and the persistent near-dup index
    (``dedup/incremental``) so both always agree on what counts as a
    band match. ``n_bands`` must divide 64 (no silently-ignored top
    bits)."""
    if n_bands < 1 or 64 % n_bands != 0:
        raise ValueError(f"n_bands must divide 64, got {n_bands}")
    width = 64 // n_bands
    mask = np.uint64((1 << width) - 1)
    u = np.ascontiguousarray(sim, dtype=np.int64).view(np.uint64)
    bands = np.repeat(np.arange(n_bands, dtype=np.int32), u.size)
    vals = np.concatenate(
        [((u >> np.uint64(b * width)) & mask).astype(np.int64) for b in range(n_bands)]
    )
    return bands, vals


def max_count_per_doc(vals: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Per-document maximum multiplicity of a value (the 'most frequent
    n-gram count' statistic), fully vectorized: sort (doc, val) pairs,
    run-length encode, max run length per doc."""
    n_docs = counts.size
    out = np.zeros(n_docs, np.int64)
    if vals.size == 0:
        return out
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
    order = np.lexsort((vals, doc_idx))
    dv, vv = doc_idx[order], vals[order]
    new_run = np.ones(vv.size, dtype=bool)
    new_run[1:] = (vv[1:] != vv[:-1]) | (dv[1:] != dv[:-1])
    run_starts = np.flatnonzero(new_run)
    run_lens = np.diff(np.concatenate([run_starts, [vv.size]]))
    run_docs = dv[run_starts]
    # runs are already grouped by doc (lexsort major key)
    doc_run_starts = np.flatnonzero(
        np.concatenate([[True], run_docs[1:] != run_docs[:-1]])
    )
    maxes = np.maximum.reduceat(run_lens, doc_run_starts)
    out[run_docs[doc_run_starts]] = maxes
    return out


# ---------------------------------------------------------------------------
# exact fingerprint (identical values to the scalar Horner loops)
# ---------------------------------------------------------------------------


def fingerprint64_batch(texts) -> np.ndarray:
    """Order-sensitive document fingerprint, value-identical to the
    scalar reference: th(token) = Horner base-131 over utf-8 bytes mod
    2^61-1; h(doc) = Horner base-1000003 over (th_i + 1) mod 2^61-1.
    Vectorized: both Horner evaluations become power-table dot products
    with exact ``mulmod61`` arithmetic."""
    flat, tlens, counts = tokenize_flat(texts)
    n_tok = tlens.size
    fps = np.zeros(counts.size, np.uint64)
    if n_tok:
        ends = np.cumsum(tlens)
        tok_starts = ends - tlens
        exp = (np.repeat(ends, tlens) - 1 - np.arange(flat.size, dtype=np.int64)).astype(
            np.int64
        )
        p_tok = _pow_table_mod61(_B_TOK, int(tlens.max()) + 1)
        terms = mulmod61(flat.astype(np.uint64), p_tok[exp])
        th = _segmented_sum_mod61(terms, tok_starts)
        # doc level: h = Σ (th_i + 1)·B^(n-1-i) mod M
        doc_ends = np.cumsum(counts)
        doc_starts = (doc_ends - counts).astype(np.int64)
        dexp = (np.repeat(doc_ends, counts) - 1 - np.arange(n_tok, dtype=np.int64)).astype(
            np.int64
        )
        p_doc = _pow_table_mod61(_B_DOC, int(counts.max()) + 1)
        dterms = mulmod61(mod61(th + np.uint64(1)), p_doc[dexp])
        nonempty = counts > 0
        fps[nonempty] = _segmented_sum_mod61(dterms, doc_starts[nonempty])
    return (fps & np.uint64(0x7FFFFFFFFFFFFFFF)).view(np.int64).copy()
