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


_PACK_SHIFT = 21  # chunk_id < 2^21 per doc; doc_id < 2^42


def _pack(doc_id: np.ndarray, chunk_id: np.ndarray) -> np.ndarray:
    if (chunk_id >= (1 << _PACK_SHIFT)).any():
        raise ValueError(f"cdc: chunk_id >= 2^{_PACK_SHIFT} breaks the packed order key")
    if (doc_id >= (1 << (62 - _PACK_SHIFT))).any() or (doc_id < 0).any():
        raise ValueError("cdc: doc_id out of packed-key range")
    return doc_id * np.int64(1 << _PACK_SHIFT) + chunk_id


def cdc_dedup_docs(
    docs,
    min_size: int = 32,
    avg_size: int = 64,
    max_size: int = 256,
    n_buckets: int = 32,
):
    """Sub-document exact dedup à la 'Deduplicating Training Data Makes
    Language Models Better' (Lee et al. 2022), at CDC-chunk granularity:
    every chunk whose content appeared earlier in the corpus (first
    occurrence = min (doc_id, chunk_id), packed into one int64 order
    key) is REMOVED, and each document is reassembled from its kept
    byte ranges in chunk order. Returns (doc_id, text, n_kept,
    n_dropped); documents whose every chunk lost are dropped entirely
    (nothing left to emit).

    Three exchanges end-to-end, none carrying text: (1) first-occurrence
    winner per chunk_hash (min over the packed key), (2) keep-flag
    attach co-bucketed on chunk_hash, (3) reassembly co-bucketed on
    doc_id, where the original text joins its kept (start, length)
    ranges and is sliced bytewise. Byte-range caveat: CDC cuts are
    byte-aligned, not codepoint-aligned — removing a chunk that split a
    multi-byte character makes the seam undecodable; reassembly decodes
    with errors='strict' and raises rather than silently corrupting
    (ASCII/UTF-8-safe corpora are unaffected)."""
    import pyarrow as pa
    import ray.data as rd  # noqa: F401

    from gridfia_ray.stages.agg_util import bucketed_agg, bucketed_bucket_map

    chunks = docs.map_batches(
        lambda b: cdc_chunk_batch(b, min_size, avg_size, max_size),
        batch_format="pandas",
    ).materialize()  # consumed 3× (winners, flags, totals); rows are 5 ints

    def key_partial(b: pd.DataFrame) -> pd.DataFrame:
        out = b[["chunk_hash"]].copy()
        out["mk"] = _pack(
            b["doc_id"].to_numpy(np.int64), b["chunk_id"].to_numpy(np.int64)
        )
        # combiner: one candidate winner per hash per batch
        return out.groupby("chunk_hash", as_index=False).min()

    winners = bucketed_agg(
        chunks.map_batches(key_partial, batch_format="pandas"),
        ["chunk_hash"],
        {"mk": ("mk", "min")},
        n_buckets=n_buckets,
    )

    # keep-flag attach: chunks ∪ winners co-bucket on chunk_hash
    flag_schema = pa.schema(
        [
            ("chunk_hash", pa.int64()),
            ("doc_id", pa.int64()),
            ("chunk_id", pa.int64()),
            ("start", pa.int64()),
            ("length", pa.int64()),
            ("mk", pa.int64()),
        ]
    )

    def tag_chunk(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "chunk_hash": b["chunk_hash"].to_numpy(np.int64),
                "doc_id": b["doc_id"].to_numpy(np.int64),
                "chunk_id": b["chunk_id"].to_numpy(np.int64),
                "start": b["start"].to_numpy(np.int64),
                "length": b["length"].to_numpy(np.int64),
                "mk": np.full(len(b), -1, np.int64),  # -1 = chunk row
            }
        )

    def tag_winner(b: pd.DataFrame) -> pd.DataFrame:
        z = np.zeros(len(b), np.int64)
        return pd.DataFrame(
            {
                "chunk_hash": b["chunk_hash"].to_numpy(np.int64),
                "doc_id": z,
                "chunk_id": z,
                "start": z,
                "length": z,
                "mk": b["mk"].to_numpy(np.int64),
            }
        )

    tagged = chunks.map_batches(tag_chunk, batch_format="pandas").union(
        winners.map_batches(tag_winner, batch_format="pandas")
    )

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        w = g.loc[g["mk"] >= 0, ["chunk_hash", "mk"]]
        c = g.loc[g["mk"] < 0, ["chunk_hash", "doc_id", "chunk_id", "start", "length"]]
        m = c.merge(w, on="chunk_hash", how="left")
        keep = _pack(
            m["doc_id"].to_numpy(np.int64), m["chunk_id"].to_numpy(np.int64)
        ) == m["mk"].to_numpy(np.int64)
        out = m.loc[keep, ["doc_id", "chunk_id", "start", "length"]]
        return out.astype(np.int64)

    kept = bucketed_bucket_map(
        tagged,
        ["chunk_hash"],
        attach,
        n_buckets=n_buckets,
        out_schema=pa.schema(
            [("doc_id", pa.int64()), ("chunk_id", pa.int64()),
             ("start", pa.int64()), ("length", pa.int64())]
        ),
    )

    # reassembly: kept ranges ∪ original docs co-bucket on doc_id
    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("n_kept", pa.int64()),
            ("n_dropped", pa.int64()),
        ]
    )
    union_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("chunk_id", pa.int64()),
            ("start", pa.int64()),
            ("length", pa.int64()),
            ("text", pa.string()),
        ]
    )

    def tag_kept(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy(np.int64),
                "chunk_id": b["chunk_id"].to_numpy(np.int64),
                "start": b["start"].to_numpy(np.int64),
                "length": b["length"].to_numpy(np.int64),
                "text": pd.Series([None] * len(b), dtype=object),
            }
        )

    def tag_doc(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy(np.int64),
                "chunk_id": np.full(len(b), -1, np.int64),
                "start": np.zeros(len(b), np.int64),
                "length": np.zeros(len(b), np.int64),
                "text": b["text"].fillna("").astype(object),
            }
        )

    def tag_total(b: pd.DataFrame) -> pd.DataFrame:
        # per-doc chunk totals are EXACT per batch: cdc_chunk_batch
        # emits a doc's chunks in one output batch, so no cross-batch
        # merge is needed — and n_dropped costs no second chunking pass
        g = b.groupby("doc_id", as_index=False).size()
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(np.int64),
                "chunk_id": np.full(len(g), -2, np.int64),
                "start": np.zeros(len(g), np.int64),
                "length": g["size"].to_numpy(np.int64),  # total chunk count
                "text": pd.Series([None] * len(g), dtype=object),
            }
        )

    def reassemble(g: pd.DataFrame) -> pd.DataFrame:
        texts = g.loc[g["chunk_id"] == -1, ["doc_id", "text"]].set_index("doc_id")["text"]
        totals = (
            g.loc[g["chunk_id"] == -2, ["doc_id", "length"]]
            .set_index("doc_id")["length"]
        )
        ranges = g.loc[g["chunk_id"] >= 0].sort_values(["doc_id", "chunk_id"])
        ids, outs, nk, nd = [], [], [], []
        for doc_id, sub in ranges.groupby("doc_id", sort=False):
            raw = str(texts.get(doc_id, "")).encode("utf-8")
            parts = [
                raw[s : s + l]
                for s, l in zip(sub["start"].to_numpy(), sub["length"].to_numpy())
            ]
            ids.append(doc_id)
            outs.append(b"".join(parts).decode("utf-8"))  # strict: see docstring
            nk.append(len(parts))
            nd.append(int(totals.get(doc_id, len(parts))) - len(parts))
        return pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype=np.int64),
                "text": pd.Series(outs, dtype=object),
                "n_kept": pd.Series(nk, dtype=np.int64),
                "n_dropped": pd.Series(nd, dtype=np.int64),
            }
        )

    both = (
        kept.map_batches(tag_kept, batch_format="pandas")
        .union(docs.map_batches(tag_doc, batch_format="pandas"))
        .union(chunks.map_batches(tag_total, batch_format="pandas"))
    )
    del union_schema  # documented shape; blocks stay pandas-compatible
    return bucketed_bucket_map(
        both, ["doc_id"], reassemble, n_buckets=n_buckets, out_schema=out_schema
    )
