"""Document deduplication: exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding-cosine — the dedup family a training-data pipeline needs
(build brief; no counterpart in the GridFIA reference).

Scale shapes:
* exact       — content hash in ``map_batches`` → ``groupby(hash)`` →
                min-id winner (hash-partitioned, no text shuffled twice);
* MinHash-LSH — signatures per batch → explode to (band, band_hash) rows
                → groupby band buckets → candidate pairs → signature-
                estimate verify. Bands/rows trade recall vs candidates.
* SimHash     — 64-bit signature; near pairs via the same exhaustive
                Hamming banding as tile phash (pigeonhole-exact);
* n-gram Jaccard / embedding cosine — verification predicates applied to
                candidate pairs (never all-pairs at scale).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from gridfia_ray.codecs.phash import hamming64

_WORD = re.compile(r"\S+")
_M61 = np.uint64((1 << 61) - 1)


def _md5_64(texts: list[str]) -> np.ndarray:
    return np.asarray(
        [
            int.from_bytes(hashlib.md5((t or "").encode("utf-8")).digest()[:8], "big", signed=False)
            >> 1
            for t in texts
        ],
        dtype=np.int64,
    )


def add_text_hash(batch: pd.DataFrame) -> pd.DataFrame:
    batch = batch.copy()
    batch["text_hash"] = _md5_64(batch["text"].fillna("").tolist())
    return batch


def exact_dedup_docs(docs: rd.Dataset, n_buckets: int = 64) -> rd.Dataset:
    """One survivor (min doc_id) per exact text; returns survivor rows.
    Bucketed hash-partition dedup (stages/dedup_util.py) — O(buckets)
    group calls, not O(distinct texts)."""
    from gridfia_ray.stages.dedup_util import bucketed_distinct

    hashed = docs.map_batches(add_text_hash, batch_format="pandas")
    return bucketed_distinct(hashed, ["text_hash"], n_buckets, sort_cols=["text_hash", "doc_id"])


# ---------------------------------------------------------------------------
# shingles + MinHash
# ---------------------------------------------------------------------------


def word_shingles(text: str, k: int = 3) -> set[int]:
    """Hashed k-word shingles (64-bit)."""
    toks = _WORD.findall(text or "")
    if len(toks) < k:
        joined = " ".join(toks)
        return {_hash_str(joined)} if joined else set()
    return {_hash_str(" ".join(toks[i : i + k])) for i in range(len(toks) - k + 1)}


def _hash_str(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big") >> 1


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)


class MinHasher:
    """Seeded universal-hash MinHash signatures (n_perm permutations of
    the 61-bit Mersenne field; public construction). Stateful stage —
    the (a, b) coefficient tables are built once per actor."""

    def __init__(self, n_perm: int = 128, k_shingle: int = 3, seed: int = 42):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, (1 << 61) - 1, size=n_perm).astype(np.uint64)
        self.b = rng.randint(0, (1 << 61) - 1, size=n_perm).astype(np.uint64)
        self.n_perm = n_perm
        self.k = k_shingle

    def signature(self, text: str) -> np.ndarray:
        sh = word_shingles(text, self.k)
        if not sh:
            return np.full(self.n_perm, np.iinfo(np.uint64).max >> 1, dtype=np.uint64)
        x = np.fromiter(sh, dtype=np.uint64, count=len(sh))
        with np.errstate(over="ignore"):
            hx = (self.a[:, None] * x[None, :] + self.b[:, None]) % _M61
        return hx.min(axis=1)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs = [self.signature(t) for t in batch["text"].fillna("")]
        out = batch[["doc_id"]].copy()
        out["minhash_sig"] = [s.astype(np.int64).tobytes() for s in sigs]
        return out


def estimate_jaccard(sig_a: bytes, sig_b: bytes) -> float:
    a = np.frombuffer(sig_a, dtype=np.int64)
    b = np.frombuffer(sig_b, dtype=np.int64)
    return float(np.mean(a == b))


def minhash_lsh_pairs(
    docs: rd.Dataset,
    n_perm: int = 128,
    n_bands: int = 32,
    k_shingle: int = 3,
    threshold: float = 0.5,
    seed: int = 42,
) -> rd.Dataset:
    """Candidate pairs sharing ≥1 LSH band, verified by the signature
    Jaccard estimate ≥ threshold. Returns (a, b, est_jaccard) with a < b.
    """
    rows = n_perm // n_bands

    def explode_bands(batch: pd.DataFrame) -> pd.DataFrame:
        recs = {"band": [], "band_hash": [], "doc_id": [], "minhash_sig": []}
        for _, r in batch.iterrows():
            sig = np.frombuffer(r["minhash_sig"], dtype=np.int64)
            for b in range(n_bands):
                h = hashlib.md5(sig[b * rows : (b + 1) * rows].tobytes()).digest()
                recs["band"].append(b)
                recs["band_hash"].append(int.from_bytes(h[:8], "big") >> 1)
                recs["doc_id"].append(r["doc_id"])
                recs["minhash_sig"].append(r["minhash_sig"])
        return pd.DataFrame(recs)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("doc_id").sort_values("doc_id", kind="mergesort")
        out = {"a": [], "b": [], "est_jaccard": []}
        if len(g) >= 2:
            ids = g["doc_id"].tolist()
            sigs = g["minhash_sig"].tolist()
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    est = estimate_jaccard(sigs[i], sigs[j])
                    if est >= threshold:
                        out["a"].append(ids[i])
                        out["b"].append(ids[j])
                        out["est_jaccard"].append(est)
        return pd.DataFrame(out)

    from gridfia_ray.stages.dedup_util import bucketed_candidate_pairs, bucketed_distinct

    pairs = bucketed_candidate_pairs(
        docs.map_batches(
            MinHasher,
            fn_constructor_kwargs=dict(n_perm=n_perm, k_shingle=k_shingle, seed=seed),
            batch_format="pandas",
            concurrency=(1, 8),
        ).map_batches(explode_bands, batch_format="pandas"),
        ["band", "band_hash"],
        bucket_pairs,
    )
    return bucketed_distinct(pairs, ["a", "b"], n_buckets=32)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


class SimHasher:
    """64-bit SimHash over token hashes (public Charikar construction)."""

    def __init__(self):
        self.word = _WORD

    def sim64(self, text: str) -> int:
        toks = self.word.findall(text or "")
        if not toks:
            return 0
        acc = np.zeros(64, dtype=np.int64)
        for t in toks:
            h = _hash_str(t)
            bits = (h >> np.arange(64)) & 1
            acc += np.where(bits == 1, 1, -1)
        v = 0
        for i in range(64):
            if acc[i] > 0:
                v |= 1 << i
        return v - (1 << 64) if v >= 1 << 63 else v

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[["doc_id"]].copy()
        out["simhash"] = np.asarray([self.sim64(t) for t in batch["text"].fillna("")], np.int64)
        return out


def simhash_pairs(docs: rd.Dataset, max_hamming: int = 3, n_bands: int = 8) -> rd.Dataset:
    """Near-dup pairs by SimHash Hamming distance — exhaustive banding
    (same pigeonhole guarantee as tile phash)."""
    if max_hamming > n_bands - 1:
        raise ValueError("need n_bands >= max_hamming+1 for exhaustive banding")
    width = 64 // n_bands
    mask = (1 << width) - 1

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        sh = batch["simhash"].to_numpy().astype(np.int64).view(np.uint64)
        recs = []
        for b in range(n_bands):
            recs.append(
                pd.DataFrame(
                    {
                        "band": b,
                        "band_val": ((sh >> np.uint64(b * width)) & np.uint64(mask)).astype(
                            np.int64
                        ),
                        "doc_id": batch["doc_id"].to_numpy(),
                        "simhash": batch["simhash"].to_numpy(),
                    }
                )
            )
        return pd.concat(recs, ignore_index=True)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("doc_id").sort_values("doc_id", kind="mergesort")
        if len(g) < 2:
            return pd.DataFrame({"a": pd.Series(dtype=np.int64), "b": pd.Series(dtype=np.int64),
                                 "hamming": pd.Series(dtype=np.int64)})
        ids = g["doc_id"].to_numpy()
        sh = g["simhash"].to_numpy()
        ii, jj = np.triu_indices(len(ids), k=1)
        hm = hamming64(sh[ii], sh[jj])
        keep = hm <= max_hamming
        return pd.DataFrame(
            {"a": ids[ii[keep]], "b": ids[jj[keep]], "hamming": hm[keep].astype(np.int64)}
        )

    from gridfia_ray.stages.dedup_util import bucketed_candidate_pairs, bucketed_distinct

    pairs = bucketed_candidate_pairs(
        docs.map_batches(SimHasher, batch_format="pandas", concurrency=(1, 8)).map_batches(
            explode, batch_format="pandas"
        ),
        ["band", "band_val"],
        bucket_pairs,
    )
    return bucketed_distinct(pairs, ["a", "b"], n_buckets=32)


def verify_pairs_ngram_jaccard(
    pairs: pd.DataFrame, texts_by_id: dict, k: int = 3, threshold: float = 0.5
) -> pd.DataFrame:
    """Exact n-gram Jaccard verification of a (small) candidate-pair set.
    At scale this runs as a keyed re-join of texts to candidates; here the
    candidate set is assumed driver-small (documented assumption)."""
    out = {"a": [], "b": [], "jaccard": []}
    cache: dict = {}

    def sh(i):
        if i not in cache:
            cache[i] = word_shingles(texts_by_id[i], k)
        return cache[i]

    for _, r in pairs.iterrows():
        j = jaccard(sh(r["a"]), sh(r["b"]))
        if j >= threshold:
            out["a"].append(r["a"])
            out["b"].append(r["b"])
            out["jaccard"].append(j)
    return pd.DataFrame(out)
