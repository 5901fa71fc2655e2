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
    """Hashed k-word shingles (64-bit, vectorized rolling hash)."""
    from gridfia_ray.text.hashing import shingle_hashes64, token_hashes64

    th, counts = token_hashes64([text])
    sh, _ = shingle_hashes64(th, counts, k)
    return set(sh.tolist())


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)


class MinHasher:
    """Seeded universal-hash MinHash signatures (n_perm permutations of
    the 61-bit Mersenne field; public construction). Stateful stage —
    the (a, b) coefficient tables are built once per actor. The whole
    batch is hashed vectorized: flat shingle array + per-doc offsets →
    one ``minimum.reduceat`` per permutation block (text/hashing.py) —
    no per-shingle hashing in Python (round-1 perf item 1)."""

    def __init__(self, n_perm: int = 128, k_shingle: int = 3, seed: int = 42):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, (1 << 61) - 1, size=n_perm).astype(np.uint64)
        self.b = rng.randint(0, (1 << 61) - 1, size=n_perm).astype(np.uint64)
        self.n_perm = n_perm
        self.k = k_shingle

    def signatures(self, texts: list[str]) -> np.ndarray:
        from gridfia_ray.text.hashing import (
            minhash_signatures,
            shingle_hashes64,
            token_hashes64,
            unique_per_doc,
        )

        th, counts = token_hashes64(texts)
        sh, sc = shingle_hashes64(th, counts, self.k)
        u, uc = unique_per_doc(sh, sc)
        return minhash_signatures(u, uc, self.a, self.b)

    def signature(self, text: str) -> np.ndarray:
        return self.signatures([text])[0]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs = self.signatures(batch["text"].fillna("").tolist())
        out = batch[["doc_id"]].copy()
        sig_i64 = sigs.astype(np.int64)
        out["minhash_sig"] = [sig_i64[i].tobytes() for i in range(len(out))]
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

    Payload-slim shape (round-1 perf items 1+7): band rows carry
    ``doc_id`` only — the 1 KB signatures are NOT replicated into all
    ``n_bands`` band rows. The signature table is computed once
    (materialized, spillable), candidate pairs come out of the band
    buckets id-only, and signatures re-join onto the (rare) candidates
    via ``attach_pair_attrs`` for the estimate verification.
    """
    rows = n_perm // n_bands

    def explode_bands(batch: pd.DataFrame) -> pd.DataFrame:
        """(doc_id, sig) → n_bands id-only rows, fully vectorized: the
        signature matrix is rebuilt zero-copy from concatenated bytes,
        band hashes are a polynomial combine + avalanche over the
        (n, bands, rows) view — no iterrows, no per-band md5."""
        from gridfia_ray.text.hashing import _P1, avalanche64

        n = len(batch)
        if n == 0:
            return pd.DataFrame(
                {"band": pd.Series(dtype=np.int32), "band_hash": pd.Series(dtype=np.int64),
                 "doc_id": pd.Series(dtype=np.int64)}
            )
        sig_bytes = batch["minhash_sig"].tolist()
        mat = np.frombuffer(b"".join(sig_bytes), dtype=np.int64).reshape(n, n_perm)
        bands3 = mat.view(np.uint64).reshape(n, n_bands, rows)
        with np.errstate(over="ignore"):
            acc = np.zeros((n, n_bands), np.uint64)
            for j in range(rows):
                acc = acc * _P1 ^ bands3[:, :, j]
        band_hash = (avalanche64(acc) >> np.uint64(1)).astype(np.int64).ravel()
        return pd.DataFrame(
            {
                "band": np.tile(np.arange(n_bands, dtype=np.int32), n),
                "band_hash": band_hash,
                "doc_id": np.repeat(batch["doc_id"].to_numpy(), n_bands),
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # an empty bucket arrives as a COLUMNLESS frame (pandas blocks
        # drop the schema at zero rows) — guard before indexing
        if len(g) == 0 or "doc_id" not in g.columns:
            return pd.DataFrame(
                {"a": pd.Series(dtype=np.int64), "b": pd.Series(dtype=np.int64)}
            )
        ids = np.sort(g["doc_id"].unique())
        if len(ids) < 2:
            return pd.DataFrame(
                {"a": pd.Series(dtype=np.int64), "b": pd.Series(dtype=np.int64)}
            )
        ii, jj = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"a": ids[ii], "b": ids[jj]})

    from gridfia_ray.stages.dedup_util import (
        attach_pair_attrs,
        bucketed_candidate_pairs,
        bucketed_distinct,
    )

    from gridfia_ray.stages.worker_state import worker_cached

    # T6: the signature table feeds both the band explode and the final
    # verification re-join — materialize once (object store, spillable).
    # worker_cached task mode: coefficient tables build once per warm
    # worker, no actor-pool spin-up per pipeline.
    sigs = docs.map_batches(
        worker_cached(MinHasher, n_perm=n_perm, k_shingle=k_shingle, seed=seed),
        batch_format="pandas",
    ).materialize()

    pairs = bucketed_candidate_pairs(
        sigs.map_batches(explode_bands, batch_format="pandas"),
        ["band", "band_hash"],
        bucket_pairs,
    )
    pairs = bucketed_distinct(pairs, ["a", "b"], n_buckets=32)

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {"a": pd.Series(dtype=np.int64), "b": pd.Series(dtype=np.int64),
             "est_jaccard": pd.Series(dtype=np.float64)}
        )
        if len(batch) == 0:
            return out
        n = len(batch)
        mat_a = np.frombuffer(b"".join(batch["minhash_sig_a"]), np.int64).reshape(n, n_perm)
        mat_b = np.frombuffer(b"".join(batch["minhash_sig_b"]), np.int64).reshape(n, n_perm)
        est = (mat_a == mat_b).mean(axis=1)
        keep = est >= threshold
        return pd.DataFrame(
            {"a": batch["a"].to_numpy()[keep], "b": batch["b"].to_numpy()[keep],
             "est_jaccard": est[keep]}
        )

    return attach_pair_attrs(pairs, sigs, "doc_id", ["minhash_sig"]).map_batches(
        verify, batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


class SimHasher:
    """64-bit SimHash over token hashes (public Charikar construction),
    vectorized: one bit-vote ``add.reduceat`` per bit plane over the
    batch's flat token-hash array (round-1 perf item 6)."""

    def sim64_batch(self, texts: list[str]) -> np.ndarray:
        from gridfia_ray.text.hashing import simhash_from_tokens, token_hashes64

        th, counts = token_hashes64(texts)
        return simhash_from_tokens(th, counts)

    def sim64(self, text: str) -> int:
        return int(self.sim64_batch([text])[0])

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[["doc_id"]].copy()
        out["simhash"] = self.sim64_batch(batch["text"].fillna("").tolist())
        return out


def simhash_pairs(docs: rd.Dataset, max_hamming: int = 3, n_bands: int = 8) -> rd.Dataset:
    """Near-dup pairs by SimHash Hamming distance — exhaustive banding
    (same pigeonhole guarantee as tile phash)."""
    from gridfia_ray.text.hashing import check_exhaustive_banding, simhash_band_decompose

    check_exhaustive_banding(max_hamming, n_bands)
    simhash_band_decompose(np.empty(0, np.int64), n_bands)  # validate n_bands | 64 eagerly

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        sh = batch["simhash"].to_numpy()
        bands, vals = simhash_band_decompose(sh, n_bands)
        return pd.DataFrame(
            {
                "band": bands,
                "band_val": vals,
                "doc_id": np.tile(batch["doc_id"].to_numpy(), n_bands),
                "simhash": np.tile(sh, n_bands),
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0 or "doc_id" not in g.columns:
            return pd.DataFrame({"a": pd.Series(dtype=np.int64), "b": pd.Series(dtype=np.int64),
                                 "hamming": pd.Series(dtype=np.int64)})
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

    from gridfia_ray.stages.worker_state import worker_cached

    pairs = bucketed_candidate_pairs(
        docs.map_batches(worker_cached(SimHasher), batch_format="pandas").map_batches(
            explode, batch_format="pandas"
        ),
        ["band", "band_val"],
        bucket_pairs,
    )
    return bucketed_distinct(pairs, ["a", "b"], n_buckets=32)


class ShingleSets:
    """Per-doc sorted unique shingle-hash sets: (doc_id, n_shingles,
    set_bytes) — the side table for exact Jaccard verification.
    Stateful stage (k cached); all hashing vectorized."""

    def __init__(self, k: int = 3):
        self.k = k

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        from gridfia_ray.text.hashing import (
            shingle_hashes64,
            token_hashes64,
            unique_per_doc,
        )

        th, counts = token_hashes64(batch["text"].fillna("").tolist())
        sh, sc = shingle_hashes64(th, counts, self.k)
        u, uc = unique_per_doc(sh, sc)  # per-doc ascending order
        starts = np.concatenate([[0], np.cumsum(uc)[:-1]])
        out = batch[["doc_id"]].copy()
        out["n_shingles"] = uc.astype(np.int64)
        out["set_bytes"] = [
            u[starts[i] : starts[i] + uc[i]].tobytes() for i in range(len(out))
        ]
        return out


def ngram_jaccard_pairs(
    docs: rd.Dataset, k: int = 3, threshold: float = 0.5
) -> rd.Dataset:
    """EXACT n-gram Jaccard near-dup pairs (a < b, jaccard ≥ threshold),
    fully distributed — the keyed-re-join form of the verification the
    round-1 review asked for, upgraded to an exact operator:

    1. per-doc sorted unique shingle sets (one vectorized pass);
    2. *prefix filtering* (Bayardo/PPJoin, public): only the first
       ``n − ceil(t·n) + 1`` shingles of each doc (ascending hash
       order) enter the inverted index — any pair with jaccard ≥ t
       provably shares a prefix element, so candidates stay sparse;
    3. candidate pairs from the bucketed prefix index (ids only);
    4. full sets re-join onto the (rare) candidates via
       ``attach_pair_attrs``; exact intersection of the sorted arrays.

    Exactness caveat: shingles are compared by 64-bit hash; a cross-doc
    hash collision (P ≈ n²/2^64) could inflate an intersection count.
    Hot-shingle skew note: a shingle shared by f prefixes yields
    O(f²) candidates — the exact operator's inherent worst case; use
    ``minhash_lsh_pairs`` as the approximate scale path for degenerate
    corpora."""

    def prefix_rows(batch: pd.DataFrame) -> pd.DataFrame:
        n = batch["n_shingles"].to_numpy()
        p = np.where(n > 0, n - np.ceil(threshold * n).astype(np.int64) + 1, 0)
        ids = np.repeat(batch["doc_id"].to_numpy(), p)
        vals = np.empty(int(p.sum()), np.int64)
        pos = 0
        sets = batch["set_bytes"].tolist()
        for i in range(len(batch)):
            if p[i]:
                vals[pos : pos + p[i]] = np.frombuffer(sets[i], np.uint64)[: p[i]].view(
                    np.int64
                )
                pos += p[i]
        return pd.DataFrame({"shingle": vals, "doc_id": ids})

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # an empty bucket arrives as a COLUMNLESS frame (pandas blocks
        # drop the schema at zero rows) — guard before indexing
        if len(g) == 0 or "doc_id" not in g.columns:
            return pd.DataFrame(
                {"a": pd.Series(dtype=np.int64), "b": pd.Series(dtype=np.int64)}
            )
        ids = np.sort(g["doc_id"].unique())
        if len(ids) < 2:
            return pd.DataFrame(
                {"a": pd.Series(dtype=np.int64), "b": pd.Series(dtype=np.int64)}
            )
        ii, jj = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"a": ids[ii], "b": ids[jj]})

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        out = {"a": [], "b": [], "jaccard": []}
        for a, b, na, nb, sa, sb in zip(
            batch["a"], batch["b"], batch["n_shingles_a"], batch["n_shingles_b"],
            batch["set_bytes_a"], batch["set_bytes_b"],
        ):
            A = np.frombuffer(sa, np.uint64)
            B = np.frombuffer(sb, np.uint64)
            c = np.intersect1d(A, B, assume_unique=True).size
            union = int(na) + int(nb) - c
            jac = c / union if union else 1.0
            if jac >= threshold:
                out["a"].append(a)
                out["b"].append(b)
                out["jaccard"].append(jac)
        return pd.DataFrame(
            {"a": pd.Series(out["a"], dtype=np.int64),
             "b": pd.Series(out["b"], dtype=np.int64),
             "jaccard": pd.Series(out["jaccard"], dtype=np.float64)}
        )

    from gridfia_ray.stages.dedup_util import (
        attach_pair_attrs,
        bucketed_candidate_pairs,
        bucketed_distinct,
    )

    from gridfia_ray.stages.worker_state import worker_cached

    sets = docs.map_batches(
        worker_cached(ShingleSets, k=k), batch_format="pandas"
    ).materialize()  # feeds both the prefix index and the verify re-join
    pairs = bucketed_candidate_pairs(
        sets.map_batches(prefix_rows, batch_format="pandas"),
        ["shingle"],
        bucket_pairs,
    )
    pairs = bucketed_distinct(pairs, ["a", "b"], n_buckets=32)
    return attach_pair_attrs(
        pairs, sets, "doc_id", ["n_shingles", "set_bytes"]
    ).map_batches(verify, batch_format="pandas")


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


# ---------------------------------------------------------------------------
# cross-document paragraph dedup (boilerplate removal)
# ---------------------------------------------------------------------------


def paragraph_dedup(docs: rd.Dataset, n_buckets: int = 64) -> rd.Dataset:
    """Remove cross-document duplicate paragraphs, keeping each
    paragraph's FIRST occurrence (lexicographic (doc_id, idx)) — the
    C4/RefinedWeb-style boilerplate-removal pass. Returns (doc_id,
    text_clean); documents whose every paragraph was a duplicate of an
    earlier one disappear.

    Fully distributed, no broadcast of the duplicate set (at web scale
    the boilerplate vocabulary is itself huge): two bucketed exchanges,
    the paragraph text shipping once per (batch, hash) through the
    first —
      1. explode to (doc_id, idx, h=md5(para), para); keep-first per
         hash via ``bucketed_distinct`` (local pre-shuffle combiner +
         per-bucket vectorized winner pick);
      2. bucket survivors by doc_id; reassemble with the original
         paragraph order.
    NULL ``text`` rows are dropped (matching the SQL oracle, where
    ``string_split(NULL)`` yields no paragraph rows); empty strings are
    one empty paragraph on both sides."""

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        doc_ids, idxs, paras = [], [], []
        for doc_id, text in zip(batch["doc_id"], batch["text"]):
            if text is None or (isinstance(text, float) and np.isnan(text)):
                continue  # oracle semantics: NULL text -> no paragraphs
            ps = text.split("\n\n")
            doc_ids.extend([doc_id] * len(ps))
            idxs.extend(range(1, len(ps) + 1))
            paras.extend(ps)
        out = pd.DataFrame(
            {"doc_id": np.asarray(doc_ids, np.int64),
             "idx": np.asarray(idxs, np.int64),
             "para": paras}
        )
        out["h"] = _md5_64(out["para"].tolist())
        return out

    from gridfia_ray.stages.dedup_util import bucket_of, bucketed_distinct

    def bucket_by(col):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            batch = batch.copy()
            batch["__bucket"] = bucket_of(batch, [col], n_buckets)
            return batch

        return fn

    def reassemble(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["doc_id", "idx"], kind="mergesort")
        out = g.groupby("doc_id", as_index=False).agg(
            text_clean=("para", lambda ps: "\n\n".join(ps))
        )
        return out

    kept = bucketed_distinct(
        docs.map_batches(explode, batch_format="pandas"),
        ["h"],
        n_buckets=n_buckets,
        sort_cols=["doc_id", "idx"],
    )
    return (
        kept.map_batches(bucket_by("doc_id"), batch_format="pandas")
        .repartition(n_buckets)
        .groupby("__bucket")
        .map_groups(reassemble, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# duplicate-pair clustering (connected components → canonical docs)
# ---------------------------------------------------------------------------


def dup_clusters(pairs: rd.Dataset, max_driver_pairs: int = 5_000_000) -> pd.DataFrame:
    """Connected components over duplicate pairs → (doc_id, cluster_rep)
    for every doc in any pair; rep = min doc_id of the component (the
    canonical survivor a dedup policy keeps).

    Candidate pairs are rare by LSH/verification design, so the pair
    list folds on the driver (union-find, path compression) — the same
    provably-small-fold rule as the other pair consumers; the bound is
    enforced, not assumed. Beyond it, components need the iterative
    bucketed min-label propagation (O(log n) shuffle rounds) — raise
    rather than silently degrade."""
    # guard BEFORE the driver pull: materialize holds the pair set in
    # the (spillable, distributed) object store, count() is then
    # metadata-free, and a degenerate pair explosion raises cleanly
    # instead of OOM-killing the driver — without re-executing the
    # pair pipeline for the count
    pairs = pairs.materialize()
    n_pairs = pairs.count()
    if n_pairs > max_driver_pairs:
        raise ValueError(
            f"{n_pairs} pairs exceed max_driver_pairs={max_driver_pairs}; "
            "use dup_clusters_distributed for components at this scale"
        )
    df = pairs.to_pandas()
    if len(df) == 0:  # columnless at zero rows — nothing to cluster
        return pd.DataFrame(
            {"doc_id": pd.Series(dtype=np.int64),
             "cluster_rep": pd.Series(dtype=np.int64)}
        )
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(df["a"].astype(np.int64), df["b"].astype(np.int64)):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:  # union by min id → rep IS the min of the component
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    nodes = sorted(parent)
    return pd.DataFrame(
        {
            "doc_id": np.asarray(nodes, np.int64),
            "cluster_rep": np.asarray([find(n) for n in nodes], np.int64),
        }
    )


def dup_clusters_distributed(
    pairs: rd.Dataset, n_buckets: int = 64, max_iters: int = 50
) -> rd.Dataset:
    """Connected components WITHOUT a driver fold — iterative min-label
    propagation (the classic Pregel/hash-min algorithm): labels flow
    across edges each round, every node keeps the minimum seen,
    fixpoint when a round changes nothing. Rounds ≤ the longest
    min-label path (graph diameter); duplicate clusters are short
    chains in practice.

    Round structure (two exchanges, delta-driven):

    * labels initialize to ``min(node, neighbors)`` in the setup
      exchange — the first classic round for free;
    * messages route only from nodes whose label CHANGED last round
      (a stable label was already delivered the round it was set, so
      resending is pure waste — message volume decays with the frontier
      instead of staying O(E) every round);
    * the min-merge and the change detection are FUSED into one
      exchange: each bucket emits (node, new label, changed flag), the
      driver folds only the flag sum (one scalar per round).

    Use ``dup_clusters`` (bounded driver union-find) when the pair set
    is provably small; this is the beyond-bound path. Node ids must be
    non-negative (the sentinel ``dst = -1`` marks label rows inside the
    routing stream).
    """
    if max_iters < 1:
        # the for/else convergence raise below reads the last round's
        # change count — a zero-iteration run has nothing to report
        raise ValueError(f"max_iters must be >= 1, got {max_iters}")
    from gridfia_ray.stages.agg_util import bucketed_agg

    edges = pairs.map_batches(
        lambda b: pd.DataFrame(
            {
                "src": np.concatenate([b["a"].to_numpy(), b["b"].to_numpy()]),
                "dst": np.concatenate([b["b"].to_numpy(), b["a"].to_numpy()]),
            }
        ),
        batch_format="pandas",
    ).materialize()
    # size buckets to live rows: the loop pays ~n_buckets sort-partition
    # tasks per exchange per round, so 64 buckets on a 100-edge graph
    # multiplies pure overhead by the diameter (superstep-round-count
    # lesson); ~64 edge rows per bucket keeps tasks meaningful while
    # preserving the configured width for genuinely large graphs
    n_buckets = max(1, min(n_buckets, int(edges.count()) // 64 or 1))

    # init = min(node, neighbors): the edge row (src, dst) contributes
    # both candidates to src's label, so the setup exchange performs the
    # first classic propagation round for free
    labels = bucketed_agg(
        edges.map_batches(
            lambda b: pd.DataFrame(
                {
                    "node": np.concatenate(
                        [b["src"].to_numpy(np.int64)] * 2
                    ),
                    "rep": np.concatenate(
                        [b["src"].to_numpy(np.int64), b["dst"].to_numpy(np.int64)]
                    ),
                }
            ),
            batch_format="pandas",
        ),
        ["node"],
        {"rep": ("rep", "min")},
        n_buckets=n_buckets,
    ).materialize()
    changed_lab = labels  # round 1: every label is fresh

    from gridfia_ray.stages.dedup_util import bucket_of

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__bucket"] = bucket_of(b, ["node"], n_buckets)
        return b

    for _ in range(max_iters):
        # exchange 1: route last round's FRESH labels across edges —
        # a stable label was already delivered the round it was set.
        # Placeholder rep on edge rows keeps ONE block schema (mixed
        # schemas churn the executor cache and upcast rep to float64).
        msgs = edges.map_batches(
            lambda b: pd.DataFrame(
                {
                    "node": b["src"],
                    "dst": b["dst"],
                    "rep": np.zeros(len(b), np.int64),
                }
            ),
            batch_format="pandas",
        ).union(
            changed_lab.map_batches(
                lambda b: pd.DataFrame(
                    {"node": b["node"], "dst": -1, "rep": b["rep"]}
                ),
                batch_format="pandas",
            )
        )

        def propagate(group: pd.DataFrame) -> pd.DataFrame:
            lab = group.loc[group["dst"] == -1, ["node", "rep"]]
            edge = group.loc[group["dst"] != -1, ["node", "dst"]]
            fwd = edge.merge(lab, on="node")[["dst", "rep"]].rename(
                columns={"dst": "node"}
            )
            return fwd

        fwd = (
            msgs.map_batches(add_bucket, batch_format="pandas")
            .repartition(n_buckets)
            .groupby("__bucket")
            .map_groups(propagate, batch_format="pandas")
        )

        # exchange 2, FUSED min-merge + change detection: messages and
        # current labels co-bucket on node; each bucket emits the new
        # label and a changed flag, so convergence costs one scalar
        # fold, not a third exchange
        cand = fwd.map_batches(
            lambda b: pd.DataFrame(
                {"node": b["node"], "rep": b["rep"], "is_old": np.zeros(len(b), np.int64)}
            ),
            batch_format="pandas",
        ).union(
            labels.map_batches(
                lambda b: pd.DataFrame(
                    {"node": b["node"], "rep": b["rep"], "is_old": np.ones(len(b), np.int64)}
                ),
                batch_format="pandas",
            )
        )

        def min_change(group: pd.DataFrame) -> pd.DataFrame:
            g = group
            old_rep = np.where(g["is_old"].to_numpy() == 1, g["rep"].to_numpy(), np.iinfo(np.int64).max)
            per = pd.DataFrame(
                {"node": g["node"].to_numpy(), "new": g["rep"].to_numpy(), "old": old_rep}
            ).groupby("node", as_index=False).min()
            # every message targets an edge endpoint, and every endpoint
            # has a label row — a missing old label is a routing bug
            if (per["old"] == np.iinfo(np.int64).max).any():
                raise AssertionError("message for a node with no label row")
            return pd.DataFrame(
                {
                    "node": per["node"].astype(np.int64),
                    "rep": per["new"].astype(np.int64),
                    "chg": (per["new"] < per["old"]).astype(np.int64),
                }
            )

        out = (
            cand.map_batches(add_bucket, batch_format="pandas")
            .repartition(n_buckets)
            .groupby("__bucket")
            .map_groups(min_change, batch_format="pandas")
            .materialize()
        )
        changed = int(out.sum("chg") or 0)
        labels = out.map_batches(
            lambda b: pd.DataFrame({"node": b["node"], "rep": b["rep"]}),
            batch_format="pandas",
        )
        if changed == 0:
            break
        changed_lab = out.map_batches(
            lambda b: b.loc[b["chg"] == 1, ["node", "rep"]],
            batch_format="pandas",
        )
    else:
        # the module rule is raise-rather-than-silently-degrade
        # (dup_clusters does the same for its pair bound): labels that
        # never reached fixpoint are WRONG component ids, not an
        # approximation worth returning
        raise RuntimeError(
            f"label propagation did not converge in {max_iters} iterations "
            f"({changed} labels still changing) — the duplicate graph has "
            f"diameter > {max_iters}; raise max_iters"
        )
    return labels.map_batches(
        lambda b: pd.DataFrame(
            {"doc_id": b["node"].astype(np.int64), "cluster_rep": b["rep"].astype(np.int64)}
        ),
        batch_format="pandas",
    )


def canonical_dedup_docs(
    docs: rd.Dataset,
    k: int = 3,
    threshold: float = 0.5,
    quality_col: str = "n_chars",
) -> rd.Dataset:
    """Near-dup dedup with CANONICAL SELECTION: cluster the exact
    n-gram Jaccard pairs, then keep exactly ONE representative per
    cluster — the highest-quality doc (``quality_col`` desc, doc_id
    asc) — plus every unclustered doc. The corpus-cleaning policy real
    pipelines run: unlike "keep min doc_id", the survivor is the BEST
    duplicate, not the first.

    Shape: the (doc_id → cluster) map is bounded by the dup closure
    (``dup_clusters`` counts before it pulls) and broadcasts; the
    winner pick packs (quality, −doc_id) into one int64 so it folds as
    a plain per-cluster MAX combiner; the final keep filter is a pure
    map. Quality and ids must fit 31 bits each (checked) for the
    lexicographic packing to be exact."""
    import ray

    from gridfia_ray.stages.agg_util import bucketed_agg

    pairs = ngram_jaccard_pairs(docs, k=k, threshold=threshold)
    clus = dup_clusters(pairs)
    if len(clus) == 0:
        return docs
    rep_of = dict(zip(clus["doc_id"].astype(np.int64), clus["cluster_rep"].astype(np.int64)))
    rep_ref = ray.put(rep_of)
    _LIM = 1 << 31

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(rep_ref)
        ids = batch["doc_id"].to_numpy(np.int64)
        q = batch[quality_col].to_numpy(np.int64)
        rep = np.array([m.get(int(i), -1) for i in ids], dtype=np.int64)
        sel = rep >= 0
        if not sel.any():
            return pd.DataFrame(
                {"rep": pd.Series(dtype=np.int64),
                 "packed": pd.Series(dtype=np.int64)}
            )
        if (q[sel] >= _LIM).any() or (q[sel] < 0).any() or (ids[sel] >= _LIM).any():
            raise ValueError(
                "canonical_dedup_docs: quality/doc_id outside [0, 2^31) — "
                "the lexicographic int64 packing would be inexact"
            )
        packed = q[sel] * _LIM + (_LIM - 1 - ids[sel])
        return pd.DataFrame({"rep": rep[sel], "packed": packed})

    best = bucketed_agg(
        docs.map_batches(partial, batch_format="pandas"),
        ["rep"],
        {"packed": ("packed", "max")},
        n_buckets=8,
    ).to_pandas()  # one row per cluster — same bound as the cluster map
    winners = set(
        (_LIM - 1 - (best["packed"].to_numpy(np.int64) % _LIM)).tolist()
    )
    win_ref = ray.put(winners)

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(rep_ref)
        w = ray.get(win_ref)
        ids = batch["doc_id"].to_numpy(np.int64)
        mask = np.array(
            [int(i) not in m or int(i) in w for i in ids], dtype=bool
        )
        return batch.loc[mask]

    return docs.map_batches(keep, batch_format="pandas")
