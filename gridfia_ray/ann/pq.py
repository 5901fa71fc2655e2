"""Product quantization + asymmetric distance computation (ADC) —
Jégou, Douze & Schmid, "Product quantization for nearest neighbor
search", TPAMI 2011. THE memory-scale path for ANN: each unit vector
compresses to ``m`` bytes (one codebook index per subspace), so a
10^12-vector corpus fits in m TB instead of 4·d TB, and search never
touches the original vectors — per query, one m×256 inner-product
table, then each candidate scores as m table lookups.

Ray-Data shape mirrors the IVF module: codebooks train ON THE DRIVER
over the deterministic hash-sampled pool (cost scales with the sample,
not the corpus), encoding is a pure ``map_batches`` (no shuffle), and
search is the standard partial-top-k combiner → tiny per-query merge.
Everything downstream of the seeded training is a pure function of the
input values, so results are bit-deterministic across partitionings
(pinned in tests and the driver contract).

Accuracy: with unit vectors, cosine(q, x) ≈ q·x̂ = Σ_s q_s · c_{s,
code_s(x)}; reconstruction error falls as m grows (recall@k measured
against the exact scan in tests). No analog in the reference;
brief-driven ANN scale operator.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from gridfia_ray.ann.ivf import _sample_pool
from gridfia_ray.ann.search import _as_matrix, _normalize


def _l2_kmeanspp(sub: np.ndarray, k: int, rng: np.random.RandomState) -> np.ndarray:
    """k-means++ seeding under L2 on a subspace pool (subvectors of
    unit vectors are NOT unit — cosine seeding would be wrong here)."""
    n = len(sub)
    centroids = np.empty((k, sub.shape[1]))
    centroids[0] = sub[rng.randint(n)]
    d2 = ((sub - centroids[0]) ** 2).sum(axis=1)
    for i in range(1, k):
        tot = d2.sum()
        p = d2 / tot if tot > 0 else np.full(n, 1.0 / n)
        centroids[i] = sub[rng.choice(n, p=p)]
        d2 = np.minimum(d2, ((sub - centroids[i]) ** 2).sum(axis=1))
    return centroids


def train_pq(
    embeddings: rd.Dataset,
    m: int = 8,
    *,
    n_codes: int = 256,
    sample_size: int = 8192,
    n_iters: int = 10,
    seed: int = 1234,
) -> np.ndarray:
    """Train the (m, n_codes, d/m) codebook tensor on the deterministic
    hash-sampled pool (same sampling as IVF training — partition-
    invariant, cost independent of corpus size). Vectors are unit-
    normalized first (the cosine convention of this ANN family)."""
    if not 1 <= n_codes <= 256:
        raise ValueError(f"n_codes must be in [1, 256], got {n_codes}")
    pool = _normalize(_sample_pool(embeddings, sample_size))
    return train_books_from_pool(
        pool, m, n_codes=n_codes, n_iters=n_iters, seed=seed
    )


def train_books_from_pool(
    pool: np.ndarray, m: int, *, n_codes: int = 256, n_iters: int = 10,
    seed: int = 1234,
) -> np.ndarray:
    """The driver-side training body, shared verbatim with the pinned
    sequential replay: single-threaded numpy over the (already unit-
    normalized) pool, so given the same pool both paths produce
    bit-identical codebooks."""
    d = pool.shape[1]
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    if len(pool) < n_codes:
        raise ValueError(
            f"sample pool ({len(pool)}) smaller than the codebook ({n_codes})"
        )
    rng = np.random.RandomState(seed)
    books = np.empty((m, n_codes, dsub))
    for s in range(m):
        sub = pool[:, s * dsub : (s + 1) * dsub]
        c = _l2_kmeanspp(sub, n_codes, rng)
        for _ in range(n_iters):
            # Lloyd under L2 on the pool only; argmin via the expanded
            # form (||x||² constant per row) — one GEMM instead of an
            # n×k×d broadcast allocation per iteration
            d2 = -2.0 * (sub @ c.T) + (c**2).sum(axis=1)[None, :]
            assign = np.argmin(d2, axis=1)
            for j in range(n_codes):
                mask = assign == j
                if mask.any():
                    c[j] = sub[mask].mean(axis=0)
        books[s] = c
    return books


def _encode_matrix(vecs: np.ndarray, books: np.ndarray) -> np.ndarray:
    """Unit-normalized vectors → (n, m) uint8 codes (nearest subspace
    centroid under L2; deterministic argmin tie-break)."""
    m, n_codes, dsub = books.shape
    codes = np.empty((len(vecs), m), dtype=np.uint8)
    for s in range(m):
        sub = vecs[:, s * dsub : (s + 1) * dsub]
        # ||x - c||² = ||x||² - 2 x·c + ||c||²; ||x||² constant per row
        d2 = -2.0 * (sub @ books[s].T) + (books[s] ** 2).sum(axis=1)[None, :]
        codes[:, s] = np.argmin(d2, axis=1).astype(np.uint8)
    return codes


class PqEncoder:
    """Actor-pool stage: (vec_id, embedding) → (vec_id, codes bytes)."""

    def __init__(self, books: np.ndarray):
        self.books = np.asarray(books, dtype=np.float64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = _normalize(_as_matrix(batch["embedding"]))
        codes = _encode_matrix(vecs, self.books)
        return pa.table(
            {
                "vec_id": batch["vec_id"],
                "codes": pa.array([c.tobytes() for c in codes], pa.binary()),
            }
        )


def pq_encode(embeddings: rd.Dataset, books: np.ndarray) -> rd.Dataset:
    """Pure-map encoding: m bytes per vector, no shuffle."""
    from gridfia_ray.stages.worker_state import worker_cached

    return embeddings.map_batches(
        worker_cached(PqEncoder, books=books),
        batch_format="pyarrow",
        batch_size=4096,
        num_cpus=1,
    )


class _AdcTopK:
    """Per-batch ADC scorer: one (m, 256) inner-product table per query
    (built once per actor), then each candidate scores as m lookups —
    fully vectorized as fancy-indexed column sums."""

    def __init__(self, books: np.ndarray, queries: np.ndarray, query_ids: list, k: int):
        books = np.asarray(books, dtype=np.float64)
        q = _normalize(np.asarray(queries, dtype=np.float64))
        m, n_codes, dsub = books.shape
        self.m = m
        self.query_ids = list(query_ids)
        self.k = int(k)
        # tables[qi][s, j] = q_s · c_{s,j}; built ONE QUERY AT A TIME
        # with the exact einsum call shape of the pinned sequential
        # replay — a batched contraction may pick a different reduction
        # path and drift in the last ULP
        self.tables = np.stack(
            [
                np.einsum("sd,sjd->sj", q[i].reshape(m, dsub), books)
                for i in range(len(q))
            ]
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy()
        codes = np.frombuffer(
            b"".join(batch["codes"].to_pylist()), dtype=np.uint8
        ).reshape(len(ids), self.m)
        out_q, out_v, out_s = [], [], []
        k = min(self.k, len(ids))
        cols = np.arange(self.m)
        for qi, qid in enumerate(self.query_ids):
            scores = self.tables[qi][cols[None, :], codes].sum(axis=1)
            sel = (
                np.argpartition(-scores, k - 1)[:k] if k < len(ids) else np.arange(len(ids))
            )
            out_q.extend([qid] * len(sel))
            out_v.extend(ids[sel].tolist())
            out_s.extend(scores[sel].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "adc_score": pa.array(out_s, pa.float64()),
            }
        )


def pq_topk_cosine(
    codes: rd.Dataset,
    books: np.ndarray,
    queries: np.ndarray,
    query_ids: list,
    k: int = 10,
) -> rd.Dataset:
    """Approximate top-k by ADC over the coded corpus. Deterministic
    tie-break (score desc, vec_id asc); the merge sees only the
    per-block top-k partials."""
    from gridfia_ray.stages.worker_state import worker_cached

    partials = codes.map_batches(
        worker_cached(_AdcTopK, books=books, queries=queries, query_ids=query_ids, k=k),
        batch_format="pyarrow",
        batch_size=8192,
        num_cpus=1,
    )

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["adc_score", "vec_id"], ascending=[False, True], kind="mergesort"
        ).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return partials.groupby("query_id").map_groups(final_topk, batch_format="pandas")


def pq_topk_refined(
    embeddings: rd.Dataset,
    codes: rd.Dataset,
    books: np.ndarray,
    queries: np.ndarray,
    query_ids: list,
    k: int = 10,
    refine: int = 200,
) -> rd.Dataset:
    """The standard two-stage PQ search (Jégou et al. §V): ADC selects
    ``refine`` candidates per query from the coded corpus, then an
    exact cosine re-rank over just those candidates (a broadcast-id
    semi-join — refine × n_queries ids, never the corpus) returns the
    final top-k. Fixes ADC's rank shuffling among near-ties while still
    never scanning full vectors for more than ``refine`` rows/query."""
    from gridfia_ray.ann.search import topk_cosine

    cand = pq_topk_cosine(codes, books, queries, query_ids, k=refine).to_pandas()
    cand_ids = np.unique(cand["vec_id"].to_numpy())  # small by construction

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy()
        m = np.isin(ids, cand_ids)
        return batch.filter(pa.array(m))

    sub = embeddings.map_batches(keep, batch_format="pyarrow")
    return topk_cosine(sub, queries, query_ids, k=k)
