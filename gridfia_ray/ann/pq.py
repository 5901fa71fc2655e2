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
    if not 1 <= n_codes <= 256:
        # codes are uint8 — a larger book would silently wrap indices
        raise ValueError(f"n_codes must be in [1, 256], got {n_codes}")
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


def _adc_final_topk(k: int):
    """The per-query merge shared by every ADC search variant — one
    definition so the tie-break (score desc, vec_id asc) can never
    drift between the flat and the IVF-probed paths."""

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["adc_score", "vec_id"], ascending=[False, True], kind="mergesort"
        ).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return final_topk


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
    return partials.groupby("query_id").map_groups(
        _adc_final_topk(k), batch_format="pandas"
    )


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
    cand = pq_topk_cosine(codes, books, queries, query_ids, k=refine).to_pandas()
    return _exact_rerank(embeddings, cand["vec_id"].to_numpy(), queries, query_ids, k)


def _exact_rerank(
    embeddings: rd.Dataset,
    cand_vec_ids: np.ndarray,
    queries: np.ndarray,
    query_ids: list,
    k: int,
) -> rd.Dataset:
    """Exact cosine top-k over just the shortlisted ids: a broadcast-id
    semi-join on the embeddings table (cand ids are refine × n_queries,
    never the corpus), shared by both two-stage searches."""
    from gridfia_ray.ann.search import topk_cosine

    cand_ids = np.unique(cand_vec_ids)  # small by construction

    def keep(batch: pa.Table) -> pa.Table:
        m = np.isin(batch["vec_id"].to_numpy(), cand_ids)
        return batch.filter(pa.array(m))

    sub = embeddings.map_batches(keep, batch_format="pyarrow")
    return topk_cosine(sub, queries, query_ids, k=k)


# ---------------------------------------------------------------------------
# IVF-PQ: coarse cells + PQ codes inside — the classic big-ANN index
# ---------------------------------------------------------------------------


class _IvfPqEncoder:
    """Fused build stage — (vec_id, embedding) → (vec_id, codes,
    ivf_cell, cell_copy) in ONE pass: the corpus is normalized once and
    both the coarse assignment (same argmax expression as
    ivf.assign_cells — ties to the lowest cell id) and the PQ encode
    read that one matrix. cell_copy duplicates the hive partition key
    as a data column for the readers (the IVF store convention)."""

    def __init__(self, centroids: np.ndarray, books: np.ndarray):
        self.centroids = np.asarray(centroids, dtype=np.float64)
        self.books = np.asarray(books, dtype=np.float64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = _normalize(_as_matrix(batch["embedding"]))
        cell = np.argmax(vecs @ self.centroids.T, axis=1).astype(np.int32)
        codes = _encode_matrix(vecs, self.books)
        cell_arr = pa.array(cell)
        return pa.table(
            {
                "vec_id": batch["vec_id"],
                "codes": pa.array([c.tobytes() for c in codes], pa.binary()),
                "ivf_cell": cell_arr,
                "cell_copy": cell_arr,
            }
        )


def build_ivfpq_index(
    embeddings: rd.Dataset,
    out_dir: str,
    k_cells: int,
    m: int = 8,
    *,
    n_iters: int = 20,
    seed: int = 42,
    pq_sample_size: int = 8192,
    pq_seed: int = 1234,
) -> None:
    """IVF-PQ (Jégou et al. §VI / the FAISS IVFPQ layout): a coarse
    k-means quantizer partitions the corpus into cells, and each cell
    stores only m-byte PQ codes — a probed search reads nprobe/k of an
    already-32×-compressed store and never touches a full vector. This
    variant codes the RAW vectors (not residuals): simpler, and the
    exact re-rank (:func:`pq_topk_refined`) is the accuracy escape
    hatch either way.

    Layout mirrors the IVF store (hive ``cells/ivf_cell=<c>/``,
    ``centroids.parquet``, plus ``books.parquet`` and ``meta.json``) so
    runs are resumable per cell and appends land as new part files."""
    import json
    import os

    import pyarrow.parquet as pqt

    from gridfia_ray.ann.ivf import kmeans_fit
    from gridfia_ray.stages.worker_state import worker_cached

    centroids = kmeans_fit(
        embeddings, k_cells, n_iters=n_iters, seed=seed,
        train_size=max(4096, 256 * k_cells),
    )
    books = train_pq(embeddings, m, sample_size=pq_sample_size, seed=pq_seed)
    enc = embeddings.map_batches(
        worker_cached(_IvfPqEncoder, centroids=centroids, books=books),
        batch_format="pyarrow",
        batch_size=4096,
        num_cpus=1,
    )
    n_sort_blocks = max(4, min(64, k_cells))
    os.makedirs(out_dir, exist_ok=True)
    enc.repartition(n_sort_blocks).sort("ivf_cell").write_parquet(
        os.path.join(out_dir, "cells"), partition_cols=["ivf_cell"]
    )
    pqt.write_table(
        pa.table(
            {
                "cell": pa.array(np.arange(len(centroids), dtype=np.int32)),
                "centroid": pa.array(list(centroids), pa.list_(pa.float64())),
            }
        ),
        os.path.join(out_dir, "centroids.parquet"),
    )
    mm, n_codes, dsub = books.shape
    pqt.write_table(
        pa.table(
            {
                "subspace": pa.array(
                    np.repeat(np.arange(mm, dtype=np.int32), n_codes)
                ),
                "code": pa.array(np.tile(np.arange(n_codes, dtype=np.int32), mm)),
                "centroid": pa.array(
                    list(books.reshape(mm * n_codes, dsub)), pa.list_(pa.float64())
                ),
            }
        ),
        os.path.join(out_dir, "books.parquet"),
    )
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(
            {"k_cells": int(k_cells), "m": int(mm), "n_codes": int(n_codes),
             "dsub": int(dsub)},
            f,
        )


def load_ivfpq(index_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """(centroids (k, d), books (m, n_codes, dsub)) from the store."""
    import json
    import os

    import pyarrow.parquet as pqt

    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    ct = pqt.read_table(os.path.join(index_dir, "centroids.parquet")).sort_by("cell")
    centroids = np.stack([np.asarray(v, np.float64) for v in ct["centroid"].to_pylist()])
    bt = pqt.read_table(os.path.join(index_dir, "books.parquet")).sort_by(
        [("subspace", "ascending"), ("code", "ascending")]
    )
    books = np.stack(
        [np.asarray(v, np.float64) for v in bt["centroid"].to_pylist()]
    ).reshape(meta["m"], meta["n_codes"], meta["dsub"])
    return centroids, books


class _ProbedAdcTopK(_AdcTopK):
    """ADC scorer that only scores each query against rows of the
    cells it probes (the per-cell restriction is the IVF contract)."""

    def __init__(self, books, queries, query_ids, probes, k):
        super().__init__(books, queries, query_ids, k)
        self.probes = [np.asarray(row, dtype=np.int64) for row in probes]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy()
        cells = batch["cell_copy"].to_numpy()
        codes = np.frombuffer(
            b"".join(batch["codes"].to_pylist()), dtype=np.uint8
        ).reshape(len(ids), self.m)
        out_q, out_v, out_s = [], [], []
        cols = np.arange(self.m)
        for qi, qid in enumerate(self.query_ids):
            mask = np.isin(cells, self.probes[qi])
            if not mask.any():
                continue
            sub_ids = ids[mask]
            scores = self.tables[qi][cols[None, :], codes[mask]].sum(axis=1)
            kk = min(self.k, len(sub_ids))
            sel = (
                np.argpartition(-scores, kk - 1)[:kk]
                if kk < len(sub_ids)
                else np.arange(len(sub_ids))
            )
            out_q.extend([qid] * len(sel))
            out_v.extend(sub_ids[sel].tolist())
            out_s.extend(scores[sel].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "adc_score": pa.array(out_s, pa.float64()),
            }
        )


def search_ivfpq_index(
    index_dir: str,
    queries: np.ndarray,
    query_ids: list,
    *,
    k: int = 10,
    nprobe: int = 4,
) -> tuple[rd.Dataset, list[str]]:
    """Probed ADC search over an IVF-PQ store: reads ONLY the probed
    cell partitions (file-level pruning) of the 32×-compressed store.
    Returns (result, probed_dirs)."""
    import os

    from gridfia_ray.ann.ivf import _probe_cells
    from gridfia_ray.stages.worker_state import worker_cached

    centroids, books = load_ivfpq(index_dir)
    probes = _probe_cells(centroids, queries, nprobe)
    cells = sorted({int(c) for row in probes for c in row})
    dirs = [
        d
        for c in cells
        if os.path.isdir(d := os.path.join(index_dir, "cells", f"ivf_cell={c}"))
    ]
    files = [
        os.path.join(d, f)
        for d in dirs
        for f in sorted(os.listdir(d))
        if f.endswith(".parquet")
    ]
    if not files:
        empty = pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "adc_score": pa.array([], pa.float64()),
                "rank": pa.array([], pa.int64()),
            }
        )
        return rd.from_arrow(empty), dirs

    def drop_hive(b: pa.Table) -> pa.Table:
        if "ivf_cell" in b.column_names:
            b = b.drop_columns(["ivf_cell"])
        return b

    ds = rd.read_parquet(files).map_batches(drop_hive, batch_format="pyarrow")
    partials = ds.map_batches(
        worker_cached(
            _ProbedAdcTopK, books=books, queries=queries, query_ids=query_ids,
            probes=probes, k=k,
        ),
        batch_format="pyarrow",
        batch_size=8192,
        num_cpus=1,
    )
    out = partials.groupby("query_id").map_groups(
        _adc_final_topk(k), batch_format="pandas"
    )
    return out, dirs


def search_ivfpq_refined(
    index_dir: str,
    embeddings: rd.Dataset,
    queries: np.ndarray,
    query_ids: list,
    *,
    k: int = 10,
    nprobe: int = 4,
    refine: int = 200,
) -> rd.Dataset:
    """Two-stage IVF-PQ search: the probed ADC scan shortlists
    ``refine`` candidates per query from the compressed store, then an
    exact cosine re-rank over just those ids (broadcast-id semi-join on
    the embeddings table) returns the final top-k — the full
    IVFADC+R recipe. Exact vectors are read for at most
    refine × n_queries rows regardless of corpus size."""
    cand, _ = search_ivfpq_index(
        index_dir, queries, query_ids, k=refine, nprobe=nprobe
    )
    return _exact_rerank(
        embeddings, cand.to_pandas()["vec_id"].to_numpy(), queries, query_ids, k
    )
