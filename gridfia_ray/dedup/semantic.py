"""Semantic (embedding-space) deduplication — the SemDeDup construction
(Abbas et al. 2023, arXiv:2303.09540): cluster the embedding column with
k-means, then inside every cluster drop any vector whose cosine
similarity to an earlier-ordered vector exceeds ``eps``.

Why this shape scales: the O(n²) pairwise comparison is confined to one
cluster at a time — k is chosen so n/k vectors fit a worker — and the
cluster step reuses the engine's distributed spherical k-means
(``ann/ivf.kmeans_fit``: combiner-shaped Lloyd passes, no vector ever
shuffles). The per-cluster prune is one ``groupby(cell).map_groups``
— Ray Data's standard co-location exchange — with the pairwise matmul
chunked so memory stays O(chunk × cluster), not O(cluster²).

Determinism: vectors are ordered by (similarity-to-centroid ascending,
id) — SemDeDup's keep-the-farthest-from-centroid rule with an id
tiebreak — and a vector is dropped iff ANY earlier vector is within
``eps``. Ordering and verdicts depend only on values, never on
partitioning (kmeans_fit is partition-invariant by centroid rounding).

No analog in the reference (gridfia is a raster engine); brief-driven
LLM-training-data operator.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from gridfia_ray.ann.ivf import assign_cells, kmeans_fit
from gridfia_ray.ann.search import _as_matrix, _normalize


def _prune_cluster(
    vn: np.ndarray, order: np.ndarray, eps: float, chunk: int = 1024
) -> np.ndarray:
    """Boolean keep-mask over rows of ``vn`` (unit-norm, already in
    dedup order): row i survives iff max cosine to rows 0..i-1 < eps.
    Chunked upper-triangular scan — peak memory O(chunk × n)."""
    n = vn.shape[0]
    keep = np.ones(n, dtype=bool)
    v = vn[order]
    for s in range(1, n, chunk):
        e = min(s + chunk, n)
        # sims of rows s..e-1 against ALL earlier rows 0..e-2
        sims = v[s:e] @ v[:e].T
        # mask j >= i (self and later rows)
        cols = np.arange(e)
        rows = np.arange(s, e)
        sims[cols[None, :] >= rows[:, None]] = -np.inf
        keep[s:e] = sims.max(axis=1) < eps
    out = np.ones(n, dtype=bool)
    out[order] = keep
    return out


def semantic_dedup(
    embeddings: rd.Dataset,
    *,
    k: int = 64,
    eps: float = 0.95,
    n_iters: int = 10,
    seed: int = 42,
    max_cluster: int = 100_000,
    id_col: str = "vec_id",
    train_size: int | None = None,
) -> rd.Dataset:
    """SemDeDup over the ``embedding`` column → (id, cluster, keep).

    ``k`` bounds per-cluster work: pick it so corpus_size / k vectors
    (× d floats) fit one worker — at 10^12 vectors that means k in the
    millions, at which point route the driver-side centroid fold in
    ``kmeans_fit`` through a groupby first (documented there). A
    cluster larger than ``max_cluster`` raises rather than silently
    OOMing the worker — raise ``k`` (or ``max_cluster``, knowingly).
    """
    if not 0.0 < eps <= 1.0:
        raise ValueError(f"eps must be in (0, 1], got {eps}")
    import ray

    if id_col != "vec_id":
        # kmeans_fit's contract (and its partition-invariant sample
        # pool) is keyed on a literal 'vec_id' column — present one
        names = embeddings.schema().names
        if id_col not in names:
            raise ValueError(f"id_col {id_col!r} not in input columns {names}")
        if "vec_id" in names:
            raise ValueError(
                f"input already has a 'vec_id' column alongside id_col="
                f"{id_col!r}; drop or rename one"
            )
        orig = id_col

        def to_vec_id(b: pd.DataFrame) -> pd.DataFrame:
            return b.rename(columns={orig: "vec_id"})

        embeddings = embeddings.map_batches(to_vec_id, batch_format="pandas")

    # train_size: pass e.g. 256·k to train the clustering on a
    # deterministic hash sample (ivf.kmeans_fit) — at 10^12 vectors the
    # Lloyd passes must not stream the corpus; the assign pass still does
    centroids = kmeans_fit(
        embeddings, k, n_iters=n_iters, seed=seed, train_size=train_size
    )
    assigned = assign_cells(embeddings, centroids)
    cen_ref = ray.put(centroids)  # ship k×d once, not per task closure

    def prune(group: pd.DataFrame) -> pd.DataFrame:
        centroids = ray.get(cen_ref)
        if len(group) > max_cluster:
            raise ValueError(
                f"semantic_dedup cluster {int(group['ivf_cell'].iloc[0])} has "
                f"{len(group)} vectors > max_cluster={max_cluster}; increase k"
            )
        vn = _normalize(_as_matrix(group["embedding"]))
        cell = int(group["ivf_cell"].iloc[0])
        cen = _normalize(centroids[cell][None, :])[0]
        ids = group["vec_id"].to_numpy()
        sim_c = vn @ cen
        # SemDeDup order: farthest-from-centroid first (ascending sim),
        # id as the deterministic tiebreak
        order = np.lexsort((ids, sim_c))
        keep = _prune_cluster(vn, order, eps)
        return pd.DataFrame(
            {
                id_col: ids,
                "cluster": np.full(len(group), cell, np.int32),
                "keep": keep,
            }
        )

    return assigned.groupby("ivf_cell").map_groups(prune, batch_format="pandas")
