"""Embedding plane: ANN (brute/LSH/IVF/PQ), kNN graphs, semantic
dedup, PCA, k-center coresets, Gram matrices.

Split out of the former monolithic ``gridfia_ray/contract.py`` (round-5
VERDICT #3); see ``gridfia_ray/contract/__init__.py`` for the package
map. Query/oracle semantics are unchanged.
"""

from __future__ import annotations

import os
from typing import Callable

import numpy as np
import pandas as pd

from gridfia_ray import fixtures
from gridfia_ray.io import read_parquet_clean
from gridfia_ray.kernels.base import KernelContext
from gridfia_ray.kernels.registry import registry
from gridfia_ray.pipelines.common import GridSpec
from gridfia_ray.contract._shared import *  # noqa: F401,F403


def q_emb_near_dup(sf_dir: str) -> pd.DataFrame:
    """Embedding-cosine near-dup pairs (SRP candidates + exact verify).
    The sf embeddings are random → typically empty; recall behavior is
    pinned with planted duplicates in tests/test_ann.py."""
    from gridfia_ray.ann.search import embedding_near_dup_pairs

    out = embedding_near_dup_pairs(_embeddings(sf_dir), threshold=0.95).to_pandas()
    if len(out) == 0:
        return pd.DataFrame({"a": pd.Series(dtype=np.int64), "b": pd.Series(dtype=np.int64)})
    return out[["a", "b"]].astype(np.int64).sort_values(["a", "b"]).reset_index(drop=True)

def q_emb_gram(sf_dir: str) -> pd.DataFrame:
    """Distributed PCA sufficient statistics: the exact int64 d×d
    second-moment (Gram) matrix of the quantized embeddings — each
    batch ships a d² partial (bytes, never vectors), one tiny bucketed
    sum merges them (analysis/pca.gram_matrix_int). Bit-exact vs the
    DuckDB unnest-lockstep self-join doing the identical quantization.
    The centered eigensolve riding on these statistics is pytest-oracled
    vs numpy (tests/test_pca.py)."""
    from gridfia_ray.analysis.pca import gram_matrix_int

    out = (
        gram_matrix_int(_embeddings(sf_dir), "embedding", scale=1000, n_buckets=8)
        .to_pandas()
        .astype({"i": np.int64, "j": np.int64, "dot": np.int64})
    )
    return out.sort_values(["i", "j"]).reset_index(drop=True)

def q_emb_pca_pinned(sf_dir: str) -> pd.DataFrame:
    """Centered PCA fit (one-pass distributed moment statistics →
    driver eigensolve with pinned component signs) + stateless
    projection, vs the pinned sequential replay over the planted
    anisotropic corpus. Moments are int64-exact (partition-order-free);
    projections compare in µ-units — per-batch vs full-matrix GEMMs may
    differ in the last float bit (the repo's s6 convention)."""
    import ray.data as rd

    from gridfia_ray import oracle_pins
    from gridfia_ray.analysis.pca import pca_fit, pca_project
    from gridfia_ray.context import tune_context

    tune_context()
    pin = oracle_pins.ensure_pcapin()
    emb = rd.read_parquet(pin["embeddings"])
    model = pca_fit(
        emb, k=oracle_pins.PCA_PIN_K, scale=oracle_pins.PCA_PIN_SCALE, n_buckets=4
    )
    proj = pca_project(emb, model).to_pandas()
    k = oracle_pins.PCA_PIN_K
    ids = np.repeat(proj["vec_id"].to_numpy(np.int64), k)
    pcs = np.tile(np.arange(k, dtype=np.int64), len(proj))
    vals = np.floor(
        np.stack(proj["pc"].to_numpy()).ravel() * 1_000_000 + 0.5
    ).astype(np.int64)
    out = pd.DataFrame({"vec_id": ids, "pc_idx": pcs, "val_u": vals})
    return out.sort_values(["vec_id", "pc_idx"], ignore_index=True)

def q_emb_semantic_dedup(sf_dir: str) -> pd.DataFrame:
    """SemDeDup (cluster-then-prune) over the embeddings table: per
    vector its k-means cluster and keep verdict. k-means is not
    SQL-expressible → rows-only here; the exact rule is oracled against
    a single-process brute force (and partition-invariance pinned) in
    tests/test_semantic_dedup.py."""
    from gridfia_ray.dedup.semantic import semantic_dedup

    out = semantic_dedup(
        _embeddings(sf_dir), k=16, eps=0.95, n_iters=8, seed=42
    ).to_pandas()
    return pd.DataFrame(
        {
            "vec_id": out["vec_id"].astype(np.int64),
            "cluster": out["cluster"].astype(np.int64),
            "keep": out["keep"].astype(np.int64),
        }
    ).sort_values("vec_id").reset_index(drop=True)

def q_ann_lsh_pinned(sf_dir: str) -> pd.DataFrame:
    """Distributed SRP-LSH candidate scan + global re-rank vs its
    pinned sequential replay on the planted clustered corpus."""
    import ray.data as rd

    from gridfia_ray import oracle_pins
    from gridfia_ray.ann.search import lsh_topk_cosine
    from gridfia_ray.context import tune_context

    tune_context()
    paths = oracle_pins.ensure_annpin()
    mat, ids = oracle_pins.load_annpin_matrix()
    pos = {int(d): i for i, d in enumerate(ids)}
    qids = oracle_pins.ANN_PIN_QUERY_IDS
    out = lsh_topk_cosine(
        rd.read_parquet(paths["embeddings"]), mat[[pos[q] for q in qids]], qids, k=10
    )
    df = out.to_pandas()[["query_id", "vec_id", "rank"]].astype(np.int64)
    return df.sort_values(["query_id", "rank"], ignore_index=True)

def q_ann_ivf_pinned(sf_dir: str) -> pd.DataFrame:
    """Distributed IVF (streamed Lloyd with per-block combiner partials,
    cell assignment, probed scan, global re-rank) vs its pinned
    sequential replay. The 9-decimal centroid rounding after every
    Lloyd update makes the whole chain bit-deterministic across
    partitionings (see oracle_pins._replay_ivf_topk)."""
    import ray.data as rd

    from gridfia_ray import oracle_pins
    from gridfia_ray.ann.ivf import ivf_topk_cosine
    from gridfia_ray.context import tune_context

    tune_context()
    paths = oracle_pins.ensure_annpin()
    mat, ids = oracle_pins.load_annpin_matrix()
    pos = {int(d): i for i, d in enumerate(ids)}
    qids = oracle_pins.ANN_PIN_QUERY_IDS
    out = ivf_topk_cosine(
        rd.read_parquet(paths["embeddings"]), mat[[pos[q] for q in qids]], qids,
        k=10, k_cells=8, nprobe=4, seed=42,
    )
    df = out.to_pandas()[["query_id", "vec_id", "rank"]].astype(np.int64)
    return df.sort_values(["query_id", "rank"], ignore_index=True)

def q_ann_pq_pinned(sf_dir: str) -> pd.DataFrame:
    """Distributed product quantization (driver-pool codebook training
    on the deterministic hash sample, pure-map encode, per-block ADC
    top-k combiner) vs its pinned sequential replay — books, codes and
    ADC scores are bit-identical because both paths train on the SAME
    hash-ordered pool and build per-query tables with the identical
    einsum call (oracle_pins._replay_pq_topk)."""
    import ray.data as rd

    from gridfia_ray import oracle_pins
    from gridfia_ray.ann.pq import pq_encode, pq_topk_cosine, train_pq
    from gridfia_ray.context import tune_context

    tune_context()
    paths = oracle_pins.ensure_annpin()
    mat, ids = oracle_pins.load_annpin_matrix()
    pos = {int(d): i for i, d in enumerate(ids)}
    qids = oracle_pins.ANN_PIN_QUERY_IDS
    emb = rd.read_parquet(paths["embeddings"])
    books = train_pq(emb, m=8, sample_size=2048, seed=1234)
    codes = pq_encode(emb, books)
    out = pq_topk_cosine(codes, books, mat[[pos[q] for q in qids]], qids, k=10)
    df = out.to_pandas()
    df["adc_u"] = np.floor(df["adc_score"] * 1e9 + 0.5).astype(np.int64)
    df = df[["query_id", "rank", "vec_id", "adc_u"]].astype(np.int64)
    return df.sort_values(["query_id", "rank"], ignore_index=True)

def q_ann_ivfpq_pinned(sf_dir: str) -> pd.DataFrame:
    """IVF-PQ composition (coarse rounded-centroid cells + m-byte PQ
    codes per cell, probed ADC search reading only the probed
    partitions) vs its pinned sequential replay — determinism inherits
    from both parents (oracle_pins._replay_ivfpq_topk)."""
    import shutil
    import tempfile

    import ray.data as rd

    from gridfia_ray import oracle_pins
    from gridfia_ray.ann.pq import build_ivfpq_index, search_ivfpq_index
    from gridfia_ray.context import tune_context

    tune_context()
    paths = oracle_pins.ensure_annpin()
    mat, ids = oracle_pins.load_annpin_matrix()
    pos = {int(d): i for i, d in enumerate(ids)}
    qids = oracle_pins.ANN_PIN_QUERY_IDS
    tmp = tempfile.mkdtemp(prefix="ivfpq_pin_")
    try:
        build_ivfpq_index(
            rd.read_parquet(paths["embeddings"]), tmp, k_cells=8, m=8,
            n_iters=20, seed=42, pq_sample_size=2048, pq_seed=1234,
        )
        out, _dirs = search_ivfpq_index(
            tmp, mat[[pos[q] for q in qids]], qids, k=10, nprobe=4
        )
        # (3 queries x nprobe 4 may legitimately cover all 8 cells —
        # single-query file-level pruning is asserted in tests/test_ann)
        df = out.to_pandas()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    df["adc_u"] = np.floor(df["adc_score"] * 1e9 + 0.5).astype(np.int64)
    df = df[["query_id", "rank", "vec_id", "adc_u"]].astype(np.int64)
    return df.sort_values(["query_id", "rank"], ignore_index=True)

def q_emb_semantic_pinned(sf_dir: str) -> pd.DataFrame:
    """Distributed SemDeDup (streamed rounded-centroid k-means +
    groupby-cluster prune) vs its pinned sequential replay."""
    import ray.data as rd

    from gridfia_ray import oracle_pins
    from gridfia_ray.context import tune_context
    from gridfia_ray.dedup.semantic import semantic_dedup

    tune_context()
    paths = oracle_pins.ensure_annpin()
    out = semantic_dedup(
        rd.read_parquet(paths["embeddings"]), k=16, eps=0.95, n_iters=10, seed=42
    ).to_pandas()
    out["vec_id"] = out["vec_id"].astype(np.int64)
    out["cluster"] = out["cluster"].astype(np.int32)
    out["keep"] = out["keep"].astype(bool)
    return out.sort_values("vec_id", ignore_index=True)

def q_emb_near_dup_pinned(sf_dir: str) -> pd.DataFrame:
    """Distributed SRP-band near-dup (bucketed pairs + signature
    prefilter + exact cosine verify) vs its pinned sequential replay —
    must recover exactly the 120 planted duplicate pairs."""
    import ray.data as rd

    from gridfia_ray import oracle_pins
    from gridfia_ray.ann.search import embedding_near_dup_pairs
    from gridfia_ray.context import tune_context

    tune_context()
    paths = oracle_pins.ensure_annpin()
    out = embedding_near_dup_pairs(
        rd.read_parquet(paths["embeddings"]), threshold=0.95
    ).to_pandas()
    return out[["a", "b"]].astype(np.int64).sort_values(["a", "b"], ignore_index=True)

def q_ann_topk(sf_dir: str) -> pd.DataFrame:
    from gridfia_ray.ann.search import topk_cosine

    out = topk_cosine(_embeddings(sf_dir), _query_vectors(sf_dir), _ANN_QUERY_IDS, k=10)
    df = out.to_pandas()[["query_id", "vec_id", "rank"]].astype(np.int64)
    return df.sort_values(["query_id", "rank"]).reset_index(drop=True)

def q_emb_knn_graph(sf_dir: str) -> pd.DataFrame:
    """Exact k-NN graph over the embeddings table (ann/search.
    knn_graph): every vector's 5 nearest neighbors by cosine, self
    excluded, (cosine desc, id asc) tie-break — one broadcast + one
    corpus pass, no shuffle. Compared on (vec_id, nbr_id, rank) vs the
    DuckDB list_cosine_similarity self-join."""
    from gridfia_ray.ann.search import knn_graph

    out = knn_graph(_embeddings(sf_dir), k=5).to_pandas()
    df = out[["vec_id", "nbr_id", "rank"]].astype(np.int64)
    return df.sort_values(["vec_id", "rank"]).reset_index(drop=True)

def q_emb_kcenter(sf_dir: str) -> pd.DataFrame:
    """k-center greedy diversity selection (ann/diversity.
    kcenter_select, Gonzalez farthest-first): m=24 maximally-spread
    points over the pinned clustered embeddings, streaming per-block
    winner folds with the lexicographic (mind DESC, vec_id ASC) rule.
    Oracle = the sequential full-matrix replay
    (oracle_pins.ensure_divpin), bit-exact selection order + µ-scaled
    coverage radii."""
    import ray.data as rd

    from gridfia_ray import oracle_pins
    from gridfia_ray.ann.diversity import kcenter_select

    p = oracle_pins.ensure_divpin()
    sel = kcenter_select(
        rd.read_parquet(p["embeddings"]), oracle_pins.DIV_PIN_M,
        metric="euclidean",
    )
    out = sel[["rank", "vec_id"]].astype(np.int64)
    r2 = s6(sel["radius2"].fillna(-1e-6))
    out["radius2_u"] = r2
    return out.sort_values("rank").reset_index(drop=True)

def q_emb_hard_negatives(sf_dir: str) -> pd.DataFrame:
    """Contrastive hard-negative mining (ann/search.hard_negatives):
    every vector's 5 most-cosine-similar OTHER-label vectors, one
    broadcast + one corpus pass. Compared on (vec_id, neg_id, rank)
    vs the DuckDB label-filtered self-join."""
    from gridfia_ray.ann.search import hard_negatives

    out = hard_negatives(_embeddings(sf_dir), k=5).to_pandas()
    df = out[["vec_id", "neg_id", "rank"]].astype(np.int64)
    return df.sort_values(["vec_id", "rank"]).reset_index(drop=True)

def q_emb_knn_graph_ivf(sf_dir: str) -> pd.DataFrame:
    """APPROXIMATE k-NN graph, the no-broadcast scale path (ann/search.
    knn_graph_ivf): k-means cells, home-cell indexing + nprobe query
    fan-out, per-cell exact blocks, tiny keyed merge. Approximate by
    construction → rows-only here; recall vs the exact graph and the
    nprobe=n_cells ≡ exact equivalence are pinned in tests/test_ann.py."""
    from gridfia_ray.ann.search import knn_graph_ivf

    out = knn_graph_ivf(
        _embeddings(sf_dir), k=5, n_cells=16, nprobe=4, seed=7
    ).to_pandas()
    df = out[["vec_id", "nbr_id", "rank"]].astype(np.int64)
    return df.sort_values(["vec_id", "rank"]).reset_index(drop=True)

def q_ann_lsh_topk(sf_dir: str) -> pd.DataFrame:
    """Approximate variant (SRP-LSH candidates + exact re-rank)."""
    from gridfia_ray.ann.search import lsh_topk_cosine

    out = lsh_topk_cosine(_embeddings(sf_dir), _query_vectors(sf_dir), _ANN_QUERY_IDS, k=10)
    df = out.to_pandas()[["query_id", "vec_id", "rank"]].astype(np.int64)
    return df.sort_values(["query_id", "rank"]).reset_index(drop=True)

def q_ann_ivf_topk(sf_dir: str) -> pd.DataFrame:
    """IVF variant: spherical k-means cells + nprobe probing + exact
    re-rank. Deterministic (seeded init, centroid rounding absorbs
    partition float jitter) but approximate by construction → rows-only;
    recall/purity pinned in tests/test_ivf.py."""
    from gridfia_ray.ann.ivf import ivf_topk_cosine

    out = ivf_topk_cosine(
        _embeddings(sf_dir), _query_vectors(sf_dir), _ANN_QUERY_IDS,
        k=10, k_cells=8, nprobe=4, seed=42,
    )
    df = out.to_pandas()[["query_id", "vec_id", "rank"]].astype(np.int64)
    return df.sort_values(["query_id", "rank"]).reset_index(drop=True)

def q_ann_pq_topk(sf_dir: str) -> pd.DataFrame:
    """Product-quantization ADC variant over the sf embeddings: m-byte
    codes, per-block table-lookup scoring. Deterministic (driver-pool
    training on the hash sample, per-query tables) but approximate by
    construction → rows-only; recall vs the exact scan pinned in
    tests/test_ann.py and bit-exactness in ann_pq_pinned."""
    from gridfia_ray.ann.pq import pq_encode, pq_topk_cosine, train_pq

    emb = _embeddings(sf_dir)
    books = train_pq(emb, m=8, sample_size=2048, seed=1234)
    codes = pq_encode(emb, books)
    out = pq_topk_cosine(codes, books, _query_vectors(sf_dir), _ANN_QUERY_IDS, k=10)
    df = out.to_pandas()[["query_id", "vec_id", "rank"]].astype(np.int64)
    return df.sort_values(["query_id", "rank"]).reset_index(drop=True)
