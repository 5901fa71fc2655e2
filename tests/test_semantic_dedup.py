"""SemDeDup semantic dedup: planted-duplicate recall + exact brute-force
oracle of the documented rule (drop iff any earlier-ordered vector in the
same cluster is within eps)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from gridfia_ray.ann.ivf import assign_cells, kmeans_fit
from gridfia_ray.ann.search import _normalize
from gridfia_ray.dedup.semantic import _prune_cluster, semantic_dedup


def _planted(rng, n=240, d=16, n_dup=30, jitter=1e-3):
    base = rng.randn(n, d)
    # duplicate rows: vec i+n_offset is a jittered copy of vec i
    src = rng.choice(n, n_dup, replace=False)
    dups = base[src] + jitter * rng.randn(n_dup, d)
    vecs = np.vstack([base, dups]).astype(np.float64)
    ids = np.arange(len(vecs), dtype=np.int64)
    return pd.DataFrame({"vec_id": ids, "embedding": list(vecs)}), src


def _brute(df, centroids, eps):
    """Same rule, single process: assign, order by (sim_to_centroid, id),
    drop if any earlier in cluster has cosine >= eps."""
    vn = _normalize(np.stack(df["embedding"].to_numpy()))
    cn = _normalize(centroids)
    cell = np.argmax(vn @ cn.T, axis=1)
    keep = np.ones(len(df), dtype=bool)
    ids = df["vec_id"].to_numpy()
    for c in np.unique(cell):
        idx = np.flatnonzero(cell == c)
        sim_c = vn[idx] @ cn[c]
        order = np.lexsort((ids[idx], sim_c))
        o = idx[order]
        for i in range(1, len(o)):
            if (vn[o[i]] @ vn[o[:i]].T).max() >= eps:
                keep[o[i]] = False
    return cell, keep


class TestSemanticDedup:
    def test_matches_brute_force(self, ray_session):
        rng = np.random.RandomState(3)
        df, src = _planted(rng)
        ds = rd.from_pandas(df).repartition(5)
        got = (
            semantic_dedup(ds, k=8, eps=0.95, n_iters=8, seed=1)
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        centroids = kmeans_fit(rd.from_pandas(df), 8, n_iters=8, seed=1)
        cell, keep = _brute(df, centroids, 0.95)
        assert got["cluster"].to_numpy().tolist() == cell.tolist()
        assert got["keep"].to_numpy().tolist() == keep.tolist()
        # planted near-dups actually got removed: one of each pair dropped
        n_dropped = int((~got["keep"]).sum())
        assert n_dropped >= len(src) * 0.9  # jittered copies are >0.95 cosine

    def test_partition_invariant(self, ray_session):
        rng = np.random.RandomState(4)
        df, _ = _planted(rng, n=120, n_dup=12)
        a = (
            semantic_dedup(rd.from_pandas(df).repartition(2), k=4, eps=0.9, seed=7)
            .to_pandas().sort_values("vec_id").reset_index(drop=True)
        )
        b = (
            semantic_dedup(rd.from_pandas(df).repartition(13), k=4, eps=0.9, seed=7)
            .to_pandas().sort_values("vec_id").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)

    def test_chunked_prune_matches_unchunked(self):
        rng = np.random.RandomState(5)
        v = _normalize(rng.randn(300, 8))
        order = np.lexsort((np.arange(300), rng.rand(300)))
        a = _prune_cluster(v, order, 0.9, chunk=7)
        b = _prune_cluster(v, order, 0.9, chunk=1000)
        assert (a == b).all()

    def test_oversize_cluster_raises(self, ray_session):
        rng = np.random.RandomState(6)
        df, _ = _planted(rng, n=50, n_dup=0)
        with pytest.raises(Exception, match="max_cluster"):
            semantic_dedup(
                rd.from_pandas(df), k=1, eps=0.9, max_cluster=10
            ).to_pandas()

    def test_custom_id_col(self, ray_session):
        rng = np.random.RandomState(8)
        df, _ = _planted(rng, n=80, n_dup=8)
        renamed = df.rename(columns={"vec_id": "doc_id"})
        a = (
            semantic_dedup(rd.from_pandas(df), k=4, eps=0.9, seed=2)
            .to_pandas().sort_values("vec_id").reset_index(drop=True)
        )
        b = (
            semantic_dedup(rd.from_pandas(renamed), k=4, eps=0.9, seed=2,
                           id_col="doc_id")
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        assert list(b.columns) == ["doc_id", "cluster", "keep"]
        pd.testing.assert_frame_equal(
            a, b.rename(columns={"doc_id": "vec_id"})
        )
        with pytest.raises(ValueError, match="not in input"):
            semantic_dedup(rd.from_pandas(df), id_col="nope").to_pandas()

    def test_bad_eps_rejected(self, ray_session):
        df = pd.DataFrame({"vec_id": [0], "embedding": [np.ones(4)]})
        with pytest.raises(ValueError, match="eps"):
            semantic_dedup(rd.from_pandas(df), eps=0.0)
