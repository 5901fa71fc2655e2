"""Distributed PCA: exact int64 Gram/moment statistics vs numpy,
centered fit vs a numpy eigensolve, projection round-trip, overflow and
validation raises, partition invariance."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from gridfia_ray.analysis.pca import (
    gram_matrix_int,
    moment_stats,
    pca_fit,
    pca_project,
)


def _emb_frame(n=300, d=8, seed=0, aniso=True):
    rng = np.random.RandomState(seed)
    x = rng.randn(n, d)
    if aniso:  # well-separated spectrum so eigenvectors are stable
        x *= np.linspace(3.0, 0.3, d)[None, :]
    return pd.DataFrame({"embedding": list(x.astype(np.float32))})


def _ds(df, parts=4):
    return rd.from_pandas(df).repartition(parts)


def _q(df, scale=1000):
    v = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    return np.floor(v * scale + 0.5).astype(np.int64)


class TestGram:
    def test_matches_numpy(self, ray_session):
        df = _emb_frame()
        got = (
            gram_matrix_int(_ds(df), n_buckets=4)
            .to_pandas()
            .astype({"i": np.int64, "j": np.int64, "dot": np.int64})
            .sort_values(["i", "j"])
            .reset_index(drop=True)
        )
        q = _q(df)
        want = q.T @ q
        assert len(got) == q.shape[1] ** 2
        g = np.zeros_like(want)
        g[got["i"], got["j"]] = got["dot"]
        np.testing.assert_array_equal(g, want)

    def test_partition_invariant(self, ray_session):
        df = _emb_frame(seed=1)
        a = gram_matrix_int(_ds(df, 1), n_buckets=2).to_pandas()
        b = gram_matrix_int(_ds(df, 9), n_buckets=8).to_pandas()
        key = lambda t: t.astype(np.int64).sort_values(["i", "j"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(key(a), key(b))

    def test_overflow_guard_raises(self, ray_session):
        df = pd.DataFrame({"embedding": [np.full(4, 4e9, np.float64)] * 2})
        with pytest.raises(Exception, match="int64 overflow"):
            gram_matrix_int(_ds(df, 1), scale=1000).to_pandas()


class TestMomentsAndFit:
    def test_moments_match_numpy(self, ray_session):
        df = _emb_frame(seed=2)
        gram, colsum, n = moment_stats(_ds(df), n_buckets=4)
        q = _q(df)
        assert n == len(df)
        np.testing.assert_array_equal(gram, q.T @ q)
        np.testing.assert_array_equal(colsum, q.sum(axis=0))

    def test_fit_matches_numpy_pca(self, ray_session):
        df = _emb_frame(n=500, d=6, seed=3)
        m = pca_fit(_ds(df), k=6, scale=10**6, n_buckets=4)
        x = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        cov = np.cov(x, rowvar=False, ddof=1)
        evals, evecs = np.linalg.eigh(cov)
        order = np.argsort(evals)[::-1]
        np.testing.assert_allclose(m["eigvals"], evals[order], rtol=1e-4)
        np.testing.assert_allclose(m["mean"], x.mean(axis=0), atol=1e-5)
        for r, c in enumerate(order):  # direction match up to sign
            cos = abs(float(np.dot(m["components"][r], evecs[:, c])))
            assert cos > 0.9999, (r, cos)

    def test_sign_pinned_deterministic(self, ray_session):
        df = _emb_frame(seed=4)
        a = pca_fit(_ds(df, 2), k=3, n_buckets=2)
        b = pca_fit(_ds(df, 7), k=3, n_buckets=8)
        np.testing.assert_allclose(a["components"], b["components"], atol=1e-12)
        for r in range(3):
            comp = a["components"][r]
            assert comp[np.argmax(np.abs(comp))] > 0

    def test_validation(self, ray_session):
        one = pd.DataFrame({"embedding": [np.ones(3, np.float32)]})
        with pytest.raises(ValueError, match="n >= 2"):
            pca_fit(_ds(one, 1))
        with pytest.raises(ValueError, match="out of range"):
            pca_fit(_ds(_emb_frame(n=10, d=4), 1), k=9)


class TestProject:
    def test_projection_matches_numpy(self, ray_session):
        df = _emb_frame(n=200, d=5, seed=5)
        df["doc_id"] = np.arange(len(df), dtype=np.int64)
        m = pca_fit(_ds(df[["embedding"]]), k=2, scale=10**6, n_buckets=2)
        out = (
            pca_project(_ds(df), m)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert "embedding" not in out.columns
        x = np.stack(df.sort_values("doc_id")["embedding"].to_numpy()).astype(np.float64)
        want = (x - m["mean"]) @ m["components"].T
        np.testing.assert_allclose(np.stack(out["pc"].to_numpy()), want, atol=1e-9)

    def test_full_rank_preserves_distances(self, ray_session):
        df = _emb_frame(n=100, d=4, seed=6)
        df["doc_id"] = np.arange(len(df), dtype=np.int64)
        m = pca_fit(_ds(df[["embedding"]]), k=4, scale=10**6, n_buckets=2)
        out = pca_project(_ds(df), m).to_pandas().sort_values("doc_id")
        x = np.stack(df.sort_values("doc_id")["embedding"].to_numpy()).astype(np.float64)
        p = np.stack(out["pc"].to_numpy())
        # orthonormal full-rank basis: pairwise distances preserved
        d_x = np.linalg.norm(x[:30, None] - x[None, :30], axis=-1)
        d_p = np.linalg.norm(p[:30, None] - p[None, :30], axis=-1)
        np.testing.assert_allclose(d_p, d_x, atol=1e-8)


class TestPinnedReplay:
    def test_distributed_matches_pinned_replay(self, ray_session):
        import pyarrow.parquet as pq

        from gridfia_ray import oracle_pins
        from gridfia_ray.contract import q_emb_pca_pinned

        pin = oracle_pins.ensure_pcapin()
        want = (
            pq.read_table(pin["pca_expected"])
            .to_pandas()
            .sort_values(["vec_id", "pc_idx"])
            .reset_index(drop=True)
        )
        got = q_emb_pca_pinned("unused")
        pd.testing.assert_frame_equal(got, want)
