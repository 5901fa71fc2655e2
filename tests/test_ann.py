"""Similarity search: exact top-k vs numpy, LSH recall, near-dup pairs."""

import numpy as np
import pandas as pd
import pytest

from gridfia_ray.ann.search import (
    embedding_near_dup_pairs,
    lsh_topk_cosine,
    topk_cosine,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb_df():
    import pyarrow.parquet as pq

    return pq.read_table(f"{SF}/embeddings.parquet").to_pandas()


@pytest.fixture(scope="module")
def emb_ds(ray_session):
    import ray.data as rd

    return rd.read_parquet(f"{SF}/embeddings.parquet")


def numpy_topk(emb_df, qids, k):
    M = np.stack(emb_df.sort_values("vec_id")["embedding"].to_numpy()).astype(np.float64)
    ids = emb_df.sort_values("vec_id")["vec_id"].to_numpy()
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    out = {}
    for q in qids:
        sims = Mn @ Mn[list(ids).index(q)]
        order = np.lexsort((ids, -sims))[:k]
        out[q] = ids[order].tolist()
    return out


class TestBrute:
    def test_matches_numpy(self, emb_ds, emb_df):
        qids = [0, 1, 2]
        queries = np.stack(emb_df.set_index("vec_id").loc[qids, "embedding"].to_numpy())
        got = topk_cosine(emb_ds, queries, qids, k=10).to_pandas()
        expect = numpy_topk(emb_df, qids, 10)
        for q in qids:
            g = got[got.query_id == q].sort_values("rank")["vec_id"].tolist()
            assert g == expect[q]

    def test_small_batches_still_global(self, emb_df, ray_session):
        """Per-batch combiner must not lose global winners."""
        import ray.data as rd

        ds = rd.from_pandas(emb_df).repartition(13)
        qids = [5]
        queries = np.stack([emb_df.set_index("vec_id").loc[5, "embedding"]])
        got = topk_cosine(ds, queries, qids, k=7).to_pandas()
        assert got.sort_values("rank")["vec_id"].tolist() == numpy_topk(emb_df, qids, 7)[5]


class TestLsh:
    def test_high_recall_at_small_scale(self, emb_ds, emb_df):
        qids = [0, 1, 2]
        queries = np.stack(emb_df.set_index("vec_id").loc[qids, "embedding"].to_numpy())
        got = lsh_topk_cosine(emb_ds, queries, qids, k=10, hamming_radius=32).to_pandas()
        expect = numpy_topk(emb_df, qids, 10)
        recall = np.mean(
            [
                len(set(got[got.query_id == q]["vec_id"]) & set(expect[q])) / 10
                for q in qids
            ]
        )
        assert recall >= 0.8  # approximate path: high but not guaranteed recall


class TestNearDup:
    def test_finds_planted_duplicates(self, emb_df, ray_session):
        import ray.data as rd

        df = emb_df.copy()
        planted = []
        rng = np.random.RandomState(0)
        for i, src in enumerate([0, 7, 21]):
            v = np.asarray(df.loc[df.vec_id == src, "embedding"].iloc[0], dtype=np.float32)
            noisy = v + rng.normal(scale=1e-3, size=v.shape).astype(np.float32)
            new_id = 10_000 + i
            planted.append((src, new_id))
            df = pd.concat(
                [df, pd.DataFrame({"vec_id": [new_id], "embedding": [noisy], "label": [0]})],
                ignore_index=True,
            )
        pairs = embedding_near_dup_pairs(rd.from_pandas(df), threshold=0.999).to_pandas()
        found = set(zip(pairs.a, pairs.b))
        for src, dup in planted:
            assert (min(src, dup), max(src, dup)) in found

    def test_low_threshold_recall(self, emb_df, ray_session):
        """The Hamming prefilter must widen with the threshold: pairs
        planted at cosine ≈ 0.75 survive a threshold=0.7 run —
        regression for the fixed radius that dropped them."""
        import ray.data as rd

        df = emb_df.copy()
        rng = np.random.RandomState(1)
        planted = []
        for i, src in enumerate([3, 11, 30, 42]):
            v = np.asarray(df.loc[df.vec_id == src, "embedding"].iloc[0], np.float64)
            v = v / np.linalg.norm(v)
            # mix with orthogonalized noise to a target cosine ~0.75
            n = rng.normal(size=v.shape)
            n -= (n @ v) * v
            n /= np.linalg.norm(n)
            target = 0.75
            noisy = (target * v + np.sqrt(1 - target**2) * n).astype(np.float32)
            new_id = 20_000 + i
            planted.append((src, new_id))
            df = pd.concat(
                [df, pd.DataFrame({"vec_id": [new_id], "embedding": [noisy], "label": [0]})],
                ignore_index=True,
            )
        pairs = embedding_near_dup_pairs(rd.from_pandas(df), threshold=0.7).to_pandas()
        found = set(zip(pairs.a, pairs.b))
        hits = sum((min(s, d), max(s, d)) in found for s, d in planted)
        assert hits >= 3  # SRP banding is probabilistic; prefilter must not be the cap
