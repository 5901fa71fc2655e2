"""Pinned sequential-replay oracles (oracle_pins): the distributed
hash/heuristic pipelines must reproduce the single-process replays
bit-for-bit — and stay invariant under forced multi-block partitioning
(the property the driver's single run can't prove by itself)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from gridfia_ray import oracle_pins as OP


@pytest.fixture(scope="module")
def docpin(ray_session):
    return OP.ensure_docpin()


@pytest.fixture(scope="module")
def annpin(ray_session):
    return OP.ensure_annpin()


def _expected(path: str, sort_cols: list[str]) -> pd.DataFrame:
    return (
        pq.read_table(path).to_pandas().sort_values(sort_cols, ignore_index=True)
    )


class TestDocPins:
    @pytest.mark.parametrize("n_parts", [1, 7])
    def test_minhash_partition_invariant(self, docpin, n_parts):
        from gridfia_ray.dedup.docs import minhash_lsh_pairs

        docs = rd.read_parquet(docpin["documents"]).repartition(n_parts)
        got = (
            minhash_lsh_pairs(docs, threshold=0.5)
            .to_pandas()[["a", "b"]]
            .astype(np.int64)
            .sort_values(["a", "b"], ignore_index=True)
        )
        pd.testing.assert_frame_equal(got, _expected(docpin["minhash_expected"], ["a", "b"]))

    @pytest.mark.parametrize("n_parts", [1, 7])
    def test_simhash_partition_invariant(self, docpin, n_parts):
        from gridfia_ray.dedup.docs import simhash_pairs

        docs = rd.read_parquet(docpin["documents"]).repartition(n_parts)
        got = (
            simhash_pairs(docs, max_hamming=3)
            .to_pandas()[["a", "b"]]
            .astype(np.int64)
            .sort_values(["a", "b"], ignore_index=True)
        )
        pd.testing.assert_frame_equal(got, _expected(docpin["simhash_expected"], ["a", "b"]))

    @pytest.mark.parametrize("n_parts", [1, 7])
    def test_hll_partition_invariant(self, docpin, n_parts):
        from gridfia_ray.analysis.sketches import hll_distinct
        from gridfia_ray.text.hashing import token_hashes64

        def tok_hashes(batch: pd.DataFrame) -> np.ndarray:
            th, _ = token_hashes64(batch["text"].fillna("").tolist(), lower=True)
            return th

        docs = rd.read_parquet(docpin["documents"]).repartition(n_parts)
        est = int(round(hll_distinct(docs, ["text"], p=14, hash_fn=tok_hashes)))
        assert est == int(pq.read_table(docpin["hll_expected"])["vocab_est"][0].as_py())


class TestAnnPins:
    def _mat_ids(self, annpin):
        return OP.load_annpin_matrix()

    @pytest.mark.parametrize("n_parts", [1, 9])
    def test_lsh_topk_partition_invariant(self, annpin, n_parts):
        from gridfia_ray.ann.search import lsh_topk_cosine

        mat, ids = self._mat_ids(annpin)
        pos = {int(d): i for i, d in enumerate(ids)}
        qids = OP.ANN_PIN_QUERY_IDS
        ds = rd.read_parquet(annpin["embeddings"]).repartition(n_parts)
        got = (
            lsh_topk_cosine(ds, mat[[pos[q] for q in qids]], qids, k=10)
            .to_pandas()[["query_id", "vec_id", "rank"]]
            .astype(np.int64)
            .sort_values(["query_id", "rank"], ignore_index=True)
        )
        pd.testing.assert_frame_equal(
            got, _expected(annpin["lsh_expected"], ["query_id", "rank"])
        )

    @pytest.mark.parametrize("n_parts", [1, 9])
    def test_ivf_topk_partition_invariant(self, annpin, n_parts):
        from gridfia_ray.ann.ivf import ivf_topk_cosine

        mat, ids = self._mat_ids(annpin)
        pos = {int(d): i for i, d in enumerate(ids)}
        qids = OP.ANN_PIN_QUERY_IDS
        ds = rd.read_parquet(annpin["embeddings"]).repartition(n_parts)
        got = (
            ivf_topk_cosine(
                ds, mat[[pos[q] for q in qids]], qids, k=10, k_cells=8, nprobe=4, seed=42
            )
            .to_pandas()[["query_id", "vec_id", "rank"]]
            .astype(np.int64)
            .sort_values(["query_id", "rank"], ignore_index=True)
        )
        pd.testing.assert_frame_equal(
            got, _expected(annpin["ivf_expected"], ["query_id", "rank"])
        )

    @pytest.mark.parametrize("n_parts", [1, 9])
    def test_semantic_dedup_partition_invariant(self, annpin, n_parts):
        from gridfia_ray.dedup.semantic import semantic_dedup

        ds = rd.read_parquet(annpin["embeddings"]).repartition(n_parts)
        got = semantic_dedup(ds, k=16, eps=0.95, n_iters=10, seed=42).to_pandas()
        got["vec_id"] = got["vec_id"].astype(np.int64)
        got["cluster"] = got["cluster"].astype(np.int32)
        got["keep"] = got["keep"].astype(bool)
        got = got.sort_values("vec_id", ignore_index=True)
        pd.testing.assert_frame_equal(got, _expected(annpin["semantic_expected"], ["vec_id"]))

    @pytest.mark.parametrize("n_parts", [9])
    def test_near_dup_recovers_planted(self, annpin, n_parts):
        from gridfia_ray.ann.search import embedding_near_dup_pairs

        ds = rd.read_parquet(annpin["embeddings"]).repartition(n_parts)
        got = (
            embedding_near_dup_pairs(ds, threshold=0.95)
            .to_pandas()[["a", "b"]]
            .astype(np.int64)
            .sort_values(["a", "b"], ignore_index=True)
        )
        exp = _expected(annpin["neardup_expected"], ["a", "b"])
        pd.testing.assert_frame_equal(got, exp)
        # the 120 planted (i, 4000+i) pairs must all be present
        planted = {(i, 4000 + i) for i in range(120)}
        assert planted <= set(map(tuple, exp[["a", "b"]].to_numpy()))
