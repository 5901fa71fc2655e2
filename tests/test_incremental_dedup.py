"""Incremental dedup against a persistent hash index: build, anti-join,
append, and the continuous-ingestion cycle."""

import os

import numpy as np
import pandas as pd
import pytest

from gridfia_ray.dedup.incremental import (
    append_to_index,
    build_hash_index,
    dedup_against_index,
)


def _docs(ids, texts):
    return pd.DataFrame({"doc_id": np.asarray(ids, np.int64), "text": texts})


@pytest.fixture
def corpus_index(ray_session, tmp_path):
    import ray.data as rd

    base = _docs([1, 2, 3, 4], ["alpha", "beta", "gamma", "beta"])  # beta dup inside
    idx = str(tmp_path / "hash_index")
    n = build_hash_index(rd.from_pandas(base).repartition(2), idx, n_shards=8)
    return idx, n


class TestIncrementalDedup:
    def test_build_counts_distinct(self, corpus_index):
        _, n = corpus_index
        assert n == 3  # alpha, beta, gamma

    def test_anti_join_drops_known_and_internal_dups(self, corpus_index, ray_session):
        import ray.data as rd

        idx, _ = corpus_index
        new = _docs(
            [10, 11, 12, 13, 14],
            ["beta", "delta", "delta", "epsilon", "alpha"],
        )
        out = dedup_against_index(rd.from_pandas(new).repartition(3), idx).to_pandas()
        assert sorted(out["text"].tolist()) == ["delta", "epsilon"]
        # within-batch dup keeps the first doc_id
        assert out.loc[out["text"] == "delta", "doc_id"].item() == 11

    def test_ingestion_cycle(self, corpus_index, ray_session):
        """survivors appended -> the same batch next time yields nothing."""
        import ray.data as rd

        idx, _ = corpus_index
        new = _docs([20, 21], ["zeta", "alpha"])
        surv = dedup_against_index(rd.from_pandas(new), idx)
        appended = append_to_index(surv, idx)
        assert appended == 1  # zeta only
        again = dedup_against_index(rd.from_pandas(new), idx).to_pandas()
        assert len(again) == 0
        # index stayed append-native: multiple part files allowed
        parts = [
            f for d in os.listdir(idx) if d.startswith("shard=")
            for f in os.listdir(os.path.join(idx, d))
        ]
        assert len(parts) >= 2
