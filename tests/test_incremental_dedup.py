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


class TestSharedIndexDirMeta:
    def test_exact_build_after_near_build_preserves_near_meta(
        self, ray_session, tmp_path
    ):
        """One index_dir serving BOTH exact and near dedup: building the
        exact index second must merge-update meta.json, not clobber the
        near index's near_n_shards/n_bands (ADVICE r3)."""
        import json

        import ray.data as rd

        from gridfia_ray.dedup.incremental import (
            build_near_index,
            near_dedup_against_index,
        )

        base = _docs([1, 2, 3], ["alpha one", "beta two", "gamma three"])
        idx = str(tmp_path / "shared_index")
        build_near_index(rd.from_pandas(base), idx, n_shards=4, n_bands=8)
        build_hash_index(rd.from_pandas(base), idx, n_shards=8)
        with open(os.path.join(idx, "meta.json")) as f:
            meta = json.load(f)
        assert meta["n_shards"] == 8
        assert meta["near_n_shards"] == 4 and meta["n_bands"] == 8
        # and the near path still works after the exact build
        new = _docs([10, 11], ["alpha one", "totally fresh words here"])
        out = near_dedup_against_index(
            rd.from_pandas(new), idx, max_hamming=3
        ).to_pandas()
        assert out["doc_id"].tolist() == [11]


class TestNearIncrementalDedup:
    """SimHash band index: near-dup rejection for continuous ingestion."""

    WORDS = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
             "lambda mu nu xi omicron pi rho sigma tau upsilon").split()

    def _doc(self, rng, n=40):
        return " ".join(rng.choice(self.WORDS) for _ in range(n))

    @pytest.fixture
    def near_index(self, ray_session, tmp_path):
        import random

        import ray.data as rd

        from gridfia_ray.dedup.incremental import build_near_index

        rng = random.Random(42)
        self.base_texts = [self._doc(rng) for _ in range(20)]
        base = _docs(range(20), self.base_texts)
        idx = str(tmp_path / "near_index")
        n = build_near_index(rd.from_pandas(base).repartition(2), idx, n_shards=8, n_bands=8)
        return idx, n

    def test_build_counts_signatures(self, near_index):
        _, n = near_index
        assert n == 20  # all base docs distinct → 20 signatures

    def test_rejects_planted_near_dups(self, near_index, ray_session):
        import ray.data as rd

        from gridfia_ray.dedup.docs import SimHasher
        from gridfia_ray.dedup.incremental import near_dedup_against_index

        idx, _ = near_index
        # planted near-dup: one word changed in a 40-word doc → simhash
        # within a few bits; fresh docs from a disjoint vocabulary
        mutated = self.base_texts[3].rsplit(" ", 1)[0] + " omega"
        fresh = ["quark boson lepton hadron gluon photon " * 6,
                 "neutron proton electron positron muon tauon " * 6]
        sh = SimHasher()
        from gridfia_ray.codecs.phash import hamming64
        hm = hamming64(
            sh.sim64_batch([mutated]), sh.sim64_batch([self.base_texts[3]])
        )[0]
        assert hm <= 3, f"fixture assumption broken: hamming {hm}"
        new = _docs([100, 101, 102, 103],
                    [mutated, fresh[0], fresh[1], fresh[0]])  # 103 exact dup of 101
        out = near_dedup_against_index(
            rd.from_pandas(new).repartition(2), idx, max_hamming=3
        ).to_pandas()
        assert sorted(out["doc_id"].tolist()) == [101, 102]

    def test_append_cycle(self, near_index, ray_session):
        import ray.data as rd

        from gridfia_ray.dedup.incremental import (
            append_to_near_index,
            near_dedup_against_index,
        )

        idx, _ = near_index
        new = _docs([200], ["completely different vocabulary entirely novel words here " * 4])
        surv = near_dedup_against_index(rd.from_pandas(new), idx)
        n = append_to_near_index(surv, idx)
        assert n == 8  # 1 signature × 8 band rows
        again = near_dedup_against_index(rd.from_pandas(new), idx).to_pandas()
        assert len(again) == 0  # now an exact (hamming-0) hit

    def test_banding_guard(self, near_index, ray_session):
        import ray.data as rd

        from gridfia_ray.dedup.incremental import near_dedup_against_index

        idx, _ = near_index
        with pytest.raises(ValueError):
            near_dedup_against_index(
                rd.from_pandas(_docs([1], ["x"])), idx, max_hamming=9
            ).to_pandas()
