"""Deterministic hash splits: exactness, invariance, validation."""

import hashlib

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from gridfia_ray.pipelines.sampling import split_by_hash, split_thresholds_hex


def _brute(ids, weights):
    th = split_thresholds_hex(weights)
    names = list(weights)
    out = []
    for i in ids:
        h = hashlib.md5(str(i).encode()).hexdigest()[:8]
        for name, t in zip(names[:-1], th):
            if h < t:
                out.append(name)
                break
        else:
            out.append(names[-1])
    return out


class TestSplitByHash:
    def test_matches_brute_force(self, ray_session):
        ids = np.arange(1000, dtype=np.int64)
        df = pd.DataFrame({"doc_id": ids})
        w = {"train": 0.8, "val": 0.1, "test": 0.1}
        got = (
            split_by_hash(rd.from_pandas(df).repartition(7), ["doc_id"], w)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert got["split"].tolist() == _brute(ids, w)

    def test_partition_invariant_and_proportions(self, ray_session):
        ids = np.arange(5000, dtype=np.int64)
        df = pd.DataFrame({"doc_id": ids})
        w = {"train": 0.8, "val": 0.1, "test": 0.1}
        a = split_by_hash(rd.from_pandas(df).repartition(2), ["doc_id"], w).to_pandas()
        b = split_by_hash(rd.from_pandas(df).repartition(31), ["doc_id"], w).to_pandas()
        a = a.sort_values("doc_id").reset_index(drop=True)
        b = b.sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)
        frac = a["split"].value_counts(normalize=True)
        assert abs(frac["train"] - 0.8) < 0.03
        assert abs(frac["val"] - 0.1) < 0.02
        assert abs(frac["test"] - 0.1) < 0.02

    def test_multi_column_rank(self, ray_session):
        df = pd.DataFrame({"a": [1, 1, 2], "b": ["x", "y", "x"]})
        got = split_by_hash(
            rd.from_pandas(df), ["a", "b"], {"l": 0.5, "r": 0.5}
        ).to_pandas()
        # rank of (1,'x') is md5('1|x') — same derivation as sample_per_key
        h = hashlib.md5(b"1|x").hexdigest()[:8]
        want = "l" if h < split_thresholds_hex({"l": 0.5, "r": 0.5})[0] else "r"
        row = got[(got["a"] == 1) & (got["b"] == "x")]
        assert row["split"].iloc[0] == want

    def test_bad_weights_rejected(self, ray_session):
        df = pd.DataFrame({"doc_id": [1]})
        with pytest.raises(ValueError, match="sum to 1"):
            split_by_hash(rd.from_pandas(df), ["doc_id"], {"a": 0.5, "b": 0.6})
        with pytest.raises(ValueError, match="two splits"):
            split_by_hash(rd.from_pandas(df), ["doc_id"], {"a": 1.0})
