"""Bloom-prefiltered join: exactness vs the plain shuffle join (any
bitmap size), zero false negatives, and real prefilter selectivity."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from gridfia_ray.pipelines.joins import (
    _bloom_indices,
    bloom_prefilter_join,
    build_bloom_filter,
    shuffle_hash_join,
)


def _sides(rng, n_left=5000, n_right_keys=150):
    right_keys = rng.choice(100_000, size=n_right_keys, replace=False).astype(np.int64)
    left = pd.DataFrame(
        {
            "k": rng.choice(100_000, size=n_left).astype(np.int64),
            "v": rng.randint(0, 1000, size=n_left).astype(np.int64),
        }
    )
    right = pd.DataFrame({"k": right_keys, "w": np.arange(n_right_keys, dtype=np.int64)})
    return left, right


def _norm(df):
    return (
        df[sorted(df.columns)]
        .sort_values(sorted(df.columns), kind="mergesort")
        .reset_index(drop=True)
    )


class TestBloomJoin:
    def test_no_false_negatives(self, ray_session):
        rng = np.random.RandomState(0)
        _, right = _sides(rng)
        bm = build_bloom_filter(rd.from_pandas(right), "k", m_bits=1 << 14)
        idx = _bloom_indices(right["k"].to_numpy(), 1 << 14, 4).reshape(-1, 4)
        byte = bm[(idx >> np.uint64(3)).astype(np.int64)]
        assert (((byte >> (idx & np.uint64(7)).astype(np.uint8)) & 1) == 1).all()

    @pytest.mark.parametrize("m_bits", [1 << 10, 1 << 20])  # FP-heavy and roomy
    def test_matches_plain_join(self, ray_session, m_bits):
        rng = np.random.RandomState(3)
        left, right = _sides(rng)
        lds = rd.from_pandas(left).repartition(4)
        rds = rd.from_pandas(right).repartition(2)
        got = _norm(
            bloom_prefilter_join(lds, rds, "k", m_bits=m_bits).to_pandas()
        )
        want = _norm(shuffle_hash_join(lds, rds, ["k"]).to_pandas())
        pd.testing.assert_frame_equal(got, want)

    def test_prefilter_reduces_shuffle_rows(self, ray_session):
        rng = np.random.RandomState(5)
        left, right = _sides(rng)
        import ray

        from gridfia_ray.pipelines.joins import _bloom_indices as bi

        bm = build_bloom_filter(rd.from_pandas(right), "k", m_bits=1 << 20)
        idx = bi(left["k"].to_numpy(), 1 << 20, 4).reshape(-1, 4)
        byte = bm[(idx >> np.uint64(3)).astype(np.int64)]
        passed = (((byte >> (idx & np.uint64(7)).astype(np.uint8)) & 1) == 1).all(axis=1).sum()
        true_matches = left["k"].isin(right["k"]).sum()
        # with 10+ bits/key the pass-through is close to the true match
        # count — far below the unfiltered 5000 rows
        assert true_matches <= passed < 0.05 * len(left) + true_matches
