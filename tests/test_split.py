"""Deterministic hash splits + grouped top-k: exactness, invariance,
validation."""

import hashlib

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from gridfia_ray.pipelines.sampling import (
    grouped_topk,
    split_by_hash,
    split_thresholds_hex,
)


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


class TestGroupedTopk:
    def _frame(self, seed=0, n=4000, keys=200):
        rng = np.random.RandomState(seed)
        return pd.DataFrame(
            {
                "u": rng.randint(0, keys, n).astype(np.int64),
                "v": rng.randn(n),
                "rid": np.arange(n, dtype=np.int64),
            }
        )

    def _oracle(self, df, k, descending=True):
        out = df.sort_values(["u", "v", "rid"],
                             ascending=[True, not descending, True],
                             kind="mergesort")
        out = out.groupby("u", sort=False).head(k)
        return out.sort_values(["u", "rid"]).reset_index(drop=True)

    def test_matches_pandas_oracle(self, ray_session):
        df = self._frame()
        got = (
            grouped_topk(rd.from_pandas(df).repartition(9), "u", 3, "v",
                         tie_cols=["rid"])
            .to_pandas().sort_values(["u", "rid"]).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, self._oracle(df, 3))

    def test_ascending_and_partition_invariant(self, ray_session):
        df = self._frame(seed=1)
        a = (
            grouped_topk(rd.from_pandas(df).repartition(2), "u", 2, "v",
                         descending=False, tie_cols=["rid"], n_buckets=4)
            .to_pandas().sort_values(["u", "rid"]).reset_index(drop=True)
        )
        b = (
            grouped_topk(rd.from_pandas(df).repartition(17), "u", 2, "v",
                         descending=False, tie_cols=["rid"], n_buckets=16)
            .to_pandas().sort_values(["u", "rid"]).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)
        pd.testing.assert_frame_equal(a, self._oracle(df, 2, descending=False))

    def test_group_smaller_than_k(self, ray_session):
        df = pd.DataFrame({"u": np.int64([1, 1, 2]), "v": [1.0, 2.0, 3.0],
                           "rid": np.int64([0, 1, 2])})
        got = grouped_topk(rd.from_pandas(df), "u", 5, "v",
                           tie_cols=["rid"]).to_pandas()
        assert len(got) == 3  # every row survives when the group is small

    def test_bad_k(self, ray_session):
        df = pd.DataFrame({"u": [1], "v": [1.0]})
        with pytest.raises(ValueError, match="k must be"):
            grouped_topk(rd.from_pandas(df), "u", 0, "v")


class TestMixByKey:
    def _docs(self, n=400):
        import numpy as np
        import pandas as pd

        return pd.DataFrame(
            {
                "doc_id": np.arange(n, dtype=np.int64),
                "source": [f"s{i % 4}" for i in range(n)],
            }
        )

    def test_rates_and_default(self, ray_session):
        import ray.data as rd

        from gridfia_ray.pipelines.sampling import mix_by_key

        df = self._docs()
        out = mix_by_key(
            rd.from_pandas(df), "source", {"s0": 0.0, "s1": 0.5},
            ["source", "doc_id"], default_rate=1.0,
        ).to_pandas()
        by = out.groupby("source").size()
        assert "s0" not in by.index  # rate 0 drops everything
        assert 20 <= by.get("s1", 0) <= 80  # ~half of 100
        # default 1.0 keeps EVERY row of unlisted sources (keep-all
        # sentinel, not the clamped 'ffffffff')
        assert by.get("s2", 0) == 100 and by.get("s3", 0) == 100

    def test_partition_invariant_and_deterministic(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from gridfia_ray.pipelines.sampling import mix_by_key

        df = self._docs()
        runs = [
            mix_by_key(
                rd.from_pandas(df).repartition(p), "source",
                {"s0": 0.3, "s1": 0.7}, ["source", "doc_id"], default_rate=0.1,
            )
            .to_pandas()
            .sort_values("doc_id", ignore_index=True)
            for p in (1, 7)
        ]
        pd.testing.assert_frame_equal(runs[0], runs[1])

    def test_rate_validation_and_sentinel(self, ray_session):
        import pytest

        from gridfia_ray.pipelines.sampling import rate_threshold_hex

        with pytest.raises(ValueError):
            rate_threshold_hex(-0.1)
        with pytest.raises(ValueError):
            rate_threshold_hex(1.5)
        assert rate_threshold_hex(1.0) == "g0000000"
        assert rate_threshold_hex(0.0) == "00000000"
        assert "ffffffff" < rate_threshold_hex(1.0)  # sorts above all hex


class TestStratifiedSample:
    def _ds(self, n_per, parts=1):
        rows = []
        i = 0
        for src, n in n_per.items():
            for _ in range(n):
                rows.append((i, src))
                i += 1
        df = pd.DataFrame(rows, columns=["doc_id", "source"])
        df["doc_id"] = df["doc_id"].astype(np.int64)
        return rd.from_pandas(df).repartition(parts), df

    def _brute(self, df, num, den):
        out = []
        for src, g in df.groupby("source"):
            k = (len(g) * num + den - 1) // den
            ranks = g.assign(
                r=[
                    hashlib.md5(f"{s}|{d}".encode()).hexdigest()
                    for s, d in zip(g["source"], g["doc_id"])
                ]
            ).sort_values("r")
            out.append(ranks.head(k)[["doc_id", "source"]])
        return (
            pd.concat(out).sort_values("doc_id").reset_index(drop=True)
        )

    def test_exact_allocation_vs_brute(self, ray_session):
        from gridfia_ray.pipelines.sampling import stratified_sample

        ds, df = self._ds({"a": 50, "b": 7, "c": 1}, parts=6)
        got = (
            stratified_sample(ds, "source", 1, 10, ["doc_id"])
            .to_pandas()[["doc_id", "source"]]
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        # ceil: 50→5, 7→1, 1→1 (every stratum keeps >= 1)
        assert got.groupby("source").size().to_dict() == {"a": 5, "b": 1, "c": 1}
        pd.testing.assert_frame_equal(got, self._brute(df, 1, 10))

    def test_integer_ceil_on_exact_multiples(self, ray_session):
        # IEEE ceil(0.1*50) == 6; the integer path must give 5
        from gridfia_ray.pipelines.sampling import stratified_sample

        ds, _ = self._ds({"a": 50})
        got = stratified_sample(ds, "source", 1, 10, ["doc_id"]).to_pandas()
        assert len(got) == 5

    def test_partition_invariance(self, ray_session):
        from gridfia_ray.pipelines.sampling import stratified_sample

        ds1, _ = self._ds({"a": 33, "b": 20}, parts=1)
        ds2, _ = self._ds({"a": 33, "b": 20}, parts=11)
        a = (
            stratified_sample(ds1, "source", 3, 7, ["doc_id"])
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        b = (
            stratified_sample(ds2, "source", 3, 7, ["doc_id"])
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)

    def test_validation(self, ray_session):
        from gridfia_ray.pipelines.sampling import stratified_sample

        ds, _ = self._ds({"a": 3})
        with pytest.raises(ValueError, match="rational"):
            stratified_sample(ds, "source", 3, 2, ["doc_id"])
        with pytest.raises(ValueError, match="max_keys"):
            stratified_sample(ds, "source", 1, 2, ["doc_id"], max_keys=0)
