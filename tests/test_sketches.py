"""HyperLogLog: accuracy vs exact, determinism, merge/partition
invariance, register-level brute-force oracle."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from gridfia_ray.analysis.sketches import hll_distinct, hll_estimate, hll_registers


def _brute_registers(hashes, p):
    regs = np.zeros(1 << p, dtype=np.uint8)
    for h in hashes:
        h = int(h)
        idx = h >> (64 - p)
        suffix = (h << p) & ((1 << 64) - 1)
        if suffix == 0:
            rank = 64 - p + 1
        else:
            rank = 1
            while not (suffix >> 63) & 1:
                rank += 1
                suffix = (suffix << 1) & ((1 << 64) - 1)
        regs[idx] = max(regs[idx], rank)
    return regs


class TestRegisters:
    def test_matches_scalar_oracle(self):
        rng = np.random.RandomState(0)
        hashes = rng.randint(0, 2**63, 2000).astype(np.uint64) * np.uint64(2) + np.uint64(1)
        # include edge values
        hashes = np.concatenate([hashes, np.array([0, 1, 2**63, 2**64 - 1], np.uint64)])
        for p in (4, 10, 14):
            got = hll_registers(hashes, p)
            want = _brute_registers(hashes, p)
            assert (got == want).all(), p

    def test_merge_is_max(self):
        rng = np.random.RandomState(1)
        a = rng.randint(0, 2**63, 500).astype(np.uint64)
        b = rng.randint(0, 2**63, 500).astype(np.uint64)
        merged = np.maximum(hll_registers(a, 10), hll_registers(b, 10))
        assert (merged == hll_registers(np.concatenate([a, b]), 10)).all()


class TestEstimate:
    def test_accuracy_bands(self):
        rng = np.random.RandomState(2)
        p = 12
        for n in (100, 5_000, 200_000):
            hashes = rng.randint(0, 2**63, n).astype(np.uint64) * np.uint64(2654435761)
            hashes = np.unique(hashes)
            est = hll_estimate(hll_registers(hashes, p))
            rel = abs(est - len(hashes)) / len(hashes)
            assert rel < 5 * 1.04 / np.sqrt(1 << p), (n, est)

    def test_duplicates_dont_inflate(self):
        rng = np.random.RandomState(3)
        base = rng.randint(0, 2**63, 1000).astype(np.uint64)
        once = hll_estimate(hll_registers(base, 12))
        tiled = hll_estimate(hll_registers(np.tile(base, 50), 12))
        assert once == tiled  # registers are idempotent in the value set


class TestDistributed:
    def test_matches_exact_and_partition_invariant(self, ray_session):
        rng = np.random.RandomState(4)
        vals = rng.randint(0, 3000, 20_000).astype(np.int64)
        df = pd.DataFrame({"user_id": vals})
        exact = df["user_id"].nunique()
        a = hll_distinct(rd.from_pandas(df).repartition(3), ["user_id"], p=12)
        b = hll_distinct(rd.from_pandas(df).repartition(17), ["user_id"], p=12)
        assert a == b  # bit-deterministic across partitionings
        assert abs(a - exact) / exact < 5 * 1.04 / np.sqrt(4096)

    def test_custom_hash_fn(self, ray_session):
        from gridfia_ray.text.hashing import token_hashes64, unique_per_doc

        texts = ["alpha bravo charlie", "bravo delta", "alpha echo foxtrot"]
        df = pd.DataFrame({"text": texts})

        def tok_hashes(batch):
            th, counts = token_hashes64(batch["text"].fillna("").tolist())
            return th

        est = hll_distinct(rd.from_pandas(df), ["text"], p=14, hash_fn=tok_hashes)
        # 7 distinct tokens; at p=14 linear counting is near-exact
        assert abs(est - 7) < 1

    def test_bad_p_rejected(self, ray_session):
        with pytest.raises(ValueError, match="p must be"):
            hll_distinct(rd.from_pandas(pd.DataFrame({"x": [1]})), ["x"], p=2)


class TestCountMin:
    def test_never_undercounts_and_tight_when_wide(self):
        from gridfia_ray.analysis.sketches import cms_estimate, cms_from_hashes

        rng = np.random.RandomState(7)
        hashes = rng.randint(0, 2**63, 500).astype(np.uint64)
        counts = rng.randint(1, 100, 500).astype(np.int64)
        # aggregate duplicates for the truth table
        uh, inv = np.unique(hashes, return_inverse=True)
        true = np.zeros(uh.size, np.int64)
        np.add.at(true, inv, counts)
        sk = cms_from_hashes(uh, true, 4, 1 << 16)
        est = cms_estimate(sk, uh, 4, 1 << 16)
        assert (est >= true).all()  # the CMS invariant
        assert (est == true).mean() > 0.99  # wide sketch ≈ exact

    def test_linear_merge(self):
        from gridfia_ray.analysis.sketches import cms_from_hashes

        rng = np.random.RandomState(8)
        h1 = rng.randint(0, 2**63, 200).astype(np.uint64)
        h2 = rng.randint(0, 2**63, 200).astype(np.uint64)
        c1 = np.ones(200, np.int64)
        c2 = np.full(200, 3, np.int64)
        merged = cms_from_hashes(h1, c1, 3, 512) + cms_from_hashes(h2, c2, 3, 512)
        both = cms_from_hashes(np.concatenate([h1, h2]), np.concatenate([c1, c2]), 3, 512)
        assert (merged == both).all()


class TestHeavyHitters:
    def _docs(self, rng, n=400):
        heavy = ["alpha", "bravo", "charlie"]
        rare = [f"tok{i}" for i in range(200)]
        texts = []
        for _ in range(n):
            toks = [heavy[rng.randint(3)] for _ in range(8)]
            toks += [rare[rng.randint(200)] for _ in range(4)]
            texts.append(" ".join(toks))
        return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64), "text": texts})

    def _items_fn(self):
        import re

        from gridfia_ray.text.hashing import token_hashes64

        ws = re.compile(r"\S+")

        def items_fn(batch):
            texts = batch["text"].fillna("").tolist()
            toks = []
            for t in texts:
                toks.extend(ws.findall(t))
            hashes, _ = token_hashes64(texts)
            return np.array(toks, dtype=object), hashes

        return items_fn

    def test_exact_even_with_collisions(self, ray_session):
        from gridfia_ray.analysis.sketches import heavy_hitters_exact

        rng = np.random.RandomState(9)
        df = self._docs(rng)
        ds = rd.from_pandas(df).repartition(5)
        # w=32 forces heavy CMS collisions: candidates over-admit, the
        # exact verify pass must still produce the precise answer
        got = heavy_hitters_exact(ds, self._items_fn(), 500, d=3, w=32)
        toks = pd.Series(
            [t for s in df["text"] for t in s.split()]
        ).value_counts()
        want = toks[toks >= 500].sort_index()
        assert got["item"].tolist() == list(want.index)
        assert got["n"].tolist() == want.tolist()

    def test_partition_invariant(self, ray_session):
        from gridfia_ray.analysis.sketches import heavy_hitters_exact

        df = self._docs(np.random.RandomState(10), n=150)
        a = heavy_hitters_exact(rd.from_pandas(df).repartition(2), self._items_fn(), 300)
        b = heavy_hitters_exact(rd.from_pandas(df).repartition(11), self._items_fn(), 300)
        pd.testing.assert_frame_equal(a, b)


class TestGroupedHll:
    @staticmethod
    def _frame(seed=7):
        rng = np.random.RandomState(seed)
        # skewed group sizes: one hot group, several small ones
        groups = np.concatenate(
            [
                np.repeat("day-hot", 30_000),
                np.repeat("day-mid", 4_000),
                np.repeat("day-a", 400),
                np.repeat("day-b", 40),
                np.repeat("day-one", 1),
            ]
        )
        members = np.concatenate(
            [
                rng.randint(0, 9_000, 30_000),
                rng.randint(0, 800, 4_000),
                rng.randint(0, 150, 400),
                rng.randint(0, 25, 40),
                np.array([123]),
            ]
        ).astype(np.int64)
        return pd.DataFrame({"grp": groups, "member": members})

    def test_matches_exact_within_error(self, ray_session):
        from gridfia_ray.analysis.sketches import grouped_hll_distinct

        df = self._frame()
        exact = df.groupby("grp")["member"].nunique()
        out = (
            grouped_hll_distinct(
                rd.from_pandas(df).repartition(7), ["grp"], ["member"], p=12
            )
            .to_pandas()
            .set_index("grp")["approx_distinct"]
        )
        assert set(out.index) == set(exact.index)
        for g in exact.index:
            rel = abs(out[g] - exact[g]) / max(1, exact[g])
            assert rel < 5 * 1.04 / np.sqrt(4096), (g, out[g], exact[g])
        # tiny groups hit linear counting: near-exact
        assert abs(out["day-one"] - 1) < 0.01
        assert abs(out["day-b"] - exact["day-b"]) <= 1

    def test_partition_and_bucket_invariant(self, ray_session):
        from gridfia_ray.analysis.sketches import grouped_hll_distinct

        df = self._frame()
        a = (
            grouped_hll_distinct(
                rd.from_pandas(df).repartition(3), ["grp"], ["member"], p=11,
                n_buckets=4,
            )
            .to_pandas()
            .sort_values("grp", ignore_index=True)
        )
        b = (
            grouped_hll_distinct(
                rd.from_pandas(df).repartition(23), ["grp"], ["member"], p=11,
                n_buckets=32,
            )
            .to_pandas()
            .sort_values("grp", ignore_index=True)
        )
        pd.testing.assert_frame_equal(a, b)  # bit-deterministic

    def test_matches_sequential_register_replay(self, ray_session):
        """The distributed merge must equal a single-process fold of
        the same per-group registers (the pinned-oracle standard)."""
        from gridfia_ray.analysis.sketches import (
            _hash_columns,
            grouped_hll_distinct,
            hll_estimate,
            hll_registers,
        )

        df = self._frame(seed=13)
        p = 10
        expected = {}
        for g, sub in df.groupby("grp"):
            regs = hll_registers(_hash_columns(sub, ["member"]), p)
            expected[g] = hll_estimate(regs)
        out = (
            grouped_hll_distinct(
                rd.from_pandas(df).repartition(9), ["grp"], ["member"], p=p
            )
            .to_pandas()
            .set_index("grp")["approx_distinct"]
        )
        for g, e in expected.items():
            assert out[g] == e, g

    def test_bad_p_rejected(self, ray_session):
        from gridfia_ray.analysis.sketches import grouped_hll_distinct

        with pytest.raises(ValueError, match="p must be"):
            grouped_hll_distinct(
                rd.from_pandas(pd.DataFrame({"g": ["a"], "x": [1]})), ["g"], ["x"], p=17
            )


class TestGroupedDDQuantiles:
    @staticmethod
    def _frame(seed=3):
        rng = np.random.RandomState(seed)
        return pd.DataFrame(
            {
                "grp": np.repeat(["lat", "thr", "err"], [40_000, 8_000, 300]),
                "v": np.concatenate(
                    [
                        rng.lognormal(3, 1, 40_000),  # latency-like
                        np.abs(rng.standard_normal(8_000)) * 50,  # throughput-ish
                        # signed + zeros + sub-unit magnitudes
                        np.concatenate(
                            [-rng.lognormal(0, 1, 200), np.zeros(50),
                             rng.uniform(0.01, 0.5, 50)]
                        ),
                    ]
                ),
            }
        )

    def test_relative_error_guarantee_per_group(self, ray_session):
        from gridfia_ray.analysis.sketches import grouped_dd_quantiles

        df = self._frame()
        qs = [1.0, 50.0, 99.0]
        out = (
            grouped_dd_quantiles(
                rd.from_pandas(df).repartition(9), ["grp"], "v", qs, alpha=0.01
            )
            .to_pandas()
            .set_index("grp")
        )
        for g, sub in df.groupby("grp"):
            exact = np.percentile(sub["v"], qs, method="inverted_cdf")
            for qc, e in zip(["q1", "q50", "q99"], exact):
                got = out.loc[g, qc]
                if e == 0.0:
                    assert got == 0.0
                else:
                    assert abs(got - e) / abs(e) <= 0.011, (g, qc, got, e)

    def test_partition_and_bucket_invariant(self, ray_session):
        from gridfia_ray.analysis.sketches import grouped_dd_quantiles

        df = self._frame(seed=11)
        a = (
            grouped_dd_quantiles(
                rd.from_pandas(df).repartition(2), ["grp"], "v", [25.0, 75.0],
                alpha=0.02, n_buckets=4,
            )
            .to_pandas().sort_values("grp", ignore_index=True)
        )
        b = (
            grouped_dd_quantiles(
                rd.from_pandas(df).repartition(31), ["grp"], "v", [25.0, 75.0],
                alpha=0.02, n_buckets=32,
            )
            .to_pandas().sort_values("grp", ignore_index=True)
        )
        pd.testing.assert_frame_equal(a, b)  # bit-deterministic

    def test_bad_inputs_rejected(self, ray_session):
        from gridfia_ray.analysis.sketches import (
            dd_bucket_keys,
            dd_quantiles_from_counts,
            grouped_dd_quantiles,
        )

        with pytest.raises(ValueError, match="alpha"):
            grouped_dd_quantiles(
                rd.from_pandas(pd.DataFrame({"g": ["a"], "v": [1.0]})),
                ["g"], "v", [50.0], alpha=1.5,
            )
        with pytest.raises(ValueError, match="non-finite"):
            dd_bucket_keys(np.array([1.0, np.nan]), 0.01)
        with pytest.raises(ValueError, match="quantile"):
            dd_quantiles_from_counts(
                np.array([0], dtype=np.int64), np.array([1]), [101.0], 0.01
            )
        with pytest.raises(ValueError, match="empty"):
            dd_quantiles_from_counts(
                np.array([], dtype=np.int64), np.array([], dtype=np.int64),
                [50.0], 0.01,
            )
