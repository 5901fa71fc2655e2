"""A7 statistical comparison suite (closed forms + seeded resampling)."""

import numpy as np
import pytest

from gridfia_ray.analysis import stats as S


class TestClosedForms:
    def test_descriptive(self):
        d = S.descriptive(np.array([1.0, 2.0, 3.0, 4.0]))
        assert d["n"] == 4 and d["mean"] == 2.5 and d["median"] == 2.5

    def test_mann_whitney_separated(self):
        r = S.mann_whitney_u(np.arange(20, 40.0), np.arange(0, 20.0))
        assert r["p_value"] < 1e-6 and r["u"] == 0.0

    def test_mann_whitney_identical(self):
        rng = np.random.RandomState(0)
        x = rng.rand(50)
        r = S.mann_whitney_u(x, x.copy())
        assert r["p_value"] > 0.9

    def test_effect_sizes(self):
        rng = np.random.RandomState(1)
        x = rng.normal(1.0, 1.0, 2000)
        y = rng.normal(0.0, 1.0, 2000)
        assert S.cohens_d(x, y) == pytest.approx(1.0, abs=0.1)
        assert abs(S.hedges_g(x, y) - S.cohens_d(x, y)) < 0.01
        assert S.cliffs_delta(x, y) > 0.4
        assert S.cliffs_delta(y, x) < -0.4

    def test_cliffs_delta_matches_naive(self):
        rng = np.random.RandomState(2)
        x, y = rng.rand(40), rng.rand(37)
        naive = np.mean(np.sign(x[:, None] - y[None, :]))
        assert S.cliffs_delta(x, y) == pytest.approx(float(naive))

    def test_bh_fdr(self):
        p = [0.01, 0.02, 0.03, 0.04, 0.5]
        adj = S.benjamini_hochberg(p)
        assert adj[0] == pytest.approx(0.05)  # 0.01*5/1 capped by monotonicity
        assert adj[4] == pytest.approx(0.5)
        assert all(a >= b for a, b in zip(adj, p))


class TestResampling:
    def test_bootstrap_reproducible_and_sane(self, ray_session):
        rng = np.random.RandomState(3)
        x = rng.normal(2.0, 1.0, 200)
        y = rng.normal(0.0, 1.0, 200)
        r1 = S.bootstrap_mean_diff_ci(x, y, n_iterations=200, seed=7)
        r2 = S.bootstrap_mean_diff_ci(x, y, n_iterations=200, seed=7)
        assert r1 == r2  # seeded per-iteration RNG → parallelism-invariant
        assert r1["ci_low"] < r1["observed"] < r1["ci_high"]
        assert r1["ci_low"] > 1.0  # clearly separated groups

    def test_permutation_detects_difference(self, ray_session):
        rng = np.random.RandomState(4)
        x = rng.normal(1.0, 1.0, 100)
        y = rng.normal(0.0, 1.0, 100)
        r = S.permutation_test_mean_diff(x, y, n_iterations=200, seed=7)
        assert r["p_value"] < 0.05

    def test_permutation_null(self, ray_session):
        rng = np.random.RandomState(5)
        x = rng.normal(0.0, 1.0, 100)
        y = rng.normal(0.0, 1.0, 100)
        r = S.permutation_test_mean_diff(x, y, n_iterations=200, seed=7)
        assert r["p_value"] > 0.05


class TestJobSpec:
    def test_from_json(self, tmp_path):
        import json

        from gridfia_ray.config import JobSpec

        p = tmp_path / "job.json"
        p.write_text(
            json.dumps(
                {
                    "tiles_path": "/x/tiles",
                    "calculations": [
                        {"name": "species_richness"},
                        {"name": "shannon_diversity", "enabled": False},
                        "total_biomass",
                    ],
                }
            )
        )
        spec = JobSpec.load(str(p))
        ks = spec.build_kernels()
        assert [k.name for k in ks] == ["species_richness", "total_biomass"]

    def test_rejects_unknown(self):
        from gridfia_ray.config import JobSpec

        with pytest.raises(KeyError):
            JobSpec.from_dict({"tiles_path": "/x", "calculations": ["nope"]})

    def test_rejects_empty(self):
        from gridfia_ray.config import JobSpec
        from gridfia_ray.exceptions import CalculationFailed

        with pytest.raises(CalculationFailed):
            JobSpec.from_dict({"tiles_path": "/x", "calculations": []})


class TestGroupedCorrelation:
    def test_matches_numpy_corrcoef(self, ray_session):
        # the contract query's moment math vs np.corrcoef on the same
        # quantized values, via the same public entry point
        import duckdb

        from gridfia_ray.contract import q_rel_correlation

        sf = "/root/testdata/sf0.001"
        out = q_rel_correlation(sf)
        li = duckdb.sql(
            f"SELECT l_returnflag, CAST(FLOOR(l_quantity+0.5) AS BIGINT) x,"
            f" CAST(FLOOR(l_extendedprice+0.5) AS BIGINT) y"
            f" FROM read_parquet('{sf}/lineitem.parquet')"
        ).df()
        for flag, sub in li.groupby("l_returnflag"):
            want = np.corrcoef(sub["x"], sub["y"])[0, 1]
            got = out.loc[out["l_returnflag"] == flag, "r_u"].iloc[0] / 1e6
            assert abs(got - want) < 2e-6, (flag, got, want)
