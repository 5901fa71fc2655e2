"""Ordinary kriging: model fit recovery, brute-force equality,
partition invariance, exactness properties, and validation errors."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from gridfia_ray.pipelines import kriging as KR
from gridfia_ray.pipelines.common import GridSpec


def _plots(n=200, seed=11, domain=2000.0):
    rng = np.random.RandomState(seed)
    return {
        "x": rng.uniform(0, domain, n),
        "y": -rng.uniform(0, domain, n),
        "value": rng.uniform(10, 90, n),
    }


MODEL = {"model": "spherical", "nugget": 1.0, "psill": 200.0, "range": 600.0}
SPEC = GridSpec(origin_x=0.0, origin_y=0.0, px=128.0, tile=1)


def brute_ok(plots, qx, qy, model, k):
    """Independent sequential OK: full distance scan, stable top-k."""
    px, py, pv = plots["x"], plots["y"], plots["value"]
    d = np.sqrt((px - qx) ** 2 + (py - qy) ** 2)
    order = np.lexsort((np.arange(d.size), d))[: min(k, d.size)]
    kk = order.size
    dm = np.sqrt(
        (px[order][:, None] - px[order][None, :]) ** 2
        + (py[order][:, None] - py[order][None, :]) ** 2
    )
    A = np.zeros((kk + 1, kk + 1))
    A[:kk, :kk] = KR.model_gamma(dm, model)
    A[kk, :kk] = A[:kk, kk] = 1.0
    b = np.ones(kk + 1)
    b[:kk] = KR.model_gamma(d[order], model)
    w = np.linalg.solve(A, b)
    return float(w[:kk] @ pv[order]), float(w[:kk] @ b[:kk] + w[kk]), kk


def _points(n=60, seed=5, domain=2000.0):
    rng = np.random.RandomState(seed)
    return pa.table(
        {
            "point_id": pa.array(np.arange(n, dtype=np.int64)),
            "x": pa.array(rng.uniform(0, domain, n)),
            "y": pa.array(-rng.uniform(0, domain, n)),
        }
    )


class TestModelGamma:
    def test_zero_at_origin_and_sill_at_range(self):
        for kind in ("spherical", "exponential", "gaussian"):
            m = {"model": kind, "nugget": 2.0, "psill": 10.0, "range": 100.0}
            g = KR.model_gamma(np.array([0.0, 100.0, 1e6]), m)
            assert g[0] == 0.0
            assert g[2] == pytest.approx(12.0, rel=0.05)  # nugget + sill
            if kind == "spherical":
                assert g[1] == pytest.approx(12.0)

    def test_unknown_model_raises(self):
        with pytest.raises(ValueError, match="unknown variogram model"):
            KR.model_gamma(np.array([1.0]), {"model": "cubic", "nugget": 0,
                                             "psill": 1, "range": 1})


class TestFit:
    def test_recovers_known_params(self):
        true = {"model": "spherical", "nugget": 3.0, "psill": 40.0, "range": 750.0}
        h = np.arange(50.0, 1600.0, 50.0)
        g = KR.model_gamma(h, true)
        fit = KR.fit_variogram_model(h, g, model="spherical",
                                     range_candidates=np.arange(50.0, 1600.0, 25.0))
        assert fit["nugget"] == pytest.approx(3.0, abs=0.5)
        assert fit["psill"] == pytest.approx(40.0, rel=0.05)
        assert fit["range"] == pytest.approx(750.0, abs=25.0)

    def test_deterministic(self):
        h = np.arange(10.0, 500.0, 10.0)
        g = KR.model_gamma(h, MODEL) * (1 + 0.01 * np.sin(h))
        a = KR.fit_variogram_model(h, g)
        b = KR.fit_variogram_model(h, g)
        assert a == b

    def test_pure_nugget_degenerate(self):
        h = np.arange(1.0, 20.0)
        fit = KR.fit_variogram_model(h, np.full(19, 7.0))
        assert fit["psill"] == pytest.approx(0.0, abs=1e-9)
        assert fit["nugget"] == pytest.approx(7.0)

    def test_too_few_lags_raises(self):
        with pytest.raises(ValueError, match=">= 3"):
            KR.fit_variogram_model(np.array([1.0, 2.0]), np.array([1.0, 2.0]))

    def test_fit_from_empirical_pools_directions(self):
        import pandas as pd

        true = {"model": "exponential", "nugget": 0.5, "psill": 12.0, "range": 300.0}
        lags = np.array([1, 2, 4, 8, 16, 32])
        rows = []
        for direction in ("e", "s"):
            for lag in lags:
                rows.append(
                    {
                        "direction": direction,
                        "lag": lag,
                        "gamma": float(KR.model_gamma(np.array([lag * 30.0]), true)[0]),
                        "n_pairs": 1000,
                    }
                )
        fit = KR.fit_from_empirical(pd.DataFrame(rows), cell_size=30.0,
                                    model="exponential")
        assert fit["psill"] == pytest.approx(12.0, rel=0.15)


class TestKrigePoints:
    def test_matches_brute_force(self, ray_session):
        plots = _plots()
        pts = _points()
        got = (
            KR.krige_points(rd.from_arrow(pts), plots, SPEC, MODEL, k=8)
            .to_pandas()
            .sort_values("point_id")
            .reset_index(drop=True)
        )
        xs = pts["x"].to_numpy()
        ys = pts["y"].to_numpy()
        for i in range(len(got)):
            ep, ev, ek = brute_ok(plots, xs[i], ys[i], MODEL, 8)
            assert got["pred"][i] == pytest.approx(ep, abs=1e-9)
            assert got["krig_var"][i] == pytest.approx(ev, abs=1e-9)
            assert got["k_used"][i] == ek

    def test_partition_invariance(self, ray_session):
        plots = _plots(seed=21)
        pts = _points(n=40, seed=9)
        a = (
            KR.krige_points(rd.from_arrow(pts), plots, SPEC, MODEL, k=6)
            .to_pandas().sort_values("point_id").reset_index(drop=True)
        )
        b = (
            KR.krige_points(
                rd.from_arrow(pts).repartition(13), plots, SPEC, MODEL, k=6
            ).to_pandas().sort_values("point_id").reset_index(drop=True)
        )
        assert (a["pred"] == b["pred"]).all()  # bit-exact, not approx
        assert (a["krig_var"] == b["krig_var"]).all()

    def test_exact_hit_with_zero_nugget_interpolates(self, ray_session):
        plots = _plots(n=50, seed=3)
        m = dict(MODEL, nugget=0.0)
        pts = pa.table(
            {
                "point_id": pa.array([0], pa.int64()),
                "x": pa.array([plots["x"][7]]),
                "y": pa.array([plots["y"][7]]),
            }
        )
        got = KR.krige_points(rd.from_arrow(pts), plots, SPEC, m, k=8).to_pandas()
        assert got["pred"][0] == pytest.approx(plots["value"][7], abs=1e-6)
        assert got["krig_var"][0] == pytest.approx(0.0, abs=1e-6)

    def test_k_clamped_to_plot_count(self, ray_session):
        plots = _plots(n=4, seed=8)
        got = KR.krige_points(
            rd.from_arrow(_points(n=5)), plots, SPEC, MODEL, k=8
        ).to_pandas()
        assert (got["k_used"] == 4).all()

    def test_duplicate_plot_locations_raise(self, ray_session):
        plots = _plots(n=10, seed=4)
        plots["x"][3] = plots["x"][5]
        plots["y"][3] = plots["y"][5]
        with pytest.raises(Exception, match="duplicate plot locations"):
            KR.krige_points(
                rd.from_arrow(_points(n=4)), plots, SPEC, MODEL, k=4
            ).materialize()

    def test_weights_sum_to_one_unbiasedness(self, ray_session):
        # constant field ⇒ OK (weights summing to 1) predicts it exactly
        plots = _plots(n=120, seed=13)
        plots["value"] = np.full_like(plots["value"], 42.5)
        got = KR.krige_points(
            rd.from_arrow(_points(n=25, seed=2)), plots, SPEC, MODEL, k=8
        ).to_pandas()
        assert np.allclose(got["pred"], 42.5, atol=1e-8)


class TestKrigeTiles:
    def test_tile_centers_match_point_path(self, ray_session, t1_tiles, t1_dir, t1_meta):
        import os

        from gridfia_ray.pipelines.knn import load_plots

        spec = GridSpec.from_fixture_meta(t1_meta)
        plots = load_plots(os.path.join(t1_dir, "plots.parquet"))
        m = {"model": "exponential", "nugget": 0.2, "psill": 150.0,
             "range": 3 * spec.cell_size}
        got = KR.krige_tiles(t1_tiles, plots, spec, m, k=4).to_pandas()
        assert len(got) == 16
        for _, r in got.iterrows():
            ep, ev, ek = brute_ok(plots, r.cx, r.cy, m, 4)
            assert r.pred == pytest.approx(ep, abs=1e-9)
            assert r.krig_var == pytest.approx(ev, abs=1e-9)


class TestKrigPinContract:
    def test_query_matches_pinned_replay(self, ray_session):
        import duckdb

        from gridfia_ray.contract import build_oracle_sql, build_queries

        got = build_queries()["gf_kriging"]("unused")
        exp = duckdb.sql(build_oracle_sql()["gf_kriging"]).df()
        assert len(got) == 400
        assert (got["pred_u"].to_numpy() == exp["pred_u"].to_numpy()).all()
        assert (got["var_u"].to_numpy() == exp["var_u"].to_numpy()).all()
        assert (got["k_used"].to_numpy() == exp["k_used"].to_numpy()).all()
