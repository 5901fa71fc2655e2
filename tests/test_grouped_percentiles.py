"""Grouped exact percentiles: numpy k-th order-statistic oracle,
partition invariance, duplicate-heavy groups, group-cardinality guard."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from gridfia_ray.pipelines.percentiles import grouped_percentiles_exact

QS = [2.0, 50.0, 98.0]


def _oracle(df, qs):
    rows = []
    for g, sub in df.groupby("g"):
        v = np.sort(sub["v"].to_numpy(np.float64))
        for q in qs:
            k = max(1, int(np.ceil(q / 100.0 * v.size)))
            rows.append((g, q, v[k - 1]))
    return sorted(rows)


def _got(ds, qs):
    out = grouped_percentiles_exact(ds, "g", "v", qs)
    return sorted(zip(out["g"], out["q_pct"], out["value"]))


class TestGroupedPercentiles:
    def test_matches_order_statistic(self, ray_session):
        rng = np.random.RandomState(1)
        df = pd.DataFrame(
            {"g": rng.randint(0, 11, 30000), "v": rng.randn(30000) * 50 + 10}
        )
        assert _got(rd.from_pandas(df).repartition(7), QS) == _oracle(df, QS)

    def test_partition_invariant(self, ray_session):
        rng = np.random.RandomState(2)
        df = pd.DataFrame({"g": rng.randint(0, 5, 8000), "v": rng.rand(8000)})
        a = _got(rd.from_pandas(df).repartition(2), QS)
        b = _got(rd.from_pandas(df).repartition(23), QS)
        assert a == b == _oracle(df, QS)

    def test_duplicate_heavy_group(self, ray_session):
        """A group that is one repeated value can never shrink below
        collect_limit by bin-splitting — the (value,count) collect path
        must still resolve it exactly."""
        rng = np.random.RandomState(3)
        df = pd.DataFrame(
            {
                "g": np.concatenate([np.zeros(5000, np.int64), np.ones(3000, np.int64)]),
                "v": np.concatenate([np.full(5000, 7.5), rng.rand(3000)]),
            }
        )
        got = _got(rd.from_pandas(df).repartition(4), QS)
        assert got == _oracle(df, QS)
        assert all(v == 7.5 for g, q, v in got if g == 0)

    def test_small_and_skewed_groups(self, ray_session):
        df = pd.DataFrame(
            {"g": [0] + [1] * 999, "v": [42.0] + list(np.linspace(0, 1, 999))}
        )
        got = _got(rd.from_pandas(df).repartition(3), QS)
        assert got == _oracle(df, QS)

    def test_max_groups_guard(self, ray_session):
        df = pd.DataFrame({"g": np.arange(100), "v": np.arange(100, dtype=np.float64)})
        with pytest.raises(ValueError, match="max_groups"):
            grouped_percentiles_exact(
                rd.from_pandas(df), "g", "v", [50.0], max_groups=10
            )

    def test_packed_equals_scalar(self, ray_session):
        rng = np.random.RandomState(5)
        df = pd.DataFrame(
            {"g": rng.randint(0, 4, 9000),
             "v": (rng.rand(9000) * 100).astype(np.float32).astype(np.float64)}
        )
        rows = []
        for g, sub in df.groupby("g"):
            v = sub["v"].to_numpy(np.float32)
            i = 0
            while i < len(v):
                n = int(rng.randint(1, 40))
                rows.append((g, v[i : i + n].astype("<f4").tobytes()))
                i += n
        pk = pd.DataFrame(rows, columns=["g", "vals"])
        a = grouped_percentiles_exact(
            rd.from_pandas(df).repartition(5), "g", "v", QS
        ).sort_values(["g", "q_pct"]).reset_index(drop=True)
        b = grouped_percentiles_exact(
            rd.from_pandas(pk).repartition(3), "g", "vals", QS, packed=True
        ).sort_values(["g", "q_pct"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)

    def test_zonal_percentiles_fixture(self, ray_session):
        """Per-zone percentile over the seeded tile corpus vs an
        independent numpy oracle over the generator's pixel tables."""
        import duckdb

        from gridfia_ray import fixtures
        from gridfia_ray.pipelines import zonal as Z
        from gridfia_ray.pipelines.common import GridSpec

        d = fixtures.ensure_fixture("t1")
        meta = fixtures.fixture_meta("t1")
        import os

        spec = GridSpec.from_fixture_meta(meta)
        rows = Z.zone_value_rows(
            os.path.join(d, "tiles"), Z.load_zones(os.path.join(d, "zones.parquet")), spec
        )
        got = grouped_percentiles_exact(rows, "zone_id", "vals", [50.0], packed=True)
        want = duckdb.sql(
            f"""SELECT z.zone_id, quantile_disc(p.biomass, 0.50) AS v
                FROM read_parquet('{d}/pixels.parquet') p
                JOIN read_parquet('{d}/pixel_zones.parquet') z USING (y, x)
                WHERE p.biomass > 0 AND p.species_code <> '0000'
                GROUP BY z.zone_id"""
        ).df()
        merged = got.merge(want, on="zone_id")
        assert len(merged) == len(want) > 0
        assert (merged["value"] == merged["v"]).all()

    def test_string_keys(self, ray_session):
        rng = np.random.RandomState(4)
        df = pd.DataFrame(
            {"g": rng.choice(["a", "b", "c"], 5000), "v": rng.randn(5000)}
        )
        assert _got(rd.from_pandas(df).repartition(5), QS) == _oracle(df, QS)


class TestKeyDtypes:
    def test_int64_keys_above_2e53_exact(self, ray_session):
        big = np.int64(2**62 + 11)
        df = pd.DataFrame(
            {"g": np.array([big, big, big + 1, big + 1] * 25, np.int64),
             "v": np.tile([1.0, 2.0, 3.0, 4.0], 25)}
        )
        got = grouped_percentiles_exact(rd.from_pandas(df).repartition(3), "g", "v", [50.0])
        assert got["g"].dtype == np.int64
        assert sorted(got["g"]) == [big, big + 1]
        vals = dict(zip(got["g"], got["value"]))
        assert vals[big] == 1.0 and vals[big + 1] == 3.0  # k=ceil(.5*50)=25 → 1st of 50


class TestGroupedMAD:
    def _brute(self, df):
        rows = []
        for g, sub in df.groupby("g"):
            v = np.sort(sub["v"].to_numpy(np.float64))
            k = max(1, int(np.ceil(0.5 * v.size)))
            med = v[k - 1]
            a = np.sort(np.abs(sub["v"].to_numpy(np.float64) - med))
            mad = a[max(1, int(np.ceil(0.5 * a.size))) - 1]
            rows.append((g, med, mad))
        return sorted(rows)

    def test_matches_brute_force(self, ray_session):
        from gridfia_ray.pipelines.percentiles import grouped_mad_exact

        rng = np.random.RandomState(11)
        df = pd.DataFrame(
            {"g": rng.choice(["a", "b", "c", "d"], 4000),
             "v": rng.randint(0, 500, 4000).astype(np.float64)}
        )
        out = grouped_mad_exact(rd.from_pandas(df).repartition(5), "g", "v")
        got = sorted(zip(out["g"], out["median"], out["mad"]))
        assert got == self._brute(df)

    def test_outlier_scrub_semantics(self, ray_session):
        # a planted far outlier is flagged; MAD itself barely moves
        from gridfia_ray.pipelines.percentiles import grouped_mad_exact

        base = np.arange(1.0, 100.0)  # 1..99, med 50, MAD 25
        df = pd.DataFrame({"g": ["s"] * 100, "v": np.append(base, 10_000.0)})
        out = grouped_mad_exact(rd.from_pandas(df).repartition(3), "g", "v")
        med, mad = float(out["median"][0]), float(out["mad"][0])
        assert med == 50.0 and mad == 25.0
        assert np.abs(10_000.0 - med) > 3 * mad  # planted outlier cut
        assert np.abs(99.0 - med) <= 3 * mad  # distribution tail kept

    def test_partition_invariance(self, ray_session):
        from gridfia_ray.pipelines.percentiles import grouped_mad_exact

        rng = np.random.RandomState(17)
        df = pd.DataFrame(
            {"g": rng.randint(0, 5, 2000), "v": rng.randn(2000) * 40}
        )
        a = grouped_mad_exact(rd.from_pandas(df).repartition(2), "g", "v")
        b = grouped_mad_exact(rd.from_pandas(df).repartition(9), "g", "v")
        pd.testing.assert_frame_equal(
            a.sort_values("g").reset_index(drop=True),
            b.sort_values("g").reset_index(drop=True),
        )


def test_empty_input_returns_typed_empty(ray_session):
    from gridfia_ray.pipelines.percentiles import (
        grouped_mad_exact,
        grouped_percentiles_exact,
    )

    empty = pd.DataFrame(
        {"g": pd.Series(dtype=str), "v": pd.Series(dtype=np.float64)}
    )
    out = grouped_percentiles_exact(rd.from_pandas(empty), "g", "v", [50.0])
    assert list(out.columns) == ["g", "q_pct", "value"] and len(out) == 0
    mad = grouped_mad_exact(rd.from_pandas(empty), "g", "v")
    assert list(mad.columns) == ["g", "median", "mad"] and len(mad) == 0
