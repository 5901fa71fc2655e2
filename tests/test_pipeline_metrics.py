"""End-to-end metrics pipeline vs DuckDB pixel oracle + invariances
(the partition-invariance property is the reference's own
``test_forest_metrics_pipeline.py:188-210`` chunk-equivalence test)."""

import numpy as np
import pytest

from gridfia_ray import fixtures
from gridfia_ray.kernels.registry import registry
from gridfia_ray.pipelines import metrics as M
from gridfia_ray.pipelines.common import GridSpec


@pytest.fixture(scope="module")
def spec(t1_meta):
    return GridSpec.from_fixture_meta(t1_meta)


def _pixels(ray_session, tiles, kernels, spec, catalog, **kw):
    res = M.run_metrics(tiles, kernels, spec, catalog, n_tiles_hint=96, n_species_hint=5, **kw)
    df = M.metrics_to_pixels(res).to_pandas()
    return df.pivot_table(index=["y", "x"], columns="metric", values="value").reset_index()


class TestAgainstOracle:
    @pytest.fixture(scope="class")
    def got(self, ray_session, t1_tiles, spec, t1_catalog):
        ks = registry.from_configs(
            [
                {"name": "species_richness"},
                {"name": "shannon_diversity"},
                {"name": "simpson_diversity"},
                {"name": "evenness"},
                {"name": "total_biomass"},
                {"name": "total_biomass_comparison"},
                {"name": "dominant_species"},
                {"name": "species_proportion", "parameters": {"species_code": "0110"}},
                {"name": "biomass_threshold", "parameters": {"threshold": 50.0}},
                {"name": "rare_species", "parameters": {"occurrence_threshold": 0.05}},
                {"name": "common_species", "parameters": {"occurrence_threshold": 0.5}},
            ]
        )
        return _pixels(ray_session, t1_tiles, ks, spec, t1_catalog, precise=True)

    def test_richness_total_dominant(self, got, duck):
        o = duck.execute(
            """
            WITH p AS (SELECT * FROM pixels WHERE species_code <> '0000'),
            tot AS (SELECT y, x, SUM(biomass) total,
                           COUNT(*) FILTER (biomass > 0) richness FROM p GROUP BY y, x),
            dom AS (SELECT y, x,
                       CASE WHEN MAX(biomass) OVER (PARTITION BY y, x) > 0 THEN species_code END sc,
                       ROW_NUMBER() OVER (PARTITION BY y, x ORDER BY biomass DESC, species_code) rn
                    FROM p),
            cat AS (SELECT species_code, ROW_NUMBER() OVER (ORDER BY species_code) - 1 AS ci
                    FROM (SELECT DISTINCT species_code FROM pixels))
            SELECT t.y, t.x, t.richness, t.total,
                   COALESCE(c.ci, 0) AS dom_idx
            FROM tot t
            JOIN (SELECT y, x, sc FROM dom WHERE rn = 1) d USING (y, x)
            LEFT JOIN cat c ON c.species_code = d.sc
            ORDER BY y, x
            """
        ).df()
        m = o.merge(got, on=["y", "x"])
        assert len(m) == len(o)
        assert (m["richness"] == m["species_richness"]).all()
        assert np.abs(m["total"] - m["total_biomass"]).max() < 1e-9
        assert (m["dom_idx"] == m["dominant_species"]).all()

    def test_diversity_metrics(self, got, duck):
        o = duck.execute(
            """
            WITH p AS (SELECT * FROM pixels WHERE species_code <> '0000'),
            tot AS (SELECT y, x, SUM(biomass) total FROM p GROUP BY y, x),
            s AS (SELECT p.y, p.x,
                    COALESCE(SUM(CASE WHEN p.biomass > 0 AND t.total > 0
                          THEN -(p.biomass/t.total)*LN(p.biomass/t.total) END), 0) shannon,
                    COALESCE(SUM(CASE WHEN t.total > 0 THEN POW(p.biomass/t.total, 2) END), 0) sumsq,
                    COUNT(*) FILTER (p.biomass > 0) rich
                  FROM p JOIN tot t USING (y, x) GROUP BY p.y, p.x)
            SELECT y, x, shannon,
                   CASE WHEN sumsq > 0 THEN 1.0/sumsq ELSE 1.0 END inv_simpson,
                   CASE WHEN rich > 1 THEN shannon/LN(rich) ELSE 0 END evenness
            FROM s
            """
        ).df()
        m = o.merge(got, on=["y", "x"])
        assert np.abs(m["shannon"] - m["shannon_diversity"]).max() < 1e-12
        assert np.abs(m["inv_simpson"] - m["simpson_diversity"]).max() < 1e-12
        assert np.abs(m["evenness_x"] - m["evenness_y"]).max() < 1e-12

    def test_proportion_threshold_comparison(self, got, duck):
        o = duck.execute(
            """
            WITH p AS (SELECT * FROM pixels WHERE species_code <> '0000'),
            tot AS (SELECT y, x, SUM(biomass) total FROM p GROUP BY y, x),
            st AS (SELECT y, x, biomass st_total FROM pixels WHERE species_code = '0000'),
            sp AS (SELECT y, x, biomass b FROM p WHERE species_code = '0110')
            SELECT t.y, t.x,
                   CASE WHEN t.total > 0 THEN sp.b/t.total ELSE 0 END prop,
                   CASE WHEN t.total > 50.0 THEN 1 ELSE 0 END thr,
                   ABS(st.st_total - t.total) cmp
            FROM tot t JOIN sp USING (y, x) JOIN st USING (y, x)
            """
        ).df()
        m = o.merge(got, on=["y", "x"])
        assert np.abs(m["prop"] - m["species_proportion"]).max() < 1e-12
        assert (m["thr"] == m["biomass_threshold"]).all()
        assert np.abs(m["cmp"] - m["total_biomass_comparison"]).max() < 1e-9

    def test_rare_common_global_semantics(self, got, duck):
        o = duck.execute(
            """
            WITH p AS (SELECT * FROM pixels WHERE species_code <> '0000'),
            freq AS (SELECT species_code,
                       COUNT(*) FILTER (biomass > 0) * 1.0 / COUNT(*) f
                     FROM p GROUP BY species_code)
            SELECT p.y, p.x,
              COUNT(*) FILTER (p.biomass > 0 AND freq.f < 0.05) rare,
              COUNT(*) FILTER (p.biomass > 0 AND freq.f >= 0.5) common
            FROM p JOIN freq USING (species_code) GROUP BY p.y, p.x
            """
        ).df()
        m = o.merge(got, on=["y", "x"])
        assert (m["rare"] == m["rare_species"]).all()
        assert (m["common"] == m["common_species"]).all()


class TestInvariance:
    def test_bucket_partition_invariance(self, ray_session, t1_tiles, spec, t1_catalog):
        ks = [registry.create("shannon_diversity"), registry.create("species_richness")]
        a = _pixels(
            ray_session, t1_tiles, ks, spec, t1_catalog, n_buckets=2, precise=True,
            layout="shuffle",
        )
        ks = [registry.create("shannon_diversity"), registry.create("species_richness")]
        b = _pixels(
            ray_session, t1_tiles, ks, spec, t1_catalog, n_buckets=32, precise=True,
            layout="shuffle",
        )
        m = a.merge(b, on=["y", "x"], suffixes=("_a", "_b"))
        assert len(m) == len(a) == len(b)
        assert np.array_equal(m["shannon_diversity_a"], m["shannon_diversity_b"])
        assert np.array_equal(m["species_richness_a"], m["species_richness_b"])

    def test_aligned_equals_shuffle(self, ray_session, t1_tiles, spec, t1_catalog):
        """The zero-shuffle aligned fast path and the general groupby
        exchange must produce identical results (physical-plan
        invariance)."""
        ks = [registry.create("shannon_diversity"), registry.create("dominant_species")]
        a = _pixels(ray_session, t1_tiles, ks, spec, t1_catalog, precise=True, layout="aligned")
        ks = [registry.create("shannon_diversity"), registry.create("dominant_species")]
        b = _pixels(ray_session, t1_tiles, ks, spec, t1_catalog, precise=True, layout="shuffle")
        m = a.merge(b, on=["y", "x"], suffixes=("_a", "_b"))
        assert len(m) == len(a) == len(b) > 0
        assert np.array_equal(m["shannon_diversity_a"], m["shannon_diversity_b"])
        assert np.array_equal(m["dominant_species_a"], m["dominant_species_b"])


class TestEdgeCases:
    def _table(self, cube, catalog):
        return fixtures.tile_table_from_cube(cube.astype(np.float32), catalog, tile=32)

    @pytest.fixture
    def spec(self, t1_meta):
        # edge-case cubes use 32-px tiles → cell grid must match tile size
        base = GridSpec.from_fixture_meta(t1_meta)
        return GridSpec(base.origin_x, base.origin_y, base.px, tile=32)

    def test_all_zero_cube(self, ray_session, spec, t1_catalog):
        cube = np.zeros((3, 64, 64), dtype=np.float32)
        tbl = self._table(cube, [("0000", "Total"), ("0010", "A"), ("0020", "B")])
        ks = [registry.create("species_richness"), registry.create("total_biomass")]
        got = _pixels(ray_session, tbl, ks, spec, ["0000", "0010", "0020"], precise=True)
        assert (got["species_richness"] == 0).all()
        assert (got["total_biomass"] == 0).all()

    def test_single_species(self, ray_session, spec):
        rng = np.random.RandomState(42)
        layer = (rng.rand(64, 64) * 30).astype(np.float32)
        cube = np.stack([layer, layer])
        tbl = self._table(cube, [("0000", "Total"), ("0010", "A")])
        ks = [registry.create("species_richness"), registry.create("total_biomass_comparison")]
        got = _pixels(ray_session, tbl, ks, spec, ["0000", "0010"], precise=True)
        assert got["species_richness"].max() == 1
        assert np.abs(got["total_biomass_comparison"]).max() < 1e-9

    def test_kernel_failure_sentinel(self, ray_session, t1_tiles, spec, t1_catalog):
        """A kernel raising inside the group fn → sentinel tile + status,
        run continues (reference forest_metrics.py:425-437 protocol)."""
        res = M.run_metrics(
            t1_tiles,
            [registry.create("species_proportion", species_code="9999")],  # absent
            spec,
            t1_catalog,
            n_tiles_hint=96,
            n_species_hint=5,
        )
        df = res.to_pandas()
        assert (df["status"].str.startswith("failed:")).all()
        vals = np.frombuffer(df.iloc[0]["pix"], dtype=np.dtype(df.iloc[0]["dtype"]))
        assert np.isnan(vals).all()
