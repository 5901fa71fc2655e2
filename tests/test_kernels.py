"""Closed-form kernel unit tests — the tabular clone of the reference's
``tests/unit/test_*_calculations.py`` strategy (SURVEY.md §5)."""

import numpy as np
import pytest

from gridfia_ray.kernels.base import KernelContext
from gridfia_ray.kernels.registry import registry

CODES = np.array(["0000", "0010", "0020", "0030"])
CATALOG = ["0000", "0010", "0020", "0030"]


@pytest.fixture
def stack():
    a = np.array([[10.0, 0.0], [5.0, 0.0]])
    b = np.array([[30.0, 0.0], [5.0, 20.0]])
    c = np.array([[0.0, 0.0], [10.0, 0.0]])
    return np.stack([a + b + c, a, b, c])


@pytest.fixture
def ctx():
    return KernelContext(catalog=CATALOG)


def run(name, stack, ctx, **params):
    return registry.create(name, **params).calculate(stack, CODES, ctx)


class TestRichness:
    def test_counts(self, stack, ctx):
        assert run("species_richness", stack, ctx).tolist() == [[2, 0], [3, 1]]

    def test_threshold(self, stack, ctx):
        out = run("species_richness", stack, ctx, biomass_threshold=7.0)
        assert out.tolist() == [[2, 0], [1, 1]]

    def test_total_row_excluded(self, stack, ctx):
        """The '0000' row must not count as a species."""
        with_total = registry.create("species_richness").calculate(stack, CODES, ctx)
        without = registry.create("species_richness").calculate(stack[1:], CODES[1:], ctx)
        assert np.array_equal(with_total, without)


class TestShannon:
    def test_closed_form(self, stack, ctx):
        out = run("shannon_diversity", stack, ctx)
        p = np.array([0.25, 0.75])
        assert out[0, 0] == pytest.approx(float(-(p * np.log(p)).sum()))
        p = np.array([0.25, 0.25, 0.5])
        assert out[1, 0] == pytest.approx(float(-(p * np.log(p)).sum()))
        assert out[0, 1] == 0.0  # empty pixel
        assert out[1, 1] == 0.0  # single species

    def test_log2_base(self, stack, ctx):
        nat = run("shannon_diversity", stack, ctx)
        b2 = run("shannon_diversity", stack, ctx, base="2")
        nz = nat > 0
        assert np.allclose(b2[nz], nat[nz] / np.log(2))


class TestSimpson:
    def test_inverse(self, stack, ctx):
        out = run("simpson_diversity", stack, ctx)
        assert out[0, 0] == pytest.approx(1.0 / (0.25**2 + 0.75**2))
        assert out[0, 1] == 1.0  # empty pixel, extent has biomass
        assert out[1, 1] == pytest.approx(1.0)  # monoculture

    def test_plain(self, stack, ctx):
        out = run("simpson_diversity", stack, ctx, inverse=False)
        assert out[0, 0] == pytest.approx(0.25**2 + 0.75**2)
        assert out[0, 1] == 0.0

    def test_empty_extent(self, stack):
        ctx = KernelContext(catalog=CATALOG, extent_has_biomass=False)
        out = run("simpson_diversity", np.zeros_like(stack), ctx)
        assert (out == 0).all()


class TestEvenness:
    def test_closed_form(self, stack, ctx):
        sh = run("shannon_diversity", stack, ctx)
        out = run("evenness", stack, ctx)
        assert out[0, 0] == pytest.approx(sh[0, 0] / np.log(2))
        assert out[1, 0] == pytest.approx(sh[1, 0] / np.log(3))
        assert out[0, 1] == 0.0 and out[1, 1] == 0.0  # richness <= 1


class TestTotals:
    def test_total_biomass(self, stack, ctx):
        assert run("total_biomass", stack, ctx).tolist() == [[40.0, 0.0], [20.0, 20.0]]

    def test_comparison_zero_when_consistent(self, stack, ctx):
        assert (run("total_biomass_comparison", stack, ctx) == 0).all()

    def test_comparison_detects_drift(self, stack, ctx):
        bad = stack.copy()
        bad[0, 0, 0] += 5.0
        out = run("total_biomass_comparison", bad, ctx)
        assert out[0, 0] == pytest.approx(5.0)

    def test_comparison_nan_without_total(self, stack, ctx):
        out = registry.create("total_biomass_comparison").calculate(stack[1:], CODES[1:], ctx)
        assert np.isnan(out).all()


class TestProportions:
    def test_species_proportion(self, stack, ctx):
        out = run("species_proportion", stack, ctx, species_code="0020")
        assert out[0, 0] == pytest.approx(0.75)
        assert out[1, 1] == pytest.approx(1.0)
        assert out[0, 1] == 0.0

    def test_percentage(self, stack, ctx):
        assert run("species_percentage", stack, ctx, species_code="0020")[0, 0] == pytest.approx(75.0)

    def test_total_rejected(self, stack, ctx):
        with pytest.raises(ValueError):
            run("species_proportion", stack, ctx, species_code="0000")

    def test_group_proportion(self, stack, ctx):
        out = run("species_group_proportion", stack, ctx, species_codes=["0010", "0030"])
        assert out[0, 0] == pytest.approx(0.25)
        assert out[1, 0] == pytest.approx(0.75)

    def test_group_rejects_total(self, stack, ctx):
        with pytest.raises(ValueError):
            run("species_group_proportion", stack, ctx, species_codes=["0000", "0010"])


class TestThresholdDominance:
    def test_threshold_above(self, stack, ctx):
        assert run("biomass_threshold", stack, ctx, threshold=25.0).tolist() == [[1, 0], [0, 0]]

    def test_threshold_below(self, stack, ctx):
        assert run("biomass_threshold", stack, ctx, threshold=25.0, above=False).tolist() == [
            [0, 1],
            [1, 1],
        ]

    def test_dominant_species(self, stack, ctx):
        out = run("dominant_species", stack, ctx)
        # (0,0): B wins -> catalog idx 2; (1,0): C wins -> 3; empty -> 0
        assert out.tolist() == [[2, 0], [3, 2]]

    def test_dominant_min_biomass(self, stack, ctx):
        out = run("dominant_species", stack, ctx, min_biomass=25.0)
        assert out.tolist() == [[2, 0], [0, 0]]

    def test_presence(self, stack, ctx):
        assert run("species_presence", stack, ctx, species_code="0010").tolist() == [[1, 0], [1, 0]]
        assert run(
            "species_presence", stack, ctx, species_code="0010", threshold=7.0
        ).tolist() == [[1, 0], [0, 0]]


class TestGlobalTwoPhase:
    def test_dominance_broadcast(self, stack):
        ctx = KernelContext(catalog=CATALOG, dominance_percent={"0020": 50.0})
        out = run("species_dominance", stack, ctx, species_code="0020")
        assert (out == 50.0).all()

    def test_dominance_requires_context(self, stack, ctx):
        with pytest.raises(ValueError):
            run("species_dominance", stack, ctx, species_code="0020")

    def test_rare_counts(self, stack):
        ctx = KernelContext(
            catalog=CATALOG, occurrence_freq={"0010": 0.005, "0020": 0.8, "0030": 0.005}
        )
        out = run("rare_species", stack, ctx)  # rare: 0010, 0030 (freq < 0.01)
        assert out.tolist() == [[1, 0], [2, 0]]

    def test_common_counts(self, stack):
        ctx = KernelContext(
            catalog=CATALOG, occurrence_freq={"0010": 0.005, "0020": 0.8, "0030": 0.005}
        )
        out = run("common_species", stack, ctx)
        assert out.tolist() == [[1, 0], [1, 1]]

    def test_rare_requires_context(self, stack, ctx):
        with pytest.raises(ValueError):
            run("rare_species", stack, ctx)


class TestRegistry:
    def test_unknown_kernel(self):
        with pytest.raises(KeyError):
            registry.create("nope")

    def test_from_configs_respects_enabled(self):
        ks = registry.from_configs(
            [
                {"name": "species_richness", "enabled": True},
                {"name": "shannon_diversity", "enabled": False},
                {"name": "biomass_threshold", "parameters": {"threshold": 5.0}},
            ]
        )
        assert [k.name for k in ks] == ["species_richness", "biomass_threshold"]
        assert ks[1].params["threshold"] == 5.0

    def test_runtime_registration(self):
        from gridfia_ray.kernels.base import Kernel
        from gridfia_ray.kernels.registry import KernelRegistry

        class CoefVar(Kernel):  # the reference's demo custom calc
            name = "coef_var"

            def calculate(self, stack, codes, ctx):
                from gridfia_ray.kernels.base import split_total

                _, sp, _ = split_total(stack, codes)
                m = sp.mean(axis=0)
                out = np.zeros_like(m)
                nz = m > 0
                out[nz] = sp.std(axis=0)[nz] / m[nz]
                return out

        r = KernelRegistry()
        r.register(CoefVar)
        assert "coef_var" in r.names()

    def test_fill_values(self):
        assert np.isnan(registry.create("shannon_diversity").fill_value())
        assert registry.create("species_richness").fill_value() == 255
