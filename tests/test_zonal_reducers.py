"""Closed-form tests for the A6 per-zone estimators
(reference ``statistical_analysis.py:86-192`` semantics)."""

import numpy as np
import pytest

from gridfia_ray.kernels import zonal as zr


class TestBasic:
    def test_richness(self):
        assert zr.richness(np.array([3, 0, 1, 7])) == 3.0
        assert zr.richness(np.zeros(4)) == 0.0

    def test_shannon(self):
        counts = np.array([10.0, 10.0])
        assert zr.shannon(counts) == pytest.approx(np.log(2))
        assert zr.shannon(np.array([5.0])) == 0.0
        assert zr.shannon(np.zeros(3)) == 0.0

    def test_simpson_is_one_minus_dominance(self):
        counts = np.array([10.0, 10.0])
        assert zr.simpson(counts) == pytest.approx(0.5)
        assert zr.simpson(np.zeros(2)) == 0.0

    def test_evenness(self):
        assert zr.evenness(np.array([10.0, 10.0])) == pytest.approx(1.0)
        assert zr.evenness(np.array([10.0])) == 0.0


class TestChao1:
    def test_with_doubletons(self):
        counts = np.array([1, 1, 2, 5, 9])  # f1=2, f2=1, obs=5
        assert zr.chao1(counts) == pytest.approx(5 + 4 / 2)

    def test_singletons_only(self):
        counts = np.array([1, 1, 1, 5])  # f1=3, f2=0, obs=4
        assert zr.chao1(counts) == pytest.approx(4 + 3 * 2 / 2)

    def test_neither(self):
        assert zr.chao1(np.array([5, 9])) == 2.0


class TestAce:
    def test_no_rare(self):
        assert zr.ace(np.array([50, 90])) == 2.0

    def test_mixed(self):
        counts = np.array([1, 2, 3, 50])
        # n_rare=3, n_abund=1, f1=1, n_rare_total=6, c_ace=1-1/6
        c_ace = 1 - 1 / 6
        num = 1 * 0 + 2 * 1 + 3 * 2  # sum c(c-1) over rare
        den = 6 * 5
        gamma = max(0.0, (3 / c_ace) * (num / den) - 1)
        expect = 1 + 3 / c_ace + (1 / c_ace) * gamma
        assert zr.ace(counts) == pytest.approx(expect)

    def test_all_zero(self):
        assert zr.ace(np.zeros(3)) == 0.0
