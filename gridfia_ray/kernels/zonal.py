"""Per-zone diversity reducers (A6 of SURVEY.md §2.5).

Reproduces the reference's ``DiversityAnalyzer`` estimators
(``gridfia/core/analysis/statistical_analysis.py:86-192``) on a 1-D
species-abundance vector — here the per-zone vector of present-pixel
counts produced by the zonal aggregation shuffle. Pure numpy; float64.
"""

from __future__ import annotations

import numpy as np


def richness(counts: np.ndarray) -> float:
    return float(np.sum(np.asarray(counts) > 0))


def shannon(counts: np.ndarray) -> float:
    c = np.asarray(counts, dtype=np.float64)
    c = c[c > 0]
    if c.size == 0:
        return 0.0
    p = c / c.sum()
    return float(-np.sum(p * np.log(p)))


def simpson(counts: np.ndarray) -> float:
    """1 − Σp² (Simpson's *diversity*, the analyzer's convention —
    distinct from the raster kernel's inverse-Simpson)."""
    c = np.asarray(counts, dtype=np.float64)
    total = c.sum()
    if total == 0:
        return 0.0
    p = c / total
    return float(1.0 - np.sum(p**2))


def evenness(counts: np.ndarray) -> float:
    s = richness(counts)
    if s <= 1:
        return 0.0
    return shannon(counts) / float(np.log(s))


def chao1(counts: np.ndarray) -> float:
    c = np.asarray(counts)
    f1 = float(np.sum(c == 1))
    f2 = float(np.sum(c == 2))
    obs = richness(c)
    if f2 > 0:
        return obs + (f1**2) / (2.0 * f2)
    if f1 > 0:
        return obs + f1 * (f1 - 1.0) / 2.0
    return obs


def ace(counts: np.ndarray, rare_threshold: int = 10) -> float:
    c = np.asarray(counts, dtype=np.float64)
    rare = (c > 0) & (c <= rare_threshold)
    abundant = c > rare_threshold
    n_rare = float(np.sum(rare))
    n_abund = float(np.sum(abundant))
    if n_rare == 0:
        return n_abund
    f1 = float(np.sum(c == 1))
    n_rare_total = float(np.sum(c[rare]))
    c_ace = 1.0 - (f1 / n_rare_total) if n_rare_total > 0 else 1.0
    if c_ace > 0:
        # Σ_i i(i-1)f_i over i=1..thr == Σ_species c(c-1) over rare species
        numerator = float(np.sum(c[rare] * (c[rare] - 1.0)))
        denominator = n_rare_total * (n_rare_total - 1.0)
        gamma = max(0.0, (n_rare / c_ace) * (numerator / denominator) - 1.0) if denominator > 0 else 0.0
        return n_abund + (n_rare / c_ace) + (f1 / c_ace) * gamma
    return n_abund + n_rare


ALL = {
    "richness": richness,
    "shannon": shannon,
    "simpson": simpson,
    "evenness": evenness,
    "chao1": chao1,
    "ace": ace,
}
