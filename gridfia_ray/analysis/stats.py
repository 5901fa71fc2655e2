"""Group-comparison statistics (A7, SURVEY.md §2.5).

Reproduces the reference's ``StatisticalAnalyzer`` capabilities
(``gridfia/core/analysis/statistical_analysis.py:262-616``): descriptive
stats, Mann-Whitney U (normal approximation with tie correction — scipy
is unavailable, so the public closed forms are implemented directly),
effect sizes (Cohen's d, Hedges' g, Cliff's delta), Benjamini–Hochberg
FDR correction, and resampling tests.

Resampling is the distributed part: bootstrap / permutation iterations
fan out as a Dataset of iteration indices → ``map_batches`` with
*seeded per-iteration* RNG (`np.random.RandomState(seed + i)`), fixing
the reference's unseeded workers (``parallel_processing.py:120,153``) —
results are bit-reproducible at any parallelism.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import ray.data as rd


def descriptive(x: np.ndarray) -> dict:
    x = np.asarray(x, dtype=np.float64)
    return {
        "n": int(x.size),
        "mean": float(x.mean()) if x.size else float("nan"),
        "std": float(x.std(ddof=1)) if x.size > 1 else float("nan"),
        "min": float(x.min()) if x.size else float("nan"),
        "median": float(np.median(x)) if x.size else float("nan"),
        "max": float(x.max()) if x.size else float("nan"),
    }


def mann_whitney_u(x: np.ndarray, y: np.ndarray) -> dict:
    """Two-sided Mann-Whitney U with normal approximation and tie
    correction (public formulas)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n1, n2 = x.size, y.size
    both = np.concatenate([x, y])
    order = np.argsort(both, kind="mergesort")
    ranks = np.empty_like(both)
    ranks[order] = np.arange(1, both.size + 1, dtype=np.float64)
    # average ranks for ties
    sorted_vals = both[order]
    i = 0
    while i < both.size:
        j = i
        while j + 1 < both.size and sorted_vals[j + 1] == sorted_vals[i]:
            j += 1
        if j > i:
            avg = (i + j + 2) / 2.0
            ranks[order[i : j + 1]] = avg
        i = j + 1
    r1 = ranks[:n1].sum()
    u1 = r1 - n1 * (n1 + 1) / 2.0
    u = min(u1, n1 * n2 - u1)
    mu = n1 * n2 / 2.0
    # tie correction for the variance
    _, tie_counts = np.unique(both, return_counts=True)
    tie_term = float(np.sum(tie_counts**3 - tie_counts))
    n = n1 + n2
    sigma2 = n1 * n2 / 12.0 * ((n + 1) - tie_term / (n * (n - 1))) if n > 1 else 0.0
    if sigma2 <= 0:
        return {"u": float(u), "z": 0.0, "p_value": 1.0}
    z = (u - mu + 0.5) / math.sqrt(sigma2)  # continuity correction
    p = 2.0 * 0.5 * math.erfc(abs(z) / math.sqrt(2.0))
    return {"u": float(u), "z": float(z), "p_value": float(min(p, 1.0))}


def cohens_d(x: np.ndarray, y: np.ndarray) -> float:
    x, y = np.asarray(x, np.float64), np.asarray(y, np.float64)
    n1, n2 = x.size, y.size
    sp = math.sqrt(((n1 - 1) * x.var(ddof=1) + (n2 - 1) * y.var(ddof=1)) / (n1 + n2 - 2))
    return float((x.mean() - y.mean()) / sp) if sp > 0 else 0.0


def hedges_g(x: np.ndarray, y: np.ndarray) -> float:
    n = len(x) + len(y)
    j = 1.0 - 3.0 / (4.0 * n - 9.0) if n > 2 else 1.0
    return cohens_d(x, y) * j


def cliffs_delta(x: np.ndarray, y: np.ndarray) -> float:
    """delta = P(x > y) − P(x < y), computed via sorted ranks (O(n log n),
    not the naive all-pairs loop)."""
    x = np.sort(np.asarray(x, np.float64))
    y = np.sort(np.asarray(y, np.float64))
    gt = np.searchsorted(y, x, side="left").sum()  # pairs with x > y
    le = (len(y) - np.searchsorted(y, x, side="right")).sum()  # pairs with x < y
    n = len(x) * len(y)
    return float((gt - le) / n) if n else 0.0


def benjamini_hochberg(p_values: list[float]) -> list[float]:
    """BH-FDR adjusted p-values (``statistical_analysis.py:594-616``)."""
    p = np.asarray(p_values, dtype=np.float64)
    m = p.size
    order = np.argsort(p)
    adj = np.empty(m)
    running = 1.0
    for rank_idx in range(m - 1, -1, -1):
        i = order[rank_idx]
        running = min(running, p[i] * m / (rank_idx + 1))
        adj[i] = running
    return adj.tolist()


def _iter_dataset(n_iterations: int) -> rd.Dataset:
    from gridfia_ray.context import tune_context

    tune_context()
    return rd.range(n_iterations)


def bootstrap_mean_diff_ci(
    x: np.ndarray,
    y: np.ndarray,
    n_iterations: int = 1000,
    alpha: float = 0.05,
    seed: int = 42,
) -> dict:
    """Distributed bootstrap CI for mean(x) − mean(y): iteration-index
    Dataset → per-batch seeded resampling (``ray.put``-broadcast data)."""
    import ray

    xr, yr = ray.put(np.asarray(x, np.float64)), ray.put(np.asarray(y, np.float64))

    def resample(batch: pd.DataFrame) -> pd.DataFrame:
        xs, ys = ray.get(xr), ray.get(yr)
        stats = []
        for i in batch["id"]:
            rng = np.random.RandomState(seed + int(i))
            stats.append(
                rng.choice(xs, xs.size, replace=True).mean()
                - rng.choice(ys, ys.size, replace=True).mean()
            )
        return pd.DataFrame({"stat": stats})

    stats = (
        _iter_dataset(n_iterations)
        .map_batches(resample, batch_format="pandas", batch_size=64)
        .to_pandas()["stat"]
        .to_numpy()
    )
    lo, hi = np.percentile(stats, [100 * alpha / 2, 100 * (1 - alpha / 2)])
    return {
        "observed": float(np.mean(x) - np.mean(y)),
        "ci_low": float(lo),
        "ci_high": float(hi),
        "n_iterations": n_iterations,
    }


def permutation_test_mean_diff(
    x: np.ndarray,
    y: np.ndarray,
    n_iterations: int = 1000,
    seed: int = 42,
) -> dict:
    """Distributed two-sided permutation test on the mean difference."""
    import ray

    observed = float(np.mean(x) - np.mean(y))
    combined = ray.put(np.concatenate([np.asarray(x, np.float64), np.asarray(y, np.float64)]))
    n1 = len(x)

    def permute(batch: pd.DataFrame) -> pd.DataFrame:
        data = ray.get(combined)
        stats = []
        for i in batch["id"]:
            rng = np.random.RandomState(seed + int(i))
            sh = rng.permutation(data)
            stats.append(sh[:n1].mean() - sh[n1:].mean())
        return pd.DataFrame({"stat": stats})

    stats = (
        _iter_dataset(n_iterations)
        .map_batches(permute, batch_format="pandas", batch_size=64)
        .to_pandas()["stat"]
        .to_numpy()
    )
    p = float((np.sum(np.abs(stats) >= abs(observed)) + 1) / (n_iterations + 1))
    return {"observed": observed, "p_value": p, "n_iterations": n_iterations}


def compare_groups(
    x: np.ndarray,
    y: np.ndarray,
    n_iterations: int = 1000,
    seed: int = 42,
) -> dict:
    """The full A7 panel for two samples (driver-side on aggregated
    outputs; resampling distributed)."""
    return {
        "group1": descriptive(x),
        "group2": descriptive(y),
        "mann_whitney": mann_whitney_u(x, y),
        "cohens_d": cohens_d(x, y),
        "hedges_g": hedges_g(x, y),
        "cliffs_delta": cliffs_delta(x, y),
        "bootstrap": bootstrap_mean_diff_ci(x, y, n_iterations, seed=seed),
        "permutation": permutation_test_mean_diff(x, y, n_iterations, seed=seed),
    }
