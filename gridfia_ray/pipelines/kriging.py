"""Ordinary kriging: variogram-model-driven interpolation of plot
attributes onto points / tile centers — the model-based sibling of J6's
kNN-IDW (`pipelines/knn.py`) and the consumer of the experimental
semivariogram (`pipelines/variogram.py`).

The reference delegates spatial statistics to esda/libpysal
(``/root/reference/gridfia/core/analysis/statistical_analysis.py``) and
imputes plot attributes with kNN (``/root/reference/README.md:41-43``);
ordinary kriging is the standard geostatistical upgrade of that
imputation (Matheron 1963; Cressie 1993 §3) built here Ray-Data-first.

Two stages:

1. :func:`fit_variogram_model` — weighted-least-squares fit of a
   spherical / exponential / gaussian model ``γ(h; nugget, psill, a)``
   to the empirical semivariogram. The empirical variogram itself is
   the distributed exchange in ``pipelines/variogram.py``; the fit is a
   tiny driver-side solve over ``len(lags)`` rows (grid search over the
   range parameter × closed-form linear WLS for nugget/partial sill —
   deterministic, no iterative optimizer).
2. :func:`krige_points` / :func:`krige_tiles` — per prediction point,
   the exact k nearest plots via the same provably-exact Z-order ring
   expansion as ``KnnActor`` (the plot table broadcasts once per actor
   in ``__init__``), then the (k+1)×(k+1) ordinary-kriging system

       [γ(d_ij)  1] [w]   [γ(d_i0)]
       [1ᵀ       0] [μ] = [1      ]

   solved per point: prediction ``ŷ = Σ wᵢ·vᵢ`` and kriging variance
   ``σ² = Σ wᵢ·γ(d_i0) + μ``. Neighbors are sorted ``(distance,
   plot_index)`` before the system is built, so the float result is a
   pure function of the point and the plot table — independent of ring
   discovery order, batch boundaries, and partitioning (the pinned
   sequential replay in ``oracle_pins.ensure_krigpin`` reproduces it
   bit-for-bit from a brute-force distance sort).

Scale shape: identical to kNN-IDW — the plot table is the small side
(broadcast once per actor), prediction points stream through
``map_batches`` with NO shuffle; for plot tables too large to
broadcast, shard plots by coarse parent cell and run one pool per shard
(the documented partitioning assumption, same as knn.py).
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from gridfia_ray.geo.cells import morton_decode
from gridfia_ray.pipelines.common import GridSpec, cluster_cpus, read_tiles
from gridfia_ray.pipelines.knn import KnnActor
from gridfia_ray.stages.decode import species_prefilter

_MODELS = ("spherical", "exponential", "gaussian")


def model_gamma(h: np.ndarray, model: dict) -> np.ndarray:
    """Evaluate the fitted variogram model γ(h) (vectorized, h ≥ 0).

    ``model`` = {"model", "nugget", "psill", "range"}. γ(0) = 0 exactly
    (the theoretical variogram, not the nugget-discontinuous limit) so
    an exact-hit neighbor keeps the system consistent.
    """
    h = np.asarray(h, dtype=np.float64)
    n, s, a = float(model["nugget"]), float(model["psill"]), float(model["range"])
    kind = model["model"]
    if kind == "spherical":
        r = np.minimum(h / a, 1.0)
        g = n + s * (1.5 * r - 0.5 * r**3)
    elif kind == "exponential":
        g = n + s * (1.0 - np.exp(-3.0 * h / a))
    elif kind == "gaussian":
        g = n + s * (1.0 - np.exp(-3.0 * (h / a) ** 2))
    else:
        raise ValueError(f"unknown variogram model {kind!r} (have {_MODELS})")
    return np.where(h == 0.0, 0.0, g)


def fit_variogram_model(
    dist: np.ndarray,
    gamma: np.ndarray,
    n_pairs: np.ndarray | None = None,
    model: str = "spherical",
    range_candidates: np.ndarray | None = None,
) -> dict:
    """WLS fit of (nugget, psill, range) to an empirical variogram.

    For each candidate range ``a`` the model is LINEAR in (nugget,
    psill): ``γ̂(h) = nugget + psill·b(h; a)`` with basis ``b`` from
    :func:`model_gamma` — a 2×2 weighted normal-equation solve (weights
    = n_pairs, the standard Cressie weighting simplified); coefficients
    are clamped ≥ 0 and the candidate with least weighted SSE wins.
    Grid search + closed form ⇒ deterministic, no optimizer state.
    """
    if model not in _MODELS:
        raise ValueError(f"unknown variogram model {model!r} (have {_MODELS})")
    d = np.asarray(dist, dtype=np.float64)
    g = np.asarray(gamma, dtype=np.float64)
    if d.size < 3:
        raise ValueError("fit_variogram_model: need >= 3 empirical lags")
    w = (
        np.ones_like(d)
        if n_pairs is None
        else np.asarray(n_pairs, dtype=np.float64)
    )
    keep = np.isfinite(g) & (w > 0)
    d, g, w = d[keep], g[keep], w[keep]
    if d.size < 3:
        raise ValueError("fit_variogram_model: need >= 3 finite lags")
    if range_candidates is None:
        # lags themselves plus midpoints and a beyond-max tail — the
        # true range may exceed the sampled lag span
        base = np.unique(d[d > 0])
        range_candidates = np.unique(
            np.concatenate([base, (base[:-1] + base[1:]) / 2.0, base[-1:] * np.array([1.5, 2.0, 3.0])])
        )
    best = None
    for a in np.asarray(range_candidates, dtype=np.float64):
        if a <= 0:
            continue
        b = model_gamma(d, {"model": model, "nugget": 0.0, "psill": 1.0, "range": a})
        # weighted LS for gamma ≈ n + s*b  (2 unknowns)
        sw, swb = w.sum(), (w * b).sum()
        swbb, swg, swbg = (w * b * b).sum(), (w * g).sum(), (w * b * g).sum()
        det = sw * swbb - swb * swb
        if det <= 0:
            continue
        nug = (swbb * swg - swb * swbg) / det
        psill = (sw * swbg - swb * swg) / det
        nug, psill = max(0.0, nug), max(0.0, psill)
        sse = float((w * (g - nug - psill * b) ** 2).sum())
        cand = (sse, float(a), nug, psill)
        if best is None or cand < best:
            best = cand
    if best is None or best[3] == 0.0:
        # degenerate (flat / pure-nugget) empirical variogram
        nug = float((w * g).sum() / w.sum())
        return {"model": model, "nugget": nug, "psill": 0.0,
                "range": float(d.max()), "sse": 0.0}
    sse, a, nug, psill = best
    return {"model": model, "nugget": nug, "psill": psill, "range": a, "sse": sse}


def fit_from_empirical(vario: pd.DataFrame, cell_size: float,
                       model: str = "spherical") -> dict:
    """Fit a model from ``semivariogram_values`` output (both
    directions pooled by n_pairs-weighted merge per lag)."""
    df = vario.copy()
    df["h"] = df["lag"].astype(np.float64) * float(cell_size)
    grp = df.groupby("h", sort=True).apply(
        lambda s: pd.Series(
            {
                "gamma": float(np.average(s["gamma"], weights=s["n_pairs"]))
                if s["n_pairs"].sum()
                else np.nan,
                "n_pairs": int(s["n_pairs"].sum()),
            }
        ),
        include_groups=False,
    )
    return fit_variogram_model(
        grp.index.to_numpy(), grp["gamma"].to_numpy(),
        grp["n_pairs"].to_numpy(), model=model,
    )


class KrigingActor(KnnActor):
    """Ordinary-kriging scorer over a broadcast plot table.

    Reuses ``KnnActor``'s broadcast plot state and provably-exact ring
    kNN; replaces the IDW estimate with the OK solve. Input batches are
    POINT rows ``(point_id, x, y)``; output one row per point:
    ``(point_id, pred, krig_var, k_used)``.
    """

    def __init__(self, plots: dict | str, spec: GridSpec, model: dict, k: int = 8):
        super().__init__(plots, spec, k=k)
        if self.px.size:
            # duplicate plot locations make the OK matrix singular —
            # fail at actor construction, not per batch
            order = np.lexsort((self.py, self.px))
            same = (np.diff(self.px[order]) == 0) & (np.diff(self.py[order]) == 0)
            if same.any():
                raise ValueError(
                    "kriging: duplicate plot locations — deduplicate "
                    "(e.g. average co-located values) before kriging"
                )
        self.model = dict(model)
        model_gamma(np.array([1.0]), self.model)  # validate kind eagerly

    def _solve(self, qx: float, qy: float, sel: np.ndarray, dk: np.ndarray):
        # deterministic system: neighbors sorted (distance, plot index)
        order = np.lexsort((sel, dk))
        sel, dk = sel[order], dk[order]
        k = sel.size
        px, py = self.px[sel], self.py[sel]
        dmat = np.sqrt(
            (px[:, None] - px[None, :]) ** 2 + (py[:, None] - py[None, :]) ** 2
        )
        A = np.empty((k + 1, k + 1), dtype=np.float64)
        A[:k, :k] = model_gamma(dmat, self.model)
        A[k, :k] = 1.0
        A[:k, k] = 1.0
        A[k, k] = 0.0
        b = np.empty(k + 1, dtype=np.float64)
        b[:k] = model_gamma(dk, self.model)
        b[k] = 1.0
        try:
            wl = np.linalg.solve(A, b)
        except np.linalg.LinAlgError:
            return np.nan, np.nan, 0
        pred = float(wl[:k] @ self.pv[sel])
        var = float(wl[:k] @ b[:k] + wl[k])
        return pred, var, k

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        xs = batch["x"].to_numpy(zero_copy_only=False).astype(np.float64)
        ys = batch["y"].to_numpy(zero_copy_only=False).astype(np.float64)
        code = self.grid.cell_id(xs, ys)
        ccx, ccy = morton_decode(code)
        pred = np.full(n, np.nan)
        var = np.full(n, np.nan)
        kused = np.zeros(n, np.int32)
        for i in range(n):
            res = self._knn(float(xs[i]), float(ys[i]), int(ccx[i]), int(ccy[i]))
            if res is None:
                continue
            pred[i], var[i], kused[i] = self._solve(
                float(xs[i]), float(ys[i]), *res
            )
        return pa.table(
            {
                "point_id": batch["point_id"],
                "pred": pa.array(pred),
                "krig_var": pa.array(var),
                "k_used": pa.array(kused, pa.int32()),
            }
        )


def krige_points(
    points: rd.Dataset, plots: dict | str, spec: GridSpec, model: dict, k: int = 8
) -> rd.Dataset:
    """Ordinary kriging of ``plots`` onto a streaming point dataset
    ``(point_id, x, y)`` — broadcast plots, no shuffle."""
    return points.map_batches(
        KrigingActor,
        fn_constructor_kwargs=dict(plots=plots, spec=spec, model=model, k=k),
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=(1, max(2, cluster_cpus() // 2)),
        num_cpus=1,
    )


class _TileCenterKriging(KrigingActor):
    """Tile-batch adapter: prediction point = tile center (same caption
    transform convention as ``KnnActor.__call__``)."""

    def __call__(self, batch: pa.Table) -> pa.Table:  # type: ignore[override]
        n = batch.num_rows
        captions = batch["caption"].to_pylist()
        ws = batch["w"].to_numpy()
        hs = batch["h"].to_numpy()
        trs = np.zeros(n, np.int64)
        tcs = np.zeros(n, np.int64)
        xs = np.zeros(n, np.float64)
        ys = np.zeros(n, np.float64)
        for i in range(n):
            meta = json.loads(captions[i])
            tf = meta["transform"]
            xs[i] = tf[0] + int(ws[i]) * tf[1] / 2.0
            ys[i] = tf[3] + int(hs[i]) * tf[5] / 2.0
            trs[i] = int(meta.get("tile_row", 0))
            tcs[i] = int(meta.get("tile_col", 0))
        inner = super().__call__(
            pa.table({"point_id": pa.array(np.arange(n)), "x": xs, "y": ys})
        )
        return pa.table(
            {
                "tile_row": pa.array(trs),
                "tile_col": pa.array(tcs),
                "cx": pa.array(xs),
                "cy": pa.array(ys),
                "pred": inner["pred"],
                "krig_var": inner["krig_var"],
                "k_used": inner["k_used"],
            }
        )


def krige_tiles(
    tiles_path, plots: dict | str, spec: GridSpec, model: dict, k: int = 8
) -> rd.Dataset:
    """One kriged row per tile position (the '0000' total layer gives
    one row per position; per-species stores prune at the file level)."""
    from gridfia_ray.pipelines.common import read_tiles_species

    tiles = read_tiles_species(tiles_path, ["0000"])
    if tiles is None:
        tiles = read_tiles(tiles_path).map_batches(
            species_prefilter(codes_keep=["0000"]), batch_format="pyarrow"
        )
    return tiles.map_batches(
        _TileCenterKriging,
        fn_constructor_kwargs=dict(plots=plots, spec=spec, model=model, k=k),
        batch_format="pyarrow",
        batch_size=512,
        concurrency=(1, max(2, cluster_cpus() // 2)),
        num_cpus=1,
    )
