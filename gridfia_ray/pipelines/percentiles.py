"""Global percentile aggregates (A5 / M16 support, SURVEY.md §2.5).

The reference computes viz-scaling percentiles with an in-memory
``np.percentile`` over all valid pixels (``gridfia/visualization/
mapper.py:139-149, 605-627``) — impossible at scale. Here:

* ``percentiles_histogram`` — mergeable fixed-bin histogram sketch: one
  (min, max) pass picks the range, one pass accumulates per-batch
  histograms (combiner rows), quantiles interpolate within bins.
  Error ≤ bin width; 4096 bins over the value range is far below any
  viz-scaling need. Two streaming passes, no shuffle of pixel data.
* ``normalize_percentile_clip`` — the M16 kernel: clip to [p_lo, p_hi]
  then min-max scale, NaN-preserving (``mapper.py:128-158`` semantics).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd


def _decoded_values(batch: pa.Table) -> list[np.ndarray]:
    out = []
    status = batch["status"].to_pylist() if "status" in batch.column_names else None
    for i, p in enumerate(batch["pix"].to_pylist()):
        if p and (status is None or status[i] == "ok"):
            out.append(np.frombuffer(p, dtype="<f4"))
    return out


def value_range(decoded: rd.Dataset, exclude_zero: bool = True) -> tuple[float, float]:
    def partial(batch: pa.Table) -> pa.Table:
        lo, hi = np.inf, -np.inf
        for arr in _decoded_values(batch):
            a = arr[arr != 0.0] if exclude_zero else arr
            if a.size:
                lo = min(lo, float(a.min()))
                hi = max(hi, float(a.max()))
        return pa.table({"lo": pa.array([lo]), "hi": pa.array([hi])})

    from ray.data.aggregate import Max, Min

    row = (
        decoded.map_batches(partial, batch_format="pyarrow")
        .aggregate(Min("lo", alias_name="lo"), Max("hi", alias_name="hi"))
    )
    return float(row["lo"]), float(row["hi"])


def percentiles_histogram(
    decoded: rd.Dataset,
    qs: list[float],
    bins: int = 4096,
    exclude_zero: bool = True,
    vrange: tuple[float, float] | None = None,
) -> dict[float, float]:
    """Approximate global percentiles of decoded pixel values.

    ``decoded`` may be decoded rows (pix column) or any dataset of raw
    f32 payloads. ``exclude_zero`` mirrors the reference's valid-pixel
    masking (zero = absence).
    """
    if vrange is None:
        lo, hi = value_range(decoded, exclude_zero)
    else:
        lo, hi = vrange
    if not np.isfinite(lo) or hi <= lo:
        return {q: lo for q in qs}
    edges = np.linspace(lo, hi, bins + 1)

    def partial(batch: pa.Table) -> pa.Table:
        counts = np.zeros(bins, dtype=np.int64)
        for arr in _decoded_values(batch):
            a = arr[arr != 0.0] if exclude_zero else arr
            if a.size:
                counts += np.histogram(a, bins=edges)[0]
        return pa.table({"bin": np.arange(bins, dtype=np.int64), "count": counts})

    from ray.data.aggregate import Sum

    hist = (
        decoded.map_batches(partial, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("count", alias_name="count"))
        .to_pandas()
        .sort_values("bin")
    )
    counts = np.zeros(bins, dtype=np.int64)
    counts[hist["bin"].to_numpy()] = hist["count"].to_numpy()
    cum = np.cumsum(counts)
    total = cum[-1]
    out = {}
    for q in qs:
        target = q / 100.0 * total
        b = int(np.searchsorted(cum, target, side="left"))
        b = min(b, bins - 1)
        prev = cum[b - 1] if b > 0 else 0
        in_bin = counts[b]
        frac = (target - prev) / in_bin if in_bin > 0 else 0.0
        out[q] = float(edges[b] + frac * (edges[b + 1] - edges[b]))
    return out


def normalize_percentile_clip(
    arr: np.ndarray, p_lo: float, p_hi: float
) -> np.ndarray:
    """M16 kernel: clip to the percentile window then min-max scale to
    [0, 1]; NaN preserved (``mapper.py:128-158``)."""
    a = np.asarray(arr, dtype=np.float64)
    out = np.clip(a, p_lo, p_hi)
    if p_hi > p_lo:
        out = (out - p_lo) / (p_hi - p_lo)
    else:
        out = np.zeros_like(out)
    out[np.isnan(a)] = np.nan
    return out
