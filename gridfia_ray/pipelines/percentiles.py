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
import pandas as pd
import pyarrow as pa
import ray.data as rd


def _decoded_values(batch: pa.Table) -> list[np.ndarray]:
    """Per-row views, deliberately NOT concatenated: the reduction
    kernels below run per 64 KB tile (L2-resident). Batch-wide
    concatenate + f64 upcast allocates ~300 MB of fresh pages per batch
    and measured 9× SLOWER on this DRAM-bound class of machine — same
    lesson as the L2-resident hashing chunks (BASELINE.md)."""
    out = []
    status = batch["status"].to_pylist() if "status" in batch.column_names else None
    for i, p in enumerate(batch["pix"].to_pylist()):
        if p and (status is None or status[i] == "ok"):
            out.append(np.frombuffer(p, dtype="<f4"))
    return out


def _uniform_hist(a: np.ndarray, edges: np.ndarray) -> np.ndarray:
    """EXACTLY ``np.histogram(a, bins=edges)[0]`` for uniform
    (linspace) edges, ~4× faster: explicit edge arrays force numpy's
    generic searchsorted path (O(n log bins), bad constants); uniform
    edges admit a multiply-based index + one exact boundary-correction
    round against the real edge values (the same fixup numpy's own
    uniform fast path performs). Bin semantics preserved bit-for-bit:
    [e_i, e_{i+1}) half-open, last bin closed, out-of-range ignored —
    the refinement bookkeeping in ``percentiles_exact`` depends on the
    counts agreeing with exact ``<`` comparisons."""
    bins = edges.size - 1
    lo, hi = float(edges[0]), float(edges[-1])
    if not hi > lo:  # degenerate range — let numpy define it
        return np.histogram(a, bins=edges)[0].astype(np.int64)
    sel = a[(a >= lo) & (a <= hi)]
    if sel.size == 0:
        return np.zeros(bins, dtype=np.int64)
    idx = np.floor((sel - lo) * (bins / (hi - lo))).astype(np.int64)
    np.clip(idx, 0, bins - 1, out=idx)
    idx[sel < edges[idx]] -= 1
    bump = (sel >= edges[idx + 1]) & (idx < bins - 1)
    idx[bump] += 1
    # exact-membership audit: the multiply model is off by ≤1 bin only
    # while bin width ≫ value ulp; late refinement passes shrink ranges
    # toward ulp scale where linspace edges stop being uniform in the
    # exact sense — those (rare, tiny) calls take numpy's slow path
    ok = (sel >= edges[idx]) & ((sel < edges[idx + 1]) | (idx == bins - 1))
    if not ok.all():
        return np.histogram(sel, bins=edges)[0].astype(np.int64)
    return np.bincount(idx, minlength=bins)


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
                counts += _uniform_hist(a.astype(np.float64), edges)
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


def _count_and_range(decoded: rd.Dataset, exclude_zero: bool) -> tuple[int, float, float]:
    def partial(batch: pa.Table) -> pa.Table:
        lo, hi, n = np.inf, -np.inf, 0
        for arr in _decoded_values(batch):
            a = arr[arr != 0.0] if exclude_zero else arr
            if a.size:
                lo = min(lo, float(a.min()))
                hi = max(hi, float(a.max()))
                n += int(a.size)
        return pa.table({"lo": [lo], "hi": [hi], "n": [n]})

    from ray.data.aggregate import Max, Min, Sum

    row = decoded.map_batches(partial, batch_format="pyarrow").aggregate(
        Min("lo", alias_name="lo"), Max("hi", alias_name="hi"), Sum("n", alias_name="n")
    )
    return int(row["n"]), float(row["lo"]), float(row["hi"])


def percentiles_exact(
    decoded: rd.Dataset,
    qs: list[float],
    exclude_zero: bool = True,
    bins: int = 4096,
    collect_limit: int = 1 << 18,
    max_iters: int = 8,
    cache: bool = False,
) -> dict[float, float]:
    """EXACT global percentiles — distributed quickselect by histogram
    refinement (classic k-th order statistic at scale; no full sort, no
    shuffle of pixel data).

    Semantics match SQL ``quantile_disc``: the result for q is the
    k-th smallest value with k = ceil(q/100 · n) — an actual data value,
    so scaled-integer comparison against a DuckDB oracle is exact.

    Each refinement pass is one streaming ``map_batches`` over the
    decoded tiles: per-batch histograms over the current candidate range
    of every unresolved quantile (combiner rows, O(bins·|qs|) per
    block). A range shrinks ×bins per pass, so even 10^12 values pin
    within 3–4 passes; once a range holds ≤ ``collect_limit`` values
    the final pass collects (value, count) partials for the range —
    bounded by DISTINCT values, so a duplicate-heavy bin that can never
    shrink below ``collect_limit`` still folds to a handful of driver
    rows — and selects exactly.

    ``cache=True`` materializes the decoded rows once so the 3–4 passes
    stream object-store blocks instead of re-decoding tiles each time —
    the right call when decode is the dominant cost (compressed
    formats); leave off when recompute beats the spill traffic of a
    beyond-memory corpus.
    """
    if cache:
        decoded = decoded.materialize()
    n, lo, hi = _count_and_range(decoded, exclude_zero)
    if n == 0 or not np.isfinite(lo):
        return {q: float("nan") for q in qs}
    # state per quantile: rank k (1-indexed), candidate range [a, b]
    # (top-inclusive iff ``inc``), and the count of values below a
    state = {
        q: {"k": max(1, int(np.ceil(q / 100.0 * n))), "a": lo, "b": hi, "below": 0,
            "inc": True}
        for q in qs
    }
    out: dict[float, float] = {}
    from ray.data.aggregate import Sum

    for it in range(max_iters):
        active = [q for q in qs if q not in out]
        if not active:
            break
        # DEDUPE identical candidate ranges: on the first pass every
        # quantile's range is the full (lo, hi), so without this the
        # heaviest pass histogrammed the whole corpus once PER quantile
        uniq: dict[tuple[float, float, bool], int] = {}
        spec_of_q = [
            uniq.setdefault((state[q]["a"], state[q]["b"], state[q]["inc"]), len(uniq))
            for q in active
        ]
        uspecs = list(uniq)
        edge_sets = [np.linspace(a, b, bins + 1) for a, b, _ in uspecs]

        def partial(batch: pa.Table, edge_sets=edge_sets, uspecs=uspecs) -> pa.Table:
            counts = np.zeros(len(edge_sets) * bins, dtype=np.int64)
            for arr in _decoded_values(batch):
                # zero-filter in f32 (exact for the ==0 test) BEFORE the
                # f64 upcast — skips copying excluded values
                if exclude_zero:
                    arr = arr[arr != 0.0]
                a64 = arr.astype(np.float64)
                for ri, edges in enumerate(edge_sets):
                    a, b, inc = uspecs[ri]
                    if a <= lo and b >= hi and inc:
                        sel = a64  # full global range: no mask copy
                    else:
                        sel = a64[(a64 >= a) & ((a64 <= b) if inc else (a64 < b))]
                    if sel.size:
                        counts[ri * bins : (ri + 1) * bins] += _uniform_hist(sel, edges)
            return pa.table(
                {"slot": np.arange(len(counts), dtype=np.int64), "count": counts}
            )

        hist = (
            decoded.map_batches(partial, batch_format="pyarrow")
            .groupby("slot")
            .aggregate(Sum("count", alias_name="count"))
            .to_pandas()
        )
        full = np.zeros(len(edge_sets) * bins, dtype=np.int64)
        full[hist["slot"].to_numpy()] = hist["count"].to_numpy()

        collect: list[tuple[float, float, float, int, bool]] = []
        for ri, q in enumerate(active):
            st = state[q]
            si = spec_of_q[ri]
            c = full[si * bins : (si + 1) * bins]
            cum = np.cumsum(c)
            local_k = st["k"] - st["below"]
            j = int(np.searchsorted(cum, local_k, side="left"))
            edges = edge_sets[si]
            in_bin = int(c[j])
            below_bin = int(cum[j - 1]) if j > 0 else 0
            st["inc"] = st["inc"] and j == bins - 1
            st["a"], st["b"] = float(edges[j]), float(edges[j + 1])
            st["below"] += below_bin
            # last iteration force-collects (only reachable for
            # pathologically duplicate-heavy bins that never shrink)
            if in_bin <= collect_limit or it == max_iters - 1:
                collect.append((q, st["a"], st["b"], st["k"] - st["below"], st["inc"]))

        if collect:
            specs = [(a, b, inc) for _, a, b, _, inc in collect]

            def gather(batch: pa.Table, specs=specs) -> pa.Table:
                # emit (value, count) partials, not raw rows: the driver
                # fold is bounded by DISTINCT values in the bin, so a
                # pathological bin of 10^9 identical values (which never
                # shrinks below collect_limit) costs one row, not an OOM
                slot_col, val_col, cnt_col = [], [], []
                for arr in _decoded_values(batch):
                    if exclude_zero:
                        arr = arr[arr != 0.0]
                    a64 = arr.astype(np.float64)
                    for si, (a, b, inc) in enumerate(specs):
                        # same boundary semantics as the histogram pass:
                        # half-open top unless this range still carries
                        # the global max (inc)
                        sel = a64[(a64 >= a) & ((a64 <= b) if inc else (a64 < b))]
                        if sel.size:
                            u, c = np.unique(sel, return_counts=True)
                            slot_col.append(np.full(u.size, si, dtype=np.int64))
                            val_col.append(u)
                            cnt_col.append(c.astype(np.int64))
                if not slot_col:
                    return pa.table(
                        {"slot": pa.array([], pa.int64()), "v": pa.array([], pa.float64()),
                         "c": pa.array([], pa.int64())}
                    )
                return pa.table(
                    {"slot": np.concatenate(slot_col), "v": np.concatenate(val_col),
                     "c": np.concatenate(cnt_col)}
                )

            vals = (
                decoded.map_batches(gather, batch_format="pyarrow")
                .groupby("slot")
                .map_groups(
                    lambda g: g.groupby("v", as_index=False)
                    .agg(slot=("slot", "first"), c=("c", "sum"))
                    .sort_values("v", kind="mergesort"),
                    batch_format="pandas",
                )
                .to_pandas()
            )
            for si, (q, _, _, local_rank, _) in enumerate(collect):
                sub = vals.loc[vals["slot"] == si].sort_values("v", kind="mergesort")
                cum = np.cumsum(sub["c"].to_numpy())
                pos = int(np.searchsorted(cum, local_rank, side="left"))
                out[q] = float(sub["v"].to_numpy()[pos])
    return out


def grouped_percentiles_exact(
    ds: "rd.Dataset",
    key_col: str,
    value_col: str,
    qs: list[float],
    *,
    bins: int = 1024,
    collect_limit: int = 1 << 16,
    max_iters: int = 8,
    max_groups: int = 100_000,
    cache: bool = True,
    packed: bool = False,
) -> pd.DataFrame:
    """EXACT per-group percentiles — the keyed form of
    :func:`percentiles_exact` (quantile_disc semantics: the k-th
    smallest value in the group with k = ceil(q/100 · n)). Returns a
    DataFrame (key, q_pct, value) with one row per group × quantile.

    Shape: group COUNT/MIN/MAX first (one combiner pass; group count is
    checked against ``max_groups`` BEFORE any driver pull), then
    histogram-refinement passes where every (group, quantile) is an
    independent selection slot — per-batch partials are
    O(present_groups · |qs| · bins) rows, values never shuffle. Driver
    state is groups × qs brackets, which is why the group column must be
    low-cardinality (zones, event types, species — not user ids; use
    ``sample_per_key``-style constructions for unbounded keys).

    The per-batch histogram loops over the batch's DISTINCT keys (values
    inside each key vectorized) — right for bounded group counts, wrong
    for millions of groups, which ``max_groups`` rejects anyway.

    ``packed=True`` reads ``value_col`` as little-endian f32 byte
    buffers (one array per row — e.g. ``zonal.zone_value_rows``' tile-
    granular pixel packs) instead of one scalar per row; selection
    semantics are identical over the concatenated values.
    """
    import ray

    ds = ds.select_columns([key_col, value_col])
    if cache:
        ds = ds.materialize()

    if packed:
        def values_of(sub: pd.DataFrame) -> np.ndarray:
            bufs = [np.frombuffer(b, "<f4") for b in sub[value_col] if b]
            if not bufs:
                return np.empty(0, np.float64)
            return np.concatenate(bufs).astype(np.float64)
    else:
        def values_of(sub: pd.DataFrame) -> np.ndarray:
            return sub[value_col].to_numpy(np.float64)

    def stats_partial(batch: pd.DataFrame) -> pd.DataFrame:
        keys_out, ns, los, his = [], [], [], []
        for key, sub in batch.groupby(key_col, sort=False):
            v = values_of(sub)
            if v.size:
                keys_out.append(key)
                ns.append(v.size)
                los.append(v.min())
                his.append(v.max())
        # typed columns even when empty — a schema-less pandas block
        # churns the executor's schema cache on every exchange split
        return pd.DataFrame(
            {
                key_col: pd.Series(keys_out, dtype=batch[key_col].dtype),
                "n": pd.Series(ns, dtype=np.int64),
                "lo": pd.Series(los, dtype=np.float64),
                "hi": pd.Series(his, dtype=np.float64),
            }
        )

    from gridfia_ray.stages.agg_util import bucketed_agg

    grouped = bucketed_agg(
        ds.map_batches(stats_partial, batch_format="pandas"),
        [key_col],
        {"n": ("n", "sum"), "lo": ("lo", "min"), "hi": ("hi", "max")},
        n_buckets=8,
    ).materialize()  # one execution serves both the count and the pull
    n_groups = grouped.count()
    if n_groups > max_groups:
        raise ValueError(
            f"grouped_percentiles_exact: {n_groups} groups > max_groups="
            f"{max_groups}; per-group quantiles need driver-bounded key "
            f"cardinality"
        )
    stats = grouped.to_pandas()
    if n_groups == 0:
        # Ray's to_pandas() on a zero-row result drops the columns
        # entirely — return the typed empty frame instead of indexing
        # into a columnless one
        return pd.DataFrame(
            {
                key_col: pd.Series(dtype=object),
                "q_pct": pd.Series(dtype=np.float64),
                "value": pd.Series(dtype=np.float64),
            }
        )

    # one selection slot per (group, quantile). Column-wise extraction,
    # NOT iterrows: a row Series takes the frame's common dtype, which
    # upcasts int64 keys to float64 — silently rounding keys > 2^53 and
    # changing the output key dtype
    key_vals = stats[key_col].tolist()
    n_vals = stats["n"].to_numpy(np.int64)
    lo_vals = stats["lo"].to_numpy(np.float64)
    hi_vals = stats["hi"].to_numpy(np.float64)
    slots: list[dict] = []
    for gi in range(len(stats)):
        for q in qs:
            n = int(n_vals[gi])
            slots.append(
                {
                    "key": key_vals[gi],
                    "q": float(q),
                    "k": max(1, int(np.ceil(q / 100.0 * n))),
                    "a": float(lo_vals[gi]),
                    "b": float(hi_vals[gi]),
                    "below": 0,
                    "inc": True,
                    "done": n == 0,
                    "value": float("nan"),
                }
            )

    for it in range(max_iters):
        active = [i for i, s in enumerate(slots) if not s["done"]]
        if not active:
            break
        # broadcast: key -> [(slot_index_in_active, a, b, inc), ...]
        by_key: dict = {}
        for ai, i in enumerate(active):
            s = slots[i]
            by_key.setdefault(s["key"], []).append((ai, s["a"], s["b"], s["inc"]))
        spec_ref = ray.put(by_key)

        def partial(batch: pd.DataFrame, n_active=len(active), spec_ref=spec_ref) -> pd.DataFrame:
            spec = ray.get(spec_ref)
            rows_s, rows_b, rows_c = [], [], []
            for key, sub in batch.groupby(key_col, sort=False):
                tasks = spec.get(key)
                if not tasks:
                    continue
                v = values_of(sub)
                # dedupe identical brackets: on the first pass every
                # quantile of a group shares the group's full (lo, hi),
                # so the histogram would otherwise run |qs|× per group
                uniq: dict[tuple, list[int]] = {}
                for ai, a, b, inc in tasks:
                    uniq.setdefault((a, b, inc), []).append(ai)
                for (a, b, inc), ais in uniq.items():
                    sel = v[(v >= a) & ((v <= b) if inc else (v < b))]
                    if sel.size:
                        c = np.histogram(sel, bins=np.linspace(a, b, bins + 1))[0]
                        nz = np.flatnonzero(c)
                        for ai in ais:
                            rows_s.append(np.full(nz.size, ai, np.int64))
                            rows_b.append(nz.astype(np.int64))
                            rows_c.append(c[nz].astype(np.int64))
            if not rows_s:
                return pd.DataFrame(
                    {"slot": pd.Series(dtype=np.int64), "bin": pd.Series(dtype=np.int64),
                     "count": pd.Series(dtype=np.int64)}
                )
            return pd.DataFrame(
                {"slot": np.concatenate(rows_s), "bin": np.concatenate(rows_b),
                 "count": np.concatenate(rows_c)}
            )

        hist = bucketed_agg(
            ds.map_batches(partial, batch_format="pandas"),
            ["slot", "bin"],
            {"count": ("count", "sum")},
            n_buckets=8,
        ).to_pandas()

        # one linear pass groups the fold by slot — per-slot boolean
        # scans over the whole frame would be O(slots × rows)
        hist_by_slot = {int(si): sub for si, sub in hist.groupby("slot", sort=False)}
        empty_hist = hist.iloc[:0]

        collect: list[tuple[int, float, float, int, bool]] = []  # (slot idx, a, b, local_k, inc)
        for ai, i in enumerate(active):
            s = slots[i]
            sub = hist_by_slot.get(ai, empty_hist)
            c = np.zeros(bins, dtype=np.int64)
            c[sub["bin"].to_numpy()] = sub["count"].to_numpy()
            cum = np.cumsum(c)
            local_k = s["k"] - s["below"]
            j = int(np.searchsorted(cum, local_k, side="left"))
            edges = np.linspace(s["a"], s["b"], bins + 1)
            in_bin = int(c[j])
            below_bin = int(cum[j - 1]) if j > 0 else 0
            s["inc"] = s["inc"] and j == bins - 1
            s["a"], s["b"] = float(edges[j]), float(edges[j + 1])
            s["below"] += below_bin
            if in_bin <= collect_limit or it == max_iters - 1:
                collect.append((i, s["a"], s["b"], s["k"] - s["below"], s["inc"]))

        if collect:
            cspec: dict = {}
            for ci, (i, a, b, _, inc) in enumerate(collect):
                cspec.setdefault(slots[i]["key"], []).append((ci, a, b, inc))
            cref = ray.put(cspec)

            def gather(batch: pd.DataFrame, cref=cref) -> pd.DataFrame:
                spec = ray.get(cref)
                rows_s, rows_v, rows_c = [], [], []
                for key, sub in batch.groupby(key_col, sort=False):
                    tasks = spec.get(key)
                    if not tasks:
                        continue
                    v = values_of(sub)
                    for ci, a, b, inc in tasks:
                        sel = v[(v >= a) & ((v <= b) if inc else (v < b))]
                        if sel.size:
                            u, c = np.unique(sel, return_counts=True)
                            rows_s.append(np.full(u.size, ci, np.int64))
                            rows_v.append(u)
                            rows_c.append(c.astype(np.int64))
                if not rows_s:
                    return pd.DataFrame(
                        {"slot": pd.Series(dtype=np.int64), "v": pd.Series(dtype=np.float64),
                         "c": pd.Series(dtype=np.int64)}
                    )
                return pd.DataFrame(
                    {"slot": np.concatenate(rows_s), "v": np.concatenate(rows_v),
                     "c": np.concatenate(rows_c)}
                )

            vals = bucketed_agg(
                ds.map_batches(gather, batch_format="pandas"),
                ["slot", "v"],
                {"c": ("c", "sum")},
                n_buckets=8,
            ).to_pandas()
            vals_by_slot = {int(si): sub for si, sub in vals.groupby("slot", sort=False)}
            for ci, (i, _, _, local_rank, _) in enumerate(collect):
                sub = vals_by_slot[ci].sort_values("v", kind="mergesort")
                cum = np.cumsum(sub["c"].to_numpy())
                pos = int(np.searchsorted(cum, local_rank, side="left"))
                slots[i]["value"] = float(sub["v"].to_numpy()[pos])
                slots[i]["done"] = True

    return pd.DataFrame(
        {
            key_col: pd.Series([s["key"] for s in slots], dtype=stats[key_col].dtype),
            "q_pct": [s["q"] for s in slots],
            "value": [s["value"] for s in slots],
        }
    )


def grouped_mad_exact(
    ds: "rd.Dataset",
    key_col: str,
    value_col: str,
    **kw,
) -> pd.DataFrame:
    """Per-group robust location/scale: median and MAD (median absolute
    deviation), both EXACT under quantile_disc semantics (the k-th
    smallest, k = ceil(n/2)) — the robust-z basis data-cleaning
    pipelines use to scrub length/score outliers without the mean's
    sensitivity to the very outliers being hunted.

    Two grouped selection rounds of :func:`grouped_percentiles_exact`:
    round one finds each group's median; the tiny (≤ ``max_groups``)
    key→median table broadcasts into a derived ``|x − med(key)|``
    column for round two. Values never shuffle in either round (the
    histogram partials are the only exchange), so the driver state
    stays groups × brackets. For integer or µ-scaled inputs every step
    is exact: |Δ| of int64 values below 2⁵³ is exactly representable.

    Returns a DataFrame (key, median, mad), one row per group."""
    import ray

    ds = ds.select_columns([key_col, value_col]).materialize()
    med = grouped_percentiles_exact(
        ds, key_col, value_col, [50.0], cache=False, **kw
    )
    med_map = dict(zip(med[key_col].tolist(), med["value"].tolist()))
    mref = ray.put(med_map)

    def absdev(batch: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(mref)
        center = batch[key_col].map(m).to_numpy(np.float64)
        return pd.DataFrame(
            {
                key_col: batch[key_col],
                "__absdev": np.abs(
                    batch[value_col].to_numpy(np.float64) - center
                ),
            }
        )

    mad = grouped_percentiles_exact(
        ds.map_batches(absdev, batch_format="pandas"),
        key_col,
        "__absdev",
        [50.0],
        cache=False,
        **kw,
    )
    out = med.drop(columns=["q_pct"]).rename(columns={"value": "median"})
    return out.merge(
        mad.drop(columns=["q_pct"]).rename(columns={"value": "mad"}),
        on=key_col,
    )


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
