"""The flagship metrics pipeline: tiles → decode → stack → kernels.

Ray-native restatement of ``GridFIA.calculate_metrics``
(``gridfia/api.py:446-501`` → ``forest_metrics.py:69-438``, traced in
SURVEY.md §3.3):

    read_parquet(tiles) → species prefilter → DecoderActor pool
      → salted bucket column → groupby(bucket).map_groups(kernel chain)
      → result-tile rows (streamed to the caller / parquet sink)

Two-phase global statistics: kernels that need whole-extent state
(rare/common occurrence frequency, dominance percent, any-biomass) get a
separate partial-aggregate pass — per-batch combiners inside
``map_batches`` then one tiny ``groupby(species).sum`` — never a
full-data shuffle (SURVEY.md §4.4-1).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from gridfia_ray.kernels.base import Kernel, KernelContext
from gridfia_ray.pipelines.common import GridSpec, decoded_tiles, pick_buckets, read_tiles
from gridfia_ray.stages.assemble import (
    add_bucket_column,
    explode_result_pixels,
    make_kernel_group_fn,
)

TOTAL_CODE = "0000"


def occurrence_stats(decoded: rd.Dataset, biomass_threshold: float = 0.0) -> pd.DataFrame:
    """Whole-extent per-species stats: pixels present (> threshold),
    pixel count, biomass sum/max — the global two-phase pass feeding
    M13–M15 and the S5/A2/A3 aggregates.

    Partial-aggregate pattern: one combiner row per species per batch,
    then a tiny groupby — the input-sized data never shuffles.
    """

    def partial(batch: pa.Table) -> pa.Table:
        agg: dict[str, list[float]] = {}
        codes = batch["species_code"].to_pylist()
        hs = batch["h"].to_numpy()
        ws = batch["w"].to_numpy()
        pix = batch["pix"].to_pylist()
        status = batch["status"].to_pylist()
        for i, code in enumerate(codes):
            if status[i] != "ok":
                continue
            arr = np.frombuffer(pix[i], dtype="<f4")
            a = agg.setdefault(code, [0.0, 0.0, 0.0, 0.0])
            a[0] += float(np.count_nonzero(arr > biomass_threshold))
            a[1] += float(hs[i]) * float(ws[i])
            a[2] += float(arr.sum(dtype=np.float64))
            a[3] = max(a[3], float(arr.max(initial=0.0)))
        return pa.table(
            {
                "species_code": pa.array(list(agg.keys()), pa.string()),
                "present_px": pa.array([v[0] for v in agg.values()], pa.float64()),
                "n_px": pa.array([v[1] for v in agg.values()], pa.float64()),
                "sum_biomass": pa.array([v[2] for v in agg.values()], pa.float64()),
                "max_biomass": pa.array([v[3] for v in agg.values()], pa.float64()),
            }
        )

    from ray.data.aggregate import Max, Sum

    out = (
        decoded.map_batches(partial, batch_format="pyarrow")
        .groupby("species_code", num_partitions=8)
        .aggregate(
            Sum("present_px", alias_name="present_px"),
            Sum("n_px", alias_name="n_px"),
            Sum("sum_biomass", alias_name="sum_biomass"),
            Max("max_biomass", alias_name="max_biomass"),
        )
        .to_pandas()
    )
    out["occurrence_freq"] = out["present_px"] / out["n_px"].where(out["n_px"] > 0, 1.0)
    return out.sort_values("species_code").reset_index(drop=True)


def dominance_stats(
    decoded: rd.Dataset, catalog: list[str], min_biomass: float = 0.0, n_buckets: int = 64
) -> pd.DataFrame:
    """Whole-extent % of pixels where each species is the argmax
    (the *global* form of ``species.py:153-176``). Needs assembled
    stacks → one bucketed shuffle, then per-bucket combiners."""
    from ray.data.aggregate import Sum

    from gridfia_ray.kernels.forest import DominantSpecies

    ctx = KernelContext(catalog=catalog)
    kern = DominantSpecies(min_biomass=min_biomass)
    group_fn = make_kernel_group_fn([kern], ctx)

    def count_dominant(group: pd.DataFrame) -> pd.DataFrame:
        res = group_fn(group)
        flat = np.concatenate(
            [
                np.frombuffer(b, dtype=np.dtype(dt))
                for b, dt in zip(res["pix"], res["dtype"])
            ]
        ) if len(res) else np.empty(0, np.int32)
        idx, cnt = np.unique(flat, return_counts=True)  # one pass per bucket
        return pd.DataFrame(
            {
                "cat_index": np.concatenate([idx.astype(np.int64), [-1]]),
                "dominant_px": np.concatenate([cnt.astype(np.int64), [0]]),
                "total_px": np.concatenate([np.zeros(idx.size, np.int64), [flat.size]]),
            }
        )

    agg = (
        decoded.map_batches(add_bucket_column(n_buckets), batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(count_dominant, batch_format="pandas")
        .groupby("cat_index")
        .aggregate(Sum("dominant_px", alias_name="dominant_px"), Sum("total_px", alias_name="total_px"))
        .to_pandas()
    )
    total_px = float(agg["total_px"].sum())
    agg = agg[agg["cat_index"] >= 0].copy()
    agg["species_code"] = agg["cat_index"].map(lambda i: catalog[int(i)])
    agg["dominance_percent"] = agg["dominant_px"] / max(total_px, 1.0) * 100.0
    return agg[["species_code", "cat_index", "dominant_px", "dominance_percent"]].sort_values(
        "species_code"
    ).reset_index(drop=True)


def build_context(
    kernels: list[Kernel],
    catalog: list[str],
    decoded_factory,
    biomass_threshold: float = 0.0,
) -> KernelContext:
    """Compute only the global passes some kernel actually requires.
    ``decoded_factory()`` returns a *fresh* decoded Dataset per pass
    (a Dataset re-executes when consumed twice; fresh lineage is cheaper
    and clearer)."""
    needs = {n for k in kernels for n in k.needs_global}
    ctx = KernelContext(catalog=catalog)
    if {"occurrence_freq", "extent_has_biomass"} & needs:
        occ = occurrence_stats(decoded_factory(), biomass_threshold)
        ctx.occurrence_freq = dict(zip(occ["species_code"], occ["occurrence_freq"]))
        ctx.extent_has_biomass = bool((occ["present_px"] > 0).any())
    if "dominance_percent" in needs:
        dom = dominance_stats(decoded_factory(), catalog)
        ctx.dominance_percent = {c: 0.0 for c in catalog if c != TOTAL_CODE}
        ctx.dominance_percent.update(
            dict(zip(dom["species_code"], dom["dominance_percent"]))
        )
    return ctx


def _precise(kernel: Kernel) -> Kernel:
    """Per-instance dtype override: float64/int64 result tiles for
    oracle-exact comparisons (production default stays the reference's
    float32/uint8 rasters)."""
    dt = np.dtype(kernel.output_dtype)
    kernel.output_dtype = np.float64 if np.issubdtype(dt, np.floating) else np.int64
    return kernel


def run_metrics(
    tiles_path: str,
    kernels: list[Kernel],
    spec: GridSpec,
    catalog: list[str],
    *,
    n_buckets: int | None = None,
    n_tiles_hint: int | None = None,
    n_species_hint: int | None = None,
    batch_size: int = 256,
    ctx: KernelContext | None = None,
    precise: bool = False,
    layout: str = "auto",
) -> rd.Dataset:
    """Run a kernel chain over a tile table; returns result-tile rows.

    ``layout``: 'aligned' zips per-species files with zero shuffle
    (pipelines/aligned.py — requires the aligned store layout);
    'shuffle' always uses the general ``groupby(cell)`` exchange;
    'auto' probes the store and prefers aligned. Results are identical —
    the layout only changes the physical plan.
    """
    if precise:
        kernels = [_precise(k) for k in kernels]
    include_total = any(k.needs_total for k in kernels)

    if layout in ("auto", "aligned"):
        from gridfia_ray.pipelines.aligned import aligned_layout, aligned_run_metrics

        al = aligned_layout(tiles_path)
        if al is None and layout == "aligned":
            raise ValueError("store is not aligned (need one parquet file per species)")
        if al is not None:
            if ctx is None:

                def make_decoded_al():
                    return decoded_tiles(
                        read_tiles(tiles_path), spec, include_total=include_total
                    )

                ctx = build_context(kernels, catalog, make_decoded_al)
            else:
                ctx.catalog = ctx.catalog or catalog
            return aligned_run_metrics(al, kernels, spec, ctx, include_total)

    def make_decoded():
        return decoded_tiles(
            read_tiles(tiles_path), spec, include_total=include_total, batch_size=batch_size
        )

    if ctx is None:
        ctx = build_context(kernels, catalog, make_decoded)
    else:
        ctx.catalog = ctx.catalog or catalog
    if n_buckets is None:
        n_tiles = n_tiles_hint or read_tiles(tiles_path).count()
        n_buckets = pick_buckets(n_tiles, spec.tile, n_species_hint or 1)
    return (
        make_decoded()
        .map_batches(add_bucket_column(n_buckets), batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(make_kernel_group_fn(kernels, ctx), batch_format="pandas")
    )


def metrics_to_pixels(result: rd.Dataset) -> rd.Dataset:
    """Result tiles → long (metric, y, x, value) rows (oracle/report path)."""
    return result.map_batches(explode_result_pixels, batch_format="pyarrow")


def cooccurrence_matrix(
    decoded: rd.Dataset, biomass_threshold: float = 0.0, n_buckets: int = 64
) -> pd.DataFrame:
    """Species CO-OCCURRENCE matrix — the community-ecology companion
    of the A2/A3 frequency aggregates: for every unordered species pair
    (sa < sb lexicographically) the global count of pixels where BOTH
    layers exceed ``biomass_threshold``.

    Shape: ONE keyed tile exchange co-locates a tile's species layers
    (the same cell co-location the metric kernels use); the per-tile
    combiner is a boolean outer product — one GEMM over the s×n_px
    presence stack, no Python pair loop — and the s×s pair partials
    fold in a tiny bucketed merge. Pairs that never co-occur are
    omitted (matching the inner-join oracle).

    No counterpart in the GridFIA reference (build brief: A-family
    extension)."""
    from gridfia_ray.stages.agg_util import bucketed_agg, bucketed_group_map

    part_schema = pa.schema(
        [("sa", pa.string()), ("sb", pa.string()), ("n_both", pa.int64())]
    )
    empty = pa.table(
        {f.name: pa.array([], f.type) for f in part_schema}, schema=part_schema
    ).to_pandas()

    def per_tile(group: pd.DataFrame) -> pd.DataFrame:
        g = group[group["status"] == "ok"]
        if len(g) < 2:
            return empty
        order = np.argsort(g["species_code"].to_numpy(), kind="stable")
        g = g.iloc[order]
        codes = g["species_code"].tolist()
        if len(set(codes)) != len(codes):
            raise ValueError(
                "cooccurrence_matrix: duplicate species layer in tile "
                f"({g['tile_row'].iloc[0]}, {g['tile_col'].iloc[0]})"
            )
        P = np.stack(
            [
                np.frombuffer(p, dtype="<f4") > biomass_threshold
                for p in g["pix"]
            ]
        ).astype(np.float64)
        C = np.rint(P @ P.T).astype(np.int64)
        iu, ju = np.triu_indices(len(codes), k=1)
        n = C[iu, ju]
        keep = n > 0
        arr = np.asarray(codes, dtype=object)
        return pd.DataFrame(
            {"sa": arr[iu[keep]], "sb": arr[ju[keep]], "n_both": n[keep]}
        )

    parts = bucketed_group_map(
        decoded,
        ["tile_row", "tile_col"],
        per_tile,
        n_buckets=n_buckets,
        out_schema=part_schema,
    )
    agg = bucketed_agg(
        parts, ["sa", "sb"], {"n_both": ("n_both", "sum")}, n_buckets=16
    ).to_pandas()  # bounded: one row per species pair
    if len(agg) == 0:
        return pd.DataFrame(
            {"sa": pd.Series(dtype=str), "sb": pd.Series(dtype=str),
             "n_both": pd.Series(dtype=np.int64)}
        )
    agg["n_both"] = agg["n_both"].astype(np.int64)
    return agg.sort_values(["sa", "sb"]).reset_index(drop=True)
