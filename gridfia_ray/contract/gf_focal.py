"""Raster map algebra: pyramids, focal windows, texture, histogram ops,
warps, augmentation, temporal stacks.

Split out of the former monolithic ``gridfia_ray/contract.py`` (round-5
VERDICT #3); see ``gridfia_ray/contract/__init__.py`` for the package
map. Query/oracle semantics are unchanged.
"""

from __future__ import annotations

import os
from typing import Callable

import numpy as np
import pandas as pd

from gridfia_ray import fixtures
from gridfia_ray.io import read_parquet_clean
from gridfia_ray.kernels.base import KernelContext
from gridfia_ray.kernels.registry import registry
from gridfia_ray.pipelines.common import GridSpec
from gridfia_ray.contract._shared import *  # noqa: F401,F403


def q_downsample_2x(sf_dir: str) -> pd.DataFrame:
    """Overview-pyramid level: 2×2 block-SUM pooling of the total-
    biomass raster in the micro-scaled integer domain (mass-conserving
    reducer, bit-exact) — pure map over result tiles, zero shuffle
    (stages/assemble.downsample_result_tiles)."""
    from gridfia_ray.pipelines import metrics as M
    from gridfia_ray.stages.assemble import downsample_result_tiles

    f = _fx()
    res = M.run_metrics(
        f["tiles"],
        registry.from_configs([{"name": "total_biomass", "parameters": {}}]),
        f["spec"],
        f["catalog"],
        n_tiles_hint=f["meta"]["n_tiles"],
        n_species_hint=f["meta"]["n_species"],
        precise=True,
    )
    pooled = downsample_result_tiles(res, factor=2, scaled_int=True)
    pix = M.metrics_to_pixels(pooled).to_pandas()
    out = pd.DataFrame(
        {
            "y": pix["y"].astype(np.int64),
            "x": pix["x"].astype(np.int64),
            "sum_u": pix["value"].astype(np.int64),
        }
    )
    return out.sort_values(["y", "x"]).reset_index(drop=True)

def q_downsample_4x(sf_dir: str) -> pd.DataFrame:
    """Pyramid levels COMPOSE: two chained 2× mass-conserving poolings
    must equal one 4×4 block sum (the assemble docstring's claim,
    verified against an independent 4×4 SQL oracle)."""
    from gridfia_ray.pipelines import metrics as M
    from gridfia_ray.stages.assemble import downsample_result_tiles

    f = _fx()
    res = M.run_metrics(
        f["tiles"],
        registry.from_configs([{"name": "total_biomass", "parameters": {}}]),
        f["spec"],
        f["catalog"],
        n_tiles_hint=f["meta"]["n_tiles"],
        n_species_hint=f["meta"]["n_species"],
        precise=True,
    )
    lvl1 = downsample_result_tiles(res, factor=2, scaled_int=True)
    # level-1 tiles are already scaled int64 — pool them as-is
    lvl2 = downsample_result_tiles(lvl1, factor=2, scaled_int=False)
    pix = M.metrics_to_pixels(lvl2).to_pandas()
    out = pd.DataFrame(
        {
            "y": pix["y"].astype(np.int64),
            "x": pix["x"].astype(np.int64),
            "sum_u": pix["value"].astype(np.int64),
        }
    )
    return out.sort_values(["y", "x"]).reset_index(drop=True)

def q_downsample_majority(sf_dir: str) -> pd.DataFrame:
    """Categorical overview level (stages/assemble.
    downsample_majority_tiles): 2×2 block MODE pooling of the
    dominant-species raster, ties toward the smaller index — GDAL
    ``mode`` resampling, zero shuffle. Oracle = windowed mode counts
    over the M11 derivation grouped by (y//2, x//2)."""
    from gridfia_ray.pipelines import metrics as M
    from gridfia_ray.stages.assemble import downsample_majority_tiles

    f = _fx()
    res = M.run_metrics(
        f["tiles"],
        registry.from_configs([{"name": "dominant_species", "parameters": {}}]),
        f["spec"],
        f["catalog"],
        n_tiles_hint=f["meta"]["n_tiles"],
        n_species_hint=f["meta"]["n_species"],
        precise=True,
    )
    out = M.metrics_to_pixels(downsample_majority_tiles(res, 2)).to_pandas()
    res_df = pd.DataFrame(
        {
            "y": out["y"].astype(np.int64),
            "x": out["x"].astype(np.int64),
            "maj": out["value"].astype(np.int64),
        }
    )
    return res_df.sort_values(["y", "x"]).reset_index(drop=True)

def q_mosaic(sf_dir: str) -> pd.DataFrame:
    """Mosaic two overlapping stores (stages/assemble.
    mosaic_result_tiles, 'last' policy — the later-acquisition-
    overrides rule): store B re-observes the west half of the grid with
    doubled values; the mosaic must be B where B has tiles and A
    elsewhere, hash-matched per pixel against a CASE oracle."""
    import pyarrow as pa

    from gridfia_ray.pipelines import metrics as M
    from gridfia_ray.stages.assemble import mosaic_result_tiles

    f = _fx()
    res = M.run_metrics(
        f["tiles"],
        registry.from_configs([{"name": "total_biomass", "parameters": {}}]),
        f["spec"],
        f["catalog"],
        n_tiles_hint=f["meta"]["n_tiles"],
        n_species_hint=f["meta"]["n_species"],
        precise=True,
    ).materialize()
    west = int(f["meta"]["grid"]) // 2

    def reobserve(batch: pa.Table) -> pa.Table:
        keep = batch.filter(pa.compute.less(batch["tile_col"], west))
        pix = [
            (np.frombuffer(b, np.float64) * 2.0).tobytes()
            for b in keep["pix"].to_pylist()
        ]
        return keep.set_column(
            keep.column_names.index("pix"), "pix", pa.array(pix, pa.binary())
        )

    b = res.map_batches(reobserve, batch_format="pyarrow")
    merged = mosaic_result_tiles([res, b], policy="last")
    pix = M.metrics_to_pixels(merged).to_pandas()
    out = pd.DataFrame(
        {
            "y": pix["y"].astype(np.int64),
            "x": pix["x"].astype(np.int64),
            "sum_u": s6(pix["value"]),
        }
    )
    return out.sort_values(["y", "x"]).reset_index(drop=True)

def q_focal_sum_3x3(sf_dir: str) -> pd.DataFrame:
    """Focal (3×3 neighborhood) sum of the total-biomass raster via
    HALO EXCHANGE (pipelines/focal.py): every tile ships its border
    strips to its 8 neighbors, one keyed exchange, vectorized
    summed-area-table window sums per tile. Micro-scaled int64 domain —
    bit-exact vs the SQL self-join oracle; edge pixels count only the
    neighbors that exist (n_nbrs)."""
    from gridfia_ray.pipelines import metrics as M
    from gridfia_ray.pipelines.focal import focal_sum_tiles

    f = _fx()
    res = M.run_metrics(
        f["tiles"],
        registry.from_configs([{"name": "total_biomass", "parameters": {}}]),
        f["spec"],
        f["catalog"],
        n_tiles_hint=f["meta"]["n_tiles"],
        n_species_hint=f["meta"]["n_species"],
        precise=True,
    )
    out = focal_sum_tiles(res).to_pandas()[["y", "x", "sum_u", "n_nbrs"]]
    for c in ("y", "x", "sum_u", "n_nbrs"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["y", "x"]).reset_index(drop=True)

def q_semivariogram(sf_dir: str) -> pd.DataFrame:
    """Axis-aligned experimental semivariogram of the total-biomass
    raster at pixel lags 1/2/4/8 (pipelines/variogram.py): one
    two-strip keyed exchange, pairs evaluated as shifted-array diffs
    per tile, exact int64 hi/lo sum decomposition — bit-exact vs the
    SQL self-join oracle computing the identical integer split."""
    from gridfia_ray.pipelines import metrics as M
    from gridfia_ray.pipelines.variogram import semivariogram_tiles

    f = _fx()
    res = M.run_metrics(
        f["tiles"],
        registry.from_configs([{"name": "total_biomass", "parameters": {}}]),
        f["spec"],
        f["catalog"],
        n_tiles_hint=f["meta"]["n_tiles"],
        n_species_hint=f["meta"]["n_species"],
        precise=True,
    )
    out = semivariogram_tiles(res, _VARIOGRAM_LAGS).to_pandas()[
        ["direction", "lag", "n_pairs", "ss_hi", "ss_lo"]
    ]
    for c in ("lag", "n_pairs", "ss_hi", "ss_lo"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["direction", "lag"]).reset_index(drop=True)

def q_focal_stats_5x5(sf_dir: str) -> pd.DataFrame:
    """ArcGIS-style Focal Statistics with a 5×5 window (radius-2 halo
    strips — the generalized exchange): exact window sum/count/min/max
    of the µ-scaled total-biomass raster, bit-exact vs the SQL
    self-join oracle; edge pixels aggregate present neighbors only."""
    from gridfia_ray.pipelines import metrics as M
    from gridfia_ray.pipelines.focal import focal_stats_tiles

    f = _fx()
    res = M.run_metrics(
        f["tiles"],
        registry.from_configs([{"name": "total_biomass", "parameters": {}}]),
        f["spec"],
        f["catalog"],
        n_tiles_hint=f["meta"]["n_tiles"],
        n_species_hint=f["meta"]["n_species"],
        precise=True,
    )
    cols = ["y", "x", "sum_u", "n_nbrs", "min_u", "max_u"]
    out = focal_stats_tiles(res, radius=2).to_pandas()[cols]
    for c in cols:
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["y", "x"]).reset_index(drop=True)

def q_contour_cells(sf_dir: str) -> pd.DataFrame:
    """Marching-squares contour classification of the total-biomass
    raster at level 45 (pipelines/focal.contour_cells_tiles): one row
    per 2×2 cell the isoline crosses, via the same halo exchange as the
    focal kernels. Thresholds compare in the micro-int domain —
    bit-exact vs the SQL four-way self-join oracle."""
    from gridfia_ray.pipelines import metrics as M
    from gridfia_ray.pipelines.focal import contour_cells_tiles

    f = _fx()
    res = M.run_metrics(
        f["tiles"],
        registry.from_configs([{"name": "total_biomass", "parameters": {}}]),
        f["spec"],
        f["catalog"],
        n_tiles_hint=f["meta"]["n_tiles"],
        n_species_hint=f["meta"]["n_species"],
        precise=True,
    )
    out = contour_cells_tiles(res, _CONTOUR_LEVEL).to_pandas()[
        ["y", "x", "ms_case", "n_seg"]
    ]
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["y", "x"]).reset_index(drop=True)

def q_focal_gradient(sf_dir: str) -> pd.DataFrame:
    """Horn 3×3 gradient components of the total-biomass raster
    (pipelines/focal.focal_gradient_tiles — same halo exchange as the
    focal sum, interior pixels only), integer-exact vs a weighted
    self-join oracle."""
    from gridfia_ray.pipelines import metrics as M
    from gridfia_ray.pipelines.focal import focal_gradient_tiles

    f = _fx()
    res = M.run_metrics(
        f["tiles"],
        registry.from_configs([{"name": "total_biomass", "parameters": {}}]),
        f["spec"],
        f["catalog"],
        n_tiles_hint=f["meta"]["n_tiles"],
        n_species_hint=f["meta"]["n_species"],
        precise=True,
    )
    out = focal_gradient_tiles(res).to_pandas()[["y", "x", "ddx_u", "ddy_u"]]
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["y", "x"]).reset_index(drop=True)

def q_focal_median(sf_dir: str) -> pd.DataFrame:
    """3×3 median despeckle of the total-biomass raster
    (pipelines/focal.focal_median_tiles — same halo exchange, interior
    pixels only; the median of 9 µ-ints is an order statistic so the
    pair is hash-exact vs the quantile_disc self-join oracle)."""
    from gridfia_ray.pipelines import metrics as M
    from gridfia_ray.pipelines.focal import focal_median_tiles

    f = _fx()
    res = M.run_metrics(
        f["tiles"],
        registry.from_configs([{"name": "total_biomass", "parameters": {}}]),
        f["spec"],
        f["catalog"],
        n_tiles_hint=f["meta"]["n_tiles"],
        n_species_hint=f["meta"]["n_species"],
        precise=True,
    )
    out = focal_median_tiles(res).to_pandas()[["y", "x", "med_u"]]
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["y", "x"]).reset_index(drop=True)

def q_focal_majority(sf_dir: str) -> pd.DataFrame:
    """3×3 MAJORITY filter over the CATEGORICAL dominant-species raster
    (pipelines/focal.focal_majority_tiles — ArcGIS Majority Filter
    semantics, ties toward the smaller value, interior-only): the
    categorical-despeckle companion of the median filter. Oracle = mode
    with the identical tie-break via windowed counts over the M11
    dominant-index derivation."""
    from gridfia_ray.pipelines import metrics as M
    from gridfia_ray.pipelines.focal import focal_majority_tiles

    f = _fx()
    res = M.run_metrics(
        f["tiles"],
        registry.from_configs([{"name": "dominant_species", "parameters": {}}]),
        f["spec"],
        f["catalog"],
        n_tiles_hint=f["meta"]["n_tiles"],
        n_species_hint=f["meta"]["n_species"],
        precise=True,
    )
    out = focal_majority_tiles(res).to_pandas()[["y", "x", "maj"]]
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["y", "x"]).reset_index(drop=True)

def q_focal_tpi(sf_dir: str) -> pd.DataFrame:
    """Topographic Position Index of the total-biomass raster
    (pipelines/focal.focal_tpi_tiles — 9*center - window_sum, exact in
    the micro-scaled integer domain), interior pixels only, vs the
    windowed self-join oracle."""
    from gridfia_ray.pipelines import metrics as M
    from gridfia_ray.pipelines.focal import focal_tpi_tiles

    f = _fx()
    res = M.run_metrics(
        f["tiles"],
        registry.from_configs([{"name": "total_biomass", "parameters": {}}]),
        f["spec"],
        f["catalog"],
        n_tiles_hint=f["meta"]["n_tiles"],
        n_species_hint=f["meta"]["n_species"],
        precise=True,
    )
    out = focal_tpi_tiles(res).to_pandas()[["y", "x", "tpi9_u"]]
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["y", "x"]).reset_index(drop=True)

def q_glcm(sf_dir: str) -> pd.DataFrame:
    """Haralick GLCM texture counts over the total-biomass raster
    (pipelines/focal.glcm_counts_tiles): ordered gray-level pair counts
    for the east/south offsets, 16 levels of 20 biomass units, cross-
    tile pairs via the halo exchange — vs the quantized self-join
    oracle."""
    from gridfia_ray.pipelines.focal import glcm_counts_tiles

    f = _fx()
    out = glcm_counts_tiles(_total_biomass_result(f)).to_pandas()
    out = out[["direction", "la", "lb", "n_pairs"]]
    out["direction"] = out["direction"].astype(str)
    for c in ("la", "lb", "n_pairs"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["direction", "la", "lb"]).reset_index(drop=True)

def q_raster_calc(sf_dir: str) -> pd.DataFrame:
    """Map-algebra raster calculator (pipelines/calc.raster_calc_tiles):
    the normalized-difference index between the Dominant-Oak and
    Common-Pine percentage rasters — (a−b)·10⁶ // (a+b+1) entirely in
    µ-int64 — via one tile-address co-key exchange and a parsed (never
    eval'd) AST. The oracle SQL is GENERATED from the same AST
    (calc.expr_to_sql), so the two sides cannot drift."""
    from gridfia_ray.pipelines.calc import raster_calc_tiles
    from gridfia_ray.pipelines.metrics import metrics_to_pixels

    f = _fx()
    out = raster_calc_tiles(
        _CALC_EXPR,
        {"a": _species_pct_result(f, "0131"),
         "b": _species_pct_result(f, "0110")},
    )
    pix = metrics_to_pixels(out).to_pandas()
    res = pd.DataFrame(
        {
            "y": pix["y"].astype(np.int64),
            "x": pix["x"].astype(np.int64),
            "nd_u": pix["value"].astype(np.int64),
        }
    )
    return res.sort_values(["y", "x"]).reset_index(drop=True)

def q_focal_curvature(sf_dir: str) -> pd.DataFrame:
    """Zevenbergen–Thorne general curvature of the total-biomass
    raster (pipelines/focal.focal_curvature_tiles — the exact
    4-neighbor integer Laplacian lap4_u), interior pixels only, vs the
    windowed self-join oracle."""
    from gridfia_ray.pipelines.focal import focal_curvature_tiles

    f = _fx()
    out = focal_curvature_tiles(_total_biomass_result(f)).to_pandas()[
        ["y", "x", "lap4_u"]
    ]
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["y", "x"]).reset_index(drop=True)

def q_focal_aspect(sf_dir: str) -> pd.DataFrame:
    """Aspect-octant raster of the total-biomass surface (pipelines/
    focal.focal_aspect_tiles — exact integer 45°-sector classification
    of the steepest-descent direction, no trig), interior pixels only,
    vs an identical CASE chain over the windowed self-join oracle."""
    from gridfia_ray.pipelines import metrics as M
    from gridfia_ray.pipelines.focal import focal_aspect_tiles

    f = _fx()
    res = M.run_metrics(
        f["tiles"],
        registry.from_configs([{"name": "total_biomass", "parameters": {}}]),
        f["spec"],
        f["catalog"],
        n_tiles_hint=f["meta"]["n_tiles"],
        n_species_hint=f["meta"]["n_species"],
        precise=True,
    )
    out = focal_aspect_tiles(res).to_pandas()[["y", "x", "octant"]]
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["y", "x"]).reset_index(drop=True)

def q_local_moran(sf_dir: str) -> pd.DataFrame:
    """Anselin local Moran's I (LISA) of the total-biomass raster
    (pipelines/local_stats.local_moran_tiles — exact-integer deviations
    over the halo exchange, one global-scalar pre-pass), µ-unit
    hash-exact vs the neighbor self-join oracle; quadrant labels are
    pure integer sign tests (1=HH 2=LH 3=LL 4=HL)."""
    from gridfia_ray.pipelines.local_stats import local_moran_tiles

    f = _fx()
    out = local_moran_tiles(_total_biomass_result(f)).to_pandas()
    res = pd.DataFrame(
        {
            "y": out["y"].astype(np.int64),
            "x": out["x"].astype(np.int64),
            "i_u": s6(out["i_local"]),
            "quad": out["quad"].astype(np.int64),
        }
    )
    return res.sort_values(["y", "x"]).reset_index(drop=True)

def q_getis_gstar(sf_dir: str) -> pd.DataFrame:
    """Getis-Ord Gi* hot-spot z-scores of the total-biomass raster
    (pipelines/local_stats.getis_gstar_tiles — self-inclusive binary
    8-neighbor weights), µ-unit hash-exact vs the self-join oracle."""
    from gridfia_ray.pipelines.local_stats import getis_gstar_tiles

    f = _fx()
    out = getis_gstar_tiles(_total_biomass_result(f)).to_pandas()
    res = pd.DataFrame(
        {
            "y": out["y"].astype(np.int64),
            "x": out["x"].astype(np.int64),
            "gi_u": s6(out["gi_star"]),
        }
    )
    return res.sort_values(["y", "x"]).reset_index(drop=True)

def q_temporal_trend(sf_dir: str) -> pd.DataFrame:
    """Per-pixel biomass trend over a deterministic 5-year stack
    (pipelines/temporal — synthetic dated stack with integer closed
    forms, then one keyed exchange co-locating each tile's years and a
    vectorized int64-exact OLS). slope µ-quantized, delta exact, both
    hash-matched vs the SQL re-derivation of the identical stack."""
    from gridfia_ray.pipelines.temporal import make_yearly_stack, temporal_trend_tiles

    f = _fx()
    stack = make_yearly_stack(_total_biomass_result(f), 5)
    out = temporal_trend_tiles(stack).to_pandas()
    res = pd.DataFrame(
        {
            "y": out["y"].astype(np.int64),
            "x": out["x"].astype(np.int64),
            "slope_u": s6(out["slope"]),
            "delta": out["delta"].astype(np.int64),
        }
    )
    return res.sort_values(["y", "x"]).reset_index(drop=True)

def q_temporal_composite(sf_dir: str) -> pd.DataFrame:
    """Per-pixel median/min/max composite over the same deterministic
    5-year stack (pipelines/temporal.temporal_composite_tiles) — the
    cloud-free compositing reducer; the median of 5 int64 epochs is an
    exact order statistic, hash-matched vs quantile_disc over the SQL
    re-derivation of the identical stack."""
    from gridfia_ray.pipelines.temporal import (
        make_yearly_stack,
        temporal_composite_tiles,
    )

    f = _fx()
    stack = make_yearly_stack(_total_biomass_result(f), 5)
    out = temporal_composite_tiles(stack).to_pandas()
    out = out[["y", "x", "med_u", "min_u", "max_u"]]
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["y", "x"]).reset_index(drop=True)

def q_augment_rot90(sf_dir: str) -> pd.DataFrame:
    """Global 90°-clockwise rotation of the total-biomass raster
    (stages/augment.augment_result_tiles): per-tile array rotation +
    arithmetic tile-key remap — zero shuffle at any corpus size thanks
    to the tile-aligned layout. Oracle = the coordinate remap
    out[x, N-1-y] = in[y, x] written directly in SQL over the fixture
    generator's pixel table."""
    from gridfia_ray.pipelines import metrics as M
    from gridfia_ray.stages.augment import augment_result_tiles

    f = _fx()
    g = int(f["meta"]["grid"])
    rot = augment_result_tiles(_total_biomass_result(f), "rot90cw", g, g)
    pix = M.metrics_to_pixels(rot).to_pandas()
    out = pd.DataFrame(
        {
            "y": pix["y"].astype(np.int64),
            "x": pix["x"].astype(np.int64),
            "total_u": s6(pix["value"]),
        }
    )
    return out.sort_values(["y", "x"]).reset_index(drop=True)

def q_patchify(sf_dir: str) -> pd.DataFrame:
    """ViT-style patch extraction: non-overlapping 16×16 patches of the
    total-biomass raster with exact µ-scaled per-patch statistics
    (stages/augment.patchify_result_tiles — pure map, global patch
    ids). Oracle = SQL GROUP BY y//16, x//16 over the pixel table."""
    from gridfia_ray.stages.augment import patchify_result_tiles

    f = _fx()
    out = patchify_result_tiles(_total_biomass_result(f), 16).to_pandas()
    out = out.drop(columns=["metric"])
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["patch_row", "patch_col"]).reset_index(drop=True)

def q_hillshade(sf_dir: str) -> pd.DataFrame:
    """DEM-style hillshade of the total-biomass raster: the Horn halo
    exchange feeding the Lambertian shading map (pipelines/focal.
    hillshade_tiles, formula pinned against ESRI's published worked
    example in tests/test_focal.py). Oracle = pinned parquet built from
    the fixture generator's independent pixel table via plain numpy
    shifts (oracle_pins.ensure_hspin)."""
    from gridfia_ray import oracle_pins  # noqa: F401  (oracle pairing)
    from gridfia_ray.pipelines import metrics as M
    from gridfia_ray.pipelines.focal import hillshade_tiles

    f = _fx()
    res = M.run_metrics(
        f["tiles"],
        registry.from_configs([{"name": "total_biomass", "parameters": {}}]),
        f["spec"],
        f["catalog"],
        n_tiles_hint=f["meta"]["n_tiles"],
        n_species_hint=f["meta"]["n_species"],
        precise=True,
    )
    pixel_size = abs(f["meta"]["transform"][1])
    out = hillshade_tiles(res, pixel_size).to_pandas()[["y", "x", "shade"]]
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["y", "x"]).reset_index(drop=True)

def q_warp_mercator(sf_dir: str) -> pd.DataFrame:
    """Distributed nearest-neighbor raster warp (pipelines/warp.py) vs
    the pinned fixture-gen brute force (fixtures._write_warp_expected);
    also pinned against a single-process brute force and an identity
    round-trip in tests/test_warp.py."""
    return _warp_query("nearest")

def q_warp_bilinear(sf_dir: str) -> pd.DataFrame:
    """Distributed BILINEAR warp: 4-corner blend in source pixel-center
    space (shared `bilinear_blend` leaf) with nearest fallback at the
    extent edge, vs the pinned sequential brute-force reprojection
    (oracle_pins.ensure_warpblpin)."""
    return _warp_query("bilinear")

def q_tile_features(sf_dir: str) -> pd.DataFrame:
    """Multimodal feature-extract stage (stages/multimodal.
    TileFeatureActor) over the decoded tile corpus, exporting its
    HASH-SAFE components: per-tile mean (an exactly-representable f64
    sum of f32 values divided by the power-of-two pixel count — bit-
    equal to SQL AVG), min, max (value copies) and the nonzero count.
    The std / interpolated-decile components involve non-associative
    float math and are pinned in tests/test_multimodal.py instead."""
    import ray.data as rd  # noqa: F401

    from gridfia_ray.pipelines.common import decoded_tiles, read_tiles
    from gridfia_ray.stages.multimodal import TileFeatureActor

    f = _fx()
    t = int(f["meta"]["tile"])
    decoded = decoded_tiles(read_tiles(f["tiles"]), f["spec"], include_total=True)
    feats = decoded.map_batches(
        TileFeatureActor, batch_format="pyarrow", concurrency=(1, 4)
    ).to_pandas()
    fv = np.stack([np.asarray(v, np.float64) for v in feats["features"]])
    out = pd.DataFrame(
        {
            "image_id": feats["image_id"].astype(str),
            "mean_u": s6(fv[:, 0]),
            "min_u": s6(fv[:, 2]),
            "max_u": s6(fv[:, 3]),
            "n_nonzero": np.rint(fv[:, 4] * (t * t)).astype(np.int64),
        }
    )
    return out.sort_values("image_id").reset_index(drop=True)

def q_tile_resize(sf_dir: str) -> pd.DataFrame:
    """Multimodal block-mean resize stage (stages/multimodal.
    ResizeActor, 64²→8² per tile): per small-pixel values as scaled
    ints. The stage's f64-exact block mean rounds ONCE to f32, which the
    oracle reproduces with ``CAST(AVG(biomass) AS REAL)`` over the
    independent pixel table — bit-equal, full hash check."""
    from gridfia_ray.pipelines.common import decoded_tiles, read_tiles
    from gridfia_ray.stages.multimodal import ResizeActor

    f = _fx()
    o = 8
    decoded = decoded_tiles(read_tiles(f["tiles"]), f["spec"], include_total=True)
    small = decoded.map_batches(
        ResizeActor, fn_constructor_kwargs={"out": o},
        batch_format="pyarrow", concurrency=(1, 4),
    ).to_pandas()
    ids, sys_, sxs, vals = [], [], [], []
    yy, xx = np.meshgrid(np.arange(o), np.arange(o), indexing="ij")
    for _, r in small.iterrows():
        v = np.frombuffer(r["pix_small"], "<f4").reshape(o, o)
        ids.append(np.full(o * o, r["image_id"], dtype=object))
        sys_.append(yy.ravel())
        sxs.append(xx.ravel())
        vals.append(v.ravel())
    out = pd.DataFrame(
        {
            "image_id": np.concatenate(ids).astype(str),
            "sy": np.concatenate(sys_).astype(np.int64),
            "sx": np.concatenate(sxs).astype(np.int64),
            "value_u": s6(np.concatenate(vals)),
        }
    )
    return out.sort_values(["image_id", "sy", "sx"]).reset_index(drop=True)

def q_normalize_clip(sf_dir: str) -> pd.DataFrame:
    """M16 percentile-clip normalize over the total-biomass raster:
    window = EXACT p2/p98 of the nonzero species values (distributed
    quickselect — quantile_disc semantics, so the window bounds are
    actual data values), then clip + min-max scale per pixel. All
    arithmetic is f64 over identical operands on both sides, so the
    oracle (LEAST/GREATEST + the same division) is bit-equal."""
    from gridfia_ray.pipelines import metrics as M
    from gridfia_ray.pipelines.common import decoded_tiles, read_tiles
    from gridfia_ray.pipelines.percentiles import (
        normalize_percentile_clip,
        percentiles_exact,
    )

    f = _fx()
    decoded = decoded_tiles(read_tiles(f["tiles"]), f["spec"], include_total=False)
    pct = percentiles_exact(decoded, [2.0, 98.0])
    p_lo, p_hi = pct[2.0], pct[98.0]
    res = M.run_metrics(
        f["tiles"],
        registry.from_configs([{"name": "total_biomass", "parameters": {}}]),
        f["spec"],
        f["catalog"],
        n_tiles_hint=f["meta"]["n_tiles"],
        n_species_hint=f["meta"]["n_species"],
        precise=True,
    )
    pix = M.metrics_to_pixels(res).to_pandas()
    out = pix[["y", "x"]].copy()
    out["norm_u"] = s6(
        normalize_percentile_clip(pix["value"].to_numpy(np.float64), p_lo, p_hi)
    )
    return out.sort_values(["y", "x"]).reset_index(drop=True)

def q_hist_equalize(sf_dir: str) -> pd.DataFrame:
    """Global histogram equalization of the total-biomass raster
    (pipelines/histeq.equalize_result): exact integer transfer over a
    256-bin global histogram — two tiny combiner exchanges (min/max/n,
    then the ≤256-row histogram) + one broadcast remap. Oracle = the
    identical integer bin/CDF/LUT arithmetic in SQL windows."""
    from gridfia_ray.pipelines.histeq import equalize_result

    f = _fx()
    out = equalize_result(_total_biomass_result(f)).to_pandas()
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["y", "x"]).reset_index(drop=True)

def q_hist_match(sf_dir: str) -> pd.DataFrame:
    """Histogram matching (pipelines/histeq.match_result): epoch-1 of
    the deterministic 2-year stack radiometrically normalized onto
    epoch-0 — the cross-epoch normalization step before change
    detection. Exact integer transfer (cross-multiplied CDF compare,
    Python-int driver / HUGEINT SQL); oracle re-derives both epochs and
    the identical bin/CDF/LUT arithmetic in SQL windows."""
    import pyarrow.compute as pc

    from gridfia_ray.pipelines.histeq import match_result
    from gridfia_ray.pipelines.temporal import make_yearly_stack

    f = _fx()
    stack = make_yearly_stack(_total_biomass_result(f), 2).materialize()

    def epoch(t: int):
        return stack.map_batches(
            lambda b, tt=t: b.filter(pc.equal(b["year"], tt)),
            batch_format="pyarrow",
        )

    out = match_result(epoch(1), epoch(0)).to_pandas()
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["y", "x"]).reset_index(drop=True)

def q_gf_unsharp(sf_dir: str) -> pd.DataFrame:
    """Unsharp masking (focal.focal_unsharp_tiles): v + 3/2·(v − 3×3
    focal mean) in one exact integer expression over the halo exchange;
    bit-exact vs the windowed self-join SQL oracle (the floor division
    is written as FLOOR on an exactly-representable double quotient on
    both sides)."""
    from gridfia_ray.pipelines.focal import focal_unsharp_tiles

    f = _fx()
    out = focal_unsharp_tiles(_total_biomass_result(f)).to_pandas()
    res = out[["y", "x", "sharp_u"]].astype(np.int64)
    return res.sort_values(["y", "x"]).reset_index(drop=True)

def q_gf_clahe(sf_dir: str) -> pd.DataFrame:
    """CLAHE (pipelines/clahe.clahe_result): per-tile clipped-histogram
    LUTs shipped to the 8 neighbors in one tiny keyed exchange, pixels
    blend the four surrounding tile-center LUTs in pure int64
    bilinear arithmetic. Oracle = the pinned sequential replay
    (oracle_pins.ensure_clahepin — shared LUT kernel, independent
    scalar blend)."""
    from gridfia_ray import oracle_pins
    from gridfia_ray.pipelines.clahe import clahe_result

    f = _fx()
    out = clahe_result(
        _total_biomass_result(f),
        bins=oracle_pins.CLAHE_BINS,
        out_levels=oracle_pins.CLAHE_LEVELS,
    ).to_pandas()
    res = out[["y", "x", "level"]].astype(np.int64)
    return res.sort_values(["y", "x"]).reset_index(drop=True)
