"""Terrain & proximity: distance/cost surfaces, CCL, hydrology
(fill/flow/TWI/D-inf/flow-length), viewshed, kriging.

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


def q_distance_transform(sf_dir: str) -> pd.DataFrame:
    """L1 proximity raster (pipelines/distance.distance_transform_tiles
    — separable two-pass banded scan, gdal_proximity semantics): pixel
    steps to the nearest total-biomass pixel above 150. Exact int64
    distances vs a MIN(|Δy|+|Δx|) cross-join oracle."""
    from gridfia_ray.pipelines.distance import distance_transform_tiles

    f = _fx()
    out = distance_transform_tiles(
        _total_biomass_result(f), threshold=150.0
    ).to_pandas()
    res = out[["y", "x", "dist"]].astype(np.int64)
    return res.sort_values(["y", "x"]).reset_index(drop=True)

def q_distance_transform_l2(sf_dir: str) -> pd.DataFrame:
    """Exact squared-Euclidean proximity raster (pipelines/distance.
    distance_transform_l2_tiles — shared vertical pass + blocked
    vectorized column envelope, FH semantics in integers): min
    (Δy)²+(Δx)² to the nearest total-biomass pixel above 150, vs a
    MIN cross-join oracle."""
    from gridfia_ray.pipelines.distance import distance_transform_l2_tiles

    f = _fx()
    out = distance_transform_l2_tiles(
        _total_biomass_result(f), threshold=150.0
    ).to_pandas()
    res = out[["y", "x", "dist2"]].astype(np.int64)
    return res.sort_values(["y", "x"]).reset_index(drop=True)

def q_euclidean_allocation(sf_dir: str) -> pd.DataFrame:
    """Euclidean allocation (pipelines/distance.euclidean_allocation_
    tiles): per pixel the identity of the nearest total-biomass seed
    pixel above 150 plus its exact squared distance, ties broken
    lexicographically on (dist², seed_y, seed_x) — the ArcGIS
    EucAllocation analogue, hash-matched against a ROW_NUMBER
    cross-join oracle."""
    from gridfia_ray.pipelines.distance import euclidean_allocation_tiles

    f = _fx()
    out = euclidean_allocation_tiles(
        _total_biomass_result(f), threshold=150.0
    ).to_pandas()
    res = out[["y", "x", "seed_y", "seed_x", "dist2"]].astype(np.int64)
    return res.sort_values(["y", "x"]).reset_index(drop=True)

def q_cost_distance(sf_dir: str) -> pd.DataFrame:
    """Chamfer-3/4 integer cost distance (pipelines/costdist.
    cost_distance_tiles): minimum accumulated traversal cost from any
    total-biomass source pixel above 150, link cost 3·(c(a)+c(b))
    orthogonal / 4·(c(a)+c(b)) diagonal, via halo-strip supersteps.
    Oracle = a sequential heapq Dijkstra replay with the identical
    integer weights (oracle_pins.ensure_costpin)."""
    from gridfia_ray import oracle_pins  # noqa: F401  (oracle pairing)
    from gridfia_ray.pipelines.costdist import cost_distance_tiles

    f = _fx()
    out = cost_distance_tiles(
        _total_biomass_result(f),
        source_threshold=oracle_pins.COST_SOURCE_THRESHOLD,
        coarsen=4,  # 8×8 tile grid → 2×2 super-tiles: ~4× fewer rounds
    ).to_pandas()
    res = out[["y", "x", "cdist"]].astype(np.int64)
    return res.sort_values(["y", "x"]).reset_index(drop=True)

def q_cost_backlink(sf_dir: str) -> pd.DataFrame:
    """Cost back-link raster (pipelines/costdist.cost_backlink_tiles):
    per pixel the D8 code of the first step on the least-cost path back
    to the nearest source (−1 at sources), ties first-min-wins in D8
    order. One extra strip exchange over the converged cost state;
    oracle = the same argmin rule over the Dijkstra pin's distance
    grid."""
    from gridfia_ray import oracle_pins  # noqa: F401  (oracle pairing)
    from gridfia_ray.pipelines.costdist import cost_backlink_tiles

    f = _fx()
    out = cost_backlink_tiles(
        _total_biomass_result(f),
        source_threshold=oracle_pins.COST_SOURCE_THRESHOLD,
        coarsen=4,
    ).to_pandas()
    res = out[["y", "x", "backlink"]].astype(np.int64)
    return res.sort_values(["y", "x"]).reset_index(drop=True)

def q_cost_allocation(sf_dir: str) -> pd.DataFrame:
    """Cost allocation (pipelines/costdist.cost_allocation_tiles): per
    pixel the pid of the source its least-cost path reaches, over the
    +1.0-shifted total-biomass raster (strictly positive costs — the
    allocation precondition). The backlink field packs as (z=dist,
    dir=backlink) and the watershed border-resolution machinery labels
    the chains; oracle = the sequential Dijkstra + argmin + ascending-
    dist chain replay (oracle_pins.ensure_allocpin)."""
    from gridfia_ray import oracle_pins  # noqa: F401  (oracle pairing)
    from gridfia_ray.pipelines.costdist import cost_allocation_tiles

    f = _fx()
    width = int(f["meta"]["grid"]) * int(f["meta"]["tile"])

    def shift(b: pd.DataFrame) -> pd.DataFrame:
        out = b.copy()
        pix = []
        for _, r in b.iterrows():
            arr = np.frombuffer(r["pix"], np.dtype(r["dtype"]))
            pix.append((arr + 1.0).tobytes())
        out["pix"] = pix
        return out

    shifted = _total_biomass_result(f).map_batches(
        shift, batch_format="pandas"
    )
    out = cost_allocation_tiles(
        shifted,
        source_threshold=oracle_pins.ALLOC_SOURCE_THRESHOLD,
        width=width,
        coarsen=4,
    ).to_pandas()
    res = out[["y", "x", "alloc"]].astype(np.int64)
    return res.sort_values(["y", "x"]).reset_index(drop=True)

def q_cost_paths(sf_dir: str) -> pd.DataFrame:
    """Least-cost paths (pipelines/costdist.cost_paths_tiles): the full
    backlink walks from the 5 pinned destinations (corners + center)
    over the +1.0-shifted raster, each round one batched tile gather —
    vs the pin's sequential walk of the identical backlink field."""
    from gridfia_ray import oracle_pins
    from gridfia_ray.pipelines.costdist import cost_paths_tiles

    f = _fx()
    n = int(f["meta"]["grid"]) * int(f["meta"]["tile"])

    def shift(b: pd.DataFrame) -> pd.DataFrame:
        out = b.copy()
        out["pix"] = [
            (np.frombuffer(r["pix"], np.dtype(r["dtype"])) + 1.0).tobytes()
            for _, r in b.iterrows()
        ]
        return out

    dests = [
        (i, y, x)
        for i, (y, x) in enumerate(oracle_pins.alloc_path_destinations(n))
    ]
    out = cost_paths_tiles(
        _total_biomass_result(f).map_batches(shift, batch_format="pandas"),
        source_threshold=oracle_pins.ALLOC_SOURCE_THRESHOLD,
        destinations=dests,
        coarsen=4,
    )
    return out[["dest_id", "step", "y", "x"]].astype(np.int64)

def q_cost_distance_src(sf_dir: str) -> pd.DataFrame:
    """DECOUPLED-source cost distance (the ArcGIS two-raster form):
    traversal costs = the total-biomass raster, sources = the species-
    0131 PRESENCE raster (a separate layer co-keyed per tile in one
    exchange; pipelines/costdist.cost_distance_tiles(sources=…)).
    Oracle = the Dijkstra replay with the same decoupled source set
    (oracle_pins.ensure_costsrcpin)."""
    from gridfia_ray import oracle_pins  # noqa: F401  (oracle pairing)
    from gridfia_ray.pipelines import metrics as M
    from gridfia_ray.pipelines.costdist import cost_distance_tiles

    f = _fx()
    presence = M.run_metrics(
        f["tiles"],
        registry.from_configs(
            [{"name": "species_presence",
              "parameters": {"species_code": "0131"}}]
        ),
        f["spec"],
        f["catalog"],
        n_tiles_hint=f["meta"]["n_tiles"],
        n_species_hint=f["meta"]["n_species"],
        precise=True,
    )
    out = cost_distance_tiles(
        _total_biomass_result(f),
        source_threshold=0.5,
        sources=presence,
        coarsen=4,
    ).to_pandas()
    res = out[["y", "x", "cdist"]].astype(np.int64)
    return res.sort_values(["y", "x"]).reset_index(drop=True)

def q_connected_components(sf_dir: str) -> pd.DataFrame:
    """Distributed 4-connected patch labeling of biomass > threshold
    (pipelines/ccl.py: per-tile run union-find, O(perimeter) border
    exchange, hash-min component merge, anchor-pixel canonical ids).
    Oracle = pinned parquet from an independent single-process BFS
    flood fill over the fixture generator's pixel table
    (oracle_pins.ensure_cclpin)."""
    from gridfia_ray import oracle_pins
    from gridfia_ray.pipelines import metrics as M
    from gridfia_ray.pipelines.ccl import connected_components

    f = _fx()
    labeled, _ = connected_components(
        _total_biomass_result(f),
        int(f["meta"]["grid"]),
        threshold=oracle_pins.CCL_THRESHOLD,
    )
    pix = M.metrics_to_pixels(labeled).to_pandas()
    pix = pix[pix["value"] >= 0]
    out = pd.DataFrame(
        {
            "y": pix["y"].astype(np.int64),
            "x": pix["x"].astype(np.int64),
            # anchors < 2^53, so the float64 explode hop is exact
            "component": pix["value"].astype(np.int64),
        }
    )
    return out.sort_values(["y", "x"]).reset_index(drop=True)

def q_component_sizes(sf_dir: str) -> pd.DataFrame:
    """The companion per-component size table from the same pipeline,
    checked against an independent SQL aggregation of the BFS pin."""
    from gridfia_ray import oracle_pins
    from gridfia_ray.pipelines.ccl import connected_components

    f = _fx()
    _, comps = connected_components(
        _total_biomass_result(f),
        int(f["meta"]["grid"]),
        threshold=oracle_pins.CCL_THRESHOLD,
    )
    out = comps.to_pandas()
    out["component"] = out["component"].astype(np.int64)
    out["n_pixels"] = out["n_pixels"].astype(np.int64)
    return out.sort_values("component").reset_index(drop=True)

def q_component_props(sf_dir: str) -> pd.DataFrame:
    """Region properties over the CCL labeling (pipelines/ccl.
    component_props): per component the pixel count, global bbox and
    integer coordinate sums (regionprops essentials — all-int64 so the
    comparison is hash-exact). Oracle = SQL aggregation of the SAME
    independent BFS pin the other CCL queries trust."""
    from gridfia_ray import oracle_pins
    from gridfia_ray.pipelines.ccl import component_props, connected_components

    f = _fx()
    labeled, _ = connected_components(
        _total_biomass_result(f),
        int(f["meta"]["grid"]),
        threshold=oracle_pins.CCL_THRESHOLD,
    )
    out = component_props(labeled).to_pandas()
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("component").reset_index(drop=True)

def q_sieve(sf_dir: str) -> pd.DataFrame:
    """GDAL-style sieve filter: components under min_size erased to
    background (pipelines/ccl.sieve_components — counted broadcast of
    the undersized-id set with a co-bucketed auto-route beyond the
    bound). Oracle = SQL GROUP BY/HAVING derivation over the SAME
    independent BFS pin the CCL queries trust — the sieve semantics are
    re-derived in SQL, not replayed."""
    from gridfia_ray import oracle_pins
    from gridfia_ray.pipelines import metrics as M
    from gridfia_ray.pipelines.ccl import connected_components, sieve_components

    f = _fx()
    labeled, comps = connected_components(
        _total_biomass_result(f),
        int(f["meta"]["grid"]),
        threshold=oracle_pins.CCL_THRESHOLD,
    )
    sieved = sieve_components(labeled, comps, min_size=2)
    pix = M.metrics_to_pixels(sieved).to_pandas()
    pix = pix[pix["value"] >= 0]
    out = pd.DataFrame(
        {
            "y": pix["y"].astype(np.int64),
            "x": pix["x"].astype(np.int64),
            "component": pix["value"].astype(np.int64),
        }
    )
    return out.sort_values(["y", "x"]).reset_index(drop=True)

def q_flow_accumulation(sf_dir: str) -> pd.DataFrame:
    """D8 flow routing over the total-biomass raster
    (pipelines/flow.py): direction via the halo exchange (unweighted
    max-drop, fixed octant tie-break), accumulation via tile-local
    topological solves + cross-tile superstep settling to the exact
    fixed point. Oracle = pinned parquet from an independent
    single-process replay (global descending-z push loop, no tiling —
    oracle_pins.ensure_flowpin)."""
    from gridfia_ray import oracle_pins  # noqa: F401  (oracle pairing)
    from gridfia_ray.pipelines.flow import flow_accumulate, flow_direction_packed

    f = _fx()
    packed = flow_direction_packed(_total_biomass_result(f))
    out = flow_accumulate(packed).to_pandas()
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["y", "x"]).reset_index(drop=True)

def q_watershed(sf_dir: str) -> pd.DataFrame:
    """Watershed basin delineation over the D8 directions
    (pipelines/flow.watershed): basin = global linear index of the pit
    each cell drains to, labeled via ONE border-resolution exchange +
    driver path compression + one broadcast labeling pass (no
    supersteps — the ring mapping is static). Oracle = the same pinned
    flow replay's ascending-z basin resolve
    (oracle_pins.ensure_flowpin)."""
    from gridfia_ray import oracle_pins  # noqa: F401  (oracle pairing)
    from gridfia_ray.pipelines.flow import flow_direction_packed, watershed

    f = _fx()
    width = int(f["meta"]["grid"]) * int(f["meta"]["tile"])
    packed = flow_direction_packed(_total_biomass_result(f))
    out = watershed(packed, width).to_pandas()
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["y", "x"]).reset_index(drop=True)

def q_strahler(sf_dir: str) -> pd.DataFrame:
    """Strahler stream order over the D8 flow forest
    (pipelines/flow.strahler_order): tile-local descending-z passes +
    cross-tile edge-order supersteps with an exact monotone stopping
    rule. Oracle = the pinned flow replay's global descending-z
    Strahler pass (oracle_pins.ensure_flowpin)."""
    from gridfia_ray import oracle_pins  # noqa: F401  (oracle pairing)
    from gridfia_ray.pipelines.flow import flow_direction_packed, strahler_order

    f = _fx()
    packed = flow_direction_packed(_total_biomass_result(f))
    out = strahler_order(packed).to_pandas()
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["y", "x"]).reset_index(drop=True)

def q_change_patches(sf_dir: str) -> pd.DataFrame:
    """Two-epoch change detection: the year-0→1 delta of the synthetic
    stack (pipelines/temporal.temporal_delta_tiles, |delta| mode)
    thresholded and CCL-labeled into change patches — the standard
    remote-sensing change-map composition, exercising epoch
    differencing → threshold → distributed labeling end to end. Oracle
    = pinned BFS flood fill over the independently re-derived delta
    mask (oracle_pins.ensure_changepin)."""
    from gridfia_ray import oracle_pins
    from gridfia_ray.pipelines import metrics as M
    from gridfia_ray.pipelines.ccl import connected_components
    from gridfia_ray.pipelines.temporal import (
        make_yearly_stack,
        temporal_delta_tiles,
    )

    f = _fx()
    stack = make_yearly_stack(_total_biomass_result(f), 2)
    absd = temporal_delta_tiles(stack, absolute=True)
    labeled, _ = connected_components(
        absd, int(f["meta"]["grid"]), threshold=oracle_pins.CHANGE_THRESHOLD
    )
    pix = M.metrics_to_pixels(labeled).to_pandas()
    pix = pix[pix["value"] >= 0]
    out = pd.DataFrame(
        {
            "y": pix["y"].astype(np.int64),
            "x": pix["x"].astype(np.int64),
            "component": pix["value"].astype(np.int64),
        }
    )
    return out.sort_values(["y", "x"]).reset_index(drop=True)

def q_gf_fill_sinks(sf_dir: str) -> pd.DataFrame:
    """Depression filling (pipelines/fill.fill_sinks_tiles): the
    Planchon-Darboux least fixpoint via monotone halo-strip supersteps
    over the total-biomass raster-as-DEM. Oracle = an INDEPENDENT
    sequential Priority-Flood heap replay (oracle_pins.ensure_fillpin)
    — int64-exact agreement of the filled surface and standing depth on
    all 262,144 pixels."""
    from gridfia_ray import oracle_pins  # noqa: F401  (oracle pairing)
    from gridfia_ray.pipelines.fill import fill_sinks_tiles

    f = _fx()
    out = fill_sinks_tiles(_total_biomass_result(f)).to_pandas()
    res = out[["y", "x", "fill_u", "depth_u"]].astype(np.int64)
    return res.sort_values(["y", "x"]).reset_index(drop=True)

def q_gf_flow_filled(sf_dir: str) -> pd.DataFrame:
    """Hydrologically-conditioned flow routing — the fill → route
    composition real DEMs require (depressions break D8): ε=1
    depression fill (pipelines/fill, halo supersteps, drainage
    gradient) handed off as result tiles to flow_direction_packed →
    flow_accumulate (halo direction exchange + superstep settling).
    Oracle = an independent sequential Priority-Flood-ε then the
    descending-z push replay on the filled surface
    (oracle_pins.ensure_flowfillpin)."""
    from gridfia_ray import oracle_pins  # noqa: F401  (oracle pairing)

    f = _fx()
    out = _acc_filled_result(f).to_pandas()
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["y", "x"]).reset_index(drop=True)

def q_gf_twi(sf_dir: str) -> pd.DataFrame:
    """Topographic wetness index ln((acc+1)/max(tanβ, 10⁻³)) over the
    ε-filled surface — the three-stage terrain composition: fill →
    D8 accumulation (superstep settling) ∥ D8 drop geometry (one halo
    exchange) → pixel-keyed co-bucketed attach → elementwise TWI (the
    shared oracle_pins.twi_values formula). Oracle = the sequential
    Priority-Flood-ε + push replay's twi_u column
    (oracle_pins.ensure_flowfillpin)."""
    from gridfia_ray import oracle_pins  # noqa: F401  (oracle pairing)
    from gridfia_ray.pipelines.flow import wetness_index_tiles

    f = _fx()
    out = wetness_index_tiles(
        _total_biomass_result(f),
        prepacked=_packed_filled_coarse(f),
        preacc=_acc_filled_result(f),
    ).to_pandas()
    out = out.astype(
        {"y": np.int64, "x": np.int64, "twi_u": np.int64,
         "spi_u": np.int64}
    )
    return out.sort_values(["y", "x"]).reset_index(drop=True)

def q_gf_dinf_accumulation(sf_dir: str) -> pd.DataFrame:
    """D∞ (Tarboton) flow: facet-steepest directions with proportional
    two-receiver splits in 2^16-ths, catchment accumulated as exact
    fixed-point int64 (floor (w·A)>>16 per push — order-independent, so
    the tile-local solves + cross-tile superstep settling bit-match a
    sequential full-grid push). Oracle = the pinned replay sharing only
    the elementwise direction kernel (oracle_pins.ensure_dinfpin)."""
    from gridfia_ray import oracle_pins  # noqa: F401  (oracle pairing)
    from gridfia_ray.pipelines.flow import dinf_accumulate, dinf_packed

    f = _fx()
    out = dinf_accumulate(dinf_packed(_total_biomass_result(f))).to_pandas()
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["y", "x"]).reset_index(drop=True)

def q_gf_flow_length(sf_dir: str) -> pd.DataFrame:
    """Upstream D8 flow-path length (ArcGIS FlowLength) in exact
    integer µ-cells — max-plus supersteps over the packed direction
    tiles (pipelines/flow.flow_length_upstream). Oracle = the
    sequential descending-z max-plus push replay
    (oracle_pins.ensure_flowlenpin)."""
    from gridfia_ray import oracle_pins  # noqa: F401  (oracle pairing)
    from gridfia_ray.pipelines.flow import (
        flow_direction_packed,
        flow_length_upstream,
    )

    f = _fx()
    out = flow_length_upstream(
        flow_direction_packed(_total_biomass_result(f))
    ).to_pandas()
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["y", "x"]).reset_index(drop=True)

def q_gf_viewshed(sf_dir: str) -> pd.DataFrame:
    """Bounded-radius viewshed (pipelines/viewshed.viewshed_tiles):
    per-pixel count of the 11 pinned observers with unobstructed R3
    line of sight (radius 16, eye +50 units) over the total-biomass
    raster — radius-16 halo exchange, broadcast observer routing,
    offset-space LOS floats. Oracle = the same los_visible kernel
    applied sequentially to the full grid (oracle_pins.ensure_viewpin);
    the exchange and routing are what the hash verifies."""
    from gridfia_ray import oracle_pins
    from gridfia_ray.pipelines.viewshed import viewshed_tiles

    f = _fx()
    n = f["meta"]["grid"] * f["meta"]["tile"]
    out = viewshed_tiles(
        _total_biomass_result(f),
        oracle_pins.viewpin_observers(n),
        radius=oracle_pins.VIEW_RADIUS,
        eye_add_u=oracle_pins.VIEW_EYE_U,
    ).to_pandas()
    res = out[["y", "x", "n_vis"]].astype(np.int64)
    return res.sort_values(["y", "x"]).reset_index(drop=True)

def q_gf_kriging(sf_dir: str) -> pd.DataFrame:
    """Ordinary kriging (pipelines/kriging.krige_points): the pinned
    spherical variogram model, exact Z-order ring-expansion kNN(8)
    neighborhoods over the broadcast plot table, deterministic
    (distance, plot index) system order so the (k+1)² OK solve is a
    pure function of (point, plots). Oracle = the sequential
    brute-force-distance replay (oracle_pins.ensure_krigpin), bit-exact
    at µ-scale."""
    import ray.data as rd

    from gridfia_ray import oracle_pins
    from gridfia_ray.pipelines import kriging as KR

    p = oracle_pins.ensure_krigpin()
    spec = GridSpec(
        origin_x=0.0, origin_y=0.0, px=oracle_pins.KRIG_PIN_CELL, tile=1
    )
    out = KR.krige_points(
        rd.read_parquet(p["points"]),
        p["plots"],
        spec,
        oracle_pins.krigpin_model(),
        k=oracle_pins.KRIG_PIN_K,
    ).to_pandas()
    res = out[["point_id"]].astype(np.int64)
    res["pred_u"] = s6(out["pred"])
    res["var_u"] = s6(out["krig_var"])
    res["k_used"] = out["k_used"].astype(np.int64)
    return res.sort_values("point_id").reset_index(drop=True)
