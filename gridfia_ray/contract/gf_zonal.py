"""Zonal statistics, spatial joins, autocorrelation, percentiles,
exports windows, CRS/S2 vectors, config-compiled jobs.

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


def q_identify(sf_dir: str) -> pd.DataFrame:
    """S4 point identify through the API facade (api.identify_pixel —
    cell-id prune to ONE tile, decode, index): a deterministic lattice
    of 25 world-coordinate probes × 2 species, hash-checked against the
    independent pixel table (the oracle recomputes the pixel index from
    the same affine transform in SQL)."""
    from gridfia_ray.api import GridFIARay

    f = _fx()
    spec = f["spec"]
    api = GridFIARay(spec)
    n_px = f["meta"]["grid"] * f["meta"]["tile"]
    # probe pixel centers on a 5x5 lattice (off-edge, deterministic)
    idx = np.linspace(3, n_px - 4, 5).astype(np.int64)
    rows = []
    for code in ("0000", "0131"):
        for py in idx:
            for px in idx:
                x = spec.origin_x + (px + 0.5) * spec.px
                y = spec.origin_y - (py + 0.5) * spec.px
                v = api.identify_pixel(f["tiles"], float(x), float(y), code)
                rows.append((code, int(py), int(px), int(s6(v))))
    out = pd.DataFrame(rows, columns=["species_code", "y", "x", "value_u"])
    out["y"] = out["y"].astype(np.int64)
    out["x"] = out["x"].astype(np.int64)
    out["value_u"] = out["value_u"].astype(np.int64)
    return out.sort_values(["species_code", "y", "x"]).reset_index(drop=True)

def q_species_dominance(sf_dir: str) -> pd.DataFrame:
    from gridfia_ray.pipelines.common import decoded_tiles, read_tiles
    from gridfia_ray.pipelines.metrics import dominance_stats

    f = _fx()
    decoded = decoded_tiles(
        read_tiles(f["tiles"]), f["spec"], include_total=False, task_mode=True
    )
    dom = dominance_stats(decoded, f["catalog"]).set_index("species_code")
    species = [c for c in f["catalog"] if c != "0000"]
    dom = dom.reindex(species, fill_value=0)  # cat_index 0 = 'none', not a species
    out = pd.DataFrame({"species_code": species})
    out["dominant_px"] = dom["dominant_px"].to_numpy().astype(np.int64)
    out["dominance_u"] = s6(dom["dominance_percent"].to_numpy())
    return out

def q_occurrence_stats(sf_dir: str) -> pd.DataFrame:
    from gridfia_ray.pipelines.common import decoded_tiles, read_tiles
    from gridfia_ray.pipelines.metrics import occurrence_stats

    f = _fx()
    decoded = decoded_tiles(
        read_tiles(f["tiles"]), f["spec"], include_total=False, task_mode=True
    )
    occ = occurrence_stats(decoded)
    out = occ[["species_code"]].copy()
    out["present_px"] = occ["present_px"].astype(np.int64)
    out["n_px"] = occ["n_px"].astype(np.int64)
    out["sum_biomass_u"] = s6(occ["sum_biomass"])
    out["max_biomass_u"] = s6(occ["max_biomass"])
    return out

def q_cooccurrence(sf_dir: str) -> pd.DataFrame:
    """Species co-occurrence matrix (pipelines/metrics.
    cooccurrence_matrix): per unordered species pair the pixel count
    where both layers are present — one keyed tile exchange + per-tile
    boolean-outer-product (GEMM) combiners, vs the pixel self-join
    oracle."""
    from gridfia_ray.pipelines.common import decoded_tiles, read_tiles
    from gridfia_ray.pipelines.metrics import cooccurrence_matrix

    f = _fx()
    decoded = decoded_tiles(read_tiles(f["tiles"]), f["spec"], include_total=False)
    out = cooccurrence_matrix(decoded)
    out["sa"] = out["sa"].astype(str)
    out["sb"] = out["sb"].astype(str)
    out["n_both"] = out["n_both"].astype(np.int64)
    return out

def q_coverage_topk(sf_dir: str) -> pd.DataFrame:
    occ = q_occurrence_stats(sf_dir)
    cov = occ[["species_code"]].copy()
    cov["coverage_u"] = s6(occ["present_px"] / occ["n_px"] * 100.0)
    return cov.sort_values("coverage_u", ascending=False).head(10).reset_index(drop=True)

def q_zonal_stats(sf_dir: str) -> pd.DataFrame:
    from gridfia_ray.pipelines import zonal as Z

    f = _fx()
    zs = Z.zonal_stats(f["tiles"], Z.load_zones(f["zones"]), f["spec"]).to_pandas()
    out = zs[["zone_id"]].copy()
    out["n_pixels"] = zs["n_pixels"].astype(np.int64)
    out["richness"] = zs["richness"].astype(np.int64)
    for c in ["shannon", "simpson", "evenness", "chao1", "ace", "total_biomass", "mean_biomass"]:
        out[c + "_u"] = s6(zs[c])
    return out.sort_values("zone_id").reset_index(drop=True)

def q_zonal_percentiles(sf_dir: str) -> pd.DataFrame:
    """Per-zone EXACT biomass percentiles (p2/p50/p98 over nonzero
    per-(species, pixel) values): the zone-masked fused decode+join
    stage emits tile-granular packed value rows, then the keyed
    distributed quickselect selects per (zone, q) — raster→vector order
    statistics without a per-pixel row explosion."""
    from gridfia_ray.pipelines import zonal as Z
    from gridfia_ray.pipelines.percentiles import grouped_percentiles_exact

    f = _fx()
    rows = Z.zone_value_rows(f["tiles"], Z.load_zones(f["zones"]), f["spec"])
    out = grouped_percentiles_exact(
        rows, "zone_id", "vals", [2.0, 50.0, 98.0], packed=True
    )
    res = pd.DataFrame(
        {
            "zone_id": out["zone_id"].astype(str),
            "q_pct": out["q_pct"].astype(np.int64),
            "value_u": s6(out["value"]),
        }
    )
    return res.sort_values(["zone_id", "q_pct"]).reset_index(drop=True)

def q_tile_zone_join(sf_dir: str) -> pd.DataFrame:
    from gridfia_ray.pipelines import zonal as Z

    f = _fx()
    j = Z.tile_zone_join(f["tiles"], Z.load_zones(f["zones"]), f["spec"]).to_pandas()
    return j.sort_values(["zone_id", "image_id"]).reset_index(drop=True)

def q_rasterize(sf_dir: str) -> pd.DataFrame:
    """Vector→raster burn (gdal_rasterize semantics; reference's
    boundary-driven raster/vector bridge run the other way): every pixel
    whose center lies in ≥1 zone gets the smallest containing zone_id.
    Exploded to (y, x, zone_id) rows only for the oracle compare — at
    scale the burn stays tiled."""
    from gridfia_ray.pipelines import zonal as Z
    from gridfia_ray.pipelines.metrics import metrics_to_pixels

    f = _fx()
    g = int(f["meta"]["grid"])
    burned, cat = Z.rasterize_zones(Z.load_zones(f["zones"]), f["spec"], g, g)
    pix = metrics_to_pixels(burned).to_pandas()
    pix = pix[pix["value"] >= 0]
    out = pd.DataFrame(
        {
            "y": pix["y"].astype(np.int64),
            "x": pix["x"].astype(np.int64),
            "zone_id": np.array(cat, dtype=object)[pix["value"].astype(int).to_numpy()],
        }
    )
    return out.sort_values(["y", "x"]).reset_index(drop=True)

def q_quantile_classes(sf_dir: str) -> pd.DataFrame:
    """Cartographic quantile classification of the total-biomass raster
    — every pixel's exact global NTILE(5) class (ties by pixel id) via
    pipelines/rank.ntile_exact, i.e. the quantile-breaks renderer
    computed WITHOUT a global sort. Hash-exact vs SQL NTILE."""
    from gridfia_ray.pipelines import metrics as M
    from gridfia_ray.pipelines.rank import ntile_exact

    f = _fx()
    n_px = int(f["meta"]["grid"]) * int(f["meta"]["tile"])
    pix = M.metrics_to_pixels(_total_biomass_result(f))

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "pid": (b["y"] * n_px + b["x"]).astype(np.int64),
                "v_u": s6(b["value"]),
            }
        )

    out = ntile_exact(
        pix.map_batches(prep, batch_format="pandas"), "v_u", "pid", 5
    ).to_pandas()
    res = pd.DataFrame(
        {
            "y": (out["pid"] // n_px).astype(np.int64),
            "x": (out["pid"] % n_px).astype(np.int64),
            "class": out["tile"].astype(np.int64),
        }
    )
    return res.sort_values(["y", "x"]).reset_index(drop=True)

def q_zonal_raster_stats(sf_dir: str) -> pd.DataFrame:
    """ArcGIS-style ZonalStatistics over the CONTINUOUS total-biomass
    raster (pipelines/zonal.zonal_result_stats): per zone the pixel
    count, min, max and sum of the µ-values, zone layer = the rasterize
    burn (overlaps → smallest zone_id). One keyed value↔burn exchange +
    a tiny merge; all columns exact int64."""
    from gridfia_ray.pipelines import zonal as Z

    f = _fx()
    g = int(f["meta"]["grid"])
    out = Z.zonal_result_stats(
        _total_biomass_result(f), Z.load_zones(f["zones"]), f["spec"], g, g
    )
    for c in ("n_px", "min_u", "max_u", "sum_u"):
        out[c] = out[c].astype(np.int64)
    out["zone_id"] = out["zone_id"].astype(str)
    return out

def q_tabulate_area(sf_dir: str) -> pd.DataFrame:
    """ArcGIS TabulateArea (pipelines/zonal.tabulate_area): cross-tab
    pixel counts between the rasterized zone layer and the exact global
    NTILE(5) classes of the total-biomass raster — zone × quantile
    class areas in one pid-bucketed exchange, vs the pixel-geometry +
    SQL-NTILE oracle."""
    from gridfia_ray.pipelines import metrics as M
    from gridfia_ray.pipelines import zonal as Z
    from gridfia_ray.pipelines.rank import ntile_exact

    f = _fx()
    g = int(f["meta"]["grid"])
    n_px = g * int(f["meta"]["tile"])
    pix = M.metrics_to_pixels(_total_biomass_result(f))

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "pid": (b["y"] * n_px + b["x"]).astype(np.int64),
                "v_u": s6(b["value"]),
            }
        )

    classed = ntile_exact(
        pix.map_batches(prep, batch_format="pandas"), "v_u", "pid", 5
    )

    def sel(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"pid": b["pid"].astype(np.int64), "class": b["tile"].astype(np.int64)}
        )

    out = Z.tabulate_area(
        classed.map_batches(sel, batch_format="pandas"),
        Z.load_zones(f["zones"]),
        f["spec"],
        g,
        g,
    )
    out["zone_id"] = out["zone_id"].astype(str)
    for c in ("class", "n_px"):
        out[c] = out[c].astype(np.int64)
    return out

def q_zonal_geometry(sf_dir: str) -> pd.DataFrame:
    """ArcGIS ZonalGeometry (pipelines/zonal.zonal_geometry): per zone
    the exact pixel area, centroid coordinate sums and 4-edge
    perimeter, from the rasterize burn through the focal halo exchange
    — vs the pixel-geometry adjacency oracle."""
    from gridfia_ray.pipelines import zonal as Z

    f = _fx()
    g = int(f["meta"]["grid"])
    out = Z.zonal_geometry(Z.load_zones(f["zones"]), f["spec"], g, g)
    out["zone_id"] = out["zone_id"].astype(str)
    for c in ("n_px", "sum_y", "sum_x", "perim"):
        out[c] = out[c].astype(np.int64)
    return out

def q_zone_neighbors(sf_dir: str) -> pd.DataFrame:
    """ArcGIS PolygonNeighbors (pipelines/zonal.zone_neighbors): per
    adjacent zone pair the exact shared 4-edge count, each edge counted
    once (south+east scan) — vs the pixel-geometry adjacency oracle."""
    from gridfia_ray.pipelines import zonal as Z

    f = _fx()
    g = int(f["meta"]["grid"])
    out = Z.zone_neighbors(Z.load_zones(f["zones"]), f["spec"], g, g)
    for c in ("zone_a", "zone_b"):
        out[c] = out[c].astype(str)
    out["shared_edges"] = out["shared_edges"].astype(np.int64)
    return out

def q_knn_idw(sf_dir: str) -> pd.DataFrame:
    from gridfia_ray.pipelines import knn as K

    f = _fx()
    kn = K.knn_interpolate(f["tiles"], f["plots"], f["spec"], k=4, power=2.0)
    df = kn.to_pandas()
    out = df[["tile_row", "tile_col"]].astype(np.int64)
    out["knn_u"] = s6(df["knn_value"])
    return out.sort_values(["tile_row", "tile_col"]).reset_index(drop=True)

def q_morans_i(sf_dir: str) -> pd.DataFrame:
    from gridfia_ray.pipelines.moran import morans_i

    f = _fx()
    r = morans_i(f["tiles"], f["spec"])
    return pd.DataFrame(
        [
            {
                "morans_i_u": int(s6(r["morans_i"])),
                "n_tiles": np.int64(r["n_tiles"]),
                "w_pairs": np.int64(r["w_pairs"]),
            }
        ]
    )

def q_geary_c(sf_dir: str) -> pd.DataFrame:
    """Global Geary's C (the local-variation autocorrelation companion
    to Moran's I) over per-tile mean biomass, queen contiguity — the
    pair term folds through one message exchange, never as pairs."""
    from gridfia_ray.pipelines.moran import geary_c

    f = _fx()
    r = geary_c(f["tiles"], f["spec"])
    return pd.DataFrame(
        [
            {
                "geary_c_u": int(s6(r["geary_c"])),
                "n_tiles": np.int64(r["n_tiles"]),
                "w_pairs": np.int64(r["w_pairs"]),
            }
        ]
    )

def q_percentiles(sf_dir: str) -> pd.DataFrame:
    """A5 analog: global value percentiles via the mergeable-histogram
    sketch (approximate by design → rows-only check; exactness is pinned
    in tests/test_reassemble_percentiles.py against np.percentile)."""
    from gridfia_ray.pipelines.common import decoded_tiles, read_tiles
    from gridfia_ray.pipelines.percentiles import percentiles_histogram

    f = _fx()
    decoded = decoded_tiles(read_tiles(f["tiles"]), f["spec"], include_total=False)
    got = percentiles_histogram(decoded, [2.0, 50.0, 98.0], bins=4096)
    return pd.DataFrame(
        {"q": [2.0, 50.0, 98.0], "value_u": s6([got[2.0], got[50.0], got[98.0]])}
    )

def q_percentiles_exact(sf_dir: str) -> pd.DataFrame:
    """A5 exact form: distributed quickselect via histogram refinement —
    the k-th order statistic (k = ceil(q/100·n), SQL quantile_disc
    semantics) without sorting or shuffling pixel data. Exact → full
    hash check vs the DuckDB oracle."""
    from gridfia_ray.pipelines.common import decoded_tiles, read_tiles
    from gridfia_ray.pipelines.percentiles import percentiles_exact

    f = _fx()
    decoded = decoded_tiles(
        read_tiles(f["tiles"]), f["spec"], include_total=False, task_mode=True
    )
    qs = [2.0, 50.0, 98.0]
    # cache=True: decode once, stream object-store blocks through the
    # 3-4 refinement passes (decode dominates at fixture scale)
    got = percentiles_exact(decoded, qs, cache=True)
    return pd.DataFrame(
        {
            "q_pct": np.asarray([2, 50, 98], dtype=np.int64),
            "value_u": s6([got[q] for q in qs]),
        }
    )

def q_zonal_species(sf_dir: str) -> pd.DataFrame:
    """Per (zone, species) sums — the zone×species table the A6
    reducers fold, exposed directly (J1 + A2 composition)."""
    from gridfia_ray.pipelines.zonal import load_zones, zone_species_table

    f = _fx()
    zones = load_zones(os.path.join(f["dir"], "zones.parquet"))
    out = zone_species_table(f["tiles"], zones, f["spec"]).to_pandas()
    res = pd.DataFrame(
        {
            "zone_id": out["zone_id"].astype(str),
            "species_code": out["species_code"].astype(str),
            "present_px": out["present_px"].astype(np.int64),
            "n_px": out["n_px"].astype(np.int64),
            "sum_biomass_u": s6(out["sum_biomass"]),
        }
    )
    return res.sort_values(["zone_id", "species_code"]).reset_index(drop=True)

def q_zonal_majority(sf_dir: str) -> pd.DataFrame:
    """ArcGIS-style MAJORITY/MINORITY/VARIETY zonal reducers
    (pipelines/zonal.zonal_majority): per zone the species with the
    most / fewest present pixels, ties toward the smaller code, plus
    the distinct-present-species count. Same combiner exchange as the
    other zonal reducers; the arg-extremes fold over zones × species."""
    from gridfia_ray.pipelines.zonal import load_zones, zonal_majority

    f = _fx()
    zones = load_zones(os.path.join(f["dir"], "zones.parquet"))
    out = zonal_majority(f["tiles"], zones, f["spec"])
    out["zone_id"] = out["zone_id"].astype(str)
    for c in ("majority_px", "minority_px", "variety"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("zone_id").reset_index(drop=True)

def q_zonal_histogram(sf_dir: str) -> pd.DataFrame:
    """ArcGIS-style zonal histogram (pipelines/zonal.zonal_histogram):
    per (zone, 10-unit value bin) the nonzero species-pixel count,
    binned in the exact µ-int domain. Combiner + tiny merge; output
    bounded by zones × occupied bins."""
    from gridfia_ray.pipelines.zonal import load_zones, zonal_histogram

    f = _fx()
    zones = load_zones(os.path.join(f["dir"], "zones.parquet"))
    out = zonal_histogram(f["tiles"], zones, f["spec"], bin_width=10.0).to_pandas()
    out["zone_id"] = out["zone_id"].astype(str)
    for c in ("bin", "n_px"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["zone_id", "bin"]).reset_index(drop=True)

def q_bbox_extract(sf_dir: str) -> pd.DataFrame:
    """S2-style windowed export: total-layer pixels inside a pixel bbox.
    Tiles prune BEFORE decode (file-level species prune + image_id
    tile-range filter), so only intersecting tiles are decoded."""
    import pyarrow.compute as pc

    from gridfia_ray.pipelines.common import decoded_tiles, read_tiles, read_tiles_species

    f = _fx()
    t = f["meta"]["tile"]
    b = _BBOX_PX
    tr0, tr1 = b["y0"] // t, (b["y1"] - 1) // t
    tc0, tc1 = b["x0"] // t, (b["x1"] - 1) // t

    tiles = read_tiles_species(f["tiles"], ["0000"]) or read_tiles(f["tiles"])

    def prune(batch):
        import pyarrow as pa

        parts = pc.split_pattern(batch["image_id"], "/")
        code = pc.list_element(parts, 0)
        tr = pc.cast(pc.list_element(parts, 1), pa.int64())
        tc = pc.cast(pc.list_element(parts, 2), pa.int64())
        keep = pc.and_(
            pc.equal(code, "0000"),
            pc.and_(
                pc.and_(pc.greater_equal(tr, tr0), pc.less_equal(tr, tr1)),
                pc.and_(pc.greater_equal(tc, tc0), pc.less_equal(tc, tc1)),
            ),
        )
        return batch.filter(keep)

    dec = decoded_tiles(
        tiles.map_batches(prune, batch_format="pyarrow"), f["spec"], include_total=True
    )

    def extract(batch) -> pd.DataFrame:
        ys, xs, vs = [], [], []
        trs = batch["tile_row"].to_numpy()
        tcs = batch["tile_col"].to_numpy()
        hs = batch["h"].to_numpy()
        ws = batch["w"].to_numpy()
        for i, payload in enumerate(batch["pix"].to_pylist()):
            if not payload:
                continue
            arr = np.frombuffer(payload, dtype="<f4").reshape(hs[i], ws[i])
            gy0, gx0 = int(trs[i]) * t, int(tcs[i]) * t
            ly0, ly1 = max(b["y0"] - gy0, 0), min(b["y1"] - gy0, int(hs[i]))
            lx0, lx1 = max(b["x0"] - gx0, 0), min(b["x1"] - gx0, int(ws[i]))
            if ly0 >= ly1 or lx0 >= lx1:
                continue
            sub = arr[ly0:ly1, lx0:lx1].astype(np.float64)
            yy, xx = np.meshgrid(
                np.arange(gy0 + ly0, gy0 + ly1), np.arange(gx0 + lx0, gx0 + lx1),
                indexing="ij",
            )
            ys.append(yy.ravel())
            xs.append(xx.ravel())
            vs.append(sub.ravel())
        if not ys:
            return pd.DataFrame(
                {"y": pd.Series(dtype=np.int64), "x": pd.Series(dtype=np.int64),
                 "value_u": pd.Series(dtype=np.int64)}
            )
        return pd.DataFrame(
            {
                "y": np.concatenate(ys).astype(np.int64),
                "x": np.concatenate(xs).astype(np.int64),
                "value_u": s6(np.concatenate(vs)),
            }
        )

    out = dec.map_batches(extract, batch_format="pyarrow").to_pandas()
    return out.sort_values(["y", "x"]).reset_index(drop=True)

def q_s2_aggregate(sf_dir: str) -> pd.DataFrame:
    """Spherical-cell aggregation (geo/s2cells): decode the stored
    total-biomass tiles, key every pixel center by its S2 cell (affine →
    Albers→WGS84 inverse projection → quad-sphere face + Hilbert id at
    level 14), pre-aggregate per batch, one tiny groupby — the
    multi-region / lat-lng-corpus partitioning path. Hash-checked
    against a pinned sequential replay over the independent pixel
    table (oracle_pins.ensure_s2pin)."""
    import ray.data as rd  # noqa: F401

    from gridfia_ray import oracle_pins
    from gridfia_ray.geo.crs import transform_points
    from gridfia_ray.geo.s2cells import s2_cell_id
    from gridfia_ray.pipelines.common import decoded_tiles, read_tiles

    f = _fx()
    spec = f["spec"]
    level = oracle_pins.S2_PIN_LEVEL

    def partial(batch):
        import pyarrow as pa

        t = spec.tile
        # typed empty partial: empty blocks and skipped sentinel rows
        # must not reach np.concatenate
        cell_col = [np.empty(0, np.int64)]
        sum_col = [np.empty(0, np.int64)]
        n_col = [np.empty(0, np.int64)]
        status = (
            batch["status"].to_pylist() if "status" in batch.column_names else None
        )
        for i in range(batch.num_rows):
            payload = batch["pix"][i].as_py()
            if not payload or (status is not None and status[i] != "ok"):
                continue
            h = int(batch["h"][i].as_py())
            w = int(batch["w"][i].as_py())
            tr = int(batch["tile_row"][i].as_py())
            tc = int(batch["tile_col"][i].as_py())
            vals = np.frombuffer(payload, dtype="<f4").astype(np.float64)
            gy = tr * t + np.repeat(np.arange(h), w)
            gx = tc * t + np.tile(np.arange(w), h)
            wx = spec.origin_x + (gx + 0.5) * spec.px
            wy = spec.origin_y - (gy + 0.5) * spec.px
            lng, lat = transform_points(wx, wy, fixtures.CRS, "EPSG:4326")
            cells = s2_cell_id(lat, lng, level)
            su = s6(vals)
            uniq, inv = np.unique(cells, return_inverse=True)
            sums = np.zeros(len(uniq), np.int64)
            counts = np.zeros(len(uniq), np.int64)
            np.add.at(sums, inv, su)
            np.add.at(counts, inv, 1)
            cell_col.append(uniq)
            sum_col.append(sums)
            n_col.append(counts)
        return pa.table(
            {
                "s2_cell": pa.array(np.concatenate(cell_col), pa.int64()),
                "n_px": pa.array(np.concatenate(n_col), pa.int64()),
                "sum_u": pa.array(np.concatenate(sum_col), pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    decoded = decoded_tiles(read_tiles(f["tiles"]), spec, species=["0000"])
    out = (
        decoded.map_batches(partial, batch_format="pyarrow")
        .groupby("s2_cell")
        .aggregate(Sum("n_px", alias_name="n_px"), Sum("sum_u", alias_name="sum_u"))
        .to_pandas()
    )
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("s2_cell", ignore_index=True)

def q_job_shannon(sf_dir: str) -> pd.DataFrame:
    """S16/§2.10 config surface + checkpointed runner, end-to-end in the
    driver: compile a JobSpec dict through the kernel registry, run the
    sharded checkpointed executor (atomic part=K parquet + manifest
    lineage, ``precise`` forwarded config→runner), read the shards back
    and emit the Shannon raster — which must hash-match the SAME
    independent SQL oracle as the direct gf_shannon plan. Shannon is a
    transcendental float kernel, so this pins plan equivalence at the
    µ-unit: config-compiled sharded execution ≡ direct streaming
    execution ≡ the SQL recomputation."""
    import shutil
    import tempfile

    import ray.data as rd

    from gridfia_ray.config import JobSpec
    from gridfia_ray.pipelines import metrics as M
    from gridfia_ray.pipelines.checkpoint import run_metrics_checkpointed

    f = _fx()
    tmp = tempfile.mkdtemp(prefix="gf_job_")
    try:
        spec = JobSpec.from_dict(
            {
                "tiles_path": f["tiles"],
                "calculations": ["shannon_diversity"],
                "output_dir": tmp,
                "n_shards": 4,
                "precise": True,
            }
        )
        run_metrics_checkpointed(
            spec.tiles_path,
            spec.build_kernels(),
            f["spec"],
            f["catalog"],
            tmp,
            n_shards=spec.n_shards,
            resume=spec.resume,
            precise=spec.precise,
        )
        files = sorted(
            os.path.join(tmp, d, fn)
            for d in os.listdir(tmp)
            if d.startswith("part=")
            for fn in os.listdir(os.path.join(tmp, d))
            if fn.endswith(".parquet")
        )
        shards = read_parquet_clean(files)
        pix = M.metrics_to_pixels(shards).to_pandas()
        out = pix[["y", "x"]].copy()
        out["shannon_u"] = s6(pix["value"])
        return out.sort_values(["y", "x"], ignore_index=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

def q_stateplane_vectors(sf_dir: str) -> pd.DataFrame:
    """M18 State Plane projection family vs PUBLISHED EPSG Guidance
    Note 7-2 worked examples — an EXTERNAL oracle, not a replay: the
    SQL side is the guidance note's own numbers as literals. Forward
    outputs compare at decimeter scale, inverse at 1e-6 degree (our
    closed forms sit ≤ 8 mm / ≤ 1e-7° from the published values;
    tests/test_stateplane.py holds the tight bounds). Runs as a
    map_batches stage so the projection objects serialize to workers."""
    import ray.data as rd

    from gridfia_ray.context import tune_context

    tune_context()

    def dms(d, m=0.0, s=0.0):
        sign = -1.0 if d < 0 else 1.0
        return sign * (abs(d) + m / 60.0 + s / 3600.0)

    def run(batch: pd.DataFrame) -> pd.DataFrame:
        from gridfia_ray.geo import stateplane as sp

        rows = []
        for name in batch["anchor"]:
            if name == "hom_borneo":
                proj = sp.HOM(latc=4.0, lonc=115.0, azimuth=dms(53, 18, 56.9537),
                              gamma_c=dms(53, 7, 48.3685), k0=0.99984,
                              ec=590476.87, nc=442857.65, ellipsoid=sp.EVEREST_1967)
                glon, glat = dms(115, 48, 19.8196), dms(5, 23, 14.1129)
                px, py, unit = 679245.73, 596562.78, 1.0
            elif name == "lcc_texas":
                proj = sp.LCC(lat1=dms(28, 23), lat2=dms(30, 17), lat0=dms(27, 50),
                              lon0=-99.0, fe=2000000.0 * sp.FT_US, fn=0.0,
                              ellipsoid=sp.CLARKE_1866)
                glon, glat = -96.0, 28.5
                px, py, unit = 2963503.91, 254759.80, sp.FT_US
            else:  # tm_osgb
                proj = sp.TM(lat0=49.0, lon0=-2.0, k0=0.9996012717, fe=400000.0,
                             fn=-100000.0, ellipsoid=sp.AIRY_1830)
                glon, glat = dms(0, 30), dms(50, 30)
                px, py, unit = 577274.99, 69740.50, 1.0
            x, y = proj.forward(glon, glat)
            lon, lat = proj.inverse(px * unit, py * unit)
            rows.append(
                {
                    "anchor": name,
                    "x_dm": int(np.floor(x / unit * 10 + 0.5)),
                    "y_dm": int(np.floor(y / unit * 10 + 0.5)),
                    "lon_u": int(np.floor(lon * 1_000_000 + 0.5)),
                    "lat_u": int(np.floor(lat * 1_000_000 + 0.5)),
                }
            )
        return pd.DataFrame(rows)

    ds = rd.from_items([{"anchor": n} for n in ["hom_borneo", "lcc_texas", "tm_osgb"]])
    out = ds.map_batches(run, batch_format="pandas").to_pandas()
    for c in ["x_dm", "y_dm", "lon_u", "lat_u"]:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("anchor", ignore_index=True)
