"""Spatial hash join + zonal statistics (the flagship, SURVEY.md §7.2-6).

Ray-native restatement of the reference's polygon intersection + per-zone
analysis (``gridfia/utils/parallel_processing.py:69-313`` sjoin workers;
``statistical_analysis.py:86-192`` per-zone reducers):

  1. zones (small side) are broadcast: each ``ZonalJoinActor`` builds —
     once, in ``__init__`` — prepared polygons (bbox + edge arrays) and a
     cell→candidate-zones cover map (Z-order bbox cover), the T3 pattern;
  2. tiles stream through the actor pool: per tile, candidate zones come
     from the cover map (the *hash join* on cell_id — no shuffle for the
     join itself), and the exact refinement is vectorized ray-casting PIP
     on pixel centers. PIP masks are cached per (zone, tile position):
     species layers of one tile reuse the mask, so the geometry cost is
     paid once per tile position, not once per row;
  3. per-batch combiners emit one partial row per (zone, species) —
     the pre-aggregation that keeps the groupby shuffle tiny and immune
     to dense-zone skew (a zone covering half the extent still produces
     one row per batch);
  4. ``groupby(zone_key).sum`` then per-zone A6 reducers (richness,
     Shannon, Simpson, evenness, Chao1, ACE) over the per-species
     present-pixel count vector.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from gridfia_ray.geo.cells import CellGrid
from gridfia_ray.geo.pip import PreparedPolygon
from gridfia_ray.kernels import zonal as zr
from gridfia_ray.pipelines.common import GridSpec, cluster_cpus, decoded_tiles, read_tiles


def build_zone_cover(zones: list[dict], spec: GridSpec):
    """Prepared polygons + cell→candidate-zones cover map (the broadcast
    small side's per-worker index). Cover map value: list of
    (zone_index, is_boundary). Interior cells (no polygon edge crosses
    the cell, center inside) need NO per-pixel mask — only the
    O(perimeter) boundary cells do. This is what makes zonal cost scale
    with zone perimeter, not area. Shared by the zonal join and the
    vector→raster burn."""
    from gridfia_ray.geo.cells import morton_decode

    grid = CellGrid(spec.origin_x, spec.origin_y, spec.cell_size)
    zone_ids: list[str] = []
    polys: list[PreparedPolygon] = []
    cover: dict[int, list[tuple[int, bool]]] = {}
    cs = grid.cell_size
    for zi, z in enumerate(zones):
        pp = PreparedPolygon.from_wkb(z["geometry_wkb"])
        zone_ids.append(str(z["zone_id"]))
        polys.append(pp)
        cells = grid.cover_bbox(*pp.bbox)
        cxs, cys = morton_decode(cells)
        bx0 = spec.origin_x + cxs * cs
        bx1 = bx0 + cs
        by1 = spec.origin_y - cys * cs
        by0 = by1 - cs
        boundary = pp.crosses_boxes(bx0, by0, bx1, by1)
        centers_in = pp.contains(bx0 + cs / 2.0, by0 + cs / 2.0)
        for j, cid in enumerate(cells):
            if boundary[j]:
                cover.setdefault(int(cid), []).append((zi, True))
            elif centers_in[j]:  # uniform cell fully inside
                cover.setdefault(int(cid), []).append((zi, False))
            # uniform + center outside → cell fully outside → skip
    return grid, zone_ids, polys, cover


class ZonalJoinActor:
    """Stateful join/refine stage. ``zones`` is a list of
    ``{zone_id, geometry_wkb}`` dicts (the broadcast small side)."""

    def __init__(self, zones: list[dict], spec: GridSpec, emit: str = "partials"):
        self.spec = spec
        self.grid, self.zone_ids, self.polys, self.cover = build_zone_cover(zones, spec)
        self.emit = emit
        self._mask_cache: dict[tuple[int, int, int], np.ndarray] = {}

    def _mask(self, zi: int, tr: int, tc: int, h: int, w: int, x0: float, y0: float,
              pxw: float, pxh: float) -> np.ndarray:
        key = (zi, tr, tc)
        m = self._mask_cache.get(key)
        if m is None:
            cx = x0 + (np.arange(w, dtype=np.float64) + 0.5) * pxw
            cy = y0 + (np.arange(h, dtype=np.float64) + 0.5) * pxh
            gx = np.broadcast_to(cx[None, :], (h, w)).ravel()
            gy = np.broadcast_to(cy[:, None], (h, w)).ravel()
            m = self.polys[zi].contains(gx, gy)
            # LRU, not clear-all: a periodic full clear re-pays EVERY
            # boundary-tile mask on long streams (VERDICT r3 finding #2);
            # dicts are insertion-ordered, so popping the oldest entries
            # after a move-to-end on hits is an O(1) LRU
            while len(self._mask_cache) >= 4096:  # bound actor memory
                self._mask_cache.pop(next(iter(self._mask_cache)))
            self._mask_cache[key] = m
        else:
            # move-to-end so hot boundary tiles survive eviction
            self._mask_cache.pop(key)
            self._mask_cache[key] = m
        return m

    def _unpack(self, batch: pa.Table):
        """Accepts either decoded rows (stages/decode.py schema) or raw
        tile rows — raw mode decodes inline, fusing T1 into this stage so
        the decoded pixels never take an extra object-store round trip."""
        import json as _json

        n = batch.num_rows
        hs = batch["h"].to_numpy()
        ws = batch["w"].to_numpy()
        image_ids = batch["image_id"].to_pylist()
        if "pix" in batch.column_names:  # pre-decoded rows
            return (
                n,
                batch["cell_id"].to_numpy(),
                batch["tile_row"].to_numpy(),
                batch["tile_col"].to_numpy(),
                hs,
                ws,
                batch["x0"].to_numpy(),
                batch["y0"].to_numpy(),
                batch["px_w"].to_numpy(),
                batch["px_h"].to_numpy(),
                [np.frombuffer(p, dtype="<f4") if p else None for p in batch["pix"].to_pylist()],
                batch["species_code"].to_pylist(),
                image_ids,
            )
        from gridfia_ray.codecs.registry import decode_tile

        captions = batch["caption"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        payloads = batch["bytes"].to_pylist()
        trs = np.zeros(n, np.int64)
        tcs = np.zeros(n, np.int64)
        x0 = np.zeros(n)
        y0 = np.zeros(n)
        pxw = np.zeros(n)
        pxh = np.zeros(n)
        vals, codes = [], []
        cx = np.zeros(n)
        cy = np.zeros(n)
        for i in range(n):
            meta = _json.loads(captions[i])
            codes.append(str(meta.get("species_code", "")))
            trs[i] = int(meta.get("tile_row", 0))
            tcs[i] = int(meta.get("tile_col", 0))
            tf = meta.get("transform", [0.0, 1.0, 0.0, 0.0, 0.0, -1.0])
            x0[i], pxw[i], y0[i], pxh[i] = tf[0], tf[1], tf[3], tf[5]
            cx[i] = x0[i] + int(ws[i]) * pxw[i] / 2.0
            cy[i] = y0[i] + int(hs[i]) * pxh[i] / 2.0
            try:
                vals.append(
                    decode_tile(payloads[i], fmts[i], int(hs[i]), int(ws[i]), meta).ravel()
                )
            except Exception:
                vals.append(None)
        cell = self.grid.cell_id(cx, cy)
        return (n, cell, trs, tcs, hs, ws, x0, y0, pxw, pxh, vals, codes, image_ids)

    def __call__(self, batch: pa.Table) -> pa.Table:
        (n, cell, trs, tcs, hs, ws, x0, y0, pxw, pxh, pix, codes, image_ids) = self._unpack(
            batch
        )

        if self.emit == "join":
            out_zone, out_img = [], []
            for i in range(n):
                for zi, is_boundary in self.cover.get(int(cell[i]), ()):
                    if is_boundary:
                        m = self._mask(zi, int(trs[i]), int(tcs[i]), int(hs[i]), int(ws[i]),
                                       x0[i], y0[i], pxw[i], pxh[i])
                        if not m.any():
                            continue
                    out_zone.append(self.zone_ids[zi])
                    out_img.append(image_ids[i])
            return pa.table(
                {"zone_id": pa.array(out_zone, pa.string()),
                 "image_id": pa.array(out_img, pa.string())}
            )

        if self.emit == "values":
            # per (tile, zone): the zone-masked NONZERO pixel values,
            # packed f32 — feeds keyed order-statistic operators
            # (grouped_percentiles_exact packed mode) without exploding
            # to per-pixel rows
            out_zone, out_vals = [], []
            for i in range(n):
                cands = self.cover.get(int(cell[i]), ())
                if not cands or pix[i] is None:
                    continue
                arr = pix[i]
                for zi, is_boundary in cands:
                    if is_boundary:
                        m = self._mask(zi, int(trs[i]), int(tcs[i]), int(hs[i]),
                                       int(ws[i]), x0[i], y0[i], pxw[i], pxh[i])
                        if not m.any():
                            continue
                        vals = arr[m]
                    else:
                        vals = arr
                    nz = vals[vals > 0]
                    if nz.size:
                        out_zone.append(self.zone_ids[zi])
                        out_vals.append(nz.astype("<f4").tobytes())
            return pa.table(
                {"zone_id": pa.array(out_zone, pa.string()),
                 "vals": pa.array(out_vals, pa.binary())}
            )

        # partials mode: per-batch combiner keyed (zone, species)
        agg: dict[tuple[str, str], list[float]] = {}
        for i in range(n):
            cands = self.cover.get(int(cell[i]), ())
            if not cands or pix[i] is None:
                continue
            arr = pix[i]
            for zi, is_boundary in cands:
                if is_boundary:
                    m = self._mask(zi, int(trs[i]), int(tcs[i]), int(hs[i]), int(ws[i]),
                                   x0[i], y0[i], pxw[i], pxh[i])
                    if not m.any():
                        continue
                    vals = arr[m]
                    cnt = float(np.count_nonzero(vals > 0))
                    sm = float(vals.sum(dtype=np.float64))
                    npx = float(vals.size)
                else:  # interior cell: every pixel belongs, no mask
                    cnt = float(np.count_nonzero(arr > 0))
                    sm = float(arr.sum(dtype=np.float64))
                    npx = float(arr.size)
                a = agg.setdefault((self.zone_ids[zi], codes[i]), [0.0, 0.0, 0.0])
                a[0] += cnt
                a[1] += sm
                a[2] += npx
        keys = list(agg.keys())
        return pa.table(
            {
                "zone_id": pa.array([k[0] for k in keys], pa.string()),
                "species_code": pa.array([k[1] for k in keys], pa.string()),
                "present_px": pa.array([agg[k][0] for k in keys], pa.float64()),
                "sum_biomass": pa.array([agg[k][1] for k in keys], pa.float64()),
                "n_px": pa.array([agg[k][2] for k in keys], pa.float64()),
            }
        )


def _zone_species_sums(tiles: rd.Dataset, zones: list[dict], spec: GridSpec) -> rd.Dataset:
    from ray.data.aggregate import Sum

    from gridfia_ray.stages.worker_state import worker_cached

    partials = tiles.map_batches(
        worker_cached(ZonalJoinActor, zones=zones, spec=spec),
        batch_format="pyarrow",
        batch_size=128,
    )
    # tiny aggregate (zones × species rows): few partitions, not the
    # default ~200 — all-to-all latency dominates at this size
    return partials.groupby(["zone_id", "species_code"], num_partitions=8).aggregate(
        Sum("present_px", alias_name="present_px"),
        Sum("sum_biomass", alias_name="sum_biomass"),
        Sum("n_px", alias_name="n_px"),
    )


class ZonalRgRunner:
    """Aligned-store zonal worker: one work item = (species file, row
    group). The row group is read INSIDE the task (pixel bytes never
    cross the object store — the same shape that makes the aligned
    metrics path scale), decoded, PIP-refined and combined to per-item
    (zone, species) partial rows."""

    def __init__(self, files: list[str], zones: list[dict], spec: GridSpec):
        import pyarrow.parquet as pq

        self.files = files
        self.readers = {i: pq.ParquetFile(f) for i, f in enumerate(files)}
        self.join = ZonalJoinActor(zones, spec)

    def __call__(self, batch: pa.Table) -> pa.Table:
        tables = []
        for i in range(batch.num_rows):
            fi = int(batch["file_idx"][i].as_py())
            rg = int(batch["row_group"][i].as_py())
            t = self.readers[fi].read_row_group(
                rg, columns=["image_id", "bytes", "w", "h", "fmt", "caption"]
            )
            tables.append(self.join(t))
        if tables:
            return pa.concat_tables(tables)
        return pa.table(
            {
                "zone_id": pa.array([], pa.string()),
                "species_code": pa.array([], pa.string()),
                "present_px": pa.array([], pa.float64()),
                "sum_biomass": pa.array([], pa.float64()),
                "n_px": pa.array([], pa.float64()),
            }
        )


def zone_species_table(tiles_path, zones: list[dict], spec: GridSpec) -> rd.Dataset:
    """Per (zone, species): present-pixel count, biomass sum, pixel count.

    Aligned stores take the in-task read path (work-list of file ×
    row-group items, zero pixel bytes through the object store); other
    inputs stream through the fused decode+join stage."""
    from gridfia_ray.pipelines.aligned import aligned_layout
    from gridfia_ray.stages.decode import species_prefilter
    from gridfia_ray.stages.worker_state import worker_cached
    from ray.data.aggregate import Sum

    al = aligned_layout(tiles_path)
    if al is not None:
        files = [f for f, c in zip(al["files"], al["codes"]) if c != "0000"]
        items = [
            {"file_idx": fi, "row_group": rg}
            for fi in range(len(files))
            for rg in range(al["n_row_groups"])
        ]
        n_blocks = min(len(items), max(64, 4 * cluster_cpus()))
        work = rd.from_items(items, override_num_blocks=n_blocks)
        partials = work.map_batches(
            worker_cached(ZonalRgRunner, files=files, zones=zones, spec=spec),
            batch_format="pyarrow",
            batch_size=None,  # one task per block; ~tens of MB of pixel work each
            num_cpus=1,
        )
        return partials.groupby(["zone_id", "species_code"], num_partitions=8).aggregate(
            Sum("present_px", alias_name="present_px"),
            Sum("sum_biomass", alias_name="sum_biomass"),
            Sum("n_px", alias_name="n_px"),
        )

    tiles = read_tiles(tiles_path).map_batches(
        species_prefilter(codes_drop=["0000"]), batch_format="pyarrow"
    )
    return _zone_species_sums(tiles, zones, spec)


def zone_value_rows(tiles_path, zones: list[dict], spec: GridSpec) -> rd.Dataset:
    """(zone_id, vals) rows — each row one tile's zone-masked nonzero
    pixel values packed f32 — via the fused decode+join stage. The
    keyed-order-statistic input for per-zone percentiles: pixel bytes
    stay tile-granular (no per-pixel row explosion), zones broadcast."""
    from gridfia_ray.stages.decode import species_prefilter
    from gridfia_ray.stages.worker_state import worker_cached

    tiles = read_tiles(tiles_path).map_batches(
        species_prefilter(codes_drop=["0000"]), batch_format="pyarrow"
    )
    return tiles.map_batches(
        worker_cached(ZonalJoinActor, zones=zones, spec=spec, emit="values"),
        batch_format="pyarrow",
    )


def zonal_stats(tiles_path, zones: list[dict], spec: GridSpec) -> rd.Dataset:
    """Per-zone A6 reducers over the per-species count vector."""

    def reduce_zone(g: pd.DataFrame) -> pd.DataFrame:
        counts = g["present_px"].to_numpy(dtype=np.float64)
        total_biomass = float(g["sum_biomass"].sum())
        # n_px must be identical across species within a zone: every
        # species layer is expected to cover the same tile grid (the
        # store alignment invariant, api.py append validation). A
        # mismatch means a species store is missing tiles over this zone
        # — mean_biomass and the per-species count vector would silently
        # be computed over different denominators, so fail loudly.
        npx = g["n_px"].to_numpy(dtype=np.float64)
        if npx.min() != npx.max():
            detail = ", ".join(
                f"{sc}={int(v)}" for sc, v in zip(g["species_code"], npx)
            )
            raise ValueError(
                f"zone {g['zone_id'].iloc[0]!r}: species layers disagree on "
                f"pixel coverage ({detail}) — a species store is missing "
                "tiles over this zone; re-validate the store (validate_store) "
                "or re-ingest the incomplete species"
            )
        n_pixels = float(npx[0])
        return pd.DataFrame(
            [
                {
                    "zone_id": g["zone_id"].iloc[0],
                    "n_pixels": n_pixels,
                    "richness": zr.richness(counts),
                    "shannon": zr.shannon(counts),
                    "simpson": zr.simpson(counts),
                    "evenness": zr.evenness(counts),
                    "chao1": zr.chao1(counts),
                    "ace": zr.ace(counts),
                    "total_biomass": total_biomass,
                    "mean_biomass": total_biomass / n_pixels if n_pixels else 0.0,
                }
            ]
        )

    # the per-(zone, species) table is small by construction (zones ×
    # species rows — the heavy reduction already happened in the
    # combiners), so the final A6 reduce folds on the driver instead of
    # paying another distributed shuffle's fixed latency
    zs = zone_species_table(tiles_path, zones, spec).to_pandas()
    if len(zs) == 0:
        return rd.from_items([])
    out = pd.concat(
        [reduce_zone(g) for _, g in zs.groupby("zone_id", sort=True)], ignore_index=True
    )
    return rd.from_pandas(out)


def zonal_histogram(
    tiles_path,
    zones: list[dict],
    spec: GridSpec,
    bin_width: float,
    *,
    n_buckets: int = 8,
) -> rd.Dataset:
    """ArcGIS-style ZONAL HISTOGRAM: per (zone, value bin) the count of
    nonzero species-pixel values, ``bin = µ(v) // µ(bin_width)`` in the
    micro-scaled int64 domain (exact — the same scaling policy as the
    focal/CCL ops). The per-batch combiner counts (zone, bin) pairs
    over the packed zone-value rows, then one tiny bucketed merge; the
    output is bounded by zones × occupied bins, never pixels."""
    if bin_width <= 0:
        raise ValueError(f"bin_width must be positive, got {bin_width!r}")
    w_u = int(np.floor(bin_width * 1_000_000 + 0.5))

    def partial(batch: pa.Table) -> pa.Table:
        zs, bs, cs = [], [], []
        for i in range(batch.num_rows):
            buf = batch["vals"][i].as_py()
            if not buf:
                continue
            v = np.frombuffer(buf, "<f4").astype(np.float64)
            u = np.floor(v * 1_000_000 + 0.5).astype(np.int64)
            b, c = np.unique(u // w_u, return_counts=True)
            zs.append(np.full(b.size, batch["zone_id"][i].as_py(), dtype=object))
            bs.append(b)
            cs.append(c.astype(np.int64))
        return pa.table(
            {
                "zone_id": pa.array(
                    np.concatenate(zs) if zs else [], pa.string()
                ),
                "bin": pa.array(
                    np.concatenate(bs) if bs else np.empty(0, np.int64),
                    pa.int64(),
                ),
                "n_px": pa.array(
                    np.concatenate(cs) if cs else np.empty(0, np.int64),
                    pa.int64(),
                ),
            }
        )

    from gridfia_ray.stages.agg_util import bucketed_agg

    rows = zone_value_rows(tiles_path, zones, spec)
    return bucketed_agg(
        rows.map_batches(partial, batch_format="pyarrow"),
        ["zone_id", "bin"],
        {"n_px": ("n_px", "sum")},
        n_buckets=n_buckets,
    )


def zonal_majority(tiles_path, zones: list[dict], spec: GridSpec) -> pd.DataFrame:
    """ArcGIS-style MAJORITY / MINORITY / VARIETY zonal reducers over
    the species presence layers: per zone, the species with the most /
    fewest present pixels (``biomass > 0``; ties broken toward the
    smaller species_code) plus the count of distinct present species.
    The heavy reduction is the same (zone, species) combiner exchange
    as ``zonal_stats``; the argmax/argmin folds over the zones ×
    species table, which is small by construction."""
    zs = zone_species_table(tiles_path, zones, spec).to_pandas()
    return _majority_fold(zs)


def _majority_fold(zs: pd.DataFrame) -> pd.DataFrame:
    zs = zs[zs["present_px"] > 0]
    rows = []
    for zid, g in zs.groupby("zone_id", sort=True):
        # sort once: (count desc, code asc) puts the majority first and
        # the minority last-of-its-count; re-sort ascending for minority
        hi = g.sort_values(
            ["present_px", "species_code"], ascending=[False, True], kind="mergesort"
        ).iloc[0]
        lo = g.sort_values(
            ["present_px", "species_code"], ascending=[True, True], kind="mergesort"
        ).iloc[0]
        rows.append(
            {
                "zone_id": zid,
                "majority_species": hi["species_code"],
                "majority_px": int(hi["present_px"]),
                "minority_species": lo["species_code"],
                "minority_px": int(lo["present_px"]),
                "variety": int(len(g)),
            }
        )
    return pd.DataFrame(rows)


def tile_zone_join(tiles_path, zones: list[dict], spec: GridSpec) -> rd.Dataset:
    """The exact join rows: (zone_id, image_id) for every tile with at
    least one pixel center inside the zone — the north rule's
    'join output rows and tile assignments match' artifact."""
    from gridfia_ray.stages.worker_state import worker_cached

    tiles = read_tiles(tiles_path)
    pairs = tiles.map_batches(
        worker_cached(ZonalJoinActor, zones=zones, spec=spec, emit="join"),
        batch_format="pyarrow",
        batch_size=128,
    )
    return pairs


def load_zones(zones_path: str) -> list[dict]:
    """Read the (small) zone side table onto the driver for broadcast."""
    import pyarrow.parquet as pq

    t = pq.read_table(zones_path)
    return [
        {"zone_id": z, "geometry_wkb": w}
        for z, w in zip(t["zone_id"].to_pylist(), t["geometry_wkb"].to_pylist())
    ]


class RasterizeActor:
    """Vector→raster burn stage (the inverse of the zonal join — gdal
    rasterize semantics). Tile positions stream through; each tile
    materializes an int32 raster where every pixel holds the index of
    the lexicographically SMALLEST zone_id containing its center
    (deterministic overlap rule), -1 outside all zones. Reuses the
    prepared-polygon cover map, so cost scales with zone perimeter:
    interior cells fill without any PIP test."""

    def __init__(self, zones: list[dict], spec: GridSpec):
        self.spec = spec
        self.grid, self.zone_ids, self.polys, self.cover = build_zone_cover(zones, spec)
        # burn ascending zone_id, first-writer-wins → per-pixel MIN zone
        self._order = np.argsort(np.array(self.zone_ids, dtype=object), kind="stable")

    def __call__(self, batch: pa.Table) -> pa.Table:
        spec = self.spec
        t = spec.tile
        cs = spec.cell_size
        trs = batch["tile_row"].to_numpy()
        tcs = batch["tile_col"].to_numpy()
        cells = self.grid.cell_id_rc(trs, tcs)
        out_tr, out_tc, out_pix = [], [], []
        for i in range(len(trs)):
            tr, tc = int(trs[i]), int(tcs[i])
            cands = self.cover.get(int(cells[i]), ())
            if not cands:
                continue  # no zone touches this tile — emit nothing
            x0 = spec.origin_x + tc * cs
            y0 = spec.origin_y - tr * cs
            burn = np.full(t * t, -1, np.int32)
            by_zi = dict(cands)
            gx = gy = None  # pixel-center lattice, built once per tile
            for zi in self._order:
                zi = int(zi)
                if zi not in by_zi:
                    continue
                if by_zi[zi]:
                    if gx is None:
                        cx = x0 + (np.arange(t, dtype=np.float64) + 0.5) * spec.px
                        cy = y0 - (np.arange(t, dtype=np.float64) + 0.5) * spec.px
                        gx = np.broadcast_to(cx[None, :], (t, t)).ravel()
                        gy = np.broadcast_to(cy[:, None], (t, t)).ravel()
                    m = self.polys[zi].contains(gx, gy) & (burn == -1)
                else:  # interior cell: whole tile inside the zone
                    m = burn == -1
                burn[m] = zi
            if (burn == -1).all():
                continue
            out_tr.append(tr)
            out_tc.append(tc)
            out_pix.append(burn.tobytes())
        n = len(out_tr)
        return pa.table(
            {
                "metric": pa.array(["zone_burn"] * n, pa.string()),
                "tile_row": pa.array(out_tr, pa.int64()),
                "tile_col": pa.array(out_tc, pa.int64()),
                "h": pa.array([t] * n, pa.int64()),
                "w": pa.array([t] * n, pa.int64()),
                "pix": pa.array(out_pix, pa.binary()),
                "dtype": pa.array(["int32"] * n, pa.string()),
            }
        )


def zonal_result_stats(
    result: rd.Dataset,
    zones: list[dict],
    spec: GridSpec,
    grid_rows: int,
    grid_cols: int,
    *,
    n_buckets: int = 16,
) -> pd.DataFrame:
    """ArcGIS-style ZonalStatistics over a CONTINUOUS result raster:
    per zone the pixel count, min, max and sum of the µ-scaled values
    (mean = sum/n, left to the caller so every emitted column stays
    exact int64). The zone layer is the :func:`rasterize_zones` burn
    (overlaps → smallest zone_id); value and burn tiles co-locate with
    ONE keyed exchange on the tile key, per-tile partials are segmented
    ``reduceat`` over the burn-sorted pixels, and a tiny bucketed merge
    folds zones × 4 int columns."""
    from gridfia_ray.stages.agg_util import bucketed_agg, bucketed_group_map

    burned, zone_ids = rasterize_zones(zones, spec, grid_rows, grid_cols)
    both = result.union(burned)

    part_schema = pa.schema(
        [("zi", pa.int64()), ("n_px", pa.int64()), ("min_u", pa.int64()),
         ("max_u", pa.int64()), ("sum_u", pa.int64())]
    )
    empty = pa.table(
        {f.name: pa.array([], f.type) for f in part_schema}, schema=part_schema
    ).to_pandas()

    def fold(group: pd.DataFrame) -> pd.DataFrame:
        brn = group[group["metric"] == "zone_burn"]
        val = group[group["metric"] != "zone_burn"]
        if len(brn) == 0 or len(val) == 0:
            return empty  # zone-less tile, or burn past the raster
        if len(brn) > 1 or len(val) > 1:
            raise ValueError(
                f"zonal_result_stats: tile ({group['tile_row'].iloc[0]}, "
                f"{group['tile_col'].iloc[0]}) has {len(val)} value / "
                f"{len(brn)} burn tiles — expected one each"
            )
        v = val.iloc[0]
        arr = np.frombuffer(v["pix"], dtype=np.dtype(v["dtype"]))
        if arr.dtype.kind == "f":
            u = np.floor(arr.astype(np.float64) * 1_000_000 + 0.5).astype(
                np.int64
            )
        else:
            u = arr.astype(np.int64)
        z = np.frombuffer(brn.iloc[0]["pix"], dtype=np.int32).astype(np.int64)
        if z.size != u.size:
            raise ValueError(
                "zonal_result_stats: burn/value tile shapes disagree "
                f"({z.size} vs {u.size} px)"
            )
        m = z >= 0
        if not m.any():
            return empty
        zi, uv = z[m], u[m]
        order = np.argsort(zi, kind="stable")
        uz, first = np.unique(zi[order], return_index=True)
        us = uv[order]
        return pd.DataFrame(
            {
                "zi": uz,
                "n_px": np.diff(np.append(first, us.size)).astype(np.int64),
                "min_u": np.minimum.reduceat(us, first),
                "max_u": np.maximum.reduceat(us, first),
                "sum_u": np.add.reduceat(us, first),
            }
        )

    partials = bucketed_group_map(
        both, ["tile_row", "tile_col"], fold,
        n_buckets=n_buckets, out_schema=part_schema,
    )
    agg = bucketed_agg(
        partials,
        ["zi"],
        {
            "n_px": ("n_px", "sum"),
            "min_u": ("min_u", "min"),
            "max_u": ("max_u", "max"),
            "sum_u": ("sum_u", "sum"),
        },
        n_buckets=4,
    ).to_pandas()  # zones × 4 ints — small by construction
    agg["zone_id"] = [zone_ids[int(i)] for i in agg["zi"]]
    out = agg[["zone_id", "n_px", "min_u", "max_u", "sum_u"]]
    return out.sort_values("zone_id").reset_index(drop=True)


def rasterize_zones(
    zones: list[dict], spec: GridSpec, grid_rows: int, grid_cols: int
) -> tuple[rd.Dataset, list[str]]:
    """Burn the zone side table onto the tile grid: result tiles with an
    int32 zone INDEX per pixel (-1 = no zone), plus the zone_id catalog
    mapping index→id (overlaps resolve to the smallest zone_id). Pure map over tile positions — zero
    shuffle; tiles no zone touches never materialize. Output composes
    with the result-tile toolchain (mosaic / downsample / explode /
    write_geotiff)."""
    from gridfia_ray.stages.worker_state import worker_cached

    n = grid_rows * grid_cols

    def positions(batch):
        ids = batch["id"].to_numpy()
        return pa.table(
            {
                "tile_row": pa.array(ids // grid_cols, pa.int64()),
                "tile_col": pa.array(ids % grid_cols, pa.int64()),
            }
        )

    grid_ds = rd.range(n).map_batches(positions, batch_format="pyarrow")
    burned = grid_ds.map_batches(
        worker_cached(RasterizeActor, zones=zones, spec=spec),
        batch_format="pyarrow",
    )
    # catalog in INDEX order (pixel value i of the burn means zone_ids[i])
    zone_ids = [str(z["zone_id"]) for z in zones]
    return burned, zone_ids


def tabulate_area(
    class_rows: rd.Dataset,
    zones: list[dict],
    spec: GridSpec,
    grid_rows: int,
    grid_cols: int,
    *,
    n_buckets: int = 16,
) -> pd.DataFrame:
    """ArcGIS TabulateArea: cross-tabulated pixel counts between the
    rasterized zone layer and an integer per-pixel class raster —
    per (zone, class) the number of pixels where both coincide.

    ``class_rows`` carries (pid, class): pid = y·(grid_cols·tile)+x and
    class ≥ 0 (e.g. the exact NTILE classes of pipelines/rank). The
    zone layer is the :func:`rasterize_zones` burn (overlaps → smallest
    zone_id). ONE pid-bucketed exchange co-locates burn pixels with
    class rows; each bucket inner-merges on pid and emits (zone, class)
    count partials — every pid lives in exactly one bucket, so partials
    are disjoint per bucket and the driver folds only
    buckets × zones × classes rows (provably small)."""
    from gridfia_ray.stages.agg_util import to_arrow
    from gridfia_ray.stages.dedup_util import bucket_of

    burned, zone_ids = rasterize_zones(zones, spec, grid_rows, grid_cols)
    W = grid_cols * spec.tile

    pair_schema = pa.schema(
        [("pid", pa.int64()), ("zi", pa.int64()), ("cls", pa.int64())]
    )

    def burn_explode(b: pd.DataFrame) -> pa.Table:
        pids, zis = [], []
        for _, r in b.iterrows():
            h, w = int(r["h"]), int(r["w"])
            zi = np.frombuffer(r["pix"], np.int32).reshape(h, w)
            yy, xx = np.nonzero(zi >= 0)
            if len(yy) == 0:
                continue
            pid = (yy.astype(np.int64) + int(r["tile_row"]) * h) * W + (
                xx.astype(np.int64) + int(r["tile_col"]) * w
            )
            pids.append(pid)
            zis.append(zi[yy, xx].astype(np.int64))
        if pids:
            df = pd.DataFrame(
                {"pid": np.concatenate(pids), "zi": np.concatenate(zis)}
            )
        else:
            df = pd.DataFrame(
                {"pid": pd.Series(dtype=np.int64), "zi": pd.Series(dtype=np.int64)}
            )
        df["cls"] = np.int64(-1)
        return to_arrow(df, pair_schema)

    def class_side(b: pd.DataFrame) -> pa.Table:
        cls = b["class"].to_numpy(np.int64)
        if (cls < 0).any():
            raise ValueError("tabulate_area: class values must be >= 0")
        df = pd.DataFrame(
            {
                "pid": b["pid"].to_numpy(np.int64),
                "zi": np.full(len(b), -1, np.int64),
                "cls": cls,
            }
        )
        return to_arrow(df, pair_schema)

    both = burned.map_batches(burn_explode, batch_format="pandas").union(
        class_rows.map_batches(class_side, batch_format="pandas")
    )

    def bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["__bucket"] = bucket_of(batch, ["pid"], n_buckets)
        return batch

    def count_pairs(g: pd.DataFrame) -> pd.DataFrame:
        zs = g.loc[g["zi"] >= 0, ["pid", "zi"]]
        cs = g.loc[g["cls"] >= 0, ["pid", "cls"]]
        m = zs.merge(cs, on="pid", how="inner")
        out = m.groupby(["zi", "cls"]).size().reset_index(name="n_px")
        return out.astype(np.int64)

    partials = (
        both.map_batches(bucket, batch_format="pandas")
        .repartition(n_buckets)
        .groupby("__bucket")
        .map_groups(count_pairs, batch_format="pandas")
        .to_pandas()  # bounded: buckets × zones × classes
    )
    if len(partials) == 0:
        return pd.DataFrame(
            {"zone_id": pd.Series(dtype=str),
             "class": pd.Series(dtype=np.int64),
             "n_px": pd.Series(dtype=np.int64)}
        )
    agg = partials.groupby(["zi", "cls"], as_index=False)["n_px"].sum()
    return pd.DataFrame(
        {
            "zone_id": [zone_ids[int(i)] for i in agg["zi"]],
            "class": agg["cls"].astype(np.int64),
            "n_px": agg["n_px"].astype(np.int64),
        }
    ).sort_values(["zone_id", "class"]).reset_index(drop=True)


def zonal_geometry(
    zones: list[dict],
    spec: GridSpec,
    grid_rows: int,
    grid_cols: int,
    *,
    n_buckets: int = 16,
) -> pd.DataFrame:
    """ArcGIS ZonalGeometry: per zone the exact pixel AREA, CENTROID
    coordinate sums (centroid = sums/area, left to the caller so every
    column stays int64-exact) and PERIMETER — the count of 4-connected
    pixel edges whose other side is a different zone, a zone-less pixel
    or off-raster (boundary edges count, matching polygon perimeter
    semantics).

    Shape: the rasterize burn streams through the focal halo exchange
    (cross-tile edges need the neighbor's border strip; absent strips
    read as zone-less), each tile folds to per-zone partial rows, one
    tiny bucketed merge sums them — exchange volume O(tile-zone pairs),
    never per-pixel rows."""
    from gridfia_ray.pipelines.focal import _halo_explode, strips_to_padded
    from gridfia_ray.stages.agg_util import bucketed_agg, bucketed_group_map

    burned, zone_ids = rasterize_zones(zones, spec, grid_rows, grid_cols)

    part_schema = pa.schema(
        [("zi", pa.int64()), ("n_px", pa.int64()), ("sum_y", pa.int64()),
         ("sum_x", pa.int64()), ("perim", pa.int64())]
    )
    empty = pa.table(
        {f.name: pa.array([], f.type) for f in part_schema}, schema=part_schema
    ).to_pandas()

    def assemble(group: pd.DataFrame) -> pd.DataFrame:
        padded = strips_to_padded(group, "zonal_geometry")
        if padded is None:
            return empty
        vals, pres, h, w = padded
        z = np.where(pres == 1, vals, np.int64(-1))
        c = z[1 : h + 1, 1 : w + 1]
        perim = np.zeros((h, w), np.int64)
        for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            nb = z[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]
            perim += (nb != c).astype(np.int64)
        tr = int(group["tile_row"].iloc[0])
        tc = int(group["tile_col"].iloc[0])
        yy, xx = np.meshgrid(
            np.arange(h, dtype=np.int64) + tr * h,
            np.arange(w, dtype=np.int64) + tc * w,
            indexing="ij",
        )
        m = c >= 0
        if not m.any():
            return empty
        df = pd.DataFrame(
            {"zi": c[m], "n_px": np.ones(int(m.sum()), np.int64),
             "sum_y": yy[m], "sum_x": xx[m], "perim": perim[m]}
        )
        return df.groupby("zi", as_index=False).sum()

    parts = bucketed_group_map(
        _halo_explode(burned, "zonal_geometry", allow_integer=True),
        ["metric", "tile_row", "tile_col"],
        assemble,
        n_buckets=n_buckets,
        out_schema=part_schema,
    )
    agg = bucketed_agg(
        parts,
        ["zi"],
        {"n_px": ("n_px", "sum"), "sum_y": ("sum_y", "sum"),
         "sum_x": ("sum_x", "sum"), "perim": ("perim", "sum")},
        n_buckets=n_buckets,
    ).to_pandas()  # bounded: one row per zone
    if len(agg) == 0:
        return pd.DataFrame(
            {"zone_id": pd.Series(dtype=str),
             **{c: pd.Series(dtype=np.int64)
                for c in ("n_px", "sum_y", "sum_x", "perim")}}
        )
    out = pd.DataFrame(
        {
            "zone_id": [zone_ids[int(i)] for i in agg["zi"]],
            "n_px": agg["n_px"].astype(np.int64),
            "sum_y": agg["sum_y"].astype(np.int64),
            "sum_x": agg["sum_x"].astype(np.int64),
            "perim": agg["perim"].astype(np.int64),
        }
    )
    return out.sort_values("zone_id").reset_index(drop=True)


def zone_neighbors(
    zones: list[dict],
    spec: GridSpec,
    grid_rows: int,
    grid_cols: int,
    *,
    n_buckets: int = 16,
) -> pd.DataFrame:
    """ArcGIS PolygonNeighbors over the rasterized zone layer: for every
    pair of zones that share a 4-connected pixel edge, the exact count
    of shared edges (the discrete shared-boundary length). Each
    undirected edge counts ONCE: only the south and east directions are
    scanned, so the same edge never appears from both endpoints — and
    cross-tile edges are seen exactly once too (the other tile would
    see them northward/westward). Pairs order by zone_id string
    (za < zb). Same halo exchange + tiny merge as zonal_geometry."""
    from gridfia_ray.pipelines.focal import _halo_explode, strips_to_padded
    from gridfia_ray.stages.agg_util import bucketed_agg, bucketed_group_map

    burned, zone_ids = rasterize_zones(zones, spec, grid_rows, grid_cols)
    rank = np.argsort(np.argsort(np.array(zone_ids, dtype=object), kind="stable"))

    part_schema = pa.schema(
        [("za", pa.int64()), ("zb", pa.int64()), ("shared_edges", pa.int64())]
    )
    empty = pa.table(
        {f.name: pa.array([], f.type) for f in part_schema}, schema=part_schema
    ).to_pandas()

    def assemble(group: pd.DataFrame) -> pd.DataFrame:
        padded = strips_to_padded(group, "zone_neighbors")
        if padded is None:
            return empty
        vals, pres, h, w = padded
        z = np.where(pres == 1, vals, np.int64(-1))
        c = z[1 : h + 1, 1 : w + 1]
        pas, pbs = [], []
        for dy, dx in ((1, 0), (0, 1)):  # south + east: each edge once
            nb = z[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]
            m = (c >= 0) & (nb >= 0) & (c != nb)
            if m.any():
                a, b = c[m], nb[m]
                swap = rank[a] > rank[b]
                pas.append(np.where(swap, b, a))
                pbs.append(np.where(swap, a, b))
        if not pas:
            return empty
        df = pd.DataFrame(
            {"za": np.concatenate(pas), "zb": np.concatenate(pbs)}
        )
        out = df.groupby(["za", "zb"]).size().reset_index(name="shared_edges")
        return out.astype(np.int64)

    parts = bucketed_group_map(
        _halo_explode(burned, "zone_neighbors", allow_integer=True),
        ["metric", "tile_row", "tile_col"],
        assemble,
        n_buckets=n_buckets,
        out_schema=part_schema,
    )
    agg = bucketed_agg(
        parts, ["za", "zb"], {"shared_edges": ("shared_edges", "sum")},
        n_buckets=n_buckets,
    ).to_pandas()  # bounded: one row per adjacent zone pair
    if len(agg) == 0:
        return pd.DataFrame(
            {"zone_a": pd.Series(dtype=str), "zone_b": pd.Series(dtype=str),
             "shared_edges": pd.Series(dtype=np.int64)}
        )
    out = pd.DataFrame(
        {
            "zone_a": [zone_ids[int(i)] for i in agg["za"]],
            "zone_b": [zone_ids[int(i)] for i in agg["zb"]],
            "shared_edges": agg["shared_edges"].astype(np.int64),
        }
    )
    return out.sort_values(["zone_a", "zone_b"]).reset_index(drop=True)
