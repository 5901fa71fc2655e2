"""High-level API facade — the tabular mirror of the reference's
API-first surface (``gridfia/api.py:57-818``: no CLI, one class).

Maps the reference entry points onto the Ray-Data pipelines:

| reference                  | here                              |
|----------------------------|-----------------------------------|
| ``download_species``       | n/a (no network source) — ingest  |
| ``create_zarr``            | ``create_tile_table`` (S7)        |
| ``append_species``-style   | ``append_species`` (S9)           |
| ``list_available_species`` | ``list_species`` (S6)             |
| ``validate_zarr``          | ``validate_store`` (S11)          |
| ``calculate_metrics``      | ``calculate_metrics`` (§3.3)      |
| experimental spatial utils | ``zonal_stats`` / ``tile_zone_join`` / ``knn`` |
| pixel identify (S4)        | ``identify_pixel``                |
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd

from gridfia_ray import fixtures
from gridfia_ray.exceptions import CalculationFailed, InvalidTileTable, SpeciesNotFound
from gridfia_ray.kernels.registry import registry
from gridfia_ray.pipelines.common import GridSpec


class GridFIARay:
    def __init__(self, spec: GridSpec):
        self.spec = spec

    @classmethod
    def from_store(cls, tiles_path: str) -> "GridFIARay":
        """Infer the grid spec from the first tile's caption."""
        import glob

        import pyarrow.parquet as pq

        if os.path.isdir(tiles_path):
            tiles_path = sorted(glob.glob(os.path.join(tiles_path, "*.parquet")))[0]
        f = pq.ParquetFile(tiles_path)
        batch = next(f.iter_batches(batch_size=1))
        cap = json.loads(batch["caption"][0].as_py())
        tf = cap["transform"]
        w = int(batch["w"][0].as_py())
        tr, tc = int(cap.get("tile_row", 0)), int(cap.get("tile_col", 0))
        # rewind the per-tile transform to the grid origin
        x0 = tf[0] - tc * w * tf[1]
        h = int(batch["h"][0].as_py())
        y0 = tf[3] - tr * h * tf[5]
        return cls(GridSpec(origin_x=x0, origin_y=y0, px=tf[1], tile=w))

    # -- ingest (S7/S9 analogs) --------------------------------------------

    @staticmethod
    def create_tile_table(
        cube: np.ndarray,
        catalog: list[tuple[str, str]],
        out_path: str,
        tile: int = 256,
        fmt: str = "raw-f32",
    ) -> int:
        """(S, H, W) cube → tile table parquet. The total layer must be
        row 0 with code '0000' (or absent)."""
        import pyarrow.parquet as pq

        t = fixtures.tile_table_from_cube(np.asarray(cube, dtype=np.float32), catalog, tile, fmt)
        pq.write_table(t, out_path, compression="zstd")
        return t.num_rows

    @staticmethod
    def append_species(
        tiles_path: str, layer: np.ndarray, species_code: str, species_name: str
    ) -> int:
        """S9 analog: append one species' tile rows, validating geometry
        against the store (alignment checks of zarr_utils.py:989-1001).
        Idempotent on image_id: re-appending an existing code raises.

        Directory (per-species) stores append by writing a NEW
        ``part-{code}.parquet`` — no rewrite of existing data (the
        tabular win over the reference's preallocated zarr, S8/S9)."""
        import glob as _glob

        import pyarrow as pa
        import pyarrow.parquet as pq

        if os.path.isdir(tiles_path):
            target = os.path.join(tiles_path, f"part-{species_code}.parquet")
            if os.path.exists(target):
                raise InvalidTileTable(f"species {species_code} already in store")
            ref_file = sorted(_glob.glob(os.path.join(tiles_path, "*.parquet")))[0]
            meta = pq.ParquetFile(ref_file)
            w = meta.schema_arrow  # noqa: F841 (schema check implied below)
            first = next(meta.iter_batches(batch_size=1))
            tile_w = int(first["w"][0].as_py())
            n_tiles = meta.metadata.num_rows
            grid = int(np.sqrt(n_tiles))
            if layer.shape != (grid * tile_w, grid * tile_w):
                raise InvalidTileTable(
                    f"layer shape {layer.shape} misaligned with store grid "
                    f"{grid}x{grid}x{tile_w}"
                )
            from gridfia_ray.fixtures import Scale, _species_table

            shim = Scale("append", grid=grid, tile=tile_w, n_species=1)
            t = _species_table(shim, np.asarray(layer, dtype=np.float32), species_code,
                               species_name)
            tmp = target + ".tmp"
            pq.write_table(t, tmp, compression="zstd", row_group_size=32)
            os.replace(tmp, target)
            return t.num_rows

        existing = pq.read_table(tiles_path, columns=["image_id", "w", "h"])
        codes = {i.split("/")[0] for i in existing["image_id"].to_pylist()}
        if species_code in codes:
            raise InvalidTileTable(f"species {species_code} already in store")
        w = existing["w"][0].as_py()
        n_tiles = len({i.split("/", 1)[1] for i in existing["image_id"].to_pylist()})
        grid = int(np.sqrt(n_tiles))
        if layer.shape != (grid * w, grid * w):
            raise InvalidTileTable(
                f"layer shape {layer.shape} misaligned with store grid {grid}x{grid}x{w}"
            )
        cube = layer[None, ...].astype(np.float32)
        add = fixtures.tile_table_from_cube(cube, [(species_code, species_name)], w)
        # drop the synthetic '0000' naming only applies when catalog[0] is total
        full = pa.concat_tables([pq.read_table(tiles_path), add])
        tmp = tiles_path + ".tmp"
        pq.write_table(full, tmp, compression="zstd")
        os.replace(tmp, tiles_path)
        return add.num_rows

    # -- catalog / validation (S6/S11) -------------------------------------

    @staticmethod
    def list_species(tiles_path: str) -> pd.DataFrame:
        import pyarrow.parquet as pq

        caps = pq.read_table(tiles_path, columns=["caption"])["caption"].to_pylist()
        seen = {}
        for c in caps:
            m = json.loads(c)
            seen.setdefault(m["species_code"], m.get("species_name", ""))
        return (
            pd.DataFrame(
                {"species_code": list(seen.keys()), "species_name": list(seen.values())}
            )
            .sort_values("species_code")
            .reset_index(drop=True)
        )

    @staticmethod
    def validate_store(tiles_path: str) -> dict:
        """S11 analog: schema + per-species tile-set consistency +
        transform alignment; raises InvalidTileTable on failure."""
        import pyarrow.parquet as pq

        t = pq.read_table(tiles_path, columns=["image_id", "w", "h", "fmt", "caption"])
        required = {"image_id", "w", "h", "fmt", "caption"}
        if not required <= set(t.column_names):
            raise InvalidTileTable(f"missing columns {required - set(t.column_names)}")
        ids = t["image_id"].to_pylist()
        by_species: dict[str, set] = {}
        for i in ids:
            code, rest = i.split("/", 1)
            by_species.setdefault(code, set()).add(rest)
        tile_sets = list(by_species.values())
        aligned = all(s == tile_sets[0] for s in tile_sets[1:])
        if not aligned:
            raise InvalidTileTable("species have differing tile sets (misaligned store)")
        cap0 = json.loads(t["caption"][0].as_py())
        return {
            "n_rows": t.num_rows,
            "n_species": len(by_species),
            "n_tile_positions": len(tile_sets[0]) if tile_sets else 0,
            "tile_w": t["w"][0].as_py(),
            "tile_h": t["h"][0].as_py(),
            "crs": cap0.get("crs"),
            "valid": True,
        }

    # -- compute ------------------------------------------------------------

    def calculate_metrics(
        self,
        tiles_path: str,
        calculations: list[dict] | list[str],
        output_dir: str | None = None,
        resume: bool = True,
        catalog: list[str] | None = None,
        **kw,
    ):
        """§3.3 flagship. ``calculations`` as config dicts or names.
        Without ``output_dir``: returns the streaming result Dataset.
        With ``output_dir``: runs sharded + checkpointed (manifest,
        lineage, resume) and returns the RunManifest."""
        cfgs = [c if isinstance(c, dict) else {"name": c} for c in calculations]
        try:
            kernels = registry.from_configs(cfgs)
        except KeyError as exc:
            raise CalculationFailed(str(exc)) from exc
        if not kernels:
            raise CalculationFailed("no enabled calculations")
        catalog = catalog or (
            ["0000"]
            + sorted(c for c in self.list_species(tiles_path)["species_code"] if c != "0000")
        )
        if output_dir is None:
            from gridfia_ray.pipelines.metrics import run_metrics

            return run_metrics(tiles_path, kernels, self.spec, catalog, **kw)
        from gridfia_ray.pipelines.checkpoint import run_metrics_checkpointed

        return run_metrics_checkpointed(
            tiles_path, kernels, self.spec, catalog, output_dir, resume=resume, **kw
        )

    def export_geotiff(
        self,
        result,
        metric: str,
        out_path: str,
        grid: int,
        crs: str = "ESRI:102039",
        transform: list | None = None,
    ) -> dict:
        """S12 analog: stream a metrics result Dataset into a single-band
        GeoTIFF (reference ``forest_metrics.py:547-567``); pure-numpy
        encoder, memmapped strip — the driver never holds the raster."""
        from gridfia_ray.pipelines.reassemble import write_geotiff

        return write_geotiff(
            result, metric, out_path, grid=grid, tile=self.spec.tile,
            crs=crs, transform=transform,
        )

    def export_zarr(self, result, metric: str, root: str, grid: int,
                    crs: str = "ESRI:102039", transform: list | None = None) -> dict:
        """S13 analog: distributed Zarr v3 export — one result tile is
        one chunk file (reference ``forest_metrics.py:568-601``)."""
        from gridfia_ray.pipelines.reassemble import write_zarr

        return write_zarr(result, metric, root, grid=grid, tile=self.spec.tile,
                          crs=crs, transform=transform)

    def export_netcdf(self, result, metric: str, out_path: str, grid: int,
                      crs: str = "ESRI:102039", transform: list | None = None) -> dict:
        """S14 analog: classic NetCDF export with x/y coordinates and
        CRS attrs (reference ``forest_metrics.py:603-637``)."""
        from gridfia_ray.pipelines.reassemble import write_netcdf

        return write_netcdf(result, metric, out_path, grid=grid, tile=self.spec.tile,
                            crs=crs, transform=transform)

    def zonal_stats(self, tiles_path: str, zones_path: str):
        from gridfia_ray.pipelines import zonal as Z

        return Z.zonal_stats(tiles_path, Z.load_zones(zones_path), self.spec)

    def tile_zone_join(self, tiles_path: str, zones_path: str):
        from gridfia_ray.pipelines import zonal as Z

        return Z.tile_zone_join(tiles_path, Z.load_zones(zones_path), self.spec)

    def knn(self, tiles_path: str, plots_path: str, k: int = 4, power: float = 2.0):
        from gridfia_ray.pipelines import knn as K

        return K.knn_interpolate(tiles_path, plots_path, self.spec, k, power)

    def identify_pixel(self, tiles_path: str, x: float, y: float, species_code: str) -> float:
        """S4 analog: point query — cell-id equality filter (prunes to
        one tile before any decode), then decode + index."""
        import pyarrow.compute as pc

        from gridfia_ray.codecs.registry import decode_tile
        from gridfia_ray.geo.cells import CellGrid
        from gridfia_ray.pipelines.common import read_tiles

        grid = CellGrid(self.spec.origin_x, self.spec.origin_y, self.spec.cell_size)
        cx, cy = grid.cell_xy(np.asarray([x]), np.asarray([y]))
        tr, tc = max(int(cy[0]), 0), max(int(cx[0]), 0)
        # a point exactly on a cell edge belongs to the open interval of
        # the next tile, but on the grid's outer right/bottom edge that
        # tile doesn't exist — fall back to the tile whose closed edge
        # the point sits on instead of failing (ADVICE r1)
        fx = (x - self.spec.origin_x) / self.spec.cell_size
        fy = (self.spec.origin_y - y) / self.spec.cell_size
        cand = [(tr, tc)]
        if fx == np.floor(fx) and tc > 0:
            cand.append((tr, tc - 1))
        if fy == np.floor(fy) and tr > 0:
            cand.append((tr - 1, tc))
            if fx == np.floor(fx) and tc > 0:
                cand.append((tr - 1, tc - 1))
        targets = [f"{species_code}/{r_:04d}/{c_:04d}" for r_, c_ in cand]
        expr = " or ".join(f"image_id == '{t}'" for t in targets)
        # directory stores prune to the species' own file before any scan
        from gridfia_ray.pipelines.common import read_tiles_species

        ds = read_tiles_species(tiles_path, [species_code])
        if ds is None:
            ds = read_tiles(tiles_path)
        rows = ds.filter(expr=expr).take_all()
        if not rows:
            raise SpeciesNotFound(f"no tile {targets[0]}")
        rows.sort(key=lambda r_: targets.index(r_["image_id"]))
        r = rows[0]
        meta = json.loads(r["caption"])
        arr = decode_tile(r["bytes"], r["fmt"], r["h"], r["w"], meta)
        tf = meta["transform"]
        # floor + clamp: a point exactly on the tile's right/bottom edge is
        # mapped to this tile by CellGrid clamping and must index the last
        # pixel, not raise IndexError
        col = min(max(int(np.floor((x - tf[0]) / tf[1])), 0), int(r["w"]) - 1)
        row = min(max(int(np.floor((y - tf[3]) / tf[5])), 0), int(r["h"]) - 1)
        return float(arr[row, col])

    # -- location planning (M18 full) ----------------------------------------

    @staticmethod
    def resolve_location_bboxes(
        wgs84_bbox: tuple[float, float, float, float],
        state_abbr: str | None = None,
        target_crs: str | None = None,
    ) -> dict:
        """The reference's location-config bbox conversion
        (``location_config.py:301-318`` + per-state CRS detection at
        ``320-385``): a WGS84 bbox expanded to Web-Mercator and the
        state's projected CRS (State Plane / UTM / HOM per the 50-state
        table; unknown state falls back to Web Mercator)."""
        from gridfia_ray.geo import crs as C
        from gridfia_ray.geo.stateplane import state_plane_epsg

        if target_crs is None:
            target_crs = state_plane_epsg(state_abbr) if state_abbr else "EPSG:3857"
        out = {
            "crs_target": target_crs,
            "wgs84": tuple(float(v) for v in wgs84_bbox),
            "web_mercator": C.transform_bbox(wgs84_bbox, "EPSG:4326", "EPSG:3857"),
        }
        if target_crs not in ("EPSG:4326", "EPSG:3857"):
            out["state_plane"] = C.transform_bbox(wgs84_bbox, "EPSG:4326", target_crs)
        return out
