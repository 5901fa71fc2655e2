"""Zarr-cube → tile-store ingest — the migration path from the
reference's native storage.

GridFIA stores its corpus as zarr cubes of shape (species, H, W) with
(1, ch, cw) chunks (``gridfia/utils/zarr_utils.py``; SURVEY.md §1.2).
This engine's working representation is the per-species parquet tile
store. ``ingest_zarr_cube`` converts one to the other distributed:

* one Ray task per SPECIES (matching the store's one-file-per-species
  layout, so the output immediately takes the aligned zero-shuffle
  metrics path and file-level species pruning);
* inside a task, the layer streams strip-by-strip: each tile-row strip
  reads only the zarr chunk rows overlapping it and appends one parquet
  row group — peak memory is one chunk-row band, never the layer;
* row/caption construction is ``fixtures.tile_rows_from_stack`` — the
  SAME code the fixture builder uses, so ingested and built stores
  cannot drift;
* missing chunks and NaN fill values become ``nodata_fill`` (default 0,
  the engine's nodata convention and the caption's declared nodata) —
  absent chunks are spec-normal under resumable writes and must not
  poison kernels with NaN.

Metadata: ``catalog`` / ``transform`` / ``crs`` default to the zarr
attributes ``species`` (list of {species_code, species_name}),
``transform`` (6-element affine) and ``crs`` — provide them as args for
stores that lack these attributes. Only float32 cubes are accepted (the
reference's dtype; anything else would silently lose precision in a
"migration").

Best-aligned when ``chunk_shape[1] % tile == 0`` (each chunk row is
read once); misaligned chunk grids still work — strips then re-read the
straddled chunk row (documented amplification ≤ 2×).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import ray.data as rd

from gridfia_ray.codecs.zarrlite import read_chunk
from gridfia_ray.exceptions import InvalidTileTable
from gridfia_ray.fixtures import _TILE_SCHEMA, tile_rows_from_stack


def _zarr_meta(root: str) -> dict:
    with open(os.path.join(root, "zarr.json")) as f:
        meta = json.load(f)
    if meta.get("zarr_format") != 3 or meta.get("node_type") != "array":
        raise InvalidTileTable("not a zarr v3 array store")
    if len(meta["shape"]) != 3:
        raise InvalidTileTable(f"expected (species, H, W) cube, got shape {meta['shape']}")
    if meta["data_type"] != "float32":
        raise InvalidTileTable(
            f"cube dtype {meta['data_type']} unsupported: the tile store is "
            "raw-f32 and a lossy implicit cast is not a migration"
        )
    return meta


def _strip(root: str, meta: dict, si: int, y0: int, y1: int,
           nodata_fill: float) -> np.ndarray:
    """Rows [y0, y1) of species layer ``si`` — reads only overlapping
    chunk rows; non-finite values (NaN fill) become ``nodata_fill``."""
    shape = meta["shape"]
    cs = meta["chunk_grid"]["configuration"]["chunk_shape"]
    w = shape[2]
    out = np.empty((y1 - y0, w), dtype=np.float32)
    for cr in range(y0 // cs[1], (y1 - 1) // cs[1] + 1):
        ry0, ry1 = cr * cs[1], min((cr + 1) * cs[1], shape[1])
        band = np.concatenate(
            [
                read_chunk(root, meta, (si // cs[0], cr, cc))[si % cs[0], :, :]
                for cc in range((w - 1) // cs[2] + 1)
            ],
            axis=1,
        )[:, :w]
        oy0, oy1 = max(ry0, y0), min(ry1, y1)
        out[oy0 - y0 : oy1 - y0] = band[oy0 - ry0 : oy1 - ry0]
    return np.nan_to_num(out, nan=nodata_fill, posinf=nodata_fill, neginf=nodata_fill)


def ingest_zarr_cube(
    zarr_root: str,
    out_dir: str,
    tile: int,
    catalog: list[tuple[str, str]] | None = None,
    transform: list | None = None,
    crs: str | None = None,
    units: str = "Mg/ha",
    nodata_fill: float = 0.0,
) -> int:
    """Convert a (species, H, W) float32 zarr v3 cube into a per-species
    parquet tile store at ``out_dir``. Returns total tile rows written."""
    meta = _zarr_meta(zarr_root)
    attrs = meta.get("attributes", {})
    if catalog is None:
        sp = attrs.get("species")
        if not sp:
            raise InvalidTileTable("no catalog arg and no species attribute in zarr store")
        catalog = [(s["species_code"], s.get("species_name", "")) for s in sp]
    transform = transform or attrs.get("transform")
    if transform is None:
        raise InvalidTileTable("no transform arg and no transform attribute in zarr store")
    crs = crs or attrs.get("crs", "")
    n_sp, h, w = meta["shape"]
    if len(catalog) != n_sp:
        raise InvalidTileTable(f"catalog has {len(catalog)} entries for {n_sp} layers")
    if h % tile or w % tile:
        raise InvalidTileTable(f"cube {h}x{w} not divisible by tile {tile}")
    os.makedirs(out_dir, exist_ok=True)

    def ingest_species(batch: pd.DataFrame) -> pd.DataFrame:
        out_rows = []
        for _, row in batch.iterrows():
            si, code, name = int(row["si"]), row["code"], row["name"]
            target = os.path.join(out_dir, f"part-{code}.parquet")
            tmp = target + f".tmp{os.getpid()}"
            writer = pq.ParquetWriter(tmp, _TILE_SCHEMA, compression="zstd")
            n = 0
            try:
                g_cols = w // tile
                for tr in range(h // tile):
                    strip = _strip(zarr_root, meta, si, tr * tile, (tr + 1) * tile,
                                   nodata_fill)
                    stack = np.ascontiguousarray(
                        strip.reshape(tile, g_cols, tile).swapaxes(0, 1), dtype="<f4"
                    )
                    t = tile_rows_from_stack(
                        code, name, stack,
                        np.full(g_cols, tr), np.arange(g_cols),
                        transform, crs=crs, units=units,
                    )
                    writer.write_table(t, row_group_size=max(t.num_rows, 1))
                    n += t.num_rows
            finally:
                writer.close()
            os.replace(tmp, target)
            out_rows.append({"species_code": code, "n_tiles": n})
        return pd.DataFrame(out_rows)

    items = pd.DataFrame(
        {
            "si": np.arange(n_sp, dtype=np.int64),
            "code": [c for c, _ in catalog],
            "name": [n for _, n in catalog],
        }
    )
    summary = (
        rd.from_pandas(items)
        .repartition(n_sp)
        .map_batches(ingest_species, batch_format="pandas")
        .to_pandas()
    )
    return int(summary["n_tiles"].sum())


def compact_store(
    src,
    dst: str,
    row_group_size: int = 32,
) -> pd.DataFrame:
    """Tile-store compaction/migration: any tile table (a monolithic
    parquet file, or a directory fragmented by many appends) → the
    aligned per-species directory layout (``part-{code}.parquet``,
    rows in image_id tile order, fixed row groups) that takes the
    zero-shuffle metrics fast path and file-level species pruning.

    Distributed: one hash-shuffle co-locates each species' rows (the
    payload bytes must physically move — that IS the compaction), one
    writer task per species sorts its group and writes the part file
    atomically (tmp + rename). Resumable: species whose part file
    already exists in ``dst`` are pruned BEFORE the shuffle (cheap
    vectorized prefix filter at the read), so a crashed run pays only
    the remaining species.

    Returns the manifest (species_code, n_rows, path) covering both
    written and previously-complete species, ordered by code.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from gridfia_ray.pipelines.common import read_tiles

    os.makedirs(dst, exist_ok=True)
    done = sorted(
        f[len("part-"):-len(".parquet")]
        for f in os.listdir(dst)
        if f.startswith("part-") and f.endswith(".parquet")
    )

    def species_of(batch: pa.Table) -> pa.Array:
        return pc.list_element(pc.split_pattern(batch["image_id"], "/"), 0)

    def tag(batch: pa.Table) -> pa.Table:
        sp = species_of(batch)
        if done:
            batch = batch.filter(pc.invert(pc.is_in(sp, value_set=pa.array(done))))
            sp = species_of(batch)
        return batch.append_column("__species", sp)

    def write_part(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({"species_code": pa.array([], pa.string()),
                             "n_rows": pa.array([], pa.int64())})
        code = group["__species"][0].as_py()
        out = group.drop_columns(["__species"]).sort_by("image_id")
        target = os.path.join(dst, f"part-{code}.parquet")
        tmp = target + f".tmp-{os.getpid()}"
        pq.write_table(out, tmp, compression="zstd", row_group_size=row_group_size)
        os.replace(tmp, target)
        return pa.table({"species_code": pa.array([code]),
                         "n_rows": pa.array([out.num_rows], pa.int64())})

    manifest = (
        read_tiles(src)
        .map_batches(tag, batch_format="pyarrow")
        .groupby("__species")
        .map_groups(write_part, batch_format="pyarrow")
        .to_pandas()
    )
    for code in done:
        n = pq.ParquetFile(os.path.join(dst, f"part-{code}.parquet")).metadata.num_rows
        manifest = pd.concat(
            [manifest, pd.DataFrame({"species_code": [code], "n_rows": [n]})],
            ignore_index=True,
        )
    manifest["path"] = [
        os.path.join(dst, f"part-{c}.parquet") for c in manifest["species_code"]
    ]
    manifest["n_rows"] = manifest["n_rows"].astype(np.int64)
    counts = manifest["n_rows"].unique()
    if len(manifest) and len(counts) != 1:
        raise InvalidTileTable(
            f"compacted store misaligned: per-species rows {sorted(counts)}"
        )
    return manifest.sort_values("species_code", ignore_index=True)
