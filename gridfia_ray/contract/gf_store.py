"""Store lifecycle & sinks: catalog, validate, roundtrips (4 raster
sinks + CSV/JSON/IPC), codec decode pools, ingest/compact/append,
tile dedup.

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


def q_csv_roundtrip(sf_dir: str) -> pd.DataFrame:
    """S17 via Ray's native CSV sink/source (see _stats_roundtrip)."""
    return _stats_roundtrip(sf_dir, "gf_csv_", "write_csv", "read_csv")

def q_json_roundtrip(sf_dir: str) -> pd.DataFrame:
    """S17 via Ray's native NDJSON sink/source (see _stats_roundtrip)."""
    return _stats_roundtrip(sf_dir, "gf_json_", "write_json", "read_json")

def q_ipc_roundtrip(sf_dir: str) -> pd.DataFrame:
    """S17 via the engine's own Arrow IPC (Feather v2) sink/source
    (io.write_ipc / io.read_ipc — Ray has no native IPC pair): blocks
    written as .arrow files inside the map tasks, streamed back through
    read_binary_files + in-task decode. Same oracle as the direct
    occurrence-stats plan; interop with plain pyarrow.feather is pinned
    in tests/test_ipc.py."""
    import shutil
    import tempfile

    import ray.data as rd

    from gridfia_ray.contract.gf_zonal import q_occurrence_stats
    from gridfia_ray.io import read_ipc, write_ipc

    df = q_occurrence_stats(sf_dir)
    tmp = tempfile.mkdtemp(prefix="gf_ipc_")
    try:
        manifest = write_ipc(rd.from_pandas(df).repartition(2), tmp)
        assert int(manifest["num_rows"].sum()) == len(df)
        back = read_ipc(tmp).to_pandas()
        for c in ["present_px", "n_px", "sum_biomass_u", "max_biomass_u"]:
            back[c] = back[c].astype(np.int64)
        back["species_code"] = back["species_code"].astype(str).str.zfill(4)
        return back.sort_values("species_code", ignore_index=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

def q_tile_dedup_exact(sf_dir: str) -> pd.DataFrame:
    import ray.data as rd

    from gridfia_ray.pipelines import dedup_tiles as D

    f = _fx()
    out = D.exact_dedup(rd.read_parquet(f["tiles_dup"])).to_pandas()
    return out[["image_id"]].sort_values("image_id").reset_index(drop=True)

def q_tile_near_dup(sf_dir: str) -> pd.DataFrame:
    import ray.data as rd

    from gridfia_ray.pipelines import dedup_tiles as D

    f = _fx()
    out = D.near_dup_pairs(rd.read_parquet(f["tiles_dup"]), max_hamming=6).to_pandas()
    out["hamming"] = out["hamming"].astype(np.int64)
    return out.sort_values(["a", "b"]).reset_index(drop=True)

def q_tile_catalog(sf_dir: str) -> pd.DataFrame:
    """S6 analog: species catalog with tile counts, no decode needed."""
    import pyarrow.compute as pc

    from gridfia_ray.pipelines.common import read_tiles

    f = _fx()

    def parse(batch):
        code = pc.list_element(pc.split_pattern(batch["image_id"], "/"), 0)
        return batch.select(["image_id"]).append_column("species_code", code)

    ds = read_tiles(f["tiles"]).map_batches(parse, batch_format="pyarrow")
    out = ds.groupby("species_code").count().to_pandas()
    out = out.rename(columns={"count()": "n_tiles"})
    out["n_tiles"] = out["n_tiles"].astype(np.int64)
    return out.sort_values("species_code").reset_index(drop=True)

def q_store_validate(sf_dir: str) -> pd.DataFrame:
    """S11 analog: metadata-only store summary."""
    import pyarrow.compute as pc

    from gridfia_ray.pipelines.common import read_tiles

    f = _fx()

    def parse(batch):
        import pyarrow as pa

        code = pc.list_element(pc.split_pattern(batch["image_id"], "/"), 0)
        px = pc.multiply(pc.cast(batch["w"], pa.int64()), pc.cast(batch["h"], pa.int64()))
        return pa.table({"species_code": code, "px": px})

    ds = read_tiles(f["tiles"]).map_batches(parse, batch_format="pyarrow")
    df = ds.to_pandas()
    return pd.DataFrame(
        [
            {
                "n_rows": np.int64(len(df)),
                "n_species": np.int64(df["species_code"].nunique()),
                "n_pixels": np.int64(df["px"].sum()),
            }
        ]
    )

def q_raster_roundtrip(sf_dir: str) -> pd.DataFrame:
    """S12/S13/S14 result sinks as ONE driver-visible roundtrip: run the
    precise total-biomass kernel, cast the result tiles to the writers'
    float32 plane once, stream them into a GeoTIFF (codecs/tiff.py), a
    Zarr v3 store (codecs/zarrlite.py), a classic-NetCDF CDF-2 file
    (codecs/cdf.py) and the raw memmap sink, read each back with the
    matching pure-numpy decoder, and emit one row per format with the
    pixel count and the micro-scaled integer sum of the plane.

    Exactness: the f64 species sum of f32 layers is exact (≤24+4
    mantissa bits), the f64→f32 cast is round-to-nearest-even on both
    sides, so all four rows must equal the oracle's
    ``CAST(CAST(SUM(biomass) AS REAL) AS DOUBLE)`` recomputation from
    the fixture generator's independent pixel table — any byte the
    encoders/decoders drop or duplicate moves the hash. Reference
    writers: ``forest_metrics.py:547-637``."""
    import shutil
    import tempfile

    from gridfia_ray.codecs import cdf as C
    from gridfia_ray.codecs import tiff as T
    from gridfia_ray.codecs import zarrlite as Z
    from gridfia_ray.pipelines import metrics as M
    from gridfia_ray.pipelines import reassemble as R

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

    def to_f32(batch):
        import pyarrow as pa

        pix = []
        for i in range(batch.num_rows):
            dt = np.dtype(batch["dtype"][i].as_py())
            arr = np.frombuffer(batch["pix"][i].as_py(), dtype=dt)
            pix.append(arr.astype(np.float32).tobytes())
        out = batch.set_column(
            batch.schema.get_field_index("pix"), "pix", pa.array(pix, pa.binary())
        )
        out = out.set_column(
            out.schema.get_field_index("dtype"),
            "dtype",
            pa.array(["<f4"] * batch.num_rows, pa.string()),
        )
        return out.replace_schema_metadata(None)

    res32 = res.map_batches(to_f32, batch_format="pyarrow").materialize()
    grid, tile = f["meta"]["grid"], f["meta"]["tile"]
    tmp = tempfile.mkdtemp(prefix="gf_roundtrip_")
    try:
        R.write_geotiff(res32, "total_biomass", os.path.join(tmp, "t.tif"), grid, tile)
        R.write_zarr(res32, "total_biomass", os.path.join(tmp, "z"), grid, tile)
        R.write_netcdf(res32, "total_biomass", os.path.join(tmp, "t.nc"), grid, tile)
        R.write_raster(res32, "total_biomass", os.path.join(tmp, "raw"), grid, tile)

        with open(os.path.join(tmp, "t.tif"), "rb") as fh:
            tif, _ = T.decode_tiff(fh.read())
        planes = [
            ("geotiff", tif),
            ("netcdf", C.read_cdf(os.path.join(tmp, "t.nc"))[0]["total_biomass"]),
            ("raw", np.array(R.read_raster(os.path.join(tmp, "raw"))[0])),
            ("zarr", Z.read_array(os.path.join(tmp, "z"))[0]),
        ]
        return pd.DataFrame(
            {
                "fmt": [p[0] for p in planes],
                "n_px": np.array([p[1].size for p in planes], np.int64),
                "sum_u": np.array(
                    [s6(np.asarray(p[1], np.float64)).sum() for p in planes], np.int64
                ),
            }
        ).sort_values("fmt", ignore_index=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

def q_jpeg_decode(sf_dir: str) -> pd.DataFrame:
    """Baseline-JPEG (pure-numpy T.81, codecs/jpeg.py) tile table
    through the decoder pool vs its pinned sequential replay. The
    driver-window variant decodes the total layer + the dominant
    species (128 of 640 tiles — the pre-decode species prune is itself
    part of the contract); gf_webp_decode covers the full-store decode
    as a verified sibling."""
    return _codec_decode_query(fixtures.ensure_jpeg_fixture(), species=["0000", "0131"])

def q_webp_decode(sf_dir: str) -> pd.DataFrame:
    """WebP-lossless (full-spec VP8L decoder, codecs/webp.py — the last
    declared stub, graduated) tile table through the decoder pool vs
    its pinned sequential replay."""
    return _codec_decode_query(fixtures.ensure_webp_fixture())

def q_ingest_cube(sf_dir: str) -> pd.DataFrame:
    """S7 migration path as a driver roundtrip: materialize the seeded
    fixture cube as a reference-style zarr v3 (species, H, W) cube with
    a STRADDLING chunk grid (chunk rows not divisible by the tile size,
    exercising the re-read band path), run ``ingest_zarr_cube`` to a
    fresh per-species parquet tile store, then stream the ingested
    store through the decoder pool and emit per-species tile counts and
    micro-scaled pixel sums. Every byte the ingest drops, duplicates or
    mis-places moves the hash vs the fixture generator's independent
    pixel table. Reference: ``gridfia/utils/zarr_utils.py:885-1025``."""
    import shutil
    import tempfile

    from gridfia_ray.codecs import zarrlite as Z
    from gridfia_ray.pipelines.ingest import ingest_zarr_cube

    f = _fx()
    tile = int(f["meta"]["tile"])
    cube, catalog = fixtures.build_cube(fixtures.SCALES[FIXTURE])
    cube = cube.astype(np.float32)
    tmp = tempfile.mkdtemp(prefix="gf_ingest_")
    try:
        zroot = os.path.join(tmp, "cube_zarr")
        chunk = (1, tile + tile // 2, cube.shape[2])  # straddles tile rows
        zmeta = Z.array_metadata(
            cube.shape,
            chunk,
            np.float32,
            fill_value=0.0,
            attributes={
                "species": [
                    {"species_code": c, "species_name": n} for c, n in catalog
                ],
                "transform": fixtures.base_transform(),
                "crs": fixtures.CRS,
            },
            dimension_names=["species", "y", "x"],
        )
        Z.init_store(zroot, zmeta)
        grid_z = [int(np.ceil(s / c)) for s, c in zip(cube.shape, chunk)]
        for idx in np.ndindex(*grid_z):
            sl = tuple(
                slice(i * c, min((i + 1) * c, s))
                for i, c, s in zip(idx, chunk, cube.shape)
            )
            Z.write_chunk(zroot, zmeta, idx, cube[sl])

        store = os.path.join(tmp, "tiles")
        ingest_zarr_cube(zroot, store, tile=tile)
        return _store_species_sums(store, f["spec"])
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

def q_store_compact(sf_dir: str) -> pd.DataFrame:
    """Store compaction/migration (pipelines/ingest.compact_store): the
    seeded cube as ONE monolithic parquet → distributed hash-shuffle →
    aligned per-species directory layout, then the shared decode
    reducer over the compacted store — any row the shuffle drops,
    duplicates or mis-sorts moves the hash vs the fixture generator's
    independent pixel table."""
    import shutil
    import tempfile

    import pyarrow.parquet as _pq

    from gridfia_ray.pipelines.ingest import compact_store

    f = _fx()
    tile = int(f["meta"]["tile"])
    cube, catalog = fixtures.build_cube(fixtures.SCALES[FIXTURE])
    cube = cube.astype(np.float32)
    tmp = tempfile.mkdtemp(prefix="gf_compact_")
    try:
        mono = os.path.join(tmp, "tiles-monolithic.parquet")
        _pq.write_table(
            fixtures.tile_table_from_cube(cube, catalog, tile), mono, compression="zstd"
        )
        dst = os.path.join(tmp, "tiles")
        manifest = compact_store(mono, dst)
        assert len(manifest) == cube.shape[0]
        return _store_species_sums(dst, f["spec"])
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

def q_store_append(sf_dir: str) -> pd.DataFrame:
    """S8/S9 expandable-store lifecycle as a driver roundtrip: bootstrap
    a fresh directory store with only the total layer, append every
    species layer through ``GridFIARay.append_species`` (per-species
    part files — no rewrite of existing data), then verify the full
    store with the shared per-species decode reducer against the
    fixture generator's independent pixel table. Reference append:
    ``gridfia/utils/zarr_utils.py:989-1025``."""
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from gridfia_ray.api import GridFIARay
    from gridfia_ray.fixtures import _species_table

    f = _fx()
    tile = int(f["meta"]["tile"])
    cube, catalog = fixtures.build_cube(fixtures.SCALES[FIXTURE])
    cube = cube.astype(np.float32)
    tmp = tempfile.mkdtemp(prefix="gf_append_")
    try:
        store = os.path.join(tmp, "tiles")
        os.makedirs(store)
        shim = fixtures.Scale("append", grid=f["meta"]["grid"], tile=tile, n_species=1)
        code0, name0 = catalog[0]
        pq.write_table(
            _species_table(shim, cube[0], code0, name0),
            os.path.join(store, f"part-{code0}.parquet"),
            compression="zstd",
            row_group_size=32,
        )
        for si in range(1, cube.shape[0]):
            code, name = catalog[si]
            GridFIARay.append_species(store, cube[si], code, name)
        return _store_species_sums(store, f["spec"])
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
