"""Raster reassembly sink: result-tile rows → full 2-D raster files.

The tabular analog of the reference's GeoTIFF/Zarr/NetCDF writers
(``gridfia/core/processors/forest_metrics.py:547-637``). Results normally
STAY tabular (tile rows in parquet — the streaming, resumable layout);
reassembly is a presentation-layer export for consumers that want the
dense raster back.

Memory discipline: the driver never holds the raster in RAM — tiles
stream via ``iter_batches`` into a ``numpy.memmap`` (the OS pages it),
written band by band as batches arrive in any order. Output format is
deliberately dependency-free: raw little-endian array + a JSON sidecar
carrying dtype/shape/CRS/transform (the GeoTIFF tags analog) — loadable
with one ``np.memmap`` call. At larger-than-disk scale, shard the export
by tile-row bands (one memmap per band) with the same code.
"""

from __future__ import annotations

import json
import os

import numpy as np
import ray.data as rd


def write_raster(
    result: rd.Dataset,
    metric: str,
    out_path: str,
    grid: int,
    tile: int,
    crs: str = "",
    transform: list | None = None,
) -> dict:
    """Stitch one metric's result tiles into ``out_path`` (.bin + .json).

    ``result`` is the run_metrics output (any metrics mix — filtered to
    ``metric`` here). Missing tiles stay at the sentinel fill.
    """
    n = grid * tile
    first_dtype: np.dtype | None = None
    mm: np.memmap | None = None
    n_tiles = 0
    for batch in result.iter_batches(batch_size=256, batch_format="pyarrow"):
        for i in range(batch.num_rows):
            if batch["metric"][i].as_py() != metric:
                continue
            dt = np.dtype(batch["dtype"][i].as_py())
            if mm is None:
                first_dtype = dt
                mm = np.memmap(out_path + ".bin", dtype=dt, mode="w+", shape=(n, n))
                if np.issubdtype(dt, np.floating):
                    mm[:] = np.nan
                else:
                    mm[:] = 0
            h = int(batch["h"][i].as_py())
            w = int(batch["w"][i].as_py())
            tr = int(batch["tile_row"][i].as_py())
            tc = int(batch["tile_col"][i].as_py())
            arr = np.frombuffer(batch["pix"][i].as_py(), dtype=dt).reshape(h, w)
            mm[tr * tile : tr * tile + h, tc * tile : tc * tile + w] = arr
            n_tiles += 1
    if mm is None:
        raise ValueError(f"no result tiles for metric {metric!r}")
    mm.flush()
    meta = {
        "metric": metric,
        "dtype": np.dtype(first_dtype).str,
        "shape": [n, n],
        "crs": crs,
        "transform": transform or [],
        "n_tiles": n_tiles,
        "layout": "raw little-endian row-major; np.memmap(path+'.bin', dtype, shape=shape)",
    }
    with open(out_path + ".json", "w") as f:
        json.dump(meta, f, indent=1)
    return meta


def read_raster(out_path: str) -> tuple[np.ndarray, dict]:
    with open(out_path + ".json") as f:
        meta = json.load(f)
    arr = np.memmap(
        out_path + ".bin", dtype=np.dtype(meta["dtype"]), mode="r", shape=tuple(meta["shape"])
    )
    return arr, meta


def write_geotiff(
    result: rd.Dataset,
    metric: str,
    out_path: str,
    grid: int,
    tile: int,
    crs: str = "ESRI:102039",
    transform: list | None = None,
) -> dict:
    """S12: stitch one metric's result tiles into a single-band GeoTIFF
    (the reference's primary result format — rasterio GTiff writer,
    ``gridfia/core/processors/forest_metrics.py:547-567``; here the
    pure-numpy encoder in ``codecs/tiff.py``).

    Streaming discipline: the pixel plane is written through the same
    memmap band-by-band path as ``write_raster`` — the TIFF layout puts
    the strip data at offset 8 and the IFD after it, so the driver
    never holds the raster in RAM; tiles land in the memmapped strip
    as batches arrive, then the footer (IFD + GeoTIFF tags) is
    appended."""
    import struct

    from gridfia_ray.codecs import tiff as T

    n = grid * tile
    # header first, then the strip as a memmap at offset 8
    with open(out_path, "wb") as f:
        f.write(struct.pack("<2sHI", b"II", 42, 0))  # IFD offset patched below
    mm = np.memmap(out_path, dtype="<f4", mode="r+", offset=8, shape=(n, n))
    mm[:] = np.nan
    n_tiles = 0
    for batch in result.iter_batches(batch_size=256, batch_format="pyarrow"):
        for i in range(batch.num_rows):
            if batch["metric"][i].as_py() != metric:
                continue
            dt = np.dtype(batch["dtype"][i].as_py())
            h = int(batch["h"][i].as_py())
            w = int(batch["w"][i].as_py())
            tr = int(batch["tile_row"][i].as_py())
            tc = int(batch["tile_col"][i].as_py())
            arr = np.frombuffer(batch["pix"][i].as_py(), dtype=dt).reshape(h, w)
            mm[tr * tile : tr * tile + h, tc * tile : tc * tile + w] = arr
            n_tiles += 1
    mm.flush()
    del mm
    if n_tiles == 0:
        raise ValueError(f"no result tiles for metric {metric!r}")
    ifd_off = 8 + n * n * 4
    footer = T.build_ifd(n, n, ifd_off, strip_off=8, transform=transform, crs=crs)
    with open(out_path, "r+b") as f:
        f.seek(0, 2)
        f.write(footer)
        f.seek(4)
        f.write(struct.pack("<I", ifd_off))
    return {"metric": metric, "path": out_path, "shape": [n, n], "crs": crs,
            "n_tiles": n_tiles}


def write_zarr(
    result: rd.Dataset,
    metric: str,
    root: str,
    grid: int,
    tile: int,
    crs: str = "ESRI:102039",
    transform: list | None = None,
    compress: bool = True,
) -> dict:
    """S13: result tiles → a Zarr v3 array store (the reference's zarr
    result sink, ``forest_metrics.py:568-601``), written DISTRIBUTED:
    chunk shape == tile shape, so each result row becomes exactly one
    chunk file, written by whatever Ray task holds the row — no
    driver-side raster, no shuffle, resumable for free (missing chunks
    read as fill per the zarr spec; re-running overwrites atomically).
    """
    from gridfia_ray.codecs import zarrlite as Z

    n = grid * tile
    meta = Z.array_metadata(
        shape=(n, n),
        chunk_shape=(tile, tile),
        dtype=np.float32,
        fill_value=np.nan,
        attributes={
            "crs": crs,
            "transform": list(transform or []),
            "metric": metric,
            "software": "gridfia_ray",
        },
        compress=compress,
        dimension_names=["y", "x"],
    )
    Z.init_store(root, meta)

    def write_chunks(batch) -> "rd.Dataset":
        import pyarrow as pa

        wrote = 0
        for i in range(batch.num_rows):
            if batch["metric"][i].as_py() != metric:
                continue
            dt = np.dtype(batch["dtype"][i].as_py())
            h = int(batch["h"][i].as_py())
            w = int(batch["w"][i].as_py())
            arr = np.frombuffer(batch["pix"][i].as_py(), dtype=dt).reshape(h, w)
            Z.write_chunk(
                root, meta,
                (int(batch["tile_row"][i].as_py()), int(batch["tile_col"][i].as_py())),
                arr.astype(np.float32),
            )
            wrote += 1
        return pa.table({"chunks_written": pa.array([wrote], pa.int64())})

    total = sum(
        r["chunks_written"]
        for r in result.map_batches(write_chunks, batch_format="pyarrow").take_all()
    )
    if total == 0:
        raise ValueError(f"no result tiles for metric {metric!r}")
    return {"metric": metric, "path": root, "shape": [n, n], "n_chunks": total}


def write_netcdf(
    result: rd.Dataset,
    metric: str,
    out_path: str,
    grid: int,
    tile: int,
    crs: str = "ESRI:102039",
    transform: list | None = None,
) -> dict:
    """S14: result tiles → a classic NetCDF (CDF-2) file with x/y
    coordinate variables and CRS attributes (the reference's xarray
    export, ``forest_metrics.py:603-637``). The 2-D variable's region
    is reserved up front and streamed tile-by-tile through a big-endian
    memmap — same no-raster-in-RAM discipline as the GeoTIFF writer."""
    from gridfia_ray.codecs import cdf as C

    n = grid * tile
    tf = transform or [0.0, 1.0, 0.0, 0.0, 0.0, -1.0]
    xs = tf[0] + (np.arange(n, dtype=np.float64) + 0.5) * tf[1]
    ys = tf[3] + (np.arange(n, dtype=np.float64) + 0.5) * tf[5]

    variables = [
        C.CdfVar("x", C.NC_DOUBLE, [1], [("units", C.NC_CHAR, "m")]),
        C.CdfVar("y", C.NC_DOUBLE, [0], [("units", C.NC_CHAR, "m")]),
        C.CdfVar(
            metric, C.NC_FLOAT, [0, 1],
            [("_FillValue", C.NC_FLOAT, [np.nan]), ("grid_mapping_crs", C.NC_CHAR, crs)],
        ),
    ]
    vmap = C.write_header(
        out_path,
        dims=[("y", n), ("x", n)],
        variables=variables,
        global_atts=[
            ("crs", C.NC_CHAR, crs),
            ("transform", C.NC_DOUBLE, list(tf)),
            ("software", C.NC_CHAR, "gridfia_ray"),
        ],
    )
    with open(out_path, "r+b") as f:
        f.seek(vmap["x"].begin)
        f.write(xs.astype(">f8").tobytes())
        f.seek(vmap["y"].begin)
        f.write(ys.astype(">f8").tobytes())
    mm = np.memmap(out_path, dtype=">f4", mode="r+", offset=vmap[metric].begin,
                   shape=(n, n))
    mm[:] = np.nan
    n_tiles = 0
    for batch in result.iter_batches(batch_size=256, batch_format="pyarrow"):
        for i in range(batch.num_rows):
            if batch["metric"][i].as_py() != metric:
                continue
            dt = np.dtype(batch["dtype"][i].as_py())
            h = int(batch["h"][i].as_py())
            w = int(batch["w"][i].as_py())
            tr = int(batch["tile_row"][i].as_py())
            tc = int(batch["tile_col"][i].as_py())
            arr = np.frombuffer(batch["pix"][i].as_py(), dtype=dt).reshape(h, w)
            mm[tr * tile : tr * tile + h, tc * tile : tc * tile + w] = arr
            n_tiles += 1
    mm.flush()
    del mm
    if n_tiles == 0:
        raise ValueError(f"no result tiles for metric {metric!r}")
    return {"metric": metric, "path": out_path, "shape": [n, n], "n_tiles": n_tiles}


def sample_tiles(tiles: rd.Dataset, fraction: float, seed: int = 42) -> rd.Dataset:
    """O3 analog (``gridfia/examples/utils.py:212-250`` strided
    downsample): seeded random tile sampling for memory-safe previews."""
    return tiles.random_sample(fraction, seed=seed)
