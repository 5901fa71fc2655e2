"""Minimal pure-python Zarr v3 array store (S13) — the ``zarr`` library
is absent from this environment, but the reference's result sink writes
Zarr v3 arrays (``gridfia/core/processors/forest_metrics.py:568-601``:
LocalStore, chunked f32 array, attrs with crs/transform). This module
implements the public Zarr v3 core spec subset needed for that shape:

* directory layout: ``<root>/zarr.json`` + chunks at ``c/<i>/<j>``
  (default chunk-key encoding, "/" separator);
* data types f4/f8/i4/i8/u1; codec chain ``bytes`` (little endian)
  + optional ``gzip`` (stdlib zlib in gzip container);
* missing chunks read back as ``fill_value`` per spec — which makes a
  tile-at-a-time writer RESUMABLE and embarrassingly parallel: one
  result tile is one chunk file, written independently by whatever Ray
  task holds it, no driver-side raster, no cross-task coordination.

Spec: https://zarr-specs.readthedocs.io/ (Zarr core v3, public).
"""

from __future__ import annotations

import gzip
import json
import os

import numpy as np

_DTYPES = {
    "float32": "<f4",
    "float64": "<f8",
    "int32": "<i4",
    "int64": "<i8",
    "uint8": "|u1",
}
_NAMES = {np.dtype(v).newbyteorder("="): k for k, v in _DTYPES.items()}


def _fill_json(fill, dtype: np.dtype):
    if np.issubdtype(dtype, np.floating):
        if np.isnan(fill):
            return "NaN"
        if np.isinf(fill):
            return "Infinity" if fill > 0 else "-Infinity"
        return float(fill)
    return int(fill)


def _fill_value(raw, dtype: np.dtype):
    if raw == "NaN":
        return np.nan
    if raw == "Infinity":
        return np.inf
    if raw == "-Infinity":
        return -np.inf
    return raw


def array_metadata(
    shape: tuple[int, ...],
    chunk_shape: tuple[int, ...],
    dtype,
    fill_value=np.nan,
    attributes: dict | None = None,
    compress: bool = True,
    dimension_names: list[str] | None = None,
) -> dict:
    dt = np.dtype(dtype)
    name = _NAMES.get(dt.newbyteorder("="))
    if name is None:
        raise ValueError(f"unsupported zarr dtype {dt}")
    codecs = [{"name": "bytes", "configuration": {"endian": "little"}}]
    if compress:
        codecs.append({"name": "gzip", "configuration": {"level": 5}})
    meta = {
        "zarr_format": 3,
        "node_type": "array",
        "shape": list(shape),
        "data_type": name,
        "chunk_grid": {
            "name": "regular",
            "configuration": {"chunk_shape": list(chunk_shape)},
        },
        "chunk_key_encoding": {"name": "default", "configuration": {"separator": "/"}},
        "fill_value": _fill_json(fill_value, dt),
        "codecs": codecs,
        "attributes": attributes or {},
    }
    if dimension_names:
        meta["dimension_names"] = list(dimension_names)
    return meta


def init_store(root: str, meta: dict) -> None:
    """Write ``zarr.json``; chunk writes may then proceed from any
    process. Idempotent (atomic replace) — safe under resume."""
    os.makedirs(root, exist_ok=True)
    tmp = os.path.join(root, "zarr.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1)
    os.replace(tmp, os.path.join(root, "zarr.json"))


def _encode(arr: np.ndarray, meta: dict) -> bytes:
    dt = np.dtype(_DTYPES[meta["data_type"]])
    buf = np.ascontiguousarray(arr, dtype=dt).tobytes()
    for codec in meta["codecs"]:
        if codec["name"] == "gzip":
            buf = gzip.compress(buf, compresslevel=codec["configuration"]["level"])
    return buf


def _decode(buf: bytes, meta: dict, chunk_shape: tuple[int, ...]) -> np.ndarray:
    for codec in reversed(meta["codecs"]):
        if codec["name"] == "gzip":
            buf = gzip.decompress(buf)
    dt = np.dtype(_DTYPES[meta["data_type"]])
    return np.frombuffer(buf, dtype=dt).reshape(chunk_shape)


def write_chunk(root: str, meta: dict, index: tuple[int, ...], data: np.ndarray) -> str:
    """Write one chunk (atomic replace; edge chunks are padded with the
    fill value to the full chunk shape, per spec). Returns the path."""
    cs = tuple(meta["chunk_grid"]["configuration"]["chunk_shape"])
    dt = np.dtype(_DTYPES[meta["data_type"]])
    if data.shape != cs:
        full = np.full(cs, _fill_value(meta["fill_value"], dt), dtype=dt)
        full[tuple(slice(0, s) for s in data.shape)] = data
        data = full
    key = os.path.join(root, "c", *[str(i) for i in index])
    os.makedirs(os.path.dirname(key), exist_ok=True)
    tmp = key + f".tmp{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(_encode(data, meta))
    os.replace(tmp, key)
    return key


def read_chunk(root: str, meta: dict, index: tuple[int, ...]) -> np.ndarray:
    """Read one chunk; a missing chunk file materializes as the store's
    fill value in the store's dtype (spec semantics — absent chunks are
    normal, e.g. under resumable writes)."""
    cs = tuple(meta["chunk_grid"]["configuration"]["chunk_shape"])
    dt = np.dtype(_DTYPES[meta["data_type"]])
    key = os.path.join(root, "c", *[str(i) for i in index])
    if not os.path.exists(key):
        return np.full(cs, _fill_value(meta["fill_value"], dt), dtype=dt)
    with open(key, "rb") as f:
        return _decode(f.read(), meta, cs)


def read_array(root: str) -> tuple[np.ndarray, dict]:
    """Assemble the full array (missing chunks → fill value). For tests
    and small reads — large consumers should read chunk-wise."""
    with open(os.path.join(root, "zarr.json")) as f:
        meta = json.load(f)
    if meta.get("zarr_format") != 3 or meta.get("node_type") != "array":
        raise ValueError("not a zarr v3 array store")
    shape = tuple(meta["shape"])
    cs = tuple(meta["chunk_grid"]["configuration"]["chunk_shape"])
    dt = np.dtype(_DTYPES[meta["data_type"]])
    out = np.full(shape, _fill_value(meta["fill_value"], dt), dtype=dt)
    grid = [int(np.ceil(s / c)) for s, c in zip(shape, cs)]
    for idx in np.ndindex(*grid):
        key = os.path.join(root, "c", *[str(i) for i in idx])
        if not os.path.exists(key):
            continue
        chunk = _decode(open(key, "rb").read(), meta, cs)
        sl = tuple(
            slice(i * c, min((i + 1) * c, s)) for i, c, s in zip(idx, cs, shape)
        )
        out[sl] = chunk[tuple(slice(0, s.stop - s.start) for s in sl)]
    return out, meta
