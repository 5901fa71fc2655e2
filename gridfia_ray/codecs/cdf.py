"""Minimal pure-python NetCDF classic (CDF-2, 64-bit offset) writer and
reader (S14) — neither ``netCDF4`` nor ``xarray``/``scipy`` exists in
this environment, but the reference exports results to NetCDF with x/y
coordinate variables and a CRS attribute
(``gridfia/core/processors/forest_metrics.py:603-637``). The classic
file format is a simple public spec (NetCDF Classic Format Spec,
Unidata; all values big-endian):

    header = magic | numrecs | dim_list | gatt_list | var_list
    data   = each fixed variable contiguously at its ``begin`` offset

Only what the result sink needs is implemented: fixed (non-record)
variables of types char/int/float/double, named dimensions, text and
double attributes. The data region layout is computed up front, so the
2-D grid variable can be streamed tile-by-tile through a ``np.memmap``
(the driver never holds the raster) — same discipline as the GeoTIFF
writer.
"""

from __future__ import annotations

import struct

import numpy as np

NC_DIMENSION = 10
NC_VARIABLE = 11
NC_ATTRIBUTE = 12
NC_CHAR, NC_INT, NC_FLOAT, NC_DOUBLE = 2, 4, 5, 6

_TYPE_DT = {NC_CHAR: "S1", NC_INT: ">i4", NC_FLOAT: ">f4", NC_DOUBLE: ">f8"}
_TYPE_SIZE = {NC_CHAR: 1, NC_INT: 4, NC_FLOAT: 4, NC_DOUBLE: 8}


def _pad4(n: int) -> int:
    return (n + 3) & ~3


def _name(s: str) -> bytes:
    b = s.encode("utf-8")
    return struct.pack(">I", len(b)) + b.ljust(_pad4(len(b)), b"\0")


def _att_values(nc_type: int, values) -> tuple[int, bytes]:
    if nc_type == NC_CHAR:
        b = values.encode("utf-8")
        return len(b), b.ljust(_pad4(len(b)), b"\0")
    arr = np.asarray(values, dtype=_TYPE_DT[nc_type])
    raw = arr.tobytes()
    return arr.size, raw.ljust(_pad4(len(raw)), b"\0")


def _att_list(atts: list[tuple[str, int, object]]) -> bytes:
    if not atts:
        return struct.pack(">II", 0, 0)
    out = [struct.pack(">II", NC_ATTRIBUTE, len(atts))]
    for name, nc_type, values in atts:
        n, payload = _att_values(nc_type, values)
        out.append(_name(name) + struct.pack(">II", nc_type, n) + payload)
    return b"".join(out)


class CdfVar:
    def __init__(self, name: str, nc_type: int, dim_ids: list[int],
                 atts: list[tuple[str, int, object]] | None = None):
        self.name = name
        self.nc_type = nc_type
        self.dim_ids = dim_ids
        self.atts = atts or []
        self.begin = 0
        self.vsize = 0


def write_header(
    path: str,
    dims: list[tuple[str, int]],
    variables: list[CdfVar],
    global_atts: list[tuple[str, int, object]] | None = None,
) -> dict[str, CdfVar]:
    """Write the CDF-2 header and reserve the data region layout.
    Returns {var name: CdfVar with .begin/.vsize} so callers can write
    each variable's big-endian bytes at its offset (e.g. via memmap)."""
    dim_sizes = [s for _, s in dims]
    for v in variables:
        n = 1
        for d in v.dim_ids:
            n *= dim_sizes[d]
        v.vsize = _pad4(n * _TYPE_SIZE[v.nc_type])

    def header_bytes() -> bytes:
        out = [b"CDF\x02", struct.pack(">I", 0)]  # version 2, numrecs 0
        out.append(struct.pack(">II", NC_DIMENSION, len(dims)) if dims
                   else struct.pack(">II", 0, 0))
        for name, size in dims:
            out.append(_name(name) + struct.pack(">I", size))
        out.append(_att_list(global_atts or []))
        out.append(struct.pack(">II", NC_VARIABLE, len(variables)) if variables
                   else struct.pack(">II", 0, 0))
        for v in variables:
            out.append(_name(v.name))
            out.append(struct.pack(">I", len(v.dim_ids)))
            out.append(struct.pack(f">{len(v.dim_ids)}I", *v.dim_ids)
                       if v.dim_ids else b"")
            out.append(_att_list(v.atts))
            # CDF-2: begin is a 64-bit offset
            out.append(struct.pack(">IIQ", v.nc_type, v.vsize, v.begin))
        return b"".join(out)

    hlen = len(header_bytes())
    pos = _pad4(hlen)
    for v in variables:
        v.begin = pos
        pos += v.vsize
    hdr = header_bytes()
    with open(path, "wb") as f:
        f.write(hdr.ljust(_pad4(hlen), b"\0"))
        f.truncate(pos)  # reserve the data region
    return {v.name: v for v in variables}


def read_cdf(path: str) -> tuple[dict[str, np.ndarray], dict[str, dict], dict]:
    """Parse a classic CDF-1/CDF-2 file (fixed variables only) →
    (variables, per-var attributes, global attributes)."""
    buf = open(path, "rb").read()
    if buf[:3] != b"CDF" or buf[3] not in (1, 2):
        raise ValueError("not a classic NetCDF file")
    version = buf[3]
    pos = 8  # skip numrecs

    def u32():
        nonlocal pos
        (v,) = struct.unpack(">I", buf[pos : pos + 4])
        pos += 4
        return v

    def name():
        nonlocal pos
        n = u32()
        s = buf[pos : pos + n].decode("utf-8")
        pos += _pad4(n)
        return s

    def atts():
        nonlocal pos
        tag, n = u32(), u32()
        out = {}
        for _ in range(n):
            aname = name()
            t, cnt = u32(), u32()
            size = cnt * _TYPE_SIZE[t]
            raw = buf[pos : pos + size]
            pos += _pad4(size)
            if t == NC_CHAR:
                out[aname] = raw.decode("utf-8")
            else:
                out[aname] = np.frombuffer(raw, dtype=_TYPE_DT[t]).tolist()
        return out

    tag, ndims = u32(), u32()
    dims = []
    for _ in range(ndims):
        dname = name()
        dims.append((dname, u32()))
    gatts = atts()
    tag, nvars = u32(), u32()
    data: dict[str, np.ndarray] = {}
    vatts: dict[str, dict] = {}
    for _ in range(nvars):
        vname = name()
        nd = u32()
        dim_ids = [u32() for _ in range(nd)]
        vatts[vname] = atts()
        t, vsize = u32(), u32()
        if version == 2:
            (begin,) = struct.unpack(">Q", buf[pos : pos + 8])
            pos += 8
        else:
            begin = u32()
        shape = tuple(dims[d][1] for d in dim_ids)
        n = int(np.prod(shape)) if shape else 1
        arr = np.frombuffer(
            buf[begin : begin + n * _TYPE_SIZE[t]], dtype=_TYPE_DT[t]
        ).reshape(shape)
        data[vname] = arr
    return data, vatts, gatts
