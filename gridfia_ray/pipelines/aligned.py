"""Aligned-store fast path: species-stack assembly with ZERO shuffle.

A tile store written by this engine (and the reference's zarr cube,
``gridfia/utils/zarr_utils.py:929-1021``) is *aligned*: one parquet file
per species, every file holding the same tile positions in the same row
order. Zipping row-group j of every species file therefore reconstructs
the species stacks directly — an embarrassingly parallel ``map_batches``
over a work-list of row-group indices, no all-to-all exchange at all.

This is the scale-dominant path: the general ``groupby(cell)`` shuffle
(pipelines/metrics.py) moves every decoded pixel through the object
store; this path reads each row group exactly once inside the kernel
task. Alignment is *validated*, not assumed: every file must agree on
row count and per-row tile position (the tabular mirror of the
reference's per-layer shape/transform assertions,
``zarr_utils.py:989-1001``); mismatch → typed error, caller falls back
to the shuffle path.

Work item = row-group index; stateful reader actor holds open
ParquetFile handles (T1 pattern). Column pruning: pixel payloads come
only from the needed columns; captions are parsed from one file only
(per-row geometry is identical across species by the alignment check).
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from gridfia_ray.codecs.registry import decode_tile
from gridfia_ray.exceptions import InvalidTileTable
from gridfia_ray.geo.cells import CellGrid
from gridfia_ray.kernels.base import Kernel, KernelContext
from gridfia_ray.pipelines.common import GridSpec, cluster_cpus
from gridfia_ray.stages.assemble import RESULT_COLUMNS


def aligned_layout(tiles_dir) -> dict | None:
    """Probe a path for the aligned layout: a directory of per-species
    parquet files with identical row counts and row-group structure.
    Returns {files, codes, n_rows, n_row_groups} or None."""
    import pyarrow.parquet as pq

    if not isinstance(tiles_dir, str) or not os.path.isdir(tiles_dir):
        return None
    files = sorted(glob.glob(os.path.join(tiles_dir, "*.parquet")))
    if len(files) < 1:
        return None
    # only the engine's own per-species layout qualifies: part-{code}.parquet
    if any(not os.path.basename(f).startswith("part-") for f in files):
        return None
    readers = [pq.ParquetFile(f) for f in files]
    metas = [r.metadata for r in readers]
    n_rows = metas[0].num_rows
    n_rgs = metas[0].num_row_groups
    if any(m.num_rows != n_rows or m.num_row_groups != n_rgs for m in metas):
        return None
    codes = [os.path.basename(f)[len("part-") : -len(".parquet")] for f in files]
    if any(not c for c in codes):
        return None
    # cross-check each filename code against the image_id prefix of the
    # file's first row — a directory of equal-shaped files with other
    # content must NOT be silently treated as an aligned store
    for r, code in zip(readers, codes):
        try:
            first = next(r.iter_batches(batch_size=1, columns=["image_id"]))
        except Exception:
            return None
        if first.num_rows == 0 or first["image_id"][0].as_py().split("/", 1)[0] != code:
            return None
    return {"files": files, "codes": codes, "n_rows": n_rows, "n_row_groups": n_rgs}


class AlignedStackRunner:
    """Reads one row group from every species file, validates alignment,
    assembles per-tile stacks and runs the kernel chain — all in one
    task. Parquet handles are per-actor state."""

    def __init__(
        self,
        files: list[str],
        codes: list[str],
        kernels: list[Kernel],
        ctx: KernelContext,
        spec: GridSpec,
        include_total: bool,
    ):
        import pyarrow.parquet as pq

        order = np.argsort(codes, kind="stable")  # catalog order = sorted codes
        self.codes = [codes[i] for i in order]
        self.files = [files[i] for i in order]
        if not include_total and "0000" in self.codes:
            ti = self.codes.index("0000")
            self.codes.pop(ti)
            self.files.pop(ti)
        self.readers = [pq.ParquetFile(f) for f in self.files]
        self.kernels = kernels  # instances travel whole (incl. precise-dtype overrides)
        # float64 math only when some kernel demands float64 outputs
        # (the oracle-precise mode); production matches the reference's
        # float32 arithmetic and halves memory traffic
        self.math_dtype = (
            np.float64
            if any(np.dtype(k.output_dtype) == np.float64 for k in kernels)
            else np.float32
        )
        self.ctx = ctx
        self.grid = CellGrid(spec.origin_x, spec.origin_y, spec.cell_size)

    def __call__(self, batch: pa.Table) -> pd.DataFrame:
        out: dict[str, list] = {c: [] for c in RESULT_COLUMNS}
        for rg in batch["row_group"].to_pylist():
            self._run_row_group(int(rg), out)
        return pd.DataFrame(out)

    def _run_row_group(self, rg: int, out: dict) -> None:
        cols = ["image_id", "bytes", "w", "h", "fmt", "caption"]
        tables = [r.read_row_group(rg, columns=cols) for r in self.readers]
        n = tables[0].num_rows
        # alignment check: same tile position per row across species
        pos0 = [i.split("/", 1)[1] for i in tables[0]["image_id"].to_pylist()]
        for t in tables[1:]:
            pos = [i.split("/", 1)[1] for i in t["image_id"].to_pylist()]
            if pos != pos0:
                raise InvalidTileTable("species files are not row-aligned")
        hs = tables[0]["h"].to_numpy()
        ws = tables[0]["w"].to_numpy()
        captions = tables[0]["caption"].to_pylist()
        # decode every species' row group: (S, n, h, w) float32
        stacks: list[np.ndarray] = []
        for t in tables:
            fmts = t["fmt"].to_pylist()
            payloads = t["bytes"].to_pylist()
            if all(f == "raw-f32" for f in fmts) and (hs == hs[0]).all() and (ws == ws[0]).all():
                arr = np.frombuffer(b"".join(payloads), dtype="<f4").reshape(
                    n, int(hs[0]), int(ws[0])
                )
            else:
                metas = [json.loads(c) for c in t["caption"].to_pylist()]
                arr = np.stack(
                    [
                        decode_tile(payloads[i], fmts[i], int(hs[i]), int(ws[i]), metas[i])
                        for i in range(n)
                    ]
                )
            stacks.append(arr)
        codes = np.asarray(self.codes)
        for i in range(n):
            meta = json.loads(captions[i])
            tf = meta.get("transform", [0.0, 1.0, 0.0, 0.0, 0.0, -1.0])
            h, w = int(hs[i]), int(ws[i])
            cx = tf[0] + w * tf[1] / 2.0
            cy = tf[3] + h * tf[5] / 2.0
            cell_id = int(self.grid.cell_id(np.asarray([cx]), np.asarray([cy]))[0])
            stack = np.stack([s[i] for s in stacks]).astype(self.math_dtype)
            for k in self.kernels:
                try:
                    res = k.calculate(stack, codes, self.ctx)
                    res = np.ascontiguousarray(res, dtype=np.dtype(k.output_dtype))
                    status = "ok"
                except Exception as exc:
                    res = np.full((h, w), k.fill_value(), dtype=np.dtype(k.output_dtype))
                    status = f"failed:{type(exc).__name__}"
                out["cell_id"].append(cell_id)
                out["tile_row"].append(int(meta.get("tile_row", 0)))
                out["tile_col"].append(int(meta.get("tile_col", 0)))
                out["metric"].append(k.name)
                out["units"].append(k.units)
                out["dtype"].append(res.dtype.str)
                out["h"].append(h)
                out["w"].append(w)
                out["pix"].append(res.tobytes())
                out["status"].append(status)


def aligned_run_metrics(
    layout: dict,
    kernels: list[Kernel],
    spec: GridSpec,
    ctx: KernelContext,
    include_total: bool,
    concurrency=None,
) -> rd.Dataset:
    """Zero-shuffle metrics over an aligned store: Dataset of row-group
    indices → AlignedStackRunner actor pool → result-tile rows."""
    # one BLOCK per work item: Ray Data schedules per block, so a single
    # block would serialize the whole pool onto one actor
    from gridfia_ray.stages.worker_state import worker_cached

    items = [{"row_group": i} for i in range(layout["n_row_groups"])]
    work = rd.from_items(items, override_num_blocks=len(items))
    return work.map_batches(
        worker_cached(
            AlignedStackRunner,
            files=layout["files"],
            codes=layout["codes"],
            kernels=kernels,
            ctx=ctx,
            spec=spec,
            include_total=include_total,
        ),
        batch_format="pyarrow",
        batch_size=1,
        num_cpus=1,
    )
