"""Decode stage: tile payload bytes → pixel arrays + parsed metadata.

The T1 stateful stage (SURVEY.md §2.3): the reference holds
rasterio/GDAL handles per process (``gridfia/external/fia_client.py:
560-562``); here the per-actor state is the codec dispatch plus the cell
grid, and the class is used as an actor pool:

    ds.map_batches(DecoderActor, fn_constructor_kwargs={...},
                   batch_format="pyarrow", concurrency=N, batch_size=B)

Input  schema: image_id, bytes, w, h, fmt, caption(JSON), phash
Output schema: image_id, species_code, tile_row, tile_col, cell_id,
               h, w, x0, y0, px_w, px_h, pix (raw little-endian f32),
               phash, status

The decoded pixels stay a *binary column* (zero-copy Arrow buffers
through the object store); kernels reinterpret with ``np.frombuffer`` —
no per-pixel Python objects anywhere.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from gridfia_ray.codecs.phash import average_phash64
from gridfia_ray.codecs.registry import decode_tile
from gridfia_ray.geo.cells import CellGrid

DECODED_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("species_code", pa.string()),
        ("tile_row", pa.int32()),
        ("tile_col", pa.int32()),
        ("cell_id", pa.int64()),
        ("h", pa.int32()),
        ("w", pa.int32()),
        ("x0", pa.float64()),
        ("y0", pa.float64()),
        ("px_w", pa.float64()),
        ("px_h", pa.float64()),
        ("pix", pa.binary()),
        ("phash", pa.int64()),
        ("status", pa.string()),
    ]
)


class DecoderActor:
    """Stateful decoder; one instance per pool actor."""

    def __init__(
        self,
        origin_x: float,
        origin_y: float,
        cell_size: float,
        verify_phash: bool = False,
        clamp_negative: bool = False,
    ):
        self.grid = CellGrid(origin_x, origin_y, cell_size)
        self.verify_phash = verify_phash
        # M20: the reference zeroes negative sentinels at ingest
        # (gridfia/examples/utils.py:320-322, ``data[data < 0] = 0``)
        self.clamp_negative = clamp_negative

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        image_id = batch["image_id"].to_pylist()
        payloads = batch["bytes"].to_pylist()
        ws = batch["w"].to_numpy()
        hs = batch["h"].to_numpy()
        fmts = batch["fmt"].to_pylist()
        captions = batch["caption"].to_pylist()
        phashes = batch["phash"].to_numpy()

        sp_codes: list[str] = []
        t_rows = np.zeros(n, dtype=np.int32)
        t_cols = np.zeros(n, dtype=np.int32)
        x0 = np.zeros(n, dtype=np.float64)
        y0 = np.zeros(n, dtype=np.float64)
        pxw = np.zeros(n, dtype=np.float64)
        pxh = np.zeros(n, dtype=np.float64)
        pix: list[bytes] = []
        status: list[str] = []
        cx = np.zeros(n, dtype=np.float64)
        cy = np.zeros(n, dtype=np.float64)

        for i in range(n):
            meta = json.loads(captions[i])
            sp_codes.append(str(meta.get("species_code", "")))
            t_rows[i] = int(meta.get("tile_row", 0))
            t_cols[i] = int(meta.get("tile_col", 0))
            tf = meta.get("transform", [0.0, 1.0, 0.0, 0.0, 0.0, -1.0])
            x0[i], pxw[i], y0[i], pxh[i] = tf[0], tf[1], tf[3], tf[5]
            st = "ok"
            try:
                arr = decode_tile(payloads[i], fmts[i], int(hs[i]), int(ws[i]), meta)
                if self.verify_phash and average_phash64(arr) != int(phashes[i]):
                    st = "phash_mismatch"
                if self.clamp_negative:
                    arr = np.maximum(arr, 0)
                pix.append(np.ascontiguousarray(arr, dtype="<f4").tobytes())
            except Exception as exc:  # failed decode → sentinel row, run continues
                pix.append(b"")
                st = f"decode_error:{type(exc).__name__}"
            status.append(st)
            cx[i] = x0[i] + int(ws[i]) * pxw[i] / 2.0
            cy[i] = y0[i] + int(hs[i]) * pxh[i] / 2.0

        cell_id = self.grid.cell_id(cx, cy)
        return pa.Table.from_arrays(
            [
                pa.array(image_id, pa.string()),
                pa.array(sp_codes, pa.string()),
                pa.array(t_rows, pa.int32()),
                pa.array(t_cols, pa.int32()),
                pa.array(cell_id, pa.int64()),
                pa.array(hs.astype(np.int32), pa.int32()),
                pa.array(ws.astype(np.int32), pa.int32()),
                pa.array(x0),
                pa.array(y0),
                pa.array(pxw),
                pa.array(pxh),
                pa.array(pix, pa.binary()),
                pa.array(phashes.astype(np.int64), pa.int64()),
                pa.array(status, pa.string()),
            ],
            schema=DECODED_SCHEMA,
        )


def species_prefilter(codes_keep=None, codes_drop=None):
    """Vectorized pre-decode filter on the ``image_id`` prefix
    (``"{species_code}/{row}/{col}"``) — prunes rows *before* the
    expensive decode, the tabular analog of the reference's species
    selection at download (``fia_client.py:738-793``)."""
    import pyarrow.compute as pc

    def fn(batch: pa.Table) -> pa.Table:
        prefix = pc.utf8_slice_codeunits(
            pc.list_element(pc.split_pattern(batch["image_id"], "/"), 0), 0, 16
        )
        if codes_keep is not None:
            mask = pc.is_in(prefix, value_set=pa.array(list(codes_keep)))
        else:
            mask = pc.invert(pc.is_in(prefix, value_set=pa.array(list(codes_drop))))
        return batch.filter(mask)

    return fn
