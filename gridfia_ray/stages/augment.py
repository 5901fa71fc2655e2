"""Deterministic geometric augmentation + patch extraction over result
tiles — the vision-training-data stages of the raster plane.

Both are PURE ``map_batches``: the tile-aligned layout makes global
geometric transforms shuffle-free. A 90° rotation of the whole raster
is (a) rotate each tile's array in place and (b) move the tile to its
rotated grid address — tile keys are remapped arithmetically, no pixel
ever crosses a task boundary. The same holds for flips and transpose.
(The reference has no augmentation ops; this extends SURVEY §2.2's
per-batch map family with the standard training-augmentation set.)

Patch extraction (``patchify_result_tiles``) cuts each tile into
non-overlapping ``P×P`` patches and emits one row per patch with exact
micro-scaled statistics (n/sum/min/max) — the ViT-style pre-tokenizer
summary, bit-exact against a SQL ``GROUP BY y//P, x//P`` oracle. Patch
ids are global (patch_row = y//P), so downstream samplers can join
patches across tiles without knowing the tile grid.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

# op -> (needs_square_tiles, tile array transform, tile key remap)
# key remap signature: (tr, tc, grid_rows, grid_cols) -> (tr', tc')
_OPS = {
    # 90° clockwise: out[x, H-1-y] = in[y, x]
    "rot90cw": (True, lambda a: np.rot90(a, k=-1), lambda tr, tc, gr, gc: (tc, gr - 1 - tr)),
    # 90° counter-clockwise: out[W-1-x, y] = in[y, x]
    "rot90ccw": (True, lambda a: np.rot90(a, k=1), lambda tr, tc, gr, gc: (gc - 1 - tc, tr)),
    "rot180": (False, lambda a: a[::-1, ::-1], lambda tr, tc, gr, gc: (gr - 1 - tr, gc - 1 - tc)),
    "fliplr": (False, lambda a: a[:, ::-1], lambda tr, tc, gr, gc: (tr, gc - 1 - tc)),
    "flipud": (False, lambda a: a[::-1, :], lambda tr, tc, gr, gc: (gr - 1 - tr, tc)),
    "transpose": (True, lambda a: a.T, lambda tr, tc, gr, gc: (tc, tr)),
}


def augment_result_tiles(
    result: rd.Dataset, op: str, grid_rows: int, grid_cols: int
) -> rd.Dataset:
    """Apply one named global geometric transform to a result-tile
    raster. Zero shuffle: per-tile array transform + arithmetic tile
    key remap. Rotations/transpose require square tiles (h == w) so the
    transformed tiles still tile the rotated grid — raises otherwise."""
    if op not in _OPS:
        raise ValueError(f"unknown augmentation {op!r}; one of {sorted(_OPS)}")
    needs_square, arr_fn, key_fn = _OPS[op]

    def apply(batch: pa.Table) -> pa.Table:
        metrics, trs, tcs, hs, ws, pixs, dts = [], [], [], [], [], [], []
        for i in range(batch.num_rows):
            h = int(batch["h"][i].as_py())
            w = int(batch["w"][i].as_py())
            if needs_square and h != w:
                raise ValueError(
                    f"augmentation {op!r} needs square tiles, got {h}x{w} — "
                    "a rotated rectangular tile would not fit the grid"
                )
            dt = np.dtype(batch["dtype"][i].as_py())
            arr = np.frombuffer(batch["pix"][i].as_py(), dtype=dt).reshape(h, w)
            out = np.ascontiguousarray(arr_fn(arr))
            tr, tc = key_fn(
                int(batch["tile_row"][i].as_py()),
                int(batch["tile_col"][i].as_py()),
                grid_rows,
                grid_cols,
            )
            metrics.append(batch["metric"][i].as_py())
            trs.append(tr)
            tcs.append(tc)
            hs.append(out.shape[0])
            ws.append(out.shape[1])
            pixs.append(out.tobytes())
            dts.append(str(dt))
        return pa.table(
            {
                "metric": pa.array(metrics, pa.string()),
                "tile_row": pa.array(trs, pa.int64()),
                "tile_col": pa.array(tcs, pa.int64()),
                "h": pa.array(hs, pa.int64()),
                "w": pa.array(ws, pa.int64()),
                "pix": pa.array(pixs, pa.binary()),
                "dtype": pa.array(dts, pa.string()),
            }
        )

    return result.map_batches(apply, batch_format="pyarrow")


def patchify_result_tiles(result: rd.Dataset, patch: int) -> rd.Dataset:
    """Non-overlapping ``patch×patch`` extraction with exact µ-scaled
    per-patch statistics: one row per patch —
    (metric, patch_row, patch_col, n_px, sum_u, min_u, max_u).
    ``patch`` must divide every tile edge (raises otherwise — a partial
    edge patch would silently change the summary semantics). Float
    tiles are µ-scaled per pixel before reduction, so sums are bit-exact
    and partition-invariant."""
    if patch < 1:
        raise ValueError(f"patch must be >= 1, got {patch}")

    def cut(batch: pa.Table) -> pa.Table:
        mets, prs, pcs, ns, sums, mins, maxs = [], [], [], [], [], [], []
        for i in range(batch.num_rows):
            h = int(batch["h"][i].as_py())
            w = int(batch["w"][i].as_py())
            if h % patch or w % patch:
                raise ValueError(
                    f"patch {patch} does not divide tile {h}x{w} — "
                    "partial edge patches are not supported"
                )
            dt = np.dtype(batch["dtype"][i].as_py())
            arr = np.frombuffer(batch["pix"][i].as_py(), dtype=dt).reshape(h, w)
            if np.issubdtype(dt, np.integer):
                u = arr.astype(np.int64)
            else:
                u = np.floor(arr.astype(np.float64) * 1_000_000 + 0.5).astype(
                    np.int64
                )
            blocks = u.reshape(h // patch, patch, w // patch, patch)
            s = blocks.sum(axis=(1, 3))
            mn = blocks.min(axis=(1, 3))
            mx = blocks.max(axis=(1, 3))
            tr = int(batch["tile_row"][i].as_py())
            tc = int(batch["tile_col"][i].as_py())
            prr, pcc = np.meshgrid(
                np.arange(h // patch) + tr * (h // patch),
                np.arange(w // patch) + tc * (w // patch),
                indexing="ij",
            )
            k = s.size
            mets.extend([batch["metric"][i].as_py()] * k)
            prs.append(prr.ravel())
            pcs.append(pcc.ravel())
            ns.append(np.full(k, patch * patch, np.int64))
            sums.append(s.ravel())
            mins.append(mn.ravel())
            maxs.append(mx.ravel())
        cat = lambda xs: np.concatenate(xs) if xs else np.array([], np.int64)  # noqa: E731
        return pa.table(
            {
                "metric": pa.array(mets, pa.string()),
                "patch_row": pa.array(cat(prs), pa.int64()),
                "patch_col": pa.array(cat(pcs), pa.int64()),
                "n_px": pa.array(cat(ns), pa.int64()),
                "sum_u": pa.array(cat(sums), pa.int64()),
                "min_u": pa.array(cat(mins), pa.int64()),
                "max_u": pa.array(cat(maxs), pa.int64()),
            }
        )

    return result.map_batches(cut, batch_format="pyarrow")
