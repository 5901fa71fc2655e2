"""Int8 embedding quantization — the storage/shuffle scale lever.

A float32 embedding column is the dominant byte cost of every ANN
stage; symmetric per-vector int8 quantization (public faiss-style SQ8
scheme: scale = max|x| / 127 per vector) cuts it 4× with ~0.2% cosine
error at d=64 — far below ANN ranking noise. Stages:

* ``quantize_batch``   — map_batches stage: ``embedding`` (list<float>)
  → ``q8`` (fixed-size binary, d bytes, built from the int8 matrix's
  buffer without per-row Python) + ``q_scale`` (float32);
* ``dequantize_batch`` — inverse: one ``np.frombuffer`` over the
  fixed-size-binary data buffer → (n, d) floats → ``embedding``;
* ``build_ivf_index(..., quantize="int8")`` stores q8+q_scale instead
  of the float vectors — a 100 TB embedding corpus indexes into 25 TB
  — and ``search_ivf_index`` dequantizes during the probed-cell read
  (``restore_cell``), upstream of the scorer.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from gridfia_ray.ann.search import _as_matrix


def quantize_vecs(vecs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(n, d) floats → (n, d) int8 + (n,) float32 scales."""
    scale = np.abs(vecs).max(axis=1) / 127.0
    scale[scale == 0] = 1.0
    q = np.clip(np.round(vecs / scale[:, None]), -127, 127).astype(np.int8)
    return q, scale.astype(np.float32)


def dequantize(q: np.ndarray, scale: np.ndarray) -> np.ndarray:
    return q.astype(np.float32) * scale[:, None]


def quantize_batch(batch: pa.Table) -> pa.Table:
    """Replace ``embedding`` with ``q8`` + ``q_scale`` (keeps all other
    columns). ``q8`` is fixed-size binary built straight from the int8
    matrix buffer — no per-row Python objects."""
    vecs = _as_matrix(batch["embedding"])
    q, scale = quantize_vecs(vecs)
    n, d = q.shape
    q8 = pa.FixedSizeBinaryArray.from_buffers(
        pa.binary(d), n, [None, pa.py_buffer(np.ascontiguousarray(q).tobytes())]
    )
    out = batch.drop_columns(["embedding"])
    out = out.append_column("q8", q8)
    return out.append_column("q_scale", pa.array(scale, pa.float32()))


def dequantize_batch(batch: pa.Table) -> pa.Table:
    """Inverse stage: ``q8``/``q_scale`` → ``embedding`` list<float>.
    One ``np.frombuffer`` over the fixed-size-binary data buffer."""
    n = batch.num_rows
    if n == 0:
        return batch
    col = batch["q8"].combine_chunks()
    d = col.type.byte_width
    q = np.frombuffer(
        col.buffers()[1], dtype=np.int8, count=n * d, offset=col.offset * d
    ).reshape(n, d)
    scale = batch["q_scale"].to_numpy()
    vecs = dequantize(q, scale)
    flat = pa.array(vecs.reshape(-1), pa.float32())
    emb = pa.FixedSizeListArray.from_arrays(flat, d)
    return batch.drop_columns(["q8", "q_scale"]).append_column("embedding", emb)
