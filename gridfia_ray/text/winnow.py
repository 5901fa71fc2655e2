"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
SIGMOD 2003 — the MOSS local fingerprinting algorithm): hash every
character ``k``-gram, slide a window of ``w`` consecutive hashes, and
select each window's MINIMUM hash (ties → the RIGHTMOST occurrence,
the robust-winnowing rule); the de-duplicated selected (position, hash)
set is the document's fingerprint. Guarantees: any shared substring of
length ≥ w + k − 1 yields at least one shared fingerprint, and the
density is ~2/(w+1) — the local-selection property that makes
fingerprints comparable across documents without alignment.

Hash = md5 hex of the k-gram (lexicographic hex order, identical in
Python and SQL), positions 1-based. Documents shorter than ``k`` chars
emit nothing; documents with fewer than ``w`` k-grams winnow their
single truncated window. Pure map — each document fingerprints
independently, no shuffle; cross-document matching is a downstream
``groupby(h)``.

Vectorization: per doc the hex hashes map to dense ranks
(``np.unique`` — lexicographic, the md5 comparison order), the sliding
window runs as a strided (m−w+1, w) int view, and the rightmost-min
rule is ``argmin`` over the REVERSED window columns (first min of the
reverse = last min of the window)."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def _fingerprint_doc(text: str, k: int, w: int) -> "tuple[list[int], list[str]]":
    """Selected (1-based position, hex hash) pairs for one document."""
    m = len(text) - k + 1
    if m < 1:
        return [], []
    hexes = [
        hashlib.md5(text[i : i + k].encode("utf-8")).hexdigest() for i in range(m)
    ]
    arr = np.array(hexes)
    uniq, ranks = np.unique(arr, return_inverse=True)
    n_windows = max(1, m - w + 1)
    ww = min(w, m)
    # strided (n_windows, ww) view over the rank vector
    win = np.lib.stride_tricks.sliding_window_view(ranks[: n_windows + ww - 1], ww)
    rev = win[:, ::-1]
    j = rev.argmin(axis=1)  # first min of the reverse = rightmost min
    pos = np.arange(n_windows) + (ww - 1 - j)  # 0-based selected positions
    sel = np.unique(pos)
    return (sel + 1).tolist(), [hexes[p] for p in sel.tolist()]


def winnow_fingerprints(
    docs: rd.Dataset, k: int = 8, w: int = 4, text_col: str = "text"
) -> rd.Dataset:
    """(doc_id, pos, h) fingerprint rows for every document — the
    winnowed k-gram selection, one row per selected position."""
    if k < 1 or w < 1:
        raise ValueError("winnow_fingerprints: k and w must be >= 1")

    def fp(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        out_d, out_p, out_h = [], [], []
        for i, t in enumerate(batch[text_col].to_pylist()):
            ps, hs = _fingerprint_doc(t or "", k, w)
            out_d.extend([int(ids[i])] * len(ps))
            out_p.extend(ps)
            out_h.extend(hs)
        return pa.table(
            {
                "doc_id": pa.array(out_d, pa.int64()),
                "pos": pa.array(out_p, pa.int64()),
                "h": pa.array(out_h, pa.string()),
            }
        )

    return docs.map_batches(fp, batch_format="pyarrow")


def winnow_matches(
    docs: rd.Dataset, k: int = 8, w: int = 4, text_col: str = "text",
    n_buckets: int = 32,
) -> rd.Dataset:
    """Cross-document fingerprint matches: (h, doc_a, doc_b, pos_a,
    pos_b) for every pair of documents sharing a fingerprint hash —
    one hash-bucketed exchange over the fingerprint rows; a shared
    hash whose doc set is a hot key costs its own pairs only
    (plagiarism-style matching emits O(true matches))."""
    from gridfia_ray.stages.agg_util import bucketed_bucket_map

    fps = winnow_fingerprints(docs, k, w, text_col)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {"h": pd.Series(dtype=str),
                 "doc_a": pd.Series(dtype=np.int64),
                 "doc_b": pd.Series(dtype=np.int64),
                 "pos_a": pd.Series(dtype=np.int64),
                 "pos_b": pd.Series(dtype=np.int64)}
            )
        m = g.merge(g, on="h", suffixes=("_a", "_b"))
        m = m[m["doc_id_a"] < m["doc_id_b"]]
        return m.rename(
            columns={"doc_id_a": "doc_a", "doc_id_b": "doc_b"}
        )[["h", "doc_a", "doc_b", "pos_a", "pos_b"]]

    out_schema = pa.schema(
        [("h", pa.string()), ("doc_a", pa.int64()), ("doc_b", pa.int64()),
         ("pos_a", pa.int64()), ("pos_b", pa.int64())]
    )
    return bucketed_bucket_map(
        fps, ["h"], per_bucket, n_buckets=n_buckets, out_schema=out_schema
    )
