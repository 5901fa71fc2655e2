"""DSIR-style data selection — importance weights via hashed unigram
distributions (Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling"): score every raw document by how much more
likely its hashed-feature bag is under the TARGET distribution than
under the RAW distribution,

    w(d) = Σ_b k_b(d) · [ ln p_t(b) − ln p_r(b) ]

with features hashed into ``B = 4096`` buckets (md5 3-hex-char prefix —
reproducible in ANSI SQL) and add-one smoothing over buckets,
``p(b) = (cnt_b + 1) / (T + B)``. High-weight docs are the ones to keep
when up-sampling toward the target domain; selection composes with
``pipelines/sampling.grouped_topk`` or a weight threshold downstream.

Exactness: each bucket's two log terms are quantized to integer
micro-nats SEPARATELY (``floor(1e6·ln(·) + 0.5)``) before the
difference and the k-weighted sum, so weights are order-free int64
arithmetic, bit-exact across partitionings and vs the SQL oracle.

Scale shape — hashing exists precisely to make the model SMALL: one
combiner pass folds the corpus to ≤ B per-bucket counts for each side
(tiny groupby → 2×B ints at the driver), the per-bucket log-ratio
array broadcasts to every scorer, and scoring is a PURE MAP (no second
exchange at all). 10¹² docs stream through two linear passes."""

from __future__ import annotations

import hashlib
import re
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

_WS = re.compile(r"\S+")
N_BUCKETS = 4096  # md5 3-hex-char prefix
_PREFIX = 3


def _bucket_counts(texts: list, out: np.ndarray) -> np.ndarray:
    """Accumulate hashed-unigram bucket counts for a list of texts."""
    for t in texts:
        for tok in _WS.findall(t or ""):
            b = int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:_PREFIX], 16)
            out[b] += 1
    return out


def train_dsir(
    docs: rd.Dataset,
    target_filter: str = "en",
    target_col: str = "lang",
    text_col: str = "text",
) -> np.ndarray:
    """Per-bucket micro-nat log-ratio array ``delta[B]`` (int64):
    quantized ln p_target(b) − quantized ln p_raw(b). One combiner pass;
    only 2·B integers ever leave the workers."""

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        labels = batch[target_col].to_pylist()
        raw = _bucket_counts(texts, np.zeros(N_BUCKETS, np.int64))
        tgt = _bucket_counts(
            [t for t, lab in zip(texts, labels) if lab == target_filter],
            np.zeros(N_BUCKETS, np.int64),
        )
        nz = np.flatnonzero(raw)
        return pa.table(
            {
                "b": pa.array(nz, pa.int64()),
                "n_raw": pa.array(raw[nz], pa.int64()),
                "n_tgt": pa.array(tgt[nz], pa.int64()),
            }
        )

    agg = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("b")
        .sum(["n_raw", "n_tgt"])
        .to_pandas()
    )
    raw = np.zeros(N_BUCKETS, np.int64)
    tgt = np.zeros(N_BUCKETS, np.int64)
    raw[agg["b"].to_numpy(np.int64)] = agg["sum(n_raw)"].to_numpy(np.int64)
    tgt[agg["b"].to_numpy(np.int64)] = agg["sum(n_tgt)"].to_numpy(np.int64)
    t_raw, t_tgt = int(raw.sum()), int(tgt.sum())
    if t_tgt == 0:
        raise ValueError(
            f"train_dsir: the target slice ({target_col} == "
            f"{target_filter!r}) produced no tokens"
        )
    lp_t = np.floor(
        1e6 * np.log((tgt + 1.0) / (t_tgt + N_BUCKETS)) + 0.5
    ).astype(np.int64)
    lp_r = np.floor(
        1e6 * np.log((raw + 1.0) / (t_raw + N_BUCKETS)) + 0.5
    ).astype(np.int64)
    return lp_t - lp_r


def score_dsir(
    docs: rd.Dataset, delta: np.ndarray, text_col: str = "text"
) -> rd.Dataset:
    """Per-doc (doc_id, n_toks, w_c) — a pure map over the broadcast
    B-int log-ratio array. Zero-token docs emit no row (no evidence)."""
    if delta.shape != (N_BUCKETS,):
        raise ValueError(f"score_dsir: delta must be ({N_BUCKETS},)")
    d = np.ascontiguousarray(delta, np.int64)

    def score(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        out_id, out_n, out_w = [], [], []
        for i, t in enumerate(batch[text_col].to_pylist()):
            toks = _WS.findall(t or "")
            if not toks:
                continue
            c = Counter(
                int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:_PREFIX], 16)
                for tok in toks
            )
            bs = np.fromiter(c.keys(), np.int64, len(c))
            ks = np.fromiter(c.values(), np.int64, len(c))
            out_id.append(int(ids[i]))
            out_n.append(int(ks.sum()))
            out_w.append(int((ks * d[bs]).sum()))
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "n_toks": pa.array(out_n, pa.int64()),
                "w_c": pa.array(out_w, pa.int64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")


def dsir_weights(
    docs: rd.Dataset,
    target_filter: str = "en",
    target_col: str = "lang",
    text_col: str = "text",
) -> pd.DataFrame:
    """End-to-end: estimate the hashed target/raw distributions, weight
    every ≥1-token document. Returns (doc_id, n_toks, w_c) sorted."""
    delta = train_dsir(docs, target_filter, target_col, text_col)
    out = score_dsir(docs, delta, text_col).to_pandas()
    for c in ("doc_id", "n_toks", "w_c"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("doc_id", ignore_index=True)
