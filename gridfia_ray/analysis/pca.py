"""Distributed PCA over an embedding column — the d×d second-moment
(Gram) matrix as a per-batch combiner, eigensolve on the driver.

The reference has no embedding surface at all; this serves the
LLM-data-plane uses the engine's ANN/semantic-dedup family needs:
whitening / dimensionality reduction before near-dup clustering
(SemDeDup preprocesses with PCA), variance auditing of an embedding
corpus, and cheap low-rank projection for downstream LSH.

Scale shape: PCA over n×d embeddings (n = 10^9+, d = 64..4096) never
moves a vector — each batch contributes one d×d int64 partial
``qᵀq`` plus a d-vector of sums and a count, all merged by ONE tiny
bucketed keyed sum (d² + d + 1 rows total regardless of n). The
eigensolve is O(d³) on d ≤ a few thousand: a driver-side numpy call on
a matrix that fits in L2 cache. Projection is a stateless vectorized
``map_batches`` against the broadcast (closure-captured, d×k) basis.

Exactness contract: embeddings quantize to ``q = floor(v·scale + 0.5)``
int64 (float64 math — float32 storage widens exactly), so the Gram
entries are order-free int64 sums reproducible bit-for-bit by an
ANSI-SQL oracle doing the identical quantization (DuckDB
``unnest``/``generate_subscripts`` lockstep + self-join). Only the
driver-side eigensolve is float; its inputs are exact integers.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

# n·qmax² must stay below 2^62 for the int64 partial sums; checked per
# batch against the running worst case rather than assumed
_I64_SAFE = 1 << 62


def _quantize(batch: pd.DataFrame, col: str, scale: int) -> np.ndarray:
    vecs = np.stack(batch[col].to_numpy())  # (b, d) float32/64
    return np.floor(vecs.astype(np.float64) * scale + 0.5).astype(np.int64)


def gram_matrix_int(
    ds: rd.Dataset,
    col: str = "embedding",
    scale: int = 1000,
    n_buckets: int = 8,
) -> rd.Dataset:
    """Exact int64 second-moment matrix of the quantized embeddings:
    rows (i, j, dot) for all d² index pairs, ``dot = Σ_rows q_i·q_j``.
    One streaming pass; each batch ships d² partial rows (bytes, not
    vectors), merged by one tiny bucketed sum."""
    from gridfia_ray.stages.agg_util import bucketed_agg

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return pd.DataFrame(
                {
                    "i": pd.Series(dtype=np.int64),
                    "j": pd.Series(dtype=np.int64),
                    "dot": pd.Series(dtype=np.int64),
                }
            )
        q = _quantize(batch, col, scale)
        qmax = int(np.abs(q).max())
        if qmax and len(q) * qmax * qmax > _I64_SAFE:
            raise ValueError(
                f"batch of {len(q)} rows with |q|max={qmax} risks int64 "
                f"overflow in the Gram partial — lower scale or batch size"
            )
        g = q.T @ q  # (d, d) int64
        d = g.shape[0]
        ii, jj = np.meshgrid(np.arange(d, dtype=np.int64), np.arange(d, dtype=np.int64))
        return pd.DataFrame(
            {"i": ii.T.ravel(), "j": jj.T.ravel(), "dot": g.ravel()}
        )

    return bucketed_agg(
        ds.map_batches(partial, batch_format="pandas"),
        ["i", "j"],
        {"dot": ("dot", "sum")},
        n_buckets=n_buckets,
    )


def moment_stats(
    ds: rd.Dataset, col: str = "embedding", scale: int = 1000, n_buckets: int = 8
) -> tuple[np.ndarray, np.ndarray, int]:
    """(gram d×d int64, colsum d int64, n) in ONE pass — the sufficient
    statistics of centered PCA. The driver folds d² + d + 1 rows (the
    provably-small-fold rule: bounded by the embedding width, never n).
    Encoded in one keyed stream: (i, j≥0) Gram cells, (i, -1) column
    sums, (-1, -1) the count."""
    from gridfia_ray.stages.agg_util import bucketed_agg

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return pd.DataFrame(
                {
                    "i": pd.Series(dtype=np.int64),
                    "j": pd.Series(dtype=np.int64),
                    "v": pd.Series(dtype=np.int64),
                }
            )
        q = _quantize(batch, col, scale)
        qmax = int(np.abs(q).max())
        if qmax and len(q) * qmax * qmax > _I64_SAFE:
            raise ValueError(
                f"batch of {len(q)} rows with |q|max={qmax} risks int64 "
                f"overflow in the Gram partial — lower scale or batch size"
            )
        g = q.T @ q
        d = g.shape[0]
        ii, jj = np.meshgrid(np.arange(d, dtype=np.int64), np.arange(d, dtype=np.int64))
        rows = [
            pd.DataFrame({"i": ii.T.ravel(), "j": jj.T.ravel(), "v": g.ravel()}),
            pd.DataFrame(
                {
                    "i": np.arange(d, dtype=np.int64),
                    "j": np.full(d, -1, np.int64),
                    "v": q.sum(axis=0),
                }
            ),
            pd.DataFrame(
                {
                    "i": np.asarray([-1], np.int64),
                    "j": np.asarray([-1], np.int64),
                    "v": np.asarray([len(q)], np.int64),
                }
            ),
        ]
        return pd.concat(rows, ignore_index=True)

    folded = (
        bucketed_agg(
            ds.map_batches(partial, batch_format="pandas"),
            ["i", "j"],
            {"v": ("v", "sum")},
            n_buckets=n_buckets,
        )
        .to_pandas()
        .astype({"i": np.int64, "j": np.int64, "v": np.int64})
    )
    n = int(folded.loc[(folded["i"] == -1) & (folded["j"] == -1), "v"].iloc[0])
    sums_rows = folded[(folded["j"] == -1) & (folded["i"] >= 0)]
    d = len(sums_rows)
    colsum = np.zeros(d, np.int64)
    colsum[sums_rows["i"].to_numpy()] = sums_rows["v"].to_numpy()
    gram = np.zeros((d, d), np.int64)
    cells = folded[(folded["i"] >= 0) & (folded["j"] >= 0)]
    gram[cells["i"].to_numpy(), cells["j"].to_numpy()] = cells["v"].to_numpy()
    return gram, colsum, n


def pca_fit(
    ds: rd.Dataset,
    col: str = "embedding",
    k: int = 8,
    scale: int = 1000,
    n_buckets: int = 8,
) -> dict:
    """Fit centered PCA from the one-pass moment statistics. Returns
    {components (k, d) float64 rows = descending-variance principal
    axes in ORIGINAL units, eigvals (k,) sample variances, mean (d,),
    n}. Deterministic up to the inherent sign ambiguity; signs are
    pinned so each component's largest-|coefficient| entry is
    positive."""
    gram, colsum, n = moment_stats(ds, col, scale, n_buckets)
    if n < 2:
        raise ValueError(f"pca_fit needs n >= 2 rows, got {n}")
    d = gram.shape[0]
    if not 1 <= k <= d:
        raise ValueError(f"k={k} out of range for d={d}")
    mean_q = colsum.astype(np.float64) / n
    cov = (gram.astype(np.float64) - n * np.outer(mean_q, mean_q)) / (n - 1)
    cov /= float(scale) ** 2  # back to original embedding units
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # (k, d)
    # pin signs: argmax |coef| positive (ties broken by lowest index —
    # np.argmax is first-match, so deterministic)
    for r in range(comps.shape[0]):
        if comps[r, np.argmax(np.abs(comps[r]))] < 0:
            comps[r] = -comps[r]
    return {
        "components": comps,
        "eigvals": evals[order],
        "mean": mean_q / scale,
        "n": n,
    }


def pca_project(
    ds: rd.Dataset,
    model: dict,
    col: str = "embedding",
    out_col: str = "pc",
) -> rd.Dataset:
    """Project every embedding onto the fitted basis: one stateless
    vectorized map (the k×d basis rides the closure — kilobytes
    broadcast once per task, never reshipped per row)."""
    comps = np.ascontiguousarray(model["components"], np.float64)
    mean = np.ascontiguousarray(model["mean"], np.float64)

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.drop(columns=[col]).copy()
        if len(batch) == 0:
            out[out_col] = pd.Series(dtype=object)
            return out
        vecs = np.stack(batch[col].to_numpy()).astype(np.float64)
        proj = (vecs - mean) @ comps.T  # (b, k)
        out[out_col] = list(proj)
        return out

    return ds.map_batches(project, batch_format="pandas")
