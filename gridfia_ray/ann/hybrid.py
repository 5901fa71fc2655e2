"""Hybrid retrieval: integer-exact max-inner-product search fused with
BM25 by reciprocal-rank fusion (RRF, Cormack et al. 2009).

The standard retrieval stack for LLM training-data curation and RAG
corpus prep runs a lexical ranker and a dense ranker side by side and
fuses the two rank lists; the GridFIA reference has no retrieval path
(text/embeddings are brief additions), so the shape here is Ray-Data
native end to end:

* ``mips_topk_int`` — exact brute-force top-k by QUANTIZED inner
  product: each vector component maps to ``floor(v·2^20 + 0.5)`` as
  int64 (float32 → float64 → one round-half-up, reproducible by an
  ANSI-SQL oracle doing the identical arithmetic), scores are pure
  int64 dot products, so ranking has no float tie ambiguity anywhere.
  Same combiner shape as ``ann.search.topk_cosine``: the quantized
  query matrix broadcasts once per worker, every batch emits only its
  local top-k per query under the GLOBAL total order (dot desc, vec_id
  asc) — per-batch top-k under a total order is exactly the global
  top-k's superset — and a tiny groupby folds O(batches · q · k) rows.
* ``rrf_fuse`` — scores each candidate ``Σ_lists SCALE // (k_rrf +
  rank)`` in integer micro-units (SCALE = 10^6, k_rrf = 60 per the
  original paper); candidates appearing in one list only get that
  list's contribution. Driver-side over Q · k_each · n_lists rows —
  bounded by construction, never by data size.
* ``hybrid_topk`` — BM25 top-k_each (integer milli-nat scorer,
  text/bm25.py) ∥ MIPS top-k_each, then RRF top-k.

int64 headroom: |v| < 2 ⇒ |q(v)| < 2^21; a 64-dim dot is < 64·2^42 =
2^48. ``mips_topk_int`` checks the bound against the actual dim and
raises rather than wrap.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from gridfia_ray.ann.search import _as_matrix

Q_SCALE = 1 << 20
RRF_SCALE = 1_000_000


def quantize_embeddings(vecs: np.ndarray) -> np.ndarray:
    """float matrix → int64 via round-half-up at 2^20, the repo-wide
    quantizer convention (floor(x·S + 0.5) after a float64 promotion —
    what DuckDB's FLOOR(col * 1048576.0 + 0.5) computes on a FLOAT)."""
    return np.floor(np.asarray(vecs, dtype=np.float64) * Q_SCALE + 0.5).astype(np.int64)


class _MipsScorer:
    """Per-batch exact scorer: batch-local top-k per query by
    (quantized-dot desc, vec_id asc) — int64 throughout."""

    def __init__(
        self,
        queries_q: np.ndarray,
        query_ids: list[int],
        k: int,
        exclude_ids: list[int],
    ):
        self.qm = np.asarray(queries_q, dtype=np.int64)
        self.query_ids = [int(q) for q in query_ids]
        self.k = int(k)
        self.exclude = np.asarray(sorted(exclude_ids), dtype=np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy()
        vq = quantize_embeddings(_as_matrix(batch["embedding"]))
        keep = ~np.isin(ids, self.exclude)
        ids, vq = ids[keep], vq[keep]
        out_q, out_v, out_s = [], [], []
        if len(ids):
            dots = vq @ self.qm.T  # (n, q) int64 — exact
            k = min(self.k, len(ids))
            for qi, qid in enumerate(self.query_ids):
                # exact total order (dot desc, vec_id asc); k << n so a
                # full lexsort of the 4k-row batch is noise
                order = np.lexsort((ids, -dots[:, qi]))[:k]
                out_q.extend([qid] * len(order))
                out_v.extend(ids[order].tolist())
                out_s.extend(dots[order, qi].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "doc_id": pa.array(out_v, pa.int64()),
                "dot_c": pa.array(out_s, pa.int64()),
            }
        )


def _query_matrix(embeddings: rd.Dataset, query_ids: list[int]) -> np.ndarray:
    """Pull the |query_ids| query vectors (bounded by construction:
    vec_id is the table key) in id order."""
    qset = sorted({int(q) for q in query_ids})
    want = np.asarray(qset, dtype=np.int64)

    def pick(batch: pa.Table) -> pa.Table:
        mask = np.isin(batch["vec_id"].to_numpy(), want)
        return batch.filter(pa.array(mask))

    rows = embeddings.map_batches(pick, batch_format="pyarrow").take_all()
    if len(rows) != len(qset):
        raise ValueError(
            f"mips: found {len(rows)} of {len(qset)} query vectors"
        )
    by_id = {int(r["vec_id"]): np.asarray(r["embedding"], dtype=np.float64) for r in rows}
    return np.stack([by_id[q] for q in qset])


def mips_topk_int(
    embeddings: rd.Dataset,
    query_ids: list[int],
    k: int = 10,
    queries: np.ndarray | None = None,
) -> pd.DataFrame:
    """Exact global top-k per query by quantized inner product.

    Returns (query_id, doc_id, dot_c, rank), rank 1-based per query,
    query vectors themselves excluded from the candidates. ``queries``
    overrides the default pull-from-the-table (rows with ``vec_id`` in
    ``query_ids``)."""
    from gridfia_ray.stages.worker_state import worker_cached

    qids = sorted(int(q) for q in query_ids)
    qm = quantize_embeddings(
        _query_matrix(embeddings, qids) if queries is None else np.asarray(queries)
    )
    dim = qm.shape[1]
    # |dot| < n_dim · (max|q|+1)^2 must stay inside int64
    bound = dim * float(np.max(np.abs(qm)) + Q_SCALE) ** 2
    if bound >= 2**63:
        raise ValueError(f"mips: int64 overflow risk at dim={dim}; rescale Q_SCALE")

    partials = embeddings.map_batches(
        worker_cached(_MipsScorer, queries_q=qm, query_ids=qids, k=k, exclude_ids=qids),
        batch_format="pyarrow",
        batch_size=4096,
        num_cpus=1,
    )

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["dot_c", "doc_id"], ascending=[False, True], kind="mergesort").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    out = (
        partials.groupby("query_id").map_groups(final_topk, batch_format="pandas").to_pandas()
    )
    out = out.astype(
        {"query_id": np.int64, "doc_id": np.int64, "dot_c": np.int64, "rank": np.int64}
    )
    return out.sort_values(["query_id", "rank"], ignore_index=True)


def rrf_fuse(
    rank_tables: list[pd.DataFrame],
    k: int = 10,
    k_rrf: int = 60,
    scale: int = RRF_SCALE,
) -> pd.DataFrame:
    """Reciprocal-rank fusion over (query_id, doc_id, rank) tables:
    score = Σ_lists scale // (k_rrf + rank) — integer micro-units, so
    the fused order is float-free. Top-k per query by (rrf_c desc,
    doc_id asc); output sorted (query_id, doc_id)."""
    parts = []
    for t in rank_tables:
        p = t[["query_id", "doc_id"]].copy()
        p["rrf_c"] = (scale // (k_rrf + t["rank"].to_numpy(np.int64))).astype(np.int64)
        parts.append(p)
    allp = pd.concat(parts, ignore_index=True)
    fused = allp.groupby(["query_id", "doc_id"], as_index=False)["rrf_c"].sum()
    fused = fused.sort_values(
        ["query_id", "rrf_c", "doc_id"], ascending=[True, False, True], kind="mergesort"
    )
    out = fused.groupby("query_id", as_index=False).head(k)
    out = out.astype({"query_id": np.int64, "doc_id": np.int64, "rrf_c": np.int64})
    return out.sort_values(["query_id", "doc_id"], ignore_index=True)


def hybrid_topk(
    docs: rd.Dataset,
    embeddings: rd.Dataset,
    query_ids: list[int],
    k: int = 10,
    k_each: int = 20,
    k_rrf: int = 60,
) -> pd.DataFrame:
    """BM25 top-k_each ∥ quantized-MIPS top-k_each → RRF top-k.

    Query ids address BOTH tables (doc_id and vec_id share the key
    space in the documents/embeddings fixture pair). Both rank lists
    are integer-exact, so the fused (query_id, doc_id, rrf_c) table
    hash-matches an ANSI-SQL oracle."""
    from gridfia_ray.text.bm25 import bm25_topk

    lex = bm25_topk(docs, query_ids, k=k_each)
    # bm25_topk returns (query_id, doc_id, score_c) without rank
    lex = lex.sort_values(
        ["query_id", "score_c", "doc_id"], ascending=[True, False, True], kind="mergesort"
    ).reset_index(drop=True)
    lex["rank"] = lex.groupby("query_id").cumcount().to_numpy(np.int64) + 1

    vec = mips_topk_int(embeddings, query_ids, k=k_each)
    return rrf_fuse([lex, vec], k=k, k_rrf=k_rrf)
