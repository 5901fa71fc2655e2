"""Similarity search over an embedding column (``list<float>``).

* ``topk_cosine`` — exact brute-force top-k: the query matrix is
  broadcast (actor ``__init__``), each batch does one numpy matmul and
  emits only its local top-k per query (per-batch combiner), and a final
  tiny groupby keeps the global top-k. The shuffle carries
  O(batches × q × k) rows, never the vectors.
* ``lsh_topk_cosine`` — the scale path: seeded random-hyperplane (SRP)
  signatures bucket vectors; queries probe buckets within a signature
  Hamming radius, exact cosine re-ranks the candidates. Recall < 1 by
  construction; radius/planes trade recall vs candidates.
* ``embedding_near_dup_pairs`` — cosine ≥ threshold near-duplicate
  pairs via SRP bucket candidates + exact verification.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from gridfia_ray.codecs.phash import hamming64


def _as_matrix(col) -> np.ndarray:
    """Embedding column → (n, d) float64 matrix. Handles Arrow list
    arrays (zero-copy flat view), Ray's ArrowTensorArray extension type,
    and pandas object columns of ndarrays."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, (pa.ListArray, pa.LargeListArray)):
        flat = col.values.to_numpy(zero_copy_only=False).astype(np.float64)
        d = len(flat) // len(col)
        return flat.reshape(len(col), d)
    if isinstance(col, pa.FixedSizeListArray):
        d = col.type.list_size
        return col.values.to_numpy(zero_copy_only=False).astype(np.float64).reshape(len(col), d)
    if hasattr(col, "to_numpy"):
        arr = col.to_numpy(zero_copy_only=False) if isinstance(col, pa.Array) else col.to_numpy()
    else:
        arr = np.asarray(col, dtype=object)
    if isinstance(arr, np.ndarray) and arr.dtype == object:
        return np.stack([np.asarray(v).astype(np.float64) for v in arr])
    return np.asarray(arr, dtype=np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


class BruteTopK:
    """Per-batch exact scorer: emits the batch-local top-k per query."""

    def __init__(self, queries: np.ndarray, query_ids: list, k: int):
        self.q = _normalize(np.asarray(queries, dtype=np.float64))
        self.query_ids = list(query_ids)
        self.k = int(k)

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = _normalize(_as_matrix(batch["embedding"]))
        ids = batch["vec_id"].to_numpy()
        sims = vecs @ self.q.T  # (n, q)
        out_q, out_v, out_s = [], [], []
        k = min(self.k, len(ids))
        for qi, qid in enumerate(self.query_ids):
            s = sims[:, qi]
            sel = np.argpartition(-s, k - 1)[:k] if k < len(ids) else np.arange(len(ids))
            out_q.extend([qid] * len(sel))
            out_v.extend(ids[sel].tolist())
            out_s.extend(s[sel].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "cosine": pa.array(out_s, pa.float64()),
            }
        )


def topk_cosine(
    embeddings: rd.Dataset, queries: np.ndarray, query_ids: list, k: int = 10
) -> rd.Dataset:
    """Exact global top-k by cosine for each query vector.

    Deterministic tie-break: (cosine desc, vec_id asc).
    """
    from gridfia_ray.stages.worker_state import worker_cached

    partials = embeddings.map_batches(
        worker_cached(BruteTopK, queries=queries, query_ids=query_ids, k=k),
        batch_format="pyarrow",
        batch_size=4096,
        num_cpus=1,
    )

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", "vec_id"], ascending=[False, True], kind="mergesort").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return partials.groupby("query_id").map_groups(final_topk, batch_format="pandas")


def knn_graph(
    embeddings: rd.Dataset,
    k: int = 10,
    *,
    max_broadcast_bytes: int = 1 << 30,
) -> rd.Dataset:
    """Exact k-NN GRAPH: for EVERY vector its k nearest neighbors by
    cosine, self excluded, deterministic (cosine desc, vec_id asc)
    tie-break — the neighbor-graph builder that SemDeDup-style cluster
    dedup and graph-based retrieval consume.

    Shape: the normalized corpus matrix broadcasts ONCE (``ray.put``,
    byte-counted BEFORE the pull — an exact graph is all-pairs math, so
    the reference matrix must be worker-resident; at f64 it holds to
    ~2·10⁷ rows × 64 dims under the default 1 GiB bound). Each batch
    computes its (B × N) block product against the broadcast and keeps
    its own top-k — ONE corpus pass, no shuffle, N·k edge rows out.
    Beyond the bound this raises: the scale path is the IVF composition
    (``ann.ivf.build_ivf_index`` + per-cell probes), which trades
    exactness for locality."""
    import ray

    embeddings = embeddings.select_columns(["vec_id", "embedding"]).materialize()
    n = embeddings.count()
    if n == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "nbr_id": pa.array([], pa.int64()),
                    "rank": pa.array([], pa.int64()),
                    "cosine": pa.array([], pa.float64()),
                }
            )
        )
    # the byte estimate is exact: n rows × d float64 + n int64 ids
    first = embeddings.take_batch(1, batch_format="pyarrow")
    d = _as_matrix(first["embedding"]).shape[1]
    est = n * d * 8 + n * 8
    if est > max_broadcast_bytes:
        raise ValueError(
            f"knn_graph: corpus matrix ~{est >> 20} MiB exceeds "
            f"max_broadcast_bytes={max_broadcast_bytes >> 20} MiB — use the "
            "IVF composition (ann.ivf) for approximate graphs at this scale"
        )
    ref_df = embeddings.to_pandas()
    ids = ref_df["vec_id"].to_numpy(np.int64)
    mat = _normalize(
        np.stack([np.asarray(v, dtype=np.float64) for v in ref_df["embedding"]])
    )
    pos = {int(v): i for i, v in enumerate(ids)}
    ref = ray.put({"ids": ids, "mat": mat, "pos": pos})

    empty = pa.table(
        {
            "vec_id": pa.array([], pa.int64()),
            "nbr_id": pa.array([], pa.int64()),
            "rank": pa.array([], pa.int64()),
            "cosine": pa.array([], pa.float64()),
        }
    )

    def block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty
        r = ray.get(ref)
        vecs = _normalize(_as_matrix(batch["embedding"]))
        bids = batch["vec_id"].to_numpy()
        sims = vecs @ r["mat"].T  # (B, N)
        # exclude self
        rows = np.arange(len(bids))
        cols = np.array([r["pos"][int(v)] for v in bids])
        sims[rows, cols] = -np.inf
        kk = min(k, sims.shape[1] - 1)
        out_v, out_n, out_r, out_s = [], [], [], []
        cand = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        for bi in range(len(bids)):
            c = cand[bi]
            s = sims[bi, c]
            order = np.lexsort((r["ids"][c], -s))
            sel = c[order]
            out_v.append(np.full(kk, bids[bi], np.int64))
            out_n.append(r["ids"][sel])
            out_r.append(np.arange(1, kk + 1, dtype=np.int64))
            out_s.append(sims[bi, sel])
        return pa.table(
            {
                "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
                "nbr_id": pa.array(np.concatenate(out_n), pa.int64()),
                "rank": pa.array(np.concatenate(out_r), pa.int64()),
                "cosine": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )

    return embeddings.map_batches(block, batch_format="pyarrow", batch_size=1024)


def hard_negatives(
    embeddings: rd.Dataset,
    k: int = 10,
    *,
    label_col: str = "label",
    max_broadcast_bytes: int = 1 << 30,
) -> rd.Dataset:
    """Contrastive hard-negative MINING: for every vector, its ``k``
    most-similar vectors with a DIFFERENT label — the standard
    metric-learning / embedding-training data op (the negatives closest
    to the anchor are the informative ones). Exact cosine, deterministic
    (cosine desc, id asc) tie-break, same one-broadcast one-pass shape
    as :func:`knn_graph` (the all-pairs math needs a worker-resident
    reference; the IVF composition is the beyond-bound scale path).
    Emits (vec_id, neg_id, rank, cosine); vectors whose label covers
    the whole corpus emit no rows."""
    import ray

    embeddings = embeddings.select_columns(
        ["vec_id", "embedding", label_col]
    ).materialize()
    n = embeddings.count()
    empty = pa.table(
        {
            "vec_id": pa.array([], pa.int64()),
            "neg_id": pa.array([], pa.int64()),
            "rank": pa.array([], pa.int64()),
            "cosine": pa.array([], pa.float64()),
        }
    )
    if n == 0:
        return rd.from_arrow(empty)
    first = embeddings.take_batch(1, batch_format="pyarrow")
    d = _as_matrix(first["embedding"]).shape[1]
    est = n * d * 8 + n * 16
    if est > max_broadcast_bytes:
        raise ValueError(
            f"hard_negatives: corpus matrix ~{est >> 20} MiB exceeds "
            f"max_broadcast_bytes={max_broadcast_bytes >> 20} MiB — compose "
            "per-cell mining over an IVF partition (ann.ivf) at this scale"
        )
    ref_df = embeddings.to_pandas()
    ids = ref_df["vec_id"].to_numpy(np.int64)
    labs = ref_df[label_col].to_numpy(np.int64)
    mat = _normalize(
        np.stack([np.asarray(v, dtype=np.float64) for v in ref_df["embedding"]])
    )
    ref = ray.put({"ids": ids, "labs": labs, "mat": mat})

    def block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty
        r = ray.get(ref)
        vecs = _normalize(_as_matrix(batch["embedding"]))
        bids = batch["vec_id"].to_numpy()
        blabs = batch[label_col].to_numpy(zero_copy_only=False).astype(np.int64)
        sims = vecs @ r["mat"].T  # (B, N)
        sims[blabs[:, None] == r["labs"][None, :]] = -np.inf  # same-label mask
        kk = min(k, sims.shape[1])
        out_v, out_n, out_r, out_s = [], [], [], []
        cand = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        for bi in range(len(bids)):
            c = cand[bi]
            s = sims[bi, c]
            ok = np.isfinite(s)
            c, s = c[ok], s[ok]
            order = np.lexsort((r["ids"][c], -s))
            sel = c[order]
            out_v.append(np.full(len(sel), bids[bi], np.int64))
            out_n.append(r["ids"][sel])
            out_r.append(np.arange(1, len(sel) + 1, dtype=np.int64))
            out_s.append(sims[bi, sel])
        if not out_v:
            return empty
        return pa.table(
            {
                "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
                "neg_id": pa.array(np.concatenate(out_n), pa.int64()),
                "rank": pa.array(np.concatenate(out_r), pa.int64()),
                "cosine": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )

    return embeddings.map_batches(block, batch_format="pyarrow", batch_size=1024)


def knn_graph_ivf(
    embeddings: rd.Dataset,
    k: int = 10,
    *,
    n_cells: int = 64,
    nprobe: int = 4,
    n_iters: int = 10,
    seed: int = 42,
    sample_size: int = 4096,
    n_buckets: int = 64,
) -> rd.Dataset:
    """APPROXIMATE k-NN graph — :func:`knn_graph`'s scale path, with NO
    corpus broadcast. Sampled spherical k-means partitions the space;
    every vector is INDEXED in its home cell (stable-argsort first hit,
    ties → lowest cell) and QUERIES its ``nprobe`` nearest cells; each
    cell solves its local (queries × members) block exactly; one tiny
    keyed merge folds each vector's candidates. A (query, neighbor)
    pair can only meet in the neighbor's single home cell, so the merge
    never deduplicates.

    Costs: the exchange ships (nprobe+1)·corpus packed vectors; no
    worker ever holds more than its bucket's cells. Recall < 1 by
    construction (a true neighbor indexed in an unprobed cell is
    missed) and rises with nprobe; at ``nprobe = n_cells`` the result
    equals the exact graph."""
    import ray

    from gridfia_ray.ann.ivf import kmeans_fit
    from gridfia_ray.stages.agg_util import bucketed_bucket_map

    if not 1 <= nprobe <= n_cells:
        raise ValueError(f"nprobe must be in [1, n_cells], got {nprobe}")
    embeddings = embeddings.select_columns(["vec_id", "embedding"]).materialize()
    centroids = kmeans_fit(
        embeddings, n_cells, n_iters=n_iters, seed=seed, sample_size=sample_size
    )
    cref = ray.put(centroids)

    def fan(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        vn = _normalize(_as_matrix(batch["embedding"]))
        ids = batch["vec_id"].to_numpy()
        sims = vn @ c.T
        # stable sort: equal-similarity ties keep ascending cell order,
        # so order[:, 0] reproduces assign_cells' argmax first-hit rule
        order = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]
        cells, roles, vids, bufs = [], [], [], []
        for i in range(len(ids)):
            buf = vn[i].astype("<f4").tobytes()
            cells.append(int(order[i, 0]))
            roles.append(0)  # indexed in the home cell
            vids.append(int(ids[i]))
            bufs.append(buf)
            for j in range(nprobe):
                cells.append(int(order[i, j]))
                roles.append(1)  # queries every probed cell (incl. home)
                vids.append(int(ids[i]))
                bufs.append(buf)
        return pa.table(
            {
                "cell": pa.array(cells, pa.int32()),
                "role": pa.array(roles, pa.int8()),
                "vec_id": pa.array(vids, pa.int64()),
                "v": pa.array(bufs, pa.binary()),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out_q, out_n, out_s = [], [], []
        for _, sub in g.groupby("cell", sort=False):
            idx = sub[sub["role"] == 0]
            qs = sub[sub["role"] == 1]
            if len(idx) == 0 or len(qs) == 0:
                continue
            im = np.stack([np.frombuffer(b, "<f4") for b in idx["v"]]).astype(
                np.float64
            )
            qm = np.stack([np.frombuffer(b, "<f4") for b in qs["v"]]).astype(
                np.float64
            )
            i_ids = idx["vec_id"].to_numpy(np.int64)
            q_ids = qs["vec_id"].to_numpy(np.int64)
            sims = qm @ im.T
            sims[q_ids[:, None] == i_ids[None, :]] = -np.inf
            kk = min(k, im.shape[0])
            cand = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            for qi in range(len(q_ids)):
                c = cand[qi]
                keep = sims[qi, c] > -np.inf  # drop the self slot
                out_q.append(np.full(int(keep.sum()), q_ids[qi], np.int64))
                out_n.append(i_ids[c[keep]])
                out_s.append(sims[qi, c[keep]])
        if not out_q:
            return pd.DataFrame(
                {"vec_id": pd.Series(dtype=np.int64),
                 "nbr_id": pd.Series(dtype=np.int64),
                 "cosine": pd.Series(dtype=np.float64)}
            )
        return pd.DataFrame(
            {"vec_id": np.concatenate(out_q), "nbr_id": np.concatenate(out_n),
             "cosine": np.concatenate(out_s)}
        )

    cand = bucketed_bucket_map(
        embeddings.map_batches(fan, batch_format="pyarrow"),
        ["cell"],
        per_bucket,
        n_buckets=min(n_buckets, n_cells),
    )

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["cosine", "nbr_id"], ascending=[False, True], kind="mergesort"
        ).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return cand.groupby("vec_id").map_groups(final_topk, batch_format="pandas")


# ---------------------------------------------------------------------------
# SRP-LSH (scale path)
# ---------------------------------------------------------------------------


def srp_signature(vecs: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """64-bit signed random-projection signatures."""
    bits = (vecs @ planes.T) > 0  # (n, 64)
    out = np.zeros(len(vecs), dtype=np.uint64)
    for b in range(planes.shape[0]):
        out |= bits[:, b].astype(np.uint64) << np.uint64(b)
    return out.view(np.int64)


def make_planes(dim: int, n_planes: int = 64, seed: int = 42) -> np.ndarray:
    return np.random.RandomState(seed).normal(size=(n_planes, dim))


class SrpSigner:
    def __init__(self, dim: int, n_planes: int = 64, seed: int = 42):
        self.planes = make_planes(dim, n_planes, seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = _normalize(_as_matrix(batch["embedding"]))
        sig = srp_signature(vecs, self.planes)
        return pa.table(
            {
                "vec_id": batch["vec_id"],
                "embedding": batch["embedding"],
                "srp_sig": pa.array(sig, pa.int64()),
            }
        )


def lsh_topk_cosine(
    embeddings: rd.Dataset,
    queries: np.ndarray,
    query_ids: list,
    k: int = 10,
    dim: int | None = None,
    n_planes: int = 64,
    hamming_radius: int = 24,
    seed: int = 42,
) -> rd.Dataset:
    """Approximate top-k: SRP-bucketed candidate filter + exact re-rank.

    A vector is a candidate for a query when their 64-bit SRP signatures
    are within ``hamming_radius`` (for unit vectors, E[hamming]/64 =
    angle/π — radius 24 ≈ cos(67°) ≈ 0.4 candidate horizon).
    """
    if dim is None:
        dim = int(np.asarray(queries).shape[1])
    planes = make_planes(dim, n_planes, seed)
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    qsig = srp_signature(qn, planes)

    class Scorer:
        def __init__(self):
            self.q = qn
            self.qsig = qsig
            self.k = k

        def __call__(self, batch: pa.Table) -> pa.Table:
            vecs = _normalize(_as_matrix(batch["embedding"]))
            ids = batch["vec_id"].to_numpy()
            sig = batch["srp_sig"].to_numpy()
            out_q, out_v, out_s = [], [], []
            for qi, qid in enumerate(query_ids):
                ham = hamming64(sig, np.full(len(sig), self.qsig[qi]))
                cand = np.nonzero(ham <= hamming_radius)[0]
                if cand.size == 0:
                    continue
                s = vecs[cand] @ self.q[qi]
                kk = min(self.k, cand.size)
                sel = np.argpartition(-s, kk - 1)[:kk]
                out_q.extend([qid] * kk)
                out_v.extend(ids[cand[sel]].tolist())
                out_s.extend(s[sel].tolist())
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int64()),
                    "vec_id": pa.array(out_v, pa.int64()),
                    "cosine": pa.array(out_s, pa.float64()),
                }
            )

    from gridfia_ray.stages.worker_state import worker_cached

    partials = embeddings.map_batches(
        worker_cached(SrpSigner, dim=dim, n_planes=n_planes, seed=seed),
        batch_format="pyarrow",
        batch_size=4096,
    ).map_batches(worker_cached(Scorer), batch_format="pyarrow", batch_size=4096)

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", "vec_id"], ascending=[False, True], kind="mergesort").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return partials.groupby("query_id").map_groups(final_topk, batch_format="pandas")


def embedding_near_dup_pairs(
    embeddings: rd.Dataset,
    threshold: float = 0.95,
    dim: int | None = None,
    band_bits: int = 8,
    seed: int = 42,
) -> rd.Dataset:
    """Embedding-cosine near-dup pairs (a < b, cosine ≥ threshold) via
    SRP band buckets + exact verification. Recall is probabilistic
    (near-identical vectors agree on almost all SRP bits, so any band
    collides with high probability).

    Payload-slim shape (round-1 perf item 7): band rows carry
    ``vec_id`` + the 8-byte full signature only — the float vectors are
    NOT replicated into all ``n_bands`` band rows. Inside a band bucket
    a pair must also pass a full-signature Hamming prefilter at radius
    μ+5σ of the true-pair distribution for the GIVEN threshold
    (E[hamming] = 64·arccos(t)/π; e.g. ≈19 at cos 0.95, ≈34 at 0.7 —
    vs μ=32 for random vectors) — without it random byte-band
    collisions explode into O(n²/256) candidate pairs. Only the
    surviving candidates pay the embedding re-join
    (``attach_pair_attrs``) + exact cosine check."""
    n_bands = 64 // band_bits
    mask = (1 << band_bits) - 1
    # prefilter radius scales with the cosine threshold: for unit
    # vectors E[hamming] = 64·θ/π with θ = arccos(threshold), binomial
    # σ = √(64·p(1−p)); μ+5σ keeps essentially all true pairs (≤3e-7
    # tail) at ANY threshold while still rejecting random collisions
    # (μ_random = 32). A fixed radius silently drops true pairs once
    # the caller lowers the threshold.
    p = float(np.arccos(np.clip(threshold, -1.0, 1.0)) / np.pi)
    hamming_prefilter = min(63, int(np.ceil(64 * p + 5 * np.sqrt(64 * p * (1 - p)))))

    def explode(batch: pa.Table) -> pa.Table:
        sig = batch["srp_sig"].to_numpy().astype(np.int64)
        usig = sig.view(np.uint64)
        ids = batch["vec_id"].to_numpy()
        n = len(ids)
        band_val = np.empty(n * n_bands, np.int64)
        for b in range(n_bands):
            band_val[b * n : (b + 1) * n] = (
                (usig >> np.uint64(b * band_bits)) & np.uint64(mask)
            ).astype(np.int64)
        return pa.table(
            {
                "band": pa.array(np.repeat(np.arange(n_bands, dtype=np.int32), n)),
                "band_val": pa.array(band_val),
                "vec_id": pa.array(np.tile(ids, n_bands)),
                "srp_sig": pa.array(np.tile(sig, n_bands)),
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("vec_id").sort_values("vec_id", kind="mergesort")
        if len(g) < 2:
            return pd.DataFrame(
                {"a": pd.Series(dtype=np.int64), "b": pd.Series(dtype=np.int64)}
            )
        ids = g["vec_id"].to_numpy()
        sig = g["srp_sig"].to_numpy()
        ii, jj = np.triu_indices(len(ids), k=1)
        keep = hamming64(sig[ii], sig[jj]) <= hamming_prefilter
        return pd.DataFrame({"a": ids[ii[keep]], "b": ids[jj[keep]]})

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {"a": pd.Series(dtype=np.int64), "b": pd.Series(dtype=np.int64),
             "cosine": pd.Series(dtype=np.float64)}
        )
        if len(batch) == 0:
            return out
        va = _normalize(np.stack([np.asarray(v, np.float64) for v in batch["embedding_a"]]))
        vb = _normalize(np.stack([np.asarray(v, np.float64) for v in batch["embedding_b"]]))
        cos = (va * vb).sum(axis=1)
        keep = cos >= threshold
        return pd.DataFrame(
            {"a": batch["a"].to_numpy()[keep], "b": batch["b"].to_numpy()[keep],
             "cosine": cos[keep]}
        )

    from gridfia_ray.stages.worker_state import worker_cached

    sigs = embeddings.map_batches(
        worker_cached(SrpSigner, dim=dim if dim else _infer_dim(embeddings), seed=seed),
        batch_format="pyarrow",
        batch_size=4096,
    )
    from gridfia_ray.stages.dedup_util import (
        attach_pair_attrs,
        bucketed_candidate_pairs,
        bucketed_distinct,
    )

    pairs = bucketed_candidate_pairs(
        sigs.map_batches(explode, batch_format="pyarrow"),
        ["band", "band_val"],
        bucket_pairs,
    )
    pairs = bucketed_distinct(pairs, ["a", "b"], n_buckets=32)
    return attach_pair_attrs(pairs, embeddings, "vec_id", ["embedding"]).map_batches(
        verify, batch_format="pandas"
    )


def _infer_dim(embeddings: rd.Dataset) -> int:
    row = embeddings.take(1)[0]
    return len(row["embedding"])
