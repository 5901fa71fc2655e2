"""k-center greedy (farthest-first traversal) diversity selection over
an embedding column — coreset sampling for training-data curation
(Gonzalez 1985's 2-approximation to the k-center objective; the
"coreset" active-learning selector of Sener & Savarese 2018).

Complements the similarity-side operators (SemDeDup pruning keeps
near-duplicates OUT; k-center keeps maximally-spread points IN): select
``m`` points such that every corpus point is close to some selected
point, by repeatedly taking the point FARTHEST from the current
selection.

Scale shape: the selected set is tiny (``m`` rows) and the corpus is
SHARDED ONTO A STATEFUL ACTOR POOL for the loop (round-4 VERDICT #5:
the previous per-round ``materialize()`` chain kept up to m
object-store copies of the corpus+state alive in lineage). Each shard
actor holds its (ids, matrix, mind) slice in heap memory; a round is
one tiny RPC fan-out — the newest center in, a 1-row shard winner
``(max mind, min vec_id)`` out — so per-round object-store traffic is
O(m·dim) TOTAL and the store peak is the one-time init pass,
independent of m. m rounds of per-shard distance updates remain the
algorithm's inherent cost; there is NO shuffle anywhere. Partitioning
assumption: corpus/K must fit a shard actor's heap — for corpora
beyond that, raise K (actors), not rounds.

Determinism: the winner rule is lexicographic ``(mind DESC, vec_id
ASC)`` over exactly-computed float64 distances; the per-point reduction
``((x−c)²).sum(axis=1)`` depends only on the dim, not the batch split,
so the selection is a pure function of (corpus, m, metric) — pinned
against a sequential full-matrix replay in
``oracle_pins.ensure_divpin`` and partition-invariance-tested.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from gridfia_ray.ann.search import _as_matrix, _normalize


def _dist2(mat64: np.ndarray, c64: np.ndarray, metric: str) -> np.ndarray:
    """Per-point distance² to one center — the ONE formula both the
    distributed pass and the sequential replay must share (float64,
    per-row reduction over axis=1 ⇒ batch-split-independent bits)."""
    if metric == "cosine":
        # rows pre-normalized: d² = 2·(1 − cos) — monotone in angle
        return 2.0 * (1.0 - mat64 @ c64)
    d = mat64 - c64[None, :]
    return np.einsum("ij,ij->i", d, d)


def _prep(mat: np.ndarray, metric: str) -> np.ndarray:
    m64 = np.asarray(mat, dtype=np.float64)
    return _normalize(m64) if metric == "cosine" else m64


def kcenter_select(
    emb: rd.Dataset,
    m: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "euclidean",
) -> pd.DataFrame:
    """Select ``m`` maximally-spread points; returns the tiny selection
    table ``(rank, vec_id, radius2)`` in selection order, where
    ``radius2`` is the point's distance² to the previously selected set
    at pick time (the non-increasing coverage-radius sequence; the
    seed's is NaN). Seed = the smallest ``vec_id`` (deterministic)."""
    if metric not in ("euclidean", "cosine"):
        raise ValueError(f"kcenter_select: unknown metric {metric!r}")
    if m < 1:
        raise ValueError("kcenter_select: m must be >= 1")

    from gridfia_ray.pipelines.common import cluster_cpus

    def project(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        mat = _prep(_as_matrix(batch[vec_col]), metric)
        return pa.table(
            {
                "vec_id": pa.array(ids),
                "vec": pa.array(list(mat), pa.list_(pa.float64())),
            }
        )

    # ONE init pass (ids + prepped float64 vectors), then the blocks are
    # handed to shard actors by ref and the dataset is dropped — the
    # loop never touches the object store again beyond m tiny RPCs
    prepped = emb.map_batches(project, batch_format="pyarrow").materialize()
    refs = prepped.to_arrow_refs()
    n_total = prepped.count()
    if n_total == 0:
        raise ValueError("kcenter_select: empty input")
    del prepped

    # size shards to the DATA, not the CPU count: each shard is an
    # actor spawn (~0.5 s), and the per-round fan-out cost scales with
    # shard count — a few thousand vectors want one or two shards, a
    # billion want hundreds (bounded by cpu count here)
    k_shards = max(
        1,
        min(cluster_cpus(), len(refs), (n_total + 65_535) // 65_536),
    )
    actors = [
        _KcShard.remote(refs[i::k_shards], metric) for i in range(k_shards)
    ]
    try:
        # deterministic seed: the smallest vec_id (per-shard min → driver)
        seeds = [s for s in ray.get([a.seed.remote() for a in actors]) if s]
        # actors have materialized their heap copies once seed() returns
        # — drop the block refs so the store copy can be reclaimed
        del refs
        seed_id, seed_vec = min(seeds, key=lambda s: s[0])

        picks = [(0, int(seed_id), float("nan"))]
        center = list(seed_vec)
        for r in range(1, min(m, n_total)):
            wins = [
                w
                for w in ray.get(
                    [a.update_and_winner.remote(center) for a in actors]
                )
                if w
            ]
            # global fold: (mind DESC, vec_id ASC) — identical to the
            # previous per-block winner sort
            wid, wmind, wvec = max(wins, key=lambda w: (w[1], -w[0]))
            if wmind == 0.0:
                # every remaining point coincides with a selected center
                # (duplicate embeddings): re-picking would emit duplicate
                # vec_ids — the selection is complete at the distinct count
                break
            picks.append((r, int(wid), float(wmind)))
            center = wvec
    finally:
        for a in actors:
            ray.kill(a)

    return pd.DataFrame(picks, columns=["rank", "vec_id", "radius2"])


@ray.remote(num_cpus=1)
class _KcShard:
    """One corpus shard of the Gonzalez loop, resident in actor heap:
    (ids, float64 matrix, mind). ``update_and_winner`` applies the
    newest center (``mind ← min(mind, d²(x, c))`` — the shared
    :func:`_dist2`, per-row reductions so bits are split-independent)
    and returns this shard's 1-row winner ``(vec_id, mind, vec)`` under
    the (mind DESC, vec_id ASC) rule."""

    def __init__(self, refs: list, metric: str):
        tables = ray.get(list(refs))
        ids, mats = [], []
        for t in tables:
            if t.num_rows == 0:
                continue
            ids.append(t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64))
            mats.append(_as_matrix(t["vec"]))
        self.ids = (
            np.concatenate(ids) if ids else np.zeros(0, np.int64)
        )
        self.mat = (
            np.concatenate(mats) if mats else np.zeros((0, 0), np.float64)
        )
        self.mind = np.full(self.ids.size, np.inf)
        self.metric = metric

    def seed(self):
        if self.ids.size == 0:
            return None
        i = int(np.argmin(self.ids))
        return int(self.ids[i]), self.mat[i].tolist()

    def update_and_winner(self, center: list):
        if self.ids.size == 0:
            return None
        c = np.asarray(center, np.float64)
        d2 = _dist2(self.mat, c, self.metric)
        self.mind = np.minimum(self.mind, d2)
        top = self.mind.max()
        cand = np.nonzero(self.mind == top)[0]
        i = int(cand[np.argmin(self.ids[cand])])
        return int(self.ids[i]), float(self.mind[i]), self.mat[i].tolist()


def kcenter_assign(
    emb: rd.Dataset,
    selected: pd.DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "euclidean",
) -> rd.Dataset:
    """Assign every corpus point to its nearest selected center — ONE
    broadcast pass (the m×dim center matrix via ``ray.put``); ties go
    to the lowest center rank. Returns ``(vec_id, center_id, d2)``."""
    sel = selected.sort_values("rank")
    center_ids = sel["vec_id"].to_numpy(np.int64)
    id_set = set(int(i) for i in center_ids)

    def gather(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.isin(ids, list(id_set))
        if not keep.any():
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "vec": pa.array([], pa.list_(pa.float64()))})
        mat = _prep(_as_matrix(batch[vec_col]), metric)[keep]
        return pa.table(
            {"vec_id": pa.array(ids[keep]),
             "vec": pa.array(list(mat), pa.list_(pa.float64()))}
        )

    cdf = emb.map_batches(gather, batch_format="pyarrow").to_pandas()
    vec_by_id = {int(r["vec_id"]): np.asarray(r["vec"]) for _, r in cdf.iterrows()}
    centers = np.stack([vec_by_id[int(i)] for i in center_ids])
    ref = ray.put(centers)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        mat = _prep(_as_matrix(batch[vec_col]), metric)
        d2 = np.stack([_dist2(mat, c[j], metric) for j in range(c.shape[0])], axis=1)
        best = np.argmin(d2, axis=1)  # argmin = first (lowest rank) on ties
        return pa.table(
            {
                "vec_id": pa.array(ids),
                "center_id": pa.array(center_ids[best]),
                "d2": pa.array(d2[np.arange(len(ids)), best]),
            }
        )

    return emb.map_batches(assign, batch_format="pyarrow")
