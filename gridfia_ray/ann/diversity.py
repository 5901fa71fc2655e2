"""k-center greedy (farthest-first traversal) diversity selection over
an embedding column — coreset sampling for training-data curation
(Gonzalez 1985's 2-approximation to the k-center objective; the
"coreset" active-learning selector of Sener & Savarese 2018).

Complements the similarity-side operators (SemDeDup pruning keeps
near-duplicates OUT; k-center keeps maximally-spread points IN): select
``m`` points such that every corpus point is close to some selected
point, by repeatedly taking the point FARTHEST from the current
selection.

Scale shape: the selected set is tiny (``m`` rows) and the corpus
streams. State is one float64 ``mind`` column (distance² to the nearest
selected center so far) carried WITH the data; each round broadcasts
only the newest center (``ray.put``), one ``map_batches`` pass updates
``mind`` (``min(mind, d²(x, c))``), and per-block 1-row winners
``(max mind, min vec_id)`` fold on the driver (bounded: one row per
block). m rounds ⇒ m distance-update passes (the algorithm's inherent
cost) plus m winner scans — the latter over the just-MATERIALIZED
state, so they read zero-copy Arrow from the object store and do no
recompute; every pass is a pure map, NO shuffle anywhere.

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

    def init(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        mat = _prep(_as_matrix(batch[vec_col]), metric)
        return pa.table(
            {
                "vec_id": pa.array(ids),
                "vec": pa.array(list(mat), pa.list_(pa.float64())),
                "mind": pa.array(np.full(len(ids), np.inf)),
            }
        )

    state = emb.map_batches(init, batch_format="pyarrow").materialize()

    # deterministic seed: the smallest vec_id (per-block min → driver)
    def block_seed(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy()
        if ids.size == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "vec": pa.array([], pa.list_(pa.float64()))})
        i = int(np.argmin(ids))
        return batch.select(["vec_id", "vec"]).slice(i, 1)

    seeds = state.map_batches(block_seed, batch_format="pyarrow").to_pandas()
    if len(seeds) == 0:
        raise ValueError("kcenter_select: empty input")
    seed = seeds.sort_values("vec_id").iloc[0]
    n_total = state.count()

    picks = [(0, int(seed["vec_id"]), float("nan"))]
    center = np.asarray(seed["vec"], dtype=np.float64)

    for r in range(1, min(m, n_total)):
        ref = ray.put(center)

        def update(batch: pa.Table, _ref=ref) -> pa.Table:
            c = ray.get(_ref)
            mat = _as_matrix(batch["vec"])
            d2 = _dist2(mat, c, metric)
            mind = np.minimum(batch["mind"].to_numpy(), d2)
            return pa.table(
                {"vec_id": batch["vec_id"], "vec": batch["vec"],
                 "mind": pa.array(mind)}
            )

        state = state.map_batches(update, batch_format="pyarrow").materialize()

        def block_winner(batch: pa.Table) -> pa.Table:
            ids = batch["vec_id"].to_numpy()
            if ids.size == 0:
                return batch.slice(0, 0)
            mind = batch["mind"].to_numpy()
            top = mind.max()
            cand = np.nonzero(mind == top)[0]
            i = int(cand[np.argmin(ids[cand])])
            return batch.slice(i, 1)

        winners = (
            state.map_batches(block_winner, batch_format="pyarrow").to_pandas()
        )
        winners = winners.sort_values(
            ["mind", "vec_id"], ascending=[False, True]
        )
        w = winners.iloc[0]
        if float(w["mind"]) == 0.0:
            # every remaining point coincides with a selected center
            # (duplicate embeddings): re-picking would emit duplicate
            # vec_ids — the selection is complete at the distinct count
            break
        picks.append((r, int(w["vec_id"]), float(w["mind"])))
        center = np.asarray(w["vec"], dtype=np.float64)

    return pd.DataFrame(picks, columns=["rank", "vec_id", "radius2"])


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
