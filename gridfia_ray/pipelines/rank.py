"""Global order-statistics assignment — exact SQL ``NTILE(K) OVER
(ORDER BY v, id)`` without a global sort.

The engine's window family (pipelines/events.py) covers PARTITIONed
windows, where each key's rows co-locate in one bucket; a GLOBAL
``ORDER BY`` window is a different shape — naively it is a total sort
plus a prefix-sum over block offsets. This module does it in O(passes)
streaming scans instead:

1. boundary VALUES at the K-1 NTILE split ranks via the existing
   histogram-refinement quickselect (values never shuffle),
2. ONE combiner pass counting, per boundary value, the rows strictly
   below it, plus a bounded gather of the ids TIED at each boundary
   value (ties are the only rows whose bucket the value alone cannot
   decide; their count is checked distributed BEFORE any driver pull —
   the repo's provably-small-fold rule),
3. ONE stateless vectorized pass assigning ``tile = 1 + #{boundary
   (V,cid) < (v,id)}`` against the broadcast boundary pairs.

Exactness: ties order by the integer ``id_col`` (SQL ``ORDER BY v,
id``), so the assignment is total and deterministic; results hash-match
DuckDB's NTILE for any n, K, including n < K (empty trailing tiles) and
boundary runs spanning multiple tiles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd


def _ntile_boundary_ranks(n: int, k: int) -> np.ndarray:
    """1-indexed rank of the LAST row of each of the first k-1 tiles —
    SQL NTILE sizing: the first n%k tiles get n//k+1 rows, the rest
    n//k (empty tiles when n < k)."""
    b, m = divmod(n, k)
    sizes = np.full(k, b, np.int64)
    sizes[:m] += 1
    return np.cumsum(sizes)[:-1]


def ntile_exact(
    ds: rd.Dataset,
    value_col: str,
    id_col: str,
    k: int,
    *,
    max_tied: int = 5_000_000,
    bins: int = 1024,
    max_iters: int = 8,
) -> rd.Dataset:
    """Assign every row its exact global NTILE bucket. Returns the
    input columns plus ``tile`` (int64 in 1..k). ``id_col`` must be
    integer and unique within each run of tied values (checked on the
    gathered tied sets — the only place duplicates would make the
    order, and therefore the answer, ambiguous)."""
    if k < 1:
        raise ValueError(f"ntile_exact: k must be >= 1, got {k}")
    ds = ds.materialize()  # 3-6 streaming passes over the same rows
    n = ds.count()
    if n == 0 or k == 1:
        def all_one(batch: pd.DataFrame) -> pd.DataFrame:
            out = batch.copy()
            out["tile"] = np.ones(len(batch), np.int64)
            return out

        return ds.map_batches(all_one, batch_format="pandas")

    ranks = _ntile_boundary_ranks(n, k)  # (k-1,) 1-indexed

    # -- 1. boundary values via the keyed quickselect (constant key).
    # q chosen so ceil(q/100 * n) lands exactly on the target rank:
    # q = 100(R - 1/2)/n -> q/100*n = R - 1/2 (+/- one ulp), ceil = R.
    from gridfia_ray.pipelines.percentiles import grouped_percentiles_exact

    uniq_ranks = np.unique(ranks)
    qs = [100.0 * (float(r) - 0.5) / n for r in uniq_ranks]

    def with_key(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "__g": np.zeros(len(batch), np.int8),
                "__v": batch[value_col].to_numpy(np.float64),
            }
        )

    sel = grouped_percentiles_exact(
        ds.map_batches(with_key, batch_format="pandas"),
        "__g",
        "__v",
        qs,
        bins=bins,
        max_iters=max_iters,
    )
    # grouped output is (key, q_pct, value); map back by q order
    sel = sel.sort_values("q_pct").reset_index(drop=True)
    rank_value = dict(zip(uniq_ranks.tolist(), sel["value"].to_numpy(np.float64)))
    bvals = np.asarray([rank_value[int(r)] for r in ranks], np.float64)  # per tile

    # -- 2. per distinct boundary value: rows strictly below, and the
    # tied ids. Below-counts are a pure combiner; tied ids fold on the
    # driver only after a distributed count enforces the bound.
    distinct_b = np.unique(bvals)

    def below_partial(batch: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(batch[value_col].to_numpy(np.float64))
        return pd.DataFrame(
            {
                "bi": np.arange(len(distinct_b), dtype=np.int64),
                "below": np.searchsorted(v, distinct_b, side="left").astype(np.int64),
            }
        )

    from gridfia_ray.stages.agg_util import bucketed_agg

    below_df = (
        bucketed_agg(
            ds.map_batches(below_partial, batch_format="pandas"),
            ["bi"],
            {"below": ("below", "sum")},
            n_buckets=4,
        )
        .to_pandas()
        .astype({"bi": np.int64, "below": np.int64})
        .set_index("bi")["below"]
    )
    below = np.zeros(len(distinct_b), np.int64)
    below[below_df.index.to_numpy()] = below_df.to_numpy()

    def tied_rows(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch[value_col].to_numpy(np.float64)
        mask = np.isin(v, distinct_b)
        return pd.DataFrame(
            {
                "tv": v[mask],
                "tid": batch[id_col].to_numpy(np.int64)[mask],
            }
        )

    tied = ds.map_batches(tied_rows, batch_format="pandas").materialize()
    n_tied = tied.count()
    if n_tied > max_tied:
        raise ValueError(
            f"ntile_exact: {n_tied} rows tied at the {len(distinct_b)} "
            f"boundary values exceed max_tied={max_tied} — heavy-hitter "
            f"values straddle the tile boundaries; raise max_tied or "
            f"bucket on a higher-resolution key"
        )
    tdf = tied.to_pandas()
    tied_ids: dict[float, np.ndarray] = {}
    for tv, sub in tdf.groupby("tv"):
        ids = np.sort(sub["tid"].to_numpy(np.int64))
        if len(ids) > 1 and (np.diff(ids) == 0).any():
            raise ValueError(
                f"ntile_exact: duplicate {id_col} among rows tied at "
                f"value {tv!r} — tie order is ambiguous"
            )
        tied_ids[float(tv)] = ids

    # cutoff id per boundary: the id of the exact rank-R row inside its
    # tied run (positions below+1 .. below+T hold the run)
    cids = np.empty(len(ranks), np.int64)
    for i, (r, bv) in enumerate(zip(ranks, bvals)):
        bi = int(np.searchsorted(distinct_b, bv))
        off = int(r) - int(below[bi]) - 1
        run = tied_ids.get(float(bv), np.empty(0, np.int64))
        if not 0 <= off < len(run):
            raise AssertionError(
                f"ntile_exact internal: rank {r} not inside the tied run "
                f"of its boundary value {bv!r} (off={off}, run={len(run)})"
            )
        cids[i] = run[off]

    # -- 3. assignment: tile = 1 + #{(V_i, cid_i) < (v, id)}; the
    # boundary list is rank-sorted, hence (V, cid)-lexicographic.
    cid_by_val = {
        float(bv): np.sort(cids[bvals == bv]) for bv in distinct_b
    }

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch[value_col].to_numpy(np.float64)
        ids = batch[id_col].to_numpy(np.int64)
        cnt = np.searchsorted(bvals, v, side="left").astype(np.int64)
        for bv, run_cids in cid_by_val.items():
            m = v == bv
            if m.any():
                # strict (V, cid) < (v, id): side='left' excludes the
                # boundary row itself, keeping it in ITS tile
                cnt[m] += np.searchsorted(run_cids, ids[m], side="left")
        out = batch.copy()
        out["tile"] = cnt + 1
        return out

    return ds.map_batches(assign, batch_format="pandas")
