"""Bucketed distinct/first — the scale-safe shape for keyed dedup.

``groupby(key).map_groups`` makes one Python group call *per key*; with
10^12 keys that is the wrong altitude. Instead: hash the key columns
into ``n_buckets`` buckets (deterministic SipHash via
``pd.util.hash_pandas_object``), shuffle on the bucket, and run a
vectorized ``drop_duplicates`` per bucket. Same result, O(buckets)
Python calls. All rows of a key land in one bucket, so distinctness is
exact; the winner within a key is pinned by ``sort_cols``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd


def _bucket_of(df: pd.DataFrame, keys: list[str], n_buckets: int) -> np.ndarray:
    h = np.zeros(len(df), dtype=np.uint64)
    for k in keys:
        h ^= pd.util.hash_pandas_object(df[k], index=False).to_numpy()
    return (h % np.uint64(n_buckets)).astype(np.int32)


def bucketed_distinct(
    ds: rd.Dataset,
    keys: list[str],
    n_buckets: int = 64,
    sort_cols: list[str] | None = None,
) -> rd.Dataset:
    """One row per distinct key tuple; winner = first after sorting by
    ``sort_cols`` (default: the keys themselves) — deterministic."""
    sort_cols = sort_cols or keys

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["__bucket"] = _bucket_of(batch, keys, n_buckets)
        return batch

    def dedup(group: pd.DataFrame) -> pd.DataFrame:
        out = group.sort_values(sort_cols, kind="mergesort").drop_duplicates(keys, keep="first")
        return out.drop(columns="__bucket")

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(dedup, batch_format="pandas")
    )
