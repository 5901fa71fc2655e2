"""Bucketed distinct/first — the scale-safe shape for keyed dedup.

``groupby(key).map_groups`` makes one Python group call *per key*; with
10^12 keys that is the wrong altitude. Instead: hash the key columns
into ``n_buckets`` buckets (deterministic SipHash via
``pd.util.hash_pandas_object``), shuffle on the bucket, and pick winners
per bucket vectorized. Same result, O(buckets) Python calls.

Payload discipline: heavy columns (tile payload bytes) never convert to
Python objects — a *local* per-batch dedup runs before the shuffle (the
combiner: most duplicates are co-located with their original), and the
per-bucket winner selection computes positions on the light key/sort
columns only, then ``pyarrow.Table.take``s the winning rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def _bucket_of(df: pd.DataFrame, keys: list[str], n_buckets: int) -> np.ndarray:
    h = np.zeros(len(df), dtype=np.uint64)
    for k in keys:
        h ^= pd.util.hash_pandas_object(df[k], index=False).to_numpy()
    return (h % np.uint64(n_buckets)).astype(np.int32)


def _winner_positions(light: pd.DataFrame, keys: list[str], sort_cols: list[str]) -> np.ndarray:
    order = light.sort_values(sort_cols, kind="mergesort")
    keep = order.drop_duplicates(keys, keep="first")
    return np.sort(keep.index.to_numpy())


def bucketed_distinct(
    ds: rd.Dataset,
    keys: list[str],
    n_buckets: int = 64,
    sort_cols: list[str] | None = None,
) -> rd.Dataset:
    """One row per distinct key tuple; winner = first after sorting by
    ``sort_cols`` (default: the keys themselves) — deterministic."""
    sort_cols = sort_cols or keys
    light_cols = list(dict.fromkeys([*keys, *sort_cols]))

    def local_dedup_and_bucket(batch: pa.Table) -> pa.Table:
        light = batch.select(light_cols).to_pandas().reset_index(drop=True)
        pos = _winner_positions(light, keys, sort_cols)
        batch = batch.take(pa.array(pos))
        b = _bucket_of(light.iloc[pos].reset_index(drop=True), keys, n_buckets)
        return batch.append_column("__bucket", pa.array(b, pa.int32()))

    def dedup(group: pa.Table) -> pa.Table:
        light = group.select(light_cols).to_pandas().reset_index(drop=True)
        pos = _winner_positions(light, keys, sort_cols)
        out = group.take(pa.array(pos))
        return out.drop_columns(["__bucket"])

    return (
        ds.map_batches(local_dedup_and_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(dedup, batch_format="pyarrow")
    )


def bucketed_candidate_pairs(
    ds: rd.Dataset,
    bucket_keys: list[str],
    pair_fn,
    n_buckets: int = 64,
) -> rd.Dataset:
    """LSH-band candidate-pair generation at the right altitude.

    ``groupby(band, band_hash)`` makes one Python group call per LSH
    bucket — O(rows × bands) tiny groups. Instead the band buckets hash
    into ``n_buckets`` coarse buckets; inside each coarse bucket,
    singleton band-buckets are dropped *vectorized* (``duplicated``),
    and ``pair_fn(sub)`` runs only on band-buckets that actually hold
    ≥ 2 members (the rare collision case).
    """

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        h = np.zeros(len(batch), dtype=np.uint64)
        for k in bucket_keys:
            h ^= pd.util.hash_pandas_object(batch[k], index=False).to_numpy()
        batch = batch.copy()
        batch["__bucket"] = (h % np.uint64(n_buckets)).astype(np.int32)
        return batch

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        cand = group[group.duplicated(bucket_keys, keep=False)]
        outs = []
        for _, sub in cand.groupby(bucket_keys, sort=False):
            out = pair_fn(sub)
            if len(out):
                outs.append(out)
        if not outs:
            return pair_fn(group.iloc[0:0])
        return pd.concat(outs, ignore_index=True)

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(pairs, batch_format="pandas")
    )
