"""Tile dedup: exact by key, near-dup by phash Hamming banding.

The reference never dedups (each species layer written once, tracked by a
counter — ``gridfia/utils/zarr_utils.py:781-814``); at 10^12 ingested
tiles dedup is mandatory (SURVEY.md §2.7).

* exact: hash-partition on ``image_id`` (or the content hash) →
  deterministic first-per-group;
* near: 64-bit phash split into B bands → candidate pairs share ≥1 band
  → verify Hamming ≤ t. With ``B ≥ t+1`` bands the pigeonhole principle
  makes this *exhaustive*, not probabilistic: any pair within Hamming t
  leaves at least one band untouched. Default 8 bands of 8 bits →
  exhaustive for t ≤ 7.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from gridfia_ray.codecs.phash import hamming64


def exact_dedup(tiles: rd.Dataset, key: str = "image_id", n_buckets: int = 64) -> rd.Dataset:
    """Keep exactly one row per key — bucketed hash-partition dedup
    (O(buckets) Python calls, not O(keys); see stages/dedup_util.py).
    Deterministic winner: smallest (phash, fmt) among duplicates."""
    from gridfia_ray.stages.dedup_util import bucketed_distinct

    return bucketed_distinct(tiles, [key], n_buckets, sort_cols=[key, "phash", "fmt"])


def _band_rows(n_bands: int):
    width = 64 // n_bands
    mask = (1 << width) - 1

    def fn(batch: pa.Table) -> pa.Table:
        ph = batch["phash"].to_numpy().astype(np.int64).view(np.uint64)
        ids = batch["image_id"].to_pylist()
        n = len(ids)
        out_band = np.empty(n * n_bands, np.int32)
        out_val = np.empty(n * n_bands, np.int64)
        out_id = np.empty(n * n_bands, object)
        out_ph = np.empty(n * n_bands, np.int64)
        for b in range(n_bands):
            sl = slice(b * n, (b + 1) * n)
            out_band[sl] = b
            out_val[sl] = ((ph >> np.uint64(b * width)) & np.uint64(mask)).astype(np.int64)
            out_id[sl] = ids
            out_ph[sl] = ph.view(np.int64)
        return pa.table(
            {
                "band": pa.array(out_band, pa.int32()),
                "band_val": pa.array(out_val, pa.int64()),
                "image_id": pa.array(out_id.tolist(), pa.string()),
                "phash": pa.array(out_ph, pa.int64()),
            }
        )

    return fn


def near_dup_pairs(
    tiles: rd.Dataset, max_hamming: int = 6, n_bands: int = 8
) -> rd.Dataset:
    """All unordered pairs (a < b) of rows with phash Hamming ≤ t.

    Exhaustive for ``max_hamming <= n_bands - 1`` (pigeonhole). Pipeline:
    explode to (band, band_val) rows → groupby band+value → pairs within
    each bucket → distinct → Hamming verify.
    """
    if max_hamming > n_bands - 1:
        raise ValueError("banding not exhaustive: need n_bands >= max_hamming+1")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("image_id", kind="mergesort").drop_duplicates("image_id")
        if len(g) < 2:
            return pd.DataFrame({"a": [], "b": [], "hamming": []})
        ids = g["image_id"].to_numpy()
        ph = g["phash"].to_numpy()
        ii, jj = np.triu_indices(len(ids), k=1)
        hm = hamming64(ph[ii], ph[jj])
        keep = hm <= max_hamming
        return pd.DataFrame(
            {"a": ids[ii[keep]], "b": ids[jj[keep]], "hamming": hm[keep].astype(np.int64)}
        )

    from gridfia_ray.stages.dedup_util import bucketed_distinct

    pairs = (
        tiles.map_batches(_band_rows(n_bands), batch_format="pyarrow")
        .groupby(["band", "band_val"])
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    return bucketed_distinct(pairs, ["a", "b"], n_buckets=32)
