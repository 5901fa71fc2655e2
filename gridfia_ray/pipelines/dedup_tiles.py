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


def dup_key_table(keys_ds: rd.Dataset, key: str) -> rd.Dataset:
    """Distributed duplicates-only key table: one row per key whose
    total count exceeds 1, with its count in ``n``.

    The ``n > 1`` filter runs DISTRIBUTED, before anything reaches the
    driver: the full distinct-key table is one row per distinct key
    (~10^12 at target scale) and must never be collected. Only this
    duplicates-only remainder — small under the documented clean-majority
    assumption — is ever a candidate for driver materialization, and the
    caller decides that on its ``count()`` (metadata-only once
    materialized)."""
    import pyarrow.compute as pc

    from gridfia_ray.stages.agg_util import bucketed_agg

    def key_counts(batch: pa.Table) -> pd.DataFrame:
        vc = pd.Series(batch[key].to_pylist()).value_counts()
        return pd.DataFrame({key: vc.index, "n": vc.to_numpy().astype(np.int64)})

    def only_dups(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater(batch["n"], 1))

    return bucketed_agg(
        keys_ds.map_batches(key_counts, batch_format="pyarrow"),
        [key],
        {"n": ("n", "sum")},
    ).map_batches(only_dups, batch_format="pyarrow")


def exact_dedup(
    tiles,
    key: str = "image_id",
    n_buckets: int = 64,
    max_broadcast_keys: int = 5_000_000,
) -> rd.Dataset:
    """Keep exactly one row per key. Deterministic winner: smallest
    (phash, fmt) among duplicates.

    Two-phase so the 64 KB payloads never shuffle for the (typical)
    clean majority:
      1. key-only pass: per-batch value counts → bucketed merge → the
         set of keys with count > 1 (shuffles key strings, nothing else);
      2. rows whose key is NOT duplicated stream through untouched; only
         the duplicated-key subset (broadcast set filter) pays the
         payload shuffle of ``bucketed_distinct``.
    Falls back to the full payload shuffle when the duplicate-key set is
    too large to broadcast (``max_broadcast_keys``) — the documented
    small-duplicate-fraction assumption.

    ``tiles`` may be a parquet path or a Dataset; given a path, phase 1
    issues its own column-pruned read (``columns=[key]``) so the 64 KB
    payloads never leave storage for the counting pass.
    """
    import pyarrow.compute as pc

    from gridfia_ray.pipelines.common import read_tiles
    from gridfia_ray.stages.dedup_util import bucketed_distinct

    if isinstance(tiles, str):
        keys_ds = rd.read_parquet(tiles, columns=[key])
        tiles = read_tiles(tiles)
    else:
        tiles = read_tiles(tiles)
        keys_ds = tiles.select_columns([key])

    dup_keys_ds = dup_key_table(keys_ds, key).materialize()
    n_dup = dup_keys_ds.count()
    if n_dup == 0:
        return tiles

    # winner sort includes a content hash of the payload: two rows with
    # equal (key, phash, fmt) but different bytes would otherwise keep an
    # arbitrary survivor depending on block order (ADVICE r1). Computed
    # only on rows entering a shuffle-dedup (the duplicated subset in the
    # common path — cheap vectorized lane hash, not a byte loop).
    def with_chash(batch: pa.Table) -> pa.Table:
        from gridfia_ray.codecs.phash import content_hash64

        if "bytes" not in batch.column_names:
            return batch.append_column(
                "__chash", pa.array(np.zeros(batch.num_rows, np.int64), pa.int64())
            )
        ch = np.fromiter(
            (content_hash64(b) for b in batch["bytes"].to_pylist()),
            np.int64,
            batch.num_rows,
        )
        return batch.append_column("__chash", pa.array(ch, pa.int64()))

    def drop_chash(batch: pa.Table) -> pa.Table:
        return batch.drop_columns(["__chash"])

    sort_cols = [key, "phash", "fmt", "__chash"]
    if n_dup > max_broadcast_keys:
        return bucketed_distinct(
            tiles.map_batches(with_chash, batch_format="pyarrow"),
            [key],
            n_buckets,
            sort_cols=sort_cols,
            coalesce=False,  # full-payload shuffle: extra copy not worth it
        ).map_batches(drop_chash, batch_format="pyarrow")
    # duplicates-only and under the broadcast bound: safe to collect
    dup_set = pa.array(dup_keys_ds.to_pandas()[key].tolist())

    def clean_rows(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.invert(pc.is_in(batch[key], value_set=dup_set)))

    def dup_rows(batch: pa.Table) -> pa.Table:
        return with_chash(batch.filter(pc.is_in(batch[key], value_set=dup_set)))

    clean = tiles.map_batches(clean_rows, batch_format="pyarrow")
    dups = bucketed_distinct(
        tiles.map_batches(dup_rows, batch_format="pyarrow"),
        [key],
        max(8, n_buckets // 8),
        sort_cols=sort_cols,
    ).map_batches(drop_chash, batch_format="pyarrow")
    return clean.union(dups)


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

    from gridfia_ray.stages.dedup_util import bucketed_candidate_pairs, bucketed_distinct

    pairs = bucketed_candidate_pairs(
        tiles.map_batches(_band_rows(n_bands), batch_format="pyarrow"),
        ["band", "band_val"],
        bucket_pairs,
    )
    return bucketed_distinct(pairs, ["a", "b"], n_buckets=32)
