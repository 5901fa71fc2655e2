"""Incremental dedup against a persistent hash index — the production
shape for CONTINUOUS ingestion: dedup a new batch of documents against
everything ever ingested WITHOUT reprocessing the corpus.

The index is content-hash keys only (8 bytes/doc), hash-sharded into
``n_shards`` parquet files (``shard=<s>/keys-*.parquet``). Dedup of a
new batch then touches exactly the shards its hashes land in, and each
task reads only its own shard's key files — O(new batch) work against a
corpus of any size, the same file-level pruning idea as the IVF store.

Flow:
  * ``build_hash_index(docs, index_dir)``        — initial build;
  * ``dedup_against_index(new_docs, index_dir)`` — returns only the
    rows whose text hash is NOT in the index (and not duplicated
    within the new batch itself — first occurrence survives);
  * ``append_to_index(new_docs, index_dir)``     — register the
    survivors' keys as a NEW part file per shard (append-native, no
    rewrite; mirrors the engine's S9 append-as-new-part design).
"""

from __future__ import annotations

import glob
import json
import os
import uuid

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from gridfia_ray.dedup.docs import add_text_hash
from gridfia_ray.stages.dedup_util import bucketed_distinct

_SPLITMIX_C = np.uint64(0x9E3779B97F4A7C15)


def _shard_of(h: np.ndarray, n_shards: int) -> np.ndarray:
    """Deterministic hash→shard (top bits of an avalanche pass, so
    shards stay balanced even for structured hashes)."""
    z = h.astype(np.uint64) * _SPLITMIX_C
    z ^= z >> np.uint64(29)
    return (z % np.uint64(n_shards)).astype(np.int32)


def _shard_dir(index_dir: str, shard: int) -> str:
    return os.path.join(index_dir, f"shard={shard}")


def _write_shard_groups(keys: rd.Dataset, index_dir: str, n_shards: int) -> int:
    """Distributed shard-file writer: repartition on the shard id, one
    ``map_groups`` task writes one new key file per shard — the write
    fans out across the cluster and each append adds exactly one part
    per touched shard. Returns the number of keys written."""

    def write_shard(group: pd.DataFrame) -> pd.DataFrame:
        s = int(group["shard"].iloc[0])
        d = _shard_dir(index_dir, s)
        os.makedirs(d, exist_ok=True)
        pq.write_table(
            pa.table({"text_hash": group["text_hash"].to_numpy()}),
            os.path.join(d, f"keys-{uuid.uuid4().hex[:12]}.parquet"),
        )
        return pd.DataFrame({"n": [len(group)]})

    counts = (
        keys.repartition(n_shards)
        .groupby("shard")
        .map_groups(write_shard, batch_format="pandas")
        .to_pandas()
    )
    return int(counts["n"].sum()) if len(counts) else 0


def build_hash_index(docs: rd.Dataset, index_dir: str, n_shards: int = 64) -> int:
    """Create the index from an initial corpus; returns #distinct keys.
    Keys dedup per shard (bucketed); the shard files are written by
    distributed tasks (one file per shard per build)."""
    os.makedirs(index_dir, exist_ok=True)
    # read-merge-write so an existing near-index's keys (near_n_shards,
    # n_bands) survive building the exact index second in a shared dir
    meta_path = os.path.join(index_dir, "meta.json")
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    meta["n_shards"] = int(n_shards)
    with open(meta_path, "w") as f:
        json.dump(meta, f)

    def keys(batch: pd.DataFrame) -> pd.DataFrame:
        b = add_text_hash(batch)[["text_hash"]]
        b["shard"] = _shard_of(b["text_hash"].to_numpy(), n_shards)
        return b

    distinct = bucketed_distinct(
        docs.map_batches(keys, batch_format="pandas"), ["text_hash"],
        n_buckets=min(n_shards, 64),
    )
    return _write_shard_groups(distinct, index_dir, n_shards)


class _ShardAntiJoin:
    """Per-batch anti-join against the index: loads ONLY the shards the
    batch's hashes touch; per-worker shard key cache (an actor/worker
    loads each shard once, not once per batch)."""

    def __init__(self, index_dir: str, n_shards: int):
        self.index_dir = index_dir
        self.n_shards = n_shards
        self._cache: dict[int, np.ndarray] = {}

    def _shard_keys(self, shard: int) -> np.ndarray:
        keys = self._cache.get(shard)
        if keys is None:
            files = sorted(glob.glob(os.path.join(_shard_dir(self.index_dir, shard), "*.parquet")))
            if files:
                keys = np.sort(
                    np.concatenate([pq.read_table(f)["text_hash"].to_numpy() for f in files])
                )
            else:
                keys = np.empty(0, np.int64)
            self._cache[shard] = keys
        return keys

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        b = add_text_hash(batch)
        h = b["text_hash"].to_numpy()
        shards = _shard_of(h, self.n_shards)
        known = np.zeros(len(b), dtype=bool)
        for s in np.unique(shards):
            keys = self._shard_keys(int(s))
            if keys.size:
                m = shards == s
                idx = np.searchsorted(keys, h[m])
                idx = np.clip(idx, 0, keys.size - 1)
                known[m] = keys[idx] == h[m]
        return b.loc[~known]


def dedup_against_index(
    new_docs: rd.Dataset, index_dir: str, n_buckets: int = 64
) -> rd.Dataset:
    """Rows of ``new_docs`` not present in the index, deduped within the
    batch itself (min doc_id survives). Carries ``text_hash`` so the
    result can feed ``append_to_index`` directly."""
    with open(os.path.join(index_dir, "meta.json")) as f:
        n_shards = int(json.load(f)["n_shards"])
    from gridfia_ray.stages.worker_state import worker_cached

    fresh = new_docs.map_batches(
        worker_cached(_ShardAntiJoin, index_dir=index_dir, n_shards=n_shards),
        batch_format="pandas",
    )
    return bucketed_distinct(
        fresh, ["text_hash"], n_buckets=n_buckets, sort_cols=["text_hash", "doc_id"]
    )


# ---------------------------------------------------------------------------
# near-dup (SimHash band) index — round-2 VERDICT ask #6: continuous
# ingestion gets NEAR-dup rejection against the persistent index, not
# just exact. Same shard layout idea: each indexed doc contributes
# ``n_bands`` (band, band_val, simhash) rows, hash-sharded on
# (band, band_val) under ``near/shard=<s>/``. A new batch probes only
# the shards its own band values land in; candidates sharing a band are
# Hamming-verified against the stored signatures. With
# ``max_hamming <= n_bands - 1`` the banding is EXHAUSTIVE (pigeonhole),
# so rejection-vs-index is exact, not probabilistic. Near-dup WITHIN the
# new batch is deliberately out of scope here — that is the existing
# batch-level ``simhash_pairs`` pass (dedup/docs.py).
# ---------------------------------------------------------------------------

_NEAR_SUBDIR = "near"


def _near_dir(index_dir: str, shard: int) -> str:
    return os.path.join(index_dir, _NEAR_SUBDIR, f"shard={shard}")


def _band_cols(sim: np.ndarray, n_bands: int) -> tuple[np.ndarray, np.ndarray]:
    """(band, band_val) arrays for a signature vector, len = n·n_bands —
    delegates to THE shared banding decomposition so the persistent
    index and batch ``simhash_pairs`` can never disagree on what counts
    as a band match."""
    from gridfia_ray.text.hashing import simhash_band_decompose

    return simhash_band_decompose(sim, n_bands)


def _band_shard_of(band: np.ndarray, band_val: np.ndarray, n_shards: int) -> np.ndarray:
    mixed = band_val.astype(np.uint64) * _SPLITMIX_C + band.astype(np.uint64)
    return _shard_of(mixed.view(np.int64), n_shards)


def _add_simhash(batch: pd.DataFrame) -> pd.DataFrame:
    from gridfia_ray.dedup.docs import SimHasher

    batch = batch.copy()
    batch["simhash"] = SimHasher().sim64_batch(batch["text"].fillna("").tolist())
    return batch


def _write_near_shard_groups(bands: rd.Dataset, index_dir: str, n_shards: int) -> int:
    def write_shard(group: pd.DataFrame) -> pd.DataFrame:
        s = int(group["shard"].iloc[0])
        d = _near_dir(index_dir, s)
        os.makedirs(d, exist_ok=True)
        pq.write_table(
            pa.table(
                {
                    "band": group["band"].to_numpy(np.int32),
                    "band_val": group["band_val"].to_numpy(np.int64),
                    "simhash": group["simhash"].to_numpy(np.int64),
                }
            ),
            os.path.join(d, f"bands-{uuid.uuid4().hex[:12]}.parquet"),
        )
        return pd.DataFrame({"n": [len(group)]})

    counts = (
        bands.repartition(n_shards)
        .groupby("shard")
        .map_groups(write_shard, batch_format="pandas")
        .to_pandas()
    )
    return int(counts["n"].sum()) if len(counts) else 0


def _explode_bands(batch: pd.DataFrame, n_bands: int, n_shards: int) -> pd.DataFrame:
    sim = batch["simhash"].to_numpy()
    bands, vals = _band_cols(sim, n_bands)
    out = pd.DataFrame(
        {
            "band": bands,
            "band_val": vals,
            "simhash": np.tile(sim, n_bands),
        }
    )
    out["shard"] = _band_shard_of(out["band"].to_numpy(), out["band_val"].to_numpy(), n_shards)
    return out


def build_near_index(
    docs: rd.Dataset, index_dir: str, n_shards: int = 64, n_bands: int = 8
) -> int:
    """Create the SimHash band index from an initial corpus; returns the
    number of distinct signatures written (band rows = that × bands)."""
    os.makedirs(os.path.join(index_dir, _NEAR_SUBDIR), exist_ok=True)
    meta_path = os.path.join(index_dir, "meta.json")
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    meta.update({"near_n_shards": int(n_shards), "n_bands": int(n_bands)})
    meta.setdefault("n_shards", int(n_shards))
    with open(meta_path, "w") as f:
        json.dump(meta, f)

    bands = docs.map_batches(_add_simhash, batch_format="pandas").map_batches(
        lambda b: _explode_bands(b, n_bands, n_shards), batch_format="pandas"
    )
    distinct = bucketed_distinct(
        bands, ["band", "band_val", "simhash"], n_buckets=min(n_shards, 64)
    )
    # a duplicated signature duplicates its rows in ALL bands, so
    # distinct band rows = distinct signatures × n_bands exactly
    return _write_near_shard_groups(distinct, index_dir, n_shards) // n_bands


class _NearShardFilter:
    """Per-batch near-dup rejection against the band index: probes ONLY
    the shards this batch's band values touch; per-worker shard cache.
    Keeps rows whose simhash is NOT within ``max_hamming`` of any
    indexed signature."""

    def __init__(self, index_dir: str, n_shards: int, n_bands: int, max_hamming: int):
        from gridfia_ray.text.hashing import check_exhaustive_banding

        check_exhaustive_banding(max_hamming, n_bands)
        self.index_dir = index_dir
        self.n_shards = n_shards
        self.n_bands = n_bands
        self.max_hamming = max_hamming
        self._cache: dict[int, pd.DataFrame] = {}

    def _shard_bands(self, shard: int) -> pd.DataFrame:
        df = self._cache.get(shard)
        if df is None:
            files = sorted(glob.glob(os.path.join(_near_dir(self.index_dir, shard), "*.parquet")))
            if files:
                df = pd.concat([pq.read_table(f).to_pandas() for f in files], ignore_index=True)
            else:
                df = pd.DataFrame(
                    {"band": pd.Series(dtype=np.int32),
                     "band_val": pd.Series(dtype=np.int64),
                     "simhash": pd.Series(dtype=np.int64)}
                )
            self._cache[shard] = df
        return df

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        from gridfia_ray.codecs.phash import hamming64

        if "simhash" not in batch.columns:
            batch = _add_simhash(batch)
        sim = batch["simhash"].to_numpy()
        n = len(batch)
        bands, vals = _band_cols(sim, self.n_bands)
        row_idx = np.tile(np.arange(n), self.n_bands)
        shards = _band_shard_of(bands, vals, self.n_shards)
        near = np.zeros(n, dtype=bool)
        for s in np.unique(shards):
            idx_df = self._shard_bands(int(s))
            if not len(idx_df):
                continue
            m = shards == s
            probe = pd.DataFrame(
                {"band": bands[m], "band_val": vals[m], "__row": row_idx[m]}
            ).drop_duplicates()
            cand = probe.merge(idx_df, on=["band", "band_val"], how="inner")
            if not len(cand):
                continue
            rows = cand["__row"].to_numpy()
            hm = hamming64(sim[rows], cand["simhash"].to_numpy())
            near[rows[hm <= self.max_hamming]] = True
        return batch.loc[~near]


def near_dedup_against_index(
    new_docs: rd.Dataset,
    index_dir: str,
    max_hamming: int = 3,
    n_buckets: int = 64,
) -> rd.Dataset:
    """Rows of ``new_docs`` that are neither near-duplicates (SimHash
    Hamming ≤ ``max_hamming``, exhaustive banding) of any indexed doc
    nor exact-text duplicates within the batch itself (min doc_id
    survives). Carries ``text_hash`` + ``simhash`` so the survivors can
    feed both ``append_to_index`` and ``append_to_near_index``."""
    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    n_shards = int(meta["near_n_shards"])
    n_bands = int(meta["n_bands"])
    from gridfia_ray.text.hashing import check_exhaustive_banding

    check_exhaustive_banding(max_hamming, n_bands)  # eager: fail on the driver
    from gridfia_ray.stages.worker_state import worker_cached

    fresh = new_docs.map_batches(_add_simhash, batch_format="pandas").map_batches(
        worker_cached(
            _NearShardFilter,
            index_dir=index_dir,
            n_shards=n_shards,
            n_bands=n_bands,
            max_hamming=max_hamming,
        ),
        batch_format="pandas",
    )
    hashed = fresh.map_batches(add_text_hash, batch_format="pandas")
    return bucketed_distinct(
        hashed, ["text_hash"], n_buckets=n_buckets, sort_cols=["text_hash", "doc_id"]
    )


def append_to_near_index(survivors: rd.Dataset, index_dir: str) -> int:
    """Register survivor signatures (rows carrying ``simhash``) as new
    band part files — append-native, one new file per touched shard."""
    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    n_shards = int(meta["near_n_shards"])
    n_bands = int(meta["n_bands"])
    bands = survivors.map_batches(
        lambda b: _explode_bands(b, n_bands, n_shards), batch_format="pandas"
    )
    return _write_near_shard_groups(bands, index_dir, n_shards)


def append_to_index(survivors: rd.Dataset, index_dir: str) -> int:
    """Register survivor keys (rows carrying ``text_hash``) as new part
    files — append-native, nothing rewritten; one new file per touched
    shard, written by distributed tasks. Returns #keys appended."""
    with open(os.path.join(index_dir, "meta.json")) as f:
        n_shards = int(json.load(f)["n_shards"])

    def keyed(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[["text_hash"]].copy()
        b["shard"] = _shard_of(b["text_hash"].to_numpy(), n_shards)
        return b

    return _write_shard_groups(
        survivors.map_batches(keyed, batch_format="pandas"), index_dir, n_shards
    )
