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
    with open(os.path.join(index_dir, "meta.json"), "w") as f:
        json.dump({"n_shards": int(n_shards)}, f)

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
