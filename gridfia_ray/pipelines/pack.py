"""LLM sample packing: greedy first-fit of documents into fixed token
budgets (the standard pre-training batching step — pack short documents
into full-length training sequences instead of padding).

Shape: one bucketed exchange. Documents shard deterministically on
``id % n_shards``; each shard packs independently with the classic
greedy rule over ascending ids (append to the open sequence while it
fits, else start a new one; a document longer than the budget occupies
its own sequence). Sequence ids are globally unique
(``shard * 2^40 + local_seq``) and the assignment is a pure function of
(id, token count, n_shards, budget) — partition- and cluster-size-
invariant, so the pack can be recomputed or resumed shard by shard.

Scale: the per-shard greedy scan is inherently sequential (each
decision depends on the running fill), so it runs as an integer loop
over the shard's token counts inside ``map_groups`` — O(docs/shard)
int work, trivially small next to the exchange that delivered the
shard. At 10^10 documents pick ``n_shards`` so a shard's (id, tokens)
pairs fit one worker (e.g. 10^4 shards → 10^6 rows ≈ 16 MB); packing
quality is unaffected because sequences never cross shards by design.
For skewed or sparse id spaces pass ``pre_hash=True`` to spread ids
with an avalanche hash first (changes which docs co-pack, not the
rule).

The reference has no packing (it is not a text pipeline); this is part
of the training-data operator family the build brief adds.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

SEQ_SHARD_STRIDE = 1 << 40


def pack_sequences(
    docs: rd.Dataset,
    budget: int,
    *,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    n_shards: int = 16,
    pre_hash: bool = False,
) -> rd.Dataset:
    """(id, n_tokens) rows → (id, shard, seq_id, seq_pos, n_tokens)."""
    if budget < 1:
        raise ValueError(f"budget must be ≥ 1, got {budget}")
    if n_shards < 1:
        raise ValueError(f"n_shards must be ≥ 1, got {n_shards}")

    def add_shard(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy()
        if not pre_hash and len(ids) and int(ids.min()) < 0:
            # the documented `id % n_shards` rule is ambiguous for
            # negative ids (python/numpy floor-mod vs C-style vs the
            # uint64 reinterpretation) — refuse instead of silently
            # picking one; pre_hash=True handles arbitrary id spaces
            raise ValueError(
                "pack_sequences with pre_hash=False requires non-negative "
                f"ids (got min {int(ids.min())}); pass pre_hash=True"
            )
        key = ids.view(np.uint64) if ids.dtype == np.int64 else ids.astype(np.uint64)
        if pre_hash:
            from gridfia_ray.ann.ivf import _splitmix64

            key = _splitmix64(key)
        shard = (key % np.uint64(n_shards)).astype(np.int32)
        # strip pandas schema metadata (dict-valued) — the groupby's
        # reduce stage hashes schemas for dedup and chokes on it
        # ("Failed to hash the schemas: unhashable type: 'dict'")
        return batch.replace_schema_metadata(None).append_column(
            "shard", pa.array(shard)
        )

    def pack_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        t = g[token_col].to_numpy(np.int64)
        n = len(t)
        seq = np.empty(n, np.int64)
        pos = np.empty(n, np.int64)
        s = 0
        fill = 0
        p = 0
        for i in range(n):
            ti = int(t[i])
            if fill > 0 and fill + ti > budget:
                s += 1
                fill = 0
                p = 0
            fill += ti
            seq[i] = s
            pos[i] = p
            p += 1
        shard = int(g["shard"].iloc[0])
        return pd.DataFrame(
            {
                id_col: g[id_col].to_numpy(),
                "shard": np.full(n, shard, np.int64),
                "seq_id": shard * SEQ_SHARD_STRIDE + seq,
                "seq_pos": pos,
                token_col: t,
            }
        )

    return (
        docs.map_batches(add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(pack_shard, batch_format="pandas")
    )
