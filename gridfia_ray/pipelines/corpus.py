"""Resumable training-corpus build — the document-side twin of
``pipelines/checkpoint.run_metrics_checkpointed``: shard the corpus,
run the filter chain (exact dedup → integer quality gates → benchmark
decontamination) per shard, write each shard's surviving documents as
partitioned parquet ATOMICALLY, and record per-partition lineage +
metrics in the same ``RunManifest``. ``resume=True`` skips finished
shards, so a crashed 100 TB corpus build restarts at the shard
boundary, not from zero.

Correctness under sharding: the shard key is the TEXT HASH bucket (not
doc_id), so every copy of a duplicated text lands in ONE shard and
per-shard exact dedup equals global exact dedup (the partition-
invariance argument; pinned in tests). Quality gates and
decontamination are per-document, so they shard trivially; the
benchmark snippet list is computed once over the full corpus and
broadcast to every shard run.
"""

from __future__ import annotations

import re
import time

import numpy as np
import pandas as pd
import ray.data as rd

from gridfia_ray.io import read_parquet_clean

from gridfia_ray.state.manifest import RunManifest


def _quality_gate(batch: pd.DataFrame) -> pd.DataFrame:
    ws, alpha = re.compile(r"\S+"), re.compile(r"[A-Za-z]")
    t = batch["text"].fillna("")
    n_tokens = t.map(lambda s: len(ws.findall(s))).to_numpy(np.int64)
    n_alpha = t.map(lambda s: len(alpha.findall(s))).to_numpy(np.int64)
    n_chars = t.str.len().to_numpy(np.int64)
    keep = (n_tokens >= 20) & (n_tokens <= 1000) & (2 * n_alpha >= n_chars)
    return batch.loc[keep]


def run_corpus_filter_checkpointed(
    docs_path: str,
    snippets: list[str],
    out_dir: str,
    *,
    n_shards: int = 8,
    resume: bool = True,
) -> RunManifest:
    """Build the filtered corpus under ``out_dir`` (one ``part=<k>``
    directory per shard + ``manifest.json``); returns the manifest."""
    from gridfia_ray.dedup.docs import add_text_hash, exact_dedup_docs
    from gridfia_ray.stages.dedup_util import bucket_of
    from gridfia_ray.text.decontaminate import snippet_hits

    manifest = RunManifest(out_dir)
    done = manifest.completed() if resume else set()
    for shard in range(n_shards):
        key = f"{shard:04d}"
        if key in done:
            continue
        t0 = time.time()

        def shard_filter(batch: pd.DataFrame, shard=shard) -> pd.DataFrame:
            hashed = add_text_hash(batch)
            keep = bucket_of(hashed, ["text_hash"], n_shards) == shard
            return batch.loc[keep]

        docs = read_parquet_clean(docs_path).map_batches(
            shard_filter, batch_format="pandas"
        )
        n_in = docs.count()
        survivors = exact_dedup_docs(docs).map_batches(
            _quality_gate, batch_format="pandas"
        )
        clean = snippet_hits(
            survivors, snippets, keep_clean=True, attach_all=True
        ).map_batches(
            lambda b: b.loc[b["n_hits"] == 0].drop(columns=["n_hits", "text_hash"]),
            batch_format="pandas",
        )
        manifest.write_shard(
            key,
            clean,
            extra={
                "input_path": str(docs_path),
                "shard": shard,
                "n_shards": n_shards,
                "docs_in": n_in,
                "docs_per_sec": round(n_in / max(time.time() - t0, 1e-9), 1),
            },
        )
    return manifest
