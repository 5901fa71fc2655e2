"""Resumable sharded execution of the metrics pipeline.

Splits the tile corpus into ``n_shards`` deterministic shards of the
shuffle key (salted cell_id derived from ``image_id`` — no decode needed
for the split), runs the flagship pipeline shard by shard, writes each
shard's result-tile parquet atomically and records lineage + metrics in
the manifest. ``resume=True`` skips completed shards.

Within a shard execution stays fully streaming; the shard is the unit of
checkpointing, not of parallelism (each shard still fans out across the
cluster). Shards ≈ the size you are willing to recompute after a crash.
"""

from __future__ import annotations

import time

import pyarrow as pa
import pyarrow.compute as pc

from gridfia_ray.geo.cells import morton_encode
from gridfia_ray.kernels.base import Kernel, KernelContext
from gridfia_ray.pipelines.common import GridSpec, read_tiles
from gridfia_ray.stages.assemble import salted_bucket
from gridfia_ray.state.manifest import RunManifest


def _shard_filter(shard: int, n_shards: int):
    """Keep rows whose image_id-derived cell lands in ``shard``.

    Sharding on the *cell* (not the row) keeps every species row of a
    tile position in one shard, so per-shard results equal the unsharded
    run (the partition-invariance property).
    """

    def fn(batch: pa.Table) -> pa.Table:
        parts = pc.split_pattern(batch["image_id"], "/")
        tr = pc.cast(pc.list_element(parts, 1), pa.int64()).to_numpy()
        tc = pc.cast(pc.list_element(parts, 2), pa.int64()).to_numpy()
        cell = morton_encode(tc, tr)
        keep = salted_bucket(cell, n_shards) == shard
        return batch.filter(pa.array(keep))

    return fn


def run_metrics_checkpointed(
    tiles_path: str,
    kernels: list[Kernel],
    spec: GridSpec,
    catalog: list[str],
    out_dir: str,
    *,
    n_shards: int = 8,
    resume: bool = True,
    ctx: KernelContext | None = None,
    n_buckets: int | None = None,
    precise: bool = False,
) -> RunManifest:
    from gridfia_ray.pipelines.metrics import run_metrics

    manifest = RunManifest(out_dir)
    done = manifest.completed() if resume else set()
    for shard in range(n_shards):
        key = f"{shard:04d}"
        if key in done:
            continue
        t0 = time.time()
        shard_tiles = read_tiles(tiles_path).map_batches(
            _shard_filter(shard, n_shards), batch_format="pyarrow"
        )
        n_in = shard_tiles.count()
        result = run_metrics(
            shard_tiles,
            [k.__class__(**k.params) for k in kernels],  # fresh instances per shard
            spec,
            catalog,
            n_tiles_hint=max(n_in, 1),
            ctx=ctx,
            n_buckets=n_buckets,
            precise=precise,
        )
        manifest.write_shard(
            key,
            result,
            extra={
                "input_path": str(tiles_path),
                "shard": shard,
                "n_shards": n_shards,
                "tiles_in": n_in,
                "kernels": [k.name for k in kernels],
                "tiles_per_sec": round(n_in / max(time.time() - t0, 1e-9), 1),
            },
        )
    return manifest
