"""Shared pipeline plumbing: grid spec, decode stage wiring, sizing."""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

import ray
import ray.data as rd

from gridfia_ray.context import tune_context
from gridfia_ray.stages.decode import DecoderActor, species_prefilter


@dataclass(frozen=True)
class GridSpec:
    """World-aligned tile/cell grid: one tile ↔ one base cell
    (SURVEY.md §7.2 step 3 — the load-bearing partitioning choice)."""

    origin_x: float
    origin_y: float
    px: float  # pixel size (meters)
    tile: int  # pixels per tile side

    @property
    def cell_size(self) -> float:
        return self.tile * self.px

    @classmethod
    def from_fixture_meta(cls, meta: dict) -> "GridSpec":
        tf = meta["transform"]
        return cls(origin_x=tf[0], origin_y=tf[3], px=tf[1], tile=meta["tile"])


def cluster_cpus() -> int:
    try:
        return max(1, int(ray.cluster_resources().get("CPU", 4)))
    except Exception:
        return 4


def read_tiles(source) -> rd.Dataset:
    """Tile table from a parquet path — or pass through a Dataset /
    pyarrow Table (in-memory edge-case fixtures).

    Blocks are pinned to one-per-file (``override_num_blocks``): letting
    Ray sub-split a file's table produces *slices* of the shared binary
    pixel buffer, and serializing each slice to the object store rewrites
    the whole parent buffer — a measured 3-4× slowdown on wide-binary
    rows. Tile stores are therefore written as many ~100 MB files (one
    per species here), which also gives file-level species pruning.
    """
    tune_context()
    if isinstance(source, rd.Dataset):
        return source
    if not isinstance(source, str):
        return rd.from_arrow(source)
    n_files = 0
    if os.path.isdir(source):
        n_files = sum(1 for f in os.listdir(source) if f.endswith(".parquet"))
    return rd.read_parquet(source, override_num_blocks=max(n_files, 1))


def read_tiles_species(source, species: list[str]) -> rd.Dataset | None:
    """File-level species pruning: per-species stores (part-{code}.parquet)
    read ONLY the selected species' files — the cheapest possible filter
    (nothing else leaves storage). Returns None when the layout doesn't
    allow it (caller falls back to read + row filter)."""
    if not isinstance(source, str) or not os.path.isdir(source):
        return None
    paths = [os.path.join(source, f"part-{c}.parquet") for c in species]
    if not all(os.path.exists(p) for p in paths):
        return None
    tune_context()
    return rd.read_parquet(paths, override_num_blocks=len(paths))


def decoded_tiles(
    tiles: rd.Dataset,
    spec: GridSpec,
    *,
    include_total: bool = False,
    species: list[str] | None = None,
    verify_phash: bool = False,
    clamp_negative: bool = False,
    batch_size: int = 256,
    concurrency=None,
    task_mode: bool = False,
) -> rd.Dataset:
    """tiles → pre-decode species prune → decoder actor pool.

    ``clamp_negative`` is the reference's ingest nodata clean (M20,
    ``gridfia/examples/utils.py:320-322``): negative sentinel pixels
    become 0 before any kernel sees them.

    ``task_mode=True`` runs the decoder as worker-cached TASKS
    (stages/worker_state) instead of an actor pool: identical per-row
    decode, no ~1-2 s pool spin-up per pipeline execution — the right
    call for interactive/driver-window runs of short pipelines; keep
    the actor pool (default) for long-running decode stages where pool
    backpressure and restart semantics matter."""
    if species is not None:
        tiles = tiles.map_batches(
            species_prefilter(codes_keep=species), batch_format="pyarrow"
        )
    elif not include_total:
        tiles = tiles.map_batches(
            species_prefilter(codes_drop=["0000"]), batch_format="pyarrow"
        )
    kwargs = dict(
        origin_x=spec.origin_x,
        origin_y=spec.origin_y,
        cell_size=spec.cell_size,
        verify_phash=verify_phash,
        clamp_negative=clamp_negative,
    )
    if task_mode:
        from gridfia_ray.stages.worker_state import worker_cached

        return tiles.map_batches(
            worker_cached(DecoderActor, **kwargs),
            batch_format="pyarrow",
            batch_size=batch_size,
            num_cpus=1,
        )
    if concurrency is None:
        concurrency = (1, max(2, cluster_cpus() // 2))
    return tiles.map_batches(
        DecoderActor,
        fn_constructor_kwargs=kwargs,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def pick_buckets(n_tiles: int, tile_px: int, n_species: int, target_mb: int = 128) -> int:
    """Bucket count so one assembled bucket ≈ target_mb of decoded f32."""
    bytes_total = n_tiles * tile_px * tile_px * 4
    by_size = math.ceil(bytes_total / (target_mb * 1024 * 1024))
    by_cpu = cluster_cpus() * 2
    return max(8, min(4096, max(by_size, by_cpu)))
