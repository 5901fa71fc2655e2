"""``ray job submit`` entrypoint (the north-rule delivery shape).

    ray job submit --working-dir . -- python -m gridfia_ray.job \
        --config cfg/job.json [--tiles PATH] [--out DIR] [--no-resume]

Loads a ``JobSpec`` (S16 config document: enabled calculations +
parameters, JSON or YAML), infers the tile grid from the store itself
(``GridFIARay.from_store`` — no side-channel metadata needed), and runs
the flagship metrics pipeline:

* with ``output_dir``: resumable sharded execution
  (``run_metrics_checkpointed``) — per-shard parquet written atomically,
  lineage + tile-count/throughput metrics recorded in the manifest,
  completed shards skipped on re-submit (mid-pipeline resume);
* without: one streaming run, result row count to stdout.

Prints ONE JSON line (machine-readable job summary) and exits 0 on
success — the contract a job scheduler wants. Owns its Ray session
(``ray.init`` guarded) per the driver contract: library code never
calls ``ray.init``, CLI entry points may.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="gridfia_ray.job", description=__doc__)
    p.add_argument("--config", required=True, help="JobSpec JSON/YAML path")
    p.add_argument("--tiles", help="override tiles_path from the config")
    p.add_argument("--out", help="override output_dir from the config")
    p.add_argument("--shards", type=int, help="override n_shards")
    p.add_argument("--no-resume", action="store_true", help="recompute all shards")
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address="auto" if _on_cluster() else "local",
                 include_dashboard=False, logging_level="ERROR")

    from gridfia_ray.api import GridFIARay
    from gridfia_ray.config import JobSpec
    from gridfia_ray.context import tune_context
    from gridfia_ray.pipelines.checkpoint import run_metrics_checkpointed

    tune_context()
    spec = JobSpec.load(args.config)
    tiles = args.tiles or spec.tiles_path
    out_dir = args.out or spec.output_dir
    n_shards = args.shards or spec.n_shards
    resume = spec.resume and not args.no_resume

    api = GridFIARay.from_store(tiles)
    catalog = api.list_species(tiles)["species_code"].tolist()
    if "0000" not in catalog:
        catalog = ["0000", *catalog]
    kernels = spec.build_kernels()

    t0 = time.time()
    if out_dir:
        manifest = run_metrics_checkpointed(
            tiles, kernels, api.spec, catalog, out_dir,
            n_shards=n_shards, resume=resume, precise=spec.precise,
        )
        shards = manifest.completed()
        summary = {
            "status": "ok",
            "mode": "checkpointed",
            "output_dir": out_dir,
            "shards_done": len(shards),
            "n_shards": n_shards,
            "kernels": [k.name for k in kernels],
            "wall_sec": round(time.time() - t0, 2),
        }
    else:
        from gridfia_ray.pipelines.metrics import run_metrics

        result = run_metrics(tiles, kernels, api.spec, catalog, precise=spec.precise)
        summary = {
            "status": "ok",
            "mode": "streaming",
            "result_tiles": result.count(),
            "kernels": [k.name for k in kernels],
            "wall_sec": round(time.time() - t0, 2),
        }
    print(json.dumps(summary))
    return 0


def _on_cluster() -> bool:
    """ray job submit sets RAY_ADDRESS to the cluster; bare local runs
    don't (or set it to 'local')."""
    import os

    addr = os.environ.get("RAY_ADDRESS", "")
    return addr not in ("", "local")


if __name__ == "__main__":
    sys.exit(main())
