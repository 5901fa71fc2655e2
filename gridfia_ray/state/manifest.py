"""Checkpoint manifest: per-partition lineage + metrics + resume.

The reference's only incremental state is the ``num_species`` append
counter (``gridfia/utils/zarr_utils.py:781-814``); a failed metrics run
restarts from zero. The north rule requires per-partition lineage +
metrics and mid-pipeline resume. Design (SURVEY.md §4.5):

* output is partitioned by a deterministic shard of the shuffle key
  (salted cell_id) — one directory per shard, written atomically
  (tmp dir + rename);
* ``manifest.json`` records, per completed shard: input lineage (source
  path + filter), rows in/out, tile count, wall seconds, throughput —
  rewritten atomically after each shard;
* resume = skip shards present in the manifest (the anti-join of shards
  vs completed set). A crashed shard leaves only a tmp dir, never a
  half-visible output.
"""

from __future__ import annotations

import json
import os
import shutil
import time


class RunManifest:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.path = os.path.join(out_dir, "manifest.json")
        os.makedirs(out_dir, exist_ok=True)
        self._data = {"created_at": time.time(), "partitions": {}}
        if os.path.exists(self.path):
            with open(self.path) as f:
                self._data = json.load(f)

    @property
    def partitions(self) -> dict:
        return self._data["partitions"]

    def completed(self) -> set[str]:
        return set(self._data["partitions"])

    def record(self, key: str, **entry) -> None:
        self._data["partitions"][key] = entry
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._data, f, indent=1, sort_keys=True)
        os.replace(tmp, self.path)

    def shard_dir(self, key: str) -> str:
        return os.path.join(self.out_dir, f"part={key}")

    def write_shard(self, key: str, dataset, extra: dict | None = None) -> dict:
        """Atomically write one shard's Dataset and record it."""
        final = self.shard_dir(key)
        tmp = final + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        t0 = time.time()
        dataset.write_parquet(tmp)
        import pyarrow.parquet as pq

        rows = 0
        for fn in os.listdir(tmp):
            if fn.endswith(".parquet"):
                rows += pq.ParquetFile(os.path.join(tmp, fn)).metadata.num_rows
        if os.path.exists(final):
            shutil.rmtree(final)
        os.replace(tmp, final)
        entry = {
            "output_path": final,
            "rows_out": rows,
            "wall_sec": round(time.time() - t0, 3),
            **(extra or {}),
        }
        self.record(key, **entry)
        return entry
