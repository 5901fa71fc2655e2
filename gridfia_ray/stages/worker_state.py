"""Worker-process-cached stateful stages (the task-mode alternative to
actor pools).

An actor pool gives per-actor state but pays a fresh process spawn +
module imports for EVERY pipeline execution (~2-4 s × pool size) —
dominant for interactive-scale runs and the reason back-to-back
pipelines under-scale. Ray *task* workers, by contrast, persist across
pipeline executions; a module-level cache keyed per pipeline build gives
the same build-once-per-worker state with elastic task scheduling and
zero pool spin-up after the first pipeline.

Trade-offs vs actors (documented, both modes kept):
  * state lives as long as the worker process → the cache is LRU-capped;
  * no per-actor restart semantics (Ray task retries rebuild state
    lazily, which is equivalent for deterministic state);
  * no pool-size backpressure — fine for light state (prepared
    polygons, parquet handles), wrong for models that must count
    instances.
"""

from __future__ import annotations

import uuid
from collections import OrderedDict

_CACHE: OrderedDict[str, object] = OrderedDict()
_CACHE_MAX = 8


def worker_cached(cls, **kwargs):
    """Return a plain function for ``map_batches`` that constructs
    ``cls(**kwargs)`` once per worker process (per pipeline build)."""
    key = f"{cls.__module__}.{cls.__qualname__}:{uuid.uuid4().hex}"

    def fn(batch):
        st = _CACHE.get(key)
        if st is None:
            st = cls(**kwargs)
            _CACHE[key] = st
            while len(_CACHE) > _CACHE_MAX:
                _CACHE.popitem(last=False)
        else:
            _CACHE.move_to_end(key)
        return st(batch)

    fn.__name__ = f"cached_{cls.__name__}"
    return fn
