"""Metadata-clean parquet reads.

The driver-generated testdata parquet carries a ``pandas`` schema-metadata
blob; pyarrow schemas with a metadata dict are UNHASHABLE, so every Ray
map task that bundles 2+ such blocks logs ``Failed to hash the schemas
(for deduplication): unhashable type: 'dict'`` and pays the full
``unify_schemas`` walk instead of the early-exit hash check. Stripping the
metadata at the READ (not with an extra map stage) silences the warning
and restores the cheap path for every downstream stage.

Never calls ``ray.init`` — session ownership belongs to the caller.
"""

from __future__ import annotations

import os

import ray.data as rd


def _first_parquet_file(paths) -> str | None:
    cands = paths if isinstance(paths, (list, tuple)) else [paths]
    for p in cands:
        if not isinstance(p, str):
            return None
        if os.path.isdir(p):
            for f in sorted(os.listdir(p)):
                if f.endswith(".parquet"):
                    return os.path.join(p, f)
        elif os.path.exists(p):
            return p
    return None


def read_parquet_clean(paths, *, columns: list[str] | None = None, **kw) -> rd.Dataset:
    """``rd.read_parquet`` with the pandas metadata blob stripped from the
    block schema. When ``columns`` is given the schema is subset to those
    fields (Ray rejects a full schema combined with a column selection).
    Falls back to a plain read when no file can be probed for its schema
    (the read itself will then raise the usual, clearer error)."""
    if "schema" not in kw:
        first = _first_parquet_file(paths)
        if first is not None:
            import pyarrow as pa
            import pyarrow.parquet as pq

            full = pq.read_schema(first).remove_metadata()
            if columns is not None:
                have = set(full.names)
                if all(c in have for c in columns):
                    kw["schema"] = pa.schema([full.field(c) for c in columns])
            else:
                kw["schema"] = full
    if columns is not None:
        kw["columns"] = columns
    return rd.read_parquet(paths, **kw)
