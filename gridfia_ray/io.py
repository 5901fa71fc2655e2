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


def write_ipc(ds: rd.Dataset, out_dir: str, compression: str | None = "zstd") -> "pd.DataFrame":
    """Arrow IPC (Feather v2 container) sink: one ``.arrow`` file per
    block, written INSIDE the map tasks (the data never folds through
    the driver), names salted with pid+uuid so concurrent tasks and
    retried tasks can't collide. Returns the small (path, num_rows)
    manifest as a pandas DataFrame — the only thing the driver holds.

    IPC is the exchange format peers that mmap (Feather readers, polars,
    DuckDB ``read_ipc``) expect; parquet stays the analytical store.
    ``compression`` is zstd by default (lz4/None for mmap-zero-copy)."""
    import uuid

    import pandas as pd
    import pyarrow as pa
    import pyarrow.ipc as ipc

    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pd.DataFrame:
        name = f"part-{os.getpid():x}-{uuid.uuid4().hex}.arrow"
        path = os.path.join(out_dir, name)
        opts = ipc.IpcWriteOptions(compression=compression)
        tmp = path + ".tmp"
        with ipc.new_file(tmp, batch.schema, options=opts) as w:
            w.write_table(batch)
        os.replace(tmp, path)  # atomic: readers never see partial files
        return pd.DataFrame({"path": [path], "num_rows": [batch.num_rows]})

    return (
        ds.map_batches(write_block, batch_format="pyarrow", batch_size=None)
        .to_pandas()
        .sort_values("path")
        .reset_index(drop=True)
    )


def read_ipc(paths) -> rd.Dataset:
    """Arrow IPC (Feather v2) source: list the ``.arrow`` files, stream
    each through ``read_binary_files`` and decode inside the map task
    (one file per row → one Arrow table per file; the driver never
    touches payload bytes). Pairs with :func:`write_ipc`."""
    import pyarrow as pa
    import pyarrow.ipc as ipc

    cands = paths if isinstance(paths, (list, tuple)) else [paths]
    files: list[str] = []
    for p in cands:
        if os.path.isdir(p):
            files.extend(
                os.path.join(p, f) for f in sorted(os.listdir(p)) if f.endswith(".arrow")
            )
        else:
            files.append(p)
    if not files:
        raise FileNotFoundError(f"no .arrow files under {paths!r}")

    def decode(batch: pd.DataFrame) -> pa.Table:
        tables = [
            ipc.open_file(pa.BufferReader(b)).read_all() for b in batch["bytes"]
        ]
        return pa.concat_tables(tables) if tables else pa.table({})

    import pandas as pd  # noqa: F401  (decode's batch type)

    return rd.read_binary_files(files).map_batches(decode, batch_format="pandas")
