"""SQL set operations over key tuples — DISTINCT-semantics INTERSECT /
EXCEPT / UNION in ONE co-bucketed exchange.

``Dataset.union`` is bag concatenation; the SQL set operators also
dedupe and, for INTERSECT/EXCEPT, need both sides' membership per key.
Scale shape: tag each side with a presence bit, per-batch dedup
(combiner — only distinct keys per block travel), hash-bucket on the
key tuple so every key's rows co-locate, and emit per bucket the keys
whose (left, right) membership matches the operator. Neither side is
ever pulled anywhere; output is the distinct key set.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

_OPS = ("intersect", "except", "union")


def keyed_set_op(
    left: rd.Dataset,
    right: rd.Dataset,
    on: list[str],
    op: str,
    n_buckets: int = 32,
) -> rd.Dataset:
    """DISTINCT set operation over the ``on`` tuple: ``intersect`` =
    keys in both, ``except`` = keys in left only, ``union`` = keys in
    either (each key once). Key columns must exist on both sides with
    compatible types; only the key columns survive (set semantics)."""
    if op not in _OPS:
        raise ValueError(f"op must be one of {_OPS}, got {op!r}")

    def tag(side_bit: int):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            g = batch[on].drop_duplicates().copy()
            g["__side"] = np.int64(side_bit)
            return g

        return fn

    tagged = left.map_batches(tag(1), batch_format="pandas").union(
        right.map_batches(tag(2), batch_format="pandas")
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # distinct (key, side) first, then SUM of the side bits (1|2) is
        # the membership mask — one vectorized groupby, no per-group
        # Python apply
        d = g.drop_duplicates(subset=[*on, "__side"])
        m = d.groupby(on, as_index=False)["__side"].sum()
        bits = m["__side"].to_numpy()
        if op == "intersect":
            keep = bits == 3
        elif op == "except":
            keep = bits == 1
        else:
            keep = np.ones(len(m), bool)
        return m.loc[keep, on]

    from gridfia_ray.stages.agg_util import bucketed_bucket_map

    return bucketed_bucket_map(
        tagged, on, per_bucket, n_buckets=n_buckets, coalesce=True
    )
