"""Bucketed high-cardinality aggregation.

``Dataset.groupby(...).aggregate(...)`` pays per-group Python overhead in
the reduce phase — fine for dozens of groups (zonal stats, species
stats), pathological for 10^5+ groups (user×hour windows, per-customer
revenue: measured ~0.3 ms/group). The scale shape: partial-aggregate per
batch (caller), hash the keys into ``n_buckets`` buckets, shuffle on the
bucket, and merge each bucket with ONE vectorized pandas groupby. Python
cost is O(buckets), group cost is vectorized.

``agg_map`` uses pandas named-aggregation form:
``{"out_col": ("in_col", "sum"|"min"|"max"|...)}`` — every reducer must
be merge-associative on the partials (sum of sums, min of mins, ...).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd


def bucketed_agg(
    partials: rd.Dataset,
    keys: list[str],
    agg_map: dict[str, tuple[str, str]],
    n_buckets: int = 32,
) -> rd.Dataset:
    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        from gridfia_ray.stages.dedup_util import bucket_of

        batch = batch.copy()
        batch["__bucket"] = bucket_of(batch, keys, n_buckets)
        return batch

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        out = group.groupby(keys, as_index=False).agg(**agg_map)
        return out

    # coalesce the (light) partials to ~one block per bucket before the
    # sort shuffle: the sort's cost is dominated by per-block task
    # overhead (measured 3.4s -> 1.4s on a 204-block 1.4 MB input)
    return (
        partials.map_batches(add_bucket, batch_format="pandas")
        .repartition(n_buckets)
        .groupby("__bucket")
        .map_groups(merge, batch_format="pandas")
    )
