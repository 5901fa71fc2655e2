"""Distributed joins: large×large shuffle hash join and as-of join.

The repo's relational queries broadcast small dimension sides
(``contract.py`` rel_* family — the right call when one side fits in a
worker). This module covers the two shapes broadcast can't:

* ``shuffle_hash_join`` — both sides large: a keyed hash-shuffle join
  where EVERY block of both inputs moves once, partitioned on the join
  key. Ray Data 2.49 ships a native hash-shuffle ``Dataset.join``
  (aggregator-actor based); this wrapper pins the scale-relevant knobs
  (partition count sized to the cluster, explicit key columns) and
  documents the contract rather than re-implementing the exchange.
* ``asof_join`` — the reference-free temporal join Ray Data lacks
  (brief: "as-of join ... implement as a composition of map_batches +
  groupby().map_groups + sort if semantics allow"): for every left row,
  the latest right row with ``on``-value <= the left's, within an
  equality group ``by``. Used for event attribution (click -> latest
  prior view). Implemented as ONE bucketed exchange co-partitioning
  both sides on ``by`` followed by a per-bucket vectorized
  ``pd.merge_asof`` — the same bucketed-exchange altitude as
  ``stages/agg_util.bucketed_agg``, so key routing is identical across
  the engine (``bucket_of`` is THE hash).

Scale notes (100 TB): the asof exchange carries only the projected
columns (callers must pre-select); per-bucket state is one sort +
searchsorted (merge_asof) — O(n log n) in the bucket, no Python row
loop. Skewed ``by`` keys concentrate in one bucket; n_buckets spreads
distinct keys, and a single hot key is bounded by that key's own row
count (same property as every keyed reduce here).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from gridfia_ray.stages.agg_util import to_arrow


def shuffle_hash_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: list[str],
    right_on: list[str] | None = None,
    join_type: str = "inner",
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Large×large keyed join: hash-shuffle BOTH sides on the key.

    Use only when neither side fits in a worker (otherwise broadcast —
    ``contract.py`` rel_top_customers pattern — avoids the all-to-all).
    ``num_partitions`` defaults to ~2 blocks per CPU so no aggregator
    actor holds more than ~1/(2·cpus) of the data.
    """
    from gridfia_ray.pipelines.common import cluster_cpus

    if num_partitions is None:
        num_partitions = max(8, 2 * cluster_cpus())
    return left.join(
        right,
        join_type=join_type,
        num_partitions=num_partitions,
        on=tuple(on),
        right_on=tuple(right_on) if right_on is not None else None,
    )


def interval_join(
    points: rd.Dataset,
    intervals: rd.Dataset,
    by: str,
    on: str,
    lo: str,
    hi: str,
    n_buckets: int = 32,
) -> rd.Dataset:
    """Range join: every (point, interval) pair in the same ``by`` group
    with ``lo <= point[on] <= hi`` (both ends inclusive) — the brief's
    "range join" custom operator (event-to-window attribution).

    Same column contract as :func:`asof_join`: ``by`` on both sides with
    one dtype; all other names disjoint; no nulls in payloads. ``on``
    lives on the points side, ``lo``/``hi`` on the intervals side, all
    three mutually comparable.

    Shape: ONE bucketed exchange co-partitioning both sides on ``by``
    (``bucket_of`` — the engine-wide key hash), then a per-bucket
    vectorized equi-merge on ``by`` + containment filter. The merge's
    intermediate is bounded by Σ_key |points_k|·|intervals_k| — fine when
    intervals-per-key is small (the attribution shape); a key with many
    long overlapping intervals needs domain banding on ``on`` instead,
    which composes with this exchange but is not implemented here.
    """
    lschema = points.schema()
    rschema = intervals.schema()
    lcols, rcols = list(lschema.names), list(rschema.names)
    for req, side, cols in ((by, "points", lcols), (on, "points", lcols),
                            (by, "intervals", rcols), (lo, "intervals", rcols),
                            (hi, "intervals", rcols)):
        if req not in cols:
            raise ValueError(f"{side} side is missing required column {req!r}")
    lpay = [c for c in lcols if c != by]
    rpay = [c for c in rcols if c != by]
    clash = set(lpay) & set(rpay)
    if clash:
        raise ValueError(
            f"column names must be disjoint across sides (besides {by!r}); "
            f"both have {sorted(clash)} — rename before joining"
        )
    ltypes = dict(zip(lschema.names, lschema.types))
    rtypes = dict(zip(rschema.names, rschema.types))
    if ltypes[by] != rtypes[by]:
        raise ValueError(f"by dtypes differ: {ltypes[by]} vs {rtypes[by]}")

    ex_fields = (
        [(by, ltypes[by])]
        + [(c, ltypes[c]) for c in lpay]
        + [(c, rtypes[c]) for c in rpay]
        + [("__side", pa.int8()), ("__bucket", pa.int32())]
    )
    ex_schema = pa.schema(ex_fields)
    int_like = {
        name for name, t in ex_fields
        if pa.types.is_integer(t) and name not in ("__side", "__bucket")
    }

    def tag(side: int, own: list[str]):
        def fn(batch: pd.DataFrame) -> pa.Table:
            from gridfia_ray.stages.dedup_util import bucket_of

            n = len(batch)
            arrays = []
            for name, typ in ex_fields:
                if name == "__side":
                    arrays.append(pa.array(np.full(n, side, np.int8), typ))
                elif name == "__bucket":
                    arrays.append(pa.array(bucket_of(batch, [by], n_buckets), typ))
                elif name == by or name in own:
                    arrays.append(pa.Array.from_pandas(batch[name], type=typ))
                else:
                    arrays.append(pa.nulls(n, typ))
            return pa.Table.from_arrays(arrays, schema=ex_schema)

        return fn

    def merge(group: pd.DataFrame) -> pa.Table:
        side = group["__side"].to_numpy()
        pf = group.loc[side == 0, [by] + lpay].copy()
        itv = group.loc[side == 1, [by] + rpay].copy()
        for frame, cols in ((pf, [by] + lpay), (itv, [by] + rpay)):
            for name in cols:
                if name in int_like:
                    frame[name] = frame[name].astype(np.int64)
        out = pf.merge(itv, on=by, how="inner")
        out = out[(out[on] >= out[lo]) & (out[on] <= out[hi])]
        return to_arrow(out)

    return (
        points.map_batches(tag(0, lpay), batch_format="pandas")
        .union(intervals.map_batches(tag(1, rpay), batch_format="pandas"))
        .repartition(n_buckets)
        .groupby("__bucket")
        .map_groups(merge, batch_format="pandas")
    )


def asof_join(
    left: rd.Dataset,
    right: rd.Dataset,
    by: str,
    on: str,
    how: str = "inner",
    direction: str = "backward",
    tolerance=None,
    n_buckets: int = 32,
) -> rd.Dataset:
    """For each left row: the latest (``direction='backward'``) right
    row with ``right[on] <= left[on]`` in the same ``by`` group (or
    earliest >= for ``'forward'``; nearest for ``'nearest'``).

    Column contract: ``by`` and ``on`` must exist on both sides with
    identical dtypes; every OTHER column name must be disjoint between
    the two sides (project/rename first — e.g. copy the right's
    timestamp into ``ts_r`` if the match time is wanted in the output).
    Null values in payload columns are not supported (integer columns
    round-trip through the padded exchange; a null would be
    indistinguishable from padding) — pre-fill or drop.

    Tie-break: among right rows equal on (``by``, ``on``), the winner is
    the last row under a sort by all right columns — deterministic and
    partition-invariant regardless of input block order.

    ``how='inner'`` drops unmatched left rows; ``'left'`` keeps them
    with nulls in the right columns (integer right columns then surface
    as pandas float64 — the unavoidable pandas null-int representation).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    lschema = left.schema()
    rschema = right.schema()
    lcols = list(lschema.names)
    rcols = list(rschema.names)
    for req, side, cols in ((by, "left", lcols), (on, "left", lcols),
                            (by, "right", rcols), (on, "right", rcols)):
        if req not in cols:
            raise ValueError(f"{side} side is missing required column {req!r}")
    lpay = [c for c in lcols if c not in (by, on)]
    rpay = [c for c in rcols if c not in (by, on)]
    clash = set(lpay) & set(rpay)
    if clash:
        raise ValueError(
            f"payload column names must be disjoint across sides; both have "
            f"{sorted(clash)} — rename before joining"
        )

    ltypes = dict(zip(lschema.names, lschema.types))
    rtypes = dict(zip(rschema.names, rschema.types))
    if ltypes[by] != rtypes[by] or ltypes[on] != rtypes[on]:
        raise ValueError(
            f"key dtypes differ: by {ltypes[by]} vs {rtypes[by]}, "
            f"on {ltypes[on]} vs {rtypes[on]}"
        )
    # canonical exchange schema: keys, left payload, right payload, tags.
    # Padding the absent side's columns with typed nulls keeps ONE arrow
    # schema across all blocks (pandas would degrade int64 -> float64 and
    # churn the executor's schema cache).
    ex_fields = (
        [(by, ltypes[by]), (on, ltypes[on])]
        + [(c, ltypes[c]) for c in lpay]
        + [(c, rtypes[c]) for c in rpay]
        + [("__side", pa.int8()), ("__bucket", pa.int32())]
    )
    ex_schema = pa.schema(ex_fields)
    int_like = {
        name: t for name, t in ex_fields
        if pa.types.is_integer(t) and name not in ("__side", "__bucket")
    }

    def tag(side: int, own: list[str], other: list[str]):
        def fn(batch: pd.DataFrame) -> pa.Table:
            from gridfia_ray.stages.dedup_util import bucket_of

            n = len(batch)
            arrays = []
            for name, typ in ex_fields:
                if name == "__side":
                    arrays.append(pa.array(np.full(n, side, np.int8), typ))
                elif name == "__bucket":
                    arrays.append(
                        pa.array(bucket_of(batch, [by], n_buckets), typ)
                    )
                elif name in (by, on) or name in own:
                    arrays.append(
                        pa.Array.from_pandas(batch[name], type=typ)
                    )
                else:  # other side's payload: typed nulls
                    arrays.append(pa.nulls(n, typ))
            return pa.Table.from_arrays(arrays, schema=ex_schema)

        return fn

    def merge(group: pd.DataFrame) -> pa.Table:
        side = group["__side"].to_numpy()
        lf = group.loc[side == 0, [by, on] + lpay].copy()
        rf = group.loc[side == 1, [by, on] + rpay].copy()
        # padded ints came back as float64 — restore the real side's
        # dtype (its rows carry no nulls by the column contract)
        for frame, cols in ((lf, [by] + lpay), (rf, [by] + rpay)):
            for name in cols:
                if name in int_like:
                    frame[name] = frame[name].astype(np.int64)
        # deterministic tie-break: stable-sort right by every column so
        # equal (by, on) rows always resolve the same way
        rf = rf.sort_values([on] + rpay, kind="mergesort").reset_index(drop=True)
        lf = lf.sort_values(on, kind="mergesort").reset_index(drop=True)
        rf["__m"] = np.int8(1)
        out = pd.merge_asof(
            lf, rf, on=on, by=by, direction=direction, tolerance=tolerance
        )
        if how == "inner":
            out = out[out["__m"].notna()]
        out = out.drop(columns="__m")
        if how == "inner":
            for name in rpay:
                if name in int_like:
                    out[name] = out[name].astype(np.int64)
        return to_arrow(out)

    lf_tagged = left.map_batches(tag(0, lpay, rpay), batch_format="pandas")
    rf_tagged = right.map_batches(tag(1, rpay, lpay), batch_format="pandas")
    return (
        lf_tagged.union(rf_tagged)
        .repartition(n_buckets)
        .groupby("__bucket")
        .map_groups(merge, batch_format="pandas")
    )
