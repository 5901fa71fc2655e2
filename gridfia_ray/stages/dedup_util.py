"""Bucketed distinct/first — the scale-safe shape for keyed dedup.

``groupby(key).map_groups`` makes one Python group call *per key*; with
10^12 keys that is the wrong altitude. Instead: hash the key columns
into ``n_buckets`` buckets (deterministic SipHash via
``pd.util.hash_pandas_object``), shuffle on the bucket, and pick winners
per bucket vectorized. Same result, O(buckets) Python calls.

Payload discipline: heavy columns (tile payload bytes) never convert to
Python objects — a *local* per-batch dedup runs before the shuffle (the
combiner: most duplicates are co-located with their original), and the
per-bucket winner selection computes positions on the light key/sort
columns only, then ``pyarrow.Table.take``s the winning rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def bucket_of(df: pd.DataFrame, keys: list[str], n_buckets: int) -> np.ndarray:
    """THE key→bucket function (deterministic SipHash xor-combine mod
    n). Every bucketed stage must route through this one definition —
    co-partitioning assumptions break silently if two stages hash keys
    differently."""
    h = np.zeros(len(df), dtype=np.uint64)
    for k in keys:
        h ^= pd.util.hash_pandas_object(df[k], index=False).to_numpy()
    return (h % np.uint64(n_buckets)).astype(np.int32)


_bucket_of = bucket_of  # backwards-compat alias (internal callers)


def _winner_positions(light: pd.DataFrame, keys: list[str], sort_cols: list[str]) -> np.ndarray:
    order = light.sort_values(sort_cols, kind="mergesort")
    keep = order.drop_duplicates(keys, keep="first")
    return np.sort(keep.index.to_numpy())


def bucketed_distinct(
    ds: rd.Dataset,
    keys: list[str],
    n_buckets: int = 64,
    sort_cols: list[str] | None = None,
    coalesce: bool = True,
) -> rd.Dataset:
    """One row per distinct key tuple; winner = first after sorting by
    ``sort_cols`` (default: the keys themselves) — deterministic.

    ``coalesce`` merges the locally-deduped stream to ~one block per
    bucket before the sort shuffle — the sort pays per-block task
    overhead, so hundreds of tiny blocks dominate its cost. Disable for
    payload-heavy inputs where the extra copy outweighs task savings."""
    sort_cols = sort_cols or keys
    light_cols = list(dict.fromkeys([*keys, *sort_cols]))

    def local_dedup_and_bucket(batch: pa.Table) -> pa.Table:
        light = batch.select(light_cols).to_pandas().reset_index(drop=True)
        pos = _winner_positions(light, keys, sort_cols)
        batch = batch.take(pa.array(pos))
        b = _bucket_of(light.iloc[pos].reset_index(drop=True), keys, n_buckets)
        # strip the pandas metadata a from_pandas source embeds — its
        # dicts defeat Ray's schema-dedup hashing downstream
        return batch.append_column(
            "__bucket", pa.array(b, pa.int32())
        ).replace_schema_metadata(None)

    def dedup(group: pa.Table) -> pa.Table:
        light = group.select(light_cols).to_pandas().reset_index(drop=True)
        pos = _winner_positions(light, keys, sort_cols)
        out = group.take(pa.array(pos))
        return out.drop_columns(["__bucket"]).replace_schema_metadata(None)

    out = ds.map_batches(local_dedup_and_bucket, batch_format="pyarrow")
    if coalesce:
        out = out.repartition(n_buckets)
    return out.groupby("__bucket").map_groups(dedup, batch_format="pyarrow")


def bucketed_candidate_pairs(
    ds: rd.Dataset,
    bucket_keys: list[str],
    pair_fn,
    n_buckets: int = 64,
    coalesce: bool = True,
) -> rd.Dataset:
    """LSH-band candidate-pair generation at the right altitude.

    ``groupby(band, band_hash)`` makes one Python group call per LSH
    bucket — O(rows × bands) tiny groups. Instead the band buckets hash
    into ``n_buckets`` coarse buckets; inside each coarse bucket,
    singleton band-buckets are dropped *vectorized* (``duplicated``),
    and ``pair_fn(sub)`` runs only on band-buckets that actually hold
    ≥ 2 members (the rare collision case).
    """

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["__bucket"] = bucket_of(batch, bucket_keys, n_buckets)
        return batch

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        cand = group[group.duplicated(bucket_keys, keep=False)]
        outs = []
        for _, sub in cand.groupby(bucket_keys, sort=False):
            out = pair_fn(sub)
            if len(out):
                outs.append(out)
        if not outs:
            return pair_fn(group.iloc[0:0])
        return pd.concat(outs, ignore_index=True)

    out = ds.map_batches(add_bucket, batch_format="pandas")
    if coalesce:  # band rows are id-only after payload slimming — light
        out = out.repartition(n_buckets)
    return out.groupby("__bucket").map_groups(pairs, batch_format="pandas")


def attach_pair_attrs(
    pairs: rd.Dataset,
    attrs: rd.Dataset,
    id_col: str,
    attr_cols: list[str],
    n_buckets: int = 32,
    max_broadcast_ids: int = 2_000_000,
    max_broadcast_bytes: int = 256 << 20,
) -> rd.Dataset:
    """Join per-id attributes onto candidate pairs (a, b) as
    ``{col}_a`` / ``{col}_b`` — the payload-slim LSH shape: band rows
    carry ids only, heavy attributes (signatures, embeddings) ship
    exactly once, to the pairs that need them, instead of being
    replicated into every band row (round-1 perf item 7).

    Fast path (candidate pairs are rare by LSH design): the distinct
    pair-id set folds on the driver, the attr table is broadcast-
    filtered to those ids and shipped via ``ray.put`` — zero extra
    shuffle. Falls back to a fully distributed exploded join (pair
    sides and attrs co-bucketed by id hash, two bucketed merges) when
    the id set exceeds ``max_broadcast_ids`` OR when the estimated
    broadcast payload (ids × mean attr row width, sampled from the
    attrs' first block) exceeds ``max_broadcast_bytes`` — an id-count
    bound alone would still pull gigabytes through the driver for wide
    attrs like 1 KB minhash signatures (VERDICT r3 finding #1).
    """
    import ray

    # Guard BEFORE any driver pull (VERDICT r2 finding #2): the per-batch
    # unique id rows stay in the object store (materialize), and the
    # broadcast-vs-distributed fork is decided on their COUNT — an upper
    # bound on the distinct id count (an id seen in k batches contributes
    # k rows), so the bound is conservative: a degenerate pair explosion
    # routes to the distributed join without ever materializing ids on
    # the driver. Same pattern as dup_clusters (dedup/docs.py).
    def id_parts(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0 or "a" not in b.columns:  # columnless empty block
            return pd.DataFrame({id_col: pd.Series(dtype=np.int64)})
        return pd.DataFrame({id_col: pd.concat([b["a"], b["b"]]).unique()})

    id_parts_ds = pairs.map_batches(id_parts, batch_format="pandas").materialize()
    n_ids_bound = id_parts_ds.count()

    # byte-aware guard: mean attr row width from ONE sampled block (no
    # full materialization) × the id-count bound
    try:
        sample = attrs.select_columns([id_col, *attr_cols]).limit(512).take_batch(
            512, batch_format="pyarrow"
        )
        mean_attr_width = sample.nbytes / max(1, sample.num_rows)
    except (ValueError, StopIteration):  # empty attrs — nothing to ship
        mean_attr_width = 0.0
    est_broadcast_bytes = n_ids_bound * mean_attr_width

    if n_ids_bound == 0:
        # zero pairs: emit one TYPED empty block carrying the attr
        # columns so downstream verify stages see their schema
        def empty_out(batch: pd.DataFrame) -> pd.DataFrame:
            cols = {"a": pd.Series(dtype=np.int64),
                    "b": pd.Series(dtype=np.int64)}
            for c in attr_cols:
                cols[f"{c}_a"] = pd.Series(dtype=object)
                cols[f"{c}_b"] = pd.Series(dtype=object)
            return pd.DataFrame(cols)

        return pairs.map_batches(empty_out, batch_format="pandas")

    if n_ids_bound <= max_broadcast_ids and est_broadcast_bytes <= max_broadcast_bytes:
        idf = id_parts_ds.to_pandas()  # columnless when zero pairs
        id_set = set(idf[id_col].tolist()) if len(idf) else set()

        def filt(batch: pd.DataFrame) -> pa.Table:
            # Arrow out: an empty pandas block with object columns trips
            # Ray's size estimator ("vectorize on size 0") on every poll
            from gridfia_ray.stages.agg_util import to_arrow

            return to_arrow(batch.loc[batch[id_col].isin(id_set), [id_col, *attr_cols]])

        # O(pairs) rows with attrs — driver-small by the LSH-rarity
        # assumption that gates this path
        sub = attrs.map_batches(filt, batch_format="pandas").to_pandas()
        sub = sub.drop_duplicates(id_col).set_index(id_col)
        sub_ref = ray.put(sub)

        def attach(batch: pd.DataFrame) -> pd.DataFrame:
            lut = ray.get(sub_ref)
            out = batch.copy()
            for c in attr_cols:
                out[f"{c}_a"] = lut[c].reindex(batch["a"]).to_numpy()
                out[f"{c}_b"] = lut[c].reindex(batch["b"]).to_numpy()
            return out

        return pairs.map_batches(attach, batch_format="pandas")

    # fallback: distributed exploded join, no driver materialization.
    # Both legs emit one canonical object-dtype schema so union() sees
    # matching blocks; extra pair columns beyond (a, b) are dropped.
    cols_canon = ["__pa", "__pb", "__side", id_col, *attr_cols]

    def pair_sides(batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        out = pd.DataFrame(
            {
                "__pa": np.tile(batch["a"].to_numpy(), 2),
                "__pb": np.tile(batch["b"].to_numpy(), 2),
                "__side": np.repeat(np.array(["a", "b"]), n),
                id_col: np.concatenate([batch["a"].to_numpy(), batch["b"].to_numpy()]),
            }
        ).astype(object)
        for c in attr_cols:
            out[c] = None
        return out[cols_canon]

    def attr_rows(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[[id_col, *attr_cols]].copy().astype(object)
        out["__pa"] = None
        out["__pb"] = None
        out["__side"] = ""
        return out[cols_canon]

    def bucket_by(cols):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            batch = batch.copy()
            batch["__bucket"] = bucket_of(batch, cols, n_buckets)
            return batch

        return fn

    def join_by_id(group: pd.DataFrame) -> pd.DataFrame:
        # drop the side rows' None-filled attr placeholder columns (they
        # exist only to unify the union schema) BEFORE the merge — else
        # pandas suffixes the overlapping names to _x/_y and the
        # projection below KeyErrors
        side = group[group["__side"] != ""].drop(columns=attr_cols)
        attr = group[group["__side"] == ""][[id_col, *attr_cols]].drop_duplicates(id_col)
        out = side.merge(attr, on=id_col, how="inner")
        return out[["__pa", "__pb", "__side", *attr_cols]]

    def regroup_pairs(group: pd.DataFrame) -> pd.DataFrame:
        a_side = group[group["__side"] == "a"]
        b_side = group[group["__side"] == "b"]
        ren_a = {c: f"{c}_a" for c in attr_cols}
        ren_b = {c: f"{c}_b" for c in attr_cols}
        out = a_side.rename(columns=ren_a).merge(
            b_side.rename(columns=ren_b), on=["__pa", "__pb"], how="inner"
        )
        out = out.rename(columns={"__pa": "a", "__pb": "b"})
        keep = ["a", "b", *ren_a.values(), *ren_b.values()]
        return out[keep]

    sides = pairs.map_batches(pair_sides, batch_format="pandas")
    arows = attrs.map_batches(attr_rows, batch_format="pandas")
    joined = (
        sides.union(arows)
        .map_batches(bucket_by([id_col]), batch_format="pandas")
        .repartition(n_buckets)
        .groupby("__bucket")
        .map_groups(join_by_id, batch_format="pandas")
    )
    return (
        joined.map_batches(bucket_by(["__pa", "__pb"]), batch_format="pandas")
        .repartition(n_buckets)
        .groupby("__bucket")
        .map_groups(regroup_pairs, batch_format="pandas")
    )
