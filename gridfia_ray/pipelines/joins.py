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
import ray
import ray.data as rd


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
    actor holds more than ~1/(2·cpus) of the data — CLAMPED by cluster
    memory: Ray's hash-shuffle reserves ~1.75 GiB per aggregator actor
    up front, and 2·32 = 64 aggregators on a 32-CPU/88-GiB node demand
    112 GiB and STALL the join indefinitely (reproduced on a 60k-row
    input; the round-4 driver window died at exactly this shape). The
    clamp keeps the reservation under ~40% of cluster memory.
    """
    import ray as _ray

    from gridfia_ray.pipelines.common import cluster_cpus

    if num_partitions is None:
        num_partitions = max(8, 2 * cluster_cpus())
        try:
            mem_gib = float(
                _ray.cluster_resources().get("memory", 0.0)
            ) / (1 << 30)
        except Exception:
            mem_gib = 0.0
        if mem_gib:
            num_partitions = max(
                8, min(num_partitions, int(mem_gib * 0.4 / 1.75))
            )

    def strip_meta(b: pa.Table) -> pa.Table:
        # parquet written by pandas embeds a dict-valued 'pandas' schema
        # key; the join aggregator's schema-dedup hash chokes on it
        # ("Failed to hash the schemas") and re-ships schemas per block.
        # Metadata-only operation — no data copy.
        return b.replace_schema_metadata(None)

    return left.map_batches(strip_meta, batch_format="pyarrow").join(
        right.map_batches(strip_meta, batch_format="pyarrow"),
        join_type=join_type,
        num_partitions=num_partitions,
        on=tuple(on),
        right_on=tuple(right_on) if right_on is not None else None,
    )


def broadcast_semi_join(
    left: rd.Dataset,
    keys: rd.Dataset,
    on: str,
    *,
    anti: bool = False,
    max_keys: int = 5_000_000,
    max_broadcast_bytes: int = 256 << 20,
    n_buckets: int = 32,
) -> rd.Dataset:
    """Semi join (``EXISTS``) / anti join (``NOT EXISTS``): keep left
    rows whose ``on`` value is (not) present in ``keys`` — the filter
    side of decontamination-by-id, allowlist/blocklist application, and
    dimension-predicate pushdown.

    The key side is deduped DISTRIBUTED (bucketed distinct) and BOTH its
    cardinality and its materialized Arrow byte size are checked BEFORE
    any driver pull (``max_keys`` guards the searchsorted cost,
    ``max_broadcast_bytes`` guards the driver/object-store footprint —
    an id-count bound alone would still pull gigabytes for wide keys).
    Within both bounds the sorted key array broadcasts once
    (``ray.put``) and the left side streams through a vectorized
    ``searchsorted`` membership filter — no shuffle of the big side at
    all. Beyond either bound the engine AUTO-ROUTES to the distributed
    plan instead of raising: semi = :func:`shuffle_hash_join` inner join
    of the left against the (already deduped, still distributed) key
    table; anti = left-outer join on a marker column + null filter. Both
    paths return the left's own columns only.
    """
    import ray

    from gridfia_ray.stages.dedup_util import bucketed_distinct

    for side, schema in (("left", left.schema()), ("keys", keys.schema())):
        # schema() is None for a fully empty dataset — nothing to check
        if schema is not None and on not in schema.names:
            raise ValueError(
                f"broadcast_semi_join: {side} side is missing column {on!r} "
                f"(has {list(schema.names)})"
            )
    distinct = bucketed_distinct(
        keys.select_columns([on]), [on], n_buckets=n_buckets
    ).materialize()
    n_keys = distinct.count()
    key_bytes = distinct.size_bytes() or 0
    if n_keys > max_keys or key_bytes > max_broadcast_bytes:
        # too big to broadcast: hash-shuffle semi/anti join — the deduped
        # key table never touches the driver (distinct is deduped, so the
        # semi output never duplicates a left row). The bucketed exchange
        # can emit trailing SCHEMA-LESS empty blocks (Ray's sort splits)
        # which abort pyarrow's join ("No match for FieldRef"); a block
        # merge (repartition without shuffle) absorbs them into typed
        # blocks — and right-sizes the key table's blocks for the join.
        from gridfia_ray.pipelines.common import cluster_cpus

        return shuffle_hash_join(
            left, distinct.repartition(max(8, 2 * cluster_cpus())), on=[on],
            join_type="left_anti" if anti else "left_semi",
        )
    if n_keys == 0:
        # an empty exchange yields schema-less blocks — don't index a
        # column that no longer exists
        kt = np.empty(0)
    else:
        kt = np.sort(distinct.to_pandas()[on].to_numpy())
    ref = ray.put(kt)

    def member(batch: pd.DataFrame) -> pd.DataFrame:
        k = ray.get(ref)
        v = batch[on].to_numpy()
        if k.size == 0:
            hit = np.zeros(len(batch), dtype=bool)
        else:
            pos = np.searchsorted(k, v)
            in_range = pos < k.size
            hit = np.zeros(len(batch), dtype=bool)
            hit[in_range] = k[pos[in_range]] == v[in_range]
        return batch.loc[~hit if anti else hit]

    return left.map_batches(member, batch_format="pandas")


def _validate_two_sided(
    lschema, rschema, *, lreq: list[str], rreq: list[str], shared: list[str]
):
    """Shared column-contract validation for the padded exchanges:
    required columns present, non-shared names disjoint, shared-key
    dtypes identical. Returns (lpay, rpay, ltypes, rtypes) where the
    payload lists exclude the shared columns."""
    # Dataset.schema() is None for a fully empty dataset — fail with a
    # clear contract error, not an AttributeError (ADVICE r3)
    if lschema is None or rschema is None:
        empty = "left" if lschema is None else "right"
        raise ValueError(
            f"join requires a known schema on both sides; the {empty} side "
            "dataset is empty/schema-less — supply at least one typed block "
            "(e.g. an empty pyarrow.Table with the contract columns)"
        )
    lcols, rcols = list(lschema.names), list(rschema.names)
    for req in lreq:
        if req not in lcols:
            raise ValueError(f"left side is missing required column {req!r}")
    for req in rreq:
        if req not in rcols:
            raise ValueError(f"right side is missing required column {req!r}")
    lpay = [c for c in lcols if c not in shared]
    rpay = [c for c in rcols if c not in shared]
    clash = set(lpay) & set(rpay)
    if clash:
        raise ValueError(
            f"column names must be disjoint across sides (besides {shared}); "
            f"both have {sorted(clash)} — rename before joining"
        )
    ltypes = dict(zip(lschema.names, lschema.types))
    rtypes = dict(zip(rschema.names, rschema.types))
    for c in shared:
        if ltypes[c] != rtypes[c]:
            raise ValueError(f"{c!r} dtypes differ: {ltypes[c]} vs {rtypes[c]}")
    return lpay, rpay, ltypes, rtypes


def _padding_array(n: int, typ: pa.DataType) -> pa.Array:
    """Typed filler for the other side's columns in the exchange. The
    values are never read (each side selects only its OWN columns after
    the split), but they must be NON-NULL for primitive types: Ray's
    sort/groupby stage may round-trip blocks through pandas, and an
    int64 column with nulls degrades to float64 there — silently
    rounding real values above 2^53 in the SAME column. Zero-fill keeps
    every primitive column null-free end to end."""
    if pa.types.is_integer(typ) or pa.types.is_floating(typ):
        return pa.array(np.zeros(n, np.int64), pa.int64()).cast(typ)
    if pa.types.is_boolean(typ):
        return pa.array(np.zeros(n, bool), typ)
    if pa.types.is_timestamp(typ) or pa.types.is_date(typ) or pa.types.is_time(typ):
        return pa.array(np.zeros(n, np.int64), pa.int64()).cast(typ)
    if pa.types.is_string(typ) or pa.types.is_large_string(typ):
        return pa.array([""] * n, typ)
    if pa.types.is_binary(typ) or pa.types.is_large_binary(typ):
        return pa.array([b""] * n, typ)
    # nested/extension types: nulls (pandas keeps them as objects)
    return pa.nulls(n, typ)


def _padded_copartition(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    by: str,
    shared: list[str],
    lpay: list[str],
    rpay: list[str],
    ltypes: dict,
    rtypes: dict,
    n_buckets: int,
    hash_cols: list[str] | None = None,
):
    """ONE bucketed exchange co-partitioning two datasets on ``by``
    (or on ``hash_cols`` when given — e.g. ``[by, '__band']`` for the
    banded interval join):
    union both sides under a single Arrow schema (shared key columns
    filled by both sides; each side's payload padded with typed
    NON-NULL filler on the other's rows — one schema across all blocks,
    no executor schema churn, and no null-bearing primitive column that
    a pandas round-trip inside the shuffle could degrade to float64),
    keyed by ``bucket_of`` (the engine-wide hash). Returns the
    ``groupby('__bucket')`` handle; consume with
    ``.map_groups(fn, batch_format='pyarrow')`` and split sides with
    :func:`_split_sides`."""
    ex_fields = (
        [(c, ltypes[c]) for c in shared]
        + [(c, ltypes[c]) for c in lpay]
        + [(c, rtypes[c]) for c in rpay]
        + [("__side", pa.int8()), ("__bucket", pa.int32())]
    )
    ex_schema = pa.schema(ex_fields)

    def tag(side: int, own: list[str]):
        def fn(batch: pd.DataFrame) -> pa.Table:
            from gridfia_ray.stages.dedup_util import bucket_of

            n = len(batch)
            arrays = []
            for name, typ in ex_fields:
                if name == "__side":
                    arrays.append(pa.array(np.full(n, side, np.int8), typ))
                elif name == "__bucket":
                    arrays.append(
                        pa.array(bucket_of(batch, hash_cols or [by], n_buckets), typ)
                    )
                elif name in own:
                    arrays.append(pa.Array.from_pandas(batch[name], type=typ))
                else:
                    arrays.append(_padding_array(n, typ))
            return pa.Table.from_arrays(arrays, schema=ex_schema)

        return fn

    tagged = left.map_batches(tag(0, shared + lpay), batch_format="pandas").union(
        right.map_batches(tag(1, shared + rpay), batch_format="pandas")
    )
    return tagged.repartition(n_buckets).groupby("__bucket")


def _split_sides(
    group: pa.Table, shared: list[str], lpay: list[str], rpay: list[str]
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Split a co-partitioned group back into its two sides, selecting
    each side's own columns at the Arrow level first — the padding
    values on the other side's rows never reach the merge logic."""
    import pyarrow.compute as pc

    side = group.column("__side")
    lf = group.filter(pc.equal(side, 0)).select(shared + lpay).to_pandas()
    rf = group.filter(pc.equal(side, 1)).select(shared + rpay).to_pandas()
    return lf, rf


def _typed_output(out: pd.DataFrame, out_schema: pa.Schema) -> pa.Table:
    """Emit a merge result under the join's declared Arrow schema —
    empty buckets keep real column types (no null-type churn), nullable
    int columns (left-join misses) convert NaN/<NA> → Arrow nulls."""
    out = out[[f.name for f in out_schema]]
    # strip the pandas-dtype metadata from_pandas embeds, or a later
    # to_pandas would resurrect nullable Int64 for plain int columns
    return pa.Table.from_pandas(
        out, schema=out_schema, preserve_index=False
    ).replace_schema_metadata(None)


def _bands_of(values: np.ndarray, band_width) -> np.ndarray:
    """Map an ``on``/``lo``/``hi`` column to int64 band numbers —
    monotone floor(v / w) in the column's own domain. Timestamps take a
    ``pd.Timedelta``/str/int-ns width; floats a float width; ints an int
    width. Both sides of the join MUST share one dtype so band numbers
    agree."""
    if values.dtype.kind in "mM":
        w = (
            int(band_width)
            if isinstance(band_width, (int, np.integer))
            else int(pd.Timedelta(band_width).value)
        )
        if w <= 0:
            raise ValueError(f"band_width must be positive, got {band_width!r}")
        # normalize storage units (us-precision parquet vs ns-precision
        # pandas arithmetic) so both sides band identically
        return values.astype("datetime64[ns]" if values.dtype.kind == "M"
                             else "timedelta64[ns]").view("i8") // w
    w = float(band_width)
    if w <= 0:
        raise ValueError(f"band_width must be positive, got {band_width!r}")
    if values.dtype.kind == "f":
        return np.floor(values / w).astype(np.int64)
    return values.astype(np.int64) // int(band_width)


def interval_join(
    points: rd.Dataset,
    intervals: rd.Dataset,
    by: str,
    on: str,
    lo: str,
    hi: str,
    n_buckets: int = 32,
    band_width=None,
    max_bands_per_interval: int = 4096,
) -> rd.Dataset:
    """Range join: every (point, interval) pair in the same ``by`` group
    with ``lo <= point[on] <= hi`` (both ends inclusive) — the brief's
    "range join" custom operator (event-to-window attribution).

    Same column contract as :func:`asof_join`: ``by`` on both sides with
    one dtype; all other names disjoint; no nulls in payloads. ``on``
    lives on the points side, ``lo``/``hi`` on the intervals side, all
    three mutually comparable (and all three the SAME dtype when
    ``band_width`` is used).

    Shape: ONE bucketed exchange co-partitioning both sides on ``by``
    (``bucket_of`` — the engine-wide key hash), then a per-bucket
    vectorized equi-merge on ``by`` + containment filter. The merge's
    intermediate is bounded by Σ_key |points_k|·|intervals_k| — fine when
    intervals-per-key is small (the attribution shape).

    **Domain banding** (``band_width``): a key with many long
    overlapping intervals makes the plain per-key merge quadratic. With
    ``band_width=w`` the ``on`` domain is cut into bands of width ``w``
    (pass a ``pd.Timedelta``/str for timestamp columns); each interval
    is replicated to every band it overlaps, each point probes only its
    own band, and the equi-merge runs on ``(by, band)`` — so the
    intermediate is Σ_band |points_b|·|intervals_b|, proportional to
    true matches when ``w`` ≈ the typical interval length. Each matching
    pair meets in EXACTLY one band (the point's), so no dedup pass is
    needed. Replication cost is ⌈len/w⌉ rows per interval, capped by
    ``max_bands_per_interval`` (raise the cap or widen ``w`` if hit).
    """
    lpay, rpay, ltypes, rtypes = _validate_two_sided(
        points.schema(), intervals.schema(),
        lreq=[by, on], rreq=[by, lo, hi], shared=[by],
    )
    out_schema = pa.schema(
        [(by, ltypes[by])]
        + [(c, ltypes[c]) for c in lpay]
        + [(c, rtypes[c]) for c in rpay]
    )
    shared = [by]
    hash_cols = None
    if band_width is not None:
        kinds = {
            "ts" if pa.types.is_timestamp(t)
            else "int" if pa.types.is_integer(t)
            else "float" if pa.types.is_floating(t)
            else str(t)
            for t in (ltypes[on], rtypes[lo], rtypes[hi])
        }
        # same KIND is enough: timestamps normalize to ns inside
        # _bands_of, so us-precision parquet meets ns-precision pandas
        if len(kinds) != 1:
            raise ValueError(
                f"banded interval_join needs one dtype kind across {on!r}/"
                f"{lo!r}/{hi!r}; got {ltypes[on]}, {rtypes[lo]}, {rtypes[hi]}"
            )
        def point_band(batch: pd.DataFrame) -> pd.DataFrame:
            batch = batch.copy()
            batch["__band"] = _bands_of(batch[on].to_numpy(), band_width)
            return batch

        def explode_bands(batch: pd.DataFrame) -> pd.DataFrame:
            b_lo = _bands_of(batch[lo].to_numpy(), band_width)
            b_hi = _bands_of(batch[hi].to_numpy(), band_width)
            counts = np.clip(b_hi - b_lo + 1, 0, None)
            if counts.size and counts.max() > max_bands_per_interval:
                raise ValueError(
                    f"an interval spans {int(counts.max())} bands > "
                    f"max_bands_per_interval={max_bands_per_interval}; widen "
                    f"band_width (≈ typical interval length) or raise the cap"
                )
            idx = np.repeat(np.arange(len(batch)), counts)
            out = batch.iloc[idx].copy()
            offs = np.arange(int(counts.sum())) - np.repeat(
                np.cumsum(counts) - counts, counts
            )
            out["__band"] = np.repeat(b_lo, counts) + offs
            return out

        points = points.map_batches(point_band, batch_format="pandas")
        intervals = intervals.map_batches(explode_bands, batch_format="pandas")
        shared = [by, "__band"]
        ltypes["__band"] = pa.int64()
        rtypes["__band"] = pa.int64()
        hash_cols = [by, "__band"]

    grouped = _padded_copartition(
        points, intervals, by=by, shared=shared, lpay=lpay, rpay=rpay,
        ltypes=ltypes, rtypes=rtypes, n_buckets=n_buckets, hash_cols=hash_cols,
    )

    def merge(group: pa.Table) -> pa.Table:
        pf, itv = _split_sides(group, shared, lpay, rpay)
        out = pf.merge(itv, on=shared, how="inner")
        out = out[(out[on] >= out[lo]) & (out[on] <= out[hi])]
        return _typed_output(out, out_schema)

    return grouped.map_groups(merge, batch_format="pyarrow")


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
    deterministic under a stable sort of the right side by all its
    columns — ``direction='backward'`` resolves to the LAST such row
    (pandas merge_asof takes the latest candidate), ``'forward'`` and
    ``'nearest'`` resolve to the FIRST (the earliest candidate at the
    matched on-value). Partition-invariant regardless of block order.

    ``how='inner'`` drops unmatched left rows; ``'left'`` keeps them
    with Arrow nulls in the right columns (integer right columns stay
    int64 — misses travel as nullable ints, never as float64, so
    hash-scale ids above 2^53 are preserved exactly).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    lpay, rpay, ltypes, rtypes = _validate_two_sided(
        left.schema(), right.schema(),
        lreq=[by, on], rreq=[by, on], shared=[by, on],
    )
    out_schema = pa.schema(
        [(by, ltypes[by]), (on, ltypes[on])]
        + [(c, ltypes[c]) for c in lpay]
        + [(c, rtypes[c]) for c in rpay]
    )
    grouped = _padded_copartition(
        left, right, by=by, shared=[by, on], lpay=lpay, rpay=rpay,
        ltypes=ltypes, rtypes=rtypes, n_buckets=n_buckets,
    )
    r_int = [c for c in rpay if pa.types.is_integer(rtypes[c])]

    def merge(group: pa.Table) -> pa.Table:
        lf, rf = _split_sides(group, [by, on], lpay, rpay)
        # right ints → pandas nullable Int64 BEFORE the asof merge:
        # merge_asof is a left join internally, so unmatched rows would
        # otherwise coerce the whole column to float64 and round values
        # above 2^53
        for name in r_int:
            rf[name] = rf[name].astype("Int64")
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
        return _typed_output(out, out_schema)

    return grouped.map_groups(merge, batch_format="pyarrow")


# --- Bloom-prefiltered join -------------------------------------------------

_B1 = np.uint64(0xC2B2AE3D27D4EB4F)
_B2 = np.uint64(0x165667B19E3779F9)


def _bloom_hashes(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Two independent avalanche hashes (uint64) for double hashing."""
    x = np.asarray(keys, dtype=np.int64).view(np.uint64)
    with np.errstate(over="ignore"):
        h1 = (x ^ (x >> np.uint64(33))) * _B1
        h1 = (h1 ^ (h1 >> np.uint64(29))) * _B2
        h1 = h1 ^ (h1 >> np.uint64(32))
        h2 = (x + np.uint64(0x9E3779B97F4A7C15)) * _B2
        h2 = (h2 ^ (h2 >> np.uint64(31))) * _B1
        h2 = h2 ^ (h2 >> np.uint64(30))
    return h1, h2


def _bloom_indices(keys: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """All k bit indices for each key (double hashing), flat uint64."""
    h1, h2 = _bloom_hashes(keys)
    with np.errstate(over="ignore"):
        idx = (
            h1[:, None] + np.arange(1, k + 1, dtype=np.uint64)[None, :] * h2[:, None]
        ) % np.uint64(m_bits)
    return idx.ravel()


def build_bloom_filter(
    keys_ds: rd.Dataset,
    on: str,
    *,
    m_bits: int = 1 << 23,
    k: int = 4,
    n_buckets: int = 64,
) -> np.ndarray:
    """Distributed Bloom-filter build over an int64 key column: each
    block emits its DISTINCT bit indices packed per bitmap slice, one
    keyed exchange ORs each slice in parallel, and the driver
    concatenates exactly ``n_buckets`` slice rows — the driver never
    holds more than the m_bits/8-byte bitmap itself (a sizing CONFIG,
    not a data-dependent pull). Returns the bitmap as uint8[m_bits/8]."""
    if m_bits % (8 * n_buckets):
        raise ValueError("m_bits must be divisible by 8*n_buckets")
    slice_bits = m_bits // n_buckets

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch[on].to_numpy(zero_copy_only=False)
        idx = np.unique(_bloom_indices(keys, m_bits, k))
        sl = (idx // np.uint64(slice_bits)).astype(np.int64)
        bounds = np.searchsorted(sl, np.arange(n_buckets + 1, dtype=np.int64))
        slices, offs = [], []
        for b in range(n_buckets):
            lo, hi = bounds[b], bounds[b + 1]
            if lo == hi:
                continue
            rel = (idx[lo:hi] - np.uint64(b) * np.uint64(slice_bits)).astype(
                np.uint32
            )
            slices.append(rel.tobytes())
            offs.append(b)
        return pa.table(
            {
                "slice": pa.array(offs, pa.int64()),
                "idxs": pa.array(slices, pa.binary()),
            }
        )

    def or_slice(group: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(slice_bits, dtype=bool)
        for buf in group["idxs"]:
            bits[np.frombuffer(buf, dtype=np.uint32)] = True
        return pd.DataFrame(
            {
                "slice": [int(group["slice"].iloc[0])],
                "bitmap": [np.packbits(bits, bitorder="little").tobytes()],
            }
        )

    from gridfia_ray.stages.agg_util import bucketed_group_map

    out_schema = pa.schema([("slice", pa.int64()), ("bitmap", pa.binary())])
    rows = bucketed_group_map(
        keys_ds.map_batches(partial, batch_format="pyarrow"),
        ["slice"],
        or_slice,
        n_buckets=min(n_buckets, 16),
        out_schema=out_schema,
    ).to_pandas()
    bitmap = np.zeros(m_bits // 8, dtype=np.uint8)
    sb = slice_bits // 8
    for r in rows.itertuples(index=False):
        bitmap[int(r.slice) * sb : (int(r.slice) + 1) * sb] = np.frombuffer(
            r.bitmap, dtype=np.uint8
        )
    return bitmap


def bloom_prefilter_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: str,
    right_on: str | None = None,
    *,
    m_bits: int = 1 << 23,
    k: int = 4,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Shuffle hash join with a Bloom PREFILTER on the left side — the
    standard engine optimization when the right side's key set is too
    large for an exact broadcast semi-join but a fixed-size bitmap
    (m_bits/8 bytes, a config) is cheap to ship: left rows whose key
    cannot be in the right side never enter the all-to-all exchange.

    EXACT by construction: Bloom false positives pass extra rows into
    the join, which discards them — the output is bit-identical to the
    plain ``shuffle_hash_join`` (the contract oracle is the plain SQL
    inner join). Keys must be int64. Sizing: ~10 bits/distinct right
    key keeps the false-positive rate ≈1%%; an undersized bitmap only
    costs shuffle volume, never correctness."""
    ron = right_on or on
    bitmap_ref = ray.put(
        build_bloom_filter(
            right.select_columns([ron]), ron, m_bits=m_bits, k=k
        )
    )

    def prefilter(batch: pa.Table) -> pa.Table:
        bitmap = ray.get(bitmap_ref)
        keys = batch[on].to_numpy(zero_copy_only=False)
        idx = _bloom_indices(keys, m_bits, k).reshape(len(keys), k)
        byte = bitmap[(idx >> np.uint64(3)).astype(np.int64)]
        bit = (byte >> (idx & np.uint64(7)).astype(np.uint8)) & 1
        return batch.filter(pa.array(bit.all(axis=1)))

    return shuffle_hash_join(
        left.map_batches(prefilter, batch_format="pyarrow"),
        right,
        on=[on],
        right_on=[ron] if right_on else None,
        num_partitions=num_partitions,
    )
