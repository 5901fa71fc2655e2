"""Deterministic distributed sampling (O3 family / training-data ops).

``sample_per_key`` — k rows per key, selected by smallest cryptographic
rank: the distributed, deterministic equivalent of per-group reservoir
sampling ("sample k documents per domain/language"). Because the rank
is a pure function of row content (md5 of caller-chosen columns), the
result is independent of partitioning, execution order and cluster
size — and a SQL oracle can reproduce it exactly (DuckDB ``md5`` +
``ROW_NUMBER``), unlike RNG-state reservoirs.

Shape: per-batch combiner keeps the k smallest ranks per key (so a
batch contributes ≤ k rows per key to the shuffle regardless of skew),
then a key-hash-bucketed merge takes the global k smallest — O(buckets)
Python calls, winner selection vectorized, same altitude rules as
``stages/dedup_util``.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import ray.data as rd

from gridfia_ray.stages.dedup_util import bucket_of


def md5_rank(parts: list[pd.Series]) -> pd.Series:
    """Hex md5 over '|'-joined string forms — the rank function shared
    with the SQL oracle (``md5(CAST(c1 AS VARCHAR) || '|' || ...)``).
    Integer-typed columns must be passed as integers on both sides."""
    joined = parts[0].astype(str)
    for p in parts[1:]:
        joined = joined + "|" + p.astype(str)
    return joined.map(lambda s: hashlib.md5(s.encode()).hexdigest())


def grouped_topk(
    ds: rd.Dataset,
    key: str,
    k: int,
    rank_col: str,
    *,
    descending: bool = True,
    tie_cols: "list[str] | tuple" = (),
    n_buckets: int = 32,
) -> rd.Dataset:
    """Top-``k`` rows per key by ``rank_col`` — the distributed
    ROW_NUMBER() OVER (PARTITION BY key ORDER BY rank) <= k.

    Same two-stage shape as :func:`sample_per_key` (they differ only in
    the ordering): per-batch combiner keeps each key's local top-k (so
    a batch contributes ≤ k rows per key to the shuffle regardless of
    skew — a hot key costs k rows per block, not its row count), then a
    key-hash-bucketed merge takes the global top-k per key. Handles
    unbounded key cardinality: no driver state, keys spread over
    ``n_buckets``.

    Determinism: pass ``tie_cols`` that (with ``rank_col``) uniquely
    order rows within a key — equal ranks otherwise resolve by input
    order, which is not partition-invariant.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    sort_cols = [key, rank_col, *tie_cols]
    ascending = [True, not descending, *([True] * len(tie_cols))]

    def local(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.sort_values(sort_cols, ascending=ascending, kind="mergesort")
        batch = batch.groupby(key, sort=False).head(k)
        batch = batch.copy()
        batch["__bucket"] = bucket_of(batch, [key], n_buckets)
        return batch

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values(sort_cols, ascending=ascending, kind="mergesort")
        return group.groupby(key, sort=False).head(k).drop(columns="__bucket")

    return (
        ds.map_batches(local, batch_format="pandas")
        .repartition(n_buckets)
        .groupby("__bucket")
        .map_groups(merge, batch_format="pandas")
    )


def split_by_hash(
    ds: rd.Dataset,
    rank_cols: list[str],
    weights: "dict[str, float]",
    split_col: str = "split",
) -> rd.Dataset:
    """Deterministic train/val/test split: assign every row to a named
    split by the first 8 hex chars of its md5 rank — a pure function of
    row content, so the assignment is independent of partitioning,
    execution order and cluster size, and reproducible in SQL
    (``substr(md5(...), 1, 8) < '<threshold>'`` — lexicographic compare
    of fixed-width hex IS the numeric compare, no float anywhere).

    ``weights`` is an ordered {name: fraction} summing to 1; fractions
    are realized as exact 32-bit thresholds (floor(cum·2³²)), so e.g.
    0.8 → rows whose rank prefix < 'cccccccc'. Pure map — no shuffle.
    """
    import numpy as np

    names = list(weights)
    if len(names) < 2:
        raise ValueError("need at least two splits")
    fr = np.array([weights[n] for n in names], dtype=np.float64)
    if (fr <= 0).any() or abs(fr.sum() - 1.0) > 1e-9:
        raise ValueError(f"split weights must be positive and sum to 1, got {weights}")
    thresholds = split_thresholds_hex(weights)

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        r = md5_rank([batch[c] for c in rank_cols]).str[:8].to_numpy()
        split = np.full(len(batch), names[-1], dtype=object)
        for name, th in zip(names[-2::-1], thresholds[::-1]):
            split = np.where(r < th, name, split)
        batch[split_col] = split
        return batch

    return ds.map_batches(tag, batch_format="pandas")


def split_thresholds_hex(weights: "dict[str, float]") -> list[str]:
    """The hex thresholds :func:`split_by_hash` uses — exposed so SQL
    oracles can embed the identical literals."""
    import numpy as np

    cum = np.cumsum([weights[n] for n in list(weights)])[:-1]
    return [format(min(int(c * 2**32), 2**32 - 1), "08x") for c in cum]


def sample_per_key(
    ds: rd.Dataset,
    key: str,
    k: int,
    rank_cols: list[str],
    n_buckets: int = 32,
) -> rd.Dataset:
    """Keep the ``k`` rows with the smallest md5 rank per ``key``.

    ``rank_cols`` must (together with ``key``) identify a row's content;
    ties on the full rank string select identical row values, so the
    output multiset is still deterministic.
    """

    def local(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["__rank"] = md5_rank([batch[c] for c in [key, *rank_cols]])
        batch = batch.sort_values([key, "__rank"], kind="mergesort")
        batch = batch.groupby(key, sort=False).head(k)
        batch["__bucket"] = bucket_of(batch, [key], n_buckets)
        return batch

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values([key, "__rank"], kind="mergesort")
        out = group.groupby(key, sort=False).head(k)
        return out.drop(columns=["__bucket", "__rank"])

    return (
        ds.map_batches(local, batch_format="pandas")
        .repartition(n_buckets)
        .groupby("__bucket")
        .map_groups(merge, batch_format="pandas")
    )


def rate_threshold_hex(rate: float) -> str:
    """8-char keep threshold for a [0, 1] sampling rate — exposed so
    SQL oracles embed the identical literal (floor(rate·2³²);
    lexicographic compare of fixed-width lowercase hex == numeric).
    rate == 1.0 returns ``'g0000000'``, which sorts strictly above every
    hex string, so the ``rank < threshold`` test keeps ALL rows —
    clamping to 'ffffffff' would silently drop the 2⁻³² of rows whose
    rank is exactly that value (~230 docs per 10¹² at keep-everything
    rates). Identical semantics in SQL: 'g' > 'f' in both collations."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    if rate >= 1.0:
        return "g0000000"
    # float rounding can push rate·2³² to 2³² even for rate < 1
    return format(min(int(rate * 2**32), 2**32 - 1), "08x")


def mix_by_key(
    ds: rd.Dataset,
    key_col: str,
    rates: "dict[str, float]",
    rank_cols: list[str],
    default_rate: float = 1.0,
) -> rd.Dataset:
    """Deterministic corpus mixture (per-source downsampling): keep a
    row iff its md5 rank prefix < the threshold of its key's rate —
    the standard pre-training data-mixing step (weight web/books/code
    sources differently). A pure function of row content: independent
    of partitioning, execution order and cluster size, reproducible in
    SQL, and resumable for free (re-running keeps the same rows). Pure
    map, no shuffle; the rate table broadcasts in the task closure
    (keys are source names — tiny by construction).

    ``rates`` maps key values to keep-rates in [0, 1]; unlisted keys
    use ``default_rate``. Upsampling (rate > 1) is out of scope — at
    training time repetition is a loader concern, not a storage op."""
    th = {k: rate_threshold_hex(v) for k, v in rates.items()}
    default_th = rate_threshold_hex(default_rate)

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        r = md5_rank([batch[c] for c in rank_cols]).str[:8].to_numpy()
        t = batch[key_col].map(th).fillna(default_th).to_numpy()
        return batch[r < t]

    return ds.map_batches(keep, batch_format="pandas")


def stratified_sample(
    ds: rd.Dataset,
    key: str,
    frac_num: int,
    frac_den: int,
    rank_cols: list[str],
    n_buckets: int = 32,
    max_keys: int = 100_000,
) -> rd.Dataset:
    """Proportional stratified sample: the ⌈n_g · frac⌉ rows with the
    smallest md5 rank from every ``key`` group — exact per-stratum
    allocation (every stratum keeps ≥ 1 row), unlike the fixed-rate
    :func:`mix_by_key` (binomial per-group counts) or the fixed-k
    :func:`sample_per_key`.

    The fraction is an exact rational ``frac_num/frac_den`` and the
    allocation is pure integer math — ``(n·num + den − 1) // den`` —
    because float ``ceil(0.1·n)`` flips on exact multiples (IEEE 0.1 >
    1/10, so 0.1·50 ceils to 6); the SQL oracle writes the identical
    integer division.

    Two passes by necessity (allocation needs group sizes): a grouped
    count (tiny result: one row per stratum, guarded by ``max_keys``
    BEFORE the driver pull — beyond it, co-bucket the counts instead of
    broadcasting; raise rather than silently degrade), then the
    :func:`sample_per_key` combiner shape with a per-key k: each batch
    contributes ≤ k_g rows per stratum to the shuffle (batch-local
    winners under the global (key, rank) order are a superset of the
    global winners), and a key-hash-bucketed merge finalizes.
    """
    if frac_num < 1 or frac_den < 1 or frac_num > frac_den:
        raise ValueError(f"frac must be a rational in (0, 1]: {frac_num}/{frac_den}")
    counts_ds = ds.groupby(key).count()
    n_keys = counts_ds.count()
    if n_keys > max_keys:
        raise ValueError(
            f"stratified_sample: {n_keys} strata exceed max_keys={max_keys}; "
            "co-bucket the allocation table instead of broadcasting it"
        )
    kmap = {
        r[key]: (int(r["count()"]) * frac_num + frac_den - 1) // frac_den
        for r in counts_ds.take_all()
    }

    def select(batch: pd.DataFrame, kcap: "dict | None" = None) -> pd.DataFrame:
        kk = batch[key].map(kmap)
        if kk.isna().any():
            raise ValueError("stratified_sample: key absent from the count pass")
        cc = batch.groupby(key, sort=False).cumcount().to_numpy()
        return batch[cc < kk.to_numpy()]

    def local(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["__rank"] = md5_rank([batch[c] for c in [key, *rank_cols]])
        batch = batch.sort_values([key, "__rank"], kind="mergesort")
        batch = select(batch).copy()
        batch["__bucket"] = bucket_of(batch, [key], n_buckets)
        return batch

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values([key, "__rank"], kind="mergesort")
        return select(group).drop(columns=["__bucket", "__rank"])

    return (
        ds.map_batches(local, batch_format="pandas")
        .repartition(n_buckets)
        .groupby("__bucket")
        .map_groups(merge, batch_format="pandas")
    )
