"""Event-log pipelines: sessions, funnels, retention, windows,
resampling, temporal joins.

Split out of the former monolithic ``gridfia_ray/contract.py`` (round-5
VERDICT #3); see ``gridfia_ray/contract/__init__.py`` for the package
map. Query/oracle semantics are unchanged.
"""

from __future__ import annotations

import os
from typing import Callable

import numpy as np
import pandas as pd

from gridfia_ray import fixtures
from gridfia_ray.io import read_parquet_clean
from gridfia_ray.kernels.base import KernelContext
from gridfia_ray.kernels.registry import registry
from gridfia_ray.pipelines.common import GridSpec
from gridfia_ray.contract._shared import *  # noqa: F401,F403


def q_events_anomaly(sf_dir: str) -> pd.DataFrame:
    """Exact rolling-window anomaly flags (pipelines/events.
    rolling_anomaly): per event type, each value tests beyond-3σ
    against its preceding 20-row window with the z² test fully
    cross-multiplied into int64 — no float σ on either side, so the
    SQL ROWS-window oracle hash-matches every row."""
    from gridfia_ray.pipelines.events import rolling_anomaly

    ev = read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "event_type", "value"],
    )
    out = rolling_anomaly(ev).to_pandas()
    out = out[["event_type", "event_id", "v_milli", "n_window", "flagged"]]
    out["event_type"] = out["event_type"].astype(str)
    for c in ("event_id", "v_milli", "n_window", "flagged"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("event_id").reset_index(drop=True)

def q_events_group_compare(sf_dir: str) -> pd.DataFrame:
    """A7 comparison stats over the events table: purchase vs click
    value distributions. Exports the EXACT components — Mann-Whitney U
    (rank sums with average-tie ranks are exact multiples of 0.5, so
    2·U is an exact int) and Cliff's delta (exact concordant/discordant
    pair counts) — as one hash-checked row; the normal-approximation
    p-value / bootstrap CIs are seeded-resampling territory and stay
    pytest-pinned (tests/test_stats.py). The per-group pull is the two
    groups' single int column (analyst-scale by the A7 contract — a
    hypothesis test's inputs are bounded samples, not the corpus)."""
    import ray.data as rd

    from gridfia_ray.analysis.stats import cliffs_delta, mann_whitney_u
    from gridfia_ray.context import tune_context

    tune_context()
    ev = read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "value"]
    )

    def cents(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[batch["event_type"].isin(["purchase", "click"])]
        return pd.DataFrame(
            {
                "event_type": b["event_type"],
                "value_c": np.floor(b["value"].to_numpy(np.float64) * 100 + 0.5).astype(
                    np.int64
                ),
            }
        )

    df = ev.map_batches(cents, batch_format="pandas").to_pandas()
    x = df.loc[df["event_type"] == "purchase", "value_c"].to_numpy(np.float64)
    y = df.loc[df["event_type"] == "click", "value_c"].to_numpy(np.float64)
    mwu = mann_whitney_u(x, y)
    delta = cliffs_delta(x, y)
    return pd.DataFrame(
        {
            "n_purchase": np.array([x.size], np.int64),
            "n_click": np.array([y.size], np.int64),
            "u2": np.array([int(round(2 * mwu["u"]))], np.int64),
            "cliffs_delta_u": np.array([int(s6(delta))], np.int64),
        }
    )

def q_stats_resampling(sf_dir: str) -> pd.DataFrame:
    """O4/O5 distributed seeded bootstrap CI + permutation test
    (analysis/stats): iteration-index datasets fan the seeded draws
    across workers; every draw is ``RandomState(seed + i)`` so the
    result is a pure function of (data, seed) — hash-checked against a
    pinned sequential replay of the same iterations. p-value reported
    as its exact integer numerator (count + 1 over n_iterations + 1)."""
    from gridfia_ray import oracle_pins
    from gridfia_ray.analysis.stats import (
        bootstrap_mean_diff_ci,
        permutation_test_mean_diff,
    )
    from gridfia_ray.context import tune_context

    tune_context()
    x, y = oracle_pins.statpin_xy()
    n_iter = oracle_pins.STAT_PIN_ITERS
    boot = bootstrap_mean_diff_ci(x, y, n_iterations=n_iter, seed=42)
    perm = permutation_test_mean_diff(x, y, n_iterations=n_iter, seed=42)
    return pd.DataFrame(
        {
            "observed_u": s6([boot["observed"]]),
            "ci_low_u": s6([boot["ci_low"]]),
            "ci_high_u": s6([boot["ci_high"]]),
            "p_num": np.asarray(
                [int(round(perm["p_value"] * (n_iter + 1)))], np.int64
            ),
            "n_iterations": np.asarray([n_iter], np.int64),
        }
    )

def q_events_props_sum(sf_dir: str) -> pd.DataFrame:
    """Semi-structured extraction: pull the integer field ``k`` out of
    the JSON ``props`` column (vectorized regex fast path,
    pipelines/events.extract_json_int) and aggregate per event_type."""
    import ray.data as rd

    from gridfia_ray.context import tune_context
    from gridfia_ray.pipelines.events import extract_json_int
    from gridfia_ray.stages.agg_util import bucketed_agg

    tune_context()
    events = read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "props"]
    )
    extracted = extract_json_int(events, "props", "k")

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        # rows without the field drop BEFORE grouping — both sides then
        # agree that a type with no extracted values is absent (pandas'
        # sum-of-all-NA is 0 but SQL's SUM is NULL)
        b = batch[batch["k"].notna()]
        g = b.groupby("event_type")["k"]
        out = pd.DataFrame({"sum_k": g.sum(), "n_k": g.count()}).reset_index()
        out["sum_k"] = out["sum_k"].astype(np.int64)
        out["n_k"] = out["n_k"].astype(np.int64)
        return out

    out = bucketed_agg(
        extracted.map_batches(partial, batch_format="pandas"),
        ["event_type"],
        {"sum_k": ("sum_k", "sum"), "n_k": ("n_k", "sum")},
        n_buckets=8,
    ).to_pandas()
    out["sum_k"] = out["sum_k"].astype(np.int64)
    out["n_k"] = out["n_k"].astype(np.int64)
    return out.sort_values("event_type").reset_index(drop=True)

def q_events_running_totals(sf_dir: str) -> pd.DataFrame:
    """SQL window functions at scale: per user, running SUM and LAG of
    the event value (cents), ordered by (ts, event_id) — one bucketed
    exchange + one vectorized cumsum/shift per bucket
    (pipelines/events.running_agg)."""
    import ray.data as rd

    from gridfia_ray.context import tune_context
    from gridfia_ray.pipelines.events import running_agg

    tune_context()
    events = read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts", "value"],
    )

    def to_cents(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["value_c"] = np.floor(batch["value"] * 100 + 0.5).astype(np.int64)
        return batch.drop(columns="value")

    out = running_agg(
        events.map_batches(to_cents, batch_format="pandas"),
        key="user_id",
        order_cols=["ts", "event_id"],
        value_col="value_c",
    ).to_pandas()
    res = pd.DataFrame(
        {
            "event_id": out["event_id"].astype(np.int64),
            "running_c": out["running_sum"].astype(np.int64),
            # LAG/LEAD are NULL at the partition edges → sentinel for
            # the integer hash compare (COALESCE on the SQL side)
            "prev_c": out["prev_value"].fillna(-1).astype(np.int64),
            "next_c": out["next_value"].fillna(-1).astype(np.int64),
            "rn": out["row_number"].astype(np.int64),
        }
    )
    return res.sort_values("event_id").reset_index(drop=True)

def q_events_daily_uniques(sf_dir: str) -> pd.DataFrame:
    """Per-day COUNT(DISTINCT user_id): distributed distinct on the
    (day, user) pair (bucketed — the distinct set itself never sits on
    one node) then a keyed count; both exchanges bounded."""
    import ray.data as rd

    from gridfia_ray.context import tune_context
    from gridfia_ray.stages.agg_util import bucketed_agg
    from gridfia_ray.stages.dedup_util import bucketed_distinct

    tune_context()
    events = read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"), columns=["ts", "user_id"]
    )

    def day_user(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"day": batch["ts"].dt.floor("D"), "user_id": batch["user_id"]}
        )

    pairs = bucketed_distinct(
        events.map_batches(day_user, batch_format="pandas"),
        ["day", "user_id"],
        n_buckets=32,
    )
    counts = bucketed_agg(
        pairs.map_batches(
            lambda b: pd.DataFrame({"day": b["day"], "n": np.ones(len(b), np.int64)}),
            batch_format="pandas",
        ),
        ["day"],
        {"n_users": ("n", "sum")},
        n_buckets=8,
    ).to_pandas()
    out = pd.DataFrame(
        {
            "day": pd.to_datetime(counts["day"]).dt.strftime("%Y-%m-%d"),
            "n_users": counts["n_users"].astype(np.int64),
        }
    )
    return out.sort_values("day").reset_index(drop=True)

def q_events_transitions(sf_dir: str) -> pd.DataFrame:
    """First-order Markov transition matrix between event types
    (pipelines/events.event_transitions): one user-keyed exchange with
    in-bucket (user, ts, id) ordering + vectorized shifts, a tiny
    n_types² keyed merge, and the row-normalized probability as one
    double division written identically in the LAG-window SQL oracle."""
    from gridfia_ray.context import tune_context
    from gridfia_ray.pipelines.events import event_transitions

    tune_context()
    ev = read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts", "event_type"],
    )
    return event_transitions(ev)

def q_events_top_paths(sf_dir: str) -> pd.DataFrame:
    """Top user journeys (pipelines/events.top_paths): each user's
    first-5 event-type path, counted across users, top-10 by
    (count DESC, path ASC) — one user-keyed exchange with in-bucket
    head-k, a distinct-path-bounded keyed merge, driver top-n. Exact
    vs the ROW_NUMBER + ordered string_agg SQL oracle."""
    from gridfia_ray.context import tune_context
    from gridfia_ray.pipelines.events import top_paths

    tune_context()
    ev = read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts", "event_type"],
    )
    return top_paths(ev, k_events=5, top_n=10)

def q_events_retention(sf_dir: str) -> pd.DataFrame:
    """Cohort retention matrix (pipelines/events.retention_cohorts):
    users cohort by first active epoch week; (cohort, offset, n_users)
    counts actives N weeks later. One user-keyed exchange (first week +
    distinct weeks computed inside the bucket) + a tiny keyed merge;
    integer epoch weeks shared verbatim with the oracle."""
    from gridfia_ray.context import tune_context
    from gridfia_ray.pipelines.events import retention_cohorts

    tune_context()
    ev = read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts"]
    )
    out = retention_cohorts(ev).to_pandas().astype(np.int64)
    return out.sort_values(["cohort_week", "week_offset"], ignore_index=True)

def q_events_funnel(sf_dir: str) -> pd.DataFrame:
    """Ordered conversion funnel view→click→purchase: per user the
    depth reached with strict temporal ordering between steps
    (pipelines/events.funnel_depths — one bucketed exchange, vectorized
    per-step chain inside each bucket)."""
    import ray.data as rd

    from gridfia_ray.context import tune_context
    from gridfia_ray.pipelines.events import funnel_depths

    tune_context()
    events = read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "event_type", "ts"],
    )
    out = funnel_depths(events, ["view", "click", "purchase"]).to_pandas()
    return (
        pd.DataFrame(
            {"user_id": out["user_id"].astype(np.int64), "depth": out["depth"].astype(np.int64)}
        )
        .sort_values("user_id")
        .reset_index(drop=True)
    )

def q_events_top_by_user(sf_dir: str) -> pd.DataFrame:
    """Distributed per-key top-k over an UNBOUNDED key (user_id): each
    user's 3 highest-value purchases — the ROW_NUMBER()<=k shape, local
    top-k combiner + bucketed merge (pipelines/sampling.grouped_topk),
    no driver state."""
    import ray.data as rd

    from gridfia_ray.context import tune_context
    from gridfia_ray.pipelines.sampling import grouped_topk

    tune_context()
    events = read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "event_type", "value"],
    ).map_batches(
        lambda b: b.loc[b["event_type"] == "purchase",
                        ["event_id", "user_id", "value"]],
        batch_format="pandas",
    )
    out = grouped_topk(
        events, "user_id", 3, "value", descending=True, tie_cols=["event_id"]
    ).to_pandas()
    res = pd.DataFrame(
        {
            "user_id": out["user_id"].astype(np.int64),
            "event_id": out["event_id"].astype(np.int64),
            "value_u": s6(out["value"]),
        }
    )
    return res.sort_values(["user_id", "event_id"]).reset_index(drop=True)

def q_events_value_quantiles(sf_dir: str) -> pd.DataFrame:
    """Per-group EXACT percentiles (grouped distributed quickselect,
    pipelines/percentiles.grouped_percentiles_exact): quantile_disc of
    the event value per event_type at p2/p50/p98 — hash-exact vs the
    DuckDB oracle via scaled integers."""
    import ray.data as rd

    from gridfia_ray.context import tune_context
    from gridfia_ray.pipelines.percentiles import grouped_percentiles_exact

    tune_context()
    events = read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "value"]
    )
    out = grouped_percentiles_exact(events, "event_type", "value", [2.0, 50.0, 98.0])
    res = pd.DataFrame(
        {
            "event_type": out["event_type"].astype(str),
            "q_pct": out["q_pct"].astype(np.int64),
            "value_u": s6(out["value"]),
        }
    )
    return res.sort_values(["event_type", "q_pct"]).reset_index(drop=True)

def q_events_gapfill(sf_dir: str) -> pd.DataFrame:
    """Regular-grid LOCF resampling (pipelines/events.gapfill_locf):
    per user, hourly grid instants between the first and last event,
    each carrying the latest at-or-before value with a deterministic
    (ts, event_id) tie-break — the distributed time-series gap-fill.
    Oracle = the identical integer grid + ROW_NUMBER pick in SQL."""
    import ray.data as rd  # noqa: F401

    from gridfia_ray.context import tune_context
    from gridfia_ray.pipelines.events import gapfill_locf

    tune_context()
    events = read_parquet_clean(os.path.join(sf_dir, "events.parquet"))
    out = gapfill_locf(events).to_pandas()
    res = pd.DataFrame(
        {
            "user_id": out["user_id"].astype(np.int64),
            "grid_ts": out["grid_ts"].astype(np.int64),
            "value_u": s6(out["value"]),
        }
    )
    return res.sort_values(["user_id", "grid_ts"]).reset_index(drop=True)

def q_events_hourly(sf_dir: str) -> pd.DataFrame:
    import ray.data as rd

    from gridfia_ray.context import tune_context

    tune_context()
    events = read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "value"],
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[["user_id", "ts", "value"]].copy()
        b["window_start"] = b["ts"].dt.floor("h").dt.strftime("%Y-%m-%d %H:%M:%S")
        b["value_c"] = np.floor(b["value"] * 100 + 0.5).astype(np.int64)
        g = b.groupby(["user_id", "window_start"], as_index=False).agg(
            n_events=("value_c", "size"),
            sum_value_c=("value_c", "sum"),
            min_value=("value", "min"),
            max_value=("value", "max"),
        )
        g["n_events"] = g["n_events"].astype(np.int64)
        return g

    from gridfia_ray.stages.agg_util import bucketed_agg

    out = bucketed_agg(
        events.map_batches(partial, batch_format="pandas"),
        ["user_id", "window_start"],
        {
            "n_events": ("n_events", "sum"),
            "sum_value_c": ("sum_value_c", "sum"),
            "min_value": ("min_value", "min"),
            "max_value": ("max_value", "max"),
        },
    ).to_pandas()
    out["n_events"] = out["n_events"].astype(np.int64)
    out["sum_value_c"] = out["sum_value_c"].astype(np.int64)
    return out.sort_values(["user_id", "window_start"]).reset_index(drop=True)

def q_events_sessions(sf_dir: str) -> pd.DataFrame:
    """Session windows (30-min gap) over the events log — bucketed
    vectorized split, integer-cents value sums (bit-exact vs the
    DuckDB lag()/cumsum oracle)."""
    import ray.data as rd

    from gridfia_ray.context import tune_context
    from gridfia_ray.pipelines.events import sessionize

    tune_context()
    events = read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts", "value"]
    )

    def to_cents(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["value_c"] = np.floor(batch["value"] * 100 + 0.5).astype(np.int64)
        return batch.drop(columns=["value"])

    out = sessionize(
        events.map_batches(to_cents, batch_format="pandas"), value="value_c"
    ).to_pandas()
    res = pd.DataFrame(
        {
            "user_id": out["user_id"].astype(np.int64),
            "session_start": out["session_start"].dt.strftime("%Y-%m-%d %H:%M:%S"),
            "session_end": out["session_end"].dt.strftime("%Y-%m-%d %H:%M:%S"),
            "n_events": out["n_events"].astype(np.int64),
            "sum_value_c": out["sum_value"].astype(np.int64),
        }
    )
    return res.sort_values(["user_id", "session_start"]).reset_index(drop=True)

def q_events_time_to_convert(sf_dir: str) -> pd.DataFrame:
    """Funnel latency (pipelines/events.time_to_convert): per user the
    µs delay from the first view to the first purchase at-or-after it,
    converted users only — one bucketed exchange, integer-µs math."""
    from gridfia_ray.context import tune_context
    from gridfia_ray.pipelines.events import time_to_convert

    tune_context()
    events = read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "event_type", "ts"],
    )
    out = time_to_convert(events, "view", "purchase").to_pandas()
    if len(out) == 0:
        return pd.DataFrame(
            {"user_id": pd.Series(dtype=np.int64),
             "delay_us": pd.Series(dtype=np.int64)}
        )
    out["user_id"] = out["user_id"].astype(np.int64)
    out["delay_us"] = out["delay_us"].astype(np.int64)
    return out.sort_values("user_id").reset_index(drop=True)

def q_events_window_dedup(sf_dir: str) -> pd.DataFrame:
    """Streaming duplicate-event suppression (pipelines/events.
    window_dedup): drop an event whose immediate same-(user, type)
    predecessor lies within 1 h — LAG semantics, one sort + one diff
    per co-located bucket, exact integer-µs comparison both sides."""
    from gridfia_ray.context import tune_context
    from gridfia_ray.pipelines.events import window_dedup

    tune_context()
    events = read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "event_type", "ts"],
    )
    out = window_dedup(
        events, 3600.0, keys=["user_id", "event_type"]
    ).to_pandas()
    res = pd.DataFrame(
        {
            "event_id": out["event_id"].astype(np.int64),
            "user_id": out["user_id"].astype(np.int64),
            "event_type": out["event_type"].astype(str),
        }
    )
    return res.sort_values("event_id").reset_index(drop=True)

def q_events_hopping(sf_dir: str) -> pd.DataFrame:
    """Hopping windows (60 min window, 15 min hop): each event in 4
    overlapping windows; integer-cents sums for bit-exact compare."""
    import ray.data as rd

    from gridfia_ray.context import tune_context
    from gridfia_ray.pipelines.events import hopping_window_agg

    tune_context()
    events = read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts", "value"]
    )

    def to_cents(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["value_c"] = np.floor(batch["value"] * 100 + 0.5).astype(np.int64)
        return batch.drop(columns=["value"])

    out = hopping_window_agg(
        events.map_batches(to_cents, batch_format="pandas"),
        window_minutes=60,
        hop_minutes=15,
        value="value_c",
    ).to_pandas()
    res = pd.DataFrame(
        {
            "user_id": out["user_id"].astype(np.int64),
            "window_start": pd.to_datetime(out["window_start"]).dt.strftime(
                "%Y-%m-%d %H:%M:%S"
            ),
            "n_events": out["n_events"].astype(np.int64),
            "sum_value_c": out["sum_value"].astype(np.int64),
        }
    )
    return res.sort_values(["user_id", "window_start"]).reset_index(drop=True)

def q_events_sample_per_user(sf_dir: str) -> pd.DataFrame:
    """Deterministic per-key sampling: 5 events per user by smallest
    md5 rank (partition-invariant reservoir equivalent; exact SQL
    oracle via md5 + ROW_NUMBER)."""
    import ray.data as rd

    from gridfia_ray.context import tune_context
    from gridfia_ray.pipelines.sampling import sample_per_key

    tune_context()
    events = read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts", "value"]
    )

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "user_id": batch["user_id"].astype(np.int64),
                # parquet timestamps arrive as datetime64[us]; normalize
                # to ns before the ms division (epoch_ms truncation)
                "ts_ms": batch["ts"].astype("datetime64[ns]").astype("int64") // 1_000_000,
                "value_c": np.floor(batch["value"] * 100 + 0.5).astype(np.int64),
            }
        )
        return out

    out = sample_per_key(
        events.map_batches(prep, batch_format="pandas"),
        "user_id",
        5,
        ["ts_ms", "value_c"],
    ).to_pandas()
    out["ts"] = pd.to_datetime(out["ts_ms"], unit="ms").dt.strftime("%Y-%m-%d %H:%M:%S")
    out = out[["user_id", "ts", "value_c"]].astype({"user_id": np.int64, "value_c": np.int64})
    return out.sort_values(["user_id", "ts", "value_c"]).reset_index(drop=True)

def q_events_asof_join(sf_dir: str) -> pd.DataFrame:
    """As-of join (event attribution): each click matched to the SAME
    user's latest view at-or-before the click. Ray Data has no asof
    operator — this is the bucketed-exchange + per-bucket merge_asof
    composition (``pipelines/joins.asof_join``). Inner semantics: clicks
    with no prior view drop. ``gap_us`` is exact integer microseconds."""
    import ray.data as rd

    from gridfia_ray.context import tune_context
    from gridfia_ray.pipelines.joins import asof_join

    tune_context()
    events = read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type"],
    )

    def side(event_type: str, id_name: str, keep_ts: str | None = None):
        def fn(batch: pd.DataFrame):
            from gridfia_ray.stages.agg_util import to_arrow

            b = batch[batch["event_type"] == event_type]
            out = pd.DataFrame(
                {"user_id": b["user_id"], "ts": b["ts"],
                 id_name: b["event_id"].astype(np.int64)}
            )
            if keep_ts:
                out[keep_ts] = b["ts"].to_numpy()
            return to_arrow(out)  # empty blocks keep their Arrow schema

        return fn

    clicks = events.map_batches(side("click", "click_id"), batch_format="pandas")
    views = events.map_batches(
        side("view", "view_id", keep_ts="view_ts"), batch_format="pandas"
    )
    out = asof_join(clicks, views, by="user_id", on="ts", n_buckets=16).to_pandas()
    gap = (
        out["ts"].astype("datetime64[ns]").astype(np.int64)
        - out["view_ts"].astype("datetime64[ns]").astype(np.int64)
    ) // 1000
    res = pd.DataFrame(
        {
            "click_id": out["click_id"].astype(np.int64),
            "view_id": out["view_id"].astype(np.int64),
            "gap_us": gap.astype(np.int64),
        }
    )
    return res.sort_values("click_id").reset_index(drop=True)

def q_events_error_window_join(sf_dir: str, band_width=None) -> pd.DataFrame:
    """Range (interval) join: every purchase within ±2 h of a same-user
    error event — the brief's range-join operator
    (``pipelines/joins.interval_join``), one bucketed co-partitioning
    exchange keyed on user, per-bucket vectorized containment.
    ``band_width`` switches to the skew-proof domain-banded plan (same
    result set — exercised as its own contract query against the SAME
    SQL oracle)."""
    import pyarrow as pa
    import ray.data as rd

    from gridfia_ray.context import tune_context
    from gridfia_ray.pipelines.joins import interval_join

    tune_context()
    events = read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type"],
    )

    def purchases(batch: pd.DataFrame) -> pa.Table:
        b = batch[batch["event_type"] == "purchase"]
        return pa.table(
            {
                "user_id": pa.Array.from_pandas(b["user_id"]),
                "ts": pa.Array.from_pandas(b["ts"]),
                "purchase_id": pa.array(b["event_id"].to_numpy(np.int64), pa.int64()),
            }
        )

    def error_windows(batch: pd.DataFrame) -> pa.Table:
        b = batch[batch["event_type"] == "error"]
        return pa.table(
            {
                "user_id": pa.Array.from_pandas(b["user_id"]),
                "win_lo": pa.Array.from_pandas(b["ts"] - pd.Timedelta(hours=2)),
                "win_hi": pa.Array.from_pandas(b["ts"] + pd.Timedelta(hours=2)),
                "error_id": pa.array(b["event_id"].to_numpy(np.int64), pa.int64()),
            }
        )

    pts = events.map_batches(purchases, batch_format="pandas")
    wins = events.map_batches(error_windows, batch_format="pandas")
    out = interval_join(
        pts, wins, by="user_id", on="ts", lo="win_lo", hi="win_hi", n_buckets=16,
        band_width=band_width,
    ).to_pandas()
    res = pd.DataFrame(
        {
            "purchase_id": out["purchase_id"].astype(np.int64),
            "error_id": out["error_id"].astype(np.int64),
        }
    )
    return res.sort_values(["purchase_id", "error_id"]).reset_index(drop=True)

def q_events_error_window_banded(sf_dir: str) -> pd.DataFrame:
    """The same interval join under the DOMAIN-BANDED plan (band width ≈
    window length = 4 h): intervals replicate to the time bands they
    span, points probe their own band, so a user with thousands of
    overlapping windows stays linear in true matches. Must hash-match
    the identical SQL oracle as the unbanded plan."""
    return q_events_error_window_join(sf_dir, band_width="4h")
