"""Tumbling-window aggregation over the ``events`` log table.

Ray Data has no event-time windowing; batch semantics are the guide
(ray_guide.md "Streaming-shaped workloads"): assign each event to its
window in ``map_batches`` (vectorized timestamp floor), pre-aggregate per
batch (combiner), then one small ``groupby`` merges partials. Ordering
within windows is irrelevant for the supported reducers (count/sum/min/
max), so no sort is needed — the oracle is plain
``GROUP BY user_id, date_trunc(...)``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd


_WINDOW_ALIAS = {"hour": "h", "day": "D", "minute": "min", "second": "s", "week": "W"}


def tumbling_window_agg(
    events: rd.Dataset, window: str = "hour", key: str = "user_id", value: str = "value"
) -> rd.Dataset:
    """Per (key, window_start): n_events, sum/min/max of ``value``."""
    from gridfia_ray.stages.agg_util import bucketed_agg

    if window not in _WINDOW_ALIAS:
        raise ValueError(f"unsupported window {window!r}; one of {sorted(_WINDOW_ALIAS)}")
    freq = _WINDOW_ALIAS[window]

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[[key, "ts", value]].copy()
        b["window_start"] = b["ts"].dt.floor(freq)
        g = b.groupby([key, "window_start"], as_index=False).agg(
            n_events=(value, "size"),
            sum_value=(value, "sum"),
            min_value=(value, "min"),
            max_value=(value, "max"),
        )
        g["n_events"] = g["n_events"].astype(np.int64)
        return g

    # user×window cardinality is ~O(rows): bucketed merge, not
    # Dataset.aggregate (per-group reduce overhead — see agg_util)
    return bucketed_agg(
        events.map_batches(partial, batch_format="pandas"),
        [key, "window_start"],
        {
            "n_events": ("n_events", "sum"),
            "sum_value": ("sum_value", "sum"),
            "min_value": ("min_value", "min"),
            "max_value": ("max_value", "max"),
        },
    )


def sessionize(
    events: rd.Dataset, gap_minutes: float = 30.0, key: str = "user_id"
) -> rd.Dataset:
    """Session windows: per key, events sorted by ts split where the gap
    exceeds ``gap_minutes``; emits one row per session. Keyed groupby →
    in-group sort (the documented ordering assumption: one group holds
    all of a key's events)."""

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts", kind="mergesort")
        gap = g["ts"].diff().dt.total_seconds().fillna(np.inf) / 60.0
        sid = (gap > gap_minutes).cumsum()
        out = g.groupby(sid).agg(
            session_start=("ts", "min"),
            session_end=("ts", "max"),
            n_events=("event_id", "size"),
            sum_value=("value", "sum"),
        )
        out[key] = g[key].iloc[0]
        out["n_events"] = out["n_events"].astype(np.int64)
        return out.reset_index(drop=True)

    return events.groupby(key).map_groups(per_key, batch_format="pandas")
