"""Markov event-type transitions: brute-force pandas oracle, tie
ordering, bucket-boundary adjacency, probability normalization."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from gridfia_ray.pipelines.events import event_transitions


def _events(n=600, users=12, types=("a", "b", "c"), seed=3):
    rng = np.random.RandomState(seed)
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.randint(0, users, n).astype(np.int64),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.randint(0, 10**6, n), unit="s"),
            "event_type": rng.choice(types, n),
        }
    )


def brute(df):
    d = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    same = d["user_id"].to_numpy()[1:] == d["user_id"].to_numpy()[:-1]
    pairs = pd.DataFrame(
        {
            "from_type": d["event_type"].to_numpy()[:-1][same],
            "to_type": d["event_type"].to_numpy()[1:][same],
        }
    )
    c = pairs.groupby(["from_type", "to_type"], as_index=False).size()
    c = c.rename(columns={"size": "n"})
    tot = c.groupby("from_type")["n"].transform("sum")
    c["p_u"] = np.floor(c["n"] / tot * 1_000_000 + 0.5).astype(np.int64)
    c["n"] = c["n"].astype(np.int64)
    return c.sort_values(["from_type", "to_type"], ignore_index=True)


class TestTransitions:
    def test_matches_brute_force(self, ray_session):
        df = _events()
        got = event_transitions(rd.from_pandas(df).repartition(7), n_buckets=5)
        assert got.equals(brute(df))

    def test_rows_probabilities_sum_to_one(self, ray_session):
        df = _events(seed=8)
        got = event_transitions(rd.from_pandas(df))
        sums = got.groupby("from_type")["p_u"].sum()
        assert ((sums - 1_000_000).abs() <= 2).all()  # rounding slack

    def test_duplicate_ts_breaks_ties_by_event_id(self, ray_session):
        df = pd.DataFrame(
            {
                "event_id": np.array([2, 1, 3], dtype=np.int64),
                "user_id": np.array([5, 5, 5], dtype=np.int64),
                "ts": pd.to_datetime(["2024-01-01"] * 3),
                "event_type": ["b", "a", "c"],  # id order: a(1) b(2) c(3)
            }
        )
        got = event_transitions(rd.from_pandas(df))
        assert list(zip(got["from_type"], got["to_type"])) == [
            ("a", "b"),
            ("b", "c"),
        ]

    def test_single_event_users_emit_nothing(self, ray_session):
        df = _events(n=7, users=7, seed=1)
        df["user_id"] = np.arange(7, dtype=np.int64)  # one event each
        got = event_transitions(rd.from_pandas(df))
        assert len(got) == 0
        assert list(got.columns) == ["from_type", "to_type", "n", "p_u"]


class TestTopPaths:
    def test_matches_brute_force(self, ray_session):
        from gridfia_ray.pipelines.events import top_paths

        df = _events(n=500, users=40, seed=5)
        got = top_paths(
            rd.from_pandas(df).repartition(6), k_events=3, top_n=5,
            n_buckets=4,
        )
        d = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        d = d[d.groupby("user_id").cumcount() < 3]
        paths = d.groupby("user_id")["event_type"].agg(">".join)
        cnt = paths.value_counts()
        exp = (
            pd.DataFrame({"path": cnt.index.astype(str),
                          "n_users": cnt.to_numpy(np.int64)})
            .sort_values(["n_users", "path"], ascending=[False, True],
                         ignore_index=True)
            .head(5)
        )
        assert got.equals(exp)

    def test_short_streams_kept_whole(self, ray_session):
        from gridfia_ray.pipelines.events import top_paths

        df = pd.DataFrame(
            {
                "event_id": np.arange(3, dtype=np.int64),
                "user_id": np.array([1, 1, 2], dtype=np.int64),
                "ts": pd.to_datetime(
                    ["2024-01-01", "2024-01-02", "2024-01-01"]
                ),
                "event_type": ["a", "b", "a"],
            }
        )
        got = top_paths(rd.from_pandas(df), k_events=5, top_n=10)
        assert set(got["path"]) == {"a>b", "a"}
        assert got["n_users"].sum() == 2
