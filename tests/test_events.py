"""Windowed aggregation over the events log vs DuckDB."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from gridfia_ray.pipelines.events import sessionize, tumbling_window_agg

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_ds(ray_session):
    import ray.data as rd

    return rd.read_parquet(f"{SF}/events.parquet")


class TestTumbling:
    def test_matches_sql(self, events_ds):
        got = tumbling_window_agg(events_ds).to_pandas()
        con = duckdb.connect()
        want = con.execute(
            f"""
            SELECT user_id, date_trunc('hour', ts) AS window_start,
                   COUNT(*) AS n_events, SUM(value) AS sum_value,
                   MIN(value) AS min_value, MAX(value) AS max_value
            FROM read_parquet('{SF}/events.parquet') GROUP BY 1, 2
            """
        ).df()
        m = got.merge(want, on=["user_id", "window_start"], suffixes=("", "_o"))
        assert len(m) == len(want) == len(got)
        assert (m["n_events"] == m["n_events_o"]).all()
        assert np.allclose(m["sum_value"], m["sum_value_o"])
        assert (m["min_value"] == m["min_value_o"]).all()
        assert (m["max_value"] == m["max_value_o"]).all()

    def test_day_window_alias(self, events_ds):
        got = tumbling_window_agg(events_ds, window="day").to_pandas()
        con = duckdb.connect()
        want = con.execute(
            f"SELECT user_id, date_trunc('day', ts) w, COUNT(*) n "
            f"FROM read_parquet('{SF}/events.parquet') GROUP BY 1, 2"
        ).df()
        assert len(got) == len(want)

    def test_bad_window_raises(self, events_ds):
        with pytest.raises(ValueError, match="unsupported window"):
            tumbling_window_agg(events_ds, window="fortnight")


class TestSessionize:
    def test_sessions_split_on_gap(self, ray_session):
        import ray.data as rd

        ts = pd.to_datetime(
            [
                "2024-01-01 00:00",
                "2024-01-01 00:10",
                "2024-01-01 01:30",  # > 30 min gap → new session
                "2024-01-01 01:40",
                "2024-01-02 00:00",  # another session
            ]
        )
        df = pd.DataFrame(
            {
                "event_id": range(5),
                "ts": ts,
                "user_id": [1] * 5,
                "event_type": ["x"] * 5,
                "value": [1.0, 2.0, 3.0, 4.0, 5.0],
            }
        )
        out = sessionize(rd.from_pandas(df)).to_pandas().sort_values("session_start")
        assert len(out) == 3
        assert out["n_events"].tolist() == [2, 2, 1]
        assert out["sum_value"].tolist() == [3.0, 7.0, 5.0]

    def test_counts_preserved(self, events_ds):
        out = sessionize(events_ds, gap_minutes=60).to_pandas()
        assert out["n_events"].sum() == events_ds.count()


class TestSamplePerKey:
    """Deterministic md5-rank sampling: content-addressed, so the
    sample is identical across partitionings and matches a driver-side
    pandas reference exactly."""

    def _reference(self, df, k):
        import hashlib

        df = df.copy()
        df["__rank"] = (
            df["user_id"].astype(str) + "|" + df["ts_ms"].astype(str)
            + "|" + df["value_c"].astype(str)
        ).map(lambda s: hashlib.md5(s.encode()).hexdigest())
        df = df.sort_values(["user_id", "__rank"], kind="mergesort")
        return (
            df.groupby("user_id", sort=False).head(k).drop(columns="__rank")
            .sort_values(["user_id", "ts_ms"]).reset_index(drop=True)
        )

    def _prepped(self):
        df = pd.read_parquet(f"{SF}/events.parquet")
        return pd.DataFrame(
            {
                "user_id": df["user_id"].astype(np.int64),
                "ts_ms": df["ts"].astype("datetime64[ns]").astype(np.int64) // 1_000_000,
                "value_c": np.floor(df["value"] * 100 + 0.5).astype(np.int64),
            }
        )

    def test_matches_reference_and_partition_invariant(self, ray_session):
        import ray.data as rd

        from gridfia_ray.pipelines.sampling import sample_per_key

        df = self._prepped()
        expect = self._reference(df, 3)
        for parts in (1, 7):
            got = (
                sample_per_key(rd.from_pandas(df).repartition(parts), "user_id", 3,
                               ["ts_ms", "value_c"])
                .to_pandas()
                .sort_values(["user_id", "ts_ms"])
                .reset_index(drop=True)
            )
            pd.testing.assert_frame_equal(got[expect.columns], expect)

    def test_k_larger_than_group(self, ray_session):
        import ray.data as rd

        from gridfia_ray.pipelines.sampling import sample_per_key

        df = self._prepped().head(20)
        got = sample_per_key(rd.from_pandas(df), "user_id", 1000, ["ts_ms", "value_c"])
        assert got.count() == 20  # keeps everything when k exceeds group size


class TestWeekWindow:
    def test_week_floor_matches_duckdb(self, ray_session, events_ds):
        """'week' windows floor to Monday 00:00 (ISO), matching
        date_trunc('week', ts) — regression: pandas dt.floor('W') raises
        for the non-fixed Week frequency."""
        out = tumbling_window_agg(events_ds, window="week").to_pandas()
        con = duckdb.connect()
        df = pd.read_parquet(f"{SF}/events.parquet")
        con.register("events", df)
        exp = con.execute(
            """SELECT user_id, date_trunc('week', ts) window_start,
                      COUNT(*) n_events
               FROM events GROUP BY 1, 2"""
        ).fetchdf()
        got = (
            out[["user_id", "window_start", "n_events"]]
            .sort_values(["user_id", "window_start"]).reset_index(drop=True)
        )
        exp = (
            exp.astype({"n_events": "int64"})
            .sort_values(["user_id", "window_start"]).reset_index(drop=True)
        )
        got["window_start"] = pd.to_datetime(got["window_start"]).astype("datetime64[us]")
        exp["window_start"] = pd.to_datetime(exp["window_start"]).astype("datetime64[us]")
        pd.testing.assert_frame_equal(got, exp)


class TestHoppingWindow:
    def test_event_in_k_windows(self, ray_session, events_ds):
        """Every event lands in exactly window/hop windows: total
        n_events across all windows = k x row count."""
        from gridfia_ray.pipelines.events import hopping_window_agg

        out = hopping_window_agg(events_ds, window_minutes=60, hop_minutes=15).to_pandas()
        n_rows = len(pd.read_parquet(f"{SF}/events.parquet"))
        assert out["n_events"].sum() == 4 * n_rows

    def test_rejects_nonmultiple_hop(self, ray_session, events_ds):
        from gridfia_ray.pipelines.events import hopping_window_agg

        with pytest.raises(ValueError):
            hopping_window_agg(events_ds, window_minutes=60, hop_minutes=25)


class TestFunnel:
    def _ev(self, rows):
        return pd.DataFrame(
            {
                "user_id": np.array([r[0] for r in rows], np.int64),
                "event_type": [r[1] for r in rows],
                "ts": pd.to_datetime([r[2] for r in rows]),
            }
        )

    def test_strict_ordering_semantics(self, ray_session):
        import ray.data as rd

        from gridfia_ray.pipelines.events import funnel_depths

        rows = [
            # u1: full ordered funnel
            (1, "view", "2024-01-01 10:00"), (1, "click", "2024-01-01 11:00"),
            (1, "purchase", "2024-01-01 12:00"),
            # u2: purchase BEFORE click — depth 2 only
            (2, "view", "2024-01-01 10:00"), (2, "purchase", "2024-01-01 10:30"),
            (2, "click", "2024-01-01 11:00"),
            # u3: click before any view — depth 1
            (3, "click", "2024-01-01 09:00"), (3, "view", "2024-01-01 10:00"),
            # u4: no view at all — absent from output
            (4, "click", "2024-01-01 09:00"), (4, "purchase", "2024-01-01 10:00"),
            # u5: equal timestamps are NOT strictly after — depth 1
            (5, "view", "2024-01-01 10:00"), (5, "click", "2024-01-01 10:00"),
            # u6: earliest view enables a later click even though a
            # second view sits between them
            (6, "view", "2024-01-01 08:00"), (6, "view", "2024-01-01 12:00"),
            (6, "click", "2024-01-01 09:00"),
        ]
        got = (
            funnel_depths(
                rd.from_pandas(self._ev(rows)).repartition(3),
                ["view", "click", "purchase"], n_buckets=4,
            )
            .to_pandas().sort_values("user_id").reset_index(drop=True)
        )
        want = {1: 3, 2: 2, 3: 1, 5: 1, 6: 2}
        assert dict(zip(got["user_id"], got["depth"])) == want

    def test_needs_two_steps(self, ray_session):
        import ray.data as rd

        from gridfia_ray.pipelines.events import funnel_depths

        with pytest.raises(ValueError, match="two steps"):
            funnel_depths(rd.from_pandas(self._ev([])), ["view"])


class TestRunningAgg:
    def test_matches_pandas_window(self, ray_session):
        import ray.data as rd

        from gridfia_ray.pipelines.events import running_agg

        rng = np.random.RandomState(6)
        n = 3000
        df = pd.DataFrame(
            {
                "event_id": np.arange(n, dtype=np.int64),
                "user_id": rng.randint(0, 40, n).astype(np.int64),
                "ts": pd.to_datetime("2024-01-01")
                + pd.to_timedelta(rng.randint(0, 500, n), unit="s"),  # many ties
                "value_c": rng.randint(-50, 100, n).astype(np.int64),
            }
        )
        got = (
            running_agg(rd.from_pandas(df).repartition(7), "user_id",
                        ["ts", "event_id"], "value_c", n_buckets=8)
            .to_pandas().sort_values("event_id").reset_index(drop=True)
        )
        want = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort").copy()
        grp = want.groupby("user_id", sort=False)["value_c"]
        want["running_sum"] = grp.cumsum()
        want["prev_value"] = grp.shift(1)
        want["next_value"] = grp.shift(-1)
        want["row_number"] = want.groupby("user_id", sort=False).cumcount() + 1
        want = want.sort_values("event_id").reset_index(drop=True)
        assert got["running_sum"].tolist() == want["running_sum"].tolist()
        for col in ("prev_value", "next_value"):
            assert got[col].fillna(-999).tolist() == want[col].fillna(-999).tolist()
        assert got["row_number"].tolist() == want["row_number"].tolist()

    def test_partition_invariant(self, ray_session):
        import ray.data as rd

        from gridfia_ray.pipelines.events import running_agg

        rng = np.random.RandomState(7)
        df = pd.DataFrame(
            {
                "event_id": np.arange(500, dtype=np.int64),
                "user_id": rng.randint(0, 5, 500).astype(np.int64),
                "ts": pd.to_datetime("2024-01-01")
                + pd.to_timedelta(rng.randint(0, 50, 500), unit="s"),
                "value_c": rng.randint(0, 10, 500).astype(np.int64),
            }
        )
        a = (running_agg(rd.from_pandas(df).repartition(1), "user_id",
                         ["ts", "event_id"], "value_c", n_buckets=2)
             .to_pandas().sort_values("event_id").reset_index(drop=True))
        b = (running_agg(rd.from_pandas(df).repartition(9), "user_id",
                         ["ts", "event_id"], "value_c", n_buckets=32)
             .to_pandas().sort_values("event_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b)


class TestExtractJsonInt:
    def test_top_level_semantics_match_duckdb(self, ray_session):
        """The regex fast path must agree with json_extract('$.k') even on
        nested objects and key-lookalikes inside string values (ADVICE
        r3): ambiguous rows fall back to a real JSON parse."""
        import duckdb
        import ray.data as rd

        from gridfia_ray.pipelines.events import extract_json_int

        payloads = [
            '{"k": 7, "other": 1}',                      # flat — fast path
            '{"nested": {"k": 99}}',                     # k only nested → NA
            '{"k": 1, "nested": {"k": 99}}',             # top-level wins
            '{"note": "see \\"k\\": 42 in docs", "k": 5}',  # escaped lookalike
            '{"note": "see \\"k\\": 42 in docs"}',       # ONLY the lookalike → NA
            '{"k": 12.5}',                               # non-int → NA
            '{"k": true}',                               # bool → NA
            '{"j": 3}',                                  # missing → NA
            '{"k": -8}',                                 # negative int
        ]
        df = pd.DataFrame(
            {"event_id": np.arange(len(payloads), dtype=np.int64), "props": payloads}
        )
        got = (
            extract_json_int(rd.from_pandas(df).repartition(3), "props", "k")
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("t", df)
        # integer-valued top-level fields only (the operator's contract —
        # TRY_CAST alone would round '12.5' to 13)
        want = con.execute(
            "SELECT event_id, CASE WHEN regexp_matches("
            "json_extract_string(props, '$.k'), '^-?[0-9]+$') THEN "
            "CAST(json_extract_string(props, '$.k') AS BIGINT) END k"
            " FROM t ORDER BY event_id"
        ).df()
        con.close()
        got_k = got["k"].astype("Int64").fillna(-999).tolist()
        want_k = want["k"].astype("Int64").fillna(-999).tolist()
        assert got_k == want_k
        assert got_k == [7, -999, 1, 5, -999, -999, -999, -999, -8]


class TestRetentionCohorts:
    def _events(self, rows):
        # rows: (user, day) pairs -> timestamps inside epoch weeks
        df = pd.DataFrame(
            {
                "user_id": np.asarray([r[0] for r in rows], np.int64),
                "ts": pd.to_datetime(
                    [np.datetime64("2024-01-04") + np.timedelta64(r[1], "D") for r in rows]
                ),
            }
        )
        return rd.from_pandas(df)

    def _run(self, rows, parts=3):
        from gridfia_ray.pipelines.events import retention_cohorts

        out = (
            retention_cohorts(self._events(rows).repartition(parts), n_buckets=4)
            .to_pandas()
            .astype(np.int64)
            .sort_values(["cohort_week", "week_offset"])
            .reset_index(drop=True)
        )
        return list(
            out[["week_offset", "n_users"]].itertuples(index=False, name=None)
        ), out

    def test_hand_computed_matrix(self, ray_session):
        # user 1: weeks 0,1,3; user 2: weeks 0,1; user 3: week 1 only
        rows = [(1, 0), (1, 7), (1, 21), (2, 1), (2, 8), (3, 9), (1, 2)]
        pairs, out = self._run(rows)
        # cohort A (week of day 0): offsets 0->2users, 1->2, 3->1
        # cohort B (week of day 9, user 3): offset 0 -> 1
        offs = {}
        for (c, o), n in zip(
            out[["cohort_week", "week_offset"]].itertuples(index=False, name=None),
            out["n_users"],
        ):
            offs[(c - out["cohort_week"].min(), o)] = int(n)
        assert offs == {(0, 0): 2, (0, 1): 2, (0, 3): 1, (1, 0): 1}

    def test_offset_zero_equals_cohort_size(self, ray_session):
        rng = np.random.RandomState(2)
        rows = [(int(u), int(d)) for u, d in zip(rng.randint(0, 30, 300), rng.randint(0, 60, 300))]
        _, out = self._run(rows, parts=6)
        zero = out[out["week_offset"] == 0].set_index("cohort_week")["n_users"]
        # each user appears in exactly one cohort at offset 0
        assert int(zero.sum()) == len({u for u, _ in rows})

    def test_duplicate_events_count_once(self, ray_session):
        rows = [(1, 0), (1, 0), (1, 0), (1, 7), (1, 7)]
        _, out = self._run(rows)
        assert out["n_users"].tolist() == [1, 1]

    def test_partition_invariant(self, ray_session):
        rng = np.random.RandomState(3)
        rows = [(int(u), int(d)) for u, d in zip(rng.randint(0, 15, 200), rng.randint(0, 40, 200))]
        a, _ = self._run(rows, parts=1)
        b, _ = self._run(rows, parts=9)
        assert a == b


class TestGapfillLocf:
    def _run(self, df):
        import ray.data as rd

        from gridfia_ray.pipelines.events import gapfill_locf

        out = gapfill_locf(
            rd.from_pandas(df).repartition(3), step_us=100, n_buckets=4
        ).to_pandas()
        return out.sort_values(["user_id", "grid_ts"]).reset_index(drop=True)

    @staticmethod
    def _df(rows):
        import pandas as pd

        df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts_us", "value"])
        df["ts"] = pd.to_datetime(df["ts_us"], unit="us")
        return df[["event_id", "user_id", "ts", "value"]]

    def test_locf_and_grid_bounds(self, ray_session):
        # user 1: events at 50, 130, 420 → grid 100..400 step 100
        df = self._df(
            [(0, 1, 50, 1.0), (1, 1, 130, 2.0), (2, 1, 420, 3.0)]
        )
        out = self._run(df)
        assert out["grid_ts"].tolist() == [100, 200, 300, 400]
        assert out["value"].tolist() == [1.0, 2.0, 2.0, 2.0]

    def test_tie_break_max_event_id(self, ray_session):
        # two events at the same µs: the larger event_id wins
        df = self._df([(5, 2, 100, 7.0), (9, 2, 100, 8.0), (6, 2, 250, 1.0)])
        out = self._run(df)
        assert out[out["grid_ts"] == 100]["value"].iloc[0] == 8.0
        assert out[out["grid_ts"] == 200]["value"].iloc[0] == 8.0

    def test_key_without_grid_point_emits_nothing(self, ray_session):
        # all events inside (100, 200): ceil(min)=200 > floor(max)=100
        df = self._df(
            [(0, 3, 110, 1.0), (1, 3, 190, 2.0), (2, 4, 100, 5.0)]
        )
        out = self._run(df)
        assert (out["user_id"] == 3).sum() == 0
        assert out[out["user_id"] == 4]["grid_ts"].tolist() == [100]

    def test_event_on_grid_point_included(self, ray_session):
        df = self._df([(0, 5, 200, 4.0)])
        out = self._run(df)
        assert out["grid_ts"].tolist() == [200]
        assert out["value"].iloc[0] == 4.0


class TestWindowDedup:
    def _events(self, rows):
        # rows: (event_id, user_id, event_type, sec, value)
        base = pd.Timestamp("2026-01-01")
        return pd.DataFrame(
            {
                "event_id": [r[0] for r in rows],
                "user_id": [r[1] for r in rows],
                "event_type": [r[2] for r in rows],
                "ts": [base + pd.Timedelta(seconds=r[3]) for r in rows],
                "value": [r[4] for r in rows],
            }
        )

    def _run(self, df, window, keys, n_parts=3):
        from gridfia_ray.pipelines.events import window_dedup

        out = window_dedup(
            rd.from_pandas(df).repartition(n_parts), window, keys=keys, n_buckets=4
        ).to_pandas()
        return sorted(out["event_id"].tolist())

    def test_lag_semantics_chain(self, ray_session):
        # retries at +5s and +9s: BOTH drop under LAG (each within 10s
        # of its immediate predecessor), the +25s event survives
        df = self._events(
            [(1, 7, "c", 0, 1.0), (2, 7, "c", 5, 1.0),
             (3, 7, "c", 9, 1.0), (4, 7, "c", 25, 1.0)]
        )
        assert self._run(df, 10.0, ["user_id", "event_type", "value"]) == [1, 4]

    def test_payload_key_separates(self, ray_session):
        # same instant, different value => different payload, both kept
        df = self._events([(1, 7, "c", 0, 1.0), (2, 7, "c", 1, 2.0)])
        assert self._run(df, 10.0, ["user_id", "event_type", "value"]) == [1, 2]

    def test_tie_on_ts_keeps_smaller_id(self, ray_session):
        df = self._events([(9, 7, "c", 0, 1.0), (3, 7, "c", 0, 1.0)])
        assert self._run(df, 10.0, ["user_id", "event_type", "value"]) == [3]

    def test_matches_duckdb_lag_oracle(self, ray_session):
        rng = np.random.RandomState(8)
        n = 2000
        df = self._events(
            [
                (i, int(rng.randint(0, 20)), str(rng.choice(["a", "b"])),
                 int(rng.randint(0, 5000)), 1.0)
                for i in range(n)
            ]
        )
        got = self._run(df, 60.0, ["user_id", "event_type"])
        want = duckdb.sql(
            """WITH o AS (
                 SELECT event_id,
                        LAG(ts) OVER (PARTITION BY user_id, event_type
                                      ORDER BY ts, event_id) pts, ts
                 FROM df)
               SELECT event_id FROM o
               WHERE pts IS NULL OR epoch_us(ts) - epoch_us(pts) > 60000000
               ORDER BY event_id"""
        ).df()["event_id"].tolist()
        assert got == want

    def test_partition_invariance(self, ray_session):
        rng = np.random.RandomState(12)
        df = self._events(
            [
                (i, int(rng.randint(0, 6)), "t", int(rng.randint(0, 900)), 1.0)
                for i in range(500)
            ]
        )
        a = self._run(df, 30.0, ["user_id", "event_type"], n_parts=2)
        b = self._run(df, 30.0, ["user_id", "event_type"], n_parts=9)
        assert a == b


class TestTimeToConvert:
    def _run(self, rows, n_parts=3):
        from gridfia_ray.pipelines.events import time_to_convert

        base = pd.Timestamp("2026-01-01")
        df = pd.DataFrame(
            {
                "user_id": [r[0] for r in rows],
                "event_type": [r[1] for r in rows],
                "ts": [base + pd.Timedelta(seconds=r[2]) for r in rows],
            }
        )
        out = time_to_convert(
            rd.from_pandas(df).repartition(n_parts), "view", "purchase", n_buckets=4
        ).to_pandas()
        return dict(zip(out["user_id"].astype(int), out["delay_us"].astype(int)))

    def test_basic_latency(self, ray_session):
        got = self._run([(1, "view", 10), (1, "purchase", 70)])
        assert got == {1: 60_000_000}

    def test_purchase_before_view_ignored(self, ray_session):
        # the pre-view purchase doesn't count; the post-view one does
        got = self._run(
            [(1, "purchase", 5), (1, "view", 10), (1, "purchase", 25)]
        )
        assert got == {1: 15_000_000}

    def test_first_view_anchors(self, ray_session):
        got = self._run(
            [(1, "view", 10), (1, "view", 50), (1, "purchase", 60)]
        )
        assert got == {1: 50_000_000}

    def test_unconverted_excluded(self, ray_session):
        got = self._run(
            [(1, "view", 10), (2, "view", 5), (2, "purchase", 8)]
        )
        assert 1 not in got and got[2] is not None

    def test_same_instant_converts(self, ray_session):
        got = self._run([(3, "view", 10), (3, "purchase", 10)])
        assert got == {3: 0}


class TestRollingAnomaly:
    @staticmethod
    def _events(vals, etype="a"):
        return pd.DataFrame(
            {
                "event_id": np.arange(len(vals), dtype=np.int64),
                "ts": pd.to_datetime(np.arange(len(vals)), unit="s"),
                "event_type": etype,
                "value": np.asarray(vals, np.float64),
            }
        )

    def test_planted_spike_flagged(self, ray_session):
        from gridfia_ray.pipelines.events import rolling_anomaly

        vals = [10.0 + 0.1 * (i % 5) for i in range(30)]
        vals[25] = 500.0  # the spike
        out = (rolling_anomaly(rd.from_pandas(self._events(vals)), n_buckets=2)
               .to_pandas().set_index("event_id"))
        assert out.loc[25, "flagged"] == 1
        # steady rows are not flagged
        assert out.loc[[5, 10, 20], "flagged"].sum() == 0
        # too little history is never flagged
        assert out.loc[[0, 1], "flagged"].sum() == 0

    def test_matches_sequential_replay(self, ray_session):
        from gridfia_ray.pipelines.events import rolling_anomaly

        rng = np.random.RandomState(41)
        df = pd.concat(
            [self._events(rng.rand(40) * 100, "a"),
             self._events(rng.rand(25) * 50, "b")],
            ignore_index=True,
        )
        df["event_id"] = np.arange(len(df), dtype=np.int64)
        out = (rolling_anomaly(rd.from_pandas(df), window=7, k=2, n_buckets=4)
               .to_pandas().set_index("event_id"))
        for etype, grp in df.groupby("event_type"):
            grp = grp.sort_values(["ts", "event_id"])
            hist = []
            for r in grp.itertuples():
                v = int(np.floor(r.value * 1000 + 0.5))
                win = hist[-7:]
                n, S, Q = len(win), sum(win), sum(x * x for x in win)
                want = int(n >= 2 and (n * v - S) ** 2 > 4 * (n * Q - S * S))
                assert out.loc[r.event_id, "flagged"] == want, r.event_id
                assert out.loc[r.event_id, "n_window"] == n
                hist.append(v)
