"""Distributed joins: shuffle hash join and bucketed as-of join."""

import numpy as np
import pandas as pd
import pytest

from gridfia_ray.pipelines.joins import (
    asof_join,
    broadcast_semi_join,
    interval_join,
    shuffle_hash_join,
)


def _ds(df, parts=3):
    import ray.data as rd

    return rd.from_pandas(df).repartition(parts)


class TestShuffleHashJoin:
    def test_matches_pandas_merge(self, ray_session):
        rng = np.random.RandomState(3)
        left = pd.DataFrame(
            {"k": rng.randint(0, 50, 200), "lv": np.arange(200, dtype=np.int64)}
        )
        right = pd.DataFrame(
            {"k": rng.randint(0, 50, 80), "rv": np.arange(80, dtype=np.int64)}
        )
        got = (
            shuffle_hash_join(_ds(left), _ds(right), on=["k"], num_partitions=4)
            .to_pandas()
            .sort_values(["k", "lv", "rv"])
            .reset_index(drop=True)
        )
        want = (
            left.merge(right, on="k")
            .sort_values(["k", "lv", "rv"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got[["k", "lv", "rv"]].astype(np.int64), want.astype(np.int64)
        )

    def test_right_on(self, ray_session):
        left = pd.DataFrame({"a": [1, 2, 3], "lv": [10, 20, 30]})
        right = pd.DataFrame({"b": [2, 3, 4], "rv": [200, 300, 400]})
        got = (
            shuffle_hash_join(
                _ds(left, 2), _ds(right, 2), on=["a"], right_on=["b"],
                num_partitions=2,
            )
            .to_pandas()
            .sort_values("a")
            .reset_index(drop=True)
        )
        assert got["a"].tolist() == [2, 3]
        assert got["rv"].tolist() == [200, 300]


class TestBroadcastSemiJoin:
    def _frames(self):
        rng = np.random.RandomState(13)
        left = pd.DataFrame(
            {"k": rng.randint(0, 50, 300).astype(np.int64),
             "payload": np.arange(300, dtype=np.int64)}
        )
        keys = pd.DataFrame({"k": rng.randint(0, 25, 80).astype(np.int64)})
        return left, keys

    def test_semi_and_anti_partition(self, ray_session):
        left, keys = self._frames()
        kset = set(keys["k"])
        semi = broadcast_semi_join(_ds(left, 4), _ds(keys, 3), "k").to_pandas()
        anti = broadcast_semi_join(_ds(left, 4), _ds(keys, 3), "k", anti=True).to_pandas()
        assert set(semi["payload"]) == set(left.loc[left["k"].isin(kset), "payload"])
        assert set(anti["payload"]) == set(left.loc[~left["k"].isin(kset), "payload"])
        assert len(semi) + len(anti) == len(left)

    def test_empty_keys(self, ray_session):
        left, _ = self._frames()
        keys = pd.DataFrame({"k": pd.Series(dtype=np.int64)})
        semi = broadcast_semi_join(_ds(left, 2), _ds(keys, 1), "k").to_pandas()
        anti = broadcast_semi_join(_ds(left, 2), _ds(keys, 1), "k", anti=True).to_pandas()
        assert len(semi) == 0 and len(anti) == len(left)

    def test_auto_route_beyond_max_keys(self, ray_session):
        # a tiny max_keys forces the hash-shuffle semi/anti fork; results
        # must match the broadcast path exactly (same columns, same rows)
        left, keys = self._frames()
        kset = set(keys["k"])
        semi = broadcast_semi_join(
            _ds(left, 4), _ds(keys, 3), "k", max_keys=3
        ).to_pandas()
        anti = broadcast_semi_join(
            _ds(left, 4), _ds(keys, 3), "k", anti=True, max_keys=3
        ).to_pandas()
        assert sorted(semi.columns) == sorted(left.columns)
        assert sorted(anti.columns) == sorted(left.columns)
        assert set(semi["payload"]) == set(left.loc[left["k"].isin(kset), "payload"])
        assert set(anti["payload"]) == set(left.loc[~left["k"].isin(kset), "payload"])
        assert len(semi) + len(anti) == len(left)

    def test_auto_route_beyond_byte_bound(self, ray_session):
        # wide keys: an id-count bound alone would still broadcast; the
        # byte bound must route to the shuffle join (VERDICT r3 #1 shape)
        left = pd.DataFrame(
            {"k": [f"key-{i:04d}" * 32 for i in range(40)],
             "payload": np.arange(40, dtype=np.int64)}
        )
        keys = pd.DataFrame({"k": left["k"].iloc[::2]})
        got = broadcast_semi_join(
            _ds(left, 2), _ds(keys, 2), "k", max_broadcast_bytes=64
        ).to_pandas()
        assert set(got["payload"]) == set(left["payload"].iloc[::2])

    def test_string_keys(self, ray_session):
        left = pd.DataFrame({"k": ["a", "b", "c", "d"], "v": np.int64([1, 2, 3, 4])})
        keys = pd.DataFrame({"k": ["b", "d", "d"]})
        got = broadcast_semi_join(_ds(left, 2), _ds(keys, 1), "k").to_pandas()
        assert sorted(got["k"]) == ["b", "d"]


class TestIntervalJoin:
    def _frames(self):
        rng = np.random.RandomState(9)
        pts = pd.DataFrame(
            {
                "u": rng.randint(0, 10, 150).astype(np.int64),
                "t": rng.uniform(0, 1000, 150),
                "pid": np.arange(150, dtype=np.int64),
            }
        )
        lo = rng.uniform(0, 950, 60)
        itv = pd.DataFrame(
            {
                "u": rng.randint(0, 10, 60).astype(np.int64),
                "lo": lo,
                "hi": lo + rng.uniform(0, 100, 60),
                "iid": np.arange(60, dtype=np.int64) + 500,
            }
        )
        return pts, itv

    def _oracle(self, pts, itv):
        m = pts.merge(itv, on="u")
        m = m[(m["t"] >= m["lo"]) & (m["t"] <= m["hi"])]
        return (
            m[["u", "pid", "iid"]]
            .sort_values(["pid", "iid"])
            .reset_index(drop=True)
            .astype(np.int64)
        )

    def test_matches_pandas_oracle(self, ray_session):
        pts, itv = self._frames()
        got = (
            interval_join(_ds(pts), _ds(itv), by="u", on="t", lo="lo", hi="hi",
                          n_buckets=8)
            .to_pandas()[["u", "pid", "iid"]]
            .sort_values(["pid", "iid"])
            .reset_index(drop=True)
            .astype(np.int64)
        )
        want = self._oracle(pts, itv)
        pd.testing.assert_frame_equal(got, want)
        assert len(want) > 0  # fixture actually exercises matches

    def test_inclusive_bounds(self, ray_session):
        pts = pd.DataFrame({"u": np.int64([1, 1, 1]), "t": [0.0, 5.0, 10.0],
                            "pid": np.int64([0, 1, 2])})
        itv = pd.DataFrame({"u": np.int64([1]), "lo": [0.0], "hi": [10.0],
                            "iid": np.int64([9])})
        got = interval_join(_ds(pts, 1), _ds(itv, 1), by="u", on="t",
                            lo="lo", hi="hi", n_buckets=2).to_pandas()
        assert sorted(got["pid"].astype(int).tolist()) == [0, 1, 2]

    def test_rejects_clash(self, ray_session):
        pts = pd.DataFrame({"u": [1], "t": [1.0], "x": [1]})
        itv = pd.DataFrame({"u": [1], "lo": [0.0], "hi": [2.0], "x": [2]})
        with pytest.raises(ValueError, match="disjoint"):
            interval_join(_ds(pts, 1), _ds(itv, 1), by="u", on="t",
                          lo="lo", hi="hi")

    def test_banded_matches_unbanded(self, ray_session):
        # domain banding is a pure execution-plan change: the result set
        # must be IDENTICAL (each pair meets in exactly one band)
        pts, itv = self._frames()
        got = (
            interval_join(_ds(pts), _ds(itv), by="u", on="t", lo="lo", hi="hi",
                          n_buckets=8, band_width=50.0)
            .to_pandas()[["u", "pid", "iid"]]
            .sort_values(["pid", "iid"])
            .reset_index(drop=True)
            .astype(np.int64)
        )
        pd.testing.assert_frame_equal(got, self._oracle(pts, itv))

    def test_banded_timestamps(self, ray_session):
        base = pd.to_datetime("2024-03-01")
        pts = pd.DataFrame(
            {"u": np.int64([1, 1, 2]),
             "t": base + pd.to_timedelta([10, 200, 50], unit="m"),
             "pid": np.int64([0, 1, 2])}
        )
        itv = pd.DataFrame(
            {"u": np.int64([1, 2]),
             "lo": base + pd.to_timedelta([0, 40], unit="m"),
             "hi": base + pd.to_timedelta([60, 55], unit="m"),
             "iid": np.int64([9, 8])}
        )
        got = interval_join(
            _ds(pts, 2), _ds(itv, 1), by="u", on="t", lo="lo", hi="hi",
            n_buckets=4, band_width="15min",
        ).to_pandas()
        assert sorted(zip(got["pid"].astype(int), got["iid"].astype(int))) == [
            (0, 9), (2, 8)
        ]

    def test_banded_skew_hot_key(self, ray_session):
        # ONE key, 10^4 long overlapping intervals, 200 points: the
        # unbanded plan's per-key merge intermediate is 2e6 pairs; the
        # banded plan's per-band merges stay proportional to output.
        # Correctness is asserted against the brute oracle; the budget
        # claim is structural (each band's merge only sees its own rows).
        n_itv = 10_000
        rng = np.random.RandomState(77)
        lo = rng.uniform(0, 9_000, n_itv)
        itv = pd.DataFrame(
            {"u": np.zeros(n_itv, np.int64), "lo": lo,
             "hi": lo + rng.uniform(400, 900, n_itv),
             "iid": np.arange(n_itv, dtype=np.int64)}
        )
        pts = pd.DataFrame(
            {"u": np.zeros(200, np.int64),
             "t": rng.uniform(0, 10_000, 200),
             "pid": np.arange(200, dtype=np.int64)}
        )
        got = interval_join(
            _ds(pts, 4), _ds(itv, 8), by="u", on="t", lo="lo", hi="hi",
            n_buckets=16, band_width=500.0,
        ).to_pandas()
        want = self._oracle(pts, itv)
        got = (
            got[["u", "pid", "iid"]]
            .sort_values(["pid", "iid"])
            .reset_index(drop=True)
            .astype(np.int64)
        )
        pd.testing.assert_frame_equal(got, want)
        assert len(want) > 100_000  # genuinely dense overlap

    def test_band_cap_raises(self, ray_session):
        pts = pd.DataFrame({"u": np.int64([1]), "t": [5.0], "pid": np.int64([0])})
        itv = pd.DataFrame({"u": np.int64([1]), "lo": [0.0], "hi": [1e9],
                            "iid": np.int64([1])})
        with pytest.raises(Exception, match="max_bands_per_interval"):
            interval_join(
                _ds(pts, 1), _ds(itv, 1), by="u", on="t", lo="lo", hi="hi",
                band_width=1.0, max_bands_per_interval=100,
            ).materialize()

    def test_empty_side_clear_error(self, ray_session):
        import ray.data as rd

        pts = pd.DataFrame({"u": np.int64([1]), "t": [5.0], "pid": np.int64([0])})
        empty = rd.from_items([])  # schema() is None
        with pytest.raises(ValueError, match="empty/schema-less"):
            interval_join(_ds(pts, 1), empty, by="u", on="t", lo="lo", hi="hi")


class TestAsofJoin:
    def _frames(self):
        rng = np.random.RandomState(5)
        n_l, n_r = 300, 200
        left = pd.DataFrame(
            {
                "u": rng.randint(0, 20, n_l).astype(np.int64),
                "t": pd.to_datetime("2024-01-01")
                + pd.to_timedelta(rng.randint(0, 10**6, n_l), unit="s"),
                "lid": np.arange(n_l, dtype=np.int64),
            }
        )
        right = pd.DataFrame(
            {
                "u": rng.randint(0, 20, n_r).astype(np.int64),
                "t": pd.to_datetime("2024-01-01")
                + pd.to_timedelta(rng.randint(0, 10**6, n_r), unit="s"),
                "rid": np.arange(n_r, dtype=np.int64) + 1000,
            }
        )
        return left, right

    def _oracle(self, left, right, direction="backward", tolerance=None, how="inner"):
        lf = left.sort_values("t", kind="mergesort")
        rf = right.sort_values(["t", "rid"], kind="mergesort")
        out = pd.merge_asof(
            lf, rf, on="t", by="u", direction=direction, tolerance=tolerance
        )
        if how == "inner":
            out = out[out["rid"].notna()].copy()
            out["rid"] = out["rid"].astype(np.int64)
        return out.sort_values("lid").reset_index(drop=True)[["u", "t", "lid", "rid"]]

    @pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
    def test_matches_merge_asof(self, ray_session, direction):
        left, right = self._frames()
        got = (
            asof_join(_ds(left), _ds(right), by="u", on="t",
                      direction=direction, n_buckets=8)
            .to_pandas()
            .sort_values("lid")
            .reset_index(drop=True)[["u", "t", "lid", "rid"]]
        )
        want = self._oracle(left, right, direction=direction)
        pd.testing.assert_frame_equal(got, want)

    def test_left_keeps_unmatched(self, ray_session):
        left, right = self._frames()
        got = asof_join(
            _ds(left), _ds(right), by="u", on="t", how="left", n_buckets=8
        ).to_pandas()
        assert len(got) == len(left)
        assert got["rid"].isna().sum() > 0

    def test_tolerance(self, ray_session):
        left, right = self._frames()
        tol = pd.Timedelta(hours=6)
        got = (
            asof_join(_ds(left), _ds(right), by="u", on="t",
                      tolerance=tol, n_buckets=8)
            .to_pandas()
            .sort_values("lid")
            .reset_index(drop=True)[["u", "t", "lid", "rid"]]
        )
        want = self._oracle(left, right, tolerance=tol)
        pd.testing.assert_frame_equal(got, want)

    def test_tie_break_deterministic(self, ray_session):
        """Duplicate (by, on) right rows: winner is the max under the
        all-columns sort, regardless of partitioning."""
        left = pd.DataFrame(
            {"u": np.int64([1]), "t": pd.to_datetime(["2024-01-02"]),
             "lid": np.int64([0])}
        )
        right = pd.DataFrame(
            {"u": np.int64([1, 1]), "t": pd.to_datetime(["2024-01-01"] * 2),
             "rid": np.int64([7, 3])}
        )
        for parts in (1, 2):
            got = asof_join(
                _ds(left, 1), _ds(right, parts), by="u", on="t", n_buckets=4
            ).to_pandas()
            assert got["rid"].tolist() == [7]

    def test_tie_break_forward_first_wins(self, ray_session):
        """direction='forward': among equal (by, on) right rows
        merge_asof picks the FIRST under the all-columns sort (min) —
        pinned so the documented semantics stay honest."""
        left = pd.DataFrame(
            {"u": np.int64([1]), "t": pd.to_datetime(["2024-01-01"]),
             "lid": np.int64([0])}
        )
        right = pd.DataFrame(
            {"u": np.int64([1, 1]), "t": pd.to_datetime(["2024-01-02"] * 2),
             "rid": np.int64([7, 3])}
        )
        got = asof_join(
            _ds(left, 1), _ds(right, 2), by="u", on="t", n_buckets=4,
            direction="forward",
        ).to_pandas()
        assert got["rid"].tolist() == [3]

    def test_int64_above_2e53_exact(self, ray_session):
        """Hash-scale ids (> 2^53) must survive the padded exchange and
        a left join's null-bearing columns without float rounding."""
        big = np.int64(2**62 + 12345678901)  # not float64-representable
        left = pd.DataFrame(
            {"u": np.int64([1, 2]), "t": [1.0, 1.0], "lid": np.int64([big, big + 1])}
        )
        right = pd.DataFrame(
            {"u": np.int64([1]), "t": [0.5], "rid": np.int64([big + 2])}
        )
        # read via Arrow — pandas itself cannot represent nullable int64
        # exactly, which is precisely the degradation being pinned here
        out = asof_join(_ds(left, 2), _ds(right, 1), by="u", on="t",
                        how="left", n_buckets=4)
        rows = sorted(
            out.take_batch(10, batch_format="pyarrow").to_pylist(),
            key=lambda r: r["u"],
        )
        assert [r["lid"] for r in rows] == [big, big + 1]
        assert rows[0]["rid"] == big + 2  # matched: exact
        assert rows[1]["rid"] is None  # unmatched: null, not garbage
        # interval join: same exactness through its exchange
        pts = pd.DataFrame({"u": np.int64([1]), "t": [5.0], "pid": np.int64([big])})
        itv = pd.DataFrame(
            {"u": np.int64([1]), "lo": [0.0], "hi": [9.0], "iid": np.int64([big + 3])}
        )
        got2 = interval_join(_ds(pts, 1), _ds(itv, 1), by="u", on="t",
                             lo="lo", hi="hi", n_buckets=2).to_pandas()
        assert got2["pid"].tolist() == [big] and got2["iid"].tolist() == [big + 3]

    def test_partition_invariant(self, ray_session):
        left, right = self._frames()
        a = (
            asof_join(_ds(left, 1), _ds(right, 1), by="u", on="t", n_buckets=4)
            .to_pandas().sort_values("lid").reset_index(drop=True)
        )
        b = (
            asof_join(_ds(left, 7), _ds(right, 5), by="u", on="t", n_buckets=16)
            .to_pandas().sort_values("lid").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)

    def test_rejects_clashing_payload_names(self, ray_session):
        left = pd.DataFrame({"u": [1], "t": [1.0], "x": [1]})
        right = pd.DataFrame({"u": [1], "t": [1.0], "x": [2]})
        with pytest.raises(ValueError, match="disjoint"):
            asof_join(_ds(left, 1), _ds(right, 1), by="u", on="t")

    def test_rejects_missing_key(self, ray_session):
        left = pd.DataFrame({"u": [1], "t": [1.0]})
        right = pd.DataFrame({"u": [1], "s": [1.0]})
        with pytest.raises(ValueError, match="missing required column"):
            asof_join(_ds(left, 1), _ds(right, 1), by="u", on="t")


class TestSemiJoinValidation:
    def test_missing_column_fails_fast(self, ray_session):
        left = pd.DataFrame({"other": [1]})
        keys = pd.DataFrame({"k": [1]})
        with pytest.raises(ValueError, match="missing column 'k'"):
            broadcast_semi_join(_ds(left, 1), _ds(keys, 1), "k")


class TestBucketedLeftAttach:
    """agg_util.bucketed_left_attach — the keyed left join that, unlike
    Dataset.join, tolerates the schema-less empty blocks bucketed
    aggregations emit for empty buckets."""

    def _run(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from gridfia_ray.stages.agg_util import bucketed_agg, bucketed_left_attach

        left = rd.from_pandas(
            pd.DataFrame(
                {"key": ["a", "b", "c", "a"], "x": np.arange(4, dtype=np.int64)}
            )
        ).repartition(3)
        raw = rd.from_pandas(
            pd.DataFrame({"key": ["a", "a", "b"], "v": np.array([1, 2, 5], np.int64)})
        )
        # right side from a bucketed agg with FAR more buckets than keys
        # -> guaranteed schema-less empty blocks (the Dataset.join killer)
        right = bucketed_agg(raw, ["key"], {"v": ("v", "sum")}, n_buckets=32)
        lsch = pa.schema([("key", pa.string()), ("x", pa.int64())])
        rsch = pa.schema([("key", pa.string()), ("v", pa.int64())])
        return bucketed_left_attach(left, right, ["key"], lsch, rsch).to_pandas()

    def test_left_rows_kept_and_values_attached(self, ray_session):
        out = self._run(ray_session).sort_values("x", ignore_index=True)
        assert len(out) == 4  # every left row survives
        got = dict(zip(out["x"], out["v"]))
        assert got[0] == 3 and got[3] == 3  # key a -> 1+2
        assert got[1] == 5  # key b
        assert pd.isna(got[2])  # key c unmatched -> null

    def test_duplicate_right_keys_raise(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from gridfia_ray.stages.agg_util import bucketed_left_attach

        left = rd.from_pandas(pd.DataFrame({"key": ["a"], "x": np.array([0], np.int64)}))
        right = rd.from_pandas(
            pd.DataFrame({"key": ["a", "a"], "v": np.array([1, 2], np.int64)})
        )
        lsch = pa.schema([("key", pa.string()), ("x", pa.int64())])
        rsch = pa.schema([("key", pa.string()), ("v", pa.int64())])
        with pytest.raises(Exception, match="duplicate"):
            bucketed_left_attach(left, right, ["key"], lsch, rsch).to_pandas()

    def test_column_collision_raises(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from gridfia_ray.stages.agg_util import bucketed_left_attach

        ds = rd.from_pandas(pd.DataFrame({"key": ["a"], "x": np.array([0], np.int64)}))
        sch = pa.schema([("key", pa.string()), ("x", pa.int64())])
        with pytest.raises(ValueError, match="collision"):
            bucketed_left_attach(ds, ds, ["key"], sch, sch)


class TestOuterJoinPassthrough:
    """shuffle_hash_join's join_type passthrough to Ray's native hash
    shuffle: outer variants emit null-filled non-matching rows."""

    def _sides(self):
        import ray.data as rd

        l = pd.DataFrame({"k": np.int64([1, 2, 3]), "a": np.int64([10, 20, 30])})
        r = pd.DataFrame({"k": np.int64([2, 3, 4]), "b": np.int64([200, 300, 400])})
        return rd.from_pandas(l), rd.from_pandas(r)

    def _run(self, join_type):
        from gridfia_ray.pipelines.joins import shuffle_hash_join

        l, r = self._sides()
        out = shuffle_hash_join(l, r, on=["k"], join_type=join_type).to_pandas()
        return out.sort_values("k").reset_index(drop=True)

    def test_full_outer(self, ray_session):
        out = self._run("full_outer")
        assert out["k"].tolist() == [1, 2, 3, 4]
        assert pd.isna(out["b"].iloc[0]) and pd.isna(out["a"].iloc[3])
        assert out["a"].iloc[1] == 20 and out["b"].iloc[1] == 200

    def test_left_outer(self, ray_session):
        out = self._run("left_outer")
        assert out["k"].tolist() == [1, 2, 3]
        assert pd.isna(out["b"].iloc[0]) and out["b"].iloc[2] == 300

    def test_right_outer(self, ray_session):
        out = self._run("right_outer")
        assert out["k"].tolist() == [2, 3, 4]
        assert pd.isna(out["a"].iloc[2]) and out["a"].iloc[0] == 20
