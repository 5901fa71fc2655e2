"""ROLLUP aggregate + JSON field extraction."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from gridfia_ray.pipelines.events import extract_json_int
from gridfia_ray.stages.agg_util import cube_agg, grouping_sets_agg, rollup_agg


class TestRollupAgg:
    def _frame(self, seed=0, n=2000):
        rng = np.random.RandomState(seed)
        return pd.DataFrame(
            {
                "a": rng.choice(["x", "y", "z"], n),
                "b": rng.choice(["p", "q"], n),
                "v": rng.randint(0, 100, n).astype(np.int64),
            }
        )

    def _run(self, df, parts=6, buckets=8):
        return (
            rollup_agg(
                rd.from_pandas(df).repartition(parts),
                ["a", "b"],
                local_map={"n": ("v", "size"), "s": ("v", "sum")},
                merge_map={"n": ("n", "sum"), "s": ("s", "sum")},
                n_buckets=buckets,
            )
            .to_pandas()
            .sort_values(["a", "b"])
            .reset_index(drop=True)
        )

    def _oracle(self, df):
        rows = []
        for kept in (["a", "b"], ["a"], []):
            if kept:
                g = df.groupby(kept)["v"].agg(n="size", s="sum").reset_index()
            else:
                g = pd.DataFrame({"n": [len(df)], "s": [df["v"].sum()]})
            for k in ("a", "b"):
                g[k] = g[k].astype(str) if k in kept else "<ALL>"
            rows.append(g[["a", "b", "n", "s"]])
        return (
            pd.concat(rows, ignore_index=True)
            .sort_values(["a", "b"])
            .reset_index(drop=True)
        )

    def test_matches_pandas_rollup(self, ray_session):
        df = self._frame()
        got = self._run(df)
        got["n"] = got["n"].astype(np.int64)
        got["s"] = got["s"].astype(np.int64)
        pd.testing.assert_frame_equal(got, self._oracle(df))
        # 3 grouping sets present: (a,b), (a), ()
        assert (got["a"] == "<ALL>").sum() == 1
        assert ((got["a"] != "<ALL>") & (got["b"] == "<ALL>")).sum() == 3

    def test_partition_invariant(self, ray_session):
        df = self._frame(seed=1)
        a = self._run(df, parts=2, buckets=4)
        b = self._run(df, parts=13, buckets=16)
        pd.testing.assert_frame_equal(a, b)

    def test_token_clash_rejected(self, ray_session):
        df = pd.DataFrame({"a": ["<ALL>"], "b": ["p"], "v": np.int64([1])})
        with pytest.raises(Exception, match="rollup token"):
            rollup_agg(
                rd.from_pandas(df), ["a", "b"],
                local_map={"n": ("v", "size")}, merge_map={"n": ("n", "sum")},
            ).to_pandas()

    def test_needs_keys(self, ray_session):
        with pytest.raises(ValueError, match="at least one key"):
            rollup_agg(rd.from_pandas(pd.DataFrame({"v": [1]})), [],
                       local_map={}, merge_map={})


class TestCubeAndGroupingSets:
    _frame = TestRollupAgg._frame

    def _pandas_sets(self, df, sets):
        rows = []
        for kept in sets:
            if kept:
                g = df.groupby(kept)["v"].agg(n="size", s="sum").reset_index()
            else:
                g = pd.DataFrame({"n": [len(df)], "s": [df["v"].sum()]})
            for k in ("a", "b"):
                g[k] = g[k].astype(str) if k in kept else "<ALL>"
            rows.append(g[["a", "b", "n", "s"]])
        return (
            pd.concat(rows, ignore_index=True)
            .sort_values(["a", "b"])
            .reset_index(drop=True)
        )

    def test_cube_matches_pandas_all_subsets(self, ray_session):
        df = self._frame(seed=3)
        got = (
            cube_agg(
                rd.from_pandas(df).repartition(5),
                ["a", "b"],
                local_map={"n": ("v", "size"), "s": ("v", "sum")},
                merge_map={"n": ("n", "sum"), "s": ("s", "sum")},
                n_buckets=8,
            )
            .to_pandas()
            .sort_values(["a", "b"])
            .reset_index(drop=True)
            .astype({"n": np.int64, "s": np.int64})
        )
        want = self._pandas_sets(df, [["a", "b"], ["a"], ["b"], []])
        pd.testing.assert_frame_equal(got, want)
        # the margin rollup lacks: b-only rows
        assert ((got["a"] == "<ALL>") & (got["b"] != "<ALL>")).sum() == 2

    def test_grouping_sets_explicit(self, ray_session):
        df = self._frame(seed=4)
        got = (
            grouping_sets_agg(
                rd.from_pandas(df).repartition(3),
                ["a", "b"],
                [["b"], []],
                local_map={"n": ("v", "size"), "s": ("v", "sum")},
                merge_map={"n": ("n", "sum"), "s": ("s", "sum")},
            )
            .to_pandas()
            .sort_values(["a", "b"])
            .reset_index(drop=True)
            .astype({"n": np.int64, "s": np.int64})
        )
        pd.testing.assert_frame_equal(got, self._pandas_sets(df, [["b"], []]))

    def test_duplicate_set_rejected(self, ray_session):
        df = pd.DataFrame({"a": ["x"], "b": ["p"], "v": np.int64([1])})
        with pytest.raises(ValueError, match="duplicate grouping set"):
            grouping_sets_agg(
                rd.from_pandas(df), ["a", "b"], [["a"], ["a"]],
                local_map={"n": ("v", "size")}, merge_map={"n": ("n", "sum")},
            )

    def test_unknown_key_rejected(self, ray_session):
        df = pd.DataFrame({"a": ["x"], "v": np.int64([1])})
        with pytest.raises(ValueError, match="unknown keys"):
            grouping_sets_agg(
                rd.from_pandas(df), ["a"], [["zz"]],
                local_map={"n": ("v", "size")}, merge_map={"n": ("n", "sum")},
            )


class TestExtractJsonInt:
    def test_extracts_and_handles_missing(self, ray_session):
        df = pd.DataFrame(
            {
                "props": ['{"k": 7}', '{"k":  -3, "j": 1}', '{"j": 5}',
                          "not json", None, '{"k": "str"}'],
                "id": np.arange(6, dtype=np.int64),
            }
        )
        got = (
            extract_json_int(rd.from_pandas(df), "props", "k")
            .to_pandas().sort_values("id").reset_index(drop=True)
        )
        vals = got["k"].tolist()
        assert vals[0] == 7 and vals[1] == -3
        assert all(pd.isna(v) for v in vals[2:])


class TestEdgeFixes:
    def test_rollup_null_keys_rejected(self, ray_session):
        df = pd.DataFrame({"a": ["x", None], "b": ["p", "q"], "v": np.int64([1, 2])})
        with pytest.raises(Exception, match="NULL values in key columns"):
            rollup_agg(
                rd.from_pandas(df), ["a", "b"],
                local_map={"n": ("v", "size")}, merge_map={"n": ("n", "sum")},
            ).to_pandas()

    def test_extract_rejects_floats_and_exponents(self, ray_session):
        df = pd.DataFrame(
            {"props": ['{"k": 12.5}', '{"k": 1e3}', '{"k": 12}'],
             "id": np.arange(3, dtype=np.int64)}
        )
        got = (
            extract_json_int(rd.from_pandas(df), "props", "k")
            .to_pandas().sort_values("id").reset_index(drop=True)
        )
        assert pd.isna(got["k"].iloc[0]) and pd.isna(got["k"].iloc[1])
        assert got["k"].iloc[2] == 12


class TestPivotAgg:
    def _run(self, df, values, parts=4, **kw):
        from gridfia_ray.stages.agg_util import pivot_agg

        return (
            pivot_agg(
                rd.from_pandas(df).repartition(parts),
                ["k"], "p", values, ("v", "sum"), n_buckets=4, **kw
            )
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )

    def _frame(self, seed=0, n=500):
        rng = np.random.RandomState(seed)
        return pd.DataFrame(
            {
                "k": rng.choice(["a", "b", "c"], n),
                "p": rng.choice(["x", "y", "z"], n),
                "v": rng.randint(0, 50, n).astype(np.int64),
            }
        )

    def test_matches_pandas_pivot_table(self, ray_session):
        df = self._frame()
        got = self._run(df, ["x", "y", "z"])
        want = (
            df.pivot_table(index="k", columns="p", values="v", aggfunc="sum", fill_value=0)
            .reset_index()
        )
        for c in ("x", "y", "z"):
            assert got[f"p_{c}"].astype(np.int64).tolist() == want[c].tolist()

    def test_unlisted_values_ignored_or_strict(self, ray_session):
        from gridfia_ray.stages.agg_util import pivot_agg

        df = self._frame(seed=1)
        got = self._run(df, ["x", "y"])  # z rows ignored
        sub = df[df["p"].isin(["x", "y"])]
        want = sub.groupby("k")["v"].sum()
        assert (
            got.set_index("k")[["p_x", "p_y"]].sum(axis=1).astype(np.int64).to_dict()
            == want.to_dict()
        )
        with pytest.raises(Exception, match="unlisted"):
            self._run(df, ["x", "y"], strict=True)

    def test_validation(self, ray_session):
        from gridfia_ray.stages.agg_util import pivot_agg

        df = self._frame(seed=2)
        with pytest.raises(ValueError, match="duplicates"):
            self._run(df, ["x", "x"])
        with pytest.raises(ValueError, match="agg must be"):
            pivot_agg(rd.from_pandas(df), ["k"], "p", ["x"], ("v", "mean"))
