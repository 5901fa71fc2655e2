"""Keyed set operations: DISTINCT intersect/except/union vs pandas,
composite keys, duplicate collapse, partition invariance, validation."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from gridfia_ray.pipelines.setops import keyed_set_op


def _ds(df, parts=3):
    return rd.from_pandas(df).repartition(parts)


def _run(l, r, on, op, parts=3):
    out = keyed_set_op(_ds(l, parts), _ds(r, parts), on, op, n_buckets=4).to_pandas()
    if len(out) == 0:  # Ray to_pandas drops columns on zero-row results
        return set()
    return set(map(tuple, out[on].astype(np.int64).itertuples(index=False)))


class TestKeyedSetOp:
    def _frames(self):
        # duplicates on both sides: set semantics must collapse them
        l = pd.DataFrame({"k": np.int64([1, 1, 2, 3, 5, 5])})
        r = pd.DataFrame({"k": np.int64([2, 2, 3, 4])})
        return l, r

    def test_ops_match_python_sets(self, ray_session):
        l, r = self._frames()
        ls, rs = set(l["k"]), set(r["k"])
        assert _run(l, r, ["k"], "intersect") == {(k,) for k in ls & rs}
        assert _run(l, r, ["k"], "except") == {(k,) for k in ls - rs}
        assert _run(l, r, ["k"], "union") == {(k,) for k in ls | rs}

    def test_composite_key(self, ray_session):
        l = pd.DataFrame({"a": np.int64([1, 1, 2]), "b": np.int64([10, 20, 10])})
        r = pd.DataFrame({"a": np.int64([1, 2]), "b": np.int64([20, 99])})
        assert _run(l, r, ["a", "b"], "intersect") == {(1, 20)}
        assert _run(l, r, ["a", "b"], "except") == {(1, 10), (2, 10)}

    def test_empty_side(self, ray_session):
        l = pd.DataFrame({"k": np.int64([1, 2])})
        e = pd.DataFrame({"k": pd.Series(dtype=np.int64)})
        assert _run(l, e, ["k"], "except") == {(1,), (2,)}
        assert _run(l, e, ["k"], "intersect") == set()
        assert _run(e, l, ["k"], "except") == set()

    def test_partition_invariant(self, ray_session):
        rng = np.random.RandomState(0)
        l = pd.DataFrame({"k": rng.randint(0, 40, 200).astype(np.int64)})
        r = pd.DataFrame({"k": rng.randint(20, 60, 200).astype(np.int64)})
        a = _run(l, r, ["k"], "intersect", parts=1)
        b = _run(l, r, ["k"], "intersect", parts=9)
        assert a == b == {(k,) for k in set(l["k"]) & set(r["k"])}

    def test_bad_op_rejected(self, ray_session):
        l = pd.DataFrame({"k": np.int64([1])})
        with pytest.raises(ValueError, match="op must be"):
            keyed_set_op(_ds(l, 1), _ds(l, 1), ["k"], "minus")
