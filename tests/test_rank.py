"""Global NTILE: exact match vs DuckDB NTILE (ORDER BY v, id) across
tie patterns, uneven divisions, n < k, k = 1; ambiguity + bound raises;
partition invariance."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from gridfia_ray.pipelines.rank import _ntile_boundary_ranks, ntile_exact


def _oracle(df, k):
    con = duckdb.connect()
    con.register("t", df)
    return (
        con.execute(
            f"SELECT id, NTILE({k}) OVER (ORDER BY v, id) AS tile FROM t"
        )
        .df()
        .astype({"id": np.int64, "tile": np.int64})
        .sort_values("id")
        .reset_index(drop=True)
    )


def _run(df, k, parts=4, **kw):
    out = (
        ntile_exact(rd.from_pandas(df).repartition(parts), "v", "id", k, **kw)
        .to_pandas()
        .astype({"id": np.int64, "tile": np.int64})
        .sort_values("id")
        .reset_index(drop=True)
    )
    return out[["id", "tile"]]


class TestBoundaryRanks:
    def test_sql_sizing(self):
        # n=10, k=4 -> sizes 3,3,2,2 -> last ranks 3,6,8
        assert _ntile_boundary_ranks(10, 4).tolist() == [3, 6, 8]
        assert _ntile_boundary_ranks(8, 4).tolist() == [2, 4, 6]
        assert _ntile_boundary_ranks(3, 5).tolist() == [1, 2, 3, 3]


class TestNtileExact:
    def test_unique_values_uneven_k(self, ray_session):
        rng = np.random.RandomState(0)
        df = pd.DataFrame(
            {"id": np.arange(100, dtype=np.int64), "v": rng.permutation(100).astype(np.float64)}
        )
        for k in (1, 3, 7):
            pd.testing.assert_frame_equal(_run(df, k), _oracle(df, k))

    def test_heavy_ties_across_boundaries(self, ray_session):
        # one value holds 60% of rows: several tile boundaries land
        # inside ONE tied run; order within the run is by id
        rng = np.random.RandomState(1)
        v = np.where(rng.rand(200) < 0.6, 5.0, rng.randint(0, 10, 200).astype(np.float64))
        df = pd.DataFrame({"id": rng.permutation(200).astype(np.int64), "v": v})
        for k in (4, 9):
            pd.testing.assert_frame_equal(_run(df, k), _oracle(df, k))

    def test_n_smaller_than_k(self, ray_session):
        df = pd.DataFrame({"id": np.int64([7, 3, 5]), "v": [2.0, 2.0, 1.0]})
        pd.testing.assert_frame_equal(_run(df, 8, parts=2), _oracle(df, 8))

    def test_partition_invariant(self, ray_session):
        rng = np.random.RandomState(2)
        df = pd.DataFrame(
            {"id": np.arange(150, dtype=np.int64), "v": rng.randint(0, 12, 150).astype(np.float64)}
        )
        pd.testing.assert_frame_equal(_run(df, 5, parts=1), _run(df, 5, parts=11))

    def test_duplicate_tie_ids_raise(self, ray_session):
        df = pd.DataFrame({"id": np.int64([1, 1, 2, 3]), "v": [4.0, 4.0, 4.0, 9.0]})
        with pytest.raises(Exception, match="ambiguous"):
            _run(df, 2)

    def test_tied_bound_raises(self, ray_session):
        df = pd.DataFrame({"id": np.arange(50, dtype=np.int64), "v": np.full(50, 1.0)})
        with pytest.raises(Exception, match="max_tied"):
            _run(df, 3, max_tied=10)

    def test_k_validated(self, ray_session):
        df = pd.DataFrame({"id": np.int64([1]), "v": [1.0]})
        with pytest.raises(ValueError, match="k must be"):
            ntile_exact(rd.from_pandas(df), "v", "id", 0)

    def test_empty_input(self, ray_session):
        df = pd.DataFrame({"id": pd.Series(dtype=np.int64), "v": pd.Series(dtype=np.float64)})
        out = ntile_exact(rd.from_pandas(df), "v", "id", 4).to_pandas()
        assert len(out) == 0
