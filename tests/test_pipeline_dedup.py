"""Tile dedup: exact-by-key and exhaustive phash near-dup banding."""

import os

import numpy as np
import pytest

from gridfia_ray.codecs.phash import hamming64
from gridfia_ray.pipelines import dedup_tiles as D


@pytest.fixture(scope="module")
def dup_ds(ray_session, t1_dir):
    import ray.data as rd

    return rd.read_parquet(os.path.join(t1_dir, "tiles_dup.parquet"))


@pytest.fixture(scope="module")
def dup_df(t1_dir):
    import pyarrow.parquet as pq

    return pq.read_table(os.path.join(t1_dir, "tiles_dup.parquet")).to_pandas()


class TestExactDedup:
    def test_one_survivor_per_key(self, dup_ds, dup_df):
        out = D.exact_dedup(dup_ds).to_pandas()
        assert len(out) == dup_df["image_id"].nunique()
        assert out["image_id"].is_unique
        assert set(out["image_id"]) == set(dup_df["image_id"])


class TestExactDedupForks:
    def test_full_shuffle_fork_equals_broadcast_fork(self, dup_ds, dup_df):
        """max_broadcast_keys=0 forces the full-payload-shuffle fork; it
        must keep exactly the same deterministic winners as the
        broadcast (clean-majority) fork."""
        bro = D.exact_dedup(dup_ds).to_pandas()
        shuf = D.exact_dedup(dup_ds, max_broadcast_keys=0).to_pandas()
        cols = ["image_id", "phash", "fmt"]
        import pandas as pd

        pd.testing.assert_frame_equal(
            bro[cols].sort_values("image_id").reset_index(drop=True),
            shuf[cols].sort_values("image_id").reset_index(drop=True),
        )

    def test_driver_table_is_duplicates_only(self, ray_session, dup_ds, dup_df):
        """The only table exact_dedup may collect is the duplicates-only
        key set — NOT the full distinct-key table (VERDICT r2 #1)."""
        keys = dup_ds.select_columns(["image_id"])
        got = D.dup_key_table(keys, "image_id").to_pandas()
        vc = dup_df["image_id"].value_counts()
        expect = vc[vc > 1]
        assert len(got) == len(expect)
        assert len(got) < dup_df["image_id"].nunique()  # strictly smaller
        assert set(got["image_id"]) == set(expect.index)
        assert dict(zip(got["image_id"], got["n"])) == expect.to_dict()


class TestNearDup:
    def test_pairs_match_bruteforce(self, dup_ds, dup_df):
        got = D.near_dup_pairs(dup_ds, max_hamming=6).to_pandas()
        t = dup_df.drop_duplicates("image_id")
        ph = t["phash"].to_numpy()
        ids = t["image_id"].to_numpy()
        ii, jj = np.triu_indices(len(ids), k=1)
        hm = hamming64(ph[ii], ph[jj])
        keep = hm <= 6
        expect = set(
            zip(np.minimum(ids[ii[keep]], ids[jj[keep]]), np.maximum(ids[ii[keep]], ids[jj[keep]]))
        )
        got_set = set(zip(np.minimum(got.a, got.b), np.maximum(got.a, got.b)))
        assert got_set == expect
        # injected near-dups are found
        assert any(b.endswith("#near") for _, b in got_set)

    def test_banding_guarantee_enforced(self, dup_ds):
        with pytest.raises(ValueError):
            D.near_dup_pairs(dup_ds, max_hamming=9, n_bands=8)


class TestAttachPairAttrs:
    def test_distributed_fallback_equals_broadcast(self, ray_session):
        """The >max_broadcast_ids fallback (bucketed exploded join) must
        produce exactly the broadcast path's result — regression for the
        merge-suffix KeyError that only the fallback leg hit."""
        import pandas as pd
        import ray.data as rd

        from gridfia_ray.stages.dedup_util import attach_pair_attrs

        pairs_df = pd.DataFrame({"a": [1, 2, 3, 1], "b": [4, 5, 6, 6]})
        attrs_df = pd.DataFrame(
            {"id": list(range(1, 8)), "sig": [bytes([i]) * 4 for i in range(1, 8)]}
        )
        pairs = rd.from_pandas(pairs_df).repartition(2)
        attrs = rd.from_pandas(attrs_df).repartition(3)

        def norm(df):
            return (
                df.sort_values(["a", "b"]).reset_index(drop=True)[
                    ["a", "b", "sig_a", "sig_b"]
                ]
            )

        bro = norm(attach_pair_attrs(pairs, attrs, "id", ["sig"]).to_pandas())
        dist = norm(
            attach_pair_attrs(
                pairs, attrs, "id", ["sig"], max_broadcast_ids=0
            ).to_pandas()
        )
        assert bro["sig_a"].tolist() == [bytes([a]) * 4 for a in bro["a"]]
        pd.testing.assert_frame_equal(dist.astype({"a": "int64", "b": "int64"}),
                                      bro.astype({"a": "int64", "b": "int64"}))

    def test_byte_bound_routes_wide_attrs_to_distributed(self, ray_session):
        """1 KB signatures with few ids: the id-count bound alone would
        broadcast, but the BYTE bound must route to the distributed join
        (VERDICT r3 #1) — and the result must still be exact."""
        import pandas as pd
        import ray.data as rd

        from gridfia_ray.stages.dedup_util import attach_pair_attrs

        pairs_df = pd.DataFrame({"a": [1, 2], "b": [3, 4]})
        attrs_df = pd.DataFrame(
            {"id": [1, 2, 3, 4], "sig": [bytes([i]) * 1024 for i in [1, 2, 3, 4]]}
        )
        pairs = rd.from_pandas(pairs_df).repartition(2)
        attrs = rd.from_pandas(attrs_df).repartition(2)
        out = (
            attach_pair_attrs(
                pairs, attrs, "id", ["sig"],
                max_broadcast_ids=1_000_000, max_broadcast_bytes=512,
            )
            .to_pandas()
            .sort_values(["a", "b"])
            .reset_index(drop=True)
        )
        assert out["sig_a"].tolist() == [bytes([1]) * 1024, bytes([2]) * 1024]
        assert out["sig_b"].tolist() == [bytes([3]) * 1024, bytes([4]) * 1024]
