"""k-center greedy diversity selection: brute-force equality, partition
invariance, coverage-radius monotonicity, cosine path, assignment."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from gridfia_ray.ann import diversity as DV


def _emb(n=400, d=16, seed=9):
    rng = np.random.RandomState(seed)
    centers = rng.uniform(-3, 3, (5, d))
    asg = rng.randint(0, 5, n)
    vecs = (centers[asg] + rng.normal(0, 0.5, (n, d))).astype(np.float32)
    return np.arange(n, dtype=np.int64), vecs


def _ds(ids, vecs):
    return rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(ids),
                "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
            }
        )
    )


def brute_kcenter(ids, vecs, m, metric="euclidean"):
    mat = DV._prep(np.asarray(vecs, np.float64), metric)
    seed_i = int(np.argmin(ids))
    picks = [(0, int(ids[seed_i]), float("nan"))]
    mind = DV._dist2(mat, mat[seed_i], metric)
    for r in range(1, min(m, len(ids))):
        top = mind.max()
        if top == 0.0:
            break  # duplicates only: selection complete (pipeline rule)
        cand = np.nonzero(mind == top)[0]
        i = int(cand[np.argmin(ids[cand])])
        picks.append((r, int(ids[i]), float(mind[i])))
        mind = np.minimum(mind, DV._dist2(mat, mat[i], metric))
    return picks


class TestKCenter:
    @pytest.mark.parametrize("metric", ["euclidean", "cosine"])
    def test_matches_brute_force_bitexact(self, ray_session, metric):
        ids, vecs = _emb()
        got = DV.kcenter_select(_ds(ids, vecs), 12, metric=metric)
        exp = brute_kcenter(ids, vecs, 12, metric)
        assert list(got["vec_id"]) == [p[1] for p in exp]
        # radius² bit-exact (seed row NaN on both sides)
        for g, e in zip(got["radius2"].tolist()[1:], [p[2] for p in exp][1:]):
            assert g == e

    def test_partition_invariance(self, ray_session):
        ids, vecs = _emb(seed=31)
        a = DV.kcenter_select(_ds(ids, vecs), 10)
        b = DV.kcenter_select(_ds(ids, vecs).repartition(17), 10)
        assert a.equals(b)

    def test_radius_sequence_non_increasing(self, ray_session):
        ids, vecs = _emb(seed=2)
        got = DV.kcenter_select(_ds(ids, vecs), 15)
        r = got["radius2"].to_numpy()[1:]
        assert (np.diff(r) <= 1e-12).all()

    def test_m_clamped_and_distinct(self, ray_session):
        ids, vecs = _emb(n=6)
        got = DV.kcenter_select(_ds(ids, vecs), 50)
        assert len(got) == 6
        assert got["vec_id"].nunique() == 6

    def test_duplicate_corpus_stops_at_distinct_count(self, ray_session):
        base = np.array([[0.0, 0.0], [3.0, 0.0], [0.0, 4.0]], np.float32)
        vecs = np.vstack([base, base, base])  # 9 rows, 3 distinct
        ids = np.arange(9, dtype=np.int64)
        got = DV.kcenter_select(_ds(ids, vecs), 7)
        assert len(got) == 3
        assert got["vec_id"].nunique() == 3

    def test_validation(self, ray_session):
        ids, vecs = _emb(n=5)
        with pytest.raises(ValueError, match="metric"):
            DV.kcenter_select(_ds(ids, vecs), 2, metric="manhattan")
        with pytest.raises(ValueError, match="m must"):
            DV.kcenter_select(_ds(ids, vecs), 0)

    def test_assign_nearest_and_2approx(self, ray_session):
        ids, vecs = _emb(seed=7)
        sel = DV.kcenter_select(_ds(ids, vecs), 8)
        asg = DV.kcenter_assign(_ds(ids, vecs), sel).to_pandas()
        assert len(asg) == len(ids)
        mat = np.asarray(vecs, np.float64)
        cvecs = mat[sel["vec_id"].to_numpy()]
        # every point's assigned distance == its true nearest-center dist
        d2 = ((mat[:, None, :] - cvecs[None, :, :]) ** 2).sum(axis=2)
        asg = asg.sort_values("vec_id").reset_index(drop=True)
        assert np.allclose(asg["d2"].to_numpy(), d2.min(axis=1), atol=1e-9)
        # selected points assign to themselves at distance 0
        own = asg[asg["vec_id"].isin(sel["vec_id"])]
        assert np.allclose(own["d2"], 0.0)
        # Gonzalez guarantee: max coverage radius ≤ next pick's radius
        nxt = brute_kcenter(ids, vecs, 9)[-1][2]
        assert asg["d2"].max() == pytest.approx(nxt, abs=1e-9)

    def test_pin_contract(self, ray_session):
        import duckdb

        from gridfia_ray.contract import build_oracle_sql, build_queries

        got = build_queries()["emb_kcenter"]("unused")
        exp = duckdb.sql(build_oracle_sql()["emb_kcenter"]).df()
        assert (got["vec_id"].to_numpy() == exp["vec_id"].to_numpy()).all()
        assert (got["radius2_u"].to_numpy() == exp["radius2_u"].to_numpy()).all()


class TestKCenterMemory:
    def test_store_peak_independent_of_m(self, ray_session):
        # r4 VERDICT #5: the old loop materialized a full corpus+state
        # copy per round (peak grew with m). The sharded-actor loop's
        # object-store peak is the one-time init pass; a 6x-longer
        # selection must not move it by more than a small constant.
        import threading

        import ray

        ids, vecs = _emb(n=3000, d=32)
        ds = _ds(ids, vecs)

        def peak_during(m):
            stop = threading.Event()
            peak = [0.0]

            def sample():
                total = ray.cluster_resources().get("object_store_memory", 0.0)
                while not stop.is_set():
                    avail = ray.available_resources().get(
                        "object_store_memory", total
                    )
                    peak[0] = max(peak[0], total - avail)
                    stop.wait(0.01)

            t = threading.Thread(target=sample)
            t.start()
            try:
                out = DV.kcenter_select(ds, m)
            finally:
                stop.set()
                t.join()
            assert len(out) == m
            return peak[0]

        p4 = peak_during(4)
        p24 = peak_during(24)
        corpus_bytes = vecs.size * 8  # float64-prepped corpus
        assert p24 <= p4 + 2 * corpus_bytes + (8 << 20), (p4, p24)
