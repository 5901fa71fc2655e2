"""Similarity search: exact top-k vs numpy, LSH recall, near-dup pairs."""

import numpy as np
import pandas as pd
import pytest

from gridfia_ray.ann.search import (
    embedding_near_dup_pairs,
    lsh_topk_cosine,
    topk_cosine,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb_df():
    import pyarrow.parquet as pq

    return pq.read_table(f"{SF}/embeddings.parquet").to_pandas()


@pytest.fixture(scope="module")
def emb_ds(ray_session):
    import ray.data as rd

    return rd.read_parquet(f"{SF}/embeddings.parquet")


def numpy_topk(emb_df, qids, k):
    M = np.stack(emb_df.sort_values("vec_id")["embedding"].to_numpy()).astype(np.float64)
    ids = emb_df.sort_values("vec_id")["vec_id"].to_numpy()
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    out = {}
    for q in qids:
        sims = Mn @ Mn[list(ids).index(q)]
        order = np.lexsort((ids, -sims))[:k]
        out[q] = ids[order].tolist()
    return out


class TestBrute:
    def test_matches_numpy(self, emb_ds, emb_df):
        qids = [0, 1, 2]
        queries = np.stack(emb_df.set_index("vec_id").loc[qids, "embedding"].to_numpy())
        got = topk_cosine(emb_ds, queries, qids, k=10).to_pandas()
        expect = numpy_topk(emb_df, qids, 10)
        for q in qids:
            g = got[got.query_id == q].sort_values("rank")["vec_id"].tolist()
            assert g == expect[q]

    def test_small_batches_still_global(self, emb_df, ray_session):
        """Per-batch combiner must not lose global winners."""
        import ray.data as rd

        ds = rd.from_pandas(emb_df).repartition(13)
        qids = [5]
        queries = np.stack([emb_df.set_index("vec_id").loc[5, "embedding"]])
        got = topk_cosine(ds, queries, qids, k=7).to_pandas()
        assert got.sort_values("rank")["vec_id"].tolist() == numpy_topk(emb_df, qids, 7)[5]


class TestLsh:
    def test_high_recall_at_small_scale(self, emb_ds, emb_df):
        qids = [0, 1, 2]
        queries = np.stack(emb_df.set_index("vec_id").loc[qids, "embedding"].to_numpy())
        got = lsh_topk_cosine(emb_ds, queries, qids, k=10, hamming_radius=32).to_pandas()
        expect = numpy_topk(emb_df, qids, 10)
        recall = np.mean(
            [
                len(set(got[got.query_id == q]["vec_id"]) & set(expect[q])) / 10
                for q in qids
            ]
        )
        assert recall >= 0.8  # approximate path: high but not guaranteed recall


class TestNearDup:
    def test_finds_planted_duplicates(self, emb_df, ray_session):
        import ray.data as rd

        df = emb_df.copy()
        planted = []
        rng = np.random.RandomState(0)
        for i, src in enumerate([0, 7, 21]):
            v = np.asarray(df.loc[df.vec_id == src, "embedding"].iloc[0], dtype=np.float32)
            noisy = v + rng.normal(scale=1e-3, size=v.shape).astype(np.float32)
            new_id = 10_000 + i
            planted.append((src, new_id))
            df = pd.concat(
                [df, pd.DataFrame({"vec_id": [new_id], "embedding": [noisy], "label": [0]})],
                ignore_index=True,
            )
        pairs = embedding_near_dup_pairs(rd.from_pandas(df), threshold=0.999).to_pandas()
        found = set(zip(pairs.a, pairs.b))
        for src, dup in planted:
            assert (min(src, dup), max(src, dup)) in found

    def test_low_threshold_recall(self, emb_df, ray_session):
        """The Hamming prefilter must widen with the threshold: pairs
        planted at cosine ≈ 0.75 survive a threshold=0.7 run —
        regression for the fixed radius that dropped them."""
        import ray.data as rd

        df = emb_df.copy()
        rng = np.random.RandomState(1)
        planted = []
        for i, src in enumerate([3, 11, 30, 42]):
            v = np.asarray(df.loc[df.vec_id == src, "embedding"].iloc[0], np.float64)
            v = v / np.linalg.norm(v)
            # mix with orthogonalized noise to a target cosine ~0.75
            n = rng.normal(size=v.shape)
            n -= (n @ v) * v
            n /= np.linalg.norm(n)
            target = 0.75
            noisy = (target * v + np.sqrt(1 - target**2) * n).astype(np.float32)
            new_id = 20_000 + i
            planted.append((src, new_id))
            df = pd.concat(
                [df, pd.DataFrame({"vec_id": [new_id], "embedding": [noisy], "label": [0]})],
                ignore_index=True,
            )
        pairs = embedding_near_dup_pairs(rd.from_pandas(df), threshold=0.7).to_pandas()
        found = set(zip(pairs.a, pairs.b))
        hits = sum((min(s, d), max(s, d)) in found for s, d in planted)
        assert hits >= 3  # SRP banding is probabilistic; prefilter must not be the cap


class TestProductQuantization:
    @staticmethod
    def _clustered_ds(n=8000, dim=32, n_clusters=16, seed=9):
        import ray.data as rd

        rng = np.random.RandomState(seed)
        centers = rng.standard_normal((n_clusters, dim)) * 3
        X = centers[rng.randint(0, n_clusters, n)] + rng.standard_normal((n, dim))
        df = pd.DataFrame(
            {"vec_id": np.arange(n, dtype=np.int64), "embedding": list(X)}
        )
        return rd.from_pandas(df), X

    def test_adc_picks_true_neighbors(self, ray_session):
        """Raw ADC reorders near-ties (that's the sketch's nature — see
        TestPqRefined for identity recall after the exact re-rank), but
        every pick must still be a genuinely near neighbor: all of
        ADC's top-10 must land inside the exact top-500 of an 8000-row
        corpus, and same-cluster at that."""
        from gridfia_ray.ann.pq import pq_encode, pq_topk_cosine, train_pq
        from gridfia_ray.ann.search import topk_cosine

        # classic PQ geometry: 64-d, m=8 -> 8-d subspaces
        ds, X = self._clustered_ds(dim=64)
        books = train_pq(ds.repartition(6), m=8, sample_size=2048)
        codes = pq_encode(ds.repartition(6), books).materialize()
        qids = [0, 7, 42]
        Q = X[qids]
        approx = pq_topk_cosine(codes, books, Q, qids, k=10).to_pandas()
        exact500 = topk_cosine(ds, Q, qids, k=500).to_pandas()
        for q in qids:
            a = set(approx[approx.query_id == q]["vec_id"])
            e500 = set(exact500[exact500.query_id == q]["vec_id"])
            assert len(a & e500) / 10 >= 0.9, q

    def test_quality_vs_exact_scores(self, ray_session):
        """True cosine of ADC's picks must be close to the exact
        optimum — rank shuffling among near-ties is fine, picking
        genuinely distant vectors is not."""
        from gridfia_ray.ann.pq import pq_encode, pq_topk_cosine, train_pq
        from gridfia_ray.ann.search import _normalize, topk_cosine

        ds, X = self._clustered_ds(seed=11)
        books = train_pq(ds, m=8, sample_size=2048)
        codes = pq_encode(ds, books)
        qids = [3, 99]
        Q = X[qids]
        approx = pq_topk_cosine(codes, books, Q, qids, k=10).to_pandas()
        exact = topk_cosine(ds, Q, qids, k=10).to_pandas()
        Xn = _normalize(X.astype(np.float64))
        for i, q in enumerate(qids):
            qv = Xn[q]
            got = Xn[approx[approx.query_id == q]["vec_id"].to_numpy()] @ qv
            best = Xn[exact[exact.query_id == q]["vec_id"].to_numpy()] @ qv
            assert got.mean() >= 0.97 * best.mean(), q

    def test_partition_invariant_bit_exact(self, ray_session):
        from gridfia_ray.ann.pq import pq_encode, pq_topk_cosine, train_pq

        ds, X = self._clustered_ds(n=3000)
        qids = [1, 2]
        outs = []
        for parts in (2, 11):
            d = ds.repartition(parts)
            books = train_pq(d, m=8, sample_size=1024)
            codes = pq_encode(d, books)
            outs.append(
                pq_topk_cosine(codes, books, X[qids], qids, k=10)
                .to_pandas()
                .sort_values(["query_id", "rank"], ignore_index=True)
            )
        pd.testing.assert_frame_equal(outs[0], outs[1])

    def test_compression_ratio(self, ray_session):
        """The point of PQ: m bytes per vector (32x smaller than f32x32)."""
        from gridfia_ray.ann.pq import pq_encode, train_pq

        ds, _ = self._clustered_ds(n=2000)
        books = train_pq(ds, m=8, sample_size=512)
        row = pq_encode(ds, books).take(1)[0]
        assert len(row["codes"]) == 8

    def test_bad_inputs(self, ray_session):
        from gridfia_ray.ann.pq import train_pq

        ds, _ = self._clustered_ds(n=600, dim=30)
        with pytest.raises(ValueError, match="not divisible"):
            train_pq(ds, m=8, sample_size=512)
        ds2, _ = self._clustered_ds(n=400)
        with pytest.raises(ValueError, match="smaller than the codebook"):
            train_pq(ds2, m=8, sample_size=128)
        with pytest.raises(ValueError, match="n_codes"):
            train_pq(ds2, m=8, n_codes=512)


class TestPqRefined:
    def test_refined_recall(self, ray_session):
        """ADC shortlist + exact re-rank recovers the true top-10 even
        on near-tie-dense clusters where raw ADC identity-recall is
        inherently low."""
        from gridfia_ray.ann.pq import pq_encode, pq_topk_refined, train_pq
        from gridfia_ray.ann.search import topk_cosine

        ds, X = TestProductQuantization._clustered_ds(dim=64)
        books = train_pq(ds, m=8, sample_size=2048)
        codes = pq_encode(ds, books).materialize()
        qids = [0, 7, 42]
        Q = X[qids]
        refined = pq_topk_refined(ds, codes, books, Q, qids, k=10, refine=400).to_pandas()
        exact = topk_cosine(ds, Q, qids, k=10).to_pandas()
        for q in qids:
            a = set(refined[refined.query_id == q]["vec_id"])
            e = set(exact[exact.query_id == q]["vec_id"])
            assert len(a & e) / 10 >= 0.8, q
            assert refined[refined.query_id == q].iloc[0]["vec_id"] == q


class TestIvfPq:
    @staticmethod
    def _store(tmp_path, n=9000, dim=64, k_cells=16):
        import ray.data as rd

        from gridfia_ray.ann.pq import build_ivfpq_index

        ds, X = TestProductQuantization._clustered_ds(n=n, dim=dim)
        d = str(tmp_path / "ivfpq")
        build_ivfpq_index(ds, d, k_cells=k_cells, m=8, n_iters=10)
        return d, ds, X

    def test_prunes_files_and_finds_neighbors(self, ray_session, tmp_path):
        from gridfia_ray.ann.pq import search_ivfpq_index
        from gridfia_ray.ann.search import topk_cosine

        d, ds, X = self._store(tmp_path)
        out, dirs = search_ivfpq_index(d, X[[3]], [3], k=10, nprobe=4)
        assert len(dirs) <= 4  # single query: reads <= nprobe of 16 cells
        res = out.to_pandas()
        assert len(res) == 10
        exact = topk_cosine(ds, X[[3]], [3], k=500).to_pandas()
        hit = len(set(res["vec_id"]) & set(exact["vec_id"])) / 10
        # probed ADC picks true near neighbors (same near-tie caveat as
        # the raw-PQ quality test: identity among ~560 same-cluster
        # near-ties is not the sketch's contract)
        assert hit >= 0.8

    def test_partition_invariant(self, ray_session, tmp_path):
        import ray.data as rd

        from gridfia_ray.ann.pq import build_ivfpq_index, search_ivfpq_index

        ds, X = TestProductQuantization._clustered_ds(n=4000)
        outs = []
        for i, parts in enumerate((2, 9)):
            d = str(tmp_path / f"s{i}")
            build_ivfpq_index(ds.repartition(parts), d, k_cells=8, m=8, n_iters=10)
            out, _ = search_ivfpq_index(d, X[[1, 2]], [1, 2], k=10, nprobe=3)
            outs.append(
                out.to_pandas().sort_values(["query_id", "rank"], ignore_index=True)
            )
        pd.testing.assert_frame_equal(outs[0], outs[1])

    def test_store_is_codes_only(self, ray_session, tmp_path):
        """The cells store holds m-byte codes, never embeddings."""
        import os

        import pyarrow.parquet as pqt

        d, _, _ = self._store(tmp_path, n=2000, k_cells=4)
        cell_dirs = [
            os.path.join(d, "cells", c) for c in os.listdir(os.path.join(d, "cells"))
        ]
        f = [
            os.path.join(cd, f) for cd in cell_dirs for f in os.listdir(cd)
            if f.endswith(".parquet")
        ][0]
        sch = pqt.read_schema(f)
        assert "embedding" not in sch.names
        t = pqt.read_table(f, columns=["codes"])
        assert len(t["codes"][0].as_py()) == 8


class TestIvfPqRefined:
    def test_refined_recall(self, ray_session, tmp_path):
        """IVFADC+R: probed ADC shortlist + exact re-rank recovers the
        true top-10 despite near-tie ADC reordering."""
        from gridfia_ray.ann.pq import search_ivfpq_refined
        from gridfia_ray.ann.search import topk_cosine

        d, ds, X = TestIvfPq._store(tmp_path)
        qids = [3, 77]
        refined = search_ivfpq_refined(
            d, ds, X[qids], qids, k=10, nprobe=4, refine=400
        ).to_pandas()
        exact = topk_cosine(ds, X[qids], qids, k=10).to_pandas()
        for q in qids:
            a = set(refined[refined.query_id == q]["vec_id"])
            e = set(exact[exact.query_id == q]["vec_id"])
            assert len(a & e) / 10 >= 0.8, q
            assert refined[refined.query_id == q].iloc[0]["vec_id"] == q


import ray.data as rd  # noqa: E402  (knn-graph tests)


class TestKnnGraph:

    def test_matches_brute_force(self, ray_session):
        import pandas as pd

        from gridfia_ray.ann.search import knn_graph

        rng = np.random.RandomState(5)
        n, d, k = 120, 16, 4
        m = rng.randn(n, d)
        df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                           "embedding": [v.astype(np.float32) for v in m]})
        out = (
            knn_graph(rd.from_pandas(df).repartition(4), k=k)
            .to_pandas()
            .sort_values(["vec_id", "rank"])
            .reset_index(drop=True)
        )
        assert len(out) == n * k
        # brute in f32-input/f64-math like the pipeline
        norm32 = m.astype(np.float32).astype(np.float64)
        norm32 = norm32 / np.linalg.norm(norm32, axis=1, keepdims=True)
        sims = norm32 @ norm32.T
        np.fill_diagonal(sims, -np.inf)
        for i in range(n):
            order = np.lexsort((np.arange(n), -sims[i]))[:k]
            got = out[out["vec_id"] == i]["nbr_id"].tolist()
            assert got == order.tolist(), i

    def test_mutual_planted_pair(self, ray_session):
        import pandas as pd

        from gridfia_ray.ann.search import knn_graph

        rng = np.random.RandomState(9)
        m = rng.randn(50, 8)
        m[7] = m[3] + 1e-4 * rng.randn(8)  # planted near-dup
        df = pd.DataFrame({"vec_id": np.arange(50, dtype=np.int64),
                           "embedding": [v.astype(np.float32) for v in m]})
        out = knn_graph(rd.from_pandas(df), k=1).to_pandas()
        top = dict(zip(out["vec_id"], out["nbr_id"]))
        assert top[3] == 7 and top[7] == 3

    def test_broadcast_bound_raises(self, ray_session):
        import pandas as pd
        import pytest as _pt

        from gridfia_ray.ann.search import knn_graph

        df = pd.DataFrame({"vec_id": np.arange(100, dtype=np.int64),
                           "embedding": [np.ones(64, np.float32)] * 100})
        with _pt.raises(ValueError, match="max_broadcast_bytes"):
            knn_graph(rd.from_pandas(df), k=2, max_broadcast_bytes=1024)


class TestKnnGraphIvf:
    def _corpus(self, n=300, d=16, seed=3):
        rng = np.random.RandomState(seed)
        # clustered corpus: IVF probing is meaningful
        centers = rng.randn(6, d) * 4
        m = centers[rng.randint(0, 6, n)] + rng.randn(n, d)
        return pd.DataFrame(
            {"vec_id": np.arange(n, dtype=np.int64),
             "embedding": [v.astype(np.float32) for v in m]}
        )

    def test_full_probe_equals_exact(self, ray_session):
        from gridfia_ray.ann.search import knn_graph, knn_graph_ivf

        df = self._corpus()
        exact = (
            knn_graph(rd.from_pandas(df), k=4)
            .to_pandas()[["vec_id", "nbr_id", "rank"]]
            .sort_values(["vec_id", "rank"]).reset_index(drop=True)
        )
        appr = (
            knn_graph_ivf(
                rd.from_pandas(df).repartition(4), k=4, n_cells=8, nprobe=8
            )
            .to_pandas()[["vec_id", "nbr_id", "rank"]]
            .astype(np.int64)
            .sort_values(["vec_id", "rank"]).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(appr, exact.astype(np.int64))

    def test_recall_reasonable_at_low_nprobe(self, ray_session):
        from gridfia_ray.ann.search import knn_graph, knn_graph_ivf

        df = self._corpus()
        exact = knn_graph(rd.from_pandas(df), k=4).to_pandas()
        appr = knn_graph_ivf(
            rd.from_pandas(df), k=4, n_cells=8, nprobe=3
        ).to_pandas()
        truth = {(int(a), int(b)) for a, b in zip(exact["vec_id"], exact["nbr_id"])}
        got = {(int(a), int(b)) for a, b in zip(appr["vec_id"], appr["nbr_id"])}
        recall = len(truth & got) / len(truth)
        assert recall > 0.8, recall

    def test_partition_invariance(self, ray_session):
        from gridfia_ray.ann.search import knn_graph_ivf

        df = self._corpus(seed=11)
        a = (
            knn_graph_ivf(rd.from_pandas(df).repartition(2), k=3, n_cells=8, nprobe=2)
            .to_pandas()[["vec_id", "nbr_id", "rank"]]
            .sort_values(["vec_id", "rank"]).reset_index(drop=True)
        )
        b = (
            knn_graph_ivf(rd.from_pandas(df).repartition(9), k=3, n_cells=8, nprobe=2)
            .to_pandas()[["vec_id", "nbr_id", "rank"]]
            .sort_values(["vec_id", "rank"]).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)

    def test_nprobe_validation(self, ray_session):
        from gridfia_ray.ann.search import knn_graph_ivf

        with pytest.raises(ValueError, match="nprobe"):
            knn_graph_ivf(rd.from_pandas(self._corpus()), k=2, n_cells=4, nprobe=9)


class TestHardNegatives:

    def test_matches_brute_force(self, ray_session):
        import pandas as pd

        from gridfia_ray.ann.search import hard_negatives

        rng = np.random.RandomState(11)
        n, d, k = 90, 12, 4
        m = rng.randn(n, d)
        labs = rng.randint(0, 3, n)
        df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                           "embedding": [v.astype(np.float32) for v in m],
                           "label": labs.astype(np.int32)})
        out = (
            hard_negatives(rd.from_pandas(df).repartition(4), k=k)
            .to_pandas()
            .sort_values(["vec_id", "rank"])
            .reset_index(drop=True)
        )
        norm32 = m.astype(np.float32).astype(np.float64)
        norm32 = norm32 / np.linalg.norm(norm32, axis=1, keepdims=True)
        sims = norm32 @ norm32.T
        for i in range(n):
            s = sims[i].copy()
            s[labs == labs[i]] = -np.inf
            order = np.lexsort((np.arange(n), -s))[:k]
            got = out[out["vec_id"] == i]["neg_id"].tolist()
            assert got == order.tolist(), i
            # every mined negative really is other-label
            assert all(labs[j] != labs[i] for j in got)

    def test_single_label_emits_nothing(self, ray_session):
        import pandas as pd

        from gridfia_ray.ann.search import hard_negatives

        rng = np.random.RandomState(12)
        df = pd.DataFrame({"vec_id": np.arange(20, dtype=np.int64),
                           "embedding": [v.astype(np.float32)
                                         for v in rng.randn(20, 8)],
                           "label": np.zeros(20, np.int32)})
        out = hard_negatives(rd.from_pandas(df), k=3).to_pandas()
        assert len(out) == 0
