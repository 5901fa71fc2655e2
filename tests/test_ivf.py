"""IVF ANN index: k-means quality, determinism/partition invariance,
probe recall vs brute force, and file-pruned index search."""

import os

import numpy as np
import pandas as pd
import pytest

from gridfia_ray.ann import ivf
from gridfia_ray.ann.search import topk_cosine

DIM = 32
N = 2000
K_CLUSTERS = 8


@pytest.fixture(scope="module")
def blobs():
    """Planted spherical clusters: ground truth for purity/recall."""
    rng = np.random.RandomState(7)
    centers = rng.normal(size=(K_CLUSTERS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    lab = rng.randint(0, K_CLUSTERS, N)
    vecs = centers[lab] + 0.15 * rng.normal(size=(N, DIM))
    df = pd.DataFrame(
        {"vec_id": np.arange(N, dtype=np.int64), "embedding": list(vecs.astype(np.float32))}
    )
    return df, vecs, lab


@pytest.fixture(scope="module")
def blob_ds(blobs, ray_session):
    import ray.data as rd

    return rd.from_pandas(blobs[0]).repartition(8)


@pytest.fixture(scope="module")
def centroids(blob_ds):
    return ivf.kmeans_fit(blob_ds, K_CLUSTERS, seed=1)


class TestKMeans:
    def test_recovers_planted_clusters(self, blob_ds, blobs, centroids):
        _, _, lab = blobs
        assigned = ivf.assign_cells(blob_ds, centroids).to_pandas()
        assigned["lab"] = lab[assigned["vec_id"].to_numpy()]
        purity = assigned.groupby("ivf_cell")["lab"].agg(
            lambda s: s.value_counts().iloc[0] / len(s)
        )
        assert len(purity) == K_CLUSTERS
        assert purity.min() >= 0.95

    def test_partition_invariant(self, blob_ds, blobs, centroids, ray_session):
        """Centroid rounding absorbs block-boundary float jitter: the
        fit is bit-identical across physical partitionings."""
        import ray.data as rd

        ds2 = rd.from_pandas(blobs[0]).repartition(2)
        c2 = ivf.kmeans_fit(ds2, K_CLUSTERS, seed=1)
        assert np.array_equal(centroids, c2)

    def test_centroids_unit_norm(self, centroids):
        np.testing.assert_allclose(
            np.linalg.norm(centroids, axis=1), 1.0, atol=10**-8
        )

    def test_k_capped_by_pool(self, blobs, ray_session):
        import ray.data as rd

        tiny = rd.from_pandas(blobs[0].head(5))
        c = ivf.kmeans_fit(tiny, 16, seed=1)
        assert len(c) == 5


class TestIvfTopK:
    def test_recall_on_clustered_data(self, blob_ds, blobs, centroids):
        _, vecs, _ = blobs
        qids = [0, 1, 2, 3, 4]
        q = vecs[qids]
        exact = topk_cosine(blob_ds, q, qids, k=10).to_pandas()
        approx = ivf.ivf_topk_cosine(
            blob_ds, q, qids, k=10, k_cells=K_CLUSTERS, nprobe=2, centroids=centroids
        ).to_pandas()
        hits = set(map(tuple, approx[["query_id", "vec_id"]].values))
        truth = set(map(tuple, exact[["query_id", "vec_id"]].values))
        assert len(hits & truth) / len(truth) >= 0.95

    def test_full_probe_equals_brute(self, blob_ds, blobs, centroids):
        """nprobe == k_cells degenerates to exact brute force."""
        _, vecs, _ = blobs
        qids = [10, 20]
        q = vecs[qids]
        exact = topk_cosine(blob_ds, q, qids, k=10).to_pandas()
        full = ivf.ivf_topk_cosine(
            blob_ds, q, qids, k=10, k_cells=K_CLUSTERS, nprobe=K_CLUSTERS,
            centroids=centroids,
        ).to_pandas()
        e = exact.sort_values(["query_id", "rank"])[["query_id", "vec_id"]].to_numpy()
        f = full.sort_values(["query_id", "rank"])[["query_id", "vec_id"]].to_numpy()
        assert np.array_equal(e, f)


class TestInputValidation:
    def test_missing_vec_id_raises_upfront(self, blobs, ray_session):
        """A dataset without vec_id must fail on the driver with the
        real cause, not a KeyError deep inside a map_batches task."""
        import ray.data as rd

        df = blobs[0][["embedding"]]
        with pytest.raises(ValueError, match="vec_id"):
            ivf.kmeans_fit(rd.from_pandas(df), K_CLUSTERS, seed=1)

    def test_all_probed_cells_empty_returns_empty(self, blob_ds, blobs, tmp_path_factory):
        """Probing only absent cell partitions yields an empty result,
        not an opaque read_parquet([]) error."""
        import shutil

        _, vecs, _ = blobs
        d = str(tmp_path_factory.mktemp("ivf_empty"))
        ivf.build_ivf_index(blob_ds, d, K_CLUSTERS, seed=1)
        shutil.rmtree(os.path.join(d, "cells"))
        res, dirs = ivf.search_ivf_index(d, vecs[[0]], [0], k=10, nprobe=2)
        assert dirs == []
        # NB: Dataset.to_pandas() drops columns on zero-row datasets, so
        # assert the schema on the Dataset itself
        assert res.schema().names == ["query_id", "vec_id", "cosine", "rank"]
        assert res.count() == 0


class TestIndexStore:
    def test_build_search_prunes_files(self, blob_ds, blobs, centroids, tmp_path_factory):
        _, vecs, _ = blobs
        d = str(tmp_path_factory.mktemp("ivf_idx"))
        built = ivf.build_ivf_index(blob_ds, d, K_CLUSTERS, seed=1)
        assert np.array_equal(built, centroids)  # same fit, same seed
        qids = [0, 1, 2]
        res, dirs = ivf.search_ivf_index(d, vecs[qids], qids, k=10, nprobe=2)
        n_cells = len(
            [p for p in os.listdir(os.path.join(d, "cells")) if p.startswith("ivf_cell=")]
        )
        assert n_cells == K_CLUSTERS
        assert len(dirs) < n_cells  # file-level pruning actually happened
        inmem = ivf.ivf_topk_cosine(
            blob_ds, vecs[qids], qids, k=10, k_cells=K_CLUSTERS, nprobe=2,
            centroids=centroids,
        ).to_pandas()
        got = res.to_pandas()
        assert set(map(tuple, got[["query_id", "vec_id"]].values)) == set(
            map(tuple, inmem[["query_id", "vec_id"]].values)
        )


class TestInt8Quantization:
    def test_roundtrip_cosine_error(self, blobs):
        from gridfia_ray.ann.quant import dequantize, quantize_vecs

        _, vecs, _ = blobs
        q, scale = quantize_vecs(vecs)
        deq = dequantize(q, scale)
        a = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        b = deq / np.linalg.norm(deq, axis=1, keepdims=True)
        cos = (a * b).sum(axis=1)
        assert cos.min() > 0.999

    def test_quantized_index_smaller_and_recall(self, blob_ds, blobs, tmp_path_factory):
        from gridfia_ray import fixtures  # noqa: F401 (session fixture deps)
        from gridfia_ray.ann import ivf

        _, vecs, _ = blobs
        d_f = str(tmp_path_factory.mktemp("ivf_f32"))
        d_q = str(tmp_path_factory.mktemp("ivf_q8"))
        ivf.build_ivf_index(blob_ds, d_f, K_CLUSTERS, seed=1)
        ivf.build_ivf_index(blob_ds, d_q, K_CLUSTERS, seed=1, quantize="int8")

        def store_bytes(d):
            tot = 0
            for root, _, files in os.walk(os.path.join(d, "cells")):
                tot += sum(os.path.getsize(os.path.join(root, f)) for f in files)
            return tot

        assert store_bytes(d_q) < 0.5 * store_bytes(d_f)  # ~4x on the vector col

        qids = [0, 1, 2]
        rf, _ = ivf.search_ivf_index(d_f, vecs[qids], qids, k=10, nprobe=2)
        rq, _ = ivf.search_ivf_index(d_q, vecs[qids], qids, k=10, nprobe=2)
        f = set(map(tuple, rf.to_pandas()[["query_id", "vec_id"]].values))
        q = set(map(tuple, rq.to_pandas()[["query_id", "vec_id"]].values))
        assert len(f & q) / len(f) >= 0.9


class TestSampledTrainAndAppend:
    def test_sampled_train_recall_parity(self, blob_ds, blobs):
        """Quantizer trained on a ~600-vector hash sample must match the
        full-train fit's recall bar on the clustered corpus (round-3
        VERDICT #5: build cost scales with sample, not corpus)."""
        _, vecs, lab = blobs
        c_s = ivf.kmeans_fit(blob_ds, K_CLUSTERS, seed=1, train_size=600)
        assigned = ivf.assign_cells(blob_ds, c_s).to_pandas()
        assigned["lab"] = lab[assigned["vec_id"].to_numpy()]
        purity = assigned.groupby("ivf_cell")["lab"].agg(
            lambda s: s.value_counts().iloc[0] / len(s)
        )
        assert len(purity) == K_CLUSTERS and purity.min() >= 0.95
        qids = [0, 1, 2, 3, 4]
        exact = topk_cosine(blob_ds, vecs[qids], qids, k=10).to_pandas()
        approx = ivf.ivf_topk_cosine(
            blob_ds, vecs[qids], qids, k=10, k_cells=K_CLUSTERS, nprobe=2,
            centroids=c_s,
        ).to_pandas()
        hits = set(map(tuple, approx[["query_id", "vec_id"]].values))
        truth = set(map(tuple, exact[["query_id", "vec_id"]].values))
        assert len(hits & truth) / len(truth) >= 0.95

    def test_sampled_train_partition_invariant(self, blobs, ray_session):
        import ray.data as rd

        a = ivf.kmeans_fit(rd.from_pandas(blobs[0]).repartition(2),
                           K_CLUSTERS, seed=1, train_size=600)
        b = ivf.kmeans_fit(rd.from_pandas(blobs[0]).repartition(11),
                           K_CLUSTERS, seed=1, train_size=600)
        assert np.array_equal(a, b)

    def test_append_then_search(self, blobs, tmp_path_factory, ray_session):
        """Index built on part of the corpus, rest appended without
        retraining: search must see appended vectors (self-query top-1)
        and old part files must survive (append-native store)."""
        import ray.data as rd

        df, vecs, _ = blobs
        d = str(tmp_path_factory.mktemp("ivf_app"))
        base, extra = df.iloc[:1500], df.iloc[1500:]
        ivf.build_ivf_index(rd.from_pandas(base).repartition(4), d, K_CLUSTERS, seed=1)

        def n_files():
            return sum(
                len(fs) for _, _, fs in os.walk(os.path.join(d, "cells"))
            )

        before = n_files()
        n = ivf.append_to_ivf_index(rd.from_pandas(extra).repartition(3), d)
        assert n == len(extra)
        assert n_files() > before  # old parts kept, new parts added
        qids = [1600, 1700, 100]  # two appended, one original
        res, _ = ivf.search_ivf_index(d, vecs[qids], qids, k=5, nprobe=3)
        got = res.to_pandas()
        top1 = got[got["rank"] == 1].set_index("query_id")["vec_id"]
        assert top1.loc[1600] == 1600 and top1.loc[1700] == 1700
        assert top1.loc[100] == 100

    def test_append_dim_mismatch_raises(self, blobs, tmp_path_factory, ray_session):
        import ray.data as rd

        df = blobs[0]
        d = str(tmp_path_factory.mktemp("ivf_dim"))
        ivf.build_ivf_index(rd.from_pandas(df.iloc[:500]), d, 4, seed=1)
        bad = pd.DataFrame(
            {"vec_id": np.int64([9000]),
             "embedding": [np.zeros(DIM + 3, np.float32)]}
        )
        with pytest.raises(ValueError, match="-d vectors"):
            ivf.append_to_ivf_index(rd.from_pandas(bad), d)
