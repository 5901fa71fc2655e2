"""Document dedup: exact, MinHash-LSH recall, SimHash exhaustiveness,
n-gram Jaccard verification."""

import numpy as np
import pandas as pd
import pytest

from gridfia_ray.dedup.docs import (
    MinHasher,
    SimHasher,
    estimate_jaccard,
    exact_dedup_docs,
    jaccard,
    minhash_lsh_pairs,
    simhash_pairs,
    verify_pairs_ngram_jaccard,
    word_shingles,
)


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.RandomState(5)
    vocab = [f"w{i}" for i in range(200)]
    texts = [" ".join(rng.choice(vocab, 40)) for _ in range(30)]
    # exact dup pair, near-dup pair (2-token change), unrelated rest
    texts.append(texts[0])
    near = texts[1].split()
    near[5], near[20] = "xx", "yy"
    texts.append(" ".join(near))
    return pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})


@pytest.fixture(scope="module")
def corpus_ds(ray_session, corpus):
    import ray.data as rd

    return rd.from_pandas(corpus)


class TestExact:
    def test_min_id_survives(self, corpus_ds, corpus):
        out = exact_dedup_docs(corpus_ds).to_pandas()
        assert len(out) == corpus["text"].nunique()
        assert 0 in set(out["doc_id"])  # min id of the dup pair
        assert 30 not in set(out["doc_id"])  # the exact copy


class TestMinHash:
    def test_signature_estimates_jaccard(self, corpus):
        mh = MinHasher(n_perm=256)
        a, b = corpus.text[1], corpus.text[31]  # near-dup pair
        true_j = jaccard(word_shingles(a), word_shingles(b))
        est = estimate_jaccard(
            mh.signature(a).astype(np.int64).tobytes(), mh.signature(b).astype(np.int64).tobytes()
        )
        assert est == pytest.approx(true_j, abs=0.15)
        assert true_j > 0.7

    def test_lsh_finds_dups(self, corpus_ds):
        pairs = minhash_lsh_pairs(corpus_ds, threshold=0.5).to_pandas()
        found = set(zip(pairs.a, pairs.b))
        assert (0, 30) in found  # exact dup
        assert (1, 31) in found  # near dup
        # unrelated random docs shouldn't flood in
        assert len(found) < 10


class TestSimHash:
    def test_near_docs_close(self, corpus):
        sh = SimHasher()
        a = sh.sim64(corpus.text[1])
        b = sh.sim64(corpus.text[31])
        c = sh.sim64(corpus.text[2])
        from gridfia_ray.codecs.phash import hamming64

        near = hamming64(np.array([a]), np.array([b]))[0]
        far = hamming64(np.array([a]), np.array([c]))[0]
        assert near <= 16  # 2/40 tokens changed → a handful of flipped bits
        assert far > near  # unrelated docs are farther than near-dups

    def test_pairs_exhaustive_vs_bruteforce(self, corpus_ds, corpus):
        from gridfia_ray.codecs.phash import hamming64

        got = simhash_pairs(corpus_ds, max_hamming=6, n_bands=8).to_pandas()
        sh = SimHasher()
        sigs = np.asarray([sh.sim64(t) for t in corpus.text], np.int64)
        ids = corpus.doc_id.to_numpy()
        ii, jj = np.triu_indices(len(ids), k=1)
        hm = hamming64(sigs[ii], sigs[jj])
        keep = hm <= 6
        expect = set(zip(ids[ii[keep]], ids[jj[keep]]))
        assert set(zip(got.a, got.b)) == expect


class TestNgramVerify:
    def test_filters_false_candidates(self, corpus):
        texts = dict(zip(corpus.doc_id, corpus.text))
        cand = pd.DataFrame({"a": [0, 1, 2], "b": [30, 31, 3]})
        out = verify_pairs_ngram_jaccard(cand, texts, threshold=0.5)
        assert set(zip(out.a, out.b)) == {(0, 30), (1, 31)}
        assert out[out.a == 0]["jaccard"].iloc[0] == 1.0

    def test_distributed_exact_vs_bruteforce(self, corpus_ds, corpus):
        """The prefix-filtered distributed operator returns EXACTLY the
        brute-force all-pairs jaccard-threshold set (values included)."""
        from gridfia_ray.dedup.docs import ngram_jaccard_pairs

        got = ngram_jaccard_pairs(corpus_ds, k=3, threshold=0.5).to_pandas()
        got_map = {(a, b): j for a, b, j in zip(got.a, got.b, got.jaccard)}
        shs = {d: word_shingles(t) for d, t in zip(corpus.doc_id, corpus.text)}
        ids = sorted(shs)
        want = {}
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                if shs[a] or shs[b]:
                    j = jaccard(shs[a], shs[b])
                    if j >= 0.5:
                        want[(a, b)] = j
        assert got_map.keys() == want.keys()
        for key, j in want.items():
            assert got_map[key] == pytest.approx(j, abs=1e-12)

    def test_low_threshold_still_exact(self, corpus_ds, corpus):
        from gridfia_ray.dedup.docs import ngram_jaccard_pairs

        got = ngram_jaccard_pairs(corpus_ds, k=3, threshold=0.05).to_pandas()
        shs = {d: word_shingles(t) for d, t in zip(corpus.doc_id, corpus.text)}
        ids = sorted(shs)
        want = {
            (a, b)
            for i, a in enumerate(ids)
            for b in ids[i + 1 :]
            if jaccard(shs[a], shs[b]) >= 0.05 and (shs[a] or shs[b])
        }
        assert set(zip(got.a, got.b)) == want


class TestParagraphDedup:
    def test_keep_first_and_drop_all_dup_docs(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from gridfia_ray.dedup.docs import paragraph_dedup

        df = pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    "hello\n\nshared para\n\nunique a",
                    "shared para\n\nunique b",
                    "shared para",           # all-duplicate → disappears
                    "solo doc",
                ],
            }
        )
        for parts in (1, 3):
            out = (
                paragraph_dedup(rd.from_pandas(df).repartition(parts))
                .to_pandas()
                .sort_values("doc_id")
                .reset_index(drop=True)
            )
            assert out["doc_id"].tolist() == [1, 2, 4]
            assert out["text_clean"].tolist() == [
                "hello\n\nshared para\n\nunique a",  # first owner keeps it
                "unique b",
                "solo doc",
            ]

    def test_null_text_matches_oracle_semantics(self, ray_session):
        """NULL text drops out entirely (string_split(NULL) → no rows in
        the SQL oracle) and must NOT steal the keep-first slot from a
        later genuinely-empty document."""
        import pandas as pd
        import ray.data as rd

        from gridfia_ray.dedup.docs import paragraph_dedup

        df = pd.DataFrame({"doc_id": [1, 2, 3], "text": [None, "", "plain"]})
        out = (
            paragraph_dedup(rd.from_pandas(df))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert out["doc_id"].tolist() == [2, 3]
        assert out["text_clean"].tolist() == ["", "plain"]


class TestDupClusters:
    def test_chain_cycle_and_min_rep(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from gridfia_ray.dedup.docs import dup_clusters

        pairs = pd.DataFrame({"a": [1, 2, 3, 5], "b": [2, 3, 1, 6]})  # cycle + pair
        out = dup_clusters(rd.from_pandas(pairs))
        assert dict(zip(out["doc_id"], out["cluster_rep"])) == {
            1: 1, 2: 1, 3: 1, 5: 5, 6: 5,
        }

    def test_pair_bound_enforced(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from gridfia_ray.dedup.docs import dup_clusters

        pairs = pd.DataFrame({"a": [1, 3], "b": [2, 4]})
        with pytest.raises(ValueError):
            dup_clusters(rd.from_pandas(pairs), max_driver_pairs=1)

    def test_distributed_raises_on_non_convergence(self, ray_session):
        """Exhausting max_iters without fixpoint must raise, not return
        partially-propagated (wrong) component labels."""
        import pandas as pd
        import ray.data as rd

        from gridfia_ray.dedup.docs import dup_clusters_distributed

        chain = pd.DataFrame({"a": [0, 1, 2, 3, 4], "b": [1, 2, 3, 4, 5]})
        with pytest.raises(RuntimeError, match="did not converge"):
            dup_clusters_distributed(
                rd.from_pandas(chain), n_buckets=4, max_iters=1
            ).to_pandas()

    def test_distributed_matches_union_find(self, ray_session):
        """Label propagation fixpoint == driver union-find on seeded
        random graphs (chains, stars, cycles all arise at n=60)."""
        import pandas as pd
        import ray.data as rd

        from gridfia_ray.dedup.docs import dup_clusters, dup_clusters_distributed

        rng = np.random.RandomState(11)
        for trial in range(3):
            a = rng.randint(0, 60, 40)
            off = rng.randint(1, 60, 40)
            pairs = pd.DataFrame({"a": a, "b": (a + off) % 60})
            pairs = pairs[pairs.a != pairs.b]
            ds = rd.from_pandas(pairs).repartition(3)
            want = dup_clusters(ds).sort_values("doc_id").reset_index(drop=True)
            got = (
                dup_clusters_distributed(ds, n_buckets=8)
                .to_pandas()
                .sort_values("doc_id")
                .reset_index(drop=True)
            )
            pd.testing.assert_frame_equal(got, want)


import ray.data as rd  # noqa: E402  (canonical-dedup tests)


class TestCanonicalDedup:
    def test_best_quality_survives(self, ray_session):
        from gridfia_ray.dedup.docs import canonical_dedup_docs

        # docs 1/2/3 near-identical (one cluster), 2 is longest; 9 unique
        t = "the quick brown fox jumps over the lazy dog again and again"
        docs = pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 9],
                "text": [t, t + " extra tail words here", t + " x", "completely different content with no overlap whatsoever in it"],
            }
        )
        docs["n_chars"] = docs["text"].str.len().astype(np.int64)
        out = canonical_dedup_docs(
            rd.from_pandas(docs).repartition(2), k=3, threshold=0.5
        ).to_pandas()
        assert sorted(out["doc_id"].tolist()) == [2, 9]

    def test_quality_tie_keeps_smaller_id(self, ray_session):
        from gridfia_ray.dedup.docs import canonical_dedup_docs

        t = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        docs = pd.DataFrame(
            {"doc_id": [5, 4], "text": [t, t], }
        )
        docs["n_chars"] = docs["text"].str.len().astype(np.int64)
        out = canonical_dedup_docs(rd.from_pandas(docs), k=3, threshold=0.5).to_pandas()
        assert out["doc_id"].tolist() == [4]

    def test_no_dups_is_identity(self, ray_session):
        from gridfia_ray.dedup.docs import canonical_dedup_docs

        docs = pd.DataFrame(
            {
                "doc_id": [1, 2],
                "text": ["one sentence about apples and orchards in autumn",
                         "unrelated prose describing maritime navigation rules"],
            }
        )
        docs["n_chars"] = docs["text"].str.len().astype(np.int64)
        out = canonical_dedup_docs(rd.from_pandas(docs), k=3, threshold=0.5).to_pandas()
        assert sorted(out["doc_id"].tolist()) == [1, 2]
