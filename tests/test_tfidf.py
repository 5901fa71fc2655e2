"""TF-IDF retrieval: hand-computed scores, tie-breaking, query-doc
exclusion, zero-score drop, missing-query error, partition invariance."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from gridfia_ray.text.tfidf import (
    df_for_vocab,
    idf_milli,
    query_term_vectors,
    tfidf_topk,
)


def _ds(texts, ids=None, parts=1):
    ids = list(range(len(texts))) if ids is None else ids
    df = pd.DataFrame({"doc_id": np.asarray(ids, np.int64), "text": texts})
    return rd.from_pandas(df).repartition(parts)


class TestPieces:
    def test_df_counts_presence_not_frequency(self, ray_session):
        ds = _ds(["a a a b", "a c", "c c"])
        dfreq, n = df_for_vocab(ds, {"a", "b", "c", "zz"})
        assert n == 3
        assert dfreq == {"a": 2, "b": 1, "c": 2}  # zz absent, a is 2 not 4

    def test_idf_monotone_and_quantized(self):
        # rarer token -> larger idf; df == N -> exactly 1000 milli-nats
        assert idf_milli(9, 9) == 1000
        assert idf_milli(0, 9) > idf_milli(3, 9) > idf_milli(9, 9)
        assert isinstance(idf_milli(3, 100), int)

    def test_query_vectors_missing_raises(self, ray_session):
        with pytest.raises(ValueError, match="not found"):
            query_term_vectors(_ds(["a"]), [0, 99])


class TestTopK:
    def test_hand_computed(self, ray_session):
        # query doc 0 = "a b"; doc 1 shares a+b, doc 2 shares a only,
        # doc 3 shares nothing (zero score -> dropped)
        ds = _ds(["a b", "a b x", "a y y", "z z"])
        out = tfidf_topk(ds, [0], k=10)
        assert out["doc_id"].tolist() == [1, 2]
        n = 4
        ia = idf_milli(3, n)  # 'a' in docs 0,1,2
        ib = idf_milli(2, n)  # 'b' in docs 0,1
        s1 = 1 * 1 * ia * ia + 1 * 1 * ib * ib
        s2 = 1 * 1 * ia * ia
        got = dict(zip(out["doc_id"], out["score_c"]))
        assert got == {1: s1, 2: s2}
        assert s1 > s2

    def test_excludes_query_docs_and_ties_break_by_id(self, ray_session):
        # docs 2 and 3 identical -> equal scores, doc 2 first; with k=1
        # only doc 2 survives
        ds = _ds(["a", "zz", "a q", "a q"])
        out = tfidf_topk(ds, [0], k=1)
        assert out["doc_id"].tolist() == [2]
        assert 0 not in set(out["doc_id"])

    def test_tf_weighting(self, ray_session):
        # doc repeating the query token more scores higher
        ds = _ds(["a", "a a a", "a"])
        out = tfidf_topk(ds, [0], k=10)
        assert out.sort_values("score_c", ascending=False)["doc_id"].tolist() == [1, 2]

    def test_partition_invariant(self, ray_session):
        rng = np.random.RandomState(7)
        words = ["w%d" % i for i in range(30)]
        texts = [
            " ".join(rng.choice(words, size=rng.randint(5, 25)))
            for _ in range(120)
        ]
        a = tfidf_topk(_ds(texts, parts=2), [0, 5], k=7)
        b = tfidf_topk(_ds(texts, parts=13), [0, 5], k=7)
        pd.testing.assert_frame_equal(a, b)
