"""BM25 retrieval: integer quantization pieces, ranking agreement with
float Okapi BM25, length-normalization behavior, saturation vs raw tf,
exclusion/ordering contracts, sentinel collision regression, partition
invariance."""

import math

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from gridfia_ray.text.bm25 import (
    _LEN_SENTINEL,
    bm25_idf_milli,
    bm25_topk,
    corpus_stats_for_vocab,
)


def _ds(texts, ids=None, parts=1):
    ids = list(range(len(texts))) if ids is None else ids
    df = pd.DataFrame({"doc_id": np.asarray(ids, np.int64), "text": texts})
    return rd.from_pandas(df).repartition(parts)


def _float_bm25(texts, qid, k1=1.2, b=0.75):
    """Textbook float BM25 over whitespace tokens (ranking reference)."""
    toks = [t.split() for t in texts]
    n = len(texts)
    lens = [len(t) for t in toks]
    avg = sum(lens) / n
    q = set(toks[qid])
    df = {t: sum(1 for d in toks if t in d) for t in q}
    qtf = {t: toks[qid].count(t) for t in q}
    scores = {}
    for i, d in enumerate(toks):
        if i == qid:
            continue
        s = 0.0
        for t in q:
            tf = d.count(t)
            if tf == 0:
                continue
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += qtf[t] * idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * lens[i] / avg))
        scores[i] = s
    return scores


class TestPieces:
    def test_idf_monotone_nonneg(self):
        assert bm25_idf_milli(0, 100) > bm25_idf_milli(10, 100) > bm25_idf_milli(99, 100)
        assert bm25_idf_milli(100, 100) >= 0
        assert isinstance(bm25_idf_milli(5, 50), int)

    def test_corpus_stats_two_sentinels(self, ray_session):
        # regression: two NUL-prefixed sentinels silently merged in the
        # pandas groupby (C-string hashing) and zeroed the corpus length
        dfreq, n_docs, lnum = corpus_stats_for_vocab(
            _ds(["a b c", "a a", "", "b d"], parts=2), {"a", "b"}
        )
        assert (dfreq, n_docs, lnum) == ({"a": 2, "b": 2}, 4, 7)

    def test_sentinel_vocab_rejected(self, ray_session):
        with pytest.raises(ValueError, match="reserved sentinel"):
            corpus_stats_for_vocab(_ds(["a"]), {"a", _LEN_SENTINEL})


class TestTopK:
    def test_ranking_matches_float_bm25(self, ray_session):
        rng = np.random.RandomState(5)
        vocab = [f"w{i}" for i in range(30)]
        texts = [
            " ".join(rng.choice(vocab, rng.randint(5, 60)))
            for _ in range(40)
        ]
        out = bm25_topk(_ds(texts, parts=4), [0], k=40)
        want = _float_bm25(texts, 0)
        got_rank = out.sort_values(["score_c", "doc_id"], ascending=[False, True])[
            "doc_id"
        ].tolist()
        want_rank = sorted(
            [i for i, s in want.items() if s > 0], key=lambda i: (-want[i], i)
        )
        # milli-quantization can only flip near-exact float ties
        assert got_rank[:10] == want_rank[: len(got_rank)][:10]

    def test_length_normalization_prefers_shorter(self, ray_session):
        # same tf of the query term; the longer doc is penalized
        ds = _ds(["q", "q pad " + "x " * 50, "q y"])
        out = bm25_topk(ds, [0], k=10)
        s = dict(zip(out["doc_id"], out["score_c"]))
        assert s[2] > s[1]

    def test_tf_saturation(self, ray_session):
        # BM25 saturates in tf: 10x the term count on an equal-length
        # doc gains less than 10x the score (unlike raw tf-idf)
        ds = _ds(["q", "q " + "z " * 9, ("q " * 10).strip()])
        out = bm25_topk(ds, [0], k=10)
        s = dict(zip(out["doc_id"], out["score_c"]))
        assert s[2] > s[1]  # more tf still scores higher...
        assert s[2] < 10 * s[1]  # ...but sub-linearly

    def test_excludes_query_and_breaks_ties_by_id(self, ray_session):
        ds = _ds(["a b", "a b", "a b", "zz"])
        out = bm25_topk(ds, [0], k=10)
        assert 0 not in set(out["doc_id"])
        assert out["doc_id"].tolist() == [1, 2]
        assert out["score_c"].iloc[0] == out["score_c"].iloc[1]

    def test_partition_invariant(self, ray_session):
        rng = np.random.RandomState(6)
        vocab = [f"t{i}" for i in range(20)]
        texts = [" ".join(rng.choice(vocab, rng.randint(3, 30))) for _ in range(60)]
        a = bm25_topk(_ds(texts, parts=1), [1, 2], k=5)
        b = bm25_topk(_ds(texts, parts=7), [1, 2], k=5)
        pd.testing.assert_frame_equal(a, b)
