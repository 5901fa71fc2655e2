"""Bigram LM perplexity scoring: hand-computed probabilities, unseen
bigram smoothing, reference-slice training, partition invariance, and
the quality-ordering property the CCNet filter relies on."""

import math

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from gridfia_ray.text.lm import perplexity_scores, train_bigram_lm


def _ds(rows, parts=1):
    df = pd.DataFrame(rows)
    df["doc_id"] = df["doc_id"].astype(np.int64)
    return rd.from_pandas(df).repartition(parts)


def _lp_c(c_ab, ctx, v):
    return int(math.floor(1e6 * math.log((c_ab + 1.0) / (ctx + v)) + 0.5))


class TestTrain:
    def test_counts_and_vocab(self, ray_session):
        ds = _ds(
            [
                {"doc_id": 0, "text": "a b a b", "lang": "en"},
                {"doc_id": 1, "text": "b a", "lang": "en"},
            ]
        )
        bigrams, v = train_bigram_lm(ds)
        bg = bigrams.to_pandas().set_index(["a", "b"])["c_ab"].to_dict()
        # doc0 bigrams: (a,b)x2 (b,a)x1; doc1: (b,a)x1
        assert bg == {("a", "b"): 2, ("b", "a"): 2}
        assert v == 2


class TestScore:
    def test_hand_computed(self, ray_session):
        rows = [
            {"doc_id": 0, "text": "a b a b", "lang": "en"},
            {"doc_id": 1, "text": "b a", "lang": "en"},
            {"doc_id": 2, "text": "a z", "lang": "de"},  # unseen bigram
        ]
        out = perplexity_scores(_ds(rows), ref_filter="en").set_index("doc_id")
        v = 2
        lp_ab = _lp_c(2, 2, v)
        lp_ba = _lp_c(2, 2, v)
        lp_az = _lp_c(0, 2, v)  # (a,z) unseen, ctx(a)=2
        assert out.loc[0, "n_bigrams"] == 3
        assert out.loc[0, "lp_sum_c"] == 2 * lp_ab + lp_ba
        assert out.loc[1, "lp_sum_c"] == lp_ba
        assert out.loc[2, "lp_sum_c"] == lp_az
        assert lp_az < lp_ab  # unseen bigram is less probable

    def test_short_docs_emit_no_row(self, ray_session):
        rows = [
            {"doc_id": 0, "text": "a b", "lang": "en"},
            {"doc_id": 1, "text": "solo", "lang": "en"},
            {"doc_id": 2, "text": "", "lang": "en"},
        ]
        out = perplexity_scores(_ds(rows))
        assert out["doc_id"].tolist() == [0]

    def test_unseen_context_uses_vocab_floor(self, ray_session):
        rows = [
            {"doc_id": 0, "text": "a b c", "lang": "en"},
            {"doc_id": 1, "text": "q q", "lang": "fr"},  # ctx(q)=0
        ]
        out = perplexity_scores(_ds(rows)).set_index("doc_id")
        assert out.loc[1, "lp_sum_c"] == _lp_c(0, 0, 3)

    def test_quality_ordering(self, ray_session):
        # fluent text (seen bigrams) must out-score shuffled garbage —
        # the property the CCNet perplexity filter exists for
        ref = "the quick brown fox jumps over the lazy dog"
        rows = [{"doc_id": i, "text": ref, "lang": "en"} for i in range(5)]
        rows.append({"doc_id": 10, "text": ref, "lang": "xx"})
        rows.append({"doc_id": 11, "text": "dog the over quick lazy fox the", "lang": "xx"})
        out = perplexity_scores(_ds(rows)).set_index("doc_id")
        mean10 = out.loc[10, "lp_sum_c"] / out.loc[10, "n_bigrams"]
        mean11 = out.loc[11, "lp_sum_c"] / out.loc[11, "n_bigrams"]
        assert mean10 > mean11

    def test_partition_invariant(self, ray_session):
        rng = np.random.RandomState(11)
        words = ["w%d" % i for i in range(20)]
        rows = [
            {
                "doc_id": i,
                "text": " ".join(rng.choice(words, size=rng.randint(2, 30))),
                "lang": "en" if i % 3 else "de",
            }
            for i in range(90)
        ]
        a = perplexity_scores(_ds(rows, parts=2))
        b = perplexity_scores(_ds(rows, parts=11))
        pd.testing.assert_frame_equal(a, b)

    def test_empty_reference_raises(self, ray_session):
        # V=0, c=0, ctx=0 -> ln(1/0)=inf would overflow the int64
        # micro-nats; the engine must refuse the degenerate model
        rows = [{"doc_id": 0, "text": "a b", "lang": "de"}]
        with pytest.raises(ValueError, match="vocab_size"):
            perplexity_scores(_ds(rows), ref_filter="en")
