"""Multinomial Naive Bayes vs a sequential brute-force replay with the
identical micro-nat quantization, plus partition invariance and a
separability sanity check."""

import math
import re
from collections import Counter

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from gridfia_ray.text.nb import nb_classify

_WS = re.compile(r"\S+")


def brute_nb(df: pd.DataFrame) -> pd.DataFrame:
    toks = {
        r.doc_id: _WS.findall(r.text or "") for r in df.itertuples()
    }
    labels = dict(zip(df["doc_id"], df["lang"]))
    nonempty = [d for d, t in toks.items() if t]
    classes = sorted({labels[d] for d in nonempty})
    vocab = set()
    cnt: Counter = Counter()
    t_c: Counter = Counter()
    n_c: Counter = Counter()
    for d in nonempty:
        c = labels[d]
        n_c[c] += 1
        for tok in toks[d]:
            vocab.add(tok)
            cnt[(c, tok)] += 1
            t_c[c] += 1
    v = len(vocab)
    n_all = len(nonempty)
    rows = []
    for d in sorted(nonempty):
        best = None
        for c in classes:
            s = math.floor(1e6 * math.log(n_c[c] / n_all) + 0.5)
            for tok, k in Counter(toks[d]).items():
                lp = math.floor(
                    1e6 * math.log((cnt[(c, tok)] + 1) / (t_c[c] + v)) + 0.5
                )
                s += k * lp
            if best is None or s > best[1]:
                best = (c, s)
        rows.append({"doc_id": d, "pred": best[0], "score_c": best[1]})
    return pd.DataFrame(rows)


def _docs():
    rng = np.random.RandomState(0)
    en = "the quick brown fox jumps over lazy dog and runs home".split()
    de = "der schnelle braune fuchs springt ueber den faulen hund".split()
    fr = "le renard brun rapide saute par dessus le chien".split()
    rows = []
    for i in range(90):
        lang, words = [("en", en), ("de", de), ("fr", fr)][i % 3]
        n = rng.randint(3, 12)
        rows.append(
            {
                "doc_id": i,
                "text": " ".join(rng.choice(words, n)),
                "lang": lang,
            }
        )
    rows.append({"doc_id": 90, "text": "", "lang": "en"})  # no evidence
    rows.append({"doc_id": 91, "text": "   ", "lang": "de"})
    return pd.DataFrame(rows)


class TestNaiveBayes:
    def test_matches_brute_force(self, ray_session):
        df = _docs()
        got = nb_classify(rd.from_pandas(df).repartition(4))
        want = brute_nb(df)
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.reset_index(drop=True)
        )

    def test_partition_invariance(self, ray_session):
        df = _docs()
        a = nb_classify(rd.from_pandas(df).repartition(1))
        b = nb_classify(rd.from_pandas(df).repartition(7))
        pd.testing.assert_frame_equal(a, b)

    def test_separable_accuracy(self, ray_session):
        df = _docs()
        got = nb_classify(rd.from_pandas(df))
        truth = dict(zip(df["doc_id"], df["lang"]))
        acc = np.mean([truth[d] == p for d, p in zip(got["doc_id"], got["pred"])])
        assert acc > 0.95  # distinct vocabularies are trivially separable
        assert 90 not in set(got["doc_id"])  # empty docs emit no row
