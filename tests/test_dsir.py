"""DSIR hashed-unigram importance weights vs a sequential replay with
identical quantization; partition invariance; target-slice separation."""

import hashlib
import math
import re
from collections import Counter

import numpy as np
import pandas as pd
import ray.data as rd

from gridfia_ray.text.dsir import N_BUCKETS, dsir_weights

_WS = re.compile(r"\S+")


def _bucket(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:3], 16)


def brute_dsir(df: pd.DataFrame, target: str = "en") -> pd.DataFrame:
    raw: Counter = Counter()
    tgt: Counter = Counter()
    for r in df.itertuples():
        for tok in _WS.findall(r.text or ""):
            b = _bucket(tok)
            raw[b] += 1
            if r.lang == target:
                tgt[b] += 1
    t_raw, t_tgt = sum(raw.values()), sum(tgt.values())
    lp = {
        b: (
            math.floor(1e6 * math.log((tgt[b] + 1) / (t_tgt + N_BUCKETS)) + 0.5)
            - math.floor(1e6 * math.log((raw[b] + 1) / (t_raw + N_BUCKETS)) + 0.5)
        )
        for b in raw
    }
    rows = []
    for r in df.sort_values("doc_id").itertuples():
        toks = _WS.findall(r.text or "")
        if not toks:
            continue
        w = sum(lp[_bucket(tok)] for tok in toks)
        rows.append({"doc_id": r.doc_id, "n_toks": len(toks), "w_c": w})
    return pd.DataFrame(rows)


def _docs():
    rng = np.random.RandomState(5)
    en = "the of and to in for is on that by with as at".split()
    xx = "zog blarp wizzle frum quax nerp glomp trazz".split()
    rows = []
    for i in range(60):
        lang, words = [("en", en), ("xx", xx)][i % 2]
        rows.append(
            {
                "doc_id": i,
                "text": " ".join(rng.choice(words, rng.randint(4, 15))),
                "lang": lang,
            }
        )
    rows.append({"doc_id": 60, "text": "", "lang": "en"})
    return pd.DataFrame(rows)


class TestDsir:
    def test_matches_brute_force(self, ray_session):
        df = _docs()
        got = dsir_weights(rd.from_pandas(df).repartition(4))
        want = brute_dsir(df)
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.reset_index(drop=True)
        )

    def test_partition_invariance(self, ray_session):
        df = _docs()
        a = dsir_weights(rd.from_pandas(df).repartition(1))
        b = dsir_weights(rd.from_pandas(df).repartition(6))
        pd.testing.assert_frame_equal(a, b)

    def test_target_docs_score_higher(self, ray_session):
        df = _docs()
        got = dsir_weights(rd.from_pandas(df))
        lang = dict(zip(df["doc_id"], df["lang"]))
        per_tok = got["w_c"] / got["n_toks"]
        en = [p for d, p in zip(got["doc_id"], per_tok) if lang[d] == "en"]
        xx = [p for d, p in zip(got["doc_id"], per_tok) if lang[d] == "xx"]
        assert min(en) > max(xx)  # disjoint vocabularies separate cleanly
