"""χ² feature selection vs a sequential contingency-table replay."""

import math
import re
from collections import Counter

import numpy as np
import pandas as pd
import ray.data as rd

from gridfia_ray.text.chi2 import chi2_keywords

_WS = re.compile(r"\S+")


def brute_chi2(df: pd.DataFrame, k: int) -> pd.DataFrame:
    pres: Counter = Counter()
    n_c: Counter = Counter()
    for r in df.itertuples():
        toks = set(_WS.findall(r.text or ""))
        if not toks:
            continue
        n_c[r.source] += 1
        for t in toks:
            pres[(r.source, t)] += 1
    n_all = sum(n_c.values())
    df_t: Counter = Counter()
    for (lab, t), a in pres.items():
        df_t[t] += a
    rows = []
    for (lab, t), a in pres.items():
        b = df_t[t] - a
        c2 = n_c[lab] - a
        d = (n_all - n_c[lab]) - b
        num = float(n_all) * float(a * d - b * c2) ** 2
        den = float((a + b) * (c2 + d)) * float((a + c2) * (b + d))
        chi2 = num / den if den > 0 else 0.0
        rows.append(
            {"label": lab, "tok": t, "a": a,
             "chi2_u": math.floor(chi2 * 1e6 + 0.5)}
        )
    out = pd.DataFrame(rows).sort_values(
        ["label", "chi2_u", "tok"], ascending=[True, False, True]
    )
    out["rank"] = out.groupby("label").cumcount() + 1
    out = out[out["rank"] <= k].reset_index(drop=True)
    return out[["label", "tok", "rank", "a", "chi2_u"]].astype(
        {"a": np.int64, "chi2_u": np.int64, "rank": np.int64}
    )


def _docs():
    rng = np.random.RandomState(2)
    web = "click here buy now free offer the a of".split()
    wiki = "history science article reference the a of".split()
    rows = []
    for i in range(80):
        src, words = [("web", web), ("wiki", wiki)][i % 2]
        rows.append(
            {"doc_id": i, "source": src,
             "text": " ".join(rng.choice(words, rng.randint(3, 9)))}
        )
    return pd.DataFrame(rows)


class TestChi2:
    def test_matches_brute_force(self, ray_session):
        df = _docs()
        got = chi2_keywords(rd.from_pandas(df).repartition(4), k=5)
        want = brute_chi2(df, 5)
        pd.testing.assert_frame_equal(got, want)

    def test_partition_invariance(self, ray_session):
        df = _docs()
        a = chi2_keywords(rd.from_pandas(df).repartition(1), k=4)
        b = chi2_keywords(rd.from_pandas(df).repartition(7), k=4)
        pd.testing.assert_frame_equal(a, b)

    def test_discriminative_tokens_win(self, ray_session):
        df = _docs()
        got = chi2_keywords(rd.from_pandas(df), k=3)
        web_top = set(got[got["label"] == "web"]["tok"])
        # class-exclusive vocabulary outranks the shared stopwords
        assert web_top & {"click", "buy", "free", "offer", "here", "now"}
        assert "the" not in web_top
