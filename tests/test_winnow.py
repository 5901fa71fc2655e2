"""Winnowing fingerprints vs an explicit per-window replay, the shared-
substring guarantee, and cross-doc matching."""

import hashlib

import numpy as np
import pandas as pd
import ray.data as rd

from gridfia_ray.text.winnow import winnow_fingerprints, winnow_matches


def brute_winnow(text: str, k: int, w: int):
    m = len(text) - k + 1
    if m < 1:
        return []
    hexes = [
        hashlib.md5(text[i : i + k].encode("utf-8")).hexdigest() for i in range(m)
    ]
    sel = set()
    n_windows = max(1, m - w + 1)
    for s in range(n_windows):
        window = hexes[s : s + w]
        mn = min(window)
        # rightmost occurrence of the min
        p = s + max(j for j, h in enumerate(window) if h == mn)
        sel.add((p + 1, hexes[p]))
    return sorted(sel)


def _docs():
    rng = np.random.RandomState(3)
    rows = []
    for i in range(40):
        n = rng.randint(5, 120)
        rows.append(
            {"doc_id": i,
             "text": "".join(rng.choice(list("abcdefg "), n))}
        )
    rows.append({"doc_id": 40, "text": ""})
    rows.append({"doc_id": 41, "text": "abc"})  # shorter than k
    return pd.DataFrame(rows)


K, W = 8, 4


class TestWinnow:
    def test_matches_brute_force(self, ray_session):
        df = _docs()
        got = (
            winnow_fingerprints(rd.from_pandas(df).repartition(4), k=K, w=W)
            .to_pandas()
            .sort_values(["doc_id", "pos"])
        )
        for doc_id, grp in got.groupby("doc_id"):
            want = brute_winnow(df.loc[df["doc_id"] == doc_id, "text"].iloc[0], K, W)
            assert list(zip(grp["pos"], grp["h"])) == want, doc_id
        # every doc with >= k chars fingerprints; shorter ones don't
        long_ids = {r.doc_id for r in df.itertuples() if len(r.text) >= K}
        assert set(got["doc_id"]) == long_ids

    def test_shared_substring_guarantee(self, ray_session):
        # any shared run of >= w + k - 1 chars shares >= 1 fingerprint
        shared = "theansweris42always"  # len 19 >= 8 + 4 - 1
        df = pd.DataFrame(
            [
                {"doc_id": 0, "text": "xxxx" + shared + "qqqqqq"},
                {"doc_id": 1, "text": "zzzzzzzzz" + shared + "pp"},
            ]
        )
        fp = winnow_fingerprints(rd.from_pandas(df), k=K, w=W).to_pandas()
        h0 = set(fp[fp["doc_id"] == 0]["h"])
        h1 = set(fp[fp["doc_id"] == 1]["h"])
        assert h0 & h1

    def test_matches_pipeline(self, ray_session):
        shared = "copiedparagraphhere!"
        df = pd.DataFrame(
            [
                {"doc_id": 0, "text": "aaaa" + shared + "bbb"},
                {"doc_id": 1, "text": "cccccc" + shared + "d"},
                {"doc_id": 2, "text": "completely unrelated words only"},
            ]
        )
        m = winnow_matches(rd.from_pandas(df), k=K, w=W).to_pandas()
        pairs = set(zip(m["doc_a"], m["doc_b"]))
        assert (0, 1) in pairs
        assert not any(2 in p for p in pairs)

    def test_density_bound(self, ray_session):
        # expected density ~ 2/(w+1); assert a loose upper bound
        rng = np.random.RandomState(7)
        text = "".join(rng.choice(list("abcdefghij"), 2000))
        df = pd.DataFrame([{"doc_id": 0, "text": text}])
        fp = winnow_fingerprints(rd.from_pandas(df), k=K, w=W).to_pandas()
        m = len(text) - K + 1
        assert len(fp) <= m * 2.5 / (W + 1) + 2
        assert len(fp) >= m / W - 2  # at least one per window stride
