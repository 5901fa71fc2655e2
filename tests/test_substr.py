"""ExactSubstr duplicate-span removal (text/substr.py) vs a sequential
brute-force replay, plus the structural edge cases the window/interval
machinery must get right."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from gridfia_ray.text.substr import substr_dedup_docs, substr_dup_spans

L = 4  # small window so tiny corpora exercise every path


def brute(docs: dict[int, str], min_len: int = L) -> dict[int, tuple[int, int, str]]:
    """Sequential replay: hash-free, string-keyed — the independent
    oracle (catches both keying and interval-union bugs)."""
    occ: dict[str, list[tuple[int, int]]] = {}
    for doc_id in sorted(docs):
        toks = docs[doc_id].split(" ")
        for i in range(len(toks) - min_len + 1):
            occ.setdefault(" ".join(toks[i : i + min_len]), []).append((doc_id, i + 1))
    out = {}
    cuts: dict[int, set[int]] = {d: set() for d in docs}
    for w, places in occ.items():
        if len(places) > 1:
            for doc_id, pos in sorted(places)[1:]:
                cuts[doc_id].update(range(pos, pos + min_len))
    for doc_id, text in docs.items():
        toks = text.split(" ")
        c = cuts[doc_id]
        kept = [t for j, t in enumerate(toks, start=1) if j not in c]
        out[doc_id] = (len(toks), len([j for j in c if j <= len(toks)]), " ".join(kept))
    return out


def run(docs: dict[int, str], min_len: int = L, **kw) -> dict[int, tuple[int, int, str]]:
    ds = rd.from_pandas(
        pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())})
    )
    df = substr_dedup_docs(ds, min_len=min_len, **kw).to_pandas()
    return {
        int(r.doc_id): (int(r.n_tokens), int(r.n_removed), r.text_clean)
        for r in df.itertuples()
    }


PLANTED = {
    1: "a b c d e f g h unique tail one",
    2: "x y a b c d e f g h other stuff here",  # shares an 8-token run with 1
    3: "p q r s p q r s p q r s",  # self-repetition within one doc
    4: "short doc",  # below the window length
    5: "m n o p q r different words entirely now",
}


class TestSubstrDedup:
    def test_matches_brute_force(self, ray_session):
        assert run(PLANTED) == brute(PLANTED)

    def test_spans_are_non_canonical_only(self, ray_session):
        docs = {1: "a b c d e", 2: "a b c d e"}
        ds = rd.from_pandas(pd.DataFrame({"doc_id": [1, 2], "text": list(docs.values())}))
        spans = substr_dup_spans(ds, min_len=4).to_pandas()
        # doc 1 is canonical for both windows; only doc 2's are cut
        assert set(spans["doc_id"]) == {2}
        assert sorted(spans["pos"]) == [1, 2]

    def test_identical_docs_second_emptied(self, ray_session):
        docs = {1: "a b c d", 2: "a b c d"}
        out = run(docs)
        assert out[1] == (4, 0, "a b c d")
        assert out[2] == (4, 4, "")

    def test_within_doc_repetition_cut(self, ray_session):
        out = run({3: PLANTED[3]})
        b = brute({3: PLANTED[3]})
        assert out == b
        assert out[3][1] > 0  # the repeated run inside one doc is cut

    def test_short_docs_pass_through(self, ray_session):
        out = run({4: "short doc", 5: "short doc"})
        # below min_len: no windows exist, so even identical docs survive
        assert out[4] == (2, 0, "short doc")
        assert out[5] == (2, 0, "short doc")

    def test_overlapping_windows_union_not_double_count(self, ray_session):
        # "a b c d e" duplicated -> windows at pos 1 and 2 overlap;
        # n_removed must be 5 (union), not 8
        docs = {1: "a b c d e tail one", 2: "z a b c d e tail two"}
        out = run(docs)
        b = brute(docs)
        assert out == b

    def test_partition_invariance(self, ray_session):
        rng = np.random.default_rng(7)
        vocab = list("abcdefghij")
        docs = {}
        for d in range(40):
            toks = [vocab[i] for i in rng.integers(0, len(vocab), 30)]
            docs[d] = " ".join(toks)
        a = run(docs, n_buckets=2)
        c = run(docs, n_buckets=16)
        assert a == c == brute(docs)

    def test_null_text_dropped(self, ray_session):
        ds = rd.from_pandas(
            pd.DataFrame({"doc_id": [1, 2], "text": ["a b c d e", None]})
        )
        df = substr_dedup_docs(ds, min_len=L).to_pandas()
        assert sorted(df["doc_id"]) == [1]

    def test_pos_overflow_raises(self, ray_session):
        big = " ".join(["t"] * 1_000_005)
        ds = rd.from_pandas(pd.DataFrame({"doc_id": [1], "text": [big]}))
        with pytest.raises(Exception, match="overflows"):
            substr_dedup_docs(ds, min_len=2).to_pandas()
