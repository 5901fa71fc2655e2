"""Benchmark decontamination: planted-contamination oracles."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from gridfia_ray.text.decontaminate import (
    SnippetScanner,
    bench_ngram_hashes,
    ngram_decontaminate,
    snippet_hits,
)

WORDS = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima".split()


def _corpus(rng, n=60, planted=None):
    texts = []
    for i in range(n):
        toks = [WORDS[j] for j in rng.randint(0, len(WORDS), 30)]
        texts.append(" ".join(toks))
    for i, snippet in planted or []:
        texts[i] = texts[i][:50] + " " + snippet + " " + texts[i][50:]
    return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64), "text": texts})


class TestSnippetHits:
    def test_planted_matches_brute_force(self, ray_session):
        rng = np.random.RandomState(7)
        snips = ["bravo charlie delta echo", "kilo lima alpha", "zebra xylophone"]
        df = _corpus(rng, 60, planted=[(3, snips[0]), (17, snips[0]), (17, snips[1]), (42, snips[1])])
        got = (
            snippet_hits(rd.from_pandas(df).repartition(4), snips)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        want = []
        for _, r in df.iterrows():
            n = sum(1 for s in snips if s in r["text"])
            if n:
                want.append((r["doc_id"], n))
        want = pd.DataFrame(want, columns=["doc_id", "n_hits"]).astype(np.int64)
        pd.testing.assert_frame_equal(got.astype(np.int64), want)
        assert set(want["doc_id"]) >= {3, 17, 42}  # planted docs found
        assert int(want.loc[want["doc_id"] == 17, "n_hits"].iloc[0]) == 2

    def test_keep_clean_returns_all(self, ray_session):
        df = _corpus(np.random.RandomState(1), 20)
        got = snippet_hits(rd.from_pandas(df), ["zebra"], keep_clean=True).to_pandas()
        assert len(got) == 20 and (got["n_hits"] == 0).all()

    def test_duplicate_snippets_count_once(self, ray_session):
        df = pd.DataFrame({"doc_id": [0], "text": ["alpha bravo charlie"]})
        got = snippet_hits(rd.from_pandas(df), ["bravo", "bravo", "alpha"]).to_pandas()
        assert got["n_hits"].tolist() == [2]

    def test_empty_snippet_rejected(self, ray_session):
        with pytest.raises(ValueError, match="empty"):
            SnippetScanner([""])


def _brute_ngrams(text, n=8):
    toks = text.lower().split()
    if not toks:
        return set()
    if len(toks) < n:
        return {tuple(toks)}
    return {tuple(toks[i : i + n]) for i in range(len(toks) - n + 1)}


class TestNgramDecontaminate:
    def test_planted_matches_brute_force(self, ray_session):
        rng = np.random.RandomState(11)
        bench_texts = [
            "bravo charlie delta echo foxtrot golf hotel india juliet",
            "lima alpha bravo charlie delta echo foxtrot golf",
        ]
        planted = [(5, bench_texts[0]), (23, bench_texts[1]), (40, bench_texts[0])]
        df = _corpus(rng, 50, planted=planted)
        bench = bench_ngram_hashes(bench_texts, n=8)
        got = (
            ngram_decontaminate(rd.from_pandas(df).repartition(4), bench, n=8, keep_clean=True)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        bench_set = set()
        for t in bench_texts:
            bench_set |= _brute_ngrams(t, 8)
        for _, r in got.iterrows():
            grams = _brute_ngrams(df.loc[df["doc_id"] == r["doc_id"], "text"].iloc[0], 8)
            assert r["n_ngrams"] == len(grams)
            assert r["n_hits"] == len(grams & bench_set)
        hit_docs = set(got.loc[got["n_hits"] > 0, "doc_id"])
        assert hit_docs >= {5, 23, 40}

    def test_short_doc_one_gram(self, ray_session):
        df = pd.DataFrame({"doc_id": [0, 1], "text": ["alpha bravo", "alpha bravo"]})
        bench = bench_ngram_hashes(["alpha bravo"], n=8)
        got = (
            ngram_decontaminate(rd.from_pandas(df), bench, n=8, keep_clean=True)
            .to_pandas()
            .sort_values("doc_id")
        )
        assert got["n_ngrams"].tolist() == [1, 1]
        assert got["n_hits"].tolist() == [1, 1]

    def test_empty_bench_no_hits(self, ray_session):
        df = _corpus(np.random.RandomState(2), 10)
        got = ngram_decontaminate(
            rd.from_pandas(df), np.empty(0, np.uint64), keep_clean=True
        ).to_pandas()
        assert (got["n_hits"] == 0).all() and len(got) == 10
