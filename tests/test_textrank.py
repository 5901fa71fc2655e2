"""TextRank keyword scoring vs a sequential PageRank replay on the
same word graph."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from gridfia_ray.text.textrank import textrank_scores

DOCS = {
    1: "ray data engine ray data pipeline",
    2: "engine pipeline engine data",
    3: "solo",  # isolated word: never enters the graph
}


def _brute(docs, n_iters=3):
    und = set()
    for text in docs.values():
        toks = text.split(" ")
        for a, b in zip(toks, toks[1:]):
            if a != b:
                und.add((a, b))
                und.add((b, a))
    vocab = sorted({a for a, _ in und})
    wid = {w: i + 1 for i, w in enumerate(vocab)}
    edges = sorted((wid[a], wid[b]) for a, b in und)
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    nn = len(deg)
    scale = 10**12
    r = {v: scale // nn for v in deg}
    for _ in range(n_iters):
        nxt = {v: (15 * scale) // (100 * nn) for v in deg}
        for s, d in edges:
            nxt[d] += (85 * r[s]) // (100 * deg[s])
        r = nxt
    return {w: r[wid[w]] for w in vocab}


class TestTextRank:
    def test_matches_sequential_replay(self, ray_session):
        docs = rd.from_pandas(
            pd.DataFrame({"doc_id": list(DOCS), "text": list(DOCS.values())})
        )
        out = textrank_scores(docs, n_buckets=4)
        got = dict(zip(out["word"], out["rank_c"]))
        assert got == _brute(DOCS)
        assert "solo" not in got  # isolated words stay out of the graph

    def test_vocab_bound_raises(self, ray_session):
        docs = rd.from_pandas(
            pd.DataFrame({"doc_id": [1], "text": ["a b c d e f"]})
        )
        with pytest.raises(ValueError, match="max_vocab"):
            textrank_scores(docs, max_vocab=3)

    def test_empty_corpus(self, ray_session):
        docs = rd.from_pandas(pd.DataFrame({"doc_id": [1], "text": ["solo"]}))
        out = textrank_scores(docs)
        assert len(out) == 0
