"""TextRank keyword scoring (Mihalcea & Tarau, EMNLP 2004): PageRank
over the word co-occurrence graph — the classic unsupervised keyword
extractor, composed from pieces this engine already proves exact:

1. adjacent-token pairs explode per batch (local set-dedup combiner),
   then ONE bucketed exchange dedups the mirrored directed edge table
   (``stages.dedup_util.bucketed_distinct``);
2. the vocabulary (edge endpoints) is by Heaps' law ≪ corpus size —
   it folds to the driver under an enforced bound, sorts, and
   broadcasts as the word→id map (1-based rank in the sorted vocab,
   reproduced in SQL as ``ROW_NUMBER() OVER (ORDER BY w)``);
3. ``pipelines.graph.pagerank`` runs its integer-exact fused Pregel
   supersteps over the id edges (ranks in integer mass units with
   floor-division contributions — order-free, so the unrolled SQL
   oracle bit-matches).

Tokenization is ``split(' ')`` (≡ DuckDB ``string_split``), self-loops
dropped; isolated words (never adjacent to a different word) don't
enter the graph, matching the SQL construction.

No counterpart in the GridFIA reference (build brief: text-analysis
family).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd


def textrank_scores(
    docs: rd.Dataset,
    n_iters: int = 3,
    n_buckets: int = 64,
    max_vocab: int = 1_000_000,
) -> pd.DataFrame:
    """(word, rank_c) for every word in the co-occurrence graph."""
    import ray

    from gridfia_ray.pipelines.graph import pagerank
    from gridfia_ray.stages.dedup_util import bucketed_distinct

    def pairs(batch: pd.DataFrame) -> pd.DataFrame:
        seen: set[tuple[str, str]] = set()
        for text in batch["text"]:
            if text is None or (isinstance(text, float) and np.isnan(text)):
                continue
            toks = text.split(" ")
            for a, b in zip(toks, toks[1:]):
                if a != b:
                    seen.add((a, b))
                    seen.add((b, a))
        if not seen:
            return pd.DataFrame({"wa": pd.Series(dtype=str),
                                 "wb": pd.Series(dtype=str)})
        wa, wb = zip(*seen)
        return pd.DataFrame({"wa": list(wa), "wb": list(wb)})

    edges_w = bucketed_distinct(
        docs.map_batches(pairs, batch_format="pandas"),
        ["wa", "wb"],
        n_buckets=n_buckets,
    ).materialize()

    # vocabulary: every edge source (mirrored edges ⇒ sources cover all
    # endpoints). Heaps' law keeps this ≪ corpus; the bound is enforced
    # BEFORE the driver pull.
    vocab_ds = bucketed_distinct(
        edges_w.map_batches(
            lambda b: pd.DataFrame({"w": b["wa"]}), batch_format="pandas"
        ),
        ["w"],
        n_buckets=n_buckets,
    )
    n_vocab = vocab_ds.count()
    if n_vocab == 0:
        return pd.DataFrame({"word": pd.Series(dtype=str),
                             "rank_c": pd.Series(dtype=np.int64)})
    if n_vocab > max_vocab:
        raise ValueError(
            f"textrank: vocabulary {n_vocab} exceeds max_vocab="
            f"{max_vocab} — raise the bound or pre-filter tokens"
        )
    vocab = sorted(vocab_ds.to_pandas()["w"])
    wid = {w: i + 1 for i, w in enumerate(vocab)}  # 1-based sorted rank
    wid_ref = ray.put(wid)

    def to_ids(batch: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(wid_ref)
        return pd.DataFrame(
            {
                "src": batch["wa"].map(m).astype(np.int64),
                "dst": batch["wb"].map(m).astype(np.int64),
            }
        )

    pr = pagerank(
        edges_w.map_batches(to_ids, batch_format="pandas"),
        n_iters=n_iters,
        n_buckets=min(n_buckets, 16),
    ).to_pandas()  # vocab-sized
    inv = {i: w for w, i in wid.items()}
    out = pd.DataFrame(
        {
            "word": [inv[int(n)] for n in pr["node"]],
            "rank_c": pr["rank_c"].astype(np.int64),
        }
    )
    return out.sort_values("word").reset_index(drop=True)
