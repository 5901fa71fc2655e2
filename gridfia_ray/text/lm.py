"""Bigram language-model quality scoring — the CCNet-style pre-training
filter (Wenzek et al. 2020: score each document by the perplexity of a
reference-corpus LM; low-quality text scores high perplexity). The
reference repo has no text stack at all; this is SURVEY §2.9 text-family
scope built LLM-data-plane-first.

Model: add-one (Laplace) smoothed conditional bigram LM trained on a
reference slice of the corpus itself (e.g. ``lang == 'en'``):

    p(b | a) = (c(a,b) + 1) / (ctx(a) + V)

with ``c(a,b)`` the reference bigram count, ``ctx(a)`` the count of
bigrams whose left token is ``a`` (the context count), and ``V`` the
reference's distinct-token vocabulary size. Unseen bigrams/contexts
fall out naturally (c=0, ctx=0).

Exactness contract: each bigram's log-probability is quantized to
integer micro-nats, ``lp_c = floor(1e6·ln(p) + 0.5)``, BEFORE any
summation, so a document's ``(lp_sum_c, n_bigrams)`` is order-free
int64 arithmetic — bit-exact across partitionings and reproducible by
an ANSI-SQL oracle running the identical expression. Perplexity is
``exp(-lp_sum_c / (1e6 · n_bigrams))``, derivable by the caller.

Scale shape (10^12 docs):

  * training is ONE pass over the reference slice: per-batch bigram /
    context / distinct-token combiners feeding bucketed keyed sums —
    the model tables are hash-partitioned datasets, never driver
    state, never broadcast.
  * scoring is per-DOC-BIGRAM rows (doc_id, a, b, k) flowing through
    two hash-shuffle left joins (key (a,b) against the bigram table,
    key (a) against the context table) and one bucketed per-doc sum —
    three exchanges, each carrying one row per DISTINCT bigram per doc
    (the per-doc Counter is itself a combiner). No driver folds, no
    assumption that the LM fits anywhere.
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

_WS = re.compile(r"\S+")


def _doc_bigram_rows(batch: pa.Table, text_col: str, with_doc: bool) -> pa.Table:
    """(doc_id?, a, b, k) rows — one per distinct bigram per doc."""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False) if with_doc else None
    d_out: list[int] = []
    a_out: list[str] = []
    b_out: list[str] = []
    k_out: list[int] = []
    for i, t in enumerate(batch[text_col].to_pylist()):
        toks = _WS.findall(t or "")
        if len(toks) < 2:
            continue
        c = Counter(zip(toks[:-1], toks[1:]))
        for (a, b), k in sorted(c.items()):
            if with_doc:
                d_out.append(int(ids[i]))
            a_out.append(a)
            b_out.append(b)
            k_out.append(k)
    cols = {}
    if with_doc:
        cols["doc_id"] = pa.array(d_out, pa.int64())
    cols["a"] = pa.array(a_out, pa.string())
    cols["b"] = pa.array(b_out, pa.string())
    cols["k"] = pa.array(k_out, pa.int64())
    return pa.table(cols)


def train_bigram_lm(
    ref_docs: rd.Dataset, text_col: str = "text"
) -> tuple[rd.Dataset, rd.Dataset, int]:
    """(bigram table (a, b, c_ab), context table (a, ctx), vocab size V)
    from one pass over the reference slice. The tables stay distributed;
    V is the only scalar that reaches the driver."""
    from gridfia_ray.stages.agg_util import bucketed_agg

    def partial(batch: pa.Table) -> pa.Table:
        return _doc_bigram_rows(batch, text_col, with_doc=False)

    rows = ref_docs.map_batches(partial, batch_format="pyarrow").materialize()
    bigrams = bucketed_agg(rows, ["a", "b"], {"c_ab": ("k", "sum")}, n_buckets=32)
    contexts = bucketed_agg(rows, ["a"], {"ctx": ("k", "sum")}, n_buckets=32)

    def tok_partial(batch: pa.Table) -> pa.Table:
        s: set[str] = set()
        for t in batch[text_col].to_pylist():
            s.update(_WS.findall(t or ""))
        return pa.table({"tok": pa.array(sorted(s), pa.string())})

    distinct = bucketed_agg(
        ref_docs.map_batches(tok_partial, batch_format="pyarrow")
        .map_batches(
            lambda b: b.append_column("one", pa.array(np.ones(b.num_rows, np.int64))),
            batch_format="pyarrow",
        ),
        ["tok"],
        {"n": ("one", "max")},
        n_buckets=32,
    )
    v = int(distinct.count())
    return bigrams, contexts, v


def score_perplexity(
    docs: rd.Dataset,
    bigrams: rd.Dataset,
    contexts: rd.Dataset,
    vocab_size: int,
    text_col: str = "text",
) -> rd.Dataset:
    """Per-doc (doc_id, n_bigrams, lp_sum_c) via two hash-shuffle left
    joins and a bucketed per-doc sum. Docs with fewer than two tokens
    emit no row (no bigram evidence — the caller's filter policy
    decides their fate, not a fabricated score)."""
    from gridfia_ray.stages.agg_util import (
        bucketed_agg,
        bucketed_left_attach,
        to_arrow,
    )

    if vocab_size <= 0:
        # V=0 means an empty reference corpus: every denominator could
        # be 0 and ln((c+1)/0)=inf would overflow the int64 micro-nats
        raise ValueError(
            "score_perplexity: vocab_size must be positive — the "
            "reference slice produced no tokens (wrong ref_filter?)"
        )

    def partial(batch: pa.Table) -> pa.Table:
        return _doc_bigram_rows(batch, text_col, with_doc=True)

    doc_rows = docs.map_batches(partial, batch_format="pyarrow")
    # two co-bucketed left attaches (NOT Dataset.join: the model tables
    # come out of bucketed aggregations whose empty buckets are
    # schema-less blocks that Dataset.join rejects; the bucketed
    # exchange never sees them)
    sch_rows = pa.schema(
        [("doc_id", pa.int64()), ("a", pa.string()), ("b", pa.string()), ("k", pa.int64())]
    )
    sch_big = pa.schema(
        [("a", pa.string()), ("b", pa.string()), ("c_ab", pa.int64())]
    )
    sch_ctx = pa.schema([("a", pa.string()), ("ctx", pa.int64())])
    j1 = bucketed_left_attach(doc_rows, bigrams, ["a", "b"], sch_rows, sch_big)
    sch_j1 = pa.schema(list(sch_rows) + [pa.field("c_ab", pa.int64())])
    j2 = bucketed_left_attach(j1, contexts, ["a"], sch_j1, sch_ctx)

    V = float(vocab_size)

    def lp(batch: pd.DataFrame) -> pa.Table:
        c_ab = batch["c_ab"].fillna(0).to_numpy(np.float64)
        ctx = batch["ctx"].fillna(0).to_numpy(np.float64)
        k = batch["k"].to_numpy(np.int64)
        lp_c = np.floor(
            1e6 * np.log((c_ab + 1.0) / (ctx + V)) + 0.5
        ).astype(np.int64)
        return to_arrow(
            pd.DataFrame(
                {
                    "doc_id": batch["doc_id"].to_numpy(np.int64),
                    "n_bigrams": k,
                    "lp_sum_c": lp_c * k,
                }
            )
        )

    scored = j2.map_batches(lp, batch_format="pandas")
    return bucketed_agg(
        scored,
        ["doc_id"],
        {"n_bigrams": ("n_bigrams", "sum"), "lp_sum_c": ("lp_sum_c", "sum")},
        n_buckets=32,
    )


def perplexity_scores(
    docs: rd.Dataset,
    ref_filter: str = "en",
    ref_col: str = "lang",
    text_col: str = "text",
) -> pd.DataFrame:
    """End-to-end CCNet-shaped scoring: train on the ``ref_col ==
    ref_filter`` slice, score every document. Returns (doc_id,
    n_bigrams, lp_sum_c) sorted by doc_id."""
    import pyarrow.compute as pc

    ref = docs.map_batches(
        lambda b: b.filter(pc.equal(b[ref_col], ref_filter)),
        batch_format="pyarrow",
    )
    bigrams, contexts, v = train_bigram_lm(ref, text_col)
    out = score_perplexity(docs, bigrams, contexts, v, text_col).to_pandas()
    out = out.astype(
        {"doc_id": np.int64, "n_bigrams": np.int64, "lp_sum_c": np.int64}
    )
    return out.sort_values("doc_id", ignore_index=True)
