"""Bigram language-model quality scoring — the CCNet-style pre-training
filter (Wenzek et al. 2020: score each document by the perplexity of a
reference-corpus LM; low-quality text scores high perplexity). The
reference repo has no text stack at all; this is SURVEY §2.9 text-family
scope built LLM-data-plane-first.

Model: add-one (Laplace) smoothed conditional bigram LM trained on a
reference slice of the corpus itself (e.g. ``lang == 'en'``):

    p(b | a) = (c(a,b) + 1) / (ctx(a) + V)

with ``c(a,b)`` the reference bigram count, ``ctx(a) = Σ_b c(a,b)``
the context count, and ``V`` the reference's distinct-token vocabulary
size. Unseen bigrams/contexts fall out naturally (c=0, ctx=0).

Exactness contract: each bigram's log-probability is quantized to
integer micro-nats, ``lp_c = floor(1e6·ln(p) + 0.5)``, BEFORE any
summation, so a document's ``(lp_sum_c, n_bigrams)`` is order-free
int64 arithmetic — bit-exact across partitionings and reproducible by
an ANSI-SQL oracle running the identical expression. Perplexity is
``exp(-lp_sum_c / (1e6 · n_bigrams))``, derivable by the caller.

Scale shape (10^12 docs), four exchanges total:

  * training: per-batch bigram combiners → ONE bucketed keyed sum
    (the model is a hash-partitioned (a, b, c_ab) dataset, never
    driver state, never broadcast) + one distinct-token exchange for
    the scalar V.
  * scoring: per-DOC-BIGRAM rows (doc_id, a, b, k) co-bucketed with
    the model rows on ``a`` — every model row for a context lands in
    that context's bucket, so ``ctx(a)`` is a LOCAL per-bucket sum
    (it never exists as a table), the (a,b) merge is a local
    vectorized pandas merge, and the bucket pre-aggregates per doc_id
    before ONE final per-doc keyed sum. No Dataset.join (it rejects
    the schema-less empty blocks bucketed aggregations emit for empty
    buckets), no assumption the LM fits anywhere. Skew bound: one
    bucket holds every model+doc row of its hottest context ``a`` —
    the natural-language context distribution is Zipfian but each row
    is a distinct-bigram partial, capping a bucket at
    O(distinct bigrams of its contexts).
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
) -> tuple[rd.Dataset, int]:
    """(bigram table (a, b, c_ab), vocab size V) from one pass over the
    reference slice. The table stays distributed; V is the only scalar
    that reaches the driver. Context counts need no table of their own:
    ``ctx(a) = Σ_b c_ab`` is summed locally inside the scoring exchange
    (which buckets on ``a``)."""
    from gridfia_ray.stages.agg_util import bucketed_agg

    def partial(batch: pa.Table) -> pa.Table:
        return _doc_bigram_rows(batch, text_col, with_doc=False)

    rows = ref_docs.map_batches(partial, batch_format="pyarrow")
    bigrams = bucketed_agg(rows, ["a", "b"], {"c_ab": ("k", "sum")}, n_buckets=32)

    def tok_partial(batch: pa.Table) -> pa.Table:
        s: set[str] = set()
        for t in batch[text_col].to_pylist():
            s.update(_WS.findall(t or ""))
        return pa.table(
            {
                "tok": pa.array(sorted(s), pa.string()),
                "one": pa.array(np.ones(len(s), np.int64)),
            }
        )

    distinct = bucketed_agg(
        ref_docs.map_batches(tok_partial, batch_format="pyarrow"),
        ["tok"],
        {"n": ("one", "max")},
        n_buckets=32,
    )
    return bigrams, int(distinct.count())


def score_perplexity(
    docs: rd.Dataset,
    bigrams: rd.Dataset,
    vocab_size: int,
    text_col: str = "text",
    n_buckets: int = 32,
) -> rd.Dataset:
    """Per-doc (doc_id, n_bigrams, lp_sum_c) via ONE exchange keyed on
    the context token ``a`` (doc-bigram rows co-bucketed with model
    rows; ctx sums, the (a,b) merge, the micro-nat quantization and a
    per-doc pre-aggregation all run inside the bucket) plus one final
    per-doc keyed sum. Docs with fewer than two tokens emit no row (no
    bigram evidence — the caller's filter policy decides their fate,
    not a fabricated score)."""
    from gridfia_ray.stages.agg_util import bucketed_agg, bucketed_bucket_map

    if vocab_size <= 0:
        # V=0 means an empty reference corpus: every denominator could
        # be 0 and ln((c+1)/0)=inf would overflow the int64 micro-nats
        raise ValueError(
            "score_perplexity: vocab_size must be positive — the "
            "reference slice produced no tokens (wrong ref_filter?)"
        )

    union_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("a", pa.string()),
            ("b", pa.string()),
            ("k", pa.int64()),
            ("c_ab", pa.int64()),
            ("__side", pa.string()),
        ]
    )

    def doc_side(batch: pa.Table) -> pa.Table:
        r = _doc_bigram_rows(batch, text_col, with_doc=True)
        n = r.num_rows
        return pa.table(
            {
                "doc_id": r["doc_id"],
                "a": r["a"],
                "b": r["b"],
                "k": r["k"],
                # sentinel, not null: a nullable int64 column becomes
                # float64 in the pandas bucket consumer (bad ≥ 2^53)
                "c_ab": pa.array(np.full(n, -1, np.int64)),
                "__side": pa.array(["d"] * n, pa.string()),
            },
            schema=union_schema,
        )

    def model_side(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "doc_id": pa.array(np.full(n, -1, np.int64)),
                "a": batch["a"],
                "b": batch["b"],
                "k": pa.array(np.full(n, -1, np.int64)),
                "c_ab": batch["c_ab"],
                "__side": pa.array(["m"] * n, pa.string()),
            },
            schema=union_schema,
        )

    tagged = docs.map_batches(doc_side, batch_format="pyarrow").union(
        bigrams.map_batches(model_side, batch_format="pyarrow")
    )
    V = float(vocab_size)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        m = g[g["__side"] == "m"]
        d = g[g["__side"] == "d"]
        if len(d) == 0:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series(dtype=np.int64),
                    "n_bigrams": pd.Series(dtype=np.int64),
                    "lp_sum_c": pd.Series(dtype=np.int64),
                }
            )
        ctx = m.groupby("a")["c_ab"].sum()  # local: bucket holds ALL of a's model rows
        d = d.merge(m[["a", "b", "c_ab"]], on=["a", "b"], how="left", suffixes=("", "_m"))
        c_ab = d["c_ab_m"].fillna(0).to_numpy(np.float64)
        ctx_a = ctx.reindex(d["a"]).fillna(0).to_numpy(np.float64)
        k = d["k"].to_numpy(np.int64)
        lp_c = np.floor(1e6 * np.log((c_ab + 1.0) / (ctx_a + V)) + 0.5).astype(np.int64)
        out = pd.DataFrame(
            {
                "doc_id": d["doc_id"].to_numpy(np.int64),
                "n_bigrams": k,
                "lp_sum_c": lp_c * k,
            }
        )
        return out.groupby("doc_id", as_index=False).sum()

    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("n_bigrams", pa.int64()), ("lp_sum_c", pa.int64())]
    )
    partials = bucketed_bucket_map(
        tagged, ["a"], per_bucket, n_buckets=n_buckets, out_schema=out_schema
    )
    return bucketed_agg(
        partials,
        ["doc_id"],
        {"n_bigrams": ("n_bigrams", "sum"), "lp_sum_c": ("lp_sum_c", "sum")},
        n_buckets=16,
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
    bigrams, v = train_bigram_lm(ref, text_col)
    out = score_perplexity(docs, bigrams, v, text_col).to_pandas()
    out = out.astype(
        {"doc_id": np.int64, "n_bigrams": np.int64, "lp_sum_c": np.int64}
    )
    return out.sort_values("doc_id", ignore_index=True)
