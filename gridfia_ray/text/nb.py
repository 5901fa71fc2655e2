"""Distributed multinomial Naive Bayes text classification — the
classic fastText-niche corpus router (domain / language / quality
classification of pre-training data; Manning, Raghavan & Schütze IR
ch. 13). Train token counts per class over the labeled corpus, score
every document, predict argmax. The reference repo has no text stack;
this extends the SURVEY §2.9 text family with the model-training shape
(counts ARE the model — training is a groupby, exactly the NB property
that makes it the canonical distributed classifier).

Model, add-one (Laplace) smoothed:

    p(tok | c) = (cnt(c, tok) + 1) / (T_c + V)
    score(d, c) = ln p(c) + Σ_tok k_tok(d) · ln p(tok | c)

with ``T_c`` the class's total token count, ``V`` the training
vocabulary size and ``p(c) = N_c / N`` the document-count prior.

Exactness contract (the lm.py policy): every log term is quantized to
integer micro-nats — ``lp = floor(1e6·ln(·) + 0.5)`` — BEFORE any
summation, so scores are order-free int64 arithmetic, bit-exact across
partitionings and reproducible by an ANSI-SQL oracle running the
identical expression. Ties break toward the lexicographically smallest
class.

Scale shape (10⁹ docs, unbounded vocab, FEW classes — the one genuine
smallness assumption, |classes| ≤ ~10³):

  * training: per-batch (label, tok, k) combiners → ONE bucketed keyed
    sum; the model is a hash-partitioned dataset, never driver state.
  * scalars: T_c / N_c / V are tiny aggregates (|classes| rows, one
    int) — the only values that reach the driver.
  * scoring: doc-token rows co-bucketed with model rows on ``tok``;
    the (tok, class) lookup, micro-nat quantization and per-doc
    pre-aggregation run inside the bucket, emitting ONE wide int64 row
    per (bucket, doc): (doc_id, s_0 … s_{C−1}). One final per-doc
    keyed sum + a pure argmax map. Unseen tokens contribute the
    class-dependent floor ``ln(1/(T_c+V))`` locally — no row needed.
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

_WS = re.compile(r"\S+")


def _doc_token_rows(
    batch: pa.Table, text_col: str, label_col: "str | None"
) -> pa.Table:
    """(doc_id?, label?, tok, k) — one row per distinct token per doc."""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    labels = batch[label_col].to_pylist() if label_col else None
    d_out: list[int] = []
    l_out: list[str] = []
    t_out: list[str] = []
    k_out: list[int] = []
    for i, t in enumerate(batch[text_col].to_pylist()):
        c = Counter(_WS.findall(t or ""))
        for tok, k in sorted(c.items()):
            d_out.append(int(ids[i]))
            if labels is not None:
                l_out.append(labels[i])
            t_out.append(tok)
            k_out.append(k)
    cols: dict = {"doc_id": pa.array(d_out, pa.int64())}
    if labels is not None:
        cols["label"] = pa.array(l_out, pa.string())
    cols["tok"] = pa.array(t_out, pa.string())
    cols["k"] = pa.array(k_out, pa.int64())
    return pa.table(cols)


def train_nb(
    docs: rd.Dataset, label_col: str = "lang", text_col: str = "text"
) -> tuple[rd.Dataset, dict]:
    """(model dataset (tok, label, cnt), stats) from one pass. ``stats``
    holds the tiny per-class scalars: ``classes`` (sorted), ``t_c``
    (token totals), ``n_c`` (doc counts, ≥1-token docs only), ``n_all``
    and the vocabulary size ``v`` — |classes|-sized driver state."""
    from gridfia_ray.stages.agg_util import bucketed_agg

    rows = docs.map_batches(
        lambda b: _doc_token_rows(b, text_col, label_col), batch_format="pyarrow"
    )
    model = bucketed_agg(rows, ["tok", "label"], {"cnt": ("k", "sum")}, n_buckets=32)

    # tiny aggregates: per-class token totals + per-class doc counts
    def class_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "label": batch["label"].to_pylist(),
                "k": batch["k"].to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby("label").agg(t_c=("k", "sum"))
        return pa.table(
            {
                "label": pa.array(list(g.index), pa.string()),
                "t_c": pa.array(g["t_c"].to_numpy(np.int64)),
            }
        )

    t_c = (
        rows.map_batches(class_partial, batch_format="pyarrow")
        .groupby("label")
        .sum("t_c")
        .to_pandas()
    )
    t_map = dict(zip(t_c["label"], t_c["sum(t_c)"].astype(np.int64)))

    # per-class ≥1-token doc counts, straight off the docs table
    def doc_count_partial(batch: pa.Table) -> pa.Table:
        labels = batch[label_col].to_pylist()
        texts = batch[text_col].to_pylist()
        c = Counter(
            lab for lab, t in zip(labels, texts) if _WS.search(t or "")
        )
        return pa.table(
            {
                "label": pa.array(sorted(c), pa.string()),
                "n": pa.array([c[x] for x in sorted(c)], pa.int64()),
            }
        )

    n_c = (
        docs.map_batches(doc_count_partial, batch_format="pyarrow")
        .groupby("label")
        .sum("n")
        .to_pandas()
    )
    n_map = dict(zip(n_c["label"], n_c["sum(n)"].astype(np.int64)))

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
        docs.map_batches(tok_partial, batch_format="pyarrow"),
        ["tok"],
        {"n": ("one", "max")},
        n_buckets=32,
    )
    classes = sorted(t_map)
    stats = {
        "classes": classes,
        "t_c": {c: int(t_map[c]) for c in classes},
        "n_c": {c: int(n_map.get(c, 0)) for c in classes},
        "n_all": int(sum(n_map.values())),
        "v": int(distinct.count()),
    }
    return model, stats


def score_nb(
    docs: rd.Dataset,
    model: rd.Dataset,
    stats: dict,
    text_col: str = "text",
    n_buckets: int = 32,
) -> rd.Dataset:
    """Per-doc (doc_id, pred, score_c): one exchange keyed on ``tok``
    plus one per-doc keyed sum plus a pure prior+argmax map. Docs with
    zero tokens emit no row (no evidence — the caller's policy)."""
    from gridfia_ray.stages.agg_util import bucketed_agg, bucketed_bucket_map

    classes: list[str] = stats["classes"]
    if not classes or stats["v"] <= 0:
        raise ValueError("score_nb: empty training corpus (no classes/vocab)")
    t_arr = np.array([stats["t_c"][c] for c in classes], np.float64)
    v = float(stats["v"])
    score_cols = [f"s_{i}" for i in range(len(classes))]

    union_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("tok", pa.string()),
            ("k", pa.int64()),
            ("label", pa.string()),
            ("cnt", pa.int64()),
            ("__side", pa.string()),
        ]
    )

    def doc_side(batch: pa.Table) -> pa.Table:
        r = _doc_token_rows(batch, text_col, None)
        n = r.num_rows
        return pa.table(
            {
                "doc_id": r["doc_id"],
                "tok": r["tok"],
                "k": r["k"],
                "label": pa.array([""] * n, pa.string()),
                "cnt": pa.array(np.full(n, -1, np.int64)),
                "__side": pa.array(["d"] * n, pa.string()),
            },
            schema=union_schema,
        )

    def model_side(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "doc_id": pa.array(np.full(n, -1, np.int64)),
                "tok": batch["tok"],
                "k": pa.array(np.full(n, -1, np.int64)),
                "label": batch["label"],
                "cnt": batch["cnt"],
                "__side": pa.array(["m"] * n, pa.string()),
            },
            schema=union_schema,
        )

    tagged = docs.map_batches(doc_side, batch_format="pyarrow").union(
        model.map_batches(model_side, batch_format="pyarrow")
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = g[g["__side"] == "d"]
        if len(d) == 0:
            return pd.DataFrame(
                {"doc_id": pd.Series(dtype=np.int64),
                 **{c: pd.Series(dtype=np.int64) for c in score_cols}}
            )
        m = g[g["__side"] == "m"]
        k = d["k"].to_numpy(np.int64)
        out = {"doc_id": d["doc_id"].to_numpy(np.int64)}
        # per class: lp(tok) from the bucket's model rows (absent → the
        # class floor), identical quantization to the SQL oracle
        for ci, cls in enumerate(classes):
            mc = m[m["label"] == cls]
            cnt = (
                d[["tok"]]
                .merge(mc[["tok", "cnt"]], on="tok", how="left")["cnt"]
                .fillna(0)
                .to_numpy(np.float64)
            )
            lp = np.floor(
                1e6 * np.log((cnt + 1.0) / (t_arr[ci] + v)) + 0.5
            ).astype(np.int64)
            out[score_cols[ci]] = lp * k
        df = pd.DataFrame(out)
        return df.groupby("doc_id", as_index=False).sum()

    out_schema = pa.schema(
        [("doc_id", pa.int64())] + [(c, pa.int64()) for c in score_cols]
    )
    partials = bucketed_bucket_map(
        tagged, ["tok"], per_bucket, n_buckets=n_buckets, out_schema=out_schema
    )
    sums = bucketed_agg(
        partials,
        ["doc_id"],
        {c: (c, "sum") for c in score_cols},
        n_buckets=16,
    )

    priors = np.floor(
        1e6
        * np.log(
            np.array([stats["n_c"][c] for c in classes], np.float64)
            / float(stats["n_all"])
        )
        + 0.5
    ).astype(np.int64)
    class_arr = np.array(classes)

    def decide(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[score_cols].to_numpy(np.int64) + priors[None, :]
        best = np.argmax(s, axis=1)  # first max = smallest class (sorted)
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(np.int64),
                "pred": class_arr[best],
                "score_c": s[np.arange(len(best)), best],
            }
        )

    return sums.map_batches(decide, batch_format="pandas")


def nb_classify(
    docs: rd.Dataset, label_col: str = "lang", text_col: str = "text"
) -> pd.DataFrame:
    """End-to-end: train on the full labeled corpus, score every
    ≥1-token document. Returns (doc_id, pred, score_c) sorted by
    doc_id."""
    model, stats = train_nb(docs, label_col, text_col)
    out = score_nb(docs, model, stats, text_col).to_pandas()
    out["doc_id"] = out["doc_id"].astype(np.int64)
    out["score_c"] = out["score_c"].astype(np.int64)
    return out.sort_values("doc_id", ignore_index=True)
