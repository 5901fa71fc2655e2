"""χ² feature selection per class — the classic companion to the Naive
Bayes corpus router (Manning, Raghavan & Schütze IR ch. 13.5): for
every (class, token), the chi-square statistic of the 2×2 document
contingency table

        a = docs in c containing t      b = docs NOT in c containing t
        c₂ = docs in c without t        d = docs NOT in c without t

    χ² = N · (a·d − b·c₂)² / ((a+b)(c₂+d)(a+c₂)(b+d))

and the top-k tokens per class — the per-domain keyword / feature
table a corpus pipeline uses for routing, drift monitoring and
classifier pruning.

Exactness: all four cells are exact int64 document counts; the single
float64 division runs over integers < 2⁵³ with the IDENTICAL
expression tree on the Ray and SQL sides, then quantizes to
``chi2_u = floor(1e6·χ²+0.5)`` — bit-exact, ranking on the integer.

Scale shape: per-batch distinct (class, token, doc) presence combiners
→ ONE bucketed keyed sum keyed on ``tok`` — bucketing on the TOKEN
means each bucket locally holds every class's row for its tokens, so
the df (= Σ_c a) needed for b is an in-bucket sum, no second exchange
and no df table. Class doc totals are a |classes|-row driver scalar.
Top-k per class via the grouped_topk combiner (≤ k rows per class per
block to the final shuffle)."""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

_WS = re.compile(r"\S+")


def chi2_keywords(
    docs: rd.Dataset,
    k: int = 10,
    label_col: str = "source",
    text_col: str = "text",
    n_buckets: int = 32,
) -> pd.DataFrame:
    """Top-``k`` tokens per class by χ² (ties → smaller token). Returns
    (label, tok, rank, a, chi2_u) sorted by (label, rank)."""
    from gridfia_ray.pipelines.sampling import grouped_topk
    from gridfia_ray.stages.agg_util import bucketed_agg, bucketed_bucket_map

    def presence_partial(batch: pa.Table) -> pa.Table:
        labels = batch[label_col].to_pylist()
        texts = batch[text_col].to_pylist()
        c: Counter = Counter()
        for lab, t in zip(labels, texts):
            for tok in set(_WS.findall(t or "")):
                c[(lab, tok)] += 1
        keys = sorted(c)
        return pa.table(
            {
                "label": pa.array([x[0] for x in keys], pa.string()),
                "tok": pa.array([x[1] for x in keys], pa.string()),
                "a": pa.array([c[x] for x in keys], pa.int64()),
            }
        )

    rows = docs.map_batches(presence_partial, batch_format="pyarrow")
    counts = bucketed_agg(rows, ["tok", "label"], {"a": ("a", "sum")},
                          n_buckets=n_buckets)

    # tiny scalar: ≥1-token docs per class
    def doc_count_partial(batch: pa.Table) -> pa.Table:
        c = Counter(
            lab
            for lab, t in zip(
                batch[label_col].to_pylist(), batch[text_col].to_pylist()
            )
            if _WS.search(t or "")
        )
        return pa.table(
            {
                "label": pa.array(sorted(c), pa.string()),
                "n": pa.array([c[x] for x in sorted(c)], pa.int64()),
            }
        )

    nc = (
        docs.map_batches(doc_count_partial, batch_format="pyarrow")
        .groupby("label")
        .sum("n")
        .to_pandas()
    )
    n_map = dict(zip(nc["label"], nc["sum(n)"].astype(np.int64)))
    n_all = int(sum(n_map.values()))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {"label": pd.Series(dtype=str), "tok": pd.Series(dtype=str),
                 "a": pd.Series(dtype=np.int64),
                 "chi2_u": pd.Series(dtype=np.int64)}
            )
        df = g[["label", "tok", "a"]].copy()
        # df(t) = Σ_c a — local to the bucket (bucketed on tok)
        df["df_t"] = df.groupby("tok")["a"].transform("sum")
        a = df["a"].to_numpy(np.int64)
        b = df["df_t"].to_numpy(np.int64) - a
        n_c = df["label"].map(n_map).to_numpy(np.int64)
        c2 = n_c - a
        d = (n_all - n_c) - b
        num = np.float64(n_all) * (a * d - b * c2).astype(np.float64) ** 2
        den = ((a + b) * (c2 + d)).astype(np.float64) * (
            (a + c2) * (b + d)
        ).astype(np.float64)
        chi2 = np.where(den > 0, num / den, 0.0)
        df["chi2_u"] = np.floor(chi2 * 1e6 + 0.5).astype(np.int64)
        return df[["label", "tok", "a", "chi2_u"]]

    out_schema = pa.schema(
        [("label", pa.string()), ("tok", pa.string()),
         ("a", pa.int64()), ("chi2_u", pa.int64())]
    )
    scored = bucketed_bucket_map(
        counts, ["tok"], per_bucket, n_buckets=n_buckets, out_schema=out_schema
    )
    top = grouped_topk(
        scored, "label", k, "chi2_u", descending=True, tie_cols=["tok"]
    ).to_pandas()
    top = top.sort_values(
        ["label", "chi2_u", "tok"], ascending=[True, False, True]
    ).reset_index(drop=True)
    top["rank"] = top.groupby("label").cumcount() + 1
    for c in ("a", "chi2_u", "rank"):
        top[c] = top[c].astype(np.int64)
    return top[["label", "tok", "rank", "a", "chi2_u"]]
