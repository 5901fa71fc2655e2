"""Table-level data-quality validation — declarative expectations
evaluated in ONE streaming pass (plus one keyed exchange per
uniqueness rule), reporting exact violation counts per rule.

The reference validates its store structurally (api.py S11: alignment,
dtype, nodata policy — `validate_store`); this is the TABLE-shaped
counterpart a pipeline runs before/after every ingest at corpus scale:
null checks, range checks, domain checks, regex shape checks, key
uniqueness. All scalar rules share one combiner scan (per-batch
violation counts, tiny keyed merge); uniqueness is exact via the
bucketed distinct count (violations = rows − distinct keys), never a
driver-side set.

Every rule's count is SQL-expressible, so the whole report carries a
DuckDB oracle (contract: rel_validate_orders).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import ray.data as rd

_SCALAR_KINDS = ("not_null", "min", "max", "in_set", "regex")


def validate_table(
    ds: rd.Dataset, rules: list[dict], n_buckets: int = 32
) -> pd.DataFrame:
    """Evaluate ``rules`` and return (rule, violations) — one row per
    rule, exact counts. Each rule is a dict:

    - ``{"rule": name, "kind": "not_null", "col": c}`` — NULL/NaN rows
    - ``{"kind": "min"|"max", "col": c, "value": v}`` — rows < v / > v
      (NULLs don't violate range rules; add a not_null rule for that)
    - ``{"kind": "in_set", "col": c, "values": [...]}`` — rows outside
      the domain (NULLs violate: they are not in the set)
    - ``{"kind": "regex", "col": c, "pattern": p}`` — non-matching rows
      (full-match anchor semantics; NULLs violate)
    - ``{"kind": "unique", "col": c}`` — rows beyond the first of each
      duplicated key. NULL groups as ONE key value with one survivor
      (SQL's ``COUNT(*) − COUNT(DISTINCT c)`` instead counts every NULL
      row, because COUNT(DISTINCT) drops NULLs — pair with a not_null
      rule when NULL keys are possible)

    The report is driver-sized by construction (one row per rule)."""
    if not rules:
        raise ValueError("validate_table needs at least one rule")
    names = [r["rule"] for r in rules]
    if len(set(names)) != len(names):
        raise ValueError("duplicate rule names")
    for r in rules:
        if r["kind"] not in (*_SCALAR_KINDS, "unique"):
            raise ValueError(f"unknown rule kind {r['kind']!r} in {r['rule']!r}")
    scalar = [r for r in rules if r["kind"] in _SCALAR_KINDS]
    uniques = [r for r in rules if r["kind"] == "unique"]

    counts: dict[str, int] = {}

    if scalar:
        compiled = [
            (r, re.compile(r["pattern"]) if r["kind"] == "regex" else None)
            for r in scalar
        ]

        def partial(batch: pd.DataFrame) -> pd.DataFrame:
            out_names, out_viol = [], []
            for r, rx in compiled:
                s = batch[r["col"]]
                null = s.isna()
                if r["kind"] == "not_null":
                    v = int(null.sum())
                elif r["kind"] == "min":
                    v = int((s < r["value"]).sum())  # NaN compares False
                elif r["kind"] == "max":
                    v = int((s > r["value"]).sum())
                elif r["kind"] == "in_set":
                    v = int((~s.isin(r["values"])).sum())  # NULL not in set
                else:  # regex
                    m = s.astype("string").str.fullmatch(rx)
                    v = int(len(s) - int(m.fillna(False).sum()))
                out_names.append(r["rule"])
                out_viol.append(v)
            return pd.DataFrame(
                {
                    "rule": pd.Series(out_names, dtype=str),
                    "violations": pd.Series(out_viol, dtype=np.int64),
                }
            )

        from gridfia_ray.stages.agg_util import bucketed_agg

        folded = (
            bucketed_agg(
                ds.map_batches(partial, batch_format="pandas"),
                ["rule"],
                {"violations": ("violations", "sum")},
                n_buckets=min(8, n_buckets),
            )
            .to_pandas()
        )
        counts.update(
            zip(folded["rule"], folded["violations"].astype(np.int64))
        )
        for r in scalar:  # rules with zero violations on every batch
            counts.setdefault(r["rule"], 0)

    for r in uniques:
        col = r["col"]

        def key_partial(batch: pd.DataFrame, col=col) -> pd.DataFrame:
            g = batch[[col]].copy()
            g["n"] = np.int64(1)
            return g.groupby(col, as_index=False, dropna=False).sum()

        from gridfia_ray.stages.agg_util import bucketed_agg

        per_key = bucketed_agg(
            ds.map_batches(key_partial, batch_format="pandas"),
            [col],
            {"n": ("n", "sum")},
            n_buckets=n_buckets,
        )
        # violations = Σ(n − 1) over keys: fold per-bucket sums, not keys
        extra = per_key.map_batches(
            lambda b: pd.DataFrame({"v": [np.int64((b["n"] - 1).sum())]}),
            batch_format="pandas",
        ).to_pandas()
        counts[r["rule"]] = int(extra["v"].sum())

    return pd.DataFrame(
        {
            "rule": pd.Series(names, dtype=str),
            "violations": pd.Series(
                [counts[n] for n in names], dtype=np.int64
            ),
        }
    )
