"""Relational pipelines: TPC-H-shaped joins, aggregates, windows,
set ops, validation.

Split out of the former monolithic ``gridfia_ray/contract.py`` (round-5
VERDICT #3); see ``gridfia_ray/contract/__init__.py`` for the package
map. Query/oracle semantics are unchanged.
"""

from __future__ import annotations

import os
from typing import Callable

import numpy as np
import pandas as pd

from gridfia_ray import fixtures
from gridfia_ray.io import read_parquet_clean
from gridfia_ray.kernels.base import KernelContext
from gridfia_ray.kernels.registry import registry
from gridfia_ray.pipelines.common import GridSpec
from gridfia_ray.contract._shared import *  # noqa: F401,F403


def q_rel_urgent_customers(sf_dir: str) -> pd.DataFrame:
    """Broadcast SEMI join (EXISTS): customers with at least one URGENT
    order — key side deduped distributed, cardinality-guarded BEFORE the
    driver pull, broadcast once; customer side streams (no shuffle)."""
    return _semi_anti_customers(sf_dir, anti=False)

def q_rel_quiet_customers(sf_dir: str) -> pd.DataFrame:
    """Broadcast ANTI join (NOT EXISTS): customers with no URGENT order."""
    return _semi_anti_customers(sf_dir, anti=True)

def q_rel_wealthy_quiet(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q22-shaped: per nation the count and total balance of
    customers with NO URGENT order whose balance beats the
    positive-balance average — the average test cross-multiplied into
    int64 (bal·n > total), so no float division on either side. Anti
    join via the byte-guarded broadcast path; (n, total) from one
    combiner pass; final per-nation fold via one tiny bucketed
    aggregate. (The synthetic corpus gives every customer at least one
    order, so the classic no-order form is degenerate; the no-URGENT
    form keeps the identical shape non-trivially populated.)"""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from gridfia_ray.context import tune_context
    from gridfia_ray.pipelines.joins import broadcast_semi_join
    from gridfia_ray.stages.agg_util import bucketed_agg

    tune_context()
    cust = read_parquet_clean(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey", "c_acctbal"],
    ).map_batches(
        lambda b: pd.DataFrame(
            {
                "c_custkey": b["c_custkey"].astype(np.int64),
                "c_nationkey": b["c_nationkey"].astype(np.int64),
                "bal": np.floor(
                    b["c_acctbal"].to_numpy(np.float64) * 100 + 0.5
                ).astype(np.int64),
            }
        ),
        batch_format="pandas",
    )
    stats = (
        cust.map_batches(
            lambda b: pd.DataFrame(
                {
                    "n_pos": [int((b["bal"] > 0).sum())],
                    "s_pos": [int(b.loc[b["bal"] > 0, "bal"].sum())],
                }
            ),
            batch_format="pandas",
        )
        .aggregate(Sum("n_pos", alias_name="n"), Sum("s_pos", alias_name="t"))
    )
    n_pos, s_pos = int(stats["n"]), int(stats["t"])
    orderers = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderpriority"],
    ).map_batches(
        lambda b: pd.DataFrame(
            {"c_custkey": b.loc[
                b["o_orderpriority"] == "1-URGENT", "o_custkey"
            ].astype(np.int64)}
        ),
        batch_format="pandas",
    )
    quiet = broadcast_semi_join(cust, orderers, "c_custkey", anti=True)
    wealthy = quiet.map_batches(
        lambda b: b.loc[b["bal"] * n_pos > s_pos],
        batch_format="pandas",
    )
    _empty_nat = pd.DataFrame(
        {"c_nationkey": pd.Series(dtype=np.int64),
         "n_cust": pd.Series(dtype=np.int64),
         "total_c": pd.Series(dtype=np.int64)}
    )

    def nation_partial(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0 or "c_nationkey" not in b.columns:
            return _empty_nat  # anti-join emits schema-less empties
        return b.groupby("c_nationkey", as_index=False).agg(
            n_cust=("bal", "size"), total_c=("bal", "sum")
        )

    out = bucketed_agg(
        wealthy.map_batches(nation_partial, batch_format="pandas"),
        ["c_nationkey"],
        {"n_cust": ("n_cust", "sum"), "total_c": ("total_c", "sum")},
        n_buckets=8,
    ).to_pandas()  # bounded: one row per nation
    if len(out) == 0:
        return _empty_nat
    out = out[["c_nationkey", "n_cust", "total_c"]]
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("c_nationkey").reset_index(drop=True)

def q_rel_rollup_pricing(sf_dir: str) -> pd.DataFrame:
    """ROLLUP aggregate (all grouping prefixes in ONE streaming pass):
    per (returnflag, linestatus), per returnflag, and grand total —
    counts and integer-cents sums (stages/agg_util.rollup_agg)."""
    import ray.data as rd

    from gridfia_ray.context import tune_context
    from gridfia_ray.stages.agg_util import rollup_agg

    tune_context()
    li = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
    )

    def to_cents(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "qty_c": np.floor(batch["l_quantity"] * 100 + 0.5).astype(np.int64),
                "price_c": np.floor(batch["l_extendedprice"] * 100 + 0.5).astype(np.int64),
            }
        )

    out = rollup_agg(
        li.map_batches(to_cents, batch_format="pandas"),
        ["l_returnflag", "l_linestatus"],
        local_map={
            "n": ("qty_c", "size"),
            "sum_qty_c": ("qty_c", "sum"),
            "sum_price_c": ("price_c", "sum"),
        },
        merge_map={
            "n": ("n", "sum"),
            "sum_qty_c": ("sum_qty_c", "sum"),
            "sum_price_c": ("sum_price_c", "sum"),
        },
    ).to_pandas()
    for c in ("n", "sum_qty_c", "sum_price_c"):
        out[c] = out[c].astype(np.int64)
    return (
        out[["l_returnflag", "l_linestatus", "n", "sum_qty_c", "sum_price_c"]]
        .sort_values(["l_returnflag", "l_linestatus"])
        .reset_index(drop=True)
    )

def q_rel_order_count_dist(sf_dir: str) -> pd.DataFrame:
    """Customer order-count distribution (TPC-H Q13 shape): LEFT join —
    customers with zero qualifying orders must appear at c_count=0 —
    then the distribution of counts. Scale shape: per-batch count
    combiner on orders → tiny keyed merge; then the left attach AND the
    histogram are fused into ONE co-bucketed exchange (customer keys
    ride the counts' bucket stream, each bucket emits its partial
    histogram), finished by a tiny keyed merge. Neither base table is
    ever fully shuffled and no per-customer row survives the fused
    exchange."""
    import pyarrow as pa

    from gridfia_ray.context import tune_context
    from gridfia_ray.stages.agg_util import bucketed_agg

    tune_context()
    cust = read_parquet_clean(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey"]
    )
    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderpriority"],
    )

    def count_partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[batch["o_orderpriority"] != "1-URGENT"]
        g = b.groupby("o_custkey", as_index=False).size()
        return pd.DataFrame(
            {"c_custkey": g["o_custkey"].astype(np.int64), "c_count": g["size"].astype(np.int64)}
        )

    counts = bucketed_agg(
        orders.map_batches(count_partial, batch_format="pandas"),
        ["c_custkey"],
        {"c_count": ("c_count", "sum")},
        n_buckets=16,
    )

    # left attach + histogram FUSED into the same exchange: customer
    # keys ride the counts' bucket stream with the sentinel c_count=-1
    # (counts are >=1 by construction), each bucket emits its partial
    # histogram directly — zero-order customers surface as c_count=0
    # without a second exchange carrying per-customer rows
    row_schema = pa.schema([("c_custkey", pa.int64()), ("c_count", pa.int64())])

    def tag_cust(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": batch["c_custkey"].cast(pa.int64()),
                "c_count": pa.array(
                    np.full(batch.num_rows, -1, np.int64), pa.int64()
                ),
            },
            schema=row_schema,
        )

    def bucket_hist(g: pd.DataFrame) -> pd.DataFrame:
        keys = g.loc[g["c_count"] == -1, ["c_custkey"]]
        cnt = g.loc[g["c_count"] != -1, ["c_custkey", "c_count"]]
        merged = keys.merge(cnt, on="c_custkey", how="left")
        c = merged["c_count"].fillna(0).astype(np.int64)
        h = c.value_counts().sort_index()
        return pd.DataFrame(
            {"c_count": h.index.to_numpy(np.int64), "n_cust": h.to_numpy(np.int64)}
        )

    from gridfia_ray.stages.agg_util import bucketed_bucket_map

    tagged = cust.map_batches(tag_cust, batch_format="pyarrow").union(counts)
    partial_hist = bucketed_bucket_map(
        tagged,
        ["c_custkey"],
        bucket_hist,
        n_buckets=16,
        out_schema=pa.schema([("c_count", pa.int64()), ("n_cust", pa.int64())]),
    )
    out = bucketed_agg(
        partial_hist,
        ["c_count"],
        {"n_cust": ("n_cust", "sum")},
        n_buckets=8,
    ).to_pandas()
    out = out.astype({"c_count": np.int64, "n_cust": np.int64})
    return out.sort_values("c_count", ignore_index=True)

def q_rel_correlation(sf_dir: str) -> pd.DataFrame:
    """Grouped Pearson correlation (quantity vs whole-dollar price per
    returnflag) from EXACT integer moments: one combiner pass emits the
    six per-group int64 sums (n, Σx, Σy, Σx², Σy², Σxy), a tiny keyed
    merge folds them, and r evaluates the identical double expression
    on both sides (µ-unit compare). The moments are order-free ints, so
    the only float step is shared verbatim with the oracle — no
    accumulation-order drift, unlike comparing against SQL corr()."""
    from gridfia_ray.context import tune_context
    from gridfia_ray.stages.agg_util import bucketed_agg

    tune_context()
    li = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        x = np.floor(batch["l_quantity"].to_numpy(np.float64) + 0.5).astype(np.int64)
        y = np.floor(batch["l_extendedprice"].to_numpy(np.float64) + 0.5).astype(np.int64)
        b = pd.DataFrame(
            {
                "l_returnflag": batch["l_returnflag"],
                "n": np.ones(len(batch), np.int64),
                "sx": x, "sy": y, "sxx": x * x, "syy": y * y, "sxy": x * y,
            }
        )
        return b.groupby("l_returnflag", as_index=False).sum()

    m = bucketed_agg(
        li.map_batches(partial, batch_format="pandas"),
        ["l_returnflag"],
        {c: (c, "sum") for c in ("n", "sx", "sy", "sxx", "syy", "sxy")},
        n_buckets=4,
    ).to_pandas()
    n = m["n"].astype(np.float64)
    sx, sy = m["sx"].astype(np.float64), m["sy"].astype(np.float64)
    sxx, syy, sxy = (m[c].astype(np.float64) for c in ("sxx", "syy", "sxy"))
    r = (n * sxy - sx * sy) / np.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    out = pd.DataFrame({"l_returnflag": m["l_returnflag"], "r_u": s6(r)})
    return out.sort_values("l_returnflag", ignore_index=True)

def q_rel_zscore(sf_dir: str) -> pd.DataFrame:
    """Feature standardization (z-score) of order totals in ONE moment
    pass + ONE stateless map: the (n, Σx, Σx²) moments are exact int64
    (whole-dollar quantization) folded by a tiny keyed merge; every
    row's z then evaluates the identical double expression on both
    sides (µ-unit compare) — the ML feature-scaling op, exact where SQL
    built-in STDDEV would drift by accumulation order."""
    from gridfia_ray.context import tune_context
    from gridfia_ray.stages.agg_util import bucketed_agg

    tune_context()
    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_orderkey", "o_totalprice"]
    )

    def moment_partial(batch: pd.DataFrame) -> pd.DataFrame:
        x = np.floor(batch["o_totalprice"].to_numpy(np.float64) + 0.5).astype(np.int64)
        return pd.DataFrame(
            {
                "g": np.zeros(1, np.int64),
                "n": np.asarray([len(x)], np.int64),
                "sx": np.asarray([x.sum()], np.int64),
                "sxx": np.asarray([(x * x).sum()], np.int64),
            }
        )

    m = (
        bucketed_agg(
            orders.map_batches(moment_partial, batch_format="pandas"),
            ["g"],
            {"n": ("n", "sum"), "sx": ("sx", "sum"), "sxx": ("sxx", "sum")},
            n_buckets=1,
        )
        .to_pandas()
        .iloc[0]
    )
    n, sx, sxx = float(m["n"]), float(m["sx"]), float(m["sxx"])
    mean = sx / n
    std = np.sqrt((sxx - sx * sx / n) / (n - 1.0))

    def zmap(batch: pd.DataFrame) -> pd.DataFrame:
        x = np.floor(batch["o_totalprice"].to_numpy(np.float64) + 0.5).astype(np.int64)
        z = (x.astype(np.float64) - mean) / std
        return pd.DataFrame(
            {
                "o_orderkey": batch["o_orderkey"].to_numpy(np.int64),
                "z_u": np.floor(z * 1_000_000 + 0.5).astype(np.int64),
            }
        )

    out = orders.map_batches(zmap, batch_format="pandas").to_pandas()
    out = out.astype({"o_orderkey": np.int64, "z_u": np.int64})
    return out.sort_values("o_orderkey", ignore_index=True)

def q_rel_validate_orders(sf_dir: str) -> pd.DataFrame:
    """Declarative data-quality report (pipelines/validate.py): five
    expectations over orders — null check, range check, domain check,
    regex shape check (one shared combiner scan) and key uniqueness
    (one bucketed distinct exchange) — exact violation counts vs the
    FILTER-clause oracle. The table-shaped counterpart of the
    reference's structural store validation (S11)."""
    from gridfia_ray.context import tune_context
    from gridfia_ray.pipelines.validate import validate_table

    tune_context()
    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus", "o_orderpriority"],
    )
    out = validate_table(
        orders,
        [
            {"rule": "custkey_not_null", "kind": "not_null", "col": "o_custkey"},
            {"rule": "price_min", "kind": "min", "col": "o_totalprice", "value": 1000.0},
            {"rule": "status_domain", "kind": "in_set", "col": "o_orderstatus", "values": ["O", "F"]},
            {"rule": "priority_shape", "kind": "regex", "col": "o_orderpriority", "pattern": "[1-5]-[A-Z]+"},
            {"rule": "custkey_unique", "kind": "unique", "col": "o_custkey"},
        ],
    )
    return out.sort_values("rule", ignore_index=True)

def q_rel_pivot_status(sf_dir: str) -> pd.DataFrame:
    """SQL PIVOT (wide layout of a two-key GROUP BY): order counts per
    priority row × status column — the per-batch partial emits the wide
    row directly, one tiny keyed merge finishes
    (stages/agg_util.pivot_agg)."""
    from gridfia_ray.context import tune_context
    from gridfia_ray.stages.agg_util import pivot_agg

    tune_context()
    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderpriority", "o_orderstatus"],
    )
    out = pivot_agg(
        orders,
        ["o_orderpriority"],
        "o_orderstatus",
        ["O", "F", "P"],
        ("o_orderstatus", "size"),
    ).to_pandas()
    for c in ("o_orderstatus_O", "o_orderstatus_F", "o_orderstatus_P"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("o_orderpriority", ignore_index=True)

def q_rel_except_customers(sf_dir: str) -> pd.DataFrame:
    """SQL set operation (DISTINCT semantics): customers with an urgent
    order EXCEPT customers with a finished order — per-batch distinct
    combiner, one co-bucketed membership exchange
    (pipelines/setops.keyed_set_op; intersect/union variants pinned in
    tests/test_setops.py)."""
    import pyarrow.compute as pc

    from gridfia_ray.context import tune_context
    from gridfia_ray.pipelines.setops import keyed_set_op

    tune_context()
    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderpriority", "o_orderstatus"],
    )
    urgent = orders.map_batches(
        lambda b: b.filter(pc.equal(b["o_orderpriority"], "1-URGENT")).select(
            ["o_custkey"]
        ),
        batch_format="pyarrow",
    )
    finished = orders.map_batches(
        lambda b: b.filter(pc.equal(b["o_orderstatus"], "F")).select(["o_custkey"]),
        batch_format="pyarrow",
    )
    out = (
        keyed_set_op(urgent, finished, ["o_custkey"], "except")
        .to_pandas()
        .astype({"o_custkey": np.int64})
    )
    return out.sort_values("o_custkey", ignore_index=True)

def q_rel_outer_counts(sf_dir: str) -> pd.DataFrame:
    """FULL OUTER JOIN of two per-customer aggregates (urgent-order
    count ⟗ finished-order count, -1 for the missing side). Both sides
    key on the same column, so the scale-right plan FUSES the join into
    the aggregation: one combiner pass emits both counts, one tiny keyed
    merge, and a zero-count on a side marks exactly the rows that
    side's filtered aggregate never produced — bit-identical to the SQL
    FULL OUTER JOIN without a second exchange. (The general two-table
    case goes through pipelines/joins.shuffle_hash_join, whose
    join_type passthrough — full/left/right outer — is pinned in
    tests/test_joins.py.)"""
    from gridfia_ray.context import tune_context
    from gridfia_ray.stages.agg_util import bucketed_agg

    tune_context()
    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderpriority", "o_orderstatus"],
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = pd.DataFrame(
            {
                "o_custkey": batch["o_custkey"].astype(np.int64),
                "n_urgent": (batch["o_orderpriority"] == "1-URGENT").astype(np.int64),
                "n_f": (batch["o_orderstatus"] == "F").astype(np.int64),
            }
        )
        g = b.groupby("o_custkey", as_index=False).sum()
        return g[(g["n_urgent"] > 0) | (g["n_f"] > 0)]

    agg = bucketed_agg(
        orders.map_batches(partial, batch_format="pandas"),
        ["o_custkey"],
        {"n_urgent": ("n_urgent", "sum"), "n_f": ("n_f", "sum")},
        n_buckets=16,
    )

    def null_fill(b: pd.DataFrame) -> pd.DataFrame:
        out = b.copy()
        out.loc[out["n_urgent"] == 0, "n_urgent"] = -1
        out.loc[out["n_f"] == 0, "n_f"] = -1
        return out

    out = (
        agg.map_batches(null_fill, batch_format="pandas")
        .to_pandas()
        .astype({"o_custkey": np.int64, "n_urgent": np.int64, "n_f": np.int64})
    )
    return out.sort_values("o_custkey", ignore_index=True)

def q_rel_ntile_orders(sf_dir: str) -> pd.DataFrame:
    """Global ORDER-BY window: exact NTILE(7) over order value (ties
    broken by orderkey — SQL ORDER BY v, id) WITHOUT a global sort:
    quickselect boundary values, one below-count/tied-gather pass, one
    stateless assignment pass (pipelines/rank.ntile_exact). The global
    window complements the PARTITIONed window family in
    pipelines/events.py."""
    from gridfia_ray.context import tune_context
    from gridfia_ray.pipelines.rank import ntile_exact

    tune_context()
    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_orderkey", "o_totalprice"]
    )
    out = (
        ntile_exact(orders, "o_totalprice", "o_orderkey", 7)
        .to_pandas()
        .astype({"o_orderkey": np.int64, "tile": np.int64})
    )
    return out[["o_orderkey", "tile"]].sort_values("o_orderkey", ignore_index=True)

def q_rel_cube_orders(sf_dir: str) -> pd.DataFrame:
    """CUBE aggregate (all 2^n key subsets in ONE streaming pass): per
    (orderstatus, orderpriority), each margin, and grand total — counts
    and integer-cents totals (stages/agg_util.cube_agg). The reference
    exposes only single-level grouping (summary stats per species,
    forest_metrics.py); CUBE is the multi-dimensional generalization a
    warehouse user expects from the relational surface."""
    from gridfia_ray.context import tune_context
    from gridfia_ray.stages.agg_util import cube_agg

    tune_context()
    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderstatus", "o_orderpriority", "o_totalprice"],
    )

    def to_cents(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_orderstatus": batch["o_orderstatus"],
                "o_orderpriority": batch["o_orderpriority"],
                "price_c": np.floor(batch["o_totalprice"] * 100 + 0.5).astype(np.int64),
            }
        )

    out = cube_agg(
        orders.map_batches(to_cents, batch_format="pandas"),
        ["o_orderstatus", "o_orderpriority"],
        local_map={"n": ("price_c", "size"), "sum_price_c": ("price_c", "sum")},
        merge_map={"n": ("n", "sum"), "sum_price_c": ("sum_price_c", "sum")},
    ).to_pandas()
    for c in ("n", "sum_price_c"):
        out[c] = out[c].astype(np.int64)
    return (
        out[["o_orderstatus", "o_orderpriority", "n", "sum_price_c"]]
        .sort_values(["o_orderstatus", "o_orderpriority"])
        .reset_index(drop=True)
    )

def q_rel_pricing_summary(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q1-shaped aggregate with per-row integer-cents conversion
    (bit-exact vs SQL regardless of summation order)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from gridfia_ray.context import tune_context

    tune_context()
    li = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_shipdate",
        ],
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[batch["l_shipdate"] <= pd.Timestamp("1998-09-02")]
        out = pd.DataFrame(
            {
                "l_returnflag": b["l_returnflag"],
                "l_linestatus": b["l_linestatus"],
                "qty_c": np.floor(b["l_quantity"] * 100 + 0.5).astype(np.int64),
                "base_c": np.floor(b["l_extendedprice"] * 100 + 0.5).astype(np.int64),
                "disc_c": np.floor(
                    b["l_extendedprice"] * (1.0 - b["l_discount"]) * 100 + 0.5
                ).astype(np.int64),
                "n": np.int64(1),
            }
        )
        return out.groupby(["l_returnflag", "l_linestatus"], as_index=False).sum()

    out = (
        li.map_batches(partial, batch_format="pandas")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty_c", alias_name="sum_qty_c"),
            Sum("base_c", alias_name="sum_base_c"),
            Sum("disc_c", alias_name="sum_disc_c"),
            Sum("n", alias_name="count_order"),
        )
        .to_pandas()
    )
    for c in ["sum_qty_c", "sum_base_c", "sum_disc_c", "count_order"]:
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)

def q_rel_top_customers(sf_dir: str) -> pd.DataFrame:
    """Broadcast join (orders→custkey map shipped once via ray.put) +
    grouped revenue + top-10: the broadcast-hash-join pattern for a
    small dimension side."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from gridfia_ray.context import tune_context

    tune_context()
    orders = pq.read_table(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_orderkey", "o_custkey"]
    )
    keys = orders["o_orderkey"].to_numpy()
    custs = orders["o_custkey"].to_numpy()
    order_map_ref = ray.put((keys, custs))

    class JoinRev:
        def __init__(self):
            k, c = ray.get(order_map_ref)
            order = np.argsort(k, kind="mergesort")
            self.keys = k[order]
            self.custs = c[order]

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            ok = batch["l_orderkey"].to_numpy()
            idx = np.clip(np.searchsorted(self.keys, ok), 0, len(self.keys) - 1)
            hit = self.keys[idx] == ok  # drop orphan orderkeys instead of
            idx, ok_rows = idx[hit], hit  # attributing them to a neighbor
            cust = self.custs[idx]
            rev_c = np.floor(
                batch["l_extendedprice"].to_numpy()[ok_rows]
                * (1.0 - batch["l_discount"].to_numpy()[ok_rows])
                * 100
                + 0.5
            ).astype(np.int64)
            out = pd.DataFrame({"o_custkey": cust, "revenue_c": rev_c})
            return out.groupby("o_custkey", as_index=False).sum()

    li = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )
    from gridfia_ray.stages.agg_util import bucketed_agg

    out = bucketed_agg(
        li.map_batches(JoinRev, batch_format="pandas", concurrency=(1, 8)),
        ["o_custkey"],
        {"revenue_c": ("revenue_c", "sum")},
    ).to_pandas()
    out["revenue_c"] = out["revenue_c"].astype(np.int64)
    out = out.sort_values(["revenue_c", "o_custkey"], ascending=[False, True]).head(10)
    return out.reset_index(drop=True)

def q_rel_regional_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q5-shaped multi-table join: lineitem ⋈ orders ⋈ customer ⋈
    supplier ⋈ nation ⋈ region, region-filtered, revenue by nation —
    the broadcast-join-chain pattern. Every dimension map ships once via
    ``ray.put``; the fact table streams through ONE map_batches with a
    per-batch combiner, then a tiny grouped sum. Per-row integer-cents
    conversion makes the sum bit-exact vs SQL.

    Scale note: orders is the one side that grows with the fact table —
    at real TPC-H scale this leg needs the bucketed shuffle join
    (``stages/dedup_util.attach_pair_attrs`` fallback shape) instead of
    a broadcast; the dimension chain (supplier/nation/region/customer)
    stays broadcast at any scale."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from gridfia_ray.context import tune_context

    tune_context()
    region = pq.read_table(os.path.join(sf_dir, "region.parquet")).to_pandas()
    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet")).to_pandas()
    asia = region.loc[region["r_name"] == "ASIA", "r_regionkey"].iloc[0]
    nations = nation[nation["n_regionkey"] == asia]
    nation_keys = set(nations["n_nationkey"].tolist())

    customer = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_nationkey"]
    )
    supplier = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey", "s_nationkey"]
    )
    orders = pq.read_table(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_orderkey", "o_custkey"]
    )

    def sorted_map(keys, vals):
        k, v = keys.to_numpy(), vals.to_numpy()
        order = np.argsort(k, kind="mergesort")
        return k[order], v[order]

    maps_ref = ray.put(
        {
            "orders": sorted_map(orders["o_orderkey"], orders["o_custkey"]),
            "cust": sorted_map(customer["c_custkey"], customer["c_nationkey"]),
            "supp": sorted_map(supplier["s_suppkey"], supplier["s_nationkey"]),
            "region_nations": np.asarray(sorted(nation_keys), dtype=np.int64),
        }
    )

    class JoinChain:
        def __init__(self):
            self.m = ray.get(maps_ref)

        def _lookup(self, name, keys):
            mk, mv = self.m[name]
            idx = np.clip(np.searchsorted(mk, keys), 0, len(mk) - 1)
            hit = mk[idx] == keys
            return mv[idx], hit

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            cust, hit_o = self._lookup("orders", batch["l_orderkey"].to_numpy())
            c_nat, hit_c = self._lookup("cust", cust)
            s_nat, hit_s = self._lookup("supp", batch["l_suppkey"].to_numpy())
            keep = (
                hit_o & hit_c & hit_s
                & (c_nat == s_nat)
                & np.isin(s_nat, self.m["region_nations"])
            )
            rev_c = np.floor(
                batch["l_extendedprice"].to_numpy()[keep]
                * (1.0 - batch["l_discount"].to_numpy()[keep])
                * 100
                + 0.5
            ).astype(np.int64)
            out = pd.DataFrame({"n_nationkey": s_nat[keep], "revenue_c": rev_c})
            return out.groupby("n_nationkey", as_index=False).sum()

    li = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    from gridfia_ray.stages.agg_util import bucketed_agg

    out = bucketed_agg(
        li.map_batches(JoinChain, batch_format="pandas", concurrency=(1, 8)),
        ["n_nationkey"],
        {"revenue_c": ("revenue_c", "sum")},
    ).to_pandas()
    out = out.merge(nations[["n_nationkey", "n_name"]], on="n_nationkey")
    out["revenue_c"] = out["revenue_c"].astype(np.int64)
    out = out[["n_name", "revenue_c"]]
    return out.sort_values(["revenue_c", "n_name"], ascending=[False, True]).reset_index(
        drop=True
    )

def q_rel_bloom_join(sf_dir: str) -> pd.DataFrame:
    """Bloom-PREFILTERED shuffle join (pipelines/joins.
    bloom_prefilter_join): lineitem ⋈ high-value orders, with a
    distributed-built fixed-size bitmap of the right key set shipped to
    the left scan so non-matching lines never enter the all-to-all
    exchange. Exact by construction (false positives are discarded by
    the join itself) — the oracle is the PLAIN SQL inner join. Per
    return flag: line count and revenue cents."""
    import ray.data as rd  # noqa: F401

    from gridfia_ray.context import tune_context
    from gridfia_ray.pipelines.joins import bloom_prefilter_join
    from gridfia_ray.stages.agg_util import bucketed_agg

    tune_context()
    li = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_returnflag"],
    )
    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_totalprice"],
    ).filter(expr="o_totalprice > 400000.0")
    joined = bloom_prefilter_join(
        li, orders, on="l_orderkey", right_on="o_orderkey", num_partitions=16
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = pd.DataFrame(
            {
                "l_returnflag": batch["l_returnflag"],
                "n_lines": np.int64(1),
                "revenue_c": np.floor(
                    batch["l_extendedprice"] * 100 + 0.5
                ).astype(np.int64),
            }
        )
        return b.groupby("l_returnflag", as_index=False).sum()

    out = bucketed_agg(
        joined.map_batches(partial, batch_format="pandas"),
        ["l_returnflag"],
        {"n_lines": ("n_lines", "sum"), "revenue_c": ("revenue_c", "sum")},
        n_buckets=8,
    ).to_pandas()
    for c in ("n_lines", "revenue_c"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("l_returnflag").reset_index(drop=True)

def q_rel_priority_lines(sf_dir: str) -> pd.DataFrame:
    """Large×large SHUFFLE join: lineitem ⋈ orders on the orderkey via
    the keyed hash-shuffle join (``pipelines/joins.shuffle_hash_join``)
    — the shape for when NEITHER side fits in a worker (contrast the
    broadcast rel_* queries). Per order priority: line count, count of
    lines shipped >60 days after the order date, revenue cents."""
    import ray.data as rd

    from gridfia_ray.context import tune_context
    from gridfia_ray.pipelines.joins import shuffle_hash_join
    from gridfia_ray.stages.agg_util import bucketed_agg

    tune_context()
    li = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )
    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )
    joined = shuffle_hash_join(
        li, orders, on=["l_orderkey"], right_on=["o_orderkey"], num_partitions=16
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = pd.DataFrame(
            {
                "o_orderpriority": batch["o_orderpriority"],
                "n_lines": np.int64(1),
                "late_lines": (
                    batch["l_shipdate"]
                    > batch["o_orderdate"] + pd.Timedelta(days=60)
                ).astype(np.int64),
                "revenue_c": np.floor(
                    batch["l_extendedprice"] * (1.0 - batch["l_discount"]) * 100 + 0.5
                ).astype(np.int64),
            }
        )
        return b.groupby("o_orderpriority", as_index=False).sum()

    out = bucketed_agg(
        joined.map_batches(partial, batch_format="pandas"),
        ["o_orderpriority"],
        {
            "n_lines": ("n_lines", "sum"),
            "late_lines": ("late_lines", "sum"),
            "revenue_c": ("revenue_c", "sum"),
        },
        n_buckets=4,
    ).to_pandas()
    for c in ("n_lines", "late_lines", "revenue_c"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("o_orderpriority").reset_index(drop=True)

def q_rel_prompt_ship_lines(sf_dir: str) -> pd.DataFrame:
    """Row-level output of the shuffle join: every line shipped within
    [order date, order date + 3 days] — exact join ROWS, not an
    aggregate, so the oracle checks per-row join correctness."""
    import ray.data as rd

    from gridfia_ray.context import tune_context
    from gridfia_ray.pipelines.joins import shuffle_hash_join

    tune_context()
    li = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_linenumber", "l_shipdate"],
    )
    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )
    joined = shuffle_hash_join(
        li, orders, on=["l_orderkey"], right_on=["o_orderkey"], num_partitions=16
    )

    def prompt(batch: pd.DataFrame):
        import pyarrow as pa

        keep = (batch["l_shipdate"] >= batch["o_orderdate"]) & (
            batch["l_shipdate"] <= batch["o_orderdate"] + pd.Timedelta(days=3)
        )
        b = batch.loc[keep]
        # explicit Arrow types: an EMPTY pandas object column would
        # otherwise infer as arrow null and churn the block schema
        return pa.table(
            {
                "l_orderkey": pa.array(b["l_orderkey"].to_numpy(np.int64), pa.int64()),
                "l_linenumber": pa.array(b["l_linenumber"].to_numpy(np.int64), pa.int64()),
                "o_orderpriority": pa.array(b["o_orderpriority"].tolist(), pa.string()),
            }
        )

    out = joined.map_batches(prompt, batch_format="pandas").to_pandas()
    return out.sort_values(["l_orderkey", "l_linenumber"]).reset_index(drop=True)

def q_rel_returned_orders(sf_dir: str) -> pd.DataFrame:
    """EXISTS with a LARGE key side (TPC-H Q4 shape): orders having at
    least one returned line (l_returnflag = 'R'), counted per order
    priority. The returned-orderkey set is a large fraction of all
    orders — broadcast_semi_join dedupes it distributed and its
    cardinality/byte guards auto-route to the hash-shuffle semi join
    beyond the broadcast budget."""
    import pyarrow.compute as pc
    import ray.data as rd

    from gridfia_ray.context import tune_context
    from gridfia_ray.pipelines.joins import broadcast_semi_join
    from gridfia_ray.stages.agg_util import bucketed_agg

    tune_context()
    li = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_returnflag"],
    )

    def returned_keys(batch):
        b = batch.filter(pc.equal(batch["l_returnflag"], "R"))
        return b.select(["l_orderkey"]).rename_columns(["o_orderkey"])

    keys = li.map_batches(returned_keys, batch_format="pyarrow")
    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderpriority"],
    )
    hit = broadcast_semi_join(orders, keys, on="o_orderkey")

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby("o_orderpriority", as_index=False).size()
        return g.rename(columns={"size": "n_orders"})

    out = bucketed_agg(
        hit.map_batches(partial, batch_format="pandas"),
        ["o_orderpriority"],
        {"n_orders": ("n_orders", "sum")},
        n_buckets=4,
    ).to_pandas()
    out["n_orders"] = out["n_orders"].astype(np.int64)
    return out.sort_values("o_orderpriority").reset_index(drop=True)

def q_rel_large_orders(sf_dir: str) -> pd.DataFrame:
    """Large-quantity orders (TPC-H Q18 shape): orders whose total
    lineitem quantity exceeds 250 — a HAVING SUM() > T over the full
    orderkey keyspace (per-batch combiner → one bucketed keyed sum →
    distributed filter), then one hash-shuffle join back to orders for
    the attributes. Quantities in exact integer cents."""
    from gridfia_ray.pipelines.joins import shuffle_hash_join
    from gridfia_ray.stages.agg_util import bucketed_agg

    li = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_quantity"],
    )

    def qty_partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["qty_c"] = np.floor(batch["l_quantity"] * 100 + 0.5).astype(np.int64)
        return batch.groupby("l_orderkey", as_index=False).agg(
            qty_c=("qty_c", "sum")
        )

    sums = bucketed_agg(
        li.map_batches(qty_partial, batch_format="pandas"),
        ["l_orderkey"],
        {"qty_c": ("qty_c", "sum")},
        n_buckets=32,
    )
    import pyarrow.compute as pc

    big = sums.map_batches(
        lambda b: b.filter(pc.greater(b["qty_c"], 25_000)),
        batch_format="pyarrow",
    )
    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )
    joined = shuffle_hash_join(
        orders, big, on=["o_orderkey"], right_on=["l_orderkey"]
    ).to_pandas()
    joined["price_c"] = np.floor(
        joined["o_totalprice"] * 100 + 0.5
    ).astype(np.int64)
    out = joined[["o_orderkey", "o_custkey", "qty_c", "price_c"]].astype(np.int64)
    return out.sort_values("o_orderkey").reset_index(drop=True)

def q_rel_small_qty_revenue(sf_dir: str) -> pd.DataFrame:
    """Correlated-average subquery (TPC-H Q17 shape): for Brand#1
    parts, revenue of lines with quantity below 20% of that part's
    average quantity. Two streaming passes over lineitem — per-part
    (Σqty, n) combiner into a tiny broadcast table, then the integer
    predicate 5·qty_c·n < Σqty_c (exact cents, no float average)."""
    import ray

    from gridfia_ray.context import tune_context
    from gridfia_ray.stages.agg_util import bucketed_agg

    tune_context()
    import pyarrow.compute as pc

    part = read_parquet_clean(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_brand"]
    ).map_batches(  # brand filter runs distributed; only ~1/25 of the
        # dimension's keys ever reach the driver for the broadcast
        lambda b: b.filter(pc.equal(b["p_brand"], "Brand#1")).select(["p_partkey"]),
        batch_format="pyarrow",
    ).to_pandas()
    brand_keys = np.sort(part["p_partkey"].to_numpy())
    kref = ray.put(brand_keys)
    li = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    )

    def brand_lines(batch: pd.DataFrame) -> pd.DataFrame:
        import ray as _ray

        k = _ray.get(kref)
        v = batch["l_partkey"].to_numpy()
        pos = np.searchsorted(k, v)
        ok = pos < k.size
        hit = np.zeros(len(batch), dtype=bool)
        hit[ok] = k[pos[ok]] == v[ok]
        b = batch.loc[hit].copy()
        b["qty_c"] = np.floor(b["l_quantity"] * 100 + 0.5).astype(np.int64)
        b["price_c"] = np.floor(b["l_extendedprice"] * 100 + 0.5).astype(np.int64)
        return b[["l_partkey", "qty_c", "price_c"]]

    lines = li.map_batches(brand_lines, batch_format="pandas").materialize()

    def qty_partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby("l_partkey", as_index=False).agg(
            s=("qty_c", "sum"), n=("qty_c", "size")
        )
        g["n"] = g["n"].astype(np.int64)
        return g

    stats = bucketed_agg(
        lines.map_batches(qty_partial, batch_format="pandas"),
        ["l_partkey"],
        {"s": ("s", "sum"), "n": ("n", "sum")},
        n_buckets=4,
    ).to_pandas()  # ≤ one row per brand part — tiny by construction
    stats = stats.sort_values("l_partkey")
    sref = ray.put(
        (
            stats["l_partkey"].to_numpy(np.int64),
            stats["s"].to_numpy(np.int64),
            stats["n"].to_numpy(np.int64),
        )
    )

    def small_partial(batch: pd.DataFrame) -> pd.DataFrame:
        import ray as _ray

        pk, s, n = _ray.get(sref)
        idx = np.searchsorted(pk, batch["l_partkey"].to_numpy())
        small = 5 * batch["qty_c"].to_numpy() * n[idx] < s[idx]
        b = batch.loc[small]
        g = b.groupby("l_partkey", as_index=False).agg(
            n_small=("qty_c", "size"), small_revenue_c=("price_c", "sum")
        )
        g["n_small"] = g["n_small"].astype(np.int64)
        return g

    out = bucketed_agg(
        lines.map_batches(small_partial, batch_format="pandas"),
        ["l_partkey"],
        {"n_small": ("n_small", "sum"), "small_revenue_c": ("small_revenue_c", "sum")},
        n_buckets=4,
    ).to_pandas()
    out = out.rename(columns={"l_partkey": "p_partkey"})
    for c in ("p_partkey", "n_small", "small_revenue_c"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("p_partkey").reset_index(drop=True)

def q_rel_sole_slow_supplier(sf_dir: str) -> pd.DataFrame:
    """Self-joined EXISTS / NOT EXISTS on the fact table (TPC-H Q21
    shape, returnflag standing in for the receipt-late predicate the
    synthetic lineitem lacks): per supplier in NATION_3, count orders
    where (a) at least two suppliers participated, (b) this supplier
    had a returned line, (c) no other supplier did. One per-batch
    (order, supplier, any_r) combiner, ONE exchange keyed on the
    orderkey with a vectorized per-bucket verdict, a per-supplier
    bucketed sum (bounded by the supplier dimension), then broadcast
    name/nation attach on the driver-small counts."""
    import pyarrow.parquet as pq

    from gridfia_ray.context import tune_context
    from gridfia_ray.stages.agg_util import bucketed_agg, bucketed_bucket_map, to_arrow

    tune_context()
    li = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_suppkey", "l_returnflag"],
    )

    def partial(batch: pd.DataFrame) -> pa.Table:
        b = pd.DataFrame(
            {
                "l_orderkey": batch["l_orderkey"],
                "l_suppkey": batch["l_suppkey"],
                "any_r": (batch["l_returnflag"] == "R").astype(np.int64),
            }
        )
        return to_arrow(
            b.groupby(["l_orderkey", "l_suppkey"], as_index=False)["any_r"].max()
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g2 = g.groupby(["l_orderkey", "l_suppkey"], as_index=False)["any_r"].max()
        st = g2.groupby("l_orderkey").agg(
            n_supp=("l_suppkey", "size"), n_r=("any_r", "sum")
        )
        ok = st[(st["n_supp"] >= 2) & (st["n_r"] == 1)].index
        win = g2[g2["l_orderkey"].isin(ok) & (g2["any_r"] == 1)]
        return pd.DataFrame(
            {
                "l_suppkey": win["l_suppkey"].to_numpy(np.int64),
                "n": np.ones(len(win), np.int64),
            }
        )

    winners = bucketed_bucket_map(
        li.map_batches(partial, batch_format="pandas"),
        ["l_orderkey"],
        per_bucket,
        n_buckets=32,
        coalesce=True,
    )
    counts = bucketed_agg(
        winners, ["l_suppkey"], {"numwait": ("n", "sum")}, n_buckets=8
    ).to_pandas()  # bounded by the supplier DIMENSION, driver-small

    sup = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_name", "s_nationkey"],
    ).to_pandas()
    nat = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name"]
    ).to_pandas()
    out = counts.merge(sup, left_on="l_suppkey", right_on="s_suppkey").merge(
        nat, left_on="s_nationkey", right_on="n_nationkey"
    )
    out = out[out["n_name"] == "NATION_3"][["s_name", "numwait"]]
    out["numwait"] = out["numwait"].astype(np.int64)
    return (
        out.sort_values(["numwait", "s_name"], ascending=[False, True], kind="mergesort")
        .head(100)
        .reset_index(drop=True)
    )

def q_rel_nation_volume(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q7-shaped bi-national shipping volume: revenue flowing
    between NATION_1 suppliers and NATION_2 customers (both
    directions) per ship year, 1996–1997. Supplier and customer fold
    to broadcast key→nation lookups on the driver (dimension side);
    the two slimmed FACT sides meet in ONE orderkey shuffle hash join;
    a per-batch integer-cents combiner then a tiny bucketed sum. Bit
    exact vs the 6-table SQL join (per-row FLOOR(×100) cents on both
    sides)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from gridfia_ray.context import tune_context
    from gridfia_ray.stages.agg_util import (
        bucketed_agg,
        bucketed_left_attach,
        to_arrow,
    )

    tune_context()
    li_schema = pa.schema(
        [
            ("l_orderkey", pa.int64()),
            ("supp_nation", pa.string()),
            ("l_year", pa.int64()),
            ("vol_c", pa.int64()),
        ]
    )
    # right side keyed by the SAME column name for the co-bucketed attach
    ord_schema = pa.schema(
        [("l_orderkey", pa.int64()), ("cust_nation", pa.string())]
    )
    pair = ("NATION_1", "NATION_2")
    nat = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name"]
    ).to_pandas()
    nat = nat[nat["n_name"].isin(pair)]
    sup = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey", "s_nationkey"]
    ).to_pandas().merge(nat, left_on="s_nationkey", right_on="n_nationkey")
    cus = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_nationkey"]
    ).to_pandas().merge(nat, left_on="c_nationkey", right_on="n_nationkey")
    sup_look = _dim_lookup(
        sup["s_suppkey"].to_numpy(np.int64), sup["n_name"].to_numpy(object)
    )
    cus_look = _dim_lookup(
        cus["c_custkey"].to_numpy(np.int64), cus["n_name"].to_numpy(object)
    )

    li = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
                 "l_shipdate"],
    )
    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_orderkey", "o_custkey"]
    )

    def li_slim(batch: pd.DataFrame) -> pa.Table:
        b = batch[
            (batch["l_shipdate"] >= pd.Timestamp("1996-01-01"))
            & (batch["l_shipdate"] < pd.Timestamp("1998-01-01"))
        ]
        hit, names = sup_look(b["l_suppkey"].to_numpy(np.int64))
        b = b[hit]
        return to_arrow(
            pd.DataFrame(
                {
                    "l_orderkey": b["l_orderkey"].to_numpy(np.int64),
                    "supp_nation": names[hit].astype(str),
                    "l_year": b["l_shipdate"].dt.year.to_numpy(np.int64),
                    "vol_c": np.floor(
                        b["l_extendedprice"] * (1.0 - b["l_discount"]) * 100
                        + 0.5
                    ).to_numpy(np.int64),
                }
            ),
            li_schema,
        )

    def ord_slim(batch: pd.DataFrame) -> pa.Table:
        hit, names = cus_look(batch["o_custkey"].to_numpy(np.int64))
        b = batch[hit]
        return to_arrow(
            pd.DataFrame(
                {
                    "l_orderkey": b["o_orderkey"].to_numpy(np.int64),
                    "cust_nation": names[hit].astype(str),
                }
            ),
            ord_schema,
        )

    # co-bucketed attach, not Dataset.join: the nation filters leave
    # hash partitions with zero blocks on one side, which aborts the
    # pyarrow join inside Ray's aggregator (schema-less empty build)
    j = bucketed_left_attach(
        li.map_batches(li_slim, batch_format="pandas"),
        orders.map_batches(ord_slim, batch_format="pandas"),
        on=["l_orderkey"],
        left_schema=li_schema,
        right_schema=ord_schema,
        n_buckets=32,
    )

    part_schema = pa.schema(
        [
            ("supp_nation", pa.string()),
            ("cust_nation", pa.string()),
            ("l_year", pa.int64()),
            ("vol_c", pa.int64()),
            ("n_lines", pa.int64()),
        ]
    )

    def partial(batch: pd.DataFrame) -> pa.Table:
        b = batch[batch["cust_nation"].notna()]  # inner semantics
        b = b[b["supp_nation"] != b["cust_nation"]]
        b = b.assign(n_lines=np.int64(1))
        g = b.groupby(
            ["supp_nation", "cust_nation", "l_year"], as_index=False
        ).agg(vol_c=("vol_c", "sum"), n_lines=("n_lines", "sum"))
        # typed Arrow out: an all-filtered bucket with object nation
        # columns would churn the executor's schema/size estimators
        g = g.astype({"l_year": np.int64, "vol_c": np.int64,
                      "n_lines": np.int64})
        return to_arrow(g, part_schema)

    out = bucketed_agg(
        j.map_batches(partial, batch_format="pandas"),
        ["supp_nation", "cust_nation", "l_year"],
        {"volume_c": ("vol_c", "sum"), "n_lines": ("n_lines", "sum")},
        n_buckets=8,
    ).to_pandas()
    if len(out) == 0:  # zero-row to_pandas drops the columns entirely
        return pd.DataFrame(
            {
                "supp_nation": pd.Series(dtype=str),
                "cust_nation": pd.Series(dtype=str),
                "l_year": pd.Series(dtype=np.int64),
                "volume_c": pd.Series(dtype=np.int64),
                "n_lines": pd.Series(dtype=np.int64),
            }
        )
    out = out.astype(
        {"l_year": np.int64, "volume_c": np.int64, "n_lines": np.int64}
    )
    return out.sort_values(
        ["supp_nation", "cust_nation", "l_year"], ignore_index=True
    )

def q_rel_market_share(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q8-shaped market share: NATION_7 suppliers' share of the
    lineitem volume on orders placed 1996–1997 by ASIA-region
    customers, per order year. Same dimension-broadcast + one orderkey
    shuffle join shape as Q7; numerator/denominator fold as exact
    int64 cents and the final share is ONE double division written
    identically in the SQL oracle."""
    import pyarrow.parquet as pq

    import pyarrow as pa

    from gridfia_ray.context import tune_context
    from gridfia_ray.stages.agg_util import (
        bucketed_agg,
        bucketed_left_attach,
        to_arrow,
    )

    tune_context()
    target = "NATION_7"
    nat = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name", "n_regionkey"],
    ).to_pandas()
    reg = pq.read_table(
        os.path.join(sf_dir, "region.parquet"),
        columns=["r_regionkey", "r_name"],
    ).to_pandas()
    asia = reg.loc[reg["r_name"] == "ASIA", "r_regionkey"].iloc[0]
    cus = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"],
    ).to_pandas().merge(
        nat[nat["n_regionkey"] == asia], left_on="c_nationkey",
        right_on="n_nationkey",
    )
    sup = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_nationkey"],
    ).to_pandas().merge(nat, left_on="s_nationkey", right_on="n_nationkey")
    cus_keys = np.sort(cus["c_custkey"].to_numpy(np.int64))
    sup_look = _dim_lookup(
        sup["s_suppkey"].to_numpy(np.int64),
        (sup["n_name"] == target).to_numpy(np.int64),
    )

    li = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    )

    li_schema = pa.schema(
        [
            ("l_orderkey", pa.int64()),
            ("is_tgt", pa.int64()),
            ("vol_c", pa.int64()),
        ]
    )
    ord_schema = pa.schema([("l_orderkey", pa.int64()), ("o_year", pa.int64())])

    def li_slim(batch: pd.DataFrame) -> pa.Table:
        hit, is_tgt = sup_look(batch["l_suppkey"].to_numpy(np.int64))
        b = batch[hit]  # every supplier has a nation row → all hit
        return to_arrow(
            pd.DataFrame(
                {
                    "l_orderkey": b["l_orderkey"].to_numpy(np.int64),
                    "is_tgt": is_tgt[hit],
                    "vol_c": np.floor(
                        b["l_extendedprice"] * (1.0 - b["l_discount"]) * 100
                        + 0.5
                    ).to_numpy(np.int64),
                }
            ),
            li_schema,
        )

    def ord_slim(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[
            (batch["o_orderdate"] >= pd.Timestamp("1996-01-01"))
            & (batch["o_orderdate"] < pd.Timestamp("1998-01-01"))
        ]
        k = b["o_custkey"].to_numpy(np.int64)
        pos = np.searchsorted(cus_keys, k)
        inb = pos < cus_keys.size
        hit = np.zeros(k.size, dtype=bool)
        hit[inb] = cus_keys[pos[inb]] == k[inb]
        b = b[hit]
        return to_arrow(
            pd.DataFrame(
                {
                    "l_orderkey": b["o_orderkey"].to_numpy(np.int64),
                    "o_year": b["o_orderdate"].dt.year.to_numpy(np.int64),
                }
            ),
            ord_schema,
        )

    j = bucketed_left_attach(
        li.map_batches(li_slim, batch_format="pandas"),
        orders.map_batches(ord_slim, batch_format="pandas"),
        on=["l_orderkey"],
        left_schema=li_schema,
        right_schema=ord_schema,
        n_buckets=32,
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[batch["o_year"].notna()]  # inner semantics
        b = b.assign(
            o_year=b["o_year"].astype(np.int64),
            num_c=b["vol_c"] * b["is_tgt"],
        )
        g = b.groupby("o_year", as_index=False).agg(
            num_c=("num_c", "sum"), den_c=("vol_c", "sum")
        )
        return to_arrow(
            g.astype({"o_year": np.int64, "num_c": np.int64, "den_c": np.int64})
        )

    out = bucketed_agg(
        j.map_batches(partial, batch_format="pandas"),
        ["o_year"],
        {"num_c": ("num_c", "sum"), "den_c": ("den_c", "sum")},
        n_buckets=4,
    ).to_pandas()
    if len(out) == 0:  # zero-row to_pandas drops the columns entirely
        return pd.DataFrame(
            {
                "o_year": pd.Series(dtype=np.int64),
                "num_c": pd.Series(dtype=np.int64),
                "den_c": pd.Series(dtype=np.int64),
                "mkt_share_u": pd.Series(dtype=np.int64),
            }
        )
    out = out.astype({"o_year": np.int64, "num_c": np.int64, "den_c": np.int64})
    out["mkt_share_u"] = s6(
        out["num_c"].to_numpy(np.float64) / out["den_c"].to_numpy(np.float64)
    )
    return out[["o_year", "num_c", "den_c", "mkt_share_u"]].sort_values(
        "o_year", ignore_index=True
    )

def q_rel_top_supplier(sf_dir: str) -> pd.DataFrame:
    """Argmax over a grouped aggregate (TPC-H Q15 shape): supplier(s)
    with the maximum Q1-1996 revenue — per-suppkey cents combiner, tiny
    bucketed merge, broadcast supplier-name attach, max + tie keep."""
    from gridfia_ray.context import tune_context
    from gridfia_ray.stages.agg_util import bucketed_agg

    tune_context()
    li = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        keep = (batch["l_shipdate"] >= pd.Timestamp("1996-01-01")) & (
            batch["l_shipdate"] < pd.Timestamp("1996-04-01")
        )
        b = batch.loc[keep].copy()
        b["revenue_c"] = np.floor(
            b["l_extendedprice"] * (1.0 - b["l_discount"]) * 100 + 0.5
        ).astype(np.int64)
        return b.groupby("l_suppkey", as_index=False).agg(
            revenue_c=("revenue_c", "sum")
        )

    rev = bucketed_agg(
        li.map_batches(partial, batch_format="pandas"),
        ["l_suppkey"],
        {"revenue_c": ("revenue_c", "sum")},
        n_buckets=4,
    ).to_pandas()  # one row per supplier — tiny
    top = rev[rev["revenue_c"] == rev["revenue_c"].max()]
    supp = read_parquet_clean(
        os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey", "s_name"]
    ).to_pandas()
    out = top.merge(supp, left_on="l_suppkey", right_on="s_suppkey")[
        ["s_suppkey", "s_name", "revenue_c"]
    ]
    out["s_suppkey"] = out["s_suppkey"].astype(np.int64)
    out["revenue_c"] = out["revenue_c"].astype(np.int64)
    return out.sort_values("s_suppkey").reset_index(drop=True)
