"""Simulate the driver's correctness gate: run every queries() entry and
its oracle_sql() side by side at a given sf, compare row count, column
names, and order-insensitive values. Usage:

    python scripts/check_contract.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype(np.int64)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype(np.float64)
        else:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    filters = sys.argv[2:]
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    import __ray_entry__ as E

    qs = E.queries()
    sqls = E.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    n_pass = n_fail = 0
    for name, fn in qs.items():
        if filters and not any(f in name for f in filters):
            continue
        t0 = time.time()
        try:
            got = pd.DataFrame(fn(sf_dir))
        except Exception as exc:
            print(f"FAIL {name}: query raised {type(exc).__name__}: {exc}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in sqls:
            print(f"ok   {name}: rows-only ({len(got)} rows, {dt:.1f}s)")
            n_pass += 1
            continue
        try:
            want = con.execute(sqls[name]).df()
        except Exception as exc:
            print(f"FAIL {name}: oracle SQL raised {type(exc).__name__}: {exc}")
            n_fail += 1
            continue
        g, w = normalize(got), normalize(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}")
            n_fail += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
            n_fail += 1
            continue
        if not g.equals(w):
            diff = (g != w).any(axis=1)
            print(f"FAIL {name}: {int(diff.sum())}/{len(g)} differing rows; first:")
            print(pd.concat([g[diff].head(3), w[diff].head(3)]))
            n_fail += 1
            continue
        print(f"ok   {name}: {len(g)} rows match ({dt:.1f}s)")
        n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
