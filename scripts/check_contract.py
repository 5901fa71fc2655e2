"""Simulate the driver's correctness gate: run every queries() entry and
its oracle_sql() side by side at a given sf, compare row count, column
names, and order-insensitive values. Usage:

    python scripts/check_contract.py [sf_dir] [--jobs N] [name_filter...]

``--jobs N`` overlaps N query+oracle pairs on threads (one shared Ray
session, one DuckDB connection per thread): the sweep is latency-bound
— most queries leave most of the 8 CPUs idle between exchanges — so 3
threads cut the 237-query wall from ~13 min to well under 10 without
touching any per-query semantics (results are per-query pure functions;
the shared-derived memo is idempotent, worst case two threads build the
same materialized intermediate and one copy wins).
"""

from __future__ import annotations

import sys
import threading
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
    args = sys.argv[1:]
    jobs = 1
    if "--jobs" in args:
        i = args.index("--jobs")
        jobs = int(args[i + 1])
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    filters = args[1:]
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    import __ray_entry__ as E

    qs = E.queries()
    sqls = E.oracle_sql()

    local = threading.local()

    def connection():
        con = getattr(local, "con", None)
        if con is None:
            con = duckdb.connect()
            for t in TABLES:
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
                )
            local.con = con
        return con

    lock = threading.Lock()
    counts = {"pass": 0, "fail": 0}

    def report(ok: bool, msg: str, extra=None):
        with lock:
            counts["pass" if ok else "fail"] += 1
            print(msg, flush=True)
            if extra is not None:
                print(extra, flush=True)

    def run_one(name: str, fn) -> None:
        t0 = time.time()
        try:
            got = pd.DataFrame(fn(sf_dir))
        except Exception as exc:  # noqa: BLE001
            report(False, f"FAIL {name}: query raised {type(exc).__name__}: {exc}")
            return
        dt = time.time() - t0
        if name not in sqls:
            report(True, f"ok   {name}: rows-only ({len(got)} rows, {dt:.1f}s)")
            return
        try:
            want = connection().execute(sqls[name]).df()
        except Exception as exc:  # noqa: BLE001
            report(False, f"FAIL {name}: oracle SQL raised {type(exc).__name__}: {exc}")
            return
        g, w = normalize(got), normalize(want)
        if list(g.columns) != list(w.columns):
            report(False, f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}")
            return
        if len(g) != len(w):
            report(False, f"FAIL {name}: rows {len(g)} vs {len(w)}")
            return
        if not g.equals(w):
            diff = (g != w).any(axis=1)
            report(
                False,
                f"FAIL {name}: {int(diff.sum())}/{len(g)} differing rows; first:",
                pd.concat([g[diff].head(3), w[diff].head(3)]),
            )
            return
        report(True, f"ok   {name}: {len(g)} rows match ({dt:.1f}s)")

    todo = [
        (name, fn)
        for name, fn in qs.items()
        if not filters or any(f in name for f in filters)
    ]
    if jobs <= 1:
        for name, fn in todo:
            run_one(name, fn)
    else:
        # pre-import the lazily-loaded IO stacks: two threads racing the
        # same first import can observe a half-initialized module
        # (seen: ImportError on fsspec.implementations.http mid-sweep)
        try:
            import fsspec.implementations.http  # noqa: F401
            import pyarrow.fs  # noqa: F401
        except Exception:
            pass
        it = iter(todo)
        it_lock = threading.Lock()

        def worker():
            while True:
                with it_lock:
                    item = next(it, None)
                if item is None:
                    return
                run_one(*item)

        threads = [threading.Thread(target=worker) for _ in range(jobs)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

    print(f"\n{counts['pass']} passed, {counts['fail']} failed")
    ray.shutdown()
    sys.exit(1 if counts["fail"] else 0)


if __name__ == "__main__":
    main()
