"""Simulate the driver's correctness phase under a hostile time budget.

The driver (observed r1-r3): fresh process -> ray.init -> import
__ray_entry__ -> smoke entry() -> run the FIRST 50 queries() entries and
their oracle_sql() side by side at sf0.01 -> write CORRECTNESS.json.
r4 produced `{}`, so this script exists to prove, per commit, that the
window finishes comfortably inside a hard budget.

Usage:
    python scripts/driver_sim.py [sf_dir] [--cold] [--n 50] [--cpus 8]

--cold wipes /tmp/gridfia_ray_fixtures first (worst-case driver env).
Prints per-query ray/oracle seconds and a final JSON summary line.
"""

from __future__ import annotations

import json
import shutil
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


def main() -> None:
    args = [a for a in sys.argv[1:]]
    cold = "--cold" in args
    if cold:
        args.remove("--cold")
    n_window = 50
    if "--n" in args:
        i = args.index("--n")
        n_window = int(args[i + 1])
        del args[i : i + 2]
    cpus = 8
    if "--cpus" in args:
        i = args.index("--cpus")
        cpus = int(args[i + 1])
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"

    if cold:
        shutil.rmtree("/tmp/gridfia_ray_fixtures", ignore_errors=True)

    t_start = time.time()
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus, include_dashboard=False, logging_level="ERROR")
    t_init = time.time() - t_start

    t0 = time.time()
    import __ray_entry__ as E

    t_import = time.time() - t0

    t0 = time.time()
    ent = E.entry()
    n_entry_rows = len(ent)
    t_entry = time.time() - t0

    t0 = time.time()
    qs = E.queries()
    sqls = E.oracle_sql()
    t_build = time.time() - t0

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    rows: dict[str, dict] = {}
    times: list[tuple[str, float, float]] = []
    n_pass = n_fail = 0
    for name in list(qs)[:n_window]:
        tq = time.time()
        try:
            got = pd.DataFrame(qs[name](sf_dir))
            err = None
        except Exception as exc:  # noqa: BLE001
            got, err = None, f"{type(exc).__name__}: {exc}"
        tq = time.time() - tq
        to = time.time()
        ok = False
        if err is None and name in sqls:
            try:
                want = con.execute(sqls[name]).df()
                g, w = normalize(got), normalize(want)
                ok = (
                    list(g.columns) == list(w.columns)
                    and len(g) == len(w)
                    and g.equals(w)
                )
                if not ok:
                    err = f"mismatch rows {len(g)} vs {len(w)} cols {list(g.columns)} vs {list(w.columns)}"
            except Exception as exc:  # noqa: BLE001
                err = f"oracle {type(exc).__name__}: {exc}"
        elif err is None:
            ok = len(got) >= 0  # rows-only
        to = time.time() - to
        times.append((name, tq, to))
        rows[name] = {"ok": ok, "err": err, "q_sec": round(tq, 2), "o_sec": round(to, 2)}
        n_pass += ok
        n_fail += not ok
        print(f"{'ok  ' if ok else 'FAIL'} {name:32s} q={tq:6.2f}s o={to:6.2f}s"
              + (f"  {err}" if err else ""))

    total = time.time() - t_start
    q_sum = sum(t for _, t, _ in times)
    o_sum = sum(t for _, _, t in times)
    summary = {
        "cold": cold,
        "cpus": cpus,
        "n_window": n_window,
        "pass": n_pass,
        "fail": n_fail,
        "init_sec": round(t_init, 2),
        "import_sec": round(t_import, 2),
        "entry_sec": round(t_entry, 2),
        "entry_rows": n_entry_rows,
        "build_sec": round(t_build, 2),
        "query_sec": round(q_sum, 2),
        "oracle_sec": round(o_sum, 2),
        "total_sec": round(total, 2),
    }
    print(json.dumps(summary))
    slow = sorted(times, key=lambda t: -(t[1] + t[2]))[:10]
    print("slowest:", ", ".join(f"{n}={tq + to:.1f}s" for n, tq, to in slow))
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()


