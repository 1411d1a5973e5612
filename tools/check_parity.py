"""Local stand-in for the driver's correctness gate: run every queries()
entry at a given sf and compare to its oracle_sql() twin via DuckDB —
row count, column names, and an order-insensitive value hash.

Usage: python tools/check_parity.py [sf_dir ...] [query ...]

Any argument that is a directory is an sf dir (several may be given —
the round gate runs sf0.001 AND sf0.01 in one command); the rest are
query-name filters.  With no dirs, defaults to /root/testdata/sf0.01.
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import pandas as pd


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    if df.empty:  # apply() on an empty frame returns a DataFrame, not a Series
        return hashlib.md5(b"").hexdigest()
    rows = df.astype(str).apply(lambda r: "|".join(r.values), axis=1).tolist()
    rows.sort()
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def run_scale(sf_dir: str, only: set[str]) -> list[str]:
    from goto_eater_crawler_ray.pipelines.queries import ORACLES, QUERIES

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failures = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"FAIL {name}: ray error {type(e).__name__}: {e}")
            failures.append(name)
            continue
        dt = time.time() - t0
        sql = ORACLES.get(name)
        if sql is None:
            print(f"ok   {name}: rows-only ({len(got)} rows, {dt:.1f}s)")
            continue
        exp = con.sql(sql).df()
        problems = []
        if len(got) != len(exp):
            problems.append(f"rows {len(got)} != {len(exp)}")
        if sorted(got.columns) != sorted(exp.columns):
            problems.append(f"cols {sorted(got.columns)} != {sorted(exp.columns)}")
        if not problems and value_hash(got) != value_hash(exp):
            problems.append("value-hash mismatch")
            merged = got[sorted(got.columns)].astype(str).apply("|".join, axis=1)
            expected = exp[sorted(exp.columns)].astype(str).apply("|".join, axis=1)
            diff = set(merged) ^ set(expected)
            problems.append(f"{len(diff)} differing rows, e.g. {sorted(diff)[:2]}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)} ({dt:.1f}s)")
            failures.append(name)
        else:
            print(f"ok   {name}: {len(got)} rows match oracle ({dt:.1f}s)")
    con.close()
    return failures


def main():
    import os

    sf_dirs = [a for a in sys.argv[1:] if os.path.isdir(a)]
    only = {a for a in sys.argv[1:] if not os.path.isdir(a)}
    if not sf_dirs:
        sf_dirs = ["/root/testdata/sf0.01"]
    # fail LOUDLY on unknown filters — a mistyped sf dir lands here and
    # must not make the gate pass vacuously with zero checks run
    sys.path.insert(0, ".")
    from goto_eater_crawler_ray.pipelines.queries import QUERIES as _Q

    unknown = only - set(_Q)
    if unknown:
        print(f"ERROR: not a directory and not a query name: {sorted(unknown)}")
        sys.exit(2)

    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, ".")

    all_failures = {}
    for sf_dir in sf_dirs:
        print(f"=== {sf_dir} ===")
        f = run_scale(sf_dir, only)
        if f:
            all_failures[sf_dir] = f
    ray.shutdown()
    if all_failures:
        print("FAILURES:", all_failures)
        sys.exit(1)
    print(f"ALL PARITY CHECKS PASSED ({', '.join(sf_dirs)})")


if __name__ == "__main__":
    main()
