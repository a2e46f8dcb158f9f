"""Local mirror of the driver's correctness gate: run every queries() entry
via Ray at a given sf and compare against oracle_sql() in DuckDB
(row count + schema + order-insensitive value hash).

Usage: python tools/check_correctness.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    import numpy as np

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            try:
                as_num = pd.to_numeric(df[c])
                df[c] = as_num
            except (ValueError, TypeError):
                df[c] = df[c].astype(str)
                continue
        if np.issubdtype(df[c].dtype, np.floating):
            vals = df[c].to_numpy()
            if np.all(np.isfinite(vals)) and np.all(vals == np.trunc(vals)):
                df[c] = vals.astype(np.int64)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]
    only = set(args)  # remaining args = query-name filter
    import ray

    ray.init(
        address="local", num_cpus=8, include_dashboard=False,
        ignore_reinit_error=True, logging_level="ERROR",
    )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )

    failures = 0
    import time

    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as e:  # noqa: BLE001
            print(f"[FAIL] {name}: ray query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        ray_s = time.perf_counter() - t0
        if name not in oracles:
            print(f"[rows-only] {name}: {len(got)} rows, cols {list(got.columns)}")
            continue
        want = canon(con.execute(oracles[name]).fetchdf())
        if len(got) != len(want):
            print(f"[FAIL] {name}: rows {len(got)} != oracle {len(want)}")
            failures += 1
            continue
        if list(got.columns) != list(want.columns):
            print(
                f"[FAIL] {name}: columns {list(got.columns)} != {list(want.columns)}"
            )
            failures += 1
            continue
        gh = pd.util.hash_pandas_object(got.astype(str), index=False).sum()
        wh = pd.util.hash_pandas_object(want.astype(str), index=False).sum()
        if gh != wh:
            diff = got.compare(want) if got.shape == want.shape else None
            print(f"[FAIL] {name}: value hash mismatch\n{diff if diff is not None else ''}"[:2000])
            failures += 1
        else:
            print(f"[OK] {name}: {len(got)} rows match oracle ({ray_s:.1f}s)")
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
