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


def to_arrow(result):
    """Normalize a query/oracle result to a pyarrow Table, columns sorted
    by name — types are PRESERVED (no integral-float or object coercion)
    so the comparison is exactly as strict as the driver's typed hash."""
    import pyarrow as pa

    if isinstance(result, pa.Table):
        t = result
    elif isinstance(result, pd.DataFrame):
        t = pa.Table.from_pandas(result, preserve_index=False)
    else:  # ray Dataset
        t = pa.Table.from_pandas(result.to_pandas(), preserve_index=False)
    return t.select(sorted(t.column_names))


def type_label(t) -> str:
    """Collapse physical-encoding-only differences (string vs
    large_string, dictionary) while keeping width/signedness/kind strict:
    int32 != int64, decimal (DuckDB HUGEINT) != int64, float32 != float64."""
    import pyarrow as pa
    import pyarrow.types as pt

    if isinstance(t, pa.DictionaryType):
        t = t.value_type
    if pt.is_large_string(t) or pt.is_string(t):
        return "str"
    if pt.is_large_binary(t) or pt.is_binary(t):
        return "bin"
    if pt.is_decimal(t):
        return "decimal"
    return str(t)


def canon(table) -> pd.DataFrame:
    """Sorted pandas view for value hashing — call AFTER the type check."""
    df = table.to_pandas()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
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
            got_t = to_arrow(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"[FAIL] {name}: ray query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        ray_s = time.perf_counter() - t0
        if name not in oracles:
            print(
                f"[rows-only] {name}: {got_t.num_rows} rows, "
                f"cols {got_t.column_names}"
            )
            continue
        want_t = to_arrow(con.execute(oracles[name]).arrow())
        if got_t.num_rows != want_t.num_rows:
            print(f"[FAIL] {name}: rows {got_t.num_rows} != oracle {want_t.num_rows}")
            failures += 1
            continue
        if got_t.column_names != want_t.column_names:
            print(
                f"[FAIL] {name}: columns {got_t.column_names} != {want_t.column_names}"
            )
            failures += 1
            continue
        gtypes = [type_label(f.type) for f in got_t.schema]
        wtypes = [type_label(f.type) for f in want_t.schema]
        if gtypes != wtypes:
            bad = [
                f"{c}: ray={g} oracle={w}"
                for c, g, w in zip(got_t.column_names, gtypes, wtypes)
                if g != w
            ]
            print(f"[FAIL] {name}: dtype mismatch — {'; '.join(bad)}")
            failures += 1
            continue
        got, want = canon(got_t), canon(want_t)
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
