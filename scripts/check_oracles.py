"""Local replica of the driver's correctness harness: run every
queries() entry at a given sf and diff against oracle_sql() via DuckDB
(row count, column names, order-insensitive values)."""

from __future__ import annotations

import sys
import time
import traceback

import duckdb
import pandas as pd

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2].split(",") if len(sys.argv) > 2 else None

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main() -> int:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR"
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if ONLY:
        unknown = [n for n in ONLY if n not in qs]
        if unknown:
            print(f"FAIL unknown query name(s): {unknown}; known: {sorted(qs)}")
            return 2
    failures = 0
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            got = canon(to_pandas(fn(SF_DIR)))
        except Exception:
            print(f"FAIL {name}: query raised")
            traceback.print_exc()
            failures += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows={len(got)} cols={list(got.columns)} ({dt:.1f}s, rows-only)")
            continue
        try:
            want = canon(con.sql(oracles[name]).df())
        except Exception:
            print(f"FAIL {name}: oracle SQL raised")
            traceback.print_exc()
            failures += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            failures += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            failures += 1
            continue
        try:
            pd.testing.assert_frame_equal(
                got, want, check_dtype=False, check_exact=False, rtol=1e-9, atol=1e-9
            )
            print(f"ok   {name}: rows={len(got)} ({dt:.1f}s)")
        except AssertionError as e:
            print(f"FAIL {name}: values differ\n{e}")
            failures += 1
    ray.shutdown()
    return failures


if __name__ == "__main__":
    sys.exit(main())
