"""Local replica of the driver's correctness harness: run every
queries() entry at a given sf and diff against oracle_sql() via DuckDB
(row count, column names, and a HASH-EXACT value compare: columns
sorted by name, rows sorted by all columns, canonical type-tagged
serialization, blake2b digest — the driver's strictness, not rtol)."""

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


def _canon_col(s: pd.Series) -> list[bytes]:
    """Canonical type-tagged byte serialization of one column, one
    entry per row. Hash-equality of these bytes is the round-5
    comparator: EXACT values (float bits, not rtol) and exact dtype
    FAMILY (an int64 Ray column vs a float64 oracle column is a FAIL
    even when the values are numerically equal) — the driver-strength
    semantics VERDICT r4 item 1 asked for."""
    import struct

    import numpy as np

    out: list[bytes] = []
    if pd.api.types.is_datetime64_any_dtype(s):
        us = s.astype("datetime64[us]").astype("int64")
        mask = s.isna()
        for v, m in zip(us, mask):
            out.append(b"\x00" if m else b"t%d" % int(v))
        return out
    if pd.api.types.is_bool_dtype(s):
        for v in s:
            out.append(b"\x00" if pd.isna(v) else (b"b1" if v else b"b0"))
        return out
    if pd.api.types.is_integer_dtype(s):
        for v in s:
            out.append(b"\x00" if pd.isna(v) else b"i%d" % int(v))
        return out
    if pd.api.types.is_float_dtype(s):
        for v in s:
            if pd.isna(v):
                out.append(b"\x00")
            else:
                # fully bitwise, including the sign of zero: both the
                # _ra formula and DuckDB ROUND preserve -0.0 (probed)
                out.append(b"f" + struct.pack("<d", float(v)))
        return out
    # object / string / mixed: per-value tagging
    import datetime as _dt
    import decimal as _dec

    def cell(v) -> bytes:
        if v is None or (isinstance(v, float) and v != v):
            return b"\x00"
        if isinstance(v, (bool, np.bool_)):
            return b"b1" if v else b"b0"
        if isinstance(v, (int, np.integer)):
            return b"i%d" % int(v)
        if isinstance(v, (float, np.floating)):
            return b"f" + struct.pack("<d", float(v))
        if isinstance(v, _dec.Decimal):
            return b"d" + str(v.normalize()).encode()
        if isinstance(v, str):
            return b"s" + v.encode()
        if isinstance(v, bytes):
            return b"y" + v
        if isinstance(v, _dt.datetime):
            # naive datetimes are UTC epoch values here (the typed
            # datetime64 path treats them that way); v.timestamp()
            # would apply the HOST timezone and float-truncate
            epoch = _dt.datetime(1970, 1, 1, tzinfo=v.tzinfo)
            return b"t%d" % ((v - epoch) // _dt.timedelta(microseconds=1))
        if isinstance(v, _dt.date):
            return b"t%d" % (
                (v - _dt.date(1970, 1, 1)).days * 86_400_000_000
            )
        if isinstance(v, (list, tuple, np.ndarray)):
            return b"[" + b",".join(cell(x) for x in v) + b"]"
        try:
            if pd.isna(v):
                return b"\x00"
        except (TypeError, ValueError):
            pass
        return b"o" + repr(v).encode()

    return [cell(v) for v in s]


def frames_hash_equal(got: pd.DataFrame, want: pd.DataFrame):
    """(equal, first_diff_message). Both frames are already canon()ed
    (columns sorted by name, rows sorted by all columns)."""
    import hashlib

    hg, hw = hashlib.blake2b(digest_size=16), hashlib.blake2b(digest_size=16)
    for col in got.columns:
        cg = _canon_col(got[col])
        cw = _canon_col(want[col])
        for b in cg:
            hg.update(b + b"\x1f")
        for b in cw:
            hw.update(b + b"\x1f")
        for i, (a, b) in enumerate(zip(cg, cw)):
            if a != b:
                return False, (
                    f"col {col!r} row {i}: ray={got[col].iloc[i]!r} "
                    f"({a[:40]!r}) vs oracle={want[col].iloc[i]!r} ({b[:40]!r})"
                )
    return hg.hexdigest() == hw.hexdigest(), None


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
        equal, diff = frames_hash_equal(got, want)
        if equal:
            print(f"ok   {name}: rows={len(got)} ({dt:.1f}s, hash-exact)")
        else:
            print(f"FAIL {name}: hash mismatch — {diff}")
            failures += 1
    ray.shutdown()
    return failures


if __name__ == "__main__":
    sys.exit(main())
