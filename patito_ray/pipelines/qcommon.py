"""Shared helpers + the QUERIES registry dict for the per-domain
query modules (split from pipelines/queries.py; see queries.py for
the aggregation order that fixes registration order)."""

from __future__ import annotations

import datetime
from typing import Any, Callable, Literal
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import patito_ray as pr
from patito_ray.functions import dedup as f_dedup
from patito_ray.functions import similarity as f_sim
from patito_ray.functions import text as f_text
from patito_ray.pipelines.webpage import validate_webpages
from patito_ray.stages.agg import merge_partial_sums
from patito_ray.validation.engine import duplicate_count_distributed
from patito_ray.validation.stats import (
    column_stats,
    drift_check,
    profile_dataset_split,
)

#: name -> (query callable, oracle SQL or None); populated by the
#: chunk modules in import order (queries.py fixes that order)
QUERIES: dict[str, tuple[Callable[[str], Any], str | None]] = {}


def _tmp_dir(tag: str, sf_dir: str) -> str:
    """Stable bounded scratch dir per (tag, sf_dir): str hash() is
    process-randomized (PYTHONHASHSEED), which would leak one new dir
    per process — digest the path instead."""
    import hashlib

    h = hashlib.blake2b(sf_dir.encode(), digest_size=4).hexdigest()
    return f"/tmp/patito_ray_{tag}_{h}"


def _rp(sf_dir: str, table: str, columns: list[str] | None = None) -> Any:
    from patito_ray.sources.readers import clean_read_parquet

    return clean_read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _one_row(**cols: Any) -> pa.Table:
    return pa.table({k: [v] for k, v in cols.items()})


def _apply(final: Any, fn: Callable[[pa.Table], pa.Table]) -> Any:
    """Apply a finishing batch fn to an adaptive-merge result (local
    pa.Table from the driver path, lazy Dataset from the shuffle path)."""
    if isinstance(final, pa.Table):
        return fn(final)
    return final.map_batches(fn, batch_format="pyarrow", batch_size=None)


def _r(arr: Any, nd: int) -> Any:
    """DuckDB-bit-identical rounding: floor(|x|·10^nd + ½)/10^nd with
    the sign restored — DuckDB's own DOUBLE ROUND algorithm (verified
    bit-equal on 8k random values at nd ≤ 6). Round 5 retired the old
    pc.round(half_towards_infinity) body: at money magnitudes pc.round
    RETURNS ITS INPUT (527868276.59000003 stays …03), so a 1-ulp
    summation-order skew in the pre-round double survived rounding and
    hash-mismatched the oracle, while the floor formula collapses both
    inputs to the same post-round double."""
    return _ra(arr, nd)


def _rf(v: float, nd: int) -> float:
    import math

    f = 10.0 ** nd
    return math.copysign(math.floor(abs(v) * f + 0.5), v) / f


def _ra(arr: Any, nd: int) -> Any:
    """Vectorized `_rf` — bit-exact with DuckDB's DOUBLE ROUND
    (floor(|x|*10^nd + 0.5)/10^nd). At nd >= 9, pc.round's
    half_towards_infinity lands one ulp AWAY from DuckDB's quotient
    (e.g. 3e-4: pc.round returns the input, DuckDB returns the nearest
    double to the decimal) — hash-fatal. Nulls stay NULLS (to_numpy
    turns them into NaN, which SQL ROUND(NULL) would report as NULL —
    the mask restores them)."""
    f = 10.0 ** nd
    if isinstance(arr, np.ndarray):
        return pa.array(
            np.copysign(np.floor(np.abs(arr.astype(np.float64)) * f + 0.5), arr) / f,
            type=pa.float64(),
        )
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    x = arr.to_numpy(zero_copy_only=False).astype(np.float64)
    out = np.copysign(np.floor(np.abs(x) * f + 0.5), x) / f
    if arr.null_count:
        mask = np.asarray(pc.is_null(arr))
        return pa.array(out, type=pa.float64(), mask=mask)
    return pa.array(out, type=pa.float64())


def _lazy_norm(ds: Any, schema: pa.Schema, round_col: str | None = None, nd: int = 4) -> Any:
    """Normalize a pair-result Dataset to a canonical schema
    (optionally rounding one float column like the oracle), block by
    block — never a driver loop over the pairs. The result is
    materialized (blocks stay in the OBJECT STORE, not driver heap);
    a 0-row outcome returns a typed empty Table because
    ``Dataset.to_pandas()`` loses column names on any empty dataset."""

    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return schema.empty_table()
        cols = {}
        for f in schema:
            c = pc.cast(t[f.name].combine_chunks(), f.type)
            if f.name == round_col:
                c = _r(c, nd)
            cols[f.name] = c
        return pa.table(cols, schema=schema)

    out = ds.map_batches(fn, batch_format="pyarrow", batch_size=None).materialize()
    if out.count() == 0:
        return schema.empty_table()
    return out
