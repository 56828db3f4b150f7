"""Z-order (Morton-curve) clustered Parquet layout + data-skipping reads.

Multi-column box predicates (``10 <= a <= 20 AND 3 <= b <= 5``) cannot
be served well by a single-column sort: a layout sorted on ``a`` prunes
nothing for ``b``. Interleaving the bits of linearly-quantized column
codes (the public Morton/Z-order technique used by Delta Lake's
``OPTIMIZE ZORDER BY`` and BigQuery clustering) makes rows that are
close in EVERY dimension land in the same file, so per-file min/max
statistics prune a box query down to a small file subset on all
z-columns at once.

Shape: one narrow min/max pass over the z-columns (driver reduces a few
scalars per block), a vectorized 16-bit quantize + bit-interleave
kernel per batch, then the TeraSort-style sample → route → local-sort
exchange (same pipeline as ``sinks.range_partition_write``). Each file
records min/max for every z-column in ``_MANIFEST.json`` — a pruning
read is ONE manifest read, never a per-file footer RPC (at 100 TB that
is 1 JSON object vs 10^5 metadata round-trips).

Pruning is file-level and conservative: a kept file may still contain
non-matching rows (the caller applies the exact predicate per batch);
a skipped file provably contains none.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any

import numpy as np
import pyarrow as pa

_BITS = 16  # per-column code width; k columns use k*16 <= 64 bits


def _stat_down(v: Any) -> float:
    """Conservative float64 for a manifest MIN: an int64 beyond 2^53
    can round UP under float(), which would let pruning wrongly skip a
    file whose true min matches the box — nudge down one ulp instead.
    (Python compares int to float exactly, so the check is precise.)"""
    f = float(v)
    if isinstance(v, int) and f > v:
        f = float(np.nextafter(f, -np.inf))
    return f


def _stat_up(v: Any) -> float:
    f = float(v)
    if isinstance(v, int) and f < v:
        f = float(np.nextafter(f, np.inf))
    return f


def interleave_codes(codes: list[np.ndarray]) -> np.ndarray:
    """Bit-interleave k uint64 arrays of 16-bit codes into one uint64
    z-key: output bit ``j*k + i`` is bit ``j`` of column ``i``. 64 shift
    /or ops per batch — no Python per row."""
    k = len(codes)
    if not 1 <= k <= 4:
        raise ValueError(f"z-order supports 1..4 columns, got {k}")
    out = np.zeros(len(codes[0]), dtype=np.uint64)
    for i, c in enumerate(codes):
        for j in range(_BITS):
            bit = (c >> np.uint64(j)) & np.uint64(1)
            out |= bit << np.uint64(j * k + i)
    return out


def _quantize(x: np.ndarray, lo: float, hi: float) -> np.ndarray:
    """Linear 16-bit quantization of a numeric column against its
    global [lo, hi]. Exact values do not matter for correctness (the
    manifest stores REAL min/max) — only for clustering quality."""
    if hi <= lo:
        return np.zeros(len(x), dtype=np.uint64)
    f = (x.astype(np.float64) - lo) * (65535.0 / (hi - lo))
    return np.clip(f, 0.0, 65535.0).astype(np.uint64)


def zorder_write(
    ds: Any,
    cols: list[str],
    out_dir: str,
    num_files: int = 64,
    sample_per_block: int = 256,
    overwrite: bool = False,
) -> list[dict[str, Any]]:
    """Write ``ds`` as ``num_files`` z-order-clustered Parquet files
    under ``out_dir`` with a per-file min/max manifest over ``cols``.
    The z-key is layout-only — it never lands in the data files.
    Returns the manifest (also persisted as ``_MANIFEST.json``).
    Null values in a z-column have no curve position: filter or fill
    them first (raises otherwise, matching range_partition_write)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from patito_ray.validation.checkpoint import _atomic_write

    if not 1 <= len(cols) <= 4:
        raise ValueError(f"z-order supports 1..4 columns, got {len(cols)}")
    if num_files < 1:
        raise ValueError(f"num_files must be >= 1, got {num_files}")
    if os.path.exists(out_dir):
        if not overwrite:
            raise FileExistsError(f"{out_dir} exists; pass overwrite=True")
        shutil.rmtree(out_dir)

    # pass 1: global min/max per z-column (a few scalars per block)
    def minmax(t: pa.Table) -> pa.Table:
        cols_out: dict[str, Any] = {}
        if t.num_rows == 0:
            return pa.schema(
                [(f"{c}_{b}", pa.float64()) for c in cols for b in ("min", "max")]
            ).empty_table()
        for c in cols:
            col = t.column(c)
            if col.null_count:
                raise ValueError(
                    f"zorder_write: null {c!r} values have no curve "
                    "position; filter or fill them first"
                )
            mm = pc.min_max(col)
            cols_out[f"{c}_min"] = pa.array(
                [mm["min"].as_py()], pa.float64()
            )
            cols_out[f"{c}_max"] = pa.array([mm["max"].as_py()], pa.float64())
        return pa.table(cols_out)

    parts = [
        t
        for t in ds.map_batches(
            minmax, batch_format="pyarrow", batch_size=None
        ).iter_batches(batch_format="pyarrow")
        if t.num_rows
    ]
    if not parts:
        raise ValueError("zorder_write: dataset is empty")
    mm_tab = pa.concat_tables(parts)
    lo = {c: pc.min(mm_tab.column(f"{c}_min")).as_py() for c in cols}
    hi = {c: pc.max(mm_tab.column(f"{c}_max")).as_py() for c in cols}

    def add_z(t: pa.Table) -> pa.Table:
        codes = [
            _quantize(
                t.column(c).to_numpy(zero_copy_only=False), lo[c], hi[c]
            )
            for c in cols
        ]
        # int64 view: Ray block building rejects uint64 > 2^63; the
        # view preserves ORDER here because k*16 <= 62 bits keeps the
        # sign bit clear for k <= 3 — for k == 4 (64 bits) shift to
        # signed order by flipping the top bit
        z = interleave_codes(codes)
        if len(cols) == 4:
            z ^= np.uint64(1) << np.uint64(63)
        return t.append_column(
            "_z", pa.array(z.view(np.int64), type=pa.int64())
        )

    # sample → route → local-sort (TeraSort shape, same as range write)
    def sample(t: pa.Table) -> pa.Table:
        col = t.column("_z")
        n = len(col)
        if n == 0:
            return pa.table({"_z": col})
        step = max(1, n // sample_per_block)
        return pa.table({"_z": col.take(list(range(0, n, step)))})

    with_z = ds.map_batches(add_z, batch_format="pyarrow", batch_size=None)
    sample_tabs = [
        t
        for t in with_z.map_batches(
            sample, batch_format="pyarrow", batch_size=None
        ).iter_batches(batch_format="pyarrow")
        if t.num_rows
    ]
    keys_np = np.sort(
        pa.concat_tables(sample_tabs).column("_z").to_numpy(zero_copy_only=False)
    )
    cuts = (
        keys_np[
            np.minimum(
                (np.arange(1, num_files) * len(keys_np)) // num_files,
                len(keys_np) - 1,
            )
        ]
        if num_files > 1
        else np.empty(0, dtype=np.int64)
    )

    def route(t: pa.Table) -> pa.Table:
        z = t.column("_z").to_numpy(zero_copy_only=False)
        part = np.searchsorted(cuts, z, side="right").astype(np.int64)
        return t.append_column("_range", pa.array(part, type=pa.int64()))

    tmp = out_dir + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)

    _mschema = pa.schema(
        [("range_id", pa.int64()), ("path", pa.string()), ("rows", pa.int64())]
        + [(f"{c}_{b}", pa.float64()) for c in cols for b in ("min", "max")]
    )

    def write_file(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "_range" not in t.column_names:
            return _mschema.empty_table()
        rid = int(t.column("_range")[0].as_py())
        body = t.sort_by("_z").drop_columns(["_range", "_z"])
        path = os.path.join(tmp, f"part-{rid:05d}.parquet")
        pq.write_table(body, path)
        row: dict[str, Any] = {
            "range_id": [rid],
            "path": [os.path.basename(path)],
            "rows": [body.num_rows],
        }
        for c in cols:
            mm = pc.min_max(body.column(c))
            row[f"{c}_min"] = [_stat_down(mm["min"].as_py())]
            row[f"{c}_max"] = [_stat_up(mm["max"].as_py())]
        return pa.table(row).cast(_mschema)

    manifest_tabs = [
        t
        for t in with_z.map_batches(route, batch_format="pyarrow", batch_size=None)
        .groupby("_range")
        .map_groups(write_file, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
        if t.num_rows
    ]
    manifest = sorted(
        (r for t in manifest_tabs for r in t.to_pylist()),
        key=lambda r: r["range_id"],
    )
    _atomic_write(
        os.path.join(tmp, "_MANIFEST.json"),
        json.dumps({"cols": cols, "files": manifest}).encode(),
    )
    os.rename(tmp, out_dir)
    return manifest


def prune_files(
    out_dir: str, box: dict[str, tuple[float, float]]
) -> tuple[list[str], int]:
    """File paths whose [min, max] intersects EVERY ``box`` interval,
    plus the total file count. One manifest read — no footer RPCs.
    Conservative: kept files may contain non-matching rows; skipped
    files provably contain none."""
    with open(os.path.join(out_dir, "_MANIFEST.json")) as f:
        manifest = json.load(f)
    known = set(manifest["cols"])
    unknown = set(box) - known
    if unknown:
        raise ValueError(
            f"no min/max statistics for column(s) {sorted(unknown)}; "
            f"this layout tracks {sorted(known)}"
        )
    kept = []
    for row in manifest["files"]:
        ok = all(
            row[f"{c}_min"] <= hi_ and row[f"{c}_max"] >= lo_
            for c, (lo_, hi_) in box.items()
        )
        if ok:
            kept.append(os.path.join(out_dir, row["path"]))
    return kept, len(manifest["files"])


def pruned_read(
    out_dir: str,
    box: dict[str, tuple[float, float]],
    columns: list[str] | None = None,
) -> Any:
    """Dataset over only the files a box predicate can touch. The
    caller still applies the EXACT predicate per batch — pruning is an
    I/O optimization, never a filter. An all-pruned box returns an
    empty Dataset with the layout's schema."""
    import ray.data as rd

    from patito_ray.sources.readers import clean_read_parquet

    paths, _total = prune_files(out_dir, box)
    if not paths:
        with open(os.path.join(out_dir, "_MANIFEST.json")) as f:
            any_file = json.load(f)["files"][0]["path"]
        import pyarrow.parquet as pq

        schema = pq.read_schema(os.path.join(out_dir, any_file))
        if columns is not None:
            schema = pa.schema([schema.field(c) for c in columns])
        return rd.from_arrow(schema.empty_table())
    return clean_read_parquet(paths, columns=columns)
