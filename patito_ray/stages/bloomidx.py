"""Per-file Bloom-filter data skipping for point-lookup reads.

Z-order manifests (stages/zorder.py) prune RANGE predicates on
clustered layouts; a per-file Bloom over a high-cardinality key prunes
EQUALITY predicates on layouts that are NOT clustered by that key —
the lakehouse "bloom filter index". Each written file carries a
fixed-size bitmap in a ``.bloom`` sidecar (geometry in
``_MANIFEST.json``); a point lookup touches only files whose bloom may
contain one of the probed keys. No false negatives: a pruned file
provably holds no matching row, so the exact per-batch filter stays
correct — pruning is pure I/O savings, like the z-order path.

Scale shape: blooms build INSIDE the per-file write task (one pass
over the rows it is writing anyway); the prune step reads one manifest
plus ``#files`` small sidecars and probes each with one vectorized
``contains_hashes`` gather per file — at 10^5+ files, shard the prune
loop (it is embarrassingly parallel over files).
"""

from __future__ import annotations

import base64
import json
import os
import shutil
from typing import Any

import numpy as np
import pyarrow as pa

from patito_ray.state.sketches import BloomFilter, hash64


def bloom_index_write(
    ds: Any,
    key_col: str,
    out_dir: str,
    num_files: int = 64,
    fp_rate: float = 0.01,
    overwrite: bool = False,
) -> list[dict[str, Any]]:
    """Write ``ds`` as ``num_files`` Parquet files, each with a Bloom
    sidecar over ``key_col``. Rows are HASH-routed by key
    (``hash64(key) % num_files``): file sizes stay uniform, every
    key's rows land in exactly one file, and file key-RANGES all span
    the domain — min/max stats cannot prune a point lookup here, the
    bitmap is the only skipping mechanism (readers never assume the
    routing; the bloom answers). Null keys raise (membership must be a
    pure function of the key). The directory is written to
    ``<out_dir>.tmp`` and renamed into place atomically (a crashed
    write never leaves a readable half-layout). The manifest records a
    SENTINEL hash so a layout written under a different hash build
    (polars seeds its hash per version) fails loudly on probe instead
    of silently false-negating. Returns the manifest rows."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from patito_ray.validation.checkpoint import _atomic_write

    if num_files < 1:
        raise ValueError(f"num_files must be >= 1, got {num_files}")
    if not 0.0 < fp_rate < 0.5:
        raise ValueError(f"fp_rate must be in (0, 0.5), got {fp_rate}")
    if os.path.exists(out_dir):
        if not overwrite:
            raise FileExistsError(f"{out_dir} exists; pass overwrite=True")
        shutil.rmtree(out_dir)

    def route(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("_fid", pa.array([], pa.int64()))
        col = t.column(key_col)
        if col.null_count:
            raise ValueError(
                f"bloom_index_write: key column {key_col!r} contains "
                f"{col.null_count} null(s); filter or fill them first"
            )
        fid = (hash64(col) % np.uint64(num_files)).view(np.int64)
        return t.append_column("_fid", pa.array(fid, pa.int64()))

    tmp = out_dir + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)

    _mschema = pa.schema(
        [
            ("fid", pa.int64()),
            ("path", pa.string()),
            ("rows", pa.int64()),
            ("m_bits", pa.int64()),
            ("k", pa.int64()),
        ]
    )

    def write_file(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "_fid" not in t.column_names:
            return _mschema.empty_table()
        fid = int(t.column("_fid")[0].as_py())
        body = t.drop_columns(["_fid"])
        name = f"part-{fid:05d}.parquet"
        pq.write_table(body, os.path.join(tmp, name))
        b = BloomFilter(max(body.num_rows, 1), fp_rate)
        b.add_hashes(hash64(body.column(key_col)))
        with open(os.path.join(tmp, name + ".bloom"), "wb") as f:
            f.write(b.state())
        return pa.table(
            {
                "fid": [fid],
                "path": [name],
                "rows": [body.num_rows],
                "m_bits": [int(b.m_bits)],
                "k": [int(b.k)],
            }
        ).cast(_mschema)

    manifest_tabs = [
        t
        for t in ds.map_batches(route, batch_format="pyarrow", batch_size=None)
        .groupby("_fid")
        .map_groups(write_file, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
        if t.num_rows
    ]
    if not manifest_tabs:
        raise ValueError("bloom_index_write: dataset is empty")
    manifest = sorted(
        (r for t in manifest_tabs for r in t.to_pylist()),
        key=lambda r: r["fid"],
    )
    _atomic_write(
        os.path.join(tmp, "_MANIFEST.json"),
        json.dumps(
            {
                "key_col": key_col,
                "fp_rate": fp_rate,
                # probe-time guard: hash64 must produce the same bits
                # it produced at write time (polars hash is stable only
                # within a build) — verified before any bloom is trusted
                "sentinel_hash": int(_SENTINEL_HASH()),
                "files": manifest,
            }
        ).encode(),
    )
    os.rename(tmp, out_dir)
    return manifest


def _probe_hashes(keys: Any) -> np.ndarray:
    arr = keys if isinstance(keys, (pa.Array, pa.ChunkedArray)) else pa.array(keys)
    return hash64(arr)


def _SENTINEL_HASH() -> np.uint64:
    return hash64(pa.array([0], pa.int64()))[0]


def bloom_prune(
    out_dir: str, keys: Any, _manifest: "dict | None" = None
) -> tuple[list[str], int]:
    """File paths whose Bloom MAY contain any of ``keys`` (pa array or
    python list), plus the total file count. Skipped files provably
    contain none of the keys; kept files may still miss (the caller
    applies the exact filter). Raises if the layout was written under
    a DIFFERENT hash build (sentinel mismatch) — a silently different
    hash would turn the no-false-negative guarantee into data loss."""
    manifest = _manifest
    if manifest is None:
        with open(os.path.join(out_dir, "_MANIFEST.json")) as f:
            manifest = json.load(f)
    stored = manifest.get("sentinel_hash")
    if stored is not None and int(_SENTINEL_HASH()) != int(stored):
        raise ValueError(
            f"bloom layout {out_dir!r} was written under a different "
            "hash build (sentinel mismatch); rebuild the layout — "
            "probing it would silently drop real rows"
        )
    total = len(manifest["files"])
    h = _probe_hashes(keys)
    if not len(h):
        return [], total
    kept = []
    for row in manifest["files"]:
        b = BloomFilter.__new__(BloomFilter)
        b.m_bits, b.k = int(row["m_bits"]), int(row["k"])
        with open(os.path.join(out_dir, row["path"] + ".bloom"), "rb") as f:
            b.words = np.frombuffer(f.read(), dtype=np.uint64)
        if bool(b.contains_hashes(h).any()):
            kept.append(os.path.join(out_dir, row["path"]))
    return kept, total


def bloom_pruned_read(
    out_dir: str, keys: Any, columns: list[str] | None = None
) -> Any:
    """Dataset over only the files a key-set lookup can touch, with the
    EXACT ``is_in`` filter applied per batch — bit-identical to a full
    scan + filter, minus the skipped I/O. All-pruned lookups return an
    empty Dataset with the layout's schema."""
    import pyarrow.compute as pc
    import ray.data as rd

    from patito_ray.sources.readers import clean_read_parquet

    with open(os.path.join(out_dir, "_MANIFEST.json")) as f:
        manifest = json.load(f)
    key_col = manifest["key_col"]
    key_arr = (
        keys if isinstance(keys, (pa.Array, pa.ChunkedArray)) else pa.array(keys)
    )

    paths, _total = bloom_prune(out_dir, key_arr, _manifest=manifest)
    if not paths:
        import pyarrow.parquet as pq

        schema = pq.read_schema(
            os.path.join(out_dir, manifest["files"][0]["path"])
        )
        if columns is not None:
            schema = pa.schema([schema.field(c) for c in columns])
        return rd.from_arrow(schema.empty_table())

    read_cols = columns
    if columns is not None and key_col not in columns:
        read_cols = columns + [key_col]

    def exact(t: pa.Table) -> pa.Table:
        out = t.filter(pc.is_in(t.column(key_col), value_set=key_arr))
        if columns is not None:
            out = out.select(columns)
        return out

    return clean_read_parquet(paths, columns=read_cols).map_batches(
        exact, batch_format="pyarrow", batch_size=None
    )
