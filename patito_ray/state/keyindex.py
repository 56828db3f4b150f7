"""Persisted cross-run uniqueness index.

The engine's fused pass resolves uniqueness WITHIN one corpus via the
bucketed 8 B/key blob exchange. A recurring crawl additionally needs
"was this key ever seen in ANY previous run?" without re-reading old
corpora — at 10^12 documents the history is far bigger than the delta.
This module persists the seen-key set as hash-partitioned sorted
key-hash files; checking a new run costs one narrow exchange over the
DELTA plus one read/rewrite of each touched bucket — O(delta + index),
never O(all past corpora re-scanned), and buckets scale the index
beyond any single node's memory.

Layout: ``index_dir/bucket-{bid:05d}.parquet`` (one sorted int64
column ``h`` = hash64 key hashes) + ``_INDEX.json`` manifest
(num_buckets, refreshes, total_keys). Same 64-bit key-hash contract as
the engine's uniqueness check (hash collisions ~n^2/2^64 — the
documented engine-wide tradeoff).

Retry safety (the additive-fold contract, CLAUDE.md): a fold is
idempotent per bucket via a refresh id — blake2b(seq, bucket id,
canonically-SORTED delta (h, n) bytes) — recorded in the bucket file's
Parquet metadata TOGETHER with that refresh's stats row; a retried
task that finds its own id replays the recorded stats instead of
recomputing against the already-folded file (which would see its own
keys and miscount cross-run duplicates).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
from typing import Any

import numpy as np
import pyarrow as pa

_MANIFEST = "_INDEX.json"

_STATS_SCHEMA = pa.schema(
    [
        ("n_rows", pa.int64()),
        ("distinct_keys", pa.int64()),
        ("new_keys", pa.int64()),
        ("dup_keys_within_run", pa.int64()),
        ("dup_rows_within_run", pa.int64()),
        ("dup_keys_vs_index", pa.int64()),
        ("dup_rows_vs_index", pa.int64()),
    ]
)


def create_key_index(index_dir: str, num_buckets: int = 64, overwrite: bool = False) -> None:
    """Initialise an empty index. Bucket files are created lazily on
    the first update that touches them."""
    from patito_ray.validation.checkpoint import _atomic_write

    if num_buckets < 1:
        raise ValueError(f"num_buckets must be >= 1, got {num_buckets}")
    if os.path.exists(index_dir):
        if not overwrite:
            raise FileExistsError(f"{index_dir} exists; pass overwrite=True")
        shutil.rmtree(index_dir)
    os.makedirs(index_dir)
    _atomic_write(
        os.path.join(index_dir, _MANIFEST),
        json.dumps(
            {"num_buckets": num_buckets, "refreshes": 0, "total_keys": 0}
        ).encode(),
    )


def _read_manifest(index_dir: str) -> dict[str, Any]:
    path = os.path.join(index_dir, _MANIFEST)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"{path} missing — create_key_index first (or wrong directory)"
        )
    with open(path) as f:
        return json.load(f)


def key_index_update(
    ds: Any, key_col: str, index_dir: str, fold: bool = True
) -> pa.Table:
    """Check ``ds``'s ``key_col`` against the index and (when ``fold``)
    absorb its distinct key hashes. Returns ONE summary row:

    - ``n_rows`` / ``distinct_keys`` — delta volume;
    - ``new_keys`` — keys never seen in any previous run;
    - ``dup_keys_within_run`` / ``dup_rows_within_run`` — keys occurring
      more than once in THIS delta / their rows beyond the first;
    - ``dup_keys_vs_index`` / ``dup_rows_vs_index`` — keys already in
      the index / ALL delta rows carrying such a key.

    Single-writer per index; a crashed update must be re-run with the
    SAME delta before issuing a new one (per-bucket refresh ids make
    the re-run exactly-once)."""
    import polars as pl
    import pyarrow.parquet as pq

    from patito_ray.stages.agg import collect_table
    from patito_ray.state.sketches import hash64

    meta = _read_manifest(index_dir)
    B = int(meta["num_buckets"])
    seq = int(meta["refreshes"]) + 1

    def narrow(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "bucket": pa.array([], pa.int64()),
                    "h": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        col = t.column(key_col)
        if col.null_count:
            raise ValueError(
                f"key column {key_col!r} contains nulls; a null key has "
                "no identity — filter or fill first"
            )
        h = hash64(col)
        agg = (
            pl.DataFrame({"h": h.view(np.int64)})
            .group_by("h")
            .agg(pl.len().cast(pl.Int64).alias("n"))
        )
        hv = agg["h"].to_numpy().view(np.uint64)
        return pa.table(
            {
                "bucket": pa.array(
                    (hv % np.uint64(B)).view(np.int64), pa.int64()
                ),
                "h": agg["h"].to_numpy(),
                "n": agg["n"].to_numpy(),
            }
        )

    def bucket_task(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "bucket" not in t.column_names:
            return _STATS_SCHEMA.empty_table()
        bid = int(t.column("bucket")[0].as_py())
        agg = (
            pl.from_arrow(t.select(["h", "n"]))
            .group_by("h")
            .agg(pl.col("n").sum())
            .sort("h")
        )
        h = agg["h"].to_numpy()
        n = agg["n"].to_numpy()
        rid_src = hashlib.blake2b(digest_size=12)
        rid_src.update(f"{seq}:{bid}:".encode())
        rid_src.update(h.tobytes())
        rid_src.update(n.tobytes())
        rid = rid_src.hexdigest()

        path = os.path.join(index_dir, f"bucket-{bid:05d}.parquet")
        old = np.empty(0, dtype=np.int64)
        if os.path.exists(path):
            existing = pq.read_table(path)
            md = existing.schema.metadata or {}
            if md.get(b"refresh_id", b"").decode() == rid:
                # retried task after a completed fold: recomputing now
                # would see our own keys in the index — replay instead
                recorded = json.loads(md.get(b"refresh_stats", b"{}").decode())
                return pa.table(
                    {k: [recorded[k]] for k in _STATS_SCHEMA.names}
                ).cast(_STATS_SCHEMA)
            old = existing.column("h").to_numpy(zero_copy_only=False)

        seen = np.isin(h, old)
        stats = {
            "n_rows": int(n.sum()),
            "distinct_keys": int(h.size),
            "new_keys": int(h.size - np.count_nonzero(seen)),
            "dup_keys_within_run": int(np.count_nonzero(n > 1)),
            "dup_rows_within_run": int(n.sum() - h.size),
            "dup_keys_vs_index": int(np.count_nonzero(seen)),
            "dup_rows_vs_index": int(n[seen].sum()),
        }
        if fold:
            merged = np.sort(np.concatenate([old, h[~seen]]))
            out = pa.table({"h": pa.array(merged, pa.int64())})
            out = out.replace_schema_metadata(
                {"refresh_id": rid, "refresh_stats": json.dumps(stats)}
            )
            tmp = os.path.join(index_dir, f".tmp-{bid:05d}-{rid}")
            pq.write_table(out, tmp)
            os.replace(tmp, path)
        return pa.table({k: [v] for k, v in stats.items()}).cast(_STATS_SCHEMA)

    parted = ds.map_batches(narrow, batch_format="pyarrow", batch_size=None)
    stats_ds = parted.groupby("bucket").map_groups(
        bucket_task, batch_format="pyarrow"
    )
    stats = collect_table(stats_ds, empty_schema=_STATS_SCHEMA)

    summary = pa.table(
        {
            name: [int(stats.column(name).to_numpy(zero_copy_only=False).sum())]
            if stats.num_rows
            else [0]
            for name in _STATS_SCHEMA.names
        }
    ).cast(_STATS_SCHEMA)

    if fold:
        from patito_ray.validation.checkpoint import _atomic_write

        meta["refreshes"] = seq
        meta["total_keys"] = int(meta.get("total_keys", 0)) + int(
            summary.column("new_keys")[0].as_py()
        )
        _atomic_write(
            os.path.join(index_dir, _MANIFEST),
            json.dumps(meta, sort_keys=True).encode(),
        )
    return summary


def key_index_size(index_dir: str) -> dict[str, Any]:
    """Manifest view: {num_buckets, refreshes, total_keys}."""
    return _read_manifest(index_dir)
