"""Bucketed table storage: pay the join shuffle ONCE, at write time.

A fact table that is joined on the same key every day should not pay an
all-to-all exchange per query. ``bucketed_write`` hash-partitions rows
on the join key into ``num_buckets`` files (one exchange, at ingest);
two tables bucketed with the SAME bucket count and hash then co-locate
every key by construction, so ``bucketed_join`` reads bucket i of each
side in one task and joins locally — ZERO data movement at query time,
the Hive/Spark bucketed-join layout. Bucket counts must match (the
manifest records them; a mismatch raises — silently rehashing one side
would reintroduce the shuffle this layout exists to avoid).
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any

import pyarrow as pa


def bucketed_write(
    ds: Any,
    key: str,
    out_dir: str,
    num_buckets: int = 64,
    overwrite: bool = False,
) -> dict[str, Any]:
    """One hash exchange on ``key`` → ``bucket-{i:05d}.parquet`` files
    + ``_BUCKETS.json``. Null keys are rejected (they have no bucket).
    Returns ``{"rows", "buckets"}``."""
    import pyarrow.parquet as pq

    from patito_ray.stages.exchange import hash_partition_ids
    from patito_ray.validation.checkpoint import _atomic_write

    if num_buckets < 1:
        raise ValueError(f"num_buckets must be >= 1, got {num_buckets}")
    if os.path.exists(out_dir):
        if not overwrite:
            raise FileExistsError(f"{out_dir} exists; pass overwrite=True")
        shutil.rmtree(out_dir)
    tmp = out_dir + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)

    def route(t: pa.Table) -> pa.Table:
        pid = hash_partition_ids(t.column(key), num_buckets, f"bucket key {key}")
        return t.append_column("_bucket", pa.array(pid, type=pa.int64()))

    def write_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "_bucket" not in t.column_names:
            return pa.table({"rows": pa.array([], pa.int64())})
        b = int(t.column("_bucket")[0].as_py())
        body = t.drop_columns(["_bucket"])
        final = os.path.join(tmp, f"bucket-{b:05d}.parquet")
        part = os.path.join(tmp, f".tmp-{b:05d}")
        pq.write_table(body, part)
        os.replace(part, final)
        return pa.table({"rows": pa.array([body.num_rows], pa.int64())})

    rows = sum(
        int(v)
        for t in ds.map_batches(route, batch_format="pyarrow", batch_size=None)
        .groupby("_bucket")
        .map_groups(write_bucket, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
        for v in t.column("rows").to_pylist()
    )
    _atomic_write(
        os.path.join(tmp, "_BUCKETS.json"),
        json.dumps({"key": key, "num_buckets": num_buckets}).encode(),
    )
    os.rename(tmp, out_dir)
    return {"rows": rows, "buckets": num_buckets}


def _meta(d: str) -> dict[str, Any]:
    with open(os.path.join(d, "_BUCKETS.json")) as f:
        return json.load(f)


def bucketed_join(
    left_dir: str,
    right_dir: str,
    how: str = "inner",
    suffix: str = "_r",
) -> Any:
    """Join two bucketed tables on their bucket keys with NO exchange:
    one Ray task per bucket id reads the two co-located files and joins
    locally (polars). Key names may differ between the sides (each
    manifest records its own); bucket counts must match. Returns a lazy
    Dataset; a bucket file absent on one side is an empty side (inner
    drops, left null-fills)."""
    import polars as pl
    import pyarrow.parquet as pq
    import ray.data as rd

    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    ml, mr = _meta(left_dir), _meta(right_dir)
    if ml["num_buckets"] != mr["num_buckets"]:
        raise ValueError(
            f"bucket counts differ ({ml['num_buckets']} vs "
            f"{mr['num_buckets']}); co-located joins need identical "
            "bucketing — rewrite one side"
        )
    lk, rk = ml["key"], mr["key"]
    P = ml["num_buckets"]

    def join_bucket(t: pa.Table) -> pa.Table:
        outs = []
        for b in t.column("bucket").to_pylist():
            lp = os.path.join(left_dir, f"bucket-{int(b):05d}.parquet")
            rp = os.path.join(right_dir, f"bucket-{int(b):05d}.parquet")
            if not os.path.exists(lp):
                continue
            left = pl.from_arrow(pq.read_table(lp))
            if os.path.exists(rp):
                right = pl.from_arrow(pq.read_table(rp))
            else:
                right = pl.from_arrow(pq.read_schema(
                    os.path.join(right_dir, _any_bucket(right_dir))
                ).empty_table())
            joined = left.join(
                right, left_on=lk, right_on=rk, how=how, suffix=suffix
            )
            outs.append(joined.to_arrow())
        if not outs:
            return pa.table({})
        return pa.concat_tables(outs, promote_options="permissive")

    ids = pa.table({"bucket": pa.array(range(P), pa.int64())})
    return (
        rd.from_arrow(ids)
        .repartition(P)
        .map_batches(join_bucket, batch_format="pyarrow", batch_size=None)
    )


def _any_bucket(d: str) -> str:
    for n in sorted(os.listdir(d)):
        if n.endswith(".parquet"):
            return n
    raise FileNotFoundError(f"no bucket files under {d!r}")
