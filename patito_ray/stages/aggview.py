"""Incrementally-maintained materialized aggregate views.

A grouped-sum dashboard over a 100-TB fact table cannot re-run GROUP BY
over the whole table every time a day of data lands. A materialized
view holds the current per-group sums hash-partitioned on the group
key; a refresh aggregates ONLY the delta (one streaming pass over the
new rows) and folds it into the partition files whose keys the delta
actually touches — cost O(delta) + O(touched view partitions), never
O(base). Additive aggregates only (sums and counts — the mergeable-
monoid rule the whole validation engine is built on); retractions are
negative deltas, which fold through the same path.

Layout: ``out_dir/part-{pid:05d}.parquet`` + ``_VIEW.json`` manifest
(keys, sums, num_partitions, hash seed). The same key always hashes to
the same partition, so a trickle delta with few distinct keys rewrites
few files; partition rewrites are atomic (tmp + rename) and
parallelized one Ray task per touched partition.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any

import pyarrow as pa

_SEED = 7


def _pid_expr(keys: list[str], num_partitions: int) -> Any:
    import polars as pl

    return (
        pl.concat_str([pl.col(k).cast(pl.Utf8) for k in keys], separator="\x1f")
        .hash(seed=_SEED)
        .mod(num_partitions)
        .cast(pl.Int64)
        .alias("_pid")
    )


def _delta_agg(ds: Any, keys: list[str], sums: list[str]) -> pa.Table:
    """One streaming pass: per-batch grouped partials, adaptive merge,
    local table out (a delta's distinct-key set is small next to the
    base — the trickle contract, same as sinks.upsert_partitioned)."""
    import polars as pl

    from patito_ray.stages.agg import collect_table, merge_partial_sums

    def partial(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(t.select(keys + sums))
            .group_by(keys)
            .agg([pl.col(s).sum() for s in sums])
            .to_arrow()
        )

    merged = merge_partial_sums(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        keys,
        sums,
    )
    if isinstance(merged, pa.Table):
        return merged
    return collect_table(
        merged,
        empty_schema=pa.schema(
            [(k, pa.string()) for k in keys] + [(s, pa.int64()) for s in sums]
        ),
    )


def create_agg_view(
    ds: Any,
    keys: list[str],
    sums: list[str],
    out_dir: str,
    num_partitions: int = 32,
    overwrite: bool = False,
) -> dict[str, Any]:
    """Materialize the grouped-sum view of ``ds`` under ``out_dir``.
    Null group keys are rejected (they have no stable hash partition).
    Returns ``{"groups", "partitions"}``."""
    import polars as pl
    import pyarrow.parquet as pq

    from patito_ray.validation.checkpoint import _atomic_write

    if os.path.exists(out_dir):
        if not overwrite:
            raise FileExistsError(f"{out_dir} exists; pass overwrite=True")
        shutil.rmtree(out_dir)
    agg = _delta_agg(ds, keys, sums)
    for k in keys:
        if agg.num_rows and agg.column(k).null_count:
            raise ValueError(
                f"group key {k!r} contains nulls; a null key has no "
                "stable hash partition — filter or fill first"
            )
    tmp = out_dir + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)
    df = pl.from_arrow(agg).with_columns(_pid_expr(keys, num_partitions))
    for (pid,), part in df.group_by("_pid"):
        pq.write_table(
            part.drop("_pid").to_arrow(),
            os.path.join(tmp, f"part-{int(pid):05d}.parquet"),
        )
    _atomic_write(
        os.path.join(tmp, "_VIEW.json"),
        json.dumps(
            {
                "keys": keys,
                "sums": sums,
                "num_partitions": num_partitions,
                "seed": _SEED,
            }
        ).encode(),
    )
    os.rename(tmp, out_dir)
    return {"groups": agg.num_rows, "partitions": df["_pid"].n_unique()}


def refresh_agg_view(out_dir: str, delta: Any) -> dict[str, Any]:
    """Fold a delta Dataset into the view: aggregate the delta (one
    streaming pass), then rewrite ONLY the partitions whose keys appear
    in it — one Ray task per touched partition, atomic file swap.
    Groups new to the view insert; sums are additive, so out-of-order
    or repeated-window deltas fold correctly as long as each fact row
    is delivered exactly once (the caller's CDC contract).

    Retry-safe: a fold is ADDITIVE, so a Ray task that wrote its file
    and then died would double-fold on retry. Every refresh gets an id
    (digest of the delta content + the view's refresh counter); each
    partition file records the last refresh id folded into it in its
    Parquet metadata, and a fold that finds its own id already recorded
    skips — exactly-once per partition. Single-writer; a refresh that
    crashed mid-way must be RE-RUN (same delta) before issuing a new
    one, so every partition reaches the same state."""
    import hashlib

    import polars as pl
    import pyarrow.parquet as pq
    import ray

    with open(os.path.join(out_dir, "_VIEW.json")) as f:
        meta = json.load(f)
    keys, sums = meta["keys"], meta["sums"]
    agg = _delta_agg(delta, keys, sums)
    if agg.num_rows == 0:
        return {"partitions_touched": 0, "groups_updated": 0}
    for k in keys:
        if agg.column(k).null_count:
            raise ValueError(
                f"group key {k!r} contains nulls; a null key has no "
                "stable hash partition — filter or fill first"
            )
    # canonical row order: group_by output order is nondeterministic,
    # and the refresh id must hash IDENTICALLY when a crashed refresh
    # is re-run with the same delta
    df = (
        pl.from_arrow(agg)
        .with_columns(_pid_expr(keys, meta["num_partitions"]))
        .sort(keys)
    )
    seq = int(meta.get("refreshes", 0)) + 1
    h = hashlib.blake2b(digest_size=12)
    h.update(str(seq).encode())
    sink = pa.BufferOutputStream()
    dt = df.to_arrow()
    with pa.ipc.new_stream(sink, dt.schema) as w:
        w.write_table(dt)
    h.update(sink.getvalue())
    rid = h.hexdigest()
    delta_ref = ray.put(dt)

    @ray.remote
    def _fold(pid: int) -> int:
        import pyarrow.compute as pc_

        d = ray.get(delta_ref)
        mine = pl.from_arrow(
            d.filter(pc_.equal(d.column("_pid"), pid))
        ).drop("_pid")
        path = os.path.join(out_dir, f"part-{pid:05d}.parquet")
        frames = [mine]
        if os.path.exists(path):
            existing = pq.read_table(path)
            md = existing.schema.metadata or {}
            if md.get(b"refresh_id", b"").decode() == rid:
                return mine.height  # this refresh already folded here
            frames.append(pl.from_arrow(existing))
        merged = (
            pl.concat(frames)
            .group_by(keys)
            .agg([pl.col(s).sum() for s in sums])
            .to_arrow()
        )
        merged = merged.replace_schema_metadata({"refresh_id": rid})
        tmp = f"{out_dir}/.tmp-{pid:05d}"
        pq.write_table(merged, tmp)
        os.replace(tmp, path)
        return mine.height

    pids = sorted(int(p) for p in df["_pid"].unique())
    updated = ray.get([_fold.remote(pid) for pid in pids])
    meta["refreshes"] = seq
    from patito_ray.validation.checkpoint import _atomic_write

    _atomic_write(
        os.path.join(out_dir, "_VIEW.json"),
        json.dumps(meta, sort_keys=True).encode(),
    )
    return {"partitions_touched": len(pids), "groups_updated": int(sum(updated))}


def read_agg_view(out_dir: str) -> Any:
    """The view's current state as a Dataset (one narrow row per group)."""
    from patito_ray.sources.readers import clean_read_parquet

    paths = sorted(
        os.path.join(out_dir, n)
        for n in os.listdir(out_dir)
        if n.endswith(".parquet")
    )
    if not paths:
        raise FileNotFoundError(f"view {out_dir!r} has no partitions")
    return clean_read_parquet(paths)
