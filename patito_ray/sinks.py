"""Resumable partitioned Parquet output.

A 100-TB transform job must be restartable without redoing finished
work: output is laid out as one directory per input shard
(``out_dir/shard=<sid>/``) with a lineage manifest written atomically
AFTER the shard's data lands. A re-run skips every shard whose
manifest exists and re-executes only unfinished ones; a crash
mid-shard leaves a ``.tmp_<sid>`` directory that the next run discards
and rewrites. Shard ids fingerprint the input (path, size) list plus a
caller-supplied transform fingerprint, so changing either the corpus
or the transform re-runs exactly the affected shards — the same
contract as the validation checkpoints (validation/checkpoint.py).

Each shard executes as its own streaming Dataset pipeline (read →
transform → write), so the cluster parallelizes WITHIN a shard; size
``files_per_shard`` so one shard's blocks saturate the cluster (the
shard loop itself is sequential, deliberately: one manifest per
completed unit keeps resume trivially correct).
"""

from __future__ import annotations

import json
import logging
import os
import shutil
import time
from typing import Any, Callable

from patito_ray.validation.checkpoint import _atomic_write, _shard_id, plan_shards

_LOG = logging.getLogger(__name__)


def plan_id(files: list[str], transform_fingerprint: str = "") -> str:
    """Stable fingerprint of a sink plan: the sorted (path, size) input
    list plus the transform fingerprint — the same identity the shard
    ids are derived from. Callers keying caches/output dirs on 'this
    exact job' should use this instead of re-hashing file lists."""
    pairs = sorted((f, os.path.getsize(f)) for f in files)
    return _shard_id(pairs, fingerprint=transform_fingerprint)


def resumable_write_parquet(
    files: list[str],
    out_dir: str,
    transform: Callable[[Any], Any] | None = None,
    files_per_shard: int = 8,
    transform_fingerprint: str = "",
    columns: list[str] | None = None,
) -> dict[str, Any]:
    """Transform + write ``files`` to partitioned parquet, resumably.

    ``transform`` maps a lazy ``ray.data.Dataset`` to a lazy Dataset
    (identity when None); ``columns`` prunes the read so only the
    needed columns leave storage. Returns a summary dict with per-run
    shard counts and total rows written (finished + new). Output rows
    land in ``out_dir/shard=<sid>/``; manifests in
    ``out_dir/_manifests/``.
    """
    import ray.data as rd

    os.makedirs(f"{out_dir}/_manifests", exist_ok=True)
    shards = plan_shards(files, files_per_shard, fingerprint=transform_fingerprint)
    # The current plan is the reader's source of truth: a changed corpus
    # or transform re-plans to NEW shard ids, and read_output must not
    # mix the previous plan's orphaned shard dirs into the result.
    _atomic_write(
        f"{out_dir}/_plan.json",
        json.dumps(
            {
                "transform_fingerprint": transform_fingerprint,
                "shards": [sid for sid, _ in shards],
            }
        ).encode(),
    )

    written = skipped = 0
    total_rows = 0
    for sid, shard_files in shards:
        manifest_path = f"{out_dir}/_manifests/{sid}.json"
        shard_dir = f"{out_dir}/shard={sid}"
        if os.path.exists(manifest_path):
            with open(manifest_path) as f:
                total_rows += json.load(f)["rows"]
            skipped += 1
            continue
        tmp_dir = f"{out_dir}/.tmp_{sid}"
        for stale in (tmp_dir, shard_dir):  # crash leftovers, no manifest
            if os.path.exists(stale):
                _LOG.warning("sink: discarding incomplete %s", stale)
                shutil.rmtree(stale)

        t0 = time.time()
        ds = rd.read_parquet(shard_files, columns=columns)
        if transform is not None:
            ds = transform(ds)
        ds.write_parquet(tmp_dir)
        # a shard whose transform filters out EVERY row writes no files
        # and may not even create the directory — still a completed
        # shard (rows=0), not a crash
        os.makedirs(tmp_dir, exist_ok=True)
        rows = _parquet_dir_rows(tmp_dir)
        os.replace(tmp_dir, shard_dir)
        _atomic_write(
            manifest_path,
            json.dumps(
                {
                    "shard": sid,
                    "inputs": shard_files,
                    "rows": rows,
                    "seconds": round(time.time() - t0, 3),
                    "transform_fingerprint": transform_fingerprint,
                }
            ).encode(),
        )
        total_rows += rows
        written += 1

    return {
        "shards": len(shards),
        "written": written,
        "skipped": skipped,
        "rows": total_rows,
        "out_dir": out_dir,
    }


def _parquet_dir_rows(path: str) -> int:
    """Row count from parquet footers only — no data read."""
    import pyarrow.parquet as pq

    total = 0
    for name in os.listdir(path):
        if name.endswith(".parquet"):
            total += pq.ParquetFile(f"{path}/{name}").metadata.num_rows
    return total


def read_output(out_dir: str, allow_partial: bool = False) -> Any:
    """Read a resumable sink's completed shards back as one Dataset —
    only shards of the CURRENT plan (orphans from a superseded corpus /
    transform fingerprint are ignored with a warning).

    A plan whose write has not finished raises by default — silently
    returning 3 of 10 shards to a consumer that believes it has the
    full output is the one failure mode a resumable sink must not
    have. Pass ``allow_partial=True`` to read whatever has landed."""
    import ray.data as rd

    with open(f"{out_dir}/_plan.json") as f:
        plan = set(json.load(f)["shards"])
    # completion is judged by MANIFESTS (written after the data), not
    # shard dirs: a renamed-but-unmanifested dir is still incomplete
    mdir = f"{out_dir}/_manifests"
    done = {
        name[: -len(".json")]
        for name in (os.listdir(mdir) if os.path.isdir(mdir) else [])
        if name.endswith(".json")
    }
    missing = plan - done
    if missing and not allow_partial:
        raise RuntimeError(
            f"sink output under {out_dir} is incomplete: {len(missing)} of "
            f"{len(plan)} planned shard(s) have no manifest yet — finish the "
            "write (resumable_write_parquet) or pass allow_partial=True"
        )
    on_disk = {d[len("shard=") :] for d in os.listdir(out_dir) if d.startswith("shard=")}
    orphans = on_disk - plan
    if orphans:
        _LOG.warning(
            "sink: ignoring %d orphaned shard dir(s) from a superseded plan under %s",
            len(orphans),
            out_dir,
        )
    # pass the concrete file list: ray.data.read_parquet does not expand
    # a LIST of directories, and the "shard=" naming would otherwise
    # trigger hive-partition inference
    paths = sorted(
        f"{out_dir}/shard={sid}/{name}"
        for sid in on_disk & plan & done
        for name in os.listdir(f"{out_dir}/shard={sid}")
        if name.endswith(".parquet")
    )
    if not paths:
        raise FileNotFoundError(
            f"no completed shard produced any parquet file under {out_dir} "
            "(every row may have been filtered by the transform)"
        )
    # partitioning=None: the shard id is lineage, not a data column —
    # default hive inference would inject a "shard" column from the dir
    return rd.read_parquet(paths, partitioning=None)


def output_manifests(out_dir: str) -> list[dict[str, Any]]:
    """Lineage manifests of every completed shard, sorted by shard id."""
    mdir = f"{out_dir}/_manifests"
    out = []
    for name in sorted(os.listdir(mdir)):
        if name.endswith(".json"):
            with open(f"{mdir}/{name}") as f:
                out.append(json.load(f))
    return out


def compact_parquet(
    in_dir: str,
    out_dir: str,
    target_bytes: int = 256 * 1024 * 1024,
    overwrite: bool = False,
) -> dict[str, Any]:
    """Small-file compaction: rewrite a directory of (typically many
    tiny) Parquet files into files of ~``target_bytes`` each — the
    standard post-ingest maintenance op (a 100-TB table fragmented
    into 10^6 KB-scale files pays footer+task overhead on every read).

    Files are packed into bins by FIRST-FIT over their on-disk sizes
    (driver-side, metadata only), then each bin rewrites as ONE
    streaming read→write task — no shuffle, no driver data path, bins
    execute in parallel via the task pool. Returns
    ``{"files_in", "files_out", "bytes_in"}``. Output is atomic per
    directory: data lands in ``out_dir + '.tmp'`` and renames into
    place, so a crashed compaction never leaves a half-written
    ``out_dir``.
    """
    import glob

    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    if os.path.exists(out_dir):
        if not overwrite:
            raise FileExistsError(
                f"{out_dir} exists; pass overwrite=True to replace it"
            )
        shutil.rmtree(out_dir)
    files = sorted(glob.glob(os.path.join(in_dir, "*.parquet")))
    if not files:
        raise ValueError(f"no parquet files to compact under {in_dir!r}")
    sizes = {f: os.path.getsize(f) for f in files}

    bins: list[list[str]] = []
    space: list[int] = []
    for f in files:
        sz = sizes[f]
        for i, free in enumerate(space):
            if sz <= free:
                bins[i].append(f)
                space[i] -= sz
                break
        else:
            bins.append([f])
            space.append(max(target_bytes - sz, 0))

    tmp = out_dir + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)

    @ray.remote
    def _compact_bin(bin_files: list[str], dest: str) -> int:
        writer = None
        try:
            for f in bin_files:
                pf = pq.ParquetFile(f)
                for g in range(pf.metadata.num_row_groups):
                    tab = pf.read_row_group(g)
                    if writer is None:
                        writer = pq.ParquetWriter(dest, tab.schema)
                    writer.write_table(tab)
        finally:
            if writer is not None:
                writer.close()
        return len(bin_files)

    futures = [
        _compact_bin.remote(b, os.path.join(tmp, f"part-{i:05d}.parquet"))
        for i, b in enumerate(bins)
    ]
    ray.get(futures)
    os.rename(tmp, out_dir)
    return {
        "files_in": len(files),
        "files_out": len(bins),
        "bytes_in": int(sum(sizes.values())),
    }


def range_partition_write(
    ds: Any,
    key: str,
    out_dir: str,
    num_ranges: int = 16,
    sample_per_block: int = 256,
    overwrite: bool = False,
) -> "list[dict[str, Any]]":
    """TeraSort-shape sorted output: write ``ds`` as ``num_ranges``
    range-partitioned files, each internally sorted by ``key``, with
    file ranges disjoint and ascending — so downstream merge joins /
    binary searches read only the ranges they need, and a global sort
    order is recoverable by reading files in range order.

    The classic sample-route-sort pipeline: (1) every block contributes
    up to ``sample_per_block`` evenly-spaced key samples (one streaming
    pass over the key column only); (2) the driver cuts the sample at
    ``num_ranges - 1`` quantile boundaries; (3) one hash-free routing
    exchange sends each row to its ``searchsorted`` range; (4) each
    range sorts locally and writes ONE file plus a manifest row
    (range_id, path, rows, min, max). Data lands in ``out_dir + '.tmp'``
    and renames into place atomically. Returns the manifest (also
    persisted as ``_MANIFEST.json``).

    Skewed keys: a value spanning a boundary routes entirely to one
    range (ranges stay DISJOINT — correctness holds; a pathological
    single-value corpus degrades to one hot range, which is inherent
    to sorted output).
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    if num_ranges < 1:
        raise ValueError(f"num_ranges must be >= 1, got {num_ranges}")
    if os.path.exists(out_dir):
        if not overwrite:
            raise FileExistsError(
                f"{out_dir} exists; pass overwrite=True to replace it"
            )
        shutil.rmtree(out_dir)

    def sample(t: pa.Table) -> pa.Table:
        col = t.column(key)
        n = len(col)
        if n == 0:
            return pa.table({key: col})
        step = max(1, n // sample_per_block)
        return pa.table({key: col.take(list(range(0, n, step)))})

    sample_tabs = [
        t
        for t in ds.map_batches(
            sample, batch_format="pyarrow", batch_size=None
        ).iter_batches(batch_format="pyarrow")
        if t.num_rows
    ]
    if not sample_tabs:
        raise ValueError("range_partition_write: dataset is empty")
    sampled = pa.concat_tables(sample_tabs)
    keys_np = np.sort(sampled.column(key).to_numpy(zero_copy_only=False))
    cuts = (
        keys_np[
            np.minimum(
                (np.arange(1, num_ranges) * len(keys_np)) // num_ranges,
                len(keys_np) - 1,
            )
        ]
        if num_ranges > 1
        else np.empty(0, dtype=keys_np.dtype)
    )

    def route(t: pa.Table) -> pa.Table:
        if t.column(key).null_count:
            raise ValueError(
                f"range_partition_write: null {key!r} values have no sort "
                "position; filter or fill them first"
            )
        k = t.column(key).to_numpy(zero_copy_only=False)
        part = np.searchsorted(cuts, k, side="right").astype(np.int64)
        return t.append_column("_range", pa.array(part, type=pa.int64()))

    tmp = out_dir + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)

    def write_range(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "_range" not in t.column_names:
            return pa.table(
                {
                    "range_id": pa.array([], pa.int64()),
                    "path": pa.array([], pa.string()),
                    "rows": pa.array([], pa.int64()),
                    "min": pa.array([], t.schema.field(key).type if key in t.column_names else pa.null()),
                    "max": pa.array([], t.schema.field(key).type if key in t.column_names else pa.null()),
                }
            )
        rid = int(t.column("_range")[0].as_py())
        body = t.drop_columns(["_range"]).sort_by(key)
        path = os.path.join(tmp, f"part-{rid:05d}.parquet")
        pq.write_table(body, path)
        kc = body.column(key)
        return pa.table(
            {
                "range_id": pa.array([rid], pa.int64()),
                "path": pa.array([os.path.basename(path)], pa.string()),
                "rows": pa.array([body.num_rows], pa.int64()),
                "min": kc.slice(0, 1).combine_chunks(),
                "max": kc.slice(body.num_rows - 1, 1).combine_chunks(),
            }
        )

    manifest_tabs = [
        t
        for t in ds.map_batches(route, batch_format="pyarrow", batch_size=None)
        .groupby("_range")
        .map_groups(write_range, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
        if t.num_rows
    ]
    manifest = sorted(
        (r for t in manifest_tabs for r in t.to_pylist()),
        key=lambda r: r["range_id"],
    )
    _atomic_write(
        os.path.join(tmp, "_MANIFEST.json"),
        json.dumps(manifest, default=str).encode(),
    )
    os.rename(tmp, out_dir)
    return manifest


def upsert_partitioned(
    base_dir: str,
    changes: Any,
    key: str,
    partition_col: str,
    order_col: str,
) -> dict[str, Any]:
    """CDC apply / MERGE-upsert into a hive-partitioned Parquet table
    (``base_dir/<partition_col>=<v>/part.parquet``): each change row
    replaces the base row with its ``key`` (latest ``order_col`` wins,
    within and across batches); new keys insert. ONLY partitions that
    appear in the change set are read and rewritten — at 100 TB a
    trickle of changes touches a handful of partitions, never the
    table. Each touched partition rewrites as one Ray task (read old →
    merge → write new, atomic file swap via os.replace). Returns
    ``{"partitions_touched", "rows_upserted"}``.

    The change stream must carry ``partition_col`` (rows cannot move
    between partitions — the standard constraint; delete+insert to
    move). An absent base partition is created (pure insert).
    """
    import glob

    import pyarrow.parquet as pq
    import ray

    if not os.path.isdir(base_dir):
        raise FileNotFoundError(f"base table {base_dir!r} does not exist")

    ch_tabs = [
        t
        for t in changes.iter_batches(batch_format="pyarrow")
        if t.num_rows
    ]
    if not ch_tabs:
        return {"partitions_touched": 0, "rows_upserted": 0}
    import pyarrow as pa

    ch = pa.concat_tables(ch_tabs)
    for c in (key, partition_col, order_col):
        if c not in ch.column_names:
            raise ValueError(f"changes must carry column {c!r}")
    parts = sorted(set(ch.column(partition_col).to_pylist()))

    ch_ref = ray.put(ch)

    @ray.remote
    def _apply(pv: Any) -> int:
        import pyarrow.compute as pc_

        chg = ray.get(ch_ref)
        mine = chg.filter(pc_.equal(chg.column(partition_col), pv))
        pdir = os.path.join(base_dir, f"{partition_col}={pv}")
        old_files = sorted(glob.glob(os.path.join(pdir, "*.parquet")))
        base = None
        if old_files:
            base = pa.concat_tables(pq.read_table(f) for f in old_files)
            extra = set(base.column_names) - set(mine.column_names)
            if extra:
                # silently dropping base-only columns would be data loss
                raise ValueError(
                    f"{pdir}: base columns {sorted(extra)} missing from the "
                    "change stream; upsert requires identical column sets"
                )
            # align base to the change schema column order
            base = base.select(mine.column_names)
        merged = _merge_latest(mine, base, key, order_col)
        os.makedirs(pdir, exist_ok=True)
        out = os.path.join(pdir, "part.parquet")
        tmp_f = out + ".tmp"
        pq.write_table(merged, tmp_f)
        os.replace(tmp_f, out)
        for f in old_files:
            if f != out:
                os.remove(f)
        return mine.num_rows

    applied = ray.get([_apply.remote(pv) for pv in parts])
    return {
        "partitions_touched": len(parts),
        "rows_upserted": int(sum(applied)),
    }


def _merge_latest(
    mine: "Any", base: "Any | None", key: str, order_col: str
) -> "Any":
    """MERGE kernel shared by the upsert sinks: latest ``order_col``
    per ``key`` wins; on exact order ties the CHANGE row beats the base
    row (changes concat first -> smaller row index). Returns pa.Table."""
    import polars as pl

    frames = [pl.from_arrow(mine)]
    if base is not None:
        frames.append(pl.from_arrow(base))
    return (
        pl.concat(frames)
        .with_row_index("_src")
        .sort([key, order_col, "_src"], descending=[False, True, False])
        .unique(subset=[key], keep="first", maintain_order=True)
        .drop("_src")
        .to_arrow()
    )


def _versions_dir(base_dir: str) -> str:
    return os.path.join(base_dir, "_versions")


def list_versions(base_dir: str) -> list[int]:
    """Snapshot versions present under ``base_dir``, ascending."""
    vdir = _versions_dir(base_dir)
    if not os.path.isdir(vdir):
        return []
    out = []
    for name in os.listdir(vdir):
        if name.startswith("v") and name.endswith(".json"):
            out.append(int(name[1:-5]))
    return sorted(out)


def _read_manifest(base_dir: str, version: int) -> dict[str, Any]:
    with open(os.path.join(_versions_dir(base_dir), f"v{version:06d}.json")) as f:
        return json.load(f)


def upsert_versioned(
    base_dir: str,
    changes: Any,
    key: str,
    partition_col: str,
    order_col: str,
) -> dict[str, Any]:
    """Snapshot-versioned CDC upsert (Iceberg/Delta-style time travel
    on plain Parquet + JSON): like :func:`upsert_partitioned`, but each
    apply creates a NEW immutable snapshot instead of rewriting in
    place. Every touched partition writes ``part-v{N}.parquet`` next to
    the older versions (old files are never modified), and an atomic
    root manifest ``_versions/v{N}.json`` records, for EVERY partition,
    which data file is current at snapshot N — untouched partitions
    keep pointing at their old file, so a trickle of changes costs one
    small file per touched partition plus one manifest, never a table
    rewrite. Read any historical state back with :func:`snapshot_read`;
    reclaim space with :func:`vacuum_versions`.

    A nonexistent ``base_dir`` starts at version 1 (pure insert).
    Single-writer: concurrent upserts into one table are not supported
    (the standard lakehouse constraint without a lock service).
    Returns ``{"version", "partitions_touched", "rows_upserted"}``.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    ch_tabs = [t for t in changes.iter_batches(batch_format="pyarrow") if t.num_rows]
    versions = list_versions(base_dir)
    prev = _read_manifest(base_dir, versions[-1]) if versions else {"partitions": {}}
    new_version = (versions[-1] if versions else 0) + 1
    if not ch_tabs:
        return {
            "version": new_version - 1,
            "partitions_touched": 0,
            "rows_upserted": 0,
        }
    ch = pa.concat_tables(ch_tabs)
    for c in (key, partition_col, order_col):
        if c not in ch.column_names:
            raise ValueError(f"changes must carry column {c!r}")
    parts = sorted(set(ch.column(partition_col).drop_null().to_pylist()))
    if len(parts) != len(set(ch.column(partition_col).to_pylist())):
        raise ValueError("null partition values are not allowed in the change stream")

    ch_ref = ray.put(ch)
    mapping = dict(prev["partitions"])

    @ray.remote
    def _apply(pv: Any, old_rel: "str | None") -> tuple[str, int]:
        import pyarrow.compute as pc_

        chg = ray.get(ch_ref)
        mine = chg.filter(pc_.equal(chg.column(partition_col), pv))
        base = None
        if old_rel is not None:
            base = pq.read_table(os.path.join(base_dir, old_rel))
            extra = set(base.column_names) - set(mine.column_names)
            if extra:
                raise ValueError(
                    f"partition {pv!r}: base columns {sorted(extra)} missing "
                    "from the change stream; upsert requires identical column sets"
                )
            base = base.select(mine.column_names)
        merged = _merge_latest(mine, base, key, order_col)
        pdir = os.path.join(base_dir, f"{partition_col}={pv}")
        os.makedirs(pdir, exist_ok=True)
        rel = f"{partition_col}={pv}/part-v{new_version:06d}.parquet"
        out = os.path.join(base_dir, rel)
        tmp_f = f"{pdir}/.tmp-v{new_version:06d}"
        pq.write_table(merged, tmp_f)
        os.replace(tmp_f, out)
        return rel, mine.num_rows

    results = ray.get(
        [_apply.remote(pv, mapping.get(str(pv))) for pv in parts]
    )
    n_rows = 0
    for pv, (rel, n) in zip(parts, results):
        mapping[str(pv)] = rel
        n_rows += n
    vdir = _versions_dir(base_dir)
    os.makedirs(vdir, exist_ok=True)
    manifest = {
        "version": new_version,
        "partition_col": partition_col,
        "key": key,
        "order_col": order_col,
        "partitions": mapping,
    }
    _atomic_write(
        os.path.join(vdir, f"v{new_version:06d}.json"),
        json.dumps(manifest, sort_keys=True).encode(),
    )
    return {
        "version": new_version,
        "partitions_touched": len(parts),
        "rows_upserted": int(n_rows),
    }


def snapshot_read(
    base_dir: str, version: "int | None" = None, columns: "list[str] | None" = None
) -> Any:
    """Read a versioned table AS OF a snapshot (default: latest).
    Only the files the manifest points at are read — historical and
    superseded part files in the same directories are invisible."""
    from patito_ray.sources.readers import clean_read_parquet

    versions = list_versions(base_dir)
    if not versions:
        raise FileNotFoundError(f"no snapshots under {base_dir!r}")
    if version is None:
        version = versions[-1]
    if version not in versions:
        raise ValueError(f"snapshot v{version} does not exist (have {versions})")
    manifest = _read_manifest(base_dir, version)
    files = sorted(
        os.path.join(base_dir, rel) for rel in manifest["partitions"].values()
    )
    # partitioning=None: the partition value is a REAL column in every
    # data file; hive inference over the "col=v" dirs would duplicate it
    return clean_read_parquet(files, columns=columns, partitioning=None)


def vacuum_versions(base_dir: str, keep_latest: int = 1) -> dict[str, int]:
    """Delete data files and manifests only reachable from snapshots
    OLDER than the ``keep_latest`` most recent ones. Files shared with
    a retained snapshot survive (manifests pin files, not versions)."""
    versions = list_versions(base_dir)
    if keep_latest < 1:
        raise ValueError("keep_latest must be >= 1")
    keep = set(versions[-keep_latest:])
    live: set[str] = set()
    for v in keep:
        live.update(_read_manifest(base_dir, v)["partitions"].values())
    removed = 0
    for root, _dirs, names in os.walk(base_dir):
        if os.path.basename(root) == "_versions":
            continue
        for name in names:
            full = os.path.join(root, name)
            rel = os.path.relpath(full, base_dir)
            if name.endswith(".parquet") and rel not in live:
                os.remove(full)
                removed += 1
    dropped_manifests = 0
    for v in versions:
        if v not in keep:
            os.remove(os.path.join(_versions_dir(base_dir), f"v{v:06d}.json"))
            dropped_manifests += 1
    return {"files_removed": removed, "manifests_removed": dropped_manifests}
