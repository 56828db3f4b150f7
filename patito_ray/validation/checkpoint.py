"""Checkpointed, resumable validation runs with per-partition lineage.

North-rule requirement (BASELINE.json): "resumable from checkpoint with
per-partition lineage + metrics". Design (SURVEY.md §4/§7):

- The input file list is split into deterministic shards; the shard id
  is a content fingerprint of its file list (path + size) AND of the
  compiled model spec, so a retry with the same input+model hits the
  same ids, a changed input invalidates only the touched shards, and a
  changed model invalidates everything (stale Partials computed under
  an older schema are never merged).
- Each shard runs the row-wise validation pass and writes, atomically
  (tmp + rename):
    * ``shards/<sid>.pkl``  — the shard's mergeable Partial,
    * ``shards/<sid>.json`` — lineage manifest: input files + sizes,
      row count, wall seconds, rows/sec, counter summary,
    * ``unique_<col>/<sid>.parquet`` — the shard's pre-aggregated
      (key-hash, count) rows for every unique column.
- Resume = skip shards whose manifest exists. Global uniqueness is
  resolved at the END from the per-shard key-count parquet (a
  groupby-sum over pre-aggregated rows only — the full input is never
  re-read), so duplicate detection is cross-shard correct while staying
  resumable.

Partial writes are idempotent: a shard that crashed mid-write leaves no
manifest and reruns cleanly; rerunning a finished shard overwrites the
same deterministic outputs.
"""

from __future__ import annotations

import hashlib
import json
import os
import pickle
import time
from typing import Any, Iterable

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from patito_ray.fields import TableSpec
from patito_ray.validation.checks import check_batch
from patito_ray.validation.engine import (
    _finalize,
    _prepare_aggregate_constraints,
    _tree_merge_partials,
)
from patito_ray.validation.result import Partial, ValidationReport


def _shard_id(files: list[tuple[str, int]], fingerprint: str = "") -> str:
    h = hashlib.sha256()
    h.update(fingerprint.encode())
    for path, size in files:
        h.update(path.encode())
        h.update(str(size).encode())
    return h.hexdigest()[:16]


def spec_fingerprint(spec: TableSpec) -> str:
    """Stable fingerprint of the compiled model spec. Folded into shard
    ids so resuming a checkpoint_dir with a CHANGED model (new bounds,
    constraints, nullability...) re-runs every shard instead of silently
    merging Partials computed under the old schema."""
    from patito_ray.manifest import spec_to_json_dict

    return hashlib.sha256(
        json.dumps(spec_to_json_dict(spec), sort_keys=True, default=str).encode()
    ).hexdigest()[:16]


def _atomic_write(path: str, data: bytes) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def plan_shards(
    files: Iterable[str], files_per_shard: int = 8, fingerprint: str = ""
) -> list[tuple[str, list[str]]]:
    """Deterministic shard plan: sorted files, fixed-size groups,
    content-fingerprint ids (input files + sizes + model fingerprint)."""
    sized = [(f, os.path.getsize(f)) for f in sorted(files)]
    shards = []
    for i in range(0, len(sized), files_per_shard):
        group = sized[i : i + files_per_shard]
        shards.append((_shard_id(group, fingerprint), [g[0] for g in group]))
    return shards


def validate_files_checkpointed(
    files: list[str],
    model: Any,
    checkpoint_dir: str,
    files_per_shard: int = 8,
    hash_unique_keys: bool = True,
    allow_superfluous_columns: bool = False,
    collect_stats: bool = False,
) -> ValidationReport:
    """Validate a parquet file set with shard-level checkpoint/resume.

    Note: checkpointed uniqueness always runs on 64-bit key hashes (the
    persisted shard key files are hash-based); ``hash_unique_keys`` is
    kept for API symmetry with the streaming engine.

    ``collect_stats=True`` additionally accumulates per-shard column
    statistics (null/min/max/HLL/t-digest sketch states) INSIDE the same
    validation pass and persists them as ``shards/<sid>.stats.pkl`` —
    mergeable sketches ride the checkpoint, so a resumed run recovers
    the full-corpus profile without re-reading finished shards. A
    summary lands in the lineage manifest; the merged profile is
    attached to the returned report as ``report.column_stats``.
    """
    import ray.data as rd

    spec: TableSpec = model._spec()
    os.makedirs(f"{checkpoint_dir}/shards", exist_ok=True)
    for ucol in spec.unique_columns:
        os.makedirs(f"{checkpoint_dir}/unique_{ucol}", exist_ok=True)

    fp = spec_fingerprint(spec)
    shards = plan_shards(files, files_per_shard, fingerprint=fp)

    # Aggregate constraints (e.g. col("fraction").sum() == 1) must be
    # resolved against the WHOLE corpus — a per-shard resolution would
    # compare each shard's local sum, diverging from the streaming
    # engine and the reference. One global pre-pass runs before the
    # shard loop; the resolved constraint trees are persisted under the
    # model fingerprint so a RESUMED run substitutes the identical
    # scalars instead of recomputing them from a partial corpus view.
    agg_path = f"{checkpoint_dir}/aggregates_{fp}.pkl"
    if os.path.exists(agg_path):
        with open(agg_path, "rb") as f:
            prepared = pickle.loads(f.read())
    else:
        full_ds = rd.read_parquet(sorted(files))
        prepared = _prepare_aggregate_constraints(full_ds, spec)
        _atomic_write(agg_path, pickle.dumps(prepared))

    for sid, shard_files in shards:
        manifest_path = f"{checkpoint_dir}/shards/{sid}.json"
        if os.path.exists(manifest_path):
            continue  # resume: shard already finished
        t0 = time.time()
        ds = rd.read_parquet(shard_files)

        # ONE fused read per shard: validation partial, optional stats
        # sketches AND every unique column's key blobs ride the same
        # map_batches pass (the engine's fused-pass design; the old
        # layout re-read each shard once per unique column)
        from patito_ray.validation.checks import batch_key_bucket_blobs

        def batch_validate(batch: pa.Table) -> pa.Table:
            p = check_batch(
                batch,
                spec,
                allow_superfluous_columns=allow_superfluous_columns,
                skip_unique=True,
                prepared_constraints=prepared,
            )
            stats_blob = None
            if collect_stats:
                from patito_ray.validation.stats import SketchBatch

                stats_blob = SketchBatch()(batch).column("stats")[0].as_py()
            blob_tables = {
                u: batch_key_bucket_blobs(batch, u)
                for u in spec.unique_columns
                if u in batch.column_names
            }
            return pa.table(
                {"partial": [pickle.dumps((p, stats_blob, blob_tables))]}
            )

        rows = ds.map_batches(
            batch_validate, batch_format="pyarrow", batch_size=None
        ).take_all()
        partial = Partial()
        stats_rows = []
        ucol_blobs: dict[str, list[pa.Table]] = {u: [] for u in spec.unique_columns}
        for r in rows:
            pp, stats_blob, blob_tables = pickle.loads(r["partial"])
            partial.merge(pp)
            if stats_blob is not None:
                stats_rows.append({"stats": stats_blob})
            for u, t in blob_tables.items():
                ucol_blobs[u].append(t)
        if collect_stats:
            from patito_ray.validation.stats import _merge_state_rows

            shard_stats = _merge_state_rows(stats_rows)
            _atomic_write(
                f"{checkpoint_dir}/shards/{sid}.stats.pkl",
                pickle.dumps(shard_stats),
            )
        else:
            shard_stats = None

        for ucol in spec.unique_columns:
            # fold this shard's per-batch key blobs into (key-hash,
            # count) totals with one multithreaded hash groupby
            from patito_ray.validation.checks import _key_totals, unpack_bucket_blobs

            tables = ucol_blobs[ucol]
            if tables:
                import numpy as np

                keys, counts = unpack_bucket_blobs(
                    pa.concat_tables(tables, promote_options="permissive")
                )
                totals = _key_totals(keys, counts)
                tbl = pa.table(
                    {
                        "k": pa.array(
                            totals["k"].to_numpy().astype(np.uint64).view(np.int64),
                            type=pa.int64(),
                        ),
                        "count": pa.array(totals["c"].to_numpy(), type=pa.int64()),
                    }
                )
            else:
                tbl = pa.table(
                    {"k": pa.array([], pa.int64()), "count": pa.array([], pa.int64())}
                )
            tmp = f"{checkpoint_dir}/unique_{ucol}/{sid}.parquet.tmp"
            pq.write_table(tbl, tmp)
            os.replace(tmp, f"{checkpoint_dir}/unique_{ucol}/{sid}.parquet")

        _atomic_write(
            f"{checkpoint_dir}/shards/{sid}.pkl", pickle.dumps(partial)
        )
        wall = time.time() - t0
        from patito_ray.manifest import spec_to_json_dict

        manifest = {
            "shard_id": sid,
            "model": spec_to_json_dict(spec),
            "files": shard_files,
            "sizes": [os.path.getsize(f) for f in shard_files],
            "row_count": partial.row_count,
            "wall_sec": round(wall, 3),
            "rows_per_sec": round(partial.row_count / wall, 1) if wall else None,
            "null_counts": partial.null_counts,
            "bounds_fail": partial.bounds_fail,
            "constraint_fail": partial.constraint_fail,
            "column_stats": (
                {name: st.summary() for name, st in shard_stats.items()}
                if shard_stats
                else None
            ),
            "finished_at": time.time(),
        }
        # default=str: stats min/max may be datetimes/dates — the manifest
        # is a human/monitoring artifact, ISO strings are the right shape
        _atomic_write(
            manifest_path, json.dumps(manifest, indent=1, default=str).encode()
        )

    # ---- final merge (partials only; no input re-read) -------------------
    merged = Partial()
    for sid, _ in shards:
        with open(f"{checkpoint_dir}/shards/{sid}.pkl", "rb") as f:
            merged.merge(pickle.loads(f.read()))

    merged_stats = None
    if collect_stats:
        merged_stats = {}
        for sid, _ in shards:
            stats_path = f"{checkpoint_dir}/shards/{sid}.stats.pkl"
            if not os.path.exists(stats_path):
                continue  # shard finished by an older run without stats
            with open(stats_path, "rb") as f:
                shard_stats = pickle.loads(f.read())
            for name, st in shard_stats.items():
                if name in merged_stats:
                    merged_stats[name].merge(st)
                else:
                    merged_stats[name] = st

    for ucol in spec.unique_columns:
        shard_paths = [
            f"{checkpoint_dir}/unique_{ucol}/{sid}.parquet" for sid, _ in shards
        ]
        total_bytes = sum(os.path.getsize(p) for p in shard_paths)
        if total_bytes <= 2 * 1024 * 1024 * 1024:
            # adaptive driver merge: shard files hold pre-aggregated
            # (key-hash, count) rows, 16B/key — one multithreaded
            # groupby beats a Ray shuffle until the key space outgrows
            # driver memory
            import polars as pl

            frames = [pl.read_parquet(p) for p in shard_paths if os.path.getsize(p)]
            if frames:
                totals = (
                    pl.concat(frames).group_by("k").agg(pl.col("count").sum())
                )
                n = totals.filter(pl.col("count") > 1)["count"].sum()
            else:
                n = 0
        else:
            counts_ds = rd.read_parquet(shard_paths)
            from ray.data.aggregate import Sum

            totals_ds = counts_ds.groupby("k").aggregate(
                Sum("count", alias_name="total")
            )

            def dup_rows(batch: pa.Table) -> pa.Table:
                tot = batch.column("total")
                dups = pc.sum(pc.filter(tot, pc.greater(tot, 1))).as_py() or 0
                return pa.table({"dups": [int(dups)]})

            rows = totals_ds.map_batches(
                dup_rows, batch_format="pyarrow", batch_size=None
            ).take_all()
            n = int(sum(r["dups"] for r in rows))
        if n:
            merged.dup_counts[ucol] = int(n or 0)

    report = _finalize(merged, model)
    report.column_stats = (
        {name: st.summary() for name, st in merged_stats.items()}
        if merged_stats
        else None
    )
    return report


def read_manifests(checkpoint_dir: str) -> list[dict[str, Any]]:
    """All shard lineage manifests (metrics surface for monitoring)."""
    out = []
    shard_dir = f"{checkpoint_dir}/shards"
    if not os.path.isdir(shard_dir):
        return out
    for name in sorted(os.listdir(shard_dir)):
        if name.endswith(".json"):
            with open(f"{shard_dir}/{name}") as f:
                out.append(json.load(f))
    return out
