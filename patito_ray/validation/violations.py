"""Violation-row extraction: stream the actual offending rows out.

The reference raises with counts only; the north rule additionally
wants the violation ROWS emitted. This stage re-uses the same check
semantics as ``check_batch`` but materializes per-check boolean fail
masks and emits the failing rows tagged with (violation_loc,
violation_kind) — as a lazy Dataset, so violations stream straight to
a partitioned parquet sink without ever concentrating on the driver.

Uniqueness violations need the global duplicate-key set, which is the
output of the uniqueness exchange: ``duplicate_keys_distributed``
broadcasts the (hashed) dup-key set and filters rows whose key hash is
in it — exact for reporting purposes (64-bit collisions are
~n^2/2^64).
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from patito_ray.exprs import fail_mask, substitute_column
from patito_ray.fields import TableSpec
from patito_ray.validation.checks import _bound_check_nodes, _combine


def _scatter_any(
    flags: np.ndarray, parents: np.ndarray, n_rows: int
) -> pa.Array:
    acc = np.zeros(n_rows, dtype=bool)
    np.logical_or.at(acc, parents, flags)
    return pa.array(acc)


def violation_masks(
    table: pa.Table, spec: TableSpec, loc_prefix: str = ""
) -> list[tuple[str, str, pa.Array]]:
    """(loc, kind, fail_mask) for every row-wise check that has at least
    one failing row in this batch — same check semantics and null
    handling as ``check_batch``, including list-typed enums and
    struct / list-of-struct recursion (nested failures mark the PARENT
    row, locs carry the ``parent.child`` prefix)."""
    out: list[tuple[str, str, pa.Array]] = []
    names = set(table.column_names)
    for name, cs in spec.columns.items():
        if name not in names:
            continue
        loc = loc_prefix + name
        arr = table.column(name)
        if not cs.nullable and arr.null_count:
            out.append((loc, "missing_value", _combine(pc.is_null(arr))))
        if cs.enum_values is not None and not (cs.is_struct or cs.is_list_of_struct):
            permissible = pa.array(cs.enum_values)
            if pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type):
                flat = pc.list_flatten(_combine(arr))
                if pa.types.is_dictionary(flat.type):
                    flat = pc.cast(flat, flat.type.value_type)
                bad_items = pc.and_(
                    pc.invert(pc.is_in(flat, value_set=permissible)),
                    pc.is_valid(flat),
                )
                parents = pc.list_parent_indices(_combine(arr)).to_numpy(
                    zero_copy_only=False
                )
                mask = _scatter_any(
                    bad_items.to_numpy(zero_copy_only=False),
                    parents,
                    table.num_rows,
                )
                if not cs.nullable and arr.null_count:
                    mask = pc.or_(mask, pc.fill_null(pc.is_null(arr), False))
                if pc.any(mask).as_py():
                    out.append((loc, "invalid_value", _combine(mask)))
            else:
                vals = _combine(arr)
                if pa.types.is_dictionary(vals.type):
                    vals = pc.cast(vals, vals.type.value_type)
                ok = pc.is_in(vals, value_set=permissible)
                bad = pc.and_(pc.invert(ok), pc.is_valid(vals))
                if pc.any(bad).as_py():
                    out.append((loc, "invalid_value", _combine(bad)))
        if cs.is_struct and cs.nested is not None and pa.types.is_struct(arr.type):
            from patito_ray.validation.checks import _struct_subtable

            sub = _struct_subtable(arr)
            for sub_loc, kind, sub_mask in violation_masks(
                sub, cs.nested, loc_prefix=loc + "."
            ):
                out.append((sub_loc, kind, sub_mask))
        if (
            cs.is_list_of_struct
            and cs.nested is not None
            and (pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type))
        ):
            from patito_ray.validation.checks import _struct_subtable

            flat_structs = pc.list_flatten(_combine(arr))
            parents = pc.list_parent_indices(_combine(arr)).to_numpy(
                zero_copy_only=False
            )
            sub = _struct_subtable(flat_structs)
            for sub_loc, kind, sub_mask in violation_masks(
                sub, cs.nested, loc_prefix=loc + "."
            ):
                parent_mask = _scatter_any(
                    pc.fill_null(sub_mask, False).to_numpy(zero_copy_only=False),
                    parents,
                    table.num_rows,
                )
                out.append((sub_loc, kind, parent_mask))
        if cs.bounds:
            agg = None
            for node in _bound_check_nodes(name, cs.bounds):
                m = fail_mask(node, table)
                agg = m if agg is None else pc.or_(agg, m)
            if agg is not None and pc.any(agg).as_py():
                out.append((loc, "out_of_bounds", _combine(agg)))
        if cs.constraints:
            agg = None
            for node in cs.constraints:
                node = substitute_column(node, "_", name)
                m = fail_mask(node, table)
                agg = m if agg is None else pc.or_(agg, m)
            if agg is not None and pc.any(agg).as_py():
                out.append((loc, "constraint", _combine(agg)))
    return out


def _violations_batch(batch: pa.Table, spec: TableSpec) -> pa.Table:
    pieces = []
    for loc, kind, mask in violation_masks(batch, spec):
        rows = batch.filter(mask)
        rows = rows.append_column(
            "violation_loc", pa.array([loc] * rows.num_rows, type=pa.string())
        ).append_column(
            "violation_kind", pa.array([kind] * rows.num_rows, type=pa.string())
        )
        pieces.append(rows)
    if not pieces:
        schema = batch.schema.append(pa.field("violation_loc", pa.string())).append(
            pa.field("violation_kind", pa.string())
        )
        return schema.empty_table()
    return pa.concat_tables(pieces, promote_options="permissive")


def violations_dataset(ds: Any, model: Any) -> Any:
    """Lazy Dataset of all row-wise-check violations, tagged per check.
    A row failing k checks appears k times (one per tag)."""
    spec = model._spec()
    return ds.map_batches(
        lambda t: _violations_batch(t, spec), batch_format="pyarrow", batch_size=None
    )


def duplicate_keys_distributed(
    ds: Any,
    column: str,
    num_buckets: int = 64,
    prehashed: bool = False,
    min_count: int = 2,
) -> pa.Array:
    """The KEY-HASH set of keys occurring >= ``min_count`` times (the
    uniqueness exchange's phase-2 output, keeping keys instead of
    counts). Adaptive like the dup count: blob volumes <= 256 MB merge
    driver-side in one multithreaded groupby, larger go through the
    bucket exchange. ``prehashed=True`` when the column already holds
    64-bit hashes (LSH band keys): the returned set then contains the
    ORIGINAL values."""
    import polars as pl

    from patito_ray.validation.checks import (
        _key_totals,
        batch_key_bucket_blobs,
        unpack_bucket_blobs,
    )

    blobs = ds.select_columns([column]).map_batches(
        lambda t: batch_key_bucket_blobs(
            t, column, num_buckets=num_buckets, prehashed=prehashed
        ),
        batch_format="pyarrow",
        batch_size=None,
    ).materialize()

    def dup_keys(group: pa.Table) -> pa.Table:
        keys, counts = unpack_bucket_blobs(group)
        if len(keys) == 0:
            return pa.table({"k": pa.array([], type=pa.int64())})
        totals = _key_totals(keys, counts)
        dup_k = totals.filter(pl.col("c") >= min_count)["k"].to_numpy().astype(np.uint64)
        return pa.table({"k": pa.array(dup_k.view(np.int64), type=pa.int64())})

    from patito_ray.validation.checks import adaptive_bucket_results

    tables = adaptive_bucket_results(blobs, dup_keys)
    arrays = [_combine(t.column("k")) for t in tables if t.num_rows]
    if not arrays:
        return pa.array([], type=pa.int64())
    return pa.concat_arrays(arrays)


def duplicate_rows_dataset(ds: Any, column: str) -> Any:
    """All rows participating in a duplicate group on ``column`` —
    broadcast the dup-key-hash set, filter per batch (no row shuffle)."""
    import ray

    dup_keys = duplicate_keys_distributed(ds, column)
    ref = ray.put(dup_keys)

    def pick(batch: pa.Table) -> pa.Table:
        import polars as pl

        keys = ray.get(ref)
        if len(keys) == 0:
            return batch.slice(0, 0)
        hashed = (
            pl.from_arrow(_combine(batch.column(column)))
            .hash(seed=42)
            .to_numpy()
            .view(np.int64)
        )
        mask = pc.is_in(pa.array(hashed, type=pa.int64()), value_set=keys)
        return batch.filter(mask)

    return ds.map_batches(pick, batch_format="pyarrow", batch_size=None)


def partition_verdicts(ds: Any, model: Any) -> Any:
    """Per-partition pass/fail verdict Dataset (north-rule surface): one
    row per input block with its row count, per-kind violation counts
    and an ``ok`` flag. Streams; no driver concentration."""
    spec = model._spec()

    def verdict(batch: pa.Table) -> pa.Table:
        masks = violation_masks(batch, spec)
        n_violations = 0
        kinds: dict[str, int] = {}
        for _loc, kind, mask in masks:
            n = int(pc.sum(mask).as_py() or 0)
            n_violations += n
            kinds[kind] = kinds.get(kind, 0) + n
        import json as _json

        return pa.table(
            {
                "rows": pa.array([batch.num_rows], type=pa.int64()),
                "violations": pa.array([n_violations], type=pa.int64()),
                "ok": pa.array([n_violations == 0], type=pa.bool_()),
                "by_kind": pa.array([_json.dumps(kinds, sort_keys=True)], type=pa.string()),
            }
        )

    return ds.map_batches(verdict, batch_format="pyarrow", batch_size=None)


def write_violations(ds: Any, model: Any, path: str) -> dict[str, int]:
    """Stream all violation rows to a partitioned parquet directory;
    returns per-kind counts. Resumable layout: one directory per run,
    many part files.

    One input pass: the violations dataset is materialized (violation
    rows only — a small fraction of the input), the sink writes from the
    pinned blocks, and per-kind counts come from tiny per-batch
    value_counts partials over the SAME blocks — the parquet output is
    never re-read and the input is never re-validated."""
    v = violations_dataset(ds, model).materialize()
    v.write_parquet(path)

    def kind_counts(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(batch.column("violation_kind").combine_chunks())
        return pa.table(
            {"kind": vc.field("values"), "n": pc.cast(vc.field("counts"), pa.int64())}
        )

    counts: dict[str, int] = {}
    partials = v.select_columns(["violation_kind"]).map_batches(
        kind_counts, batch_format="pyarrow", batch_size=None
    )
    for b in partials.iter_batches(batch_format="pyarrow"):
        for kind, n in zip(b["kind"].to_pylist(), b["n"].to_pylist()):
            counts[str(kind)] = counts.get(str(kind), 0) + int(n)
    return counts


def quarantine_split_write(
    ds: Any,
    model: Any,
    valid_path: str,
    quarantine_path: str,
) -> dict[str, int]:
    """Single-pass split sink: rows passing every ROW-WISE check stream
    to ``valid_path``; failing rows stream to ``quarantine_path`` with
    a ``violation_reasons`` column (comma-joined ``loc:kind`` tags in
    spec order — deterministic). The quarantine side is written from
    INSIDE the same map_batches that emits the valid rows (one part
    file per task), so the input is read and validated exactly once —
    the ETL shape where bad rows must not poison the clean output but
    also must not cost a second scan. Global checks (uniqueness /
    aggregates) need the blob exchange and stay a separate pass by
    design.

    Returns ``{"valid": n, "quarantined": n}`` — both counts from
    parquet FOOTERS of what was actually written, never re-reading
    data bytes.

    Both directories are WIPED at the start of the call (same contract
    as the WARC frame sink): footer counts cover exactly this run.
    Quarantine part files are named by a content digest of the source
    batch, so a retried/speculative Ray task rewrites the SAME file
    instead of duplicating rows (byte-identical input batches collapse
    to one file — they produce byte-identical quarantine output)."""
    import hashlib
    import os
    import shutil

    import numpy as np

    import pyarrow.parquet as pq

    from patito_ray.sinks import _parquet_dir_rows

    spec = model._spec()
    for path in (quarantine_path, valid_path):
        shutil.rmtree(path, ignore_errors=True)
        os.makedirs(path, exist_ok=True)

    def split(batch: pa.Table) -> pa.Table:
        masks = violation_masks(batch, spec)
        if not masks:
            return batch
        any_fail = np.zeros(batch.num_rows, dtype=bool)
        reason_cols = []
        for loc, kind, mask in masks:
            m = pc.fill_null(mask, False).to_numpy(zero_copy_only=False)
            any_fail |= m
            # null where the check passes: binary_join_element_wise
            # with null_handling="skip" then drops it from the join
            reason_cols.append(
                pa.array(np.where(m, f"{loc}:{kind}", None), type=pa.string())
            )
        if not any_fail.any():
            return batch
        keep = pa.array(~any_fail)
        quar = batch.filter(pa.array(any_fail))
        reasons = pc.binary_join_element_wise(
            *(c.filter(pa.array(any_fail)) for c in reason_cols),
            ",",
            null_handling="skip",
        )
        quar = quar.append_column("violation_reasons", reasons)
        # content-deterministic name: a retried task writes the same
        # bytes to the same file (write-to-tmp + rename keeps a racing
        # retry from exposing a half-written footer)
        h = hashlib.blake2b(digest_size=16)
        sink = pa.BufferOutputStream()
        with pa.ipc.new_stream(sink, quar.schema) as w:
            w.write_table(quar)
        h.update(sink.getvalue())
        digest = h.hexdigest()
        name = f"{quarantine_path}/part-{digest}.parquet"
        # hidden tmp name: Arrow/Ray dataset discovery skips dot-files,
        # so a crashed task's orphan can never poison reads or counts
        tmp = f"{quarantine_path}/.tmp-{os.getpid()}-{digest}"
        pq.write_table(quar, tmp)
        os.replace(tmp, name)
        return batch.filter(keep)

    ds.map_batches(split, batch_format="pyarrow", batch_size=None).write_parquet(
        valid_path
    )
    return {
        "valid": _parquet_dir_rows(valid_path),
        "quarantined": _parquet_dir_rows(quarantine_path),
    }
