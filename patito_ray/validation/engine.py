"""Validation orchestration: local tables and distributed Ray Datasets.

Local path = exact reference semantics on one in-memory Arrow table
(mirrors ``patito.validators.validate``,
/root/reference/src/patito/validators.py:442-492: pandas conversion,
alias rename, optional superfluous-drop, error accumulation, raise).

Distributed path (the engine's reason to exist — SURVEY.md §3 "Ray
translation of E1/E2") over a ``ray.data.Dataset``:

1. driver-side plan transforms (alias rename, superfluous drop) from
   ``ds.schema()`` — zero data movement,
2. optional aggregate-constraint pre-pass (per-batch partials ->
   merged scalars -> constraint trees rewritten), a second pass over
   the data only when a model declares aggregate constraints,
3. ONE fused streaming ``map_batches(batch_format="pyarrow")`` pass
   emitting, per block: a pickled mergeable ``Partial`` (all row-wise
   checks + broadcast referential-miss counts + user
   ``extra_batch_checks`` counters) AND each unique column's bucketed
   (key-hash, count) blobs — the input is read exactly once,
4. partial tree-merge (associative monoid; worker-side repartition+
   merge rounds keep the driver from folding millions of partials),
5. uniqueness finalize per unique column over the blobs from step 3:
   adaptive — driver-side multithreaded hash groupby below 256 MB,
   bucket ``groupby`` exchange above (reference
   ``is_duplicated().sum()`` row-participation semantics).

Nothing here materializes the raw input (only the tiny combined
partial+blob output); violation *counts* and bounded samples return to
the driver, full violation rows stream to parquet via
``validation/violations.py``.
"""

from __future__ import annotations

import pickle
from typing import Any, Iterable, Mapping

import pyarrow as pa
import pyarrow.compute as pc

from patito_ray.exprs import (
    agg_partial,
    agg_finalize,
    collect_agg_nodes,
    merge_agg_partials,
    substitute_aggs,
    substitute_column,
)
from patito_ray.fields import TableSpec
from patito_ray.validation.checks import (
    apply_alias,
    batch_key_counts,
    check_batch,
    referential_miss_mask,
)
from patito_ray.validation.result import (
    Partial,
    ValidationReport,
    assemble_errors,
    merge_partials,
)

# Blocks-per-merge fan-in for the partial-result tree reduce.
_MERGE_FANIN = 64
# Above this many partial rows the driver delegates merging to workers.
_DRIVER_MERGE_LIMIT = 1024
# Below this many bytes of combined pass output (pickled partials +
# 16 B/distinct-key/batch blobs), ONE driver fetch + local merges beat
# several extra Ray scan/shuffle rounds of fixed latency; above it,
# worker-side tree-merge + bucket groupby keep driver memory bounded.
# Shared by the engine fast path and the checkpoint shard finalize.
_DRIVER_FASTPATH_BYTES = 256 * 1024 * 1024


def _is_dataset(data: Any) -> bool:
    try:
        import ray.data

        return isinstance(data, ray.data.Dataset)
    except ImportError:
        return False


def _to_table(data: Any) -> pa.Table:
    if isinstance(data, pa.Table):
        return data
    if isinstance(data, pa.RecordBatch):
        return pa.Table.from_batches([data])
    if isinstance(data, dict):
        return pa.table(data)
    mod = type(data).__module__
    if mod.startswith("pandas"):
        return pa.Table.from_pandas(data, preserve_index=False)
    if mod.startswith("polars"):
        return data.to_arrow()
    raise TypeError(f"cannot validate object of type {type(data)!r}")


def _normalize_references(
    references: Mapping[str, Any] | None,
) -> dict[str, pa.Array]:
    """Normalize referential key sets to in-memory Arrow arrays (the
    broadcast small side). Large-dimension referential checks should use
    ``patito_ray.validation.referential.anti_join_count`` instead."""
    out: dict[str, pa.Array] = {}
    if not references:
        return out
    for colname, keys in references.items():
        if _is_dataset(keys):
            # small side: stream the single key column to the driver.
            # Require an unambiguous key column — silently taking
            # column 0 of a multi-column dimension builds the key set
            # from the wrong values
            schema = keys.schema()
            names = list(schema.names) if schema is not None else []
            if len(names) > 1:
                if colname in names:
                    keys = keys.select_columns([colname])
                else:
                    raise ValueError(
                        f"references[{colname!r}]: dimension dataset has "
                        f"columns {names}; select the key column first"
                    )
            arrays = []
            for b in keys.iter_batches(batch_format="pyarrow"):
                a = b.column(0)
                arrays.append(a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a)
            out[colname] = (
                pa.concat_arrays(arrays) if arrays else pa.array([], type=pa.null())
            )
        elif isinstance(keys, pa.ChunkedArray):
            out[colname] = keys.combine_chunks()
        elif isinstance(keys, pa.Array):
            out[colname] = keys
        else:
            out[colname] = pa.array(list(keys))
    return out


# ---------------------------------------------------------------------------
# Local (single-table) path
# ---------------------------------------------------------------------------


def _validate_table(
    table: pa.Table,
    model: Any,
    spec: TableSpec,
    columns: Iterable[str] | None,
    allow_missing_columns: bool,
    allow_superfluous_columns: bool,
    drop_superfluous_columns: bool,
    collect_samples: bool,
    references: dict[str, pa.Array],
    extra_batch_checks: list[Any] | None = None,
) -> tuple[ValidationReport, pa.Table]:
    table = apply_alias(table, spec)
    if drop_superfluous_columns:
        keep = [c for c in table.column_names if c in spec.columns]
        table = table.select(keep)
    partial = check_batch(
        table,
        spec,
        columns=columns,
        allow_missing_columns=allow_missing_columns,
        allow_superfluous_columns=allow_superfluous_columns,
        collect_samples=collect_samples,
    )
    for colname, key_set in references.items():
        if colname in table.column_names:
            mask = referential_miss_mask(table, colname, key_set)
            n = int(pc.sum(mask).as_py() or 0)
            if n:
                partial.ref_fail[colname] = n
    for extra in extra_batch_checks or ():
        for k, v in extra(table).items():
            partial.custom[k] = partial.custom.get(k, 0) + v
    report = _finalize(partial, model)
    return report, table


def _finalize(merged: Partial, model: Any) -> ValidationReport:
    wrappers = assemble_errors(merged, list(model.columns))
    errors = [w.as_dict() for w in wrappers]
    return ValidationReport(
        model_name=model.__name__,
        row_count=merged.row_count,
        errors=errors,
        merged=merged,
        ok=not errors,
    )


# ---------------------------------------------------------------------------
# Distributed (Ray Dataset) path
# ---------------------------------------------------------------------------


def _prepare_aggregate_constraints(
    ds: Any, spec: TableSpec
) -> dict[str, list[dict[str, Any]]] | None:
    """Resolve aggregate sub-expressions of custom constraints with a
    dedicated partial-aggregation pass, then rewrite the constraint
    trees so the main pass is purely row-wise.

    Mirrors the reference's aggregate-constraint behaviour
    (``tests/test_validators.py:886-894``: ``pl.col("fraction").sum()==1``
    broadcasts over all rows) at cluster scale: per-batch partials are
    commutative-monoid states merged on the driver (tiny: one dict per
    block), then the scalar is substituted into the tree.
    """
    from patito_ray.exprs import collect_col_refs

    schema = ds.schema()
    present = set(schema.names) if schema is not None else set()
    work: list[tuple[str, int, str, dict[str, Any]]] = []  # (col, idx, path, node)
    substituted: dict[str, list[dict[str, Any]]] = {}
    for name, cs in spec.columns.items():
        if not cs.constraints:
            continue
        nodes = [substitute_column(n, "_", name) for n in cs.constraints]
        substituted[name] = nodes
        for i, node in enumerate(nodes):
            for path, agg_node in collect_agg_nodes(node):
                if present and not collect_col_refs(agg_node) <= present:
                    # the aggregate references a column the dataset
                    # lacks: skip resolution — the main pass's
                    # missing-column check reports it instead of this
                    # pre-pass crashing with a worker KeyError
                    continue
                work.append((name, i, path, agg_node))
    if not work:
        return None

    def batch_agg(batch: pa.Table) -> pa.Table:
        states = {
            (c, i, path): (node["fn"], agg_partial(node, batch))
            for (c, i, path, node) in work
        }
        return pa.table({"state": [pickle.dumps(states)]})

    rows = ds.map_batches(
        batch_agg, batch_format="pyarrow", batch_size=None
    ).take_all()
    merged: dict[tuple[str, int, str], tuple[str, dict[str, Any]]] = {}
    for row in rows:
        states = pickle.loads(row["state"])
        for key, (fn, state) in states.items():
            if key in merged:
                merged[key] = (fn, merge_agg_partials(fn, merged[key][1], state))
            else:
                merged[key] = (fn, state)
    finals: dict[tuple[str, int], dict[str, Any]] = {}
    for (c, i, path), (fn, state) in merged.items():
        finals.setdefault((c, i), {})[path] = agg_finalize(fn, state)
    prepared: dict[str, list[dict[str, Any]]] = {}
    for name, nodes in substituted.items():
        prepared[name] = [
            substitute_aggs(node, finals.get((name, i), {})) if (name, i) in finals else node
            for i, node in enumerate(nodes)
        ]
    return prepared


def _tree_merge_partials(partials_ds: Any) -> Partial:
    """Merge a Dataset of pickled Partials without driver overload: while
    too many rows remain, repartition and fold within blocks on workers
    (associative merge => any grouping is correct)."""

    def merge_block(batch: pa.Table) -> pa.Table:
        acc = Partial()
        for blob in batch.column("partial").to_pylist():
            acc.merge(pickle.loads(blob))
        return pa.table({"partial": [pickle.dumps(acc)]})

    # materialize once: the partials are tiny (one row per input block)
    # and every count()/take_all() on a lazy Dataset re-executes the whole
    # upstream pipeline otherwise.
    partials_ds = partials_ds.materialize()
    count = partials_ds.count()
    while count > _DRIVER_MERGE_LIMIT:
        n_blocks = max(1, count // _MERGE_FANIN)
        partials_ds = partials_ds.repartition(n_blocks).map_batches(
            merge_block, batch_format="pyarrow", batch_size=None
        ).materialize()
        count = partials_ds.count()
    rows = partials_ds.take_all()
    return merge_partials([pickle.loads(r["partial"]) for r in rows])


def duplicate_count_distributed(
    ds: Any, column: str, hash_keys: bool = True, num_buckets: int = 64
) -> int:
    """Two-phase distributed uniqueness check (SURVEY.md §4):

    phase 1 (narrow): project to the key column and pre-aggregate each
    batch to (key-hash, count) pairs — collapses the duplicate-free
    mass — then pack them into ``num_buckets`` per-batch bucket BLOBS
    (two binary columns) partitioned by the key hash's top bits;
    phase 2 (wide): ``groupby(bucket)`` co-locates each bucket's blobs
    (#batches x #buckets rows move, NOT one row per key) and a
    vectorized numpy segment-sum per bucket emits its duplicate total;
    finalize: sum bucket totals — the reference's
    ``is_duplicated().sum()`` row-participation semantics
    (validators.py:235-244).

    Key hashes are uniform so buckets balance under value skew; a hot
    value contributes one (key, count) entry per batch. Exact
    (unhashed) mode falls back to a per-key groupby-sum shuffle.
    """
    if not hash_keys:
        from ray.data.aggregate import Sum

        pre = ds.select_columns([column]).map_batches(
            lambda t: batch_key_counts(t, column, hash_keys=False),
            batch_format="pyarrow",
            batch_size=None,
        )
        totals = pre.groupby("k").aggregate(Sum("count", alias_name="total"))

        def dup_rows(batch: pa.Table) -> pa.Table:
            tot = batch.column("total")
            dups = pc.sum(pc.filter(tot, pc.greater(tot, 1))).as_py() or 0
            return pa.table({"dups": [int(dups)]})

        rows = totals.map_batches(
            dup_rows, batch_format="pyarrow", batch_size=None
        ).take_all()
        return int(sum(r["dups"] for r in rows))

    from patito_ray.validation.checks import (
        batch_key_bucket_blobs,
        merge_bucket_blobs,
    )

    blobs = ds.select_columns([column]).map_batches(
        lambda t: batch_key_bucket_blobs(t, column, num_buckets=num_buckets),
        batch_format="pyarrow",
        batch_size=None,
    ).materialize()  # tiny: 16 bytes per distinct key per batch

    return _finalize_dup_blobs(blobs)


def distinct_count_distributed(
    ds: Any, column: str, num_buckets: int = 64
) -> int:
    """Exact distinct count via the same bucketed blob exchange as the
    uniqueness check (collision odds ~n^2/2^64 on the 64-bit key hash):
    per-batch unique key hashes -> bucket blobs -> per-bucket n_unique,
    adaptively merged driver-side when small."""
    from patito_ray.validation.checks import (
        batch_key_bucket_blobs,
        unpack_bucket_blobs,
    )

    blobs = ds.select_columns([column]).map_batches(
        lambda t: batch_key_bucket_blobs(t, column, num_buckets=num_buckets),
        batch_format="pyarrow",
        batch_size=None,
    ).materialize()

    def bucket_distinct(group: pa.Table) -> pa.Table:
        import numpy as np

        keys, _ = unpack_bucket_blobs(group)
        return pa.table({"n": [int(len(np.unique(keys)))]})

    from patito_ray.validation.checks import adaptive_bucket_results

    tables = adaptive_bucket_results(blobs, bucket_distinct)
    return int(sum(pc.sum(t.column("n")).as_py() or 0 for t in tables))


def _validate_dataset(
    ds: Any,
    model: Any,
    spec: TableSpec,
    columns: Iterable[str] | None,
    allow_missing_columns: bool,
    allow_superfluous_columns: bool,
    drop_superfluous_columns: bool,
    collect_samples: bool,
    references: dict[str, pa.Array],
    hash_unique_keys: bool = True,
    extra_batch_checks: list[Any] | None = None,
    unique_num_buckets: int = 64,
) -> tuple[ValidationReport, Any]:
    import ray

    # alias rename + superfluous drop are metadata-level plans
    gen = spec.alias_generator
    schema_names = ds.schema().names
    if gen is not None:
        mapping = {n: gen(n) for n in schema_names if gen(n) != n}
        if mapping:
            ds = ds.rename_columns(mapping)
            schema_names = [mapping.get(n, n) for n in schema_names]
    if drop_superfluous_columns:
        keep = [c for c in schema_names if c in spec.columns]
        ds = ds.select_columns(keep)

    prepared = _prepare_aggregate_constraints(ds, spec)

    ref_refs = {c: ray.put(arr) for c, arr in references.items()}
    # falsy semantics match check_batch / the reference: columns=[]
    # means "all columns", not "none" — local and distributed paths
    # must agree
    columns_l = list(columns) if columns else None

    # uniqueness constraints this run must check: single columns plus
    # composite unique_together groups — both ride the same bucketed
    # blob exchange, tagged by their label
    subset = set(columns_l) if columns_l is not None else None
    unique_keys = [
        (label, cols)
        for label, cols in spec.unique_keys()
        if (subset is None or all(c in subset for c in cols))
        and all(c in schema_names for c in cols)
    ]
    if not hash_unique_keys and any(len(cols) > 1 for _, cols in unique_keys):
        raise ValueError(
            "unique_together groups require hash_unique_keys=True (the "
            "composite key is a row hash; there is no exact unhashed path)"
        )

    from patito_ray.validation.checks import batch_unique_blobs

    def batch_validate(batch: pa.Table) -> pa.Table:
        """ONE output table per batch carrying BOTH the pickled Partial
        (kind=0) and, when hashing is on, each unique column's bucketed
        key-count blobs (kind=1) — fusing the uniqueness pre-aggregation
        into the main pass so the corpus is read exactly once."""
        p = check_batch(
            batch,
            spec,
            columns=columns_l,
            allow_missing_columns=allow_missing_columns,
            allow_superfluous_columns=allow_superfluous_columns,
            skip_unique=True,
            collect_samples=collect_samples,
            prepared_constraints=prepared,
        )
        for colname, ref in ref_refs.items():
            if colname in batch.column_names:
                key_set = ray.get(ref)
                mask = referential_miss_mask(batch, colname, key_set)
                n = int(pc.sum(mask).as_py() or 0)
                if n:
                    p.ref_fail[colname] = n
        for extra in extra_batch_checks or ():
            for k, v in extra(batch).items():
                p.custom[k] = p.custom.get(k, 0) + v

        kinds = [0]
        cols = [""]
        buckets = [-1]
        b_u = [pickle.dumps(p)]
        b_mk = [b""]
        b_mc = [b""]
        if hash_unique_keys:
            for label, ucols in unique_keys:
                if not all(c in batch.column_names for c in ucols):
                    continue
                blobs = batch_unique_blobs(batch, ucols, num_buckets=unique_num_buckets)
                kinds.extend([1] * blobs.num_rows)
                cols.extend([label] * blobs.num_rows)
                buckets.extend(blobs.column("bucket").to_pylist())
                b_u.extend(blobs.column("u_keys").to_pylist())
                b_mk.extend(blobs.column("m_keys").to_pylist())
                b_mc.extend(blobs.column("m_counts").to_pylist())
        return pa.table(
            {
                "kind": pa.array(kinds, type=pa.int8()),
                "col": pa.array(cols, type=pa.string()),
                "bucket": pa.array(buckets, type=pa.int32()),
                "b1": pa.array(b_u, type=pa.large_binary()),
                "b2": pa.array(b_mk, type=pa.large_binary()),
                "b3": pa.array(b_mc, type=pa.large_binary()),
            }
        )

    combined = ds.map_batches(
        batch_validate, batch_format="pyarrow", batch_size=None
    ).materialize()

    # Small-result fast path (threshold shared with the checkpoint
    # shard finalize — see _DRIVER_FASTPATH_BYTES).
    if combined.size_bytes() <= _DRIVER_FASTPATH_BYTES:
        tables = list(combined.iter_batches(batch_format="pyarrow", batch_size=None))
        all_rows = (
            pa.concat_tables(tables, promote_options="permissive")
            if tables
            else None
        )
        merged = Partial()
        if all_rows is not None:
            is_partial = pc.equal(all_rows["kind"], 0)
            for blob in all_rows.filter(is_partial).column("b1").to_pylist():
                merged.merge(pickle.loads(blob))
            for label, ucols in unique_keys:
                if not hash_unique_keys:
                    n_dup = duplicate_count_distributed(
                        ds, ucols[0], hash_keys=False
                    )
                else:
                    from patito_ray.validation.checks import merge_bucket_blobs

                    sel = all_rows.filter(
                        pc.and_(
                            pc.equal(all_rows["kind"], 1),
                            pc.equal(all_rows["col"], label),
                        )
                    )
                    blob_t = pa.table(
                        {
                            "bucket": sel["bucket"],
                            "u_keys": sel["b1"],
                            "m_keys": sel["b2"],
                            "m_counts": sel["b3"],
                        }
                    )
                    n_dup = int(
                        merge_bucket_blobs(blob_t).column("dups")[0].as_py()
                    )
                if n_dup:
                    merged.dup_counts[label] = n_dup
        report = _finalize(merged, model)
        return report, ds

    partials_ds = combined.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], 0)).select(["b1"]).rename_columns(
            ["partial"]
        ),
        batch_format="pyarrow",
        batch_size=None,
    )
    merged = _tree_merge_partials(partials_ds)

    for label, ucols in unique_keys:
        if hash_unique_keys:
            blobs = combined.map_batches(
                lambda t, c=label: t.filter(
                    pc.and_(pc.equal(t["kind"], 1), pc.equal(t["col"], c))
                )
                .select(["bucket", "b1", "b2", "b3"])
                .rename_columns(["bucket", "u_keys", "m_keys", "m_counts"]),
                batch_format="pyarrow",
                batch_size=None,
            )
            n_dup = _finalize_dup_blobs(blobs)
        else:
            n_dup = duplicate_count_distributed(ds, ucols[0], hash_keys=False)
        if n_dup:
            merged.dup_counts[label] = n_dup

    report = _finalize(merged, model)
    return report, ds


def _finalize_dup_blobs(blobs: Any) -> int:
    """Adaptive finalize of a bucket-blob dataset (strategy in
    ``checks.adaptive_bucket_results``)."""
    from patito_ray.validation.checks import (
        adaptive_bucket_results,
        merge_bucket_blobs,
    )

    tables = adaptive_bucket_results(blobs, merge_bucket_blobs)
    return int(sum(pc.sum(t.column("dups")).as_py() or 0 for t in tables))


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def validate_report(
    data: Any,
    model: Any,
    columns: Iterable[str] | None = None,
    allow_missing_columns: bool = False,
    allow_superfluous_columns: bool = False,
    drop_superfluous_columns: bool = False,
    collect_samples: bool = False,
    references: Mapping[str, Any] | None = None,
    hash_unique_keys: bool = True,
    extra_batch_checks: list[Any] | None = None,
    unique_num_buckets: int = 64,
) -> ValidationReport:
    """Run all checks; always return a ValidationReport (never raises).

    ``unique_num_buckets`` sizes the uniqueness exchange: each bucket's
    phase-2 merge holds ~distinct_keys x 16B / num_buckets — raise it
    (e.g. to 16384) when the key space approaches 10^11+ so per-task
    memory stays bounded.

    ``extra_batch_checks``: user extension hook — callables
    ``fn(pa.Table) -> dict[str, float]`` run inside the SAME streaming
    validation pass; their counters sum across batches and land in
    ``report.merged.custom`` (e.g. the web-page text-extraction
    invariant rides the main pass instead of a second scan)."""
    report, _ = _validate_any(
        data,
        model,
        columns,
        allow_missing_columns,
        allow_superfluous_columns,
        drop_superfluous_columns,
        collect_samples,
        references,
        hash_unique_keys,
        extra_batch_checks,
        unique_num_buckets,
    )
    return report


def validate(
    data: Any,
    model: Any,
    columns: Iterable[str] | None = None,
    allow_missing_columns: bool = False,
    allow_superfluous_columns: bool = False,
    drop_superfluous_columns: bool = False,
    collect_samples: bool = False,
    references: Mapping[str, Any] | None = None,
    hash_unique_keys: bool = True,
    tolerances: Mapping[str, float] | None = None,
) -> Any:
    """Reference-compatible validate: raise DataFrameValidationError on
    any failure, else return the (alias-renamed, possibly
    superfluous-dropped) data (``validators.py:442-492``).

    ``tolerances``: Great-Expectations-style 'mostly' thresholds —
    ``{"col": 0.01}`` tolerates up to 1% violating rows on that loc
    before the run fails (``"*"`` sets the default; see
    ``ValidationReport.waive``). Structural errors never waive."""
    if drop_superfluous_columns and columns:
        raise ValueError("Cannot specify both 'columns' and 'drop_superfluous_columns'.")
    report, transformed = _validate_any(
        data,
        model,
        columns,
        allow_missing_columns,
        allow_superfluous_columns,
        drop_superfluous_columns,
        collect_samples,
        references,
        hash_unique_keys,
        None,
    )
    if tolerances:
        report = report.waive(model, tolerances)
    report.raise_if_failed(model)
    return transformed


def _validate_any(
    data: Any,
    model: Any,
    columns: Iterable[str] | None,
    allow_missing_columns: bool,
    allow_superfluous_columns: bool,
    drop_superfluous_columns: bool,
    collect_samples: bool,
    references: Mapping[str, Any] | None,
    hash_unique_keys: bool,
    extra_batch_checks: list[Any] | None = None,
    unique_num_buckets: int = 64,
) -> tuple[ValidationReport, Any]:
    spec = model._spec()
    refs = _normalize_references(references)
    if _is_dataset(data):
        return _validate_dataset(
            data,
            model,
            spec,
            columns,
            allow_missing_columns,
            allow_superfluous_columns,
            drop_superfluous_columns,
            collect_samples,
            refs,
            hash_unique_keys,
            extra_batch_checks,
            unique_num_buckets,
        )
    table = _to_table(data)
    return _validate_table(
        table,
        model,
        spec,
        columns,
        allow_missing_columns,
        allow_superfluous_columns,
        drop_superfluous_columns,
        collect_samples,
        refs,
        extra_batch_checks,
    )
