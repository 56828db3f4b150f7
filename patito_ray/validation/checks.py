"""Per-batch validation kernels over pyarrow Tables.

This module is the vectorized re-expression of the reference's
``_find_errors`` pass (/root/reference/src/patito/validators.py:84-439)
— identical check semantics, but every check produces a mergeable
``Partial`` so the same code runs (a) locally on one in-memory table
and (b) inside ``ray.data.Dataset.map_batches(batch_format="pyarrow")``
on zero-copy Arrow batches. No Ray imports here: the module must be
cheap to ship to workers.

Check inventory and the reference lines they mirror:
- missing / superfluous columns      (validators.py:118-140)
- non-nullable null counts           (validators.py:142-154)
- nulls inside list items            (validators.py:156-197)
- dtype membership                   (validators.py:199-223)
- enum / Literal allowed values      (validators.py:225-233, 407-439)
- uniqueness (local path only; distributed = the bucketed blob
  exchange in engine.py)             (validators.py:235-244)
- struct / list-of-struct recursion  (validators.py:246-329)
- bounds/const/regex/length/multipleOf (validators.py:331-376)
- custom constraints incl. "_" alias (validators.py:378-402)
"""

from __future__ import annotations

from typing import Any, Iterable

import pyarrow as pa
import pyarrow.compute as pc

from patito_ray import dtypes as _dt
from patito_ray.exprs import (
    col,
    count_failures,
    fail_mask,
    substitute_column,
)
from patito_ray.fields import TableSpec
from patito_ray.validation.result import MAX_INVALID_VALUES, MAX_SAMPLES, Partial


def apply_alias(table: pa.Table, spec: TableSpec) -> pa.Table:
    """Rename data columns via the model's alias generator (reference
    ``validators.py:57-81``). Metadata-only, zero-copy."""
    gen = spec.alias_generator
    if gen is None:
        return table
    return table.rename_columns([gen(name) for name in table.column_names])


def _bound_check_nodes(name: str, bounds: dict[str, Any]) -> list[dict[str, Any]]:
    """JSON-schema bound keys -> predicate expression nodes, matching the
    reference's filter table (``validators.py:333-343``)."""
    c = col(name)
    nodes = []
    for key, value in bounds.items():
        if key == "maximum":
            nodes.append((c <= value).node)
        elif key == "exclusiveMaximum":
            nodes.append((c < value).node)
        elif key == "minimum":
            nodes.append((c >= value).node)
        elif key == "exclusiveMinimum":
            nodes.append((c > value).node)
        elif key == "multipleOf":
            nodes.append(((c == 0) | ((c % value) == 0)).node)
        elif key == "const":
            nodes.append((c == value).node)
        elif key == "pattern":
            nodes.append(c.str.contains(value).node)
        elif key == "minLength":
            nodes.append((c.str.len_chars() >= value).node)
        elif key == "maxLength":
            nodes.append((c.str.len_chars() <= value).node)
    return nodes


def _combine(arr: pa.ChunkedArray | pa.Array) -> pa.Array:
    if isinstance(arr, pa.ChunkedArray):
        return arr.combine_chunks()
    return arr


def _struct_subtable(arr: pa.ChunkedArray | pa.Array) -> pa.Table:
    """Unnest a struct column into a table of its fields (parent nulls
    propagate to every child, as polars ``unnest`` does)."""
    sa = _combine(arr)
    children = sa.flatten()
    names = [sa.type.field(i).name for i in range(sa.type.num_fields)]
    return pa.table(dict(zip(names, children)))


def _sample_rows(table: pa.Table, mask: pa.Array, limit: int = MAX_SAMPLES) -> list[dict]:
    sampled = table.filter(mask).slice(0, limit)
    return sampled.to_pylist()


def check_batch(
    table: pa.Table,
    spec: TableSpec,
    columns: Iterable[str] | None = None,
    allow_missing_columns: bool = False,
    allow_superfluous_columns: bool = False,
    loc_prefix: str = "",
    skip_unique: bool = False,
    collect_samples: bool = False,
    prepared_constraints: dict[str, list[dict[str, Any]]] | None = None,
) -> Partial:
    """Run every batch-local check; returns a mergeable Partial.

    ``skip_unique`` is set in distributed mode, where uniqueness is a
    dedicated groupby shuffle. ``prepared_constraints`` overrides the
    spec's constraint trees (engine substitutes resolved aggregate
    scalars for the two-pass distributed execution of aggregate
    constraints like ``col("fraction").sum() == 1``).
    """
    p = Partial(row_count=table.num_rows)
    columns = list(columns) if columns is not None else None
    schema_subset = columns or spec.column_names
    column_subset = columns or table.column_names
    table_cols = set(table.column_names)

    # --- missing / superfluous (schema-level; deduped by set-merge) ------
    if not allow_missing_columns:
        for missing in set(schema_subset) - table_cols:
            cs = spec.columns.get(missing)
            if cs is not None and cs.allow_missing:
                continue
            p.schema_errors.add((loc_prefix + missing, "missing", ""))
    if not (allow_superfluous_columns or spec.allow_extra):
        for extra in set(column_subset) - set(spec.columns):
            p.schema_errors.add((loc_prefix + extra, "superfluous", ""))

    # --- non-nullable null counts ---------------------------------------
    for name in spec.non_nullable_columns:
        if name not in column_subset or name not in table_cols:
            continue
        n = table.column(name).null_count
        if n:
            p.null_counts[loc_prefix + name] = n

    # --- nulls inside list items ----------------------------------------
    for name, cs in spec.columns.items():
        if name not in column_subset or name not in table_cols:
            continue
        if cs.category != _dt.LIST or cs.item_nullable:
            continue
        arr = table.column(name)
        flat = pc.list_flatten(arr)  # drops null/empty lists, like the
        # reference's filter(not_null) + filter(len>0) + explode
        # (validators.py:173-186)
        n = flat.null_count
        if n:
            p.list_null_counts[loc_prefix + name] = n

    # --- per-column checks ------------------------------------------------
    for name, cs in spec.columns.items():
        if name not in column_subset or name not in table_cols:
            continue
        loc = loc_prefix + name
        arr = table.column(name)
        actual_type = arr.type

        deferred_struct = cs.is_struct or cs.is_list_of_struct
        if not deferred_struct and cs.resolved is not None:
            if cs.dtype_forced and cs.default_dtype is not None:
                # Field(dtype=...) pins the EXACT physical dtype
                # (reference semantics: a forced dtype narrows the
                # valid set to itself — pydantic.py Field dtype kwarg);
                # the annotation family check applies otherwise
                if actual_type != cs.default_dtype:
                    p.schema_errors.add((loc, "dtype", str(actual_type)))
            elif not _dt.valid_dtype(cs.category, cs.resolved, actual_type):
                p.schema_errors.add((loc, "dtype", str(actual_type)))

        # enum / allowed values (validators.py:407-439)
        if cs.enum_values is not None and not deferred_struct:
            permissible = set(cs.enum_values)
            if cs.nullable:
                permissible.add(None)
            if pa.types.is_list(actual_type) or pa.types.is_large_list(actual_type):
                values = pc.list_flatten(arr)
                if arr.null_count:
                    # polars explode turns a null list into a null row
                    permissible_has_none = None in permissible
                    if not permissible_has_none:
                        p.enum_invalid.setdefault(loc, set()).add(None)
            else:
                values = arr
            if pa.types.is_dictionary(values.type):
                values = pc.cast(values, values.type.value_type)
            actual_values = set(pc.unique(_combine(values)).to_pylist())
            invalid = actual_values - permissible
            if invalid:
                cur = p.enum_invalid.setdefault(loc, set())
                # smallest-by-repr subset: deterministic under hash-seed
                # and merge-order variation (associativity invariant)
                cur |= set(sorted(invalid, key=repr)[:MAX_INVALID_VALUES])
                if len(invalid) > MAX_INVALID_VALUES:
                    p.enum_truncated.add(loc)

        # uniqueness — local path only (distributed = shuffle in engine)
        if cs.unique and not skip_unique:
            n_dup = local_duplicate_count(arr)
            if n_dup:
                p.dup_counts[loc] = n_dup

        # struct recursion (validators.py:246-284)
        if cs.is_struct:
            sub = _struct_subtable(arr)
            if cs.nullable:
                # optional struct: drop rows whose every field is null
                masks = [pc.is_null(sub.column(i)) for i in range(sub.num_columns)]
                all_null = masks[0]
                for m in masks[1:]:
                    all_null = pc.and_(all_null, m)
                sub = sub.filter(pc.invert(all_null))
                if sub.num_rows == 0:
                    continue
            nested = check_batch(
                sub,
                cs.nested,  # type: ignore[arg-type]
                loc_prefix=f"{loc}.",
                skip_unique=skip_unique,
                collect_samples=collect_samples,
            )
            nested.row_count = 0  # don't double-count rows
            p.merge(nested)
            continue

        # list-of-struct recursion (validators.py:286-329)
        if cs.is_list_of_struct:
            flat = pc.list_flatten(arr)  # drops null + empty lists
            sub = _struct_subtable(flat)
            if cs.item_nullable:
                # list[Optional[struct]]: reference filters rows where
                # any field is null (validators.py:313)
                keep = None
                for i in range(sub.num_columns):
                    m = pc.is_valid(sub.column(i))
                    keep = m if keep is None else pc.and_(keep, m)
                if keep is not None:
                    sub = sub.filter(keep)
            if sub.num_rows == 0:
                continue
            nested = check_batch(
                sub,
                cs.nested,  # type: ignore[arg-type]
                loc_prefix=f"{loc}.",
                skip_unique=skip_unique,
                collect_samples=collect_samples,
            )
            nested.row_count = 0
            p.merge(nested)
            continue

        # bounds / const / regex / length / multipleOf (validators.py:331-376)
        if cs.bounds:
            n_invalid = 0
            agg_mask = None
            for node in _bound_check_nodes(name, cs.bounds):
                if collect_samples:
                    m = fail_mask(node, table)
                    cnt = pc.sum(m).as_py() or 0
                    n_invalid += int(cnt)
                    agg_mask = m if agg_mask is None else pc.or_(agg_mask, m)
                else:
                    n_invalid += count_failures(node, table)
            if n_invalid:
                p.bounds_fail[loc] = n_invalid
                if collect_samples and agg_mask is not None:
                    p.samples[(loc, "bounds")] = _sample_rows(table, agg_mask)

        # custom constraints (validators.py:378-402)
        constraint_nodes = (
            prepared_constraints.get(name)
            if prepared_constraints is not None
            else cs.constraints
        )
        if constraint_nodes:
            mask = None
            for node in constraint_nodes:
                node = substitute_column(node, "_", name)
                m = fail_mask(node, table)
                mask = m if mask is None else pc.or_(mask, m)
            n_fail = int(pc.sum(mask).as_py() or 0)
            if n_fail:
                p.constraint_fail[loc] = n_fail
                if collect_samples:
                    p.samples[(loc, "constraint")] = _sample_rows(table, mask)

    # --- composite uniqueness (local path only; distributed rides the
    # bucketed blob exchange keyed by the group label) -------------------
    if not skip_unique:
        for label, cols in spec.unique_keys():
            if len(cols) < 2:
                continue  # singles handled in the per-column loop
            if columns is not None and not all(c in columns for c in cols):
                continue
            if not all(c in table_cols for c in cols):
                continue
            import polars as pl

            counts = (
                pl.from_arrow(table.select(list(cols)))
                .group_by(list(cols))
                .len()
            )
            n_dup = int(
                counts.filter(pl.col("len") > 1)["len"].sum() or 0
            )
            if n_dup:
                p.dup_counts[loc_prefix + label] = n_dup

    return p


def local_duplicate_count(arr: pa.ChunkedArray | pa.Array) -> int:
    """Count rows participating in any duplicate group — the reference's
    ``is_duplicated().sum()`` semantics (``validators.py:235-244``:
    ``[1,1,2] -> 2``)."""
    counts = pc.value_counts(_combine(arr))
    c = counts.field("counts")
    dup = pc.filter(c, pc.greater(c, 1))
    total = pc.sum(dup).as_py()
    return int(total or 0)


def batch_key_counts(table: pa.Table, column: str, hash_keys: bool = True) -> pa.Table:
    """Per-batch pre-aggregation for the distributed uniqueness check:
    collapse each batch to (key, count) rows so the global shuffle moves
    one row per *distinct* key per batch instead of one per input row
    (SURVEY.md §4 two-phase plan).

    ``hash_keys=True`` ships a 64-bit key hash instead of the raw value
    (8 bytes vs arbitrarily long urls). Collision risk at 10^12 rows is
    ~0.03 expected colliding pairs — it can only *undercount* distinct
    keys by merging two groups, which for a *duplicate detector* is a
    vanishing false-positive rate; exact mode available by flag.
    Hashing is polars' vectorized 64-bit hash with a fixed seed
    (deterministic within one polars build, which is uniform across the
    cluster image).
    """
    arr = _combine(table.column(column))
    counts = pc.value_counts(arr)
    values = counts.field("values")
    cnts = pc.cast(counts.field("counts"), pa.int64())
    if hash_keys:
        try:
            import numpy as np
            import polars as pl

            # int64 view: Ray groupby block building rejects uint64 > 2^63
            hashed = pl.from_arrow(values).hash(seed=42).to_numpy().view(np.int64)
            return pa.table({"k": pa.array(hashed, type=pa.int64()), "count": cnts})
        except ImportError:
            pass
    return pa.table({"k": values, "count": cnts})


def composite_row_hashes(table: pa.Table, cols: tuple[str, ...]) -> "Any":
    """Row-wise uint64 hash over a column tuple (polars hash_rows —
    vectorized Rust, null-aware, order-sensitive across columns). The
    composite-uniqueness key: hash equality stands in for tuple
    equality with the same n^2/2^64 collision odds the single-column
    hashed path already accepts."""
    import polars as pl

    return pl.from_arrow(table.select(list(cols))).hash_rows(seed=42).to_numpy()


def batch_unique_blobs(
    table: pa.Table, cols: tuple[str, ...], num_buckets: int = 64
) -> pa.Table:
    """Bucket blobs for ONE uniqueness constraint — a single column
    (straight through :func:`batch_key_bucket_blobs`) or a composite
    ``unique_together`` group (row-hash first, then the same blob
    machinery in prehashed mode)."""
    import numpy as np

    if len(cols) == 1:
        return batch_key_bucket_blobs(table, cols[0], num_buckets=num_buckets)
    h = composite_row_hashes(table, cols).astype(np.uint64)
    tmp = pa.table({"k": pa.array(h.view(np.int64))})
    return batch_key_bucket_blobs(tmp, "k", num_buckets=num_buckets, prehashed=True)


def batch_key_bucket_blobs(
    table: pa.Table, column: str, num_buckets: int = 64, prehashed: bool = False
) -> pa.Table:
    """Phase-1 of the blob-bucketed uniqueness exchange: per batch,
    value_counts -> 64-bit key hashes -> partition keys by their top
    hash bits into ``num_buckets`` buckets, packing each bucket's
    (keys, counts) as two binary blobs in ONE output row.

    Why blobs: a Ray groupby over millions of (key, count) rows pays
    per-row shuffle machinery; packing the same bytes into
    (#batches x #buckets) rows cuts the exchanged row count by ~10^4
    while the per-bucket merge stays pure vectorized numpy. Key hashes
    are uniform, so buckets are balanced regardless of value skew; a
    hot VALUE collapses to one (key, count) entry per batch in the
    value_counts, so skew cost is bounded by #batches, not #rows.
    Bucket-memory sizing: distinct_keys x 16B / num_buckets per group —
    raise num_buckets for larger key spaces.
    """
    import numpy as np
    import polars as pl

    arr = _combine(table.column(column))
    counts = pc.value_counts(arr)
    values = counts.field("values")
    cnts = counts.field("counts").to_numpy(zero_copy_only=False).astype(np.int64)
    if prehashed:
        # the column already holds uniform 64-bit hashes (e.g. LSH band
        # keys): reuse them, so blob keys == original values
        hashed = values.to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
    else:
        hashed = pl.from_arrow(values).hash(seed=42).to_numpy().astype(np.uint64)
    shift = np.uint64(64 - int(num_buckets - 1).bit_length())
    bucket = (hashed >> shift).astype(np.int64) % num_buckets
    order = np.argsort(bucket, kind="stable")
    hb, cb, bb = hashed[order], cnts[order], bucket[order]
    # slice contiguous bucket runs; within each run split count==1 keys
    # (the overwhelming majority) from multi-keys so the wire format is
    # 8 bytes/key instead of 16 — counts of 1 are implicit
    uniq, starts = np.unique(bb, return_index=True)
    ends = np.append(starts[1:], len(bb))
    out_bucket, out_u, out_mk, out_mc = [], [], [], []
    for u, s, e in zip(uniq.tolist(), starts.tolist(), ends.tolist()):
        k_run, c_run = hb[s:e], cb[s:e]
        multi = c_run > 1
        out_bucket.append(u)
        out_u.append(k_run[~multi].tobytes())
        out_mk.append(k_run[multi].tobytes())
        out_mc.append(c_run[multi].tobytes())
    return pa.table(
        {
            "bucket": pa.array(out_bucket, type=pa.int32()),
            "u_keys": pa.array(out_u, type=pa.large_binary()),
            "m_keys": pa.array(out_mk, type=pa.large_binary()),
            "m_counts": pa.array(out_mc, type=pa.large_binary()),
        }
    )


def merge_bucket_blobs(group: pa.Table) -> pa.Table:
    """Phase-2 merge for one bucket: unpack all blobs, hash-groupby-sum
    counts per key, emit the bucket's duplicate-row total (patito
    semantics: sum of counts > 1). polars' multithreaded Rust hash
    aggregation when available (≈10x a numpy sort at 10M keys),
    sort-based numpy fallback otherwise."""
    import polars as pl

    keys, counts = unpack_bucket_blobs(group)
    if len(keys) == 0:
        return pa.table({"dups": [0]})
    totals = _key_totals(keys, counts)
    dup = totals.filter(pl.col("c") > 1)["c"].sum()
    return pa.table({"dups": [int(dup or 0)]})


def unpack_bucket_blobs(group: pa.Table) -> tuple[Any, Any]:
    """Blob rows -> (keys, counts) numpy arrays (count==1 keys carry an
    implicit 1)."""
    import numpy as np

    u_keys = np.concatenate(
        [np.frombuffer(b, dtype=np.uint64) for b in group.column("u_keys").to_pylist()]
    ) if group.num_rows else np.empty(0, np.uint64)
    m_keys = np.concatenate(
        [np.frombuffer(b, dtype=np.uint64) for b in group.column("m_keys").to_pylist()]
    ) if group.num_rows else np.empty(0, np.uint64)
    m_counts = np.concatenate(
        [np.frombuffer(b, dtype=np.int64) for b in group.column("m_counts").to_pylist()]
    ) if group.num_rows else np.empty(0, np.int64)
    keys = np.concatenate([u_keys, m_keys])
    counts = np.concatenate([np.ones(len(u_keys), dtype=np.int64), m_counts])
    return keys, counts


def _key_totals(keys: Any, counts: Any) -> Any:
    """Per-key count totals as a polars DataFrame (multithreaded Rust
    hash aggregation)."""
    import polars as pl

    return (
        pl.DataFrame({"k": keys, "c": counts})
        .group_by("k")
        .agg(pl.col("c").sum())
    )


def referential_miss_mask(
    table: pa.Table, column: str, key_set: pa.Array
) -> pa.Array:
    """Rows whose non-null key is absent from the (broadcast) key set —
    the map-side of a broadcast anti-join. Null keys are not failures
    (they are the null-count check's business)."""
    arr = table.column(column)
    present = pc.is_in(_combine(arr), value_set=key_set)
    missing = pc.and_(pc.invert(present), pc.is_valid(arr))
    return _combine(missing)



def adaptive_bucket_results(
    blobs: Any,
    per_bucket_fn: Any,
    driver_merge_bytes: int = 256 * 1024 * 1024,
) -> list[pa.Table]:
    """Finalize a bucket-blob Dataset adaptively — the shared strategy
    of every blob-exchange consumer (duplicate counts, distinct counts,
    dup-key sets): below ``driver_merge_bytes`` the pre-aggregated
    blobs fit comfortably on the driver (1M distinct keys = 16 MB) and
    ONE vectorized merge beats any shuffle's fixed cost; above it, the
    ``groupby(bucket)`` exchange keeps per-task memory bounded (bucket
    size = distinct_keys x 16 B / num_buckets).

    ``per_bucket_fn(table) -> table`` must be bucket-agnostic (correct
    when handed the concatenation of ALL buckets). Returns the list of
    result tables for the caller to fold.
    """
    blobs = blobs.materialize()
    if blobs.size_bytes() <= driver_merge_bytes:
        tables = list(blobs.iter_batches(batch_format="pyarrow", batch_size=None))
        if not tables:
            return []
        allb = pa.concat_tables(tables, promote_options="permissive")
        return [per_bucket_fn(allb)]
    out = blobs.groupby("bucket").map_groups(per_bucket_fn, batch_format="pyarrow")
    return [
        t for t in out.iter_batches(batch_format="pyarrow") if t.num_rows
    ]
