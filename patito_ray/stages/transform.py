"""Model-aware cleanse transforms: derive / cast / fill_null / unalias / drop.

Mirrors the reference's DataFrame methods
(/root/reference/src/patito/polars.py): ``derive`` (:132-219, recursive
derivation DAG, cast to target dtype, model-columns-first output),
``cast`` (:279-334, non-strict keeps already-valid dtypes, forced
dtypes always cast), ``fill_null(strategy="defaults")`` (:637-708,
creates missing default columns), ``unalias`` (:221-277, str alias
rename / list-of-candidates coalesce), ``drop`` (:504-543, no-arg drops
non-model columns).

Each transform has a pure-Arrow table kernel plus a Dataset wrapper
that runs it as a stateless ``map_batches(batch_format="pyarrow")``
stage — per-batch projections with no shuffle, the embarrassingly
parallel part of the E2 cleanse chain (SURVEY.md §3).
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa
import pyarrow.compute as pc

from patito_ray import dtypes as _dt
from patito_ray.exprs import eval_expr
from patito_ray.fields import TableSpec


def _as_chunked(v: Any, length: int) -> pa.ChunkedArray | pa.Array:
    if isinstance(v, (pa.Array, pa.ChunkedArray)):
        return v
    if isinstance(v, pa.Scalar):
        v = v.as_py()
    return pa.array([v] * length)


# ---------------------------------------------------------------------------
# derive
# ---------------------------------------------------------------------------


def _derivation_order(spec: TableSpec) -> list[str]:
    """Topological order of derived columns (a derived expr may reference
    another derived column — reference ``polars.py:160-187`` derives
    roots first)."""
    derived = {n: c for n, c in spec.columns.items() if c.derived_from is not None}
    order: list[str] = []
    visiting: set[str] = set()

    def visit(name: str) -> None:
        if name in order or name not in derived:
            return
        if name in visiting:
            raise ValueError(f"cyclic derived_from involving {name!r}")
        visiting.add(name)
        d = derived[name].derived_from
        roots = {d} if isinstance(d, str) else set()
        if isinstance(d, dict):
            from patito_ray.exprs import _root_names

            roots = _root_names(d)
        for r in roots:
            visit(r)
        visiting.discard(name)
        order.append(name)

    for name in derived:
        visit(name)
    return order


def derive_table(table: pa.Table, spec: TableSpec) -> pa.Table:
    """Populate derived_from columns; output model columns first."""
    for name in _derivation_order(spec):
        cs = spec.columns[name]
        d = cs.derived_from
        if isinstance(d, str):
            if d not in table.column_names:
                raise ValueError(f"derived_from column {d!r} not in table")
            value = table.column(d)
        else:
            value = eval_expr(d, table)  # type: ignore[arg-type]
        value = _as_chunked(value, table.num_rows)
        if cs.default_dtype is not None and value.type != cs.default_dtype:
            value = pc.cast(value, cs.default_dtype, safe=False)
        if name in table.column_names:
            table = table.set_column(
                table.column_names.index(name), name, value
            )
        else:
            table = table.append_column(name, value)
    # model columns first, original extras after (reference polars.py:200-218)
    model_cols = [c for c in spec.column_names if c in table.column_names]
    extras = [c for c in table.column_names if c not in spec.columns]
    return table.select(model_cols + extras)


# ---------------------------------------------------------------------------
# cast
# ---------------------------------------------------------------------------


def cast_table(table: pa.Table, spec: TableSpec, strict: bool = False) -> pa.Table:
    """Cast columns to model dtypes. Non-strict mode (default, matching
    ``DataFrame.cast``) keeps columns whose dtype is already valid for
    the field; forced ``Field(dtype=...)`` always casts."""
    out = table
    for name, cs in spec.columns.items():
        if name not in table.column_names or cs.default_dtype is None:
            continue
        arr = out.column(name)
        if arr.type == cs.default_dtype:
            continue
        if (
            not strict
            and not cs.dtype_forced
            and cs.resolved is not None
            and _dt.valid_dtype(cs.category, cs.resolved, arr.type)
        ):
            continue
        out = out.set_column(
            out.column_names.index(name),
            name,
            pc.cast(arr, cs.default_dtype, safe=False),
        )
    return out


# ---------------------------------------------------------------------------
# fill_null
# ---------------------------------------------------------------------------


def fill_null_table(table: pa.Table, spec: TableSpec) -> pa.Table:
    """Fill nulls with model defaults; create missing default columns."""
    out = table
    for name, cs in spec.columns.items():
        if not cs.has_default or cs.default is None:
            continue
        if name in out.column_names:
            arr = out.column(name)
            if arr.null_count:
                out = out.set_column(
                    out.column_names.index(name),
                    name,
                    pc.fill_null(arr, pa.scalar(cs.default, type=cs.default_dtype)),
                )
        else:
            out = out.append_column(
                name,
                pa.array([cs.default] * out.num_rows, type=cs.default_dtype),
            )
    return out


# ---------------------------------------------------------------------------
# unalias
# ---------------------------------------------------------------------------


def unalias_table(table: pa.Table, spec: TableSpec) -> pa.Table:
    """Map source columns to model names via Field(alias=...).

    str alias -> rename; list alias -> coalesce the candidates in order
    (pydantic AliasChoices); tuple alias ``(src, i)`` -> extract element
    i of a list column (pydantic AliasPath). Reference
    ``polars.py:221-277``.
    """
    out = table
    for name, cs in spec.columns.items():
        if cs.alias is None or name in out.column_names:
            continue
        if isinstance(cs.alias, tuple):
            src, idx = cs.alias
            if src in out.column_names:
                out = out.append_column(
                    name, pc.list_element(out.column(src), idx)
                )
            continue
        if isinstance(cs.alias, str):
            if cs.alias in out.column_names:
                # set_column installs the column under its NEW name
                idx = out.column_names.index(cs.alias)
                out = out.set_column(idx, name, out.column(cs.alias))
        else:
            present = [a for a in cs.alias if a in out.column_names]
            if not present:
                continue
            arrays = [out.column(a) for a in present]
            merged = arrays[0]
            for a in arrays[1:]:
                merged = pc.coalesce(merged, a)
            out = out.append_column(name, merged)
            out = out.drop_columns(present)
    return out


# ---------------------------------------------------------------------------
# drop
# ---------------------------------------------------------------------------


def drop_extra_table(table: pa.Table, spec: TableSpec) -> pa.Table:
    keep = [c for c in table.column_names if c in spec.columns]
    return table.select(keep)


# ---------------------------------------------------------------------------
# Dataset wrappers — all stateless map_batches projections
# ---------------------------------------------------------------------------


def _map(ds: Any, fn: Any, spec: TableSpec, **kwargs: Any) -> Any:
    return ds.map_batches(
        lambda t: fn(t, spec, **kwargs), batch_format="pyarrow", batch_size=None
    )


def derive_dataset(ds: Any, spec: TableSpec) -> Any:
    return _map(ds, derive_table, spec)


def cast_dataset(ds: Any, spec: TableSpec, strict: bool = False) -> Any:
    return _map(ds, cast_table, spec, strict=strict)


def fill_null_dataset(ds: Any, spec: TableSpec) -> Any:
    return _map(ds, fill_null_table, spec)


def fill_null_strategy_table(
    table: pa.Table,
    strategy: str | None = None,
    value: Any = None,
    limit: int | None = None,
) -> pa.Table:
    """Non-"defaults" fill_null on an in-memory table: passthrough to
    polars, mirroring the reference (polars.py:637-708) which delegates
    every strategy other than "defaults" to polars."""
    import polars as pl

    df = pl.from_arrow(table)
    return df.fill_null(value=value, strategy=strategy, limit=limit).to_arrow()


def fill_null_strategy_dataset(
    ds: Any, strategy: str | None = None, value: Any = None
) -> Any:
    """Non-"defaults" fill_null over a Dataset.

    Distribution-safe strategies only:
    - explicit ``value`` / "zero" / "one": elementwise, per batch;
    - "min" / "max" / "mean": ONE global aggregation pass over the
      numeric columns, then a broadcast per-batch fill.
    "forward"/"backward" are rejected: they depend on a total row order
    a distributed dataset does not define — sort to a single partition
    (or use the in-memory table path) first.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    if strategy in ("forward", "backward"):
        raise ValueError(
            f"fill_null strategy {strategy!r} needs a defined global row "
            "order; materialize to a table (ModelFrame.as_table) or sort "
            "first — a distributed Dataset has no total order"
        )
    if strategy not in (None, "zero", "one", "min", "max", "mean"):
        raise ValueError(
            f"unknown fill_null strategy {strategy!r}; the Dataset path "
            "supports value / zero / one / min / max / mean"
        )

    if strategy in ("min", "max", "mean"):
        from ray.data.aggregate import Max, Mean, Min

        agg_cls = {"min": Min, "max": Max, "mean": Mean}[strategy]
        names = ds.schema().names
        types = ds.schema().types
        num_cols = [
            n
            for n, t in zip(names, types)
            if pa.types.is_integer(t) or pa.types.is_floating(t)
        ]
        if not num_cols:
            return ds
        row = ds.aggregate(*[agg_cls(c, alias_name=c) for c in num_cols])
        fills = {c: row[c] for c in num_cols if row.get(c) is not None}

        def fill_stats(t: pa.Table) -> pa.Table:
            out = t
            for c, v in fills.items():
                arr = out.column(c)
                if arr.null_count:
                    # safe=False: a non-integral mean truncates into an
                    # int column (polars semantics on the table path)
                    out = out.set_column(
                        out.column_names.index(c),
                        c,
                        pc.fill_null(arr, pa.scalar(v).cast(arr.type, safe=False)),
                    )
            return out

        return ds.map_batches(fill_stats, batch_format="pyarrow", batch_size=None)

    def fill_elem(t: pa.Table) -> pa.Table:
        out = t
        for i, c in enumerate(t.column_names):
            arr = out.column(c)
            if not arr.null_count:
                continue
            typ = arr.type
            if value is not None:
                try:
                    fv = pa.scalar(value, type=typ)
                except (pa.ArrowInvalid, pa.ArrowTypeError):
                    continue
            elif strategy in ("zero", "one"):
                if not (pa.types.is_integer(typ) or pa.types.is_floating(typ)):
                    continue
                fv = pa.scalar(0 if strategy == "zero" else 1, type=typ)
            else:
                continue
            out = out.set_column(i, c, pc.fill_null(arr, fv))
        return out

    return ds.map_batches(fill_elem, batch_format="pyarrow", batch_size=None)


def unalias_dataset(ds: Any, spec: TableSpec) -> Any:
    return _map(ds, unalias_table, spec)


def drop_extra_dataset(ds: Any, spec: TableSpec) -> Any:
    keep = [c for c in ds.schema().names if c in spec.columns]
    return ds.select_columns(keep)


def melt(
    ds: Any,
    id_vars: list[str],
    value_vars: list[str],
    var_name: str = "variable",
    value_name: str = "value",
) -> Any:
    """UNPIVOT / melt: turn ``value_vars`` columns into
    ``(var_name, value_name)`` rows, repeating ``id_vars`` — a pure
    per-batch reshape (k stacked zero-copy slices per batch, no
    exchange, streams at any scale). Value columns are cast to their
    common arrow type up front so the unified column is well-typed."""
    import pyarrow as pa

    if not value_vars:
        raise ValueError("melt needs at least one value_var")
    schema = ds.schema()
    vtypes = [schema.types[schema.names.index(v)] for v in value_vars]
    common = vtypes[0]
    for t in vtypes[1:]:
        # unify numeric widths the arrow way: fail loudly on
        # incompatible families instead of silently casting
        if t != common:
            if pa.types.is_floating(t) or pa.types.is_floating(common):
                if not (
                    pa.types.is_floating(t) or pa.types.is_integer(t)
                ) or not (
                    pa.types.is_floating(common) or pa.types.is_integer(common)
                ):
                    raise TypeError(
                        f"melt value_vars mix incompatible types {common} / {t}"
                    )
                common = pa.float64()
            elif pa.types.is_integer(t) and pa.types.is_integer(common):
                common = pa.int64()
            else:
                raise TypeError(
                    f"melt value_vars mix incompatible types {common} / {t}"
                )

    def reshape(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        outs = []
        for v in value_vars:
            cols = {c: t.column(c) for c in id_vars}
            cols[var_name] = pa.array([v] * t.num_rows, type=pa.string())
            cols[value_name] = pc.cast(t.column(v), common)
            outs.append(pa.table(cols))
        return pa.concat_tables(outs)

    return ds.map_batches(reshape, batch_format="pyarrow", batch_size=None)


def json_extract_column(
    ds: Any,
    column: str,
    path: str,
    out: str,
    dtype: "pa.DataType | None" = None,
) -> Any:
    """Extract a JSON path from a string column into a typed column —
    per-batch vectorized (polars' Rust JSON path kernel), no exchange.
    Missing keys / malformed documents yield null, like SQL
    ``json_extract``. ``path`` is a ``$.field`` JSONPath subset."""
    import polars as pl
    import pyarrow as pa

    def extract(t: pa.Table) -> pa.Table:
        s = pl.from_arrow(t.select([column]).column(column).combine_chunks())
        vals = s.str.json_path_match(path).rename(out)
        arr = vals.to_arrow()
        if dtype is not None:
            import pyarrow.compute as pc

            arr = pc.cast(arr, dtype)
        return t.append_column(out, arr)

    return ds.map_batches(extract, batch_format="pyarrow", batch_size=None)


def regex_extract_explode(
    ds: Any,
    column: str,
    pattern: str,
    out: str,
    keep: list[str],
) -> Any:
    """All non-overlapping regex matches per row, exploded to one row
    per match (SQL ``UNNEST(regexp_extract_all(...))``) — per-batch
    vectorized Rust regex + explode, no exchange. Rows with no match
    (or a null input) vanish, matching UNNEST-of-empty-list semantics.
    ``keep`` lists the id columns carried alongside ``out``."""
    import polars as pl
    import pyarrow as pa

    def extract(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select(keep + [column]))
        out_df = (
            df.with_columns(pl.col(column).str.extract_all(pattern).alias(out))
            .explode(out)
            .filter(pl.col(out).is_not_null())
            .select(keep + [out])
        )
        return out_df.to_arrow()

    return ds.map_batches(extract, batch_format="pyarrow", batch_size=None)
