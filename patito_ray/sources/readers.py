"""Model-aware sources.

Mirrors the reference's model-driven ingest (``DataFrame.read_csv``,
/root/reference/src/patito/polars.py:879-960: model dtypes as schema
overrides, header-less name injection, then auto-``derive()``) —
re-expressed over Ray Data readers with Arrow schemas. The primary
production source is parquet with column projection pushdown; csv is
the compatibility path.
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.csv as pacsv

from patito_ray.frame import ModelFrame
from patito_ray.model import Model


def _non_derived_schema(model: type[Model]) -> pa.Schema:
    spec = model._spec()
    return pa.schema(
        [
            pa.field(n, c.default_dtype, nullable=c.nullable)
            for n, c in spec.columns.items()
            if c.derived_from is None and c.default_dtype is not None
        ]
    )


def read_csv(
    paths: str | list[str],
    model: type[Model],
    has_header: bool = True,
    derive: bool = True,
    **kwargs: Any,
) -> ModelFrame:
    """Ray Data csv read with the model's dtypes as the Arrow convert
    schema; header-less files get model column names injected; derived
    columns auto-populate afterwards (reference polars.py:879-960)."""
    import ray.data as rd

    schema = _non_derived_schema(model)
    convert = pacsv.ConvertOptions(
        column_types={f.name: f.type for f in schema}
    )
    read_opts = None
    if not has_header:
        read_opts = pacsv.ReadOptions(column_names=schema.names)
    parse = pacsv.ParseOptions()
    ds = rd.read_csv(
        paths,
        convert_options=convert,
        read_options=read_opts,
        parse_options=parse,
        **kwargs,
    )
    frame = ModelFrame(ds, model)
    if derive and model._spec() and any(
        c.derived_from is not None for c in model._spec().columns.values()
    ):
        frame = frame.derive()
    return frame


def read_json(
    paths: str | list[str],
    model: type[Model],
    derive: bool = True,
    **kwargs: Any,
) -> ModelFrame:
    """Ray Data JSON-lines read typed by the model: each block parses
    with the model's non-derived columns as the explicit Arrow schema
    (no cross-block type inference drift — a column of all-null lines
    in one shard cannot silently infer a different dtype), then derived
    columns auto-populate. Mirrors ``read_csv``; the web-crawl
    interchange format (one JSON object per line, e.g. CC-style WET/
    WARC sidecars) reads straight into a validated pipeline."""
    import pyarrow.json as pajson
    import ray.data as rd

    # all-nullable read schema: the read's job is dtype coercion only —
    # a null in a non-nullable model column must surface as a clean
    # validate() error, not an ArrowInvalid inside a read task (which
    # Ray's json fallback then turns into an opaque KeyError)
    schema = pa.schema(
        [pa.field(f.name, f.type) for f in _non_derived_schema(model)]
    )
    parse = pajson.ParseOptions(explicit_schema=schema)
    ds = rd.read_json(paths, parse_options=parse, **kwargs)
    frame = ModelFrame(ds, model)
    if derive and model._spec() and any(
        c.derived_from is not None for c in model._spec().columns.values()
    ):
        frame = frame.derive()
    return frame


def clean_read_parquet(
    paths: str | list[str], columns: list[str] | None = None, **kwargs: Any
) -> Any:
    """``ray.data.read_parquet`` passing an explicit metadata-stripped
    Arrow schema.

    Some producers (e.g. pandas writers) attach schema metadata that
    makes ``pyarrow.Schema`` unhashable; Ray's per-task schema-dedup
    fast path (``transform_pyarrow.unify_schemas``) then logs a
    'Failed to hash the schemas' warning from EVERY read task, burying
    real warnings. Resolving the schema once on the driver and passing
    the stripped, column-projected version removes the noise and skips
    per-task schema unification work.
    """
    import pyarrow.dataset as pads
    import ray.data as rd

    pd_ds = pads.dataset(paths, format="parquet")
    schema = pd_ds.schema.remove_metadata()
    if columns is not None:
        schema = pa.schema([schema.field(c) for c in columns])
    if "override_num_blocks" not in kwargs:
        # Ray's default read fan-out targets CPU count regardless of
        # input size; on a small table that means hundreds of sub-1k-row
        # blocks whose fixed per-task cost dominates the pipeline
        # (measured: a 2 MB / 100k-row table cost ~4 s of pure task
        # latency). Clamp parallelism so every block carries at least
        # ~256 KB of file bytes; large inputs keep the ~4x-CPU default.
        import ray

        try:
            # one batched metadata call, not one RPC per file
            infos = pd_ds.filesystem.get_file_info(list(pd_ds.files))
            total_bytes = sum(i.size or 0 for i in infos)
            cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
            by_bytes = max(1, total_bytes // (256 * 1024))
            kwargs["override_num_blocks"] = int(max(1, min(4 * cpus, by_bytes)))
        except Exception:
            pass  # unknown size (e.g. exotic filesystem): Ray's default
    return rd.read_parquet(paths, columns=columns, schema=schema, **kwargs)


def read_parquet(
    paths: str | list[str],
    model: type[Model],
    columns: list[str] | None = None,
    derive: bool = False,
    **kwargs: Any,
) -> ModelFrame:
    """Parquet read with model-driven column projection: only the model's
    (non-derived) columns leave storage unless ``columns`` overrides."""
    if columns is None:
        import pyarrow.dataset as pads

        spec = model._spec()
        file_cols = set(pads.dataset(paths, format="parquet").schema.names)
        # project to the model columns the FILE actually has:
        # allow_missing columns that exist must still be read (excluding
        # them silently dropped real optional data), and required
        # columns the file lacks are left to validation's
        # MissingColumnsError instead of a raw reader KeyError
        columns = [
            n
            for n, c in spec.columns.items()
            if c.derived_from is None and n in file_cols
        ]
    ds = clean_read_parquet(paths, columns=columns, **kwargs)
    frame = ModelFrame(ds, model)
    if derive:
        frame = frame.derive()
    return frame


def parquet_footer_stats(
    paths: "str | list[str]", columns: list[str]
) -> pa.Table:
    """COUNT/MIN/MAX/null-count per column computed from Parquet
    FOOTERS ONLY — zero data bytes read. At 100 TB this is the
    seconds-not-hours path for row counts, bounds checks and partition
    pruning audits: footer reads distribute one task per file batch,
    partials (a handful of scalars per file) merge on the driver.

    -> one-row pa.Table: ``n_rows`` plus ``{col}_min`` / ``{col}_max``
    / ``{col}_nulls`` per requested column.

    Only numeric/temporal columns are allowed: Parquet string stats
    may be TRUNCATED by writers (correct for pruning, wrong as exact
    MIN/MAX); NaN-containing double columns have writer-dependent
    stats. A file with a missing stats block raises loudly rather
    than returning silently-wrong bounds.
    """
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq
    import ray.data as rd

    pd_ds = pads.dataset(paths, format="parquet")
    schema = pd_ds.schema
    for c in columns:
        f = schema.field(c)
        if not (
            pa.types.is_integer(f.type)
            or pa.types.is_floating(f.type)
            or pa.types.is_temporal(f.type)
        ):
            raise TypeError(
                f"parquet_footer_stats only trusts numeric/temporal "
                f"column stats; {c!r} is {f.type} (string stats may be "
                "writer-truncated)"
            )
    files = list(pd_ds.files)
    if not files:
        raise ValueError(f"no parquet files found under {paths!r}")
    fs = pd_ds.filesystem

    def footer(batch: pa.Table) -> pa.Table:
        rows_out: dict[str, list] = {"n_rows": []}
        for c in columns:
            rows_out[f"{c}_min"] = []
            rows_out[f"{c}_max"] = []
            rows_out[f"{c}_nulls"] = []
        for path in batch.column("path").to_pylist():
            with fs.open_input_file(path) as f:
                md = pq.ParquetFile(f).metadata
            idx = {
                md.row_group(0).column(i).path_in_schema: i
                for i in range(md.row_group(0).num_columns)
            } if md.num_row_groups else {}
            mins: dict[str, Any] = {c: None for c in columns}
            maxs: dict[str, Any] = {c: None for c in columns}
            nulls: dict[str, int] = {c: 0 for c in columns}
            for g in range(md.num_row_groups):
                rg = md.row_group(g)
                for c in columns:
                    st = rg.column(idx[c]).statistics
                    if st is None:
                        raise ValueError(
                            f"{path}: row group {g} has no stats block "
                            f"for column {c!r}; cannot answer from footers"
                        )
                    if st.has_min_max:
                        if mins[c] is None or st.min < mins[c]:
                            mins[c] = st.min
                        if maxs[c] is None or st.max > maxs[c]:
                            maxs[c] = st.max
                    elif (st.null_count or 0) != rg.num_rows:
                        # only an ALL-NULL group may lack min/max
                        raise ValueError(
                            f"{path}: row group {g} has values but no "
                            f"min/max stats for column {c!r}; cannot "
                            "answer from footers"
                        )
                    nulls[c] += st.null_count or 0
            rows_out["n_rows"].append(md.num_rows)
            for c in columns:
                rows_out[f"{c}_min"].append(mins[c])
                rows_out[f"{c}_max"].append(maxs[c])
                rows_out[f"{c}_nulls"].append(nulls[c])
        return pa.table(rows_out)

    per_file = rd.from_items(
        [{"path": p} for p in files],
        override_num_blocks=max(1, min(len(files), 64)),
    ).map_batches(footer, batch_format="pyarrow", batch_size=None)
    tabs = [t for t in per_file.iter_batches(batch_format="pyarrow") if t.num_rows]
    merged = pa.concat_tables(tabs)
    out: dict[str, Any] = {
        "n_rows": [pc.sum(merged.column("n_rows")).as_py()]
    }
    for c in columns:
        out[f"{c}_min"] = [pc.min(merged.column(f"{c}_min")).as_py()]
        out[f"{c}_max"] = [pc.max(merged.column(f"{c}_max")).as_py()]
        out[f"{c}_nulls"] = [pc.sum(merged.column(f"{c}_nulls")).as_py()]
    return pa.table(out)


def read_parquet_evolved(
    paths: "str | list[str]", columns: "list[str] | None" = None
) -> Any:
    """Union-by-name read across schema GENERATIONS of a dataset: a
    long-lived 100-TB table accretes files written under different
    schema versions (a column added, an int widened), and a plain
    reader either crashes on the mismatch or silently drops data.
    Files are grouped by exact schema (one footer-metadata read per
    file, no data bytes), the group schemas unify by NAME with
    permissive numeric promotion, and every group's batches align to
    the unified schema per batch — missing columns null-fill, narrower
    types cast. Returns ONE Dataset in the unified schema.

    A column whose types cannot unify (e.g. string vs int64) raises at
    plan time with both offending types — silent coercion would be
    data corruption."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq
    import ray.data as rd

    file_list = list(pads.dataset(paths, format="parquet").files)
    if not file_list:
        raise FileNotFoundError(f"no parquet files under {paths!r}")
    groups: dict[Any, list[str]] = {}
    for f in sorted(file_list):
        schema = pq.read_schema(f).remove_metadata()
        groups.setdefault(schema, []).append(f)
    try:
        unified = pa.unify_schemas(
            list(groups.keys()), promote_options="permissive"
        )
    except pa.ArrowTypeError as e:
        raise ValueError(
            f"schema generations cannot unify by name: {e}"
        ) from None
    if columns is not None:
        unified = pa.schema([unified.field(c) for c in columns])

    def align(t: pa.Table) -> pa.Table:
        cols = []
        for field in unified:
            if field.name in t.column_names:
                cols.append(t.column(field.name).cast(field.type))
            else:
                cols.append(pa.nulls(t.num_rows, field.type))
        return pa.table(dict(zip(unified.names, cols)))

    parts = []
    for schema, files in groups.items():
        present = [c for c in unified.names if schema.get_field_index(c) >= 0]
        # a generation with none of the projected columns still
        # contributes all-null ROWS: read one narrow column to keep
        # the row count (align only emits unified fields)
        read_cols = present or [schema.names[0]]
        parts.append(
            clean_read_parquet(files, columns=read_cols).map_batches(
                align, batch_format="pyarrow", batch_size=None
            )
        )
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    return ds
