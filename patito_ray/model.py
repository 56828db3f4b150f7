"""Declarative table models: annotations + Field() -> compiled TableSpec.

The user-facing surface mirrors the reference's ``patito.Model``
(/root/reference/src/patito/pydantic.py): a class whose type-annotated
fields *are* the table schema, exposing compiled-schema views
(``columns``/``dtypes``/``defaults``/``unique_columns``/...,
reference ``pydantic.py:97-283``), whole-table ``validate()``
(``pydantic.py:412-477``), example-data generation
(``pydantic.py:498-884``) and schema algebra
(select/drop/rename/prefix/suffix/with_fields/join,
``pydantic.py:886-1163``). Implementation is original and compiles to
Arrow + expression-IR specs that ship into Ray tasks.
"""

from __future__ import annotations

import datetime
from typing import Any, get_type_hints

import pyarrow as pa

from patito_ray import dtypes as _dt
from patito_ray.exceptions import MultipleRowsReturned, RowDoesNotExist
from patito_ray.exprs import Expr
from patito_ray.fields import _MISSING, ColumnSpec, Field, FieldInfo, TableSpec
from patito_ray.reprs import display_as_type

__all__ = ["Model", "Field"]


def _class_hints(cls: type) -> dict[str, Any]:
    """Annotations across the MRO. Falls back to raw ``__annotations__``
    when ``get_type_hints`` cannot resolve forward references (models
    defined inside function bodies)."""
    try:
        hints = get_type_hints(cls, include_extras=True)
    except NameError:
        hints = {}
        for klass in reversed(cls.__mro__):
            hints.update(getattr(klass, "__annotations__", {}))
    hints.pop("model_config", None)
    return hints


class _ClassProperty:
    def __init__(self, fget: Any) -> None:
        self.fget = fget

    def __get__(self, _obj: Any, owner: type) -> Any:
        return self.fget(owner)


def _compile_column(name: str, annotation: Any, info: FieldInfo | None) -> ColumnSpec:
    resolved = _dt.resolve_annotation(annotation)
    info = info or FieldInfo()

    dtype_forced = info.dtype is not None
    default_dtype = info.dtype if dtype_forced else resolved.default
    if default_dtype is None and not dtype_forced:
        raise TypeError(
            f"field {name!r}: annotation {display_as_type(annotation)} has no "
            "default dtype; pass Field(dtype=...)"
        )
    if dtype_forced and not _dt.valid_dtype(resolved.category, resolved, info.dtype):
        # compile-time guard rail mirroring the reference's
        # validate_polars_dtype (_pydantic/dtypes/dtypes.py:58-112):
        # a forced dtype outside the annotation's valid family is a
        # model bug, caught eagerly instead of at first validate()
        raise TypeError(
            f"field {name!r}: Field(dtype={info.dtype}) is not a valid dtype "
            f"for annotation {display_as_type(annotation)}"
        )

    has_default = info.default is not _MISSING
    nullable = resolved.nullable

    nested: TableSpec | None = None
    item_nullable: bool | None = None
    category = resolved.category
    if category == _dt.STRUCT and resolved.nested_model is not None:
        nested = resolved.nested_model._spec()
    elif category == _dt.LIST and resolved.item is not None:
        item_nullable = resolved.item.nullable
        if resolved.item.category == _dt.STRUCT and resolved.item.nested_model:
            nested = resolved.item.nested_model._spec()
        if resolved.item.category == _dt.ENUM:
            resolved.enum_values = resolved.item.enum_values

    constraints: list[dict[str, Any]] = []
    if info.constraints is not None:
        cs = info.constraints if isinstance(info.constraints, list) else [info.constraints]
        constraints = [c.node for c in cs]

    derived: dict[str, Any] | str | None = None
    if info.derived_from is not None:
        derived = (
            info.derived_from.node
            if isinstance(info.derived_from, Expr)
            else info.derived_from
        )

    bounds = dict(info.bounds)
    return ColumnSpec(
        name=name,
        category=category,
        default_dtype=default_dtype,
        nullable=nullable,
        dtype_forced=dtype_forced,
        has_default=has_default,
        default=(info.default if has_default else None),
        unique=info.unique,
        allow_missing=info.allow_missing,
        enum_values=resolved.enum_values,
        bounds=bounds,
        constraints=constraints,
        derived_from=derived,
        alias=info.alias,
        item_nullable=item_nullable,
        nested=nested,
        resolved=resolved,
    )


class Model:
    """Base class for declarative table models."""

    model_config: dict[str, Any] = {}

    def __init__(self, **data: Any) -> None:
        for key, value in data.items():
            setattr(self, key, value)

    def __repr__(self) -> str:
        fields = ", ".join(
            f"{n}={getattr(self, n, None)!r}" for n in type(self).columns
        )
        return f"{type(self).__name__}({fields})"

    def __eq__(self, other: Any) -> bool:
        if type(self) is not type(other):
            return NotImplemented
        cols = type(self).columns
        return all(
            getattr(self, n, None) == getattr(other, n, None) for n in cols
        )

    # -- compile ----------------------------------------------------------

    @classmethod
    def _spec(cls) -> TableSpec:
        cached = cls.__dict__.get("_compiled_spec")
        if cached is not None:
            return cached
        hints = _class_hints(cls)
        columns: dict[str, ColumnSpec] = {}
        for name, annotation in hints.items():
            if name.startswith("_"):
                continue
            raw = getattr(cls, name, _MISSING)
            info: FieldInfo | None
            if isinstance(raw, FieldInfo):
                info = raw
            elif raw is _MISSING:
                info = None
            else:
                info = FieldInfo(default=raw)
            columns[name] = _compile_column(name, annotation, info)
        groups: list[tuple[str, ...]] = []
        for g in cls.model_config.get("unique_together") or ():
            group = tuple(g)
            if len(group) < 2:
                raise ValueError(
                    f"{cls.__name__}.model_config['unique_together'] group "
                    f"{group!r} needs at least two columns — use "
                    "Field(unique=True) for a single column"
                )
            if len(set(group)) != len(group):
                raise ValueError(
                    f"{cls.__name__} unique_together group {group!r} "
                    "repeats a column"
                )
            missing = [c for c in group if c not in columns]
            if missing:
                raise ValueError(
                    f"{cls.__name__} unique_together group {group!r} names "
                    f"unknown column(s) {missing}"
                )
            groups.append(group)
        spec = TableSpec(
            model_name=cls.__name__,
            columns=columns,
            alias_generator=cls.model_config.get("alias_generator"),
            allow_extra=cls.model_config.get("extra") == "allow",
            unique_together=groups,
        )
        cls._compiled_spec = spec
        return spec

    # -- schema views (reference pydantic.py:97-283) ----------------------

    @_ClassProperty
    def columns(cls) -> list[str]:  # noqa: N805
        return cls._spec().column_names

    @_ClassProperty
    def dtypes(cls) -> dict[str, pa.DataType]:  # noqa: N805
        return {n: c.default_dtype for n, c in cls._spec().columns.items()}

    @_ClassProperty
    def valid_dtypes(cls) -> dict[str, str]:  # noqa: N805
        """Human-readable allowed physical dtype family per column
        (reference ``valid_dtypes``, pydantic.py:139-162; membership
        itself is checked by ``dtypes.valid_dtype``)."""
        families = {
            "integer": "any integer width (int8..uint64)",
            "float": "float32 | float64",
            "bool": "bool",
            "string": "string | large_string",
            "binary": "binary | large_binary",
            "date": "date32 | date64",
            "datetime": "timestamp (any unit/tz)",
            "time": "time32 | time64",
            "duration": "duration (any unit)",
            "enum": "storage of the literal values (string/int) or dictionary",
            "list": "list | large_list of a valid item dtype",
            "struct": "struct of the nested model's fields",
            "null": "null",
            "any": "any dtype",
        }
        return {
            n: families.get(c.category, c.category)
            for n, c in cls._spec().columns.items()
        }

    @_ClassProperty
    def defaults(cls) -> dict[str, Any]:  # noqa: N805
        return {
            n: c.default for n, c in cls._spec().columns.items() if c.has_default
        }

    @_ClassProperty
    def non_nullable_columns(cls) -> set[str]:  # noqa: N805
        return cls._spec().non_nullable_columns

    @_ClassProperty
    def nullable_columns(cls) -> set[str]:  # noqa: N805
        return cls._spec().nullable_columns

    @_ClassProperty
    def unique_columns(cls) -> list[str]:  # noqa: N805
        return cls._spec().unique_columns

    @_ClassProperty
    def derived_columns(cls) -> list[str]:  # noqa: N805
        return [
            n for n, c in cls._spec().columns.items() if c.derived_from is not None
        ]

    @_ClassProperty
    def arrow_schema(cls) -> pa.Schema:  # noqa: N805
        return cls._spec().arrow_schema()

    # -- validation (delegates to the engine) ------------------------------

    @classmethod
    def validate(cls, data: Any, **kwargs: Any) -> Any:
        """Validate a table/dataset against this model; raise
        DataFrameValidationError on failure (reference semantics,
        ``pydantic.py:412-477``). Returns the input on success."""
        from patito_ray.validation.engine import validate as _validate

        return _validate(data, cls, **kwargs)

    @classmethod
    def validate_report(cls, data: Any, **kwargs: Any) -> Any:
        """Like validate() but always returns a ValidationReport."""
        from patito_ray.validation.engine import validate_report as _vr

        return _vr(data, cls, **kwargs)

    @classmethod
    def validate_schema(cls) -> None:
        """Eagerly compile the model, raising on unresolvable
        annotations / incompatible forced dtypes (reference
        ``pydantic.py:289-300``)."""
        cls._spec()

    @classmethod
    def frame(cls, data: Any) -> Any:
        """Attach this model to a table/Dataset — the reference's
        auto-generated ``Model.DataFrame`` entry point
        (``pydantic.py:59-91``)."""
        from patito_ray.frame import ModelFrame

        return ModelFrame(data, cls)

    @_ClassProperty
    def DataFrame(cls) -> type:  # noqa: N805, N802
        """Typed frame class bound to this model: ``Product.DataFrame(x)``
        mirrors the reference's auto-generated ``<Model>DataFrame``
        subclasses (``pydantic.py:59-91``). Cached per model class."""
        cached = cls.__dict__.get("_frame_class")
        if cached is not None:
            return cached
        from patito_ray.frame import ModelFrame

        model = cls

        class _BoundFrame(ModelFrame):
            def __init__(self, data: Any) -> None:
                super().__init__(data, model)

            @classmethod
            def read_csv(cls_, paths: Any, **kwargs: Any) -> "ModelFrame":
                """Model-driven csv ingest (reference
                ``Model.DataFrame.read_csv``, polars.py:879-960)."""
                from patito_ray.sources.readers import read_csv as _read_csv

                return _read_csv(paths, model, **kwargs)

            @classmethod
            def read_parquet(cls_, paths: Any, **kwargs: Any) -> "ModelFrame":
                """Model-projected parquet ingest (engine addition)."""
                from patito_ray.sources.readers import read_parquet as _read_pq

                return _read_pq(paths, model, **kwargs)

            @classmethod
            def read_json(cls_, paths: Any, **kwargs: Any) -> "ModelFrame":
                """Model-typed JSON-lines ingest (engine addition)."""
                from patito_ray.sources.readers import read_json as _read_json

                return _read_json(paths, model, **kwargs)

        _BoundFrame.__name__ = f"{cls.__name__}DataFrame"
        _BoundFrame.__qualname__ = _BoundFrame.__name__
        _BoundFrame.model = model
        cls._frame_class = _BoundFrame
        return _BoundFrame

    @_ClassProperty
    def LazyFrame(cls) -> type:  # noqa: N805, N802
        """Alias of ``DataFrame`` — every ModelFrame over a Dataset is
        already lazy (reference ``<Model>LazyFrame``)."""
        return cls.DataFrame

    @classmethod
    def pandas_examples(cls, data: Any = None, n: int | None = None) -> Any:
        """``examples()`` as a pandas DataFrame (reference
        ``pydantic.py:716-784``)."""
        return cls.examples(data, n).to_pandas()

    # -- row objects -------------------------------------------------------

    @classmethod
    def from_row(cls, row: dict[str, Any] | pa.Table) -> "Model":
        if isinstance(row, pa.Table):
            if row.num_rows != 1:
                raise ValueError(f"expected exactly 1 row, got {row.num_rows}")
            row = {k: v[0] for k, v in row.to_pydict().items()}
        return cls(**row)

    # -- example data (reference pydantic.py:498-884) ----------------------

    @classmethod
    def example_value(cls, field_name: str) -> Any:
        spec = cls._spec().columns[field_name]
        return _example_value(spec)

    @classmethod
    def example(cls, **overrides: Any) -> "Model":
        values = {n: cls.example_value(n) for n in cls.columns}
        values.update(overrides)
        return cls(**values)

    @classmethod
    def examples(
        cls,
        data: Any = None,
        n: int | None = None,
        columns: list[str] | None = None,
    ) -> pa.Table:
        """Build a valid table from partial data / dummy values.

        ``data`` accepts a dict of columns OR an iterable of rows
        (dicts, or sequences paired with ``columns=`` — reference
        ``pydantic.py:786-884``). Unique columns are filled with the
        running sequence 0,1,2,... (the reference uses ``cum_count``).
        For a distributed variant see ``patito_ray.generate.ray_examples``.
        """
        spec = cls._spec()
        if data is not None and not isinstance(data, dict):
            # iterable of rows: keep ROW identity — a dict row missing a
            # key marks that CELL missing (filled per-row below), it
            # must not collapse onto another row's value
            rows = list(data)
            normalized: list[dict[str, Any]] = []
            for row in rows:
                if isinstance(row, dict):
                    normalized.append(dict(row))
                else:
                    seq = list(row)
                    names = columns if columns is not None else cls.columns[: len(seq)]
                    if len(names) != len(seq):
                        raise ValueError(
                            f"row has {len(seq)} values but {len(names)} "
                            "columns were named"
                        )
                    normalized.append(dict(zip(names, seq)))
            keys: list[str] = []
            for row in normalized:
                for k in row:
                    if k not in keys:
                        keys.append(k)
            data = {
                k: [row.get(k, _MISSING) for row in normalized] for k in keys
            }
        data = dict(data or {})
        height = n
        for v in data.values():
            height = len(v)
            break
        if height is None:
            height = 1

        def _fill_cells(values: list[Any], colspec: ColumnSpec | None) -> list[Any]:
            if not any(v is _MISSING for v in values):
                return values
            if colspec is not None and colspec.unique:
                fill_seq = (
                    _unique_value(colspec, i) for i in range(2 * height + 1)
                )
                used = {v for v in values if v is not _MISSING}
                out = []
                for v in values:
                    if v is not _MISSING:
                        out.append(v)
                    else:
                        nxt = next(fill_seq)
                        while nxt in used:
                            nxt = next(fill_seq)
                        used.add(nxt)
                        out.append(nxt)
                return out
            fill = _example_value(colspec) if colspec is not None else None
            return [fill if v is _MISSING else v for v in values]

        arrays: dict[str, pa.Array] = {}
        for name, colspec in spec.columns.items():
            if name in data:
                arrays[name] = pa.array(
                    _fill_cells(list(data[name]), colspec), type=colspec.default_dtype
                )
            elif colspec.unique:
                seq = [_unique_value(colspec, i) for i in range(height)]
                arrays[name] = pa.array(seq, type=colspec.default_dtype)
            else:
                v = _example_value(colspec)
                arrays[name] = pa.array([v] * height, type=colspec.default_dtype)
        extra = set(data) - set(spec.columns)
        for name in sorted(extra):
            arrays[name] = pa.array(_fill_cells(list(data[name]), None))
        return pa.table(arrays)

    # -- schema algebra (reference pydantic.py:886-1163) --------------------

    @classmethod
    def _derive(cls, name: str, fields: dict[str, tuple[Any, Any]]) -> type["Model"]:
        ns: dict[str, Any] = {"__annotations__": {}}
        for fname, (annotation, default) in fields.items():
            ns["__annotations__"][fname] = annotation
            if default is not _MISSING:
                ns[fname] = default
        return type(name, (Model,), ns)

    @classmethod
    def _fields(cls) -> dict[str, tuple[Any, Any]]:
        hints = _class_hints(cls)
        out: dict[str, tuple[Any, Any]] = {}
        for fname, annotation in hints.items():
            if fname.startswith("_"):
                continue
            default = getattr(cls, fname, _MISSING)
            out[fname] = (annotation, default)
        return out

    @classmethod
    def select(cls, fields: str | list[str]) -> type["Model"]:
        if isinstance(fields, str):
            fields = [fields]
        all_fields = cls._fields()
        missing = set(fields) - set(all_fields)
        if missing:
            raise ValueError(
                f"The following fields do not exist: {', '.join(sorted(missing))}"
            )
        kept = {n: all_fields[n] for n in all_fields if n in fields}
        return cls._derive(cls.__name__, kept)

    @classmethod
    def drop(cls, name: str | list[str]) -> type["Model"]:
        names = [name] if isinstance(name, str) else name
        all_fields = cls._fields()
        kept = {n: v for n, v in all_fields.items() if n not in names}
        return cls._derive(cls.__name__, kept)

    @classmethod
    def rename(cls, mapping: dict[str, str]) -> type["Model"]:
        all_fields = cls._fields()
        missing = set(mapping) - set(all_fields)
        if missing:
            raise ValueError(
                f"The following fields do not exist: {', '.join(sorted(missing))}"
            )
        renamed = {mapping.get(n, n): v for n, v in all_fields.items()}
        return cls._derive(cls.__name__, renamed)

    @classmethod
    def prefix(cls, prefix: str) -> type["Model"]:
        return cls._derive(
            cls.__name__, {prefix + n: v for n, v in cls._fields().items()}
        )

    @classmethod
    def suffix(cls, suffix: str) -> type["Model"]:
        return cls._derive(
            cls.__name__, {n + suffix: v for n, v in cls._fields().items()}
        )

    @classmethod
    def with_fields(cls, **kwargs: Any) -> type["Model"]:
        fields = cls._fields()
        for fname, spec in kwargs.items():
            if isinstance(spec, tuple):
                fields[fname] = spec
            else:
                fields[fname] = (spec, _MISSING)
        return cls._derive(cls.__name__, fields)

    @classmethod
    def join(cls, other: type["Model"], how: str = "inner") -> type["Model"]:
        """Schema typing for join results (reference ``pydantic.py:886-953``):
        left/asof make the right side Optional, outer makes both
        Optional, semi/anti return the left model unchanged."""
        if how in ("semi", "anti"):
            return cls
        left = cls._fields()
        right = other._fields()

        def optionalize(fields: dict[str, tuple[Any, Any]]) -> dict[str, tuple[Any, Any]]:
            out = {}
            for n, (ann, default) in fields.items():
                from typing import Optional

                out[n] = (Optional[ann], None if default is _MISSING else default)
            return out

        if how in ("left", "asof"):
            right = optionalize(right)
        elif how in ("outer", "full"):
            left = optionalize(left)
            right = optionalize(right)
        merged = dict(left)
        for n, v in right.items():
            merged.setdefault(n, v)
        return cls._derive(f"{cls.__name__}{other.__name__}", merged)


def _unique_value(spec: ColumnSpec, i: int) -> Any:
    """The i-th value of a type-appropriate unique sequence (the
    reference's cum_count semantics generalized beyond integers)."""
    cat = spec.category
    if cat == _dt.INTEGER:
        return i
    if cat == _dt.FLOAT:
        return float(i)
    if cat in (_dt.STRING, _dt.ANY):
        return f"dummy_{i}"
    if cat == _dt.BINARY:
        return i.to_bytes(8, "big")
    if cat == _dt.DATE:
        return datetime.date(1970, 1, 1) + datetime.timedelta(days=i)
    if cat == _dt.DATETIME:
        tz = getattr(spec.default_dtype, "tz", None)
        base = (
            datetime.datetime(1970, 1, 1, tzinfo=datetime.timezone.utc)
            if tz
            else datetime.datetime(1970, 1, 1)
        )
        return base + datetime.timedelta(seconds=i)
    if cat == _dt.DURATION:
        return datetime.timedelta(seconds=i)
    raise TypeError(
        f"cannot generate a unique example sequence for category {cat!r}; "
        "provide the column's values explicitly"
    )


def _example_value(spec: ColumnSpec) -> Any:
    """A single dummy value satisfying the column's constraints
    (reference ``pydantic.py:498-662``)."""
    if spec.has_default and spec.default is not None:
        return spec.default
    if spec.nullable:
        return None
    b = spec.bounds
    if "const" in b:
        return b["const"]
    if spec.enum_values:
        return spec.enum_values[0]
    cat = spec.category
    if cat == _dt.INTEGER:
        lo = b.get("minimum", b.get("exclusiveMinimum", -1) + 1 if "exclusiveMinimum" in b else None)
        hi = b.get("maximum", b.get("exclusiveMaximum", 1) - 1 if "exclusiveMaximum" in b else None)
        v = lo if lo is not None else (hi if hi is not None else 0)
        t = spec.default_dtype
        if t is not None and pa.types.is_unsigned_integer(t):
            v = max(0, v)
        if "multipleOf" in b:
            m = b["multipleOf"]
            # smallest multiple >= v, but never past an upper bound —
            # prefer the largest multiple <= hi when rounding up busts it
            v = ((v + m - 1) // m) * m if v else 0
            if hi is not None and v > hi:
                v = (hi // m) * m
        return int(v)
    if cat == _dt.FLOAT:
        lo = b.get("minimum", b.get("exclusiveMinimum"))
        hi = b.get("maximum", b.get("exclusiveMaximum"))
        if lo is not None and hi is not None:
            # midpoint satisfies both bounds whether inclusive or not
            return (float(lo) + float(hi)) / 2
        if "minimum" in b:
            return float(b["minimum"])
        if "exclusiveMinimum" in b:
            return float(b["exclusiveMinimum"]) + 1.0
        if "maximum" in b:
            return float(b["maximum"])
        if "exclusiveMaximum" in b:
            return float(b["exclusiveMaximum"]) - 1.0
        if "multipleOf" in b:
            return float(b["multipleOf"])
        return 0.5
    if cat == _dt.DECIMAL:
        import decimal as _decimal

        t = spec.default_dtype
        scale = getattr(t, "scale", 0) or 0
        quantum = _decimal.Decimal(1).scaleb(-scale)
        lo = b.get("minimum", b.get("exclusiveMinimum"))
        hi = b.get("maximum", b.get("exclusiveMaximum"))
        v = _decimal.Decimal(0)
        if lo is not None:
            # quantize TOWARD the feasible side: a minimum off the
            # scale grid (ge=0.005 at scale 2) must round UP, or the
            # example violates the model's own bound
            v = _decimal.Decimal(str(lo)).quantize(
                quantum, rounding=_decimal.ROUND_CEILING
            )
            if "exclusiveMinimum" in b and "minimum" not in b and v <= _decimal.Decimal(str(lo)):
                v += quantum
        elif hi is not None:
            v = _decimal.Decimal(str(hi)).quantize(
                quantum, rounding=_decimal.ROUND_FLOOR
            )
            if "exclusiveMaximum" in b and "maximum" not in b and v >= _decimal.Decimal(str(hi)):
                v -= quantum
        return v.quantize(quantum)
    if cat == _dt.BOOL:
        return False
    if cat == _dt.STRING or cat == _dt.ANY:
        if "pattern" in b:
            raise NotImplementedError(
                "example generation for regex-constrained fields is unsupported"
            )
        n = b.get("minLength", b.get("maxLength", 5))
        base = "dummy_string"
        if len(base) < n:
            base = base + "x" * (n - len(base))
        return base[:n] if "maxLength" in b or "minLength" in b else base
    if cat == _dt.BINARY:
        return b"\x00"
    if cat == _dt.DATE:
        return datetime.date(1970, 1, 1)
    if cat == _dt.DATETIME:
        t = spec.default_dtype
        tz = getattr(t, "tz", None)
        if tz:
            return datetime.datetime(1970, 1, 1, tzinfo=datetime.timezone.utc)
        return datetime.datetime(1970, 1, 1)
    if cat == _dt.TIME:
        return datetime.time(0, 0)
    if cat == _dt.DURATION:
        return datetime.timedelta(0)
    if cat == _dt.NULL:
        return None
    if cat == _dt.LIST:
        return []
    if cat == _dt.STRUCT:
        assert spec.nested is not None
        return {
            n: _example_value(c) for n, c in spec.nested.columns.items()
        }
    raise NotImplementedError(f"no example strategy for category {cat}")


def model_from_schema(
    schema: pa.Schema, name: str = "DynamicModel"
) -> type[Model]:
    """Derive a Model class from an Arrow schema (the reference's
    ``_pydantic_model`` dynamic-model utility, polars.py:855-873 —
    but typed from the physical schema instead of ``Any``)."""
    import datetime as _datetime
    from typing import Optional

    def annotation_for(t: pa.DataType) -> Any:
        if pa.types.is_integer(t):
            return int
        if pa.types.is_floating(t):
            return float
        if pa.types.is_boolean(t):
            return bool
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            return str
        if pa.types.is_binary(t) or pa.types.is_large_binary(t):
            return bytes
        if pa.types.is_timestamp(t):
            return _datetime.datetime
        if pa.types.is_date(t):
            return _datetime.date
        if pa.types.is_time(t):
            return _datetime.time
        if pa.types.is_duration(t):
            return _datetime.timedelta
        if pa.types.is_list(t) or pa.types.is_large_list(t):
            return list[annotation_for(t.value_type)]  # type: ignore[misc]
        raise TypeError(f"cannot infer annotation for arrow type {t}")

    ns: dict[str, Any] = {"__annotations__": {}}
    for field in schema:
        ann = annotation_for(field.type)
        if field.nullable:
            ns["__annotations__"][field.name] = Optional[ann]
            ns[field.name] = None
        else:
            ns["__annotations__"][field.name] = ann
    model = type(name, (Model,), ns)
    # pin forced dtypes so non-default widths (int32, tz timestamps)
    # survive the round trip
    for field in schema:
        spec = model._spec().columns[field.name]
        if spec.default_dtype != field.type:
            spec.default_dtype = field.type
            spec.dtype_forced = True
    return model


def get_row(table: pa.Table, mask: Any, model: type[Model] | None = None) -> Any:
    """Filter to exactly one row -> model instance / dict.

    Mirrors ``DataFrame.get`` (reference polars.py:710-790):
    RowDoesNotExist / MultipleRowsReturned on 0 / >1 matches.
    """
    filtered = table.filter(mask) if mask is not None else table
    name = model.__name__ if model else "table"
    if filtered.num_rows == 0:
        raise RowDoesNotExist(f"{name} query returned 0 rows")
    if filtered.num_rows > 1:
        raise MultipleRowsReturned(
            f"{name} query returned {filtered.num_rows} rows"
        )
    row = {k: v[0] for k, v in filtered.to_pydict().items()}
    return model(**row) if model else row
