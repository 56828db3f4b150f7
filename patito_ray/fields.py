"""Field() metadata and the compiled, picklable column/table spec.

The reference packs patito-specific kwargs into a JSON-serializable
``ColumnInfo`` (/root/reference/src/patito/_pydantic/column_info.py:83-149)
and merges pydantic's JSON-schema keys (gt/ge/lt/le/pattern/...) at
validation time (``validators.py:331-357``). Here the compile step is
explicit: ``Model`` + ``Field(...)`` -> ``TableSpec`` (one
``ColumnSpec`` per column) which is the *only* thing shipped to Ray
workers — plain dataclasses holding Arrow types and expression-IR
dicts, picklable and JSON-able.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Any

import pyarrow as pa

from patito_ray.dtypes import ResolvedType
from patito_ray.exprs import Expr

_MISSING = object()


class FieldInfo:
    """Raw Field(...) kwargs captured at class-definition time."""

    __slots__ = (
        "default",
        "dtype",
        "unique",
        "constraints",
        "derived_from",
        "allow_missing",
        "bounds",
        "alias",
    )

    def __init__(
        self,
        default: Any = _MISSING,
        *,
        dtype: pa.DataType | None = None,
        unique: bool = False,
        constraints: Expr | list[Expr] | None = None,
        derived_from: str | Expr | None = None,
        allow_missing: bool = False,
        alias: str | list[str] | None = None,
        gt: Any = None,
        ge: Any = None,
        lt: Any = None,
        le: Any = None,
        multiple_of: Any = None,
        const: Any = None,
        pattern: str | None = None,
        min_length: int | None = None,
        max_length: int | None = None,
    ) -> None:
        self.default = default
        self.dtype = dtype
        self.unique = unique
        self.constraints = constraints
        self.derived_from = derived_from
        self.allow_missing = allow_missing
        self.alias = alias
        # JSON-schema-style bound keys, named as in the reference's
        # filter table (validators.py:333-343).
        bounds: dict[str, Any] = {}
        if le is not None:
            bounds["maximum"] = le
        if lt is not None:
            bounds["exclusiveMaximum"] = lt
        if ge is not None:
            bounds["minimum"] = ge
        if gt is not None:
            bounds["exclusiveMinimum"] = gt
        if multiple_of is not None:
            bounds["multipleOf"] = multiple_of
        if const is not None:
            bounds["const"] = const
        if pattern is not None:
            bounds["pattern"] = pattern
        if min_length is not None:
            bounds["minLength"] = min_length
        if max_length is not None:
            bounds["maxLength"] = max_length
        self.bounds = bounds


def Field(default: Any = _MISSING, **kwargs: Any) -> FieldInfo:
    """Declare constraint metadata on a model field.

    Mirrors the reference's ``patito.Field`` surface
    (/root/reference/src/patito/pydantic.py:1249-1345): ``dtype=``
    (an Arrow type here), ``unique=``, ``constraints=`` (Expr or list),
    ``derived_from=`` (column name or Expr), ``allow_missing=``, plus
    bound kwargs ``gt/ge/lt/le/multiple_of/const/pattern/min_length/
    max_length`` and ``alias=`` (str, or list of candidate source
    columns — coalesce order, like pydantic AliasChoices).
    """
    return FieldInfo(default, **kwargs)


@dataclass
class ColumnSpec:
    """Everything validation/cleansing needs to know about one column."""

    name: str
    category: str
    default_dtype: pa.DataType | None
    nullable: bool
    dtype_forced: bool = False
    has_default: bool = False
    default: Any = None
    unique: bool = False
    allow_missing: bool = False
    enum_values: list[Any] | None = None
    bounds: dict[str, Any] = dc_field(default_factory=dict)
    constraints: list[dict[str, Any]] = dc_field(default_factory=list)
    derived_from: dict[str, Any] | str | None = None
    alias: str | list[str] | None = None
    # list columns: is the *inner* item nullable (list[Optional[T]])?
    item_nullable: bool | None = None
    # nested struct model spec (struct or list-of-struct columns)
    nested: "TableSpec | None" = None
    # full resolved type for valid-dtype checks
    resolved: ResolvedType | None = None

    @property
    def is_struct(self) -> bool:
        return self.nested is not None and self.category == "struct"

    @property
    def is_list_of_struct(self) -> bool:
        return self.nested is not None and self.category == "list"


@dataclass
class TableSpec:
    """Compiled, picklable schema of one logical table."""

    model_name: str
    columns: dict[str, ColumnSpec]
    alias_generator: Any = None  # callable str -> str, applied to data columns
    allow_extra: bool = False
    # composite uniqueness groups (model_config["unique_together"]):
    # each tuple of column names must be row-wise unique as a whole
    # (e.g. url unique per crawl snapshot). Rides the same bucketed
    # blob exchange as single-column uniqueness via a row hash.
    unique_together: list[tuple[str, ...]] = dc_field(default_factory=list)

    @property
    def column_names(self) -> list[str]:
        return list(self.columns)

    @property
    def non_nullable_columns(self) -> set[str]:
        return {n for n, c in self.columns.items() if not c.nullable}

    @property
    def nullable_columns(self) -> set[str]:
        return {n for n, c in self.columns.items() if c.nullable}

    @property
    def unique_columns(self) -> list[str]:
        return [n for n, c in self.columns.items() if c.unique]

    def unique_keys(self) -> list[tuple[str, tuple[str, ...]]]:
        """Every uniqueness constraint as ``(label, columns)`` — single
        unique columns (label == column name) plus composite
        ``unique_together`` groups (label ``'a+b'``, also used as the
        error loc and the checkpoint directory suffix)."""
        out: list[tuple[str, tuple[str, ...]]] = [
            (n, (n,)) for n in self.unique_columns
        ]
        out.extend(("+".join(g), tuple(g)) for g in self.unique_together)
        return out

    def arrow_schema(self) -> pa.Schema:
        return pa.schema(
            [
                pa.field(n, c.default_dtype, nullable=c.nullable)
                for n, c in self.columns.items()
                if c.default_dtype is not None
            ]
        )


def _field_repr(fi: "FieldInfo") -> str:
    """``Field(dtype=int64, unique=True, gt=0)`` — only the kwargs the
    user actually set (reference models pretty-print their fields via
    the pydantic repr mixin; this is the Arrow-native analogue)."""
    parts: list[str] = []
    if fi.default is not _MISSING:
        parts.append(f"default={fi.default!r}")
    if fi.dtype is not None:
        parts.append(f"dtype={fi.dtype}")
    if fi.unique:
        parts.append("unique=True")
    if fi.allow_missing:
        parts.append("allow_missing=True")
    if fi.alias is not None:
        parts.append(f"alias={fi.alias!r}")
    for name, value in (fi.bounds or {}).items():
        parts.append(f"{name}={value!r}")
    if fi.constraints is not None:
        cs = fi.constraints if isinstance(fi.constraints, list) else [fi.constraints]
        parts.append(f"constraints=[{', '.join(map(repr, cs))}]")
    if fi.derived_from is not None:
        parts.append(f"derived_from={fi.derived_from!r}")
    return f"Field({', '.join(parts)})"


FieldInfo.__repr__ = _field_repr  # type: ignore[method-assign]
