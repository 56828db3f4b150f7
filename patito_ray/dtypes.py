"""Annotation -> Arrow dtype resolution.

Mirrors the reference's ``DtypeResolver`` semantics
(/root/reference/src/patito/_pydantic/dtypes/dtypes.py:115-260 and
``utils.py:120-231``): each python annotation resolves to a *default*
storage dtype plus a *set* of valid physical dtypes; ``Optional[...]``
marks nullability; ``Literal`` / ``Enum`` produce allowed-value sets;
``list[...]`` and nested models recurse. Re-expressed over pyarrow
types (the engine's physical layer is Arrow, not polars). Additions
beyond the reference: ``bytes -> binary`` (needed for the web-page
``html`` column per BASELINE.json input_hint — the reference has no
binary type).
"""

from __future__ import annotations

import datetime
import decimal
import enum
from dataclasses import dataclass, field as dc_field
from typing import Any, Literal, Union, get_args, get_origin

import pyarrow as pa

# Categories used for "valid dtype" membership checks.
INTEGER = "integer"
FLOAT = "float"
DECIMAL = "decimal"
BOOL = "bool"
STRING = "string"
BINARY = "binary"
DATE = "date"
DATETIME = "datetime"
TIME = "time"
DURATION = "duration"
ENUM = "enum"
NULL = "null"
LIST = "list"
STRUCT = "struct"
ANY = "any"


@dataclass
class ResolvedType:
    """Outcome of resolving one annotation."""

    category: str
    default: pa.DataType | None
    nullable: bool = False
    enum_values: list[Any] | None = None
    # list columns
    item: "ResolvedType | None" = None
    # struct columns: a patito_ray Model subclass
    nested_model: Any = None
    # union without a single default (requires Field(dtype=...))
    union_members: list["ResolvedType"] = dc_field(default_factory=list)


def is_optional(annotation: Any) -> bool:
    if get_origin(annotation) is Union:
        return type(None) in get_args(annotation)
    return False


def unwrap_optional(annotation: Any) -> Any:
    args = [a for a in get_args(annotation) if a is not type(None)]
    if len(args) == 1:
        return args[0]
    return Union[tuple(args)]  # type: ignore[return-value]


def resolve_annotation(annotation: Any) -> ResolvedType:
    """Resolve a field annotation to its Arrow representation."""
    from patito_ray.model import Model  # local import to avoid cycle

    nullable = False
    if is_optional(annotation):
        nullable = True
        annotation = unwrap_optional(annotation)

    origin = get_origin(annotation)

    if annotation is None or annotation is type(None):
        return ResolvedType(NULL, pa.null(), nullable=True)
    if annotation is Any:
        return ResolvedType(ANY, pa.string(), nullable=nullable)
    if origin is Literal:
        values = list(get_args(annotation))
        return _enum_resolved(values, nullable)
    if isinstance(annotation, type) and issubclass(annotation, enum.Enum):
        values = [member.value for member in annotation]
        return _enum_resolved(values, nullable)
    if origin in (list, tuple) or annotation in (list, tuple):
        if not get_args(annotation):
            raise TypeError(
                f"unparameterized {annotation!r} has no item type; "
                "use list[T]"
            )
        (item_ann,) = get_args(annotation)[:1]
        item = resolve_annotation(item_ann)
        if item.default is None:
            raise TypeError(f"cannot resolve list item annotation {item_ann!r}")
        return ResolvedType(
            LIST, pa.list_(item.default), nullable=nullable, item=item
        )
    if isinstance(annotation, type) and issubclass(annotation, Model):
        struct_type = pa.struct(
            [
                pa.field(name, cs.default_dtype, nullable=cs.nullable)
                for name, cs in annotation._spec().columns.items()
            ]
        )
        return ResolvedType(
            STRUCT, struct_type, nullable=nullable, nested_model=annotation
        )
    if origin is Union:
        members = [resolve_annotation(a) for a in get_args(annotation)]
        cats = {m.category for m in members}
        if len(cats) == 1:
            import dataclasses

            # COPY the head member before attaching union_members:
            # members[0] must stay member-shaped (no self-reference) for
            # the valid_dtype recursion over the member list
            one = dataclasses.replace(members[0], nullable=nullable)
            if len(members) > 1:
                # keep every member's validity set: Union[list[int],
                # list[str]] must accept BOTH physical list types, not
                # silently collapse onto the first member's
                one.union_members = members
            return one
        return ResolvedType(
            ANY, None, nullable=nullable, union_members=members
        )
    if annotation is int:
        return ResolvedType(INTEGER, pa.int64(), nullable=nullable)
    if annotation is float:
        return ResolvedType(FLOAT, pa.float64(), nullable=nullable)
    if annotation is bool:
        return ResolvedType(BOOL, pa.bool_(), nullable=nullable)
    if annotation is str:
        return ResolvedType(STRING, pa.string(), nullable=nullable)
    if annotation is bytes:
        return ResolvedType(BINARY, pa.binary(), nullable=nullable)
    if annotation is decimal.Decimal:
        # beyond-reference (the reference RAISES on pl.Decimal —
        # _pydantic/dtypes/dtypes.py:245-248 TODO): exact fixed-point
        # money columns. No default precision/scale is assumed — the
        # model must pin the physical layout with Field(dtype=
        # pa.decimal128(p, s)), caught by the existing no-default-dtype
        # compile error otherwise.
        return ResolvedType(DECIMAL, None, nullable=nullable)
    if annotation is datetime.datetime:
        return ResolvedType(DATETIME, pa.timestamp("us"), nullable=nullable)
    if annotation is datetime.date:
        return ResolvedType(DATE, pa.date32(), nullable=nullable)
    if annotation is datetime.time:
        return ResolvedType(TIME, pa.time64("us"), nullable=nullable)
    if annotation is datetime.timedelta:
        return ResolvedType(DURATION, pa.duration("us"), nullable=nullable)
    raise TypeError(f"unsupported annotation {annotation!r}")


def _enum_resolved(values: list[Any], nullable: bool) -> ResolvedType:
    kinds = {type(v) for v in values}
    if kinds == {bool}:
        # Literal[True, False] / bool-valued enums: a plain bool column
        # (note: bool is a subclass of int, so check it FIRST)
        return ResolvedType(BOOL, pa.bool_(), nullable=nullable)
    if kinds == {str}:
        default = pa.string()
    elif kinds <= {int}:
        default = pa.int64()
    elif kinds <= {int, float}:
        default = pa.float64()
    else:
        raise TypeError(f"mixed-type enums are not supported: {values!r}")
    return ResolvedType(ENUM, default, nullable=nullable, enum_values=values)


def valid_dtype(category: str, resolved: ResolvedType, actual: pa.DataType) -> bool:
    """Is ``actual`` an acceptable physical dtype for a column of this
    resolved annotation? Mirrors the reference's valid-dtype groups
    (``utils.py:151-211``): int accepts every integer width, float only
    float32/64, enum accepts dictionary-encoded or plain storage, etc.
    """
    t = pa.types
    if resolved.union_members and category != ANY:
        # same-category union (e.g. Union[list[int], list[str]]): a
        # physical dtype valid for ANY member is acceptable
        return any(
            valid_dtype(m.category, m, actual) for m in resolved.union_members
        )
    if category == INTEGER:
        return t.is_integer(actual)
    if category == FLOAT:
        return t.is_floating(actual) and not t.is_float16(actual)
    if category == DECIMAL:
        return t.is_decimal(actual)
    if category == BOOL:
        return t.is_boolean(actual)
    if category == STRING:
        return t.is_string(actual) or t.is_large_string(actual)
    if category == BINARY:
        return t.is_binary(actual) or t.is_large_binary(actual)
    if category == DATE:
        return t.is_date(actual)
    if category == DATETIME:
        return t.is_timestamp(actual)
    if category == TIME:
        return t.is_time(actual)
    if category == DURATION:
        return t.is_duration(actual)
    if category == NULL:
        return t.is_null(actual)
    if category == ENUM:
        if t.is_dictionary(actual):
            actual = actual.value_type
        assert resolved.enum_values is not None
        if isinstance(resolved.enum_values[0], str):
            return t.is_string(actual) or t.is_large_string(actual)
        return t.is_integer(actual) or t.is_floating(actual)
    if category == LIST:
        if not (t.is_list(actual) or t.is_large_list(actual)):
            return False
        assert resolved.item is not None
        return valid_dtype(resolved.item.category, resolved.item, actual.value_type)
    if category == STRUCT:
        return t.is_struct(actual)
    if category == ANY:
        if resolved.union_members:
            return any(
                valid_dtype(m.category, m, actual) for m in resolved.union_members
            )
        return True
    raise ValueError(f"unknown category {category}")
