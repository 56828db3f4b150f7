"""JSON (de)serialization of compiled specs.

Parity with the reference's JSON-serializable ``ColumnInfo``
(/root/reference/src/patito/_pydantic/column_info.py:131-149, round-trip
tested at tests/test_validators.py:1179-1219): the compiled constraint
IR can cross process boundaries as plain JSON. Here the whole
``TableSpec`` round-trips — used by checkpoint lineage manifests to
record exactly which schema+constraints a shard was validated against.

Expression nodes are already JSON dicts (patito_ray.exprs); Arrow types
get a small recursive codec. Bound values that are not JSON-native
(dates, datetimes) serialize as tagged ISO strings.
"""

from __future__ import annotations

import datetime
import decimal
import json
from typing import Any

import pyarrow as pa

from patito_ray.dtypes import ResolvedType
from patito_ray.fields import ColumnSpec, TableSpec

_SIMPLE_TYPES: dict[str, pa.DataType] = {
    "int8": pa.int8(),
    "int16": pa.int16(),
    "int32": pa.int32(),
    "int64": pa.int64(),
    "uint8": pa.uint8(),
    "uint16": pa.uint16(),
    "uint32": pa.uint32(),
    "uint64": pa.uint64(),
    "float32": pa.float32(),
    "float64": pa.float64(),
    "bool": pa.bool_(),
    "string": pa.string(),
    "large_string": pa.large_string(),
    "binary": pa.binary(),
    "large_binary": pa.large_binary(),
    "date32": pa.date32(),
    "date64": pa.date64(),
    "null": pa.null(),
}
_SIMPLE_NAMES = {v: k for k, v in _SIMPLE_TYPES.items()}


def dtype_to_json(t: pa.DataType | None) -> Any:
    if t is None:
        return None
    if t in _SIMPLE_NAMES:
        return _SIMPLE_NAMES[t]
    if pa.types.is_timestamp(t):
        return {"kind": "timestamp", "unit": t.unit, "tz": t.tz}
    if pa.types.is_time64(t):
        return {"kind": "time64", "unit": t.unit}
    if pa.types.is_time32(t):
        return {"kind": "time32", "unit": t.unit}
    if pa.types.is_duration(t):
        return {"kind": "duration", "unit": t.unit}
    if pa.types.is_decimal128(t):
        return {"kind": "decimal128", "precision": t.precision, "scale": t.scale}
    if pa.types.is_decimal256(t):
        return {"kind": "decimal256", "precision": t.precision, "scale": t.scale}
    if pa.types.is_list(t):
        return {"kind": "list", "item": dtype_to_json(t.value_type)}
    if pa.types.is_large_list(t):
        return {"kind": "large_list", "item": dtype_to_json(t.value_type)}
    if pa.types.is_struct(t):
        return {
            "kind": "struct",
            "fields": [
                {
                    "name": t.field(i).name,
                    "type": dtype_to_json(t.field(i).type),
                    "nullable": t.field(i).nullable,
                }
                for i in range(t.num_fields)
            ],
        }
    if pa.types.is_dictionary(t):
        return {
            "kind": "dictionary",
            "index": dtype_to_json(t.index_type),
            "value": dtype_to_json(t.value_type),
        }
    raise TypeError(f"no JSON codec for arrow type {t}")


def dtype_from_json(d: Any) -> pa.DataType | None:
    if d is None:
        return None
    if isinstance(d, str):
        return _SIMPLE_TYPES[d]
    kind = d["kind"]
    if kind == "timestamp":
        return pa.timestamp(d["unit"], tz=d["tz"])
    if kind == "time64":
        return pa.time64(d["unit"])
    if kind == "time32":
        return pa.time32(d["unit"])
    if kind == "duration":
        return pa.duration(d["unit"])
    if kind == "decimal128":
        return pa.decimal128(d["precision"], d["scale"])
    if kind == "decimal256":
        return pa.decimal256(d["precision"], d["scale"])
    if kind == "list":
        return pa.list_(dtype_from_json(d["item"]))
    if kind == "large_list":
        return pa.large_list(dtype_from_json(d["item"]))
    if kind == "struct":
        return pa.struct(
            [
                pa.field(f["name"], dtype_from_json(f["type"]), nullable=f["nullable"])
                for f in d["fields"]
            ]
        )
    if kind == "dictionary":
        return pa.dictionary(dtype_from_json(d["index"]), dtype_from_json(d["value"]))
    raise TypeError(f"unknown dtype kind {kind}")


def _value_to_json(v: Any) -> Any:
    if isinstance(v, datetime.datetime):
        return {"$dt": v.isoformat()}
    if isinstance(v, datetime.date):
        return {"$d": v.isoformat()}
    if isinstance(v, datetime.time):
        return {"$t": v.isoformat()}
    if isinstance(v, datetime.timedelta):
        return {"$td": v.total_seconds()}
    if isinstance(v, bytes):
        import base64

        return {"$b": base64.b64encode(v).decode()}
    if isinstance(v, decimal.Decimal):
        return {"$dec": str(v)}
    return v


def _value_from_json(v: Any) -> Any:
    if isinstance(v, dict):
        if "$dt" in v:
            return datetime.datetime.fromisoformat(v["$dt"])
        if "$d" in v:
            return datetime.date.fromisoformat(v["$d"])
        if "$t" in v:
            return datetime.time.fromisoformat(v["$t"])
        if "$td" in v:
            return datetime.timedelta(seconds=v["$td"])
        if "$b" in v:
            import base64

            return base64.b64decode(v["$b"])
        if "$dec" in v:
            return decimal.Decimal(v["$dec"])
    return v


def column_spec_to_json(cs: ColumnSpec) -> dict[str, Any]:
    return {
        "name": cs.name,
        "category": cs.category,
        "dtype": dtype_to_json(cs.default_dtype),
        "nullable": cs.nullable,
        "dtype_forced": cs.dtype_forced,
        "has_default": cs.has_default,
        "default": _value_to_json(cs.default),
        "unique": cs.unique,
        "allow_missing": cs.allow_missing,
        "enum_values": cs.enum_values,
        "bounds": {k: _value_to_json(v) for k, v in cs.bounds.items()},
        "constraints": cs.constraints,
        "derived_from": cs.derived_from,
        # a TUPLE alias is an AliasPath (element extraction) while a
        # LIST alias is AliasChoices (coalesce): tag tuples so the
        # round trip cannot silently turn extraction into coalescing
        "alias": (
            {"$path": list(cs.alias)} if isinstance(cs.alias, tuple) else cs.alias
        ),
        "item_nullable": cs.item_nullable,
        "nested": spec_to_json_dict(cs.nested) if cs.nested else None,
    }


def column_spec_from_json(d: dict[str, Any]) -> ColumnSpec:
    return ColumnSpec(
        name=d["name"],
        category=d["category"],
        default_dtype=dtype_from_json(d["dtype"]),
        nullable=d["nullable"],
        dtype_forced=d["dtype_forced"],
        has_default=d["has_default"],
        default=_value_from_json(d["default"]),
        unique=d["unique"],
        allow_missing=d["allow_missing"],
        enum_values=d["enum_values"],
        bounds={k: _value_from_json(v) for k, v in d["bounds"].items()},
        constraints=d["constraints"],
        derived_from=d["derived_from"],
        alias=(
            tuple(d["alias"]["$path"])
            if isinstance(d["alias"], dict) and "$path" in d["alias"]
            else d["alias"]
        ),
        item_nullable=d["item_nullable"],
        nested=spec_from_json_dict(d["nested"]) if d["nested"] else None,
        resolved=None,  # rebuilt lazily below
    )


def spec_to_json_dict(spec: TableSpec) -> dict[str, Any]:
    return {
        "model_name": spec.model_name,
        "allow_extra": spec.allow_extra,
        # a callable cannot serialize; RECORD that one existed so a
        # round trip refuses loudly instead of silently validating
        # without the V1 alias rename
        "has_alias_generator": spec.alias_generator is not None,
        "columns": [column_spec_to_json(c) for c in spec.columns.values()],
        "unique_together": [list(g) for g in spec.unique_together],
    }


def spec_from_json_dict(d: dict[str, Any]) -> TableSpec:
    if d.get("has_alias_generator"):
        raise ValueError(
            "spec was compiled with an alias_generator (a Python "
            "callable) which cannot round-trip through JSON; deploy the "
            "model class itself, or rename columns before validation"
        )
    cols = {}
    for cd in d["columns"]:
        cs = column_spec_from_json(cd)
        # minimal ResolvedType so dtype checks keep working after a
        # round trip (category + enum metadata carry the semantics)
        cs.resolved = ResolvedType(
            category=cs.category,
            default=cs.default_dtype,
            nullable=cs.nullable,
            enum_values=cs.enum_values,
        )
        if cs.category == "list" and cs.default_dtype is not None:
            cs.resolved.item = ResolvedType(
                category="any", default=cs.default_dtype.value_type
            )
        cols[cs.name] = cs
    return TableSpec(
        model_name=d["model_name"],
        columns=cols,
        allow_extra=d["allow_extra"],
        unique_together=[tuple(g) for g in d.get("unique_together", [])],
    )


def spec_to_json(spec: TableSpec) -> str:
    return json.dumps(spec_to_json_dict(spec), sort_keys=True)


def spec_from_json(s: str) -> TableSpec:
    return spec_from_json_dict(json.loads(s))
