"""Constraint inference: scaffold a Model (data contract) FROM data.

The first step of putting a 100-TB corpus under validation is writing
the contract — and nobody knows the real bounds/enums/nullability of a
crawl by heart. ``infer_model`` profiles the dataset in ONE streaming
pass (per-batch mergeable profiles: null counts, min/max, a bounded
distinct-value set, an HLL distinct estimate) and emits a Model class
whose constraints the profiled data provably satisfies:

- nullable (Optional + default None) iff nulls were observed,
- ge/le = observed min/max for numeric columns,
- min_length/max_length for strings,
- a Literal enum when the untruncated distinct set is small,
- uniqueness is only REPORTED (``info["unique_candidates"]``, from the
  HLL estimate) — never asserted, because a sketch cannot prove it.

The inferred model is a STARTING contract: the observed extremes are
what this corpus looked like, not business rules. Validating the same
data with the inferred model always passes (pytested)."""

from __future__ import annotations

import pickle
from typing import Any, Literal, Optional

import pyarrow as pa
import pyarrow.compute as pc

from patito_ray.state.sketches import HyperLogLog, hash64

ENUM_CAP = 64  # distinct values tracked exactly before truncation


def _profile_batch(t: pa.Table, enum_cap: int) -> dict[str, dict[str, Any]]:
    prof: dict[str, dict[str, Any]] = {}
    for name in t.column_names:
        col = t.column(name)
        entry: dict[str, Any] = {
            "n": len(col),
            "nulls": col.null_count,
            "min": None,
            "max": None,
            "min_len": None,
            "max_len": None,
            "vals": set(),
            "truncated": False,
            "hll": HyperLogLog(),
        }
        typ = col.type
        valid = col.drop_null()
        if len(valid):
            if (
                pa.types.is_integer(typ)
                or pa.types.is_floating(typ)
                or pa.types.is_temporal(typ)
                or pa.types.is_boolean(typ)
            ):
                mm = pc.min_max(valid)
                entry["min"] = mm["min"].as_py()
                entry["max"] = mm["max"].as_py()
            if pa.types.is_string(typ) or pa.types.is_large_string(typ):
                lens = pc.utf8_length(valid)
                mm = pc.min_max(lens)
                entry["min_len"] = mm["min"].as_py()
                entry["max_len"] = mm["max"].as_py()
            if (
                pa.types.is_integer(typ)
                or pa.types.is_string(typ)
                or pa.types.is_large_string(typ)
                or pa.types.is_boolean(typ)
            ):
                # bounded exact distinct set (enum candidates) + HLL
                uniq = valid.unique()
                if len(uniq) <= enum_cap:
                    entry["vals"] = set(uniq.to_pylist())
                else:
                    # keep the repr-SMALLEST values: an arbitrary slice
                    # depends on batch composition and breaks merge
                    # associativity (same rule as Partial.enum_invalid)
                    entry["truncated"] = True
                    entry["vals"] = set(
                        sorted(uniq.to_pylist(), key=repr)[:enum_cap]
                    )
                entry["hll"].add_hashes(hash64(uniq))
        prof[name] = entry
    return prof


def _merge(a: dict[str, dict[str, Any]], b: dict[str, dict[str, Any]]) -> dict:
    for name, eb in b.items():
        ea = a.setdefault(name, eb)
        if ea is eb:
            continue
        ea["n"] += eb["n"]
        ea["nulls"] += eb["nulls"]
        for k, pick in (("min", min), ("max", max), ("min_len", min), ("max_len", max)):
            if eb[k] is not None:
                ea[k] = eb[k] if ea[k] is None else pick(ea[k], eb[k])
        ea["vals"] |= eb["vals"]
        ea["truncated"] |= eb["truncated"]
        if len(ea["vals"]) > ENUM_CAP:
            ea["truncated"] = True
            ea["vals"] = set(sorted(ea["vals"], key=repr)[:ENUM_CAP])
        ea["hll"].merge(eb["hll"])
    return a


def profile_columns(ds: Any, enum_cap: int = ENUM_CAP) -> dict[str, dict[str, Any]]:
    """One streaming pass; per-batch profiles ride as pickled blobs
    (KiB each) and merge associatively on the driver."""

    def blob(t: pa.Table) -> pa.Table:
        return pa.table(
            {"blob": pa.array([pickle.dumps(_profile_batch(t, enum_cap))])}
        )

    merged: dict[str, dict[str, Any]] = {}
    for b in ds.map_batches(
        blob, batch_format="pyarrow", batch_size=None
    ).iter_batches(batch_format="pyarrow"):
        for raw in b.column("blob").to_pylist():
            merged = _merge(merged, pickle.loads(raw))
    if not merged:
        raise ValueError("cannot infer a model from an empty dataset")
    return merged


def infer_model(
    ds: Any,
    name: str = "InferredModel",
    enum_max: int = 20,
    unique_hint_ratio: float = 0.99,
) -> tuple[type, dict[str, Any]]:
    """Profile ``ds`` and build the Model described in the module
    docstring. Returns ``(model_cls, info)``; ``info`` carries the raw
    per-column profile plus ``unique_candidates`` (columns whose HLL
    distinct estimate is >= ``unique_hint_ratio`` x non-null rows)."""
    import datetime as _dt

    from patito_ray.fields import Field
    from patito_ray.model import Model

    prof = profile_columns(ds)
    ns: dict[str, Any] = {"__annotations__": {}}
    unique_candidates: list[str] = []
    schema = ds.schema()
    arrow_types = dict(zip(schema.names, schema.types))
    for col, e in prof.items():
        typ = arrow_types[col]
        if pa.types.is_integer(typ):
            ann: Any = int
        elif pa.types.is_floating(typ):
            ann = float
        elif pa.types.is_boolean(typ):
            ann = bool
        elif pa.types.is_string(typ) or pa.types.is_large_string(typ):
            ann = str
        elif pa.types.is_timestamp(typ):
            ann = _dt.datetime
        elif pa.types.is_date(typ):
            ann = _dt.date
        else:
            # exotic column (list/struct/binary): typed passthrough,
            # no inferred constraints
            from patito_ray.model import model_from_schema

            ann = None
        kwargs: dict[str, Any] = {}
        enumable = (
            ann in (str, int, bool)
            and not e["truncated"]
            and 0 < len(e["vals"]) <= enum_max
        )
        if enumable:
            ann = Literal[tuple(sorted(e["vals"], key=repr))]  # type: ignore[misc]
        elif ann in (int, float) and e["min"] is not None:
            kwargs["ge"] = e["min"]
            kwargs["le"] = e["max"]
        elif ann is str and e["min_len"] is not None:
            kwargs["min_length"] = e["min_len"]
            kwargs["max_length"] = e["max_len"]
        if ann is None:
            # fall back to the schema-derived model for this one column
            sub = model_from_schema(pa.schema([pa.field(col, typ)]))
            ann = sub.__annotations__[col]
        nullable = e["nulls"] > 0
        if nullable:
            ns["__annotations__"][col] = Optional[ann]
            kwargs["default"] = None
        else:
            ns["__annotations__"][col] = ann
        ns[col] = Field(**kwargs)
        non_null = e["n"] - e["nulls"]
        if non_null and e["hll"].estimate() >= unique_hint_ratio * non_null:
            unique_candidates.append(col)
    model = type(name, (Model,), ns)
    info = {
        "profile": {
            c: {k: v for k, v in e.items() if k != "hll"} for c, e in prof.items()
        },
        "unique_candidates": unique_candidates,
    }
    return model, info
