"""Serializable expression IR compiled to vectorized pyarrow.compute.

Plays the role polars expressions play in the reference
(``Field(constraints=...)`` / ``Field(derived_from=...)``,
/root/reference/src/patito/_pydantic/column_info.py:131-149 serializes
polars exprs to JSON so they can cross process boundaries). Here the
expression *is* a JSON-able tree of plain dicts, so a compiled model
spec ships to Ray workers by ordinary pickling and round-trips through
JSON manifests.

Supported surface (mirrors what the reference's tests exercise,
/root/reference/tests/test_validators.py:859-935 and README derived
columns): column refs (incl. the ``"_"`` self-alias, reference
``validators.py:385-389``), literals, arithmetic (+ - * / % **),
comparisons, boolean ops with Kleene null semantics, ``is_null`` /
``is_in`` / ``is_between`` / ``fill_null`` / ``cast`` / ``round`` /
``abs``, string ops (``contains``, ``len_chars``, ``extract``,
``starts_with``, ``ends_with``, ``to_lowercase``, ``to_uppercase``,
``strip_chars``, ``replace_all``, ``slice``), list ops (``len``), dt
ops (``year``/``month``/``day``), and aggregations (``sum``, ``mean``,
``count``, ``min``, ``max``, ``n_unique``) which evaluate to scalars
and broadcast — exactly how a polars aggregate constraint like
``pl.col("fraction").sum() == 1`` behaves in the reference.

Aggregations are decomposable: ``agg_partial()`` computes per-batch
partial states, ``merge_agg_partials()`` folds them (commutative
monoid), ``substitute_aggs()`` rewrites the tree with the finalized
scalars so the remaining row-wise expression can run in a second
``map_batches`` pass. That is the distributed execution contract for
aggregate constraints.
"""

from __future__ import annotations

import json
import re
from typing import Any, Iterable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------------------
# Expression construction
# ---------------------------------------------------------------------------


class Expr:
    """A node in the expression tree. Wraps a plain-dict IR node."""

    __slots__ = ("node",)

    def __init__(self, node: dict[str, Any]) -> None:
        self.node = node

    # -- serialization ----------------------------------------------------
    def to_json(self) -> str:
        return json.dumps(self.node, sort_keys=True)

    @staticmethod
    def from_json(data: str) -> "Expr":
        return Expr(json.loads(data))

    def __repr__(self) -> str:
        return f"<Expr: {expr_to_str(self.node)}>"

    # -- helpers ----------------------------------------------------------
    def _bin(self, fn: str, other: Any, reflected: bool = False) -> "Expr":
        o = _wrap(other)
        left, right = (o.node, self.node) if reflected else (self.node, o.node)
        return Expr({"op": "bin", "fn": fn, "l": left, "r": right})

    # -- arithmetic -------------------------------------------------------
    def __add__(self, o: Any) -> "Expr":
        return self._bin("add", o)

    def __radd__(self, o: Any) -> "Expr":
        return self._bin("add", o, True)

    def __sub__(self, o: Any) -> "Expr":
        return self._bin("sub", o)

    def __rsub__(self, o: Any) -> "Expr":
        return self._bin("sub", o, True)

    def __mul__(self, o: Any) -> "Expr":
        return self._bin("mul", o)

    def __rmul__(self, o: Any) -> "Expr":
        return self._bin("mul", o, True)

    def __truediv__(self, o: Any) -> "Expr":
        return self._bin("truediv", o)

    def __rtruediv__(self, o: Any) -> "Expr":
        return self._bin("truediv", o, True)

    def __floordiv__(self, o: Any) -> "Expr":
        return self._bin("floordiv", o)

    def __mod__(self, o: Any) -> "Expr":
        return self._bin("mod", o)

    def __rmod__(self, o: Any) -> "Expr":
        return self._bin("mod", o, True)

    def __pow__(self, o: Any) -> "Expr":
        return self._bin("pow", o)

    def __rpow__(self, o: Any) -> "Expr":
        return self._bin("pow", o, True)

    def __rfloordiv__(self, o: Any) -> "Expr":
        return self._bin("floordiv", o, True)

    def __neg__(self) -> "Expr":
        return Expr({"op": "un", "fn": "neg", "x": self.node})

    def __bool__(self) -> bool:
        # Python chained comparisons (1 < col('x') < 5) call bool() on
        # the first comparison and would SILENTLY drop it; raise like
        # polars so the constraint bug is caught at model-definition
        # time instead of validating nothing
        raise TypeError(
            "the truth value of an Expr is ambiguous; use (a < x) & (x < b) "
            "instead of a chained comparison, and & | ~ instead of and/or/not"
        )

    # -- comparisons ------------------------------------------------------
    def __eq__(self, o: Any) -> "Expr":  # type: ignore[override]
        return self._bin("eq", o)

    def __ne__(self, o: Any) -> "Expr":  # type: ignore[override]
        return self._bin("ne", o)

    def __lt__(self, o: Any) -> "Expr":
        return self._bin("lt", o)

    def __le__(self, o: Any) -> "Expr":
        return self._bin("le", o)

    def __gt__(self, o: Any) -> "Expr":
        return self._bin("gt", o)

    def __ge__(self, o: Any) -> "Expr":
        return self._bin("ge", o)

    __hash__ = None  # type: ignore[assignment]

    # -- boolean ----------------------------------------------------------
    def __and__(self, o: Any) -> "Expr":
        return self._bin("and", o)

    def __rand__(self, o: Any) -> "Expr":
        return self._bin("and", o, True)

    def __or__(self, o: Any) -> "Expr":
        return self._bin("or", o)

    def __ror__(self, o: Any) -> "Expr":
        return self._bin("or", o, True)

    def __invert__(self) -> "Expr":
        return Expr({"op": "un", "fn": "not", "x": self.node})

    def not_(self) -> "Expr":
        return ~self

    # -- misc scalar fns --------------------------------------------------
    def is_null(self) -> "Expr":
        return Expr({"op": "un", "fn": "is_null", "x": self.node})

    def is_not_null(self) -> "Expr":
        return Expr({"op": "un", "fn": "is_not_null", "x": self.node})

    def abs(self) -> "Expr":
        return Expr({"op": "un", "fn": "abs", "x": self.node})

    def floor(self) -> "Expr":
        return Expr({"op": "un", "fn": "floor", "x": self.node})

    def ceil(self) -> "Expr":
        return Expr({"op": "un", "fn": "ceil", "x": self.node})

    def round(self, decimals: int = 0, mode: str = "half_towards_infinity") -> "Expr":
        """Round half-away-from-zero by default (polars/DuckDB ROUND
        semantics; pyarrow's default half_to_even differs)."""
        return Expr({"op": "call", "fn": "round", "x": self.node, "args": [decimals, mode]})

    def cast(self, dtype: str) -> "Expr":
        """Cast to an arrow type given by name (e.g. "float64", "int64")."""
        return Expr({"op": "call", "fn": "cast", "x": self.node, "args": [dtype]})

    def fill_null(self, value: Any) -> "Expr":
        return Expr({"op": "call", "fn": "fill_null", "x": self.node, "args": [value]})

    def is_in(self, values: Iterable[Any]) -> "Expr":
        return Expr({"op": "call", "fn": "is_in", "x": self.node, "args": [list(values)]})

    def is_between(self, lower: Any, upper: Any) -> "Expr":
        return Expr(
            {"op": "call", "fn": "is_between", "x": self.node, "args": [lower, upper]}
        )

    # -- aggregations -----------------------------------------------------
    def _agg(self, fn: str) -> "Expr":
        return Expr({"op": "agg", "fn": fn, "x": self.node})

    def sum(self) -> "Expr":
        return self._agg("sum")

    def mean(self) -> "Expr":
        return self._agg("mean")

    def count(self) -> "Expr":
        return self._agg("count")

    def min(self) -> "Expr":
        return self._agg("min")

    def max(self) -> "Expr":
        return self._agg("max")

    def n_unique(self) -> "Expr":
        return self._agg("n_unique")

    # -- namespaces -------------------------------------------------------
    @property
    def str(self) -> "StrNamespace":
        return StrNamespace(self)

    @property
    def list(self) -> "ListNamespace":
        return ListNamespace(self)

    @property
    def dt(self) -> "DtNamespace":
        return DtNamespace(self)

    # -- introspection ----------------------------------------------------
    def root_names(self) -> set[str]:
        return _root_names(self.node)

    def has_agg(self) -> bool:
        return _has_agg(self.node)


class StrNamespace:
    __slots__ = ("_e",)

    def __init__(self, e: Expr) -> None:
        self._e = e

    def _call(self, fn: str, *args: Any) -> Expr:
        return Expr({"op": "call", "fn": fn, "x": self._e.node, "args": list(args)})

    def contains(self, pattern: str, literal: bool = False) -> Expr:
        return self._call("str_contains", pattern, literal)

    def len_chars(self) -> Expr:
        return self._call("str_len_chars")

    def len_bytes(self) -> Expr:
        return self._call("str_len_bytes")

    def extract(self, pattern: str, group_index: int = 1) -> Expr:
        return self._call("str_extract", pattern, group_index)

    def starts_with(self, prefix: str) -> Expr:
        return self._call("str_starts_with", prefix)

    def ends_with(self, suffix: str) -> Expr:
        return self._call("str_ends_with", suffix)

    def to_lowercase(self) -> Expr:
        return self._call("str_to_lower")

    def to_uppercase(self) -> Expr:
        return self._call("str_to_upper")

    def strip_chars(self, chars: str | None = None) -> Expr:
        return self._call("str_strip", chars)

    def replace_all(self, pattern: str, value: str, literal: bool = False) -> Expr:
        return self._call("str_replace_all", pattern, value, literal)

    def slice(self, offset: int, length: int | None = None) -> Expr:
        return self._call("str_slice", offset, length)


class ListNamespace:
    __slots__ = ("_e",)

    def __init__(self, e: Expr) -> None:
        self._e = e

    def len(self) -> Expr:
        return Expr({"op": "call", "fn": "list_len", "x": self._e.node, "args": []})


class DtNamespace:
    __slots__ = ("_e",)

    def __init__(self, e: Expr) -> None:
        self._e = e

    def _call(self, fn: str) -> Expr:
        return Expr({"op": "call", "fn": fn, "x": self._e.node, "args": []})

    def year(self) -> Expr:
        return self._call("dt_year")

    def month(self) -> Expr:
        return self._call("dt_month")

    def day(self) -> Expr:
        return self._call("dt_day")


def col(name: str) -> Expr:
    """Reference a column. ``col("_")`` is the self-alias rewritten to the
    owning field's column at validation time (reference
    ``validators.py:385-389``)."""
    return Expr({"op": "col", "name": name})


# Alias matching the reference's ``pt.field`` sugar (pydantic.py Field docs).
field = col("_")


def lit(value: Any) -> Expr:
    return Expr({"op": "lit", "value": value})


def _wrap(value: Any) -> Expr:
    if isinstance(value, Expr):
        return value
    return lit(value)


# ---------------------------------------------------------------------------
# Tree utilities
# ---------------------------------------------------------------------------


def _root_names(node: dict[str, Any]) -> set[str]:
    # delegate to the generic tree walk so new IR node kinds cannot
    # silently diverge between the two extractors
    return collect_col_refs(node)


def _has_agg(node: dict[str, Any]) -> bool:
    op = node["op"]
    if op == "agg":
        return True
    if op == "bin":
        return _has_agg(node["l"]) or _has_agg(node["r"])
    if op in ("un", "call"):
        return _has_agg(node["x"])
    return False


def substitute_column(node: dict[str, Any], old: str, new: str) -> dict[str, Any]:
    """Rewrite every ``col(old)`` reference to ``col(new)`` (self-alias)."""
    op = node["op"]
    if op == "col":
        if node["name"] == old:
            return {"op": "col", "name": new}
        return node
    if op == "bin":
        return {
            "op": "bin",
            "fn": node["fn"],
            "l": substitute_column(node["l"], old, new),
            "r": substitute_column(node["r"], old, new),
        }
    if op in ("un",):
        return {"op": "un", "fn": node["fn"], "x": substitute_column(node["x"], old, new)}
    if op == "call":
        return {
            "op": "call",
            "fn": node["fn"],
            "x": substitute_column(node["x"], old, new),
            "args": node["args"],
        }
    if op == "agg":
        return {"op": "agg", "fn": node["fn"], "x": substitute_column(node["x"], old, new)}
    return node


# ---------------------------------------------------------------------------
# Evaluation against a pyarrow.Table
# ---------------------------------------------------------------------------

_ARROW_TYPES: dict[str, pa.DataType] = {
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
    "string": pa.string(),
    "large_string": pa.large_string(),
    "bool": pa.bool_(),
    "boolean": pa.bool_(),
    "binary": pa.binary(),
    "date32": pa.date32(),
    "timestamp[us]": pa.timestamp("us"),
}


def arrow_type_from_name(name: str) -> pa.DataType:
    return _ARROW_TYPES[name]


def _is_int(t: pa.DataType) -> bool:
    return pa.types.is_integer(t)


def _as_array(v: Any) -> Any:
    """Normalize ChunkedArray to Array for kernels that care; scalars pass."""
    if isinstance(v, pa.ChunkedArray):
        return v.combine_chunks()
    return v


def _dtype_of(v: Any) -> pa.DataType | None:
    if isinstance(v, (pa.Array, pa.ChunkedArray)):
        return v.type
    if isinstance(v, pa.Scalar):
        return v.type
    return None


def eval_expr(node: dict[str, Any], table: pa.Table) -> Any:
    """Evaluate an IR node against a table.

    Returns a pa.Array / pa.ChunkedArray (length == table rows) or a
    pa.Scalar / python scalar for aggregate / literal nodes. Scalar
    results broadcast in downstream pc kernels, mirroring polars
    aggregate-expression broadcasting.
    """
    op = node["op"]
    if op == "col":
        name = node["name"]
        if name not in table.column_names:
            raise KeyError(f"column {name!r} not present in batch")
        return table.column(name)
    if op == "lit":
        return pa.scalar(node["value"]) if node["value"] is not None else pa.scalar(None)
    if op == "bin":
        return _eval_bin(node, table)
    if op == "un":
        x = eval_expr(node["x"], table)
        fn = node["fn"]
        if fn == "not":
            return pc.invert(x)
        if fn == "neg":
            return pc.negate(x)
        if fn == "abs":
            return pc.abs(x)
        if fn == "floor":
            return pc.floor(x)
        if fn == "ceil":
            return pc.ceil(x)
        if fn == "is_null":
            return pc.is_null(x)
        if fn == "is_not_null":
            return pc.is_valid(x)
        raise ValueError(f"unknown unary fn {fn}")
    if op == "call":
        return _eval_call(node, table)
    if op == "agg":
        x = eval_expr(node["x"], table)
        return _agg_finalize_single(node["fn"], x)
    if op == "agg_value":
        # An aggregate already resolved to a scalar (distributed two-pass).
        return pa.scalar(node["value"])
    raise ValueError(f"unknown op {op}")


def _eval_bin(node: dict[str, Any], table: pa.Table) -> Any:
    fn = node["fn"]
    left = eval_expr(node["l"], table)
    right = eval_expr(node["r"], table)
    if fn == "add":
        return pc.add(left, right)
    if fn == "sub":
        return pc.subtract(left, right)
    if fn == "mul":
        return pc.multiply(left, right)
    if fn == "truediv":
        # polars "/" is float division even on ints
        lt, rt = _dtype_of(left), _dtype_of(right)
        if lt is not None and _is_int(lt):
            left = pc.cast(left, pa.float64())
        if rt is not None and _is_int(rt):
            right = pc.cast(right, pa.float64())
        return pc.divide(left, right)
    if fn == "floordiv":
        q = pc.divide(pc.cast(left, pa.float64()), pc.cast(right, pa.float64()))
        return pc.floor(q)
    if fn == "mod":
        # pyarrow.compute has no modulo kernel; python-style mod via
        # l - floor(l/r)*r in float64 (documented precision limit: |int|
        # above 2^53 loses exactness — fine for constraint predicates).
        lf = pc.cast(left, pa.float64())
        rf = pc.cast(right, pa.float64())
        q = pc.floor(pc.divide(lf, rf))
        return pc.subtract(lf, pc.multiply(q, rf))
    if fn == "pow":
        return pc.power(left, right)
    if fn == "eq":
        return pc.equal(left, right)
    if fn == "ne":
        return pc.not_equal(left, right)
    if fn == "lt":
        return pc.less(left, right)
    if fn == "le":
        return pc.less_equal(left, right)
    if fn == "gt":
        return pc.greater(left, right)
    if fn == "ge":
        return pc.greater_equal(left, right)
    if fn == "and":
        return pc.and_kleene(left, right)
    if fn == "or":
        return pc.or_kleene(left, right)
    raise ValueError(f"unknown binary fn {fn}")


def _eval_call(node: dict[str, Any], table: pa.Table) -> Any:
    fn = node["fn"]
    x = eval_expr(node["x"], table)
    args = node.get("args", [])
    if fn == "round":
        mode = args[1] if len(args) > 1 else "half_towards_infinity"
        return pc.round(x, ndigits=args[0], round_mode=mode)
    if fn == "cast":
        return pc.cast(x, arrow_type_from_name(args[0]))
    if fn == "fill_null":
        return pc.fill_null(x, args[0])
    if fn == "is_in":
        arr = _as_array(x)
        hit = pc.is_in(arr, value_set=pa.array(args[0]))
        # pc.is_in maps null inputs to False; every other kernel here
        # propagates null (null is neither pass nor fail for the
        # null-safe constraint masks) — restore that contract
        return pc.if_else(pc.is_valid(arr), hit, pa.scalar(None, type=pa.bool_()))
    if fn == "is_between":
        lo, hi = args
        return pc.and_kleene(pc.greater_equal(x, lo), pc.less_equal(x, hi))
    if fn == "str_contains":
        pattern, literal = args[0], args[1]
        if literal:
            return pc.match_substring(x, pattern)
        return pc.match_substring_regex(x, pattern)
    if fn == "str_len_chars":
        return pc.utf8_length(x)
    if fn == "str_len_bytes":
        return pc.binary_length(x)
    if fn == "str_extract":
        return _str_extract(_as_array(x), args[0], args[1])
    if fn == "str_starts_with":
        return pc.starts_with(x, args[0])
    if fn == "str_ends_with":
        return pc.ends_with(x, args[0])
    if fn == "str_to_lower":
        return pc.utf8_lower(x)
    if fn == "str_to_upper":
        return pc.utf8_upper(x)
    if fn == "str_strip":
        if args and args[0] is not None:
            return pc.utf8_trim(x, characters=args[0])
        return pc.utf8_trim_whitespace(x)
    if fn == "str_replace_all":
        pattern, value, literal = args
        if literal:
            return pc.replace_substring(x, pattern=pattern, replacement=value)
        return pc.replace_substring_regex(x, pattern=pattern, replacement=value)
    if fn == "str_slice":
        offset, length = args
        stop = None if length is None else offset + length
        return pc.utf8_slice_codeunits(x, start=offset, stop=stop)
    if fn == "list_len":
        return pc.list_value_length(x)
    if fn == "dt_year":
        return pc.year(x)
    if fn == "dt_month":
        return pc.month(x)
    if fn == "dt_day":
        return pc.day(x)
    raise ValueError(f"unknown call fn {fn}")


def _str_extract(arr: pa.Array, pattern: str, group_index: int) -> pa.Array:
    """Regex group extraction.

    pyarrow's ``extract_regex`` requires *named* capture groups; polars'
    ``str.extract`` uses positional groups. Rewrite positional groups to
    named ones and use the native kernel, falling back to a compiled-re
    python loop only if the rewrite fails (rare patterns). Matches the
    derived-column usage in the reference README (``str.extract(r"€(\\d+...)")``).
    """
    named = re.sub(r"(?<!\\)\((?!\?)", "(?P<__g>", pattern, count=group_index)
    named = named.replace("(?P<__g>", "(?P<g0>", 1)
    for i in range(1, group_index):
        named = named.replace("(?P<__g>", f"(?P<g{i}>", 1)
    target = f"g{group_index - 1}"
    try:
        struct = pc.extract_regex(arr, pattern=named)
        result = pc.struct_field(struct, target)
        return result
    except (pa.ArrowInvalid, pa.ArrowKeyError, pa.ArrowNotImplementedError):
        rx = re.compile(pattern)
        out: list[str | None] = []
        for v in arr.to_pylist():
            if v is None:
                out.append(None)
                continue
            m = rx.search(v)
            out.append(m.group(group_index) if m else None)
        return pa.array(out, type=pa.string())


# ---------------------------------------------------------------------------
# Aggregate decomposition (distributed two-pass execution)
# ---------------------------------------------------------------------------


def _agg_finalize_single(fn: str, x: Any) -> Any:
    if fn == "sum":
        return pc.sum(x)
    if fn == "mean":
        return pc.mean(x)
    if fn == "count":
        return pc.count(x)  # counts valid (non-null), matching polars .count on Series? polars counts incl nulls for col.count(); use valid to match pc default
    if fn == "min":
        return pc.min(x)
    if fn == "max":
        return pc.max(x)
    if fn == "n_unique":
        return pa.scalar(len(pc.unique(_as_array(x))))
    raise ValueError(f"unknown agg fn {fn}")


def collect_agg_nodes(node: dict[str, Any], path: str = "r") -> list[tuple[str, dict[str, Any]]]:
    """Return [(path_id, agg_node)] for every aggregate subtree."""
    out: list[tuple[str, dict[str, Any]]] = []
    op = node["op"]
    if op == "agg":
        out.append((path, node))
        return out  # nested aggs unsupported
    if op == "bin":
        out += collect_agg_nodes(node["l"], path + ".l")
        out += collect_agg_nodes(node["r"], path + ".r")
    elif op in ("un", "call"):
        out += collect_agg_nodes(node["x"], path + ".x")
    return out


def agg_partial(agg_node: dict[str, Any], table: pa.Table) -> dict[str, Any]:
    """Per-batch partial state for one aggregate node (mergeable)."""
    fn = agg_node["fn"]
    x = eval_expr(agg_node["x"], table)
    if fn in ("sum", "mean"):
        s = pc.sum(x).as_py()
        n = pc.count(x).as_py()
        return {"s": s or 0, "n": n or 0}
    if fn == "count":
        return {"n": pc.count(x).as_py() or 0}
    if fn == "min":
        v = pc.min(x).as_py()
        return {"m": v}
    if fn == "max":
        v = pc.max(x).as_py()
        return {"m": v}
    if fn == "n_unique":
        return {"u": set(pc.unique(_as_array(x)).to_pylist())}
    raise ValueError(f"unknown agg fn {fn}")


def merge_agg_partials(fn: str, a: dict[str, Any], b: dict[str, Any]) -> dict[str, Any]:
    if fn in ("sum", "mean"):
        return {"s": a["s"] + b["s"], "n": a["n"] + b["n"]}
    if fn == "count":
        return {"n": a["n"] + b["n"]}
    if fn == "min":
        vals = [v for v in (a["m"], b["m"]) if v is not None]
        return {"m": min(vals) if vals else None}
    if fn == "max":
        vals = [v for v in (a["m"], b["m"]) if v is not None]
        return {"m": max(vals) if vals else None}
    if fn == "n_unique":
        return {"u": a["u"] | b["u"]}
    raise ValueError(f"unknown agg fn {fn}")


def agg_finalize(fn: str, partial: dict[str, Any]) -> Any:
    if fn == "sum":
        return partial["s"]
    if fn == "mean":
        return partial["s"] / partial["n"] if partial["n"] else None
    if fn == "count":
        return partial["n"]
    if fn in ("min", "max"):
        return partial["m"]
    if fn == "n_unique":
        return len(partial["u"])
    raise ValueError(f"unknown agg fn {fn}")


def substitute_aggs(node: dict[str, Any], values: dict[str, Any], path: str = "r") -> dict[str, Any]:
    """Replace aggregate subtrees by resolved scalar nodes (path-keyed)."""
    op = node["op"]
    if op == "agg":
        return {"op": "agg_value", "value": values[path]}
    if op == "bin":
        return {
            "op": "bin",
            "fn": node["fn"],
            "l": substitute_aggs(node["l"], values, path + ".l"),
            "r": substitute_aggs(node["r"], values, path + ".r"),
        }
    if op == "un":
        return {"op": "un", "fn": node["fn"], "x": substitute_aggs(node["x"], values, path + ".x")}
    if op == "call":
        return {
            "op": "call",
            "fn": node["fn"],
            "x": substitute_aggs(node["x"], values, path + ".x"),
            "args": node["args"],
        }
    return node


# ---------------------------------------------------------------------------
# Boolean-mask helpers (constraint evaluation)
# ---------------------------------------------------------------------------


def fail_mask(check_node: dict[str, Any], table: pa.Table) -> pa.Array:
    """Rows *failing* a boolean check expression.

    Matches reference null semantics (``validators.py:360-366``): a null
    check result is neither pass nor fail — ``filter(~check)`` drops
    nulls — so the fail mask is ``invert(check)`` with nulls -> False.
    """
    result = eval_expr(check_node, table)
    if isinstance(result, pa.Scalar) or not isinstance(
        result, (pa.Array, pa.ChunkedArray)
    ):
        # scalar check (aggregate constraint): broadcast to all rows
        val = result.as_py() if isinstance(result, pa.Scalar) else bool(result)
        if val is None or bool(val):
            return pa.array(np.zeros(table.num_rows, dtype=bool))
        return pa.array(np.ones(table.num_rows, dtype=bool))
    inverted = pc.invert(result)
    return _as_array(pc.fill_null(inverted, False))


def count_failures(check_node: dict[str, Any], table: pa.Table) -> int:
    mask = fail_mask(check_node, table)
    s = pc.sum(mask).as_py()
    return int(s or 0)


def collect_col_refs(node: dict[str, Any]) -> set[str]:
    """All column names referenced anywhere in an IR tree."""
    out: set[str] = set()

    def walk(n: Any) -> None:
        if isinstance(n, dict):
            if n.get("op") == "col":
                out.add(n["name"])
            for v in n.values():
                walk(v)
        elif isinstance(n, (list, tuple)):
            for v in n:
                walk(v)

    walk(node)
    return out


# -- human-readable rendering (reference parity: patito expressions
# repr as the polars code that built them, src/patito/_pydantic/repr.py
# provides the analogous pretty mixin) --------------------------------

_BIN_SYMBOL = {
    "add": "+", "sub": "-", "mul": "*", "truediv": "/", "floordiv": "//",
    "mod": "%", "pow": "**", "eq": "==", "ne": "!=", "lt": "<", "le": "<=",
    "gt": ">", "ge": ">=", "and": "&", "or": "|",
}
_NS_PREFIX = {"str_": ".str.", "dt_": ".dt.", "list_": ".list."}


def expr_to_str(node: Any) -> str:
    """Render an expression node as the code that would rebuild it:
    ``(col('price') > 0) & col('url').str.contains('^https')``. Every
    binary expression is parenthesized, so operator precedence never
    needs to be inferred from the string."""
    if not isinstance(node, dict):
        return repr(node)
    op = node.get("op")
    if op == "col":
        return f"col({node['name']!r})"
    if op == "lit":
        return f"lit({node['value']!r})"
    if op == "bin":
        sym = _BIN_SYMBOL.get(node["fn"], node["fn"])
        return f"({expr_to_str(node['l'])} {sym} {expr_to_str(node['r'])})"
    if op == "un":
        fn = node["fn"]
        if fn == "not":
            return f"~{expr_to_str(node['x'])}"
        if fn == "neg":
            return f"-{expr_to_str(node['x'])}"
        return f"{expr_to_str(node['x'])}.{fn}()"
    if op == "call":
        fn = node["fn"]
        method = fn
        for pref, dotted in _NS_PREFIX.items():
            if fn.startswith(pref):
                method = dotted + fn[len(pref):]
                break
        else:
            method = "." + fn
        args = ", ".join(repr(a) for a in node.get("args", []))
        return f"{expr_to_str(node['x'])}{method}({args})"
    if op == "agg":
        return f"{expr_to_str(node['x'])}.{node['fn']}()"
    if op == "agg_value":
        return f"lit({node['value']!r})"
    return repr(node)
