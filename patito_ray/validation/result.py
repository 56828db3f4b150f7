"""Mergeable validation partial results and final report assembly.

Every check in the engine decomposes into a per-batch ``Partial`` (a
commutative monoid: counts sum, value-sets union, schema-error sets
dedupe) so that distributed execution is a ``map_batches`` emitting one
Partial per batch followed by an associative tree-merge — retries of a
batch produce identical Partials, and merging is order-insensitive,
which is what makes the reference's sequential error accumulation
(/root/reference/src/patito/validators.py:84-404) parallelizable.

The final error list mirrors the reference's taxonomy and message
templates (``validators.py:127-402``): messages like "N missing
values", "N rows with duplicated values.", "N row(s) with out of bound
values.", "Rows with invalid values: {...}." and the
``{loc, msg, type}`` dict shapes asserted throughout its test suite.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Any, Mapping

from patito_ray.exceptions import (
    ColumnDTypeError,
    DataFrameValidationError,
    ErrorWrapper,
    MissingColumnsError,
    MissingValuesError,
    RowValueError,
    SuperfluousColumnsError,
)

# Bound on how many distinct invalid enum values / sample rows survive
# merging (at 10^12 rows an unbounded set-union would OOM the driver).
MAX_INVALID_VALUES = 100
MAX_SAMPLES = 5


@dataclass
class Partial:
    """Per-batch validation outcome; merge() is associative+commutative."""

    row_count: int = 0
    # loc -> count
    null_counts: dict[str, int] = dc_field(default_factory=dict)
    list_null_counts: dict[str, int] = dc_field(default_factory=dict)
    bounds_fail: dict[str, int] = dc_field(default_factory=dict)
    constraint_fail: dict[str, int] = dc_field(default_factory=dict)
    # loc -> bounded set of invalid values (+ truncation flag)
    enum_invalid: dict[str, set[Any]] = dc_field(default_factory=dict)
    enum_truncated: set[str] = dc_field(default_factory=set)
    # loc -> duplicate-row count (filled by the uniqueness shuffle, or
    # locally for in-memory tables)
    dup_counts: dict[str, int] = dc_field(default_factory=dict)
    # referential-integrity: loc -> count of rows whose key misses the dim
    ref_fail: dict[str, int] = dc_field(default_factory=dict)
    # schema-level findings (identical in every batch -> set-dedup):
    # tuples (loc, kind, payload) with kind in {missing, superfluous, dtype}
    schema_errors: set[tuple[str, str, str]] = dc_field(default_factory=set)
    # (loc, kind) -> bounded list of sample violating rows
    samples: dict[tuple[str, str], list[dict[str, Any]]] = dc_field(
        default_factory=dict
    )
    # user-defined per-batch counters (engine extension surface): summed
    custom: dict[str, float] = dc_field(default_factory=dict)

    def merge(self, other: "Partial") -> "Partial":
        self.row_count += other.row_count
        for target, src in (
            (self.null_counts, other.null_counts),
            (self.list_null_counts, other.list_null_counts),
            (self.bounds_fail, other.bounds_fail),
            (self.constraint_fail, other.constraint_fail),
            (self.dup_counts, other.dup_counts),
            (self.ref_fail, other.ref_fail),
        ):
            for k, v in src.items():
                target[k] = target.get(k, 0) + v
        for k, vals in other.enum_invalid.items():
            cur = self.enum_invalid.setdefault(k, set())
            cur |= vals
            if len(cur) > MAX_INVALID_VALUES:
                # keep the SMALLEST values (by deterministic repr order):
                # an arbitrary set slice depends on hash seed and merge
                # order, breaking merge associativity — local and
                # distributed reports must render identically
                self.enum_truncated.add(k)
                self.enum_invalid[k] = set(
                    sorted(cur, key=repr)[:MAX_INVALID_VALUES]
                )
        self.enum_truncated |= other.enum_truncated
        self.schema_errors |= other.schema_errors
        for k, v in other.custom.items():
            self.custom[k] = self.custom.get(k, 0) + v
        for k, rows in other.samples.items():
            cur = self.samples.setdefault(k, [])
            if len(cur) < MAX_SAMPLES:
                cur.extend(rows[: MAX_SAMPLES - len(cur)])
        return self


def merge_partials(partials: list[Partial]) -> Partial:
    acc = Partial()
    for p in partials:
        acc.merge(p)
    return acc


def _plural(n: int, word: str = "row") -> str:
    return f"{word}{'' if n == 1 else 's'}"


def assemble_errors(
    merged: Partial, column_order: list[str]
) -> list[ErrorWrapper]:
    """Turn merged counters into reference-shaped ErrorWrappers.

    Ordering follows the reference's sequential pass
    (``validators.py:118-402``): missing -> superfluous -> nulls ->
    list nulls -> per-column (dtype, enum, unique, bounds, constraints,
    referential), with nested (struct) locs sorting under their parent
    via the "parent.child" loc prefix convention
    (``validators.py:277-281``).
    """

    def order_key(loc: str) -> tuple[int, str]:
        root = loc.split(".", 1)[0]
        try:
            return (column_order.index(root), loc)
        except ValueError:
            return (len(column_order), loc)

    errors: list[ErrorWrapper] = []
    schema = sorted(merged.schema_errors, key=lambda t: (t[1], order_key(t[0])))
    for loc, kind, payload in schema:
        if kind == "missing":
            errors.append(ErrorWrapper(MissingColumnsError("Missing column"), loc))
    for loc, kind, payload in schema:
        if kind == "superfluous":
            errors.append(
                ErrorWrapper(SuperfluousColumnsError("Superfluous column"), loc)
            )
    for loc in sorted(merged.null_counts, key=order_key):
        n = merged.null_counts[loc]
        if n:
            errors.append(
                ErrorWrapper(
                    MissingValuesError(f"{n} missing {_plural(n, 'value')}"), loc
                )
            )
    for loc in sorted(merged.list_null_counts, key=order_key):
        n = merged.list_null_counts[loc]
        if n:
            errors.append(
                ErrorWrapper(
                    MissingValuesError(
                        f"{n} missing {_plural(n, 'value')} in lists"
                    ),
                    loc,
                )
            )
    for loc, kind, payload in schema:
        if kind == "dtype":
            errors.append(
                ErrorWrapper(
                    ColumnDTypeError(
                        f"Arrow dtype {payload} does not match model field type."
                    ),
                    loc,
                )
            )
    for loc in sorted(merged.enum_invalid, key=order_key):
        vals = merged.enum_invalid[loc]
        if vals:
            suffix = " (truncated)" if loc in merged.enum_truncated else ""
            # deterministic set rendering (python set order varies by
            # hash seed — local and distributed runs must agree)
            rendered = "{" + ", ".join(sorted((repr(v) for v in vals))) + "}"
            errors.append(
                ErrorWrapper(
                    RowValueError(f"Rows with invalid values: {rendered}.{suffix}"),
                    loc,
                )
            )
    for loc in sorted(merged.dup_counts, key=order_key):
        n = merged.dup_counts[loc]
        if n:
            errors.append(
                ErrorWrapper(
                    RowValueError(f"{n} rows with duplicated values."), loc
                )
            )
    for loc in sorted(merged.bounds_fail, key=order_key):
        n = merged.bounds_fail[loc]
        if n:
            errors.append(
                ErrorWrapper(
                    RowValueError(f"{n} {_plural(n)} with out of bound values."),
                    loc,
                )
            )
    for loc in sorted(merged.constraint_fail, key=order_key):
        n = merged.constraint_fail[loc]
        if n:
            errors.append(
                ErrorWrapper(
                    RowValueError(
                        f"{n} {_plural(n)} does not match custom constraints."
                    ),
                    loc,
                )
            )
    for loc in sorted(merged.ref_fail, key=order_key):
        n = merged.ref_fail[loc]
        if n:
            errors.append(
                ErrorWrapper(
                    RowValueError(
                        f"{n} {_plural(n)} with missing referenced keys."
                    ),
                    loc,
                )
            )
    return errors


@dataclass
class ValidationReport:
    """Outcome of a validation run: counters + assembled errors."""

    model_name: str
    row_count: int
    errors: list[dict[str, Any]]
    merged: Partial
    ok: bool
    # per-column stats summaries when the run collected them
    # (checkpointed runs with collect_stats=True)
    column_stats: dict[str, dict[str, Any]] | None = None
    # row-level findings dropped by waive(): {loc, kind, count, fraction}
    waived: list[dict[str, Any]] | None = None

    # the count-based ROW-LEVEL counter families a fraction tolerance
    # can waive; structural findings (missing/superfluous/dtype) and
    # enum value sets (no per-row count is tracked for them) never are
    _WAIVABLE = (
        ("null", "null_counts"),
        ("list_null", "list_null_counts"),
        ("bounds", "bounds_fail"),
        ("constraint", "constraint_fail"),
        ("duplicate", "dup_counts"),
        ("referential", "ref_fail"),
    )

    def waive(
        self, model: Any, tolerances: Mapping[str, float]
    ) -> "ValidationReport":
        """Great-Expectations-style 'mostly' thresholds: return a new
        report where a count-based row-level finding whose violating
        fraction is <= the tolerance for its loc is WAIVED (removed
        from the error list, recorded in ``report.waived``). Keys are
        exact locs (nested as ``parent.child``, composite uniqueness by
        its ``a+b`` label); ``"*"`` sets the default for every loc.
        Fractions are violating rows / total rows. Structural findings
        (missing/superfluous columns, dtype) and enum value sets are
        never waivable — a tolerance cannot make a schema right. An
        aggregate-constraint failure counts every row, so it only
        waives at tolerance >= 1 (deliberately: it is a dataset-level
        fact, not a row fraction)."""
        import copy

        for loc, frac in tolerances.items():
            if not 0.0 <= float(frac) <= 1.0:
                raise ValueError(
                    f"tolerance for {loc!r} must be in [0, 1], got {frac}"
                )
        merged = copy.deepcopy(self.merged)
        waived: list[dict[str, Any]] = []
        default = tolerances.get("*")
        n_rows = max(1, merged.row_count)
        for kind, attr in self._WAIVABLE:
            counters: dict[str, int] = getattr(merged, attr)
            for loc in list(counters):
                tol = tolerances.get(loc, default)
                if tol is None:
                    continue
                frac = counters[loc] / n_rows
                if frac <= float(tol):
                    waived.append(
                        {
                            "loc": loc,
                            "kind": kind,
                            "count": counters.pop(loc),
                            "fraction": frac,
                        }
                    )
                    merged.samples.pop((loc, kind), None)
        wrappers = assemble_errors(merged, list(getattr(model, "columns", [])))
        errors = [w.as_dict() for w in wrappers]
        return ValidationReport(
            model_name=self.model_name,
            row_count=self.row_count,
            errors=errors,
            merged=merged,
            ok=not errors,
            column_stats=self.column_stats,
            waived=waived,
        )

    def raise_if_failed(self, model: Any) -> None:
        if not self.ok:
            wrappers = assemble_errors(
                self.merged, list(getattr(model, "columns", []))
            )
            raise DataFrameValidationError(wrappers, model)

    def summary_table(self) -> list[dict[str, Any]]:
        """Flat error table (loc, type, msg, count) for report sinks."""
        out = []
        for e in self.errors:
            out.append(
                {
                    "loc": " -> ".join(str(x) for x in e["loc"]),
                    "type": e["type"],
                    "msg": e["msg"],
                }
            )
        return out
