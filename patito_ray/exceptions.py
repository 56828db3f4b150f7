"""Validation error taxonomy.

Semantics-parity with the reference's error model
(/root/reference/src/patito/exceptions.py:33-206): the same exception
class names, the same ``{loc, msg, type}`` error dicts (``type`` derived
from the exception class name: ``type_error.missingcolumns``,
``value_error.rowvalue``, ...) and the same ``__str__`` rendering
(``"N validation errors for Model\\n<loc>\\n  <msg> (type=...)"``).
Implementation is original; only the observable behaviour is mirrored.
"""

from __future__ import annotations

from typing import Any, Union

from .reprs import Representation

Loc = tuple[Union[int, str], ...]


class WrongColumnsError(TypeError):
    """Column-name mismatch between data and model."""


class MissingColumnsError(WrongColumnsError):
    """The data is missing one or more model columns."""


class SuperfluousColumnsError(WrongColumnsError):
    """The data has one or more columns not present in the model."""


class MissingValuesError(ValueError):
    """A non-nullable column contains nulls."""


class ColumnDTypeError(TypeError):
    """A column's physical dtype is not valid for its model field."""


class RowValueError(ValueError):
    """One or more rows hold an impermissible value."""


class RowDoesNotExist(RuntimeError):
    """A single row was expected but none were found."""


class MultipleRowsReturned(RuntimeError):
    """A single row was expected but several were found."""


def _exc_type_string(cls: type[Exception]) -> str:
    """``MissingColumnsError`` -> ``"type_error.missingcolumns"`` etc.

    Mirrors the derivation at reference ``exceptions.py:161-173``:
    TypeError subclasses map to ``type_error.*``, ValueError subclasses
    to ``value_error.*``, suffix is the lowercase class name minus
    "Error".
    """
    if issubclass(cls, AssertionError):
        return "assertion_error"
    base = "type_error" if issubclass(cls, TypeError) else "value_error"
    if cls in (TypeError, ValueError):
        return base
    code = getattr(cls, "code", None) or cls.__name__.replace("Error", "").lower()
    return f"{base}.{code}"


class ErrorWrapper(Representation):
    """An exception tagged with the column location it applies to."""

    __slots__ = ("exc", "_loc")

    def __init__(self, exc: Exception, loc: Union[str, Loc]) -> None:
        self.exc = exc
        self._loc = loc

    def loc_tuple(self) -> Loc:
        if isinstance(self._loc, tuple):
            return self._loc
        return (self._loc,)

    def __repr_args__(self) -> list[tuple[Union[str, None], Any]]:
        return [("exc", self.exc), ("loc", self.loc_tuple())]

    def as_dict(self) -> dict[str, Any]:
        d: dict[str, Any] = {
            "loc": self.loc_tuple(),
            "msg": str(self.exc),
            "type": _exc_type_string(type(self.exc)),
        }
        ctx = self.exc.__dict__
        if ctx:
            d["ctx"] = ctx
        return d

def _display_type_and_ctx(e: dict[str, Any]) -> str:
    t = "type=" + e["type"]
    ctx = e.get("ctx")
    if ctx:
        return t + "".join(f"; {k}={v}" for k, v in ctx.items())
    return t


def display_errors(errors: list[dict[str, Any]]) -> str:
    lines = []
    for e in errors:
        loc = " -> ".join(str(part) for part in e["loc"])
        lines.append(f"{loc}\n  {e['msg']} ({_display_type_and_ctx(e)})")
    return "\n".join(lines)


class DataFrameValidationError(Representation, ValueError):
    """Aggregate of all validation failures for one table vs one model."""

    def __init__(self, errors: list[ErrorWrapper], model: Any) -> None:
        self.raw_errors = errors
        self.model = model
        self._error_cache: list[dict[str, Any]] | None = None

    def errors(self) -> list[dict[str, Any]]:
        if self._error_cache is None:
            self._error_cache = [e.as_dict() for e in self.raw_errors]
        return self._error_cache

    def __str__(self) -> str:
        errs = self.errors()
        n = len(errs)
        name = getattr(self.model, "__name__", str(self.model))
        return (
            f"{n} validation error{'' if n == 1 else 's'} for {name}\n"
            f"{display_errors(errs)}"
        )

    def __repr_args__(self) -> list[tuple[Union[str, None], Any]]:
        name = getattr(self.model, "__name__", str(self.model))
        return [("model", name), ("errors", self.errors())]
