"""Pydantic-style rich representation surface.

Behaviour-parity with the reference's repr mixin
(/root/reference/src/patito/_pydantic/repr.py:46-131): the same
``__repr_args__`` contract, the same ``__str__`` / ``__repr__``
rendering, the devtools ``__pretty__`` token stream and the Rich
``__rich_repr__`` generator, plus ``display_as_type`` for readable
annotation names in dtype error messages.  Implementation is original;
only the observable output format is mirrored.
"""

from __future__ import annotations

import types
import typing
from typing import Any, Callable, Generator, Iterable, Literal, Sequence, Union, get_args, get_origin

ReprArgs = Sequence[tuple[Union[str, None], Any]]


def _origin_is_union(origin: Any) -> bool:
    if origin is typing.Union:
        return True
    union_type = getattr(types, "UnionType", None)  # py3.10+ ``int | None``
    return union_type is not None and origin is union_type


class Representation:
    """Mixin providing pydantic-style ``__str__``/``__repr__``/``__pretty__``.

    Subclasses override :meth:`__repr_args__` to list the (name, value)
    pairs shown; a ``None`` name renders the bare value.
    """

    __slots__: tuple[str, ...] = ()

    def __repr_args__(self) -> ReprArgs:
        attrs = ((s, getattr(self, s)) for s in self.__slots__)
        return [(a, v) for a, v in attrs if v is not None]

    def __repr_name__(self) -> str:
        return self.__class__.__name__

    def __repr_str__(self, join_str: str) -> str:
        return join_str.join(
            repr(v) if a is None else f"{a}={v!r}" for a, v in self.__repr_args__()
        )

    def __pretty__(
        self, fmt: Callable[[Any], Any], **kwargs: Any
    ) -> Generator[Any, None, None]:
        """Token stream consumed by python-devtools' pretty printer."""
        yield self.__repr_name__() + "("
        yield 1
        for name, value in self.__repr_args__():
            if name is not None:
                yield name + "="
            yield fmt(value)
            yield ","
            yield 0
        yield -1
        yield ")"

    def __rich_repr__(self) -> Iterable[Any]:
        """Field pairs consumed by the Rich library."""
        for name, value in self.__repr_args__():
            if name is None:
                yield value
            else:
                yield name, value

    def __str__(self) -> str:
        return self.__repr_str__(" ")

    def __repr__(self) -> str:
        return f"{self.__repr_name__()}({self.__repr_str__(', ')})"


def display_as_type(obj: Any) -> str:
    """Render a type annotation close to how it was written in source.

    ``Optional[int]`` -> ``"Union[int, None]"``, ``list[str]`` ->
    ``"list[str]"``, ``Literal['a', 'b']`` -> ``"Literal['a', 'b']"``,
    plain classes -> their qualname.
    """
    if isinstance(obj, types.FunctionType):
        return obj.__name__
    if obj is ...:
        return "..."
    if isinstance(obj, Representation):
        return repr(obj)
    if obj is None or obj is type(None):
        return "None"

    origin = get_origin(obj)
    if _origin_is_union(origin):
        args = ", ".join(display_as_type(a) for a in get_args(obj))
        return f"Union[{args}]"
    if origin is not None and get_args(obj):
        if origin is Literal:
            args = ", ".join(repr(a) for a in get_args(obj))
        else:
            args = ", ".join(display_as_type(a) for a in get_args(obj))
        base = getattr(obj, "__qualname__", None) or getattr(
            origin, "__qualname__", None
        ) or str(origin)
        return f"{base}[{args}]"
    if isinstance(obj, type):
        return obj.__qualname__
    return repr(obj).replace("typing.", "").replace("typing_extensions.", "")
