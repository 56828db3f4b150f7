"""ModelFrame: the fluent model-aware handle over a Dataset or Table.

Mirrors the reference's typed ``DataFrame``/``LazyFrame`` subclasses
(/root/reference/src/patito/polars.py:52-983) — ``set_model`` becomes
construction, and the E2 cleanse chain (README.md:200-216)

    Product.DataFrame(raw).unalias().derive().drop().cast()
           .fill_null(strategy="defaults").validate().get(pred)

becomes

    ModelFrame(raw, Product).unalias().derive().drop().cast()
        .fill_null().validate().get(pred)

working identically over an in-memory ``pyarrow.Table`` and a
``ray.data.Dataset`` (where each step is a lazy stateless map_batches
stage; nothing materializes until a consuming call).
"""

from __future__ import annotations

from typing import Any, Callable, Iterator

import pyarrow as pa

from patito_ray.exceptions import MultipleRowsReturned, RowDoesNotExist
from patito_ray.exprs import Expr, eval_expr
from patito_ray.model import Model
from patito_ray.stages import transform as _t
from patito_ray.validation.engine import _is_dataset, _to_table


class ModelFrame:
    """A (Dataset | Table) plus its model; every transform returns a new
    ModelFrame so chains stay lazy on the Dataset path."""

    def __init__(self, data: Any, model: type[Model]) -> None:
        self.model = model
        if _is_dataset(data):
            self.data = data
            self._is_ds = True
        else:
            self.data = _to_table(data)
            self._is_ds = False

    def _wrap(self, data: Any) -> "ModelFrame":
        return ModelFrame(data, self.model)

    @property
    def _spec(self):
        return self.model._spec()

    # -- cleanse chain (reference polars.py T3-T8) -------------------------

    def unalias(self) -> "ModelFrame":
        if self._is_ds:
            return self._wrap(_t.unalias_dataset(self.data, self._spec))
        return self._wrap(_t.unalias_table(self.data, self._spec))

    def derive(self) -> "ModelFrame":
        if self._is_ds:
            return self._wrap(_t.derive_dataset(self.data, self._spec))
        return self._wrap(_t.derive_table(self.data, self._spec))

    def cast(self, strict: bool = False) -> "ModelFrame":
        if self._is_ds:
            return self._wrap(_t.cast_dataset(self.data, self._spec, strict=strict))
        return self._wrap(_t.cast_table(self.data, self._spec, strict=strict))

    def fill_null(
        self,
        strategy: str | None = "defaults",
        value: Any = None,
        limit: int | None = None,
    ) -> "ModelFrame":
        """Model-default fill (strategy="defaults") or passthrough fill
        (reference polars.py:637-708 delegates non-"defaults" strategies
        to polars). On the Dataset path, order-free strategies
        (value / zero / one / min / max / mean) distribute; forward /
        backward raise (no total row order)."""
        if value is not None and strategy == "defaults":
            strategy = None
        if strategy == "defaults":
            if self._is_ds:
                return self._wrap(_t.fill_null_dataset(self.data, self._spec))
            return self._wrap(_t.fill_null_table(self.data, self._spec))
        if self._is_ds:
            if limit is not None:
                raise ValueError(
                    "fill_null(limit=...) counts filled rows in order — "
                    "undefined over a distributed Dataset; use the table "
                    "path (as_table) for limited fills"
                )
            return self._wrap(
                _t.fill_null_strategy_dataset(self.data, strategy=strategy, value=value)
            )
        return self._wrap(
            _t.fill_null_strategy_table(
                self.data, strategy=strategy, value=value, limit=limit
            )
        )

    def drop(self) -> "ModelFrame":
        """No-arg drop: remove all non-model columns (reference
        polars.py:504-543)."""
        if self._is_ds:
            return self._wrap(_t.drop_extra_dataset(self.data, self._spec))
        return self._wrap(_t.drop_extra_table(self.data, self._spec))

    def validate(self, **kwargs: Any) -> "ModelFrame":
        out = self.model.validate(self.data, **kwargs)
        return self._wrap(out)

    def validate_report(self, **kwargs: Any):
        return self.model.validate_report(self.data, **kwargs)

    # -- row access --------------------------------------------------------

    def get(self, predicate: Expr | None = None) -> Model:
        """Filter to exactly one row -> model instance (reference
        polars.py:710-790; RowDoesNotExist / MultipleRowsReturned)."""
        if self._is_ds:
            ds = self.data
            if predicate is not None:
                _reject_agg_predicate(predicate)
                node = predicate.node
                ds = ds.map_batches(
                    lambda t: t.filter(_bool_mask(node, t)),
                    batch_format="pyarrow",
                    batch_size=None,
                )
            rows = ds.take(2)
            if not rows:
                raise RowDoesNotExist(f"{self.model.__name__} query returned 0 rows")
            if len(rows) > 1:
                raise MultipleRowsReturned(
                    f"{self.model.__name__} query returned 2+ rows"
                )
            return self.model(**rows[0])
        table = self.data
        if predicate is not None:
            table = table.filter(_bool_mask(predicate.node, table))
        if table.num_rows == 0:
            raise RowDoesNotExist(f"{self.model.__name__} query returned 0 rows")
        if table.num_rows > 1:
            raise MultipleRowsReturned(
                f"{self.model.__name__} query returned {table.num_rows} rows"
            )
        return self.model(**{k: v[0] for k, v in table.to_pydict().items()})

    def iter_models(
        self, batch_size: int = 4096, validate_model: bool = False
    ) -> Iterator[Model]:
        """Yield one model instance per row (driver-side utility — not
        for full-scale datasets; reference polars.py:792-853).

        ``validate_model=True`` runs the model's row-wise checks on each
        streamed batch BEFORE constructing instances (reference
        pydantic.py:479-496 validates each row object) — the first
        failing batch raises DataFrameValidationError."""

        def batches() -> Iterator[pa.Table]:
            if self._is_ds:
                yield from self.data.iter_batches(
                    batch_size=batch_size, batch_format="pyarrow"
                )
            else:
                yield self.data

        spec = self._spec
        for batch in batches():
            if validate_model:
                from patito_ray.validation.checks import check_batch
                from patito_ray.validation.result import assemble_errors
                from patito_ray.exceptions import DataFrameValidationError

                partial = check_batch(batch, spec)
                errors = assemble_errors(partial, list(self.model.columns))
                if errors:
                    raise DataFrameValidationError(errors, self.model)
            for row in batch.to_pylist():
                yield self.model(**row)

    # -- passthrough -------------------------------------------------------

    def filter(self, predicate: Expr) -> "ModelFrame":
        node = predicate.node
        if self._is_ds:
            _reject_agg_predicate(predicate)
            return self._wrap(
                self.data.map_batches(
                    lambda t: t.filter(_bool_mask(node, t)),
                    batch_format="pyarrow",
                    batch_size=None,
                )
            )
        return self._wrap(self.data.filter(_bool_mask(node, self.data)))

    def map_batches(self, fn: Callable[[pa.Table], pa.Table], **kwargs: Any) -> "ModelFrame":
        if self._is_ds:
            kwargs.setdefault("batch_format", "pyarrow")
            return self._wrap(self.data.map_batches(fn, **kwargs))
        return self._wrap(fn(self.data))

    def materialize(self) -> "ModelFrame":
        """Execute and pin (reference ``LazyFrame.collect`` keeping the
        model attachment, polars.py:115-130)."""
        if self._is_ds:
            return self._wrap(self.data.materialize())
        return self

    def as_dataset(self) -> Any:
        if self._is_ds:
            return self.data
        import ray.data as rd

        return rd.from_arrow(self.data)

    def as_table(self) -> pa.Table:
        if self._is_ds:
            batches = list(self.data.iter_batches(batch_format="pyarrow"))
            if not batches:
                return self._spec.arrow_schema().empty_table()
            return pa.concat_tables(batches, promote_options="permissive")
        return self.data

    def write_parquet(self, path: str, **kwargs: Any) -> None:
        """Stream to a partitioned parquet directory (the preferred
        sink: many part files, resumable layout)."""
        self.as_dataset().write_parquet(path, **kwargs)

    def count(self) -> int:
        return self.data.count() if self._is_ds else self.data.num_rows


def _reject_agg_predicate(predicate: Expr) -> None:
    if predicate.has_agg():
        raise ValueError(
            "predicate contains an aggregate (e.g. col('x').mean()): over "
            "a distributed Dataset it would evaluate PER BLOCK and the "
            "result would depend on block boundaries. Compute the "
            "aggregate first (validate()'s two-pass machinery, or "
            "Dataset.aggregate) and filter on the resolved scalar."
        )


def _bool_mask(node: dict, table: pa.Table) -> Any:
    import pyarrow.compute as pc

    m = eval_expr(node, table)
    return pc.fill_null(m, False)
