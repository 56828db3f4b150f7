"""patito_ray: a Ray-Data-native schema + constraint validation engine.

Declarative table models (annotations + Field constraints) compiled to
picklable Arrow specs, validated over ``ray.data.Dataset`` pipelines:
vectorized pyarrow.compute predicates inside ``map_batches``, mergeable
partial results, explicit shuffles for uniqueness, broadcast
referential checks, sketch-based column statistics, and checkpointable
partition-level runs. Semantics mirror JakobGM/patito (the reference at
/root/reference) — see SURVEY.md for the line-by-line parity map.
"""

import logging as _logging


class _SchemaHashNoise(_logging.Filter):
    """Drop Ray Data's benign per-task 'Failed to hash the schemas'
    warning: the engine's fused pass ships pickled-Partial blob columns
    whose schema metadata is unhashable, tripping a harmless dedup
    fast-path in ``transform_pyarrow.unify_schemas``. Left unfiltered it
    repeats per task and buries real warnings."""

    def filter(self, record: _logging.LogRecord) -> bool:
        return "Failed to hash the schemas" not in record.getMessage()


_logging.getLogger("ray.data._internal.arrow_ops.transform_pyarrow").addFilter(
    _SchemaHashNoise()
)

from patito_ray.exceptions import (
    ColumnDTypeError,
    DataFrameValidationError,
    ErrorWrapper,
    MissingColumnsError,
    MissingValuesError,
    MultipleRowsReturned,
    RowDoesNotExist,
    RowValueError,
    SuperfluousColumnsError,
)
from patito_ray import exceptions
from patito_ray.exprs import Expr, col, field, lit
from patito_ray.fields import Field
from patito_ray.frame import ModelFrame
from patito_ray.frame import ModelFrame as DataFrame
from patito_ray.frame import ModelFrame as LazyFrame
from patito_ray.model import Model
from patito_ray.validation.engine import validate, validate_report
from patito_ray.validation.result import ValidationReport

__version__ = "0.1.0"

__all__ = [
    "Model",
    "Field",
    "DataFrame",
    "LazyFrame",
    "ModelFrame",
    "exceptions",
    "col",
    "lit",
    "field",
    "Expr",
    "validate",
    "validate_report",
    "ValidationReport",
    "DataFrameValidationError",
    "ErrorWrapper",
    "MissingColumnsError",
    "SuperfluousColumnsError",
    "MissingValuesError",
    "ColumnDTypeError",
    "RowValueError",
    "RowDoesNotExist",
    "MultipleRowsReturned",
]
