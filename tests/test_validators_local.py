"""Local-path validation tests mirroring the reference's
tests/test_validators.py (one check per test, exact error dicts)."""


import datetime
from typing import Literal, Optional

import pyarrow as pa
import pytest

import patito_ray as pr


def errs(model, table, **kw):
    try:
        model.validate(table, **kw)
    except pr.DataFrameValidationError as e:
        return e.errors()
    return []


class VerySmall(pr.Model):
    a: int
    b: str


def test_valid_table_passes():
    t = pa.table({"a": [1, 2], "b": ["x", "y"]})
    out = VerySmall.validate(t)
    assert out.num_rows == 2


def test_missing_column():
    t = pa.table({"a": [1]})
    e = errs(VerySmall, t)
    assert e == [
        {"loc": ("b",), "msg": "Missing column", "type": "type_error.missingcolumns"}
    ]


def test_allow_missing_flag():
    t = pa.table({"a": [1]})
    assert errs(VerySmall, t, allow_missing_columns=True) == []


def test_allow_missing_field():
    class M(pr.Model):
        a: int
        b: str = pr.Field(allow_missing=True)

    assert errs(M, pa.table({"a": [1]})) == []


def test_superfluous_column():
    t = pa.table({"a": [1], "b": ["x"], "c": [2]})
    e = errs(VerySmall, t)
    assert e == [
        {
            "loc": ("c",),
            "msg": "Superfluous column",
            "type": "type_error.superfluouscolumns",
        }
    ]
    assert errs(VerySmall, t, allow_superfluous_columns=True) == []
    # drop_superfluous_columns drops before checking
    assert errs(VerySmall, t, drop_superfluous_columns=True) == []


def test_extra_allow_config():
    class M(pr.Model):
        model_config = {"extra": "allow"}
        a: int

    assert errs(M, pa.table({"a": [1], "z": [2]})) == []


def test_missing_values():
    t = pa.table({"a": pa.array([1, None, None], type=pa.int64()), "b": ["x", "y", "z"]})
    e = errs(VerySmall, t)
    assert e == [
        {
            "loc": ("a",),
            "msg": "2 missing values",
            "type": "value_error.missingvalues",
        }
    ]


def test_single_missing_value_singular():
    t = pa.table({"a": pa.array([None], type=pa.int64()), "b": ["x"]})
    assert errs(VerySmall, t)[0]["msg"] == "1 missing value"


def test_optional_allows_null():
    class M(pr.Model):
        a: Optional[int] = None
        b: str

    t = pa.table({"a": pa.array([None, 2], type=pa.int64()), "b": ["x", "y"]})
    assert errs(M, t) == []


def test_dtype_mismatch():
    t = pa.table({"a": ["not", "ints"], "b": ["x", "y"]})
    e = errs(VerySmall, t)
    assert e == [
        {
            "loc": ("a",),
            "msg": "Arrow dtype string does not match model field type.",
            "type": "type_error.columndtype",
        }
    ]


def test_int_accepts_all_integer_widths():
    for t in (pa.int8(), pa.int16(), pa.uint32(), pa.int64()):
        table = pa.table({"a": pa.array([1], type=t), "b": ["x"]})
        assert errs(VerySmall, table) == []


def test_float_rejects_int():
    class M(pr.Model):
        x: float

    assert errs(M, pa.table({"x": pa.array([1], type=pa.int64())}))[0][
        "type"
    ] == "type_error.columndtype"
    assert errs(M, pa.table({"x": pa.array([1.0], type=pa.float32())})) == []


def test_uniqueness():
    class M(pr.Model):
        product_id: int = pr.Field(unique=True)

    t = pa.table({"product_id": [1, 1, 2]})
    e = errs(M, t)
    assert e == [
        {
            "loc": ("product_id",),
            "msg": "2 rows with duplicated values.",
            "type": "value_error.rowvalue",
        }
    ]
    assert errs(M, pa.table({"product_id": [1, 2, 3]})) == []


def test_uniqueness_counts_all_participants():
    class M(pr.Model):
        k: int = pr.Field(unique=True)

    # [1,1,1,2,2,3] -> 5 rows participate in duplicate groups
    e = errs(M, pa.table({"k": [1, 1, 1, 2, 2, 3]}))
    assert e[0]["msg"] == "5 rows with duplicated values."


def test_enum_invalid_values():
    class M(pr.Model):
        zone: Literal["dry", "cold", "frozen"]

    e = errs(M, pa.table({"zone": ["dry", "oven", "oven"]}))
    assert len(e) == 1
    assert e[0]["loc"] == ("zone",)
    assert "oven" in e[0]["msg"]
    assert e[0]["type"] == "value_error.rowvalue"


def test_enum_nullable_permits_none():
    class M(pr.Model):
        zone: Optional[Literal["a", "b"]] = None

    assert errs(M, pa.table({"zone": ["a", None]})) == []


def test_enum_in_list():
    class M(pr.Model):
        zones: list[Literal["a", "b"]]

    assert errs(M, pa.table({"zones": [["a", "b"], ["a"]]})) == []
    e = errs(M, pa.table({"zones": [["a", "c"]]}))
    assert len(e) == 1 and "c" in e[0]["msg"]


def test_bounds_matrix():
    class Bound(pr.Model):
        le_col: float = pr.Field(le=42.5)
        lt_col: float = pr.Field(lt=42.5)
        ge_col: float = pr.Field(ge=42.5)
        gt_col: float = pr.Field(gt=42.5)
        combined: float = pr.Field(gt=42.5, le=43)
        multiple: float = pr.Field(multiple_of=0.5)
        const_col: float = pr.Field(const=3.1415)
        regex_col: str = pr.Field(pattern=r"value [A-Z]")
        min_length_col: str = pr.Field(min_length=2)
        max_length_col: str = pr.Field(max_length=2)

    valid = {
        "le_col": [42.5],
        "lt_col": [42.4],
        "ge_col": [42.5],
        "gt_col": [42.6],
        "combined": [43.0],
        "multiple": [1.5],
        "const_col": [3.1415],
        "regex_col": ["value A"],
        "min_length_col": ["ab"],
        "max_length_col": ["ab"],
    }
    assert errs(Bound, pa.table(valid)) == []

    invalid = {
        "le_col": [42.6],
        "lt_col": [42.5],
        "ge_col": [42.4],
        "gt_col": [42.5],
        "combined": [43.1],
        "multiple": [1.3],
        "const_col": [3.2],
        "regex_col": ["value a"],
        "min_length_col": ["a"],
        "max_length_col": ["abc"],
    }
    # one invalid column at a time (reference pattern, test_validators.py:778-795)
    for col_name, bad in invalid.items():
        data = dict(valid)
        data[col_name] = bad
        e = errs(Bound, pa.table(data))
        assert len(e) == 1, (col_name, e)
        assert e[0] == {
            "loc": (col_name,),
            "msg": "1 row with out of bound values.",
            "type": "value_error.rowvalue",
        }


def test_bounds_ignore_nulls():
    class M(pr.Model):
        x: Optional[float] = pr.Field(default=None, ge=0)

    t = pa.table({"x": pa.array([None, 1.0, -1.0])})
    e = errs(M, t)
    assert e == [
        {
            "loc": ("x",),
            "msg": "1 row with out of bound values.",
            "type": "value_error.rowvalue",
        }
    ]


def test_custom_constraints():
    class M(pr.Model):
        even_int: int = pr.Field(constraints=[pr.col("even_int") % 2 == 0])

    assert errs(M, pa.table({"even_int": [2, 4]})) == []
    e = errs(M, pa.table({"even_int": [2, 3, 5]}))
    assert e == [
        {
            "loc": ("even_int",),
            "msg": "2 rows does not match custom constraints.",
            "type": "value_error.rowvalue",
        }
    ]


def test_constraint_self_alias():
    class M(pr.Model):
        odd: int = pr.Field(constraints=pr.field % 2 == 1)

    assert errs(M, pa.table({"odd": [1, 3]})) == []
    assert len(errs(M, pa.table({"odd": [2]}))) == 1


def test_aggregate_constraint():
    class PizzaSlice(pr.Model):
        fraction: float = pr.Field(constraints=pr.col("fraction").sum() == 1)

    assert errs(PizzaSlice, pa.table({"fraction": [0.25, 0.75]})) == []
    e = errs(PizzaSlice, pa.table({"fraction": [0.25, 0.25]}))
    # aggregate failure broadcasts to every row (reference behaviour)
    assert e[0]["msg"] == "2 rows does not match custom constraints."


def test_cross_column_constraint():
    class Interval(pr.Model):
        x_min: float = pr.Field(constraints=pr.col("x_min") <= pr.col("x_max"))
        x_max: float

    assert errs(Interval, pa.table({"x_min": [0.0], "x_max": [1.0]})) == []
    assert len(errs(Interval, pa.table({"x_min": [2.0], "x_max": [1.0]}))) == 1


def test_list_nullability_matrix():
    class M(pr.Model):
        plain: list[int]
        inner_opt: list[Optional[int]]
        outer_opt: Optional[list[int]] = None
        both_opt: Optional[list[Optional[int]]] = None

    ok = pa.table(
        {
            "plain": [[1], [2]],
            "inner_opt": [[1, None], [None]],
            "outer_opt": pa.array([None, [2]], type=pa.list_(pa.int64())),
            "both_opt": pa.array([None, [None]], type=pa.list_(pa.int64())),
        }
    )
    assert errs(M, ok) == []

    bad = pa.table(
        {
            "plain": [[1, None]],
            "inner_opt": [[1]],
            "outer_opt": pa.array([[2]], type=pa.list_(pa.int64())),
            "both_opt": pa.array([[None]], type=pa.list_(pa.int64())),
        }
    )
    e = errs(M, bad)
    assert e == [
        {
            "loc": ("plain",),
            "msg": "1 missing value in lists",
            "type": "value_error.missingvalues",
        }
    ]


def test_struct_validation():
    class Inner(pr.Model):
        x: int = pr.Field(gt=0)

    class Outer(pr.Model):
        s: Inner

    ok = pa.table({"s": [{"x": 1}, {"x": 2}]})
    assert errs(Outer, ok) == []
    bad = pa.table({"s": [{"x": 0}]})
    e = errs(Outer, bad)
    assert e == [
        {
            "loc": ("s.x",),
            "msg": "1 row with out of bound values.",
            "type": "value_error.rowvalue",
        }
    ]


def test_nested_struct_validation():
    class Inner(pr.Model):
        x: int = pr.Field(gt=0)

    class Mid(pr.Model):
        inner: Inner

    class Outer(pr.Model):
        mid: Mid

    bad = pa.table({"mid": [{"inner": {"x": -1}}]})
    e = errs(Outer, bad)
    assert e[0]["loc"] == ("mid.inner.x",)


def test_optional_struct_skips_all_null_rows():
    class Inner(pr.Model):
        x: int

    class Outer(pr.Model):
        s: Optional[Inner] = None

    t = pa.table(
        {"s": pa.array([None, {"x": 1}], type=pa.struct([("x", pa.int64())]))}
    )
    assert errs(Outer, t) == []


def test_list_of_struct_validation():
    class Inner(pr.Model):
        x: int = pr.Field(gt=0)

    class Outer(pr.Model):
        items: list[Inner]

    ok = pa.table({"items": [[{"x": 1}], [{"x": 2}, {"x": 3}]]})
    assert errs(Outer, ok) == []
    bad = pa.table({"items": [[{"x": 1}, {"x": -5}]]})
    e = errs(Outer, bad)
    assert e[0]["loc"] == ("items.x",)


def test_column_subset_validation():
    class M(pr.Model):
        a: int
        b: int = pr.Field(ge=0, le=100)

    t = pa.table({"a": [1], "b": [1000]})
    # full validation fails on b
    assert len(errs(M, t)) == 1
    # subset on a only passes
    assert errs(M, t, columns=["a"]) == []
    # subset on b fails
    assert len(errs(M, t, columns=["b"])) == 1


def test_alias_generator():
    class M(pr.Model):
        model_config = {"alias_generator": str.title}
        My_Val_A: int

    t = pa.table({"my_val_a": [1]})
    out = M.validate(t)
    assert out.column_names == ["My_Val_A"]


def test_validate_returns_transformed():
    t = pa.table({"a": [1], "b": ["x"], "c": [9]})
    out = VerySmall.validate(t, drop_superfluous_columns=True)
    assert out.column_names == ["a", "b"]


def test_datetime_and_date_columns():
    class M(pr.Model):
        d: datetime.date
        ts: datetime.datetime

    t = pa.table(
        {
            "d": pa.array([datetime.date(2020, 1, 1)], type=pa.date32()),
            "ts": pa.array(
                [datetime.datetime(2020, 1, 1)], type=pa.timestamp("us")
            ),
        }
    )
    assert errs(M, t) == []


def test_pandas_input():
    import pandas as pd

    df = pd.DataFrame({"a": [1, 2], "b": ["x", "y"]})
    out = VerySmall.validate(df)
    assert out.num_rows == 2


def test_polars_input():
    import polars as pl

    df = pl.DataFrame({"a": [1], "b": ["x"]})
    assert VerySmall.validate(df).num_rows == 1


def test_referential_check():
    class M(pr.Model):
        fk: int

    t = pa.table({"fk": [1, 2, 99]})
    report = pr.validate_report(t, M, references={"fk": [1, 2, 3]})
    assert not report.ok
    assert report.errors[0]["msg"] == "1 row with missing referenced keys."


def test_columns_and_drop_superfluous_conflict():
    with pytest.raises(ValueError):
        VerySmall.validate(pa.table({"a": [1], "b": ["x"]}), columns=["a"], drop_superfluous_columns=True)
