"""Model schema views, dtype mapping, schema algebra, examples —
mirroring reference tests/test_model.py and tests/test_dummy_data.py."""

import datetime
import enum
from typing import Any, Literal, Optional

import pyarrow as pa
import pytest

import patito_ray as pr


class CompleteModel(pr.Model):
    str_col: str
    int_col: int
    float_col: float
    bool_col: bool
    date_col: datetime.date
    datetime_col: datetime.datetime
    duration_col: datetime.timedelta
    time_col: datetime.time
    literal_col: Literal["a", "b", "c"]
    null_col: None
    list_int: list[int]
    list_str: list[str]
    list_opt: list[Optional[int]]


def test_dtype_mapping():
    # reference tests/test_model.py:190-252
    d = CompleteModel.dtypes
    assert d["str_col"] == pa.string()
    assert d["int_col"] == pa.int64()
    assert d["float_col"] == pa.float64()
    assert d["bool_col"] == pa.bool_()
    assert d["date_col"] == pa.date32()
    assert d["datetime_col"] == pa.timestamp("us")
    assert d["duration_col"] == pa.duration("us")
    assert d["time_col"] == pa.time64("us")
    assert d["literal_col"] == pa.string()
    assert d["null_col"] == pa.null()
    assert d["list_int"] == pa.list_(pa.int64())
    assert d["list_opt"] == pa.list_(pa.int64())


def test_forced_dtype():
    class M(pr.Model):
        a: int = pr.Field(dtype=pa.int8())
        ts: datetime.datetime = pr.Field(dtype=pa.timestamp("us", tz="UTC"))

    assert M.dtypes["a"] == pa.int8()
    assert M.dtypes["ts"] == pa.timestamp("us", tz="UTC")


def test_enum_class_annotation():
    class Color(enum.Enum):
        RED = "red"
        BLUE = "blue"

    class M(pr.Model):
        c: Color

    spec = M._spec().columns["c"]
    assert spec.enum_values == ["red", "blue"]


def test_nullability_views():
    class M(pr.Model):
        a: int
        b: Optional[str] = None

    assert M.non_nullable_columns == {"a"}
    assert M.nullable_columns == {"b"}


def test_defaults_and_unique_views():
    class M(pr.Model):
        a: int = pr.Field(unique=True)
        b: int = 7

    assert M.unique_columns == ["a"]
    assert M.defaults == {"b": 7}


def test_select_drop_rename():
    # reference tests/test_model.py:258-383
    class M(pr.Model):
        a: int
        b: str
        c: float

    assert M.select(["a", "b"]).columns == ["a", "b"]
    assert M.drop("c").columns == ["a", "b"]
    assert M.rename({"a": "x"}).columns == ["x", "b", "c"]
    with pytest.raises(ValueError):
        M.select("nope")
    with pytest.raises(ValueError):
        M.rename({"nope": "x"})


def test_prefix_suffix_with_fields():
    class M(pr.Model):
        a: int

    assert M.prefix("p_").columns == ["p_a"]
    assert M.suffix("_s").columns == ["a_s"]
    M2 = M.with_fields(b=str)
    assert M2.columns == ["a", "b"]
    assert M2.dtypes["b"] == pa.string()


def test_join_typing():
    # reference pydantic.py:886-953 semantics
    class L(pr.Model):
        k: int
        lv: str

    class R(pr.Model):
        k: int
        rv: float

    inner = L.join(R, how="inner")
    assert set(inner.columns) == {"k", "lv", "rv"}
    assert inner.non_nullable_columns == {"k", "lv", "rv"}

    left = L.join(R, how="left")
    assert "rv" in left.nullable_columns
    assert "lv" in left.non_nullable_columns

    outer = L.join(R, how="outer")
    assert outer.nullable_columns == {"k", "lv", "rv"}

    assert L.join(R, how="anti") is L


def test_example_value_honors_bounds():
    class M(pr.Model):
        ge_col: int = pr.Field(ge=10, le=20)
        const_col: float = pr.Field(const=3.14)
        lit: Literal["x", "y"]
        s: str = pr.Field(min_length=3)

    assert 10 <= M.example_value("ge_col") <= 20
    assert M.example_value("const_col") == 3.14
    assert M.example_value("lit") == "x"
    assert len(M.example_value("s")) >= 3


def test_example_regex_unsupported():
    class M(pr.Model):
        p: str = pr.Field(pattern=r"[A-Z]+")

    with pytest.raises(NotImplementedError):
        M.example_value("p")


def test_examples_table():
    # reference tests/test_dummy_data.py: uniqueness sequence 0,1,2,...
    class M(pr.Model):
        uid: int = pr.Field(unique=True)
        name: str
        price: float = pr.Field(ge=0)

    t = M.examples(n=4)
    assert t.column("uid").to_pylist() == [0, 1, 2, 3]
    assert t.num_rows == 4
    M.validate(t)  # generated data must self-validate


def test_examples_with_partial_data():
    class M(pr.Model):
        a: int
        b: str

    t = M.examples({"a": [5, 6]})
    assert t.num_rows == 2
    assert t.column("a").to_pylist() == [5, 6]


def test_examples_validates_nested_default():
    class M(pr.Model):
        lit: Literal["a", "b"]
        opt: Optional[int] = None

    t = M.examples(n=2)
    M.validate(t)


def test_union_requires_dtype():
    with pytest.raises(TypeError):

        class Bad(pr.Model):
            u: "int | str"

        Bad._spec()


def test_any_annotation():
    class M(pr.Model):
        a: Any

    assert M.dtypes["a"] == pa.string()


def test_ray_examples(ray_session):
    from patito_ray.generate import ray_examples

    class M(pr.Model):
        uid: int = pr.Field(unique=True)
        tag: Literal["x", "y"]

    ds = ray_examples(M, 1000, blocks=4)
    M.validate(ds)  # unique over the global index -> passes
    t = pa.concat_tables(ds.iter_batches(batch_format="pyarrow"))
    assert sorted(t.column("uid").to_pylist()) == list(range(1000))


def test_expr_json_roundtrip():
    # reference tests/test_validators.py:1179-1219 round-trip parity
    e = (pr.col("a") % 2 == 0) & pr.col("b").str.contains("x")
    e2 = pr.Expr.from_json(e.to_json())
    assert e2.node == e.node
    assert e2.root_names() == {"a", "b"}


def test_from_row_and_repr():
    class M(pr.Model):
        a: int
        b: str

    m = M.from_row(pa.table({"a": [1], "b": ["z"]}))
    assert m.a == 1
    assert "a=1" in repr(m)
    assert M(a=1, b="z") == m


def test_frame_and_pandas_examples():
    class M(pr.Model):
        a: int = pr.Field(unique=True)
        b: str

    M.validate_schema()
    df = M.pandas_examples(n=3)
    assert list(df["a"]) == [0, 1, 2]
    f = M.frame(pa.table({"a": [1], "b": ["x"]}))
    assert f.validate().count() == 1


def test_spec_json_roundtrip():
    import datetime

    from patito_ray.manifest import spec_from_json, spec_to_json

    class M(pr.Model):
        uid: int = pr.Field(unique=True)
        name: str = pr.Field(min_length=2)
        score: Optional[float] = pr.Field(default=None, ge=0)
        lit: Literal["a", "b"]
        ts: datetime.datetime = pr.Field(ge=datetime.datetime(2020, 1, 1))
        vals: list[int]
        even: int = pr.Field(constraints=pr.field % 2 == 0)

    spec = M._spec()
    restored = spec_from_json(spec_to_json(spec))
    assert restored.column_names == spec.column_names
    assert restored.unique_columns == ["uid"]
    assert restored.columns["lit"].enum_values == ["a", "b"]
    assert restored.columns["even"].constraints == spec.columns["even"].constraints
    assert restored.columns["ts"].bounds["minimum"] == datetime.datetime(2020, 1, 1)
    assert restored.columns["vals"].default_dtype == pa.list_(pa.int64())
    # a restored spec still validates (check_batch works off ColumnSpec)
    from patito_ray.validation.checks import check_batch

    t = pa.table(
        {
            "uid": [1, 1],
            "name": ["x", "ok"],
            "score": pa.array([None, -1.0]),
            "lit": ["a", "zz"],
            "ts": pa.array([datetime.datetime(2019, 1, 1)] * 2, type=pa.timestamp("us")),
            "vals": [[1], [2]],
            "even": [3, 4],
        }
    )
    p = check_batch(t, restored)
    assert p.dup_counts["uid"] == 2
    assert p.bounds_fail["name"] == 1
    assert p.bounds_fail["score"] == 1
    assert "zz" in p.enum_invalid["lit"]
    assert p.bounds_fail["ts"] == 2
    assert p.constraint_fail["even"] == 1


def test_unalias_alias_path():
    from patito_ray.frame import ModelFrame

    class M(pr.Model):
        first_tag: str = pr.Field(alias=("tags", 0))
        tags: list[str]

    t = pa.table({"tags": [["a", "b"], ["c"]]})
    out = ModelFrame(t, M).unalias().as_table()
    assert out.column("first_tag").to_pylist() == ["a", "c"]


def test_partition_verdicts(ray_session):
    import json

    import ray.data as rd

    from patito_ray.validation.violations import partition_verdicts

    class M(pr.Model):
        x: float = pr.Field(ge=0)

    good = pa.table({"x": [1.0, 2.0]})
    bad = pa.table({"x": [-1.0, 3.0]})
    ds = rd.from_arrow([good, bad])
    rows = partition_verdicts(ds, M).take_all()
    assert sum(r["rows"] for r in rows) == 4
    oks = sorted(r["ok"] for r in rows)
    assert oks == [False, True]
    bad_row = next(r for r in rows if not r["ok"])
    assert json.loads(bad_row["by_kind"]) == {"out_of_bounds": 1}


def test_forced_dtype_compat_rejected():
    """Field(dtype=...) outside the annotation's valid family raises at
    compile time (reference validate_polars_dtype, dtypes.py:58-112)."""
    import pytest

    class BadInt(pr.Model):
        x: int = pr.Field(dtype=pa.string())

    with pytest.raises(TypeError, match="not a valid dtype"):
        BadInt.validate_schema()

    class BadFloat(pr.Model):
        x: float = pr.Field(dtype=pa.int64())

    with pytest.raises(TypeError, match="not a valid dtype"):
        BadFloat.validate_schema()

    class BadList(pr.Model):
        x: list[int] = pr.Field(dtype=pa.list_(pa.string()))

    with pytest.raises(TypeError, match="not a valid dtype"):
        BadList.validate_schema()

    # compatible forcings still compile
    class Good(pr.Model):
        a: int = pr.Field(dtype=pa.uint16())
        b: str = pr.Field(dtype=pa.large_string())
        c: datetime.datetime = pr.Field(dtype=pa.timestamp("ns", tz="UTC"))
        d: list[int] = pr.Field(dtype=pa.large_list(pa.int32()))

    Good.validate_schema()
    assert Good.dtypes["a"] == pa.uint16()


def test_examples_iterable_and_columns_forms():
    class Prod(pr.Model):
        product_id: int = pr.Field(unique=True)
        name: str
        temp: float = -270.0

    # iterable of dict rows
    t = Prod.examples([{"name": "a"}, {"name": "b"}])
    assert t.column("name").to_pylist() == ["a", "b"]
    assert t.column("product_id").to_pylist() == [0, 1]  # unique sequence
    assert t.column("temp").to_pylist() == [-270.0, -270.0]
    # iterable of sequences + columns=
    t = Prod.examples([(1, "x"), (2, "y")], columns=["product_id", "name"])
    assert t.column("product_id").to_pylist() == [1, 2]
    assert t.column("name").to_pylist() == ["x", "y"]
    with pytest.raises(ValueError, match="columns were named"):
        Prod.examples([(1, "x", 3.0, 4)], columns=["product_id", "name"])


def test_typed_dataframe_classes():
    class Prod(pr.Model):
        product_id: int = pr.Field(unique=True)
        name: str

    df_cls = Prod.DataFrame
    assert df_cls.__name__ == "ProdDataFrame"
    assert Prod.DataFrame is df_cls  # cached
    assert Prod.LazyFrame is df_cls
    frame = df_cls(pa.table({"product_id": [1], "name": ["a"]}))
    assert frame.model is Prod
    assert frame.count() == 1


def test_iter_models_validate_model():
    class Prod(pr.Model):
        product_id: int = pr.Field(ge=0)
        name: str

    good = pa.table({"product_id": [1, 2], "name": ["a", "b"]})
    out = list(Prod.DataFrame(good).iter_models(validate_model=True))
    assert [m.product_id for m in out] == [1, 2]
    bad = pa.table({"product_id": [1, -5], "name": ["a", "b"]})
    models = Prod.DataFrame(bad).iter_models(validate_model=True)
    with pytest.raises(pr.DataFrameValidationError):
        list(models)
    # without validation it constructs anyway (reference model_construct path)
    assert len(list(Prod.DataFrame(bad).iter_models())) == 2


def test_fill_null_strategies_table():
    class M(pr.Model):
        x: Optional[int] = None
        y: Optional[float] = None

    t = pa.table(
        {
            "x": pa.array([1, None, 3], pa.int64()),
            "y": pa.array([None, 2.0, None], pa.float64()),
        }
    )
    f = M.DataFrame(t)
    assert f.fill_null(strategy="zero").as_table().column("x").to_pylist() == [1, 0, 3]
    assert f.fill_null(strategy="one").as_table().column("y").to_pylist() == [1.0, 2.0, 1.0]
    assert f.fill_null(strategy="forward").as_table().column("x").to_pylist() == [1, 1, 3]
    assert f.fill_null(strategy="backward").as_table().column("y").to_pylist() == [2.0, 2.0, None]
    assert f.fill_null(strategy="mean").as_table().column("x").to_pylist() == [1, 2, 3]
    assert f.fill_null(value=9).as_table().column("x").to_pylist() == [1, 9, 3]


def test_fill_null_strategies_dataset(ray_session):
    import ray.data as rd

    class M(pr.Model):
        x: Optional[int] = None
        y: Optional[float] = None

    t = pa.table(
        {
            "x": pa.array([1, None, 3, None], pa.int64()),
            "y": pa.array([None, 2.0, None, 4.0], pa.float64()),
        }
    )
    ds = rd.from_arrow(t).repartition(2)
    f = M.DataFrame(ds)
    out = f.fill_null(strategy="zero").as_table()
    assert sorted(out.column("x").to_pylist()) == [0, 0, 1, 3]
    out = f.fill_null(strategy="mean").as_table()
    assert sorted(out.column("y").to_pylist()) == [2.0, 3.0, 3.0, 4.0]
    out = f.fill_null(strategy="max").as_table()
    assert sorted(out.column("x").to_pylist()) == [1, 3, 3, 3]
    out = f.fill_null(value=7).as_table()
    assert sorted(out.column("x").to_pylist()) == [1, 3, 7, 7]
    with pytest.raises(ValueError, match="order"):
        f.fill_null(strategy="forward")


def test_examples_dict_rows_disjoint_keys():
    """Rows with disjoint key sets must stay separate rows with per-row
    defaults — never merge (round-2 review finding)."""

    class Prod(pr.Model):
        product_id: int = pr.Field(unique=True)
        name: str = "noname"
        temp: float = -270.0

    t = Prod.examples([{"name": "a"}, {"temp": 1.0}])
    assert t.num_rows == 2
    assert t.column("name").to_pylist() == ["a", "noname"]
    assert t.column("temp").to_pylist() == [-270.0, 1.0]
    assert sorted(t.column("product_id").to_pylist()) == [0, 1]
    # explicit unique values are respected; fill avoids collisions
    t2 = Prod.examples([{"product_id": 1}, {"name": "x"}])
    ids = t2.column("product_id").to_pylist()
    assert ids[0] == 1 and ids[1] != 1


def test_fill_null_dataset_divergences(ray_session):
    """Dataset-path fill_null: mean into int truncates (not crash),
    unknown strategies raise, limit raises (round-2 review findings)."""
    import ray.data as rd

    class M(pr.Model):
        x: Optional[int] = None

    ds = rd.from_arrow(pa.table({"x": pa.array([1, 2, None], pa.int64())}))
    f = M.DataFrame(ds)
    out = f.fill_null(strategy="mean").as_table()  # mean 1.5 -> truncates to 1
    assert sorted(out.column("x").to_pylist()) == [1, 1, 2]
    with pytest.raises(ValueError, match="unknown fill_null strategy"):
        f.fill_null(strategy="mena")
    with pytest.raises(ValueError, match="limit"):
        f.fill_null(value=0, limit=1)


def test_expr_chained_comparison_raises():
    """1 < col('x') < 5 would silently drop the first bound (Python
    chaining calls bool()); it must raise like polars."""
    with pytest.raises(TypeError, match="ambiguous"):
        1 < pr.col("x") < 5  # noqa: B015
    # the explicit form works
    e = (1 < pr.col("x")) & (pr.col("x") < 5)
    assert e.root_names() == {"x"}


def test_expr_is_in_null_semantics():
    from patito_ray.exprs import fail_mask

    class M(pr.Model):
        s: Optional[str] = pr.Field(default=None, constraints=pr.field.is_in(["a", "b"]))

    t = pa.table({"s": pa.array(["a", "zzz", None])})
    rep = M.validate_report(t)
    # null is neither pass nor fail: only "zzz" violates
    assert rep.merged.constraint_fail.get("s") == 1


def test_expr_reflected_pow_floordiv():
    t = pa.table({"x": pa.array([1, 2, 3], pa.int64())})
    from patito_ray.exprs import eval_expr

    assert eval_expr((2 ** pr.col("x")).node, t).to_pylist() == [2, 4, 8]
    assert eval_expr((12 // pr.col("x")).node, t).to_pylist() == [12, 6, 4]


def test_unique_examples_typed_sequences():
    class M(pr.Model):
        sid: str = pr.Field(unique=True)
        ts: datetime.datetime = pr.Field(unique=True)
        v: int

    t = M.examples(n=3)
    assert len(set(t.column("sid").to_pylist())) == 3
    assert len(set(t.column("ts").to_pylist())) == 3


def test_example_values_respect_bounds():
    class M(pr.Model):
        a: int = pr.Field(le=10, multiple_of=7)
        b: float = pr.Field(gt=0.0, lt=0.5)

    row = M.example()
    assert row.a % 7 == 0 and row.a <= 10
    assert 0.0 < row.b < 0.5
    # generated examples pass the model's own validation
    M.validate(M.examples(n=2))


def test_bool_literal_and_union_dtypes():
    class M(pr.Model):
        flag: Literal[True, False]

    assert M.dtypes["flag"] == pa.bool_()
    M.validate(pa.table({"flag": pa.array([True, False])}))

    from patito_ray.dtypes import resolve_annotation, valid_dtype
    from typing import Union

    r = resolve_annotation(Union[list[int], list[str]])
    assert valid_dtype(r.category, r, pa.list_(pa.int64()))
    assert valid_dtype(r.category, r, pa.list_(pa.string()))
    assert not valid_dtype(r.category, r, pa.list_(pa.float64()))

    with pytest.raises(TypeError, match="unparameterized"):
        resolve_annotation(list)


def test_dataset_filter_rejects_aggregate_predicate(ray_session):
    import ray.data as rd

    class M(pr.Model):
        x: float

    ds = rd.from_arrow(pa.table({"x": [1.0, 2.0, 3.0]}))
    with pytest.raises(ValueError, match="aggregate"):
        pr.DataFrame(ds, M).filter(pr.col("x") > pr.col("x").mean())
    # table path still computes the global aggregate
    out = pr.DataFrame(pa.table({"x": [1.0, 2.0, 3.0]}), M).filter(
        pr.col("x") > pr.col("x").mean()
    )
    assert out.as_table().column("x").to_pylist() == [3.0]


def test_bound_frame_read_csv_parquet(ray_session, tmp_path):
    """Model.DataFrame.read_csv / read_parquet entry points (reference
    E3 flow: Model.DataFrame.read_csv(path))."""
    import pyarrow.parquet as pq

    class Prod(pr.Model):
        product_id: int
        name: str

    csv_path = tmp_path / "p.csv"
    csv_path.write_text("product_id,name\n1,a\n2,b\n")
    frame = Prod.DataFrame.read_csv(str(csv_path))
    assert frame.model is Prod
    assert sorted(frame.as_table().column("product_id").to_pylist()) == [1, 2]

    pq_path = tmp_path / "p.parquet"
    pq.write_table(pa.table({"product_id": [3], "name": ["c"], "junk": [0]}), str(pq_path))
    frame = Prod.DataFrame.read_parquet(str(pq_path))
    t = frame.as_table()
    assert t.column_names == ["product_id", "name"]  # projection pushdown

    jl_path = tmp_path / "p.jsonl"
    jl_path.write_text('{"product_id": 4, "name": "d"}\n')
    frame = Prod.DataFrame.read_json(str(jl_path))
    t = frame.as_table()
    assert t.column("product_id").to_pylist() == [4]
    assert t.column("product_id").type == pa.int64()


def test_pydantic_style_reprs():
    """Representation mixin parity (reference _pydantic/repr.py:46-131):
    ErrorWrapper / DataFrameValidationError repr, __pretty__, __rich_repr__,
    and display_as_type annotation rendering."""
    from patito_ray.exceptions import DataFrameValidationError, ErrorWrapper
    from patito_ray.reprs import display_as_type

    class M(pr.Model):
        a: int

    w = ErrorWrapper(ValueError("bad"), loc="a")
    assert repr(w) == "ErrorWrapper(exc=ValueError('bad'), loc=('a',))"
    assert str(w) == "exc=ValueError('bad') loc=('a',)"
    assert list(w.__rich_repr__()) == [("exc", w.exc), ("loc", ("a",))]
    pretty = list(w.__pretty__(lambda v: v))
    assert pretty[0] == "ErrorWrapper(" and pretty[-1] == ")"
    assert "exc=" in pretty and "loc=" in pretty

    err = DataFrameValidationError([w], M)
    assert repr(err).startswith("DataFrameValidationError(model='M', errors=[")
    assert "1 validation error for M" in str(err)
    # ctx appended to the type display like the reference's
    # _display_error_type_and_ctx
    class Limit(ValueError):
        def __init__(self, limit):
            super().__init__(f"over {limit}")
            self.limit = limit

    err2 = DataFrameValidationError([ErrorWrapper(Limit(5), loc="a")], M)
    assert "(type=value_error.limit; limit=5)" in str(err2)

    assert display_as_type(Optional[int]) == "Union[int, None]"
    assert display_as_type(list[str]) == "list[str]"
    assert display_as_type(Literal["a", "b"]) == "Literal['a', 'b']"
    assert display_as_type(int) == "int"
