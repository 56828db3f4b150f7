"""Cleanse-stage tests mirroring reference tests/test_polars.py."""

import pyarrow as pa
import pytest
from typing import Optional

import patito_ray as pr
from patito_ray.frame import ModelFrame


def test_derive_simple_and_recursive():
    # mirrors reference tests/test_polars.py:353-421
    class Derived(pr.Model):
        foo: int
        bar: int = pr.Field(derived_from="foo")
        double_bar: int = pr.Field(derived_from=2 * pr.col("bar"))

    t = pa.table({"foo": [1, 2]})
    out = ModelFrame(t, Derived).derive().as_table()
    assert out.column("bar").to_pylist() == [1, 2]
    assert out.column("double_bar").to_pylist() == [2, 4]
    assert out.column_names[:3] == ["foo", "bar", "double_bar"]


def test_derive_regex_extract_cast():
    # reference README.md:180-189 eurocent example
    class Product(pr.Model):
        name: str
        cost: str
        eurocent_cost: int = pr.Field(
            derived_from=(
                100 * pr.col("cost").str.extract(r"€(\d+\.\d+)").cast("float64")
            ).round(2)
        )

    t = pa.table({"name": ["a"], "cost": ["€2.40"]})
    out = ModelFrame(t, Product).derive().as_table()
    assert out.column("eurocent_cost").to_pylist() == [240]


def test_cast_non_strict_keeps_valid():
    class M(pr.Model):
        a: int  # default int64, int8 is valid
        b: float

    t = pa.table(
        {"a": pa.array([1], type=pa.int8()), "b": pa.array([1], type=pa.int64())}
    )
    out = ModelFrame(t, M).cast().as_table()
    assert out.column("a").type == pa.int8()  # valid -> untouched
    assert out.column("b").type == pa.float64()  # invalid -> cast


def test_cast_strict_forces_defaults():
    class M(pr.Model):
        a: int

    t = pa.table({"a": pa.array([1], type=pa.int8())})
    out = ModelFrame(t, M).cast(strict=True).as_table()
    assert out.column("a").type == pa.int64()


def test_cast_forced_dtype():
    class M(pr.Model):
        a: int = pr.Field(dtype=pa.int8())

    t = pa.table({"a": pa.array([1], type=pa.int64())})
    out = ModelFrame(t, M).cast().as_table()
    assert out.column("a").type == pa.int8()


def test_fill_null_defaults():
    # mirrors reference tests/test_polars.py:83-134
    class M(pr.Model):
        name: str
        price: int = 19

    t = pa.table({"name": ["x", "y"], "price": pa.array([None, 5], type=pa.int64())})
    out = ModelFrame(t, M).fill_null().as_table()
    assert out.column("price").to_pylist() == [19, 5]
    # missing default column gets created
    t2 = pa.table({"name": ["x"]})
    out2 = ModelFrame(t2, M).fill_null().as_table()
    assert out2.column("price").to_pylist() == [19]


def test_unalias_str_and_choices():
    class M(pr.Model):
        a: int = pr.Field(alias="src_a")
        b: Optional[int] = pr.Field(default=None, alias=["b1", "b2"])

    t = pa.table(
        {
            "src_a": [1, 2],
            "b1": pa.array([None, 10], type=pa.int64()),
            "b2": pa.array([7, 8], type=pa.int64()),
        }
    )
    out = ModelFrame(t, M).unalias().as_table()
    assert out.column("a").to_pylist() == [1, 2]
    assert out.column("b").to_pylist() == [7, 10]  # coalesce order b1, b2


def test_drop_extra():
    class M(pr.Model):
        a: int

    t = pa.table({"a": [1], "junk": ["x"]})
    out = ModelFrame(t, M).drop().as_table()
    assert out.column_names == ["a"]


def test_full_cleanse_chain_then_validate():
    class Product(pr.Model):
        product_id: int = pr.Field(unique=True)
        cost: float = pr.Field(ge=0)
        with_vat: float = pr.Field(derived_from=pr.col("cost") * 1.25)

    t = pa.table(
        {
            "product_id": [1, 2],
            "cost": pa.array([10.0, None]),
            "junk": ["a", "b"],
        }
    )
    frame = ModelFrame(t, Product).drop()

    class ProductD(pr.Model):
        product_id: int = pr.Field(unique=True)
        cost: float = pr.Field(ge=0, default=0.0)
        with_vat: float = pr.Field(derived_from=pr.col("cost") * 1.25)

    out = (
        ModelFrame(t, ProductD)
        .drop()
        .fill_null()
        .derive()
        .cast()
        .validate()
        .as_table()
    )
    assert out.column("with_vat").to_pylist() == [12.5, 0.0]


def test_get_semantics():
    class M(pr.Model):
        a: int
        b: str

    t = pa.table({"a": [1, 2], "b": ["x", "y"]})
    row = ModelFrame(t, M).get(pr.col("a") == 2)
    assert row.a == 2 and row.b == "y"
    with pytest.raises(pr.RowDoesNotExist):
        ModelFrame(t, M).get(pr.col("a") == 99)
    with pytest.raises(pr.MultipleRowsReturned):
        ModelFrame(t, M).get(pr.col("a") >= 1)


def test_iter_models():
    class M(pr.Model):
        a: int
        b: str

    t = pa.table({"a": [1, 2], "b": ["x", "y"]})
    models = list(ModelFrame(t, M).iter_models())
    assert [m.a for m in models] == [1, 2]


def test_dataset_cleanse_chain(ray_session):
    import ray.data as rd

    class M(pr.Model):
        a: int
        doubled: int = pr.Field(derived_from=2 * pr.col("a"))

    ds = rd.from_arrow(pa.table({"a": list(range(100))}))
    out = ModelFrame(ds, M).derive().validate().as_table()
    assert out.column("doubled").to_pylist()[:3] == [0, 2, 4]


def test_grouped_top_k(ray_session):
    import ray.data as rd

    from patito_ray.stages.topk import grouped_top_k

    t = pa.table(
        {
            "g": pa.array([1, 1, 1, 1, 2, 2, 3], pa.int64()),
            "v": pa.array([5.0, 9.0, 7.0, 9.0, 1.0, 2.0, 4.0]),
            "id": pa.array([10, 11, 12, 13, 20, 21, 30], pa.int64()),
        }
    )
    ds = rd.from_arrow(t).repartition(3)
    out = grouped_top_k(ds, group="g", value="v", k=2, tie="id")
    rows = sorted((r["g"], r["rank"], r["id"]) for r in out.take_all())
    # g=1: 9.0 tie -> id 11 then 13; g=2: 2.0 then 1.0; g=3: single row
    assert rows == [(1, 1, 11), (1, 2, 13), (2, 1, 21), (2, 2, 20), (3, 1, 30)]


def test_json_extract_column(ray_session):
    import ray.data as rd

    from patito_ray.stages.transform import json_extract_column

    t = pa.table(
        {
            "id": pa.array([0, 1, 2, 3], type=pa.int64()),
            "j": [
                '{"k": 7, "s": "x"}',
                '{"s": "no k"}',
                "not json at all",
                None,
            ],
        }
    )
    out = json_extract_column(
        rd.from_arrow(t), "j", "$.k", "k", dtype=pa.int64()
    ).take_all()
    assert [r["k"] for r in sorted(out, key=lambda r: r["id"])] == [
        7, None, None, None
    ]
    s = json_extract_column(rd.from_arrow(t), "j", "$.s", "sv").take_all()
    assert [r["sv"] for r in sorted(s, key=lambda r: r["id"])] == [
        "x", "no k", None, None
    ]


def test_regex_extract_explode(ray_session):
    import ray.data as rd

    from patito_ray.stages.transform import regex_extract_explode

    t = pa.table(
        {
            "id": pa.array([0, 1, 2, 3], type=pa.int64()),
            "s": ["ab ab", "zzz", None, "xabx"],
        }
    )
    out = regex_extract_explode(
        rd.from_arrow(t), "s", "ab", out="m", keep=["id"]
    ).take_all()
    got = sorted((r["id"], r["m"]) for r in out)
    # no-match and null rows vanish (UNNEST-of-empty-list semantics)
    assert got == [(0, "ab"), (0, "ab"), (3, "ab")]
