"""Decimal128 columns through the whole surface (VERDICT r4 item 6 —
beyond-reference: the reference raises on pl.Decimal,
/root/reference/src/patito/_pydantic/dtypes/dtypes.py:245-248).

Covers: annotation resolution, Field(dtype=) compile guards, the fused
validation pass (dtype / nulls / bounds / uniqueness on decimal
columns), cast, example generation, and the spec JSON round-trip.
"""

from __future__ import annotations

import decimal
import json
from typing import Optional

import pyarrow as pa
import pytest

import patito_ray as pr
from patito_ray import dtypes as _dt

D = decimal.Decimal


class Money(pr.Model):
    id: int = pr.Field(unique=True)
    amount: decimal.Decimal = pr.Field(dtype=pa.decimal128(12, 2), ge=0)


class NullableMoney(pr.Model):
    amount: Optional[decimal.Decimal] = pr.Field(dtype=pa.decimal128(12, 2))


def test_resolution_and_compile_guards():
    r = _dt.resolve_annotation(decimal.Decimal)
    assert r.category == _dt.DECIMAL and r.default is None
    assert _dt.valid_dtype(r.category, r, pa.decimal128(12, 2))
    assert _dt.valid_dtype(r.category, r, pa.decimal256(40, 6))
    assert not _dt.valid_dtype(r.category, r, pa.float64())
    assert not _dt.valid_dtype(r.category, r, pa.int64())

    # no default dtype: the model must pin precision/scale
    with pytest.raises(TypeError, match="dtype"):

        class NoDtype(pr.Model):
            amount: decimal.Decimal

        NoDtype._spec()

    # forced dtype outside the decimal family is a compile error
    with pytest.raises(TypeError, match="valid dtype"):

        class WrongDtype(pr.Model):
            amount: decimal.Decimal = pr.Field(dtype=pa.float64())

        WrongDtype._spec()


def test_fused_pass_matrix(ray_session):
    import ray.data as rd

    # clean table passes
    ok = pa.table(
        {
            "id": pa.array([1, 2], pa.int64()),
            "amount": pa.array([D("1.25"), D("3.10")], pa.decimal128(12, 2)),
        }
    )
    rep = pr.validate_report(rd.from_arrow(ok), Money)
    assert rep.ok and rep.errors == []

    # decimal256 is a valid physical dtype for the annotation's family
    # but the FORCED decimal128(12,2) must match exactly
    wide = pa.table(
        {
            "id": pa.array([1], pa.int64()),
            "amount": pa.array([D("1.25")], pa.decimal128(20, 4)),
        }
    )
    rep = pr.validate_report(rd.from_arrow(wide), Money)
    assert not rep.ok
    assert any(e["type"] == "type_error.columndtype" for e in rep.errors)

    # float column: dtype error
    bad_dtype = pa.table(
        {"id": pa.array([1], pa.int64()), "amount": pa.array([1.25])}
    )
    rep = pr.validate_report(rd.from_arrow(bad_dtype), Money)
    assert [e["type"] for e in rep.errors] == ["type_error.columndtype"]

    # nulls + bounds + uniqueness all fire on a decimal column
    bad = pa.table(
        {
            "id": pa.array([1, 2, 3, 4, 4], pa.int64()),
            "amount": pa.array(
                [D("1.25"), D("-3.10"), None, D("7.00"), D("7.00")],
                pa.decimal128(12, 2),
            ),
        }
    )
    rep = pr.validate_report(rd.from_arrow(bad), Money)
    kinds = {(e["loc"], e["type"]) for e in rep.errors}
    assert (("amount",), "value_error.missingvalues") in kinds
    assert (("amount",), "value_error.rowvalue") in kinds  # bounds
    assert (("id",), "value_error.rowvalue") in kinds  # duplicates

    # nullable variant accepts the null
    rep = pr.validate_report(
        rd.from_arrow(
            pa.table({"amount": pa.array([D("1.00"), None], pa.decimal128(12, 2))})
        ),
        NullableMoney,
    )
    assert rep.ok


def test_unique_on_decimal_column(ray_session):
    import ray.data as rd

    class M(pr.Model):
        amount: decimal.Decimal = pr.Field(
            dtype=pa.decimal128(12, 2), unique=True
        )

    t = pa.table(
        {"amount": pa.array([D("1.25"), D("1.25"), D("2.00")], pa.decimal128(12, 2))}
    )
    rep = pr.validate_report(rd.from_arrow(t), M)
    assert not rep.ok
    assert rep.errors == [
        {
            "loc": ("amount",),
            "msg": "2 rows with duplicated values.",
            "type": "value_error.rowvalue",
        }
    ]


def test_cast_and_examples(ray_session):
    import ray.data as rd

    src = rd.from_arrow(pa.table({"amount": pa.array([1.256, 2.0])}))

    class C(pr.Model):
        amount: decimal.Decimal = pr.Field(dtype=pa.decimal128(12, 2))

    out = C.DataFrame(src).cast().as_table()
    assert out.column("amount").type == pa.decimal128(12, 2)
    assert out.column("amount").to_pylist() == [D("1.26"), D("2.00")]

    # example generation respects scale and bounds
    class B(pr.Model):
        amount: decimal.Decimal = pr.Field(
            dtype=pa.decimal128(12, 2), ge=D("0.50")
        )

    assert B.example_value("amount") == D("0.50")
    ex = B.examples(n=3)
    assert ex.column("amount").type == pa.decimal128(12, 2)
    rep = pr.validate_report(rd.from_arrow(ex), B)
    assert rep.ok


def test_spec_json_round_trip():
    from patito_ray.manifest import spec_from_json, spec_to_json

    class M(pr.Model):
        amount: decimal.Decimal = pr.Field(
            dtype=pa.decimal128(12, 2), ge=D("0.50"), unique=True
        )

    j = spec_to_json(M._spec())
    json.loads(j)  # plain JSON
    s2 = spec_from_json(j)
    cs = s2.columns["amount"]
    assert cs.default_dtype == pa.decimal128(12, 2)
    assert cs.bounds == {"minimum": D("0.50")}
    assert cs.unique and cs.category == _dt.DECIMAL


def test_example_value_off_grid_bound_rounds_feasible():
    """A minimum off the scale grid rounds TOWARD feasibility (review
    finding r5): ge=0.005 at scale 2 must produce 0.01, not 0.00."""

    class M(pr.Model):
        amount: decimal.Decimal = pr.Field(
            dtype=pa.decimal128(12, 2), ge=D("0.005")
        )

    assert M.example_value("amount") == D("0.01")

    class Mx(pr.Model):
        amount: decimal.Decimal = pr.Field(
            dtype=pa.decimal128(12, 2), le=D("-0.005")
        )

    assert Mx.example_value("amount") == D("-0.01")
