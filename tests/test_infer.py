import datetime

import numpy as np
import pyarrow as pa
import pytest

from patito_ray.validation.infer import infer_model, profile_columns


def _corpus(n=2000):
    rng = np.random.default_rng(11)
    flag = rng.choice(["A", "N", "R"], n)
    v = rng.uniform(5.0, 95.0, n)
    v[0], v[1] = 5.0, 95.0  # pin the observed extremes
    opt = rng.integers(0, 100, n).astype(object)
    opt[:50] = None
    return pa.table(
        {
            "id": pa.array(np.arange(n, dtype=np.int64)),
            "flag": pa.array(flag),
            "v": pa.array(v, pa.float64()),
            "opt": pa.array(list(opt), pa.int64()),
            "name": pa.array([f"user_{i:06d}" for i in range(n)]),
        }
    )


def test_infer_model_self_consistent(ray_session):
    import ray.data as rd

    from patito_ray.validation.engine import validate, validate_report

    t = _corpus()
    ds = rd.from_arrow(t).repartition(4)
    model, info = infer_model(ds, name="Docs")

    spec = model._spec()
    # enum inferred for the 3-value flag
    assert spec.columns["flag"].enum_values is not None
    assert set(spec.columns["flag"].enum_values) == {"A", "N", "R"}
    # numeric bounds = observed extremes
    assert spec.columns["v"].bounds["minimum"] == 5.0
    assert spec.columns["v"].bounds["maximum"] == 95.0
    # nullability observed
    assert spec.columns["opt"].nullable
    assert not spec.columns["v"].nullable
    # string length bounds
    assert spec.columns["name"].bounds["minLength"] == 11
    assert spec.columns["name"].bounds["maxLength"] == 11
    # uniqueness reported as a hint, never asserted
    assert "id" in info["unique_candidates"]
    assert not spec.columns["id"].unique

    # the inferred contract must accept the data it was inferred from
    rep = validate_report(rd.from_arrow(t).repartition(4), model)
    assert rep.ok, rep.errors

    # and reject data outside the observed envelope
    bad = t.set_column(
        t.schema.get_field_index("v"),
        "v",
        pa.array(np.full(t.num_rows, 1000.0), pa.float64()),
    )
    from patito_ray.exceptions import DataFrameValidationError

    with pytest.raises(DataFrameValidationError, match="v"):
        validate(rd.from_arrow(bad), model)


def test_profile_merge_matches_single_batch(ray_session):
    import ray.data as rd

    t = _corpus(500)
    one = profile_columns(rd.from_arrow(t))
    many = profile_columns(rd.from_arrow(t).repartition(7))
    for col in t.column_names:
        for k in ("n", "nulls", "min", "max", "min_len", "max_len", "truncated"):
            assert one[col][k] == many[col][k], (col, k)
        assert one[col]["vals"] == many[col]["vals"]


def test_infer_empty_raises(ray_session):
    import ray.data as rd

    empty = pa.schema([("x", pa.int64())]).empty_table()
    with pytest.raises(ValueError, match="empty"):
        infer_model(rd.from_arrow(empty))
