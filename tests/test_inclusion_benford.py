"""inclusion_audit and benford_counts vs pure references."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from patito_ray.validation.stats import benford_counts, inclusion_audit


def test_inclusion_audit_int_keys(ray_session):
    import ray.data as rd

    a_vals = [1, 2, 3, 4, 5, 5, 5, None, 100]
    b_vals = [2, 4, 6, 8, 100, None]
    a = rd.from_arrow(pa.table({"x": pa.array(a_vals, type=pa.int64())})).repartition(3)
    b = rd.from_arrow(pa.table({"y": pa.array(b_vals, type=pa.int64())})).repartition(2)
    out = inclusion_audit(a, "x", b, "y")
    da = {v for v in a_vals if v is not None}
    db = {v for v in b_vals if v is not None}
    assert out.column("n_distinct")[0].as_py() == len(da)
    assert out.column("n_contained")[0].as_py() == len(da & db)


def test_inclusion_audit_string_keys_and_empty(ray_session):
    import ray.data as rd

    a = rd.from_arrow(pa.table({"x": ["aa", "bb", "cc", "aa"]})).repartition(2)
    b = rd.from_arrow(pa.table({"y": ["bb", "zz"]}))
    out = inclusion_audit(a, "x", b, "y")
    assert out.column("n_distinct")[0].as_py() == 3
    assert out.column("n_contained")[0].as_py() == 1

    empty = rd.from_arrow(pa.table({"x": pa.array([], type=pa.string())}))
    out = inclusion_audit(empty, "x", b, "y")
    assert out.column("n_distinct")[0].as_py() == 0
    assert out.column("n_contained")[0].as_py() == 0


def test_benford_counts_reference(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(5)
    # log-uniform positive values spanning 1 .. 1e12, plus edge cases
    v = np.unique(np.exp(rng.uniform(0, 27, 3000))).astype(np.int64)
    vals = v.tolist() + [0, -7, None, 1, 9, 10, 99, 100, 10**18, 9 * 10**17]
    t = pa.table({"x": pa.array(vals, type=pa.int64())})
    ds = rd.from_arrow(t).repartition(5)
    out = benford_counts(ds, "x")

    ref: dict[int, int] = {}
    for x in vals:
        if x is None or x <= 0:
            continue
        d = int(str(x)[0])
        ref[d] = ref.get(d, 0) + 1
    got = dict(zip(out.column("digit").to_pylist(), out.column("cnt").to_pylist()))
    assert got == ref
    assert out.column("digit").to_pylist() == sorted(got)


def test_benford_counts_guards(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({"x": pa.array([1.5], type=pa.float64())}))
    with pytest.raises(Exception, match="integer column"):
        benford_counts(ds, "x")
    neg = rd.from_arrow(pa.table({"x": pa.array([-1, 0], type=pa.int64())}))
    out = benford_counts(neg, "x")
    assert out.num_rows == 0
