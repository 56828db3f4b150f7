"""Distributed (Ray Dataset) validation must agree with the local path."""

import datetime
from typing import Literal, Optional

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import patito_ray as pr


class Orders(pr.Model):
    order_id: int = pr.Field(unique=True)
    status: Literal["open", "closed"]
    amount: float = pr.Field(ge=0)
    note: Optional[str] = None


def _make_table(n: int = 5000) -> pa.Table:
    import numpy as np

    rng = np.random.default_rng(7)
    order_id = np.arange(n)
    # inject duplicates: 10 ids appear twice, one id appears 4 times
    order_id[100:110] = order_id[0:10]
    order_id[200:203] = 42
    status = np.where(rng.random(n) < 0.99, "open", "bad_status")
    amount = rng.random(n) * 100
    amount[:7] = -1.0  # bound violations
    return pa.table(
        {
            "order_id": pa.array(order_id, type=pa.int64()),
            "status": pa.array(status.tolist(), type=pa.string()),
            "amount": pa.array(amount, type=pa.float64()),
            "note": pa.array([None] * n, type=pa.string()),
        }
    )


@pytest.fixture(scope="module")
def parquet_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("orders")
    t = _make_table()
    # several files so the Dataset has multiple blocks
    n = t.num_rows
    step = n // 4
    for i in range(4):
        pq.write_table(t.slice(i * step, step), d / f"part-{i}.parquet")
    return str(d), t


def test_distributed_matches_local(ray_session, parquet_dir):
    import ray.data as rd

    path, table = parquet_dir
    local = pr.validate_report(table, Orders)
    ds = rd.read_parquet(path)
    dist = pr.validate_report(ds, Orders)

    assert dist.row_count == local.row_count == table.num_rows
    assert dist.ok == local.ok is False

    def keyed(report):
        return {(e["loc"], e["type"], e["msg"]) for e in report.errors}

    assert keyed(dist) == keyed(local)


def test_distributed_dup_count_exact(ray_session, parquet_dir):
    import ray.data as rd
    from patito_ray.validation.engine import duplicate_count_distributed

    path, table = parquet_dir
    from patito_ray.validation.checks import local_duplicate_count

    expected = local_duplicate_count(table.column("order_id"))
    ds = rd.read_parquet(path)
    assert duplicate_count_distributed(ds, "order_id") == expected
    # exact (unhashed) mode agrees as well
    assert duplicate_count_distributed(ds, "order_id", hash_keys=False) == expected


def test_distributed_valid_dataset_passes(ray_session, tmp_path):
    import numpy as np
    import ray.data as rd

    n = 2000
    t = pa.table(
        {
            "order_id": pa.array(np.arange(n), type=pa.int64()),
            "status": pa.array(["open"] * n),
            "amount": pa.array(np.ones(n), type=pa.float64()),
            "note": pa.array([None] * n, type=pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "ok.parquet")
    ds = rd.read_parquet(str(tmp_path))
    out = Orders.validate(ds)  # should not raise
    assert out.count() == n


def test_distributed_aggregate_constraint(ray_session, tmp_path):
    import ray.data as rd

    class PizzaSlice(pr.Model):
        fraction: float = pr.Field(constraints=pr.col("fraction").sum() == 1)

    ok = pa.table({"fraction": [0.25, 0.25, 0.25, 0.25]})
    bad = pa.table({"fraction": [0.25, 0.5]})
    pq.write_table(ok, tmp_path / "ok.parquet")
    report = pr.validate_report(rd.read_parquet(str(tmp_path / "ok.parquet")), PizzaSlice)
    assert report.ok
    pq.write_table(bad, tmp_path / "bad.parquet")
    report = pr.validate_report(rd.read_parquet(str(tmp_path / "bad.parquet")), PizzaSlice)
    assert not report.ok
    assert report.errors[0]["msg"] == "2 rows does not match custom constraints."


def test_distributed_referential(ray_session, tmp_path):
    import ray.data as rd

    class Fact(pr.Model):
        fk: int

    t = pa.table({"fk": [1, 2, 3, 99, 98]})
    pq.write_table(t, tmp_path / "f.parquet")
    ds = rd.read_parquet(str(tmp_path / "f.parquet"))
    report = pr.validate_report(ds, Fact, references={"fk": [1, 2, 3]})
    assert not report.ok
    assert report.errors[0]["msg"] == "2 rows with missing referenced keys."


def test_distributed_missing_and_dtype(ray_session, tmp_path):
    import ray.data as rd

    class M(pr.Model):
        a: int
        b: str
        c: datetime.date

    t = pa.table({"a": pa.array(["oops"]), "b": pa.array(["x"])})
    pq.write_table(t, tmp_path / "m.parquet")
    report = pr.validate_report(rd.read_parquet(str(tmp_path / "m.parquet")), M)
    kinds = {(e["loc"], e["type"]) for e in report.errors}
    assert (("c",), "type_error.missingcolumns") in kinds
    assert (("a",), "type_error.columndtype") in kinds


def test_dataset_flags_alias_subset_drop(ray_session, tmp_path):
    import ray.data as rd

    class M(pr.Model):
        model_config = {"alias_generator": str.upper}
        A: int
        B: int = pr.Field(ge=0, le=10)

    t = pa.table({"a": [1, 2], "b": [5, 99], "junk": [0, 0]})
    pq.write_table(t, tmp_path / "t.parquet")
    ds = rd.read_parquet(str(tmp_path / "t.parquet"))

    # alias generator upper-cases data columns; junk dropped; b fails bounds
    rep = pr.validate_report(ds, M, drop_superfluous_columns=True)
    assert not rep.ok
    assert rep.errors == [
        {
            "loc": ("B",),
            "msg": "1 row with out of bound values.",
            "type": "value_error.rowvalue",
        }
    ]
    # column subset skips the failing column
    rep2 = pr.validate_report(
        ds, M, drop_superfluous_columns=True, columns=["A"]
    )
    assert rep2.ok


def test_dataset_collect_samples(ray_session, tmp_path):
    import ray.data as rd

    class M(pr.Model):
        x: float = pr.Field(ge=0)

    t = pa.table({"x": [1.0, -5.0, 2.0, -7.0]})
    pq.write_table(t, tmp_path / "s.parquet")
    rep = pr.validate_report(
        rd.read_parquet(str(tmp_path / "s.parquet")), M, collect_samples=True
    )
    samples = rep.merged.samples[("x", "bounds")]
    assert {r["x"] for r in samples} <= {-5.0, -7.0}
    assert len(samples) >= 1


def test_empty_dataset(ray_session):
    import ray.data as rd

    class M(pr.Model):
        a: int

    ds = rd.from_arrow(pa.table({"a": pa.array([], type=pa.int64())}))
    rep = pr.validate_report(ds, M)
    assert rep.ok and rep.row_count == 0


def test_distributed_struct_recursion(ray_session, tmp_path):
    import ray.data as rd

    class Inner(pr.Model):
        x: int = pr.Field(gt=0)

    class Outer(pr.Model):
        s: Inner
        items: list[Inner]

    t = pa.table(
        {
            "s": [{"x": 1}, {"x": -3}],
            "items": [[{"x": 2}], [{"x": -1}, {"x": 5}]],
        }
    )
    pq.write_table(t, tmp_path / "s.parquet")
    dist = pr.validate_report(rd.read_parquet(str(tmp_path / "s.parquet")), Outer)
    local = pr.validate_report(t, Outer)
    assert {(e["loc"], e["msg"]) for e in dist.errors} == {
        (e["loc"], e["msg"]) for e in local.errors
    }
    assert (("s.x",), "1 row with out of bound values.") in {
        (e["loc"], e["msg"]) for e in dist.errors
    }


def test_enum_message_deterministic():
    # two invalid values must render sorted, independent of hash seed
    class M2(pr.Model):
        z: Literal["ok"]

    t = pa.table({"z": ["bbb", "aaa", "ok"]})
    try:
        M2.validate(t)
    except pr.DataFrameValidationError as e:
        assert e.errors()[0]["msg"] == "Rows with invalid values: {'aaa', 'bbb'}."
