import numpy as np
import pyarrow as pa
import pytest

import patito_ray as pr
from patito_ray.exceptions import DataFrameValidationError
from patito_ray.validation.engine import validate, validate_report


class M(pr.Model):
    k: int = pr.Field(unique=True)
    v: float = pr.Field(ge=0.0)


def _tbl(n=1000, n_bad=20, n_dup=5):
    k = np.arange(n, dtype=np.int64)
    k[:n_dup] = 999_000  # duplicated key block
    v = np.ones(n)
    v[:n_bad] = -1.0     # out of bounds
    return pa.table({"k": pa.array(k), "v": pa.array(v)})


def test_waive_passes_within_tolerance(ray_session):
    import ray.data as rd

    t = _tbl()
    # 2% bounds violations, 0.5% duplicate rows
    with pytest.raises(DataFrameValidationError):
        validate(rd.from_arrow(t).repartition(4), M)
    out = validate(
        rd.from_arrow(t).repartition(4),
        M,
        tolerances={"v": 0.05, "k": 0.01},
    )
    assert out.count() == 1000

    # tighter threshold on v still fails, and the error names v
    with pytest.raises(DataFrameValidationError, match="v"):
        validate(
            rd.from_arrow(t).repartition(4),
            M,
            tolerances={"v": 0.01, "k": 0.01},
        )

    # "*" default applies to every loc
    assert validate(rd.from_arrow(t), M, tolerances={"*": 0.05}).count() == 1000


def test_waive_report_bookkeeping(ray_session):
    import ray.data as rd

    rep = validate_report(rd.from_arrow(_tbl()).repartition(3), M)
    assert not rep.ok
    waived = rep.waive(M, {"*": 0.05})
    assert waived.ok and waived.errors == []
    got = {(w["loc"], w["kind"]): w["count"] for w in waived.waived}
    assert got[("v", "bounds")] == 20
    assert got[("k", "duplicate")] == 5
    for w in waived.waived:
        assert w["fraction"] == w["count"] / 1000
    # original report untouched
    assert not rep.ok and rep.waived is None

    # boundary is inclusive: exactly 2% tolerated at 0.02
    assert rep.waive(M, {"v": 0.02, "k": 0.005}).ok


def test_waive_never_hides_structural_errors(ray_session):
    import ray.data as rd

    t = pa.table({"k": pa.array([1, 2], pa.int64())})  # v missing entirely
    rep = validate_report(rd.from_arrow(t), M)
    waived = rep.waive(M, {"*": 1.0})
    assert not waived.ok
    assert any(e["type"] == "type_error.missingcolumns" for e in waived.errors)

    with pytest.raises(ValueError, match="must be in"):
        rep.waive(M, {"v": 1.5})
