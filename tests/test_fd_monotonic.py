"""fd_violations vs a pure-python reference under arbitrary
partitioning and both merge paths, plus monotonic-audit edge cases."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from patito_ray.validation.stats import fd_violations


def _fd_reference(lhs, rhs):
    per = {}
    for a, b in zip(lhs, rhs):
        if b is None:
            continue
        per.setdefault(a, set()).add(b)
    if not per:
        return (0, 0, 0)
    sizes = [len(s) for s in per.values()]
    return (len(per), sum(1 for s in sizes if s > 1), max(sizes))


@pytest.mark.parametrize("limit_bytes", [None, 0])
def test_fd_violations_reference(ray_session, limit_bytes):
    import ray.data as rd

    rng = np.random.default_rng(7)
    n = 5000
    lhs = rng.integers(0, 400, n).tolist()
    rhs = rng.integers(0, 5, n).tolist()
    # plant some perfectly-determined keys
    lhs += [10_000 + i for i in range(50) for _ in range(3)]
    rhs += [1] * 150
    # and a null-rhs-only key (must not count toward n_keys)
    lhs += [99_999] * 4
    rhs += [None] * 4
    t = pa.table({"a": pa.array(lhs, type=pa.int64()), "b": pa.array(rhs)})
    ds = rd.from_arrow(t).repartition(7)

    kwargs = {} if limit_bytes is None else {"limit_bytes": limit_bytes}
    out = fd_violations(ds, "a", "b", **kwargs)
    assert isinstance(out, pa.Table) and out.num_rows == 1
    got = (
        out.column("n_keys")[0].as_py(),
        out.column("n_violating_keys")[0].as_py(),
        out.column("max_distinct_rhs")[0].as_py(),
    )
    assert got == _fd_reference(lhs, rhs)


def test_fd_violations_empty_and_clean(ray_session):
    import ray.data as rd

    empty = rd.from_arrow(
        pa.table({"a": pa.array([], type=pa.int64()), "b": pa.array([], type=pa.int64())})
    )
    out = fd_violations(empty, "a", "b")
    assert out.column("n_keys")[0].as_py() == 0
    assert out.column("n_violating_keys")[0].as_py() == 0
    assert out.column("max_distinct_rhs")[0].as_py() == 0

    clean = rd.from_arrow(
        pa.table({"a": pa.array([1, 2, 3, 1], type=pa.int64()), "b": pa.array([9, 8, 7, 9])})
    )
    out = fd_violations(clean, "a", "b")
    assert out.column("n_keys")[0].as_py() == 3
    assert out.column("n_violating_keys")[0].as_py() == 0
    assert out.column("max_distinct_rhs")[0].as_py() == 1


def test_monotonic_audit_constructed(ray_session, tmp_path):
    """Constructed events table: known per-user inversion counts; first
    event per user (null lag) never counts as an inversion."""
    import pyarrow.parquet as pq

    from patito_ray.pipelines.queries import q_monotonic_audit

    rows = []
    # user 1: strictly increasing -> 0 inversions
    for i, v in enumerate([1.0, 2.0, 3.0, 4.0]):
        rows.append((i, 1, v))
    # user 2: two dips -> 2 inversions
    for i, v in enumerate([5.0, 3.0, 6.0, 2.0]):
        rows.append((100 + i, 2, v))
    # user 3: single event -> 0 inversions (lag null)
    rows.append((200, 3, 0.5))
    # user 4: flat -> equal is NOT a decrease
    for i, v in enumerate([7.0, 7.0, 7.0]):
        rows.append((300 + i, 4, v))
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "user_id": pa.array([r[1] for r in rows], type=pa.int64()),
            "value": pa.array([r[2] for r in rows], type=pa.float64()),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "events.parquet")
    out = q_monotonic_audit(str(d))
    assert out.column("n_users")[0].as_py() == 4
    assert out.column("n_violating_users")[0].as_py() == 1
    assert out.column("n_inversions")[0].as_py() == 2
