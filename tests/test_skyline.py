"""skyline_2d vs a brute-force O(n^2) dominance reference, through
both the driver-merge and the forced-distributed fold branch."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from patito_ray.functions.skyline import _skyline_mask, skyline_2d


def _brute(mn: np.ndarray, mx: np.ndarray) -> np.ndarray:
    n = len(mn)
    keep = np.ones(n, dtype=bool)
    for i in range(n):
        dominated = (
            (mn <= mn[i]) & (mx >= mx[i]) & ((mn < mn[i]) | (mx > mx[i]))
        )
        keep[i] = not dominated.any()
    return keep


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_mask_matches_bruteforce(seed):
    rng = np.random.default_rng(seed)
    n = 400
    mn = rng.integers(0, 50, n)
    mx = rng.integers(0, 50, n)  # small range -> many ties
    got = _skyline_mask(mn.astype(np.int64), mx.astype(np.int64))
    np.testing.assert_array_equal(got, _brute(mn, mx))


def test_mask_ties_all_survive():
    # identical points never dominate each other
    mn = np.array([5, 5, 5], dtype=np.int64)
    mx = np.array([7, 7, 7], dtype=np.int64)
    assert _skyline_mask(mn, mx).all()


def test_mask_empty():
    assert _skyline_mask(np.array([], np.int64), np.array([], np.int64)).shape == (0,)


@pytest.mark.parametrize("limit_bytes", [256 << 20, 0])
def test_skyline_2d_dataset(ray_session, limit_bytes):
    import ray.data as rd

    rng = np.random.default_rng(7)
    n = 5000
    mn = rng.integers(0, 1000, n).astype(np.int64)
    mx = rng.integers(0, 1000, n).astype(np.int64)
    ids = np.arange(n, dtype=np.int64)
    ds = rd.from_arrow(
        pa.table({"id": ids, "cost": mn, "gain": mx})
    ).repartition(8)
    out = skyline_2d(ds, "cost", "gain", limit_bytes=limit_bytes)
    assert isinstance(out, pa.Table)
    expect = set(ids[_brute(mn, mx)].tolist())
    got = set(out.column("id").to_pylist())
    assert got == expect


def test_skyline_rejects_nulls(ray_session):
    import ray.data as rd

    t = pa.table(
        {"a": pa.array([1, None], pa.int64()), "b": pa.array([2, 3], pa.int64())}
    )
    with pytest.raises(Exception, match="null"):
        skyline_2d(rd.from_arrow(t), "a", "b")


def test_skyline_rejects_float(ray_session):
    import ray.data as rd

    t = pa.table({"a": pa.array([1.5, 2.0]), "b": pa.array([1, 2], pa.int64())})
    with pytest.raises(TypeError, match="integer"):
        skyline_2d(rd.from_arrow(t), "a", "b")
