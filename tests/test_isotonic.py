"""Grouped isotonic regression (functions/isotonic.py): PAVA vs the
max-min minimax closed form, monotonicity/mean invariants, driver vs
forced-distributed merge parity."""

import numpy as np
import pyarrow as pa
import pytest

from patito_ray.functions.isotonic import grouped_isotonic, pava


def _maxmin_reference(sums, counts):
    """iso[i] = max_{j<=i} min_{k>=i} mean(y[j..k]) — O(n^3) exact."""
    n = len(sums)
    out = np.empty(n, np.float64)
    for i in range(n):
        best = -np.inf
        for j in range(i + 1):
            mn = np.inf
            for k in range(i, n):
                s = float(sum(int(x) for x in sums[j : k + 1]))
                c = float(sum(int(x) for x in counts[j : k + 1]))
                mn = min(mn, s / c)
            best = max(best, mn)
        out[i] = best
    return out


def test_pava_matches_maxmin_formula():
    rng = np.random.default_rng(11)
    for _ in range(20):
        n = int(rng.integers(1, 12))
        sums = rng.integers(-500, 500, n)
        counts = rng.integers(1, 9, n)
        got = pava(sums, counts)
        ref = _maxmin_reference(sums, counts)
        assert np.array_equal(got, ref), (sums, counts)
        # nondecreasing + weighted-mean preservation
        assert (np.diff(got) >= 0).all()
        assert np.isclose(
            (got * counts).sum(), float(sums.sum()), rtol=1e-12
        )


def test_pava_edges():
    assert pava(np.array([], np.int64), np.array([], np.int64)).size == 0
    assert pava(np.array([7]), np.array([2])).tolist() == [3.5]
    # already monotone: untouched
    assert pava(np.array([1, 4, 9]), np.array([1, 1, 1])).tolist() == [1, 4, 9]
    # fully decreasing: one pool
    assert pava(np.array([9, 4, 1]), np.array([1, 1, 1])).tolist() == [
        14 / 3.0
    ] * 3


def _ds(g, x, y, blocks=4):
    import ray.data as rd

    t = pa.table(
        {
            "g": pa.array(g, pa.string()),
            "x": pa.array(np.asarray(x, np.int64), pa.int64()),
            "y": pa.array(np.asarray(y, np.float64), pa.float64()),
        }
    )
    return rd.from_arrow(t).repartition(blocks)


def test_grouped_isotonic_both_merge_paths(ray_session):
    rng = np.random.default_rng(3)
    n = 3000
    g = rng.choice(["a", "b"], n).tolist()
    x = rng.integers(0, 20, n)
    y = x * 0.5 + rng.normal(0, 2.0, n)

    out_driver = grouped_isotonic(_ds(g, x, y), "g", "x", "y")
    out_dist = grouped_isotonic(_ds(g, x, y), "g", "x", "y", limit_bytes=0)
    assert out_driver.equals(out_dist)

    import polars as pl

    df = pl.from_arrow(out_driver)
    for grp in ("a", "b"):
        sub = df.filter(pl.col("g") == grp).sort("x")
        iso = sub.get_column("iso").to_numpy()
        assert (np.diff(iso) >= 0).all()
        # weighted mean preserved vs the quantized inputs
        nn = sub.get_column("n").to_numpy()
        mask = np.asarray(g) == grp
        q = np.floor(y[mask] * 100.0 + 0.5)
        assert np.isclose((iso * nn).sum() * 100.0, q.sum(), rtol=1e-12)
