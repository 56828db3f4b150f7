"""cvm_test vs a brute-force per-row midrank reference on constructed
tie-heavy samples (both merge paths), plus shift-sensitivity sanity."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from patito_ray.pipelines.queries import q_cvm_test


def _brute(x, y):
    """Anderson's two-sample CvM with midranks, straight from the
    per-row definition (doubled to stay integral)."""
    allv = sorted(list(x) + list(y))

    def r2(v):  # doubled combined midrank
        lo = sum(1 for w in allv if w < v) + 1
        hi = sum(1 for w in allv if w <= v)
        return lo + hi

    def side(sample):
        s = sorted(sample)
        return sum((r2(v) - 2 * (k + 1)) ** 2 for k, v in enumerate(s))

    n, m, bn = len(x), len(y), len(x) + len(y)
    sx, sy = side(x), side(y)
    u4 = n * sx + m * sy
    t = u4 / (4 * bn * n * m) - (4 * n * m - 1) / (6 * bn)
    return n, m, sx, sy, t


def _write_events(tmp_path, x, y):
    types = ["purchase"] * len(x) + ["view"] * len(y)
    vals = [v / 100.0 for v in x] + [v / 100.0 for v in y]
    # one null value and one foreign type must be ignored
    types += ["purchase", "click"]
    vals += [None, 7.77]
    t = pa.table(
        {
            "event_id": pa.array(list(range(len(types))), pa.int64()),
            "event_type": pa.array(types, pa.string()),
            "value": pa.array(vals, pa.float64()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))


@pytest.mark.parametrize("limit_bytes", [None, 0])
def test_cvm_brute_reference(ray_session, tmp_path, limit_bytes):
    rng = np.random.default_rng(17)
    x = rng.integers(0, 30, size=80).tolist()  # heavy ties
    y = rng.integers(5, 35, size=120).tolist()
    _write_events(tmp_path, x, y)
    n, m, sx, sy, t = _brute(x, y)
    out = q_cvm_test(str(tmp_path), limit_bytes=limit_bytes)
    row = out.to_pylist()[0]
    assert (row["n"], row["m"], row["sx"], row["sy"]) == (n, m, sx, sy)
    assert abs(row["cvm_t"] - t) < 2e-6


def test_cvm_shift_sensitivity(ray_session, tmp_path):
    rng = np.random.default_rng(3)
    base = rng.integers(0, 1000, size=500).tolist()
    same = rng.integers(0, 1000, size=500).tolist()
    shifted = (rng.integers(0, 1000, size=500) + 500).tolist()
    _write_events(tmp_path, base, same)
    t_same = q_cvm_test(str(tmp_path)).to_pylist()[0]["cvm_t"]
    _write_events(tmp_path, base, shifted)
    t_shift = q_cvm_test(str(tmp_path)).to_pylist()[0]["cvm_t"]
    # identical distributions hover near 0; a half-range shift explodes T
    assert t_same < 0.5
    assert t_shift > 10 * max(t_same, 0.01)


def test_cvm_degenerate_one_sided(ray_session, tmp_path):
    # one-sided WITH ties: T is undefined but the surviving side's
    # deviation sum must match the per-row definition (the SQL oracle
    # computes it — hardcoding 0 was a review-found divergence)
    x = [5, 5, 1, 2, 3]
    _write_events(tmp_path, x, [])
    out = q_cvm_test(str(tmp_path)).to_pylist()[0]
    assert out["m"] == 0 and out["cvm_t"] is None
    # per-row definition of the surviving side's deviation sum
    allv = sorted(x)
    sx = sum(
        (sum(1 for w in allv if w < v) + 1 + sum(1 for w in allv if w <= v) - 2 * (k + 1)) ** 2
        for k, v in enumerate(sorted(x))
    )
    assert out["sx"] == sx
