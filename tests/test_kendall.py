"""Kendall kernels vs brute force (random + adversarial tie shapes),
and grouped_kendall through BOTH merge paths."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from patito_ray.functions.kendall import (
    count_inversions,
    grouped_kendall,
    kendall_counts,
    tau_b,
)


def _brute_counts(x, y):
    n = len(x)
    c = d = tx = ty = txy = 0
    for i in range(n):
        for j in range(i + 1, n):
            dx, dy = x[i] - x[j], y[i] - y[j]
            if dx == 0 and dy == 0:
                txy += 1
            elif dx == 0:
                tx += 1
            elif dy == 0:
                ty += 1
            elif (dx > 0) == (dy > 0):
                c += 1
            else:
                d += 1
    return dict(n=n, concordant=c, discordant=d, ties_x=tx, ties_y=ty, ties_xy=txy)


def test_count_inversions_brute():
    rng = np.random.default_rng(0)
    for _ in range(200):
        n = int(rng.integers(0, 70))
        y = rng.integers(-5, 6, size=n)
        brute = sum(1 for i in range(n) for j in range(i + 1, n) if y[i] > y[j])
        assert count_inversions(y) == brute


def test_count_inversions_edges():
    assert count_inversions(np.array([], dtype=np.int64)) == 0
    assert count_inversions(np.array([3])) == 0
    assert count_inversions(np.array([1, 1, 1, 1])) == 0  # ties are not inversions
    assert count_inversions(np.arange(100)) == 0
    assert count_inversions(np.arange(100)[::-1].copy()) == 100 * 99 // 2
    # int64 extremes survive the sentinel padding
    big = np.array([np.iinfo(np.int64).max - 1, np.iinfo(np.int64).min, 0])
    assert count_inversions(big) == 2


def test_kendall_counts_brute():
    rng = np.random.default_rng(1)
    for _ in range(200):
        n = int(rng.integers(0, 45))
        x = rng.integers(-3, 4, size=n)
        y = rng.integers(-3, 4, size=n)
        assert kendall_counts(x, y) == _brute_counts(x, y)


def test_tau_b_degenerate():
    # all-x-tied group: zero x variance -> undefined tau
    counts = kendall_counts(np.zeros(5, dtype=np.int64), np.arange(5))
    assert tau_b(counts) is None
    # perfect concordance / discordance hit exactly +-1
    counts = kendall_counts(np.arange(10), np.arange(10) * 3)
    assert tau_b(counts) == 1.0
    counts = kendall_counts(np.arange(10), -np.arange(10))
    assert tau_b(counts) == -1.0


@pytest.mark.parametrize("limit_bytes", [None, 0])
def test_grouped_kendall_paths(ray_session, limit_bytes):
    import ray.data as rd

    rng = np.random.default_rng(7)
    n = 4000
    key = rng.integers(0, 4, size=n)
    x = rng.integers(0, 25, size=n)
    y = rng.integers(0, 50, size=n)
    # null x/y rows must drop like SQL aggregates
    xa = x.astype(object)
    xa[0] = None
    t = pa.table(
        {
            "k": pa.array(key, pa.int64()),
            "x": pa.array(list(xa), pa.int64()),
            "y": pa.array(y, pa.int64()),
        }
    )
    out = grouped_kendall(
        rd.from_arrow(t),
        by="k",
        x="x",
        y="y",
        **({} if limit_bytes is None else {"limit_bytes": limit_bytes}),
    )
    if not isinstance(out, pa.Table):
        out = pa.concat_tables(
            [b for b in out.iter_batches(batch_format="pyarrow") if b.num_rows]
        )
    cols = ("n", "concordant", "discordant", "ties_x", "ties_y", "ties_xy")
    got = {r["k"]: {c: r[c] for c in cols} for r in out.to_pylist()}
    for kv in range(4):
        # row 0 has a null x and must be excluded, like SQL aggregates
        mask = (key == kv) & (np.arange(n) != 0)
        ref = kendall_counts(x[mask], y[mask])  # kernel brute-verified above
        assert got[kv] == {c: ref[c] for c in cols}


def _brute_rank2(a):
    return [int((a < v).sum()) + 1 + int((a <= v).sum()) for v in a]


def test_avg_rank2_brute():
    from patito_ray.functions.kendall import avg_rank2

    rng = np.random.default_rng(5)
    for _ in range(200):
        n = int(rng.integers(0, 50))
        a = rng.integers(-4, 5, size=n)
        assert avg_rank2(a).tolist() == _brute_rank2(a)


def test_spearman_moments_overflow_guard():
    from patito_ray.functions.kendall import spearman_moments

    with pytest.raises(ValueError, match="group too large"):
        spearman_moments(
            np.zeros(1_300_001, dtype=np.int8), np.zeros(1_300_001, dtype=np.int8)
        )


@pytest.mark.parametrize("limit_bytes", [None, 0])
def test_grouped_spearman_paths(ray_session, limit_bytes):
    import ray.data as rd

    from patito_ray.functions.kendall import grouped_spearman, spearman_moments, spearman_rho

    rng = np.random.default_rng(9)
    n = 3000
    key = rng.integers(0, 3, size=n)
    x = rng.integers(0, 20, size=n)  # tie-heavy
    y = rng.integers(0, 500, size=n)
    t = pa.table(
        {
            "k": pa.array(key, pa.int64()),
            "x": pa.array(x, pa.int64()),
            "y": pa.array(y, pa.int64()),
        }
    )
    out = grouped_spearman(
        rd.from_arrow(t),
        by="k",
        x="x",
        y="y",
        **({} if limit_bytes is None else {"limit_bytes": limit_bytes}),
    )
    if not isinstance(out, pa.Table):
        out = pa.concat_tables(
            [b for b in out.iter_batches(batch_format="pyarrow") if b.num_rows]
        )
    got = {r["k"]: r for r in out.to_pylist()}
    for kv in range(3):
        xs, ys = x[key == kv], y[key == kv]
        m = spearman_moments(xs, ys)
        assert got[kv]["n"] == m["n"]
        assert got[kv]["sxy"] == m["sxy"]
        assert got[kv]["sxx"] == m["sxx"]
        assert got[kv]["syy"] == m["syy"]
        assert got[kv]["rho"] == spearman_rho(m)
        # float cross-check: pearson of float midranks
        rx = np.array(_brute_rank2(xs), dtype=np.float64)
        ry = np.array(_brute_rank2(ys), dtype=np.float64)
        ref = np.corrcoef(rx, ry)[0, 1]
        assert abs(got[kv]["rho"] - ref) < 1e-6


def test_query_grid_drops_null_values(ray_session, tmp_path):
    """A null events.value must DROP the row (SQL aggregate semantics),
    not become NaN -> garbage int64 (the review-found latent bug)."""
    import pyarrow.parquet as pq

    from patito_ray.pipelines.queries import q_kendall_tau, q_spearman_corr

    t = pa.table(
        {
            "event_id": pa.array(list(range(6)), pa.int64()),
            "event_type": pa.array(["a"] * 6, pa.string()),
            "ts": pa.array([10, 20, 30, 40, 50, 60], pa.timestamp("us")),
            "value": pa.array([1.0, 2.0, None, 3.0, 4.0, 5.0], pa.float64()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = q_kendall_tau(str(tmp_path))
    if not isinstance(out, pa.Table):
        out = pa.concat_tables(
            [b for b in out.iter_batches(batch_format="pyarrow") if b.num_rows]
        )
    row = out.to_pylist()[0]
    assert row["n"] == 5  # null row gone
    # the 5 remaining rows are perfectly concordant
    assert row["concordant"] == 10 and row["discordant"] == 0
    assert row["tau_b"] == 1.0

    sp = q_spearman_corr(str(tmp_path))
    if not isinstance(sp, pa.Table):
        sp = pa.concat_tables(
            [b for b in sp.iter_batches(batch_format="pyarrow") if b.num_rows]
        )
    srow = sp.to_pylist()[0]
    assert srow["n"] == 5 and srow["rho"] == 1.0


def test_triangle_count_with_wedges(ray_session):
    import ray.data as rd

    from patito_ray.functions.graph import triangle_count

    # triangle + tail: T=1, degrees (2,2,3,1) -> wedges 1+1+3+0 = 5
    edges = [(0, 1), (1, 2), (2, 0), (2, 3)]
    t = pa.table(
        {
            "src": pa.array([a for a, _ in edges], pa.int64()),
            "dst": pa.array([b for _, b in edges], pa.int64()),
        }
    )
    for lb in (None, 0):
        kw = {} if lb is None else {"limit_bytes": lb}
        out = triangle_count(rd.from_arrow(t), with_wedges=True, **kw)
        assert out.column("triangles")[0].as_py() == 1
        assert out.column("wedges")[0].as_py() == 5
    # empty graph
    e = pa.schema([("src", pa.int64()), ("dst", pa.int64())]).empty_table()
    out = triangle_count(rd.from_arrow(e), with_wedges=True)
    assert out.column("wedges")[0].as_py() == 0
