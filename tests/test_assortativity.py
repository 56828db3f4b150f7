"""degree_assortativity vs a pure-python reference on constructed
bipartite graphs, through BOTH attach paths (broadcast fast path and
the forced co-partition branch via limit_bytes=0), plus the sf0.001
lineitem graph parity between the two paths."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from patito_ray.functions.graph import degree_assortativity


def _reference(edges):
    es = sorted(set(edges))
    from collections import Counter

    dx = Counter(s for s, _ in es)
    dy = Counter(d for _, d in es)
    m = len(es)
    sx = sum(dx[s] for s, _ in es)
    sy = sum(dy[d] for _, d in es)
    sxy = sum(dx[s] * dy[d] for s, d in es)
    sxx = sum(dx[s] ** 2 for s, _ in es)
    syy = sum(dy[d] ** 2 for _, d in es)
    return m, sx, sy, sxy, sxx, syy


def _run(edges, limit_bytes=None):
    import ray.data as rd

    t = pa.table(
        {
            "src": pa.array([s for s, _ in edges], pa.int64()),
            "dst": pa.array([d for _, d in edges], pa.int64()),
        }
    )
    kw = {} if limit_bytes is None else {"limit_bytes": limit_bytes}
    return degree_assortativity(rd.from_arrow(t), **kw)


@pytest.mark.parametrize("limit_bytes", [None, 0])
def test_assortativity_random_graph(ray_session, limit_bytes):
    rng = np.random.default_rng(11)
    # skewed bipartite graph WITH duplicate raw edges (dedup exercised)
    edges = [
        (int(rng.zipf(1.7) % 50), int(rng.integers(0, 30))) for _ in range(3000)
    ]
    edges += edges[:100]
    out = _run(edges, limit_bytes)
    ref = _reference(edges)
    got = tuple(out.column(c)[0].as_py() for c in ("m", "sx", "sy", "sxy", "sxx", "syy"))
    assert got == ref
    m, sx, sy, sxy, sxx, syy = ref
    num = float(m * sxy - sx * sy)
    den = float(m * sxx - sx * sx) ** 0.5 * float(m * syy - sy * sy) ** 0.5
    expect = num / den
    assert abs(out.column("assortativity")[0].as_py() - expect) < 2e-6


def test_assortativity_degenerate_cases(ray_session):
    # single edge: zero variance on both sides -> null correlation
    out = _run([(1, 2)])
    assert out.column("m")[0].as_py() == 1
    assert out.column("assortativity")[0].as_py() is None
    # perfect star: every edge shares the hub, dst degrees all 1
    out = _run([(7, d) for d in range(5)])
    assert out.column("m")[0].as_py() == 5
    # src degree constant (5), dst degree constant (1): zero variance
    assert out.column("assortativity")[0].as_py() is None


def test_assortativity_paths_agree(ray_session):
    from patito_ray.pipelines.queries import q_degree_assortativity

    a = q_degree_assortativity("/root/testdata/sf0.001")
    b = q_degree_assortativity("/root/testdata/sf0.001", limit_bytes=0)
    assert a.to_pylist() == b.to_pylist()
