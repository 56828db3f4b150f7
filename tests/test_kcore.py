"""k_core vs a pure-python peeling reference."""

from __future__ import annotations

import random

import pyarrow as pa
import pytest

from patito_ray.functions.graph import k_core


def _ref_kcore(edges: list[tuple[int, int]], k: int) -> set[int]:
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for m in adj.pop(n):
                    adj[m].discard(n)
                changed = True
    return set(adj)


def _run(edges, k):
    import ray.data as rd

    t = pa.table(
        {
            "src": pa.array([e[0] for e in edges], type=pa.int64()),
            "dst": pa.array([e[1] for e in edges], type=pa.int64()),
        }
    )
    out = k_core(rd.from_arrow(t).repartition(4), k)
    return {r["node"] for r in out.take_all()}


@pytest.mark.parametrize("k", [2, 3, 4])
def test_k_core_random_graph(ray_session, k):
    rng = random.Random(5)
    edges = [(rng.randint(0, 60), rng.randint(0, 60)) for _ in range(150)]
    # planted 6-clique on fresh nodes (survives any k <= 5)
    cl = list(range(100, 106))
    edges += [(a, b) for i, a in enumerate(cl) for b in cl[i + 1 :]]
    # a pendant chain that always peels away
    edges += [(200, 201), (201, 202)]
    assert _run(edges, k) == _ref_kcore(edges, k)


def test_k_core_duplicate_and_self_edges(ray_session):
    # multi-edges must not inflate degree; self-loops ignored
    edges = [(1, 2), (2, 1), (1, 2), (1, 1), (2, 3), (3, 1)]
    assert _run(edges, 2) == {1, 2, 3}
    assert _run(edges, 3) == set()


def test_k_core_guards(ray_session):
    import ray.data as rd

    t = pa.table({"src": pa.array([1], type=pa.int64()), "dst": pa.array([2], type=pa.int64())})
    with pytest.raises(ValueError, match="k must be"):
        k_core(rd.from_arrow(t), 0)


def test_k_core_big_frontier_anti_path(ray_session, monkeypatch):
    """Force the co-partitioned anti branch (frontier 'too big' to
    broadcast) and assert it matches the broadcast path's result."""
    import patito_ray.functions.graph as graph

    rng = random.Random(11)
    edges = [(rng.randint(0, 80), rng.randint(0, 80)) for _ in range(260)]
    cl = list(range(200, 207))
    edges += [(a, b) for i, a in enumerate(cl) for b in cl[i + 1 :]]
    want = _ref_kcore(edges, 3)
    assert _run(edges, 3) == want  # broadcast path
    monkeypatch.setattr(graph, "_KCORE_BROADCAST_IDS", 0)
    assert _run(edges, 3) == want  # anti path
