"""Graph operators: PageRank + connected components (functions/graph.py).

Both adaptive paths of each operator are exercised: the driver fast
path (default 256 MB limit) and the distributed exchange path forced
via ``limit_bytes=0`` — per the house rule that a null/merge bug on
the distributed branch only surfaces when the limit forces it.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _edges_ds(src, dst, blocks=3):
    import ray.data as rd

    t = pa.table(
        {
            "src": pa.array(np.asarray(src, dtype=np.int64), type=pa.int64()),
            "dst": pa.array(np.asarray(dst, dtype=np.int64), type=pa.int64()),
        }
    )
    return rd.from_arrow(t).repartition(blocks)


def _rand_graph(n=60, m=240, seed=7):
    rng = np.random.default_rng(seed)
    return rng.integers(0, n, m), rng.integers(0, n, m)


def _pr_reference(src, dst, iters, d):
    """Independent dense-matrix PageRank for cross-checking."""
    nodes = np.unique(np.concatenate([src, dst]))
    n = len(nodes)
    idx = {v: i for i, v in enumerate(nodes)}
    a = np.zeros((n, n))
    outdeg = np.zeros(n)
    for s in src:
        outdeg[idx[s]] += 1
    for s, t in zip(src, dst):
        a[idx[t], idx[s]] += 1.0 / outdeg[idx[s]]
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dangling = r[outdeg == 0].sum()
        r = (1 - d) / n + d * (a @ r + dangling / n)
    return nodes, r


def _to_table(res):
    import ray.data

    if isinstance(res, pa.Table):
        return res
    assert isinstance(res, ray.data.Dataset)
    return pa.concat_tables(
        [b for b in res.iter_batches(batch_format="pyarrow") if b.num_rows]
    )


def test_pagerank_matches_dense_reference(ray_session):
    from patito_ray.functions.graph import pagerank

    src, dst = _rand_graph()
    t = _to_table(pagerank(_edges_ds(src, dst), num_iters=4, damping=0.85))
    nodes, ref = _pr_reference(src, dst, 4, 0.85)
    got = dict(zip(t.column("node").to_pylist(), t.column("pr").to_pylist()))
    assert sorted(got) == nodes.tolist()
    np.testing.assert_allclose([got[v] for v in nodes], ref, rtol=1e-12)
    # total rank mass conserved (dangling mass redistributed, not lost)
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_distributed_matches_driver(ray_session):
    from patito_ray.functions.graph import pagerank

    src, dst = _rand_graph(n=80, m=400, seed=11)
    drv = pagerank(_edges_ds(src, dst), num_iters=3)
    assert isinstance(drv, pa.Table)
    dist = _to_table(
        pagerank(_edges_ds(src, dst), num_iters=3, limit_bytes=0, num_partitions=4)
    )
    d = dict(zip(drv.column("node").to_pylist(), drv.column("pr").to_pylist()))
    g = dict(zip(dist.column("node").to_pylist(), dist.column("pr").to_pylist()))
    assert sorted(d) == sorted(g)
    np.testing.assert_allclose(
        [g[k] for k in sorted(d)], [d[k] for k in sorted(d)], rtol=1e-12
    )


def test_pagerank_distributed_broadcast_branch(ray_session):
    """Mid limit: edges exceed it (distributed outer loop) but the
    merged contribution table fits (driver broadcast finalize)."""
    from patito_ray.functions.graph import pagerank

    src, dst = _rand_graph(n=50, m=3000, seed=3)
    drv = pagerank(_edges_ds(src, dst), num_iters=2)
    # edges = 3000 rows * 16 B = 48 kB > 4 kB; contribs = <=50 rows
    dist = _to_table(
        pagerank(_edges_ds(src, dst), num_iters=2, limit_bytes=4096, num_partitions=4)
    )
    d = dict(zip(drv.column("node").to_pylist(), drv.column("pr").to_pylist()))
    g = dict(zip(dist.column("node").to_pylist(), dist.column("pr").to_pylist()))
    np.testing.assert_allclose(
        [g[k] for k in sorted(d)], [d[k] for k in sorted(d)], rtol=1e-12
    )


def test_pagerank_dangling_and_zero_iters(ray_session):
    from patito_ray.functions.graph import pagerank

    # 0 -> 1 -> 2, node 2 dangles; universe has 3 nodes
    t = pagerank(_edges_ds([0, 1], [1, 2], blocks=1), num_iters=0)
    assert t.column("pr").to_pylist() == pytest.approx([1 / 3] * 3)
    t1 = pagerank(_edges_ds([0, 1], [1, 2], blocks=1), num_iters=1, damping=0.85)
    got = dict(zip(t1.column("node").to_pylist(), t1.column("pr").to_pylist()))
    base = 0.15 / 3
    dang = (1 / 3) / 3  # node 2's mass spread over 3 nodes
    assert got[0] == pytest.approx(base + 0.85 * dang)
    assert got[1] == pytest.approx(base + 0.85 * (1 / 3 + dang))
    assert got[2] == pytest.approx(base + 0.85 * (1 / 3 + dang))
    assert sum(got.values()) == pytest.approx(1.0)


def test_pagerank_validation_errors(ray_session):
    import ray.data as rd

    from patito_ray.functions.graph import pagerank

    edges = _edges_ds([0], [1], blocks=1)
    with pytest.raises(ValueError, match="num_iters"):
        pagerank(edges, num_iters=-1)
    with pytest.raises(ValueError, match="damping"):
        pagerank(edges, damping=1.0)
    with pytest.raises(ValueError, match="graph edges"):
        pagerank(rd.from_arrow(pa.table({"src": pa.array([0], pa.int64())})))
    bad = rd.from_arrow(
        pa.table({"src": pa.array(["a"]), "dst": pa.array(["b"])})
    )
    with pytest.raises(TypeError, match="int64"):
        pagerank(bad)


def test_pagerank_empty_edges(ray_session):
    import ray.data as rd

    from patito_ray.functions.graph import pagerank

    empty = rd.from_arrow(
        pa.schema([("src", pa.int64()), ("dst", pa.int64())]).empty_table()
    )
    t = pagerank(empty)
    assert t.num_rows == 0 and t.column_names == ["node", "pr"]


def test_connected_components_both_paths(ray_session):
    from patito_ray.functions.graph import connected_components

    # components {0,1,2,3}, {10,11}, plus isolated via self-loop {20}
    src = [0, 1, 2, 10, 20]
    dst = [1, 2, 3, 11, 20]
    expect = {0: 0, 1: 0, 2: 0, 3: 0, 10: 10, 11: 10, 20: 20}
    drv = connected_components(_edges_ds(src, dst))
    assert isinstance(drv, pa.Table)
    got = dict(zip(drv.column("node").to_pylist(), drv.column("root").to_pylist()))
    assert got == expect
    dist = _to_table(
        connected_components(_edges_ds(src, dst), limit_bytes=0, num_partitions=4)
    )
    got_d = dict(zip(dist.column("node").to_pylist(), dist.column("root").to_pylist()))
    assert got_d == expect


def test_connected_components_random_parity(ray_session):
    from patito_ray.functions.graph import connected_components

    # m ~ 2.5n keeps component diameters O(log n): each propagation
    # round is a full exchange, so a sparse long-chain graph would turn
    # this into a minutes-long test without adding coverage
    src, dst = _rand_graph(n=60, m=150, seed=23)
    drv = connected_components(_edges_ds(src, dst))
    dist = _to_table(
        connected_components(_edges_ds(src, dst), limit_bytes=0, num_partitions=4)
    )
    d = dict(zip(drv.column("node").to_pylist(), drv.column("root").to_pylist()))
    g = dict(zip(dist.column("node").to_pylist(), dist.column("root").to_pylist()))
    assert d == g


# ---------------- triangle counting ----------------


def _tri_reference(edge_list):
    adj = {}
    edges = set()
    for a, b in edge_list:
        if a == b:
            continue
        lo, hi = min(a, b), max(a, b)
        if (lo, hi) in edges:
            continue
        edges.add((lo, hi))
        adj.setdefault(lo, set()).add(hi)
        adj.setdefault(hi, set()).add(lo)
    tri = 0
    for a, b in edges:
        tri += len(adj[a] & adj[b])
    return len(edges), tri // 3


def _tri_edges_ds(edge_list, nblocks=4):
    import ray.data as rd

    t = pa.table(
        {
            "src": pa.array([a for a, _ in edge_list], type=pa.int64()),
            "dst": pa.array([b for _, b in edge_list], type=pa.int64()),
        }
    )
    return rd.from_arrow(t).repartition(nblocks)


@pytest.mark.parametrize("limit_bytes", [256 << 20, 0])
def test_triangle_count_known_graphs(ray_session, limit_bytes):
    from patito_ray.functions.graph import triangle_count

    # K5: C(5,3)=10 triangles, 10 edges — with dups/reverses/self-loops
    k5 = [(a, b) for a in range(5) for b in range(5) if a != b] + [(3, 3)]
    out = triangle_count(_tri_edges_ds(k5), limit_bytes=limit_bytes)
    assert out.column("triangles").to_pylist() == [10]
    assert out.column("n_edges").to_pylist() == [10]

    # star graph: hot hub, zero triangles
    star = [(0, i) for i in range(1, 50)]
    out = triangle_count(_tri_edges_ds(star), limit_bytes=limit_bytes)
    assert out.column("triangles").to_pylist() == [0]
    assert out.column("n_edges").to_pylist() == [49]


def test_triangle_count_random_reference(ray_session):
    from patito_ray.functions.graph import triangle_count

    rng = np.random.default_rng(42)
    edge_list = [tuple(map(int, e)) for e in rng.integers(0, 60, size=(800, 2))]
    n_edges, tri = _tri_reference(edge_list)
    out = triangle_count(_tri_edges_ds(edge_list, nblocks=6))
    assert out.column("n_edges").to_pylist() == [n_edges]
    assert out.column("triangles").to_pylist() == [tri]


def test_triangle_count_empty_and_bad_ids(ray_session):
    from patito_ray.functions.graph import triangle_count

    out = triangle_count(_tri_edges_ds([(1, 1)]))
    assert out.column("triangles").to_pylist() == [0]

    with pytest.raises(Exception):
        triangle_count(_tri_edges_ds([(1, 1 << 33), (2, 1 << 33), (1, 2)]))


# ---------------------------------------------------------------- bfs_hops


def _bfs_reference(src, dst, seeds, max_hops):
    """Dict node -> min hop distance, plain python BFS."""
    adj = {}
    for s, d in zip(src, dst):
        adj.setdefault(int(s), []).append(int(d))
    dist = {int(s): 0 for s in seeds}
    frontier = list(dist)
    for h in range(1, max_hops + 1):
        nxt = []
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = h
                    nxt.append(v)
        frontier = nxt
    return dist


def _bfs_out(res):
    rows = res.take_all()
    return {r["node"]: r["dist"] for r in rows}


def test_bfs_hops_matches_reference_both_branches(ray_session):
    import ray.data as rd

    from patito_ray.functions.graph import bfs_hops

    rng = np.random.default_rng(11)
    src = rng.integers(0, 80, size=400)
    dst = rng.integers(0, 80, size=400)
    seeds = [0, 7, 33]
    ref = _bfs_reference(src, dst, seeds, max_hops=3)

    edges = _edges_ds(src, dst, blocks=4)
    seeds_ds = rd.from_arrow(pa.table({"node": pa.array(seeds, pa.int64())}))

    got_driver = _bfs_out(bfs_hops(edges, seeds_ds, max_hops=3))
    assert got_driver == ref

    # broadcast_limit_ids=0 forces the co-partitioned distributed branch
    got_dist = _bfs_out(
        bfs_hops(edges, seeds_ds, max_hops=3, broadcast_limit_ids=0)
    )
    assert got_dist == ref


def test_bfs_hops_edge_cases(ray_session):
    import ray.data as rd

    from patito_ray.functions.graph import bfs_hops

    edges = _edges_ds([1, 2], [2, 3], blocks=2)
    seeds_ds = rd.from_arrow(pa.table({"node": pa.array([1], pa.int64())}))
    # max_hops=0: seeds only
    assert _bfs_out(bfs_hops(edges, seeds_ds, max_hops=0)) == {1: 0}
    # unreachable seeds / empty frontier termination
    lone = rd.from_arrow(pa.table({"node": pa.array([99], pa.int64())}))
    assert _bfs_out(bfs_hops(edges, lone, max_hops=5)) == {99: 0}
    with pytest.raises(ValueError):
        bfs_hops(edges, seeds_ds, max_hops=-1)


# ------------------------------------------------------- basket pairs


def test_cooccurrence_pairs_both_branches(ray_session):
    import itertools

    import ray.data as rd

    from patito_ray.functions.basket import cooccurrence_pairs

    rng = np.random.default_rng(5)
    g = rng.integers(0, 50, size=600)
    i = rng.integers(0, 20, size=600)
    # plain-python reference: distinct items per group, all pairs
    ref: dict = {}
    groups: dict = {}
    for gg, ii in zip(g.tolist(), i.tolist()):
        groups.setdefault(gg, set()).add(ii)
    for its in groups.values():
        for a, b in itertools.combinations(sorted(its), 2):
            ref[(a, b)] = ref.get((a, b), 0) + 1
    ref = {k: v for k, v in ref.items() if v >= 2}

    ds = rd.from_arrow(
        pa.table(
            {"grp": pa.array(g, pa.int64()), "item": pa.array(i, pa.int64())}
        )
    ).repartition(5)

    def out(res):
        if not isinstance(res, pa.Table):
            rows = res.take_all()
            return {(r["item_a"], r["item_b"]): r["n_groups"] for r in rows}
        return dict(
            zip(
                zip(
                    res.column("item_a").to_pylist(),
                    res.column("item_b").to_pylist(),
                ),
                res.column("n_groups").to_pylist(),
            )
        )

    res_driver = cooccurrence_pairs(ds, "grp", "item", min_count=2)
    assert isinstance(res_driver, pa.Table)
    assert out(res_driver) == ref

    res_dist = cooccurrence_pairs(ds, "grp", "item", min_count=2, limit_bytes=0)
    assert not isinstance(res_dist, pa.Table)
    assert out(res_dist) == ref

    with pytest.raises(ValueError):
        cooccurrence_pairs(ds, "grp", "item", min_count=0)


def test_cooccurrence_pairs_rejects_string_keys(ray_session):
    import ray.data as rd

    from patito_ray.functions.basket import cooccurrence_pairs

    t = pa.table({"grp": pa.array(["a"]), "item": pa.array([1], pa.int64())})
    with pytest.raises(TypeError, match="integer"):
        cooccurrence_pairs(rd.from_arrow(t), "grp", "item")


def test_association_rules_both_branches(ray_session):
    import itertools

    import ray.data as rd

    from patito_ray.functions.basket import association_rules

    rng = np.random.default_rng(11)
    groups, items = [], []
    baskets = {}
    for g in range(60):
        basket = sorted(rng.choice(25, size=rng.integers(1, 6), replace=False))
        baskets[g] = set(int(x) for x in basket)
        for it in basket:
            # duplicates within a basket must not inflate counts
            for _ in range(int(rng.integers(1, 3))):
                groups.append(g)
                items.append(int(it))
    t = pa.table(
        {"g": pa.array(groups, pa.int64()), "i": pa.array(items, pa.int64())}
    )
    # python reference
    N = len(baskets)
    icnt: dict[int, int] = {}
    pcnt: dict[tuple[int, int], int] = {}
    for b in baskets.values():
        for it in b:
            icnt[it] = icnt.get(it, 0) + 1
        for a, c in itertools.combinations(sorted(b), 2):
            pcnt[(a, c)] = pcnt.get((a, c), 0) + 1
    expect = {}
    for (a, c), nab in pcnt.items():
        if nab < 2:
            continue
        for ante, cons in ((a, c), (c, a)):
            expect[(ante, cons)] = (
                nab,
                icnt[ante],
                icnt[cons],
                nab / N,
                nab / icnt[ante],
                (nab * N) / (icnt[ante] * icnt[cons]),
            )

    ds = rd.from_arrow(t).repartition(7)
    for lb in (None, 0):
        out = association_rules(ds, "g", "i", min_pair_count=2, limit_bytes=lb)
        if not isinstance(out, pa.Table):
            import ray

            tabs = [x for x in ray.get(out.to_arrow_refs()) if x.num_rows]
            out = pa.concat_tables(tabs) if tabs else pa.table({})
        got = {
            (r["ante"], r["cons"]): (
                r["n_ab"],
                r["n_ante"],
                r["n_cons"],
                r["support"],
                r["confidence"],
                r["lift"],
            )
            for r in out.to_pylist()
        }
        assert got == expect, f"limit_bytes={lb}"


def test_association_rules_rejects_string_keys(ray_session):
    import ray.data as rd

    from patito_ray.functions.basket import association_rules

    t = pa.table({"g": ["a"], "i": pa.array([1], pa.int64())})
    with pytest.raises(TypeError, match="integer"):
        association_rules(rd.from_arrow(t), "g", "i")


# ---------------------------------------------------------------- sssp_hops


def _wedges_ds(src, dst, w, blocks=3):
    import ray.data as rd

    t = pa.table(
        {
            "src": pa.array(np.asarray(src, dtype=np.int64), type=pa.int64()),
            "dst": pa.array(np.asarray(dst, dtype=np.int64), type=pa.int64()),
            "w": pa.array(np.asarray(w, dtype=np.int64), type=pa.int64()),
        }
    )
    return rd.from_arrow(t).repartition(blocks)


def _sssp_reference(src, dst, w, seeds, max_hops):
    """Dict node -> min total weight within max_hops edges (plain
    Bellman-Ford over hop-indexed best tables)."""
    best = {int(s): 0 for s in seeds}
    frontier = dict(best)
    for _ in range(max_hops):
        nxt = {}
        for s, d, wt in zip(src, dst, w):
            s, d, wt = int(s), int(d), int(wt)
            if s in frontier:
                c = frontier[s] + wt
                if c < best.get(d, c + 1):
                    if c < nxt.get(d, c + 1):
                        nxt[d] = c
        for n, c in nxt.items():
            best[n] = c
        frontier = nxt
        if not frontier:
            break
    return best


def test_sssp_hops_matches_reference_both_branches(ray_session):
    import ray.data as rd

    from patito_ray.functions.graph import sssp_hops

    rng = np.random.default_rng(23)
    src = rng.integers(0, 70, size=360)
    dst = rng.integers(0, 70, size=360)
    w = rng.integers(1, 10, size=360)
    seeds = [0, 9, 41]
    ref = _sssp_reference(src, dst, w, seeds, max_hops=4)

    edges = _wedges_ds(src, dst, w, blocks=4)
    seeds_ds = rd.from_arrow(pa.table({"node": pa.array(seeds, pa.int64())}))

    got_driver = _bfs_out(sssp_hops(edges, seeds_ds, max_hops=4))
    assert got_driver == ref

    got_dist = _bfs_out(
        sssp_hops(edges, seeds_ds, max_hops=4, broadcast_limit_ids=0)
    )
    assert got_dist == ref


def test_sssp_hops_improvement_rounds(ray_session):
    """A later round must LOWER an already-reached node's distance:
    1 -(10)-> 3 direct, but 1 -(1)-> 2 -(1)-> 3 is cheaper."""
    import ray.data as rd

    from patito_ray.functions.graph import sssp_hops

    edges = _wedges_ds([1, 1, 2], [3, 2, 3], [10, 1, 1], blocks=2)
    seeds_ds = rd.from_arrow(pa.table({"node": pa.array([1], pa.int64())}))
    assert _bfs_out(sssp_hops(edges, seeds_ds, max_hops=1)) == {1: 0, 3: 10, 2: 1}
    for limit in (32_000_000, 0):
        got = _bfs_out(
            sssp_hops(edges, seeds_ds, max_hops=2, broadcast_limit_ids=limit)
        )
        assert got == {1: 0, 2: 1, 3: 2}


def test_sssp_hops_edge_cases(ray_session):
    import ray.data as rd

    from patito_ray.functions.graph import sssp_hops

    edges = _wedges_ds([1, 2], [2, 3], [5, 7], blocks=2)
    seeds_ds = rd.from_arrow(pa.table({"node": pa.array([1], pa.int64())}))
    assert _bfs_out(sssp_hops(edges, seeds_ds, max_hops=0)) == {1: 0}
    lone = rd.from_arrow(pa.table({"node": pa.array([99], pa.int64())}))
    assert _bfs_out(sssp_hops(edges, lone, max_hops=5)) == {99: 0}
    with pytest.raises(ValueError):
        sssp_hops(edges, seeds_ds, max_hops=-1)
    with pytest.raises(ValueError):
        sssp_hops(
            _edges_ds([1], [2], blocks=1), seeds_ds, max_hops=1
        )  # no weight column


import hypothesis.strategies as st
from hypothesis import given, settings


@settings(max_examples=12, deadline=None)
@given(
    m=st.integers(min_value=1, max_value=120),
    seed=st.integers(min_value=0, max_value=10_000),
    seeds=st.lists(st.integers(min_value=0, max_value=29), min_size=1, max_size=4),
)
def test_sssp_hops_property_random_graphs(ray_session, m, seed, seeds):
    """Any random weighted digraph, any seed set: both sssp branches
    must equal the plain-python bounded Bellman-Ford."""
    import ray.data as rd

    from patito_ray.functions.graph import sssp_hops

    rng = np.random.default_rng(seed)
    src = rng.integers(0, 30, size=m)
    dst = rng.integers(0, 30, size=m)
    w = rng.integers(1, 6, size=m)
    ref = _sssp_reference(src, dst, w, set(seeds), max_hops=3)

    edges = _wedges_ds(src, dst, w, blocks=2)
    seeds_ds = rd.from_arrow(
        pa.table({"node": pa.array(sorted(set(seeds)), pa.int64())})
    )
    assert _bfs_out(sssp_hops(edges, seeds_ds, max_hops=3)) == ref


def test_personalized_pagerank_unreachable_component_gets_zero(ray_session):
    import ray.data as rd

    from patito_ray.functions.graph import pagerank

    # two disjoint 3-cycles; seeds only in the first
    edges = [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12), (12, 10)]
    ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in edges], pa.int64()),
                "dst": pa.array([b for _, b in edges], pa.int64()),
            }
        )
    )
    out = pagerank(ds, num_iters=5, damping=0.85, seeds=[0])
    got = {r["node"]: r["pr"] for r in out.to_pylist()}
    assert all(got[v] == 0.0 for v in (10, 11, 12))
    assert all(got[v] > 0.0 for v in (0, 1, 2))
    # trust mass never exceeds the restart total
    assert sum(got.values()) <= 1.0 + 1e-12


def test_personalized_pagerank_paths_agree(ray_session):
    import ray.data as rd

    from patito_ray.functions.graph import pagerank

    rng = np.random.default_rng(23)
    n = 400
    src = rng.integers(0, n, size=3 * n)
    dst = rng.integers(0, n, size=3 * n)
    ds = rd.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    )
    seeds = list(range(0, n, 13))
    local = pagerank(ds, num_iters=3, damping=0.85, seeds=seeds)
    dist = pagerank(ds, num_iters=3, damping=0.85, seeds=seeds, limit_bytes=0)
    if not isinstance(dist, pa.Table):
        dist = pa.concat_tables(
            [b for b in dist.iter_batches(batch_format="pyarrow") if b.num_rows]
        )
    lg = {r["node"]: r["pr"] for r in local.to_pylist()}
    dg = {r["node"]: r["pr"] for r in dist.to_pylist()}
    assert set(lg) == set(dg)
    for k in lg:
        assert abs(lg[k] - dg[k]) < 1e-12, k


def test_personalized_pagerank_empty_seeds_rejected(ray_session):
    import ray.data as rd

    from patito_ray.functions.graph import pagerank

    ds = rd.from_arrow(
        pa.table({"src": pa.array([1], pa.int64()), "dst": pa.array([2], pa.int64())})
    )
    with pytest.raises(ValueError, match="non-empty seed set"):
        pagerank(ds, seeds=[])


@pytest.mark.parametrize("limit_bytes", [None, 0])
def test_link_reciprocity_constructed(ray_session, tmp_path, limit_bytes, monkeypatch):
    # constructed edge list via a stubbed _doc_link_edges
    import ray.data as rd

    import patito_ray.pipelines.queries as q

    edges = [(0, 1), (1, 0), (1, 2), (2, 3), (3, 2), (4, 4), (0, 1)]
    t = pa.table(
        {
            "src": pa.array([a for a, _ in edges], pa.int64()),
            "dst": pa.array([b for _, b in edges], pa.int64()),
        }
    )
    # patch the DEFINING chunk module: q.* is a re-export, but the
    # consumer's __globals__ live in q_wave6 (queries.py split)
    import patito_ray.pipelines.q_wave6 as qmod

    monkeypatch.setattr(
        qmod, "_doc_link_edges", lambda sf_dir, k, with_weight=False: (rd.from_arrow(t), 5)
    )
    out = q.q_link_reciprocity("ignored", limit_bytes=limit_bytes)
    # distinct non-loop edges: (0,1),(1,0),(1,2),(2,3),(3,2) -> 5
    # reciprocal: (0,1)/(1,0) and (2,3)/(3,2) -> 4 edges
    assert out.column("n_edges")[0].as_py() == 5
    assert out.column("reciprocal_edges")[0].as_py() == 4
    assert out.column("reciprocity")[0].as_py() == 0.8


def test_clustering_coeff_triangle_plus_tail(ray_session, monkeypatch):
    import ray.data as rd

    import patito_ray.pipelines.queries as q

    # triangle 0-1-2 plus a tail 2-3: T=1, degs (1,2,2,3)? ->
    # degrees: 0:2, 1:2, 2:3, 3:1 -> wedges = 1+1+3+0 = 5
    edges = [(0, 1), (1, 2), (2, 0), (2, 3)]
    t = pa.table(
        {
            "src": pa.array([a for a, _ in edges], pa.int64()),
            "dst": pa.array([b for _, b in edges], pa.int64()),
        }
    )
    import patito_ray.pipelines.q_wave6 as qmod

    monkeypatch.setattr(
        qmod, "_doc_link_edges", lambda sf_dir, k, with_weight=False: (rd.from_arrow(t), 4)
    )
    out = q.q_clustering_coeff("ignored")
    assert out.column("triangles")[0].as_py() == 1
    assert out.column("wedges")[0].as_py() == 5
    assert out.column("global_cc")[0].as_py() == 0.6


def test_weighted_pagerank_paths_agree_and_reduce(ray_session):
    import ray.data as rd

    from patito_ray.functions.graph import pagerank

    rng = np.random.default_rng(31)
    n = 300
    src = rng.integers(0, n, size=2 * n)
    dst = rng.integers(0, n, size=2 * n)
    w = rng.integers(1, 10, size=2 * n)
    t = pa.table(
        {
            "src": pa.array(src, pa.int64()),
            "dst": pa.array(dst, pa.int64()),
            "w": pa.array(w, pa.int64()),
        }
    )
    ds = rd.from_arrow(t)
    local = pagerank(ds, num_iters=3, weight="w")
    dist = pagerank(ds, num_iters=3, weight="w", limit_bytes=0)
    if not isinstance(dist, pa.Table):
        dist = pa.concat_tables(
            [b for b in dist.iter_batches(batch_format="pyarrow") if b.num_rows]
        )
    lg = {r["node"]: r["pr"] for r in local.to_pylist()}
    dg = {r["node"]: r["pr"] for r in dist.to_pylist()}
    assert set(lg) == set(dg)
    for k in lg:
        assert abs(lg[k] - dg[k]) < 1e-12, k

    # all-equal weights reduce EXACTLY to unweighted pagerank:
    # w/Σw == 1/outdeg when every w == c... only bit-exact for c=1
    t1 = t.set_column(2, "w", pa.array(np.ones(2 * n, np.int64)))
    wg = pagerank(rd.from_arrow(t1), num_iters=3, weight="w")
    ug = pagerank(rd.from_arrow(t1.select(["src", "dst"])), num_iters=3)
    wgm = {r["node"]: r["pr"] for r in wg.to_pylist()}
    for r in ug.to_pylist():
        assert abs(wgm[r["node"]] - r["pr"]) < 1e-15


def test_weighted_pagerank_rejects_zero_weights(ray_session):
    import ray.data as rd

    from patito_ray.functions.graph import pagerank

    t = pa.table(
        {
            "src": pa.array([0, 1], pa.int64()),
            "dst": pa.array([1, 0], pa.int64()),
            "w": pa.array([0, 3], pa.int64()),
        }
    )
    with pytest.raises(ValueError, match="strictly positive"):
        pagerank(rd.from_arrow(t), weight="w")
