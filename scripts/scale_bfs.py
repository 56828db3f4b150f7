"""Scale harness for multi-source k-hop BFS: the deterministic
splitmix link graph (out-degree 3) at 1M nodes / 3M directed edges,
1000 seeds (node % 1000 == 0), 4 hops. The EXACT expected distance map
is recomputed on the driver with a vectorized numpy level sweep
(np.isin frontiers over the edge arrays), and the distributed result
must match it dict-exactly. Runs the adaptive default AND the forced
co-partitioned branch (broadcast_limit_ids=0) at n <= 200k.

Usage: taskset -c 0-7 python scripts/scale_bfs.py [n_nodes]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from patito_ray.functions.dedup import _splitmix  # noqa: E402

OUT_LINKS = 3
MAX_HOPS = 4
SEED_MOD = 1000


def make_edges(n: int) -> "tuple[np.ndarray, np.ndarray]":
    ids = np.arange(n, dtype=np.int64)
    src = np.repeat(ids, OUT_LINKS)
    j = np.tile(np.arange(OUT_LINKS, dtype=np.uint64), n)
    h = _splitmix(src.astype(np.uint64) * np.uint64(OUT_LINKS) + j)
    dst = (h % np.uint64(n)).astype(np.int64)
    return src, dst


def reference_bfs(
    src: np.ndarray, dst: np.ndarray, n: int, seeds: np.ndarray, hops: int
) -> np.ndarray:
    """dist[node] (-1 unreached): vectorized level sweep over the
    sorted edge arrays."""
    order = np.argsort(src, kind="stable")
    src_s, dst_s = src[order], dst[order]
    starts = np.searchsorted(src_s, np.arange(n))
    ends = np.searchsorted(src_s, np.arange(n) + 1)
    dist = np.full(n, -1, dtype=np.int64)
    dist[seeds] = 0
    frontier = seeds
    for h in range(1, hops + 1):
        if frontier.size == 0:
            break
        # gather all out-neighbours of the frontier
        cnt = ends[frontier] - starts[frontier]
        idx = np.repeat(starts[frontier], cnt) + (
            np.arange(int(cnt.sum())) - np.repeat(np.cumsum(cnt) - cnt, cnt)
        )
        nbrs = np.unique(dst_s[idx])
        frontier = nbrs[dist[nbrs] == -1]
        dist[frontier] = h
    return dist


def run(edges, seeds_ds, **kw) -> "tuple[dict, float]":
    import ray

    from patito_ray.functions.graph import bfs_hops

    t0 = time.time()
    out = bfs_hops(edges, seeds_ds, max_hops=MAX_HOPS, **kw).materialize()
    tabs = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
    got = {}
    for t in tabs:
        got.update(
            zip(t.column("node").to_pylist(), t.column("dist").to_pylist())
        )
    return got, time.time() - t0


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
            include_dashboard=False,
        )

    src, dst = make_edges(n)
    seeds = np.arange(0, n, SEED_MOD, dtype=np.int64)
    dist = reference_bfs(src, dst, n, seeds, MAX_HOPS)
    expect = {int(i): int(d) for i, d in enumerate(dist) if d >= 0}

    edges = (
        rd.from_arrow(
            pa.table(
                {
                    "src": pa.array(src, type=pa.int64()),
                    "dst": pa.array(dst, type=pa.int64()),
                }
            )
        )
        .repartition(32)
        .materialize()
    )
    seeds_ds = rd.from_arrow(pa.table({"node": pa.array(seeds, type=pa.int64())}))

    got, wall = run(edges, seeds_ds)
    exact = got == expect

    dist_exact = None
    wall_dist = None
    if n <= 200_000:
        got_d, wall_dist = run(edges, seeds_ds, broadcast_limit_ids=0)
        dist_exact = got_d == expect

    rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    print(
        json.dumps(
            {
                "metric": "bfs_1m",
                "n_nodes": n,
                "n_directed_edges": len(src),
                "seeds": len(seeds),
                "max_hops": MAX_HOPS,
                "wall_s": round(wall, 1),
                "edges_per_sec": round(len(src) / wall),
                "reached": len(got),
                "expected_reached": len(expect),
                "exact_match": bool(exact),
                "forced_distributed_exact": dist_exact,
                "forced_distributed_wall_s": (
                    round(wall_dist, 1) if wall_dist else None
                ),
                "driver_rss_gb": round(rss_gb, 2),
            }
        )
    )
    ray.shutdown()
    if not exact or dist_exact is False:
        sys.exit(1)


if __name__ == "__main__":
    main()
