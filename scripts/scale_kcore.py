"""Scale harness for distributed k-core peeling: the deterministic
splitmix link graph (out-degree 3) at 1M nodes / 3M directed edges,
k=4. The EXACT expected core is recomputed on the driver with a
vectorized numpy peel (bincount rounds over the deduped undirected
edge list — converges in <= ~7 rounds at every tested scale), and the
distributed result must match it set-exactly.

Usage: taskset -c 0-7 python scripts/scale_kcore.py [n_nodes]
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

K = 4
OUT_LINKS = 3


def make_edges(n: int) -> "tuple[np.ndarray, np.ndarray]":
    ids = np.arange(n, dtype=np.int64)
    src = np.repeat(ids, OUT_LINKS)
    j = np.tile(np.arange(OUT_LINKS, dtype=np.uint64), n)
    h = _splitmix(src.astype(np.uint64) * np.uint64(OUT_LINKS) + j)
    dst = (h % np.uint64(n)).astype(np.int64)
    return src, dst


def reference_core(src: np.ndarray, dst: np.ndarray, n: int, k: int) -> np.ndarray:
    u = np.concatenate([src, dst])
    v = np.concatenate([dst, src])
    keep = u != v
    u, v = u[keep], v[keep]
    key = u.astype(np.uint64) * np.uint64(n) + v.astype(np.uint64)
    _, idx = np.unique(key, return_index=True)
    u, v = u[idx], v[idx]
    alive = np.ones(n, dtype=bool)
    while True:
        m = alive[u] & alive[v]
        deg = np.bincount(u[m], minlength=n)
        bad = alive & (deg < k)
        if not bad.any():
            return np.flatnonzero(alive)
        alive &= ~bad


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

    from patito_ray.functions.graph import k_core

    src, dst = make_edges(n)
    expect = reference_core(src, dst, n, K)

    edges = rd.from_arrow(
        pa.table(
            {"src": pa.array(src, type=pa.int64()), "dst": pa.array(dst, type=pa.int64())}
        )
    ).repartition(32).materialize()

    t0 = time.time()
    out = k_core(edges, K).materialize()
    tabs = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
    got = np.sort(
        np.concatenate([t.column("node").to_numpy(zero_copy_only=False) for t in tabs])
    )
    wall = time.time() - t0

    exact = bool(len(got) == len(expect) and (got == expect).all())
    rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    print(
        json.dumps(
            {
                "metric": "kcore_1m",
                "n_nodes": n,
                "n_directed_edges": len(src),
                "k": K,
                "wall_s": round(wall, 1),
                "edges_per_sec": round(len(src) / wall),
                "core_size": int(len(got)),
                "expected_core_size": int(len(expect)),
                "exact_match": exact,
                "driver_rss_gb": round(rss_gb, 2),
            }
        )
    )
    ray.shutdown()
    if not exact:
        sys.exit(1)


if __name__ == "__main__":
    main()
