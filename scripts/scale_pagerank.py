"""Scale harness for the PageRank family: n-node splitmix link graph
(3 out-edges per node, weights 1..9), forced through the DISTRIBUTED
power-iteration path (limit_bytes=0) — per-iteration co-partition
exchange + adaptive contribution merges are what's timed.

Verification per variant: the distributed ranks are compared
node-for-node against the driver-local numpy fast path on the same
edges (same float expression tree — agreement to 1e-12 is the
cross-path invariant), and total rank mass must equal the restart mass
bound (≤ 1 within float noise).

Usage: [taskset -c 0-7] python scripts/scale_pagerank.py [n_nodes]
Prints one JSON line per experiment.
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

OUT_LINKS = 3


def edge_batch_fn(n_nodes: int):
    def edge_batch(batch: pa.Table) -> pa.Table:
        from patito_ray.functions.dedup import _splitmix

        ids = batch.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.repeat(ids, OUT_LINKS)
        j = np.tile(np.arange(OUT_LINKS, dtype=np.uint64), len(ids))
        h = _splitmix(src.astype(np.uint64) * np.uint64(OUT_LINKS) + j)
        dst = (h % np.uint64(n_nodes)).astype(np.int64)
        w = ((h >> np.uint64(33)) % np.uint64(9)).astype(np.int64) + 1
        return pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
                "w": pa.array(w, pa.int64()),
            }
        )

    return edge_batch


def _rss_mb() -> int:
    return round(resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024)


def _emit(experiment: str, n: int, wall: float, **extra) -> None:
    print(
        json.dumps(
            {
                "experiment": experiment,
                "n_nodes": n,
                "n_edges": n * OUT_LINKS,
                "sec": round(wall, 2),
                "edges_per_sec": round(n * OUT_LINKS / wall),
                "driver_peak_rss_mb": _rss_mb(),
                **extra,
            }
        ),
        flush=True,
    )


def _to_table(res) -> pa.Table:
    if isinstance(res, pa.Table):
        return res
    return pa.concat_tables(
        [b for b in res.iter_batches(batch_format="pyarrow") if b.num_rows]
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

    import ray

    if not ray.is_initialized():
        # num_cpus MUST match the taskset pin: auto-detected 32 workers
        # on 8 pinned cores collapse into scheduler thrash (dev notes)
        ray.init(
            address="local",
            num_cpus=8,
            include_dashboard=False,
            logging_level="ERROR",
        )
    import logging

    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from patito_ray.functions.graph import pagerank

    edges = (
        rd.range(n, override_num_blocks=256)
        .map_batches(edge_batch_fn(n), batch_format="pyarrow", batch_size=None)
        .materialize()
    )

    # local numpy references (the cross-path invariant)
    et = _to_table(edges)
    s_np = et.column("src").to_numpy()
    d_np = et.column("dst").to_numpy()
    w_np = et.column("w").to_numpy()
    seeds = np.arange(0, n, 17, dtype=np.int64)

    from patito_ray.functions.graph import _pagerank_local

    variants = [
        ("pagerank_distributed", dict(), dict()),
        ("trustrank_distributed", dict(seeds=seeds), dict(seed_arr=seeds)),
        ("weighted_pagerank_distributed", dict(weight="w"), dict(w_arr=w_np)),
    ]
    for name, kw, lkw in variants:
        t0 = time.time()
        res = pagerank(edges, num_iters=3, damping=0.85, limit_bytes=0, **kw)
        tab = _to_table(res)
        wall = time.time() - t0
        got = dict(
            zip(
                tab.column("node").to_numpy(zero_copy_only=False).tolist(),
                tab.column("pr").to_numpy(zero_copy_only=False).tolist(),
            )
        )
        ref = _pagerank_local(s_np, d_np, 3, 0.85, **lkw)
        rn = ref.column("node").to_numpy()
        rp = ref.column("pr").to_numpy()
        worst = max(abs(got[int(a)] - float(b)) for a, b in zip(rn, rp))
        mass = float(sum(got.values()))
        _emit(
            name,
            n,
            wall,
            worst_abs_diff_vs_local=float(f"{worst:.2e}"),
            total_mass=round(mass, 9),
            nodes_out=tab.num_rows,
        )

    ray.shutdown()


if __name__ == "__main__":
    main()
