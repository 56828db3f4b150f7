"""Scale harness for the fourth-session operators: weighted SSSP at
1M nodes / 3M weighted edges (exact numpy Bellman-Ford reference;
forced co-partitioned branch verified at n <= 200k), and the Bloom
data-skipping layout at 5M rows / 64 files (prune ratio + full-scan
parity on point lookups).

Usage: taskset -c 0-7 python scripts/scale_sssp_bloom.py [n_nodes] [n_rows]
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


def make_wedges(n: int):
    ids = np.arange(n, dtype=np.int64)
    src = np.repeat(ids, OUT_LINKS)
    j = np.tile(np.arange(OUT_LINKS, dtype=np.uint64), n)
    h = _splitmix(src.astype(np.uint64) * np.uint64(OUT_LINKS) + j)
    dst = (h % np.uint64(n)).astype(np.int64)
    w = ((h >> np.uint64(33)) % np.uint64(9)).astype(np.int64) + 1
    return src, dst, w


def reference_sssp(src, dst, w, n, seeds, hops):
    """Vectorized Bellman-Ford over hop rounds: scatter-min of frontier
    relaxations via np.minimum.at."""
    INF = np.int64(2**62)
    dist = np.full(n, INF, dtype=np.int64)
    dist[seeds] = 0
    active = np.zeros(n, dtype=bool)
    active[seeds] = True
    for _ in range(hops):
        m = active[src]
        if not m.any():
            break
        cand = dist[src[m]] + w[m]
        nxt = np.full(n, INF, dtype=np.int64)
        np.minimum.at(nxt, dst[m], cand)
        improved = nxt < dist
        if not improved.any():
            break
        dist[improved] = nxt[improved]
        active[:] = False
        active[improved] = True
    return {int(i): int(d) for i, d in enumerate(dist) if d < INF}


def sssp_out(res) -> dict:
    import ray

    tabs = [t for t in ray.get(res.materialize().to_arrow_refs()) if t.num_rows]
    got: dict = {}
    for t in tabs:
        got.update(zip(t.column("node").to_pylist(), t.column("dist").to_pylist()))
    return got


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000_000

    import ray
    import ray.data as rd

    from patito_ray.functions.graph import sssp_hops
    from patito_ray.stages.bloomidx import (
        bloom_index_write,
        bloom_prune,
        bloom_pruned_read,
    )

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
            include_dashboard=False,
        )

    out: dict = {"n_nodes": n, "n_rows": n_rows}

    # ---------------- weighted SSSP ----------------
    src, dst, w = make_wedges(n)
    seeds = np.arange(0, n, SEED_MOD, dtype=np.int64)
    expect = reference_sssp(src, dst, w, n, seeds, MAX_HOPS)

    edges = (
        rd.from_arrow(
            pa.table(
                {
                    "src": pa.array(src, pa.int64()),
                    "dst": pa.array(dst, pa.int64()),
                    "w": pa.array(w, pa.int64()),
                }
            )
        )
        .repartition(32)
        .materialize()
    )
    seeds_ds = rd.from_arrow(pa.table({"node": pa.array(seeds, pa.int64())}))

    t0 = time.time()
    got = sssp_out(sssp_hops(edges, seeds_ds, max_hops=MAX_HOPS))
    out["sssp_sec"] = round(time.time() - t0, 2)
    out["sssp_exact"] = got == expect
    out["sssp_reached"] = len(got)

    if n <= 200_000:
        t0 = time.time()
        got_d = sssp_out(
            sssp_hops(edges, seeds_ds, max_hops=MAX_HOPS, broadcast_limit_ids=0)
        )
        out["sssp_dist_sec"] = round(time.time() - t0, 2)
        out["sssp_dist_exact"] = got_d == expect

    # ---------------- bloom layout ----------------
    keys = np.arange(n_rows, dtype=np.int64) * 7 + 3
    vals = (keys * 2654435761) % 1000
    tab = pa.table(
        {"k": pa.array(keys, pa.int64()), "v": pa.array(vals, pa.int64())}
    )
    bdir = "/tmp/patito_ray_scale_bloomidx"
    t0 = time.time()
    bloom_index_write(
        rd.from_arrow(tab).repartition(64).materialize(),
        "k",
        bdir,
        num_files=64,
        overwrite=True,
    )
    out["bloom_write_sec"] = round(time.time() - t0, 2)

    probe = [int(keys[5]), int(keys[n_rows // 2]), int(keys[-1]), 4]  # 3 hits + 1 miss
    t0 = time.time()
    kept, total = bloom_prune(bdir, probe)
    out["bloom_prune_sec"] = round(time.time() - t0, 3)
    out["bloom_files_kept"] = len(kept)
    out["bloom_files_total"] = total

    t0 = time.time()
    got_rows = (
        bloom_pruned_read(bdir, probe).to_pandas().sort_values("k").reset_index(drop=True)
    )
    out["bloom_lookup_sec"] = round(time.time() - t0, 2)
    expect_keys = sorted(p for p in probe if (p - 3) % 7 == 0 and 3 <= p <= int(keys[-1]))
    out["bloom_parity"] = got_rows["k"].tolist() == expect_keys

    out["driver_rss_gb"] = round(
        resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2
    )
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
