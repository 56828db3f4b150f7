"""Scale harness for the late-round-3 operators: degree-ordered
triangle counting, global NTILE (equi-depth bucketing via the ordered
prefix sum) and grouped top-k frequent values.

Triangle corpus: K disjoint 40-cliques plus one hot star hub — the
exact triangle count is analytic (K * C(40,3); the star adds zero), so
the run verifies exactness at scale, not just wall time. The star's
10k-degree hub exercises the degree-orientation skew defuser.

Usage: [taskset -c 0-7] python scripts/scale_misc3.py [n_edges] [n_rows]
Prints one JSON line per experiment.
"""

from __future__ import annotations

import json
import math
import os
import resource
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CLIQUE = 40


def _rss_mb() -> int:
    return round(resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024)


def _emit(experiment: str, n: int, wall: float, **extra) -> None:
    print(
        json.dumps(
            {
                "experiment": experiment,
                "n": n,
                "sec": round(wall, 2),
                "rows_per_sec": round(n / wall),
                "driver_peak_rss_mb": _rss_mb(),
                **extra,
            }
        ),
        flush=True,
    )


def clique_edges(n_edges: int):
    """Edge batches for K disjoint CLIQUE-cliques + one star hub."""
    per_clique = CLIQUE * (CLIQUE - 1) // 2
    k_cliques = max(1, n_edges // per_clique)
    star_deg = 10_000
    pairs_i, pairs_j = np.triu_indices(CLIQUE, k=1)

    def batch(b: pa.Table) -> pa.Table:
        ids = b.column("id").to_numpy(zero_copy_only=False)
        # id -> (clique index, pair index within clique)
        cidx = ids // per_clique
        pidx = ids % per_clique
        base = cidx * CLIQUE
        src = base + pairs_i[pidx]
        dst = base + pairs_j[pidx]
        return pa.table(
            {
                "src": pa.array(src.astype(np.int64)),
                "dst": pa.array(dst.astype(np.int64)),
            }
        )

    return k_cliques, per_clique, star_deg, batch


def main() -> None:
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    import logging

    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from patito_ray.functions.graph import triangle_count

    k_cliques, per_clique, star_deg, batch_fn = clique_edges(n_edges)
    clique_edge_count = k_cliques * per_clique
    hub = k_cliques * CLIQUE + 1_000_000_000 // 2  # disjoint id space
    star = pa.table(
        {
            "src": pa.array(np.full(star_deg, hub, dtype=np.int64)),
            "dst": pa.array(
                hub + 1 + np.arange(star_deg, dtype=np.int64)
            ),
        }
    )
    edges = (
        rd.range(clique_edge_count, override_num_blocks=256)
        .map_batches(batch_fn, batch_format="pyarrow", batch_size=None)
        .union(rd.from_arrow(star))
        .materialize()
    )
    expected_tri = k_cliques * math.comb(CLIQUE, 3)
    expected_edges = clique_edge_count + star_deg

    t0 = time.time()
    out = triangle_count(edges)
    wall = time.time() - t0
    tri = out.column("triangles")[0].as_py()
    ne = out.column("n_edges")[0].as_py()
    assert tri == expected_tri, (tri, expected_tri)
    assert ne == expected_edges, (ne, expected_edges)
    _emit(
        "triangle_count",
        expected_edges,
        wall,
        triangles=tri,
        cliques=k_cliques,
        star_degree=star_deg,
        exact="verified",
    )

    # ---- global NTILE over n_rows unique keys ----
    from patito_ray.stages.prefix import global_ntile

    def key_batch(b: pa.Table) -> pa.Table:
        from patito_ray.functions.dedup import _splitmix

        ids = b.column("id").to_numpy(zero_copy_only=False).astype(np.uint64)
        h = _splitmix(ids ^ np.uint64(0xBEEF))
        # unique order keys: mix the id into the low bits
        x = ((h >> np.uint64(30)) << np.uint64(30)) | ids
        return pa.table({"x": pa.array(x.view(np.int64))})

    rows = (
        rd.range(n_rows, override_num_blocks=256)
        .map_batches(key_batch, batch_format="pyarrow", batch_size=None)
        .materialize()
    )
    t0 = time.time()
    nt = global_ntile(rows, "x", k=100)
    import polars as pl

    sizes = (
        pl.from_arrow(
            pa.concat_tables(
                [t for t in ray.get(nt.to_arrow_refs()) if t.num_rows]
            ).select(["bucket"])
        )
        .group_by("bucket")
        .len()
    )
    wall = time.time() - t0
    assert sizes.height == 100
    mn, mx = int(sizes["len"].min()), int(sizes["len"].max())
    assert mx - mn <= 1, (mn, mx)  # equi-depth by construction
    _emit("global_ntile", n_rows, wall, buckets=100, min_bucket=mn, max_bucket=mx)

    # ---- grouped top-k frequent values: zipf-ish value skew ----
    from patito_ray.stages.agg import top_values_per_group

    def kv_batch(b: pa.Table) -> pa.Table:
        from patito_ray.functions.dedup import _splitmix

        ids = b.column("id").to_numpy(zero_copy_only=False).astype(np.uint64)
        h = _splitmix(ids ^ np.uint64(0xFACE))
        g = (h % np.uint64(1000)).astype(np.int64)
        # skewed values: value v with weight ~ 1/(v+1)
        u = (h >> np.uint64(20)).astype(np.float64) / float(1 << 44)
        v = np.floor(100.0 ** u).astype(np.int64) - 1
        return pa.table({"g": pa.array(g), "v": pa.array(v)})

    kv = (
        rd.range(n_rows, override_num_blocks=256)
        .map_batches(kv_batch, batch_format="pyarrow", batch_size=None)
        .materialize()
    )
    t0 = time.time()
    top = top_values_per_group(kv, "g", "v", k=5)
    nrows = top.num_rows if isinstance(top, pa.Table) else top.count()
    _emit("top_values_per_group", n_rows, time.time() - t0, out_rows=int(nrows))

    ray.shutdown()


if __name__ == "__main__":
    main()
