"""Scale harness for market-basket co-occurrence: 10M (order, item)
rows — 2M orders x 5 items drawn from a 20k-item catalog with a
popularity skew (splitmix-derived, deterministic) — verified EXACTLY
against a numpy reference (sort + run-length count over the same pair
construction).

Usage: taskset -c 0-7 python scripts/scale_basket.py [n_rows]
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

ITEMS_PER_ORDER = 5
N_ITEMS = 20_000
MIN_COUNT = 2


def make_rows(n: int) -> "tuple[np.ndarray, np.ndarray]":
    i = np.arange(n, dtype=np.uint64)
    order = (i // np.uint64(ITEMS_PER_ORDER)).astype(np.int64)
    # popularity skew: square the uniform draw so low ids are hot
    u = (_splitmix(i) % np.uint64(1 << 20)).astype(np.float64) / float(1 << 20)
    item = (u * u * N_ITEMS).astype(np.int64)
    return order, item


def reference(order: np.ndarray, item: np.ndarray) -> "dict":
    from patito_ray.functions.graph import _run_pairs

    o = np.lexsort((item, order))
    g, it = order[o], item[o]
    keep = np.empty(len(g), dtype=bool)
    keep[0] = True
    keep[1:] = (g[1:] != g[:-1]) | (it[1:] != it[:-1])
    g, it = g[keep], it[keep]
    a, b = _run_pairs(g, it)
    key = a * np.int64(N_ITEMS) + b
    uniq, cnt = np.unique(key, return_counts=True)
    m = cnt >= MIN_COUNT
    return dict(zip(uniq[m].tolist(), cnt[m].tolist()))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000

    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
            include_dashboard=False,
        )

    from patito_ray.functions.basket import cooccurrence_pairs

    order, item = make_rows(n)
    expect = reference(order, item)

    ds = (
        rd.from_arrow(
            pa.table(
                {
                    "o": pa.array(order, type=pa.int64()),
                    "i": pa.array(item, type=pa.int64()),
                }
            )
        )
        .repartition(32)
        .materialize()
    )

    t0 = time.time()
    res = cooccurrence_pairs(ds, "o", "i", min_count=MIN_COUNT)
    if isinstance(res, pa.Table):
        tabs = [res]
    else:
        res = res.materialize()
        tabs = [t for t in ray.get(res.to_arrow_refs()) if t.num_rows]
    wall = time.time() - t0
    got = {}
    for t in tabs:
        a = t.column("item_a").to_numpy(zero_copy_only=False)
        b = t.column("item_b").to_numpy(zero_copy_only=False)
        c = t.column("n_groups").to_numpy(zero_copy_only=False)
        got.update(zip((a * np.int64(N_ITEMS) + b).tolist(), c.tolist()))

    exact = got == expect
    rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    print(
        json.dumps(
            {
                "metric": "basket_10m",
                "n_rows": n,
                "n_orders": int(n // ITEMS_PER_ORDER),
                "n_items": N_ITEMS,
                "wall_s": round(wall, 1),
                "rows_per_sec": round(n / wall),
                "pairs_out": len(got),
                "exact_match": bool(exact),
                "driver_rss_gb": round(rss_gb, 2),
            }
        )
    )
    ray.shutdown()
    if not exact:
        sys.exit(1)


if __name__ == "__main__":
    main()
