"""Scale harness for skew_join: does hot-key salting actually remove
the straggler?

Corpus: n fact rows where ``hot_share`` of them carry ONE key (the
crawl's mega-domain) and the rest spread uniformly over ``n_dim`` keys;
the dimension side is ``n_dim`` rows. The SAME input runs through the
SAME skew_join machinery twice — once with the detected hot set
(salted routing) and once with ``hot_keys=[]`` (plain co-partitioned
routing) — so the measured difference is purely the straggler
partition that holds ``hot_share`` of the corpus.

Fact/dim are materialized once before timing; detection runs outside
the timed region too (it is identical work for both variants).

Usage: [taskset -c 0-7] python scripts/scale_skew.py [n_fact] [hot_share]
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

N_DIM = 100_000


def fact_batch(n_dim: int, hot_share: float):
    def fn(batch: pa.Table) -> pa.Table:
        from patito_ray.functions.dedup import _splitmix

        ids = batch.column("id").to_numpy(zero_copy_only=False).astype(np.uint64)
        h1 = _splitmix(ids ^ np.uint64(0xBEEF))
        h2 = _splitmix(ids ^ np.uint64(0xF00D))
        # hot key 0 for hot_share of rows; others uniform over [1, n_dim)
        is_hot = (h1 % np.uint64(1_000_000)) < np.uint64(int(hot_share * 1_000_000))
        k = np.where(
            is_hot, 0, 1 + (h2 % np.uint64(n_dim - 1)).astype(np.int64)
        ).astype(np.int64)
        return pa.table(
            {
                "fid": pa.array(ids.view(np.int64)),
                "k": pa.array(k),
                "v": pa.array((h2 >> np.uint64(11)).astype(np.float64)),
            }
        )

    return fn


def main() -> None:
    n_fact = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    hot_share = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    import ray.data as rd

    from patito_ray.stages.join import detect_hot_keys, skew_join

    fact = (
        rd.range(n_fact, override_num_blocks=64)
        .map_batches(fact_batch(N_DIM, hot_share), batch_format="pyarrow",
                     batch_size=None)
        .materialize()
    )
    dim = rd.from_arrow(
        pa.table(
            {
                "dk": pa.array(np.arange(N_DIM, dtype=np.int64)),
                "name": pa.array([f"d{i}" for i in range(N_DIM)]),
            }
        )
    ).materialize()

    hot = detect_hot_keys(fact, "k", hot_count=max(1000, n_fact // 100))
    assert 0 in hot.to_pylist(), hot

    results = {}
    for label, kwargs in (
        ("unsalted", {"hot_keys": []}),
        ("salted", {"hot_keys": hot, "salt": 8}),
    ):
        t0 = time.time()
        cnt = skew_join(fact, dim, on="k", right_on="dk", **kwargs).count()
        wall = round(time.time() - t0, 1)
        assert cnt == n_fact, (cnt, n_fact)
        results[label] = wall
        print(
            json.dumps(
                {
                    "experiment": f"skew_join_{label}",
                    "n_fact": n_fact,
                    "hot_share": hot_share,
                    "rows_joined": cnt,
                    "wall_sec": wall,
                    "rows_per_sec": round(n_fact / wall),
                    "driver_rss_mb": round(
                        resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
                    ),
                }
            ),
            flush=True,
        )
    print(
        json.dumps(
            {
                "experiment": "skew_join_speedup",
                "unsalted_sec": results["unsalted"],
                "salted_sec": results["salted"],
                "speedup": round(results["unsalted"] / results["salted"], 2),
            }
        ),
        flush=True,
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
