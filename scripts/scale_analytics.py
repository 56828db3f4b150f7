"""Scale harness for the analytics operators added late in round 3:
ordered funnel, cohort retention, exact grouped quantiles, exact
distinct-per-group and the Bloom-prefiltered semi join.

Corpus: n deterministic synthetic events (user, ts, type, value) over
~n/100 users and 60 days — each user's events are a splitmix-keyed
stream, so the corpus is reproducible without any stored data. The
semi join filters the event table against a 1%-of-users key set.

Usage: [taskset -c 0-7] python scripts/scale_analytics.py [n_events]
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

TYPES = np.array(["view", "click", "purchase", "error", "other"])
DAY_US = 86_400_000_000


def make_event_batch(n_users: int):
    def event_batch(batch: pa.Table) -> pa.Table:
        from patito_ray.functions.dedup import _splitmix

        ids = batch.column("id").to_numpy(zero_copy_only=False).astype(np.uint64)
        h1 = _splitmix(ids ^ np.uint64(0xA5A5))
        h2 = _splitmix(ids ^ np.uint64(0x5A5A))
        users = (h1 % np.uint64(n_users)).astype(np.int64)
        ts = (h2 % np.uint64(60 * DAY_US)).astype(np.int64)
        types = TYPES[(h1 >> np.uint64(32)) % np.uint64(len(TYPES))]
        value = (h2 >> np.uint64(40)).astype(np.float64)
        return pa.table(
            {
                "user_id": pa.array(users, pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
                "event_type": pa.array(types),
                "value": pa.array(value, pa.float64()),
            }
        )

    return event_batch


def _rss_mb() -> int:
    return round(resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024)


def _emit(experiment: str, n: int, wall: float, **extra) -> None:
    print(
        json.dumps(
            {
                "experiment": experiment,
                "n_events": n,
                "sec": round(wall, 2),
                "events_per_sec": round(n / wall),
                "driver_peak_rss_mb": _rss_mb(),
                **extra,
            }
        ),
        flush=True,
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    n_users = max(1, n // 100)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    import logging

    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    ds = (
        rd.range(n, override_num_blocks=256)
        .map_batches(make_event_batch(n_users), batch_format="pyarrow", batch_size=None)
        .materialize()
    )

    from patito_ray.functions.funnel import funnel_steps

    t0 = time.time()
    fun = funnel_steps(ds, "user_id", "ts", "event_type", ["view", "click", "purchase"])
    rows = fun.count()
    _emit("event_funnel", n, time.time() - t0, funnel_rows=int(rows))

    from patito_ray.functions.retention import cohort_retention

    t0 = time.time()
    ret = cohort_retention(ds, "user_id", "ts")
    nrows = ret.num_rows if isinstance(ret, pa.Table) else ret.count()
    _emit("cohort_retention", n, time.time() - t0, triangle_rows=int(nrows))

    from patito_ray.stages.quantiles import grouped_quantiles

    t0 = time.time()
    gq = grouped_quantiles(
        ds, "user_id", "value", {"p50": 0.5, "p90": 0.9, "p99": 0.99}
    )
    nrows = gq.count()
    _emit("grouped_quantiles", n, time.time() - t0, groups=int(nrows))

    from patito_ray.stages.agg import distinct_per_group

    t0 = time.time()
    dg = distinct_per_group(ds, "event_type", "user_id")
    nrows = dg.num_rows if isinstance(dg, pa.Table) else dg.count()
    _emit("distinct_per_group", n, time.time() - t0, groups=int(nrows))

    from patito_ray.functions.membership import bloom_semi_join

    keys = pa.table(
        {"k": pa.array(np.arange(0, n_users, 100, dtype=np.int64))}
    )
    t0 = time.time()
    sj = bloom_semi_join(
        ds, rd.from_arrow(keys), "user_id", "k", n_expected=len(keys)
    )
    kept = sj.count()
    _emit("bloom_semi_join", n, time.time() - t0, kept=int(kept))

    ray.shutdown()


if __name__ == "__main__":
    main()
