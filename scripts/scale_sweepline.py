"""Scale harness for the sweep-line family: rolling 7-day distinct
active users (stages/window.py:rolling_active_count) at 10M events /
200k users / 400 days, verified EXACTLY against a vectorized numpy
reference (per-user interval merge via the same delta decomposition,
computed independently from the raw arrays).

Usage: taskset -c 0-7 python scripts/scale_sweepline.py [n_events]
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

N_USERS = 200_000
N_DAYS = 400
WINDOW = 7


def make_events(n: int) -> "tuple[np.ndarray, np.ndarray]":
    i = np.arange(n, dtype=np.uint64)
    user = (_splitmix(i) % np.uint64(N_USERS)).astype(np.int64)
    day = (_splitmix(i + np.uint64(1) << np.uint64(32)) % np.uint64(N_DAYS)).astype(
        np.int64
    )
    return user, day


def reference(user: np.ndarray, day: np.ndarray) -> "dict[int, int]":
    """Dense per-day active counts via the same ±1 delta identity,
    derived independently from the raw (user, day) arrays."""
    key = user * np.int64(N_DAYS) + day
    uniq = np.unique(key)
    u, d = uniq // N_DAYS, uniq % N_DAYS
    # merge each user's [d, d+WINDOW) intervals (u,d sorted by key)
    new_iv = np.empty(len(u), dtype=bool)
    new_iv[0] = True
    new_iv[1:] = (u[1:] != u[:-1]) | (d[1:] - d[:-1] >= WINDOW)
    starts = d[new_iv]
    iv_id = np.cumsum(new_iv) - 1
    last = np.full(iv_id[-1] + 1, np.iinfo(np.int64).min, dtype=np.int64)
    np.maximum.at(last, iv_id, d)
    ends = last + WINDOW
    lo = int(starts.min())
    hi = int(ends.max())
    acc = np.zeros(hi - lo + 1, dtype=np.int64)
    np.add.at(acc, starts - lo, 1)
    np.add.at(acc, ends - lo, -1)
    run = np.cumsum(acc)
    max_day = hi - WINDOW
    return {
        int(dd): int(run[dd - lo]) for dd in range(lo, max_day + 1)
    }


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

    from patito_ray.stages.window import rolling_active_count

    user, day = make_events(n)
    expect = reference(user, day)

    ds = (
        rd.from_arrow(
            pa.table(
                {
                    "u": pa.array(user, type=pa.int64()),
                    "d": pa.array(day, type=pa.int64()),
                }
            )
        )
        .repartition(32)
        .materialize()
    )

    t0 = time.time()
    got_t = rolling_active_count(ds, "u", "d", window=WINDOW)
    wall = time.time() - t0
    got = dict(
        zip(got_t.column("day").to_pylist(), got_t.column("active").to_pylist())
    )

    exact = got == expect
    rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    print(
        json.dumps(
            {
                "metric": "rolling_active_10m",
                "n_events": n,
                "n_users": N_USERS,
                "n_days": N_DAYS,
                "window": WINDOW,
                "wall_s": round(wall, 1),
                "events_per_sec": round(n / wall),
                "days_out": len(got),
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
