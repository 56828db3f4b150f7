"""Scale harness for the exact rank-correlation operators
(grouped_kendall / grouped_spearman): n synthetic events over 5 event
types (~n/5 rows per group), forced through the DISTRIBUTED
grouped-holistic branch (limit_bytes=0) so the hash exchange + the
O(n log² n) vectorized kernels are what's being timed, not the driver
fast path.

The value column is constructed with a genuine monotone drift in time
(value = ts-rank noise + trend) so tau/rho land away from 0 and the
invariants are informative: per group the five Kendall pair classes
must sum to n(n-1)/2 exactly, and rho must agree with numpy's float
Pearson-of-midranks to 1e-6 on a sampled group.

Usage: [taskset -c 0-7] python scripts/scale_rankcorr.py [n_events]
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


def event_batch(batch: pa.Table) -> pa.Table:
    from patito_ray.functions.dedup import _splitmix

    ids = batch.column("id").to_numpy(zero_copy_only=False).astype(np.uint64)
    h1 = _splitmix(ids ^ np.uint64(0xC0C0))
    h2 = _splitmix(ids ^ np.uint64(0x0C0C))
    ts = (h2 % np.uint64(60 * DAY_US)).astype(np.int64)
    # tie-heavy value grid with a real time trend: noise in [0, 5000)
    # cents plus ts/day * 20 cents — tau/rho ≈ clearly positive
    noise = (h1 % np.uint64(5000)).astype(np.int64)
    x = noise + (ts // DAY_US) * 20
    return pa.table(
        {
            "event_type": pa.array(TYPES[(h1 >> np.uint64(32)) % np.uint64(len(TYPES))]),
            "x": pa.array(x, pa.int64()),
            "y": pa.array(ts, pa.int64()),
        }
    )


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

    import ray

    if not ray.is_initialized():
        # num_cpus matches the taskset pin (dev notes: auto-detected 32
        # workers on 8 pinned cores collapse into scheduler thrash)
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

    ds = (
        rd.range(n, override_num_blocks=256)
        .map_batches(event_batch, batch_format="pyarrow", batch_size=None)
        .materialize()
    )

    from patito_ray.functions.kendall import grouped_kendall, grouped_spearman

    t0 = time.time()
    kt = grouped_kendall(ds, by="event_type", x="x", y="y", limit_bytes=0)
    if not isinstance(kt, pa.Table):
        kt = pa.concat_tables(
            [b for b in kt.iter_batches(batch_format="pyarrow") if b.num_rows]
        )
    wall = time.time() - t0
    # invariant: the five pair classes partition all n(n-1)/2 pairs
    bad = 0
    taus = {}
    for r in kt.to_pylist():
        total = (
            r["concordant"] + r["discordant"] + r["ties_x"] + r["ties_y"] + r["ties_xy"]
        )
        if total != r["n"] * (r["n"] - 1) // 2:
            bad += 1
        taus[r["event_type"]] = r["tau_b"]
    _emit(
        "grouped_kendall",
        n,
        wall,
        groups=kt.num_rows,
        invariant_failures=bad,
        tau_view=taus.get("view"),
    )

    t0 = time.time()
    sp = grouped_spearman(ds, by="event_type", x="x", y="y", limit_bytes=0)
    if not isinstance(sp, pa.Table):
        sp = pa.concat_tables(
            [b for b in sp.iter_batches(batch_format="pyarrow") if b.num_rows]
        )
    wall = time.time() - t0
    rhos = {r["event_type"]: r["rho"] for r in sp.to_pylist()}
    # float cross-check on one group, recomputed locally with numpy
    from patito_ray.functions.kendall import avg_rank2

    loc = ds.map_batches(
        lambda t: t.filter(
            pa.compute.equal(t.column("event_type"), "view")
        ).select(["x", "y"]),
        batch_format="pyarrow",
        batch_size=None,
    )
    tabs = pa.concat_tables(
        [b for b in loc.iter_batches(batch_format="pyarrow") if b.num_rows]
    )
    rx = avg_rank2(tabs.column("x").to_numpy()).astype(np.float64)
    ry = avg_rank2(tabs.column("y").to_numpy()).astype(np.float64)
    ref = float(np.corrcoef(rx, ry)[0, 1])
    _emit(
        "grouped_spearman",
        n,
        wall,
        groups=sp.num_rows,
        rho_view=rhos.get("view"),
        rho_view_numpy=round(ref, 6),
        agree=abs(rhos.get("view", 99) - ref) < 1e-6,
    )

    ray.shutdown()


if __name__ == "__main__":
    main()
