"""Scale harness for the fused per-user profile (queries.q_user_profile):
10M events / 100k users / 30 days, verified EXACTLY against the
SQL_USER_PROFILE DuckDB oracle over the same parquet — the correctness
gate run at 1000x the sf0.001 row count.

Also times the four standalone operators' combined wall to show what
the single-exchange fusion saves.

Usage: taskset -c 0-7 python scripts/scale_profile.py [n_events]
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
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from patito_ray.functions.dedup import _splitmix  # noqa: E402

N_USERS = 100_000
N_DAYS = 30
EPOCH_2024_US = 1_704_067_200_000_000  # 2024-01-01 in epoch micros


def make_events(n: int) -> pa.Table:
    i = np.arange(n, dtype=np.uint64)
    user = (_splitmix(i) % np.uint64(N_USERS)).astype(np.int64)
    span_us = np.uint64(N_DAYS) * np.uint64(86_400_000_000)
    tus = (EPOCH_2024_US + (_splitmix(i + np.uint64(1 << 32)) % span_us)).astype(
        np.int64
    )
    etype_i = (_splitmix(i + np.uint64(2 << 32)) % np.uint64(5)).astype(np.int64)
    types = np.array(["view", "click", "purchase", "search", "share"])
    value = (
        (_splitmix(i + np.uint64(3 << 32)) % np.uint64(50_000)).astype(np.float64)
        / 100.0
    )
    return pa.table(
        {
            "event_id": pa.array(i.astype(np.int64), type=pa.int64()),
            "ts": pa.array(tus, type=pa.int64()).cast(pa.timestamp("us")),
            "user_id": pa.array(user, type=pa.int64()),
            "event_type": pa.array(types[etype_i]),
            "value": pa.array(value, type=pa.float64()),
        }
    )


def canon(df):
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000

    import duckdb
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
            include_dashboard=False,
        )

    from patito_ray.pipelines.queries import (
        SQL_USER_PROFILE,
        q_time_weighted_value,
        q_user_burstiness,
        q_user_event_entropy,
        q_user_profile,
        q_user_streaks,
    )

    sf_dir = "/tmp/patito_ray_scale_profile"
    path = f"{sf_dir}/events.parquet"
    if not os.path.exists(path) or pq.read_metadata(path).num_rows != n:
        os.makedirs(sf_dir, exist_ok=True)
        pq.write_table(make_events(n), path, row_group_size=1_000_000)

    # warm page cache + worker pool so the timing is compute, not import
    with open(path, "rb") as f:
        while f.read(1 << 24):
            pass

    t0 = time.time()
    out = q_user_profile(sf_dir)
    tabs = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
    got = pa.concat_tables(tabs)
    wall_fused = time.time() - t0

    t0 = time.time()
    for q in (q_user_streaks, q_time_weighted_value, q_user_event_entropy,
              q_user_burstiness):
        r = q(sf_dir)
        for _ in r.iter_batches(batch_format="pyarrow"):
            pass
    wall_standalone = time.time() - t0

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{path}')")
    t0 = time.time()
    oracle = con.sql(SQL_USER_PROFILE).df()
    wall_duck = time.time() - t0

    mine = canon(got.to_pandas())
    theirs = canon(oracle)
    exact = mine.shape == theirs.shape and bool(
        (mine.fillna(-1) == theirs.fillna(-1)).all().all()
    )

    rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    print(
        json.dumps(
            {
                "metric": "user_profile_10m",
                "n_events": n,
                "n_users": N_USERS,
                "wall_fused_s": round(wall_fused, 1),
                "wall_standalone4_s": round(wall_standalone, 1),
                "wall_duckdb_s": round(wall_duck, 1),
                "events_per_sec_fused": round(n / wall_fused),
                "users_out": got.num_rows,
                "exact_match_vs_duckdb": exact,
                "driver_rss_gb": round(rss_gb, 2),
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
