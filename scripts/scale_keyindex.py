"""Scale harness for the persisted cross-run uniqueness index.

Simulates two crawl days: day-1 folds ``n`` keys (with a 10 %
within-run duplicate rate) into a fresh index; day-2 checks+folds a
second batch of ``n`` keys of which 30 % repeat day-1 keys. Every count
is verified against closed-form expectations (the key populations are
deterministic integer ranges), so this doubles as a correctness check
at volume. Prints one JSON line per phase: wall seconds, counts,
driver RSS.

Usage: [taskset -c 0-7] python scripts/scale_keyindex.py [n] [buckets]
"""

from __future__ import annotations

import json
import os
import resource
import shutil
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

IDX = "/tmp/patito_ray_scale_keyindex"


def _rss_gb() -> float:
    return round(resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2)


def day1_batch(batch: pa.Table, n: int) -> pa.Table:
    """Keys 0..0.9n-1 once each, plus 0.1n repeats of keys 0..0.1n-1."""
    ids = batch.column("id").to_numpy(zero_copy_only=False)
    base = int(n * 0.9)
    key = np.where(ids < base, ids, ids - base).astype(np.int64)
    return pa.table({"key": pa.array(key, pa.int64())})


def day2_batch(batch: pa.Table, n: int) -> pa.Table:
    """0.3n keys repeated from day-1's range, 0.7n brand new."""
    ids = batch.column("id").to_numpy(zero_copy_only=False)
    cut = int(n * 0.3)
    key = np.where(ids < cut, ids, ids + 10_000_000_000).astype(np.int64)
    return pa.table({"key": pa.array(key, pa.int64())})


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")

    from patito_ray.state.keyindex import (
        create_key_index,
        key_index_size,
        key_index_update,
    )

    shutil.rmtree(IDX, ignore_errors=True)
    create_key_index(IDX, num_buckets=buckets)

    base = int(n * 0.9)
    day1 = rd.range(n, override_num_blocks=64).map_batches(
        lambda b, n=n: day1_batch(b, n), batch_format="pyarrow"
    )
    t0 = time.time()
    s1 = key_index_update(day1, "key", IDX).to_pylist()[0]
    t1 = time.time() - t0
    assert s1["n_rows"] == n and s1["distinct_keys"] == base, s1
    assert s1["new_keys"] == base and s1["dup_rows_within_run"] == n - base, s1
    print(
        json.dumps(
            {"phase": "day1_fold", "n": n, "sec": round(t1, 1), "rss_gb": _rss_gb(), **s1}
        ),
        flush=True,
    )

    cut = int(n * 0.3)
    day2 = rd.range(n, override_num_blocks=64).map_batches(
        lambda b, n=n: day2_batch(b, n), batch_format="pyarrow"
    )
    t0 = time.time()
    s2 = key_index_update(day2, "key", IDX).to_pylist()[0]
    t2 = time.time() - t0
    assert s2["distinct_keys"] == n, s2
    assert s2["dup_keys_vs_index"] == cut and s2["new_keys"] == n - cut, s2
    print(
        json.dumps(
            {"phase": "day2_check_fold", "n": n, "sec": round(t2, 1), "rss_gb": _rss_gb(), **s2}
        ),
        flush=True,
    )
    meta = key_index_size(IDX)
    assert meta["total_keys"] == base + (n - cut), meta
    print(json.dumps({"phase": "final", **meta}), flush=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
