"""Scale harness for the clustering operators.

Synthesizes ``n`` deterministic 64-dim vectors drawn around ``k_true``
well-separated anchor directions (splitmix over the (anchor, dim)
grid + per-row noise), runs ``kmeans_fit`` for a few Lloyd iterations
plus a full ``kmeans_assign`` scoring pass, then ``semantic_dedup``
within the produced clusters. Reports wall time, throughput, cluster
balance, and driver peak RSS — the numbers BASELINE.md cites for the
100-TB design argument (per-iteration cost = one streaming scan; the
driver folds k*(d+1) floats per batch; semantic dedup's per-group
matmul is bounded by the cluster size the caller chose k for).

Usage: python scripts/scale_cluster.py [n_vecs] [k] [iters]
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

DIM = 64


def _vec_of(ids: np.ndarray, k_true: int) -> np.ndarray:
    """Deterministic vector per id: anchor direction (id % k_true) plus
    broad per-id noise — clusters separable, members NOT near-dups."""
    from patito_ray.generate import _mix

    anchor = (ids % np.uint64(k_true)).astype(np.uint64)
    a_grid = (
        anchor[:, None] * np.uint64(999983)
        + np.arange(DIM, dtype=np.uint64)[None, :]
    )
    base = (_mix(a_grid.ravel(), 17).astype(np.float64) / 2**64 - 0.5).reshape(
        len(ids), DIM
    )
    n_grid = (
        ids[:, None] * np.uint64(1000003)
        + np.arange(DIM, dtype=np.uint64)[None, :]
    )
    noise = (_mix(n_grid.ravel(), 19).astype(np.float64) / 2**64 - 0.5).reshape(
        len(ids), DIM
    )
    return base + 0.4 * noise


def vec_batch(batch: pa.Table, k_true: int, n_total: int) -> pa.Table:
    from patito_ray.generate import _mix

    ids = batch.column("id").to_numpy(zero_copy_only=False).astype(np.uint64)
    n_base = np.uint64(int(n_total * 0.9))
    is_copy = ids >= n_base
    src = np.where(
        is_copy,
        (ids * np.uint64(2654435761)).astype(np.uint64) % n_base,
        ids,
    ).astype(np.uint64)
    vals = _vec_of(src, k_true)
    if is_copy.any():
        # planted near-dups: tiny perturbation, cosine ~0.9999
        p_grid = (
            ids[:, None] * np.uint64(899809343)
            + np.arange(DIM, dtype=np.uint64)[None, :]
        )
        pert = (
            _mix(p_grid.ravel(), 23).astype(np.float64) / 2**64 - 0.5
        ).reshape(len(ids), DIM)
        vals[is_copy] += 0.005 * pert[is_copy]
    return pa.table(
        {
            "vec_id": pa.array(ids.astype(np.int64)),
            "embedding": pa.array(vals.tolist(), type=pa.list_(pa.float64())),
        }
    )


def main() -> None:
    n_vecs = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    import ray.data as rd

    from patito_ray.functions.clustering import (
        kmeans_assign,
        kmeans_fit,
        semantic_dedup,
    )

    vs = (
        rd.range(n_vecs, override_num_blocks=128)
        .map_batches(
            lambda t, kk=k, n=n_vecs: vec_batch(t, kk, n),
            batch_format="pyarrow",
            batch_size=None,
        )
        .materialize()
    )

    t0 = time.time()
    centroids = kmeans_fit(vs, k=k, n_iter=iters)
    fit_s = time.time() - t0

    t0 = time.time()
    assigned = kmeans_assign(vs, centroids).materialize()
    # narrow partial bincount -> driver fold (never shuffle the vectors
    # just to count them)
    parts = assigned.map_batches(
        lambda t, kk=k: pa.table(
            {
                "cid": np.arange(kk, dtype=np.int64),
                "n": np.bincount(
                    t.column("cluster_id").to_numpy(zero_copy_only=False),
                    minlength=kk,
                ),
            }
        ),
        batch_format="pyarrow",
        batch_size=None,
    ).take_all()
    sizes = np.zeros(k, dtype=np.int64)
    for r in parts:
        sizes[r["cid"]] += r["n"]
    assign_s = time.time() - t0
    peak_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    print(
        json.dumps(
            {
                "experiment": "kmeans",
                "n_vecs": n_vecs,
                "k": k,
                "iters": iters,
                "fit_sec": round(fit_s, 2),
                "assign_sec": round(assign_s, 2),
                "vecs_per_sec_per_iter": round(n_vecs * iters / fit_s),
                "cluster_min": int(min(sizes)),
                "cluster_max": int(max(sizes)),
                "driver_peak_rss_mb": round(peak_mb),
            }
        ),
        flush=True,
    )

    t0 = time.time()
    kept = semantic_dedup(assigned, threshold=0.995)
    n_kept = kept.map_batches(
        lambda t: pa.table(
            {"n": [int(pa.compute.sum(pa.compute.cast(t.column("kept"), pa.int64())).as_py() or 0)]}
        ),
        batch_format="pyarrow",
    ).sum("n")
    dedup_s = time.time() - t0
    peak_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    print(
        json.dumps(
            {
                "experiment": "semantic_dedup",
                "n_vecs": n_vecs,
                "k": k,
                "kept": int(n_kept),
                "dropped": int(n_vecs - n_kept),
                "sec": round(dedup_s, 2),
                "vecs_per_sec": round(n_vecs / dedup_s),
                "driver_peak_rss_mb": round(peak_mb),
            }
        ),
        flush=True,
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
