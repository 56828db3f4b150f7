"""Scale harness for the distributed near-dup operators.

Synthesizes a dup-heavy crawl-like corpus (deterministic, derived from
the same word-pool generator as the bench corpus): ``n`` docs of which
~20% are copies of earlier docs — half byte-exact, half with one
appended token (word-3-gram jaccard ~0.85-0.96, i.e. near-dups that
only the MinHash path can catch). Runs ``dedup_near`` end-to-end
(candidates -> worker-side pairs -> distributed verify -> union-find ->
filter) and, separately, ``embedding_near_dups`` over ``n`` random
64-dim vectors with planted near-identical copies.

Usage: python scripts/scale_dedup.py [n_docs] [n_vecs]
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


def doc_batch(batch: pa.Table, n_total: int) -> pa.Table:
    from patito_ray.generate import page_texts

    ids = batch.column("id").to_numpy(zero_copy_only=False)
    n_base = int(n_total * 0.8)
    is_copy = ids >= n_base
    # copies point at a pseudo-random base doc
    base = np.where(
        is_copy, (ids * np.uint64(2654435761)).astype(np.uint64) % np.uint64(n_base), ids
    ).astype(np.int64)
    texts = page_texts(base)
    # half the copies get one appended token -> near (not exact) dup
    out = []
    for i, (rid, t) in enumerate(zip(ids.tolist(), texts)):
        if rid >= n_base and rid % 2 == 1:
            t = t + f" trailer{rid % 7}"
        out.append(t)
    return pa.table(
        {"doc_id": pa.array(ids, type=pa.int64()), "text": pa.array(out)}
    )


def vec_batch(batch: pa.Table, n_total: int, dim: int = 64) -> pa.Table:
    ids = batch.column("id").to_numpy(zero_copy_only=False)
    n_base = int(n_total * 0.999)
    rng_base = np.where(
        ids >= n_base,
        (ids * np.uint64(2654435761)).astype(np.uint64) % np.uint64(n_base),
        ids,
    ).astype(np.int64)
    # deterministic per-row vectors: splitmix the (row, dim) grid
    from patito_ray.generate import _mix

    grid = (
        rng_base[:, None].astype(np.uint64) * np.uint64(1000003)
        + np.arange(dim, dtype=np.uint64)[None, :]
    )
    vals = (_mix(grid.ravel(), 11).astype(np.float64) / 2**64 - 0.5).reshape(
        len(ids), dim
    )
    # planted copies get a tiny deterministic perturbation (cosine ~0.9997)
    is_copy = ids >= n_base
    if is_copy.any():
        pert = (_mix(grid.ravel(), 13).astype(np.float64) / 2**64 - 0.5).reshape(
            len(ids), dim
        )
        vals[is_copy] += 0.01 * pert[is_copy]
    return pa.table(
        {
            "vec_id": pa.array(ids, type=pa.int64()),
            "embedding": pa.array(
                [row for row in vals.tolist()], type=pa.list_(pa.float64())
            ),
        }
    )


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_vecs = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    import ray.data as rd

    from patito_ray.functions.dedup import dedup_near, embedding_near_dups

    if n_docs:
        ds = rd.range(n_docs, override_num_blocks=128).map_batches(
            lambda t, n=n_docs: doc_batch(t, n),
            batch_format="pyarrow",
            batch_size=None,
        ).materialize()
        t0 = time.time()
        kept = dedup_near(ds).count()
        wall = time.time() - t0
        peak_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
        print(
            json.dumps(
                {
                    "experiment": "dedup_near",
                    "n_docs": n_docs,
                    "kept": int(kept),
                    "removed": int(n_docs - kept),
                    "sec": round(wall, 2),
                    "docs_per_sec": round(n_docs / wall),
                    "driver_peak_rss_mb": round(peak_mb),
                }
            ),
            flush=True,
        )

    if n_vecs:
        vs = rd.range(n_vecs, override_num_blocks=128).map_batches(
            lambda t, n=n_vecs: vec_batch(t, n),
            batch_format="pyarrow",
            batch_size=None,
        ).materialize()
        int8 = os.environ.get("EMBED_INT8", "1") != "0"  # A/B the prune
        t0 = time.time()
        pairs = embedding_near_dups(vs, threshold=0.99, int8_prune=int8).count()
        wall = time.time() - t0
        peak_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
        print(
            json.dumps(
                {
                    "experiment": "embedding_near_dups",
                    "n_vecs": n_vecs,
                    "int8_prune": int8,
                    "pairs": int(pairs),
                    "sec": round(wall, 2),
                    "vecs_per_sec": round(n_vecs / wall),
                    "driver_peak_rss_mb": round(peak_mb),
                }
            ),
            flush=True,
        )
    ray.shutdown()


if __name__ == "__main__":
    main()
