"""ANN recall on CLUSTERED embeddings (VERDICT r4 item 9).

BASELINE.md's earlier LSH/IVF recall was measured on isotropic random
vectors — the worst case for any space-partitioning index (all
directions equally likely, neighbors barely closer than strangers).
Real text/image embeddings are strongly clustered. This harness
generates a mixture-of-Gaussians corpus on the unit sphere
(deterministic), sweeps IVF n_probe and LSH bits, and reports
recall@10 vs the exact brute-force top-k, with an isotropic control.

Run: taskset -c 0-7 python scripts/scale_ann_recall.py [n]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_corpus(n: int, d: int, n_clusters: int, spread: float, seed: int):
    """Unit vectors around n_clusters random centers; spread is the
    within-cluster noise scale (smaller = tighter clusters). spread=None
    -> isotropic control."""
    rng = np.random.default_rng(seed)
    if spread is None:
        x = rng.standard_normal((n, d))
    else:
        centers = rng.standard_normal((n_clusters, d))
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        which = rng.integers(0, n_clusters, n)
        x = centers[which] + spread * rng.standard_normal((n, d))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    d, n_clusters, n_queries, k = 64, 200, 200, 10

    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    from patito_ray.functions.similarity import (
        ivf_build,
        topk_cosine,
        topk_cosine_ivf,
        topk_cosine_lsh,
    )

    for label, spread in (("clustered(0.25)", 0.25), ("clustered(0.45)", 0.45),
                          ("isotropic", None)):
        x = make_corpus(n, d, n_clusters, spread, seed=11)
        rng = np.random.default_rng(23)
        q_idx = rng.choice(n, n_queries, replace=False)
        # queries: corpus-like fresh points near the same structure
        if spread is None:
            qv = rng.standard_normal((n_queries, d))
        else:
            qv = x[q_idx] + 0.05 * rng.standard_normal((n_queries, d))
        qv /= np.linalg.norm(qv, axis=1, keepdims=True)
        qid = np.arange(n_queries, dtype=np.int64)

        t = pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array(
                    list(x.astype(np.float32)), pa.list_(pa.float32())
                ),
            }
        )
        ds = rd.from_arrow(t).repartition(32).materialize()

        t0 = time.time()
        brute = topk_cosine(ds, qid, qv, k=k)
        t_brute = time.time() - t0
        truth = {}
        for r in brute.to_pylist():
            truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])

        def recall(res) -> float:
            got = {}
            for r in res.to_pylist():
                got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
            return float(
                np.mean([
                    len(got.get(q, set()) & truth[q]) / len(truth[q])
                    for q in truth
                ])
            )

        print(f"\n== {label}: n={n} d={d} k={k} brute={t_brute:.2f}s ==")
        cents, assigned = ivf_build(ds, n_centroids=256)
        assigned = assigned.materialize()
        for n_probe in (1, 2, 4, 8, 16, 32):
            t0 = time.time()
            res = topk_cosine_ivf(
                assigned, cents, qid, qv, k=k, n_probe=n_probe
            )
            dt = time.time() - t0
            print(
                f"IVF  n_probe={n_probe:3d}/256  recall@10={recall(res):.3f}"
                f"  {dt:.2f}s (scanned ~{n_probe/256:.1%} of corpus)"
            )
        for bits in (8, 12, 16):
            t0 = time.time()
            res = topk_cosine_lsh(ds, qid, qv, k=k, n_planes=bits)
            dt = time.time() - t0
            print(f"LSH  bits={bits:2d}  recall@10={recall(res):.3f}  {dt:.2f}s")

    ray.shutdown()


if __name__ == "__main__":
    main()
