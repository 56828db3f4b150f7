"""Scale harness for edit-distance near-dup pairs.

Corpus: ``n`` short keys (product-name / title shaped, 12-18 chars)
derived deterministically from splitmix64 draws over a letter pool.
Every 10th key is a PLANTED single-substitution typo of the key 1
before it (known distance-1 pair), every 20th additionally a planted
exact duplicate (distance 0) — so recall is checkable exactly. Base
keys are near-uniform random strings, so unplanted collisions within
distance 1 are (26^-10)-improbable noise.

Usage: taskset -c 0-7 python scripts/scale_editdist.py [n] [max_dist]
Prints one JSON line. Pin CPUs per the bench-environment notes.
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

_LETTERS = np.frombuffer(b"abcdefghijklmnopqrstuvwxyz", dtype=np.uint8)


def key_batch(batch: pa.Table) -> pa.Table:
    """ids -> deterministic short keys with planted dup structure."""
    from patito_ray.state.sketches import hash64

    ids = batch.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
    base = np.where(ids % 10 == 9, ids - 1, ids)  # typo rows copy the prior key
    L = 18
    cols = []
    for k in range(L):
        h = hash64(pa.array(base * np.int64(L) + k)).view(np.uint64)
        cols.append(_LETTERS[(h % np.uint64(26)).astype(np.int64)])
    mat = np.stack(cols, axis=1)  # (n, 18) ascii
    lens = 12 + (base.view(np.uint64) % np.uint64(7)).astype(np.int64)
    # single-substitution typo at position 3 for ids % 20 == 9;
    # ids % 20 == 19 stays an exact duplicate of the prior key
    typo = ids % 20 == 9
    mat[typo, 3] = np.uint8(ord("#"))
    flat = mat.tobytes()
    texts = [
        flat[i * 18 : i * 18 + int(lens[i])].decode("ascii") for i in range(len(ids))
    ]
    return pa.table({"doc_id": pa.array(ids, type=pa.int64()), "text": texts})


def _rss_mb() -> int:
    return round(resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    max_dist = int(sys.argv[2]) if len(sys.argv) > 2 else 1

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    import ray.data as rd

    from patito_ray.functions.editdist import edit_distance_near_dups

    ds = (
        rd.range(n, override_num_blocks=128)
        .map_batches(key_batch, batch_format="pyarrow", batch_size=None)
        .materialize()
    )

    t0 = time.time()
    pairs = edit_distance_near_dups(
        ds, id_col="doc_id", text_col="text", max_dist=max_dist, max_len=18
    ).materialize()
    wall = time.time() - t0

    # recall over the planted structure: (i-1, i) at dist 1 for i%20==9,
    # dist 0 for i%20==19 — count how many planted pairs were found
    planted = (n + 1) // 10  # ids i < n with i % 10 == 9
    found = 0
    for b in pairs.iter_batches(batch_format="pyarrow"):
        a = b.column("a").to_numpy(zero_copy_only=False)
        bb = b.column("b").to_numpy(zero_copy_only=False)
        found += int(((bb == a + 1) & (bb % 10 == 9)).sum())

    print(
        json.dumps(
            {
                "experiment": "edit_near_dups",
                "n": n,
                "max_dist": max_dist,
                "pairs": pairs.count(),
                "planted": planted,
                "planted_found": found,
                "sec": round(wall, 2),
                "keys_per_sec": round(n / wall),
                "driver_peak_rss_mb": _rss_mb(),
            }
        ),
        flush=True,
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
