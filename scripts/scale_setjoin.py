"""Scale harness for the exact Jaccard-threshold set-similarity join
on a REALISTIC corpus shape: every document carries a handful of rare
tokens (names/numbers/typos on real web text), so rare-token prefixes
keep candidate volume near the true pair count — the regime prefix
filtering is built for (the synthetic documents table's 31-word vocab
is the documented adversarial case, where candidates are inherently
Ω(output) and MinHash is the right tool).

Corpus: n docs, each 10 rare tokens (~unique per doc, drawn from a
2^30 pool) + 30 common tokens (5k vocab). 1000 planted PAIRS: member B
copies member A but replaces 4 of the common tokens with fresh rare
ones -> |A ∩ B| = 36, |A ∪ B| = 44, jaccard = 9/11 ≈ 0.818 >= 0.8,
while random doc pairs share only a few common tokens (jaccard << 0.5).
The check is exact: all 1000 planted pairs found at jaccard 9/11, zero
other pairs.

Usage: taskset -c 0-7 python scripts/scale_setjoin.py [n_docs]
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

N_RARE = 10
N_COMMON = 30
N_REPLACED = 4
COMMON_VOCAB = 5000
N_PAIRS = 1000
EXPECTED_JAC = 36 / 44


def doc_batch(batch: pa.Table, n_docs: int) -> pa.Table:
    ids = batch.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
    half = n_docs // 2
    # pair member B (ids in [half, half+N_PAIRS)) mirrors A = id - half
    is_b = (ids >= half) & (ids < half + N_PAIRS)
    base = np.where(is_b, ids - half, ids).astype(np.int64)
    pos_r = np.arange(N_RARE, dtype=np.uint64)
    rare = _splitmix(
        _splitmix(base.view(np.uint64)[:, None] ^ np.uint64(0xBEEF))
        ^ _splitmix(pos_r[None, :] + np.uint64(11))
    ) % np.uint64(1 << 30)
    # slot i draws from a disjoint vocab stripe -> a doc's common
    # tokens are DISTINCT by construction (independent draws from a 5k
    # vocab would repeat within ~9% of docs and shift the planted
    # jaccard off 36/44)
    pos_c = np.arange(N_COMMON, dtype=np.uint64)
    stripe = np.uint64(COMMON_VOCAB // N_COMMON)
    common = pos_c[None, :] * stripe + (
        _splitmix(
            _splitmix(base.view(np.uint64)[:, None] ^ np.uint64(0xF00D))
            ^ _splitmix(pos_c[None, :] + np.uint64(7))
        )
        % stripe
    )
    # B replaces its first N_REPLACED common tokens with fresh rares
    fresh = (
        _splitmix(
            _splitmix(ids.view(np.uint64)[:, None] ^ np.uint64(0xFEED))
            ^ _splitmix(pos_c[None, :N_REPLACED] + np.uint64(3))
        )
        % np.uint64(1 << 30)
    ) + np.uint64(1 << 30)  # disjoint from the rare pool
    # vectorized assembly for the bulk (A-shape) rows; the <= N_PAIRS
    # B rows per corpus get a python fix-up
    cols = [np.char.mod("r%d", rare[:, i].astype(np.int64)) for i in range(N_RARE)]
    cols += [
        np.char.mod("c%d", common[:, i].astype(np.int64)) for i in range(N_COMMON)
    ]
    text = cols[0]
    for c in cols[1:]:
        text = np.char.add(np.char.add(text, " "), c)
    texts = text.astype(object)
    for r in np.flatnonzero(is_b):
        toks = [f"r{v}" for v in rare[r]]
        toks += [f"r{v}" for v in fresh[r]]
        toks += [f"c{v}" for v in common[r][N_REPLACED:]]
        texts[r] = " ".join(toks)
    return pa.table(
        {"doc_id": pa.array(ids, type=pa.int64()), "text": texts.tolist()}
    )


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=8, include_dashboard=False,
            logging_level="ERROR",
        )
    import ray.data as rd

    from patito_ray.functions.setjoin import jaccard_threshold_pairs

    ds = (
        rd.range(n_docs, override_num_blocks=256)
        .map_batches(
            doc_batch,
            fn_kwargs={"n_docs": n_docs},
            batch_format="pyarrow",
            batch_size=None,
        )
        .materialize()
    )

    t0 = time.time()
    out = jaccard_threshold_pairs(ds, threshold=0.8)
    if not isinstance(out, pa.Table):
        out = out.materialize()
        tabs = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
        out = (
            pa.concat_tables(tabs)
            if tabs
            else pa.schema(
                [("a", pa.int64()), ("b", pa.int64()), ("jaccard", pa.float64())]
            ).empty_table()
        )
    wall = time.time() - t0

    a = out.column("a").to_numpy(zero_copy_only=False)
    b = out.column("b").to_numpy(zero_copy_only=False)
    j = out.column("jaccard").to_numpy(zero_copy_only=False)
    half = n_docs // 2
    planted = (b - a == half) & (a < N_PAIRS)
    ok_planted = int((np.abs(j[planted] - EXPECTED_JAC) < 1e-12).sum())
    rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6

    print(
        json.dumps(
            {
                "metric": "jaccard_join_scale",
                "n_docs": n_docs,
                "wall_s": round(wall, 1),
                "docs_per_sec": round(n_docs / wall),
                "pairs_found": int(out.num_rows),
                "planted_found": ok_planted,
                "planted_total": N_PAIRS,
                "false_pairs": int(out.num_rows - ok_planted),
                "driver_rss_gb": round(rss_gb, 2),
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
