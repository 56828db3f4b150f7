"""Scale harness for benchmark decontamination: 1M-doc corpus vs a
2k-doc eval set, 1000 of whose documents are verbatim corpus members
(planted contamination with known ids — recall must be 1000/1000).

The corpus pass has ZERO exchange (broadcast gram set + bincount), so
wall time should scale linearly with corpus bytes; the benchmark side
is one tiny pass. Usage: taskset -c 0-7 python scripts/scale_decontam.py [n_docs]
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

N_PLANTED = 1000
N_EVAL_ONLY = 1000


def doc_batch(batch: pa.Table) -> pa.Table:
    from patito_ray.generate import page_texts

    ids = batch.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table(
        {"doc_id": pa.array(ids, type=pa.int64()), "text": pa.array(page_texts(ids))}
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

    from patito_ray.functions.decontaminate import decontaminate
    from patito_ray.generate import page_texts

    ds = (
        rd.range(n_docs, override_num_blocks=256)
        .map_batches(doc_batch, batch_format="pyarrow", batch_size=None)
        .materialize()
    )

    # benchmark: every 997th corpus doc verbatim (planted, known ids)
    # plus eval-only texts from ids far outside the corpus id range
    planted_ids = np.arange(N_PLANTED, dtype=np.int64) * 997 % n_docs
    planted_ids = np.unique(planted_ids)[:N_PLANTED]
    eval_ids = np.arange(N_EVAL_ONLY, dtype=np.int64) + 10 * n_docs
    bench = rd.from_arrow(
        pa.table(
            {"text": pa.array(page_texts(planted_ids) + page_texts(eval_ids))}
        )
    )

    t0 = time.time()
    flagged = (
        decontaminate(ds, bench, n=8, mode="overlap", concurrency=8)
        .materialize()
    )
    wall = time.time() - t0
    flagged_ids = set()
    for ref in flagged.to_arrow_refs():
        t = ray.get(ref)
        flagged_ids.update(t.column("doc_id").to_pylist())
    # a doc shorter than n tokens HAS no n-gram: correctly unflaggable
    import re

    eligible = [
        i
        for i, txt in zip(planted_ids.tolist(), page_texts(planted_ids))
        if len(re.findall(r"\S+", txt)) >= 8
    ]
    planted_found = sum(1 for i in eligible if i in flagged_ids)

    print(
        json.dumps(
            {
                "experiment": "decontaminate",
                "n_docs": n_docs,
                "bench_docs": int(len(planted_ids) + N_EVAL_ONLY),
                "flagged_docs": len(flagged_ids),
                "planted_recall": f"{planted_found}/{len(eligible)}",
                "sec": round(wall, 2),
                "docs_per_sec": round(n_docs / wall),
                "driver_peak_rss_mb": round(
                    resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
                ),
            }
        ),
        flush=True,
    )
    assert planted_found == len(eligible), "planted contamination missed"
    ray.shutdown()


if __name__ == "__main__":
    main()
