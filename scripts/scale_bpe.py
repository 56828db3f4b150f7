"""Scale harness for the BPE tokenizer: train a vocabulary over n
deterministic web-page docs, then encode the full corpus with the
actor-pool stage.

Usage: python scripts/scale_bpe.py [n_docs] [num_merges]
Prints one JSON line per experiment.
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time

import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def doc_batch(batch: pa.Table) -> pa.Table:
    import numpy as np

    from patito_ray.generate import page_texts

    ids = batch.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "text": pa.array(page_texts(ids)),
        }
    )


def _rss_mb() -> int:
    return round(resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    num_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 500

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    import ray.data as rd
    from ray.data.aggregate import Sum

    from patito_ray.functions.bpe import bpe_encode_dataset, train_bpe

    ds = (
        rd.range(n_docs, override_num_blocks=128)
        .map_batches(doc_batch, batch_format="pyarrow", batch_size=None)
        .materialize()
    )

    t0 = time.time()
    merges, vocab = train_bpe(
        ds, num_merges=num_merges, min_word_count=2
    )
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "experiment": "bpe_train",
                "n_docs": n_docs,
                "num_merges": int(merges.num_rows),
                "vocab_size": int(vocab.num_rows),
                "sec": round(wall, 2),
                "docs_per_sec": round(n_docs / wall),
                "driver_peak_rss_mb": _rss_mb(),
            }
        ),
        flush=True,
    )

    t0 = time.time()
    enc = bpe_encode_dataset(ds, merges, vocab, concurrency=8)
    total = enc.aggregate(Sum("n_bpe"))["sum(n_bpe)"]
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "experiment": "bpe_encode",
                "n_docs": n_docs,
                "total_bpe_tokens": int(total),
                "sec": round(wall, 2),
                "docs_per_sec": round(n_docs / wall),
                "tokens_per_sec": round(int(total) / wall),
                "driver_peak_rss_mb": _rss_mb(),
            }
        ),
        flush=True,
    )

    ray.shutdown()


if __name__ == "__main__":
    main()
