"""Unigram-LM tokenizer at scale (VERDICT r4 item 7's scale number):
train over n deterministic docs, then measure encode throughput.

The training cost is bounded by the DISTINCT-WORD table (the corpus
generator's vocabulary is the bench word pool + per-doc numerics), so
corpus size mostly prices the counting pass and the encode pass —
exactly the 100-TB shape (EM never touches raw text again).

Usage: taskset -c 0-7 python scripts/scale_unigram.py [n_docs]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
NCPU = 8


def doc_batch(batch: pa.Table) -> pa.Table:
    from patito_ray.generate import page_texts

    ids = batch.column("id").to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "doc_id": pa.array(ids.astype(np.int64)),
            "text": pa.array(page_texts(ids.astype(np.int64))),
        }
    )


def main() -> None:
    os.environ.setdefault("POLARS_MAX_THREADS", str(NCPU))
    try:
        os.sched_setaffinity(0, set(range(NCPU)))
    except OSError:
        pass
    import ray

    ray.init(address="local", num_cpus=NCPU, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    from patito_ray.functions.unigram import train_unigram, unigram_encode_dataset
    from patito_ray.stages.agg import collect_table, merge_partial_sums

    ds = (
        rd.range(N, override_num_blocks=NCPU * 8)
        .map_batches(doc_batch, batch_format="pyarrow", batch_size=None)
        .materialize()
    )

    t0 = time.time()
    model = train_unigram(
        ds, vocab_size=400, seed_size=4000, max_piece_len=8, em_rounds=2
    )
    t_train = time.time() - t0

    t0 = time.time()
    enc = unigram_encode_dataset(ds, model, ids=False, out_col="n", concurrency=NCPU)
    sch = pa.schema([("k", pa.int64()), ("n", pa.int64())])
    parts = enc.map_batches(
        lambda t: pa.table(
            {"k": pa.array([0], pa.int64()),
             "n": pa.array([int(pc.sum(t.column("n")).as_py() or 0)], pa.int64())},
            schema=sch,
        ),
        batch_format="pyarrow",
        batch_size=None,
    )
    tot = merge_partial_sums(parts, ["k"], ["n"], limit_bytes=1 << 30)
    if not isinstance(tot, pa.Table):
        tot = collect_table(tot, empty_schema=sch)
    n_pieces = int(tot.column("n")[0].as_py())
    t_enc = time.time() - t0

    print(json.dumps({
        "docs": N,
        "vocab": int(model.num_rows),
        "train_sec": round(t_train, 1),
        "encode_sec": round(t_enc, 1),
        "total_pieces": n_pieces,
        "pieces_per_sec": round(n_pieces / t_enc, 0),
        "num_cpus": NCPU,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
