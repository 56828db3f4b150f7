"""Scale harness for the layout operators: ordered prefix sum /
sequence packing plan, full sequence materialization, epoch shuffle,
and train/val/test splits.

Corpus: n deterministic docs from the bench word-pool generator
(~160 whitespace tokens/doc, so 1M docs = ~160M tokens = ~78k packed
4096-token sequences). Everything prints one JSON line per experiment.

Usage: [taskset -c 0-7] python scripts/scale_pack.py [n_docs]
(pin to <= 8 CPUs on the sandbox host — see CLAUDE.md bench facts)
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


def doc_batch(batch: pa.Table) -> pa.Table:
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


def _emit(**kv) -> None:
    print(json.dumps({**kv, "driver_peak_rss_mb": _rss_mb()}), flush=True)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    seq_len = 4096

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    import ray.data as rd
    from ray.data.aggregate import Max, Sum

    from patito_ray.functions.packing import materialize_sequences, pack_sequences
    from patito_ray.functions.sampling import assign_splits, epoch_shuffle_positions
    from patito_ray.functions.text import token_count_array

    ds = (
        rd.range(n_docs, override_num_blocks=128)
        .map_batches(doc_batch, batch_format="pyarrow", batch_size=None)
        .materialize()
    )

    # --- packing plan (narrow: token counts -> prefix sum -> explode) ---
    import pyarrow.compute as pc

    def counts(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_tokens": pc.fill_null(token_count_array(t.column("text")), 0),
            }
        )

    narrow = ds.map_batches(counts, batch_format="pyarrow", batch_size=None)
    t0 = time.time()
    plan = pack_sequences(narrow, "doc_id", "n_tokens", seq_len).materialize()
    wall = time.time() - t0
    n_seg = plan.count()
    tok = plan.aggregate(Sum("n_tok"), Max("seq_id"))
    _emit(
        experiment="pack_sequences_plan",
        n_docs=n_docs,
        seq_len=seq_len,
        segments=int(n_seg),
        total_tokens=int(tok["sum(n_tok)"]),
        sequences=int(tok["max(seq_id)"]) + 1,
        sec=round(wall, 2),
        docs_per_sec=round(n_docs / wall),
    )

    # --- full materialization (plan + payload co-partition + assembly) ---
    t0 = time.time()
    seqs = materialize_sequences(ds, seq_len).materialize()
    wall = time.time() - t0
    n_seq = seqs.count()
    _emit(
        experiment="materialize_sequences",
        n_docs=n_docs,
        sequences=int(n_seq),
        sec=round(wall, 2),
        docs_per_sec=round(n_docs / wall),
    )

    # --- epoch shuffle positions ---
    t0 = time.time()
    pos = epoch_shuffle_positions(ds, "doc_id", epoch=1)
    mx = pos.aggregate(Max("pos"))["max(pos)"]
    wall = time.time() - t0
    assert mx == n_docs - 1, mx
    _emit(
        experiment="epoch_shuffle",
        n_docs=n_docs,
        sec=round(wall, 2),
        docs_per_sec=round(n_docs / wall),
    )

    # --- split assignment (pure per-batch pass) ---
    t0 = time.time()
    lab = assign_splits(ds, "doc_id", {"train": 0.98, "val": 0.01, "test": 0.01})
    n = lab.count()
    wall = time.time() - t0
    assert n == n_docs
    _emit(
        experiment="assign_splits",
        n_docs=n_docs,
        sec=round(wall, 2),
        docs_per_sec=round(n_docs / wall),
    )

    ray.shutdown()


if __name__ == "__main__":
    main()
