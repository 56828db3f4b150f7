"""Sequence packing: lay a corpus end-to-end into fixed-length training
sequences (GPT-style concatenation — every token kept, documents split
across sequence boundaries) and emit, per document, the segments it
contributes to each sequence.

The global token offset of every document is the one genuinely
sequential quantity; it comes from
:func:`patito_ray.stages.prefix.ordered_prefix_sum` (one narrow
exchange). Everything after that is a pure per-batch vectorized
explode: a document starting at global token ``b`` with ``n`` tokens
covers sequences ``b // L .. (b+n-1) // L`` and each overlap is an
interval intersection — no Python loop over rows, no second shuffle.

Output columns (one row per document x sequence overlap):
  ``seq_id``     which training sequence
  ``doc_begin``  first token of the segment, as an offset into the doc
  ``seq_begin``  where the segment lands inside the sequence
  ``n_tok``      segment length

A writer materializing actual token arrays would group this plan by
``seq_id``; the plan itself is the hard distributed part and is what
the SQL oracle checks exactly (DuckDB: window cumsum + lateral
generate_series).

No reference counterpart — JakobGM/patito has no notion of training
sequences; this is LLM-pipeline surface built on the same engine.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa


def explode_segments(
    t: pa.Table, id_col: str, tokens_col: str, seq_len: int, offset_col: str
) -> pa.Table:
    """Vectorized doc -> (doc x sequence) segment explode."""
    ids = t.column(id_col)
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    n = t.column(tokens_col).to_numpy(zero_copy_only=False).astype(np.int64)
    begin = t.column(offset_col).to_numpy(zero_copy_only=False).astype(np.int64)

    keep = n > 0  # empty docs occupy no tokens, so no segment
    n, begin = n[keep], begin[keep]
    ids = ids.filter(pa.array(keep))
    if n.size == 0:
        empty = pa.array([], type=pa.int64())
        return pa.table(
            {
                id_col: pa.array([], type=ids.type),
                "seq_id": empty,
                "doc_begin": empty,
                "seq_begin": empty,
                "n_tok": empty,
            }
        )

    first = begin // seq_len
    last = (begin + n - 1) // seq_len
    counts = last - first + 1
    total = int(counts.sum())
    parent = np.repeat(np.arange(counts.size), counts)
    # step index within each doc's run of sequences
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    step = np.arange(total) - np.repeat(starts, counts)
    seq = first[parent] + step

    gstart = np.maximum(begin[parent], seq * seq_len)
    gend = np.minimum(begin[parent] + n[parent], (seq + 1) * seq_len)
    return pa.table(
        {
            id_col: ids.take(pa.array(parent, type=pa.int64())),
            "seq_id": pa.array(seq),
            "doc_begin": pa.array(gstart - begin[parent]),
            "seq_begin": pa.array(gstart - seq * seq_len),
            "n_tok": pa.array(gend - gstart),
        }
    )


def pack_sequences(
    ds: Any,
    id_col: str,
    tokens_col: str,
    seq_len: int,
    num_partitions: int | None = None,
) -> Any:
    """Packing plan for concatenating docs (in ``id_col`` order) into
    back-to-back sequences of ``seq_len`` tokens. ``tokens_col`` is the
    per-doc token count (int); ids must be unique integers."""
    from patito_ray.stages.prefix import ordered_prefix_sum

    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    narrow = ds.select_columns([id_col, tokens_col])
    with_off = ordered_prefix_sum(
        narrow, id_col, tokens_col, out_col="_off", num_partitions=num_partitions
    )
    return with_off.map_batches(
        lambda t: explode_segments(t, id_col, tokens_col, seq_len, "_off")
        if t.num_rows and id_col in t.column_names
        else pa.table(
            {
                id_col: pa.array([], type=pa.int64()),
                "seq_id": pa.array([], type=pa.int64()),
                "doc_begin": pa.array([], type=pa.int64()),
                "seq_begin": pa.array([], type=pa.int64()),
                "n_tok": pa.array([], type=pa.int64()),
            }
        ),
        batch_format="pyarrow",
        batch_size=None,
    )
