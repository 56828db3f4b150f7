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
import pyarrow.compute as pc


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


def materialize_sequences(
    docs: Any,
    seq_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int | None = None,
) -> Any:
    """End-to-end packed sequences: the packing PLAN (narrow ints only)
    plus two co-location exchanges that actually build each training
    sequence's text from whitespace tokens.

    1. plan: token counts -> :func:`pack_sequences` (only (id, n) moves)
    2. segment build: plan rows co-partition with doc payloads on the
       doc id (`copartition_apply`, the engine's tagged-union exchange);
       inside each partition the docs are tokenized ONCE and every
       plan row gathers its token slice through a flat-offsets +
       LargeListArray build — no Python per row
    3. assembly: segments co-locate on seq_id (one hash exchange);
       each partition sorts by (seq_id, seq_begin) and run-length
       joins segments per sequence with binary_join

    Output: (seq_id, seq_text, n_tok) — every sequence except the last
    has exactly ``seq_len`` tokens. Token = RE2 ``\\S+`` run, joined by
    single spaces (the corpus-normalized form; a BPE materializer
    would swap the tokenizer, the exchanges stay identical).
    """
    from patito_ray.stages.exchange import hash_partition_ids
    from patito_ray.stages.join import copartition_apply, default_num_partitions
    from patito_ray.functions.text import token_count_array
    from patito_ray.functions.tfidf import re2_split_tokens

    if num_partitions is None:
        num_partitions = default_num_partitions()

    def counts(t: pa.Table) -> pa.Table:
        # null text = zero tokens (occupies nothing in the layout)
        n = pc.fill_null(token_count_array(t.column(text_col)), 0)
        return pa.table({"_pid": t.column(id_col), "n_tokens": n})

    narrow = docs.map_batches(counts, batch_format="pyarrow", batch_size=None)
    plan = pack_sequences(narrow, "_pid", "n_tokens", seq_len, num_partitions)

    def part_fn(plan_t: pa.Table, docs_t: pa.Table) -> pa.Table:
        if plan_t.num_rows == 0:
            return pa.table(
                {
                    "seq_id": pa.array([], type=pa.int64()),
                    "seq_begin": pa.array([], type=pa.int64()),
                    "n_tok": pa.array([], type=pa.int64()),
                    "seg": pa.array([], type=pa.string()),
                }
            )
        flat, parents, n_docs = re2_split_tokens(docs_t.column(text_col))
        tok_starts = np.zeros(n_docs + 1, dtype=np.int64)
        np.add.at(tok_starts, parents + 1, 1)
        tok_starts = np.cumsum(tok_starts)

        idx = pc.index_in(plan_t.column("_pid"), value_set=docs_t.column(id_col))
        if idx.null_count:
            raise ValueError(
                "packing plan references doc ids missing from the corpus "
                "partition — plan and docs must come from the same table"
            )
        idx_np = idx.to_numpy(zero_copy_only=False).astype(np.int64)
        db = plan_t.column("doc_begin").to_numpy(zero_copy_only=False)
        nt = plan_t.column("n_tok").to_numpy(zero_copy_only=False)
        seg_start = tok_starts[idx_np] + db
        total = int(nt.sum())
        seg_offsets = np.concatenate(([0], np.cumsum(nt)))
        gather = np.arange(total) + np.repeat(seg_start - seg_offsets[:-1], nt)
        vals = flat.take(pa.array(gather, type=pa.int64()))
        la = pa.LargeListArray.from_arrays(pa.array(seg_offsets), vals)
        return pa.table(
            {
                "seq_id": plan_t.column("seq_id"),
                "seq_begin": plan_t.column("seq_begin"),
                "n_tok": plan_t.column("n_tok"),
                "seg": pc.binary_join(la, " "),
            }
        )

    segs = copartition_apply(
        plan, docs, "_pid", id_col, part_fn, num_partitions=num_partitions
    )

    def tag(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "seq_id" not in t.column_names:
            return pa.table(
                {
                    "seq_id": pa.array([], type=pa.int64()),
                    "seq_begin": pa.array([], type=pa.int64()),
                    "n_tok": pa.array([], type=pa.int64()),
                    "seg": pa.array([], type=pa.string()),
                    "p2": pa.array([], type=pa.int64()),
                }
            )
        part = hash_partition_ids(
            t.column("seq_id"), num_partitions, "materialize_sequences seq_id"
        )
        return t.append_column("p2", pa.array(part, type=pa.int64()))

    def assemble(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "seq_id" not in group.column_names:
            return pa.table(
                {
                    "seq_id": pa.array([], type=pa.int64()),
                    "seq_text": pa.array([], type=pa.string()),
                    "n_tok": pa.array([], type=pa.int64()),
                }
            )
        sid = group.column("seq_id").to_numpy(zero_copy_only=False)
        sb = group.column("seq_begin").to_numpy(zero_copy_only=False)
        order = np.lexsort((sb, sid))
        t = group.take(pa.array(order))
        sid = sid[order]
        # run boundaries per sequence
        starts = np.concatenate(([0], np.flatnonzero(sid[1:] != sid[:-1]) + 1))
        offsets = np.concatenate((starts, [sid.size]))
        la = pa.LargeListArray.from_arrays(
            pa.array(offsets.astype(np.int64)), t.column("seg").combine_chunks()
        )
        ntok = t.column("n_tok").to_numpy(zero_copy_only=False)
        sums = np.add.reduceat(ntok, starts)
        return pa.table(
            {
                "seq_id": pa.array(sid[starts]),
                "seq_text": pc.binary_join(la, " "),
                "n_tok": pa.array(sums.astype(np.int64)),
            }
        )

    tagged = segs.map_batches(tag, batch_format="pyarrow", batch_size=None)
    return tagged.groupby("p2").map_groups(assemble, batch_format="pyarrow")
