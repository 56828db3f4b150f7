"""Span-level exact-substring duplication audit.

The operator behind suffix-array training-data dedup (Lee et al. 2022,
"Deduplicating Training Data Makes Language Models Better" — public
paper): find every length-``L`` character window that occurs in more
than one document, and report per document how many of its distinct
windows are cross-corpus duplicates. Line-level dedup
(``functions/linededup.py``) catches boilerplate lines; MinHash catches
whole-document near-dups; THIS catches long verbatim spans embedded in
otherwise-distinct documents (licence blocks, quoted passages, copied
paragraphs) — the variant the paper shows matters most for LM
memorization.

Ray-native shape (no suffix array — that is a single-machine
construction):

1. one ``map_batches`` pass computes BOTH 64-bit polynomial rolling
   hashes of every length-``L`` window directly over the Arrow string
   buffer (prefix-sum + modular-inverse trick: O(chars) work, no
   (n_windows x L) materialization), dedups (window, doc) pairs inside
   the batch with one lexsort, and emits narrow 24 B rows
   ``(h1, h2, doc_id)``;
2. a hash-partition exchange on ``h1`` co-locates equal windows; each
   partition counts documents per (h1, h2) run with one lexsort and
   reduces to per-doc partials ``(doc_id, n_grams, n_dup_grams)``;
3. the adaptive partial-sum merge (`stages.agg.merge_partial_sums`)
   finishes — driver polars under 256 MB, distributed groupby beyond.

Identity is the 128-bit pair (h1, h2): two independent odd-multiplier
polynomial hashes finalized with splitmix64 — collision probability
~n^2/2^128 (≈1e-14 even at 10^12 windows), so counts are exact for all
practical corpus sizes, with no payload re-shipment for confirmation.

``stride`` samples every s-th window start (per document, matching
DuckDB ``generate_series(1, n, s)``): at 100 TB the full window set is
O(corpus bytes) through the exchange; stride s divides exchange volume
by s while still catching any duplicated span of length >= L+s-1.

Reference framing: patito has no span operator; this extends the dedup
family (SURVEY.md §2 LLM-ops) alongside dedup.py / linededup.py.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from patito_ray.functions.dedup import _splitmix

# odd multipliers (golden-gamma and a xxhash prime) — odd => invertible
# mod 2^64, which the prefix-sum rolling hash needs
_R1 = 0x9E3779B97F4A7C15
_R2 = 0xC2B2AE3D27D4EB4F


def _inv_u64(a: int) -> int:
    """Inverse of odd ``a`` modulo 2^64 (Newton iteration, 6 steps)."""
    x = a  # x = a^{-1} mod 2^3 for odd a
    for _ in range(6):
        x = (x * (2 - a * x)) % (1 << 64)
    return x


_R1_INV = _inv_u64(_R1)
_R2_INV = _inv_u64(_R2)


def _rolling_hashes(
    data: np.ndarray, starts: np.ndarray, L: int, r: int, r_inv: int
) -> np.ndarray:
    """splitmix-finalized polynomial hash of ``data[s : s+L]`` for each
    start in ``starts``, in O(len(data)) vectorized work:
    ``H[s] = (S[s+L] - S[s]) * r^{-s}`` where ``S`` is the prefix sum of
    ``data[i] * r^i`` (all mod 2^64; numpy uint64 wraps exactly)."""
    n = len(data)
    rp = np.empty(n, dtype=np.uint64)
    if n:
        rp[0] = np.uint64(1)
        rp[1:] = np.uint64(r)
        np.multiply.accumulate(rp, out=rp)
    s = np.zeros(n + 1, dtype=np.uint64)
    if n:
        np.cumsum(data.astype(np.uint64) * rp, out=s[1:])
    rip = np.empty(n, dtype=np.uint64)
    if n:
        rip[0] = np.uint64(1)
        rip[1:] = np.uint64(r_inv)
        np.multiply.accumulate(rip, out=rip)
    h = (s[starts + L] - s[starts]) * rip[starts]
    return _splitmix(h)


def _batch_window_rows(
    t: pa.Table, text_col: str, id_col: str, L: int, stride: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(h1, h2, doc_id) for every DISTINCT (window, document) pair in
    the batch — windows never cross document boundaries, start offsets
    follow ``generate_series(1, n_chars - L + 1, stride)`` per doc."""
    text = t.column(text_col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    arr = pc.cast(pc.fill_null(text, ""), pa.large_string())
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n_rows = len(arr)
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
        arr.offset : arr.offset + n_rows + 1
    ].copy()
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)[offsets[0] : offsets[-1]]
    offsets -= offsets[0]
    empty = (np.empty(0, np.uint64), np.empty(0, np.uint64), np.empty(0, np.int64))
    if len(data) < L:
        return empty
    starts = np.arange(len(data) - L + 1, dtype=np.int64)
    rows = np.searchsorted(offsets, starts, side="right") - 1
    valid = starts + L <= offsets[rows + 1]
    if stride > 1:
        valid &= (starts - offsets[rows]) % stride == 0
    starts, rows = starts[valid], rows[valid]
    if len(starts) == 0:
        return empty
    h1 = _rolling_hashes(data, starts, L, _R1, _R1_INV)
    h2 = _rolling_hashes(data, starts, L, _R2, _R2_INV)
    ids = t.column(id_col)
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    if not pa.types.is_integer(ids.type) or ids.null_count:
        raise TypeError(
            f"duplicated_span_stats needs a non-null integer id column, "
            f"got {id_col!r}: {ids.type} with {ids.null_count} null(s)"
        )
    doc = pc.cast(ids, pa.int64()).to_numpy(zero_copy_only=False)[rows]
    # distinct (window, doc) inside the batch: one lexsort, keep run heads
    order = np.lexsort((h2, h1, doc))
    h1, h2, doc = h1[order], h2[order], doc[order]
    keep = np.empty(len(doc), dtype=bool)
    keep[0] = True
    keep[1:] = (doc[1:] != doc[:-1]) | (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])
    return h1[keep], h2[keep], doc[keep]


_PARTIAL_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("n_grams", pa.int64()), ("n_dup_grams", pa.int64())]
)


def duplicated_span_stats(
    ds: Any,
    text_col: str = "text",
    id_col: str = "doc_id",
    L: int = 20,
    stride: int = 1,
    num_partitions: int | None = None,
    limit_bytes: int | None = None,
) -> Any:
    """Per-document span-duplication profile: for every document with
    at least one length-``L`` window, ``n_grams`` distinct windows and
    ``n_dup_grams`` of them that are cross-document duplicates.

    Duplication here is CROSS-document: a window counts as duplicated
    iff it occurs in >= 2 distinct documents. Returns a ``pa.Table``
    (driver merge) or lazy ``Dataset`` (distributed merge) with columns
    ``doc_id, n_grams, n_dup_grams``.
    """
    if L < 2:
        raise ValueError(f"window length L must be >= 2, got {L}")
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")
    if num_partitions is None:
        from patito_ray.stages.join import default_num_partitions

        num_partitions = default_num_partitions()
    P = num_partitions

    def emit(t: pa.Table) -> pa.Table:
        h1, h2, doc = _batch_window_rows(t, text_col, id_col, L, stride)
        part = (h1 % np.uint64(P)).astype(np.int64)
        return pa.table(
            {
                "part": pa.array(part, type=pa.int64()),
                "h1": pa.array(h1.view(np.int64), type=pa.int64()),
                "h2": pa.array(h2.view(np.int64), type=pa.int64()),
                "doc_id": pa.array(doc, type=pa.int64()),
            }
        )

    def part_stats(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "h1" not in t.column_names:
            return _PARTIAL_SCHEMA.empty_table()
        import polars as pl

        h1 = t.column("h1").to_numpy(zero_copy_only=False)
        h2 = t.column("h2").to_numpy(zero_copy_only=False)
        doc = t.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, h2, h1))
        h1s, h2s, docs = h1[order], h2[order], doc[order]
        new = np.empty(len(h1s), dtype=bool)
        new[0] = True
        new[1:] = (h1s[1:] != h1s[:-1]) | (h2s[1:] != h2s[:-1])
        # cross-batch (window, doc) duplicates were already removed per
        # batch, but the same (window, doc) can arrive from TWO batches
        # holding the same document id — drop repeats inside the run
        same_doc = np.empty(len(h1s), dtype=bool)
        same_doc[0] = False
        same_doc[1:] = (~new[1:]) & (docs[1:] == docs[:-1])
        h1s, h2s, docs, new = (
            h1s[~same_doc],
            h2s[~same_doc],
            docs[~same_doc],
            new[~same_doc],
        )
        run_id = np.cumsum(new) - 1
        run_len = np.bincount(run_id)
        dup = (run_len[run_id] > 1).astype(np.int64)
        out = (
            pl.DataFrame({"doc_id": docs, "dup": dup})
            .group_by("doc_id")
            .agg(
                pl.len().cast(pl.Int64).alias("n_grams"),
                pl.col("dup").sum().alias("n_dup_grams"),
            )
        )
        return out.to_arrow().cast(_PARTIAL_SCHEMA)

    from patito_ray.stages.agg import merge_partial_sums

    rows = ds.map_batches(emit, batch_format="pyarrow", batch_size=None)
    partials = rows.groupby("part").map_groups(part_stats, batch_format="pyarrow")
    kwargs = {} if limit_bytes is None else {"limit_bytes": limit_bytes}
    return merge_partial_sums(
        partials, ["doc_id"], ["n_grams", "n_dup_grams"], **kwargs
    )
