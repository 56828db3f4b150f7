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
    t: pa.Table, text_col: str, id_col: str, L: int, stride: int,
    hash_rate: int = 1,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(h1, h2, doc_id) for every DISTINCT (window, document) pair in
    the batch — windows never cross document boundaries, start offsets
    follow ``generate_series(1, n_chars - L + 1, stride)`` per doc.
    ``hash_rate`` k > 1 additionally keeps only windows whose content
    hash clears 2^64/k (content-keyed 1/k sampling — both copies of a
    duplicated span make the SAME keep decision, unlike stride)."""
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
    if hash_rate > 1:
        # hashing all windows is vectorized O(bytes) local work; the
        # savings land where they matter — the exchange moves 1/k rows
        keep_m = h1 < np.uint64(2**64 // hash_rate)
        starts, rows, h1 = starts[keep_m], rows[keep_m], h1[keep_m]
        if len(starts) == 0:
            return empty
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


def _pack_blob_rows(
    bucket: "np.ndarray", cols: "list[np.ndarray]", names: "list[str]"
) -> pa.Table:
    """Pack per-row int64/uint64 columns into one binary blob row per
    bucket id: the exchange then moves (#batches x #buckets) rows
    instead of per-gram rows — Ray's sort shuffle pays per ROW, so this
    cuts its cost by ~10^4 (same trick as the uniqueness blob exchange,
    checks.batch_key_bucket_blobs)."""
    order = np.argsort(bucket, kind="stable")
    b = bucket[order]
    uniq, starts = np.unique(b, return_index=True)
    ends = np.append(starts[1:], len(b))
    sorted_cols = [c[order] for c in cols]
    out: dict[str, list] = {"bucket": uniq.astype(np.int64).tolist()}
    for name, c in zip(names, sorted_cols):
        out[name] = [
            c[s:e].tobytes() for s, e in zip(starts.tolist(), ends.tolist())
        ]
    return pa.table(
        {
            "bucket": pa.array(out["bucket"], type=pa.int32()),
            **{n: pa.array(out[n], type=pa.large_binary()) for n in names},
        }
    )


def _unpack_blob_col(group: pa.Table, name: str, dtype) -> "np.ndarray":
    if group.num_rows == 0:
        return np.empty(0, dtype)
    return np.concatenate(
        [np.frombuffer(b, dtype=dtype) for b in group.column(name).to_pylist()]
    )


def duplicated_span_stats(
    ds: Any,
    text_col: str = "text",
    id_col: str = "doc_id",
    L: int = 20,
    stride: int = 1,
    num_buckets: int = 64,
    hash_rate: int = 1,
) -> Any:
    """Per-document span-duplication profile: for every document with
    at least one length-``L`` window, ``n_grams`` distinct windows and
    ``n_dup_grams`` of them that are CROSS-document duplicates (the
    window occurs in >= 2 distinct documents). Returns a lazy
    ``Dataset`` with columns ``doc_id, n_grams, n_dup_grams``.

    Exchange shape: gram rows never ride the shuffle individually.
    Each batch packs its (h1, h2, doc) triples into one blob row per
    hash bucket (``_pack_blob_rows``), so BOTH exchanges — gram
    co-location and the per-doc partial merge — move only
    O(#batches x num_buckets) rows regardless of corpus size; all
    per-gram work is vectorized numpy inside bucket tasks. Measured:
    the naive per-row groupby exchange took >7 min for 1M docs /
    ~30M gram rows on the bench host; this shape runs the same input
    in well under a minute.

    The 100-TB volume knobs, measured by scripts/scale_span.py
    --stride-sweep (table in BASELINE.md): ``stride`` s keeps every
    s-th POSITION — a span duplicated at unrelated offsets in two
    documents co-samples only when the offsets agree mod s, so
    cross-document recall is ~1/s regardless of span length. Prefer
    ``hash_rate`` k (content-keyed 1/k sampling, winnowing-style):
    both copies of a window make the same keep decision, so a span
    with W = S - L + 1 windows is caught with prob 1 - (1 - 1/k)^W —
    ~1 once W >> k, at the same 1/k exchange volume. With either knob
    active, ``n_grams``/``n_dup_grams`` count SAMPLED windows (a
    sampled duplication profile, not the full census).
    """
    if L < 2:
        raise ValueError(f"window length L must be >= 2, got {L}")
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")
    if hash_rate < 1:
        raise ValueError(f"hash_rate must be >= 1, got {hash_rate}")
    if num_buckets < 2 or num_buckets & (num_buckets - 1):
        raise ValueError(f"num_buckets must be a power of two >= 2, got {num_buckets}")
    B = num_buckets
    shift = np.uint64(64 - (B - 1).bit_length())

    _gram_schema = pa.schema(
        [
            ("bucket", pa.int32()),
            ("h1b", pa.large_binary()),
            ("h2b", pa.large_binary()),
            ("docb", pa.large_binary()),
        ]
    )

    def emit(t: pa.Table) -> pa.Table:
        h1, h2, doc = _batch_window_rows(t, text_col, id_col, L, stride, hash_rate)
        if len(h1) == 0:
            return _gram_schema.empty_table()
        bucket = (h1 >> shift).astype(np.int64)
        return _pack_blob_rows(
            bucket, [h1, h2, doc.view(np.uint64)], ["h1b", "h2b", "docb"]
        )

    _partial_schema = pa.schema(
        [
            ("bucket", pa.int32()),
            ("docb", pa.large_binary()),
            ("ngb", pa.large_binary()),
            ("ndb", pa.large_binary()),
        ]
    )

    def bucket_stats(group: pa.Table) -> pa.Table:
        """One gram bucket: exact per-doc (n_grams, n_dup) for the
        grams living in this bucket, re-packed as doc-bucketed blobs."""
        if group.num_rows == 0 or "h1b" not in group.column_names:
            return _partial_schema.empty_table()
        h1 = _unpack_blob_col(group, "h1b", np.uint64)
        h2 = _unpack_blob_col(group, "h2b", np.uint64)
        doc = _unpack_blob_col(group, "docb", np.uint64).view(np.int64)
        order = np.lexsort((doc, h2, h1))
        h1s, h2s, docs = h1[order], h2[order], doc[order]
        new = np.empty(len(h1s), dtype=bool)
        new[0] = True
        new[1:] = (h1s[1:] != h1s[:-1]) | (h2s[1:] != h2s[:-1])
        # the same (gram, doc) pair can arrive from several batches
        # carrying the same document id — keep one per run
        same_doc = np.empty(len(h1s), dtype=bool)
        same_doc[0] = False
        same_doc[1:] = (~new[1:]) & (docs[1:] == docs[:-1])
        docs, new = docs[~same_doc], new[~same_doc]
        run_id = np.cumsum(new) - 1
        run_len = np.bincount(run_id)
        dup = (run_len[run_id] > 1).astype(np.int64)
        # per-doc reduction inside the bucket: sort by doc, segment sums
        d_order = np.argsort(docs, kind="stable")
        d_s, dup_s = docs[d_order], dup[d_order]
        heads = np.empty(len(d_s), dtype=bool)
        heads[0] = True
        heads[1:] = d_s[1:] != d_s[:-1]
        idx = np.flatnonzero(heads)
        uniq_docs = d_s[idx]
        n_grams = np.diff(np.append(idx, len(d_s))).astype(np.int64)
        n_dup = np.add.reduceat(dup_s, idx).astype(np.int64)
        db = (
            _splitmix(uniq_docs.view(np.uint64)) >> shift
        ).astype(np.int64)
        return _pack_blob_rows(
            db,
            [uniq_docs.view(np.uint64), n_grams.view(np.uint64), n_dup.view(np.uint64)],
            ["docb", "ngb", "ndb"],
        )

    def final_docs(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "docb" not in group.column_names:
            return _PARTIAL_SCHEMA.empty_table()
        doc = _unpack_blob_col(group, "docb", np.uint64).view(np.int64)
        ng = _unpack_blob_col(group, "ngb", np.uint64).view(np.int64)
        nd = _unpack_blob_col(group, "ndb", np.uint64).view(np.int64)
        order = np.argsort(doc, kind="stable")
        d_s, ng_s, nd_s = doc[order], ng[order], nd[order]
        heads = np.empty(len(d_s), dtype=bool)
        heads[0] = True
        heads[1:] = d_s[1:] != d_s[:-1]
        idx = np.flatnonzero(heads)
        return pa.table(
            {
                "doc_id": pa.array(d_s[idx], type=pa.int64()),
                "n_grams": pa.array(
                    np.add.reduceat(ng_s, idx).astype(np.int64), type=pa.int64()
                ),
                "n_dup_grams": pa.array(
                    np.add.reduceat(nd_s, idx).astype(np.int64), type=pa.int64()
                ),
            }
        )

    # Ray's sort shuffle pays ~O(in_blocks x out_partitions) scheduling
    # for tiny objects: a 256-block emit feeding a 256-partition sort
    # spent 46 s pure scheduling on <400 MB of blobs. Coalesce the blob
    # stream to ~CPU-count blocks first — the sort matrix collapses to
    # C x C and the same input runs the exchange in seconds. C tracks
    # cluster size (not a constant) so a big cluster still fans out.
    import ray

    cpus = (
        int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    )
    C = max(4, min(num_buckets, cpus))

    blobs = ds.map_batches(
        emit, batch_format="pyarrow", batch_size=None
    ).repartition(C)
    partials = blobs.groupby("bucket").map_groups(
        bucket_stats, batch_format="pyarrow"
    ).repartition(C)
    return partials.groupby("bucket").map_groups(
        final_docs, batch_format="pyarrow"
    )


def _batch_window_pos_rows(
    t: pa.Table, text_col: str, id_col: str, L: int, stride: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(h1, h2, doc_id, pos) for EVERY sampled window in the batch (no
    dedup — each position is its own output candidate). ``pos`` is the
    1-based start offset, matching SQL ``substr``/``generate_series(1,
    n - L + 1, stride)`` (byte == char on ASCII text)."""
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
    empty = (
        np.empty(0, np.uint64),
        np.empty(0, np.uint64),
        np.empty(0, np.int64),
        np.empty(0, np.int64),
    )
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
            f"duplicated_span_positions needs a non-null integer id column, "
            f"got {id_col!r}: {ids.type} with {ids.null_count} null(s)"
        )
    doc = pc.cast(ids, pa.int64()).to_numpy(zero_copy_only=False)[rows]
    pos = starts - offsets[rows] + 1
    return h1, h2, doc, pos


_POS_SCHEMA = pa.schema([("doc_id", pa.int64()), ("pos", pa.int64())])


def duplicated_span_positions(
    ds: Any,
    text_col: str = "text",
    id_col: str = "doc_id",
    L: int = 20,
    stride: int = 1,
    num_buckets: int = 64,
) -> Any:
    """The ACTIONABLE form of span dedup (Lee et al. 2022: strip the
    duplicated ranges, keep the rest): every (doc_id, pos) whose
    length-``L`` window occurs in >= 2 distinct documents, as a lazy
    Dataset — pos is the 1-based window start. A downstream pass can
    union-merge [pos, pos + L) intervals per doc and cut the text.

    Same exchange discipline as ``duplicated_span_stats`` — gram rows
    ride as per-bucket blobs, one row per (batch, bucket) — but only
    ONE exchange total: duplicated-position rows are final output, so
    the bucket task emits them directly instead of re-bucketing per-doc
    partials."""
    if L < 2:
        raise ValueError(f"window length L must be >= 2, got {L}")
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")
    if num_buckets < 2 or num_buckets & (num_buckets - 1):
        raise ValueError(f"num_buckets must be a power of two >= 2, got {num_buckets}")
    B = num_buckets
    shift = np.uint64(64 - (B - 1).bit_length())

    _gram_schema = pa.schema(
        [
            ("bucket", pa.int32()),
            ("h1b", pa.large_binary()),
            ("h2b", pa.large_binary()),
            ("docb", pa.large_binary()),
            ("posb", pa.large_binary()),
        ]
    )

    def emit(t: pa.Table) -> pa.Table:
        h1, h2, doc, pos = _batch_window_pos_rows(t, text_col, id_col, L, stride)
        if len(h1) == 0:
            return _gram_schema.empty_table()
        bucket = (h1 >> shift).astype(np.int64)
        return _pack_blob_rows(
            bucket,
            [h1, h2, doc.view(np.uint64), pos.view(np.uint64)],
            ["h1b", "h2b", "docb", "posb"],
        )

    def bucket_positions(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "h1b" not in group.column_names:
            return _POS_SCHEMA.empty_table()
        h1 = _unpack_blob_col(group, "h1b", np.uint64)
        h2 = _unpack_blob_col(group, "h2b", np.uint64)
        doc = _unpack_blob_col(group, "docb", np.uint64).view(np.int64)
        pos = _unpack_blob_col(group, "posb", np.uint64).view(np.int64)
        order = np.lexsort((pos, doc, h2, h1))
        h1, h2, doc, pos = h1[order], h2[order], doc[order], pos[order]
        run_head = np.empty(len(h1), dtype=bool)
        run_head[0] = True
        run_head[1:] = (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])
        doc_head = np.empty(len(h1), dtype=bool)
        doc_head[0] = True
        doc_head[1:] = run_head[1:] | (doc[1:] != doc[:-1])
        run_id = np.cumsum(run_head) - 1
        n_docs = np.bincount(run_id, weights=doc_head).astype(np.int64)
        keep = n_docs[run_id] >= 2
        return pa.table(
            {
                "doc_id": pa.array(doc[keep], type=pa.int64()),
                "pos": pa.array(pos[keep], type=pa.int64()),
            },
            schema=_POS_SCHEMA,
        )

    blobs = ds.map_batches(emit, batch_format="pyarrow", batch_size=None)
    import ray

    cpus = (
        int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    )
    C = max(4, min(num_buckets, cpus))
    return blobs.repartition(C).groupby("bucket").map_groups(
        bucket_positions, batch_format="pyarrow"
    )


_CLEAN_SCHEMA = pa.schema([("doc_id", pa.int64()), ("clean_text", pa.string())])


def cut_duplicated_spans(
    ds: Any,
    text_col: str = "text",
    id_col: str = "doc_id",
    L: int = 20,
    stride: int = 1,
    num_buckets: int = 64,
    num_partitions: int | None = None,
    broadcast_limit_bytes: int = 64 * 1024 * 1024,
) -> Any:
    """The full Lee-et-al cut pass: remove every character covered by a
    cross-document duplicated window and return the stitched remainder
    -> Dataset[doc_id, clean_text] (one row per input row; text
    positions are byte==char, i.e. ASCII — the rolling-hash windows are
    byte-level).

    Shape: ``duplicated_span_positions`` (one blob exchange) feeds the
    cut pass; inside each task the interval merge (gaps-and-islands via
    a grouped cumulative max), the kept-segment arithmetic, the
    per-segment slicing and the per-doc concat are ALL vectorized
    polars expressions — no per-doc Python. Untouched documents pass
    through by anti-join.

    The duplicated-position side is 16 B/position and usually tiny
    relative to the corpus; below ``broadcast_limit_bytes`` it
    broadcasts once (``ray.put``) and the corpus STREAMS through one
    map_batches — the full-text rows never ride an exchange. Beyond
    the limit (or at 0, for tests) both sides co-partition on doc id
    as before."""
    import polars as pl

    from patito_ray.stages.join import copartition_apply

    pos = duplicated_span_positions(
        ds, text_col, id_col, L, stride, num_buckets
    ).map_batches(
        lambda t: t.rename_columns(["_pd", "_pp"]),
        batch_format="pyarrow",
        batch_size=None,
    )

    def cut(lt: pa.Table, rt: pa.Table) -> pa.Table:
        docs = pl.from_arrow(lt.select([id_col, text_col])).rename(
            {id_col: "doc_id", text_col: "text"}
        )
        if rt.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pc.cast(lt.column(id_col), pa.int64()),
                    "clean_text": pc.cast(lt.column(text_col), pa.string()),
                },
                schema=_CLEAN_SCHEMA,
            )
        ivl = (
            pl.from_arrow(rt)
            .rename({"_pd": "doc_id", "_pp": "pos"})
            .with_columns(
                s=pl.col("pos") - 1,          # 0-based [s, e)
                e=pl.col("pos") - 1 + L,
            )
            .sort(["doc_id", "s"])
            # island break: start beyond the running max end so far
            .with_columns(
                prev_e=pl.col("e").cum_max().shift(1).over("doc_id")
            )
            .with_columns(
                brk=(
                    pl.col("prev_e").is_null() | (pl.col("s") > pl.col("prev_e"))
                ).cast(pl.Int64)
            )
            .with_columns(isl=pl.col("brk").cum_sum().over("doc_id"))
            .group_by(["doc_id", "isl"], maintain_order=True)
            .agg(s=pl.col("s").min(), e=pl.col("e").max())
        )
        # kept segments: gap BEFORE each island + tail after the last
        segs = (
            ivl.sort(["doc_id", "s"])
            .with_columns(
                seg_s=pl.col("e").shift(1, fill_value=0).over("doc_id"),
                seg_e=pl.col("s"),
            )
            .select(["doc_id", "seg_s", "seg_e"])
        )
        touched = ivl.group_by("doc_id").agg(last_e=pl.col("e").max()).join(
            docs, on="doc_id", how="inner"
        )
        tails = touched.select(
            "doc_id",
            seg_s=pl.col("last_e"),
            seg_e=pl.col("text").str.len_chars().cast(pl.Int64),
        )
        pieces = (
            pl.concat([segs, tails])
            .filter(pl.col("seg_e") > pl.col("seg_s"))
            .join(docs, on="doc_id", how="inner")
            .sort(["doc_id", "seg_s"])
            .with_columns(
                piece=pl.col("text").str.slice(
                    pl.col("seg_s"), pl.col("seg_e") - pl.col("seg_s")
                )
            )
            .group_by("doc_id", maintain_order=True)
            .agg(clean_text=pl.col("piece").str.concat(delimiter=""))
        )
        touched_ids = touched.select("doc_id")
        cleaned = touched_ids.join(pieces, on="doc_id", how="left").with_columns(
            clean_text=pl.col("clean_text").fill_null("")
        )
        untouched = docs.join(touched_ids, on="doc_id", how="anti").select(
            "doc_id", clean_text=pl.col("text")
        )
        return (
            pl.concat([cleaned, untouched])
            .sort("doc_id")
            .to_arrow()
            .cast(_CLEAN_SCHEMA)
        )

    if broadcast_limit_bytes:
        import ray

        pos_m = pos.materialize()
        if pos_m.size_bytes() <= broadcast_limit_bytes:
            tabs = [t for t in ray.get(pos_m.to_arrow_refs()) if t.num_rows]
            ptab = (
                pa.concat_tables(tabs)
                if tabs
                else pa.table(
                    {
                        "_pd": pa.array([], type=pa.int64()),
                        "_pp": pa.array([], type=pa.int64()),
                    }
                )
            )
            ref = ray.put(ptab)

            def cut_batch(batch: pa.Table) -> pa.Table:
                import ray as _ray

                pt = _ray.get(ref)
                if pt.num_rows:
                    ids = pc.cast(batch.column(id_col).combine_chunks(), pa.int64())
                    pt = pt.filter(pc.is_in(pt.column("_pd"), value_set=ids))
                return cut(batch, pt)

            return ds.map_batches(
                cut_batch, batch_format="pyarrow", batch_size=None
            )
        pos = pos_m
    return copartition_apply(
        ds, pos, by=id_col, right_by="_pd", part_fn=cut,
        num_partitions=num_partitions,
    )
