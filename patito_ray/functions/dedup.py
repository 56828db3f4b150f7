"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard verification, embedding-cosine near-dup.

Execution shapes (the ray_guide / SURVEY.md §4 patterns):
- exact: vectorized content-hash per batch -> two-phase groupby (the
  only wide stage); `dedup_exact_ids` shuffles just (hash, id) pairs,
  `dedup_exact` shuffles full rows when the deduped payload itself is
  needed downstream.
- MinHash+LSH: per-batch shingle->minhash (numpy, one pass over the
  flattened shingle hashes), explode to (band, band_hash, doc_id) rows,
  groupby the band key, emit candidate pairs per bucket, then verify
  exact n-gram Jaccard. Only band keys shuffle — signatures are
  (num_perm × 8) bytes/doc, candidates are the rare case.
- SimHash: 64-bit weighted-bit-majority fingerprint per doc; near-dups
  are buckets sharing band slices of the fingerprint.
"""

from __future__ import annotations

import logging
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from patito_ray.state.sketches import hash64

_LOG = logging.getLogger(__name__)

# Target pairs per co-partition task in the pair-payload exchange: each
# task is one vectorized join, so partition count adapts down when the
# pair set is small (Ray's fixed per-task latency otherwise dominates)
# and up to ~4x cluster CPUs at crawl scale.
_PAIRS_PER_PARTITION = 4096

# Memory ceiling per pair-exchange partition task: the per-partition
# polars join holds both sides' payloads in heap, so partition count
# must grow with payload volume regardless of cluster size.
_PAYLOAD_BYTES_PER_PARTITION = 128 * 1024 * 1024


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def add_content_hash(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """64-bit normalized-content hash column ``h`` (vectorized)."""
    text = batch.column(text_col)
    # trim only ' ' (like SQL trim()): after the RE2 \s+ collapse the
    # edge runs are single spaces; unicode-trim would additionally strip
    # chars outside RE2 \s (\x0b, NBSP) that the oracle keeps
    norm = pc.utf8_trim(
        pc.replace_substring_regex(pc.utf8_lower(text), r"\s+", " "),
        characters=" ",
    )
    # int64 view of the hash: Ray groupby keys must fit int64
    return batch.append_column(
        "h", pa.array(hash64(norm).view(np.int64), type=pa.int64())
    )


def dedup_exact_ids(ds: Any, text_col: str = "text", id_col: str = "doc_id") -> Any:
    """Narrow exact-dedup: -> Dataset of kept ids (min id per content
    hash). Shuffles only (h, id) pairs, 16 bytes/row; the merge is
    adaptive (driver polars below 256 MB of pairs, distributed
    groupby-Min beyond — dev notes on native-groupby latency)."""
    import ray.data as rd

    from patito_ray.stages.agg import merge_partial_mins

    pre = ds.map_batches(
        lambda t: add_content_hash(t, text_col).select(["h", id_col]),
        batch_format="pyarrow",
        batch_size=None,
    )
    kept = merge_partial_mins(pre, ["h"], [id_col])
    if isinstance(kept, pa.Table):
        return rd.from_arrow(kept.select([id_col]))
    return kept.select_columns([id_col])


def dedup_exact(
    ds: Any,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_limit_bytes: int = 256 * 1024 * 1024,
) -> Any:
    """Full exact-dedup: keep one row (min id) per content hash.

    Two phases, neither with per-group Python (a map_groups(head) over
    near-all-singleton hash groups would make one Python call per
    document): (1) ``dedup_exact_ids`` computes the kept-id set with a
    vectorized Min aggregation over narrow (hash, id) pairs; (2) the
    payload rows are selected by kept-id — broadcast ``is_in`` filter
    while the id set fits the object store comfortably, partitioned
    hash join beyond that."""
    kept = dedup_exact_ids(ds, text_col, id_col)
    return _select_rows_by_ids(ds, kept, id_col, broadcast_limit_bytes)


def _select_rows_by_ids(
    ds: Any, kept: Any, id_col: str, broadcast_limit_bytes: int
) -> Any:
    """Select ``ds`` rows whose id is in the (narrow) ``kept`` Dataset:
    broadcast ``is_in`` filter while the id set fits the object store
    comfortably, co-partitioned semi filter beyond that."""
    import pyarrow.compute as _pc
    import ray

    kept = kept.materialize()
    kept_bytes = kept.count() * 8
    if kept_bytes <= broadcast_limit_bytes:
        ids = pa.concat_arrays(
            [
                b.column(id_col).combine_chunks()
                for b in kept.iter_batches(batch_format="pyarrow")
                if b.num_rows
            ]
        ) if kept.count() else pa.array([], type=pa.int64())
        ref = ray.put(ids)

        def pick(batch: pa.Table) -> pa.Table:
            ks = ray.get(ref)
            return batch.filter(_pc.is_in(batch.column(id_col), value_set=ks))

        return ds.map_batches(pick, batch_format="pyarrow", batch_size=None)

    # kept-id set too large to broadcast: co-partitioned semi filter
    # (robust to the empty-block failure mode of Ray's native join)
    from patito_ray.stages.join import copartition_apply

    kept2 = kept.map_batches(
        lambda t: t.rename_columns(["_kept_id"]),
        batch_format="pyarrow",
        batch_size=None,
    )

    def semi(lt: pa.Table, rt: pa.Table) -> pa.Table:
        return lt.filter(
            _pc.is_in(
                lt.column(id_col), value_set=rt.column("_kept_id").combine_chunks()
            )
        )

    return copartition_apply(
        ds, kept2, by=id_col, right_by="_kept_id", part_fn=semi, num_partitions=64
    )



def content_hashes(ds: Any, text_col: str = "text") -> Any:
    """Narrow Dataset[h] of a corpus's normalized-content hashes — the
    8 B/doc artifact a dedup run persists (``write_parquet``) so the
    NEXT crawl can dedup incrementally against it without re-reading
    the previous corpus."""
    return ds.map_batches(
        lambda t: add_content_hash(t, text_col).select(["h"]),
        batch_format="pyarrow",
        batch_size=None,
    )


def dedup_exact_incremental(
    ds: Any,
    prev_hashes: Any,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_limit_bytes: int = 256 * 1024 * 1024,
) -> Any:
    """Cross-run exact dedup: keep one row (min id) per content hash,
    dropping every doc whose hash already appeared in a PREVIOUS corpus
    (``prev_hashes``: a Dataset with column ``h`` — typically
    ``content_hashes`` parquet written by the prior run, read back
    lazily).

    The previous corpus rides the SAME narrow Min-groupby exchange as
    within-corpus dedup: its hashes enter as (h, id=-1) sentinel rows,
    the sentinel wins every Min against real (non-negative) ids, and
    kept ids are the survivors >= 0. No broadcast of the previous
    corpus, no driver materialization — at 100 TB the prior-crawl hash
    set is itself billions of rows and must stream through the shuffle
    like everything else. Requires non-negative ids (checked per batch).
    """

    def new_rows(t: pa.Table) -> pa.Table:
        ids = t.column(id_col)
        lo = pc.min(ids).as_py()
        if lo is not None and lo < 0:
            raise ValueError(
                f"dedup_exact_incremental requires non-negative {id_col!r} "
                "(−1 is the already-seen sentinel)"
            )
        return add_content_hash(t, text_col).select(["h", id_col])

    def prev_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "h": pc.cast(t.column("h").combine_chunks(), pa.int64()),
                id_col: pa.array(
                    np.full(t.num_rows, -1, dtype=np.int64), type=pa.int64()
                ),
            }
        )

    import ray.data as rd

    from patito_ray.stages.agg import merge_partial_mins

    pre = ds.map_batches(new_rows, batch_format="pyarrow", batch_size=None).union(
        prev_hashes.map_batches(prev_rows, batch_format="pyarrow", batch_size=None)
    )
    merged = merge_partial_mins(pre, ["h"], [id_col])

    def survivors(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t.column(id_col), 0)).select([id_col])

    if isinstance(merged, pa.Table):
        kept = rd.from_arrow(survivors(merged))
    else:
        kept = merged.map_batches(
            survivors, batch_format="pyarrow", batch_size=None
        )
    return _select_rows_by_ids(ds, kept, id_col, broadcast_limit_bytes)


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def _shingle_hashes(
    text: pa.Array, n: int = 3, ascii_ws: bool = False
) -> tuple[np.ndarray, np.ndarray, int]:
    """Word n-gram shingle hashes per doc, flattened.

    Returns (flat_shingle_hashes, row_index_per_shingle, n_rows).
    Shingle hash = combination of the n token hashes (rolling mix) —
    all vectorized over the flattened token array.

    ``ascii_ws=True`` tokenizes with RE2 \\s semantics ([\\t\\n\\f\\r ]
    only) so the hash-set grams are EXACTLY ``_grams``/``_re2_tokens``
    under hashing — the mode the exact-verify kernel needs to agree
    with the SQL oracle's regexp_extract_all('\\S+') on exotic
    whitespace (\\x0b, NBSP stay inside tokens). The default unicode
    splitter is fine for the recall-only signature/banding paths.

    Short-doc fallback: a doc with 1..n-1 tokens yields no full n-gram,
    which would leave its signature at the all-max sentinel and make
    every short doc collide with every other one (and ngram-verify as
    jaccard 1.0). Such docs instead get ONE shingle — the hash of their
    full normalized token sequence — so two DIFFERENT short docs hash
    apart while identical ones still collide. Zero-token docs keep the
    sentinel signature and are excluded from banding entirely.
    """
    lower = pc.utf8_lower(text)
    if ascii_ws:
        toks = pc.split_pattern_regex(lower, pattern=r"[\t\n\f\r ]+")
    else:
        toks = pc.utf8_split_whitespace(lower)
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    # drop arrow's empty tokens (leading/trailing/multi whitespace):
    # python .split() — the exact-verify tokenizer — never emits them
    keep = pc.fill_null(pc.not_equal(flat, ""), False)
    if not pc.all(keep).as_py():
        parents = parents[keep.to_numpy(zero_copy_only=False)]
        flat = flat.filter(keep)
    th = hash64(flat)
    n_rows = len(text)
    if len(th) == 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64), n_rows
    # rolling n-gram combine: h_i = mix(th_i, th_{i+1}, ..., th_{i+n-1})
    # only valid where all n tokens share the same row
    m = th.copy()
    valid = np.ones(len(th), dtype=bool)
    for k in range(1, n):
        shifted = np.roll(th, -k)
        same_row = np.roll(parents, -k) == parents
        m = (m * np.uint64(1099511628211)) ^ shifted
        valid &= same_row
    if n > 1:
        # np.roll wraps: the last n-1 positions peeked at the array head
        valid[len(th) - (n - 1) :] = False
    shingles, rows = m[valid], parents[valid]
    n_tokens = np.bincount(parents, minlength=n_rows)
    short = (n_tokens > 0) & (n_tokens < n)
    if short.any():
        idx = np.nonzero(short)[0]
        # normalize like _grams' " ".join(tokens): collapse all
        # whitespace runs to single spaces and trim. In ascii_ws mode
        # trim ONLY ' ' — after the RE2 \s+ collapse the edge runs are
        # single spaces, and a unicode trim would strip chars (\x0b,
        # NBSP) that _re2_tokens keeps inside tokens.
        collapsed = pc.replace_substring_regex(lower, r"\s+", " ")
        joined = (
            pc.utf8_trim(collapsed, characters=" ")
            if ascii_ws
            else pc.utf8_trim_whitespace(collapsed)
        )
        jh = hash64(joined.take(pa.array(idx)))
        shingles = np.concatenate([shingles, jh])
        rows = np.concatenate([rows, idx.astype(np.int64)])
    return shingles, rows, n_rows


_MINHASH_SALTS: np.ndarray | None = None


def _salts(num_perm: int) -> np.ndarray:
    global _MINHASH_SALTS
    if _MINHASH_SALTS is None or len(_MINHASH_SALTS) < num_perm:
        # seeded rng: growing the table keeps every existing prefix
        # byte-identical, so signatures are stable across num_perm
        rng = np.random.default_rng(12345)
        _MINHASH_SALTS = rng.integers(0, 2**64, max(256, num_perm), dtype=np.uint64)
    return _MINHASH_SALTS[:num_perm]


def _splitmix(z: np.ndarray) -> np.ndarray:
    z = (z + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    return z ^ (z >> np.uint64(31))


def minhash_signatures(
    text: pa.Array, num_perm: int = 128, shingle_n: int = 3
) -> np.ndarray:
    """(n_rows, num_perm) uint64 MinHash signature matrix.

    One permutation = xor-salt + splitmix rehash of the shingle hash;
    per-row minimum via ``np.minimum.reduceat`` over the row-sorted
    flattened shingle array (contiguous C reduction — ~6x faster than
    the unbuffered ``np.minimum.at`` scatter). No per-document Python.
    """
    flat, rows, n_rows = _shingle_hashes(text, shingle_n)
    sig = np.full((n_rows, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    if len(flat) == 0:
        return sig
    if not (np.diff(rows) >= 0).all():
        order = np.argsort(rows, kind="stable")
        rows, flat = rows[order], flat[order]
    present, starts = np.unique(rows, return_index=True)
    salts = _salts(num_perm)
    for j in range(num_perm):
        h = _splitmix(flat ^ salts[j])
        sig[present, j] = np.minimum.reduceat(h, starts)
    return sig


def band_rows(
    batch: pa.Table,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 128,
    bands: int = 16,
) -> pa.Table:
    """Explode each doc into (band, band_hash, id) rows — the LSH keys
    that get shuffled. rows_per_band = num_perm // bands."""
    text = batch.column(text_col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    sig = minhash_signatures(text, num_perm)
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    # zero-shingle docs (empty/whitespace-only) keep the all-max
    # sentinel signature; banding them would make every empty doc
    # collide with every other. They cannot be near-dups of anything
    # with content, so they simply don't participate in LSH.
    live = sig[:, 0] != np.iinfo(np.uint64).max
    if not live.all():
        sig, ids = sig[live], ids[live]
    r = num_perm // bands
    out_band = np.repeat(np.arange(bands, dtype=np.int32), len(ids))
    out_id = np.tile(ids, bands)
    hashes = np.empty(bands * len(ids), dtype=np.uint64)
    for b in range(bands):
        chunk = sig[:, b * r : (b + 1) * r]
        acc = chunk[:, 0].copy()
        for j in range(1, r):
            acc = (acc * np.uint64(1099511628211)) ^ chunk[:, j]
        hashes[b * len(ids) : (b + 1) * len(ids)] = acc
    return pa.table(
        {
            "band": pa.array(out_band, type=pa.int32()),
            "band_hash": pa.array(hashes.view(np.int64), type=pa.int64()),
            id_col: pa.array(out_id),
        }
    )


def minhash_candidate_pairs(
    ds: Any,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 128,
    bands: int = 16,
    max_bucket: int = 200,
    max_collision_keys: int = 10_000_000,
) -> Any:
    """MinHash-LSH candidate pairs -> Dataset[a, b] (a < b, distinct).

    Execution shape (scale-critical): almost every LSH bucket is a
    singleton, so per-bucket Python (``map_groups``) over ALL buckets
    would make millions of calls doing nothing. Instead:

    1. band rows with a combined int64 bucket key (one row per doc per
       band — the only wide data);
    2. ONE bucketed-blob exchange finds colliding keys (count >= 2) —
       the rare case;
    3. the colliding-key set broadcasts; band rows filter against it
       per batch (no shuffle of non-colliding rows);
    4. pairs form WORKER-side: ``groupby(key).map_groups`` over the
       colliding subset only emits each bucket's id combinations, and
       one tiny groupby dedups pairs that collided in several bands.
       Nothing pair-shaped ever concentrates on the driver, so a
       duplicate-heavy crawl (collision set O(corpus)) streams through.

    ``max_bucket`` caps ids per bucket (hot-bucket guard: a bucket of k
    ids emits k(k-1)/2 pairs); ``max_collision_keys`` bounds the
    broadcast key set. Both caps LOG a warning with the dropped volume
    when they truncate — never silent.
    """
    import pyarrow.compute as _pc
    import ray

    def keyed_rows(t: pa.Table) -> pa.Table:
        rows = band_rows(t, id_col, text_col, num_perm, bands)
        band = rows.column("band").to_numpy(zero_copy_only=False).astype(np.uint64)
        bh = rows.column("band_hash").to_numpy(zero_copy_only=False).view(np.uint64)
        key = _splitmix(bh ^ (band * np.uint64(0x9E3779B97F4A7C15)))
        return pa.table(
            {
                "key": pa.array(key.view(np.int64), type=pa.int64()),
                id_col: rows.column(id_col),
            }
        )

    rows = ds.map_batches(keyed_rows, batch_format="pyarrow", batch_size=None).materialize()
    hits, n_keys = _colliding_subset(rows, max_collision_keys)
    return _bucket_pairs(hits, id_col, max_bucket, n_keys_hint=n_keys)


def _colliding_subset(rows: Any, max_collision_keys: int) -> tuple[Any, int]:
    """Dataset[key, id] -> (subset whose key occurs >= 2 times, number
    of colliding keys). Colliding keys found via the bucketed blob
    exchange (prehashed: LSH keys are already uniform 64-bit hashes) —
    no row-level groupby; the key set broadcasts and rows filter per
    batch (no shuffle of the overwhelmingly-singleton remainder). The
    key count feeds ``_bucket_pairs``'s adaptive partition count."""
    import pyarrow.compute as _pc
    import ray

    from patito_ray.validation.violations import duplicate_keys_distributed

    key_set = duplicate_keys_distributed(rows, "key", prehashed=True, min_count=2)
    if len(key_set) > max_collision_keys:
        _LOG.warning(
            "%d colliding LSH keys exceed max_collision_keys=%d; dropping "
            "%d keys (candidate recall reduced). Raise max_collision_keys "
            "or the banding parameters to cover.",
            len(key_set),
            max_collision_keys,
            len(key_set) - max_collision_keys,
        )
        key_set = key_set.slice(0, max_collision_keys)
    ref = ray.put(key_set)

    def pick(batch: pa.Table) -> pa.Table:
        ks = ray.get(ref)
        return batch.filter(_pc.is_in(batch["key"], value_set=ks))

    picked = rows.map_batches(pick, batch_format="pyarrow", batch_size=None)
    return picked, len(key_set)


# Target colliding keys per pair-formation task: each task is one
# vectorized sort + run scan, so thousands of keys amortize Ray's fixed
# per-task latency; at crawl scale the ~4x-CPU ceiling takes over.
_KEYS_PER_PARTITION = 2048


def _bucket_pairs(
    hits: Any,
    id_col: str,
    max_bucket: int,
    num_partitions: int | None = None,
    n_keys_hint: int | None = None,
) -> Any:
    """Colliding LSH rows (key, id) -> distinct candidate Dataset[a, b]
    (a < b).

    Pairs form WORKER-side, one task per PARTITION of the key space —
    NOT one ``map_groups`` per colliding key: on a duplicate-heavy crawl
    the colliding-key count is O(corpus x bands), so per-key Python
    would be millions of calls. Each partition task sorts its (key, id)
    rows once, finds key runs vectorized, emits size-2 runs (the
    overwhelming majority of dup clusters) in one shot, and loops only
    over the rare >=3-sized runs. A tiny groupby then dedups pairs that
    collided under several band keys."""
    if num_partitions is None:
        from patito_ray.stages.join import default_num_partitions

        cap = default_num_partitions()
        if n_keys_hint is not None:
            num_partitions = min(cap, max(1, -(-n_keys_hint // _KEYS_PER_PARTITION)))
        else:
            num_partitions = cap

    P = np.uint64(num_partitions)

    def add_part(t: pa.Table) -> pa.Table:
        k = t.column("key").to_numpy(zero_copy_only=False).view(np.uint64)
        part = (_splitmix(k ^ np.uint64(0xA076_1D64_78BD_642F)) % P).view(np.int64)
        return t.append_column("part", pa.array(part, type=pa.int64()))

    def emit_pairs(group: pa.Table) -> pa.Table:
        keys = group.column("key").to_numpy(zero_copy_only=False)
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, keys))
        k_s, id_s = keys[order], ids[order]
        _, starts, counts = np.unique(k_s, return_index=True, return_counts=True)
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        two = counts == 2
        if two.any():
            s2 = starts[two]
            out_a.append(id_s[s2])
            out_b.append(id_s[s2 + 1])
        big = np.nonzero(counts > 2)[0]
        for r in big:
            run = np.unique(id_s[starts[r] : starts[r] + counts[r]])
            if len(run) > max_bucket:
                _LOG.warning(
                    "LSH bucket with %d ids capped at max_bucket=%d "
                    "(%d ids dropped from pairing)",
                    len(run),
                    max_bucket,
                    len(run) - max_bucket,
                )
                run = run[:max_bucket]
            if len(run) < 2:
                continue
            ai, bi = np.triu_indices(len(run), k=1)
            out_a.append(run[ai])
            out_b.append(run[bi])
        if not out_a:
            return pa.table(
                {"a": pa.array([], type=pa.int64()), "b": pa.array([], type=pa.int64())}
            )
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        keep = lo != hi
        return pa.table(
            {
                "a": pa.array(lo[keep], type=pa.int64()),
                "b": pa.array(hi[keep], type=pa.int64()),
            }
        )

    pairs = (
        hits.map_batches(add_part, batch_format="pyarrow", batch_size=None)
        .groupby("part")
        .map_groups(emit_pairs, batch_format="pyarrow")
    )

    # Distinct (a, b): a pair that collided under several band keys is
    # emitted once per key. A native groupby(["a","b"]).aggregate here
    # is O(distinct pairs) GROUPS through Ray's sort-based aggregate —
    # measured 229 s for 2.4M distinct pairs from a clustered corpus
    # (vs ~2 s for this path): dup-heavy corpora make pair count, and
    # thus group count, quadratic in cluster size. Instead dedup with
    # the repo's standard co-partition shape: vectorized intra-batch
    # dedup (shrinks the exchange), hash-partition on (a, b), one
    # lexsort-dedup task per partition — P Python calls total.
    def _dedup_pairs_local(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "a" not in t.column_names:
            return pa.table(
                {"a": pa.array([], type=pa.int64()), "b": pa.array([], type=pa.int64())}
            )
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a_s, b_s = a[order], b[order]
        keep = np.empty(len(a_s), dtype=bool)
        keep[0] = True
        keep[1:] = (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1])
        return pa.table(
            {
                "a": pa.array(a_s[keep], type=pa.int64()),
                "b": pa.array(b_s[keep], type=pa.int64()),
            }
        )

    def add_pair_part(t: pa.Table) -> pa.Table:
        t = _dedup_pairs_local(t)
        a = t.column("a").to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t.column("b").to_numpy(zero_copy_only=False).astype(np.uint64)
        part = (_splitmix(a ^ _splitmix(b)) % P).view(np.int64)
        return t.append_column("part", pa.array(part, type=pa.int64()))

    return (
        pairs.map_batches(add_pair_part, batch_format="pyarrow", batch_size=None)
        .groupby("part")
        .map_groups(_dedup_pairs_local, batch_format="pyarrow")
        .map_batches(_dedup_pairs_local, batch_format="pyarrow", batch_size=None)
    )


_RE2_TOKEN = None


def _re2_tokens(s: str) -> list[str]:
    """RE2-\S tokenization (\s = [\t\n\f\r ] in RE2, used by both
    Arrow and DuckDB) — python ``str.split()`` additionally splits on
    \x0b and unicode whitespace, which would diverge from the SQL
    oracle's regexp_extract_all('\S+') on exotic whitespace."""
    global _RE2_TOKEN
    if _RE2_TOKEN is None:
        import re

        _RE2_TOKEN = re.compile(r"[^\t\n\f\r ]+")
    return _RE2_TOKEN.findall(s)


def _grams(s: str, n: int) -> set[str]:
    """Word-n-gram set; docs with 1..n-1 tokens contribute ONE gram
    (their full token sequence) so distinct short texts never compare as
    identical; empty/whitespace texts have no grams."""
    toks = _re2_tokens(s.lower())
    if len(toks) >= n:
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
    if toks:
        return {" ".join(toks)}
    return set()


def ngram_jaccard(a: str, b: str, n: int = 3) -> float:
    """Exact word-n-gram Jaccard similarity (the verify step).

    Both sides empty of grams (whitespace-only texts) -> 1.0; exactly
    one side empty -> 0.0 (they cannot share content)."""
    ga, gb = _grams(a, n), _grams(b, n)
    if not ga and not gb:
        return 1.0
    if not ga or not gb:
        return 0.0
    return len(ga & gb) / len(ga | gb)


def pair_payload_join(
    ds: Any,
    pairs: Any,
    id_col: str,
    val_col: str,
    num_partitions: int | None = None,
    broadcast_id_limit: int = 32_000_000,
    pair_cols: tuple[str, ...] = (),
) -> Any:
    """Attach each candidate pair's two payloads -> Dataset[a, b, val_a,
    val_b]. The shared spine of every pair-verification operator (n-gram
    Jaccard over texts, exact cosine over embeddings, ...).
    ``pair_cols`` threads extra per-pair columns of ``pairs`` (e.g. an
    already-computed distance) through both exchanges into the output.

    Scale shape: payloads never touch the driver. The corpus side is
    pruned adaptively: while the candidate id set stays under
    ``broadcast_id_limit`` ids (~256 MB), it is collected (8 B/id) and
    broadcast as a semi-join filter; on a duplicate-heavy crawl where
    candidates are O(corpus), NOTHING is collected — every corpus row
    simply rides the exchange and non-candidates fall out of the inner
    join. Payloads then meet their pairs through two bucketed exchanges
    (the tagged-union + ``groupby(part)`` co-location pattern — Ray's
    native join operator currently chokes on empty blocks):

    1. key by DOC: pair-side rows (one per pair per side) and payload
       rows co-partition on ``hash(id) % P``; one vectorized join per
       partition attaches each side's payload;
    2. key by PAIR: the two payload-carrying sides of each pair
       co-partition on ``hash(a,b) % P`` and join vectorized.

    P Python calls total, each vectorized inside.
    """
    import ray
    import ray.data as rd

    val_type = None
    for name, typ in zip(ds.schema().names, ds.schema().types):
        if name == val_col:
            val_type = typ
    assert val_type is not None, f"{val_col!r} not in dataset schema"

    # pairs are consumed up to three times (count, id collection,
    # explode); pin the 16 B/pair rows so the candidate pipeline that
    # produced them runs exactly once
    pairs = pairs.materialize()
    n_pairs = pairs.count()
    if n_pairs == 0:
        # a materialized empty Dataset can have NO blocks and thus no
        # schema — then pair_cols types are unknowable; emit the bare
        # (a, b, val_a, val_b) empty result
        p_schema = pairs.schema()
        empty_extra = (
            []
            if p_schema is None
            else [
                (c, t)
                for c, t in zip(p_schema.names, p_schema.types)
                if c in pair_cols
            ]
        )
        return rd.from_arrow(
            pa.schema(
                [
                    ("a", pa.int64()),
                    ("b", pa.int64()),
                    ("val_a", val_type),
                    *empty_extra,
                    ("val_b", val_type),
                ]
            ).empty_table()
        )
    id_ref = None
    if 2 * n_pairs <= broadcast_id_limit:
        # stay in Arrow: Python-int sets cost ~10x the documented
        # 8 B/id bound
        chunks = []
        for b in pairs.select_columns(["a", "b"]).iter_batches(
            batch_format="pyarrow"
        ):
            chunks.append(b.column("a").combine_chunks())
            chunks.append(b.column("b").combine_chunks())
        id_ref = ray.put(pc.unique(pa.concat_arrays(chunks)))
    if num_partitions is None:
        from patito_ray.stages.join import default_num_partitions

        # clamp by the (already counted) pair volume: each partition
        # task is one vectorized join, so thousands of pairs per task
        # amortize Ray's per-task latency; 4x-CPU partitions for 256
        # pairs would be 100+ near-empty map_groups calls. At crawl
        # scale n_pairs is O(corpus) and the clamp is inactive.
        by_size = max(1, -(-n_pairs // _PAIRS_PER_PARTITION))
        num_partitions = min(default_num_partitions(), by_size)
        # memory bound (dominates both other rules when it bites): each
        # partition task holds ~2 payloads per pair in heap during its
        # join, so partitions must scale UP with payload volume or a
        # dup-heavy crawl with fat payloads OOMs a fixed 4x-CPU fan-out.
        # Only a materialized corpus knows its size without triggering
        # execution; the explicit num_partitions arg remains the
        # escape hatch otherwise.
        import ray.data as _rd

        if isinstance(ds, _rd.dataset.MaterializedDataset):
            n_rows = max(1, ds.count())
            volume = 2 * n_pairs * max(1, ds.size_bytes() // n_rows)
            by_bytes = -(-volume // _PAYLOAD_BYTES_PER_PARTITION)
            num_partitions = int(max(num_partitions, by_bytes))
    P = np.int64(num_partitions)

    extra_types = {
        c: t for c, t in zip(pairs.schema().names, pairs.schema().types)
        if c in pair_cols
    }
    missing = [c for c in pair_cols if c not in extra_types]
    assert not missing, f"pair_cols {missing} not in pairs schema"
    union_schema = pa.schema(
        [
            ("part", pa.int64()),
            ("key", pa.int64()),
            ("a", pa.int64()),
            ("b", pa.int64()),
            ("side", pa.int8()),
            ("val", val_type),
            *[(c, extra_types[c]) for c in pair_cols],
        ]
    )

    def _part_of(keys: np.ndarray) -> pa.Array:
        return pa.array(
            (_splitmix(keys.astype(np.int64).view(np.uint64)) % np.uint64(P)).view(
                np.int64
            ),
            type=pa.int64(),
        )

    def explode_pairs(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        key = np.concatenate([a, b])
        return pa.table(
            {
                "part": _part_of(key),
                "key": pa.array(key, type=pa.int64()),
                "a": pa.array(np.concatenate([a, a]), type=pa.int64()),
                "b": pa.array(np.concatenate([b, b]), type=pa.int64()),
                "side": pa.array(
                    np.repeat(np.array([0, 1], np.int8), len(a)), type=pa.int8()
                ),
                "val": pa.nulls(2 * len(a), type=val_type),
                **{
                    c: pa.concat_arrays(
                        [batch.column(c).combine_chunks()] * 2
                    ).cast(extra_types[c])
                    for c in pair_cols
                },
            },
            schema=union_schema,
        )

    def pick_vals(batch: pa.Table) -> pa.Table:
        if id_ref is not None:
            ks = ray.get(id_ref)
            hit = batch.filter(pc.is_in(batch.column(id_col), value_set=ks))
        else:
            hit = batch  # candidates ~ corpus: skip the prune, ride the exchange
        key = hit.column(id_col).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "part": _part_of(key),
                "key": pa.array(key, type=pa.int64()),
                "a": pa.nulls(len(key), type=pa.int64()),
                "b": pa.nulls(len(key), type=pa.int64()),
                "side": pa.array(np.full(len(key), -1, np.int8), type=pa.int8()),
                "val": pc.cast(hit.column(val_col).combine_chunks(), val_type),
                **{
                    c: pa.nulls(len(key), type=extra_types[c])
                    for c in pair_cols
                },
            },
            schema=union_schema,
        )

    pair_rows = pairs.map_batches(explode_pairs, batch_format="pyarrow", batch_size=None)
    val_rows = ds.map_batches(pick_vals, batch_format="pyarrow", batch_size=None)

    def attach_val(group: pa.Table) -> pa.Table:
        # polars joins (not acero): payloads may be list-typed
        # (embeddings), which arrow's hash join rejects as non-key fields
        import polars as pl

        side = group.column("side").to_numpy(zero_copy_only=False)
        vals = group.filter(pa.array(side == -1)).select(["key", "val"])
        prows = group.filter(pa.array(side >= 0)).select(
            ["key", "a", "b", "side", *pair_cols]
        )
        joined = (
            pl.from_arrow(prows).join(pl.from_arrow(vals), on="key", how="inner")
        ).to_arrow()
        a = joined.column("a").to_numpy(zero_copy_only=False)
        b = joined.column("b").to_numpy(zero_copy_only=False)
        pkey = (
            _splitmix(a.view(np.uint64) ^ _splitmix(b.view(np.uint64)))
            % np.uint64(P)
        ).view(np.int64)
        return pa.table(
            {
                "part2": pa.array(pkey, type=pa.int64()),
                "a": joined.column("a"),
                "b": joined.column("b"),
                "side": joined.column("side"),
                "val": joined.column("val"),
                **{c: joined.column(c) for c in pair_cols},
            }
        )

    sided = (
        pair_rows.union(val_rows)
        .groupby("part")
        .map_groups(attach_val, batch_format="pyarrow")
    )

    def join_sides(group: pa.Table) -> pa.Table:
        import polars as pl

        side = group.column("side").to_numpy(zero_copy_only=False)
        t0 = group.filter(pa.array(side == 0)).select(["a", "b", "val", *pair_cols])
        t0 = t0.rename_columns(["a", "b", "val_a", *pair_cols])
        t1 = group.filter(pa.array(side == 1)).select(["a", "b", "val"])
        t1 = t1.rename_columns(["a", "b", "val_b"])
        return (
            pl.from_arrow(t0)
            .join(pl.from_arrow(t1), on=["a", "b"], how="inner")
            .to_arrow()
        )

    return sided.groupby("part2").map_groups(join_sides, batch_format="pyarrow")


def _gram_hash_sets(
    text: pa.ChunkedArray | pa.Array, n: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Deduped word-n-gram hash SET per row — the vectorized counterpart
    of ``_grams`` (RE2-exact tokenization via ``ascii_ws=True``).

    Returns (row_idx, gram_hashes, set_size_per_row) where (row_idx,
    gram_hashes) is sorted and duplicate grams within a row are removed,
    so set-intersection sizes reduce to adjacent-equality counts."""
    flat, rows, n_rows = _shingle_hashes(text, n, ascii_ws=True)
    if len(flat) == 0:
        return (
            np.empty(0, np.int64),
            np.empty(0, np.uint64),
            np.zeros(n_rows, np.int64),
        )
    order = np.lexsort((flat, rows))
    rows, flat = rows[order], flat[order]
    keep = np.ones(len(rows), dtype=bool)
    keep[1:] = (rows[1:] != rows[:-1]) | (flat[1:] != flat[:-1])
    rows, flat = rows[keep], flat[keep]
    return rows, flat, np.bincount(rows, minlength=n_rows)


def _pair_intersections(
    batch: pa.Table, text_col: str, shingle_n: int, action: str
) -> "tuple[np.ndarray, np.ndarray, np.ndarray]":
    """Shared exact-overlap kernel for the pair-verify family: both
    payload columns' gram hash SETS built once per batch, per-pair
    intersection sizes from one lexsort + adjacent-equality bincount.
    Returns (inter, size_a, size_b) int arrays, one entry per pair."""
    va = batch.column("val_a")
    vb = batch.column("val_b")
    null_payloads = va.null_count + vb.null_count
    if null_payloads:
        raise ValueError(
            f"text column {text_col!r} contains {null_payloads} null "
            f"payload row(s) among candidate pairs; filter or impute "
            f"nulls before {action}"
        )
    n = batch.num_rows
    ra, ha, ca = _gram_hash_sets(va, shingle_n)
    rb, hb, cb = _gram_hash_sets(vb, shingle_n)
    # both sides deduped per row -> an adjacent equal (row, hash) run
    # in the combined sort has length exactly 2 == intersection
    r = np.concatenate([ra, rb])
    h = np.concatenate([ha, hb])
    order = np.lexsort((h, r))
    r, h = r[order], h[order]
    dup = (r[1:] == r[:-1]) & (h[1:] == h[:-1])
    inter = np.bincount(r[1:][dup], minlength=n)
    return inter, ca, cb


def verify_pairs_dataset(
    ds: Any,
    pairs: Any,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    shingle_n: int = 3,
    num_partitions: int | None = None,
) -> Any:
    """Distributed candidate-pair verification -> Dataset[a, b, jaccard]
    (pairs whose exact word-n-gram Jaccard >= threshold). Pair payloads
    co-locate via ``pair_payload_join`` (no driver-side text lookup).

    The exact kernel is fully vectorized: both payload columns' gram
    hash SETS are built once per batch (``_gram_hash_sets``), per-pair
    intersection sizes fall out of one lexsort + adjacent-equality
    bincount, union = |A| + |B| - inter. Jaccard over 64-bit gram hashes
    equals the string-set Jaccard of ``ngram_jaccard`` up to hash
    collisions (~|grams|²/2⁶⁴ per pair — negligible; the hypothesis
    property test compares the two directly)."""
    joined = pair_payload_join(ds, pairs, id_col, text_col, num_partitions)

    def score(batch: pa.Table) -> pa.Table:
        inter, ca, cb = _pair_intersections(
            batch, text_col, shingle_n, "near-dup verification"
        )
        union = ca + cb - inter
        # empty-gram semantics match ngram_jaccard: both sides empty
        # (whitespace-only texts) -> 1.0; exactly one empty -> 0.0
        both_empty = (ca == 0) & (cb == 0)
        jac = np.where(
            both_empty,
            1.0,
            inter / np.maximum(union, 1),
        )
        keep = jac >= threshold
        return pa.table(
            {
                "a": batch.column("a").filter(pa.array(keep)),
                "b": batch.column("b").filter(pa.array(keep)),
                "jaccard": pa.array(jac[keep], type=pa.float64()),
            }
        )

    return joined.map_batches(score, batch_format="pyarrow", batch_size=None)


def verify_pairs(
    ds: Any,
    pairs: list[tuple[int, int]],
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    shingle_n: int = 3,
) -> list[tuple[int, int, float]]:
    """Driver-side convenience wrapper over ``verify_pairs_dataset`` for
    small, already-listed candidate sets (tests / notebooks). Production
    paths should stay on the Dataset form."""
    if not pairs:
        return []
    import ray.data as rd

    pairs_ds = rd.from_arrow(
        pa.table(
            {
                "a": pa.array([p[0] for p in pairs], type=pa.int64()),
                "b": pa.array([p[1] for p in pairs], type=pa.int64()),
            }
        )
    )
    out = verify_pairs_dataset(
        ds, pairs_ds, id_col, text_col, threshold, shingle_n
    ).take_all()
    return sorted((r["a"], r["b"], r["jaccard"]) for r in out)


def cluster_pairs_distributed(
    pairs: Any, num_partitions: int = 64, max_iters: int = 50
) -> Any:
    """Distributed connected components over a pair Dataset[a, b] ->
    Dataset[node, root] (root = min node id of the component).

    Iterated min-label propagation: each round every node takes the
    minimum label among itself and its neighbors (one co-partitioned
    join + one groupby-Min over the EDGE set — never anything
    driver-side). Labels are monotonically non-increasing, so the global
    label sum is a convergence certificate: unchanged sum == fixpoint.
    Near-dup clusters are star-like (diameter ~2-4), so this converges
    in a handful of rounds; the worst case is the component diameter.

    Use over ``cluster_pairs`` (driver union-find) when the verified
    pair set itself is too large for one machine — the O(corpus)
    duplicate volume of a crawl-scale dedup.
    """
    from ray.data.aggregate import Min, Sum

    from patito_ray.stages.join import copartition_apply

    def both_dirs(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, b]), type=pa.int64()),
                "dst": pa.array(np.concatenate([b, a]), type=pa.int64()),
            }
        )

    edges = pairs.map_batches(
        both_dirs, batch_format="pyarrow", batch_size=None
    ).materialize()

    labels = (
        edges.map_batches(
            lambda t: pa.table({"lnode": t.column("src"), "label": t.column("src")}),
            batch_format="pyarrow",
            batch_size=None,
        )
        .groupby("lnode")
        .aggregate(Min("label", alias_name="label"))
        .materialize()
    )

    def attach(lt: pa.Table, rt: pa.Table) -> pa.Table:
        # lt = edges (src, dst); rt = labels (lnode, label)
        import polars as pl

        out = (
            pl.from_arrow(lt)
            .join(pl.from_arrow(rt), left_on="src", right_on="lnode", how="inner")
            .select(
                pl.col("dst").alias("lnode"),
                pl.col("label"),
            )
        )
        return out.to_arrow()

    prev_sum: int | None = None
    converged = False
    for _ in range(max_iters):
        neigh = copartition_apply(
            edges, labels, by="src", right_by="lnode", part_fn=attach,
            num_partitions=num_partitions,
        )
        labels = (
            neigh.union(labels)
            .groupby("lnode")
            .aggregate(Min("label", alias_name="label"))
            .materialize()
        )
        s = int(labels.aggregate(Sum("label", alias_name="s"))["s"] or 0)
        if s == prev_sum:
            converged = True
            break
        prev_sum = s
    if not converged:
        _LOG.warning(
            "cluster_pairs_distributed: label propagation did NOT converge "
            "within max_iters=%d (a component's diameter exceeds it); "
            "labels are an over-segmentation — some duplicates will be "
            "kept. Raise max_iters.",
            max_iters,
        )
    return labels.map_batches(
        lambda t: pa.table({"node": t.column("lnode"), "root": t.column("label")}),
        batch_format="pyarrow",
        batch_size=None,
    )


def cluster_pairs(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find clustering of duplicate pairs -> {id: component_root}.

    Runs on the driver: candidate-pair sets are tiny relative to the
    corpus (the LSH bands only surface near-dups), and union-find on
    even 10^8 pairs is seconds. If a corpus ever yields a pair set too
    big for one machine, the same result comes from iterated min-label
    propagation (groupby rounds over (node, label) until fixpoint).
    """
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.setdefault(root, root) != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    return {x: find(x) for x in parent}


def dedup_near(
    ds: Any,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    num_perm: int = 128,
    bands: int = 16,
    shingle_n: int = 3,
    driver_cluster_limit: int = 10_000_000,
) -> Any:
    """End-to-end near-duplicate removal: MinHash-LSH candidates ->
    exact n-gram Jaccard verify -> connected components -> keep the min
    id per cluster. Returns the deduplicated Dataset (rows whose id is
    not a dropped duplicate). Candidate discovery, pair formation AND
    verification all run worker-side. Clustering adapts: verified pair
    sets below ``driver_cluster_limit`` use driver union-find + a
    broadcast drop-set filter; larger sets (a crawl's duplicate volume
    is O(corpus)) run the distributed min-label propagation
    (``cluster_pairs_distributed``) and an anti-co-partition filter —
    nothing O(duplicates) ever lands on the driver.
    """
    import pyarrow.compute as _pc

    pairs_ds = minhash_candidate_pairs(ds, id_col, text_col, num_perm, bands)
    verified_ds = verify_pairs_dataset(
        ds, pairs_ds, id_col, text_col, threshold, shingle_n
    ).materialize()

    n_pairs = verified_ds.count()
    if n_pairs == 0:
        return ds
    if n_pairs <= driver_cluster_limit:
        verified = [
            (r["a"], r["b"])
            for r in verified_ds.select_columns(["a", "b"]).take_all()
        ]
        components = cluster_pairs(verified)
        drop = sorted(x for x, root in components.items() if x != root)
        if not drop:
            return ds
        drop_set = pa.array(drop)
        return ds.map_batches(
            lambda t: t.filter(
                _pc.invert(_pc.is_in(t.column(id_col), value_set=drop_set))
            ),
            batch_format="pyarrow",
            batch_size=None,
        )

    # crawl-scale path: distributed components, co-partitioned anti filter
    from patito_ray.stages.join import copartition_apply

    comp = cluster_pairs_distributed(verified_ds)
    drops = comp.map_batches(
        lambda t: t.filter(
            _pc.not_equal(t.column("node"), t.column("root"))
        ).select(["node"]),
        batch_format="pyarrow",
        batch_size=None,
    )

    def anti(lt: pa.Table, rt: pa.Table) -> pa.Table:
        keep = _pc.invert(
            _pc.is_in(lt.column(id_col), value_set=rt.column("node").combine_chunks())
        )
        return lt.filter(keep)

    return copartition_apply(
        ds, drops, by=id_col, right_by="node", part_fn=anti, num_partitions=64
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_batch(
    batch: pa.Table, id_col: str = "doc_id", text_col: str = "text"
) -> pa.Table:
    """64-bit SimHash per document (token-hash bit-majority), fully
    vectorized: one ``np.bincount`` per bit over the flattened token
    hashes (buffered C scatter — ~40x faster than ``np.add.at`` on the
    (tokens x 64) matrix). Bit b is set when more than half the
    document's token hashes have bit b set."""
    text = batch.column(text_col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    lower = pc.utf8_lower(text)
    toks = pc.utf8_split_whitespace(lower)
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    keep = pc.fill_null(pc.not_equal(flat, ""), False)
    if not pc.all(keep).as_py():
        parents = parents[keep.to_numpy(zero_copy_only=False)]
        flat = flat.filter(keep)
    th = hash64(flat)
    n_rows = len(text)
    fp = np.zeros(n_rows, dtype=np.uint64)
    if len(th):
        n_tokens = np.bincount(parents, minlength=n_rows)
        for bit in range(64):
            set_count = np.bincount(
                parents,
                weights=((th >> np.uint64(bit)) & np.uint64(1)).astype(np.float64),
                minlength=n_rows,
            )
            fp |= (2 * set_count > n_tokens).astype(np.uint64) << np.uint64(bit)
    return pa.table(
        {id_col: batch.column(id_col), "simhash": pa.array(fp.view(np.int64), type=pa.int64())}
    )


def hamming_distance(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def simhash_near_dups(
    ds: Any,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    bands: int = 4,
    max_bucket: int = 1000,
    max_collision_keys: int = 10_000_000,
    num_partitions: int | None = None,
    limit_bytes: int | None = None,
) -> Any:
    """SimHash near-duplicate pairs -> Dataset[a, b, hamming] (pairs
    whose 64-bit SimHash fingerprints differ in <= ``max_hamming``
    bits). One simhash pass pins the 16 B/doc (id, fp) projection, then
    the shared :func:`fingerprint_near_dups` spine does the rest.
    """
    fps = ds.map_batches(
        lambda t: simhash_batch(t, id_col, text_col),
        batch_format="pyarrow",
        batch_size=None,
    ).materialize()
    return fingerprint_near_dups(
        fps,
        id_col,
        "simhash",
        max_hamming=max_hamming,
        bands=bands,
        max_bucket=max_bucket,
        max_collision_keys=max_collision_keys,
        num_partitions=num_partitions,
        limit_bytes=limit_bytes,
    )


def fingerprint_groups(
    fps: Any,
    id_col: str,
    fp_col: str,
    num_partitions: int | None = None,
) -> Any:
    """One row per DISTINCT fingerprint value: (rep = min id, fp,
    sorted member ids). The integer analogue of
    :func:`patito_ray.functions.groupident.identity_groups`: repeated
    fingerprints are the degenerate case of any banding scheme (k
    copies cost O(k²) in every bucket they touch), so pairwise
    operators compact through this ONE narrow (fp, id) exchange and run
    their spine over distinct values only. Materialized (consumed by
    the spine, the within-group pass and the expansion join)."""
    from patito_ray.stages.join import default_num_partitions

    P = num_partitions if num_partitions is not None else default_num_partitions()

    def add_part(t: pa.Table) -> pa.Table:
        fp = t.column(fp_col).to_numpy(zero_copy_only=False).view(np.uint64)
        part = (_splitmix(fp) % np.uint64(P)).view(np.int64)
        return pa.table(
            {
                "part": pa.array(part, type=pa.int64()),
                "fp": pa.array(fp.view(np.int64), type=pa.int64()),
                "gid": pc.cast(t.column(id_col).combine_chunks(), pa.int64()),
            }
        )

    _gschema = pa.schema(
        [
            ("rep", pa.int64()),
            ("fp", pa.int64()),
            ("ids", pa.large_list(pa.int64())),
        ]
    )

    def grp(t: pa.Table) -> pa.Table:
        import polars as pl

        if t.num_rows == 0 or "fp" not in t.column_names:
            return _gschema.empty_table()
        return (
            pl.from_arrow(t.select(["fp", "gid"]))
            .group_by("fp")
            .agg(
                pl.col("gid").min().alias("rep"),
                pl.col("gid").sort().alias("ids"),
            )
            .select(["rep", "fp", "ids"])
            .to_arrow()
            .cast(_gschema)
        )

    return (
        fps.map_batches(add_part, batch_format="pyarrow", batch_size=None)
        .groupby("part")
        .map_groups(grp, batch_format="pyarrow")
        .materialize()
    )


_POPCNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)

_FP_PAIR_SCHEMA = pa.schema(
    [("a", pa.int64()), ("b", pa.int64()), ("hamming", pa.int64())]
)


def _fingerprint_pairs_driver(
    tbl: pa.Table,
    id_col: str,
    fp_col: str,
    max_hamming: int,
    bands: int,
    max_bucket: int,
    max_collision_keys: int,
) -> pa.Table:
    """Driver-side replica of the banded fingerprint spine over ONE
    narrow (id, fp) table — identical semantics (group compaction,
    banding, max_bucket / max_collision_keys caps with the same loud
    warnings, exact popcount verify, capped cross expansion) with zero
    exchanges. The distributed spine costs ~3 all-to-all rounds of
    fixed latency even on an 80 KB fingerprint set; below the driver
    byte limit this one vectorized kernel replaces them all."""
    width = 64 // bands
    if tbl.num_rows == 0:
        return _FP_PAIR_SCHEMA.empty_table()
    ids = pc.cast(tbl.column(id_col).combine_chunks(), pa.int64()).to_numpy(
        zero_copy_only=False
    )
    fp = (
        tbl.column(fp_col)
        .combine_chunks()
        .to_numpy(zero_copy_only=False)
        .view(np.uint64)
    )
    order = np.lexsort((ids, fp))
    fp_s, id_s = fp[order], ids[order]
    ufp, starts, counts = np.unique(fp_s, return_index=True, return_counts=True)

    out_a: list[np.ndarray] = []
    out_b: list[np.ndarray] = []
    out_h: list[np.ndarray] = []
    # identical-fingerprint pairs (hamming 0); member runs are id-sorted
    for gi in np.flatnonzero(counts > 1):
        k = int(counts[gi])
        if k > max_bucket:
            _LOG.warning(
                "identity group with %d ids capped at max_bucket=%d "
                "(%d ids dropped from identical-pairing)",
                k,
                max_bucket,
                k - max_bucket,
            )
            k = max_bucket
        seg = id_s[starts[gi] : starts[gi] + k]
        i0, i1 = np.triu_indices(k, 1)
        out_a.append(seg[i0])
        out_b.append(seg[i1])
        out_h.append(np.zeros(len(i0), dtype=np.int64))

    # banded candidate keys over DISTINCT fingerprints only
    reps = id_s[starts]  # min id per distinct fp (runs are id-sorted)
    n = len(ufp)
    mask = (
        np.uint64((1 << width) - 1) if width < 64 else np.uint64(0xFFFFFFFFFFFFFFFF)
    )
    keys = np.empty(bands * n, dtype=np.uint64)
    for b in range(bands):
        slice_bits = (ufp >> np.uint64(b * width)) & mask
        keys[b * n : (b + 1) * n] = _splitmix(
            slice_bits ^ _splitmix(np.full(n, b + 1, dtype=np.uint64))
        )
    rep_tiled = np.tile(reps, bands)
    ko = np.lexsort((rep_tiled, keys))
    k_s, r_s = keys[ko], rep_tiled[ko]
    _, kstarts, kcounts = np.unique(k_s, return_index=True, return_counts=True)
    coll = kcounts >= 2
    n_coll = int(coll.sum())
    if n_coll > max_collision_keys:
        _LOG.warning(
            "%d colliding LSH keys exceed max_collision_keys=%d; dropping "
            "%d keys (candidate recall reduced). Raise max_collision_keys "
            "or the banding parameters to cover.",
            n_coll,
            max_collision_keys,
            n_coll - max_collision_keys,
        )
        coll[np.flatnonzero(coll)[max_collision_keys:]] = False

    pa_list: list[np.ndarray] = []
    pb_list: list[np.ndarray] = []
    two = coll & (kcounts == 2)
    if two.any():
        s2 = kstarts[two]
        pa_list.append(r_s[s2])
        pb_list.append(r_s[s2 + 1])
    for r in np.flatnonzero(coll & (kcounts > 2)):
        run = np.unique(r_s[kstarts[r] : kstarts[r] + kcounts[r]])
        if len(run) > max_bucket:
            _LOG.warning(
                "LSH bucket with %d ids capped at max_bucket=%d "
                "(%d ids dropped from pairing)",
                len(run),
                max_bucket,
                len(run) - max_bucket,
            )
            run = run[:max_bucket]
        if len(run) < 2:
            continue
        ai, bi = np.triu_indices(len(run), k=1)
        pa_list.append(run[ai])
        pb_list.append(run[bi])

    if pa_list:
        a = np.concatenate(pa_list)
        b = np.concatenate(pb_list)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        keep = lo != hi
        cand = np.unique(np.stack([lo[keep], hi[keep]], axis=1), axis=0)
        lo, hi = cand[:, 0], cand[:, 1]
        # exact popcount verify on the distinct-rep fingerprints
        rorder = np.argsort(reps, kind="stable")
        rsorted = reps[rorder]
        fsorted = ufp[rorder]
        fa = fsorted[np.searchsorted(rsorted, lo)]
        fb = fsorted[np.searchsorted(rsorted, hi)]
        x = fa ^ fb
        dist = np.zeros(len(x), dtype=np.int64)
        for shift in range(0, 64, 8):
            dist += _POPCNT8[((x >> np.uint64(shift)) & np.uint64(0xFF)).astype(np.int64)]
        vkeep = dist <= max_hamming
        vlo, vhi, vdist = lo[vkeep], hi[vkeep], dist[vkeep]
        if len(vlo):
            # cross-expand rep pairs to the full member cross product
            ga = rorder[np.searchsorted(rsorted, vlo)]
            gb = rorder[np.searchsorted(rsorted, vhi)]
            raw_la = counts[ga].astype(np.int64)
            raw_lb = counts[gb].astype(np.int64)
            over = int((raw_la > max_bucket).sum() + (raw_lb > max_bucket).sum())
            if over:
                _LOG.warning(
                    "cross expansion capped %d group side(s) at max_bucket=%d",
                    over,
                    max_bucket,
                )
            la = np.minimum(raw_la, max_bucket)
            lb = np.minimum(raw_lb, max_bucket)
            m = la * lb
            total = int(m.sum())
            pair_idx = np.repeat(np.arange(len(m)), m)
            pstarts = np.concatenate(([0], np.cumsum(m)[:-1]))
            pos = np.arange(total) - pstarts[pair_idx]
            left = id_s[starts[ga][pair_idx] + pos // lb[pair_idx]]
            right = id_s[starts[gb][pair_idx] + pos % lb[pair_idx]]
            out_a.append(np.minimum(left, right))
            out_b.append(np.maximum(left, right))
            out_h.append(vdist[pair_idx])

    if not out_a:
        return _FP_PAIR_SCHEMA.empty_table()
    return pa.table(
        {
            "a": pa.array(np.concatenate(out_a), type=pa.int64()),
            "b": pa.array(np.concatenate(out_b), type=pa.int64()),
            "hamming": pa.array(np.concatenate(out_h), type=pa.int64()),
        },
        schema=_FP_PAIR_SCHEMA,
    )


def fingerprint_near_dups(
    fps: Any,
    id_col: str,
    fp_col: str,
    max_hamming: int = 3,
    bands: int = 4,
    max_bucket: int = 1000,
    max_collision_keys: int = 10_000_000,
    num_partitions: int | None = None,
    limit_bytes: int | None = None,
) -> Any:
    """Near-dup pairs -> Dataset[a, b, hamming] over ANY 64-bit
    fingerprint column (SimHash text prints, perceptual image hashes,
    ...): pairs differing in <= ``max_hamming`` bits.

    Banding gives GUARANTEED recall by pigeonhole: splitting 64 bits
    into ``bands`` equal slices, two fingerprints within hamming
    distance < bands must agree exactly on at least one slice — with
    the default 4 bands every pair at hamming <= 3 collides in some
    band, deterministically (no probabilistic recall like MinHash).

    Repeated fingerprints compact through :func:`fingerprint_groups`
    first (k copies of a value would otherwise cost O(k²) inside every
    band bucket they touch): the banded spine runs over DISTINCT
    fingerprint values only, identical-value pairs (hamming 0) come
    straight from the groups, and verified distinct-value pairs expand
    back to the full id cross product — all vectorized. Candidate
    discovery and pair formation reuse the LSH spine (bucketed blob
    exchange + partition-level pair emission); the exact hamming verify
    runs vectorized over ``pair_payload_join`` of the fingerprints
    (8 B payloads — the source payloads never move).
    """
    from patito_ray.functions.groupident import (
        cross_expand_pairs,
        within_group_pairs,
    )

    assert 64 % bands == 0, "bands must divide 64"
    width = 64 // bands
    if limit_bytes is None:
        from patito_ray.stages.agg import _DRIVER_MERGE_BYTES

        limit_bytes = _DRIVER_MERGE_BYTES
    # Adaptive driver branch: the fingerprint projection is 16 B/row,
    # so even million-doc corpora fit comfortably under the driver
    # merge limit — one numpy kernel instead of the group-compaction +
    # blob + pair-payload exchanges (~2 s of fixed latency EACH at
    # small scale; dev notes, fixed-latency sweep). limit_bytes=0
    # forces the distributed spine (tests exercise both).
    fps = fps.materialize()
    if limit_bytes and fps.size_bytes() <= limit_bytes:
        import ray
        import ray.data as rd

        tabs = [t for t in ray.get(fps.to_arrow_refs()) if t.num_rows]
        tbl = (
            pa.concat_tables([t.select([id_col, fp_col]) for t in tabs])
            if tabs
            else pa.table(
                {
                    id_col: pa.array([], type=pa.int64()),
                    fp_col: pa.array([], type=pa.int64()),
                }
            )
        )
        return rd.from_arrow(
            _fingerprint_pairs_driver(
                tbl, id_col, fp_col, max_hamming, bands, max_bucket, max_collision_keys
            )
        )
    groups = fingerprint_groups(fps, id_col, fp_col, num_partitions)
    reps = groups.map_batches(
        lambda t: pa.table(
            {id_col: t.column("rep"), fp_col: t.column("fp")}
        )
        if t.num_rows and "rep" in t.column_names
        else pa.schema([(id_col, pa.int64()), (fp_col, pa.int64())]).empty_table(),
        batch_format="pyarrow",
        batch_size=None,
    ).materialize()
    fps = reps

    def keyed_rows(t: pa.Table) -> pa.Table:
        fp = t.column(fp_col).to_numpy(zero_copy_only=False).view(np.uint64)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        n = len(ids)
        keys = np.empty(bands * n, dtype=np.uint64)
        mask = np.uint64((1 << width) - 1) if width < 64 else np.uint64(0xFFFFFFFFFFFFFFFF)
        for b in range(bands):
            slice_bits = (fp >> np.uint64(b * width)) & mask
            keys[b * n : (b + 1) * n] = _splitmix(
                slice_bits ^ _splitmix(np.full(n, b + 1, dtype=np.uint64))
            )
        return pa.table(
            {
                "key": pa.array(keys.view(np.int64), type=pa.int64()),
                id_col: pa.array(np.tile(ids, bands)),
            }
        )

    rows = fps.map_batches(keyed_rows, batch_format="pyarrow", batch_size=None).materialize()
    hits, n_keys = _colliding_subset(rows, max_collision_keys)
    pairs = _bucket_pairs(hits, id_col, max_bucket, n_keys_hint=n_keys)
    joined = pair_payload_join(fps, pairs, id_col, fp_col, num_partitions)

    _POP = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)

    def score(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "a": pa.array([], type=pa.int64()),
                    "b": pa.array([], type=pa.int64()),
                    "hamming": pa.array([], type=pa.int64()),
                }
            )
        va = batch.column("val_a").to_numpy(zero_copy_only=False).view(np.uint64)
        vb = batch.column("val_b").to_numpy(zero_copy_only=False).view(np.uint64)
        x = va ^ vb
        dist = np.zeros(len(x), dtype=np.int64)
        for shift in range(0, 64, 8):
            dist += _POP[((x >> np.uint64(shift)) & np.uint64(0xFF)).astype(np.int64)]
        keep = dist <= max_hamming
        return pa.table(
            {
                "a": batch.column("a").filter(pa.array(keep)),
                "b": batch.column("b").filter(pa.array(keep)),
                "hamming": pa.array(dist[keep], type=pa.int64()),
            }
        )

    # materialize: cross_expand_pairs' payload join fetches .schema(),
    # which would EXECUTE this all-to-all verify twice (dev notes);
    # rep pairs are bounded by the distinct-fingerprint candidates
    rep_pairs = joined.map_batches(
        score, batch_format="pyarrow", batch_size=None
    ).materialize()
    within = within_group_pairs(
        groups, {"hamming": (0, pa.int64())}, max_bucket=max_bucket
    )
    if rep_pairs.count() == 0:  # metadata-only on a materialized Dataset
        return within
    cross = cross_expand_pairs(
        groups, rep_pairs, {"hamming": pa.int64()}, max_bucket=max_bucket
    )
    return within.union(cross)


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------


_PLANE_CACHE: dict[tuple[int, int, int], np.ndarray] = {}


def _hyperplanes(seed: int, dim: int, total: int) -> np.ndarray:
    """Deterministic (dim, total) hyperplane matrix, cached per process —
    every worker derives the identical planes from the seed, so nothing
    needs broadcasting."""
    key = (seed, dim, total)
    if key not in _PLANE_CACHE:
        rng = np.random.default_rng(seed)
        _PLANE_CACHE[key] = rng.standard_normal((dim, total))
    return _PLANE_CACHE[key]


def _fixed_binary_rows(q: np.ndarray) -> pa.Array:
    """(n, d) int8 matrix -> fixed_size_binary(d) array, one buffer, no
    per-row Python objects."""
    n, d = q.shape
    return pa.Array.from_buffers(
        pa.binary(d), n, [None, pa.py_buffer(np.ascontiguousarray(q).tobytes())]
    )


def _fixed_binary_matrix(col: "pa.Array | pa.ChunkedArray") -> np.ndarray:
    """Uniform-width binary column -> (n, d) int8 matrix (zero-copy
    view of the values buffer). Handles fixed_size_binary AND plain
    binary/large_binary — the pair exchange widens fixed-size payloads
    to variable binary on concat."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    t = col.type
    if pa.types.is_fixed_size_binary(t):
        d = t.byte_width
        flat = np.frombuffer(col.buffers()[1], dtype=np.int8)
        return flat[col.offset * d : (col.offset + len(col)) * d].reshape(-1, d)
    odt = np.int64 if pa.types.is_large_binary(t) else np.int32
    off = np.frombuffer(col.buffers()[1], dtype=odt)[
        col.offset : col.offset + len(col) + 1
    ]
    widths = np.diff(off)
    d = int(widths[0]) if len(widths) else 0
    if len(widths) and not (widths == d).all():
        raise ValueError("int8 payload column has non-uniform row widths")
    data = np.frombuffer(col.buffers()[2], dtype=np.int8)
    return data[off[0] : off[-1]].reshape(-1, d) if len(widths) else data.reshape(0, 0)


def _int8_prune_pairs(
    ds: Any,
    pairs: Any,
    id_col: str,
    vec_col: str,
    threshold: float,
    num_partitions: int | None,
) -> Any:
    """Drop candidate pairs provably below ``threshold`` using an
    int8-quantized payload join (8x less exchange volume than float64).
    Sound: |approx_cos - true_cos| <= 2δ + δ² with δ = sqrt(d)/254, so
    keeping approx >= threshold - eps can never lose a true pair."""
    from patito_ray.functions.similarity import _to_matrix, _unit

    def quantize(batch: pa.Table) -> pa.Table:
        vecs = _unit(_to_matrix(batch.column(vec_col)))
        if vecs.size == 0:
            return pa.table(
                {
                    id_col: batch.column(id_col),
                    "q8": pa.array([], type=pa.binary(1)),
                }
            )
        q = np.clip(np.round(vecs * 127.0), -127, 127).astype(np.int8)
        return pa.table(
            {id_col: batch.column(id_col), "q8": _fixed_binary_rows(q)}
        )

    qds = ds.map_batches(quantize, batch_format="pyarrow", batch_size=None)
    joined = pair_payload_join(qds, pairs, id_col, "q8", num_partitions)

    def prune(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
            )
        qa = _fixed_binary_matrix(batch.column("val_a")).astype(np.float32)
        qb = _fixed_binary_matrix(batch.column("val_b")).astype(np.float32)
        d = qa.shape[1]
        dots = np.einsum("ij,ij->i", qa, qb)
        norms = np.sqrt(np.einsum("ij,ij->i", qa, qa) * np.einsum("ij,ij->i", qb, qb))
        approx = np.where(norms > 0, dots / np.maximum(norms, 1e-12), 0.0)
        delta = np.sqrt(d) / 254.0
        eps = 2.0 * delta + delta * delta
        keep = pa.array(approx >= threshold - eps)
        return pa.table(
            {"a": batch.column("a").filter(keep), "b": batch.column("b").filter(keep)}
        )

    return joined.map_batches(prune, batch_format="pyarrow", batch_size=None)


def embedding_near_dups(
    ds: Any,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int | None = None,
    n_tables: int = 32,
    seed: int = 9,
    max_bucket: int = 1000,
    max_collision_keys: int = 10_000_000,
    num_partitions: int | None = None,
    int8_prune: bool = True,
) -> Any:
    """Near-duplicate pairs on an embedding column -> Dataset[a, b,
    cosine] (exact cosine >= threshold).

    Random-hyperplane LSH with ``n_tables`` independent tables of
    ``n_planes`` bits each. A pair at cosine c collides in one table
    with prob (1 - acos(c)/pi)^n_planes; independent tables multiply
    the miss probabilities (a single 16-bit table — the naive design —
    would recall only ~18% at c=0.95).

    ``n_planes=None`` auto-sizes to ``log2(n)+2``: bucket count must
    scale WITH the corpus, else every bucket holds n/2^planes vectors
    and the candidate set blows up O(n^2/2^planes) (measured: 8 fixed
    planes at just 5k random vectors -> 1.7M candidate pairs). At
    log2(n)+2 planes the expected random-collision candidate volume is
    ~4n x n_tables/8 pairs, and recall is ~0.97 at c=0.95 / ~1.0 at
    c>=0.99 up to ~10^6 rows; raise ``n_tables`` (or pass a smaller
    ``n_planes``) for higher recall at looser thresholds.

    Candidate discovery reuses the MinHash spine: (key, id) rows only,
    colliding keys via the bucketed blob exchange, worker-side pair
    formation with a LOUD ``max_bucket`` cap, then exact cosine
    verification through ``pair_payload_join`` — one vectorized
    row-wise kernel per batch, never an O(k^2) within-bucket matmul and
    never a per-row ``to_pylist`` conversion.

    ``int8_prune`` (default): candidate verification is dominated by
    payload VOLUME through the pair join (float64 embeddings are
    8 B/dim/side/pair, and random LSH collisions far outnumber true
    dups). A first pass joins int8-quantized unit vectors (1 B/dim —
    8x less exchange traffic), scores the approximate cosine and drops
    pairs provably below threshold: with û = round(127u)/127 the
    per-vector L2 error is δ <= sqrt(d)/254, so the normalized-int8
    cosine differs from the true cosine by at most eps = 2δ + δ²
    (two angle perturbations of at most asin(δ)). Only pairs with
    approx >= threshold - eps — true dups plus a thin margin — ride
    the full-precision join, whose final cosine is EXACT float on the
    original values (the prune can only discard, never alter).
    """
    from patito_ray.functions.similarity import _to_matrix, _unit

    # the corpus is consumed by plane sizing, LSH coding AND payload
    # attachment: pin it once so an unmaterialized upstream pipeline
    # (read -> embed) doesn't execute three times
    ds = ds.materialize()
    if n_planes is None:
        import math

        n = max(2, ds.count())
        n_planes = max(8, min(28, math.ceil(math.log2(n)) + 2))

    table_salts = _splitmix(
        np.arange(1, n_tables + 1, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    )

    def code_rows(batch: pa.Table) -> pa.Table:
        vecs = _to_matrix(batch.column(vec_col))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        if vecs.size == 0:
            return pa.table(
                {
                    "key": pa.array([], type=pa.int64()),
                    id_col: pa.array([], type=pa.int64()),
                }
            )
        planes = _hyperplanes(seed, vecs.shape[1], n_planes * n_tables)
        signs = (vecs @ planes) > 0  # (n, n_tables*n_planes)
        n = len(ids)
        keys = np.empty(n_tables * n, dtype=np.uint64)
        for t in range(n_tables):
            sl = signs[:, t * n_planes : (t + 1) * n_planes]
            bucket = np.zeros(n, dtype=np.uint64)
            for b in range(n_planes):
                bucket |= sl[:, b].astype(np.uint64) << np.uint64(b)
            keys[t * n : (t + 1) * n] = _splitmix(bucket ^ table_salts[t])
        return pa.table(
            {
                "key": pa.array(keys.view(np.int64), type=pa.int64()),
                id_col: pa.array(np.tile(ids, n_tables)),
            }
        )

    rows = ds.map_batches(code_rows, batch_format="pyarrow", batch_size=None).materialize()
    hits, n_keys = _colliding_subset(rows, max_collision_keys)
    pairs = _bucket_pairs(hits, id_col, max_bucket, n_keys_hint=n_keys)

    if int8_prune:
        pairs = _int8_prune_pairs(
            ds, pairs, id_col, vec_col, threshold, num_partitions
        )

    joined = pair_payload_join(ds, pairs, id_col, vec_col, num_partitions)

    def score(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "a": pa.array([], type=pa.int64()),
                    "b": pa.array([], type=pa.int64()),
                    "cosine": pa.array([], type=pa.float64()),
                }
            )
        va = _unit(_to_matrix(batch.column("val_a")))
        vb = _unit(_to_matrix(batch.column("val_b")))
        sims = np.einsum("ij,ij->i", va, vb)
        keep = sims >= threshold
        return pa.table(
            {
                "a": batch.column("a").filter(pa.array(keep)),
                "b": batch.column("b").filter(pa.array(keep)),
                "cosine": pa.array(sims[keep], type=pa.float64()),
            }
        )

    return joined.map_batches(score, batch_format="pyarrow", batch_size=None)


def benchmark_gram_hashes(
    texts: "pa.Array | pa.ChunkedArray | list[str]", n: int = 3
) -> np.ndarray:
    """Sorted unique word-n-gram hash set of a benchmark corpus —
    the broadcast side of ``contamination_flags``. Benchmark/eval sets
    are small (MBs) by construction; the gram set is a few million
    uint64s at most, well inside ``ray.put`` broadcast territory."""
    if isinstance(texts, list):
        texts = pa.array(texts, type=pa.string())
    _, flat, _ = _gram_hash_sets(texts, n)
    return np.unique(flat)


def benchmark_gram_hashes_dataset(
    bench_ds: Any, n: int = 3, text_col: str = "text"
) -> np.ndarray:
    """Distributed form of :func:`benchmark_gram_hashes`: reduce a
    benchmark **Dataset** to its sorted unique gram-hash set without
    ever materializing benchmark TEXT on the driver. Each batch emits
    its per-batch-unique 8-byte gram hashes (int64 view — Ray block
    building rejects uint64 > 2^63); only those narrow rows reach the
    driver, so the collection is O(distinct grams x 8 B) regardless of
    corpus text volume."""
    import ray

    def grams(batch: pa.Table) -> pa.Table:
        _, flat, _ = _gram_hash_sets(batch.column(text_col), n)
        u = np.unique(flat)
        return pa.table({"g": pa.array(u.view(np.int64), type=pa.int64())})

    m = bench_ds.map_batches(
        grams, batch_format="pyarrow", batch_size=None
    ).materialize()
    tabs = [t for t in ray.get(m.to_arrow_refs()) if t.num_rows]
    if not tabs:
        return np.empty(0, dtype=np.uint64)
    flat = np.concatenate(
        [t.column("g").to_numpy(zero_copy_only=False) for t in tabs]
    ).view(np.uint64)
    return np.unique(flat)


def contamination_flags(
    ds: Any,
    benchmark: "pa.Array | pa.ChunkedArray | list[str] | np.ndarray | Any",
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Any:
    """Train/test decontamination: flag corpus docs sharing any word
    n-gram with a benchmark set (the standard membership check run
    before training to keep eval data out of the training corpus).

    -> Dataset[id_col, n_grams, n_hits, contaminated] with one row per
    input doc: ``n_grams`` = the doc's distinct-gram count, ``n_hits``
    = how many of those grams appear in the benchmark, ``contaminated``
    = n_hits > 0.

    ``benchmark`` may be in-memory strings, a prehashed uint64 array,
    or a ray ``Dataset`` — the Dataset form reduces to the gram-hash
    set worker-side (:func:`benchmark_gram_hashes_dataset`) so no
    benchmark text ever reaches the driver.

    Execution shape: the benchmark's unique gram hashes are broadcast
    ONCE via ``ray.put`` (an eval set is MBs — broadcasting it beats
    any shuffle by orders of magnitude); each batch builds its docs'
    deduped gram-hash sets vectorized (``_gram_hash_sets``, RE2-exact
    tokenization) and counts membership with one ``np.searchsorted``
    against the sorted benchmark array — no shuffle, no state, stream
    to the end. For a benchmark too large to broadcast (not a real
    eval-set regime), co-partition doc grams and benchmark grams by
    gram hash instead.

    Hash-set membership equals string-gram membership up to 64-bit
    collisions (~|bench|·|grams|/2**64 false-hit probability — the SQL
    oracle compares gram STRINGS and agrees exactly on the test
    corpora). Short docs (1..n-1 tokens) contribute their whole
    normalized token sequence as one gram, zero-token docs have no
    grams — same semantics on both sides (``_shingle_hashes``).
    """
    import ray

    if isinstance(benchmark, np.ndarray):
        bench = np.asarray(benchmark, dtype=np.uint64)
    elif hasattr(benchmark, "map_batches"):  # ray.data.Dataset benchmark
        bench = benchmark_gram_hashes_dataset(benchmark, n, text_col=text_col)
    else:
        bench = benchmark_gram_hashes(benchmark, n)
    bench_ref = ray.put(np.sort(bench))

    def flag(batch: pa.Table) -> pa.Table:
        bench_sorted = ray.get(bench_ref)  # zero-copy object-store read
        rows, flat, sizes = _gram_hash_sets(batch.column(text_col), n)
        if len(bench_sorted):
            pos = np.searchsorted(bench_sorted, flat)
            # clamp the one-past-the-end positions (flat > max(bench),
            # so the compare below is False for them regardless)
            pos[pos == len(bench_sorted)] = 0
            hit = bench_sorted[pos] == flat
        else:
            hit = np.zeros(len(flat), dtype=bool)
        n_hits = np.bincount(rows[hit], minlength=batch.num_rows).astype(np.int64)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "n_grams": pa.array(sizes, type=pa.int64()),
                "n_hits": pa.array(n_hits, type=pa.int64()),
                "contaminated": pa.array(n_hits > 0),
            }
        )

    return ds.map_batches(flag, batch_format="pyarrow", batch_size=None)


def explode_chunks(
    batch: pa.Table,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 10,
) -> pa.Table:
    """Vectorized passage explode: each doc's RE2-whitespace tokens in
    fixed windows of ``chunk_tokens`` -> one row per (doc, chunk_idx)
    with the chunk text re-joined by single spaces. The flat_map
    primitive of passage-level dedup; no Python per row."""
    if chunk_tokens < 1:
        raise ValueError(f"chunk_tokens must be >= 1, got {chunk_tokens}")
    text = batch.column(text_col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    if pa.types.is_large_string(text.type):
        # polars round-trips emit large_string; binary_join has no
        # kernel for list<large_string> (fine under Ray's ~128 MB
        # block sizing — a single column never nears the 2 GB offsets)
        text = pc.cast(text, pa.string())
    toks = pc.split_pattern_regex(text, pattern=r"[\t\n\f\r ]+")
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    keep = pc.fill_null(pc.not_equal(flat, ""), False)
    if not pc.all(keep).as_py():
        parents = parents[keep.to_numpy(zero_copy_only=False)]
        flat = flat.filter(keep)
    if len(flat) == 0:
        return pa.table(
            {
                id_col: pa.array([], type=pa.int64()),
                "chunk_idx": pa.array([], type=pa.int64()),
                "chunk": pa.array([], type=pa.string()),
            }
        )
    # position within row without any per-row loop: global index minus
    # the index where the row's run starts
    n = len(parents)
    idx = np.arange(n, dtype=np.int64)
    run_start = np.zeros(n, dtype=np.int64)
    new_run = np.zeros(n, dtype=bool)
    new_run[0] = True
    new_run[1:] = parents[1:] != parents[:-1]
    run_start[new_run] = idx[new_run]
    np.maximum.accumulate(run_start, out=run_start)
    chunk_idx = (idx - run_start) // chunk_tokens
    starts = np.zeros(n, dtype=bool)
    starts[0] = True
    starts[1:] = new_run[1:] | (chunk_idx[1:] != chunk_idx[:-1])
    start_pos = np.nonzero(starts)[0]
    offsets = np.concatenate([start_pos, [n]]).astype(np.int64)
    chunks = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(offsets, type=pa.int64()).cast(pa.int32()), flat),
        " ",
    )
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    return pa.table(
        {
            id_col: pa.array(ids[parents[start_pos]], type=pa.int64()),
            "chunk_idx": pa.array(chunk_idx[start_pos], type=pa.int64()),
            "chunk": chunks,
        }
    )


def dedup_chunks(
    ds: Any,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 10,
) -> Any:
    """Passage-level exact dedup: keep the FIRST occurrence (smallest
    (doc_id, chunk_idx)) of every distinct ``chunk_tokens``-token
    window across the corpus -> Dataset[id_col, chunk_idx].

    Scale shape mirrors ``dedup_exact_ids``: only narrow
    (chunk_hash, order_key) pairs ride the one groupby exchange —
    16 B per chunk, never the chunk text. The order key packs
    (doc_id << 20) | chunk_idx so one int64 Min picks the
    lexicographically-first occurrence; ids must fit 43 bits and docs
    must stay under 2^20 chunks (checked loudly).
    """

    def narrow(t: pa.Table) -> pa.Table:
        ex = explode_chunks(t, id_col, text_col, chunk_tokens)
        ids = ex.column(id_col).to_numpy(zero_copy_only=False)
        ci = ex.column("chunk_idx").to_numpy(zero_copy_only=False)
        if len(ids):
            if ids.max() >= (1 << 43) or ids.min() < 0:
                raise ValueError(
                    f"dedup_chunks packs {id_col} into 43 bits; ids must "
                    "be in [0, 2^43)"
                )
            if ci.max() >= (1 << 20):
                raise ValueError(
                    "dedup_chunks supports at most 2^20 chunks per doc"
                )
        h = hash64(ex.column("chunk")).view(np.int64)
        return pa.table(
            {
                "h": pa.array(h, type=pa.int64()),
                "ok": pa.array((ids << np.int64(20)) | ci, type=pa.int64()),
            }
        )

    from patito_ray.stages.agg import merge_partial_mins

    # adaptive merge: driver polars below 256 MB of (hash, key) rows,
    # Ray's distributed groupby-Min beyond (the native sort shuffle
    # costs seconds even on narrow rows — dev notes)
    kept = merge_partial_mins(
        ds.map_batches(narrow, batch_format="pyarrow", batch_size=None),
        ["h"],
        ["ok"],
    )

    def decode(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "ok" not in t.column_names:
            return pa.schema(
                [(id_col, pa.int64()), ("chunk_idx", pa.int64())]
            ).empty_table()
        ok = t.column("ok").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: pa.array(ok >> np.int64(20), type=pa.int64()),
                "chunk_idx": pa.array(ok & np.int64((1 << 20) - 1), type=pa.int64()),
            }
        )

    if isinstance(kept, pa.Table):
        import ray.data as rd

        return rd.from_arrow(decode(kept))
    return kept.map_batches(decode, batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------------------
# cross-document line dedup (CCNet-style boilerplate removal)
# ---------------------------------------------------------------------------

# Driver/broadcast ceiling for the flagged-line hash set: lines that
# appear >= min_count times are at most total_lines/min_count distinct
# values, 8 B each — a crawl's boilerplate set (nav bars, cookie
# notices) is MBs. Beyond this, broadcasting is the wrong shape; see
# remove_frequent_lines' docstring for the co-partition alternative.
_LINE_BROADCAST_BYTES = 512 * 1024 * 1024


def _flat_lines(
    text: "pa.Array | pa.ChunkedArray", sep: str
) -> tuple[pa.Array, np.ndarray]:
    """Literal-separator split of a string column -> (flat line values,
    per-line parent row indices). Null texts are treated as '' (one
    empty line) so parent indices cover every row. Matches DuckDB
    string_split semantics exactly: empty strings between consecutive
    separators are kept, '' splits to ['']."""
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    if pa.types.is_large_string(text.type):
        # binary_join lacks a list<large_string> kernel (explode_chunks
        # has the same cast; fine under Ray's ~128 MB block sizing)
        text = pc.cast(text, pa.string())
    text = pc.fill_null(text, "")
    lines = pc.split_pattern(text, pattern=sep)
    flat = pc.list_flatten(lines)
    parents = pc.list_parent_indices(lines).to_numpy(zero_copy_only=False)
    return flat, parents


def frequent_line_hashes(
    ds: Any,
    min_count: int = 2,
    text_col: str = "text",
    sep: str = "\n",
    broadcast_limit_bytes: int = _LINE_BROADCAST_BYTES,
) -> np.ndarray:
    """Corpus-wide line frequency: hash every line of every doc, count
    occurrences, return the sorted uint64 hash set of lines appearing
    >= min_count times (the boilerplate set).

    Execution shape: one streaming map_batches emits per-batch partial
    (line_hash, cnt) pairs (np.unique pre-aggregation — 16 B per
    DISTINCT line per batch, never one row per line), merged by the
    adaptive partial-sum finalize (driver polars <= 256 MB, distributed
    groupby beyond). Only the >= min_count subset is pulled to the
    driver, with a hard size guard."""
    from patito_ray.stages.agg import merge_partial_sums

    if min_count < 2:
        raise ValueError(f"min_count must be >= 2, got {min_count}")

    def partial(batch: pa.Table) -> pa.Table:
        flat, _ = _flat_lines(batch.column(text_col), sep)
        uniq, cnt = np.unique(hash64(flat), return_counts=True)
        return pa.table(
            {
                # int64 view: Ray block building rejects uint64 > 2^63
                "lh": pa.array(uniq.view(np.int64), type=pa.int64()),
                "cnt": pa.array(cnt.astype(np.int64), type=pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    merged = merge_partial_sums(partials, ["lh"], ["cnt"])
    if isinstance(merged, pa.Table):
        hot = merged.filter(
            pc.greater_equal(merged.column("cnt"), min_count)
        ).column("lh")
        lh = hot.to_numpy(zero_copy_only=False)
    else:

        def keep_hot(t: pa.Table) -> pa.Table:
            return t.filter(
                pc.greater_equal(t.column("cnt"), min_count)
            ).select(["lh"])

        flagged = merged.map_batches(
            keep_hot, batch_format="pyarrow", batch_size=None
        ).materialize()
        if flagged.size_bytes() > broadcast_limit_bytes:
            raise ValueError(
                f"flagged line set is {flagged.size_bytes()} bytes "
                f"(> {broadcast_limit_bytes}): too large to broadcast. "
                "Raise min_count, or co-partition (doc_id, line_idx, "
                "line_hash) rows against the flagged hashes by hash "
                "instead of broadcasting."
            )
        from patito_ray.stages.agg import collect_table

        lh = collect_table(
            flagged, pa.schema([("lh", pa.int64())])
        ).column("lh").to_numpy(zero_copy_only=False)
    return np.sort(np.ascontiguousarray(lh, dtype=np.int64).view(np.uint64))


def remove_frequent_lines(
    ds: Any,
    min_count: int = 2,
    text_col: str = "text",
    sep: str = "\n",
    hot_hashes: "np.ndarray | None" = None,
    removed_col: str = "n_removed",
) -> Any:
    """CCNet-style boilerplate removal: delete every line that appears
    >= min_count times across the corpus (nav bars, cookie banners,
    footers), keeping each doc's remaining lines in original order.

    -> the input dataset with text_col replaced by the cleaned text and
    an appended ``removed_col`` (int64 count of removed lines per doc).

    Two streaming passes, no shuffle: pass 1 counts line hashes
    (``frequent_line_hashes`` — adaptive partial-sum merge); pass 2
    broadcasts the sorted flagged set ONCE via ray.put and rebuilds
    each doc vectorized (split -> hash -> searchsorted membership ->
    offset-rebuilt list -> binary_join). Line membership is by 64-bit
    hash — equal to string membership up to ~n/2**64 collision odds
    (the SQL oracle compares line STRINGS and agrees exactly on the
    test corpora). A line set too big to broadcast raises loudly
    rather than silently materializing (see frequent_line_hashes)."""
    import ray

    if hot_hashes is None:
        hot_hashes = frequent_line_hashes(ds, min_count, text_col, sep)
    ref = ray.put(np.sort(np.asarray(hot_hashes, dtype=np.uint64)))

    def clean(batch: pa.Table) -> pa.Table:
        hot = ray.get(ref)  # zero-copy object-store read per task
        flat, parents = _flat_lines(batch.column(text_col), sep)
        n = batch.num_rows
        h = hash64(flat)
        if len(hot):
            pos = np.searchsorted(hot, h)
            pos[pos == len(hot)] = 0
            member = hot[pos] == h
        else:
            member = np.zeros(len(h), dtype=bool)
        keep = ~member
        total = np.bincount(parents, minlength=n)
        kept_cnt = np.bincount(parents[keep], minlength=n)
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(kept_cnt, out=offsets[1:])
        kept_flat = flat.filter(pa.array(keep))
        clean_col = pc.binary_join(
            pa.ListArray.from_arrays(
                pa.array(offsets, type=pa.int64()).cast(pa.int32()), kept_flat
            ),
            sep,
        )
        out = batch.set_column(
            batch.schema.get_field_index(text_col), text_col, clean_col
        )
        return out.append_column(
            removed_col,
            pa.array((total - kept_cnt).astype(np.int64), type=pa.int64()),
        )

    return ds.map_batches(clean, batch_format="pyarrow", batch_size=None)


def corpus_diff(
    old: Any,
    new: Any,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: "int | None" = None,
) -> Any:
    """Diff two corpus versions by content: one row per doc id with
    ``status`` in {'added', 'removed', 'changed', 'unchanged'} — the
    ops primitive behind incremental re-processing ("re-run the
    pipeline only on added+changed") and release audits.

    Scale shape: each side collapses to narrow (id, raw-content hash64)
    rows per batch; the sides meet through ONE tagged-union
    co-partition on the id (``copartition_apply`` — the engine's spine
    for every two-sided operator) and each partition resolves statuses
    with two vectorized index_in probes. Text payloads never ride the
    exchange. Equal hashes are read as equal content (fixed-seed 64-bit
    hash: one expected collision per ~2^32 changed docs mislabels as
    'unchanged'; pass your own pre-hashed columns for a stronger
    digest). Duplicate ids within a side are rejected loudly where they
    meet."""
    from patito_ray.stages.join import copartition_apply

    def narrow(side_new: bool):
        def fn(t: pa.Table) -> pa.Table:
            keys = t.column(id_col)
            if isinstance(keys, pa.ChunkedArray):
                keys = keys.combine_chunks()
            h = pa.array(
                hash64(t.column(text_col)).view(np.int64), type=pa.int64()
            )
            if side_new:
                return pa.table({"nid": keys, "h_new": h})
            return pa.table({"oid": keys, "h_old": h})

        return fn

    o = old.map_batches(narrow(False), batch_format="pyarrow", batch_size=None)
    n = new.map_batches(narrow(True), batch_format="pyarrow", batch_size=None)

    def part_fn(ot: pa.Table, nt: pa.Table) -> pa.Table:
        def _arr(col):
            return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col

        oid, nid = _arr(ot.column("oid")), _arr(nt.column("nid"))
        for side, arr in (("old", oid), ("new", nid)):
            if len(arr) > 1:
                vals = arr.to_numpy(zero_copy_only=False)
                if np.unique(vals).size != vals.size:
                    raise ValueError(
                        f"corpus_diff: duplicate {id_col!r} values in the "
                        f"{side} corpus — ids must be unique per version"
                    )
        in_new = (
            pc.fill_null(pc.index_in(oid, value_set=nid), -1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        added_mask = pc.is_null(pc.index_in(nid, value_set=oid)).to_numpy(
            zero_copy_only=False
        )
        h_old = ot.column("h_old").to_numpy(zero_copy_only=False)
        h_new = nt.column("h_new").to_numpy(zero_copy_only=False)

        removed_mask = in_new < 0
        removed_ids = oid.filter(pa.array(removed_mask))
        added_ids = nid.filter(pa.array(added_mask))
        both_old_pos = np.flatnonzero(~removed_mask)
        same = h_old[both_old_pos] == h_new[in_new[both_old_pos]]
        both_ids = oid.take(pa.array(both_old_pos, type=pa.int64()))

        ids = pa.concat_arrays([removed_ids, added_ids, both_ids])
        status = pa.array(
            np.concatenate(
                [
                    np.full(len(removed_ids), "removed"),
                    np.full(len(added_ids), "added"),
                    np.where(same, "unchanged", "changed"),
                ]
            ),
            type=pa.string(),
        )
        return pa.table({id_col: ids, "status": status})

    return copartition_apply(
        o, n, "oid", "nid", part_fn, num_partitions=num_partitions
    )


def fuzzy_link(
    ds_a: Any,
    ds_b: Any,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    num_perm: int = 128,
    bands: int = 32,
    shingle_n: int = 3,
    max_bucket: int = 200,
) -> Any:
    """Cross-corpus fuzzy linkage -> Dataset[a, b, jaccard]: pairs with
    one record from ``ds_a`` and one from ``ds_b`` whose exact word
    n-gram Jaccard >= ``threshold`` (record-linkage / contamination
    tracing between two corpora whose ids may overlap).

    Rides the MinHash-LSH spine once over the UNION of both sides:
    each record gets a side-tagged uid (``id * 2 + side``, so the side
    survives the pair exchange at zero extra width), candidates form
    via the partitioned key-run scan, and same-side pairs are dropped
    BEFORE the payload join — the expensive exact-verify exchange only
    ever carries cross-corpus candidates. At bands=32/r=4 the per-pair
    candidate miss probability at j=0.8 is (1-0.8^4)^32 ~ 5e-8
    (vanishing for higher jaccard), so the verified set equals an
    exhaustive cross scan up to that probability.
    """
    import pyarrow.compute as _pc

    def tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
            if ids.size and (ids.min() < 0 or ids.max() >= (1 << 62)):
                raise ValueError(
                    f"fuzzy_link requires 0 <= {id_col} < 2**62 "
                    "(side tag is folded into the low bit)"
                )
            return pa.table(
                {
                    "uid": pa.array(ids * 2 + side, type=pa.int64()),
                    text_col: t.column(text_col),
                }
            )

        return fn

    union = ds_a.map_batches(tag(0), batch_format="pyarrow", batch_size=None).union(
        ds_b.map_batches(tag(1), batch_format="pyarrow", batch_size=None)
    )
    cand = minhash_candidate_pairs(
        union,
        id_col="uid",
        text_col=text_col,
        num_perm=num_perm,
        bands=bands,
        max_bucket=max_bucket,
    )

    def cross_only(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        return t.filter(pa.array((a & 1) != (b & 1)))

    cross = cand.map_batches(cross_only, batch_format="pyarrow", batch_size=None)
    verified = verify_pairs_dataset(
        union, cross, id_col="uid", text_col=text_col,
        threshold=threshold, shingle_n=shingle_n,
    )

    def untag(t: pa.Table) -> pa.Table:
        x = t.column("a").to_numpy(zero_copy_only=False)
        y = t.column("b").to_numpy(zero_copy_only=False)
        x_is_a = (x & 1) == 0
        side_a = np.where(x_is_a, x, y) >> 1
        side_b = np.where(x_is_a, y, x) >> 1
        return pa.table(
            {
                "a": pa.array(side_a, type=pa.int64()),
                "b": pa.array(side_b, type=pa.int64()),
                "jaccard": t.column("jaccard"),
            }
        )

    return verified.map_batches(untag, batch_format="pyarrow", batch_size=None)


def dedup_near_best(
    ds: Any,
    id_col: str = "doc_id",
    text_col: str = "text",
    score_col: str = "score",
    threshold: float = 0.8,
    num_perm: int = 128,
    bands: int = 16,
    shingle_n: int = 3,
    driver_cluster_limit: int = 10_000_000,
) -> Any:
    """Near-duplicate removal keeping the BEST-scoring member of each
    duplicate cluster (highest ``score_col``; ties -> min id) instead of
    ``dedup_near``'s min-id representative — "keep the highest-quality
    copy", the form curation pipelines actually want.

    Same spine as ``dedup_near`` (LSH candidates -> exact verify ->
    components); representative selection adds only CLUSTER-MEMBER-sized
    work: below ``driver_cluster_limit`` verified pairs the members'
    narrow (id, score) rows are collected once (bounded by pair volume)
    and the winner per root falls out of one lexsort; beyond it, scores
    attach to the distributed component labels via one co-partition
    exchange and winners are chosen per root-partition — nothing
    O(corpus) ever concentrates. Null scores rank below any non-null
    (SQL NULLS LAST semantics).
    """
    import pyarrow.compute as _pc

    pairs_ds = minhash_candidate_pairs(ds, id_col, text_col, num_perm, bands)
    verified_ds = verify_pairs_dataset(
        ds, pairs_ds, id_col, text_col, threshold, shingle_n
    ).materialize()

    n_pairs = verified_ds.count()
    if n_pairs == 0:
        return ds

    def _winner_drops(ids: np.ndarray, roots: np.ndarray, scores: np.ndarray) -> np.ndarray:
        """Member (id, root, score) arrays -> ids to DROP (everything
        but each root's best). -score ascending == score descending;
        nan (null score) sorts after every number, id breaks ties."""
        order = np.lexsort((ids, -scores, roots))
        r_s = roots[order]
        first = np.empty(len(r_s), dtype=bool)
        first[0] = True
        first[1:] = r_s[1:] != r_s[:-1]
        return ids[order][~first]

    if n_pairs <= driver_cluster_limit:
        verified = [
            (r["a"], r["b"])
            for r in verified_ds.select_columns(["a", "b"]).take_all()
        ]
        components = cluster_pairs(verified)
        member_arr = pa.array(sorted(components))
        member_ref_tab = (
            ds.map_batches(
                lambda t: t.select([id_col, score_col]).filter(
                    _pc.is_in(t.column(id_col), value_set=member_arr)
                ),
                batch_format="pyarrow",
                batch_size=None,
            )
        )
        from patito_ray.stages.agg import collect_table

        mt = collect_table(
            member_ref_tab,
            empty_schema=pa.schema([(id_col, pa.int64()), (score_col, pa.float64())]),
        )
        ids = mt.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        scores = mt.column(score_col).to_numpy(zero_copy_only=False).astype(np.float64)
        roots = np.fromiter(
            (components[int(i)] for i in ids), dtype=np.int64, count=len(ids)
        )
        drop = _winner_drops(ids, roots, scores)
        if not len(drop):
            return ds
        drop_set = pa.array(np.sort(drop))
        return ds.map_batches(
            lambda t: t.filter(
                _pc.invert(_pc.is_in(t.column(id_col), value_set=drop_set))
            ),
            batch_format="pyarrow",
            batch_size=None,
        )

    # crawl-scale path: distributed components -> attach scores by node
    # -> winner per root-partition -> anti co-partition filter
    from patito_ray.stages.exchange import hash_partition_ids
    from patito_ray.stages.join import copartition_apply, default_num_partitions

    comp = cluster_pairs_distributed(verified_ds)
    narrow = ds.map_batches(
        lambda t: t.select([id_col, score_col]),
        batch_format="pyarrow",
        batch_size=None,
    )

    def attach(lt: pa.Table, rt: pa.Table) -> pa.Table:
        import polars as pl

        l = pl.from_arrow(lt.select(["node", "root"]))
        r = pl.from_arrow(rt).rename({id_col: "node", score_col: "score"})
        return l.join(r, on="node", how="inner").to_arrow()

    scored = copartition_apply(comp, narrow, by="node", right_by=id_col, part_fn=attach)

    P = default_num_partitions()

    def add_part(t: pa.Table) -> pa.Table:
        part = hash_partition_ids(t.column("root"), P, "dedup_near_best root")
        return t.append_column("part", pa.array(part, type=pa.int64()))

    def emit_drops(g: pa.Table) -> pa.Table:
        ids = g.column("node").to_numpy(zero_copy_only=False).astype(np.int64)
        roots = g.column("root").to_numpy(zero_copy_only=False).astype(np.int64)
        scores = g.column("score").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({"node": pa.array(_winner_drops(ids, roots, scores), type=pa.int64())})

    drops = (
        scored.map_batches(add_part, batch_format="pyarrow", batch_size=None)
        .groupby("part")
        .map_groups(emit_drops, batch_format="pyarrow")
    )

    def anti(lt: pa.Table, rt: pa.Table) -> pa.Table:
        keep = _pc.invert(
            _pc.is_in(lt.column(id_col), value_set=rt.column("node").combine_chunks())
        )
        return lt.filter(keep)

    return copartition_apply(ds, drops, by=id_col, right_by="node", part_fn=anti)


def pair_overlap_dataset(
    ds: Any,
    pairs: Any,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    shingle_n: int = 3,
    num_partitions: "int | None" = None,
) -> Any:
    """:func:`verify_pairs_dataset` variant emitting the exact integer
    overlap decomposition per surviving pair — ``(a, b, inter, size_a,
    size_b)`` — the inputs for DIRECTIONAL containment (|A∩B|/|A| vs
    |A∩B|/|B|: which near-dup is the near-superset, i.e. who copied
    whom plus boilerplate), which symmetric Jaccard cannot
    distinguish. Same co-location, same vectorized gram-set kernel,
    same empty-text semantics; integers are exact, so the SQL oracle
    comparison has no float tolerance at all on the counts."""
    joined = pair_payload_join(ds, pairs, id_col, text_col, num_partitions)

    def score(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        out_schema = pa.schema(
            [
                ("a", pa.int64()),
                ("b", pa.int64()),
                ("inter", pa.int64()),
                ("size_a", pa.int64()),
                ("size_b", pa.int64()),
            ]
        )
        if n == 0:
            return out_schema.empty_table()
        inter, ca, cb = _pair_intersections(
            batch, text_col, shingle_n, "overlap scoring"
        )
        union = ca + cb - inter
        # containment over EMPTY gram sets is undefined — drop
        # zero-union pairs like the SQL oracle's union > 0 filter
        # (verify_pairs_dataset's jaccard keeps them as 1.0 by its own
        # ngram_jaccard contract; that convention has no meaningful
        # containment analogue)
        jac = inter / np.maximum(union, 1)
        m = (jac >= threshold) & (union > 0)
        keep = pa.array(m)
        return pa.table(
            {
                "a": batch.column("a").filter(keep),
                "b": batch.column("b").filter(keep),
                "inter": pa.array(inter[m].astype(np.int64)),
                "size_a": pa.array(ca[m].astype(np.int64)),
                "size_b": pa.array(cb[m].astype(np.int64)),
            },
            schema=out_schema,
        )

    return joined.map_batches(score, batch_format="pyarrow", batch_size=None)
