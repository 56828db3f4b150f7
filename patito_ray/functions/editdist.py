"""Edit-distance (Levenshtein) near-duplicate pairs over short string
keys — typo-level dedup for titles, product names, canonical URLs.

Candidate generation is FastSS-style deletion-neighborhood blocking
(Bocek et al., "Fast Similarity Search in Large Dictionaries", 2007 —
public technique): if ``ed(a, b) <= d`` then deleting at most ``d``
characters from each side yields a common string (take an optimal
alignment; drop a's substituted/deleted chars and b's substituted/
inserted chars — at most d each — and the matched remainders are
equal). So hashing every <=d-deletion variant of every key and pairing
ids that share a variant hash has EXACT recall; precision is restored
by an exact vectorized Levenshtein verify. Hash collisions between
different variant strings only ever ADD candidates (verified away),
never drop true pairs.

Scale shape (the same spine as MinHash/SimHash/image near-dup), run
over DISTINCT strings only (``groupident.identity_groups`` compacts
repeated keys first; identical-string pairs come from the id groups
and verified rep pairs expand back via vectorized cross products):

1. one ``map_batches`` pass emits narrow (variant_hash, rep_id) rows —
   variants are hashed ARITHMETICALLY from per-row prefix hashes
   (hash(s[:i]) * B^len(tail) + hash(s[i+1:]), uint64 wraparound), so
   no deleted string is ever materialized;
2. colliding hashes surface through the bucketed blob exchange and
   broadcast back as a filter (``dedup._colliding_subset``) — the
   overwhelmingly-singleton remainder never shuffles;
3. pairs form worker-side via the partitioned key-run scan
   (``dedup._bucket_pairs``), dedup'd by hash-partition;
4. payloads co-locate through ``dedup.pair_payload_join`` and the
   verify kernel computes EXACT Levenshtein distances for a whole
   batch of pairs at once — one numpy DP whose inner loop runs over
   string positions, never over pairs.

Variant volume is 1 + n + n(n-1)/2 rows per key at ``max_dist=2`` —
this operator is for SHORT keys (<= ``max_len`` chars, enforced
loudly), the realistic 100-TB use being url/title/name columns, not
document bodies (near-dup *documents* are MinHash's job).
"""

from __future__ import annotations

import logging
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_LOG = logging.getLogger(__name__)

# polynomial rolling-hash base: odd => invertible mod 2^64, large and
# structureless (FNV-1a prime) so adjacent code points don't cancel
_HB = np.uint64(0x100000001B3)


def _codepoint_matrix(vals: np.ndarray, max_len: int) -> tuple[np.ndarray, np.ndarray]:
    """Object array of python strings -> (uint32 code-point matrix
    padded to ``max_len``, int64 lengths). Uses numpy's UTF-32 unicode
    layout for a loop-free conversion. Raises on over-length keys
    (silent truncation would silently lose recall)."""
    lens = np.fromiter((len(s) for s in vals), dtype=np.int64, count=len(vals))
    if lens.size and int(lens.max()) > max_len:
        n_bad = int((lens > max_len).sum())
        raise ValueError(
            f"edit_distance_near_dups: {n_bad} value(s) longer than "
            f"max_len={max_len} chars; this operator targets short keys "
            "(titles/names/urls) — raise max_len or pre-truncate "
            "explicitly upstream"
        )
    if not lens.size:
        return np.empty((0, max(max_len, 1)), dtype=np.uint32), lens
    u = np.asarray(vals, dtype=f"U{max_len}")
    mat = u.view(np.uint32).reshape(len(vals), max_len)
    return mat, lens


def _prefix_hashes(mat: np.ndarray) -> np.ndarray:
    """(n, L) code points -> (n, L+1) uint64 rolling prefix hashes:
    H[:, k] = hash of the first k characters. Padding columns produce
    garbage beyond each row's length, which is never read (all segment
    lookups are bounded by the row's true length)."""
    n, L = mat.shape
    H = np.zeros((n, L + 1), dtype=np.uint64)
    m = mat.astype(np.uint64)
    for k in range(L):
        H[:, k + 1] = H[:, k] * _HB + (m[:, k] + np.uint64(1))
    return H


def deletion_variant_rows(
    t: pa.Table, id_col: str, text_col: str, max_dist: int, max_len: int
) -> pa.Table:
    """One batch -> narrow (key:int64, id_col:int64) variant-hash rows,
    deduped per (key, id). Key = rolling hash of the string with 0, 1,
    ... ``max_dist`` characters deleted, composed from prefix hashes in
    O(1) per (row, deletion set) — the deleted strings themselves are
    never built."""
    if max_dist not in (0, 1, 2):
        raise ValueError("edit_distance_near_dups supports max_dist in {0, 1, 2}")
    ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    vals = t.column(text_col).to_numpy(zero_copy_only=False)
    if t.column(text_col).null_count:
        raise ValueError(
            f"text column {text_col!r} contains nulls; filter or impute "
            "before edit-distance near-dup blocking"
        )
    mat, lens = _codepoint_matrix(vals, max_len)
    n = len(ids)
    if n == 0:
        return pa.table(
            {"key": pa.array([], type=pa.int64()), id_col: pa.array([], type=pa.int64())}
        )
    H = _prefix_hashes(mat)
    L = int(lens.max()) if lens.size else 0
    pw = np.empty(max(L + 1, 1), dtype=np.uint64)
    pw[0] = np.uint64(1)
    if L:
        # array accumulate (scalar uint64 multiply raises a numpy
        # overflow warning; array ops wrap silently, which is the intent)
        pw[1:] = np.multiply.accumulate(np.full(L, _HB, dtype=np.uint64))
    rows_n = np.arange(n)

    def seg(rows: np.ndarray, i: np.ndarray, j: np.ndarray) -> np.ndarray:
        # hash of s[i:j] per row (uint64 wraparound subtraction)
        return H[rows, j] - H[rows, i] * pw[j - i]

    out_keys = [H[rows_n, lens]]  # 0 deletions
    out_ids = [ids]
    if max_dist >= 1:
        for i in range(L):
            rows = rows_n[lens > i]
            if not rows.size:
                break
            nl = lens[rows]
            k = seg(rows, np.full(rows.size, 0), np.full(rows.size, i)) * pw[
                nl - 1 - i
            ] + seg(rows, np.full(rows.size, i + 1), nl)
            out_keys.append(k)
            out_ids.append(ids[rows])
    if max_dist >= 2:
        for i in range(L - 1):
            for j in range(i + 1, L):
                rows = rows_n[lens > j]
                if not rows.size:
                    break
                nl = lens[rows]
                head = seg(rows, np.full(rows.size, 0), np.full(rows.size, i))
                mid = seg(rows, np.full(rows.size, i + 1), np.full(rows.size, j))
                tail = seg(rows, np.full(rows.size, j + 1), nl)
                k = (head * pw[j - i - 1] + mid) * pw[nl - 1 - j] + tail
                out_keys.append(k)
                out_ids.append(ids[rows])
    keys = np.concatenate(out_keys)
    kid = np.concatenate(out_ids)
    # per-batch (key, id) dedup: deleting different positions of a run
    # of equal chars yields the same variant — shrink the exchange now
    order = np.lexsort((kid, keys))
    keys, kid = keys[order], kid[order]
    keep = np.empty(keys.size, dtype=bool)
    keep[0] = True
    keep[1:] = (keys[1:] != keys[:-1]) | (kid[1:] != kid[:-1])
    return pa.table(
        {
            "key": pa.array(keys[keep].view(np.int64), type=pa.int64()),
            id_col: pa.array(kid[keep], type=pa.int64()),
        }
    )


def levenshtein_batch(
    a_vals: np.ndarray, b_vals: np.ndarray, max_len: int = 256
) -> np.ndarray:
    """Exact Levenshtein distance for P string pairs at once -> int64[P].

    Classic DP, vectorized ACROSS pairs: the outer loop runs over
    character positions of the left strings (<= max_len iterations);
    each iteration is O(P x L) numpy. The in-row dependency of the
    deletion term (cur[j] <- cur[j-1]+1) collapses to a prefix-min:
    cur[j] = min_{k<=j}(t[k] - k) + j where t[j] = min(prev[j]+1,
    prev[j-1]+sub_cost) — one ``np.minimum.accumulate`` per row of the
    DP table. Unicode exact (code-point edits, matching DuckDB's
    ``levenshtein``)."""
    P = len(a_vals)
    if P == 0:
        return np.empty(0, dtype=np.int64)
    A, la = _codepoint_matrix(np.asarray(a_vals, dtype=object), max_len)
    B, lb = _codepoint_matrix(np.asarray(b_vals, dtype=object), max_len)
    La = int(la.max()) if la.size else 0
    Lb = int(lb.max()) if lb.size else 0
    res = np.where(la == 0, lb, -1).astype(np.int64)
    if La == 0:
        return res
    j_idx = np.arange(Lb + 1, dtype=np.int32)
    prev = np.broadcast_to(j_idx, (P, Lb + 1)).copy()
    Bm = B[:, :Lb] if Lb else np.empty((P, 0), dtype=np.uint32)
    t = np.empty_like(prev)
    for i in range(1, La + 1):
        sub = (A[:, i - 1][:, None] != Bm).astype(np.int32)  # (P, Lb)
        t[:, 0] = i
        np.minimum(prev[:, 1:] + 1, prev[:, :-1] + sub, out=t[:, 1:])
        # prefix-min for the horizontal deletion chain
        cur = np.minimum.accumulate(t - j_idx, axis=1) + j_idx
        done = la == i
        if done.any():
            res[done] = cur[done, lb[done]]
        prev, t = cur, prev
    return res


_PAIR_SCHEMA = pa.schema(
    [("a", pa.int64()), ("b", pa.int64()), ("dist", pa.int64())]
)
def edit_distance_near_dups(
    ds: Any,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dist: int = 2,
    max_len: int = 64,
    max_bucket: int = 2000,
    max_collision_keys: int = 10_000_000,
    num_partitions: int | None = None,
) -> Any:
    """All id pairs whose ``text_col`` values are within Levenshtein
    distance ``max_dist`` -> Dataset[a:int64, b:int64, dist:int64]
    (a < b; dist exact, 0 = identical strings included).

    EXACT result (recall via the deletion-neighborhood theorem,
    precision via the vectorized DP verify). The whole spine runs over
    DISTINCT strings: a first narrow exchange groups ids by a 64-bit
    identity hash of the raw string (one short rep text per
    (batch, string) rides along, 16 B + one key per member row), so a
    corpus where a name repeats k times costs the variant/bucket/verify
    machinery ONE row, not k — repeated keys otherwise make every
    variant bucket quadratic (measured: 20k rows over 64 distinct names
    took 108 s via per-row blocking; distinct-first runs the identical
    output in ~4 s). Identical-string pairs (dist 0) come straight from
    the id groups; verified distinct-string pairs expand back to id
    pairs through ``pair_payload_join`` on the group id lists, cross
    products vectorized. ``max_bucket`` caps both variant-bucket
    pairing AND per-string group expansion (loud log on truncation).
    """
    from patito_ray.functions.dedup import (
        _bucket_pairs,
        _colliding_subset,
        pair_payload_join,
    )
    from patito_ray.functions.groupident import (
        cross_expand_pairs,
        identity_groups,
        within_group_pairs,
    )

    groups = identity_groups(ds, id_col, text_col, num_partitions)
    zero_pairs = within_group_pairs(
        groups, {"dist": (0, pa.int64())}, max_bucket
    )

    reps = groups.map_batches(
        lambda t: pa.table({id_col: t.column("rep"), text_col: t.column("txt")}),
        batch_format="pyarrow",
        batch_size=None,
    ).materialize()

    def variants(t: pa.Table) -> pa.Table:
        return deletion_variant_rows(t, id_col, text_col, max_dist, max_len)

    rows = reps.map_batches(
        variants, batch_format="pyarrow", batch_size=None
    ).materialize()
    hits, n_keys = _colliding_subset(rows, max_collision_keys)
    pairs = _bucket_pairs(hits, id_col, max_bucket, n_keys_hint=n_keys)
    joined = pair_payload_join(reps, pairs, id_col, text_col)

    def verify(batch: pa.Table) -> pa.Table:
        va = batch.column("val_a").to_numpy(zero_copy_only=False)
        vb = batch.column("val_b").to_numpy(zero_copy_only=False)
        dist = levenshtein_batch(va, vb, max_len=max_len)
        keep = dist <= max_dist
        return pa.table(
            {
                "a": batch.column("a").filter(pa.array(keep)),
                "b": batch.column("b").filter(pa.array(keep)),
                "dist": pa.array(dist[keep], type=pa.int64()),
            },
            schema=_PAIR_SCHEMA,
        )

    rep_pairs = joined.map_batches(verify, batch_format="pyarrow", batch_size=None)
    expanded = cross_expand_pairs(
        groups, rep_pairs, {"dist": pa.int64()}, max_bucket
    )
    return zero_pairs.union(expanded)
