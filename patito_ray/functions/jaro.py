"""Jaro-Winkler name similarity — record-linkage scoring for short
string keys (person/org/product names).

The kernel is BYTE-based (UTF-8), matching DuckDB's
``jaro_winkler_similarity`` BIT-EXACTLY (verified 5000/5000 on random
+ name-shaped pairs incl. multi-byte UTF-8: DuckDB scores bytes, not
codepoints): greedy window matching, transpositions = mismatches // 2,
Winkler boost (prefix <= 4, weight 0.1) only when jaro > 0.7. All
loops run over STRING POSITIONS (O(L^2) cheap numpy passes over the
whole pair batch), never over pairs — the same discipline as
``editdist.levenshtein_batch``.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_MAX_LEN = 64


def _byte_matrix(col: "pa.Array | pa.ChunkedArray", max_len: int):
    """String/binary column -> (n, L) int16 matrix of UTF-8 bytes
    padded with -1, plus the int64 length vector. Vectorized straight
    from the Arrow offsets/data buffers — no per-row Python."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        raise ValueError(
            f"jaro_winkler input contains {col.null_count} null value(s); "
            "filter or fill nulls first"
        )
    arr = pc.cast(col, pa.large_binary())
    n = len(arr)
    if n == 0:
        return np.empty((0, 0), dtype=np.int16), np.empty(0, dtype=np.int64)
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
        arr.offset : arr.offset + n + 1
    ]
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    lengths = np.diff(offs)
    L = int(lengths.max()) if n else 0
    if L > max_len:
        raise ValueError(
            f"jaro_winkler is for SHORT keys: got a {L}-byte value "
            f"(max_len={max_len}); truncate or raise max_len explicitly"
        )
    mat = np.full((n, max(L, 1)), -1, dtype=np.int16)
    rows = np.repeat(np.arange(n, dtype=np.int64), lengths)
    cols = np.arange(int(offs[-1] - offs[0]), dtype=np.int64) - np.repeat(
        offs[:-1] - offs[0], lengths
    )
    mat[rows, cols] = data[offs[0] : offs[-1]].astype(np.int16)
    return mat, lengths


def jaro_winkler_batch(
    a: "pa.Array | pa.ChunkedArray",
    b: "pa.Array | pa.ChunkedArray",
    prefix_weight: float = 0.1,
    max_len: int = _MAX_LEN,
) -> np.ndarray:
    """Jaro-Winkler similarity for every aligned (a[i], b[i]) pair ->
    float64 vector, bit-identical to DuckDB's
    ``jaro_winkler_similarity``."""
    A, la = _byte_matrix(a, max_len)
    B, lb = _byte_matrix(b, max_len)
    n = len(la)
    if len(lb) != n:
        raise ValueError(f"length mismatch: {n} vs {len(lb)} values")
    if n == 0:
        return np.empty(0, dtype=np.float64)
    L1, L2 = A.shape[1], B.shape[1]
    w = np.maximum(np.maximum(la, lb) // 2 - 1, 0)
    matched_a = np.zeros((n, L1), dtype=bool)
    matched_b = np.zeros((n, L2), dtype=bool)
    for i in range(L1):
        c = A[:, i]
        active = i < la
        lo = np.maximum(i - w, 0)
        hi = np.minimum(i + w + 1, lb)
        found = np.zeros(n, dtype=bool)
        for j in range(L2):
            cand = (
                active
                & ~found
                & (j >= lo)
                & (j < hi)
                & (B[:, j] == c)
                & ~matched_b[:, j]
            )
            matched_b[:, j] |= cand
            matched_a[:, i] |= cand
            found |= cand
    m = matched_a.sum(axis=1)
    # matched bytes in-order on each side; transpositions = mismatches // 2
    oa = np.argsort(~matched_a, axis=1, kind="stable")
    ob = np.argsort(~matched_b, axis=1, kind="stable")
    ca = np.take_along_axis(A, oa, axis=1)
    cb = np.take_along_axis(B, ob, axis=1)
    K = min(L1, L2)
    k_idx = np.arange(K)
    mism = ((ca[:, :K] != cb[:, :K]) & (k_idx < m[:, None])).sum(axis=1)
    t = mism // 2
    with np.errstate(divide="ignore", invalid="ignore"):
        jaro = (m / la + m / lb + (m - t) / m) / 3.0
    jaro = np.where(m == 0, 0.0, jaro)
    # common prefix (<= 4 bytes); boost only above the 0.7 threshold
    plen = np.zeros(n, dtype=np.int64)
    still = np.ones(n, dtype=bool)
    for i in range(min(4, L1, L2)):
        still = still & (i < la) & (i < lb) & (A[:, i] == B[:, i])
        plen += still
    return np.where(
        jaro > 0.7, jaro + plen * prefix_weight * (1.0 - jaro), jaro
    )


def blocked_name_link(
    left: Any,
    right: Any,
    left_key: str,
    right_key: str,
    left_block: str,
    right_block: str,
    left_name: str,
    right_name: str,
    threshold: float,
    num_partitions: int | None = None,
) -> Any:
    """Blocked record linkage: score every cross pair WITHIN a block
    (the classic ER blocking-key pattern) with Jaro-Winkler and keep
    pairs ``>= threshold`` -> Dataset[left_key, right_key, jw].

    ONE tagged-union co-partition exchange on the block key; inside
    each partition a polars hash join forms the within-block cross
    pairs and the batch kernel scores them all at once. Pair volume is
    sum-of(|L_b| x |R_b|) per block — the blocking key must keep blocks
    small (that is its job); a degenerate all-one-block input is
    inherently quadratic for ANY exact method.
    """
    from patito_ray.stages.join import copartition_apply

    _schema = pa.schema(
        [
            (left_key, pa.int64()),
            (right_key, pa.int64()),
            ("jw", pa.float64()),
        ]
    )

    def score(lt: pa.Table, rt: pa.Table) -> pa.Table:
        import polars as pl

        if lt.num_rows == 0 or rt.num_rows == 0:
            return _schema.empty_table()
        joined = pl.from_arrow(
            lt.select([left_key, left_block, left_name])
        ).join(
            pl.from_arrow(rt.select([right_key, right_block, right_name])),
            left_on=left_block,
            right_on=right_block,
            how="inner",
        )
        if joined.height == 0:
            return _schema.empty_table()
        jt = joined.to_arrow()
        jw = jaro_winkler_batch(jt.column(left_name), jt.column(right_name))
        keep = jw >= threshold
        return pa.table(
            {
                left_key: pc.cast(jt.column(left_key), pa.int64()).filter(
                    pa.array(keep)
                ),
                right_key: pc.cast(jt.column(right_key), pa.int64()).filter(
                    pa.array(keep)
                ),
                "jw": pa.array(jw[keep], type=pa.float64()),
            },
            schema=_schema,
        )

    return copartition_apply(
        left,
        right,
        by=left_block,
        right_by=right_block,
        part_fn=score,
        num_partitions=num_partitions,
    )
