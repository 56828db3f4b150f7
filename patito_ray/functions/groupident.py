"""Identity-group compaction for pairwise similarity operators.

Repeated strings are the degenerate case of every blocking scheme:
k copies of one value land in the same candidate bucket and cost the
pairing machinery O(k²) where the DISTINCT value costs O(1). These
helpers run once in front of a blocking spine (FastSS edit-distance,
prefix-filter set-similarity, ...):

1. ``identity_groups``: ONE narrow hash exchange groups ids by a
   64-bit identity hash of the raw string; each (batch, string) ships
   exactly one text copy, so the exchange carries 16 B/row plus one
   short key per distinct-string-per-batch. Output: one row per
   distinct string — (rep = min id, the text, the sorted member ids).
2. the caller runs its candidate/verify spine over the REPRESENTATIVES
   only, producing verified rep-level pairs;
3. ``within_group_pairs`` emits the identical-string pairs (distance 0
   / jaccard 1) straight from the groups, and ``cross_expand_pairs``
   expands each verified rep pair into the full id cross product —
   both vectorized, both capped at ``max_bucket`` ids per group with a
   loud log (the OUTPUT is inherently quadratic in the copy count; the
   cap bounds a pathological hot value, mirroring ``_bucket_pairs``).

64-bit identity hashing merges two different strings with probability
~n²/2⁶⁴ — the same collision tolerance as the exact-dedup family.
"""

from __future__ import annotations

import logging
from typing import Any, Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_LOG = logging.getLogger(__name__)

GROUP_SCHEMA = pa.schema(
    [("rep", pa.int64()), ("txt", pa.string()), ("ids", pa.large_list(pa.int64()))]
)


def identity_groups(
    ds: Any,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int | None = None,
) -> Any:
    """One row per distinct raw string: (rep = min id, txt, sorted
    member ids). Materialized (callers consume it 2-3 times)."""
    from patito_ray.state.sketches import hash64

    if num_partitions is None:
        from patito_ray.stages.join import default_num_partitions

        num_partitions = default_num_partitions()
    P = num_partitions

    member_schema = pa.schema(
        [
            ("part", pa.int64()),
            ("g", pa.int64()),
            ("mid", pa.int64()),
            ("txt", pa.string()),
        ]
    )

    def member(t: pa.Table) -> pa.Table:
        """(group-hash, id) rows; the string rides on exactly one row
        per (batch, group) — every member has the IDENTICAL text, so
        any single copy serves as the group representative."""
        text = t.column(text_col)
        if text.null_count:
            raise ValueError(
                f"text column {text_col!r} contains nulls; filter or impute "
                "before identity-group blocking"
            )
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if not len(ids):
            return member_schema.empty_table()
        g = hash64(text).view(np.int64)
        order = np.lexsort((ids, g))
        gs, ids_s = g[order], ids[order]
        heads = np.empty(len(gs), dtype=bool)
        heads[0] = True
        heads[1:] = gs[1:] != gs[:-1]
        txt = pc.if_else(
            pa.array(heads),
            text.combine_chunks().take(pa.array(order)),
            pa.nulls(len(gs), type=pa.string()),
        )
        part = (gs.view(np.uint64) % np.uint64(P)).astype(np.int64)
        return pa.table(
            {
                "part": pa.array(part, type=pa.int64()),
                "g": pa.array(gs, type=pa.int64()),
                "mid": pa.array(ids_s, type=pa.int64()),
                "txt": txt,
            },
            schema=member_schema,
        )

    def build_groups(pt: pa.Table) -> pa.Table:
        """One hash partition -> (rep=min id, txt, sorted id list) per
        distinct string. All segment ops, no per-group Python."""
        if pt.num_rows == 0 or "g" not in pt.column_names:
            return GROUP_SCHEMA.empty_table()
        g = pt.column("g").to_numpy(zero_copy_only=False)
        ids = pt.column("mid").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, g))
        gs, ids_s = g[order], ids[order]
        txt_s = pt.column("txt").combine_chunks().take(pa.array(order))
        heads = np.empty(len(gs), dtype=bool)
        heads[0] = True
        heads[1:] = gs[1:] != gs[:-1]
        idx = np.flatnonzero(heads)
        offsets = np.append(idx, len(gs)).astype(np.int64)
        # rep text: first non-null row inside each run (>= 1 exists —
        # each contributing batch shipped one)
        valid = pc.is_valid(txt_s).to_numpy(zero_copy_only=False)
        pos = np.where(valid, np.arange(len(gs)), len(gs))
        first_valid = np.minimum.reduceat(pos, idx)
        return pa.table(
            {
                "rep": pa.array(ids_s[idx], type=pa.int64()),
                "txt": txt_s.take(pa.array(first_valid)),
                "ids": pa.LargeListArray.from_arrays(
                    pa.array(offsets, type=pa.int64()),
                    pa.array(ids_s, type=pa.int64()),
                ),
            },
            schema=GROUP_SCHEMA,
        )

    return (
        ds.map_batches(member, batch_format="pyarrow", batch_size=None)
        .groupby("part")
        .map_groups(build_groups, batch_format="pyarrow")
        .materialize()
    )


def _pair_schema(const_cols: dict[str, tuple[Any, pa.DataType]]) -> pa.schema:
    return pa.schema(
        [("a", pa.int64()), ("b", pa.int64())]
        + [(name, typ) for name, (_v, typ) in const_cols.items()]
    )


def within_group_pairs(
    groups: Any,
    const_cols: dict[str, tuple[Any, pa.DataType]],
    max_bucket: int = 2000,
    keep_mask_fn: Callable[[pa.Array], np.ndarray] | None = None,
) -> Any:
    """Identical-string pairs: all id pairs inside each multi-member
    group, with constant similarity columns (``{"dist": (0, int64)}``).
    ``keep_mask_fn(txt_array) -> bool mask`` can exclude groups (e.g.
    token-empty strings that the operator defines as never pairing).
    Python loop only over groups with >= 2 members."""
    schema = _pair_schema(const_cols)

    def within(gt: pa.Table) -> pa.Table:
        if gt.num_rows == 0 or "ids" not in gt.column_names:
            return schema.empty_table()
        lists = gt.column("ids").combine_chunks()
        lens = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
        if keep_mask_fn is not None:
            keep = keep_mask_fn(gt.column("txt").combine_chunks())
            lens = np.where(keep, lens, 0)
        flat = lists.flatten().to_numpy(zero_copy_only=False)
        offs = np.concatenate(
            ([0], np.cumsum(pc.list_value_length(lists).to_numpy(zero_copy_only=False)))
        )
        out_a, out_b = [], []
        for gi in np.flatnonzero(lens > 1):
            k = int(lens[gi])
            if k > max_bucket:
                _LOG.warning(
                    "identity group with %d ids capped at max_bucket=%d "
                    "(%d ids dropped from identical-pairing)",
                    k, max_bucket, k - max_bucket,
                )
                k = max_bucket
            seg = flat[offs[gi] : offs[gi] + k]
            i0, i1 = np.triu_indices(k, 1)
            out_a.append(seg[i0])
            out_b.append(seg[i1])
        if not out_a:
            return schema.empty_table()
        a = np.concatenate(out_a)
        return pa.table(
            {
                "a": pa.array(a, type=pa.int64()),
                "b": pa.array(np.concatenate(out_b), type=pa.int64()),
                **{
                    name: pa.array(np.full(len(a), v), type=typ)
                    for name, (v, typ) in const_cols.items()
                },
            },
            schema=schema,
        )

    return groups.map_batches(within, batch_format="pyarrow", batch_size=None)


def cross_expand_pairs(
    groups: Any,
    rep_pairs: Any,
    pair_cols: dict[str, pa.DataType],
    max_bucket: int = 2000,
) -> Any:
    """Expand verified rep-level pairs (a, b, *pair_cols) to the full
    id cross product via ``pair_payload_join`` on the group id lists —
    the similarity columns ride the join's ``pair_cols`` passthrough.
    Output ids are re-ordered so a < b."""
    from patito_ray.functions.dedup import pair_payload_join

    schema = pa.schema(
        [("a", pa.int64()), ("b", pa.int64())]
        + [(name, typ) for name, typ in pair_cols.items()]
    )
    gkeyed = groups.map_batches(
        lambda t: t.select(["rep", "ids"]),
        batch_format="pyarrow",
        batch_size=None,
    )
    rejoined = pair_payload_join(
        gkeyed, rep_pairs, "rep", "ids", pair_cols=tuple(pair_cols)
    )

    def expand(bt: pa.Table) -> pa.Table:
        """One row per verified rep pair -> the id cross product,
        vectorized across pairs with segment offsets."""
        if bt.num_rows == 0 or "val_a" not in bt.column_names:
            return schema.empty_table()
        la_arr = bt.column("val_a").combine_chunks()
        lb_arr = bt.column("val_b").combine_chunks()
        raw_la = pc.list_value_length(la_arr).to_numpy(zero_copy_only=False).astype(np.int64)
        raw_lb = pc.list_value_length(lb_arr).to_numpy(zero_copy_only=False).astype(np.int64)
        la, lb = raw_la, raw_lb
        over_a, over_b = la > max_bucket, lb > max_bucket
        if over_a.any() or over_b.any():
            _LOG.warning(
                "cross expansion capped %d group side(s) at max_bucket=%d",
                int(over_a.sum() + over_b.sum()), max_bucket,
            )
            la = np.minimum(la, max_bucket)
            lb = np.minimum(lb, max_bucket)
        flat_a = la_arr.flatten().to_numpy(zero_copy_only=False)
        flat_b = lb_arr.flatten().to_numpy(zero_copy_only=False)
        offs_a = np.concatenate(([0], np.cumsum(raw_la)))
        offs_b = np.concatenate(([0], np.cumsum(raw_lb)))
        m = la * lb
        total = int(m.sum())
        if total == 0:
            return schema.empty_table()
        pair_idx = np.repeat(np.arange(len(m)), m)
        starts = np.concatenate(([0], np.cumsum(m)[:-1]))
        pos = np.arange(total) - starts[pair_idx]
        left = flat_a[offs_a[pair_idx] + pos // lb[pair_idx]]
        right = flat_b[offs_b[pair_idx] + pos % lb[pair_idx]]
        a2 = np.minimum(left, right)
        b2 = np.maximum(left, right)
        return pa.table(
            {
                "a": pa.array(a2, type=pa.int64()),
                "b": pa.array(b2, type=pa.int64()),
                **{
                    name: pc.take(
                        bt.column(name).combine_chunks().cast(typ),
                        pa.array(pair_idx, type=pa.int64()),
                    )
                    for name, typ in pair_cols.items()
                },
            },
            schema=schema,
        )

    return rejoined.map_batches(expand, batch_format="pyarrow", batch_size=None)
