"""Approximate per-group aggregates that stay bounded when exact ones
explode.

``COUNT(DISTINCT v) GROUP BY k`` is the classic scale killer: exact
computation must co-locate every (k, v) pair — an all-to-all shuffle of
the full column at crawl scale. The HLL variant here ships a
fixed-size register block per (group x input block) instead: per batch
one vectorized pass folds every value hash into that batch's per-group
registers, and one hash exchange merges registers with
``np.maximum.reduceat`` over key runs. Register merge is idempotent,
commutative and associative, so the final estimate is BIT-IDENTICAL
under any partitioning or batch composition (property-tested) — the
estimate's ~1.04/sqrt(2^p) error comes from the sketch, never from the
execution plan.

Exchange volume: (distinct keys per block) x 2^p bytes. Default p=12
(4 KiB/key/block, ~1.6 % error); drop to p=8 (256 B, ~6.5 %) for
billion-group jobs. The same trade-off note lives in BASELINE.md.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa

from patito_ray.state.sketches import hash64


def _rank_of_hashes(h: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """(register index, rank) per hash — HLL's leading-zero count over
    the suffix, vectorized (same binary search as sketches.HyperLogLog,
    which this must stay consistent with)."""
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)
    hb = np.zeros(len(h), dtype=np.int64)
    vv = rest.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = vv >= (np.uint64(1) << np.uint64(shift))
        hb[mask] += shift
        vv[mask] >>= np.uint64(shift)
    rank = (64 - hb).clip(1, 64 - p + 1).astype(np.uint8)
    return idx, rank


def _estimate_rows(regs: np.ndarray) -> np.ndarray:
    """Vectorized HLL estimate per row of a (G, m) register matrix,
    with the small-range linear-counting correction."""
    g, m = regs.shape
    mf = float(m)
    alpha = 0.7213 / (1 + 1.079 / mf)
    inv = np.power(2.0, -regs.astype(np.float64))
    raw = alpha * mf * mf / inv.sum(axis=1)
    zeros = (regs == 0).sum(axis=1)
    small = (raw <= 2.5 * mf) & (zeros > 0)
    out = raw
    out[small] = mf * np.log(mf / zeros[small])
    return out


def approx_distinct_per_group(
    ds: Any,
    group_col: str,
    value_col: str,
    p: int = 12,
    out_col: str = "approx_distinct",
    num_partitions: int | None = None,
) -> Any:
    """Per-group approximate COUNT DISTINCT via one register exchange.

    Returns a Dataset of (group_col, out_col) with out_col int64 (the
    rounded HLL estimate). Estimates are deterministic: identical for
    any partitioning of the same input."""
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")
    m = 1 << p

    from patito_ray.stages.exchange import hash_partition_ids
    from patito_ray.stages.join import default_num_partitions

    if num_partitions is None:
        num_partitions = default_num_partitions()

    def partial(t: pa.Table) -> pa.Table:
        keys = t.column(group_col)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        if keys.null_count:
            raise ValueError(
                f"approx_distinct group column {group_col!r} contains "
                f"{keys.null_count} null(s)"
            )
        if t.num_rows == 0:
            return pa.table(
                {
                    group_col: keys,
                    "regs": pa.array([], type=pa.large_binary()),
                }
            )
        h = hash64(t.column(value_col))
        # group index per row via a sort + run detection
        import pyarrow.compute as pc

        sort_idx = pc.sort_indices(keys)
        sorted_keys = keys.take(sort_idx)
        si = sort_idx.to_numpy(zero_copy_only=False)
        # run starts over the sorted keys (works for any key dtype)
        eq = pc.equal(sorted_keys.slice(1), sorted_keys.slice(0, len(keys) - 1))
        new_run = np.concatenate(
            ([True], ~eq.to_numpy(zero_copy_only=False))
        )
        gid_sorted = np.cumsum(new_run) - 1
        n_groups = int(gid_sorted[-1]) + 1
        ridx, rank = _rank_of_hashes(h[si], p)
        regs = np.zeros(n_groups * m, dtype=np.uint8)
        np.maximum.at(regs, gid_sorted * m + ridx, rank)
        uniq_keys = sorted_keys.take(
            pa.array(np.flatnonzero(new_run), type=pa.int64())
        )
        offsets = np.arange(n_groups + 1, dtype=np.int64) * m
        blob = pa.Array.from_buffers(
            pa.large_binary(),
            n_groups,
            [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(regs.tobytes())],
        )
        return pa.table({group_col: uniq_keys, "regs": blob})

    def tag(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or group_col not in t.column_names:
            return pa.table(
                {
                    group_col: pa.array([], type=pa.int64()),
                    "regs": pa.array([], type=pa.large_binary()),
                    "_part": pa.array([], type=pa.int64()),
                }
            )
        part = hash_partition_ids(
            t.column(group_col), num_partitions, "approx_distinct group"
        )
        return t.append_column("_part", pa.array(part, type=pa.int64()))

    def finalize(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if group.num_rows == 0 or group_col not in group.column_names:
            return pa.table(
                {
                    group_col: pa.array([], type=pa.int64()),
                    out_col: pa.array([], type=pa.int64()),
                }
            )
        keys = group.column(group_col)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        sort_idx = pc.sort_indices(keys)
        sorted_keys = keys.take(sort_idx)
        blobs = group.column("regs").take(sort_idx)
        if isinstance(blobs, pa.ChunkedArray):
            blobs = blobs.combine_chunks()
        # every blob is exactly m bytes; after take the offsets stride
        # m, so the data buffer IS the (G, m) matrix — zero-copy view
        off = np.frombuffer(blobs.buffers()[1], dtype=np.int64)[
            blobs.offset : blobs.offset + len(blobs) + 1
        ]
        data = np.frombuffer(blobs.buffers()[2], dtype=np.uint8)
        if off.size and bool(np.all(np.diff(off) == m)):
            mat = data[off[0] : off[-1]].reshape(-1, m)
        else:  # non-uniform layout (shouldn't happen): safe fallback
            mat = np.frombuffer(
                b"".join(blobs.to_pylist()), dtype=np.uint8
            ).reshape(-1, m)
        eq = pc.equal(
            sorted_keys.slice(1), sorted_keys.slice(0, len(sorted_keys) - 1)
        )
        new_run = np.concatenate(([True], ~eq.to_numpy(zero_copy_only=False)))
        starts = np.flatnonzero(new_run)
        merged = np.maximum.reduceat(mat, starts, axis=0)
        est = np.rint(_estimate_rows(merged)).astype(np.int64)
        uniq_keys = sorted_keys.take(pa.array(starts, type=pa.int64()))
        return pa.table({group_col: uniq_keys, out_col: pa.array(est)})

    partials = ds.select_columns([group_col, value_col]).map_batches(
        partial, batch_format="pyarrow", batch_size=None
    )
    tagged = partials.map_batches(tag, batch_format="pyarrow", batch_size=None)
    return tagged.groupby("_part").map_groups(
        lambda g: finalize(g.drop_columns(["_part"]) if "_part" in g.column_names else g),
        batch_format="pyarrow",
    )


def approx_quantiles_per_group(
    ds: Any,
    by: str,
    value: str,
    qs: dict[str, float],
    delta: int = 100,
    num_partitions: int | None = None,
    raw_limit: int = 256,
    limit_bytes: int = 256 * 1024 * 1024,
) -> Any:
    """Approximate per-group quantiles via a t-digest exchange — the
    scale path when :func:`patito_ray.stages.quantiles.grouped_quantiles`'
    full-value exchange is too expensive. Each block ships ONE payload
    per group it contains, chosen adaptively: the RAW float64 values
    when the group has <= ``raw_limit`` rows in the block (fewer bytes
    AND no digest-build cost — at modest scale nearly every
    (block, group) cell is small and the build dominated wall time), a
    ~KiB t-digest beyond (bounded bytes however dense the cell).
    Digests and raw runs merge per group behind one hash exchange.
    Rank error is the t-digest's (~1/delta at the tails); unlike the
    HLL registers the merge is order-sensitive, so estimates may differ
    in low digits across plans — use the exact operator when
    bit-stability matters.

    Output: one row per group — ``by``, ``n`` (non-null count), one
    column per ``qs`` entry. Null values are dropped; null group keys
    are rejected (the exchange partitions on the key).
    """
    import pickle

    import polars as pl
    import pyarrow.compute as pc

    from patito_ray.state.sketches import TDigest

    for name, q in qs.items():
        if not (0.0 <= q <= 1.0):
            raise ValueError(f"quantile {name!r}={q} not in [0, 1]")
    if num_partitions is None:
        from patito_ray.stages.join import default_num_partitions

        num_partitions = default_num_partitions()

    def batch_digests(t: pa.Table) -> pa.Table:
        from patito_ray.stages.exchange import hash_partition_ids

        kv = pa.table({by: t.column(by), value: t.column(value)})
        if kv.column(value).null_count:
            kv = kv.filter(pc.is_valid(kv.column(value)))
        if kv.num_rows == 0:
            return pa.table(
                {
                    by: pa.array([], kv.schema.field(by).type),
                    "blob": pa.array([], pa.large_binary()),
                    "raw": pa.array([], pa.large_list(pa.float64())),
                    "part": pa.array([], pa.int64()),
                }
            )
        df = pl.from_arrow(kv).sort(by)
        keys = df.get_column(by).to_arrow()
        vals = df.get_column(value).to_numpy().astype(np.float64, copy=False)
        karr = keys.to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, karr[1:] != karr[:-1]])
        ends = np.r_[starts[1:], len(karr)]
        counts = ends - starts
        small = counts <= raw_limit
        # raw payloads: one vectorized list build over the small cells
        # (empty, non-null list for digest rows — no null bookkeeping)
        raw_mask = np.repeat(small, counts)
        flat = vals[raw_mask]
        offsets = np.r_[0, np.cumsum(np.where(small, counts, 0))]
        raw_col = pa.LargeListArray.from_arrays(
            pa.array(offsets, pa.int64()), pa.array(flat, pa.float64())
        )
        blobs = []
        for i, (s, e) in enumerate(zip(starts, ends)):
            if small[i]:
                blobs.append(b"")
            else:
                d = TDigest(delta)
                d.add(vals[s:e])
                blobs.append(pickle.dumps(d))
        group_keys = keys.take(pa.array(starts, pa.int64()))
        part = hash_partition_ids(
            group_keys, num_partitions, f"approx_quantiles group column {by!r}"
        )
        return pa.table(
            {
                by: group_keys,
                "blob": pa.array(blobs, pa.large_binary()),
                "raw": raw_col,
                "part": pa.array(part, pa.int64()),
            }
        )

    def merge_partition(group_table: pa.Table) -> pa.Table:
        t = group_table.drop_columns(["part"])
        karr = t.column(by).combine_chunks()
        order = pc.sort_indices(karr)
        karr = karr.take(order)
        blobs = t.column("blob").combine_chunks().take(order)
        raws = t.column("raw").combine_chunks().take(order)
        rflat = raws.values.to_numpy(zero_copy_only=False)
        roffs = raws.offsets.to_numpy(zero_copy_only=False)
        blob_len = pc.binary_length(blobs).to_numpy(zero_copy_only=False)
        knp = karr.to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, knp[1:] != knp[:-1]])
        ends = np.r_[starts[1:], len(knp)]
        out_rows: dict[str, list] = {by: [], "n": []}
        for name in qs:
            out_rows[name] = []
        for s, e in zip(starts, ends):
            d = None
            for j in range(s, e):
                if blob_len[j]:
                    dj = pickle.loads(blobs[j].as_py())
                    if d is None:
                        d = dj
                    else:
                        d.merge(dj)
            # all raw runs of the group are contiguous in the flattened
            # values (digest rows carry empty lists) — ONE add call
            raw_vals = rflat[roffs[s] : roffs[e]]
            if len(raw_vals):
                if d is None:
                    d = TDigest(delta)
                d.add(raw_vals)
            out_rows[by].append(knp[s])
            # weights are exact row counts (every add carries weight 1
            # and compression only re-bins), so the sum is the exact n
            out_rows["n"].append(int(round(float(d.state()[1].sum()))))
            for name, q in qs.items():
                out_rows[name].append(d.quantile(q))
        return pa.table(
            {
                by: pa.array(out_rows[by], t.schema.field(by).type),
                "n": pa.array(out_rows["n"], pa.int64()),
                **{n: pa.array(out_rows[n], pa.float64()) for n in qs},
            }
        )

    # same adaptive split as stages.quantiles: the per-(block, group)
    # payload stream is tiny at modest scale and the all-to-all's fixed
    # cost dominates — merge driver-side below 256 MB of payloads
    from patito_ray.stages.quantiles import _adaptive_grouped_holistic

    return _adaptive_grouped_holistic(
        ds, batch_digests, merge_partition, limit_bytes
    )
