"""Distributed global ordered prefix sum.

The SQL shape is ``SUM(v) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED
PRECEDING AND 1 PRECEDING)`` — every row learns the total of all rows
strictly before it in global ``k`` order. A single-partition window
would serialize the whole dataset through one task; this stage instead
range-partitions the key space and pays ONE narrow exchange:

1. boundary pass (narrow, no shuffle): each batch contributes a few
   evenly-strided sample keys; the driver picks P-1 range boundaries
   from the pooled sample (actual sample values, never float
   interpolation — int64 keys above 2^53 must not round).
2. totals pass (narrow, no shuffle): per-batch int64 partial sums per
   range, merged by the adaptive partial-sum merge; the driver computes
   the P-entry exclusive scan (partition base offsets).
3. exchange: rows tagged with their range id ride one
   ``groupby(part).map_groups``; each partition sorts by key and adds
   ``base[part] + exclusive cumsum`` — vectorized, one task per range.

Skew note: ranges come from data quantiles, so a dense key region gets
narrow ranges rather than one hot partition. Ties in ``order_col``
would make "strictly before" ambiguous — callers must pass a unique
key (enforced per partition, where duplicates would actually meet).

No reference counterpart (JakobGM/patito delegates window frames to
polars on one machine); this is the distributed equivalent for the one
window SQL cannot hash-partition.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa


def _int_col(t: pa.Table, name: str, role: str) -> np.ndarray:
    col = t.column(name)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if not pa.types.is_integer(col.type):
        raise TypeError(
            f"ordered_prefix_sum needs an integer {role} column, got "
            f"{name!r}: {col.type} (hash or rank other key types first)"
        )
    if col.null_count:
        raise ValueError(
            f"ordered_prefix_sum {role} column {name!r} contains "
            f"{col.null_count} null(s)"
        )
    return col.to_numpy(zero_copy_only=False).astype(np.int64)


def ordered_prefix_sum(
    ds: Any,
    order_col: str,
    value_col: str,
    out_col: str = "offset",
    num_partitions: int | None = None,
    samples_per_block: int = 32,
    tie_col: str | None = None,
) -> Any:
    """Append ``out_col`` = sum of ``value_col`` over all rows strictly
    before this one in global ``(order_col, tie_col)`` order (exclusive
    prefix sum). The combined order key must be unique — pass
    ``tie_col`` when ``order_col`` alone can collide (e.g. a 64-bit
    shuffle hash over 10^11 docs expects a few collisions); rows that
    share an ``order_col`` value always land in the same range, so the
    uniqueness check still runs where duplicates meet. ``value_col``
    must be integer (token counts, byte sizes — int64 holds 100 TB of
    either)."""
    if num_partitions is None:
        from patito_ray.stages.join import default_num_partitions

        num_partitions = default_num_partitions()

    # three passes read the input — pin it in the object store once so
    # a lazily-derived input (e.g. tokenize-and-count) does not
    # recompute per pass. Callers pass NARROW projections (the public
    # users ship (key, count) at ~16 B/row); wide payloads should join
    # back by key instead of riding the prefix sum.
    ds = ds.materialize()

    # ---- pass 1: range boundaries from strided per-batch samples ----
    def sample(t: pa.Table) -> pa.Table:
        k = _int_col(t, order_col, "order")
        if k.size == 0:
            return pa.table({"k": pa.array([], type=pa.int64())})
        k = np.sort(k)
        stride = max(1, k.size // samples_per_block)
        return pa.table({"k": pa.array(k[::stride][:samples_per_block])})

    pool_ds = ds.select_columns([order_col]).map_batches(
        sample, batch_format="pyarrow", batch_size=None
    )
    from patito_ray.stages.agg import collect_table

    pool = collect_table(pool_ds, pa.schema([("k", pa.int64())]))
    keys = np.sort(pool.column("k").to_numpy(zero_copy_only=False))
    if keys.size:
        # actual sample values at quantile positions — exact dtype, no
        # float interpolation
        pos = (np.arange(1, num_partitions) * keys.size) // num_partitions
        bounds = np.unique(keys[pos])
    else:
        bounds = np.array([], dtype=np.int64)
    n_parts = bounds.size + 1

    # ---- pass 2: per-range totals -> driver exclusive scan ----
    def totals(t: pa.Table) -> pa.Table:
        k = _int_col(t, order_col, "order")
        v = _int_col(t, value_col, "value")
        part = np.searchsorted(bounds, k, side="right")
        acc = np.zeros(n_parts, dtype=np.int64)
        np.add.at(acc, part, v)
        nz = np.flatnonzero(acc)
        return pa.table(
            {
                "part": pa.array(nz.astype(np.int64)),
                "total": pa.array(acc[nz]),
            }
        )

    from patito_ray.stages.agg import merge_partial_sums

    merged = merge_partial_sums(
        ds.select_columns([order_col, value_col]).map_batches(
            totals, batch_format="pyarrow", batch_size=None
        ),
        ["part"],
        ["total"],
    )
    if not isinstance(merged, pa.Table):
        merged = collect_table(
            merged, pa.schema([("part", pa.int64()), ("total", pa.int64())])
        )
    per_part = np.zeros(n_parts, dtype=np.int64)
    p = merged.column("part").to_numpy(zero_copy_only=False)
    per_part[p] = merged.column("total").to_numpy(zero_copy_only=False)
    base = np.concatenate(([0], np.cumsum(per_part)[:-1]))

    # ---- pass 3: one exchange, per-range sort + offset cumsum ----
    def tag(t: pa.Table) -> pa.Table:
        k = _int_col(t, order_col, "order")
        part = np.searchsorted(bounds, k, side="right")
        return t.append_column("part", pa.array(part.astype(np.int64)))

    def finalize(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return group.drop_columns(["part"])
        part = int(group.column("part")[0].as_py())
        gk = group.column(order_col).to_numpy(zero_copy_only=False)
        if tie_col is not None:
            gt = group.column(tie_col).to_numpy(zero_copy_only=False)
            order = np.lexsort((gt, gk))  # primary gk, ties by gt
        else:
            order = np.argsort(gk, kind="stable")
        t = group.take(pa.array(order)).drop_columns(["part"])
        k = _int_col(t, order_col, "order")
        dup = k.size > 1 and (k[1:] == k[:-1])
        if tie_col is not None and k.size > 1:
            tt = _int_col(t, tie_col, "tie")
            dup = dup & (tt[1:] == tt[:-1])
        if k.size > 1 and np.asarray(dup).any():
            raise ValueError(
                f"ordered_prefix_sum order key "
                f"({order_col!r}{', ' + repr(tie_col) if tie_col else ''}) "
                "has duplicate values; the global order must be total"
            )
        v = _int_col(t, value_col, "value")
        off = base[part] + np.cumsum(v) - v
        return t.append_column(out_col, pa.array(off.astype(np.int64)))

    tagged = ds.map_batches(tag, batch_format="pyarrow", batch_size=None)
    return tagged.groupby("part").map_groups(finalize, batch_format="pyarrow")


def global_ntile(
    ds: Any,
    order_col: str,
    k: int,
    tie_col: str | None = None,
    out_col: str = "bucket",
    num_partitions: int | None = None,
) -> Any:
    """SQL ``NTILE(k) OVER (ORDER BY order_col[, tie_col])`` — exact
    equi-depth bucketing over a GLOBAL order without a global sort of
    the payload: the 0-based global rank is the ordered prefix sum of
    ones (one narrow exchange), and the bucket id is then pure integer
    arithmetic (first ``n % k`` buckets take ``n // k + 1`` rows, the
    rest ``n // k`` — the standard SQL distribution).

    Returns a Dataset of ``(order_col[, tie_col], out_col)`` — callers
    join buckets back by key or aggregate per bucket directly; wide
    payloads never ride the rank exchange. The combined order key must
    be unique (``ordered_prefix_sum``'s totality contract)."""
    if k < 1:
        raise ValueError(f"global_ntile needs k >= 1, got {k}")

    cols = [order_col] + ([tie_col] if tie_col else [])

    def narrow(t: pa.Table) -> pa.Table:
        t = t.select(cols)
        return t.append_column(
            "_one", pa.array(np.ones(t.num_rows, dtype=np.int64))
        )

    plan = ds.select_columns(cols).map_batches(
        narrow, batch_format="pyarrow", batch_size=None
    ).materialize()
    n = plan.count()
    ranked = ordered_prefix_sum(
        plan, order_col, "_one", out_col="_rank", tie_col=tie_col,
        num_partitions=num_partitions,
    )
    size, rem = divmod(n, k)
    cut = rem * (size + 1)

    def assign(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "_rank" not in t.column_names:
            return pa.table(
                {c: pa.array([], type=pa.int64()) for c in cols + [out_col]}
            )
        r = t.column("_rank").to_numpy(zero_copy_only=False)
        # the unselected branch still evaluates: clamp its divisor so
        # n < k (size == 0) cannot divide by zero
        b = np.where(r < cut, r // (size + 1), rem + (r - cut) // max(size, 1))
        t = t.drop_columns(["_one", "_rank"])
        return t.append_column(out_col, pa.array((b + 1).astype(np.int64)))

    return ranked.map_batches(assign, batch_format="pyarrow", batch_size=None)
