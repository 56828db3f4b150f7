"""Distributed per-key window functions (SQL ``... OVER (PARTITION BY
key ORDER BY order_cols)``).

Scale shape: ONE hash exchange on the partition key — each batch tags
rows with ``hash(key) % P`` (vectorized, shared
:func:`patito_ray.stages.exchange.hash_partition_ids` kernel), then
``groupby(part).map_groups`` runs one vectorized polars window pass per
partition (sort + ``.over(key)`` expressions; P Python calls total,
never one per group). Skewed keys cost their own row count, nothing
more — a window is per-key sequential by definition, so this is the
minimum possible data movement (same exchange the reference-free asof /
range joins use).

The reference (JakobGM/patito) delegates window functions to polars on
one machine; this is the distributed equivalent.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

#: op name -> polars expression builder (src column, order direction)
_SUPPORTED_OPS = (
    "cum_sum",
    "cum_max",
    "cum_min",
    "row_number",
    "rank_min",
    "lag",
    "lead",
    "count",
    "rolling_sum",
    "ntile",
)

#: rows in the rolling frame (current row + N-1 preceding), settable
#: per call via window_over(..., frame=N)
_DEFAULT_FRAME = 7


def window_over(
    ds: Any,
    by: "str | list[str]",
    order: list[str],
    cols: dict[str, tuple[str, str | None]],
    descending: bool = False,
    num_partitions: int | None = None,
    frame: int = _DEFAULT_FRAME,
    ntile: int = 4,
) -> Any:
    """Append window columns computed per ``by`` group in ``order``.

    ``cols`` maps output column name -> ``(op, src)`` where op is one
    of ``cum_sum | cum_max | cum_min | row_number | rank_min | lag |
    lead | count | rolling_sum`` (``row_number``/``count`` need no src;
    ``rank_min`` ranks by its src ascending with SQL RANK ties;
    ``count`` is the partition row count; ``rolling_sum`` sums the SQL
    frame ``ROWS BETWEEN frame-1 PRECEDING AND CURRENT ROW``;
    ``ntile`` needs no src and assigns SQL NTILE(``ntile``) buckets —
    the first ``n % k`` buckets one row larger, pure integer
    arithmetic so bit-exact against SQL). Rows keep all input columns; output
    row order is partition-internal (canonicalize downstream when
    comparing). NULL ``by`` keys are rejected (SQL puts them in one
    partition; filter or fill first — same contract as grouped_top_k).

    ``by`` may be a LIST of columns (composite window key, e.g.
    (user, event_type)): the exchange hashes only the FIRST column —
    a key's sub-keys always co-locate with it — and the per-partition
    window expressions run ``.over(by)`` on the full composite.
    """
    import polars as pl

    by_cols = [by] if isinstance(by, str) else list(by)
    if not by_cols:
        raise ValueError("by must name at least one column")
    part_key, by = by_cols[0], by_cols

    for name, (op, _src) in cols.items():
        if op not in _SUPPORTED_OPS:
            raise ValueError(
                f"window op {op!r} for column {name!r} not in {_SUPPORTED_OPS}"
            )
    if num_partitions is None:
        from patito_ray.stages.join import default_num_partitions

        num_partitions = default_num_partitions()

    def add_part(t: pa.Table) -> pa.Table:
        from patito_ray.stages.exchange import hash_partition_ids

        part = hash_partition_ids(
            t.column(part_key),
            num_partitions,
            f"window_over key column {part_key!r}",
        )
        return t.append_column("part", pa.array(part, type=pa.int64()))

    sort_cols = by + list(order)

    def run_windows(group_table: pa.Table) -> pa.Table:
        df = pl.from_arrow(group_table.drop_columns(["part"]))
        df = df.sort(
            sort_cols,
            descending=[False] * len(by) + [descending] * len(order),
            maintain_order=True,
        )
        exprs = []
        for name, (op, src) in cols.items():
            if op == "cum_sum":
                e = pl.col(src).cum_sum()
            elif op == "cum_max":
                e = pl.col(src).cum_max()
            elif op == "cum_min":
                e = pl.col(src).cum_min()
            elif op == "row_number":
                e = pl.int_range(1, pl.len() + 1, dtype=pl.Int64)
            elif op == "rank_min":
                # always ascending, per the docstring contract — the
                # `descending` flag orders the frame for cum_*/lag/lead,
                # it does not flip rank direction (callers wanting a
                # descending rank negate src)
                e = pl.col(src).rank("min", descending=False).cast(pl.Int64)
            elif op == "lag":
                e = pl.col(src).shift(1)
            elif op == "count":
                # partition row count (SQL COUNT(*) OVER (PARTITION BY
                # key)); needs no src
                e = pl.len().cast(pl.Int64)
            elif op == "rolling_sum":
                # SQL ROWS BETWEEN frame-1 PRECEDING AND CURRENT ROW
                e = pl.col(src).rolling_sum(frame, min_samples=1)
            elif op == "ntile":
                # SQL NTILE(k): first n%k buckets hold n//k+1 rows, the
                # rest n//k. Integer-only, so bit-exact vs the oracle.
                r = pl.int_range(1, pl.len() + 1, dtype=pl.Int64)
                n = pl.len().cast(pl.Int64)
                k = pl.lit(ntile, dtype=pl.Int64)
                big = n % k
                size_big = n // k + 1
                # small size clamps to >=1 so the unselected branch
                # never divides by zero when n < k
                size_small = pl.max_horizontal(n // k, pl.lit(1, dtype=pl.Int64))
                e = (
                    pl.when(r <= big * size_big)
                    .then((r - 1) // size_big + 1)
                    .otherwise(big + (r - big * size_big - 1) // size_small + 1)
                )
            else:  # lead
                e = pl.col(src).shift(-1)
            exprs.append(e.over(by).alias(name))
        return df.with_columns(exprs).to_arrow()

    parted = ds.map_batches(add_part, batch_format="pyarrow", batch_size=None)
    return parted.groupby("part").map_groups(run_windows, batch_format="pyarrow")


def scd2_compact(
    ds: Any,
    by: str,
    order: list[str],
    attrs: list[str],
    num_partitions: int | None = None,
    from_col: str = "effective_from",
    to_col: str = "effective_to",
) -> Any:
    """Slowly-changing-dimension (type 2) history build: collapse a
    change log into versioned rows with effective ranges.

    Per ``by`` key in ``order``: drop rows where every ``attrs`` column
    equals the previous row's (null-safe, SQL ``IS DISTINCT FROM``
    semantics — polars ``ne_missing``), then stamp ``from_col`` =
    first order column and ``to_col`` = the NEXT surviving row's
    (null on the current version). Same scale shape as
    :func:`window_over`: ONE hash exchange on the key, one vectorized
    polars pass per partition — change-detect, filter and lead all
    inside the same frame, so the collapse needs no second exchange.
    ``order`` must be a per-key total order (include a unique
    tie-break column) or cross-engine results are ambiguous.
    """
    import polars as pl

    if not attrs:
        raise ValueError("attrs must be non-empty")
    if not order:
        raise ValueError(
            "order must be non-empty: scd2_compact needs a per-key total "
            "order to stamp validity ranges (include a unique tie-break "
            "column)"
        )
    if num_partitions is None:
        from patito_ray.stages.join import default_num_partitions

        num_partitions = default_num_partitions()

    def add_part(t: pa.Table) -> pa.Table:
        from patito_ray.stages.exchange import hash_partition_ids

        part = hash_partition_ids(
            t.column(by), num_partitions, f"scd2_compact key column {by!r}"
        )
        return t.append_column("part", pa.array(part, type=pa.int64()))

    sort_cols = [by] + list(order)
    lead_src = order[0]

    def compact(group_table: pa.Table) -> pa.Table:
        df = pl.from_arrow(group_table.drop_columns(["part"]))
        df = df.sort(sort_cols, maintain_order=True)
        rn = pl.col(by).cum_count().over(by)
        changed = pl.any_horizontal(
            *[
                pl.col(a).ne_missing(pl.col(a).shift(1).over(by))
                for a in attrs
            ]
        )
        df = df.filter((rn == 1) | changed)
        return (
            df.with_columns(
                pl.col(lead_src).alias(from_col),
                pl.col(lead_src).shift(-1).over(by).alias(to_col),
            )
            .to_arrow()
        )

    parted = ds.map_batches(add_part, batch_format="pyarrow", batch_size=None)
    return parted.groupby("part").map_groups(compact, batch_format="pyarrow")


def interval_coverage(
    ds: Any,
    by: str,
    start_col: str,
    end_col: str,
    num_partitions: int | None = None,
    out_col: str = "covered",
) -> Any:
    """Union length of ``[start, end]`` intervals per ``by`` key ->
    Dataset[by, out_col] (overlaps counted once; zero/negative-length
    intervals contribute 0).

    Same scale shape as :func:`window_over`: ONE hash exchange on the
    key, then a single vectorized polars sweep per partition — sort by
    (key, start, end), per-key running max of the previous end, each
    row contributes ``max(0, end - max(start, prev_cummax))``, group
    sum. Integer inputs stay exact (no float sweep); a key's rows all
    land in one partition, so no second merge is needed.
    """
    import polars as pl

    if num_partitions is None:
        from patito_ray.stages.join import default_num_partitions

        num_partitions = default_num_partitions()

    def add_part(t: pa.Table) -> pa.Table:
        from patito_ray.stages.exchange import hash_partition_ids

        part = hash_partition_ids(
            t.column(by), num_partitions, f"interval_coverage key column {by!r}"
        )
        return t.append_column("part", pa.array(part, type=pa.int64()))

    def sweep(group_table: pa.Table) -> pa.Table:
        if group_table.num_rows == 0 or by not in group_table.column_names:
            return pa.table({by: [], out_col: []})
        df = pl.from_arrow(
            group_table.select([by, start_col, end_col])
        ).sort([by, start_col, end_col], maintain_order=True)
        pcm = pl.col(end_col).cum_max().shift(1).over(by)
        contrib = (
            pl.col(end_col)
            - pl.max_horizontal(pl.col(start_col), pcm.fill_null(pl.col(start_col)))
        ).clip(lower_bound=0)
        return (
            df.with_columns(contrib.alias("_c"))
            .group_by(by, maintain_order=True)
            .agg(pl.col("_c").sum().alias(out_col))
            .to_arrow()
        )

    parted = ds.map_batches(add_part, batch_format="pyarrow", batch_size=None)
    return parted.groupby("part").map_groups(sweep, batch_format="pyarrow")


def rolling_median_over(
    ds: Any,
    by: str,
    order: list[str],
    src: str,
    frame: int = _DEFAULT_FRAME,
    out_col: str = "roll_med",
    num_partitions: int | None = None,
) -> Any:
    """SQL ``MEDIAN(src) OVER (PARTITION BY by ORDER BY order ROWS
    BETWEEN frame-1 PRECEDING AND CURRENT ROW)`` — a HOLISTIC rolling
    window (median is not a running sum; each row needs its window's
    order statistics).

    Same scale shape as :func:`window_over` (one hash exchange, one
    vectorized pass per partition). The kernel buckets rows by their
    effective window length L (short heads of each key run have
    L < frame), gathers each bucket's windows into an (n_L, L) matrix
    with integer index arithmetic and takes one ``np.median`` per
    bucket — ``frame`` numpy passes total, no per-row Python.
    np.median's mean-of-two-middles equals SQL QUANTILE_CONT(0.5)
    bit-for-bit (halving is exponent arithmetic; verified 2000/2000
    vs DuckDB). ``order`` must be a per-key total order."""
    import polars as pl

    if frame < 1:
        raise ValueError(f"frame must be >= 1, got {frame}")
    if num_partitions is None:
        from patito_ray.stages.join import default_num_partitions

        num_partitions = default_num_partitions()

    def add_part(t: pa.Table) -> pa.Table:
        from patito_ray.stages.exchange import hash_partition_ids

        part = hash_partition_ids(
            t.column(by),
            num_partitions,
            f"rolling_median_over key column {by!r}",
        )
        return t.append_column("part", pa.array(part, type=pa.int64()))

    sort_cols = [by] + list(order)

    def kernel(group_table: pa.Table) -> pa.Table:
        if group_table.num_rows == 0 or by not in group_table.column_names:
            return pa.table({})
        df = (
            pl.from_arrow(group_table.drop_columns(["part"]))
            .sort(sort_cols, maintain_order=True)
        )
        vals = df.get_column(src).to_numpy()
        keys = df.get_column(by).to_numpy()
        n = len(vals)
        # position within each key run (input sorted by key)
        new_run = np.empty(n, dtype=bool)
        new_run[0] = True
        new_run[1:] = keys[1:] != keys[:-1]
        run_start = np.maximum.accumulate(np.where(new_run, np.arange(n), 0))
        pos = np.arange(n) - run_start
        w_len = np.minimum(pos + 1, frame)
        med = np.empty(n, dtype=np.float64)
        for L in range(1, frame + 1):
            rows = np.flatnonzero(w_len == L)
            if rows.size == 0:
                continue
            idx = rows[:, None] - (L - 1) + np.arange(L)
            med[rows] = np.median(vals[idx], axis=1)
        return df.with_columns(pl.Series(out_col, med)).to_arrow()

    parted = ds.map_batches(add_part, batch_format="pyarrow", batch_size=None)
    return parted.groupby("part").map_groups(kernel, batch_format="pyarrow")


def rolling_active_count(
    ds: Any,
    key_col: str,
    day_col: str,
    window: int = 7,
    num_partitions: int | None = None,
    limit_bytes: int | None = None,
) -> pa.Table:
    """Sliding COUNT(DISTINCT key) over the last ``window`` days (the
    WAU/MAU family) -> local pa.Table[day:int64, active:int64], one row
    per day in the observed [min, max] span.

    Sliding distinct counts don't decompose as sums — but per KEY they
    do: a key is counted on day d iff d falls in the union of
    [activity_day, activity_day + window) intervals. So: one hash
    exchange on the key, each partition merges every key's day-set
    into disjoint intervals VECTORIZED (sort + run scan) and emits
    ±1 boundary deltas; the (day, delta) partials merge adaptively and
    one prefix sum over the (calendar-bounded, ~10k rows/30 years)
    day domain finishes on the driver. Exchange volume is O(distinct
    (key, day)) — never the event count.
    """
    import polars as pl

    from patito_ray.stages.agg import merge_partial_sums

    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    if num_partitions is None:
        from patito_ray.stages.join import default_num_partitions

        num_partitions = default_num_partitions()

    def add_part(t: pa.Table) -> pa.Table:
        from patito_ray.stages.exchange import hash_partition_ids

        # pre-dedup (key, day) inside the batch: bounds exchange volume
        dd = (
            pl.from_arrow(t.select([key_col, day_col]))
            .unique()
            .to_arrow()
        )
        part = hash_partition_ids(
            dd.column(key_col),
            num_partitions,
            f"rolling_active_count key column {key_col!r}",
        )
        return dd.append_column("part", pa.array(part, type=pa.int64()))

    _delta_schema = pa.schema([("day", pa.int64()), ("delta", pa.int64())])

    def deltas(group_table: pa.Table) -> pa.Table:
        if group_table.num_rows == 0 or key_col not in group_table.column_names:
            return _delta_schema.empty_table()
        k = pc.cast(group_table.column(key_col), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        d = pc.cast(group_table.column(day_col), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        order = np.lexsort((d, k))
        k, d = k[order], d[order]
        keep = np.empty(len(k), dtype=bool)
        keep[0] = True
        keep[1:] = (k[1:] != k[:-1]) | (d[1:] != d[:-1])
        k, d = k[keep], d[keep]
        # merge each key's [d, d+window) intervals: a new interval
        # starts at a key change or a gap >= window
        new_iv = np.empty(len(k), dtype=bool)
        new_iv[0] = True
        new_iv[1:] = (k[1:] != k[:-1]) | (d[1:] - d[:-1] >= window)
        starts = d[new_iv]
        # interval end = last day of its run + window
        iv_id = np.cumsum(new_iv) - 1
        # init far below any int64 day (days may be negative, pre-epoch)
        last = np.full(iv_id[-1] + 1, np.iinfo(np.int64).min, dtype=np.int64)
        np.maximum.at(last, iv_id, d)
        ends = last + window
        return pa.table(
            {
                "day": pa.array(np.concatenate([starts, ends]), type=pa.int64()),
                "delta": pa.array(
                    np.concatenate(
                        [
                            np.ones(len(starts), dtype=np.int64),
                            -np.ones(len(ends), dtype=np.int64),
                        ]
                    ),
                    type=pa.int64(),
                ),
            },
            schema=_delta_schema,
        )

    parted = ds.map_batches(add_part, batch_format="pyarrow", batch_size=None)
    partials = parted.groupby("part").map_groups(deltas, batch_format="pyarrow")
    kwargs = {} if limit_bytes is None else {"limit_bytes": limit_bytes}
    merged = merge_partial_sums(partials, ["day"], ["delta"], **kwargs)
    if not isinstance(merged, pa.Table):
        from patito_ray.stages.agg import collect_table

        # day domain is calendar-bounded — tiny at any corpus size
        merged = collect_table(merged, empty_schema=_delta_schema)
    if merged.num_rows == 0:
        return pa.schema([("day", pa.int64()), ("active", pa.int64())]).empty_table()
    day = merged.column("day").to_numpy(zero_copy_only=False)
    delta = merged.column("delta").to_numpy(zero_copy_only=False)
    order = np.argsort(day, kind="stable")
    day, delta = day[order], delta[order]
    # dense prefix sum over the day span; active(d) counts keys whose
    # interval covers d; the span's trailing window tail is dropped
    # (those days have no observed activity at or after them)
    lo, hi = int(day[0]), int(day[-1])  # hi = last end = last activity + window
    # scatter deltas then cumsum
    acc = np.zeros(hi - lo + 1, dtype=np.int64)
    np.add.at(acc, day - lo, delta)
    run = np.cumsum(acc)
    max_day = hi - window  # last observed activity day
    days_out = np.arange(lo, max_day + 1, dtype=np.int64)
    return pa.table(
        {
            "day": pa.array(days_out, type=pa.int64()),
            "active": pa.array(run[: len(days_out)], type=pa.int64()),
        }
    )
