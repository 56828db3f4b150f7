"""Adaptive finalize for partial (per-batch) aggregates.

The partial-aggregation pattern (combine inside ``map_batches``, then
merge the per-batch partials) leaves a merge input of
O(#distinct keys x #blocks) rows — usually megabytes even when the
scanned input is huge. Ray's native sort-based ``groupby().aggregate``
pays seconds of per-block shuffle overhead on that tiny remainder
(measured: 4.8 s for a 478k-row partial merge whose driver-side polars
groupby takes 0.15 s). So, exactly like the uniqueness-blob finalize in
``validation/engine.py``: while the partial volume is bounded
(``limit_bytes``), pull the narrow partial rows to the driver ONCE and
merge with one multithreaded polars groupby; past the bound, take the
house hash-partition exchange (``_exchange_merge``) — NOT Ray's native
sort-based aggregate, which measured ~400 s on a 16M-row pair merge
this exchange finishes in seconds. The bound keeps the driver path
safe — a high-cardinality key on a big cluster overflows the limit and
takes the shuffle, which is then worth its overhead.
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa

_DRIVER_MERGE_BYTES = 256 * 1024 * 1024


def _exchange_merge(m: Any, keys: list[str], cols: list[str], agg_builder: Any) -> Any:
    """House-pattern distributed merge for partials past ``limit_bytes``:
    hash-partition the partial rows on the key tuple (polars
    ``hash_rows(seed=42)`` — any dtype, nulls co-locate as their own
    group), then ONE vectorized polars merge per partition via
    ``groupby(part).map_groups``. Replaces Ray's native sort-based
    ``groupby().aggregate`` on this branch: the native path measured
    ~400 s merging a 16M-row basket-pair partial set where this exact
    exchange shape moves 10M rows in seconds (dev notes), and unlike
    the native sort it cannot trip over null keys. Each key tuple lands
    wholly in one partition, so per-partition merges are globally
    final. ``agg_builder(pl)`` returns the polars agg expressions.
    """
    import numpy as np
    import polars as pl

    from patito_ray.stages.join import default_num_partitions

    P = default_num_partitions()
    schema = m.schema()
    out_schema = pa.schema(
        [(n, schema.types[schema.names.index(n)]) for n in [*keys, *cols]]
    )
    ordered = [*keys, *cols]

    def add_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or any(c not in t.column_names for c in ordered):
            return out_schema.empty_table().append_column(
                "part", pa.array([], type=pa.int64())
            )
        # local pre-combine first: shrinks the exchange to this block's
        # distinct keys before anything moves
        df = pl.from_arrow(t.select(ordered)).group_by(keys).agg(agg_builder(pl))
        h = df.select(keys).hash_rows(seed=42).to_numpy()
        part = (h % np.uint64(P)).view(np.int64)
        return (
            df.to_arrow()
            .select(ordered)
            .cast(out_schema)
            .append_column("part", pa.array(part, type=pa.int64()))
        )

    def finish(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or any(c not in g.column_names for c in ordered):
            return out_schema.empty_table()
        df = pl.from_arrow(g.select(ordered)).group_by(keys).agg(agg_builder(pl))
        return df.to_arrow().select(ordered).cast(out_schema)

    return (
        m.map_batches(add_part, batch_format="pyarrow", batch_size=None)
        .groupby("part")
        .map_groups(finish, batch_format="pyarrow")
    )


def merge_partial_sums(
    partials: Any,
    keys: list[str],
    sums: list[str],
    limit_bytes: int = _DRIVER_MERGE_BYTES,
) -> pa.Table | Any:
    """Merge per-batch partial aggregates by summing ``sums`` per
    ``keys`` group (counts merge as sums too).

    Returns a local ``pa.Table`` when the partial volume fits
    ``limit_bytes`` (driver polars merge), else a lazy Ray ``Dataset``
    (distributed groupby). Callers must handle both — a local table
    sorts/limits locally, a Dataset through Ray.
    """
    import polars as pl
    import ray

    m = partials.materialize()
    if m.size_bytes() <= limit_bytes:
        tabs = [t for t in ray.get(m.to_arrow_refs()) if t.num_rows]
        if not tabs:
            # no partial rows at all: hand back the (empty) Dataset so
            # callers' finishing map_batches produce an empty result,
            # exactly like the distributed path on empty input
            return m
        t = pa.concat_tables(tabs)
        return (
            pl.from_arrow(t)
            .group_by(keys)
            .agg([pl.col(c).sum().alias(c) for c in sums])
            .to_arrow()
        )
    return _exchange_merge(
        m, keys, sums, lambda pl: [pl.col(c).sum().alias(c) for c in sums]
    )


def merge_partial_mins(
    partials: Any,
    keys: list[str],
    mins: list[str],
    limit_bytes: int = _DRIVER_MERGE_BYTES,
) -> "pa.Table | Any":
    """Min analogue of :func:`merge_partial_sums` (same adaptive
    driver-polars-vs-distributed split, same dual return contract) —
    for first-occurrence selection (dedup families) where Ray's
    sort-based groupby costs seconds even on narrow 16 B rows."""
    import polars as pl
    import ray

    m = partials.materialize()
    if m.size_bytes() <= limit_bytes:
        tabs = [t for t in ray.get(m.to_arrow_refs()) if t.num_rows]
        if not tabs:
            return m
        t = pa.concat_tables(tabs)
        return (
            pl.from_arrow(t)
            .group_by(keys)
            .agg([pl.col(c).min().alias(c) for c in mins])
            .to_arrow()
        )
    return _exchange_merge(
        m, keys, mins, lambda pl: [pl.col(c).min().alias(c) for c in mins]
    )


def collect_table(ds: Any, empty_schema: "pa.Schema | None" = None) -> pa.Table:
    """Pull a (small, post-merge) Dataset to ONE driver pa.Table.

    The counterpart of ``merge_partial_sums``' distributed branch:
    callers that must finish on the driver (broadcast sets, model
    vocabularies, mixture counts) use this instead of hand-rolling the
    to_arrow_refs/empty-fallback snippet per site. ``empty_schema``
    types the zero-row result; required because an empty Dataset has no
    blocks to infer from."""
    import ray

    tabs = [t for t in ray.get(ds.materialize().to_arrow_refs()) if t.num_rows]
    if tabs:
        return pa.concat_tables(tabs).combine_chunks()
    if empty_schema is None:
        raise ValueError(
            "collect_table got an empty Dataset and no empty_schema to "
            "type the zero-row result"
        )
    return empty_schema.empty_table()


def distinct_per_group(
    ds: Any,
    by: str,
    value: str,
    num_partitions: int | None = None,
    limit_bytes: int = _DRIVER_MERGE_BYTES,
) -> pa.Table | Any:
    """Exact ``COUNT(DISTINCT value) GROUP BY by`` in two narrow phases.

    Phase 1 (map_batches): each batch collapses to its DISTINCT
    ``(by, value)`` pairs — on a dup-heavy column this already removes
    most volume before anything moves. Phase 2: pairs hash-exchange on
    ``value`` (identical values co-locate, so the per-partition DISTINCT
    is globally exact and per-key partial counts from different
    partitions are disjoint), each partition re-dedups and emits tiny
    ``(by, partial_count)`` rows. The partials then ride
    :func:`merge_partial_sums`' adaptive driver/distributed merge.

    Only distinct pairs ever ride the exchange (the worst case is the
    true pair cardinality, the best is ~0 for heavy-dup columns) —
    contrast :func:`patito_ray.functions.approx.approx_distinct_per_group`,
    which bounds the exchange at 4 KiB/group/block but is approximate.
    Null ``value`` rows are ignored (SQL COUNT(DISTINCT) semantics);
    null ``by`` keys form their own group, like SQL GROUP BY (the
    exchange partitions on the VALUE, so null keys never hit the
    null-rejecting key hasher).
    """
    import polars as pl

    if num_partitions is None:
        from patito_ray.stages.join import default_num_partitions

        num_partitions = default_num_partitions()

    def batch_pairs(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from patito_ray.stages.exchange import hash_partition_ids

        kv = pa.table({by: t.column(by), value: t.column(value)})
        kv = kv.filter(pc.is_valid(kv.column(value)))
        kv = pl.from_arrow(kv).unique().to_arrow()
        if kv.num_rows == 0:
            return kv.append_column("part", pa.array([], type=pa.int64()))
        part = hash_partition_ids(
            kv.column(value), num_partitions, f"distinct_per_group value column {value!r}"
        )
        return kv.append_column("part", pa.array(part, type=pa.int64()))

    def partition_counts(group_table: pa.Table) -> pa.Table:
        df = pl.from_arrow(group_table.drop_columns(["part"]))
        out = df.unique().group_by(by).agg(pl.len().cast(pl.Int64).alias("n_distinct"))
        return out.to_arrow()

    import ray

    pairs = ds.map_batches(
        batch_pairs, batch_format="pyarrow", batch_size=None
    ).materialize()
    if pairs.size_bytes() <= limit_bytes:
        # the whole distinct-pair set fits the driver budget: one
        # unique + group_by call beats the exchange's fixed latency
        tabs = [t for t in ray.get(pairs.to_arrow_refs()) if t.num_rows]
        if not tabs:
            p_schema = pairs.schema()
            by_type = (
                p_schema.types[p_schema.names.index(by)]
                if p_schema is not None and by in p_schema.names
                else pa.int64()
            )
            return pa.schema(
                [pa.field(by, by_type), pa.field("n_distinct", pa.int64())]
            ).empty_table()
        df = pl.from_arrow(pa.concat_tables(tabs).drop_columns(["part"]))
        return (
            df.unique()
            .group_by(by)
            .agg(pl.len().cast(pl.Int64).alias("n_distinct"))
            .to_arrow()
        )
    partials = pairs.groupby("part").map_groups(
        partition_counts, batch_format="pyarrow"
    )
    return merge_partial_sums(partials, [by], ["n_distinct"], limit_bytes=limit_bytes)


def mode_per_group(
    ds: Any,
    by: str,
    value: str,
    limit_bytes: int = _DRIVER_MERGE_BYTES,
) -> pa.Table | Any:
    """Exact per-group mode (most frequent ``value``; ties broken by
    the smallest value — a deterministic contract both engines can
    state). Output: one row per group — ``by``, ``mode_value``,
    ``mode_count``.

    Same narrow shape as :func:`distinct_per_group`: per-batch
    vectorized (by, value, partial_count) rows, the adaptive partial-sum
    merge on (by, value), then one tiny top-1 per group (driver polars
    on the fast path, :func:`patito_ray.stages.topk.grouped_top_k`
    when the pair table outgrows the driver bound). Null values are
    ignored (SQL aggregate semantics); null ``by`` keys group like SQL
    GROUP BY.
    """
    import polars as pl
    import pyarrow.compute as pc

    def batch_counts(t: pa.Table) -> pa.Table:
        kv = pa.table({by: t.column(by), value: t.column(value)})
        kv = kv.filter(pc.is_valid(kv.column(value)))
        return (
            pl.from_arrow(kv)
            .group_by([by, value])
            .agg(pl.len().cast(pl.Int64).alias("c"))
            .to_arrow()
        )

    partials = ds.map_batches(batch_counts, batch_format="pyarrow", batch_size=None)
    merged = merge_partial_sums(partials, [by, value], ["c"], limit_bytes=limit_bytes)

    if isinstance(merged, pa.Table):
        return (
            pl.from_arrow(merged)
            .sort(["c", value], descending=[True, False])
            .group_by(by, maintain_order=True)
            .first()
            .rename({value: "mode_value", "c": "mode_count"})
            .to_arrow()
        )
    from patito_ray.stages.topk import grouped_top_k

    top = grouped_top_k(merged, by, "c", k=1, tie=value, descending=True)

    def finish(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["rank"])
        names = [
            "mode_value" if n == value else ("mode_count" if n == "c" else n)
            for n in t.column_names
        ]
        return t.rename_columns(names)

    return top.map_batches(finish, batch_format="pyarrow", batch_size=None)


def top_values_per_group(
    ds: Any,
    by: str,
    value: str,
    k: int,
    limit_bytes: int = _DRIVER_MERGE_BYTES,
) -> pa.Table | Any:
    """Top-``k`` most frequent ``value``s per group (count desc, value
    asc tie-break — the deterministic total order SQL ROW_NUMBER can
    restate). Output: ``by``, ``value``, ``cnt``, ``rank`` (1-based).

    Generalizes :func:`mode_per_group` (k=1): per-batch vectorized
    (by, value, partial_count) rows, the adaptive partial-sum merge,
    then top-k per group — driver polars below ``limit_bytes``,
    :func:`patito_ray.stages.topk.grouped_top_k` beyond. Only DISTINCT
    pairs ride the exchange; a hot (group, value) costs one row per
    block, never its count."""
    import polars as pl
    import pyarrow.compute as pc

    if k < 1:
        raise ValueError(f"top_values_per_group needs k >= 1, got {k}")

    def batch_counts(t: pa.Table) -> pa.Table:
        kv = pa.table({by: t.column(by), value: t.column(value)})
        kv = kv.filter(pc.is_valid(kv.column(value)))
        return (
            pl.from_arrow(kv)
            .group_by([by, value])
            .agg(pl.len().cast(pl.Int64).alias("cnt"))
            .to_arrow()
        )

    partials = ds.map_batches(batch_counts, batch_format="pyarrow", batch_size=None)
    merged = merge_partial_sums(partials, [by, value], ["cnt"], limit_bytes=limit_bytes)

    if isinstance(merged, pa.Table):
        return (
            pl.from_arrow(merged)
            .sort(["cnt", value], descending=[True, False])
            .group_by(by, maintain_order=True)
            .head(k)
            .with_columns(
                rank=pl.col("cnt").cum_count().over(by).cast(pl.Int64)
            )
            .select([by, value, "cnt", "rank"])
            .to_arrow()
        )
    from patito_ray.stages.topk import grouped_top_k

    top = grouped_top_k(merged, by, "cnt", k=k, tie=value, descending=True)

    def order_cols(t: pa.Table) -> pa.Table:
        return t.select([by, value, "cnt", "rank"])

    return top.map_batches(order_cols, batch_format="pyarrow", batch_size=None)


def grouping_sets_sums(
    ds: Any,
    keys: list[str],
    sums: list[str],
    sets: list[tuple[int, ...]] | None = None,
    count_col: str = "n",
    limit_bytes: int = _DRIVER_MERGE_BYTES,
) -> pa.Table | Any:
    """Multi-level GROUP BY (GROUPING SETS / ROLLUP / CUBE) in ONE
    input pass.

    ``sets`` lists the grouping sets as tuples of indices into ``keys``
    (default: ROLLUP prefixes ``(0..n-1), (0..n-2), ..., ()``). Each
    batch emits its partial sums + row count once per set, with
    rolled-up key columns nulled and a ``grouping_id`` bitmask column
    (bit i set when ``keys[i]`` is rolled up; bit 0 = LAST key, SQL
    ``GROUPING(k1, ..., kn)`` order). The partials — O(#groups x
    #sets x #blocks) narrow rows, independent of input size — then ride
    :func:`merge_partial_sums`' adaptive driver/distributed merge on
    ``keys + [grouping_id]``.

    Because a NULL key marks a rolled-up level, the input key columns
    must be null-free (checked per batch; SQL ROLLUP has the same
    ambiguity, which GROUPING() exists to resolve — callers with
    nullable keys should fill or encode nulls first). Internally the
    rolled-up slots carry a type-appropriate SENTINEL (not null) through
    the merge — Ray's sort-based groupby cannot order null keys — which
    is unambiguous because ``grouping_id`` is part of the merge key;
    nulls are restored after the merge.

    Returns a ``pa.Table`` (driver merge) or a Ray Dataset (distributed
    merge) — same dual contract as :func:`merge_partial_sums`.
    """
    import polars as pl
    import pyarrow.compute as pc

    n_keys = len(keys)
    if sets is None:
        sets = [tuple(range(n_keys - lvl)) for lvl in range(n_keys + 1)]
    set_masks = [
        sum(1 << (n_keys - 1 - i) for i in range(n_keys) if i not in s)
        for s in sets
    ]

    def batch_partials(t: pa.Table) -> pa.Table:
        for k in keys:
            if t.column(k).null_count:
                raise ValueError(
                    f"grouping_sets_sums: key column {k!r} contains nulls; "
                    "null marks a rolled-up level — fill or encode nulls first"
                )
        df = pl.from_arrow(t.select(keys + sums))
        outs = []
        for s, mask in zip(sets, set_masks):
            gk = [keys[i] for i in s]
            aggs = [pl.col(c).sum().alias(c) for c in sums] + [
                pl.len().cast(pl.Int64).alias(count_col)
            ]
            part = df.group_by(gk).agg(aggs) if gk else df.select(aggs)
            part = part.with_columns(
                [
                    pl.lit("").alias(keys[i])
                    if df.schema[keys[i]] == pl.Utf8
                    else pl.lit(0).cast(df.schema[keys[i]]).alias(keys[i])
                    for i in range(n_keys)
                    if i not in s
                ]
                + [pl.lit(mask, dtype=pl.Int64).alias("grouping_id")]
            ).select(keys + ["grouping_id"] + sums + [count_col])
            outs.append(part)
        return pl.concat(outs).to_arrow()

    partials = ds.map_batches(
        batch_partials, batch_format="pyarrow", batch_size=None
    )
    merged = merge_partial_sums(
        partials, keys + ["grouping_id"], sums + [count_col], limit_bytes
    )

    def restore_nulls(t: pa.Table) -> pa.Table:
        gid = t.column("grouping_id")
        for i, k in enumerate(keys):
            bit = 1 << (n_keys - 1 - i)
            rolled = pc.not_equal(
                pc.bit_wise_and(gid, pa.scalar(bit, type=pa.int64())), 0
            )
            col = pc.if_else(
                rolled, pa.scalar(None, type=t.schema.field(k).type), t.column(k)
            )
            t = t.set_column(t.schema.get_field_index(k), k, col)
        return t

    if isinstance(merged, pa.Table):
        return restore_nulls(merged)
    return merged.map_batches(restore_nulls, batch_format="pyarrow", batch_size=None)


def string_agg_per_group(
    ds: Any,
    by: str,
    value: str,
    sep: str = ",",
    num_partitions: int | None = None,
) -> Any:
    """Per-group ordered string concatenation (SQL
    ``string_agg(value, sep ORDER BY value)`` / polars
    ``sort().str.join``) — the collect-list family's holistic
    aggregate, so one key exchange is the minimum data movement.

    Narrow ``(by, value)`` pairs hash-partition on the GROUP key (all
    of a group's values co-locate, so each partition finishes its
    groups exactly); each partition runs one vectorized polars
    sort-and-join. Output: ``by``, ``agg`` (the joined string), ``n``
    (value count). Null values are ignored (SQL aggregate semantics);
    values are sorted ascending with binary (codepoint) order — the
    same default collation DuckDB applies.
    """
    import polars as pl
    import pyarrow.compute as pc

    if num_partitions is None:
        from patito_ray.stages.join import default_num_partitions

        num_partitions = default_num_partitions()

    def add_part(t: pa.Table) -> pa.Table:
        from patito_ray.stages.exchange import hash_partition_ids

        t = pa.table({by: t.column(by), value: t.column(value)})
        if t.column(value).null_count:
            t = t.filter(pc.is_valid(t.column(value)))
        part = hash_partition_ids(
            t.column(by), num_partitions, f"string_agg key column {by!r}"
        )
        return t.append_column("part", pa.array(part, type=pa.int64()))

    def per_partition(group_table: pa.Table) -> pa.Table:
        df = pl.from_arrow(group_table.drop_columns(["part"]))
        return (
            df.group_by(by)
            .agg(
                pl.col(value).sort().str.join(sep).alias("agg"),
                pl.len().cast(pl.Int64).alias("n"),
            )
            .to_arrow()
        )

    parted = ds.map_batches(add_part, batch_format="pyarrow", batch_size=None)
    return parted.groupby("part").map_groups(per_partition, batch_format="pyarrow")


def round_half_away(v: float, nd: int) -> float:
    """DuckDB-ROUND-compatible scalar rounding (half AWAY from zero,
    floor(|v|·10^nd + 0.5)/10^nd) — the one rounding semantics every
    float that meets a SQL oracle must use (pipelines.queries._rf is
    the same formula; this copy exists so functions/ modules don't
    import the query registry)."""
    import math

    f = 10.0**nd
    return math.copysign(math.floor(abs(v) * f + 0.5), v) / f
