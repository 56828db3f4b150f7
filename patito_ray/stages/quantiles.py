"""Exact grouped quantiles (SQL ``quantile-by-selection`` per group).

Selection semantics, not interpolation: the ``q``-quantile of a group
is the element at 1-based sorted rank ``max(1, ceil(q * n))`` over the
group's ``n`` non-null values. Picking an existing element keeps the
result bit-exact (no float interpolation arithmetic), so the DuckDB
oracle — ``ROW_NUMBER() OVER (PARTITION BY k ORDER BY v)`` matched
against ``CEIL(q * cnt)`` — reproduces it exactly even on double
columns.

Scale shape: ONE hash exchange on the group key (same
:func:`patito_ray.stages.exchange.hash_partition_ids` spine as
window_over / grouped_top_k), then one vectorized polars
``group_by().agg`` per partition — P Python calls total, never one per
group. A group's cost is its own row count; the output is one row per
group, so everything downstream is tiny. At 10^12 rows this is the
minimum movement for an exact holistic aggregate: quantiles cannot be
partially aggregated (unlike sums/sketches), so the group's values
must meet once — t-digest (``validation/stats.py``) remains the
single-pass approximate alternative when rank error is acceptable.

The reference (JakobGM/patito) delegates quantiles to polars on one
machine; this is the distributed equivalent.
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa


def grouped_quantiles(
    ds: Any,
    by: str,
    value: str,
    qs: dict[str, float],
    num_partitions: int | None = None,
) -> Any:
    """One row per ``by`` group: ``by``, ``n`` (non-null value count),
    and one column per ``qs`` entry (name -> q in (0, 1]) holding the
    group's value at sorted rank ``max(1, ceil(q * n))``.

    Null ``value`` rows are ignored (SQL aggregate semantics); groups
    with only null values are dropped. Null ``by`` keys are rejected
    (same contract as window_over / grouped_top_k).
    """
    import polars as pl

    for name, q in qs.items():
        if not (0.0 < q <= 1.0):
            raise ValueError(f"quantile {name!r}={q} not in (0, 1]")
    if num_partitions is None:
        from patito_ray.stages.join import default_num_partitions

        num_partitions = default_num_partitions()

    def add_part(t: pa.Table) -> pa.Table:
        from patito_ray.stages.exchange import hash_partition_ids

        import pyarrow.compute as pc

        t = pa.table({by: t.column(by), value: t.column(value)})
        if t.column(value).null_count:
            # null values never contribute (SQL aggregate semantics) —
            # drop them before they ride the exchange
            t = t.filter(pc.is_valid(t.column(value)))
        part = hash_partition_ids(
            t.column(by), num_partitions, f"grouped_quantiles key column {by!r}"
        )
        return t.append_column("part", pa.array(part, type=pa.int64()))

    def per_partition(group_table: pa.Table) -> pa.Table:
        df = pl.from_arrow(group_table.drop_columns(["part"]))
        # drop null values up front (SQL aggregate semantics); groups
        # with only nulls then never form, so the rank index below is
        # always in bounds
        df = df.filter(pl.col(value).is_not_null())
        n = pl.len()
        aggs = [n.cast(pl.Int64).alias("n")]
        for name, q in qs.items():
            # 1-based rank ceil(q*n) — identical IEEE double product /
            # ceil as the SQL oracle, then clipped to >= 1
            idx = (
                (n.cast(pl.Float64) * q).ceil().cast(pl.Int64).clip(lower_bound=1)
                - 1
            )
            aggs.append(pl.col(value).sort().get(idx).alias(name))
        return df.group_by(by).agg(aggs).to_arrow()

    parted = ds.map_batches(add_part, batch_format="pyarrow", batch_size=None)
    return parted.groupby("part").map_groups(per_partition, batch_format="pyarrow")
