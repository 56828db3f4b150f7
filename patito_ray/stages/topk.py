"""Grouped top-k: the per-key top-n rows by a value column.

Scale shape (the partial-aggregation pattern, SURVEY.md §4):

1. per-batch PRUNE: each batch keeps at most k rows per group it sees
   (vectorized polars sort+head per batch) — output is bounded by
   groups_in_batch x k regardless of row count;
2. hash-partition the pruned rows by group key and take the final
   per-group top-k with ONE vectorized call per partition — never one
   Python call per group (10^8 users means 10^8 groups).

Ties break on the ``tie`` column ascending so results are deterministic
and oracle-comparable (SQL ROW_NUMBER OVER (ORDER BY value DESC, tie)).
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def grouped_top_k(
    ds: Any,
    group: str,
    value: str,
    k: int,
    tie: str | None = None,
    descending: bool = True,
    num_partitions: int | None = None,
) -> Any:
    """Top-``k`` rows per ``group`` ordered by ``value`` (desc by
    default; ``tie`` column ascending breaks equal values). Returns the
    selected rows plus an int64 ``rank`` column (1-based).

    ``num_partitions`` defaults to ~4x cluster CPUs (same rule as
    ``stages.join.default_num_partitions``) so the final exchange
    tracks cluster size instead of a fixed 32."""
    import polars as pl

    if num_partitions is None:
        from patito_ray.stages.join import default_num_partitions

        num_partitions = default_num_partitions()

    sort_cols = [value] + ([tie] if tie else [])
    sort_desc = [descending] + ([False] if tie else [])

    def local_prune(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        out = (
            df.sort(sort_cols, descending=sort_desc)
            .group_by(group, maintain_order=True)
            .head(k)
        )
        return out.to_arrow()

    def add_part(t: pa.Table) -> pa.Table:
        from patito_ray.stages.exchange import hash_partition_ids

        part = hash_partition_ids(
            t.column(group), num_partitions, f"grouped_top_k group column {group!r}"
        )
        return t.append_column("part", pa.array(part, type=pa.int64()))

    def final_topk(group_table: pa.Table) -> pa.Table:
        df = pl.from_arrow(group_table.drop_columns(["part"]))
        out = (
            df.sort(sort_cols, descending=sort_desc)
            .group_by(group, maintain_order=True)
            .head(k)
            .with_columns(
                rank=pl.col(value).cum_count().over(group).cast(pl.Int64)
            )
        )
        return out.to_arrow()

    pruned = ds.map_batches(local_prune, batch_format="pyarrow", batch_size=None)
    parted = pruned.map_batches(add_part, batch_format="pyarrow", batch_size=None)
    return parted.groupby("part").map_groups(final_topk, batch_format="pyarrow")
