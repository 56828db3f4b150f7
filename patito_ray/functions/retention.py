"""Cohort retention analysis (product analytics over event streams).

``cohort_retention`` answers "of the users first seen on day D, how
many were active again N days later?" — the standard retention
triangle. Three narrow phases:

1. per-batch: collapse events to DISTINCT ``(user, day)`` pairs (a
   user's thousandth event that day adds nothing) — on real streams
   this removes most volume before anything moves;
2. ONE hash exchange on the user key: each user's pairs co-locate,
   so the partition can resolve the user's cohort (min day) and day
   offsets exactly; per-partition counts per (cohort, offset) are
   disjoint across partitions;
3. the tiny (cohort, offset, count) partials ride
   :func:`patito_ray.stages.agg.merge_partial_sums`' adaptive
   driver/distributed merge.

Null user keys are rejected (same contract as every keyed exchange
here); null timestamps are dropped (no activity evidence).
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa


def cohort_retention(
    ds: Any,
    user_col: str,
    ts_col: str,
    num_partitions: int | None = None,
    limit_bytes: int | None = None,
) -> Any:
    """(cohort_date, day_offset, n_users) rows: users first active on
    ``cohort_date`` who were also active ``day_offset`` days later
    (offset 0 = the cohort itself)."""
    import polars as pl
    import pyarrow.compute as pc

    from patito_ray.stages.agg import merge_partial_sums

    if num_partitions is None:
        from patito_ray.stages.join import default_num_partitions

        num_partitions = default_num_partitions()

    def batch_pairs(t: pa.Table) -> pa.Table:
        from patito_ray.stages.exchange import hash_partition_ids

        ts = t.column(ts_col)
        kv = pa.table(
            {user_col: t.column(user_col), "d": pc.cast(ts, pa.date32())}
        )
        if kv.column("d").null_count:
            kv = kv.filter(pc.is_valid(kv.column("d")))
        kv = pl.from_arrow(kv).unique().to_arrow()
        if kv.num_rows == 0:
            return kv.append_column("part", pa.array([], type=pa.int64()))
        part = hash_partition_ids(
            kv.column(user_col), num_partitions, f"retention user column {user_col!r}"
        )
        return kv.append_column("part", pa.array(part, type=pa.int64()))

    def partition_counts(group_table: pa.Table) -> pa.Table:
        df = pl.from_arrow(group_table.drop_columns(["part"])).unique()
        firsts = df.group_by(user_col).agg(pl.col("d").min().alias("cohort_date"))
        out = (
            df.join(firsts, on=user_col)
            .with_columns(
                (pl.col("d") - pl.col("cohort_date"))
                .dt.total_days()
                .cast(pl.Int64)
                .alias("day_offset")
            )
            .group_by(["cohort_date", "day_offset"])
            .agg(pl.len().cast(pl.Int64).alias("n_users"))
        )
        return out.to_arrow()

    pairs = ds.map_batches(batch_pairs, batch_format="pyarrow", batch_size=None)
    partials = pairs.groupby("part").map_groups(
        partition_counts, batch_format="pyarrow"
    )
    kwargs = {} if limit_bytes is None else {"limit_bytes": limit_bytes}
    return merge_partial_sums(
        partials, ["cohort_date", "day_offset"], ["n_users"], **kwargs
    )
