"""Ordered funnel analysis (behavioral step matching per user).

``funnel_steps`` finds, per user, the FIRST time each step of an
ordered sequence completes: ``ts_1`` = earliest step-1 event, ``ts_2``
= earliest step-2 event STRICTLY AFTER ``ts_1``, and so on — the
standard product-analytics "view → click → purchase" conversion
funnel. Unlike a per-step GROUP BY MIN, later steps are conditioned on
the previous step's completion time, so the match is genuinely ordered
(a purchase before the first view does not count).

Scale shape: ONE hash exchange on the user key (the same
``hash_partition_ids`` spine as window_over / sessionize) — every
user's events co-locate once, then each partition resolves all its
users with a chain of vectorized polars filter/join/group_by kernels
(len(steps) passes over the partition, no per-user Python). Skewed
users cost their own event count. Output is one row per user who
completed step 1: ``user, ts_1..ts_n, depth`` (depth = number of steps
completed; ``ts_i`` null past the drop-off point).
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa


def funnel_steps(
    ds: Any,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    num_partitions: int | None = None,
) -> Any:
    """One row per user with at least one ``steps[0]`` event: the
    first-completion time of each funnel step (strictly increasing
    chain) and the depth reached."""
    import polars as pl

    if len(steps) < 2:
        raise ValueError("a funnel needs at least two steps")
    if len(set(steps)) != len(steps):
        raise ValueError(f"funnel steps must be distinct, got {steps}")
    if num_partitions is None:
        from patito_ray.stages.join import default_num_partitions

        num_partitions = default_num_partitions()

    def add_part(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from patito_ray.stages.exchange import hash_partition_ids

        t = pa.table(
            {user_col: t.column(user_col), ts_col: t.column(ts_col),
             type_col: t.column(type_col)}
        )
        # only funnel-step events ride the exchange
        t = t.filter(pc.is_in(t.column(type_col), value_set=pa.array(steps)))
        part = hash_partition_ids(
            t.column(user_col), num_partitions, f"funnel user column {user_col!r}"
        )
        return t.append_column("part", pa.array(part, type=pa.int64()))

    def per_partition(group_table: pa.Table) -> pa.Table:
        df = pl.from_arrow(group_table.drop_columns(["part"]))
        out = (
            df.filter(pl.col(type_col) == steps[0])
            .group_by(user_col)
            .agg(pl.col(ts_col).min().alias("ts_1"))
        )
        for i, step in enumerate(steps[1:], start=2):
            prev = f"ts_{i - 1}"
            nxt = (
                df.filter(pl.col(type_col) == step)
                .join(out.select([user_col, prev]), on=user_col)
                # strict > drops null prev rows too (incomplete chain)
                .filter(pl.col(ts_col) > pl.col(prev))
                .group_by(user_col)
                .agg(pl.col(ts_col).min().alias(f"ts_{i}"))
            )
            out = out.join(nxt, on=user_col, how="left")
        depth = pl.sum_horizontal(
            [pl.lit(1, dtype=pl.Int64)]
            + [pl.col(f"ts_{i}").is_not_null().cast(pl.Int64) for i in range(2, len(steps) + 1)]
        )
        return out.with_columns(depth.alias("depth")).to_arrow()

    parted = ds.map_batches(add_part, batch_format="pyarrow", batch_size=None)
    return parted.groupby("part").map_groups(per_partition, batch_format="pyarrow")
