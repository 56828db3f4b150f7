"""Query registry chunk (split from pipelines/queries.py): 0 registrations.

Registers: 
"""

from __future__ import annotations

import datetime
from typing import Any, Callable, Literal
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import patito_ray as pr
from patito_ray.functions import dedup as f_dedup
from patito_ray.functions import similarity as f_sim
from patito_ray.functions import text as f_text
from patito_ray.pipelines.webpage import validate_webpages
from patito_ray.stages.agg import merge_partial_sums
from patito_ray.validation.engine import duplicate_count_distributed
from patito_ray.validation.stats import (
    column_stats,
    drift_check,
    profile_dataset_split,
)
from patito_ray.pipelines.qcommon import (  # noqa: F401
    QUERIES,
    _tmp_dir,
    _rp,
    _one_row,
    _apply,
    _r,
    _rf,
    _ra,
    _lazy_norm,
)


# ---------------------------------------------------------------------------
# aggregation / processing queries
# ---------------------------------------------------------------------------


def q_q1(sf_dir: str) -> pa.Table:
    """TPC-H-Q1-style grouped aggregate with per-batch partial
    aggregation (polars within batch) + tiny final shuffle."""
    import polars as pl

    ds = _rp(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        out = (
            df.with_columns(
                disc_price=pl.col("l_extendedprice") * (1 - pl.col("l_discount")),
            )
            .with_columns(charge=pl.col("disc_price") * (1 + pl.col("l_tax")))
            .group_by("l_returnflag", "l_linestatus")
            .agg(
                pl.col("l_quantity").sum().alias("s_qty"),
                pl.col("l_extendedprice").sum().alias("s_price"),
                pl.col("disc_price").sum().alias("s_disc_price"),
                pl.col("charge").sum().alias("s_charge"),
                pl.col("l_discount").sum().alias("s_disc"),
                pl.len().cast(pl.Int64).alias("n"),
            )
        )
        return out.to_arrow()

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    final = merge_partial_sums(
        partials,
        ["l_returnflag", "l_linestatus"],
        ["s_qty", "s_price", "s_disc_price", "s_charge", "s_disc", "n"],
    )

    def finish(batch: pa.Table) -> pa.Table:
        n = pc.cast(batch["n"], pa.float64())
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "sum_qty": _r(batch["s_qty"], 2),
                "sum_base_price": _r(batch["s_price"], 2),
                "sum_disc_price": _r(batch["s_disc_price"], 2),
                "sum_charge": _r(batch["s_charge"], 2),
                "avg_qty": _r(pc.divide(batch["s_qty"], n), 4),
                "avg_price": _r(pc.divide(batch["s_price"], n), 4),
                "avg_disc": _r(pc.divide(batch["s_disc"], n), 4),
                "count_order": pc.cast(batch["n"], pa.int64()),
            }
        )

    return _apply(final, finish)


SQL_Q1 = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       ROUND(SUM(l_quantity) / COUNT(*), 4) AS avg_qty,
       ROUND(SUM(l_extendedprice) / COUNT(*), 4) AS avg_price,
       ROUND(SUM(l_discount) / COUNT(*), 4) AS avg_disc,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


def q_segment_revenue(sf_dir: str) -> pa.Table:
    """orders ⋈ customer revenue per market segment — broadcast join
    (customer is the small side: ray.put the Arrow table once, each
    batch does a vectorized ``Table.join`` hash join against it)."""
    import ray

    cust = pa.concat_tables(
        _rp(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).iter_batches(
            batch_format="pyarrow"
        )
    )
    ref = ray.put(cust)

    def attach(batch: pa.Table) -> pa.Table:
        import polars as pl

        joined = batch.join(
            ray.get(ref), keys=["o_custkey"], right_keys=["c_custkey"]
        )
        out = (
            pl.from_arrow(joined)
            .group_by("c_mktsegment")
            .agg(
                pl.col("o_totalprice").sum().alias("s_rev"),
                pl.len().cast(pl.Int64).alias("n"),
            )
        )
        return out.to_arrow()

    orders = _rp(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    partials = orders.map_batches(attach, batch_format="pyarrow", batch_size=None)
    final = merge_partial_sums(partials, ["c_mktsegment"], ["s_rev", "n"])
    return _apply(
        final,
        lambda t: pa.table(
            {
                "c_mktsegment": t["c_mktsegment"],
                "revenue": _r(t["s_rev"], 2),
                "n_orders": pc.cast(t["n"], pa.int64()),
            }
        ),
    )


SQL_SEGMENT_REVENUE = """
SELECT c.c_mktsegment, ROUND(SUM(o.o_totalprice), 2) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
"""


def q_distinct_parts(sf_dir: str) -> pa.Table:
    """Exact distinct count via the bucketed key-blob exchange (same
    machinery as the uniqueness check; adaptive driver merge)."""
    from patito_ray.validation.engine import distinct_count_distributed

    ds = _rp(sf_dir, "lineitem", ["l_partkey"])
    return _one_row(distinct_parts=distinct_count_distributed(ds, "l_partkey"))


SQL_DISTINCT_PARTS = """
SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS distinct_parts FROM lineitem
"""


def q_events_daily(sf_dir: str) -> pa.Table:
    """Tumbling 1-day window aggregate per event type (streaming-shaped
    workload re-expressed as groupby over a derived window key)."""
    import polars as pl

    ds = _rp(sf_dir, "events", ["ts", "event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch).with_columns(day=pl.col("ts").dt.truncate("1d"))
        return (
            df.group_by("event_type", "day")
            .agg(pl.col("value").sum().alias("s_value"), pl.len().cast(pl.Int64).alias("n"))
            .to_arrow()
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    final = merge_partial_sums(partials, ["event_type", "day"], ["s_value", "n"])
    return _apply(
        final,
        lambda t: pa.table(
            {
                "event_type": t["event_type"],
                "day": t["day"],
                "total_value": _r(t["s_value"], 2),
                "n": pc.cast(t["n"], pa.int64()),
            }
        ),
    )


SQL_EVENTS_DAILY = """
SELECT event_type, date_trunc('day', ts) AS day,
       ROUND(SUM(value), 2) AS total_value, CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY event_type, date_trunc('day', ts)
"""


def q_events_sliding(sf_dir: str) -> pa.Table:
    """7-day sliding-window sum per event type. Scale shape: the wide
    input collapses through the same per-batch partial + tiny groupby
    as the tumbling window; the sliding frame then runs VECTORIZED over
    the small (type, day) aggregate — one searchsorted/cumsum pass per
    event type, never a window over raw events."""
    import polars as pl

    ds = _rp(sf_dir, "events", ["ts", "event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch).with_columns(day=pl.col("ts").dt.truncate("1d"))
        return (
            df.group_by("event_type", "day")
            .agg(pl.col("value").sum().alias("v"))
            .to_arrow()
        )

    daily = merge_partial_sums(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["event_type", "day"],
        ["v"],
    )

    def sliding(group: pa.Table) -> pa.Table:
        df = pl.from_arrow(group).sort("day")
        days = df["day"].dt.epoch("d").to_numpy()
        v = df["v"].to_numpy()
        csum = np.concatenate([[0.0], np.cumsum(v)])
        left = np.searchsorted(days, days - 6, side="left")
        sliding_v = csum[np.arange(1, len(v) + 1)] - csum[left]
        return pa.table(
            {
                "event_type": group.column("event_type"),
                "day": df["day"].to_arrow(),
                "sliding_value": pa.array(_r(pa.array(sliding_v), 2), type=pa.float64()),
            }
        )

    if isinstance(daily, pa.Table):
        # driver-merged daily aggregate: the frame runs locally per type
        groups = [
            sliding(g.to_arrow())
            for _k, g in pl.from_arrow(daily).group_by("event_type")
        ]
        if not groups:  # empty input: concat_tables([]) would raise
            return pa.table(
                {
                    "event_type": pa.array([], type=pa.string()),
                    "day": pa.array([], type=daily.schema.field("day").type),
                    "sliding_value": pa.array([], type=pa.float64()),
                }
            )
        return pa.concat_tables(groups)
    return daily.groupby("event_type").map_groups(sliding, batch_format="pyarrow")


SQL_EVENTS_SLIDING = """
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day, SUM(value) AS v
  FROM events GROUP BY 1, 2
)
SELECT event_type, day,
       ROUND(SUM(v) OVER (PARTITION BY event_type ORDER BY day
             RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW), 2)
           AS sliding_value
FROM daily
"""


def q_user_sessions(sf_dir: str) -> pa.Table:
    """Session windows (30-min inactivity gap) per user — the
    streaming-shaped workload pattern, at scale: hash-partition by
    user (NOT one group per user — 10^8 users would mean 10^8 Python
    calls), sort each partition by (user_id, ts) locally, and
    sessionize the WHOLE partition with one vectorized shift/diff pass;
    session starts are rows where the user changes or the gap exceeds
    30 min. One polars call per partition, P partitions total; the only
    exchange is the partition groupby, each sort is local and P-times
    smaller than a global sort."""
    import polars as pl

    P = 32
    ds = _rp(sf_dir, "events", ["user_id", "ts"])

    def add_part(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = uid.view(np.uint64)
        h = (h ^ (h >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
        part = (h % np.uint64(P)).view(np.int64)
        return t.append_column("part", pa.array(part, type=pa.int64()))

    def sessionize_part(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select(["user_id", "ts"])).sort(["user_id", "ts"])
        df = df.with_columns(
            new_sess=(
                (pl.col("user_id") != pl.col("user_id").shift(1))
                | ((pl.col("ts") - pl.col("ts").shift(1)) > pl.duration(minutes=30))
            )
            .fill_null(True)
            .cast(pl.Int64)
        )
        out = df.group_by("user_id").agg(
            pl.len().cast(pl.Int64).alias("n_events"),
            pl.col("new_sess").sum().alias("n_sessions"),
        )
        return out.to_arrow()

    return (
        ds.map_batches(add_part, batch_format="pyarrow", batch_size=None)
        .groupby("part")
        .map_groups(sessionize_part, batch_format="pyarrow")
    )


SQL_USER_SESSIONS = """
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(new_sess) AS BIGINT) AS n_sessions
FROM (
  SELECT user_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
)
GROUP BY user_id
"""


def q_top_parts(sf_dir: str) -> pa.Table:
    """Top-10 parts by revenue: partial per-batch aggregation -> tiny
    groupby -> global sort+limit (the only full sort, over #parts
    rows, not #lineitems)."""
    import polars as pl

    ds = _rp(sf_dir, "lineitem", ["l_partkey", "l_extendedprice", "l_discount"])

    def partial(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch).with_columns(
            rev=pl.col("l_extendedprice") * (1 - pl.col("l_discount"))
        )
        return df.group_by("l_partkey").agg(pl.col("rev").sum().alias("rev")).to_arrow()

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    totals = merge_partial_sums(partials, ["l_partkey"], ["rev"])
    if isinstance(totals, pa.Table):
        top: Any = (
            pl.from_arrow(totals)
            .sort(["rev", "l_partkey"], descending=[True, False])
            .head(10)
            .to_arrow()
        )
    else:
        top = totals.sort(["rev", "l_partkey"], descending=[True, False]).limit(10)
    return _apply(
        top,
        lambda t: pa.table(
            {
                "l_partkey": t["l_partkey"],
                "revenue": _r(t["rev"], 2),
            }
        ),
    )


SQL_TOP_PARTS = """
SELECT l_partkey, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem GROUP BY l_partkey
ORDER BY SUM(l_extendedprice * (1 - l_discount)) DESC, l_partkey ASC LIMIT 10
"""


def q_nation_order_revenue(sf_dir: str) -> pa.Table:
    """3-way join customer ⋈ orders ⋈ nation: small dims broadcast
    (nation+customer), orders stream through one map_batches."""
    import ray

    import polars as pl

    nation = pa.concat_tables(
        _rp(sf_dir, "nation", ["n_nationkey", "n_name"]).iter_batches(
            batch_format="pyarrow"
        )
    )
    cust = pa.concat_tables(
        _rp(sf_dir, "customer", ["c_custkey", "c_nationkey"]).iter_batches(
            batch_format="pyarrow"
        )
    )
    cust_nation = cust.join(
        nation, keys=["c_nationkey"], right_keys=["n_nationkey"]
    ).select(["c_custkey", "n_name"])
    ref = ray.put(cust_nation)

    def attach(batch: pa.Table) -> pa.Table:
        cn = ray.get(ref)
        joined = batch.join(cn, keys=["o_custkey"], right_keys=["c_custkey"])
        df = pl.from_arrow(joined)
        return (
            df.group_by("n_name")
            .agg(pl.col("o_totalprice").sum().alias("s"), pl.len().cast(pl.Int64).alias("n"))
            .to_arrow()
        )

    orders = _rp(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    partials = orders.map_batches(attach, batch_format="pyarrow", batch_size=None)
    final = merge_partial_sums(partials, ["n_name"], ["s", "n"])
    return _apply(
        final,
        lambda t: pa.table(
            {
                "n_name": t["n_name"],
                "revenue": _r(t["s"], 2),
                "n_orders": pc.cast(t["n"], pa.int64()),
            }
        ),
    )


SQL_NATION_ORDER_REVENUE = """
SELECT n.n_name, ROUND(SUM(o.o_totalprice), 2) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
"""
