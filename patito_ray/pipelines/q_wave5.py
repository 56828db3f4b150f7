"""Query registry chunk (split from pipelines/queries.py): 32 registrations.

Registers: user_profile, hard_negatives, quarantine_split, novelty_curve, source_overlap, conversion_lag, value_concentration, time_travel, zorder_prune, agg_view, index_search, target_encode, cube_lineitem, evolved_read, tolerant_validate, infer_contract, bucketed_join, skyline_parts, basket_rules, rolling_zscore, event_moments, survival_counts, unique_index, cusum_revenue, abc_parts, daily_autocorr, decayed_value, sssp_weighted, theilsen_trend, pca_project, snapshot_drift, hhi_suppliers
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
from patito_ray.pipelines.q_wave3 import (  # noqa: F401
    _doc_link_edges,
    _sql_link_edges,
)


def q_user_profile(sf_dir: str) -> Any:
    """Fused per-user behavioral profile: consecutive-day streaks,
    time-weighted value, event-type entropy and daily-count Fano factor
    in ONE user-hash exchange — the four standalone operators each pay
    an all-to-all over the same key, so a profile pipeline fuses them
    (CLAUDE.md: back-to-back exchanges hashing the SAME key should
    fuse). Per-partition kernel is pure polars/numpy; exactness
    contracts are inherited unchanged from the standalone operators
    (integer grids everywhere, entropy on the `_ra` nd=6 grid)."""
    import polars as pl

    from patito_ray.stages.exchange import hash_partition_ids
    from patito_ray.stages.join import default_num_partitions

    P = default_num_partitions()
    ds = _rp(sf_dir, "events", ["event_id", "ts", "user_id", "event_type", "value"])

    def add_part(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False).astype(np.float64)
        vmil = np.copysign(np.floor(np.abs(v) * 1000.0 + 0.5), v).astype(np.int64)
        tus = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        part = hash_partition_ids(t.column("user_id"), P, "user_profile user_id")
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "event_id": t.column("event_id"),
                "event_type": t.column("event_type"),
                "tus": pa.array(tus, type=pa.int64()),
                "vmil": pa.array(vmil, type=pa.int64()),
                "part": pa.array(part, type=pa.int64()),
            }
        )

    _schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("max_streak", pa.int64()),
            ("active_days", pa.int64()),
            ("twa", pa.float64()),
            ("n_types", pa.int64()),
            ("entropy", pa.float64()),
            ("n_days", pa.int64()),
            ("fano", pa.float64()),
        ]
    )

    def per_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.column_names:
            return _schema.empty_table()
        df = pl.from_arrow(t.drop_columns(["part"])).with_columns(
            (pl.col("tus") // 86_400_000_000).alias("dayi"),
            (pl.col("tus") // 1_000_000).alias("tsec"),
        )
        streaks = (
            df.select(["user_id", "dayi"])
            .unique()
            .sort(["user_id", "dayi"])
            .with_columns(
                (pl.col("dayi") - pl.int_range(pl.len()).over("user_id")).alias("isl")
            )
            .group_by(["user_id", "isl"])
            .agg(pl.len().alias("len"))
            .group_by("user_id")
            .agg(
                pl.col("len").max().alias("max_streak"),
                pl.col("len").sum().alias("active_days"),
            )
        )
        twa = (
            df.sort(["user_id", "tsec", "event_id"], maintain_order=True)
            .with_columns(
                (pl.col("tsec").shift(-1) - pl.col("tsec")).over("user_id").alias("dt")
            )
            .drop_nulls(["dt"])
            .group_by("user_id")
            .agg(
                (pl.col("vmil") * pl.col("dt")).sum().alias("wsum"),
                pl.col("dt").sum().alias("tspan"),
            )
            .filter(pl.col("tspan") > 0)
            .with_columns(
                (pl.col("wsum").cast(pl.Float64) / pl.col("tspan").cast(pl.Float64))
                .alias("twa")
            )
        )
        ce = (
            df.group_by(["user_id", "event_type"])
            .agg(pl.len().cast(pl.Int64).alias("cnt"))
            .sort(["user_id", "event_type"])
        )
        uid = ce["user_id"].to_numpy()
        cnt = ce["cnt"].to_numpy().astype(np.float64)
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        n_per = np.add.reduceat(cnt, starts)
        p = cnt / np.repeat(n_per, np.diff(np.r_[starts, len(cnt)]))
        ent = pl.DataFrame(
            {
                "user_id": uid[starts],
                "n_types": np.diff(np.r_[starts, len(cnt)]).astype(np.int64),
                # + 0.0: canonicalize the -0.0 of single-type users
                # (same bitwise-hash hazard as q_user_event_entropy)
                "entropy": _ra(np.add.reduceat(-p * np.log2(p), starts) + 0.0, 6).to_numpy(
                    zero_copy_only=False
                ),
            }
        )
        fano = (
            df.group_by(["user_id", "dayi"])
            .agg(pl.len().cast(pl.Int64).alias("c"))
            .group_by("user_id")
            .agg(
                pl.len().cast(pl.Int64).alias("n_days"),
                pl.col("c").sum().alias("sc"),
                (pl.col("c") * pl.col("c")).sum().alias("sc2"),
            )
            .filter(pl.col("n_days") > 1)
        )
        nd = fano["n_days"].to_numpy().astype(np.float64)
        sc = fano["sc"].to_numpy().astype(np.float64)
        sc2 = fano["sc2"].to_numpy().astype(np.float64)
        fano = fano.with_columns(
            pl.Series("fano", ((sc2 - sc * sc / nd) / (nd - 1.0)) / (sc / nd))
        )
        out = (
            streaks.join(twa.select(["user_id", "twa"]), on="user_id")
            .join(ent, on="user_id")
            .join(fano.select(["user_id", "n_days", "fano"]), on="user_id")
            .select(
                [
                    "user_id",
                    "max_streak",
                    "active_days",
                    "twa",
                    "n_types",
                    "entropy",
                    "n_days",
                    "fano",
                ]
            )
        )
        return out.to_arrow().cast(_schema)

    return (
        ds.map_batches(add_part, batch_format="pyarrow", batch_size=None)
        .groupby("part")
        .map_groups(per_part, batch_format="pyarrow")
    )


SQL_USER_PROFILE = """
WITH ev AS (
  SELECT user_id, event_id, epoch_us(ts) AS tus, event_type,
         CAST(FLOOR(ABS(value) * 1000 + 0.5)
              * (CASE WHEN value < 0 THEN -1 ELSE 1 END) AS BIGINT) AS vmil
  FROM events
),
d AS (SELECT DISTINCT user_id, tus // 86400000000 AS dayi FROM ev),
r AS (
  SELECT user_id, dayi,
         dayi - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY dayi) AS isl
  FROM d
),
cstr AS (SELECT user_id, isl, COUNT(*) AS len FROM r GROUP BY user_id, isl),
streaks AS (
  SELECT user_id, CAST(MAX(len) AS BIGINT) AS max_streak,
         CAST(SUM(len) AS BIGINT) AS active_days
  FROM cstr GROUP BY user_id
),
o AS (
  SELECT user_id, vmil,
         LEAD(tus // 1000000) OVER (
           PARTITION BY user_id ORDER BY tus // 1000000, event_id
         ) - tus // 1000000 AS dt
  FROM ev
),
twa AS (
  SELECT user_id, CAST(SUM(vmil * dt) AS BIGINT) AS wsum,
         CAST(SUM(dt) AS BIGINT) AS tspan
  FROM o WHERE dt IS NOT NULL GROUP BY user_id
),
ce AS (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM ev GROUP BY user_id, event_type
),
ne AS (SELECT user_id, CAST(SUM(cnt) AS BIGINT) AS nn FROM ce GROUP BY user_id),
ent AS (
  SELECT ce.user_id AS user_id, CAST(COUNT(*) AS BIGINT) AS n_types,
         ROUND(SUM(-(CAST(cnt AS DOUBLE) / nn) * LOG2(CAST(cnt AS DOUBLE) / nn)), 6)
           AS entropy
  FROM ce JOIN ne ON ce.user_id = ne.user_id GROUP BY ce.user_id
),
dc AS (
  SELECT user_id, tus // 86400000000 AS dayi, CAST(COUNT(*) AS BIGINT) AS c
  FROM ev GROUP BY user_id, tus // 86400000000
),
mo AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_days, CAST(SUM(c) AS BIGINT) AS sc,
         CAST(SUM(c * c) AS BIGINT) AS sc2
  FROM dc GROUP BY user_id
)
SELECT s.user_id AS user_id, s.max_streak, s.active_days,
       CAST(t.wsum AS DOUBLE) / CAST(t.tspan AS DOUBLE) AS twa,
       e.n_types, e.entropy, mo.n_days,
       ((CAST(sc2 AS DOUBLE) - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE)
                               / CAST(n_days AS DOUBLE))
        / CAST(n_days - 1 AS DOUBLE))
       / (CAST(sc AS DOUBLE) / CAST(n_days AS DOUBLE)) AS fano
FROM streaks s
JOIN twa t ON s.user_id = t.user_id
JOIN ent e ON s.user_id = e.user_id
JOIN mo ON s.user_id = mo.user_id
WHERE t.tspan > 0 AND mo.n_days > 1
"""

QUERIES["user_profile"] = (q_user_profile, SQL_USER_PROFILE)


def q_hard_negatives(sf_dir: str) -> Any:
    """Contrastive hard-negative mining over the embeddings table:
    each vector's best different-label cosine neighbor. Discrete id
    output; functions/similarity.py:hard_negative_mining for the
    broadcast masked-argmax scan (no shuffle at all)."""
    from patito_ray.functions.similarity import hard_negative_mining

    ds = _rp(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    out = hard_negative_mining(ds)
    schema = pa.schema([("vec_id", pa.int64()), ("neg_id", pa.int64())])
    return _lazy_norm(out, schema)


SQL_HARD_NEGATIVES = """
WITH scored AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS cand,
         list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                CAST(b.embedding AS DOUBLE[])) AS sim
  FROM embeddings a JOIN embeddings b ON a.label <> b.label
),
r AS (
  SELECT vec_id, cand,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cand ASC) AS rn
  FROM scored
)
SELECT vec_id, cand AS neg_id FROM r WHERE rn = 1
"""

QUERIES["hard_negatives"] = (q_hard_negatives, SQL_HARD_NEGATIVES)


class _QuarantineLineitem(pr.Model):
    l_orderkey: int
    l_quantity: float = pr.Field(le=30)
    l_discount: float = pr.Field(ge=0.02, le=0.08)


def q_quarantine_split(sf_dir: str) -> pa.Table:
    """Single-pass quarantine split (validation/violations.py:
    quarantine_split_write): valid rows to one parquet dir, violating
    rows + reasons to another, input scanned once. The oracle checks
    the split DECISION exactly — counts on both sides plus the int64
    key-sum of the quarantined rows (read back from the small side's
    parquet, which is itself part of the contract)."""
    from patito_ray.validation.violations import quarantine_split_write

    ds = _rp(sf_dir, "lineitem", ["l_orderkey", "l_quantity", "l_discount"])
    # ONE bounded directory (the sink wipes its targets) — a mkdtemp
    # per call would leak corpus-sized dirs across runs
    base = _tmp_dir("quarantine", sf_dir)
    counts = quarantine_split_write(
        ds, _QuarantineLineitem, f"{base}/valid", f"{base}/quarantine"
    )
    quar_key_sum = 0
    if counts["quarantined"]:
        from patito_ray.sources.readers import clean_read_parquet

        qds = clean_read_parquet(f"{base}/quarantine", columns=["l_orderkey"])
        for b in qds.iter_batches(batch_format="pyarrow"):
            s = pc.sum(b.column("l_orderkey")).as_py()
            quar_key_sum += int(s or 0)
    return _one_row(
        n_valid=counts["valid"],
        n_quar=counts["quarantined"],
        quar_key_sum=quar_key_sum,
    )


SQL_QUARANTINE_SPLIT = """
WITH f AS (
  SELECT l_orderkey,
         (l_orderkey IS NULL OR l_quantity IS NULL OR l_discount IS NULL
          OR NOT (l_quantity <= 30)
          OR NOT (l_discount >= 0.02) OR NOT (l_discount <= 0.08)) AS bad
  FROM lineitem
)
SELECT CAST(COUNT(*) FILTER (NOT bad) AS BIGINT) AS n_valid,
       CAST(COUNT(*) FILTER (bad) AS BIGINT) AS n_quar,
       CAST(COALESCE(SUM(l_orderkey) FILTER (bad), 0) AS BIGINT) AS quar_key_sum
FROM f
"""

QUERIES["quarantine_split"] = (q_quarantine_split, SQL_QUARANTINE_SPLIT)


def q_novelty_curve(sf_dir: str) -> Any:
    """Behavior-adoption curve: how many (user, event_type) pairs see
    their FIRST-ever event on each day. First-seen day is the day of
    the pair's MIN timestamp, so the whole operator is partial-min
    mergeable — per-batch (user, type, min tus) rows ride the adaptive
    min merge, then a tiny per-day partial-sum count. NO event-volume
    exchange anywhere. Exact integers end to end."""
    import polars as pl
    import ray.data as rd

    from patito_ray.stages.agg import merge_partial_mins

    ds = _rp(sf_dir, "events", ["ts", "user_id", "event_type"])

    def partial_first(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(
                pa.table(
                    {
                        "user_id": t.column("user_id"),
                        "event_type": t.column("event_type"),
                        "tus": t.column("ts").cast(pa.int64()),
                    }
                )
            )
            .group_by(["user_id", "event_type"])
            .agg(pl.col("tus").min())
            .to_arrow()
        )

    partials = ds.map_batches(partial_first, batch_format="pyarrow", batch_size=None)
    merged = merge_partial_mins(partials, ["user_id", "event_type"], ["tus"])
    if isinstance(merged, pa.Table):
        merged = rd.from_arrow(merged)

    def day_counts(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"dayi": pa.array([], pa.int64()), "n_new": pa.array([], pa.int64())}
            )
        dayi = t.column("tus").to_numpy(zero_copy_only=False) // 86_400_000_000
        return (
            pl.from_arrow(pa.table({"dayi": pa.array(dayi, type=pa.int64())}))
            .group_by("dayi")
            .agg(pl.len().cast(pl.Int64).alias("n_new"))
            .to_arrow()
        )

    counts = merge_partial_sums(
        merged.map_batches(day_counts, batch_format="pyarrow", batch_size=None),
        ["dayi"],
        ["n_new"],
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema(
                [("day", pa.timestamp("us")), ("n_new", pa.int64())]
            ).empty_table()
        day = pc.cast(
            pc.multiply(t.column("dayi"), pa.scalar(86_400_000_000, pa.int64())),
            pa.timestamp("us"),
        )
        return pa.table({"day": day, "n_new": t.column("n_new").cast(pa.int64())})

    return _apply(counts, finish)


SQL_NOVELTY_CURVE = """
WITH r AS (
  SELECT user_id, event_type, ts,
         ROW_NUMBER() OVER (
           PARTITION BY user_id, event_type ORDER BY ts, event_id
         ) AS rn
  FROM events
)
SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n_new
FROM r WHERE rn = 1 GROUP BY CAST(ts AS DATE)
"""

QUERIES["novelty_curve"] = (q_novelty_curve, SQL_NOVELTY_CURVE)


def q_source_overlap(sf_dir: str) -> Any:
    """Corpus-mixing audit: for every source pair, how many DISTINCT
    texts both sources contain — the duplicate-contamination matrix a
    mixing pipeline checks before weighting sources. Shape: per-batch
    distinct (source, text) projection, one text-hash exchange, then
    per-partition co-occurrence BITMASKS per text (sources factorize
    to <= 63 local codes, np.bitwise_or.reduceat — no per-text Python)
    with pair expansion only over DISTINCT masks; pair counts ride the
    adaptive partial-sum merge. All-integer."""
    import polars as pl

    from patito_ray.stages.exchange import hash_partition_ids
    from patito_ray.stages.join import default_num_partitions

    P = default_num_partitions()
    ds = _rp(sf_dir, "documents", ["source", "text"])

    def add_part(t: pa.Table) -> pa.Table:
        out = pl.from_arrow(t).unique().to_arrow()
        part = hash_partition_ids(out.column("text"), P, "source_overlap text")
        return out.append_column("part", pa.array(part, type=pa.int64()))

    _pair_schema = pa.schema(
        [("s1", pa.string()), ("s2", pa.string()), ("shared_texts", pa.int64())]
    )

    def per_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "text" not in t.column_names:
            return _pair_schema.empty_table()
        df = pl.from_arrow(t.drop_columns(["part"])).unique().sort(["text", "source"])
        src = df["source"].to_numpy()
        txt = df["text"].to_numpy()
        names, codes = np.unique(src, return_inverse=True)
        if len(names) > 63:
            raise ValueError(
                f"source_overlap bitmask path supports <= 63 distinct "
                f"sources per partition (got {len(names)}); widen to "
                "multi-word masks for larger source sets"
            )
        starts = np.flatnonzero(np.r_[True, txt[1:] != txt[:-1]])
        masks = np.bitwise_or.reduceat(
            np.uint64(1) << codes.astype(np.uint64), starts
        )
        u_masks, m_counts = np.unique(masks, return_counts=True)
        acc: dict[tuple[str, str], int] = {}
        for m, c in zip(u_masks, m_counts):
            bits = [b for b in range(len(names)) if int(m) >> b & 1]
            for i in range(len(bits)):
                for j in range(i + 1, len(bits)):
                    key = (str(names[bits[i]]), str(names[bits[j]]))
                    acc[key] = acc.get(key, 0) + int(c)
        if not acc:
            return _pair_schema.empty_table()
        return pa.table(
            {
                "s1": pa.array([k[0] for k in acc]),
                "s2": pa.array([k[1] for k in acc]),
                "shared_texts": pa.array(list(acc.values()), type=pa.int64()),
            }
        )

    pairs = (
        ds.map_batches(add_part, batch_format="pyarrow", batch_size=None)
        .groupby("part")
        .map_groups(per_part, batch_format="pyarrow")
    )
    merged = merge_partial_sums(pairs, ["s1", "s2"], ["shared_texts"])
    if isinstance(merged, pa.Table):
        if merged.num_rows == 0:
            return _pair_schema.empty_table()
        return merged.select(["s1", "s2", "shared_texts"]).cast(_pair_schema)
    # empty Datasets lose column names in to_pandas — normalize through
    # the typed-empty-aware finalizer
    return _lazy_norm(merged, _pair_schema)


SQL_SOURCE_OVERLAP = """
WITH d AS (SELECT DISTINCT source, text FROM documents)
SELECT a.source AS s1, b.source AS s2, CAST(COUNT(*) AS BIGINT) AS shared_texts
FROM d a JOIN d b ON a.text = b.text AND a.source < b.source
GROUP BY a.source, b.source
"""

QUERIES["source_overlap"] = (q_source_overlap, SQL_SOURCE_OVERLAP)


def q_conversion_lag(sf_dir: str) -> Any:
    """Funnel latency: per user, microseconds from FIRST view to FIRST
    purchase. Both endpoints are per-(user, type) MINIMA, so the whole
    operator rides the adaptive partial-min merge — no event-volume
    exchange. Exact int64 difference (negative if the user purchased
    before ever viewing — kept, the sign is the signal)."""
    import polars as pl
    import ray.data as rd

    from patito_ray.stages.agg import merge_partial_mins

    ds = _rp(sf_dir, "events", ["ts", "user_id", "event_type"])

    def partial_first(t: pa.Table) -> pa.Table:
        keep = pc.is_in(
            t.column("event_type"), value_set=pa.array(["view", "purchase"])
        )
        t = t.filter(keep)
        return (
            pl.from_arrow(
                pa.table(
                    {
                        "user_id": t.column("user_id"),
                        "event_type": t.column("event_type"),
                        "tus": t.column("ts").cast(pa.int64()),
                    }
                )
            )
            .group_by(["user_id", "event_type"])
            .agg(pl.col("tus").min())
            .to_arrow()
        )

    partials = ds.map_batches(partial_first, batch_format="pyarrow", batch_size=None)
    merged = merge_partial_mins(partials, ["user_id", "event_type"], ["tus"])
    if isinstance(merged, pa.Table):
        merged = rd.from_arrow(merged)

    _schema = pa.schema([("user_id", pa.int64()), ("lag_us", pa.int64())])

    def lag(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _schema.empty_table()
        return (
            pl.from_arrow(t)
            .pivot(index="user_id", on="event_type", values="tus")
            .pipe(
                lambda df: df
                if {"view", "purchase"} <= set(df.columns)
                else df.with_columns(
                    *(
                        pl.lit(None, dtype=pl.Int64).alias(c)
                        for c in ("view", "purchase")
                        if c not in df.columns
                    )
                )
            )
            .drop_nulls(["view", "purchase"])
            .select(
                pl.col("user_id"),
                (pl.col("purchase") - pl.col("view")).alias("lag_us"),
            )
            .to_arrow()
            .cast(_schema)
        )

    # the min-merge's distributed branch hash-partitions by the FULL
    # (user_id, event_type) key, so a user's two rows may land in
    # different blocks — re-group by user before pivoting
    from patito_ray.stages.exchange import hash_partition_ids
    from patito_ray.stages.join import default_num_partitions

    P = default_num_partitions()

    def add_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        part = hash_partition_ids(t.column("user_id"), P, "conversion_lag user_id")
        return t.append_column("part", pa.array(part, type=pa.int64()))

    def lag_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.column_names:
            return _schema.empty_table()
        return lag(t.drop_columns(["part"]))

    return (
        merged.map_batches(add_part, batch_format="pyarrow", batch_size=None)
        .groupby("part")
        .map_groups(lag_part, batch_format="pyarrow")
    )


SQL_CONVERSION_LAG = """
WITH m AS (
  SELECT user_id,
         MIN(epoch_us(ts)) FILTER (event_type = 'view') AS first_view,
         MIN(epoch_us(ts)) FILTER (event_type = 'purchase') AS first_purchase
  FROM events GROUP BY user_id
)
SELECT user_id, first_purchase - first_view AS lag_us
FROM m WHERE first_view IS NOT NULL AND first_purchase IS NOT NULL
"""

QUERIES["conversion_lag"] = (q_conversion_lag, SQL_CONVERSION_LAG)


def q_value_concentration(sf_dir: str) -> Any:
    """Whale analysis: the revenue share of the top 1% of customers.
    Per-customer cents ride the adaptive partial-sum merge; the p99
    threshold is a SELECTION quantile (rank ceil(0.99*n), bit-exact vs
    SQL); the share is exact int64 sums with one mirrored division."""
    import polars as pl

    cents_partials = _rp(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        lambda t: pl.from_arrow(
            pa.table(
                {
                    "o_custkey": t.column("o_custkey"),
                    "cents": pa.array(
                        np.floor(
                            t.column("o_totalprice").to_numpy(zero_copy_only=False)
                            * 100.0
                            + 0.5
                        ).astype(np.int64),
                        type=pa.int64(),
                    ),
                }
            )
        )
        .group_by("o_custkey")
        .agg(pl.col("cents").sum())
        .to_arrow(),
        batch_format="pyarrow",
        batch_size=None,
    )
    merged = merge_partial_sums(cents_partials, ["o_custkey"], ["cents"])
    if not isinstance(merged, pa.Table):
        from patito_ray.stages.agg import collect_table

        # one narrow row per customer — small next to the orders scan;
        # the distributed branch only exists for the >256 MB key space,
        # where a grouped selection via stages.quantiles would take over
        merged = collect_table(
            merged,
            empty_schema=pa.schema([("o_custkey", pa.int64()), ("cents", pa.int64())]),
        )
    if merged.num_rows == 0:
        return pa.schema(
            [
                ("n_users", pa.int64()),
                ("thr_cents", pa.int64()),
                ("top_cents", pa.int64()),
                ("total_cents", pa.int64()),
                ("share", pa.float64()),
            ]
        ).empty_table()
    x = np.sort(merged.column("cents").to_numpy(zero_copy_only=False).astype(np.int64))
    n = len(x)
    # 1-based rank ceil(0.99*n) — same IEEE product/ceil as the oracle
    thr = int(x[max(1, int(np.ceil(n * 0.99))) - 1])
    top = int(x[x >= thr].sum())
    total = int(x.sum())
    return _one_row(
        n_users=n,
        thr_cents=thr,
        top_cents=top,
        total_cents=total,
        share=float(top) / float(total),
    )


SQL_VALUE_CONCENTRATION = """
WITH r AS (
  SELECT o_custkey,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY o_custkey
),
k AS (
  SELECT cents, ROW_NUMBER() OVER (ORDER BY cents) AS rn,
         COUNT(*) OVER () AS n
  FROM r
),
t AS (
  SELECT MAX(CASE WHEN rn = GREATEST(1, CAST(CEIL(0.99 * n) AS BIGINT))
                  THEN cents END) AS thr,
         CAST(MAX(n) AS BIGINT) AS n_users
  FROM k
)
SELECT t.n_users,
       t.thr AS thr_cents,
       CAST(SUM(r.cents) FILTER (r.cents >= t.thr) AS BIGINT) AS top_cents,
       CAST(SUM(r.cents) AS BIGINT) AS total_cents,
       CAST(SUM(r.cents) FILTER (r.cents >= t.thr) AS DOUBLE)
         / CAST(SUM(r.cents) AS DOUBLE) AS share
FROM r, t GROUP BY t.n_users, t.thr
"""

QUERIES["value_concentration"] = (q_value_concentration, SQL_VALUE_CONCENTRATION)


def _cdc_orders_history(sf_dir: str, tag: str) -> str:
    """Build the 3-version CDC timeline over orders shared by the
    time_travel and snapshot_drift queries (and hand-replayed by both
    SQL oracles — keep the (mod, bump) constants in lockstep with
    SQL_TIME_TRAVEL / SQL_SNAPSHOT_DRIFT): v1 = all keys at base cents,
    v2 = keys %5==0 bumped +777, v3 = keys %7==0 bumped +1e6. ONE
    bounded directory per (tag, sf), wiped per call (upsert_versioned
    requires a fresh history; mkdtemp would leak dirs across runs)."""
    import shutil

    from patito_ray.sinks import upsert_versioned

    base = _tmp_dir(tag, sf_dir)
    shutil.rmtree(base, ignore_errors=True)
    orders = _rp(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def batch_ver(t: pa.Table, mod: int, bump: int, ver: int) -> pa.Table:
        k = t.column("o_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        cents = np.floor(
            t.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        if mod > 1:
            keep = k % mod == 0
            k, cents = k[keep], cents[keep]
        return pa.table(
            {
                "k": pa.array(k, pa.int64()),
                "p": pa.array(k % 8, pa.int64()),
                "cents": pa.array(cents + bump, pa.int64()),
                "ver": pa.array(np.full(len(k), ver, np.int64()), pa.int64()),
            }
        )

    for mod, bump, ver in ((1, 0, 0), (5, 777, 1), (7, 1_000_000, 2)):
        upsert_versioned(
            base,
            orders.map_batches(
                lambda t, m=mod, b=bump, v=ver: batch_ver(t, m, b, v),
                batch_format="pyarrow",
                batch_size=None,
            ),
            key="k",
            partition_col="p",
            order_col="ver",
        )
    return base


def q_time_travel(sf_dir: str) -> Any:
    """Snapshot-versioned CDC table (sinks.upsert_versioned /
    snapshot_read): three upserts build versions 1..3, then BOTH
    historical states v2 and v3 are read back AS-OF and aggregated per
    partition — proving untouched partitions share files across
    snapshots and superseded rows stay readable. All-integer cents, so
    the whole time line is exact against SQL that replays the merge."""
    import polars as pl

    from patito_ray.sinks import snapshot_read

    base = _cdc_orders_history(sf_dir, "timetravel")

    def agg(version: int) -> Any:
        return snapshot_read(base, version=version).map_batches(
            lambda t, v=version: pl.from_arrow(t)
            .group_by("p")
            .agg(pl.len().cast(pl.Int64).alias("n"), pl.col("cents").sum())
            .with_columns(pl.lit(v, dtype=pl.Int64).alias("version"))
            .to_arrow(),
            batch_format="pyarrow",
            batch_size=None,
        )

    merged = merge_partial_sums(agg(2).union(agg(3)), ["version", "p"], ["n", "cents"])
    schema = pa.schema(
        [
            ("version", pa.int64()),
            ("p", pa.int64()),
            ("n", pa.int64()),
            ("cents", pa.int64()),
        ]
    )
    return _apply(merged, lambda t: t.select(schema.names).cast(schema))


SQL_TIME_TRAVEL = """
WITH base AS (
  SELECT o_orderkey AS k, o_orderkey % 8 AS p,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
),
v2 AS (
  SELECT 2 AS version, p,
         CASE WHEN k % 5 = 0 THEN cents + 777 ELSE cents END AS cents
  FROM base
),
v3 AS (
  SELECT 3 AS version, p,
         CASE WHEN k % 7 = 0 THEN cents + 1000000
              WHEN k % 5 = 0 THEN cents + 777
              ELSE cents END AS cents
  FROM base
),
u AS (SELECT * FROM v2 UNION ALL SELECT * FROM v3)
SELECT CAST(version AS BIGINT) AS version, CAST(p AS BIGINT) AS p,
       CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(cents) AS BIGINT) AS cents
FROM u GROUP BY version, p
"""

QUERIES["time_travel"] = (q_time_travel, SQL_TIME_TRAVEL)


def q_zorder_prune(sf_dir: str) -> pa.Table:
    """Z-order clustered layout + data-skipping read (stages/zorder.py):
    lineitem is written Morton-clustered on (l_quantity,
    l_extendedprice), then a 2-D box aggregate reads ONLY the files
    whose manifest min/max intersect the box — the exact predicate
    still runs per batch, so pruning is pure I/O savings and the result
    is bit-identical to a full scan. The oracle is the plain SQL box
    aggregate; a files_read < files_total assertion lives in pytest
    (file counts are layout, not data)."""
    import shutil

    from patito_ray.stages.zorder import prune_files, pruned_read, zorder_write

    ds = _rp(
        sf_dir, "lineitem", ["l_orderkey", "l_quantity", "l_extendedprice"]
    )
    out = _tmp_dir("zorder", sf_dir)
    shutil.rmtree(out, ignore_errors=True)
    zorder_write(ds, ["l_quantity", "l_extendedprice"], out, num_files=32)

    box = {"l_quantity": (10.0, 20.0), "l_extendedprice": (20000.0, 40000.0)}
    kept, total = prune_files(out, box)
    if not (0 < len(kept) < total):  # layout sanity, not part of the oracle
        import logging

        logging.getLogger(__name__).warning(
            "zorder_prune: box kept %d/%d files (no pruning at this sf)",
            len(kept),
            total,
        )

    def partial(b: pa.Table) -> pa.Table:
        q = b.column("l_quantity").to_numpy(zero_copy_only=False)
        p = b.column("l_extendedprice").to_numpy(zero_copy_only=False)
        m = (q >= 10.0) & (q <= 20.0) & (p >= 20000.0) & (p <= 40000.0)
        return _one_row(
            n=int(m.sum()),
            price_cents=int(np.floor(p[m] * 100.0 + 0.5).astype(np.int64).sum()),
            key_sum=int(
                b.column("l_orderkey").to_numpy(zero_copy_only=False)[m].sum()
            ),
        )

    # workers reduce each batch to THREE ints; only those partials
    # reach the driver (never the pruned files' bytes)
    parts = pruned_read(out, box).map_batches(
        partial, batch_format="pyarrow", batch_size=None
    ).take_all()
    return _one_row(
        n=sum(r["n"] for r in parts),
        price_cents=sum(r["price_cents"] for r in parts),
        key_sum=sum(r["key_sum"] for r in parts),
    )


SQL_ZORDER_PRUNE = """
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS price_cents,
       CAST(SUM(l_orderkey) AS BIGINT) AS key_sum
FROM lineitem
WHERE l_quantity BETWEEN 10 AND 20
  AND l_extendedprice BETWEEN 20000 AND 40000
"""

QUERIES["zorder_prune"] = (q_zorder_prune, SQL_ZORDER_PRUNE)


def q_agg_view(sf_dir: str) -> Any:
    """Incrementally-maintained materialized view (stages/aggview.py):
    the events table arrives as three disjoint CDC slices (event_id mod
    3); slice 0 creates the view, slices 1 and 2 fold in as refreshes
    that aggregate ONLY the delta and rewrite only the partitions whose
    keys the delta touches. The final view state must equal one SQL
    GROUP BY over the whole table — the maintenance path is invisible
    in the result. All-integer sums (cents), exact."""
    import shutil

    import polars as pl

    from patito_ray.stages.aggview import (
        create_agg_view,
        read_agg_view,
        refresh_agg_view,
    )

    out = _tmp_dir("aggview", sf_dir)
    shutil.rmtree(out, ignore_errors=True)

    def slice_mod(m: int) -> Any:
        def prep(t: pa.Table) -> pa.Table:
            eid = t.column("event_id").to_numpy(zero_copy_only=False)
            keep = eid % 3 == m
            t = t.filter(pa.array(keep))
            tus = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
            val = t.column("value").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "event_type": t.column("event_type"),
                    "dayi": pa.array(tus // 86_400_000_000, pa.int64()),
                    "value_cents": pa.array(
                        np.floor(val * 100.0 + 0.5).astype(np.int64), pa.int64()
                    ),
                    "n": pa.array(np.ones(t.num_rows, np.int64), pa.int64()),
                }
            )

        return _rp(sf_dir, "events", ["event_id", "ts", "event_type", "value"]).map_batches(
            prep, batch_format="pyarrow", batch_size=None
        )

    create_agg_view(
        slice_mod(0), ["event_type", "dayi"], ["value_cents", "n"], out
    )
    refresh_agg_view(out, slice_mod(1))
    refresh_agg_view(out, slice_mod(2))

    schema = pa.schema(
        [
            ("event_type", pa.string()),
            ("day", pa.timestamp("us")),
            ("value_cents", pa.int64()),
            ("n", pa.int64()),
        ]
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return schema.empty_table()
        day = pc.cast(
            pc.multiply(t.column("dayi"), pa.scalar(86_400_000_000, pa.int64())),
            pa.timestamp("us"),
        )
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "day": day,
                "value_cents": t.column("value_cents").cast(pa.int64()),
                "n": t.column("n").cast(pa.int64()),
            }
        )

    return read_agg_view(out).map_batches(
        finish, batch_format="pyarrow", batch_size=None
    )


SQL_AGG_VIEW = """
SELECT event_type,
       CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS value_cents,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY event_type, CAST(ts AS DATE)
"""

QUERIES["agg_view"] = (q_agg_view, SQL_AGG_VIEW)


def q_index_search(sf_dir: str) -> Any:
    """Persisted inverted token index + indexed AND-search
    (functions/invindex.py): one build pass hash-partitions distinct
    (token, doc_id) postings by token; the 3-term conjunctive query
    then reads ONLY the partition files its terms hash to (3 of 64 at
    most) and counts term matches per doc — no corpus scan at query
    time. Exact list_contains oracle on the same RE2 tokenization."""
    import shutil

    from patito_ray.functions.invindex import build_token_index, search_index

    out = _tmp_dir("invindex", sf_dir)
    shutil.rmtree(out, ignore_errors=True)
    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    build_token_index(ds, out, num_partitions=64)
    return search_index(out, ["join", "hash", "filter"], mode="and")


SQL_INDEX_SEARCH = """
WITH t AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS ts FROM documents
)
SELECT doc_id FROM t
WHERE list_contains(ts, 'join') AND list_contains(ts, 'hash')
  AND list_contains(ts, 'filter')
"""

QUERIES["index_search"] = (q_index_search, SQL_INDEX_SEARCH)


def q_target_encode(sf_dir: str) -> Any:
    """Leave-one-out target encoding (the ML feature-engineering
    staple): each order's category (o_orderpriority) is encoded as the
    mean order value of OTHER orders in the category —
    (sum_c − x_i)/(n_c − 1). One partial-sum pass builds the tiny
    per-category (sum, n) table; the encode pass is a broadcast lookup
    + one vectorized division per batch, zero shuffle. Exact: integer
    cents keep both operands on the int grid (< 2^53), so the single
    IEEE division is bit-identical to SQL's window form."""
    import polars as pl

    ds = _rp(sf_dir, "orders", ["o_orderkey", "o_orderpriority", "o_totalprice"])

    def cents_col(t: pa.Table) -> np.ndarray:
        return np.floor(
            t.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)

    partials = ds.map_batches(
        lambda t: pl.from_arrow(
            pa.table(
                {
                    "cat": t.column("o_orderpriority"),
                    "cents": pa.array(cents_col(t), pa.int64()),
                    "n": pa.array(np.ones(t.num_rows, np.int64)),
                }
            )
        )
        .group_by("cat")
        .agg(pl.col("cents").sum(), pl.col("n").sum())
        .to_arrow(),
        batch_format="pyarrow",
        batch_size=None,
    )
    from patito_ray.stages.agg import collect_table

    merged = merge_partial_sums(partials, ["cat"], ["cents", "n"])
    if not isinstance(merged, pa.Table):
        # category cardinality is tiny by construction of the operator
        merged = collect_table(
            merged,
            empty_schema=pa.schema(
                [("cat", pa.string()), ("cents", pa.int64()), ("n", pa.int64())]
            ),
        )
    cat_values = merged.column("cat").combine_chunks()
    cat_sums = merged.column("cents").to_numpy(zero_copy_only=False).astype(np.int64)
    cat_ns = merged.column("n").to_numpy(zero_copy_only=False).astype(np.int64)

    def encode(t: pa.Table) -> pa.Table:
        # vectorized dictionary lookup: index_in against the tiny
        # broadcast category table, then two np gathers
        idx = pc.index_in(
            t.column("o_orderpriority"), value_set=cat_values
        ).combine_chunks().to_numpy(zero_copy_only=False)
        s = cat_sums[idx]
        n = cat_ns[idx]
        x = cents_col(t)
        with np.errstate(divide="ignore", invalid="ignore"):
            loo = (s - x).astype(np.float64) / (n - 1).astype(np.float64)
        enc = pa.array(loo, pa.float64())
        if (n == 1).any():  # singleton category: no other rows to average
            enc = pc.if_else(pa.array(n == 1), pa.scalar(None, pa.float64()), enc)
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "loo_cents": enc,
            }
        )

    return ds.map_batches(encode, batch_format="pyarrow", batch_size=None)


SQL_TARGET_ENCODE = """
WITH c AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
)
SELECT o_orderkey,
       CASE WHEN COUNT(*) OVER (PARTITION BY o_orderpriority) > 1
            THEN CAST(SUM(cents) OVER (PARTITION BY o_orderpriority) - cents
                      AS DOUBLE)
                 / CAST(COUNT(*) OVER (PARTITION BY o_orderpriority) - 1
                        AS DOUBLE)
       END AS loo_cents
FROM c
"""

QUERIES["target_encode"] = (q_target_encode, SQL_TARGET_ENCODE)


def q_cube_lineitem(sf_dir: str) -> Any:
    """Full CUBE (l_returnflag, l_linestatus) in ONE input pass: every
    batch emits partials for all FOUR grouping sets through the same
    grouping-sets machinery as ROLLUP (stages/agg.py). All-integer
    cents — no rounding anywhere."""
    from patito_ray.stages.agg import grouping_sets_sums

    ds = _rp(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_extendedprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "l_linestatus": t.column("l_linestatus"),
                "cents": pa.array(
                    np.floor(
                        t.column("l_extendedprice").to_numpy(zero_copy_only=False)
                        * 100.0
                        + 0.5
                    ).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    merged = grouping_sets_sums(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        keys=["l_returnflag", "l_linestatus"],
        sums=["cents"],
        sets=[(0, 1), (0,), (1,), ()],
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "l_linestatus": t.column("l_linestatus"),
                "grouping_id": t.column("grouping_id"),
                "cents": pc.cast(t.column("cents"), pa.int64()),
                "n": pc.cast(t.column("n"), pa.int64()),
            }
        )

    return _apply(merged, finish)


SQL_CUBE_LINEITEM = """
SELECT l_returnflag, l_linestatus,
       CAST(2 * GROUPING(l_returnflag) + GROUPING(l_linestatus) AS BIGINT)
         AS grouping_id,
       CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS cents,
       COUNT(*) AS n
FROM lineitem
GROUP BY CUBE(l_returnflag, l_linestatus)
"""

QUERIES["cube_lineitem"] = (q_cube_lineitem, SQL_CUBE_LINEITEM)


def q_evolved_read(sf_dir: str) -> Any:
    """Schema-evolution union read (sources/readers.py:
    read_parquet_evolved): the orders table is written as two schema
    GENERATIONS — gen1 (even keys) with (int32 key, cents) and gen2
    (odd keys) adding a priority column and widening the key to int64.
    The evolved read unifies by name (permissive promotion), null-fills
    the added column for gen1 rows, and must reproduce exactly what SQL
    computes from the source table."""
    import shutil

    import pyarrow.parquet as pq

    from patito_ray.sources.readers import read_parquet_evolved

    out = _tmp_dir("evolved", sf_dir)
    shutil.rmtree(out, ignore_errors=True)
    import os

    os.makedirs(out)
    ds = _rp(sf_dir, "orders", ["o_orderkey", "o_totalprice", "o_orderpriority"])

    def write_gen(t: pa.Table) -> pa.Table:
        import hashlib

        k = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        cents = np.floor(
            t.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        even = k % 2 == 0
        g1 = pa.table(
            {
                # int32 is safe for the synthetic keyspace; the read
                # must promote it back to int64
                "o_orderkey": pa.array(k[even].astype(np.int32), pa.int32()),
                "cents": pa.array(cents[even], pa.int64()),
            }
        )
        g2 = pa.table(
            {
                "o_orderkey": pa.array(k[~even], pa.int64()),
                "cents": pa.array(cents[~even], pa.int64()),
                "priority": t.column("o_orderpriority").filter(pa.array(~even)),
            }
        )
        for tag, g in (("gen1", g1), ("gen2", g2)):
            if g.num_rows == 0:
                continue
            h = hashlib.blake2b(digest_size=8)
            sink = pa.BufferOutputStream()
            with pa.ipc.new_stream(sink, g.schema) as w:
                w.write_table(g)
            h.update(sink.getvalue())
            # content-deterministic name: task retries rewrite, never dup
            name = f"{out}/{tag}-{h.hexdigest()}.parquet"
            tmp = f"{out}/.tmp-{os.getpid()}-{tag}-{h.hexdigest()}"
            pq.write_table(g, tmp)
            os.replace(tmp, name)
        return pa.table({"n": pa.array([t.num_rows], pa.int64())})

    # side-effect write pass (consumed for its counts only)
    for _ in ds.map_batches(
        write_gen, batch_format="pyarrow", batch_size=None
    ).iter_batches(batch_format="pyarrow"):
        pass

    out_schema = pa.schema(
        [
            ("o_orderkey", pa.int64()),
            ("cents", pa.int64()),
            ("priority", pa.string()),
        ]
    )
    return read_parquet_evolved(out).map_batches(
        lambda t: t.select(out_schema.names).cast(out_schema),
        batch_format="pyarrow",
        batch_size=None,
    )


SQL_EVOLVED_READ = """
SELECT o_orderkey,
       CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
       CASE WHEN o_orderkey % 2 = 1 THEN o_orderpriority END AS priority
FROM orders
"""

QUERIES["evolved_read"] = (q_evolved_read, SQL_EVOLVED_READ)


class _TolerantLineitem(pr.Model):
    l_quantity: float = pr.Field(le=45)
    l_discount: float = pr.Field(le=0.095)


def q_tolerant_validate(sf_dir: str) -> pa.Table:
    """Tolerance-thresholded validation (ValidationReport.waive /
    validate(tolerances=...)): both bounds checks fail strictly, but at
    a 5% 'mostly' threshold the discount check (4.9% violating) waives
    while the quantity check (9.9%) still fails. The oracle recomputes
    each violation count AND the waive decision — same integer counts,
    same single IEEE division and comparison."""
    from patito_ray.validation.engine import validate_report

    ds = _rp(sf_dir, "lineitem", ["l_quantity", "l_discount"])
    rep = validate_report(ds, _TolerantLineitem)
    waived_rep = rep.waive(_TolerantLineitem, {"*": 0.05})
    waived_locs = {w["loc"] for w in waived_rep.waived}
    rows = sorted(
        (loc, int(cnt), loc in waived_locs)
        for loc, cnt in rep.merged.bounds_fail.items()
    )
    return pa.table(
        {
            "loc": pa.array([r[0] for r in rows], pa.string()),
            "cnt": pa.array([r[1] for r in rows], pa.int64()),
            "waived": pa.array([r[2] for r in rows], pa.bool_()),
        }
    )


SQL_TOLERANT_VALIDATE = """
WITH s AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(CASE WHEN NOT l_quantity <= 45 THEN 1 ELSE 0 END)
              AS BIGINT) AS qc,
         CAST(SUM(CASE WHEN NOT l_discount <= 0.095 THEN 1 ELSE 0 END)
              AS BIGINT) AS dc
  FROM lineitem
)
SELECT 'l_discount' AS loc, dc AS cnt,
       CAST(dc AS DOUBLE) / n <= 0.05 AS waived FROM s
UNION ALL
SELECT 'l_quantity', qc, CAST(qc AS DOUBLE) / n <= 0.05 FROM s
"""

QUERIES["tolerant_validate"] = (q_tolerant_validate, SQL_TOLERANT_VALIDATE)


def q_infer_contract(sf_dir: str) -> pa.Table:
    """Constraint inference (validation/infer.py): scaffold a Model
    from the lineitem data in ONE streaming profile pass and report the
    inferred contract — nullability, numeric bounds (observed
    extremes), enum cardinality. The oracle recomputes each inferred
    fact with MIN/MAX/COUNT(DISTINCT); self-consistency (inferred model
    accepts its own corpus) is pytested."""
    from patito_ray.validation.infer import infer_model

    ds = _rp(
        sf_dir,
        "lineitem",
        ["l_quantity", "l_extendedprice", "l_returnflag", "l_linestatus"],
    )
    model, _info = infer_model(ds, name="InferredLineitem")
    spec = model._spec()
    rows = []
    for col in sorted(spec.columns):
        c = spec.columns[col]
        rows.append(
            {
                "col": col,
                "nullable": bool(c.nullable),
                "vmin": float(c.bounds["minimum"]) if "minimum" in c.bounds else None,
                "vmax": float(c.bounds["maximum"]) if "maximum" in c.bounds else None,
                "n_enum": len(c.enum_values) if c.enum_values else None,
            }
        )
    return pa.table(
        {
            "col": pa.array([r["col"] for r in rows], pa.string()),
            "nullable": pa.array([r["nullable"] for r in rows], pa.bool_()),
            "vmin": pa.array([r["vmin"] for r in rows], pa.float64()),
            "vmax": pa.array([r["vmax"] for r in rows], pa.float64()),
            "n_enum": pa.array([r["n_enum"] for r in rows], pa.int64()),
        }
    )


SQL_INFER_CONTRACT = """
SELECT 'l_extendedprice' AS col, FALSE AS nullable,
       MIN(l_extendedprice) AS vmin, MAX(l_extendedprice) AS vmax,
       CAST(NULL AS BIGINT) AS n_enum
FROM lineitem
UNION ALL
SELECT 'l_linestatus', FALSE, NULL, NULL, COUNT(DISTINCT l_linestatus)
FROM lineitem
UNION ALL
SELECT 'l_quantity', FALSE, MIN(l_quantity), MAX(l_quantity), NULL
FROM lineitem
UNION ALL
SELECT 'l_returnflag', FALSE, NULL, NULL, COUNT(DISTINCT l_returnflag)
FROM lineitem
"""

QUERIES["infer_contract"] = (q_infer_contract, SQL_INFER_CONTRACT)


def q_bucketed_join(sf_dir: str) -> Any:
    """Bucketed-storage join (stages/bucketed.py): orders and lineitem
    are each written ONCE hash-bucketed on the order key (the ingest-
    time exchange); the revenue-per-priority join then reads bucket i
    of both sides in one task and joins locally — ZERO movement at
    query time, the Hive/Spark bucketed layout. Exact cents oracle."""
    import shutil

    import polars as pl

    from patito_ray.stages.bucketed import bucketed_join, bucketed_write

    base = _tmp_dir("bucketed", sf_dir)
    shutil.rmtree(base, ignore_errors=True)
    bucketed_write(
        _rp(sf_dir, "orders", ["o_orderkey", "o_orderpriority"]),
        "o_orderkey",
        f"{base}/orders",
        num_buckets=32,
    )
    bucketed_write(
        _rp(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice"]).map_batches(
            lambda t: pa.table(
                {
                    "l_orderkey": t.column("l_orderkey"),
                    "cents": pa.array(
                        np.floor(
                            t.column("l_extendedprice").to_numpy(zero_copy_only=False)
                            * 100.0
                            + 0.5
                        ).astype(np.int64),
                        pa.int64(),
                    ),
                }
            ),
            batch_format="pyarrow",
            batch_size=None,
        ),
        "l_orderkey",
        f"{base}/lineitem",
        num_buckets=32,
    )

    joined = bucketed_join(f"{base}/orders", f"{base}/lineitem", how="inner")

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "o_orderpriority" not in t.column_names:
            return pa.table(
                {
                    "o_orderpriority": pa.array([], pa.string()),
                    "cents": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        return (
            pl.from_arrow(t.select(["o_orderpriority", "cents"]))
            .group_by("o_orderpriority")
            .agg(pl.col("cents").sum(), pl.len().cast(pl.Int64).alias("n"))
            .to_arrow()
        )

    merged = merge_partial_sums(
        joined.map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["o_orderpriority"],
        ["cents", "n"],
    )
    schema = pa.schema(
        [("o_orderpriority", pa.string()), ("cents", pa.int64()), ("n", pa.int64())]
    )
    return _apply(merged, lambda t: t.select(schema.names).cast(schema))


SQL_BUCKETED_JOIN = """
SELECT o_orderpriority,
       CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS cents,
       CAST(COUNT(*) AS BIGINT) AS n
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
"""

QUERIES["bucketed_join"] = (q_bucketed_join, SQL_BUCKETED_JOIN)


def q_skyline_parts(sf_dir: str) -> Any:
    """2-D skyline (Pareto frontier) over part: the parts no other part
    beats on BOTH price (cheaper-or-equal) and size (bigger-or-equal,
    one strict). Exact-integer contract: price snapped to cents on both
    engines. Distributes with ZERO exchange — one map_batches prunes
    each block to its local frontier, tiny survivors merge once
    (functions/skyline.py)."""
    from patito_ray.functions.skyline import skyline_2d

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p_partkey": t.column("p_partkey"),
                "cents": pa.array(
                    np.floor(
                        t.column("p_retailprice").to_numpy(zero_copy_only=False)
                        * 100.0
                        + 0.5
                    ).astype(np.int64),
                    pa.int64(),
                ),
                "size": pc.cast(t.column("p_size"), pa.int64()),
            }
        )

    ds = _rp(sf_dir, "part", ["p_partkey", "p_retailprice", "p_size"]).map_batches(
        prep, batch_format="pyarrow", batch_size=None
    )
    return skyline_2d(ds, minimize="cents", maximize="size")


SQL_SKYLINE_PARTS = """
WITH p AS (
  SELECT p_partkey,
         CAST(FLOOR(p_retailprice * 100 + 0.5) AS BIGINT) AS cents,
         CAST(p_size AS BIGINT) AS size
  FROM part
)
SELECT a.p_partkey, a.cents, a.size
FROM p a
WHERE NOT EXISTS (
  SELECT 1 FROM p b
  WHERE b.cents <= a.cents AND b.size >= a.size
    AND (b.cents < a.cents OR b.size > a.size)
)
"""

QUERIES["skyline_parts"] = (q_skyline_parts, SQL_SKYLINE_PARTS)


def q_basket_rules(sf_dir: str) -> Any:
    """Directed association rules over order baskets (support /
    confidence / lift from exact int64 counts; the float ops mirror the
    SQL expression order, so the doubles are bit-identical — no
    rounding). Same single hash exchange as basket_pairs; item
    marginals are the broadcast small side
    (functions/basket.py:association_rules)."""
    from patito_ray.functions.basket import association_rules

    li = _rp(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    return association_rules(li, "l_orderkey", "l_partkey", min_pair_count=2)


SQL_BASKET_RULES = """
WITH items AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i FROM lineitem),
tot AS (SELECT COUNT(DISTINCT g) AS n FROM items),
ic AS (SELECT i, CAST(COUNT(*) AS BIGINT) AS cnt FROM items GROUP BY i),
pairs AS (
  SELECT a.i AS item_a, b.i AS item_b, CAST(COUNT(*) AS BIGINT) AS n_ab
  FROM items a JOIN items b ON a.g = b.g AND a.i < b.i
  GROUP BY 1, 2
  HAVING COUNT(*) >= 2
),
dir AS (
  SELECT item_a AS ante, item_b AS cons, n_ab FROM pairs
  UNION ALL
  SELECT item_b, item_a, n_ab FROM pairs
)
SELECT d.ante, d.cons, d.n_ab, ia.cnt AS n_ante, ib.cnt AS n_cons,
       CAST(d.n_ab AS DOUBLE) / (SELECT n FROM tot) AS support,
       CAST(d.n_ab AS DOUBLE) / ia.cnt AS confidence,
       (CAST(d.n_ab AS DOUBLE) * (SELECT n FROM tot))
         / (CAST(ia.cnt AS DOUBLE) * ib.cnt) AS lift
FROM dir d
JOIN ic ia ON d.ante = ia.i
JOIN ic ib ON d.cons = ib.i
"""

QUERIES["basket_rules"] = (q_basket_rules, SQL_BASKET_RULES)


def q_rolling_zscore(sf_dir: str) -> Any:
    """Rolling z-score anomaly detection: events whose value deviates
    > 3 sigma from their user's trailing 5-event window. PURE-INTEGER
    contract — the |z| > 3 test is rewritten as
    (w*x - s1)^2 > 9*(w*s2 - s1^2) over exact cent/window sums, so the
    result is bit-exact with zero float ops. One hash exchange
    (stages/window.py:window_over), vectorized polars frames."""
    from patito_ray.stages.window import window_over

    def prep(t: pa.Table) -> pa.Table:
        x = np.floor(
            t.column("value").to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "event_id": t.column("event_id"),
                "ts": t.column("ts"),
                "x": pa.array(x, pa.int64()),
                "x2": pa.array(x * x, pa.int64()),
            }
        )

    ds = _rp(sf_dir, "events", ["user_id", "event_id", "ts", "value"]).map_batches(
        prep, batch_format="pyarrow", batch_size=None
    )
    out = window_over(
        ds,
        by="user_id",
        order=["ts", "event_id"],
        cols={
            "s1": ("rolling_sum", "x"),
            "s2": ("rolling_sum", "x2"),
            "rn": ("row_number", None),
        },
        frame=5,
    )

    _schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("event_id", pa.int64()),
            ("x", pa.int64()),
            ("w", pa.int64()),
            ("s1", pa.int64()),
            ("s2", pa.int64()),
        ]
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "rn" not in t.column_names:
            return _schema.empty_table()
        x = t.column("x").to_numpy(zero_copy_only=False)
        s1 = t.column("s1").to_numpy(zero_copy_only=False)
        s2 = t.column("s2").to_numpy(zero_copy_only=False)
        w = np.minimum(t.column("rn").to_numpy(zero_copy_only=False), 5)
        d = w * x - s1
        mask = (w >= 2) & (4 * d * d > 9 * (w * s2 - s1 * s1))
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "event_id": t.column("event_id"),
                "x": t.column("x"),
                "w": pa.array(w, pa.int64()),
                "s1": t.column("s1"),
                "s2": t.column("s2"),
            }
        ).filter(pa.array(mask))

    return out.map_batches(finish, batch_format="pyarrow", batch_size=None)


SQL_ROLLING_ZSCORE = """
WITH q AS (
  SELECT user_id, event_id, ts,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS x
  FROM events
),
w AS (
  SELECT user_id, event_id, x,
         CAST(COUNT(*) OVER win AS BIGINT) AS w,
         CAST(SUM(x) OVER win AS BIGINT) AS s1,
         CAST(SUM(x * x) OVER win AS BIGINT) AS s2
  FROM q
  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
)
SELECT user_id, event_id, x, w, s1, s2
FROM w
WHERE w >= 2 AND 4*(w*x - s1)*(w*x - s1) > 9*(w*s2 - s1*s1)
"""

QUERIES["rolling_zscore"] = (q_rolling_zscore, SQL_ROLLING_ZSCORE)


def q_event_moments(sf_dir: str) -> Any:
    """Grouped skewness/kurtosis per event type from ONE streaming
    moment pass: per-batch exact int64 sums of x^1..x^4 on the
    floor(value) integer grid, adaptive partial merge, then the
    central-moment doubles via an expression tree mirrored token-for-
    token in the SQL oracle (only IEEE +,-,*,/,sqrt — bit-identical,
    no rounding). Overflow contract: |x| <= 1024 so x^4 sums stay in
    int64 for >= 8e6 rows/group-batch (checked loudly)."""
    import polars as pl

    def partial(t: pa.Table) -> pa.Table:
        x = np.floor(t.column("value").to_numpy(zero_copy_only=False)).astype(
            np.int64
        )
        if x.size and int(np.abs(x).max()) > 1024:
            raise ValueError(
                "event_moments: |floor(value)| > 1024 breaks the int64 "
                "x^4-sum overflow budget; rescale the grid"
            )
        x2 = x * x
        return (
            pl.DataFrame(
                {
                    "event_type": t.column("event_type").to_pylist(),
                    "x": x,
                    "x2": x2,
                    "x3": x2 * x,
                    "x4": x2 * x2,
                }
            )
            .group_by("event_type")
            .agg(
                pl.len().cast(pl.Int64).alias("n"),
                pl.col("x").sum().alias("s1"),
                pl.col("x2").sum().alias("s2"),
                pl.col("x3").sum().alias("s3"),
                pl.col("x4").sum().alias("s4"),
            )
            .to_arrow()
        )

    ds = _rp(sf_dir, "events", ["event_type", "value"]).map_batches(
        partial, batch_format="pyarrow", batch_size=None
    )
    merged = merge_partial_sums(
        ds, ["event_type"], ["n", "s1", "s2", "s3", "s4"]
    )

    _schema = pa.schema(
        [
            ("event_type", pa.string()),
            ("n", pa.int64()),
            ("m2", pa.float64()),
            ("skewness", pa.float64()),
            ("kurtosis", pa.float64()),
        ]
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "event_type" not in t.column_names:
            return _schema.empty_table()
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        s1 = t.column("s1").to_numpy(zero_copy_only=False).astype(np.float64)
        s2 = t.column("s2").to_numpy(zero_copy_only=False).astype(np.float64)
        s3 = t.column("s3").to_numpy(zero_copy_only=False).astype(np.float64)
        s4 = t.column("s4").to_numpy(zero_copy_only=False).astype(np.float64)
        m = s1 / n
        r2 = s2 / n
        r3 = s3 / n
        r4 = s4 / n
        m2 = r2 - m * m
        m3 = r3 - 3.0 * m * r2 + 2.0 * m * m * m
        m4 = r4 - 4.0 * m * r3 + 6.0 * m * m * r2 - 3.0 * m * m * m * m
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "n": t.column("n"),
                "m2": m2,
                "skewness": m3 / (m2 * np.sqrt(m2)),
                "kurtosis": m4 / (m2 * m2),
            }
        ).cast(_schema)

    return _apply(merged, finish)


SQL_EVENT_MOMENTS = """
WITH q AS (
  SELECT event_type, CAST(FLOOR(value) AS BIGINT) AS x FROM events
),
s AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS DOUBLE) AS s1,
         CAST(SUM(x*x) AS DOUBLE) AS s2,
         CAST(SUM(x*x*x) AS DOUBLE) AS s3,
         CAST(SUM(x*x*x*x) AS DOUBLE) AS s4
  FROM q GROUP BY event_type
),
r AS (
  SELECT event_type, n,
         s1 / CAST(n AS DOUBLE) AS m,
         s2 / CAST(n AS DOUBLE) AS r2,
         s3 / CAST(n AS DOUBLE) AS r3,
         s4 / CAST(n AS DOUBLE) AS r4
  FROM s
),
c AS (
  SELECT event_type, n, m,
         r2 - m*m AS m2,
         r3 - 3.0*m*r2 + 2.0*m*m*m AS m3,
         r4 - 4.0*m*r3 + 6.0*m*m*r2 - 3.0*m*m*m*m AS m4
  FROM r
)
SELECT event_type, n, m2,
       m3 / (m2 * SQRT(m2)) AS skewness,
       m4 / (m2 * m2) AS kurtosis
FROM c
"""

QUERIES["event_moments"] = (q_event_moments, SQL_EVENT_MOMENTS)


def q_survival_counts(sf_dir: str) -> Any:
    """Survival curve: for each day d in 0..30, how many users were
    still active d+ days after their first event (lifespan = last
    event date - first event date, exact integer days). Per-batch
    (min_day, -max_day) partials merge through merge_partial_mins;
    the 31-row curve is a cumulative-from-above histogram."""
    import polars as pl

    from patito_ray.stages.agg import merge_partial_mins

    US_PER_DAY = np.int64(86_400_000_000)

    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
        day = us // US_PER_DAY
        return (
            pl.DataFrame(
                {
                    "user_id": t.column("user_id").to_numpy(zero_copy_only=False),
                    "min_day": day,
                    "neg_max_day": -day,
                }
            )
            .group_by("user_id")
            .agg(pl.col("min_day").min(), pl.col("neg_max_day").min())
            .to_arrow()
        )

    ds = _rp(sf_dir, "events", ["user_id", "ts"]).map_batches(
        partial, batch_format="pyarrow", batch_size=None
    )
    merged = merge_partial_mins(ds, ["user_id"], ["min_day", "neg_max_day"])

    def hist(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "min_day" not in t.column_names:
            return pa.table(
                {"life": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())}
            )
        life = (
            -t.column("neg_max_day").to_numpy(zero_copy_only=False)
        ) - t.column("min_day").to_numpy(zero_copy_only=False)
        counts = np.bincount(np.minimum(life, 30), minlength=31).astype(np.int64)
        return pa.table(
            {"life": np.arange(31, dtype=np.int64), "cnt": counts}
        )

    if isinstance(merged, pa.Table):
        h = hist(merged)
    else:
        h = merge_partial_sums(
            merged.map_batches(hist, batch_format="pyarrow", batch_size=None),
            ["life"],
            ["cnt"],
        )
        if not isinstance(h, pa.Table):
            from patito_ray.stages.agg import collect_table

            h = collect_table(h)

    full = np.zeros(31, dtype=np.int64)
    life = h.column("life").to_numpy(zero_copy_only=False)
    cnt = h.column("cnt").to_numpy(zero_copy_only=False)
    full[life] = cnt
    surv = np.cumsum(full[::-1])[::-1]
    return pa.table(
        {
            "day": np.arange(31, dtype=np.int64),
            "n_surviving": surv.astype(np.int64),
        }
    )


SQL_SURVIVAL_COUNTS = """
WITH u AS (
  SELECT user_id,
         CAST(MAX(CAST(ts AS DATE)) - MIN(CAST(ts AS DATE)) AS BIGINT) AS life
  FROM events GROUP BY user_id
),
d AS (SELECT UNNEST(RANGE(0, 31)) AS day)
SELECT CAST(d.day AS BIGINT) AS day,
       CAST((SELECT COUNT(*) FROM u WHERE u.life >= d.day) AS BIGINT)
         AS n_surviving
FROM d
"""

QUERIES["survival_counts"] = (q_survival_counts, SQL_SURVIVAL_COUNTS)


def q_unique_index(sf_dir: str) -> pa.Table:
    """Persisted cross-run uniqueness: the previous crawl's (doc_id % 10
    == 7) text hashes are folded into an on-disk bucketed key index;
    checking the full corpus against it then costs one narrow exchange
    over the delta + touched-bucket reads — never a rescan of past
    corpora (state/keyindex.py). Summary ints are exact."""
    import shutil

    from patito_ray.state.keyindex import create_key_index, key_index_update

    idx = _tmp_dir("keyindex", sf_dir)
    shutil.rmtree(idx, ignore_errors=True)
    create_key_index(idx, num_buckets=16)

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])

    def pick_prev(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % 10 == 7))

    key_index_update(
        ds.map_batches(pick_prev, batch_format="pyarrow", batch_size=None),
        "text",
        idx,
        fold=True,
    )
    return key_index_update(ds, "text", idx, fold=False)


SQL_UNIQUE_INDEX = """
WITH prev AS (SELECT DISTINCT text FROM documents WHERE doc_id % 10 = 7),
cnt AS (SELECT text, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY text),
m AS (
  SELECT c.n, (p.text IS NOT NULL) AS seen
  FROM cnt c LEFT JOIN prev p ON c.text = p.text
)
SELECT CAST(SUM(n) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS distinct_keys,
       CAST(SUM(CASE WHEN NOT seen THEN 1 ELSE 0 END) AS BIGINT) AS new_keys,
       CAST(SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS dup_keys_within_run,
       CAST(SUM(n) - COUNT(*) AS BIGINT) AS dup_rows_within_run,
       CAST(SUM(CASE WHEN seen THEN 1 ELSE 0 END) AS BIGINT)
         AS dup_keys_vs_index,
       CAST(SUM(CASE WHEN seen THEN n ELSE 0 END) AS BIGINT)
         AS dup_rows_vs_index
FROM m
"""

QUERIES["unique_index"] = (q_unique_index, SQL_UNIQUE_INDEX)


def q_cusum_revenue(sf_dir: str) -> pa.Table:
    """CUSUM changepoint scan over daily order revenue: flags days
    where the one-sided cumulative deviation above the global mean
    daily revenue exceeds 10x that mean. The recurrence max(0, prev +
    (r - mean)) is rewritten as S_d - min_{j<=d} S_j (cumsum minus
    running min) — pure integer cents, bit-exact vs the SQL window
    form. Daily sums stream through the adaptive partial merge; the
    scan itself runs over the calendar (<= a few thousand rows —
    bounded regardless of corpus size)."""
    import polars as pl

    def partial(t: pa.Table) -> pa.Table:
        cents = np.floor(
            t.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        return (
            pl.DataFrame({"d": t.column("o_orderdate").to_numpy(), "r": cents})
            .group_by("d")
            .agg(pl.col("r").sum())
            .to_arrow()
        )

    ds = _rp(sf_dir, "orders", ["o_orderdate", "o_totalprice"]).map_batches(
        partial, batch_format="pyarrow", batch_size=None
    )
    merged = merge_partial_sums(ds, ["d"], ["r"])
    cusum_schema = pa.schema(
        [("d", pa.timestamp("us")), ("r", pa.int64()), ("cusum", pa.int64())]
    )
    if not isinstance(merged, pa.Table):
        from patito_ray.stages.agg import collect_table

        # calendar-bounded: #days rows, never corpus-sized
        merged = collect_table(
            merged, empty_schema=pa.schema([("d", pa.timestamp("us")), ("r", pa.int64())])
        )
    if merged.num_rows == 0:
        return cusum_schema.empty_table()

    order = np.argsort(merged.column("d").to_numpy(zero_copy_only=False))
    d = merged.column("d").to_numpy(zero_copy_only=False)[order]
    r = merged.column("r").to_numpy(zero_copy_only=False)[order]
    target = int(r.sum()) // r.size
    s = np.cumsum(r - target)
    cusum = s - np.minimum.accumulate(s)
    mask = cusum > 10 * target
    return pa.table(
        {
            # already timestamp[us] in the corpus — keep it lossless
            # (DuckDB DATE/TIMESTAMP comes back as datetime64; a date32
            # round-trip would silently truncate sub-day components)
            "d": pa.array(d[mask], pa.timestamp("us")),
            "r": pa.array(r[mask], pa.int64()),
            "cusum": pa.array(cusum[mask], pa.int64()),
        },
        schema=cusum_schema,
    )


SQL_CUSUM_REVENUE = """
WITH daily AS (
  SELECT o_orderdate AS d,
         CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS r
  FROM orders GROUP BY 1
),
tot AS (SELECT CAST(SUM(r) AS BIGINT) AS tr, CAST(COUNT(*) AS BIGINT) AS nd
        FROM daily),
c AS (
  SELECT d, r,
         CAST(SUM(r - (SELECT tr // nd FROM tot)) OVER (ORDER BY d) AS BIGINT)
           AS s
  FROM daily
),
m AS (SELECT d, r, s, CAST(MIN(s) OVER (ORDER BY d) AS BIGINT) AS smin FROM c)
SELECT d, r, s - smin AS cusum
FROM m WHERE s - smin > 10 * (SELECT tr // nd FROM tot)
"""

QUERIES["cusum_revenue"] = (q_cusum_revenue, SQL_CUSUM_REVENUE)


def q_abc_parts(sf_dir: str) -> Any:
    """ABC (Pareto) classification: rank parts by lineitem revenue,
    class A = parts within the first 80% of cumulative revenue, B to
    95%, C after — thresholds tested as pure-integer inequalities
    (5*cum <= 4*total etc). The ranked cumulative sum is the
    distributed ordered_prefix_sum (range-partitioned, one narrow
    exchange) — no single-task global window."""
    import ray.data as rd

    from patito_ray.stages.prefix import ordered_prefix_sum

    def partial(t: pa.Table) -> pa.Table:
        import polars as pl

        cents = np.floor(
            t.column("l_extendedprice").to_numpy(zero_copy_only=False) * 100.0
            + 0.5
        ).astype(np.int64)
        return (
            pl.DataFrame(
                {
                    "l_partkey": t.column("l_partkey").to_numpy(
                        zero_copy_only=False
                    ),
                    "cents": cents,
                }
            )
            .group_by("l_partkey")
            .agg(pl.col("cents").sum())
            .to_arrow()
        )

    ds = _rp(sf_dir, "lineitem", ["l_partkey", "l_extendedprice"]).map_batches(
        partial, batch_format="pyarrow", batch_size=None
    )
    merged = merge_partial_sums(ds, ["l_partkey"], ["cents"])
    if isinstance(merged, pa.Table):
        total = int(merged.column("cents").to_numpy(zero_copy_only=False).sum())
        per_part = rd.from_arrow(merged)
    else:
        per_part = merged.materialize()
        from patito_ray.stages.agg import collect_table

        def block_total(t: pa.Table) -> pa.Table:
            s = (
                int(t.column("cents").to_numpy(zero_copy_only=False).sum())
                if t.num_rows and "cents" in t.column_names
                else 0
            )
            return pa.table({"s": pa.array([s], pa.int64())})

        # one 8-byte row per block reaches the driver — never the
        # dimension-sized merged table itself
        totals = collect_table(
            per_part.map_batches(
                block_total, batch_format="pyarrow", batch_size=None
            ),
            empty_schema=pa.schema([("s", pa.int64())]),
        )
        total = int(totals.column("s").to_numpy(zero_copy_only=False).sum())

    def neg(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "cents" not in t.column_names:
            return pa.table(
                {
                    "l_partkey": pa.array([], pa.int64()),
                    "cents": pa.array([], pa.int64()),
                    "neg_cents": pa.array([], pa.int64()),
                }
            )
        return t.append_column(
            "neg_cents",
            pc.negate_checked(t.column("cents")),
        )

    pref = ordered_prefix_sum(
        per_part.map_batches(neg, batch_format="pyarrow", batch_size=None),
        order_col="neg_cents",
        value_col="cents",
        out_col="offset",
        tie_col="l_partkey",
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "offset" not in t.column_names:
            return pa.schema(
                [
                    ("l_partkey", pa.int64()),
                    ("cents", pa.int64()),
                    ("cum", pa.int64()),
                    ("klass", pa.string()),
                ]
            ).empty_table()
        cents = t.column("cents").to_numpy(zero_copy_only=False)
        cum = t.column("offset").to_numpy(zero_copy_only=False) + cents
        klass = np.where(
            5 * cum <= 4 * total, "A", np.where(20 * cum <= 19 * total, "B", "C")
        )
        return pa.table(
            {
                "l_partkey": t.column("l_partkey"),
                "cents": t.column("cents"),
                "cum": pa.array(cum, pa.int64()),
                "klass": pa.array(klass.tolist(), pa.string()),
            }
        )

    return pref.map_batches(finish, batch_format="pyarrow", batch_size=None)


SQL_ABC_PARTS = """
WITH pr AS (
  SELECT l_partkey,
         CAST(SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents
  FROM lineitem GROUP BY 1
),
tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS t FROM pr),
r AS (
  SELECT l_partkey, cents,
         CAST(SUM(cents) OVER (ORDER BY cents DESC, l_partkey) AS BIGINT) AS cum
  FROM pr
)
SELECT l_partkey, cents, cum,
       CASE WHEN 5*cum <= 4*(SELECT t FROM tot) THEN 'A'
            WHEN 20*cum <= 19*(SELECT t FROM tot) THEN 'B'
            ELSE 'C' END AS klass
FROM r
"""

QUERIES["abc_parts"] = (q_abc_parts, SQL_ABC_PARTS)


def q_daily_autocorr(sf_dir: str) -> pa.Table:
    """Periodicity probe: per event type, the lag-k co-count
    sum(c_d * c_{d+k}) of daily event counts for k = 1..7 — exact
    integers (a missing day is an implicit zero on both engines).
    Daily counts ride the adaptive partial merge; the lag products run
    over the calendar (#days x #types, bounded)."""
    import polars as pl

    US_PER_DAY = np.int64(86_400_000_000)

    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
        return (
            pl.DataFrame(
                {
                    "event_type": t.column("event_type").to_pylist(),
                    "day": us // US_PER_DAY,
                }
            )
            .group_by(["event_type", "day"])
            .agg(pl.len().cast(pl.Int64).alias("c"))
            .to_arrow()
        )

    ds = _rp(sf_dir, "events", ["event_type", "ts"]).map_batches(
        partial, batch_format="pyarrow", batch_size=None
    )
    merged = merge_partial_sums(ds, ["event_type", "day"], ["c"])
    if not isinstance(merged, pa.Table):
        from patito_ray.stages.agg import collect_table

        merged = collect_table(  # calendar-bounded
            merged,
            empty_schema=pa.schema(
                [("event_type", pa.string()), ("day", pa.int64()), ("c", pa.int64())]
            ),
        )

    types: list[str] = []
    lags: list[int] = []
    sxys: list[int] = []
    df = merged.to_pydict()
    et = np.asarray(df["event_type"])
    day = np.asarray(df["day"], dtype=np.int64)
    c = np.asarray(df["c"], dtype=np.int64)
    for typ in sorted(set(et.tolist())):
        m = et == typ
        d_t, c_t = day[m], c[m]
        order = np.argsort(d_t)
        d_t, c_t = d_t[order], c_t[order]
        for k in range(1, 8):
            idx = np.searchsorted(d_t, d_t + k)
            ok = (idx < d_t.size) & (d_t[np.minimum(idx, d_t.size - 1)] == d_t + k)
            if not ok.any():
                # the SQL inner join emits NO row for a lag with no
                # matching day pair — mirror that, don't emit sxy=0
                continue
            types.append(typ)
            lags.append(k)
            sxys.append(int((c_t[ok] * c_t[np.minimum(idx, d_t.size - 1)][ok]).sum()))
    return pa.table(
        {
            "event_type": pa.array(types, pa.string()),
            "lag": pa.array(lags, pa.int64()),
            "sxy": pa.array(sxys, pa.int64()),
        }
    )


SQL_DAILY_AUTOCORR = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
k AS (SELECT UNNEST(RANGE(1, 8)) AS lag)
SELECT a.event_type, CAST(k.lag AS BIGINT) AS lag,
       CAST(SUM(a.c * b.c) AS BIGINT) AS sxy
FROM daily a
JOIN k ON TRUE
JOIN daily b
  ON b.event_type = a.event_type AND b.d = a.d + CAST(k.lag AS INTEGER)
GROUP BY 1, 2
"""

QUERIES["daily_autocorr"] = (q_daily_autocorr, SQL_DAILY_AUTOCORR)


def q_decayed_value(sf_dir: str) -> Any:
    """Truncated dyadic EWMA per customer: over each customer's 16 most
    recent orders (by date desc, orderkey asc tie), the decayed score
    sum(cents_k * 2^(16-rank_k)) — pure int64 (weight halves with age,
    alpha=1/2 truncated at 16 lags), so both engines compute identical
    integers. The recency top-16 rides the grouped_top_k spine
    (per-batch prune to <= 16 rows/customer, then ONE hash exchange);
    the weighted fold merges through the adaptive partial-sum merge."""
    from patito_ray.stages.topk import grouped_top_k

    ds = _rp(
        sf_dir,
        "orders",
        ["o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"],
    )

    def prep(t: pa.Table) -> pa.Table:
        # timestamp[us] -> int64 microseconds (ordering-equivalent)
        us = pc.cast(t.column("o_orderdate"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        cents = np.floor(
            t.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "o_custkey": t.column("o_custkey"),
                "days": pa.array(us, pa.int64()),
                "o_orderkey": t.column("o_orderkey"),
                "cents": pa.array(cents, pa.int64()),
            }
        )

    top = grouped_top_k(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        group="o_custkey",
        value="days",
        k=16,
        tie="o_orderkey",
    )

    def contrib(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "rank" not in t.column_names:
            return pa.schema(
                [("o_custkey", pa.int64()), ("decayed", pa.int64())]
            ).empty_table()
        rank = t.column("rank").to_numpy(zero_copy_only=False)
        cents = t.column("cents").to_numpy(zero_copy_only=False)
        weighted = cents * np.left_shift(np.int64(1), 16 - rank)
        return pa.table(
            {
                "o_custkey": pc.cast(t.column("o_custkey"), pa.int64()),
                "decayed": pa.array(weighted, pa.int64()),
            }
        )

    merged = merge_partial_sums(
        top.map_batches(contrib, batch_format="pyarrow", batch_size=None),
        ["o_custkey"],
        ["decayed"],
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "o_custkey" not in t.column_names:
            return pa.schema(
                [("o_custkey", pa.int64()), ("decayed", pa.int64())]
            ).empty_table()
        return pa.table(
            {
                "o_custkey": pc.cast(t.column("o_custkey"), pa.int64()),
                "decayed": pc.cast(t.column("decayed"), pa.int64()),
            }
        )

    return _apply(merged, finish)


SQL_DECAYED_VALUE = """
WITH o AS (
  SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
         CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS cents,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate DESC, o_orderkey) AS rn
  FROM orders
)
SELECT o_custkey,
       CAST(SUM(cents * (CAST(1 AS BIGINT) << (16 - rn))) AS BIGINT) AS decayed
FROM o WHERE rn <= 16 GROUP BY 1
"""

QUERIES["decayed_value"] = (q_decayed_value, SQL_DECAYED_VALUE)


def q_sssp_weighted(sf_dir: str) -> Any:
    """Multi-source bounded-hop weighted shortest path: minimum total
    edge weight within <= 4 hops from the seed set (doc_id % 97 == 0)
    over the deterministic weighted link graph. Bellman-Ford rounds
    track strict improvements; adaptive frontier-broadcast vs
    co-partitioned relaxation (functions/graph.py:sssp_hops). Oracle:
    recursive CTE over the identical splitmix64 edge+weight
    derivation."""
    from patito_ray.functions.graph import sssp_hops

    edges, _n = _doc_link_edges(sf_dir, 3, with_weight=True)
    docs = _rp(sf_dir, "documents", ["doc_id"])

    def mk_seeds(t: pa.Table) -> pa.Table:
        ids = pc.cast(t.column("doc_id"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        return pa.table({"node": pa.array(ids[ids % 97 == 0], type=pa.int64())})

    seeds = docs.map_batches(mk_seeds, batch_format="pyarrow", batch_size=None)
    return sssp_hops(edges, seeds, max_hops=4)


SQL_SSSP_WEIGHTED = f"""
WITH RECURSIVE
{_sql_link_edges(3, with_weight=True)},
paths(node, dist, hops) AS (
  SELECT doc_id, CAST(0 AS BIGINT), 0 FROM documents WHERE doc_id % 97 = 0
  UNION
  SELECT e.dst, p.dist + e.w, p.hops + 1
  FROM paths p JOIN edges e ON e.src = p.node
  WHERE p.hops < 4
)
SELECT node, CAST(MIN(dist) AS BIGINT) AS dist FROM paths GROUP BY node
"""

QUERIES["sssp_weighted"] = (q_sssp_weighted, SQL_SSSP_WEIGHTED)


def q_theilsen_trend(sf_dir: str) -> Any:
    """Theil-Sen robust trend per customer: the MEDIAN of all pairwise
    slopes (cents_b - cents_a) / (day_b - day_a) over the customer's
    orders (equal-day pairs dropped — slope undefined). ONE hash
    exchange co-locates each customer's orders; inside each partition
    the pair set is generated with the vectorized offset scan
    (graph._run_pairs — no per-customer Python) and per-group medians
    come from one lexsort + offset selection. Slopes are single IEEE
    divisions of exact integers and np.median's mean-of-two-middles is
    bit-identical to DuckDB MEDIAN (dev-notes precedent) — NO rounding
    anywhere. Assumes per-customer order counts are bounded (pair count
    is quadratic per group — Theil-Sen's inherent cost)."""
    from patito_ray.functions.graph import _run_pairs
    from patito_ray.stages.exchange import hash_partition_ids
    from patito_ray.stages.join import default_num_partitions

    P = default_num_partitions()
    ds = _rp(
        sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice"]
    )
    US_PER_DAY = np.int64(86_400_000_000)

    def prep(t: pa.Table) -> pa.Table:
        cust = pc.cast(t.column("o_custkey"), pa.int64())
        day = (
            pc.cast(t.column("o_orderdate"), pa.int64()).to_numpy(
                zero_copy_only=False
            )
            // US_PER_DAY
        )
        cents = np.floor(
            t.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        part = hash_partition_ids(cust, P, "theilsen customer key")
        return pa.table(
            {
                "part": pa.array(part, pa.int64()),
                "cust": cust,
                "day": pa.array(day, pa.int64()),
                "cents": pa.array(cents, pa.int64()),
            }
        )

    out_schema = pa.schema([("o_custkey", pa.int64()), ("slope", pa.float64())])

    def ts_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "cust" not in t.column_names:
            return out_schema.empty_table()
        cust = t.column("cust").to_numpy(zero_copy_only=False)
        day = t.column("day").to_numpy(zero_copy_only=False)
        cents = t.column("cents").to_numpy(zero_copy_only=False)
        order = np.lexsort((day, cust))
        cust, day, cents = cust[order], day[order], cents[order]
        ia, ib = _run_pairs(cust, np.arange(len(cust), dtype=np.int64))
        if len(ia) == 0:
            return out_schema.empty_table()
        dd = day[ib] - day[ia]
        m = dd != 0
        if not m.any():
            return out_schema.empty_table()
        slope = (cents[ib[m]] - cents[ia[m]]).astype(np.float64) / dd[m].astype(
            np.float64
        )
        g = cust[ia[m]]
        o2 = np.lexsort((slope, g))
        g, slope = g[o2], slope[o2]
        uniq, starts, counts = np.unique(g, return_index=True, return_counts=True)
        hi = starts + counts // 2
        med = slope[hi].copy()
        even = counts % 2 == 0
        med[even] = (slope[hi[even] - 1] + slope[hi[even]]) / 2.0
        return pa.table(
            {
                "o_custkey": pa.array(uniq, pa.int64()),
                "slope": pa.array(med, pa.float64()),
            },
            schema=out_schema,
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None)
        .groupby("part")
        .map_groups(ts_part, batch_format="pyarrow")
    )


SQL_THEILSEN_TREND = """
WITH o AS (
  SELECT CAST(o_custkey AS BIGINT) AS cust,
         CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day,
         CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS cents
  FROM orders
),
p AS (
  SELECT a.cust,
         CAST(b.cents - a.cents AS DOUBLE) / CAST(b.day - a.day AS DOUBLE)
           AS slope
  FROM o a JOIN o b ON a.cust = b.cust AND a.day < b.day
)
SELECT cust AS o_custkey, MEDIAN(slope) AS slope
FROM p GROUP BY 1
"""

QUERIES["theilsen_trend"] = (q_theilsen_trend, SQL_THEILSEN_TREND)


def q_pca_project(sf_dir: str) -> Any:
    """PCA projection of every embedding onto the top-2 principal
    components (functions/pca.py:pca_project): one moment pass (d^2
    partials), driver eigh, then a second streaming pass with the
    (mean, components) broadcast via ray.put — rows-only (eigenvectors
    are not SQL-expressible); numerical parity with numpy is
    pytest-verified (tests/test_pca.py)."""
    from patito_ray.functions.pca import pca_project

    emb = _rp(sf_dir, "embeddings", ["vec_id", "embedding"])
    return pca_project(emb, "embedding", dim=64, k=2, id_col="vec_id")


QUERIES["pca_project"] = (q_pca_project, None)


def q_snapshot_drift(sf_dir: str) -> Any:
    """Cross-SNAPSHOT distribution drift: PSI between the cents
    distribution at CDC version 2 and version 3 of the snapshot-
    versioned table (sinks.upsert_versioned / snapshot_read — the
    time_travel machinery feeding the psi_drift kernel). Exact integer
    (bin, n_a, n_b) partials through the adaptive merge; PSI is the
    identical IEEE expression on both engines (1e-6 round). The oracle
    replays the merge timeline in SQL like SQL_TIME_TRAVEL."""
    import polars as pl

    from patito_ray.sinks import snapshot_read

    base = _cdc_orders_history(sf_dir, "snapdrift")

    def bins(version: int, col: str) -> Any:
        def part(t: pa.Table, _c=col) -> pa.Table:
            c = t.column("cents").to_numpy(zero_copy_only=False)
            other = "n_b" if _c == "n_a" else "n_a"
            return (
                pl.DataFrame({"bin": c // np.int64(100_000)})
                .group_by("bin")
                .agg(pl.len().cast(pl.Int64).alias(_c))
                .with_columns(pl.lit(0, dtype=pl.Int64).alias(other))
                .to_arrow()
                .select(["bin", "n_a", "n_b"])
            )

        return snapshot_read(base, version=version).map_batches(
            part, batch_format="pyarrow", batch_size=None
        )

    merged = merge_partial_sums(
        bins(2, "n_a").union(bins(3, "n_b")), ["bin"], ["n_a", "n_b"]
    )

    def finish(t: pa.Table) -> pa.Table:
        na = t.column("n_a").to_numpy(zero_copy_only=False).astype(np.float64)
        nb = t.column("n_b").to_numpy(zero_copy_only=False).astype(np.float64)
        ta, tb = na.sum(), nb.sum()
        m = (na > 0) & (nb > 0)
        p = na[m] / ta
        q = nb[m] / tb
        psi = float(((p - q) * np.log(p / q)).sum()) if m.any() else 0.0
        return pa.table(
            {
                "n_bins": pa.array([int(m.sum())], pa.int64()),
                "psi": _r(pa.array([psi], pa.float64()), 6),
            }
        )

    if not isinstance(merged, pa.Table):
        from patito_ray.stages.agg import collect_table

        merged = collect_table(  # bin-bounded, never corpus-sized
            merged,
            empty_schema=pa.schema(
                [("bin", pa.int64()), ("n_a", pa.int64()), ("n_b", pa.int64())]
            ),
        )
    return finish(merged)


SQL_SNAPSHOT_DRIFT = """
WITH base AS (
  SELECT o_orderkey AS k,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
),
v2 AS (
  SELECT CASE WHEN k % 5 = 0 THEN cents + 777 ELSE cents END AS cents
  FROM base
),
v3 AS (
  SELECT CASE WHEN k % 7 = 0 THEN cents + 1000000
              WHEN k % 5 = 0 THEN cents + 777
              ELSE cents END AS cents
  FROM base
),
b AS (
  SELECT bin, SUM(n_a) AS n_a, SUM(n_b) AS n_b FROM (
    SELECT cents // 100000 AS bin, 1 AS n_a, 0 AS n_b FROM v2
    UNION ALL
    SELECT cents // 100000 AS bin, 0 AS n_a, 1 AS n_b FROM v3
  ) GROUP BY 1
),
t AS (
  SELECT CAST(SUM(n_a) AS DOUBLE) AS ta, CAST(SUM(n_b) AS DOUBLE) AS tb
  FROM b
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_bins,
       ROUND(SUM((n_a/(SELECT ta FROM t) - n_b/(SELECT tb FROM t))
                 * LN((n_a/(SELECT ta FROM t)) / (n_b/(SELECT tb FROM t)))),
             6) AS psi
FROM b WHERE n_a > 0 AND n_b > 0
"""

QUERIES["snapshot_drift"] = (q_snapshot_drift, SQL_SNAPSHOT_DRIFT)


def q_hhi_suppliers(sf_dir: str) -> pa.Table:
    """Herfindahl-Hirschman revenue concentration per supplier nation:
    HHI = sum_s c_s^2 / (sum_s c_s)^2 over each nation's suppliers'
    lineitem revenue (cents). Two-level aggregation: the corpus-sized
    pass partial-sums cents per (nation, supplier) with the supplier ->
    nation map BROADCAST via ray.put (dimension-sized); the per-
    supplier totals are dimension-bounded, so the square/normalize
    step runs on the driver in exact arbitrary-precision ints (c^2
    overflows int64 at scale) — the single int->double conversion and
    one IEEE division match DuckDB's HUGEINT->DOUBLE cast bit-for-bit."""
    import ray

    from patito_ray.stages.agg import collect_table

    sup_tab = collect_table(
        _rp(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]),
        empty_schema=pa.schema(
            [("s_suppkey", pa.int64()), ("s_nationkey", pa.int64())]
        ),
    )
    sk = pc.cast(sup_tab.column("s_suppkey"), pa.int64()).to_numpy(
        zero_copy_only=False
    )
    nk = pc.cast(sup_tab.column("s_nationkey"), pa.int64()).to_numpy(
        zero_copy_only=False
    )
    order = np.argsort(sk)
    ref = ray.put({"sk": sk[order], "nk": nk[order]})

    def partial(t: pa.Table, _ref=ref) -> pa.Table:
        import polars as pl

        d = ray.get(_ref)
        s = pc.cast(t.column("l_suppkey"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        idx = np.minimum(np.searchsorted(d["sk"], s), max(len(d["sk"]) - 1, 0))
        # inner-join semantics: a suppkey missing from the dimension is
        # dropped (matches the SQL oracle), never silently mis-mapped
        hit = (d["sk"][idx] == s) if len(d["sk"]) else np.zeros(len(s), bool)
        s, idx = s[hit], idx[hit]
        cents = np.floor(
            t.column("l_extendedprice").to_numpy(zero_copy_only=False)[hit]
            * 100.0
            + 0.5
        ).astype(np.int64)
        return (
            pl.DataFrame({"n": d["nk"][idx], "s": s, "cents": cents})
            .group_by(["n", "s"])
            .agg(pl.col("cents").sum())
            .to_arrow()
        )

    li = _rp(sf_dir, "lineitem", ["l_suppkey", "l_extendedprice"]).map_batches(
        partial, batch_format="pyarrow", batch_size=None
    )
    merged = merge_partial_sums(li, ["n", "s"], ["cents"])
    if not isinstance(merged, pa.Table):
        merged = collect_table(  # dimension-bounded (#suppliers)
            merged,
            empty_schema=pa.schema(
                [("n", pa.int64()), ("s", pa.int64()), ("cents", pa.int64())]
            ),
        )

    n = merged.column("n").to_numpy(zero_copy_only=False)
    c = merged.column("cents").to_numpy(zero_copy_only=False)
    order = np.argsort(n, kind="stable")
    n, c = n[order], c[order]
    uniq, starts, counts = np.unique(n, return_index=True, return_counts=True)
    hhis: "list[float]" = []
    # driver loop over NATIONS (25) x suppliers — dimension-bounded,
    # exact python-int arithmetic (c^2 sums exceed int64)
    for st, ct in zip(starts, counts):
        cs = [int(x) for x in c[st : st + ct]]
        num = sum(x * x for x in cs)
        tot = sum(cs)
        hhis.append(float(num) / (float(tot) * float(tot)))
    return pa.table(
        {
            "s_nationkey": pa.array(uniq, pa.int64()),
            "hhi": pa.array(hhis, pa.float64()),
        }
    )


SQL_HHI_SUPPLIERS = """
WITH ps AS (
  SELECT CAST(s.s_nationkey AS BIGINT) AS n, l.l_suppkey AS s,
         CAST(SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT)
           AS c
  FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
  GROUP BY 1, 2
)
SELECT n AS s_nationkey,
       CAST(SUM(CAST(c AS HUGEINT) * c) AS DOUBLE)
         / (CAST(SUM(CAST(c AS HUGEINT)) AS DOUBLE)
            * CAST(SUM(CAST(c AS HUGEINT)) AS DOUBLE)) AS hhi
FROM ps GROUP BY 1
"""

QUERIES["hhi_suppliers"] = (q_hhi_suppliers, SQL_HHI_SUPPLIERS)
