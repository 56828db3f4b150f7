"""Query registry chunk (round 4, registered LAST — the driver
correctness window pins the first 50 names, so new entries must only
ever append).

Registers: runs_test, ewma_daily, acf_lags, trend_ma, kruskal_wallis,
anova_oneway, levene_bf, permutation_test, soft_dedup_weights,
dsir_weights, completeness_by_source, conditional_referential,
compact_small_files, bh_pairs, edge_jaccard, late_events,
harmonic_centrality, audience_overlap, changepoint_day,
label_separability, srm_check, zipf_slope, ljung_box, adf_test,
grouped_changepoint.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from patito_ray.pipelines.qcommon import (  # noqa: F401
    QUERIES,
    _apply,
    _lazy_norm,
    _one_row,
    _r,
    _ra,
    _rf,
    _rp,
    _tmp_dir,
)

_US_PER_DAY = np.int64(86_400_000_000)


# ---------------------------------------------------------------------------
# shared daily-revenue pass: ONE distributed partial-sum exchange over
# lineitem (narrow: (day, cents) partials per batch), merged adaptively;
# the calendar-bounded result (~#days rows) is driver-resident by design.
# ---------------------------------------------------------------------------


def _daily_lineitem_cents(sf_dir: str, limit_bytes: int | None = None):
    """(day:int64, cents:int64) daily revenue on the exact cents grid,
    sorted by day. Day = shipdate // 86400s, identical to the SQL
    CAST(l_shipdate AS DATE) bucketing (the synthetic dates carry no
    sub-day component hazard: epoch-us floor-div equals date trunc for
    non-negative timestamps)."""
    import polars as pl

    from patito_ray.stages.agg import collect_table, merge_partial_sums

    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("l_shipdate"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        cents = np.floor(
            t.column("l_extendedprice").to_numpy(zero_copy_only=False) * 100.0
            + 0.5
        ).astype(np.int64)
        return (
            pl.DataFrame({"day": us // _US_PER_DAY, "cents": cents})
            .group_by("day")
            .agg(pl.col("cents").sum())
            .to_arrow()
        )

    ds = _rp(sf_dir, "lineitem", ["l_shipdate", "l_extendedprice"]).map_batches(
        partial, batch_format="pyarrow", batch_size=None
    )
    _kw = {} if limit_bytes is None else {"limit_bytes": limit_bytes}
    merged = merge_partial_sums(ds, ["day"], ["cents"], **_kw)
    if not isinstance(merged, pa.Table):
        merged = collect_table(  # calendar-bounded (#days rows)
            merged,
            empty_schema=pa.schema([("day", pa.int64()), ("cents", pa.int64())]),
        )
    day = merged.column("day").to_numpy(zero_copy_only=False).astype(np.int64)
    cents = merged.column("cents").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(day)
    return day[order], cents[order]


def _day_ts(day: np.ndarray) -> pa.Array:
    # DuckDB DATE comes back from .df() as datetime64 — emit timestamp[us]
    # so the comparator sees identical values (cohort_retention precedent).
    return pa.array(day * _US_PER_DAY, pa.int64()).cast(pa.timestamp("us"))


def q_runs_test(sf_dir: str, limit_bytes: int | None = None) -> pa.Table:
    """Wald-Wolfowitz runs test on daily revenue vs its median: is the
    above/below-median sequence random in time, or do high-revenue days
    clump? Daily sums ride the one partial-sum exchange; the run count
    walks the calendar-bounded series on the driver. Counts are exact
    integers (median of an even day count lands on the half-cent grid,
    so `above` is the exact integer compare 2*cents > 2*median); only
    the final z expression is float, evaluated identically on both
    engines from the integer triple (runs, n_above, n_below)."""
    day, cents = _daily_lineitem_cents(sf_dir, limit_bytes)
    n = cents.size
    if n == 0:
        return _one_row(
            n_days=0, n_above=0, n_below=0, runs=0, z=None
        )
    # doubled median is integer: mean of the two middle ints
    s = np.sort(cents)
    m2 = int(s[(n - 1) // 2]) + int(s[n // 2])
    above = (2 * cents) > m2
    n_pos = int(above.sum())
    n_neg = n - n_pos
    runs = 1 + int((above[1:] != above[:-1]).sum()) if n else 0
    if n_pos == 0 or n_neg == 0 or n < 2:
        z = None
    else:
        mu = 1.0 + (2.0 * n_pos * n_neg) / n
        var = (mu - 1.0) * (mu - 2.0) / (n - 1.0)
        z = _rf((runs - mu) / float(np.sqrt(var)), 6) if var > 0 else None
    return _one_row(
        n_days=n, n_above=n_pos, n_below=n_neg, runs=runs, z=z
    )


SQL_RUNS_TEST = """
WITH daily AS (
  SELECT CAST(l_shipdate AS DATE) AS d,
         CAST(SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents
  FROM lineitem GROUP BY 1
),
med AS (
  -- doubled median of an int column is an exact integer
  SELECT CAST(2*MEDIAN(cents) AS BIGINT) AS m2 FROM daily
),
flags AS (
  SELECT d, CASE WHEN 2*cents > (SELECT m2 FROM med) THEN 1 ELSE 0 END AS up,
         ROW_NUMBER() OVER (ORDER BY d) AS rn
  FROM daily
),
steps AS (
  SELECT f.up, LAG(f.up) OVER (ORDER BY f.rn) AS prev FROM flags f
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(up) AS BIGINT) AS n_above,
         CAST(COUNT(*) - SUM(up) AS BIGINT) AS n_below,
         CAST(1 + SUM(CASE WHEN prev IS NOT NULL AND up <> prev
                           THEN 1 ELSE 0 END) AS BIGINT) AS runs
  FROM steps
)
SELECT n_days, n_above, n_below, runs,
       CASE WHEN n_above = 0 OR n_below = 0 OR n_days < 2 THEN NULL
            ELSE ROUND(
              (CAST(runs AS DOUBLE)
               - (1.0 + (2.0*n_above*n_below)/n_days))
              / sqrt(((1.0 + (2.0*n_above*n_below)/n_days) - 1.0)
                     * ((1.0 + (2.0*n_above*n_below)/n_days) - 2.0)
                     / (n_days - 1.0)), 6) END AS z
FROM agg
"""

QUERIES["runs_test"] = (q_runs_test, SQL_RUNS_TEST)


def q_ewma_daily(sf_dir: str, limit_bytes: int | None = None) -> pa.Table:
    """EWMA (alpha=0.25) over the daily-revenue series — sequential
    state that SQL needs a recursive CTE for and the engine computes as
    a driver fold over the calendar-bounded series (the distributed
    work is the daily partial-sum pass). NO rounding: both engines run
    the identical recursion `0.25*c + 0.75*prev` in the identical day
    order, so every intermediate double is bit-equal (multiply and add
    are each correctly rounded; same expression tree, same order)."""
    day, cents = _daily_lineitem_cents(sf_dir, limit_bytes)
    ewma = np.empty(cents.size, dtype=np.float64)
    e = 0.0
    for i, c in enumerate(cents.tolist()):
        e = float(c) if i == 0 else 0.25 * float(c) + 0.75 * e
        ewma[i] = e
    return pa.table(
        {
            "d": _day_ts(day),
            "cents": pa.array(cents, pa.int64()),
            "ewma": pa.array(ewma, pa.float64()),
        }
    )


SQL_EWMA_DAILY = """
WITH RECURSIVE daily AS (
  SELECT CAST(l_shipdate AS DATE) AS d,
         CAST(SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents
  FROM lineitem GROUP BY 1
),
idx AS (
  SELECT d, cents, ROW_NUMBER() OVER (ORDER BY d) AS rn FROM daily
),
rec AS (
  SELECT rn, d, cents, CAST(cents AS DOUBLE) AS ewma FROM idx WHERE rn = 1
  UNION ALL
  SELECT i.rn, i.d, i.cents, 0.25*CAST(i.cents AS DOUBLE) + 0.75*r.ewma
  FROM rec r JOIN idx i ON i.rn = r.rn + 1
)
SELECT d, cents, ewma FROM rec
"""

QUERIES["ewma_daily"] = (q_ewma_daily, SQL_EWMA_DAILY)


def _lag_moments(day: np.ndarray, cents: np.ndarray, k: int):
    """Exact integer Pearson moments of the lag-k aligned day pairs
    (Python-int folds — Σx² at cents scale exceeds int64). Returns
    (m, sx, sy, sxy, sxx, syy) or None when no pair aligns. Shared by
    acf_lags and ljung_box so the alignment and overflow handling can
    never diverge between the two oracle-matched statistics."""
    idx = np.searchsorted(day, day + k)
    ok = (idx < day.size) & (day[np.minimum(idx, day.size - 1)] == day + k)
    if not ok.any():
        return None
    x = cents[ok]
    y = cents[np.minimum(idx, day.size - 1)[ok]]
    m = int(ok.sum())
    sx = sum(int(a) for a in x.tolist())
    sy = sum(int(b) for b in y.tolist())
    sxy = sum(int(a) * int(b) for a, b in zip(x.tolist(), y.tolist()))
    sxx = sum(int(a) * int(a) for a in x.tolist())
    syy = sum(int(b) * int(b) for b in y.tolist())
    return m, sx, sy, sxy, sxx, syy


def q_acf_lags(sf_dir: str, limit_bytes: int | None = None) -> pa.Table:
    """Exact Pearson autocorrelation of daily revenue at lags 1..7 over
    aligned day pairs (both d and d+k present). The five moments per
    lag are exact integers — Σx² at cents scale exceeds int64, so the
    driver folds them as Python ints and the oracle uses HUGEINT; the
    single float Pearson expression is evaluated identically and
    rounded once."""
    day, cents = _daily_lineitem_cents(sf_dir, limit_bytes)
    lags, ns, rs = [], [], []
    for k in range(1, 8):
        mom = _lag_moments(day, cents, k)
        if mom is None:
            continue  # SQL inner join emits no row for an empty lag
        m, sx, sy, sxy, sxx, syy = mom
        num = float(m * sxy - sx * sy)
        dx = float(m * sxx - sx * sx)
        dy = float(m * syy - sy * sy)
        lags.append(k)
        ns.append(m)
        rs.append(
            None
            if dx <= 0 or dy <= 0
            else _rf(num / (float(np.sqrt(dx)) * float(np.sqrt(dy))), 6)
        )
    return pa.table(
        {
            "lag": pa.array(lags, pa.int64()),
            "n_pairs": pa.array(ns, pa.int64()),
            "r": pa.array(rs, pa.float64()),
        }
    )


SQL_ACF_LAGS = """
WITH daily AS (
  SELECT CAST(l_shipdate AS DATE) AS d,
         CAST(SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents
  FROM lineitem GROUP BY 1
),
k AS (SELECT UNNEST(RANGE(1, 8)) AS lag),
pairs AS (
  SELECT k.lag, a.cents AS x, b.cents AS y
  FROM daily a
  JOIN k ON TRUE
  JOIN daily b ON b.d = a.d + CAST(k.lag AS INTEGER)
),
mom AS (
  SELECT lag,
         CAST(COUNT(*) AS HUGEINT) AS m,
         CAST(SUM(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
         CAST(SUM(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
         CAST(SUM(CAST(x AS HUGEINT)*CAST(y AS HUGEINT)) AS HUGEINT) AS sxy,
         CAST(SUM(CAST(x AS HUGEINT)*CAST(x AS HUGEINT)) AS HUGEINT) AS sxx,
         CAST(SUM(CAST(y AS HUGEINT)*CAST(y AS HUGEINT)) AS HUGEINT) AS syy
  FROM pairs GROUP BY lag
)
SELECT CAST(lag AS BIGINT) AS lag,
       CAST(m AS BIGINT) AS n_pairs,
       CASE WHEN m*sxx - sx*sx <= 0 OR m*syy - sy*sy <= 0 THEN NULL
            ELSE ROUND(CAST(m*sxy - sx*sy AS DOUBLE)
                       / (sqrt(CAST(m*sxx - sx*sx AS DOUBLE))
                          * sqrt(CAST(m*syy - sy*sy AS DOUBLE))), 6)
       END AS r
FROM mom
"""

QUERIES["acf_lags"] = (q_acf_lags, SQL_ACF_LAGS)


def q_trend_ma(sf_dir: str, limit_bytes: int | None = None) -> pa.Table:
    """Centered 7-day moving-average detrend of daily revenue: rows
    only for days whose full +-3-day window exists (inner-join window,
    no partial edges). ma7 = windowsum/7 and det = cents/ma7 are the
    only float ops, identical on both engines, rounded once."""
    day, cents = _daily_lineitem_cents(sf_dir, limit_bytes)
    if day.size == 0:
        return pa.table(
            {
                "d": pa.array([], pa.timestamp("us")),
                "cents": pa.array([], pa.int64()),
                "ma7": pa.array([], pa.float64()),
                "det": pa.array([], pa.float64()),
            }
        )
    csum = np.concatenate([[0], np.cumsum(cents)])
    lo = np.searchsorted(day, day - 3)
    hi = np.searchsorted(day, day + 3, side="right")
    full = (hi - lo) == 7  # all 7 calendar days present
    wsum = csum[hi] - csum[lo]
    d = day[full]
    c = cents[full]
    w = wsum[full]
    ma = w.astype(np.float64) / 7.0
    det = c.astype(np.float64) / ma
    return pa.table(
        {
            "d": _day_ts(d),
            "cents": pa.array(c, pa.int64()),
            "ma7": _ra(ma, 6),
            "det": _ra(det, 6),
        }
    )


SQL_TREND_MA = """
WITH daily AS (
  SELECT CAST(l_shipdate AS DATE) AS d,
         CAST(SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents
  FROM lineitem GROUP BY 1
),
win AS (
  SELECT a.d, a.cents,
         CAST(SUM(b.cents) AS BIGINT) AS wsum,
         CAST(COUNT(*) AS BIGINT) AS wn
  FROM daily a
  JOIN daily b ON b.d BETWEEN a.d - 3 AND a.d + 3
  GROUP BY a.d, a.cents
)
SELECT d, cents,
       ROUND(CAST(wsum AS DOUBLE)/7.0, 6) AS ma7,
       ROUND(CAST(cents AS DOUBLE)/(CAST(wsum AS DOUBLE)/7.0), 6) AS det
FROM win WHERE wn = 7
"""

QUERIES["trend_ma"] = (q_trend_ma, SQL_TREND_MA)


# ---------------------------------------------------------------------------
# grouped rank-test family over events.value by event_type: ONE shared
# narrow exchange of (event_type, cents, cnt) distinct-value partials;
# every downstream statistic is driver math over the value-grid-bounded
# counts table (the documented knob: a continuous-valued column at 100 TB
# switches to the t-digest/approx path; the exact path is for gridded
# values, whose distinct count — not row count — bounds driver work).
# ---------------------------------------------------------------------------


def _grouped_value_counts(sf_dir: str, limit_bytes: int | None = None):
    """(event_type, cents, cnt) over non-null event values, exact cents
    grid. Per-batch polars group_by collapses each batch to its distinct
    pairs before the adaptive partial-sum merge."""
    import polars as pl

    from patito_ray.stages.agg import collect_table, merge_partial_sums

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("value")))
        cents = np.floor(
            t.column("value").to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        return (
            pl.DataFrame(
                {
                    "event_type": t.column("event_type").to_pylist(),
                    "cents": cents,
                }
            )
            .group_by(["event_type", "cents"])
            .agg(pl.len().cast(pl.Int64).alias("cnt"))
            .to_arrow()
        )

    ds = _rp(sf_dir, "events", ["event_type", "value"]).map_batches(
        partial, batch_format="pyarrow", batch_size=None
    )
    _kw = {} if limit_bytes is None else {"limit_bytes": limit_bytes}
    merged = merge_partial_sums(ds, ["event_type", "cents"], ["cnt"], **_kw)
    if not isinstance(merged, pa.Table):
        merged = collect_table(
            merged,
            empty_schema=pa.schema(
                [
                    ("event_type", pa.string()),
                    ("cents", pa.int64()),
                    ("cnt", pa.int64()),
                ]
            ),
        )
    et = np.asarray(merged.column("event_type").to_pylist())
    cents = merged.column("cents").to_numpy(zero_copy_only=False).astype(np.int64)
    cnt = merged.column("cnt").to_numpy(zero_copy_only=False).astype(np.int64)
    return et, cents, cnt


def q_kruskal_wallis(sf_dir: str, limit_bytes: int | None = None) -> pa.Table:
    """Kruskal-Wallis H across event types (doubled midranks keep every
    rank integral; Σ(doubled rank) per group and the tie term Σ(t³-t)
    are exact integers, so the only float math is the one shared H
    expression). Doubled-rank moments overflow int64 at N ≳ 1.3e6 rows
    per the Spearman precedent — the same loud guard applies."""
    et, cents, cnt = _grouped_value_counts(sf_dir, limit_bytes)
    if cents.size == 0:
        return _one_row(n=0, n_groups=0, tie_t=0, h=None, h_c=None)
    n = int(cnt.sum())
    if n > 1_300_000:
        raise ValueError(
            "kruskal_wallis exact integer rank moments overflow int64 "
            f"beyond ~1.3e6 rows (got {n}); use the approx-quantile path"
        )
    # pooled tie runs and doubled midranks per distinct value
    order = np.argsort(cents, kind="stable")
    vc, vv = cents[order], cnt[order]
    uniq, start = np.unique(vc, return_index=True)
    tot = np.add.reduceat(vv, start)  # pooled count per distinct value
    below = np.concatenate([[0], np.cumsum(tot)[:-1]])
    dr = 2 * below + tot + 1  # doubled midrank of each distinct value
    dr_of = dict(zip(uniq.tolist(), dr.tolist()))
    tie_t = int((tot.astype(object) ** 3 - tot.astype(object)).sum())
    # per-group doubled-rank sums
    rows = []
    for g in sorted(set(et.tolist())):
        m = et == g
        ng = int(cnt[m].sum())
        drs = sum(int(c) * dr_of[int(v)] for v, c in zip(cents[m], cnt[m]))
        rows.append((g, ng, drs))
    # each drs²/(4ng) term quantized to the 1e-9 integer grid before the
    # sum (dsir precedent): SQL SUM() order is unspecified, so a raw
    # double sum over groups is the order-sensitive hazard CLAUDE.md
    # bans; the integer sum is order-free on both engines.
    sq = 0
    for _, ng, drs in rows:
        sq += int(np.floor(float(drs) * float(drs) / (4.0 * ng) * 1e9 + 0.5))
    s = float(sq) / 1e9
    h = 12.0 * s / (float(n) * (n + 1.0)) - 3.0 * (n + 1.0)
    denom = float(n) ** 3 - float(n)
    c = 1.0 - float(tie_t) / denom if denom > 0 else 0.0
    h_c = None if c <= 0 else _rf(h / c, 6)
    return _one_row(
        n=n,
        n_groups=len(rows),
        tie_t=tie_t,
        h=_rf(h, 6),
        h_c=h_c,
    )


SQL_KRUSKAL_WALLIS = """
WITH v AS (
  SELECT event_type,
         CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE value IS NOT NULL
),
r AS (
  SELECT event_type,
         2*RANK() OVER (ORDER BY cents)
           + COUNT(*) OVER (PARTITION BY cents) - 1 AS dr
  FROM v
),
g AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS ng,
         CAST(SUM(dr) AS BIGINT) AS drs
  FROM r GROUP BY event_type
),
ties AS (
  SELECT CAST(SUM(CAST(t AS HUGEINT)*t*t - t) AS HUGEINT) AS tie_t
  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM v GROUP BY cents)
),
agg AS (
  SELECT CAST(SUM(ng) AS BIGINT) AS n,
         CAST(COUNT(*) AS BIGINT) AS n_groups,
         CAST(SUM(CAST(FLOOR(
           CAST(drs AS DOUBLE)*CAST(drs AS DOUBLE)/(4.0*ng)*1e9 + 0.5
         ) AS HUGEINT)) AS DOUBLE)/1e9 AS s
  FROM g
)
SELECT a.n, a.n_groups, CAST(t.tie_t AS BIGINT) AS tie_t,
       ROUND(12.0*a.s/(CAST(a.n AS DOUBLE)*(a.n + 1.0)) - 3.0*(a.n + 1.0), 6)
         AS h,
       CASE WHEN 1.0 - CAST(t.tie_t AS DOUBLE)
                       /(POWER(CAST(a.n AS DOUBLE), 3) - a.n) <= 0 THEN NULL
            ELSE ROUND(
              (12.0*a.s/(CAST(a.n AS DOUBLE)*(a.n + 1.0)) - 3.0*(a.n + 1.0))
              / (1.0 - CAST(t.tie_t AS DOUBLE)
                       /(POWER(CAST(a.n AS DOUBLE), 3) - a.n)), 6) END AS h_c
FROM agg a, ties t
"""

QUERIES["kruskal_wallis"] = (q_kruskal_wallis, SQL_KRUSKAL_WALLIS)


def q_anova_oneway(sf_dir: str, limit_bytes: int | None = None) -> pa.Table:
    """One-way ANOVA F across event types from exact integer moments
    (n, Σc, Σc² per group on the cents grid): SSB/SSW assemble from the
    integer moments in one shared float expression, rounded once."""
    et, cents, cnt = _grouped_value_counts(sf_dir, limit_bytes)
    if cents.size == 0:
        return _one_row(n=0, n_groups=0, f=None)
    groups = sorted(set(et.tolist()))
    n = int(cnt.sum())
    k = len(groups)
    s_all = 0
    sq_all = 0
    sbq = 0  # Σ floor(s_g²/n_g · 1e9 + ½): order-free integer grid sum
    for g in groups:
        m = et == g
        ng = int(cnt[m].sum())
        sg = sum(int(v) * int(c) for v, c in zip(cents[m], cnt[m]))
        qg = sum(int(v) * int(v) * int(c) for v, c in zip(cents[m], cnt[m]))
        s_all += sg
        sq_all += qg
        sbq += int(np.floor(float(sg) * float(sg) / float(ng) * 1e9 + 0.5))
    sb = float(sbq) / 1e9
    ssb = sb - float(s_all) * float(s_all) / float(n)
    ssw = float(sq_all) - sb
    if k < 2 or n <= k or ssw <= 0:
        f = None
    else:
        f = _rf((ssb / (k - 1.0)) / (ssw / (n - float(k))), 6)
    return _one_row(n=n, n_groups=k, f=f)


SQL_ANOVA_ONEWAY = """
WITH v AS (
  SELECT event_type, CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS c
  FROM events WHERE value IS NOT NULL
),
g AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS ng,
         CAST(SUM(c) AS HUGEINT) AS sg,
         CAST(SUM(CAST(c AS HUGEINT)*c) AS HUGEINT) AS qg
  FROM v GROUP BY event_type
),
agg AS (
  SELECT CAST(SUM(ng) AS BIGINT) AS n,
         CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(sg) AS HUGEINT) AS s_all,
         CAST(SUM(qg) AS HUGEINT) AS sq_all,
         CAST(SUM(CAST(FLOOR(
           CAST(sg AS DOUBLE)*CAST(sg AS DOUBLE)/CAST(ng AS DOUBLE)
             *1e9 + 0.5
         ) AS HUGEINT)) AS DOUBLE)/1e9 AS sb
  FROM g
)
SELECT n, k AS n_groups,
       CASE WHEN k < 2 OR n <= k
                 OR CAST(sq_all AS DOUBLE) - sb <= 0 THEN NULL
            ELSE ROUND(
              ((sb - CAST(s_all AS DOUBLE)*CAST(s_all AS DOUBLE)
                     /CAST(n AS DOUBLE)) / (k - 1.0))
              / ((CAST(sq_all AS DOUBLE) - sb) / (CAST(n AS DOUBLE) - k)), 6)
       END AS f
FROM agg
"""

QUERIES["anova_oneway"] = (q_anova_oneway, SQL_ANOVA_ONEWAY)


def q_levene_bf(sf_dir: str, limit_bytes: int | None = None) -> pa.Table:
    """Brown-Forsythe (median-centered Levene) equality-of-spread test
    across event types. The doubled group median of an int column is an
    exact integer, so the deviations z = |2c - m2| live on the exact
    half-cent integer grid and the whole test is ANOVA-F over integer
    moments — computable entirely from the same (group, value, count)
    exchange, no second pass over the rows."""
    et, cents, cnt = _grouped_value_counts(sf_dir, limit_bytes)
    if cents.size == 0:
        return _one_row(n=0, n_groups=0, f=None)
    groups = sorted(set(et.tolist()))
    n = int(cnt.sum())
    k = len(groups)
    s_all = 0
    sq_all = 0
    sbq = 0  # 1e-9-grid integer term sum (order-free; dsir precedent)
    for g in groups:
        m = et == g
        v = cents[m]
        c = cnt[m]
        order = np.argsort(v)
        v, c = v[order], c[order]
        ng = int(c.sum())
        cum = np.cumsum(c)
        # doubled median: ints at positions (ng-1)//2 and ng//2 (0-based)
        lo = int(v[np.searchsorted(cum, (ng - 1) // 2 + 1)])
        hi = int(v[np.searchsorted(cum, ng // 2 + 1)])
        m2 = lo + hi
        z = np.abs(2 * v - m2)
        sg = sum(int(a) * int(b) for a, b in zip(z, c))
        qg = sum(int(a) * int(a) * int(b) for a, b in zip(z, c))
        s_all += sg
        sq_all += qg
        sbq += int(np.floor(float(sg) * float(sg) / float(ng) * 1e9 + 0.5))
    sb = float(sbq) / 1e9
    ssb = sb - float(s_all) * float(s_all) / float(n)
    ssw = float(sq_all) - sb
    if k < 2 or n <= k or ssw <= 0:
        f = None
    else:
        f = _rf((ssb / (k - 1.0)) / (ssw / (n - float(k))), 6)
    return _one_row(n=n, n_groups=k, f=f)


SQL_LEVENE_BF = """
WITH v AS (
  SELECT event_type, CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS c
  FROM events WHERE value IS NOT NULL
),
med AS (
  SELECT event_type, CAST(2*MEDIAN(c) AS BIGINT) AS m2
  FROM v GROUP BY event_type
),
z AS (
  SELECT v.event_type, ABS(2*v.c - med.m2) AS zc
  FROM v JOIN med ON med.event_type = v.event_type
),
g AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS ng,
         CAST(SUM(zc) AS HUGEINT) AS sg,
         CAST(SUM(CAST(zc AS HUGEINT)*zc) AS HUGEINT) AS qg
  FROM z GROUP BY event_type
),
agg AS (
  SELECT CAST(SUM(ng) AS BIGINT) AS n,
         CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(sg) AS HUGEINT) AS s_all,
         CAST(SUM(qg) AS HUGEINT) AS sq_all,
         CAST(SUM(CAST(FLOOR(
           CAST(sg AS DOUBLE)*CAST(sg AS DOUBLE)/CAST(ng AS DOUBLE)
             *1e9 + 0.5
         ) AS HUGEINT)) AS DOUBLE)/1e9 AS sb
  FROM g
)
SELECT n, k AS n_groups,
       CASE WHEN k < 2 OR n <= k
                 OR CAST(sq_all AS DOUBLE) - sb <= 0 THEN NULL
            ELSE ROUND(
              ((sb - CAST(s_all AS DOUBLE)*CAST(s_all AS DOUBLE)
                     /CAST(n AS DOUBLE)) / (k - 1.0))
              / ((CAST(sq_all AS DOUBLE) - sb) / (CAST(n AS DOUBLE) - k)), 6)
       END AS f
FROM agg
"""

QUERIES["levene_bf"] = (q_levene_bf, SQL_LEVENE_BF)


# ---------------------------------------------------------------------------
# Monte-Carlo randomization test: embarrassingly parallel (the big-data
# permutation test — per-row splitmix relabels mean no replica ever
# materializes; one map_batches emits R partial rows per batch).
# ---------------------------------------------------------------------------

_PERM_REPS = 64
_PERM_SEED = 29


def q_permutation_test(sf_dir: str, limit_bytes: int | None = None) -> pa.Table:
    """Randomization test for mean-value difference between 'purchase'
    and 'click' events: each of the R=64 replicas relabels every row
    with a fair splitmix64 coin (row-level randomization — the
    exchangeable-null Monte Carlo variant that stays one streaming
    pass; a fixed-margin permutation would need a global shuffle).
    Core in `functions/randtest.py:randomization_test`; everything
    through the exceedance count is exact integer arithmetic (Python
    ints vs the oracle's HUGEINT), so the p numerator is
    bit-determined; only t_obs and p are floats, computed identically
    and rounded once."""
    from patito_ray.functions.randtest import randomization_test

    ds = _rp(sf_dir, "events", ["event_id", "event_type", "value"])
    r = randomization_test(
        ds,
        id_col="event_id",
        group_col="event_type",
        value_col="value",
        group_a="purchase",
        group_b="click",
        reps=_PERM_REPS,
        seed=_PERM_SEED,
        limit_bytes=limit_bytes,
    )
    return _one_row(
        na=r["na"],
        nb=r["nb"],
        t_obs=None if r["t_obs"] is None else _rf(r["t_obs"], 6),
        r=_PERM_REPS,
        exceed=r["exceed"],
        p=None if r["p"] is None else _rf(r["p"], 6),
    )


def _sql_permutation_test() -> str:
    from patito_ray.pipelines.q_training import _sql_mul64

    return f"""
WITH r AS (
  SELECT event_id AS rid,
         CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS cents,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_a
  FROM events
  WHERE value IS NOT NULL AND event_type IN ('purchase', 'click')
),
obs AS (
  SELECT CAST(SUM(CASE WHEN is_a = 1 THEN cents ELSE 0 END) AS HUGEINT) AS sa,
         CAST(SUM(is_a) AS HUGEINT) AS na,
         CAST(SUM(CASE WHEN is_a = 0 THEN cents ELSE 0 END) AS HUGEINT) AS sb,
         CAST(COUNT(*) - SUM(is_a) AS HUGEINT) AS nb
  FROM r
),
reps AS (SELECT UNNEST(range(0, {_PERM_REPS})) AS rep),
z0 AS (
  SELECT rep, cents,
    CAST((CAST(xor(CAST(rid*{_PERM_REPS}+rep AS UBIGINT),
                   CAST({_PERM_SEED} AS UBIGINT)) AS HUGEINT)
          + 11400714819323198485) % 18446744073709551616 AS UBIGINT) AS z
  FROM r, reps
), x1 AS (SELECT rep, cents, xor(z, z >> 30) AS z FROM z0
), z1 AS (SELECT rep, cents, {_sql_mul64(3210233709, 484763065)} AS z FROM x1
), x2 AS (SELECT rep, cents, xor(z, z >> 27) AS z FROM z1
), z2 AS (SELECT rep, cents, {_sql_mul64(2496678331, 321982955)} AS z FROM x2
), h AS (SELECT rep, cents,
                CAST(xor(z, z >> 31) AS HUGEINT) < 9223372036854775808 AS a
         FROM z2
),
per AS (
  SELECT rep,
         CAST(SUM(CASE WHEN a THEN cents ELSE 0 END) AS HUGEINT) AS sa,
         CAST(SUM(CASE WHEN a THEN 1 ELSE 0 END) AS HUGEINT) AS na,
         CAST(SUM(CASE WHEN a THEN 0 ELSE cents END) AS HUGEINT) AS sb,
         CAST(SUM(CASE WHEN a THEN 0 ELSE 1 END) AS HUGEINT) AS nb
  FROM h GROUP BY rep
),
exc AS (
  SELECT CAST(SUM(CASE
    WHEN per.na = 0 OR per.nb = 0 THEN 1
    WHEN ABS(per.sa*per.nb - per.sb*per.na) * (obs.na*obs.nb)
         >= ABS(obs.sa*obs.nb - obs.sb*obs.na) * (per.na*per.nb) THEN 1
    ELSE 0 END) AS BIGINT) AS exceed
  FROM per, obs
)
SELECT CAST(obs.na AS BIGINT) AS na,
       CAST(obs.nb AS BIGINT) AS nb,
       CASE WHEN obs.na = 0 OR obs.nb = 0 THEN NULL
            ELSE ROUND(CAST(obs.sa AS DOUBLE)/CAST(obs.na AS DOUBLE)
                       - CAST(obs.sb AS DOUBLE)/CAST(obs.nb AS DOUBLE), 6)
       END AS t_obs,
       {_PERM_REPS} AS r,
       CASE WHEN obs.na = 0 OR obs.nb = 0 THEN 0
            ELSE COALESCE(exc.exceed, 0) END AS exceed,
       CASE WHEN obs.na = 0 OR obs.nb = 0 THEN NULL
            ELSE ROUND((1.0 + COALESCE(exc.exceed, 0))
                       /({_PERM_REPS} + 1.0), 6) END AS p
FROM obs, exc
"""


QUERIES["permutation_test"] = (q_permutation_test, _sql_permutation_test())


def q_soft_dedup_weights(sf_dir: str, limit_bytes: int | None = None) -> Any:
    """SoftDeDup-style training weights: instead of dropping exact
    duplicates, each document is weighted 1/k where k is its exact-dup
    cluster size (identical text bytes). One narrow content-hash count
    exchange (16 B/doc partials); text never moves. Weight sums then
    equal the distinct-content count — the soft analogue of dedup."""
    import polars as pl

    from patito_ray.functions.dedup import hash64
    from patito_ray.stages.agg import merge_partial_sums

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])

    def hpart(t: pa.Table) -> pa.Table:
        h = hash64(t.column("text")).view(np.int64)
        return (
            pl.DataFrame({"h": h})
            .group_by("h")
            .agg(pl.len().cast(pl.Int64).alias("k"))
            .to_arrow()
        )

    _kw = {} if limit_bytes is None else {"limit_bytes": limit_bytes}
    counts = merge_partial_sums(
        ds.map_batches(hpart, batch_format="pyarrow", batch_size=None),
        ["h"],
        ["k"],
        **_kw,
    )
    # broadcast the (hash -> k) table; at 100 TB this is the distinct-
    # content count table (bounded by content cardinality, and itself
    # shardable via the bucketed-blob exchange if it outgrew memory)
    if not isinstance(counts, pa.Table):
        from patito_ray.stages.agg import collect_table

        counts = collect_table(
            counts, empty_schema=pa.schema([("h", pa.int64()), ("k", pa.int64())])
        )
    import ray

    ref = ray.put(
        (
            np.sort(counts.column("h").to_numpy(zero_copy_only=False)),
            counts.column("k")
            .to_numpy(zero_copy_only=False)[
                np.argsort(counts.column("h").to_numpy(zero_copy_only=False))
            ]
            .astype(np.int64),
        )
    )

    def score(t: pa.Table) -> pa.Table:
        hs, ks = ray.get(ref)
        h = hash64(t.column("text")).view(np.int64)
        idx = np.searchsorted(hs, h)
        k = ks[np.minimum(idx, ks.size - 1)]
        w = 1.0 / k.astype(np.float64)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "dup_count": pa.array(k, pa.int64()),
                "weight": _ra(w, 6),
            }
        )

    out = ds.map_batches(score, batch_format="pyarrow", batch_size=None)
    return out


SQL_SOFT_DEDUP_WEIGHTS = """
WITH k AS (
  SELECT text, CAST(COUNT(*) AS BIGINT) AS dup_count
  FROM documents GROUP BY text
)
SELECT d.doc_id, k.dup_count,
       ROUND(1.0/CAST(k.dup_count AS DOUBLE), 6) AS weight
FROM documents d JOIN k ON k.text = d.text
"""

QUERIES["soft_dedup_weights"] = (q_soft_dedup_weights, SQL_SOFT_DEDUP_WEIGHTS)


# ---------------------------------------------------------------------------
# DSIR-style importance weighting, per-source completeness audit,
# conditional referential validation, small-file compaction parity.
# ---------------------------------------------------------------------------


def q_dsir_weights(sf_dir: str, limit_bytes: int | None = None) -> Any:
    """DSIR (data-selection-by-importance-resampling, Xie et al. 2023)
    log-importance weights: target distribution = English documents,
    raw = the whole corpus; per-document weight is the unigram
    log-likelihood ratio sum count(tok)·(ln p_t(tok) − ln p_r(tok))
    with add-one smoothing. ONE distributed (token, target?, count)
    stats pass feeds a driver-built per-token ratio table that is
    broadcast once (ray.put) for a second zero-exchange scoring pass.
    Per-token log-ratios quantize to an integer 1e-9 grid on BOTH
    engines before the per-doc sum, so the weight is an exact integer
    (nano-units) plus one display division — no float-summation-order
    hazard. The token-identity feature table is the oracle-exact mode;
    at 100 TB the same pipeline hashes tokens into a fixed bucket count
    (vocab-unbounded corpora), which SQL cannot replay."""
    import polars as pl
    import ray

    from patito_ray.functions.tfidf import re2_split_tokens
    from patito_ray.stages.agg import collect_table, merge_partial_sums

    ds = _rp(sf_dir, "documents", ["doc_id", "text", "lang"])

    def tok_partials(t: pa.Table) -> pa.Table:
        flat, parents, _ = re2_split_tokens(t.column("text"))
        is_t = (
            pc.equal(t.column("lang"), "en")
            .to_numpy(zero_copy_only=False)[parents]
            .astype(np.int64)
        )
        return (
            pl.DataFrame(
                {
                    "tok": flat.to_pylist(),
                    "c_all": np.ones(len(flat), dtype=np.int64),
                    "c_t": is_t,
                }
            )
            .group_by("tok")
            .agg(pl.col("c_all").sum(), pl.col("c_t").sum())
            .to_arrow()
        )

    _kw = {} if limit_bytes is None else {"limit_bytes": limit_bytes}
    stats = merge_partial_sums(
        ds.map_batches(tok_partials, batch_format="pyarrow", batch_size=None),
        ["tok"],
        ["c_all", "c_t"],
        **_kw,
    )
    if not isinstance(stats, pa.Table):
        stats = collect_table(
            stats,
            empty_schema=pa.schema(
                [("tok", pa.string()), ("c_all", pa.int64()), ("c_t", pa.int64())]
            ),
        )
    toks = np.asarray(stats.column("tok").to_pylist())
    c_all = stats.column("c_all").to_numpy(zero_copy_only=False).astype(np.int64)
    c_t = stats.column("c_t").to_numpy(zero_copy_only=False).astype(np.int64)
    v = int(toks.size)  # raw-corpus vocab
    tt = int(c_t.sum())  # target token total
    tr = int(c_all.sum())  # raw token total
    # per-token log-ratio on the 1e-9 integer grid (identical doubles
    # in, floor+0.5 out — the grid absorbs any ulp-level libm skew)
    lam = np.log((c_t + 1.0) / (tt + v)) - np.log((c_all + 1.0) / (tr + v))
    lam_n = np.floor(lam * 1e9 + 0.5).astype(np.int64)
    order = np.argsort(toks)
    ref = ray.put((toks[order], lam_n[order]))

    def score(t: pa.Table) -> pa.Table:
        tok_s, lam_s = ray.get(ref)
        flat, parents, nrows = re2_split_tokens(t.column("text"))
        w = np.zeros(nrows, dtype=np.int64)
        if len(flat):
            fa = np.asarray(flat.to_pylist())
            idx = np.searchsorted(tok_s, fa)
            idx = np.minimum(idx, lam_s.size - 1)
            hit = tok_s[idx] == fa  # unseen tokens contribute nothing
            np.add.at(w, parents[hit], lam_s[idx[hit]])
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "w_nano": pa.array(w, pa.int64()),
                "logw": pa.array(w.astype(np.float64) / 1e9, pa.float64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", batch_size=None)


SQL_DSIR_WEIGHTS = """
WITH tok AS (
  SELECT doc_id, lang, UNNEST(regexp_extract_all(text, '\\S+')) AS t
  FROM documents
),
stats AS (
  SELECT t,
         CAST(COUNT(*) AS BIGINT) AS c_all,
         CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS c_t
  FROM tok GROUP BY t
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS v,
         CAST(SUM(c_t) AS BIGINT) AS tt,
         CAST(SUM(c_all) AS BIGINT) AS tr
  FROM stats
),
lam AS (
  SELECT s.t,
         CAST(FLOOR((ln((s.c_t + 1.0)/(tot.tt + tot.v))
                     - ln((s.c_all + 1.0)/(tot.tr + tot.v))) * 1e9 + 0.5)
              AS BIGINT) AS lam_n
  FROM stats s, tot
),
docsum AS (
  SELECT tok.doc_id, CAST(SUM(lam.lam_n) AS BIGINT) AS w_nano
  FROM tok JOIN lam ON lam.t = tok.t
  GROUP BY tok.doc_id
)
SELECT d.doc_id,
       COALESCE(ds.w_nano, 0) AS w_nano,
       CAST(COALESCE(ds.w_nano, 0) AS DOUBLE)/1e9 AS logw
FROM documents d LEFT JOIN docsum ds ON ds.doc_id = d.doc_id
"""

QUERIES["dsir_weights"] = (q_dsir_weights, SQL_DSIR_WEIGHTS)


def q_completeness_by_source(sf_dir: str, limit_bytes: int | None = None) -> pa.Table:
    """Per-source completeness audit (the per-partition face of the V4
    null checks): empty/whitespace-only text rate and short-doc rate
    per source with a pass verdict at the 25% short threshold. Exact
    integer counts through the adaptive merge; one rounded rate."""
    import polars as pl

    from patito_ray.stages.agg import collect_table, merge_partial_sums

    ds = _rp(sf_dir, "documents", ["source", "text", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        txt = t.column("text")
        # DuckDB TRIM strips SPACES only; arrow utf8_trim_whitespace is
        # Unicode and would call "\t" empty where the oracle does not
        # (CLAUDE.md text-kernel rule) — trim ' ' explicitly
        empty = pc.fill_null(
            pc.equal(pc.utf8_trim(txt, characters=" "), ""), True
        ).to_numpy(zero_copy_only=False)
        nch = t.column("n_chars").to_numpy(zero_copy_only=False)
        short = (nch < 50) & ~empty
        return (
            pl.DataFrame(
                {
                    "source": t.column("source").to_pylist(),
                    "n": np.ones(t.num_rows, dtype=np.int64),
                    "n_empty": empty.astype(np.int64),
                    "n_short": short.astype(np.int64),
                }
            )
            .group_by("source")
            .agg(
                pl.col("n").sum(),
                pl.col("n_empty").sum(),
                pl.col("n_short").sum(),
            )
            .to_arrow()
        )

    _kw = {} if limit_bytes is None else {"limit_bytes": limit_bytes}
    merged = merge_partial_sums(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["source"],
        ["n", "n_empty", "n_short"],
        **_kw,
    )
    if not isinstance(merged, pa.Table):
        merged = collect_table(
            merged,
            empty_schema=pa.schema(
                [
                    ("source", pa.string()),
                    ("n", pa.int64()),
                    ("n_empty", pa.int64()),
                    ("n_short", pa.int64()),
                ]
            ),
        )
    n = merged.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
    n_short = merged.column("n_short").to_numpy(zero_copy_only=False)
    rate = n_short.astype(np.float64) / n
    return pa.table(
        {
            "source": merged.column("source"),
            "n": merged.column("n"),
            "n_empty": merged.column("n_empty"),
            "n_short": merged.column("n_short"),
            "short_rate": _ra(rate, 6),
            "ok": pa.array(4 * n_short <= merged.column("n").to_numpy(
                zero_copy_only=False
            ), pa.bool_()),
        }
    )


SQL_COMPLETENESS_BY_SOURCE = """
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN text IS NULL OR TRIM(text) = '' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_empty,
       CAST(SUM(CASE WHEN n_chars < 50
                     AND NOT (text IS NULL OR TRIM(text) = '')
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_short,
       ROUND(CAST(SUM(CASE WHEN n_chars < 50
                     AND NOT (text IS NULL OR TRIM(text) = '')
                     THEN 1 ELSE 0 END) AS DOUBLE)/COUNT(*), 6) AS short_rate,
       4*SUM(CASE WHEN n_chars < 50
                  AND NOT (text IS NULL OR TRIM(text) = '')
                  THEN 1 ELSE 0 END) <= COUNT(*) AS ok
FROM documents GROUP BY source
"""

QUERIES["completeness_by_source"] = (
    q_completeness_by_source,
    SQL_COMPLETENESS_BY_SOURCE,
)


def q_conditional_referential(sf_dir: str, limit_bytes: int | None = None) -> pa.Table:
    """Conditional referential check (predicate-scoped foreign-key
    validation): every lineitem of an URGENT-priority order must ship
    within 90 days of the order date. The urgent order side is filtered
    AT THE READ and joined via the empty-block-safe hash join; the
    verdict is exact integer counts (checked lineitems, violations)."""
    from patito_ray.stages.agg import collect_table, merge_partial_sums
    from patito_ray.stages.join import hash_join

    orders = _rp(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"])

    def urgent(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("o_orderpriority"), "1-URGENT"))
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "odate_us": pc.cast(t.column("o_orderdate"), pa.int64()),
            }
        )

    li = _rp(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])

    def narrow(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "ship_us": pc.cast(t.column("l_shipdate"), pa.int64()),
            }
        )

    # the urgent side is ~20% of orders — broadcast it below the limit
    # (bloom_semi_join precedent: an exact small side beats a shuffle),
    # shuffle hash join beyond (limit_bytes=0 forces that branch)
    urgent_ds = orders.map_batches(
        urgent, batch_format="pyarrow", batch_size=None
    ).materialize()
    lim = 64 << 20 if limit_bytes is None else limit_bytes
    li_narrow = li.map_batches(narrow, batch_format="pyarrow", batch_size=None)
    if urgent_ds.size_bytes() <= lim:
        from patito_ray.stages.agg import collect_table as _ct
        from patito_ray.stages.join import broadcast_join

        small = _ct(
            urgent_ds,
            empty_schema=pa.schema(
                [("o_orderkey", pa.int64()), ("odate_us", pa.int64())]
            ),
        )
        joined = broadcast_join(
            li_narrow, small, on="l_orderkey", right_on="o_orderkey"
        )
    else:
        joined = hash_join(
            li_narrow,
            urgent_ds,
            on="l_orderkey",
            right_on="o_orderkey",
            how="inner",
        )
    lim = np.int64(90) * _US_PER_DAY

    def verdict(t: pa.Table) -> pa.Table:
        sch = pa.schema([("k", pa.int64()), ("checked", pa.int64()), ("violations", pa.int64())])
        if t.num_rows == 0:
            return sch.empty_table()
        ship = t.column("ship_us").to_numpy(zero_copy_only=False)
        od = t.column("odate_us").to_numpy(zero_copy_only=False)
        bad = int((ship - od > lim).sum())
        return pa.table(
            {
                "k": pa.array([0], pa.int64()),
                "checked": pa.array([t.num_rows], pa.int64()),
                "violations": pa.array([bad], pa.int64()),
            },
            schema=sch,
        )

    _kw = {} if limit_bytes is None else {"limit_bytes": limit_bytes}
    merged = merge_partial_sums(
        joined.map_batches(verdict, batch_format="pyarrow", batch_size=None),
        ["k"],
        ["checked", "violations"],
        **_kw,
    )
    if not isinstance(merged, pa.Table):
        merged = collect_table(
            merged,
            empty_schema=pa.schema(
                [("k", pa.int64()), ("checked", pa.int64()), ("violations", pa.int64())]
            ),
        )
    checked = int(merged.column("checked")[0].as_py()) if merged.num_rows else 0
    bad = int(merged.column("violations")[0].as_py()) if merged.num_rows else 0
    return _one_row(checked=checked, violations=bad, ok=bad == 0)


SQL_CONDITIONAL_REFERENTIAL = """
SELECT CAST(COUNT(*) AS BIGINT) AS checked,
       CAST(SUM(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
                     THEN 1 ELSE 0 END) AS BIGINT) AS violations,
       SUM(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
                THEN 1 ELSE 0 END) = 0 AS ok
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderpriority = '1-URGENT'
"""

QUERIES["conditional_referential"] = (
    q_conditional_referential,
    SQL_CONDITIONAL_REFERENTIAL,
)


def q_compact_small_files(sf_dir: str) -> pa.Table:
    """Small-file compaction parity (sinks.compact_parquet): orders
    land as 32 tiny files, compact into ~4 via driver-side first-fit
    bin-packing + one streaming read→write task per bin (no shuffle),
    then the per-status revenue aggregate reads back from the COMPACTED
    directory — bit-identical to aggregating the source table."""
    import glob
    import os
    import shutil

    import polars as pl

    from patito_ray.sinks import compact_parquet
    from patito_ray.sources.readers import clean_read_parquet
    from patito_ray.stages.agg import collect_table, merge_partial_sums

    base = _tmp_dir("compactq", sf_dir)
    small = f"{base}/small"
    out = f"{base}/compacted"
    shutil.rmtree(base, ignore_errors=True)
    ds = _rp(sf_dir, "orders", ["o_orderkey", "o_orderstatus", "o_totalprice"])
    ds.repartition(32).write_parquet(small)
    sizes = [os.path.getsize(f) for f in glob.glob(f"{small}/*.parquet")]
    compact_parquet(small, out, target_bytes=8 * max(sizes))

    def partial(t: pa.Table) -> pa.Table:
        cents = np.floor(
            t.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        return (
            pl.DataFrame(
                {
                    "o_orderstatus": t.column("o_orderstatus").to_pylist(),
                    "n": np.ones(t.num_rows, dtype=np.int64),
                    "cents": cents,
                }
            )
            .group_by("o_orderstatus")
            .agg(pl.col("n").sum(), pl.col("cents").sum())
            .to_arrow()
        )

    merged = merge_partial_sums(
        clean_read_parquet(out).map_batches(
            partial, batch_format="pyarrow", batch_size=None
        ),
        ["o_orderstatus"],
        ["n", "cents"],
    )
    if not isinstance(merged, pa.Table):
        merged = collect_table(
            merged,
            empty_schema=pa.schema(
                [("o_orderstatus", pa.string()), ("n", pa.int64()), ("cents", pa.int64())]
            ),
        )
    return merged.sort_by("o_orderstatus")


SQL_COMPACT_SMALL_FILES = """
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT)
         AS cents
FROM orders GROUP BY o_orderstatus
"""

QUERIES["compact_small_files"] = (q_compact_small_files, SQL_COMPACT_SMALL_FILES)


# ---------------------------------------------------------------------------
# multiple-testing composition: all-pairs randomization tests + exact
# integer Benjamini-Hochberg. ONE streaming pass emits per-TYPE per-rep
# partials; every pair statistic assembles from type sums (the row
# relabel coin is keyed by (event_id, rep) only, so a pair's relabeled
# group-A sum is s1[A]+s1[B]) — pair count never touches the data pass.
# ---------------------------------------------------------------------------

_BH_ALPHA_PCT = 10  # alpha = 0.10 as an integer percentage — exact BH


def q_bh_pairs(sf_dir: str, limit_bytes: int | None = None) -> pa.Table:
    """Benjamini-Hochberg FDR over the 10 pairwise mean-value
    randomization tests between the 5 event types. The per-(type, rep)
    partials ride one adaptive merge; each pair's replicate statistic
    assembles from type sums; exceedance counts and the BH step-up
    rule 100*(1+e_(i)) <= alpha%*i*(R+1)/10 ... are EXACT integer
    comparisons (shared denominators), so the reject set is
    bit-determined on both engines."""
    from patito_ray.functions.dedup import _splitmix
    from patito_ray.stages.agg import collect_table, merge_partial_sums

    ds = _rp(sf_dir, "events", ["event_id", "event_type", "value"])
    half = np.uint64(1) << np.uint64(63)
    schema = pa.schema(
        [
            ("event_type", pa.string()),
            ("rep", pa.int64()),
            ("s1", pa.int64()),
            ("n1", pa.int64()),
            ("s", pa.int64()),
            ("n", pa.int64()),
        ]
    )

    def partials(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("value")))
        if t.num_rows == 0:
            return schema.empty_table()
        eid = (
            pc.cast(t.column("event_id"), pa.int64())
            .to_numpy(zero_copy_only=False)
            .astype(np.uint64)
        )
        cents = np.floor(
            t.column("value").to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        types = np.asarray(t.column("event_type").to_pylist())
        uniq = np.unique(types)
        out_t, out_r, out_s1, out_n1, out_s, out_n = [], [], [], [], [], []
        base = eid * np.uint64(_PERM_REPS)
        coins = np.empty((_PERM_REPS, eid.size), dtype=bool)
        for b in range(_PERM_REPS):
            coins[b] = _splitmix((base + np.uint64(b)) ^ np.uint64(_PERM_SEED)) < half
        for ty in uniq:
            m = types == ty
            cm = cents[m]
            stot = int(cm.sum())
            ntot = int(m.sum())
            for b in range(_PERM_REPS):
                cb = coins[b][m]
                out_t.append(str(ty))
                out_r.append(b)
                out_s1.append(int(cm[cb].sum()))
                out_n1.append(int(cb.sum()))
                out_s.append(stot)
                out_n.append(ntot)
        return pa.table(
            {
                "event_type": pa.array(out_t, pa.string()),
                "rep": pa.array(out_r, pa.int64()),
                "s1": pa.array(out_s1, pa.int64()),
                "n1": pa.array(out_n1, pa.int64()),
                "s": pa.array(out_s, pa.int64()),
                "n": pa.array(out_n, pa.int64()),
            },
            schema=schema,
        )

    _kw = {} if limit_bytes is None else {"limit_bytes": limit_bytes}
    merged = merge_partial_sums(
        ds.map_batches(partials, batch_format="pyarrow", batch_size=None),
        ["event_type", "rep"],
        ["s1", "n1", "s", "n"],
        **_kw,
    )
    if not isinstance(merged, pa.Table):
        merged = collect_table(merged, empty_schema=schema)
    # type -> (per-rep s1/n1 arrays, totals)
    data: dict[str, dict[str, Any]] = {}
    for r in merged.to_pylist():
        d = data.setdefault(
            r["event_type"],
            {"s1": [0] * _PERM_REPS, "n1": [0] * _PERM_REPS, "s": 0, "n": 0},
        )
        d["s1"][r["rep"]] = r["s1"]
        d["n1"][r["rep"]] = r["n1"]
        d["s"] = r["s"]
        d["n"] = r["n"]
    types = sorted(data)
    pairs = []
    for i, a in enumerate(types):
        for b in types[i + 1 :]:
            da, db = data[a], data[b]
            st, nt = da["s"] + db["s"], da["n"] + db["n"]
            if da["n"] == 0 or db["n"] == 0:
                continue
            obs_num = abs(da["s"] * db["n"] - db["s"] * da["n"])
            obs_den = da["n"] * db["n"]
            exceed = 0
            for rep in range(_PERM_REPS):
                sa = da["s1"][rep] + db["s1"][rep]
                na = da["n1"][rep] + db["n1"][rep]
                sb, nb = st - sa, nt - na
                if na == 0 or nb == 0:
                    exceed += 1
                elif abs(sa * nb - sb * na) * obs_den >= obs_num * (na * nb):
                    exceed += 1
            pairs.append((a, b, exceed))
    # exact BH step-up at alpha = _BH_ALPHA_PCT / 100: sort by
    # (exceed, a, b); reject ranks <= k where k = max{i : p_(i) <=
    # alpha*i/m}, i.e. 100*m*(1+e_(i)) <= alpha_pct * i * (R+1) —
    # every quantity integer, so the reject set is bit-determined
    pairs.sort()
    order = sorted(range(len(pairs)), key=lambda i: (pairs[i][2], pairs[i][0], pairs[i][1]))
    m = len(pairs)
    k = 0
    for rank, i in enumerate(order, start=1):
        if 100 * m * (1 + pairs[i][2]) <= _BH_ALPHA_PCT * rank * (_PERM_REPS + 1):
            k = rank
    rej = {i: rank <= k for rank, i in enumerate(order, start=1)}
    rnk = {i: rank for rank, i in enumerate(order, start=1)}
    return pa.table(
        {
            "type_a": pa.array([p[0] for p in pairs], pa.string()),
            "type_b": pa.array([p[1] for p in pairs], pa.string()),
            "exceed": pa.array([p[2] for p in pairs], pa.int64()),
            "p": pa.array(
                [_rf((1.0 + p[2]) / (_PERM_REPS + 1.0), 6) for p in pairs],
                pa.float64(),
            ),
            "p_rank": pa.array([rnk[i] for i in range(m)], pa.int64()),
            "reject": pa.array([rej[i] for i in range(m)], pa.bool_()),
        }
    )


def _sql_bh_pairs() -> str:
    from patito_ray.pipelines.q_training import _sql_mul64

    return f"""
WITH r AS (
  SELECT event_id AS rid, event_type,
         CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE value IS NOT NULL
),
reps AS (SELECT UNNEST(range(0, {_PERM_REPS})) AS rep),
z0 AS (
  SELECT rep, event_type, cents,
    CAST((CAST(xor(CAST(rid*{_PERM_REPS}+rep AS UBIGINT),
                   CAST({_PERM_SEED} AS UBIGINT)) AS HUGEINT)
          + 11400714819323198485) % 18446744073709551616 AS UBIGINT) AS z
  FROM r, reps
), x1 AS (SELECT rep, event_type, cents, xor(z, z >> 30) AS z FROM z0
), z1 AS (SELECT rep, event_type, cents,
                 {_sql_mul64(3210233709, 484763065)} AS z FROM x1
), x2 AS (SELECT rep, event_type, cents, xor(z, z >> 27) AS z FROM z1
), z2 AS (SELECT rep, event_type, cents,
                 {_sql_mul64(2496678331, 321982955)} AS z FROM x2
), h AS (SELECT rep, event_type, cents,
                CAST(xor(z, z >> 31) AS HUGEINT) < 9223372036854775808 AS a
         FROM z2
),
per AS (
  SELECT event_type, rep,
         CAST(SUM(CASE WHEN a THEN cents ELSE 0 END) AS HUGEINT) AS s1,
         CAST(SUM(CASE WHEN a THEN 1 ELSE 0 END) AS HUGEINT) AS n1
  FROM h GROUP BY event_type, rep
),
tot AS (
  SELECT event_type,
         CAST(SUM(cents) AS HUGEINT) AS s,
         CAST(COUNT(*) AS HUGEINT) AS n
  FROM r GROUP BY event_type
),
prs AS (
  SELECT ta.event_type AS type_a, tb.event_type AS type_b,
         ta.s AS sa_o, ta.n AS na_o, tb.s AS sb_o, tb.n AS nb_o
  FROM tot ta JOIN tot tb ON ta.event_type < tb.event_type
  WHERE ta.n > 0 AND tb.n > 0
),
exc AS (
  SELECT p.type_a, p.type_b,
         CAST(SUM(CASE
           WHEN pa.n1 + pb.n1 = 0
                OR (p.na_o + p.nb_o) - (pa.n1 + pb.n1) = 0 THEN 1
           WHEN ABS((pa.s1 + pb.s1)
                      * ((p.na_o + p.nb_o) - (pa.n1 + pb.n1))
                    - ((p.sa_o + p.sb_o) - (pa.s1 + pb.s1))
                      * (pa.n1 + pb.n1))
                * (p.na_o * p.nb_o)
                >= ABS(p.sa_o*p.nb_o - p.sb_o*p.na_o)
                   * ((pa.n1 + pb.n1)
                      * ((p.na_o + p.nb_o) - (pa.n1 + pb.n1))) THEN 1
           ELSE 0 END) AS BIGINT) AS exceed
  FROM prs p
  JOIN per pa ON pa.event_type = p.type_a
  JOIN per pb ON pb.event_type = p.type_b AND pb.rep = pa.rep
  GROUP BY p.type_a, p.type_b
),
ranked AS (
  SELECT type_a, type_b, exceed,
         ROW_NUMBER() OVER (ORDER BY exceed, type_a, type_b) AS p_rank,
         COUNT(*) OVER () AS m
  FROM exc
),
kmax AS (
  SELECT COALESCE(MAX(p_rank), 0) AS k FROM ranked
  WHERE 100*m*(1 + exceed) <= {_BH_ALPHA_PCT} * p_rank * ({_PERM_REPS} + 1)
)
SELECT type_a, type_b, exceed,
       ROUND((1.0 + exceed)/({_PERM_REPS} + 1.0), 6) AS p,
       CAST(p_rank AS BIGINT) AS p_rank,
       p_rank <= (SELECT k FROM kmax) AS reject
FROM ranked
"""


QUERIES["bh_pairs"] = (q_bh_pairs, _sql_bh_pairs())


def q_edge_jaccard(sf_dir: str, limit_bytes: int | None = None) -> Any:
    """Structural similarity of linked documents: out-neighbor Jaccard
    per distinct edge of the deterministic doc link graph (co-citation
    signal). Candidate pairs are the edges themselves — never a
    shared-target self-join whose wedge volume is quadratic in a hub's
    in-degree (`functions/graph.py:edge_jaccard`)."""
    from patito_ray.functions.graph import edge_jaccard
    from patito_ray.pipelines.q_wave3 import _doc_link_edges

    edges, _n = _doc_link_edges(sf_dir, 3)
    kw = {} if limit_bytes is None else {"limit_bytes": limit_bytes}
    out = edge_jaccard(edges, src="src", dst="dst", **kw)
    return _lazy_norm(
        out,
        pa.schema(
            [
                ("src", pa.int64()),
                ("dst", pa.int64()),
                ("common", pa.int64()),
                ("du", pa.int64()),
                ("dv", pa.int64()),
                ("jaccard", pa.float64()),
            ]
        ),
    )


def _sql_edge_jaccard() -> str:
    from patito_ray.pipelines.q_wave3 import _sql_link_edges

    return f"""
WITH {_sql_link_edges(3)},
e AS (SELECT DISTINCT src, dst FROM edges WHERE src <> dst),
deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS d FROM e GROUP BY src),
com AS (
  SELECT a.src AS u, b.src AS v, CAST(COUNT(*) AS BIGINT) AS common
  FROM e a JOIN e b ON b.dst = a.dst AND a.src <> b.src
  GROUP BY a.src, b.src
)
SELECT e.src, e.dst,
       COALESCE(c.common, 0) AS common,
       du.d AS du,
       COALESCE(dv.d, 0) AS dv,
       CASE WHEN du.d + COALESCE(dv.d, 0) - COALESCE(c.common, 0) > 0
            THEN ROUND(CAST(COALESCE(c.common, 0) AS DOUBLE)
                       / (du.d + COALESCE(dv.d, 0) - COALESCE(c.common, 0)), 6)
            ELSE 0.0 END AS jaccard
FROM e
JOIN deg du ON du.node = e.src
LEFT JOIN deg dv ON dv.node = e.dst
LEFT JOIN com c ON c.u = e.src AND c.v = e.dst
"""


QUERIES["edge_jaccard"] = (q_edge_jaccard, _sql_edge_jaccard())


def q_late_events(sf_dir: str) -> pa.Table:
    """Out-of-order arrival audit (the streaming-watermark question
    asked of a static table): per event type, how many events carry a
    timestamp more than 1 hour behind the running per-user max at their
    ingest position (event_id = arrival order)? ONE user-key exchange;
    per-partition vectorized cummax over the arrival order; exact
    integer µs lateness."""
    import polars as pl

    from patito_ray.stages.agg import collect_table, merge_partial_sums
    from patito_ray.stages.exchange import hash_partition_ids
    from patito_ray.stages.join import default_num_partitions

    P = default_num_partitions()
    late_us = 3_600_000_000  # 1 hour
    ds = _rp(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def add_part(t: pa.Table) -> pa.Table:
        part = hash_partition_ids(t.column("user_id"), P, "late_events user")
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "event_id": t.column("event_id"),
                "tu": pc.cast(t.column("ts"), pa.int64()),
                "event_type": t.column("event_type"),
                "part": pa.array(part, pa.int64()),
            }
        )

    _p_sch = pa.schema(
        [
            ("event_type", pa.string()),
            ("n", pa.int64()),
            ("n_late", pa.int64()),
            ("max_late_us", pa.int64()),
        ]
    )

    def per_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.column_names:
            return _p_sch.empty_table()
        df = (
            pl.from_arrow(t.drop_columns(["part"]))
            .sort(["user_id", "event_id"], maintain_order=True)
            .with_columns(
                prevmax=pl.col("tu")
                .cum_max()
                .shift(1)
                .over("user_id")
            )
            .with_columns(
                late=(pl.col("prevmax") - pl.col("tu")).fill_null(0)
            )
        )
        return (
            df.group_by("event_type")
            .agg(
                pl.len().cast(pl.Int64).alias("n"),
                (pl.col("late") > late_us).sum().cast(pl.Int64).alias("n_late"),
                pl.col("late").max().cast(pl.Int64).alias("max_late_us"),
            )
            .to_arrow()
            .cast(_p_sch)
        )

    grouped = (
        ds.map_batches(add_part, batch_format="pyarrow", batch_size=None)
        .groupby("part")
        .map_groups(per_part, batch_format="pyarrow")
    )
    # per-type partials from disjoint user partitions: n/n_late sum,
    # max_late maxes — run sums and mins (of negated max) separately?
    # merge_partial_sums handles sums; fold max on the driver (type
    # count is tiny) via collect.
    parts = collect_table(grouped, empty_schema=_p_sch)
    import polars as pl2

    out = (
        pl2.from_arrow(parts)
        .group_by("event_type")
        .agg(
            pl2.col("n").sum(),
            pl2.col("n_late").sum(),
            pl2.col("max_late_us").max(),
        )
        .sort("event_type")
        .to_arrow()
        .cast(_p_sch)
    )
    return out


SQL_LATE_EVENTS = """
WITH w AS (
  SELECT event_type,
         epoch_us(ts) AS tu,
         MAX(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS prevmax
  FROM events
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN COALESCE(prevmax - tu, 0) > 3600000000
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
       CAST(MAX(COALESCE(prevmax - tu, 0)) AS BIGINT) AS max_late_us
FROM w GROUP BY event_type ORDER BY event_type
"""

QUERIES["late_events"] = (q_late_events, SQL_LATE_EVENTS)


_HC_SEEDS = list(range(8))
_HC_HOPS = 3


def q_harmonic_centrality(sf_dir: str, limit_bytes: int | None = None) -> pa.Table:
    """Bounded-horizon harmonic centrality of 8 seed documents over the
    deterministic link graph: H(s) = Σ_{d(s,v)<=3} 1/d(s,v), assembled
    from the EXACT integer hop histogram (r1 + r2/2 + r3/3 — no
    order-dependent float sum) of one multi-round BFS per seed
    (`functions/graph.py:bfs_hops`, adaptive broadcast/co-partition
    rounds)."""
    from patito_ray.functions.graph import bfs_hops
    from patito_ray.pipelines.q_wave3 import _doc_link_edges

    import ray.data as rd

    edges, n = _doc_link_edges(sf_dir, 3)
    # per-seed distances from ONE multi-round BFS: lift the graph to
    # its product with the seed set (edge (u,v) -> (s_idx*N+u,
    # s_idx*N+v) for every seed) so k seeds cost k-fold edge-scan WORK
    # (which k sequential BFS runs pay anyway) but only ONE set of
    # fixed per-round exchange/broadcast latencies instead of k.
    k = len(_HC_SEEDS)

    def lift(t: pa.Table) -> pa.Table:
        s_arr = t.column("src").to_numpy(zero_copy_only=False)
        d_arr = t.column("dst").to_numpy(zero_copy_only=False)
        off = np.repeat(np.arange(k, dtype=np.int64) * n, s_arr.size)
        return pa.table(
            {
                "src": pa.array(np.tile(s_arr, k) + off, pa.int64()),
                "dst": pa.array(np.tile(d_arr, k) + off, pa.int64()),
            }
        )

    lifted = edges.map_batches(lift, batch_format="pyarrow", batch_size=None)
    seeds = rd.from_arrow(
        pa.table(
            {
                "node": pa.array(
                    [i * n + s for i, s in enumerate(_HC_SEEDS)], pa.int64()
                )
            }
        )
    )
    _bfs_kw = {} if limit_bytes is None else {"broadcast_limit_ids": limit_bytes}
    dist = bfs_hops(lifted, seeds, _HC_HOPS, **_bfs_kw)
    if not isinstance(dist, pa.Table):
        import ray

        dist = dist.materialize()
        tabs = [t for t in ray.get(dist.to_arrow_refs()) if t.num_rows]
        dist = (
            pa.concat_tables(tabs)
            if tabs
            else pa.schema(
                [("node", pa.int64()), ("dist", pa.int64())]
            ).empty_table()
        )
    node = dist.column("node").to_numpy(zero_copy_only=False)
    d = dist.column("dist").to_numpy(zero_copy_only=False)
    sidx = node // n
    rows = []
    for i, s in enumerate(_HC_SEEDS):
        m = sidx == i
        r1 = int(((d == 1) & m).sum())
        r2 = int(((d == 2) & m).sum())
        r3 = int(((d == 3) & m).sum())
        h = _rf(r1 + r2 / 2.0 + r3 / 3.0, 6)
        rows.append((s, r1, r2, r3, h))
    return pa.table(
        {
            "seed": pa.array([r[0] for r in rows], pa.int64()),
            "r1": pa.array([r[1] for r in rows], pa.int64()),
            "r2": pa.array([r[2] for r in rows], pa.int64()),
            "r3": pa.array([r[3] for r in rows], pa.int64()),
            "h": pa.array([r[4] for r in rows], pa.float64()),
        }
    )


def _sql_harmonic_centrality() -> str:
    from patito_ray.pipelines.q_wave3 import _sql_link_edges

    seeds = ", ".join(str(s) for s in _HC_SEEDS)
    return f"""
WITH RECURSIVE {_sql_link_edges(3)},
e AS (SELECT DISTINCT src, dst FROM edges WHERE src <> dst),
sd AS (SELECT UNNEST([{seeds}]) AS seed),
walk(seed, node, d) AS (
  SELECT seed, CAST(seed AS BIGINT) AS node, 0 FROM sd
  UNION ALL
  SELECT w.seed, e.dst, w.d + 1
  FROM walk w JOIN e ON e.src = w.node
  WHERE w.d < {_HC_HOPS}
),
md AS (
  SELECT seed, node, CAST(MIN(d) AS BIGINT) AS d
  FROM walk GROUP BY seed, node
),
hist AS (
  SELECT seed,
         CAST(SUM(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT) AS r1,
         CAST(SUM(CASE WHEN d = 2 THEN 1 ELSE 0 END) AS BIGINT) AS r2,
         CAST(SUM(CASE WHEN d = 3 THEN 1 ELSE 0 END) AS BIGINT) AS r3
  FROM md GROUP BY seed
)
SELECT CAST(seed AS BIGINT) AS seed, r1, r2, r3,
       ROUND(r1 + r2/2.0 + r3/3.0, 6) AS h
FROM hist
"""


QUERIES["harmonic_centrality"] = (
    q_harmonic_centrality,
    _sql_harmonic_centrality(),
)


_AUD_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_audience_overlap(sf_dir: str, limit_bytes: int | None = None) -> pa.Table:
    """Exact audience overlap between every pair of event types via
    per-user type BITMASKS: distinct (user, type-bit) pairs merge
    adaptively, a second narrow merge ORs each user's bits (the rows
    are distinct, so SUM == OR), and the per-mask histogram (<= 2^5
    rows) answers ALL 10 pairwise intersections by inclusion — the
    exact version of the HLL-union/intersection estimate, at O(users)
    exchange volume and a 32-row final table."""
    import polars as pl

    from patito_ray.stages.agg import collect_table, merge_partial_sums

    ds = _rp(sf_dir, "events", ["user_id", "event_type"])
    bit_of = {t: 1 << i for i, t in enumerate(_AUD_TYPES)}

    _pairs_sch = pa.schema(
        [("user_id", pa.int64()), ("bit", pa.int64()), ("c", pa.int64())]
    )

    def pairs(t: pa.Table) -> pa.Table:
        # types outside _AUD_TYPES are EXCLUDED on both engines: the SQL
        # CASE without ELSE yields NULL (ignored by SUM DISTINCT), so the
        # Ray side must filter rather than KeyError on a new event type.
        bits = np.asarray(
            [bit_of.get(x, 0) for x in t.column("event_type").to_pylist()],
            dtype=np.int64,
        )
        keep = bits != 0
        if not keep.any():
            return _pairs_sch.empty_table()
        uid = np.asarray(
            t.column("user_id").to_pylist(), dtype=np.int64
        )[keep]
        bits = bits[keep]
        return (
            pl.DataFrame(
                {
                    "user_id": uid,
                    "bit": bits,
                }
            )
            .unique()
            .with_columns(pl.lit(1, dtype=pl.Int64).alias("c"))
            .to_arrow()
        )

    _kw = {} if limit_bytes is None else {"limit_bytes": limit_bytes}
    ub = merge_partial_sums(
        ds.map_batches(pairs, batch_format="pyarrow", batch_size=None),
        ["user_id", "bit"],
        ["c"],
        **_kw,
    )
    if isinstance(ub, pa.Table):
        import ray.data as rd

        ub = rd.from_arrow(ub)
    _ub_sch = pa.schema([("user_id", pa.int64()), ("bit", pa.int64())])
    ub = ub.map_batches(
        lambda t: t.select(["user_id", "bit"])
        if t.num_rows and "user_id" in t.column_names
        else _ub_sch.empty_table(),
        batch_format="pyarrow",
        batch_size=None,
    )
    masks = merge_partial_sums(ub, ["user_id"], ["bit"], **_kw)  # SUM == OR
    if not isinstance(masks, pa.Table):
        masks = collect_table(masks, empty_schema=_ub_sch)
    mk = masks.column("bit").to_numpy(zero_copy_only=False).astype(np.int64)
    hist = np.bincount(mk, minlength=32)
    rows = []
    for i, a in enumerate(_AUD_TYPES):
        for b in _AUD_TYPES[i + 1 :]:
            ba, bb = bit_of[a], bit_of[b]
            na = int(hist[(np.arange(32) & ba) > 0].sum())
            nb = int(hist[(np.arange(32) & bb) > 0].sum())
            inter = int(
                hist[((np.arange(32) & ba) > 0) & ((np.arange(32) & bb) > 0)].sum()
            )
            union = na + nb - inter
            rows.append(
                (
                    a,
                    b,
                    na,
                    nb,
                    inter,
                    _rf(inter / union, 6) if union else 0.0,
                )
            )
    return pa.table(
        {
            "type_a": pa.array([r[0] for r in rows], pa.string()),
            "type_b": pa.array([r[1] for r in rows], pa.string()),
            "na": pa.array([r[2] for r in rows], pa.int64()),
            "nb": pa.array([r[3] for r in rows], pa.int64()),
            "inter": pa.array([r[4] for r in rows], pa.int64()),
            "jaccard": pa.array([r[5] for r in rows], pa.float64()),
        }
    )


def _sql_audience_overlap() -> str:
    bit_case = " ".join(
        f"WHEN '{t}' THEN {1 << i}" for i, t in enumerate(_AUD_TYPES)
    )
    pair_rows = ", ".join(
        f"('{a}', '{b}', {1 << i}, {1 << (i + 1 + j)})"
        for i, a in enumerate(_AUD_TYPES)
        for j, b in enumerate(_AUD_TYPES[i + 1 :])
    )
    return f"""
WITH m AS (
  SELECT user_id,
         CAST(SUM(DISTINCT CASE event_type {bit_case} END) AS BIGINT) AS mask
  FROM events GROUP BY user_id
),
h AS (SELECT mask, CAST(COUNT(*) AS BIGINT) AS c FROM m GROUP BY mask),
p(type_a, type_b, ba, bb) AS (VALUES {pair_rows})
SELECT p.type_a, p.type_b,
       CAST(COALESCE(SUM(CASE WHEN (h.mask & p.ba) > 0 THEN h.c END), 0)
            AS BIGINT) AS na,
       CAST(COALESCE(SUM(CASE WHEN (h.mask & p.bb) > 0 THEN h.c END), 0)
            AS BIGINT) AS nb,
       CAST(COALESCE(SUM(CASE WHEN (h.mask & p.ba) > 0
                               AND (h.mask & p.bb) > 0 THEN h.c END), 0)
            AS BIGINT) AS inter,
       CASE WHEN COALESCE(SUM(CASE WHEN (h.mask & p.ba) > 0 THEN h.c END), 0)
                 + COALESCE(SUM(CASE WHEN (h.mask & p.bb) > 0 THEN h.c END), 0)
                 - COALESCE(SUM(CASE WHEN (h.mask & p.ba) > 0
                                      AND (h.mask & p.bb) > 0 THEN h.c END), 0)
                 = 0 THEN 0.0
            ELSE ROUND(
              CAST(COALESCE(SUM(CASE WHEN (h.mask & p.ba) > 0
                                      AND (h.mask & p.bb) > 0 THEN h.c END), 0)
                   AS DOUBLE)
              / (COALESCE(SUM(CASE WHEN (h.mask & p.ba) > 0 THEN h.c END), 0)
                 + COALESCE(SUM(CASE WHEN (h.mask & p.bb) > 0 THEN h.c END), 0)
                 - COALESCE(SUM(CASE WHEN (h.mask & p.ba) > 0
                                      AND (h.mask & p.bb) > 0 THEN h.c END), 0)),
              6) END AS jaccard
FROM p LEFT JOIN h ON TRUE
GROUP BY p.type_a, p.type_b
"""


QUERIES["audience_overlap"] = (q_audience_overlap, _sql_audience_overlap())


def q_changepoint_day(sf_dir: str, limit_bytes: int | None = None) -> pa.Table:
    """Exact single-changepoint detection on the daily-revenue series:
    the split minimizing total within-segment SSE, i.e. maximizing
    g(t) = S_l²/n_l + S_r²/n_r. Both engines evaluate the IDENTICAL
    double expression (CAST(S AS DOUBLE)² / n) over the identical
    integer prefix sums and break ties toward the earlier day, so the
    argmax is bit-determined. Daily sums ride the one narrow exchange;
    the scan over the calendar-bounded series is driver-side."""
    day, cents = _daily_lineitem_cents(sf_dir, limit_bytes)
    n = cents.size
    if n < 2:
        return _one_row(
            split_d=None, n_l=0, n_r=0, mean_l=None, mean_r=None
        )
    csum = np.cumsum(cents)
    total = int(csum[-1])
    nl = np.arange(1, n, dtype=np.int64)  # split AFTER position t-1
    sl = csum[:-1].astype(np.float64)
    sr = (total - csum[:-1]).astype(np.float64)
    g = sl * sl / nl + sr * sr / (n - nl)
    t = int(np.argmax(g))  # first max == earliest-day tie-break
    n_l = int(nl[t])
    n_r = n - n_l
    s_l = int(csum[t])
    s_r = total - s_l
    return pa.table(
        {
            "split_d": _day_ts(day[t : t + 1]),
            "n_l": pa.array([n_l], pa.int64()),
            "n_r": pa.array([n_r], pa.int64()),
            "mean_l": pa.array([_rf(s_l / n_l, 6)], pa.float64()),
            "mean_r": pa.array([_rf(s_r / n_r, 6)], pa.float64()),
        }
    )


SQL_CHANGEPOINT_DAY = """
WITH daily AS (
  SELECT CAST(l_shipdate AS DATE) AS d,
         CAST(SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents
  FROM lineitem GROUP BY 1
),
pre AS (
  SELECT d,
         CAST(SUM(cents) OVER (ORDER BY d) AS BIGINT) AS sl,
         CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS nl,
         CAST(SUM(cents) OVER () AS BIGINT) AS s,
         CAST(COUNT(*) OVER () AS BIGINT) AS n
  FROM daily
),
g AS (
  SELECT d, sl, nl, s, n,
         CAST(sl AS DOUBLE)*CAST(sl AS DOUBLE)/nl
         + CAST(s - sl AS DOUBLE)*CAST(s - sl AS DOUBLE)/(n - nl) AS gval
  FROM pre WHERE nl < n
)
SELECT d AS split_d,
       nl AS n_l,
       n - nl AS n_r,
       ROUND(CAST(sl AS DOUBLE)/nl, 6) AS mean_l,
       ROUND(CAST(s - sl AS DOUBLE)/(n - nl), 6) AS mean_r
FROM g ORDER BY gval DESC, d ASC LIMIT 1
"""

QUERIES["changepoint_day"] = (q_changepoint_day, SQL_CHANGEPOINT_DAY)


def q_label_separability(sf_dir: str, limit_bytes: int | None = None) -> pa.Table:
    """Per-dimension class separability of the embedding space: the
    ANOVA F ratio of between-label to within-label variance for every
    one of the 64 dimensions, from ONE streaming (label, dim) integer
    moment pass on the 1e-3 quantized grid (embed_covariance
    precedent). Ranks which embedding dimensions carry the label
    signal — the feature-selection question asked before training a
    cheap probe."""
    import polars as pl

    from patito_ray.stages.agg import collect_table, merge_partial_sums

    ds = _rp(sf_dir, "embeddings", ["embedding", "label"])
    D = 64

    def partial(t: pa.Table) -> pa.Table:
        sch = pa.schema(
            [
                ("label", pa.int64()),
                ("dim", pa.int64()),
                ("n", pa.int64()),
                ("s", pa.int64()),
                ("qq", pa.int64()),
            ]
        )
        if t.num_rows == 0:
            return sch.empty_table()
        lab = (
            pc.cast(t.column("label"), pa.int64())
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        # list<float> -> (rows, 64) int64 on the 1e-3 grid
        flat = pc.list_flatten(t.column("embedding")).to_numpy(
            zero_copy_only=False
        )
        q = np.floor(flat.astype(np.float64) * 1000.0 + 0.5).astype(
            np.int64
        ).reshape(-1, D)
        labs, dims, ns, ss, qqs = [], [], [], [], []
        for lv in np.unique(lab):
            m = lab == lv
            qm = q[m]
            labs.extend([int(lv)] * D)
            dims.extend(range(D))
            ns.extend([int(m.sum())] * D)
            ss.extend(qm.sum(axis=0).tolist())
            qqs.extend((qm * qm).sum(axis=0).tolist())
        return pa.table(
            {
                "label": pa.array(labs, pa.int64()),
                "dim": pa.array(dims, pa.int64()),
                "n": pa.array(ns, pa.int64()),
                "s": pa.array(ss, pa.int64()),
                "qq": pa.array(qqs, pa.int64()),
            },
            schema=sch,
        )

    _kw = {} if limit_bytes is None else {"limit_bytes": limit_bytes}
    merged = merge_partial_sums(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["label", "dim"],
        ["n", "s", "qq"],
        **_kw,
    )
    if not isinstance(merged, pa.Table):
        merged = collect_table(
            merged,
            empty_schema=pa.schema(
                [
                    ("label", pa.int64()),
                    ("dim", pa.int64()),
                    ("n", pa.int64()),
                    ("s", pa.int64()),
                    ("qq", pa.int64()),
                ]
            ),
        )
    df = pl.from_arrow(merged)
    out_dim, out_f = [], []
    for d in range(D):
        g = df.filter(pl.col("dim") == d)
        n = int(g.get_column("n").sum())
        k = g.height
        s_all = int(g.get_column("s").sum())
        qq_all = int(g.get_column("qq").sum())
        sb = float(
            (
                g.get_column("s").cast(pl.Float64) ** 2
                / g.get_column("n").cast(pl.Float64)
            ).sum()
        )
        ssb = sb - float(s_all) * float(s_all) / float(n)
        ssw = float(qq_all) - sb
        out_dim.append(d)
        if k < 2 or n <= k or ssw <= 0:
            out_f.append(None)
        else:
            out_f.append(_rf((ssb / (k - 1.0)) / (ssw / (n - float(k))), 6))
    return pa.table(
        {
            "dim": pa.array(out_dim, pa.int64()),
            "f": pa.array(out_f, pa.float64()),
        }
    )


SQL_LABEL_SEPARABILITY = """
WITH e AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label, t.i AS i,
         CAST(FLOOR(CAST(embedding[CAST(t.i + 1 AS INT)] AS DOUBLE)
                    * 1000 + 0.5) AS BIGINT) AS q
  FROM embeddings, range(64) t(i)
),
g AS (
  SELECT label, i,
         CAST(COUNT(*) AS BIGINT) AS n_l,
         CAST(SUM(q) AS BIGINT) AS s_l,
         CAST(SUM(q*q) AS BIGINT) AS qq
  FROM e GROUP BY 1, 2
),
agg AS (
  SELECT i,
         CAST(SUM(n_l) AS BIGINT) AS n,
         CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(s_l) AS BIGINT) AS s_all,
         CAST(SUM(qq) AS BIGINT) AS qq_all,
         SUM(CAST(s_l AS DOUBLE)*CAST(s_l AS DOUBLE)/CAST(n_l AS DOUBLE)) AS sb
  FROM g GROUP BY i
)
SELECT CAST(i AS BIGINT) AS dim,
       CASE WHEN k < 2 OR n <= k
                 OR CAST(qq_all AS DOUBLE) - sb <= 0 THEN NULL
            ELSE ROUND(
              ((sb - CAST(s_all AS DOUBLE)*CAST(s_all AS DOUBLE)
                     /CAST(n AS DOUBLE)) / (k - 1.0))
              / ((CAST(qq_all AS DOUBLE) - sb) / (CAST(n AS DOUBLE) - k)), 6)
       END AS f
FROM agg
"""

QUERIES["label_separability"] = (q_label_separability, SQL_LABEL_SEPARABILITY)


def q_srm_check(sf_dir: str, limit_bytes: int | None = None) -> pa.Table:
    """Sample-ratio-mismatch audit of the deterministic 80/10/10 split
    (the experiment-assignment validation every A/B platform runs):
    exact per-split counts from the splitmix assignment, then ONE fixed
    chi-square expression against the declared proportions, flagged at
    the df=2 / alpha=0.05 critical value. Counts are bit-determined
    (the same splitmix-in-SQL twin as split_assign), the chi2 term
    order is written out explicitly so both engines evaluate the
    identical float expression."""
    import polars as pl

    from patito_ray.functions.sampling import assign_splits
    from patito_ray.stages.agg import collect_table, merge_partial_sums

    ds = _rp(sf_dir, "documents", ["doc_id"])
    assigned = assign_splits(
        ds, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}, seed=0
    )

    def cpart(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(t.select(["split"]))
            .group_by("split")
            .agg(pl.len().cast(pl.Int64).alias("c"))
            .to_arrow()
        )

    _kw = {} if limit_bytes is None else {"limit_bytes": limit_bytes}
    merged = merge_partial_sums(
        assigned.map_batches(cpart, batch_format="pyarrow", batch_size=None),
        ["split"],
        ["c"],
        **_kw,
    )
    if not isinstance(merged, pa.Table):
        merged = collect_table(
            merged,
            empty_schema=pa.schema([("split", pa.string()), ("c", pa.int64())]),
        )
    counts = dict(
        zip(
            merged.column("split").to_pylist(),
            merged.column("c").to_pylist(),
        )
    )
    nt = int(counts.get("train", 0))
    nv = int(counts.get("val", 0))
    ns = int(counts.get("test", 0))
    n = nt + nv + ns
    if n == 0:
        return _one_row(n=0, n_train=0, n_val=0, n_test=0, chi2=None, srm=None)
    chi2 = (
        (nt - n * 0.8) * (nt - n * 0.8) / (n * 0.8)
        + (nv - n * 0.1) * (nv - n * 0.1) / (n * 0.1)
        + (ns - n * 0.1) * (ns - n * 0.1) / (n * 0.1)
    )
    return _one_row(
        n=n,
        n_train=nt,
        n_val=nv,
        n_test=ns,
        chi2=_rf(chi2, 6),
        srm=chi2 > 5.991,
    )


def _sql_srm_check() -> str:
    from patito_ray.pipelines.q_wave2 import _sql_split_assign

    return f"""
WITH counts AS (
  SELECT
    CAST(SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS nt,
    CAST(SUM(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS BIGINT) AS nv,
    CAST(SUM(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT) AS ns,
    CAST(COUNT(*) AS BIGINT) AS n
  FROM ({_sql_split_assign()}) a
)
SELECT n, nt AS n_train, nv AS n_val, ns AS n_test,
       ROUND(
         (nt - n*0.8)*(nt - n*0.8)/(n*0.8)
         + (nv - n*0.1)*(nv - n*0.1)/(n*0.1)
         + (ns - n*0.1)*(ns - n*0.1)/(n*0.1), 6) AS chi2,
       (nt - n*0.8)*(nt - n*0.8)/(n*0.8)
         + (nv - n*0.1)*(nv - n*0.1)/(n*0.1)
         + (ns - n*0.1)*(ns - n*0.1)/(n*0.1) > 5.991 AS srm
FROM counts
"""


QUERIES["srm_check"] = (q_srm_check, _sql_srm_check())


def q_zipf_slope(sf_dir: str, limit_bytes: int | None = None) -> pa.Table:
    """Zipf's-law fit over the corpus vocabulary: the OLS slope of
    ln(freq) on ln(rank) (rank by freq desc, token asc). One
    distributed term-count pass; both ln values quantize to the integer
    1e-9 grid on BOTH engines (dsir precedent), so the regression
    moments are exact integers (Python-int folds past 2^63, HUGEINT in
    SQL) and only the final slope expression is float."""
    import polars as pl

    from patito_ray.functions.tfidf import re2_split_tokens
    from patito_ray.stages.agg import collect_table, merge_partial_sums

    ds = _rp(sf_dir, "documents", ["text"])

    def tok_partials(t: pa.Table) -> pa.Table:
        flat, _parents, _ = re2_split_tokens(t.column("text"))
        return (
            pl.DataFrame({"tok": flat.to_pylist()})
            .group_by("tok")
            .agg(pl.len().cast(pl.Int64).alias("c"))
            .to_arrow()
        )

    _kw = {} if limit_bytes is None else {"limit_bytes": limit_bytes}
    counts = merge_partial_sums(
        ds.map_batches(tok_partials, batch_format="pyarrow", batch_size=None),
        ["tok"],
        ["c"],
        **_kw,
    )
    if not isinstance(counts, pa.Table):
        counts = collect_table(
            counts,
            empty_schema=pa.schema([("tok", pa.string()), ("c", pa.int64())]),
        )
    if counts.num_rows == 0:
        return _one_row(v=0, slope=None)
    df = pl.from_arrow(counts).sort(
        ["c", "tok"], descending=[True, False], maintain_order=True
    )
    c = df.get_column("c").to_numpy().astype(np.int64)
    v = c.size
    rank = np.arange(1, v + 1, dtype=np.int64)
    x = np.floor(np.log(rank.astype(np.float64)) * 1e9 + 0.5).astype(np.int64)
    y = np.floor(np.log(c.astype(np.float64)) * 1e9 + 0.5).astype(np.int64)
    sx = sum(int(a) for a in x)
    sy = sum(int(a) for a in y)
    sxy = sum(int(a) * int(b) for a, b in zip(x, y))
    sxx = sum(int(a) * int(a) for a in x)
    num = v * sxy - sx * sy
    den = v * sxx - sx * sx
    slope = None if den == 0 else _rf(float(num) / float(den), 6)
    return _one_row(v=v, slope=slope)


SQL_ZIPF_SLOPE = """
WITH tok AS (
  SELECT UNNEST(regexp_extract_all(text, '\\S+')) AS t FROM documents
),
counts AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY t),
ranked AS (
  SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, t ASC) AS r FROM counts
),
q AS (
  SELECT CAST(FLOOR(ln(CAST(r AS DOUBLE)) * 1e9 + 0.5) AS HUGEINT) AS x,
         CAST(FLOOR(ln(CAST(c AS DOUBLE)) * 1e9 + 0.5) AS HUGEINT) AS y
  FROM ranked
),
mom AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS v,
         SUM(x) AS sx, SUM(y) AS sy, SUM(x*y) AS sxy, SUM(x*x) AS sxx
  FROM q
)
SELECT CAST(v AS BIGINT) AS v,
       CASE WHEN v*sxx - sx*sx = 0 THEN NULL
            ELSE ROUND(CAST(v*sxy - sx*sy AS DOUBLE)
                       / CAST(v*sxx - sx*sx AS DOUBLE), 6) END AS slope
FROM mom
"""

QUERIES["zipf_slope"] = (q_zipf_slope, SQL_ZIPF_SLOPE)


def q_ljung_box(sf_dir: str, limit_bytes: int | None = None) -> pa.Table:
    """Ljung-Box portmanteau statistic over the daily-revenue series at
    lags 1..7: Q = n(n+2)·Σ_k r_k²/(n−k). The r_k come from the same
    exact integer lag moments as acf_lags (Pearson over aligned day
    pairs); the Σ_k spans <= 7 O(1e-3) terms, so any summation-order
    skew is ~1e-19 — far inside the 1e-6 rounding. Lags with no aligned
    pairs or zero variance contribute nothing (both sides skip them
    identically)."""
    day, cents = _daily_lineitem_cents(sf_dir, limit_bytes)
    n = int(day.size)
    if n == 0:
        return _one_row(n_days=0, k_used=0, q=None)
    q_acc = 0.0
    k_used = 0
    for k in range(1, 8):
        mom = _lag_moments(day, cents, k)
        if mom is None:
            continue
        m, sx, sy, sxy, sxx, syy = mom
        dx = float(m * sxx - sx * sx)
        dy = float(m * syy - sy * sy)
        if dx <= 0 or dy <= 0 or n <= k:
            continue
        r = float(m * sxy - sx * sy) / (float(np.sqrt(dx)) * float(np.sqrt(dy)))
        q_acc += r * r / (n - k)
        k_used += 1
    q = _rf(float(n) * (n + 2.0) * q_acc, 6) if k_used else None
    return _one_row(n_days=n, k_used=k_used, q=q)


SQL_LJUNG_BOX = """
WITH daily AS (
  SELECT CAST(l_shipdate AS DATE) AS d,
         CAST(SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents
  FROM lineitem GROUP BY 1
),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily),
k AS (SELECT UNNEST(RANGE(1, 8)) AS lag),
mom AS (
  SELECT k.lag,
         CAST(COUNT(*) AS HUGEINT) AS m,
         CAST(SUM(CAST(a.cents AS HUGEINT)) AS HUGEINT) AS sx,
         CAST(SUM(CAST(b.cents AS HUGEINT)) AS HUGEINT) AS sy,
         CAST(SUM(CAST(a.cents AS HUGEINT)*CAST(b.cents AS HUGEINT))
              AS HUGEINT) AS sxy,
         CAST(SUM(CAST(a.cents AS HUGEINT)*CAST(a.cents AS HUGEINT))
              AS HUGEINT) AS sxx,
         CAST(SUM(CAST(b.cents AS HUGEINT)*CAST(b.cents AS HUGEINT))
              AS HUGEINT) AS syy
  FROM daily a
  JOIN k ON TRUE
  JOIN daily b ON b.d = a.d + CAST(k.lag AS INTEGER)
  GROUP BY k.lag
),
terms AS (
  SELECT lag,
         CAST(m*sxy - sx*sy AS DOUBLE)
         / (sqrt(CAST(m*sxx - sx*sx AS DOUBLE))
            * sqrt(CAST(m*syy - sy*sy AS DOUBLE))) AS r
  FROM mom, nn
  WHERE m*sxx - sx*sx > 0 AND m*syy - sy*sy > 0 AND nn.n > lag
),
-- the SUM over <=7 O(1e-3) terms tolerates any order: a reorder
-- perturbs Q by ~1e-19, absorbed by the 1e-6 rounding
ordered AS (
  SELECT r, CAST(lag AS BIGINT) AS lag,
         ROW_NUMBER() OVER (ORDER BY lag) AS i
  FROM terms
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k_used FROM ordered
)
SELECT nn.n AS n_days, agg.k_used,
       CASE WHEN agg.k_used = 0 THEN NULL
            ELSE ROUND(CAST(nn.n AS DOUBLE) * (nn.n + 2.0) * (
              SELECT COALESCE(SUM(o.r*o.r/(nn2.n - o.lag)), 0)
              FROM ordered o, nn nn2
            ), 6) END AS q
FROM nn, agg
"""

QUERIES["ljung_box"] = (q_ljung_box, SQL_LJUNG_BOX)


def q_adf_test(sf_dir: str, limit_bytes: int | None = None) -> pa.Table:
    """Simplified Dickey-Fuller unit-root probe on the daily-revenue
    series (no lag terms, intercept included): regress Δc_t on c_{t-1}
    over consecutive-day pairs. Every regression moment is an exact
    integer (Python-int folds, HUGEINT oracle); beta and the t
    statistic are one shared float expression each, rounded once. A
    strongly negative t rejects the unit root (mean-reverting
    revenue)."""
    day, cents = _daily_lineitem_cents(sf_dir, limit_bytes)
    idx = np.searchsorted(day, day + 1)
    ok = (idx < day.size) & (day[np.minimum(idx, day.size - 1)] == day + 1)
    if not ok.any():
        return _one_row(n_pairs=0, beta=None, t_stat=None)
    x = cents[ok]
    ynext = cents[np.minimum(idx, day.size - 1)[ok]]
    m = int(ok.sum())
    sx = sum(int(a) for a in x.tolist())
    sxy = 0
    sy = 0
    syy = 0
    sxx = 0
    for a, b in zip(x.tolist(), ynext.tolist()):
        dchg = int(b) - int(a)
        sy += dchg
        syy += dchg * dchg
        sxy += int(a) * dchg
        sxx += int(a) * int(a)
    den = m * sxx - sx * sx
    if den <= 0 or m <= 2:
        return _one_row(n_pairs=m, beta=None, t_stat=None)
    num = m * sxy - sx * sy
    beta = float(num) / float(den)
    syy_c = float(m * syy - sy * sy)
    sxy_c = float(num)
    s2 = (syy_c - beta * sxy_c) / float(m) / (m - 2.0)
    t_stat = (
        None
        if s2 <= 0
        else _rf(beta / float(np.sqrt(s2 * m / float(den))), 6)
    )
    return _one_row(n_pairs=m, beta=_rf(beta, 6), t_stat=t_stat)


SQL_ADF_TEST = """
WITH daily AS (
  SELECT CAST(l_shipdate AS DATE) AS d,
         CAST(SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents
  FROM lineitem GROUP BY 1
),
p AS (
  SELECT a.cents AS x, b.cents - a.cents AS dy
  FROM daily a JOIN daily b ON b.d = a.d + 1
),
mom AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS m,
         CAST(SUM(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
         CAST(SUM(CAST(dy AS HUGEINT)) AS HUGEINT) AS sy,
         CAST(SUM(CAST(x AS HUGEINT)*CAST(dy AS HUGEINT)) AS HUGEINT) AS sxy,
         CAST(SUM(CAST(x AS HUGEINT)*CAST(x AS HUGEINT)) AS HUGEINT) AS sxx,
         CAST(SUM(CAST(dy AS HUGEINT)*CAST(dy AS HUGEINT)) AS HUGEINT) AS syy
  FROM p
)
SELECT CAST(m AS BIGINT) AS n_pairs,
       CASE WHEN m*sxx - sx*sx <= 0 OR m <= 2 THEN NULL
            ELSE ROUND(CAST(m*sxy - sx*sy AS DOUBLE)
                       / CAST(m*sxx - sx*sx AS DOUBLE), 6) END AS beta,
       CASE WHEN m*sxx - sx*sx <= 0 OR m <= 2 THEN NULL
            WHEN (CAST(m*syy - sy*sy AS DOUBLE)
                  - (CAST(m*sxy - sx*sy AS DOUBLE)
                     / CAST(m*sxx - sx*sx AS DOUBLE))
                    * CAST(m*sxy - sx*sy AS DOUBLE))
                 / CAST(m AS DOUBLE) / (CAST(m AS DOUBLE) - 2.0) <= 0 THEN NULL
            ELSE ROUND(
              (CAST(m*sxy - sx*sy AS DOUBLE) / CAST(m*sxx - sx*sx AS DOUBLE))
              / sqrt(
                  ((CAST(m*syy - sy*sy AS DOUBLE)
                    - (CAST(m*sxy - sx*sy AS DOUBLE)
                       / CAST(m*sxx - sx*sx AS DOUBLE))
                      * CAST(m*sxy - sx*sy AS DOUBLE))
                   / CAST(m AS DOUBLE) / (CAST(m AS DOUBLE) - 2.0))
                  * CAST(m AS DOUBLE) / CAST(m*sxx - sx*sx AS DOUBLE)), 6)
       END AS t_stat
FROM mom
"""

QUERIES["adf_test"] = (q_adf_test, SQL_ADF_TEST)


def q_grouped_changepoint(sf_dir: str, limit_bytes: int | None = None) -> pa.Table:
    """Exact single-changepoint detection PER EVENT TYPE over each
    type's daily event-value series (the per-segment form of
    changepoint_day): one narrow (type, day, cents) partial-sum
    exchange, then the same bit-determined argmax of
    S_l²/n_l + S_r²/n_r with the earliest-day tie-break, evaluated
    per type on the calendar-bounded driver table."""
    import polars as pl

    from patito_ray.stages.agg import collect_table, merge_partial_sums

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("value")))
        us = pc.cast(t.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
        cents = np.floor(
            t.column("value").to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        return (
            pl.DataFrame(
                {
                    "event_type": t.column("event_type").to_pylist(),
                    "day": us // _US_PER_DAY,
                    "cents": cents,
                }
            )
            .group_by(["event_type", "day"])
            .agg(pl.col("cents").sum())
            .to_arrow()
        )

    ds = _rp(sf_dir, "events", ["event_type", "ts", "value"]).map_batches(
        partial, batch_format="pyarrow", batch_size=None
    )
    _kw = {} if limit_bytes is None else {"limit_bytes": limit_bytes}
    merged = merge_partial_sums(ds, ["event_type", "day"], ["cents"], **_kw)
    if not isinstance(merged, pa.Table):
        merged = collect_table(
            merged,
            empty_schema=pa.schema(
                [
                    ("event_type", pa.string()),
                    ("day", pa.int64()),
                    ("cents", pa.int64()),
                ]
            ),
        )
    et = np.asarray(merged.column("event_type").to_pylist())
    day = merged.column("day").to_numpy(zero_copy_only=False).astype(np.int64)
    cents = merged.column("cents").to_numpy(zero_copy_only=False).astype(np.int64)
    types, split_ds, nls, nrs, mls, mrs = [], [], [], [], [], []
    for g in sorted(set(et.tolist())):
        m = et == g
        d = day[m]
        c = cents[m]
        order = np.argsort(d)
        d, c = d[order], c[order]
        n = c.size
        if n < 2:
            continue  # SQL emits no row for a 1-day type
        csum = np.cumsum(c)
        total = int(csum[-1])
        nl = np.arange(1, n, dtype=np.int64)
        sl = csum[:-1].astype(np.float64)
        sr = (total - csum[:-1]).astype(np.float64)
        gval = sl * sl / nl + sr * sr / (n - nl)
        t_i = int(np.argmax(gval))
        n_l = int(nl[t_i])
        n_r = n - n_l
        s_l = int(csum[t_i])
        s_r = total - s_l
        types.append(g)
        split_ds.append(int(d[t_i]))
        nls.append(n_l)
        nrs.append(n_r)
        mls.append(_rf(s_l / n_l, 6))
        mrs.append(_rf(s_r / n_r, 6))
    return pa.table(
        {
            "event_type": pa.array(types, pa.string()),
            "split_d": _day_ts(np.asarray(split_ds, dtype=np.int64)),
            "n_l": pa.array(nls, pa.int64()),
            "n_r": pa.array(nrs, pa.int64()),
            "mean_l": pa.array(mls, pa.float64()),
            "mean_r": pa.array(mrs, pa.float64()),
        }
    )


SQL_GROUPED_CHANGEPOINT = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         CAST(SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
  FROM events WHERE value IS NOT NULL
  GROUP BY 1, 2
),
pre AS (
  SELECT event_type, d,
         CAST(SUM(cents) OVER (PARTITION BY event_type ORDER BY d)
              AS BIGINT) AS sl,
         CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d)
              AS BIGINT) AS nl,
         CAST(SUM(cents) OVER (PARTITION BY event_type) AS BIGINT) AS s,
         CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM daily
),
g AS (
  SELECT event_type, d, sl, nl, s, n,
         CAST(sl AS DOUBLE)*CAST(sl AS DOUBLE)/nl
         + CAST(s - sl AS DOUBLE)*CAST(s - sl AS DOUBLE)/(n - nl) AS gval,
         ROW_NUMBER() OVER (
           PARTITION BY event_type
           ORDER BY CAST(sl AS DOUBLE)*CAST(sl AS DOUBLE)/nl
                    + CAST(s - sl AS DOUBLE)*CAST(s - sl AS DOUBLE)/(n - nl)
                    DESC, d ASC
         ) AS pick
  FROM pre WHERE nl < n
)
SELECT event_type,
       CAST(d AS TIMESTAMP) AS split_d,
       nl AS n_l,
       n - nl AS n_r,
       ROUND(CAST(sl AS DOUBLE)/nl, 6) AS mean_l,
       ROUND(CAST(s - sl AS DOUBLE)/(n - nl), 6) AS mean_r
FROM g WHERE pick = 1
"""

QUERIES["grouped_changepoint"] = (q_grouped_changepoint, SQL_GROUPED_CHANGEPOINT)
