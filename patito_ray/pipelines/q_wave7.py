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
    s = 0.0
    for _, ng, drs in rows:
        s += float(drs) * float(drs) / (4.0 * ng)
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
         SUM(CAST(drs AS DOUBLE)*CAST(drs AS DOUBLE)/(4.0*ng)) AS s
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
    sb = 0.0  # Σ s_g²/n_g
    for g in groups:
        m = et == g
        ng = int(cnt[m].sum())
        sg = sum(int(v) * int(c) for v, c in zip(cents[m], cnt[m]))
        qg = sum(int(v) * int(v) * int(c) for v, c in zip(cents[m], cnt[m]))
        s_all += sg
        sq_all += qg
        sb += float(sg) * float(sg) / float(ng)
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
         SUM(CAST(sg AS DOUBLE)*CAST(sg AS DOUBLE)/CAST(ng AS DOUBLE)) AS sb
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
    sb = 0.0
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
        sb += float(sg) * float(sg) / float(ng)
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
         SUM(CAST(sg AS DOUBLE)*CAST(sg AS DOUBLE)/CAST(ng AS DOUBLE)) AS sb
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

    def pairs(t: pa.Table) -> pa.Table:
        bits = np.asarray(
            [bit_of[x] for x in t.column("event_type").to_pylist()],
            dtype=np.int64,
        )
        return (
            pl.DataFrame(
                {
                    "user_id": t.column("user_id").to_pylist(),
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


# ---------------------------------------------------------------------------
# wave 8: paired/ordered categorical tests + calendar ANOVA + grouped runs
# ---------------------------------------------------------------------------


def q_mcnemar_test(sf_dir: str, limit_bytes: int | None = None) -> pa.Table:
    """McNemar's paired test: did per-user conversion (any event with
    value > 150) CHANGE between the first and second half of the
    observation window? The halves split at the integer-µs midpoint of
    (min_ts, max_ts) — one tiny min/max pass — then ONE narrow user
    exchange carries (user, conv_h1, conv_h2) indicator partials. The
    discordant counts b (converted then not) and c (not then converted)
    are exact integers; the statistic (b−c)²/(b+c) is one float."""
    import polars as pl

    from patito_ray.stages.agg import collect_table, merge_partial_sums

    ds = _rp(sf_dir, "events", ["user_id", "ts", "value"])

    def mm(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
        if us.size == 0:
            return pa.table(
                {"k": pa.array([], pa.int64()),
                 "mn": pa.array([], pa.int64()),
                 "mx": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "k": pa.array([0], pa.int64()),
                "mn": pa.array([-int(us.min())], pa.int64()),  # max of -x
                "mx": pa.array([int(us.max())], pa.int64()),
            }
        )

    from patito_ray.stages.agg import merge_partial_mins  # noqa: F401

    # min/max via one tiny max-merge (mn negated)
    import ray

    mmt = collect_table(
        ds.map_batches(mm, batch_format="pyarrow", batch_size=None),
        empty_schema=pa.schema(
            [("k", pa.int64()), ("mn", pa.int64()), ("mx", pa.int64())]
        ),
    )
    if mmt.num_rows == 0:
        return _one_row(n_pairs=0, b=0, c=0, chi2=None)
    mn = -int(pc.max(mmt.column("mn")).as_py())
    mx = int(pc.max(mmt.column("mx")).as_py())
    mid = (mn + mx) // 2

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("value")))
        us = pc.cast(t.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
        conv = (
            t.column("value").to_numpy(zero_copy_only=False) > 150.0
        )
        h1 = (us <= mid) & conv
        h2 = (us > mid) & conv
        return (
            pl.DataFrame(
                {
                    "user_id": t.column("user_id").to_pylist(),
                    "c1": h1.astype(np.int64),
                    "c2": h2.astype(np.int64),
                }
            )
            .group_by("user_id")
            .agg(pl.col("c1").sum(), pl.col("c2").sum())
            .to_arrow()
        )

    _kw = {} if limit_bytes is None else {"limit_bytes": limit_bytes}
    merged = merge_partial_sums(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["user_id"],
        ["c1", "c2"],
        **_kw,
    )
    if not isinstance(merged, pa.Table):
        merged = collect_table(
            merged,
            empty_schema=pa.schema(
                [("user_id", pa.int64()), ("c1", pa.int64()), ("c2", pa.int64())]
            ),
        )
    c1 = merged.column("c1").to_numpy(zero_copy_only=False) > 0
    c2 = merged.column("c2").to_numpy(zero_copy_only=False) > 0
    b = int((c1 & ~c2).sum())
    c = int((~c1 & c2).sum())
    chi2 = None if b + c == 0 else _rf(float(b - c) * (b - c) / (b + c), 6)
    return _one_row(n_pairs=merged.num_rows, b=b, c=c, chi2=chi2)


SQL_MCNEMAR_TEST = """
WITH mm AS (
  SELECT epoch_us(MIN(ts)) AS mn, epoch_us(MAX(ts)) AS mx FROM events
),
u AS (
  SELECT user_id,
         MAX(CASE WHEN epoch_us(ts) <= (SELECT (mn + mx)//2 FROM mm)
                   AND value > 150.0 THEN 1 ELSE 0 END) AS c1,
         MAX(CASE WHEN epoch_us(ts) > (SELECT (mn + mx)//2 FROM mm)
                   AND value > 150.0 THEN 1 ELSE 0 END) AS c2
  FROM events WHERE value IS NOT NULL
  GROUP BY user_id
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(SUM(CASE WHEN c1 = 1 AND c2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
         CAST(SUM(CASE WHEN c1 = 0 AND c2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c
  FROM u
)
SELECT n_pairs, b, c,
       CASE WHEN b + c = 0 THEN NULL
            ELSE ROUND(CAST(b - c AS DOUBLE)*(b - c)/(b + c), 6) END AS chi2
FROM agg
"""

QUERIES["mcnemar_test"] = (q_mcnemar_test, SQL_MCNEMAR_TEST)


def q_cochran_armitage(sf_dir: str, limit_bytes: int | None = None) -> pa.Table:
    """Cochran-Armitage trend test: does the high-value-order rate
    (o_totalprice > 200k) trend monotonically across the FIVE ordered
    priority levels (scores 1..5 from the level prefix)? Per-level
    (n_i, r_i) integer partials ride one tiny merge; the z² statistic
    N(N·Σw r − R·Σw n)² / (R(N−R)(N·Σw²n − (Σw n)²)) assembles from
    exact integers (Python ints vs HUGEINT) with one final float."""
    import polars as pl

    from patito_ray.stages.agg import collect_table, merge_partial_sums

    ds = _rp(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        pr = np.asarray(t.column("o_orderpriority").to_pylist())
        conv = (
            t.column("o_totalprice").to_numpy(zero_copy_only=False) > 200_000.0
        ).astype(np.int64)
        return (
            pl.DataFrame(
                {
                    "w": np.asarray([int(p[0]) for p in pr], dtype=np.int64),
                    "n": np.ones(len(pr), dtype=np.int64),
                    "r": conv,
                }
            )
            .group_by("w")
            .agg(pl.col("n").sum(), pl.col("r").sum())
            .to_arrow()
        )

    _kw = {} if limit_bytes is None else {"limit_bytes": limit_bytes}
    merged = merge_partial_sums(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["w"],
        ["n", "r"],
        **_kw,
    )
    if not isinstance(merged, pa.Table):
        merged = collect_table(
            merged,
            empty_schema=pa.schema(
                [("w", pa.int64()), ("n", pa.int64()), ("r", pa.int64())]
            ),
        )
    w = merged.column("w").to_numpy(zero_copy_only=False).astype(np.int64)
    n_i = merged.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
    r_i = merged.column("r").to_numpy(zero_copy_only=False).astype(np.int64)
    n = int(n_i.sum())
    r = int(r_i.sum())
    swr = sum(int(a) * int(b) for a, b in zip(w, r_i))
    swn = sum(int(a) * int(b) for a, b in zip(w, n_i))
    sw2n = sum(int(a) * int(a) * int(b) for a, b in zip(w, n_i))
    num = n * swr - r * swn
    den = r * (n - r) * (n * sw2n - swn * swn)
    z2 = None if den <= 0 else _rf(float(n) * float(num) * float(num) / float(den), 6)
    return _one_row(n=n, converted=r, z2=z2)


SQL_COCHRAN_ARMITAGE = """
WITH g AS (
  SELECT CAST(SUBSTR(o_orderpriority, 1, 1) AS BIGINT) AS w,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN o_totalprice > 200000.0 THEN 1 ELSE 0 END)
              AS BIGINT) AS r
  FROM orders GROUP BY 1
),
mom AS (
  SELECT CAST(SUM(n) AS HUGEINT) AS n,
         CAST(SUM(r) AS HUGEINT) AS r,
         CAST(SUM(CAST(w AS HUGEINT)*r) AS HUGEINT) AS swr,
         CAST(SUM(CAST(w AS HUGEINT)*n) AS HUGEINT) AS swn,
         CAST(SUM(CAST(w AS HUGEINT)*w*n) AS HUGEINT) AS sw2n
  FROM g
)
SELECT CAST(n AS BIGINT) AS n, CAST(r AS BIGINT) AS converted,
       CASE WHEN r*(n - r)*(n*sw2n - swn*swn) <= 0 THEN NULL
            ELSE ROUND(CAST(n AS DOUBLE)
                       * CAST(n*swr - r*swn AS DOUBLE)
                       * CAST(n*swr - r*swn AS DOUBLE)
                       / CAST(r*(n - r)*(n*sw2n - swn*swn) AS DOUBLE), 6)
       END AS z2
FROM mom
"""

QUERIES["cochran_armitage"] = (q_cochran_armitage, SQL_COCHRAN_ARMITAGE)


def q_weekday_anova(sf_dir: str, limit_bytes: int | None = None) -> pa.Table:
    """Is daily revenue weekday-dependent? One-way ANOVA of the daily
    cents series across the 7 weekday groups, from exact integer
    moments (dow = (epoch_day + 4) % 7, identical to DuckDB's
    Sunday=0 dayofweek). The same shared F expression as
    anova_oneway."""
    day, cents = _daily_lineitem_cents(sf_dir, limit_bytes)
    if day.size == 0:
        return _one_row(n_days=0, n_groups=0, f=None)
    dow = (day + 4) % 7
    n = int(day.size)
    k = 0
    s_all = 0
    sq_all = 0
    sb = 0.0
    for g in range(7):
        m = dow == g
        ng = int(m.sum())
        if ng == 0:
            continue
        k += 1
        sg = sum(int(v) for v in cents[m].tolist())
        qg = sum(int(v) * int(v) for v in cents[m].tolist())
        s_all += sg
        sq_all += qg
        sb += float(sg) * float(sg) / float(ng)
    ssb = sb - float(s_all) * float(s_all) / float(n)
    ssw = float(sq_all) - sb
    f = (
        None
        if k < 2 or n <= k or ssw <= 0
        else _rf((ssb / (k - 1.0)) / (ssw / (n - float(k))), 6)
    )
    return _one_row(n_days=n, n_groups=k, f=f)


SQL_WEEKDAY_ANOVA = """
WITH daily AS (
  SELECT CAST(l_shipdate AS DATE) AS d,
         CAST(SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT)
           AS c
  FROM lineitem GROUP BY 1
),
g AS (
  SELECT dayofweek(d) AS dow,
         CAST(COUNT(*) AS BIGINT) AS ng,
         CAST(SUM(c) AS HUGEINT) AS sg,
         CAST(SUM(CAST(c AS HUGEINT)*c) AS HUGEINT) AS qg
  FROM daily GROUP BY 1
),
agg AS (
  SELECT CAST(SUM(ng) AS BIGINT) AS n,
         CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(sg) AS HUGEINT) AS s_all,
         CAST(SUM(qg) AS HUGEINT) AS sq_all,
         SUM(CAST(sg AS DOUBLE)*CAST(sg AS DOUBLE)/CAST(ng AS DOUBLE)) AS sb
  FROM g
)
SELECT n AS n_days, k AS n_groups,
       CASE WHEN k < 2 OR n <= k
                 OR CAST(sq_all AS DOUBLE) - sb <= 0 THEN NULL
            ELSE ROUND(
              ((sb - CAST(s_all AS DOUBLE)*CAST(s_all AS DOUBLE)
                     /CAST(n AS DOUBLE)) / (k - 1.0))
              / ((CAST(sq_all AS DOUBLE) - sb) / (CAST(n AS DOUBLE) - k)), 6)
       END AS f
FROM agg
"""

QUERIES["weekday_anova"] = (q_weekday_anova, SQL_WEEKDAY_ANOVA)


def q_grouped_runs(sf_dir: str, limit_bytes: int | None = None) -> pa.Table:
    """Per-event-type Wald-Wolfowitz runs test over each type's daily
    COUNT series vs its own doubled median — the grouped form of
    runs_test over event volumes. One narrow (type, day, count)
    exchange; per-type driver scan over the calendar-bounded series."""
    import polars as pl

    from patito_ray.stages.agg import collect_table, merge_partial_sums

    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
        return (
            pl.DataFrame(
                {
                    "event_type": t.column("event_type").to_pylist(),
                    "day": us // _US_PER_DAY,
                }
            )
            .group_by(["event_type", "day"])
            .agg(pl.len().cast(pl.Int64).alias("c"))
            .to_arrow()
        )

    ds = _rp(sf_dir, "events", ["event_type", "ts"]).map_batches(
        partial, batch_format="pyarrow", batch_size=None
    )
    _kw = {} if limit_bytes is None else {"limit_bytes": limit_bytes}
    merged = merge_partial_sums(ds, ["event_type", "day"], ["c"], **_kw)
    if not isinstance(merged, pa.Table):
        merged = collect_table(
            merged,
            empty_schema=pa.schema(
                [("event_type", pa.string()), ("day", pa.int64()), ("c", pa.int64())]
            ),
        )
    et = np.asarray(merged.column("event_type").to_pylist())
    day = merged.column("day").to_numpy(zero_copy_only=False).astype(np.int64)
    cnt = merged.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
    types, nds, nas, nbs, runss, zs = [], [], [], [], [], []
    for g in sorted(set(et.tolist())):
        m = et == g
        d = day[m]
        c = cnt[m]
        order = np.argsort(d)
        c = c[order]
        n = c.size
        s = np.sort(c)
        m2 = int(s[(n - 1) // 2]) + int(s[n // 2])
        above = (2 * c) > m2
        n_pos = int(above.sum())
        n_neg = n - n_pos
        runs = 1 + int((above[1:] != above[:-1]).sum()) if n else 0
        if n_pos == 0 or n_neg == 0 or n < 2:
            z = None
        else:
            mu = 1.0 + (2.0 * n_pos * n_neg) / n
            var = (mu - 1.0) * (mu - 2.0) / (n - 1.0)
            z = _rf((runs - mu) / float(np.sqrt(var)), 6) if var > 0 else None
        types.append(g)
        nds.append(n)
        nas.append(n_pos)
        nbs.append(n_neg)
        runss.append(runs)
        zs.append(z)
    return pa.table(
        {
            "event_type": pa.array(types, pa.string()),
            "n_days": pa.array(nds, pa.int64()),
            "n_above": pa.array(nas, pa.int64()),
            "n_below": pa.array(nbs, pa.int64()),
            "runs": pa.array(runss, pa.int64()),
            "z": pa.array(zs, pa.float64()),
        }
    )


SQL_GROUPED_RUNS = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
med AS (
  SELECT event_type, CAST(2*MEDIAN(c) AS BIGINT) AS m2
  FROM daily GROUP BY event_type
),
flags AS (
  SELECT daily.event_type, daily.d,
         CASE WHEN 2*daily.c > med.m2 THEN 1 ELSE 0 END AS up
  FROM daily JOIN med ON med.event_type = daily.event_type
),
steps AS (
  SELECT event_type, up,
         LAG(up) OVER (PARTITION BY event_type ORDER BY d) AS prev
  FROM flags
),
agg AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(up) AS BIGINT) AS n_above,
         CAST(COUNT(*) - SUM(up) AS BIGINT) AS n_below,
         CAST(1 + SUM(CASE WHEN prev IS NOT NULL AND up <> prev
                           THEN 1 ELSE 0 END) AS BIGINT) AS runs
  FROM steps GROUP BY event_type
)
SELECT event_type, n_days, n_above, n_below, runs,
       CASE WHEN n_above = 0 OR n_below = 0 OR n_days < 2 THEN NULL
            ELSE ROUND(
              (CAST(runs AS DOUBLE)
               - (1.0 + (2.0*n_above*n_below)/n_days))
              / sqrt(((1.0 + (2.0*n_above*n_below)/n_days) - 1.0)
                     * ((1.0 + (2.0*n_above*n_below)/n_days) - 2.0)
                     / (n_days - 1.0)), 6) END AS z
FROM agg
"""

QUERIES["grouped_runs"] = (q_grouped_runs, SQL_GROUPED_RUNS)


# ---------------------------------------------------------------------------
# wave 8 (cont.): ordered-group trend, serial correlation, agreement,
# ordinal association
# ---------------------------------------------------------------------------


def q_jonckheere(sf_dir: str, limit_bytes: int | None = None) -> pa.Table:
    """Jonckheere-Terpstra ordered-alternative trend test: does
    o_totalprice shift monotonically across the FIVE ordered priority
    levels? The k-group generalization of mann_whitney, in PURE
    integers: 2JT = sum over ordered level pairs i<j of
    (2*#{a in g_i < b} + #{a in g_i = b}) summed over b in g_j, all
    evaluated on the 1-cent grid. One (level, cents)-grid partial-sum
    exchange (grid-bounded); the prefix scan and the pair assembly run
    driver-side over the sorted grid with Python-int accumulation (no
    overflow at any corpus size). z uses the standard no-tie moments
    E[2JT] = sum_{i<j} n_i n_j and Var[2JT] = (N^2(2N+3) -
    sum n_i^2(2n_i+3))/18 — deterministic and identical in SQL."""
    import polars as pl

    from patito_ray.stages.agg import collect_table, merge_partial_sums

    ds = _rp(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        pr = t.column("o_orderpriority").to_pylist()
        q = np.floor(
            t.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0
            + 0.5
        ).astype(np.int64)
        return (
            pl.DataFrame(
                {
                    "w": np.asarray([int(p[0]) for p in pr], dtype=np.int64),
                    "q": q,
                    "c": np.ones(len(pr), dtype=np.int64),
                }
            )
            .group_by(["w", "q"])
            .agg(pl.col("c").sum())
            .to_arrow()
        )

    _kw = {} if limit_bytes is None else {"limit_bytes": limit_bytes}
    merged = merge_partial_sums(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["w", "q"],
        ["c"],
        **_kw,
    )
    if not isinstance(merged, pa.Table):
        merged = collect_table(
            merged,
            empty_schema=pa.schema(
                [("w", pa.int64()), ("q", pa.int64()), ("c", pa.int64())]
            ),
        )
    w = merged.column("w").to_numpy(zero_copy_only=False).astype(np.int64)
    q = merged.column("q").to_numpy(zero_copy_only=False).astype(np.int64)
    c = merged.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
    levels = sorted(set(w.tolist()))
    lidx = {lv: i for i, lv in enumerate(levels)}
    k = len(levels)
    qs = np.unique(q)
    mat = np.zeros((qs.size, k), dtype=np.int64)
    mat[np.searchsorted(qs, q), np.fromiter((lidx[v] for v in w), np.int64)] = c
    n_i = [int(mat[:, j].sum()) for j in range(k)]
    n_tot = sum(n_i)
    # vectorized pair assembly: per ordered level pair (i<j), one int64
    # dot product c_j . (2*prefix_excl_i + c_i). Each dot is bounded by
    # 2*n_i*n_j, so int64 is safe while n < ~2e9 — loud guard, same
    # class as the spearman moment guard.
    if n_tot >= 2_000_000_000:
        raise ValueError(
            "jonckheere: vectorized int64 pair sums overflow past ~2e9 "
            f"rows (got {n_tot}) — shard the input or extend to object "
            "accumulation"
        )
    pref_excl = np.cumsum(mat, axis=0) - mat  # strictly-below per level
    jt2 = 0
    for i in range(k):
        for j in range(i + 1, k):
            jt2 += int(np.dot(mat[:, j], 2 * pref_excl[:, i] + mat[:, i]))
    n = sum(n_i)
    e2 = sum(
        n_i[i] * n_i[j] for i in range(k) for j in range(i + 1, k)
    )
    raw = n * n * (2 * n + 3) - sum(m * m * (2 * m + 3) for m in n_i)
    z = (
        None
        if raw <= 0
        else _rf(float(jt2 - e2) / float(np.sqrt(raw / 18.0)), 6)
    )
    return _one_row(n=n, jt2=jt2, z=z)


SQL_JONCKHEERE = """
WITH g AS (
  SELECT CAST(SUBSTR(o_orderpriority, 1, 1) AS BIGINT) AS w,
         CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS q,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM orders GROUP BY 1, 2
),
piv AS (
  SELECT q,
         SUM(CASE WHEN w = 1 THEN c ELSE 0 END) AS c1,
         SUM(CASE WHEN w = 2 THEN c ELSE 0 END) AS c2,
         SUM(CASE WHEN w = 3 THEN c ELSE 0 END) AS c3,
         SUM(CASE WHEN w = 4 THEN c ELSE 0 END) AS c4,
         SUM(CASE WHEN w = 5 THEN c ELSE 0 END) AS c5
  FROM g GROUP BY q
),
win AS (
  SELECT q, c1, c2, c3, c4, c5,
         COALESCE(SUM(c1) OVER (ORDER BY q ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0) AS p1,
         COALESCE(SUM(c2) OVER (ORDER BY q ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0) AS p2,
         COALESCE(SUM(c3) OVER (ORDER BY q ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0) AS p3,
         COALESCE(SUM(c4) OVER (ORDER BY q ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0) AS p4
  FROM piv
),
jt AS (
  SELECT CAST(SUM(
           c2*(2*p1 + c1)
         + c3*(2*(p1 + p2) + c1 + c2)
         + c4*(2*(p1 + p2 + p3) + c1 + c2 + c3)
         + c5*(2*(p1 + p2 + p3 + p4) + c1 + c2 + c3 + c4)
         ) AS HUGEINT) AS jt2
  FROM win
),
nn AS (
  SELECT CAST(SUM(c) AS HUGEINT) AS n,
         CAST(SUM(CASE WHEN w = 1 THEN c ELSE 0 END) AS HUGEINT) AS n1,
         CAST(SUM(CASE WHEN w = 2 THEN c ELSE 0 END) AS HUGEINT) AS n2,
         CAST(SUM(CASE WHEN w = 3 THEN c ELSE 0 END) AS HUGEINT) AS n3,
         CAST(SUM(CASE WHEN w = 4 THEN c ELSE 0 END) AS HUGEINT) AS n4,
         CAST(SUM(CASE WHEN w = 5 THEN c ELSE 0 END) AS HUGEINT) AS n5
  FROM g
)
SELECT CAST(n AS BIGINT) AS n,
       CAST(jt2 AS BIGINT) AS jt2,
       CASE WHEN n*n*(2*n + 3)
                 - (n1*n1*(2*n1+3) + n2*n2*(2*n2+3) + n3*n3*(2*n3+3)
                    + n4*n4*(2*n4+3) + n5*n5*(2*n5+3)) <= 0 THEN NULL
            ELSE ROUND(
              CAST(jt2 - (n1*n2 + n1*n3 + n1*n4 + n1*n5 + n2*n3 + n2*n4
                          + n2*n5 + n3*n4 + n3*n5 + n4*n5) AS DOUBLE)
              / sqrt(CAST(n*n*(2*n + 3)
                          - (n1*n1*(2*n1+3) + n2*n2*(2*n2+3)
                             + n3*n3*(2*n3+3) + n4*n4*(2*n4+3)
                             + n5*n5*(2*n5+3)) AS DOUBLE) / 18.0), 6)
       END AS z
FROM jt, nn
"""

QUERIES["jonckheere"] = (q_jonckheere, SQL_JONCKHEERE)


def q_durbin_watson(sf_dir: str, limit_bytes: int | None = None) -> pa.Table:
    """Durbin-Watson serial-correlation statistic of the daily revenue
    cents series (row-ordered by day; calendar gaps, if any, are
    adjacent rows on both engines — LAG over ORDER BY day is the SQL
    twin). DW = n*SUM(diff^2) / (n*SUM(c^2) - S^2): every moment is an
    exact Python int (diff^2 sums overflow int64 at daily-cents scale,
    so the driver fold is object-int), ONE float division at the end."""
    day, cents = _daily_lineitem_cents(sf_dir, limit_bytes)
    n = int(day.size)
    if n < 2:
        return _one_row(n_days=n, dw=None)
    vals = [int(v) for v in cents.tolist()]
    s = sum(vals)
    sq = sum(v * v for v in vals)
    num = sum((b - a) * (b - a) for a, b in zip(vals, vals[1:]))
    den = n * sq - s * s
    dw = None if den <= 0 else _rf(float(n * num) / float(den), 6)
    return _one_row(n_days=n, dw=dw)


SQL_DURBIN_WATSON = """
WITH daily AS (
  SELECT CAST(l_shipdate AS DATE) AS d,
         CAST(SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT)
           AS c
  FROM lineitem GROUP BY 1
),
lagged AS (
  SELECT c, LAG(c) OVER (ORDER BY d) AS prev FROM daily
),
agg AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(CAST(c AS HUGEINT)) AS HUGEINT) AS s,
         CAST(SUM(CAST(c AS HUGEINT)*c) AS HUGEINT) AS sq,
         CAST(SUM(CASE WHEN prev IS NULL THEN 0
                       ELSE CAST(c - prev AS HUGEINT)*(c - prev) END)
              AS HUGEINT) AS num
  FROM lagged
)
SELECT CAST(n AS BIGINT) AS n_days,
       CASE WHEN n < 2 OR n*sq - s*s <= 0 THEN NULL
            ELSE ROUND(CAST(n*num AS DOUBLE) / CAST(n*sq - s*s AS DOUBLE), 6)
       END AS dw
FROM agg
"""

QUERIES["durbin_watson"] = (q_durbin_watson, SQL_DURBIN_WATSON)


def q_cohen_kappa(sf_dir: str, limit_bytes: int | None = None) -> pa.Table:
    """Cohen's kappa between two per-user binary "raters": A = the
    user ever made a high-value purchase-grade event (value > 150), B =
    the user ever hit an error event. One narrow per-user indicator
    merge (MAX-style via SUM>0), then the 2x2 contingency is four
    integers and kappa is the exact rational
    (n*(n11+n00) - (r1*c1 + r0*c0)) / (n*n - (r1*c1 + r0*c0))
    evaluated with ONE float division."""
    import polars as pl

    from patito_ray.stages.agg import collect_table, merge_partial_sums

    ds = _rp(sf_dir, "events", ["user_id", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        val = t.column("value").to_numpy(zero_copy_only=False)
        a = (
            np.nan_to_num(val, nan=0.0) > 150.0
        ).astype(np.int64)
        b = pc.equal(t.column("event_type"), "error").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        return (
            pl.DataFrame(
                {
                    "user_id": t.column("user_id").to_pylist(),
                    "a": a,
                    "b": b,
                }
            )
            .group_by("user_id")
            .agg(pl.col("a").sum(), pl.col("b").sum())
            .to_arrow()
        )

    _kw = {} if limit_bytes is None else {"limit_bytes": limit_bytes}
    merged = merge_partial_sums(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["user_id"],
        ["a", "b"],
        **_kw,
    )
    if not isinstance(merged, pa.Table):
        merged = collect_table(
            merged,
            empty_schema=pa.schema(
                [("user_id", pa.int64()), ("a", pa.int64()), ("b", pa.int64())]
            ),
        )
    a = merged.column("a").to_numpy(zero_copy_only=False) > 0
    b = merged.column("b").to_numpy(zero_copy_only=False) > 0
    n11 = int((a & b).sum())
    n10 = int((a & ~b).sum())
    n01 = int((~a & b).sum())
    n00 = int((~a & ~b).sum())
    n = n11 + n10 + n01 + n00
    pe_num = (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)
    den = n * n - pe_num
    kappa = (
        None
        if n == 0 or den == 0
        else _rf(float(n * (n11 + n00) - pe_num) / float(den), 6)
    )
    return _one_row(n_users=n, n11=n11, n10=n10, n01=n01, n00=n00, kappa=kappa)


SQL_COHEN_KAPPA = """
WITH u AS (
  SELECT user_id,
         MAX(CASE WHEN value > 150.0 THEN 1 ELSE 0 END) AS a,
         MAX(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS b
  FROM events GROUP BY user_id
),
c AS (
  SELECT CAST(SUM(a*b) AS BIGINT) AS n11,
         CAST(SUM(a*(1-b)) AS BIGINT) AS n10,
         CAST(SUM((1-a)*b) AS BIGINT) AS n01,
         CAST(SUM((1-a)*(1-b)) AS BIGINT) AS n00,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM u
)
SELECT n AS n_users, n11, n10, n01, n00,
       CASE WHEN n = 0 OR n*n - ((n11+n10)*(n11+n01) + (n01+n00)*(n10+n00)) = 0
            THEN NULL
            ELSE ROUND(
              CAST(n*(n11+n00) - ((n11+n10)*(n11+n01) + (n01+n00)*(n10+n00))
                   AS DOUBLE)
              / CAST(n*n - ((n11+n10)*(n11+n01) + (n01+n00)*(n10+n00))
                     AS DOUBLE), 6) END AS kappa
FROM c
"""

QUERIES["cohen_kappa"] = (q_cohen_kappa, SQL_COHEN_KAPPA)


def q_gk_gamma(sf_dir: str, limit_bytes: int | None = None) -> pa.Table:
    """Goodman-Kruskal gamma between the ordered priority level (1..5)
    and the 100k totalprice band (0..4): ordinal association from the
    5x5 contingency. The exchange is a tiny (level, band) partial-sum
    merge; concordant/discordant pair counts are exact integer
    double-sums over the 25 cells (Python ints), and gamma = (C-D)/(C+D)
    is ONE float division."""
    import polars as pl

    from patito_ray.stages.agg import collect_table, merge_partial_sums

    ds = _rp(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        pr = t.column("o_orderpriority").to_pylist()
        band = np.minimum(
            np.floor(
                t.column("o_totalprice").to_numpy(zero_copy_only=False)
                / 100_000.0
            ).astype(np.int64),
            4,
        )
        return (
            pl.DataFrame(
                {
                    "w": np.asarray([int(p[0]) for p in pr], dtype=np.int64),
                    "b": band,
                    "c": np.ones(len(pr), dtype=np.int64),
                }
            )
            .group_by(["w", "b"])
            .agg(pl.col("c").sum())
            .to_arrow()
        )

    _kw = {} if limit_bytes is None else {"limit_bytes": limit_bytes}
    merged = merge_partial_sums(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["w", "b"],
        ["c"],
        **_kw,
    )
    if not isinstance(merged, pa.Table):
        merged = collect_table(
            merged,
            empty_schema=pa.schema(
                [("w", pa.int64()), ("b", pa.int64()), ("c", pa.int64())]
            ),
        )
    cells = {
        (int(w), int(b)): int(c)
        for w, b, c in zip(
            merged.column("w").to_pylist(),
            merged.column("b").to_pylist(),
            merged.column("c").to_pylist(),
        )
    }
    conc = disc = 0
    for (w1, b1), c1 in cells.items():
        for (w2, b2), c2 in cells.items():
            if w2 > w1 and b2 > b1:
                conc += c1 * c2
            elif w2 > w1 and b2 < b1:
                disc += c1 * c2
    gamma = (
        None if conc + disc == 0 else _rf(float(conc - disc) / (conc + disc), 6)
    )
    return _one_row(concordant=conc, discordant=disc, gamma=gamma)


SQL_GK_GAMMA = """
WITH g AS (
  SELECT CAST(SUBSTR(o_orderpriority, 1, 1) AS BIGINT) AS w,
         LEAST(CAST(FLOOR(o_totalprice/100000.0) AS BIGINT), 4) AS b,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM orders GROUP BY 1, 2
),
p AS (
  SELECT CAST(SUM(CASE WHEN g2.w > g1.w AND g2.b > g1.b
                       THEN g1.c*g2.c ELSE 0 END) AS BIGINT) AS concordant,
         CAST(SUM(CASE WHEN g2.w > g1.w AND g2.b < g1.b
                       THEN g1.c*g2.c ELSE 0 END) AS BIGINT) AS discordant
  FROM g g1 CROSS JOIN g g2
)
SELECT concordant, discordant,
       CASE WHEN concordant + discordant = 0 THEN NULL
            ELSE ROUND(CAST(concordant - discordant AS DOUBLE)
                       / CAST(concordant + discordant AS DOUBLE), 6)
       END AS gamma
FROM p
"""

QUERIES["gk_gamma"] = (q_gk_gamma, SQL_GK_GAMMA)


def q_friedman_test(sf_dir: str, limit_bytes: int | None = None) -> pa.Table:
    """Friedman repeated-measures test: rank the 7 weekdays within
    each COMPLETE epoch week of the daily revenue series and test
    whether weekday rank profiles differ. Doubled midranks (lo+hi)
    keep every moment integral (the doubling cancels in the
    tie-corrected Conover form F = (k-1)*S'/(A'-C') with
    S' = sum_j (R'_j - n(k+1))^2, A' = sum d^2, C' = nk(k+1)^2), so
    both engines assemble exact integers and divide once."""
    day, cents = _daily_lineitem_cents(sf_dir, limit_bytes)
    if day.size == 0:
        return _one_row(n_weeks=0, f=None)
    wk = day // 7
    dow = (day + 4) % 7
    # complete weeks only
    wku, wkc = np.unique(wk, return_counts=True)
    keep = np.isin(wk, wku[wkc == 7])
    wk, dow, c = wk[keep], dow[keep], cents[keep]
    n = int(np.unique(wk).size)
    if n == 0:
        return _one_row(n_weeks=0, f=None)
    rj = [0] * 7  # doubled rank sums per weekday, python ints
    a_p = 0  # sum of squared doubled ranks
    order = np.lexsort((c, wk))
    wk_s, dow_s, c_s = wk[order], dow[order], c[order]
    i = 0
    m = wk_s.size
    while i < m:
        j = i
        while j < m and wk_s[j] == wk_s[i]:
            j += 1
        base = i
        ii = i
        while ii < j:
            jj = ii
            while jj < j and c_s[jj] == c_s[ii]:
                jj += 1
            dr = (ii - base + 1) + (jj - base)  # lo+hi 1-based ranks
            for t in range(ii, jj):
                rj[int(dow_s[t])] += dr
                a_p += dr * dr
            ii = jj
        i = j
    c_p = n * 7 * 64  # n*k*(k+1)^2 with k=7
    s_p = sum((r - n * 8) * (r - n * 8) for r in rj)
    f = None if a_p - c_p <= 0 else _rf(float(6 * s_p) / float(a_p - c_p), 6)
    return _one_row(n_weeks=n, f=f)


SQL_FRIEDMAN_TEST = """
WITH daily AS (
  SELECT CAST(epoch(CAST(l_shipdate AS DATE)) AS BIGINT) // 86400 AS day,
         CAST(SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT)
           AS c
  FROM lineitem GROUP BY 1
),
wkd AS (
  SELECT day // 7 AS wk, (day + 4) % 7 AS dow, c FROM daily
),
complete AS (
  SELECT wk FROM wkd GROUP BY wk HAVING COUNT(*) = 7
),
ranked AS (
  SELECT wkd.wk, wkd.dow,
         2*RANK() OVER (PARTITION BY wkd.wk ORDER BY wkd.c)
           + COUNT(*) OVER (PARTITION BY wkd.wk, wkd.c) - 1 AS dr
  FROM wkd JOIN complete ON complete.wk = wkd.wk
),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM complete),
mom AS (
  SELECT CAST(SUM(CAST(dr AS HUGEINT)*dr) AS HUGEINT) AS ap FROM ranked
),
rsum AS (
  SELECT dow, CAST(SUM(dr) AS HUGEINT) AS r FROM ranked GROUP BY dow
),
sp AS (
  SELECT CAST(SUM((r - (SELECT n FROM nn)*8)
               * (r - (SELECT n FROM nn)*8)) AS HUGEINT) AS s
  FROM rsum
)
SELECT nn.n AS n_weeks,
       CASE WHEN mom.ap - CAST(nn.n*7*64 AS HUGEINT) <= 0 THEN NULL
            ELSE ROUND(CAST(6*sp.s AS DOUBLE)
                       / CAST(mom.ap - nn.n*7*64 AS DOUBLE), 6)
       END AS f
FROM nn, mom, sp
"""

QUERIES["friedman_test"] = (q_friedman_test, SQL_FRIEDMAN_TEST)


def q_cross_corr_lag(sf_dir: str, limit_bytes: int | None = None) -> pa.Table:
    """Lead-lag discovery: at which day offset (lag in -7..+7) does the
    daily 'view' count series best align with the daily 'purchase'
    series? r(lag) = sum_d v(d)*p(d+lag) — PURE integer dot products
    over the (type, day)-count merge (absent days contribute 0 on both
    engines via the inner join), argmax with the deterministic
    (r DESC, lag ASC) tiebreak. No float appears anywhere."""
    import polars as pl

    from patito_ray.stages.agg import collect_table, merge_partial_sums

    def partial(t: pa.Table) -> pa.Table:
        keep = pc.is_in(
            t.column("event_type"), value_set=pa.array(["view", "purchase"])
        )
        t = t.filter(keep)
        if t.num_rows == 0:
            return pa.schema(
                [
                    ("event_type", pa.string()),
                    ("day", pa.int64()),
                    ("c", pa.int64()),
                ]
            ).empty_table()
        us = pc.cast(t.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
        return (
            pl.DataFrame(
                {
                    "event_type": t.column("event_type").to_pylist(),
                    "day": us // _US_PER_DAY,
                }
            )
            .group_by(["event_type", "day"])
            .agg(pl.len().cast(pl.Int64).alias("c"))
            .to_arrow()
        )

    ds = _rp(sf_dir, "events", ["event_type", "ts"]).map_batches(
        partial, batch_format="pyarrow", batch_size=None
    )
    _kw = {} if limit_bytes is None else {"limit_bytes": limit_bytes}
    merged = merge_partial_sums(ds, ["event_type", "day"], ["c"], **_kw)
    if not isinstance(merged, pa.Table):
        merged = collect_table(
            merged,
            empty_schema=pa.schema(
                [
                    ("event_type", pa.string()),
                    ("day", pa.int64()),
                    ("c", pa.int64()),
                ]
            ),
        )
    et = np.asarray(merged.column("event_type").to_pylist())
    day = merged.column("day").to_numpy(zero_copy_only=False).astype(np.int64)
    cnt = merged.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
    vm, pm = et == "view", et == "purchase"
    vd, vc = day[vm], cnt[vm]
    pdays, pcs = day[pm], cnt[pm]
    po = np.argsort(pdays)
    pdays, pcs = pdays[po], pcs[po]
    best_lag, best_r = None, None
    for lag in range(-7, 8):
        tgt = vd + lag
        idx = np.searchsorted(pdays, tgt)
        idx = np.clip(idx, 0, pdays.size - 1) if pdays.size else idx
        if pdays.size == 0:
            r = 0
        else:
            hit = pdays[idx] == tgt
            r = int(
                sum(
                    int(a) * int(b)
                    for a, b in zip(vc[hit].tolist(), pcs[idx[hit]].tolist())
                )
            )
        if best_r is None or r > best_r:
            best_lag, best_r = lag, r
    return _one_row(best_lag=best_lag, r_best=best_r)


SQL_CROSS_CORR_LAG = """
WITH v AS (
  SELECT CAST(epoch(CAST(ts AS DATE)) AS BIGINT) // 86400 AS day,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events WHERE event_type = 'view' GROUP BY 1
),
p AS (
  SELECT CAST(epoch(CAST(ts AS DATE)) AS BIGINT) // 86400 AS day,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events WHERE event_type = 'purchase' GROUP BY 1
),
lags AS (SELECT UNNEST(range(-7, 8)) AS lag),
r AS (
  SELECT lags.lag,
         CAST(COALESCE(SUM(v.c * p.c), 0) AS BIGINT) AS r
  FROM lags
  LEFT JOIN v ON TRUE
  LEFT JOIN p ON p.day = v.day + lags.lag
  GROUP BY lags.lag
)
SELECT CAST(lag AS BIGINT) AS best_lag, r AS r_best
FROM r ORDER BY r DESC, lag ASC LIMIT 1
"""

QUERIES["cross_corr_lag"] = (q_cross_corr_lag, SQL_CROSS_CORR_LAG)


def q_moran_docs(sf_dir: str, limit_bytes: int | None = None) -> pa.Table:
    """Moran's I spatial autocorrelation of document LENGTH (n_chars)
    over the deterministic doc link graph: do long documents link to
    long documents? The random splitmix graph should sit near the null
    E[I] = -1/(n-1) ~ 0 — itself a ground-truth anchor. All moments
    are exact integers (functions/graph.py:moran_i); the oracle
    recomputes the identical edges via the splitmix64-in-SQL macro."""
    from patito_ray.functions.graph import moran_i
    from patito_ray.pipelines.q_wave3 import _doc_link_edges

    edges, _n = _doc_link_edges(sf_dir, 3)
    values = _rp(sf_dir, "documents", ["doc_id", "n_chars"])
    _kw = {} if limit_bytes is None else {"limit_bytes": limit_bytes}
    return moran_i(
        edges, values, src="src", dst="dst", node="doc_id", x="n_chars", **_kw
    )


def _sql_moran_docs() -> str:
    from patito_ray.pipelines.q_wave3 import _sql_link_edges

    return f"""
WITH
{_sql_link_edges(3)},
e AS (SELECT src AS s, dst AS d FROM edges WHERE src <> dst),
nodes AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(n_chars) AS HUGEINT) AS s,
         CAST(SUM(CAST(n_chars AS HUGEINT)*n_chars) AS HUGEINT) AS sq
  FROM documents
),
em AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS m,
         CAST(SUM(a.n_chars) AS HUGEINT) AS sxs,
         CAST(SUM(b.n_chars) AS HUGEINT) AS sxd,
         CAST(SUM(CAST(a.n_chars AS HUGEINT)*b.n_chars) AS HUGEINT) AS sxx
  FROM e
  JOIN documents a ON a.doc_id = e.s
  JOIN documents b ON b.doc_id = e.d
)
SELECT CAST(nodes.n AS BIGINT) AS n_nodes,
       CAST(em.m AS BIGINT) AS n_edges,
       CASE WHEN em.m = 0
                 OR nodes.n*nodes.n*nodes.sq - nodes.n*nodes.s*nodes.s <= 0
            THEN NULL
            ELSE ROUND(
              CAST(nodes.n AS DOUBLE)
              * CAST(nodes.n*nodes.n*em.sxx
                     - nodes.n*nodes.s*(em.sxs + em.sxd)
                     + nodes.s*nodes.s*em.m AS DOUBLE)
              / (CAST(em.m AS DOUBLE)
                 * CAST(nodes.n*nodes.n*nodes.sq
                        - nodes.n*nodes.s*nodes.s AS DOUBLE)), 6)
       END AS i
FROM nodes, em
"""


QUERIES["moran_docs"] = (q_moran_docs, _sql_moran_docs())


def q_partial_corr(sf_dir: str, limit_bytes: int | None = None) -> pa.Table:
    """Partial Pearson correlation of price vs quantity CONTROLLING
    for discount, over lineitem on integer grids (whole dollars /
    units / discount cents). The exchange is ONE 10-integer moment
    partial (n, three sums, three squares, three cross products);
    the three pairwise r's and the partial formula
    (r_xy - r_xz*r_yz)/sqrt((1-r_xz^2)(1-r_yz^2)) are the identical
    IEEE expression on both engines, rounded once."""
    from patito_ray.stages.agg import collect_table, merge_partial_sums

    ds = _rp(
        sf_dir, "lineitem", ["l_extendedprice", "l_quantity", "l_discount"]
    )
    names = ["n", "sx", "sy", "sz", "sxx", "syy", "szz", "sxy", "sxz", "syz"]
    sch = pa.schema([("k", pa.int64())] + [(c, pa.int64()) for c in names])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return sch.empty_table()
        x = np.floor(
            t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        y = np.floor(
            t.column("l_quantity").to_numpy(zero_copy_only=False) + 0.5
        ).astype(np.int64)
        z = np.floor(
            t.column("l_discount").to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        vals = [
            len(x),
            int(x.sum()), int(y.sum()), int(z.sum()),
            int((x * x).sum()), int((y * y).sum()), int((z * z).sum()),
            int((x * y).sum()), int((x * z).sum()), int((y * z).sum()),
        ]
        return pa.table(
            {"k": pa.array([0], pa.int64()),
             **{c: pa.array([v], pa.int64()) for c, v in zip(names, vals)}},
            schema=sch,
        )

    _kw = {} if limit_bytes is None else {"limit_bytes": limit_bytes}
    merged = merge_partial_sums(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["k"],
        names,
        **_kw,
    )
    if not isinstance(merged, pa.Table):
        merged = collect_table(merged, empty_schema=sch)
    if merged.num_rows == 0:
        return _one_row(n=0, r_xy=None, r_partial=None)
    g = {c: int(merged.column(c)[0].as_py()) for c in names}
    n = g["n"]

    def _r_pair(sab, sa, sb, saa, sbb):
        den = float(n * saa - sa * sa) ** 0.5 * float(n * sbb - sb * sb) ** 0.5
        return None if den == 0.0 else float(n * sab - sa * sb) / den

    rxy = _r_pair(g["sxy"], g["sx"], g["sy"], g["sxx"], g["syy"])
    rxz = _r_pair(g["sxz"], g["sx"], g["sz"], g["sxx"], g["szz"])
    ryz = _r_pair(g["syz"], g["sy"], g["sz"], g["syy"], g["szz"])
    if rxy is None or rxz is None or ryz is None:
        return _one_row(n=n, r_xy=None, r_partial=None)
    den = ((1.0 - rxz * rxz) * (1.0 - ryz * ryz)) ** 0.5
    rp = None if den == 0.0 else _rf((rxy - rxz * ryz) / den, 6)
    return _one_row(n=n, r_xy=_rf(rxy, 6), r_partial=rp)


SQL_PARTIAL_CORR = """
WITH g AS (
  SELECT CAST(FLOOR(l_extendedprice) AS BIGINT) AS x,
         CAST(FLOOR(l_quantity + 0.5) AS BIGINT) AS y,
         CAST(FLOOR(l_discount*100 + 0.5) AS BIGINT) AS z
  FROM lineitem
),
m AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
         CAST(SUM(z) AS HUGEINT) AS sz,
         CAST(SUM(x*x) AS HUGEINT) AS sxx, CAST(SUM(y*y) AS HUGEINT) AS syy,
         CAST(SUM(z*z) AS HUGEINT) AS szz,
         CAST(SUM(x*y) AS HUGEINT) AS sxy, CAST(SUM(x*z) AS HUGEINT) AS sxz,
         CAST(SUM(y*z) AS HUGEINT) AS syz
  FROM g
),
r AS (
  SELECT n,
    CAST(n*sxy - sx*sy AS DOUBLE)
      / (sqrt(CAST(n*sxx - sx*sx AS DOUBLE))
         * sqrt(CAST(n*syy - sy*sy AS DOUBLE))) AS rxy,
    CAST(n*sxz - sx*sz AS DOUBLE)
      / (sqrt(CAST(n*sxx - sx*sx AS DOUBLE))
         * sqrt(CAST(n*szz - sz*sz AS DOUBLE))) AS rxz,
    CAST(n*syz - sy*sz AS DOUBLE)
      / (sqrt(CAST(n*syy - sy*sy AS DOUBLE))
         * sqrt(CAST(n*szz - sz*sz AS DOUBLE))) AS ryz
  FROM m
)
SELECT CAST(n AS BIGINT) AS n, ROUND(rxy, 6) AS r_xy,
       CASE WHEN sqrt((1.0 - rxz*rxz) * (1.0 - ryz*ryz)) = 0 THEN NULL
            ELSE ROUND((rxy - rxz*ryz)
                       / sqrt((1.0 - rxz*rxz) * (1.0 - ryz*ryz)), 6)
       END AS r_partial
FROM r
"""

QUERIES["partial_corr"] = (q_partial_corr, SQL_PARTIAL_CORR)


def q_cronbach_alpha(sf_dir: str, limit_bytes: int | None = None) -> pa.Table:
    """Cronbach's alpha treating the 7 weekdays as "items" scored by
    each complete week (internal consistency of the weekly revenue
    profile). The variance divisor cancels in the ratio, so both
    engines use the RAW sums of squares v_j = n*sum(x^2) - (sum x)^2
    per item and V_tot over weekly totals — exact integers end to end,
    alpha = (7/6)*(1 - sum v_j / V_tot) with ONE float division."""
    day, cents = _daily_lineitem_cents(sf_dir, limit_bytes)
    if day.size == 0:
        return _one_row(n_weeks=0, alpha=None)
    wk = day // 7
    dow = (day + 4) % 7
    wku, wkc = np.unique(wk, return_counts=True)
    keep = np.isin(wk, wku[wkc == 7])
    wk, dow, c = wk[keep], dow[keep], cents[keep]
    weeks = np.unique(wk)
    n = int(weeks.size)
    if n < 2:
        return _one_row(n_weeks=n, alpha=None)
    vals = [int(v) for v in c.tolist()]
    sum_v = 0
    for j in range(7):
        xs = [v for v, d in zip(vals, dow.tolist()) if d == j]
        sum_v += n * sum(v * v for v in xs) - sum(xs) ** 2
    tot = {}
    for v, w in zip(vals, wk.tolist()):
        tot[w] = tot.get(w, 0) + v
    ts = list(tot.values())
    v_tot = n * sum(t * t for t in ts) - sum(ts) ** 2
    alpha = (
        None
        if v_tot == 0
        else _rf((7.0 / 6.0) * (1.0 - float(sum_v) / float(v_tot)), 6)
    )
    return _one_row(n_weeks=n, alpha=alpha)


SQL_CRONBACH_ALPHA = """
WITH daily AS (
  SELECT CAST(epoch(CAST(l_shipdate AS DATE)) AS BIGINT) // 86400 AS day,
         CAST(SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT)
           AS c
  FROM lineitem GROUP BY 1
),
wkd AS (
  SELECT day // 7 AS wk, (day + 4) % 7 AS dow, c FROM daily
),
complete AS (SELECT wk FROM wkd GROUP BY wk HAVING COUNT(*) = 7),
kept AS (
  SELECT wkd.wk, wkd.dow, CAST(wkd.c AS HUGEINT) AS c
  FROM wkd JOIN complete ON complete.wk = wkd.wk
),
nn AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n FROM complete),
items AS (
  SELECT CAST(SUM((SELECT n FROM nn) * sq - s*s) AS HUGEINT) AS sum_v
  FROM (
    SELECT dow, SUM(c*c) AS sq, SUM(c) AS s FROM kept GROUP BY dow
  )
),
tots AS (
  SELECT CAST((SELECT n FROM nn) * SUM(t*t) - SUM(t)*SUM(t) AS HUGEINT)
    AS v_tot
  FROM (SELECT wk, SUM(c) AS t FROM kept GROUP BY wk)
)
SELECT CAST(nn.n AS BIGINT) AS n_weeks,
       CASE WHEN nn.n < 2 OR tots.v_tot = 0 THEN NULL
            ELSE ROUND((7.0/6.0) * (1.0 - CAST(items.sum_v AS DOUBLE)
                                          / CAST(tots.v_tot AS DOUBLE)), 6)
       END AS alpha
FROM nn, items, tots
"""

QUERIES["cronbach_alpha"] = (q_cronbach_alpha, SQL_CRONBACH_ALPHA)


def q_js_divergence(sf_dir: str, limit_bytes: int | None = None) -> pa.Table:
    """Jensen-Shannon divergence between the event-type mix of the
    first and second half of the observation window (distribution
    drift in nats). Counts per (half, type) ride one tiny merge; the
    5+5 transcendental terms p*ln(p/m) quantize to the integer 1e-9
    grid on BOTH engines (dsir precedent — absorbs libm ulp skew;
    boundary risk ~1e-7/term), so the final statistic is assembled
    from exact integers."""
    import polars as pl

    from patito_ray.stages.agg import collect_table, merge_partial_sums

    ds = _rp(sf_dir, "events", ["event_type", "ts"])

    def mm(t: pa.Table) -> pa.Table:
        sch = pa.schema([("k", pa.int64()), ("mn", pa.int64()), ("mx", pa.int64())])
        us = pc.cast(t.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
        if us.size == 0:
            return sch.empty_table()
        return pa.table(
            {
                "k": pa.array([0], pa.int64()),
                "mn": pa.array([-int(us.min())], pa.int64()),
                "mx": pa.array([int(us.max())], pa.int64()),
            },
            schema=sch,
        )

    mmt = collect_table(
        ds.map_batches(mm, batch_format="pyarrow", batch_size=None),
        empty_schema=pa.schema(
            [("k", pa.int64()), ("mn", pa.int64()), ("mx", pa.int64())]
        ),
    )
    if mmt.num_rows == 0:
        return _one_row(n1=0, n2=0, js=None)
    mn = -int(pc.max(mmt.column("mn")).as_py())
    mx = int(pc.max(mmt.column("mx")).as_py())
    mid = (mn + mx) // 2

    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
        return (
            pl.DataFrame(
                {
                    "event_type": t.column("event_type").to_pylist(),
                    "h": (us > mid).astype(np.int64),
                }
            )
            .group_by(["event_type", "h"])
            .agg(pl.len().cast(pl.Int64).alias("c"))
            .to_arrow()
        )

    _kw = {} if limit_bytes is None else {"limit_bytes": limit_bytes}
    merged = merge_partial_sums(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["event_type", "h"],
        ["c"],
        **_kw,
    )
    if not isinstance(merged, pa.Table):
        merged = collect_table(
            merged,
            empty_schema=pa.schema(
                [("event_type", pa.string()), ("h", pa.int64()), ("c", pa.int64())]
            ),
        )
    c1, c2 = {}, {}
    for et, h, c in zip(
        merged.column("event_type").to_pylist(),
        merged.column("h").to_pylist(),
        merged.column("c").to_pylist(),
    ):
        (c1 if h == 0 else c2)[et] = int(c)
    n1 = sum(c1.values())
    n2 = sum(c2.values())
    if n1 == 0 or n2 == 0:
        return _one_row(n1=n1, n2=n2, js=None)
    t_nano = 0
    for et in set(c1) | set(c2):
        p = float(c1.get(et, 0)) / n1
        q = float(c2.get(et, 0)) / n2
        m = (p + q) / 2.0
        if p > 0.0:
            t_nano += int(np.floor(p * np.log(p / m) * 1e9 + 0.5))
        if q > 0.0:
            t_nano += int(np.floor(q * np.log(q / m) * 1e9 + 0.5))
    return _one_row(n1=n1, n2=n2, js=_rf(float(t_nano) / 2e9, 6))


SQL_JS_DIVERGENCE = """
WITH mm AS (
  SELECT epoch_us(MIN(ts)) AS mn, epoch_us(MAX(ts)) AS mx FROM events
),
g AS (
  SELECT event_type,
         CASE WHEN epoch_us(ts) > (SELECT (mn + mx)//2 FROM mm)
              THEN 1 ELSE 0 END AS h,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
nn AS (
  SELECT CAST(SUM(CASE WHEN h = 0 THEN c ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN h = 1 THEN c ELSE 0 END) AS BIGINT) AS n2
  FROM g
),
per_type AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN h = 0 THEN c ELSE 0 END) AS DOUBLE)
           / (SELECT n1 FROM nn) AS p,
         CAST(SUM(CASE WHEN h = 1 THEN c ELSE 0 END) AS DOUBLE)
           / (SELECT n2 FROM nn) AS q
  FROM g GROUP BY event_type
),
terms AS (
  SELECT CAST(SUM(
           (CASE WHEN p > 0
                 THEN CAST(FLOOR(p * ln(p / ((p + q)/2.0)) * 1e9 + 0.5)
                           AS BIGINT) ELSE 0 END)
         + (CASE WHEN q > 0
                 THEN CAST(FLOOR(q * ln(q / ((p + q)/2.0)) * 1e9 + 0.5)
                           AS BIGINT) ELSE 0 END)
         ) AS BIGINT) AS t_nano
  FROM per_type
)
SELECT nn.n1, nn.n2,
       CASE WHEN nn.n1 = 0 OR nn.n2 = 0 THEN NULL
            ELSE ROUND(CAST(terms.t_nano AS DOUBLE) / 2e9, 6) END AS js
FROM nn, terms
"""

QUERIES["js_divergence"] = (q_js_divergence, SQL_JS_DIVERGENCE)


def q_decision_stump(sf_dir: str, limit_bytes: int | None = None) -> pa.Table:
    """Best single Gini split: which totalprice threshold best
    separates URGENT orders from the rest? Candidate splits are the
    distinct cents-grid values (one (q, pos, neg)-count exchange,
    grid-bounded); the split score (pos_L^2+neg_L^2)/n_L +
    (pos_R^2+neg_R^2)/n_R is the identical double expression over
    exact integer cumulative counts on both engines, and the argmax
    tie-breaks deterministically on the smaller threshold
    (changepoint_day precedent)."""
    import polars as pl

    from patito_ray.stages.agg import collect_table, merge_partial_sums

    ds = _rp(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        q = np.floor(
            t.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0
            + 0.5
        ).astype(np.int64)
        pos = pc.match_substring_regex(
            t.column("o_orderpriority"), "^1-"
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        return (
            pl.DataFrame({"q": q, "p": pos, "ng": 1 - pos})
            .group_by("q")
            .agg(pl.col("p").sum(), pl.col("ng").sum())
            .to_arrow()
        )

    _kw = {} if limit_bytes is None else {"limit_bytes": limit_bytes}
    merged = merge_partial_sums(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["q"],
        ["p", "ng"],
        **_kw,
    )
    if not isinstance(merged, pa.Table):
        merged = collect_table(
            merged,
            empty_schema=pa.schema(
                [("q", pa.int64()), ("p", pa.int64()), ("ng", pa.int64())]
            ),
        )
    if merged.num_rows < 2:
        return _one_row(split_cents=None, n_left=None, pos_left=None,
                        score=None)
    qv = merged.column("q").to_numpy(zero_copy_only=False)
    p = merged.column("p").to_numpy(zero_copy_only=False)
    ng = merged.column("ng").to_numpy(zero_copy_only=False)
    order = np.argsort(qv)
    qv, p, ng = qv[order], p[order], ng[order]
    cp = np.cumsum(p)
    cn = np.cumsum(ng)
    tp, tn = int(cp[-1]), int(cn[-1])
    # exclude the last grid value (empty right side)
    cp, cn, qv2 = cp[:-1], cn[:-1], qv[:-1]
    nl = (cp + cn).astype(np.float64)
    nr = float(tp + tn) - nl
    score = (
        (cp.astype(np.float64) ** 2 + cn.astype(np.float64) ** 2) / nl
        + ((float(tp) - cp) ** 2 + (float(tn) - cn) ** 2) / nr
    )
    best = int(np.argmax(score))
    return _one_row(
        split_cents=int(qv2[best]),
        n_left=int(cp[best] + cn[best]),
        pos_left=int(cp[best]),
        score=_rf(float(score[best]), 6),
    )


SQL_DECISION_STUMP = """
WITH g AS (
  SELECT CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS q,
         CAST(CASE WHEN o_orderpriority LIKE '1-%' THEN 1 ELSE 0 END
              AS BIGINT) AS pos
  FROM orders
),
grid AS (
  SELECT q, CAST(SUM(pos) AS BIGINT) AS p,
         CAST(COUNT(*) - SUM(pos) AS BIGINT) AS ng
  FROM g GROUP BY q
),
tot AS (
  SELECT CAST(SUM(p) AS BIGINT) AS tp, CAST(SUM(ng) AS BIGINT) AS tn
  FROM grid
),
cum AS (
  SELECT q,
         CAST(SUM(p) OVER (ORDER BY q) AS BIGINT) AS cp,
         CAST(SUM(ng) OVER (ORDER BY q) AS BIGINT) AS cn
  FROM grid
),
scored AS (
  SELECT q, cp, cn,
         (CAST(cp*cp + cn*cn AS DOUBLE) / CAST(cp + cn AS DOUBLE))
         + (CAST((tot.tp - cp)*(tot.tp - cp)
                 + (tot.tn - cn)*(tot.tn - cn) AS DOUBLE)
            / CAST(tot.tp + tot.tn - cp - cn AS DOUBLE)) AS score
  FROM cum, tot
  WHERE cp + cn < tot.tp + tot.tn
)
SELECT q AS split_cents,
       cp + cn AS n_left,
       cp AS pos_left,
       ROUND(score, 6) AS score
FROM scored ORDER BY score DESC, q ASC LIMIT 1
"""

QUERIES["decision_stump"] = (q_decision_stump, SQL_DECISION_STUMP)


def _user_survival_grid(sf_dir: str, limit_bytes: int | None = None):
    """Shared survival spine: time-to-first-PURCHASE per user, in a
    (dur, churn, g1) -> count grid (calendar-bounded). dur = days from
    the user's first event to their first purchase (event, churn=1) or
    to their last event (right-censored, churn=0); g1 = the user
    joined in the first half of the observation window. Per-user
    extrema ride ONE min-merge (max and the purchase-min via negation/
    sentinel); the count grid is a second tiny merge. Driver state is
    O(#days)."""
    import polars as pl

    from patito_ray.stages.agg import (
        collect_table,
        merge_partial_mins,
        merge_partial_sums,
    )

    SENT = (1 << 63) - 1
    ds = _rp(sf_dir, "events", ["user_id", "event_type", "ts"])

    def per_user(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
        buy = pc.equal(t.column("event_type"), "purchase").to_numpy(
            zero_copy_only=False
        )
        pmn = np.where(buy, us, SENT)
        return (
            pl.DataFrame(
                {
                    "user_id": t.column("user_id").to_pylist(),
                    "mn": us,
                    "negmx": -us,
                    "pmn": pmn,
                }
            )
            .group_by("user_id")
            .agg(
                pl.col("mn").min(),
                pl.col("negmx").min(),
                pl.col("pmn").min(),
            )
            .to_arrow()
        )

    _kw = {} if limit_bytes is None else {"limit_bytes": limit_bytes}
    users = merge_partial_mins(
        ds.map_batches(per_user, batch_format="pyarrow", batch_size=None),
        ["user_id"],
        ["mn", "negmx", "pmn"],
        **_kw,
    )
    grid_sch = pa.schema(
        [("dur", pa.int64()), ("churn", pa.int64()), ("g1", pa.int64()),
         ("c", pa.int64())]
    )

    def _grid_from(mn, mx, pmn, w0, w1):
        ev = pmn != SENT
        dur = np.where(ev, pmn - mn, mx - mn) // _US_PER_DAY
        g1 = (mn <= (w0 + w1) // 2).astype(np.int64)
        return (
            pl.DataFrame(
                {"dur": dur, "churn": ev.astype(np.int64), "g1": g1}
            )
            .group_by(["dur", "churn", "g1"])
            .agg(pl.len().cast(pl.Int64).alias("c"))
            .to_arrow()
            .cast(grid_sch)
        )

    if isinstance(users, pa.Table):
        if users.num_rows == 0:
            return grid_sch.empty_table()
        mn = users.column("mn").to_numpy(zero_copy_only=False)
        mx = -users.column("negmx").to_numpy(zero_copy_only=False)
        pmn = users.column("pmn").to_numpy(zero_copy_only=False)
        return _grid_from(mn, mx, pmn, int(mn.min()), int(mx.max()))

    users = users.materialize()

    def window_partial(t: pa.Table) -> pa.Table:
        sch = pa.schema([("k", pa.int64()), ("w0", pa.int64()),
                         ("negw1", pa.int64())])
        if t.num_rows == 0 or "negmx" not in t.column_names:
            return sch.empty_table()
        return pa.table(
            {
                "k": pa.array([0], pa.int64()),
                "w0": pa.array(
                    [int(t.column("mn").to_numpy(zero_copy_only=False).min())],
                    pa.int64(),
                ),
                "negw1": pa.array(
                    [int(t.column("negmx").to_numpy(zero_copy_only=False).min())],
                    pa.int64(),
                ),
            },
            schema=sch,
        )

    wm = merge_partial_mins(
        users.map_batches(window_partial, batch_format="pyarrow", batch_size=None),
        ["k"],
        ["w0", "negw1"],
        limit_bytes=1 << 20,
    )
    if not isinstance(wm, pa.Table):
        wm = collect_table(wm)
    if wm.num_rows == 0:
        return grid_sch.empty_table()
    w0 = int(wm.column("w0")[0].as_py())
    w1 = -int(wm.column("negw1")[0].as_py())

    def grid_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "mn" not in t.column_names:
            return grid_sch.empty_table()
        mn = t.column("mn").to_numpy(zero_copy_only=False)
        mx = -t.column("negmx").to_numpy(zero_copy_only=False)
        pmn = t.column("pmn").to_numpy(zero_copy_only=False)
        return _grid_from(mn, mx, pmn, w0, w1)

    merged = merge_partial_sums(
        users.map_batches(grid_partial, batch_format="pyarrow", batch_size=None),
        ["dur", "churn", "g1"],
        ["c"],
        limit_bytes=1 << 20,
    )
    if not isinstance(merged, pa.Table):
        merged = collect_table(merged, empty_schema=grid_sch)
    return merged


def q_km_survival(sf_dir: str, limit_bytes: int | None = None) -> pa.Table:
    """Kaplan-Meier curve for time-to-first-purchase (days from a
    user's first event to their first purchase; never-buyers are
    right-censored at their last event). The sequential product S_k = S_{k-1} * (1 - d/n) is
    BIT-EXACT against the oracle's WITH RECURSIVE twin (identical IEEE
    expression in identical row order — the EWMA precedent); d and the
    at-risk suffix sums are exact integers from the survival grid."""
    grid = _user_survival_grid(sf_dir, limit_bytes)
    if grid.num_rows == 0:
        return pa.schema(
            [("dur_days", pa.int64()), ("deaths", pa.int64()),
             ("at_risk", pa.int64()), ("survival", pa.float64())]
        ).empty_table()
    import polars as pl

    g = (
        pl.from_arrow(grid)
        .group_by("dur")
        .agg(
            (pl.col("c") * pl.col("churn")).sum().alias("d"),
            pl.col("c").sum().alias("tot"),
        )
        .sort("dur")
    )
    dur = g["dur"].to_numpy()
    d = g["d"].to_numpy()
    tot = g["tot"].to_numpy()
    at_risk = tot[::-1].cumsum()[::-1]
    s = 1.0
    rows = {"dur_days": [], "deaths": [], "at_risk": [], "survival": []}
    for t, dd, n in zip(dur.tolist(), d.tolist(), at_risk.tolist()):
        if dd == 0:
            continue
        s = s * (1.0 - float(dd) / float(n))
        rows["dur_days"].append(int(t))
        rows["deaths"].append(int(dd))
        rows["at_risk"].append(int(n))
        rows["survival"].append(_rf(s, 6))
    return pa.table(
        {
            "dur_days": pa.array(rows["dur_days"], pa.int64()),
            "deaths": pa.array(rows["deaths"], pa.int64()),
            "at_risk": pa.array(rows["at_risk"], pa.int64()),
            "survival": pa.array(rows["survival"], pa.float64()),
        }
    )


_SQL_SURVIVAL_GRID = """
w AS (SELECT epoch_us(MIN(ts)) AS w0, epoch_us(MAX(ts)) AS w1 FROM events),
u AS (
  SELECT user_id, epoch_us(MIN(ts)) AS mn, epoch_us(MAX(ts)) AS mx,
         MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS pmn
  FROM events GROUP BY user_id
),
durs AS (
  SELECT CASE WHEN pmn IS NOT NULL THEN (pmn - mn) // 86400000000
              ELSE (mx - mn) // 86400000000 END AS dur,
         CASE WHEN pmn IS NOT NULL THEN 1 ELSE 0 END AS churn,
         CASE WHEN mn <= (SELECT (w0 + w1)//2 FROM w) THEN 1 ELSE 0 END AS g1
  FROM u
)
"""
SQL_KM_SURVIVAL = f"""
WITH RECURSIVE
{_SQL_SURVIVAL_GRID},
grid AS (
  SELECT dur, CAST(SUM(churn) AS BIGINT) AS d,
         CAST(COUNT(*) AS BIGINT) AS tot
  FROM durs GROUP BY dur
),
ar AS (
  SELECT dur, d,
         CAST(SUM(tot) OVER (ORDER BY dur DESC
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS BIGINT) AS n
  FROM grid
),
steps AS (
  SELECT ROW_NUMBER() OVER (ORDER BY dur) AS i, dur, d, n
  FROM ar WHERE d > 0
),
km(i, dur, d, n, s) AS (
  SELECT i, dur, d, n, 1.0 * (1.0 - CAST(d AS DOUBLE)/n)
  FROM steps WHERE i = 1
  UNION ALL
  SELECT e.i, e.dur, e.d, e.n, km.s * (1.0 - CAST(e.d AS DOUBLE)/e.n)
  FROM steps e JOIN km ON e.i = km.i + 1
)
SELECT dur AS dur_days, d AS deaths, n AS at_risk,
       ROUND(s, 6) AS survival
FROM km ORDER BY dur_days
"""

QUERIES["km_survival"] = (q_km_survival, SQL_KM_SURVIVAL)


def q_logrank_test(sf_dir: str, limit_bytes: int | None = None) -> pa.Table:
    """Log-rank test: do early joiners reach their first purchase
    at a different rate than late joiners? Hypergeometric per-event-time terms E = d*n1/n and
    V = d*(n1/n)*((n-n1)/n)*((n-d)/(n-1)) quantize to the integer
    1e-9 grid per term (order-free integer summation on both engines);
    O1 = sum d1 is exact. chi2 assembles from the grid integers with
    one final float expression."""
    grid = _user_survival_grid(sf_dir, limit_bytes)
    if grid.num_rows == 0:
        return _one_row(o1=0, e1_nano=0, v_nano=0, chi2=None)
    import polars as pl

    g = (
        pl.from_arrow(grid)
        .group_by("dur")
        .agg(
            (pl.col("c") * pl.col("churn")).sum().alias("d"),
            (pl.col("c") * pl.col("churn") * pl.col("g1")).sum().alias("d1"),
            pl.col("c").sum().alias("tot"),
            (pl.col("c") * pl.col("g1")).sum().alias("tot1"),
        )
        .sort("dur")
    )
    d = g["d"].to_numpy()
    d1 = g["d1"].to_numpy()
    tot = g["tot"].to_numpy()
    tot1 = g["tot1"].to_numpy()
    n = tot[::-1].cumsum()[::-1]
    n1 = tot1[::-1].cumsum()[::-1]
    o1 = 0
    e_nano = 0
    v_nano = 0
    for dd, dd1, nn, nn1 in zip(
        d.tolist(), d1.tolist(), n.tolist(), n1.tolist()
    ):
        if dd == 0:
            continue
        o1 += int(dd1)
        e_nano += int(
            np.floor(float(dd) * float(nn1) / float(nn) * 1e9 + 0.5)
        )
        if nn > 1:
            v_nano += int(
                np.floor(
                    float(dd)
                    * (float(nn1) / float(nn))
                    * (float(nn - nn1) / float(nn))
                    * (float(nn - dd) / float(nn - 1))
                    * 1e9
                    + 0.5
                )
            )
    chi2 = (
        None
        if v_nano <= 0
        else _rf(
            (float(o1) - float(e_nano) / 1e9)
            * (float(o1) - float(e_nano) / 1e9)
            / (float(v_nano) / 1e9),
            6,
        )
    )
    return _one_row(o1=o1, e1_nano=e_nano, v_nano=v_nano, chi2=chi2)


SQL_LOGRANK_TEST = f"""
WITH
{_SQL_SURVIVAL_GRID},
grid AS (
  SELECT dur, CAST(SUM(churn) AS BIGINT) AS d,
         CAST(SUM(churn*g1) AS BIGINT) AS d1,
         CAST(COUNT(*) AS BIGINT) AS tot,
         CAST(SUM(g1) AS BIGINT) AS tot1
  FROM durs GROUP BY dur
),
ar AS (
  SELECT dur, d, d1,
         CAST(SUM(tot) OVER (ORDER BY dur DESC
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS BIGINT) AS n,
         CAST(SUM(tot1) OVER (ORDER BY dur DESC
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS BIGINT) AS n1
  FROM grid
),
terms AS (
  SELECT CAST(SUM(d1) AS BIGINT) AS o1,
         CAST(SUM(CAST(FLOOR(CAST(d AS DOUBLE)*n1/n * 1e9 + 0.5)
                       AS BIGINT)) AS BIGINT) AS e1_nano,
         CAST(SUM(CASE WHEN n > 1 THEN
                CAST(FLOOR(CAST(d AS DOUBLE)
                           * (CAST(n1 AS DOUBLE)/n)
                           * (CAST(n - n1 AS DOUBLE)/n)
                           * (CAST(n - d AS DOUBLE)/(n - 1)) * 1e9 + 0.5)
                     AS BIGINT) ELSE 0 END) AS BIGINT) AS v_nano
  FROM ar WHERE d > 0
)
SELECT o1, e1_nano, v_nano,
       CASE WHEN v_nano <= 0 THEN NULL
            ELSE ROUND(
              (CAST(o1 AS DOUBLE) - CAST(e1_nano AS DOUBLE)/1e9)
              * (CAST(o1 AS DOUBLE) - CAST(e1_nano AS DOUBLE)/1e9)
              / (CAST(v_nano AS DOUBLE)/1e9), 6) END AS chi2
FROM terms
"""

QUERIES["logrank_test"] = (q_logrank_test, SQL_LOGRANK_TEST)


def q_rfm_segments(sf_dir: str, limit_bytes: int | None = None) -> pa.Table:
    """RFM segmentation: per-user Recency (days since last event),
    Frequency (event count), Monetary (cents sum), each cut into
    terciles at the SELECTION quantiles (smallest value whose
    cumulative user count reaches ceil(n/3) / ceil(2n/3) — bit-exact
    integer rank arithmetic, the established selection-quantile
    precedent), then the 27-cell segment histogram. Scale shape: one
    per-user min+sum merge, one (metric, value)-grid count merge for
    the cuts (grid-bounded), one 27-row bucket merge — the per-user
    table never lands on the driver."""
    import polars as pl

    from patito_ray.stages.agg import (
        collect_table,
        merge_partial_mins,
        merge_partial_sums,
    )

    ds = _rp(sf_dir, "events", ["user_id", "ts", "value"])

    def per_user_sums(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
        val = t.column("value").to_numpy(zero_copy_only=False)
        valid = pc.is_valid(t.column("value")).to_numpy(zero_copy_only=False)
        cents = np.where(
            valid, np.floor(np.nan_to_num(val, nan=0.0) * 100.0 + 0.5), 0.0
        ).astype(np.int64)
        return (
            pl.DataFrame(
                {
                    "user_id": t.column("user_id").to_pylist(),
                    "freq": np.ones(len(us), dtype=np.int64),
                    "mon": cents,
                    "negmx": -us,
                }
            )
            .group_by("user_id")
            .agg(
                pl.col("freq").sum(),
                pl.col("mon").sum(),
                pl.col("negmx").min(),
            )
            .to_arrow()
        )

    _kw = {} if limit_bytes is None else {"limit_bytes": limit_bytes}
    # one pass emits BOTH sum-mergeable and min-mergeable columns; the
    # two merges share the materialized partials
    parts = ds.map_batches(
        per_user_sums, batch_format="pyarrow", batch_size=None
    ).materialize()
    sums = merge_partial_sums(parts, ["user_id"], ["freq", "mon"], **_kw)
    mins = merge_partial_mins(parts, ["user_id"], ["negmx"], **_kw)
    usch_s = pa.schema(
        [("user_id", pa.int64()), ("freq", pa.int64()), ("mon", pa.int64())]
    )
    usch_m = pa.schema([("user_id", pa.int64()), ("negmx", pa.int64())])
    import ray.data as rd

    if isinstance(sums, pa.Table):
        sums = rd.from_arrow(sums.select(["user_id", "freq", "mon"]) if
                             sums.num_rows else usch_s.empty_table())
    else:
        sums = sums.map_batches(
            lambda t: t.select(["user_id", "freq", "mon"])
            if t.num_rows and "user_id" in t.column_names
            else usch_s.empty_table(),
            batch_format="pyarrow", batch_size=None,
        )
    if isinstance(mins, pa.Table):
        mins = rd.from_arrow(mins.select(["user_id", "negmx"]) if
                             mins.num_rows else usch_m.empty_table())
    else:
        mins = mins.map_batches(
            lambda t: t.select(["user_id", "negmx"])
            if t.num_rows and "user_id" in t.column_names
            else usch_m.empty_table(),
            batch_format="pyarrow", batch_size=None,
        )

    # co-locate the three per-user metrics (same key, one exchange)
    from patito_ray.stages.join import copartition_apply

    def attach(lt: pa.Table, rt: pa.Table) -> pa.Table:
        sch = pa.schema(
            [("user_id", pa.int64()), ("freq", pa.int64()),
             ("mon", pa.int64()), ("negmx", pa.int64())]
        )
        if lt.num_rows == 0:
            return sch.empty_table()
        kn = rt.column("user_id2").to_numpy(zero_copy_only=False)
        kv = rt.column("negmx").to_numpy(zero_copy_only=False)
        o = np.argsort(kn)
        kn, kv = kn[o], kv[o]
        keys = lt.column("user_id").to_numpy(zero_copy_only=False)
        vv = kv[np.searchsorted(kn, keys)]
        return pa.table(
            {
                "user_id": lt.column("user_id"),
                "freq": lt.column("freq"),
                "mon": lt.column("mon"),
                "negmx": pa.array(vv.astype(np.int64)),
            },
            schema=sch,
        )

    mins2 = mins.map_batches(
        lambda t: t.rename_columns(["user_id2", "negmx"])
        if t.num_rows else pa.schema(
            [("user_id2", pa.int64()), ("negmx", pa.int64())]
        ).empty_table(),
        batch_format="pyarrow", batch_size=None,
    )
    users = copartition_apply(sums, mins2, "user_id", "user_id2", attach)
    users = users.materialize()

    # window end for recency
    def wmax(t: pa.Table) -> pa.Table:
        sch = pa.schema([("k", pa.int64()), ("negw", pa.int64())])
        if t.num_rows == 0 or "negmx" not in t.column_names:
            return sch.empty_table()
        return pa.table(
            {"k": pa.array([0], pa.int64()),
             "negw": pa.array(
                 [int(t.column("negmx").to_numpy(zero_copy_only=False).min())],
                 pa.int64())},
            schema=sch,
        )

    wm = merge_partial_mins(
        users.map_batches(wmax, batch_format="pyarrow", batch_size=None),
        ["k"], ["negw"], limit_bytes=1 << 20,
    )
    if not isinstance(wm, pa.Table):
        wm = collect_table(wm)
    out_sch = pa.schema(
        [("r", pa.int64()), ("f", pa.int64()), ("m", pa.int64()),
         ("n_users", pa.int64())]
    )
    if wm.num_rows == 0:
        return out_sch.empty_table()
    w1 = -int(wm.column("negw")[0].as_py())

    # metric-value grid for the cuts
    gsch = pa.schema(
        [("metric", pa.int64()), ("v", pa.int64()), ("c", pa.int64())]
    )

    def grid_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "freq" not in t.column_names:
            return gsch.empty_table()
        rec = (w1 + t.column("negmx").to_numpy(zero_copy_only=False)) \
            // _US_PER_DAY
        fr = t.column("freq").to_numpy(zero_copy_only=False)
        mo = t.column("mon").to_numpy(zero_copy_only=False)
        return (
            pl.DataFrame(
                {
                    "metric": np.repeat(np.arange(3, dtype=np.int64), len(rec)),
                    "v": np.concatenate([rec, fr, mo]).astype(np.int64),
                    "c": np.ones(3 * len(rec), dtype=np.int64),
                }
            )
            .group_by(["metric", "v"])
            .agg(pl.col("c").sum())
            .to_arrow()
            .cast(gsch)
        )

    grid = merge_partial_sums(
        users.map_batches(grid_partial, batch_format="pyarrow", batch_size=None),
        ["metric", "v"], ["c"], limit_bytes=1 << 26,
    )
    if not isinstance(grid, pa.Table):
        grid = collect_table(grid, empty_schema=gsch)
    if grid.num_rows == 0:
        return out_sch.empty_table()
    cuts = {}
    n_users = 0
    for mtr in range(3):
        mask = pc.equal(grid.column("metric"), mtr)
        sub = grid.filter(mask)
        v = sub.column("v").to_numpy(zero_copy_only=False)
        c = sub.column("c").to_numpy(zero_copy_only=False)
        o = np.argsort(v)
        v, c = v[o], c[o]
        cum = np.cumsum(c)
        n = int(cum[-1])
        n_users = n
        r1 = (n + 2) // 3
        r2 = (2 * n + 2) // 3
        cuts[mtr] = (
            int(v[np.searchsorted(cum, r1)]),
            int(v[np.searchsorted(cum, r2)]),
        )

    def bucket_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "freq" not in t.column_names:
            return out_sch.empty_table()
        rec = (w1 + t.column("negmx").to_numpy(zero_copy_only=False)) \
            // _US_PER_DAY
        fr = t.column("freq").to_numpy(zero_copy_only=False)
        mo = t.column("mon").to_numpy(zero_copy_only=False)

        def bk(vals, mtr):
            c1, c2 = cuts[mtr]
            return (vals > c1).astype(np.int64) + (vals > c2).astype(np.int64)

        return (
            pl.DataFrame(
                {"r": bk(rec, 0), "f": bk(fr, 1), "m": bk(mo, 2)}
            )
            .group_by(["r", "f", "m"])
            .agg(pl.len().cast(pl.Int64).alias("n_users"))
            .to_arrow()
            .cast(out_sch)
        )

    seg = merge_partial_sums(
        users.map_batches(bucket_partial, batch_format="pyarrow", batch_size=None),
        ["r", "f", "m"], ["n_users"], limit_bytes=1 << 26,
    )
    if not isinstance(seg, pa.Table):
        seg = collect_table(seg, empty_schema=out_sch)
    import polars as _pl

    return _pl.from_arrow(seg).sort(["r", "f", "m"]).to_arrow().cast(out_sch)


SQL_RFM_SEGMENTS = """
WITH w AS (SELECT epoch_us(MAX(ts)) AS w1 FROM events),
u AS (
  SELECT user_id,
         ((SELECT w1 FROM w) - epoch_us(MAX(ts))) // 86400000000 AS rec,
         CAST(COUNT(*) AS BIGINT) AS fr,
         CAST(SUM(CASE WHEN value IS NOT NULL
                       THEN CAST(FLOOR(value*100 + 0.5) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS mo
  FROM events GROUP BY user_id
),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM u),
cuts AS (
  SELECT
    (SELECT MIN(v) FROM (SELECT rec AS v,
        SUM(1) OVER (ORDER BY rec ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW) AS cum FROM u) x
     WHERE cum >= (SELECT (n + 2)//3 FROM nn)) AS r1,
    (SELECT MIN(v) FROM (SELECT rec AS v,
        SUM(1) OVER (ORDER BY rec ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW) AS cum FROM u) x
     WHERE cum >= (SELECT (2*n + 2)//3 FROM nn)) AS r2,
    (SELECT MIN(v) FROM (SELECT fr AS v,
        SUM(1) OVER (ORDER BY fr ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW) AS cum FROM u) x
     WHERE cum >= (SELECT (n + 2)//3 FROM nn)) AS f1,
    (SELECT MIN(v) FROM (SELECT fr AS v,
        SUM(1) OVER (ORDER BY fr ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW) AS cum FROM u) x
     WHERE cum >= (SELECT (2*n + 2)//3 FROM nn)) AS f2,
    (SELECT MIN(v) FROM (SELECT mo AS v,
        SUM(1) OVER (ORDER BY mo ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW) AS cum FROM u) x
     WHERE cum >= (SELECT (n + 2)//3 FROM nn)) AS m1,
    (SELECT MIN(v) FROM (SELECT mo AS v,
        SUM(1) OVER (ORDER BY mo ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW) AS cum FROM u) x
     WHERE cum >= (SELECT (2*n + 2)//3 FROM nn)) AS m2
)
SELECT
  CAST(CASE WHEN u.rec > cuts.r1 THEN 1 ELSE 0 END
       + CASE WHEN u.rec > cuts.r2 THEN 1 ELSE 0 END AS BIGINT) AS r,
  CAST(CASE WHEN u.fr > cuts.f1 THEN 1 ELSE 0 END
       + CASE WHEN u.fr > cuts.f2 THEN 1 ELSE 0 END AS BIGINT) AS f,
  CAST(CASE WHEN u.mo > cuts.m1 THEN 1 ELSE 0 END
       + CASE WHEN u.mo > cuts.m2 THEN 1 ELSE 0 END AS BIGINT) AS m,
  CAST(COUNT(*) AS BIGINT) AS n_users
FROM u, cuts
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""

QUERIES["rfm_segments"] = (q_rfm_segments, SQL_RFM_SEGMENTS)


def q_holt_winters(sf_dir: str, limit_bytes: int | None = None) -> pa.Table:
    """Holt double-exponential smoothing (alpha=0.3, beta=0.2) of the
    daily revenue cents series, initialized l_1=c_1, b_1=c_2-c_1. The
    driver fold runs the identical per-step IEEE expressions as the
    oracle's WITH RECURSIVE twin in the identical row order (the EWMA
    precedent: sequential state is oracle-able bit-exactly). Returns
    the final level/trend and the 7-day-ahead forecast."""
    day, cents = _daily_lineitem_cents(sf_dir, limit_bytes)
    n = int(day.size)
    if n < 2:
        return _one_row(n_days=n, level=None, trend=None, forecast7=None)
    vals = [float(int(v)) for v in cents.tolist()]
    lvl = vals[0]
    tr = vals[1] - vals[0]
    for c in vals[1:]:
        prev = lvl
        lvl = 0.3 * c + 0.7 * (lvl + tr)
        tr = 0.2 * (lvl - prev) + 0.8 * tr
    return _one_row(
        n_days=n,
        level=_rf(lvl, 6),
        trend=_rf(tr, 6),
        forecast7=_rf(lvl + 7.0 * tr, 6),
    )


SQL_HOLT_WINTERS = """
WITH RECURSIVE daily AS (
  SELECT CAST(l_shipdate AS DATE) AS d,
         CAST(SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT)
           AS c
  FROM lineitem GROUP BY 1
),
seq AS (
  SELECT ROW_NUMBER() OVER (ORDER BY d) AS i, CAST(c AS DOUBLE) AS c
  FROM daily
),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM seq),
hw(i, lvl, tr) AS (
  SELECT 1, (SELECT c FROM seq WHERE i = 1),
         (SELECT c FROM seq WHERE i = 2) - (SELECT c FROM seq WHERE i = 1)
  UNION ALL
  SELECT s.i,
         0.3*s.c + 0.7*(hw.lvl + hw.tr),
         0.2*((0.3*s.c + 0.7*(hw.lvl + hw.tr)) - hw.lvl) + 0.8*hw.tr
  FROM seq s JOIN hw ON s.i = hw.i + 1
)
SELECT nn.n AS n_days,
       CASE WHEN nn.n < 2 THEN NULL ELSE ROUND(f.lvl, 6) END AS level,
       CASE WHEN nn.n < 2 THEN NULL ELSE ROUND(f.tr, 6) END AS trend,
       CASE WHEN nn.n < 2 THEN NULL ELSE ROUND(f.lvl + 7.0*f.tr, 6)
       END AS forecast7
FROM nn, (SELECT lvl, tr FROM hw ORDER BY i DESC LIMIT 1) f
"""

QUERIES["holt_winters"] = (q_holt_winters, SQL_HOLT_WINTERS)


def q_mann_kendall(sf_dir: str, limit_bytes: int | None = None) -> pa.Table:
    """Mann-Kendall monotone-trend test of the daily revenue series:
    S = sum over day pairs of sign(c_later - c_earlier), exact
    integers (the daily table is calendar-bounded so the pair scan is
    a driver numpy kernel over the one merged exchange; the oracle
    replays the O(d^2) self-join). Tie-corrected variance stays on the
    integer grid (var18 = n(n-1)(2n+5) - sum t(t-1)(2t+5)); z applies
    the standard continuity correction with one float expression."""
    day, cents = _daily_lineitem_cents(sf_dir, limit_bytes)
    n = int(day.size)
    if n < 2:
        return _one_row(n_days=n, s=0, z=None)
    c = cents  # already sorted by day
    s = 0
    chunk = 1024
    for i in range(0, n, chunk):
        block = c[i : i + chunk]
        # pairs (t, u) with t in block, u > t
        for off, v in enumerate(block.tolist()):
            rest = c[i + off + 1 :]
            s += int((rest > v).sum()) - int((rest < v).sum())
    vu, tv = np.unique(c, return_counts=True)
    var18 = n * (n - 1) * (2 * n + 5) - sum(
        int(t) * (int(t) - 1) * (2 * int(t) + 5) for t in tv.tolist()
    )
    if var18 <= 0:
        z = None
    elif s > 0:
        z = _rf(float(s - 1) / float(np.sqrt(var18 / 18.0)), 6)
    elif s < 0:
        z = _rf(float(s + 1) / float(np.sqrt(var18 / 18.0)), 6)
    else:
        z = 0.0
    return _one_row(n_days=n, s=s, z=z)


SQL_MANN_KENDALL = """
WITH daily AS (
  SELECT CAST(l_shipdate AS DATE) AS d,
         CAST(SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT)
           AS c
  FROM lineitem GROUP BY 1
),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily),
pairs AS (
  SELECT CAST(SUM(CASE WHEN b.c > a.c THEN 1
                       WHEN b.c < a.c THEN -1 ELSE 0 END) AS BIGINT) AS s
  FROM daily a JOIN daily b ON b.d > a.d
),
ties AS (
  SELECT CAST(COALESCE(SUM(t*(t-1)*(2*t+5)), 0) AS BIGINT) AS corr
  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM daily GROUP BY c)
)
SELECT nn.n AS n_days, pairs.s AS s,
       CASE WHEN nn.n*(nn.n-1)*(2*nn.n+5) - ties.corr <= 0 THEN NULL
            WHEN pairs.s > 0 THEN ROUND(CAST(pairs.s - 1 AS DOUBLE)
                 / sqrt(CAST(nn.n*(nn.n-1)*(2*nn.n+5) - ties.corr
                             AS DOUBLE)/18.0), 6)
            WHEN pairs.s < 0 THEN ROUND(CAST(pairs.s + 1 AS DOUBLE)
                 / sqrt(CAST(nn.n*(nn.n-1)*(2*nn.n+5) - ties.corr
                             AS DOUBLE)/18.0), 6)
            ELSE 0.0 END AS z
FROM nn, pairs, ties
"""

QUERIES["mann_kendall"] = (q_mann_kendall, SQL_MANN_KENDALL)


def q_odds_ratio(sf_dir: str, limit_bytes: int | None = None) -> pa.Table:
    """Odds ratio of the cohen_kappa 2x2 (high-value activity vs error
    encounters per user) with a 95% Wald CI on the log scale. The four
    cell counts are exact; OR is one float ratio; ln(OR) and the
    1.96*SE term quantize to the 1e-9 grid before combining (absorbs
    libm ulp skew between numpy and DuckDB ln/sqrt)."""
    import polars as pl

    from patito_ray.stages.agg import collect_table, merge_partial_sums

    ds = _rp(sf_dir, "events", ["user_id", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        val = t.column("value").to_numpy(zero_copy_only=False)
        a = (np.nan_to_num(val, nan=0.0) > 150.0).astype(np.int64)
        b = pc.equal(t.column("event_type"), "error").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        return (
            pl.DataFrame(
                {"user_id": t.column("user_id").to_pylist(), "a": a, "b": b}
            )
            .group_by("user_id")
            .agg(pl.col("a").sum(), pl.col("b").sum())
            .to_arrow()
        )

    _kw = {} if limit_bytes is None else {"limit_bytes": limit_bytes}
    merged = merge_partial_sums(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["user_id"],
        ["a", "b"],
        **_kw,
    )
    if not isinstance(merged, pa.Table):
        merged = collect_table(
            merged,
            empty_schema=pa.schema(
                [("user_id", pa.int64()), ("a", pa.int64()), ("b", pa.int64())]
            ),
        )
    a = merged.column("a").to_numpy(zero_copy_only=False) > 0
    b = merged.column("b").to_numpy(zero_copy_only=False) > 0
    n11 = int((a & b).sum())
    n10 = int((a & ~b).sum())
    n01 = int((~a & b).sum())
    n00 = int((~a & ~b).sum())
    if min(n11, n10, n01, n00) == 0:
        return _one_row(n11=n11, n10=n10, n01=n01, n00=n00,
                        odds=None, ci_lo=None, ci_hi=None)
    odds = float(n11 * n00) / float(n10 * n01)
    lnor_nano = int(np.floor(np.log(odds) * 1e9 + 0.5))
    se_nano = int(
        np.floor(
            1.96
            * np.sqrt(1.0 / n11 + 1.0 / n10 + 1.0 / n01 + 1.0 / n00)
            * 1e9
            + 0.5
        )
    )
    return _one_row(
        n11=n11, n10=n10, n01=n01, n00=n00,
        odds=_rf(odds, 6),
        ci_lo=_rf(float(lnor_nano - se_nano) / 1e9, 6),
        ci_hi=_rf(float(lnor_nano + se_nano) / 1e9, 6),
    )


SQL_ODDS_RATIO = """
WITH u AS (
  SELECT user_id,
         MAX(CASE WHEN value > 150.0 THEN 1 ELSE 0 END) AS a,
         MAX(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS b
  FROM events GROUP BY user_id
),
c AS (
  SELECT CAST(SUM(a*b) AS BIGINT) AS n11,
         CAST(SUM(a*(1-b)) AS BIGINT) AS n10,
         CAST(SUM((1-a)*b) AS BIGINT) AS n01,
         CAST(SUM((1-a)*(1-b)) AS BIGINT) AS n00
  FROM u
),
q AS (
  SELECT n11, n10, n01, n00,
         CAST(n11*n00 AS DOUBLE) / CAST(n10*n01 AS DOUBLE) AS odds,
         CAST(FLOOR(ln(CAST(n11*n00 AS DOUBLE)/CAST(n10*n01 AS DOUBLE))
                    * 1e9 + 0.5) AS BIGINT) AS lnor_nano,
         CAST(FLOOR(1.96 * sqrt(1.0/n11 + 1.0/n10 + 1.0/n01 + 1.0/n00)
                    * 1e9 + 0.5) AS BIGINT) AS se_nano
  FROM c WHERE n11 > 0 AND n10 > 0 AND n01 > 0 AND n00 > 0
)
SELECT c.n11, c.n10, c.n01, c.n00,
       ROUND(q.odds, 6) AS odds,
       ROUND(CAST(q.lnor_nano - q.se_nano AS DOUBLE)/1e9, 6) AS ci_lo,
       ROUND(CAST(q.lnor_nano + q.se_nano AS DOUBLE)/1e9, 6) AS ci_hi
FROM c LEFT JOIN q ON q.n11 = c.n11
"""

QUERIES["odds_ratio"] = (q_odds_ratio, SQL_ODDS_RATIO)


def q_page_hinkley(sf_dir: str, limit_bytes: int | None = None) -> pa.Table:
    """Page-Hinkley drift detector over the daily revenue cents series
    (delta=0, lambda=5e7 cents): running-mean + cumulative-deviation
    recursion with a tracked minimum and an alarm counter. Sequential
    state, so the oracle is a WITH RECURSIVE twin running the
    identical IEEE expressions in the identical row order (EWMA/Holt
    precedent); no summation-order hazard exists by construction."""
    day, cents = _daily_lineitem_cents(sf_dir, limit_bytes)
    n = int(day.size)
    if n == 0:
        return _one_row(n_days=0, u=None, min_u=None, alarms=None)
    lam = 5e7
    vals = [float(int(v)) for v in cents.tolist()]
    m = vals[0]
    u = -0.0
    minu = u
    alarms = 0
    for i, c in enumerate(vals[1:], start=2):
        m = m + (c - m) / float(i)
        u = u + (c - m)
        minu = min(minu, u)
        if u - minu > lam:
            alarms += 1
    return _one_row(
        n_days=n, u=_rf(u, 6), min_u=_rf(minu, 6), alarms=alarms
    )


SQL_PAGE_HINKLEY = """
WITH RECURSIVE daily AS (
  SELECT CAST(l_shipdate AS DATE) AS d,
         CAST(SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT)
           AS c
  FROM lineitem GROUP BY 1
),
seq AS (
  SELECT ROW_NUMBER() OVER (ORDER BY d) AS i, CAST(c AS DOUBLE) AS c
  FROM daily
),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM seq),
ph(i, m, u, minu, alarms) AS (
  SELECT 1, (SELECT c FROM seq WHERE i = 1),
         CAST(-0.0 AS DOUBLE), CAST(-0.0 AS DOUBLE), CAST(0 AS BIGINT)
  UNION ALL
  SELECT s.i,
         ph.m + (s.c - ph.m)/s.i,
         ph.u + (s.c - (ph.m + (s.c - ph.m)/s.i)),
         LEAST(ph.minu, ph.u + (s.c - (ph.m + (s.c - ph.m)/s.i))),
         ph.alarms + CASE WHEN
           (ph.u + (s.c - (ph.m + (s.c - ph.m)/s.i)))
           - LEAST(ph.minu, ph.u + (s.c - (ph.m + (s.c - ph.m)/s.i)))
           > 5e7 THEN 1 ELSE 0 END
  FROM seq s JOIN ph ON s.i = ph.i + 1
)
SELECT nn.n AS n_days,
       ROUND(f.u, 6) AS u, ROUND(f.minu, 6) AS min_u, f.alarms AS alarms
FROM nn, (SELECT u, minu, alarms FROM ph ORDER BY i DESC LIMIT 1) f
"""

QUERIES["page_hinkley"] = (q_page_hinkley, SQL_PAGE_HINKLEY)


def q_dispersion_index(sf_dir: str, limit_bytes: int | None = None) -> pa.Table:
    """Index of dispersion (variance-to-mean ratio) of the daily count
    series per event type — the Poisson overdispersion probe. VMR =
    (n*sum(c^2) - S^2) / ((n-1)*S): exact integers until ONE float
    division; chi2 = (n-1)*VMR shares the grid."""
    import polars as pl

    from patito_ray.stages.agg import collect_table, merge_partial_sums

    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
        return (
            pl.DataFrame(
                {
                    "event_type": t.column("event_type").to_pylist(),
                    "day": us // _US_PER_DAY,
                }
            )
            .group_by(["event_type", "day"])
            .agg(pl.len().cast(pl.Int64).alias("c"))
            .to_arrow()
        )

    ds = _rp(sf_dir, "events", ["event_type", "ts"]).map_batches(
        partial, batch_format="pyarrow", batch_size=None
    )
    _kw = {} if limit_bytes is None else {"limit_bytes": limit_bytes}
    merged = merge_partial_sums(ds, ["event_type", "day"], ["c"], **_kw)
    if not isinstance(merged, pa.Table):
        merged = collect_table(
            merged,
            empty_schema=pa.schema(
                [("event_type", pa.string()), ("day", pa.int64()),
                 ("c", pa.int64())]
            ),
        )
    et = np.asarray(merged.column("event_type").to_pylist())
    cnt = merged.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
    types, nds, vmrs, chis = [], [], [], []
    for g in sorted(set(et.tolist())):
        c = cnt[et == g]
        n = int(c.size)
        s = int(c.sum())
        sq = int((c * c).sum())
        types.append(g)
        nds.append(n)
        if n < 2 or s == 0:
            vmrs.append(None)
            chis.append(None)
        else:
            vmrs.append(_rf(float(n * sq - s * s) / float((n - 1) * s), 6))
            chis.append(_rf(float(n * sq - s * s) / float(s), 6))
    return pa.table(
        {
            "event_type": pa.array(types, pa.string()),
            "n_days": pa.array(nds, pa.int64()),
            "vmr": pa.array(vmrs, pa.float64()),
            "chi2": pa.array(chis, pa.float64()),
        }
    )


SQL_DISPERSION_INDEX = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
agg AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(c) AS BIGINT) AS s,
         CAST(SUM(c*c) AS BIGINT) AS sq
  FROM daily GROUP BY event_type
)
SELECT event_type, n AS n_days,
       CASE WHEN n < 2 OR s = 0 THEN NULL
            ELSE ROUND(CAST(n*sq - s*s AS DOUBLE)
                       / CAST((n-1)*s AS DOUBLE), 6) END AS vmr,
       CASE WHEN n < 2 OR s = 0 THEN NULL
            ELSE ROUND(CAST(n*sq - s*s AS DOUBLE) / CAST(s AS DOUBLE), 6)
       END AS chi2
FROM agg ORDER BY event_type
"""

QUERIES["dispersion_index"] = (q_dispersion_index, SQL_DISPERSION_INDEX)


def q_price_index(sf_dir: str, limit_bytes: int | None = None) -> pa.Table:
    """Laspeyres / Paasche / Fisher price indices between the first and
    second half of the ship-date window, over parts present in BOTH
    periods. Per (part, half) the exchange carries exact integer
    (qty units, cents) partials; the per-part rational price terms
    C1*Q0/Q1 and C0*Q1/Q0 quantize to the 1e-9 grid (summed as
    integers — order-free), the spend sums stay exact, and the three
    indices are assembled from grid integers with identical float
    expressions."""
    import polars as pl

    from patito_ray.stages.agg import collect_table, merge_partial_sums

    ds = _rp(
        sf_dir, "lineitem",
        ["l_partkey", "l_shipdate", "l_quantity", "l_extendedprice"],
    )

    def mm(t: pa.Table) -> pa.Table:
        sch = pa.schema([("k", pa.int64()), ("mn", pa.int64()),
                         ("mx", pa.int64())])
        us = pc.cast(t.column("l_shipdate"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        if us.size == 0:
            return sch.empty_table()
        return pa.table(
            {"k": pa.array([0], pa.int64()),
             "mn": pa.array([-int(us.min())], pa.int64()),
             "mx": pa.array([int(us.max())], pa.int64())},
            schema=sch,
        )

    mmt = collect_table(
        ds.map_batches(mm, batch_format="pyarrow", batch_size=None),
        empty_schema=pa.schema(
            [("k", pa.int64()), ("mn", pa.int64()), ("mx", pa.int64())]
        ),
    )
    if mmt.num_rows == 0:
        return _one_row(n_parts=0, laspeyres=None, paasche=None, fisher=None)
    mn = -int(pc.max(mmt.column("mn")).as_py())
    mx = int(pc.max(mmt.column("mx")).as_py())
    mid = (mn + mx) // 2

    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("l_shipdate"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        qty = np.floor(
            t.column("l_quantity").to_numpy(zero_copy_only=False) + 0.5
        ).astype(np.int64)
        cents = np.floor(
            t.column("l_extendedprice").to_numpy(zero_copy_only=False)
            * 100.0 + 0.5
        ).astype(np.int64)
        return (
            pl.DataFrame(
                {
                    "pk": t.column("l_partkey").to_numpy(
                        zero_copy_only=False
                    ).astype(np.int64),
                    "h": (us > mid).astype(np.int64),
                    "q": qty,
                    "c": cents,
                }
            )
            .group_by(["pk", "h"])
            .agg(pl.col("q").sum(), pl.col("c").sum())
            .to_arrow()
        )

    _kw = {} if limit_bytes is None else {"limit_bytes": limit_bytes}
    merged = merge_partial_sums(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["pk", "h"],
        ["q", "c"],
        **_kw,
    )
    if not isinstance(merged, pa.Table):
        merged = collect_table(
            merged,
            empty_schema=pa.schema(
                [("pk", pa.int64()), ("h", pa.int64()),
                 ("q", pa.int64()), ("c", pa.int64())]
            ),
        )
    per = {}
    for p, h, q, c in zip(
        merged.column("pk").to_pylist(),
        merged.column("h").to_pylist(),
        merged.column("q").to_pylist(),
        merged.column("c").to_pylist(),
    ):
        per.setdefault(int(p), {})[int(h)] = (int(q), int(c))
    lasp_nano = 0
    paa_nano = 0
    c0_sum = 0
    c1_sum = 0
    n_parts = 0
    for p, hs in sorted(per.items()):
        if 0 not in hs or 1 not in hs:
            continue
        q0, c0 = hs[0]
        q1, c1 = hs[1]
        if q0 <= 0 or q1 <= 0:
            continue
        n_parts += 1
        c0_sum += c0
        c1_sum += c1
        lasp_nano += int(np.floor(float(c1) * q0 / q1 * 1e9 + 0.5))
        paa_nano += int(np.floor(float(c0) * q1 / q0 * 1e9 + 0.5))
    if n_parts == 0 or c0_sum == 0 or paa_nano == 0:
        return _one_row(n_parts=n_parts, laspeyres=None, paasche=None,
                        fisher=None)
    lasp = float(lasp_nano) / 1e9 / float(c0_sum)
    paa = float(c1_sum) / (float(paa_nano) / 1e9)
    return _one_row(
        n_parts=n_parts,
        laspeyres=_rf(lasp, 6),
        paasche=_rf(paa, 6),
        fisher=_rf(float(np.sqrt(lasp * paa)), 6),
    )


SQL_PRICE_INDEX = """
WITH mm AS (
  SELECT epoch_us(MIN(l_shipdate)) AS mn, epoch_us(MAX(l_shipdate)) AS mx
  FROM lineitem
),
g AS (
  SELECT l_partkey AS part,
         CASE WHEN epoch_us(l_shipdate) > (SELECT (mn + mx)//2 FROM mm)
              THEN 1 ELSE 0 END AS h,
         CAST(SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS q,
         CAST(SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT))
              AS BIGINT) AS c
  FROM lineitem GROUP BY 1, 2
),
matched AS (
  SELECT a.part, a.q AS q0, a.c AS c0, b.q AS q1, b.c AS c1
  FROM g a JOIN g b ON b.part = a.part AND a.h = 0 AND b.h = 1
  WHERE a.q > 0 AND b.q > 0
),
terms AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
         CAST(SUM(c0) AS HUGEINT) AS c0_sum,
         CAST(SUM(c1) AS HUGEINT) AS c1_sum,
         CAST(SUM(CAST(FLOOR(CAST(c1 AS DOUBLE)*q0/q1 * 1e9 + 0.5)
                       AS HUGEINT)) AS HUGEINT) AS lasp_nano,
         CAST(SUM(CAST(FLOOR(CAST(c0 AS DOUBLE)*q1/q0 * 1e9 + 0.5)
                       AS HUGEINT)) AS HUGEINT) AS paa_nano
  FROM matched
)
SELECT n_parts,
       CASE WHEN n_parts = 0 OR c0_sum = 0 OR paa_nano = 0 THEN NULL
            ELSE ROUND(CAST(lasp_nano AS DOUBLE)/1e9
                       / CAST(c0_sum AS DOUBLE), 6) END AS laspeyres,
       CASE WHEN n_parts = 0 OR c0_sum = 0 OR paa_nano = 0 THEN NULL
            ELSE ROUND(CAST(c1_sum AS DOUBLE)
                       / (CAST(paa_nano AS DOUBLE)/1e9), 6) END AS paasche,
       CASE WHEN n_parts = 0 OR c0_sum = 0 OR paa_nano = 0 THEN NULL
            ELSE ROUND(sqrt((CAST(lasp_nano AS DOUBLE)/1e9
                             / CAST(c0_sum AS DOUBLE))
                            * (CAST(c1_sum AS DOUBLE)
                               / (CAST(paa_nano AS DOUBLE)/1e9))), 6)
       END AS fisher
FROM terms
"""

QUERIES["price_index"] = (q_price_index, SQL_PRICE_INDEX)


def q_bowley_skew(sf_dir: str, limit_bytes: int | None = None) -> pa.Table:
    """Bowley (quartile) skewness of order totalprice on the cents
    grid: the three SELECTION quartiles (smallest value whose
    cumulative count reaches ceil(n/4) / ceil(n/2) / ceil(3n/4)) are
    bit-exact integers (selection-quantile precedent — no
    interpolation, no rounding), and (q3 + q1 - 2*q2)/(q3 - q1) is ONE
    float expression."""
    import polars as pl

    from patito_ray.stages.agg import collect_table, merge_partial_sums

    ds = _rp(sf_dir, "orders", ["o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        q = np.floor(
            t.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0
            + 0.5
        ).astype(np.int64)
        return (
            pl.DataFrame({"q": q, "c": np.ones(len(q), dtype=np.int64)})
            .group_by("q")
            .agg(pl.col("c").sum())
            .to_arrow()
        )

    _kw = {} if limit_bytes is None else {"limit_bytes": limit_bytes}
    merged = merge_partial_sums(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["q"],
        ["c"],
        **_kw,
    )
    if not isinstance(merged, pa.Table):
        merged = collect_table(
            merged,
            empty_schema=pa.schema([("q", pa.int64()), ("c", pa.int64())]),
        )
    if merged.num_rows == 0:
        return _one_row(n=0, q1=None, q2=None, q3=None, bowley=None)
    qv = merged.column("q").to_numpy(zero_copy_only=False)
    c = merged.column("c").to_numpy(zero_copy_only=False)
    o = np.argsort(qv)
    qv, c = qv[o], c[o]
    cum = np.cumsum(c)
    n = int(cum[-1])
    ranks = [(n + 3) // 4, (n + 1) // 2, (3 * n + 3) // 4]
    q1, q2, q3 = (int(qv[np.searchsorted(cum, r)]) for r in ranks)
    bowley = (
        None
        if q3 == q1
        else _rf(float(q3 + q1 - 2 * q2) / float(q3 - q1), 6)
    )
    return _one_row(n=n, q1=q1, q2=q2, q3=q3, bowley=bowley)


SQL_BOWLEY_SKEW = """
WITH g AS (
  SELECT CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS q,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM orders GROUP BY 1
),
w AS (
  SELECT q, SUM(c) OVER (ORDER BY q ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS cum
  FROM g
),
nn AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM g),
cuts AS (
  SELECT
    (SELECT MIN(q) FROM w
     WHERE cum >= (SELECT (n + 3)//4 FROM nn)) AS q1,
    (SELECT MIN(q) FROM w
     WHERE cum >= (SELECT (n + 1)//2 FROM nn)) AS q2,
    (SELECT MIN(q) FROM w
     WHERE cum >= (SELECT (3*n + 3)//4 FROM nn)) AS q3
)
SELECT nn.n AS n, cuts.q1, cuts.q2, cuts.q3,
       CASE WHEN cuts.q3 = cuts.q1 THEN NULL
            ELSE ROUND(CAST(cuts.q3 + cuts.q1 - 2*cuts.q2 AS DOUBLE)
                       / CAST(cuts.q3 - cuts.q1 AS DOUBLE), 6)
       END AS bowley
FROM nn, cuts
"""

QUERIES["bowley_skew"] = (q_bowley_skew, SQL_BOWLEY_SKEW)


def q_seasonal_strength(sf_dir: str, limit_bytes: int | None = None) -> pa.Table:
    """Weekday seasonal strength of the daily revenue series:
    1 - SSW/SST over the (day+4)%7 grouping (the variance-explained
    companion of weekday_anova). Every moment is an exact integer;
    the per-group sg^2/ng terms and the final ratio are the identical
    float expression on both engines."""
    day, cents = _daily_lineitem_cents(sf_dir, limit_bytes)
    n = int(day.size)
    if n < 2:
        return _one_row(n_days=n, strength=None)
    dow = (day + 4) % 7
    s_all = 0
    sq_all = 0
    sb = 0.0
    for g in range(7):
        m = dow == g
        ng = int(m.sum())
        if ng == 0:
            continue
        sg = sum(int(v) for v in cents[m].tolist())
        qg = sum(int(v) * int(v) for v in cents[m].tolist())
        s_all += sg
        sq_all += qg
        sb += float(sg) * float(sg) / float(ng)
    sst = float(sq_all) - float(s_all) * float(s_all) / float(n)
    ssw = float(sq_all) - sb
    strength = None if sst <= 0 else _rf(1.0 - ssw / sst, 6)
    return _one_row(n_days=n, strength=strength)


SQL_SEASONAL_STRENGTH = """
WITH daily AS (
  SELECT CAST(l_shipdate AS DATE) AS d,
         CAST(SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT)
           AS c
  FROM lineitem GROUP BY 1
),
g AS (
  SELECT dayofweek(d) AS dow,
         CAST(COUNT(*) AS BIGINT) AS ng,
         CAST(SUM(c) AS HUGEINT) AS sg,
         CAST(SUM(CAST(c AS HUGEINT)*c) AS HUGEINT) AS qg
  FROM daily GROUP BY 1
),
agg AS (
  SELECT CAST(SUM(ng) AS BIGINT) AS n,
         CAST(SUM(sg) AS HUGEINT) AS s_all,
         CAST(SUM(qg) AS HUGEINT) AS sq_all,
         SUM(CAST(sg AS DOUBLE)*CAST(sg AS DOUBLE)/CAST(ng AS DOUBLE)) AS sb
  FROM g
)
SELECT n AS n_days,
       CASE WHEN n < 2 OR CAST(sq_all AS DOUBLE)
                 - CAST(s_all AS DOUBLE)*CAST(s_all AS DOUBLE)
                   /CAST(n AS DOUBLE) <= 0 THEN NULL
            ELSE ROUND(1.0 - (CAST(sq_all AS DOUBLE) - sb)
                             / (CAST(sq_all AS DOUBLE)
                                - CAST(s_all AS DOUBLE)*CAST(s_all AS DOUBLE)
                                  /CAST(n AS DOUBLE)), 6)
       END AS strength
FROM agg
"""

QUERIES["seasonal_strength"] = (q_seasonal_strength, SQL_SEASONAL_STRENGTH)
