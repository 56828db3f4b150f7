"""Query registry chunk (wave 8, registered LAST — the driver
correctness window pins the first 50 names, so new entries must only
ever append; this module is imported after q_wave7 by queries.py).

Registers: mcnemar_test, cochran_armitage, weekday_anova, grouped_runs,
jonckheere, durbin_watson, cohen_kappa, gk_gamma, friedman_test,
cross_corr_lag, moran_docs, partial_corr, cronbach_alpha,
js_divergence, decision_stump, and the rest of the wave-8 family.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import patito_ray as pr

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
from patito_ray.pipelines.q_wave7 import (  # noqa: F401
    _US_PER_DAY,
    _daily_lineitem_cents,
)

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
    sbq = 0  # 1e-9-grid integer term sum (order-free; dsir precedent)
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
        sbq += int(np.floor(float(sg) * float(sg) / float(ng) * 1e9 + 0.5))
    sb = float(sbq) / 1e9
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
         CAST(SUM(CAST(FLOOR(
           CAST(sg AS DOUBLE)*CAST(sg AS DOUBLE)/CAST(ng AS DOUBLE)
             *1e9 + 0.5
         ) AS HUGEINT)) AS DOUBLE)/1e9 AS sb
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
    sbq = 0  # 1e-9-grid integer term sum (order-free; dsir precedent)
    for g in range(7):
        m = dow == g
        ng = int(m.sum())
        if ng == 0:
            continue
        sg = sum(int(v) for v in cents[m].tolist())
        qg = sum(int(v) * int(v) for v in cents[m].tolist())
        s_all += sg
        sq_all += qg
        sbq += int(np.floor(float(sg) * float(sg) / float(ng) * 1e9 + 0.5))
    sb = float(sbq) / 1e9
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
         CAST(SUM(CAST(FLOOR(
           CAST(sg AS DOUBLE)*CAST(sg AS DOUBLE)/CAST(ng AS DOUBLE)
             *1e9 + 0.5
         ) AS HUGEINT)) AS DOUBLE)/1e9 AS sb
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


def q_decimal_revenue(sf_dir: str) -> pa.Table:
    """Beyond-reference decimal128 surface (the reference raises on
    pl.Decimal — _pydantic/dtypes/dtypes.py:245-248): per-returnflag
    revenue on EXACT decimal arithmetic. Each batch casts the float
    price onto decimal128(12,2) (the corpus prices live on the cents
    grid, so the cast is unambiguous on both engines) and emits its
    decimal partial sum as an unscaled-int partial row; the driver
    folds Python Decimals (exact, associative). The exchange is one
    ~16 B row per (batch, flag) — flag cardinality is 3."""
    import decimal as _dec

    ds = _rp(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice"])
    part_sch = pa.schema([("l_returnflag", pa.string()), ("s", pa.string())])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_sch.empty_table()
        import polars as pl

        dec = pc.cast(
            t.column("l_extendedprice"), pa.decimal128(12, 2), safe=False
        )
        flags = []
        sums = []
        tt = pa.table({"f": t.column("l_returnflag"), "d": dec})
        for f in pc.unique(tt.column("f")).to_pylist():
            sub = tt.filter(pc.equal(tt.column("f"), f))
            flags.append(f)
            sums.append(str(pc.sum(sub.column("d")).as_py()))
        return pa.table({"l_returnflag": flags, "s": sums}, schema=part_sch)

    rows = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=None
    ).take_all()  # one tiny row per (batch, flag)
    acc: dict[str, _dec.Decimal] = {}
    for r in rows:
        acc[r["l_returnflag"]] = acc.get(
            r["l_returnflag"], _dec.Decimal(0)
        ) + _dec.Decimal(r["s"])
    flags = sorted(acc)
    q = _dec.Decimal("0.01")
    return pa.table(
        {
            "l_returnflag": pa.array(flags, pa.string()),
            "revenue_dec": pa.array(
                [str(acc[f].quantize(q)) for f in flags], pa.string()
            ),
        }
    )


SQL_DECIMAL_REVENUE = """
SELECT l_returnflag,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR)
         AS revenue_dec
FROM lineitem GROUP BY l_returnflag
"""

QUERIES["decimal_revenue"] = (q_decimal_revenue, SQL_DECIMAL_REVENUE)


def q_unigram_tokens(sf_dir: str) -> pa.Table:
    """Unigram-LM (SentencePiece-style) tokenizer: train a piece
    vocabulary over documents.text (hard-EM over the distinct-word
    table — functions/unigram.py), then encode the corpus with the
    actor-pool stage and report the total piece count plus the top
    multi-char pieces. Rows-only: SQL cannot express the EM/Viterbi
    recursion (verified instead by the pure-Python reference parity
    suite in tests/test_unigram.py)."""
    from patito_ray.functions.unigram import (
        train_unigram,
        unigram_encode_dataset,
    )
    from patito_ray.stages.agg import collect_table, merge_partial_sums

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    model = train_unigram(
        ds, vocab_size=160, seed_size=1500, max_piece_len=8, em_rounds=2
    )
    enc = unigram_encode_dataset(
        _rp(sf_dir, "documents", ["doc_id", "text"]),
        model,
        ids=False,
        out_col="n_pieces",
    )
    sch = pa.schema([("k", pa.int64()), ("n", pa.int64())])
    parts = enc.map_batches(
        lambda t: pa.table(
            {
                "k": pa.array([0], pa.int64()),
                "n": pa.array(
                    [int(pc.sum(t.column("n_pieces")).as_py() or 0)], pa.int64()
                ),
            },
            schema=sch,
        ),
        batch_format="pyarrow",
        batch_size=None,
    )
    tot = merge_partial_sums(parts, ["k"], ["n"], limit_bytes=1 << 30)
    if not isinstance(tot, pa.Table):
        tot = collect_table(tot, empty_schema=sch)
    n_total = int(tot.column("n")[0].as_py()) if tot.num_rows else 0
    multi = model.filter(
        pc.greater(pc.utf8_length(model.column("piece")), 1)
    ).slice(0, 20)
    k = multi.num_rows
    return pa.table(
        {
            "piece": multi.column("piece"),
            "logp": _ra(multi.column("logp"), 6),
            "total_pieces": pa.array([n_total] * k, pa.int64()),
            "vocab_size": pa.array([model.num_rows] * k, pa.int64()),
        }
    )


QUERIES["unigram_tokens"] = (q_unigram_tokens, None)


def q_index_near_dups(sf_dir: str) -> Any:
    """Persisted incremental MinHash-LSH index end-to-end: build the
    index over the EVEN documents (one streaming pass, range-
    partitioned band keys on disk), query the ODD documents against it
    (partition-pruned reads, nothing corpus-sized moves), then
    exact-verify the candidates — pairs with word-3-gram jaccard >=
    0.8. At bands=32/r=4 the per-pair miss probability at j=0.8 is
    (1-0.8^4)^32 ~ 5e-8 (vanishing for higher jaccard), so the result
    equals the oracle's exhaustive odd x even cross scan
    (functions/minhashindex.py)."""
    from patito_ray.functions.dedup import verify_pairs_dataset
    from patito_ray.functions.minhashindex import (
        build_minhash_index,
        query_minhash_index,
    )

    def side(parity: int):
        def fn(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            return t.filter(pa.array((ids & 1) == parity))

        return fn

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    even = ds.map_batches(side(0), batch_format="pyarrow", batch_size=None)
    odd = ds.map_batches(side(1), batch_format="pyarrow", batch_size=None)
    idx_dir = _tmp_dir("mhidx", sf_dir)
    build_minhash_index(even, idx_dir, bands=32, overwrite=True)
    cand = query_minhash_index(idx_dir, odd, max_bucket=10_000)
    if isinstance(cand, pa.Table):
        import ray.data as rd

        cand = rd.from_arrow(cand)
    verified = verify_pairs_dataset(
        _rp(sf_dir, "documents", ["doc_id", "text"]),
        cand,
        threshold=0.8,
        shingle_n=3,
    )
    return _lazy_norm(
        verified,
        pa.schema([("a", pa.int64()), ("b", pa.int64()), ("jaccard", pa.float64())]),
        round_col="jaccard",
    )


SQL_INDEX_NEAR_DUPS = """
WITH tok AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS ts FROM documents
),
flat AS (
  SELECT doc_id, unnest(ts) AS tok, generate_subscripts(ts, 1) AS i, len(ts) AS n
  FROM tok
),
g3 AS (
  SELECT doc_id, tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w AS gram,
         i, n
  FROM flat WINDOW w AS (PARTITION BY doc_id ORDER BY i)
),
long_grams AS (
  SELECT doc_id, list(DISTINCT gram) AS gs FROM g3 WHERE i + 2 <= n GROUP BY doc_id
),
grams AS (
  SELECT t.doc_id,
         COALESCE(lg.gs,
                  CASE WHEN len(t.ts) >= 1 THEN [array_to_string(t.ts, ' ')]
                       ELSE [] END) AS gs
  FROM tok t LEFT JOIN long_grams lg ON t.doc_id = lg.doc_id
),
cand AS (
  SELECT x.doc_id AS a, y.doc_id AS b,
         len(list_intersect(x.gs, y.gs)) AS ni,
         len(x.gs) + len(y.gs) - len(list_intersect(x.gs, y.gs)) AS nu
  FROM grams x JOIN grams y ON x.doc_id % 2 = 1 AND y.doc_id % 2 = 0
)
SELECT a, b, ROUND(CAST(ni AS DOUBLE) / nu, 4) AS jaccard
FROM cand WHERE nu > 0 AND CAST(ni AS DOUBLE) / nu >= 0.8
"""

QUERIES["index_near_dups"] = (q_index_near_dups, SQL_INDEX_NEAR_DUPS)


def q_pq_search(sf_dir: str) -> pa.Table:
    """Product-quantized ANN end-to-end (functions/pq.py): train
    per-subspace codebooks on a bounded sample, compress the corpus to
    m-byte codes (one map_batches), answer a wide ADC candidate list
    from codes alone, exact-rerank the bounded candidate subset.
    Rows-only: the ADC stage is approximate by design (the exactness
    property and recall bounds live in tests/test_pq.py)."""
    import numpy as np

    from patito_ray.functions.pq import pq_encode, pq_search, pq_train

    ds = _rp(sf_dir, "embeddings", ["vec_id", "embedding"])
    q = ds.map_batches(
        lambda t: t.filter(pc.less(t["vec_id"], 3)),
        batch_format="pyarrow",
        batch_size=None,
    ).take_all()
    q.sort(key=lambda r: r["vec_id"])
    qids = np.array([r["vec_id"] for r in q], dtype=np.int64)
    qvecs = np.array([r["embedding"] for r in q], dtype=np.float64)
    books = pq_train(ds, m=8, k=64, sample_size=20_000)
    enc = pq_encode(ds, books).materialize()
    return pq_search(
        enc, books, qids, qvecs, k=5, rerank_ds=ds, rerank_factor=10
    )


QUERIES["pq_search"] = (q_pq_search, None)


class _EmbeddingRow(pr.Model):
    """Typed contract for the embeddings table: unique vector ids,
    fixed dimensionality via a list_len constraint (V11 over a LIST
    column), label in [0, 9]."""

    vec_id: int = pr.Field(unique=True)
    embedding: "list[float]" = pr.Field(
        constraints=[pr.col("embedding").list.len() == 64]
    )
    label: int = pr.Field(ge=0, le=9)


def q_embeddings_checks(sf_dir: str) -> pa.Table:
    """Validation counters over the embeddings table through the fused
    pass — exercises list-column dtype checking, a list_len constraint,
    bounds on an int32 column and the uniqueness blob exchange in one
    streaming pass (the documents_checks shape)."""
    ds = _rp(sf_dir, "embeddings")
    rep = pr.validate_report(ds, _EmbeddingRow)
    m = rep.merged
    return _one_row(
        row_count=rep.row_count,
        vec_id_dups=m.dup_counts.get("vec_id", 0),
        dim_viol=m.constraint_fail.get("embedding", 0),
        label_oob=m.bounds_fail.get("label", 0),
        emb_nulls=m.null_counts.get("embedding", 0),
    )


SQL_EMBEDDINGS_CHECKS = """
SELECT CAST(COUNT(*) AS BIGINT) AS row_count,
       (SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT)
        FROM (SELECT COUNT(*) AS c FROM embeddings GROUP BY vec_id)
        WHERE c > 1) AS vec_id_dups,
       CAST(COUNT(*) FILTER (len(embedding) <> 64) AS BIGINT) AS dim_viol,
       CAST(COUNT(*) FILTER (label < 0 OR label > 9) AS BIGINT) AS label_oob,
       CAST(COUNT(*) FILTER (embedding IS NULL) AS BIGINT) AS emb_nulls
FROM embeddings
"""

QUERIES["embeddings_checks"] = (q_embeddings_checks, SQL_EMBEDDINGS_CHECKS)
