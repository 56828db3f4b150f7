"""Wave-8 operators (paired/ordered categorical tests, calendar ANOVA,
grouped runs): planted-truth assertions against analytically known
values plus independent numpy brute references — NOT just cross-engine
agreement (a symmetric bug is invisible to the Ray-vs-SQL oracle) —
and dual-path (driver vs forced-distributed) equality."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"
US = 10**6
DAY_US = 86_400 * US


def _write(dirpath, name, table):
    pq.write_table(table, f"{dirpath}/{name}.parquet")


@pytest.mark.parametrize(
    "qname",
    ["mcnemar_test", "cochran_armitage", "weekday_anova", "grouped_runs"],
)
def test_dual_path_equality(ray_session, qname):
    from patito_ray.pipelines.queries import QUERIES

    fn = QUERIES[qname][0]
    assert fn(SF).equals(fn(SF, limit_bytes=0)), qname


def _events_table(ts_us, user_id, value, event_type=None):
    n = len(ts_us)
    return pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "ts": pa.array(np.asarray(ts_us, np.int64), pa.int64()).cast(
                pa.timestamp("us")
            ),
            "user_id": pa.array(np.asarray(user_id, np.int64), pa.int64()),
            "event_type": pa.array(
                event_type if event_type is not None else ["x"] * n, pa.string()
            ),
            "value": pa.array(np.asarray(value, np.float64), pa.float64()),
            "props": pa.array([""] * n, pa.string()),
        }
    )


def test_mcnemar_planted(ray_session, tmp_path):
    """Hand-planted discordant pairs: b=3 (h1-only converters), c=2
    (h2-only), so chi2 = (3-2)^2/5 = 0.2 exactly."""
    from patito_ray.pipelines.q_wave8 import q_mcnemar_test

    ts, uid, val = [], [], []
    # window [0, 100] us -> mid = 50
    ts += [0]
    uid += [99]
    val += [0.0]
    ts += [100]
    uid += [99]
    val += [0.0]
    for u in (0, 1, 2):  # converted in h1 only  -> b
        ts += [10, 90]
        uid += [u, u]
        val += [200.0, 100.0]
    for u in (3, 4):  # converted in h2 only -> c
        ts += [10, 90]
        uid += [u, u]
        val += [100.0, 200.0]
    for u in (5, 6):  # both halves
        ts += [10, 90]
        uid += [u, u]
        val += [200.0, 200.0]
    for u in (7, 8):  # neither
        ts += [10, 90]
        uid += [u, u]
        val += [100.0, 100.0]
    _write(tmp_path, "events", _events_table(ts, uid, val))
    out = q_mcnemar_test(str(tmp_path)).to_pydict()
    assert out["n_pairs"] == [10]  # 0..8 plus user 99
    assert out["b"] == [3]
    assert out["c"] == [2]
    assert out["chi2"] == [0.2]


def _orders_table(priorities, prices):
    n = len(priorities)
    return pa.table(
        {
            "o_orderkey": pa.array(np.arange(n), pa.int64()),
            "o_custkey": pa.array(np.zeros(n, np.int64), pa.int64()),
            "o_orderstatus": pa.array(["O"] * n, pa.string()),
            "o_totalprice": pa.array(np.asarray(prices, np.float64)),
            "o_orderdate": pa.array(
                np.zeros(n, np.int64), pa.int64()
            ).cast(pa.timestamp("us")),
            "o_orderpriority": pa.array(priorities, pa.string()),
        }
    )


def test_cochran_armitage_no_trend_is_zero(ray_session, tmp_path):
    """Equal conversion rate at every ordered level => the trend
    numerator N*Swr - R*Swn is exactly 0 => z2 == 0.0."""
    from patito_ray.pipelines.q_wave8 import q_cochran_armitage

    prio, price = [], []
    for w in range(1, 6):
        for i in range(10):
            prio.append(f"{w}-LEVEL")
            price.append(250_000.0 if i < 4 else 100_000.0)
    _write(tmp_path, "orders", _orders_table(prio, price))
    out = q_cochran_armitage(str(tmp_path)).to_pydict()
    assert out["n"] == [50]
    assert out["converted"] == [20]
    assert out["z2"] == [0.0]


def test_cochran_armitage_trend_vs_brute(ray_session, tmp_path):
    """Planted monotone trend (r_w = w of n=10 at level w) compared to
    an independent float evaluation of the closed form."""
    from patito_ray.pipelines.q_wave8 import q_cochran_armitage

    prio, price = [], []
    for w in range(1, 6):
        for i in range(10):
            prio.append(f"{w}-LEVEL")
            price.append(250_000.0 if i < w else 100_000.0)
    _write(tmp_path, "orders", _orders_table(prio, price))
    out = q_cochran_armitage(str(tmp_path)).to_pydict()
    w = np.arange(1, 6, dtype=np.float64)
    n_i = np.full(5, 10.0)
    r_i = w.copy()
    n, r = n_i.sum(), r_i.sum()
    num = n * (w * r_i).sum() - r * (w * n_i).sum()
    den = r * (n - r) * (n * (w * w * n_i).sum() - (w * n_i).sum() ** 2)
    assert out["n"] == [50] and out["converted"] == [15]
    assert abs(out["z2"][0] - n * num * num / den) < 1e-5
    assert out["z2"][0] > 3.0  # a real trend rejects


def _lineitem_table(day, price):
    n = len(day)
    return pa.table(
        {
            "l_orderkey": pa.array(np.arange(n), pa.int64()),
            "l_partkey": pa.array(np.zeros(n, np.int64)),
            "l_suppkey": pa.array(np.zeros(n, np.int64)),
            "l_linenumber": pa.array(np.ones(n, np.int32), pa.int32()),
            "l_quantity": pa.array(np.ones(n, np.float64)),
            "l_extendedprice": pa.array(np.asarray(price, np.float64)),
            "l_discount": pa.array(np.zeros(n, np.float64)),
            "l_tax": pa.array(np.zeros(n, np.float64)),
            "l_returnflag": pa.array(["N"] * n, pa.string()),
            "l_linestatus": pa.array(["O"] * n, pa.string()),
            "l_shipdate": pa.array(
                np.asarray(day, np.int64) * DAY_US, pa.int64()
            ).cast(pa.timestamp("us")),
        }
    )


def test_weekday_anova_null_case_is_zero(ray_session, tmp_path):
    """Every weekday sees the identical multiset of daily totals
    {100, 200} cents => between-group SS is exactly 0 => F == 0.0."""
    from patito_ray.pipelines.q_wave8 import q_weekday_anova

    day = list(range(14))  # two full weeks
    price = [1.0 if d < 7 else 2.0 for d in day]
    _write(tmp_path, "lineitem", _lineitem_table(day, price))
    out = q_weekday_anova(str(tmp_path)).to_pydict()
    assert out["n_days"] == [14]
    assert out["n_groups"] == [7]
    assert out["f"] == [0.0]


def test_weekday_anova_vs_brute(ray_session, tmp_path):
    """Random daily totals on the cents grid vs an independent numpy
    one-way ANOVA over the (day+4)%7 weekday grouping."""
    from patito_ray.pipelines.q_wave8 import q_weekday_anova

    rng = np.random.default_rng(11)
    day = np.arange(35)
    cents = rng.integers(100, 10_000, day.size)
    _write(
        tmp_path, "lineitem", _lineitem_table(day.tolist(), cents / 100.0)
    )
    out = q_weekday_anova(str(tmp_path)).to_pydict()
    dow = (day + 4) % 7
    vals = cents.astype(np.float64)
    gm = vals.mean()
    ssb = sum(
        (dow == g).sum() * (vals[dow == g].mean() - gm) ** 2 for g in range(7)
    )
    ssw = sum(
        ((vals[dow == g] - vals[dow == g].mean()) ** 2).sum() for g in range(7)
    )
    f_brute = (ssb / 6.0) / (ssw / (35.0 - 7.0))
    assert out["n_days"] == [35] and out["n_groups"] == [7]
    assert abs(out["f"][0] - f_brute) < 1e-4


def test_grouped_runs_planted_sequences(ray_session, tmp_path):
    """'alt' alternates its daily count 1,3,1,3,... => maximum number
    of runs (10); 'blk' is 5 low days then 5 high => exactly 2 runs.
    Both z values follow the analytic Wald-Wolfowitz moments."""
    from patito_ray.pipelines.q_wave8 import q_grouped_runs

    ts, uid, val, et = [], [], [], []

    def add(etype, d, count):
        for i in range(count):
            ts.append(d * DAY_US + i * US)
            uid.append(0)
            val.append(1.0)
            et.append(etype)

    for d in range(10):
        add("alt", d, 3 if d % 2 else 1)
        add("blk", d, 3 if d >= 5 else 1)
    _write(tmp_path, "events", _events_table(ts, uid, val, et))
    out = q_grouped_runs(str(tmp_path))
    rows = {
        r["event_type"]: r for r in out.to_pylist()
    }
    mu = 1.0 + 2.0 * 5 * 5 / 10.0  # 6.0
    sd = np.sqrt((mu - 1.0) * (mu - 2.0) / 9.0)
    for name, runs in (("alt", 10), ("blk", 2)):
        r = rows[name]
        assert r["n_days"] == 10
        assert r["n_above"] == 5 and r["n_below"] == 5
        assert r["runs"] == runs
        assert abs(r["z"] - (runs - mu) / sd) < 1e-5
    assert rows["alt"]["z"] > 2.5 and rows["blk"]["z"] < -2.5


@pytest.mark.parametrize(
    "qname",
    [
        "jonckheere",
        "durbin_watson",
        "cohen_kappa",
        "gk_gamma",
        "friedman_test",
        "cross_corr_lag",
        "moran_docs",
    ],
)
def test_dual_path_equality_batch2(ray_session, qname):
    from patito_ray.pipelines.queries import QUERIES

    fn = QUERIES[qname][0]
    assert fn(SF).equals(fn(SF, limit_bytes=0)), qname


def test_jonckheere_perfect_separation(ray_session, tmp_path):
    """Values strictly increase with level => EVERY cross-level pair is
    concordant: 2JT == 2*sum_{i<j} n_i n_j, its maximum."""
    from patito_ray.pipelines.q_wave8 import q_jonckheere

    prio, price = [], []
    n_i = [4, 6, 5, 3, 7]
    for w in range(1, 6):
        for _ in range(n_i[w - 1]):
            prio.append(f"{w}-LEVEL")
            price.append(1000.0 * w)
    _write(tmp_path, "orders", _orders_table(prio, price))
    out = q_jonckheere(str(tmp_path)).to_pydict()
    maxjt = 2 * sum(
        n_i[i] * n_i[j] for i in range(5) for j in range(i + 1, 5)
    )
    assert out["n"] == [sum(n_i)]
    assert out["jt2"] == [maxjt]
    assert out["z"][0] > 3.0


def test_jonckheere_identical_groups_near_zero(ray_session, tmp_path):
    """Identical value multiset at every level => 2JT equals its
    expectation exactly (every cross pair contributes its tie-average)
    => z == 0."""
    from patito_ray.pipelines.q_wave8 import q_jonckheere

    prio, price = [], []
    for w in range(1, 6):
        for v in (10.0, 20.0, 30.0):
            prio.append(f"{w}-LEVEL")
            price.append(v)
    _write(tmp_path, "orders", _orders_table(prio, price))
    out = q_jonckheere(str(tmp_path)).to_pydict()
    # per cross pair of groups: 3 equal + 3 less + 3 greater per 9 pairs
    # -> 2*#less + #eq = 2*3 + 3 = 9 per group pair = n_i*n_j
    assert out["jt2"] == [sum(3 * 3 for _ in range(10))]
    assert out["z"] == [0.0]


def test_durbin_watson_planted(ray_session, tmp_path):
    """Alternating daily revenue => strong negative serial correlation
    (DW > 3); a monotone ramp => strong positive (DW < 0.5). Exact
    value checked against an independent numpy evaluation."""
    from patito_ray.pipelines.q_wave8 import q_durbin_watson

    day = list(range(40))
    alt = [1.0 if d % 2 else 3.0 for d in day]
    _write(tmp_path, "lineitem", _lineitem_table(day, alt))
    out = q_durbin_watson(str(tmp_path)).to_pydict()
    c = np.asarray([round(v * 100) for v in alt], np.float64)
    dw_brute = (np.diff(c) ** 2).sum() / ((c - c.mean()) ** 2).sum()
    assert out["n_days"] == [40]
    assert abs(out["dw"][0] - dw_brute) < 1e-4
    assert out["dw"][0] > 3.0

    ramp_dir = tmp_path / "ramp"
    ramp_dir.mkdir()
    ramp = [float(d + 1) for d in day]
    _write(ramp_dir, "lineitem", _lineitem_table(day, ramp))
    out2 = q_durbin_watson(str(ramp_dir)).to_pydict()
    assert out2["dw"][0] < 0.5


def test_cohen_kappa_agreement_extremes(ray_session, tmp_path):
    """Perfect agreement => kappa == 1; an exactly balanced
    independent 2x2 (all four cells equal) => kappa == 0."""
    from patito_ray.pipelines.q_wave8 import q_cohen_kappa

    # perfect agreement: 5 users with both flags, 5 with neither
    ts, uid, val, et = [], [], [], []
    for u in range(5):
        ts += [u, u]
        uid += [u, u]
        val += [200.0, 1.0]
        et += ["purchase", "error"]
    for u in range(5, 10):
        ts += [u]
        uid += [u]
        val += [1.0]
        et += ["view"]
    _write(tmp_path, "events", _events_table(ts, uid, val, et))
    out = q_cohen_kappa(str(tmp_path)).to_pydict()
    assert out["n11"] == [5] and out["n00"] == [5]
    assert out["kappa"] == [1.0]

    ind = tmp_path / "ind"
    ind.mkdir()
    ts, uid, val, et = [], [], [], []
    cells = [(True, True), (True, False), (False, True), (False, False)]
    u = 0
    for a, b in cells:
        for _ in range(3):
            ts += [u, u]
            uid += [u, u]
            val += [200.0 if a else 1.0, 1.0]
            et += ["purchase", "error" if b else "view"]
            u += 1
    _write(ind, "events", _events_table(ts, uid, val, et))
    out2 = q_cohen_kappa(str(ind)).to_pydict()
    assert out2["n11"] == [3] and out2["n10"] == [3]
    assert out2["n01"] == [3] and out2["n00"] == [3]
    assert out2["kappa"] == [0.0]


def test_gk_gamma_monotone_extremes(ray_session, tmp_path):
    """Band == level-1 exactly => gamma == 1; band reversed => -1."""
    from patito_ray.pipelines.q_wave8 import q_gk_gamma

    prio = [f"{w}-LEVEL" for w in range(1, 6) for _ in range(4)]
    up = [100_000.0 * (w - 1) + 50_000.0 for w in range(1, 6) for _ in range(4)]
    _write(tmp_path, "orders", _orders_table(prio, up))
    out = q_gk_gamma(str(tmp_path)).to_pydict()
    assert out["discordant"] == [0]
    assert out["gamma"] == [1.0]

    rev = tmp_path / "rev"
    rev.mkdir()
    dn = [100_000.0 * (5 - w) + 50_000.0 for w in range(1, 6) for _ in range(4)]
    _write(rev, "orders", _orders_table(prio, dn))
    out2 = q_gk_gamma(str(rev)).to_pydict()
    assert out2["concordant"] == [0]
    assert out2["gamma"] == [-1.0]


def test_friedman_perfect_agreement(ray_session, tmp_path):
    """Every week ranks the weekdays identically (strict weekday
    effect) => the Friedman statistic hits its analytic maximum
    n*(k-1) = 4 weeks * 6 = 24 exactly."""
    from patito_ray.pipelines.q_wave8 import q_friedman_test

    day = list(range(28))
    price = [float(1 + ((d + 4) % 7)) * 10.0 for d in day]
    _write(tmp_path, "lineitem", _lineitem_table(day, price))
    out = q_friedman_test(str(tmp_path)).to_pydict()
    assert out["n_weeks"] == [4]
    assert out["f"] == [24.0]


def test_friedman_null_is_zero(ray_session, tmp_path):
    """A weekday-independent pattern whose per-week rank sums come out
    equal across weekdays => S' == 0 => statistic == 0 (needs the
    weekday assignment rotated per week so rank sums balance)."""
    from patito_ray.pipelines.q_wave8 import q_friedman_test

    # 7 weeks; week w gives the day with dow == (d+4)%7 value
    # depending on (dow - w) % 7 -> a latin square: every weekday
    # receives each rank exactly once over the 7 weeks.
    day = list(range(49))
    price = []
    for d in day:
        w = d // 7
        dow = (d + 4) % 7
        price.append(float(1 + (dow - w) % 7) * 10.0)
    _write(tmp_path, "lineitem", _lineitem_table(day, price))
    out = q_friedman_test(str(tmp_path)).to_pydict()
    assert out["n_weeks"] == [7]
    assert out["f"] == [0.0]


def test_cross_corr_lag_planted_shift(ray_session, tmp_path):
    """Purchases are exactly the view series shifted +3 days with one
    dominant spike => best_lag == 3 and r_best is the known integer
    dot product."""
    from patito_ray.pipelines.q_wave8 import q_cross_corr_lag

    ts, uid, val, et = [], [], [], []

    def add(etype, d, count):
        for i in range(count):
            ts.append(d * DAY_US + i * US)
            uid.append(0)
            val.append(1.0)
            et.append(etype)

    for d in range(20):
        add("view", d, 100 if d == 10 else 1)
        add("purchase", d, 100 if d == 13 else 1)
    out = None
    _write(tmp_path, "events", _events_table(ts, uid, val, et))
    out = q_cross_corr_lag(str(tmp_path)).to_pydict()
    assert out["best_lag"] == [3]
    # spike*spike + the aligned background ones
    v = np.asarray([100 if d == 10 else 1 for d in range(20)], np.int64)
    p = np.asarray([100 if d == 13 else 1 for d in range(20)], np.int64)
    assert out["r_best"] == [int(np.dot(v[:17], p[3:]))]


def test_moran_i_smooth_vs_random(ray_session, tmp_path):
    """Path graph with x == node index (perfectly smooth signal) =>
    Moran's I near +1, matched to an independent float evaluation of
    the definition; a fixed permutation of the same values => |I|
    small. Both paths (broadcast and forced-copartition) agree."""
    import ray.data as rd

    from patito_ray.functions.graph import moran_i

    n = 200
    src = np.arange(n - 1, dtype=np.int64)
    dst = src + 1
    edges = rd.from_arrow(
        pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    )
    xs = np.arange(n, dtype=np.int64)
    values = rd.from_arrow(
        pa.table({"node": pa.array(xs), "x": pa.array(xs)})
    )
    out = moran_i(edges, values, node="node", x="x").to_pydict()
    # independent brute evaluation of the textbook definition
    z = xs - xs.mean()
    i_brute = (n / float(n - 1)) * float(
        (z[src] * z[dst]).sum()
    ) / float((z * z).sum())
    assert out["n_nodes"] == [n] and out["n_edges"] == [n - 1]
    assert abs(out["i"][0] - i_brute) < 1e-4
    assert out["i"][0] > 0.9

    rng = np.random.default_rng(3)
    perm = rng.permutation(n).astype(np.int64)
    values_p = rd.from_arrow(
        pa.table({"node": pa.array(np.arange(n, dtype=np.int64)),
                  "x": pa.array(perm)})
    )
    out_p = moran_i(edges, values_p, node="node", x="x").to_pydict()
    assert abs(out_p["i"][0]) < 0.25

    forced = moran_i(
        edges, values, node="node", x="x", limit_bytes=0
    ).to_pydict()
    assert forced == out


def test_moran_i_dangling_endpoints_dropped(ray_session):
    """An edge endpoint absent from the values table is DROPPED (the
    SQL oracle's inner-join semantics) on both the broadcast and the
    forced-copartition attach — previously a raw searchsorted could
    silently read a neighboring node's value or raise IndexError."""
    import ray.data as rd

    from patito_ray.functions.graph import moran_i

    n = 50
    src = np.arange(n - 1, dtype=np.int64)
    dst = src + 1
    # add dangling edges: one endpoint beyond every known node (the
    # searchsorted insertion-at-end case) and one in-range-but-missing
    src_d = np.concatenate([src, [0, 7]])
    dst_d = np.concatenate([dst, [9999, 10_000]])
    values = rd.from_arrow(
        pa.table(
            {
                "node": pa.array(np.arange(n, dtype=np.int64)),
                "x": pa.array(np.arange(n, dtype=np.int64)),
            }
        )
    )
    clean = moran_i(
        rd.from_arrow(pa.table({"src": pa.array(src), "dst": pa.array(dst)})),
        values,
        node="node",
        x="x",
    ).to_pydict()
    dangling = moran_i(
        rd.from_arrow(
            pa.table({"src": pa.array(src_d), "dst": pa.array(dst_d)})
        ),
        values,
        node="node",
        x="x",
    ).to_pydict()
    assert dangling == clean
    forced = moran_i(
        rd.from_arrow(
            pa.table({"src": pa.array(src_d), "dst": pa.array(dst_d)})
        ),
        values,
        node="node",
        x="x",
        limit_bytes=0,
    ).to_pydict()
    assert forced == clean


@pytest.mark.parametrize(
    "qname",
    ["partial_corr", "cronbach_alpha", "js_divergence", "decision_stump"],
)
def test_dual_path_equality_batch3(ray_session, qname):
    from patito_ray.pipelines.queries import QUERIES

    fn = QUERIES[qname][0]
    assert fn(SF).equals(fn(SF, limit_bytes=0)), qname


def _lineitem_xyz(price, qty, disc):
    n = len(price)
    return pa.table(
        {
            "l_orderkey": pa.array(np.arange(n), pa.int64()),
            "l_partkey": pa.array(np.zeros(n, np.int64)),
            "l_suppkey": pa.array(np.zeros(n, np.int64)),
            "l_linenumber": pa.array(np.ones(n, np.int32), pa.int32()),
            "l_quantity": pa.array(np.asarray(qty, np.float64)),
            "l_extendedprice": pa.array(np.asarray(price, np.float64)),
            "l_discount": pa.array(np.asarray(disc, np.float64)),
            "l_tax": pa.array(np.zeros(n, np.float64)),
            "l_returnflag": pa.array(["N"] * n, pa.string()),
            "l_linestatus": pa.array(["O"] * n, pa.string()),
            "l_shipdate": pa.array(
                np.zeros(n, np.int64), pa.int64()
            ).cast(pa.timestamp("us")),
        }
    )


def test_partial_corr_confounder_planted(ray_session, tmp_path):
    """x and y correlate only THROUGH the confounder z: raw r_xy is
    strong but the partial correlation controlling z collapses toward
    0. Checked against an independent numpy partial-corr evaluation."""
    from patito_ray.pipelines.q_wave8 import q_partial_corr

    rng = np.random.default_rng(5)
    n = 400
    z = rng.integers(0, 11, n)  # discount cents 0..10
    x = 1000.0 + 500.0 * z + rng.integers(0, 200, n)  # price
    y = 5.0 + 2.0 * z + rng.integers(0, 4, n)  # quantity
    _write(
        tmp_path,
        "lineitem",
        _lineitem_xyz(x.astype(float), y.astype(float), z / 100.0),
    )
    out = q_partial_corr(str(tmp_path)).to_pydict()
    xg = np.floor(x).astype(np.int64).astype(np.float64)
    yg = np.floor(y + 0.5).astype(np.int64).astype(np.float64)
    zg = z.astype(np.float64)
    rxy = np.corrcoef(xg, yg)[0, 1]
    rxz = np.corrcoef(xg, zg)[0, 1]
    ryz = np.corrcoef(yg, zg)[0, 1]
    rp_brute = (rxy - rxz * ryz) / np.sqrt((1 - rxz**2) * (1 - ryz**2))
    assert out["n"] == [n]
    assert abs(out["r_xy"][0] - rxy) < 1e-4
    assert abs(out["r_partial"][0] - rp_brute) < 1e-4
    assert out["r_xy"][0] > 0.6 and abs(out["r_partial"][0]) < 0.2


def test_cronbach_alpha_extremes(ray_session, tmp_path):
    """Items that are exact shifts of one base series => perfectly
    consistent scale: var_j identical, var_total = 49*var => alpha ==
    1.0 exactly. Independent random items => alpha well below 0.5."""
    from patito_ray.pipelines.q_wave8 import q_cronbach_alpha

    day = list(range(28))
    base = [10.0, 17.0, 13.0, 21.0]  # per-week base
    price = [base[d // 7] + float((d + 4) % 7) for d in day]
    _write(tmp_path, "lineitem", _lineitem_table(day, price))
    out = q_cronbach_alpha(str(tmp_path)).to_pydict()
    assert out["n_weeks"] == [4]
    assert out["alpha"] == [1.0]

    rnd = tmp_path / "rnd"
    rnd.mkdir()
    rng = np.random.default_rng(8)
    price2 = (rng.integers(100, 10000, 28) / 100.0).tolist()
    _write(rnd, "lineitem", _lineitem_table(day, price2))
    out2 = q_cronbach_alpha(str(rnd)).to_pydict()
    assert out2["alpha"][0] < 0.5


def test_js_divergence_extremes(ray_session, tmp_path):
    """Identical type mixes in both halves => JS == 0; fully disjoint
    mixes => JS == ln 2 (quantized: 0.693147)."""
    from patito_ray.pipelines.q_wave8 import q_js_divergence

    ts, uid, val, et = [], [], [], []
    for i in range(50):  # same mix in [0,99] and [100,199]
        for half in (0, 100):
            ts.append(half + i)
            uid.append(0)
            val.append(1.0)
            et.append("a" if i % 2 else "b")
    ts += [0, 199]  # pin the window ends deterministically
    uid += [0, 0]
    val += [1.0, 1.0]
    et += ["a", "b"]
    # drop the pins' skew by replacing: keep simple — recompute below
    _write(tmp_path, "events", _events_table(ts[:-2], uid[:-2], val[:-2],
                                             et[:-2]))
    out = q_js_divergence(str(tmp_path)).to_pydict()
    assert out["js"] == [0.0]

    dis = tmp_path / "dis"
    dis.mkdir()
    ts2 = list(range(40)) + list(range(60, 100))
    et2 = ["a"] * 40 + ["b"] * 40
    _write(dis, "events",
           _events_table(ts2, [0] * 80, [1.0] * 80, et2))
    out2 = q_js_divergence(str(dis)).to_pydict()
    assert out2["n1"] == [40] and out2["n2"] == [40]
    assert out2["js"] == [0.693147]


def test_decision_stump_separable_planted(ray_session, tmp_path):
    """Perfectly separable labels: every URGENT order is cheaper than
    every other order => the best split sits on the most expensive
    urgent order, purity is total (score == n)."""
    from patito_ray.pipelines.q_wave8 import q_decision_stump

    prio = ["1-URGENT"] * 12 + ["3-MEDIUM"] * 20
    price = [1000.0 + 10.0 * i for i in range(12)] + [
        5000.0 + 10.0 * i for i in range(20)
    ]
    _write(tmp_path, "orders", _orders_table(prio, price))
    out = q_decision_stump(str(tmp_path)).to_pydict()
    assert out["split_cents"] == [round((1000.0 + 110.0) * 100)]
    assert out["n_left"] == [12] and out["pos_left"] == [12]
    assert out["score"] == [32.0]


@pytest.mark.parametrize(
    "qname", ["km_survival", "logrank_test", "rfm_segments"]
)
def test_dual_path_equality_batch4(ray_session, qname):
    from patito_ray.pipelines.queries import QUERIES

    fn = QUERIES[qname][0]
    assert fn(SF).equals(fn(SF, limit_bytes=0)), qname


def test_km_survival_textbook(ray_session, tmp_path):
    """Hand-computed KM curve: purchases at days 1, 2, 2, 4 plus one
    censored user (last event day 3, no purchase):
    S(1)=4/5=0.8, S(2)=0.8*(1-2/4)=0.4, S(4)=0.4*(1-1/1)=0."""
    from patito_ray.pipelines.q_wave8 import q_km_survival

    ts, uid, val, et = [], [], [], []

    def ev(u, d, typ):
        ts.append(d * DAY_US + u)  # +u keeps timestamps distinct
        uid.append(u)
        val.append(1.0)
        et.append(typ)

    for u, pday in ((0, 1), (1, 2), (2, 2), (3, 4)):
        ev(u, 0, "view")
        ev(u, pday, "purchase")
    ev(4, 0, "view")  # censored at day 3
    ev(4, 3, "view")
    _write(tmp_path, "events", _events_table(ts, uid, val, et))
    out = q_km_survival(str(tmp_path)).to_pylist()
    assert [(r["dur_days"], r["deaths"], r["at_risk"]) for r in out] == [
        (1, 1, 5),
        (2, 2, 4),
        (4, 1, 1),
    ]
    assert [r["survival"] for r in out] == [0.8, 0.4, 0.0]


def test_logrank_symmetric_zero_and_separated(ray_session, tmp_path):
    """Identical duration profiles in the early and late cohort =>
    d1 = d*n1/n exactly at every step => chi2 == 0. A fully separated
    planted effect (early cohort buys day 1, late cohort day 6) =>
    chi2 large."""
    from patito_ray.pipelines.q_wave8 import q_logrank_test

    ts, uid, val, et = [], [], [], []

    def ev(u, d_us, typ):
        ts.append(d_us)
        uid.append(u)
        val.append(1.0)
        et.append(typ)

    # window [0, 20d]; early join day 0, late join day 11 (> mid=10d)
    # both cohorts: 2 users purchase after 1 day, 2 after 3 days
    u = 0
    for base in (0, 11 * DAY_US):
        for pd in (1, 1, 3, 3):
            ev(u, base, "view")
            ev(u, base + pd * DAY_US, "purchase")
            u += 1
    ev(98, 0, "view")
    ev(99, 20 * DAY_US, "view")  # pin both window ends (censored)
    _write(tmp_path, "events", _events_table(ts, uid, val, et))
    out = q_logrank_test(str(tmp_path)).to_pydict()
    assert out["chi2"] == [0.0]

    sep = tmp_path / "sep"
    sep.mkdir()
    ts, uid, val, et = [], [], [], []
    u = 0
    for base, pd in ((0, 1), (11 * DAY_US, 6)):
        for _ in range(6):
            ev(u, base, "view")
            ev(u, base + pd * DAY_US, "purchase")
            u += 1
    ev(98, 0, "view")
    ev(99, 20 * DAY_US, "view")
    _write(sep, "events", _events_table(ts, uid, val, et))
    out2 = q_logrank_test(str(sep)).to_pydict()
    assert out2["chi2"][0] > 5.0


def test_rfm_segments_planted_diagonal(ray_session, tmp_path):
    """Three users engineered to take ranks 1/2/3 in ALL of recency,
    frequency and monetary => the diagonal segments (0,0,0), (1,1,1),
    (2,2,2), one user each."""
    from patito_ray.pipelines.q_wave8 import q_rfm_segments

    ts, uid, val, et = [], [], [], []

    def ev(u, d, v):
        ts.append(d * DAY_US)
        uid.append(u)
        val.append(v)
        et.append("view")

    # user0: rec 0d, 2 events, 10.00 total
    ev(0, 10, 4.0)
    ev(0, 10, 6.0)
    # user1: rec 1d, 3 events, 20.00 total
    for v in (5.0, 7.0, 8.0):
        ev(1, 9, v)
    # user2: rec 2d, 4 events, 30.00 total
    for v in (6.0, 7.0, 8.0, 9.0):
        ev(2, 8, v)
    _write(tmp_path, "events", _events_table(ts, uid, val, et))
    out = q_rfm_segments(str(tmp_path)).to_pylist()
    assert out == [
        {"r": 0, "f": 0, "m": 0, "n_users": 1},
        {"r": 1, "f": 1, "m": 1, "n_users": 1},
        {"r": 2, "f": 2, "m": 2, "n_users": 1},
    ]


@pytest.mark.parametrize(
    "qname", ["holt_winters", "mann_kendall", "odds_ratio"]
)
def test_dual_path_equality_batch5(ray_session, qname):
    from patito_ray.pipelines.queries import QUERIES

    fn = QUERIES[qname][0]
    assert fn(SF).equals(fn(SF, limit_bytes=0)), qname


def test_holt_winters_tracks_linear_ramp(ray_session, tmp_path):
    """On an exact linear ramp c_t = a + b*t the Holt recursion is
    invariant: level == c_t and trend == b at every step (algebraic
    fixed point), so the outputs are known exactly."""
    from patito_ray.pipelines.q_wave8 import q_holt_winters

    day = list(range(30))
    price = [(1000.0 + 25.0 * d) / 100.0 for d in day]  # cents ramp b=25
    _write(tmp_path, "lineitem", _lineitem_table(day, price))
    out = q_holt_winters(str(tmp_path)).to_pydict()
    assert out["n_days"] == [30]
    assert out["level"] == [1000.0 + 25.0 * 29]
    assert out["trend"] == [25.0]
    assert out["forecast7"] == [1000.0 + 25.0 * 29 + 7 * 25.0]

    const = tmp_path / "const"
    const.mkdir()
    _write(const, "lineitem", _lineitem_table(day, [5.0] * 30))
    out2 = q_holt_winters(str(const)).to_pydict()
    assert out2["level"] == [500.0]
    assert out2["trend"] == [0.0]
    assert out2["forecast7"] == [500.0]


def test_mann_kendall_monotone_extremes(ray_session, tmp_path):
    """Strictly increasing daily revenue => S = n(n-1)/2 (every pair
    concordant); strictly decreasing => the exact negation."""
    from patito_ray.pipelines.q_wave8 import q_mann_kendall

    day = list(range(25))
    up = [(100.0 + d) / 100.0 for d in day]
    _write(tmp_path, "lineitem", _lineitem_table(day, up))
    out = q_mann_kendall(str(tmp_path)).to_pydict()
    assert out["s"] == [25 * 24 // 2]
    assert out["z"][0] > 4.0

    dn = tmp_path / "dn"
    dn.mkdir()
    _write(dn, "lineitem", _lineitem_table(day, up[::-1]))
    out2 = q_mann_kendall(str(dn)).to_pydict()
    assert out2["s"] == [-(25 * 24 // 2)]
    assert out2["z"][0] < -4.0


def test_odds_ratio_planted_table(ray_session, tmp_path):
    """Hand-planted 2x2 (n11=10, n10=5, n01=4, n00=8): OR = 80/20 = 4,
    CI bounds match an independent numpy Wald evaluation."""
    from patito_ray.pipelines.q_wave8 import q_odds_ratio

    ts, uid, val, et = [], [], [], []
    u = 0

    def user(a, b):
        nonlocal u
        ts.append(u)
        uid.append(u)
        val.append(200.0 if a else 1.0)
        et.append("view")
        ts.append(u)
        uid.append(u)
        val.append(1.0)
        et.append("error" if b else "click")
        u += 1

    for _ in range(10):
        user(True, True)
    for _ in range(5):
        user(True, False)
    for _ in range(4):
        user(False, True)
    for _ in range(8):
        user(False, False)
    _write(tmp_path, "events", _events_table(ts, uid, val, et))
    out = q_odds_ratio(str(tmp_path)).to_pydict()
    assert (out["n11"], out["n10"], out["n01"], out["n00"]) == (
        [10], [5], [4], [8]
    )
    assert out["odds"] == [4.0]
    se = 1.96 * np.sqrt(1 / 10 + 1 / 5 + 1 / 4 + 1 / 8)
    assert abs(out["ci_lo"][0] - (np.log(4.0) - se)) < 1e-5
    assert abs(out["ci_hi"][0] - (np.log(4.0) + se)) < 1e-5


@pytest.mark.parametrize(
    "qname", ["page_hinkley", "dispersion_index", "price_index"]
)
def test_dual_path_equality_batch6(ray_session, qname):
    from patito_ray.pipelines.queries import QUERIES

    fn = QUERIES[qname][0]
    assert fn(SF).equals(fn(SF, limit_bytes=0)), qname


def test_page_hinkley_shift_vs_stable(ray_session, tmp_path):
    """A planted 2e8-cent level shift at day 20 must raise alarms; a
    constant series must end with u == 0 and zero alarms."""
    from patito_ray.pipelines.q_wave8 import q_page_hinkley

    day = list(range(40))
    shifted = [10.0 if d < 20 else 2_000_000.0 for d in day]
    _write(tmp_path, "lineitem", _lineitem_table(day, shifted))
    out = q_page_hinkley(str(tmp_path)).to_pydict()
    assert out["n_days"] == [40]
    assert out["alarms"][0] >= 1
    assert out["u"][0] - out["min_u"][0] > 5e7

    stable = tmp_path / "stable"
    stable.mkdir()
    _write(stable, "lineitem", _lineitem_table(day, [10.0] * 40))
    out2 = q_page_hinkley(str(stable)).to_pydict()
    assert out2["alarms"] == [0]
    assert out2["u"] == [0.0] and out2["min_u"] == [0.0]


def test_dispersion_index_planted(ray_session, tmp_path):
    """Constant daily counts => VMR == 0 (underdispersed); a 1,3
    alternating series of 10 days => VMR = 100/180 exactly."""
    from patito_ray.pipelines.q_wave8 import q_dispersion_index

    ts, uid, val, et = [], [], [], []

    def add(etype, d, count):
        for i in range(count):
            ts.append(d * DAY_US + i * US)
            uid.append(0)
            val.append(1.0)
            et.append(etype)

    for d in range(10):
        add("const", d, 2)
        add("alt", d, 3 if d % 2 else 1)
    _write(tmp_path, "events", _events_table(ts, uid, val, et))
    rows = {r["event_type"]: r for r in
            q_dispersion_index(str(tmp_path)).to_pylist()}
    assert rows["const"]["vmr"] == 0.0
    assert rows["alt"]["vmr"] == round(100 / 180, 6)
    assert rows["alt"]["chi2"] == 5.0  # (10*50-400)/20


def test_price_index_hand_computed(ray_session, tmp_path):
    """Two parts, hand-computed indices: A's unit price doubles
    (1.00 -> 2.00), B's stays 1.00 => Laspeyres 2400/1400, Paasche
    1800/1300."""
    from patito_ray.pipelines.q_wave8 import q_price_index

    n = 4
    t = pa.table(
        {
            "l_orderkey": pa.array(np.arange(n), pa.int64()),
            "l_partkey": pa.array([1, 1, 2, 2], pa.int64()),
            "l_suppkey": pa.array(np.zeros(n, np.int64)),
            "l_linenumber": pa.array(np.ones(n, np.int32), pa.int32()),
            "l_quantity": pa.array([10.0, 5.0, 4.0, 8.0], pa.float64()),
            "l_extendedprice": pa.array([10.0, 10.0, 4.0, 8.0], pa.float64()),
            "l_discount": pa.array(np.zeros(n, np.float64)),
            "l_tax": pa.array(np.zeros(n, np.float64)),
            "l_returnflag": pa.array(["N"] * n, pa.string()),
            "l_linestatus": pa.array(["O"] * n, pa.string()),
            "l_shipdate": pa.array(
                np.array([0, 10, 0, 10], np.int64) * DAY_US, pa.int64()
            ).cast(pa.timestamp("us")),
        }
    )
    _write(tmp_path, "lineitem", t)
    out = q_price_index(str(tmp_path)).to_pydict()
    lasp = (1000 * 10 / 5 + 800 * 4 / 8) / 1400
    paa = 1800 / (1000 * 5 / 10 + 400 * 8 / 4)
    assert out["n_parts"] == [2]
    assert abs(out["laspeyres"][0] - lasp) < 1e-6
    assert abs(out["paasche"][0] - paa) < 1e-6
    assert abs(out["fisher"][0] - np.sqrt(lasp * paa)) < 1e-6


@pytest.mark.parametrize("qname", ["bowley_skew", "seasonal_strength"])
def test_dual_path_equality_batch7(ray_session, qname):
    from patito_ray.pipelines.queries import QUERIES

    fn = QUERIES[qname][0]
    assert fn(SF).equals(fn(SF, limit_bytes=0)), qname


def test_bowley_skew_planted(ray_session, tmp_path):
    """A symmetric value set => bowley == 0; a hand-planted skewed set
    has known selection quartiles (n=8: ranks 2,4,6)."""
    from patito_ray.pipelines.q_wave8 import q_bowley_skew

    sym = [100.0, 200.0, 300.0, 400.0, 500.0, 600.0, 700.0]
    _write(tmp_path, "orders", _orders_table(["1-X"] * 7, sym))
    out = q_bowley_skew(str(tmp_path)).to_pydict()
    assert (out["q1"], out["q2"], out["q3"]) == ([20000], [40000], [60000])
    assert out["bowley"] == [0.0]

    sk = tmp_path / "sk"
    sk.mkdir()
    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 100.0]  # n=8
    _write(sk, "orders", _orders_table(["1-X"] * 8, vals))
    out2 = q_bowley_skew(str(sk)).to_pydict()
    # ranks ceil(11/4)=2, ceil(9/2)=4, ceil(27/4)=6 -> 200, 400, 600
    assert (out2["q1"], out2["q2"], out2["q3"]) == ([200], [400], [600])
    assert out2["bowley"] == [0.0]  # quartiles ignore the outlier
    # push the skew INSIDE the quartile range
    sk2 = tmp_path / "sk2"
    sk2.mkdir()
    vals2 = [1.0, 1.0, 1.0, 2.0, 2.0, 10.0, 20.0, 30.0]
    _write(sk2, "orders", _orders_table(["1-X"] * 8, vals2))
    out3 = q_bowley_skew(str(sk2)).to_pydict()
    q1, q2, q3 = out3["q1"][0], out3["q2"][0], out3["q3"][0]
    assert (q1, q2, q3) == (100, 200, 1000)
    assert out3["bowley"][0] == round((q3 + q1 - 2 * q2) / (q3 - q1), 6)
    assert out3["bowley"][0] > 0.5  # right skew


def test_seasonal_strength_extremes(ray_session, tmp_path):
    """A pure repeating weekday pattern (zero within-weekday variance)
    => strength == 1; identical multisets per weekday => 0."""
    from patito_ray.pipelines.q_wave8 import q_seasonal_strength

    day = list(range(28))
    pure = [float(1 + ((d + 4) % 7)) * 10.0 for d in day]
    _write(tmp_path, "lineitem", _lineitem_table(day, pure))
    out = q_seasonal_strength(str(tmp_path)).to_pydict()
    assert out["n_days"] == [28]
    assert out["strength"] == [1.0]

    nul = tmp_path / "nul"
    nul.mkdir()
    flat = [1.0 if d < 7 else 2.0 for d in range(14)]
    _write(nul, "lineitem", _lineitem_table(list(range(14)), flat))
    out2 = q_seasonal_strength(str(nul)).to_pydict()
    assert out2["strength"] == [0.0]


def test_embeddings_checks_planted(ray_session, tmp_path):
    """Planted violations (the corpus itself is clean): duplicate
    vec_id, wrong dimension, out-of-range label, null embedding —
    every counter fires with the exact count."""
    import pyarrow.parquet as pq

    from patito_ray.pipelines.q_wave8 import q_embeddings_checks

    emb = [[float(i)] * 64 for i in range(6)]
    emb[2] = [1.0] * 63  # wrong dim
    emb[4] = None  # null embedding
    t = pa.table(
        {
            "vec_id": pa.array([0, 1, 1, 3, 4, 5], pa.int64()),  # dup 1
            "embedding": pa.array(emb, pa.list_(pa.float32())),
            "label": pa.array([0, 9, 3, 10, 2, -1], pa.int32()),  # 2 oob
        }
    )
    pq.write_table(t, f"{tmp_path}/embeddings.parquet")
    out = q_embeddings_checks(str(tmp_path)).to_pydict()
    assert out["row_count"] == [6]
    assert out["vec_id_dups"] == [2]  # both rows of the duplicated key
    assert out["label_oob"] == [2]
    assert out["emb_nulls"] == [1]
    assert out["dim_viol"] == [1]
