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
    from patito_ray.pipelines.q_wave7 import q_mcnemar_test

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
    from patito_ray.pipelines.q_wave7 import q_cochran_armitage

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
    from patito_ray.pipelines.q_wave7 import q_cochran_armitage

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
    from patito_ray.pipelines.q_wave7 import q_weekday_anova

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
    from patito_ray.pipelines.q_wave7 import q_weekday_anova

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
    from patito_ray.pipelines.q_wave7 import q_grouped_runs

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
