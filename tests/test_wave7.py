"""Wave-7 operators: grouped rank tests, randomization test, daily
series, DSIR weights, soft-dedup weights, completeness / conditional
referential audits. Each exact query is checked against a brute-force
numpy reference on crafted inputs, and every adaptive merge runs BOTH
paths (driver fast path and limit_bytes=0 forced-distributed)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _write(dirpath, name, table):
    pq.write_table(table, f"{dirpath}/{name}.parquet")


# ---------------------------------------------------------------------------
# dual-path equality over the real testdata
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "qname",
    [
        "runs_test",
        "ewma_daily",
        "acf_lags",
        "trend_ma",
        "kruskal_wallis",
        "anova_oneway",
        "levene_bf",
        "permutation_test",
        "conditional_referential",
        "srm_check",
        "zipf_slope",
        "label_separability",
        "ljung_box",
        "adf_test",
        "grouped_changepoint",
    ],
)
def test_dual_path_equality(ray_session, qname):
    from patito_ray.pipelines.queries import QUERIES

    fn = QUERIES[qname][0]
    fast = fn(SF)
    forced = fn(SF, limit_bytes=0)
    assert fast.equals(forced), qname


# ---------------------------------------------------------------------------
# brute-force references on crafted groups (ties included)
# ---------------------------------------------------------------------------


def _crafted_events(tmp_path):
    rng = np.random.default_rng(7)
    groups = ["a"] * 40 + ["b"] * 30 + ["c"] * 30
    # integer cents grid with heavy ties
    vals = np.concatenate(
        [
            rng.integers(0, 20, 40),
            rng.integers(5, 25, 30),
            rng.integers(10, 30, 30),
        ]
    ).astype(np.float64)
    t = pa.table(
        {
            "event_id": pa.array(np.arange(100), pa.int64()),
            "ts": pa.array(np.arange(100) * 10**6, pa.int64()).cast(
                pa.timestamp("us")
            ),
            "user_id": pa.array(np.zeros(100), pa.int64()),
            "event_type": pa.array(groups, pa.string()),
            "value": pa.array(vals / 100.0, pa.float64()),
            "props": pa.array([""] * 100, pa.string()),
        }
    )
    _write(tmp_path, "events", t)
    return np.asarray(groups), vals.astype(np.int64)


def _midranks(v):
    order = np.argsort(v, kind="stable")
    r = np.empty(v.size, dtype=np.float64)
    sv = v[order]
    i = 0
    while i < sv.size:
        j = i
        while j < sv.size and sv[j] == sv[i]:
            j += 1
        r[order[i:j]] = (i + j + 1) / 2.0  # 1-based midrank
        i = j
    return r


def test_kruskal_vs_brute(ray_session, tmp_path):
    from patito_ray.pipelines.q_wave7 import q_kruskal_wallis

    g, v = _crafted_events(tmp_path)
    out = q_kruskal_wallis(str(tmp_path)).to_pydict()
    n = v.size
    r = _midranks(v)
    h = (
        12.0 / (n * (n + 1.0))
        * sum(
            (r[g == k].sum()) ** 2 / (g == k).sum() for k in ["a", "b", "c"]
        )
        - 3.0 * (n + 1.0)
    )
    _, t = np.unique(v, return_counts=True)
    c = 1.0 - float((t.astype(np.int64) ** 3 - t).sum()) / (n**3 - n)
    assert out["n"] == [n]
    assert out["n_groups"] == [3]
    assert abs(out["h"][0] - h) < 1e-6
    assert abs(out["h_c"][0] - h / c) < 1e-6


def test_anova_levene_vs_brute(ray_session, tmp_path):
    from patito_ray.pipelines.q_wave7 import q_anova_oneway, q_levene_bf

    g, v = _crafted_events(tmp_path)

    def anova_f(x, labels):
        ks = sorted(set(labels.tolist()))
        n = x.size
        gm = x.mean()
        ssb = sum(
            (labels == k).sum() * (x[labels == k].mean() - gm) ** 2 for k in ks
        )
        ssw = sum(
            ((x[labels == k] - x[labels == k].mean()) ** 2).sum() for k in ks
        )
        return (ssb / (len(ks) - 1)) / (ssw / (n - len(ks)))

    f = q_anova_oneway(str(tmp_path)).to_pydict()["f"][0]
    assert abs(f - anova_f(v.astype(np.float64), g)) < 1e-5

    # Brown-Forsythe = ANOVA over |x - group median|; the engine's
    # doubled-grid z = |2x - 2m| scales SSB/SSW by 4 and F not at all
    z = np.concatenate(
        [
            np.abs(v[g == k] - np.median(v[g == k]))
            for k in ["a", "b", "c"]
        ]
    )
    zg = np.concatenate([g[g == k] for k in ["a", "b", "c"]])
    f_bf = q_levene_bf(str(tmp_path)).to_pydict()["f"][0]
    assert abs(f_bf - anova_f(z, zg)) < 1e-5


def test_permutation_bounds_and_determinism(ray_session):
    from patito_ray.pipelines.q_wave7 import _PERM_REPS, q_permutation_test

    a = q_permutation_test(SF).to_pydict()
    b = q_permutation_test(SF).to_pydict()
    assert a == b  # splitmix relabels are deterministic
    assert 0 <= a["exceed"][0] <= _PERM_REPS
    lo = 1.0 / (_PERM_REPS + 1.0)
    assert lo <= a["p"][0] <= 1.0
    assert a["na"][0] > 0 and a["nb"][0] > 0


def test_ewma_recursion_exact(ray_session):
    from patito_ray.pipelines.q_wave7 import q_ewma_daily

    out = q_ewma_daily(SF).to_pydict()
    c = out["cents"]
    e = out["ewma"]
    assert e[0] == float(c[0])
    for i in range(1, len(c)):
        assert e[i] == 0.25 * float(c[i]) + 0.75 * e[i - 1]  # bit-exact


def test_runs_and_acf_invariants(ray_session):
    from patito_ray.pipelines.q_wave7 import q_acf_lags, q_runs_test

    r = q_runs_test(SF).to_pydict()
    assert r["n_above"][0] + r["n_below"][0] == r["n_days"][0]
    assert 1 <= r["runs"][0] <= r["n_days"][0]

    acf = q_acf_lags(SF).to_pydict()
    assert len(acf["lag"]) > 0
    for val in acf["r"]:
        assert val is None or -1.0 <= val <= 1.0


def test_trend_ma_window_exact(ray_session):
    from patito_ray.pipelines.q_wave7 import (
        _daily_lineitem_cents,
        q_trend_ma,
    )

    day, cents = _daily_lineitem_cents(SF)
    out = q_trend_ma(SF).to_pydict()
    # every output day has all 7 window days present and ma7 == mean
    lut = dict(zip(day.tolist(), cents.tolist()))
    assert len(out["d"]) > 0
    for d, ma in zip(out["d"], out["ma7"]):
        di = int(d.timestamp() // 86400) if hasattr(d, "timestamp") else None
        if di is None:
            continue
        w = [lut.get(di + k) for k in range(-3, 4)]
        assert all(x is not None for x in w)
        assert abs(ma - sum(w) / 7.0) < 1e-5


def test_soft_dedup_weights_clusters(ray_session, tmp_path):
    from patito_ray.pipelines.q_wave7 import q_soft_dedup_weights

    texts = ["dup one"] * 3 + ["solo a", "solo b"] + ["dup two"] * 2
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(["s"] * len(texts), pa.string()),
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        }
    )
    _write(tmp_path, "documents", t)
    out = q_soft_dedup_weights(str(tmp_path))
    tab = out if isinstance(out, pa.Table) else pa.concat_tables(
        [pa.table(b) for b in out.iter_batches(batch_format="pyarrow")]
    )
    d = dict(zip(tab.column("doc_id").to_pylist(), tab.column("dup_count").to_pylist()))
    assert [d[i] for i in range(7)] == [3, 3, 3, 1, 1, 2, 2]
    wsum = sum(tab.column("weight").to_pylist())
    assert abs(wsum - 4.0) < 1e-4  # 4 distinct contents


def test_dsir_weights_direction(ray_session, tmp_path):
    from patito_ray.pipelines.q_wave7 import q_dsir_weights

    # 'en' docs use token 'alpha'; others use 'beta' — an alpha-heavy
    # doc must score higher than a beta-heavy one
    texts = ["alpha alpha alpha", "alpha alpha alpha", "beta beta beta", "beta beta beta"]
    langs = ["en", "en", "de", "de"]
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(4), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(["s"] * 4, pa.string()),
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        }
    )
    _write(tmp_path, "documents", t)
    out = q_dsir_weights(str(tmp_path))
    tab = out if isinstance(out, pa.Table) else pa.concat_tables(
        [pa.table(b) for b in out.iter_batches(batch_format="pyarrow")]
    )
    w = dict(zip(tab.column("doc_id").to_pylist(), tab.column("logw").to_pylist()))
    assert w[0] > w[2] and w[1] > w[3]
    assert w[0] > 0 > w[2]


def test_completeness_and_conditional_referential(ray_session, tmp_path):
    from patito_ray.pipelines.q_wave7 import (
        q_completeness_by_source,
        q_conditional_referential,
    )

    # "\t" row: DuckDB TRIM strips spaces only, so tab-only text is
    # NOT empty on either engine (it lands in n_short via n_chars < 50)
    texts = ["long enough document text here", "", "   ", "tiny", None, "\t"]
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(6), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * 6, pa.string()),
            "source": pa.array(["s1", "s1", "s1", "s1", "s2", "s2"], pa.string()),
            "n_chars": pa.array([60, 0, 3, 4, 0, 1], pa.int64()),
        }
    )
    _write(tmp_path, "documents", t)
    out = q_completeness_by_source(str(tmp_path))
    d = {
        r["source"]: r for r in out.to_pylist()
    }
    assert d["s1"]["n"] == 4 and d["s1"]["n_empty"] == 2 and d["s1"]["n_short"] == 1
    assert d["s2"]["n"] == 2 and d["s2"]["n_empty"] == 1 and d["s2"]["n_short"] == 1
    assert d["s1"]["ok"] and not d["s2"]["ok"]  # 4*1 > 2

    day_us = 86_400_000_000
    orders = pa.table(
        {
            "o_orderkey": pa.array([1, 2, 3], pa.int64()),
            "o_custkey": pa.array([1, 1, 1], pa.int64()),
            "o_orderstatus": pa.array(["F", "F", "F"], pa.string()),
            "o_totalprice": pa.array([1.0, 1.0, 1.0], pa.float64()),
            "o_orderdate": pa.array([0, 0, 0], pa.int64()).cast(pa.timestamp("us")),
            "o_orderpriority": pa.array(
                ["1-URGENT", "1-URGENT", "5-LOW"], pa.string()
            ),
        }
    )
    li = pa.table(
        {
            "l_orderkey": pa.array([1, 1, 2, 3], pa.int64()),
            "l_partkey": pa.array([1, 1, 1, 1], pa.int64()),
            "l_suppkey": pa.array([1, 1, 1, 1], pa.int64()),
            "l_linenumber": pa.array([1, 2, 1, 1], pa.int32()),
            "l_quantity": pa.array([1.0] * 4, pa.float64()),
            "l_extendedprice": pa.array([1.0] * 4, pa.float64()),
            "l_discount": pa.array([0.0] * 4, pa.float64()),
            "l_tax": pa.array([0.0] * 4, pa.float64()),
            "l_returnflag": pa.array(["N"] * 4, pa.string()),
            "l_linestatus": pa.array(["O"] * 4, pa.string()),
            "l_shipdate": pa.array(
                [10 * day_us, 120 * day_us, 30 * day_us, 200 * day_us],
                pa.int64(),
            ).cast(pa.timestamp("us")),
        }
    )
    _write(tmp_path, "orders", orders)
    _write(tmp_path, "lineitem", li)
    out = q_conditional_referential(str(tmp_path)).to_pydict()
    # urgent orders 1,2 cover 3 lineitems; the 120-day ship violates
    assert out["checked"] == [3]
    assert out["violations"] == [1]
    assert out["ok"] == [False]


def test_bh_pairs_stepup_and_dual_path(ray_session):
    from patito_ray.pipelines.q_wave7 import q_bh_pairs

    fast = q_bh_pairs(SF)
    forced = q_bh_pairs(SF, limit_bytes=0)
    assert fast.equals(forced)
    rows = sorted(fast.to_pylist(), key=lambda r: r["p_rank"])
    assert len(rows) == 10  # C(5,2) event-type pairs
    # BH rejections are a prefix of the p-rank order
    flags = [r["reject"] for r in rows]
    assert flags == sorted(flags, reverse=True)
    # p is the exact (1+exceed)/(R+1) rational
    for r in rows:
        assert abs(r["p"] - (1 + r["exceed"]) / 65.0) < 1e-6
    # BH guarantee: every rejected pair satisfies p_(i) <= alpha*i/m
    # (the missing /m once rejected a p=0.97 pair — pin the bound)
    m = len(rows)
    for r in rows:
        if r["reject"]:
            assert r["p"] <= 0.1 * r["p_rank"] / m + 1e-9, r


def test_edge_jaccard_brute(ray_session):
    import ray.data as rd

    from patito_ray.functions.graph import edge_jaccard

    edges = pa.table(
        {
            "src": pa.array([0, 0, 1, 1, 2, 2, 3, 0, 0], pa.int64()),
            "dst": pa.array([1, 2, 2, 3, 3, 0, 3, 1, 0], pa.int64()),
        }
    )  # includes a duplicate (0,1) and a self-loop (3,3), (0,0)
    out_ds = edge_jaccard(rd.from_arrow(edges), limit_bytes=0)
    tabs = [pa.table(b) for b in out_ds.iter_batches(batch_format="pyarrow")]
    out = pa.concat_tables([t for t in tabs if t.num_rows])
    # brute force
    import collections

    adj = collections.defaultdict(set)
    dedup = set()
    for s, d in zip(edges.column("src").to_pylist(), edges.column("dst").to_pylist()):
        if s != d:
            dedup.add((s, d))
            adj[s].add(d)
    got = {
        (r["src"], r["dst"]): r for r in out.to_pylist()
    }
    assert set(got) == dedup
    for (u, v), r in got.items():
        nu, nv = adj[u], adj.get(v, set())
        common = len(nu & nv)
        union = len(nu | nv)
        assert r["common"] == common, (u, v)
        assert r["du"] == len(nu) and r["dv"] == len(nv)
        expect = common / union if union else 0.0
        assert abs(r["jaccard"] - expect) < 1e-5


def test_randomization_test_property(ray_session):
    """Distributed partial assembly == single-pass brute replay of the
    identical splitmix coins, across random inputs and block splits."""
    import ray.data as rd

    from patito_ray.functions.dedup import _splitmix
    from patito_ray.functions.randtest import randomization_test

    rng = np.random.default_rng(3)
    for trial in range(5):
        n = int(rng.integers(5, 200))
        ids = rng.permutation(10_000)[:n].astype(np.int64)
        grp = rng.choice(["a", "b", "c"], size=n)  # 'c' rows are ignored
        cents = rng.integers(0, 500, n).astype(np.int64)
        t = pa.table(
            {
                "rid": pa.array(ids, pa.int64()),
                "g": pa.array(grp, pa.string()),
                "v": pa.array(cents.astype(np.float64) / 100.0, pa.float64()),
            }
        )
        ds = rd.from_arrow(t).repartition(4)
        reps, seed = 16, 77
        got = randomization_test(
            ds,
            id_col="rid",
            group_col="g",
            value_col="v",
            group_a="a",
            group_b="b",
            reps=reps,
            seed=seed,
            limit_bytes=0 if trial % 2 else None,
        )
        # brute single-pass replay
        m = np.isin(grp, ["a", "b"])
        rid, g, c = ids[m].astype(np.uint64), grp[m], cents[m]
        is_a = g == "a"
        sa_o, na_o = int(c[is_a].sum()), int(is_a.sum())
        sb_o, nb_o = int(c[~is_a].sum()), int((~is_a).sum())
        if na_o == 0 or nb_o == 0:
            assert got["p"] is None
            continue
        obs_num = abs(sa_o * nb_o - sb_o * na_o)
        exceed = 0
        for b in range(reps):
            h = _splitmix((rid * np.uint64(reps) + np.uint64(b)) ^ np.uint64(seed))
            a = h < np.uint64(1) << np.uint64(63)
            sa, na = int(c[a].sum()), int(a.sum())
            sb, nb = int(c[~a].sum()), int((~a).sum())
            if na == 0 or nb == 0:
                exceed += 1
            elif abs(sa * nb - sb * na) * (na_o * nb_o) >= obs_num * (na * nb):
                exceed += 1
        assert got["na"] == na_o and got["nb"] == nb_o
        assert got["sa"] == sa_o and got["sb"] == sb_o
        assert got["exceed"] == exceed, trial


def test_late_events_brute(ray_session, tmp_path):
    from patito_ray.pipelines.q_wave7 import q_late_events

    hour = 3_600_000_000
    # user 1: arrival order 0,1,2 with ts 10h, 2h (8h late), 9h30 (late 30m)
    ts = [10 * hour, 2 * hour, int(9.5 * hour), 5 * hour, 6 * hour]
    uid = [1, 1, 1, 2, 2]
    et = ["view", "view", "click", "view", "view"]
    t = pa.table(
        {
            "event_id": pa.array(np.arange(5), pa.int64()),
            "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            "user_id": pa.array(uid, pa.int64()),
            "event_type": pa.array(et, pa.string()),
            "value": pa.array([1.0] * 5, pa.float64()),
            "props": pa.array([""] * 5, pa.string()),
        }
    )
    pq.write_table(t, f"{tmp_path}/events.parquet")
    out = {r["event_type"]: r for r in q_late_events(str(tmp_path)).to_pylist()}
    assert out["view"]["n"] == 4 and out["view"]["n_late"] == 1
    assert out["view"]["max_late_us"] == 8 * hour
    assert out["click"]["n"] == 1 and out["click"]["n_late"] == 0
    assert out["click"]["max_late_us"] == hour // 2


def test_harmonic_centrality_histogram(ray_session):
    from patito_ray.pipelines.q_wave7 import q_harmonic_centrality

    out = q_harmonic_centrality(SF).to_pydict()
    assert len(out["seed"]) == 8
    for r1, r2, r3, h in zip(out["r1"], out["r2"], out["r3"], out["h"]):
        assert abs(h - (r1 + r2 / 2.0 + r3 / 3.0)) < 1e-6
        assert r1 <= 3  # out-degree bound of the generator


def test_audience_overlap_brute(ray_session, tmp_path):
    from patito_ray.pipelines.q_wave7 import q_audience_overlap

    uid = [1, 1, 1, 2, 2, 3, 4, 4, 5, 1]
    # the last two rows carry an event type OUTSIDE _AUD_TYPES: both
    # engines must EXCLUDE them (SQL CASE-without-ELSE yields NULL;
    # the Ray side filters instead of raising KeyError) — user 5 has
    # only unknown events and must not appear in any audience.
    et = [
        "click", "view", "click", "view", "purchase", "click", "error",
        "signup", "future_type", "future_type",
    ]
    n = len(uid)
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "ts": pa.array(np.arange(n), pa.int64()).cast(pa.timestamp("us")),
            "user_id": pa.array(uid, pa.int64()),
            "event_type": pa.array(et, pa.string()),
            "value": pa.array([1.0] * n, pa.float64()),
            "props": pa.array([""] * n, pa.string()),
        }
    )
    pq.write_table(t, f"{tmp_path}/events.parquet")
    for lb in (None, 0):
        out = {
            (r["type_a"], r["type_b"]): r
            for r in q_audience_overlap(str(tmp_path), limit_bytes=lb).to_pylist()
        }
        assert len(out) == 10
        import collections

        users = collections.defaultdict(set)
        for u, e in zip(uid, et):
            users[e].add(u)
        for (a, b), r in out.items():
            inter = len(users[a] & users[b])
            assert r["na"] == len(users[a]) and r["nb"] == len(users[b])
            assert r["inter"] == inter
            union = len(users[a] | users[b])
            assert abs(r["jaccard"] - (inter / union if union else 0.0)) < 1e-6


def test_changepoint_planted(ray_session, tmp_path):
    from patito_ray.pipelines.q_wave7 import q_changepoint_day

    day_us = 86_400_000_000
    # 30 days at ~$10, then 30 days at ~$100: split must land at day 29
    days = np.arange(60, dtype=np.int64)
    price = np.where(days < 30, 10.0, 100.0) + (days % 3) * 0.01
    t = pa.table(
        {
            "l_orderkey": pa.array(days + 1, pa.int64()),
            "l_partkey": pa.array(np.ones(60), pa.int64()),
            "l_suppkey": pa.array(np.ones(60), pa.int64()),
            "l_linenumber": pa.array(np.ones(60), pa.int32()),
            "l_quantity": pa.array(np.ones(60), pa.float64()),
            "l_extendedprice": pa.array(price, pa.float64()),
            "l_discount": pa.array(np.zeros(60), pa.float64()),
            "l_tax": pa.array(np.zeros(60), pa.float64()),
            "l_returnflag": pa.array(["N"] * 60, pa.string()),
            "l_linestatus": pa.array(["O"] * 60, pa.string()),
            "l_shipdate": pa.array(days * day_us, pa.int64()).cast(
                pa.timestamp("us")
            ),
        }
    )
    pq.write_table(t, f"{tmp_path}/lineitem.parquet")
    out = q_changepoint_day(str(tmp_path)).to_pylist()[0]
    assert out["n_l"] == 30 and out["n_r"] == 30
    assert abs(out["mean_l"] - 1001.0) < 1.0  # ~$10.01 in cents
    assert abs(out["mean_r"] - 10001.0) < 1.0


def test_edge_jaccard_random_graphs(ray_session):
    """Randomized regression armor: edge_jaccard == brute force over
    random directed multigraphs with self-loops, both merge paths."""
    import collections

    import ray.data as rd

    from patito_ray.functions.graph import edge_jaccard

    rng = np.random.default_rng(11)
    for trial in range(4):
        n_nodes = int(rng.integers(4, 20))
        n_edges = int(rng.integers(5, 80))
        src = rng.integers(0, n_nodes, n_edges).astype(np.int64)
        dst = rng.integers(0, n_nodes, n_edges).astype(np.int64)
        t = pa.table({"src": pa.array(src), "dst": pa.array(dst)})
        out_ds = edge_jaccard(
            rd.from_arrow(t).repartition(3),
            limit_bytes=0 if trial % 2 else 256 << 20,
        )
        tabs = [
            b for b in out_ds.iter_batches(batch_format="pyarrow") if b.num_rows
        ]
        rows = (
            pa.concat_tables([pa.table(b) for b in tabs]).to_pylist()
            if tabs
            else []
        )
        adj = collections.defaultdict(set)
        dedup = set()
        for s, d in zip(src.tolist(), dst.tolist()):
            if s != d:
                dedup.add((s, d))
                adj[s].add(d)
        got = {(r["src"], r["dst"]): r for r in rows}
        assert set(got) == dedup, trial
        for (u, v), r in got.items():
            nu, nv = adj[u], adj.get(v, set())
            assert r["common"] == len(nu & nv)
            union = len(nu | nv)
            expect = len(nu & nv) / union if union else 0.0
            assert abs(r["jaccard"] - expect) < 1e-5


def test_kmeans_scalable_init_beats_degenerate_seed(ray_session):
    """k-means|| seeding on data where the naive 'k smallest ids' init
    is degenerate (ids 0..k-1 all in ONE planted cluster): the sampled
    seeds must cover every planted center, and Lloyd from them must
    reach a much lower inertia than from the naive seed."""
    import ray.data as rd

    from patito_ray.functions.clustering import (
        initial_centroids,
        kmeans_fit,
        kmeans_scalable_init,
    )
    from patito_ray.functions.dedup import _splitmix

    k, per, d = 8, 50, 8
    n = k * per
    ids = np.arange(n, dtype=np.int64)
    cluster = ids // per  # smallest k ids all in cluster 0
    centers = np.eye(k, d) * 10.0
    noise = (
        _splitmix(ids.view(np.uint64)[:, None] * np.uint64(d)
                  + np.arange(d, dtype=np.uint64)[None, :]).astype(np.float64)
        / 2**64
        - 0.5
    ) * 0.2
    vecs = centers[cluster] + noise
    t = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs]),
        }
    )
    ds = rd.from_arrow(t).repartition(4).materialize()

    init = kmeans_scalable_init(ds, k, l=2 * k, rounds=3)
    assert init.shape == (k, d)
    # every planted center has a seed within the noise radius
    for c in centers:
        assert (((init - c) ** 2).sum(axis=1).min()) < 1.0

    def inertia(cent):
        d2 = ((vecs[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        return float(d2.min(axis=1).sum())

    fit_pp = kmeans_fit(ds, k, n_iter=5, init=init)
    fit_naive = kmeans_fit(
        ds, k, n_iter=5, init=initial_centroids(ds, k)
    )
    assert inertia(fit_pp) < 0.5 * inertia(fit_naive)
    # determinism: same data + seed -> identical seeds
    init2 = kmeans_scalable_init(ds, k, l=2 * k, rounds=3)
    assert np.array_equal(init, init2)


def _canon_table(out):
    import pandas as pd

    if isinstance(out, pa.Table):
        df = out.to_pandas()
    else:
        tabs = [
            pa.table(b) for b in out.iter_batches(batch_format="pyarrow")
        ]
        tabs = [t for t in tabs if t.num_rows]
        df = pa.concat_tables(tabs).to_pandas() if tabs else pd.DataFrame()
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize(
    "qname", ["soft_dedup_weights", "dsir_weights", "completeness_by_source"]
)
def test_dual_path_dataset_queries(ray_session, qname):
    """Dataset-returning adaptive queries: the forced-distributed merge
    branch (limit_bytes=0) must produce the identical canonical rows."""
    from patito_ray.pipelines.queries import QUERIES

    fn = QUERIES[qname][0]
    a = _canon_table(fn(SF))
    b = _canon_table(fn(SF, limit_bytes=0))
    assert a.equals(b), qname


def test_rank_family_random_property(ray_session, tmp_path):
    """Randomized regression armor for the grouped rank-test family:
    kruskal/anova/levene vs brute-force numpy references over random
    group layouts with ties, both merge paths."""
    from patito_ray.pipelines.q_wave7 import (
        q_anova_oneway,
        q_kruskal_wallis,
        q_levene_bf,
    )

    rng = np.random.default_rng(23)
    for trial in range(3):
        sizes = rng.integers(3, 40, size=int(rng.integers(2, 5)))
        groups = np.repeat(
            [f"g{i}" for i in range(sizes.size)], sizes
        )
        vals = rng.integers(0, 15, int(sizes.sum())).astype(np.int64)
        n = vals.size
        sub = tmp_path / f"t{trial}"
        sub.mkdir()
        t = pa.table(
            {
                "event_id": pa.array(np.arange(n), pa.int64()),
                "ts": pa.array(np.arange(n), pa.int64()).cast(pa.timestamp("us")),
                "user_id": pa.array(np.zeros(n), pa.int64()),
                "event_type": pa.array(groups, pa.string()),
                "value": pa.array(vals.astype(np.float64) / 100.0, pa.float64()),
                "props": pa.array([""] * n, pa.string()),
            }
        )
        pq.write_table(t, f"{sub}/events.parquet")
        lb = 0 if trial % 2 else None

        # brute references
        r = _midranks(vals)
        ks = sorted(set(groups.tolist()))
        h = (
            12.0 / (n * (n + 1.0))
            * sum((r[groups == k].sum()) ** 2 / (groups == k).sum() for k in ks)
            - 3.0 * (n + 1.0)
        )
        _, tt = np.unique(vals, return_counts=True)
        c = 1.0 - float((tt.astype(np.int64) ** 3 - tt).sum()) / (n**3 - n)

        out = q_kruskal_wallis(str(sub), limit_bytes=lb).to_pydict()
        assert abs(out["h"][0] - h) < 1e-5, trial
        if c > 0:
            assert abs(out["h_c"][0] - h / c) < 1e-4, trial

        def anova_f(x, labels):
            gm = x.mean()
            ssb = sum(
                (labels == k).sum() * (x[labels == k].mean() - gm) ** 2
                for k in ks
            )
            ssw = sum(
                ((x[labels == k] - x[labels == k].mean()) ** 2).sum()
                for k in ks
            )
            if ssw <= 0:
                return None
            return (ssb / (len(ks) - 1)) / (ssw / (x.size - len(ks)))

        f_ref = anova_f(vals.astype(np.float64), groups)
        f_got = q_anova_oneway(str(sub), limit_bytes=lb).to_pydict()["f"][0]
        if f_ref is None:
            assert f_got is None
        else:
            assert abs(f_got - f_ref) < 1e-4, trial

        z = np.concatenate(
            [np.abs(vals[groups == k] - np.median(vals[groups == k])) for k in ks]
        )
        zg = np.concatenate([groups[groups == k] for k in ks])
        bf_ref = anova_f(z.astype(np.float64), zg)
        bf_got = q_levene_bf(str(sub), limit_bytes=lb).to_pydict()["f"][0]
        if bf_ref is None:
            assert bf_got is None
        else:
            assert abs(bf_got - bf_ref) < 1e-4, trial


def _write_lineitem_series(dirpath, cents_by_day):
    day_us = 86_400_000_000
    n = len(cents_by_day)
    t = pa.table(
        {
            "l_orderkey": pa.array(np.arange(n) + 1, pa.int64()),
            "l_partkey": pa.array(np.ones(n), pa.int64()),
            "l_suppkey": pa.array(np.ones(n), pa.int64()),
            "l_linenumber": pa.array(np.ones(n), pa.int32()),
            "l_quantity": pa.array(np.ones(n), pa.float64()),
            "l_extendedprice": pa.array(
                np.asarray(cents_by_day, dtype=np.float64) / 100.0, pa.float64()
            ),
            "l_discount": pa.array(np.zeros(n), pa.float64()),
            "l_tax": pa.array(np.zeros(n), pa.float64()),
            "l_returnflag": pa.array(["N"] * n, pa.string()),
            "l_linestatus": pa.array(["O"] * n, pa.string()),
            "l_shipdate": pa.array(
                np.arange(n, dtype=np.int64) * day_us, pa.int64()
            ).cast(pa.timestamp("us")),
        }
    )
    pq.write_table(t, f"{dirpath}/lineitem.parquet")


def test_runs_test_planted_sequences(ray_session, tmp_path):
    """External ground truth: a perfectly alternating series has runs
    == n; a half/half block series has runs == 2."""
    from patito_ray.pipelines.q_wave7 import q_runs_test

    a = tmp_path / "alt"
    a.mkdir()
    _write_lineitem_series(a, [100, 900] * 20)
    out = q_runs_test(str(a)).to_pydict()
    assert out["runs"] == [40] and out["n_above"] == [20]
    assert out["z"][0] > 5.0  # far more runs than random

    b = tmp_path / "blocks"
    b.mkdir()
    _write_lineitem_series(b, [100] * 20 + [900] * 20)
    out = q_runs_test(str(b)).to_pydict()
    assert out["runs"] == [2]
    assert out["z"][0] < -5.0  # far fewer runs than random


def test_acf_ljung_planted_period2(ray_session, tmp_path):
    """External ground truth: a period-2 series has ACF ~ -1 at odd
    lags and ~ +1 at even lags, and a huge Ljung-Box Q."""
    from patito_ray.pipelines.q_wave7 import q_acf_lags, q_ljung_box

    _write_lineitem_series(tmp_path, [100, 900] * 30)
    acf = q_acf_lags(str(tmp_path)).to_pydict()
    by_lag = dict(zip(acf["lag"], acf["r"]))
    for k in (1, 3, 5, 7):
        assert by_lag[k] < -0.9, (k, by_lag[k])
    for k in (2, 4, 6):
        assert by_lag[k] > 0.9, (k, by_lag[k])
    q = q_ljung_box(str(tmp_path)).to_pydict()["q"][0]
    assert q > 100.0  # overwhelming autocorrelation


def test_adf_zipf_vs_numpy_reference(ray_session, tmp_path):
    """External ground truth: adf beta/t against numpy OLS on the same
    pairs; zipf slope against numpy lstsq over the same quantized
    log grid."""
    from patito_ray.pipelines.q_wave7 import (
        _daily_lineitem_cents,
        q_adf_test,
        q_zipf_slope,
    )

    rng = np.random.default_rng(5)
    series = (1000 + np.cumsum(rng.integers(-50, 51, 80))).tolist()
    _write_lineitem_series(tmp_path, series)
    out = q_adf_test(str(tmp_path)).to_pydict()
    day, cents = _daily_lineitem_cents(str(tmp_path))
    x = cents[:-1].astype(np.float64)
    dy = np.diff(cents).astype(np.float64)
    X = np.stack([np.ones_like(x), x], axis=1)
    beta_hat, res, *_ = np.linalg.lstsq(X, dy, rcond=None)
    resid = dy - X @ beta_hat
    s2 = float((resid**2).sum()) / (x.size - 2)
    se = np.sqrt(s2 / float(((x - x.mean()) ** 2).sum()))
    assert abs(out["beta"][0] - beta_hat[1]) < 1e-5
    assert abs(out["t_stat"][0] - beta_hat[1] / se) < 1e-3

    texts = ["alpha " * 8 + "beta " * 4 + "gamma " * 2 + "delta"] * 3
    doc = pa.table(
        {
            "doc_id": pa.array(np.arange(3), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * 3, pa.string()),
            "source": pa.array(["s"] * 3, pa.string()),
            "n_chars": pa.array([len(texts[0])] * 3, pa.int64()),
        }
    )
    pq.write_table(doc, f"{tmp_path}/documents.parquet")
    z = q_zipf_slope(str(tmp_path)).to_pydict()
    assert z["v"] == [4]
    freqs = np.array([24, 12, 6, 3], dtype=np.float64)
    lx = np.log(np.arange(1, 5, dtype=np.float64))
    ly = np.log(freqs)
    slope_ref = np.polyfit(lx, ly, 1)[0]
    assert abs(z["slope"][0] - slope_ref) < 1e-4


def test_label_separability_planted_dims(ray_session, tmp_path):
    """External ground truth: a dimension that encodes the label must
    score a far higher F than pure-noise dimensions."""
    from patito_ray.pipelines.q_wave7 import q_label_separability

    rng = np.random.default_rng(9)
    n = 200
    labels = (np.arange(n) % 4).astype(np.int32)
    vecs = rng.normal(0, 1, (n, 64)).astype(np.float32)
    vecs[:, 7] = labels * 5.0 + rng.normal(0, 0.1, n)  # planted signal dim
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs]),
            "label": pa.array(labels, pa.int32()),
        }
    )
    pq.write_table(t, f"{tmp_path}/embeddings.parquet")
    out = q_label_separability(str(tmp_path)).to_pydict()
    f = dict(zip(out["dim"], out["f"]))
    noise_max = max(v for d, v in f.items() if d != 7 and v is not None)
    assert f[7] > 100 * noise_max, (f[7], noise_max)
