"""mutual-NN / streaks / time-weighted-average / entropy vs pure-python
references, on synthetic inputs, through both merge paths where the
operator has them."""

from __future__ import annotations

import collections
import datetime
import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from patito_ray.functions.similarity import mutual_nn_pairs


def _collect(out) -> pa.Table:
    import ray

    if isinstance(out, pa.Table):
        return out
    tabs = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
    if not tabs:
        return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    return pa.concat_tables(tabs)


def _mutual_reference(ids: np.ndarray, vecs: np.ndarray) -> set[tuple[int, int]]:
    unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = unit @ unit.T
    np.fill_diagonal(sims, -np.inf)
    order = np.argsort(ids, kind="stable")
    # tie-break toward the smaller id, like the operator
    nn = {}
    for i in range(len(ids)):
        best = max(order, key=lambda j: (sims[i, j], -ids[j]) if j != i else (-np.inf, 0))
        nn[int(ids[i])] = int(ids[best])
    return {
        (a, b)
        for a, b in ((min(x, y), max(x, y)) for x, y in nn.items() if nn[y] == x)
        if a < b
    }


@pytest.mark.parametrize("limit_bytes", [256 << 20, 0])
def test_mutual_nn_planted_pairs(ray_session, limit_bytes):
    import ray.data as rd

    rng = np.random.default_rng(11)
    base = rng.normal(size=(40, 16)).astype(np.float32)
    # plant two tight mutual clusters far from the noise cloud
    base[0] = 10.0
    base[1] = base[0] + 1e-4
    base[2] = -10.0
    base[3] = base[2] - 1e-4
    ids = np.arange(40, dtype=np.int64)
    t = pa.table(
        {
            "vec_id": pa.array(ids, type=pa.int64()),
            "embedding": pa.array(
                [list(map(float, r)) for r in base], type=pa.list_(pa.float32())
            ),
        }
    )
    ds = rd.from_arrow(t).repartition(5)
    out = _collect(mutual_nn_pairs(ds, limit_bytes=limit_bytes))
    got = set(zip(out.column("a").to_pylist(), out.column("b").to_pylist()))
    assert (0, 1) in got and (2, 3) in got
    assert got == _mutual_reference(ids, base.astype(np.float64))


def test_mutual_nn_tiny_and_empty(ray_session):
    import ray.data as rd

    one = rd.from_arrow(
        pa.table(
            {"vec_id": pa.array([7], pa.int64()),
             "embedding": pa.array([[1.0, 0.0]], pa.list_(pa.float32()))}
        )
    )
    assert _collect(mutual_nn_pairs(one)).num_rows == 0


def _write_events(tmp_path, rows) -> str:
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
        }
    )
    pq.write_table(t, f"{tmp_path}/events.parquet")
    return str(tmp_path)


def test_user_streaks_reference(ray_session, tmp_path):
    from patito_ray.pipelines.queries import q_user_streaks

    d0 = datetime.datetime(2024, 3, 1)
    rows, eid = [], 0
    # user 1: days 0,1,2, 5,6, 9  -> streaks 3,2,1; user 2: one day, twice
    for day in (0, 1, 2, 5, 6, 9):
        rows.append((eid, d0 + datetime.timedelta(days=day, hours=3), 1, "view", 1.0))
        eid += 1
    rows.append((eid, d0, 2, "view", 1.0))
    rows.append((eid + 1, d0 + datetime.timedelta(hours=5), 2, "buy", 2.0))
    out = _collect(q_user_streaks(_write_events(tmp_path, rows)))
    got = {
        r["user_id"]: (r["max_streak"], r["n_streaks"], r["active_days"])
        for r in out.to_pylist()
    }
    assert got == {1: (3, 3, 6), 2: (1, 1, 1)}


def test_time_weighted_value_reference(ray_session, tmp_path):
    from patito_ray.pipelines.queries import q_time_weighted_value

    d0 = datetime.datetime(2024, 3, 1)
    rows = [
        # user 1: v=2.0 for 10s, v=4.0 for 30s -> twa = (2000*10+4000*30)/40
        (0, d0, 1, "a", 2.0),
        (1, d0 + datetime.timedelta(seconds=10), 1, "a", 4.0),
        (2, d0 + datetime.timedelta(seconds=40), 1, "a", 9.0),
        # user 2: single event -> excluded (no span)
        (3, d0, 2, "a", 5.0),
        # user 3: two events in the same second -> tspan 0, excluded
        (4, d0, 3, "a", 1.0),
        (5, d0 + datetime.timedelta(microseconds=5), 3, "a", 2.0),
    ]
    out = _collect(q_time_weighted_value(_write_events(tmp_path, rows)))
    got = {r["user_id"]: r for r in out.to_pylist()}
    assert set(got) == {1}
    assert got[1]["wsum"] == 2000 * 10 + 4000 * 30
    assert got[1]["tspan"] == 40
    assert got[1]["twa"] == (2000 * 10 + 4000 * 30) / 40


def test_user_event_entropy_reference(ray_session, tmp_path):
    from patito_ray.pipelines.queries import q_user_event_entropy

    d0 = datetime.datetime(2024, 3, 1)
    types = ["a", "a", "b", "c", "a", "b", "b", "a"]
    rows = [(i, d0 + datetime.timedelta(minutes=i), 1, ty, 1.0) for i, ty in enumerate(types)]
    rows.append((99, d0, 2, "solo", 1.0))
    out = _collect(q_user_event_entropy(_write_events(tmp_path, rows)))
    got = {r["user_id"]: r for r in out.to_pylist()}
    c = collections.Counter(types)
    n = sum(c.values())
    expect = sum(-(v / n) * math.log2(v / n) for v in c.values())
    assert got[1]["n_types"] == 3 and got[1]["n_events"] == n
    assert abs(got[1]["entropy"] - expect) < 1e-6
    assert got[2] == {"user_id": 2, "n_types": 1, "n_events": 1, "entropy": 0.0}


def _write_table(tmp_path, name, t):
    pq.write_table(t, f"{tmp_path}/{name}.parquet")


def test_segment_gini_reference(ray_session, tmp_path):
    from patito_ray.pipelines.queries import q_segment_gini

    cust = pa.table(
        {
            "c_custkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "c_mktsegment": pa.array(["A", "A", "A", "B", "B"]),
        }
    )
    orders = pa.table(
        {
            "o_custkey": pa.array([1, 1, 2, 3, 4, 5], pa.int64()),
            "o_totalprice": pa.array([10.0, 20.0, 30.0, 60.0, 5.0, 5.0], pa.float64()),
        }
    )
    _write_table(tmp_path, "customer", cust)
    _write_table(tmp_path, "orders", orders)

    def ref_gini(xs):
        xs = sorted(xs)
        n, s0 = len(xs), sum(xs)
        s1 = sum((i + 1) * x for i, x in enumerate(xs))
        return (2 * s1 - (n + 1) * s0) / (n * s0)

    for lb in (256 << 20, 0):
        out = _collect(q_segment_gini(str(tmp_path), _limit_bytes=lb))
        got = {r["segment"]: r for r in out.to_pylist()}
        # A: customers 30,30,60 cents*100; B: 5,5 (perfect equality -> 0)
        assert got["A"]["n"] == 3 and got["B"]["n"] == 2
        assert got["A"]["gini"] == ref_gini([3000, 3000, 6000])
        assert got["B"]["gini"] == 0.0


def test_cuped_adjust_reference(ray_session, tmp_path):
    from patito_ray.pipelines.queries import q_cuped_adjust

    pre_day = datetime.datetime(2024, 1, 5)
    post_day = datetime.datetime(2024, 1, 20)
    rows, eid = [], 0
    # user i: pre = i, post = 2*i + 1  (exact linear -> adjusted is flat-ish)
    for i in (1, 2, 3, 4):
        rows.append((eid, pre_day, i, "a", float(i)))
        eid += 1
        rows.append((eid, post_day, i, "a", 2.0 * i + 1.0))
        eid += 1
    sf = _write_events(tmp_path, rows)
    for lb in (256 << 20, 0):
        out = _collect(q_cuped_adjust(sf, _limit_bytes=lb))
        got = {r["user_id"]: r for r in out.to_pylist()}
        pre = {i: i * 1000 for i in (1, 2, 3, 4)}
        post = {i: (2 * i + 1) * 1000 for i in (1, 2, 3, 4)}
        n = 4
        sx = sum(pre.values()); sy = sum(post.values())
        sxy = sum(pre[i] * post[i] for i in pre)
        sxx = sum(v * v for v in pre.values())
        theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        meanpre = sx / n
        assert theta == 2.0
        for i in (1, 2, 3, 4):
            assert got[i]["pre"] == pre[i] and got[i]["post"] == post[i]
            assert got[i]["adjusted"] == post[i] - theta * (pre[i] - meanpre)


def test_source_simpson_reference(ray_session, tmp_path):
    from patito_ray.pipelines.queries import q_source_simpson

    langs = ["en", "en", "en", "de", "fr", "fr"]
    docs = pa.table(
        {
            "source": pa.array(["s1"] * 6 + ["s2"] + ["s3", "s3"]),
            "lang": pa.array(langs + ["en", "xx", "xx"]),
        }
    )
    _write_table(tmp_path, "documents", docs)
    out = _collect(q_source_simpson(str(tmp_path)))
    got = {r["source"]: r for r in out.to_pylist()}
    assert "s2" not in got  # n_docs == 1 excluded
    c = collections.Counter(langs)
    n = 6
    expect = sum(v * (v - 1) for v in c.values()) / (n * (n - 1))
    assert got["s1"]["n_docs"] == 6 and got["s1"]["n_langs"] == 3
    assert got["s1"]["simpson"] == expect
    assert got["s3"]["simpson"] == 1.0  # both docs same lang


def test_revenue_share_sums_to_one(ray_session):
    from patito_ray.pipelines.queries import q_revenue_share

    out = _collect(q_revenue_share("/root/testdata/sf0.001"))
    df = out.to_pylist()
    by_region: dict = {}
    for r in df:
        by_region.setdefault(r["region"], []).append(r)
    for rows in by_region.values():
        assert sum(r["nat_cents"] for r in rows) == rows[0]["region_cents"]
        assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-12


def test_winsorized_mean_reference(ray_session, tmp_path):
    from patito_ray.pipelines.queries import q_winsorized_mean

    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 100.0]
    t = pa.table(
        {
            "l_returnflag": pa.array(["A"] * 10 + ["B"] * 2),
            "l_extendedprice": pa.array(vals + [5.0, 5.0], pa.float64()),
        }
    )
    pq.write_table(t, f"{tmp_path}/lineitem.parquet")
    import math

    cents = sorted(int(v * 100) for v in vals)
    n = len(cents)
    lo = cents[max(1, math.ceil(0.1 * n)) - 1]
    hi = cents[max(1, math.ceil(0.9 * n)) - 1]
    expect = sum(min(hi, max(lo, c)) for c in cents) / n
    for lb in (256 << 20, 0):
        out = _collect(q_winsorized_mean(str(tmp_path), _limit_bytes=lb))
        got = {r["flag"]: r for r in out.to_pylist()}
        assert got["A"]["lo"] == lo and got["A"]["hi"] == hi
        assert got["A"]["wmean"] == expect
        assert got["B"]["wmean"] == 500.0


def test_user_burstiness_reference(ray_session, tmp_path):
    from patito_ray.pipelines.queries import q_user_burstiness

    d0 = datetime.datetime(2024, 3, 1)
    rows, eid = [], 0
    # user 1: daily counts 1, 3, 8 across three days
    for day, k in ((0, 1), (1, 3), (2, 8)):
        for _ in range(k):
            rows.append((eid, d0 + datetime.timedelta(days=day, minutes=eid), 1, "a", 1.0))
            eid += 1
    # user 2: single active day -> excluded
    rows.append((eid, d0, 2, "a", 1.0))
    out = _collect(q_user_burstiness(_write_events(tmp_path, rows)))
    got = {r["user_id"]: r for r in out.to_pylist()}
    assert set(got) == {1}
    counts = [1, 3, 8]
    n, sc, sc2 = len(counts), sum(counts), sum(c * c for c in counts)
    expect = ((sc2 - sc * sc / n) / (n - 1)) / (sc / n)
    assert got[1] == {"user_id": 1, "n": 3, "sc": 12, "fano": expect}


def test_user_profile_matches_standalone_operators(ray_session):
    """The fused single-exchange profile must agree column-for-column
    with the standalone operators it fuses."""
    from patito_ray.pipelines.queries import (
        q_time_weighted_value,
        q_user_burstiness,
        q_user_event_entropy,
        q_user_profile,
        q_user_streaks,
    )

    sf = "/root/testdata/sf0.001"
    prof = {r["user_id"]: r for r in _collect(q_user_profile(sf)).to_pylist()}
    streaks = {r["user_id"]: r for r in _collect(q_user_streaks(sf)).to_pylist()}
    twa = {r["user_id"]: r for r in _collect(q_time_weighted_value(sf)).to_pylist()}
    ent = {r["user_id"]: r for r in _collect(q_user_event_entropy(sf)).to_pylist()}
    fano = {r["user_id"]: r for r in _collect(q_user_burstiness(sf)).to_pylist()}
    assert prof  # non-trivial corpus
    for uid, p in prof.items():
        assert p["max_streak"] == streaks[uid]["max_streak"]
        assert p["active_days"] == streaks[uid]["active_days"]
        assert p["twa"] == twa[uid]["twa"]
        assert p["n_types"] == ent[uid]["n_types"]
        assert p["entropy"] == ent[uid]["entropy"]
        assert p["n_days"] == fano[uid]["n"]
        assert p["fano"] == fano[uid]["fano"]
    # profile keeps exactly the users every fused metric is defined for
    assert set(prof) == set(streaks) & set(twa) & set(fano) & set(ent)


def test_hard_negatives_planted(ray_session):
    import ray.data as rd

    from patito_ray.functions.similarity import hard_negative_mining

    rng = np.random.default_rng(5)
    base = rng.normal(size=(30, 8)).astype(np.float32)
    # vec 0 (label 0) is nearly identical to vec 1 (label 1): each is
    # the other's hard negative. vec 2 shares label 0 with vec 0 and
    # sits even closer to it — must be masked out.
    base[1] = base[0] + 1e-4
    base[2] = base[0] + 1e-6
    labels = np.array([0, 1] + [0] + [i % 3 for i in range(27)], dtype=np.int32)
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(30, dtype=np.int64)),
            "embedding": pa.array(
                [list(map(float, r)) for r in base], pa.list_(pa.float32())
            ),
            "label": pa.array(labels, pa.int32()),
        }
    )
    out = _collect(hard_negative_mining(rd.from_arrow(t).repartition(4)))
    got = dict(zip(out.column("vec_id").to_pylist(), out.column("neg_id").to_pylist()))
    assert len(got) == 30  # every vector has a different-label candidate
    assert got[0] == 1 and got[1] in (0, 2)  # 2 is label-0: valid for anchor 1
    # single-label corpus: nothing to mine
    t1 = pa.table(
        {
            "vec_id": pa.array([1, 2], pa.int64()),
            "embedding": pa.array([[1.0, 0.0], [0.0, 1.0]], pa.list_(pa.float32())),
            "label": pa.array([7, 7], pa.int32()),
        }
    )
    assert _collect(hard_negative_mining(rd.from_arrow(t1))).num_rows == 0


def test_cuped_zero_variance_and_empty(ray_session, tmp_path):
    import math

    from patito_ray.pipelines.queries import q_cuped_adjust

    # identical pre sums for every user -> zero pre-variance -> IEEE
    # nan adjusted values, not a crash (matches SQL DOUBLE division)
    d0 = datetime.datetime(2024, 1, 5)
    d1 = datetime.datetime(2024, 1, 20)
    rows = []
    for i in (1, 2, 3):
        rows.append((i * 2, d0, i, "a", 7.0))
        rows.append((i * 2 + 1, d1, i, "a", float(i)))
    out = _collect(q_cuped_adjust(_write_events(tmp_path, rows)))
    assert out.num_rows == 3
    assert all(math.isnan(v) for v in out.column("adjusted").to_pylist())


def test_segment_gini_overflow_magnitudes_vs_duckdb(ray_session, tmp_path):
    """2*s1 and n*s0 pass 2^63 at these magnitudes: the kernel must
    fold chunked partials into Python ints (and the oracle compute
    HUGEINT), not wrap int64."""
    import duckdb

    from patito_ray.pipelines.queries import SQL_SEGMENT_GINI, q_segment_gini

    n = 2000
    keys = np.arange(1, n + 1, dtype=np.int64)
    price = 4.5e10 + keys.astype(np.float64)  # ~4.5e12 cents each
    cust = pa.table(
        {"c_custkey": pa.array(keys), "c_mktsegment": pa.array(["A"] * n)}
    )
    orders = pa.table(
        {"o_custkey": pa.array(keys), "o_totalprice": pa.array(price, pa.float64())}
    )
    _write_table(tmp_path, "customer", cust)
    _write_table(tmp_path, "orders", orders)
    got = _collect(q_segment_gini(str(tmp_path))).to_pylist()
    con = duckdb.connect()
    for t in ("customer", "orders"):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{tmp_path}/{t}.parquet')"
        )
    expect = con.sql(SQL_SEGMENT_GINI).fetchall()
    assert len(got) == 1 and len(expect) == 1
    e = expect[0]
    g = got[0]
    assert (g["segment"], g["n"], g["s0"]) == (e[0], e[1], e[2])
    assert g["gini"] == e[3]
    assert 0.0 < g["gini"] < 1.0  # int64 wrap would go negative/garbage


def test_entropy_single_type_positive_zero_vs_duckdb(ray_session, tmp_path):
    """A single-event-type user: numpy's reduceat returns -0.0 where
    DuckDB SUM returns +0.0 — the engine must canonicalize (the driver
    hashes BITS)."""
    import duckdb
    import math

    from patito_ray.pipelines.queries import (
        SQL_USER_EVENT_ENTROPY,
        q_user_event_entropy,
    )

    d0 = datetime.datetime(2024, 3, 1)
    rows = [(i, d0 + datetime.timedelta(minutes=i), 1, "only", 1.0) for i in range(4)]
    sf = _write_events(tmp_path, rows)
    got = _collect(q_user_event_entropy(sf)).to_pylist()[0]
    assert got["entropy"] == 0.0
    assert math.copysign(1.0, got["entropy"]) == 1.0  # +0.0, not -0.0
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')")
    oracle = con.sql(SQL_USER_EVENT_ENTROPY).fetchall()[0]
    assert math.copysign(1.0, oracle[3]) == 1.0


def test_quarantine_split_write_roundtrip(ray_session, tmp_path):
    import pyarrow.parquet as pq2

    import ray.data as rd

    import patito_ray as pr
    from patito_ray.validation.violations import quarantine_split_write

    class M(pr.Model):
        k: int
        v: float = pr.Field(ge=0.0, le=10.0)

    t = pa.table(
        {
            "k": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "v": pa.array([1.0, 50.0, 2.0, None, 3.0, -1.0], pa.float64()),
        }
    )
    counts = quarantine_split_write(
        rd.from_arrow(t).repartition(3), M, f"{tmp_path}/valid", f"{tmp_path}/quar"
    )
    assert counts == {"valid": 3, "quarantined": 3}
    valid = pq2.read_table(f"{tmp_path}/valid")
    assert sorted(valid.column("k").to_pylist()) == [1, 3, 5]
    import glob

    quar = pa.concat_tables(
        [pq2.read_table(f) for f in glob.glob(f"{tmp_path}/quar/*.parquet")]
    )
    got = dict(
        zip(quar.column("k").to_pylist(), quar.column("violation_reasons").to_pylist())
    )
    assert set(got) == {2, 4, 6}
    assert got[2] == "v:value_error" or "v:" in got[2]      # out of bounds
    assert "missing_value" in got[4]                        # null, non-nullable
    # every quarantined row carries at least one reason tag
    assert all(r for r in got.values())

    # rerun into the SAME dirs: stale part files are wiped, counts
    # cover exactly this run (footer counts would otherwise double)
    counts2 = quarantine_split_write(
        rd.from_arrow(t).repartition(3), M, f"{tmp_path}/valid", f"{tmp_path}/quar"
    )
    assert counts2 == {"valid": 3, "quarantined": 3}

    # retry idempotence: quarantine part names are content digests, so
    # the same batch written twice lands on ONE file
    files_before = sorted(glob.glob(f"{tmp_path}/quar/*.parquet"))
    n_before = len(files_before)
    assert n_before >= 1
    counts3 = quarantine_split_write(
        rd.from_arrow(t).repartition(3), M, f"{tmp_path}/valid", f"{tmp_path}/quar"
    )
    assert counts3 == {"valid": 3, "quarantined": 3}
    assert sorted(glob.glob(f"{tmp_path}/quar/*.parquet")) == files_before


def test_source_overlap_planted(ray_session, tmp_path):
    from patito_ray.pipelines.queries import q_source_overlap

    # texts t1 shared by A,B,C; t2 by A,B (twice in B — distinct-text
    # semantics must count it once); t3 only in C
    docs = pa.table(
        {
            "source": pa.array(["A", "B", "C", "A", "B", "B", "C"]),
            "text": pa.array(["t1", "t1", "t1", "t2", "t2", "t2", "t3"]),
        }
    )
    pq.write_table(docs, f"{tmp_path}/documents.parquet")
    out = _collect(q_source_overlap(str(tmp_path)))
    got = {
        (r["s1"], r["s2"]): r["shared_texts"] for r in out.to_pylist()
    }
    assert got == {("A", "B"): 2, ("A", "C"): 1, ("B", "C"): 1}


def test_novelty_curve_reference(ray_session, tmp_path):
    from patito_ray.pipelines.queries import q_novelty_curve

    d0 = datetime.datetime(2024, 3, 1)
    rows = [
        (0, d0, 1, "a", 1.0),                                  # day0: (1,a) new
        (1, d0 + datetime.timedelta(hours=2), 1, "a", 1.0),    # repeat
        (2, d0 + datetime.timedelta(days=1), 1, "b", 1.0),     # day1: (1,b) new
        (3, d0 + datetime.timedelta(days=1), 2, "a", 1.0),     # day1: (2,a) new
        (4, d0 + datetime.timedelta(days=2), 2, "a", 1.0),     # repeat
    ]
    out = _collect(q_novelty_curve(_write_events(tmp_path, rows)))
    got = {r["day"].date().isoformat(): r["n_new"] for r in out.to_pylist()}
    assert got == {"2024-03-01": 1, "2024-03-02": 2}


def test_conversion_lag_reference(ray_session, tmp_path):
    from patito_ray.pipelines.queries import q_conversion_lag

    d0 = datetime.datetime(2024, 3, 1)
    rows = [
        (0, d0, 1, "view", 1.0),
        (1, d0 + datetime.timedelta(seconds=90), 1, "purchase", 5.0),
        (2, d0 + datetime.timedelta(seconds=5), 1, "view", 1.0),     # later view: ignored
        (3, d0, 2, "purchase", 5.0),                                  # purchase BEFORE view
        (4, d0 + datetime.timedelta(seconds=10), 2, "view", 1.0),
        (5, d0, 3, "view", 1.0),                                      # never purchases
        (6, d0, 4, "click", 1.0),                                     # neither endpoint
    ]
    out = _collect(q_conversion_lag(_write_events(tmp_path, rows)))
    got = {r["user_id"]: r["lag_us"] for r in out.to_pylist()}
    assert got == {1: 90_000_000, 2: -10_000_000}


def test_value_concentration_reference(ray_session, tmp_path):
    import math

    from patito_ray.pipelines.queries import q_value_concentration

    n = 200
    keys = np.arange(1, n + 1, dtype=np.int64)
    price = np.where(keys <= 2, 10_000.0, 10.0)  # two whales
    orders = pa.table(
        {"o_custkey": pa.array(keys), "o_totalprice": pa.array(price, pa.float64())}
    )
    pq.write_table(orders, f"{tmp_path}/orders.parquet")
    out = _collect(q_value_concentration(str(tmp_path))).to_pylist()[0]
    cents = sorted(np.where(keys <= 2, 1_000_000, 1_000).tolist())
    thr = cents[max(1, math.ceil(0.99 * n)) - 1]
    top = sum(c for c in cents if c >= thr)
    assert out["n_users"] == n and out["thr_cents"] == thr
    assert out["top_cents"] == top and out["total_cents"] == sum(cents)
    assert out["share"] == top / sum(cents)
