"""cumulative_distinct and freshness_audit vs pure-python references,
through BOTH merge paths (driver polars fastpath and the forced
distributed exchange via limit_bytes=0) on the sf0.001 test corpus."""

from __future__ import annotations

import collections

import pyarrow as pa

import pyarrow.parquet as pq
import pytest

from patito_ray.pipelines.queries import q_cumulative_distinct, q_freshness_audit

SF = "/root/testdata/sf0.001"


def _events():
    return pq.read_table(f"{SF}/events.parquet", columns=["user_id", "ts", "event_type"])


@pytest.mark.parametrize("limit_bytes", [None, 0])
def test_cumulative_distinct_reference(ray_session, limit_bytes):
    ev = _events()
    us = ev.column("ts").cast("int64").to_pylist()
    uid = ev.column("user_id").to_pylist()
    first = {}
    for u, t in zip(uid, us):
        d = t // 86_400_000_000
        if u not in first or d < first[u]:
            first[u] = d
    per_day = collections.Counter(first.values())
    days = sorted(per_day)
    cum, expect = 0, []
    for d in days:
        cum += per_day[d]
        expect.append((d, per_day[d], cum))

    out = q_cumulative_distinct(SF, limit_bytes=limit_bytes)
    got_days = [v // 86_400_000_000 for v in out.column("day").cast("int64").to_pylist()]
    got = list(
        zip(
            got_days,
            out.column("new_users").to_pylist(),
            out.column("cum_users").to_pylist(),
        )
    )
    assert got == expect
    # the curve must be monotone and end at the distinct-user total
    assert got[-1][2] == len(first)


@pytest.mark.parametrize("limit_bytes", [None, 0])
def test_freshness_audit_reference(ray_session, limit_bytes):
    ev = _events()
    us = ev.column("ts").cast("int64").to_pylist()
    typ = ev.column("event_type").to_pylist()
    last = {}
    for ty, t in zip(typ, us):
        if ty not in last or t > last[ty]:
            last[ty] = t
    gmax = max(last.values())
    expect = {
        ty: (t, (gmax - t) // 60_000_000, (gmax - t) // 60_000_000 > 30)
        for ty, t in last.items()
    }

    out = q_freshness_audit(SF, limit_bytes=limit_bytes)
    got = {
        ty: (t, lag, st)
        for ty, t, lag, st in zip(
            out.column("event_type").to_pylist(),
            out.column("last_ts").cast("int64").to_pylist(),
            out.column("lag_minutes").to_pylist(),
            out.column("stale").to_pylist(),
        )
    }
    assert got == expect
    # exactly one type sits at the global maximum (lag 0)
    assert sum(1 for _, lag, _ in got.values() if lag == 0) >= 1


@pytest.mark.parametrize("limit_bytes", [None, 0])
def test_volume_anomaly_reference(ray_session, limit_bytes):
    from patito_ray.pipelines.queries import q_volume_anomaly

    ev = _events()
    us = ev.column("ts").cast("int64").to_pylist()
    per_day = collections.Counter(t // 86_400_000_000 for t in us)
    days = sorted(per_day)
    cnt = [per_day[d] for d in days]
    n = len(cnt)
    rank = max(1, -(-n // 2))
    med = sorted(cnt)[rank - 1]
    ad = [abs(c - med) for c in cnt]
    mad = sorted(ad)[rank - 1]
    expect = [
        (d, c, med, mad, a > 3 * mad) for d, c, a in zip(days, cnt, ad)
    ]

    out = q_volume_anomaly(SF, limit_bytes=limit_bytes)
    got = list(
        zip(
            [v // 86_400_000_000 for v in out.column("day").cast("int64").to_pylist()],
            out.column("n_events").to_pylist(),
            out.column("med").to_pylist(),
            out.column("mad").to_pylist(),
            out.column("anomaly").to_pylist(),
        )
    )
    assert got == expect


def test_volume_anomaly_flags_constructed_spike(ray_session, tmp_path, monkeypatch):
    import pyarrow.parquet as pq_mod

    # 14 calm days of 100 events + one 10x spike day
    rows = []
    eid = 0
    for d in range(14):
        for _ in range(100):
            rows.append((eid, d * 86_400_000_000 + eid % 1000))
            eid += 1
    for _ in range(1000):
        rows.append((eid, 14 * 86_400_000_000 + eid % 1000))
        eid += 1
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        }
    )
    pq_mod.write_table(t, str(tmp_path / "events.parquet"))
    from patito_ray.pipelines.queries import q_volume_anomaly

    out = q_volume_anomaly(str(tmp_path))
    flags = dict(
        zip(
            [v // 86_400_000_000 for v in out.column("day").cast("int64").to_pylist()],
            out.column("anomaly").to_pylist(),
        )
    )
    assert flags[14] is True
    assert all(flags[d] is False for d in range(14))


@pytest.mark.parametrize("limit_bytes", [None, 0])
def test_mutual_info_reference(ray_session, limit_bytes):
    import numpy as np

    from patito_ray.pipelines.queries import q_mutual_info

    t = pq.read_table(f"{SF}/documents.parquet", columns=["lang", "source"])
    pairs = list(zip(t.column("lang").to_pylist(), t.column("source").to_pylist()))
    cnt = collections.Counter(pairs)
    nl = collections.Counter(l for l, _ in pairs)
    ns = collections.Counter(s for _, s in pairs)
    nt = len(pairs)
    mi = sum(
        (c / nt) * np.log2((c * nt) / (nl[lg] * ns[sc]))
        for (lg, sc), c in cnt.items()
    )

    out = q_mutual_info(SF, limit_bytes=limit_bytes)
    assert out.column("n_total")[0].as_py() == nt
    assert out.column("n_cells")[0].as_py() == len(cnt)
    assert abs(out.column("mutual_info")[0].as_py() - mi) < 2e-6
    # MI is non-negative and bounded by min marginal entropy
    hl = -sum((c / nt) * np.log2(c / nt) for c in nl.values())
    hs = -sum((c / nt) * np.log2(c / nt) for c in ns.values())
    assert -1e-9 <= out.column("mutual_info")[0].as_py() <= min(hl, hs) + 1e-9


@pytest.mark.parametrize("limit_bytes", [None, 0])
def test_seq_patterns_reference(ray_session, limit_bytes):
    from patito_ray.pipelines.queries import q_seq_patterns

    ev = pq.read_table(
        f"{SF}/events.parquet", columns=["user_id", "event_type", "ts"]
    )
    rows = list(
        zip(
            ev.column("user_id").to_pylist(),
            ev.column("event_type").to_pylist(),
            ev.column("ts").cast("int64").to_pylist(),
        )
    )
    # brute: per user, per ordered type pair, EXISTS e_a before e_b
    per_user: dict = {}
    for u, ty, t in rows:
        per_user.setdefault(u, []).append((ty, t))
    expect: collections.Counter = collections.Counter()
    types = sorted({ty for _, ty, _ in rows})
    for u, evs in per_user.items():
        for a in types:
            for b in types:
                if any(
                    ta < tb
                    for (tya, ta) in evs
                    if tya == a
                    for (tyb, tb) in evs
                    if tyb == b
                ):
                    expect[(a, b)] += 1

    out = q_seq_patterns(SF, limit_bytes=limit_bytes)
    got = {
        (a, b): u
        for a, b, u in zip(
            out.column("type_a").to_pylist(),
            out.column("type_b").to_pylist(),
            out.column("users").to_pylist(),
        )
    }
    assert got == {k: v for k, v in expect.items() if v > 0}


@pytest.mark.parametrize("limit_bytes", [None, 0])
def test_seq_patterns3_reference(ray_session, limit_bytes):
    import itertools

    from patito_ray.pipelines.queries import q_seq_patterns3

    ev = pq.read_table(
        f"{SF}/events.parquet", columns=["user_id", "event_type", "ts"]
    )
    rows = list(
        zip(
            ev.column("user_id").to_pylist(),
            ev.column("event_type").to_pylist(),
            ev.column("ts").cast("int64").to_pylist(),
        )
    )
    per_user: dict = {}
    for u, ty, t in rows:
        per_user.setdefault(u, []).append((ty, t))
    types = sorted({ty for _, ty, _ in rows})
    expect: collections.Counter = collections.Counter()
    for u, evs in per_user.items():
        evs.sort(key=lambda x: x[1])
        for a, b, c in itertools.product(types, repeat=3):
            # true sequential existence, brute per-row (not the
            # interval shortcut — independently validates it)
            ok = False
            for i, (tya, ta) in enumerate(evs):
                if tya != a:
                    continue
                for tyb, tb in evs:
                    if tyb != b or tb <= ta:
                        continue
                    if any(tyc == c and tc > tb for tyc, tc in evs):
                        ok = True
                        break
                if ok:
                    break
            if ok:
                expect[(a, b, c)] += 1

    out = q_seq_patterns3(SF, limit_bytes=limit_bytes)
    got = {
        (a, b, c): u
        for a, b, c, u in zip(
            out.column("type_a").to_pylist(),
            out.column("type_b").to_pylist(),
            out.column("type_c").to_pylist(),
            out.column("users").to_pylist(),
        )
    }
    assert got == {k: v for k, v in expect.items() if v > 0}


def test_containment_pairs_detects_superset(ray_session, tmp_path):
    """A doc that contains another plus boilerplate: the contained
    side's containment must be ~1 and strictly above the container's."""
    base = " ".join(f"tok{i}" for i in range(60))
    superset = base + " " + " ".join(f"extra{i}" for i in range(8))
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                [base, superset, "completely different words entirely here"],
                pa.string(),
            ),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    from patito_ray.pipelines.queries import q_containment_pairs

    out = q_containment_pairs(str(tmp_path))
    if not isinstance(out, pa.Table):
        out = pa.concat_tables(
            [b for b in out.iter_batches(batch_format="pyarrow") if b.num_rows]
        )
    rows = out.to_pylist()
    assert len(rows) == 1
    r = rows[0]
    assert {r["a"], r["b"]} == {1, 2}
    # doc 1 has 58 3-grams, all inside doc 2
    cont_small = r["cont_a"] if r["a"] == 1 else r["cont_b"]
    cont_big = r["cont_b"] if r["a"] == 1 else r["cont_a"]
    assert cont_small == 1.0
    assert cont_big < 1.0
    assert r["inter"] == min(r["size_a"], r["size_b"])


@pytest.mark.parametrize("limit_bytes", [None, 0])
def test_theil_index_reference(ray_session, limit_bytes):
    import numpy as np

    from patito_ray.pipelines.queries import q_theil_index

    t = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    totals = collections.Counter()
    for k, p in zip(
        t.column("o_custkey").to_pylist(), t.column("o_totalprice").to_pylist()
    ):
        totals[k] += int(np.floor(p * 100.0 + 0.5))
    x = np.array(sorted(totals.values()), dtype=np.float64)
    n, X = len(x), x.sum()
    ref = float(np.sum((x / X) * np.log(x / (X / n))))

    out = q_theil_index(SF, limit_bytes=limit_bytes).to_pylist()[0]
    assert out["n"] == n and out["x"] == int(X)
    assert abs(out["theil"] - ref) < 2e-6
    # Theil T is bounded by [0, ln n]
    assert -1e-9 <= out["theil"] <= np.log(n) + 1e-9
