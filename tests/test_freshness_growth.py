"""cumulative_distinct and freshness_audit vs pure-python references,
through BOTH merge paths (driver polars fastpath and the forced
distributed exchange via limit_bytes=0) on the sf0.001 test corpus."""

from __future__ import annotations

import collections

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
