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
