"""funnel_steps vs a pure-Python ordered-chain reference under
arbitrary inputs and partitioning."""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from patito_ray.functions.funnel import funnel_steps

STEPS = ["a", "b", "c"]


def _reference(rows):
    """rows: (user, ts, type). First-completion chain with strict >."""
    out = {}
    by_user: dict[int, list[tuple[int, str]]] = {}
    for u, t, ty in rows:
        by_user.setdefault(u, []).append((t, ty))
    for u, evs in by_user.items():
        chain = []
        prev = None
        for step in STEPS:
            cand = [
                t
                for t, ty in evs
                if ty == step and (prev is None or t > prev)
            ]
            if not cand:
                break
            prev = min(cand)
            chain.append(prev)
        if chain:
            padded = chain + [None] * (len(STEPS) - len(chain))
            out[u] = (padded, len(chain))
    return out


@settings(max_examples=15, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 5),
            st.integers(0, 30),
            st.sampled_from(STEPS + ["x"]),  # 'x' = non-funnel noise
        ),
        min_size=1,
        max_size=80,
    ),
    num_parts=st.integers(1, 7),
    n_blocks=st.integers(1, 4),
)
def test_funnel_matches_reference(ray_session, rows, num_parts, n_blocks):
    import ray

    import ray.data as rd

    tab = pa.table(
        {
            "u": pa.array([r[0] for r in rows], pa.int64()),
            "t": pa.array([r[1] for r in rows], pa.int64()),
            "ty": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    ds = rd.from_arrow(tab).repartition(min(n_blocks, len(rows)))
    got = funnel_steps(ds, "u", "t", "ty", STEPS, num_partitions=num_parts)
    tabs = [t for t in ray.get(got.to_arrow_refs()) if t.num_rows]
    ref = _reference(rows)
    if not tabs:
        assert ref == {}
        return
    gd = pl.from_arrow(pa.concat_tables(tabs)).sort("u").to_dicts()
    assert sorted(ref) == [r["u"] for r in gd]
    for row in gd:
        padded, depth = ref[row["u"]]
        assert row["depth"] == depth
        assert [row["ts_1"], row["ts_2"], row["ts_3"]] == padded, (row, padded)


def test_funnel_validates_steps(ray_session):
    import ray.data as rd

    tab = pa.table({"u": [1], "t": [1], "ty": ["a"]})
    ds = rd.from_arrow(tab)
    with pytest.raises(ValueError, match="at least two"):
        funnel_steps(ds, "u", "t", "ty", ["a"])
    with pytest.raises(ValueError, match="distinct"):
        funnel_steps(ds, "u", "t", "ty", ["a", "a"])


def _retention_reference(rows):
    """rows: (user, day:int). Distinct pairs -> cohort/offset counts."""
    pairs = {(u, d) for u, d in rows}
    firsts = {}
    for u, d in pairs:
        firsts[u] = min(firsts.get(u, d), d)
    out: dict[tuple[int, int], int] = {}
    for u, d in pairs:
        key = (firsts[u], d - firsts[u])
        out[key] = out.get(key, 0) + 1
    return out


@settings(max_examples=15, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 20)),
        min_size=1,
        max_size=80,
    ),
    num_parts=st.integers(1, 7),
    n_blocks=st.integers(1, 4),
)
def test_cohort_retention_matches_reference(ray_session, rows, num_parts, n_blocks):
    import datetime

    import pyarrow as pa
    import ray
    import ray.data as rd

    from patito_ray.functions.retention import cohort_retention

    epoch = datetime.datetime(2024, 1, 1)
    tab = pa.table(
        {
            "u": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [epoch + datetime.timedelta(days=r[1], hours=r[0] % 24) for r in rows],
                pa.timestamp("us"),
            ),
        }
    )
    ds = rd.from_arrow(tab).repartition(min(n_blocks, len(rows)))
    got = cohort_retention(ds, "u", "ts", num_partitions=num_parts)
    if not isinstance(got, pa.Table):
        tabs = [t for t in ray.get(got.to_arrow_refs()) if t.num_rows]
        got = pa.concat_tables(tabs) if tabs else None
    ref = _retention_reference([(r[0], r[1]) for r in rows])
    assert got is not None
    gd = {
        (
            (r["cohort_date"] - epoch.date()).days,
            r["day_offset"],
        ): r["n_users"]
        for r in pl.from_arrow(got).to_dicts()
    }
    assert gd == ref


def test_cohort_retention_distributed_merge_path(ray_session):
    """Force the distributed merge branch: Ray's groupby must handle the
    date32 cohort key (the driver polars path is the usual route)."""
    import datetime

    import pyarrow as pa
    import ray.data as rd

    from patito_ray.functions.retention import cohort_retention

    epoch = datetime.datetime(2024, 1, 1)
    rows = [(u, d) for u in range(6) for d in range(0, 10, 1 + u % 3)]
    tab = pa.table(
        {
            "u": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [epoch + datetime.timedelta(days=r[1]) for r in rows],
                pa.timestamp("us"),
            ),
        }
    )
    got = cohort_retention(
        rd.from_arrow(tab).repartition(3), "u", "ts", limit_bytes=0
    )
    assert not isinstance(got, pa.Table)  # distributed branch returns a Dataset
    import ray

    tabs = [t for t in ray.get(got.to_arrow_refs()) if t.num_rows]
    gd = {
        ((r["cohort_date"] - epoch.date()).days, r["day_offset"]): r["n_users"]
        for r in pl.from_arrow(pa.concat_tables(tabs)).to_dicts()
    }
    assert gd == _retention_reference(rows)
