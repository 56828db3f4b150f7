"""grouped_quantiles / distinct_per_group vs pure references under
arbitrary inputs and partitioning."""

from __future__ import annotations

import math

import numpy as np
import polars as pl
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from patito_ray.stages.agg import distinct_per_group
from patito_ray.stages.quantiles import grouped_quantiles

QS = {"p25": 0.25, "p50": 0.50, "p90": 0.90, "p100": 1.0}


def _collect(ds) -> pa.Table:
    import ray

    if isinstance(ds, pa.Table):
        return ds
    tabs = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    return pa.concat_tables(tabs) if tabs else None


def _quantile_reference(keys, vals) -> dict[int, dict[str, float]]:
    """Selection quantile: element at 1-based rank max(1, ceil(q*n))
    over each key's sorted non-null values."""
    groups: dict[int, list[float]] = {}
    for k, v in zip(keys, vals):
        if v is not None:
            groups.setdefault(k, []).append(v)
    out = {}
    for k, vs in groups.items():
        vs.sort()
        n = len(vs)
        row = {"n": n}
        for name, q in QS.items():
            row[name] = vs[max(1, math.ceil(q * n)) - 1]
        out[k] = row
    return out


@settings(max_examples=15, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 5),
            st.one_of(st.none(), st.integers(-1000, 1000)),
        ),
        min_size=1,
        max_size=60,
    ),
    num_parts=st.integers(1, 7),
    n_blocks=st.integers(1, 4),
    force_distributed=st.booleans(),
)
def test_grouped_quantiles_matches_reference(
    ray_session, rows, num_parts, n_blocks, force_distributed
):
    import ray.data as rd

    keys = [r[0] for r in rows]
    vals = [None if r[1] is None else float(r[1]) for r in rows]
    tab = pa.table(
        {"k": pa.array(keys, pa.int64()), "v": pa.array(vals, pa.float64())}
    )
    ds = rd.from_arrow(tab).repartition(min(n_blocks, len(rows)))
    got = _collect(
        grouped_quantiles(
            ds,
            "k",
            "v",
            QS,
            num_partitions=num_parts,
            limit_bytes=0 if force_distributed else 2**28,
        )
    )
    ref = _quantile_reference(keys, vals)
    if got is None:
        assert ref == {}
        return
    gd = pl.from_arrow(got).sort("k").to_dicts()
    assert sorted(ref) == [r["k"] for r in gd]
    for row in gd:
        exp = ref[row["k"]]
        assert row["n"] == exp["n"]
        for name in QS:
            assert row[name] == exp[name], (row, exp)


def test_grouped_quantiles_null_key_rejected(ray_session):
    import ray.data as rd

    tab = pa.table({"k": pa.array([1, None], pa.int64()), "v": [1.0, 2.0]})
    with pytest.raises(Exception, match="null key"):
        _collect(grouped_quantiles(rd.from_arrow(tab), "k", "v", QS))


def test_grouped_quantiles_bad_q_rejected(ray_session):
    import ray.data as rd

    tab = pa.table({"k": [1], "v": [1.0]})
    with pytest.raises(ValueError, match="not in"):
        grouped_quantiles(rd.from_arrow(tab), "k", "v", {"bad": 0.0})
    with pytest.raises(ValueError, match="not in"):
        grouped_quantiles(rd.from_arrow(tab), "k", "v", {"bad": 1.5})


def test_grouped_quantiles_all_null_group_dropped(ray_session):
    import ray.data as rd

    tab = pa.table(
        {
            "k": pa.array([1, 1, 2], pa.int64()),
            "v": pa.array([None, None, 3.0], pa.float64()),
        }
    )
    got = _collect(grouped_quantiles(rd.from_arrow(tab), "k", "v", {"p50": 0.5}))
    rows = pl.from_arrow(got).to_dicts()
    assert rows == [{"k": 2, "n": 1, "p50": 3.0}]


@settings(max_examples=15, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.one_of(st.none(), st.integers(0, 20)),
        ),
        min_size=1,
        max_size=80,
    ),
    num_parts=st.integers(1, 7),
    n_blocks=st.integers(1, 4),
)
def test_distinct_per_group_matches_reference(ray_session, rows, num_parts, n_blocks):
    import ray.data as rd

    tab = pa.table(
        {
            "k": pa.array([r[0] for r in rows], pa.string()),
            "v": pa.array(
                [r[1] for r in rows], pa.int64()
            ),
        }
    )
    ds = rd.from_arrow(tab).repartition(min(n_blocks, len(rows)))
    got = _collect(distinct_per_group(ds, "k", "v", num_partitions=num_parts))
    ref: dict[str, set] = {}
    for k, v in rows:
        if v is not None:
            ref.setdefault(k, set()).add(v)
    if got is None:
        assert ref == {}
        return
    gd = {r["k"]: r["n_distinct"] for r in pl.from_arrow(got).to_dicts()}
    assert gd == {k: len(vs) for k, vs in ref.items()}


def test_distinct_per_group_null_keys_group_like_sql(ray_session):
    import ray.data as rd

    tab = pa.table(
        {
            "k": pa.array(["a", None, None, "a"], pa.string()),
            "v": pa.array([1, 2, 3, 1], pa.int64()),
        }
    )
    got = _collect(distinct_per_group(rd.from_arrow(tab), "k", "v"))
    gd = {r["k"]: r["n_distinct"] for r in pl.from_arrow(got).to_dicts()}
    assert gd == {"a": 1, None: 2}


def test_distinct_per_group_distributed_merge_path(ray_session):
    import ray.data as rd

    tab = pa.table(
        {
            "k": pa.array(["a", "b"] * 50, pa.string()),
            "v": pa.array(list(range(100)), pa.int64()),
        }
    )
    got = _collect(
        distinct_per_group(
            rd.from_arrow(tab).repartition(4), "k", "v", limit_bytes=0
        )
    )
    gd = {r["k"]: r["n_distinct"] for r in pl.from_arrow(got).to_dicts()}
    assert gd == {"a": 50, "b": 50}


@settings(max_examples=15, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.one_of(st.none(), st.integers(0, 8)),
        ),
        min_size=1,
        max_size=80,
    ),
    n_blocks=st.integers(1, 4),
    force_distributed=st.booleans(),
)
def test_mode_per_group_matches_reference(ray_session, rows, n_blocks, force_distributed):
    import ray.data as rd

    from patito_ray.stages.agg import mode_per_group

    tab = pa.table(
        {
            "k": pa.array([r[0] for r in rows], pa.string()),
            "v": pa.array([r[1] for r in rows], pa.int64()),
        }
    )
    ds = rd.from_arrow(tab).repartition(min(n_blocks, len(rows)))
    got = _collect(
        mode_per_group(ds, "k", "v", limit_bytes=0 if force_distributed else 2**28)
    )
    counts: dict[str, dict[int, int]] = {}
    for k, v in rows:
        if v is not None:
            counts.setdefault(k, {}).setdefault(v, 0)
            counts[k][v] += 1
    ref = {
        k: min(cs, key=lambda v: (-cs[v], v))
        for k, cs in counts.items()
    }
    if got is None:
        assert ref == {}
        return
    gd = {r["k"]: (r["mode_value"], r["mode_count"]) for r in pl.from_arrow(got).to_dicts()}
    assert set(gd) == set(ref)
    for k, v in ref.items():
        assert gd[k] == (v, counts[k][v]), (k, gd[k], v)


def test_global_quantiles_exact_vs_reference(ray_session):
    """Exact selection quantiles from the band algorithm — including
    q at both extremes, where the digest's centroid means sit inside
    the true min/max and the band must open to infinity."""
    import ray.data as rd

    from patito_ray.stages.quantiles import global_quantiles

    rng = np.random.default_rng(5)
    vals = rng.lognormal(0, 2, size=30_000)
    tab = pa.table({"v": pa.array(vals, pa.float64())})
    qs = {"p001": 0.0001, "p50": 0.5, "p99": 0.99, "p100": 1.0}
    got = global_quantiles(rd.from_arrow(tab).repartition(7), "v", qs, delta=100)
    s = np.sort(vals)
    row = got.to_pylist()[0]
    assert row["n"] == len(vals)
    for name, q in qs.items():
        exp = s[max(1, math.ceil(q * len(vals))) - 1]
        assert row[name] == exp, (name, row[name], exp)


def test_global_quantiles_empty_and_nan(ray_session):
    import ray.data as rd

    from patito_ray.stages.quantiles import global_quantiles

    empty = pa.table({"v": pa.array([], pa.float64())})
    row = global_quantiles(rd.from_arrow(empty), "v", {"p50": 0.5}).to_pylist()[0]
    assert row == {"n": 0, "p50": None}
    nan_tab = pa.table({"v": pa.array([float("nan"), 2.0, 1.0], pa.float64())})
    row = global_quantiles(rd.from_arrow(nan_tab), "v", {"p50": 0.5}).to_pylist()[0]
    assert row == {"n": 2, "p50": 1.0}


def test_global_quantiles_band_limit_raises(ray_session):
    import ray.data as rd

    from patito_ray.stages.quantiles import global_quantiles

    tab = pa.table({"v": pa.array(np.arange(1000, dtype=np.float64))})
    with pytest.raises(ValueError, match="band_limit"):
        global_quantiles(rd.from_arrow(tab), "v", {"p50": 0.5}, band_limit=1)


def test_grouped_mad_nulls_and_exactness(ray_session):
    """grouped_mad: null values drop, med/mad are selection statistics
    (bit-exact, no interpolation)."""
    import ray.data as rd

    from patito_ray.stages.quantiles import grouped_mad

    t = pa.table(
        {
            "k": pa.array([1, 1, 1, 1, 2, 2, 2], type=pa.int64()),
            "v": pa.array([1.0, 5.0, 100.0, None, 7.0, 7.0, 9.0], type=pa.float64()),
        }
    )
    for limit in (2**28, 0):  # driver path AND forced-distributed path
        out = grouped_mad(
            rd.from_arrow(t).repartition(3), by="k", value="v", limit_bytes=limit
        )
        rows = {r["k"]: r for r in out.take_all()}
        # k=1: [1,5,100] -> med = rank ceil(1.5)=2 -> 5; |x-5| = [4,0,95] -> mad 4
        assert rows[1]["n"] == 3 and rows[1]["med"] == 5.0 and rows[1]["mad"] == 4.0
        # k=2: [7,7,9] -> med 7; |x-7| = [0,0,2] -> mad 0
        assert rows[2]["n"] == 3 and rows[2]["med"] == 7.0 and rows[2]["mad"] == 0.0


def test_grouped_weighted_median_brute_both_branches(ray_session):
    import ray.data as rd

    from patito_ray.stages.quantiles import grouped_weighted_median

    rng = np.random.default_rng(13)
    n = 400
    k = rng.integers(0, 8, n)
    v = rng.integers(0, 50, n).astype(np.float64)  # ties on purpose
    w = rng.integers(0, 5, n).astype(np.float64)  # includes zero weights

    def brute():
        out = {}
        for kk in np.unique(k):
            m = k == kk
            order = np.argsort(v[m], kind="stable")
            vv, ww = v[m][order], w[m][order]
            cum = np.cumsum(ww)
            tot = ww.sum()
            out[int(kk)] = float(vv[np.flatnonzero(2 * cum >= tot)[0]])
        return out

    t = pa.table(
        {
            "k": pa.array(k, pa.int64()),
            "v": pa.array(v, pa.float64()),
            "w": pa.array(w, pa.float64()),
        }
    )
    ds = rd.from_arrow(t).repartition(4)
    ref = brute()
    for lb in (None, 0):
        kw = {} if lb is None else {"limit_bytes": 0}
        res = grouped_weighted_median(ds, "k", "v", "w", **kw)
        if not isinstance(res, pa.Table):
            rows = res.take_all()
            got = {r["k"]: r["wmedian"] for r in rows}
        else:
            got = dict(
                zip(res.column("k").to_pylist(), res.column("wmedian").to_pylist())
            )
        assert got == ref, f"limit_bytes={lb}"

    bad = pa.table(
        {
            "k": pa.array([1], pa.int64()),
            "v": pa.array([1.0]),
            "w": pa.array([-2.0]),
        }
    )
    with pytest.raises(Exception, match="non-negative"):
        r = grouped_weighted_median(rd.from_arrow(bad), "k", "v", "w")
        if not isinstance(r, pa.Table):
            r.take_all()
