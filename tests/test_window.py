"""window_over vs a single-machine polars reference under arbitrary
inputs and partitioning."""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from patito_ray.stages.window import window_over

COLS = {
    "cs": ("cum_sum", "v"),
    "cmax": ("cum_max", "v"),
    "cmin": ("cum_min", "v"),
    "rn": ("row_number", None),
    "rk": ("rank_min", "v"),
    "lag1": ("lag", "v"),
    "lead1": ("lead", "v"),
    "cnt": ("count", None),
    "roll3": ("rolling_sum", "v"),
}


def _reference(tab: pa.Table) -> pl.DataFrame:
    df = pl.from_arrow(tab).sort(["k", "o"], maintain_order=True)
    return df.with_columns(
        [
            pl.col("v").cum_sum().over("k").alias("cs"),
            pl.col("v").cum_max().over("k").alias("cmax"),
            pl.col("v").cum_min().over("k").alias("cmin"),
            pl.int_range(1, pl.len() + 1, dtype=pl.Int64).over("k").alias("rn"),
            pl.col("v").rank("min").over("k").cast(pl.Int64).alias("rk"),
            pl.col("v").shift(1).over("k").alias("lag1"),
            pl.col("v").shift(-1).over("k").alias("lead1"),
            pl.len().cast(pl.Int64).over("k").alias("cnt"),
            pl.col("v").rolling_sum(3, min_samples=1).over("k").alias("roll3"),
        ]
    ).sort(["k", "o"])


@settings(max_examples=15, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 5),                      # key
            st.integers(-1000, 1000),               # value
        ),
        min_size=0,
        max_size=60,
    ),
    num_parts=st.integers(1, 7),
    seed=st.integers(0, 2**32 - 1),
)
def test_window_over_matches_polars(ray_session, rows, num_parts, seed):
    import ray.data as rd

    n = len(rows)
    rng = np.random.default_rng(seed)
    order = rng.permutation(n).astype(np.int64)  # unique order col
    tab = pa.table(
        {
            "k": pa.array([r[0] for r in rows], pa.int64()),
            "o": pa.array(order, pa.int64()),
            "v": pa.array([float(r[1]) for r in rows], pa.float64()),
        }
    )
    if n == 0:
        return
    ds = rd.from_arrow(tab).repartition(min(3, max(1, n)))
    got = window_over(
        ds, by="k", order=["o"], cols=COLS, num_partitions=num_parts, frame=3
    )
    got_tabs = [t for t in got.to_arrow_refs()]
    import ray

    tabs = [t for t in ray.get(got_tabs) if t.num_rows]
    got_df = (
        pl.from_arrow(pa.concat_tables([t.select(["k", "o", "v", *COLS]) for t in tabs]))
        .sort(["k", "o"])
    )
    ref = _reference(tab)
    assert got_df.equals(ref.select(got_df.columns))


def test_window_null_key_rejected(ray_session):
    import ray.data as rd

    tab = pa.table({"k": pa.array([1, None], pa.int64()), "o": [1, 2], "v": [1.0, 2.0]})
    ds = rd.from_arrow(tab)
    with pytest.raises(Exception, match="null key"):
        window_over(ds, "k", ["o"], {"cs": ("cum_sum", "v")}).materialize()


def test_window_unknown_op_rejected(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({"k": [1], "o": [1], "v": [1.0]}))
    with pytest.raises(ValueError, match="window op"):
        window_over(ds, "k", ["o"], {"x": ("median", "v")})


def test_rank_min_ascending_even_with_descending_order(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(
        pa.table({"k": [1, 1, 1], "t": [3, 2, 1], "v": [10, 30, 20]})
    )
    out = window_over(
        ds, by="k", order=["t"], cols={"rk": ("rank_min", "v")}, descending=True
    ).take_all()
    ranks = {r["v"]: r["rk"] for r in out}
    # rank_min ranks by v ASCENDING per the docstring contract,
    # regardless of the frame-ordering flag
    assert ranks == {10: 1, 20: 2, 30: 3}


@settings(max_examples=20, deadline=None)
@given(
    n=st.integers(0, 40),
    k=st.integers(1, 9),
    n_keys=st.integers(1, 4),
)
def test_ntile_matches_python_reference(ray_session, n, k, n_keys):
    """NTILE(k) per key vs the definitional Python loop: first n%k
    buckets get n//k+1 rows, the rest n//k."""
    import ray.data as rd

    if n == 0:
        return
    rng = np.random.default_rng(n * 100 + k)
    keys = rng.integers(0, n_keys, n).astype(np.int64)
    tab = pa.table(
        {
            "k": pa.array(keys),
            "o": pa.array(np.arange(n, dtype=np.int64)),
        }
    )
    out = window_over(
        rd.from_arrow(tab).repartition(min(3, n)),
        by="k",
        order=["o"],
        cols={"b": ("ntile", None)},
        ntile=k,
        num_partitions=3,
    ).take_all()
    got = {(r["k"], r["o"]): r["b"] for r in out}

    def ntile_ref(cnt: int) -> list[int]:
        big, small = divmod(cnt, k)[1], 0  # noqa: F841
        nbig = cnt % k
        size_big, size_small = cnt // k + 1, cnt // k
        buckets = []
        for b in range(1, k + 1):
            size = size_big if b <= nbig else size_small
            buckets.extend([b] * size)
        return buckets

    for key in set(keys.tolist()):
        orders = sorted(o for kk, o in zip(keys.tolist(), range(n)) if kk == key)
        ref = ntile_ref(len(orders))
        for o, b in zip(orders, ref):
            assert got[(key, o)] == b, (key, o)


def test_scd2_compact_reference(ray_session):
    """Change-log collapse vs a pure-python reference: consecutive-dup
    runs collapse, null attrs compare IS-DISTINCT-FROM-style, the first
    row always survives, effective_to chains to the next survivor."""
    import pyarrow as pa
    import ray.data as rd

    from patito_ray.stages.window import scd2_compact

    rows = [
        # key, seq, attr
        (1, 1, "a"), (1, 2, "a"), (1, 3, "b"), (1, 4, "b"), (1, 5, "a"),
        (2, 1, None), (2, 2, None), (2, 3, "x"), (2, 4, None),
        (3, 7, "only"),
    ]
    t = pa.table(
        {
            "k": pa.array([r[0] for r in rows], pa.int64()),
            "seq": pa.array([r[1] for r in rows], pa.int64()),
            "attr": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    out = scd2_compact(
        rd.from_arrow(t).repartition(3), by="k", order=["seq"], attrs=["attr"]
    )
    got = sorted(
        (r["k"], r["seq"], r["attr"], r["effective_from"], r["effective_to"])
        for r in out.take_all()
    )

    expect = []
    by_key: dict[int, list] = {}
    for k, seq, attr in sorted(rows):
        by_key.setdefault(k, []).append((seq, attr))
    for k, items in by_key.items():
        surv = [items[0]]
        for seq, attr in items[1:]:
            if attr != surv[-1][1]:
                surv.append((seq, attr))
        for i, (seq, attr) in enumerate(surv):
            nxt = surv[i + 1][0] if i + 1 < len(surv) else None
            expect.append((k, seq, attr, seq, nxt))
    assert got == sorted(expect)

    import pytest

    with pytest.raises(ValueError, match="attrs"):
        scd2_compact(rd.from_arrow(t), by="k", order=["seq"], attrs=[])


def test_scd2_compact_empty_order_raises(ray_session):
    """An empty order list must raise a clear ValueError (the docstring
    requires a per-key total order), not a bare IndexError."""
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from patito_ray.stages.window import scd2_compact

    ds = rd.from_arrow(pa.table({"k": [1], "ts": [1], "a": ["x"]}))
    with pytest.raises(ValueError, match="order must be non-empty"):
        scd2_compact(ds, by="k", order=[], attrs=["a"])


def test_interval_coverage_random_reference(ray_session):
    import ray.data as rd

    from patito_ray.stages.window import interval_coverage

    rng = np.random.default_rng(17)
    n = 500
    key = rng.integers(0, 12, size=n)
    s = rng.integers(0, 1000, size=n)
    ln = rng.integers(-50, 200, size=n)  # includes negative/zero lengths
    e = s + ln

    # brute reference: per key, mark covered integer points
    ref = {}
    for k in np.unique(key):
        mask = key == k
        covered = set()
        for a, b in zip(s[mask], e[mask]):
            covered.update(range(int(a), int(b)))
        ref[int(k)] = len(covered)

    ds = rd.from_arrow(
        pa.table(
            {
                "k": pa.array(key, pa.int64()),
                "s": pa.array(s, pa.int64()),
                "e": pa.array(e, pa.int64()),
            }
        )
    ).repartition(6)
    out = interval_coverage(ds, "k", "s", "e", num_partitions=4)
    got = {r["k"]: r["covered"] for r in out.take_all()}
    assert got == ref


def test_interval_coverage_nested_and_touching(ray_session):
    import ray.data as rd

    from patito_ray.stages.window import interval_coverage

    # nested [0,100] ⊃ [10,20]; touching [100,150]; disjoint [200,210]
    t = pa.table(
        {
            "k": pa.array([1, 1, 1, 1], pa.int64()),
            "s": pa.array([0, 10, 100, 200], pa.int64()),
            "e": pa.array([100, 20, 150, 210], pa.int64()),
        }
    )
    out = interval_coverage(
        rd.from_arrow(t).repartition(2), "k", "s", "e", num_partitions=2
    )
    assert {r["k"]: r["covered"] for r in out.take_all()} == {1: 160}


def test_rolling_median_matches_brute(ray_session):
    import ray.data as rd

    from patito_ray.stages.window import rolling_median_over

    rng = np.random.default_rng(8)
    n = 400
    k = rng.integers(0, 9, n)
    v = rng.uniform(0, 100, n)
    o = np.arange(n)
    ref = {}
    for kk in np.unique(k):
        idx = np.flatnonzero(k == kk)
        for j, i in enumerate(idx):
            ref[int(i)] = float(np.median(v[idx[max(0, j - 4) : j + 1]]))
    ds = rd.from_arrow(
        pa.table(
            {
                "k": pa.array(k, pa.int64()),
                "o": pa.array(o, pa.int64()),
                "v": pa.array(v, pa.float64()),
            }
        )
    ).repartition(5)
    out = rolling_median_over(
        ds, by="k", order=["o"], src="v", frame=5, num_partitions=4
    ).take_all()
    got = {r["o"]: r["roll_med"] for r in out}
    assert got == ref


def test_rolling_median_frame_one_and_errors(ray_session):
    import ray.data as rd

    from patito_ray.stages.window import rolling_median_over

    t = pa.table(
        {
            "k": pa.array([1, 1, 2], pa.int64()),
            "o": pa.array([1, 2, 1], pa.int64()),
            "v": pa.array([5.0, 7.0, 9.0]),
        }
    )
    ds = rd.from_arrow(t)
    out = rolling_median_over(
        ds, by="k", order=["o"], src="v", frame=1, num_partitions=2
    ).take_all()
    assert {r["o"]: r["roll_med"] for r in out if r["k"] == 1} == {1: 5.0, 2: 7.0}
    with pytest.raises(ValueError, match="frame"):
        rolling_median_over(ds, by="k", order=["o"], src="v", frame=0)


def test_rolling_active_count_brute_and_gaps(ray_session):
    import ray.data as rd

    from patito_ray.stages.window import rolling_active_count

    rng = np.random.default_rng(21)
    n = 300
    user = rng.integers(0, 25, n)
    # sparse days with gaps wider than the window -> zero-active days
    day = rng.choice(np.array([0, 1, 2, 20, 21, 40, 90]), size=n) + 100
    ds = rd.from_arrow(
        pa.table(
            {"u": pa.array(user, pa.int64()), "d": pa.array(day, pa.int64())}
        )
    ).repartition(4)

    def brute(window):
        lo, hi = int(day.min()), int(day.max())
        out = {}
        for dd in range(lo, hi + 1):
            out[dd] = len(
                {int(u) for u, a in zip(user, day) if dd - window < a <= dd}
            )
        return out

    for window in (1, 7):
        got_t = rolling_active_count(ds, "u", "d", window=window)
        got = dict(
            zip(
                got_t.column("day").to_pylist(),
                got_t.column("active").to_pylist(),
            )
        )
        assert got == brute(window), f"window={window}"
        # forced-distributed delta merge
        got_d = rolling_active_count(ds, "u", "d", window=window, limit_bytes=0)
        assert (
            dict(
                zip(
                    got_d.column("day").to_pylist(),
                    got_d.column("active").to_pylist(),
                )
            )
            == got
        )

    with pytest.raises(ValueError, match="window"):
        rolling_active_count(ds, "u", "d", window=0)


def test_window_over_composite_by(ray_session):
    import ray.data as rd

    from patito_ray.stages.window import window_over

    # lag must respect the FULL composite (u, g), not just the hashed u
    t = pa.table(
        {
            "u": pa.array([1, 1, 1, 2], pa.int64()),
            "g": pa.array(["a", "b", "a", "a"]),
            "o": pa.array([1, 2, 3, 4], pa.int64()),
            "v": pa.array([10.0, 20.0, 30.0, 40.0]),
        }
    )
    out = window_over(
        rd.from_arrow(t).repartition(2),
        by=["u", "g"],
        order=["o"],
        cols={"pv": ("lag", "v"), "rn": ("row_number", None)},
        num_partitions=3,
    ).take_all()
    got = {r["o"]: (r["pv"], r["rn"]) for r in out}
    assert got == {1: (None, 1), 2: (None, 1), 3: (10.0, 2), 4: (None, 1)}
    with pytest.raises(ValueError, match="at least one column"):
        window_over(rd.from_arrow(t), by=[], order=["o"], cols={"rn": ("row_number", None)})
