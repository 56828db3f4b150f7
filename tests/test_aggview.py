import numpy as np
import polars as pl
import pyarrow as pa
import pytest

from patito_ray.stages.aggview import (
    create_agg_view,
    read_agg_view,
    refresh_agg_view,
)


def _facts(n, seed):
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "k": pa.array(rng.integers(0, 40, n), pa.int64()),
            "grp": pa.array([f"g{v}" for v in rng.integers(0, 3, n)]),
            "cents": pa.array(rng.integers(-100, 10_000, n), pa.int64()),
        }
    )


def _state(out):
    t = pa.concat_tables(
        [b for b in read_agg_view(out).iter_batches(batch_format="pyarrow")]
    )
    return {
        (r["k"], r["grp"]): (r["cents"], r["n"])
        for r in t.to_pylist()
    }


def _expect(tabs):
    df = (
        pl.from_arrow(pa.concat_tables(tabs))
        .with_columns(pl.lit(1, dtype=pl.Int64).alias("n"))
        .group_by(["k", "grp"])
        .agg(pl.col("cents").sum(), pl.col("n").sum())
    )
    return {(r["k"], r["grp"]): (r["cents"], r["n"]) for r in df.to_dicts()}


def test_agg_view_incremental_exact(ray_session, tmp_path):
    import ray.data as rd

    out = str(tmp_path / "view")
    base = _facts(5000, 1)

    def with_n(t):
        return t.append_column("n", pa.array(np.ones(t.num_rows, np.int64)))

    res = create_agg_view(
        rd.from_arrow(with_n(base)).repartition(4),
        ["k", "grp"],
        ["cents", "n"],
        out,
        num_partitions=16,
    )
    assert res["groups"] == len(_expect([base]))
    assert _state(out) == _expect([base])

    d1 = _facts(700, 2)
    r1 = refresh_agg_view(out, rd.from_arrow(with_n(d1)).repartition(3))
    assert r1["groups_updated"] == len(_expect([d1]))
    assert _state(out) == _expect([base, d1])

    # second refresh with brand-new keys (inserts)
    d2 = pa.table(
        {
            "k": pa.array([1000, 1001], pa.int64()),
            "grp": pa.array(["g9", "g9"]),
            "cents": pa.array([5, 7], pa.int64()),
            "n": pa.array([1, 1], pa.int64()),
        }
    )
    refresh_agg_view(out, rd.from_arrow(d2))
    assert _state(out) == _expect([base, d2.drop_columns(["n"]), d1])


def test_agg_view_touches_few_partitions(ray_session, tmp_path):
    import ray.data as rd

    out = str(tmp_path / "view2")
    base = _facts(3000, 3)
    base = base.append_column("n", pa.array(np.ones(base.num_rows, np.int64)))
    create_agg_view(
        rd.from_arrow(base), ["k", "grp"], ["cents", "n"], out, num_partitions=64
    )
    one = pa.table(
        {
            "k": pa.array([5], pa.int64()),
            "grp": pa.array(["g1"]),
            "cents": pa.array([10], pa.int64()),
            "n": pa.array([1], pa.int64()),
        }
    )
    r = refresh_agg_view(out, rd.from_arrow(one))
    assert r == {"partitions_touched": 1, "groups_updated": 1}


def test_agg_view_edges(ray_session, tmp_path):
    import ray.data as rd

    out = str(tmp_path / "view3")
    base = _facts(100, 4)
    base = base.append_column("n", pa.array(np.ones(base.num_rows, np.int64)))
    create_agg_view(rd.from_arrow(base), ["k"], ["cents", "n"], out)
    with pytest.raises(FileExistsError):
        create_agg_view(rd.from_arrow(base), ["k"], ["cents", "n"], out)

    # empty delta is a no-op
    empty = base.schema.empty_table()
    assert refresh_agg_view(out, rd.from_arrow(empty)) == {
        "partitions_touched": 0,
        "groups_updated": 0,
    }

    # null key rejected loudly
    bad = pa.table(
        {
            "k": pa.array([None], pa.int64()),
            "grp": pa.array(["x"]),
            "cents": pa.array([1], pa.int64()),
            "n": pa.array([1], pa.int64()),
        }
    )
    with pytest.raises(Exception, match="null"):
        refresh_agg_view(out, rd.from_arrow(bad))

    # retraction: negative delta cancels a group exactly
    st = _state_one(out)
    some_k = next(iter(st))
    cents, n = st[some_k]
    neg = pa.table(
        {
            "k": pa.array([some_k], pa.int64()),
            "grp": pa.array(["irrelevant"]),
            "cents": pa.array([-cents], pa.int64()),
            "n": pa.array([-n], pa.int64()),
        }
    )
    refresh_agg_view(out, rd.from_arrow(neg.drop_columns(["grp"])))
    assert _state_one(out)[some_k] == (0, 0)


def _state_one(out):
    t = pa.concat_tables(
        [b for b in read_agg_view(out).iter_batches(batch_format="pyarrow")]
    )
    return {r["k"]: (r["cents"], r["n"]) for r in t.to_pylist()}


def test_refresh_retry_is_exactly_once(ray_session, tmp_path):
    """A crashed refresh re-run with the same delta must not double-
    fold: partition files record the refresh id, and a fold that finds
    its own id skips."""
    import json

    import ray.data as rd

    out = str(tmp_path / "view_retry")
    base = _facts(1000, 8)
    base = base.append_column("n", pa.array(np.ones(base.num_rows, np.int64)))
    create_agg_view(rd.from_arrow(base), ["k", "grp"], ["cents", "n"], out)

    d1 = _facts(300, 9)
    d1n = d1.append_column("n", pa.array(np.ones(d1.num_rows, np.int64)))
    refresh_agg_view(out, rd.from_arrow(d1n).repartition(2))
    want = _state(out)

    # simulate "folded everything, died before bumping the manifest":
    # revert the refresh counter and re-run the SAME delta
    meta = json.load(open(f"{out}/_VIEW.json"))
    assert meta["refreshes"] == 1
    meta["refreshes"] = 0
    open(f"{out}/_VIEW.json", "w").write(json.dumps(meta))
    refresh_agg_view(out, rd.from_arrow(d1n).repartition(2))
    assert _state(out) == want  # NOT double-folded

    # a genuinely new refresh (bumped counter) with identical delta
    # content must fold normally
    refresh_agg_view(out, rd.from_arrow(d1n))
    assert _state(out) == _expect([base.drop_columns(["n"]), d1, d1])


def test_zorder_stat_widening():
    from patito_ray.stages.zorder import _stat_down, _stat_up

    v = (1 << 53) + 1           # rounds UP under float()
    assert _stat_down(v) <= v
    assert _stat_up(v) >= v
    w = (1 << 54) - 1           # rounds... whichever way, both safe
    assert _stat_down(w) <= w <= _stat_up(w)
    assert _stat_down(10) == 10.0 and _stat_up(10) == 10.0
    assert _stat_down(0.25) == 0.25 == _stat_up(0.25)
