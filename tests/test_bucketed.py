import numpy as np
import polars as pl
import pyarrow as pa
import pytest

from patito_ray.stages.bucketed import bucketed_join, bucketed_write


def _tables(n=3000, seed=3):
    rng = np.random.default_rng(seed)
    left = pa.table(
        {
            "k": pa.array(rng.integers(0, 500, n), pa.int64()),
            "lv": pa.array(rng.integers(0, 100, n), pa.int64()),
        }
    )
    right = pa.table(
        {
            "key": pa.array(rng.integers(200, 700, 800), pa.int64()),
            "rv": pa.array(rng.integers(0, 9, 800), pa.int64()),
        }
    )
    return left, right


def _sorted_rows(ds):
    t = pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")))
    return sorted(
        tuple(r.get(c) for c in sorted(t.column_names)) for r in t.to_pylist()
    )


def test_bucketed_join_matches_polars(ray_session, tmp_path):
    import ray.data as rd

    left, right = _tables()
    ld, rdir = str(tmp_path / "L"), str(tmp_path / "R")
    res = bucketed_write(rd.from_arrow(left).repartition(5), "k", ld, num_buckets=16)
    assert res["rows"] == left.num_rows
    bucketed_write(rd.from_arrow(right).repartition(3), "key", rdir, num_buckets=16)

    for how in ("inner", "left"):
        got = _sorted_rows(bucketed_join(ld, rdir, how=how))
        want_t = (
            pl.from_arrow(left)
            .join(pl.from_arrow(right), left_on="k", right_on="key", how=how)
            .to_arrow()
        )
        want = sorted(
            tuple(r.get(c) for c in sorted(want_t.column_names))
            for r in want_t.to_pylist()
        )
        assert got == want, how


def test_bucketed_join_guards(ray_session, tmp_path):
    import ray.data as rd

    left, right = _tables(200)
    ld, rdir = str(tmp_path / "L2"), str(tmp_path / "R2")
    bucketed_write(rd.from_arrow(left), "k", ld, num_buckets=8)
    bucketed_write(rd.from_arrow(right), "key", rdir, num_buckets=4)
    with pytest.raises(ValueError, match="bucket counts differ"):
        bucketed_join(ld, rdir)
    with pytest.raises(ValueError, match="how"):
        bucketed_join(ld, ld, how="outer")
    with pytest.raises(FileExistsError):
        bucketed_write(rd.from_arrow(left), "k", ld)

    nulls = pa.table({"k": pa.array([1, None], pa.int64()), "lv": pa.array([1, 2], pa.int64())})
    with pytest.raises(Exception, match="null"):
        bucketed_write(rd.from_arrow(nulls), "k", str(tmp_path / "N"), num_buckets=2)
