import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from patito_ray.stages.zorder import (
    interleave_codes,
    prune_files,
    pruned_read,
    zorder_write,
)


def test_interleave_reference():
    # bit j*k+i of the output is bit j of column i
    a = np.array([0b11, 0b00], dtype=np.uint64)
    b = np.array([0b01, 0b10], dtype=np.uint64)
    z = interleave_codes([a, b])
    # row 0: a=11, b=01 -> bits (a0=1,b0=1,a1=1,b1=0) -> 0b0111 = 7
    # row 1: a=00, b=10 -> bits (a0=0,b0=0,a1=0,b1=1) -> 0b1000 = 8
    assert z.tolist() == [7, 8]
    with pytest.raises(ValueError, match="1..4"):
        interleave_codes([a] * 5)


def _toy(n=4000, seed=7):
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "x": pa.array(rng.integers(0, 1000, n), pa.int64()),
            "y": pa.array(rng.uniform(0.0, 1.0, n), pa.float64()),
            "payload": pa.array(rng.integers(0, 10**6, n), pa.int64()),
        }
    )


def test_zorder_write_prune_exact(ray_session, tmp_path):
    import ray.data as rd

    t = _toy()
    out = str(tmp_path / "zo")
    manifest = zorder_write(
        rd.from_arrow(t).repartition(8), ["x", "y"], out, num_files=16
    )
    assert len(manifest) >= 8
    assert sum(r["rows"] for r in manifest) == t.num_rows
    # z-key is layout-only: data files carry the original schema
    import pyarrow.parquet as pq

    f0 = pq.read_table(f"{out}/{manifest[0]['path']}")
    assert f0.column_names == ["x", "y", "payload"]

    box = {"x": (100, 300), "y": (0.2, 0.4)}
    kept, total = prune_files(out, box)
    assert total == len(manifest)
    # a 0.2 x 0.2 box over a z-ordered layout must prune a majority
    assert 0 < len(kept) < total / 2

    # pruned read + exact filter == full-scan filter (pruning never
    # drops a matching row)
    ds = pruned_read(out, box)
    got = ds.map_batches(
        lambda b: b.filter(
            pc.and_(
                pc.and_(
                    pc.greater_equal(b.column("x"), 100),
                    pc.less_equal(b.column("x"), 300),
                ),
                pc.and_(
                    pc.greater_equal(b.column("y"), 0.2),
                    pc.less_equal(b.column("y"), 0.4),
                ),
            )
        ),
        batch_format="pyarrow",
        batch_size=None,
    ).take_all()
    x = t.column("x").to_numpy()
    y = t.column("y").to_numpy()
    m = (x >= 100) & (x <= 300) & (y >= 0.2) & (y <= 0.4)
    want = sorted(t.column("payload").to_numpy()[m].tolist())
    assert sorted(r["payload"] for r in got) == want


def test_zorder_prune_misses_and_errors(ray_session, tmp_path):
    import ray.data as rd

    out = str(tmp_path / "zo2")
    zorder_write(rd.from_arrow(_toy(500)), ["x", "y"], out, num_files=4)
    # box fully outside the domain prunes everything, typed empty read
    ds = pruned_read(out, {"x": (5000, 6000)})
    assert ds.count() == 0
    assert set(ds.schema().names) == {"x", "y", "payload"}
    with pytest.raises(ValueError, match="no min/max statistics"):
        prune_files(out, {"payload": (0, 1)})
    with pytest.raises(FileExistsError):
        zorder_write(rd.from_arrow(_toy(10)), ["x"], out)


def test_zorder_null_and_empty(ray_session, tmp_path):
    import ray.data as rd

    bad = pa.table({"x": pa.array([1, None], pa.int64()), "y": pa.array([0.1, 0.2])})
    with pytest.raises(Exception, match="null 'x'"):
        zorder_write(
            rd.from_arrow(bad), ["x", "y"], str(tmp_path / "zo3"), num_files=2
        )
    empty = pa.schema([("x", pa.int64())]).empty_table()
    with pytest.raises(Exception, match="empty"):
        zorder_write(rd.from_arrow(empty), ["x"], str(tmp_path / "zo4"))
