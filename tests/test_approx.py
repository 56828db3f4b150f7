"""approx_distinct_per_group: estimates must be bit-identical under
any partitioning (register max-merge commutes), match the scalar
sketches.HyperLogLog on the same hashes, and land near the exact
distinct counts."""

import numpy as np
import pyarrow as pa
import pytest

from patito_ray.functions.approx import approx_distinct_per_group
from patito_ray.state.sketches import HyperLogLog, hash64


def _table(n_rows: int, n_groups: int, distinct_per_group: int) -> pa.Table:
    rng = np.random.default_rng(7)
    g = rng.integers(0, n_groups, n_rows)
    v = rng.integers(0, distinct_per_group, n_rows) + g * distinct_per_group
    return pa.table(
        {
            "k": pa.array(g.astype(np.int64)),
            "v": pa.array(v.astype(np.int64)),
        }
    )


def test_partition_invariance_and_scalar_hll_parity(ray_session):
    import ray.data as rd

    t = _table(20_000, 8, 900)
    got = {}
    for blocks in (1, 11):
        ds = rd.from_arrow(t).repartition(blocks)
        rows = approx_distinct_per_group(ds, "k", "v", p=10).take_all()
        got[blocks] = sorted((r["k"], r["approx_distinct"]) for r in rows)
    assert got[1] == got[11]  # bit-identical across partitionings

    # equals the scalar HyperLogLog folded per group over the same hash
    k = t.column("k").to_numpy(zero_copy_only=False)
    h = hash64(t.column("v"))
    want = {}
    for key in np.unique(k):
        hll = HyperLogLog(p=10)
        hll.add_hashes(h[k == key])
        want[int(key)] = int(np.rint(hll.estimate()))
    assert dict(got[1]) == want

    # and lands near the truth
    import duckdb  # exact reference without hand-rolling

    exact = dict(
        duckdb.arrow(t)
        .query("t", "SELECT k, COUNT(DISTINCT v) c FROM t GROUP BY k")
        .fetchall()
    )
    for key, est in got[1]:
        assert abs(est - exact[key]) <= 0.12 * exact[key]


def test_string_group_keys_and_empty(ray_session):
    import ray.data as rd

    t = pa.table(
        {
            "k": pa.array(["a", "b", "a", "b", "a"]),
            "v": pa.array([1, 1, 2, 1, 1], type=pa.int64()),
        }
    )
    rows = approx_distinct_per_group(
        rd.from_arrow(t), "k", "v", p=12
    ).take_all()
    got = {r["k"]: r["approx_distinct"] for r in rows}
    assert got == {"a": 2, "b": 1}  # exact at tiny cardinality

    empty = pa.table(
        {"k": pa.array([], type=pa.int64()), "v": pa.array([], type=pa.int64())}
    )
    assert (
        approx_distinct_per_group(rd.from_arrow(empty), "k", "v").take_all()
        == []
    )


def test_guards(ray_session):
    import ray.data as rd

    t = pa.table(
        {"k": pa.array([1, None], type=pa.int64()), "v": pa.array([1, 2], type=pa.int64())}
    )
    with pytest.raises(ValueError, match="p must be"):
        approx_distinct_per_group(rd.from_arrow(t), "k", "v", p=2)
    with pytest.raises(Exception, match="null"):
        approx_distinct_per_group(rd.from_arrow(t), "k", "v").take_all()


def test_approx_quantiles_per_group_accuracy(ray_session):
    """n is exact; quantile estimates stay within a t-digest rank band
    of the true selection quantile, under multiple partitionings."""
    import numpy as np
    import polars as pl
    import pyarrow as pa
    import ray
    import ray.data as rd

    from patito_ray.functions.approx import approx_quantiles_per_group

    rng = np.random.default_rng(11)
    n = 20_000
    keys = rng.integers(0, 8, size=n).astype(np.int64)
    vals = rng.lognormal(0.0, 1.5, size=n)
    tab = pa.table({"k": keys, "v": vals})
    # raw_limit sweeps the adaptive payload: 0 = every cell ships a
    # digest, 256 = mixed, huge = every cell ships raw values;
    # limit_bytes=0 forces the distributed exchange branch
    for (n_blocks, n_parts), raw_limit, limit_bytes in (
        ((3, 5), 0, 2**28),
        ((8, 2), 256, 0),
        ((8, 2), 10**9, 0),
        ((8, 2), 256, 2**28),
    ):
        ds = rd.from_arrow(tab).repartition(n_blocks)
        got = approx_quantiles_per_group(
            ds,
            "k",
            "v",
            {"p50": 0.5, "p99": 0.99},
            num_partitions=n_parts,
            raw_limit=raw_limit,
            limit_bytes=limit_bytes,
        )
        tabs = [t for t in ray.get(got.to_arrow_refs()) if t.num_rows]
        gd = {r["k"]: r for r in pl.from_arrow(pa.concat_tables(tabs)).to_dicts()}
        assert set(gd) == set(range(8))
        for k in range(8):
            sub = np.sort(vals[keys == k])
            assert gd[k]["n"] == len(sub)  # exact count
            for name, q in (("p50", 0.5), ("p99", 0.99)):
                est = gd[k][name]
                # rank of the estimate must be within 2% of q
                rank = np.searchsorted(sub, est) / len(sub)
                assert abs(rank - q) < 0.02, (k, name, est, rank)


def test_approx_quantiles_rejects_bad_q(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from patito_ray.functions.approx import approx_quantiles_per_group

    ds = rd.from_arrow(pa.table({"k": [1], "v": [1.0]}))
    with pytest.raises(ValueError, match="not in"):
        approx_quantiles_per_group(ds, "k", "v", {"bad": 1.5})
