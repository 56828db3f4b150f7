"""Bloom filter: the no-false-negative guarantee must hold for ANY key
set under ANY partitioning, and a partitioned OR-merge must be
bit-identical to a sequential build."""

import hypothesis.strategies as st
import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings

from patito_ray.state.sketches import BloomFilter, hash64


@settings(max_examples=120, deadline=None)
@given(
    keys=st.lists(st.integers(min_value=-(2**62), max_value=2**62), max_size=80),
    cuts=st.lists(st.integers(min_value=0, max_value=80), max_size=3),
    n_expected=st.integers(min_value=1, max_value=500),
    fp_milli=st.integers(min_value=1, max_value=500),
)
def test_no_false_negatives_and_merge_equals_sequential(
    keys, cuts, n_expected, fp_milli
):
    h = hash64(pa.array(keys, type=pa.int64())) if keys else np.empty(
        0, dtype=np.uint64
    )
    fp = fp_milli / 1000.0

    seq = BloomFilter(n_expected, fp).add_hashes(h)
    assert bool(seq.contains_hashes(h).all())  # never a false negative

    bounds = sorted({min(c, len(keys)) for c in cuts} | {0, len(keys)})
    merged = BloomFilter(n_expected, fp)
    for a, b in zip(bounds, bounds[1:]):
        part = BloomFilter(n_expected, fp)
        part.add_hashes(h[a:b])
        merged.merge(part)
    assert merged.state() == seq.state()  # bit-identical


def test_fp_rate_near_target():
    rng_keys = np.arange(10_000, dtype=np.int64)
    probe_keys = np.arange(10_000, 20_000, dtype=np.int64)
    hb = hash64(pa.array(rng_keys))
    hp = hash64(pa.array(probe_keys))
    b = BloomFilter(10_000, 0.01).add_hashes(hb)
    fp = b.contains_hashes(hp).mean()
    assert fp < 0.03, fp  # ~1% design, generous bound for hash luck
    assert 0.3 < b.fill_ratio() < 0.6  # near the optimal half-full


def test_geometry_and_state_guards():
    with pytest.raises(ValueError, match="n_expected"):
        BloomFilter(0)
    with pytest.raises(ValueError, match="fp_rate"):
        BloomFilter(10, 1.5)
    a, b = BloomFilter(100, 0.01), BloomFilter(200, 0.01)
    with pytest.raises(ValueError, match="geometry"):
        a.merge(b)
    with pytest.raises(ValueError, match="words"):
        BloomFilter.from_state(a.state(), 9999, 0.01)
    # round-trip
    a.add_hashes(hash64(pa.array([1, 2, 3], type=pa.int64())))
    c = BloomFilter.from_state(a.state(), 100, 0.01)
    assert c.state() == a.state()


def test_dataset_build_and_probe(ray_session):
    import ray.data as rd

    from patito_ray.functions.membership import (
        bloom_from_dataset,
        flag_bloom_membership,
    )

    n = 2000
    seen = pa.table({"key": pa.array(range(n), type=pa.int64())})
    states = {}
    for blocks in (1, 7):
        ds = rd.from_arrow(seen).repartition(blocks)
        b = bloom_from_dataset(ds, "key", n_expected=n, fp_rate=1e-4)
        states[blocks] = b.state()
    assert states[1] == states[7]  # partition-independent

    bloom = bloom_from_dataset(rd.from_arrow(seen), "key", n, 1e-4)
    probe = pa.table(
        {"key": pa.array(range(n - 100, n + 100), type=pa.int64())}
    )
    rows = flag_bloom_membership(
        rd.from_arrow(probe), "key", bloom
    ).take_all()
    flags = {r["key"]: r["maybe_seen"] for r in rows}
    assert all(flags[k] for k in range(n - 100, n))  # members: always True
    fp = sum(flags[k] for k in range(n, n + 100))
    assert fp <= 2  # 1e-4 design rate over 100 probes

    # string keys work through the same hash
    s = pa.table({"key": pa.array(["a", "b", "c"])})
    bs = bloom_from_dataset(rd.from_arrow(s), "key", 3, 0.01)
    got = flag_bloom_membership(
        rd.from_arrow(pa.table({"key": pa.array(["a", "zz"])})), "key", bs
    ).take_all()
    assert {r["key"]: r["maybe_seen"] for r in got}["a"] is True

    # null keys rejected loudly
    bad = pa.table({"key": pa.array([1, None], type=pa.int64())})
    with pytest.raises(Exception, match="null"):
        bloom_from_dataset(rd.from_arrow(bad), "key", 2)


def _collect_tab(ds):
    import ray

    tabs = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    return pa.concat_tables(tabs) if tabs else None


@pytest.mark.parametrize("anti", [False, True])
@pytest.mark.parametrize("fp_rate", [0.01, 0.4])  # 0.4 forces false positives
@pytest.mark.parametrize("bcast_limit", [0, 2**20])  # bloom+exchange / broadcast
def test_bloom_semi_join_exact(ray_session, anti, fp_rate, bcast_limit):
    import ray.data as rd

    from patito_ray.functions.membership import bloom_semi_join

    rng = np.random.default_rng(7)
    fact_keys = rng.integers(0, 500, size=2000)
    fact = pa.table(
        {"k": pa.array(fact_keys, pa.int64()), "payload": np.arange(2000)}
    )
    dim_keys = np.unique(rng.integers(0, 500, size=120))
    dim = pa.table({"dk": pa.array(dim_keys, pa.int64())})
    got = bloom_semi_join(
        rd.from_arrow(fact).repartition(4),
        rd.from_arrow(dim).repartition(3),
        "k",
        "dk",
        anti=anti,
        fp_rate=fp_rate,
        num_partitions=5,
        broadcast_limit_bytes=bcast_limit,
    )
    tab = _collect_tab(got)
    member = np.isin(fact_keys, dim_keys)
    want = set(np.flatnonzero(~member if anti else member).tolist())
    got_payloads = set(tab.column("payload").to_pylist()) if tab is not None else set()
    assert got_payloads == want


def test_bloom_semi_join_null_fact_key_rejected(ray_session):
    import ray.data as rd

    from patito_ray.functions.membership import bloom_semi_join

    fact = pa.table({"k": pa.array([1, None], pa.int64()), "p": [1, 2]})
    dim = pa.table({"dk": pa.array([1], pa.int64())})
    with pytest.raises(Exception, match="null"):
        # the bloom build is eager, the probe lazy — either stage may
        # surface the error first
        out = bloom_semi_join(rd.from_arrow(fact), rd.from_arrow(dim), "k", "dk")
        _collect_tab(out)
