"""CountMin sketch: bounds, bit-identical merge, weights."""

import numpy as np
import pyarrow as pa


# ---------------- CountMin ----------------


def test_countmin_never_undercounts_and_bounds():
    from patito_ray.state.sketches import CountMin, hash64

    rng = np.random.default_rng(3)
    keys = rng.integers(0, 5000, size=200_000)
    import collections

    true = collections.Counter(keys.tolist())
    cm = CountMin(eps=1e-3, delta=1e-3)
    cm.add_hashes(hash64(pa.array(keys)))

    probe = np.array(sorted(true), dtype=np.int64)
    est = cm.estimate_hashes(hash64(pa.array(probe)))
    truth = np.array([true[int(k)] for k in probe])
    assert (est >= truth).all()  # never under-counts
    # eps * total bound (holds w.h.p.; deterministic data+hash here)
    assert (est - truth).max() <= 1e-3 * len(keys)
    assert cm.total() == len(keys)


def test_countmin_merge_equals_sequential():
    from patito_ray.state.sketches import CountMin, hash64

    rng = np.random.default_rng(9)
    keys = rng.integers(0, 1000, size=30_000)
    h = hash64(pa.array(keys))

    seq = CountMin(eps=1e-2, delta=1e-2).add_hashes(h)
    parts = np.array_split(h, 7)
    merged = CountMin(eps=1e-2, delta=1e-2)
    for p in parts:
        merged.merge(CountMin(eps=1e-2, delta=1e-2).add_hashes(p))
    assert (seq.table == merged.table).all()  # BIT-identical

    import pytest as _pytest

    with _pytest.raises(ValueError):
        merged.merge(CountMin(eps=1e-3, delta=1e-2))


def test_countmin_weights_and_validation():
    from patito_ray.state.sketches import CountMin, hash64

    keys = pa.array([1, 2, 1], type=pa.int64())
    w = np.array([10, 5, 7], dtype=np.int64)
    cm = CountMin(eps=1e-2, delta=1e-2).add_hashes(hash64(keys), weights=w)
    est = cm.estimate_hashes(hash64(pa.array([1, 2], type=pa.int64())))
    assert est[0] >= 17 and est[1] >= 5
    assert cm.total() == 22

    import pytest as _pytest

    with _pytest.raises(ValueError):
        CountMin(eps=0.0)
    with _pytest.raises(ValueError):
        CountMin(delta=2.0)


def test_heavy_hitters_exact_in_lossy_regime(ray_session):
    """Distinct count >> MG capacity: the summary itself is lossy, but
    the two-pass operator must still return EXACTLY the true phi-heavy
    set with exact counts (candidate superset + exact recount)."""
    import collections

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from patito_ray.validation.stats import heavy_hitters

    rng = np.random.default_rng(7)
    # 3 planted heavy values + a long tail of ~2000 distinct values
    vals = np.concatenate(
        [
            np.repeat([1_000_001, 1_000_002, 1_000_003], [900, 700, 400]),
            rng.integers(0, 2000, 8000),
        ]
    )
    rng.shuffle(vals)
    v_list = vals.tolist()
    v_list[5] = None  # nulls excluded from n and from candidates
    ds = rd.from_arrow(pa.table({"x": pa.array(v_list, pa.int64())})).repartition(7)

    phi = 0.03
    n = sum(1 for v in v_list if v is not None)
    thresh = int(np.ceil(np.float64(phi) * np.float64(n)))
    truth = {
        v: c
        for v, c in collections.Counter(v for v in v_list if v is not None).items()
        if c >= thresh
    }

    for lb in (None, 0):  # driver and forced-distributed merge paths
        out = heavy_hitters(ds, "x", phi=phi, capacity=16, limit_bytes=lb)
        got = dict(zip(out.column("value").to_pylist(), out.column("cnt").to_pylist()))
        assert got == truth
    # counts sorted desc
    cnts = out.column("cnt").to_pylist()
    assert cnts == sorted(cnts, reverse=True)


def test_heavy_hitters_guards_and_empty(ray_session):
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from patito_ray.validation.stats import heavy_hitters

    ds = rd.from_arrow(pa.table({"x": pa.array([], pa.int64())}))
    out = heavy_hitters(ds, "x", phi=0.5)
    assert out.num_rows == 0

    with pytest.raises(ValueError, match="phi"):
        heavy_hitters(ds, "x", phi=0.0)
    with pytest.raises(ValueError, match="phi"):
        heavy_hitters(ds, "x", phi=1.0)

    # all rows the same value -> that single value at any phi
    ds1 = rd.from_arrow(pa.table({"x": pa.array(["a"] * 50)}))
    out = heavy_hitters(ds1, "x", phi=0.9)
    assert out.column("value").to_pylist() == ["a"]
    assert out.column("cnt").to_pylist() == [50]
