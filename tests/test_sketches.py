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
