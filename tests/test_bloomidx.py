"""Per-file Bloom data skipping (stages/bloomidx.py): prune soundness
(no false negatives), read parity with a full scan, layout guards."""

import os

import numpy as np
import pyarrow as pa
import pytest


def _tab(n=5000):
    rng = np.random.default_rng(7)
    return pa.table(
        {
            "k": pa.array(np.arange(n, dtype=np.int64) * 13 + 5, pa.int64()),
            "v": pa.array(rng.integers(0, 100, n), pa.int64()),
        }
    )


def _ds(t, blocks=8):
    import ray.data as rd

    return rd.from_arrow(t).repartition(blocks)


def test_bloom_prune_and_read_parity(ray_session, tmp_path):
    from patito_ray.stages.bloomidx import (
        bloom_index_write,
        bloom_prune,
        bloom_pruned_read,
    )

    t = _tab()
    out = str(tmp_path / "bidx")
    manifest = bloom_index_write(_ds(t), "k", out, num_files=16)
    assert sum(r["rows"] for r in manifest) == t.num_rows
    assert all(
        os.path.exists(f"{out}/{r['path']}.bloom") for r in manifest
    )

    # present keys: every file holding a key must be kept (no false
    # negatives) and the pruned read equals the full filter
    keys = [5, 13 * 999 + 5, 13 * 4321 + 5]
    kept, total = bloom_prune(out, keys)
    assert total == len(manifest) and kept
    got = (
        bloom_pruned_read(out, keys)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    expect = (
        t.to_pandas()
        .query("k in @keys")
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert got.equals(expect)

    # absent key: with 16 blooms at 1% fp, expect (far) fewer kept
    # files than total — and the read must come back empty regardless
    kept_absent, _ = bloom_prune(out, [4])  # 4 is never 13*i+5
    assert len(kept_absent) < total
    assert bloom_pruned_read(out, [4]).count() == 0

    # single present key prunes most files (unclustered layout: the
    # key lives in exactly one file; fp keeps a few more at most)
    kept_one, _ = bloom_prune(out, [5])
    assert 1 <= len(kept_one) <= 4


def test_bloom_read_projection_and_empty_keys(ray_session, tmp_path):
    from patito_ray.stages.bloomidx import bloom_index_write, bloom_pruned_read

    t = _tab(1000)
    out = str(tmp_path / "bidx")
    bloom_index_write(_ds(t, 4), "k", out, num_files=4)

    got = bloom_pruned_read(out, [5, 18], columns=["v"]).to_pandas()
    assert list(got.columns) == ["v"]
    assert len(got) == 2

    empty = bloom_pruned_read(out, pa.array([], pa.int64()))
    assert empty.count() == 0


def test_bloom_write_guards(ray_session, tmp_path):
    from patito_ray.stages.bloomidx import bloom_index_write

    t = _tab(100)
    out = str(tmp_path / "bidx")
    bloom_index_write(_ds(t, 2), "k", out, num_files=2)
    with pytest.raises(FileExistsError):
        bloom_index_write(_ds(t, 2), "k", out, num_files=2)
    bloom_index_write(_ds(t, 2), "k", out, num_files=2, overwrite=True)

    with pytest.raises(ValueError):
        bloom_index_write(_ds(t, 2), "k", str(tmp_path / "x"), num_files=0)

    nulls = pa.table(
        {
            "k": pa.array([1, None, 3], pa.int64()),
            "v": pa.array([1, 2, 3], pa.int64()),
        }
    )
    with pytest.raises(Exception, match="null"):
        bloom_index_write(_ds(nulls, 1), "k", str(tmp_path / "y"), num_files=2)


# ---------------------------------------------------------- properties

import hypothesis.strategies as st
from hypothesis import given, settings


@settings(max_examples=25, deadline=None)
@given(
    keys=st.lists(
        st.integers(min_value=-(2**62), max_value=2**62), min_size=1, max_size=60
    ),
    probe=st.lists(
        st.integers(min_value=-(2**62), max_value=2**62), min_size=0, max_size=20
    ),
)
def test_bloom_never_false_negative(keys, probe):
    """For ANY key set and probe set: every probed key that exists must
    survive pruning (the layout-level no-false-negative guarantee,
    independent of hashes colliding or keys being negative)."""
    from patito_ray.state.sketches import BloomFilter, hash64

    b = BloomFilter(max(len(keys), 1), 0.01)
    b.add_hashes(hash64(pa.array(keys, pa.int64())))
    hits = b.contains_hashes(hash64(pa.array(probe, pa.int64()))) if probe else []
    present = set(keys)
    for k, hit in zip(probe, hits):
        if k in present:
            assert hit
