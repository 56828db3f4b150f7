"""Persisted cross-run uniqueness index: incremental folds, replayed
retries, and the fold=False read-only check."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from patito_ray.state.keyindex import (
    create_key_index,
    key_index_size,
    key_index_update,
)


def _tab(keys: list[str]) -> pa.Table:
    return pa.table({"k": pa.array(keys, pa.string())})


def _row(t: pa.Table) -> dict:
    return t.to_pylist()[0]


def test_incremental_runs(ray_session, tmp_path):
    import ray.data as rd

    idx = str(tmp_path / "idx")
    create_key_index(idx, num_buckets=4)

    r1 = _row(
        key_index_update(
            rd.from_arrow(_tab(["a", "b", "c", "a"])).repartition(3), "k", idx
        )
    )
    assert r1 == {
        "n_rows": 4,
        "distinct_keys": 3,
        "new_keys": 3,
        "dup_keys_within_run": 1,
        "dup_rows_within_run": 1,
        "dup_keys_vs_index": 0,
        "dup_rows_vs_index": 0,
    }

    # second run: b seen before, d/e new, e duplicated within run
    r2 = _row(
        key_index_update(rd.from_arrow(_tab(["b", "d", "e", "e"])), "k", idx)
    )
    assert r2 == {
        "n_rows": 4,
        "distinct_keys": 3,
        "new_keys": 2,
        "dup_keys_within_run": 1,
        "dup_rows_within_run": 1,
        "dup_keys_vs_index": 1,
        "dup_rows_vs_index": 1,
    }
    meta = key_index_size(idx)
    assert meta["refreshes"] == 2 and meta["total_keys"] == 5


def test_fold_false_is_read_only(ray_session, tmp_path):
    import ray.data as rd

    idx = str(tmp_path / "idx")
    create_key_index(idx, num_buckets=2)
    key_index_update(rd.from_arrow(_tab(["x", "y"])), "k", idx)
    before = {
        n: os.path.getmtime(os.path.join(idx, n)) for n in os.listdir(idx)
    }
    r = _row(key_index_update(rd.from_arrow(_tab(["x", "z"])), "k", idx, fold=False))
    assert r["dup_keys_vs_index"] == 1 and r["new_keys"] == 1
    after = {n: os.path.getmtime(os.path.join(idx, n)) for n in os.listdir(idx)}
    assert before == after  # no file touched
    assert key_index_size(idx)["refreshes"] == 1


def test_retry_replays_recorded_stats(ray_session, tmp_path):
    """A bucket task retried AFTER its fold landed must return the
    recorded stats, not recount against the already-folded file."""
    import ray.data as rd

    idx = str(tmp_path / "idx")
    create_key_index(idx, num_buckets=1)
    key_index_update(rd.from_arrow(_tab(["a", "b"])), "k", idx)

    # simulate the crashed-refresh re-run: SAME delta, manifest NOT yet
    # bumped (reset it to the pre-refresh state)
    mpath = os.path.join(idx, "_INDEX.json")
    meta = json.load(open(mpath))
    meta["refreshes"] = 0
    meta["total_keys"] = 0
    open(mpath, "w").write(json.dumps(meta))

    r = _row(key_index_update(rd.from_arrow(_tab(["a", "b"])), "k", idx))
    # without replay this would report 2 dup_keys_vs_index
    assert r["new_keys"] == 2 and r["dup_keys_vs_index"] == 0
    # the index did not double-fold
    bucket = pq.read_table(os.path.join(idx, "bucket-00000.parquet"))
    assert bucket.num_rows == 2


def test_null_keys_rejected(ray_session, tmp_path):
    import ray.data as rd

    idx = str(tmp_path / "idx")
    create_key_index(idx, num_buckets=2)
    t = pa.table({"k": pa.array(["a", None], pa.string())})
    with pytest.raises(Exception, match="null"):
        key_index_update(rd.from_arrow(t), "k", idx)


def test_create_guards(tmp_path):
    idx = str(tmp_path / "idx")
    create_key_index(idx, num_buckets=2)
    with pytest.raises(FileExistsError):
        create_key_index(idx, num_buckets=2)
    create_key_index(idx, num_buckets=2, overwrite=True)
    with pytest.raises(ValueError, match="num_buckets"):
        create_key_index(str(tmp_path / "idx2"), num_buckets=0)
