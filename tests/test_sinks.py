"""Resumable partitioned parquet sink: skip-finished-shards resume,
crash cleanup, plan supersession, lineage manifests."""

from __future__ import annotations

import json
import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from patito_ray.sinks import output_manifests, read_output, resumable_write_parquet


@pytest.fixture()
def corpus(tmp_path):
    files = []
    for i in range(4):
        t = pa.table(
            {
                "doc_id": pa.array(range(i * 10, i * 10 + 10), type=pa.int64()),
                "val": pa.array([float(j) for j in range(10)]),
            }
        )
        p = str(tmp_path / f"part{i}.parquet")
        pq.write_table(t, p)
        files.append(p)
    return files


def _keep_even(ds):
    return ds.map_batches(
        lambda t: t.filter(pc.equal(pc.bit_wise_and(t["doc_id"], 1), 0)),
        batch_format="pyarrow",
        batch_size=None,
    )


def test_write_resume_and_manifests(ray_session, corpus, tmp_path):
    out = str(tmp_path / "out")
    s1 = resumable_write_parquet(corpus, out, _keep_even, files_per_shard=2)
    assert s1["shards"] == 2 and s1["written"] == 2 and s1["skipped"] == 0
    assert s1["rows"] == 20  # half of 40

    got = sorted(read_output(out).take_all(), key=lambda r: r["doc_id"])
    assert [r["doc_id"] for r in got] == list(range(0, 40, 2))

    # resume over identical inputs: nothing re-runs, rows identical
    s2 = resumable_write_parquet(corpus, out, _keep_even, files_per_shard=2)
    assert s2["written"] == 0 and s2["skipped"] == 2 and s2["rows"] == 20

    mans = output_manifests(out)
    assert len(mans) == 2 and all(m["rows"] == 10 for m in mans)
    assert {f for m in mans for f in m["inputs"]} == set(corpus)


def test_partial_resume_rewrites_only_missing_shard(ray_session, corpus, tmp_path):
    out = str(tmp_path / "out")
    resumable_write_parquet(corpus, out, _keep_even, files_per_shard=2)
    sid = output_manifests(out)[0]["shard"]
    os.remove(f"{out}/_manifests/{sid}.json")
    shutil.rmtree(f"{out}/shard={sid}")

    s = resumable_write_parquet(corpus, out, _keep_even, files_per_shard=2)
    assert s["written"] == 1 and s["skipped"] == 1 and s["rows"] == 20


def test_crash_leftover_tmp_discarded(ray_session, corpus, tmp_path):
    out = str(tmp_path / "out")
    resumable_write_parquet(corpus, out, _keep_even, files_per_shard=2)
    sid = output_manifests(out)[0]["shard"]
    # simulate a crash mid-shard: data dir (partial) + tmp present, no manifest
    os.remove(f"{out}/_manifests/{sid}.json")
    os.makedirs(f"{out}/.tmp_{sid}")
    with open(f"{out}/.tmp_{sid}/garbage.parquet", "w") as f:
        f.write("not parquet")

    s = resumable_write_parquet(corpus, out, _keep_even, files_per_shard=2)
    assert s["written"] == 1 and s["rows"] == 20
    assert not os.path.exists(f"{out}/.tmp_{sid}")
    assert len(read_output(out).take_all()) == 20


def test_filter_all_shard_completes_with_zero_rows(ray_session, corpus, tmp_path):
    out = str(tmp_path / "out")

    def drop_all(ds):
        return ds.map_batches(
            lambda t: t.slice(0, 0), batch_format="pyarrow", batch_size=None
        )

    # a shard whose transform filters out every row must still COMPLETE
    # (manifest rows=0), not crash — and must stay skipped on resume
    s = resumable_write_parquet(corpus, out, drop_all, files_per_shard=2)
    assert s["written"] == 2 and s["rows"] == 0
    s2 = resumable_write_parquet(corpus, out, drop_all, files_per_shard=2)
    assert s2["written"] == 0 and s2["skipped"] == 2 and s2["rows"] == 0
    with pytest.raises(FileNotFoundError, match="filtered"):
        read_output(out)


def test_read_output_rejects_partial_plan(ray_session, corpus, tmp_path):
    out = str(tmp_path / "out")
    resumable_write_parquet(corpus, out, _keep_even, files_per_shard=2)
    sid = output_manifests(out)[0]["shard"]
    os.remove(f"{out}/_manifests/{sid}.json")
    with pytest.raises(RuntimeError, match="incomplete"):
        read_output(out)
    # explicit opt-in reads only the finished shard
    assert len(read_output(out, allow_partial=True).take_all()) == 10


def test_changed_transform_supersedes_plan(ray_session, corpus, tmp_path):
    out = str(tmp_path / "out")
    resumable_write_parquet(corpus, out, _keep_even, files_per_shard=2, transform_fingerprint="even")
    s = resumable_write_parquet(corpus, out, None, files_per_shard=2, transform_fingerprint="identity")
    # new fingerprint -> new shard ids -> full re-run
    assert s["written"] == 2 and s["skipped"] == 0 and s["rows"] == 40
    # reader follows the current plan only (old shards are orphans)
    assert len(read_output(out).take_all()) == 40
    plan = json.load(open(f"{out}/_plan.json"))
    assert plan["transform_fingerprint"] == "identity"


# ------------------------------------------------------- compaction


def test_compact_parquet_roundtrip(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from patito_ray.sinks import compact_parquet

    src = tmp_path / "frag"
    src.mkdir()
    all_rows = []
    for i in range(20):
        t = pa.table({"x": pa.array([i * 10 + j for j in range(50)], pa.int64())})
        pq.write_table(t, src / f"f{i:03d}.parquet")
        all_rows.extend(t.column("x").to_pylist())

    out = tmp_path / "compact"
    res = compact_parquet(str(src), str(out), target_bytes=4 * 1024)
    assert res["files_in"] == 20
    assert 1 <= res["files_out"] < 20
    got = []
    import glob

    out_files = sorted(glob.glob(str(out / "*.parquet")))
    assert len(out_files) == res["files_out"]
    for f in out_files:
        got.extend(pq.read_table(f).column("x").to_pylist())
    assert sorted(got) == sorted(all_rows)

    # refuses to clobber without overwrite=True
    with pytest.raises(FileExistsError):
        compact_parquet(str(src), str(out))
    res2 = compact_parquet(str(src), str(out), target_bytes=10**9, overwrite=True)
    assert res2["files_out"] == 1

    with pytest.raises(ValueError, match="no parquet files"):
        compact_parquet(str(tmp_path / "empty_missing"), str(tmp_path / "o2"))


def test_range_partition_write_sorted_output(ray_session, tmp_path):
    import glob
    import json as _json

    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd

    from patito_ray.sinks import range_partition_write

    rng = np.random.default_rng(33)
    vals = rng.integers(0, 10_000, size=5000)
    t = pa.table({"k": pa.array(vals, pa.int64()),
                  "payload": pa.array(vals * 2, pa.int64())})
    ds = rd.from_arrow(t).repartition(8)
    out = tmp_path / "sorted"
    manifest = range_partition_write(ds, "k", str(out), num_ranges=6)

    assert [r["range_id"] for r in manifest] == sorted(
        r["range_id"] for r in manifest
    )
    assert sum(r["rows"] for r in manifest) == 5000
    # disjoint ascending ranges; each file internally sorted; global
    # concat in range order is fully sorted; multiset preserved
    prev_max = None
    all_keys = []
    for r in manifest:
        tab = pq.read_table(str(out / r["path"]))
        k = tab.column("k").to_numpy()
        assert (np.diff(k) >= 0).all()
        assert k[0] == r["min"] and k[-1] == r["max"]
        if prev_max is not None:
            assert k[0] >= prev_max
        prev_max = k[-1]
        all_keys.append(k)
        # payload rode along
        assert (tab.column("payload").to_numpy() == k * 2).all()
    cat = np.concatenate(all_keys)
    assert (np.diff(cat) >= 0).all()
    assert sorted(cat.tolist()) == sorted(vals.tolist())
    with open(out / "_MANIFEST.json") as f:
        assert len(_json.load(f)) == len(manifest)

    with pytest.raises(FileExistsError):
        range_partition_write(ds, "k", str(out))
    with pytest.raises(ValueError, match="num_ranges"):
        range_partition_write(ds, "k", str(tmp_path / "x"), num_ranges=0)
    empty = rd.from_arrow(
        pa.schema([("k", pa.int64()), ("payload", pa.int64())]).empty_table()
    )
    with pytest.raises(ValueError, match="empty"):
        range_partition_write(empty, "k", str(tmp_path / "y"))


def test_upsert_partitioned(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import ray.data as rd

    from patito_ray.sinks import upsert_partitioned

    base = tmp_path / "tbl"
    # two partitions, keys 1..4
    for pv, keys in ((0, [1, 2]), (1, [3, 4])):
        d = base / f"p={pv}"
        d.mkdir(parents=True)
        pq.write_table(
            pa.table(
                {
                    "k": pa.array(keys, pa.int64()),
                    "p": pa.array([pv] * len(keys), pa.int64()),
                    "v": pa.array([f"base{k}" for k in keys]),
                    "ver": pa.array([1] * len(keys), pa.int64()),
                }
            ),
            d / "part.parquet",
        )

    changes = pa.table(
        {
            "k": pa.array([2, 5, 2], pa.int64()),      # update k=2 twice, insert k=5
            "p": pa.array([0, 0, 0], pa.int64()),
            "v": pa.array(["new2a", "new5", "new2b"]),
            "ver": pa.array([2, 2, 3], pa.int64()),
        }
    )
    res = upsert_partitioned(
        str(base), rd.from_arrow(changes), key="k", partition_col="p", order_col="ver"
    )
    assert res == {"partitions_touched": 1, "rows_upserted": 3}

    p0 = pq.read_table(str(base / "p=0" / "part.parquet"))
    got = {r["k"]: (r["v"], r["ver"]) for r in p0.to_pylist()}
    assert got == {1: ("base1", 1), 2: ("new2b", 3), 5: ("new5", 2)}
    # untouched partition intact
    p1 = pq.read_table(str(base / "p=1" / "part.parquet"))
    assert sorted(p1.column("k").to_pylist()) == [3, 4]

    # equal-version tie: the change row wins
    tie = pa.table(
        {
            "k": pa.array([3], pa.int64()),
            "p": pa.array([1], pa.int64()),
            "v": pa.array(["tie3"]),
            "ver": pa.array([1], pa.int64()),
        }
    )
    upsert_partitioned(str(base), rd.from_arrow(tie), key="k", partition_col="p", order_col="ver")
    p1 = pq.read_table(str(base / "p=1" / "part.parquet"))
    got1 = {r["k"]: r["v"] for r in p1.to_pylist()}
    assert got1 == {3: "tie3", 4: "base4"}

    # brand-new partition = pure insert
    ins = pa.table(
        {
            "k": pa.array([9], pa.int64()),
            "p": pa.array([7], pa.int64()),
            "v": pa.array(["nine"]),
            "ver": pa.array([1], pa.int64()),
        }
    )
    r2 = upsert_partitioned(str(base), rd.from_arrow(ins), key="k", partition_col="p", order_col="ver")
    assert r2["partitions_touched"] == 1
    assert pq.read_table(str(base / "p=7" / "part.parquet")).num_rows == 1

    # empty changes: no-op
    empty = rd.from_arrow(changes.slice(0, 0))
    assert upsert_partitioned(str(base), empty, key="k", partition_col="p", order_col="ver") == {
        "partitions_touched": 0,
        "rows_upserted": 0,
    }
    with pytest.raises(FileNotFoundError):
        upsert_partitioned(str(tmp_path / "nope"), rd.from_arrow(changes), key="k", partition_col="p", order_col="ver")


def test_upsert_rejects_column_loss(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import ray.data as rd

    from patito_ray.sinks import upsert_partitioned

    d = tmp_path / "tbl2" / "p=0"
    d.mkdir(parents=True)
    pq.write_table(
        pa.table(
            {
                "k": pa.array([1], pa.int64()),
                "p": pa.array([0], pa.int64()),
                "extra": pa.array(["keepme"]),
                "ver": pa.array([1], pa.int64()),
            }
        ),
        d / "part.parquet",
    )
    ch = pa.table(
        {
            "k": pa.array([1], pa.int64()),
            "p": pa.array([0], pa.int64()),
            "ver": pa.array([2], pa.int64()),
        }
    )
    with pytest.raises(Exception, match="identical column sets"):
        upsert_partitioned(
            str(tmp_path / "tbl2"), rd.from_arrow(ch), key="k",
            partition_col="p", order_col="ver",
        )


def test_range_write_rejects_null_keys(ray_session, tmp_path):
    import ray.data as rd

    from patito_ray.sinks import range_partition_write

    t = pa.table({"k": pa.array([1, None, 3], pa.int64())})
    with pytest.raises(Exception, match="null"):
        range_partition_write(rd.from_arrow(t), "k", str(tmp_path / "o3"))


def test_upsert_versioned_time_travel(ray_session, tmp_path):
    import pytest
    import ray.data as rd

    from patito_ray.sinks import (
        list_versions,
        snapshot_read,
        upsert_versioned,
        vacuum_versions,
    )

    base = str(tmp_path / "vtbl")

    def tbl(rows):
        return pa.table(
            {
                "k": pa.array([r[0] for r in rows], pa.int64()),
                "p": pa.array([r[1] for r in rows], pa.int64()),
                "v": pa.array([r[2] for r in rows]),
                "ver": pa.array([r[3] for r in rows], pa.int64()),
            }
        )

    # v1: pure insert into a nonexistent table
    r1 = upsert_versioned(
        base,
        rd.from_arrow(tbl([(1, 0, "a1", 0), (2, 0, "a2", 0), (3, 1, "a3", 0)])),
        key="k", partition_col="p", order_col="ver",
    )
    assert r1 == {"version": 1, "partitions_touched": 2, "rows_upserted": 3}

    # v2: update k=2, insert k=4, only partition 0 touched
    r2 = upsert_versioned(
        base,
        rd.from_arrow(tbl([(2, 0, "b2", 1), (4, 0, "b4", 1)])),
        key="k", partition_col="p", order_col="ver",
    )
    assert r2["version"] == 2 and r2["partitions_touched"] == 1

    # v3: update partition 1
    upsert_versioned(
        base, rd.from_arrow(tbl([(3, 1, "c3", 2)])),
        key="k", partition_col="p", order_col="ver",
    )
    assert list_versions(base) == [1, 2, 3]

    def state(version=None):
        t = snapshot_read(base, version=version).take_all()
        return {r["k"]: r["v"] for r in t}

    assert state(1) == {1: "a1", 2: "a2", 3: "a3"}
    assert state(2) == {1: "a1", 2: "b2", 3: "a3", 4: "b4"}
    assert state(3) == {1: "a1", 2: "b2", 3: "c3", 4: "b4"}
    assert state() == state(3)   # default = latest

    with pytest.raises(ValueError, match="does not exist"):
        snapshot_read(base, version=9)

    # vacuum keeping the last 2 snapshots: v1 gone, v2/v3 intact
    res = vacuum_versions(base, keep_latest=2)
    assert res["manifests_removed"] == 1
    assert list_versions(base) == [2, 3]
    assert state(2) == {1: "a1", 2: "b2", 3: "a3", 4: "b4"}
    assert state(3) == {1: "a1", 2: "b2", 3: "c3", 4: "b4"}
    # v1's partition-1 file was superseded at v3 and dropped, but the
    # shared partition-0 file (still referenced by v2) must survive
    with pytest.raises(ValueError, match="does not exist"):
        snapshot_read(base, version=1)

    # empty change stream is a no-op (reports the current version)
    empty = pa.schema(
        [("k", pa.int64()), ("p", pa.int64()), ("v", pa.string()), ("ver", pa.int64())]
    ).empty_table()
    r0 = upsert_versioned(
        base, rd.from_arrow(empty), key="k", partition_col="p", order_col="ver"
    )
    assert r0 == {"version": 3, "partitions_touched": 0, "rows_upserted": 0}
