"""Composite uniqueness (model_config['unique_together']): local ==
distributed == checkpointed, spec validation, manifest round-trip."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import patito_ray as pr


class Crawl(pr.Model):
    url: str
    snapshot: int
    size: int = pr.Field(ge=0)

    model_config = {"unique_together": [("url", "snapshot")]}


def _crawl_table(n: int = 4000) -> pa.Table:
    rng = np.random.default_rng(11)
    url = np.array([f"https://ex.com/{i % 1000}" for i in range(n)])
    snapshot = (np.arange(n) // 1000).astype(np.int64)
    # urls repeat across snapshots (fine); now plant TRUE composite dups:
    # 5 (url, snapshot) pairs appear twice, one appears 3 times
    url[100:105] = url[0:5]
    snapshot[100:105] = snapshot[0:5]
    url[200:202] = "https://ex.com/0"
    snapshot[200:202] = 0
    return pa.table(
        {
            "url": pa.array(url.tolist()),
            "snapshot": pa.array(snapshot),
            "size": pa.array(rng.integers(0, 100, n).astype(np.int64)),
        }
    )


def _dup_errors(report):
    return {
        (e["loc"][0] if isinstance(e["loc"], tuple) else e["loc"]): e["msg"]
        for e in report.errors
        if "duplicated" in e["msg"]
    }


def test_local_composite_dups_detected():
    t = _crawl_table()
    report = pr.validate_report(t, Crawl)
    dups = _dup_errors(report)
    assert "url+snapshot" in dups
    # rows participating: (url0..4, snap0) pairs x2 = 10 rows, plus
    # ex.com/0@0 appears 1 (original) + 2 (planted at 200:202) … but
    # url[0] IS ex.com/0 snap 0 and 100 too -> one cluster of 4 rows.
    # Compute expected directly instead of hand-counting:
    import collections

    c = collections.Counter(
        zip(t.column("url").to_pylist(), t.column("snapshot").to_pylist())
    )
    expected = sum(v for v in c.values() if v > 1)
    assert dups["url+snapshot"] == f"{expected} rows with duplicated values."


def test_distributed_matches_local(ray_session, tmp_path):
    import ray.data as rd

    t = _crawl_table()
    step = t.num_rows // 4
    for i in range(4):
        pq.write_table(t.slice(i * step, step), tmp_path / f"p{i}.parquet")

    local = pr.validate_report(t, Crawl)
    dist = pr.validate_report(rd.read_parquet(str(tmp_path)), Crawl)

    def keyed(r):
        return {(e["loc"], e["type"], e["msg"]) for e in r.errors}

    assert keyed(dist) == keyed(local)
    assert _dup_errors(dist)["url+snapshot"] == _dup_errors(local)["url+snapshot"]


def test_clean_data_passes(ray_session):
    import ray.data as rd

    t = pa.table(
        {
            "url": pa.array([f"u{i % 10}" for i in range(100)]),
            "snapshot": pa.array(
                np.arange(100, dtype=np.int64) // 10
            ),  # (url, snapshot) unique; url alone is not
            "size": pa.array(np.ones(100, dtype=np.int64)),
        }
    )
    assert pr.validate_report(t, Crawl).ok
    assert pr.validate_report(rd.from_arrow(t).repartition(3), Crawl).ok


def test_column_subset_skips_group(ray_session):
    t = _crawl_table()
    report = pr.validate_report(t, Crawl, columns=["url"])
    assert "url+snapshot" not in _dup_errors(report)


def test_unhashed_mode_rejects_groups(ray_session):
    import ray.data as rd

    t = _crawl_table(200)
    with pytest.raises(ValueError, match="unique_together"):
        pr.validate_report(
            rd.from_arrow(t), Crawl, hash_unique_keys=False
        )


def test_spec_compile_validation():
    with pytest.raises(ValueError, match="at least two"):
        class One(pr.Model):
            a: int
            model_config = {"unique_together": [("a",)]}

        One.columns
    with pytest.raises(ValueError, match="unknown column"):
        class Two(pr.Model):
            a: int
            model_config = {"unique_together": [("a", "b")]}

        Two.columns
    with pytest.raises(ValueError, match="repeats"):
        class Three(pr.Model):
            a: int
            b: int
            model_config = {"unique_together": [("a", "a")]}

        Three.columns


def test_manifest_round_trip():
    from patito_ray.manifest import spec_from_json_dict, spec_to_json_dict

    spec = Crawl._spec()
    d = spec_to_json_dict(spec)
    back = spec_from_json_dict(d)
    assert back.unique_together == [("url", "snapshot")]
    assert back.unique_keys() == spec.unique_keys()


def test_checkpointed_composite_uniqueness(ray_session, tmp_path):
    from patito_ray.validation.checkpoint import validate_files_checkpointed

    t = _crawl_table()
    files = []
    step = t.num_rows // 4
    for i in range(4):
        p = str(tmp_path / f"part-{i}.parquet")
        pq.write_table(t.slice(i * step, step), p)
        files.append(p)
    ckpt = str(tmp_path / "ckpt")

    report = validate_files_checkpointed(files, Crawl, checkpoint_dir=ckpt)
    local = pr.validate_report(t, Crawl)
    assert _dup_errors(report)["url+snapshot"] == _dup_errors(local)["url+snapshot"]

    # resume: all shards skipped, same verdict rebuilt from checkpoint
    report2 = validate_files_checkpointed(files, Crawl, checkpoint_dir=ckpt)
    assert _dup_errors(report2) == _dup_errors(report)


def test_k_anonymity_reference(ray_session):
    import collections

    import ray.data as rd

    from patito_ray.validation.stats import k_anonymity

    rng = np.random.default_rng(5)
    a = rng.integers(0, 8, 3000)
    b = rng.choice(np.array(["x", "y", "z"]), 3000)
    # plant nulls (excluded) and a singleton group
    b_list = b.tolist()
    b_list[10] = None
    a[20] = 999  # unique tuple
    t = pa.table({"a": pa.array(a, type=pa.int64()), "b": pa.array(b_list)})
    ds = rd.from_arrow(t).repartition(5)

    out = k_anonymity(ds, ["a", "b"], k=100)
    c = collections.Counter(
        (x, y) for x, y in zip(a.tolist(), b_list) if y is not None
    )
    sizes = list(c.values())
    assert out.column("n_rows").to_pylist() == [sum(sizes)]
    assert out.column("n_groups").to_pylist() == [len(sizes)]
    assert out.column("n_small_groups").to_pylist() == [sum(s < 100 for s in sizes)]
    assert out.column("violating_rows").to_pylist() == [
        sum(s for s in sizes if s < 100)
    ]
    assert out.column("min_group_size").to_pylist() == [min(sizes)]

    with pytest.raises(ValueError):
        k_anonymity(ds, ["a", "b"], k=0)
    with pytest.raises(ValueError):
        k_anonymity(ds, [], k=5)

    # distributed-merge branch (limit_bytes=0 forces Ray's groupby path,
    # which can emit empty blocks) must agree with the driver branch
    out_dist = k_anonymity(ds, ["a", "b"], k=100, limit_bytes=0)
    assert out_dist.to_pylist() == out.to_pylist()

    # all-null tuples: zero groups through BOTH branches
    t_null = pa.table(
        {
            "a": pa.array([1, 2, 3], type=pa.int64()),
            "b": pa.array([None, None, None], type=pa.string()),
        }
    )
    ds_null = rd.from_arrow(t_null)
    for lb in (None, 0):
        z = k_anonymity(ds_null, ["a", "b"], k=2, limit_bytes=lb)
        assert z.column("n_rows").to_pylist() == [0]
        assert z.column("n_groups").to_pylist() == [0]
        assert z.column("min_group_size").to_pylist() == [0]


def test_gini_key_skew_branches(ray_session):
    """Driver (default) and distributed (limit_bytes=0, ranks via
    ordered_prefix_sum) branches agree exactly with a numpy Gini
    reference, including the tie-heavy case (many equal counts)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from patito_ray.validation.stats import gini_key_skew

    rng = np.random.default_rng(3)
    # skewed keys: key 0 hot, many singleton/tied keys, plus nulls
    keys = np.concatenate(
        [np.zeros(500, np.int64), rng.integers(1, 200, 1500)]
    )
    vals = [int(k) for k in keys] + [None] * 25
    ds = rd.from_arrow(pa.table({"user_id": pa.array(vals, pa.int64())})).repartition(5)

    uniq, cnt = np.unique(keys, return_counts=True)
    c = np.sort(cnt)
    n, s = len(c), int(c.sum())
    i = np.arange(1, n + 1, dtype=np.int64)
    num = int(((2 * i - n - 1) * c).sum())
    exp = {
        "n_keys": n,
        "total": s,
        "max_cnt": int(c[-1]),
        "gini": float(num) / (float(n) * float(s)),
        "max_share": float(c[-1]) / float(s),
    }
    for lb in (None, 0):
        kwargs = {} if lb is None else {"limit_bytes": 0}
        got = gini_key_skew(ds, "user_id", **kwargs).to_pylist()[0]
        assert got == exp, (lb, got, exp)
