"""CLI surface: the ray-job-submit entry point, driven as a subprocess."""

import json
import os
import subprocess
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import patito_ray as pr


def run_cli(*args: str) -> subprocess.CompletedProcess:
    env = dict(os.environ)
    return subprocess.run(
        [sys.executable, "-m", "patito_ray", *args],
        capture_output=True,
        text=True,
        timeout=240,
        cwd="/root/repo",
        env=env,
    )


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli_data")
    n = 500
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n), type=pa.int64()),
            "text": pa.array(
                ["doc text number %d" % (i % 400) for i in range(n)]
            ),
            "score": pa.array(np.linspace(-1, 99, n)),
        }
    )
    pq.write_table(t.slice(0, 250), d / "a.parquet")
    pq.write_table(t.slice(250), d / "b.parquet")
    return str(d)


def test_cli_validate_with_json_spec(data_dir, tmp_path):
    from typing import Optional

    from patito_ray.manifest import spec_to_json

    class Doc(pr.Model):
        doc_id: int = pr.Field(unique=True)
        text: str
        score: float = pr.Field(ge=0)

    spec_path = tmp_path / "doc_spec.json"
    spec_path.write_text(spec_to_json(Doc._spec()))

    res = run_cli(
        "validate",
        "--input",
        f"{data_dir}/*.parquet",
        "--model",
        str(spec_path),
        "--checkpoint",
        str(tmp_path / "ckpt"),
        "--stats",
        "--num-cpus",
        "4",
    )
    assert res.returncode == 1, res.stderr[-2000:]  # violations -> exit 1
    out = json.loads(res.stdout.strip().splitlines()[-1])
    assert out["rows"] == 500
    assert out["ok"] is False
    locs = {tuple(e["loc"]) for e in out["errors"]}
    assert ("score",) in locs  # negative scores out of bounds
    assert out["column_stats"]["score"]["count"] == 500


def test_cli_profile(data_dir):
    res = run_cli(
        "profile", "--input", f"{data_dir}/*.parquet", "--columns", "score",
        "--num-cpus", "4",
    )
    assert res.returncode == 0, res.stderr[-2000:]
    stats = json.loads(res.stdout.strip().splitlines()[-1])
    assert stats["score"]["count"] == 500


def test_cli_profile_heavy_hitters(data_dir):
    # capacity 512 >= the 400 distinct texts -> provably exact summary,
    # independent of Ray block layout (capacity 64 would legitimately
    # return an empty item list here: no text exceeds the MG bound)
    res = run_cli(
        "profile", "--input", f"{data_dir}/*.parquet",
        "--columns", "text", "--heavy-hitters", "text",
        "--hh-capacity", "512", "--num-cpus", "4",
    )
    assert res.returncode == 0, res.stderr[-2000:]
    stats = json.loads(res.stdout.strip().splitlines()[-1])
    hh = stats["text"]["heavy_hitters"]
    assert hh["error_bound"] == 0
    top_val, lo, hi = hh["items"][0]
    assert (lo, hi) == (2, 2) and isinstance(top_val, str)


def test_cli_dedup(data_dir, tmp_path):
    res = run_cli(
        "dedup",
        "--input",
        f"{data_dir}/*.parquet",
        "--output",
        str(tmp_path / "deduped"),
        "--num-cpus",
        "4",
    )
    assert res.returncode == 0, res.stderr[-2000:]
    out = json.loads(res.stdout.strip().splitlines()[-1])
    assert out["rows_in"] == 500
    assert out["rows_out"] == 400  # 400 distinct texts


def test_cli_dedup_near(data_dir, tmp_path):
    res = run_cli(
        "dedup",
        "--input",
        f"{data_dir}/*.parquet",
        "--output",
        str(tmp_path / "near_deduped"),
        "--near",
        "--threshold",
        "0.8",
        "--num-cpus",
        "4",
    )
    assert res.returncode == 0, res.stderr[-2000:]
    out = json.loads(res.stdout.strip().splitlines()[-1])
    assert out["mode"] == "near"
    assert out["rows_in"] == 500
    # near-dedup removes at least the exact duplicates
    assert out["rows_out"] <= 400


def test_cli_dedup_refuses_dirty_output(data_dir, tmp_path):
    out = tmp_path / "dirty"
    out.mkdir()
    (out / "stale.parquet").write_bytes(b"x")
    res = run_cli(
        "dedup", "--input", f"{data_dir}/*.parquet", "--output", str(out),
        "--num-cpus", "4",
    )
    assert res.returncode == 2
    assert "not empty" in res.stderr


def test_cli_infer_then_quarantine_roundtrip(data_dir, tmp_path):
    spec = tmp_path / "inferred.json"
    res = run_cli(
        "infer", "--input", f"{data_dir}/*.parquet",
        "--output", str(spec), "--name", "Docs", "--num-cpus", "4",
    )
    assert res.returncode == 0, res.stderr[-2000:]
    out = json.loads(res.stdout.strip().splitlines()[-1])
    assert out["columns"] == 3 and out["rows"] == 500
    assert "doc_id" in out["unique_candidates"]
    body = json.loads(spec.read_text())
    cols = {c["name"]: c for c in body["columns"]}
    assert cols["score"]["bounds"]["minimum"] == -1.0
    assert cols["score"]["bounds"]["maximum"] == 99.0

    # the inferred spec drives the quarantine sink: the same data has
    # zero violations against its own contract
    res2 = run_cli(
        "quarantine", "--input", f"{data_dir}/*.parquet",
        "--model", str(spec),
        "--valid", str(tmp_path / "ok"), "--bad", str(tmp_path / "bad"),
        "--num-cpus", "4",
    )
    assert res2.returncode == 0, res2.stderr[-2000:]
    counts = json.loads(res2.stdout.strip().splitlines()[-1])
    assert counts == {"valid": 500, "quarantined": 0}


def test_cli_index_lifecycle(data_dir, tmp_path):
    idx = str(tmp_path / "kidx")
    res = run_cli("index", "create", "--dir", idx, "--buckets", "4")
    assert res.returncode == 0, res.stderr[-2000:]
    assert json.loads(res.stdout.strip().splitlines()[-1])["num_buckets"] == 4

    # data_dir has 500 rows over 400 distinct texts
    res = run_cli(
        "index", "update", "--dir", idx,
        "--input", f"{data_dir}/*.parquet",
        "--key-col", "text", "--num-cpus", "4",
    )
    assert res.returncode == 0, res.stderr[-2000:]
    s = json.loads(res.stdout.strip().splitlines()[-1])
    assert s["n_rows"] == 500 and s["distinct_keys"] == 400
    assert s["new_keys"] == 400 and s["dup_rows_within_run"] == 100

    # read-only re-check: everything is now a cross-run duplicate
    res = run_cli(
        "index", "check", "--dir", idx,
        "--input", f"{data_dir}/*.parquet",
        "--key-col", "text", "--num-cpus", "4",
    )
    assert res.returncode == 0, res.stderr[-2000:]
    s = json.loads(res.stdout.strip().splitlines()[-1])
    assert s["dup_keys_vs_index"] == 400 and s["new_keys"] == 0

    res = run_cli("index", "stats", "--dir", idx)
    meta = json.loads(res.stdout.strip().splitlines()[-1])
    assert meta == {"num_buckets": 4, "refreshes": 1, "total_keys": 400}


def test_cli_verdicts(data_dir, tmp_path):
    from patito_ray.manifest import spec_to_json

    class Doc(pr.Model):
        doc_id: int = pr.Field(unique=True)
        text: str
        score: float = pr.Field(ge=0)

    spec_path = tmp_path / "doc_spec.json"
    spec_path.write_text(spec_to_json(Doc._spec()))
    ck = str(tmp_path / "ckpt")
    run_cli(
        "validate",
        "--input",
        f"{data_dir}/*.parquet",
        "--model",
        str(spec_path),
        "--checkpoint",
        ck,
        "--num-cpus",
        "4",
    )

    res = run_cli("verdicts", ck)
    # file a holds the score<0 rows -> one failing shard, exit 1
    assert res.returncode == 1, res.stderr[-2000:]
    rows = [json.loads(line) for line in res.stdout.strip().splitlines()]
    assert len(rows) == 1  # default files_per_shard covers both files
    assert rows[0]["ok"] is False and rows[0]["error_count"] > 0
    assert rows[0]["row_count"] == 500
