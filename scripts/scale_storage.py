"""Scale harness for the storage-layer operators added late round 3:
Z-order pruned reads, incremental aggregate-view refresh, and the
inverted token index. Each section checks EXACT parity against the
naive full pass and reports wall times, so the numbers in BASELINE.md
are simultaneously correctness evidence.

Usage: taskset -c 0-7 python scripts/scale_storage.py [n_rows]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray  # noqa: E402
import ray.data as rd  # noqa: E402


def facts(n: int, seed: int) -> pa.Table:
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "x": pa.array(rng.integers(0, 100_000, n), pa.int64()),
            "y": pa.array(rng.uniform(0.0, 1.0, n), pa.float64()),
            "k": pa.array(rng.integers(0, 50_000, n), pa.int64()),
            "cents": pa.array(rng.integers(0, 10_000, n), pa.int64()),
        }
    )


def bench_zorder(t: pa.Table, out: str) -> dict:
    from patito_ray.stages.zorder import prune_files, pruned_read, zorder_write

    shutil.rmtree(out, ignore_errors=True)
    t0 = time.time()
    zorder_write(rd.from_arrow(t).repartition(32), ["x", "y"], out, num_files=64)
    t_write = time.time() - t0

    box = {"x": (10_000.0, 20_000.0), "y": (0.2, 0.3)}

    def agg(ds) -> tuple[int, int]:
        def part(b: pa.Table) -> pa.Table:
            x = b.column("x").to_numpy(zero_copy_only=False)
            y = b.column("y").to_numpy(zero_copy_only=False)
            m = (x >= 10_000) & (x <= 20_000) & (y >= 0.2) & (y <= 0.3)
            return pa.table(
                {
                    "n": pa.array([int(m.sum())], pa.int64()),
                    "c": pa.array(
                        [int(b.column("cents").to_numpy(zero_copy_only=False)[m].sum())],
                        pa.int64(),
                    ),
                }
            )

        rows = ds.map_batches(part, batch_format="pyarrow", batch_size=None).take_all()
        return sum(r["n"] for r in rows), sum(r["c"] for r in rows)

    kept, total = prune_files(out, box)
    t0 = time.time()
    pruned = agg(pruned_read(out, box))
    t_pruned = time.time() - t0
    t0 = time.time()
    from patito_ray.sources.readers import clean_read_parquet

    full = agg(
        clean_read_parquet(
            sorted(
                f"{out}/{n}" for n in os.listdir(out) if n.endswith(".parquet")
            )
        )
    )
    t_full = time.time() - t0
    assert pruned == full, (pruned, full)
    return {
        "write_s": round(t_write, 1),
        "files_kept": len(kept),
        "files_total": total,
        "pruned_scan_s": round(t_pruned, 2),
        "full_scan_s": round(t_full, 2),
        "matching_rows": pruned[0],
    }


def bench_aggview(t: pa.Table, delta: pa.Table, out: str) -> dict:
    import polars as pl

    from patito_ray.stages.aggview import (
        create_agg_view,
        read_agg_view,
        refresh_agg_view,
    )

    shutil.rmtree(out, ignore_errors=True)

    def with_n(x: pa.Table) -> pa.Table:
        return x.select(["k", "cents"]).append_column(
            "n", pa.array(np.ones(x.num_rows, np.int64))
        )

    t0 = time.time()
    create_agg_view(
        rd.from_arrow(with_n(t)).repartition(32), ["k"], ["cents", "n"], out,
        num_partitions=64,
    )
    t_create = time.time() - t0
    t0 = time.time()
    res = refresh_agg_view(out, rd.from_arrow(with_n(delta)))
    t_refresh = time.time() - t0

    # exact parity vs one groupby over base + delta
    got = (
        pl.from_arrow(
            pa.concat_tables(
                list(read_agg_view(out).iter_batches(batch_format="pyarrow"))
            )
        )
        .sort("k")
    )
    want = (
        pl.from_arrow(pa.concat_tables([with_n(t), with_n(delta)]))
        .group_by("k")
        .agg(pl.col("cents").sum(), pl.col("n").sum())
        .sort("k")
    )
    assert got.equals(want)
    return {
        "create_s": round(t_create, 1),
        "refresh_s": round(t_refresh, 2),
        "delta_rows": delta.num_rows,
        "partitions_touched": res["partitions_touched"],
        "groups": want.height,
    }


def bench_invindex(n_docs: int, out: str) -> dict:
    from patito_ray.functions.invindex import build_token_index, search_index
    from patito_ray.functions.tfidf import re2_split_tokens  # noqa: F401

    rng = np.random.default_rng(5)
    vocab = np.array([f"w{i}" for i in range(20_000)])
    # Zipf-ish: low ids common, high ids rare
    ranks = (rng.pareto(1.2, size=(n_docs, 40)).clip(0, 60) / 60 * 19_999).astype(int)
    texts = [" ".join(vocab[r]) for r in ranks]
    docs = pa.table(
        {
            "doc_id": pa.array(np.arange(n_docs, dtype=np.int64), pa.int64()),
            "text": pa.array(texts),
        }
    )
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.time()
    stats = build_token_index(
        rd.from_arrow(docs).repartition(32), out, num_partitions=64
    )
    t_build = time.time() - t0

    terms = ["w3", "w17", "w40"]
    t0 = time.time()
    res = search_index(out, terms)
    hits = (
        sorted(res.column("doc_id").to_pylist())
        if isinstance(res, pa.Table)
        else sorted(r["doc_id"] for r in res.take_all())
    )
    t_search = time.time() - t0

    # parity vs a full corpus scan
    t0 = time.time()

    def scan(b: pa.Table) -> pa.Table:
        flat, parents, n = re2_split_tokens(b.column("text"))
        hit = pc.is_in(flat, value_set=pa.array(terms)).to_numpy(zero_copy_only=False)
        ok = np.zeros((n, len(terms)), dtype=bool)
        fl = flat.to_numpy(zero_copy_only=False)
        for i, term in enumerate(terms):
            sel = parents[(fl == term)]
            ok[sel, i] = True
        del hit
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)[ok.all(axis=1)]
        return pa.table({"doc_id": pa.array(ids, pa.int64())})

    scan_rows = (
        rd.from_arrow(docs)
        .repartition(32)
        .map_batches(scan, batch_format="pyarrow", batch_size=None)
        .take_all()
    )
    t_scan = time.time() - t0
    assert sorted(r["doc_id"] for r in scan_rows) == hits
    return {
        "n_docs": n_docs,
        "postings": stats["postings"],
        "build_s": round(t_build, 1),
        "search_s": round(t_search, 2),
        "full_scan_s": round(t_scan, 2),
        "hits": len(hits),
    }


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    t = facts(n, 1)
    delta = facts(50_000, 2)
    out = {
        "metric": "storage_scale",
        "n_rows": n,
        "zorder": bench_zorder(t, "/tmp/prs_zorder"),
        "aggview": bench_aggview(t, delta, "/tmp/prs_aggview"),
        "invindex": bench_invindex(max(100_000, n // 25), "/tmp/prs_invindex"),
    }
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
