"""Scale harness for the wave-7 statistical operators:

1. randomization test at 10M events (5M 'purchase' / 5M 'click', a
   planted +50-cent effect on purchases): 64 splitmix replicas in ONE
   streaming pass (R partial rows per batch, no replicate
   materializes). Ground truth: the planted effect must beat every
   replica — exceed == 0, p == 1/65 — and the observed integer sums
   must equal the closed-form values of the generator.
2. DSIR importance weights at 1M docs (10% 'en' target slice whose
   texts carry a marker token): one (token, target?, count) stats pass
   + broadcast ratio table + zero-exchange scoring. Ground truth: the
   marker token's ~ln(10) log-ratio must separate the en/other
   population means (per-doc sums carry sampling noise, so the
   assertion is on means, not extremes).

3. all-pairs BH randomization (bh_pairs) at the same event volume over
   5 event types (only 'purchase' carries the planted shift): ONE
   streaming pass emits per-TYPE per-rep partials; all 10 pair tests +
   the exact integer BH step-up assemble from type sums. Ground truth:
   every purchase pair rejects with exceed == 0.

Usage: taskset -c 0-7 python scripts/scale_randstats.py [n_events] [n_docs]
Prints one JSON line per section.
"""

from __future__ import annotations

import json
import os
import resource
import shutil
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from patito_ray.functions.dedup import _splitmix  # noqa: E402


def event_batch(batch: pa.Table) -> pa.Table:
    ids = batch.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
    base = (_splitmix(ids.view(np.uint64) ^ np.uint64(0xE0E0)) % np.uint64(1000)).astype(
        np.int64
    )
    is_a = ids % 2 == 0
    cents = base + np.where(is_a, 50, 0)
    return pa.table(
        {
            "event_id": pa.array(ids, pa.int64()),
            "event_type": pa.array(
                np.where(is_a, "purchase", "click"), pa.string()
            ),
            "value": pa.array(cents.astype(np.float64) / 100.0, pa.float64()),
        }
    )


_TYPES = np.array(["click", "error", "purchase", "signup", "view"])


def event5_batch(batch: pa.Table) -> pa.Table:
    ids = batch.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
    base = (_splitmix(ids.view(np.uint64) ^ np.uint64(0xE5E5)) % np.uint64(1000)).astype(
        np.int64
    )
    tid = ids % 5
    cents = base + np.where(tid == 2, 50, 0)  # only 'purchase' shifted
    return pa.table(
        {
            "event_id": pa.array(ids, pa.int64()),
            "event_type": pa.array(_TYPES[tid], pa.string()),
            "value": pa.array(cents.astype(np.float64) / 100.0, pa.float64()),
        }
    )


def doc_batch(batch: pa.Table) -> pa.Table:
    from patito_ray.generate import page_texts

    ids = batch.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
    texts = page_texts(ids)
    en = ids % 10 == 0
    texts = [
        t + " targettoken" if e else t for t, e in zip(texts, en.tolist())
    ]
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(np.where(en, "en", "xx"), pa.string()),
        }
    )


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=8, include_dashboard=False,
            logging_level="ERROR",
        )
    import ray.data as rd

    from patito_ray.functions.randtest import randomization_test

    # ---- 1. two-sample randomization test ----
    ev = (
        rd.range(n_events, override_num_blocks=256)
        .map_batches(event_batch, batch_format="pyarrow", batch_size=None)
        .materialize()
    )
    t0 = time.time()
    r = randomization_test(
        ev,
        id_col="event_id",
        group_col="event_type",
        value_col="value",
        group_a="purchase",
        group_b="click",
        reps=64,
        seed=29,
    )
    wall = time.time() - t0
    # closed-form generator truth
    ids = np.arange(n_events, dtype=np.int64)
    base = (
        _splitmix(ids.view(np.uint64) ^ np.uint64(0xE0E0)) % np.uint64(1000)
    ).astype(np.int64)
    is_a = ids % 2 == 0
    assert r["na"] == int(is_a.sum()) and r["nb"] == int((~is_a).sum())
    assert r["sa"] == int(base[is_a].sum()) + 50 * int(is_a.sum())
    assert r["sb"] == int(base[~is_a].sum())
    assert r["exceed"] == 0, r  # planted effect beats every replica
    print(
        json.dumps(
            {
                "metric": "randomization_test_10m",
                "n_events": n_events,
                "wall_s": round(wall, 1),
                "events_per_sec": round(n_events / wall),
                "t_obs_cents": round(r["t_obs"], 3),
                "exceed": r["exceed"],
                "p": round(r["p"], 6),
                "reps": 64,
            }
        ),
        flush=True,
    )
    del ev

    # ---- 2. all-pairs BH randomization over 5 types ----
    from patito_ray.pipelines.q_wave7 import q_bh_pairs

    tmp_ev = "/tmp/patito_ray_scale_bh"
    shutil.rmtree(tmp_ev, ignore_errors=True)
    (
        rd.range(n_events, override_num_blocks=256)
        .map_batches(event5_batch, batch_format="pyarrow", batch_size=None)
        .write_parquet(f"{tmp_ev}/events.parquet")
    )
    t0 = time.time()
    bh = q_bh_pairs(tmp_ev)
    wall = time.time() - t0
    rows = bh.to_pylist()
    purchase = [r for r in rows if "purchase" in (r["type_a"], r["type_b"])]
    assert len(rows) == 10 and len(purchase) == 4
    assert all(r["exceed"] == 0 and r["reject"] for r in purchase), purchase
    print(
        json.dumps(
            {
                "metric": "bh_pairs_10m",
                "n_events": n_events,
                "wall_s": round(wall, 1),
                "events_per_sec": round(n_events / wall),
                "pairs": len(rows),
                "purchase_pairs_rejected": sum(
                    1 for r in purchase if r["reject"]
                ),
                "null_pairs_rejected": sum(
                    1 for r in rows if r["reject"]
                ) - 4,
            }
        ),
        flush=True,
    )

    # ---- 3. DSIR weights ----
    from patito_ray.pipelines.q_wave7 import q_dsir_weights

    tmp = "/tmp/patito_ray_scale_dsir"
    shutil.rmtree(tmp, ignore_errors=True)
    (
        rd.range(n_docs, override_num_blocks=256)
        .map_batches(doc_batch, batch_format="pyarrow", batch_size=None)
        .write_parquet(f"{tmp}/documents.parquet")
    )
    t0 = time.time()
    out = q_dsir_weights(tmp)
    if not isinstance(out, pa.Table):
        out = out.materialize()
        tabs = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
        out = pa.concat_tables(tabs)
    wall = time.time() - t0
    ids = out.column("doc_id").to_numpy(zero_copy_only=False)
    w = out.column("logw").to_numpy(zero_copy_only=False)
    en = ids % 10 == 0
    mean_en = float(w[en].mean())
    mean_xx = float(w[~en].mean())
    assert out.num_rows == n_docs
    # the marker token's log-ratio (~ln 10) must separate the means;
    # per-doc sums over common tokens carry sampling noise, so the
    # clean assertion is on the population means, not the extremes
    assert mean_en > mean_xx + 1.0, (mean_en, mean_xx)
    rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    print(
        json.dumps(
            {
                "metric": "dsir_weights_1m",
                "n_docs": n_docs,
                "wall_s": round(wall, 1),
                "docs_per_sec": round(n_docs / wall),
                "mean_en_logw": round(mean_en, 3),
                "mean_other_logw": round(mean_xx, 3),
                "driver_rss_gb": round(rss_gb, 2),
            }
        ),
        flush=True,
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
