"""Benchmark harness.

Headline: full web-page validation (schema + nulls + enum + bounds +
regex + custom constraints + uniqueness shuffle + text-extraction
invariant) over the deterministic synthetic corpus at the scale implied
by $GRAFT_SF_DIR, plus the operator queries over the driver testdata.

Prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "num_cpus": N,
   "rows_per_sec": ...}

--scaling: reruns the headline in two fresh processes at 8 and 32 CPUs
on the same input and reports both throughputs + scaling efficiency
(the sandbox stand-in for N vs 4N Ray nodes).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BENCH_TMP = "/tmp/patito_ray_bench"

# webpages per unit sf (sf0.1 -> 200k pages)
PAGES_PER_SF = 2_000_000


def _sf_from_dir(sf_dir: str) -> float:
    try:
        return float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        return 0.1


def ensure_corpus(n: int) -> str:
    """Generate (once) and cache the deterministic web-page parquet."""
    path = f"{BENCH_TMP}/webpages_{n}"
    marker = f"{path}/_SUCCESS"
    if not os.path.exists(marker):
        from patito_ray.generate import write_webpages

        os.makedirs(BENCH_TMP, exist_ok=True)
        write_webpages(path, n, blocks=32)
        with open(marker, "w") as f:
            f.write("ok")
    return path


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import ray.data as rd

    from patito_ray.pipelines.queries import QUERIES
    from patito_ray.pipelines.webpage import validate_webpages

    sf = _sf_from_dir(SF_DIR)
    n_pages = max(10_000, int(PAGES_PER_SF * sf))
    corpus = ensure_corpus(n_pages)

    # warm the page cache so we measure compute+shuffle, not cold disk
    rd.read_parquet(corpus).count()

    t0 = time.time()
    ds = rd.read_parquet(corpus)
    summary = validate_webpages(ds)
    headline = time.time() - t0
    assert summary["row_count"] == n_pages, summary

    query_times: dict[str, float] = {}
    bench_queries = [
        "q1",
        "orders_dup_custkey",
        "documents_checks",
        "lineitem_null_counts",
        "distinct_parts",
        "events_daily",
        "dedup_exact_documents",
        "token_counts",
        "segment_revenue",
        "column_stats",
        "ann_cosine",
        "simhash",
        "lang_id",
    ]
    for name in bench_queries:
        fn, _sql = QUERIES[name]
        tq = time.time()
        result = fn(SF_DIR)
        # consume lazily-returned datasets
        if hasattr(result, "materialize"):
            result.materialize()
        query_times[name] = round(time.time() - tq, 3)

    out = {
        "metric": "webpage validation seconds (full schema+constraint pass incl. uniqueness shuffle + text invariant)",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": query_times,
        "sf": sf,
        "num_cpus": NUM_CPUS,
        "rows": n_pages,
        "rows_per_sec": round(n_pages / headline, 1),
    }
    ray.shutdown()
    return out


def run_scaling() -> None:
    """Same headline at 8 vs 32 CPUs in fresh processes."""

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        res = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--headline-only"],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        )
        return json.loads(res.stdout.strip().splitlines()[-1])

    lo, hi = run(8), run(32)
    eff = (lo["value"] / hi["value"]) / (32 / 8)
    print(
        json.dumps(
            {
                "sec_8": lo["value"],
                "sec_32": hi["value"],
                "rows_per_sec_8": lo["rows_per_sec"],
                "rows_per_sec_32": hi["rows_per_sec"],
                "scaling_efficiency": round(eff, 3),
                "rows": lo["rows"],
            }
        )
    )


def run_headline_only() -> None:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import logging

    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    import ray.data as rd

    from patito_ray.pipelines.webpage import validate_webpages

    sf = _sf_from_dir(SF_DIR)
    n_pages = max(10_000, int(PAGES_PER_SF * sf))
    corpus = ensure_corpus(n_pages)
    rd.read_parquet(corpus).count()  # warm cache
    t0 = time.time()
    summary = validate_webpages(rd.read_parquet(corpus))
    dt = time.time() - t0
    assert summary["row_count"] == n_pages
    print(
        json.dumps(
            {
                "value": round(dt, 3),
                "rows": n_pages,
                "rows_per_sec": round(n_pages / dt, 1),
                "num_cpus": NUM_CPUS,
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    elif "--headline-only" in sys.argv:
        run_headline_only()
    else:
        print(json.dumps(run_bench()))
