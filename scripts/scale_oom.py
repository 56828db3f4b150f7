"""Out-of-core evidence run (VERDICT r4 item 5): full webpage
validation over a corpus LARGER than the object store, recording wall
time, throughput, driver RSS, and object-store spill stats.

The 100x-scale claim rests on every exchange being bounded; this run
measures it under real memory pressure instead of arguing it: 300M
pages (~41 GB parquet, ~3x the configured object store below)
streaming through the fused validation pass including the uniqueness
blob exchange.

Run: taskset -c 0-15 python scripts/scale_oom.py [n_pages] [store_gb]
"""

from __future__ import annotations

import os
import resource
import sys
import time

N_PAGES = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000_000
STORE_GB = float(sys.argv[2]) if len(sys.argv) > 2 else 12.0
NCPU = 16


def main() -> None:
    os.environ.setdefault("POLARS_MAX_THREADS", str(NCPU))
    try:
        os.sched_setaffinity(0, set(range(NCPU)))
    except OSError:
        pass

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import BENCH_TMP

    from patito_ray.generate import CORPUS_VERSION, write_webpages

    # bench's cache layout, but blocks scale with n (fixed 64 blocks at
    # 300M rows makes ~5M-row generation tasks that look hung under
    # host thrash — the round-3 blocks=256 lesson)
    corpus = f"{BENCH_TMP}/webpages_{N_PAGES}_v{CORPUS_VERSION}"
    marker = f"{corpus}/_SUCCESS"
    t0 = time.time()
    import ray

    if not os.path.exists(marker):
        import shutil

        if os.path.isdir(corpus):
            shutil.rmtree(corpus)
        os.makedirs(BENCH_TMP, exist_ok=True)
        # generation gets its own Ray session (full-size object store);
        # the pressured session below re-inits with the small one
        ray.init(address="local", num_cpus=NCPU, include_dashboard=False,
                 logging_level="ERROR")
        write_webpages(corpus, N_PAGES, blocks=max(64, N_PAGES // 1_000_000))
        with open(marker, "w") as f:
            f.write("ok")
        ray.shutdown()
    t_gen = time.time() - t0
    size_gb = sum(
        os.path.getsize(f"{corpus}/{f}") for f in os.listdir(corpus)
    ) / 2**30

    ray.init(
        address="local",
        num_cpus=NCPU,
        include_dashboard=False,
        logging_level="ERROR",
        object_store_memory=int(STORE_GB * 2**30),
        runtime_env={"env_vars": {"POLARS_MAX_THREADS": "2"}},
    )
    import logging

    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    import ray.data as rd

    from patito_ray.pipelines.webpage import validate_webpages

    t0 = time.time()
    summary = validate_webpages(
        rd.read_parquet(corpus, override_num_blocks=8 * NCPU)
    )
    wall = time.time() - t0
    assert summary["row_count"] == N_PAGES, summary

    rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 2**20

    # spill evidence straight from the session dir (grpc-free):
    # spilled objects land under <session>/ray_spilled_objects*; raylet
    # logs carry the "Spilled N MiB, M objects" counters
    import glob

    sess = ray._private.worker._global_node.get_session_dir_path()
    spill_files = glob.glob(f"{sess}/**/ray_spilled_objects*/*", recursive=True)
    spill_gb = sum(os.path.getsize(f) for f in spill_files) / 2**30
    spill_lines: list[str] = []
    for lf in glob.glob(f"{sess}/logs/raylet.out"):
        with open(lf, errors="replace") as fh:
            spill_lines += [ln.strip() for ln in fh if "Spilled" in ln][-3:]
    print(
        f"\npages={N_PAGES:,} parquet={size_gb:.1f}GB store={STORE_GB}GB "
        f"gen={t_gen:.0f}s"
    )
    print(
        f"validated in {wall:.1f}s = {N_PAGES/wall/1e6:.2f}M rows/s "
        f"(num_cpus={NCPU}); driver peak RSS {rss_gb:.2f} GB; "
        f"spilled {spill_gb:.2f} GB across {len(spill_files)} files"
    )
    for ln in spill_lines[-3:]:
        print("raylet:", ln[:200])
    ray.shutdown()


if __name__ == "__main__":
    main()
