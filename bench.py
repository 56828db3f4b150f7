"""Benchmark harness.

Headline: full web-page validation (schema + nulls + enum + bounds +
regex + custom constraints + uniqueness shuffle + text-extraction
invariant) over the deterministic synthetic corpus at the scale implied
by $GRAFT_SF_DIR, plus the operator queries over the driver testdata.

Prints ONE JSON line:
  {"metric": ..., "value": <headline median sec>, "unit": "sec",
   "headline_trials": [...all trial secs...],
   "queries": {...per-query sec...}, "errored": [...names at -1.0...],
   "sf": ..., "num_cpus": N, "rows_per_sec": ...}
Exit code is 1 when any query errored (the JSON line is still printed).

--scaling: reruns the headline in two fresh processes at N and 4N CPUs
(default 2 vs 8 — see run_scaling for why not 8 vs 32 on this host) on
the same input and reports both throughputs + scaling efficiency (the
sandbox stand-in for N vs 4N Ray nodes).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# honest scaling: driver-side merges (polars) get exactly the CPU
# budget — neither more (2-CPU runs must not borrow all 32 host
# threads) nor less; set before polars is ever imported
os.environ.setdefault("POLARS_MAX_THREADS", str(NUM_CPUS))
BENCH_TMP = "/tmp/patito_ray_bench"

# webpages per unit sf (sf0.1 -> 50M pages; big enough that per-stage
# fixed overheads amortize and rows/sec reflects steady-state throughput)
PAGES_PER_SF = 500_000_000


def _sf_from_dir(sf_dir: str) -> float:
    try:
        return float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        return 0.1


def ensure_corpus(n: int) -> str:
    """Generate (once) and cache the deterministic web-page parquet
    (cache key carries the generator version so a generator change
    invalidates stale corpora)."""
    from patito_ray.generate import CORPUS_VERSION

    path = f"{BENCH_TMP}/webpages_{n}_v{CORPUS_VERSION}"
    marker = f"{path}/_SUCCESS"
    if not os.path.exists(marker):
        from patito_ray.generate import write_webpages

        if os.path.isdir(path):
            # an interrupted generation left partial files; writing into
            # the same dir would APPEND a second copy of the corpus
            import shutil

            shutil.rmtree(path)
        os.makedirs(BENCH_TMP, exist_ok=True)
        write_webpages(path, n, blocks=64)
        with open(marker, "w") as f:
            f.write("ok")
    return path



def _warm_pagecache(path: str) -> None:
    """Actually touch every corpus byte: parquet count() is
    metadata-only, so without this the first timed pass pays a cold
    (and noisy) disk read."""
    import glob

    for f in glob.glob(f"{path}/*.parquet"):
        with open(f, "rb") as fh:
            while fh.read(1 << 24):
                pass


def _warm_workers(num_cpus: int) -> None:
    """Touch every worker process once with the validation imports so
    the timed run measures steady-state throughput, not one-time
    library-import cost in each of the worker processes."""
    import ray.data as rd
    import pyarrow as pa

    def warm(batch: pa.Table) -> pa.Table:
        from patito_ray.validation.checks import batch_key_counts, check_batch  # noqa: F401
        import polars  # noqa: F401

        return batch

    rd.range(num_cpus * 4, override_num_blocks=num_cpus * 4).map_batches(
        warm, batch_format="pyarrow", batch_size=None
    ).materialize()


def _pin_cpus(n: int) -> None:
    """Hard-enforce the CPU budget with processor affinity: ray's
    num_cpus is only a scheduling token — worker C extensions (arrow,
    polars) would otherwise borrow extra physical cores and corrupt the
    N-vs-4N scaling comparison. Child processes (raylet, workers)
    inherit the affinity mask."""
    try:
        os.sched_setaffinity(0, set(range(n)))
    except (AttributeError, OSError):
        pass


def run_bench() -> dict:
    import ray

    _pin_cpus(NUM_CPUS)

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
        # cap per-worker polars threads: N workers x full thread pools
        # oversubscribes the host (vectorized kernels are already
        # parallel across workers)
        runtime_env={"env_vars": {"POLARS_MAX_THREADS": "2"}},
    )
    import logging

    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import ray.data as rd

    from patito_ray.pipelines.queries import QUERIES
    from patito_ray.pipelines.webpage import validate_webpages

    sf = _sf_from_dir(SF_DIR)
    n_pages = max(10_000, int(PAGES_PER_SF * sf))
    corpus = ensure_corpus(n_pages)

    # warm: page cache + worker-process imports
    _warm_pagecache(corpus)
    _warm_workers(NUM_CPUS)

    # median of K back-to-back trials with the full spread reported
    # (round-5 protocol): single-shot or best-of-2 timings swing up to
    # 2x with host steal, making round-over-round deltas unattributable.
    # The median plus the per-trial list lets a reader separate engine
    # regressions from host weather. ~4 blocks per CPU keeps the
    # driver's task loop off the critical path.
    trials = int(os.environ.get("GRAFT_HEADLINE_TRIALS", "5"))
    headline_trials: list[float] = []
    for _ in range(trials):
        t0 = time.time()
        ds = rd.read_parquet(corpus, override_num_blocks=4 * NUM_CPUS)
        summary = validate_webpages(ds)
        headline_trials.append(round(time.time() - t0, 3))
        assert summary["row_count"] == n_pages, summary
    headline = sorted(headline_trials)[len(headline_trials) // 2]

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
        "user_sessions",
        "top_parts",
        "nation_order_revenue",
        "events_sliding",
        "asof_last_order",
        "quality_counts",
        "minhash_pairs",
        "contamination",
        "stratified_sample",
        "drift_events",
        "dedup_incremental",
        "cap_per_source",
        "chunk_dedup",
        "url_canonical",
        "heavy_hitters",
        "quantile_filter",
        "pii_redact",
        "repetition",
        "kmeans",
        "semantic_dedup",
        "lm_score",
        "tfidf_search",
        "cum_spend",
        "line_dedup",
        "mix_sources",
        "quality_classifier",
        "split_assign",
        "pack_sequences",
        "normalize_text",
        "domain_filter",
        "epoch_shuffle",
        "materialize_sequences",
        "sample_exact_k",
        "bpe_tokens",
        "bloom_membership",
        "webtext_funnel",
        "approx_distinct",
        "ngram_counts",
        "corpus_diff",
        "grouped_quantiles",
        "distinct_per_group",
        "bloom_semi_join",
        "event_funnel",
        "cohort_retention",
        "percent_rank",
        "bm25_search",
        "price_outliers",
        "mode_per_group",
        "approx_quantiles",
        "weighted_sample",
        "order_lineitems",
        "rolling_spend",
        "events_pivot",
        "global_quantiles",
        "recent_ship_revenue",
        "corr_per_group",
        "image_near_dups",
        "audio_near_dups",
        "fuzzy_link",
        "rollup_revenue",
        "skew_join_events",
        "string_agg_names",
        "left_join_cust_orders",
        "price_histogram",
        "melt_lineitem",
        "json_props_agg",
        "composite_key_join",
        "ntile_events",
        "regex_extract_all",
        "pagerank_docs",
        "graph_components",
        # triangle_count is oracle-checked + scale-harnessed but too
        # heavy for the per-round bench sweep (21 s at sf0.1/8cpu)
        "edit_near_dups",
        "dedup_near_best",
        "top_types_per_brand",
        "equidepth_buckets",
        "url_dedup",
        "unique_together",
        "k_anonymity",
        "decontaminate",
        "fd_audit",
        "monotonic_audit",
        "stratified_exact_k",
        "span_dedup",
        "inclusion_audit",
        "benford_audit",
        "regression_per_group",
        "latest_by_key",
        "zscore_normalize",
        "tokens_per_source",
        "ks_drift",
        "roc_auc",
        "span_positions",
        "span_cut",
        "calibration_bins",
        "kcore_docs",
        "top_bigram",
        "scd2_history",
        "peak_concurrency",
        "welch_ttest",
        "psi_drift",
        "weighted_stats",
        "customers_no_orders",
        "group_centroids",
        "rrf_fusion",
        "key_skew",
        "chunk_windows",
        "graph_bfs",
        "basket_pairs",
        "embed_covariance",
        "interval_coverage",
        "name_link_jw",
        "region_nation_revenue",
        "rolling_median",
        "rolling_active_users",
        "debounce_events",
        "metadata_stats",
        "weighted_median",
        "range_sorted_write",
        "attribution_last_touch",
        "ab_proportions",
        "event_trigrams",
        "resample_ffill",
        "purchase_gaps",
        "compression_ratio",
        "user_streaks",
        "time_weighted_value",
        "user_event_entropy",
        "mutual_nn",
        "revenue_share",
        "source_simpson",
        "segment_gini",
        "cuped_adjust",
        "winsorized_mean",
        "user_burstiness",
        "user_profile",
        "hard_negatives",
        "quarantine_split",
        "novelty_curve",
        "source_overlap",
        "conversion_lag",
        "value_concentration",
        "time_travel",
        "zorder_prune",
        "agg_view",
        "index_search",
        "target_encode",
        "cube_revenue",
        "evolved_read",
        "tolerant_validate",
        "infer_contract",
        "bucketed_join",
        "skyline_parts",
        "basket_rules",
        "rolling_zscore",
        "event_moments",
        "survival_counts",
        "unique_index",
        "cube_lineitem",
        "cusum_revenue",
        "abc_parts",
        "daily_autocorr",
        "decayed_value",
        "sssp_weighted",
        "theilsen_trend",
        "pca_project",
        "snapshot_drift",
        "hhi_suppliers",
        "bloom_lookup",
        "isotonic_price",
        "weekday_seasonality",
        "mann_whitney",
        "video_frames",
        "ann_int8",
        "orphan_rate_monthly",
        "hierarchy_rollup",
        "item_cosine",
        "cumulative_distinct",
        "freshness_audit",
        "poisson_bootstrap",
        "degree_assortativity",
        "kendall_tau",
        "spearman_corr",
        "volume_anomaly",
        "trustrank_docs",
        "link_reciprocity",
        "clustering_coeff",
        "mutual_info",
        "cvm_test",
        "weighted_pagerank",
        "seq_patterns",
        "seq_patterns3",
        "containment_pairs",
        "theil_index",
        # golden_records is oracle-checked but out of the sweep like
        # triangle_count (6.7 s at sf0.1 — the dense part-name corpus
        # makes closure volume quadratic in the dup factor)
        # --- wave 7 (round 4) ---
        "runs_test",
        "ewma_daily",
        "acf_lags",
        "trend_ma",
        "kruskal_wallis",
        "anova_oneway",
        "levene_bf",
        "permutation_test",
        "bh_pairs",
        "soft_dedup_weights",
        "dsir_weights",
        "completeness_by_source",
        "conditional_referential",
        "compact_small_files",
        "edge_jaccard",
        "late_events",
        "harmonic_centrality",
        "audience_overlap",
        "changepoint_day",
        "label_separability",
        "srm_check",
        "zipf_slope",
        "ljung_box",
        "adf_test",
        "grouped_changepoint",
        # --- wave 8 (round 4, cont.) ---
        "mcnemar_test",
        "cochran_armitage",
        "weekday_anova",
        "grouped_runs",
        "jonckheere",
        "durbin_watson",
        "cohen_kappa",
        "gk_gamma",
        "friedman_test",
        "cross_corr_lag",
        "moran_docs",
        "partial_corr",
        "cronbach_alpha",
        "js_divergence",
        "decision_stump",
        "km_survival",
        "logrank_test",
        "rfm_segments",
        "holt_winters",
        "mann_kendall",
        "odds_ratio",
        "page_hinkley",
        "dispersion_index",
        "price_index",
        "bowley_skew",
        "seasonal_strength",
        # --- round 5 ---
        "decimal_revenue",
        "unigram_tokens",
        "index_near_dups",
        "pq_search",
        "embeddings_checks",
    ]
    for name in bench_queries:
        fn, _sql = QUERIES[name]
        tq = time.time()
        try:
            result = fn(SF_DIR)
            # consume lazily-returned datasets
            if hasattr(result, "materialize"):
                result.materialize()
            query_times[name] = round(time.time() - tq, 3)
        except Exception as exc:  # a guard (e.g. kruskal's int64-overflow
            # ValueError past ~1.3M rows) must not kill the whole sweep;
            # -1.0 marks the entry as errored, detail goes to stderr
            print(f"bench: {name} raised {exc!r}", file=sys.stderr)
            query_times[name] = -1.0

    errored = sorted(n for n, v in query_times.items() if v == -1.0)
    out = {
        "metric": "webpage validation seconds (full schema+constraint pass incl. uniqueness shuffle + text invariant)",
        "value": round(headline, 3),
        "unit": "sec",
        "headline_trials": headline_trials,
        "queries": query_times,
        "errored": errored,
        "sf": sf,
        "num_cpus": NUM_CPUS,
        "rows": n_pages,
        "rows_per_sec": round(n_pages / headline, 1),
    }
    ray.shutdown()
    return out


def run_scaling() -> None:
    """Same headline at N vs 4N CPUs in fresh processes (the sandbox
    stand-in for N vs 4N nodes).

    Defaults to 2 vs 8 CPUs rather than 8 vs 32: the sandbox VM
    advertises 32 vCPUs but vmstat shows ~90% idle + steal under a
    32-way load — the host physically delivers only a handful of
    cores, so 8->32 measures host oversubscription, not our engine.
    Each level is affinity-pinned to its CPU budget; paired trials with
    median-pair reporting guard against noisy neighbors. Override with
    GRAFT_SCALE_LO / GRAFT_SCALE_HI / GRAFT_SCALE_TRIALS.
    """
    lo_cpus = int(os.environ.get("GRAFT_SCALE_LO", "2"))
    hi_cpus = int(os.environ.get("GRAFT_SCALE_HI", "8"))
    trials = int(os.environ.get("GRAFT_SCALE_TRIALS", "2"))

    def run_once(ncpu: int) -> dict:
        # BOTH levels get the same driver polars thread count (the
        # parent's exported POLARS_MAX_THREADS): the scaling criterion
        # models N vs 4N CLUSTER nodes with a fixed-size driver — the
        # driver machine does not shrink with the cluster. The affinity
        # pin in the child bounds the WORKER budget; driver threads
        # created after the pin share the pinned cores either way.
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        res = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--headline-only"],
            env=env,
            capture_output=True,
            text=True,
        )
        if res.returncode != 0:
            sys.stderr.write(res.stderr[-4000:])
            raise RuntimeError(
                f"--headline-only child (num_cpus={ncpu}) exited "
                f"{res.returncode}; its stderr is above"
            )
        return json.loads(res.stdout.strip().splitlines()[-1])

    # Paired trials: each (lo, hi) pair runs back-to-back so both levels
    # see comparable host conditions (the VM has noisy neighbors); the
    # reported efficiency is the MEDIAN pair — min-per-level would mix a
    # lucky lo run with an unlucky hi run and measure host weather, not
    # the engine.
    pairs = []
    for _ in range(trials):
        lo = run_once(lo_cpus)
        hi = run_once(hi_cpus)
        eff = (lo["value"] / hi["value"]) / (hi_cpus / lo_cpus)
        pairs.append((eff, lo, hi))
    pairs.sort(key=lambda p: p[0])
    eff, lo, hi = pairs[len(pairs) // 2]
    print(
        json.dumps(
            {
                "cpus_lo": lo_cpus,
                "cpus_hi": hi_cpus,
                "trials": trials,
                f"sec_{lo_cpus}": lo["value"],
                f"sec_{hi_cpus}": hi["value"],
                f"rows_per_sec_{lo_cpus}": lo["rows_per_sec"],
                f"rows_per_sec_{hi_cpus}": hi["rows_per_sec"],
                "scaling_efficiency": round(eff, 3),
                "all_pair_efficiencies": [round(p[0], 3) for p in pairs],
                "rows": lo["rows"],
            }
        )
    )


def run_headline_only() -> None:
    import ray

    _pin_cpus(NUM_CPUS)

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
        # cap per-worker polars threads: N workers x full thread pools
        # oversubscribes the host (vectorized kernels are already
        # parallel across workers)
        runtime_env={"env_vars": {"POLARS_MAX_THREADS": "2"}},
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
    _warm_pagecache(corpus)
    _warm_workers(NUM_CPUS)
    # best of 2 back-to-back executions: single runs of ~20s are highly
    # sensitive to transient host steal; the minimum is the steady-state
    # capability at this CPU budget
    dt = None
    for _ in range(2):
        t0 = time.time()
        summary = validate_webpages(
            rd.read_parquet(corpus, override_num_blocks=4 * NUM_CPUS)
        )
        trial = time.time() - t0
        dt = trial if dt is None else min(dt, trial)
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
        result = run_bench()
        print(json.dumps(result))
        # a broken query must not read as a clean sweep: the JSON line
        # above is always emitted (the driver records it), but the exit
        # code flags regressions loudly
        sys.exit(1 if result["errored"] else 0)
