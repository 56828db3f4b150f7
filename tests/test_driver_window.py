"""Pin the driver-visible query window.

The round driver's correctness harness only exercises the FIRST 50
``queries()`` entries (the round-1/2-era names, CORRECTNESS_r03.json).
Refactors of pipelines/queries.py must not reorder, rename or reshape
that window, or the driver's gate silently degrades — so the exact
50-name prefix and each query's output column set are pinned here.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

SF_DIR = "/root/testdata/sf0.001"

# first 50 names of queries(), in registration order (the driver's view)
DRIVER_WINDOW = [
    "lineitem_null_counts",
    "lineitem_bounds",
    "lineitem_enum_invalid",
    "orders_dup_custkey",
    "orders_referential",
    "documents_checks",
    "q1",
    "segment_revenue",
    "user_sessions",
    "top_parts",
    "nation_order_revenue",
    "distinct_parts",
    "events_daily",
    "events_sliding",
    "dedup_exact_documents",
    "token_counts",
    "ann_cosine",
    "ann_cosine_ivf",
    "lang_id",
    "quality_scores",
    "fingerprints",
    "winnow_fingerprints",
    "simhash",
    "simhash_pairs",
    "minhash_pairs",
    "embedding_near_dups",
    "column_stats",
    "drift_events",
    "resumable_write",
    "stratified_sample",
    "contamination",
    "dedup_incremental",
    "quantile_filter",
    "cap_per_source",
    "chunk_dedup",
    "heavy_hitters",
    "url_canonical",
    "quality_counts",
    "stats_exact",
    "asof_last_order",
    "range_join_events",
    "top_orders_per_cust",
    "derived_regex",
    "webpage_validate",
    "media_decode",
    "training_pipeline",
    "derived_charge",
    "pii_redact",
    "line_dedup",
    "mix_sources",
]

# sorted output column names per window query (sf-independent)
WINDOW_SCHEMAS = {
    "lineitem_null_counts": ["l_orderkey_nulls", "l_quantity_nulls", "l_shipdate_nulls", "row_count"],
    "lineitem_bounds": ["disc_viol", "qty_viol"],
    "lineitem_enum_invalid": ["invalid_value"],
    "orders_dup_custkey": ["dup_rows"],
    "orders_referential": ["missing_keys"],
    "documents_checks": ["doc_id_dups", "lang_invalid_n", "nchars_viol", "row_count"],
    "q1": ["avg_disc", "avg_price", "avg_qty", "count_order", "l_linestatus", "l_returnflag", "sum_base_price", "sum_charge", "sum_disc_price", "sum_qty"],
    "segment_revenue": ["c_mktsegment", "n_orders", "revenue"],
    "user_sessions": ["n_events", "n_sessions", "user_id"],
    "top_parts": ["l_partkey", "revenue"],
    "nation_order_revenue": ["n_name", "n_orders", "revenue"],
    "distinct_parts": ["distinct_parts"],
    "events_daily": ["day", "event_type", "n", "total_value"],
    "events_sliding": ["day", "event_type", "sliding_value"],
    "dedup_exact_documents": ["doc_id"],
    "token_counts": ["doc_id", "n_bpe_tokens", "n_tokens"],
    "ann_cosine": ["neighbor_id", "query_id", "rank"],
    "ann_cosine_ivf": ["neighbor_id", "query_id", "rank"],
    "lang_id": ["doc_id", "lang_confidence", "lang_pred"],
    "quality_scores": ["alpha_ratio", "doc_id", "punct_ratio", "quality_score", "stopword_ratio"],
    "fingerprints": ["doc_id", "fingerprint"],
    "winnow_fingerprints": ["doc_id", "fingerprint"],
    "simhash": ["doc_id", "simhash"],
    "simhash_pairs": ["a", "b", "hamming"],
    "minhash_pairs": ["a", "b", "jaccard"],
    "embedding_near_dups": ["a", "b", "cosine"],
    "column_stats": ["approx_distinct", "column", "count", "max", "min", "nulls", "p50"],
    "drift_events": ["cur_count", "cur_max", "cur_mean", "cur_min", "cur_nulls", "drift_ok", "ref_count", "ref_max", "ref_mean", "ref_min", "ref_nulls"],
    "resumable_write": ["doc_id", "n_chars"],
    "stratified_sample": ["doc_id", "lang"],
    "contamination": ["contaminated", "doc_id", "n_grams", "n_hits"],
    "dedup_incremental": ["doc_id"],
    "quantile_filter": ["event_id", "value"],
    "cap_per_source": ["doc_id", "source"],
    "chunk_dedup": ["chunk_idx", "doc_id"],
    "heavy_hitters": ["cnt", "value"],
    "url_canonical": ["canon_url", "doc_id"],
    "quality_counts": ["doc_id", "n_alpha", "n_chars", "n_punct", "n_tokens", "stop_hits"],
    "stats_exact": ["e_max", "e_min", "q_count", "q_max", "q_min", "q_nulls"],
    "asof_last_order": ["event_id", "last_order_ts", "user_id"],
    "range_join_events": ["event_id", "r_event_id"],
    "top_orders_per_cust": ["o_custkey", "o_orderkey", "o_totalprice", "rank"],
    "derived_regex": ["doc_id", "src_num"],
    "webpage_validate": ["bad_lang", "dup_urls", "n_errors", "null_text", "ok", "row_count", "text_checked", "text_mismatches", "ts_bound_fails", "url_bound_fails"],
    "media_decode": ["doc_id", "duration_sec", "height", "mean_luma", "n_channels", "sample_rate", "width"],
    "training_pipeline": ["n_after_dedup", "n_after_filters", "n_input", "total_tokens"],
    "derived_charge": ["charge_cents", "l_linenumber", "l_orderkey"],
    "pii_redact": ["doc_id", "n_email", "n_ipv4", "n_phone", "redacted"],
    "line_dedup": ["doc_id", "n_removed", "text"],
    "mix_sources": ["doc_id", "source"],
}


def _columns(result) -> list[str]:
    if isinstance(result, pd.DataFrame):
        return sorted(result.columns)
    if isinstance(result, pa.Table):
        return sorted(result.column_names)
    return sorted(result.schema().names)


def test_driver_window_names_pinned():
    import __ray_entry__ as entry

    names = list(entry.queries())
    assert names[:50] == DRIVER_WINDOW
    # every window query keeps an exact-SQL oracle (or was rows-only at
    # pinning time) — new oracle DROPS would weaken the driver's gate
    oracles = entry.oracle_sql()
    rows_only_at_pin = {
        "ann_cosine_ivf", "lang_id", "quality_scores", "fingerprints",
        "winnow_fingerprints", "simhash", "simhash_pairs", "column_stats",
        "quantile_filter", "media_decode", "training_pipeline",
        "webpage_validate",
    }
    for name in DRIVER_WINDOW:
        if name not in rows_only_at_pin:
            assert name in oracles, f"{name} lost its SQL oracle"


def test_driver_window_schemas_pinned(ray_session):
    import __ray_entry__ as entry

    qs = entry.queries()
    mismatches = {}
    for name in DRIVER_WINDOW:
        got = _columns(qs[name](SF_DIR))
        if got != WINDOW_SCHEMAS[name]:
            mismatches[name] = got
    assert not mismatches, f"driver-window schema drift: {mismatches}"
