"""Query registry chunk (split from pipelines/queries.py): 58 registrations.

Registers: <initial registry>, training_pipeline, derived_charge, pii_redact, line_dedup, mix_sources, quality_classifier, repetition, warc_ingest, kmeans, semantic_dedup, lm_score, vocab_topk, tfidf_search, cum_spend, split_assign, pack_sequences, normalize_text, domain_filter, epoch_shuffle, materialize_sequences, sample_exact_k, bpe_tokens, bloom_membership, webtext_funnel, approx_distinct, ngram_counts, corpus_diff, grouped_quantiles, distinct_per_group, bloom_semi_join, event_funnel, cohort_retention, percent_rank, bm25_search, price_outliers, mode_per_group, approx_quantiles, weighted_sample, order_lineitems, rolling_spend, events_pivot, global_quantiles, recent_ship_revenue, corr_per_group, image_near_dups, audio_near_dups, fuzzy_link, rollup_revenue, cube_revenue, string_agg_names, skew_join_events, left_join_cust_orders, full_join_parts_cust, price_histogram, melt_lineitem, json_props_agg, composite_key_join
"""

from __future__ import annotations

import datetime
from typing import Any, Callable, Literal
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import patito_ray as pr
from patito_ray.functions import dedup as f_dedup
from patito_ray.functions import similarity as f_sim
from patito_ray.functions import text as f_text
from patito_ray.pipelines.webpage import validate_webpages
from patito_ray.stages.agg import merge_partial_sums
from patito_ray.validation.engine import duplicate_count_distributed
from patito_ray.validation.stats import (
    column_stats,
    drift_check,
    profile_dataset_split,
)
from patito_ray.pipelines.qcommon import (  # noqa: F401
    QUERIES,
    _tmp_dir,
    _rp,
    _one_row,
    _apply,
    _r,
    _rf,
    _ra,
    _lazy_norm,
)
from patito_ray.pipelines.q_training import (  # noqa: F401
    SQL_ANN_COSINE,
    SQL_ASOF_LAST_ORDER,
    SQL_CAP_PER_SOURCE,
    SQL_CHUNK_DEDUP,
    SQL_CONTAMINATION,
    SQL_DEDUP_EXACT,
    SQL_DEDUP_INCREMENTAL,
    SQL_DERIVED_REGEX,
    SQL_DRIFT_EVENTS,
    SQL_EMBEDDING_NEAR_DUPS,
    SQL_HEAVY_HITTERS,
    SQL_MINHASH_PAIRS,
    SQL_QUALITY_COUNTS,
    SQL_RANGE_JOIN_EVENTS,
    SQL_RESUMABLE_WRITE,
    SQL_STATS_EXACT,
    SQL_STRATIFIED_SAMPLE,
    SQL_TOKEN_COUNTS,
    SQL_TOP_ORDERS_PER_CUST,
    SQL_URL_CANONICAL,
    _sql_mul64,
    q_ann_cosine,
    q_ann_cosine_ivf,
    q_asof_last_order,
    q_cap_per_source,
    q_chunk_dedup,
    q_column_stats,
    q_contamination,
    q_dedup_exact_documents,
    q_dedup_incremental,
    q_derived_regex,
    q_drift_events,
    q_embedding_near_dups,
    q_fingerprints,
    q_heavy_hitters,
    q_lang_id,
    q_media_decode,
    q_minhash_pairs,
    q_quality,
    q_quality_counts,
    q_quantile_filter,
    q_range_join_events,
    q_resumable_write,
    q_simhash,
    q_simhash_pairs,
    q_stats_exact,
    q_stratified_sample,
    q_token_counts,
    q_top_orders_per_cust,
    q_url_canonical,
    q_webpage_validate,
    q_winnow_fingerprints,
)
from patito_ray.pipelines.q_analytics import (  # noqa: F401
    SQL_DISTINCT_PARTS,
    SQL_EVENTS_DAILY,
    SQL_EVENTS_SLIDING,
    SQL_NATION_ORDER_REVENUE,
    SQL_Q1,
    SQL_SEGMENT_REVENUE,
    SQL_TOP_PARTS,
    SQL_USER_SESSIONS,
    q_distinct_parts,
    q_events_daily,
    q_events_sliding,
    q_nation_order_revenue,
    q_q1,
    q_segment_revenue,
    q_top_parts,
    q_user_sessions,
)
from patito_ray.pipelines.q_validation import (  # noqa: F401
    SQL_DOCUMENTS_CHECKS,
    SQL_LINEITEM_BOUNDS,
    SQL_LINEITEM_ENUM,
    SQL_LINEITEM_NULLS,
    SQL_ORDERS_DUP,
    SQL_ORDERS_REF,
    q_documents_checks,
    q_lineitem_bounds,
    q_lineitem_enum_invalid,
    q_lineitem_null_counts,
    q_orders_dup_custkey,
    q_orders_referential,
)


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

QUERIES.update({
    "lineitem_null_counts": (q_lineitem_null_counts, SQL_LINEITEM_NULLS),
    "lineitem_bounds": (q_lineitem_bounds, SQL_LINEITEM_BOUNDS),
    "lineitem_enum_invalid": (q_lineitem_enum_invalid, SQL_LINEITEM_ENUM),
    "orders_dup_custkey": (q_orders_dup_custkey, SQL_ORDERS_DUP),
    "orders_referential": (q_orders_referential, SQL_ORDERS_REF),
    "documents_checks": (q_documents_checks, SQL_DOCUMENTS_CHECKS),
    "q1": (q_q1, SQL_Q1),
    "segment_revenue": (q_segment_revenue, SQL_SEGMENT_REVENUE),
    "user_sessions": (q_user_sessions, SQL_USER_SESSIONS),
    "top_parts": (q_top_parts, SQL_TOP_PARTS),
    "nation_order_revenue": (q_nation_order_revenue, SQL_NATION_ORDER_REVENUE),
    "distinct_parts": (q_distinct_parts, SQL_DISTINCT_PARTS),
    "events_daily": (q_events_daily, SQL_EVENTS_DAILY),
    "events_sliding": (q_events_sliding, SQL_EVENTS_SLIDING),
    "dedup_exact_documents": (q_dedup_exact_documents, SQL_DEDUP_EXACT),
    "token_counts": (q_token_counts, SQL_TOKEN_COUNTS),
    "ann_cosine": (q_ann_cosine, SQL_ANN_COSINE),
    "ann_cosine_ivf": (q_ann_cosine_ivf, None),
    "lang_id": (q_lang_id, None),
    "quality_scores": (q_quality, None),
    "fingerprints": (q_fingerprints, None),
    "winnow_fingerprints": (q_winnow_fingerprints, None),
    "simhash": (q_simhash, None),
    "simhash_pairs": (q_simhash_pairs, None),
    "minhash_pairs": (q_minhash_pairs, SQL_MINHASH_PAIRS),
    "embedding_near_dups": (q_embedding_near_dups, SQL_EMBEDDING_NEAR_DUPS),
    "column_stats": (q_column_stats, None),
    "drift_events": (q_drift_events, SQL_DRIFT_EVENTS),
    "resumable_write": (q_resumable_write, SQL_RESUMABLE_WRITE),
    "stratified_sample": (q_stratified_sample, SQL_STRATIFIED_SAMPLE),
    "contamination": (q_contamination, SQL_CONTAMINATION),
    "dedup_incremental": (q_dedup_incremental, SQL_DEDUP_INCREMENTAL),
    "quantile_filter": (q_quantile_filter, None),
    "cap_per_source": (q_cap_per_source, SQL_CAP_PER_SOURCE),
    "chunk_dedup": (q_chunk_dedup, SQL_CHUNK_DEDUP),
    "heavy_hitters": (q_heavy_hitters, SQL_HEAVY_HITTERS),
    "url_canonical": (q_url_canonical, SQL_URL_CANONICAL),
    "quality_counts": (q_quality_counts, SQL_QUALITY_COUNTS),
    "stats_exact": (q_stats_exact, SQL_STATS_EXACT),
    "asof_last_order": (q_asof_last_order, SQL_ASOF_LAST_ORDER),
    "range_join_events": (q_range_join_events, SQL_RANGE_JOIN_EVENTS),
    "top_orders_per_cust": (q_top_orders_per_cust, SQL_TOP_ORDERS_PER_CUST),
    "derived_regex": (q_derived_regex, SQL_DERIVED_REGEX),
    "webpage_validate": (q_webpage_validate, None),
    "media_decode": (q_media_decode, None),
})


def q_training_pipeline(sf_dir: str) -> pa.Table:
    """End-to-end training-data curation pipeline over documents:
    language-ID -> keep confident docs -> quality filter -> exact dedup
    -> token accounting. One streaming chain; each stage is a
    map_batches (lang-id/quality are actor pools), dedup is the only
    shuffle. Returns the funnel counts + kept token total."""
    from patito_ray.functions.dedup import add_content_hash
    from ray.data.aggregate import Min

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    n_input = ds.count()

    scored = f_text.quality_dataset(f_text.lang_id_dataset(ds))

    def narrow(t: pa.Table) -> pa.Table:
        # filter + content-hash + token-count in ONE pass, then drop the
        # text payload: what gets pinned for the multi-consumer tail is
        # 24 B/doc (h, doc_id, n_tok), never the corpus itself
        kept = t.filter(
            pc.and_(
                pc.greater(t["lang_confidence"], 0.05),
                pc.greater(t["quality_score"], 0.3),
            )
        )
        hashed = add_content_hash(kept, "text")
        return pa.table(
            {
                "h": hashed.column("h"),
                "doc_id": hashed.column("doc_id"),
                "n_tok": f_text.token_count_array(hashed.column("text")),
            }
        )

    kept = scored.map_batches(narrow, batch_format="pyarrow", batch_size=None).materialize()
    n_filtered = kept.count()
    from ray.data.aggregate import Sum

    n_tokens = int(kept.aggregate(Sum("n_tok", alias_name="n"))["n"] or 0)
    n_unique = kept.groupby("h").aggregate(Min("doc_id", alias_name="doc_id")).count()
    return _one_row(
        n_input=n_input,
        n_after_filters=n_filtered,
        n_after_dedup=n_unique,
        total_tokens=n_tokens,
    )


QUERIES["training_pipeline"] = (q_training_pipeline, None)


class LineitemCharge(pr.Model):
    """Derived-column model: charge computed by the derive stage (T3).
    Expressed in integer cents so the oracle comparison is exact —
    float-of-rounded values can differ in the last ulp between engines
    even when the decimal agrees."""

    l_orderkey: int
    l_linenumber: int
    charge_cents: int = pr.Field(
        derived_from=(
            pr.col("l_extendedprice")
            * (1 - pr.col("l_discount"))
            * (1 + pr.col("l_tax"))
            * 100
        ).round(0)
    )


def q_derived_charge(sf_dir: str) -> pa.Table:
    """Row-level derive (reference T3) checked value-by-value against
    SQL: model-declared derived_from expression evaluated per batch."""
    from patito_ray.frame import ModelFrame

    ds = _rp(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_tax"],
    )
    frame = ModelFrame(ds, LineitemCharge).derive().drop()
    return frame.as_dataset()


SQL_DERIVED_CHARGE = """
SELECT l_orderkey, l_linenumber,
       CAST(ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100, 0) AS BIGINT)
           AS charge_cents
FROM lineitem
"""

QUERIES["derived_charge"] = (q_derived_charge, SQL_DERIVED_CHARGE)


def q_pii_redact(sf_dir: str) -> Any:
    """PII scrub parity: both engines synthesize the IDENTICAL
    PII-laden sentence per doc_id (an email, a dotted-quad, a phone on
    every third row, plus a 'v1.2' decoy), then count matches per rule
    on the original text and redact sequentially (email -> ipv4 ->
    phone, the order contract in functions/pii.py). Arrow and DuckDB
    both run RE2, so counts AND redacted bytes must match exactly."""
    from patito_ray.functions.pii import pii_batch

    ds = _rp(sf_dir, "documents", ["doc_id"])

    def build(t: pa.Table) -> pa.Table:
        import numpy as np

        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        s = pc.cast(t.column("doc_id"), pa.string())

        def const(v: str) -> pa.Array:
            return pa.array(np.full(len(ids), v, dtype=object))

        d = pc.cast(pa.array(ids % 10), pa.string())
        phone = pc.if_else(
            pa.array(ids % 3 == 0),
            pc.binary_join_element_wise(
                const("+1 (20"), d, const(") 555-01"), d, ""
            ),
            const("none"),
        )
        text = pc.binary_join_element_wise(
            const("Contact user"), s, const("@ex"),
            pc.cast(pa.array(ids % 5), pa.string()), const(".COM at "),
            pc.cast(pa.array(ids % 250), pa.string()), const("."),
            pc.cast(pa.array(ids % 7), pa.string()), const(".0."),
            pc.cast(pa.array(ids % 100), pa.string()), const(" phone "),
            phone, const(" end v1.2"), "",
        )
        return pii_batch(
            pa.table({"doc_id": t.column("doc_id"), "text": text})
        ).drop_columns(["text"])

    return ds.map_batches(build, batch_format="pyarrow", batch_size=None)


SQL_PII_REDACT = r"""
WITH t AS (
  SELECT doc_id,
    'Contact user' || CAST(doc_id AS VARCHAR)
    || '@ex' || CAST(doc_id % 5 AS VARCHAR) || '.COM at '
    || CAST(doc_id % 250 AS VARCHAR) || '.' || CAST(doc_id % 7 AS VARCHAR)
    || '.0.' || CAST(doc_id % 100 AS VARCHAR)
    || ' phone '
    || (CASE WHEN doc_id % 3 = 0
        THEN '+1 (20' || CAST(doc_id % 10 AS VARCHAR) || ') 555-01'
             || CAST(doc_id % 10 AS VARCHAR)
        ELSE 'none' END)
    || ' end v1.2' AS text
  FROM documents
)
SELECT doc_id,
  CAST(len(regexp_extract_all(text,
    '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
  CAST(len(regexp_extract_all(text,
    '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS BIGINT) AS n_ipv4,
  CAST(len(regexp_extract_all(text,
    '\+[0-9][0-9 ()\-]{6,}[0-9]')) AS BIGINT) AS n_phone,
  regexp_replace(
    regexp_replace(
      regexp_replace(text,
        '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g'),
    '\+[0-9][0-9 ()\-]{6,}[0-9]', '<PHONE>', 'g') AS redacted
FROM t
"""

QUERIES["pii_redact"] = (q_pii_redact, SQL_PII_REDACT)


def q_line_dedup(sf_dir: str) -> Any:
    """CCNet-style cross-document line dedup (boilerplate removal):
    lines appearing >= 40 times across the corpus are deleted from
    every doc, remaining lines keep their original order. Both engines
    synthesize the IDENTICAL multi-line corpus (every token becomes a
    line via replace(' ', chr(10)) — the synthetic texts have no
    newlines), so frequent word-lines are removed and rare number-lines
    survive. Ray counts/filters by 64-bit line hash, the oracle by line
    STRING — equal up to hash collisions, exact on these corpora."""
    from patito_ray.functions.dedup import remove_frequent_lines

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])

    def to_lines(t: pa.Table) -> pa.Table:
        # defensively drop null texts on BOTH sides: the operator maps
        # null -> '' (one empty line) while SQL's unnest drops the row
        # entirely — same convention as the other text oracles
        t = t.filter(pc.is_valid(t.column("text")))
        return t.set_column(
            t.schema.get_field_index("text"),
            "text",
            pc.replace_substring(t.column("text"), " ", "\n"),
        )

    multi = ds.map_batches(to_lines, batch_format="pyarrow", batch_size=None)
    return remove_frequent_lines(multi, min_count=40)


SQL_LINE_DEDUP = """
WITH m AS (
  SELECT doc_id,
         string_split(replace(text, ' ', chr(10)), chr(10)) AS ls
  FROM documents
  WHERE text IS NOT NULL
),
l AS (
  SELECT doc_id, unnest(ls) AS line, generate_subscripts(ls, 1) AS i
  FROM m
),
c AS (SELECT line, count(*) AS cnt FROM l GROUP BY line)
SELECT l.doc_id,
       coalesce(
         string_agg(l.line, chr(10) ORDER BY l.i)
           FILTER (WHERE c.cnt < 40), '') AS text,
       CAST(count(*) FILTER (WHERE c.cnt >= 40) AS BIGINT) AS n_removed
FROM l JOIN c USING (line)
GROUP BY l.doc_id
"""

QUERIES["line_dedup"] = (q_line_dedup, SQL_LINE_DEDUP)


def q_mix_sources(sf_dir: str) -> Any:
    """Data mixing to a target source distribution: ~60 rows at weights
    src0=0.5 / src1=0.25 / src2=0.25, all other sources dropped. At the
    sf0.01 gate src0's demand (30) exceeds its supply (25), exercising
    the saturated keep-all branch alongside sub-1.0 fractions. The SQL
    oracle recomputes the per-source counts, the IEEE-double fraction
    arithmetic in the same literal op order, the floor(f*2^64)
    threshold, and the splitmix64 membership hash bit for bit."""
    from patito_ray.functions.sampling import mix_sources

    ds = _rp(sf_dir, "documents", ["doc_id", "source"])
    return mix_sources(
        ds,
        key_col="doc_id",
        source_col="source",
        weights={"src0": 0.5, "src1": 0.25, "src2": 0.25},
        target_rows=60,
    )


# splitmix64 over doc_id (seed 0); fractions derived from live counts,
# thresholds = floor(fraction * 2^64) (int() truncation == floor for
# non-negative doubles)
SQL_MIX_SOURCES = f"""
WITH cnt AS (
  SELECT source, CAST(count(*) AS DOUBLE) AS n
  FROM documents GROUP BY source
), fr AS (
  SELECT source,
    LEAST(1.0, (60.0 * CASE source
        WHEN 'src0' THEN 0.5 WHEN 'src1' THEN 0.25
        WHEN 'src2' THEN 0.25 ELSE 0.0 END) / n) AS f
  FROM cnt
  WHERE source IN ('src0', 'src1', 'src2')
), thr AS (
  SELECT source, f,
    CAST(floor(f * 18446744073709551616.0) AS HUGEINT) AS t
  FROM fr
), z0 AS (
  SELECT doc_id, source,
    CAST((CAST(doc_id AS HUGEINT) + 11400714819323198485)
         % 18446744073709551616 AS UBIGINT) AS z
  FROM documents
), x1 AS (
  SELECT doc_id, source, xor(z, z >> 30) AS z FROM z0
), z1 AS (
  SELECT doc_id, source, {_sql_mul64(3210233709, 484763065)} AS z FROM x1
), x2 AS (
  SELECT doc_id, source, xor(z, z >> 27) AS z FROM z1
), z2 AS (
  SELECT doc_id, source, {_sql_mul64(2496678331, 321982955)} AS z FROM x2
), h AS (
  SELECT doc_id, source, CAST(xor(z, z >> 31) AS HUGEINT) AS h64 FROM z2
)
SELECT h.doc_id, h.source
FROM h JOIN thr USING (source)
WHERE thr.f >= 1.0 OR h.h64 < thr.t
"""

QUERIES["mix_sources"] = (q_mix_sources, SQL_MIX_SOURCES)


def q_quality_classifier(sf_dir: str) -> Any:
    """Model-based quality filter, fastText-style: weak labels from a
    lexicon rule (doc contains the token 'dup'), hashed unigram+bigram
    features, full-batch Adagrad logistic regression trained via
    broadcast-weights/partial-gradient rounds (driver fast-path at this
    scale — identical math), then one streaming scoring pass over the
    corpus. Iterative training is not SQL-expressible -> rows-only;
    learnability is asserted by pytest (separable synthetic vocab ->
    100% train accuracy; distributed-vs-driver weight parity)."""
    from patito_ray.functions.classifier import (
        featurize,
        score_logreg,
        train_logreg,
    )

    dim = 1 << 14
    ds = _rp(sf_dir, "documents", ["doc_id", "text"])

    def lab(t: pa.Table) -> pa.Table:
        has = pc.match_substring_regex(t.column("text"), r"(^| )dup( |$)")
        return t.append_column("y01", pc.cast(has, pa.int8()))

    lds = ds.map_batches(lab, batch_format="pyarrow", batch_size=None)
    w = train_logreg(featurize(lds, "text", "y01", dim=dim), dim=dim)
    scored = score_logreg(lds, w, "text", dim=dim)

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "y01": t.column("y01"),
                "pred": pc.cast(
                    pc.greater(t.column("score"), 0.5), pa.int8()
                ),
            }
        )

    return scored.map_batches(finish, batch_format="pyarrow", batch_size=None)


QUERIES["quality_classifier"] = (q_quality_classifier, None)


def q_repetition(sf_dir: str) -> Any:
    """Gopher-style repetition stats: per document, exact counts of
    duplicate token occurrences and the characters they cover (the
    primitive behind duplicate-line / duplicated-word corpus filters).
    One Arrow group-by per batch, no shuffle; integer counts so the
    DuckDB comparison is bit-exact (fractions would differ in ulps)."""
    from patito_ray.functions.repetition import repetition_counts_batch

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])

    def stats(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("text")))  # mirror SQL WHERE
        return repetition_counts_batch(t).drop_columns(["text"])

    return ds.map_batches(stats, batch_format="pyarrow", batch_size=None)


SQL_REPETITION = """
WITH u AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
  FROM documents WHERE text IS NOT NULL
), g AS (
  SELECT doc_id, tok, COUNT(*) AS c, len(tok) AS L
  FROM u GROUP BY doc_id, tok
)
SELECT doc_id,
  CAST(SUM(c) AS BIGINT) AS n_units,
  CAST(SUM(c - 1) AS BIGINT) AS n_dup_units,
  CAST(SUM(c * L) AS BIGINT) AS total_chars,
  CAST(SUM((c - 1) * L) AS BIGINT) AS dup_chars
FROM g GROUP BY doc_id
"""

QUERIES["repetition"] = (q_repetition, SQL_REPETITION)


def q_warc_ingest(sf_dir: str) -> Any:
    """WARC ingest end-to-end: each batch of documents is framed into
    a real gzipped WARC/1.0 file (one file per batch, the Common-Crawl
    decomposition), then read back through `sources.warc.read_warc`.
    The SQL oracle recomputes url/timestamp/byte-length from doc_id —
    any framing, gzip, Content-Length or HTTP-head-stripping bug shows
    up as a value mismatch."""
    import hashlib
    import os
    import shutil
    from datetime import datetime, timedelta

    from patito_ray.sources.warc import read_warc, write_warc

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    # fixed per-corpus scratch dir, wiped on entry: repeated runs reuse
    # ONE bounded directory instead of leaking a corpus-sized mkdtemp
    # per invocation
    tag = hashlib.sha256(sf_dir.encode()).hexdigest()[:12]
    tmpdir = os.path.join("/tmp", f"warc_ingest_{tag}")
    shutil.rmtree(tmpdir, ignore_errors=True)
    os.makedirs(tmpdir, exist_ok=True)

    def frame_batch(t: pa.Table) -> pa.Table:
        epoch = datetime(2024, 1, 1)
        rows = t.to_pylist()
        if not rows:
            return pa.table({"n": pa.array([], type=pa.int64())})
        pages = [
            (
                f"https://crawl.example/{r['doc_id']}",
                epoch + timedelta(seconds=int(r["doc_id"])),
                f"<html><body>doc {r['doc_id']} {r['text']}</body></html>".encode(),
            )
            for r in rows
        ]
        # content-deterministic name (batches partition disjoint doc_id
        # sets, so the first id is unique per batch): a Ray task retry
        # overwrites the same file instead of duplicating records under
        # a new pid-based name
        path = os.path.join(tmpdir, f"part-{rows[0]['doc_id']}.warc.gz")
        write_warc(path, pages)
        return pa.table({"n": [len(pages)]})

    # consume to force all files out, then read them back
    ds.map_batches(frame_batch, batch_format="pyarrow").count()
    pages_ds = read_warc(tmpdir)

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": t.column("url"),
                "warc_ts": t.column("warc_ts"),
                "n_bytes": pc.cast(
                    pc.binary_length(t.column("html")), pa.int64()
                ),
            }
        )

    return pages_ds.map_batches(project, batch_format="pyarrow", batch_size=None)


SQL_WARC_INGEST = """
SELECT 'https://crawl.example/' || CAST(doc_id AS VARCHAR) AS url,
       TIMESTAMP '2024-01-01' + to_seconds(doc_id) AS warc_ts,
       CAST(octet_length(encode(
         '<html><body>doc ' || CAST(doc_id AS VARCHAR) || ' ' || text
         || '</body></html>')) AS BIGINT) AS n_bytes
FROM documents
"""

QUERIES["warc_ingest"] = (q_warc_ingest, SQL_WARC_INGEST)


def q_kmeans(sf_dir: str) -> Any:
    """Distributed k-means (SemDeDup-style curation clustering): seed
    with the vectors of ids 0..3, run ONE Lloyd update (assign + mean),
    then count the second assignment's cluster sizes. Both engines
    compute squared-L2 in float64 on the float32 values' exact images
    with ties to the smallest cluster id, so the per-cluster counts
    match exactly (assignment gaps are O(0.1) vs fp noise O(1e-12)).
    `exact_dists=True` mirrors the SQL sum((x_i-c_i)^2) form; the fast
    matmul path is property-tested equal in pytest."""
    from patito_ray.functions.clustering import kmeans_assign, kmeans_fit
    from ray.data.aggregate import Count

    ds = _rp(sf_dir, "embeddings", ["vec_id", "embedding"])
    c1 = kmeans_fit(ds, k=4, n_iter=1, exact_dists=True)
    assigned = kmeans_assign(ds, c1, exact_dists=True)
    out = assigned.groupby("cluster_id").aggregate(
        Count(alias_name="n_members")
    )
    return out


SQL_KMEANS = """
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
c0 AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 4),
d1 AS (
  SELECT e.vec_id, c0.cid,
    list_sum(list_transform(list_zip(e.v, c0.cv), p -> (p[1]-p[2])^2)) AS dist
  FROM e CROSS JOIN c0
),
a1 AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
    FROM d1
  ) WHERE rn = 1
),
m1 AS (
  SELECT cid, generate_subscripts(v, 1) AS i, unnest(v) AS x
  FROM a1 JOIN e USING (vec_id)
),
c1 AS (
  -- an empty cluster keeps its previous centroid (the engine's
  -- documented contract): start from every seed, fall back on c0
  SELECT c0.cid, coalesce(cm.cv, c0.cv) AS cv
  FROM c0 LEFT JOIN (
    SELECT cid, list(mx ORDER BY i) AS cv
    FROM (SELECT cid, i, SUM(x) / COUNT(*) AS mx FROM m1 GROUP BY cid, i)
    GROUP BY cid
  ) cm USING (cid)
),
d2 AS (
  SELECT e.vec_id, c1.cid,
    list_sum(list_transform(list_zip(e.v, c1.cv), p -> (p[1]-p[2])^2)) AS dist
  FROM e CROSS JOIN c1
),
a2 AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
    FROM d2
  ) WHERE rn = 1
)
SELECT cid AS cluster_id, CAST(COUNT(*) AS BIGINT) AS n_members
FROM a2 GROUP BY cid
"""

QUERIES["kmeans"] = (q_kmeans, SQL_KMEANS)


def q_semantic_dedup(sf_dir: str) -> Any:
    """SemDeDup within precomputed clusters (the `label` column plays
    the cluster id so the oracle needs no kmeans re-derivation): a row
    is dropped when a smaller-id same-cluster row has cosine > 0.3.
    Order-independent predicate -> deterministic under any
    partitioning; one O(|c|^2) matmul per cluster group. Exact SQL
    parity on every (vec_id, kept) verdict."""
    from patito_ray.functions.clustering import semantic_dedup

    ds = _rp(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    return semantic_dedup(
        ds, cluster_col="label", threshold=0.3
    )


SQL_SEMANTIC_DEDUP = """
WITH e AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
n AS (
  SELECT vec_id, label, v,
         sqrt(list_sum(list_transform(v, x -> x*x))) AS nrm
  FROM e
),
dropped AS (
  SELECT DISTINCT a.vec_id
  FROM n a JOIN n b ON a.label = b.label AND b.vec_id < a.vec_id
  WHERE list_sum(list_transform(list_zip(a.v, b.v), p -> p[1]*p[2]))
        / (a.nrm * b.nrm) > 0.3
)
SELECT e.vec_id, CAST(e.label AS BIGINT) AS label,
       d.vec_id IS NULL AS kept
FROM e LEFT JOIN dropped d ON e.vec_id = d.vec_id
"""

QUERIES["semantic_dedup"] = (q_semantic_dedup, SQL_SEMANTIC_DEDUP)


def q_lm_score(sf_dir: str) -> Any:
    """Unigram LM quality scoring (the CCNet-style cheap perplexity
    signal): train token statistics over the corpus in one distributed
    pass (partial Arrow group-bys -> adaptive merge), broadcast the
    model once, score every doc's average token log-probability per
    batch via one C++ hash probe per token. Self-scored corpus -> no
    OOV, so DuckDB reproduces the exact Laplace-smoothed numbers;
    rounded to 1e-6 (fp sum/ln noise is ~1e-12)."""
    from patito_ray.functions.lm import score_unigram, train_unigram

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    model = train_unigram(ds)
    scored = score_unigram(ds, model)

    def finish(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t.column("n_lm_tokens"), 0))
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_lm_tokens": t.column("n_lm_tokens"),
                "lm_logprob": _r(t.column("lm_logprob"), 6),
            }
        )

    return scored.map_batches(finish, batch_format="pyarrow", batch_size=None)


SQL_LM_SCORE = r"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS tok
  FROM documents
),
vocab AS (SELECT tok, COUNT(*) AS c FROM tok GROUP BY tok),
tot AS (SELECT SUM(c) AS n, COUNT(*) AS v FROM vocab),
lp AS (
  SELECT tok, ln((c + 1) / CAST(n + v + 1 AS DOUBLE)) AS lp
  FROM vocab, tot
)
SELECT t.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_lm_tokens,
       ROUND(AVG(l.lp), 6) AS lm_logprob
FROM tok t JOIN lp l USING (tok)
GROUP BY t.doc_id
"""

QUERIES["lm_score"] = (q_lm_score, SQL_LM_SCORE)


def q_vocab_topk(sf_dir: str) -> pa.Table:
    """Corpus-wide exact term frequencies, top-20: per-batch Arrow
    ``value_counts`` over RE2 tokens (partial-agg pattern — shuffle is
    O(vocab x blocks), never O(corpus)), adaptive merge, per-block
    prune-to-k before the driver's final sort."""
    from patito_ray.functions.tfidf import top_terms

    ds = _rp(sf_dir, "documents", ["text"])
    return top_terms(ds, k=20)


SQL_VOCAB_TOPK = r"""
WITH u AS (
  SELECT unnest(regexp_extract_all(text, '\S+')) AS tok
  FROM documents WHERE text IS NOT NULL
)
SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt
FROM u GROUP BY tok ORDER BY cnt DESC, tok LIMIT 20
"""

QUERIES["vocab_topk"] = (q_vocab_topk, SQL_VOCAB_TOPK)


_TFIDF_TERMS = ["spark", "window", "hash", "join", "vector"]


def q_tfidf_search(sf_dir: str) -> pa.Table:
    """TF-IDF retrieval: top-10 documents for a 5-term query. Two
    streaming passes (df restricted to the query terms, then scoring
    with the |terms|-float idf table riding the closure); scores are
    rounded to 1e-6 BEFORE ranking so both engines rank identical
    values (fp-sum order noise is ~1e-15)."""
    from patito_ray.functions.tfidf import _global_topk, tfidf_scores

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    scored = tfidf_scores(ds, _TFIDF_TERMS)

    def rnd(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t.column("doc_id"), "score": _r(t.column("score"), 6)})

    rounded = scored.map_batches(rnd, batch_format="pyarrow", batch_size=None)
    return _global_topk(rounded, 10, "score", "doc_id")


SQL_TFIDF_SEARCH = r"""
WITH u AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS tok
  FROM documents WHERE text IS NOT NULL
),
q AS (SELECT unnest(['spark','window','hash','join','vector']) AS term),
tf AS (
  SELECT u.doc_id, u.tok AS term, CAST(COUNT(*) AS DOUBLE) AS c
  FROM u JOIN q ON u.tok = q.term GROUP BY u.doc_id, u.tok
),
df AS (
  SELECT term, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS d
  FROM (SELECT DISTINCT u.doc_id, u.tok AS term
        FROM u JOIN q ON u.tok = q.term) GROUP BY term
),
n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents)
SELECT tf.doc_id,
       ROUND(SUM(tf.c * (ln((n.n + 1) / (df.d + 1)) + 1)), 6) AS score
FROM tf JOIN df USING (term), n
GROUP BY tf.doc_id
ORDER BY score DESC, tf.doc_id
LIMIT 10
"""

QUERIES["tfidf_search"] = (q_tfidf_search, SQL_TFIDF_SEARCH)


def q_cum_spend(sf_dir: str) -> Any:
    """Per-customer window functions (SQL `OVER (PARTITION BY o_custkey
    ORDER BY o_orderdate, o_orderkey)`): ONE hash exchange on the key,
    one vectorized polars window pass per partition. Cumulative sums
    rounded to 1e-2 (DuckDB computes windowed SUM via a segment tree —
    different fp association than a sequential cum_sum)."""
    from patito_ray.stages.window import window_over

    ds = _rp(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])
    out = window_over(
        ds,
        by="o_custkey",
        order=["o_orderdate", "o_orderkey"],
        cols={
            "cum_spend": ("cum_sum", "o_totalprice"),
            "order_seq": ("row_number", None),
            "prev_price": ("lag", "o_totalprice"),
            "max_so_far": ("cum_max", "o_totalprice"),
        },
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "o_orderkey" not in t.column_names:
            return _CUM_SPEND_SCHEMA.empty_table()
        return pa.table(
            {
                "o_custkey": t.column("o_custkey"),
                "o_orderkey": t.column("o_orderkey"),
                "cum_spend": _r(t.column("cum_spend"), 2),
                "order_seq": t.column("order_seq"),
                "prev_price": t.column("prev_price"),
                "max_so_far": t.column("max_so_far"),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow", batch_size=None)


_CUM_SPEND_SCHEMA = pa.schema(
    [
        ("o_custkey", pa.int64()),
        ("o_orderkey", pa.int64()),
        ("cum_spend", pa.float64()),
        ("order_seq", pa.int64()),
        ("prev_price", pa.float64()),
        ("max_so_far", pa.float64()),
    ]
)


SQL_CUM_SPEND = """
SELECT o_custkey, o_orderkey,
       ROUND(SUM(o_totalprice) OVER w, 2) AS cum_spend,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS order_seq,
       LAG(o_totalprice) OVER w AS prev_price,
       MAX(o_totalprice) OVER w AS max_so_far
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""

QUERIES["cum_spend"] = (q_cum_spend, SQL_CUM_SPEND)


def q_split_assign(sf_dir: str) -> Any:
    """Deterministic train/val/test split (80/10/10 by doc_id hash).
    Labels are a pure function of (doc_id, seed): shard-stable, so a
    re-partitioned or resumed run can never leak a row between train
    and test. The SQL oracle re-runs splitmix64 and compares against
    the IDENTICAL cumulative uint64 boundaries (shared
    `split_thresholds` float arithmetic embedded as literals)."""
    from patito_ray.functions.sampling import assign_splits

    ds = _rp(sf_dir, "documents", ["doc_id"])
    return assign_splits(
        ds, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}, seed=0
    )


def _sql_split_assign() -> str:
    from patito_ray.functions.sampling import split_thresholds

    b = split_thresholds({"train": 0.8, "val": 0.1, "test": 0.1})
    # final cum >= 1.0 saturates to 2^64: the ELSE branch absorbs it
    return f"""
WITH z0 AS (
  SELECT doc_id,
    CAST((CAST(doc_id AS HUGEINT) + 11400714819323198485)
         % 18446744073709551616 AS UBIGINT) AS z
  FROM documents
), x1 AS (
  SELECT doc_id, xor(z, z >> 30) AS z FROM z0
), z1 AS (
  SELECT doc_id, {_sql_mul64(3210233709, 484763065)} AS z FROM x1
), x2 AS (
  SELECT doc_id, xor(z, z >> 27) AS z FROM z1
), z2 AS (
  SELECT doc_id, {_sql_mul64(2496678331, 321982955)} AS z FROM x2
), h AS (
  SELECT doc_id, CAST(xor(z, z >> 31) AS HUGEINT) AS h64 FROM z2
)
SELECT doc_id,
  CASE WHEN h64 < CAST({b[0]} AS HUGEINT) THEN 'train'
       WHEN h64 < CAST({b[1]} AS HUGEINT) THEN 'val'
       ELSE 'test' END AS split
FROM h
"""


QUERIES["split_assign"] = (q_split_assign, _sql_split_assign())


def q_pack_sequences(sf_dir: str) -> Any:
    """Sequence-packing plan: concatenate all documents in doc_id order
    into back-to-back 60-token training sequences and emit each doc's
    (seq_id, doc_begin, seq_begin, n_tok) segments. The global token
    offsets come from the range-partitioned ordered prefix sum (one
    narrow exchange); the oracle recomputes them with a window cumsum +
    lateral generate_series."""
    from patito_ray.functions.packing import pack_sequences
    from patito_ray.functions.text import token_count_array

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])

    def counts(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_tokens": token_count_array(t.column("text")),
            }
        )

    narrow = ds.map_batches(counts, batch_format="pyarrow", batch_size=None)
    return pack_sequences(narrow, "doc_id", "n_tokens", seq_len=60)


SQL_PACK_SEQUENCES = """
WITH t AS (
  SELECT doc_id,
         CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n
  FROM documents
), o AS (
  SELECT doc_id, n,
         CAST(COALESCE(SUM(n) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS b
  FROM t
), e AS (
  SELECT doc_id, n, b,
         unnest(generate_series(b // 60, (b + n - 1) // 60)) AS s
  FROM o WHERE n > 0
)
SELECT doc_id,
       s AS seq_id,
       GREATEST(b, s * 60) - b AS doc_begin,
       GREATEST(b, s * 60) - s * 60 AS seq_begin,
       LEAST(b + n, (s + 1) * 60) - GREATEST(b, s * 60) AS n_tok
FROM e
"""

QUERIES["pack_sequences"] = (q_pack_sequences, SQL_PACK_SEQUENCES)


def q_normalize_text(sf_dir: str) -> Any:
    """Text normalization parity: both engines build the IDENTICAL
    messy string per doc (leading/trailing runs, tabs, \\x0b — which is
    unicode-space but NOT RE2 whitespace, so it must survive — plus
    non-ASCII uppercase) and normalize (lower, collapse [\\t\\n\\f\\r ]+
    to one space, trim). Exact value oracle."""
    from patito_ray.functions.text import normalize_text_array

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])

    def build(t: pa.Table) -> pa.Table:
        n = t.num_rows
        import numpy as np

        pre = pa.array(np.full(n, "  ", dtype=object))
        mid = pa.array(np.full(n, "\tMiXeD  CASE\x0bÉёЖＦ ", dtype=object))
        messy = pc.binary_join_element_wise(pre, t.column("text"), mid, "")
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "norm_text": normalize_text_array(messy),
            }
        )

    return ds.map_batches(build, batch_format="pyarrow", batch_size=None)


SQL_NORMALIZE_TEXT = """
SELECT doc_id,
  trim(regexp_replace(
    lower('  ' || text || chr(9) || 'MiXeD  CASE' || chr(11)
          || 'ÉёЖＦ '),
    '[\t\n\f\r ]+', ' ', 'g'), ' ') AS norm_text
FROM documents
"""

QUERIES["normalize_text"] = (q_normalize_text, SQL_NORMALIZE_TEXT)


def q_domain_filter(sf_dir: str) -> Any:
    """Domain-blocklist filter: both engines synthesize the IDENTICAL
    URL per doc (5 hosts cycled, with userinfo / mixed case / ports
    layered on as parsing hazards), the engine must recover the host
    through the mess and drop blocked domains AND their subdomains
    ('ads.com' blocks 'sub.ads.com' but not 'goodads.com'). The oracle
    applies the block rule to the host it synthesized — any extraction
    bug on the Ray side shows up as a row diff."""
    from patito_ray.functions.urls import filter_blocked_domains

    ds = _rp(sf_dir, "documents", ["doc_id"])
    hosts = ["Ads.COM", "sub.Ads.com", "news.org", "cdn.Tracker.net", "goodads.com"]

    def build(t: pa.Table) -> pa.Table:
        import numpy as np

        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        host = pa.array(np.array(hosts, dtype=object)[ids % 5])
        user = pa.array(np.where(ids % 3 == 0, "u:p@", "").astype(object))
        port = pa.array(np.where(ids % 2 == 0, ":8080", "").astype(object))
        url = pc.binary_join_element_wise(
            pa.array(np.full(len(ids), "http://", dtype=object)),
            user, host, port,
            pa.array(np.full(len(ids), "/p/", dtype=object)),
            pc.cast(t.column("doc_id"), pa.string()),
            "",
        )
        return pa.table({"doc_id": t.column("doc_id"), "url": url})

    built = ds.map_batches(build, batch_format="pyarrow", batch_size=None)
    return filter_blocked_domains(built, ["ads.com", "tracker.net"])


SQL_DOMAIN_FILTER = """
WITH u AS (
  SELECT doc_id,
    CASE doc_id % 5 WHEN 0 THEN 'Ads.COM' WHEN 1 THEN 'sub.Ads.com'
      WHEN 2 THEN 'news.org' WHEN 3 THEN 'cdn.Tracker.net'
      ELSE 'goodads.com' END AS host
  FROM documents
)
SELECT doc_id,
  'http://' || (CASE WHEN doc_id % 3 = 0 THEN 'u:p@' ELSE '' END)
  || host || (CASE WHEN doc_id % 2 = 0 THEN ':8080' ELSE '' END)
  || '/p/' || CAST(doc_id AS VARCHAR) AS url
FROM u
WHERE NOT (lower(host) = 'ads.com' OR lower(host) LIKE '%.ads.com'
        OR lower(host) = 'tracker.net' OR lower(host) LIKE '%.tracker.net')
"""

QUERIES["domain_filter"] = (q_domain_filter, SQL_DOMAIN_FILTER)


def q_epoch_shuffle(sf_dir: str) -> Any:
    """Deterministic epoch-5 shuffle plan: every doc gets an explicit
    position 0..n-1 in splitmix64(doc_id ^ 5) order (ties by doc_id).
    Rides the ordered prefix sum — only (key, hash, 1) moves. Oracle:
    ROW_NUMBER() over the same recomputed hash order."""
    from patito_ray.functions.sampling import epoch_shuffle_positions

    ds = _rp(sf_dir, "documents", ["doc_id"])
    return epoch_shuffle_positions(ds, "doc_id", epoch=5)


SQL_EPOCH_SHUFFLE = f"""
WITH z0 AS (
  SELECT doc_id,
    CAST((CAST(xor(CAST(doc_id AS UBIGINT), 5) AS HUGEINT)
          + 11400714819323198485)
         % 18446744073709551616 AS UBIGINT) AS z
  FROM documents
), x1 AS (
  SELECT doc_id, xor(z, z >> 30) AS z FROM z0
), z1 AS (
  SELECT doc_id, {_sql_mul64(3210233709, 484763065)} AS z FROM x1
), x2 AS (
  SELECT doc_id, xor(z, z >> 27) AS z FROM z1
), z2 AS (
  SELECT doc_id, {_sql_mul64(2496678331, 321982955)} AS z FROM x2
), h AS (
  SELECT doc_id, CAST(xor(z, z >> 31) AS HUGEINT) AS h64 FROM z2
)
SELECT doc_id,
       CAST(ROW_NUMBER() OVER (ORDER BY h64, doc_id) - 1 AS BIGINT) AS pos
FROM h
"""

QUERIES["epoch_shuffle"] = (q_epoch_shuffle, SQL_EPOCH_SHUFFLE)


def q_materialize_sequences(sf_dir: str) -> Any:
    """Fully materialized 60-token training sequences: packing plan +
    doc-payload co-partition (token-slice gather) + seq_id assembly
    exchange. The oracle rebuilds every sequence's exact text in SQL:
    window cumsum -> generate_series segments -> 1-based inclusive
    list slices -> ordered string_agg."""
    from patito_ray.functions.packing import materialize_sequences

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    return materialize_sequences(ds, seq_len=60)


SQL_MATERIALIZE_SEQUENCES = """
WITH t AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS toks,
         CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n
  FROM documents
), o AS (
  SELECT doc_id, toks, n,
         CAST(COALESCE(SUM(n) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS b
  FROM t
), e AS (
  SELECT toks, n, b,
         unnest(generate_series(b // 60, (b + n - 1) // 60)) AS s
  FROM o WHERE n > 0
), seg AS (
  SELECT s AS seq_id,
         GREATEST(b, s * 60) - s * 60 AS seq_begin,
         LEAST(b + n, (s + 1) * 60) - GREATEST(b, s * 60) AS k,
         array_to_string(
           toks[GREATEST(b, s * 60) - b + 1 :
                LEAST(b + n, (s + 1) * 60) - b], ' ') AS seg
  FROM e
)
SELECT seq_id,
       string_agg(seg, ' ' ORDER BY seq_begin) AS seq_text,
       CAST(SUM(k) AS BIGINT) AS n_tok
FROM seg GROUP BY seq_id
"""

QUERIES["materialize_sequences"] = (
    q_materialize_sequences,
    SQL_MATERIALIZE_SEQUENCES,
)


def q_sample_exact_k(sf_dir: str) -> Any:
    """Exact-size uniform sample: the 100 documents whose
    splitmix64(doc_id ^ 7) is globally smallest (collision ties by
    doc_id). Unlike the Bernoulli `stratified_sample`, the output SIZE
    is pinned — evaluation sets and review batches need exactly-k.
    Per-batch lexsort prune bounds the exchange at k rows per block;
    the oracle recomputes the hash and takes ORDER BY h64, doc_id
    LIMIT 100."""
    from patito_ray.functions.sampling import sample_exact_k

    ds = _rp(sf_dir, "documents", ["doc_id"])
    return sample_exact_k(ds, "doc_id", k=100, seed=7)


SQL_SAMPLE_EXACT_K = f"""
WITH z0 AS (
  SELECT doc_id,
    CAST((CAST(xor(CAST(doc_id AS UBIGINT), 7) AS HUGEINT)
          + 11400714819323198485)
         % 18446744073709551616 AS UBIGINT) AS z
  FROM documents
), x1 AS (
  SELECT doc_id, xor(z, z >> 30) AS z FROM z0
), z1 AS (
  SELECT doc_id, {_sql_mul64(3210233709, 484763065)} AS z FROM x1
), x2 AS (
  SELECT doc_id, xor(z, z >> 27) AS z FROM z1
), z2 AS (
  SELECT doc_id, {_sql_mul64(2496678331, 321982955)} AS z FROM x2
), h AS (
  SELECT doc_id, CAST(xor(z, z >> 31) AS HUGEINT) AS h64 FROM z2
)
SELECT doc_id FROM h ORDER BY h64, doc_id LIMIT 100
"""

QUERIES["sample_exact_k"] = (q_sample_exact_k, SQL_SAMPLE_EXACT_K)


def q_bpe_tokens(sf_dir: str) -> Any:
    """BPE subword tokenization end-to-end: learn 60 merges from the
    corpus (one distributed word-count pass + vectorized merge loop),
    then encode every document with the actor-pool stage (distinct-word
    dictionary encode + rank-heap merge replay). Rows-only: SQL cannot
    express the merge recursion — correctness is the pure-Python
    reference parity suite in tests/test_bpe.py."""
    from patito_ray.functions.bpe import bpe_encode_dataset, train_bpe

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    merges, vocab = train_bpe(ds, num_merges=60, min_word_count=2)
    out = bpe_encode_dataset(ds, merges, vocab)
    return out.map_batches(
        lambda t: t.select(["doc_id", "n_bpe"]),
        batch_format="pyarrow",
        batch_size=None,
    )


QUERIES["bpe_tokens"] = (q_bpe_tokens, None)


def q_bloom_membership(sf_dir: str) -> Any:
    """Bloom-filter membership sweep: build a filter over the even
    doc_ids (one bloom per block, OR-merged — bit-identical to a
    sequential build), then flag every document in one broadcast probe
    pass. The SQL oracle states the TRUE membership (doc_id % 2 = 0);
    the bloom guarantees no false negative, and at fp_rate=1e-9 over
    this corpus the deterministic build has zero false positives (the
    comparison is exact and stable — hash64 is a fixed-seed hash).
    At crawl scale this replaces an 800 GB seen-key broadcast with a
    ~1 GB bitmap for cross-run incremental-dedup pre-filters."""
    from patito_ray.functions.membership import (
        bloom_from_dataset,
        flag_bloom_membership,
    )

    ds = _rp(sf_dir, "documents", ["doc_id"])
    seen = ds.map_batches(
        lambda t: t.filter(
            pc.equal(pc.bit_wise_and(t.column("doc_id"), 1), 0)
        ),
        batch_format="pyarrow",
        batch_size=None,
    )
    n = max(1, seen.count())
    bloom = bloom_from_dataset(seen, "doc_id", n_expected=n, fp_rate=1e-9)
    return flag_bloom_membership(ds, "doc_id", bloom)


SQL_BLOOM_MEMBERSHIP = """
SELECT doc_id, (doc_id % 2 = 0) AS maybe_seen FROM documents
"""

QUERIES["bloom_membership"] = (q_bloom_membership, SQL_BLOOM_MEMBERSHIP)


def q_webtext_funnel(sf_dir: str) -> Any:
    """Round-3 curation funnel composed end-to-end from the new
    operators: text normalization -> Gopher repetition filter ->
    cross-document line dedup -> exact dedup -> source mixing ->
    train/val/test split -> sequence-packing plan. Returns the funnel
    counts plus the packed-sequence total — one row, every stage the
    scale-shaped operator it names (the only shuffles are the exact-
    dedup Min-groupby and the packing prefix sum; the rest is
    per-batch). Rows-only: the composition is integration surface,
    each member operator has its own oracle."""
    from ray.data.aggregate import Max

    from patito_ray.functions.dedup import dedup_exact, remove_frequent_lines
    from patito_ray.functions.packing import pack_sequences
    from patito_ray.functions.repetition import repetition_filter
    from patito_ray.functions.sampling import assign_splits, mix_sources
    from patito_ray.functions.text import normalize_text_array

    ds = _rp(sf_dir, "documents", ["doc_id", "text", "source"])
    n_input = ds.count()

    def norm(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.schema.get_field_index("text"),
            "text",
            normalize_text_array(t.column("text")),
        )

    normalized = ds.map_batches(norm, batch_format="pyarrow", batch_size=None)
    gated = repetition_filter(
        normalized, max_dup_unit_frac=0.6, max_dup_char_frac=0.8
    ).materialize()
    n_gated = gated.count()

    cleaned = remove_frequent_lines(
        gated, min_count=30, sep="\n"
    ).map_batches(
        lambda t: t.select(["doc_id", "text", "source"]),
        batch_format="pyarrow",
        batch_size=None,
    )
    deduped = dedup_exact(cleaned, text_col="text", id_col="doc_id").materialize()
    n_deduped = deduped.count()

    mixed = mix_sources(
        deduped,
        key_col="doc_id",
        source_col="source",
        weights={f"src{i}": 0.06 for i in range(10)} | {
            f"src{i}": 0.04 for i in range(10, 20)
        },
        target_rows=max(1, n_deduped // 2),
    ).materialize()
    n_mixed = mixed.count()

    # seed=1: mixing already selected by splitmix64(doc_id ^ 0), and a
    # second selection on the SAME hash would be fully correlated (every
    # mixing survivor has a small hash, so seed-0 splits would put all
    # of them in 'train'). Chained hash-keyed operators need distinct
    # seeds — same rule as the epoch in epoch_shuffle_positions.
    train = assign_splits(
        mixed, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05}, seed=1
    ).map_batches(
        lambda t: t.filter(pc.equal(t["split"], "train")),
        batch_format="pyarrow",
        batch_size=None,
    ).materialize()
    n_train = train.count()

    def counts(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_tokens": pc.fill_null(
                    f_text.token_count_array(t.column("text")), 0
                ),
            }
        )

    plan = pack_sequences(
        train.map_batches(counts, batch_format="pyarrow", batch_size=None),
        "doc_id",
        "n_tokens",
        seq_len=256,
    )
    agg = plan.aggregate(Max("seq_id", alias_name="m"))
    m = None if agg is None else agg.get("m")
    n_sequences = int(m) + 1 if m is not None else 0
    return _one_row(
        n_input=n_input,
        n_after_repetition=n_gated,
        n_after_dedup=n_deduped,
        n_after_mixing=n_mixed,
        n_train=n_train,
        n_sequences=n_sequences,
    )


QUERIES["webtext_funnel"] = (q_webtext_funnel, None)


def q_approx_distinct(sf_dir: str) -> Any:
    """Approximate distinct parts per order-returnflag: per-batch HLL
    register partials, ONE register exchange (4 KiB per group per
    block), vectorized maximum.reduceat merge + estimate. The exact
    equivalent must co-locate every (flag, partkey) pair — the
    all-to-all this sketch exists to avoid at crawl scale. Rows-only:
    the estimate is ~1.6% off the true count by design (scalar-HLL
    parity and partition-invariance are pytested exactly)."""
    from patito_ray.functions.approx import approx_distinct_per_group

    ds = _rp(sf_dir, "lineitem", ["l_returnflag", "l_partkey"])
    return approx_distinct_per_group(ds, "l_returnflag", "l_partkey", p=12)


QUERIES["approx_distinct"] = (q_approx_distinct, None)


def q_ngram_counts(sf_dir: str) -> Any:
    """Top-50 corpus trigrams (count desc, gram asc): one vectorized
    tokenize + window gather per batch, value_counts partials through
    the adaptive partial-sum merge, per-block top-k prune before the
    driver sort. Exact oracle: DuckDB rebuilds every trigram with
    generate_series + list slices."""
    from patito_ray.functions.tfidf import top_ngrams

    ds = _rp(sf_dir, "documents", ["text"])
    return top_ngrams(ds, n=3, k=50)


SQL_NGRAM_COUNTS = """
WITH t AS (
  SELECT regexp_extract_all(text, '\\S+') AS toks FROM documents
), g AS (
  SELECT array_to_string(toks[s : s + 2], ' ') AS gram
  FROM t, LATERAL unnest(generate_series(1, len(toks) - 2)) AS u(s)
  WHERE len(toks) >= 3
)
SELECT gram, CAST(COUNT(*) AS BIGINT) AS cnt
FROM g GROUP BY gram
ORDER BY cnt DESC, gram ASC LIMIT 50
"""

QUERIES["ngram_counts"] = (q_ngram_counts, SQL_NGRAM_COUNTS)


def q_corpus_diff(sf_dir: str) -> Any:
    """Corpus-version diff: both engines synthesize the same two
    versions (old drops ids ending in 9; new drops ids ending in 0 and
    appends ' v2' to every 7th doc's text) and must agree on every
    per-id status. One tagged-union co-partition of narrow (id, hash)
    rows; text never rides the exchange. Exact oracle: FULL OUTER JOIN
    comparing the text directly."""
    from patito_ray.functions.dedup import corpus_diff

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])

    def mk_old(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id")
        import numpy as np

        keep = (ids.to_numpy(zero_copy_only=False) % 10) < 9
        return t.filter(pa.array(keep))

    def mk_new(t: pa.Table) -> pa.Table:
        import numpy as np

        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(ids % 10 != 0))
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        suffix = pa.array(np.where(ids % 7 == 0, " v2", "").astype(object))
        text = pc.binary_join_element_wise(t.column("text"), suffix, "")
        return t.set_column(t.schema.get_field_index("text"), "text", text)

    old = ds.map_batches(mk_old, batch_format="pyarrow", batch_size=None)
    new = ds.map_batches(mk_new, batch_format="pyarrow", batch_size=None)
    return corpus_diff(old, new)


SQL_CORPUS_DIFF = """
WITH old AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 10 < 9
), new AS (
  SELECT doc_id,
         text || (CASE WHEN doc_id % 7 = 0 THEN ' v2' ELSE '' END) AS text
  FROM documents WHERE doc_id % 10 != 0
)
SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
  CASE WHEN o.doc_id IS NULL THEN 'added'
       WHEN n.doc_id IS NULL THEN 'removed'
       WHEN o.text = n.text THEN 'unchanged'
       ELSE 'changed' END AS status
FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
"""

QUERIES["corpus_diff"] = (q_corpus_diff, SQL_CORPUS_DIFF)


def q_grouped_quantiles(sf_dir: str) -> Any:
    """Exact per-supplier price quantiles by SELECTION (element at
    1-based rank ceil(q*n)) — no interpolation arithmetic, so double
    values compare bit-exactly against the SQL ROW_NUMBER oracle. One
    hash exchange on the group key, one vectorized polars agg per
    partition; quantiles are holistic (not partially aggregable), so
    this is the minimum movement for an exact answer (t-digest in
    column_stats is the one-pass approximate path)."""
    from patito_ray.stages.quantiles import grouped_quantiles

    ds = _rp(sf_dir, "lineitem", ["l_suppkey", "l_extendedprice"])
    return grouped_quantiles(
        ds,
        by="l_suppkey",
        value="l_extendedprice",
        qs={"p25": 0.25, "p50": 0.50, "p90": 0.90, "p99": 0.99},
    )


SQL_GROUPED_QUANTILES = """
WITH ranked AS (
  SELECT l_suppkey,
         l_extendedprice AS v,
         ROW_NUMBER() OVER (PARTITION BY l_suppkey ORDER BY l_extendedprice) AS rn,
         COUNT(*) OVER (PARTITION BY l_suppkey) AS cnt
  FROM lineitem
  WHERE l_extendedprice IS NOT NULL
)
SELECT l_suppkey,
       CAST(MAX(cnt) AS BIGINT) AS n,
       MAX(CASE WHEN rn = GREATEST(1, CAST(CEIL(0.25 * cnt) AS BIGINT)) THEN v END) AS p25,
       MAX(CASE WHEN rn = GREATEST(1, CAST(CEIL(0.50 * cnt) AS BIGINT)) THEN v END) AS p50,
       MAX(CASE WHEN rn = GREATEST(1, CAST(CEIL(0.90 * cnt) AS BIGINT)) THEN v END) AS p90,
       MAX(CASE WHEN rn = GREATEST(1, CAST(CEIL(0.99 * cnt) AS BIGINT)) THEN v END) AS p99
FROM ranked
GROUP BY l_suppkey
"""

QUERIES["grouped_quantiles"] = (q_grouped_quantiles, SQL_GROUPED_QUANTILES)


def q_distinct_per_group(sf_dir: str) -> Any:
    """Exact COUNT(DISTINCT l_partkey) per return flag: per-batch pair
    dedup, one hash exchange of DISTINCT pairs on the value (identical
    values co-locate, so partition partials are disjoint), adaptive
    partial-sum merge. The exact counterpart of `approx_distinct`'s
    HLL register exchange."""
    from patito_ray.stages.agg import distinct_per_group

    ds = _rp(sf_dir, "lineitem", ["l_returnflag", "l_partkey"])
    return distinct_per_group(ds, by="l_returnflag", value="l_partkey")


SQL_DISTINCT_PER_GROUP = """
SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_distinct
FROM lineitem GROUP BY l_returnflag
"""

QUERIES["distinct_per_group"] = (q_distinct_per_group, SQL_DISTINCT_PER_GROUP)


def q_bloom_semi_join(sf_dir: str) -> Any:
    """Exact semi join, adaptively shaped: a small exact key set
    broadcasts once (one is_in per batch, zero exchange — the path this
    corpus takes); past the broadcast budget only the ~KB bloom bitmap
    broadcasts and bloom hits ride one co-partition exchange where
    exact is_in removes the false positives. Result provably exact
    either way — the SQL IN oracle checks every row."""
    from patito_ray.functions.membership import bloom_semi_join

    fact = _rp(sf_dir, "lineitem", ["l_orderkey", "l_partkey", "l_extendedprice"])
    orders = _rp(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    hi = orders.filter(
        expr="o_totalprice > 350000.0"
    ).select_columns(["o_orderkey"])
    return bloom_semi_join(fact, hi, "l_orderkey", "o_orderkey")


SQL_BLOOM_SEMI_JOIN = """
SELECT l_orderkey, l_partkey, l_extendedprice
FROM lineitem
WHERE l_orderkey IN (
  SELECT o_orderkey FROM orders WHERE o_totalprice > 350000.0
)
"""

QUERIES["bloom_semi_join"] = (q_bloom_semi_join, SQL_BLOOM_SEMI_JOIN)


def q_event_funnel(sf_dir: str) -> Any:
    """Ordered conversion funnel view -> click -> purchase: first
    completion time of each step per user, each strictly after the
    previous step. One hash exchange on user_id, vectorized per-
    partition step chain. The SQL oracle rebuilds the chain with
    correlated MIN subqueries."""
    from patito_ray.functions.funnel import funnel_steps

    ds = _rp(sf_dir, "events", ["user_id", "ts", "event_type"])
    return funnel_steps(
        ds, "user_id", "ts", "event_type", ["view", "click", "purchase"]
    )


SQL_EVENT_FUNNEL = """
WITH s1 AS (
  SELECT user_id, MIN(ts) AS ts_1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
), s2 AS (
  SELECT e.user_id, MIN(e.ts) AS ts_2
  FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'click' AND e.ts > s1.ts_1
  GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id, MIN(e.ts) AS ts_3
  FROM events e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s2.ts_2
  GROUP BY e.user_id
)
SELECT s1.user_id, s1.ts_1, s2.ts_2, s3.ts_3,
       CAST(1 + (s2.user_id IS NOT NULL)::INT + (s3.user_id IS NOT NULL)::INT
            AS BIGINT) AS depth
FROM s1
LEFT JOIN s2 ON s1.user_id = s2.user_id
LEFT JOIN s3 ON s1.user_id = s3.user_id
"""

QUERIES["event_funnel"] = (q_event_funnel, SQL_EVENT_FUNNEL)


def q_cohort_retention(sf_dir: str) -> Any:
    """Retention triangle: users first active on cohort_date who were
    active again day_offset days later. Distinct (user, day) pairs ride
    one user-key exchange; (cohort, offset) partials are disjoint and
    merge adaptively."""
    from patito_ray.functions.retention import cohort_retention

    ds = _rp(sf_dir, "events", ["user_id", "ts"])
    out = cohort_retention(ds, "user_id", "ts")

    def finish(t: pa.Table) -> pa.Table:
        # date32 -> timestamp[us]: DuckDB DATE comes back as datetime64
        i = t.schema.get_field_index("cohort_date")
        return t.set_column(
            i, "cohort_date", pc.cast(t.column("cohort_date"), pa.timestamp("us"))
        )

    return _apply(out, finish)


SQL_COHORT_RETENTION = """
WITH pairs AS (
  SELECT DISTINCT user_id, CAST(DATE_TRUNC('day', ts) AS DATE) AS d
  FROM events WHERE ts IS NOT NULL
), firsts AS (
  SELECT user_id, MIN(d) AS cohort_date FROM pairs GROUP BY user_id
)
SELECT f.cohort_date,
       CAST(p.d - f.cohort_date AS BIGINT) AS day_offset,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM pairs p JOIN firsts f ON p.user_id = f.user_id
GROUP BY 1, 2
"""

QUERIES["cohort_retention"] = (q_cohort_retention, SQL_COHORT_RETENTION)


def q_percent_rank(sf_dir: str) -> Any:
    """SQL PERCENT_RANK within each part brand: (rank-1)/(n-1) from the
    distributed window pass (rank_min + partition count over one hash
    exchange). Integer rank arithmetic + one IEEE double division on
    both sides — bit-exact, no rounding needed."""
    from patito_ray.stages.window import window_over

    ds = _rp(sf_dir, "part", ["p_partkey", "p_brand", "p_retailprice"])
    out = window_over(
        ds,
        by="p_brand",
        order=["p_retailprice", "p_partkey"],
        cols={"rk": ("rank_min", "p_retailprice"), "cnt": ("count", None)},
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "p_partkey" not in t.column_names:
            return _PERCENT_RANK_SCHEMA.empty_table()
        rk = t.column("rk")
        cnt = t.column("cnt")
        denom = pc.max_element_wise(pc.subtract(cnt, 1), 1)  # n=1 -> 0/1 = 0
        pct = pc.divide(
            pc.cast(pc.subtract(rk, 1), pa.float64()), pc.cast(denom, pa.float64())
        )
        return pa.table(
            {
                "p_partkey": t.column("p_partkey"),
                "p_brand": t.column("p_brand"),
                "pct_rank": pct,
            }
        )

    return out.map_batches(finish, batch_format="pyarrow", batch_size=None)


_PERCENT_RANK_SCHEMA = pa.schema(
    [
        ("p_partkey", pa.int64()),
        ("p_brand", pa.string()),
        ("pct_rank", pa.float64()),
    ]
)


SQL_PERCENT_RANK = """
SELECT p_partkey, p_brand,
       PERCENT_RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice)
         AS pct_rank
FROM part
"""

QUERIES["percent_rank"] = (q_percent_rank, SQL_PERCENT_RANK)


def q_bm25_search(sf_dir: str) -> pa.Table:
    """BM25 retrieval (Lucene idf variant, k1=1.2 b=0.75): top-10 docs
    for the same 5-term query as tfidf_search. One combined stats pass
    (N, total length, per-term df through a sentinel row), one
    vectorized scoring pass; scores rounded to 1e-6 BEFORE ranking so
    both engines rank identical values (libm ln / fp-sum-order noise is
    ~1e-15)."""
    from patito_ray.functions.tfidf import _global_topk, bm25_scores

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    scored = bm25_scores(ds, _TFIDF_TERMS)

    def rnd(t: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": t.column("doc_id"), "score": _r(t.column("score"), 6)}
        )

    rounded = scored.map_batches(rnd, batch_format="pyarrow", batch_size=None)
    return _global_topk(rounded, 10, "score", "doc_id")


SQL_BM25_SEARCH = r"""
WITH u AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS tok
  FROM documents WHERE text IS NOT NULL
),
stats AS (
  SELECT (SELECT CAST(COUNT(*) AS DOUBLE) FROM documents WHERE text IS NOT NULL) AS n,
         (SELECT CAST(COUNT(*) AS DOUBLE) FROM u) AS total
),
q AS (SELECT unnest(['spark','window','hash','join','vector']) AS term),
df AS (
  SELECT q.term,
         (SELECT CAST(COUNT(DISTINCT u.doc_id) AS DOUBLE) FROM u WHERE u.tok = q.term) AS df
  FROM q
),
dl AS (SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS dl FROM u GROUP BY doc_id),
tf AS (
  SELECT u.doc_id, u.tok AS term, CAST(COUNT(*) AS DOUBLE) AS tf
  FROM u JOIN q ON u.tok = q.term GROUP BY u.doc_id, u.tok
),
scored AS (
  SELECT tf.doc_id,
         SUM(
           LN((stats.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
           * tf.tf * (1.2 + 1.0)
           / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / (stats.total / stats.n)))
         ) AS score
  FROM tf
  CROSS JOIN stats
  JOIN df ON tf.term = df.term
  JOIN dl ON tf.doc_id = dl.doc_id
  GROUP BY tf.doc_id
)
SELECT doc_id, ROUND(score, 6) AS score
FROM scored
ORDER BY score DESC, doc_id
LIMIT 10
"""

QUERIES["bm25_search"] = (q_bm25_search, SQL_BM25_SEARCH)


def q_price_outliers(sf_dir: str) -> Any:
    """Composition: rows strictly above their group's exact p99 —
    grouped_quantiles' per-supplier threshold table (one 16 B row per
    supplier) is a SMALL side: broadcast it once via ray.put and filter
    the fact stream in place (no second all-to-all over the fact
    table); past 256 MB of thresholds fall back to the co-partition
    join. Exact end to end: the threshold is a selected element, the
    filter a raw double compare (null prices compare false like SQL)."""
    import ray

    from patito_ray.stages.join import copartition_apply
    from patito_ray.stages.quantiles import grouped_quantiles

    fact = _rp(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_extendedprice"])
    thr = grouped_quantiles(fact, "l_suppkey", "l_extendedprice", {"p99": 0.99})

    def narrow(t: pa.Table) -> pa.Table:
        return pa.table({"s_key": t.column("l_suppkey"), "p99": t.column("p99")})

    thr = thr.map_batches(narrow, batch_format="pyarrow", batch_size=None).materialize()

    if thr.count() * 16 <= 256 * 1024 * 1024:
        tabs = [b for b in thr.iter_batches(batch_format="pyarrow") if b.num_rows]
        if not tabs:  # empty fact / all-null prices -> inner join -> no rows
            return fact.map_batches(
                lambda t: t.slice(0, 0), batch_format="pyarrow", batch_size=None
            )
        tt = pa.concat_tables(tabs)
        keys = tt.column("s_key").to_numpy(zero_copy_only=False)
        cuts = tt.column("p99").to_numpy(zero_copy_only=False)
        order = np.argsort(keys)
        ref = ray.put((keys[order], cuts[order]))

        def pick_bcast(t: pa.Table, _ref=ref) -> pa.Table:
            keys_s, cuts_s = ray.get(_ref)
            sk = t.column("l_suppkey").to_numpy(zero_copy_only=False)
            pos = np.minimum(
                np.searchsorted(keys_s, sk), max(len(keys_s) - 1, 0)
            )
            price = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
            # suppliers absent from thr (all-null prices) drop, like the
            # SQL inner join; NaN (null) prices compare false
            keep = (keys_s[pos] == sk) & (price > cuts_s[pos])
            return t.filter(pa.array(keep))

        return fact.map_batches(pick_bcast, batch_format="pyarrow", batch_size=None)

    def pick(lt: pa.Table, rt: pa.Table) -> pa.Table:
        if lt.num_rows == 0:
            return lt
        pos = pc.index_in(lt.column("l_suppkey"), value_set=rt.column("s_key"))
        cuts = rt.column("p99").take(pos)
        return lt.filter(pc.greater(lt.column("l_extendedprice"), cuts))

    return copartition_apply(fact, thr, "l_suppkey", "s_key", pick)


SQL_PRICE_OUTLIERS = """
WITH ranked AS (
  SELECT l_suppkey,
         l_extendedprice AS v,
         ROW_NUMBER() OVER (PARTITION BY l_suppkey ORDER BY l_extendedprice) AS rn,
         COUNT(*) OVER (PARTITION BY l_suppkey) AS cnt
  FROM lineitem
  WHERE l_extendedprice IS NOT NULL
), thr AS (
  SELECT l_suppkey AS sk,
         MAX(CASE WHEN rn = GREATEST(1, CAST(CEIL(0.99 * cnt) AS BIGINT)) THEN v END) AS p99
  FROM ranked GROUP BY l_suppkey
)
SELECT l.l_orderkey, l.l_suppkey, l.l_extendedprice
FROM lineitem l JOIN thr ON l.l_suppkey = thr.sk
WHERE l.l_extendedprice > thr.p99
"""

QUERIES["price_outliers"] = (q_price_outliers, SQL_PRICE_OUTLIERS)


def q_mode_per_group(sf_dir: str) -> Any:
    """Exact per-group mode (most frequent l_quantity per return flag,
    smallest-value tie-break): per-batch vectorized pair counts,
    adaptive partial-sum merge, tiny top-1 per group."""
    from patito_ray.stages.agg import mode_per_group

    ds = _rp(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])
    return mode_per_group(ds, "l_returnflag", "l_quantity")


SQL_MODE_PER_GROUP = """
WITH counts AS (
  SELECT l_returnflag, l_quantity AS v, CAST(COUNT(*) AS BIGINT) AS c
  FROM lineitem WHERE l_quantity IS NOT NULL
  GROUP BY l_returnflag, l_quantity
), ranked AS (
  SELECT l_returnflag, v, c,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY c DESC, v) AS rn
  FROM counts
)
SELECT l_returnflag, v AS mode_value, c AS mode_count
FROM ranked WHERE rn = 1
"""

QUERIES["mode_per_group"] = (q_mode_per_group, SQL_MODE_PER_GROUP)


def q_approx_quantiles(sf_dir: str) -> Any:
    """Approximate per-supplier price quantiles via the t-digest
    exchange (one ~KiB digest per group per block instead of the
    values) — the scale path beside the exact grouped_quantiles.
    Rows-only: t-digest merge is order-sensitive, so no bit-exact
    oracle exists by design; accuracy is pytested against the exact
    quantiles."""
    from patito_ray.functions.approx import approx_quantiles_per_group

    ds = _rp(sf_dir, "lineitem", ["l_suppkey", "l_extendedprice"])
    return approx_quantiles_per_group(
        ds, "l_suppkey", "l_extendedprice", {"p50": 0.5, "p90": 0.9, "p99": 0.99}
    )


QUERIES["approx_quantiles"] = (q_approx_quantiles, None)


def q_weighted_sample(sf_dir: str) -> Any:
    """Weighted exact-k sample (Efraimidis–Spirakis exponential keys,
    P ∝ o_totalprice): 100 orders without replacement. Rows-only by
    design — the selection boundary compares libm ln outputs; the
    pairwise-inclusion law and partition stability are pytested."""
    from patito_ray.functions.sampling import weighted_sample_k

    ds = _rp(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    return weighted_sample_k(ds, "o_orderkey", "o_totalprice", 100, seed=7)


QUERIES["weighted_sample"] = (q_weighted_sample, None)


def q_order_lineitems(sf_dir: str) -> Any:
    """Large-large partitioned hash join (Ray's native join operator —
    the 'both sides large' path beside broadcast/co-partition): every
    lineitem joined to its order's customer and price. Dense parquet
    reads on both sides (the native operator's empty-block failure
    mode, documented in CLAUDE.md, cannot occur here)."""
    from patito_ray.stages.join import hash_join

    orders = _rp(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    items = _rp(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_extendedprice"])
    out = hash_join(items, orders, on="l_orderkey", right_on="o_orderkey")

    def finish(t: pa.Table) -> pa.Table:
        cols = ["l_orderkey", "l_linenumber", "l_extendedprice", "o_custkey", "o_totalprice"]
        if t.num_rows == 0 or any(c not in t.column_names for c in cols):
            return pa.schema(
                [
                    ("l_orderkey", pa.int64()),
                    ("l_linenumber", pa.int32()),
                    ("l_extendedprice", pa.float64()),
                    ("o_custkey", pa.int64()),
                    ("o_totalprice", pa.float64()),
                ]
            ).empty_table()
        return t.select(cols)

    return out.map_batches(finish, batch_format="pyarrow", batch_size=None)


SQL_ORDER_LINEITEMS = """
SELECT l.l_orderkey, l.l_linenumber, l.l_extendedprice,
       o.o_custkey, o.o_totalprice
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
"""

QUERIES["order_lineitems"] = (q_order_lineitems, SQL_ORDER_LINEITEMS)


def q_rolling_spend(sf_dir: str) -> Any:
    """Frame-based rolling window (SQL ROWS BETWEEN 6 PRECEDING AND
    CURRENT ROW): each customer's 7-order moving spend, through the
    same one-hash-exchange window pass as cum_spend. Rounded to 1e-2
    (DuckDB's segment-tree windowed SUM associates differently than a
    sequential rolling sum)."""
    from patito_ray.stages.window import window_over

    ds = _rp(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])
    out = window_over(
        ds,
        by="o_custkey",
        order=["o_orderdate", "o_orderkey"],
        cols={"roll_spend": ("rolling_sum", "o_totalprice")},
        frame=7,
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "o_orderkey" not in t.column_names:
            return pa.schema(
                [
                    ("o_custkey", pa.int64()),
                    ("o_orderkey", pa.int64()),
                    ("roll_spend", pa.float64()),
                ]
            ).empty_table()
        return pa.table(
            {
                "o_custkey": t.column("o_custkey"),
                "o_orderkey": t.column("o_orderkey"),
                "roll_spend": _r(t.column("roll_spend"), 2),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow", batch_size=None)


SQL_ROLLING_SPEND = """
SELECT o_custkey, o_orderkey,
       ROUND(SUM(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
       ), 2) AS roll_spend
FROM orders
"""

QUERIES["rolling_spend"] = (q_rolling_spend, SQL_ROLLING_SPEND)


_PIVOT_TYPES = ["view", "click", "purchase", "signup", "error"]


def q_events_pivot(sf_dir: str) -> Any:
    """Crosstab: events per day, one wide column per event type.
    Conditional counts are just per-batch partial sums with one column
    per category (the category set is declared, so the pivot never
    needs a global distinct pass) riding the adaptive merge."""
    import polars as pl

    ds = _rp(sf_dir, "events", ["ts", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        day = pc.cast(pc.cast(t.column("ts"), pa.date32()), pa.timestamp("us"))
        df = pl.from_arrow(pa.table({"day": day, "et": t.column("event_type")}))
        aggs = [
            (pl.col("et") == et).sum().cast(pl.Int64).alias(f"n_{et}")
            for et in _PIVOT_TYPES
        ]
        return df.group_by("day").agg(aggs).to_arrow()

    from patito_ray.stages.agg import merge_partial_sums

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    merged = merge_partial_sums(
        partials, ["day"], [f"n_{et}" for et in _PIVOT_TYPES]
    )
    return _apply(merged, lambda t: t)


SQL_EVENTS_PIVOT = """
SELECT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
       CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
       CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
       CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error
FROM events
GROUP BY 1
"""

QUERIES["events_pivot"] = (q_events_pivot, SQL_EVENTS_PIVOT)


def q_global_quantiles(sf_dir: str) -> Any:
    """Exact GLOBAL selection quantiles without a global sort: t-digest
    band bracketing + one counting/band-collect pass, driver-side
    selection from the tiny band, widen-and-retry if the sketch erred
    (exactness never depends on sketch accuracy)."""
    from patito_ray.stages.quantiles import global_quantiles

    ds = _rp(sf_dir, "lineitem", ["l_extendedprice"])
    return global_quantiles(
        ds, "l_extendedprice", {"p25": 0.25, "p50": 0.50, "p99": 0.99, "p100": 1.0}
    )


SQL_GLOBAL_QUANTILES = """
WITH ranked AS (
  SELECT l_extendedprice AS v,
         ROW_NUMBER() OVER (ORDER BY l_extendedprice) AS rn,
         COUNT(*) OVER () AS cnt
  FROM lineitem WHERE l_extendedprice IS NOT NULL
)
SELECT CAST(MAX(cnt) AS BIGINT) AS n,
       MAX(CASE WHEN rn = GREATEST(1, CAST(CEIL(0.25 * cnt) AS BIGINT)) THEN v END) AS p25,
       MAX(CASE WHEN rn = GREATEST(1, CAST(CEIL(0.50 * cnt) AS BIGINT)) THEN v END) AS p50,
       MAX(CASE WHEN rn = GREATEST(1, CAST(CEIL(0.99 * cnt) AS BIGINT)) THEN v END) AS p99,
       MAX(CASE WHEN rn = cnt THEN v END) AS p100
FROM ranked
"""

QUERIES["global_quantiles"] = (q_global_quantiles, SQL_GLOBAL_QUANTILES)


def q_recent_ship_revenue(sf_dir: str) -> Any:
    """Prune-at-the-read demo: a parquet row-group FILTER pushdown
    (l_shipdate >= 1997-01-01) plus column projection, so only the
    matching row groups' three columns leave storage, then per-flag
    partial sums. The oracle applies the same predicate in SQL."""
    import datetime

    from patito_ray.sources.readers import clean_read_parquet

    cutoff = datetime.datetime(1997, 1, 1)
    ds = clean_read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_extendedprice", "l_shipdate"],
        filter=(pc.field("l_shipdate") >= cutoff),
    )

    import polars as pl

    def partial(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(pa.table(
            {"l_returnflag": t.column("l_returnflag"),
             "p": t.column("l_extendedprice")}
        ))
        return (
            df.group_by("l_returnflag")
            .agg([pl.len().cast(pl.Int64).alias("n_items"), pl.col("p").sum().alias("revenue")])
            .to_arrow()
        )

    from patito_ray.stages.agg import merge_partial_sums

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    merged = merge_partial_sums(partials, ["l_returnflag"], ["n_items", "revenue"])

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "n_items": t.column("n_items"),
                "revenue": _r(t.column("revenue"), 2),
            }
        )

    return _apply(merged, finish)


SQL_RECENT_SHIP_REVENUE = """
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       ROUND(SUM(l_extendedprice), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
GROUP BY l_returnflag
"""

QUERIES["recent_ship_revenue"] = (q_recent_ship_revenue, SQL_RECENT_SHIP_REVENUE)


def q_corr_per_group(sf_dir: str) -> Any:
    """Per-group Pearson correlation of quantity vs price from exact
    partial sums (n, Σx, Σy, Σxy, Σx², Σy² per group — one streaming
    pass, adaptive merge). Both engines evaluate the SAME naive-formula
    expression from those sums (the SQL recomputes the sums rather than
    calling CORR, whose Welford accumulation orders fp differently);
    quantity and cent-priced values sum exactly in doubles, so only the
    final expression rounds — to 1e-6."""
    import polars as pl

    ds = _rp(sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(
            pa.table(
                {
                    "k": t.column("l_returnflag"),
                    "x": t.column("l_quantity"),
                    "y": t.column("l_extendedprice"),
                }
            )
        )
        return (
            df.group_by("k")
            .agg(
                [
                    pl.len().cast(pl.Float64).alias("n"),
                    pl.col("x").sum().alias("sx"),
                    pl.col("y").sum().alias("sy"),
                    (pl.col("x") * pl.col("y")).sum().alias("sxy"),
                    (pl.col("x") * pl.col("x")).sum().alias("sxx"),
                    (pl.col("y") * pl.col("y")).sum().alias("syy"),
                ]
            )
            .to_arrow()
        )

    from patito_ray.stages.agg import merge_partial_sums

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    merged = merge_partial_sums(
        partials, ["k"], ["n", "sx", "sy", "sxy", "sxx", "syy"]
    )

    def finish(t: pa.Table) -> pa.Table:
        import numpy as np

        n = t.column("n").to_numpy(zero_copy_only=False)
        sx = t.column("sx").to_numpy(zero_copy_only=False)
        sy = t.column("sy").to_numpy(zero_copy_only=False)
        sxy = t.column("sxy").to_numpy(zero_copy_only=False)
        sxx = t.column("sxx").to_numpy(zero_copy_only=False)
        syy = t.column("syy").to_numpy(zero_copy_only=False)
        corr = (n * sxy - sx * sy) / (
            np.sqrt(n * sxx - sx * sx) * np.sqrt(n * syy - sy * sy)
        )
        return pa.table(
            {
                "l_returnflag": t.column("k"),
                "n": pa.array(n.astype(np.int64), pa.int64()),
                "corr_qty_price": _r(pa.array(corr, pa.float64()), 6),
            }
        )

    return _apply(merged, finish)


SQL_CORR_PER_GROUP = """
WITH s AS (
  SELECT l_returnflag AS k,
         CAST(COUNT(*) AS DOUBLE) AS n,
         SUM(l_quantity) AS sx,
         SUM(l_extendedprice) AS sy,
         SUM(l_quantity * l_extendedprice) AS sxy,
         SUM(l_quantity * l_quantity) AS sxx,
         SUM(l_extendedprice * l_extendedprice) AS syy
  FROM lineitem GROUP BY l_returnflag
)
SELECT k AS l_returnflag,
       CAST(n AS BIGINT) AS n,
       ROUND((n * sxy - sx * sy) /
             (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy)), 6)
         AS corr_qty_price
FROM s
"""

QUERIES["corr_per_group"] = (q_corr_per_group, SQL_CORR_PER_GROUP)


def q_image_near_dups(sf_dir: str) -> Any:
    """Perceptual image near-dup pairs over REAL codecs end-to-end:
    deterministic PNGs are encoded per doc id (synth_media_batch), an
    actor pool decodes + aHashes them (pure-stdlib PNG path), and the
    shared banded-fingerprint spine emits hamming<=3 pairs — the
    gradient corpus's phase collisions (i*37 mod 97) make the pair set
    deterministic. Rows-only: SQL cannot decode PNGs."""
    from patito_ray.functions.multimodal import image_near_dups, synth_media_batch

    ds = _rp(sf_dir, "documents", ["doc_id"])
    media = ds.map_batches(
        lambda t: synth_media_batch(t, media="image"),
        batch_format="pyarrow",
        batch_size=256,
    )
    return image_near_dups(media, max_hamming=3, concurrency=8)


QUERIES["image_near_dups"] = (q_image_near_dups, None)


def q_audio_near_dups(sf_dir: str) -> Any:
    """Audio near-dup pairs over the real WAV path: synth PCM clips per
    doc id, actor-pool energy fingerprints, shared banded spine. The
    synth corpus reuses frequencies mod 40, so same-frequency clips
    pair deterministically. Rows-only: SQL cannot decode WAV."""
    from patito_ray.functions.multimodal import audio_near_dups, synth_media_batch

    ds = _rp(sf_dir, "documents", ["doc_id"])
    media = ds.map_batches(
        lambda t: synth_media_batch(t, media="audio"),
        batch_format="pyarrow",
        batch_size=256,
    )
    return audio_near_dups(media, max_hamming=3, concurrency=8)


QUERIES["audio_near_dups"] = (q_audio_near_dups, None)


def q_fuzzy_link(sf_dir: str) -> pa.Table:
    """Cross-corpus fuzzy linkage: documents split by doc_id parity
    into two "corpora", linked by exact word-3-gram Jaccard >= 0.8 via
    the MinHash-LSH spine (same-side candidates dropped before the
    payload exchange). bands=32/r=4 per-pair miss probability ~5e-8 at j=0.8, so the
    result equals the oracle's exhaustive cross scan."""
    def side(parity: int):
        def fn(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            return t.filter(pa.array((ids & 1) == parity))

        return fn

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    even = ds.map_batches(side(0), batch_format="pyarrow", batch_size=None)
    odd = ds.map_batches(side(1), batch_format="pyarrow", batch_size=None)
    linked = f_dedup.fuzzy_link(even, odd, threshold=0.8)
    return _lazy_norm(
        linked,
        pa.schema([("a", pa.int64()), ("b", pa.int64()), ("jaccard", pa.float64())]),
        round_col="jaccard",
    )


SQL_FUZZY_LINK = """
WITH tok AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS ts FROM documents
),
flat AS (
  SELECT doc_id, unnest(ts) AS tok, generate_subscripts(ts, 1) AS i, len(ts) AS n
  FROM tok
),
g3 AS (
  SELECT doc_id, tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w AS gram,
         i, n
  FROM flat WINDOW w AS (PARTITION BY doc_id ORDER BY i)
),
long_grams AS (
  SELECT doc_id, list(DISTINCT gram) AS gs FROM g3 WHERE i + 2 <= n GROUP BY doc_id
),
grams AS (
  SELECT t.doc_id,
         COALESCE(lg.gs,
                  CASE WHEN len(t.ts) >= 1 THEN [array_to_string(t.ts, ' ')]
                       ELSE [] END) AS gs
  FROM tok t LEFT JOIN long_grams lg ON t.doc_id = lg.doc_id
),
cand AS (
  SELECT x.doc_id AS a, y.doc_id AS b,
         len(list_intersect(x.gs, y.gs)) AS ni,
         len(x.gs) + len(y.gs) - len(list_intersect(x.gs, y.gs)) AS nu
  FROM grams x JOIN grams y ON x.doc_id % 2 = 0 AND y.doc_id % 2 = 1
)
SELECT a, b, ROUND(CAST(ni AS DOUBLE) / nu, 4) AS jaccard
FROM cand WHERE nu > 0 AND CAST(ni AS DOUBLE) / nu >= 0.8
"""

QUERIES["fuzzy_link"] = (q_fuzzy_link, SQL_FUZZY_LINK)


def q_rollup_revenue(sf_dir: str) -> Any:
    """ROLLUP (o_orderpriority, order year) over orders in ONE pass:
    every batch emits partials for all three grouping levels (priority+
    year, priority, grand total) with nulled rolled-up keys and a
    GROUPING()-style bitmask; only the narrow partials ride the merge
    (stages.agg.grouping_sets_sums)."""
    ds = _rp(sf_dir, "orders", ["o_orderpriority", "o_orderdate", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderpriority": t.column("o_orderpriority"),
                "o_year": pc.cast(pc.year(t.column("o_orderdate")), pa.int64()),
                "price": t.column("o_totalprice"),
            }
        )

    from patito_ray.stages.agg import grouping_sets_sums

    merged = grouping_sets_sums(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        keys=["o_orderpriority", "o_year"],
        sums=["price"],
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderpriority": t.column("o_orderpriority"),
                "o_year": t.column("o_year"),
                "grouping_id": t.column("grouping_id"),
                "sum_price": _r(pc.cast(t.column("price"), pa.float64()), 2),
                "n": pc.cast(t.column("n"), pa.int64()),
            }
        )

    return _apply(merged, finish)


SQL_ROLLUP_REVENUE = """
SELECT o_orderpriority,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(2 * GROUPING(o_orderpriority) + GROUPING(year(o_orderdate)) AS BIGINT)
         AS grouping_id,
       ROUND(SUM(o_totalprice), 2) AS sum_price,
       COUNT(*) AS n
FROM orders
GROUP BY ROLLUP(o_orderpriority, year(o_orderdate))
"""

QUERIES["rollup_revenue"] = (q_rollup_revenue, SQL_ROLLUP_REVENUE)


def q_cube_revenue(sf_dir: str) -> Any:
    """CUBE (all four grouping sets of priority x year) in the same ONE
    input pass as rollup_revenue — grouping_sets_sums with explicit
    sets; only the narrow per-level partials ride the merge."""
    ds = _rp(sf_dir, "orders", ["o_orderpriority", "o_orderdate", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderpriority": t.column("o_orderpriority"),
                "o_year": pc.cast(pc.year(t.column("o_orderdate")), pa.int64()),
                "price": t.column("o_totalprice"),
            }
        )

    from patito_ray.stages.agg import grouping_sets_sums

    merged = grouping_sets_sums(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        keys=["o_orderpriority", "o_year"],
        sums=["price"],
        sets=[(0, 1), (0,), (1,), ()],
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderpriority": t.column("o_orderpriority"),
                "o_year": t.column("o_year"),
                "grouping_id": t.column("grouping_id"),
                "sum_price": _r(pc.cast(t.column("price"), pa.float64()), 2),
                "n": pc.cast(t.column("n"), pa.int64()),
            }
        )

    return _apply(merged, finish)


SQL_CUBE_REVENUE = """
SELECT o_orderpriority,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(2 * GROUPING(o_orderpriority) + GROUPING(year(o_orderdate)) AS BIGINT)
         AS grouping_id,
       ROUND(SUM(o_totalprice), 2) AS sum_price,
       COUNT(*) AS n
FROM orders
GROUP BY CUBE(o_orderpriority, year(o_orderdate))
"""

QUERIES["cube_revenue"] = (q_cube_revenue, SQL_CUBE_REVENUE)


def q_string_agg_names(sf_dir: str) -> Any:
    """Per-nation ordered name concatenation — the collect-list
    holistic aggregate: one hash exchange of narrow (key, value) pairs,
    one vectorized sort+join per partition
    (stages.agg.string_agg_per_group)."""
    from patito_ray.stages.agg import string_agg_per_group

    ds = _rp(sf_dir, "customer", ["c_nationkey", "c_name"])
    return string_agg_per_group(ds, "c_nationkey", "c_name", sep=",")


SQL_STRING_AGG_NAMES = """
SELECT c_nationkey,
       string_agg(c_name, ',' ORDER BY c_name) AS agg,
       COUNT(*) AS n
FROM customer
GROUP BY c_nationkey
"""

QUERIES["string_agg_names"] = (q_string_agg_names, SQL_STRING_AGG_NAMES)


def q_skew_join_events(sf_dir: str) -> Any:
    """Skewed fact->dimension join with hot-key salting: a constructed
    70%-hot key (the crawl's mega-domain) would send 70% of the fact
    rows to ONE partition under a plain hash exchange; skew_join detects
    the hot key from pruned per-batch counts, salts its fact rows over
    8 partitions and replicates the matching dim rows — same exact inner
    join, no straggler."""
    import numpy as np

    from patito_ray.stages.join import skew_join

    ev = _rp(sf_dir, "events", ["event_id", "user_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        k = np.where(eid % 10 < 7, 0, uid % 25).astype(np.int64)
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "k": pa.array(k, type=pa.int64()),
                "value": t.column("value"),
            }
        )

    fact = ev.map_batches(prep, batch_format="pyarrow", batch_size=None)
    nat = _rp(sf_dir, "nation", ["n_nationkey", "n_name"])
    joined = skew_join(fact, nat, on="k", right_on="n_nationkey", hot_count=1000)

    def finish(t: pa.Table) -> pa.Table:
        return t.select(["event_id", "k", "n_name", "value"])

    return joined.map_batches(finish, batch_format="pyarrow", batch_size=None)


SQL_SKEW_JOIN_EVENTS = """
WITH fact AS (
  SELECT event_id,
         CASE WHEN event_id % 10 < 7 THEN 0 ELSE user_id % 25 END AS k,
         value
  FROM events)
SELECT f.event_id, f.k, n.n_name, f.value
FROM fact f JOIN nation n ON f.k = n.n_nationkey
"""

QUERIES["skew_join_events"] = (q_skew_join_events, SQL_SKEW_JOIN_EVENTS)


def q_left_join_cust_orders(sf_dir: str) -> Any:
    """LEFT OUTER join on the co-partition spine (copartition_join) —
    customers without orders surface with null order columns; Ray's
    native join (empty-block failure) is avoided and the preserved side
    streams through the one tagged-union exchange."""
    from patito_ray.stages.join import copartition_join

    cust = _rp(sf_dir, "customer", ["c_custkey", "c_name"])
    orders = _rp(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])

    def forders(t: pa.Table) -> pa.Table:
        # keep 1/4 of orders so some customers genuinely have none --
        # the preserved-side null path must actually be exercised
        k = t.column("o_orderkey")
        return t.filter(pc.equal(pc.bit_wise_and(k, 3), 0))

    joined = copartition_join(
        cust,
        orders.map_batches(forders, batch_format="pyarrow", batch_size=None),
        on="c_custkey",
        right_on="o_custkey",
        how="left",
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": t.column("c_custkey"),
                "c_name": t.column("c_name"),
                "o_orderkey": t.column("o_orderkey"),
                "o_totalprice": t.column("o_totalprice"),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow", batch_size=None)


SQL_LEFT_JOIN_CUST_ORDERS = """
SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
FROM customer c
LEFT JOIN (SELECT * FROM orders WHERE o_orderkey % 4 = 0) o
  ON c.c_custkey = o.o_custkey
"""

QUERIES["left_join_cust_orders"] = (q_left_join_cust_orders, SQL_LEFT_JOIN_CUST_ORDERS)


def q_full_join_parts_cust(sf_dir: str) -> Any:
    """FULL OUTER join with unmatched rows on BOTH sides (even part
    keys <= 300 vs customer keys <= 300 divisible by 3) — the outer
    path SQL engines use for reconciliation diffs."""
    from patito_ray.stages.join import copartition_join

    part = _rp(sf_dir, "part", ["p_partkey", "p_name"])

    def fpart(t: pa.Table) -> pa.Table:
        k = t.column("p_partkey")
        keep = pc.and_(
            pc.less_equal(k, 300), pc.equal(pc.bit_wise_and(k, 1), 0)
        )
        return t.filter(keep)

    cust = _rp(sf_dir, "customer", ["c_custkey", "c_name"])

    def fcust(t: pa.Table) -> pa.Table:
        import numpy as np

        k = t.column("c_custkey").to_numpy(zero_copy_only=False)
        return t.filter(pa.array((k <= 300) & (k % 3 == 0)))

    joined = copartition_join(
        part.map_batches(fpart, batch_format="pyarrow", batch_size=None),
        cust.map_batches(fcust, batch_format="pyarrow", batch_size=None),
        on="p_partkey",
        right_on="c_custkey",
        how="full",
    )

    def finish(t: pa.Table) -> pa.Table:
        return t.select(["p_partkey", "p_name", "c_custkey", "c_name"])

    return joined.map_batches(finish, batch_format="pyarrow", batch_size=None)


SQL_FULL_JOIN_PARTS_CUST = """
WITH p AS (SELECT p_partkey, p_name FROM part
           WHERE p_partkey <= 300 AND p_partkey % 2 = 0),
     c AS (SELECT c_custkey, c_name FROM customer
           WHERE c_custkey <= 300 AND c_custkey % 3 = 0)
SELECT p.p_partkey, p.p_name, c.c_custkey, c.c_name
FROM p FULL JOIN c ON p.p_partkey = c.c_custkey
"""

QUERIES["full_join_parts_cust"] = (q_full_join_parts_cust, SQL_FULL_JOIN_PARTS_CUST)


_HIST_LO, _HIST_W, _HIST_BINS = 900.0, 5210.0, 20


def q_price_histogram(sf_dir: str) -> Any:
    """Fixed-width histogram over l_extendedprice: per-batch vectorized
    bucket bincount partials (clamped to [0, bins)), adaptive merge —
    integer counts, exact against the identical SQL bucket expression."""
    import numpy as np

    from patito_ray.stages.agg import merge_partial_sums

    ds = _rp(sf_dir, "lineitem", ["l_extendedprice"])

    def buckets(t: pa.Table) -> pa.Table:
        x = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        b = np.clip(
            np.floor((x - _HIST_LO) / _HIST_W), 0, _HIST_BINS - 1
        ).astype(np.int64)
        counts = np.bincount(b, minlength=_HIST_BINS)
        return pa.table(
            {
                "bucket": pa.array(np.arange(_HIST_BINS, dtype=np.int64)),
                "n": pa.array(counts.astype(np.int64)),
            }
        )

    merged = merge_partial_sums(
        ds.map_batches(buckets, batch_format="pyarrow", batch_size=None),
        ["bucket"],
        ["n"],
    )

    def finish(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t.column("n"), 0))
        return pa.table(
            {
                "bucket": t.column("bucket"),
                "n": pc.cast(t.column("n"), pa.int64()),
            }
        )

    return _apply(merged, finish)


SQL_PRICE_HISTOGRAM = """
SELECT CAST(LEAST(GREATEST(FLOOR((l_extendedprice - 900.0) / 5210.0), 0), 19) AS BIGINT)
         AS bucket,
       COUNT(*) AS n
FROM lineitem
GROUP BY 1
"""

QUERIES["price_histogram"] = (q_price_histogram, SQL_PRICE_HISTOGRAM)


def q_melt_lineitem(sf_dir: str) -> Any:
    """UNPIVOT three lineitem measures into (metric, value) rows — a
    pure per-batch reshape, no exchange (stages.transform.melt)."""
    from patito_ray.stages.transform import melt

    ds = _rp(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount"],
    )
    return melt(
        ds,
        id_vars=["l_orderkey", "l_linenumber"],
        value_vars=["l_quantity", "l_extendedprice", "l_discount"],
        var_name="metric",
        value_name="value",
    )


SQL_MELT_LINEITEM = """
SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
"""

QUERIES["melt_lineitem"] = (q_melt_lineitem, SQL_MELT_LINEITEM)


def q_json_props_agg(sf_dir: str) -> Any:
    """JSON extraction from the events ``props`` column (vectorized
    Rust JSON-path kernel per batch, no exchange) feeding a partial-sum
    groupby — the semi-structured-column path every event pipeline
    needs."""
    from patito_ray.stages.agg import merge_partial_sums
    from patito_ray.stages.transform import json_extract_column

    ds = _rp(sf_dir, "events", ["event_type", "props"])
    ds = json_extract_column(ds, "props", "$.k", "k", dtype=pa.int64())

    import polars as pl

    def partials(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(t.select(["event_type", "k"]))
            .group_by("event_type")
            .agg(
                pl.col("k").sum().alias("sum_k"),
                pl.col("k").count().cast(pl.Int64).alias("n"),
            )
            .to_arrow()
        )

    merged = merge_partial_sums(
        ds.map_batches(partials, batch_format="pyarrow", batch_size=None),
        ["event_type"],
        ["sum_k", "n"],
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "sum_k": pc.cast(t.column("sum_k"), pa.int64()),
                "n": pc.cast(t.column("n"), pa.int64()),
            }
        )

    return _apply(merged, finish)


SQL_JSON_PROPS_AGG = """
SELECT event_type,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       COUNT(CAST(json_extract(props, '$.k') AS BIGINT)) AS n
FROM events
GROUP BY event_type
"""

QUERIES["json_props_agg"] = (q_json_props_agg, SQL_JSON_PROPS_AGG)


def q_composite_key_join(sf_dir: str) -> Any:
    """Equi-join on a COMPOSITE key — lineitem's (orderkey, linenumber)
    PK self-join through the co-partition spine's folded per-column
    hashes; no key concatenation ever materializes."""
    from patito_ray.stages.join import copartition_join

    left = _rp(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_quantity"])
    right = _rp(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_extendedprice"])

    def prep_right(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t.column("l_linenumber"), 3))
        return pa.table(
            {
                "rk": t.column("l_orderkey"),
                "rl": t.column("l_linenumber"),
                "r_price": t.column("l_extendedprice"),
            }
        )

    joined = copartition_join(
        left,
        right.map_batches(prep_right, batch_format="pyarrow", batch_size=None),
        on=["l_orderkey", "l_linenumber"],
        right_on=["rk", "rl"],
        how="inner",
    )

    def finish(t: pa.Table) -> pa.Table:
        return t.select(["l_orderkey", "l_linenumber", "l_quantity", "r_price"])

    return joined.map_batches(finish, batch_format="pyarrow", batch_size=None)


SQL_COMPOSITE_KEY_JOIN = """
SELECT a.l_orderkey, a.l_linenumber, a.l_quantity, b.l_extendedprice AS r_price
FROM lineitem a
JOIN (SELECT l_orderkey, l_linenumber, l_extendedprice
      FROM lineitem WHERE l_linenumber <= 3) b
  ON a.l_orderkey = b.l_orderkey AND a.l_linenumber = b.l_linenumber
"""

QUERIES["composite_key_join"] = (q_composite_key_join, SQL_COMPOSITE_KEY_JOIN)
