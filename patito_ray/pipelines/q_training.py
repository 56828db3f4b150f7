"""Query registry chunk (split from pipelines/queries.py): 0 registrations.

Registers: 
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


# ---------------------------------------------------------------------------
# training-data operators
# ---------------------------------------------------------------------------


def q_dedup_exact_documents(sf_dir: str) -> Any:
    """Kept-id set of exact dedup — returned as the lazy Dataset (the
    driver's comparator canonicalizes row order; no driver-side sort of
    what is a corpus-sized id list at scale)."""
    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    return f_dedup.dedup_exact_ids(ds, text_col="text", id_col="doc_id")


SQL_DEDUP_EXACT = """
SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id
FROM documents GROUP BY lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))
"""


def q_token_counts(sf_dir: str) -> pa.Table:
    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": f_text.token_count_array(t["text"]),
                "n_bpe_tokens": f_text.bpe_token_count_array(t["text"]),
            }
        ),
        batch_format="pyarrow",
        batch_size=None,
    )
    return out


# the BPE-ish pattern is RE2 on both sides (pyarrow count_substring_regex
# and DuckDB regexp_extract_all), so the pre-token counts match exactly
SQL_TOKEN_COUNTS = """
SELECT doc_id,
       CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens,
       CAST(length(regexp_extract_all(text,
            '''(?:[sdmt]|ll|ve|re)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+'))
            AS BIGINT) AS n_bpe_tokens
FROM documents
"""


def q_ann_cosine(sf_dir: str) -> pa.Table:
    """Brute-force cosine top-5 for the first 3 vectors (broadcast
    queries, per-batch matmul, driver heap-merge)."""
    ds = _rp(sf_dir, "embeddings", ["vec_id", "embedding"])
    q = (
        ds.map_batches(
            lambda t: t.filter(pc.less(t["vec_id"], 3)),
            batch_format="pyarrow",
            batch_size=None,
        )
        .take_all()
    )
    q.sort(key=lambda r: r["vec_id"])
    qids = np.array([r["vec_id"] for r in q])
    qvecs = np.array([r["embedding"] for r in q], dtype=np.float64)
    top = f_sim.topk_cosine(ds, qids, qvecs, k=5)
    return top.select(["query_id", "neighbor_id", "rank"])


SQL_ANN_COSINE = """
WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 3),
scored AS (
  SELECT q.qid, e.vec_id,
         list_cosine_similarity(q.qe, e.embedding) AS sim
  FROM q CROSS JOIN embeddings e
  WHERE e.vec_id <> q.qid
),
ranked AS (
  SELECT qid, vec_id, sim,
         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id ASC) AS rn
  FROM scored
)
SELECT qid AS query_id, vec_id AS neighbor_id, CAST(rn AS BIGINT) AS rank
FROM ranked WHERE rn <= 5
"""


def q_asof_last_order(sf_dir: str) -> pa.Table:
    """As-of join execution (reference types how="asof" only): for each
    event, the user's most recent order date at-or-before the event
    time. Ties on (custkey, orderdate) make the matched ROW ambiguous
    across engines, so the oracle compares the matched DATE (identical
    for every tie choice)."""
    from patito_ray.stages.join import asof_join

    events = _rp(sf_dir, "events", ["event_id", "ts", "user_id"])
    orders = _rp(sf_dir, "orders", ["o_custkey", "o_orderdate"])
    orders2 = orders.map_batches(
        lambda t: t.append_column("last_order_ts", t.column("o_orderdate")),
        batch_format="pyarrow",
        batch_size=None,
    )
    out = asof_join(
        events,
        orders2,
        on="ts",
        right_on="o_orderdate",
        by="user_id",
        right_by="o_custkey",
    )
    return out.select_columns(["event_id", "user_id", "last_order_ts"])


SQL_ASOF_LAST_ORDER = """
SELECT e.event_id, e.user_id, o.o_orderdate AS last_order_ts
FROM events e
ASOF LEFT JOIN orders o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
"""


def q_range_join_events(sf_dir: str) -> pa.Table:
    """Range (interval) join execution — a self-join: every ordered
    pair of events of the same user within a 30-minute window
    (event co-occurrence, the 'what else happened right before'
    primitive). Inner semantics; one inequality join per co-partition."""
    from patito_ray.stages.join import range_join

    left = _rp(sf_dir, "events", ["event_id", "ts", "user_id"])

    def rename_r(t: pa.Table) -> pa.Table:
        import polars as pl

        return (
            pl.from_arrow(t)
            .rename({"event_id": "r_event_id", "ts": "r_ts", "user_id": "r_user_id"})
            .with_columns(r_end=pl.col("r_ts") + pl.duration(minutes=30))
            .to_arrow()
        )

    right = _rp(sf_dir, "events", ["event_id", "ts", "user_id"]).map_batches(
        rename_r, batch_format="pyarrow", batch_size=None
    )
    out = range_join(
        left,
        right,
        on="ts",
        right_lo="r_ts",
        right_hi="r_end",
        by="user_id",
        right_by="r_user_id",
    )
    out = out.map_batches(
        lambda t: t.filter(
            pc.not_equal(t.column("event_id"), t.column("r_event_id"))
        ).select(["event_id", "r_event_id"]),
        batch_format="pyarrow",
        batch_size=None,
    )
    return out


SQL_RANGE_JOIN_EVENTS = """
SELECT e.event_id, r.event_id AS r_event_id
FROM events e JOIN events r
  ON e.user_id = r.user_id
 AND e.ts >= r.ts
 AND e.ts < r.ts + INTERVAL 30 MINUTE
 AND e.event_id <> r.event_id
"""


def q_top_orders_per_cust(sf_dir: str) -> pa.Table:
    """Grouped top-k: each customer's top-3 orders by price (per-batch
    prune to k, hash-partition by group, one vectorized final top-k per
    partition — never per-group Python)."""
    from patito_ray.stages.topk import grouped_top_k

    orders = _rp(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])
    out = grouped_top_k(
        orders, group="o_custkey", value="o_totalprice", k=3, tie="o_orderkey"
    )
    return out.select_columns(["o_custkey", "o_orderkey", "o_totalprice", "rank"])


SQL_TOP_ORDERS_PER_CUST = """
SELECT o_custkey, o_orderkey, o_totalprice, rank FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(row_number() OVER (PARTITION BY o_custkey
              ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rank
  FROM orders
) WHERE rank <= 3
"""


class DocSource(pr.Model):
    """Regex-extraction derive (reference T3's string path, README
    `str.extract` idiom): pull the numeric suffix out of source ids."""

    doc_id: int
    src_num: int = pr.Field(
        derived_from=pr.col("source").str.extract(r"src(\d+)", 1).cast("int64")
    )


def q_derived_regex(sf_dir: str) -> pa.Table:
    from patito_ray.frame import ModelFrame

    ds = _rp(sf_dir, "documents", ["doc_id", "source"])
    return ModelFrame(ds, DocSource).derive().drop().as_dataset()


SQL_DERIVED_REGEX = """
SELECT doc_id, CAST(regexp_extract(source, 'src(\\d+)', 1) AS BIGINT) AS src_num
FROM documents
"""


def q_quality_counts(sf_dir: str) -> pa.Table:
    """Exact integer quality features (char/alpha/punct/token/stopword
    counts) — the countable core of the quality scorer, oracle-checked
    value-by-value (the float score itself stays rows-only: rounding-
    boundary comparisons across engines are not stable)."""
    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(
        lambda t: f_text.quality_counts_batch(t).select(
            ["doc_id", "n_chars", "n_alpha", "n_punct", "n_tokens", "stop_hits"]
        ),
        batch_format="pyarrow",
        batch_size=None,
    )
    return out


SQL_QUALITY_COUNTS = """
WITH tok AS (
  SELECT doc_id, text, regexp_extract_all(lower(text), '\\S+') AS ts FROM documents
)
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) AS n_alpha,
       CAST(len(regexp_extract_all(text, '[^\\w\\s]')) AS BIGINT) AS n_punct,
       CAST(len(ts) AS BIGINT) AS n_tokens,
       CAST(len(list_filter(ts, t -> t IN
            ('the','and','of','to','in','is','was','that','for','it',
             'with','as','his','on','be','at','by','this','had','not')))
            AS BIGINT) AS stop_hits
FROM tok
"""


def q_stats_exact(sf_dir: str) -> pa.Table:
    """The exact counters of the sketch pass (count / nulls / min / max
    per column) against SQL aggregates — verifies the fused stats
    accumulators on their deterministic outputs (HLL/t-digest stay
    rows-only in ``column_stats``)."""
    ds = _rp(sf_dir, "lineitem", ["l_quantity", "l_extendedprice"])
    stats = column_stats(ds)
    q, e = stats["l_quantity"], stats["l_extendedprice"]
    return _one_row(
        q_count=int(q["count"]),
        q_nulls=int(q["nulls"]),
        q_min=float(q["min"]),
        q_max=float(q["max"]),
        e_min=float(e["min"]),
        e_max=float(e["max"]),
    )


SQL_STATS_EXACT = """
SELECT CAST(COUNT(*) AS BIGINT) AS q_count,
       CAST(COUNT(*) FILTER (l_quantity IS NULL) AS BIGINT) AS q_nulls,
       MIN(l_quantity) AS q_min, MAX(l_quantity) AS q_max,
       MIN(l_extendedprice) AS e_min, MAX(l_extendedprice) AS e_max
FROM lineitem
"""


def q_ann_cosine_ivf(sf_dir: str) -> pa.Table:
    """IVF ANN: k-means coarse lists + probed exact scoring (rows-only:
    the narrow-probe result is approximate by design; full-probe parity
    with brute force is pytest-verified)."""
    ds = _rp(sf_dir, "embeddings", ["vec_id", "embedding"])
    q = ds.map_batches(
        lambda t: t.filter(pc.less(t["vec_id"], 3)),
        batch_format="pyarrow",
        batch_size=None,
    ).take_all()
    q.sort(key=lambda r: r["vec_id"])
    qids = np.array([r["vec_id"] for r in q])
    qvecs = np.array([r["embedding"] for r in q], dtype=np.float64)
    centroids, assigned = f_sim.ivf_build(ds, n_centroids=16, sample_size=1000)
    top = f_sim.topk_cosine_ivf(
        assigned.materialize(), centroids, qids, qvecs, k=5, n_probe=4
    )
    return top.select(["query_id", "neighbor_id", "rank"])


# -- oracle-free operators (driver records rows-only checks) ---------------


def q_lang_id(sf_dir: str) -> pa.Table:
    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    out = f_text.lang_id_dataset(ds)
    return out.select_columns(["doc_id", "lang_pred", "lang_confidence"])


def q_quality(sf_dir: str) -> pa.Table:
    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    out = f_text.quality_dataset(ds)
    return out.select_columns(
        ["doc_id", "alpha_ratio", "punct_ratio", "stopword_ratio", "quality_score"]
    )


def q_fingerprints(sf_dir: str) -> pa.Table:
    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        lambda t: f_text.fingerprint_batch(t).select(["doc_id", "fingerprint"]),
        batch_format="pyarrow",
        batch_size=None,
    )


def q_winnow_fingerprints(sf_dir: str) -> pa.Table:
    """Winnowing (MOSS) rolling-hash fingerprints: any shared token run
    of length >= w+k-1 yields a shared fingerprint. Rows-only (the
    winnow selection is not SQL-expressible)."""
    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        f_text.winnow_fingerprints_batch, batch_format="pyarrow", batch_size=None
    )


def q_simhash_pairs(sf_dir: str) -> pa.Table:
    """Banded SimHash near-dup pairs (guaranteed recall at
    hamming <= 3 by pigeonhole; exact vectorized hamming verify).
    Rows-only: the simhash fingerprint is not SQL-expressible."""
    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    # returned lazily (like q_dedup_exact_documents): the comparator
    # canonicalizes order, and a driver-side sort of what is an
    # O(corpus) pair set at crawl scale is the wrong pattern
    return _lazy_norm(
        f_dedup.simhash_near_dups(ds, max_hamming=3),
        pa.schema([("a", pa.int64()), ("b", pa.int64()), ("hamming", pa.int64())]),
    )


def q_media_decode(sf_dir: str) -> pa.Table:
    """Multimodal decode pipeline with REAL codecs (no external data:
    payloads are deterministic PNG/WAV bytes synthesized from doc ids
    in-pipeline, then decoded back by the pure-stdlib PNG/WAV decoders
    through the actor-pool stages). Rows-only: binary codecs are not
    SQL-expressible. Output is fully deterministic: exact dimensions,
    luma, duration, sample rate per doc."""
    from patito_ray.functions import multimodal as f_mm

    ds = _rp(sf_dir, "documents", ["doc_id"])
    media = ds.map_batches(
        f_mm.synth_media_batch, batch_format="pyarrow", batch_size=256
    )
    decoded = f_mm.sample_audio_frames(
        f_mm.decode_images(media, concurrency=2, fake=False),
        frames=2,
        concurrency=2,
        fake=False,
    )
    return decoded.select_columns(
        [
            "doc_id",
            "width",
            "height",
            "n_channels",
            "mean_luma",
            "duration_sec",
            "sample_rate",
        ]
    )


def q_simhash(sf_dir: str) -> pa.Table:
    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        f_dedup.simhash_batch, batch_format="pyarrow", batch_size=None
    )


def q_minhash_pairs(sf_dir: str) -> pa.Table:
    """MinHash-LSH near-dup pairs, fully distributed (worker-side pair
    formation + distributed exact-Jaccard verify). bands=32 (r=4) puts
    per-pair candidate miss probability ~5e-8 at j=0.8, so the verified set equals
    the oracle's exhaustive >=0.8 scan."""
    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    pairs_ds = f_dedup.minhash_candidate_pairs(ds, num_perm=128, bands=32)
    verified = f_dedup.verify_pairs_dataset(ds, pairs_ds, threshold=0.8)
    # lazy result; oracle rounding (half-away like DuckDB ROUND) is a
    # vectorized per-batch kernel, never a driver loop
    return _lazy_norm(
        verified,
        pa.schema([("a", pa.int64()), ("b", pa.int64()), ("jaccard", pa.float64())]),
        round_col="jaccard",
    )


SQL_MINHASH_PAIRS = """
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
  FROM grams x JOIN grams y ON x.doc_id < y.doc_id
)
SELECT a, b, ROUND(CAST(ni AS DOUBLE) / nu, 4) AS jaccard
FROM cand WHERE nu > 0 AND CAST(ni AS DOUBLE) / nu >= 0.8
"""


def q_embedding_near_dups(sf_dir: str) -> pa.Table:
    """Embedding near-dup pairs (multi-table hyperplane LSH + exact
    cosine verify). The driver corpus has no planted near-dups (max
    pairwise cosine ~0.51), so the oracle checks the no-false-positive
    side exactly; recall is covered by planted-pair pytests."""
    ds = _rp(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = f_dedup.embedding_near_dups(ds, threshold=0.95)
    return _lazy_norm(
        out,
        pa.schema([("a", pa.int64()), ("b", pa.int64()), ("cosine", pa.float64())]),
        round_col="cosine",
    )


SQL_EMBEDDING_NEAR_DUPS = """
SELECT a.vec_id AS a, b.vec_id AS b,
       ROUND(CAST(list_cosine_similarity(a.embedding, b.embedding) AS DOUBLE), 4)
           AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.95
"""


def q_column_stats(sf_dir: str) -> pa.Table:
    ds = _rp(sf_dir, "lineitem", ["l_quantity", "l_extendedprice", "l_partkey"])
    stats = column_stats(ds)
    rows = []
    for name in sorted(stats):
        s = stats[name]
        rows.append(
            {
                "column": name,
                "count": s["count"],
                "nulls": s["nulls"],
                "min": float(s["min"]),
                "max": float(s["max"]),
                "approx_distinct": s["approx_distinct"],
                "p50": round(s["p50"], 2) if s.get("p50") is not None else None,
            }
        )
    return pa.Table.from_pylist(rows)


def q_drift_events(sf_dir: str) -> pa.Table:
    """Distribution-drift check (north-star component): profile
    ``events.value`` on the even-``event_id`` half as the reference
    corpus, drift-check the odd half against it through the mergeable
    sketch profiles (t-digest KS + HLL cardinality shift). The
    deterministic counters of both profiles (count / nulls / min / max
    / mean) are exact against SQL; the KS verdict is compared as a
    boolean — the oracle computes the EXACT empirical two-sample KS
    with a window CDF, and both halves sample the same generator, so
    sketch and exact decisions sit far below the 0.1 threshold."""
    base = _rp(sf_dir, "events", ["event_id", "value"])
    # ONE scan profiles both halves: per-batch sketch deltas tagged by
    # event_id parity, merged per tag (profile_dataset_split)
    profs = profile_dataset_split(
        base, lambda t: pc.bit_wise_and(t["event_id"], 1), ["value"]
    )
    ref_prof, cur_prof = profs[0], profs[1]
    report = drift_check(None, ref_prof, max_drift=0.1, current_profile=cur_prof)
    rv, cv = ref_prof["value"], cur_prof["value"]
    return _one_row(
        ref_count=int(rv.count),
        ref_nulls=int(rv.nulls),
        cur_count=int(cv.count),
        cur_nulls=int(cv.nulls),
        ref_min=_rf(float(rv.min), 4),
        ref_max=_rf(float(rv.max), 4),
        cur_min=_rf(float(cv.min), 4),
        cur_max=_rf(float(cv.max), 4),
        ref_mean=_rf(rv.sum / (rv.count - rv.nulls), 2),
        cur_mean=_rf(cv.sum / (cv.count - cv.nulls), 2),
        drift_ok=bool(report["value"]["ok"]),
    )


SQL_DRIFT_EVENTS = """
WITH pts AS (
  SELECT value, (event_id % 2 = 0) AS is_ref FROM events
), agg AS (
  SELECT
    CAST(COUNT(*) FILTER (is_ref) AS BIGINT) AS ref_count,
    CAST(COUNT(*) FILTER (is_ref AND value IS NULL) AS BIGINT) AS ref_nulls,
    CAST(COUNT(*) FILTER (NOT is_ref) AS BIGINT) AS cur_count,
    CAST(COUNT(*) FILTER (NOT is_ref AND value IS NULL) AS BIGINT) AS cur_nulls,
    ROUND(MIN(value) FILTER (is_ref), 4) AS ref_min,
    ROUND(MAX(value) FILTER (is_ref), 4) AS ref_max,
    ROUND(MIN(value) FILTER (NOT is_ref), 4) AS cur_min,
    ROUND(MAX(value) FILTER (NOT is_ref), 4) AS cur_max,
    ROUND(AVG(value) FILTER (is_ref), 2) AS ref_mean,
    ROUND(AVG(value) FILTER (NOT is_ref), 2) AS cur_mean
  FROM pts
), nn AS (
  SELECT value, is_ref FROM pts WHERE value IS NOT NULL
), tot AS (
  SELECT CAST(COUNT(*) FILTER (is_ref) AS DOUBLE) AS na,
         CAST(COUNT(*) FILTER (NOT is_ref) AS DOUBLE) AS nb
  FROM nn
), cdf AS (
  SELECT
    CAST(SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) OVER w AS DOUBLE) AS ca,
    CAST(SUM(CASE WHEN is_ref THEN 0 ELSE 1 END) OVER w AS DOUBLE) AS cb
  FROM nn
  WINDOW w AS (ORDER BY value RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), ks AS (
  SELECT MAX(ABS(ca / (SELECT na FROM tot) - cb / (SELECT nb FROM tot))) AS ks
  FROM cdf
)
SELECT agg.*, (SELECT ks FROM ks) <= 0.1 AS drift_ok FROM agg
"""


def q_stratified_sample(sf_dir: str) -> pa.Table:
    """Shard-stable stratified sampling (downsample English to 25 %,
    keep 50 % of everything else, deterministically by doc_id). The
    oracle re-implements the splitmix64 finalizer in SQL with 32-bit
    partial products (a full 64x64 multiply overflows HUGEINT), proving
    the sample membership is engine-independent bit for bit."""
    from patito_ray.functions.sampling import stratified_sample

    ds = _rp(sf_dir, "documents", ["doc_id", "lang"])
    return stratified_sample(
        ds, "doc_id", "lang", {"en": 0.25}, default_fraction=0.5, seed=0
    )


def _sql_mul64(ch: int, cl: int) -> str:
    """(z * c) mod 2^64 in DuckDB HUGEINT via 32-bit partial products."""
    return (
        f"CAST(( (CAST(z AS HUGEINT) % 4294967296) * {cl}"
        f" + ((( (CAST(z AS HUGEINT) % 4294967296) * {ch}"
        f"      + (CAST(z AS HUGEINT) // 4294967296) * {cl}) % 4294967296)"
        f"    * 4294967296)"
        f" ) % 18446744073709551616 AS UBIGINT)"
    )


# splitmix64 over doc_id (seed 0), thresholds = fraction * 2^64
SQL_STRATIFIED_SAMPLE = f"""
WITH z0 AS (
  SELECT doc_id, lang,
    CAST((CAST(doc_id AS HUGEINT) + 11400714819323198485)
         % 18446744073709551616 AS UBIGINT) AS z
  FROM documents
), x1 AS (
  SELECT doc_id, lang, xor(z, z >> 30) AS z FROM z0
), z1 AS (
  SELECT doc_id, lang, {_sql_mul64(3210233709, 484763065)} AS z FROM x1
), x2 AS (
  SELECT doc_id, lang, xor(z, z >> 27) AS z FROM z1
), z2 AS (
  SELECT doc_id, lang, {_sql_mul64(2496678331, 321982955)} AS z FROM x2
), h AS (
  SELECT doc_id, lang, CAST(xor(z, z >> 31) AS HUGEINT) AS h64 FROM z2
)
SELECT doc_id, lang FROM h
WHERE h64 < CASE WHEN lang = 'en'
                 THEN CAST(4611686018427387904 AS HUGEINT)
                 ELSE CAST(9223372036854775808 AS HUGEINT) END
"""


def q_dedup_incremental(sf_dir: str) -> Any:
    """Cross-run exact dedup: docs with doc_id % 10 == 7 play the
    PREVIOUS crawl (only their content hashes survive it, as a lazy
    narrow Dataset); the full corpus then dedups against them — any doc
    whose normalized text appeared in the previous crawl drops, and one
    min-id representative survives per remaining distinct text. The
    previous corpus is never broadcast or driver-materialized: its
    hashes ride the same Min-groupby exchange as within-corpus dedup
    behind a -1 sentinel id."""
    from patito_ray.functions.dedup import content_hashes, dedup_exact_incremental

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])

    def pick_prev(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % 10 == 7))

    prev = content_hashes(
        ds.map_batches(pick_prev, batch_format="pyarrow", batch_size=None)
    )
    kept = dedup_exact_incremental(ds, prev)
    return kept.select_columns(["doc_id"])


SQL_DEDUP_INCREMENTAL = """
WITH norm AS (
  SELECT doc_id, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS nt
  FROM documents
),
prev AS (SELECT DISTINCT nt FROM norm WHERE doc_id % 10 = 7)
SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id
FROM norm WHERE nt NOT IN (SELECT nt FROM prev)
GROUP BY nt
"""


def q_chunk_dedup(sf_dir: str) -> Any:
    """Passage-level dedup: explode every document into 10-token
    windows (vectorized flat_map), keep the first occurrence of each
    distinct window corpus-wide. Only 16 B (hash, packed order key)
    rows ride the exchange. Exact oracle: SQL rebuilds the same windows
    with string_agg over token buckets and ranks on the chunk STRING."""
    from patito_ray.functions.dedup import dedup_chunks

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    return dedup_chunks(ds, chunk_tokens=10)


SQL_CHUNK_DEDUP = """
WITH tok AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS ts FROM documents
),
flat AS (
  SELECT doc_id, unnest(ts) AS tok, generate_subscripts(ts, 1) - 1 AS i
  FROM tok
),
chunks AS (
  SELECT doc_id, i // 10 AS chunk_idx,
         string_agg(tok, ' ' ORDER BY i) AS chunk
  FROM flat GROUP BY doc_id, i // 10
),
r AS (
  SELECT doc_id, chunk_idx,
         row_number() OVER (PARTITION BY chunk ORDER BY doc_id, chunk_idx) AS rn
  FROM chunks
)
SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx FROM r WHERE rn = 1
"""


def q_cap_per_source(sf_dir: str) -> Any:
    """Per-key cap: at most 3 documents per source, chosen as the 3
    smallest splitmix64(doc_id) within each source (shard-stable
    unbiased per-key sample). The oracle re-implements the hash in SQL
    (32-bit partial products) and ranks with ROW_NUMBER over the
    unsigned hash — bit-exact selection parity."""
    from patito_ray.functions.sampling import cap_per_key

    ds = _rp(sf_dir, "documents", ["doc_id", "source"])
    return cap_per_key(ds, "source", k=3, id_col="doc_id")


SQL_CAP_PER_SOURCE = f"""
WITH z0 AS (
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
), hh AS (
  SELECT doc_id, source, CAST(xor(z, z >> 31) AS HUGEINT) AS h64 FROM z2
), r AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source ORDER BY h64, doc_id) AS rn
  FROM hh
)
SELECT doc_id, source FROM r WHERE rn <= 3
"""


def q_contamination(sf_dir: str) -> Any:
    """Train/test decontamination: every 100th document plays the
    benchmark/eval set; flag all docs sharing any word-3-gram with it.
    The benchmark is a DATASET: its gram-hash set is reduced
    worker-side (8 B per distinct gram reaches the driver — benchmark
    TEXT never does) and broadcasts once via ray.put; the flag pass is
    one shuffle-free vectorized membership scan. Exact oracle: the SQL
    side builds the same distinct 3-gram sets (incl. the short-doc
    whole-text fallback) and joins on gram STRINGS — hash collisions
    would surface as a value mismatch."""
    from patito_ray.functions.dedup import contamination_flags

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])

    def pick_bench(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % 100 == 0)).select(["text"])

    bench_ds = ds.map_batches(pick_bench, batch_format="pyarrow", batch_size=None)
    return contamination_flags(ds, bench_ds, n=3)


SQL_CONTAMINATION = """
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
docg AS (SELECT doc_id, unnest(gs) AS gram FROM grams),
bench AS (SELECT DISTINCT gram FROM docg WHERE doc_id % 100 = 0),
hits AS (
  SELECT d.doc_id, COUNT(*) AS n_hits
  FROM docg d JOIN bench b USING (gram) GROUP BY d.doc_id
)
SELECT g.doc_id,
       CAST(len(g.gs) AS BIGINT) AS n_grams,
       CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
       COALESCE(h.n_hits, 0) > 0 AS contaminated
FROM grams g LEFT JOIN hits h ON g.doc_id = h.doc_id
"""


def q_url_canonical(sf_dir: str) -> Any:
    """URL canonicalization parity: both engines synthesize the
    IDENTICAL messy URL per doc_id (mixed-case scheme/host, default and
    non-default ports crossed against both schemes, fragments) and
    canonicalize — lowercased scheme+authority, fragment dropped,
    default ports removed, path case preserved. Exact value oracle."""
    from patito_ray.functions.urls import canonicalize_url_array

    ds = _rp(sf_dir, "documents", ["doc_id"])

    def build(t: pa.Table) -> pa.Table:
        import numpy as np

        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        s = pc.cast(t.column("doc_id"), pa.string())
        scheme = pa.array(np.where(ids % 2 == 0, "HTTP://", "hTTps://"))
        host = pc.binary_join_element_wise(
            pa.array(np.full(len(ids), "ExAmple", dtype=object)),
            pc.cast(pa.array(ids % 7), pa.string()),
            pa.array(np.full(len(ids), ".COM", dtype=object)),
            "",
        )
        port = pa.array(
            np.choose(ids % 4, [":80", ":443", ":8080", ""]).astype(object)
        )
        frag = pa.array(np.where(ids % 3 == 0, "#Frag", "").astype(object))
        url = pc.binary_join_element_wise(
            scheme, host, port, pa.array(np.full(len(ids), "/Path/", dtype=object)),
            s, frag, "",
        )
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "canon_url": canonicalize_url_array(url),
            }
        )

    return ds.map_batches(build, batch_format="pyarrow", batch_size=None)


SQL_URL_CANONICAL = """
WITH u AS (
  SELECT doc_id,
    (CASE WHEN doc_id % 2 = 0 THEN 'HTTP://' ELSE 'hTTps://' END)
    || 'ExAmple' || CAST(doc_id % 7 AS VARCHAR) || '.COM'
    || (CASE doc_id % 4 WHEN 0 THEN ':80' WHEN 1 THEN ':443'
        WHEN 2 THEN ':8080' ELSE '' END)
    || '/Path/' || CAST(doc_id AS VARCHAR)
    || (CASE WHEN doc_id % 3 = 0 THEN '#Frag' ELSE '' END) AS url
  FROM documents
),
p AS (
  SELECT doc_id,
    lower(regexp_extract(url, '^([a-zA-Z][a-zA-Z0-9+.\\-]*://[^/?#]*)', 1)) AS head,
    regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.\\-]*://[^/?#]*([^#]*)', 1) AS tail
  FROM u
)
SELECT doc_id,
  regexp_replace(
    regexp_replace(head, '^(http://[^:]*):80$', '\\1'),
    '^(https://[^:]*):443$', '\\1') || tail AS canon_url
FROM p
"""


def q_heavy_hitters(sf_dir: str) -> pa.Table:
    """Frequent-items sketch over documents.source. The corpus has
    fewer distinct sources than the sketch capacity, so the summary is
    provably EXACT (error_bound()==0, asserted) and the oracle is a
    plain GROUP BY count."""
    from patito_ray.validation.stats import frequent_items

    ds = _rp(sf_dir, "documents", ["source"])
    mg = frequent_items(ds, "source", capacity=64)
    assert mg.error_bound() == 0, "capacity exceeded: summary not exact"
    items = mg.items()
    return pa.table(
        {
            "source": pa.array([v for v, _lo, _hi in items], type=pa.string()),
            "n": pa.array([lo for _v, lo, _hi in items], type=pa.int64()),
        }
    )


SQL_HEAVY_HITTERS = """
SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY source
"""


def q_quantile_filter(sf_dir: str) -> Any:
    """Keep the top ~10% of events by value (the 'train on the
    best-scoring slice' curation step). Rows-only: the cut comes from
    the t-digest quantile (approximate in rank by design); the filter
    itself is an exact vectorized threshold."""
    from patito_ray.validation.stats import quantile_filter

    ds = _rp(sf_dir, "events", ["event_id", "value"])
    return quantile_filter(ds, "value", keep_fraction=0.1, side="top")


def q_resumable_write(sf_dir: str) -> pa.Table:
    """Resumable partitioned sink driven end-to-end: filter documents
    by length through the sink's shard loop (write → manifest →
    read-back); a repeated run skips every finished shard. The output
    dir is keyed by the corpus fingerprint so each sf gets its own
    plan; exact oracle on the read-back rows."""
    import glob
    import os

    from patito_ray.sinks import plan_id, read_output, resumable_write_parquet

    files = sorted(glob.glob(f"{sf_dir}/documents.parquet"))
    out_dir = f"/tmp/patito_ray_sink/{plan_id(files, 'doclen>=200 v1')}"

    def keep_long(ds: Any) -> Any:
        def fn(t: pa.Table) -> pa.Table:
            n = pc.cast(pc.utf8_length(t["text"]), pa.int64())
            keep = pc.fill_null(pc.greater_equal(n, 200), False)
            return t.append_column("n_chars", n).filter(keep).select(
                ["doc_id", "n_chars"]
            )

        return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)

    resumable_write_parquet(
        files,
        out_dir,
        keep_long,
        transform_fingerprint="doclen>=200 v1",
        columns=["doc_id", "text"],
    )
    return read_output(out_dir)


SQL_RESUMABLE_WRITE = """
SELECT doc_id, CAST(LENGTH(text) AS BIGINT) AS n_chars
FROM documents
WHERE LENGTH(text) >= 200
"""


def q_webpage_validate(sf_dir: str) -> pa.Table:
    """Flagship: full web-page validation over the deterministic
    synthetic corpus (scaled off the sf directory name)."""
    from patito_ray.generate import ray_webpages

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        n = max(2000, int(600_000 * float(sf) * 0.1))
    except ValueError:
        n = 5000
    ds = ray_webpages(n, blocks=8)
    summary = validate_webpages(ds)
    return pa.table({k: [v] for k, v in summary.items()})
